package graft.lineage

/** Run-over-run lineage drift: compare two captured runs of the same
  * logical job (same output entity) and name exactly what changed — the
  * "why is tonight's table different" readout a catalog answers first.
  * Complements [[LineageGraph]] (which answers "what is affected"):
  * this answers "what moved", from the same persisted records
  * ([[LineageCatalog]]), so it works across sessions.
  */
object LineageDiff {

  /** One drift finding. `kind` is a closed vocabulary (see below),
    * `subject` the column/entity it names, `detail` the human-readable
    * before→after. */
  final case class Finding(kind: String, subject: String, detail: String)

  /** Compare two runs writing the same output. Emitted kinds:
    *  - `column-added` / `column-removed` — output schema drift
    *  - `type-changed` — columns identical but schema fingerprint moved
    *    (a type is the only remaining degree of freedom)
    *  - `derivation-changed` — same output column, different derivation
    *    expression (the expression-level column lineage at work)
    *  - `sources-changed` — same output column, different source columns
    *  - `input-added` / `input-removed` — input entity set drift
    *  - `columns-read-changed` — same input, different pruned column set
    *  - `plan-changed` — plan fingerprint moved with none of the above
    *    (a filter/join/shape change invisible to the schema)
    *  - `rowcount-swing` — rows written moved by ≥ [[SWING]]× (or to/from 0)
    */
  def compareRuns(prev: LineageRecord, cur: LineageRecord): Seq[Finding] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Finding]
    val (pc, cc) = (prev.outputColumns, cur.outputColumns)
    (cc.toSet -- pc.toSet).toSeq.sorted.foreach(c =>
      out += Finding("column-added", c, s"output now carries '$c'"))
    (pc.toSet -- cc.toSet).toSeq.sorted.foreach(c =>
      out += Finding("column-removed", c, s"output no longer carries '$c'"))
    if (pc.toSet == cc.toSet && prev.schemaFingerprint != cur.schemaFingerprint)
      out += Finding("type-changed", cur.output.map(_.name).getOrElse(""),
        s"${prev.schemaFingerprint} -> ${cur.schemaFingerprint}")

    val pl = prev.columnLineage.map(m => m.output -> m).toMap
    cur.columnLineage.foreach { m =>
      pl.get(m.output).foreach { p =>
        if (p.expression != m.expression)
          out += Finding("derivation-changed", m.output,
            s"${p.expression.getOrElse("<identity>")} -> ${m.expression.getOrElse("<identity>")}")
        if (p.sources.toSet != m.sources.toSet)
          out += Finding("sources-changed", m.output,
            s"${p.sources.sorted.mkString(",")} -> ${m.sources.sorted.mkString(",")}")
      }
    }

    val pIn = prev.inputs.map(i => i.name -> i).toMap
    val cIn = cur.inputs.map(i => i.name -> i).toMap
    (cIn.keySet -- pIn.keySet).toSeq.sorted.foreach(n =>
      out += Finding("input-added", n, "new upstream entity"))
    (pIn.keySet -- cIn.keySet).toSeq.sorted.foreach(n =>
      out += Finding("input-removed", n, "upstream entity dropped"))
    (pIn.keySet & cIn.keySet).toSeq.sorted.foreach { n =>
      val (a, b) = (pIn(n).columnsRead.toSet, cIn(n).columnsRead.toSet)
      if (a != b)
        out += Finding("columns-read-changed", n,
          s"+${(b -- a).toSeq.sorted.mkString(",")} -${(a -- b).toSeq.sorted.mkString(",")}")
    }

    if (out.isEmpty && prev.planFingerprint.nonEmpty &&
        prev.planFingerprint != cur.planFingerprint) {
      // surface WHAT each run did, not just that the opaque hash moved —
      // the recorded query text (head-capped here for the finding line;
      // the full capped text stays on the records)
      def head(r: LineageRecord): String =
        r.queryText.map(t => t.linesIterator.mkString(" ").take(160)).getOrElse("")
      val texts =
        if (prev.queryText.isDefined || cur.queryText.isDefined)
          s" [query: '${head(prev)}' -> '${head(cur)}']"
        else ""
      out += Finding("plan-changed", cur.output.map(_.name).getOrElse(""),
        s"${prev.planFingerprint} -> ${cur.planFingerprint}$texts")
    }

    (prev.rowsWritten, cur.rowsWritten) match {
      case (Some(a), Some(b))
          if (a == 0) != (b == 0) ||
            (a > 0 && b > 0 && (b.toDouble / a >= SWING || a.toDouble / b >= SWING)) =>
        out += Finding("rowcount-swing", cur.output.map(_.name).getOrElse(""),
          s"$a -> $b rows")
      case _ => ()
    }
    out.toSeq
  }

  /** Row-count swing factor that counts as drift. */
  private[graft] val SWING = 2.0

  /** Per-output diff of the LATEST two successful runs in a record set
    * (e.g. a reloaded [[LineageCatalog]]); outputs with fewer than two
    * runs are absent. Ordered by (timestampMs, durationNs) so two runs
    * in the same millisecond still diff deterministically. */
  def latestDiffs(records: Seq[LineageRecord]): Map[String, Seq[Finding]] =
    records
      .filter(r => r.status == "success" && r.output.isDefined)
      .groupBy(_.output.get.name)
      .collect { case (name, rs) if rs.size >= 2 =>
        val sorted = rs.sortBy(r => (r.timestampMs, r.durationNs))
        name -> compareRuns(sorted(sorted.size - 2), sorted.last)
      }
}
