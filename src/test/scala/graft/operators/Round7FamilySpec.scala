package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Driver-side replays and invariants for the round-7 additions:
  * trade-graph triangles, TWAP, seasonality, and the LSH→edit-distance /
  * containment dedup verifiers.
  */
class Round7FamilySpec extends AnyFunSpec with SparkTestBase {

  it("q_graph_triangles matches a driver-side census of the same edge set") {
    val row = Graph.qGraphTriangles(spark, sfDir).collect()(0)
    // rebuild the thresholded edge set independently
    val pairs = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .select(least(col("c_nationkey"), col("s_nationkey")).as("a"),
        greatest(col("c_nationkey"), col("s_nationkey")).as("b"))
      .groupBy("a", "b").count().collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
    val mean = pairs.map(_._2).sum.toDouble / pairs.length
    val edges = pairs.filter(_._2 >= mean).map(_._1).toSet
    val nodes = edges.flatMap(e => Set(e._1, e._2))
    val tri = (for {
      (a, b) <- edges; (b2, c) <- edges if b2 == b && edges((a, c))
    } yield (a, b, c)).size
    assert(row.getLong(0) == nodes.size, "n_nodes")
    assert(row.getLong(1) == edges.size, "n_edges")
    assert(row.getLong(2) == tri, "n_triangles")
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map(_._2.size)
    val triads = deg.map(d => d.toLong * (d - 1) / 2).sum
    assert(row.getDouble(3) ==
      BigDecimal(3.0 * tri / triads).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  it("q_markov_transitions matches a driver-side sequential path replay") {
    val out = EventOps.qMarkovTransitions(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3), r.getInt(4))))
      .toMap
    // replay: per-user ordered walk, count bigrams in plain Scala
    val walked = EventOps.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).values
      .flatMap { evs =>
        evs.sortBy(e => (e._2.toInstant.getEpochSecond * 1000000L + e._2.toInstant.getNano / 1000, e._3))
          .map(_._4).sliding(2).collect { case Array(a, b) => (a, b) }
      }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val totals = walked.groupBy(_._1._1).map { case (c, m) => c -> m.values.sum }
    // every reported transition carries the replayed count and probability
    out.foreach { case ((cur, nxt), (n, prob, rk)) =>
      assert(walked((cur, nxt)) == n, s"$cur->$nxt count")
      assert(math.abs(prob - n.toDouble / totals(cur)) < 1e-6, s"$cur->$nxt prob")
      assert(rk >= 1 && rk <= 3)
    }
    // and each state's reported top-3 really is the replayed top-3
    walked.groupBy(_._1._1).foreach { case (cur, m) =>
      val top = m.toSeq.map { case ((_, nxt), n) => (nxt, n) }
        .sortBy { case (nxt, n) => (-n, nxt) }.take(3).map(_._1)
      val got = out.collect { case ((c, nxt), (_, _, rk)) if c == cur => (rk, nxt) }
        .toSeq.sortBy(_._1).map(_._2)
      assert(got == top, s"state $cur top-3")
    }
  }

  it("q_dedup_semantic drops exactly the planted near-duplicates, inside their clusters") {
    val rows = Similarity.qDedupSemantic(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val n = Tables.embeddings(spark, sfDir).count()
    val planted = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 25 === 0).count()
    assert(planted > 0, "fixture is vacuous at this SF")
    // census covers the extended corpus; drops are exactly the fixture
    assert(rows.map(_._2).sum == n + planted, "per-cell members must cover corpus+dups")
    assert(rows.map(_._3).sum == planted,
      s"expected exactly the $planted planted dups dropped")
    rows.foreach { case (cell, members, dropped, frac) =>
      assert(dropped <= members && frac == BigDecimal(dropped.toDouble / members)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"cell $cell")
    }
  }

  it("q_coreset_kcenter matches a driver-side greedy farthest-point replay") {
    val out = Similarity.qCoresetKcenter(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val embs = Tables.embeddings(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + (a(i) - b(i)) * (a(i) - b(i)))
    var mind = embs.filter(_._1 != embs.head._1)
      .map { case (id, v) => id -> d2(v, embs.head._2) }.toMap
    val replay = scala.collection.mutable.ArrayBuffer((0, embs.head._1, 0.0))
    val byId = embs.toMap
    (1 until 8).foreach { r =>
      val (farId, farD) = mind.toSeq
        .maxBy { case (id, d) => (BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP), -id) }
      replay += ((r, farId, farD))
      mind = (mind - farId).map { case (id, d) => id -> math.min(d, d2(byId(id), byId(farId))) }
    }
    assert(out.length == 8)
    out.zip(replay).foreach { case ((gr, gid, gd), (er, eid, ed)) =>
      assert(gr == er && gid == eid, s"round $er picked $gid, replay wants $eid")
      assert(math.abs(gd - ed) < 1e-6, s"round $er dist")
    }
    // coverage property: every point is within the last pick's distance
    // of SOME chosen center (greedy k-center's defining invariant:
    // selection distances are non-increasing)
    val dists = replay.toSeq.drop(1).map(_._3)
    assert(dists == dists.sorted.reverse, "selection distances must be non-increasing")
  }

  it("q_time_weighted_avg matches a sequential per-day replay") {
    val got = EventOps.qTimeWeightedAvg(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> ((r.getDouble(2), r.getLong(3))))
      .toMap
    val evs = EventOps.events(spark, sfDir)
      .select(col("event_type"), col("ts").cast("double"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))
    val byKey = evs.groupBy { case (t, sec, _, _) =>
      (t, java.time.LocalDate.ofEpochDay(math.floor(sec / 86400.0).toLong).toString)
    }
    byKey.foreach { case (k, rows) =>
      val seq = rows.sortBy(r => (r._2, r._3))
      val segs = seq.zip(seq.tail).map { case (cur, nxt) => (cur._4, nxt._2 - cur._2) }
      if (segs.nonEmpty) {
        val twap = segs.map { case (v, dt) => v * dt }.sum / segs.map(_._2).sum
        val (gtwap, gn) = got(k)
        assert(gn == segs.length, s"$k n_seg")
        assert(math.abs(gtwap - twap) < 1e-5, s"$k twap: got $gtwap want $twap")
      } else assert(!got.contains(k), s"$k single-event day must emit no row")
    }
  }

  it("q_seasonal_profile shares sum to 1 per type and flag exactly the modal day") {
    val rows = EventOps.qSeasonalProfile(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(4), r.getInt(5)))
    rows.groupBy(_._1).foreach { case (t, trs) =>
      assert(math.abs(trs.map(_._4).sum - 1.0) < 1e-4, s"$t shares")
      val maxN = trs.map(_._3).max
      trs.foreach { r =>
        assert((r._5 == 1) == (r._3 == maxN), s"$t dow ${r._2} peak flag")
      }
      assert(trs.map(_._2).forall(d => d >= 0 && d <= 6))
    }
  }

  it("q_dedup_editdist scores every LSH candidate pair with a JVM Levenshtein replay") {
    val texts = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rows = Dedup.qDedupEditdist(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (da, db) = (r.getLong(0), r.getLong(1))
      val (ta, tb) = (texts(da), texts(db))
      val want = BigDecimal(1.0 - lev(ta, tb).toDouble / math.max(ta.length, tb.length))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == want, s"pair ($da,$db)")
      assert((r.getInt(4) == 1) == (r.getDouble(3) >= Dedup.EDIT_T))
    }
  }

  it("q_text_containment reports consistent directed scores and catches subset docs") {
    val rows = Dedup.qTextContainment(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (shared, ca, cb) = (r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(ca > 0 && ca <= 1.0 + 1e-9 && cb > 0 && cb <= 1.0 + 1e-9)
      assert(math.max(ca, cb) >= Dedup.CONT_T - 1e-9)
      val dirOk = r.getString(5) match {
        case "mutual" => ca >= Dedup.CONT_T && cb >= Dedup.CONT_T
        case "a_in_b" => ca >= Dedup.CONT_T && cb < Dedup.CONT_T
        case "b_in_a" => cb >= Dedup.CONT_T && ca < Dedup.CONT_T
      }
      assert(dirOk, s"direction row $r")
      assert(shared > 0)
    }
    // a synthetic strict-subset document must be caught as directed containment
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, base), // every shingle of doc 1 appears in doc 2 -> cont_a = 1
      (2L, base + " " + (1 to 10).map(i => s"PAD$i").mkString(" "))
    ).toDF("doc_id", "text")
    withTempView(corpus, "containment_docs") { name =>
      val got = Dedup.containmentPairs(spark.table(name)).collect()
      assert(got.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L &&
        r.getString(5) == "a_in_b"), s"subset not caught: ${got.mkString(";")}")
    }
  }

  private def withTempView(df: org.apache.spark.sql.DataFrame, name: String)(
      f: String => Unit): Unit = {
    df.createOrReplaceTempView(name)
    try f(name) finally spark.catalog.dropTempView(name)
  }
}
