package graft.lineage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Impact analysis over emitted lineage records: the dataset-level
  * dependency graph (input entity → output entity per successful run) and
  * its downstream transitive closure — "if this table is late/wrong, what
  * breaks?", the question a lineage catalog exists to answer.
  *
  * Scale design: the edge set lives in a DataFrame (a production catalog
  * accumulates millions of runs), closure is frontier-expansion with one
  * equality join per level, localCheckpoint per round to stop plan growth
  * (the ccLabels pattern from Dedup), and a depth cap with a warning so a
  * cyclic or adversarial graph cannot loop the driver. Depth counts are
  * MIN-hop (BFS order guarantees first discovery is shortest).
  */
object LineageGraph {

  /** Distinct (src, dst) dataset edges from successful runs that wrote an
    * output. Self-edges (a job that compacts a table in place) are kept —
    * the closure treats them as already-visited and terminates. */
  def edges(s: SparkSession, records: Seq[LineageRecord]): DataFrame = {
    import s.implicits._
    records
      .filter(r => r.status == "success" && r.output.isDefined)
      .flatMap(r => r.inputs.map(i => (i.name, r.output.get.name)))
      .distinct
      .toDF("src", "dst")
  }

  /** Dataset edges straight off a catalog DataFrame
    * ([[LineageCatalog.loadDf]]) — the million-record path: the catalog
    * never materializes on the driver; extraction is a filter + two
    * explodes + distinct, all distributed. Same edge semantics as
    * [[edges]] (successful runs that wrote an output; self-edges kept).
    */
  def edgesDf(catalog: DataFrame): DataFrame =
    catalog
      .filter(col("status") === "success" && col("output.name").isNotNull)
      .select(explode(col("inputs")).as("in"), col("output.name").as("dst"))
      .select(col("in.name").as("src"), col("dst"))
      .distinct()

  /** Column edges off a catalog DataFrame — [[columnEdges]] without the
    * driver round-trip: explode the columnLineage mappings, then their
    * source lists. */
  def columnEdgesDf(catalog: DataFrame): DataFrame =
    catalog
      .filter(col("status") === "success" && col("output.name").isNotNull)
      .select(col("output.name").as("out"), explode(col("columnLineage")).as("m"))
      .select(explode(col("m.sources")).as("src"),
        concat(col("out"), lit("."), col("m.output")).as("dst"))
      .distinct()

  /** [[downstream]] over a persisted catalog path — loads the JSONL as a
    * distributed scan and walks [[edgesDf]]; the driver holds only the
    * frontier bookkeeping, never the record set. */
  def downstreamCatalog(s: SparkSession, catalogPath: String, root: String,
      maxDepth: Int = 20): DataFrame =
    downstreamOverEdges(s, edgesDf(LineageCatalog.loadDf(s, catalogPath)),
      root, maxDepth)

  /** Entities reachable downstream of `root` with their minimum hop
    * depth (root itself at depth 0). */
  def downstream(s: SparkSession, records: Seq[LineageRecord], root: String,
      maxDepth: Int = 20): DataFrame =
    downstreamOverEdges(s, edges(s, records), root, maxDepth)

  /** The closure walk itself, over any (src, dst) edge frame. */
  def downstreamOverEdges(s: SparkSession, edgeFrame: DataFrame, root: String,
      maxDepth: Int = 20): DataFrame = {
    import s.implicits._
    val e = edgeFrame.cache()
    try {
      var frontier = Seq(root).toDF("entity").withColumn("depth", lit(0))
      var all = frontier
      var depth = 0
      var converged = false
      while (!converged && depth < maxDepth) {
        depth += 1
        val next = frontier.join(e, col("entity") === col("src"))
          .select(col("dst").as("entity")).distinct()
          .join(all.select(col("entity").as("seen")),
            col("entity") === col("seen"), "left_anti")
          .withColumn("depth", lit(depth))
          .localCheckpoint()
        if (next.isEmpty) converged = true
        else {
          all = all.unionByName(next).localCheckpoint()
          frontier = next
        }
      }
      if (!converged)
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"lineage closure capped at depth $maxDepth below '$root'")
      all
    } finally e.unpersist()
  }

  /** Distinct COLUMN-level edges from successful runs: one
    * `src = "entity.column"` → `dst = "outputEntity.column"` edge per
    * column-lineage mapping — the column-granular graph under the
    * dataset-level one above. */
  def columnEdges(s: SparkSession, records: Seq[LineageRecord]): DataFrame = {
    import s.implicits._
    records
      .filter(r => r.status == "success" && r.output.isDefined)
      .flatMap { r =>
        val out = r.output.get.name
        r.columnLineage.flatMap(m => m.sources.map(src => (src, s"$out.${m.output}")))
      }
      .distinct
      .toDF("src", "dst")
  }

  /** Columns reachable downstream of `rootColumn` ("entity.column") with
    * min-hop depth — "every report field this column feeds", the
    * column-granular blast radius a schema change review needs. Same
    * frontier-expansion discipline as [[downstream]]. */
  def downstreamColumns(s: SparkSession, records: Seq[LineageRecord],
      rootColumn: String, maxDepth: Int = 20): DataFrame =
    downstreamColumnsOverEdges(s, columnEdges(s, records), rootColumn, maxDepth)

  /** [[downstreamColumns]] over a persisted catalog path (no driver
    * materialization of the record set). */
  def downstreamColumnsCatalog(s: SparkSession, catalogPath: String,
      rootColumn: String, maxDepth: Int = 20): DataFrame =
    downstreamColumnsOverEdges(s,
      columnEdgesDf(LineageCatalog.loadDf(s, catalogPath)), rootColumn, maxDepth)

  def downstreamColumnsOverEdges(s: SparkSession, edgeFrame: DataFrame,
      rootColumn: String, maxDepth: Int = 20): DataFrame = {
    import s.implicits._
    val e = edgeFrame.cache()
    try {
      var frontier = Seq(rootColumn).toDF("column").withColumn("depth", lit(0))
      var all = frontier
      var depth = 0
      var converged = false
      while (!converged && depth < maxDepth) {
        depth += 1
        val next = frontier.join(e, col("column") === col("src"))
          .select(col("dst").as("column")).distinct()
          .join(all.select(col("column").as("seen")),
            col("column") === col("seen"), "left_anti")
          .withColumn("depth", lit(depth))
          .localCheckpoint()
        if (next.isEmpty) converged = true
        else {
          all = all.unionByName(next).localCheckpoint()
          frontier = next
        }
      }
      if (!converged)
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"column lineage closure capped at depth $maxDepth below '$rootColumn'")
      all
    } finally e.unpersist()
  }

  /** PII taint propagation — the governance crossover between the column
    * lineage graph and the privacy surface: given the columns a
    * classifier (or a steward) marked as PII at the sources, every
    * downstream column DERIVED from them is tainted, through renames,
    * expressions and joins alike. One multi-root frontier walk over
    * [[columnEdges]] (state = (root, column) pairs — all roots propagate
    * in the same distributed pass, not one BFS per root); min-hop depth
    * per (root, column). Returns (pii_root, column, depth) with depth 0
    * rows for the roots themselves.
    */
  def piiTaint(s: SparkSession, records: Seq[LineageRecord],
      taintedRoots: Seq[String], maxDepth: Int = 20): DataFrame =
    piiTaintOverEdges(s, columnEdges(s, records), taintedRoots, maxDepth)

  /** [[piiTaint]] over a persisted catalog path. */
  def piiTaintCatalog(s: SparkSession, catalogPath: String,
      taintedRoots: Seq[String], maxDepth: Int = 20): DataFrame =
    piiTaintOverEdges(s, columnEdgesDf(LineageCatalog.loadDf(s, catalogPath)),
      taintedRoots, maxDepth)

  def piiTaintOverEdges(s: SparkSession, edgeFrame: DataFrame,
      taintedRoots: Seq[String], maxDepth: Int = 20): DataFrame = {
    import s.implicits._
    val e = edgeFrame.cache()
    try {
      var frontier = taintedRoots.map(r => (r, r)).toDF("pii_root", "column")
        .withColumn("depth", lit(0))
      var all = frontier
      var depth = 0
      var converged = false
      while (!converged && depth < maxDepth) {
        depth += 1
        val next = frontier.join(e, col("column") === col("src"))
          .select(col("pii_root"), col("dst").as("column")).distinct()
          .join(all.select(col("pii_root").as("sr"), col("column").as("sc")),
            col("pii_root") === col("sr") && col("column") === col("sc"),
            "left_anti")
          .withColumn("depth", lit(depth))
          .localCheckpoint()
        if (next.isEmpty) converged = true
        else {
          all = all.unionByName(next).localCheckpoint()
          frontier = next
        }
      }
      if (!converged)
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"PII taint closure capped at depth $maxDepth")
      all
    } finally e.unpersist()
  }

  /** Entity rollup of [[piiTaint]]: per output entity, how many of its
    * columns are PII-derived and from which roots — the table a privacy
    * review reads to find datasets that silently re-materialize PII. */
  def piiTaintReport(s: SparkSession, records: Seq[LineageRecord],
      taintedRoots: Seq[String], maxDepth: Int = 20): DataFrame = {
    val taint = piiTaint(s, records, taintedRoots, maxDepth)
      .filter(col("depth") > 0)
      .withColumn("entity",
        regexp_extract(col("column"), "^(.*)\\.[^.]+$", 1))
    taint.groupBy("entity")
      .agg(countDistinct("column").as("n_tainted_columns"),
        sort_array(collect_set("pii_root")).as("pii_roots"))
      .orderBy(desc("n_tainted_columns"), col("entity"))
  }

  /** Fan-out report: every entity with its direct consumer count and the
    * size of its full downstream cone — the blast-radius ranking a data
    * platform reviews before a risky backfill. */
  def impactReport(s: SparkSession, records: Seq[LineageRecord],
      maxDepth: Int = 20): DataFrame = {
    import s.implicits._
    val e = edges(s, records).cache()
    try {
      val roots = e.select(col("src").as("entity")).distinct()
        .collect().map(_.getString(0))
      // per-root BFS; the root set is catalog-entity-sized (bounded), each
      // closure is the distributed loop above — over the edge frame
      // built ONCE here, not re-derived from the record Seq per root
      val cones = roots.map { r =>
        val cone = downstreamOverEdges(s, e, r, maxDepth)
          .filter(col("depth") > 0).count()
        (r, cone)
      }.toSeq.toDF("entity", "downstream_count")
      val direct = e.groupBy("src").agg(countDistinct("dst").as("direct_consumers"))
        .withColumnRenamed("src", "entity")
      direct.join(cones, "entity")
        .orderBy(desc("downstream_count"), col("entity"))
    } finally e.unpersist()
  }
}
