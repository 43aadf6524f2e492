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

  /** Entities reachable downstream of `root` with their minimum hop
    * depth (root itself at depth 0). */
  def downstream(s: SparkSession, records: Seq[LineageRecord], root: String,
      maxDepth: Int = 20): DataFrame = {
    import s.implicits._
    val e = edges(s, records).cache()
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
      rootColumn: String, maxDepth: Int = 20): DataFrame = {
    import s.implicits._
    val e = columnEdges(s, records).cache()
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
      // closure is the distributed loop above
      val cones = roots.map { r =>
        val cone = downstream(s, records, r, maxDepth)
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
