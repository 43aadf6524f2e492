package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout optimization: Z-ORDER (Morton) multi-dimensional
  * clustering, the lakehouse lever that turns min/max file statistics
  * into multi-column data skipping. A table laid out by one key prunes
  * scans on that key only; interleaving the bits of two keys gives a
  * single sort key whose contiguous ranges are small HYPERRECTANGLES in
  * both dimensions — so a predicate on EITHER column prunes most files.
  *
  * [[qZorderLayout]] quantifies that directly: bucket lineitem 64 ways
  * under (a) the natural orderkey layout and (b) the z-order key, and
  * report each layout's mean per-bucket min/max WIDTH for both
  * dimensions — the width IS the expected fraction of the domain a
  * point/range predicate must scan under min/max pruning. At 100 TB the
  * write path is `repartitionByRange(zkey)` + per-file stats (the same
  * zkey expression, a sampled range exchange, no global sort); the
  * bucket here is the deterministic stand-in for the file boundary so
  * the oracle can mirror it exactly.
  *
  * All arithmetic is integer bit-shuffling plus one double division with
  * identical IEEE semantics in both engines; the 1-row domain-stats
  * frame rides a broadcast (bounded by construction).
  */
object Layout {

  private val ZBITS = 8     // per-dimension resolution of the z-curve
  private val BUCKET_SHIFT = 10 // 16-bit zkey >> 10 = 64 buckets (3+3 bits)
  private val NBUCKETS = 64L

  /** Interleave the low [[ZBITS]] bits of x (even positions) and y (odd). */
  private[graft] def morton(x: Column, y: Column): Column =
    (0 until ZBITS).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  private def mortonSql(x: String, y: String): String =
    (0 until ZBITS).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  def qZorderLayout(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_partkey", "l_suppkey")
    val stats = li.agg(max("l_partkey").as("mp"), max("l_suppkey").as("ms"),
      max("l_orderkey").as("mo"))
    val x = li.crossJoin(broadcast(stats))
    // scale each dimension onto 0..2^ZBITS-1 so both contribute equally
    // to the interleave regardless of raw domain width
    val p8 = floor(col("l_partkey") * math.pow(2, ZBITS) / (col("mp") + 1)).cast("long")
    val s8 = floor(col("l_suppkey") * math.pow(2, ZBITS) / (col("ms") + 1)).cast("long")
    val zbucket = shiftright(morton(p8, s8), BUCKET_SHIFT)
    val natural = floor(col("l_orderkey") * NBUCKETS / (col("mo") + 1)).cast("long")
    val tagged = x.select(lit("natural").as("layout"), natural.as("bucket"),
        col("l_partkey"), col("l_suppkey"))
      .unionByName(x.select(lit("zorder").as("layout"), zbucket.as("bucket"),
        col("l_partkey"), col("l_suppkey")))
    tagged.groupBy("layout", "bucket")
      .agg((max("l_partkey") - min("l_partkey")).as("pw"),
        (max("l_suppkey") - min("l_suppkey")).as("sw"))
      .groupBy("layout")
      .agg(count(lit(1)).as("n_buckets"),
        round(avg("pw"), 2).as("avg_partkey_width"),
        round(avg("sw"), 2).as("avg_suppkey_width"))
      .orderBy("layout")
  }

  // ------------------------------------------------- executed write path
  /** Z-ordered parquet write — the real thing, not the gauge: compute the
    * Morton key over the two scaled dimensions, `repartitionByRange` on
    * it (a SAMPLED range exchange — no global sort, the same cost class
    * as any repartition), sort within each partition so row groups
    * cluster too, and write one file per range. At 100 TB this is the
    * whole recipe; `nFiles` becomes the table's file budget.
    */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String,
      path: String, nFiles: Int): Unit = {
    val stats = df.agg(max(xCol).as("zw_mx"), max(yCol).as("zw_my"))
    val xs = floor(col(xCol) * math.pow(2, ZBITS) / (col("zw_mx") + 1)).cast("long")
    val ys = floor(col(yCol) * math.pow(2, ZBITS) / (col("zw_my") + 1)).cast("long")
    df.crossJoin(broadcast(stats))
      .withColumn("zw_key", morton(xs, ys))
      .repartitionByRange(nFiles, col("zw_key"))
      .sortWithinPartitions("zw_key")
      .drop("zw_key", "zw_mx", "zw_my")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file min/max skipping index over `cols` — what a lakehouse
    * table format records at write time, reconstructed here with one
    * scan + `input_file_name`. Row count is the FILE count, so the
    * frame is driver-small by construction at any data scale.
    */
  def fileStats(s: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(min(c).as(s"min_$c"), max(c).as(s"max_$c")))
    s.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Files whose [min,max] range on `c` can contain `value` — the
    * planning-time skip decision. Collect is bounded by file count. */
  def candidateFiles(stats: DataFrame, c: String, value: Long): Seq[String] =
    stats.filter(col(s"min_$c") <= value && col(s"max_$c") >= value)
      .select("file").collect().map(_.getString(0)).toSeq

  /** Read only the files min/max pruning admits for `c = value`, then
    * apply the residual filter (pruning is conservative; the filter is
    * still required for exactness — identical to format-level skipping).
    */
  def prunedRead(s: SparkSession, path: String, c: String, value: Long): DataFrame = {
    val cands = candidateFiles(fileStats(s, path, Seq(c)), c, value)
    if (cands.isEmpty) s.read.parquet(path).filter(lit(false))
    else s.read.parquet(cands: _*).filter(col(c) === value)
  }

  val oracleZorderLayout: String = {
    val two = math.pow(2, ZBITS).toLong
    s"""WITH st AS (
       |  SELECT max(l_partkey) AS mp, max(l_suppkey) AS ms, max(l_orderkey) AS mo
       |  FROM lineitem),
       |x AS (
       |  SELECT l_orderkey, l_partkey, l_suppkey,
       |    CAST(floor(l_partkey * $two.0 / (mp + 1)) AS BIGINT) AS p8,
       |    CAST(floor(l_suppkey * $two.0 / (ms + 1)) AS BIGINT) AS s8,
       |    CAST(floor(l_orderkey * $NBUCKETS.0 / (mo + 1)) AS BIGINT) AS nat
       |  FROM lineitem CROSS JOIN st),
       |b AS (
       |  SELECT 'natural' AS layout, nat AS bucket, l_partkey, l_suppkey FROM x
       |  UNION ALL
       |  SELECT 'zorder' AS layout, (${mortonSql("p8", "s8")}) >> $BUCKET_SHIFT AS bucket,
       |    l_partkey, l_suppkey FROM x),
       |g AS (
       |  SELECT layout, bucket,
       |    max(l_partkey) - min(l_partkey) AS pw,
       |    max(l_suppkey) - min(l_suppkey) AS sw
       |  FROM b GROUP BY layout, bucket)
       |SELECT layout, count(*) AS n_buckets,
       |  round(avg(pw), 2) AS avg_partkey_width,
       |  round(avg(sw), 2) AS avg_suppkey_width
       |FROM g GROUP BY layout ORDER BY layout""".stripMargin
  }
}
