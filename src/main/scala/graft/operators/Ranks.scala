package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed exact order statistics: global average ranks with tie
  * handling, computed WITHOUT a global sort, a single-task window, or a
  * driver-side materialization of the data.
  *
  * The classic single-node way to rank is `rank() OVER (ORDER BY v)` — an
  * unpartitioned window that drags the whole input through one task, the
  * exact shape PlanAuditSpec bans over data-proportional frames. The
  * scale-correct equivalent is the two-pass range-partition pattern:
  *
  *   1. reduce to the distinct-value frame: `groupBy(v).count()` —
  *      map-side combinable, so the shuffle carries |distinct| rows;
  *   2. `repartitionByRange(v)` + `sortWithinPartitions`: partition i
  *      holds values strictly below partition i+1's, each sorted locally
  *      in parallel (this is how Spark's own global sort places data —
  *      we just stop before its single-consumer merge);
  *   3. collect ONE Long per partition (the partition's total count — a
  *      ≤|partitions| driver artifact, not data) and prefix-sum those
  *      into per-partition global offsets;
  *   4. a per-partition scan turns (offset, local running count) into the
  *      exact global rank of every distinct value.
  *
  * Ranks are returned doubled (`rank2 = 2·avg_rank`) so ties' average
  * ranks (k + 1/2) stay exact INTEGERS — downstream moments fold as
  * DECIMAL(38,0) with zero float error (the q_corr_matrix discipline).
  * Rank-based statistics (Mann-Whitney U, Spearman ρ) then reduce to
  * exact-integer moment algebra plus one double division at the edge.
  */
object Ranks {

  /** Average 1-based ranks for every distinct value of `values`'s single
    * numeric column: (v DOUBLE, cnt BIGINT, rank2 BIGINT) with
    * rank2 = 2·avg_rank = 2·|{x : x < v}| + cnt + 1.
    *
    * The returned frame is localCheckpoint-backed (step 3's offsets
    * action materializes it), so consumers joining it back onto the fact
    * never replay the distinct-count shuffle.
    */
  def avgRank2(s: SparkSession, values: DataFrame): DataFrame = {
    import s.implicits._
    val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
    // persist the distinct-count frame (r14): repartitionByRange's
    // RangePartitioner SAMPLING job runs the whole upstream (corpus scan
    // + join + distinct agg) once, and the range shuffle then computed it
    // AGAIN — the r13 lazy double-compute pattern, one full corpus pass
    // per avgRank2 call (two in q_spearman). The frame is the
    // |distinct values| reduction, bounded by the value domain, and
    // MEMORY_AND_DISK preserves lineage (executor loss recomputes).
    val counts = values.toDF("raw")
      .groupBy(col("raw").cast("double").as("v"))
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ranged = counts.repartitionByRange(parts, col("v"))
      .sortWithinPartitions("v")
      .as[(Double, Long)]
      .rdd
    // one materialization serves both the totals action and the rank scan
    ranged.localCheckpoint()
    val totals = ranged
      .mapPartitions(it => Iterator.single(it.map(_._2).sum))
      .collect()
    val offsets = totals.scanLeft(0L)(_ + _)
    ranged.mapPartitionsWithIndex { (pid, it) =>
      var run = offsets(pid)
      it.map { case (v, c) => val before = run; run += c; (v, c, 2 * before + c + 1) }
    }.toDF("v", "cnt", "rank2")
  }
}
