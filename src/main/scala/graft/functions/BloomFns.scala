package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL surface over Spark's own bloom-filter sketch (the engine uses it
  * internally for AQE runtime filters; registering it makes the same
  * primitive available to queries):
  *
  *  - `graft_bloom_agg(longCol[, estItems])` — aggregate a column of
  *    64-bit hashes into a serialized bloom filter (binary).
  *  - `graft_bloom_contains(bloom, longVal)` — membership probe; false
  *    positives possible, false negatives impossible. Spark requires
  *    the bloom argument to be a constant or a SCALAR SUBQUERY (its own
  *    runtime filters are injected the same way), so probes are phrased
  *    `graft_bloom_contains((SELECT graft_bloom_agg(k) FROM build), k)`.
  *
  * The 100 TB pattern this enables: when a probe set is too large to
  * broadcast raw but its BLOOM fits in a task (bits vs values), build
  * the bloom in one aggregation, broadcast it, pre-filter the fact
  * table to probable matches, and run the exact join only on the
  * survivors — the shuffle carries the survivor fraction instead of
  * the whole fact table. See `Dedup.decontaminateBloom`.
  */
object BloomFns {

  private val DEFAULT_EST_ITEMS = 65536L

  val bloomAggDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(BloomFns.getClass.getName, "graft_bloom_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c)      => new BloomFilterAggregate(c, Literal(DEFAULT_EST_ITEMS))
        case Seq(c, est) => new BloomFilterAggregate(c, est)
        case _ => throw new IllegalArgumentException(
          "graft_bloom_agg(col[, estItems]) takes 1 or 2 arguments")
      })

  val bloomContainsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(BloomFns.getClass.getName, "graft_bloom_contains"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_bloom_contains(bloom, value) takes exactly 2 arguments")
        BloomFilterMightContain(children.head, children(1))
      })

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!spark.catalog.functionExists("graft_bloom_agg")) {
      reg.registerFunction(bloomAggDescriptor._1, bloomAggDescriptor._2, bloomAggDescriptor._3)
      ()
    }
    if (!spark.catalog.functionExists("graft_bloom_contains")) {
      reg.registerFunction(bloomContainsDescriptor._1, bloomContainsDescriptor._2,
        bloomContainsDescriptor._3)
      ()
    }
  }
}
