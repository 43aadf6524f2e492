package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension path (SURVEY §2.8): per-key top-k as a FIRST-
  * CLASS operator — logical node → planner strategy → two-phase physical
  * operator — instead of the `row_number() OVER (PARTITION BY …)` shape,
  * which materializes and SORTS every key's full row set before the
  * filter throws away all but k rows.
  *
  * Physical shape (the aggregate-style split):
  *   TopKPerKeyExec(final)            -- exact top-k, keys co-located
  *     +- Exchange hashpartitioning(key)   [inserted by EnsureRequirements]
  *        +- TopKPerKeyExec(partial)  -- ≤k candidates per key PER PARTITION
  *           +- child
  *
  * The partial phase bounds the shuffle to k rows per (partition, key) —
  * for a hot key at 100 TB that is k·#partitions rows through the wire
  * instead of the key's entire row set into one sort task. State per task
  * is a k-sized heap per distinct key seen (bounded by k·|keys in task|).
  * Ordering is (ord DESC, tie ASC) under the expressions' NATIVE type
  * ordering (no lossy cast — long ordinals above 2^53 rank exactly);
  * callers supply a tie column to make the result deterministic.
  * `TopK.perKey` inserts a null filter on ord/tie (a null has no rank in
  * a top-k), and the exec still fails fast if a null reaches evaluation
  * (e.g. the node is constructed directly with nullable expressions).
  */
case class TopKPerKey(key: Expression, ord: Expression, tie: Expression,
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

case class TopKPerKeyExec(key: Expression, ord: Expression, tie: Expression,
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(Seq(key)))

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExpr = key
    val ordExpr = ord
    val tieExpr = tie
    val kk = k
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(Seq(keyExpr), childOutput)
      val boundOrd = BindReferences.bindReference(ordExpr, childOutput)
      val boundTie = BindReferences.bindReference(tieExpr, childOutput)
      // Native type orderings — a LongType ord compares as long (no
      // double round-trip losing precision above 2^53).
      val ordCmp = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(boundOrd.dataType)
      val tieCmp = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(boundTie.dataType)
      // eval results over unsafe rows may alias the (reused) row buffer
      def owned(v: Any): Any = v match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.copy()
        case x => x
      }
      // min-heap on goodness: head is the WORST kept row (smallest ord,
      // then largest tie) — a new row replaces it when strictly better
      val worstFirst = new Ordering[(Any, Any, InternalRow)] {
        override def compare(x: (Any, Any, InternalRow), y: (Any, Any, InternalRow)): Int = {
          val c = ordCmp.compare(y._1, x._1)
          if (c != 0) c else tieCmp.compare(x._2, y._2)
        }
      }
      val heaps = scala.collection.mutable.HashMap
        .empty[org.apache.spark.sql.catalyst.expressions.UnsafeRow,
          scala.collection.mutable.PriorityQueue[(Any, Any, InternalRow)]]
      iter.foreach { row =>
        val hk = keyProj(row)
        val o = boundOrd.eval(row)
        val t = boundTie.eval(row)
        if (o == null || t == null) throw new IllegalStateException(
          "TopKPerKeyExec: null ord/tie evaluation result — a null has no " +
            "rank in a top-k; filter nulls before the operator (TopK.perKey does)")
        val heap = heaps.getOrElseUpdate(hk.copy(),
          scala.collection.mutable.PriorityQueue.empty(worstFirst))
        if (heap.size < kk) heap.enqueue((owned(o), owned(t), row.copy()))
        else {
          val (wo, wt, _) = heap.head
          if (ordCmp.compare(o, wo) > 0 ||
              (ordCmp.compare(o, wo) == 0 && tieCmp.compare(t, wt) < 0)) {
            heap.dequeue(); heap.enqueue((owned(o), owned(t), row.copy()))
          }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._3))
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans the logical node as partial-then-final (EnsureRequirements
  * inserts the key exchange between them, exactly as it does for
  * aggregates). */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(key, ord, tie, k, child) =>
      val planned = planLater(child)
      TopKPerKeyExec(key, ord, tie, k, partial = false,
        TopKPerKeyExec(key, ord, tie, k, partial = true, planned)) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Runtime registration (GraftExtensions injects the same strategy for
    * extension-configured sessions; this covers plain sessions). */
  def register(s: org.apache.spark.sql.SparkSession): Unit =
    if (!s.experimental.extraStrategies.contains(TopKStrategy))
      s.experimental.extraStrategies = s.experimental.extraStrategies :+ TopKStrategy

  /** Per-key top-k through the custom operator: rows of `df` holding the
    * k largest `ord` values per `key` (ties broken by smallest `tie`),
    * compared under their native types (no lossy double cast). Rows with
    * a null ord/tie are filtered out first — a null has no rank. */
  def perKey(df: DataFrame, key: Column, ord: Column, tie: Column, k: Int): DataFrame = {
    register(df.sparkSession)
    import org.apache.spark.sql.GraftBridge.expression
    val nonNull = df.filter(ord.isNotNull && tie.isNotNull)
    val plan = TopKPerKey(expression(key), expression(ord),
      expression(tie), k, nonNull.queryExecution.analyzed)
    org.apache.spark.sql.GraftBridge.ofRows(df.sparkSession, plan)
  }
}
