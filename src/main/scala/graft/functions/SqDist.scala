package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: squared L2 distance over two
  * `array<double>` columns with whole-stage codegen — replaces the
  * interpreted `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, _+_)`
  * column tree bit-for-bit (left-to-right IEEE-754 accumulation, NULL on
  * NULL array / NULL element / ragged lengths). The PQ paths evaluate
  * PQ_M·PQ_KSUB (128) such folds per vector during code assignment —
  * interpreter-bound before this kernel (r13 optimization, guide §4:
  * prefer codegen expressions on hot paths).
  */
case class SqDist(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_sqdist requires (array<double>, array<double>), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sqdist"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

object SqDist {

  /** SQL-registry descriptor (`SparkSessionExtensions.injectFunction`). */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_sqdist"),
    new ExpressionInfo(classOf[SqDist].getName, "graft_sqdist"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_sqdist(a, b) takes exactly 2 array arguments")
      // SQL entry point coerces numeric arrays like the replaced HOF form
      // did (see DotProduct.descriptor); no-op casts are elided.
      val c = children.map(Cast(_, ArrayType(DoubleType)))
      SqDist(c.head, c.last)
    })

  /** Idempotent runtime registration for sessions built without
    * `spark.sql.extensions=graft.plans.GraftExtensions`. */
  def register(spark: SparkSession): Unit =
    if (!spark.catalog.functionExists("graft_sqdist")) {
      spark.sessionState.functionRegistry
        .registerFunction(descriptor._1, descriptor._2, descriptor._3)
      ()
    }
}
