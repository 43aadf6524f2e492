package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: dot product over two `array<double>`
  * columns with whole-stage codegen — the [[CosineSimilarity]] kernel
  * minus the norms. It replaces the composed
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` column tree bit-for-bit:
  * left-to-right IEEE-754 accumulation, NULL when either array is NULL,
  * any element is NULL, or the lengths differ (`zip_with` null-pads the
  * shorter side, which nulls the fold).
  *
  * Why it exists (r13 optimization): higher-order-function lambdas run
  * INTERPRETED in Spark with no common-subexpression elimination — the
  * LSH banding path evaluates PLANES (24) such dots per embedding row,
  * which made candidate generation expression-interpreter-bound. As a
  * codegen kernel each dot is one fused loop inside the generated stage.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_dot requires (array<double>, array<double>), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var ab = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      ab += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    ab
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val ab = ctx.freshName("ab")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  double $ab = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $ab += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $ab; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** SQL-registry descriptor (`SparkSessionExtensions.injectFunction`). */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_dot(a, b) takes exactly 2 array arguments")
      // Coerce numeric arrays (array<float>, array<int>, ...) the way the
      // replaced aggregate(zip_with(...)) HOF form implicitly did.
      // ImplicitCastInputTypes is unusable outside org.apache.spark.sql
      // (AbstractDataType is private[sql] in Spark 4), so the SQL entry
      // point casts instead; Cast(array<double> -> array<double>) is
      // elided by SimplifyCasts, leaving typed call sites untouched.
      val c = children.map(Cast(_, ArrayType(DoubleType)))
      DotProduct(c.head, c.last)
    })

  /** Idempotent runtime registration for sessions built without
    * `spark.sql.extensions=graft.plans.GraftExtensions`. */
  def register(spark: SparkSession): Unit =
    if (!spark.catalog.functionExists("graft_dot")) {
      spark.sessionState.functionRegistry
        .registerFunction(descriptor._1, descriptor._2, descriptor._3)
      ()
    }
}
