package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Order-preserving map double → signed long: `f(a) < f(b)` iff `a < b`
  * (NaN excluded by contract — callers filter it; -0.0 orders just below
  * +0.0). The standard IEEE-754 bit trick (as used by columnar formats
  * for double sort keys): non-negative doubles keep their raw bits
  * (already ascending), negative doubles map to `-(magnitudeBits) - 1`
  * (more negative double → larger magnitude → smaller key).
  *
  * The point of the transform: its HIGH bits are a distribution-free
  * histogram key. Bucketing on `f >> shift` slices the double line at
  * sign/exponent/mantissa-prefix boundaries — exponentially spaced, so
  * no data-dependent [min, max] scaling is needed and a single extreme
  * outlier cannot collapse the whole corpus into one bucket the way
  * linear range-bucketing does. */
case class DoubleOrderBits(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"DoubleOrderBits requires double input, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val raw = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
    if (raw >= 0L) raw else -(raw & Long.MaxValue) - 1L
  }

  // the bit trick inlines into whole-stage codegen (it anchors the
  // score-selection range-bucket scans); a CodegenFallback marker here
  // would un-fuse the enclosing stage entirely
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val raw = ctx.freshName("rawBits")
      s"""
         |long $raw = Double.doubleToLongBits($c);
         |${ev.value} = ($raw >= 0L) ? $raw : -($raw & Long.MAX_VALUE) - 1L;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DoubleOrderBits =
    copy(child = newChild)
}
