package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `vec_signdot(v, a, b)` — dot product of a float/double vector against the
  * deterministic pseudo-random ±1 hyperplane whose component i (1-based) has
  * sign `+1` iff `((a·i + b) mod P) mod 2 == 0`, with P = 2147483647 (the
  * same linear-congruential family as the MinHash permutations, so any
  * engine regenerates the plane from the two integers — no plane matrices).
  *
  * Native codegen replacement for the interpreted
  * `aggregate(zip_with(v, sequence(1, size(v)), ...))` fold on the
  * hyperplane-LSH path (s03): identical left-to-right sequential double
  * fold, so sign bits — and therefore buckets and oracles — are unchanged.
  * Null input or any null element → NULL (mirrors the HOF chain).
  */
case class VecSignDot(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  private val P = 2147483647L

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (second.dataType == LongType && third.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"vec_signdot expects BIGINT plane coefficients, got " +
          s"${second.dataType.simpleString}, ${third.dataType.simpleString}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_signdot expects an ARRAY<FLOAT|DOUBLE> vector, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_signdot"

  private def isFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any, a: Any, b: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val ca = a.asInstanceOf[Long]
    val cb = b.asInstanceOf[Long]
    val n = arr.numElements()
    val f = isFloat
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val x = if (f) arr.getFloat(i).toDouble else arr.getDouble(i)
      val sign = if (((ca * (i + 1) + cb) % P) % 2 == 0) 1.0 else -1.0
      acc += x * sign
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) (s: String, i: String) => s"(double) $s.getFloat($i)"
              else (s: String, i: String) => s"$s.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (v, a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        final int $n = $v.numElements();
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
          final double sign = ((($a * ($i + 1L) + $b) % ${P}L) % 2L == 0L) ? 1.0 : -1.0;
          $acc += ${get(v, i)} * sign;
        }
        if (!${ev.isNull}) ${ev.value} = $acc;
      """
    })
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): VecSignDot =
    copy(first = f, second = s, third = t)
}
