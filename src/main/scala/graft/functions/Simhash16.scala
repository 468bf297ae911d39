package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `simhash16(tokens)` — the 16-bit SimHash of a token array in ONE pass:
  * per token one md5 (first 8 hex chars as a 32-bit integer), ±1 per bit
  * per occurrence, sign-packed at the end.
  *
  * ORACLE CONTRACT: bit-identical to the explode + groupBy(16 conditional
  * sums) chain it replaces — integer sums are order-free, so the DuckDB
  * rendering (`('0x' || substr(md5(tok),1,8))::BIGINT`, bit sums, sign
  * pack) is unchanged. Removing the explode removes the exchange: the hash
  * never leaves the doc's row. Empty/NULL token array → NULL (such docs
  * previously dropped out of the groupBy).
  */
case class Simhash16Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash16 expects ARRAY<STRING>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash16"

  override protected def nullSafeEval(input: Any): Any =
    Simhash16.hash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName: two simhash16 calls over non-nullable children share one
    // codegen scope (nullSafeCodeGen only braces nullable children), so a
    // fixed local name would be a janino duplicate-declaration error.
    val h = ctx.freshName("simhash")
    nullSafeCodeGen(ctx, ev, c => s"""
      Long $h = graft.functions.Simhash16.hash($c);
      if ($h == null) { ${ev.isNull} = true; } else { ${ev.value} = $h.longValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Simhash16Expr =
    copy(child = newChild)
}

object Simhash16 {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Null for empty (or all-null-element) arrays — a doc with no tokens has
    * no hash. Null ELEMENTS are skipped, matching the replaced explode+agg
    * chain where md5(NULL) rows vanished from the conditional sums. Boxed so
    * the codegen call site can branch on null. */
  def hash(tokens: ArrayData): java.lang.Long = {
    val n = tokens.numElements()
    if (n == 0) return null
    val sums = new Array[Long](16)
    val digest = md5.get()
    var seen = false
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) { i += 1 }
      else {
      seen = true
      digest.reset()
      val d = digest.digest(tokens.getUTF8String(i).getBytes)
      // first 8 hex chars == first 4 bytes as a big-endian u32
      val h32 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var b = 0
      while (b < 16) {
        if (((h32 >> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      i += 1
      }
    }
    if (!seen) return null
    var packed = 0L
    var b = 0
    while (b < 16) {
      if (sums(b) > 0) packed |= (1L << b)
      b += 1
    }
    packed
  }
}
