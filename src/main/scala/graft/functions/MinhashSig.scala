package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `minhash_sig(shingles)` — the full k=16 MinHash signature of a shingle
  * array in ONE pass: per shingle one md5 (the first 15 hex chars parsed as
  * a 60-bit integer, reduced mod P), then the 16 linear permutations
  * (a·h + b) mod P folded into running minima.
  *
  * ORACLE CONTRACT: bit-identical to the explode + groupBy(16 × min) chain
  * it replaces — `('0x' || substr(md5(shingle),1,15))::BIGINT % P` then
  * `min((a·hm + b) % P)` in DuckDB — because the per-shingle arithmetic is
  * the same and min() is order-independent. Replacing the explode removes
  * an entire exchange from the dedup chain: the signature never leaves the
  * row it belongs to. Empty/NULL input → NULL (docs with <3 tokens carry
  * no signature, as before).
  */
case class MinhashSigExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects ARRAY<STRING>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinhashSig.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // static-call codegen (GeoJsonToWkb pattern): the row stays inside
    // whole-stage codegen; the per-shingle loop runs as compiled Scala.
    // The helper may return null for empty input, so route through the
    // nullable-aware generator.
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinhashSig.sig($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}

object MinhashSig {
  import graft.operators.Dedup

  private val A: Array[Long] = Dedup.coeffs.map(_._1).toArray
  private val B: Array[Long] = Dedup.coeffs.map(_._2).toArray
  private val K: Int = A.length
  private val P: Long = Dedup.P

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Null for empty (or all-null-element) arrays — a doc with no shingles
    * has no signature. Null ELEMENTS are skipped, matching the replaced
    * explode+agg chain where md5(NULL) was ignored by min().
    */
  def sig(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val mins = Array.fill(K)(Long.MaxValue)
    val digest = md5.get()
    var seen = false
    var i = 0
    while (i < n) {
      if (shingles.isNullAt(i)) { i += 1 }
      else {
      seen = true
      digest.reset()
      val d = digest.digest(shingles.getUTF8String(i).getBytes)
      // first 15 hex chars == first 8 bytes as big-endian u64, >>> 4
      val top = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      val hm = (top >>> 4) % P
      var j = 0
      while (j < K) {
        val v = (A(j) * hm + B(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
      }
    }
    if (!seen) return null
    new GenericArrayData(mins)
  }
}
