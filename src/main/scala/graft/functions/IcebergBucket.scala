package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `iceberg_bucket(value, n)` — Apache Iceberg's `bucket[N]` partition
  * transform (iceberg spec "Partition Transforms" + Appendix B): 32-bit
  * Murmur3 (x86, seed 0) of the value's single-value binary encoding,
  * `(hash & Int.MaxValue) % N`. Needed to scope equality deletes on
  * bucket-partitioned tables (IcebergNative): the delete's partition tuple
  * stores the BUCKET ID, so the data side must recompute the transform per
  * row — a codegen expression, never a UDF, since it sits inside an
  * anti-join condition on the scan path.
  *
  * Encodings per the spec: int/date widen to long; long/timestamp hash as
  * 8-byte little-endian; string hashes its UTF-8 bytes. Anything else
  * (decimal/uuid/fixed) is rejected at analysis, not misbucketed.
  */
case class IcebergBucketExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!right.foldable || right.dataType != IntegerType)
      return TypeCheckResult.TypeCheckFailure("iceberg_bucket expects a literal INT bucket count")
    left.dataType match {
      case IntegerType | LongType | DateType | TimestampType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"iceberg_bucket supports int/long/date/timestamp/string, got ${other.simpleString}")
    }
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "iceberg_bucket"

  override protected def nullSafeEval(value: Any, n: Any): Any = {
    val buckets = n.asInstanceOf[Int]
    left.dataType match {
      case IntegerType | DateType =>
        IcebergTransforms.bucketLong(value.asInstanceOf[Int].toLong, buckets)
      case LongType | TimestampType =>
        IcebergTransforms.bucketLong(value.asInstanceOf[Long], buckets)
      case StringType =>
        IcebergTransforms.bucketUtf8(value.asInstanceOf[UTF8String], buckets)
      case other => throw new IllegalStateException(s"unchecked type $other")
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, n) => left.dataType match {
      case IntegerType | DateType =>
        s"graft.functions.IcebergTransforms.bucketLong((long)$v, $n)"
      case LongType | TimestampType =>
        s"graft.functions.IcebergTransforms.bucketLong($v, $n)"
      case StringType =>
        s"graft.functions.IcebergTransforms.bucketUtf8($v, $n)"
      case other => throw new IllegalStateException(s"unchecked type $other")
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IcebergBucketExpr = copy(left = newLeft, right = newRight)
}

/** Murmur3 x86 32-bit, seed 0 — the exact function the Iceberg spec pins
  * for `bucket[N]` (Appendix B test vectors covered in IcebergNativeSpec). */
object IcebergTransforms {

  def bucketLong(v: Long, n: Int): Int = (hashLong(v) & Int.MaxValue) % n
  def bucketUtf8(v: UTF8String, n: Int): Int = (hashBytes(v.getBytes) & Int.MaxValue) % n

  /** Hash of the 8-byte little-endian encoding (ints/dates widen first). */
  def hashLong(v: Long): Int = {
    var h1 = 0 // seed
    h1 = mixH1(h1, mixK1((v & 0xffffffffL).toInt))
    h1 = mixH1(h1, mixK1((v >>> 32).toInt))
    fmix(h1, 8)
  }

  def hashBytes(b: Array[Byte]): Int = {
    val len = b.length
    var h1 = 0 // seed
    var i = 0
    while (i + 4 <= len) {
      val k = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
      h1 = mixH1(h1, mixK1(k))
      i += 4
    }
    var k1 = 0
    var shift = 0
    while (i < len) { k1 |= (b(i) & 0xff) << shift; shift += 8; i += 1 }
    if (shift > 0) h1 ^= mixK1(k1)
    fmix(h1, len)
  }

  private def mixK1(k: Int): Int = {
    var k1 = k * 0xcc9e2d51
    k1 = Integer.rotateLeft(k1, 15)
    k1 * 0x1b873593
  }
  private def mixH1(h: Int, k1: Int): Int = {
    var h1 = h ^ k1
    h1 = Integer.rotateLeft(h1, 13)
    h1 * 5 + 0xe6546b64
  }
  private def fmix(h: Int, len: Int): Int = {
    var h1 = h ^ len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^ (h1 >>> 16)
  }
}
