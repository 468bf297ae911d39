package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise decimal-exact mean buffer: per dimension an exact
  * DECIMAL-scale-12 running sum plus a count (per-dimension counts keep
  * ragged inputs faithful to the per-(group,pos) aggregation this
  * replaces). */
final class VecMeanBuffer(
    var sums: Array[JBigDecimal],
    var counts: Array[Long]) {

  private def ensure(dim: Int): Unit = {
    if (sums == null) {
      sums = Array.fill(dim)(JBigDecimal.ZERO)
      counts = new Array[Long](dim)
    } else if (sums.length < dim) {
      val s = Array.fill(dim)(JBigDecimal.ZERO)
      Array.copy(sums, 0, s, 0, sums.length)
      val c = new Array[Long](dim)
      Array.copy(counts, 0, c, 0, counts.length)
      sums = s; counts = c
    }
  }

  def add(arr: ArrayData, isFloat: Boolean): Unit = {
    val n = arr.numElements()
    ensure(n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val d = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        // Spark's CAST(double AS DECIMAL(38,12)): toString-valued BigDecimal
        // rounded HALF_UP to scale 12 — replicated exactly so the sums match
        // the SQL decimal-cast oracle bit for bit
        sums(i) = sums(i).add(JBigDecimal.valueOf(d).setScale(12, RoundingMode.HALF_UP))
        counts(i) += 1
      }
      i += 1
    }
  }

  def merge(o: VecMeanBuffer): Unit = {
    if (o.sums != null) {
      ensure(o.sums.length)
      var i = 0
      while (i < o.sums.length) {
        sums(i) = sums(i).add(o.sums(i))
        counts(i) += o.counts(i)
        i += 1
      }
    }
  }
}

/** `vec_decimal_mean(vec)` — per-dimension mean of a float/double vector
  * column with EXACT, associative decimal sums: the aggregation analogue of
  * `CAST(v AS DECIMAL(38,12))` sums per (group, pos), without exploding one
  * row per dimension through the shuffle. The buffer is dim × (decimal +
  * long) per group — the exchange carries one small buffer per group per
  * partition instead of dim rows per input vector. Mean per dimension is
  * `sum.toDouble / count` — identical arithmetic to the posexplode +
  * decimal-sum + double-divide chain it replaces, so centroid oracles are
  * unchanged. */
case class VecDecimalMean(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecMeanBuffer] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_decimal_mean expects ARRAY<FLOAT|DOUBLE>, got ${other.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // containsNull: a dimension present only as nulls (or the trailing dims of
  // ragged inputs) has count 0 — its mean is NULL, matching the replaced
  // posexplode+SUM chain where that (group,pos) simply had no row.
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_decimal_mean"

  override def createAggregationBuffer(): VecMeanBuffer = new VecMeanBuffer(null, null)

  override def update(b: VecMeanBuffer, input: InternalRow): VecMeanBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[ArrayData], isFloat)
    b
  }

  override def merge(b: VecMeanBuffer, o: VecMeanBuffer): VecMeanBuffer = { b.merge(o); b }

  override def eval(b: VecMeanBuffer): Any = {
    if (b.sums == null) return null
    val out = new Array[Any](b.sums.length)
    var i = 0
    while (i < out.length) {
      // zero-count dimension → null, not NaN (0/0): keeps parity with the
      // posexplode chain / DuckDB oracle, which emit no row for that pos
      out(i) = if (b.counts(i) == 0) null else b.sums(i).doubleValue() / b.counts(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: VecMeanBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val n = if (b.sums == null) -1 else b.sums.length
    out.writeInt(n)
    var i = 0
    while (i < math.max(n, 0)) {
      out.writeLong(b.counts(i))
      val s = b.sums(i).toPlainString
      out.writeUTF(s)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecMeanBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    if (n < 0) return new VecMeanBuffer(null, null)
    val sums = new Array[JBigDecimal](n)
    val counts = new Array[Long](n)
    var i = 0
    while (i < n) {
      counts(i) = in.readLong()
      sums(i) = new JBigDecimal(in.readUTF())
      i += 1
    }
    new VecMeanBuffer(sums, counts)
  }

  override def withNewMutableAggBufferOffset(offset: Int): VecDecimalMean =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VecDecimalMean =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): VecDecimalMean =
    copy(child = newChild)
}
