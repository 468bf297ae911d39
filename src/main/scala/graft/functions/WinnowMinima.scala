package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `winnow_minima(hashes, w)` — winnowing (MOSS) fingerprints from an
  * ordered hash array: the distinct minima of every length-`w` sliding
  * window, in first-occurrence order, via a monotonic deque — O(n) total
  * instead of the interpreted sparse-table zip_with passes it replaces.
  *
  * ORACLE CONTRACT: identical output SET and order to
  * `array_distinct(<window minima>)` for n ≥ w, `[array_min(hashes)]` for
  * 0 < n < w, and the empty array for n = 0 — so t05's aggregates
  * (count / min / sum over the distinct set) are unchanged. */
case class WinnowMinimaExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), IntegerType) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"winnow_minima expects (ARRAY<BIGINT>, literal INT window), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_minima"

  override def nullSafeEval(arr: Any, w: Any): Any =
    WinnowMinima.winnow(arr.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, w) => s"graft.functions.WinnowMinima.winnow($a, $w)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): WinnowMinimaExpr =
    copy(left = l, right = r)
}

object WinnowMinima {
  def winnow(hs: ArrayData, w: Int): ArrayData = {
    require(w >= 2, "window must be at least 2")
    val n = hs.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    if (n < w) {
      var m = Long.MaxValue
      var i = 0
      while (i < n) { val v = hs.getLong(i); if (v < m) m = v; i += 1 }
      return new GenericArrayData(Array(m))
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new Array[Int](n) // index ring: head..tail hold increasing values
    var head = 0
    var tail = -1
    var i = 0
    while (i < n) {
      val v = hs.getLong(i)
      while (tail >= head && hs.getLong(deque(tail)) >= v) tail -= 1
      tail += 1; deque(tail) = i
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) seen.add(hs.getLong(deque(head)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
