package graft.functions

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `pg_json_get(json, key_or_index)` — Postgres' `->` operator (field as
  * JSON): unlike `->>`/`get_json_object`, the result KEEPS json quoting —
  * `'{"a":"x"}' -> 'a'` is `"x"` with the quotes, objects/arrays/numbers
  * come back as their json text, a stored json `null` comes back as the
  * text `null`, and a missing key is SQL NULL. PgDialect rewrites `->`
  * to this expression (reference dialect surface: tests/tests/json.rs
  * exercises the sibling `->>`; `->` is the same family in PG).
  *
  * Key forms, PG-faithful: a text key selects an object field (NULL on
  * arrays/scalars), an integer key selects an array element (NULL on
  * objects/scalars, negative counts from the end as in PG).
  */
case class PgJsonGetExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType | IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pg_json_get expects (STRING, STRING|INT), got (${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "pg_json_get"

  override protected def nullSafeEval(json: Any, key: Any): Any = right.dataType match {
    case StringType =>
      PgJsonGet.getField(json.asInstanceOf[UTF8String], key.asInstanceOf[UTF8String])
    case _ =>
      PgJsonGet.getIndex(json.asInstanceOf[UTF8String], key.asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val out = ctx.freshName("jsonGet")
    val call = right.dataType match {
      case StringType => (j: String, k: String) =>
        s"UTF8String $out = graft.functions.PgJsonGet.getField($j, $k);"
      case _ => (j: String, k: String) =>
        s"UTF8String $out = graft.functions.PgJsonGet.getIndex($j, $k);"
    }
    nullSafeCodeGen(ctx, ev, (j, k) => s"""
      ${call(j, k)}
      if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
    """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PgJsonGetExpr = copy(left = newLeft, right = newRight)
}

object PgJsonGet {
  private val mapper = new ObjectMapper()

  /** Object field as json text; SQL NULL when missing or not an object. */
  def getField(json: UTF8String, key: UTF8String): UTF8String = {
    val node = try mapper.readTree(json.toString) catch { case _: Exception => return null }
    if (node == null || !node.isObject) return null
    val v = node.get(key.toString)
    if (v == null) null else UTF8String.fromString(mapper.writeValueAsString(v))
  }

  /** Array element as json text; negative indices count from the end (PG
    * jsonb behavior); SQL NULL when out of range or not an array. */
  def getIndex(json: UTF8String, idx: Int): UTF8String = {
    val node = try mapper.readTree(json.toString) catch { case _: Exception => return null }
    if (node == null || !node.isArray) return null
    val i = if (idx < 0) node.size() + idx else idx
    if (i < 0 || i >= node.size()) return null
    UTF8String.fromString(mapper.writeValueAsString(node.get(i)))
  }
}
