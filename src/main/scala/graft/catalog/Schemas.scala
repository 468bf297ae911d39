package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** Multi-schema name resolution — the search_path shim (reference:
  * src/hooks/query.rs:81-117 search-path sync; pinned behaviors
  * tests/tests/scan.rs:504-559 and 600-650).
  *
  * Spark has a single current database and temp views are unqualified, so
  * schema-qualified attach lives in a registry: (schema, table) → DataFrame.
  * `setSearchPath` re-materializes every unqualified temp view from the
  * first schema on the path that holds the name — so plain `spark.sql`
  * (and therefore prepared statements, which re-plan at EXECUTE,
  * SqlApi.PreparedStatements) resolve names exactly like the reference:
  * resolution order follows the path, and an EXECUTE after a path change
  * sees the new table (scan.rs:600-650 semantics).
  *
  * Purely driver-side metadata — nothing here touches the data path.
  */
final class Schemas(spark: SparkSession) {

  private val registry = mutable.LinkedHashMap[(String, String), DataFrame]()
  // Unqualified temp views THIS registry materialized — resolveAll may only
  // drop these; a same-named temp view the user created directly via
  // createOrReplaceTempView must survive a search-path change.
  private val materialized = mutable.Set[String]()
  private var path: Seq[String] = Seq("public")

  final case class NoSuchSchemaTable(schema: String, table: String)
    extends IllegalArgumentException(s"relation `$schema.$table` does not exist")

  def searchPath: Seq[String] = path

  /** Attach `table` into `schema` (≙ CREATE FOREIGN TABLE in a schema).
    * Registers the qualified entry and refreshes unqualified resolution. */
  def attachIn(schema: String, table: String, format: String,
      options: Map[String, String],
      userMapping: Map[String, String] = Map.empty,
      declared: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    // Catalog.attach registers an unqualified temp view as a side effect —
    // that view is registry-materialized by definition (claim it before
    // resolution, which may need to drop it again for an off-path schema).
    val df = Catalog.attach(spark, table, format, options, userMapping, declared)
    registry((schema.toLowerCase, table.toLowerCase)) = df
    materialized += table.toLowerCase
    resolveAll()
    df
  }

  /** Qualified lookup, independent of the search path. */
  def table(schema: String, tbl: String): DataFrame =
    registry.getOrElse((schema.toLowerCase, tbl.toLowerCase),
      throw NoSuchSchemaTable(schema, tbl))

  /** SET search_path: re-resolve every unqualified name. */
  def setSearchPath(schemas: Seq[String]): Unit = {
    path = schemas.map(_.toLowerCase)
    resolveAll()
  }

  /** Drop a qualified table; unqualified views refresh. */
  def detach(schema: String, tbl: String): Boolean = {
    val removed = registry.remove((schema.toLowerCase, tbl.toLowerCase)).isDefined
    if (removed) resolveAll()
    removed
  }

  /** First schema on the path holding each table name wins its unqualified
    * temp view; names visible in no path schema are dropped — but only if
    * this registry materialized them (a user's own temp view of the same
    * name is never touched). */
  private def resolveAll(): Unit = {
    val tables = registry.keys.map(_._2).toSet
    tables.foreach { t =>
      path.find(s => registry.contains((s, t))) match {
        case Some(s) =>
          registry((s, t)).createOrReplaceTempView(t)
          materialized += t
        case None =>
          if (materialized.remove(t)) spark.catalog.dropTempView(t)
      }
    }
  }
}

object Schemas {
  def apply(spark: SparkSession): Schemas = new Schemas(spark)
}
