package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability exercised end-to-end: a Spark implementation
  * plus (when SQL-expressible) an equivalent DuckDB oracle query the driver
  * hash-compares against (see SURVEY.md §5 "engine-as-oracle").
  *
  * Column names and types MUST match between `fn`'s output and `oracle`'s
  * result — the compare sorts columns by name and hashes values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Float determinism note (applies across the suite): sums over arbitrary
    * doubles are order-dependent, and Spark's partial aggregation order is
    * nondeterministic. Wherever the data is fixed-decimal (prices, discounts),
    * we cast each addend to DECIMAL before SUM in BOTH engines — decimal
    * addition is exact and associative — and cast the final result back to
    * DOUBLE. Integral-valued doubles (l_quantity) sum exactly as-is. */
  val floatContract: String = "decimal-cast sums, double at the edges"
}
