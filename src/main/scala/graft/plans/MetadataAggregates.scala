package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

import graft.sources.LogFileIndex

/** Metadata-only aggregate answering over the native lakehouse readers.
  *
  * A Delta transaction log records per-file `add.stats` (numRecords,
  * minValues, maxValues, nullCount); Iceberg manifests record
  * `record_count`, `lower_bounds`, `upper_bounds`, `null_value_counts`.
  * When a query is a bare global aggregate over such a table —
  * `SELECT count(*) FROM t`, `SELECT min(k), max(k) FROM t` — the answer
  * is already sitting in driver-resident log metadata: at 100 TB that is
  * the difference between a sub-second driver fold and a full-table scan
  * across a thousand executors. Iceberg's own planner and delta-kernel
  * both serve this fast path; Spark's built-in parquet aggregate pushdown
  * (DSv2-only) still opens every footer. The reference reaches the same
  * idea through DuckDB's metadata-backed `count(*)` over `delta_scan`
  * (reference: src/duckdb/delta.rs:41-61).
  *
  * Safety gates (ALL must hold, else the plan is left untouched):
  *   - the child plan is the relation itself below attribute-only
  *     Projects (renames/pruning) — any Filter/Join/etc. disqualifies;
  *   - the relation's FileIndex is a [[LogFileIndex]] with `rowsExact`
  *     (set by the readers ONLY on their no-row-level-deletes path, so
  *     deletion vectors / positional / equality deletes never reach here
  *     — their anti-joins would break the plan shape anyway);
  *   - every aggregate is non-distinct, unfiltered count(*) / count(col)
  *     / min(col) / max(col);
  *   - every live file carries the stats the aggregate needs; min/max
  *     only over types whose log bounds are exact by both specs
  *     (integral, date, timestamp, decimal) — never strings (both
  *     formats may truncate string bounds) and never float/double (NaN
  *     ordering: Spark sorts NaN above all values, file stats exclude it).
  *
  * The rewrite replaces the whole Aggregate with a one-row LocalRelation
  * bearing the same output attributes — downstream operators and exprIds
  * are untouched. Disable with `spark.graft.metadataAgg=false` (the spec
  * uses this to cross-check the fold against the real scan).
  */
object MetadataAggregates extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.metadataAgg", "true").toBoolean) plan
    else plan.transformDown {
      case agg @ Aggregate(Nil, aggExprs, child, _) if aggExprs.nonEmpty =>
        rewrite(aggExprs, child).getOrElse(agg)
    }
  }

  /** Walk attribute-preserving Projects down to a rowsExact LogFileIndex
    * relation; returns the index, the output-attr → base-column-name map
    * (the name add.stats / manifests key their stats by), and any Filter
    * predicates encountered on the way — ADMITTED only when every
    * conjunct references exclusively LOG-SERVED PARTITION columns of the
    * index (then pruning the live-file set is EXACT: a partition
    * predicate keeps all of a file's rows or none), already rebound into
    * the index's partition schema. A predicate touching any data column,
    * a non-deterministic expression, or a subquery disqualifies the whole
    * plan (→ normal scan). */
  private def reachIndex(plan: LogicalPlan)
      : Option[(LogFileIndex, Map[ExprId, String], Seq[Expression])] =
    plan match {
      case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location match {
          case idx: LogFileIndex if idx.rowsExact =>
            Some((idx, lr.output.map(a => a.exprId -> a.name.toLowerCase).toMap, Nil))
          case _ => None
        }
      case Project(list, child) =>
        reachIndex(child).flatMap { case (idx, below, preds) =>
          val mapped = list.map {
            case a: AttributeReference => below.get(a.exprId).map(a.exprId -> _)
            case al @ Alias(a: AttributeReference, _) => below.get(a.exprId).map(al.exprId -> _)
            case _ => None
          }
          if (mapped.exists(_.isEmpty)) None
          else Some((idx, mapped.flatten.toMap, preds))
        }
      case Filter(cond, child) =>
        reachIndex(child).flatMap { case (idx, below, preds) =>
          if (!cond.deterministic ||
            cond.exists(_.isInstanceOf[PlanExpression[_]])) None
          else {
            val fields = idx.partitionSchema.fields
            def slot(a: AttributeReference): Option[Int] =
              below.get(a.exprId).map(n =>
                fields.indexWhere(_.name.equalsIgnoreCase(n))).filter(_ >= 0)
                // the bound slot must carry the attribute's exact type —
                // a mismatch (mapped/renamed tables) bails to the scan
                .filter(i => fields(i).dataType == a.dataType)
            val bindable = cond.references.forall {
              case a: AttributeReference => slot(a).isDefined
              case _ => false
            }
            if (!bindable) None
            else Some((idx, below, preds :+ cond.transform {
              case a: AttributeReference =>
                val i = slot(a).get
                BoundReference(i, fields(i).dataType, nullable = true)
            }))
          }
        }
      case SubqueryAlias(_, child) => reachIndex(child)
      case _ => None
    }

  private def rewrite(aggExprs: Seq[NamedExpression], child: LogicalPlan): Option[LogicalPlan] = {
    val (idx, names, preds) = reachIndex(child) match {
      case Some(x) => x
      case None => return None
    }
    // partition-predicate pruning of the live-file set (exact — see
    // reachIndex); the stats fold below then runs over the survivors,
    // answering `SELECT count(*) … WHERE ds = '…'` from the log alone
    val files =
      if (preds.isEmpty) idx.files
      else idx.filesWherePartition(preds.reduce(And))
    val stats = files.map(_.stats)
    // every live file must carry stats at all — absent stats answer nothing
    if (stats.exists(_.isEmpty)) return None
    val st = stats.flatten

    def totalRows: Option[Long] = {
      val ns = st.map(_.numRecords)
      if (ns.forall(_.isDefined)) Some(ns.flatten.sum) else None
    }

    def nonNullRows(colName: String): Option[Long] = {
      val per = st.map { s =>
        for { n <- s.numRecords; c <- s.nullCount.get(colName) } yield n - c
      }
      if (per.forall(_.isDefined)) Some(per.flatten.sum) else None
    }

    /** Fold per-file bounds. Outer None = unanswerable; inner None = SQL
      * NULL (zero rows / all-null column). A file with no bound for the
      * column contributes nothing only when provably row-free or all-null
      * on that column. */
    def bound(colName: String, wantMin: Boolean): Option[Option[Any]] = {
      var acc: Option[Any] = None
      for (s <- st) {
        val side = if (wantMin) s.min else s.max
        side.get(colName) match {
          case Some(v) =>
            acc = acc match {
              case None => Some(v)
              case Some(cur) => LogFileIndex.cmp(v, cur) match {
                case Some(c) => if ((wantMin && c < 0) || (!wantMin && c > 0)) Some(v) else Some(cur)
                case None => return None // incomparable stats → bail
              }
            }
          case None =>
            val skippable = s.numRecords.contains(0L) ||
              (for { n <- s.numRecords; c <- s.nullCount.get(colName) } yield c == n)
                .getOrElse(false)
            if (!skippable) return None
        }
      }
      Some(acc)
    }

    /** Stats compare-domain value → Catalyst internal value of `dt`. */
    def toCatalyst(v: Any, dt: DataType): Option[Any] = dt match {
      case ByteType => Some(v.asInstanceOf[Long].toByte)
      case ShortType => Some(v.asInstanceOf[Long].toShort)
      case IntegerType => Some(v.asInstanceOf[Long].toInt)
      case LongType => Some(v)
      case DateType => Some(v.asInstanceOf[Long].toInt)
      case TimestampType | TimestampNTZType => Some(v)
      case d: DecimalType =>
        val dec = Decimal(v.asInstanceOf[java.math.BigDecimal])
        if (dec.changePrecision(d.precision, d.scale)) Some(dec) else None
      case _ => None
    }

    def boundType(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | TimestampNTZType | _: DecimalType => true
      case _ => false
    }

    def baseName(e: Expression): Option[String] = e match {
      case a: AttributeReference => names.get(a.exprId)
      case _ => None
    }

    val values = aggExprs.map {
      case Alias(AggregateExpression(fn, _, false, None, _), _) => fn match {
        case Count(Seq(Literal(v, _))) if v != null => totalRows
        case Count(Seq(a: AttributeReference)) if a.nullable =>
          baseName(a).flatMap(nonNullRows)
        case Count(Seq(a: AttributeReference)) => totalRows // non-nullable col
        case Min(a: AttributeReference) if boundType(a.dataType) =>
          baseName(a).flatMap(n => bound(n, wantMin = true))
            .flatMap {
              case None => Some(null) // provably no non-null rows
              case Some(v) => toCatalyst(v, a.dataType)
            }
        case Max(a: AttributeReference) if boundType(a.dataType) =>
          baseName(a).flatMap(n => bound(n, wantMin = false))
            .flatMap {
              case None => Some(null)
              case Some(v) => toCatalyst(v, a.dataType)
            }
        case _ => None
      }
      case _ => None
    }
    if (values.exists(_.isEmpty)) return None

    val row = InternalRow.fromSeq(values.map(_.get))
    Some(LocalRelation(aggExprs.map(_.toAttribute), Seq(row)))
  }
}
