package graft.sources

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Timestamp parsing + resolution shared by the native lakehouse readers'
  * `timestamp_as_of` (Delta) / `as_of_timestamp` (Iceberg) options.
  *
  * The reference reads latest-only through DuckDB's extensions
  * (src/duckdb/delta.rs:41-61, src/duckdb/iceberg.rs:48-89), so
  * timestamp travel EXCEEDS the reference surface; the semantics follow
  * the public table-format contracts: pick the last commit/snapshot whose
  * recorded timestamp is at or before the asked instant, and reject
  * loudly — naming the valid window — when the instant predates history.
  *
  * Zone-less inputs are interpreted in UTC (the engine session standard),
  * never the JVM default: a time-travel pin must not move with the host.
  */
object TimeTravel {

  private val localDt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss[.SSS]")

  /** Parse the option value to epoch millis. Accepts epoch millis, ISO
    * instants (`2024-01-02T03:04:05Z`), `yyyy-MM-dd HH:mm:ss[.SSS]`, and
    * bare dates (midnight UTC). Throws IllegalArgumentException otherwise.
    */
  def parseMillis(option: String, value: String): Long = {
    val v = value.trim
    if (v.matches("-?\\d+")) v.toLong
    else {
      def tryAll: Option[Long] =
        (try Some(Instant.parse(v).toEpochMilli) catch { case _: Exception => None })
          .orElse(try Some(LocalDateTime.parse(v, localDt).toInstant(ZoneOffset.UTC).toEpochMilli)
            catch { case _: Exception => None })
          .orElse(try Some(LocalDateTime.parse(v.replace(' ', 'T')).toInstant(ZoneOffset.UTC).toEpochMilli)
            catch { case _: Exception => None })
          .orElse(try Some(LocalDate.parse(v).atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli)
            catch { case _: Exception => None })
      tryAll.getOrElse(throw new IllegalArgumentException(
        s"$option `$value` is not a timestamp; use epoch millis, " +
          "'yyyy-MM-dd HH:mm:ss', or an ISO instant (zone-less values are UTC)"))
    }
  }

  /** Clock-skew adjustment per the Delta protocol's reader notes: history
    * timestamps must be treated as monotonically increasing, so each entry
    * reads as max(previous + 1ms, recorded). Input must be version-ordered.
    */
  def monotonize(ts: Seq[Long]): Seq[Long] = {
    var prev = Long.MinValue
    ts.map { t =>
      val adj = if (prev == Long.MinValue) t else math.max(prev + 1, t)
      prev = adj
      adj
    }
  }

  /** Largest id whose (monotonized) timestamp is ≤ targetMillis.
    * `history` is version-ordered (id, recordedMillis). */
  def resolve(history: Seq[(Long, Long)], targetMillis: Long, option: String,
      what: String): Long = {
    require(history.nonEmpty, s"$option: no $what history to resolve against")
    val adjusted = history.map(_._1).zip(monotonize(history.map(_._2)))
    val at = adjusted.filter(_._2 <= targetMillis)
    if (at.isEmpty) {
      val lo = Instant.ofEpochMilli(adjusted.head._2)
      val hi = Instant.ofEpochMilli(adjusted.last._2)
      throw new IllegalArgumentException(
        s"$option ${Instant.ofEpochMilli(targetMillis)} predates the earliest " +
          s"$what; the table's history spans [$lo, $hi]")
    }
    at.last._1
  }
}
