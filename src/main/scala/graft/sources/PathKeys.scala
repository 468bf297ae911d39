package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.regexp_replace

/** ONE key form for joining driver-side file lists against executor-side
  * `_metadata.file_path` strings. Both sides must agree on object stores,
  * where a URI carries an authority: `s3a://bucket/wh/f.parquet` must key
  * as `/bucket/wh/f.parquet` on BOTH sides — dropping the authority on one
  * side only (Path.toUri.getPath does) makes every lookup miss and turns
  * into silently-null joined values. Used by the Delta non-hive partition
  * lookup and every Iceberg delete-sequence lookup.
  */
object PathKeys {

  /** Driver side: scheme dropped, authority kept as a leading path segment. */
  def key(p: String): String = {
    val u = new Path(p).toUri
    Option(u.getAuthority).filter(_.nonEmpty)
      .map(a => s"/$a${u.getPath}").getOrElse(u.getPath)
  }

  /** Executor side: the same form from a `_metadata.file_path` column —
    * `scheme://` (or `scheme:/`) collapses to `/`, keeping the authority. */
  def keyCol(c: Column): Column =
    regexp_replace(c, "^[a-zA-Z][a-zA-Z0-9+.\\-]*:/+", "/")
}
