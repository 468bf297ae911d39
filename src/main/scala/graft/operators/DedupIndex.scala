package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.{Catalog, DeltaSink}

/** Persisted incremental-dedup HISTORY INDEX — the d15/d16 gates' missing
  * production lifecycle (the dedup sibling of [[AnnIndex]]): at 100 TB a
  * nightly shard gate cannot rebuild its history sketch from a full corpus
  * scan per invocation (what [[Dedup.incrementalGate]] does, correct as it
  * is). The index is built ONCE from the historical corpus, persisted as a
  * native Delta table, grown incrementally as shards commit, and every
  * later gate serves from the persisted artifact with ZERO scans of the
  * raw history (DedupIndexSpec pins it via [[historyPasses]], the
  * `Similarity.trainingRuns` pattern).
  *
  * Table layout — one EPOCH per build/append, two row kinds written as
  * separate commits (separate files, so `kind` min/max stats prune each
  * side's scan to its own files):
  *
  *   kind STRING          'bloom' | 'key'
  *   spec_version INT     arithmetic/layout generation; mixed generations
  *                        reject loudly rather than silently mis-gating
  *   epoch BIGINT         0 for build, +1 per append
  *   h STRING             kind='key': md5 of the d01/d15 normalization
  *   hx BIGINT            kind='key': xxhash64 of the same normalization
  *                        (the bloom's key domain — what Spark's own
  *                        injected runtime filters hash with)
  *   payload BINARY       kind='bloom': the epoch's serialized sketch
  *
  * PER-EPOCH BLOOMS, OR-folded at gate time: each epoch's sketch is sized
  * to its own key count, so the driver never merges or resizes sketches,
  * and the documented >1e9-key escape (epoch-partition the history —
  * [[Dedup.incrementalGate]]'s scaladoc) is exactly this layout. A gate
  * row is maybe-positive when ANY epoch's bloom fires; the exact verify
  * then runs against the persisted KEY table (16-byte hash rows — the
  * index, never the corpus), broadcast semi/anti under
  * `broadcastKeyLimit`, plain shuffle anti-join past it (the d15
  * size-gate discipline — nothing unbounded broadcasts).
  *
  * Build cost: the raw history is scanned ONCE per build/append (the key
  * projection that writes the key table); the epoch's bloom then folds
  * over the just-persisted key rows, not the corpus. The sketch is an
  * optimization, not a semantics carrier — false positives die in the
  * exact verify, false negatives are impossible — so gate output is
  * EXACTLY "batch rows whose md5(norm) is absent from every indexed
  * epoch", which is what lets DuckDB oracle the whole lifecycle with a
  * plain NOT IN (d17). Rebuild = a fresh [[build]] (Delta overwrite; old
  * generations stay time-travelable), the [[AnnIndex]] maintenance
  * contract. */
object DedupIndex {

  /** Bump when the row layout or the key arithmetic changes. */
  val SpecVersion = 1

  case class DedupIndexException(msg: String) extends RuntimeException(msg)

  /** Counts passes over RAW history text (build/append only) — the spec's
    * zero-history-scans pin for the gate path. */
  val historyPasses = new java.util.concurrent.atomic.AtomicLong(0L)

  private def keyRows(df: DataFrame, textCol: String, epoch: Long): DataFrame = {
    historyPasses.incrementAndGet()
    val n = Dedup.normText(col(textCol))
    df.select(md5(n).as("h"), xxhash64(n).as("hx")).distinct()
      .select(lit("key").as("kind"), lit(SpecVersion).as("spec_version"),
        lit(epoch).as("epoch"), col("h"), col("hx"),
        lit(null).cast("binary").as("payload"))
  }

  private def bloomRow(spark: SparkSession, keys: DataFrame, epoch: Long,
      fpp: Double, expectedItems: Long): DataFrame = {
    val bloom = keys.stat.bloomFilter("hx", math.max(expectedItems, 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    // h/hx are sentinels on bloom rows, never nulls: the key commit creates
    // the table with md5/xxhash64's NON-nullable schema, and neither column
    // is ever read under kind='bloom'
    spark.range(1).select(
      lit("bloom").as("kind"), lit(SpecVersion).as("spec_version"),
      lit(epoch).as("epoch"), lit("").as("h"),
      lit(0L).as("hx"), lit(bos.toByteArray).as("payload"))
  }

  private def writeEpoch(history: DataFrame, textCol: String, path: String,
      epoch: Long, overwrite: Boolean, fpp: Double, expectedItems: Long): Unit = {
    val spark = history.sparkSession
    val opts = if (overwrite) Map("overwrite" -> "true") else Map.empty[String, String]
    // ONE raw-history pass: the key projection persists, then the epoch's
    // bloom folds over the persisted 16-byte key rows, not the corpus
    DeltaSink.write(keyRows(history, textCol, epoch), path, opts)
    val persistedKeys = attach(spark, path)
      .filter(col("kind") === "key" && col("epoch") === epoch)
      .select(col("hx"))
    // AUTO-SIZE by default (expectedItems <= 0): unlike the inline d15
    // gate — where a sizing count would be a third raw-history scan — the
    // key table is already persisted here, so an exact count is one cheap
    // pass over 16-byte rows and the sketch is sized to REALITY (a 4M-key
    // default sketch is ~5 MB of literal per epoch in every later gate's
    // codegen, paid even for a 1k-doc epoch). A caller-supplied estimate
    // still wins when the epoch cardinality is known from table stats.
    val items =
      if (expectedItems > 0) expectedItems
      else math.max(persistedKeys.count(), 1024L)
    DeltaSink.write(bloomRow(spark, persistedKeys, epoch, fpp, items),
      path, Map.empty)
  }

  /** Build (or REBUILD — overwrite) the index from the historical corpus:
    * epoch 0's key table + sized bloom. */
  def build(history: DataFrame, textCol: String, path: String,
      fpp: Double = 0.01, expectedItems: Long = 0L): Unit =
    writeEpoch(history, textCol, path, 0L, overwrite = true, fpp, expectedItems)

  /** Grow the index by one epoch as a shard commits: the shard's keys +
    * its OWN sized bloom append; no existing sketch is touched or resized
    * (the epoch-partitioning contract). */
  def append(shard: DataFrame, textCol: String, path: String,
      fpp: Double = 0.01, expectedItems: Long = 0L): Unit = {
    val next = maxEpoch(shard.sparkSession, path) + 1L
    writeEpoch(shard, textCol, path, next, overwrite = false, fpp, expectedItems)
  }

  /** Idempotent build-if-absent (the [[AnnIndex.ensureIvf]] arrangement —
    * first run builds, every later run serves). */
  def ensure(history: DataFrame, textCol: String, path: String,
      fpp: Double = 0.01, expectedItems: Long = 0L): Boolean =
    if (!exists(history.sparkSession, path)) { build(history, textCol, path, fpp, expectedItems); true }
    else false

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path, "_delta_log")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  private def attach(spark: SparkSession, path: String): DataFrame = {
    val view = s"dedup_index_${Integer.toHexString(path.hashCode)}"
    Catalog.attach(spark, view, "delta", Map("files" -> path))
  }

  private def maxEpoch(spark: SparkSession, path: String): Long = {
    val r = attach(spark, path).filter(col("kind") === "bloom")
      .agg(max(col("epoch"))).head()
    if (r.isNullAt(0)) throw DedupIndexException(
      s"`$path`: no bloom rows — not a dedup index table (build it with " +
        "DedupIndex.build)")
    r.getLong(0)
  }

  /** Load every epoch's sketch bytes — bounded driver literals (one blob
    * per epoch), the gate's only driver-side state. */
  private def loadBlooms(spark: SparkSession, path: String): Seq[Array[Byte]] = {
    val rows = attach(spark, path).filter(col("kind") === "bloom")
      .select(col("spec_version"), col("epoch"), col("payload"))
      .collect()
    if (rows.isEmpty) throw DedupIndexException(
      s"`$path`: no bloom rows — not a dedup index table (build it with " +
        "DedupIndex.build)")
    rows.iterator.map(_.getInt(0)).find(_ != SpecVersion).foreach { v =>
      throw DedupIndexException(
        s"`$path`: index rows carry spec_version $v but this engine serves " +
          s"$SpecVersion — rebuild the index rather than mixing arithmetic " +
          "generations")
    }
    rows.sortBy(_.getLong(1)).map(_.getAs[Array[Byte]]("payload")).toSeq
  }

  /** Gate a new batch against the persisted history: batch rows whose
    * normalized text appears in NO indexed epoch survive, as (idCol, h) —
    * the [[Dedup.incrementalGate]] output contract served from the index.
    * ZERO raw-history scans: the row-local gate ORs the per-epoch bloom
    * literals, and only the maybe-positive sliver exact-verifies against
    * the persisted key table (size-gated broadcast / shuffle fallback). */
  def gate(newDf: DataFrame, path: String, textCol: String, idCol: String,
      broadcastKeyLimit: Long = 500000L): DataFrame = {
    val spark = newDf.sparkSession
    val blooms = loadBlooms(spark, path)
    val hx = xxhash64(Dedup.normText(col(textCol)))
    val maybe = blooms.map(b => call_function("bloom_might_contain", lit(b), hx))
      .reduceLeft(_ || _)
    // same bounded one-resident-frame cache as d15/d16: the tagged batch
    // feeds the size-gate count, the clean branch and the verify branch
    val tagged = newDf.select(col(idCol),
      md5(Dedup.normText(col(textCol))).as("h"), maybe.as("__maybe"))
      .persist()
    Dedup.swapGateCache(tagged)
    val clean = tagged.filter(!col("__maybe")).select(col(idCol), col("h"))
    val keyTable = attach(spark, path).filter(col("kind") === "key").select(col("h"))
    val nMaybe = tagged.filter(col("__maybe")).count()
    val verified =
      if (nMaybe <= broadcastKeyLimit) {
        val maybeKeys = tagged.filter(col("__maybe")).select(col("h")).distinct()
        val present = keyTable
          .join(broadcast(maybeKeys), Seq("h"), "left_semi").distinct()
        tagged.filter(col("__maybe"))
          .join(broadcast(present), Seq("h"), "left_anti")
          .select(col(idCol), col("h"))
      } else
        tagged.filter(col("__maybe"))
          .join(keyTable.hint("shuffle_merge"), Seq("h"), "left_anti")
          .select(col(idCol), col("h"))
    clean.unionByName(verified)
  }
}
