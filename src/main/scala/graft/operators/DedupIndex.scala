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

  /** Counts FALLBACK key-table scans taken by the torn-epoch coverage
    * check — the x31/x33 no-extra-pass pin. Normally 0: coverage derives
    * from the Delta log's per-file stats (kind/epoch min==max), pure
    * driver work over metadata that is already resident; the row scan
    * only runs when a file's stats cannot prove its epoch (a foreign
    * writer, or stats-free files). */
  val coverageScans = new java.util.concurrent.atomic.AtomicLong(0L)

  /** The epoch set of the 'key' side, from file-level log stats alone:
    * every live file whose kind min==max=='key' contributes its (constant)
    * epoch; bloom files contribute nothing. None when any file's stats
    * cannot prove a constant kind+epoch — the caller then falls back to
    * the exact distinct scan (correctness first; with this table's own
    * writer every file is single-kind single-epoch by construction). */
  private def keyEpochsFromStats(df: DataFrame): Option[Set[Long]] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val idx = df.queryExecution.analyzed.collectFirst {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
          if fs.location.isInstanceOf[graft.sources.LogFileIndex] =>
        fs.location.asInstanceOf[graft.sources.LogFileIndex]
    }
    idx.flatMap { ix =>
      val perFile: Seq[Option[Set[Long]]] = ix.files.map { f =>
        f.stats.flatMap { st =>
          // a zero-row file (an empty write partition) covers no epoch
          if (st.numRecords.contains(0L)) Some(Set.empty[Long])
          else (st.min.get("kind"), st.max.get("kind"),
            st.min.get("epoch"), st.max.get("epoch")) match {
            case (Some(k1: String), Some(k2: String),
                Some(e1: Long), Some(e2: Long)) if k1 == k2 && e1 == e2 =>
              Some(if (k1 == "key") Set(e1) else Set.empty[Long])
            case _ => None
          }
        }
      }
      if (perFile.exists(_.isEmpty)) None
      else Some(perFile.flatten.flatten.toSet)
    }
  }

  /** Index MODE, carried on every bloom row's `h` sentinel: an EXACT
    * index keys md5(norm) documents, a FUZZY one keys MinHash
    * `band:band_sig` strings — serving one through the other's gate would
    * silently compute nonsense, so the gates check the mode loudly.
    * (Legacy r14-early indexes carry "" — read as exact.) */
  private val ModeExact = "exact"
  private val ModeFuzzy = "fuzzy"

  private def keyRows(df: DataFrame, textCol: String, epoch: Long): DataFrame = {
    historyPasses.incrementAndGet()
    val n = Dedup.normText(col(textCol))
    df.select(md5(n).as("h"), xxhash64(n).as("hx")).distinct()
      .select(lit("key").as("kind"), lit(SpecVersion).as("spec_version"),
        lit(epoch).as("epoch"), col("h"), col("hx"),
        lit(null).cast("binary").as("payload"))
  }

  /** Fuzzy key rows: the doc's MinHash band keys (k=16/r=4 — 4 keys/doc,
    * the d16 chain), h = `band:band_sig`, hx = xxhash64 of it. */
  private def fuzzyKeyRows(df: DataFrame, textCol: String, idCol: String,
      epoch: Long): DataFrame = {
    historyPasses.incrementAndGet()
    Dedup.bandSignatures(Dedup.minhashWide(df, textCol, idCol), idCol)
      .select(concat_ws(":", col("band"), col("band_sig")).as("h")).distinct()
      .select(lit("key").as("kind"), lit(SpecVersion).as("spec_version"),
        lit(epoch).as("epoch"), col("h"), xxhash64(col("h")).as("hx"),
        lit(null).cast("binary").as("payload"))
  }

  private def bloomRow(spark: SparkSession, keys: DataFrame, epoch: Long,
      fpp: Double, expectedItems: Long, mode: String): DataFrame = {
    val bloom = keys.stat.bloomFilter("hx", math.max(expectedItems, 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    // h carries the index MODE on bloom rows (hx stays a sentinel): the
    // key commit creates the table with md5/xxhash64's NON-nullable
    // schema, and neither column means anything else under kind='bloom'
    spark.range(1).select(
      lit("bloom").as("kind"), lit(SpecVersion).as("spec_version"),
      lit(epoch).as("epoch"), lit(mode).as("h"),
      lit(0L).as("hx"), lit(bos.toByteArray).as("payload"))
  }

  private def writeEpoch(history: DataFrame, textCol: String, path: String,
      epoch: Long, overwrite: Boolean, fpp: Double, expectedItems: Long,
      mode: String = ModeExact, idCol: String = ""): Unit = {
    val spark = history.sparkSession
    val opts = if (overwrite) Map("overwrite" -> "true") else Map.empty[String, String]
    // ONE raw-history pass: the key projection persists, then the epoch's
    // bloom folds over the persisted 16-byte key rows, not the corpus
    val kr = if (mode == ModeFuzzy) fuzzyKeyRows(history, textCol, idCol, epoch)
      else keyRows(history, textCol, epoch)
    DeltaSink.write(kr, path, opts)
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
    DeltaSink.write(bloomRow(spark, persistedKeys, epoch, fpp, items, mode),
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
  private def loadBlooms(spark: SparkSession, path: String,
      wantMode: String): Seq[Array[Byte]] = {
    val rows = attach(spark, path).filter(col("kind") === "bloom")
      .select(col("spec_version"), col("epoch"), col("payload"), col("h"))
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
    rows.iterator.map(_.getString(3)).map(m => if (m.isEmpty) ModeExact else m)
      .find(_ != wantMode).foreach { m =>
        throw DedupIndexException(
          s"`$path`: this is a $m index but the $wantMode gate was asked to " +
            "serve it — an exact gate over band keys (or a fuzzy gate over " +
            "document hashes) would silently compute nonsense")
      }
    // torn-epoch guard: keys and bloom land as two commits, so a crash
    // between them leaves an epoch's keys with NO sketch — its duplicates
    // would gate __maybe=false and pass as clean (a silent false negative,
    // the one thing the contract forbids). Assert coverage loudly FROM
    // FILE-LEVEL LOG STATS (kind/epoch min==max per file — driver-only,
    // no scan of the one-row-per-history-key table per gate call, the r15
    // O(history) regression); the exact distinct scan remains only as the
    // fallback when stats can't prove an epoch, counted by
    // [[coverageScans]]. A retried append heals the gap because maxEpoch
    // derives from BLOOM rows.
    val bloomEpochs = rows.iterator.map(_.getLong(1)).toSet
    val keyEpochs = keyEpochsFromStats(attach(spark, path)).getOrElse {
      coverageScans.incrementAndGet()
      attach(spark, path).filter(col("kind") === "key")
        .select(col("epoch")).distinct().collect().map(_.getLong(0)).toSet
    }
    val orphanEpochs = keyEpochs.filterNot(bloomEpochs).toSeq.sorted
    if (orphanEpochs.nonEmpty) throw DedupIndexException(
      s"`$path`: epoch(s) ${orphanEpochs.mkString(",")} carry key rows but " +
        "no bloom row — a build/append was torn between its two commits; " +
        "retry the append (it re-writes the epoch and its sketch) before " +
        "gating, or duplicates of the torn epoch would pass as clean")
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
    val blooms = loadBlooms(spark, path, ModeExact)
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

  // ------------------------------------------------------- fuzzy index

  /** Build (or REBUILD) a FUZZY history index — the near-dup sibling of
    * [[build]] (what [[Dedup.fuzzyIncrementalGate]] rebuilds per
    * invocation): the history's MinHash band keys persist as the key
    * table, each epoch with its own sized bloom. One raw-history pass,
    * band signatures computed row-locally (zero shuffle before the
    * distinct). */
  def buildFuzzy(history: DataFrame, textCol: String, idCol: String,
      path: String, fpp: Double = 0.01, expectedItems: Long = 0L): Unit =
    writeEpoch(history, textCol, path, 0L, overwrite = true, fpp,
      expectedItems, ModeFuzzy, idCol)

  /** Grow the fuzzy index by one epoch (the [[append]] contract). */
  def appendFuzzy(shard: DataFrame, textCol: String, idCol: String,
      path: String, fpp: Double = 0.01, expectedItems: Long = 0L): Unit = {
    val next = maxEpoch(shard.sparkSession, path) + 1L
    writeEpoch(shard, textCol, path, next, overwrite = false, fpp,
      expectedItems, ModeFuzzy, idCol)
  }

  /** Idempotent fuzzy build-if-absent. */
  def ensureFuzzy(history: DataFrame, textCol: String, idCol: String,
      path: String, fpp: Double = 0.01, expectedItems: Long = 0L): Boolean =
    if (!exists(history.sparkSession, path)) {
      buildFuzzy(history, textCol, idCol, path, fpp, expectedItems); true
    } else false

  /** FUZZY gate from the persisted index — the
    * [[Dedup.fuzzyIncrementalGate]] output contract (idCol, n_hit_bands,
    * keep) with ZERO raw-history scans: batch docs band row-locally
    * (zero-shuffle `minhash_sig`), per-epoch blooms OR-fold into the
    * row-local gate, the maybe-band sliver exact-verifies against the
    * persisted band-key table (size-gated broadcast / shuffle fallback).
    * Docs too short to shingle carry no bands and keep with 0 hits —
    * the d16 convention, consistent in both engines by construction. */
  def gateFuzzy(newDf: DataFrame, path: String, textCol: String,
      idCol: String, broadcastKeyLimit: Long = 500000L): DataFrame = {
    val spark = newDf.sparkSession
    val blooms = loadBlooms(spark, path, ModeFuzzy)
    val maybeCond = blooms
      .map(b => call_function("bloom_might_contain", lit(b), xxhash64(col("h"))))
      .reduceLeft(_ || _)
    // bounded one-resident-frame cache: the maybe-band rows feed the
    // size-gate count AND the hit aggregation (the d16 arrangement)
    val maybes = Dedup.bandSignatures(Dedup.minhashWide(newDf, textCol, idCol), idCol)
      .select(col(idCol), concat_ws(":", col("band"), col("band_sig")).as("h"))
      .filter(maybeCond)
      .persist()
    Dedup.swapGateCache(maybes)
    val keyTable = attach(spark, path).filter(col("kind") === "key").select(col("h"))
    val nMaybe = maybes.count()
    val hits =
      if (nMaybe <= broadcastKeyLimit) {
        val maybeKeys = maybes.select(col("h")).distinct()
        val present = keyTable
          .join(broadcast(maybeKeys), Seq("h"), "left_semi").distinct()
        maybes.join(broadcast(present), Seq("h"), "left_semi")
          .groupBy(col(idCol)).agg(countDistinct(col("h")).as("n_hit_bands"))
      } else
        maybes.join(keyTable.hint("shuffle_merge"), Seq("h"), "left_semi")
          .groupBy(col(idCol)).agg(countDistinct(col("h")).as("n_hit_bands"))
    newDf.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hit_bands"), lit(0L)).as("n_hit_bands"))
      .withColumn("keep", col("n_hit_bands") === 0L)
  }

  // -------------------------------------------------------- maintenance

  /** COMPACT the index: fold every epoch into ONE (distinct keys, one
    * sized bloom) — the maintenance pass a long-lived index schedules
    * once the per-epoch bloom list grows past what a gate expression
    * should carry (each epoch is one sketch literal in the gate's
    * codegen). Reads ONLY the persisted key table — the raw history is
    * never touched (same [[historyPasses]] pin as the gates) — and
    * rewrites the table in place (Delta overwrite; prior generations
    * stay time-travelable). Gate output is identical before and after:
    * the distinct key SET is what the verify consults, and the merged
    * bloom stays a pure optimization. */
  def compact(spark: SparkSession, path: String, fpp: Double = 0.01): Unit = {
    val all = attach(spark, path)
    val modes = all.filter(col("kind") === "bloom").select(col("h"))
      .distinct().collect().map(r => if (r.getString(0).isEmpty) ModeExact else r.getString(0))
    if (modes.isEmpty) throw DedupIndexException(
      s"`$path`: no bloom rows — not a dedup index table")
    if (modes.length > 1) throw DedupIndexException(
      s"`$path`: mixed index modes ${modes.mkString(",")} — corrupt table")
    val keys = all.filter(col("kind") === "key")
      .select(col("h"), col("hx")).distinct()
      .select(lit("key").as("kind"), lit(SpecVersion).as("spec_version"),
        lit(0L).as("epoch"), col("h"), col("hx"),
        lit(null).cast("binary").as("payload"))
      // the overwrite replaces the files this frame reads — materialize
      // the compacted keys BEFORE the commit or the write would consume
      // its own tombstones
      .localCheckpoint()
    DeltaSink.write(keys, path, Map("overwrite" -> "true"))
    val persistedKeys = attach(spark, path)
      .filter(col("kind") === "key").select(col("hx"))
    val items = math.max(persistedKeys.count(), 1024L)
    DeltaSink.write(bloomRow(spark, persistedKeys, 0L, fpp, items, modes.head),
      path, Map.empty)
  }
}
