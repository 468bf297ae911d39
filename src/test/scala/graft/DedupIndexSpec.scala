package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, DedupIndex}

/** Persisted dedup history index lifecycle: build → append → gate must
  * reproduce the batch NOT-IN semantics EXACTLY (the d15 contract served
  * from a stored artifact), the gate path must touch the RAW history ZERO
  * times (the trainingRuns-style pin — at 100 TB rebuilding the sketch per
  * shard is the cost this index exists to remove), both verify regimes
  * (broadcast / shuffle-fallback) must agree, and spec-version or
  * non-index tables must reject loudly. */
class DedupIndexSpec extends SparkSpec {

  private lazy val docs = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf/documents.parquet")
  }

  /** The gate's expected output computed the oracle way: plain anti-join
    * of batch keys against ALL indexed text — no bloom, no epochs. */
  private def expected(batch: org.apache.spark.sql.DataFrame,
      history: org.apache.spark.sql.DataFrame): Set[(Long, String)] = {
    val h = md5(regexp_replace(lower(col("text")), "\\s+", " "))
    val hist = history.select(h.as("h")).distinct()
    batch.select(col("doc_id"), h.as("h"))
      .join(hist, Seq("h"), "left_anti")
      .select(col("doc_id"), col("h"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
  }

  private def gateRows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  private def mkBatch(d: org.apache.spark.sql.DataFrame) =
    d.select(col("doc_id"),
      when(col("doc_id") % 3 === 0, col("text"))
        .otherwise(concat(col("text"), lit(" novel "),
          col("doc_id").cast("string"))).as("text"))

  test("build → append → gate replays NOT-IN exactly, zero raw-history passes on the gate") {
    val dir = tempDir("dedupidx").getAbsolutePath
    val epoch0 = docs.filter(col("doc_id") % 2 === 0)
    val epoch1 = docs.filter(col("doc_id") % 2 =!= 0)
    DedupIndex.build(epoch0, "text", s"$dir/idx")
    DedupIndex.append(epoch1, "text", s"$dir/idx")
    val batch = mkBatch(docs)
    val before = DedupIndex.historyPasses.get()
    val covBefore = DedupIndex.coverageScans.get()
    val out = gateRows(DedupIndex.gate(batch, s"$dir/idx", "text", "doc_id"))
    assert(DedupIndex.historyPasses.get() === before,
      "the gate path scanned raw history — it must serve from the index only")
    assert(DedupIndex.coverageScans.get() === covBefore,
      "the torn-epoch coverage check scanned the key table — it must derive " +
        "from file-level log stats on this table's own writer output")
    val exp = expected(batch, docs)
    assert(out === exp)
    // the batch must actually exercise BOTH epochs' blooms: some dropped
    // rows dup epoch 0 (even ids), some dup epoch 1 (odd ids)
    val dropped = batch.select(col("doc_id")).collect().map(_.getLong(0)).toSet --
      out.map(_._1)
    assert(dropped.exists(_ % 2 == 0) && dropped.exists(_ % 2 == 1),
      "fixture regression: dups must span both epochs")
  }

  test("shuffle-fallback verify regime computes the identical result") {
    val dir = tempDir("dedupidx").getAbsolutePath
    DedupIndex.build(docs, "text", s"$dir/idx")
    val batch = mkBatch(docs)
    val wide = gateRows(DedupIndex.gate(batch, s"$dir/idx", "text", "doc_id"))
    val narrow = gateRows(DedupIndex.gate(batch, s"$dir/idx", "text", "doc_id",
      broadcastKeyLimit = 0L))
    assert(wide === narrow)
    assert(wide === expected(batch, docs))
  }

  test("ensure is idempotent; a fresh session serves the stored index") {
    val dir = tempDir("dedupidx").getAbsolutePath
    assert(DedupIndex.ensure(docs, "text", s"$dir/idx"))
    assert(!DedupIndex.ensure(docs, "text", s"$dir/idx"), "second ensure rebuilt")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d2 = s2.read.parquet(s"$sf/documents.parquet")
    val before = DedupIndex.historyPasses.get()
    val out = gateRows(DedupIndex.gate(mkBatch(d2), s"$dir/idx", "text", "doc_id"))
    assert(DedupIndex.historyPasses.get() === before)
    assert(out === expected(mkBatch(docs), docs))
  }

  test("non-index table and mixed spec generations reject loudly") {
    val dir = tempDir("dedupidx").getAbsolutePath
    // a Delta table with no bloom rows is not a dedup index
    graft.catalog.DeltaSink.write(
      spark.range(3).select(lit("key").as("kind"), lit(1).as("spec_version"),
        lit(0L).as("epoch"), lit("x").as("h"), col("id").as("hx"),
        lit(null).cast("binary").as("payload")),
      s"$dir/nobloom", Map.empty)
    val e1 = intercept[DedupIndex.DedupIndexException] {
      DedupIndex.gate(docs.limit(1), s"$dir/nobloom", "text", "doc_id").collect()
    }
    assert(e1.getMessage.contains("no bloom rows"))
    // a future spec generation must refuse to serve
    DedupIndex.build(docs.limit(20), "text", s"$dir/idx")
    graft.catalog.DeltaSink.write(
      spark.range(1).select(lit("bloom").as("kind"), lit(99).as("spec_version"),
        lit(7L).as("epoch"), lit("").as("h"), lit(0L).as("hx"),
        lit(Array[Byte](1, 2, 3)).as("payload")),
      s"$dir/idx", Map.empty)
    val e2 = intercept[DedupIndex.DedupIndexException] {
      DedupIndex.gate(docs.limit(1), s"$dir/idx", "text", "doc_id").collect()
    }
    assert(e2.getMessage.contains("spec_version 99"))
  }

  test("torn append (keys without bloom) rejects loudly; a retried append heals") {
    val dir = tempDir("dedupidx").getAbsolutePath
    val epoch0 = docs.filter(col("doc_id") % 2 === 0)
    val epoch1 = docs.filter(col("doc_id") % 2 =!= 0)
    DedupIndex.build(epoch0, "text", s"$dir/idx")
    // simulate a crash between writeEpoch's two commits: epoch 1's key
    // rows land, its bloom does not — gating now would emit epoch-1
    // duplicates as clean (__maybe never fires for them)
    val n = regexp_replace(lower(col("text")), "\\s+", " ")
    graft.catalog.DeltaSink.write(
      epoch1.select(lit("key").as("kind"),
        lit(DedupIndex.SpecVersion).as("spec_version"),
        lit(1L).as("epoch"), md5(n).as("h"), xxhash64(n).as("hx"),
        lit(null).cast("binary").as("payload")).distinct(),
      s"$dir/idx", Map.empty)
    val covBefore = DedupIndex.coverageScans.get()
    val e = intercept[DedupIndex.DedupIndexException] {
      DedupIndex.gate(mkBatch(docs), s"$dir/idx", "text", "doc_id").collect()
    }
    assert(e.getMessage.contains("torn"))
    // the reject itself is driver-side: the orphan epoch is visible in
    // file-level log stats, no key-table scan needed to detect it
    assert(DedupIndex.coverageScans.get() === covBefore,
      "torn-epoch detection fell back to a key-table scan")
    // the retry: maxEpoch derives from BLOOM rows (still 0), so the
    // append re-writes epoch 1 WITH a sketch sized over every epoch-1
    // key row — the orphans are covered and the gate is exact again
    DedupIndex.append(epoch1, "text", s"$dir/idx")
    val out = gateRows(DedupIndex.gate(mkBatch(docs), s"$dir/idx", "text", "doc_id"))
    assert(out === expected(mkBatch(docs), docs))
  }

  test("fuzzy: build → append → gate matches the inline d16 gate; zero raw passes; compact preserves") {
    val dir = tempDir("dedupidx").getAbsolutePath
    val epoch0 = docs.filter(col("doc_id") % 2 === 0)
    val epoch1 = docs.filter(col("doc_id") % 2 =!= 0)
    DedupIndex.buildFuzzy(epoch0, "text", "doc_id", s"$dir/fidx")
    DedupIndex.appendFuzzy(epoch1, "text", "doc_id", s"$dir/fidx")
    val batch = docs.select(col("doc_id"),
      when(col("doc_id") % 2 === 0, col("text"))
        .when(col("doc_id") % 4 === 1, concat(col("text"), lit(" extra")))
        .otherwise(concat(lit("fresh doc "), col("doc_id").cast("string"),
          lit(" payload alpha beta"))).as("text"))
    def marks(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Boolean)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val inline = marks(Dedup.fuzzyIncrementalGate(batch, docs, "text", "doc_id"))
    val before = DedupIndex.historyPasses.get()
    val served = marks(DedupIndex.gateFuzzy(batch, s"$dir/fidx", "text", "doc_id"))
    assert(DedupIndex.historyPasses.get() === before,
      "the fuzzy gate path scanned raw history")
    assert(served === inline)
    // shuffle-fallback regime agrees
    assert(marks(DedupIndex.gateFuzzy(batch, s"$dir/fidx", "text", "doc_id",
      broadcastKeyLimit = 0L)) === inline)
    // compact: epochs fold to one, gate output identical, still no raw passes
    DedupIndex.compact(spark, s"$dir/fidx")
    assert(DedupIndex.historyPasses.get() === before,
      "compact scanned raw history — it must fold the persisted key table only")
    assert(marks(DedupIndex.gateFuzzy(batch, s"$dir/fidx", "text", "doc_id")) === inline)
    val epochs = graft.sources.DeltaNative.read(spark, s"$dir/fidx", Map.empty)
      .filter(col("kind") === "bloom").select("epoch")
      .collect().map(_.getLong(0)).toSeq
    assert(epochs === Seq(0L), s"compact left epochs $epochs")
  }

  test("exact compact preserves gate output; mode mismatch rejects loudly") {
    val dir = tempDir("dedupidx").getAbsolutePath
    DedupIndex.build(docs.filter(col("doc_id") % 2 === 0), "text", s"$dir/idx")
    DedupIndex.append(docs.filter(col("doc_id") % 2 =!= 0), "text", s"$dir/idx")
    val batch = mkBatch(docs)
    val beforeCompact = gateRows(DedupIndex.gate(batch, s"$dir/idx", "text", "doc_id"))
    DedupIndex.compact(spark, s"$dir/idx")
    assert(gateRows(DedupIndex.gate(batch, s"$dir/idx", "text", "doc_id")) === beforeCompact)
    // an exact index through the fuzzy gate (and vice versa) rejects
    val e1 = intercept[DedupIndex.DedupIndexException] {
      DedupIndex.gateFuzzy(batch, s"$dir/idx", "text", "doc_id").collect()
    }
    assert(e1.getMessage.contains("exact index"))
    DedupIndex.buildFuzzy(docs.limit(20), "text", "doc_id", s"$dir/fidx")
    val e2 = intercept[DedupIndex.DedupIndexException] {
      DedupIndex.gate(batch, s"$dir/fidx", "text", "doc_id").collect()
    }
    assert(e2.getMessage.contains("fuzzy index"))
  }

  test("plan pins: broadcast regime never sort-merges; adversarial regime does") {
    val dir = tempDir("dedupidx").getAbsolutePath
    DedupIndex.build(docs, "text", s"$dir/idx")
    DedupIndex.buildFuzzy(docs, "text", "doc_id", s"$dir/fidx")
    val batch = mkBatch(docs)
    // designed regime: the maybe sliver broadcasts, the key table is never
    // exchanged into a sort-merge join
    val b = DedupIndex.gate(batch, s"$dir/idx", "text", "doc_id")
    assert(!b.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
    val fb = DedupIndex.gateFuzzy(batch, s"$dir/fidx", "text", "doc_id")
    assert(!fb.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
    // adversarial (forced) regime: plain shuffle join, nothing unbounded
    // broadcasts — same rows either way (pinned in the earlier tests)
    val sPlan = DedupIndex.gate(batch, s"$dir/idx", "text", "doc_id",
      broadcastKeyLimit = 0L).queryExecution.executedPlan.toString
    assert(sPlan.contains("SortMergeJoin"), s"expected shuffle verify:\n${sPlan.take(2000)}")
    val fsPlan = DedupIndex.gateFuzzy(batch, s"$dir/fidx", "text", "doc_id",
      broadcastKeyLimit = 0L).queryExecution.executedPlan.toString
    assert(fsPlan.contains("SortMergeJoin"), s"expected shuffle verify:\n${fsPlan.take(2000)}")
  }

  test("NULL text rejects loudly at the gate (no dedup identity)") {
    val dir = tempDir("dedupidx").getAbsolutePath
    DedupIndex.build(docs.limit(20), "text", s"$dir/idx")
    val nullBatch = spark.range(2)
      .select(col("id").as("doc_id"), lit(null).cast("string").as("text"))
    val e = intercept[Exception] {
      DedupIndex.gate(nullBatch, s"$dir/idx", "text", "doc_id").collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("NULL text"))
  }
}
