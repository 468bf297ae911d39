package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming surface. The reference is batch-only (SURVEY §2.2:
  * streaming n/a — no watermarks/windows/state anywhere in its src/), so
  * nothing here mirrors reference code; it extends the engine with the
  * streaming half a training-data pipeline needs: continuous ingest dedup,
  * windowed rollups, and gap sessionization.
  *
  * State design for an unbounded 100 TB/day feed: every operator takes a
  * watermark so the state store is BOUNDED — dedup state expires with the
  * watermark, window state closes per window, session state closes per gap.
  * All three compose with `readStream` file/kafka sources and checkpointed
  * `writeStream` sinks unchanged: the transforms are source/sink-agnostic.
  */
object Streams {

  /** Exact streaming dedup on a key, state bounded by the watermark: a
    * duplicate arriving within `delay` of the first sighting is dropped;
    * state for keys older than the watermark is reclaimed. The batch
    * analogue is Dedup.exactMark's hash-groupBy. */
  def dedupStream(df: DataFrame, keyCols: Seq[String], tsCol: String,
      delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Content-hash streaming dedup for documents: same normalization +
    * md5 as the batch d01 operator, so a batch backfill and the streaming
    * path agree on what is a duplicate. */
  def dedupDocsStream(df: DataFrame, textCol: String, tsCol: String,
      delay: String): DataFrame = {
    val h = md5(regexp_replace(lower(col(textCol)), "\\s+", " "))
    dedupStream(df.withColumn("h", h), Seq("h"), tsCol, delay)
  }

  /** Tumbling/sliding windowed aggregation with late-data handling: rows
    * later than `delay` behind the watermark are dropped, windows finalize
    * incrementally (append mode works downstream). */
  def windowedCounts(df: DataFrame, tsCol: String, window_ : String,
      delay: String, aggs: (String, Column)*): DataFrame = {
    val base = df.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), window_))
    val named = if (aggs.isEmpty) Seq("n" -> count(lit(1))) else aggs
    base.agg(named.head._2.as(named.head._1),
      named.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Gap-based SESSION windows — the built-in streaming sibling of q33's
    * batch sessionization: a key's events merge into one session while each
    * falls within `gap` of the session's end (an event exactly `gap` after
    * the previous one still merges — the break is strictly greater, matching
    * q33's `> gapUs`); the emitted window is [min(ts), max(ts) + gap).
    * Watermark `delay` closes sessions (append mode emits only closed ones)
    * and BOUNDS state: one open session struct per active key, reclaimed as
    * the watermark passes its end — at 100 TB/day the state store holds the
    * active-key working set, never history. */
  def sessionCounts(df: DataFrame, keyCol: String, tsCol: String,
      gap: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Streaming DSIR IMPORTANCE GATE — t18's hashed-n-gram target-likeness
    * scoring enforced at ingest time: each arriving document folds its
    * tokens against the 64-entry bucket-score literal (derived ONCE from
    * the static corpus, a driver literal — no broadcast, no join, no
    * state) and only documents at or above `minWeight` flow on. Stateless,
    * so ingest-time selection and the 100 TB backfill are one code path,
    * like the rag-ingest and scrub gates. */
  def dsirGate(df: DataFrame, textCol: String, scores: Array[Long],
      minWeight: Long): DataFrame = {
    require(scores.length == 64, s"dsir scores must have 64 buckets, got ${scores.length}")
    df.withColumn("weight",
        graft.operators.TextOps.dsirWeight(col(textCol), scores))
      .filter(col("weight") >= minWeight)
  }

  /** Streaming GEOFENCE GATE — spatial containment enforced at ingest: a
    * point stream semi-joins a STATIC polygon layer on the native
    * `wkb_contains_point` predicate, so only events inside some fence flow
    * on. Stream-static with the polygon side broadcast (stateless — no
    * watermark, no join state; the static side is a bounded relation), the
    * same plan g13 pins for batch: points never shuffle, each row pays one
    * codegen ring walk per candidate fence. */
  /** STREAMING ANN SERVING — the persisted index lifecycle end to end:
    * the stream pins ONE model generation at start (AnnIndex.loadIvf →
    * bounded driver literals; ZERO training jobs for the stream's
    * lifetime — the s17 contract on a live feed), each micro-batch of
    * query vectors runs the same zero-shuffle projection+probe search
    * against the static corpus, and results append to a native Delta
    * table exactly-once via the (appId, batchId) transaction ledger.
    * Each query row searches independently, so batch boundaries cannot
    * change the result set — what lets the batch SQL replay oracle it.
    * Index REBUILDS are a new stream deployment (the model is
    * deliberately pinned, not re-read per batch — serving must not race a
    * half-written rebuild). */
  def annServeStream(queries: DataFrame, candidates: DataFrame,
      indexPath: String, outRoot: String, k: Int, nprobe: Int,
      appId: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val model = graft.operators.AnnIndex.loadIvf(queries.sparkSession, indexPath)
    // the corpus's cell assignment is a pure function of (corpus, model) —
    // both pinned for the stream's lifetime — so compute it ONCE per
    // generation and serve every micro-batch from the materialized frame
    // (an unmaterialized static side re-runs the whole assignment
    // projection, and its planning, every trigger). Released with the
    // other static pins when the session's streams go idle.
    val celled = graft.operators.Similarity.assignCells(candidates, model)
    pinStaticKeyed(s"annserve-ivf:$outRoot", celled)
    queries.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val res = graft.operators.Similarity
          .ivfSearchWithCelled(batch.toDF(), celled, k, model, nprobe)
        graft.catalog.DeltaSink.write(res, outRoot, Map.empty,
          txn = Some((appId, batchId)))
        ()
    }
  }

  /** STREAMING PQ SERVING — the compressed-domain sibling of
    * [[annServeStream]]: the stream pins ONE persisted codebook generation
    * at start (AnnIndex.loadPq → bounded driver literals, ZERO training
    * jobs for the stream's lifetime), each micro-batch of query vectors
    * runs the two-stage PQ/ADC-coarse + exact-cosine-rerank chain
    * ([[graft.operators.Similarity.pqRerankWithModel]]) against the
    * static corpus, and results append exactly-once via the (appId,
    * batchId) ledger. Per-row independence keeps batch boundaries
    * invisible — the batch s10 replay chain is the oracle. */
  def annServeStreamPq(queries: DataFrame, candidates: DataFrame,
      indexPath: String, outRoot: String, k: Int, kCand: Int, dim: Int,
      appId: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val model = graft.operators.AnnIndex.loadPq(queries.sparkSession, indexPath)
    // the corpus code table is a pure function of (corpus, codebooks) —
    // both pinned for the stream's lifetime — so encode ONCE per
    // generation and serve every micro-batch from the materialized codes:
    // the per-trigger plan drops the whole k×m distance/argmin projection
    // (x32 measured the serve path driver-bound on exactly that
    // re-planning). Released when the session's streams go idle.
    val coded = graft.operators.Similarity.pqEncode(candidates, model, dim)
    pinStaticKeyed(s"annserve-pq:$outRoot", coded)
    queries.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val res = graft.operators.Similarity
          .pqRerankWithCodes(batch.toDF(), coded, candidates, k, kCand, model, dim)
        graft.catalog.DeltaSink.write(res, outRoot, Map.empty,
          txn = Some((appId, batchId)))
        ()
    }
  }

  /** STREAMING SQ SERVING — the code-table sibling of [[annServeStreamPq]]:
    * the stream pins ONE persisted code-table GENERATION at start
    * ([[graft.operators.AnnIndex.loadSqCodes]] resolves the table once —
    * a distributed frame, not driver literals, because SQ codes are
    * per-vector; ZERO corpus encode jobs for the stream's lifetime, the
    * `encodeRuns` pin on a live feed). Each micro-batch of query vectors
    * runs the scale-free coarse cosine over the stored codes + exact
    * rerank, results append exactly-once via the (appId, batchId) ledger.
    * Per-row independence keeps batch boundaries invisible — s11's replay
    * SQL is the oracle verbatim. */
  def annServeStreamSq(queries: DataFrame, candidates: DataFrame,
      indexPath: String, outRoot: String, k: Int, kCand: Int,
      appId: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val codes = graft.operators.AnnIndex.loadSqCodes(queries.sparkSession, indexPath)
    // the code TABLE generation is pinned for the stream's lifetime — an
    // unmaterialized static side re-replays the index table's delta log
    // and re-scans its files every micro-batch. Released when the
    // session's streams go idle.
    pinStaticKeyed(s"annserve-sq:$outRoot", codes)
    queries.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val res = graft.operators.Similarity
          .sqRerankWithCodes(batch.toDF(), codes, candidates, k, kCand)
        graft.catalog.DeltaSink.write(res, outRoot, Map.empty,
          txn = Some((appId, batchId)))
        ()
    }
  }

  /** STREAMING INCREMENTAL DEDUP GATE — arrivals gate against the FULL
    * historical corpus through the persisted [[graft.operators.DedupIndex]]
    * artifact: per micro-batch the gate loads the index's per-epoch bloom
    * literals (bounded driver state), tags rows ROW-LOCALLY, and exact-
    * verifies only the maybe sliver against the persisted key table
    * (stream-static, size-gated broadcast) — NO stream-side state store,
    * no watermark, and the raw history is never scanned (the d17
    * contract on a live feed). Surviving rows append exactly-once via the
    * (appId, batchId) ledger.
    *
    * Index APPEND PICKUP granularity: the index is re-read at each
    * micro-batch boundary, so a shard committed via DedupIndex.append
    * gates every batch that STARTS after the commit — the same
    * read-committed semantics as the batch gate. (Deliberately re-read,
    * unlike the pinned ANN model: a dedup gate that serves a stale key
    * set admits duplicates, while a pinned ANN generation only changes
    * ranking; correctness wins over the per-batch reload cost, which is
    * one log replay + one bloom-row read.) */
  def dedupGateStream(arrivals: DataFrame, indexPath: String, outRoot: String,
      textCol: String, idCol: String, appId: String,
      broadcastKeyLimit: Long = 500000L): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    arrivals.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val res = graft.operators.DedupIndex.gate(batch.toDF(), indexPath,
          textCol, idCol, broadcastKeyLimit)
        graft.catalog.DeltaSink.write(res, outRoot, Map.empty,
          txn = Some((appId, batchId)))
        ()
    }

  /** STREAMING FUZZY DEDUP GATE — the near-dup sibling of
    * [[dedupGateStream]] (d18's persisted band-key index on a live feed):
    * arrivals band row-locally per micro-batch, OR-fold the index's
    * per-epoch bloom literals, exact-verify the maybe-band sliver
    * stream-static against the persisted band-key table, and append the
    * (id, n_hit_bands, keep) marks exactly-once. Same re-read-per-batch
    * pickup contract as the exact gate — a stale band set admits
    * near-duplicates. */
  def fuzzyGateStream(arrivals: DataFrame, indexPath: String, outRoot: String,
      textCol: String, idCol: String, appId: String,
      broadcastKeyLimit: Long = 500000L): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    arrivals.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val res = graft.operators.DedupIndex.gateFuzzy(batch.toDF(), indexPath,
          textCol, idCol, broadcastKeyLimit)
        graft.catalog.DeltaSink.write(res, outRoot, Map.empty,
          txn = Some((appId, batchId)))
        ()
    }

  def geofenceGate(points: DataFrame, fences: DataFrame,
      pointGeom: String, fenceGeom: String): DataFrame =
    points.join(broadcast(fences),
      call_function("wkb_contains_point", fences(fenceGeom), points(pointGeom)),
      "left_semi")

  /** Spark 4 ARBITRARY STATE v2 — `transformWithState` over the RocksDB
    * state store (the successor to mapGroupsWithState: typed state
    * primitives, per-state TTL, timers). Per-key batch + cumulative
    * sighting counts via a single ValueState[Long]: one output row per
    * (key, micro-batch) carrying that batch's count and the running total —
    * the continuous-ingest monitoring shape (arrival-rate drift per shard
    * key). Emission is per-batch-aggregate, not per-row, so the output is
    * deterministic under any intra-batch row order.
    *
    * State is one Long per live key in RocksDB — off-heap, incrementally
    * checkpointed, so the working set at 100 TB/day is bounded by live
    * keys, not throughput; pass a TTLConfig instead of NONE to bound live
    * keys themselves when the key space is unbounded. */
  def batchCumCounts(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
    val spark = df.sparkSession
    import spark.implicits._
    val proc = new StatefulProcessor[Long, Long, (Long, Long, Long)] {
      @transient private var total: ValueState[Long] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        total = getHandle.getValueState[Long]("total",
          org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      override def handleInputRows(key: Long, rows: Iterator[Long],
          timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
        var n = 0L
        while (rows.hasNext) { rows.next(); n += 1 }
        val cum = (if (total.exists()) total.get() else 0L) + n
        total.update(cum)
        Iterator.single((key, n, cum))
      }
    }
    df.select(col(keyCol).cast("long")).as[Long]
      .groupByKey(identity)
      .transformWithState(proc, TimeMode.None(), OutputMode.Append())
      .toDF(keyCol, "n_batch", "n_cum")
  }

  /** Custom keyed state via mapGroupsWithState — the escape hatch when
    * built-in windows cannot express the state machine. Running per-key
    * sighting counts (e.g. duplicate-rate monitoring on a content hash):
    * state is one Long per live key and updates incrementally per
    * micro-batch. Output mode: update.
    *
    * State is BOUNDED by an EVENT-TIME TTL: a key whose last sighting
    * falls more than `ttl` behind the watermark expires (its final count
    * flushes; a later sighting restarts at 1). Without expiry, one state
    * entry per distinct key ever seen accumulates forever — an OOM on a
    * schedule at 100 TB/day of fresh content hashes. Event-time (not
    * wall-clock) expiry keeps replays deterministic and avoids the
    * continuous no-data-batch churn processing-time timeouts cause. */
  def runningKeyCounts(df: DataFrame, keyCol: String, tsCol: String,
      delay: String = "0 seconds", ttl: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("__k"), col(tsCol).cast("timestamp").as("__ts"))
      .withWatermark("__ts", delay) // watermark AFTER the cast — casting would strip it
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, java.sql.Timestamp)], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val last = state.getOption.getOrElse(0L)
            state.remove()
            (key, last)
          } else {
            val rs = rows.toSeq
            val n = state.getOption.getOrElse(0L) + rs.size
            state.update(n)
            // Clamp the timeout base to the current watermark: a batch of
            // late-but-in-watermark rows (or delay > ttl) would otherwise
            // put base+ttl at-or-below the watermark, which Spark rejects
            // with IllegalArgumentException and kills the query.
            val base = math.max(rs.map(_._2.getTime).max,
              state.getCurrentWatermarkMs())
            state.setTimeoutTimestamp(base, ttl)
            (key, n)
          }
      }
      .toDF(keyCol, "n_seen")
  }

  /** Stream-stream interval join (the impression ⋈ click shape): a right
    * row joins a left row with the same key when its timestamp falls in
    * [left ts, left ts + within]. Watermarks on BOTH sides plus the
    * interval bound in the join condition let the engine expire buffered
    * rows — join state is bounded on an unbounded feed; without the time
    * bound Spark would buffer both streams forever. Inner join: unmatched
    * rows drop once the watermark passes their interval. LEFT OUTER (the
    * "impressions that never clicked" ask): an unmatched left row is HELD
    * until the watermark passes the end of its interval, then emitted with
    * nulls on the right — a distinct null-emission state machine in Spark,
    * same bounded-state shape. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsL: String, tsR: String, within: String, delay: String,
      joinType: String = "inner"): DataFrame = {
    require(tsL != tsR, "left/right timestamp columns must be named differently")
    require(joinType == "inner" || joinType == "left_outer" ||
      joinType == "full_outer",
      s"intervalJoin supports inner, left_outer and full_outer, got `$joinType`")
    val l = left.withWatermark(tsL, delay).alias("l")
    val r = right.withWatermark(tsR, delay).alias("r")
    val joined = l.join(r, expr(
      s"l.$keyCol = r.$keyCol AND r.$tsR >= l.$tsL AND r.$tsR <= l.$tsL + interval $within"),
      joinType)
    if (joinType != "full_outer") joined.drop(col(s"r.$keyCol"))
    else {
      // full outer null-extends BOTH sides on watermark expiry, so the key
      // must coalesce across sides (a right-only row has NULL l.key)
      val lCols = left.columns.filterNot(_ == keyCol).map(c => col(s"l.$c").as(c))
      val rCols = right.columns.filterNot(_ == keyCol).map(c => col(s"r.$c").as(c))
      joined.select(
        (coalesce(col(s"l.$keyCol"), col(s"r.$keyCol")).as(keyCol) +:
          (lCols ++ rCols)).toSeq: _*)
    }
  }

  /** Stream-static enrichment join — the dimension-lookup shape every
    * event pipeline needs (event stream ⋈ slowly-changing dim table). The
    * static side broadcasts per micro-batch, so the stream side never
    * shuffles and no join state accumulates: at 100 TB/day of events the
    * cost is one broadcast per batch, independent of stream history. */
  def enrichStatic(stream: DataFrame, dim: DataFrame,
      streamKey: String, dimKey: String): DataFrame =
    stream.join(broadcast(dim), stream(streamKey) === dim(dimKey), "inner")
      .drop(dim(dimKey))

  /** Stateless streaming curation scrub: the BATCH kernels
    * (TextOps.piiCounts / piiRedact / tokenCount) applied unchanged to a
    * stream — row-local projections carry no state, no watermark, no
    * output-mode constraint, so the 100 TB batch scrub and the live-feed
    * scrub are literally one code path (the lakehouse-ingest shape:
    * scrub-on-arrival, backfill with the identical batch job). */
  def scrubStream(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    import graft.operators.TextOps
    val counts = TextOps.piiCounts(col(textCol))
    docs.select(Seq(col(idCol)) ++ counts.map { case (n, c) => c.as(n) }
      :+ TextOps.piiRedact(col(textCol)).as("text_clean")
      :+ (TextOps.tokenCount(col(textCol)) >= 10).as("keep"): _*)
  }

  /** Streaming RAG ingestion: the batch curation kernels unchanged on a
    * document stream — the full 7-rule Gopher keep-filter
    * (TextOps.gopherColumns, row-local) gates each arriving doc, and the
    * survivors explode into overlapping chunk windows
    * (TextOps.chunkWindows) ready for the embedding stage. Stateless
    * (projection + filter + explode): no watermark, no state store,
    * batch-boundary invariant — ingest-time chunking and the 100 TB
    * backfill are one code path. */
  def ragIngestStream(docs: DataFrame, textCol: String, idCol: String,
      chunkLen: Int = 32, overlap: Int = 8): DataFrame = {
    import graft.operators.TextOps
    val keep = TextOps.gopherColumns(col(textCol)).toMap.apply("keep")
    TextOps.chunkWindows(docs.filter(keep), textCol, idCol, chunkLen, overlap)
  }

  /** STREAMING CONTAMINATION GATE — the ingest-time counterpart of the
    * batch fuzzy decontamination (Dedup.fuzzyContaminationMark): arriving
    * documents MinHash-band row-locally (zero-shuffle `minhash_sig` +
    * stack, both stateless), and a STREAM-STATIC broadcast join against
    * the eval set's distinct band keys emits one row per (arrival, band)
    * hit — "don't train on what near-duplicates the eval set", enforced
    * at arrival. No join state, no watermark: the eval side is a bounded
    * batch relation, so an unbounded feed holds nothing. */
  def contaminationGate(stream: DataFrame, eval: DataFrame,
      textCol: String, idCol: String): DataFrame = {
    import graft.operators.Dedup
    val evalBands = Dedup.bandSignatures(
      Dedup.minhashWide(eval, textCol, idCol), idCol)
      .select(col("band"), col("band_sig")).distinct()
    // pin the gate's static index generation: a stream-static join
    // re-executes an unmaterialized static plan EVERY micro-batch — the
    // eval set would re-minhash per trigger (same reasoning as the pinned
    // ANN model; swap-released when the next contamination gate builds,
    // fully released when the session's streams go idle)
    pinStaticKeyed("contamination-gate", evalBands)
    val arriving = Dedup.bandSignatures(
      Dedup.minhashWide(stream, textCol, idCol), idCol)
    arriving.join(org.apache.spark.sql.functions.broadcast(evalBands),
        Seq("band", "band_sig"))
      .select(col(idCol), col("band"))
  }

  /** STREAMING SUBSTRING GATE — the ingest-time counterpart of the batch
    * exact substring scrub (Dedup.substringScrub): arriving documents hash
    * their k-token grams row-locally (stateless projection) and a
    * STREAM-STATIC hash-to-hash join against the corpus's already-known
    * duplicated-gram set emits one row per (arrival, gram) hit — "this
    * arrival repeats text the corpus already holds twice", surfaced at
    * arrival so the doc can be scrubbed or dropped before it lands. No
    * join state, no watermark. The dup-gram side is NOT broadcast: unlike
    * an eval set it is unbounded on boilerplate-heavy corpora (16-byte
    * hashes, but billions of them at 100 TB) — the per-batch join shuffles
    * hash-to-hash and AQE splits hot keys, the lineScrub discipline.
    * `dupGrams` must be the PRE-MATERIALIZED (gram_h) relation (a
    * stream-static join re-executes an unmaterialized static plan every
    * micro-batch — derive it once with [[dupGramsOf]] and write it to a
    * table in production). */
  def substringGate(stream: DataFrame, dupGrams: DataFrame,
      textCol: String, idCol: String, k: Int = 8): DataFrame = {
    import graft.operators.{Dedup, TextOps}
    val grams = stream
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__tk"))
      .select(col(idCol), Dedup.kGramsFromTokens(col("__tk"), k).as("__g"))
      // Generate barrier (explode of a 1-element array): materialize the
      // hash array once before the real explode (the contaminationMark rule)
      .select(col(idCol), explode(array(array_distinct(
        transform(col("__g"), g => md5(g))))).as("__gh"))
      .select(col(idCol), explode(col("__gh")).as("gram_h"))
    grams.join(dupGrams, "gram_h").select(col(idCol), col("gram_h"))
  }

  /** The corpus-duplicated k-gram set for [[substringGate]]: every k-token
    * gram hash appearing in ≥ 2 distinct corpus documents — the same
    * decision set Dedup.substringScrub removes by. One hash-only shuffle. */
  def dupGramsOf(corpus: DataFrame, textCol: String, idCol: String,
      k: Int = 8): DataFrame = {
    import graft.operators.{Dedup, TextOps}
    corpus
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__tk"))
      .select(col(idCol), Dedup.kGramsFromTokens(col("__tk"), k).as("__g"))
      .select(col(idCol), explode(array_distinct(
        transform(col("__g"), g => md5(g)))).as("gram_h"))
      .groupBy(col("gram_h"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2)
      .select(col("gram_h"))
  }

  /** Structured Streaming over a native Delta table root — follows the
    * `_delta_log`, emitting the full snapshot first and then each commit's
    * add-file diff (see org.apache.spark.sql.graftstream.DeltaFollow for
    * the offset/version contract). All delta read options (column mapping,
    * etc.) pass through. */
  def followDelta(s: org.apache.spark.sql.SparkSession, root: String,
      options: Map[String, String] = Map.empty): DataFrame =
    s.readStream.format("delta-follow").options(options)
      .option("files", root).load()

  /** Structured Streaming over a native Delta table's CHANGE DATA FEED —
    * each micro-batch carries the row-level changes (insert / delete /
    * update_preimage / update_postimage) of the commits it covers, stamped
    * _change_type / _commit_version / _commit_timestamp. The streaming
    * face of the batch CDF reader (sources/DeltaChanges.scala). */
  def followDeltaChanges(s: org.apache.spark.sql.SparkSession, root: String,
      startingVersion: Long,
      options: Map[String, String] = Map.empty): DataFrame =
    s.readStream.format("delta-follow").options(options)
      .option("read_change_feed", "true")
      .option("starting_version", startingVersion.toString)
      .option("files", root).load()

  /** Structured Streaming INTO a native Delta table — append-mode writer
    * through the delta-commit sink: each micro-batch becomes one protocol
    * commit carrying a `txn` identifier, so batch re-delivery after a
    * crash is recognized and skipped (exactly-once). `appId` must be
    * stable across restarts of this logical stream. */
  def writeDeltaStream(stream: DataFrame, root: String,
      appId: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.format("delta-commit")
      .option("files", root).option("app_id", appId)
      .outputMode("append")

  /** Structured Streaming INTO a native Iceberg table — append-mode
    * writer through the iceberg-commit sink: each micro-batch becomes one
    * snapshot whose summary records the (appId, batchId) ledger, so batch
    * re-delivery after a crash is recognized and skipped (exactly-once). */
  def writeIcebergStream(stream: DataFrame, root: String,
      appId: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.format("iceberg-commit")
      .option("files", root).option("app_id", appId)
      .outputMode("append")

  /** STREAMING UPSERT into a native Iceberg table — the Flink-CDC writer
    * arrangement: every micro-batch lands as ONE snapshot carrying an
    * equality delete on `keyCols` plus the batch's rows (latest write per
    * key wins across batches; same-commit rows are immune by the spec's
    * strictly-lower sequence rule). Exactly-once through the same
    * (appId, batchId) summary ledger as the append sink. */
  def upsertIcebergStream(stream: DataFrame, root: String, appId: String,
      keyCols: Seq[String], partitionBy: Option[String] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    // partitionBy composes: batch 0 creates the table with the spec's
    // transforms; later batches' upsert snapshots fan their rows out per
    // the table spec while the equality delete stays GLOBAL scope (a key's
    // previous image may sit in a different partition than its new row)
    val w = stream.writeStream.format("iceberg-commit")
      .option("files", root).option("app_id", appId)
      .option("upsert_keys", keyCols.mkString(","))
      .outputMode("append")
    partitionBy.fold(w)(p => w.option("partition_by", p))
  }

  /** STREAMING CDC APPLY — continuous table replication, the pattern a
    * real CDC pipeline runs: follow the SOURCE native Delta table's change
    * feed and apply each micro-batch to the TARGET native Delta table as
    * ONE conditional MERGE keyed on `keyCols` — insert/update_postimage
    * rows upsert the full row, delete rows remove the key (`WHEN MATCHED
    * AND s._change_type = 'delete' THEN DELETE`). Within a batch spanning
    * several source commits only the LATEST change per key applies
    * (ordered by `_commit_version`, a same-version re-insert outranking
    * the delete), so the target converges in one commit per batch.
    *
    * Exactly-once without a ledger: full-row upserts and key deletes are
    * IDEMPOTENT against a target only this stream writes, so a
    * re-delivered batch after a crash re-applies harmlessly (the
    * foreachBatch arrangement). A missing target bootstraps from the
    * feed's snapshot batch (`startingVersion = 0`). State: none held in
    * the stream — the merge reads the target's log per batch, O(changed
    * files) like every copy-on-write commit. */
  def applyDeltaChanges(s: org.apache.spark.sql.SparkSession, sourceRoot: String,
      targetRoot: String, keyCols: Seq[String], startingVersion: Long = 0L,
      options: Map[String, String] = Map.empty)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.expressions.Window
    val feed = followDeltaChanges(s, sourceRoot, startingVersion, options)
    val dataCols = feed.schema.fieldNames.toSeq
      .filterNot(Set("_change_type", "_commit_version", "_commit_timestamp"))
    feed.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val sp = batch.sparkSession
        val changes = batch.filter(col("_change_type") =!= "update_preimage")
        // loud beats lossy: a NULL-keyed change row cannot be replicated
        // by key — the Window dedup below would collapse ALL null-keyed
        // rows in a batch into one. The documented way to hit this is
        // keying on `_row_id` when the SOURCE is maintained by MERGE
        // (merge-insert cdc rows carry no materialized id — ids are
        // assigned to the data files at commit, so their feed id is null).
        // one aggregate pass serves both the guard and the emptiness check
        val nullKey = keyCols.map(col(_).isNull).reduce(_ || _)
        val counts = changes.agg(
          count(lit(1)), count(when(nullKey, lit(1)))).head()
        val (changeCount, nullKeyCount) = (counts.getLong(0), counts.getLong(1))
        if (nullKeyCount > 0) throw new IllegalStateException(
          s"applyDeltaChanges: $nullKeyCount change row(s) with NULL key " +
            s"(${keyCols.mkString(", ")}) cannot be applied by key and " +
            "would silently collapse — if keyed on _row_id, the source " +
            "was maintained by MERGE (insert cdc rows carry no " +
            "materialized id); replicate on a real key column instead")
        // latest change per key in this batch: preimages drop, a re-insert
        // at the same commit outranks its delete
        val rank = when(col("_change_type") === "delete", 0).otherwise(1)
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("_commit_version").desc, rank.desc)
        // batch-lifetime cache: `latest` feeds BOTH merge joins (matched +
        // insert anti-join) and the bootstrap write — unpersisted, each
        // consumer would re-read the batch's change files and re-run the
        // window (released at batch end below)
        val latest = changes
          .withColumn("__rank", row_number().over(w))
          .filter(col("__rank") === 1).drop("__rank")
          .persist()
        val fs = new org.apache.hadoop.fs.Path(targetRoot)
          .getFileSystem(sp.sessionState.newHadoopConf())
        val exists = fs.exists(
          new org.apache.hadoop.fs.Path(targetRoot, "_delta_log"))
        try {
          if (!exists) {
            // bootstrap: the feed's first batch is the source snapshot
            val rows = latest.filter(col("_change_type") =!= "delete")
              .select(dataCols.map(col): _*)
            graft.catalog.DeltaSink.write(rows, targetRoot, Map.empty)
          } else if (changeCount > 0) {
            graft.catalog.DeltaSink.mergeInto(sp, targetRoot, latest,
              keyCols.map(k => s"t.$k = s.$k").mkString(" AND "),
              matchedSet = dataCols.map(c => c -> s"s.$c").toMap,
              matchedDeleteCond = Some("s._change_type = 'delete'"),
              insertCond = Some("s._change_type != 'delete'"))
          }
        } finally latest.unpersist(blocking = false)
        ()
    }
  }

  /** STREAMING UPSERT into a native Delta table — the copy-on-write
    * sibling of [[upsertIcebergStream]]: each micro-batch applies as ONE
    * conditional MERGE keyed on `keyCols` (full-row SET, so re-delivery
    * after a crash re-applies IDEMPOTENTLY — the foreachBatch
    * exactly-once arrangement, no ledger needed); batches may carry the
    * same key several times — the LAST row per key within a batch wins.
    * "Last" is the highest monotonically-increasing id, which is exact
    * arrival order only within a single input partition; in a
    * MULTI-partition micro-batch its high bits encode the partition index,
    * so the winner is partition-layout order, not global arrival order.
    * Sources that need a cross-partition winner must carry an explicit
    * ordering column (event time / sequence) and pre-reduce per key
    * upstream. Matching the latest-write-per-key contract across batches.
    * A missing target bootstraps from the first batch. */
  def upsertDeltaStream(stream: DataFrame, targetRoot: String,
      keyCols: Seq[String]): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.expressions.Window
    require(keyCols.nonEmpty, "upsertDeltaStream needs at least one key column")
    val dataCols = stream.schema.fieldNames.toSeq
    stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val sp = batch.sparkSession
        // last row per key within the batch (monotonic id = arrival order)
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("__arr").desc)
        // batch-lifetime cache: `latest` feeds the emptiness probe and both
        // of the merge's joins (released at batch end)
        val latest = batch
          .withColumn("__arr", monotonically_increasing_id())
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .select(dataCols.map(col): _*)
          .persist()
        try {
          val fs = new org.apache.hadoop.fs.Path(targetRoot)
            .getFileSystem(sp.sessionState.newHadoopConf())
          val exists = fs.exists(new org.apache.hadoop.fs.Path(targetRoot, "_delta_log"))
          if (!exists) graft.catalog.DeltaSink.write(latest, targetRoot, Map.empty)
          else if (!latest.isEmpty)
            graft.catalog.DeltaSink.mergeInto(sp, targetRoot, latest,
              keyCols.map(k => s"t.$k = s.$k").mkString(" AND "),
              matchedSet = dataCols.map(c => c -> s"s.$c").toMap)
        } finally latest.unpersist(blocking = false)
        ()
    }
  }

  /** Structured Streaming over a native Iceberg table root — follows the
    * snapshot-log, emitting the full snapshot first and then each new
    * snapshot's file set-diff (see
    * org.apache.spark.sql.graftstream.IcebergFollow). */
  def followIceberg(s: org.apache.spark.sql.SparkSession, root: String,
      options: Map[String, String] = Map.empty): DataFrame =
    s.readStream.format("iceberg-follow").options(options)
      .option("files", root).load()

  /** Structured Streaming over a native Iceberg table's CHANGELOG —
    * every row change as `_change_type` insert/delete rows attributed to
    * the committing snapshot (initial snapshot = inserts, updates =
    * delete+insert pairs, compactions emit nothing); see
    * org.apache.spark.sql.graftstream.IcebergChangelogSource. */
  def followIcebergChangelog(s: org.apache.spark.sql.SparkSession, root: String,
      options: Map[String, String] = Map.empty): DataFrame =
    s.readStream.format("iceberg-changelog").options(options)
      .option("files", root).load()

  /** STREAMING NEAR-DUP GATE — ingest-time dedup against an EXISTING
    * corpus, the gate a continuously-fed training pipeline puts in front
    * of its store: each arriving embedding hashes into the same
    * hyperplane-LSH band space as the pre-banded static index (row-local
    * codegen sign bits, no state), candidates surface by bucket join —
    * STREAM-STATIC both times, so the stream never self-joins and no
    * stream-stream state accumulates — and the exact `vec_cosine` verify
    * runs on candidates only (the batch cosineNearDupLsh arrangement with
    * the left side live). Hot corpus buckets are capped batch-side before
    * the stream starts. Emits one row per (arrival, match, band);
    * band-multiplicity collapse is one batch DISTINCT downstream (or the
    * sink's idempotence), kept OUT of the stream so no unbounded dedup
    * state builds. */
  def nearDupGate(stream: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, threshold: Double = 0.9, k: Int = 16,
      rowsPerBand: Int = 8, maxBucket: Int = 1000): DataFrame = {
    import graft.operators.Similarity
    val idx = Similarity.cosineLshBands(corpus, idCol, vecCol, k, rowsPerBand)
    val counts = idx.groupBy("band", "band_sig")
      .agg(count(lit(1)).as("__n")).filter(col("__n") <= maxBucket)
    val idxOk = idx.join(counts, Seq("band", "band_sig"))
      .select(col(idCol).as("vec_corpus"), col("band"), col("band_sig"))
    // pin the banded static index: without it every micro-batch re-bands
    // and re-caps the whole corpus (stream-static re-execution)
    pinStaticKeyed("neardup-gate", idxOk)
    val corpusVec = corpus.select(col(idCol).as("vec_corpus"), col(vecCol).as("__vc"))
    val sBands = Similarity.cosineLshBandsKeep(stream, idCol, vecCol, k, rowsPerBand)
      .select(col(idCol).as("vec_new"), col(vecCol).as("__vn"),
        col("band"), col("band_sig"))
    sBands.join(idxOk, Seq("band", "band_sig"))
      .join(corpusVec, Seq("vec_corpus"))
      .withColumn("cos_sim", Similarity.cosine("__vn", "__vc"))
      .filter(col("cos_sim") >= threshold)
      .select(col("vec_new"), col("vec_corpus"), col("cos_sim"))
  }

  /** Resident static-index caches, one slot PER GATE KEY (contamination
    * bands, banded corpus, serve-path codes, the x24 dup-gram set):
    * rebuilding a gate swaps and releases only ITS OWN previous
    * generation, so building a second gate of a DIFFERENT kind can no
    * longer evict a running stream's pinned index (the r16 single-slot
    * design did — the evicted stream silently reverted to full
    * per-micro-batch recomputation of its static side). Two concurrent
    * streams of the SAME gate kind still share a slot — pass a
    * caller-unique key (e.g. the output root) where that matters.
    *
    * Pins are STREAM-lifetime, not session-lifetime: a
    * StreamingQueryListener releases every slot once the session's last
    * active stream terminates (the r16 slot held its final generation
    * forever). A gate whose pins were released stays CORRECT — its
    * static plan simply recomputes per batch again. */
  private val staticPins =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[DataFrame]]()
  private val pinListenerInstalled =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[org.apache.spark.sql.SparkSession, java.lang.Boolean]())

  private[graft] def pinStatic(dfs: DataFrame*): Unit =
    pinStaticKeyed("__default", dfs: _*)

  private[graft] def pinStaticKeyed(key: String, dfs: DataFrame*): Unit = {
    if (dfs.isEmpty) return
    val spark = dfs.head.sparkSession
    if (pinListenerInstalled.add(spark))
      spark.streams.addListener(
        new org.apache.spark.sql.streaming.StreamingQueryListener {
          import org.apache.spark.sql.streaming.StreamingQueryListener._
          override def onQueryStarted(e: QueryStartedEvent): Unit = ()
          override def onQueryProgress(e: QueryProgressEvent): Unit = ()
          override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
            if (spark.streams.active.isEmpty) releaseStaticPins()
        })
    val next = dfs.toSeq.map(_.persist())
    Option(staticPins.put(key, next)).foreach(_.foreach(_.unpersist(blocking = false)))
  }

  /** Release every pinned static-index generation (the last active
    * stream's termination calls this; harmless when nothing is pinned). */
  private[graft] def releaseStaticPins(): Unit = {
    val it = staticPins.keySet().iterator()
    while (it.hasNext) {
      val k = it.next()
      Option(staticPins.remove(k)).foreach(_.foreach(_.unpersist(blocking = false)))
    }
  }

  /** Gap-based sessionization via session_window: a session closes when no
    * event arrives for `gap`; watermark bounds open-session state. The
    * batch analogue is q33_sessionization's lag-over-window chain — here
    * the engine keeps per-key session state instead of a global sort. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, gap: String,
      delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))
}
