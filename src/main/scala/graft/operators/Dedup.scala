package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for training-data pipelines, ordered by cost:
  *
  *   1. exact      — hash-groupBy on a normalization of the text; one shuffle
  *                   on the hash. At 100 TB the hash is 16 bytes/doc, so the
  *                   shuffle is tiny relative to the scan.
  *   2. minhash    — k independent min-hashes over 3-token shingles; the
  *                   signature is k×(doc) rows, shuffled once on (doc, seed).
  *   3. LSH bands  — group the signature into b bands of r rows; equal band
  *                   signatures become join keys. Candidate generation is an
  *                   equi-join on (band, band_sig) — a hash shuffle, never a
  *                   cross join, so it scales linearly with collisions.
  *   4. verify     — n-gram Jaccard on the candidate pairs only.
  *
  * Hashes are md5 hex strings min'd lexicographically: deterministic and
  * identical in any engine (no engine-specific hash function), which is what
  * lets DuckDB act as the oracle.
  */
object Dedup {

  /** Mark exact duplicates (after lowercase + whitespace collapse): keeps the
    * lowest id per hash group. Returns (idCol, hash, keeper). */
  def exactMark(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val h = md5(regexp_replace(lower(col(textCol)), "\\s+", " "))
    df.withColumn("h", h)
      .withColumn("keeper", col(idCol) === min(col(idCol)).over(Window.partitionBy(col("h"))))
      .select(col(idCol), col("h"), col("keeper"))
  }

  /** 3-token shingles from an already-materialized token array column.
    * Docs with <3 tokens produce no shingles (guarded: Spark's sequence()
    * counts DOWN when start>stop, which would fabricate shingles).
    *
    * IMPORTANT: pass a bound column, not an expression — Spark does no
    * common-subexpression elimination inside higher-order-function lambdas,
    * so an inline regexp_extract_all here would re-tokenize the document for
    * every element access (measured 5× slowdown on the minhash pipeline). */
  def shinglesFromTokens(tk: Column): Column =
    when(size(tk) >= 3,
      transform(sequence(lit(1), size(tk) - 2),
        i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1), element_at(tk, i + 2))))
      .otherwise(array())

  /** (id, shingle) rows for a document frame: tokenize once per doc, then
    * explode the DISTINCT shingle list — min() over a set equals min() over
    * the multiset, so dropping repeats changes nothing downstream while
    * cutting one md5 per repeated shingle (boilerplate-heavy corpora repeat
    * most of their shingles). */
  def shingled(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), TextOps.tokens(col(textCol)).as("tk"))
      .select(col(idCol), explode(array_distinct(shinglesFromTokens(col("tk")))).as("shingle"))

  /** Convenience single-expression form (tokenizes inline — see the CSE note
    * on shinglesFromTokens; fine for one-shot use, not in exploded paths). */
  def shingles(text: Column): Column = shinglesFromTokens(TextOps.tokens(text))

  /** Mersenne-prime modulus and the fixed permutation coefficients for the
    * k=16 MinHash family h_i(x) = (a_i·x + b_i) mod P. One base hash per
    * shingle (15 hex chars of md5 → 60-bit int → mod P), then k cheap integer
    * permutations — 16× fewer cryptographic hashes than hashing per seed, and
    * the whole signature folds in ONE groupBy pass with k min() aggregates
    * (no seed explosion, no extra shuffle). a_i·x < 2^62 so int64 never
    * overflows; identical arithmetic in any engine. */
  val P: Long = 2147483647L
  val coeffs: Seq[(Long, Long)] = Seq(
    (1686629717L, 908491823L), (1323398911L, 711135911L), (2038074743L, 183463627L),
    (1556483717L, 529499939L), (1847591057L, 374671411L), (1203979907L, 989839441L),
    (1934295743L, 62089911L), (1724301871L, 848193737L), (1449123287L, 252584339L),
    (2106945553L, 711619259L), (1835910257L, 421234817L), (1285719577L, 932217103L),
    (1747591151L, 133999627L), (1909372319L, 587882411L), (1398741641L, 778614131L),
    (2071829629L, 314159257L))

  /** Wide MinHash signature over 3-token shingles: (id, m0..m{k-1}) with
    * ZERO shuffle — the native `minhash_sig` expression
    * (graft.functions.MinhashSigExpr) folds every permutation's minimum in
    * one pass over the doc's distinct-shingle array, so the signature never
    * leaves its row (the old shape exploded shingles and re-grouped: one
    * whole exchange of the corpus for arithmetic that is per-doc). The
    * per-shingle arithmetic (md5 → 60-bit int mod P → (a·h+b) mod P → min)
    * is bit-identical, and min() is order-free, so every oracle is
    * unchanged. Docs with <3 tokens still drop (null signature filtered).
    *
    * Shingles (not unigrams) are the right granularity when the vocabulary is
    * small relative to doc length: unigram token sets then have pathological
    * mutual Jaccard (~0.7 median on the test corpus → candidate blow-up),
    * while the shingle space is |V|³ and random-pair similarity collapses to
    * ~0 with true near-dups at ~0.98. */
  def minhashWide(df: DataFrame, textCol: String, idCol: String, k: Int = 16): DataFrame = {
    require(k <= coeffs.length, s"at most ${coeffs.length} seeds available")
    val sigCols = (0 until k).map(i => expr(s"sig[$i]").as(s"m$i"))
    df.select(col(idCol), TextOps.tokens(col(textCol)).as("tk"))
      .select(col(idCol), array_distinct(shinglesFromTokens(col("tk"))).as("sh"))
      // explode(array(..)) is a deliberate Generate barrier: a plain
      // projection would be COLLAPSED into the 16 sig[i] extractions below
      // and re-run the whole signature loop per extraction (measured 6×
      // slowdown) — the Generate materializes the signature exactly once
      .select(col(idCol), explode(array(expr("minhash_sig(sh)"))).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col(idCol) +: sigCols: _*)
  }

  /** Long-format MinHash signature (id, seed, minh) — the oracle-friendly
    * shape; derived from the wide signature by an unpivot. */
  def minhash(df: DataFrame, textCol: String, idCol: String, k: Int = 16): DataFrame = {
    val wide = minhashWide(df, textCol, idCol, k)
    val pairs = (0 until k).map(i => s"CAST($i AS BIGINT), m$i").mkString(", ")
    wide.selectExpr(idCol, s"stack($k, $pairs) AS (seed, minh)")
  }

  /** Band signatures straight from the wide minhash: band b's key is the
    * comma-joined run of rowsPerBand consecutive min-hashes. One projection,
    * no window, no second aggregation. */
  def bandSignatures(wide: DataFrame, idCol: String, rowsPerBand: Int = 4, k: Int = 16): DataFrame = {
    val nBands = k / rowsPerBand
    val entries = (0 until nBands).map { b =>
      val run = (b * rowsPerBand until (b + 1) * rowsPerBand).map("m" + _).mkString(", ")
      s"CAST($b AS BIGINT), concat_ws(',', $run)"
    }.mkString(", ")
    wide.selectExpr(idCol, s"stack($nBands, $entries) AS (band, band_sig)")
  }

  /** Candidate near-dup pairs: equi-join on equal band signatures.
    *
    * maxBucket caps the members of any one (band, band_sig) bucket BEFORE the
    * self-join. Without it one hot signature (boilerplate/empty docs — the
    * norm at 100 TB) makes the join quadratic in that bucket: m members → m²
    * rows. A bucket larger than the cap carries no near-dup signal worth m²
    * work (its docs are wholesale duplicates better handled by exactMark), so
    * it is dropped — the standard production MinHash-LSH guard. The count
    * aggregation shares the self-join's (band, band_sig) partitioning, so
    * the guard costs no extra shuffle of the big side. */
  def candidatePairs(bands: DataFrame, idCol: String, maxBucket: Int = 1000): DataFrame = {
    // One shuffle: group each bucket, enforce the cap on the member list,
    // and emit the in-bucket pairs from the array directly — no self-join,
    // no second pass for the count. A capped bucket holds ≤ maxBucket ids
    // (≤ 8 KB), so the collect_list is executor-safe by construction.
    bands.groupBy(col("band"), col("band_sig"))
      .agg(sort_array(collect_list(col(idCol))).as("ms"))
      .filter(size(col("ms")).between(2, maxBucket))
      .select(explode(expr(
        "flatten(transform(ms, (x, i) -> " +
          "transform(slice(ms, i + 2, size(ms)), y -> struct(x AS doc_a, y AS doc_b))))"))
        .as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()
  }

  /** Shingle-set Jaccard for given (doc_a, doc_b) pairs — the verification
    * pass run on LSH candidates only, never all pairs. Uses the same shingle
    * granularity as the MinHash that produced the candidates.
    *
    * Only docs that actually appear in a candidate pair are tokenized: the
    * candidate id set (small — it IS the near-dup suspects) semi-joins the
    * corpus before the expensive shingle materialization, so at 100 TB the
    * verify pass never re-tokenizes or shuffles the full corpus. */
  def jaccardOnPairs(pairs: DataFrame, docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    // left-semi, strategy left to AQE: broadcasts when the candidate set is
    // small, shuffles when a pathological corpus makes it large
    val needed = pairs.select(explode(array(col("doc_a"), col("doc_b"))).as(idCol)).distinct()
    val toks = docs.join(needed, Seq(idCol), "left_semi")
      .select(col(idCol), TextOps.tokens(col(textCol)).as("tk0"))
      .select(col(idCol), array_distinct(shinglesFromTokens(col("tk0"))).as("tk"))
    val inter = size(array_intersect(col("tk_a"), col("tk_b")))
    pairs
      .join(toks.select(col(idCol).as("doc_a"), col("tk").as("tk_a")), "doc_a")
      .join(toks.select(col(idCol).as("doc_b"), col("tk").as("tk_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (inter.cast("double") / (size(col("tk_a")) + size(col("tk_b")) - inter)).as("jaccard"))
  }

  /** k-token n-grams from a bound token-array column (the generalized
    * shinglesFromTokens; same short-doc guard). */
  def kGramsFromTokens(tk: Column, k: Int): Column =
    when(size(tk) >= k,
      transform(sequence(lit(1), size(tk) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(o => element_at(tk, i + lit(o))): _*)))
      .otherwise(array().cast("array<string>"))

  /** EVAL-SET DECONTAMINATION — the check every training corpus needs
    * before benchmark numbers mean anything: mark each training doc that
    * shares at least one k-token n-gram with the held-out eval set, with
    * the shared-distinct-gram count as evidence. Scale shape: the eval
    * side is tiny by construction (it is the benchmark), so its distinct
    * gram set broadcasts; the training corpus explodes its distinct grams
    * once and semi-joins — one scan, one broadcast join, one count
    * aggregation keyed by doc. Token/gram arrays materialize through
    * dedicated selects (the no-CSE-in-lambdas rule). */
  def contaminationMark(docs: DataFrame, textCol: String, idCol: String,
      isEval: Column, k: Int = 8): DataFrame = {
    val base = docs.select(col(idCol), isEval.as("__eval"),
      TextOps.tokens(col(textCol)).as("__tk"))
    // Generate BARRIER (explode of a 1-element array): materializes the
    // gram array exactly once per doc before the real explode consumes it.
    // A plain projection is NOT enough here — a higher-order-function
    // array feeding a downstream Generate gets re-evaluated per EMITTED
    // row (measured 72x on this operator at sf0.1: 40 s -> 0.55 s).
    // Same trick as simhash16's barrier; keep both in sync.
    val grams = base.select(col(idCol), col("__eval"),
      explode(array(array_distinct(kGramsFromTokens(col("__tk"), k)))).as("__g"))
    val exploded = grams.select(col(idCol), col("__eval"),
      explode(col("__g")).as("gram"))
    val evalGrams = exploded.filter(col("__eval")).select("gram").distinct()
    val hits = exploded.filter(!col("__eval"))
      .join(broadcast(evalGrams), "gram")
      .groupBy(col(idCol))
      .agg(countDistinct(col("gram")).as("n_shared"))
    // id list from `base`, not `grams`: the barrier Generate cannot be
    // column-pruned away, so deriving ids from it would re-run the gram
    // build a third time for rows whose grams are never read
    base.filter(!col("__eval")).select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shared"), lit(0L)).as("n_shared_grams"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
  }

  /** Connected components over an undirected pair list via alternating
    * large-star / small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", 2014). Each half-round is one
    * hash shuffle on a node id plus an equi-join against the per-node
    * neighborhood minimum — no neighbor list is ever materialized, so a
    * hot node (a million-member boilerplate cluster at 100 TB) costs rows,
    * not executor memory, and converges in O(log n) rounds to a star
    * forest rooted at each component's minimum id.
    *
    * Returns (node, root) for every node that appears in a pair — roots
    * included, mapped to themselves. Deterministic: component membership
    * and the min-id root are algorithm-independent, which is what lets a
    * recursive-CTE transitive closure act as the oracle.
    */
  /** FUZZY eval-set decontamination: MinHash-LSH banding flags training
    * docs that NEAR-duplicate a held-out document — the paraphrase-level
    * overlap the exact k-gram marker ([[contaminationMark]]) cannot see.
    * The eval side's distinct (band, band_sig) keys BROADCAST (an eval
    * set is always tiny next to a 100 TB corpus); corpus docs band
    * row-locally (zero-shuffle signatures via `minhash_sig`), so the
    * whole flag pass is one scan plus a broadcast semi-join — no
    * corpus-side self-join anywhere. Output: one row per corpus doc that
    * carries a signature (≥ 3 tokens): (idCol, n_shared_bands,
    * fuzzy_contaminated). */
  def fuzzyContaminationMark(docs: DataFrame, textCol: String, idCol: String,
      isEval: Column): DataFrame = {
    val flagged = docs.select(col(idCol), col(textCol), isEval.as("__eval"))
    val evalBands = bandSignatures(
      minhashWide(flagged.filter(col("__eval")), textCol, idCol), idCol)
      .select("band", "band_sig").distinct()
    val corpusBands = bandSignatures(
      minhashWide(flagged.filter(!col("__eval")), textCol, idCol), idCol)
    val hits = corpusBands
      .join(broadcast(evalBands), Seq("band", "band_sig"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("band")).as("__n"))
    corpusBands.select(col(idCol)).distinct()
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).as("n_shared_bands"),
        (coalesce(col("__n"), lit(0L)) > 0).as("fuzzy_contaminated"))
  }

  /** The (seed, a, b) VALUES list the SQL oracles bind as `consts` —
    * rendered once here so every oracle shares the exact coefficients. */
  lazy val constsValuesSql: String = coeffs.zipWithIndex
    .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")

  def components(pairs: DataFrame, aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    // localCheckpoint (eager), NOT persist: each round must truncate the
    // logical plan, or the lineage nests one whole round per iteration and
    // planning itself blows the stack by ~round 8. Iterative graph
    // algorithms on Spark require per-round lineage cuts; on a cluster
    // with executor churn, swap for reliable checkpoint via
    // spark.sparkContext.setCheckpointDir + .checkpoint().
    var edges = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint()
    // fixed-point detection: (count, order-free xxhash XOR fold — overflow-
    // free under ANSI, collision-safe because the edge set is distinct) —
    // two cheap aggregates per round instead of an except() join
    def sig(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var cur = sig(edges)
    var done = cur._1 == 0L
    var rounds = 0
    while (!done) {
      rounds += 1
      require(rounds <= 50, "components: no fixed point in 50 rounds (cycle in edge canon?)")
      // large-star: every strictly-larger neighbor re-points at the
      // neighborhood minimum. Edges stay canonical (u < v) throughout.
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val lmins = sym.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val ls = sym.filter(col("v") > col("u"))
        .join(lmins, "u")
        .select(col("m").as("u"), col("v"))
        .distinct()
      // small-star: orient each edge at its larger endpoint; all smaller
      // neighbors (and the endpoint itself) re-point at the minimum.
      val o = ls.select(col("v").as("u"), col("u").as("v"))
      val smins = o.groupBy("u").agg(min("v").as("m"))
      val next = o.join(smins, "u")
        .filter(col("v") =!= col("m"))
        .select(col("m").as("u"), col("v"))
        .union(smins.select(col("m").as("u"), col("u").as("v")))
        .distinct()
        .localCheckpoint() // eager: materialized before the old blocks drop
      val nsig = sig(next)
      edges.unpersist()
      edges = next
      done = nsig == cur
      cur = nsig
    }
    // the converged forest is a star per component, but min() keeps the
    // mapping well-defined even on the (impossible-by-paper) multi-parent
    // shape rather than silently duplicating nodes. The final checkpoint
    // blocks stay alive — the returned frame reads them.
    edges.select(col("v").as("node"), col("u").as("root"))
      .union(edges.select(col("u").as("node"), col("u").as("root")))
      .groupBy("node").agg(min("root").as("root"))
  }

  /** Near-dup cluster assignment over a whole corpus: every doc gets its
    * component's min doc_id as cluster_id and a keeper flag (the cluster's
    * canonical survivor — the full "dedup the corpus" step). Docs in no
    * verified pair are their own singleton cluster. The component map only
    * holds near-dup members — tiny next to the corpus — so AQE broadcasts
    * the join; the corpus itself is never shuffled. */
  def clusterAssign(docs: DataFrame, verifiedPairs: DataFrame, idCol: String): DataFrame = {
    val comp = components(verifiedPairs).select(col("node").as(idCol), col("root"))
    docs.select(col(idCol).cast("long").as(idCol))
      .join(comp, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("root"), col(idCol)).as("cluster_id"),
        (coalesce(col("root"), col(idCol)) === col(idCol)).as("keeper"))
  }

  /** 16-bit SimHash over the token stream (weighted by occurrence). Bits come
    * from the first 8 hex chars of md5(token); contribution is ±1 per bit per
    * occurrence; the final hash packs sign bits. Pure integer arithmetic —
    * exact in any engine.
    *
    * ZERO shuffle: the native `simhash16` expression
    * (graft.functions.Simhash16Expr) folds all 16 bit-sums in one compiled
    * pass over the doc's token array — the hash never leaves the doc's row
    * (the old shape exploded tokens and re-grouped: one exchange of the
    * token stream for arithmetic that is per-doc). Integer sums are
    * order-free, so the oracle is unchanged. */
  def simhash16(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), TextOps.tokens(col(textCol)).as("tk"))
      // Generate barrier: a plain projection would let the not-null filter
      // push below it as `simhash16(tk) IS NOT NULL` — the hash evaluated
      // twice per row (filter + project)
      .select(col(idCol), explode(array(expr("simhash16(tk)"))).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** LINE-LEVEL corpus scrub (CCNet / Dolma style): a line that appears in
    * `minFreq`+ places across the WHOLE corpus is boilerplate (nav bars,
    * cookie banners, license footers) and is removed from every document;
    * surviving lines are reassembled in original order. Returns one row per
    * doc: total/removed line counts plus the cleaned text (NULL when every
    * line was boilerplate — matching SQL `string_agg` over an empty group).
    *
    * Scale shape: frequency is a map-side-combined count keyed by the
    * 16-byte md5 of the line, so the shuffle carries (hash, count) — never
    * the corpus. The decision join is hash-to-hash shuffle (the frequent
    * set is unbounded in adversarial corpora, so no broadcast; a hot
    * boilerplate hash skews one key and AQE's skew-join split handles it).
    * Reassembly groups by doc id — one exchange of surviving lines. */
  def lineScrub(df: DataFrame, textCol: String, idCol: String,
      minFreq: Int = 3): DataFrame = {
    require(minFreq >= 2, s"lineScrub minFreq must be >= 2, got $minFreq")
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), "\n", -1)))
      .toDF(idCol, "__pos", "__line")
      .withColumn("__h", md5(col("__line")))
    val freq = lines.groupBy("__h").agg(count(lit(1)).as("__c"))
    val kept = struct(col("__pos"), col("__line"))
    lines.join(freq, "__h")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        count(when(col("__c") >= minFreq, lit(1))).as("n_removed"),
        sort_array(collect_list(when(col("__c") < minFreq, kept))).as("__kept"))
      .select(col(idCol), col("n_lines"), col("n_removed"),
        when(size(col("__kept")) === 0, lit(null).cast("string"))
          .otherwise(array_join(
            transform(col("__kept"), x => x.getField("__line")), "\n"))
          .as("clean_text"))
  }

  /** DUPLICATE-PASSAGE PAIR DETECTION — the practical rendering of exact
    * substring dedup (the Lee et al. 2021 concern): two documents sharing
    * ≥ `minShared` winnowing fingerprints share, by the MOSS guarantee,
    * that many distinct ≥(shingle+window−1)-token passages — suffix-array
    * precision without a global suffix sort. Reuses the O(n) native
    * `winnow_minima` pass (t05), then the SAME join-free bucket shape as
    * the LSH candidate generator: fingerprints group once, hot buckets
    * (boilerplate passages — the 100 TB norm) are capped OUT before any
    * pair emission, and in-bucket pairs explode from the member array —
    * one shuffle on the fingerprint key, one on the pair key, no
    * self-join, never all-pairs. */
  def passagePairs(df: DataFrame, textCol: String, idCol: String,
      w: Int = 4, maxBucket: Int = 1000, minShared: Int = 3): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    val fps = df
      .select(col(idCol), TextOps.tokens(col(textCol)).as("tk"))
      .select(col(idCol), shinglesFromTokens(col("tk")).as("sh"))
      .select(col(idCol), TextOps.hashShingles(col("sh")).as("hs"))
      .select(col(idCol), explode(TextOps.winnowFromHashes(col("hs"), w)).as("fp"))
    fps.groupBy(col("fp"))
      .agg(sort_array(collect_set(col(idCol))).as("ms"))
      .filter(size(col("ms")).between(2, maxBucket))
      .select(explode(expr(
        "flatten(transform(ms, (x, i) -> " +
          "transform(slice(ms, i + 2, size(ms)), y -> struct(x AS doc_a, y AS doc_b))))"))
        .as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** EXACT SUBSTRING SCRUB — the removal step of Lee et al. 2021
    * ("Deduplicating Training Data Makes Language Models Better"): any
    * k-token gram appearing in ≥ 2 DISTINCT documents corpus-wide marks its
    * k token positions in every occurrence; marked positions are removed
    * and the survivors reassembled in original order. Where
    * [[passagePairs]] DETECTS shared passages (pair-level evidence), this
    * actually scrubs them — the memorization-killing transform a training
    * corpus runs before packing.
    *
    * The reference paper builds a global suffix array; that is a single
    * sorted view of the whole corpus — the wrong shape for a 100 TB
    * distributed scan. The distributed rendering fixes the match length at
    * k tokens (a shared run of L ≥ k tokens is exactly the union of its
    * L−k+1 overlapping dup grams, so the full run is still removed — the
    * coverage, not the gram list, is what the suffix array would find):
    *
    *   1. gram hashes materialize row-locally (one md5 per k-gram);
    *   2. the frequency pass shuffles (hash, doc) — 16-byte keys, never
    *      text — with map-side partial aggregation;
    *   3. the decision join is hash-to-hash (the dup-gram set is unbounded
    *      on adversarial corpora — no broadcast; a hot boilerplate gram
    *      skews one key and AQE's skew split handles it, the lineScrub
    *      discipline);
    *   4. per-doc dup-start lists come back through one groupBy on the doc
    *      id (ints, bounded by the doc's own gram count);
    *   5. coverage→keep-mask→reassembly is row-local array arithmetic:
    *      covered = ∪ [s, s+k−1], kept = array_except(positions, covered)
    *      — hash-set based, O(tokens + k·starts) per doc, no per-position
    *      scan of the starts list.
    *
    * Output: (idCol, n_tokens, n_removed, clean_text), clean_text NULL
    * when every token was covered (the SQL string_agg-over-empty-group
    * convention, matching lineScrub). Docs with < k tokens pass through
    * untouched; 0-token docs are dropped (no positions to scrub — same
    * filter the oracle's generate_series applies). */
  def substringScrub(df: DataFrame, textCol: String, idCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 2, s"substringScrub k must be >= 2, got $k")
    val base = df.select(col(idCol), TextOps.tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= 1)
    // k-gram hashes per doc, row-local. Generate BARRIER (explode of a
    // 1-element array) materializes the hash array exactly once before the
    // positional explode consumes it — a plain projection would re-run the
    // whole gram build per emitted row (the contaminationMark hazard).
    val ghs = base
      .select(col(idCol), kGramsFromTokens(col("__tk"), k).as("__g"))
      .select(col(idCol), explode(array(transform(col("__g"), g => md5(g)))).as("__gh"))
    val grams = ghs
      .select(col(idCol), posexplode(col("__gh")))
      .toDF(idCol, "__p0", "__h")
      .select(col(idCol), (col("__p0") + 1).as("__s"), col("__h"))
    // corpus-frequency pass: distinct-doc count per gram hash (Spark's
    // two-phase distinct aggregate — partial dedup before the exchange)
    val dup = grams.groupBy(col("__h"))
      .agg(countDistinct(col(idCol)).as("__c"))
      .filter(col("__c") >= 2)
      .select(col("__h"))
    val starts = grams.join(dup, "__h")
      .groupBy(col(idCol))
      .agg(collect_list(col("__s")).as("__starts"))
    base.join(starts, Seq(idCol), "left")
      .select(col(idCol), col("__tk"),
        coalesce(col("__starts"), array().cast("array<int>")).as("__st"))
      .select(col(idCol), col("__tk"),
        array_distinct(flatten(transform(col("__st"),
          s => sequence(s, s + lit(k - 1))))).as("__cov"))
      .select(col(idCol), col("__tk"),
        array_except(sequence(lit(1), size(col("__tk"))), col("__cov")).as("__kp"))
      .select(col(idCol),
        size(col("__tk")).cast("long").as("n_tokens"),
        (size(col("__tk")) - size(col("__kp"))).cast("long").as("n_removed"),
        when(size(col("__kp")) === 0, lit(null).cast("string"))
          .otherwise(array_join(
            transform(col("__kp"), p => element_at(col("__tk"), p)), " "))
          .as("clean_text"))
  }

  /** INCREMENTAL dedup gate — the cross-epoch shape: drop NEW-batch rows
    * whose normalized text already exists in a HISTORY corpus, without ever
    * joining the full batch against it. At 100 TB the history cannot be a
    * join side; the scalable plan is:
    *
    *   1. ONE scan of history builds a bloom filter over xxhash64(norm)
    *      (distributed treeAggregate; the merged sketch lives on the
    *      driver — ~1.2 GB at 1e9 keys / 1% fpp; past that, partition the
    *      history into epochs and apply the gates in sequence).
    *   2. The batch is gated ROW-LOCALLY by Spark's own codegen'd
    *      BloomFilterMightContain over the broadcast-as-literal sketch:
    *      bloom-NEGATIVE rows are DEFINITELY unseen and skip all join work.
    *   3. Only the maybe-positive sliver (true dups + fpp false positives)
    *      is verified exactly — and the verify is SIZE-GATED: the sliver's
    *      distinct key count is measured first (one cheap batch-side pass).
    *      At or under `broadcastKeyLimit` (the designed mostly-new batch
    *      shape) the maybe keys broadcast INTO a semi-join that prunes
    *      history's key scan to the actually-present subset, which
    *      broadcasts back for the final anti-join — history is scanned
    *      twice, shuffled never. PAST the limit (an adversarial batch
    *      that is mostly duplicates — broadcasting it would push
    *      ~|batch-distinct| keys to every executor and collect the present
    *      set on the driver) the verify falls back to a plain shuffle
    *      anti-join against history's key projection: history's KEYS are
    *      exchanged once, but nothing ever lands whole on the driver or in
    *      a broadcast. Both regimes compute the identical exact result.
    *
    * The bloom is an optimization, not a semantics carrier: false positives
    * are killed by the exact verify, false negatives are impossible, so the
    * output is EXACTLY "batch rows whose md5(norm) is absent from history"
    * at any fpp — which is what lets DuckDB oracle it with a plain NOT IN.
    * `expectedItems` sizes the sketch: 0 (the default) AUTO-SIZES from
    * `history.count()` — a parquet count-star answered from row-group
    * metadata, not a data scan — so a KB-scale history no longer ships a
    * ~5 MiB worst-case sketch in every task binary (the d17 writeEpoch
    * arrangement, applied inline). At scale a caller with a cardinality
    * estimate from table stats passes it explicitly and skips even the
    * metadata pass. An underestimate only degrades fpp — more rows take
    * the exact-verify path — never correctness. NULL text rejects loudly:
    * a NULL document
    * has no dedup identity, and silently keeping it would diverge from the
    * NOT-IN contract (NULL never matches an anti-join key).
    * Intra-batch duplicates are out of scope (exactMark owns those).
    * Output: (idCol, h). */
  /** The dedup text identity (d01/d15/d17 agree by construction): lowercase
    * + whitespace collapse, NULL rejected loudly — a NULL document has no
    * dedup identity, and silently keeping it would diverge from the NOT-IN
    * oracle contract (NULL never matches an anti-join key). */
  private[operators] def normText(c: Column): Column = when(c.isNull,
      raise_error(lit("dedup gate: NULL text has no dedup identity — " +
        "filter or fill NULL documents before the gate")).cast("string"))
    .otherwise(regexp_replace(lower(c), "\\s+", " "))

  def incrementalGate(newDf: DataFrame, history: DataFrame, textCol: String,
      idCol: String, fpp: Double = 0.01,
      expectedItems: Long = 0L,
      broadcastKeyLimit: Long = 500000L): DataFrame = {
    def norm(c: Column): Column = normText(c)
    val histKeys = history.select(md5(norm(col(textCol))).as("h"),
      xxhash64(norm(col(textCol))).as("hx"))
    // auto-size (scaladoc): history row count upper-bounds the distinct
    // key count. The count is metadata-only when `history` is a bare file
    // scan (the common shape — parquet footers answer count(*) with no
    // data read); a filtered/unioned/derived history frame pays a real
    // count job per gate call — pass expectedItems explicitly there.
    val sized = if (expectedItems > 0L) expectedItems
      else math.max(history.count(), 1L)
    // sketch putLong/mightContainLong pair with xxhash64 exactly as
    // Spark's own injected runtime filters do
    val bloom = histKeys.select(col("hx")).stat
      .bloomFilter("hx", sized, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    // cache the tagged batch: it feeds the size-gate count, the clean
    // branch AND the verify branch — un-persisted, the md5+xxhash64+
    // normalize chain would re-run per consumer (~2 extra batch scans per
    // gate invocation). Same bounded one-resident-frame lifecycle as the
    // fuzzy gate's maybe cache.
    val tagged = newDf.select(col(idCol), md5(norm(col(textCol))).as("h"),
      call_function("bloom_might_contain",
        lit(bos.toByteArray), xxhash64(norm(col(textCol)))).as("__maybe"))
      .persist()
    swapGateCache(tagged)
    val clean = tagged.filter(!col("__maybe")).select(col(idCol), col("h"))
    val maybeKeys = tagged.filter(col("__maybe")).select(col("h")).distinct()
    // size-gate the exact verify: one cheap batch-side count decides the
    // join strategy (scaladoc step 3) — never broadcast an unbounded
    // sliver. The ROW count (no distinct) is a shuffle-free upper bound on
    // the key count: an over-estimate only trips the shuffle fallback
    // earlier, never correctness
    val nMaybe = tagged.filter(col("__maybe")).count()
    val verified =
      if (nMaybe <= broadcastKeyLimit) {
        val present = histKeys.select(col("h"))
          .join(broadcast(maybeKeys), Seq("h"), "left_semi").distinct()
        tagged.filter(col("__maybe"))
          .join(broadcast(present), Seq("h"), "left_anti")
          .select(col(idCol), col("h"))
      } else
        tagged.filter(col("__maybe"))
          .join(histKeys.select(col("h")).hint("shuffle_merge"), Seq("h"), "left_anti")
          .select(col(idCol), col("h"))
    clean.unionByName(verified)
  }

  /** FUZZY incremental dedup gate — the NEAR-DUP sibling of
    * [[incrementalGate]]: mark new-batch rows that MinHash-band-collide
    * with the historical corpus, without ever joining it. History is
    * scanned twice and shuffled never, same contract: one pass folds a
    * bloom over xxhash64 of its (band : band_sig) keys (4 keys/doc at the
    * k=16/r=4 default — the sketch ceiling is 4× [[incrementalGate]]'s per
    * doc; epoch-partition past ~2.5e8 docs), the batch's bands gate
    * row-locally, and only maybe-positive band keys are verified exactly
    * through the broadcast semi/anti pattern. The verify is SIZE-GATED
    * exactly like [[incrementalGate]]'s: the maybe-band sliver's distinct
    * key count is measured first; past `broadcastKeyLimit` (an adversarial
    * mostly-duplicate batch) the broadcast pattern is replaced by a plain
    * shuffle semi-join against history's band-key projection — history's
    * keys exchange once, nothing unbounded broadcasts. The bloom stays a
    * pure optimization: output is EXACTLY "bands of the batch doc present
    * in history's band set" at any fpp, which is what the SQL oracle
    * replays (the full minhash→band chain on both sides). Docs too short
    * to shingle (< 3 tokens, or NULL text) carry no bands and are kept
    * with n_hit_bands = 0 — consistent in both engines by construction.
    *
    * Caching: the maybe-band frame feeds two consumers (present-key
    * derivation and hit counting), so it persists for the query's
    * lifetime; each new gate invocation releases the previous
    * invocation's cache (bounded at ONE resident frame per session —
    * long-lived sessions don't accumulate), and [[releaseGateCache]]
    * frees it eagerly once the caller has materialized the result.
    * Output: (idCol, n_hit_bands, keep). */
  def fuzzyIncrementalGate(newDf: DataFrame, history: DataFrame,
      textCol: String, idCol: String, fpp: Double = 0.01,
      expectedItems: Long = 0L,
      broadcastKeyLimit: Long = 500000L): DataFrame = {
    def bandsOf(df: DataFrame): DataFrame =
      bandSignatures(minhashWide(df, textCol, idCol), idCol)
        .select(col(idCol), concat_ws(":", col("band"), col("band_sig")).as("k"))
    val histBands = bandsOf(history)
    // auto-size (same contract as incrementalGate, incl. the bare-file-
    // scan caveat): ≤ k/rowsPerBand band keys per history doc — bandsOf
    // uses bandSignatures' defaults (k=16, rowsPerBand=4 ⇒ 4 bands), and
    // this multiplier MUST track those defaults if they ever change
    // (an undersized sketch only degrades fpp, never correctness) —
    // so 4× the metadata row count upper-bounds the insertions without
    // touching the minhash pipeline
    val sized = if (expectedItems > 0L) expectedItems
      else math.max(4L * history.count(), 1L)
    val bloom = histBands.select(xxhash64(col("k")).as("kx")).stat
      .bloomFilter("kx", sized, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    // cache the maybe-positive band rows: they feed the size-gate count,
    // the present-key derivation AND the hit counting — an un-persisted
    // frame would re-run the whole batch minhash pass per consumer
    val maybes = bandsOf(newDf)
      .withColumn("__maybe",
        call_function("bloom_might_contain", lit(bos.toByteArray), xxhash64(col("k"))))
      .filter(col("__maybe")).select(col(idCol), col("k"))
      .persist()
    swapGateCache(maybes)
    val maybeKeys = maybes.select(col("k")).distinct()
    // row count (no distinct): shuffle-free upper bound on the key count,
    // reading back the just-persisted blocks — over-estimating only trips
    // the shuffle fallback earlier, never correctness
    val nMaybe = maybes.count() // also materializes the cache
    val hits =
      if (nMaybe <= broadcastKeyLimit) {
        val present = histBands.select(col("k"))
          .join(broadcast(maybeKeys), Seq("k"), "left_semi")
          .distinct()
        maybes.join(broadcast(present), Seq("k"), "left_semi")
          .groupBy(col(idCol)).agg(countDistinct(col("k")).as("n_hit_bands"))
      } else
        maybes.join(histBands.select(col("k")).hint("shuffle_merge"),
            Seq("k"), "left_semi")
          .groupBy(col(idCol)).agg(countDistinct(col("k")).as("n_hit_bands"))
    newDf.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hit_bands"), lit(0L)).as("n_hit_bands"))
      .withColumn("keep", col("n_hit_bands") === 0L)
  }

  // ----------------------------------------------- gate-cache lifecycle

  /** The ONE resident gate cache (d15's tagged batch / d16's maybe-band
    * frame — see [[incrementalGate]] / [[fuzzyIncrementalGate]]):
    * swapping in a new frame unpersists the previous one, so repeated
    * gate invocations in a long-lived session hold at most one cached
    * frame instead of accumulating storage memory forever. */
  private val gateCache = new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  private[operators] def swapGateCache(next: DataFrame): Unit = {
    val prev = gateCache.getAndSet(next)
    if (prev != null && (prev ne next)) prev.unpersist(blocking = false)
  }

  /** Eagerly release the fuzzy gate's cached maybe-band frame. Safe to
    * call once the gate's returned frame has been materialized (written /
    * collected); a later re-materialization would recompute from lineage,
    * still correct. */
  def releaseGateCache(): Unit = swapGateCache(null)
}
