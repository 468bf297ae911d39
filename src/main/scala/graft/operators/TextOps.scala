package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis kernels for large-scale training-data pipelines: tokenizing,
  * counting, fingerprinting, language-ID, quality scoring.
  *
  * Everything here is a pure Column expression (whole-stage codegen'd — no
  * UDFs), so it runs at scan speed and survives a 100 TB fan-out: each doc is
  * processed independently, no shuffle until the caller aggregates.
  *
  * Cross-engine determinism: every kernel is also expressible in ANSI/DuckDB
  * SQL with identical results (the oracle queries in PipelineQueries mirror
  * these formulas 1:1).
  */
object TextOps {

  /** Lowercased alphanumeric tokens. Same regex semantics in Java and RE2. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** Whitespace-ish token count (BIGINT to match DuckDB len()). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count: greedy chunks of ≤4 letters, digit runs, or single
    * non-alphanumeric glyphs — a deterministic proxy for a real tokenizer's
    * piece count (the actual BPE vocab isn't in this container). */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]{1,4}|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long")

  /** Order-insensitive document fingerprint: md5 over the sorted distinct
    * token set. Catches bag-of-words duplicates that exact hashing misses. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** PII patterns as (name, regex, replacement-token). RE2-compatible (no
    * backreferences/lookarounds) so DuckDB's regexp functions replay them
    * exactly — that's what makes the scrub oracle-checkable. Toy breadth
    * (email / IPv4 / NANP-ish phone), honestly labeled: production
    * scrubbing needs a curated pattern battery + validation, but the
    * ENGINE shape is the real design — count and redact are row-local
    * codegen'd projections, so a 100 TB scrub costs exactly one scan,
    * zero shuffle. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\+?\\d{3}[-. ]\\d{3}[-. ]\\d{4}", "<PHONE>"))

  /** Per-pattern match counts over the ORIGINAL text (each independent —
    * counts don't shift with redaction order). */
  def piiCounts(text: Column): Seq[(String, Column)] =
    piiPatterns.map { case (n, p, _) =>
      s"n_$n" -> size(regexp_extract_all(text, lit(p), lit(0))).cast("long")
    }

  /** Redacted text: patterns applied in declaration order (email first, so
    * an address's host octets never half-match as an IP afterwards). */
  def piiRedact(text: Column): Column =
    piiPatterns.foldLeft(text) { case (t, (_, p, tok)) =>
      regexp_replace(t, p, tok)
    }

  /** Stopword vocabularies for the n-gram language-ID heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("de5", "shi4", "le5", "he2", "zai4"))

  /** Hash an ordered shingle array (60-bit md5-derived, mod P). Pass a
    * BOUND column: Spark does no common-subexpression elimination inside
    * higher-order-function lambdas, so an inline shingle/token expression
    * here re-tokenizes the document for every element access — measured 25×
    * on the winnowing bench (the pitfall documented on
    * Dedup.shinglesFromTokens; each pipeline stage must be its own
    * projection). */
  def hashShingles(boundShingles: Column): Column =
    transform(boundShingles, s =>
      conv(substring(md5(s), 1, 15), 16, 10).cast("long") % Dedup.P)

  /** Winnowing fingerprints (the MOSS rolling-hash scheme) from a BOUND
    * hash-array column: slide a window of `w`, keep each window's minimum,
    * dedupe (first-occurrence order). Guarantees any shared run of ≥ w+k-1
    * tokens between two docs shares a fingerprint. Deterministic
    * (md5-derived hashes) → oracle-replayable.
    *
    * Runs as the native `winnow_minima` expression
    * (graft.functions.WinnowMinimaExpr): a single O(n) monotonic-deque pass
    * per doc, replacing the interpreted sparse-table zip_with passes —
    * output set and order identical, so the oracle is unchanged. Callers
    * that extract multiple aggregates of the result should route it through
    * a Generate barrier first (see t05) or the collapsed projection
    * re-evaluates the pass per aggregate. */
  def winnowFromHashes(hs: Column, w: Int = 4): Column = {
    require(w >= 2, "window must be at least 2")
    call_function("winnow_minima", hs, lit(w))
  }

  private def markerScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit(_)): _*))).cast("long")

  /** Language-ID: argmax of per-language stopword hit counts over the token
    * stream, ties broken by language-code order ('und' when no marker hits).
    * A real deployment swaps the marker lists for char-n-gram profiles; the
    * plumbing (tokenize → score → argmax) is the operator under test. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langMarkers.map { case (lang, ms) => lang -> markerScore(toks, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language in code order achieving the max, only if max > 0
    scores.reverse.foldLeft(lit("und")) { case (acc, (lang, sc)) =>
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Repetition statistics — the Gopher/Dolma-family quality rules, adapted
    * token-wise (the synthetic corpus has no line structure; the published
    * top-n-gram and duplicate-n-gram rules are token-based anyway):
    * most-frequent-bigram mass, duplicated-trigram mass, and the longest
    * same-token run. Computed over the first `cap` tokens — the standard
    * prefix-window trick: the distinct-count folds are O(cap²) per doc and
    * INDEPENDENT of document length, so the operator stays row-local and
    * bounded at any corpus size (100 TB shape: zero shuffle, scan speed).
    * Docs shorter than the n-gram width yield NULL fractions, never a
    * division error. */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String,
      cap: Int = 256): DataFrame = {
    // MATERIALIZE tk, bg, tg as real projection steps. Spark does no
    // common-subexpression elimination inside higher-order-function
    // lambdas, and these arrays feed NESTED lambdas: inlining `tk` would
    // re-tokenize the document on EVERY element access — measured 60×
    // slowdown (O(cap²) full-document regex passes per doc). A non-cheap
    // alias referenced more than once blocks CollapseProject, so each
    // select below is a hard evaluation boundary.
    val tk0 = slice(tokens(col(textCol)), 1, cap)
    val step1 = df.select(col(idCol), tk0.as("__tk"))
    val tk = col("__tk")
    val n = size(tk)
    // n-grams as joined strings; guarded — Spark's sequence(1, 0) would
    // generate a DESCENDING [1, 0], not an empty array
    def grams(k: Int): Column = when(n >= k,
      transform(sequence(lit(1), n - (k - 1)),
        i => concat_ws(" ", (0 until k).map(o => element_at(tk, i + lit(o))): _*)))
      .otherwise(array().cast("array<string>"))
    val step2 = step1.select(col(idCol), tk,
      grams(2).as("__bg"), grams(3).as("__tg"))
    val bg = col("__bg")
    val tg = col("__tg")
    // Frequency statistics via SORTED-RUN folds — O(cap·log cap) per doc —
    // instead of the r15 distinct×filter scans, which were O(cap²) string
    // comparisons per doc in interpreted lambda evaluation (guide §1.2
    // step 2: per-task work; measured 2.46 s of single-expression time at
    // sf0.1). Values are identical integers: the longest equal run of a
    // sorted array IS the max element frequency, and the members of runs
    // of length ≥ 2 ARE exactly the elements whose frequency exceeds 1.
    def maxFreq(arr: Column): Column = aggregate(array_sort(arr),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, t) => {
        val r = when(t === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(t.as("prev"), r.as("run"),
          greatest(acc.getField("best"), r).as("best"))
      },
      acc => acc.getField("best"))
    def dupCount(arr: Column): Column = aggregate(array_sort(arr),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("dup")),
      (acc, t) => {
        val same = t === acc.getField("prev")
        val r = when(same, acc.getField("run") + 1).otherwise(lit(1))
        // a run reaching length 2 counts both members; longer runs add one
        val d = when(same && r === 2, acc.getField("dup") + 2)
          .when(same, acc.getField("dup") + 1)
          .otherwise(acc.getField("dup"))
        struct(t.as("prev"), r.as("run"), d.as("dup"))
      },
      acc => acc.getField("dup"))
    val topBigram = maxFreq(bg)
    val dupTri = dupCount(tg)
    // longest consecutive same-token run in ONE left fold (struct state)
    val maxRun = aggregate(tk,
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, t) => {
        val r = when(t === acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1))
        struct(t.as("prev"), r.as("run"), greatest(acc.getField("best"), r).as("best"))
      },
      acc => acc.getField("best"))
    step2.select(col(idCol),
      n.cast("long").as("n_window_tokens"),
      when(size(bg) > 0, topBigram.cast("double") / size(bg)).as("top_bigram_frac"),
      when(size(tg) > 0, dupTri.cast("double") / size(tg)).as("dup_trigram_frac"),
      maxRun.cast("long").as("max_token_run"))
  }

  /** Quality components: token count, unique-token ratio, mean token length,
    * alpha-character ratio. Single divisions only — deterministic doubles. */
  def qualityColumns(text: Column, nChars: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nTok = size(toks).cast("long")
    val nUniq = size(array_distinct(toks)).cast("long")
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
    val nAlpha = length(regexp_replace(lower(text), "[^a-z]", "")).cast("long")
    Seq(
      "n_tokens" -> nTok,
      "uniq_ratio" -> (nUniq.cast("double") / nTok),
      "avg_token_len" -> (sumLen.cast("double") / nTok),
      "alpha_ratio" -> (nAlpha.cast("double") / nChars))
  }

  /** CORPUS-LM QUALITY SCORE (the CCNet/Gopher perplexity-filter idea,
    * log-free): train a Laplace-smoothed bigram model on the corpus itself
    * — two counting passes — then score each document as the MEAN smoothed
    * conditional probability of its bigrams,
    * `P(b|a) = (c(a,b)+1) / (c(a)+V)`. Documents that read like the corpus
    * score high; token salad scores near the smoothing floor. Output:
    * (idCol, n_bigrams, lm_score); docs with <2 tokens carry no bigrams
    * and drop.
    *
    * Log-free BY DESIGN: perplexity's ln() has no cross-libm bit contract,
    * but counts are exact integers, int→double casts are exact below 2^53,
    * IEEE division is correctly rounded, and the per-doc sum is a FIXED
    * position-ordered left fold — so Spark and the DuckDB oracle produce
    * bit-identical doubles (the vec_cosine discipline).
    *
    * Scale shape: bigram counting is one map-side-combined shuffle on
    * (a,b); scoring joins each doc bigram to its two count tables (AQE
    * broadcasts them when the vocab is small); V is one bounded scalar on
    * the driver. No all-pairs, no transcendentals, no UDFs. */
  def lmQualityScore(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol), tokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) >= 2)
    val bi = toks.select(col(idCol), posexplode(expr(
      "transform(sequence(0, size(tk) - 2), i -> struct(tk[i] AS a, tk[i + 1] AS b))")))
      .select(col(idCol), col("pos"), col("col.a").as("a"), col("col.b").as("b"))
    val cab = bi.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    val ca = bi.groupBy("a").agg(count(lit(1)).as("c_a"))
    val vocab = toks.select(explode(col("tk")).as("t"))
      .agg(countDistinct(col("t"))).head().getLong(0)
    val scored = bi.join(cab, Seq("a", "b")).join(ca, Seq("a"))
      .withColumn("p", (col("c_ab") + 1).cast("double") /
        (col("c_a") + lit(vocab)).cast("double"))
    scored.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("pos"), col("p")))).as("ps"),
        count(lit(1)).as("n_bigrams"))
      .withColumn("lm_score",
        expr("aggregate(ps, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.p)")
          / col("n_bigrams"))
      .select(col(idCol), col("n_bigrams"), col("lm_score"))
  }

  /** Oracle for [[lmQualityScore]]: `fromSql` must yield (`idCol`,
    * `textCol`). The list_reduce left fold replays Spark's aggregate()
    * bit-for-bit (0.0 + p1 == p1 in IEEE, every later step identical). */
  def lmQualityScoreSql(fromSql: String, textCol: String, idCol: String): String =
    s"""WITH src AS ($fromSql),
        t2 AS (SELECT $idCol, regexp_extract_all(lower($textCol), '[a-z0-9]+') AS tk
               FROM src),
        toks AS (SELECT $idCol, tk FROM t2 WHERE len(tk) >= 2),
        bi AS (SELECT $idCol, i AS pos, tk[i + 1] AS a, tk[i + 2] AS b
               FROM toks, unnest(generate_series(0, len(tk) - 2)) AS u(i)),
        cab AS (SELECT a, b, count(*) AS c_ab FROM bi GROUP BY a, b),
        ca AS (SELECT a, count(*) AS c_a FROM bi GROUP BY a),
        v AS (SELECT count(DISTINCT t) AS vocab
              FROM (SELECT unnest(tk) AS t FROM toks)),
        scored AS (SELECT bi.$idCol, bi.pos,
                          CAST(c_ab + 1 AS DOUBLE) /
                          CAST(c_a + (SELECT vocab FROM v) AS DOUBLE) AS p
                   FROM bi JOIN cab USING (a, b) JOIN ca USING (a)),
        lists AS (SELECT $idCol, list(p ORDER BY pos) AS ps, count(*) AS n_bigrams
                  FROM scored GROUP BY $idCol)
        SELECT $idCol, n_bigrams,
               list_reduce(ps, (acc, x) -> acc + x) / n_bigrams AS lm_score
        FROM lists"""

  /** The stop-word list of the Gopher quality filter (Rae et al. 2021,
    * §A1.1): a doc must contain at least 2 of these to pass. */
  val gopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** GOPHER QUALITY-FILTER RULES (Rae et al. 2021, appendix A1.1 — the
    * published MassiveWeb document filter, also the core of Dolma/RefinedWeb
    * curation): per-document measures + per-rule verdicts + the combined
    * keep decision, all as row-local codegen projections — a 100 TB filter
    * pass costs exactly one scan, zero shuffle.
    *
    * Rules (document drops when any fails):
    *   1. 50 ≤ word count ≤ 100,000            (words = \\S+ runs)
    *   2. 3 ≤ mean word length ≤ 10
    *   3. symbol-to-word ratio ≤ 0.1           (# glyphs + "..." runs)
    *   4. ≤ 90% of lines start with a bullet ("- ")
    *   5. ≤ 30% of lines end with an ellipsis ("...")
    *   6. ≥ 80% of words contain an alphabetic character
    *   7. ≥ 2 distinct stop words present
    *
    * Each measure is expressible 1:1 in DuckDB (list_filter / regexp /
    * starts_with), so the whole filter sits under the hash gate (t16). */
  def gopherColumns(text: Column): Seq[(String, Column)] = {
    val words = regexp_extract_all(text, lit("\\S+"), lit(0))
    val nWords = size(words).cast("long")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val sumLen = aggregate(words, lit(0L), (a, w) => a + length(w).cast("long"))
    val meanLen = sumLen.cast("double") / nWords
    val nSym = (size(regexp_extract_all(text, lit("#"), lit(0))) +
      size(regexp_extract_all(text, lit("\\.\\.\\."), lit(0)))).cast("long")
    val symRatio = nSym.cast("double") / nWords
    val bulletRatio = size(filter(lines, l => startswith(l, lit("- "))))
      .cast("double") / nLines
    val ellipsisRatio = size(filter(lines, l => endswith(l, lit("..."))))
      .cast("double") / nLines
    val alphaRatio = size(filter(words, w => w.rlike("[a-zA-Z]")))
      .cast("double") / nWords
    val distinctToks = array_distinct(tokens(text))
    val nStop = size(filter(
      array(gopherStopWords.map(lit): _*), sw => array_contains(distinctToks, sw)))
      .cast("long")
    val keep = (nWords >= 50L) && (nWords <= 100000L) &&
      (meanLen >= 3.0) && (meanLen <= 10.0) &&
      (symRatio <= 0.1) && (bulletRatio <= 0.9) && (ellipsisRatio <= 0.3) &&
      (alphaRatio >= 0.8) && (nStop >= 2L)
    Seq(
      "n_words" -> nWords,
      "mean_word_len" -> meanLen,
      "symbol_ratio" -> symRatio,
      "bullet_ratio" -> bulletRatio,
      "ellipsis_ratio" -> ellipsisRatio,
      "alpha_word_ratio" -> alphaRatio,
      "n_stop_words" -> nStop,
      "keep" -> keep)
  }

  /** RAG-STYLE CHUNK WINDOWS: split each document into fixed-length token
    * windows with overlap — the indexing shape every retrieval pipeline
    * needs before embedding. Chunk i (1-based) covers tokens
    * [(i-1)·stride + 1, (i-1)·stride + chunkLen] where
    * stride = chunkLen − overlap; the chunk count
    * 1 + ⌈max(0, n − chunkLen) / stride⌉ is computed in exact integer
    * arithmetic, so every token lands in ≥ 1 chunk and the last chunk is
    * the only short one.
    *
    * Scale shape: tokenize + sequence + explode are all row-local — the
    * output is ~n/stride rows per doc with NO shuffle; at 100 TB the
    * chunker runs at scan speed and feeds the embedding stage directly.
    * Output: (idCol, chunk_id, start_tok, n_tokens, chunk_text). */
  def chunkWindows(df: DataFrame, textCol: String, idCol: String,
      chunkLen: Int, overlap: Int): DataFrame = {
    require(chunkLen > 0 && overlap >= 0 && overlap < chunkLen,
      s"chunkWindows: need 0 <= overlap < chunkLen, got $chunkLen/$overlap")
    val stride = chunkLen - overlap
    df.select(col(idCol), tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) > 0)
      // chunk count as its own projection step (no CSE in HOF lambdas)
      .withColumn("__n", size(col("__tk")).cast("long"))
      .withColumn("__nc", // DIV: Column./ is double division — stay integral
        expr(s"1 + (greatest(__n - $chunkLen, 0L) + ${stride - 1}) DIV $stride"))
      .select(col(idCol), col("__tk"), explode(sequence(lit(1L), col("__nc"))).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        ((col("chunk_id") - 1L) * stride + 1L).as("start_tok"),
        slice(col("__tk"), ((col("chunk_id") - 1L) * stride + 1L).cast("int"),
          lit(chunkLen)).as("__c"))
      .select(col(idCol), col("chunk_id"), col("start_tok"),
        size(col("__c")).cast("long").as("n_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }

  /** DSIR hashed-n-gram bucket of a token (Xie et al.): md5's first 6 hex
    * chars mod 64 — the shared convention the distribution estimate AND
    * every scoring site must agree on (t18 batch, x27 streaming gate). */
  def dsirBucket(tok: Column): Column =
    pmod(conv(substring(md5(tok), 1, 6), 16, 10).cast("long"), lit(64))

  /** Per-document DSIR importance weight against a 64-entry integer-
    * quantized bucket-score literal array: an exact integer fold over the
    * token stream — row-local, zero shuffle, order-independent (addition),
    * so it replays exactly in SQL and composes unchanged into a streaming
    * gate. */
  def dsirWeight(text: Column, scores: Array[Long]): Column = {
    val scoreArr = typedLit(scores)
    aggregate(tokens(text), lit(0L),
      (acc, tok) => acc + element_at(scoreArr, (dsirBucket(tok) + 1).cast("int")))
  }

  // ------------------------------------------------------------ exact BPE

  /** Priority-ordered BPE merge table — a DRIVER LITERAL, the same shape a
    * learned tokenizer ships at scale (merges.txt loads once, applies as
    * literals; cf. the persisted ANN models). Pairs are high-frequency
    * English bigrams; priority = list position, lower wins. */
  val bpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "in" -> "g", "a" -> "n",
    "an" -> "d", "e" -> "r", "o" -> "n", "r" -> "e", "o" -> "u",
    "s" -> "t", "e" -> "n", "o" -> "r", "a" -> "t", "e" -> "s")

  /** Chars of a word that enter the encoder; [[bpeRounds]] merge rounds
    * always reach the fixpoint (every productive round removes >= 1 of the
    * <= bpeMaxChars-1 boundaries; an unproductive round is the fixpoint). */
  val bpeMaxChars = 8
  val bpeRounds = 7

  /** One merge ROUND over the '|'-delimited token string `s`: the first
    * (lowest-priority-rank) pair present anywhere merges all its
    * left-to-right non-overlapping occurrences — replace()'s scan order in
    * BOTH engines, which is what makes the whole loop hash-replayable.
    * Identical rendering for Spark SQL and DuckDB. */
  def bpeRoundSql(s: String): String =
    bpeMerges.map { case (l, r) =>
      s"WHEN contains($s, '|$l|$r|') THEN replace($s, '|$l|$r|', '|$l$r|')"
    }.mkString("CASE ", " ", s" ELSE $s END")

  /** Delimited initial form '|c1|c2|...|cn|' over the first
    * [[bpeMaxChars]] chars. DuckDB needs the explicit global flag;
    * Spark's regexp_replace is global by default. */
  def bpeInitSql(w: String, duck: Boolean): String =
    if (duck) s"'|' || regexp_replace(substr($w, 1, $bpeMaxChars), '(.)', '\\1|', 'g')"
    else s"'|' || regexp_replace(substr($w, 1, $bpeMaxChars), '(.)', '$$1|')"

  /** Token count of an encoded string: boundaries minus one. */
  def bpeTokensOfSql(s: String): String =
    s"(length($s) - length(replace($s, '|', ''))) - 1"

  /** The full oracle-side chain from a `w(idCol, w)` relation of exploded
    * words to `bpe(idCol, n_words, n_bpe_tokens)` — stacked single-column
    * CTE rounds, linear SQL size. */
  def bpeCtes(idCol: String): String = {
    val rounds = (1 to bpeRounds).map { i =>
      s"bpe$i AS (SELECT $idCol, ${bpeRoundSql("s")} AS s FROM bpe${i - 1})"
    }.mkString(",\n      ")
    s"""bpe0 AS (SELECT $idCol, ${bpeInitSql("w", duck = true)} AS s FROM w),
      $rounds,
      bpe AS (SELECT $idCol, count(*) AS n_words,
                     CAST(sum(${bpeTokensOfSql("s")}) AS BIGINT) AS n_bpe_tokens
              FROM bpe$bpeRounds GROUP BY $idCol)"""
  }

  /** EXACT merge-table BPE token stats per document — true byte-pair
    * encoding (apply loop over a fixed priority merge table), not the
    * regex approximation of [[bpeishTokenCount]]. Scale shape: explode to
    * (doc, word) rows — one shuffle-free projection chain ([[bpeRounds]]
    * stacked CASE/replace columns, linear plan size) — and ONE groupBy
    * back to docs. Token budgets from this are training-exact, which is
    * what sequence packing needs (t20). Output: (idCol, n_words,
    * n_bpe_tokens); docs with zero words carry (0, 0). */
  def bpeTokenStats(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    // The encoder's token count is a pure function of the word's first
    // [[bpeMaxChars]] chars, and natural-language corpora repeat words
    // heavily — so run the merge loop over the DISTINCT prefix vocabulary
    // and join the per-word count back, instead of paying bpeRounds ×
    // |merge table| contains/replace scans on EVERY word INSTANCE
    // (optimization guide §2.3 "shuffle keys and metadata instead of
    // payloads", applied to compute: 600 k instances → ~10³-ish distinct
    // prefixes at sf0.1; at 100 TB the instance/vocab ratio only grows).
    // The join key is bounded (≤ bpeMaxChars chars) and the encoded vocab
    // is a two-column frame — AQE broadcasts it when small and falls back
    // to a shuffle join on adversarial vocabularies; either way the result
    // per word is the identical encoder output.
    val words = docs.select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .select(col(idCol), substring(col("w"), 1, bpeMaxChars).as("__w8"))
    var enc = words.select(col("__w8")).distinct()
      .withColumn("s", expr(bpeInitSql("__w8", duck = false)))
    (1 to bpeRounds).foreach { _ => enc = enc.withColumn("s", expr(bpeRoundSql("s"))) }
    val perWord = enc.select(col("__w8"),
      expr(bpeTokensOfSql("s")).cast("long").as("__wtok"))
    val agg = words.join(perWord, Seq("__w8"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__wtok")).cast("long").as("n_bpe_tokens"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }
}
