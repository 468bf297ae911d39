package graft

import graft.operators.{Dedup, Packing, Sketches, TextOps}
import org.apache.spark.sql.functions._

/** Corpus-curation operators added in r7: line-level boilerplate scrub,
  * distributed-prefix-sum sequence packing, two-pass exact heavy hitters. */
class CorpusOpsSpec extends SparkSpec {

  test("lineScrub removes corpus-frequent lines, keeps rare ones, in order") {
    import spark.implicits._
    val df = Seq(
      (1L, "unique alpha\nBOILER\nunique beta"),
      (2L, "BOILER\nonly here"),
      (3L, "BOILER\nanother one\nBOILER")).toDF("doc_id", "text")
    val out = Dedup.lineScrub(df, "text", "doc_id", minFreq = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) === 3L) // n_lines
    assert(out(1L).getLong(2) === 1L) // n_removed
    assert(out(1L).getString(3) === "unique alpha\nunique beta")
    assert(out(2L).getString(3) === "only here")
    // doc 3: two BOILER copies (corpus freq 4) removed, order preserved
    assert(out(3L).getLong(2) === 2L)
    assert(out(3L).getString(3) === "another one")
  }

  test("lineScrub yields NULL clean_text when every line is boilerplate") {
    import spark.implicits._
    val df = Seq((1L, "x\nx"), (2L, "x"), (3L, "keep\nx")).toDF("doc_id", "text")
    val out = Dedup.lineScrub(df, "text", "doc_id", minFreq = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).isNullAt(3) && out(1L).getLong(2) === 2L)
    assert(out(2L).isNullAt(3))
    assert(out(3L).getString(3) === "keep")
  }

  test("packOffsets equals the sequential prefix sum, any partitioning") {
    import spark.implicits._
    val rows = (1L to 257L).map(i => (i, i % 7)) // counts 0..6, incl. zeros
    var acc = 0L
    val expected = rows.sortBy(_._1).map { case (id, n) =>
      val off = acc
      acc += n
      val end = off + math.max(n, 1) - 1
      (id, n, off, off / 64, off / 64 != end / 64)
    }
    for (parts <- Seq(1, 5)) {
      val df = rows.toDF("doc_id", "n_tokens").repartition(parts)
      val got = Packing.packOffsets(df, "doc_id", "n_tokens", 64)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
        .sortBy(_._1)
      assert(got.toSeq === expected, s"mismatch at input partitions=$parts")
    }
  }

  test("packOffsets stays internally consistent at scale-shaped id gaps") {
    // regression: the old repartitionByRange + spark_partition_id mapping
    // re-sampled range boundaries PER JOB, so the totals job and the final
    // join could land different partitionings and mis-map every partition
    // offset — surfaced at sf1 (50k docs, 100M-stride id copies). The
    // stress shape in miniature: big strided id blocks, many buckets.
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try {
      val rows = (0 until 10).flatMap { copy =>
        (0L until 500L).map(i => (copy * 100000000L + i, (i % 37) + 1))
      }
      val got = Packing.packOffsets(rows.toDF("doc_id", "n"), "doc_id", "n", 128)
        .select("doc_id", "n", "start_off").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      var acc = 0L
      got.foreach { case (id, n, off) =>
        assert(off === acc, s"doc $id: start_off $off != running sum $acc")
        acc += n
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("packOffsets marks exactly the docs straddling a sequence boundary") {
    import spark.implicits._
    // 100+100+100: doc 3 starts at 200 and ends at 299 — crosses 256
    val df = Seq((1L, 100L), (2L, 100L), (3L, 100L)).toDF("id", "n")
    val got = Packing.packOffsets(df, "id", "n", 256)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    assert(got(1L) === ((0L, false)))
    assert(got(2L) === ((0L, false))) // 100..199 inside seq 0
    assert(got(3L) === ((0L, true))) // starts in seq 0, ends in seq 1
  }

  test("frequentTokens is exact vs brute force at several supports") {
    import spark.implicits._
    val docs = (1 to 50).map { i =>
      val common = Seq.fill(5)("alpha") ++ Seq.fill(3)("beta")
      val rare = if (i % 10 == 0) Seq("gamma") else Seq(s"tail$i")
      (i.toLong, (common ++ rare).mkString(" "))
    }.toDF("doc_id", "text")
    for (ppm <- Seq(10000L, 50000L, 400000L)) {
      val got = Sketches.frequentTokens(docs, "text", ppm, k = 128)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val counts = docs
        .select(explode(graft.operators.TextOps.tokens(col("text"))).as("t"))
        .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val total = counts.values.sum
      val thr = (total * ppm + 999999L) / 1000000L
      val want = counts.filter(_._2 >= thr)
      assert(got === want, s"support=$ppm ppm")
    }
  }

  test("frequentTokens rejects k below the MG no-miss bound") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Sketches.frequentTokens(df, "text", supportPpm = 1000L, k = 64)
    }
    assert(e.getMessage.contains("no-miss"))
  }

  test("lmQualityScore ranks corpus-typical text above token salad") {
    import spark.implicits._
    import graft.operators.TextOps
    // a tiny corpus dominated by one phrasing; doc 99 is out-of-model salad
    val docs = ((1L to 20L).map(i => (i, "the quick brown fox jumps over the lazy dog")) :+
      ((99L, "zxq vvk blorp wug snark fizzle"))).toDF("doc_id", "text")
    val out = TextOps.lmQualityScore(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // the toy vocab keeps the Laplace floor high (V≈14 → salad floors at
    // 2/15 per bigram); real corpora separate by orders of magnitude
    assert(out(1L) > out(99L) * 3,
      "in-model text must score well above out-of-model salad")
    // every doc has 8 bigrams of the phrase; all identical scores
    assert(out(1L) === out(20L))
    // docs with <2 tokens drop
    val tiny = Seq((1L, "single"), (2L, "two tokens")).toDF("doc_id", "text")
    assert(TextOps.lmQualityScore(tiny, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSeq === Seq(2L))
  }

  test("urlCanonicalize handles case/port/www/query/fragment/trailing-slash") {
    import spark.implicits._
    import graft.operators.UrlOps
    val cases = Seq(
      // the same page in five disguises → one canonical form
      "HTTPS://WWW.Example.COM:443/A/b/" -> "https://example.com/A/b",
      "https://example.com/A/b?utm_source=x&id=2" -> "https://example.com/A/b",
      "https://www.example.com/A/b#frag" -> "https://example.com/A/b",
      "https://example.com/A/b" -> "https://example.com/A/b",
      "https://EXAMPLE.com/A/b/////" -> "https://example.com/A/b",
      // :80 strips for http only; a real port stays
      "http://h.org:80/x" -> "http://h.org/x",
      "https://h.org:80/x" -> "https://h.org:80/x",
      "http://h.org:8080/x" -> "http://h.org:8080/x",
      // path case is preserved (RFC 3986: only scheme/host are case-free)
      "http://H.org/CaseSensitive" -> "http://h.org/CaseSensitive",
      // root URL collapses to bare authority
      "https://www.h.org/" -> "https://h.org",
      // no scheme: query/fragment still strip, nothing else assumed
      "h.org/x?q=1" -> "h.org/x")
    val got = cases.map(_._1).toDF("u")
      .select(UrlOps.urlCanonicalize(col("u"))).as[String].collect().toSeq
    assert(got === cases.map(_._2))
  }

  test("registrableDomain: two-part suffixes, userinfo, label-less hosts") {
    import spark.implicits._
    import graft.operators.UrlOps
    val cases = Seq(
      "https://news.bbc.co.uk/x" -> "bbc.co.uk",
      "https://a.b.example.com.au/x" -> "example.com.au",
      "https://deep.sub.example.com/x" -> "example.com",
      "https://user:pw@example.org/x" -> "example.org",
      "http://localhost/x" -> "localhost",
      "https://ex.co/x" -> "ex.co") // .co alone is NOT a two-part suffix
    val got = cases.map(_._1).toDF("u")
      .select(UrlOps.registrableDomain(col("u"))).as[String].collect().toSeq
    assert(got === cases.map(_._2))
  }

  test("urlDedupMark keeps the min-id row per canonical URL") {
    import spark.implicits._
    import graft.operators.UrlOps
    val df = Seq(
      (1L, "https://www.site.com/p/1"),
      (2L, "HTTPS://SITE.com:443/p/1?utm_source=x"),
      (3L, "https://site.com/p/2"),
      (4L, "https://site.com/p/1#f")).toDF("id", "url")
    val out = UrlOps.urlDedupMark(df, "url", "id")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(3))).toSeq
    assert(out === Seq(
      (1L, "https://site.com/p/1", true),
      (2L, "https://site.com/p/1", false),
      (3L, "https://site.com/p/2", true),
      (4L, "https://site.com/p/1", false)))
  }

  test("gopherColumns: a clean document passes all 7 rules") {
    import spark.implicits._
    val clean = (1 to 60).map(i => s"word$i").mkString(" ") +
      " the and of that have with"
    val df = Seq((1L, clean)).toDF("doc_id", "text")
    val cols = graft.operators.TextOps.gopherColumns(col("text"))
    val r = df.select(col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
      .collect().head
    assert(r.getAs[Long]("n_words") == 66L)
    assert(r.getAs[Boolean]("keep"))
  }

  test("gopherColumns: each rule fails independently") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"word$i").mkString(" ") + " the and"
    def keepOf(text: String): Boolean = {
      val cols = graft.operators.TextOps.gopherColumns(col("text"))
      Seq((1L, text)).toDF("doc_id", "text")
        .select(cols.map { case (n, c) => c.as(n) }: _*)
        .collect().head.getAs[Boolean]("keep")
    }
    assert(keepOf(base))
    assert(!keepOf("too few words the and")) // rule 1: < 50 words
    assert(!keepOf(base + " " + Seq.fill(12)("#").mkString(" "))) // rule 3: symbols
    assert(!keepOf((1 to 60).map(i => s"- w$i").mkString("\n") + "\nthe and")) // rule 4: bullets
    assert(!keepOf((1 to 60).map(i => s"w$i ...").mkString("\n") + "\nthe and")) // rule 5: ellipsis
    assert(!keepOf((1 to 60).map(_.toString).mkString(" ") + " the and")) // rule 6: no alpha
    assert(!keepOf((1 to 60).map(i => s"word$i").mkString(" "))) // rule 7: no stop words
  }

  test("chunkWindows covers every token; overlap region repeats exactly") {
    import spark.implicits._
    // 80 tokens, chunkLen 32 stride 24 -> chunks at 1, 25, 49 (=3 chunks)
    val text = (1 to 80).map(i => s"t$i").mkString(" ")
    val df = Seq((7L, text)).toDF("doc_id", "text")
    val out = graft.operators.TextOps.chunkWindows(df, "text", "doc_id", 32, 8)
      .orderBy("chunk_id").collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Long]("start_tok")).toSeq == Seq(1L, 25L, 49L))
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq == Seq(32L, 32L, 32L))
    // chunk 2 begins with the last 8 tokens of chunk 1
    val c1 = out(0).getAs[String]("chunk_text").split(" ")
    val c2 = out(1).getAs[String]("chunk_text").split(" ")
    assert(c1.takeRight(8).toSeq == c2.take(8).toSeq)
    // last token of the doc is in the final chunk
    assert(out(2).getAs[String]("chunk_text").endsWith("t80"))
    // short doc -> one short chunk
    val one = graft.operators.TextOps.chunkWindows(
      Seq((1L, "a b c")).toDF("doc_id", "text"), "text", "doc_id", 32, 8).collect()
    assert(one.length == 1 && one.head.getAs[Long]("n_tokens") == 3L)
    // invalid overlap rejects loudly
    intercept[IllegalArgumentException] {
      graft.operators.TextOps.chunkWindows(df, "text", "doc_id", 16, 16)
    }
  }

  test("substringScrub removes cross-doc duplicated runs, keeps unique text in order") {
    import spark.implicits._
    // docs 1 and 2 share the 10-token passage p (3 overlapping 8-grams cover
    // all 10 positions); surrounding unique text must survive in order
    val p = "one two three four five six seven eight nine ten"
    val df = Seq(
      (1L, s"alpha beta $p gamma delta"),
      (2L, s"$p epsilon zeta"),
      (3L, "totally unrelated words live here peacefully forever and ever more")
    ).toDF("doc_id", "text")
    val out = Dedup.substringScrub(df, "text", "doc_id", k = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) === 14L) // n_tokens
    assert(out(1L).getLong(2) === 10L) // n_removed: the whole shared run
    assert(out(1L).getString(3) === "alpha beta gamma delta")
    assert(out(2L).getLong(2) === 10L)
    assert(out(2L).getString(3) === "epsilon zeta")
    assert(out(3L).getLong(2) === 0L) // untouched doc passes through whole
    assert(out(3L).getString(3).startsWith("totally unrelated"))
  }

  test("substringScrub yields NULL clean_text when the whole doc is duplicated") {
    import spark.implicits._
    val p = "a1 a2 a3 a4 a5 a6 a7 a8"
    val df = Seq((1L, p), (2L, p), (3L, s"unique prefix here $p")).toDF("doc_id", "text")
    val out = Dedup.substringScrub(df, "text", "doc_id", k = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).isNullAt(3) && out(1L).getLong(2) === 8L)
    assert(out(2L).isNullAt(3))
    assert(out(3L).getString(3) === "unique prefix here")
    // repeats WITHIN one doc only do not scrub (distinct-doc frequency)
    val within = Seq((1L, s"$p and then $p"), (2L, "nothing shared at all whatsoever")).toDF("doc_id", "text")
    val w = Dedup.substringScrub(within, "text", "doc_id", k = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(w(1L).getLong(2) === 0L)
    // short docs (< k tokens) pass through untouched
    val short = Dedup.substringScrub(
      Seq((1L, "tiny doc"), (2L, "tiny doc")).toDF("doc_id", "text"), "text", "doc_id", k = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(short(1L).getLong(2) === 0L && short(1L).getString(3) === "tiny doc")
    intercept[IllegalArgumentException] {
      Dedup.substringScrub(df, "text", "doc_id", k = 1)
    }
  }

  test("bpeTokenStats: the merge loop applies by priority to a fixpoint") {
    import spark.implicits._
    // hand-traced against the literal merge table:
    //   "the"     |t|h|e| -> |th|e| -> |the|                    = 1 token
    //   "then"    -> |the|n|                                    = 2
    //   "ingrate" (i,n) -> (in,g) -> (a,t): |ing|r|at|e|        = 4
    //   "zz"      no rule applies                               = 2
    //   "a"       single char                                   = 1
    //   8-char cap: "abcdefghij" encodes as "abcdefgh"          = 8
    val docs = Seq(
      (1L, "the then"), (2L, "ingrate zz a"), (3L, "abcdefghij"),
      (4L, ""), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextOps.bpeTokenStats(docs, "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got === Seq((1L, 2L, 3L), (2L, 3L, 7L), (3L, 1L, 8L),
      (4L, 0L, 0L), (5L, 0L, 0L)))
  }
}
