package graft

import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan audits: the inventory queries must not just return the right
  * rows — they must carry the plan shape that survives a 100× scale-up
  * (filters/projections at the scan, broadcasts on dims, top-k via
  * TakeOrderedAndProject, no accidental cartesians, no single-task windows).
  * These pins catch plan regressions that row-level oracles cannot see. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.explainString(FormattedMode)

  test("q02: filter and projection both reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("GreaterThanOrEqual(l_discount,0.05)"))
    val readSchemas = p.linesIterator.filter(_.trim.startsWith("ReadSchema")).toSeq
    assert(readSchemas.nonEmpty)
    // pruned: untouched wide columns never leave the scan
    assert(readSchemas.forall(rs => !rs.contains("l_returnflag") && !rs.contains("l_tax")))
  }

  test("q03/q21: ORDER BY + LIMIT plans as TakeOrderedAndProject, not a global sort") {
    assert(plan("q03_top_revenue").contains("TakeOrderedAndProject"))
    assert(plan("q21_topk_orders").contains("TakeOrderedAndProject"))
  }

  test("q05: dimension joins broadcast; no nested-loop or cartesian fallback") {
    val p = plan("q05_region_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q01: aggregation is partial (map-side combine) before the shuffle") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial_sum") || p.contains("Functions: [partial"))
  }

  test("d03: candidate pairs need no join at all") {
    val p = plan("d03_lsh_candidate_pairs")
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("ShuffledHashJoin"))
    assert(!p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("s01: top-k windows are two-phase, never one task per query") {
    val p = plan("s01_ann_bruteforce_topk")
    // phase-1 window partitions by (q_id, input partition id), and Spark's
    // WindowGroupLimit pushdown caps rows before each window sort
    assert(p.contains("__part"))
    assert(p.contains("WindowGroupLimit"))
  }

  test("s02: centroid means are partial decimal-vector aggregates — no member lists") {
    val p = plan("s02_ann_ivf_topk")
    // centroids fold through the vec_decimal_mean typed aggregate with
    // map-side partials (shuffle carries one dim-sized buffer per group per
    // partition, not members and not a row per dimension) — the r2 shape
    // collected (vec_id, v) structs per cell
    assert(p.contains("partial_vec_decimal_mean"), "expected partial vec_decimal_mean")
    assert(!p.contains("collect_list"))
    assert(!p.contains("posexplode"))
  }

  test("s04: k-means assignment broadcasts centroids; corpus never cartesians with itself") {
    val p = plan("s04_ann_ivf_learned")
    // the crossJoin(broadcast(cents)) pairs each vector with the kCells-row
    // centroid table only — a broadcast nested loop over a tiny build side
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("d02/d04: native signatures are shuffle-free and computed exactly once") {
    // the minhash/simhash rewrites removed the explode+groupBy exchange:
    // the signature never leaves its doc's row
    val p2 = plan("d02_minhash_signature")
    assert(!p2.contains("Exchange"), "minhash signature must not shuffle")
    // ...and the Generate barrier keeps CollapseProject from inlining the
    // signature into the 16 extractions (measured 6× slowdown without it)
    val occ = p2.linesIterator.filter(_.contains("minhash_sig")).toSeq
    assert(occ.size === 1, s"minhash_sig must appear exactly once, lines:\n${occ.mkString("\n")}")
    val p4 = plan("d04_simhash")
    assert(!p4.contains("Exchange"), "simhash must not shuffle")
    val occ4 = p4.linesIterator.filter(_.contains("simhash16")).toSeq
    assert(occ4.size === 1, s"simhash16 must appear exactly once, lines:\n${occ4.mkString("\n")}")
  }

  test("t05: winnow pass evaluated once behind its Generate barrier") {
    val p = plan("t05_winnowing")
    assert(!p.contains("Exchange"))
    assert("winnow_minima".r.findAllMatchIn(p).size === 1,
      "winnow_minima must appear exactly once in the plan")
  }

  test("m01: payload pipeline prunes unused document columns at the scan") {
    val p = plan("m01_multimodal_meta")
    val readSchemas = p.linesIterator.filter(_.trim.startsWith("ReadSchema")).toSeq
    assert(readSchemas.forall(rs => !rs.contains("lang") && !rs.contains("source")))
  }

  test("l01/l02: native delta/iceberg attaches stay Catalyst-transparent") {
    // the table-format layers resolve FILES, not rows — the data read is a
    // plain parquet scan, so pushdown and pruning must survive through an
    // attached lakehouse table exactly as through raw parquet
    import org.apache.spark.sql.functions.col
    Seq(("l01_delta_scan", "c_acctbal", 5000.0), ("l02_iceberg_scan", "o_totalprice", 150000.0))
      .foreach { case (q, c, v) =>
        val df = SparkEntry.queries(q)(spark, sf).filter(col(c) > v).select(c)
        val p = df.queryExecution.explainString(FormattedMode)
        assert(p.contains("PushedFilters:") && p.contains(s"GreaterThan($c,$v)"),
          s"$q lost filter pushdown through the native table-format reader")
        val readSchemas = p.linesIterator.filter(_.trim.startsWith("ReadSchema")).toSeq
        assert(readSchemas.nonEmpty && readSchemas.forall(rs => !rs.contains("name")),
          s"$q lost column pruning through the native table-format reader")
      }
  }

  test("l10: cross-lakehouse join broadcasts off the log-served sizes") {
    // Delta ⋈ Iceberg in one plan: the log-backed FileIndexes report true
    // surviving-file sizes, so the planner must pick a broadcast hash join
    // (at scale the Delta dim stays broadcast-able while the Iceberg fact
    // grows) — a sort-merge here would shuffle the fact for a dim lookup
    val p = plan("l10_lakehouse_join")
    assert(p.contains("BroadcastHashJoin"),
      s"cross-lakehouse join did not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"cross-lakehouse join fell back to nested-loop:\n$p")
  }

  test("l03: v2 delete anti-joins hash, never nested-loop; delete sides broadcast") {
    // positional deletes carry equi keys (file, pos) and equality deletes a
    // null-safe equi key — both must plan as (broadcast) HASH anti-joins; a
    // BroadcastNestedLoopJoin here would be all-pairs over a 100 TB fact
    val p = plan("l03_iceberg_v2_deletes")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"v2 delete anti-join fell back to nested-loop:\n$p")
    val antiJoins = p.linesIterator.count(l =>
      l.contains("HashJoin") && l.contains("LeftAnti"))
    assert(antiJoins >= 2, s"expected hash anti-joins for pos+eq deletes:\n$p")
  }

  test("l04/l05: deletion-vector anti-joins hash on (file, position), never nested-loop") {
    // Delta DVs and Iceberg puffin DVs share the join shape: decoded dead
    // positions anti-join the scan on two equi keys. A nested-loop or
    // cartesian here multiplies a 100 TB fact by its delete set.
    Seq("l04_delta_deletion_vectors", "l05_iceberg_puffin_dv").foreach { q =>
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q deletion-vector anti-join fell back to nested-loop:\n$p")
      assert(p.linesIterator.exists(l => l.contains("HashJoin") && l.contains("LeftAnti")),
        s"$q expected a hash anti-join for the deletion vector:\n$p")
    }
  }

  test("s05: auto-sized LSH keeps the join-free candidate shape of s03") {
    val p = plan("s05_cosine_lsh_autosized")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"auto-sized LSH fell back to all-pairs:\n$p")
    // signatures stay row-local: no shuffle below the bucket groupBy other
    // than the aggregate's own exchange (same bound s03 pins)
    assert(p.contains("vec_signdot"), s"native sign-dot missing from plan:\n$p")
  }

  test("t07/t08/t09: scrub, split and stratified sample are pure projections — zero Exchange") {
    Seq("t07_pii_scrub", "t08_split_assign", "t09_stratified_sample").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q shuffles — a 100 TB scan would too")
    }
  }

  test("t18: the DSIR scoring pass is a row-local projection — zero Exchange") {
    // the distribution estimate collects 64 bucket counts during plan
    // construction (one partial-agg pass); the RETURNED scoring plan folds
    // each document against a 64-entry literal array — at 100 TB the
    // weights cost one scan, no joins, no shuffles
    val p = plan("t18_dsir_weights")
    assert(!p.contains("Exchange"), "t18 scoring shuffles — a 100 TB scan would too")
    assert(!p.contains("Join"))
  }

  test("d10: eval grams broadcast; the corpus side never shuffles its grams wide") {
    val p = plan("d10_decontaminate")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("s07: PQ encoding is shuffle-free; ADC scoring broadcasts the query set") {
    import org.apache.spark.sql.functions.col
    val e = Tables.load(spark, sf, "embeddings")
    val candidates = e.filter(col("vec_id") >= 5)
    val model = graft.operators.Similarity.pqModel(candidates, 8, 8, 2, 64)
    val enc = graft.operators.Similarity.pqEncode(candidates, model, 64)
    val pEnc = enc.queryExecution.explainString(FormattedMode)
    assert(!pEnc.contains("Exchange"), "pqEncode must be a pure projection")
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val pTop = graft.operators.Similarity.pqTopK(queries, candidates, 10)
      .queryExecution.explainString(FormattedMode)
    assert(pTop.contains("BroadcastExchange"))
    assert(!pTop.contains("CartesianProduct"))
  }

  test("l11: change feed joins its tiny timestamp frame by broadcast; no cartesian") {
    val p = plan("l11_delta_change_feed")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"version→timestamp stamping should broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"feed stamping must never shuffle the corpus:\n$p")
  }

  test("s08: SemDeDup pairs only within a cell — no all-pairs fallback") {
    val p = plan("s08_semdedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"SemDeDup fell back to all-pairs:\n$p")
    // assignment is a literal-centroid projection, not a join against a model table
    assert(p.contains("vec_cosine"), s"native cosine missing:\n$p")
  }

  test("t12: temperature mix broadcasts its domain-rate table; corpus side is one scan") {
    val p = plan("t12_temperature_mix")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the |domains|-row rate table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus must not shuffle for a rate lookup:\n$p")
  }

  test("w02: the delta table written by the native sink reads back with pushdown intact") {
    val p = plan("w02_delta_sink")
    // the sink's partitioned layout serves typed partition columns through
    // the log — the aggregate groups on the partition column with no
    // cartesian and partial aggregation before the exchange
    assert(p.contains("HashAggregate"))
    assert(!p.contains("CartesianProduct"))
  }

  test("d12: passage pairs keep the join-free capped-bucket shape") {
    val p = plan("d12_passage_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"passage pairing fell back to all-pairs:\n$p")
    assert(p.contains("winnow_minima"), s"native winnow pass missing:\n$p")
  }

  test("d14: substring scrub decision join hashes on the gram key — no all-pairs") {
    val p = plan("d14_substring_scrub")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"substring scrub fell back to all-pairs:\n$p")
    // the frequency pass shuffles the 16-byte gram hash (with the doc id for
    // the distinct-doc count) — document text never rides a partitioning key
    assert(p.linesIterator.exists(l => l.contains("hashpartitioning") &&
      l.contains("__h")), s"expected a gram-hash exchange:\n$p")
    assert(!p.linesIterator.exists(l => l.contains("hashpartitioning") &&
      l.contains("text#")), s"document text must never key a shuffle:\n$p")
  }

  test("t13: domain cap is one shuffle on the domain key, no join") {
    val p = plan("t13_domain_cap")
    assert(!p.contains("Join"), s"a rank cap needs no join:\n$p")
    // exactly one Exchange: the window's partitioning
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"domain cap should shuffle once, saw $exchanges:\n$p")
  }

  test("t14: URL dedup is one shuffle on the canonical key, no join") {
    val p = plan("t14_url_dedup")
    assert(!p.contains("Join"), s"URL dedup needs no join:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"URL dedup should shuffle once, saw $exchanges:\n$p")
    // the regex chain stays codegen (a UDF here would break the span)
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))
  }

  test("t15: LM scoring has no cartesian; count tables join hash or broadcast") {
    val p = plan("t15_lm_quality")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"LM scoring must never all-pairs:\n$p")
    // counting passes are partial before their exchanges (map-side combine)
    assert(p.contains("HashAggregate"), s"expected hash aggregation:\n$p")
  }

  test("s10: rerank joins only the candidate set; queries broadcast") {
    val p = plan("s10_ann_pq_rerank")
    assert(!p.contains("CartesianProduct"),
      s"the exact stage must never cartesian the corpus:\n$p")
    // the query side broadcasts in the rerank join (bounded row count)
    assert(p.contains("BroadcastExchange"), s"expected a broadcast:\n$p")
  }

  test("whole-stage codegen spans the relational hot paths") {
    Seq("q01_pricing_summary", "q02_filter_project", "q30_math_kernels").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      // AQE only annotates codegen in the FINAL plan — and only THIS df's
      // QueryExecution (a write would plan its own); collect to finalize
      df.collect()
      assert(df.queryExecution.explainString(FormattedMode).contains("codegen id"),
        s"$q lost codegen")
    }
  }
  test("t16/t17: gopher rules and chunk windows are row-local — no keyed shuffle") {
    // the conditional fixture widen (Tables.widen — a no-op on any scan
    // that is already cores-wide, i.e. every cluster-scale table) may
    // insert ONE round-robin exchange locally; the OPERATORS must stay
    // row-local, so what the pin forbids is any KEYED repartitioning
    Seq("t16_gopher_rules", "t17_chunk_windows").foreach { q =>
      val p = plan(q)
      assert(!p.contains("hashpartitioning") && !p.contains("rangepartitioning"),
        s"$q shuffles by key — a 100 TB scan would too")
      // EVERY shuffle exchange must be the round-robin widen — one stray
      // SinglePartition exchange (a global sort/limit collapse) would
      // serialize the whole scan even with a round-robin present elsewhere
      val nEx = """\(\d+\) Exchange\b""".r.findAllMatchIn(p).length
      val nRr = """Arguments: RoundRobinPartitioning""".r.findAllMatchIn(p).length
      assert(nEx == nRr,
        s"$q carries a non-round-robin exchange ($nEx exchanges, $nRr round-robin):\n$p")
    }
  }

  test("d13: fuzzy decontamination broadcasts eval bands; corpus never self-joins") {
    val p = plan("d13_fuzzy_decontaminate")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "eval band keys must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "an all-pairs shape would be quadratic at 100 TB")
  }
  test("s11: SQ coarse pass broadcasts queries; rerank hash-joins the candidate set") {
    val p = plan("s11_ann_sq_rerank")
    assert(p.contains("BroadcastExchange"), "the tiny query set must broadcast")
    // the rerank's candidate join must hash, not nested-loop over the corpus
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      "rerank joins must be equi-joins")
  }
}
