package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RelOps

/** Physical-plan hygiene: the properties that decide whether these operators
  * survive a 100 TB scale-up. Asserting them here keeps a refactor from
  * silently regressing pushdown/pruning/broadcast/codegen.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def formatted(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("filter_eq pushes the predicate into the parquet scan") {
    val plan = formatted("filter_eq")
    assert(plan.contains("PushedFilters:") &&
      plan.contains("EqualTo(c_mktsegment,BUILDING)"), plan)
  }

  test("filter_range pushes both range bounds down") {
    val plan = formatted("filter_range")
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") &&
      plan.contains("LessThan(l_shipdate"), plan)
  }

  test("project prunes the scan to exactly the referenced columns") {
    val plan = formatted("project")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_discount"))
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_partkey"),
      s"scan reads more than projected: $readSchema")
  }

  test("join_broadcast plans a BroadcastHashJoin (no fact-side shuffle)") {
    val plan = formatted("join_broadcast")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("agg_group_sum is a two-phase hash aggregate (map-side partial)") {
    val plan = formatted("agg_group_sum")
    assert(plan.contains("HashAggregate"))
    assert(plan.contains("partial_sum") || plan.contains("Partial"), plan)
  }

  test("sort_limit plans TakeOrderedAndProject, not a global sort") {
    val plan = formatted("sort_limit")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("hot-path queries stay inside WholeStageCodegen") {
    // AQE's formatted mode hides codegen markers pre-execution; CodegenMode
    // reports the generated subtrees directly.
    // under AQE the pre-execution plan is an unpresolved AdaptiveSparkPlan
    // with ZERO compiled subtrees — codegenString's header ("Found N
    // WholeStageCodegen subtrees.") still contains the marker at N=0, which
    // made the old contains() assertion vacuous. Disable AQE for the check
    // and assert the parsed count.
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (q <- Seq("project", "agg_group_sum", "agg_multi", "join_inner",
          "text_scrub_pii", "agg_stats", "unpivot_table")) {
        val df = SparkEntry.queries(q)(spark, sf)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.CodegenMode)
        val n = """Found (\d+) WholeStageCodegen""".r
          .findFirstMatchIn(plan).map(_.group(1).toInt)
        assert(n.exists(_ > 0), s"$q fell out of codegen (subtrees=$n):\n${plan.take(2000)}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("join_range: linear merge spelling — one user-keyed window, no pair blowup") {
    val plan = formatted("join_range")
    // the range join runs as union + per-user running count: ONE window
    // over ONE exchange; no join operator (whose output would be
    // events×orders per user before the aggregate) and no nested loop
    assert(plan.contains("Window"), s"expected the merge window:\n$plan")
    assert(!Seq("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct").exists(plan.contains),
      s"range semantics must not materialize a pair join:\n$plan")
    // one exchange feeds the window; the only other is the final ORDER BY
    val nExchange = "(?<!Broadcast)(?<!Reused)Exchange \\(".r.findAllIn(plan).length
    assert(nExchange == 2, s"expected 2 shuffle exchanges, found $nExchange:\n$plan")
  }

  test("semi/anti joins plan as real semi/anti, not inner+distinct") {
    assert(formatted("join_semi").contains("LeftSemi"))
    assert(formatted("join_anti").contains("LeftAnti"))
  }

  test("bucketed join is exchange-free (co-located sort-merge)") {
    val df = SparkEntry.queries("join_bucketed")(spark, sf)
    // tree prints parent-first: everything after the SortMergeJoin line is
    // the join subtree (the agg/orderBy exchanges above it print earlier)
    val plan = df.queryExecution.executedPlan.toString
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, plan)
    val subtree = plan.substring(joinIdx)
    assert(subtree.contains("Bucketed: true"), subtree)
    assert(!subtree.contains("Exchange"), s"bucketed join still shuffles:\n$subtree")
  }

  test("native cosine expression matches the composed HOF formulation bitwise") {
    val a = SparkEntry.queries("sim_search_topk")(spark, sf).collect()
    val b = SparkEntry.queries("sim_search_topk_native")(spark, sf).collect()
    assert(a.sameElements(b))
  }

  test("scan_partition_prune reads only the filtered partition") {
    val df = SparkEntry.queries("scan_partition_prune")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"no partition filter reached the scan:\n$plan")
  }

  test("native cosine participates in whole-stage codegen") {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("sim_search_topk_native")(spark, sf)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.CodegenMode)
      val n = """Found (\d+) WholeStageCodegen""".r
        .findFirstMatchIn(plan).map(_.group(1).toInt)
      assert(n.exists(_ > 0), s"no codegen subtrees (found=$n)")
      assert(!plan.contains("CodegenFallback"),
        "cosine fell back to interpreted eval")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("tpch_q5: all dimension legs broadcast; only the fact join sort-merges or shuffles") {
    val plan = formatted("tpch_q5")
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 3,
      s"region/nation/customer/supplier legs must broadcast (found $nBroadcast):\n$plan")
    // the one allowed non-broadcast join is orders ⋈ lineitem
    val nSmj = "SortMergeJoin".r.findAllIn(plan).length
    assert(nSmj <= 1, s"more than the fact join shuffles ($nSmj SMJs):\n$plan")
  }

  test("tpch_q3: segment filter pushes down; customer leg broadcasts") {
    val plan = formatted("tpch_q3")
    assert(plan.contains("EqualTo(c_mktsegment,BUILDING)"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"),
      "top-10 must plan as TakeOrderedAndProject, not a global sort")
  }

  test("tpch_q18: HAVING cut drives broadcasts — neither orders nor customer shuffles") {
    val plan = formatted("tpch_q18")
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 2,
      s"both probe joins must broadcast the qualifying-order side (found $nBroadcast):\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"a fact table shuffled for a join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-100 must plan as TakeOrderedAndProject, not a global sort")
  }

  test("graph_triangles: one count over the closed-wedge artifact, no edge-scale join") {
    val plan = formatted("graph_triangles")
    // the O(m^1.5) closure moved into the pay-once artifact; the query is
    // scans + one-row aggregates stitched by broadcast (the census shape)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"census must not run an edge-scale shuffle join:\n$plan")
    assert(!plan.contains("LeftSemi"),
      s"the closure probe belongs to the artifact build, not the query:\n$plan")
  }

  test("closed-wedge artifact build: broadcast semi closure, wedges never shuffle") {
    val plan = operators.GraphOps.closedWedgesPre(TestSpark.spark, TestSpark.sf001)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    // the packed-wedge stream is tested against the edge set as a broadcast
    // LEFT SEMI fused into the expansion stage — never as a shuffled
    // self-join of the wedge stream (the pre-round-7 spelling)
    assert(plan.contains("LeftSemi") && plan.contains("BroadcastHashJoin"),
      s"closure must be a broadcast semi probe:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"an edge-scale join degenerated to a cartesian product:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the wedge stream must never sort:\n$plan")
  }

  test("graph_pair_counts build: pairs shuffle exactly once, no map-side partial") {
    // the counting pass consumes the build input through a toRdd boundary,
    // so pin the INNER plan (the one that carries all the data volume)
    val plan = operators.GraphOps.pairCountsPre(TestSpark.spark, TestSpark.sf001)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // one exchange for the adjacency lists, ONE for the raw packed keys —
    // no map-side partial exchange (74 M near-unique keys would hash for
    // nothing), no aggregate at all in the Spark plan (the unboxed
    // post-shuffle pass does the counting)
    val nExchange = "(?<!Broadcast)(?<!Reused)Exchange \\(".r.findAllIn(plan).length
    assert(nExchange == 2, s"expected 2 shuffle exchanges, found $nExchange:\n$plan")
    assert(!plan.contains("HashAggregate (") || plan.contains("collect_set"),
      s"no pair-level aggregate belongs in the build plan:\n$plan")
  }

  test("graph_common_neighbors: pre-classified artifact scan + top-k, no join") {
    val plan = formatted("graph_common_neighbors")
    // edge membership is pre-classified at artifact build; the query is a
    // scan of the non-edge side + TakeOrderedAndProject, never a global
    // sort and never a query-time membership join
    assert(!plan.contains("Join"),
      s"membership classification belongs to the artifact build:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // r16 layout: the classified pair scan decodes int32 (a, b, c) — the
    // narrow layout is the query's I/O bill (468 → 242 MB at sf0.1);
    // consumers re-widen to long at the scan edge, results unchanged
    assert(plan.contains("ReadSchema: struct<a:int,b:int,c:int>"),
      s"pair scan must stay int32-narrow:\n$plan")
  }

  test("graph_jaccard: pre-classified edge-side scan; degree joins broadcast") {
    val plan = formatted("graph_jaccard")
    assert(!plan.contains("LeftSemi"),
      s"the edge filter belongs to the artifact build:\n$plan")
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 2, // ds(a) + ds(b)
      s"both degree joins must broadcast (found $nBroadcast):\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("join_interval_overlap: sweep plans with NO join operator and one key exchange") {
    val plan = formatted("join_interval_overlap")
    // the quadratic interval join is exactly what this spelling removes
    assert(!plan.contains("Join"), s"sweep must not plan any join:\n$plan")
    val nExchange = "(?<!Broadcast)(?<!Reused)Exchange \\(".r.findAllIn(plan).length
    // one hash exchange on the customer key feeds BOTH the window and the
    // per-customer aggregate (same key → reused partitioning) + the final
    // presentation sort's range exchange
    assert(nExchange <= 2, s"expected ≤2 shuffle exchanges, found $nExchange:\n$plan")
    assert(plan.contains("Window"), plan)
  }

  test("sample_weighted: map-side priority + TakeOrdered, zero shuffle") {
    val plan = formatted("sample_weighted")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!"(?<!Broadcast)(?<!Reused)Exchange \\(".r.findAllIn(plan).hasNext,
      s"weighted sampling must not shuffle:\n$plan")
  }

  test("table_checksum: no join anywhere; one aggregate pass per table") {
    val plan = formatted("table_checksum")
    assert(!plan.contains("Join"), s"fingerprints must not join:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"), plan)
  }

  test("events_ab_test: one user-keyed exchange, no join") {
    val plan = formatted("events_ab_test")
    assert(!plan.contains("Join"), s"readout must not join:\n$plan")
    val nExchange = "(?<!Broadcast)(?<!Reused)Exchange \\(".r.findAllIn(plan).length
    // user-keyed agg exchange + the single-row final agg exchange
    assert(nExchange <= 2, s"expected ≤2 shuffle exchanges, found $nExchange:\n$plan")
  }

  test("graph_kcore round: both vertex restrictions broadcast, edges never shuffle") {
    // the per-round localCheckpoint (which is what keeps R rounds from
    // re-deriving the whole edge chain R times) hides earlier rounds from
    // the outer explain, so the round's shape is pinned on the extracted
    // helper — the bfsRound/pagerankSweep convention
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val keep = Seq(2L, 3L).toDF("v")
    val plan = operators.GraphOps.kcoreRound(e, keep)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val semi = "LeftSemi".r.findAllIn(plan).length
    assert(semi >= 2, s"expected 2 semi-joins per round, found $semi:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"a vertex-set restriction shuffled the edge list:\n$plan")
  }

  test("merge_upsert: snapshot side never sorts (broadcast anti-join, not SMJ)") {
    val plan = formatted("merge_upsert")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("resample_gapfill: spine and counts aggregate with map-side partials") {
    val plan = formatted("resample_gapfill")
    assert(plan.contains("HashAggregate"))
    assert(plan.contains("partial_min") || plan.contains("Partial"), plan)
  }

  test("sessionize_native: session_window plans as a merging-session aggregate, no window sort") {
    val plan = formatted("sessionize_native")
    assert(plan.contains("session_window"), plan)
    assert(!plan.contains("RunningWindowFunction"),
      "native sessions must not fall back to a row-window")
  }

  test("corpus_stats: one two-phase aggregate, text column pruned into the agg") {
    val plan = formatted("corpus_stats")
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate"))
    // only the referenced columns reach the scan
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("doc_id"), s"scan reads unreferenced columns: $readSchema")
  }

  test("dedup_fuzzy: verification joins candidates, never cross-joins the corpus") {
    val df = SparkEntry.queries("dedup_fuzzy")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("text_novelty: every exchange is keyed on hashed longs or doc_id, never the trigram string") {
    // the n-gram string must stay map-side — shuffles carry its PolyHash
    val df = SparkEntry.queries("text_novelty")(spark, sf)
    val exchanges = df.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      assert(e.contains("th#") || e.contains("doc_id#"),
        s"exchange keyed on a non-hash column: $e")
      assert(!e.contains("tri#"), s"trigram string in exchange keys: $e")
    }
  }

  test("lm_trigram: count aggregate exchanges on the h1/h2/h3 long keys") {
    // the count fold is pinned in the query (r16 window removal), so its
    // exchange is asserted on the extracted pre-pin frame
    val counts = graft.operators.AnalyticsOps.lmTrigramCounts(spark, sf)
    val ex = counts.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.exists(e => e.contains("h1#") && e.contains("h3#")),
      s"no hashed-key exchange found:\n${ex.mkString("\n")}")
    assert(!ex.exists(e => e.contains("w1#") && e.contains("w3#")),
      s"word strings still key an exchange:\n${ex.mkString("\n")}")
    // r16 pin: the final plan carries NO vocabulary-sized window — ctx is
    // a ≤20-context filtered re-aggregate of the pin (its exchange keys on
    // the h1/h2 hashes), and the only window is the rank over 20 rows
    val finalPlan = SparkEntry.queries("lm_trigram")(spark, sf)
      .queryExecution.executedPlan.toString
    val finalEx = finalPlan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(finalEx.forall(e => !(e.contains("w1#") || e.contains("w2#"))),
      s"word strings key a post-fold exchange:\n${finalEx.mkString("\n")}")
    assert(!finalPlan.contains("SortMergeJoin"),
      s"ctx must attach by broadcast, not a sorted join:\n$finalPlan")
  }

  test("split_dataset / quality_score_linear: zero exchanges before the output sort") {
    // both are pure map-side passes — any hashpartitioning exchange means a
    // shuffle crept into what must run at parquet-scan speed at 100 TB
    for (q <- Seq("split_dataset", "quality_score_linear", "quality_gopher")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val ex = df.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("Exchange hashpartitioning")).toSeq
      assert(ex.isEmpty, s"$q shuffles before its sort:\n${ex.mkString("\n")}")
    }
  }

  test("data_profile: all columns profile in ONE scan of the table") {
    val df = SparkEntry.queries("data_profile")(spark, sf)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // formatted mode prints each scan twice (tree line + detail header);
    // count the numbered detail headers only
    val scans = plan.linesIterator.count(_.matches("""^\(\d+\) Scan parquet\s*"""))
    assert(scans == 1, s"expected one table scan, found $scans:\n$plan")
    // the multi-distinct strategy: one Expand feeding two-phase aggregates
    assert(plan.contains("Expand"), plan)
  }

  test("text_perplexity: every exchange keys on the word's hash or doc_id, never the word") {
    val df = SparkEntry.queries("text_perplexity")(spark, sf)
    val ex = df.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.nonEmpty)
    ex.foreach { e =>
      assert(e.contains("th#") || e.contains("doc_id#"),
        s"exchange keyed on a non-hash column: $e")
      assert(!e.contains("word#"), s"word string in exchange keys: $e")
    }
  }

  test("curation_pipeline: benchmark broadcasts; the dedup exchange carries digests, not text") {
    val df = SparkEntry.queries("curation_pipeline")(spark, sf)
    val lines = df.queryExecution.executedPlan.toString.linesIterator.toSeq
    // the benchmark shingle set must reach the corpus probe as a broadcast
    assert(lines.exists(_.contains("BroadcastExchange")),
      s"benchmark side not broadcast:\n${lines.mkString("\n")}")
    // the dedup window shuffles on the md5 digest column, never raw text
    val ex = lines.filter(_.contains("Exchange hashpartitioning"))
    assert(ex.exists(_.contains("ck#")), s"no digest-keyed exchange:\n${ex.mkString("\n")}")
    assert(!ex.exists(_.contains("text#")),
      s"document text in exchange keys:\n${ex.mkString("\n")}")
  }

  test("embedding_project: projection is map-side — no shuffle before the output sort") {
    val plan = formatted("embedding_project")
    // the k·d multiply-adds fold inside a Generate/Project pipeline; the
    // ONLY wide exchange is the final (vec_id, j) presentation sort
    val nExchange = "(?<!Broadcast)(?<!Reused)Exchange \\(".r.findAllIn(plan).length
    assert(nExchange == 1, s"projection must not shuffle; found $nExchange exchanges:\n$plan")
    assert(plan.contains("Generate"), "posexplode of the projected dims expected")
  }

  test("layout_zorder: bounds broadcast back; bucket counts aggregate two-phase") {
    val plan = formatted("layout_zorder")
    // the per-dimension min/max frame is a 1-row broadcast, never a join
    // that shuffles the fact side
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoopJoin"), plan)
    // bucket counts reduce map-side before the exchange (64 buckets on the wire)
    assert(plan.contains("partial_count") || plan.contains("Partial"), plan)
  }

  test("dedup_bloom_prefilter: the batch probes a BROADCAST bloom table") {
    val plan = formatted("dedup_bloom_prefilter")
    // filter words join to the probe stream map-side; the batch side must
    // not shuffle just to look up membership bits
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("bit_or"), "filter words must build via bit_or aggregation")
  }

  test("sample_token_budget: the corpus prefix sum is partition-parallel, not one global window") {
    val df = SparkEntry.queries("sample_token_budget")(spark, sf)
    val lines = df.queryExecution.executedPlan.toString.linesIterator.toSeq
    // the corpus-sized running sum must window by partition id; a Window
    // whose partition spec is empty would drag the corpus to one task
    val windows = lines.filter(_.contains("Window [sum"))
    assert(windows.exists(_.contains("], [part#")),
      s"no partition-parallel window:\n${windows.mkString("\n")}")
    // the order is established by ONE range partitioning of (pri, doc_id)
    assert(lines.exists(l => l.contains("Exchange rangepartitioning") &&
      l.contains("pri#") && l.contains("doc_id#")),
      s"no range exchange on the priority order:\n${lines.mkString("\n")}")
    // at runtime AQE must REUSE that exchange for the offset branch — the
    // corpus is scanned and BPE-tokenized once, not once per branch
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.linesIterator.exists(_.contains("ReusedExchange")),
      s"offset branch re-reads the corpus instead of reusing the exchange:\n$finalPlan")
  }

  test("events_sequence_pattern: top-15 is TakeOrdered; scan pruned; two keyed exchanges") {
    val plan = formatted("events_sequence_pattern")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("props") && !readSchema.contains("value"),
      s"sequence census reads unused event columns: $readSchema")
    // exactly the (user,day) session shuffle and the census shuffle — a
    // third exchange would mean the regex or flag re-partitioned the data
    val exchanges = plan.linesIterator.count(_.contains("- Exchange"))
    assert(exchanges == 2, s"$exchanges exchanges:\n$plan")
  }

  test("embedding_dim_stats: one two-phase aggregate, no join, no extra exchange") {
    val plan = formatted("embedding_dim_stats")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"), plan)
    assert(plan.contains("Partial") || plan.contains("partial_"),
      s"no map-side partial aggregation:\n$plan")
    assert(!plan.contains("Join"), s"dim profile must not join:\n$plan")
    val exchanges = plan.linesIterator.count(_.contains("- Exchange"))
    assert(exchanges <= 2, s"$exchanges exchanges:\n$plan") // dim agg + output sort
  }

  test("join_bloom_pruned: probe is map-side (no explode), fact scan pruned to 2 columns") {
    val plan = formatted("join_bloom_pruned")
    // the bitmap probe must be fused row arithmetic — a FACT-side Generate
    // would mean the table explodes k× per row (the dedup-prefilter
    // spelling, wrong side of the join for a fact table). The single
    // allowed Generate is the dimension build (keys → bit positions).
    val genBlocks = plan.split("\n\n").filter(_.startsWith("(")).filter(b =>
      b.linesIterator.next().contains("Generate"))
    assert(genBlocks.length == 1, s"${genBlocks.length} Generates:\n$plan")
    assert(genBlocks.head.contains("p_partkey") &&
      !genBlocks.head.contains("l_partkey"),
      s"explode is not on the dimension side:\n${genBlocks.head}")
    val factRead = plan.linesIterator
      .filter(_.contains("ReadSchema")).find(_.contains("l_partkey"))
    assert(factRead.exists(l => l.contains("l_extendedprice") &&
      !l.contains("l_orderkey")), s"fact scan not pruned: $factRead")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan) // one-row bitmap
    assert(plan.contains("BroadcastHashJoin"), plan)       // truth annotate
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("text_zipf_slope: rank cut pushes into WindowGroupLimit; aggregates are two-phase") {
    val plan = formatted("text_zipf_slope")
    // rk <= K must prune inside the window operator (per-partition top-K
    // heaps), not as a post-window filter over the whole vocabulary
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.contains("partial_count") || plan.contains("Partial"), plan)
    assert(!plan.contains("Join"), s"zipf fit must not join:\n$plan")
  }

  test("graph_clustering_coeff: artifact scan + explode-3 + TakeOrdered, no closure join") {
    val plan = formatted("graph_clustering_coeff")
    assert(!plan.contains("LeftSemi"),
      s"the closure probe belongs to the artifact build, not the query:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.linesIterator.exists(_.contains("- Generate")),
      s"per-vertex counts must come from the explode-3 pass:\n$plan")
  }

  test("lm_bigram_entropy: one explode, hash-keyed exchanges, no join") {
    val plan = formatted("lm_bigram_entropy")
    val generates = plan.linesIterator.count(_.contains("- Generate"))
    assert(generates == 1, s"$generates Generates:\n$plan")
    assert(!plan.contains("Join"), s"entropy must not join:\n$plan")
    assert(plan.contains("Window"), plan)
  }

  test("corpus_version_diff: exchanges move digests, never document bodies") {
    val plan = formatted("corpus_version_diff")
    assert(plan.contains("SortMergeJoin FullOuter") ||
      plan.contains("SortMergeJoin(") || plan.contains("ShuffledHashJoin"), plan)
    // every Exchange detail block must be text-free: the md5 projection has
    // to happen BEFORE the shuffle or the diff moves the corpus twice
    val blocks = plan.split("\n\n").filter(_.startsWith("(")).filter(b =>
      b.linesIterator.next().contains("Exchange"))
    assert(blocks.nonEmpty, plan)
    blocks.foreach(b =>
      assert(!b.contains("text#"), s"document text crosses an exchange:\n$b"))
  }

  test("graph_closeness round: (source, vertex) frontier broadcasts onto the packed adjacency") {
    import spark.implicits._
    val adj = Seq((1L, Seq(2L)), (2L, Seq(1L, 3L)), (3L, Seq(2L)))
      .toDF("src", "dsts")
    val seeds = Seq((1L, 1L)).toDF("s0", "v")
    val plan = graft.operators.GraphOps.closenessRound(adj, seeds, seeds, 1)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // both the probe and the per-source anti-join take the broadcast side
    assert(plan.linesIterator.count(_.contains("- BroadcastExchange")) == 2, plan)
  }

  test("graph_louvain_move: label joins broadcast, no sort of the edge stream") {
    // the min_by argmin itself sits behind the labels localCheckpoint (the
    // replay spec covers its semantics); the outer plan must keep every
    // label/degree join broadcast and never sort or window the edge stream
    val plan = formatted("graph_louvain_move")
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("partial_"), plan)
  }

  test("events_trend: two map-side-combined aggregates, no joins") {
    val plan = formatted("events_trend")
    assert(!plan.contains("Join"), s"trend must not join:\n$plan")
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("partial_"), plan)
  }

  test("resample_ohlc: one two-phase aggregate, no window over the event stream") {
    val plan = formatted("resample_ohlc")
    assert(!plan.contains("Window"), s"ohlc must not window the events:\n$plan")
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"), plan)
    assert(plan.contains("partial_"), plan)
  }

  test("agg_kmv_intersect: union K-min is TakeOrdered; sketch probes broadcast") {
    val plan = formatted("agg_kmv_intersect")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // per-cohort rank <= K prunes per partition before the exchange
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("quality_ppl_buckets: vocabulary joins key on the hash, text never exchanges") {
    val plan = formatted("quality_ppl_buckets")
    val blocks = plan.split("\n\n").filter(_.startsWith("(")).filter(b =>
      b.linesIterator.next().contains("Exchange"))
    assert(blocks.nonEmpty, plan)
    blocks.foreach(b =>
      assert(!b.contains("text#"), s"document text crosses an exchange:\n$b"))
  }

  test("lm_kneser_ney: broadcast marginals, scalar broadcast, top-20 TakeOrdered") {
    // r16: the c1/n1/nc word-keyed WINDOWS over the full bigram table are
    // gone — marginals are ≤20-group filtered re-aggregates of the pinned
    // fold, attached to the 20 winners by broadcast joins; the only
    // remaining window is the rank over the 20-row result
    val plan = formatted("lm_kneser_ney")
    val nWindows = plan.linesIterator.count(_.trim.startsWith("+- Window"))
    assert(nWindows == 1,
      s"expected only the 20-row rank window, found $nWindows:\n$plan")
    assert(!plan.linesIterator.exists(l =>
        l.contains("Exchange hashpartitioning") &&
          (l.contains("w1#") || l.contains("w2#"))),
      s"a word-keyed exchange survived the window removal:\n$plan")
    // the bigram-type total T joins in as a one-row broadcast
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    val nBhj = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBhj >= 2, s"both marginals must attach by broadcast:\n$plan")
    // the top-20 heap runs over the pinned fold — assert it on the
    // pre-pin construction the query actually executes
    import org.apache.spark.sql.functions.col
    val top = graft.operators.AnalyticsOps.lmKneserCounts(spark, sf)
      .orderBy(col("c12").desc, col("w1"), col("w2")).limit(20)
    assert(top.queryExecution.executedPlan.toString
        .contains("TakeOrderedAndProject"),
      "kneser-ney's top-20 should TakeOrderedAndProject")
  }

  test("events_seasonality: one scan, two-phase aggregate, no join") {
    val plan = formatted("events_seasonality")
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("partial_"), s"map-side partials expected:\n$plan")
    // the per-type total is a window over the ≤7·|types| aggregate frame,
    // partitioned by event_type — never a second events pass
    assert(plan.linesIterator.count(l =>
      l.startsWith("(") && l.contains("Scan parquet")) == 1, plan)
  }

  test("graph_label_prop round: two partial aggregates, no rank window, no sort") {
    import spark.implicits._
    val adj = Seq((1L, Seq(2L)), (2L, Seq(1L, 3L)), (3L, Seq(2L)))
      .toDF("src", "dsts")
    val labels = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("v", "lbl")
    val plan = graft.operators.GraphOps.labelPropRound(adj, labels)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    // majority vote is min_by aggregation — both the (v,lbl) count and the
    // per-vertex argmin map-side combine; a rank-window spelling would sort
    // every vertex's vote frame per round
    assert(plan.contains("partial_count") && plan.contains("partial_min_by"), plan)
    assert(!plan.contains("Window"), s"no rank window expected:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("watermark_audit: event-sized windows keyed by partition; offsets broadcast") {
    val plan = formatted("watermark_audit")
    // the prefix max over EVENTS must be partitioned (two-phase pattern);
    // the only unkeyed window is the #partitions-row offsets fold
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty, plan)
    val unkeyed = winLines.filterNot(_.contains("part#"))
    assert(unkeyed.size <= 1, s"events-sized unkeyed window:\n${unkeyed.mkString("\n")}")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("embedding_hubness: query sample broadcasts; corpus never shuffles raw vectors") {
    val plan = formatted("embedding_hubness")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("q_id#")),
      s"top-k window must partition by query:\n$plan")
    // the embedding payload must not cross an exchange — only ids/counts do
    val blocks = plan.split("\n\n").filter(_.startsWith("(")).filter(b =>
      b.linesIterator.next().contains("Exchange"))
    blocks.foreach(b =>
      assert(!b.contains("embedding#"), s"raw vectors cross an exchange:\n$b"))
  }

  test("resample_ewma: one scan, one window pass over the hourly frame") {
    val plan = formatted("resample_ewma")
    assert(plan.linesIterator.count(l =>
      l.startsWith("(") && l.contains("Scan parquet")) == 1, plan)
    assert(plan.contains("partial_"), plan)
    // all 15 lags fuse into ONE Window node over (event_type, hour)
    assert(plan.linesIterator.count(l =>
      l.startsWith("(") && l.trim.matches("\\(\\d+\\) Window")) == 1, plan)
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.forall(_.contains("event_type#")), plan)
  }

  test("events_autocorr: one scan, all lags in one keyed window pass") {
    val plan = formatted("events_autocorr")
    assert(plan.linesIterator.count(l =>
      l.startsWith("(") && l.contains("Scan parquet")) == 1, plan)
    assert(plan.linesIterator.count(l =>
      l.startsWith("(") && l.trim.matches("\\(\\d+\\) Window")) == 1, plan)
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("event_type#")), plan)
    assert(plan.contains("partial_"), plan)
  }

  test("events_changepoint: keyed windows, min_by argmax — no rank window over days") {
    val plan = formatted("events_changepoint")
    assert(plan.contains("partial_min_by"), plan)
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("event_type#")), plan)
    assert(plan.linesIterator.count(l =>
      l.startsWith("(") && l.contains("Scan parquet")) == 1, plan)
  }

  test("events_pmi: width-bounded pair expansion, broadcast dims, no corpus self-join") {
    val plan = formatted("events_pmi")
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // pair source is the collect_set basket explode, not a join of events
    // against itself: every join input must be aggregate-sized
    assert(plan.contains("collect_set"), plan)
  }

  test("text_hapax: vocabulary-keyed exchange, words hashed before the shuffle") {
    val plan = formatted("text_hapax")
    assert(plan.contains("partial_"), plan)
    assert(!plan.contains("Join"), plan)
    // the raw word string must not cross an exchange — only (lang, hash)
    val blocks = plan.split("\n\n").filter(_.startsWith("(")).filter(b =>
      b.linesIterator.next().contains("Exchange"))
    assert(blocks.nonEmpty, plan)
    blocks.foreach(b =>
      assert(!b.contains("w#") && !b.contains("text#"),
        s"raw text crosses an exchange:\n$b"))
  }

  test("sim_recall_curve: retrieval legs stay TakeOrdered; curve joins are broadcast") {
    val plan = formatted("sim_recall_curve")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("dedup_minhash_1bit: sketch table semi-joins to pair ids; no corpus pair blowup") {
    val plan = formatted("dedup_minhash_1bit")
    assert(!plan.contains("CartesianProduct"), plan)
    // the parity sketch only ever computes for candidate-pair members
    assert(plan.contains("LeftSemi"), s"ids semi-join expected:\n$plan")
  }

  test("events_forecast_naive: one scan, keyed lag window, two-phase aggregate") {
    val plan = formatted("events_forecast_naive")
    assert(plan.linesIterator.count(l =>
      l.startsWith("(") && l.contains("Scan parquet")) == 1, plan)
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("event_type#")), plan)
    assert(plan.contains("partial_"), plan)
  }

  test("mm_scene_cut: pixels stay map-side; delta window keyed by source") {
    val plan = formatted("mm_scene_cut")
    assert(!plan.contains("Join"), plan)
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("source#")), plan)
    // only (doc_id, source, raster_sum) survives the mapPartitions batch —
    // no binary payload column crosses an exchange
    val blocks = plan.split("\n\n").filter(_.startsWith("(")).filter(b =>
      b.linesIterator.next().contains("Exchange"))
    blocks.foreach(b =>
      assert(!b.contains("payload#") && !b.contains("img#"),
        s"binary payload crosses an exchange:\n$b"))
  }

  test("dedup_impact: digest-keyed canonical window; text projected away map-side") {
    val plan = formatted("dedup_impact")
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("ch#")),
      s"canonical window must key on the digest:\n$plan")
    val blocks = plan.split("\n\n").filter(_.startsWith("(")).filter(b =>
      b.linesIterator.next().contains("Exchange"))
    blocks.foreach(b =>
      assert(!b.contains("text#"), s"document text crosses an exchange:\n$b"))
  }

  test("events_transition_entropy: keyed windows only, one scan") {
    val plan = formatted("events_transition_entropy")
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(l =>
      l.contains("user_id#") || l.contains("cur_type#")), plan)
    assert(plan.linesIterator.count(l =>
      l.startsWith("(") && l.contains("Scan parquet")) == 1, plan)
    assert(plan.contains("partial_"), plan)
  }

  test("dedup_bucket_dist: map-side band keys, two aggregates, no join, no text exchange") {
    val plan = formatted("dedup_bucket_dist")
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("partial_"), plan)
    val blocks = plan.split("\n\n").filter(_.startsWith("(")).filter(b =>
      b.linesIterator.next().contains("Exchange"))
    assert(blocks.nonEmpty, plan)
    blocks.foreach(b =>
      assert(!b.contains("text#"), s"document text crosses an exchange:\n$b"))
  }

  test("agg_cm_sketch: 4KB sketch broadcasts into the estimate pipeline") {
    // the checkpoint in the full query hides the build — pin the extracted
    // pre-checkpoint pipeline
    val plan = RelOps.cmEstimates(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("partial_"), plan)
  }

  test("window_time_range: one scan, type-keyed RANGE frame") {
    val plan = formatted("window_time_range")
    assert(plan.linesIterator.count(l =>
      l.startsWith("(") && l.contains("Scan parquet")) == 1, plan)
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(l =>
      l.contains("event_type#") && l.contains("specifiedwindowframe(RangeFrame")),
      s"type-keyed RANGE frame expected:\n$plan")
  }

  test("events_survival: day-grain windows, one-row census broadcast") {
    val plan = formatted("events_survival")
    // the at-risk population count rides every day row as a broadcast
    // one-row nested-loop join — the event stream is never re-scanned
    // per row
    assert(plan.linesIterator.count(_.contains("- BroadcastNestedLoopJoin")) == 1,
      plan)
    // both running windows are ROWS frames over the day-grain aggregate
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(l =>
      l.contains("specifiedwindowframe(RowFrame")), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("events_cohort_ltv: cohort-keyed window, sizes broadcast") {
    val plan = formatted("events_cohort_ltv")
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("cohort_week#")),
      s"running sum must partition by cohort_week:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("graph_weak_ties: pre-classified scans; only degree/census joins remain") {
    val plan = formatted("graph_weak_ties")
    // BOTH sides (supported ties, zero-support bridges) are pre-classified
    // parquet outputs of the pair-count artifact build; what remains is
    // two broadcast degree annotations plus the one-row census
    assert(!plan.contains("LeftSemi") && !plan.contains("LeftAnti"),
      s"membership classification belongs to the artifact build:\n$plan")
    assert(plan.linesIterator.count(_.contains("- BroadcastExchange")) >= 3, plan)
    assert(plan.linesIterator.count(_.contains("- BroadcastNestedLoopJoin")) == 1,
      plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("text_topk_coverage: head filtered before the checkpoint NL join") {
    val plan = formatted("text_topk_coverage")
    // the 3-row checkpoint table joins the ≤1000-row HEAD, not the
    // vocabulary: the rank filter sits below the nested-loop join
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.linesIterator.exists(l =>
      l.contains("Filter") || l.contains("(rk")), plan)
    assert(plan.contains("rk#") && plan.contains("<= 1000"), plan)
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("lang#")),
      s"rank window must partition by lang:\n$plan")
  }

  test("events_gini: user-grain rank window keyed by event_type") {
    val plan = formatted("events_gini")
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("event_type#")),
      s"rank window must partition by event_type:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("events_interarrival: one keyed LAG window, no joins") {
    val plan = formatted("events_interarrival")
    assert(!plan.contains("Join"), s"no join belongs in this plan:\n$plan")
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    // the event-stream LAG window keys on (user, type); the only other
    // window is the share fold over the |types|×~40-row bucket aggregate
    val lagLines = winLines.filter(_.contains("lag("))
    assert(lagLines.nonEmpty && lagLines.forall(l =>
      l.contains("user_id#") && l.contains("event_type#")),
      s"LAG window must partition by (user, type):\n$plan")
    assert(winLines.filterNot(_.contains("lag(")).forall(_.contains("event_type#")),
      s"share fold must key on event_type:\n$plan")
    // exactly one scan of the event stream
    assert(plan.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*""")) == 1,
      plan)
  }

  test("lm_unigram_kl: marginals broadcast; corpus shuffles on narrow keys") {
    val plan = formatted("lm_unigram_kl")
    // source totals + scalar grand total enter as broadcasts
    assert(plan.linesIterator.count(_.contains("- BroadcastExchange")) >= 2, plan)
    assert(plan.linesIterator.count(_.contains("- BroadcastNestedLoopJoin")) == 1,
      plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("text_burstiness: TakeOrdered over vocabulary moments, census broadcast") {
    val plan = formatted("text_burstiness")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.linesIterator.count(_.contains("- BroadcastNestedLoopJoin")) == 1,
      plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("events_anomaly_mad: day-grain frame checkpointed once; no float in plan") {
    val plan = formatted("events_anomaly_mad")
    // the three derivation branches reuse the checkpointed day-grain
    // aggregate instead of re-scanning events
    assert(plan.contains("Scan ExistingRDD"), plan)
    assert(plan.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*""")) == 0,
      s"event stream must not re-scan:\n$plan")
    assert(plan.linesIterator.count(_.contains("- BroadcastExchange")) >= 2, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("events_type_corr: day-grain self-join reuses one checkpointed scan") {
    val plan = formatted("events_type_corr")
    assert(plan.contains("Scan ExistingRDD"), plan)
    assert(plan.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*""")) == 0,
      s"event stream must not re-scan:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("lm_heldout_ppl: one tokenize pass carries both splits") {
    val plan = formatted("lm_heldout_ppl")
    // the single (lang, word) conditional-count aggregate is checkpointed;
    // train totals broadcast into the held-out fold
    assert(plan.contains("Scan ExistingRDD"), plan)
    assert(plan.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*""")) == 0,
      s"corpus must tokenize exactly once:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("events_topk_churn: leaderboard checkpointed; day-pair joins broadcast") {
    val plan = formatted("events_topk_churn")
    assert(plan.contains("Scan ExistingRDD"), plan)
    assert(plan.linesIterator.count(_.contains("- BroadcastExchange")) >= 2, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("sim_search_lsh: signature frame checkpointed; probe and rerank broadcast") {
    val plan = formatted("sim_search_lsh")
    // candidates, query vector and census all enter as broadcasts; the
    // rerank is a broadcast hash join against one corpus scan — the
    // corpus never pairs with itself
    assert(plan.contains("Scan ExistingRDD"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.linesIterator.count(_.contains("- BroadcastExchange")) >= 3, plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("sim_lsh_recall: radius table and top-10 broadcast over signature frame") {
    val plan = formatted("sim_lsh_recall")
    assert(plan.contains("Scan ExistingRDD"), plan)
    assert(plan.linesIterator.count(_.contains("- BroadcastExchange")) >= 3, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("mm_luma_hist: decode collapses map-side to bucket rows, no join") {
    val plan = formatted("mm_luma_hist")
    assert(!plan.contains("Join"), s"no join belongs in this plan:\n$plan")
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("MapPartitions") || plan.contains("mapPartitions") ||
      plan.contains("SerializeFromObject"), plan)
  }

  test("corpus_bootstrap_ci: replica table broadcasts into one doc scan") {
    val plan = formatted("corpus_bootstrap_ci")
    // the B-row replica table and both order-statistic rows enter as
    // broadcast nested loops; the doc scan never shuffles beyond the
    // B-row aggregate
    assert(plan.linesIterator.count(_.contains("- BroadcastNestedLoopJoin")) >= 3,
      plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("events_new_vs_returning: user-grain join, no window over the stream") {
    val plan = formatted("events_new_vs_returning")
    assert(!plan.contains("Window"), s"no window belongs in this plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("events_funnel_windowed: three keyed reductions, no cartesian") {
    val plan = formatted("events_funnel_windowed")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("events_decompose: day-grain checkpoint; seasonal join broadcast") {
    val plan = formatted("events_decompose")
    assert(plan.contains("Scan ExistingRDD"), plan)
    assert(plan.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*""")) == 0,
      s"event stream must not re-scan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("profile_key_skew: TakeOrdered over key counts, census broadcast") {
    val plan = formatted("profile_key_skew")
    assert(plan.contains("Scan ExistingRDD"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.linesIterator.count(_.contains("- BroadcastNestedLoopJoin")) == 1,
      plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("events_lifecycle: weekly census checkpointed; churn join broadcast") {
    val plan = formatted("events_lifecycle")
    // the classification (user-keyed LAG + first-week join) ran at
    // checkpoint time; the visible plan is the WEEKS-sized census frame
    // joining its own 7-day shift as a broadcast
    assert(plan.contains("Scan ExistingRDD"), plan)
    assert(plan.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*""")) == 0,
      s"event stream must not re-scan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("lang_id_confusion: marker scan checkpointed; language census broadcast") {
    val plan = formatted("lang_id_confusion")
    assert(plan.contains("Scan ExistingRDD"), plan)
    assert(plan.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*""")) == 0,
      s"corpus must not re-scan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("quality_dup_correlation: one digest-keyed shuffle, no text exchange") {
    val plan = formatted("quality_dup_correlation")
    // the join key is the md5 digest; the raw text column never crosses
    // an exchange
    val exchanges = plan.linesIterator.filter(_.contains("Arguments: hashpartitioning")).toSeq
    assert(exchanges.forall(!_.contains("text#")),
      s"text must not cross an exchange:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("scd2_snapshot: one-row bound broadcast over the change-row frame") {
    val plan = formatted("scd2_snapshot")
    assert(plan.linesIterator.count(_.contains("- BroadcastNestedLoopJoin")) == 1,
      plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("user_id#")),
      s"SCD2 windows key on user:\n$plan")
  }

  test("privacy_k_anon: QI-grain checkpoint; median join broadcast") {
    val plan = formatted("privacy_k_anon")
    assert(plan.contains("Scan ExistingRDD"), plan)
    assert(plan.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*""")) == 0,
      s"event stream must not re-scan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("privacy_safe_view: pure projection — no aggregate, no join") {
    val plan = formatted("privacy_safe_view")
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("HashAggregate"), plan)
    // masking happens map-side; only the output sort exchanges
    assert(plan.linesIterator.count(_.contains("- Exchange")) <= 1, plan)
  }

  test("events_hour_profile: one aggregate, type-keyed share window") {
    val plan = formatted("events_hour_profile")
    assert(!plan.contains("Join"), plan)
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("event_type#")),
      s"share window must key on event_type:\n$plan")
  }

  test("session_stats: order statistics ride the value-grain frame") {
    val plan = formatted("session_stats")
    // every window in the visible plan folds the duration HISTOGRAM
    // (value-grain), never the session or event stream
    assert(plan.contains("Scan ExistingRDD"), plan)
    assert(plan.linesIterator.count(_.contains("- BroadcastNestedLoopJoin")) >= 2,
      plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("events_value_benford: 9-bucket aggregate, digit table broadcast") {
    val plan = formatted("events_value_benford")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("embedding_knn_eval: fixed-size panel broadcasts into one corpus scan") {
    val plan = formatted("embedding_knn_eval")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("qid#")),
      s"rank/vote windows must key on the query id:\n$plan")
  }

  test("corpus_length_model: one language-keyed aggregate, no join, no window") {
    val plan = formatted("corpus_length_model")
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("catalog_checksum: ten single-pass aggregates, no join, no window") {
    val plan = formatted("catalog_checksum")
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      plan)
  }

  test("events_bot_suspects: user-grain checkpoint; censuses broadcast") {
    val plan = formatted("events_bot_suspects")
    assert(plan.contains("Scan ExistingRDD"), plan)
    assert(plan.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*""")) == 0,
      s"event stream must not re-scan:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.linesIterator.count(_.contains("- BroadcastNestedLoopJoin")) >= 2,
      plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("events_dq_report: single aggregate pass, no window") {
    val plan = formatted("events_dq_report")
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      plan)
  }

  test("text_ascii_audit: map-side fold, one source-keyed aggregate") {
    val plan = formatted("text_ascii_audit")
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
    // the per-char explode must NOT appear — the fold is an array
    // transform inside the projection
    assert(!plan.contains("Generate"), s"no explode belongs here:\n$plan")
  }

  test("graph_bfs round: frontier and visited broadcast onto the packed adjacency") {
    import spark.implicits._
    val sym = Seq((1L, Seq(2L)), (2L, Seq(1L, 3L)), (3L, Seq(2L)))
      .toDF("src", "dsts")
    val seeds = Seq(1L).toDF("v")
    val plan = graft.operators.GraphOps.bfsRound(sym, seeds, seeds, 1)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // both the probe and the anti-join take the broadcast side
    assert(plan.linesIterator.count(_.contains("- BroadcastExchange")) == 2, plan)
  }
}
