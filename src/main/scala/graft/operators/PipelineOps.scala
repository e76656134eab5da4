package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between raw crawl and tokenizer: deterministic sampling, stratified
  * quotas, length histograms, sequence packing, benchmark decontamination,
  * and cosine range search (SURVEY.md §2C extensions).
  *
  * Everything here is engine-neutral arithmetic (the PolyHash affine family
  * mod 2^31−1) so each query's DuckDB oracle replays the full pipeline —
  * the same pattern as the dedup/similarity ops. Sampling "randomness" is a
  * deterministic hash of the stable doc_id: reproducible across runs,
  * cluster layouts, and engines, which is exactly what a curation pipeline
  * wants from a sample (re-running the job must pick the same documents).
  */
object PipelineOps {
  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "documents")

  import graft.functions.PolyHash.{Mult, P}

  /** Deterministic per-doc priority in [0, P): `((doc_id mod P)·A) mod P`
    * with A = Knuth's 2^32/φ — the same multiplicative rehash the LSH
    * pipelines use. Both operands stay < 2^31·2^32 = 2^63, ANSI-safe. */
  private def prio(id: Column): Column = (id % P) * Mult % P
  private val prioSql = s"((doc_id % $P) * $Mult) % $P"

  /** Bootstrap replica count for [[corpusBootstrapCi]]. */
  val bootstrapReplicas = 100

  /** Deterministic Poisson(1) bootstrap CI for the corpus mean document
    * length: every (replica b, doc) pair draws a multiplicity from the
    * truncated-Poisson inverse CDF applied to the hash-uniform
    * u = polyhash("b:doc_id") / P (thresholds are 9-dp literals — the
    * e^-1·Σ1/k! prefix sums — so both engines binarize identically;
    * tail mass above k = 4 truncates to 4, a 0.37% distortion far inside
    * the CI width). Each replica's mean is one float division of exact
    * integer sums; the 90% interval takes the rank-5 and rank-95 replica
    * means (exact order statistics, ties broken by replica id). This is
    * the error bar every corpus-metric dashboard should carry — and the
    * Poisson bootstrap is THE resampling scheme that works on a stream
    * (each doc draws independently; no global resample pass).
    *
    * 100 TB shape: the [[bootstrapReplicas]]-row replica table broadcasts
    * into a nested-loop expansion of the doc-grain scan (B× map-side
    * work, zero extra shuffle) and collapses map-side to B partial sums;
    * the order statistics ride the B-row frame. */
  val corpusBootstrapCi: Q = (s, d) => {
    import graft.functions.PolyHash.poly_hash
    val b = {
      import s.implicits._
      (0 until bootstrapReplicas).map(_.toLong).toDF("b")
    }
    val u = poly_hash(concat(col("b").cast(StringType), lit(":"),
      col("doc_id").cast(StringType))).cast(DoubleType) / P.toDouble
    val mult = when(u < 0.367879441d, 0L)
      .when(u < 0.735758882d, 1L)
      .when(u < 0.919698603d, 2L)
      .when(u < 0.981011843d, 3L)
      .otherwise(4L)
    val reps = docs(s, d).select(col("doc_id"), col("n_chars"))
      .join(broadcast(b), lit(true))
      .select(col("b"), mult.as("m"), col("n_chars"))
      .groupBy(col("b"))
      .agg(sum(col("m")).as("n"), sum(col("m") * col("n_chars")).as("s"))
      .select(col("b"),
        round(col("s").cast(DoubleType) / col("n").cast(DoubleType), 6)
          .as("mean_b"))
    val rk = Window.orderBy(col("mean_b"), col("b"))
    val stats = reps.withColumn("rn", row_number().over(rk))
    val base = docs(s, d)
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("n_chars")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType), 6).as("mean_len"))
    base
      .crossJoin(broadcast(stats.filter(col("rn") === 5)
        .select(col("mean_b").as("ci_lo"))))
      .crossJoin(broadcast(stats.filter(col("rn") === 95)
        .select(col("mean_b").as("ci_hi"))))
      .select(col("n_docs"), col("mean_len"), col("ci_lo"), col("ci_hi"),
        lit(bootstrapReplicas.toLong).as("b_replicas"))
  }

  /** Lognormal length model per language: μ and σ of ln(n_chars) — the
    * two parameters a synthetic-data generator or a capacity model fits
    * to document lengths (lengths are multiplicative, so ln-space is
    * where they look Gaussian). Each ln quantizes to DECIMAL(18,6) BEFORE
    * the moment sums (the repo's log convention — sums reassociate
    * freely), the square widens to DECIMAL before multiplying, and μ/σ
    * evaluate once per language in doubles under identical formula text
    * (sample variance, n−1 denominator).
    *
    * 100 TB shape: one language-keyed aggregate out of the map side —
    * |langs| rows; nothing else moves. */
  val corpusLengthModel: Q = (s, d) => {
    val dec6 = DecimalType(18, 6)
    val x = round(log(col("n_chars").cast(DoubleType)), 6).cast(dec6)
    docs(s, d)
      .select(col("lang"), x.as("x"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"))
      .select(col("lang"), col("n_docs"),
        round(col("sx").cast(DoubleType) / col("n_docs").cast(DoubleType), 6)
          .as("mu_ln"),
        round(sqrt((col("n_docs").cast(DoubleType) * col("sxx").cast(DoubleType)
            - col("sx").cast(DoubleType) * col("sx").cast(DoubleType)) /
          (col("n_docs").cast(DoubleType) *
            (col("n_docs") - 1L).cast(DoubleType))), 6).as("sigma_ln"))
      .orderBy(col("lang"))
  }

  // ------------------------------------------------------------- sampling
  /** Deterministic 10% Bernoulli sample: keep where hash(doc_id) mod 100 <
    * 10. Pure map-side filter — no shuffle, no RNG state, no seed
    * coordination across executors; at 100 TB this is a single scan whose
    * selectivity Catalyst can see. The same predicate re-selects the same
    * documents on any engine or cluster shape. */
  val sampleHash: Q = (s, d) =>
    docs(s, d)
      .filter(prio(col("doc_id")) % 100 < 10)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Weighted sample without replacement: the 50 documents drawn with
    * probability increasing in length (n_chars), the "sample long documents
    * preferentially" knob a token-budget-constrained corpus mix needs. Each
    * doc gets the deterministic hash-uniform u = (prio(doc_id)+1)/(P+1) ∈
    * (0,1] and priority w/u (weight over uniform); the sample is the global
    * top-50 by priority. This is the one-division cousin of the
    * Efraimidis–Spirakis u^(1/w) key: E–S needs ln()/pow(), whose last-ulp
    * behavior differs between libm implementations and would break the
    * bit-exact oracle replay, while w/u is a single IEEE division both
    * engines round identically; heavier docs still win monotonically in w
    * at fixed u, and the draw is exactly reproducible on any engine.
    * Map-side priority + TakeOrdered top-50 — no shuffle, no RNG state. */
  val sampleWeighted: Q = (s, d) =>
    docs(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        round(col("n_chars").cast(DoubleType) * (lit(P) + 1) /
          (prio(col("doc_id")) + 1), 6).as("priority"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(50)

  /** Stratified sample: a fixed quota of 20 docs per language, chosen by
    * the deterministic hash priority (ties broken by doc_id). One shuffle
    * on the stratum key; within each stratum the window keeps 20 rows. At
    * scale the right evolution is a bounded top-k aggregate per stratum
    * (the [[graft.functions.TopKAggregator]] pattern) — with ~10 strata the
    * window sort is already the per-stratum work, so the simple spelling
    * holds until strata get hot. */
  val sampleStratified: Q = (s, d) => {
    val w = Window.partitionBy(col("lang")).orderBy(prio(col("doc_id")), col("doc_id"))
    docs(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .select(col("lang"), col("doc_id"), col("rn"))
      .orderBy(col("lang"), col("rn"))
  }

  /** Document-length histogram in 100-char bins: the corpus profile every
    * curation run starts from. One partial+final aggregate; ~tens of bins
    * regardless of corpus size. */
  val aggHistogram: Q = (s, d) =>
    docs(s, d)
      .groupBy((floor(col("n_chars") / 100) * 100).as("bin_lo"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("bin_lo"))

  // ------------------------------------------------------------- packing
  /** Sequence packing: assign docs to fixed 2048-token context windows,
    * greedily in deterministic hash order, and report per-bin occupancy.
    * bin = floor(tokens_before_this_doc / 2048) — the standard offset-based
    * packing a pretraining data loader runs. Packing is order-dependent, so
    * each packing unit is inherently sequential — which is why the unit is
    * (lang, shard), not lang: the deterministic hash splits every language
    * into [[packShards]] independently-packed shards, so the window sort
    * parallelizes across shards and no single task owns a whole language's
    * corpus. At 100 TB the shard count is the scale knob (shards ∝ corpus /
    * target-shard-size); the bins a data loader reads are keyed (lang,
    * shard, bin_id) either way. Token count is the embedded ordered-merge
    * BPE tokenizer ([[graft.functions.BpeTable]]) shared with
    * `text_token_count` — bins are budgeted in the subword tokens a
    * training run actually consumes, not whitespace words. */
  val packSequences: Q = (s, d) => {
    val tok = graft.functions.BpeTable.bpe_token_count(col("text"))
    val w = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(prio(col("doc_id")), col("doc_id"))
    docs(s, d)
      .select(col("lang"), (prio(col("doc_id")) % packShards).as("shard"),
        col("doc_id"), tok.as("tok"))
      .withColumn("cum_before", sum(col("tok")).over(w) - col("tok"))
      .withColumn("bin_id", floor(col("cum_before") / 2048))
      .groupBy(col("lang"), col("shard"), col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
      .orderBy(col("lang"), col("shard"), col("bin_id"))
  }

  /** Independently-packed shards per language (see [[packSequences]]). */
  val packShards = 4

  // ------------------------------------------- benchmark decontamination
  /** Benchmark decontamination: flag corpus documents sharing any word
    * 5-gram with the held-out set (source `src0` stands in for the eval
    * benchmark). The benchmark's distinct shingle set BROADCASTS — it is
    * benchmark-sized, not corpus-sized — so the 100 TB corpus is touched by
    * exactly one map-side scan + hash-join probe; only matching (doc,
    * shingle) rows reach the per-doc count. This is the shape real
    * decontamination runs take: the eval suites are megabytes against
    * terabytes of corpus. */
  val decontaminate: Q = (s, d) => {
    val sh5 = graft.functions.WordShingles.word_shingles(col("text"), 5)
    val corpus = docs(s, d).filter(col("source") =!= "src0")
      .select(col("doc_id"), explode(sh5).as("sh"))
    val bench = docs(s, d).filter(col("source") === "src0")
      .select(explode(sh5).as("sh")).distinct()
    corpus.join(broadcast(bench), "sh")
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("sh")).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------- quality gate
  /** Composite quality gate (the C4-style keep/drop pass): a document is
    * kept when it has ≥ 30 words, mean word length in [3, 10], and < 10%
    * symbol characters. Emits keep + a reasons bitmask (bit 0 = too short,
    * bit 1 = word-length outlier, bit 2 = symbol-heavy) so downstream
    * curation can audit WHY a document dropped — the shape real filter
    * passes ship. All three signals are integer arithmetic (counts and
    * cross-multiplied thresholds, no floating-point ratios), so the
    * keep/drop decision is bit-exact on any engine; one map-side pass, no
    * shuffle before the output sort. */
  val qualityFilter: Q = (s, d) => {
    val nWords = size(split(col("text"), " ")).cast(LongType)
    // alpha_chars = characters that are not spaces and not symbols
    val nonSpace = length(regexp_replace(col("text"), " ", "")).cast(LongType)
    val symbols = length(regexp_replace(col("text"), "[A-Za-z0-9 ]", "")).cast(LongType)
    val total = length(col("text")).cast(LongType)
    val alpha = nonSpace - symbols
    val tooShort = nWords < 30
    // mean word length in [3,10]  ⇔  3·n ≤ alpha ≤ 10·n  (exact integers)
    val wlenOut = alpha < nWords * 3 || alpha > nWords * 10
    // symbol ratio ≥ 10%  ⇔  10·symbols ≥ total
    val symHeavy = symbols * 10 >= total
    docs(s, d)
      .select(col("doc_id"), nWords.as("n_words"),
        (!tooShort && !wlenOut && !symHeavy).as("keep"),
        (when(tooShort, 1L).otherwise(0L)
          .bitwiseOR(when(wlenOut, 2L).otherwise(0L))
          .bitwiseOR(when(symHeavy, 4L).otherwise(0L))).as("reasons"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------- range search
  /** Cosine range search: every vector within cosine ≥ 0.2 of the query
    * (vec_id 0) — the retrieval-threshold complement of top-k. Query vector
    * broadcasts; the corpus never shuffles; the threshold test runs on the
    * 6-decimal rounding both engines agree on. */
  val simSearchRange: Q = (s, d) => {
    val e = Tables.load(s, d, "embeddings")
    val asD = (c: Column) => c.cast(ArrayType(DoubleType))
    val q = e.filter(col("vec_id") === 0).select(asD(col("embedding")).as("qv"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(SimilarityOps.cosine(asD(col("embedding")), col("qv")), 6).as("score"))
      .filter(col("score") >= 0.2)
      .orderBy(col("score").desc, col("vec_id"))
  }

  // ----------------------------------------------------- layout management
  /** File compaction + key clustering — the table-maintenance pass every
    * long-lived 100 TB corpus needs: rewrite a table range-partitioned and
    * sorted on its hottest filter key (`l_shipdate`) so (a) small files
    * merge into few well-sized ones and (b) each output file covers a
    * disjoint key range, which turns any later date-range filter into
    * file-level pruning via parquet min/max footer stats (the poor man's
    * Z-order for a single key). The rewrite is pay-once via
    * [[graft.plans.ArtifactCache]]; the query reads the clustered layout
    * back and must hash-match the original table — compaction must be
    * content-neutral. `Round4OpsSpec` asserts the disjoint-range property
    * and that a date filter on the clustered layout prunes files. */
  val compactCluster: Q = (s, d) => {
    val dir = clusteredLayout(s, d)
    graft.plans.ArtifactCache.readParquet(s, dir)
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
  }

  private[graft] def clusteredLayout(s: SparkSession, d: String): String =
    graft.plans.ArtifactCache.getOrBuild("cluster_lineitem", d, Seq("lineitem"),
      Seq(PipelineOps.getClass, graft.Tables.getClass)) { dir =>
      Tables.load(s, d, "lineitem")
        .repartitionByRange(8, col("l_shipdate"))
        .sortWithinPartitions(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .write.mode("overwrite").parquet(dir)
    }

  /** Bucket count for [[layoutZorder]] — at 100 TB this is files-per-table
    * (buckets ∝ table / target-file-size), like [[exportShards]]. */
  val zorderBuckets = 64

  /** Z-ORDER layout audit — the MULTI-column companion to
    * [[compactCluster]]'s single-key clustering: interleave the bits of two
    * filter dimensions (Morton code) so that files clustered on the code
    * bound BOTH columns' min/max spans at once, and predicates on EITHER
    * dimension (or both) skip files via parquet footer stats — the layout
    * Delta/Iceberg `OPTIMIZE ZORDER BY` builds, computed here as plain
    * codegen'd column arithmetic. Each dimension is first normalized to
    * the full 16-bit range with exact integer arithmetic from a broadcast
    * 1-row min/max frame (the scalar-subquery spelling — a raw key that
    * only fills the low bits would leave the interleave degenerate), then
    * the 32-bit code's top 6 bits assign one of [[zorderBuckets]] buckets
    * = prospective files. The query emits the per-bucket proof the judge
    * of any layout cares about: row count plus BOTH dimensions' min/max
    * (span ≪ domain on both axes ⇒ 2-D file skipping works; a 1-D sort
    * bounds only its own key). `RoundSevenOpsSpec` asserts the spans.
    *
    * 100 TB shape: the code is one map-side expression (zero shuffle); the
    * real rewrite is `repartitionByRange(z) + write` exactly like
    * [[clusteredLayout]], and the audit aggregate is bucket-count-sized. */
  val layoutZorder: Q = (s, d) => {
    val li = Tables.load(s, d, "lineitem").select(col("l_partkey"), col("l_suppkey"))
    val bounds = li.agg(
      min(col("l_partkey")).as("pmin"), max(col("l_partkey")).as("pmax"),
      min(col("l_suppkey")).as("smin"), max(col("l_suppkey")).as("smax"))
    val interleave = (0 until 16).map(b =>
      s"shiftleft(shiftright(p16, $b) & 1, ${2 * b}) | " +
        s"shiftleft(shiftright(s16, $b) & 1, ${2 * b + 1})").mkString("(", " | ", ")")
    li.crossJoin(broadcast(bounds))
      .withColumn("p16", expr("(l_partkey - pmin) * 65535 DIV greatest(pmax - pmin, 1)"))
      .withColumn("s16", expr("(l_suppkey - smin) * 65535 DIV greatest(smax - smin, 1)"))
      .withColumn("bucket", expr(s"shiftright($interleave, 26)").cast(IntegerType))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("p_min"), max(col("l_partkey")).as("p_max"),
        min(col("l_suppkey")).as("s_min"), max(col("l_suppkey")).as("s_max"))
      .orderBy(col("bucket"))
  }

  // ------------------------------------------------------- dataset splits
  /** Leakage-aware train/valid/test split (80/10/10): the split key is a
    * deterministic hash of the document CONTENT, not the doc id, so exact
    * duplicates land in the same split by construction — the subtle
    * train/test-contamination bug (one copy in train, one in test) cannot
    * happen. Pure map-side column arithmetic: at 100 TB this is one scan
    * with zero shuffle, and re-running the job (or running it on another
    * engine) assigns every document identically. */
  val splitDataset: Q = (s, d) => {
    val h = graft.functions.PolyHash.poly_hash(md5(col("text"))) % 100
    docs(s, d)
      .select(col("doc_id"),
        when(h < 80, "train").when(h < 90, "valid").otherwise("test").as("split"),
        col("n_chars"))
      .orderBy(col("doc_id"))
  }

  // --------------------------------------------------------- mixture build
  /** Balanced corpus mix: downsample every language to the size of the
    * rarest one (the equal-share mixture a multilingual training run
    * starts from), choosing the survivors by the deterministic hash
    * priority. The quota is a one-row aggregate that broadcasts; the
    * per-language pick reuses the [[sampleStratified]] window shape (one
    * shuffle on the stratum key). Output is the per-language mix report:
    * corpus size, quota, kept count, kept chars. */
  val corpusMix: Q = (s, d) => {
    val counts = docs(s, d).groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
    val quota = counts.agg(min(col("n_total")).as("quota"))
    val w = Window.partitionBy(col("lang")).orderBy(prio(col("doc_id")), col("doc_id"))
    val kept = docs(s, d)
      .withColumn("rn", row_number().over(w))
      .crossJoin(broadcast(quota))
      .filter(col("rn") <= col("quota"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
    counts.join(kept, "lang")
      .crossJoin(broadcast(quota))
      .select(col("lang"), col("n_total"), col("quota"), col("n_kept"),
        col("kept_chars"))
      .orderBy(col("lang"))
  }

  /** Temperature-weighted corpus mix (α = 0.5): the mixing rule
    * multilingual training runs actually use — rather than flattening every
    * language to the rarest one's size ([[corpusMix]]), sample language l
    * proportional to n_l^α, which upweights low-resource languages without
    * drowning high-resource ones. quota_l = min(n_l, floor(B · w_l)) with
    * w_l = √n_l / Σ√n_l and budget B = half the corpus.
    *
    * Float exactness across engines: α = 0.5 so the power is `sqrt` —
    * correctly rounded per IEEE-754, bit-identical on any engine (a general
    * `pow` is NOT) — and the denominator Σ√n_l folds LEFT over the
    * lang-sorted count list on both sides, pinning summation order. The
    * quota then derives from exact longs through one fixed formula. The
    * count list is #languages long — a one-row broadcast; the survivor pick
    * is the stratified-window shape, one shuffle on the stratum key. */
  val corpusMixTemperature: Q = (s, d) => {
    val counts = docs(s, d).groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
    val tot = counts.agg(
      sort_array(collect_list(struct(col("lang"), col("n_total")))).as("cs"))
      .select(
        aggregate(col("cs"), lit(0.0), (a, x) => a + sqrt(x.getField("n_total"))).as("denom"),
        aggregate(col("cs"), lit(0L), (a, x) => a + x.getField("n_total")).as("total"))
    val quotas = counts.crossJoin(broadcast(tot))
      .withColumn("weight", sqrt(col("n_total")) / col("denom"))
      .withColumn("quota",
        least(col("n_total"),
          floor(floor(col("total") / lit(2)) * col("weight")).cast(LongType)))
      .select(col("lang"), col("n_total"), col("weight"), col("quota"))
    val w = Window.partitionBy(col("lang")).orderBy(prio(col("doc_id")), col("doc_id"))
    val kept = docs(s, d)
      .withColumn("rn", row_number().over(w))
      .join(broadcast(quotas.select(col("lang"), col("quota"))), "lang")
      .filter(col("rn") <= col("quota"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
    quotas.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_total"), round(col("weight"), 6).as("weight"),
        col("quota"), coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_chars"), lit(0L)).as("kept_chars"))
      .orderBy(col("lang"))
  }

  /** The corpus report card: per (lang, source) document counts, size
    * totals, token totals, and mean length — the first query every curation
    * run executes before and after a filter pass. One two-phase aggregate
    * (map-side partials); the wire carries strata × partials, never rows.
    * Mean derives from exact long totals with one final division. */
  val corpusStats: Q = (s, d) =>
    docs(s, d)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(size(split(col("text"), " ")).cast(LongType)).as("total_words"))
      .select(col("lang"), col("source"), col("n_docs"), col("total_chars"),
        col("total_words"),
        (col("total_chars").cast(DoubleType) / col("n_docs")).as("mean_chars"))
      .orderBy(col("lang"), col("source"))

  // ------------------------------------------------------ Gopher rules
  /** Gopher-style quality rules (Rae et al. 2021, appendix A1.1), the
    * second of the two published keep/drop rule sets ([[qualityFilter]] is
    * the C4 shape): word count in [25, 1000], mean word length in [3, 10],
    * must contain the two corpus stopwords ('the' AND 'a' — the ≥2-distinct-
    * stopwords rule at this corpus's vocabulary), and the most frequent
    * word may claim at most 20% of the document (the repetition rule).
    * Every signal is integer arithmetic — counts and cross-multiplied
    * thresholds — so the verdict is bit-exact on any engine, and the top-
    * word count folds over the row's own SORTED word array (longest equal-
    * adjacent run = max multiplicity, the [[TextOps.textRepetition]]
    * spelling): one codegen'd map-side pass, zero shuffle at any corpus
    * size. Reasons bitmask: 1 = word-count outlier, 2 = word-length
    * outlier, 4 = stopwords missing, 8 = repetition-heavy. */
  val qualityGopher: Q = (s, d) => {
    val ws = split(col("text"), " ")
    val nWords = size(ws).cast(LongType)
    val nonSpace = length(regexp_replace(col("text"), " ", "")).cast(LongType)
    val symbols = length(regexp_replace(col("text"), "[A-Za-z0-9 ]", "")).cast(LongType)
    val alpha = nonSpace - symbols
    // seed prev with ' ' — impossible as a word after splitting on ' ' —
    // so an empty-string word is counted as a run like any other
    val topCnt = expr(
      """aggregate(array_sort(split(text, ' ')), named_struct('prev', ' ', 'run', 0, 'best', 0),
           (acc, w) -> named_struct(
             'prev', w,
             'run', IF(w = acc.prev, acc.run + 1, 1),
             'best', GREATEST(acc.best, IF(w = acc.prev, acc.run + 1, 1))),
           acc -> acc.best)""").cast(LongType)
    val wcOut = nWords < 25 || nWords > 1000
    val wlenOut = alpha < nWords * 3 || alpha > nWords * 10
    val stopMiss = !(array_contains(ws, "the") && array_contains(ws, "a"))
    val repHeavy = topCnt * 5 > nWords
    docs(s, d)
      .select(col("doc_id"), nWords.as("n_words"), topCnt.as("top_word_cnt"),
        (!wcOut && !wlenOut && !stopMiss && !repHeavy).as("keep"),
        (when(wcOut, 1L).otherwise(0L)
          .bitwiseOR(when(wlenOut, 2L).otherwise(0L))
          .bitwiseOR(when(stopMiss, 4L).otherwise(0L))
          .bitwiseOR(when(repHeavy, 8L).otherwise(0L))).as("reasons"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------- end-to-end curation
  /** The end-to-end curation funnel — the composition every training-data
    * run actually executes, as ONE query: raw corpus (benchmark source
    * `src0` excluded) → C4 quality gate ([[qualityFilter]]'s exact integer
    * rules) → exact dedup (keep the lowest-id copy among quality
    * survivors, keyed on the md5 of the CONTENT) → benchmark
    * decontamination (drop docs sharing any word 5-gram with `src0`).
    * Emits the per-stage attrition report (docs + chars surviving each
    * stage) — the number a curation run is judged by.
    *
    * Scale shape: quality flags are map-side; the dedup window shuffles
    * 16-byte content digests + flags, never text; the benchmark shingle
    * set BROADCASTS (it is benchmark-sized) so the corpus-side probe is
    * one map-side scan; the funnel itself is a 4-conditional-count
    * aggregate folded map-side into partials. One corpus shuffle total. */
  val curationPipeline: Q = (s, d) => {
    val nWords = size(split(col("text"), " ")).cast(LongType)
    val nonSpace = length(regexp_replace(col("text"), " ", "")).cast(LongType)
    val symbols = length(regexp_replace(col("text"), "[A-Za-z0-9 ]", "")).cast(LongType)
    val total = length(col("text")).cast(LongType)
    val alpha = nonSpace - symbols
    val q = !(nWords < 30) && !(alpha < nWords * 3 || alpha > nWords * 10) &&
      !(symbols * 10 >= total)

    val base = docs(s, d).filter(col("source") =!= "src0")
    val sh5 = graft.functions.WordShingles.word_shingles(col("text"), 5)
    val bench = docs(s, d).filter(col("source") === "src0")
      .select(explode(sh5).as("sh")).distinct()
    val contam = base.select(col("doc_id"), explode(sh5).as("sh"))
      .join(broadcast(bench), "sh").select(col("doc_id")).distinct()
      .withColumn("contam", lit(true))

    // project text down to its digest BEFORE the dedup exchange
    val wC = Window.partitionBy(col("ck"))
    val flagged = base
      .select(col("doc_id"), col("n_chars"), md5(col("text")).as("ck"), q.as("q"))
      .withColumn("first_q", min(when(col("q"), col("doc_id"))).over(wC))
      .withColumn("keep2", col("q") && col("doc_id") === col("first_q"))
      .join(contam, Seq("doc_id"), "left")
      .withColumn("keep3", col("keep2") && col("contam").isNull)

    flagged
      .agg(
        count(lit(1)).as("n0"), coalesce(sum(col("n_chars")), lit(0L)).as("c0"),
        count(when(col("q"), lit(1))).as("n1"),
        coalesce(sum(when(col("q"), col("n_chars"))), lit(0L)).as("c1"),
        count(when(col("keep2"), lit(1))).as("n2"),
        coalesce(sum(when(col("keep2"), col("n_chars"))), lit(0L)).as("c2"),
        count(when(col("keep3"), lit(1))).as("n3"),
        coalesce(sum(when(col("keep3"), col("n_chars"))), lit(0L)).as("c3"))
      .selectExpr(
        """stack(4,
             0L, 'raw',            n0, c0,
             1L, 'quality',        n1, c1,
             2L, 'dedup',          n2, c2,
             3L, 'decontaminated', n3, c3) AS (stage, stage_name, n_docs, total_chars)""")
      .orderBy(col("stage"))
  }

  // ------------------------------------------------- token-budget sample
  /** Deterministic token-budget sample: the first documents in the
    * deterministic hash-priority order whose cumulative BPE-token count
    * stays under the budget (a doc is kept when the tokens BEFORE it are
    * under budget — the greedy take real eval/calibration subsets use, so
    * the budget is always reached, never undershot). The prefix sum is the
    * scalable two-phase spelling: range-partition on the priority order,
    * per-partition running sums in parallel windows, then a partition-
    * offset table (#partitions rows, broadcast back) — no global single-
    * partition window ever sees the corpus, so the shape survives 100 TB.
    * The boundary placement cannot affect results: (priority, doc_id) is a
    * total order and prefix sums are cut-point-invariant. */
  val sampleTokenBudget: Q = (s, d) => {
    val budget = 10000L
    val tok = graft.functions.BpeTable.bpe_token_count(col("text")).cast(LongType)
    val base = docs(s, d)
      .select(col("doc_id"), prio(col("doc_id")).as("pri"), tok.as("tok"))
      .repartitionByRange(32, col("pri"), col("doc_id"))
      .withColumn("part", spark_partition_id())
    val wIn = Window.partitionBy(col("part")).orderBy(col("pri"), col("doc_id"))
    val local = base.withColumn("cum_in", sum(col("tok")).over(wIn))
    // offsets: one row per partition — the single-partition window below
    // touches #partitions rows, never corpus rows
    val wOff = Window.orderBy(col("part")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("part")).agg(sum(col("tok")).as("part_tok"))
      .withColumn("offset", coalesce(sum(col("part_tok")).over(wOff), lit(0L)))
      .select(col("part"), col("offset"))
    local.join(broadcast(offsets), "part")
      .withColumn("cum_tokens", col("cum_in") + col("offset"))
      .filter(col("cum_tokens") - col("tok") < budget)
      .select(col("doc_id"), col("tok"), col("cum_tokens"))
      .orderBy(col("cum_tokens"))
  }

  /** Language-mix audit by source: per (source, language) document counts
    * with each language's share WITHIN its source and the lift of that
    * share against the corpus-wide language share — the mix-drift readout
    * a corpus owner checks when a new crawl source lands (a source whose
    * language lift is far from 1 will move the trained model's language
    * balance; this table is what the [[corpusMix]] reweighting is tuned
    * against). One corpus-sized grouped count; the share/lift arithmetic
    * runs over the sources×languages counts table (audit-sized), where
    * the global/marginal sums are window folds and both floats divide
    * exact longs once, identical formula text in the oracle. */
  val corpusLangMix: Q = (s, d) => {
    val c = docs(s, d).groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
    c.withColumn("src_n", sum(col("n")).over(Window.partitionBy(col("source"))))
      .withColumn("lang_n", sum(col("n")).over(Window.partitionBy(col("lang"))))
      // empty-frame window: fine here BECAUSE the input is the bounded
      // counts table, not the corpus — the single-partition fold sees
      // sources×languages rows
      .withColumn("tot_n", sum(col("n")).over(Window.partitionBy()))
      .select(col("source"), col("lang"), col("n"),
        round(col("n").cast(DoubleType) / col("src_n").cast(DoubleType), 6)
          .as("share_in_source"),
        // widen BEFORE multiplying: n · tot_n as int64 overflows past
        // ~1e9-1e10 documents (Spark would wrap silently while the oracle
        // raises — an engine-divergence) — the repo-wide widen-first rule
        round((col("n").cast(DoubleType) * col("tot_n").cast(DoubleType)) /
          (col("src_n").cast(DoubleType) * col("lang_n").cast(DoubleType)), 6)
          .as("lift"))
      .orderBy(col("source"), col("lang"))
  }

  /** Per-language length deciles: each language's documents rank into 10
    * equal-count buckets by (n_chars, doc_id) and every bucket reports its
    * size and char-length span — the length-cutoff calibration a quality
    * filter reads before choosing min/max-length thresholds per language
    * (a single global cutoff over-trims terse scripts and under-trims
    * verbose ones). The ntile ties break on doc_id, so bucket membership
    * is total-order deterministic and the oracle replays it. Scale note:
    * the window sorts WITHIN each language — at corpus scale that is a
    * range-partitioned sort per language (Spark plans one exchange keyed
    * on lang), and a language's documents never colocate beyond their
    * sort range; for an approximate audit at extreme scale the same shape
    * runs on approx_percentile, but the exact decile bounds are what a
    * reproducible threshold needs. */
  val qualityLengthDist: Q = (s, d) => {
    val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
    docs(s, d)
      .select(col("lang"), col("n_chars"), col("doc_id"))
      .withColumn("decile", ntile(10).over(w).cast(LongType))
      .groupBy(col("lang"), col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"), col("decile"))
  }

  /** CCNet-style perplexity terciles: every language's documents split
    * into head / middle / tail by per-document cross-entropy under the
    * corpus unigram LM — the canonical "keep the head, drop the tail"
    * quality gate of web-corpus curation (CCNet buckets by Wikipedia-LM
    * perplexity; the model-free unigram prior here is this repo's
    * [[AnalyticsOps.textPerplexity]] statistic). Exactness: the per-doc
    * score reuses the perplexity recipe verbatim (one `round(ln c_w, 6)`
    * per distinct count, DECIMAL sums, ONE float at the end, quantized to
    * 6 decimals) so both engines order documents identically — the tercile
    * boundary cannot drift on float noise — and the tie-break is doc_id.
    *
    * Scale: token occurrences collapse map-side; the vocabulary join keys
    * on the word's PolyHash int64. The per-language ntile window is the
    * oracle-checked reference spelling — languages are few, so at 100 TB
    * the window's per-language sort is the bottleneck and the production
    * path computes the two tercile cut points with approx percentiles
    * (or the exact two-pass count/offset select) and buckets by
    * broadcast-compare instead; semantics identical up to boundary ties. */
  val qualityPplBuckets: Q = (s, d) => {
    val occ = docs(s, d)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("word"))
      .select(col("doc_id"), col("lang"),
        graft.functions.PolyHash.poly_hash(col("word")).as("th"))
    val perDoc = occ.groupBy(col("doc_id"), col("lang"), col("th"))
      .agg(count(lit(1)).as("c_dw"))
    val cw = perDoc.groupBy(col("th")).agg(sum(col("c_dw")).as("cw"))
    val tot = cw.agg(sum(col("cw")).as("n_total"))
    val term = round(log(col("cw").cast(DoubleType)), 6).cast(DecimalType(18, 6))
    val ce = perDoc.join(cw, "th")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c_dw")).as("n_words"),
        sum(term * col("c_dw")).as("sce"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("lang"), col("n_words"),
        round(log(col("n_total").cast(DoubleType))
          - col("sce").cast(DoubleType) / col("n_words"), 6).as("ce"))
    val w = Window.partitionBy(col("lang")).orderBy(col("ce"), col("doc_id"))
    ce.withColumn("t", ntile(3).over(w))
      .select(col("lang"),
        when(col("t") === 1, "1_head").when(col("t") === 2, "2_middle")
          .otherwise("3_tail").as("bucket"),
        col("n_words"), col("ce"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        min(col("ce")).as("min_ce"),
        max(col("ce")).as("max_ce"),
        sum(col("ce").cast(DecimalType(18, 6))).as("sce"))
      .select(col("lang"), col("bucket"), col("n_docs"), col("n_words"),
        col("min_ce"), col("max_ce"),
        round(col("sce").cast(DoubleType) / col("n_docs"), 6).as("mean_ce"))
      .orderBy(col("lang"), col("bucket"))
  }

  // ----------------------------------------------------------- sharding
  /** Shard count for [[shardExport]] — at 100 TB this is the scale knob
    * (shards ∝ corpus / target-file-size), like [[packShards]]. */
  val exportShards = 64

  /** Deterministic training-shard manifest: every document is assigned a
    * shard by the same hash priority the samplers use, and the query emits
    * the per-shard manifest row a shard writer publishes next to its files
    * (doc count, BPE-token count, char count, doc-id range). Assignment is
    * a pure map-side expression — the actual export is then ONE
    * `write.partitionBy(shard_id)` whose files are reproducible across
    * runs, engines, and cluster shapes because shard membership depends
    * only on doc_id. The aggregate is [[exportShards]] rows regardless of
    * corpus size; min/max ride the same partial aggregation as the sums. */
  val shardExport: Q = (s, d) => {
    val tok = graft.functions.BpeTable.bpe_token_count(col("text")).cast(LongType)
    docs(s, d)
      .select((prio(col("doc_id")) % exportShards).as("shard_id"),
        col("doc_id"), col("n_chars"), tok.as("tok"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("shard_id"))
  }

  /** Dataset-version diff — the audit a pipeline publishes when a corpus
    * snapshot is rebuilt: per-class counts (added / removed / changed /
    * unchanged) and the char volume entering and leaving. The v2 snapshot
    * is derived deterministically from v1 so the oracle replays it:
    * doc_id ≡ 0 (mod 13) dropped, doc_id ≡ 0 (mod 11) re-crawled with a
    * marker suffix, doc_id ≡ 0 (mod 17) duplicated as NEW ids (shifted by
    * 10^12, past any real id).
    *
    * 100 TB shape: text is digested map-side (16-byte md5) and projected
    * away BEFORE the exchange, so the full-outer id join moves (id,
    * digest, n_chars) — never document bodies; the classification is one
    * row-level CASE and the report a one-row aggregate. Change detection
    * by digest is exact up to collision (2^-64-class) and is what makes
    * the diff affordable: comparing bodies would double-scan the corpus
    * through the shuffle. */
  val corpusVersionDiff: Q = (s, d) => {
    val v1 = docs(s, d)
    val v2 = v1.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" recrawl")))
          .otherwise(col("text")).as("text"))
      .unionAll(v1.filter(col("doc_id") % 17 === 0)
        .select(col("doc_id") + lit(1000000000000L), col("text")))
    def sig(df: DataFrame): DataFrame =
      df.select(col("doc_id"), md5(col("text")).as("dig"),
        length(col("text")).cast(LongType).as("nc"))
    val j = sig(v1).select(col("doc_id"), col("dig").as("d1"), col("nc").as("c1"))
      .join(sig(v2).select(col("doc_id"), col("dig").as("d2"), col("nc").as("c2")),
        Seq("doc_id"), "full_outer")
    j.select(
        when(col("d1").isNull, "added")
          .when(col("d2").isNull, "removed")
          .when(col("d1") === col("d2"), "unchanged")
          .otherwise("changed").as("cls"),
        coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c2"), lit(0L)).as("c2"))
      .agg(
        count(lit(1)).as("n_docs_union"),
        count(when(col("cls") === "added", lit(1))).as("n_added"),
        count(when(col("cls") === "removed", lit(1))).as("n_removed"),
        count(when(col("cls") === "changed", lit(1))).as("n_changed"),
        count(when(col("cls") === "unchanged", lit(1))).as("n_unchanged"),
        sum(when(col("cls") === "added", col("c2")).otherwise(0L)).as("chars_added"),
        sum(when(col("cls") === "removed", col("c1")).otherwise(0L)).as("chars_removed"),
        sum(when(col("cls") === "changed", col("c2") - col("c1")).otherwise(0L))
          .as("chars_delta_changed"))
  }

  val queries: Map[String, Q] = Map(
    "corpus_version_diff" -> corpusVersionDiff,
    "compact_cluster" -> compactCluster,
    "layout_zorder" -> layoutZorder,
    "corpus_stats" -> corpusStats,
    "sample_hash" -> sampleHash,
    "sample_weighted" -> sampleWeighted,
    "corpus_bootstrap_ci" -> corpusBootstrapCi,
    "corpus_length_model" -> corpusLengthModel,
    "sample_stratified" -> sampleStratified,
    "agg_histogram" -> aggHistogram,
    "pack_sequences" -> packSequences,
    "decontaminate" -> decontaminate,
    "quality_filter" -> qualityFilter,
    "sim_search_range" -> simSearchRange,
    "split_dataset" -> splitDataset,
    "corpus_mix" -> corpusMix,
    "quality_gopher" -> qualityGopher,
    "quality_length_dist" -> qualityLengthDist,
    "quality_ppl_buckets" -> qualityPplBuckets,
    "corpus_lang_mix" -> corpusLangMix,
    "curation_pipeline" -> curationPipeline,
    "sample_token_budget" -> sampleTokenBudget,
    "corpus_mix_temperature" -> corpusMixTemperature,
    "shard_export" -> shardExport,
  )

  /** Word 5-gram shingle CTE (DuckDB replay of [[graft.functions.WordShingles]]
    * with k = 5, incl. the whole-text fallback for short docs). */
  private val sh5Cte: String =
    """sh5 AS (
         SELECT doc_id, source,
           CASE WHEN len(string_split(text,' ')) >= 5 THEN
             list_distinct([array_to_string(string_split(text,' ')[i:i+4], ' ')
                            FOR i IN range(1, len(string_split(text,' ')) - 3)])
           ELSE [text] END AS sh
         FROM documents)"""

  val oracle: Map[String, String] = Map(
    "corpus_version_diff" ->
      """WITH v2 AS (
           SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN text || ' recrawl' ELSE text END AS text
           FROM documents WHERE doc_id % 13 != 0
           UNION ALL
           SELECT doc_id + 1000000000000, text FROM documents WHERE doc_id % 17 = 0),
         j AS (
           SELECT
             CASE WHEN a.doc_id IS NULL THEN 'added'
                  WHEN b.doc_id IS NULL THEN 'removed'
                  WHEN a.text = b.text THEN 'unchanged'
                  ELSE 'changed' END AS cls,
             COALESCE(length(a.text), 0) AS c1,
             COALESCE(length(b.text), 0) AS c2
           FROM documents a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_union,
           CAST(COUNT(*) FILTER (WHERE cls = 'added') AS BIGINT) AS n_added,
           CAST(COUNT(*) FILTER (WHERE cls = 'removed') AS BIGINT) AS n_removed,
           CAST(COUNT(*) FILTER (WHERE cls = 'changed') AS BIGINT) AS n_changed,
           CAST(COUNT(*) FILTER (WHERE cls = 'unchanged') AS BIGINT) AS n_unchanged,
           CAST(SUM(CASE WHEN cls = 'added' THEN c2 ELSE 0 END) AS BIGINT)
             AS chars_added,
           CAST(SUM(CASE WHEN cls = 'removed' THEN c1 ELSE 0 END) AS BIGINT)
             AS chars_removed,
           CAST(SUM(CASE WHEN cls = 'changed' THEN c2 - c1 ELSE 0 END) AS BIGINT)
             AS chars_delta_changed
         FROM j""",
    "corpus_lang_mix" ->
      """WITH c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
                    FROM documents GROUP BY 1, 2),
         t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM c),
         s AS (SELECT source, CAST(SUM(n) AS BIGINT) AS s_n FROM c GROUP BY source),
         l AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS l_n FROM c GROUP BY lang)
         SELECT c.source, c.lang, c.n,
           round(CAST(c.n AS DOUBLE) / CAST(s.s_n AS DOUBLE), 6)
             AS share_in_source,
           round((CAST(c.n AS DOUBLE) * CAST(t.tot AS DOUBLE)) /
                 (CAST(s.s_n AS DOUBLE) * CAST(l.l_n AS DOUBLE)), 6)
             AS lift
         FROM c JOIN s USING (source) JOIN l USING (lang) CROSS JOIN t
         ORDER BY source, lang""",
    "quality_ppl_buckets" ->
      s"""WITH occ AS (
           SELECT doc_id, lang, ${graft.functions.PolyHash.duckSql("word")} AS th
           FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
                 FROM documents)),
         per_doc AS (
           SELECT doc_id, lang, th, COUNT(*) AS c_dw
           FROM occ GROUP BY doc_id, lang, th),
         cw AS (SELECT th, CAST(SUM(c_dw) AS BIGINT) AS cw
                FROM per_doc GROUP BY th),
         tot AS (SELECT CAST(SUM(cw) AS BIGINT) AS n_total FROM cw),
         ce AS (
           SELECT p.doc_id, p.lang, CAST(SUM(p.c_dw) AS BIGINT) AS n_words,
             round(ln(CAST((SELECT n_total FROM tot) AS DOUBLE))
               - CAST(SUM(CAST(round(ln(CAST(c.cw AS DOUBLE)), 6)
                   AS DECIMAL(18,6)) * p.c_dw) AS DOUBLE)
                 / CAST(SUM(p.c_dw) AS BIGINT), 6) AS ce
           FROM per_doc p JOIN cw c USING (th) GROUP BY p.doc_id, p.lang),
         bk AS (
           SELECT lang, n_words, ce,
             CASE ntile(3) OVER (PARTITION BY lang ORDER BY ce, doc_id)
               WHEN 1 THEN '1_head' WHEN 2 THEN '2_middle'
               ELSE '3_tail' END AS bucket
           FROM ce)
         SELECT lang, bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           MIN(ce) AS min_ce, MAX(ce) AS max_ce,
           round(CAST(SUM(CAST(ce AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
             AS mean_ce
         FROM bk GROUP BY lang, bucket ORDER BY lang, bucket""",
    "quality_length_dist" ->
      """SELECT lang, CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
         FROM (SELECT lang, n_chars,
                 ntile(10) OVER (PARTITION BY lang
                                 ORDER BY n_chars, doc_id) AS decile
               FROM documents)
         GROUP BY lang, decile ORDER BY lang, decile""",
    // content-neutrality: the clustered rewrite must return the table bit-same
    "compact_cluster" ->
      """SELECT * FROM lineitem
         ORDER BY l_shipdate, l_orderkey, l_linenumber""",
    // same normalize-interleave-bucket integer arithmetic, unrolled
    "layout_zorder" -> {
      val interleave = (0 until 16).map(b =>
        s"(((p16 >> $b) & 1) << ${2 * b}) | (((s16 >> $b) & 1) << ${2 * b + 1})")
        .mkString("(", " | ", ")")
      s"""WITH b AS (SELECT MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
                      MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax FROM lineitem),
         n AS (SELECT l_partkey, l_suppkey,
                 (l_partkey - pmin) * 65535 // GREATEST(pmax - pmin, 1) AS p16,
                 (l_suppkey - smin) * 65535 // GREATEST(smax - smin, 1) AS s16
               FROM lineitem CROSS JOIN b),
         z AS (SELECT l_partkey, l_suppkey,
                 CAST($interleave >> 26 AS INT) AS bucket FROM n)
         SELECT bucket, COUNT(*) AS n_rows,
           MIN(l_partkey) AS p_min, MAX(l_partkey) AS p_max,
           MIN(l_suppkey) AS s_min, MAX(l_suppkey) AS s_max
         FROM z GROUP BY bucket ORDER BY bucket"""
    },
    "corpus_stats" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_words,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars
         FROM documents GROUP BY lang, source ORDER BY lang, source""",
    "sample_hash" ->
      s"""SELECT doc_id, lang, source, n_chars FROM documents
         WHERE ($prioSql) % 100 < 10
         ORDER BY doc_id""",
    "corpus_length_model" ->
      """WITH q AS (
           SELECT lang,
             CAST(round(ln(n_chars), 6) AS DECIMAL(18,6)) AS x
           FROM documents),
         m AS (
           SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             SUM(x) AS sx, SUM(x * x) AS sxx
           FROM q GROUP BY lang)
         SELECT lang, n_docs,
           round(CAST(sx AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS mu_ln,
           round(sqrt((CAST(n_docs AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / (CAST(n_docs AS DOUBLE) * CAST(n_docs - 1 AS DOUBLE))), 6)
             AS sigma_ln
         FROM m ORDER BY lang""",
    "corpus_bootstrap_ci" -> {
      val hash = graft.functions.PolyHash.duckSql(
        "CAST(b AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")
      s"""WITH bt AS (SELECT CAST(unnest(generate_series(0,
             ${bootstrapReplicas - 1})) AS BIGINT) AS b),
         e AS (
           SELECT bt.b, d.n_chars,
             CAST(($hash) AS DOUBLE) / ${P.toDouble} AS u
           FROM documents d CROSS JOIN bt),
         m AS (
           SELECT b, n_chars,
             CASE WHEN u < 0.367879441 THEN 0 WHEN u < 0.735758882 THEN 1
                  WHEN u < 0.919698603 THEN 2 WHEN u < 0.981011843 THEN 3
                  ELSE 4 END AS m
           FROM e),
         reps AS (
           SELECT b, CAST(SUM(m) AS BIGINT) AS n,
             CAST(SUM(m * n_chars) AS BIGINT) AS s
           FROM m GROUP BY b),
         rm AS (SELECT b, round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6)
                  AS mean_b FROM reps),
         rk AS (SELECT mean_b, ROW_NUMBER() OVER (ORDER BY mean_b, b) AS rn
                FROM rm),
         base AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             round(CAST(SUM(n_chars) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), 6) AS mean_len
           FROM documents)
         SELECT base.n_docs, base.mean_len,
           (SELECT mean_b FROM rk WHERE rn = 5) AS ci_lo,
           (SELECT mean_b FROM rk WHERE rn = 95) AS ci_hi,
           CAST($bootstrapReplicas AS BIGINT) AS b_replicas
         FROM base"""
    },
    "sample_weighted" ->
      s"""SELECT doc_id, lang, n_chars,
           round(CAST(n_chars AS DOUBLE) * ${P + 1} / (($prioSql) + 1), 6)
             AS priority
         FROM documents
         ORDER BY priority DESC, doc_id LIMIT 50""",
    "sample_stratified" ->
      s"""SELECT lang, doc_id, rn FROM (
           SELECT lang, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY $prioSql, doc_id) AS rn
           FROM documents)
         WHERE rn <= 20 ORDER BY lang, rn""",
    "agg_histogram" ->
      """SELECT CAST(FLOOR(n_chars / 100) * 100 AS BIGINT) AS bin_lo,
           COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
         FROM documents GROUP BY 1 ORDER BY 1""",
    "pack_sequences" ->
      s"""WITH t AS (
           SELECT lang, ($prioSql) % $packShards AS shard, doc_id,
                  ${graft.functions.BpeTable.duckCountSql("text")} AS tok,
                  $prioSql AS pri
           FROM documents),
         c AS (
           SELECT lang, shard, doc_id, tok,
             SUM(tok) OVER (PARTITION BY lang, shard ORDER BY pri, doc_id) - tok AS cum_before
           FROM t)
         SELECT lang, shard, CAST(FLOOR(cum_before / 2048) AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS n_tokens
         FROM c GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "quality_filter" ->
      """WITH m AS (
           SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(length(regexp_replace(text, ' ', '', 'g')) AS BIGINT)
               - CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS alpha,
             CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS symbols,
             CAST(length(text) AS BIGINT) AS total
           FROM documents)
         SELECT doc_id, n_words,
           (NOT (n_words < 30) AND NOT (alpha < n_words * 3 OR alpha > n_words * 10)
            AND NOT (symbols * 10 >= total)) AS keep,
           ((CASE WHEN n_words < 30 THEN 1 ELSE 0 END)
            | (CASE WHEN alpha < n_words * 3 OR alpha > n_words * 10 THEN 2 ELSE 0 END)
            | (CASE WHEN symbols * 10 >= total THEN 4 ELSE 0 END))::BIGINT AS reasons
         FROM m ORDER BY doc_id""",
    "decontaminate" ->
      s"""WITH $sh5Cte,
         corpus AS (SELECT doc_id, unnest(sh) AS s FROM sh5 WHERE source <> 'src0'),
         bench AS (SELECT DISTINCT unnest(sh) AS s FROM sh5 WHERE source = 'src0')
         SELECT c.doc_id, COUNT(DISTINCT c.s) AS n_shared
         FROM corpus c JOIN bench b ON b.s = c.s
         GROUP BY c.doc_id ORDER BY c.doc_id""",
    "split_dataset" -> {
      val h = s"(${graft.functions.PolyHash.duckSql("md5(text)")}) % 100"
      s"""SELECT doc_id,
           CASE WHEN $h < 80 THEN 'train'
                WHEN $h < 90 THEN 'valid'
                ELSE 'test' END AS split,
           n_chars
         FROM documents ORDER BY doc_id"""
    },
    "corpus_mix" ->
      s"""WITH cnt AS (SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang),
         q AS (SELECT MIN(n_total) AS quota FROM cnt),
         rk AS (
           SELECT lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY $prioSql, doc_id) AS rn
           FROM documents),
         kept AS (
           SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS kept_chars
           FROM rk, q WHERE rn <= quota GROUP BY lang)
         SELECT c.lang, c.n_total, (SELECT quota FROM q) AS quota,
           k.n_kept, k.kept_chars
         FROM cnt c JOIN kept k USING (lang) ORDER BY c.lang""",
    "corpus_mix_temperature" ->
      s"""WITH cnt AS (SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang),
         agg AS (
           SELECT
             list_reduce(list_prepend(0.0::DOUBLE,
               list(sqrt(n_total) ORDER BY lang)), (a, b) -> a + b) AS denom,
             CAST(SUM(n_total) AS BIGINT) AS total
           FROM cnt),
         q AS (
           SELECT c.lang, c.n_total,
             sqrt(c.n_total) / a.denom AS weight,
             LEAST(c.n_total,
               CAST(FLOOR(FLOOR(a.total / 2) * (sqrt(c.n_total) / a.denom)) AS BIGINT)) AS quota
           FROM cnt c, agg a),
         rk AS (
           SELECT lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY $prioSql, doc_id) AS rn
           FROM documents),
         kept AS (
           SELECT r.lang, COUNT(*) AS n_kept, CAST(SUM(r.n_chars) AS BIGINT) AS kept_chars
           FROM rk r JOIN q ON q.lang = r.lang
           WHERE r.rn <= q.quota GROUP BY r.lang)
         SELECT q.lang, q.n_total, round(q.weight, 6) AS weight, q.quota,
           COALESCE(k.n_kept, 0) AS n_kept, COALESCE(k.kept_chars, 0) AS kept_chars
         FROM q LEFT JOIN kept k ON k.lang = q.lang ORDER BY q.lang""",
    "quality_gopher" ->
      """WITH m AS (
           SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(length(regexp_replace(text, ' ', '', 'g')) AS BIGINT)
               - CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS alpha,
             list_contains(string_split(text, ' '), 'the')
               AND list_contains(string_split(text, ' '), 'a') AS has_stop
           FROM documents),
         top AS (
           SELECT doc_id, MAX(cnt) AS top_cnt FROM (
             SELECT doc_id, word, COUNT(*) AS cnt
             FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
             GROUP BY doc_id, word)
           GROUP BY doc_id)
         SELECT m.doc_id, m.n_words, CAST(t.top_cnt AS BIGINT) AS top_word_cnt,
           (NOT (n_words < 25 OR n_words > 1000)
            AND NOT (alpha < n_words * 3 OR alpha > n_words * 10)
            AND has_stop AND NOT (t.top_cnt * 5 > n_words)) AS keep,
           ((CASE WHEN n_words < 25 OR n_words > 1000 THEN 1 ELSE 0 END)
            | (CASE WHEN alpha < n_words * 3 OR alpha > n_words * 10 THEN 2 ELSE 0 END)
            | (CASE WHEN NOT has_stop THEN 4 ELSE 0 END)
            | (CASE WHEN t.top_cnt * 5 > n_words THEN 8 ELSE 0 END))::BIGINT AS reasons
         FROM m JOIN top t ON m.doc_id = t.doc_id ORDER BY m.doc_id""",
    "curation_pipeline" ->
      s"""WITH $sh5Cte,
         m AS (
           SELECT doc_id, text, n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(length(regexp_replace(text, ' ', '', 'g')) AS BIGINT)
               - CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS alpha,
             CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS symbols,
             CAST(length(text) AS BIGINT) AS total
           FROM documents WHERE source <> 'src0'),
         f AS (
           SELECT doc_id, text, n_chars,
             (NOT (n_words < 30) AND NOT (alpha < n_words * 3 OR alpha > n_words * 10)
              AND NOT (symbols * 10 >= total)) AS q
           FROM m),
         fq AS (
           SELECT *, MIN(CASE WHEN q THEN doc_id END)
             OVER (PARTITION BY md5(text)) AS first_q
           FROM f),
         contam AS (
           SELECT DISTINCT c.doc_id
           FROM (SELECT doc_id, unnest(sh) AS s FROM sh5 WHERE source <> 'src0') c
           JOIN (SELECT DISTINCT unnest(sh) AS s FROM sh5 WHERE source = 'src0') b
             ON b.s = c.s),
         g AS (
           SELECT doc_id, n_chars, q,
             (q AND doc_id = first_q) AS keep2,
             (q AND doc_id = first_q
              AND doc_id NOT IN (SELECT doc_id FROM contam)) AS keep3
           FROM fq)
         SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS stage_name,
           COUNT(*) AS n_docs, COALESCE(CAST(SUM(n_chars) AS BIGINT), 0) AS total_chars FROM g
         UNION ALL SELECT 1, 'quality', COUNT(*),
           COALESCE(CAST(SUM(n_chars) AS BIGINT), 0) FROM g WHERE q
         UNION ALL SELECT 2, 'dedup', COUNT(*),
           COALESCE(CAST(SUM(n_chars) AS BIGINT), 0) FROM g WHERE keep2
         UNION ALL SELECT 3, 'decontaminated', COUNT(*),
           COALESCE(CAST(SUM(n_chars) AS BIGINT), 0) FROM g WHERE keep3
         ORDER BY stage""",
    "sample_token_budget" ->
      s"""WITH t AS (
           SELECT doc_id, $prioSql AS pri,
             ${graft.functions.BpeTable.duckCountSql("text")} AS tok
           FROM documents),
         c AS (
           SELECT doc_id, tok,
             SUM(tok) OVER (ORDER BY pri, doc_id ROWS UNBOUNDED PRECEDING) AS cum_tokens
           FROM t)
         SELECT doc_id, CAST(tok AS BIGINT) AS tok,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
         FROM c WHERE cum_tokens - tok < 10000 ORDER BY cum_tokens""",
    "sim_search_range" ->
      """WITH q AS (
           SELECT unnest(embedding) AS qv, generate_subscripts(embedding, 1) AS i
           FROM embeddings WHERE vec_id = 0),
         qn AS (SELECT SQRT(SUM(CAST(qv AS DOUBLE) * CAST(qv AS DOUBLE))) AS n FROM q),
         flat AS (
           SELECT vec_id, label, unnest(embedding) AS val,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings WHERE vec_id <> 0),
         scored AS (
           SELECT f.vec_id, ANY_VALUE(f.label) AS label,
             ROUND(SUM(CAST(f.val AS DOUBLE) * CAST(q.qv AS DOUBLE)) /
               ((SELECT n FROM qn) * SQRT(SUM(CAST(f.val AS DOUBLE) * CAST(f.val AS DOUBLE)))), 6) AS score
           FROM flat f JOIN q ON f.i = q.i
           GROUP BY f.vec_id)
         SELECT vec_id, label, score FROM scored
         WHERE score >= 0.2 ORDER BY score DESC, vec_id""",
    "shard_export" ->
      s"""SELECT ($prioSql) % $exportShards AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(${graft.functions.BpeTable.duckCountSql("text")}) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
         FROM documents GROUP BY 1 ORDER BY 1""",
  )
}
