package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.{Limits, Tables}
import graft.plans.Checkpoints.SweepSyntax

/** Product-analytics + language-model-statistics operators: the query
  * shapes a reference user runs against an events table (funnels, cohort
  * retention) and a corpus table (n-gram language-model counts, boilerplate
  * detection) — all exact-integer or single-division arithmetic so the
  * DuckDB oracles compare hash-exact.
  */
object AnalyticsOps {
  type Q = (SparkSession, String) => DataFrame

  private def events(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "events")
  private def docs(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "documents")

  /** Ordered conversion funnel view → click → purchase: a user converts at
    * stage k only with an event strictly after their stage-(k-1) time.
    * Three per-user min-aggregates chained by user-key joins — every join
    * keys on user_id, so at scale the three stages reuse one hash
    * partitioning (no broadcast needed: both sides are per-user aggregates,
    * a sliver of the event volume). Output: one row per stage with the
    * surviving-user count. */
  val eventsFunnel: Q = (s, d) => {
    val e = events(s, d)
    val t1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = e.filter(col("event_type") === "click")
      .join(t1, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val t3 = e.filter(col("event_type") === "purchase")
      .join(t2, "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val stages = Seq("1_view" -> t1, "2_click" -> t2, "3_purchase" -> t3)
    stages.map { case (name, df) =>
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
    }.reduce(_ unionAll _).orderBy(col("stage"))
  }

  /** Weekly cohort retention: users grouped by the week of their first
    * event; each cell counts the cohort's users active k weeks later. Two
    * aggregates (first-seen per user, distinct active weeks per user) joined
    * on user_id, then one count per (cohort, offset) — the matrix is
    * O(weeks²) rows regardless of event volume. Integer week arithmetic
    * (both engines truncate weeks to Mondays and divide day-diffs by 7
    * exactly). */
  val retentionCohort: Q = (s, d) => {
    val e = events(s, d)
    val firsts = e.groupBy(col("user_id"))
      .agg(to_date(date_trunc("week", min(col("ts")))).as("cohort_week"))
    val active = e.select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
      .distinct()
    active.join(firsts, "user_id")
      .select(col("cohort_week"),
        expr("CAST(datediff(wk, cohort_week) div 7 AS BIGINT)").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Trigram language-model counts: the 20 most frequent word trigrams with
    * their conditional probability P(w3 | w1 w2) = c(w1w2w3) / Σ_w c(w1w2w).
    * The context count is a window sum over the trigram count table — the
    * corpus explodes once, aggregates once, and the window only sees
    * distinct trigrams (vocabulary-bounded, a sliver of the token volume).
    * Probability is a single double division rounded to 6, identical in
    * both engines. */
  /** The distinct-trigram count fold — extracted so PlanSpec can pin its
    * physical shape (the pin in [[lmTrigram]] truncates it out of the final
    * explain): one explode pass, map-side partials, the count exchange on
    * the three int64 PolyHash keys. */
  private[graft] def lmTrigramCounts(s: SparkSession, d: String): DataFrame = {
    val tri = docs(s, d)
      .select(split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(explode(expr(
        """transform(sequence(1, size(w) - 2),
             i -> named_struct('w1', element_at(w, i),
                               'w2', element_at(w, i + 1),
                               'w3', element_at(w, i + 2)))""")).as("t"))
      .select(col("t.w1"), col("t.w2"), col("t.w3"))
      // group and window on PolyHash int64 keys: the count exchange and the
      // context-window exchange both hash/compare 24 bytes of longs instead
      // of three variable-length strings (the words survive as MIN
      // aggregates, collapsed map-side to one value per distinct key — on a
      // collision both engines merge the same groups since the oracle
      // replays the hash)
      .select(col("w1"), col("w2"), col("w3"),
        graft.functions.PolyHash.poly_hash(col("w1")).as("h1"),
        graft.functions.PolyHash.poly_hash(col("w2")).as("h2"),
        graft.functions.PolyHash.poly_hash(col("w3")).as("h3"))
      .groupBy(col("h1"), col("h2"), col("h3"))
      .agg(min(col("w1")).as("w1"), min(col("w2")).as("w2"),
        min(col("w3")).as("w3"), count(lit(1)).as("c3"))
    tri
  }

  val lmTrigram: Q = (s, d) => {
    // Top-20 FIRST, context sums only for the 20 surviving (h1,h2) pairs
    // (round 16, guide §1.2 — don't compute what you throw away): the old
    // spelling annotated EVERY distinct trigram with an (h1,h2)-window
    // context sum (a full vocabulary³-sized exchange + sort) to keep 20
    // rows. Now the distinct-trigram fold pins once, the global top-20 is
    // a TakeOrdered heap over the pin, and ctx is a pin rescan filtered
    // map-side by the 20 winners' contexts (a 20-row broadcast semi-join)
    // into a ≤20-group aggregate — the filtered sum over all trigrams
    // sharing a winner's (h1,h2) is by definition the window value those
    // rows carried. No vocabulary-sized exchange after the count fold.
    val triP = lmTrigramCounts(s, d).sweepPin()
    val top = triP
      .orderBy(col("c3").desc, col("w1"), col("w2"), col("w3"))
      .limit(20)
      .sweepPin()
    val ctx = triP
      .join(broadcast(top.select(col("h1"), col("h2")).distinct()),
        Seq("h1", "h2"), "left_semi")
      .groupBy(col("h1"), col("h2")).agg(sum(col("c3")).as("ctx"))
    top
      .join(broadcast(ctx), Seq("h1", "h2"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("c3").desc, col("w1"), col("w2"), col("w3"))))
      .select(col("rn").cast(LongType).as("rn"), col("w1"), col("w2"), col("w3"),
        col("c3"), col("ctx"),
        round(col("c3").cast(DoubleType) / col("ctx"), 6).as("p"))
      .orderBy(col("rn"))
  }

  /** Conditional bigram entropy per language — H(next word | current
    * word) in nats, the predictability statistic that separates natural
    * prose (high conditional entropy) from templated/boilerplate text
    * (low): H = (1/N)·Σ c₁₂·(ln c₁ − ln c₂), summed over distinct
    * bigrams, where c₁₂ is the bigram count, c₁ its context count and N
    * the language's bigram total. Engine-exact by the [[TextOps]] log
    * convention: both log terms quantize to DECIMAL(18,6) BEFORE the sum
    * (a log's last-ulp engine difference dies at the rounding; the
    * decimal sum is exact and associative), one float division at the
    * end with identical formula text in the oracle.
    *
    * 100 TB shape: the bigram exchange carries (lang, 2×int64 PolyHash)
    * keys with map-side partial counts — vocabulary-squared-bounded,
    * never corpus-bounded (the [[lmTrigram]] posture); the context sum is
    * a window over the distinct-bigram frame keyed by (lang, h1); output
    * is |languages| rows. */
  val lmBigramEntropy: Q = (s, d) => {
    val dec6 = DecimalType(18, 6)
    def qln(c: org.apache.spark.sql.Column) =
      round(log(c.cast(DoubleType)), 6).cast(dec6)
    val bi = docs(s, d)
      .select(col("lang"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("lang"), explode(expr(
        """transform(sequence(1, size(w) - 1),
             i -> named_struct('w1', element_at(w, i),
                               'w2', element_at(w, i + 1)))""")).as("b"))
      .select(col("lang"),
        graft.functions.PolyHash.poly_hash(col("b.w1")).as("h1"),
        graft.functions.PolyHash.poly_hash(col("b.w2")).as("h2"))
      .groupBy(col("lang"), col("h1"), col("h2"))
      .agg(count(lit(1)).as("c12"))
    bi
      .withColumn("c1",
        sum(col("c12")).over(Window.partitionBy(col("lang"), col("h1"))))
      .groupBy(col("lang"))
      .agg(sum(col("c12")).as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"),
        countDistinct(col("h1")).as("n_contexts"),
        sum(col("c12") * (qln(col("c1")) - qln(col("c12")))).as("st"))
      .select(col("lang"), col("n_bigrams"), col("n_distinct_bigrams"),
        col("n_contexts"),
        round(col("st").cast(DoubleType) / col("n_bigrams"), 6)
          .as("cond_entropy_nats"))
      .orderBy(col("lang"))
  }

  /** Unigram domain shift per source: KL(P_source ‖ P_corpus) in nats
    * over the word distribution — the statistic that ranks which sources
    * drag a training mix away from the corpus average (and the term
    * CCNet-style importance sampling reweights by). Every word in a
    * source exists in the corpus by construction, so no term needs
    * smoothing. Arithmetic is the [[lmBigramEntropy]] convention: KL·N_s
    * = Σ c_sw·(ln c_sw − ln N_s − ln c_w + ln N), each log quantized to
    * DECIMAL(18,6) BEFORE the exact count-weighted decimal sum (the sum
    * reassociates freely), one float division per source at the end.
    *
    * 100 TB shape: one (source, word) aggregate collapses the corpus;
    * the corpus-marginal re-aggregate and its equi-join back ride the
    * VOCABULARY-grain frame keyed on word; source totals and the scalar
    * grand total broadcast. */
  val lmUnigramKl: Q = (s, d) => {
    val dec6 = DecimalType(18, 6)
    def qln(c: org.apache.spark.sql.Column) =
      round(log(c.cast(DoubleType)), 6).cast(dec6)
    val wc = docs(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c_sw"))
    val srcTot = wc.groupBy(col("source")).agg(sum(col("c_sw")).as("tot_s"))
    val corpus = wc.groupBy(col("w")).agg(sum(col("c_sw")).as("c_w"))
    val tot = corpus.agg(sum(col("c_w")).as("tot"))
    wc.join(corpus, "w")
      .join(broadcast(srcTot), "source")
      .crossJoin(broadcast(tot))
      .groupBy(col("source"))
      .agg(max(col("tot_s")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("c_sw") * (qln(col("c_sw")) - qln(col("tot_s")) -
          qln(col("c_w")) + qln(col("tot")))).as("st"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        round(col("st").cast(DoubleType) / col("n_tokens"), 6).as("kl_nats"))
      .orderBy(col("source"))
  }

  /** Interpolated Kneser–Ney bigram probabilities (fixed discount
    * D = 3/4) for the corpus's top-20 bigrams — the standard n-gram LM
    * smoother (Kneser & Ney 1995; Chen & Goodman 1998):
    * P(w2|w1) = max(c12 − D, 0)/c1 + (D·n1/c1)·(nc/T), where c12 is the
    * bigram count, c1 = Σ_w c(w1,w) the context total, n1 = N1+(w1,·)
    * the distinct-continuation count, nc = N1+(·,w2) the
    * distinct-left-context count and T the number of distinct bigram
    * types. Engine-exact because D = 3/4 makes the probability a RATIO
    * OF INTEGERS: P = (max(4·c12−3, 0)·T + 3·n1·nc) / (4·c1·T), both
    * sides carried as DECIMAL(38,0) moments with ONE float division at
    * the end under identical formula text — no per-term float
    * accumulation to diverge between engines.
    *
    * 100 TB shape: the bigram exchange is vocabulary²-bounded with
    * map-side partial counts (the [[lmTrigram]] posture); c1/n1/nc are
    * windows over the distinct-bigram frame keyed by w1 resp. w2 (never
    * a global window); T is a one-row aggregate broadcast in; the global
    * top-20 is TakeOrderedAndProject, so only 20 rows reach the rank
    * window. */
  /** The distinct-bigram count fold — extracted so PlanSpec can pin its
    * shape (the pin in [[lmKneserNey]] truncates it out of the final
    * explain). */
  private[graft] def lmKneserCounts(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(w) - 1),
             i -> named_struct('w1', element_at(w, i),
                               'w2', element_at(w, i + 1)))""")).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))

  val lmKneserNey: Q = (s, d) => {
    val dec = DecimalType(38, 0)
    // Top-20 FIRST, marginals only for the 20 winners (round 16, guide
    // §1.2 — the lmTrigram rewrite applied to BOTH window keys): the old
    // spelling annotated every distinct bigram with w1-keyed (c1, n1_cont)
    // and w2-keyed (n_ctx) window values — two vocabulary²-sized
    // exchange+sort passes — to keep 20 rows. Now the distinct-bigram fold
    // pins once; the top-20 is a TakeOrdered heap over the pin; each
    // marginal is a pin rescan filtered map-side by the winners' w1
    // (resp. w2) values — 20-row broadcast semi-joins — into ≤20-group
    // aggregates, identical by definition to the window values the
    // winning rows carried. T rides the same pin (one count, no second
    // derivation of the fold).
    val biP = lmKneserCounts(s, d).sweepPin()
    val top = biP
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(20)
      .sweepPin()
    val m1 = biP
      .join(broadcast(top.select(col("w1")).distinct()), Seq("w1"), "left_semi")
      .groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1_cont"))
    val m2 = biP
      .join(broadcast(top.select(col("w2")).distinct()), Seq("w2"), "left_semi")
      .groupBy(col("w2"))
      .agg(count(lit(1)).as("n_ctx"))
    val totals = biP.agg(count(lit(1)).as("t_bigrams"))
    val num = greatest(lit(4L) * col("c12") - 3L, lit(0L)).cast(dec) *
      col("t_bigrams").cast(dec) +
      lit(3L).cast(dec) * col("n1_cont").cast(dec) * col("n_ctx").cast(dec)
    val den = lit(4L).cast(dec) * col("c1").cast(dec) *
      col("t_bigrams").cast(dec)
    top
      .join(broadcast(m1), Seq("w1"))
      .join(broadcast(m2), Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("c12").desc, col("w1"), col("w2"))))
      .select(col("rn").cast(LongType).as("rn"), col("w1"), col("w2"),
        col("c12"), col("c1"), col("n1_cont"), col("n_ctx"),
        col("t_bigrams"),
        round(num.cast(DoubleType) / den.cast(DoubleType), 6).as("p_kn"))
      .orderBy(col("rn"))
  }

  /** Boilerplate detection: non-overlapping 8-word chunks appearing in ≥2
    * distinct documents, top-20 by document frequency — the signal a
    * curation pipeline uses to strip repeated headers/footers before
    * training. One explode + one two-phase aggregate; the global top-20
    * `TakeOrderedAndProject`s (per-partition 20-row heaps), never a
    * single-partition sort — only the 20 survivors enter the rank window. */
  val textBoilerplate: Q = (s, d) => {
    val chunks = docs(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w), 8), i -> array_join(slice(w, i, 8), ' '))"))
        .as("chunk"))
    chunks
      // aggregate on the chunk's PolyHash: both phases of the two-phase
      // count-distinct exchange long keys; the chunk text survives as a
      // map-side-collapsed MIN (oracle replays the hash, so collisions
      // merge identically)
      .select(col("doc_id"), col("chunk"),
        graft.functions.PolyHash.poly_hash(col("chunk")).as("ch"))
      .groupBy(col("ch"))
      .agg(min(col("chunk")).as("chunk"),
        countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("chunk"))
      .limit(20)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("n_docs").desc, col("n_occ").desc, col("chunk"))))
      .select(col("rn").cast(LongType).as("rn"), col("chunk"), col("n_docs"), col("n_occ"))
      .orderBy(col("rn"))
  }

  /** Lexical diversity (Simpson index) per document: 1 − Σ(count_w/n)² —
    * the repetitiveness signal curation pipelines use alongside the Gopher
    * ratios. Everything except the final division is EXACT integer
    * arithmetic: Σ count² folds over the row's own sorted word array in one
    * codegen'd map-side pass (zero shuffle at any corpus size; the running
    * r² is maintained incrementally as +2r+1 per repeat), and the index is
    * a single rounded division both engines compute identically. */
  val textDiversity: Q = (s, d) =>
    docs(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast(LongType).as("n_words"),
        // the 'fst' flag marks the seed state: seeding prev='' alone would
        // conflate a genuine empty-string word (doubled/leading spaces in
        // text) with the initial state and undercount n_distinct by one —
        // the oracle's GROUP BY counts '' as a word group like any other
        expr(
          """aggregate(array_sort(ws),
               named_struct('fst', true, 'prev', '', 'run', 0L, 'nd', 0L, 'ss', 0L),
               (a, w) -> named_struct(
                 'fst', false,
                 'prev', w,
                 'run', IF(NOT a.fst AND w = a.prev, a.run + 1, 1L),
                 'nd',  a.nd + IF(NOT a.fst AND w = a.prev, 0L, 1L),
                 'ss',  a.ss + IF(NOT a.fst AND w = a.prev, 2L * a.run + 1L, 1L)))""").as("f"))
      .select(col("doc_id"), col("n_words"),
        col("f.nd").as("n_distinct"), col("f.ss").as("sum_sq"),
        round(lit(1.0) - col("f.ss").cast(DoubleType) /
          (col("n_words") * col("n_words")), 6).as("simpson"))
      .orderBy(col("doc_id"))

  /** Event-transition matrix (first-order Markov): counts and conditional
    * probabilities of next-event-type given current, per-user ordered by
    * time. One lead window keyed on user_id (the natural partitioning),
    * then a 5×5-bounded aggregate — the output is O(|event types|²)
    * regardless of volume. */
  val eventsPathing: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("cur_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("ctx", sum(col("n")).over(Window.partitionBy(col("cur_type"))))
      .select(col("cur_type"), col("next_type"), col("n"),
        round(col("n").cast(DoubleType) / col("ctx"), 6).as("p"))
      .orderBy(col("cur_type"), col("next_type"))
  }

  /** Funnel latency: the distribution of time-to-convert (first view →
    * first strictly-later purchase, per user) in integer seconds —
    * min/quartiles/max plus the converting-user count. The per-user
    * reduction reuses [[eventsFunnel]]'s min-chaining (two user-keyed min
    * aggregates, one user-keyed join); latency is an exact epoch-second
    * difference (no float until the percentile interpolation, which is the
    * same linear rule in both engines over the same exact longs). Output
    * is one row — the dashboard tile shape. */
  val eventsTimeToConvert: Q = (s, d) => {
    val e = events(s, d)
    val t1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val lat = e.filter(col("event_type") === "purchase")
      .join(t1, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"), min(col("t1")).as("t1"))
      .select((unix_timestamp(col("t2")) - unix_timestamp(col("t1"))).as("lat_s"))
    lat.agg(
        count(lit(1)).as("n_converted"),
        min(col("lat_s")).as("min_s"),
        expr("percentile(lat_s, array(0.25D, 0.5D, 0.75D))").as("qs"),
        max(col("lat_s")).as("max_s"))
      .select(col("n_converted"), col("min_s"),
        round(element_at(col("qs"), 1), 6).as("p25_s"),
        round(element_at(col("qs"), 2), 6).as("p50_s"),
        round(element_at(col("qs"), 3), 6).as("p75_s"),
        col("max_s"))
  }

  /** Activity count-of-counts — the power-law / skew audit run before any
    * per-user shuffle is sized: how many users produced exactly k events.
    * Two map-side-combined aggregates; the second runs over DISTINCT
    * activity levels (a few hundred values regardless of corpus size), so
    * the output is audit-sized. This one histogram answers the capacity
    * questions that decide salting and state budgets: the max row is the
    * hottest key a (user-keyed) shuffle or stream-state map will see, and
    * the tail mass says whether per-user aggregation state is bounded. */
  val eventsUserActivity: Q = (s, d) =>
    events(s, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      .groupBy(col("n_events")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_events"))

  /** Daily event-sequence census — the MATCH_RECOGNIZE / funnel-pattern
    * shape: each user-day's events collapse, in (ts, event_id) order, to a
    * symbol string (first letter of the event type: v/c/p/s/e), and the 15
    * most common daily sequences are reported with a regex funnel flag
    * (`v.*c.*p`: a view, a later click, a later purchase, same day).
    * Sequence pattern matching over ROW STREAMS usually needs an NFA
    * operator; over BOUNDED per-key sessions it is exactly one grouped
    * sort-aggregate plus one regex per distinct sequence — no self-join,
    * no state machine. Scale shape: one shuffle keyed (user, day) whose
    * aggregation state is a user-day's own events (session-sized, never
    * corpus-sized); the census aggregate runs over distinct sequence
    * strings (bounded by activity-pattern diversity, a sliver of the event
    * volume) and the regex prices once per DISTINCT sequence, not per
    * event. The final top-15 is TakeOrdered — no global sort. */
  val eventsSequencePattern: Q = (s, d) =>
    events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("sym")).as("ev"))
      .groupBy(col("user_id"), col("day"))
      .agg(concat_ws("",
        transform(array_sort(collect_list(col("ev"))),
          x => x.getField("sym"))).as("seq"))
      .groupBy(col("seq"))
      .agg(count(lit(1)).as("n_user_days"))
      .select(col("seq"), col("n_user_days"),
        col("seq").rlike("v.*c.*p").as("matches_funnel"))
      .orderBy(col("n_user_days").desc, col("seq"))
      .limit(15)

  /** Per-event-type volume trend: exact least-squares slope of the daily
    * event count against the epoch-day index — the "is this signal
    * growing or decaying" statistic behind traffic dashboards and
    * data-freshness alerts. All four regression moments (Σx, Σy, Σxy,
    * Σx²) are exact DECIMAL(38) sums over integer day indices and counts
    * (epoch-day ~2·10⁴ times a 100 TB daily count overflows int64 —
    * widen BEFORE the multiply, the assortativity convention); the slope
    * computes its ONE float from the closed form with identical formula
    * text in the oracle, guarded against a single-day degenerate fit.
    *
    * Scale shape: the (type, day) pre-aggregate is the only event-volume
    * pass (map-side partials on a tiny key space); the moment aggregate
    * runs over types×days rows. No joins, no windows. */
  val eventsTrend: Q = (s, d) => {
    val dec = DecimalType(38, 0)
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .select(col("event_type"),
        datediff(col("day"), lit("1970-01-01").cast(DateType))
          .cast(LongType).as("x"),
        col("y"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("y")).as("total_events"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("y")).as("sxy"),
        sum(col("x").cast(dec) * col("x")).as("sx2"))
      .select(col("event_type"), col("n_days"), col("total_events"),
        when(col("n_days").cast(dec) * col("sx2") =!= col("sx") * col("sx"),
          round(
            (col("n_days").cast(dec) * col("sxy") - col("sx") * col("sy"))
              .cast(DoubleType) /
            (col("n_days").cast(dec) * col("sx2") - col("sx") * col("sx"))
              .cast(DoubleType), 6)).as("slope"))
      .orderBy(col("event_type"))
  }

  /** Autocorrelation lags probed by [[eventsAutocorr]]. */
  val autocorrMaxLag = 7

  /** Lag-k autocorrelation (k = 1..[[autocorrMaxLag]]) of each event
    * type's daily count series — the periodicity detector run before
    * trusting any anomaly threshold (a strong lag-7 says the series is
    * week-seasonal and a flat threshold will page every weekend). r_k is
    * the Pearson correlation of the series against itself k observations
    * back over the n_k overlapping pairs: all five moments are EXACT
    * DECIMAL(38,0) sums of int64 counts (the [[eventsTrend]] regression
    * posture), one sqrt/division float at the end under identical
    * formula text; zero-variance windows (a constant series) yield NULL
    * identically in both engines.
    *
    * 100 TB shape: events collapse to the types×days frame in one
    * map-side-combined aggregate; ONE window pass (keyed by type,
    * ordered by day) computes all 7 lags; the explode and the moment
    * aggregate run over 7× that already-tiny frame. */
  val eventsAutocorr: Q = (s, d) => {
    val dec = DecimalType(38, 0)
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val lagged = daily.select(col("event_type"), col("y"),
      array((1 to autocorrMaxLag).map(k =>
        struct(lit(k.toLong).as("lag"), lag(col("y"), k).over(w).as("yl"))): _*)
        .as("ls"))
      .select(col("event_type"), col("y"), explode(col("ls")).as("l"))
      .select(col("event_type"), col("l.lag").as("lag"), col("y"),
        col("l.yl").as("yl"))
      .filter(col("yl").isNotNull)
    lagged.groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("y").cast(dec)).as("sy"),
        sum(col("yl").cast(dec)).as("sl"),
        sum(col("y").cast(dec) * col("yl")).as("syl"),
        sum(col("y").cast(dec) * col("y")).as("syy"),
        sum(col("yl").cast(dec) * col("yl")).as("sll"))
      .select(col("event_type"), col("lag"), col("n_pairs"),
        when((col("n_pairs").cast(dec) * col("syy") - col("sy") * col("sy") =!= 0) &&
             (col("n_pairs").cast(dec) * col("sll") - col("sl") * col("sl") =!= 0),
          round((col("n_pairs").cast(dec) * col("syl") - col("sy") * col("sl"))
              .cast(DoubleType) /
            sqrt((col("n_pairs").cast(dec) * col("syy") - col("sy") * col("sy"))
                .cast(DoubleType) *
              (col("n_pairs").cast(dec) * col("sll") - col("sl") * col("sl"))
                .cast(DoubleType)), 6)).as("r"))
      .orderBy(col("event_type"), col("lag"))
  }

  /** CUSUM changepoint scan over each event type's daily count series:
    * the day k maximizing |S_k| with S_k = n·Σ_{t≤k} y_t − k·ΣY — the
    * scaled cumulative deviation from a flat rate (Page 1954's statistic
    * with the mean multiplied out, so S stays an EXACT DECIMAL(38,0)
    * integer; no float accumulates). Ties break to the earliest day via
    * `min_by` over (−|S|, day). Output per type: n_days, total, the
    * argmax day, its exact S, and the normalized score |S|/(n·ΣY) — one
    * float division, identical formula text in the oracle.
    *
    * 100 TB shape: one map-side-combined aggregate to the types×days
    * frame; the cumulative sum is one window pass keyed by type; the
    * argmax is a `min_by` partial aggregate, not a rank window. */
  val eventsChangepoint: Q = (s, d) => {
    val dec = DecimalType(38, 0)
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    val scored = daily
      .withColumn("cum", sum(col("y").cast(dec)).over(w))
      .withColumn("k", count(lit(1)).over(w).cast(dec))
      .withColumn("n_days", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("y").cast(dec)).over(wAll))
      .withColumn("s_k", col("n_days").cast(dec) * col("cum") -
        col("k") * col("total"))
    scored.groupBy(col("event_type"))
      .agg(first(col("n_days")).as("n_days"),
        first(col("total")).as("total"),
        min_by(struct(col("day").as("day"), col("s_k").as("s_k")),
          struct((-abs(col("s_k"))).as("na"), col("day"))).as("best"))
      .select(col("event_type"), col("n_days"),
        col("total").cast(LongType).as("total_events"),
        col("best.day").as("change_day"),
        // n·total ≤ days·events: int64-safe until ~10^18 — cast for the
        // gate's dtype strictness (HUGEINT↔DECIMAL never round-trips)
        col("best.s_k").cast(LongType).as("s_exact"),
        round(abs(col("best.s_k")).cast(DoubleType) /
          (col("n_days").cast(dec) * col("total")).cast(DoubleType), 6)
          .as("score"))
      .orderBy(col("event_type"))
  }

  /** Day-of-week seasonality profile per event type: event count and
    * value sum per ISO weekday (1 = Monday … 7 = Sunday), plus the
    * seasonality index n·7/total — 1.0 means a flat week, 2.0 means the
    * day carries twice its flat share. The index is exact by
    * construction (integer n·7, one float division under identical
    * formula text); the value sum rides the DECIMAL(18,6) float-sum
    * convention so partial-aggregation order can't break hash equality.
    *
    * 100 TB shape: one scan, one two-phase aggregate keyed by
    * (event_type, isodow) — ≤ 7·|types| rows out of the map side — and
    * the per-type total is a window over that tiny frame, never a
    * second pass over events. */
  val eventsSeasonality: Q = (s, d) => {
    val perDow = events(s, d)
      .groupBy(col("event_type"),
        (weekday(col("ts")) + lit(1)).cast(LongType).as("isodow"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).as("val_dec"))
    perDow
      .withColumn("total",
        sum(col("n")).over(Window.partitionBy(col("event_type"))))
      .select(col("event_type"), col("isodow"), col("n"),
        round(col("val_dec").cast(DoubleType), 6).as("value_sum"),
        round((col("n") * 7).cast(DoubleType) /
          col("total").cast(DoubleType), 6).as("dow_index"))
      .orderBy(col("event_type"), col("isodow"))
  }

  /** Revenue-concentration readout per event type: the Gini coefficient
    * of per-user total value plus the top-decile share — the whale-curve
    * ("how much of revenue do the top 10% of users carry") every
    * monetization review opens with. Per-user totals are exact
    * DECIMAL(18,6) sums; users rank by (value, user_id) so the Lorenz
    * order is total; Gini uses the rank identity
    * G = (2·Σ i·vᵢ − (n+1)·Σv) / (n·Σv) with the rank-weighted sum
    * Σ i·vᵢ kept as an exact BIGINT×DECIMAL product until the single
    * float evaluation (identical formula text in the oracle); the
    * top-decile cut is k = ⌈n/10⌉ users by integer arithmetic.
    *
    * 100 TB shape: one user-keyed aggregate collapses the event stream;
    * the rank window and both sums ride the USER-grain frame partitioned
    * by event_type (users ≪ events, types bound the partitions), and the
    * two-row-group output joins nothing back. */
  val eventsGini: Q = (s, d) => {
    val dec6 = DecimalType(18, 6)
    val perUser = events(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("value").cast(dec6)).as("v"))
    val byType = Window.partitionBy(col("event_type"))
      .orderBy(col("v"), col("user_id"))
    perUser
      .withColumn("i", row_number().over(byType).cast(LongType))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("v")).as("tot"),
        sum(col("i") * col("v")).as("iv"))
      .select(col("event_type"), col("n_users"),
        round(col("tot").cast(DoubleType), 6).as("total_value"),
        round((lit(2.0d) * col("iv").cast(DoubleType) -
            (col("n_users") + 1L).cast(DoubleType) * col("tot").cast(DoubleType)) /
          (col("n_users").cast(DoubleType) * col("tot").cast(DoubleType)), 6)
          .as("gini"))
      .orderBy(col("event_type"))
  }

  /** Top-decile (whale) share per event type: the fraction of total value
    * carried by the top ⌈n/10⌉ users — [[eventsGini]]'s companion
    * readout, split out so each statistic stays one exact aggregate.
    * Ranks descend by (value, user_id); the decile cut is exact integer
    * arithmetic ((n + 9) DIV 10 in both engines); shares divide two
    * exact decimals once. Same USER-grain scale shape as the Gini. */
  val eventsWhaleShare: Q = (s, d) => {
    val dec6 = DecimalType(18, 6)
    val perUser = events(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("value").cast(dec6)).as("v"))
    val byType = Window.partitionBy(col("event_type"))
      .orderBy(col("v").desc, col("user_id").desc)
    perUser
      .withColumn("i", row_number().over(byType).cast(LongType))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .withColumn("k", expr("(n + 9) DIV 10"))
      .groupBy(col("event_type"))
      .agg(max(col("k")).as("top_users"),
        sum(when(col("i") <= col("k"), col("v")).otherwise(lit(0).cast(dec6)))
          .as("top_v"),
        sum(col("v")).as("tot"))
      .select(col("event_type"), col("top_users"),
        round(col("top_v").cast(DoubleType), 6).as("top_value"),
        round(col("top_v").cast(DoubleType) / col("tot").cast(DoubleType), 6)
          .as("top_share"))
      .orderBy(col("event_type"))
  }

  /** Inter-arrival cadence histogram: per event type, the distribution of
    * same-user gaps between consecutive events of that type, bucketed by
    * binary order of magnitude — bucket k holds gaps of k binary digits
    * (2^(k−1) ≤ gap < 2^k seconds; 0-second gaps share bucket 1 with
    * 1-second gaps), the log-scale cadence readout that sizes session
    * timeouts and rate alarms without a single float: the bucket is the
    * LENGTH OF THE BINARY STRING of the integer second gap (`bin()` in
    * both engines), gaps are whole-second unix-time differences, and the
    * share divides two exact longs once.
    *
    * 100 TB shape: one keyed LAG window over (user, type, time) — the
    * sessionize shuffle — collapsing map-side to |types|×~40 bucket rows;
    * no joins, no global sort until the bucket-grain output. */
  val eventsInterarrival: Q = (s, d) => {
    val byUserType = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(unix_timestamp(col("ts")), 1).over(byUserType))
      .filter(col("prev").isNotNull)
      .select(col("event_type"),
        (unix_timestamp(col("ts")) - col("prev")).as("gap_s"))
    gaps
      .groupBy(col("event_type"), length(bin(col("gap_s"))).cast(LongType).as("bucket"))
      .agg(count(lit(1)).as("n"), min(col("gap_s")).as("min_gap_s"),
        max(col("gap_s")).as("max_gap_s"))
      .withColumn("type_n", sum(col("n")).over(
        Window.partitionBy(col("event_type"))))
      .select(col("event_type"), col("bucket"), col("n"),
        col("min_gap_s"), col("max_gap_s"),
        round(col("n").cast(DoubleType) / col("type_n").cast(DoubleType), 6)
          .as("share"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** Conditional entropy of the event-type transition matrix,
    * H(next | cur) in nats per context type — the predictability readout
    * over [[eventsPathing]]'s transitions (a type whose successors are
    * near-uniform needs a model; one with H ≈ 0 is a deterministic
    * funnel step). The [[lmBigramEntropy]] arithmetic verbatim: both log
    * terms quantize to DECIMAL(18,6) BEFORE the exact decimal sum, one
    * float division at the end under identical formula text.
    *
    * 100 TB shape: one keyed LEAD window over (user, time) — the
    * pathing shuffle — collapsing map-side to the |types|²-bounded
    * transition counts; everything after runs on that tiny frame. */
  val eventsTransitionEntropy: Q = (s, d) => {
    val dec6 = DecimalType(18, 6)
    def qln(c: org.apache.spark.sql.Column) =
      round(log(c.cast(DoubleType)), 6).cast(dec6)
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val trans = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("cur_type"))
      .withColumn("next_type", lead(col("cur_type"), 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("cur_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    trans
      .withColumn("ctx", sum(col("n")).over(
        Window.partitionBy(col("cur_type"))))
      .groupBy(col("cur_type"))
      .agg(sum(col("n")).as("n_transitions"),
        count(lit(1)).as("n_next_types"),
        sum(col("n") * (qln(col("ctx")) - qln(col("n")))).as("st"))
      .select(col("cur_type"), col("n_transitions"), col("n_next_types"),
        round(col("st").cast(DoubleType) / col("n_transitions"), 6)
          .as("cond_entropy_nats"))
      .orderBy(col("cur_type"))
  }

  /** Kaplan–Meier conversion-survival curve over whole days of
    * view→purchase latency: for each latency day t, the at-risk count
    * n_t (users with a first view who have not converted before t), the
    * converting count d_t, the per-day hazard d_t/n_t, and the KM
    * estimate S(t) = Π_{u≤t} (1 − d_u/n_u). Non-converting users never
    * leave the risk set (no interval censoring in a fixed-window
    * extract), so n_t is N − cumulative prior conversions — exact
    * integers end to end. The product goes through the repo's
    * quantized-log convention (each ln term rounds to 6 dp and sums as
    * DECIMAL(18,6), then one exp + round on the day-grain result) so
    * both engines hash-agree; a day that empties the risk set (everyone
    * left converts) pins S(t) to exactly 0.0 from there on instead of
    * pushing ln(0) through the sum. Scale shape: the per-user reduction is
    * [[eventsTimeToConvert]]'s two min-aggregates + one user-keyed join;
    * everything after runs on the DAY-grain frame (≤ observation window
    * in rows), so the two running windows are audit-sized — the event
    * stream itself is never windowed. */
  val eventsSurvival: Q = (s, d) => {
    val dec6 = DecimalType(18, 6)
    val e = events(s, d)
    val t1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val lat = e.filter(col("event_type") === "purchase")
      .join(t1, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"), min(col("t1")).as("t1"))
      .select(expr("(unix_timestamp(t2) - unix_timestamp(t1)) DIV 86400")
        .as("lat_day"))
    val n = t1.agg(count(lit(1)).as("n_risk0"))
    val byDay = lat.groupBy(col("lat_day")).agg(count(lit(1)).as("n_converted"))
    val prior = Window.orderBy(col("lat_day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upto = Window.orderBy(col("lat_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDay.crossJoin(broadcast(n))
      .withColumn("n_at_risk",
        col("n_risk0") - coalesce(sum(col("n_converted")).over(prior), lit(0L)))
      // a day where EVERY remaining at-risk user converts drives S(t) to
      // exactly 0; ln(0) is no engine's friend, so that day contributes a
      // NULL term (SUM skips it in both engines) and a depletion flag
      // that pins survival to 0.0 from there on
      .withColumn("t",
        when(col("n_at_risk") > col("n_converted"),
          round(log((col("n_at_risk") - col("n_converted")).cast(DoubleType) /
            col("n_at_risk")), 6).cast(dec6)))
      .withColumn("depleted",
        sum(when(col("n_at_risk") === col("n_converted"), 1L).otherwise(0L))
          .over(upto))
      .select(col("lat_day"), col("n_at_risk"), col("n_converted"),
        round(col("n_converted").cast(DoubleType) / col("n_at_risk"), 6)
          .as("hazard"),
        when(col("depleted") > 0L, lit(0.0d))
          .otherwise(round(exp(sum(col("t")).over(upto).cast(DoubleType)), 6))
          .as("survival"))
      .orderBy(col("lat_day"))
  }

  /** Cohort LTV curve: users cohorted by the Monday of their first-ever
    * event week; per (cohort_week, weeks-since-own-first-day) cell, the
    * purchase count, exact cumulative revenue and cumulative revenue per
    * cohort user — the payback-period readout every growth team plots.
    * Revenue sums quantize to DECIMAL(18,6) before aggregation (the
    * repo's float-sum convention) so cumulative values are
    * order-insensitive and hash-exact; the cumulative column is then
    * emitted as DOUBLE (the exact decimal has ≤6 fractional digits, so
    * the cast is lossless at audit scale) because the suite's output
    * convention is float-once/int64 — decimal output columns hash
    * differently between the Spark and DuckDB sides of the driver gate.
    * Age weeks are exact integer day
    * differences floor-divided by 7 (both engines truncate toward zero).
    * Scale shape: one user-keyed min-aggregate, one user-keyed join to
    * annotate purchases, one (cohort, age) aggregate — the running sum
    * then rides the cohort×age grid (weeks², audit-sized), partitioned
    * by cohort week, never the purchase stream. */
  val eventsCohortLtv: Q = (s, d) => {
    val dec6 = DecimalType(18, 6)
    val e = events(s, d)
    val first = e.groupBy(col("user_id")).agg(min(col("ts")).as("ft"))
      .select(col("user_id"),
        date_trunc("week", col("ft")).cast(DateType).as("cohort_week"),
        to_date(col("ft")).as("fd"))
    val sizes = first.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_users"))
    val cells = e.filter(col("event_type") === "purchase")
      .join(first, "user_id")
      .select(col("cohort_week"),
        expr("CAST(datediff(to_date(ts), fd) AS BIGINT) DIV 7").as("age_w"),
        col("value").cast(dec6).as("v"))
      .groupBy(col("cohort_week"), col("age_w"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("v")).as("rev"))
    val byAge = Window.partitionBy(col("cohort_week")).orderBy(col("age_w"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("age_w"), col("n_purchases"),
        sum(col("rev")).over(byAge).cast(DoubleType).as("cum_value"),
        col("cohort_users"),
        round(sum(col("rev")).over(byAge).cast(DoubleType) /
          col("cohort_users"), 6).as("ltv"))
      .orderBy(col("cohort_week"), col("age_w"))
  }

  /** Forecast horizon of [[eventsForecastNaive]]: seasonal-naive ŷ_t =
    * y_{t−7}, the week-ago value — the baseline every real forecaster
    * must beat. */
  val forecastLag = 7

  /** Seasonal-naive backtest per event type: forecast each day's count
    * with the value [[forecastLag]] observations back and report MAE and
    * mean bias over the evaluable days — the sanity floor for any
    * capacity-planning or anomaly model on this stream (a model that
    * can't beat week-ago-naive has learned nothing; [[eventsAutocorr]]'s
    * lag-7 peak says how beatable the floor is). Absolute and signed
    * error totals stay exact int64; each mean is ONE float division
    * under identical formula text.
    *
    * 100 TB shape: one map-side-combined collapse to types×days, one
    * keyed window pass for the lag, one aggregate. */
  val eventsForecastNaive: Q = (s, d) => {
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily.withColumn("yhat", lag(col("y"), forecastLag).over(w))
      .filter(col("yhat").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("y") - col("yhat"))).as("abs_err_total"),
        sum(col("y") - col("yhat")).as("bias_total"))
      .select(col("event_type"), col("n_eval"), col("abs_err_total"),
        round(col("abs_err_total").cast(DoubleType) /
          col("n_eval").cast(DoubleType), 6).as("mae"),
        round(col("bias_total").cast(DoubleType) /
          col("n_eval").cast(DoubleType), 6).as("mean_bias"))
      .orderBy(col("event_type"))
  }

  /** Pointwise mutual information between event types co-occurring in
    * the same user-day — the association readout behind "users who error
    * also purchase?" questions, complementing [[eventsPathing]] (which
    * sees only ADJACENT transitions; PMI sees joint presence at any
    * distance within the day). PMI(a,b) = ln(N·c_ab/(c_a·c_b)) over
    * user-day baskets, computed by the repo's quantized-log convention:
    * each ln quantizes to DECIMAL(18,6) BEFORE the exact decimal
    * add/subtract, one double cast at the end — engine-identical.
    *
    * 100 TB shape: the basket build is one distinct + one collect_set
    * aggregate keyed by (user, day); the pair expansion is bounded by
    * each basket's WIDTH (≤ |event types|, single digits), the
    * [[graft.operators.GraphOps]] edge-derivation posture — never a
    * corpus self-join (the oracle's self-join spelling is equivalent at
    * oracle scale only); singles and the basket total broadcast into the
    * types²-bounded pair frame. */
  val eventsPmi: Q = (s, d) => {
    val dec6 = DecimalType(18, 6)
    def qln(c: org.apache.spark.sql.Column) =
      round(log(c.cast(DoubleType)), 6).cast(dec6)
    val ud = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
      .distinct()
    val baskets = ud.groupBy(col("user_id"), col("day"))
      .agg(sort_array(collect_set(col("event_type"))).as("tset"))
    val n = baskets.agg(count(lit(1)).as("n_baskets"))
    val singles = ud.groupBy(col("event_type")).agg(count(lit(1)).as("c"))
    val pairs = baskets.select(explode(expr(
      """flatten(transform(tset, (x, i) ->
           transform(slice(tset, i + 2, size(tset)),
             y -> named_struct('a', x, 'b', y))))""")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("c_ab"))
    pairs
      .join(broadcast(singles.select(col("event_type").as("a"),
        col("c").as("c_a"))), Seq("a"))
      .join(broadcast(singles.select(col("event_type").as("b"),
        col("c").as("c_b"))), Seq("b"))
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        col("n_baskets"),
        round((qln(col("c_ab")) + qln(col("n_baskets")) -
          qln(col("c_a")) - qln(col("c_b"))).cast(DoubleType), 6).as("pmi"))
      .orderBy(col("a"), col("b"))
  }

  /** Greedy bigram decode: seed with the corpus's most frequent word, then
    * repeatedly take the most frequent continuation (ties break
    * lexicographically) for [[greedyDecodeSteps]] steps — the
    * deterministic heart of LM inference, replayed exactly by both
    * engines. The decode is PURE COMPOSITION: each step is a one-row
    * frame (TakeOrdered-1 over the bigram table keyed by the previous
    * step's word, a broadcast join of a single row), chained lazily and
    * unioned — no driver-side loop, no collect between steps. Scale
    * shape: the bigram model is vocabulary²-bounded (built once with
    * map-side partials); each step's probe is a key-pruned lookup into
    * it. A word with no continuation ends the chain identically on both
    * engines (empty frames stay empty). */
  val greedyDecodeSteps = 10

  val lmGreedyDecode: Q = (s, d) => {
    val ws = docs(s, d).select(split(col("text"), " ").as("w"))
    val uni = ws.select(explode(col("w")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
    val bi = ws.filter(size(col("w")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(w) - 1),
             i -> named_struct('wa', element_at(w, i),
                               'wb', element_at(w, i + 1)))""")).as("p"))
      .groupBy(col("p.wa").as("wa"), col("p.wb").as("wb"))
      .agg(count(lit(1)).as("c"))
    // Greedy decode reads ONLY each word's best continuation, so fold the
    // bigram table to its per-word argmax ONCE (min_by over (−c, wb) ≡ the
    // old per-step TakeOrdered's (c DESC, wb) — ties break to the
    // lexicographically first continuation) instead of probing the full
    // vocabulary²-bounded bigram table once per step: 10 full scans
    // collapse to one vocabulary-sized aggregate. Pinned: the gate count
    // and the decode both read it.
    val best = bi.groupBy(col("wa"))
      .agg(min_by(col("wb"), struct((-col("c")).as("nc"), col("wb"))).as("wb"))
      .sweepPin()
    val s0 = uni.orderBy(col("c").desc, col("word")).limit(1)
      .select(col("word").as("w0"))
    // one bounded driver scalar gates the broadcast (the DimGates posture):
    // `best` is vocabulary-sized, fine to broadcast far past any real
    // tokenizer vocabulary, but a pathological corpus could exceed reach
    if (best.count() <= Limits.maxBroadcastDimRows) {
      // ONE linear plan: the argmax table broadcasts once (the 10 joins
      // reuse the same exchange) and the single seed row flows through 10
      // chained hash probes — no per-step action, no per-step pin, no
      // O(steps) job barriers (the old spelling ran ~13 serial jobs; this
      // runs the decode inside one). A word with no continuation leaves
      // the rest of the chain NULL (left join), which unpivots to "chain
      // ended" exactly like the old empty per-step frames.
      // one broadcast, renamed AFTER each join — per-step aliases inside
      // the broadcast subtree would defeat exchange reuse and build the
      // same hash relation ten times
      val bcBest = broadcast(best)
      val chain = (1 to greedyDecodeSteps).foldLeft(s0) { (cur, i) =>
        cur.join(bcBest, cur(s"w${i - 1}") === bcBest("wa"), "left")
          .drop("wa").withColumnRenamed("wb", s"w$i")
      }
      val stepCols = (0 to greedyDecodeSteps).map(i => col(s"w$i"))
      val out = chain.select(posexplode(array(stepCols: _*))
          .as(Seq("step", "word")))
        .filter(col("word").isNotNull)
        .select(col("step").cast(LongType).as("step"), col("word"))
      // `best` stays pinned: the returned (lazy) plan broadcasts it at
      // action time — releasing here would unpersist blocks the caller's
      // action still scans (the Checkpoints.release contract)
      out.orderBy(col("step"))
    } else {
      // past broadcast reach: per-step keyed probes of the pinned argmax
      // table (key-unique, so no TakeOrdered needed) — the old loop shape
      // with a vocabulary-sized probe target instead of vocabulary²
      val first = s0.select(lit(0L).as("step"), col("w0").as("word"))
        .sweepCheckpoint()
      val steps = (1 to greedyDecodeSteps).scanLeft(first) { (prev, i) =>
        best.join(broadcast(prev.select(col("word").as("wa"))), "wa")
          .select(lit(i.toLong).as("step"), col("wb").as("word"))
          .sweepCheckpoint() // one row; keeps step k from replaying 0..k-1
      }
      steps.reduce(_ unionAll _).orderBy(col("step"))
    }
  }

  /** Longest consecutive-day activity streak per user (the engagement
    * leaderboard), via the gaps-and-islands identity: within a user's
    * DISTINCT active days ordered by date, `day − row_number` is constant
    * exactly across consecutive runs, so one window + one aggregate finds
    * every streak — no self-join, no recursion. Per user the longest
    * (earliest on ties) survives a second user-keyed window that reuses
    * the same partitioning; the leaderboard is a TakeOrdered top-20. */
  val eventsStreaks: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val best = Window.partitionBy(col("user_id"))
      .orderBy(col("streak_days").desc, col("streak_start"))
    events(s, d)
      .select(col("user_id"), expr("CAST(ts AS DATE)").as("day")).distinct()
      .withColumn("grp", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("streak_days"), min(col("day")).as("streak_start"))
      .withColumn("rk", row_number().over(best))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("streak_days"), col("streak_start"))
      .orderBy(col("streak_days").desc, col("user_id"))
      .limit(20)
  }

  /** Collocation mining: the 20 adjacent word pairs most over-represented
    * against their unigram frequencies — lift = c_ab · N / (c_a · c_b),
    * the exact-ratio core of PMI (PMI = log lift; the log is omitted so
    * the ranking needs no libm call and both engines compare bit-exact —
    * log is monotone, so the top-k is identical). Pair and unigram counts
    * are exact longs off one token stream; the unigram table is
    * vocabulary-sized and broadcasts into the pair stream; minimum
    * support [[minColloSupport]] keeps one-off pairs out. */
  val minColloSupport = 5

  val lmCollocations: Q = (s, d) => {
    val ws = docs(s, d).select(split(col("text"), " ").as("w"))
    val uni = ws.select(explode(col("w")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c1"))
    val nTok = ws.select(explode(col("w")).as("word"))
      .agg(count(lit(1)).as("n_tokens"))
    ws.filter(size(col("w")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(w) - 1),
             i -> named_struct('wa', element_at(w, i),
                               'wb', element_at(w, i + 1)))""")).as("p"))
      .groupBy(col("p.wa").as("wa"), col("p.wb").as("wb"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minColloSupport)
      .join(broadcast(uni.select(col("word").as("wa"), col("c1").as("c_a"))), "wa")
      .join(broadcast(uni.select(col("word").as("wb"), col("c1").as("c_b"))), "wb")
      .crossJoin(broadcast(nTok))
      .select(col("wa"), col("wb"), col("c_ab"), col("c_a"), col("c_b"),
        round((col("c_ab") * col("n_tokens")).cast(DoubleType) /
          (col("c_a") * col("c_b")), 6).as("lift"))
      .orderBy(col("lift").desc, col("wa"), col("wb"))
      .limit(20)
  }

  /** A/B experiment readout: deterministic 50/50 cohort split on user_id
    * parity (production uses a hash split — [[PipelineOps.sampleHash]]'s
    * predicate class; parity keeps the oracle trivially replayable), the
    * "power purchaser" conversion (> [[abConversionBar]] purchase events —
    * every fixture user purchases at least once, so presence would be
    * degenerate), relative lift, and the pooled two-proportion z
    * statistic. Two stages: a user-keyed count aggregate (map-side
    * partials, output user-cardinality-bounded), then a 4-long global
    * aggregate; every float is computed once from those longs by a formula
    * whose text both engines execute identically (IEEE divisions + one
    * sqrt), so the readout compares hash-exact. At 100 TB this is the
    * cheapest possible experiment query: no join, one user-keyed
    * exchange. */
  val abConversionBar = 13 // "power purchaser": > median purchases/user

  val eventsAbTest: Q = (s, d) => {
    val perUser = events(s, d)
      .groupBy(col("user_id"))
      .agg(count(when(col("event_type") === "purchase", 1)).as("n_purchases"))
      .select(col("user_id"),
        (col("n_purchases") > abConversionBar).as("converted"))
    perUser
      .agg(
        count(when(col("user_id") % 2 === 0, 1)).as("n_a"),
        count(when(col("user_id") % 2 === 0 && col("converted"), 1)).as("conv_a"),
        count(when(col("user_id") % 2 === 1, 1)).as("n_b"),
        count(when(col("user_id") % 2 === 1 && col("converted"), 1)).as("conv_b"))
      .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        round(expr("conv_a / CAST(n_a AS DOUBLE)"), 6).as("p_a"),
        round(expr("conv_b / CAST(n_b AS DOUBLE)"), 6).as("p_b"),
        round(expr(
          "conv_b / CAST(n_b AS DOUBLE) / (conv_a / CAST(n_a AS DOUBLE)) - 1.0D"), 6)
          .as("lift"),
        // pooled two-proportion z; the exact expression text is mirrored in
        // the oracle so both engines run the same IEEE op tree. A degenerate
        // experiment (pooled p of 0 or 1) has zero variance and, by
        // convention, zero signal.
        round(expr(
          """CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
                  THEN 0.0D
                  ELSE (conv_b / CAST(n_b AS DOUBLE) - conv_a / CAST(n_a AS DOUBLE))
                       / sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                              * (1.0D - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                              * (1.0D / n_a + 1.0D / n_b)) END"""), 6).as("zscore"))
  }

  /** Slowly-changing-dimension (type 2) build: the per-user event_type
    * history as (state, valid_from, valid_to) intervals — consecutive equal
    * states collapse, the open interval carries a NULL valid_to. Two windows
    * over the same (user_id; ts, event_id) key: change-point detection via
    * lag, interval close via lead over the change points only — both reuse
    * one user-keyed sort at scale. */
  val scd2Build: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type").as("state"),
        col("ts").as("valid_from"), col("valid_to"))
      .orderBy(col("user_id"), col("valid_from"))
  }

  /** Session-length distribution over [[RelOps.sessionizeBatch]]'s closed
    * sessions: session count, single-event share, mean events/session,
    * and EXACT median / p90 / max duration seconds. The order statistics
    * avoid both a global sort and a collect: durations aggregate to the
    * VALUE grain first (distinct whole-second durations are bounded by
    * the session gap, ~10³ values regardless of session count), and the
    * cumulative rank window rides that tiny frame — the same
    * counts-of-values trick [[graphDegreeDist]] uses. Median is the
    * lower median ((N+1) DIV 2); p90 is ceil(0.9·N) by integer
    * arithmetic.
    *
    * 100 TB shape: the sessionize windows are the only event-volume
    * work; everything after is value-grain + one-row broadcasts. */
  val sessionStats: Q = (s, d) => {
    val sess = RelOps.sessionizeBatch(s, d)
    val dur = sess.select(col("n_events"),
      expr("(unix_micros(session_end) - unix_micros(session_start)) DIV 1000000")
        .as("dur_s"))
      .sweepPin()
    val census = dur.agg(count(lit(1)).as("n_sessions"),
      sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("n_single"),
      sum(col("n_events")).as("tot_events"), max(col("dur_s")).as("max_duration_s"))
    val cum = Window.orderBy(col("dur_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = dur.groupBy(col("dur_s")).agg(count(lit(1)).as("c"))
      .withColumn("cumc", sum(col("c")).over(cum))
      .crossJoin(broadcast(census.select(col("n_sessions").as("nn"))))
    def pick(kExpr: String, name: String) =
      hist.filter(col("cumc") >= expr(kExpr))
        .agg(min(col("dur_s")).as(name))
    census
      .crossJoin(broadcast(pick("(nn + 1) DIV 2", "median_duration_s")))
      .crossJoin(broadcast(pick("(9 * nn + 9) DIV 10", "p90_duration_s")))
      .select(col("n_sessions"),
        round(col("n_single").cast(DoubleType) /
          col("n_sessions").cast(DoubleType), 6).as("single_share"),
        round(col("tot_events").cast(DoubleType) /
          col("n_sessions").cast(DoubleType), 6).as("mean_events"),
        col("median_duration_s"), col("p90_duration_s"),
        col("max_duration_s"))
  }

  /** Benford first-digit audit on the value column — the fraud/synthetic-
    * data smell test: organic multiplicative quantities put ~30.1% of
    * leading digits at 1, and a uniform generator (like this fixture's)
    * fails loudly. Per digit 1–9: observed count and share, the Benford
    * expectation log₁₀(1 + 1/d) (evaluated with identical formula text
    * both engines), and the χ² contribution (n·(obs − exp)²/exp summed
    * over digits is the test statistic). The digit extracts from
    * floor(value·100) rendered as a string — CAST alone would round in
    * one engine and truncate in the other.
    *
    * 100 TB shape: one 9-bucket count aggregate out of the map side; the
    * 9-row digit table broadcasts so zero-count digits still report. */
  val eventsValueBenford: Q = (s, d) => {
    val digits = {
      import s.implicits._
      (1 to 9).map(_.toLong).toDF("digit")
    }
    val counts = events(s, d)
      .select(expr(
        "CAST(substring(CAST(CAST(floor(value * 100.0D) AS BIGINT) AS STRING), 1, 1) AS BIGINT)")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("total"))
    digits
      .join(broadcast(counts), Seq("digit"), "left")
      .crossJoin(broadcast(tot))
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
        col("total"),
        round(coalesce(col("n"), lit(0L)).cast(DoubleType) /
          col("total").cast(DoubleType), 6).as("obs_share"),
        round(log(lit(1.0d) + lit(1.0d) / col("digit").cast(DoubleType)) /
          log(lit(10.0d)), 6).as("exp_share"))
      .select(col("digit"), col("n"), col("total"), col("obs_share"),
        col("exp_share"),
        round((col("obs_share") - col("exp_share")) *
          (col("obs_share") - col("exp_share")) /
          col("exp_share") * col("total"), 6).as("chi2_term"))
      .orderBy(col("digit"))
  }

  /** Ingest data-quality gate: the one-row contract report every events
    * drop passes before anything downstream trusts it — row count, null
    * keys, duplicate event ids, out-of-range values, timestamps outside
    * the drop's own [min, max] day envelope (a zero-cost tripwire that
    * catches unit regressions: a nanos-as-micros batch lands centuries
    * away), and the valid share. All exact integers; one division.
    *
    * 100 TB shape: one pass for the global aggregate plus one key-grain
    * distinct count (the dup check is the only shuffle); censuses
    * broadcast into a single output row. */
  val eventsDqReport: Q = (s, d) => {
    val e = events(s, d)
    val base = e.agg(count(lit(1)).as("n_rows"),
      sum(when(col("user_id").isNull || col("event_type").isNull ||
        col("ts").isNull, 1L).otherwise(0L)).as("n_null_key"),
      sum(when(col("value") < 0.0d, 1L).otherwise(0L)).as("n_negative_value"),
      sum(when(col("value") > 1000000.0d, 1L).otherwise(0L))
        .as("n_outlier_value"),
      (count(lit(1)) - countDistinct(col("event_id"))).as("n_dup_event_id"),
      datediff(max(to_date(col("ts"))), min(to_date(col("ts"))))
        .cast(LongType).as("span_days"))
    base.select(col("n_rows"), col("n_null_key"), col("n_dup_event_id"),
      col("n_negative_value"), col("n_outlier_value"), col("span_days"),
      round((col("n_rows") - col("n_null_key") - col("n_dup_event_id") -
          col("n_negative_value") - col("n_outlier_value")).cast(DoubleType) /
        col("n_rows").cast(DoubleType), 6).as("valid_share"))
  }

  /** Bot-suspect report: the 20 most active users with their z-score
    * against the population's per-user event-count distribution, plus
    * the census of users above the 3σ line — the first-pass abuse
    * screen every events pipeline runs before metrics trust the data.
    * Moments are exact (n_users, Σn, Σn² — the squares widen to
    * DECIMAL(38,0) before multiplying); μ, σ and each z evaluate once
    * in doubles with identical formula text both engines.
    *
    * 100 TB shape: one user-keyed count aggregate collapses the stream;
    * the one-row moment census broadcasts back over the USER-grain
    * frame and TakeOrdered keeps 20 — no global sort, no collect. */
  val eventsBotSuspects: Q = (s, d) => {
    val dec38 = DecimalType(38, 0)
    val perUser = events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        countDistinct(expr("CAST(ts AS DATE)")).as("n_days"))
      .sweepPin()
    val census = perUser.agg(count(lit(1)).as("n_users"),
      sum(col("n")).as("sn"), sum(col("n").cast(dec38) * col("n")).as("snn"))
    val z = (col("n").cast(DoubleType) -
      col("sn").cast(DoubleType) / col("n_users").cast(DoubleType)) /
      sqrt((col("n_users").cast(DoubleType) * col("snn").cast(DoubleType) -
        col("sn").cast(DoubleType) * col("sn").cast(DoubleType)) /
        (col("n_users").cast(DoubleType) *
          (col("n_users") - 1L).cast(DoubleType)))
    // the suspect census is a second one-row aggregate over the
    // checkpointed user-grain frame — NOT an unkeyed window (which would
    // single-partition a frame that grows with the user base)
    val suspects = perUser.crossJoin(broadcast(census))
      .agg(sum(when(round(z, 6) > 3.0d, 1L).otherwise(0L)).as("n_suspects"))
    perUser.crossJoin(broadcast(census))
      .select(col("user_id"), col("n").as("n_events"), col("n_days"),
        round(z, 6).as("zscore"))
      .orderBy(col("n_events").desc, col("user_id"))
      .limit(20)
      .crossJoin(broadcast(suspects))
  }

  /** k-anonymity audit before an events extract leaves the fence: rows
    * group by the quasi-identifier (event_type, ISO weekday, value
    * decade) and each event type reports its group count, the smallest
    * and (lower-)median group size, and the row count/share sitting in
    * groups below k = 5 — the rows an attacker with the QI columns could
    * single out. Pure integer statistics; one share division.
    *
    * 100 TB shape: one QI-keyed count aggregate collapses the stream;
    * the rank window for the median and the census ride the GROUP-grain
    * frame (|types|·7·|decades| rows). */
  val privacyKAnon: Q = (s, d) => {
    val g = events(s, d)
      .groupBy(col("event_type"),
        (weekday(col("ts")) + lit(1)).cast(LongType).as("isodow"),
        expr("CAST(floor(value / 10.0D) AS BIGINT)").as("value_decade"))
      .agg(count(lit(1)).as("k"))
      .sweepPin()
    val byType = Window.partitionBy(col("event_type"))
      .orderBy(col("k"), col("isodow"), col("value_decade"))
    val med = g.withColumn("rn", row_number().over(byType))
      .withColumn("cnt", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
      .filter(col("rn") === expr("(cnt + 1) DIV 2"))
      .select(col("event_type"), col("k").as("median_k"))
    g.groupBy(col("event_type"))
      .agg(sum(col("k")).as("n_rows"), count(lit(1)).as("n_groups"),
        min(col("k")).as("min_k"),
        sum(when(col("k") < 5L, col("k")).otherwise(0L)).as("risk_rows"))
      .join(broadcast(med), "event_type")
      .select(col("event_type"), col("n_rows"), col("n_groups"),
        col("min_k"), col("median_k"), col("risk_rows"),
        round(col("risk_rows").cast(DoubleType) /
          col("n_rows").cast(DoubleType), 6).as("risk_share"))
      .orderBy(col("event_type"))
  }

  /** The masked extract [[privacyKAnon]] audits: user ids pseudonymize
    * through the PolyHash affine rehash (deterministic, engine-neutral,
    * not reversible without the modulus secret-share), timestamps
    * truncate to the day, and values coarsen to their decade — the
    * column-level generalization that turns a raw event log into a
    * shareable dataset. Row-grain output (the extract itself), ordered
    * by the masked columns.
    *
    * 100 TB shape: a pure map-side projection — no shuffle at all until
    * the output sort, which a real export would drop. */
  val privacySafeView: Q = (s, d) => {
    import graft.functions.PolyHash.{Mult, P}
    events(s, d)
      .select((col("user_id") % P * Mult % P).as("pseudo_user"),
        to_date(col("ts")).as("day"),
        col("event_type"),
        expr("CAST(floor(value / 10.0D) AS BIGINT) * 10").as("value_decade"))
      .orderBy(col("pseudo_user"), col("day"), col("event_type"),
        col("value_decade"))
  }

  /** Hour-of-day activity profile per event type: count and within-type
    * share per (type, hour), with the peak hour flagged — the
    * "when are users awake" readout that sizes serving capacity and
    * schedules batch windows. Exact counts; one share division; the
    * peak flag compares exact longs (ties all flag, deterministically).
    *
    * 100 TB shape: one (type, hour) count aggregate — ≤ 24·|types| rows
    * out of the map side; the share/peak window rides that frame. */
  val eventsHourProfile: Q = (s, d) => {
    val byType = Window.partitionBy(col("event_type"))
    events(s, d)
      .groupBy(col("event_type"), hour(col("ts")).cast(LongType).as("hh"))
      .agg(count(lit(1)).as("n"))
      .withColumn("type_n", sum(col("n")).over(byType))
      .withColumn("max_n", max(col("n")).over(byType))
      .select(col("event_type"), col("hh"), col("n"),
        round(col("n").cast(DoubleType) / col("type_n").cast(DoubleType), 6)
          .as("share"),
        (col("n") === col("max_n")).as("is_peak"))
      .orderBy(col("event_type"), col("hh"))
  }

  /** Time-travel read over the [[scd2Build]] dimension: reconstruct every
    * user's state AS OF the fixture's temporal midpoint (the exact
    * integer mean of min/max event micros — data-derived, so the query
    * is deterministic on any fixture) and report the state census — the
    * "what did the world look like at T" read that is THE reason an SCD2
    * table exists. A user's row qualifies when valid_from ≤ T < valid_to
    * (open intervals qualify on NULL valid_to).
    *
    * 100 TB shape: the SCD2 frame is the pathing windows' output (change
    * rows only — a sliver of the stream); the one-row bound broadcast
    * nested-loops in and the census is a states-bounded aggregate. */
  val scd2Snapshot: Q = (s, d) => {
    val bounds = events(s, d)
      .agg(expr("(min(unix_micros(ts)) + max(unix_micros(ts))) DIV 2")
        .as("snapshot_us"))
    scd2Build(s, d)
      .crossJoin(broadcast(bounds))
      .filter(unix_micros(col("valid_from")) <= col("snapshot_us") &&
        (col("valid_to").isNull ||
          unix_micros(col("valid_to")) > col("snapshot_us")))
      .groupBy(col("state"))
      .agg(count(lit(1)).as("n_users"), max(col("snapshot_us")).as("snapshot_us"))
      .orderBy(col("state"))
  }

  /** Daily-count anomaly score per event type: z-score of each day's count
    * against its trailing 7 days. The trailing window carries EXACT integer
    * moments (sum, sum of squares) and the z-score is one shared formula
    * over those integers — identical IEEE ops in both engines, so the
    * rounded score compares hash-exact. One window keyed on event_type;
    * state is 7 longs per partition. */
  val eventsAnomaly: Q = (s, d) => {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-7, -1)
    events(s, d)
      .groupBy(col("event_type"), expr("CAST(ts AS DATE)").as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("t_cnt", count(lit(1)).over(w))
      .withColumn("t_sum", sum(col("n")).over(w))
      .withColumn("t_ss", sum(col("n") * col("n")).over(w))
      .filter(col("t_cnt") === 7)
      .select(col("event_type"), col("day"), col("n"), col("t_sum"),
        // the exact expression text is mirrored in the oracle so both
        // engines execute the same IEEE op tree on the same exact integers
        round(expr(
          """CASE WHEN t_ss * 7 = t_sum * t_sum THEN 0.0
                  ELSE (n - t_sum / 7.0D)
                       / sqrt((t_ss - t_sum * (t_sum / 7.0D)) / 7.0D) END"""), 6)
          .as("zscore"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Classical time-series decomposition of the daily count series per
    * event type: observed = trend + seasonal + residual, with trend the
    * centered 7-day moving mean, seasonal the per-weekday mean of the
    * detrended series, and residual the remainder — the STL-shaped
    * readout that separates "we're growing" from "it's just Tuesday".
    * Defined on interior days only (a full ±3-day window exists). Every
    * component is RATIONAL with exact int64 numerators: detrended·7 =
    * 7y − Σ₇y, seasonal·7·n_dow = Σ_dow(7y − Σ₇y), residual·7·n_dow =
    * (7y − Σ₇y)·n_dow − Σ_dow(7y − Σ₇y) — each renders once as one
    * float division + round with identical formula text both engines,
    * so no double ever sums across rows.
    *
    * 100 TB shape: one (type, day) count aggregate collapses the
    * stream; the ±3 window, the weekday aggregate and its broadcast
    * join-back all ride the DAY-grain frame. */
  val eventsDecompose: Q = (s, d) => {
    val w7 = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val interior = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .withColumn("t_cnt", count(lit(1)).over(w7))
      .withColumn("t_sum", sum(col("y")).over(w7))
      .filter(col("t_cnt") === 7)
      .withColumn("det7", lit(7L) * col("y") - col("t_sum"))
      .withColumn("isodow", (weekday(col("day")) + lit(1)).cast(LongType))
      .sweepPin()
    val seas = interior.groupBy(col("event_type"), col("isodow"))
      .agg(sum(col("det7")).as("s_num"), count(lit(1)).as("n_dow"))
    interior.join(broadcast(seas), Seq("event_type", "isodow"))
      .select(col("event_type"), col("day"), col("y"),
        round(col("t_sum").cast(DoubleType) / 7.0d, 6).as("trend"),
        round(col("s_num").cast(DoubleType) /
          (lit(7L) * col("n_dow")).cast(DoubleType), 6).as("seasonal"),
        round((col("det7") * col("n_dow") - col("s_num")).cast(DoubleType) /
          (lit(7L) * col("n_dow")).cast(DoubleType), 6).as("residual"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Weekly growth accounting (the new/retained/resurrected/churned
    * quadrants): each active (user, week) classifies as NEW (first-ever
    * week), RETAINED (also active the immediately prior week) or
    * RESURRECTED (returning after a gap); CHURNED counts last week's
    * actives who went silent. The identity n_churned =
    * prev_active − n_retained holds by construction, and the quick
    * ratio (new + resurrected) / churned is the header number of every
    * growth review. All counts exact; one guarded division.
    *
    * 100 TB shape: the stream collapses to the distinct user-week grain
    * (one shuffle), the classification is one per-user LAG window plus
    * a user-keyed first-week join on that grain, and the week-over-week
    * churn join rides the WEEKS-sized census frame (broadcast). */
  val eventsLifecycle: Q = (s, d) => {
    val uw = events(s, d)
      .select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("week"))
      .distinct()
    val first = uw.groupBy(col("user_id")).agg(min(col("week")).as("fw"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("week"))
    val classified = uw
      .withColumn("prev", lag(col("week"), 1).over(byUser))
      .join(first, "user_id")
      .select(col("week"),
        when(col("week") === col("fw"), "new")
          .when(col("prev") === date_sub(col("week"), 7), "retained")
          .otherwise("resurrected").as("state"))
    val sizes = classified.groupBy(col("week"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("state") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("state") === "retained", 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("state") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"))
      .sweepPin()
    sizes
      .join(broadcast(sizes.select(date_add(col("week"), 7).as("week"),
        col("n_active").as("prev_active"))), Seq("week"), "left")
      .select(col("week"), col("n_active"), col("n_new"), col("n_retained"),
        col("n_resurrected"),
        (coalesce(col("prev_active"), lit(0L)) - col("n_retained"))
          .as("n_churned"),
        when(coalesce(col("prev_active"), lit(0L)) - col("n_retained") > 0L,
          round((col("n_new") + col("n_resurrected")).cast(DoubleType) /
            (coalesce(col("prev_active"), lit(0L)) - col("n_retained"))
              .cast(DoubleType), 6)).as("quick_ratio"))
      .orderBy(col("week"))
  }

  /** Daily new-vs-returning split: each active day's user count divided
    * into first-ever-seen-today vs returning — the growth-vs-retention
    * decomposition on every product dashboard. Two aggregates (first-seen
    * day per user, distinct active (day, user) pairs) joined on user_id;
    * the classification is exact date equality; one rounded division per
    * day row.
    *
    * 100 TB shape: both reductions key on user_id and reuse one hash
    * partitioning; the join is user-grain × user-grain (never the raw
    * stream); output is day-grain. */
  val eventsNewVsReturning: Q = (s, d) => {
    val e = events(s, d)
    val first = e.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("fd"))
    val active = e.select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
    active.join(first, "user_id")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("day") === col("fd"), 1L).otherwise(0L)).as("n_new"))
      .select(col("day"), col("n_active"), col("n_new"),
        (col("n_active") - col("n_new")).as("n_returning"),
        round(col("n_new").cast(DoubleType) / col("n_active"), 6)
          .as("pct_new"))
      .orderBy(col("day"))
  }

  /** Windowed conversion funnel: view → click within 24 h of the FIRST
    * view → purchase within 24 h of that first qualifying click — the
    * attribution-window variant of [[eventsFunnel]] (an unbounded funnel
    * overcounts: a purchase a month after the click is not that click's
    * conversion). Same chained min-aggregate shape, each stage adding an
    * upper time bound; per-stage surviving-user counts out.
    *
    * 100 TB shape: identical to [[eventsFunnel]] — three user-keyed
    * reductions reusing one hash partitioning; the interval bound is a
    * filter, not a join condition blowup. */
  val eventsFunnelWindowed: Q = (s, d) => {
    val e = events(s, d)
    val t1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = e.filter(col("event_type") === "click")
      .join(t1, "user_id")
      .filter(col("ts") > col("t1") &&
        col("ts") <= col("t1") + expr("INTERVAL 24 HOURS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val t3 = e.filter(col("event_type") === "purchase")
      .join(t2, "user_id")
      .filter(col("ts") > col("t2") &&
        col("ts") <= col("t2") + expr("INTERVAL 24 HOURS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val stages = Seq("1_view" -> t1, "2_click_24h" -> t2,
      "3_purchase_24h" -> t3)
    stages.map { case (name, df) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(name).as("stage"), col("n_users"))
    }.reduce(_ unionAll _).orderBy(col("stage"))
  }

  /** Robust daily-count monitor per event type: the median/MAD twin of
    * [[eventsAnomaly]] — a level shift or fat-tailed day poisons a
    * mean/σ z-score (the outlier inflates its own yardstick) while the
    * median absolute deviation barely moves. Both medians are LOWER
    * medians picked by rank ((n+1) DIV 2 over the sorted day counts,
    * ties broken by day), so every statistic stays an exact integer end
    * to end; a day flags when |n − median| > 3·MAD in pure int64
    * arithmetic — no float enters the query at all.
    *
    * 100 TB shape: one (type, day) count aggregate collapses the event
    * stream; both rank windows and the two broadcast annotations ride
    * the DAY-grain frame (types × days rows). */
  val eventsAnomalyMad: Q = (s, d) => {
    // the day-grain aggregate pins so the event stream scans ONCE — the
    // median, deviation and MAD branches all reuse the tiny frame
    val daily = events(s, d)
      .groupBy(col("event_type"), expr("CAST(ts AS DATE)").as("day"))
      .agg(count(lit(1)).as("n"))
      .sweepPin()
    def lowerMedian(df: DataFrame, value: String, out: String): DataFrame = {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col(value), col("day"))
      df.withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(
          Window.partitionBy(col("event_type"))))
        .filter(col("rn") === expr("(cnt + 1) DIV 2"))
        .select(col("event_type"), col(value).as(out))
    }
    val med = lowerMedian(daily, "n", "median_n")
    val dev = daily.join(broadcast(med), "event_type")
      .withColumn("ad", abs(col("n") - col("median_n")))
    val mad = lowerMedian(dev, "ad", "mad_n")
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), max(col("median_n")).as("median_n"),
        max(col("mad_n")).as("mad_n"),
        sum(when(col("ad") > lit(3L) * col("mad_n"), 1L).otherwise(0L))
          .as("n_anomalies"),
        max(col("ad")).as("max_abs_dev"))
      .orderBy(col("event_type"))
  }

  /** Held-out unigram perplexity per language: documents hash-split
    * 80/20 by content digest (the [[graft.operators.PipelineOps]]
    * split convention — leakage impossible, a duplicated text lands on
    * one side), an add-one-smoothed unigram LM fits on the train side,
    * and the held-out side scores PPL = exp(−(1/N_h)·Σ ln p(w)) with
    * p(w) = (c_train(w)+1)/(N_train+V_train+1) — unseen words take the
    * +1 floor, so OOV mass is defined without a backoff table. The
    * eval loop every tokenizer/corpus ablation runs. Logs quantize to
    * DECIMAL(18,6) before the count-weighted exact sum ([[lmBigramEntropy]]
    * convention); the one exp+round lands on the language-grain output.
    *
    * 100 TB shape: ONE (lang, word) aggregate carries both splits as
    * conditional counts (the corpus tokenizes and shuffles exactly
    * once); the held-out fold and the broadcast language totals ride
    * the vocabulary-grain frame. */
  val lmHeldoutPpl: Q = (s, d) => {
    val dec6 = DecimalType(18, 6)
    def qln(c: org.apache.spark.sql.Column) =
      round(log(c.cast(DoubleType)), 6).cast(dec6)
    val wc = docs(s, d)
      .select(col("lang"),
        (graft.functions.PolyHash.poly_hash(md5(col("text"))) % 100 < 80)
          .as("is_train"),
        explode(split(col("text"), " ")).as("w"))
      .groupBy(col("lang"), col("w"))
      .agg(sum(when(col("is_train"), 1L).otherwise(0L)).as("c_tr"),
        sum(when(col("is_train"), 0L).otherwise(1L)).as("c_h"))
      .sweepPin()
    val trainTot = wc.filter(col("c_tr") > 0L).groupBy(col("lang"))
      .agg(sum(col("c_tr")).as("n_train"), count(lit(1)).as("v_train"))
    wc.filter(col("c_h") > 0L)
      .join(broadcast(trainTot), "lang")
      .groupBy(col("lang"))
      .agg(max(col("n_train")).as("n_train"), max(col("v_train")).as("v_train"),
        sum(col("c_h")).as("n_heldout"),
        sum(when(col("c_tr") === 0L, col("c_h")).otherwise(0L)).as("n_oov"),
        sum(col("c_h") *
          (qln(col("c_tr") + 1L) -
            qln(col("n_train") + col("v_train") + 1L))).as("st"))
      .select(col("lang"), col("n_train"), col("v_train"), col("n_heldout"),
        round(col("n_oov").cast(DoubleType) / col("n_heldout"), 6)
          .as("oov_rate"),
        round(exp(-col("st").cast(DoubleType) / col("n_heldout")), 6)
          .as("ppl"))
      .orderBy(col("lang"))
  }

  /** Daily-count correlation matrix: Pearson r between every event-type
    * pair's day-by-day counts — the "do errors spike with signups"
    * co-movement readout. Each pair carries exact product moments
    * (Σx, Σy, Σxy, Σx², Σy² — the squares widen to DECIMAL(38,0)
    * BEFORE multiplying, the Spark twin of the oracle's HUGEINT, since
    * day-counts square past int64 at ~1e10 events/day) and r evaluates
    * once per pair in doubles with identical formula text both engines.
    *
    * 100 TB shape: one (day, type) count aggregate collapses the stream;
    * the pair join and moment fold ride the DAY-grain frame
    * (days × types rows, self-joined on day — types² output). */
  val eventsTypeCorr: Q = (s, d) => {
    val dec38 = DecimalType(38, 0)
    // day-grain aggregate pins: both self-join sides reuse one event scan
    val daily = events(s, d)
      .groupBy(expr("CAST(ts AS DATE)").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .sweepPin()
    val a = daily.select(col("day"), col("event_type").as("type_a"),
      col("n").as("x"))
    val b = daily.select(col("day"), col("event_type").as("type_b"),
      col("n").as("y"))
    a.join(b, "day").filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x").cast(dec38) * col("y")).as("sxy"),
        sum(col("x").cast(dec38) * col("x")).as("sxx"),
        sum(col("y").cast(dec38) * col("y")).as("syy"))
      .select(col("type_a"), col("type_b"), col("n_days"),
        round((col("n_days").cast(DoubleType) * col("sxy").cast(DoubleType) -
            col("sx").cast(DoubleType) * col("sy").cast(DoubleType)) /
          (sqrt(col("n_days").cast(DoubleType) * col("sxx").cast(DoubleType) -
            col("sx").cast(DoubleType) * col("sx").cast(DoubleType)) *
           sqrt(col("n_days").cast(DoubleType) * col("syy").cast(DoubleType) -
            col("sy").cast(DoubleType) * col("sy").cast(DoubleType))), 6)
          .as("pearson_r"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Daily top-20 leaderboard churn: how much of each day's top-20
    * most-active users carries over from the previous calendar day —
    * overlap count, exact-integer Jaccard of the two sets, and the
    * entrant count. High churn means engagement is broad; zero churn
    * means the same whales every day. Ranks break ties by user_id so
    * the leaderboard is deterministic; a day reports only if the
    * previous calendar day has a leaderboard.
    *
    * 100 TB shape: one (day, user) count aggregate collapses the
    * stream; the top-20 cut is a rank window over the user-day frame
    * keyed by day (at extreme user counts the evolution is a bounded
    * per-day top-k aggregate — the [[graft.functions.TopKAggregator]]
    * pattern); everything after rides the days×20 leaderboard. */
  val eventsTopkChurn: Q = (s, d) => {
    val byDay = Window.partitionBy(col("day"))
      .orderBy(col("n").desc, col("user_id"))
    val top = events(s, d)
      .groupBy(expr("CAST(ts AS DATE)").as("day"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(byDay))
      .filter(col("rn") <= 20)
      .select(col("day"), col("user_id"))
      .sweepPin()
    val sizes = top.groupBy(col("day")).agg(count(lit(1)).as("k"))
    val common = top.as("t")
      .join(top.select(date_add(col("day"), 1).as("day"),
        col("user_id")).as("p"), Seq("day", "user_id"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_common"))
    sizes.as("s")
      .join(broadcast(sizes.select(date_add(col("day"), 1).as("day"),
        col("k").as("k_prev"))), "day")
      .join(broadcast(common), Seq("day"), "left")
      .select(col("day"), col("k"), col("k_prev"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        round(coalesce(col("n_common"), lit(0L)).cast(DoubleType) /
          (col("k") + col("k_prev") -
            coalesce(col("n_common"), lit(0L))).cast(DoubleType), 6)
          .as("jaccard"),
        (col("k") - coalesce(col("n_common"), lit(0L))).as("new_entrants"))
      .orderBy(col("day"))
  }

  /** Cross-document trigram novelty: the share of a document's trigrams
    * that appear in no OTHER document — the memorization/contamination
    * signal (a doc of all-shared trigrams is boilerplate or a copy; one of
    * all-novel trigrams is unique content). Trigram document frequencies
    * come from one corpus-wide aggregate; the per-doc tally joins on the
    * trigram key (vocabulary-sized, shuffles once); novelty is one rounded
    * division of exact integers. */
  val textNovelty: Q = (s, d) => {
    // the trigram string never leaves the map side: both shuffles (the
    // per-doc fold, the df window) key on the trigram's PolyHash int64 —
    // ~8 bytes per row in the Exchange instead of a 20-40 byte string, a
    // several-fold shuffle-byte cut at corpus scale. The DuckDB oracle
    // replays the identical hash, so even a hash collision merges the
    // same df groups in both engines.
    val tri = docs(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(w) - 2),
             i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1),
                            element_at(w, i + 2)))""")).as("tri"))
      .select(col("doc_id"), graft.functions.PolyHash.poly_hash(col("tri")).as("th"))
    // One pass, no instance-sized join: fold the instance stream to
    // (doc_id, th, c) once (map-side partials shrink it to
    // distinct-pairs-sized in the exchange), read tri_df as a count window
    // over th on that deduped frame (rows per th = distinct docs, exactly
    // the old distinct+groupBy), and weight by c. The old spelling
    // exploded the trigram stream twice and shuffled the RAW instance
    // stream through the tally join — corpus-sized bytes; this one's
    // largest exchange is the deduped pair frame.
    val perDoc = tri.groupBy(col("doc_id"), col("th"))
      .agg(count(lit(1)).as("c"))
    val wTh = Window.partitionBy(col("th"))
    perDoc.withColumn("tri_df", count(lit(1)).over(wTh))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tri"),
        sum(when(col("tri_df") >= 2, col("c")).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_tri"), col("n_shared"),
        round(lit(1.0) - col("n_shared").cast(DoubleType) / col("n_tri"), 6)
          .as("novelty"))
      .orderBy(col("doc_id"))
  }

  /** DAU / WAU / stickiness per day — the rolling-distinct shape: distinct
    * counts can't ride a sliding window frame, so the trailing-7-day active
    * set is a range join of the day grid against the distinct (user, day)
    * pairs. The pair table is the ONLY thing that scales with volume
    * (users × active-days, already one deduplicating shuffle); the grid side
    * is O(days) and broadcasts, so the range join expands each pair into at
    * most 7 grid rows. Stickiness is one rounded division. */
  val eventsDauWau: Q = (s, d) => {
    val ud = events(s, d)
      .select(expr("CAST(ts AS DATE)").as("day"), col("user_id"))
      .distinct()
    val days = ud.select(col("day")).distinct()
    val dau = ud.groupBy(col("day")).agg(countDistinct(col("user_id")).as("dau"))
    val wau = broadcast(days.select(col("day").as("g_day")))
      .join(ud, col("day").between(date_sub(col("g_day"), 6), col("g_day")))
      .groupBy(col("g_day"))
      .agg(countDistinct(col("user_id")).as("wau"))
      .withColumnRenamed("g_day", "day")
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast(DoubleType) / col("wau"), 6).as("stickiness"))
      .orderBy(col("day"))
  }

  /** Consecutive-run pattern detection (the MATCH_RECOGNIZE shape Spark
    * lacks): runs of ≥ 3 consecutive 'error' events per user, with the
    * run's bounds and length. Classic run-length grouping — a change flag
    * (lag), a running group id (cumsum), one aggregate — all over the same
    * (user_id; ts, event_id) sort, so the whole detection is one window
    * partitioning end to end. */
  val eventsErrorBurst: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w) === col("event_type"), 0L).otherwise(1L))
      .withColumn("grp", sum(col("chg")).over(w))
      .filter(col("event_type") === "error")
      .groupBy(col("user_id"), col("grp"))
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        count(lit(1)).as("run_len"))
      .filter(col("run_len") >= 3)
      .select(col("user_id"), col("start_ts"), col("end_ts"), col("run_len"))
      .orderBy(col("user_id"), col("start_ts"))
  }

  /** One-row corpus health report — the dashboard number a pipeline owner
    * reads before a training run: corpus size, language/source spread,
    * exact-duplicate share, quality-gate pass share. Every component is one
    * aggregate over an existing checked operator's logic (md5 dedup, the
    * integer-exact C4 gate), cross-joined into a single row; the two shares
    * are single rounded divisions. */
  val corpusReport: Q = (s, d) => {
    val base = docs(s, d).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"))
    val dups = docs(s, d)
      .groupBy(md5(col("text")).as("h")).agg(count(lit(1)).as("n"))
      .agg(sum(when(col("n") > 1, col("n")).otherwise(0L)).as("n_dup_docs"))
    val kept = PipelineOps.qualityFilter(s, d)
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
    base.crossJoin(dups).crossJoin(kept)
      .select(col("n_docs"), col("n_langs"), col("n_sources"),
        col("n_dup_docs"),
        round(col("n_dup_docs").cast(DoubleType) / col("n_docs"), 6).as("dup_share"),
        col("n_kept"),
        round(col("n_kept").cast(DoubleType) / col("n_docs"), 6).as("kept_share"))
  }

  /** Join-key skew audit on `lineitem.l_orderkey` (the fact table's join
    * key): the top-20 hottest keys with their row share, plus the
    * key-cardinality and skew-ratio census (hottest key ÷ mean rows/key)
    * riding every row — the report that decides whether a join needs
    * salting or AQE skew handling BEFORE it runs at 100 TB. All counts
    * exact; the two ratios divide exact longs once.
    *
    * 100 TB shape: one key-grain count aggregate (map-side combined),
    * TakeOrdered top-20 over it — never a global sort — and a one-row
    * census broadcast. */
  val profileKeySkew: Q = (s, d) => {
    val counts = Tables.load(s, d, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .sweepPin()
    val census = counts.agg(count(lit(1)).as("n_keys"),
      sum(col("n")).as("n_rows"), max(col("n")).as("max_n"))
    counts
      .crossJoin(broadcast(census))
      .select(col("l_orderkey"), col("n"),
        round(col("n").cast(DoubleType) / col("n_rows").cast(DoubleType), 6)
          .as("share"),
        col("n_keys"),
        round(col("max_n").cast(DoubleType) * col("n_keys").cast(DoubleType) /
          col("n_rows").cast(DoubleType), 6).as("skew_ratio"))
      .orderBy(col("n").desc, col("l_orderkey"))
      .limit(20)
  }

  /** Columns profiled by [[dataProfile]] — string/integer only: their
    * to-string casts render identically in both engines, unlike doubles
    * (shortest-repr vs Java formatting) or timestamps (fraction padding). */
  private val profileCols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")

  /** Table profiling (the ANALYZE-style report a pipeline runs before
    * trusting a new drop): per column, row/null/distinct counts and
    * min/max rendered as strings for a uniform schema. ONE scan computes
    * every column's stats in a single multi-distinct aggregate (Catalyst
    * plans the distinct aggregates with one Expand — k columns cost one
    * pass over the data, not k); the per-column rows then unfold from the
    * single result row driver-side-free via an array explode. At 100 TB
    * the exact per-column distincts would swap to approx_count_distinct
    * sketches — same plan shape, constant memory. */
  val dataProfile: Q = (s, d) => {
    val t = Tables.load(s, d, "orders")
    val aggExprs = count(lit(1)).as("n_rows") +: profileCols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c"),
      min(col(c)).cast(StringType).as(s"mn_$c"),
      max(col(c)).cast(StringType).as(s"mx_$c")))
    t.agg(aggExprs.head, aggExprs.tail: _*)
      .select(explode(array(profileCols.map(c => struct(
        lit(c).as("col_name"), col("n_rows"),
        (col("n_rows") - col(s"nn_$c")).as("n_nulls"),
        col(s"nd_$c").as("n_distinct"),
        col(s"mn_$c").as("min_v"), col(s"mx_$c").as("max_v"))): _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }

  /** Per-document perplexity under the corpus unigram LM — the
    * model-free quality prior curation pipelines rank documents by
    * (rare-word soup scores high, natural prose low). Exactness follows
    * the house float rule: each distinct corpus count c_w takes ONE
    * `round(ln c_w, 6)` (safe to an engine's ulp), the per-doc sum
    * Σ c_dw·ln(c_w) accumulates in DECIMAL — exact and order-free under
    * any partitioning — and the final cross-entropy/perplexity floats
    * compute once from exact inputs with identical formula text in both
    * engines. Plan: tokens collapse map-side to per-doc distinct-word
    * counts; every exchange (the count aggregate, the vocabulary join)
    * keys on the word's PolyHash int64, never the string; the corpus
    * total rides in as a broadcast one-row aggregate. */
  val textPerplexity: Q = (s, d) => {
    val occ = docs(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .select(col("doc_id"), graft.functions.PolyHash.poly_hash(col("word")).as("th"))
    val perDoc = occ.groupBy(col("doc_id"), col("th")).agg(count(lit(1)).as("c_dw"))
    val cw = perDoc.groupBy(col("th")).agg(sum(col("c_dw")).as("cw"))
    val tot = cw.agg(sum(col("cw")).as("n_total"))
    val term = round(log(col("cw").cast(DoubleType)), 6).cast(DecimalType(18, 6))
    perDoc.join(cw, "th")
      .groupBy(col("doc_id"))
      .agg(sum(col("c_dw")).as("n_words"),
        sum(term * col("c_dw")).as("s"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("n_words"),
        round(log(col("n_total").cast(DoubleType))
          - col("s").cast(DoubleType) / col("n_words"), 6).as("cross_entropy"),
        round(exp(log(col("n_total").cast(DoubleType))
          - col("s").cast(DoubleType) / col("n_words")), 6).as("perplexity"))
      .orderBy(col("doc_id"))
  }

  /** Global-rank helper: the [[RelOps.sortGlobalIndex]] two-phase prefix
    * spelling factored for reuse — range partition + per-partition
    * row_number + broadcast offset table — appending a 0-based `rankName`
    * column in the given sort order. Fully parallel at any size (the
    * offset window touches #partitions rows, never data rows); the
    * empty-PARTITION-BY window alternative funnels the frame through one
    * task. */
  /** Rows per range partition in [[withGlobalRank]] — partition count
    * derives from the caller-known row count, so the rank scales out with
    * data instead of pinning a constant: 1 partition at fixture scale
    * (skipping the range sampler entirely), thousands at 10⁹ rows. */
  private val rankRowsPerPart = 2L * 1000 * 1000

  private[graft] def withGlobalRank(s: SparkSession, df: DataFrame,
      sortCols: Seq[org.apache.spark.sql.Column], rankName: String,
      nRows: Long): DataFrame = {
    // range-partition on the sort key (partition ids follow the global
    // order), row_number per partition in parallel, then a
    // #partitions-row offset table broadcast back: pos = offset + rn − 1.
    // The old rdd.zipWithIndex spelling deserialized every row to
    // GenericRow, exited whole-stage codegen, and paid zipWithIndex's
    // extra count job per rank — ×3 in rfm_segment (RelOps.sortGlobalIndex
    // measured the same swap at 5.7 s → ~1 s for one rank at sf0.1). The
    // ranged frame is PINNED (barrier-free) so the offset aggregate and
    // the join-back read the SAME materialized boundaries — range
    // boundaries are sampled per exchange, and two independent
    // evaluations could otherwise disagree (the watermark_audit
    // evaluation-order note).
    val parts = ((nRows + rankRowsPerPart - 1) / rankRowsPerPart)
      .max(1L).min(100000L).toInt
    // one partition's worth of rows: a single-task global window IS the
    // cheapest spelling (one exchange, no sampler, no offset join) — the
    // single-task trap the scaladoc warns about only exists when the
    // frame EXCEEDS a partition, which is exactly what `parts` gates on
    if (parts <= 1)
      return df.withColumn(rankName,
        row_number().over(Window.orderBy(sortCols: _*)).cast(LongType) - 1L)
    val ranged = df.repartitionByRange(parts, sortCols: _*)
      .withColumn("__part", spark_partition_id())
      .sweepPin()
    val wIn = Window.partitionBy(col("__part")).orderBy(sortCols: _*)
    val local = ranged.withColumn("__rn", row_number().over(wIn).cast(LongType))
    val wOff = Window.orderBy(col("__part"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("__part")).agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select(col("__part"), col("__off"))
    local.join(broadcast(offsets), "__part")
      .withColumn(rankName, col("__off") + col("__rn") - 1L)
      .drop("__part", "__rn", "__off")
  }

  /** RFM customer segmentation — the classic lifecycle-marketing cut of the
    * orders table: recency (days since the customer's last order, against
    * the corpus-wide max date), frequency (order count), monetary (exact
    * decimal revenue), each quartile-scored 1–4 and concatenated into a
    * segment code. Scores derive from GLOBAL ranks ([[withGlobalRank]] —
    * three range-sorts of the per-customer aggregate, never an
    * empty-PARTITION window) with the quartile boundary as pure integer
    * arithmetic, `rank·4 DIV n + 1`, deterministic under the (metric,
    * custkey) total order and replayed verbatim by the oracle's
    * row_number spelling. The fact table is touched once (the per-customer
    * aggregate); everything after is customer-bounded. */
  val rfmSegment: Q = (s, d) => {
    val ord = Tables.load(s, d, "orders")
    val maxd = ord.agg(max(col("o_orderdate")).as("maxd"))
    val base = ord.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice").cast(DecimalType(18, 6))).as("monetary_dec"))
      .crossJoin(broadcast(maxd))
      .select(col("o_custkey").as("c_custkey"),
        datediff(col("maxd"), col("last_order")).cast(LongType).as("recency_days"),
        col("frequency"), col("monetary_dec"))
      .sweepPin() // three rank passes + the count read the same fold
    // one bounded driver scalar (customer-grain count): sizes the rank
    // range partitions AND replaces the former one-row crossJoin broadcast
    val nRows = base.count()
    val ranked = withGlobalRank(s,
      withGlobalRank(s,
        withGlobalRank(s, base,
          Seq(col("recency_days"), col("c_custkey")), "r_rank", nRows),
        Seq(col("frequency").desc, col("c_custkey")), "f_rank", nRows),
      Seq(col("monetary_dec").desc, col("c_custkey")), "m_rank", nRows)
    ranked.withColumn("n", lit(nRows))
      .select(col("c_custkey"), col("recency_days"), col("frequency"),
        round(col("monetary_dec").cast(DoubleType), 6).as("monetary"),
        expr("r_rank * 4 DIV n + 1").as("r_score"),
        expr("f_rank * 4 DIV n + 1").as("f_score"),
        expr("m_rank * 4 DIV n + 1").as("m_score"),
        concat(expr("r_rank * 4 DIV n + 1"), lit("-"),
          expr("f_rank * 4 DIV n + 1"), lit("-"),
          expr("m_rank * 4 DIV n + 1")).as("segment"))
      .orderBy(col("c_custkey"))
  }

  /** Vocabulary-growth curve (Heaps' law measurement) — the corpus
    * statistic that tells a tokenizer/dedup team whether more data still
    * buys new vocabulary: docs bucketed into 10 equal id-ranges, and per
    * bucket the cumulative token count vs cumulative DISTINCT words seen
    * so far. The "distinct so far" prefix is computed without any
    * per-prefix rescan: each word's FIRST bucket is one min-aggregate,
    * new-word counts group by that, and the 10-row bucket frame takes a
    * running sum — corpus cost is one tokenize pass + two word-keyed
    * aggregates regardless of bucket count. The final window runs over 10
    * rows (bucket-bounded, never corpus-bounded). */
  val textVocabGrowth: Q = (s, d) => {
    val nd = docs(s, d).agg((max(col("doc_id")) + 1).as("nd"))
    val db = docs(s, d).crossJoin(broadcast(nd))
      .select(expr("least(doc_id * 10 DIV nd, 9)").as("bucket"),
        explode(split(col("text"), " ")).as("word"))
    val tok = db.groupBy(col("bucket")).agg(count(lit(1)).as("n_tokens"))
    val nw = db.groupBy(col("word")).agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_words"))
    val w = Window.orderBy(col("bucket")) // 10 rows — bucket-bounded
    tok.join(nw, Seq("bucket"), "left")
      .select(col("bucket"), col("n_tokens"),
        coalesce(col("new_words"), lit(0L)).as("new_words"))
      .select(col("bucket"), col("n_tokens"),
        sum(col("n_tokens")).over(w).as("cum_tokens"),
        col("new_words"),
        sum(col("new_words")).over(w).as("cum_distinct_words"))
      .orderBy(col("bucket"))
  }

  /** Last-touch marketing attribution: every purchase is credited to the
    * user's most recent PRECEDING click's channel (props.k bucketed into 4
    * channels), provided the click is at most 7 days stale — the standard
    * conversion-attribution query over a click/purchase event log.
    *
    * Spelled as ONE pass over the merged touch/conversion stream: a
    * per-user event-time window carries the last click's channel and time
    * forward (`last(..., ignoreNulls)` over ROWS UNBOUNDED PRECEDING), so
    * the plan is a single user-keyed sort-window — no click×purchase range
    * join whose output would be quadratic in a user's activity. At scale
    * the one exchange is the user-key window sort; the final per-channel
    * rollup is 4 groups with map-side partials. Ties are impossible in the
    * (ts, event_id) order — event_id is unique — so both engines walk the
    * identical sequence. */
  val eventsAttribution: Q = (s, d) => {
    val e = events(s, d).filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value"),
        when(col("event_type") === "click",
          concat(lit("ch_"), expr(
            "cast(get_json_object(props, '$.k') as bigint) div 25")))
          .as("ch"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("last_ch", last(col("ch"), ignoreNulls = true).over(w))
      .withColumn("last_click_ts",
        last(when(col("ch").isNotNull, col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("last_ch").isNotNull &&
        col("ts") <= col("last_click_ts") + expr("INTERVAL 7 DAYS"))
      .groupBy(col("last_ch").as("channel"))
      .agg(count(lit(1)).as("conversions"),
        sum(col("value").cast(DecimalType(18, 6))).as("val_dec"))
      .select(col("channel"), col("conversions"),
        round(col("val_dec").cast(DoubleType), 6).as("attributed_value"))
      .orderBy(col("channel"))
  }

  val queries: Map[String, Q] = Map(
    "events_attribution" -> eventsAttribution,
    "data_profile" -> dataProfile,
    "text_perplexity" -> textPerplexity,
    "events_error_burst" -> eventsErrorBurst,
    "corpus_report" -> corpusReport,
    "events_dau_wau" -> eventsDauWau,
    "events_anomaly" -> eventsAnomaly,
    "text_novelty" -> textNovelty,
    "events_funnel" -> eventsFunnel,
    "retention_cohort" -> retentionCohort,
    "lm_trigram" -> lmTrigram,
    "lm_bigram_entropy" -> lmBigramEntropy,
    "text_boilerplate" -> textBoilerplate,
    "text_diversity" -> textDiversity,
    "events_pathing" -> eventsPathing,
    "scd2_build" -> scd2Build,
    "events_ab_test" -> eventsAbTest,
    "events_streaks" -> eventsStreaks,
    "lm_collocations" -> lmCollocations,
    "lm_greedy_decode" -> lmGreedyDecode,
    "events_time_to_convert" -> eventsTimeToConvert,
    "events_sequence_pattern" -> eventsSequencePattern,
    "events_user_activity" -> eventsUserActivity,
    "events_trend" -> eventsTrend,
    "events_seasonality" -> eventsSeasonality,
    "events_autocorr" -> eventsAutocorr,
    "events_changepoint" -> eventsChangepoint,
    "events_pmi" -> eventsPmi,
    "events_forecast_naive" -> eventsForecastNaive,
    "events_transition_entropy" -> eventsTransitionEntropy,
    "events_survival" -> eventsSurvival,
    "events_cohort_ltv" -> eventsCohortLtv,
    "events_gini" -> eventsGini,
    "events_whale_share" -> eventsWhaleShare,
    "events_interarrival" -> eventsInterarrival,
    "lm_unigram_kl" -> lmUnigramKl,
    "events_new_vs_returning" -> eventsNewVsReturning,
    "events_funnel_windowed" -> eventsFunnelWindowed,
    "events_decompose" -> eventsDecompose,
    "profile_key_skew" -> profileKeySkew,
    "events_lifecycle" -> eventsLifecycle,
    "scd2_snapshot" -> scd2Snapshot,
    "privacy_k_anon" -> privacyKAnon,
    "privacy_safe_view" -> privacySafeView,
    "events_hour_profile" -> eventsHourProfile,
    "session_stats" -> sessionStats,
    "events_value_benford" -> eventsValueBenford,
    "events_bot_suspects" -> eventsBotSuspects,
    "events_dq_report" -> eventsDqReport,
    "events_anomaly_mad" -> eventsAnomalyMad,
    "lm_heldout_ppl" -> lmHeldoutPpl,
    "events_type_corr" -> eventsTypeCorr,
    "events_topk_churn" -> eventsTopkChurn,
    "lm_kneser_ney" -> lmKneserNey,
    "rfm_segment" -> rfmSegment,
    "text_vocab_growth" -> textVocabGrowth,
  )

  val oracle: Map[String, String] = Map(
    "events_attribution" ->
      """WITH e AS (
           SELECT user_id, date_trunc('microseconds', ts) AS ts, event_id,
             event_type, value,
             CASE WHEN event_type = 'click' THEN 'ch_' || CAST(
               CAST(json_extract_string(props, '$.k') AS BIGINT) // 25
               AS VARCHAR) END AS ch
           FROM events WHERE event_type IN ('click', 'purchase')),
         a AS (
           SELECT *,
             LAST_VALUE(ch IGNORE NULLS) OVER w AS last_ch,
             LAST_VALUE(CASE WHEN ch IS NOT NULL THEN ts END IGNORE NULLS)
               OVER w AS last_click_ts
           FROM e
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT last_ch AS channel, COUNT(*) AS conversions,
           round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS attributed_value
         FROM a
         WHERE event_type = 'purchase' AND last_ch IS NOT NULL
           AND ts <= last_click_ts + INTERVAL 7 DAY
         GROUP BY last_ch ORDER BY last_ch""",
    "data_profile" -> profileCols.map(c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
           CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
           COUNT(DISTINCT $c) AS n_distinct,
           CAST(MIN($c) AS VARCHAR) AS min_v, CAST(MAX($c) AS VARCHAR) AS max_v
         FROM orders""").mkString("SELECT * FROM (\n", "\nUNION ALL\n",
        "\n) ORDER BY col_name"),
    // keyed on the word's PolyHash like the Spark plan; the per-occurrence
    // ln term rounds once per distinct count, sums exactly in DECIMAL, and
    // the final floats share formula text with the Spark side
    "text_perplexity" ->
      s"""WITH occ AS (
           SELECT doc_id, ${graft.functions.PolyHash.duckSql("word")} AS th
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                 FROM documents)),
         per_doc AS (
           SELECT doc_id, th, COUNT(*) AS c_dw FROM occ GROUP BY doc_id, th),
         cw AS (SELECT th, CAST(SUM(c_dw) AS BIGINT) AS cw FROM per_doc GROUP BY th),
         tot AS (SELECT CAST(SUM(cw) AS BIGINT) AS n_total FROM cw),
         agg AS (
           SELECT p.doc_id, CAST(SUM(p.c_dw) AS BIGINT) AS n_words,
             SUM(CAST(round(ln(CAST(c.cw AS DOUBLE)), 6) AS DECIMAL(18,6)) * p.c_dw) AS s
           FROM per_doc p JOIN cw c USING (th) GROUP BY p.doc_id)
         SELECT doc_id, n_words,
           round(ln(CAST(n_total AS DOUBLE)) - CAST(s AS DOUBLE) / n_words, 6)
             AS cross_entropy,
           round(exp(ln(CAST(n_total AS DOUBLE)) - CAST(s AS DOUBLE) / n_words), 6)
             AS perplexity
         FROM agg CROSS JOIN tot ORDER BY doc_id""",
    "events_error_burst" ->
      """WITH e AS (
           SELECT user_id, date_trunc('microseconds', ts) AS ts, event_id, event_type,
             CASE WHEN LAG(event_type) OVER w = event_type THEN 0 ELSE 1 END AS chg
           FROM events
           WINDOW w AS (PARTITION BY user_id
                        ORDER BY date_trunc('microseconds', ts), event_id)),
         g AS (
           SELECT user_id, ts, event_type,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS grp
           FROM e),
         runs AS (
           SELECT user_id, MIN(ts) AS start_ts, MAX(ts) AS end_ts,
                  COUNT(*) AS run_len
           FROM g WHERE event_type = 'error'
           GROUP BY user_id, grp)
         SELECT user_id, start_ts, end_ts, run_len FROM runs
         WHERE run_len >= 3 ORDER BY user_id, start_ts""",
    "corpus_report" ->
      """WITH base AS (
           SELECT COUNT(*) AS n_docs, COUNT(DISTINCT lang) AS n_langs,
                  COUNT(DISTINCT source) AS n_sources
           FROM documents),
         dups AS (
           SELECT CAST(COALESCE(SUM(CASE WHEN n > 1 THEN n ELSE 0 END), 0) AS BIGINT)
             AS n_dup_docs
           FROM (SELECT md5(text) AS h, COUNT(*) AS n FROM documents GROUP BY 1)),
         m AS (
           SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(length(regexp_replace(text, ' ', '', 'g')) AS BIGINT)
               - CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS alpha,
             CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS symbols,
             CAST(length(text) AS BIGINT) AS total
           FROM documents),
         kept AS (
           SELECT CAST(SUM(CASE WHEN NOT (n_words < 30)
                      AND NOT (alpha < n_words * 3 OR alpha > n_words * 10)
                      AND NOT (symbols * 10 >= total) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept
           FROM m)
         SELECT n_docs, n_langs, n_sources, n_dup_docs,
           round(CAST(n_dup_docs AS DOUBLE) / n_docs, 6) AS dup_share,
           n_kept,
           round(CAST(n_kept AS DOUBLE) / n_docs, 6) AS kept_share
         FROM base, dups, kept""",
    "events_trend" ->
      """WITH daily AS (
           SELECT event_type,
             CAST(date_diff('day', DATE '1970-01-01',
               CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
           FROM events
           GROUP BY event_type, x),
         mo AS (
           SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(y) AS BIGINT) AS total_events,
             SUM(CAST(x AS HUGEINT)) AS sx,
             SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sx2
           FROM daily GROUP BY event_type)
         SELECT event_type, n_days, total_events,
           CASE WHEN CAST(n_days AS HUGEINT) * sx2 != sx * sx THEN
             round(CAST(n_days * sxy - sx * sy AS DOUBLE)
               / CAST(n_days * sx2 - sx * sx AS DOUBLE), 6) END AS slope
         FROM mo ORDER BY event_type""",
    "events_seasonality" ->
      """WITH perdow AS (
           SELECT event_type,
             CAST(date_part('isodow', ts) AS BIGINT) AS isodow,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6))
               AS val_dec
           FROM events GROUP BY 1, 2)
         SELECT event_type, isodow, n,
           round(CAST(val_dec AS DOUBLE), 6) AS value_sum,
           round(CAST(n * 7 AS DOUBLE) /
             CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE), 6)
             AS dow_index
         FROM perdow ORDER BY event_type, isodow""",
    "events_autocorr" -> {
      val lagCols = (1 to autocorrMaxLag).map(k =>
        s"LAG(y, $k) OVER (PARTITION BY event_type ORDER BY day) AS l$k")
        .mkString(",\n             ")
      val unions = (1 to autocorrMaxLag).map(k =>
        s"SELECT event_type, CAST($k AS BIGINT) AS lag, y, l$k AS yl FROM lagged WHERE l$k IS NOT NULL")
        .mkString("\n           UNION ALL ")
      s"""WITH daily AS (
           SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         lagged AS (
           SELECT event_type, day, y,
             $lagCols
           FROM daily),
         st AS (
           $unions),
         mo AS (
           SELECT event_type, lag,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(yl AS HUGEINT)) AS sl,
             SUM(CAST(y AS HUGEINT) * yl) AS syl,
             SUM(CAST(y AS HUGEINT) * y) AS syy,
             SUM(CAST(yl AS HUGEINT) * yl) AS sll
           FROM st GROUP BY 1, 2)
         SELECT event_type, lag, n_pairs,
           CASE WHEN CAST(n_pairs AS HUGEINT) * syy != sy * sy
                 AND CAST(n_pairs AS HUGEINT) * sll != sl * sl THEN
             round(CAST(n_pairs * syl - sy * sl AS DOUBLE) /
               sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE) *
                 CAST(n_pairs * sll - sl * sl AS DOUBLE)), 6) END AS r
         FROM mo ORDER BY event_type, lag"""
    },
    "events_changepoint" ->
      """WITH daily AS (
           SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         sc AS (
           SELECT event_type, day,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
               AS n_days,
             SUM(CAST(y AS HUGEINT)) OVER (PARTITION BY event_type)
               AS total,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS HUGEINT) *
               SUM(CAST(y AS HUGEINT)) OVER (PARTITION BY event_type
                 ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
               - CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY day) AS HUGEINT) *
                 SUM(CAST(y AS HUGEINT)) OVER (PARTITION BY event_type)
               AS s_k
           FROM daily),
         best AS (
           SELECT event_type, n_days, total, day, s_k,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY abs(s_k) DESC, day) AS rn
           FROM sc)
         SELECT event_type, n_days, CAST(total AS BIGINT) AS total_events,
           day AS change_day, CAST(s_k AS BIGINT) AS s_exact,
           round(CAST(abs(s_k) AS DOUBLE) /
             CAST(CAST(n_days AS HUGEINT) * total AS DOUBLE), 6) AS score
         FROM best WHERE rn = 1 ORDER BY event_type""",
    "events_pmi" ->
      """WITH ud AS (
           SELECT DISTINCT user_id,
             CAST(date_trunc('day', ts) AS DATE) AS day, event_type
           FROM events),
         pairs AS (
           SELECT x.event_type AS a, y.event_type AS b,
             CAST(COUNT(*) AS BIGINT) AS c_ab
           FROM ud x JOIN ud y
             ON x.user_id = y.user_id AND x.day = y.day
               AND x.event_type < y.event_type
           GROUP BY 1, 2),
         singles AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c
                     FROM ud GROUP BY 1),
         nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_baskets
                FROM (SELECT DISTINCT user_id, day FROM ud))
         SELECT a, b, c_ab, sa.c AS c_a, sb.c AS c_b, n_baskets,
           round(CAST(
             CAST(round(ln(c_ab), 6) AS DECIMAL(18,6))
             + CAST(round(ln(n_baskets), 6) AS DECIMAL(18,6))
             - CAST(round(ln(sa.c), 6) AS DECIMAL(18,6))
             - CAST(round(ln(sb.c), 6) AS DECIMAL(18,6)) AS DOUBLE), 6)
             AS pmi
         FROM pairs
         JOIN singles sa ON sa.event_type = a
         JOIN singles sb ON sb.event_type = b, nb
         ORDER BY a, b""",
    "events_transition_entropy" ->
      """WITH seq AS (
           SELECT event_type AS cur_type,
             LEAD(event_type) OVER (PARTITION BY user_id
               ORDER BY date_trunc('microseconds', ts), event_id) AS next_type
           FROM events),
         cnt AS (SELECT cur_type, next_type, COUNT(*) AS n FROM seq
                 WHERE next_type IS NOT NULL GROUP BY 1, 2),
         ctxd AS (SELECT *, SUM(n) OVER (PARTITION BY cur_type) AS ctx
                  FROM cnt),
         q AS (SELECT cur_type, n,
                 CAST(round(ln(ctx), 6) AS DECIMAL(18,6)) AS y1,
                 CAST(round(ln(n), 6) AS DECIMAL(18,6)) AS y2
               FROM ctxd)
         SELECT cur_type, CAST(SUM(n) AS BIGINT) AS n_transitions,
           CAST(COUNT(*) AS BIGINT) AS n_next_types,
           round(CAST(SUM(n * (y1 - y2)) AS DOUBLE)
             / CAST(SUM(n) AS BIGINT), 6) AS cond_entropy_nats
         FROM q GROUP BY cur_type ORDER BY cur_type""",
    "events_lifecycle" ->
      """WITH uw AS (
           SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS week
           FROM events),
         f AS (SELECT user_id, MIN(week) AS fw FROM uw GROUP BY user_id),
         cl AS (
           SELECT uw.week,
             CASE WHEN uw.week = f.fw THEN 'new'
                  WHEN LAG(uw.week) OVER (PARTITION BY uw.user_id
                    ORDER BY uw.week) = uw.week - INTERVAL 7 DAY
                    THEN 'retained'
                  ELSE 'resurrected' END AS state
           FROM uw JOIN f USING (user_id)),
         sizes AS (
           SELECT week, CAST(COUNT(*) AS BIGINT) AS n_active,
             CAST(SUM(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
             CAST(SUM(CASE WHEN state = 'retained' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_retained,
             CAST(SUM(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_resurrected
           FROM cl GROUP BY week)
         SELECT s.week, s.n_active, s.n_new, s.n_retained, s.n_resurrected,
           CAST(COALESCE(p.n_active, 0) - s.n_retained AS BIGINT)
             AS n_churned,
           CASE WHEN COALESCE(p.n_active, 0) - s.n_retained > 0 THEN
             round(CAST(s.n_new + s.n_resurrected AS DOUBLE)
               / CAST(COALESCE(p.n_active, 0) - s.n_retained AS DOUBLE), 6)
           END AS quick_ratio
         FROM sizes s
         LEFT JOIN sizes p ON p.week + INTERVAL 7 DAY = s.week
         ORDER BY s.week""",
    "events_decompose" ->
      """WITH daily AS (
           SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         win AS (
           SELECT event_type, day, y,
             COUNT(*) OVER w AS t_cnt,
             CAST(SUM(y) OVER w AS BIGINT) AS t_sum
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         interior AS (
           SELECT event_type, day, y, t_sum,
             7 * y - t_sum AS det7,
             CAST(date_part('isodow', day) AS BIGINT) AS isodow
           FROM win WHERE t_cnt = 7),
         seas AS (
           SELECT event_type, isodow, CAST(SUM(det7) AS BIGINT) AS s_num,
             CAST(COUNT(*) AS BIGINT) AS n_dow
           FROM interior GROUP BY 1, 2)
         SELECT i.event_type, i.day, i.y,
           round(CAST(i.t_sum AS DOUBLE) / 7.0, 6) AS trend,
           round(CAST(s.s_num AS DOUBLE) / CAST(7 * s.n_dow AS DOUBLE), 6)
             AS seasonal,
           round(CAST(i.det7 * s.n_dow - s.s_num AS DOUBLE)
             / CAST(7 * s.n_dow AS DOUBLE), 6) AS residual
         FROM interior i JOIN seas s USING (event_type, isodow)
         ORDER BY i.event_type, i.day""",
    "profile_key_skew" ->
      """WITH c AS (
           SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n
           FROM lineitem GROUP BY l_orderkey),
         census AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(n) AS BIGINT) AS n_rows,
             CAST(MAX(n) AS BIGINT) AS max_n
           FROM c)
         SELECT c.l_orderkey, c.n,
           round(CAST(c.n AS DOUBLE) / CAST(census.n_rows AS DOUBLE), 6)
             AS share,
           census.n_keys,
           round(CAST(census.max_n AS DOUBLE) * CAST(census.n_keys AS DOUBLE)
             / CAST(census.n_rows AS DOUBLE), 6) AS skew_ratio
         FROM c CROSS JOIN census
         ORDER BY c.n DESC, c.l_orderkey LIMIT 20""",
    "events_new_vs_returning" ->
      """WITH f AS (
           SELECT user_id, MIN(CAST(date_trunc('microseconds', ts) AS DATE))
             AS fd
           FROM events GROUP BY user_id),
         a AS (
           SELECT DISTINCT CAST(date_trunc('microseconds', ts) AS DATE)
             AS day, user_id
           FROM events)
         SELECT a.day, CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN a.day = f.fd THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new,
           CAST(COUNT(*) - SUM(CASE WHEN a.day = f.fd THEN 1 ELSE 0 END)
             AS BIGINT) AS n_returning,
           round(CAST(SUM(CASE WHEN a.day = f.fd THEN 1 ELSE 0 END)
               AS DOUBLE) / COUNT(*), 6) AS pct_new
         FROM a JOIN f USING (user_id)
         GROUP BY a.day ORDER BY a.day""",
    "events_funnel_windowed" ->
      """WITH t1 AS (
           SELECT user_id, MIN(date_trunc('microseconds', ts)) AS t1
           FROM events WHERE event_type = 'view' GROUP BY user_id),
         t2 AS (
           SELECT e.user_id, MIN(date_trunc('microseconds', e.ts)) AS t2
           FROM events e JOIN t1 ON e.user_id = t1.user_id
           WHERE e.event_type = 'click'
             AND date_trunc('microseconds', e.ts) > t1.t1
             AND date_trunc('microseconds', e.ts) <= t1.t1 + INTERVAL 24 HOUR
           GROUP BY e.user_id),
         t3 AS (
           SELECT e.user_id, MIN(date_trunc('microseconds', e.ts)) AS t3
           FROM events e JOIN t2 ON e.user_id = t2.user_id
           WHERE e.event_type = 'purchase'
             AND date_trunc('microseconds', e.ts) > t2.t2
             AND date_trunc('microseconds', e.ts) <= t2.t2 + INTERVAL 24 HOUR
           GROUP BY e.user_id)
         SELECT stage, n_users FROM (
           SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users
           FROM t1
           UNION ALL
           SELECT '2_click_24h', CAST(COUNT(*) AS BIGINT) FROM t2
           UNION ALL
           SELECT '3_purchase_24h', CAST(COUNT(*) AS BIGINT) FROM t3)
         ORDER BY stage""",
    "events_anomaly_mad" ->
      """WITH daily AS (
           SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         med AS (
           SELECT event_type, n AS median_n FROM (
             SELECT event_type, day, n,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n, day)
                 AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS cnt
             FROM daily)
           WHERE rn = (cnt + 1) // 2),
         dev AS (
           SELECT d.event_type, d.day, d.n, m.median_n,
             abs(d.n - m.median_n) AS ad
           FROM daily d JOIN med m USING (event_type)),
         mad AS (
           SELECT event_type, ad AS mad_n FROM (
             SELECT event_type, day, ad,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ad, day)
                 AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS cnt
             FROM dev)
           WHERE rn = (cnt + 1) // 2)
         SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(d.median_n) AS BIGINT) AS median_n,
           CAST(MAX(a.mad_n) AS BIGINT) AS mad_n,
           CAST(SUM(CASE WHEN d.ad > 3 * a.mad_n THEN 1 ELSE 0 END)
             AS BIGINT) AS n_anomalies,
           CAST(MAX(d.ad) AS BIGINT) AS max_abs_dev
         FROM dev d JOIN mad a USING (event_type)
         GROUP BY d.event_type ORDER BY d.event_type""",
    "lm_heldout_ppl" ->
      s"""WITH toks AS (
           SELECT lang,
             (${graft.functions.PolyHash.duckSql("md5(text)")}) % 100 < 80
               AS is_train,
             unnest(string_split(text, ' ')) AS w
           FROM documents),
         tr AS (
           SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c_tr
           FROM toks WHERE is_train GROUP BY lang, w),
         tt AS (
           SELECT lang, CAST(SUM(c_tr) AS BIGINT) AS n_train,
             CAST(COUNT(*) AS BIGINT) AS v_train
           FROM tr GROUP BY lang),
         hw AS (
           SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c_h
           FROM toks WHERE NOT is_train GROUP BY lang, w),
         q AS (
           SELECT hw.lang, hw.c_h, tr.c_tr, tt.n_train, tt.v_train,
             CAST(round(ln(COALESCE(tr.c_tr, 0) + 1), 6) AS DECIMAL(18,6))
               AS y1,
             CAST(round(ln(tt.n_train + tt.v_train + 1), 6) AS DECIMAL(18,6))
               AS y2
           FROM hw LEFT JOIN tr USING (lang, w) JOIN tt USING (lang))
         SELECT lang, MAX(n_train) AS n_train, MAX(v_train) AS v_train,
           CAST(SUM(c_h) AS BIGINT) AS n_heldout,
           round(CAST(SUM(CASE WHEN c_tr IS NULL THEN c_h ELSE 0 END)
               AS DOUBLE) / CAST(SUM(c_h) AS BIGINT), 6) AS oov_rate,
           round(exp(-CAST(SUM(c_h * (y1 - y2)) AS DOUBLE)
             / CAST(SUM(c_h) AS BIGINT)), 6) AS ppl
         FROM q GROUP BY lang ORDER BY lang""",
    "events_type_corr" ->
      """WITH daily AS (
           SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         p AS (
           SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.n AS x, b.n AS y
           FROM daily a JOIN daily b ON a.day = b.day
           WHERE a.event_type < b.event_type),
         m AS (
           SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy
           FROM p GROUP BY type_a, type_b)
         SELECT type_a, type_b, n_days,
           round((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS pearson_r
         FROM m ORDER BY type_a, type_b""",
    "events_topk_churn" ->
      """WITH ud AS (
           SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         top AS (
           SELECT day, user_id FROM (
             SELECT day, user_id,
               ROW_NUMBER() OVER (PARTITION BY day ORDER BY n DESC, user_id)
                 AS rn
             FROM ud)
           WHERE rn <= 20),
         sizes AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS k
                   FROM top GROUP BY day),
         com AS (
           SELECT t.day, CAST(COUNT(*) AS BIGINT) AS n_common
           FROM top t JOIN top p
             ON p.day + INTERVAL 1 DAY = t.day AND p.user_id = t.user_id
           GROUP BY t.day)
         SELECT s.day, s.k, sp.k AS k_prev,
           COALESCE(c.n_common, 0) AS n_common,
           round(CAST(COALESCE(c.n_common, 0) AS DOUBLE)
             / CAST(s.k + sp.k - COALESCE(c.n_common, 0) AS DOUBLE), 6)
             AS jaccard,
           CAST(s.k - COALESCE(c.n_common, 0) AS BIGINT) AS new_entrants
         FROM sizes s
         JOIN sizes sp ON sp.day + INTERVAL 1 DAY = s.day
         LEFT JOIN com c ON c.day = s.day
         ORDER BY s.day""",
    "events_gini" ->
      """WITH pu AS (
           SELECT event_type, user_id,
             SUM(CAST(value AS DECIMAL(18,6))) AS v
           FROM events GROUP BY event_type, user_id),
         r AS (
           SELECT event_type, v,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY v, user_id) AS BIGINT) AS i
           FROM pu)
         SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
           round(CAST(SUM(v) AS DOUBLE), 6) AS total_value,
           round((2.0 * CAST(SUM(i * v) AS DOUBLE)
               - CAST(COUNT(*) + 1 AS DOUBLE) * CAST(SUM(v) AS DOUBLE))
             / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(v) AS DOUBLE)), 6)
             AS gini
         FROM r GROUP BY event_type ORDER BY event_type""",
    "events_whale_share" ->
      """WITH pu AS (
           SELECT event_type, user_id,
             SUM(CAST(value AS DECIMAL(18,6))) AS v
           FROM events GROUP BY event_type, user_id),
         r AS (
           SELECT event_type, v,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY v DESC, user_id DESC) AS BIGINT) AS i,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
           FROM pu),
         kk AS (SELECT *, (n + 9) // 10 AS k FROM r)
         SELECT event_type, CAST(MAX(k) AS BIGINT) AS top_users,
           round(CAST(SUM(CASE WHEN i <= k THEN v
             ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE), 6) AS top_value,
           round(CAST(SUM(CASE WHEN i <= k THEN v
               ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(v) AS DOUBLE), 6) AS top_share
         FROM kk GROUP BY event_type ORDER BY event_type""",
    "events_interarrival" ->
      """WITH g AS (
           SELECT event_type,
             CAST(floor(epoch(date_trunc('microseconds', ts))) AS BIGINT)
               - LAG(CAST(floor(epoch(date_trunc('microseconds', ts)))
                   AS BIGINT)) OVER
                 (PARTITION BY user_id, event_type
                  ORDER BY date_trunc('microseconds', ts), event_id) AS gap_s
           FROM events),
         b AS (
           SELECT event_type, CAST(length(bin(gap_s)) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             MIN(gap_s) AS min_gap_s, MAX(gap_s) AS max_gap_s
           FROM g WHERE gap_s IS NOT NULL GROUP BY 1, 2),
         t AS (SELECT *, CAST(SUM(n) OVER (PARTITION BY event_type)
                 AS BIGINT) AS type_n FROM b)
         SELECT event_type, bucket, n, min_gap_s, max_gap_s,
           round(CAST(n AS DOUBLE) / CAST(type_n AS DOUBLE), 6) AS share
         FROM t ORDER BY event_type, bucket""",
    "lm_unigram_kl" ->
      """WITH wc AS (
           SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c_sw
           FROM (SELECT source, unnest(string_split(text, ' ')) AS w
                 FROM documents)
           GROUP BY source, w),
         st AS (SELECT source, CAST(SUM(c_sw) AS BIGINT) AS tot_s
                FROM wc GROUP BY source),
         cw AS (SELECT w, CAST(SUM(c_sw) AS BIGINT) AS c_w
                FROM wc GROUP BY w),
         tt AS (SELECT CAST(SUM(c_w) AS BIGINT) AS tot FROM cw),
         q AS (
           SELECT wc.source, wc.c_sw, st.tot_s,
             CAST(round(ln(wc.c_sw), 6) AS DECIMAL(18,6)) AS y1,
             CAST(round(ln(st.tot_s), 6) AS DECIMAL(18,6)) AS y2,
             CAST(round(ln(cw.c_w), 6) AS DECIMAL(18,6)) AS y3,
             CAST(round(ln(tt.tot), 6) AS DECIMAL(18,6)) AS y4
           FROM wc JOIN cw USING (w) JOIN st USING (source) CROSS JOIN tt)
         SELECT source, MAX(tot_s) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           round(CAST(SUM(c_sw * (y1 - y2 - y3 + y4)) AS DOUBLE)
             / MAX(tot_s), 6) AS kl_nats
         FROM q GROUP BY source ORDER BY source""",
    "events_survival" ->
      """WITH t1 AS (
           SELECT user_id, MIN(date_trunc('microseconds', ts)) AS t1
           FROM events WHERE event_type = 'view' GROUP BY user_id),
         n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_risk0 FROM t1),
         lat AS (
           SELECT (CAST(floor(epoch(MIN(date_trunc('microseconds', e.ts)))) AS BIGINT)
                   - CAST(floor(epoch(MIN(t1.t1))) AS BIGINT)) // 86400 AS lat_day
           FROM events e JOIN t1 ON e.user_id = t1.user_id
           WHERE e.event_type = 'purchase'
             AND date_trunc('microseconds', e.ts) > t1.t1
           GROUP BY e.user_id),
         byday AS (SELECT lat_day, CAST(COUNT(*) AS BIGINT) AS n_converted
                   FROM lat GROUP BY lat_day),
         risk AS (
           SELECT lat_day, n_converted,
             CAST((SELECT n_risk0 FROM n0) - COALESCE(SUM(n_converted) OVER
               (ORDER BY lat_day ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING), 0) AS BIGINT) AS n_at_risk
           FROM byday),
         terms AS (
           SELECT lat_day, n_at_risk, n_converted,
             CASE WHEN n_at_risk > n_converted THEN
               CAST(round(ln(CAST(n_at_risk - n_converted AS DOUBLE)
                 / n_at_risk), 6) AS DECIMAL(18,6)) END AS t,
             SUM(CASE WHEN n_at_risk = n_converted THEN 1 ELSE 0 END)
               OVER (ORDER BY lat_day ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS depleted
           FROM risk)
         SELECT lat_day, n_at_risk, n_converted,
           round(CAST(n_converted AS DOUBLE) / n_at_risk, 6) AS hazard,
           CASE WHEN depleted > 0 THEN 0.0
             ELSE round(exp(CAST(SUM(t) OVER (ORDER BY lat_day ROWS BETWEEN
               UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)), 6) END
             AS survival
         FROM terms ORDER BY lat_day""",
    "events_cohort_ltv" ->
      """WITH f AS (
           SELECT user_id, MIN(date_trunc('microseconds', ts)) AS ft
           FROM events GROUP BY user_id),
         coh AS (SELECT user_id,
                   CAST(date_trunc('week', ft) AS DATE) AS cohort_week,
                   CAST(ft AS DATE) AS fd
                 FROM f),
         sizes AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_users
                   FROM coh GROUP BY cohort_week),
         p AS (SELECT c.cohort_week,
                 CAST(CAST(date_trunc('microseconds', e.ts) AS DATE) - c.fd
                   AS BIGINT) // 7 AS age_w,
                 CAST(e.value AS DECIMAL(18,6)) AS v
               FROM events e JOIN coh c USING (user_id)
               WHERE e.event_type = 'purchase'),
         g AS (SELECT cohort_week, age_w,
                 CAST(COUNT(*) AS BIGINT) AS n_purchases, SUM(v) AS rev
               FROM p GROUP BY cohort_week, age_w)
         SELECT g.cohort_week, g.age_w, g.n_purchases,
           CAST(SUM(rev) OVER (PARTITION BY g.cohort_week ORDER BY g.age_w
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS cum_value,
           s.cohort_users,
           round(CAST(SUM(rev) OVER (PARTITION BY g.cohort_week
             ORDER BY g.age_w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) / s.cohort_users, 6) AS ltv
         FROM g JOIN sizes s USING (cohort_week)
         ORDER BY g.cohort_week, g.age_w""",
    "events_forecast_naive" ->
      s"""WITH daily AS (
           SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         lagged AS (
           SELECT event_type, y,
             LAG(y, $forecastLag) OVER (PARTITION BY event_type
               ORDER BY day) AS yhat
           FROM daily)
         SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(abs(y - yhat)) AS BIGINT) AS abs_err_total,
           round(CAST(SUM(abs(y - yhat)) AS DOUBLE) /
             CAST(COUNT(*) AS DOUBLE), 6) AS mae,
           round(CAST(SUM(y - yhat) AS DOUBLE) /
             CAST(COUNT(*) AS DOUBLE), 6) AS mean_bias
         FROM lagged WHERE yhat IS NOT NULL
         GROUP BY event_type ORDER BY event_type""",
    "lm_kneser_ney" ->
      """WITH ws AS (
           SELECT string_split(text, ' ') AS w FROM documents
           WHERE len(string_split(text, ' ')) >= 2),
         bg AS (
           SELECT w[i] AS w1, w[i + 1] AS w2
           FROM ws, UNNEST(generate_series(1, len(w) - 1)) AS t(i)),
         cnt AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
                 FROM bg GROUP BY 1, 2),
         ann AS (
           SELECT w1, w2, c12,
             CAST(SUM(c12) OVER (PARTITION BY w1) AS BIGINT) AS c1,
             CAST(COUNT(*) OVER (PARTITION BY w1) AS BIGINT) AS n1_cont,
             CAST(COUNT(*) OVER (PARTITION BY w2) AS BIGINT) AS n_ctx
           FROM cnt),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_bigrams FROM cnt),
         top AS (
           SELECT * FROM ann, tot
           ORDER BY c12 DESC, w1, w2 LIMIT 20)
         SELECT
           CAST(ROW_NUMBER() OVER (ORDER BY c12 DESC, w1, w2) AS BIGINT)
             AS rn,
           w1, w2, c12, c1, n1_cont, n_ctx, t_bigrams,
           round(CAST(
               CAST(CASE WHEN 4 * c12 > 3 THEN 4 * c12 - 3 ELSE 0 END
                 AS HUGEINT) * t_bigrams
               + CAST(3 AS HUGEINT) * n1_cont * n_ctx AS DOUBLE) /
             CAST(CAST(4 AS HUGEINT) * c1 * t_bigrams AS DOUBLE), 6)
             AS p_kn
         FROM top ORDER BY rn""",
    "events_dau_wau" ->
      """WITH ud AS (
           SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
           FROM events),
         days AS (SELECT DISTINCT day FROM ud),
         dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY day),
         wau AS (
           SELECT g.day, COUNT(DISTINCT u.user_id) AS wau
           FROM days g JOIN ud u
             ON u.day BETWEEN g.day - INTERVAL 6 DAY AND g.day
           GROUP BY g.day)
         SELECT day, dau, wau,
           round(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
         FROM dau JOIN wau USING (day) ORDER BY day""",
    "events_time_to_convert" ->
      """WITH t1 AS (
           SELECT user_id, MIN(date_trunc('microseconds', ts)) AS t1
           FROM events WHERE event_type = 'view' GROUP BY user_id),
         lat AS (
           SELECT CAST(floor(epoch(MIN(date_trunc('microseconds', e.ts)))) AS BIGINT)
                  - CAST(floor(epoch(MIN(t1.t1))) AS BIGINT) AS lat_s
           FROM events e JOIN t1 ON e.user_id = t1.user_id
           WHERE e.event_type = 'purchase' AND date_trunc('microseconds', e.ts) > t1.t1
           GROUP BY e.user_id)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           CAST(MIN(lat_s) AS BIGINT) AS min_s,
           round(quantile_cont(lat_s, 0.25), 6) AS p25_s,
           round(quantile_cont(lat_s, 0.50), 6) AS p50_s,
           round(quantile_cont(lat_s, 0.75), 6) AS p75_s,
           CAST(MAX(lat_s) AS BIGINT) AS max_s
         FROM lat""",
    "lm_greedy_decode" -> {
      val stepCtes = (1 to greedyDecodeSteps).map { i =>
        s"""s$i AS (SELECT $i AS step, wb AS word FROM b
              JOIN s${i - 1} ON b.wa = s${i - 1}.word
              ORDER BY b.c DESC, wb LIMIT 1)"""
      }.mkString(",\n")
      val unions = (0 to greedyDecodeSteps)
        .map(i => s"SELECT CAST(step AS BIGINT) AS step, word FROM s$i")
        .mkString(" UNION ALL ")
      s"""WITH ws AS (SELECT string_split(text, ' ') AS w FROM documents),
         u AS (SELECT unnest(w) AS word FROM ws),
         uc AS (SELECT word, COUNT(*) AS c FROM u GROUP BY 1),
         pr AS (SELECT w[i] AS wa, w[i + 1] AS wb
                FROM ws, UNNEST(generate_series(1, len(w) - 1)) AS t(i)),
         b AS (SELECT wa, wb, COUNT(*) AS c FROM pr GROUP BY 1, 2),
         s0 AS (SELECT 0 AS step, word FROM uc ORDER BY c DESC, word LIMIT 1),
         $stepCtes
         $unions ORDER BY step"""
    },
    "events_user_activity" ->
      """SELECT n_events, CAST(COUNT(*) AS BIGINT) AS n_users
         FROM (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
               FROM events GROUP BY user_id)
         GROUP BY n_events ORDER BY n_events""",
    "events_sequence_pattern" ->
      """WITH sq AS (
           SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS seq
           FROM events GROUP BY 1, 2)
         SELECT seq, CAST(COUNT(*) AS BIGINT) AS n_user_days,
           regexp_matches(seq, 'v.*c.*p') AS matches_funnel
         FROM sq GROUP BY seq
         ORDER BY n_user_days DESC, seq LIMIT 15""",
    "events_streaks" ->
      """WITH days AS (
           SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
           FROM events),
         g AS (SELECT user_id, day,
                 day - CAST(ROW_NUMBER() OVER
                   (PARTITION BY user_id ORDER BY day) AS INT) AS grp
               FROM days),
         st AS (SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS streak_days,
                  MIN(day) AS streak_start
                FROM g GROUP BY 1, 2),
         best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY streak_days DESC, streak_start) AS rk
                  FROM st)
         SELECT user_id, streak_days, streak_start FROM best
         WHERE rk = 1 ORDER BY streak_days DESC, user_id LIMIT 20""",
    "lm_collocations" ->
      s"""WITH ws AS (SELECT string_split(text, ' ') AS w FROM documents),
         pr AS (SELECT w[i] AS wa, w[i + 1] AS wb
                FROM ws, UNNEST(generate_series(1, len(w) - 1)) AS t(i)),
         uni AS (SELECT unnest(w) AS word FROM ws),
         u AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c1 FROM uni GROUP BY 1),
         n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens FROM uni),
         p AS (SELECT wa, wb, CAST(COUNT(*) AS BIGINT) AS c_ab FROM pr
               GROUP BY 1, 2 HAVING COUNT(*) >= $minColloSupport)
         SELECT wa, wb, c_ab, ua.c1 AS c_a, ub.c1 AS c_b,
           round(CAST(c_ab * n.n_tokens AS DOUBLE) / (ua.c1 * ub.c1), 6) AS lift
         FROM p JOIN u ua ON ua.word = p.wa JOIN u ub ON ub.word = p.wb
         CROSS JOIN n
         ORDER BY lift DESC, wa, wb LIMIT 20""",
    "events_ab_test" ->
      s"""WITH pu AS (
           SELECT user_id,
             COUNT(*) FILTER (WHERE event_type = 'purchase') > $abConversionBar
               AS converted
           FROM events GROUP BY user_id),
         c AS (
           SELECT CAST(COUNT(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS n_a,
             CAST(COUNT(*) FILTER (WHERE user_id % 2 = 0 AND converted) AS BIGINT)
               AS conv_a,
             CAST(COUNT(*) FILTER (WHERE user_id % 2 = 1) AS BIGINT) AS n_b,
             CAST(COUNT(*) FILTER (WHERE user_id % 2 = 1 AND converted) AS BIGINT)
               AS conv_b
           FROM pu)
         SELECT n_a, conv_a, n_b, conv_b,
           round(conv_a / CAST(n_a AS DOUBLE), 6) AS p_a,
           round(conv_b / CAST(n_b AS DOUBLE), 6) AS p_b,
           round(conv_b / CAST(n_b AS DOUBLE) / (conv_a / CAST(n_a AS DOUBLE)) - 1.0, 6)
             AS lift,
           round(CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
                      THEN 0.0
                      ELSE (conv_b / CAST(n_b AS DOUBLE) - conv_a / CAST(n_a AS DOUBLE))
                           / sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                                  * (1.0 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                                  * (1.0 / n_a + 1.0 / n_b)) END, 6) AS zscore
         FROM c""",
    "events_anomaly" ->
      """WITH daily AS (
           SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS n
           FROM events GROUP BY 1, 2),
         trail AS (
           SELECT event_type, day, n,
             COUNT(*) OVER w AS t_cnt,
             SUM(n) OVER w AS t_sum,
             SUM(n * n) OVER w AS t_ss
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
         SELECT event_type, day, n, CAST(t_sum AS BIGINT) AS t_sum,
           round(CASE WHEN t_ss * 7 = t_sum * t_sum THEN 0.0
                      ELSE (n - t_sum / 7.0)
                           / sqrt((t_ss - t_sum * (t_sum / 7.0)) / 7.0) END, 6)
             AS zscore
         FROM trail WHERE t_cnt = 7
         ORDER BY event_type, day""",
    // keyed on the trigram's PolyHash like the Spark plan (hash computed in
    // its own CTE — duckSql's fold binds an `i` that would capture the
    // UNNEST index if inlined)
    "text_novelty" ->
      s"""WITH ws AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents
           WHERE len(string_split(text, ' ')) >= 3),
         tri0 AS (
           SELECT doc_id, w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS tri
           FROM ws, UNNEST(generate_series(1, len(w) - 2)) AS t(i)),
         tri AS (
           SELECT doc_id, ${graft.functions.PolyHash.duckSql("tri")} AS th
           FROM tri0),
         dfq AS (
           SELECT th, COUNT(DISTINCT doc_id) AS tri_df FROM tri GROUP BY th)
         SELECT t.doc_id, COUNT(*) AS n_tri,
           CAST(SUM(CASE WHEN d.tri_df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           round(1.0 - CAST(SUM(CASE WHEN d.tri_df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS novelty
         FROM tri t JOIN dfq d USING (th)
         GROUP BY t.doc_id ORDER BY t.doc_id""",
    "events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, date_trunc('microseconds', ts) AS ts
                    FROM events),
         t1 AS (SELECT user_id, MIN(ts) AS t1 FROM e
                WHERE event_type = 'view' GROUP BY user_id),
         t2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM e JOIN t1 USING (user_id)
                WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY e.user_id),
         t3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM e JOIN t2 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY e.user_id)
         SELECT * FROM (
           SELECT '1_view' AS stage, COUNT(*) AS n_users FROM t1
           UNION ALL SELECT '2_click', COUNT(*) FROM t2
           UNION ALL SELECT '3_purchase', COUNT(*) FROM t3)
         ORDER BY stage""",
    "retention_cohort" ->
      """WITH firsts AS (
           SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
           FROM events GROUP BY user_id),
         active AS (
           SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
           FROM events)
         SELECT cohort_week,
           CAST(date_diff('day', cohort_week, wk) // 7 AS BIGINT) AS week_offset,
           COUNT(*) AS n_users
         FROM active JOIN firsts USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // grouped/windowed on per-word PolyHash keys like the Spark plan; the
    // words survive as MINs (identical under collision in both engines)
    "lm_bigram_entropy" ->
      s"""WITH ws AS (
           SELECT lang, string_split(text, ' ') AS w FROM documents
           WHERE len(string_split(text, ' ')) >= 2),
         bg0 AS (
           SELECT lang, w[i] AS w1, w[i + 1] AS w2
           FROM ws, UNNEST(generate_series(1, len(w) - 1)) AS t(i)),
         bg AS (
           SELECT lang,
             ${graft.functions.PolyHash.duckSql("w1")} AS h1,
             ${graft.functions.PolyHash.duckSql("w2")} AS h2
           FROM bg0),
         cnt AS (SELECT lang, h1, h2, COUNT(*) AS c12
                 FROM bg GROUP BY 1, 2, 3),
         ctxd AS (SELECT lang, c12,
                    SUM(c12) OVER (PARTITION BY lang, h1) AS c1, h1
                  FROM cnt),
         q AS (SELECT lang, c12, h1,
                 CAST(round(ln(c1), 6) AS DECIMAL(18,6)) AS y1,
                 CAST(round(ln(c12), 6) AS DECIMAL(18,6)) AS y2
               FROM ctxd)
         SELECT lang, CAST(SUM(c12) AS BIGINT) AS n_bigrams,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams,
           CAST(COUNT(DISTINCT h1) AS BIGINT) AS n_contexts,
           round(CAST(SUM(c12 * (y1 - y2)) AS DOUBLE) / CAST(SUM(c12) AS BIGINT), 6)
             AS cond_entropy_nats
         FROM q GROUP BY lang ORDER BY lang""",
    "lm_trigram" ->
      s"""WITH ws AS (
           SELECT string_split(text, ' ') AS w FROM documents
           WHERE len(string_split(text, ' ')) >= 3),
         tri0 AS (
           SELECT w[i] AS w1, w[i + 1] AS w2, w[i + 2] AS w3
           FROM ws, UNNEST(generate_series(1, len(w) - 2)) AS t(i)),
         tri AS (
           SELECT w1, w2, w3,
             ${graft.functions.PolyHash.duckSql("w1")} AS h1,
             ${graft.functions.PolyHash.duckSql("w2")} AS h2,
             ${graft.functions.PolyHash.duckSql("w3")} AS h3
           FROM tri0),
         cnt AS (SELECT h1, h2, h3, MIN(w1) AS w1, MIN(w2) AS w2, MIN(w3) AS w3,
                   COUNT(*) AS c3 FROM tri GROUP BY 1, 2, 3),
         ctxd AS (SELECT w1, w2, w3, c3,
                    SUM(c3) OVER (PARTITION BY h1, h2) AS ctx FROM cnt),
         rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY c3 DESC, w1, w2, w3) AS rn
                FROM ctxd)
         SELECT CAST(rn AS BIGINT) AS rn, w1, w2, w3, c3,
           CAST(ctx AS BIGINT) AS ctx,
           round(CAST(c3 AS DOUBLE) / ctx, 6) AS p
         FROM rk WHERE rn <= 20 ORDER BY rn""",
    // the Spark side folds Σcount² map-side over each row's sorted words;
    // the relational spelling below produces the same exact integers, and
    // the Simpson index is one rounded division in both engines
    "text_diversity" ->
      """WITH occ AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         cnt AS (SELECT doc_id, word, COUNT(*) AS c FROM occ GROUP BY 1, 2),
         agg AS (
           SELECT doc_id, SUM(c) AS n_words, COUNT(*) AS n_distinct,
                  SUM(c * c) AS sum_sq
           FROM cnt GROUP BY doc_id)
         SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(sum_sq AS BIGINT) AS sum_sq,
           round(1.0 - CAST(sum_sq AS DOUBLE) / (n_words * n_words), 6) AS simpson
         FROM agg ORDER BY doc_id""",
    "events_pathing" ->
      """WITH seq AS (
           SELECT event_type AS cur_type,
             LEAD(event_type) OVER (PARTITION BY user_id
               ORDER BY date_trunc('microseconds', ts), event_id) AS next_type
           FROM events),
         cnt AS (SELECT cur_type, next_type, COUNT(*) AS n FROM seq
                 WHERE next_type IS NOT NULL GROUP BY 1, 2),
         ctxd AS (SELECT *, SUM(n) OVER (PARTITION BY cur_type) AS ctx FROM cnt)
         SELECT cur_type, next_type, n,
           round(CAST(n AS DOUBLE) / ctx, 6) AS p
         FROM ctxd ORDER BY cur_type, next_type""",
    "scd2_build" ->
      """WITH e AS (
           SELECT user_id, date_trunc('microseconds', ts) AS ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
               ORDER BY date_trunc('microseconds', ts), event_id) AS prev_type
           FROM events),
         chg AS (
           SELECT user_id, ts, event_id, event_type FROM e
           WHERE prev_type IS NULL OR prev_type <> event_type)
         SELECT user_id, event_type AS state, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
         FROM chg ORDER BY user_id, valid_from""",
    "events_dq_report" ->
      """WITH b AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN user_id IS NULL OR event_type IS NULL
               OR ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_key,
             CAST(SUM(CASE WHEN value < 0.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_negative_value,
             CAST(SUM(CASE WHEN value > 1000000.0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_outlier_value,
             CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
               AS n_dup_event_id,
             CAST(CAST(date_trunc('day', MAX(ts)) AS DATE)
               - CAST(date_trunc('day', MIN(ts)) AS DATE) AS BIGINT)
               AS span_days
           FROM events)
         SELECT n_rows, n_null_key, n_dup_event_id, n_negative_value,
           n_outlier_value, span_days,
           round(CAST(n_rows - n_null_key - n_dup_event_id
               - n_negative_value - n_outlier_value AS DOUBLE)
             / CAST(n_rows AS DOUBLE), 6) AS valid_share
         FROM b""",
    "events_bot_suspects" ->
      """WITH pu AS (
           SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT CAST(date_trunc('day', ts) AS DATE))
               AS BIGINT) AS n_days
           FROM events GROUP BY user_id),
         census AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(n) AS BIGINT) AS sn,
             SUM(CAST(n AS HUGEINT) * n) AS snn
           FROM pu),
         zt AS (
           SELECT pu.user_id, pu.n AS n_events, pu.n_days,
             round((CAST(pu.n AS DOUBLE)
                 - CAST(census.sn AS DOUBLE) / CAST(census.n_users AS DOUBLE))
               / sqrt((CAST(census.n_users AS DOUBLE) * CAST(census.snn AS DOUBLE)
                   - CAST(census.sn AS DOUBLE) * CAST(census.sn AS DOUBLE))
                 / (CAST(census.n_users AS DOUBLE)
                    * CAST(census.n_users - 1 AS DOUBLE))), 6) AS zscore
           FROM pu CROSS JOIN census),
         sus AS (SELECT CAST(SUM(CASE WHEN zscore > 3.0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_suspects FROM zt)
         SELECT zt.user_id, zt.n_events, zt.n_days, zt.zscore, sus.n_suspects
         FROM (SELECT * FROM zt ORDER BY n_events DESC, user_id LIMIT 20) zt
         CROSS JOIN sus
         ORDER BY zt.n_events DESC, zt.user_id""",
    "session_stats" ->
      """WITH e AS (
           SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts
           FROM events),
         g AS (
           SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS brk,
             event_id
           FROM e),
         se AS (
           SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
           FROM g),
         sess AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
             (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS dur_s
           FROM se GROUP BY user_id, session_id),
         census AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
             CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_single,
             CAST(SUM(n_events) AS BIGINT) AS tot_events,
             CAST(MAX(dur_s) AS BIGINT) AS max_duration_s
           FROM sess),
         hist AS (
           SELECT dur_s, COUNT(*) AS c,
             SUM(COUNT(*)) OVER (ORDER BY dur_s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
           FROM sess GROUP BY dur_s),
         med AS (SELECT CAST(MIN(dur_s) AS BIGINT) AS median_duration_s
                 FROM hist, census WHERE cumc >= (n_sessions + 1) // 2),
         p90 AS (SELECT CAST(MIN(dur_s) AS BIGINT) AS p90_duration_s
                 FROM hist, census WHERE cumc >= (9 * n_sessions + 9) // 10)
         SELECT census.n_sessions,
           round(CAST(census.n_single AS DOUBLE)
             / CAST(census.n_sessions AS DOUBLE), 6) AS single_share,
           round(CAST(census.tot_events AS DOUBLE)
             / CAST(census.n_sessions AS DOUBLE), 6) AS mean_events,
           med.median_duration_s, p90.p90_duration_s, census.max_duration_s
         FROM census CROSS JOIN med CROSS JOIN p90""",
    "events_value_benford" ->
      """WITH c AS (
           SELECT CAST(substr(CAST(CAST(floor(value * 100.0) AS BIGINT)
               AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
         t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
         dg AS (SELECT CAST(unnest(generate_series(1, 9)) AS BIGINT)
                  AS digit),
         sh AS (
           SELECT dg.digit, CAST(COALESCE(c.n, 0) AS BIGINT) AS n, t.total,
             round(CAST(COALESCE(c.n, 0) AS DOUBLE)
               / CAST(t.total AS DOUBLE), 6) AS obs_share,
             round(ln(1.0 + 1.0 / CAST(dg.digit AS DOUBLE)) / ln(10.0), 6)
               AS exp_share
           FROM dg LEFT JOIN c USING (digit) CROSS JOIN t)
         SELECT digit, n, total, obs_share, exp_share,
           round((obs_share - exp_share) * (obs_share - exp_share)
             / exp_share * total, 6) AS chi2_term
         FROM sh ORDER BY digit""",
    "privacy_safe_view" ->
      s"""SELECT
           ((user_id % ${graft.functions.PolyHash.P})
             * ${graft.functions.PolyHash.Mult})
             % ${graft.functions.PolyHash.P} AS pseudo_user,
           CAST(date_trunc('microseconds', ts) AS DATE) AS day,
           event_type,
           CAST(floor(value / 10.0) AS BIGINT) * 10 AS value_decade
         FROM events
         ORDER BY pseudo_user, day, event_type, value_decade""",
    "events_hour_profile" ->
      """WITH c AS (
           SELECT event_type,
             CAST(date_part('hour', date_trunc('microseconds', ts))
               AS BIGINT) AS hh,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         w AS (
           SELECT *, CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT)
               AS type_n,
             CAST(MAX(n) OVER (PARTITION BY event_type) AS BIGINT) AS max_n
           FROM c)
         SELECT event_type, hh, n,
           round(CAST(n AS DOUBLE) / CAST(type_n AS DOUBLE), 6) AS share,
           n = max_n AS is_peak
         FROM w ORDER BY event_type, hh""",
    "privacy_k_anon" ->
      """WITH g AS (
           SELECT event_type,
             CAST(date_part('isodow', ts) AS BIGINT) AS isodow,
             CAST(floor(value / 10.0) AS BIGINT) AS value_decade,
             CAST(COUNT(*) AS BIGINT) AS k
           FROM events GROUP BY 1, 2, 3),
         med AS (
           SELECT event_type, k AS median_k FROM (
             SELECT event_type, k,
               ROW_NUMBER() OVER (PARTITION BY event_type
                 ORDER BY k, isodow, value_decade) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS cnt
             FROM g)
           WHERE rn = (cnt + 1) // 2)
         SELECT g.event_type, CAST(SUM(g.k) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(g.k) AS BIGINT) AS min_k,
           CAST(MAX(m.median_k) AS BIGINT) AS median_k,
           CAST(SUM(CASE WHEN g.k < 5 THEN g.k ELSE 0 END) AS BIGINT)
             AS risk_rows,
           round(CAST(SUM(CASE WHEN g.k < 5 THEN g.k ELSE 0 END) AS DOUBLE)
             / CAST(SUM(g.k) AS BIGINT), 6) AS risk_share
         FROM g JOIN med m USING (event_type)
         GROUP BY g.event_type ORDER BY g.event_type""",
    "scd2_snapshot" ->
      """WITH b AS (
           SELECT (MIN(CAST(floor(epoch_us(date_trunc('microseconds', ts)))
               AS BIGINT))
             + MAX(CAST(floor(epoch_us(date_trunc('microseconds', ts)))
               AS BIGINT))) // 2 AS snapshot_us
           FROM events),
         e AS (
           SELECT user_id, date_trunc('microseconds', ts) AS ts, event_id,
             event_type,
             LAG(event_type) OVER (PARTITION BY user_id
               ORDER BY date_trunc('microseconds', ts), event_id) AS prev_type
           FROM events),
         chg AS (
           SELECT user_id, ts, event_id, event_type FROM e
           WHERE prev_type IS NULL OR prev_type <> event_type),
         scd AS (
           SELECT user_id, event_type AS state, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
           FROM chg)
         SELECT scd.state, CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MAX(b.snapshot_us) AS BIGINT) AS snapshot_us
         FROM scd CROSS JOIN b
         WHERE epoch_us(scd.valid_from) <= b.snapshot_us
           AND (scd.valid_to IS NULL
                OR epoch_us(scd.valid_to) > b.snapshot_us)
         GROUP BY scd.state ORDER BY scd.state""",
    "rfm_segment" ->
      """WITH base AS (
           SELECT o_custkey AS c_custkey,
             CAST(datediff('day', MAX(o_orderdate),
               (SELECT MAX(o_orderdate) FROM orders)) AS BIGINT) AS recency_days,
             COUNT(*) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS monetary_dec
           FROM orders GROUP BY o_custkey),
         rk AS (
           SELECT c_custkey, recency_days, frequency, monetary_dec,
             ROW_NUMBER() OVER (ORDER BY recency_days, c_custkey) - 1 AS r_rank,
             ROW_NUMBER() OVER (ORDER BY frequency DESC, c_custkey) - 1 AS f_rank,
             ROW_NUMBER() OVER (ORDER BY monetary_dec DESC, c_custkey) - 1 AS m_rank,
             (SELECT COUNT(*) FROM base) AS n
           FROM base)
         SELECT c_custkey, recency_days, frequency,
           round(CAST(monetary_dec AS DOUBLE), 6) AS monetary,
           r_rank * 4 // n + 1 AS r_score,
           f_rank * 4 // n + 1 AS f_score,
           m_rank * 4 // n + 1 AS m_score,
           CAST(r_rank * 4 // n + 1 AS VARCHAR) || '-' ||
             CAST(f_rank * 4 // n + 1 AS VARCHAR) || '-' ||
             CAST(m_rank * 4 // n + 1 AS VARCHAR) AS segment
         FROM rk ORDER BY c_custkey""",
    "text_vocab_growth" ->
      """WITH nd AS (SELECT MAX(doc_id) + 1 AS nd FROM documents),
         db AS (
           SELECT LEAST(doc_id * 10 // (SELECT nd FROM nd), 9) AS bucket,
             unnest(string_split(text, ' ')) AS word
           FROM documents),
         tok AS (SELECT bucket, COUNT(*) AS n_tokens FROM db GROUP BY bucket),
         nw AS (
           SELECT bucket, COUNT(*) AS new_words FROM (
             SELECT word, MIN(bucket) AS bucket FROM db GROUP BY word)
           GROUP BY bucket)
         SELECT t.bucket, t.n_tokens,
           CAST(SUM(t.n_tokens) OVER (ORDER BY t.bucket) AS BIGINT) AS cum_tokens,
           COALESCE(nw.new_words, 0) AS new_words,
           CAST(SUM(COALESCE(nw.new_words, 0)) OVER (ORDER BY t.bucket) AS BIGINT)
             AS cum_distinct_words
         FROM tok t LEFT JOIN nw ON t.bucket = nw.bucket
         ORDER BY t.bucket""",
    // aggregated on the chunk's PolyHash like the Spark plan
    "text_boilerplate" ->
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         chunks AS (
           SELECT doc_id, array_to_string(w[i:i + 7], ' ') AS chunk
           FROM ws, UNNEST(generate_series(1, len(w), 8)) AS t(i)),
         hashed AS (
           SELECT doc_id, chunk, ${graft.functions.PolyHash.duckSql("chunk")} AS ch
           FROM chunks),
         cnt AS (
           SELECT ch, MIN(chunk) AS chunk, COUNT(DISTINCT doc_id) AS n_docs,
             COUNT(*) AS n_occ
           FROM hashed GROUP BY ch HAVING COUNT(DISTINCT doc_id) >= 2),
         rk AS (SELECT *, ROW_NUMBER() OVER
                  (ORDER BY n_docs DESC, n_occ DESC, chunk) AS rn FROM cnt)
         SELECT CAST(rn AS BIGINT) AS rn, chunk, n_docs, n_occ
         FROM rk WHERE rn <= 20 ORDER BY rn""",
  )
}
