package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables
import graft.plans.Checkpoints.SweepSyntax

/** The relational operator surface of the reference (SURVEY.md §2B).
  *
  * dungbeetle executes arbitrary SQL verbatim against its source DBs
  * (`internal/core/core.go:496`); here Spark is the executor, so each operator
  * class the reference's delegated SQL exercises becomes one named, oracle
  * checked DataFrame query over the shared parquet fixtures.
  *
  * Determinism rules (so the DuckDB oracle hash-compare is exact):
  *   - every query ends with a total ORDER BY over a unique key;
  *   - float aggregations go through DECIMAL(18,6) (exact, associative, so
  *     partial-aggregation order doesn't matter) and are cast back to DOUBLE;
  *   - no raw nanosecond timestamps are emitted (events.ts is normalized to
  *     microseconds on the Spark side, `date_trunc('microseconds', …)` on the
  *     DuckDB side).
  *
  * Scale notes are inline per operator: all aggregations are partial
  * (map-side combine), joins are keyed equi-joins that AQE can re-plan, small
  * dimensions are broadcast explicitly, and nothing collects to the driver.
  */
object RelOps {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)
  /** Exact decimal image of a double column: sums become order-insensitive. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 6))
  private def sumd(c: Column): Column = sum(dec(c)).cast(DoubleType)

  // ---------------------------------------------------------------- scans
  /** Full-table scan (reference `sql/pg/test.postgres.sql:14-17`). Parquet
    * columnar scan; at 100 TB this is bounded by IO, no shuffle until sort. */
  val scanFull: Q = (s, d) =>
    t(s, d, "lineitem").orderBy($"l_orderkey", $"l_linenumber")

  /** Projection + computed column (`test.postgres.sql:12`). Column pruning
    * reaches the parquet scan (ReadSchema carries only 4 columns). */
  val project: Q = (s, d) =>
    t(s, d, "lineitem")
      .select($"l_orderkey", $"l_linenumber",
        (dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))).cast(DoubleType).as("net"))
      .orderBy($"l_orderkey", $"l_linenumber")

  /** Equality predicate (`WHERE user_id = $1`, `test.postgres.sql:12,17`);
    * pushed to the parquet reader (PushedFilters). */
  val filterEq: Q = (s, d) =>
    t(s, d, "customer").filter($"c_mktsegment" === "BUILDING").orderBy($"c_custkey")

  /** Range predicate on a timestamp (`test.postgres.sql:19-21`). */
  val filterRange: Q = (s, d) =>
    t(s, d, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast(TimestampType) &&
              $"l_shipdate" <  lit("1998-01-01").cast(TimestampType))
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_shipdate".cast(DateType).as("ship_day"))
      .orderBy($"l_orderkey", $"l_linenumber")

  // ----------------------------------------------------------- aggregates
  /** GROUP BY + SUM (the reference's `get_profit_summary` class,
    * `test.postgres.sql:8-12`). Partial + final HashAggregate; only the
    * 5-group final result shuffles. */
  val aggGroupSum: Q = (s, d) =>
    t(s, d, "lineitem").groupBy($"l_returnflag")
      .agg(sumd($"l_quantity").as("sum_qty"))
      .orderBy($"l_returnflag")

  /** Multiple aggregates per group (README "reports" class). */
  val aggMulti: Q = (s, d) =>
    t(s, d, "lineitem").groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sumd($"l_quantity").as("sum_qty"),
        sumd($"l_extendedprice").as("sum_price"),
        (sum(dec($"l_extendedprice")).cast(DoubleType) / count(lit(1))).as("avg_price"),
        min($"l_discount").as("min_disc"),
        max($"l_extendedprice").as("max_price"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag", $"l_linestatus")

  /** Exact distinct aggregate (expand + two-phase agg in Spark). */
  val aggCountDistinct: Q = (s, d) =>
    t(s, d, "orders").groupBy($"o_orderpriority")
      .agg(countDistinct($"o_custkey").as("n_cust"), count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")

  /** EXACT distinct at scale without the expand: the bitmap-index trick
    * (ClickHouse `groupBitmap`, roaring-bitmap aggregation) spelled in
    * engine-neutral arithmetic. Each user id maps to (word = id DIV 32,
    * bit = id mod 32); `bit_or` folds the masks map-side, so the exchange
    * carries one row per (group, DISTINCT word-of-a-user) with an 8-byte
    * mask — dense-id-range-bounded, NOT row-count-bounded (a billion
    * events over a million users shuffle ≤ 31 k masked words per group);
    * the distinct count is Σ popcount. The query emits the bitmap count
    * AND the expand-based `countDistinct` side by side — the hash gate
    * proves them equal. Contrast with `agg_approx_distinct`: this one is
    * exact, and its memory is bounded by the ID RANGE rather than
    * constant — the right tool when ids are dense and exactness is
    * required. */
  val aggBitmapDistinct: Q = (s, d) => {
    val ev = t(s, d, "events")
    val bm = ev
      .select($"event_type",
        expr("user_id DIV 32").as("word"),
        call_function("shiftleft", lit(1L),
          ($"user_id".bitwiseAND(lit(31L))).cast(IntegerType)).as("mask"))
      .groupBy($"event_type", $"word")
      .agg(expr("bit_or(mask)").as("bits"))
      .groupBy($"event_type")
      .agg(sum(bit_count($"bits")).cast(LongType).as("n_users_bitmap"))
    val ex = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_users_exact"))
    bm.join(ex, "event_type")
      .select($"event_type", $"n_users_bitmap", $"n_users_exact",
        ($"n_users_bitmap" === $"n_users_exact").as("bitmap_matches"))
      .orderBy($"event_type")
  }

  /** Approximate distinct (HyperLogLog++) — the 100 TB-scale variant of the
    * above: one pass, fixed memory, no expand. DuckDB's HLL differs, so the
    * sketch value itself isn't oracle-comparable; instead the query is
    * self-validating — it emits the exact distinct count plus a boolean
    * pinning the approximation contract (|approx−exact|/exact ≤ 0.05 at
    * rsd 0.02; HLL++ is deterministic per input, so the boolean is stable),
    * and the oracle asserts the exact count and `true`. */
  val aggApproxDistinct: Q = (s, d) =>
    t(s, d, "orders").groupBy($"o_orderpriority")
      .agg(approx_count_distinct($"o_custkey", 0.02).as("approx_cust"),
        countDistinct($"o_custkey").as("exact_cust"))
      .select($"o_orderpriority", $"exact_cust",
        (abs($"approx_cust" - $"exact_cust").cast(DoubleType) / $"exact_cust" <= 0.05)
          .as("within_tol"))
      .orderBy($"o_orderpriority")

  /** Most-frequent value per group (mode), spelled as count + top-1 window
    * with an EXPLICIT tiebreak (highest count, then smallest value) — the
    * built-in `mode()` leaves ties engine-defined, which can never
    * hash-match across engines. Two-phase: the count aggregate reduces each
    * group to its distinct values before the window sees anything. */
  val aggMode: Q = (s, d) => {
    val counts = t(s, d, "events")
      .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"user_id").orderBy($"n".desc, $"event_type")
    counts.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type".as("top_type"), $"n")
      .orderBy($"user_id")
  }

  /** ROLLUP grouping sets (delegated-SQL class; PG/ClickHouse support). */
  val aggRollup: Q = (s, d) =>
    t(s, d, "lineitem").rollup($"l_returnflag", $"l_linestatus")
      .agg(sumd($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)

  /** CUBE: all 2^k grouping combinations. */
  val aggCube: Q = (s, d) =>
    t(s, d, "lineitem").cube($"l_returnflag", $"l_linestatus")
      .agg(sumd($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)

  /** Explicit GROUPING SETS via SQL (arbitrary set lists). */
  val aggGroupingSets: Q = (s, d) => {
    Tables.load(s, d, "lineitem").createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
  }

  /** Exact interpolated percentiles per group (delegated-SQL class:
    * PG percentile_cont / ClickHouse quantile). */
  val aggPercentile: Q = (s, d) =>
    // one percentile agg evaluates all three points in a single pass; the
    // quartiles surface as scalar columns (array outputs break column-wise
    // result comparison downstream)
    t(s, d, "lineitem").groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))").as("qs"))
      .select($"l_returnflag",
        round(element_at($"qs", 1), 6).as("p25"),
        round(element_at($"qs", 2), 6).as("p50"),
        round(element_at($"qs", 3), 6).as("p75"))
      .orderBy($"l_returnflag")

  /** Statistical aggregates (stddev, correlation) with *exact* moments:
    * built-in corr/stddev sum doubles in partition order (non-associative →
    * partitioning-dependent bits), so the moments Σx, Σx², Σxy accumulate in
    * DECIMAL — exact and associative under any partitioning — and the
    * closed-form formulas run on the handful of exact scalars. l_quantity /
    * l_extendedprice carry ≤2 decimals, so DECIMAL(18,2) products at (37,4)
    * stay exact in both engines. */
  val aggStats: Q = (s, d) => {
    val x = $"l_quantity".cast(DecimalType(18, 2))
    val y = $"l_extendedprice".cast(DecimalType(18, 2))
    t(s, d, "lineitem").groupBy($"l_returnflag")
      .agg(
        count(lit(1)).cast(DoubleType).as("n"),
        sum(x).cast(DoubleType).as("sx"),
        sum(y).cast(DoubleType).as("sy"),
        sum(x * x).cast(DoubleType).as("sxx"),
        sum(y * y).cast(DoubleType).as("syy"),
        sum(x * y).cast(DoubleType).as("sxy"))
      .select($"l_returnflag",
        round(sqrt(($"sxx" - $"sx" * $"sx" / $"n") / ($"n" - 1)), 6).as("stddev_qty"),
        round((($"n" * $"sxy") - ($"sx" * $"sy")) /
          sqrt((($"n" * $"sxx") - ($"sx" * $"sx")) * (($"n" * $"syy") - ($"sy" * $"sy"))), 6)
          .as("corr_qty_price"))
      .orderBy($"l_returnflag")
  }

  /** Ordered string aggregation (PG string_agg / MySQL group_concat class);
    * sorted so the result is order-insensitive to partitioning. */
  val aggCollectSorted: Q = (s, d) =>
    t(s, d, "customer").filter($"c_nationkey" < 3)
      .groupBy($"c_nationkey")
      .agg(array_join(sort_array(collect_list($"c_name")), ",").as("names"),
        count(lit(1)).as("n"))
      .orderBy($"c_nationkey")

  /** Partition pruning: the events table rewritten partitioned by
    * event_type, then queried with a partition predicate — the scan touches
    * 1 of 5 directories (PartitionFilters asserted in PlanSpec). At 100 TB
    * this is the difference between reading 20 TB and reading 100 TB. */
  /** Build-or-reuse the hive-partitioned events layout (pay-once artifact,
    * like the bucketed layout). */
  private[graft] def eventsPartLayout(s: SparkSession, d: String): String =
    graft.plans.ArtifactCache.getOrBuild("evpart", d, Seq("events"),
      Seq(RelOps.getClass, Tables.getClass)) { dir =>
      Tables.load(s, d, "events")
        .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    }

  val scanPartitionPrune: Q = (s, d) => {
    val root = eventsPartLayout(s, d)
    graft.plans.ArtifactCache.readParquet(s, root)
      .filter($"event_type" === "purchase")
      .groupBy($"ts".cast(DateType).as("day"))
      .agg(count(lit(1)).as("n"), sumd($"value").as("total"))
      .orderBy($"day")
  }

  // ---------------------------------------------------------------- joins
  /** Fact⋈dim equi join (README "Usecase": entries ⋈ users). customer is
    * small → AQE turns this into a broadcast join automatically. */
  val joinInner: Q = (s, d) =>
    t(s, d, "orders").join(t(s, d, "customer"), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_name", $"o_totalprice")
      .orderBy($"o_orderkey")

  /** Left outer join + aggregate (per-customer order rollup incl. zero-order
    * customers). */
  val joinLeft: Q = (s, d) =>
    t(s, d, "customer").join(t(s, d, "orders"), $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("n_orders"),
        coalesce(sum(dec($"o_totalprice")), lit(0)).cast(DoubleType).as("total_spent"))
      .orderBy($"c_custkey")

  /** Semi join (EXISTS). */
  val joinSemi: Q = (s, d) =>
    t(s, d, "customer").join(t(s, d, "orders"), $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name").orderBy($"c_custkey")

  /** Anti join (NOT EXISTS): customers with no high-value order. The right
    * side is filtered (o_totalprice > 400k) so the result is non-trivial on
    * the fixtures — every customer has *some* order. */
  val joinAnti: Q = (s, d) =>
    t(s, d, "customer")
      .join(t(s, d, "orders").filter($"o_totalprice" > 400000),
        $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name").orderBy($"c_custkey")

  /** Explicit broadcast of a small dimension: no shuffle of the fact side
    * at all. The part dimension scales linearly with SF (200k rows PER SF,
    * so ~20 G rows at the SF ≈ 100k that 100 TB implies), so the leg rides
    * the [[DimGates]] size gate — broadcast under
    * `Limits.maxBroadcastDimRows` (always, at fixture scale), keyed
    * SHUFFLE_HASH build past it. */
  val joinBroadcast: Q = (s, d) =>
    t(s, d, "lineitem")
      .join(DimGates.gated(s, d, "part")(
          t(s, d, "part").filter($"p_type" === "PROMO")),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(sumd($"l_quantity").as("promo_qty"), count(lit(1)).as("n"))
      .orderBy($"p_brand")

  /** Co-located (bucketed) join: both sides pre-bucketed on the join key →
    * the join itself plans with no Exchange and no Sort (asserted in
    * PlanSpec). The write is the one-time shuffle, cached per source
    * fingerprint ([[graft.plans.ArtifactCache]]) exactly like a production
    * bucketed layout: built once, joined every day. */
  /** Build-or-reuse the bucketed layout + catalog registrations; returns the
    * two registered table names. Exposed so the bench warm-up can pre-build
    * (steady-state timing — the build is a pipeline stage, not the query). */
  private[graft] def bucketedLayout(s: SparkSession, d: String): (String, String) = {
    import graft.plans.{ArtifactCache, BucketedJoin}
    val logic = Seq(RelOps.getClass, BucketedJoin.getClass, graft.Tables.getClass)
    val fp = ArtifactCache.fingerprint(d, Seq("orders", "customer"), logic)
    val (tOrders, tCust) = (s"graft_bk_orders_$fp", s"graft_bk_customer_$fp")
    val wh = ArtifactCache.getOrBuild("bucketed", d, Seq("orders", "customer"), logic) { dir =>
      // write under throwaway catalog names anchored at the staging dir and
      // drop them right away (EXTERNAL: the bucket files stay) — the durable
      // registration below points at the published path
      BucketedJoin.writeBucketed(
        t(s, d, "orders").select($"o_custkey", $"o_totalprice"),
        s"${tOrders}__build", "o_custkey", 8, s"$dir/orders")
      BucketedJoin.writeBucketed(
        t(s, d, "customer").select($"c_custkey", $"c_mktsegment"),
        s"${tCust}__build", "c_custkey", 8, s"$dir/customer")
      s.sql(s"DROP TABLE IF EXISTS ${tOrders}__build")
      s.sql(s"DROP TABLE IF EXISTS ${tCust}__build")
    }
    // register (any session; metadata-only) with the schema read back from
    // the artifact itself, so the DDL can never drift from the data
    BucketedJoin.registerBucketed(s, tOrders,
      graft.plans.ArtifactCache.readParquet(s, s"$wh/orders").schema.toDDL, "o_custkey", 8, s"$wh/orders")
    BucketedJoin.registerBucketed(s, tCust,
      graft.plans.ArtifactCache.readParquet(s, s"$wh/customer").schema.toDDL, "c_custkey", 8, s"$wh/customer")
    (tOrders, tCust)
  }

  val joinBucketed: Q = (s, d) => {
    val (tOrders, tCust) = bucketedLayout(s, d)
    graft.plans.BucketedJoin.join(s, tOrders, tCust, "o_custkey", "c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), sumd($"o_totalprice").as("total"))
      .orderBy($"c_mktsegment")
  }

  /** Skew-resistant salted join as a first-class query: semantically the
    * plain equi-join (the oracle is exactly that), physically each hot key
    * spreads over 8 sub-keys — the explicit fallback for a broadcast-
    * ineligible hot key AQE's partition splitting can't fix
    * ([[graft.plans.SaltedJoin]]). */
  val joinSalted: Q = (s, d) => {
    val ev = t(s, d, "events").select($"user_id", $"value")
    val cust = t(s, d, "customer").select($"c_custkey", $"c_mktsegment")
    graft.plans.SaltedJoin.join(ev, cust, col("user_id"), col("c_custkey"), 8)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), sumd($"value").as("total_value"))
      .orderBy($"c_mktsegment")
  }

  /** Bloom sizing for [[joinBloomPruned]]: deliberately SMALL (2^12 bits,
    * k = 2) so the false-positive audit exercises a loaded filter — a
    * production runtime filter sizes m to the build side and drives FP
    * toward zero; the semantics (no false negatives, exact verify behind
    * the prune) are identical at any size. */
  val joinBloomBits = 1 << 12
  val joinBloomHashes = 2

  /** The k bloom bit positions of an integer key (PolyHash affine
    * rehashes, the same universal family the dedup prefilter uses). */
  private def joinBloomPos(key: Column): Column =
    array((0 until joinBloomHashes).map(i =>
      graft.functions.PolyHash.affine(i, key) % lit(joinBloomBits.toLong)): _*)

  /** Runtime bloom-filter join pruning — the star-schema scan-time
    * semi-join reduction (Spark's own `runtime.bloomFilter`, Delta/ORC
    * bloom indexes, and every MPP's runtime filter share this shape):
    * build a Bloom filter over the FILTERED dimension's join keys
    * (parts of one brand), broadcast it to the fact scan as one dense
    * bit-array row, and let each fact row test membership MAP-SIDE before
    * any join — only "maybe" rows reach the exact join. The audit output
    * proves the contract in-query: no false negatives (revenue through
    * the pruned path equals the direct join's revenue, both as exact
    * decimal sums) and a measured false-positive rate.
    *
    * 100 TB shape: the filter is |words| longs (here 128; m scales with
    * the build side, never the fact side) broadcast once; the fact table
    * is scanned once with the probe fused into codegen (two affine
    * rehashes + two array probes per row — no explode, no per-row join);
    * the exact verify join only sees the pruned survivors. */
  val joinBloomPruned: Q = (s, d) => {
    val keys = t(s, d, "part").filter($"p_brand" === "Brand#1")
      .select($"p_partkey")
    val words = keys
      .select(explode(joinBloomPos($"p_partkey")).as("pos"))
      .select(shiftright($"pos", 5).as("word"),
        call_function("shiftleft", lit(1L), ($"pos".bitwiseAND(lit(31L))).cast(IntegerType)).as("mask"))
      .groupBy($"word").agg(expr("bit_or(mask)").as("bits"))
    // densify to ONE array row (missing words = 0) — the broadcastable
    // bitmap a real runtime filter ships to every scan task
    val dense = s.range(joinBloomBits / 32).toDF("word")
      .join(words, Seq("word"), "left")
      .agg(sort_array(collect_list(struct($"word",
        coalesce($"bits", lit(0L)).as("bits")))).as("wb"))
      .select(transform($"wb", e => e.getField("bits")).as("arr"))
    val fact = t(s, d, "lineitem")
      .select($"l_partkey", dec($"l_extendedprice").as("price"))
    val hit = (0 until joinBloomHashes).map { i =>
      val p = graft.functions.PolyHash.affine(i, $"l_partkey") % lit(joinBloomBits.toLong)
      element_at($"arr", (shiftright(p, 5) + 1).cast(IntegerType))
        .bitwiseAND(call_function("shiftleft", lit(1L), (p.bitwiseAND(lit(31L))).cast(IntegerType))) =!= 0
    }.reduce(_ && _)
    val truth = keys.select($"p_partkey".as("l_partkey"), lit(true).as("is_match"))
    fact.crossJoin(broadcast(dense))
      .select($"l_partkey", $"price", hit.as("maybe"))
      .join(DimGates.gated(s, d, "part")(truth), Seq("l_partkey"), "left")
      .withColumn("is_match", coalesce($"is_match", lit(false)))
      .agg(
        count(lit(1)).as("n_fact"),
        count(when($"maybe", lit(1))).as("n_pass"),
        count(when($"is_match", lit(1))).as("n_match"),
        count(when($"maybe" && !$"is_match", lit(1))).as("n_false_pos"),
        sum(when($"maybe" && $"is_match", $"price")).as("rb"),
        sum(when($"is_match", $"price")).as("re"))
      .select($"n_fact", $"n_pass", $"n_match", $"n_false_pos",
        round($"n_false_pos".cast(DoubleType) /
          greatest($"n_fact" - $"n_match", lit(1L)).cast(DoubleType), 6)
          .as("fp_rate"),
        $"rb".cast(DoubleType).as("revenue_pruned"),
        $"re".cast(DoubleType).as("revenue_exact"))
  }

  /** Equi + range join (ts ≥ bound residual). The equi key keeps it a hash
    * join at scale; the range term is a post-join filter, never a
    * BroadcastNestedLoop over the fact table. */
  val joinRange: Q = (s, d) => {
    // Semantics: per order, how many of the customer's events fall at or
    // after the order date (the range-join shape). The naive spelling —
    // equi-join on user + range post-filter — materializes events×orders
    // rows PER USER before aggregating (quadratic in a user's activity;
    // 7.5 M intermediate rows at sf0.1, unbounded for a hot user at
    // corpus scale). Re-spelled as the linear merge: union both streams,
    // one per-user window ordered by time DESCENDING with events sorting
    // before same-instant orders (the >= bound), and each order row reads
    // its answer as the running event count. One exchange on the user
    // key, O(n log n) in the user's row count, no pair blowup — the same
    // carry-forward pattern as events_attribution/the as-of family.
    val ev = t(s, d, "events")
      .select($"user_id".as("u"), $"ts".as("tt"),
        lit(1L).as("inc"), lit(null).cast(LongType).as("o_orderkey"))
    val ord = t(s, d, "orders")
      .select($"o_custkey".as("u"), $"o_orderdate".as("tt"),
        lit(0L).as("inc"), $"o_orderkey")
    val w = Window.partitionBy($"u").orderBy($"tt".desc, $"inc".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionAll(ord)
      .withColumn("n_events", sum($"inc").over(w))
      .filter($"o_orderkey".isNotNull && $"n_events" >= 1)
      .select($"o_orderkey", $"n_events")
      .orderBy($"o_orderkey")
  }

  /** Interval-overlap join: per customer, how many PAIRS of their order
    * intervals overlap (each order held open [o_orderdate, o_orderdate+7) —
    * the concurrent-sessions / double-booking shape). A join spelling is
    * inherently quadratic per key (every overlapping pair materializes);
    * the sweep spelling is the classic O(n log n) event decomposition:
    * each interval becomes a start(+1) and an end(−1) event, events sort
    * by (time, end-before-start) per key — end-first encodes the
    * half-open `[s,e)` semantics, s2 = e1 is NOT an overlap — and every
    * start event contributes the number of currently-open intervals
    * (the exclusive-prefix sum of the deltas). The per-key total is exact
    * regardless of tie order inside an instant: k simultaneous starts
    * contribute C(k,2) however the window orders them. ONE exchange on
    * the customer key, no pair blowup — the same merge-not-join rule as
    * [[joinRange]]. The oracle is the quadratic self-join (fine at oracle
    * scale, the thing this operator exists to avoid at 100 TB). */
  val joinIntervalOverlap: Q = (s, d) => {
    val iv = t(s, d, "orders")
      .select($"o_custkey".as("c"), $"o_orderdate".cast(DateType).as("st"),
        date_add($"o_orderdate", 7).as("en"))
    val ev = iv.select($"c", $"st".as("tt"), lit(1L).as("delta"))
      .unionAll(iv.select($"c", $"en".as("tt"), lit(-1L).as("delta")))
    val w = Window.partitionBy($"c").orderBy($"tt", $"delta")
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("open_before", coalesce(sum($"delta").over(w), lit(0L)))
      .filter($"delta" === 1L)
      .groupBy($"c".as("o_custkey"))
      .agg(sum($"open_before").as("n_overlaps"))
      .filter($"n_overlaps" > 0)
      .orderBy($"o_custkey")
  }

  /** Table fingerprint for migration/replication validation (the job-server
    * use-case: prove a result table landed intact in another store). Per
    * table: row count, distinct-content count, an order-insensitive
    * full-content checksum (SUM of each row's PolyHash over a canonical
    * `|`-joined string image — exact BIGINT arithmetic, so partial-agg
    * order can't perturb it), and the min/max MD5 digest as spot probes.
    * One map-side pass per table, one-row aggregate out — at 100 TB this
    * is the cheapest possible whole-table integrity check (pure scan, no
    * shuffle beyond the 1-row final). Doubles are excluded from the row
    * image: decimal rendering is engine-specific, keys/strings/dates are
    * not. */
  val tableChecksum: Q = (s, d) => {
    def fp(name: String, df: DataFrame, image: Column): DataFrame =
      df.select(image.as("img"))
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct($"img").as("n_distinct"),
          sum(graft.functions.PolyHash.poly_hash($"img")).as("content_sum"),
          min(md5($"img")).as("md5_min"),
          max(md5($"img")).as("md5_max"))
        .select(lit(name).as("tbl"), $"n_rows", $"n_distinct",
          $"content_sum", $"md5_min", $"md5_max")
    val o = fp("orders", t(s, d, "orders"),
      concat_ws("|", $"o_orderkey", $"o_custkey", $"o_orderstatus",
        $"o_orderdate".cast(StringType), $"o_orderpriority"))
    val c = fp("customer", t(s, d, "customer"),
      concat_ws("|", $"c_custkey", $"c_name", $"c_mktsegment", $"c_nationkey"))
    val n = fp("nation", t(s, d, "nation"),
      concat_ws("|", $"n_nationkey", $"n_name", $"n_regionkey"))
    o.unionAll(c).unionAll(n).orderBy($"tbl")
  }

  /** Whole-catalog migration checksum: every fixture table reduced to a
    * fingerprint row (row count, distinct-image count, polyhash content
    * sum, min/max row digest) — the cross-engine validation a team runs
    * after ANY copy/migration/engine swap; [[tableChecksum]]'s contract
    * extended to all ten tables. Row images render only engine-stable
    * types: BIGINTs, strings, money as floor(x·100) (a bare double→string
    * render differs between engines), timestamps as epoch micros, text as
    * its md5, embeddings as (dim, floor(first·10⁶)). The content SUM is
    * order-insensitive, so partitioning/AQE cannot move it; at true 100 TB
    * row counts the sum widens to DECIMAL(38,0)/HUGEINT — the
    * [[graft.CanonicalTypes]] pairing.
    *
    * 100 TB shape: one map-side-combined aggregate per table — ten scans,
    * ten one-row results, no shuffle beyond the partial merge. */
  val catalogChecksum: Q = (s, d) => {
    def money(c: Column): Column =
      floor(c.cast(DoubleType) * 100.0d).cast(LongType)
    def fp(name: String, df: DataFrame, image: Column): DataFrame =
      df.select(image.as("img"))
        .agg(count(lit(1)).as("n_rows"), countDistinct($"img").as("n_distinct"),
          sum(graft.functions.PolyHash.poly_hash($"img")).as("content_sum"),
          min(md5($"img")).as("md5_min"), max(md5($"img")).as("md5_max"))
        .select(lit(name).as("tbl"), $"n_rows", $"n_distinct",
          $"content_sum", $"md5_min", $"md5_max")
    Seq(
      fp("region", t(s, d, "region"), concat_ws("|", $"r_regionkey", $"r_name")),
      fp("nation", t(s, d, "nation"),
        concat_ws("|", $"n_nationkey", $"n_name", $"n_regionkey")),
      fp("supplier", t(s, d, "supplier"),
        concat_ws("|", $"s_suppkey", $"s_name", $"s_nationkey", money($"s_acctbal"))),
      fp("part", t(s, d, "part"),
        concat_ws("|", $"p_partkey", $"p_name", $"p_brand", $"p_type",
          $"p_size", money($"p_retailprice"))),
      fp("customer", t(s, d, "customer"),
        concat_ws("|", $"c_custkey", $"c_name", $"c_mktsegment", $"c_nationkey")),
      fp("orders", t(s, d, "orders"),
        concat_ws("|", $"o_orderkey", $"o_custkey", $"o_orderstatus",
          money($"o_totalprice"), $"o_orderdate".cast(StringType),
          $"o_orderpriority")),
      fp("lineitem", t(s, d, "lineitem"),
        concat_ws("|", $"l_orderkey", $"l_partkey", $"l_suppkey", $"l_linenumber",
          money($"l_quantity"), money($"l_extendedprice"), money($"l_discount"),
          money($"l_tax"), $"l_returnflag", $"l_linestatus",
          $"l_shipdate".cast(StringType))),
      fp("events", t(s, d, "events"),
        concat_ws("|", $"event_id", unix_micros($"ts"), $"user_id",
          $"event_type", money($"value"), $"props")),
      fp("documents", t(s, d, "documents"),
        concat_ws("|", $"doc_id", md5($"text"), $"lang", $"source", $"n_chars")),
      fp("embeddings", t(s, d, "embeddings"),
        concat_ws("|", $"vec_id", $"label", size($"embedding"),
          floor(element_at($"embedding", 1).cast(DoubleType) * 1000000.0d)
            .cast(LongType)))
    ).reduce(_ unionAll _).orderBy($"tbl")
  }

  // ------------------------------------------------------- sort / window
  /** ORDER BY + LIMIT → TakeOrderedAndProject (top-k per partition, then
    * k-merge on the driver — no global sort). */
  val sortLimit: Q = (s, d) =>
    t(s, d, "orders")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")

  /** Ranking window (latest-N per key; reference class: per-user latest
    * report rows). One shuffle on the partition key. */
  val windowRank: Q = (s, d) => {
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".desc, $"o_orderkey")
    t(s, d, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"rn")
      .orderBy($"o_custkey", $"rn")
  }

  /** Running aggregate (the zerodha running-P&L use-case). Decimal sum keeps
    * the prefix sums exact. */
  val windowRunning: Q = (s, d) => {
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "events")
      .select($"user_id", $"event_id",
        sum(dec($"value")).over(w).cast(DoubleType).as("running"))
      .orderBy($"user_id", $"event_id")
  }

  /** Time-RANGE window frame: per-user trailing-1-hour value sum. Unlike
    * the ROWS frames above, the frame is bounded by EVENT TIME (all rows
    * within [ts − 1h, ts]) — the windowed-metric shape monitoring and
    * feature pipelines use. Ordered on microsecond epoch so the frame
    * bounds are exact integers; decimal accumulation keeps the sums exact
    * under any partial order. One shuffle on user_id; the range frame is a
    * sliding two-pointer over each sorted partition, never a per-row
    * rescan. */
  val windowRangeFrame: Q = (s, d) => {
    val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
      .rangeBetween(-3600000000L, 0L)
    t(s, d, "events")
      .select($"user_id", $"event_id",
        sum(dec($"value")).over(w).cast(DoubleType).as("trailing_1h"))
      .orderBy($"user_id", $"event_id")
  }

  /** lag/lead analytic delta. */
  val windowLag: Q = (s, d) => {
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    t(s, d, "events")
      .select($"user_id", $"event_id",
        ($"value" - lag($"value", 1).over(w)).as("delta"))
      .orderBy($"user_id", $"event_id")
  }

  /** Per-group top-k via the bounded-memory typed Aggregator
    * ([[graft.functions.TopKAggregator]]) instead of a window sort: O(k)
    * state per key, map-side partials — same rows as window_rank's top-3
    * (the oracle is the window formulation). */
  val windowTopKAgg: Q = (s, d) => {
    graft.functions.TopKAggregator.register(s, "top3_ids", 3)
    t(s, d, "orders")
      .groupBy($"o_custkey")
      .agg(expr("top3_ids(cast(unix_millis(cast(o_orderdate as timestamp)) as double), o_orderkey)")
        .as("ids"))
      .select($"o_custkey", posexplode($"ids"))
      .select($"o_custkey", ($"pos" + 1).cast(LongType).as("rn"), $"col".as("o_orderkey"))
      .orderBy($"o_custkey", $"rn")
  }

  /** ntile + explicit-frame first/last_value (analytic frame class). */
  val windowNtile: Q = (s, d) => {
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice", $"o_orderkey")
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, d, "orders").select(
        $"o_custkey", $"o_orderkey",
        ntile(4).over(w).as("quartile"),
        first($"o_totalprice").over(full).as("min_price"),
        last($"o_totalprice").over(full).as("max_price"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** Relative-rank analytics: percent_rank + cume_dist. */
  val windowPercentRank: Q = (s, d) => {
    val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice", $"o_orderkey")
    t(s, d, "orders").select(
        $"o_orderpriority", $"o_orderkey",
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy($"o_orderpriority", $"o_orderkey")
  }

  /** Edit-distance scalar (fuzzy-match class; feeds dedup candidate scoring). */
  val scalarLevenshtein: Q = (s, d) =>
    t(s, d, "part").select(
        $"p_partkey",
        levenshtein($"p_brand", lit("Brand#10")).cast(LongType).as("brand_dist"),
        levenshtein($"p_type", $"p_brand").cast(LongType).as("type_brand_dist"))
      .orderBy($"p_partkey")

  // --------------------------------------------------------- set algebra
  val setUnion: Q = (s, d) =>
    t(s, d, "customer").select($"c_nationkey".as("nk"))
      .unionAll(t(s, d, "supplier").select($"s_nationkey".as("nk")))
      .groupBy($"nk").agg(count(lit(1)).as("n"))
      .orderBy($"nk")

  val setIntersect: Q = (s, d) =>
    t(s, d, "customer").select($"c_nationkey".as("nk"))
      .intersect(t(s, d, "supplier").select($"s_nationkey".as("nk")))
      .orderBy($"nk")

  /** EXCEPT over filtered key sets (suppliers span every nation, so the
    * unfiltered difference would be empty). */
  val setExcept: Q = (s, d) =>
    t(s, d, "customer").select($"c_nationkey".as("nk"))
      .except(t(s, d, "supplier").filter($"s_acctbal" > 5000).select($"s_nationkey".as("nk")))
      .orderBy($"nk")

  val distinctRows: Q = (s, d) =>
    t(s, d, "lineitem").select($"l_returnflag", $"l_linestatus").distinct()
      .orderBy($"l_returnflag", $"l_linestatus")

  // ------------------------------------------------------- scalar exprs
  val scalarString: Q = (s, d) =>
    t(s, d, "customer").select(
        $"c_custkey",
        upper($"c_name").as("uname"),
        substring($"c_name", 1, 8).as("pre"),
        concat_ws("-", $"c_mktsegment", $"c_name").as("tagged"),
        $"c_name".like("%5%").as("has5"))
      .orderBy($"c_custkey")

  val scalarDate: Q = (s, d) =>
    t(s, d, "orders").select(
        $"o_orderkey",
        date_trunc("month", $"o_orderdate").cast(DateType).as("mon"),
        year($"o_orderdate").cast(LongType).as("yr"),
        datediff(lit("2002-01-01").cast(DateType), $"o_orderdate".cast(DateType))
          .cast(LongType).as("days_to_2002"))
      .orderBy($"o_orderkey")

  val scalarMath: Q = (s, d) =>
    t(s, d, "lineitem").select(
        $"l_orderkey", $"l_linenumber",
        round(dec($"l_extendedprice") * dec($"l_tax"), 2).cast(DoubleType).as("tax_amt"),
        abs($"l_discount" - 0.05).as("disc_dev"),
        ($"l_quantity" * 2.0 + 1.0).as("q21"))
      .orderBy($"l_orderkey", $"l_linenumber")

  val scalarCase: Q = (s, d) =>
    t(s, d, "orders").select(
        when($"o_totalprice" < 100000, "small")
          .when($"o_totalprice" < 300000, "mid")
          .otherwise("big").as("bucket"))
      .groupBy($"bucket").agg(count(lit(1)).as("n"))
      .orderBy($"bucket")

  /** JSON text passthrough + extraction (the reference's JSON/JSONB class,
    * `sqldb.go:267-272`; `events.props`). */
  val jsonExtract: Q = (s, d) =>
    t(s, d, "events").select(
        $"event_id",
        get_json_object($"props", "$.k").cast(LongType).as("k"))
      .orderBy($"event_id")

  /** Array-column handling (the reference's PG-array passthrough class,
    * `sqldb.go:273-276`; `embeddings.embedding`). */
  val arrayOps: Q = (s, d) =>
    t(s, d, "embeddings").select(
        $"vec_id",
        size($"embedding").cast(LongType).as("dim"),
        element_at($"embedding", 1).cast(DoubleType).as("first_val"),
        $"label")
      .orderBy($"vec_id")

  /** LIMIT/OFFSET pagination over an ordered result (README: follow-up
    * queries against the results cache). */
  val limitPage: Q = (s, d) =>
    t(s, d, "orders")
      .orderBy($"o_orderkey").offset(100).limit(50)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey")

  /** Pivot (delegated-SQL class: PG crosstab / ClickHouse pivot idiom):
    * order counts per priority pivoted by orderstatus. */
  val pivotTable: Q = (s, d) =>
    t(s, d, "orders").groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy($"o_orderpriority")

  /** FULL OUTER join: customers×events coverage report — customers with no
    * events and event users with no customer row both survive. Same
    * shuffle/AQE story as the inner join; null-extension is free. */
  val joinFull: Q = (s, d) => {
    val perUser = t(s, d, "events").groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"))
    t(s, d, "customer").select($"c_custkey", $"c_name")
      .join(perUser, $"c_custkey" === $"user_id", "full_outer")
      .select(
        coalesce($"c_custkey", $"user_id").as("key"),
        $"c_name",
        coalesce($"n_events", lit(0L)).as("n_events"))
      .orderBy($"key")
  }

  /** UNPIVOT (melt): wide per-row measures → long (row, measure, value) —
    * the inverse of pivot_table; stack() stays inside codegen, output is
    * measures× the input rows with no shuffle before the final sort. */
  val unpivotTable: Q = (s, d) =>
    t(s, d, "lineitem").filter($"l_orderkey" < 100)
      .select($"l_orderkey", $"l_linenumber",
        expr("""stack(3, 'quantity', l_quantity,
                         'extendedprice', l_extendedprice,
                         'discount', l_discount) AS (measure, value)"""))
      .select($"l_orderkey", $"l_linenumber", $"measure",
        round($"value".cast(DoubleType), 6).as("value"))
      .orderBy($"l_orderkey", $"l_linenumber", $"measure")

  /** LATERAL explode: flatten an array column with ordinality. */
  val explodeLateral: Q = (s, d) =>
    t(s, d, "embeddings").filter($"vec_id" < 3)
      .select($"vec_id", posexplode($"embedding"))
      .select($"vec_id", ($"pos" + 1).cast(LongType).as("i"),
        round($"col".cast(DoubleType), 6).as("v"))
      .orderBy($"vec_id", $"i")

  /** Regex scalar class: extract + global replace + match test. */
  val scalarRegex: Q = (s, d) =>
    t(s, d, "part").select(
        $"p_partkey",
        regexp_extract($"p_brand", "Brand#(\\d+)", 1).cast(LongType).as("brand_num"),
        regexp_replace($"p_name", "[aeiou]", "_").as("devoweled"),
        $"p_type".rlike("^(PROMO|ECONOMY)").as("is_cheap_class"))
      .orderBy($"p_partkey")

  /** NULL-handling scalar class over real outer-join nulls. */
  val scalarNull: Q = (s, d) =>
    t(s, d, "customer")
      .join(t(s, d, "orders").filter($"o_totalprice" > 450000),
        $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(max($"o_totalprice").as("max_big"))
      .select(
        $"c_custkey",
        coalesce($"max_big", lit(-1.0)).as("max_or_default"),
        $"max_big".isNull.as("has_none"),
        nullif(coalesce($"max_big", lit(0.0)), lit(0.0)).as("nullified"))
      .orderBy($"c_custkey")

  // ----------------------------------------------------------- subqueries
  /** IN subquery (delegated-SQL class: membership against a derived key
    * set). Catalyst rewrites it to a left-semi join, so at 100 TB it is the
    * same shuffle-or-broadcast plan as `join_semi` — never a per-row probe. */
  val subqueryIn: Q = (s, d) => {
    t(s, d, "orders").createOrReplaceTempView("orders")
    t(s, d, "customer").createOrReplaceTempView("customer")
    s.sql(
      """SELECT o_orderkey, o_custkey FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer
                             WHERE c_mktsegment = 'BUILDING')
         ORDER BY o_orderkey""")
  }

  /** Uncorrelated scalar subquery: orders above the global mean price. The
    * mean comparison is cross-multiplied (price·n > Σprice) so both engines
    * compare exact decimals — no decimal-division rounding to disagree on.
    * Catalyst computes each scalar subquery once and broadcasts it. */
  val subqueryScalar: Q = (s, d) => {
    t(s, d, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE CAST(o_totalprice AS DECIMAL(18,6)) * (SELECT COUNT(*) FROM orders)
               > (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,6))) FROM orders)
         ORDER BY o_orderkey""")
  }

  /** Correlated scalar subqueries: orders above their own customer's mean
    * price (same cross-multiplied exact-decimal comparison). Catalyst
    * decorrelates both subqueries into one grouped aggregate joined back on
    * the key — at scale this is one shuffle on o_custkey, not N probes. */
  val subqueryCorrelated: Q = (s, d) => {
    t(s, d, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderkey, o_custkey FROM orders o
         WHERE CAST(o_totalprice AS DECIMAL(18,6)) *
               (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
               > (SELECT SUM(CAST(o2.o_totalprice AS DECIMAL(18,6))) FROM orders o2
                  WHERE o2.o_custkey = o.o_custkey)
         ORDER BY o_orderkey""")
  }

  /** Explicit CROSS JOIN (dimension grid; both sides tiny). At scale a
    * cartesian is only ever sane dim×dim — the plan is a
    * BroadcastNestedLoopJoin with the smaller side broadcast. */
  val joinCross: Q = (s, d) =>
    t(s, d, "region").select($"r_name")
      .crossJoin(t(s, d, "nation").select($"n_name", $"n_nationkey"))
      .select($"r_name", $"n_name")
      .orderBy($"r_name", $"n_name")

  /** FILTER-clause aggregates (conditional aggregation without N self-joins;
    * PG/DuckDB FILTER, the portable form of `sum(case when ...)`). One pass,
    * partial aggregation — the conditions evaluate map-side. */
  val aggFiltered: Q = (s, d) => {
    t(s, d, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderpriority,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
               CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                 FILTER (WHERE o_totalprice > 200000), 0) AS DOUBLE) AS big_total
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  }

  /** Digest scalars (md5/sha256 hex — content addressing, the front of every
    * exact-dedup and cache key; both engines emit identical lowercase hex). */
  val scalarHash: Q = (s, d) =>
    t(s, d, "customer").select(
        $"c_custkey",
        md5($"c_name").as("name_md5"),
        sha2($"c_name", 256).as("name_sha256"))
      .orderBy($"c_custkey")

  /** Bitwise scalar class (flag masks, shard routing, popcount — simhash
    * hamming verify is built from exactly these). */
  val scalarBitwise: Q = (s, d) =>
    t(s, d, "orders").select(
        $"o_orderkey",
        ($"o_orderkey".bitwiseAND(lit(255L))).as("low_byte"),
        ($"o_orderkey".bitwiseOR(lit(16L))).as("or16"),
        ($"o_orderkey".bitwiseXOR(lit(85L))).as("x85"),
        bit_count($"o_orderkey").cast(LongType).as("popcount"))
      .orderBy($"o_orderkey")

  /** CDC upsert merge: a corrections batch overrides the base snapshot on
    * the primary key (`event_id`); untouched base rows survive, batch-only
    * keys would insert. Spelled as anti-join(base, batch) ∪ batch — the
    * scalable merge shape: the batch (always orders of magnitude smaller
    * than the snapshot) broadcasts into the anti-join, so the 100 TB base
    * never shuffles and never sorts. The window alternative
    * (union → row_number over key) shuffles and sorts the full snapshot.
    * The batch here is derived deterministically (every 7th event gets a
    * corrected value) so the oracle can replay it. */
  val mergeUpsert: Q = (s, d) => {
    val base = t(s, d, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val batch = base.filter($"event_id" % 7 === 0)
      .select($"event_id", $"ts", $"user_id",
        lit("corrected").as("event_type"), ($"value" + 1000.0d).as("value"))
    base.join(DimGates.gated(s, d, "events")(batch.select($"event_id")),
        Seq("event_id"), "left_anti")
      .unionByName(batch)
      .orderBy($"event_id")
  }

  /** Window value-picker class: first/last/nth of the frame plus CUME_DIST.
    * The ordering (ts, event_id) is total within a partition, so the picks
    * and the cumulative distribution are deterministic. last/nth take the
    * explicit full frame — the default frame stops at CURRENT ROW, which
    * both engines would interpret identically but means "running last",
    * i.e. the current row itself. Per-key window sort only — no global
    * shuffle beyond the partitionBy exchange. */
  val windowFirstLast: Q = (s, d) => {
    val ord = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, d, "events")
      .select($"user_id", $"event_id",
        first($"value").over(ord).as("first_val"),
        last($"value").over(full).as("last_val"),
        nth_value($"value", 2).over(full).as("second_val"),
        cume_dist().over(ord).as("cd"))
      .orderBy($"user_id", $"event_id")
  }

  /** Global row index over a total order WITHOUT the single-task trap. A
    * `row_number() OVER (ORDER BY …)` window has an empty PARTITION BY —
    * Spark funnels the whole table through ONE task. The distributed
    * spelling is the same two-phase prefix the token-budget sampler uses
    * ([[graft.operators.PipelineOps.sampleTokenBudget]]): range-partition
    * on the sort key so partition ids follow the global order, row_number
    * in parallel per-partition windows, then a partition-offset table
    * (#partitions rows, broadcast back) — `pos = offset(part) + rn - 1`.
    * Everything stays in DataFrame land / whole-stage codegen; the earlier
    * `rdd.zipWithIndex` spelling deserialized every row to `GenericRow`,
    * exited codegen, and ran zipWithIndex's extra count job (5.7 s vs
    * ~1 s at sf0.1). The single-partition offset window touches
    * #partitions rows, never corpus rows, so the shape survives 100 TB. */
  val sortGlobalIndex: Q = (s, d) => {
    val base = t(s, d, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_shipdate")
      .repartitionByRange(32, $"l_shipdate", $"l_orderkey", $"l_linenumber")
      .withColumn("part", spark_partition_id())
    val wIn = Window.partitionBy($"part")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
    val local = base.withColumn("rn", row_number().over(wIn).cast(LongType))
    val wOff = Window.orderBy($"part").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy($"part").agg(count(lit(1)).as("part_n"))
      .withColumn("offset", coalesce(sum($"part_n").over(wOff), lit(0L)))
      .select($"part", $"offset")
    local.join(broadcast(offsets), "part")
      .select(($"offset" + $"rn" - 1L).as("pos"), $"l_orderkey", $"l_linenumber")
      .sortWithinPartitions($"pos")
  }

  /** Approximate percentile, self-validating (the `agg_approx_distinct`
    * contract): emit the EXACT quartiles plus a boolean pinning the sketch
    * (`percentile_approx`, Greenwald-Khanna at accuracy 10000 → ≤0.01%-ile
    * rank error) to within 1% relative value error of exact. The oracle
    * recomputes the exact side and literal `true` — so the sketch's
    * correctness contract is hash-checked even though its bits aren't
    * portable. At 100 TB the sketch is the only viable spelling (bounded
    * state, one pass, mergeable partials); exact percentile needs a
    * per-group sort. */
  val aggApproxPercentile: Q = (s, d) =>
    t(s, d, "lineitem").groupBy($"l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))").as("ex"),
        expr("percentile_approx(l_extendedprice, array(0.25D, 0.5D, 0.75D), 10000)").as("ap"))
      .select($"l_returnflag",
        round(element_at($"ex", 1), 6).as("p25"),
        round(element_at($"ex", 2), 6).as("p50"),
        round(element_at($"ex", 3), 6).as("p75"),
        (abs(element_at($"ap", 1) - element_at($"ex", 1)) <= abs(element_at($"ex", 1)) * 0.01d &&
         abs(element_at($"ap", 2) - element_at($"ex", 2)) <= abs(element_at($"ex", 2)) * 0.01d &&
         abs(element_at($"ap", 3) - element_at($"ex", 3)) <= abs(element_at($"ex", 3)) * 0.01d)
          .as("within_tol"))
      .orderBy($"l_returnflag")

  /** Quantity-weighted average unit price per return flag — the weighted
    * metric every pricing/quality dashboard carries (a plain AVG over
    * line items double-counts big lines). Both sums are EXACT decimals
    * (weight × value widens, never rounds), so partial aggregation order
    * cannot move the result; the single float division + round happens
    * once per output row with identical formula text in the oracle.
    * One two-phase map-side-combined aggregate — flag-cardinality output. */
  val aggWeightedAvg: Q = (s, d) =>
    t(s, d, "lineitem").groupBy($"l_returnflag")
      .agg(sum(dec($"l_extendedprice") * dec($"l_quantity")).as("wsum"),
        sum(dec($"l_quantity")).as("w"))
      .select($"l_returnflag",
        round($"wsum".cast(DoubleType) / $"w".cast(DoubleType), 6)
          .as("weighted_avg_price"))
      .orderBy($"l_returnflag")

  /** Skew-safe two-phase aggregation (manual salting): phase 1 groups on
    * (key, salt) so a pathologically hot key spreads over 16 reducers;
    * phase 2 merges the 16 partials per key. For algebraic aggregates the
    * rewrite is exact — sums of decimal partials reassociate freely. On a
    * healthy key distribution Spark's own partial aggregation makes this a
    * wash; under real skew (one key = 30% of 100 TB) phase 1 is what keeps
    * a single reducer from owning that key's entire volume. Same pattern as
    * [[joinSalted]], aggregation-shaped. */
  val aggSalted: Q = (s, d) => {
    val salted = t(s, d, "lineitem")
      .groupBy($"l_returnflag", pmod(crc32($"l_orderkey".cast(StringType)), lit(16)).as("salt"))
      .agg(sum(dec($"l_quantity")).as("part_qty"), count(lit(1)).as("part_n"))
    salted.groupBy($"l_returnflag")
      .agg(sum($"part_qty").cast(DoubleType).as("sum_qty"), sum($"part_n").as("n"))
      .orderBy($"l_returnflag")
  }

  /** Incremental aggregate maintenance: yesterday's materialized partials
    * (base slice) merge with today's delta partials WITHOUT rescanning the
    * base rows — the batch analog of a streaming state update, and the core
    * trick of any 100 TB rollup kept fresh daily. Works because the stored
    * form is algebraic (decimal SUM + COUNT partials re-aggregate
    * associatively; AVG is derived at read time, never stored). Oracle =
    * the same aggregate computed over the whole table in one pass. */
  val aggIncrementalMerge: Q = (s, d) => {
    val li = t(s, d, "lineitem")
    def partial(slice: DataFrame): DataFrame = slice.groupBy($"l_returnflag")
      .agg(sum(dec($"l_quantity")).as("part_qty"), count(lit(1)).as("part_n"))
    val base = partial(li.filter($"l_orderkey" % 4 < 2))   // "materialized yesterday"
    val delta = partial(li.filter($"l_orderkey" % 4 >= 2)) // "today's increment"
    base.unionByName(delta)
      .groupBy($"l_returnflag")
      .agg(sum($"part_qty").as("qty_dec"), sum($"part_n").as("n"))
      .select($"l_returnflag", $"qty_dec".cast(DoubleType).as("sum_qty"), $"n",
        // derive AVG at read time from the exact partials: decimal → double,
        // then ONE float division (decimal division scales differ per engine)
        ($"qty_dec".cast(DoubleType) / $"n").as("avg_qty"))
      .orderBy($"l_returnflag")
  }

  /** KMV sketch size — 256 gives ~1/√254 ≈ 6% relative error on distinct
    * estimates; the sketch is K rows regardless of corpus size. */
  val kmvK = 256

  /** K-minimum-values distinct + intersection sketch, fully deterministic
    * and audited against exact: the 'view' and 'purchase' user cohorts
    * each keep their K smallest `((user_id % P)·Mult) % P` hash values —
    * the KMV estimator (distinct ≈ (K−1)·P / kth-min when the sketch is
    * full, exact when not) — and the union sketch's members are probed
    * against the exact intersection for the Beyer et al. Jaccard estimate
    * |A∩B ∩ minK(A∪B)| / |minK(A∪B)|. Everything is exact integer
    * ordering over an engine-neutral hash, so BOTH the estimates and the
    * exact audit columns replay bit-for-bit in the oracle — the property
    * no HLL register dump can offer.
    *
    * Scale shape: the distinct (cohort, hash) pass is the only
    * event-volume scan; per-cohort K-min runs as a rank-≤-K window
    * (WindowGroupLimit prunes to K per partition BEFORE the exchange) and
    * the union K-min is TakeOrdered; the exact intersection is one
    * h-keyed semi-join; every sketch-side probe broadcasts K rows. In a
    * production pipeline the per-cohort sketches would persist (they
    * merge by min-of-unions) — this query is the build + audit pass. */
  /** Rolling event-TIME window: per event, the count and exact value
    * sum of its type's events in the trailing hour — a RANGE frame over
    * `unix_micros(ts)`, so the frame is defined by TIME distance, not
    * row count (the [[windowRunning]] ROWS frames answer a different
    * question), and ties on the timestamp all share one frame
    * identically in both engines. The rolling rate every alerting
    * threshold is actually defined against.
    *
    * 100 TB shape: one shuffle keyed by event_type, one sort per
    * partition, streaming frame evaluation — no per-row rescan of the
    * trailing hour. */
  val windowTimeRange: Q = (s, d) => {
    val hourUs = 3600L * 1000000
    val w = Window.partitionBy($"event_type").orderBy(unix_micros($"ts"))
      .rangeBetween(-hourUs, 0)
    t(s, d, "events")
      .select($"event_id", $"event_type", $"ts", $"value")
      .withColumn("n_last_hour", count(lit(1)).over(w))
      .withColumn("value_last_hour",
        round(sum($"value".cast(DecimalType(18, 6))).over(w)
          .cast(DoubleType), 6))
      .select($"event_id", $"event_type", $"n_last_hour", $"value_last_hour")
      .orderBy($"event_id")
  }

  /** Count-min geometry: depth 4 independent hash rows × width 1024
    * counters — 4 KB of state for frequency estimates over any key
    * cardinality. */
  val cmDepth = 4
  val cmWidth = 1024

  /** Count-min sketch build + exact audit (Cormode & Muthukrishnan
    * 2005): per-user event counts estimated from a [[cmDepth]]×
    * [[cmWidth]] counter grid — est(u) = minᵢ counter[i][hᵢ(u)], an
    * OVERESTIMATE by construction, never under. The hash rows reuse the
    * [[graft.functions.PolyHash]] affine family on the int64 key, so
    * the sketch replays bit-for-bit in the oracle (unlike a serialized
    * CMS blob). Output: the top-10 users by TRUE count with true/est/
    * overestimate columns, plus the corpus-wide worst overestimate
    * among all users — the table that says whether 4 KB of sketch
    * suffices at this key cardinality or the width must grow.
    * Completes the sketch family next to KMV (distinct/intersection),
    * HLL, bitmap and bloom.
    *
    * 100 TB shape: the counter build is ONE two-phase aggregate whose
    * exchange carries ≤ depth×width rows regardless of event volume;
    * the 4 KB sketch BROADCASTS back onto the per-user audit frame;
    * top-10 is TakeOrdered. In production only the build runs (the
    * audit is this query's point: it needs the exact counts). */
  /** The sketch-build + per-user estimate pipeline, pre-checkpoint —
    * extracted so PlanSpec can pin the broadcast/partial shapes that the
    * checkpoint in [[aggCmSketch]] hides from an outer explain. */
  private[graft] def cmEstimates(s: SparkSession, d: String): DataFrame = {
    import graft.functions.PolyHash.{Mult, P}
    // key reduces mod P BEFORE the multiply: a·(key mod P) stays under
    // 2^62 for any int64 key, where a·key itself would overflow past
    // ~2^32-scale ids
    def bucket(i: Int, key: Column): Column =
      (lit((2L * i + 1) * Mult % P) * (key % P) +
        lit(i * 1000003L + 12345L)) % P % cmWidth
    val ev = t(s, d, "events").select($"user_id")
    // ONE scan for all depth rows: the union-of-depth spelling re-read the
    // events column cmDepth times (and re-ran the trueCounts aggregate
    // cmDepth times on the probe side); posexplode over the per-row bucket
    // array emits the same (row, bucket) stream from a single pass
    val rows = ev.select(posexplode(array(
      (0 until cmDepth).map(i => bucket(i, $"user_id")): _*)).as(Seq("row", "bucket")))
    val sketch = rows.groupBy($"row", $"bucket")
      .agg(count(lit(1)).as("counter"))
    val trueCounts = ev.groupBy($"user_id").agg(count(lit(1)).as("true_n"))
    trueCounts
      .select($"user_id", $"true_n", posexplode(array(
        (0 until cmDepth).map(i => bucket(i, $"user_id")): _*)).as(Seq("row", "bucket")))
      .join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy($"user_id")
      .agg(first($"true_n").as("true_n"), min($"counter").as("est_n"))
  }

  val aggCmSketch: Q = (s, d) => {
    val est = cmEstimates(s, d)
      .sweepPin() // feeds both the top-10 and the global audit
    val worst = est.agg(max($"est_n" - $"true_n").as("max_overest_all"))
    est
      .orderBy($"true_n".desc, $"user_id")
      .limit(10)
      .withColumn("rn", row_number().over(
        Window.orderBy($"true_n".desc, $"user_id")))
      .crossJoin(broadcast(worst))
      .select($"rn".cast(LongType).as("rn"), $"user_id", $"true_n",
        $"est_n", ($"est_n" - $"true_n").as("overest"),
        $"max_overest_all")
      .orderBy($"rn")
  }

  val aggKmvIntersect: Q = (s, d) => {
    import graft.functions.PolyHash.{Mult, P}
    val ev = t(s, d, "events")
      .filter($"event_type".isin("view", "purchase"))
      .select($"event_type", (($"user_id" % P) * Mult % P).as("h"))
      .distinct().sweepPin() // feeds sketches, exact counts, both cohorts
    val w = Window.partitionBy($"event_type").orderBy($"h")
    val per = ev.withColumn("rn", row_number().over(w)).filter($"rn" <= kmvK)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_sk"), max($"h").as("mk"))
      .join(ev.groupBy($"event_type").agg(count(lit(1)).as("n_ex")), "event_type")
    def est(nsk: Column, mk: Column): Column =
      when(nsk < kmvK, nsk.cast(DoubleType))
        .otherwise(round(lit((kmvK - 1).toDouble) * P / mk, 6))
    val stats = per.agg(
      sum(when($"event_type" === "view", $"n_ex")).as("n_view"),
      sum(when($"event_type" === "purchase", $"n_ex")).as("n_purchase"),
      max(when($"event_type" === "view", est($"n_sk", $"mk"))).as("view_est"),
      max(when($"event_type" === "purchase", est($"n_sk", $"mk"))).as("purchase_est"))
    val inter = ev.filter($"event_type" === "view").select($"h")
      .join(ev.filter($"event_type" === "purchase").select($"h"), Seq("h"), "left_semi")
      .sweepPin() // feeds the exact count and the sketch probe
    val ic = inter.agg(count(lit(1)).as("n_intersect"))
    val usk = ev.select($"h").distinct().orderBy($"h").limit(kmvK)
    val ua = usk.agg(count(lit(1)).as("n_usk"), max($"h").as("mu"))
    val mc = inter.join(broadcast(usk), Seq("h"), "left_semi")
      .agg(count(lit(1)).as("n_match"))
    stats.crossJoin(ic).crossJoin(ua).crossJoin(mc)
      .select($"n_view", $"n_purchase", $"n_intersect",
        $"view_est", $"purchase_est",
        est($"n_usk", $"mu").as("union_est"),
        round($"n_intersect".cast(DoubleType) /
          ($"n_view" + $"n_purchase" - $"n_intersect"), 6).as("jaccard"),
        round($"n_match".cast(DoubleType) / $"n_usk", 6).as("jaccard_est"))
  }

  /** Heavy-hitter sketch, self-validating: a deterministic skew transform
    * gives 10 hot keys (~5% of rows each) over a uniform long tail;
    * `approx_top_k` (bounded state, mergeable — the only viable spelling at
    * 100 TB) must report each exact-top-10 key within 1% of its exact
    * count. The oracle recomputes the exact top-10 and literal `true`,
    * pinning the sketch's contract without depending on its bits. */
  val aggApproxTopK: Q = (s, d) => {
    val keyed = t(s, d, "lineitem")
      .select(when($"l_orderkey" % 100 < 50, $"l_orderkey" % 10)
        .otherwise($"l_orderkey").as("k"))
    val exact = keyed.groupBy($"k").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"k").limit(10)
    val sketch = keyed.agg(expr("approx_top_k(k, 10, 65536)").as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.item".as("k"), $"e.count".as("est"))
    exact.join(sketch, Seq("k"), "left")
      .select($"k", $"n",
        (coalesce($"est", lit(0L)).cast(DoubleType) >= $"n" * 0.99 &&
         coalesce($"est", lit(0L)).cast(DoubleType) <= $"n" * 1.01).as("within_tol"))
      .orderBy($"n".desc, $"k")
  }

  /** Daily resample with gap filling: per-user event counts on a dense
    * per-user day spine (missing days surface as zero rows — the shape
    * every feature pipeline needs before windowed training aggregates).
    * The spine generates from each user's own [min, max] day span via
    * `sequence` + explode — pure per-group computation, one shuffle on
    * user_id, never a driver-side calendar. */
  val resampleGapfill: Q = (s, d) => {
    val ev = t(s, d, "events")
      .select($"user_id", date_trunc("day", $"ts").cast(DateType).as("day"))
    val spine = ev.groupBy($"user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
      .select($"user_id", explode(sequence($"d0", $"d1", expr("interval 1 day"))).as("day"))
    val counts = ev.groupBy($"user_id", $"day").agg(count(lit(1)).as("n_raw"))
    spine.join(counts, Seq("user_id", "day"), "left")
      .select($"user_id", $"day", coalesce($"n_raw", lit(0L)).as("n"))
      .orderBy($"user_id", $"day")
  }

  /** OHLC downsampling — the time-series compaction every metrics store
    * runs: per (event_type, hour) bucket, the first/highest/lowest/last
    * `value` plus count and exact sum. Open/close are `min_by`/`max_by`
    * over the total (ts, event_id) order — deterministic under ties and
    * replayed by the oracle's row_number spelling; high/low are plain
    * min/max (exact on doubles, no accumulation); the sum rides the
    * DECIMAL(18,6) float-sum rule. One map-side-combined aggregate over
    * the event stream — min_by/max_by carry (value, key) partials, so the
    * exchange moves types×hours rows, never events. */
  val resampleOhlc: Q = (s, d) => {
    val ev = t(s, d, "events")
      .select($"event_type", date_trunc("hour", $"ts").as("hour"),
        $"ts", $"event_id", $"value")
    ev.groupBy($"event_type", $"hour")
      .agg(count(lit(1)).as("n_events"),
        min_by($"value", struct($"ts", $"event_id")).as("open_v"),
        max($"value").as("high_v"),
        min($"value").as("low_v"),
        max_by($"value", struct($"ts", $"event_id")).as("close_v"),
        sumd($"value").as("sum_value"))
      .orderBy($"event_type", $"hour")
  }

  /** EWMA lookback horizon: α = 1/2 over the last [[ewmaLags]]
    * observations. 2⁻¹⁶ < 10⁻⁴·2⁻¹ of the mass — anything further back
    * is invisible at the 6-decimal output quantum anyway. */
  val ewmaLags = 16

  /** Exponentially-weighted moving average of each event type's hourly
    * event count — the smoothed rate curve behind every ops dashboard
    * and rate-limiter baseline. α = 1/2 truncated at [[ewmaLags]] lags
    * makes the EWMA a RATIO OF INTEGERS: weight 2^(15−j) on lag j, so
    * ewma = Σⱼ 2^(15−j)·n₍ₜ₋ⱼ₎ / Σⱼ∈present 2^(15−j), exact int64
    * moments (a count would have to exceed 2⁴⁸ to overflow beside the
    * 2¹⁵ weight) and ONE float division under identical formula text —
    * the same no-float-accumulation discipline as [[resampleOhlc]]'s
    * sums. Series gaps: lags step over the OBSERVATION sequence, not
    * wall-clock hours (compose with [[resampleGapfill]] for a zero-
    * filled clock grid); leading partial windows renormalize by the
    * present-weight sum, so row 1's ewma is exactly its own count.
    *
    * 100 TB shape: one map-side-combined aggregate collapses events to
    * the types×hours frame; the 16 lags are ONE window pass partitioned
    * by event_type over that already-tiny frame (never over raw
    * events), each partition sorted once. */
  val resampleEwma: Q = (s, d) => {
    val hourly = t(s, d, "events")
      .groupBy($"event_type", date_trunc("hour", $"ts").as("hour"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"event_type").orderBy($"hour")
    val terms = (0 until ewmaLags).map { j =>
      val weight = 1L << (ewmaLags - 1 - j)
      val lj = if (j == 0) $"n" else lag($"n", j).over(w)
      (coalesce(lj * weight, lit(0L)),
        when(lj.isNotNull, weight).otherwise(0L))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    hourly
      .select($"event_type", $"hour", $"n",
        round(num.cast(DoubleType) / den.cast(DoubleType), 6).as("ewma"))
      .orderBy($"event_type", $"hour")
  }

  /** Batch sessionization: a session break is a >30-minute gap; the
    * session id is the running count of breaks (lag + cumulative sum, the
    * textbook spelling — same semantics as the streaming
    * [[graft.streaming.Sessionize]] state machine, which its oracle
    * already replays in SQL). Per-key window sorts only; one shuffle on
    * user_id; session bounds aggregate exactly. */
  val sessionizeBatch: Q = (s, d) => {
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val run = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "events")
      .select($"user_id", $"event_id", $"ts",
        (unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(byUser) >
          30L * 60 * 1000000).as("brk"))
      .select($"user_id", $"event_id", $"ts",
        sum(when($"brk", 1L).otherwise(0L)).over(run).as("session_id"))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        min($"ts").as("session_start"), max($"ts").as("session_end"))
      .orderBy($"user_id", $"session_id")
  }

  /** Sessionization via Spark's native `session_window` — the built-in
    * merging-window operator (codegen'd, partial-mergeable, and the same
    * operator Structured Streaming uses for stateful sessions). Semantics
    * identical to [[sessionizeBatch]]'s lag+cumsum: a session closes after
    * a 30-minute silence; Spark defines the window end as last-event + gap,
    * so the oracle derives it as MAX(ts) + 30 min. Preference order at
    * scale: this native operator (one aggregate, no window sort) over the
    * two-pass lag+cumsum spelling. */
  val sessionizeNative: Q = (s, d) =>
    t(s, d, "events")
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), min($"ts").as("session_start"))
      .select($"user_id", $"session_start", $"sw.end".as("session_end"),
        $"n_events")
      .orderBy($"user_id", $"session_start")

  /** TPC-H Q3 shape: shipping-priority revenue — the canonical 3-way
    * fact⋈fact⋈dim pipeline (customer filter → orders → lineitem). The
    * filtered customer segment broadcasts; orders⋈lineitem is the one real
    * shuffle, on the natural key both sides already share. Revenue sums in
    * exact decimal; top-10 by revenue with a deterministic tiebreak. */
  val tpchQ3: Q = (s, d) => {
    val cust = t(s, d, "customer").filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val ord = t(s, d, "orders")
      .filter($"o_orderdate" < lit("1995-03-15").cast(TimestampType))
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_orderpriority")
    val li = t(s, d, "lineitem")
      .filter($"l_shipdate" > lit("1995-03-15").cast(TimestampType))
      .select($"l_orderkey",
        (dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))).as("rev"))
    ord.join(DimGates.gated(s, d, "customer")(cust),
        $"o_custkey" === $"c_custkey")
      .join(li, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(sum($"rev").as("revenue_dec"))
      .select($"o_orderkey", $"o_orderdate".cast(DateType).as("o_orderdate"),
        $"o_orderpriority", round($"revenue_dec".cast(DoubleType), 6).as("revenue"))
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
  }

  /** TPC-H Q5 shape: local-supplier revenue by nation — the 6-way join
    * (region→nation→{customer,supplier}→orders→lineitem) that makes join
    * ORDER matter. All four dimension legs broadcast (region/nation/
    * customer-slice/supplier are each orders of magnitude under the fact
    * tables); the only shuffles are orders⋈lineitem and the final
    * per-nation aggregate. The c_nationkey = s_nationkey "local supplier"
    * predicate rides the join, not a post-filter. */
  val tpchQ5: Q = (s, d) => {
    val nat = t(s, d, "nation")
      .join(broadcast(t(s, d, "region").filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val cust = t(s, d, "customer").join(broadcast(nat),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_nationkey")
    val supp = t(s, d, "supplier").join(broadcast(nat),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_nationkey", $"n_name")
    val ord = t(s, d, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast(TimestampType) &&
              $"o_orderdate" <  lit("1997-01-01").cast(TimestampType))
      .select($"o_orderkey", $"o_custkey")
    val li = t(s, d, "lineitem").select($"l_orderkey", $"l_suppkey",
      (dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))).as("rev"))
    ord.join(DimGates.gated(s, d, "customer")(cust),
        $"o_custkey" === $"c_custkey")
      .join(li, $"o_orderkey" === $"l_orderkey")
      .join(DimGates.gated(s, d, "supplier")(supp),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .groupBy($"n_name")
      .agg(sum($"rev").as("revenue_dec"))
      .select($"n_name", round($"revenue_dec".cast(DoubleType), 6).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** TPC-H Q18 shape: large-volume orders (the group-by-HAVING semi-filter
    * pattern). The lineitem aggregate runs FIRST — one shuffle on the
    * natural key with map-side partials — and the HAVING cut reduces it to
    * a tiny set of qualifying orders (~0.3% here), which then drives both
    * remaining joins as the broadcast side. Neither orders nor customer is
    * ever shuffled: the plan is one fact-table aggregate plus two
    * broadcast probes, and the already-computed `sum_qty` is reused instead
    * of re-scanning lineitem (the textbook Q18 re-join). Quantity sums in
    * exact decimal; the output cast is BIGINT because quantities are
    * integral. */
  val tpchQ18: Q = (s, d) => {
    val big = t(s, d, "lineitem")
      .groupBy($"l_orderkey")
      .agg(sum(dec($"l_quantity")).as("qty_dec"))
      .filter($"qty_dec" > 300)
      .select($"l_orderkey", $"qty_dec".cast(LongType).as("sum_qty"))
    val ord = t(s, d, "orders")
      .join(DimGates.gated(s, d, "orders")(big), $"o_orderkey" === $"l_orderkey")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_totalprice", $"sum_qty")
    t(s, d, "customer")
      .join(DimGates.gated(s, d, "orders")(ord), $"c_custkey" === $"o_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey",
        $"o_orderdate".cast(DateType).as("o_orderdate"), $"o_totalprice", $"sum_qty")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  /** TPC-H Q1 shape: the pricing summary — the canonical full-scan
    * two-phase aggregate (6 distinct-key groups absorb ~50k rows map-side;
    * at 100 TB the exchange carries 6 partial-state rows per task). All
    * money sums run in exact DECIMAL(18,6); the charge factor
    * `(1-disc)·(1+tax)` is computed ONCE in IEEE double (two correctly
    * rounded ops, identical op tree in the oracle) and then cast to
    * decimal, because chaining three decimal multiplies overflows
    * precision 38 and engines disagree on the overflow rounding. Averages
    * derive from the exact sums with one final double division. */
  val tpchQ1: Q = (s, d) =>
    t(s, d, "lineitem")
      .filter($"l_shipdate" <= lit("2000-09-02").cast(TimestampType))
      .select($"l_returnflag", $"l_linestatus",
        dec($"l_quantity").as("qty"),
        dec($"l_extendedprice").as("price"),
        (dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))).as("disc_price"),
        (dec($"l_extendedprice") *
          ((lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).cast(DecimalType(18, 6)))
          .as("charge"),
        dec($"l_discount").as("disc"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(sum($"qty").as("qty_dec"), sum($"price").as("base_dec"),
        sum($"disc_price").as("disc_dec"), sum($"charge").as("charge_dec"),
        sum($"disc").as("donly_dec"), count(lit(1)).as("count_order"))
      .select($"l_returnflag", $"l_linestatus",
        $"qty_dec".cast(LongType).as("sum_qty"),
        round($"base_dec".cast(DoubleType), 6).as("sum_base_price"),
        round($"disc_dec".cast(DoubleType), 6).as("sum_disc_price"),
        round($"charge_dec".cast(DoubleType), 6).as("sum_charge"),
        round($"qty_dec".cast(DoubleType) / $"count_order", 6).as("avg_qty"),
        round($"base_dec".cast(DoubleType) / $"count_order", 6).as("avg_price"),
        round($"donly_dec".cast(DoubleType) / $"count_order", 6).as("avg_disc"),
        $"count_order")
      .orderBy($"l_returnflag", $"l_linestatus")

  /** TPC-H Q6 shape: the forecast-revenue scan — pure filter + one global
    * sum, the query whose entire cost is how much of the scan the
    * predicates skip. All three predicates reach the parquet reader
    * (min/max row-group pruning on shipdate does the real work at scale);
    * the aggregate is a single decimal sum folding to one row per task. */
  val tpchQ6: Q = (s, d) =>
    t(s, d, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast(TimestampType) &&
              $"l_shipdate" <  lit("1997-01-01").cast(TimestampType) &&
              $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
      .agg(coalesce(sum(dec($"l_extendedprice") * dec($"l_discount")),
        lit(0).cast(DecimalType(18, 6))).as("rev_dec"))
      .select(round($"rev_dec".cast(DoubleType), 6).as("revenue"))

  /** TPC-H Q10 shape: returned-item reporting — top-20 customers by
    * lost revenue in one quarter. The quarter's order slice broadcasts to
    * lineitem (never the reverse), revenue aggregates by custkey BEFORE
    * touching the wide customer table — the fact stream meets `customer`
    * only as a per-customer one-row aggregate — and nation broadcasts.
    * Ordering carries a custkey tiebreak so the limit is deterministic. */
  val tpchQ10: Q = (s, d) => {
    val ord = t(s, d, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast(TimestampType) &&
              $"o_orderdate" <  lit("1996-04-01").cast(TimestampType))
      .select($"o_orderkey", $"o_custkey")
    val rev = t(s, d, "lineitem")
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey",
        (dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))).as("rev"))
      .join(DimGates.gated(s, d, "orders")(ord), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey").agg(sum($"rev").as("rev_dec"))
    t(s, d, "customer")
      .join(rev, $"c_custkey" === $"o_custkey")
      .join(broadcast(t(s, d, "nation").select($"n_nationkey", $"n_name")),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_name",
        round($"rev_dec".cast(DoubleType), 6).as("revenue"),
        $"c_acctbal", $"n_name")
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  /** TPC-H Q4 shape: order-priority checking — orders in one quarter with at
    * least one late-shipping lineitem, counted by priority. (The fixture
    * lacks commit/receipt dates, so "late" is l_shipdate more than 60 days
    * after o_orderdate — the same EXISTS-correlated shape as the official
    * spelling.) The quarter's order slice broadcasts into a LEFT SEMI join
    * whose condition spans both sides (shipdate vs orderdate): each fact row
    * probes the broadcast hash table on orderkey and checks the date bound
    * in place, so the fact table never shuffles and the semi-join emits each
    * qualifying order at most once — no post-join distinct needed. */
  val tpchQ4: Q = (s, d) => {
    val ord = t(s, d, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast(TimestampType) &&
              $"o_orderdate" <  lit("1996-04-01").cast(TimestampType))
      .select($"o_orderkey", $"o_orderpriority", $"o_orderdate")
    val late = ord.join(
      t(s, d, "lineitem").select($"l_orderkey", $"l_shipdate"),
      $"o_orderkey" === $"l_orderkey" &&
        $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"),
      "left_semi")
    late.groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  /** TPC-H Q14 shape: promotion-effect — the share of one month's revenue
    * from promo parts. The part dimension broadcasts (two columns after
    * pruning), the month filter reaches the parquet scan, and both the
    * promo and total sums fold in ONE pass as conditional decimal
    * aggregates; the percentage is a single float division at the end. */
  val tpchQ14: Q = (s, d) =>
    t(s, d, "lineitem")
      .filter($"l_shipdate" >= lit("1996-03-01").cast(TimestampType) &&
              $"l_shipdate" <  lit("1996-04-01").cast(TimestampType))
      .select($"l_partkey",
        (dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))).as("rev"))
      .join(DimGates.gated(s, d, "part")(
          t(s, d, "part").select($"p_partkey", $"p_type")),
        $"l_partkey" === $"p_partkey")
      .agg(
        sum(when($"p_type" === "PROMO", $"rev")
          .otherwise(lit(0).cast(DecimalType(18, 6)))).as("promo_dec"),
        sum($"rev").as("total_dec"))
      .select(round(lit(100.0) * $"promo_dec".cast(DoubleType) /
        $"total_dec".cast(DoubleType), 6).as("promo_revenue_pct"))

  // $"..." interpolator without a per-query implicits import
  private implicit class Str(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }

  /** All §2B queries, keyed as in SURVEY.md §2B. */
  val queries: Map[String, Q] = Map(
    "scan_full" -> scanFull,
    "project" -> project,
    "filter_eq" -> filterEq,
    "filter_range" -> filterRange,
    "agg_group_sum" -> aggGroupSum,
    "agg_multi" -> aggMulti,
    "agg_count_distinct" -> aggCountDistinct,
    "agg_bitmap_distinct" -> aggBitmapDistinct,
    "agg_approx_distinct" -> aggApproxDistinct,
    "agg_mode" -> aggMode,
    "agg_rollup" -> aggRollup,
    "agg_cube" -> aggCube,
    "agg_grouping_sets" -> aggGroupingSets,
    "agg_percentile" -> aggPercentile,
    "agg_stats" -> aggStats,
    "agg_collect_sorted" -> aggCollectSorted,
    "scan_partition_prune" -> scanPartitionPrune,
    "join_inner" -> joinInner,
    "join_left" -> joinLeft,
    "join_semi" -> joinSemi,
    "join_anti" -> joinAnti,
    "join_broadcast" -> joinBroadcast,
    "join_bucketed" -> joinBucketed,
    "join_salted" -> joinSalted,
    "join_range" -> joinRange,
    "join_bloom_pruned" -> joinBloomPruned,
    "join_interval_overlap" -> joinIntervalOverlap,
    "table_checksum" -> tableChecksum,
    "catalog_checksum" -> catalogChecksum,
    "sort_limit" -> sortLimit,
    "window_rank" -> windowRank,
    "window_running" -> windowRunning,
    "window_range_frame" -> windowRangeFrame,
    "window_lag" -> windowLag,
    "window_ntile" -> windowNtile,
    "window_topk_agg" -> windowTopKAgg,
    "window_percent_rank" -> windowPercentRank,
    "scalar_levenshtein" -> scalarLevenshtein,
    "set_union" -> setUnion,
    "set_intersect" -> setIntersect,
    "set_except" -> setExcept,
    "distinct_rows" -> distinctRows,
    "scalar_string" -> scalarString,
    "scalar_date" -> scalarDate,
    "scalar_math" -> scalarMath,
    "scalar_case" -> scalarCase,
    "json_extract" -> jsonExtract,
    "array_ops" -> arrayOps,
    "limit_page" -> limitPage,
    "pivot_table" -> pivotTable,
    "unpivot_table" -> unpivotTable,
    "join_full" -> joinFull,
    "explode_lateral" -> explodeLateral,
    "scalar_regex" -> scalarRegex,
    "scalar_null" -> scalarNull,
    "subquery_in" -> subqueryIn,
    "subquery_scalar" -> subqueryScalar,
    "subquery_correlated" -> subqueryCorrelated,
    "join_cross" -> joinCross,
    "agg_filtered" -> aggFiltered,
    "scalar_hash" -> scalarHash,
    "scalar_bitwise" -> scalarBitwise,
    "merge_upsert" -> mergeUpsert,
    "window_first_last" -> windowFirstLast,
    "sort_global_index" -> sortGlobalIndex,
    "agg_approx_percentile" -> aggApproxPercentile,
    "agg_salted" -> aggSalted,
    "agg_weighted_avg" -> aggWeightedAvg,
    "agg_incremental_merge" -> aggIncrementalMerge,
    "agg_kmv_intersect" -> aggKmvIntersect,
    "agg_cm_sketch" -> aggCmSketch,
    "window_time_range" -> windowTimeRange,
    "agg_approx_topk" -> aggApproxTopK,
    "resample_gapfill" -> resampleGapfill,
    "resample_ohlc" -> resampleOhlc,
    "resample_ewma" -> resampleEwma,
    "sessionize_batch" -> sessionizeBatch,
    "sessionize_native" -> sessionizeNative,
    "tpch_q1" -> tpchQ1,
    "tpch_q3" -> tpchQ3,
    "tpch_q5" -> tpchQ5,
    "tpch_q6" -> tpchQ6,
    "tpch_q10" -> tpchQ10,
    "tpch_q18" -> tpchQ18,
    "tpch_q4" -> tpchQ4,
    "tpch_q14" -> tpchQ14,
  )

  /** DuckDB oracle SQL per query (same column names, same total order, same
    * exact-decimal arithmetic). */
  val oracle: Map[String, String] = Map(
    "scan_full" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "project" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS net
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "filter_eq" ->
      "SELECT * FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey",
    "filter_range" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, CAST(l_shipdate AS DATE) AS ship_day
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
         ORDER BY l_orderkey, l_linenumber""",
    "agg_group_sum" ->
      """SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_multi" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price,
         MIN(l_discount) AS min_disc,
         MAX(l_extendedprice) AS max_price,
         COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "agg_bitmap_distinct" ->
      """WITH bm AS (
           SELECT event_type, user_id // 32 AS word,
                  bit_or(1::BIGINT << CAST(user_id % 32 AS INT)) AS bits
           FROM events GROUP BY event_type, user_id // 32),
         bc AS (SELECT event_type,
                  CAST(SUM(bit_count(bits)) AS BIGINT) AS n_users_bitmap
                FROM bm GROUP BY event_type),
         ex AS (SELECT event_type,
                  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact
                FROM events GROUP BY event_type)
         SELECT bc.event_type, n_users_bitmap, n_users_exact,
           (n_users_bitmap = n_users_exact) AS bitmap_matches
         FROM bc JOIN ex ON ex.event_type = bc.event_type
         ORDER BY bc.event_type""",
    "agg_count_distinct" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "agg_approx_distinct" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS exact_cust,
         true AS within_tol
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "agg_mode" ->
      """SELECT user_id, event_type AS top_type, n FROM (
           SELECT user_id, event_type, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY COUNT(*) DESC, event_type) AS rn
           FROM events GROUP BY user_id, event_type)
         WHERE rn = 1 ORDER BY user_id""",
    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty, COUNT(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty, COUNT(*) AS n
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty, COUNT(*) AS n
         FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "agg_stats" ->
      """WITH m AS (
           SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag,
           ROUND(SQRT((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
           ROUND(((n * sxy) - (sx * sy)) /
                 SQRT(((n * sxx) - (sx * sx)) * ((n * syy) - (sy * sy))), 6) AS corr_qty_price
         FROM m ORDER BY l_returnflag""",
    "agg_percentile" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
         round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
         round(quantile_cont(l_extendedprice, 0.75), 6) AS p75
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_collect_sorted" ->
      """SELECT c_nationkey, string_agg(c_name, ',' ORDER BY c_name) AS names,
         COUNT(*) AS n
         FROM customer WHERE c_nationkey < 3
         GROUP BY c_nationkey ORDER BY c_nationkey""",
    "scan_partition_prune" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
         FROM events WHERE event_type = 'purchase'
         GROUP BY 1 ORDER BY day""",
    "join_inner" ->
      """SELECT o_orderkey, c_name, o_totalprice FROM orders
         JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey""",
    "join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
         CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 0) AS DOUBLE) AS total_spent
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         ORDER BY c_custkey""",
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
         ORDER BY c_custkey""",
    "join_broadcast" ->
      """SELECT p_brand, CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS promo_qty, COUNT(*) AS n
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_type = 'PROMO' GROUP BY p_brand ORDER BY p_brand""",
    "join_bucketed" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "join_salted" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "join_range" ->
      """SELECT o_orderkey, COUNT(*) AS n_events
         FROM events e JOIN orders o
           ON e.user_id = o.o_custkey AND date_trunc('microseconds', e.ts) >= o.o_orderdate
         GROUP BY o_orderkey ORDER BY o_orderkey""",
    "join_bloom_pruned" -> {
      import graft.functions.PolyHash.affineSql
      val m = joinBloomBits
      def pos(i: Int, h: String) = s"((${affineSql(i.toString, h)}) % $m)"
      val factPos = (0 until joinBloomHashes)
        .map(i => s"${pos(i, "l_partkey")} AS p$i").mkString(", ")
      val hits = (0 until joinBloomHashes)
        .map(i => s"((a.arr[(p$i // 32) + 1] & (1::BIGINT << (p$i % 32))) != 0)")
        .mkString(" AND ")
      s"""WITH keys AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'),
         poss AS (SELECT unnest([${(0 until joinBloomHashes)
           .map(i => pos(i, "p_partkey")).mkString(", ")}]) AS pos FROM keys),
         wrds AS (SELECT pos // 32 AS word,
                         bit_or(1::BIGINT << (pos % 32)) AS bits
                  FROM poss GROUP BY pos // 32),
         arr AS (SELECT list(COALESCE(w.bits, 0) ORDER BY sp.word) AS arr
                 FROM range(0, ${m / 32}) sp(word)
                 LEFT JOIN wrds w ON w.word = sp.word),
         pp AS (SELECT l_partkey,
                  CAST(l_extendedprice AS DECIMAL(18,6)) AS price, $factPos
                FROM lineitem),
         mb AS (SELECT pp.l_partkey, pp.price, ($hits) AS maybe
                FROM pp, arr a),
         v AS (SELECT mb.*, (k.p_partkey IS NOT NULL) AS is_match
               FROM mb LEFT JOIN keys k ON k.p_partkey = mb.l_partkey)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_fact,
           CAST(COUNT(*) FILTER (WHERE maybe) AS BIGINT) AS n_pass,
           CAST(COUNT(*) FILTER (WHERE is_match) AS BIGINT) AS n_match,
           CAST(COUNT(*) FILTER (WHERE maybe AND NOT is_match) AS BIGINT)
             AS n_false_pos,
           round(CAST(COUNT(*) FILTER (WHERE maybe AND NOT is_match) AS DOUBLE)
             / GREATEST(COUNT(*) - COUNT(*) FILTER (WHERE is_match), 1),
             6) AS fp_rate,
           CAST(SUM(price) FILTER (WHERE maybe AND is_match) AS DOUBLE)
             AS revenue_pruned,
           CAST(SUM(price) FILTER (WHERE is_match) AS DOUBLE) AS revenue_exact
         FROM v"""
    },
    // the quadratic join spelling the sweep replaces (oracle-scale only)
    "join_interval_overlap" ->
      """WITH iv AS (SELECT o_custkey AS c, o_orderkey AS k, o_orderdate AS st,
                            o_orderdate + INTERVAL 7 DAY AS en
                     FROM orders)
         SELECT x.c AS o_custkey, CAST(COUNT(*) AS BIGINT) AS n_overlaps
         FROM iv x JOIN iv y
           ON x.c = y.c AND x.k < y.k AND x.st < y.en AND y.st < x.en
         GROUP BY x.c ORDER BY x.c""",
    "catalog_checksum" -> {
      def fpSql(name: String, tbl: String, image: String): String =
        s"""SELECT '$name' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT img) AS BIGINT) AS n_distinct,
             CAST(SUM(${graft.functions.PolyHash.duckSql("img")}) AS BIGINT)
               AS content_sum,
             MIN(md5(img)) AS md5_min, MAX(md5(img)) AS md5_max
           FROM (SELECT $image AS img FROM $tbl)"""
      def money(c: String): String = s"CAST(floor($c * 100.0) AS BIGINT)"
      Seq(
        fpSql("region", "region", "concat_ws('|', r_regionkey, r_name)"),
        fpSql("nation", "nation",
          "concat_ws('|', n_nationkey, n_name, n_regionkey)"),
        fpSql("supplier", "supplier",
          s"concat_ws('|', s_suppkey, s_name, s_nationkey, ${money("s_acctbal")})"),
        fpSql("part", "part",
          s"""concat_ws('|', p_partkey, p_name, p_brand, p_type, p_size,
             ${money("p_retailprice")})"""),
        fpSql("customer", "customer",
          "concat_ws('|', c_custkey, c_name, c_mktsegment, c_nationkey)"),
        fpSql("orders", "orders",
          s"""concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
             ${money("o_totalprice")},
             CAST(o_orderdate AS VARCHAR), o_orderpriority)"""),
        fpSql("lineitem", "lineitem",
          s"""concat_ws('|', l_orderkey, l_partkey, l_suppkey, l_linenumber,
             ${money("l_quantity")}, ${money("l_extendedprice")},
             ${money("l_discount")}, ${money("l_tax")},
             l_returnflag, l_linestatus,
             CAST(l_shipdate AS VARCHAR))"""),
        fpSql("events", "events",
          s"""concat_ws('|', event_id,
             CAST(floor(epoch_us(date_trunc('microseconds', ts))) AS BIGINT),
             user_id, event_type, ${money("value")}, props)"""),
        fpSql("documents", "documents",
          "concat_ws('|', doc_id, md5(text), lang, source, n_chars)"),
        fpSql("embeddings", "embeddings",
          """concat_ws('|', vec_id, label, len(embedding),
             CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000.0) AS BIGINT))""")
      ).mkString("\n UNION ALL \n") + "\n ORDER BY tbl"
    },
    "table_checksum" -> {
      def fpSql(name: String, tbl: String, image: String): String =
        s"""SELECT '$name' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT img) AS BIGINT) AS n_distinct,
             CAST(SUM(${graft.functions.PolyHash.duckSql("img")}) AS BIGINT)
               AS content_sum,
             MIN(md5(img)) AS md5_min, MAX(md5(img)) AS md5_max
           FROM (SELECT $image AS img FROM $tbl)"""
      fpSql("orders", "orders",
        """concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
             CAST(o_orderdate AS VARCHAR), o_orderpriority)""") +
        " UNION ALL " +
        fpSql("customer", "customer",
          "concat_ws('|', c_custkey, c_name, c_mktsegment, c_nationkey)") +
        " UNION ALL " +
        fpSql("nation", "nation",
          "concat_ws('|', n_nationkey, n_name, n_regionkey)") +
        " ORDER BY tbl"
    },
    "sort_limit" ->
      """SELECT * FROM (SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)
         ORDER BY o_totalprice DESC, o_orderkey""",
    "window_rank" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
           SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey) AS rn
           FROM orders)
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "window_range_frame" ->
      """SELECT user_id, event_id,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
           PARTITION BY user_id ORDER BY date_trunc('microseconds', ts)
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_1h
         FROM events ORDER BY user_id, event_id""",
    "window_running" ->
      """SELECT user_id, event_id,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
         FROM events ORDER BY user_id, event_id""",
    "window_lag" ->
      """SELECT user_id, event_id,
         value - LAG(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS delta
         FROM events ORDER BY user_id, event_id""",
    "window_percent_rank" ->
      """SELECT o_orderpriority, o_orderkey,
         PERCENT_RANK() OVER (PARTITION BY o_orderpriority
           ORDER BY o_totalprice, o_orderkey) AS pct_rank,
         CUME_DIST() OVER (PARTITION BY o_orderpriority
           ORDER BY o_totalprice, o_orderkey) AS cume
         FROM orders ORDER BY o_orderpriority, o_orderkey""",
    "scalar_levenshtein" ->
      """SELECT p_partkey,
         CAST(levenshtein(p_brand, 'Brand#10') AS BIGINT) AS brand_dist,
         CAST(levenshtein(p_type, p_brand) AS BIGINT) AS type_brand_dist
         FROM part ORDER BY p_partkey""",
    "window_topk_agg" ->
      """SELECT o_custkey, rn, o_orderkey FROM (
           SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey) AS rn
           FROM orders)
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "window_ntile" ->
      """SELECT o_custkey, o_orderkey,
         NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS quartile,
         FIRST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS min_price,
         LAST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS max_price
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "set_union" ->
      """SELECT nk, COUNT(*) AS n FROM (
           SELECT c_nationkey AS nk FROM customer
           UNION ALL SELECT s_nationkey FROM supplier)
         GROUP BY nk ORDER BY nk""",
    "set_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
         INTERSECT SELECT s_nationkey AS nk FROM supplier ORDER BY nk""",
    "set_except" ->
      """SELECT c_nationkey AS nk FROM customer
         EXCEPT SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 5000
         ORDER BY nk""",
    "distinct_rows" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    "scalar_string" ->
      """SELECT c_custkey, UPPER(c_name) AS uname, SUBSTRING(c_name, 1, 8) AS pre,
         CONCAT_WS('-', c_mktsegment, c_name) AS tagged,
         (c_name LIKE '%5%') AS has5
         FROM customer ORDER BY c_custkey""",
    "scalar_date" ->
      """SELECT o_orderkey,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002
         FROM orders ORDER BY o_orderkey""",
    "scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_tax AS DECIMAL(18,6)), 2) AS DOUBLE) AS tax_amt,
         ABS(l_discount - 0.05) AS disc_dev,
         l_quantity * 2.0 + 1.0 AS q21
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "scalar_case" ->
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
                     WHEN o_totalprice < 300000 THEN 'mid'
                     ELSE 'big' END AS bucket, COUNT(*) AS n
         FROM orders GROUP BY 1 ORDER BY bucket""",
    "json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
         FROM events ORDER BY event_id""",
    "array_ops" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
         CAST(embedding[1] AS DOUBLE) AS first_val, label
         FROM embeddings ORDER BY vec_id""",
    "limit_page" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_orderkey LIMIT 50 OFFSET 100""",
    "pivot_table" ->
      """SELECT o_orderpriority,
         COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
         COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
         COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "unpivot_table" ->
      """SELECT l_orderkey, l_linenumber, measure, ROUND(CAST(value AS DOUBLE), 6) AS value
         FROM (
           SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value
           FROM lineitem WHERE l_orderkey < 100
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
           FROM lineitem WHERE l_orderkey < 100
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'discount', l_discount
           FROM lineitem WHERE l_orderkey < 100)
         ORDER BY l_orderkey, l_linenumber, measure""",
    "join_full" ->
      """WITH per_user AS (
           SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id)
         SELECT COALESCE(c_custkey, user_id) AS key, c_name,
                COALESCE(n_events, 0) AS n_events
         FROM customer FULL OUTER JOIN per_user ON c_custkey = user_id
         ORDER BY key""",
    "explode_lateral" ->
      """SELECT vec_id, CAST(i AS BIGINT) AS i, ROUND(CAST(val AS DOUBLE), 6) AS v
         FROM (SELECT vec_id, unnest(embedding) AS val,
                      generate_subscripts(embedding, 1) AS i
               FROM embeddings WHERE vec_id < 3)
         ORDER BY vec_id, i""",
    "scalar_regex" ->
      """SELECT p_partkey,
         CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS BIGINT) AS brand_num,
         regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
         regexp_matches(p_type, '^(PROMO|ECONOMY)') AS is_cheap_class
         FROM part ORDER BY p_partkey""",
    "scalar_null" ->
      """SELECT c_custkey,
         COALESCE(max_big, -1.0) AS max_or_default,
         (max_big IS NULL) AS has_none,
         NULLIF(COALESCE(max_big, 0.0), 0.0) AS nullified
         FROM (SELECT c_custkey, MAX(o_totalprice) AS max_big
               FROM customer LEFT JOIN orders
                 ON c_custkey = o_custkey AND o_totalprice > 450000
               GROUP BY c_custkey)
         ORDER BY c_custkey""",
    "subquery_in" ->
      """SELECT o_orderkey, o_custkey FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer
                             WHERE c_mktsegment = 'BUILDING')
         ORDER BY o_orderkey""",
    "subquery_scalar" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE CAST(o_totalprice AS DECIMAL(18,6)) * (SELECT COUNT(*) FROM orders)
               > (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,6))) FROM orders)
         ORDER BY o_orderkey""",
    "subquery_correlated" ->
      """SELECT o_orderkey, o_custkey FROM orders o
         WHERE CAST(o_totalprice AS DECIMAL(18,6)) *
               (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
               > (SELECT SUM(CAST(o2.o_totalprice AS DECIMAL(18,6))) FROM orders o2
                  WHERE o2.o_custkey = o.o_custkey)
         ORDER BY o_orderkey""",
    "join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
         ORDER BY r_name, n_name""",
    "agg_filtered" ->
      """SELECT o_orderpriority,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
               CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                 FILTER (WHERE o_totalprice > 200000), 0) AS DOUBLE) AS big_total
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "scalar_hash" ->
      """SELECT c_custkey, md5(c_name) AS name_md5, sha256(c_name) AS name_sha256
         FROM customer ORDER BY c_custkey""",
    "scalar_bitwise" ->
      """SELECT o_orderkey,
               o_orderkey & 255 AS low_byte,
               o_orderkey | 16 AS or16,
               xor(o_orderkey, 85) AS x85,
               CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
         FROM orders ORDER BY o_orderkey""",
    // merge replay: the batch keys are exactly event_id % 7 == 0, so
    // "base rows that survive the anti-join" == the complement predicate
    "merge_upsert" ->
      """WITH ev AS (
           SELECT event_id, date_trunc('microseconds', ts) AS ts, user_id,
                  event_type, value
           FROM events)
         SELECT event_id, ts, user_id, event_type, value
         FROM ev WHERE event_id % 7 <> 0
         UNION ALL
         SELECT event_id, ts, user_id, 'corrected' AS event_type,
                value + 1000 AS value
         FROM ev WHERE event_id % 7 = 0
         ORDER BY event_id""",
    "agg_cm_sketch" -> {
      import graft.functions.PolyHash.{Mult, P}
      def bsql(i: Int, key: String) =
        s"(((${(2L * i + 1) * Mult % P} * ($key % $P) + " +
          s"${i * 1000003L + 12345L}) % $P) % $cmWidth)"
      val rowsSql = (0 until cmDepth).map(i =>
        s"SELECT CAST($i AS BIGINT) AS row_i, ${bsql(i, "user_id")} AS bucket FROM events")
        .mkString("\n           UNION ALL ")
      val probesSql = (0 until cmDepth).map(i =>
        s"SELECT user_id, true_n, CAST($i AS BIGINT) AS row_i, ${bsql(i, "user_id")} AS bucket FROM tc")
        .mkString("\n           UNION ALL ")
      s"""WITH sk AS (
           SELECT row_i, bucket, CAST(COUNT(*) AS BIGINT) AS counter
           FROM ($rowsSql) GROUP BY 1, 2),
         tc AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_n
                FROM events GROUP BY 1),
         probes AS ($probesSql),
         est AS (
           SELECT p.user_id, MAX(p.true_n) AS true_n,
             CAST(MIN(s.counter) AS BIGINT) AS est_n
           FROM probes p
           JOIN sk s ON s.row_i = p.row_i AND s.bucket = p.bucket
           GROUP BY p.user_id),
         worst AS (SELECT CAST(MAX(est_n - true_n) AS BIGINT)
                     AS max_overest_all FROM est),
         top AS (SELECT user_id, true_n, est_n,
                   ROW_NUMBER() OVER (ORDER BY true_n DESC, user_id) AS rn
                 FROM est)
         SELECT CAST(rn AS BIGINT) AS rn, user_id,
           CAST(true_n AS BIGINT) AS true_n, est_n,
           CAST(est_n - true_n AS BIGINT) AS overest, max_overest_all
         FROM top, worst WHERE rn <= 10 ORDER BY rn"""
    },
    "window_time_range" ->
      """SELECT event_id, event_type,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
           round(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE), 6)
             AS value_last_hour
         FROM events
         WINDOW w AS (PARTITION BY event_type
           ORDER BY epoch_us(date_trunc('microseconds', ts))
           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "window_first_last" ->
      """SELECT user_id, event_id,
           FIRST_VALUE(value) OVER w AS first_val,
           LAST_VALUE(value) OVER wf AS last_val,
           NTH_VALUE(value, 2) OVER wf AS second_val,
           CUME_DIST() OVER w AS cd
         FROM events
         WINDOW
           w AS (PARTITION BY user_id
                 ORDER BY date_trunc('microseconds', ts), event_id),
           wf AS (PARTITION BY user_id
                  ORDER BY date_trunc('microseconds', ts), event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY user_id, event_id""",
    "sort_global_index" ->
      """SELECT ROW_NUMBER() OVER (ORDER BY l_shipdate, l_orderkey, l_linenumber) - 1 AS pos,
             l_orderkey, l_linenumber
         FROM lineitem ORDER BY pos""",
    "agg_approx_percentile" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
         round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
         round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
         true AS within_tol
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // the salted two-phase rewrite is exact for algebraic aggregates: the
    // oracle is the plain one-phase aggregate
    "agg_salted" ->
      """SELECT l_returnflag,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
         COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_weighted_avg" ->
      """SELECT l_returnflag,
         round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))
                        * CAST(l_quantity AS DECIMAL(10,6)))
                 AS DOUBLE)
               / CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 6)
           AS weighted_avg_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // partial-merge maintenance must equal the one-pass aggregate
    "agg_incremental_merge" ->
      """SELECT l_returnflag,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_approx_topk" ->
      """WITH keyed AS (
           SELECT CASE WHEN l_orderkey % 100 < 50 THEN l_orderkey % 10
                       ELSE l_orderkey END AS k
           FROM lineitem)
         SELECT k, COUNT(*) AS n, true AS within_tol
         FROM keyed GROUP BY k ORDER BY n DESC, k LIMIT 10""",
    "resample_gapfill" ->
      """WITH ev AS (
           SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
         spans AS (
           SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM ev GROUP BY user_id),
         spine AS (
           SELECT user_id,
             CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                         CAST(d1 AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS day
           FROM spans),
         counts AS (
           SELECT user_id, day, COUNT(*) AS n_raw FROM ev GROUP BY user_id, day)
         SELECT s.user_id, s.day, COALESCE(c.n_raw, 0) AS n
         FROM spine s LEFT JOIN counts c
           ON s.user_id = c.user_id AND s.day = c.day
         ORDER BY s.user_id, s.day""",
    "agg_kmv_intersect" -> {
      import graft.functions.PolyHash.{Mult, P}
      val estSql = (nsk: String, mk: String) =>
        s"CASE WHEN $nsk < $kmvK THEN CAST($nsk AS DOUBLE) " +
        s"ELSE round(${kmvK - 1}.0 * $P / $mk, 6) END"
      s"""WITH ev AS (
           SELECT DISTINCT event_type, ((user_id % $P) * $Mult) % $P AS h
           FROM events WHERE event_type IN ('view', 'purchase')),
         sk AS (SELECT event_type, h,
                  row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
                FROM ev),
         per AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_sk,
                   MAX(h) AS mk
                 FROM sk WHERE rn <= $kmvK GROUP BY event_type),
         ex AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_ex
                FROM ev GROUP BY event_type),
         pe AS (SELECT * FROM per JOIN ex USING (event_type)),
         stats AS (SELECT
             CAST(SUM(CASE WHEN event_type = 'view' THEN n_ex END) AS BIGINT)
               AS n_view,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN n_ex END) AS BIGINT)
               AS n_purchase,
             MAX(CASE WHEN event_type = 'view'
                   THEN ${estSql("n_sk", "mk")} END) AS view_est,
             MAX(CASE WHEN event_type = 'purchase'
                   THEN ${estSql("n_sk", "mk")} END) AS purchase_est
           FROM pe),
         inter AS (SELECT h FROM ev WHERE event_type = 'view'
                   INTERSECT
                   SELECT h FROM ev WHERE event_type = 'purchase'),
         ic AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_intersect FROM inter),
         usk AS (SELECT DISTINCT h FROM ev ORDER BY h LIMIT $kmvK),
         ua AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_usk, MAX(h) AS mu
                FROM usk),
         mc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_match FROM inter
                WHERE h IN (SELECT h FROM usk))
         SELECT n_view, n_purchase, n_intersect, view_est, purchase_est,
           ${estSql("n_usk", "mu")} AS union_est,
           round(CAST(n_intersect AS DOUBLE)
             / (n_view + n_purchase - n_intersect), 6) AS jaccard,
           round(CAST(n_match AS DOUBLE) / n_usk, 6) AS jaccard_est
         FROM stats, ic, ua, mc"""
    },
    "resample_ohlc" ->
      """WITH e AS (
           SELECT event_type,
             date_trunc('hour', date_trunc('microseconds', ts)) AS hour,
             date_trunc('microseconds', ts) AS ts, event_id, value
           FROM events),
         r AS (
           SELECT *,
             row_number() OVER (PARTITION BY event_type, hour
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, hour
                                ORDER BY ts DESC, event_id DESC) AS rn_z
           FROM e)
         SELECT event_type, hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open_v,
           MAX(value) AS high_v, MIN(value) AS low_v,
           MAX(CASE WHEN rn_z = 1 THEN value END) AS close_v,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM r GROUP BY event_type, hour ORDER BY event_type, hour""",
    "resample_ewma" -> {
      val lagCols = (1 until ewmaLags).map(j =>
        s"LAG(n, $j) OVER (PARTITION BY event_type ORDER BY hour) AS l$j")
        .mkString(",\n             ")
      val num = (0 until ewmaLags).map { j =>
        val weight = 1L << (ewmaLags - 1 - j)
        if (j == 0) s"n * $weight" else s"COALESCE(l$j * $weight, 0)"
      }.mkString(" + ")
      val den = (0 until ewmaLags).map { j =>
        val weight = 1L << (ewmaLags - 1 - j)
        if (j == 0) s"$weight"
        else s"(CASE WHEN l$j IS NOT NULL THEN $weight ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH hourly AS (
           SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         lagged AS (
           SELECT event_type, hour, n,
             $lagCols
           FROM hourly)
         SELECT event_type, hour, n,
           round(CAST($num AS DOUBLE) / CAST($den AS DOUBLE), 6) AS ewma
         FROM lagged ORDER BY event_type, hour"""
    },
    "sessionize_batch" ->
      """WITH e AS (
           SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts
           FROM events),
         g AS (
           SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS brk
           FROM e),
         se AS (
           SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
           FROM g)
         SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
         FROM se GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",
    // same gap rule as sessionize_batch, except the boundary: Spark's
    // session window is [start, last+gap) — an event landing EXACTLY at
    // the end is outside it — so the break condition is >=, and the window
    // end derives as MAX(ts) + 30 minutes
    "sessionize_native" ->
      """WITH e AS (
           SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts
           FROM events),
         g AS (
           SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  >= 30 * 60 * 1000000 THEN 1 ELSE 0 END AS brk
           FROM e),
         se AS (
           SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
           FROM g)
         SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
         FROM se GROUP BY user_id, sid
         ORDER BY user_id, session_start""",
    "tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS BIGINT) AS sum_qty,
           round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS sum_base_price,
           round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
                          (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 6)
             AS sum_disc_price,
           round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
                          CAST((1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6)))
                 AS DOUBLE), 6) AS sum_charge,
           round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_qty,
           round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_price,
           round(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '2000-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "tpch_q6" ->
      """SELECT round(CAST(COALESCE(
             SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
                 CAST(l_discount AS DECIMAL(18,6))),
             CAST(0 AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate <  TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "tpch_q10" ->
      """SELECT c_custkey, c_name,
           round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
                          (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 6)
             AS revenue,
           c_acctbal, n_name
         FROM customer, orders, lineitem, nation
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate <  TIMESTAMP '1996-04-01'
           AND l_returnflag = 'R' AND c_nationkey = n_nationkey
         GROUP BY c_custkey, c_name, c_acctbal, n_name
         ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "tpch_q3" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
           o_orderpriority,
           round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
                          (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 6)
             AS revenue
         FROM customer, orders, lineitem
         WHERE c_mktsegment = 'BUILDING'
           AND c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND o_orderdate < TIMESTAMP '1995-03-15'
           AND l_shipdate  > TIMESTAMP '1995-03-15'
         GROUP BY o_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "tpch_q5" ->
      """SELECT n_name,
           round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
                          (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 6)
             AS revenue
         FROM customer, orders, lineitem, supplier, nation, region
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate <  TIMESTAMP '1997-01-01'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "tpch_q18" ->
      """WITH big AS (
           SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS BIGINT) AS sum_qty
           FROM lineitem GROUP BY l_orderkey
           HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 300)
         SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice, sum_qty
         FROM big
         JOIN orders   ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "tpch_q4" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate <  TIMESTAMP '1996-04-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "tpch_q14" ->
      """SELECT round(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
               THEN CAST(l_extendedprice AS DECIMAL(18,6)) *
                    (1 - CAST(l_discount AS DECIMAL(18,6)))
               ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
                        (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 6)
             AS promo_revenue_pct
         FROM lineitem, part
         WHERE l_partkey = p_partkey
           AND l_shipdate >= TIMESTAMP '1996-03-01'
           AND l_shipdate <  TIMESTAMP '1996-04-01'""",
  )
}
