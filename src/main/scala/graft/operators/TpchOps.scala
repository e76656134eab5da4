package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** The remaining TPC-H query shapes (Q2/Q7/Q8/Q9/Q11/Q12/Q13/Q15/Q16/Q17/
  * Q19/Q20/Q21/Q22), adapted to the fixture's simplified star schema.
  *
  * The reference executes arbitrary delegated SQL (dungbeetle
  * `internal/core/core.go:496`), so the TPC-H set is the canonical coverage
  * proof for "any analytic SQL a task file could carry". The fixture schema
  * ships without `partsupp`, ship mode/instruct, commit/receipt dates and
  * containers; those are DERIVED deterministically by [[TpchFixture]]
  * (identical arithmetic on both engines), so
  * Q2/Q9/Q11/Q12/Q16/Q17/Q19/Q20/Q21 run their REAL spec predicates
  * (ps_supplycost correlated mins, availqty·cost stock values, shipmode
  * IN-lists, commit-vs-receipt lateness, container triples) — not shape
  * substitutes. Remaining adaptations are vocabulary-level only (fixture
  * nation/brand/type names, date windows matched to the fixture's range)
  * and are noted per query.
  *
  * Determinism/exactness rules are RelOps': money math in DECIMAL(18,6)
  * (associative, partial-agg-order-proof), float emitted once via
  * round(…, 6), every output totally ordered, years cast to BIGINT.
  * Thresholds that the official spec states as ratios (Q11's 0.0001,
  * Q17's 0.2·avg, Q22's avg(acctbal)) are compared by exact decimal
  * cross-multiplication — never by a float division whose rounding could
  * disagree between engines.
  *
  * Scale notes: every query touches `lineitem` (the 100 TB table) at most
  * twice, never shuffled except on its natural join/aggregate key;
  * dimension legs (`part`, `supplier`, `nation`, filtered `customer`
  * slices, per-part aggregate frames) broadcast explicitly. The TPC-H
  * dimensions scale LINEARLY with SF (the official ratios put `customer`
  * at ~15 G rows at the SF ≈ 100k that 100 TB implies), so every
  * SF-scaling dimension leg rides the [[DimGates]] size gate — broadcast
  * under `Limits.maxBroadcastDimRows` (always, at fixture scale), keyed
  * SHUFFLE_HASH build past it; `nation`/`region` (25/5 rows at every SF)
  * and one-row scalar frames stay unconditional. AQE re-plans the
  * orders⋈lineitem exchanges at runtime.
  */
object TpchOps {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)
  private def dec(c: Column): Column = c.cast(DecimalType(18, 6))
  private def rev(p: Column, disc: Column): Column = dec(p) * (lit(1) - dec(disc))

  // $"..." interpolator without a per-query implicits import
  private implicit class Str(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }

  /** Q7 volume shipping: revenue flowing between two nations, by supplier
    * nation × customer nation × ship year. Both nation slices broadcast
    * (supplier and the two-nation customer slice are dimension-sized); the
    * only shuffle is orders⋈lineitem on the shared natural key. The
    * cross-pair predicate ((N1→N2) ∨ (N2→N1)) rides the joined row. */
  val tpchQ7: Q = (s, d) => {
    val nat = t(s, d, "nation")
      .filter($"n_name".isin("NATION_1", "NATION_2"))
      .select($"n_nationkey", $"n_name")
    val supp = t(s, d, "supplier").join(broadcast(nat),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    val cust = t(s, d, "customer").join(broadcast(nat),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name".as("cust_nation"))
    val ord = t(s, d, "orders").select($"o_orderkey", $"o_custkey")
      .join(DimGates.gated(s, d, "customer")(cust), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"cust_nation")
    t(s, d, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast(TimestampType) &&
              $"l_shipdate" <  lit("1998-01-01").cast(TimestampType))
      .select($"l_orderkey", $"l_suppkey",
        year($"l_shipdate").cast(LongType).as("l_year"),
        rev($"l_extendedprice", $"l_discount").as("vol"))
      .join(DimGates.gated(s, d, "supplier")(supp), $"l_suppkey" === $"s_suppkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .filter(($"supp_nation" === "NATION_1" && $"cust_nation" === "NATION_2") ||
              ($"supp_nation" === "NATION_2" && $"cust_nation" === "NATION_1"))
      .groupBy($"supp_nation", $"cust_nation", $"l_year")
      .agg(sum($"vol").as("rev_dec"))
      .select($"supp_nation", $"cust_nation", $"l_year",
        round($"rev_dec".cast(DoubleType), 6).as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  /** Q8 national market share: NATION_2's share of ASIA's STANDARD-part
    * revenue by order year. Both sums fold in ONE aggregate pass as
    * conditional decimal sums; the share is a single float division at the
    * end (float-once). part/supplier/customer-slice broadcast; the fact
    * tables meet on their natural key. */
  val tpchQ8: Q = (s, d) => {
    val asiaNations = t(s, d, "nation")
      .join(broadcast(t(s, d, "region").filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey")
    val cust = t(s, d, "customer").join(broadcast(asiaNations),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey")
    val supp = t(s, d, "supplier")
      .join(broadcast(t(s, d, "nation").select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    val ord = t(s, d, "orders")
      .filter($"o_orderdate" >= lit("1995-01-01").cast(TimestampType) &&
              $"o_orderdate" <  lit("1997-01-01").cast(TimestampType))
      .join(DimGates.gated(s, d, "customer")(cust), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", year($"o_orderdate").cast(LongType).as("o_year"))
    t(s, d, "lineitem")
      .join(DimGates.gated(s, d, "part")(t(s, d, "part")
        .filter($"p_type" === "STANDARD")
        .select($"p_partkey")), $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"l_suppkey",
        rev($"l_extendedprice", $"l_discount").as("vol"))
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(DimGates.gated(s, d, "supplier")(supp), $"l_suppkey" === $"s_suppkey")
      .groupBy($"o_year")
      .agg(
        sum(when($"supp_nation" === "NATION_2", $"vol")
          .otherwise(lit(0).cast(DecimalType(18, 6)))).as("nat_dec"),
        sum($"vol").as("tot_dec"))
      .select($"o_year",
        round($"nat_dec".cast(DoubleType) / $"tot_dec".cast(DoubleType), 6)
          .as("mkt_share"))
      .orderBy($"o_year")
  }

  /** Q9 product-type profit by nation × year — the REAL spec formula:
    * amount = revenue − ps_supplycost · quantity, with cost looked up in
    * the derived [[TpchFixture.partsupp]] on the (partkey, suppkey) pair
    * exactly as the official query joins it. Part filter is the official
    * name-LIKE; the gear-part partsupp slice broadcasts (it is 4× a
    * name-filtered part slice); supplier/nation broadcast. One fact
    * shuffle, on the orders⋈lineitem natural key. */
  val tpchQ9: Q = (s, d) => {
    val parts = t(s, d, "part").filter($"p_name".like("%gear%"))
      .select($"p_partkey")
    val ps = TpchFixture.partsupp(s, d)
      .join(DimGates.gated(s, d, "part")(parts),
        $"ps_partkey" === $"p_partkey", "left_semi")
      .select($"ps_partkey", $"ps_suppkey", $"ps_supplycost")
    val supp = t(s, d, "supplier")
      .join(broadcast(t(s, d, "nation").select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("nation"))
    t(s, d, "lineitem")
      .join(DimGates.gated(s, d, "part", rowFactor = 4)(ps),
        $"l_partkey" === $"ps_partkey" && $"l_suppkey" === $"ps_suppkey")
      .join(DimGates.gated(s, d, "supplier")(supp), $"l_suppkey" === $"s_suppkey")
      .join(t(s, d, "orders")
        .select($"o_orderkey", year($"o_orderdate").cast(LongType).as("o_year")),
        $"l_orderkey" === $"o_orderkey")
      .select($"nation", $"o_year",
        (rev($"l_extendedprice", $"l_discount") -
          $"ps_supplycost" * dec($"l_quantity")).as("amount"))
      .groupBy($"nation", $"o_year")
      .agg(sum($"amount").as("profit_dec"))
      .select($"nation", $"o_year",
        round($"profit_dec".cast(DoubleType), 6).as("sum_profit"))
      .orderBy($"nation", $"o_year".desc)
  }

  /** Q11 important stock values — the REAL spec measure: part value =
    * Σ ps_supplycost · ps_availqty over the scope nation's partsupp rows
    * (the derived [[TpchFixture.partsupp]]), cut at a fixed fraction of
    * the scope total via the official scalar-subquery HAVING shape. The
    * comparison stays in exact decimal (total × 0.001 as a decimal
    * multiply, never a float; the fraction is the spec's 0.0001 scaled to
    * the fixture's supplier count). partsupp joins the nation's supplier
    * slice broadcast. Plan note: Catalyst inlines `scoped` into BOTH the
    * output and the total (no subtree reuse across the broadcast), so the
    * scope aggregate derives twice — acceptable because partsupp is
    * dimension-scale (4×|part|), never the fact table. */
  val tpchQ11: Q = (s, d) => {
    val supp = t(s, d, "supplier")
      .join(broadcast(t(s, d, "nation").filter($"n_name" === "NATION_3")
        .select($"n_nationkey")), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val scoped = TpchFixture.partsupp(s, d)
      .join(DimGates.gated(s, d, "supplier")(supp),
        $"ps_suppkey" === $"s_suppkey", "left_semi")
      .groupBy($"ps_partkey")
      .agg(sum($"ps_supplycost" * $"ps_availqty".cast(DecimalType(18, 6)))
        .as("val_dec"))
    val total = scoped.agg(sum($"val_dec").as("tot_dec"))
    scoped.join(broadcast(total),
        $"val_dec" > $"tot_dec" * lit(0.001).cast(DecimalType(18, 6)))
      .select($"ps_partkey".as("p_partkey"),
        round($"val_dec".cast(DoubleType), 6).as("part_value"))
      .orderBy($"part_value".desc, $"p_partkey")
  }

  /** Q12 shipping modes and order priority — the REAL spec query: group by
    * l_shipmode over the MAIL/SHIP modes, lines received in the target
    * year that were committed after shipping but received after commit
    * (l_commitdate < l_receiptdate AND l_shipdate < l_commitdate) — all
    * three columns from the derived [[TpchFixture.lineitemX]] projection,
    * which fuses into the scan (no extra shuffle). The measure is the
    * official high-vs-low priority CASE counts; one fact⋈fact join on the
    * natural key, then the per-mode aggregate. */
  val tpchQ12: Q = (s, d) =>
    TpchFixture.lineitemX(s, d)
      .filter($"l_shipmode".isin("MAIL", "SHIP") &&
              $"l_commitdate" < $"l_receiptdate" &&
              $"l_shipdate" < $"l_commitdate" &&
              $"l_receiptdate" >= lit("1996-01-01").cast(TimestampType) &&
              $"l_receiptdate" <  lit("1997-01-01").cast(TimestampType))
      .select($"l_orderkey", $"l_shipmode")
      .join(t(s, d, "orders")
        .select($"o_orderkey", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_shipmode")
      .agg(
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy($"l_shipmode")

  /** Q13 customer order-count distribution: LEFT join so zero-order
    * customers survive into the c_count=0 bucket (the official shape; the
    * priority exclusion stands in for the dropped comment filter). Two
    * aggregates: per-customer counts, then the distribution — the second
    * input is one row per customer, so the second exchange is tiny. */
  val tpchQ13: Q = (s, d) =>
    t(s, d, "customer").select($"c_custkey")
      .join(t(s, d, "orders")
        .filter($"o_orderpriority" =!= "4-NOT SPECIFIED")
        .select($"o_custkey", $"o_orderkey"),
        $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)

  /** Q15 top supplier: one quarter's per-supplier revenue vs its maximum.
    * The revenue frame is 100 rows (one per supplier), so the max is a
    * broadcast scalar joined back by EXACT decimal equality — the
    * official view + scalar-subquery shape without a second lineitem
    * scan. */
  val tpchQ15: Q = (s, d) => {
    val revenue = t(s, d, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast(TimestampType) &&
              $"l_shipdate" <  lit("1996-04-01").cast(TimestampType))
      .groupBy($"l_suppkey")
      .agg(sum(rev($"l_extendedprice", $"l_discount")).as("total_dec"))
    val mx = revenue.agg(max($"total_dec").as("mx_dec"))
    revenue.join(broadcast(mx), $"total_dec" === $"mx_dec")
      .join(DimGates.gated(s, d, "supplier")(
          t(s, d, "supplier").select($"s_suppkey", $"s_name")),
        $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name",
        round($"total_dec".cast(DoubleType), 6).as("total_revenue"))
      .orderBy($"s_suppkey")
  }

  /** Q16 parts/supplier relationship — the REAL spec source: distinct
    * partsupp suppliers per surviving (brand, type, size) cell over the
    * derived [[TpchFixture.partsupp]], with the official brand-exclusion +
    * type-NOT-LIKE + size-IN filters. The part slice broadcasts; the
    * distinct-count shuffles once on the (brand,type,size,suppkey)
    * expanded key with map-side partials. */
  val tpchQ16: Q = (s, d) =>
    TpchFixture.partsupp(s, d).select($"ps_partkey", $"ps_suppkey")
      .join(DimGates.gated(s, d, "part")(t(s, d, "part")
        .filter($"p_brand" =!= "Brand#1" && !$"p_type".like("MEDIUM%") &&
          $"p_size".isin(1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49))
        .select($"p_partkey", $"p_brand", $"p_type", $"p_size")),
        $"ps_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"ps_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")

  /** Q17 small-quantity-order revenue: lineitems under 20% of their part's
    * average quantity, for one (brand, container) pair — the container is
    * the official second predicate, from [[TpchFixture.partX]]. The
    * 0.2·avg comparison is exact
    * cross-multiplication (5·n·qty < Σqty in decimal — no division, no
    * float). The per-part aggregate frame (≤ #parts rows) broadcasts back
    * onto the same filtered fact slice; lineitem is scanned twice but
    * never shuffled. */
  val tpchQ17: Q = (s, d) => {
    val parts = TpchFixture.partX(s, d)
      .filter($"p_brand" === "Brand#5" && $"p_container" === "MED BOX")
      .select($"p_partkey")
    val li = t(s, d, "lineitem")
      .join(DimGates.gated(s, d, "part")(parts), $"l_partkey" === $"p_partkey")
    val perPart = li.groupBy($"l_partkey")
      .agg(sum(dec($"l_quantity")).as("qty_dec"), count(lit(1)).as("n"))
      .select($"l_partkey".as("agg_partkey"), $"qty_dec", $"n")
    li.join(DimGates.gated(s, d, "part")(perPart),
        $"l_partkey" === $"agg_partkey")
      .filter(dec($"l_quantity") * lit(5) * $"n" < $"qty_dec")
      .agg(coalesce(sum(dec($"l_extendedprice")),
        lit(0).cast(DecimalType(18, 6))).as("sum_dec"))
      .select(round($"sum_dec".cast(DoubleType) / 7.0, 6).as("avg_yearly"))
  }

  /** Q19 discounted revenue, OR-of-conjunctions — the REAL spec triples:
    * three (brand, container-set, quantity, size) windows over
    * [[TpchFixture.partX]], guarded by the official shared shipping
    * conjunct (air modes + DELIVER IN PERSON) from
    * [[TpchFixture.lineitemX]]. One scan, one broadcast part probe; the
    * whole disjunction is a single codegen'd predicate on the joined
    * row, and the shared conjunct filters map-side before the probe. */
  val tpchQ19: Q = (s, d) =>
    TpchFixture.lineitemX(s, d)
      .filter($"l_shipmode".isin("AIR", "REG AIR") &&
        $"l_shipinstruct" === "DELIVER IN PERSON")
      .select($"l_partkey", $"l_quantity",
        rev($"l_extendedprice", $"l_discount").as("vol"))
      .join(DimGates.gated(s, d, "part")(TpchFixture.partX(s, d)
        .select($"p_partkey", $"p_brand", $"p_size", $"p_container")),
        $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#12" &&
          $"p_container".isin("SM CASE", "SM BOX") &&
          $"p_size".between(1, 5) && $"l_quantity".between(1, 11)) ||
        ($"p_brand" === "Brand#23" &&
          $"p_container".isin("MED BAG", "MED BOX") &&
          $"p_size".between(1, 10) && $"l_quantity".between(10, 20)) ||
        ($"p_brand" === "Brand#4" &&
          $"p_container".isin("LG CASE", "LG BOX") &&
          $"p_size".between(1, 15) && $"l_quantity".between(20, 30)))
      .agg(coalesce(sum($"vol"),
        lit(0).cast(DecimalType(18, 6))).as("rev_dec"))
      .select(round($"rev_dec".cast(DoubleType), 6).as("revenue"))

  /** Q20 excess-supply suppliers — the REAL spec chain: suppliers in one
    * region holding a partsupp row on a bolt part whose ps_availqty
    * exceeds half of what that (supplier, part) pair shipped in 1996.
    * The availability test is the official correlated subquery, re-spelled
    * as the per-(supplier, part) shipped aggregate joined back onto the
    * bolt-sliced [[TpchFixture.partsupp]] on BOTH keys; the half-of
    * comparison is exact decimal cross-multiplication (2·availqty >
    * shipped — no float). The nested-IN chain stays two stacked LEFT SEMI
    * probes, so `supplier` never shuffles and each qualifying supplier
    * emits exactly once. Spec note: pairs with NO 1996 shipments qualify
    * vacuously (the subquery's 0.5·Σ is null ⇒ spec drops them; the
    * inner join replays exactly that). */
  val tpchQ20: Q = (s, d) => {
    val qualParts = t(s, d, "part").filter($"p_name".like("%bolt%"))
      .select($"p_partkey")
    val shipped = t(s, d, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast(TimestampType) &&
              $"l_shipdate" <  lit("1997-01-01").cast(TimestampType))
      .join(DimGates.gated(s, d, "part")(qualParts),
        $"l_partkey" === $"p_partkey")
      .groupBy($"l_suppkey", $"l_partkey")
      .agg(sum(dec($"l_quantity")).as("shipped_dec"))
    val excess = TpchFixture.partsupp(s, d)
      .join(DimGates.gated(s, d, "part")(qualParts),
        $"ps_partkey" === $"p_partkey", "left_semi")
      .join(shipped,
        $"ps_suppkey" === $"l_suppkey" && $"ps_partkey" === $"l_partkey")
      .filter(($"ps_availqty" * 2).cast(DecimalType(18, 6)) > $"shipped_dec")
      .select($"ps_suppkey")
    val regionNations = t(s, d, "nation")
      .join(broadcast(t(s, d, "region").filter($"r_name" === "EUROPE")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey")
    t(s, d, "supplier")
      .join(broadcast(regionNations), $"s_nationkey" === $"n_nationkey", "left_semi")
      .join(DimGates.gated(s, d, "part", rowFactor = 4)(excess),
        $"s_suppkey" === $"ps_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_suppkey")
  }

  /** Q21 suppliers who kept orders waiting — the REAL spec lateness:
    * l_receiptdate > l_commitdate (both from [[TpchFixture.lineitemX]]),
    * on finished multi-supplier orders where this supplier was the ONLY
    * late one. The official EXISTS / NOT-EXISTS pair over l2/l3 is
    * re-spelled as one per-order aggregate (distinct suppliers, distinct
    * LATE suppliers) — the scalable spelling: the double self-join becomes
    * a single two-distinct aggregate on the already-shuffled order key,
    * and the late rows re-join that tiny verdict frame on the same key (no
    * new exchange; the oracle replays the identical aggregate form). */
  val tpchQ21: Q = (s, d) => {
    val l = TpchFixture.lineitemX(s, d)
      .select($"l_orderkey", $"l_suppkey", $"l_commitdate", $"l_receiptdate")
      .join(t(s, d, "orders").filter($"o_orderstatus" === "F")
        .select($"o_orderkey"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_suppkey",
        when($"l_receiptdate" > $"l_commitdate", 1)
          .otherwise(0).as("late"))
    // two-level aggregate instead of countDistinct×2: the dual distinct
    // compiles to an Expand that doubles every line-grain row before the
    // first exchange; grouping to (order, supplier) grain first shrinks
    // map-side (lines → distinct pairs) and needs no Expand. Identical
    // result: n_supp = COUNT of distinct suppliers, n_late = suppliers
    // with ≥1 late line = SUM(max(late)).
    val perOrder = l.groupBy($"l_orderkey", $"l_suppkey")
      .agg(max($"late").as("late_any"))
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n_supp"), sum($"late_any").as("n_late"))
      .filter($"n_supp" >= 2 && $"n_late" === 1)
      .select($"l_orderkey".as("ok"))
    l.filter($"late" === 1)
      // hash-probe the filtered per-order verdicts instead of sorting both
      // legs (guide §3.1: SMJ is the default, SHUFFLE_HASH is right when
      // one side is per-partition-small — the verdict side is a selective
      // filter over orders, and partition counts scale it down further)
      .join(perOrder.hint("shuffle_hash"), $"l_orderkey" === $"ok")
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("numwait"))
      .join(DimGates.gated(s, d, "supplier")(
          t(s, d, "supplier").select($"s_suppkey", $"s_name")),
        $"l_suppkey" === $"s_suppkey")
      .select($"s_name", $"numwait")
      .orderBy($"numwait".desc, $"s_name")
      .limit(20)
  }

  /** Q22 global sales opportunity: rich-but-dormant customers — account
    * balance above the positive-balance average of their nation group, no
    * orders in the trailing window (every fixture customer has SOME order,
    * so dormancy is "none since 1999"; the nation-key group stands in for
    * the phone country code). The average threshold is compared by exact
    * cross-multiplication (bal·n > Σbal in decimal); the dormancy test is
    * a broadcast LEFT ANTI join keyed on the customer. */
  val tpchQ22: Q = (s, d) => {
    val codes = Seq(1, 3, 5, 7, 9, 11)
    val slice = t(s, d, "customer").filter($"c_nationkey".isin(codes: _*))
    val avgFrame = slice.filter($"c_acctbal" > 0)
      .agg(sum(dec($"c_acctbal")).as("bal_dec"), count(lit(1)).as("n_pos"))
    val recent = t(s, d, "orders")
      .filter($"o_orderdate" >= lit("1999-01-01").cast(TimestampType))
      .select($"o_custkey")
    slice.join(broadcast(avgFrame),
        dec($"c_acctbal") * $"n_pos" > $"bal_dec")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("numcust"),
        sum(dec($"c_acctbal")).as("bal_sum_dec"))
      .select($"c_nationkey".cast(LongType).as("cntrycode"), $"numcust",
        round($"bal_sum_dec".cast(DoubleType), 6).as("totacctbal"))
      .orderBy($"cntrycode")
  }

  /** Q2 minimum-cost supplier — the REAL spec semantics: for each part in
    * a type/size slice, the EUROPE supplier(s) whose partsupp row carries
    * the part's minimum ps_supplycost AMONG EUROPE SUPPLIERS (the derived
    * [[TpchFixture.partsupp]]; the region restriction applies inside the
    * correlated MIN exactly as the official subquery repeats it). The
    * correlated-min subquery becomes a per-part decimal MIN frame
    * broadcast back onto the same region-restricted slice; ties keep
    * every achieving supplier, exactly like the official query. Output
    * carries the supplier's nation (the spec's n_name column). */
  val tpchQ2: Q = (s, d) => {
    val parts = t(s, d, "part")
      .filter($"p_type" === "LARGE" && $"p_size".between(10, 15))
      .select($"p_partkey", $"p_brand", $"p_size")
    val euSupp = t(s, d, "supplier")
      .join(broadcast(t(s, d, "nation")
        .join(broadcast(t(s, d, "region").filter($"r_name" === "EUROPE")),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
    val ps = TpchFixture.partsupp(s, d)
      .join(DimGates.gated(s, d, "part")(parts), $"ps_partkey" === $"p_partkey")
      .join(DimGates.gated(s, d, "supplier")(euSupp.select($"s_suppkey")),
        $"ps_suppkey" === $"s_suppkey", "left_semi")
      .select($"ps_partkey", $"ps_suppkey", $"ps_supplycost",
        $"p_brand", $"p_size")
    val minCost = ps.groupBy($"ps_partkey")
      .agg(min($"ps_supplycost").as("min_dec"))
      .select($"ps_partkey".as("mp_partkey"), $"min_dec")
    ps.join(DimGates.gated(s, d, "part")(minCost),
        $"ps_partkey" === $"mp_partkey" && $"ps_supplycost" === $"min_dec")
      .join(DimGates.gated(s, d, "supplier")(euSupp), $"ps_suppkey" === $"s_suppkey")
      .select($"s_acctbal", $"s_name", $"n_name",
        $"ps_partkey".as("p_partkey"), $"p_brand", $"p_size",
        round($"min_dec".cast(DoubleType), 6).as("min_cost"))
      .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
      .limit(100)
  }

  val queries: Map[String, Q] = Map(
    "tpch_q2" -> tpchQ2,
    "tpch_q7" -> tpchQ7,
    "tpch_q8" -> tpchQ8,
    "tpch_q9" -> tpchQ9,
    "tpch_q11" -> tpchQ11,
    "tpch_q12" -> tpchQ12,
    "tpch_q13" -> tpchQ13,
    "tpch_q15" -> tpchQ15,
    "tpch_q16" -> tpchQ16,
    "tpch_q17" -> tpchQ17,
    "tpch_q19" -> tpchQ19,
    "tpch_q20" -> tpchQ20,
    "tpch_q21" -> tpchQ21,
    "tpch_q22" -> tpchQ22,
  )

  val oracle: Map[String, String] = Map(
    "tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
           round(CAST(SUM(vol) AS DOUBLE), 6) AS revenue
         FROM (
           SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             CAST(l_extendedprice AS DECIMAL(18,6)) *
               (1 - CAST(l_discount AS DECIMAL(18,6))) AS vol
           FROM supplier, lineitem, orders, customer, nation n1, nation n2
           WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
             AND c_custkey = o_custkey
             AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
             AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR
                  (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
             AND l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate <  TIMESTAMP '1998-01-01') shipping
         GROUP BY supp_nation, cust_nation, l_year
         ORDER BY supp_nation, cust_nation, l_year""",
    "tpch_q8" ->
      """SELECT o_year,
           round(CAST(SUM(CASE WHEN nation = 'NATION_2' THEN vol
                          ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) /
                 CAST(SUM(vol) AS DOUBLE), 6) AS mkt_share
         FROM (
           SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,6)) *
               (1 - CAST(l_discount AS DECIMAL(18,6))) AS vol,
             n2.n_name AS nation
           FROM part, supplier, lineitem, orders, customer, nation n1, nation n2,
                region
           WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
             AND l_orderkey = o_orderkey AND o_custkey = c_custkey
             AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
             AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
             AND o_orderdate >= TIMESTAMP '1995-01-01'
             AND o_orderdate <  TIMESTAMP '1997-01-01'
             AND p_type = 'STANDARD') all_nations
         GROUP BY o_year ORDER BY o_year""",
    "tpch_q9" ->
      s"""WITH ${TpchFixture.partsuppCte}
         SELECT nation, o_year, round(CAST(SUM(amount) AS DOUBLE), 6) AS sum_profit
         FROM (
           SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,6)) *
               (1 - CAST(l_discount AS DECIMAL(18,6))) -
             ps_supplycost * CAST(l_quantity AS DECIMAL(18,6)) AS amount
           FROM part, supplier, lineitem, partsupp, orders, nation
           WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
             AND ps_partkey = l_partkey AND ps_suppkey = l_suppkey
             AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
             AND p_name LIKE '%gear%') profit
         GROUP BY nation, o_year
         ORDER BY nation, o_year DESC""",
    "tpch_q11" ->
      s"""WITH ${TpchFixture.partsuppCte},
         scoped AS (
           SELECT ps_partkey,
             SUM(ps_supplycost * CAST(ps_availqty AS DECIMAL(18,0)))
               AS val_dec
           FROM partsupp, supplier, nation
           WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
             AND n_name = 'NATION_3'
           GROUP BY ps_partkey)
         SELECT ps_partkey AS p_partkey,
           round(CAST(val_dec AS DOUBLE), 6) AS part_value
         FROM scoped
         WHERE val_dec > CAST((SELECT SUM(val_dec) FROM scoped)
                              AS DECIMAL(38,6)) *
                         CAST(0.001 AS DECIMAL(18,6))
         ORDER BY part_value DESC, p_partkey""",
    "tpch_q12" ->
      s"""WITH ${TpchFixture.lineitemXCte}
         SELECT l_shipmode,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem_x, orders
         WHERE l_orderkey = o_orderkey
           AND l_shipmode IN ('MAIL', 'SHIP')
           AND l_commitdate < l_receiptdate
           AND l_shipdate < l_commitdate
           AND l_receiptdate >= TIMESTAMP '1996-01-01'
           AND l_receiptdate <  TIMESTAMP '1997-01-01'
         GROUP BY l_shipmode ORDER BY l_shipmode""",
    "tpch_q13" ->
      """SELECT c_count, COUNT(*) AS custdist
         FROM (
           SELECT c_custkey, COUNT(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
           GROUP BY c_custkey) c_orders
         GROUP BY c_count
         ORDER BY custdist DESC, c_count DESC""",
    "tpch_q15" ->
      """WITH revenue AS (
           SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
                 (1 - CAST(l_discount AS DECIMAL(18,6)))) AS total_dec
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate <  TIMESTAMP '1996-04-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name,
           round(CAST(total_dec AS DOUBLE), 6) AS total_revenue
         FROM revenue JOIN supplier ON s_suppkey = l_suppkey
         WHERE total_dec = (SELECT MAX(total_dec) FROM revenue)
         ORDER BY s_suppkey""",
    "tpch_q16" ->
      s"""WITH ${TpchFixture.partsuppCte}
         SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT ps_suppkey) AS supplier_cnt
         FROM partsupp, part
         WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#1'
           AND p_type NOT LIKE 'MEDIUM%'
           AND p_size IN (1,5,9,13,17,21,25,29,33,37,41,45,49)
         GROUP BY p_brand, p_type, p_size
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "tpch_q17" ->
      s"""WITH ${TpchFixture.partXCte},
         li AS (
           SELECT l_partkey, l_quantity, l_extendedprice
           FROM lineitem JOIN part_x ON p_partkey = l_partkey
           WHERE p_brand = 'Brand#5' AND p_container = 'MED BOX'),
         per_part AS (
           SELECT l_partkey AS agg_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,6))) AS qty_dec,
             COUNT(*) AS n
           FROM li GROUP BY l_partkey)
         SELECT round(CAST(COALESCE(
             SUM(CAST(l_extendedprice AS DECIMAL(18,6))),
             CAST(0 AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 6) AS avg_yearly
         FROM li JOIN per_part ON l_partkey = agg_partkey
         WHERE CAST(l_quantity AS DECIMAL(18,6)) * 5 * n < qty_dec""",
    "tpch_q19" ->
      s"""WITH ${TpchFixture.lineitemXCte},
         ${TpchFixture.partXCte}
         SELECT round(CAST(COALESCE(
             SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
                 (1 - CAST(l_discount AS DECIMAL(18,6)))),
             CAST(0 AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue
         FROM lineitem_x, part_x
         WHERE p_partkey = l_partkey
           AND l_shipmode IN ('AIR', 'REG AIR')
           AND l_shipinstruct = 'DELIVER IN PERSON'
           AND (
           (p_brand = 'Brand#12' AND p_container IN ('SM CASE', 'SM BOX')
              AND p_size BETWEEN 1 AND 5
              AND l_quantity BETWEEN 1 AND 11) OR
           (p_brand = 'Brand#23' AND p_container IN ('MED BAG', 'MED BOX')
              AND p_size BETWEEN 1 AND 10
              AND l_quantity BETWEEN 10 AND 20) OR
           (p_brand = 'Brand#4' AND p_container IN ('LG CASE', 'LG BOX')
              AND p_size BETWEEN 1 AND 15
              AND l_quantity BETWEEN 20 AND 30))""",
    "tpch_q20" ->
      s"""WITH ${TpchFixture.partsuppCte},
         shipped AS (
           SELECT l_suppkey, l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,6))) AS shipped_dec
           FROM lineitem JOIN part ON p_partkey = l_partkey
           WHERE p_name LIKE '%bolt%'
             AND l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate <  TIMESTAMP '1997-01-01'
           GROUP BY l_suppkey, l_partkey)
         SELECT s_suppkey, s_name FROM supplier
         WHERE s_suppkey IN (
             SELECT ps_suppkey FROM partsupp
             JOIN part ON p_partkey = ps_partkey
             JOIN shipped ON ps_suppkey = l_suppkey AND ps_partkey = l_partkey
             WHERE p_name LIKE '%bolt%'
               AND CAST(ps_availqty * 2 AS DECIMAL(18,6)) > shipped_dec)
           AND s_nationkey IN (
             SELECT n_nationkey FROM nation JOIN region
               ON n_regionkey = r_regionkey
             WHERE r_name = 'EUROPE')
         ORDER BY s_suppkey""",
    "tpch_q21" ->
      s"""WITH ${TpchFixture.lineitemXCte},
         l AS (
           SELECT l_orderkey, l_suppkey,
             CASE WHEN l_receiptdate > l_commitdate
               THEN 1 ELSE 0 END AS late
           FROM lineitem_x JOIN orders ON l_orderkey = o_orderkey
           WHERE o_orderstatus = 'F'),
         per_order AS (
           SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late
           FROM l GROUP BY l_orderkey
           HAVING COUNT(DISTINCT l_suppkey) >= 2
              AND COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) = 1)
         SELECT s_name, COUNT(*) AS numwait
         FROM l JOIN per_order USING (l_orderkey)
              JOIN supplier ON l_suppkey = s_suppkey
         WHERE late = 1
         GROUP BY s_name
         ORDER BY numwait DESC, s_name LIMIT 20""",
    "tpch_q22" ->
      """WITH slice AS (
           SELECT * FROM customer WHERE c_nationkey IN (1,3,5,7,9,11)),
         avg_frame AS (
           SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS bal_dec,
             COUNT(*) AS n_pos
           FROM slice WHERE c_acctbal > 0)
         SELECT CAST(c_nationkey AS BIGINT) AS cntrycode, COUNT(*) AS numcust,
           round(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS totacctbal
         FROM slice, avg_frame
         WHERE CAST(c_acctbal AS DECIMAL(18,6)) * n_pos > bal_dec
           AND NOT EXISTS (
             SELECT 1 FROM orders WHERE o_custkey = c_custkey
               AND o_orderdate >= TIMESTAMP '1999-01-01')
         GROUP BY c_nationkey ORDER BY cntrycode""",
    "tpch_q2" ->
      s"""WITH ${TpchFixture.partsuppCte},
         eu AS (
           SELECT s_suppkey, s_name, s_acctbal, n_name
           FROM supplier JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'EUROPE'),
         ps AS (
           SELECT ps_partkey, ps_suppkey, ps_supplycost, p_brand, p_size
           FROM partsupp JOIN part ON p_partkey = ps_partkey
           WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 15
             AND ps_suppkey IN (SELECT s_suppkey FROM eu)),
         min_cost AS (
           SELECT ps_partkey AS mp_partkey, MIN(ps_supplycost) AS min_dec
           FROM ps GROUP BY ps_partkey)
         SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey,
           p_brand, p_size,
           round(CAST(min_dec AS DOUBLE), 6) AS min_cost
         FROM ps JOIN min_cost
           ON ps_partkey = mp_partkey AND ps_supplycost = min_dec
         JOIN eu ON ps_suppkey = s_suppkey
         ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""",
  )
}
