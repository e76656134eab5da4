package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Derived TPC-H fidelity columns: the fixture (TESTDATA.md) ships without
  * `partsupp`, ship mode/instruct, commit/receipt dates and containers, so
  * the queries touching them (Q2/Q9/Q11/Q12/Q16/Q17/Q19/Q20/Q21) used to
  * keep only their relational SHAPE over substitute columns. This layer
  * closes that gap without touching the driver's fixtures: every missing
  * table/column is DERIVED deterministically from existing integer keys
  * with plain positive-range mod arithmetic, and each derivation has an
  * exactly-equivalent DuckDB CTE spelling — so the real spec predicates
  * (ps_supplycost mins, shipmode IN-lists, commit-vs-receipt lateness,
  * container triples) run on BOTH engines and stay inside the hash-equality
  * gate. The reference itself would run these against a source database
  * that HAS the columns (it delegates SQL verbatim,
  * dungbeetle `internal/core/core.go:496`); deriving them is the
  * fixture-side analog.
  *
  * Determinism rules: all keys are contiguous 0-based (asserted cheaply via
  * the supplier count = max+1 relation the fixtures hold), every derived
  * value is a function of (p_partkey, s-range) or (l_orderkey,
  * l_linenumber), and % is applied to non-negative ints only, where Spark,
  * DuckDB and the JVM agree.
  *
  * Scale posture: `partsupp` is 4×|part| — a real TABLE at spec scale, not
  * a broadcast dimension, so unsliced uses (Q9, Q11, Q16) join it without a
  * broadcast hint and let AQE pick; brand/type-sliced uses (Q2, Q17, Q19,
  * Q20) broadcast the filtered slice exactly like the part slices they
  * wrap. The lineitem extensions are per-row projections — zero extra
  * shuffle, fused into the scan stage by codegen.
  */
object TpchFixture {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 6))

  /** TPC-H ship modes (spec §4.2.2.13). */
  val shipModes = Seq("REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB")
  /** TPC-H ship instructions. */
  val shipInstructs = Seq("DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN")
  /** Container vocabulary (spec's 5×8 grid, reduced to 8 — enough for the
    * Q17/Q19 equality predicates). */
  val containers = Seq("SM CASE", "SM BOX", "MED BAG", "MED BOX",
    "LG CASE", "LG BOX", "JUMBO PACK", "WRAP JAR")

  /** Derived `partsupp`: 4 suppliers per part, spread over the supplier key
    * space with the dbgen-style stride (i·(ns/4+1) walks the 4 copies away
    * from each other so a part's suppliers land in different nations).
    * availqty/supplycost are bounded mod-arithmetic on the pair keys;
    * supplycost carries exactly 2 decimals and lives in DECIMAL(18,6) so
    * every downstream sum/min is partial-order-exact. */
  def partsupp(s: SparkSession, d: String): DataFrame = {
    val ns = Tables.load(s, d, "supplier")
      .agg(count(lit(1)).as("ns")) // 1-row: broadcast, no driver collect
    Tables.load(s, d, "part")
      .select(col("p_partkey"))
      .crossJoin(broadcast(ns))
      .select(col("p_partkey"), col("ns"),
        explode(array((0 until 4).map(lit): _*)).as("i"))
      .select(
        col("p_partkey").as("ps_partkey"),
        expr("(p_partkey + i * (ns DIV 4 + 1)) % ns").as("ps_suppkey"),
        expr("(p_partkey * 7 + i * 131) % 9999 + 1")
          .cast(LongType).as("ps_availqty"),
        dec(dec(expr("(p_partkey * 31 + ((p_partkey + i * (ns DIV 4 + 1)) % ns) * 13 + i) % 99901 + 100")) *
          dec(lit(0.01))).as("ps_supplycost"))
  }

  /** The identical derivation as a DuckDB CTE (`partsupp`). */
  val partsuppCte: String =
    """partsupp AS (
        SELECT p_partkey AS ps_partkey,
          (p_partkey + i * (ns // 4 + 1)) % ns AS ps_suppkey,
          CAST((p_partkey * 7 + i * 131) % 9999 + 1 AS BIGINT) AS ps_availqty,
          CAST(CAST((p_partkey * 31 + ((p_partkey + i * (ns // 4 + 1)) % ns) * 13 + i) % 99901 + 100
               AS DECIMAL(18,6)) * CAST(0.01 AS DECIMAL(18,6)) AS DECIMAL(18,6))
            AS ps_supplycost
        FROM part
        CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM supplier) sc
        CROSS JOIN (SELECT unnest(range(0, 4)) AS i) four)"""

  /** `lineitem` extended with the derived shipping columns. The per-line
    * key k = l_orderkey·7 + l_linenumber decorrelates lines of one order;
    * commitdate lands in [ship−30 d, ship+30 d] and receiptdate in
    * [ship+1 d, ship+30 d], so the spec's lateness predicate
    * (l_commitdate < l_receiptdate) and Q12's full conjunction are real,
    * selective comparisons. */
  def lineitemX(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "lineitem")
      .withColumn("lk", expr("l_orderkey * 7 + l_linenumber"))
      .withColumn("l_shipmode",
        element_at(array(shipModes.map(lit): _*),
          expr("CAST(lk % 7 AS INT) + 1")))
      .withColumn("l_shipinstruct",
        element_at(array(shipInstructs.map(lit): _*),
          expr("CAST((l_orderkey + l_linenumber * 3) % 4 AS INT) + 1")))
      .withColumn("l_commitdate",
        expr("timestampadd(DAY, CAST(lk % 61 - 30 AS INT), l_shipdate)"))
      .withColumn("l_receiptdate",
        expr("timestampadd(DAY, CAST(1 + lk % 30 AS INT), l_shipdate)"))
      .drop("lk")

  /** The identical derivation as a DuckDB CTE (`lineitem_x`). */
  val lineitemXCte: String = {
    val modes = shipModes.map(m => s"'$m'").mkString("[", ", ", "]")
    val instr = shipInstructs.map(m => s"'$m'").mkString("[", ", ", "]")
    s"""lineitem_x AS (
        SELECT l.*,
          ($modes)[CAST((l_orderkey * 7 + l_linenumber) % 7 AS INT) + 1]
            AS l_shipmode,
          ($instr)[CAST((l_orderkey + l_linenumber * 3) % 4 AS INT) + 1]
            AS l_shipinstruct,
          l_shipdate + ((l_orderkey * 7 + l_linenumber) % 61 - 30) * INTERVAL 1 DAY
            AS l_commitdate,
          l_shipdate + (1 + (l_orderkey * 7 + l_linenumber) % 30) * INTERVAL 1 DAY
            AS l_receiptdate
        FROM lineitem l)"""
  }

  /** `part` extended with a derived container. */
  def partX(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "part")
      .withColumn("p_container",
        element_at(array(containers.map(lit): _*),
          expr("CAST(p_partkey * 3 % 8 AS INT) + 1")))

  /** The identical derivation as a DuckDB CTE (`part_x`). */
  val partXCte: String = {
    val cs = containers.map(c => s"'$c'").mkString("[", ", ", "]")
    s"""part_x AS (
        SELECT p.*, ($cs)[CAST(p_partkey * 3 % 8 AS INT) + 1] AS p_container
        FROM part p)"""
  }
}
