package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Source-format coverage: the reference's source pool speaks to whatever
  * database a task names (`internal/dbpool/dbpool.go:14-130`); the port's
  * analog is Spark's pluggable readers. [[graft.Tables.load]] already
  * resolves `<table>.{parquet,csv,json,orc}` — these queries prove the
  * non-parquet paths END TO END through the driver's DuckDB gate: the fixture
  * is converted once (pay-once [[graft.plans.ArtifactCache]] artifact, like
  * the bucketed layout), read back through the format reader, and must
  * hash-match the oracle run on the parquet original. Conversion is
  * lossless: longs and strings roundtrip trivially; doubles roundtrip via
  * Java's shortest-roundtrip decimal rendering on write and exact binary64
  * parse on read.
  *
  * Scale note: CSV/JSON are line-splittable, so reads parallelize per file
  * chunk, but carry no column pruning, no predicate pushdown, and no stats —
  * the 100 TB posture is "ingest once, convert to parquet/ORC"; these
  * operators are that ingest edge.
  */
object SourceFormatOps {
  type Q = (SparkSession, String) => DataFrame

  // the 4 columns roundtrip every canonical scalar class: BIGINT, VARCHAR,
  // INT-ish key, DOUBLE (CanonicalTypes' map, `sqldb.go:254-281`)
  private val cols = Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal")

  private def supplierSlim(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "supplier").select(
      col("s_suppkey").cast(LongType),
      col("s_name"),
      col("s_nationkey").cast(LongType),
      col("s_acctbal").cast(DoubleType))

  /** Pre-build both conversion artifacts (bench warm-up: the conversion is
    * an ingest pipeline stage, not part of the scan being measured). */
  private[graft] def warmConversions(s: SparkSession, d: String): Unit = {
    converted(s, d, "csv"); converted(s, d, "json"); converted(s, d, "orc")
    jdbcUrl(s, d); ()
  }

  /** One in-memory Derby database per (JVM, fixture dir), loaded once with
    * the slim supplier table through the ordinary `df.write.jdbc` path.
    * This is the live-SQL-database leg of the source matrix — the
    * reference's whole source model is external DBs (`dbpool.go`), and the
    * embedded engine exercises the identical Spark code path
    * (dialect-mapped DDL, batched INSERTs, then `spark.read.jdbc` with
    * pushdown) that MySQL/PG/ClickHouse sources use, with zero network
    * setup. Memory-backed, so it cannot be an [[graft.plans.ArtifactCache]]
    * artifact — the memo is per-JVM, and the load is attributed to the
    * bench's artifact-warm phase via [[warmConversions]]. */
  private val jdbcLoaded = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def jdbcUrl(s: SparkSession, d: String): String =
    jdbcLoaded.computeIfAbsent(d, _ => {
      val url = "jdbc:derby:memory:graft_src_" +
        java.lang.Integer.toHexString(d.hashCode) + ";create=true"
      supplierSlim(s, d).write.mode("overwrite")
        .jdbc(url, "supplier_src", new java.util.Properties)
      url
    })

  private def converted(s: SparkSession, d: String, fmt: String): String =
    graft.plans.ArtifactCache.getOrBuild(s"src$fmt", d, Seq("supplier"),
      Seq(SourceFormatOps.getClass, Tables.getClass)) { dir =>
      val w = supplierSlim(s, d).coalesce(1).write.mode("overwrite")
      fmt match {
        case "csv"  => w.option("header", "true").csv(dir)
        case "json" => w.json(dir)
        case "orc"  => w.orc(dir)
      }
    }

  private def castBack(df: DataFrame): DataFrame =
    df.select(
        col("s_suppkey").cast(LongType),
        col("s_name"),
        col("s_nationkey").cast(LongType),
        col("s_acctbal").cast(DoubleType))
      .orderBy(col("s_suppkey"))

  /** CSV source scan: schema-on-read (header + inference, the reference's
    * posture — it never knows schemas ahead of time either), explicit cast to
    * the canonical types so downstream plans are type-stable. */
  val sourceCsvScan: Q = (s, d) =>
    castBack(s.read.option("header", "true").option("inferSchema", "true")
      .csv(converted(s, d, "csv")))

  /** JSON-lines source scan (the log-ingest edge). */
  val sourceJsonScan: Q = (s, d) =>
    castBack(s.read.json(converted(s, d, "json")))

  /** ORC source scan — the columnar non-parquet leg of Tables.load's
    * 4-format resolution (schema travels in the file, like parquet). */
  val sourceOrcScan: Q = (s, d) =>
    castBack(s.read.orc(converted(s, d, "orc")))

  /** JDBC source scan: read the supplier table back out of a live SQL
    * database (embedded Derby) through `spark.read.jdbc`. Filters and
    * column pruning push into the remote DB as SQL — the same delegation
    * the reference performs wholesale; at scale the knobs are
    * partitionColumn/numPartitions for parallel range reads. */
  val sourceJdbcScan: Q = (s, d) =>
    castBack(s.read.jdbc(jdbcUrl(s, d), "supplier_src", new java.util.Properties))

  val queries: Map[String, Q] = Map(
    "source_csv_scan" -> sourceCsvScan,
    "source_json_scan" -> sourceJsonScan,
    "source_orc_scan" -> sourceOrcScan,
    "source_jdbc_scan" -> sourceJdbcScan,
  )

  private val supplierOracle: String =
    s"""SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey, s_acctbal
       FROM supplier ORDER BY s_suppkey"""

  val oracle: Map[String, String] = Map(
    "source_csv_scan" -> supplierOracle,
    "source_json_scan" -> supplierOracle,
    "source_orc_scan" -> supplierOracle,
    "source_jdbc_scan" -> supplierOracle,
  )
}
