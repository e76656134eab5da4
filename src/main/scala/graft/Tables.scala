package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Named table loaders over the driver-generated parquet fixtures.
  *
  * Mirrors the reference's named source-DB pool (dungbeetle
  * `internal/dbpool/dbpool.go:14-130`): a source is a *name* that resolves to a
  * scan; here each fixture table resolves to a parquet read rooted at a
  * scale-factor directory. Reads are lazy DataFrames so Catalyst can push
  * filters/prune columns into the parquet scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Analyzed-plan cache: creating a reader DataFrame runs a small parquet
    * footer/file-listing job (and a full inference pass for CSV/JSON), and a
    * Verify/Bench run constructs hundreds of queries that each load the same
    * handful of tables — so the resolved DataFrame is memoized per (session,
    * file identity). The key includes length+mtime, so a rewritten fixture
    * reloads; the value is a logical plan (no data), so the map stays tiny. */
  private val planCache = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val f = resolve(sfDir, table)
    val key = s"${System.identityHashCode(spark)}:${f.getCanonicalPath}:${f.length}:${f.lastModified}"
    planCache.computeIfAbsent(key, _ => loadUncached(spark, sfDir, table))
  }

  private def loadUncached(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    if (table == "events" && exists(sfDir, table, "parquet")) {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects; read it as a raw long and truncate to microsecond
      // TimestampType. `ts div 1000` stays in integer arithmetic (a double
      // division would lose precision: epoch-nanos > 2^53).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$table.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else if (exists(sfDir, table, "parquet")) {
      spark.read.parquet(s"$sfDir/$table.parquet")
    } else if (exists(sfDir, table, "csv")) {
      // header + schema inference: the schema-on-read posture of the
      // reference (it never knows result schemas ahead of time either)
      spark.read.option("header", "true").option("inferSchema", "true")
        .csv(s"$sfDir/$table.csv")
    } else if (exists(sfDir, table, "json")) {
      spark.read.json(s"$sfDir/$table.json")
    } else if (exists(sfDir, table, "orc")) {
      spark.read.orc(s"$sfDir/$table.orc")
    } else {
      throw new IllegalArgumentException(
        s"no $table.{parquet,csv,json,orc} under $sfDir")
    }
  }

  private def exists(dir: String, table: String, ext: String): Boolean =
    new java.io.File(s"$dir/$table.$ext").exists()

  /** The concrete file/dir `load` would read for a table — same resolution
    * order. Errors like `load` when no format is present (callers such as
    * the artifact cache must fingerprint real bytes, not a missing path). */
  def resolve(sfDir: String, table: String): java.io.File =
    Seq("parquet", "csv", "json", "orc").collectFirst {
      case ext if exists(sfDir, table, ext) => new java.io.File(s"$sfDir/$table.$ext")
    }.getOrElse(throw new IllegalArgumentException(
      s"no $table.{parquet,csv,json,orc} under $sfDir"))

  /** Register every *available* table as a temp view so task SQL can refer
    * to tables by name, the way reference task SQL refers to source-DB
    * tables. A source dir may carry any subset of the tables in any
    * supported format. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { t =>
      if (Seq("parquet", "csv", "json", "orc").exists(exists(sfDir, t, _)))
        load(spark, sfDir, t).createOrReplaceTempView(t)
    }

  /** Register only the named subset (lowercased names) — the per-job path:
    * creating a DataFrame reads footers/infers schema eagerly, so a job
    * touching one table must not pay a schema read for every fixture table
    * the source happens to carry. Unknown names are ignored; the subsequent
    * resolution error for a genuinely missing table is the same either way. */
  def registerReferenced(spark: SparkSession, sfDir: String, referenced: Set[String]): Unit =
    names.filter(referenced.contains).foreach { t =>
      if (Seq("parquet", "csv", "json", "orc").exists(exists(sfDir, t, _)))
        load(spark, sfDir, t).createOrReplaceTempView(t)
    }
}
