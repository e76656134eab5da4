package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** The RAW (un-normalized) parquet frame for a table, memoized like
    * [[load]] — for consumers that need the file's own schema (the stream
    * sources derive their declared schema from it) rather than the
    * canonicalized one. Parquet only: the callers are the streaming legs. */
  private[graft] def loadRawParquet(spark: SparkSession, sfDir: String,
      table: String): DataFrame = {
    val f = new java.io.File(s"$sfDir/$table.parquet")
    val key = s"raw:${System.identityHashCode(spark)}:${f.getCanonicalPath}:${f.length}:${f.lastModified}"
    planCache.computeIfAbsent(key, _ => spark.read.parquet(f.getPath))
  }

  private def loadUncached(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    if (table == "events" && exists(sfDir, table, "parquet")) {
      // Fixture generations have shipped events.ts as TIMESTAMP(NANOS),
      // TIMESTAMP(MICROS) and raw epoch longs — adapt to whatever arrives
      // instead of assuming one unit (the reference's schema-on-read
      // canonicalization: dungbeetle sqldb.go:254-281 adapts to whatever
      // the driver reports at runtime). nanosAsLong lets a NANOS fixture
      // load at all (the vectorized reader rejects it otherwise) and is a
      // no-op for every other generation.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$table.parquet")
      normalizeTs(df, df)
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

  /** Canonicalize `column` of `df` to microsecond TimestampType, whatever
    * physical type the source carries. `decideFrom` must be a BATCH frame
    * over the same files: the decision may need one sampled value (to pick
    * the epoch unit of a raw long), which a streaming frame can't provide —
    * the stream path passes its batch twin here so batch and stream can
    * never disagree on the unit again.
    */
  private[graft] def normalizeTs(df: DataFrame, decideFrom: DataFrame,
      column: String = "ts"): DataFrame =
    tsCanonExpr(decideFrom, column).fold(df)(e => df.withColumn(column, expr(e)))

  /** SQL expression canonicalizing `column` to TimestampType, or None when
    * it already is one. TIMESTAMP_NTZ is reinterpreted as UTC instants —
    * every entrypoint pins `spark.sql.session.timeZone=UTC`, so this matches
    * the oracle's naive-timestamp arithmetic. A raw long is an epoch count
    * whose unit is detected from one non-null value's magnitude.
    */
  private[graft] def tsCanonExpr(batch: DataFrame, column: String): Option[String] =
    batch.schema.collectFirst { case f if f.name == column => f.dataType }.flatMap {
      case TimestampType => None
      case TimestampNTZType => Some(s"cast($column as timestamp)")
      case LongType =>
        val sample = batch.select(column).na.drop().head(1)
        val v = if (sample.isEmpty) 0L else sample(0).getLong(0)
        Some(s"timestamp_micros(${epochToMicrosSql(column, v)})")
      case _ => None
    }

  /** Integer arithmetic taking an epoch-long to microseconds, unit chosen by
    * magnitude: contemporary dates are ~1.7e9 s / 1.7e12 ms / 1.7e15 µs /
    * 1.7e18 ns, so boundaries at 1e11 / 1e14 / 1e17 classify every date
    * between 1973 and 5138 unambiguously. Integer (not double) arithmetic:
    * epoch-nanos exceed 2^53 and would lose precision in a float divide.
    */
  private[graft] def epochToMicrosSql(column: String, sampleValue: Long): String = {
    val a = math.abs(sampleValue)
    if (a >= 100000000000000000L) s"$column div 1000" // nanoseconds
    else if (a >= 100000000000000L) column // already microseconds
    else if (a >= 100000000000L) s"$column * 1000" // milliseconds
    else s"$column * 1000000" // seconds
  }

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
