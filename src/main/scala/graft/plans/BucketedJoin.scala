package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) join support: pre-shuffle both sides of a repeated
  * join into the same bucket layout so subsequent joins are exchange-free.
  *
  * This is the 100 TB answer to "this join runs every day on the same key":
  * pay the shuffle once at write time (`bucketBy` + `sortBy`), then every
  * sort-merge join on the bucket key needs NO Exchange and NO Sort — each
  * task zips bucket i of both tables. The tables are written as external
  * tables (explicit `path`), so the catalog entry is just bucket metadata
  * over plain parquet.
  */
object BucketedJoin {

  /** Write `df` bucketed by `key` into `path`, registered as `table`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int, path: String): Unit =
    df.write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Register an already-written bucketed layout (e.g. an [[ArtifactCache]]
    * hit built by another session) as an external bucketed table. The catalog
    * entry is pure metadata over the existing parquet buckets. */
  def registerBucketed(spark: SparkSession, table: String, schemaDDL: String,
      key: String, numBuckets: Int, path: String): Unit =
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $table ($schemaDDL) USING parquet
          CLUSTERED BY ($key) SORTED BY ($key) INTO $numBuckets BUCKETS
          LOCATION '$path'"""): Unit

  /** Join two bucketed tables on their bucket keys; `hint("merge")` pins
    * sort-merge so the exchange-free plan is visible even where AQE would
    * pick a broadcast. */
  def join(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable), spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))
}
