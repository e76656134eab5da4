package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture doubler for scale testing: writes `destDir` with
  * every fact table = src ∪ (src with all keys shifted past their max), so
  * the result is a valid fixture at 2× the rows with referential integrity
  * intact (copied orders reference copied customers, copied lineitems
  * reference copied orders/parts/suppliers, copied events belong to copied
  * users). region/nation stay fixed — they are spec-pinned dimensions (5/25
  * rows at every scale factor), exactly like TPC-H.
  *
  * Duplicated documents/embeddings are exact content copies — deliberately:
  * doubling a corpus this way is the worst case for the dedup family (every
  * document gains an exact near-dup, every LSH bucket doubles), so a dedup
  * query whose time stays ~linear here has no hidden quadratic term.
  *
  * Usage: runMain graft.tools.ScaleFixture <srcSfDir> <destDir>
  */
object ScaleFixture {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleFixture <srcSfDir> <destDir>")
    val (src, dest) = (args(0), args(1))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-scale-fixture")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      // events.ts is TIMESTAMP(NANOS); read raw as long and write it back as
      // BIGINT — Tables.load applies the micros conversion either way
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def raw(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def off(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    def doubled(t: String, df: DataFrame, shifts: Map[String, Long]): Unit = {
      val copy = shifts.foldLeft(df) { case (d, (k, o)) => d.withColumn(k, col(k) + o) }
      df.unionAll(copy)
        .write.mode("overwrite").parquet(s"$dest/$t.parquet")
      println(s"[scale] $t: ${df.count() * 2} rows (${shifts.keys.mkString(",")} shifted)")
    }

    // fixed dimensions: straight copies
    Seq("region", "nation").foreach { t =>
      raw(t).write.mode("overwrite").parquet(s"$dest/$t.parquet")
    }

    val cust = raw("customer"); val custOff = off(cust, "c_custkey")
    val supp = raw("supplier"); val suppOff = off(supp, "s_suppkey")
    val part = raw("part"); val partOff = off(part, "p_partkey")
    val ord = raw("orders"); val ordOff = off(ord, "o_orderkey")

    doubled("customer", cust, Map("c_custkey" -> custOff))
    doubled("supplier", supp, Map("s_suppkey" -> suppOff))
    doubled("part", part, Map("p_partkey" -> partOff))
    doubled("orders", ord, Map("o_orderkey" -> ordOff, "o_custkey" -> custOff))
    doubled("lineitem", raw("lineitem"), Map(
      "l_orderkey" -> ordOff, "l_partkey" -> partOff, "l_suppkey" -> suppOff))

    val ev = raw("events")
    // user_id shares the customer key domain (events sample a subset of
    // customers), so copied events must shift by the SAME custOff as
    // o_custkey — shifting by max(events.user_id)+1 would land copied
    // events on ORIGINAL customers and skew the events↔orders join
    // distribution in the 2× fixture.
    doubled("events", ev, Map(
      "event_id" -> off(ev, "event_id"), "user_id" -> custOff))

    doubled("documents", raw("documents"), Map("doc_id" -> off(raw("documents"), "doc_id")))
    doubled("embeddings", raw("embeddings"), Map("vec_id" -> off(raw("embeddings"), "vec_id")))

    spark.stop()
  }
}
