package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture multiplier for scale testing: writes `destDir` with
  * every fact table = ∪_{i<k} (src with all keys shifted by i·(max+1)), so
  * the result is a valid fixture at k× the rows with referential integrity
  * intact (copied orders reference copied customers, copied lineitems
  * reference copied orders/parts/suppliers, copied events belong to copied
  * users). region/nation stay fixed — they are spec-pinned dimensions (5/25
  * rows at every scale factor), exactly like TPC-H.
  *
  * Replicated documents/embeddings are exact content copies — deliberately:
  * multiplying a corpus this way is the worst case for the dedup family
  * (every document gains k−1 exact near-dups, every LSH bucket grows k×),
  * so a dedup query whose time stays ~linear here has no hidden quadratic
  * term. Graph-family note: part keys shift per copy, so the k× graph is k
  * disjoint copies of the 1× co-occurrence graph — edges and wedges scale
  * exactly k×, which is what makes the measured exponent attributable.
  *
  * Usage: runMain graft.tools.ScaleFixture <srcSfDir> <destDir> [k=2]
  */
object ScaleFixture {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleFixture <srcSfDir> <destDir> [k]")
    val (src, dest) = (args(0), args(1))
    val k = if (args.length >= 3) args(2).toInt else 2
    require(k >= 2, s"multiplier must be >= 2, got $k")
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

    def scaled(t: String, df: DataFrame, shifts: Map[String, Long]): Unit = {
      (0 until k).map { i =>
        shifts.foldLeft(df) { case (d, (key, o)) =>
          d.withColumn(key, col(key) + lit(i * o))
        }
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$dest/$t.parquet")
      println(s"[scale] $t: ${df.count() * k} rows " +
        s"(${k}x, ${shifts.keys.mkString(",")} shifted)")
    }

    // fixed dimensions: straight copies
    Seq("region", "nation").foreach { t =>
      raw(t).write.mode("overwrite").parquet(s"$dest/$t.parquet")
    }

    val cust = raw("customer"); val custOff = off(cust, "c_custkey")
    val supp = raw("supplier"); val suppOff = off(supp, "s_suppkey")
    val part = raw("part"); val partOff = off(part, "p_partkey")
    val ord = raw("orders"); val ordOff = off(ord, "o_orderkey")

    scaled("customer", cust, Map("c_custkey" -> custOff))
    scaled("supplier", supp, Map("s_suppkey" -> suppOff))
    scaled("part", part, Map("p_partkey" -> partOff))
    scaled("orders", ord, Map("o_orderkey" -> ordOff, "o_custkey" -> custOff))
    scaled("lineitem", raw("lineitem"), Map(
      "l_orderkey" -> ordOff, "l_partkey" -> partOff, "l_suppkey" -> suppOff))

    val ev = raw("events")
    // user_id shares the customer key domain (events sample a subset of
    // customers), so copied events must shift by the SAME custOff as
    // o_custkey — shifting by max(events.user_id)+1 would land copied
    // events on ORIGINAL customers and skew the events↔orders join
    // distribution in the k× fixture.
    scaled("events", ev, Map(
      "event_id" -> off(ev, "event_id"), "user_id" -> custOff))

    scaled("documents", raw("documents"), Map("doc_id" -> off(raw("documents"), "doc_id")))
    scaled("embeddings", raw("embeddings"), Map("vec_id" -> off(raw("embeddings"), "vec_id")))

    // provenance stamp: which SOURCE generation this derived fixture came
    // from — Bench copies it into the rung JSON as fixture_src_fp, and the
    // ladder gate refuses to mix rungs derived from different generations
    val srcFp = graft.plans.ArtifactCache.dataFingerprint(src)
    java.nio.file.Files.write(
      new java.io.File(dest, "PROVENANCE.json").toPath,
      (s"""{"source":"$src","source_fp":"$srcFp","k":$k}""" + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[scale] provenance: source_fp=$srcFp")

    spark.stop()
  }
}
