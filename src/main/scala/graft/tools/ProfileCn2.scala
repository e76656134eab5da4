package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.plans.Checkpoints.SweepSyntax

/** Dev-only: decompose graph_common_neighbors' QUERY-side cost (the
  * artifact is warm) — raw artifact scan, the broadcast anti-join, the
  * TakeOrdered, then the full query — to find where the sf1 seconds go. */
object ProfileCn2 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.LocalDirs.shuffleDir())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"T $n%-20s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }
    val pcPath = graft.operators.GraphOps.pairCountsPath(spark, d)
    val pc = spark.read.parquet(pcPath + "/pairs")
    for (i <- 1 to 3) {
      println(s"--- rep $i"); System.gc()
      t("raw count")(pc.count())
      t("agg sum c")(pc.agg(sum("c")).collect())
      val e = spark.read.parquet(
        graft.operators.GraphOps.edgesPath(spark, d) + "/edges")
      val ep = e.select(shiftleft(col("a"), 32).bitwiseOR(col("b")).as("p"))
      t("top20 no join")(pc.orderBy(col("c").desc, col("p")).limit(20).collect())
      t("anti+top20")(pc.join(broadcast(ep), Seq("p"), "left_anti")
        .orderBy(col("c").desc, col("p")).limit(20).collect())
      t("anti_sh+top20")(pc.join(ep.hint("shuffle_hash"), Seq("p"), "left_anti")
        .orderBy(col("c").desc, col("p")).limit(20).collect())
      // pre-pinned edge set: is the 12 s the broadcast BUILD (driver-side
      // single-threaded hash of 12M keys) re-paid per query?
      val epPinned = ep.sweepCheckpoint()
      t("anti bc pinned")(pc.join(broadcast(epPinned), Seq("p"), "left_anti")
        .orderBy(col("c").desc, col("p")).limit(20).collect())
      t("anti bc pinned2")(pc.join(broadcast(epPinned), Seq("p"), "left_anti")
        .orderBy(col("c").desc, col("p")).limit(20).collect())
      t("full cn query")(
        graft.operators.GraphOps.queries("graph_common_neighbors")(spark, d).collect())
    }
  }
}
