package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.plans.Checkpoints.SweepSyntax

/** Per-stage timing for the graph_pagerank loop (dev aid, same spirit as
  * [[ProfileCn]]): attributes sweep cost across edge load, sym pin, degree
  * pin, per-sweep checkpoint and fixpoint checks. */
object ProfilePr {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.LocalDirs.shuffleDir())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pr] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    // warm the session + artifact
    spark.range(1000).selectExpr("sum(id)").collect()
    t("edges artifact")(graft.operators.GraphOps.edgesPath(spark, d))
    for (round <- 1 to 2) {
      println(s"--- round $round")
      t("full graph_pagerank") {
        graft.operators.GraphOps.queries("graph_pagerank")(spark, d).count()
      }
    }
    // decomposed loop
    val e = t("load+pin edges")(
      spark.read.parquet(s"${graft.operators.GraphOps.edgesPath(spark, d)}/edges")
        .sweepCheckpoint())
    val deg = t("pin degrees")(
      e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("degree")).sweepCheckpoint())
    val nv = t("count nv")(deg.count())
    val init = graft.operators.GraphOps.pagerankScale / nv
    val symd = t("pin symd")(
      e.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
        .join(broadcast(deg.withColumnRenamed("v", "src")), "src")
        .sweepCheckpoint())
    var pr = t("init pr")(
      deg.select(col("v"), lit(init).as("pr")).sweepCheckpoint())
    for (i <- 1 to 4) {
      val prev = pr
      pr = t(s"block $i (3 sweeps)") {
        var x = prev
        for (_ <- 1 to 3) x = graft.operators.GraphOps.pagerankSweep(symd, init, x)
        x.sweepCheckpoint()
      }
      if (i < 4) t(s"check $i") {
        pr.join(broadcast(prev.withColumnRenamed("pr", "prev")), "v")
          .filter(col("pr") =!= col("prev")).isEmpty
      }
    }
    spark.stop()
  }
}
