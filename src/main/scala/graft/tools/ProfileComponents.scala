package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.Checkpoints.SweepSyntax

/** Round-1 isolation for graph_components (the [[ProfileLp]] convention):
  * general identity-seeded propagate vs the collapsed
  * [[graft.operators.GraphOps.componentsFirstPropagate]] aggregate, plus
  * the seed-pin cost the collapse also removes. Dev aid behind the
  * docs/SCALE.md round-13 numbers. */
object ProfileComponents {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.LocalDirs.shuffleDir())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val adjBase = graft.operators.GraphOps.packedAdjPath(spark, d)
    val adj = spark.read.parquet(s"$adjBase/adj")
    val seed = spark.read.parquet(s"$adjBase/deg")
      .select(col("v"), col("v").as("lbl")).sweepCheckpoint()
    seed.count()
    def t(label: String)(f: => Long): Unit =
      for (i <- 1 to 3) {
        System.gc()
        val t0 = System.nanoTime()
        val n = f
        println(f"[comp] $label%-22s run$i ${(System.nanoTime() - t0) / 1e9}%6.3f s (rows $n)")
      }
    t("general_prop_round1")(graft.operators.GraphOps
      .componentsPropagate(adj, seed, small = true).sweepCheckpoint().count())
    t("collapsed_round1")(graft.operators.GraphOps
      .componentsFirstPropagate(adj).sweepCheckpoint().count())
    t("seed_pin")(spark.read.parquet(s"$adjBase/deg")
      .select(col("v"), col("v").as("lbl")).sweepCheckpoint().count())
    t("full_graph_components")(graft.operators.GraphOps
      .queries("graph_components")(spark, d).count())
    spark.stop()
  }
}
