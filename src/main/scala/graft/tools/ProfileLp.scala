package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.Checkpoints.SweepSyntax

/** Per-stage timing for graph_label_prop (dev aid, same spirit as
  * [[ProfilePr]]): attributes the query across the two LPA rounds and the
  * community-size window, and A/Bs the round-1 algebraic shortcut (all
  * first-round votes tie at 1, so round 1 IS "adopt min neighbour id" —
  * computable per adjacency row without the join+explode+vote). */
object ProfileLp {
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
      println(f"[lp] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val adjBase = t("adj artifact")(graft.operators.GraphOps.packedAdjPath(spark, d))
    for (round <- 1 to 2) {
      println(s"--- full-query pass $round")
      t("full graph_label_prop") {
        graft.operators.GraphOps.queries("graph_label_prop")(spark, d).count()
      }
    }
    println("--- decomposed (current spelling)")
    val adj = spark.read.parquet(s"$adjBase/adj")
    val seed = spark.read.parquet(s"$adjBase/deg")
      .select(col("v"), col("v").as("lbl"))
    val l1 = t("round 1 (join+vote)")(
      graft.operators.GraphOps.labelPropRound(adj, seed).sweepCheckpoint())
    val l2 = t("round 2 (join+vote)")(
      graft.operators.GraphOps.labelPropRound(adj, l1).sweepCheckpoint())
    t("window community_size + sort") {
      l2.withColumn("community_size",
          count(lit(1)).over(Window.partitionBy(col("lbl"))))
        .orderBy(col("v")).count()
    }
    println("--- round-1 shortcut candidate")
    val l1b = t("round 1 (min array_min)")(
      adj.groupBy(col("src").as("v"))
        .agg(min(array_min(col("dsts"))).as("lbl")).sweepCheckpoint())
    t("shortcut == current (bit)") {
      val diff = l1.unionAll(l1b).groupBy("v", "lbl").count()
        .filter(col("count") =!= 2).count()
      println(s"[lp]   diff rows: $diff")
    }
    val l2b = t("round 2 after shortcut")(
      graft.operators.GraphOps.labelPropRound(adj, l1b).sweepCheckpoint())
    println(s"[lp]   l2 rows ${l2.count()} vs ${l2b.count()}")
    println("--- final stage alternatives")
    t("agg+join community_size") {
      val cs = l2.groupBy(col("lbl")).agg(count(lit(1)).as("community_size"))
      l2.join(cs, "lbl").orderBy(col("v")).count()
    }
    spark.stop()
  }
}
