package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-session A/B for the kcore one-pin-per-round fusion experiment
  * (round-11 directive #6). Alternates the shipped two-pin spelling and
  * the fused one-pin spelling within ONE JVM/session — the only A/B
  * protocol that survives day-to-day environment drift (round-9 note).
  * Test scope: never ships, never benched. */
object KcoreAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("AB_ROUNDS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.LocalDirs.shuffleDir())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def time(f: => Long): Double = {
      System.gc()
      val t0 = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t0) / 1e9
      assert(n > 0); s
    }
    if (sys.env.contains("AB_EXPLAIN")) {
      // one fused round's physical plan: does ReuseExchange dedupe the
      // unpinned keep-set aggregate under the two semi-joins?
      import org.apache.spark.sql.functions.col
      val e = spark.read.parquet(
        s"${graft.operators.GraphOps.edgesPath(spark, sfDir)}/edges")
      val keep = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
        .groupBy(col("v")).agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("degree"))
        .filter(col("degree") >= graft.operators.GraphOps.kcoreK).select(col("v"))
      val round = graft.operators.GraphOps.kcoreRound(e, keep, small = true)
      val plan = round.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println("AB explain BroadcastExchange=" +
        plan.linesIterator.count(_.contains("- BroadcastExchange")) +
        " ReusedExchange=" +
        plan.linesIterator.count(_.contains("- ReusedExchange")))
      // expression-key spelling: both semi-joins probe the SAME unrenamed
      // broadcast subtree — does ReuseExchange fire then?
      val k1 = org.apache.spark.sql.functions.broadcast(keep)
      val k2 = org.apache.spark.sql.functions.broadcast(keep)
      val round2 = e.join(k1, col("a") === k1("v"), "left_semi")
        .join(k2, col("b") === k2("v"), "left_semi")
      val plan2 = round2.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println("AB explain2 BroadcastExchange=" +
        plan2.linesIterator.count(_.contains("- BroadcastExchange")) +
        " ReusedExchange=" +
        plan2.linesIterator.count(_.contains("- ReusedExchange")))
      spark.stop(); return
    }
    // warm both paths once (codegen/artifact)
    graft.operators.GraphOps.graphKcoreImpl(spark, sfDir, Long.MaxValue).count()
    graft.operators.GraphOps.graphKcoreFusedImpl(spark, sfDir, Long.MaxValue).count()
    val twoPin = collection.mutable.ArrayBuffer[Double]()
    val onePin = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to rounds) {
      twoPin += time(graft.operators.GraphOps.graphKcoreImpl(spark, sfDir, Long.MaxValue).count())
      onePin += time(graft.operators.GraphOps.graphKcoreFusedImpl(spark, sfDir, Long.MaxValue).count())
    }
    def med(xs: Seq[Double]) = xs.sorted.apply((xs.size - 1) / 2)
    println(f"AB kcore two-pin: med=${med(twoPin.toSeq)}%.3f all=${twoPin.map(x => f"$x%.3f").mkString(",")}")
    println(f"AB kcore one-pin: med=${med(onePin.toSeq)}%.3f all=${onePin.map(x => f"$x%.3f").mkString(",")}")
    // identity check: both spellings must agree bit-for-bit
    val a = graft.operators.GraphOps.graphKcoreImpl(spark, sfDir, Long.MaxValue).collect().map(_.toSeq).toSeq
    val b = graft.operators.GraphOps.graphKcoreFusedImpl(spark, sfDir, Long.MaxValue).collect().map(_.toSeq).toSeq
    println(s"AB identity: ${a == b}")
    spark.stop()
  }
}
