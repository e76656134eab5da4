package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.GraphOps

/** A/B harness for the round-12 verdict's #3: broadcast-state vs
  * bucketed-adjacency spellings of the three packed-adjacency sweeps
  * (pagerank / eigencentrality / components) at the high ladder rungs
  * (sf1 / sf2), where the fixed-resource pressure that inflates the
  * iterative family lives. Prints per-variant medians over N runs; the
  * decision (gate or honest negative) is recorded in docs/SCALE.md
  * ("bucketed-default A/B, round 13").
  *
  * Usage: ProfileBucketedAB <sfDir> [runs]
  */
object ProfileBucketedAB {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/tmp/sf1"
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.LocalDirs.shuffleDir())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    // pay the artifacts once, outside any timed run
    GraphOps.packedAdjPath(spark, d)
    GraphOps.bucketedAdjTable(spark, d)

    val variants: Seq[(String, () => Long)] = Seq(
      // production default: gated broadcast-vs-shuffle-hash (vertexBound
      // vs Limits.maxBroadcastVertices) — at sf1+/local the 2m bound is
      // past 16M, so this IS the shuffle-hash leg
      "pagerank_default" -> (() =>
        GraphOps.graphPagerankImpl(spark, d, graft.Limits.maxBroadcastVertices).count()),
      "eigen_default" -> (() =>
        GraphOps.graphEigencentralityImpl(spark, d, graft.Limits.maxBroadcastVertices).count()),
      "components_default" -> (() =>
        GraphOps.graphComponentsImpl(spark, d, graft.Limits.maxBroadcastVertices).count()),
      "pagerank_broadcast" -> (() =>
        GraphOps.graphPagerankImpl(spark, d, Long.MaxValue).count()),
      "pagerank_bucketed" -> (() =>
        GraphOps.graphPagerankImpl(spark, d, Long.MaxValue, bucketed = true).count()),
      "eigen_broadcast" -> (() =>
        GraphOps.graphEigencentralityImpl(spark, d, Long.MaxValue).count()),
      "eigen_bucketed" -> (() =>
        GraphOps.graphEigencentralityImpl(spark, d, Long.MaxValue, bucketed = true).count()),
      "components_broadcast" -> (() =>
        GraphOps.graphComponentsImpl(spark, d, Long.MaxValue).count()),
      "components_bucketed" -> (() =>
        GraphOps.graphComponentsImpl(spark, d, Long.MaxValue, bucketed = true).count()),
    )
    val out = variants.map { case (name, run) =>
      val times = (1 to runs).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = times((times.size - 1) / 2)
      println(f"[ab] $name%-24s median $med%7.3f s  (all: ${
        times.map(t => f"$t%.2f").mkString(" ")})")
      name -> med
    }
    println(out.map { case (n, m) => f""""$n":$m%.3f""" }
      .mkString(s"""{"sf":"$d",""", ",", "}"))
    spark.stop()
  }
}
