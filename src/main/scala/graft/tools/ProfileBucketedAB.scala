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
      // r14: kcore delta-peeling vs the old edge-restriction spelling,
      // and the bucketed-adjacency leg for delta
      "kcore_peel_old" -> (() =>
        GraphOps.graphKcorePeelImpl(spark, d, graft.Limits.maxBroadcastVertices).count()),
      "kcore_delta_default" -> (() =>
        GraphOps.graphKcoreDeltaImpl(spark, d, graft.Limits.maxBroadcastVertices).count()),
      "kcore_delta_bucketed" -> (() =>
        GraphOps.graphKcoreDeltaImpl(spark, d, Long.MaxValue, bucketed = true).count()),
      // r14: label_prop gated default vs bucketed adjacency
      "labelprop_default" -> (() =>
        GraphOps.graphLabelPropImpl(spark, d, graft.Limits.maxBroadcastVertices).count()),
      "labelprop_bucketed" -> (() =>
        GraphOps.graphLabelPropImpl(spark, d, Long.MaxValue, bucketed = true).count()),
      // r14: louvain probe-reversal spelling (the shipped default)
      "louvain_default" -> (() =>
        GraphOps.graphLouvainMoveImpl(spark, d, graft.Limits.maxBroadcastVertices).count()),
      // the pre-r14 vote in isolation vs the reversed one: explode +
      // per-edge ku probe + argmin (old) against chunk-row ku + argmin +
      // one vertex-sized kv probe (new) — the full-query A/B would dilute
      // the delta with the shared intra/modularity passes
      "louvain_vote_old" -> (() => {
        import org.apache.spark.sql.functions._
        val adjBase = GraphOps.packedAdjPath(spark, d)
        val deg = spark.read.parquet(s"$adjBase/deg")
        spark.read.parquet(s"$adjBase/adj")
          .select(col("src").as("v"), col("degree").as("kv"),
            explode(col("dsts")).as("u"))
          .join(deg.select(col("v").as("u"), col("degree").as("ku"))
            .hint("shuffle_hash"), "u")
          .groupBy(col("v"))
          .agg(min_by(struct(col("u"), col("ku")),
              struct(col("ku"), col("u"))).as("b"),
            first(col("kv")).as("kv"))
          .count()
      }),
      "louvain_vote_new" -> (() => {
        import org.apache.spark.sql.functions._
        val adjBase = GraphOps.packedAdjPath(spark, d)
        val deg = spark.read.parquet(s"$adjBase/deg")
        spark.read.parquet(s"$adjBase/adj")
          .select(col("src").as("u"), col("degree").as("ku"),
            explode(col("dsts")).as("v"))
          .groupBy(col("v"))
          .agg(min_by(struct(col("u"), col("ku")),
              struct(col("ku"), col("u"))).as("b"))
          .join(deg.hint("shuffle_hash"), "v")
          .count()
      }),
      // structural-negative check: the vote fans out BY the bucketing key
      // (src) but aggregates by the other endpoint, so the pre-hash cannot
      // survive into the argmin exchange — expect a wash/loss
      "louvain_vote_bucketed" -> (() => {
        import org.apache.spark.sql.functions._
        val deg = spark.read
          .parquet(s"${GraphOps.packedAdjPath(spark, d)}/deg")
        spark.table(GraphOps.bucketedAdjTable(spark, d))
          .select(col("src").as("u"), col("degree").as("ku"),
            explode(col("dsts")).as("v"))
          .groupBy(col("v"))
          .agg(min_by(struct(col("u"), col("ku")),
              struct(col("ku"), col("u"))).as("b"))
          .join(deg.hint("shuffle_hash"), "v")
          .count()
      }),
    )
    // optional args(2): comma-separated variant-name filter, so a session
    // can re-measure one family without paying the whole table
    val only = if (args.length > 2) args(2).split(",").map(_.trim).toSet
      else Set.empty[String]
    // a typo'd name would silently produce an empty A/B table that reads
    // as a measurement problem — fail with the valid names instead
    val unknown = only.diff(variants.map(_._1).toSet)
    if (unknown.nonEmpty) {
      System.err.println(
        s"[ab] unknown variant(s): ${unknown.mkString(", ")}\n" +
          s"[ab] valid names: ${variants.map(_._1).mkString(", ")}")
      spark.stop()
      sys.exit(2)
    }
    val out = variants.filter(v => only.isEmpty || only(v._1))
      .map { case (name, run) =>
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
