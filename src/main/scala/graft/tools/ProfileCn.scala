package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler for graph_common_neighbors: times the expansion,
  * the anti-join probe + repartition exchange, and the unboxed counting pass
  * separately, several reps each, to attribute run-to-run variance (GC vs
  * exchange vs count). Usage: `sbt "runMain graft.tools.ProfileCn [reps]"`. */
object ProfileCn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.LocalDirs.shuffleDir())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    t("warm_artifact")(graft.operators.GraphOps.pairCountsPath(spark, sfDir))
    for (_ <- 1 to reps) {
      t("pre_scan")(graft.operators.GraphOps.pairCountsPre(spark, sfDir)
        .queryExecution.toRdd
        .foreachPartition(it => while (it.hasNext) it.next()))
      t("cn_query")(graft.SparkEntry.queries("graph_common_neighbors")(spark, sfDir).collect())
      t("jaccard_query")(graft.SparkEntry.queries("graph_jaccard")(spark, sfDir).collect())
    }
    spark.stop()
  }
}
