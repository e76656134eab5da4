package graft.tools

import org.apache.spark.sql.SparkSession
import graft.plans.Checkpoints.SweepSyntax

/** Dev-only profiling harness: times individual queries by name so a perf
  * iteration doesn't pay for the full Bench sweep. Not part of the library
  * surface. Usage: `sbt "runMain graft.tools.ProfileDedup q1 q2 ..."`. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.LocalDirs.shuffleDir())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val names = if (args.nonEmpty) args.toSeq else Seq("dedup_minhash", "dedup_simhash")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    if (sys.env.contains("SPARK_GRAFT_STAGES")) stageProfile(spark, sfDir, reps)
    for (r <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"rep$r $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$c")
    }
    spark.stop()
  }

  /** Times the minhash pipeline stage by stage (mirrors DedupOps internals). */
  def stageProfile(spark: SparkSession, sfDir: String, reps: Int): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions.{PolyHash, WordShingles}
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"stage $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    for (_ <- 1 to reps) {
      val docsF = graft.Tables.load(spark, sfDir, "documents")
      t("scan_docs")(docsF.count())
      val banded = docsF.select(col("doc_id"),
          posexplode(graft.functions.MinHashBands.minhash_bands(
            WordShingles.word_shingles(col("text"), 3), 32, 8)).as(Seq("band", "h")))
        .select(struct(col("band"), col("h")).as("bucket"), col("doc_id"))
      t("banded")(banded.count())
      val bankedC = t("banded_checkpoint")(banded.sweepCheckpoint())
      val grouped0 = bankedC.groupBy(col("bucket"))
        .agg(graft.functions.BucketMembersAgg.bucket_members(65, col("doc_id")).as("m"))
        .select(col("bucket"), col("m._1").as("ids"), col("m._2").as("n"))
        .filter(col("n") >= 2)
      val grouped = t("grouped_udaf_ckpt")(grouped0.sweepCheckpoint())
      val small = grouped.filter(col("n") <= 64)
        .select(explode(graft.functions.LongPairs.long_pairs(col("ids"))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
      val big = bankedC
        .join(broadcast(grouped.filter(col("n") > 64)
          .select(col("bucket"), element_at(col("ids"), 1).as("anchor"))), "bucket")
        .filter(col("doc_id") =!= col("anchor"))
        .select(col("anchor").as("a"), col("doc_id").as("b"))
      val pairs0 = small.unionAll(big).distinct()
      println("cand_count=" + t("candidates")(pairs0.count()))
      val pairs = t("pairs_checkpoint")(pairs0.sweepCheckpoint())
      val ids = pairs.select(col("a").as("doc_id"))
        .unionAll(pairs.select(col("b").as("doc_id"))).distinct()
      println("ids_count=" + t("ids")(ids.count()))
      val sh = t("verify_shingle_ckpt")(docsF.join(ids, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), WordShingles.word_shingles(col("text"), 3).as("sh")).sweepCheckpoint())
      val ver = pairs
        .join(sh.select(col("doc_id").as("a"), col("sh").as("sh_a")), "a")
        .join(sh.select(col("doc_id").as("b"), col("sh").as("sh_b")), "b")
        .select(col("a"), col("b"),
          (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
           size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
      t("verify_join")(ver.count())

    }
  }
}
