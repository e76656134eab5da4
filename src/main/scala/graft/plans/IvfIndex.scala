package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Persistent IVF (inverted-file) ANN index over an embedding table.
  *
  * Build once: assign every vector to its nearest centroid and write the
  * table *partitioned by* `cluster_id` (plus a small `centroids` table).
  * Search: pick the `nprobe` centroids nearest the query and scan only those
  * partitions — the partition filter prunes at the file-listing level, so a
  * query touches nprobe/nlist of the data no matter how large the corpus
  * (PlanSpec asserts the pruning). This is the durable version of the
  * ad-hoc `sim_search_ivf` query: pay assignment once, prune forever.
  *
  * Centroid "training" uses the first `nlist` vectors as seeds — a
  * deterministic stand-in for k-means; the index layout, assignment pass,
  * pruning and scoring are exactly what a trained index uses.
  */
object IvfIndex {

  private def asD(c: Column): Column = c.cast(ArrayType(DoubleType))
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def build(emb: DataFrame, nlist: Int, path: String): Unit = {
    // the centroid table broadcasts (assignment) and is collected at search
    // time (probe selection) — both bounded by nlist, capped here so a
    // misconfigured index can't OOM the driver or the broadcast
    require(nlist <= graft.Limits.maxDriverCentroids,
      s"nlist=$nlist exceeds driver-collect cap ${graft.Limits.maxDriverCentroids}")
    val spark = emb.sparkSession
    val cents = emb.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    // per-vector argmax by max_by with map-side partial aggregation (the
    // expanded N×nlist rows collapse to N before the exchange), not a
    // window over the expansion — see SimilarityOps.simSearchIvf
    val assigned = emb
      .crossJoin(broadcast(cents.select(col("cent_id"), asD(col("cvec")).as("cv"))))
      .withColumn("sim", dot(asD(col("embedding")), col("cv")))
      .groupBy(col("vec_id"))
      .agg(max_by(
        struct(col("label"), col("embedding"), col("cent_id")),
        struct(col("sim"), negate(col("cent_id")))).as("m"))
      .select(col("vec_id"), col("m.label").as("label"),
        col("m.embedding").as("embedding"), col("m.cent_id").as("cluster_id"))
    assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(s"$path/index")
  }

  /** Top-k by cosine for the query vector, probing `nprobe` lists. */
  def search(spark: SparkSession, path: String, queryVec: DataFrame,
      nprobe: Int, k: Int, excludeVecId: Long = -1): DataFrame = {
    // probe selection collects nprobe centroid ids to the driver (they must
    // become a literal IN-list for file-level partition pruning) — k-bounded
    require(nprobe <= graft.Limits.maxDriverCentroids,
      s"nprobe=$nprobe exceeds driver-collect cap ${graft.Limits.maxDriverCentroids}")
    val cents = ArtifactCache.readParquet(spark, s"$path/centroids")
    val probeIds = cents.crossJoin(broadcast(queryVec))
      .orderBy(dot(asD(col("cvec")), col("qv")).desc, col("cent_id"))
      .limit(nprobe)
      .select(col("cent_id"))
      .collect().map(_.getAs[Number]("cent_id").longValue())
    // literal IN-list so the partition filter prunes at file listing
    val probed = ArtifactCache.readParquet(spark, s"$path/index")
      .filter(col("cluster_id").isin(probeIds.toIndexedSeq.map(x => x: Any): _*))
    val cos = graft.functions.CosineSimilarity.cosine_similarity _
    probed
      .filter(col("vec_id") =!= excludeVecId)
      .crossJoin(broadcast(queryVec))
      .select(col("vec_id"), col("label"),
        cos(asD(col("embedding")), col("qv")).as("score_raw"))
      .orderBy(col("score_raw").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), round(col("score_raw"), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
  }
}
