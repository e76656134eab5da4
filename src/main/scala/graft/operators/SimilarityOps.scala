package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.plans.Checkpoints.SweepSyntax

/** Approximate-nearest-neighbor / similarity search over the `embeddings`
  * fixture (SURVEY.md §2C). The embedding column is `array<float>`; all math
  * is done in double via higher-order functions (`zip_with` + `aggregate`),
  * which fold sequentially — deterministic, codegen-friendly, no UDFs.
  */
object SimilarityOps {
  type Q = (SparkSession, String) => DataFrame

  private def emb(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "embeddings")
  private def asD(c: Column): Column = c.cast(ArrayType(DoubleType))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  private def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k against a query vector (the embedding of
    * vec_id 0), k=10. The query row broadcasts; the scan side never
    * shuffles — Spark's TakeOrderedAndProject does per-partition top-k then
    * a k-merge, so this is THE exact-search baseline at any scale. */
  val simSearchTopK: Q = (s, d) => {
    val k = 10
    val q = emb(s, d).filter(col("vec_id") === 0)
      .select(asD(col("embedding")).as("qv"))
    emb(s, d).filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        cosine(asD(col("embedding")), col("qv")).as("score_raw"))
      .orderBy(col("score_raw").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), round(col("score_raw"), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
  }

  /** IVF-style ANN: assign every vector to its nearest of 16 deterministic
    * centroids (the embeddings of vec_id 0..15 — a stand-in for k-means
    * training), then probe only the 4 centroid lists nearest the query.
    * The scale path: cluster assignment is one broadcast pass, the probe
    * touches nprobe/nlist of the data (partition pruning if the table is
    * written partitioned by cluster_id), and only candidate lists are
    * scored. Approximate vs. brute force, but fully deterministic — the
    * DuckDB oracle ([[ivfOracle]]) replays the exact pipeline in SQL, and
    * the spec additionally asserts recall against the brute-force baseline. */
  val simSearchIvf: Q = (s, d) => {
    val nlist = 16
    val nprobe = 4
    val k = 10
    val e = emb(s, d)
    val cents = e.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cent_id"), asD(col("embedding")).as("cv"))
    // assignment pass: nearest centroid per vector (broadcast the centroids)
    // native codegen'd dot product (bitwise-equal to the composed HOF fold)
    // — the assignment pass touches EVERY vector, so it must stay one fused
    // loop inside whole-stage codegen at corpus scale. The per-vector argmax
    // is max_by with partial aggregation, NOT a window: the broadcast
    // cross-join's nlist rows per vector collapse map-side back to one row
    // before the exchange, so the wire carries N rows — a vec_id-partitioned
    // window would shuffle and sort all N×nlist expanded rows.
    val assigned = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("embedding"), col("cent_id"),
        graft.functions.DotProduct.dot_product(asD(col("embedding")), col("cv")).as("sim"))
      .groupBy(col("vec_id"))
      .agg(max_by(
        struct(col("label"), col("embedding"), col("cent_id")),
        struct(col("sim"), negate(col("cent_id")))).as("m"))
      .select(col("vec_id"), col("m.label").as("label"),
        col("m.embedding").as("embedding"), col("m.cent_id").as("cent_id"))
    // probe list: nprobe centroids nearest the query vector
    val q = e.filter(col("vec_id") === 0).select(asD(col("embedding")).as("qv"))
    val probes = cents.crossJoin(broadcast(q))
      .orderBy(graft.functions.DotProduct.dot_product(col("cv"), col("qv")).desc, col("cent_id"))
      .limit(nprobe)
      .select(col("cent_id"))
    assigned
      .join(broadcast(probes), "cent_id") // prune to probed lists
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        graft.functions.CosineSimilarity.cosine_similarity(
          asD(col("embedding")), col("qv")).as("score_raw"))
      .orderBy(col("score_raw").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), round(col("score_raw"), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
  }

  /** Same search as [[simSearchTopK]] but scored by the native codegen'd
    * [[graft.functions.CosineSimilarity]] expression: one fused loop per row
    * instead of five interpreted array passes. Results are bitwise-identical
    * (same ops, same order) — same oracle. */
  val simSearchTopKNative: Q = (s, d) => {
    import graft.functions.CosineSimilarity.cosine_similarity
    val k = 10
    val q = emb(s, d).filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    emb(s, d).filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        cosine_similarity(col("embedding"), col("qv")).as("score_raw"))
      .orderBy(col("score_raw").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), round(col("score_raw"), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
  }

  /** Hyperplane count for [[simSearchLsh]]: 8 sign bits → 256 buckets. */
  val lshHyperplanes = 8

  /** Multiprobe Hamming radius for [[simSearchLsh]]: signatures within
    * this many bit flips of the query's bucket are candidates. */
  val lshProbeRadius = 2

  /** Shared signature pass for the LSH family: one map-side-combined
    * aggregate over the posexploded corpus producing (vec_id, label,
    * packed sign bits), checkpointed so each consumer pays it once. */
  private def lshSignatures(s: SparkSession, d: String): DataFrame = {
    import graft.functions.PolyHash.poly_hash
    def hv(p: Int): Column =
      ((poly_hash(concat(lit(s"$p:"), col("pos").cast(StringType))) % 2001L)
        .cast(DoubleType) - 1000.0d) / 1000.0d
    val projections = (0 until lshHyperplanes).map(p =>
      sum(col("val") * hv(p)).as(s"s$p"))
    emb(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(asD(col("embedding"))).as(Seq("pos", "val")))
      .groupBy(col("vec_id"), col("label"))
      .agg(projections.head, projections.tail: _*)
      .select(col("vec_id"), col("label"),
        (0 until lshHyperplanes).map(p =>
          when(round(col(s"s$p"), 6) >= 0.0d, lit(1L << p)).otherwise(lit(0L)))
          .reduce(_ + _).as("sig"))
      .sweepPin()
  }

  /** Random-hyperplane LSH ANN (SimHash for vectors, Charikar 2002): each
    * vector's signature packs the sign of its dot product with
    * [[lshHyperplanes]] deterministic pseudo-random hyperplanes (component
    * for plane p at 0-based dim i = polyhash("p:i") mapped affinely onto
    * [−1, 1] — reproducible on any engine, no RNG state); candidates are
    * vectors whose signature sits within Hamming distance
    * [[lshProbeRadius]] of the query's (multiprobe), exact-cosine-reranked
    * to the top 10. The sign threshold applies to the 6-dp-rounded
    * projection so the bucket assignment is engine-exact; `n_candidates`
    * rides every row as the probe-selectivity audit.
    *
    * This is the third ANN scale path next to IVF and PQ: no training
    * pass at all (the index is pure hashing), the right trade when the
    * corpus churns faster than a k-means fit amortizes.
    *
    * 100 TB shape: signatures are ONE map-side-combined aggregate over
    * the posexploded corpus (8 conditional sums per vector, no plane
    * table join), checkpointed so probe + query reuse it; the candidate
    * filter is a one-row broadcast against the vector-grain signature
    * frame; the rerank joins the bounded candidate set (broadcast) back
    * to the corpus scan and TakeOrders top-10. The corpus never pairs
    * with itself. */
  val simSearchLsh: Q = (s, d) => {
    import graft.functions.CosineSimilarity.cosine_similarity
    val k = 10
    val sigs = lshSignatures(s, d)
    val q = sigs.filter(col("vec_id") === 0).select(col("sig").as("qsig"))
    val cand = sigs.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .filter(bit_count(col("sig").bitwiseXOR(col("qsig"))) <= lshProbeRadius)
      .select(col("vec_id"))
    val census = cand.agg(count(lit(1)).as("n_candidates"))
    val qv = emb(s, d).filter(col("vec_id") === 0)
      .select(asD(col("embedding")).as("qv"))
    emb(s, d)
      .join(broadcast(cand), "vec_id")
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), col("label"),
        cosine_similarity(asD(col("embedding")), col("qv")).as("score_raw"))
      .orderBy(col("score_raw").desc, col("vec_id"))
      .limit(k)
      .crossJoin(broadcast(census))
      .select(col("vec_id"), col("label"),
        round(col("score_raw"), 6).as("score"), col("n_candidates"))
      .orderBy(col("score").desc, col("vec_id"))
  }

  /** Probe-budget tuning curve for [[simSearchLsh]]: for every Hamming
    * radius 0..4, the candidate-set size and the recall@10 against the
    * exact cosine top-10 — the selectivity/recall trade-off that picks
    * the production radius (the same audit [[simIvfRecall]] runs for the
    * nprobe knob). Because the rerank is exact cosine, recall@10 IS the
    * fraction of the exact top-10 whose signature falls inside the
    * radius. Counts and hits are exact integers; recall divides once.
    *
    * 100 TB shape: signatures come from the one aggregate pass
    * ([[simSearchLsh]]'s shape); the radius expansion is a 5-row
    * broadcast against the vector-grain signature frame; the exact
    * top-10 is TakeOrdered over one corpus scan and broadcasts into the
    * hit flags. */
  val simLshRecall: Q = (s, d) => {
    import graft.functions.CosineSimilarity.cosine_similarity
    val sigs = lshSignatures(s, d)
    val q = sigs.filter(col("vec_id") === 0).select(col("sig").as("qsig"))
    val qv = emb(s, d).filter(col("vec_id") === 0)
      .select(asD(col("embedding")).as("qv"))
    val top10 = emb(s, d).filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"),
        cosine_similarity(asD(col("embedding")), col("qv")).as("score_raw"))
      .orderBy(col("score_raw").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), lit(1L).as("is_top"))
    val radii = {
      import s.implicits._
      (0 to 4).map(_.toLong).toDF("radius")
    }
    sigs.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        bit_count(col("sig").bitwiseXOR(col("qsig"))).cast(LongType).as("hd"))
      .join(broadcast(top10), Seq("vec_id"), "left")
      .join(broadcast(radii), col("hd") <= col("radius"))
      .groupBy(col("radius"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(coalesce(col("is_top"), lit(0L))).as("n_top10_in"))
      .select(col("radius"), col("n_candidates"), col("n_top10_in"),
        round(col("n_top10_in").cast(DoubleType) / 10.0d, 6).as("recall_at_10"))
      .orderBy(col("radius"))
  }

  /** Query-panel size cap for [[embeddingKnnEval]]. */
  val knnEvalQueries = 128

  /** Neighbor count for [[embeddingKnnEval]]. */
  val knnEvalK = 5

  /** Leave-one-out kNN label accuracy — the standard "are these
    * embeddings any good" eval: a deterministic panel of up to
    * [[knnEvalQueries]] vectors (vec_id ≡ 0 mod 37, TakeOrdered so the
    * panel is FIXED-SIZE at any corpus scale — never a corpus-growing
    * broadcast) each predicts its label by majority vote of its
    * [[knnEvalK]] nearest neighbors (self excluded), and each label
    * reports its panel accuracy. Neighbor ranking uses the 6-dp-rounded
    * cosine (ties to lowest vec_id) so the cut is engine-exact; the
    * majority vote ties to the lexicographically first label.
    *
    * 100 TB shape: the panel broadcasts into ONE corpus scan (output =
    * N × panel rows, linear); the rank window keys on the query id; the
    * vote and accuracy aggregates ride panel-sized frames. */
  val embeddingKnnEval: Q = (s, d) => {
    import graft.functions.CosineSimilarity.cosine_similarity
    val panel = emb(s, d).filter(col("vec_id") % 37L === 0L)
      .orderBy(col("vec_id"))
      .limit(knnEvalQueries)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        asD(col("embedding")).as("qv"))
    val byQuery = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
    val neighbors = emb(s, d)
      .join(broadcast(panel), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qlabel"), col("vec_id"), col("label"),
        round(cosine_similarity(asD(col("embedding")), col("qv")), 6)
          .as("score"))
      .withColumn("rk", row_number().over(byQuery))
      .filter(col("rk") <= knnEvalK)
    val byVote = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("votes").desc, col("label"))
    val pred = neighbors.groupBy(col("qid"), col("qlabel"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(byVote))
      .filter(col("vr") === 1)
    pred.select(col("qlabel"), (col("label") === col("qlabel")).as("ok"))
      .groupBy(col("qlabel").as("label"))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_correct"))
      .select(col("label"), col("n_queries"), col("n_correct"),
        round(col("n_correct").cast(DoubleType) /
          col("n_queries").cast(DoubleType), 6).as("accuracy"))
      .orderBy(col("label"))
  }

  /** Persistent-index variant of [[simSearchIvf]]: build the partitioned IVF
    * index once, then search with partition pruning (see
    * [[graft.plans.IvfIndex]]). Same centroids/nprobe → same results as the
    * ad-hoc query (asserted in spec). */
  /** Build-or-reuse the persistent IVF index (pay-once artifact). */
  private[graft] def ivfIndexPath(s: SparkSession, d: String): String =
    graft.plans.ArtifactCache.getOrBuild("ivf", d, Seq("embeddings"),
      Seq(graft.plans.IvfIndex.getClass, SimilarityOps.getClass, Tables.getClass)) { dir =>
      graft.plans.IvfIndex.build(emb(s, d), nlist = 16, dir)
    }

  val simSearchIvfIndexed: Q = (s, d) => {
    // index build is pay-once, cached per source fingerprint (ArtifactCache):
    // the query measures the steady-state probe, as in production
    val path = ivfIndexPath(s, d)
    val q = emb(s, d).filter(col("vec_id") === 0)
      .select(asD(col("embedding")).as("qv"))
    graft.plans.IvfIndex.search(s, path, q, nprobe = 4, k = 10, excludeVecId = 0)
  }

  /** Product-quantization ANN — the memory-compressed index for
    * billion-vector scale: each 64-dim vector collapses to 8 four-bit
    * codes (one byte-pair per subspace; 8 bytes/vector vs 256 for float32,
    * a 32× shrink), and search scores the CODES against a precomputed
    * query distance table without touching the floats — the FAISS
    * `IndexPQ` / ADC (asymmetric distance computation) shape.
    *
    *  - Codebooks: per 8-dim subspace m, the 16 codewords are the
    *    subvectors of vec_id 0..15 — the same deterministic stand-in for
    *    k-means training the IVF family uses, so the full pipeline
    *    (encode → table → ADC scan → rerank) is oracle-replayable.
    *  - Encode: ONE zero-shuffle codegen pass computes all 8 codes per
    *    vector (argmin of 16 squared-L2 distances per subspace, ties to
    *    the lowest code); the codebook is a driver literal (16×64
    *    doubles — constant at any corpus size).
    *  - Search: the query's 8×16 distance table is computed on the driver
    *    and folded into the scan as literals; the approximate distance is
    *    the FIXED-ORDER sum of 8 table lookups (codegen'd, no floats from
    *    the corpus touched — at scale this pass reads ONLY the 8-byte
    *    code column, an IO-bound scan of 1/32 the data).
    *  - Rerank audit: the ADC top-10 re-scores EXACTLY against the raw
    *    vectors (10 rows, broadcast join-back) — surfacing both distances
    *    is the standard compressed-search quality report. */
  val simSearchPq: Q = (s, d) => {
    val M = 8; val K = 16; val sub = 8; val k = 10
    require(K <= graft.Limits.maxDriverCentroids,
      s"K=$K exceeds driver-collect cap ${graft.Limits.maxDriverCentroids}")
    val e = emb(s, d).select(col("vec_id"), asD(col("embedding")).as("ev"))
    val seedRows = e.filter(col("vec_id") < K).orderBy(col("vec_id")).collect()
    require(seedRows.length == K, s"need $K codebook seed vectors")
    // cb(m)(code) = 8-dim codeword; table(m)(code) = d2(query subvector, codeword)
    val cb: Seq[Seq[Seq[Double]]] = (0 until M).map(m =>
      seedRows.toSeq.map(_.getSeq[Double](1).slice(m * sub, (m + 1) * sub).toIndexedSeq))
    val qv: Seq[Double] =
      seedRows(0).getSeq[Double](1).toIndexedSeq // vec_id 0 is the query
    val table: Seq[Seq[Double]] = (0 until M).map { m =>
      val qs = qv.slice(m * sub, (m + 1) * sub)
      cb(m).map(cw => qs.zip(cw).map { case (x, y) => (x - y) * (x - y) }.sum)
    }
    // NOTE (r15): an unrolled non-HOF spelling of this argmin (K×sub
    // literal-expanded squared diffs per subvector, ~4k expression nodes)
    // was measured STRICTLY WORSE — the interpreted-HOF per-row cost is
    // small at any row count that fits one index shard, while the
    // unrolled tree cost ~3 s of optimizer time per construction. Keep
    // the lambda spelling.
    def codeCol(m: Int): Column = {
      val d2s = transform(sequence(lit(0), lit(K - 1)), kk =>
        aggregate(
          zip_with(slice(col("ev"), m * sub + 1, sub),
            element_at(typedLit(cb(m)), kk + lit(1)), (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, x) => a + x))
      // first-position argmin == lowest code on ties
      (array_position(d2s, array_min(d2s)) - 1).cast(IntegerType)
    }
    val coded = e.filter(col("vec_id") =!= 0)
      .select(Seq(col("vec_id")) ++ (0 until M).map(m => codeCol(m).as(s"c$m")): _*)
    // ADC: fixed-order (m = 0..7) sum of table lookups — the only columns
    // read are the codes
    val adc = (0 until M).map(m =>
        element_at(typedLit(table(m)), col(s"c$m") + lit(1)))
      .reduceLeft(_ + _)
    val top = coded.select(col("vec_id"), adc.as("adc_d2"))
      .orderBy(col("adc_d2"), col("vec_id"))
      .limit(k)
    val exact = aggregate(
      zip_with(col("ev"), typedLit(qv), (x, y) => (x - y) * (x - y)),
      lit(0.0), (a, x) => a + x)
    e.join(broadcast(top), Seq("vec_id"))
      .select(col("vec_id"), round(col("adc_d2"), 6).as("adc_d2"),
        round(exact, 6).as("exact_d2"))
      .orderBy(col("adc_d2"), col("vec_id"))
  }

  /** Symmetric int8 quantization per vector (scale = 127 / max|x|) — the
    * compression pass before an ANN index ships to serving: 4× smaller than
    * float32, distance error bounded by the scale. Pure per-row arithmetic,
    * no shuffle; rounding is floor(x·s + 0.5) so both engines run the exact
    * same IEEE ops (no round-half-even ambiguity). The quantized vector
    * surfaces as exact integer moments (min/max/sum) so results stay narrow
    * and the oracle is bit-exact. */
  val embeddingQuantize: Q = (s, d) =>
    emb(s, d)
      .select(col("vec_id"), asD(col("embedding")).as("ev"))
      .withColumn("maxabs", aggregate(col("ev"), lit(0.0), (a, x) => greatest(a, abs(x))))
      .filter(col("maxabs") > 0)
      .withColumn("scale", lit(127.0) / col("maxabs"))
      .withColumn("qv",
        transform(col("ev"), x => floor(x * col("scale") + lit(0.5)).cast(LongType)))
      .select(col("vec_id"), round(col("scale"), 6).as("scale"),
        array_min(col("qv")).as("qmin"),
        array_max(col("qv")).as("qmax"),
        aggregate(col("qv"), lit(0L), (a, x) => a + x).as("qsum"))
      .orderBy(col("vec_id"))

  /** Output dimensionality of [[embeddingProject]]. */
  val projectDims = 16

  /** Signed random projection (Johnson–Lindenstrauss with a ±1 matrix, per
    * Achlioptas 2003): reduce each embedding to [[projectDims]] dims with a
    * DERIVED projection matrix — sign(j,i) from integer arithmetic on the
    * (output, input) coordinate pair, so no matrix is stored, shipped, or
    * broadcast; every row recomputes its signs inside one codegen'd
    * map-side expression. The training-data uses: cheap pre-cluster keys,
    * LSH-adjacent bucketing, and bandwidth reduction before an exact
    * rerank. Arithmetic is exact end-to-end: inputs quantize to integer
    * micro-units (`floor(x·10⁶+0.5)`, the [[embeddingCentroid]] trick),
    * the signed sums run in int64 (order-free, partial-agg-proof), and the
    * ONE float division per output coordinate happens at the end — the
    * DuckDB oracle replays it bit-for-bit.
    *
    * 100 TB shape: zero shuffle — projection is embarrassingly parallel
    * per row (k·d multiply-adds inside whole-stage codegen); output is the
    * long-format (vec_id, j, y) frame downstream ops group/bucket on. */
  val embeddingProject: Q = (s, d) =>
    emb(s, d)
      .select(col("vec_id"),
        // pair each element with its index once, then fold per output dim
        zip_with(asD(col("embedding")),
          sequence(lit(0), size(col("embedding")) - 1),
          (x, i) => struct(x.as("x"), i.as("i"))).as("xi"))
      .select(col("vec_id"), posexplode(
        transform(sequence(lit(0), lit(projectDims - 1)), j =>
          aggregate(col("xi"), lit(0L), (acc, e) => {
            val q = floor(e.getField("x") * lit(1000000.0d) + lit(0.5d)).cast(LongType)
            acc + when(((j * 73 + e.getField("i") * 179) % 97) % 2 === 0, q)
              .otherwise(-q)
          }))))
      .select(col("vec_id"), col("pos").cast(IntegerType).as("j"),
        round(col("col").cast(DoubleType) / lit(1000000.0d), 6).as("y"))
      .orderBy(col("vec_id"), col("j"))

  /** Buckets per dimension for [[embeddingDrift]]'s PSI histogram. */
  val driftBuckets = 8

  /** Embedding-distribution drift monitor — the training-data QA check a
    * corpus owner runs between two snapshots (here: even vs odd vec_id —
    * a deterministic split with genuine distributional noise): per
    * DIMENSION, the Population Stability Index over [[driftBuckets]]
    * fixed buckets plus the mean shift. The industry thresholds this
    * feeds (PSI < 0.1 stable, > 0.25 drifted) need exactly this output.
    *
    * Engine-exact recipe: values quantize to integer micro-units; bucket
    * edges come from each dimension's GLOBAL min/max (broadcast
    * dim-table-sized bounds, the scalar-subquery spelling) in pure integer
    * arithmetic; counts are exact longs with +1 Laplace smoothing (no
    * empty-bucket ln(0)); the float appears in the final per-bucket
    * `(pa−pb)·ln(pa/pb)` and the mean shift — both rounded once. The ln
    * replays across engines (the [[graft.operators.TextOps]]
    * text_perplexity precedent).
    *
    * 100 TB shape: one posexplode scan; the count aggregate keys on
    * (dim, bucket, side) — dims × buckets × 2 keys regardless of corpus
    * size, fully partial-aggregated map-side; bounds and the final PSI
    * reduce over dim-table-sized frames. Zero corpus-sized shuffles. */
  val embeddingDrift: Q = (s, d) => {
    val flat = emb(s, d)
      .select(col("vec_id"), posexplode(asD(col("embedding"))).as(Seq("i", "x")))
      .select(col("vec_id"), col("i").cast(LongType).as("i"),
        floor(col("x") * lit(1000000.0d) + lit(0.5d)).cast(LongType).as("q"))
    val bounds = flat.groupBy(col("i"))
      .agg(min(col("q")).as("qmin"), max(col("q")).as("qmax"))
    val bucketed = flat.join(broadcast(bounds), "i")
      .select(col("i"), (col("vec_id") % 2 === 0).as("side_a"), col("q"),
        expr(s"(q - qmin) * $driftBuckets DIV greatest(qmax - qmin + 1, 1)")
          .as("bucket"))
    val counts = bucketed.groupBy(col("i"), col("bucket"))
      .agg(count(when(col("side_a"), lit(1))).as("ca"),
        count(when(!col("side_a"), lit(1))).as("cb"))
    val totals = bucketed.groupBy(col("i"))
      .agg(count(when(col("side_a"), lit(1))).as("na"),
        count(when(!col("side_a"), lit(1))).as("nb"),
        sum(when(col("side_a"), col("q"))).as("sa"),
        sum(when(!col("side_a"), col("q"))).as("sb"))
    val k = lit(driftBuckets.toLong)
    val pa = (col("ca") + 1L).cast(DoubleType) / (col("na") + k).cast(DoubleType)
    val pb = (col("cb") + 1L).cast(DoubleType) / (col("nb") + k).cast(DoubleType)
    counts.join(broadcast(totals), "i")
      .select(col("i"), col("na"), col("nb"), col("sa"), col("sb"),
        col("bucket"), ((pa - pb) * log(pa / pb)).as("psi_term"))
      .groupBy(col("i"), col("na"), col("nb"), col("sa"), col("sb"))
      // float sum in FIXED bucket order (collect + sorted fold): partial-
      // aggregation order cannot perturb the IEEE result, so the oracle's
      // identically-ordered fold lands bit-equal
      .agg(aggregate(
        sort_array(collect_list(struct(col("bucket"), col("psi_term")))),
        lit(0.0d), (acc, e) => acc + e.getField("psi_term")).as("psi_raw"))
      .select(col("i"),
        col("na"), col("nb"),
        round((col("sa").cast(DoubleType) / col("na").cast(DoubleType) -
          col("sb").cast(DoubleType) / col("nb").cast(DoubleType)) / lit(1000000.0d), 6)
          .as("mean_shift"),
        round(col("psi_raw"), 6).as("psi"))
      .orderBy(col("i"))
  }

  /** Lloyd's update-iteration cap for [[embeddingKmeans]]. */
  val kmeansMaxIters = 4

  /** Update iterations the LAST [[embeddingKmeans]] invocation executed
    * (≤ [[kmeansMaxIters]]; fewer when the exact fixpoint hit early) —
    * spec observability, the [[graft.plans.ArtifactCache.builds]] pattern. */
  val kmeansItersRun = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Deterministic k-means (Lloyd's algorithm) over the embeddings — the
    * corpus-organization pass in front of semantic dedup and IVF index
    * builds: k=8 clusters seeded from the embeddings of vec_id 0..7,
    * squared-L2 distance, ties to the lowest cluster id. Update iterations
    * run to convergence with an EXACT fixpoint guard: the loop stops when
    * an update reproduces the previous centroids bit-for-bit, or after
    * [[kmeansMaxIters]] updates. The guard is ε = 0 deliberately — once
    * centroids are a fixpoint, every further update is a no-op, so the
    * DuckDB oracle can replay an unconditional [[kmeansMaxIters]]
    * iterations and land on the identical result (a positive ε would stop
    * on centroids the oracle never sees). Each iteration has the MLlib
    * shape: the k×d centroid matrix is collected to the driver (k·d
    * doubles — constant size at any corpus scale, capped via
    * [[graft.Limits.maxDriverCentroids]], the same literal-rebroadcast
    * pattern as [[graft.plans.IvfIndex]]) so assignment is a ZERO-shuffle
    * whole-stage-codegen pass over the corpus, and the centroid update is
    * posexplode + partially-aggregated avg (k·d rows per partition on the
    * wire). Pure double arithmetic — the oracle replays every iteration
    * exactly (same ~1e-15 summation jitter budget as [[ivfOracle]], far
    * below the cluster separation). */
  val embeddingKmeans: Q = (s, d) =>
    kmeansAssignment(s, d)
      .select(col("vec_id"), col("label"), col("cluster"),
        round(col("dist2"), 6).as("dist2"))
      .orderBy(col("vec_id"))

  /** Converged-centroid memo: FOUR queries (kmeans, cluster_profile,
    * outliers, dedup_semantic's profile sharing) start from the same
    * Lloyd's fixpoint, and the training loop's per-iteration driver
    * collects are pure recomputation after the first run. Keyed on
    * (session, embeddings file identity) — the [[graft.Tables]] plan-cache
    * pattern — so a rewritten fixture retrains; the value is k×d doubles
    * plus the iteration count the training run took (restored on hit so
    * the spec-observability counter stays truthful). */
  private val centroidMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[Seq[Double]], Seq[Long], Int)]()

  private def embDataKey(s: SparkSession, d: String): String = {
    val f = new java.io.File(s"$d/embeddings.parquet")
    val stamp =
      if (f.isFile) s"${f.length}:${f.lastModified}"
      else Option(f.listFiles()).map(_.filter(_.isFile)
        .map(x => x.length ^ x.lastModified).sum).getOrElse(0L).toString
    s"${System.identityHashCode(s)}:${f.getCanonicalPath}:$stamp"
  }

  /** The converged Lloyd's assignment [[embeddingKmeans]] publishes, kept
    * as a reusable frame (vec_id, label, ev, dist2, cluster) so profile /
    * audit queries ([[clusterProfile]]) share one fixpoint definition. */
  private[graft] def kmeansAssignment(s: SparkSession, d: String): DataFrame = {
    val k = 8
    // Lloyd's inherently round-trips the k centroids through the driver
    // (seed collect + per-iteration centroid collect) — bounded by k, and
    // k is capped so a future config can't silently OOM the driver.
    require(k <= graft.Limits.maxDriverCentroids,
      s"k=$k exceeds driver-collect cap ${graft.Limits.maxDriverCentroids}")
    val e = emb(s, d).select(col("vec_id"), col("label"), asD(col("embedding")).as("ev"))

    // squared L2 to each centroid, in centroid-id order
    def d2Arr(cents: Seq[Seq[Double]]): Column =
      transform(sequence(lit(0), lit(cents.size - 1)), j =>
        aggregate(
          zip_with(col("ev"), element_at(typedLit(cents), j + lit(1)), (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, x) => a + x))

    // nearest centroid per row: array_min + first-position tie-break == lowest cid
    def assign(cents: Seq[Seq[Double]], cids: Seq[Long]): DataFrame =
      e.withColumn("d2s", d2Arr(cents))
        .withColumn("dist2", array_min(col("d2s")))
        .withColumn("cluster",
          element_at(typedLit(cids), array_position(col("d2s"), col("dist2")).cast(IntegerType)))
        .drop("d2s")

    val memoKey = embDataKey(s, d)
    val hit = centroidMemo.get(memoKey)
    if (hit != null) {
      kmeansItersRun.set(hit._3)
      return assign(hit._1, hit._2)
    }

    val seedRows = e.filter(col("vec_id") < k).orderBy(col("vec_id")).collect()
    var cents: Seq[Seq[Double]] = seedRows.map(_.getSeq[Double](2).toIndexedSeq).toIndexedSeq
    var cids: Seq[Long] = seedRows.map(_.getLong(0)).toIndexedSeq

    var iters = 0
    var converged = false
    while (iters < kmeansMaxIters && !converged) {
      val centRows = assign(cents, cids)
        .select(col("cluster"), posexplode(col("ev")).as(Seq("i", "x")))
        .groupBy(col("cluster"), col("i")).agg(avg(col("x")).as("cx"))
        .groupBy(col("cluster"))
        .agg(transform(array_sort(collect_list(struct(col("i"), col("cx")))),
          t => t.getField("cx")).as("cv"))
        .orderBy(col("cluster"))
        .collect()
      val newCents: Seq[Seq[Double]] = centRows.map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
      val newCids: Seq[Long] = centRows.map(_.getLong(0)).toIndexedSeq
      // exact fixpoint: this update reproduced its inputs, so every further
      // update is a no-op (see the doc comment for why ε must be 0)
      converged = newCids == cids && newCents == cents
      cents = newCents; cids = newCids
      iters += 1
    }
    kmeansItersRun.set(iters)
    centroidMemo.put(memoKey, (cents, cids, iters))

    assign(cents, cids)
  }

  /** Per-cluster corpus composition — the cluster-balance report a
    * SemDeDup/cluster-curation pass reads before setting per-cluster
    * dedup budgets: document count, language/source diversity, and size
    * totals per converged k-means cluster. The assignment is the shared
    * [[kmeansAssignment]] fixpoint (zero-shuffle scoring pass); the
    * embeddings↔documents join keys on the stable id (vec_id = doc_id in
    * the fixture's contract), one co-partitioned corpus join; the profile
    * aggregate is k-bounded. Mean derives from exact long totals with one
    * final division. */
  val clusterProfile: Q = (s, d) => {
    val a = kmeansAssignment(s, d).select(col("vec_id"), col("cluster"))
    val doc = Tables.load(s, d, "documents")
    a.join(doc, a("vec_id") === doc("doc_id"))
      .groupBy(col("cluster"))
      .agg(
        count(lit(1)).as("n_docs"),
        count_distinct(col("lang")).as("n_langs"),
        count_distinct(col("source")).as("n_sources"),
        sum(col("n_chars")).as("total_chars"))
      .select(col("cluster"), col("n_docs"), col("n_langs"), col("n_sources"),
        col("total_chars"),
        (col("total_chars").cast(DoubleType) / col("n_docs")).as("mean_chars"))
      .orderBy(col("cluster"))
  }

  /** Embedding-space outlier report — the fixture-anomaly sweep a curation
    * pass runs after clustering (mislabeled documents, encoder glitches,
    * adversarial inserts all land far from every centroid): each vector's
    * squared distance to its converged k-means centroid
    * ([[kmeansAssignment]], the shared fixpoint), flagged when it exceeds
    * 3× its cluster's mean. The comparison is integer cross-multiplied on
    * the micro-quantized distance (`floor(d²·10⁶ + 0.5)`, the
    * [[embeddingCentroid]] grid) — `d·n > 3·Σd` — so the verdict never
    * divides and both engines decide boundary rows identically. The
    * k-row cluster-stats table broadcasts; the scoring pass stays
    * zero-shuffle over the corpus. */
  val embeddingOutliers: Q = (s, d) => {
    val a = kmeansAssignment(s, d)
      .select(col("vec_id"), col("cluster"),
        floor(col("dist2") * 1000000.0d + 0.5d).cast(LongType).as("d2_micro"))
    val stats = a.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), sum(col("d2_micro")).as("sum_micro"))
    a.join(broadcast(stats), "cluster")
      .select(col("vec_id"), col("cluster"), col("d2_micro"),
        (col("d2_micro") * col("n") > col("sum_micro") * 3).as("is_outlier"))
      .orderBy(col("vec_id"))
  }

  /** Batched k-NN join: every vector in a query set gets its top-3 cosine
    * neighbors from the corpus in ONE pass. The query batch broadcasts (it is
    * always the small side), the corpus never shuffles, and the per-query
    * top-k is a window over scores — at 100 TB this is the exact-scoring
    * baseline; the bucketed path swaps the broadcast join for an LSH/IVF
    * candidate join ([[simSearchIvf]]) with identical downstream shape. */
  val simJoinKnn: Q = (s, d) => {
    import graft.functions.CosineSimilarity.cosine_similarity
    val qs = emb(s, d).filter(col("vec_id").between(1, 5))
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    emb(s, d).filter(col("vec_id") >= 16)
      .crossJoin(broadcast(qs))
      .select(col("q_id"), col("vec_id"), col("label"),
        cosine_similarity(col("embedding"), col("qv")).as("score_raw"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("score_raw").desc, col("vec_id"))))
      .filter(col("rn") <= 3)
      .select(col("q_id"), col("rn").cast(LongType).as("rn"),
        col("vec_id"), col("label"), round(col("score_raw"), 6).as("score"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Per-label centroid over fixed-point-quantized embeddings. Floating
    * means are partition-order-dependent (double addition is not
    * associative), so the pipeline quantizes each component to an exact
    * integer grid first — `floor(x·10^6 + 0.5)` on the binary64 widening of
    * the float, the same portable rounding as [[embeddingQuantize]] — and
    * sums LONGs, which associate exactly; the single final division is the
    * only float op. Shape at scale: posexplode → groupBy(label, i) is one
    * shuffle of (label, i, partial-sum) pairs with full map-side combine —
    * never a collect, never a re-window; dims × labels rows out. */
  val embeddingCentroid: Q = (s, d) =>
    emb(s, d)
      .select(col("label").cast(LongType).as("label"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("label"), (col("i") + 1).cast(LongType).as("i"),
        floor(col("x").cast(DoubleType) * 1000000.0d + 0.5d).cast(LongType).as("q"))
      .groupBy(col("label"), col("i"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("qsum"))
      .select(col("label"), col("i"), col("n"),
        (col("qsum").cast(DoubleType) / col("n")).as("mean_q"))
      .orderBy(col("label"), col("i"))

  /** Per-dimension distribution profile of the embedding corpus: n, mean,
    * variance, min, max per coordinate — the whitening/normalization audit
    * (and the drift detector's denominator) run before trusting any ANN
    * index or distance metric on a new embedding batch. All sums run on
    * the [[embeddingCentroid]] integer micro-unit grid, so the aggregation
    * is EXACT and order-free (partial-agg-proof — float sums would differ
    * run to run under Spark's nondeterministic partial-aggregate order);
    * the variance numerator n·Σq² − (Σq)² stays an exact integer in
    * DECIMAL(38) (Σq²·n exceeds int64 once the corpus passes ~10⁵ rows —
    * a certainty at scale, not an edge case), and the only float
    * arithmetic is the two output divisions, identical expression text in
    * both engines. Scale shape: ONE map-side-combined aggregate keyed by
    * dimension index — output rows = dims, zero joins, zero corpus-sized
    * intermediate. */
  val embeddingDimStats: Q = (s, d) =>
    emb(s, d)
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .select((col("i") + 1).cast(LongType).as("i"),
        floor(col("x").cast(DoubleType) * 1000000.0d + 0.5d)
          .cast(LongType).as("q"))
      .groupBy(col("i"))
      .agg(count(lit(1)).as("n"),
        sum(col("q")).as("sq"),
        sum(col("q").cast(DecimalType(38, 0)) * col("q")).as("sq2"),
        min(col("q")).as("min_q"),
        max(col("q")).as("max_q"))
      .select(col("i"), col("n"), col("min_q"), col("max_q"),
        round(col("sq").cast(DoubleType) / col("n") / lit(1000000.0d), 6)
          .as("mean"),
        round((col("sq2") * col("n") -
            col("sq").cast(DecimalType(38, 0)) * col("sq")).cast(DoubleType) /
          (col("n") * col("n")).cast(DoubleType) / lit(1.0e12), 6)
          .as("variance"))
      .orderBy(col("i"))

  /** Label-centroid similarity matrix: pairwise cosine between the mean
    * embeddings of every label pair — the class-confusability /
    * cluster-quality audit a labeled corpus review starts with. All
    * arithmetic before the final cosine is EXACT: components quantize to
    * integer micro-units (the [[embeddingCentroid]] grid), per-(label,dim)
    * sums are longs, and the scale factors cancel inside the cosine
    * (cos(qa/na, qb/nb) = cos(qa, qb)), so each pair needs just three
    * exact longs — Σ qa·qb, Σ qa², Σ qb² (all < 2^58 here) — and ONE
    * float expression both engines execute identically. Scale shape: the
    * only corpus-sized pass is the centroid aggregate (map-side partials
    * over labels×dims keys); the label×label stage is k²-bounded and
    * every join broadcasts. */
  val embeddingLabelSim: Q = (s, d) => {
    val cq = emb(s, d)
      .select(col("label").cast(LongType).as("label"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("label"), col("i"),
        floor(col("x").cast(DoubleType) * 1000000.0d + 0.5d).cast(LongType).as("q"))
      .groupBy(col("label"), col("i"))
      .agg(sum(col("q")).as("q"))
    val nrm = cq.groupBy(col("label"))
      .agg(sum(col("q") * col("q")).as("n2"))
    val a = cq.select(col("label").as("label_a"), col("i"), col("q").as("qa"))
    val b = cq.select(col("label").as("label_b"), col("i"), col("q").as("qb"))
    a.join(b, "i").filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum(col("qa") * col("qb")).as("dot"))
      .join(broadcast(nrm.select(col("label").as("label_a"), col("n2").as("na2"))), "label_a")
      .join(broadcast(nrm.select(col("label").as("label_b"), col("n2").as("nb2"))), "label_b")
      .select(col("label_a"), col("label_b"),
        round(expr(
          "dot / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE)))"), 6)
          .as("cosine"))
      .orderBy(col("label_a"), col("label_b"))
  }

  /** Semantic dedup, SemDeDup-shaped (Abbas et al. 2023, arXiv:2303.09540):
    * assign every embedding to its nearest seed centroid, then compare
    * cosine ONLY within a cluster — a document is a semantic dup if a
    * lower-id cluster-mate sits above the similarity threshold, and the
    * lowest id of each dup neighborhood survives as the representative.
    * Pairwise work is confined to clusters: at production scale k grows
    * with the corpus (N/k bounded cluster sizes), so the quadratic term
    * never sees the whole corpus — here k = 8 seed centroids matches
    * [[embeddingKmeans]]'s fixture-scale choice. Assignment is the same
    * broadcast + max_by map-side argmin as [[simSearchIvf]] (one exchange
    * of N rows); the within-cluster self-join keys on cluster id. */
  val dedupSemantic: Q = (s, d) => {
    val tau = 0.5
    val e = emb(s, d).select(col("vec_id"), asD(col("embedding")).as("ev"))
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("ev").as("cv"))
    def d2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
    val assigned = e.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("ev"), col("cent_id"), d2(col("ev"), col("cv")).as("dd"))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("ev"), col("cent_id")), struct(col("dd"), col("cent_id"))).as("m"))
      .select(col("vec_id"), col("m.ev").as("ev"), col("m.cent_id").as("cluster"))
    def cosine(a: Column, b: Column): Column = {
      val dotp = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s1, x) => s1 + x)
      val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (s1, x) => s1 + x))
      val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (s1, x) => s1 + x))
      dotp / (na * nb)
    }
    val dups = assigned.select(col("cluster"), col("vec_id").as("a"), col("ev").as("va"))
      .join(assigned.select(col("cluster"), col("vec_id").as("b"), col("ev").as("vb")), "cluster")
      .filter(col("a") < col("b"))
      .filter(cosine(col("va"), col("vb")) >= tau)
      .select(col("b")).distinct()
    assigned
      .join(dups, col("vec_id") === col("b"), "left")
      .select(col("vec_id"), col("cluster"), col("b").isNull.as("keep"))
      .orderBy(col("vec_id"))
  }

  /** Two-stage retrieval funnel: a cheap wide recall stage (cosine top-50,
    * TakeOrderedAndProject — per-partition heaps, no global sort) feeds an
    * expensive precise rerank stage (exact L2 distance, here standing in for
    * the cross-encoder a production funnel calls) that only ever sees the 50
    * candidates. The shape is what matters at scale: stage-2 cost is
    * O(candidates), independent of corpus size. */
  val simRerank: Q = (s, d) => {
    import graft.functions.CosineSimilarity.cosine_similarity
    val q = emb(s, d).filter(col("vec_id") === 0)
      .select(asD(col("embedding")).as("qv"))
    val stage1 = emb(s, d).filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"), asD(col("embedding")).as("ev"), col("qv"),
        cosine_similarity(asD(col("embedding")), col("qv")).as("recall_score"))
      .orderBy(col("recall_score").desc, col("vec_id"))
      .limit(50)
    val l2 = aggregate(zip_with(col("ev"), col("qv"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (a, x) => a + x)
    stage1
      .select(col("vec_id"), col("label"), l2.as("l2_raw"))
      .orderBy(col("l2_raw").asc, col("vec_id"))
      .limit(10)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("l2_raw").asc, col("vec_id"))))
      .select(col("rn").cast(LongType).as("rn"), col("vec_id"), col("label"),
        round(col("l2_raw"), 6).as("l2"))
      .orderBy(col("rn"))
  }

  /** ANN recall audit — the [[graft.operators.DedupOps]] `dedup_lsh_recall`
    * counterpart for similarity search: IVF top-k measured against the
    * exact brute-force top-k, THE number an index owner watches when tuning
    * nlist/nprobe. Both sides are the existing checked queries; the audit
    * is a semi-join + three counts → one row. At 100 TB the audit runs on a
    * sampled query set, shape unchanged. */
  val simIvfRecall: Q = (s, d) => {
    val exact = simSearchTopK(s, d).select(col("vec_id"))
    val approx = simSearchIvf(s, d).select(col("vec_id"))
    val found = exact.join(approx, Seq("vec_id"), "left_semi")
    exact.agg(count(lit(1)).as("n_exact")).crossJoin(
      approx.agg(count(lit(1)).as("n_ivf"))).crossJoin(
      found.agg(count(lit(1)).as("n_found")))
      .select(col("n_exact"), col("n_ivf"), col("n_found"),
        (col("n_found").cast(DoubleType) / col("n_exact")).as("recall"))
  }

  /** Matryoshka truncation: score with only the FIRST [[mrlTruncDim]] of
    * the 64 dimensions. */
  val mrlTruncDim = 16

  /** Matryoshka-truncation recall audit: exact cosine top-k using only the
    * first [[mrlTruncDim]] dimensions vs the full-dimension exact top-k —
    * the evaluation behind MRL-style dimension-adaptive retrieval
    * (Kusupati et al. 2022): if prefix-truncated recall holds, the fleet
    * serves the short vectors (4× less memory bandwidth here) and reranks
    * the shortlist at full width. Same one-row-out recall shape as
    * [[simIvfRecall]]; the truncated scan slices the array column map-side
    * (no second storage pass at this width — a production pipeline stores
    * the prefix column separately and this audit decides whether it can).
    * Both top-k selections are TakeOrdered k-merges over a broadcast query
    * row; nothing shuffles. */
  val embeddingMrlRecall: Q = (s, d) => {
    val k = 10
    val full = simSearchTopK(s, d).select(col("vec_id"))
    val q = emb(s, d).filter(col("vec_id") === 0)
      .select(slice(asD(col("embedding")), 1, mrlTruncDim).as("qv"))
    val trunc = emb(s, d).filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        cosine(slice(asD(col("embedding")), 1, mrlTruncDim), col("qv"))
          .as("score_raw"))
      .orderBy(col("score_raw").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"))
    val found = full.join(trunc, Seq("vec_id"), "left_semi")
    full.agg(count(lit(1)).as("n_full")).crossJoin(
      trunc.agg(count(lit(1)).as("n_trunc"))).crossJoin(
      found.agg(count(lit(1)).as("n_found")))
      .select(col("n_full"), col("n_trunc"), col("n_found"),
        (col("n_found").cast(DoubleType) / col("n_full")).as("recall"))
  }

  val pcaDims = 64
  val pcaIters = 4
  val pcaScale = 1000000L
  private val pcaCovDiv = 100000000L // covariance down-scale: keeps sweeps in int64

  /** Top principal direction of the embedding cloud — the dimensionality
    * diagnostic a pipeline runs before projection/quantization decisions
    * (is the cloud near-isotropic, or does one direction dominate?).
    * Exact-arithmetic power iteration: vectors quantize to integer
    * micro-units; the d(d+1)/2 second-moment sums accumulate in
    * DECIMAL(38,0) (exact, associative — safe under any partitioning);
    * the centered covariance scales down by `n · 10^8` with truncated
    * integer division (verified identical between Spark DECIMAL `DIV` and
    * DuckDB HUGEINT `//`) into plain int64; then [[pcaIters]] L∞-rescaled
    * power sweeps ([[graft.operators.GraphOps.graphEigencentrality]]'s
    * integer normalization) run over the d×d matrix — on the driver here
    * (d² = 4096 longs, the bounded-scalar posture of the kmeans seeds,
    * require()d against [[graft.Limits.maxDriverCentroids]]), as unrolled
    * CTEs in the oracle; both are the same int64 ops, so the replay is
    * bit-for-bit.
    *
    * 100 TB shape: ONE corpus scan — the d²/2 per-row products expand
    * map-side inside a single higher-order transform (no row duplication
    * carrying the vector) straight into a 2 080-key partial aggregate; the
    * exchange moves #partitions × 2 080 partial sums, never rows. The
    * iteration input is d×d regardless of corpus size. */
  /** Per-partition chunk size for the moment accumulators: |q_i·q_j| ≤
    * 10¹², so 4M rows per chunk keeps every long sum under 2^62 — chunks
    * combine exactly in BigInt on the driver (#chunks = n / 4M rows of
    * d²/2 longs — bounded at any corpus size). */
  private val pcaChunkRows = 4000000L

  val embeddingPcaTop: Q = (s, d) => {
    require(pcaDims * pcaDims <= 4 * graft.Limits.maxDriverCentroids,
      "PCA matrix exceeds the bounded driver-collect budget")
    import s.implicits._
    val nm = pcaDims * (pcaDims + 1) / 2
    // ONE corpus scan: the d²/2 multiply-adds run fused in a primitive
    // per-partition accumulator (the hashCountTopK convention — the
    // explode + 2080-key hash-aggregate spelling of the same sums paid
    // ~10× in row materialization: 3.45 s vs ~0.4 s at sf0.1)
    val parts = emb(s, d).select(
        transform(asD(col("embedding")),
          x => floor(x * lit(1000000.0d) + lit(0.5d)).cast(LongType)).as("qv"))
      .as[Array[Long]]
      .mapPartitions { it =>
        val dd = pcaDims
        val out = collection.mutable.ArrayBuffer.empty[(Long, Array[Long], Array[Long])]
        var s2 = new Array[Long](nm); var m1 = new Array[Long](dd); var cnt = 0L
        def flush(): Unit = if (cnt > 0) {
          out += ((cnt, m1, s2))
          s2 = new Array[Long](nm); m1 = new Array[Long](dd); cnt = 0L
        }
        while (it.hasNext) {
          val q = it.next()
          require(q.length == dd, s"embedding dim ${q.length} != expected $dd")
          var i = 0; var k = 0
          while (i < dd) {
            val qi = q(i); m1(i) += qi
            var j = i
            while (j < dd) { s2(k) += qi * q(j); j += 1; k += 1 }
            i += 1
          }
          cnt += 1
          if (cnt == pcaChunkRows) flush()
        }
        flush()
        out.iterator
      }.toDF("cnt", "m1", "s2").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2)))
    val n = parts.map(_._1).sum
    require(n > 0, "no embeddings")
    val m = Array.fill(pcaDims)(BigInt(0))
    val s2 = Array.fill(nm)(BigInt(0))
    parts.foreach { case (_, mm, ss) =>
      var i = 0; while (i < pcaDims) { m(i) += mm(i); i += 1 }
      var k = 0; while (k < nm) { s2(k) += ss(k); k += 1 }
    }
    // centered covariance scaled into int64 — BigInt `/` truncates toward
    // zero, the same contract as Spark DECIMAL DIV and DuckDB HUGEINT //
    val cm = Array.ofDim[Long](pcaDims, pcaDims)
    val div = BigInt(n) * BigInt(pcaCovDiv)
    var k = 0
    for (i <- 0 until pcaDims; j <- i until pcaDims) {
      val c = ((BigInt(n) * s2(k) - m(i) * m(j)) / div).toLong
      cm(i)(j) = c; cm(j)(i) = c
      k += 1
    }
    var v = Array.fill(pcaDims)(pcaScale)
    for (_ <- 1 to pcaIters) {
      val w = Array.tabulate(pcaDims) { i =>
        var acc = 0L
        var j = 0
        while (j < pcaDims) { acc += cm(i)(j) * v(j); j += 1 }
        acc
      }
      val dv = math.max(w.map(math.abs).max / pcaScale, 1L)
      v = w.map(_ / dv) // Long './' truncates toward zero = both engines' DIV
    }
    val top = (0 until pcaDims).map(i => (i.toLong, v(i)))
      .sortBy { case (i, l) => (-math.abs(l), i) }.take(8)
      .zipWithIndex.map { case ((dim, l), k) => (k + 1L, dim, l) }
    import s.implicits._
    top.toDF("rk", "dim", "loading_scaled")
      .select(col("rk"), col("dim"), col("loading_scaled"),
        round(col("loading_scaled").cast(DoubleType) / lit(pcaScale.toDouble), 6)
          .as("loading"))
      .orderBy(col("rk"))
  }

  /** Cutoffs probed by [[simRecallCurve]]. */
  val recallCurveKs = Seq(1, 3, 5, 10)

  /** Recall@k CURVE of the IVF probe against the exact scan, k ∈
    * {1, 3, 5, 10} — the standard ANN evaluation readout
    * ([[simIvfRecall]] gives the k = 10 point; the curve shows WHERE the
    * probe starts missing: a recall@1 miss means the probe skipped the
    * true nearest's list, far worse news than a tail miss at k = 10).
    * Both lists re-rank by the same (rounded score, id) order their
    * queries publish, so the curve is deterministic; recall@k =
    * |exact@k ∩ ivf@k| / k with one float division per k.
    *
    * 100 TB shape: both retrieval legs are the existing pay-as-designed
    * pipelines (TakeOrdered exact scan; broadcast-pruned IVF probe); the
    * curve logic itself joins two k-row lists and crosses a 4-row
    * cutoff frame — audit-sized, corpus-free. */
  val simRecallCurve: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
    val rw = w.orderBy(col("score").desc, col("vec_id")) // 10-row frames
    val exact = simSearchTopK(s, d)
      .select(col("vec_id"), row_number().over(rw).as("rn_e"))
    val ivf = simSearchIvf(s, d)
      .select(col("vec_id"), row_number().over(rw).as("rn_i"))
    val both = exact.join(ivf, Seq("vec_id"))
    import s.implicits._
    recallCurveKs.toDF("k").select(col("k").cast(LongType).as("k"))
      .join(broadcast(both), lit(true), "left")
      .groupBy(col("k"))
      .agg(sum(when(col("rn_e") <= col("k") && col("rn_i") <= col("k"), 1L)
        .otherwise(0L)).as("n_hit"))
      .select(col("k"), col("n_hit"),
        round(col("n_hit").cast(DoubleType) / col("k").cast(DoubleType), 6)
          .as("recall"))
      .orderBy(col("k"))
  }

  /** Query-sample size / neighborhood size for [[embeddingHubness]]. */
  val hubnessQueries = 64
  val hubnessK = 10

  /** Hubness audit of the embedding space: the k-occurrence distribution
    * N_k (Radovanović et al. 2010) — for a [[hubnessQueries]]-point query
    * sample, how many times each corpus point lands in a query's
    * top-[[hubnessK]] cosine neighborhood. High-dimensional spaces grow
    * "hubs" (points in everyone's neighbor list) and "antihubs" (k_occ =
    * 0); a skewed N_k histogram is the classic warning that cosine
    * retrieval quality will be uneven — checked before trusting any
    * dedup_semantic / sim_search verdict on a new embedding batch.
    * Output: (k_occ, n_points) histogram including the antihub 0-row.
    *
    * 100 TB shape: the query sample broadcasts (requires ≪ driver-safe
    * [[graft.Limits.maxDriverCentroids]]-scale rows, enforced by the
    * `vec_id` range filter); the corpus scans ONCE, scoring |Q| bounded
    * probes per row map-side; the per-query top-k is a window partitioned
    * by query over the Q×k-bounded candidate frame; k_occ counts and the
    * zero-fill join exchange corpus-id-sized keys only. Work is linear in
    * the corpus — the all-pairs N² hubness census is exactly what this
    * audit avoids. */
  val embeddingHubness: Q = (s, d) => {
    import graft.functions.CosineSimilarity.cosine_similarity
    val qs = emb(s, d).filter(col("vec_id").between(1, hubnessQueries))
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val kocc = emb(s, d)
      .crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosine_similarity(col("embedding"), col("qv")).as("score"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("score").desc, col("vec_id"))))
      .filter(col("rn") <= hubnessK)
      .groupBy(col("vec_id")).agg(count(lit(1)).as("k_occ"))
    emb(s, d).select(col("vec_id"))
      .join(broadcast(kocc), Seq("vec_id"), "left")
      .select(coalesce(col("k_occ"), lit(0L)).as("k_occ"))
      .groupBy(col("k_occ")).agg(count(lit(1)).as("n_points"))
      .orderBy(col("k_occ"))
  }

  val queries: Map[String, Q] = Map(
    "sim_recall_curve" -> simRecallCurve,
    "embedding_hubness" -> embeddingHubness,
    "embedding_pca_top" -> embeddingPcaTop,
    "sim_search_pq" -> simSearchPq,
    "sim_ivf_recall" -> simIvfRecall,
    "embedding_mrl_recall" -> embeddingMrlRecall,
    "sim_rerank" -> simRerank,
    "dedup_semantic" -> dedupSemantic,
    "embedding_centroid" -> embeddingCentroid,
    "embedding_dim_stats" -> embeddingDimStats,
    "embedding_label_sim" -> embeddingLabelSim,
    "embedding_drift" -> embeddingDrift,
    "embedding_project" -> embeddingProject,
    "embedding_quantize" -> embeddingQuantize,
    "embedding_kmeans" -> embeddingKmeans,
    "cluster_profile" -> clusterProfile,
    "embedding_outliers" -> embeddingOutliers,
    "sim_join_knn" -> simJoinKnn,
    "sim_search_topk" -> simSearchTopK,
    "sim_search_topk_native" -> simSearchTopKNative,
    "sim_search_ivf" -> simSearchIvf,
    "sim_search_ivf_indexed" -> simSearchIvfIndexed,
    "sim_search_lsh" -> simSearchLsh,
    "sim_lsh_recall" -> simLshRecall,
    "embedding_knn_eval" -> embeddingKnnEval,
  )

  /** Generated [[kmeansMaxIters]]-iteration replay of [[embeddingKmeans]]:
    * an unconditional chain of assign/update CTE pairs. The Spark side may
    * stop early, but only at an EXACT fixpoint, where the oracle's surplus
    * iterations are no-ops — so both engines land on the same assignment
    * (see the ε = 0 rationale on [[embeddingKmeans]]). */
  private def kmeansOracle: String = {
    val sb = new StringBuilder
    sb ++=
      """WITH flat AS (
           SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS val,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings),
         c0 AS (SELECT vec_id AS cid, val AS cval, i FROM flat WHERE vec_id < 8)"""
    for (n <- 1 to kmeansMaxIters) {
      sb ++= s""",
         d$n AS (
           SELECT f.vec_id, s.cid, SUM((f.val - s.cval) * (f.val - s.cval)) AS d2
           FROM flat f JOIN c${n - 1} s ON f.i = s.i GROUP BY f.vec_id, s.cid),
         a$n AS (
           SELECT vec_id, cid FROM (
             SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
             FROM d$n) WHERE rn = 1),
         c$n AS (
           SELECT a.cid, f.i, AVG(f.val) AS cval
           FROM a$n a JOIN flat f ON a.vec_id = f.vec_id
           GROUP BY a.cid, f.i)"""
    }
    sb ++= s""",
         df AS (
           SELECT f.vec_id, c.cid, SUM((f.val - c.cval) * (f.val - c.cval)) AS d2
           FROM flat f JOIN c$kmeansMaxIters c ON f.i = c.i GROUP BY f.vec_id, c.cid),
         af AS (
           SELECT vec_id, cid, d2 FROM (
             SELECT vec_id, cid, d2,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
             FROM df) WHERE rn = 1)
         SELECT a.vec_id, e.label, a.cid AS cluster, ROUND(a.d2, 6) AS dist2
         FROM af a JOIN embeddings e ON a.vec_id = e.vec_id
         ORDER BY a.vec_id"""
    sb.toString
  }

  /** [[kmeansOracle]] with its final select swapped for the per-cluster
    * corpus profile: same generated assignment CTEs (the shared-fixpoint
    * contract [[clusterProfile]] relies on), joined to `documents` on the
    * stable id. */
  private def clusterProfileOracle: String = {
    val base = kmeansOracle
    val cut = base.lastIndexOf("SELECT a.vec_id")
    base.substring(0, cut) +
      """SELECT a.cid AS cluster, COUNT(*) AS n_docs,
           COUNT(DISTINCT d.lang) AS n_langs,
           COUNT(DISTINCT d.source) AS n_sources,
           CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(d.n_chars) AS DOUBLE) / COUNT(*) AS mean_chars
         FROM af a JOIN documents d ON a.vec_id = d.doc_id
         GROUP BY a.cid ORDER BY cluster"""
  }

  /** [[kmeansOracle]] with its final select swapped for the outlier
    * verdict: micro-quantize the converged assignment's d², per-cluster
    * stats, integer cross-multiplied flag — the identical arithmetic as
    * [[embeddingOutliers]]. */
  private def embeddingOutliersOracle: String = {
    val base = kmeansOracle
    val cut = base.lastIndexOf("SELECT a.vec_id")
    base.substring(0, cut) +
      """, m AS (
           SELECT vec_id, cid AS cluster,
             CAST(floor(d2 * 1000000 + 0.5) AS BIGINT) AS d2_micro
           FROM af),
         st AS (
           SELECT cluster, COUNT(*) AS n,
             CAST(SUM(d2_micro) AS BIGINT) AS sum_micro
           FROM m GROUP BY cluster)
         SELECT m.vec_id, m.cluster, m.d2_micro,
           (m.d2_micro * st.n > st.sum_micro * 3) AS is_outlier
         FROM m JOIN st ON m.cluster = st.cluster
         ORDER BY m.vec_id"""
  }

  /** Oracle for the exact variant; DuckDB computes the same double-precision
    * dot/norm via UNNEST + per-index products summed in index order. */
  private val topkOracle: String =
      """WITH q AS (
           SELECT u.val AS qv, u.i AS i FROM (
             SELECT unnest(embedding) AS val,
                    generate_subscripts(embedding, 1) AS i
             FROM embeddings WHERE vec_id = 0) u),
         flat AS (
           SELECT vec_id, label, unnest(embedding) AS val,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings WHERE vec_id <> 0),
         scored AS (
           SELECT f.vec_id, f.label,
             SUM(CAST(f.val AS DOUBLE) * CAST(q.qv AS DOUBLE)) /
             (SQRT(SUM(CAST(f.val AS DOUBLE) * CAST(f.val AS DOUBLE))) *
              SQRT(SUM(CAST(q.qv AS DOUBLE) * CAST(q.qv AS DOUBLE)))) AS score_raw
           FROM flat f JOIN q ON f.i = q.i
           GROUP BY f.vec_id, f.label)
         SELECT vec_id, label, ROUND(score_raw, 6) AS score
         FROM (SELECT * FROM scored ORDER BY score_raw DESC, vec_id LIMIT 10)
         ORDER BY score DESC, vec_id"""

  /** LSH oracle: replays [[simSearchLsh]] end to end — hyperplane values
    * from the portable polyhash, sign buckets on the 6-dp-rounded
    * projection, Hamming-radius multiprobe, exact-cosine rerank. Raw
    * double projection sums may differ between engines at ~1e-15; the
    * 6-dp rounding before the sign test absorbs that (same argument as
    * [[ivfOracle]]'s scoring). */
  private def lshOracle: String = {
    // the dim column is named `dim`, not `i`: duckSql's list comprehension
    // binds its own loop variable `i`, which would shadow an outer column
    // of that name inside the hash-input expression
    val hash = graft.functions.PolyHash.duckSql(
      "CAST(p AS VARCHAR) || ':' || CAST(dim - 1 AS VARCHAR)")
    s"""WITH flat AS (
         SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS val,
                generate_subscripts(embedding, 1) AS i
         FROM embeddings),
       hp AS (
         SELECT p, dim, (($hash % 2001) - 1000) / 1000.0 AS hv
         FROM (SELECT unnest(generate_series(0, ${lshHyperplanes - 1})) AS p)
         CROSS JOIN (SELECT DISTINCT i AS dim FROM flat) di),
       su AS (
         SELECT f.vec_id, f.label, h.p, SUM(f.val * h.hv) AS sp
         FROM flat f JOIN hp h ON h.dim = f.i
         GROUP BY 1, 2, 3),
       sigs AS (
         SELECT vec_id, label,
           CAST(SUM(CASE WHEN round(sp, 6) >= 0 THEN 1 << p ELSE 0 END)
             AS BIGINT) AS sig
         FROM su GROUP BY 1, 2),
       qs AS (SELECT sig AS qsig FROM sigs WHERE vec_id = 0),
       cand AS (
         SELECT s.vec_id FROM sigs s CROSS JOIN qs
         WHERE s.vec_id <> 0
           AND bit_count(xor(s.sig, qs.qsig)) <= $lshProbeRadius),
       census AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cand),
       q AS (
         SELECT CAST(unnest(embedding) AS DOUBLE) AS qv,
                generate_subscripts(embedding, 1) AS i
         FROM embeddings WHERE vec_id = 0),
       scored AS (
         SELECT f.vec_id, f.label,
           SUM(f.val * q.qv) /
           (SQRT(SUM(f.val * f.val)) * SQRT(SUM(q.qv * q.qv))) AS score_raw
         FROM flat f JOIN q ON f.i = q.i
         WHERE f.vec_id IN (SELECT vec_id FROM cand)
         GROUP BY f.vec_id, f.label)
       SELECT vec_id, label, ROUND(score_raw, 6) AS score, n_candidates
       FROM (SELECT * FROM scored ORDER BY score_raw DESC, vec_id LIMIT 10)
       CROSS JOIN census
       ORDER BY score DESC, vec_id"""
  }

  /** Recall-curve oracle: [[lshOracle]]'s signature pipeline, the exact
    * top-10 from [[topkOracle]]'s scoring, and a 5-row radius table. */
  private def lshRecallOracle: String = {
    val hash = graft.functions.PolyHash.duckSql(
      "CAST(p AS VARCHAR) || ':' || CAST(dim - 1 AS VARCHAR)")
    s"""WITH flat AS (
         SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS val,
                generate_subscripts(embedding, 1) AS i
         FROM embeddings),
       hp AS (
         SELECT p, dim, (($hash % 2001) - 1000) / 1000.0 AS hv
         FROM (SELECT unnest(generate_series(0, ${lshHyperplanes - 1})) AS p)
         CROSS JOIN (SELECT DISTINCT i AS dim FROM flat) di),
       su AS (
         SELECT f.vec_id, h.p, SUM(f.val * h.hv) AS sp
         FROM flat f JOIN hp h ON h.dim = f.i
         GROUP BY 1, 2),
       sigs AS (
         SELECT vec_id,
           CAST(SUM(CASE WHEN round(sp, 6) >= 0 THEN 1 << p ELSE 0 END)
             AS BIGINT) AS sig
         FROM su GROUP BY 1),
       qs AS (SELECT sig AS qsig FROM sigs WHERE vec_id = 0),
       q AS (
         SELECT CAST(unnest(embedding) AS DOUBLE) AS qv,
                generate_subscripts(embedding, 1) AS i
         FROM embeddings WHERE vec_id = 0),
       scored AS (
         SELECT f.vec_id,
           SUM(f.val * q.qv) /
           (SQRT(SUM(f.val * f.val)) * SQRT(SUM(q.qv * q.qv))) AS score_raw
         FROM flat f JOIN q ON f.i = q.i
         WHERE f.vec_id <> 0
         GROUP BY f.vec_id),
       top10 AS (
         SELECT vec_id, CAST(1 AS BIGINT) AS is_top
         FROM (SELECT vec_id FROM scored ORDER BY score_raw DESC, vec_id
               LIMIT 10)),
       hd AS (
         SELECT s.vec_id,
           CAST(bit_count(xor(s.sig, qs.qsig)) AS BIGINT) AS hd,
           COALESCE(t.is_top, 0) AS is_top
         FROM sigs s CROSS JOIN qs
         LEFT JOIN top10 t USING (vec_id)
         WHERE s.vec_id <> 0),
       radii AS (SELECT CAST(unnest(generate_series(0, 4)) AS BIGINT)
                   AS radius)
       SELECT r.radius, CAST(COUNT(*) AS BIGINT) AS n_candidates,
         CAST(SUM(h.is_top) AS BIGINT) AS n_top10_in,
         round(CAST(SUM(h.is_top) AS DOUBLE) / 10.0, 6) AS recall_at_10
       FROM hd h JOIN radii r ON h.hd <= r.radius
       GROUP BY r.radius ORDER BY r.radius"""
  }

  /** kNN-eval oracle: full panel × corpus rerank in SQL; ranking on the
    * 6-dp-rounded cosine makes the k-cut engine-exact. */
  private def knnEvalOracle: String =
    s"""WITH panel AS (
         SELECT vec_id AS qid, label AS qlabel, embedding AS qe
         FROM embeddings WHERE vec_id % 37 = 0
         ORDER BY vec_id LIMIT $knnEvalQueries),
       qf AS (
         SELECT qid, qlabel, CAST(unnest(qe) AS DOUBLE) AS qv,
                generate_subscripts(qe, 1) AS i
         FROM panel),
       flat AS (
         SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS val,
                generate_subscripts(embedding, 1) AS i
         FROM embeddings),
       scored AS (
         SELECT q.qid, q.qlabel, f.vec_id, f.label,
           round(SUM(f.val * q.qv) /
             (SQRT(SUM(f.val * f.val)) * SQRT(SUM(q.qv * q.qv))), 6)
             AS score
         FROM flat f JOIN qf q ON f.i = q.i
         WHERE f.vec_id <> q.qid
         GROUP BY 1, 2, 3, 4),
       nn AS (
         SELECT * FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
             ORDER BY score DESC, vec_id) AS rk FROM scored)
         WHERE rk <= $knnEvalK),
       votes AS (
         SELECT qid, qlabel, label, COUNT(*) AS votes
         FROM nn GROUP BY 1, 2, 3),
       pred AS (
         SELECT qid, qlabel, label AS plabel FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
             ORDER BY votes DESC, label) AS vr FROM votes)
         WHERE vr = 1)
       SELECT qlabel AS label, CAST(COUNT(*) AS BIGINT) AS n_queries,
         CAST(SUM(CASE WHEN plabel = qlabel THEN 1 ELSE 0 END) AS BIGINT)
           AS n_correct,
         round(CAST(SUM(CASE WHEN plabel = qlabel THEN 1 ELSE 0 END)
             AS DOUBLE) / COUNT(*), 6) AS accuracy
       FROM pred GROUP BY qlabel ORDER BY label"""

  /** IVF oracle: replays the whole deterministic pipeline in SQL — centroid
    * assignment (argmax dot, ties to lowest cent_id), nprobe probe selection,
    * candidate scoring — since nothing in it involves engine-specific
    * hashing. Selection runs on raw doubles like the Spark side; the ~1e-15
    * summation-order jitter between engines is far below both the ranking
    * gaps and the 6-decimal rounding of the output. */
  private val ivfOracle: String =
      """WITH qv AS (
           SELECT u.i, CAST(u.val AS DOUBLE) AS qv FROM (
             SELECT unnest(embedding) AS val,
                    generate_subscripts(embedding, 1) AS i
             FROM embeddings WHERE vec_id = 0) u),
         flat AS (
           SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS val,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings),
         cents AS (
           SELECT vec_id AS cent_id, val AS cval, i FROM flat WHERE vec_id < 16),
         assign_sim AS (
           SELECT f.vec_id, c.cent_id, SUM(f.val * c.cval) AS sim
           FROM flat f JOIN cents c ON f.i = c.i
           GROUP BY f.vec_id, c.cent_id),
         assigned AS (
           SELECT vec_id, cent_id FROM (
             SELECT vec_id, cent_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cent_id) AS rn
             FROM assign_sim) WHERE rn = 1),
         probes AS (
           SELECT c.cent_id FROM cents c JOIN qv q ON c.i = q.i
           GROUP BY c.cent_id
           ORDER BY SUM(c.cval * q.qv) DESC, c.cent_id LIMIT 4),
         scored AS (
           SELECT f.vec_id, f.label,
             SUM(f.val * q.qv) /
             (SQRT(SUM(f.val * f.val)) * SQRT(SUM(q.qv * q.qv))) AS score_raw
           FROM flat f JOIN qv q ON f.i = q.i
           WHERE f.vec_id <> 0 AND f.vec_id IN (
             SELECT a.vec_id FROM assigned a JOIN probes p ON a.cent_id = p.cent_id)
           GROUP BY f.vec_id, f.label),
         topk AS (
           SELECT vec_id, label, score_raw FROM scored
           ORDER BY score_raw DESC, vec_id LIMIT 10)
         SELECT vec_id, label, ROUND(score_raw, 6) AS score
         FROM topk ORDER BY score DESC, vec_id"""

  val oracle: Map[String, String] = Map(
    "embedding_hubness" ->
      s"""WITH flat AS (
           SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS val,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings),
         qs AS (SELECT vec_id AS q_id, val AS qv, i FROM flat
                WHERE vec_id BETWEEN 1 AND $hubnessQueries),
         scored AS (
           SELECT q.q_id, f.vec_id,
             SUM(f.val * q.qv) /
             (SQRT(SUM(f.val * f.val)) * SQRT(SUM(q.qv * q.qv))) AS score
           FROM flat f JOIN qs q ON f.i = q.i AND f.vec_id != q.q_id
           GROUP BY q.q_id, f.vec_id),
         top AS (SELECT q_id, vec_id FROM (
             SELECT q_id, vec_id, ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY score DESC, vec_id) AS rn
             FROM scored) WHERE rn <= $hubnessK),
         kocc AS (SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS k_occ
                  FROM top GROUP BY vec_id)
         SELECT COALESCE(k.k_occ, 0) AS k_occ,
           CAST(COUNT(*) AS BIGINT) AS n_points
         FROM (SELECT DISTINCT vec_id FROM embeddings) e
         LEFT JOIN kocc k USING (vec_id)
         GROUP BY 1 ORDER BY 1""",
    "embedding_pca_top" -> {
      // the engine's driver-side int64 power sweeps, unrolled (the
      // eigencentrality convention): identical truncated divisions, so the
      // replay is bit-for-bit
      val sweeps = (1 to pcaIters).map { t =>
        val p = t - 1
        s"""w$t AS (SELECT cm.i, CAST(SUM(cm.c * v.r) AS BIGINT) AS w
             FROM cm JOIN v$p v ON v.i = cm.j GROUP BY cm.i),
           x$t AS (SELECT GREATEST(MAX(abs(w)) // $pcaScale, 1) AS dv FROM w$t),
           v$t AS (SELECT i, w // (SELECT dv FROM x$t) AS r FROM w$t)"""
      }.mkString(",\n")
      s"""WITH q AS (
           SELECT [CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
                   FOR x IN embedding] AS qv
           FROM embeddings),
         nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM q),
         mom AS (SELECT r1.i AS i, r2.i AS j,
                   CAST(SUM(qv[r1.i + 1] * qv[r2.i + 1]) AS HUGEINT) AS s
                 FROM q, range($pcaDims) r1(i), range($pcaDims) r2(i)
                 WHERE r1.i <= r2.i GROUP BY r1.i, r2.i),
         mv AS (SELECT r.i AS i, CAST(SUM(qv[r.i + 1]) AS HUGEINT) AS m
                FROM q, range($pcaDims) r(i) GROUP BY r.i),
         ch AS (SELECT mom.i, mom.j,
                  CAST((n.n * mom.s - mi.m * mj.m) // (n.n * $pcaCovDiv)
                       AS BIGINT) AS c
                FROM mom, nn n, mv mi, mv mj
                WHERE mi.i = mom.i AND mj.i = mom.j),
         cm AS (SELECT i, j, c FROM ch
                UNION ALL SELECT j, i, c FROM ch WHERE i != j),
         v0 AS (SELECT r.i AS i, CAST($pcaScale AS BIGINT) AS r
                FROM range($pcaDims) r(i)),
         $sweeps
         SELECT CAST(ROW_NUMBER() OVER (ORDER BY abs(r) DESC, i) AS BIGINT)
             AS rk,
           CAST(i AS BIGINT) AS dim, r AS loading_scaled,
           round(CAST(r AS DOUBLE) / $pcaScale.0, 6) AS loading
         FROM v$pcaIters
         ORDER BY abs(r) DESC, i LIMIT 8"""
    },
    "embedding_centroid" ->
      """SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS i,
             COUNT(*) AS n,
             CAST(SUM(q) AS DOUBLE) / COUNT(*) AS mean_q
         FROM (
           SELECT label,
                  generate_subscripts(embedding, 1) AS i,
                  CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS q
           FROM embeddings)
         GROUP BY label, i ORDER BY label, i""",
    "embedding_dim_stats" ->
      """SELECT CAST(i AS BIGINT) AS i, COUNT(*) AS n,
           MIN(q) AS min_q, MAX(q) AS max_q,
           round(CAST(SUM(q) AS DOUBLE) / COUNT(*) / 1000000.0, 6) AS mean,
           round(CAST(SUM(CAST(q AS HUGEINT) * q) * COUNT(*)
                      - CAST(SUM(q) AS HUGEINT) * SUM(q) AS DOUBLE)
                 / CAST(COUNT(*) * COUNT(*) AS DOUBLE) / 1e12, 6) AS variance
         FROM (
           SELECT generate_subscripts(embedding, 1) AS i,
                  CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
                    AS BIGINT) AS q
           FROM embeddings)
         GROUP BY i ORDER BY i""",
    "embedding_label_sim" ->
      """WITH q AS (
           SELECT CAST(label AS BIGINT) AS label, i, CAST(SUM(q) AS BIGINT) AS q
           FROM (
             SELECT label,
                    generate_subscripts(embedding, 1) AS i,
                    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
                      AS BIGINT) AS q
             FROM embeddings)
           GROUP BY label, i),
         nrm AS (SELECT label, CAST(SUM(q * q) AS BIGINT) AS n2 FROM q GROUP BY label),
         dot AS (SELECT a.label AS label_a, b.label AS label_b,
                   CAST(SUM(a.q * b.q) AS BIGINT) AS dot
                 FROM q a JOIN q b ON a.i = b.i AND a.label < b.label
                 GROUP BY 1, 2)
         SELECT label_a, label_b,
           round(dot / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 6)
             AS cosine
         FROM dot JOIN nrm na ON na.label = dot.label_a
                  JOIN nrm nb ON nb.label = dot.label_b
         ORDER BY label_a, label_b""",
    "embedding_kmeans" -> kmeansOracle,
    "cluster_profile" -> clusterProfileOracle,
    "embedding_outliers" -> embeddingOutliersOracle,
    // same integer quantize/bucket arithmetic; the per-dim PSI fold runs in
    // the same fixed bucket order on both engines
    "embedding_drift" ->
      s"""WITH flat AS (
           SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS q
           FROM embeddings),
         bounds AS (SELECT i, MIN(q) AS qmin, MAX(q) AS qmax FROM flat GROUP BY i),
         bkt AS (SELECT f.i, f.vec_id % 2 = 0 AS side_a, f.q,
                   (f.q - b.qmin) * $driftBuckets // GREATEST(b.qmax - b.qmin + 1, 1) AS bucket
                 FROM flat f JOIN bounds b ON b.i = f.i),
         counts AS (SELECT i, bucket,
                      CAST(SUM(CASE WHEN side_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                      CAST(SUM(CASE WHEN NOT side_a THEN 1 ELSE 0 END) AS BIGINT) AS cb
                    FROM bkt GROUP BY i, bucket),
         totals AS (SELECT i,
                      CAST(SUM(CASE WHEN side_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
                      CAST(SUM(CASE WHEN NOT side_a THEN 1 ELSE 0 END) AS BIGINT) AS nb,
                      CAST(SUM(CASE WHEN side_a THEN q ELSE 0 END) AS BIGINT) AS sa,
                      CAST(SUM(CASE WHEN NOT side_a THEN q ELSE 0 END) AS BIGINT) AS sb
                    FROM bkt GROUP BY i),
         terms AS (SELECT c.i, t.na, t.nb, t.sa, t.sb, c.bucket,
                     (CAST(c.ca + 1 AS DOUBLE) / (t.na + $driftBuckets)
                      - CAST(c.cb + 1 AS DOUBLE) / (t.nb + $driftBuckets))
                     * ln((CAST(c.ca + 1 AS DOUBLE) / (t.na + $driftBuckets))
                          / (CAST(c.cb + 1 AS DOUBLE) / (t.nb + $driftBuckets))) AS psi_term
                   FROM counts c JOIN totals t ON t.i = c.i),
         psi AS (SELECT i, na, nb, sa, sb,
                   list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list(psi_term ORDER BY bucket)), (a, x) -> a + x) AS psi_raw
                 FROM terms GROUP BY i, na, nb, sa, sb)
         SELECT CAST(i AS BIGINT) AS i, na, nb,
           ROUND((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) / 1000000, 6)
             AS mean_shift,
           ROUND(psi_raw, 6) AS psi
         FROM psi ORDER BY i""",
    // replays the derived ±1 matrix (same integer sign arithmetic) over the
    // micro-unit-quantized inputs; the signed sums are exact int64
    "embedding_project" ->
      s"""WITH flat AS (
           SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS q
           FROM embeddings),
         dims AS (SELECT unnest(range(0, $projectDims)) AS j),
         proj AS (
           SELECT vec_id, j,
             CAST(SUM(CASE WHEN ((j * 73 + i * 179) % 97) % 2 = 0 THEN q ELSE -q END)
               AS BIGINT) AS yint
           FROM flat CROSS JOIN dims GROUP BY vec_id, j)
         SELECT vec_id, CAST(j AS INT) AS j,
           ROUND(CAST(yint AS DOUBLE) / 1000000, 6) AS y
         FROM proj ORDER BY vec_id, j""",
    "embedding_quantize" ->
      """WITH m AS (
           SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
           FROM embeddings),
         sc AS (SELECT vec_id, embedding, 127.0 / maxabs AS scale FROM m WHERE maxabs > 0),
         q AS (
           SELECT vec_id, scale,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * scale + 0.5) AS BIGINT)) AS qv
           FROM sc)
         SELECT vec_id, ROUND(scale, 6) AS scale,
                list_min(qv) AS qmin, list_max(qv) AS qmax,
                CAST(list_sum(qv) AS BIGINT) AS qsum
         FROM q ORDER BY vec_id""",
    "sim_join_knn" ->
      """WITH flat AS (
           SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS val,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings),
         qs AS (SELECT vec_id AS q_id, val AS qv, i FROM flat WHERE vec_id BETWEEN 1 AND 5),
         corpus AS (SELECT * FROM flat WHERE vec_id >= 16),
         scored AS (
           SELECT q.q_id, f.vec_id, f.label,
             SUM(f.val * q.qv) /
             (SQRT(SUM(f.val * f.val)) * SQRT(SUM(q.qv * q.qv))) AS score_raw
           FROM corpus f JOIN qs q ON f.i = q.i
           GROUP BY q.q_id, f.vec_id, f.label),
         rk AS (SELECT q_id, vec_id, label, score_raw,
                  ROW_NUMBER() OVER (PARTITION BY q_id
                    ORDER BY score_raw DESC, vec_id) AS rn
                FROM scored)
         SELECT q_id, CAST(rn AS BIGINT) AS rn, vec_id, label,
                ROUND(score_raw, 6) AS score
         FROM rk WHERE rn <= 3 ORDER BY q_id, rn""",
    "sim_search_topk" -> topkOracle,
    "sim_search_topk_native" -> topkOracle,
    "sim_search_lsh" -> lshOracle,
    "sim_lsh_recall" -> lshRecallOracle,
    "embedding_knn_eval" -> knnEvalOracle,
    "sim_search_ivf" -> ivfOracle,
    "sim_search_pq" ->
      """WITH flat AS (
           SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS val,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings),
         qv AS (SELECT i, val FROM flat WHERE vec_id = 0),
         cb AS (
           SELECT vec_id AS code, (i - 1) // 8 AS m, i, val
           FROM flat WHERE vec_id < 16),
         sd AS (
           SELECT f.vec_id, c.m, c.code,
             SUM((f.val - c.val) * (f.val - c.val)) AS d2
           FROM flat f JOIN cb c ON f.i = c.i
           GROUP BY f.vec_id, c.m, c.code),
         codes AS (
           SELECT vec_id, m, code FROM (
             SELECT vec_id, m, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, code) AS rn
             FROM sd) WHERE rn = 1),
         tbl AS (
           SELECT c.m, c.code, SUM((q.val - c.val) * (q.val - c.val)) AS d2
           FROM cb c JOIN qv q ON c.i = q.i GROUP BY c.m, c.code),
         adc AS (
           SELECT x.vec_id, SUM(t.d2) AS adc_d2
           FROM codes x JOIN tbl t ON x.m = t.m AND x.code = t.code
           WHERE x.vec_id <> 0 GROUP BY x.vec_id),
         top AS (SELECT vec_id, adc_d2 FROM adc ORDER BY adc_d2, vec_id LIMIT 10),
         ex AS (
           SELECT f.vec_id, SUM((f.val - q.val) * (f.val - q.val)) AS d2
           FROM flat f JOIN qv q ON f.i = q.i
           WHERE f.vec_id IN (SELECT vec_id FROM top)
           GROUP BY f.vec_id)
         SELECT t.vec_id, ROUND(t.adc_d2, 6) AS adc_d2, ROUND(e.d2, 6) AS exact_d2
         FROM top t JOIN ex e ON t.vec_id = e.vec_id
         ORDER BY t.adc_d2, t.vec_id""",
    "sim_search_ivf_indexed" -> ivfOracle,
    "embedding_mrl_recall" ->
      s"""WITH fq AS (
           SELECT CAST(unnest(embedding) AS DOUBLE) AS qv,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings WHERE vec_id = 0),
         flat AS (
           SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS val,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings WHERE vec_id <> 0),
         full_scored AS (
           SELECT f.vec_id,
             SUM(f.val * q.qv) /
             (SQRT(SUM(f.val * f.val)) * SQRT(SUM(q.qv * q.qv))) AS s
           FROM flat f JOIN fq q ON f.i = q.i GROUP BY f.vec_id),
         full_top AS (SELECT vec_id FROM full_scored ORDER BY s DESC, vec_id LIMIT 10),
         trunc_scored AS (
           SELECT f.vec_id,
             SUM(f.val * q.qv) /
             (SQRT(SUM(f.val * f.val)) * SQRT(SUM(q.qv * q.qv))) AS s
           FROM flat f JOIN fq q ON f.i = q.i
           WHERE f.i <= $mrlTruncDim AND q.i <= $mrlTruncDim
           GROUP BY f.vec_id),
         trunc_top AS (SELECT vec_id FROM trunc_scored ORDER BY s DESC, vec_id LIMIT 10)
         SELECT (SELECT COUNT(*) FROM full_top) AS n_full,
                (SELECT COUNT(*) FROM trunc_top) AS n_trunc,
                (SELECT COUNT(*) FROM full_top JOIN trunc_top USING (vec_id))
                  AS n_found,
           CAST((SELECT COUNT(*) FROM full_top JOIN trunc_top USING (vec_id))
                AS DOUBLE) / (SELECT COUNT(*) FROM full_top) AS recall""",
    "sim_ivf_recall" ->
      s"""WITH exact AS (SELECT vec_id FROM ($topkOracle) x),
         ivf AS (SELECT vec_id FROM ($ivfOracle) v),
         counts AS (
           SELECT (SELECT COUNT(*) FROM exact) AS n_exact,
                  (SELECT COUNT(*) FROM ivf) AS n_ivf,
                  (SELECT COUNT(*) FROM exact e JOIN ivf i USING (vec_id)) AS n_found)
         SELECT n_exact, n_ivf, n_found,
           CAST(n_found AS DOUBLE) / n_exact AS recall
         FROM counts""",
    "sim_recall_curve" -> {
      val kvals = recallCurveKs
        .map(k => s"(CAST($k AS BIGINT))").mkString(", ")
      s"""WITH exact AS (
           SELECT vec_id, ROW_NUMBER() OVER (ORDER BY score DESC, vec_id)
             AS rn_e
           FROM ($topkOracle) t),
         ivf AS (
           SELECT vec_id, ROW_NUMBER() OVER (ORDER BY score DESC, vec_id)
             AS rn_i
           FROM ($ivfOracle) v),
         hits AS (SELECT e.vec_id, rn_e, rn_i
                  FROM exact e JOIN ivf i USING (vec_id)),
         ks(k) AS (VALUES $kvals)
         SELECT k,
           CAST(COALESCE(SUM(CASE WHEN rn_e <= k AND rn_i <= k
             THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hit,
           round(CAST(COALESCE(SUM(CASE WHEN rn_e <= k AND rn_i <= k
             THEN 1 ELSE 0 END), 0) AS DOUBLE) / CAST(k AS DOUBLE), 6)
             AS recall
         FROM ks LEFT JOIN hits ON TRUE
         GROUP BY k ORDER BY k"""
    },
    "sim_rerank" ->
      """WITH q AS (
           SELECT u.val AS qv, u.i AS i FROM (
             SELECT CAST(unnest(embedding) AS DOUBLE) AS val,
                    generate_subscripts(embedding, 1) AS i
             FROM embeddings WHERE vec_id = 0) u),
         flat AS (
           SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS val,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings WHERE vec_id <> 0),
         scored AS (
           SELECT f.vec_id, f.label,
             SUM(f.val * q.qv) /
             (SQRT(SUM(f.val * f.val)) * SQRT(SUM(q.qv * q.qv))) AS recall_score,
             SUM((f.val - q.qv) * (f.val - q.qv)) AS l2_raw
           FROM flat f JOIN q ON f.i = q.i
           GROUP BY f.vec_id, f.label),
         stage1 AS (
           SELECT * FROM scored ORDER BY recall_score DESC, vec_id LIMIT 50),
         stage2 AS (
           SELECT vec_id, label, l2_raw FROM stage1
           ORDER BY l2_raw ASC, vec_id LIMIT 10),
         rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY l2_raw ASC, vec_id) AS rn
                FROM stage2)
         SELECT CAST(rn AS BIGINT) AS rn, vec_id, label,
           ROUND(l2_raw, 6) AS l2
         FROM rk ORDER BY rn""",
    "dedup_semantic" ->
      """WITH flat AS (
           SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS val,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings),
         seeds AS (SELECT vec_id AS cid, val AS cval, i FROM flat WHERE vec_id < 8),
         dist AS (
           SELECT f.vec_id, s.cid, SUM((f.val - s.cval) * (f.val - s.cval)) AS d2
           FROM flat f JOIN seeds s ON f.i = s.i GROUP BY f.vec_id, s.cid),
         a AS (
           SELECT vec_id, cid FROM (
             SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
             FROM dist) WHERE rn = 1),
         cos AS (
           SELECT x.vec_id AS a, y.vec_id AS b,
             SUM(fx.val * fy.val) /
             (SQRT(SUM(fx.val * fx.val)) * SQRT(SUM(fy.val * fy.val))) AS cosine
           FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id
           JOIN flat fx ON fx.vec_id = x.vec_id
           JOIN flat fy ON fy.vec_id = y.vec_id AND fy.i = fx.i
           GROUP BY 1, 2),
         dups AS (SELECT DISTINCT b FROM cos WHERE cosine >= 0.5)
         SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster,
           (d.b IS NULL) AS keep
         FROM a LEFT JOIN dups d ON d.b = a.vec_id
         ORDER BY a.vec_id""",
  )
}
