package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Graph analytics over a co-occurrence graph derived from the fixtures:
  * two parts are connected when some order contains both (the market-basket
  * projection of the order/part bipartite graph — the same construction
  * recommendation and fraud pipelines run on transaction logs). The
  * reference delegates arbitrary SQL to its backing stores
  * (internal/core/core.go:496) and has no graph operators; this family is
  * part of the beyond-reference analytics surface, next to the dedup
  * cluster resolution ([[DedupOps]]) which is itself a connected-components
  * pass.
  *
  * 100 TB shape, stage by stage:
  *  1. Edge derivation never self-joins the fact table: lineitem groups by
  *     order (one shuffle with map-side partials), each order's distinct
  *     part set expands (a < b) pairs through the native codegen'd
  *     [[graft.functions.LongPairs]] — per-task work is bounded by order
  *     WIDTH (≤ 13 parts here, bounded small in any real basket log), never
  *     by corpus size.
  *  2. `distinct` on the pair stream is the edge shuffle — 16 bytes/row.
  *  3. Triangle counting uses DEGREE ORIENTATION (order each edge from its
  *     lower-(degree, id) endpoint to its higher one): every vertex's
  *     out-degree is O(√m), so the wedge join materializes O(m^1.5) rows
  *     worst case instead of Σ deg² — the standard compact-forward bound,
  *     and the difference between a hub vertex emitting deg² wedge rows and
  *     the same vertex emitting a bounded out-neighborhood square. Skewed
  *     hubs (a part in every order) land on the HIGH side of every one of
  *     their edges and therefore never fan out.
  */
object GraphOps {
  type Q = (SparkSession, String) => DataFrame

  /** Distinct co-occurrence edges (a < b), derived per the class doc.
    * Pay-once via [[graft.plans.ArtifactCache]]: six graph queries (degree,
    * triangles, components, link prediction, pagerank, basket rules) all
    * start from this exact edge set, and re-deriving it per query repeats
    * the basket groupBy + pair explode + distinct shuffle six times. The
    * artifact is the graph analog of the dedup candidate-pair artifacts —
    * built on first use per data version, auto-invalidated when lineitem
    * changes, and attributed separately by the bench. */
  private def edges(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${edgesPath(s, d)}/edges")

  private[graft] def edgesPath(s: SparkSession, d: String): String =
    graft.plans.ArtifactCache.getOrBuild("graph_edges", d, Seq("lineitem"),
      Seq(GraphOps.getClass, graft.functions.LongPairs.getClass,
        Tables.getClass)) { dir =>
      deriveEdges(s, d).write.parquet(s"$dir/edges")
    }

  private def deriveEdges(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(graft.functions.LongPairs.long_pairs(col("ps"))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .distinct()

  /** Per-vertex degree of the undirected edge set: explode both endpoints,
    * one count aggregate. Output is vertex-table-sized (the parts dim), not
    * edge-sized. */
  private def degrees(e: DataFrame): DataFrame =
    e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("degree"))

  /** Co-occurrence degree per part: how many distinct parts each part was
    * ever ordered together with. */
  val graphDegree: Q = (s, d) =>
    degrees(edges(s, d)).orderBy(col("v"))

  /** Global triangle census: vertices, edges, wedges (open two-paths,
    * Σ d(d−1)/2 — exact integer), and triangles via the degree-oriented
    * closure join. One row out; the wedge/triangle ratio is the global
    * clustering coefficient, left to the reader as exact integers rather
    * than an engine-dependent float. */
  val graphTriangles: Q = (s, d) => {
    val e = edges(s, d).localCheckpoint() // feeds degrees + orientation + probe
    val nEdges = e.count() // checkpoint materialized — metadata-cheap gate
    val deg = degrees(e)
    val da = deg.select(col("v").as("a"), col("degree").as("da"))
    val db = deg.select(col("v").as("b"), col("degree").as("db"))
    // orient each edge low→high by (degree, id); both joins are vertex-sized
    // (the parts dim) — broadcast locally, AQE-planned at scale
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val o = e.join(da, "a").join(db, "b")
      .select(when(lowFirst, col("a")).otherwise(col("b")).as("u"),
        when(lowFirst, col("b")).otherwise(col("a")).as("v"))
    // Each apex's ID-sorted out-neighborhood expands through the native
    // packed-pair expression — the same 8-byte wedge keys the link
    // prediction query rides, with out-degree bounded O(√m) by the
    // orientation. A triangle {a,b,c} (ordered by degree,id) is counted
    // exactly once, at its unique lowest apex a, as wedge pair (b,c).
    val wedges = o
      .groupBy(col("u")).agg(sort_array(collect_set(col("v"))).as("ns"))
      .select(explode(
        graft.functions.LongPairsPacked.long_pairs_packed(col("ns"))).as("p"))
    // The closure probe tests the UNDIRECTED packed edge set (a<b by id):
    // the oriented edge b→c exists iff the undirected edge {b,c} does, and
    // the packed wedge key is id-normalized, so one id-packed set answers
    // both orientations. Within broadcast reach the probe fuses into the
    // wedge-expansion stage (one hash lookup per wedge, ZERO wedge
    // shuffle — this replaced two shuffled self-joins of the wedge stream,
    // 9.7 → ~1.3 s at sf0.1); past it, the probe becomes a shuffled
    // equi-join on the same packed key and AQE plans the exchange.
    val ep = e.select(shiftleft(col("a"), 32).bitwiseOR(col("b")).as("p"))
    val tri =
      (if (nEdges <= graft.Limits.maxBroadcastEdges)
        wedges.join(broadcast(ep), Seq("p"), "left_semi")
      else
        wedges.join(ep, Seq("p"), "left_semi"))
        .agg(count(lit(1)).as("n_triangles"))
    val nv = deg.agg(count(lit(1)).as("n_vertices"))
    val ne = e.agg(count(lit(1)).as("n_edges"))
    val nw = deg.agg(expr("sum(degree * (degree - 1)) DIV 2")
      .cast(LongType).as("n_wedges")) // DIV keeps it exact integer end-to-end
    // one-row-aggregate stitching (same pattern as corpus_stats et al.)
    nv.crossJoin(ne).crossJoin(nw).crossJoin(tri)
  }

  /** Connected components of the co-occurrence graph: every vertex labeled
    * with its component's smallest vertex id. Reuses the dedup cluster
    * resolver ([[DedupOps.resolveClusters]]) — min-label propagation with
    * pointer jumping, O(log diameter) join+agg rounds — because a dedup
    * cluster pass IS connected components; the graph family shares the
    * engine rather than reimplementing it. Vertex set = edge endpoints
    * (parts never co-ordered are isolated and not graph members), matching
    * the degree query's universe. */
  val graphComponents: Q = (s, d) =>
    DedupOps.resolveClusters(edges(s, d))
      .select(col("doc_id").as("v"), col("lbl").as("component"))
      .orderBy(col("v"))

  /** Wedge centers with degree above this cut are excluded from
    * common-neighbor evidence: a hub co-occurring with everything carries
    * ~zero link-prediction signal (the stopword argument, the same shape
    * as the dedup inverted-index df-cut) and is exactly the vertex whose
    * deg²/2 wedge fan-out would dominate the expansion. The oracle applies
    * the identical cut, and at median degree 115 on this fixture the cut
    * BINDS — the declared semantics are what the gate tests. */
  val wedgeDegreeCap = 128

  /** Common-neighbor link prediction: the 20 strongest NOT-yet-connected
    * part pairs by shared-neighbor count. The plan is built around the
    * stream's one irreducible cost — Σ min(deg, cap)² wedge pairs with
    * near-unique keys — and spends nothing else:
    *  1. Each qualifying center's sorted neighbor set expands through the
    *     native [[graft.functions.LongPairsPacked]]: each (a < b) pair is
    *     ONE packed bigint (part keys are 31-bit dimension ids), so
    *     expansion allocates a primitive array, not cap²/2 row objects,
    *     and every downstream stage handles 8-byte keys.
    *  2. The existing-edge anti-join runs BEFORE counting, as a broadcast
    *     hash filter fused into the expansion stage: the packed edge set
    *     is dimension-pair-bounded (~10 MB/M edges) while the wedge
    *     stream is cap²-fold larger, so probing map-side costs one hash
    *     lookup per pair and removes the post-aggregate shuffle entirely.
    *     (Past broadcast reach — billions of edges — the same anti-join
    *     moves AFTER the count, where it is candidate-pair-bounded; at
    *     that point the wedge stream dwarfs it either way.)
    *  3. The count runs entirely AFTER one explicit repartition on the
    *     packed key: pair multiplicity is ~1, so a map-side partial would
    *     hash 74M near-unique keys only to shuffle the same cardinality
    *     anyway — repartitioning RAW 8-byte keys first makes the exchange
    *     strictly cheaper and confines all counting to one post-shuffle
    *     pass ([[hashCountTopK]]: unboxed UnsafeRow iteration into a
    *     primitive open-addressing map, per-partition top-20 fused into
    *     the map scan). 20 rows/partition reach the driver; the final
    *     (count desc, a, b) order is a sort of ≤ 20×partitions rows,
    *     unpacked on 20. */
  /** The link-prediction query's building frames: edge count (gates the
    * broadcast-reach flip), raw packed wedge stream, packed edge set, and
    * `pre` — the anti-joined, hash-repartitioned pair stream the unboxed
    * counting pass consumes. Extracted so PlanSpec can pin `pre`'s plan:
    * the `toRdd` boundary in the counting path hides this subplan from
    * the outer query's explain. */
  private[graft] case class CnFrames(nEdges: Long, wedges: DataFrame,
      ep: DataFrame, pre: DataFrame)

  private[graft] def cnFrames(s: SparkSession, d: String): CnFrames = {
    val e = edges(s, d).localCheckpoint() // feeds adjacency twice + the filter
    // eager checkpoint already materialized the edge set, so this count is a
    // metadata-cheap job — it gates which side of the broadcast-reach flip
    // actually runs
    val nEdges = e.count()
    val adj = e.select(col("a").as("w"), col("b").as("n"))
      .unionAll(e.select(col("b").as("w"), col("a").as("n")))
    val ep = e.select(shiftleft(col("a"), 32).bitwiseOR(col("b")).as("p"))
    val wedges = adj
      .groupBy(col("w")).agg(sort_array(collect_set(col("n"))).as("ns"))
      .filter(size(col("ns")) <= wedgeDegreeCap)
      .select(explode(
        graft.functions.LongPairsPacked.long_pairs_packed(col("ns"))).as("p"))
    val pre = wedges.join(broadcast(ep), Seq("p"), "left_anti")
      .repartition(2 * s.sparkContext.defaultParallelism, col("p"))
    CnFrames(nEdges, wedges, ep, pre)
  }

  val graphCommonNeighbors: Q = (s, d) => {
    val CnFrames(nEdges, wedges, ep, pre) = cnFrames(s, d)
    // Count spelling, measured head-to-head on the 70.6 M-pair stream at
    // sf0.1 (local[32], best-of-N under the bench JVM):
    //   - two-phase groupBy (map-side partial):            56.6 s — the
    //     partial agg hashes near-unique keys (70.6 M pairs, multiplicity
    //     ~1) only to shuffle the same cardinality, and its map spills;
    //   - repartition + Spark HashAggregate / partition-local sort +
    //     run-length count: 10–24 s — both pay the Dataset iterator's
    //     per-element Long BOXING (70 M allocations) and either agg-map
    //     spill or sort churn;
    //   - repartition + UNBOXED per-partition open-addressing count
    //     (below): ~5 s best / ~7 s typical — `queryExecution.toRdd`
    //     iterates reused UnsafeRows (getLong, zero allocation/element),
    //     the count lives in two primitive arrays, and the partition's
    //     TOP-20 falls out of the same map scan.
    // Hash partitioning by p makes per-key counts complete per partition,
    // so a local top-k by the GLOBAL order (count desc, p asc) can only
    // drop rows the global top-k would drop — 20 rows/partition reach the
    // driver instead of 70 M. Partition count 2×parallelism bounds the
    // per-task map (~0.9 M keys here — the map is presized past it, so no
    // growth rehash ever runs) and scales with the cluster; past
    // broadcast reach the groupBy fallback below remains the spill-safe
    // path.
    val counted =
      if (nEdges <= graft.Limits.maxBroadcastEdges) {
        import s.implicits._
        s.createDataset(
          pre.queryExecution.toRdd.mapPartitions(rows => hashCountTopK(rows, 20)))
          .toDF("p", "common_neighbors")
      } else
        // past broadcast reach the anti-join moves AFTER the count, where
        // its input is candidate-pair-bounded instead of wedge-stream-sized
        // (no local top-k before the anti-join: a top pair might BE an
        // existing edge, and dropping the 21st here would lose its runner-up)
        wedges
          .repartition(2 * s.sparkContext.defaultParallelism, col("p"))
          .groupBy(col("p")).agg(count(lit(1)).as("common_neighbors"))
          .join(ep, Seq("p"), "left_anti")
    counted
      .orderBy(col("common_neighbors").desc, col("p"))
      .limit(20)
      .select(shiftright(col("p"), 32).as("a"),
        (col("p").bitwiseAND(lit(0xFFFFFFFFL))).as("b"),
        col("common_neighbors"))
      .orderBy(col("common_neighbors").desc, col("a"), col("b"))
  }

  /** Exact per-key count of a partition's packed-pair stream plus its
    * top-k by the global ranking (count desc, p asc), in one pass over
    * reused UnsafeRows (no per-element allocation — a Dataset iterator
    * would box every Long). The count lives in two primitive arrays
    * (open addressing, byteswap64 mix, ×2 growth at 0.7 load); keys are
    * non-negative packed ids so −1 is a free empty sentinel. The top-k
    * scan runs over the final map (insertion sort into two k-element
    * arrays — k=20, so the shift is trivial). */
  private[graft] def hashCountTopK(
      rows: Iterator[org.apache.spark.sql.catalyst.InternalRow],
      k: Int): Iterator[(Long, Long)] = {
    var cap = 1 << 21; var mask = cap - 1
    var keys = new Array[Long](cap); var vals = new Array[Long](cap)
    java.util.Arrays.fill(keys, -1L)
    var size = 0
    def grow(): Unit = {
      val ok = keys; val ov = vals
      cap <<= 1; mask = cap - 1
      keys = new Array[Long](cap); vals = new Array[Long](cap)
      java.util.Arrays.fill(keys, -1L)
      var i = 0
      while (i < ok.length) {
        if (ok(i) >= 0) {
          var h = (scala.util.hashing.byteswap64(ok(i)) & mask).toInt
          while (keys(h) >= 0) h = (h + 1) & mask
          keys(h) = ok(i); vals(h) = ov(i)
        }
        i += 1
      }
    }
    while (rows.hasNext) {
      val p = rows.next().getLong(0)
      var h = (scala.util.hashing.byteswap64(p) & mask).toInt
      while (keys(h) >= 0 && keys(h) != p) h = (h + 1) & mask
      if (keys(h) < 0) {
        keys(h) = p; vals(h) = 1; size += 1
        if (size * 10 > cap * 7) grow()
      } else vals(h) += 1
    }
    val bk = new Array[Long](k); val bc = new Array[Long](k); var n = 0
    var i = 0
    while (i < cap) {
      if (keys(i) >= 0) {
        val p = keys(i); val c = vals(i)
        if (n < k || c > bc(n - 1) || (c == bc(n - 1) && p < bk(n - 1))) {
          var j = if (n < k) { n += 1; n - 1 } else k - 1
          while (j > 0 && (bc(j - 1) < c || (bc(j - 1) == c && bk(j - 1) > p))) {
            bk(j) = bk(j - 1); bc(j) = bc(j - 1); j -= 1
          }
          bk(j) = p; bc(j) = c
        }
      }
      i += 1
    }
    (0 until n).iterator.map(j => (bk(j), bc(j)))
  }

  /** Association-rule mining over order baskets (the market-basket rules a
    * recommender bootstrap runs): for every directed part pair (a → b)
    * co-ordered at least [[minRuleSupport]] times, support / confidence /
    * lift from exact integer counts, floats computed ONCE at the end.
    *
    * 100 TB shape: pair counts come from the same width-bounded per-order
    * [[graft.functions.LongPairs]] expansion as the edge derivation (never
    * a fact self-join); the per-item order counts are a part-dimension-sized
    * table, so both enrichment joins broadcast; the final ranking is a
    * TakeOrdered top-20. */
  val minRuleSupport = 3

  val basketRules: Q = (s, d) => {
    val op = Tables.load(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .localCheckpoint() // feeds baskets + item counts + the order count
    // the total-order count rides as a broadcast 1-row frame (scalar-
    // subquery spelling) instead of a blocking driver-side .count() at
    // query-construction time
    val nOrders = op.agg(countDistinct(col("l_orderkey")).as("n_orders"))
    val pairN = op
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(graft.functions.LongPairs.long_pairs(col("ps"))).as("e"))
      .groupBy(col("e.a").as("a"), col("e.b").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minRuleSupport)
    val itemN = op.groupBy(col("l_partkey").as("v"))
      .agg(count(lit(1)).as("n_v"))
    // both rule directions from each undirected pair, then exact-int ratios
    val rules = pairN
      .select(col("a").as("antecedent"), col("b").as("consequent"), col("n_ab"))
      .unionAll(pairN.select(col("b"), col("a"), col("n_ab")))
      .join(broadcast(itemN.withColumnRenamed("v", "antecedent")
        .withColumnRenamed("n_v", "n_ante")), "antecedent")
      .join(broadcast(itemN.withColumnRenamed("v", "consequent")
        .withColumnRenamed("n_v", "n_cons")), "consequent")
      .crossJoin(broadcast(nOrders))
    rules.select(col("antecedent"), col("consequent"), col("n_ab"),
        round(col("n_ab").cast("double") / col("n_orders").cast("double"), 6)
          .as("support"),
        round(col("n_ab").cast("double") / col("n_ante").cast("double"), 6)
          .as("confidence"),
        round((col("n_ab") * col("n_orders")).cast("double") /
          (col("n_ante") * col("n_cons")).cast("double"), 6).as("lift"))
      .orderBy(col("lift").desc, col("antecedent"), col("consequent"))
      .limit(20)
  }

  /** Fixed-point integer PageRank, [[pagerankIters]] Jacobi sweeps over the
    * co-occurrence graph. ALL iteration arithmetic is 64-bit integer (ranks
    * scaled by 1e12, contributions by integer division, damping as
    * `(85 · Σ) DIV 100`), so partial-aggregation order cannot perturb a
    * single bit and the DuckDB oracle replays the sweeps exactly — the same
    * trick a distributed engine needs anyway to make PageRank runs
    * reproducible across topologies. The float rank appears once, as one
    * IEEE division per vertex on output.
    *
    * 100 TB shape: each sweep is one shuffle of (dst, contrib) pairs keyed
    * by vertex; the rank/degree state is vertex-table-sized and co-partitions
    * with the adjacency on the same key, so AQE plans the per-sweep join
    * shuffle-free once the adjacency is bucketed. No driver state: the only
    * scalar is the vertex count. */
  val pagerankIters = 2
  val pagerankScale = 1000000000000L

  val graphPagerank: Q = (s, d) => {
    val e = edges(s, d).localCheckpoint()
    val sym = e.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
    val deg = degrees(e).localCheckpoint() // (v, degree): out-degree = degree
    // vertex count as a broadcast 1-row frame (scalar-subquery spelling):
    // no blocking .count() at construction; the integer init/damping
    // arithmetic is unchanged, just expressed over the nv column
    val nv = deg.agg(count(lit(1)).as("nv"))
    val initExpr = s"CAST($pagerankScale AS BIGINT) DIV nv"
    var pr = deg.crossJoin(broadcast(nv))
      .select(col("v"), expr(initExpr).as("pr"))
    for (_ <- 1 to pagerankIters) {
      val contrib = pr.join(deg, "v")
        .select(col("v"), expr("pr DIV degree").as("contrib"))
      pr = sym.join(contrib.withColumnRenamed("v", "src"), "src")
        .groupBy(col("dst").as("v"))
        .agg(sum(col("contrib")).as("in_sum"))
        .crossJoin(broadcast(nv))
        .select(col("v"),
          (expr(s"(15 * ($initExpr)) DIV 100") +
            expr("(85 * in_sum) DIV 100")).as("pr"))
    }
    pr.select(col("v"), col("pr").as("pr_scaled"),
        // round to 6 (the repo-wide float-output convention): at 15 places
        // the rounding happens in the double's last ulps, where Spark's
        // BigDecimal HALF_UP and DuckDB's float arithmetic can disagree
        round(col("pr").cast("double") / lit(1.0e12), 6).as("pr"))
      .orderBy(col("v"))
  }

  val queries: Map[String, Q] = Map(
    "graph_degree" -> graphDegree,
    "graph_triangles" -> graphTriangles,
    "graph_components" -> graphComponents,
    "graph_common_neighbors" -> graphCommonNeighbors,
    "basket_rules" -> basketRules,
    "graph_pagerank" -> graphPagerank,
  )

  /** Shared edge/degree CTEs: DuckDB derives the same distinct (a < b)
    * co-occurrence edges by per-order self-join (equivalent to the
    * pair-expansion spelling for a DISTINCT result). */
  private val edgeCtes: String =
    """e AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
            FROM lineitem x JOIN lineitem y
              ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
       deg AS (SELECT v, COUNT(*) AS degree
               FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
               GROUP BY v)"""

  val oracle: Map[String, String] = Map(
    "graph_degree" ->
      s"""WITH $edgeCtes
         SELECT v, degree FROM deg ORDER BY v""",
    "graph_triangles" ->
      s"""WITH $edgeCtes,
         o AS (SELECT CASE WHEN (da.degree, e.a) < (db.degree, e.b)
                           THEN e.a ELSE e.b END AS u,
                      CASE WHEN (da.degree, e.a) < (db.degree, e.b)
                           THEN e.b ELSE e.a END AS v
               FROM e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b),
         tri AS (SELECT COUNT(*) AS n_triangles
                 FROM o e1 JOIN o e2 ON e1.v = e2.u
                           JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v)
         SELECT (SELECT COUNT(*) FROM deg) AS n_vertices,
                (SELECT COUNT(*) FROM e)   AS n_edges,
                (SELECT CAST(SUM(degree * (degree - 1)) AS BIGINT) // 2
                   FROM deg)               AS n_wedges,
                (SELECT n_triangles FROM tri) AS n_triangles""",
    "graph_components" ->
      s"""WITH $edgeCtes,
         sym AS (SELECT a AS src, b AS dst FROM e
                 UNION ALL SELECT b, a FROM e),
         cc AS (
           WITH RECURSIVE walk(v, lbl) AS (
             SELECT DISTINCT src, src FROM sym
             UNION
             SELECT s.dst, w.lbl FROM walk w JOIN sym s ON w.v = s.src
           )
           SELECT v, MIN(lbl) AS component FROM walk GROUP BY v)
         SELECT v, component FROM cc ORDER BY v""",
    "graph_common_neighbors" ->
      s"""WITH $edgeCtes,
         adj AS (SELECT a AS w, b AS n FROM e UNION ALL SELECT b, a FROM e),
         kept AS (SELECT w FROM adj GROUP BY w
                  HAVING COUNT(*) <= $wedgeDegreeCap),
         cn AS (SELECT x.n AS a, y.n AS b, COUNT(*) AS common_neighbors
                FROM adj x JOIN adj y ON x.w = y.w AND x.n < y.n
                WHERE x.w IN (SELECT w FROM kept)
                GROUP BY x.n, y.n)
         SELECT a, b, common_neighbors FROM cn
         WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = cn.a AND e.b = cn.b)
         ORDER BY common_neighbors DESC, a, b LIMIT 20""",
    "basket_rules" ->
      s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         n_ord AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM op),
         pairs AS (SELECT x.l_partkey AS a, y.l_partkey AS b,
                          COUNT(*) AS n_ab
                   FROM op x JOIN op y
                     ON x.l_orderkey = y.l_orderkey
                    AND x.l_partkey < y.l_partkey
                   GROUP BY 1, 2 HAVING COUNT(*) >= $minRuleSupport),
         item AS (SELECT l_partkey AS v, COUNT(*) AS n_v FROM op GROUP BY 1),
         dir AS (SELECT a AS antecedent, b AS consequent, n_ab FROM pairs
                 UNION ALL SELECT b, a, n_ab FROM pairs)
         SELECT antecedent, consequent, n_ab,
           round(CAST(n_ab AS DOUBLE) / CAST(n_ord.n AS DOUBLE), 6) AS support,
           round(CAST(n_ab AS DOUBLE) / CAST(ia.n_v AS DOUBLE), 6) AS confidence,
           round(CAST(n_ab * n_ord.n AS DOUBLE) /
                 CAST(ia.n_v * ic.n_v AS DOUBLE), 6) AS lift
         FROM dir
         JOIN item ia ON ia.v = dir.antecedent
         JOIN item ic ON ic.v = dir.consequent
         CROSS JOIN n_ord
         ORDER BY lift DESC, antecedent, consequent LIMIT 20""",
    "graph_pagerank" ->
      s"""WITH $edgeCtes,
         sym AS (SELECT a AS src, b AS dst FROM e
                 UNION ALL SELECT b, a FROM e),
         nv AS (SELECT COUNT(*) AS n FROM deg),
         pr0 AS (SELECT v, $pagerankScale // (SELECT n FROM nv) AS pr
                 FROM deg),
         pr1 AS (SELECT s.dst AS v,
                   (15 * ($pagerankScale // (SELECT n FROM nv))) // 100
                   + (85 * SUM(p.pr // d.degree)) // 100 AS pr
                 FROM sym s
                 JOIN pr0 p ON p.v = s.src JOIN deg d ON d.v = s.src
                 GROUP BY s.dst),
         pr2 AS (SELECT s.dst AS v,
                   (15 * ($pagerankScale // (SELECT n FROM nv))) // 100
                   + (85 * SUM(p.pr // d.degree)) // 100 AS pr
                 FROM sym s
                 JOIN pr1 p ON p.v = s.src JOIN deg d ON d.v = s.src
                 GROUP BY s.dst)
         SELECT v, CAST(pr AS BIGINT) AS pr_scaled,
           round(CAST(pr AS DOUBLE) / 1.0e12, 6) AS pr
         FROM pr2 ORDER BY v""",
  )
}
