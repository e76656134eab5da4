package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** Round-8 first batch: per-vertex clustering coefficients and brand-
  * partition modularity. Both are checked against brute-force local
  * recomputation on the sf0.001 fixture, not just shape. */
class RoundEightOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  /** The co-occurrence edge set, collected: small at sf0.001. */
  private lazy val localEdges: Set[(Long, Long)] =
    Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("ps"))
      .collect()
      .flatMap { r =>
        val ps = r.getSeq[Long](1).sorted
        for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
      }
      .toSet

  private lazy val localTriPerVertex: Map[Long, Long] = {
    val adj = localEdges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val counts = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- localEdges; c <- adj(a) if c > b && adj(b).contains(c)) {
      // triangle {a,b,c} enumerated once at its lowest-id edge (a<b<c by id
      // is not guaranteed for a, but (a,b) with c>b covers each triangle
      // exactly once per its lexicographically-first edge)
      counts(a) += 1; counts(b) += 1; counts(c) += 1
    }
    counts.toMap
  }

  test("graph_clustering_coeff: per-vertex triangle counts match brute force") {
    val got = GraphOps.queries("graph_clustering_coeff")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty && got.length <= 20)
    // top-20 ordering: n_triangles desc, v asc
    assert(got.sliding(2).forall { case Array(x, y) =>
      x._3 > y._3 || (x._3 == y._3 && x._1 < y._1); case _ => true })
    val expectTop = localTriPerVertex.toSeq.sortBy { case (v, n) => (-n, v) }
      .take(got.length)
    assert(got.map(g => (g._1, g._3)).toSeq == expectTop)
    // coefficient = 2·tri / (deg·(deg−1)), within [0, 1]
    got.foreach { case (_, deg, tri, cc) =>
      assert(math.abs(cc - math.rint(2.0 * tri / (deg * (deg - 1)) * 1e6) / 1e6) < 1e-12)
      assert(cc >= 0.0 && cc <= 1.0)
    }
  }

  test("graph_modularity: matches brute-force Q over the brand partition") {
    val brand = Tables.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val m = localEdges.size.toLong
    val intra = localEdges.count { case (a, b) => brand(a) == brand(b) }.toLong
    val degs = localEdges.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val dc = degs.groupBy { case (v, _) => brand(v) }.view
      .mapValues(_.values.sum).toMap
    val q = intra.toDouble / m -
      dc.values.map(d => d.toDouble * d).sum / (4.0 * m * m)
    val row = GraphOps.queries("graph_modularity")(spark, dir).collect().head
    assert(row.getLong(0) == m)
    assert(row.getLong(1) == intra)
    assert(row.getLong(2) == dc.size.toLong)
    assert(math.abs(row.getDouble(3) - math.rint(q * 1e6) / 1e6) < 1e-9)
    // every edge endpoint is in exactly one community: Σ d_c = 2m
    assert(dc.values.sum == 2 * m)
  }
}
