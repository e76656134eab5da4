package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Round-9 specs: the size-gated broadcast state in the iterative graph
  * sweeps. Below [[Limits.maxBroadcastVertices]] the vertex-sized rank
  * state broadcasts (the sf-scale fast path); above it — the 10⁹-vertex
  * regime where that broadcast is a driver OOM — the sweep flips to a
  * keyed SHUFFLE_HASH join with the state as the build side. Both the plan
  * shape of each branch and the bit-identity of their results are pinned.
  */
class RoundNineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def sweepPlan(broadcastState: Boolean): String = {
    import spark.implicits._
    val symd = Seq((1L, 2L, 1L), (2L, 1L, 2L), (2L, 3L, 2L), (3L, 2L, 1L))
      .toDF("src", "dst", "degree")
    val pr = Seq((1L, 100L), (2L, 100L), (3L, 100L)).toDF("v", "pr")
    GraphOps.pagerankSweep(symd, 100L, pr, broadcastState)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
  }

  test("pagerank sweep below the gate: state broadcasts, no sort-merge") {
    val plan = sweepPlan(broadcastState = true)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("pagerank sweep above the gate: keyed shuffle-hash, no broadcast, no sort-merge") {
    val plan = sweepPlan(broadcastState = false)
    assert(plan.contains("ShuffledHashJoin"),
      s"scale fallback must be a shuffle-hash probe:\n$plan")
    assert(!plan.linesIterator.exists(_.contains("- BroadcastExchange")),
      s"vertex-sized state still broadcasts above the gate:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the edge stream must never sort:\n$plan")
  }

  test("pagerank: shuffle-hash fallback is bit-identical to the broadcast path") {
    val bc = GraphOps.queries("graph_pagerank")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val sh = GraphOps.graphPagerankImpl(spark, dir, maxBcVerts = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(sh.toSeq == bc.toSeq)
  }

  test("eigencentrality: shuffle-hash fallback is bit-identical to the broadcast path") {
    val bc = GraphOps.queries("graph_eigencentrality")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val sh = GraphOps.graphEigencentralityImpl(spark, dir, maxBcVerts = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(sh.toSeq == bc.toSeq)
  }
}
