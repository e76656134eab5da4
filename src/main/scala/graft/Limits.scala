package graft

/** Hard caps on the few places the engine intentionally collects to the
  * driver. Every such collect is k-bounded BY DESIGN (Lloyd's iteration
  * needs the k centroids; IVF probing needs the nprobe centroid ids — both
  * inherent to the algorithm, not incidental `.collect()` shortcuts), but a
  * bound that only lives in a comment can't stop a future k=10^6 config from
  * silently OOMing the driver. Operators `require(...)` against these caps,
  * so a misconfiguration fails fast with a message instead of an executor
  * heap dump. */
object Limits {
  /** Max centroids / probe lists collected to the driver: 4096 centroids of
    * a 4-KB embedding ≈ 16 MB — far below any driver heap, far above any
    * sane nlist/k for the corpus sizes a single index shard serves. */
  val maxDriverCentroids = 4096

  /** Max edges broadcast as a packed-long hash filter (graph link
    * prediction): 16 M packed 8-byte keys ≈ 128 MB raw, comfortably inside
    * executor/driver broadcast reach. Past this, the existing-edge
    * anti-join flips from a map-side broadcast probe (wedge-stream-sized
    * input, zero extra shuffle) to a shuffle anti-join AFTER the candidate
    * count (candidate-pair-bounded input) — the gate makes the documented
    * fallback real code instead of a comment. */
  val maxBroadcastEdges = 16L * 1000 * 1000

  /** Max vertices whose iterative rank state (pagerank / eigencentrality
    * power sweeps) broadcasts onto the pinned adjacency: 16 M (v, rank)
    * pairs ≈ 256 MB raw, inside broadcast reach. Past this — the 10⁹-vertex
    * regime — an unconditional broadcast of the vertex-sized state is the
    * suite's one real scale-killer (driver OOM), so the sweep flips to a
    * keyed SHUFFLE_HASH join with the state as the build side: the
    * adjacency shuffles once per sweep on the join key but the plan stays
    * hash-probe-shaped (never a sort-merge of the edge stream). The gate
    * reads ONE bounded driver scalar (the vertex count the sweeps already
    * materialize) — same posture as [[maxBroadcastEdges]].
    *
    * Memory envelope of the fallback at 10⁹ vertices: SHUFFLE_HASH builds
    * the vertex state per partition, so build memory is
    * |V| / shuffle.partitions × ~48 B/row (two longs + UnsafeRow + map
    * overhead). At |V| = 10⁹ and the local 32 partitions that is ~1.5 GB
    * per task — too big; the partition count must scale with |V|:
    * partitions ≳ |V| × 48 B / (executor memory per task ÷ 2), e.g. 10⁹
    * vertices on 4 GB-per-task executors wants ≥ 24k partitions (≈ 2 MB
    * build per task at 48k). Past the point where partition counts get
    * silly (~10¹⁰ vertices), the bucketed-adjacency cluster path is the
    * spelling: the state join consumes the pre-hashed layout with zero
    * adjacency movement and the build side is bucket-sized by
    * construction. Arithmetic + deployment recipe in docs/SCALE.md
    * ("shuffle-hash fallback envelope"). */
  val maxBroadcastVertices = 16L * 1000 * 1000

  /** Max base-table rows for which a DIMENSION-derived frame (a filtered
    * slice of `customer`/`part`/`supplier`, a per-partkey aggregate, an
    * orders-derived order list) may broadcast in the relational queries:
    * same 16 M posture as [[maxBroadcastVertices]] — dimension rows here
    * are a key plus a few narrow columns (≤ ~64 B), so 16 M rows ≈ 1 GB
    * raw, inside broadcast reach. The TPC-H dimensions scale linearly
    * with SF (customer 150k, part 200k, supplier 10k, orders 1.5M rows
    * per SF), so at the SF ≈ 100k that 100 TB implies every one of them
    * is past any broadcast ceiling; the gate ([[graft.operators
    * .DimGates]]) flips those joins to a keyed SHUFFLE_HASH build, never
    * a sort of the fact stream. `nation`/`region` (25/5 rows at every
    * SF) stay unconditional. */
  val maxBroadcastDimRows = 16L * 1000 * 1000

  /** Vertex-bound (2m) above which `graph_components` switches its sweep
    * from the gated broadcast/shuffle-hash probe to the BUCKETED packed
    * adjacency ([[graft.operators.GraphOps.bucketedAdjTable]]): the
    * round-13 A/B measured the bucketed spelling consistently faster from
    * the 4.8M-bound rung up (sf0.2 2.42 → 2.08 s, sf1 3.83 → 3.35/3.09,
    * sf2 5.76 → 4.84 — default legs are shuffle-hash past the 16M
    * broadcast gate) and slower below it (sf0.1, 2.39M bound: 1.59 →
    * 2.12 s — the catalog scan + aligned state shuffle don't pay for
    * themselves on a small graph). Components alone: the same A/B found
    * pagerank/eigencentrality a measurement-noise wash across spellings
    * (docs/SCALE.md round-13 table), so they keep the broadcast/
    * shuffle-hash gate only. Mid-band (4M..16M) the bucketed path
    * preempts a still-legal broadcast; past 16M it replaces the
    * shuffle-hash fallback — both directions measured faster for this
    * sweep's shape (a per-round explode+re-agg whose state join aligns
    * with the bucket hash). */
  val componentsBucketedBound = 4L * 1000 * 1000

  /** `vertexBound` above which `graph_kcore`'s delta peeling probes the
    * BUCKETED catalog adjacency instead of the gated parquet scan — the
    * same measured crossover window as components (r14 A/B, medians of
    * 3 at local[32]: bucketed +27 % at the 2.39M rung, −30/−8/−28 % at
    * 4.78M/23.9M/47.8M), which is expected: the delta probe is the same
    * explode+re-agg sweep shape whose state join aligns with the bucket
    * hash. */
  val kcoreBucketedBound = 4L * 1000 * 1000

  /** `vertexBound` above which `graph_label_prop` votes over the
    * BUCKETED catalog adjacency. Its crossover sits LOWER than
    * components/kcore (r14 A/B: bucketed +17 % at the 0.24M rung, then
    * −22/−4/−20/−17 % at 2.39M/4.78M/23.9M/47.8M): both LPA rounds group
    * by the bucketing key itself (round 1's neighbour-min aggregates
    * directly on src; round 2's vote re-aggregates the probe fan-out),
    * so the pre-hashed scan removes an exchange even where the state
    * frame still broadcasts. 1M sits between the measured rungs. */
  val labelPropBucketedBound = 1L * 1000 * 1000

  /** Max vertex degree the id-sorted WHOLE-ARRAY adjacency artifact
    * ([[graft.operators.GraphOps.sortedAdjPath]]) accepts: one row per
    * vertex means the max row is 8 B × max-degree, and a single row must
    * stay well under the 2 GiB array/row ceiling (Int.MaxValue bytes ⇒
    * ~2.68×10⁸ longs). Capped at 2×10⁸ for headroom (struct + parquet page
    * overhead). A hub past this must use the POSITIONAL-chunk spelling
    * documented at the artifact (chunk c holds positions [c·K, (c+1)·K);
    * walker joins on (w, idx DIV K) after a degree annotate). The artifact
    * build `require`s this against the cheaply-computed max degree BEFORE
    * the collect_list fold runs, so an over-ceiling graph fails at the
    * artifact boundary with this message — not deep inside a parquet
    * write. */
  val maxSortedAdjDegree = 200L * 1000 * 1000
}
