package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

import graft.{Limits, Tables}

/** Size gates for DIMENSION-scaling broadcasts outside the graph family —
  * the [[GraphOps.gatedBc]] convention generalized to the relational
  * queries' dimension legs.
  *
  * The TPC-H-shaped dimensions are not fixed-size: `customer`, `part`,
  * `supplier`, `orders` all grow linearly with scale factor (the official
  * ratios: 150k/200k/10k/1.5M rows PER SF), so at the SF ≈ 100k the 100 TB
  * regime implies, `customer` is ~15 G rows — an unconditional
  * `broadcast(customer-derived frame)` is a driver OOM, the same
  * scale-killer class the graph family's vertex gates closed. `nation`
  * (25 rows) and `region` (5) are fixed at every SF and stay unconditional,
  * as do one-row census/total frames and enum-bounded groups.
  *
  * Below the cap the frame broadcasts (the sf-scale fast path, locally
  * always taken — plans and results are byte-identical to the ungated
  * spelling); past it the join flips to a keyed SHUFFLE_HASH build side:
  * the fact stream shuffles once on the join key but the plan stays
  * hash-probe-shaped, never a sort of the fact table. Results are
  * bit-identical either way (RoundElevenSpec drives representative queries
  * down both paths and compares collected rows).
  *
  * The gate scalar is the BASE table's row count — one columnless count
  * per (table, data version, JVM), memoized on the same content
  * fingerprint every artifact keys on ([[graft.plans.ArtifactCache
  * .fingerprint]]: path + length + mtime + head/tail sample per file), so
  * an in-place fixture rewrite refreshes the memo instead of serving a
  * stale count. A frame DERIVED from a base table (a filtered slice, a
  * per-key aggregate) is gated on that base table's count — an
  * over-approximation in the SAFE direction only: it can flip a
  * still-broadcastable filtered frame to shuffle-hash early, never
  * broadcast an over-sized one.
  */
private[graft] object DimGates {

  private val countMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Row count of a base fixture table, memoized per content fingerprint. */
  private[graft] def dimCount(s: SparkSession, d: String, table: String): Long =
    countMemo.computeIfAbsent(
      table + "#" + graft.plans.ArtifactCache.fingerprint(d, Seq(table), Nil),
      _ => Long.box(Tables.load(s, d, table).count())).longValue()

  /** Session-conf override of the gate cap — spec instrumentation only
    * (set to 0 to force every gated site down the shuffle-hash path on
    * sf-scale fixtures). Production reads [[Limits.maxBroadcastDimRows]]. */
  private[graft] val CapKey = "graft.dimGate.maxRows"

  private def cap(s: SparkSession): Long =
    s.conf.getOption(CapKey).map(_.toLong).getOrElse(Limits.maxBroadcastDimRows)

  /** True while `table`'s row count sits under `capMultiplier × cap` —
    * the gate scalar for frames whose worst-case size is a KNOWN FRACTION
    * of a base table (e.g. the anchor-star frame holds at most
    * ⌈rows/(maxBucket+1)⌉ entries, so it broadcasts while the corpus is
    * under (maxBucket+1) × cap). */
  private[graft] def smallUnder(s: SparkSession, d: String, table: String,
      capMultiplier: Long = 1L): Boolean =
    dimCount(s, d, table) <= capMultiplier * cap(s)

  /** Gate a frame derived from `table`: broadcast while the base table is
    * under the cap, keyed shuffle-hash build past it. `rowFactor` is the
    * frame's worst-case rows PER base-table row (e.g. the derived partsupp
    * carries exactly 4 rows per part, so a partsupp-bounded frame gates at
    * rowFactor = 4) — without it the gate under-approximates and can
    * broadcast a frame rowFactor× past the cap, the one direction the
    * invariant forbids. */
  private[graft] def gated(s: SparkSession, d: String, table: String,
      rowFactor: Long = 1L)(df: DataFrame): DataFrame =
    if (dimCount(s, d, table) * rowFactor <= cap(s)) broadcast(df)
    else df.hint("shuffle_hash")
}
