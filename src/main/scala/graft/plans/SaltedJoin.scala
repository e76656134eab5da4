package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join handling splits oversized *partitions* at runtime and is
  * the first line of defense; salting is the explicit fallback for the case
  * AQE can't fix — a single join *key* so hot that one key's rows exceed an
  * executor (AQE can split a skewed sort-merge partition, but a broadcast-
  * ineligible hot key inside one partition still serializes its build side).
  *
  * Shape: the skewed (large) side gets a deterministic salt derived from
  * row content, widening each hot key into `factor` sub-keys; the small side
  * replicates `factor`× with every salt value. Join on (key, salt) then drop
  * the salt. Semantics are exactly the plain equi-join's (asserted in
  * SaltedJoinSpec); the cost is `factor`× the small side, the win is the hot
  * key spreading over `factor` tasks.
  */
object SaltedJoin {

  /** @param saltOf deterministic salt in [0, factor) for each large-side row;
    *               defaults to a hash of all columns (stable, no RNG). */
  def join(
      large: DataFrame,
      small: DataFrame,
      largeKey: Column,
      smallKey: Column,
      factor: Int,
      saltOf: Option[Column] = None): DataFrame = {

    val salt = saltOf.getOrElse(
      pmod(xxhash64(large.columns.map(large(_)).toSeq: _*), lit(factor)))
    val l = large.withColumn("__salt", salt.cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    l.join(s, largeKey === smallKey && l("__salt") === s("__salt"))
      .drop("__salt")
  }
}
