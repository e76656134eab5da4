package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time lookup): for each left row, the latest right row
  * with the same key and `rightTime <= leftTime`.
  *
  * Spark has no built-in as-of join; per the preference order (compose
  * built-ins > custom Expression > custom SparkPlan) this composes exactly
  * two primitives: a union of both sides and one window pass — the
  * "union + last_value(ignoreNulls)" formulation.
  *
  * Scale shape: ONE shuffle of (key, time)-tagged rows and a per-key sort —
  * identical movement to the sort-merge join Spark would do anyway, with no
  * range-explosion: each left row matches exactly once, so the operator never
  * produces more than |left| rows, unlike an inequality join + argmax
  * (which materializes every candidate pair first). Skewed keys behave like
  * any window partition (AQE-sized); time-ordering within a key is the sort
  * Spark already does for the window.
  */
object AsOfJoin {

  /** @param payload     right-side columns to carry onto matched left rows
    * @param direction   "backward" (latest right ≤ left time — the default
    *                    point-in-time lookup) or "forward" (earliest right
    *                    ≥ left time — "next event after T")
    * @param toleranceUs when set, a match further than this many µs from the
    *                    left time is nulled out (pandas merge_asof
    *                    `tolerance`); requires timestamp-typed time columns */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      payload: Seq[(Column, String)],
      direction: String = "backward",
      toleranceUs: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward", direction)

    val leftCols = left.columns.toSeq
    val pNames = payload.map(_._2)
    // matched right time rides inside the struct so the tolerance test sees
    // exactly the row the window picked
    val pWithT = payload :+ (rightTime -> "__rt")

    // the payload travels as ONE struct so last(ignoreNulls) picks the
    // latest right ROW atomically: a matched row whose payload *fields* are
    // null still matches (the struct itself is non-null), and multi-column
    // payloads can never mix fields from different right rows
    val l = left.select(
      (leftCols.map(c => left(c).as(c)) :+
        leftKey.as("__k") :+ leftTime.as("__t") :+ lit(1).as("__is_left")) :+
        lit(null).cast(right.select(
          struct(pWithT.map { case (c, n) => c.as(n) }: _*).as("__p")
        ).schema.head.dataType).as("__p"): _*)
    val r = right.select(
      (leftCols.map(c => lit(null).cast(left.select(left(c)).schema.head.dataType).as(c)) :+
        rightKey.as("__k") :+ rightTime.as("__t") :+ lit(0).as("__is_left")) :+
        struct(pWithT.map { case (c, n) => c.as(n) }: _*).as("__p"): _*)

    // backward walks time ascending (latest right ≤ t wins); forward walks
    // descending (earliest right ≥ t wins). Either way right rows sort
    // before left rows at equal time → inclusive match semantics.
    val ord = if (direction == "forward") col("__t").desc else col("__t").asc
    val w = Window.partitionBy(col("__k"))
      .orderBy(ord, col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r)
      .select((leftCols.map(col) :+ col("__is_left") :+ col("__t")) :+
        last(col("__p"), ignoreNulls = true).over(w).as("__m"): _*)
      .filter(col("__is_left") === 1)
    val keep = toleranceUs match {
      case None => lit(true)
      case Some(tol) =>
        // cast through TimestampType: parquet times arrive as NTZ, and the
        // session is pinned UTC so the epoch arithmetic is unambiguous
        val rt = unix_micros(col("__m.__rt").cast("timestamp"))
        val lt = unix_micros(col("__t").cast("timestamp"))
        val gap = if (direction == "forward") rt - lt else lt - rt
        col("__m").isNotNull && gap <= tol
    }
    matched.select(leftCols.map(col) ++
      pNames.map(n => when(keep, col(s"__m.$n")).as(n)): _*)
  }
}
