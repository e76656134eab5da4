package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types._

/** Bounded-memory LSH-bucket membership summary: one aggregation pass
  * producing, per bucket, the `cap` smallest member ids (sorted ascending)
  * and the EXACT member count — O(cap) state per bucket no matter how many
  * members a degenerate bucket (corpus-wide boilerplate, empty string)
  * accumulates, with map-side partial aggregation before the shuffle.
  *
  * This replaces the two-aggregation + two-join candidate scaffold (stats
  * pass, small-bucket semi-join, collect_set pass, big-bucket join): a
  * single shuffle on the bucket key yields everything candidate generation
  * needs — the full sorted member list when `n <= cap` (the list is
  * complete below the cap), and the anchor (= smallest id) plus the true
  * count when the bucket is oversized.
  */
class BucketMembersAgg(cap: Int)
    extends Aggregator[Long, (Seq[Long], Long), (Seq[Long], Long)] {

  /** Insert `a` into ascending `ids`, keeping at most `cap` smallest and
    * dropping duplicates (bucket member rows are unique upstream, but merge
    * of partials must stay idempotent-safe anyway). */
  private def insert(ids: Seq[Long], a: Long): Seq[Long] = {
    if (ids.contains(a)) ids
    else if (ids.size < cap) (ids :+ a).sorted
    else if (a >= ids.last) ids
    else ((ids :+ a).sorted).take(cap)
  }

  override def zero: (Seq[Long], Long) = (Vector.empty, 0L)
  override def reduce(b: (Seq[Long], Long), a: Long): (Seq[Long], Long) =
    (insert(b._1, a), b._2 + 1)
  override def merge(b1: (Seq[Long], Long), b2: (Seq[Long], Long)): (Seq[Long], Long) =
    ((b1._1 ++ b2._1).distinct.sorted.take(cap), b1._2 + b2._2)
  override def finish(b: (Seq[Long], Long)): (Seq[Long], Long) = b
  override def bufferEncoder: Encoder[(Seq[Long], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[(Seq[Long], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object BucketMembersAgg {
  /** `bucket_members(doc_id)` as a Column aggregate; output struct fields
    * `_1` = capped sorted ids, `_2` = exact count. */
  def bucket_members(cap: Int, id: Column): Column = {
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    org.apache.spark.sql.functions.udaf(new BucketMembersAgg(cap)).apply(id)
  }
}

/** All ordered pairs (ids[i], ids[j]), i < j, of an ascending long array, as
  * ONE native expression returning `array<struct<a:bigint,b:bigint>>`.
  *
  * Replaces the nested higher-order-function spelling
  * `flatten(transform(ids, (x, i) -> transform(slice(ids, i+2, n), ...)))`,
  * which Catalyst evaluates as interpreted lambdas outside whole-stage
  * codegen and whose nested-lambda analysis dominates first-run planning
  * time. Input arrays are bounded by the bucket cap upstream, so the output
  * is at most cap·(cap−1)/2 structs.
  */
case class LongPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", LongType, nullable = false),
                   StructField("b", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "long_pairs"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"long_pairs expects array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    LongPairs.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LongPairs.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): LongPairs =
    copy(child = newChild)
}

object LongPairs {
  /** Static (forwardable) evaluation shared by interpreted and generated
    * paths. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = arr.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](a, arr.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def long_pairs(c: Column): Column =
    GraftColumnShim.column(LongPairs(GraftColumnShim.expression(c)))
}

/** [[LongPairs]] with each pair packed into ONE bigint, `(a << 32) | b` —
  * for pair streams that are immediately shuffled and aggregated (wedge
  * counting, co-occurrence candidate generation): a primitive-long array
  * costs no per-pair row allocation at expansion time, the downstream
  * exchange carries an 8-byte key instead of a 16-byte struct, and the hash
  * aggregate runs on a primitive key. Requires every id to fit in an
  * unsigned 31-bit slot (`0 <= id < 2^31` — dimension keys, not row ids);
  * out-of-range input fails fast rather than aliasing two pairs.
  */
case class LongPairsPacked(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "long_pairs_packed"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"long_pairs_packed expects array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    LongPairsPacked.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LongPairsPacked.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): LongPairsPacked =
    copy(child = newChild)
}

object LongPairsPacked {
  /** Static (forwardable) evaluation shared by interpreted and generated
    * paths. One primitive array out; no per-pair allocation. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      require(v >= 0L && v < (1L << 31),
        s"long_pairs_packed id out of 31-bit range: $v")
      i += 1
    }
    val out = new Array[Long](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      val hi = arr.getLong(i) << 32
      var j = i + 1
      while (j < n) {
        out(k) = hi | arr.getLong(j)
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def long_pairs_packed(c: Column): Column =
    GraftColumnShim.column(LongPairsPacked(GraftColumnShim.expression(c)))
}
