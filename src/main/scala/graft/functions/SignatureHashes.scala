package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document MinHash signature as ONE native expression: for each
  * string in the input array, the [[PolyHash]] fold, then `numHashes`
  * affine rehashes `(A_i·h + i·1000003 + 12345) mod P` with
  * `A_i = ((2i+1)·2654435761) mod P`, keeping the minimum of each — all in
  * a single per-row loop.
  *
  * This replaces the explode → shuffle → 32-column `min` HashAggregate
  * formulation: arithmetic identical (min over the same rehash values of
  * the same distinct shingles — order irrelevant), but the signature is now
  * computed map-side with NO shuffle and no 1M-row intermediate, so the
  * only exchange left in a MinHash dedup pipeline is the LSH band-bucket
  * join — the one that is actually about data placement. At cluster scale
  * this is the difference between shuffling every shingle of a 100 TB
  * corpus and shuffling 32 longs per document. The DuckDB oracle keeps the
  * explode+group-by spelling; both compute the same mins.
  *
  * Returns null for a null input; an empty array yields an all-`P`
  * signature (P is strictly above every reachable hash, so empty inputs
  * form their own degenerate bucket — callers never produce one:
  * [[WordShingles]] always emits at least the whole-text shingle).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSignature.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  import PolyHash.{Mult, P}

  /** Static (forwardable) evaluation shared by interpreted and generated
    * paths. One pass over the shingles; `numHashes` fused mins. */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, P)
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      a(i) = ((2L * i + 1) * Mult) % P
      b(i) = i * 1000003L + 12345L
      i += 1
    }
    val n = arr.numElements()
    var s = 0
    while (s < n) {
      val h = PolyHash.hashUTF8(arr.getUTF8String(s))
      var j = 0
      while (j < numHashes) {
        val v = (a(j) * h + b(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  /** Column-API entry point. */
  def minhash_signature(c: Column, numHashes: Int): Column =
    GraftColumnShim.column(MinHashSignature(GraftColumnShim.expression(c), numHashes))
}

/** LSH band keys straight from the shingle array: the [[MinHashSignature]]
  * mins, folded per band through the PolyHash accumulator
  * `(acc·B + h) mod P`. One native map-side expression from document text
  * to its `bands` bucket keys — the signature array never materializes in
  * the plan, and the first exchange of the whole MinHash pipeline is the
  * band-bucket join itself. Arithmetic identical to the
  * slice-and-fold-the-signature spelling the DuckDB oracle uses. */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {

  require(bands >= 1 && numHashes % bands == 0,
    s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_bands expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashBands.compute(input.asInstanceOf[ArrayData], numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashBands.compute($c, $numHashes, $bands)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBands {
  import PolyHash.{B, P}

  /** Static (forwardable) evaluation: signature mins, then one fold per
    * band over its `numHashes / bands` consecutive rows. */
  def compute(arr: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    val mins = MinHashSignature.compute(arr, numHashes)
    val rows = numHashes / bands
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0L
      var r = 0
      while (r < rows) {
        acc = (acc * B + mins.getLong(b * rows + r)) % P
        r += 1
      }
      keys(b) = acc
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** Column-API entry point. */
  def minhash_bands(c: Column, numHashes: Int, bands: Int): Column =
    GraftColumnShim.column(MinHashBands(GraftColumnShim.expression(c), numHashes, bands))
}

/** Whole-document 64-bit SimHash as ONE native expression: per word the
  * [[PolyHash]] fold, three large-multiplier rehashes (the 64 bit planes —
  * bits 0–30 from plane 0, 31–61 from plane 1, 62–63 from plane 2), ±1
  * votes per bit over all words (multiplicity counts), sign bits packed
  * into one long.
  *
  * Replaces the explode-words → shuffle → 64-column `sum` HashAggregate:
  * identical arithmetic (the vote sum is commutative), computed map-side
  * with no shuffle and no per-word intermediate rows. Rehash constants are
  * shared with the DuckDB oracle via [[graft.operators.DedupOps.SimhashRehash]].
  */
case class SimHash64(child: Expression, a0: Long, b0: Long, a1: Long, b1: Long, a2: Long, b2: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData], a0, b0, a1, b1, a2, b2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHash64.compute($c, ${a0}L, ${b0}L, ${a1}L, ${b1}L, ${a2}L, ${b2}L)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  import PolyHash.P

  /** Static (forwardable) evaluation shared by interpreted and generated
    * paths: one pass over the words, 64 int vote counters on the stack. */
  def compute(arr: ArrayData, a0: Long, b0: Long, a1: Long, b1: Long, a2: Long, b2: Long): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var w = 0
    while (w < n) {
      val h = PolyHash.hashUTF8(arr.getUTF8String(w))
      val m0 = (a0 * h + b0) % P
      val m1 = (a1 * h + b1) % P
      val m2 = (a2 * h + b2) % P
      var j = 0
      while (j < 31) {
        votes(j) += (if (((m0 >> j) & 1L) == 1L) 1 else -1)
        votes(j + 31) += (if (((m1 >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      votes(62) += (if (((m2 >> 0) & 1L) == 1L) 1 else -1)
      votes(63) += (if (((m2 >> 1) & 1L) == 1L) 1 else -1)
      w += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** Column-API entry point; rehash planes passed explicitly so the
    * constants live in exactly one place ([[graft.operators.DedupOps.SimhashRehash]]). */
  def simhash64(c: Column, planes: Seq[(Long, Long)]): Column = {
    require(planes.length == 3, s"simhash64 needs exactly 3 rehash planes, got ${planes.length}")
    val Seq((a0, b0), (a1, b1), (a2, b2)) = planes
    GraftColumnShim.column(SimHash64(GraftColumnShim.expression(c), a0, b0, a1, b1, a2, b2))
  }
}
