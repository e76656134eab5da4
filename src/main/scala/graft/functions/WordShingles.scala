package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-gram shingles of a space-separated text, as a native
  * Catalyst expression.
  *
  * Replaces the declarative formulation
  * `array_distinct(transform(sequence(0, n-k), i -> concat_ws(' ',
  * element_at(ws,i+1), …)))`, which evaluates ~4 interpreted expression nodes
  * per shingle *position* (higher-order functions don't join whole-stage
  * codegen): one eval call per row, one tight loop over the split words, no
  * per-position expression dispatch — ~10× faster shingling, which is the
  * front of every dedup signature pipeline. Short texts (< k words) yield
  * the whole text as the single shingle, preserving the composed
  * formulation's semantics.
  *
  * Generates a static call into [[WordShingles.compute]] rather than taking
  * `CodegenFallback`: the call itself is the same either way, but a fallback
  * expression disqualifies its whole operator from whole-stage codegen
  * (`CollapseCodegenStages` rejects the stage), which pushed the
  * per-document shingling projection — the front of every dedup pipeline —
  * into interpreted row-at-a-time evaluation.
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  import org.apache.spark.sql.GraftColumnShim

  private val space = UTF8String.fromString(" ")

  /** Distinct word k-gram shingles; the expression's whole evaluation, kept
    * static-forwardable so generated code can call it directly. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val words = text.split(space, -1)
    val n = words.length
    if (n < k) return new GenericArrayData(Array[Any](text))
    val seen = new java.util.LinkedHashSet[UTF8String](math.max(16, n * 2))
    var i = 0
    while (i <= n - k) {
      // concatWs over the k-word window
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = words(i + j); j += 1 }
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next(); m += 1 }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def word_shingles(c: Column, k: Int): Column =
    GraftColumnShim.column(WordShingles(GraftColumnShim.expression(c), k))
}
