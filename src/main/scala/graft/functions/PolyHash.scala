package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-neutral polynomial string hash:
  * `h = fold(codepoints)(0)((acc, c) => (acc * 1000003 + c) mod P)` with
  * `P = 2147483647` (the Mersenne prime 2^31 − 1).
  *
  * This replaces `xxhash64` at the front of the signature pipelines
  * (minhash / simhash / fingerprint) precisely because it is *portable*: the
  * same fold is expressible in DuckDB 1.0 via `list_reduce`, which lets the
  * driver's oracle replay the whole signature pipeline in SQL (the pattern
  * proven by `SimilarityOps.ivfOracle`).
  *
  * Why a 31-bit space and not a 55-bit one: mixing. Hash values and rehash
  * multipliers both below 2^31 keep every product under 2^62 — inside ANSI
  * Long range on both engines — which permits LARGE multipliers (2654435761,
  * Knuth's 2^32/φ) in [[PolyHash.affine]]. A 2^55-scale modulus forces
  * multipliers under 2^8, and an affine map with a tiny multiplier barely
  * wraps the modulus for small inputs, so low bits of short-word hashes pass
  * straight through (measured: every long document collapsed to the same
  * simhash signature). 31 well-mixed bits beat 55 unmixed ones everywhere a
  * signature is min-ed, banded, or bit-sampled.
  *
  * Iteration is by Unicode codepoint (what DuckDB's `unicode(char)` yields),
  * not UTF-8 byte, so the two engines agree beyond ASCII too.
  *
  * Generates real code (a static call into [[PolyHash.hashUTF8]], which
  * decodes codepoints straight off the UTF-8 bytes — no String allocation).
  * This is NOT a micro-optimization of the hash itself: a `CodegenFallback`
  * expression disqualifies its whole operator from whole-stage codegen
  * (`CollapseCodegenStages` rejects any stage containing one), so the
  * fallback variant forced the entire per-shingle projection — the highest
  * row-count stage of every dedup pipeline — into interpreted row-at-a-time
  * evaluation.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any =
    PolyHash.hashUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hashUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  import org.apache.spark.sql.GraftColumnShim

  /** Modulus: Mersenne prime 2^31 − 1. */
  val P = 2147483647L
  /** Fold multiplier (prime, ~2^20): each codepoint's influence reaches every
    * bit after two fold steps; P * B < 2^51 keeps the fold overflow-free. */
  val B = 1000003L
  /** Affine multiplier base: Knuth's multiplicative constant 2^32/φ. */
  val Mult = 2654435761L

  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * B + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** [[hash]] computed directly over the UTF-8 byte encoding — decodes each
    * codepoint from the bytes without materializing a java.lang.String.
    * Identical to `hash(s.toString)` for any valid UTF-8 input (a 4-byte
    * sequence is one codepoint here and one surrogate PAIR there, but
    * `codePointAt` re-fuses the pair). Called from generated code, so it
    * must stay a static-forwardable method on this object. */
  def hashUTF8(s: UTF8String): Long = {
    val n = s.numBytes
    var h = 0L
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xff
      var cp = 0
      var len = 1
      if (b0 < 0x80) cp = b0
      else if ((b0 & 0xe0) == 0xc0) { cp = b0 & 0x1f; len = 2 }
      else if ((b0 & 0xf0) == 0xe0) { cp = b0 & 0x0f; len = 3 }
      else { cp = b0 & 0x07; len = 4 }
      var j = 1
      while (j < len) { cp = (cp << 6) | (s.getByte(i + j) & 0x3f); j += 1 }
      h = (h * B + cp) % P
      i += len
    }
    h
  }

  /** The i-th universal-family rehash of a PolyHash value:
    * `(A_i * h + i * 1000003 + 12345) mod P` with
    * `A_i = ((2i + 1) * 2654435761) mod P`. A_i and h are both < 2^31, so
    * the product is < 2^62 — ANSI-safe on both engines — and the large
    * multiplier avalanches every input bit (distinct odd i give distinct
    * permutations of Z_P). */
  def affine(i: Int, h: Column): Column = {
    import org.apache.spark.sql.functions._
    val a = ((2L * i + 1) * Mult) % P
    pmod(lit(a) * h + lit(i * 1000003L + 12345L), lit(P))
  }

  /** Same rehash as a SQL fragment (Spark SQL and DuckDB read it alike);
    * `i` may be a column reference, so A_i is spelled out as arithmetic. */
  def affineSql(i: String, h: String): String =
    s"((((2 * $i + 1) * $Mult) % $P) * $h + $i * 1000003 + 12345) % $P"

  /** DuckDB replay of [[hash]] for an expression `s` (ASCII or not). The
    * `::BIGINT` casts matter: DuckDB types the fold accumulator from the
    * initial element, and an INT32 accumulator overflows before the mod. */
  def duckSql(s: String): String =
    s"""list_reduce(list_prepend(0::BIGINT, [unicode(($s)[i])::BIGINT FOR i IN range(1, len($s) + 1)]),
        (a, c) -> (a * $B + c) % $P)"""

  /** Column-API entry point. */
  def poly_hash(c: Column): Column =
    GraftColumnShim.column(PolyHash(GraftColumnShim.expression(c)))
}
