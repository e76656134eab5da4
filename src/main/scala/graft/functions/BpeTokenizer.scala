package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Embedded deterministic BPE tokenizer (ordered-merge variant).
  *
  * The public BPE algorithm (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") learns an ordered table of
  * symbol-pair merges; encoding applies merges to a word that starts as its
  * character sequence. This implementation uses the *ordered-application*
  * encoding: each merge rule is applied exactly once, in table order, as a
  * single left-to-right non-overlapping pass over the word's current symbol
  * sequence. That variant is chosen deliberately — it is expressible as a
  * fold of plain string `replace` calls, which lets the DuckDB oracle replay
  * tokenization EXACTLY ([[BpeTable.duckCountSql]]), the same portability
  * bar every other signature pipeline here meets (see
  * [[PolyHash]]'s rationale). For a table in learned order the two variants
  * rarely differ (a merge's constituent symbols always precede it in the
  * table), and determinism + replayability is what a *pipeline* needs from
  * a tokenizer: the packing and token-budget numbers must be reproducible
  * by any engine that audits them.
  *
  * The merges table is a small fixed English table in learned-style order
  * (frequent character pairs first, longer compositions after the pairs
  * they build on). Unknown characters and unmerged residues count one
  * token each — no <unk> collapse, so token counts are defined for ANY
  * input string. Whitespace (the pre-tokenizer split) is not a token.
  *
  * Scale: tokenization is a pure map-side expression — zero shuffle at any
  * corpus size. A bounded memo (word → count) exploits natural-language
  * vocabulary skew; the cap keeps executor memory fixed on adversarial
  * (all-unique-words) input, at which point the cost degrades gracefully to
  * the raw O(rules × word length) merge loop per word.
  */
object BpeTable {

  /** Ordered merges (highest priority first). Each rule merges an adjacent
    * symbol pair (x, y) into x+y. Compositions appear strictly after the
    * rules producing their constituents. */
  val merges: Vector[(String, String)] = Vector(
    // frequent character pairs
    ("t", "h"), ("i", "n"), ("e", "r"), ("a", "n"), ("o", "r"),
    ("a", "t"), ("s", "t"), ("a", "r"), ("l", "e"), ("o", "w"),
    ("r", "e"), ("r", "o"), ("l", "o"), ("a", "l"), ("u", "e"),
    ("a", "s"), ("c", "h"), ("e", "y"), ("g", "g"), ("u", "p"),
    ("u", "m"), ("a", "m"), ("c", "o"), ("c", "t"), ("v", "e"),
    ("b", "i"), ("f", "i"), ("o", "m"),
    // compositions (each constituent produced above / earlier)
    ("th", "e"), ("in", "e"), ("in", "d"), ("r", "ow"), ("l", "ow"),
    ("s", "low"), ("s", "c"), ("sc", "an"), ("a", "st"), ("f", "ast"),
    ("b", "le"), ("a", "ble"), ("t", "able"), ("al", "ue"), ("v", "alue"),
    ("p", "ar"), ("par", "t"), ("h", "as"), ("has", "h"), ("l", "ine"),
    ("s", "or"), ("sor", "t"), ("w", "ind"), ("wind", "ow"), ("m", "er"),
    ("g", "e"), ("mer", "ge"), ("b", "at"), ("bat", "ch"), ("s", "par"),
    ("spar", "k"), ("or", "d"), ("ord", "er"), ("d", "at"), ("dat", "a"),
    ("co", "l"), ("um", "n"), ("col", "umn"), ("o", "in"), ("j", "oin"),
    ("m", "al"), ("mal", "l"), ("s", "mall"), ("u", "st"), ("c", "ust"),
    ("cust", "om"), ("custom", "er"), ("u", "er"), ("q", "uer"),
    ("quer", "y"), ("bi", "g"), ("g", "ro"), ("gro", "up"), ("st", "re"),
    ("stre", "am"), ("ve", "ct"), ("vect", "or"), ("fi", "l"), ("t", "er"),
    ("fil", "ter"), ("k", "ey"), ("a", "gg"),
  )

  /** Memo cap: beyond this many distinct words per executor the memo stops
    * admitting (no eviction churn); existing entries keep serving. */
  private val memoCap = 1 << 16
  private val memo = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** The ordered-merge pass: one word (no spaces) → its final symbol
    * sequence. Shared by the count path ([[countWord]]) and the sequence
    * path ([[tokenizeWord]]). */
  private def mergeWord(word: String): scala.collection.mutable.ArrayBuffer[String] =
    mergeWordN(word, merges.length)

  /** [[mergeWord]] under only the first `nRules` merges — a mid-training
    * tokenizer state (used by the trainer-step pair statistic). */
  private def mergeWordN(word: String, nRules: Int): scala.collection.mutable.ArrayBuffer[String] = {
    // symbols start as codepoints
    var syms = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      syms += word.substring(i, i + n)
      i += n
    }
    merges.take(nRules).foreach { case (x, y) =>
      if (syms.length >= 2) {
        var changed = false
        var j = 0
        while (!changed && j + 1 < syms.length) { // cheap pre-scan
          changed = syms(j) == x && syms(j + 1) == y
          j += 1
        }
        if (changed) { // one left-to-right non-overlapping pass
          val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          var p = 0
          while (p < syms.length) {
            if (p + 1 < syms.length && syms(p) == x && syms(p + 1) == y) {
              out += x + y; p += 2
            } else { out += syms(p); p += 1 }
          }
          syms = out
        }
      }
    }
    syms
  }

  /** Token count of one word (no spaces), by ordered-merge BPE. */
  def countWord(word: String): Long = {
    if (word.isEmpty) return 0L
    val cached = memo.get(word)
    if (cached ne null) return cached.longValue()
    val n = mergeWord(word).length.toLong
    if (memo.size < memoCap) memo.put(word, n)
    n
  }

  /** Symbol sequence of one word under the first `nRules` merges — the
    * expression body of [[BpeTokens]], static-forwardable for generated
    * code. Empty word → empty array. `nRules = merges.length` is the full
    * tokenizer; a smaller value is a mid-training state. */
  def tokenizeWord(word: UTF8String, nRules: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val w = word.toString
    if (w.isEmpty)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val syms = mergeWordN(w, nRules)
    val out = new Array[Any](syms.length)
    var i = 0
    while (i < syms.length) { out(i) = UTF8String.fromString(syms(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Token count of a text: sum over its single-space-split words. Called
    * from generated code — must stay a static-forwardable method. */
  def countTokens(text: UTF8String): Long = {
    var total = 0L
    text.toString.split(" ", -1).foreach(w => total += countWord(w))
    total
  }

  /** Reference implementation by literal string replacement — the exact
    * computation [[duckCountSql]] runs in DuckDB, kept in Scala so a spec
    * can pin the native merge loop to it property-style. Each word is
    * framed " s1  s2  s3 " (double separators, so one rule's consecutive
    * matches never share a boundary character) and each rule is ONE
    * `String.replace` (left-to-right, non-overlapping — the same semantics
    * as the merge pass). */
  def countTokensViaReplace(text: String): Long =
    text.split(" ", -1).map { w =>
      if (w.isEmpty) 0L
      else {
        val cps = new scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < w.length) {
          val cp = w.codePointAt(i); val n = Character.charCount(cp)
          cps += w.substring(i, i + n); i += n
        }
        var s = cps.mkString(" ", "  ", " ")
        merges.foreach { case (x, y) => s = s.replace(s" $x  $y ", s" $x$y ") }
        s.trim.split("  ", -1).length.toLong
      }
    }.sum

  /** DuckDB replay of [[countTokens]] for a SQL expression `textExpr`:
    * per word, fold the merges table over the double-separator framing with
    * `replace`, then count symbols. Variable names are chosen not to
    * collide when nested (the fold binds `bacc`/`brule`; the comprehensions
    * bind `bwrd`/`bj`). */
  def duckCountSql(textExpr: String): String =
    s"""list_reduce(list_prepend(0::BIGINT,
         [CASE WHEN bwrd = '' THEN 0::BIGINT ELSE
            len(${duckSymbolsSql("bwrd")})::BIGINT END
          FOR bwrd IN string_split($textExpr, ' ')]),
       (a, c) -> a + c)"""

  /** DuckDB replay of [[tokenizeWord]] for a one-word SQL expression: the
    * merges fold over the double-separator framing, split back into the
    * symbol list. `wordExpr` must not contain spaces (pre-split upstream)
    * and must be non-empty (guard upstream — '' yields a 1-element list in
    * SQL where [[tokenizeWord]] yields an empty array). */
  def duckSymbolsSql(wordExpr: String, nRules: Int = merges.length): String = {
    val rules = merges.take(nRules).map { case (x, y) => s"'$x $y'" }.mkString("[", ", ", "]")
    s"""string_split(trim(
          list_reduce(list_prepend(
            ' ' || array_to_string([($wordExpr)[bj:bj] FOR bj IN range(1, len($wordExpr) + 1)], '  ') || ' ',
            $rules),
            (bacc, brule) -> replace(bacc,
              ' ' || replace(brule, ' ', '  ') || ' ',
              ' ' || replace(brule, ' ', '') || ' '))),
          '  ')"""
  }

  /** Column-API entry point. */
  def bpe_token_count(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnShim
    GraftColumnShim.column(BpeTokenCount(GraftColumnShim.expression(c)))
  }

  /** The number of plain character-pair rules heading [[merges]] (the
    * compositions start after them) — the mid-training state the
    * trainer-step statistic evaluates. */
  val charPairRules: Int = 28

  /** Column-API entry point: symbol sequence of a single WORD under the
    * first `nRules` merges. */
  def bpe_tokens(c: Column, nRules: Int = merges.length): Column = {
    import org.apache.spark.sql.GraftColumnShim
    GraftColumnShim.column(BpeTokens(GraftColumnShim.expression(c), nRules))
  }
}

/** `bpe_token_count(text)`: total ordered-merge BPE tokens of `text` (see
  * [[BpeTable]]). Codegen is a static call — the expression stays inside
  * whole-stage codegen like the other signature primitives. */
case class BpeTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(input: Any): Any =
    BpeTable.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeTable.countTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** `bpe_tokens(word)`: the ordered-merge BPE symbol sequence of one word
  * (see [[BpeTable.tokenizeWord]]). The sequence form feeds pair
  * statistics — the per-merge-step count a BPE *trainer* computes — where
  * [[BpeTokenCount]] only needs the length. Codegen is a static call, so
  * the expression stays inside whole-stage codegen. */
case class BpeTokens(child: Expression, nRules: Int) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, StringType}
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"

  override def nullSafeEval(input: Any): Any =
    BpeTable.tokenizeWord(input.asInstanceOf[UTF8String], nRules)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeTable.tokenizeWord($c, $nRules)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}
