package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.plans.Checkpoints.SweepSyntax

/** Text-analysis operators for LLM-data pipelines (SURVEY.md §2C) over the
  * `documents` fixture. All are single-pass, codegen-friendly column
  * expressions — no UDFs, no shuffles beyond the final aggregate/sort — so
  * they stream over 100 TB of parquet at IO speed.
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "documents")

  private val stopwords = Seq("the", "a")
  private def words(c: Column): Column = split(c, " ")

  /** Corpus stats: language distribution + char-count moments (exact integer
    * sums; the avg divides two exact values so it is order-insensitive). */
  val textStats: Q = (s, d) =>
    docs(s, d).groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        (sum(col("n_chars")).cast(DoubleType) / count(lit(1))).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"))

  /** Per-document quality signals: token count, mean word length, stopword
    * ratio, and a composite score — the length/punct/stopword heuristics of
    * C4/Gopher-style quality filtering, as pure column arithmetic. */
  val textQuality: Q = (s, d) =>
    docs(s, d)
      .withColumn("ws", words(col("text")))
      .select(
        col("doc_id"),
        size(col("ws")).cast(LongType).as("n_words"),
        (col("n_chars").cast(DoubleType) / size(col("ws"))).as("avg_word_len"),
        (size(filter(col("ws"), w => w.isin(stopwords.map(x => x: Any): _*)))
          .cast(DoubleType) / size(col("ws"))).as("stop_ratio"))
      .withColumn("quality",
        round(least(lit(1.0), col("n_words").cast(DoubleType) / 100) * (lit(1.0) - col("stop_ratio")), 6))
      .orderBy(col("doc_id"))

  /** Token counting with the embedded ordered-merge BPE tokenizer
    * ([[graft.functions.BpeTable]]): `n_bpe_tokens` is the subword count a
    * training pipeline budgets by, `n_ws_tokens` the whitespace word count
    * for comparison. One codegen'd map-side pass, zero shuffle. */
  val textTokenCount: Q = (s, d) =>
    docs(s, d).select(
        col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_ws_tokens"),
        graft.functions.BpeTable.bpe_token_count(col("text")).as("n_bpe_tokens"))
      .orderBy(col("doc_id"))

  /** Tokenizer fertility by language: BPE subwords per whitespace word and
    * characters per subword, per language — the standard multilingual
    * tokenizer audit (a language whose fertility is far above the corpus
    * mean pays proportionally more sequence length per word, which skews
    * both token budgets and per-language loss weighting; this table is what
    * motivates vocab rebalancing). Exact integer sums per language (counts
    * from the same codegen'd map-side [[graft.functions.BpeTable]] pass as
    * `text_token_count`, zero shuffle before the language-keyed aggregate);
    * the two float ratios divide exact longs once, identical formula text
    * in the oracle. Output is language-cardinality. */
  val tokenizerFertility: Q = (s, d) =>
    docs(s, d).select(
        col("lang"),
        size(split(col("text"), " ")).cast(LongType).as("ws"),
        graft.functions.BpeTable.bpe_token_count(col("text")).as("bpe"),
        col("n_chars"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("n_words"),
        sum(col("bpe")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
        round(col("n_tokens").cast(DoubleType) / col("n_words").cast(DoubleType), 6)
          .as("fertility"),
        round(col("n_chars").cast(DoubleType) / col("n_tokens").cast(DoubleType), 6)
          .as("chars_per_token"))
      .orderBy(col("lang"))

  /** BPE-trainer step statistic: the corpus-wide adjacent-symbol-pair
    * frequencies a BPE trainer (Sennrich et al. 2016) computes to choose
    * its next merge rule — evaluated at the mid-training state after the
    * [[graft.functions.BpeTable.charPairRules]] character-pair merges, so
    * the top of the ranking is literally the composition rule the embedded
    * table learns next. Top 20 pairs, count-desc with a deterministic pair
    * tiebreak.
    *
    * Round 13 applies the WORD-HISTOGRAM fold (this is exactly how
    * Sennrich's reference trainer runs — pair stats over the word
    * vocabulary weighted by word frequency, never over raw occurrences,
    * and the dedup family's content-fold principle one level down): fold
    * occurrences to (word, m) first — one vocabulary-bounded exchange
    * with map-side partials — then tokenize each DISTINCT word ONCE and
    * weight its pairs by m. The iterative-merge BPE eval is the expensive
    * leg, and Zipf makes distinct words a sliver of occurrences (the
    * synthetic sf0.1 fixture: 31 distinct vs 271k occurrences; a real
    * corpus is vocabulary-vs-corpus, still orders of magnitude; measured
    * 2.64 → 0.60 s median same-session). `sum(m)` over the fold is
    * bit-identical to `count(1)` over occurrences, so the DuckDB oracle's
    * per-occurrence replay is untouched ([[RoundThirteenSpec]] pins the
    * spelling equality on the fixture). Pair counting still
    * partial-aggregates map-side (symbol-pair vocabulary on the
    * exchange), top-20 stays a TakeOrdered k-merge; pairs never cross
    * word boundaries (BPE's pre-tokenizer contract). */
  val textBpePairs: Q = (s, d) =>
    docs(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("m"))
      .select(graft.functions.BpeTable.bpe_tokens(col("w"),
        graft.functions.BpeTable.charPairRules).as("ss"), col("m"))
      .filter(size(col("ss")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ss) - 1), i -> concat(element_at(ss, i), ' ', element_at(ss, i + 1)))")).as("pair"), col("m"))
      .groupBy(col("pair"))
      .agg(sum(col("m")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(20)

  /** Marker-word language ID: count hits from tiny per-language marker sets,
    * argmax with a fixed tie order (en > de > es > fr > zh). A real system
    * would use char-trigram profiles; the *shape* — one pass, per-row column
    * arithmetic, argmax over a fixed family — is identical and that is what
    * scales. */
  val textLangId: Q = (s, d) => {
    val markers = Seq(
      "en" -> Seq("the", "a", "of"),
      "de" -> Seq("der", "die", "und"),
      "es" -> Seq("el", "los", "que"),
      "fr" -> Seq("le", "les", "et"),
      "zh" -> Seq("de", "shi", "bu"))
    val base = docs(s, d).withColumn("ws", words(col("text")))
    val withCounts = markers.foldLeft(base) { case (df, (lang, ms)) =>
      df.withColumn(s"c_$lang",
        size(filter(col("ws"), w => w.isin(ms.map(x => x: Any): _*))))
    }
    val Seq(en, de, es, fr, zh) = markers.map { case (l, _) => col(s"c_$l") }
    withCounts.select(
        col("doc_id"),
        when(en >= de && en >= es && en >= fr && en >= zh, "en")
          .when(de >= es && de >= fr && de >= zh, "de")
          .when(es >= fr && es >= zh, "es")
          .when(fr >= zh, "fr")
          .otherwise("zh").as("pred_lang"),
        col("lang").as("true_lang"))
      .withColumn("is_match", col("pred_lang") === col("true_lang"))
      .orderBy(col("doc_id"))
  }

  /** Classifier evaluation of the [[textLangId]] heuristic: per true
    * language, support, true positives, predicted count, and the
    * precision / recall / F1 triple — the report that decides whether a
    * cheap n-gram language ID is good enough to gate a corpus or needs a
    * model. F1 uses the harmonic identity 2·tp / (n_pred + n_true)
    * directly (one division — no chained rounding through P and R).
    *
    * 100 TB shape: the per-doc prediction pass is [[textLangId]]'s
    * marker scan (map-side, no shuffle), checkpointed; both aggregates
    * ride the language-grain census and join broadcast. */
  val langIdConfusion: Q = (s, d) => {
    val preds = textLangId(s, d)
      .select(col("pred_lang"), col("true_lang"))
      .sweepPin()
    val byTrue = preds.groupBy(col("true_lang").as("lang"))
      .agg(count(lit(1)).as("n_true"),
        sum(when(col("pred_lang") === col("true_lang"), 1L).otherwise(0L))
          .as("tp"))
    val byPred = preds.groupBy(col("pred_lang").as("lang"))
      .agg(count(lit(1)).as("n_pred"))
    byTrue.join(broadcast(byPred), Seq("lang"), "left")
      .select(col("lang"), col("n_true"), col("tp"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        when(coalesce(col("n_pred"), lit(0L)) > 0L,
          round(col("tp").cast(DoubleType) /
            coalesce(col("n_pred"), lit(0L)).cast(DoubleType), 6))
          .as("precision"),
        round(col("tp").cast(DoubleType) / col("n_true").cast(DoubleType), 6)
          .as("recall"),
        round(lit(2.0d) * col("tp").cast(DoubleType) /
          (coalesce(col("n_pred"), lit(0L)) + col("n_true"))
            .cast(DoubleType), 6).as("f1"))
      .orderBy(col("lang"))
  }

  /** Encoding audit per source: max codepoint, documents containing any
    * non-ASCII character, and the non-ASCII document share — the check
    * that catches mojibake and double-encoded feeds before a tokenizer
    * trained on clean text meets them. Codepoint maxima are exact
    * integers from one array fold per document; the share divides two
    * exact longs.
    *
    * 100 TB shape: map-side per-doc fold, one source-keyed aggregate —
    * |sources| rows out. */
  val textAsciiAudit: Q = (s, d) => {
    val maxCp = array_max(transform(split(col("text"), ""),
      ch => ascii(ch).cast(LongType)))
    docs(s, d)
      .select(col("source"), maxCp.as("max_cp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), max(col("max_cp")).as("max_codepoint"),
        sum(when(col("max_cp") > 127L, 1L).otherwise(0L)).as("n_non_ascii"))
      .select(col("source"), col("n_docs"), col("max_codepoint"),
        col("n_non_ascii"),
        round(col("n_non_ascii").cast(DoubleType) /
          col("n_docs").cast(DoubleType), 6).as("non_ascii_share"))
      .orderBy(col("source"))
  }

  /** Document fingerprint: order-sensitive rolling polynomial hash over the
    * word sequence (Karp–Rabin style; [[graft.functions.PolyHash]] per word,
    * ×31 rolling, modulo the same Mersenne prime so ANSI-mode arithmetic
    * can't overflow). Fully engine-neutral, so the DuckDB oracle replays the
    * exact fold. */
  val textFingerprint: Q = (s, d) => {
    import graft.functions.PolyHash
    docs(s, d).select(
        col("doc_id"),
        aggregate(words(col("text")), lit(0L),
          (acc, w) => pmod(acc * lit(31L) + PolyHash.poly_hash(w), lit(PolyHash.P)))
          .as("fingerprint"))
      .orderBy(col("doc_id"))
  }

  /** Canonical text normalization — the preprocessing front of every dedup
    * pipeline: lowercase, strip non-alphanumerics, collapse whitespace. */
  val textNormalize: Q = (s, d) =>
    docs(s, d).select(
        col("doc_id"),
        regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
          " +", " ").as("norm_text"))
      .select(col("doc_id"),
        md5(col("norm_text")).as("norm_hash"),
        length(col("norm_text")).cast(LongType).as("norm_len"))
      .orderBy(col("doc_id"))

  // PII patterns shared verbatim between Spark (Java regex) and the DuckDB
  // oracle (RE2) — both engines read these exact strings identically.
  private[operators] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[operators] val PhoneRe = "\\+?\\d[\\d -]{7,}\\d"

  /** PII scrubbing — the redaction front of a training-data pipeline:
    * emails and phone-shaped digit runs are replaced with typed tags, in one
    * codegen'd pass. The scrubbed text surfaces as a hash (results stay
    * narrow); per-kind redaction counts make the op auditable. */
  val textScrubPii: Q = (s, d) =>
    docs(s, d).select(
        col("doc_id"),
        md5(regexp_replace(regexp_replace(col("text"), EmailRe, "[EMAIL]"),
          PhoneRe, "[PHONE]")).as("scrub_hash"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
          .cast(LongType).as("n_emails"),
        size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0)))
          .cast(LongType).as("n_phones"))
      .orderBy(col("doc_id"))

  /** Fixed-size character chunking with overlap (chunk 200, stride 150 → 50
    * chars shared between neighbors) — the context-window splitter in front
    * of embedding/training jobs. Pure per-row codegen (sequence + explode +
    * substring): no shuffle until the final sort, output rows ∝ total bytes /
    * stride regardless of document skew. Chunks surface as md5 + length so
    * results stay narrow. */
  val textChunk: Q = (s, d) =>
    docs(s, d)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), greatest(length(col("text")) - 1, lit(0)), lit(150)))
          .as("start"))
      .select(col("doc_id"),
        (col("start") / 150).cast(LongType).as("chunk_id"),
        expr("substring(text, start + 1, 200)").as("chunk"))
      .select(col("doc_id"), col("chunk_id"),
        md5(col("chunk")).as("chunk_hash"),
        length(col("chunk")).cast(LongType).as("chunk_len"))
      .orderBy(col("doc_id"), col("chunk_id"))

  /** Gopher-style repetition signals, per document: distinct-word fraction,
    * duplicate-bigram fraction, and the share of the most frequent word.
    * Everything is computed from the row's own word array in one codegen'd
    * pass — no shuffle at any scale. The top-word count folds over the
    * SORTED word array (longest equal-adjacent run == max multiplicity), so
    * it stays O(n log n) per row instead of the O(n²) count-each-word scan. */
  val textRepetition: Q = (s, d) =>
    docs(s, d)
      .withColumn("ws", words(col("text")))
      .withColumn("bg",
        when(size(col("ws")) >= 2, expr(
          "transform(sequence(1, size(ws) - 1), i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"))
          .otherwise(expr("array()")))
      .withColumn("top_cnt", expr(
        // seed prev with ' ' — impossible as a word after splitting on
        // ' ' — so an empty-string word starts a run like any other
        """aggregate(array_sort(ws), named_struct('prev', ' ', 'run', 0, 'best', 0),
             (acc, w) -> named_struct(
               'prev', w,
               'run', IF(w = acc.prev, acc.run + 1, 1),
               'best', GREATEST(acc.best, IF(w = acc.prev, acc.run + 1, 1))),
             acc -> acc.best)"""))
      .select(
        col("doc_id"),
        size(col("ws")).cast(LongType).as("n_words"),
        (size(array_distinct(col("ws"))).cast(DoubleType) / size(col("ws")))
          .as("uniq_word_frac"),
        when(size(col("bg")) > 0,
          lit(1.0) - size(array_distinct(col("bg"))).cast(DoubleType) / size(col("bg")))
          .otherwise(lit(0.0)).as("dup_bigram_frac"),
        (col("top_cnt").cast(DoubleType) / size(col("ws"))).as("top_word_frac"))
      .orderBy(col("doc_id"))

  /** Corpus document-frequency scoring — the two-pass rare-word/quality
    * signal: pass 1 builds the vocabulary (word → number of documents
    * containing it), pass 2 scores every word occurrence against it. The
    * vocabulary is Heaps'-law bounded (sublinear in corpus size), so it
    * broadcasts; the per-occurrence lookup is a map-side broadcast hash join
    * and the per-doc reduce combines partially — the corpus itself never
    * shuffles more than one (doc_id, stats) row per partition. All outputs
    * are exact-integer arithmetic (or ratios of exact integers). */
  val textDocFreq: Q = (s, d) => {
    val occ = docs(s, d)
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
    val vocab = docs(s, d)
      .select(col("doc_id"), explode(array_distinct(words(col("text")))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("df"))
    occ.join(broadcast(vocab), "word")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("df")).as("sum_df"),
        min(col("df")).as("min_df"),
        (sum(col("df")).cast(DoubleType) / count(lit(1))).as("mean_df"),
        (sum(when(col("df") <= 2, 1L).otherwise(0L)).cast(DoubleType) / count(lit(1)))
          .as("rare_frac"))
      .orderBy(col("doc_id"))
  }

  /** Keyword extraction: each document's top-3 terms by TF·(N/df) — the
    * classic rarity-weighted score with the log dropped, which preserves
    * the RANKING exactly (log is monotone in N/df and tf multiplies both
    * spellings) while keeping the score a single exact-integer ratio both
    * engines divide identically once. Same broadcast-vocab shape as
    * [[textDocFreq]]: the Heaps'-bounded vocabulary broadcasts, the corpus
    * never shuffles; the per-doc top-3 is a window over (doc, word) term
    * counts — rows ∝ distinct terms, not occurrences. The corpus size N is
    * folded into the plan as a broadcast scalar cross-join (the
    * `subquery_scalar` pattern) so constructing the query runs NO Spark job
    * and executing it is a single plan — at 100 TB an eager count here would
    * be a full extra corpus pass per invocation. */
  val textKeywords: Q = (s, d) => {
    val nDocs = docs(s, d).agg(count(lit(1)).as("n_docs"))
    val tf = docs(s, d)
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val vocab = docs(s, d)
      .select(col("doc_id"), explode(array_distinct(words(col("text")))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word"))
    tf.join(broadcast(vocab), "word")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("word"), col("tf"), col("df"),
        ((col("tf") * col("n_docs")).cast(DoubleType) / col("df")).as("score"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk").cast(LongType).as("rk"),
        col("word"), col("tf"), col("df"), round(col("score"), 6).as("score"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** How many Zipf ranks enter the log-log fit: the head of the
    * rank-frequency curve is where the law holds and where the fit is
    * stable; capping also bounds the per-language window input at scale. */
  val zipfRanks = 100

  /** Zipf's-law fit per language: least-squares slope of ln(frequency) on
    * ln(rank) over the top-[[zipfRanks]] words — the standard
    * corpus-health diagnostic (natural language sits near −1; templated or
    * synthetic text flattens toward 0). Exactness: both log terms are
    * quantized to DECIMAL(18,6) BEFORE the four moment sums (the
    * [[textEntropy]] pattern — engine differences in a log's last ulp die
    * at the rounding, and decimal sums are exact and associative under any
    * partitioning), then the slope computes its one float at the end with
    * identical formula text in the oracle.
    *
    * 100 TB shape: one (lang, word) count aggregate with map-side partials
    * (the exchange carries the vocabulary, not the corpus); the rank
    * window sees only distinct-word counts per language and the fit input
    * is capped at [[zipfRanks]] rows per language; output is
    * |languages|-sized. */
  val textZipfSlope: Q = (s, d) => {
    val dec6 = DecimalType(18, 6)
    val wc = docs(s, d)
      .select(col("lang"), explode(words(col("text"))).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
    val win = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      .orderBy(col("c").desc, col("w"))
    val ranked = wc.withColumn("rk", row_number().over(win))
      .filter(col("rk") <= zipfRanks)
      .select(col("lang"), col("c"),
        round(log(col("rk").cast(DoubleType)), 6).cast(dec6).as("x"),
        round(log(col("c").cast(DoubleType)), 6).cast(dec6).as("y"))
    ranked.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_ranks"),
        sum(col("c")).as("head_tokens"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sx2"))
      .select(col("lang"), col("n_ranks"), col("head_tokens"),
        round(
          (col("n_ranks").cast(DoubleType) * col("sxy").cast(DoubleType) -
            col("sx").cast(DoubleType) * col("sy").cast(DoubleType)) /
          (col("n_ranks").cast(DoubleType) * col("sx2").cast(DoubleType) -
            col("sx").cast(DoubleType) * col("sx").cast(DoubleType)),
          6).as("zipf_slope"))
      .orderBy(col("lang"))
  }

  /** Coverage checkpoints: the fraction of running-token mass the top-k
    * word types cover, evaluated at these k. */
  val coverageKs: Seq[Int] = Seq(10, 100, 1000)

  /** Head-vocabulary coverage curve per language: what fraction of all
    * token OCCURRENCES the top-{10,100,1000} word types cover — the
    * statistic that sizes a tokenizer's vocabulary budget (BPE merges
    * chase exactly this curve) and predicts OOV rates per language.
    * Ranking is deterministic (count desc, then word); a language with
    * fewer than k types reports its full mass (coverage 1.0) at that
    * checkpoint, so the curve is defined at every checkpoint regardless
    * of vocabulary size.
    *
    * Scale shape: one (lang, word)-keyed count aggregate (map-side
    * combined), a per-language rank window over the VOCABULARY (types,
    * not tokens — orders of magnitude smaller than the corpus, same
    * posture as [[textZipfSlope]]), a filter to the ≤1000-row head
    * BEFORE the 3-row checkpoint table nested-loop-joins in (head×3
    * rows, never vocab×3), and one broadcast totals annotation. */
  val textTopkCoverage: Q = (s, d) => {
    import s.implicits._
    val wc = docs(s, d)
      .select(col("lang"), explode(words(col("text"))).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
    val win = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      .orderBy(col("c").desc, col("w"))
    val head = wc.withColumn("rk", row_number().over(win))
      .filter(col("rk") <= coverageKs.max)
    val tot = wc.groupBy(col("lang"))
      .agg(sum(col("c")).as("total_tokens"), count(lit(1)).as("n_types"))
    val ks = coverageKs.map(_.toLong).toDF("k")
    head.join(broadcast(ks), col("rk") <= col("k"))
      .groupBy(col("lang"), col("k"))
      .agg(count(lit(1)).as("head_types"), sum(col("c")).as("head_tokens"))
      .join(broadcast(tot), "lang")
      .select(col("lang"), col("k"), col("head_types"), col("head_tokens"),
        col("total_tokens"), col("n_types"),
        round(col("head_tokens").cast(DoubleType) / col("total_tokens"), 6)
          .as("coverage"))
      .orderBy(col("lang"), col("k"))
  }

  /** How many of the most document-frequent words [[textBurstiness]]
    * reports. */
  val burstTopWords = 50

  /** Word burstiness for the top-[[burstTopWords]] words by document
    * frequency: the variance-to-mean ratio of per-document counts
    * (zeros included) — ≈1 for Poisson "function words" scattered
    * evenly, ≫1 for topical words that arrive in bursts. The classifier
    * feature behind stopword lists and TF-IDF damping choices. All three
    * moments (document frequency, Σc, Σc²) are exact integers; the VMR
    * = (N·Σc² − (Σc)²) / ((N−1)·Σc) evaluates once per word in doubles
    * with identical formula text both engines (the widen-first rule:
    * N·Σc² as int64 overflows past ~1e12 docs, so both factors cast to
    * double BEFORE the multiply).
    *
    * Scale shape: one (word, doc) count aggregate (map-side combined),
    * one word-keyed moment aggregate over that — both corpus-shuffle
    * passes on narrow keys; the top-50 cut is TakeOrdered over the
    * VOCABULARY-grain moments (never a global sort), and the one-row
    * doc census broadcasts in. */
  val textBurstiness: Q = (s, d) => {
    val dc = docs(s, d)
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .groupBy(col("w"), col("doc_id")).agg(count(lit(1)).as("c"))
    val nd = docs(s, d).agg(count(lit(1)).as("n_docs"))
    dc.groupBy(col("w"))
      .agg(count(lit(1)).as("df"), sum(col("c")).as("tot_c"),
        sum(col("c") * col("c")).as("sq_c"))
      .crossJoin(broadcast(nd))
      .select(col("w").as("word"), col("df"), col("tot_c"),
        round((col("n_docs").cast(DoubleType) * col("sq_c").cast(DoubleType) -
            col("tot_c").cast(DoubleType) * col("tot_c").cast(DoubleType)) /
          ((col("n_docs") - 1L).cast(DoubleType) *
            col("tot_c").cast(DoubleType)), 6)
          .as("burstiness"))
      .orderBy(col("df").desc, col("word"))
      .limit(burstTopWords)
  }

  /** Corpus n-gram statistics: top-10 word bigrams per language (tie-broken
    * lexicographically). The explode output shuffles once on (lang, bigram)
    * with map-side partial counts; the top-k window only sees the distinct
    * bigram counts, a tiny fraction of the corpus. */
  val textNgramFreq: Q = (s, d) =>
    docs(s, d)
      .select(col("lang"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("lang"),
        explode(expr(
          "transform(sequence(1, size(w) - 1), i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
          .as("bigram"))
      .groupBy(col("lang"), col("bigram"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
          .orderBy(col("n").desc, col("bigram"))))
      .filter(col("rn") <= 10)
      .select(col("lang"), col("rn").cast(LongType).as("rn"), col("bigram"), col("n"))
      .orderBy(col("lang"), col("rn"))

  /** Linear quality classifier — the fastText-scorer shape (a learned
    * linear model over cheap lexical features) with fixed public weights.
    * The margin is EXACT integer arithmetic over four features (capped
    * length, stopword hits, symbol chars, repeated words), so the
    * keep/drop decision is bit-identical on any engine; the calibrated
    * probability is ONE sigmoid computed from the exact margin with
    * identical formula text both sides (the events_anomaly float rule).
    * One codegen'd map-side pass, zero shuffle at any corpus size. */
  /** The linear-classifier margin over `col("text")` — shared by
    * [[qualityScoreLinear]] and [[qualityDupCorrelation]] so both score
    * documents with the identical feature arithmetic. Returns
    * (f_len, f_stop, f_sym, f_rep, margin) columns. */
  private[graft] def qualityFeatures: (Column, Column, Column, Column, Column) = {
    val ws = words(col("text"))
    val nWords = size(ws).cast(LongType)
    val fLen = least(nWords, lit(200L))
    val fStop = size(filter(ws, w => w.isin(stopwords.map(x => x: Any): _*)))
      .cast(LongType)
    val fSym = length(regexp_replace(col("text"), "[A-Za-z0-9 ]", "")).cast(LongType)
    val fRep = nWords - size(array_distinct(ws)).cast(LongType)
    val margin = fLen * 4 + fStop * 8 - fSym * 2 - fRep * 3 - 256
    (fLen, fStop, fSym, fRep, margin)
  }

  val qualityScoreLinear: Q = (s, d) => {
    val (fLen, fStop, fSym, fRep, margin) = qualityFeatures
    docs(s, d)
      .select(col("doc_id"),
        fLen.as("f_len"), fStop.as("f_stop"), fSym.as("f_sym"), fRep.as("f_rep"),
        margin.as("margin"),
        round(lit(1.0) / (lit(1.0) + exp(margin.cast(DoubleType) / -256.0)), 6)
          .as("p_keep"),
        (margin >= 0).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Does duplication correlate with quality? Documents bucket by their
    * exact-dedup cluster size (unique / pair / 3+) and each bucket
    * reports its doc count, cluster count, mean classifier margin and
    * keep rate — the audit that decides whether dedup and quality
    * filtering are redundant or complementary (boilerplate is usually
    * BOTH duplicated and low-quality; if the buckets' keep rates match,
    * one of the two passes is free). The margin is [[qualityFeatures]]'
    * exact integer score, so the bucket mean is one division; the keep
    * rate divides two exact longs.
    *
    * 100 TB shape: one digest-keyed count aggregate (the dedup_exact
    * shuffle) joins back to the doc-grain score scan on the digest —
    * the same one corpus shuffle the dedup pipeline itself pays; the
    * 3-row bucket output falls out map-side. */
  val qualityDupCorrelation: Q = (s, d) => {
    val (_, _, _, _, margin) = qualityFeatures
    val scored = docs(s, d)
      .select(md5(col("text")).as("content_hash"), margin.as("margin"))
    val sizes = scored.groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n_copies"))
    scored.join(sizes, "content_hash")
      .select(
        when(col("n_copies") === 1L, "1_unique")
          .when(col("n_copies") === 2L, "2_pair")
          .otherwise("3_plus").as("dup_bucket"),
        col("content_hash"), col("margin"))
      .groupBy(col("dup_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("content_hash")).as("n_clusters"),
        round(sum(col("margin")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType), 6).as("mean_margin"),
        round(sum(when(col("margin") >= 0L, 1L).otherwise(0L))
          .cast(DoubleType) / count(lit(1)).cast(DoubleType), 6)
          .as("keep_rate"))
      .orderBy(col("dup_bucket"))
  }

  /** Per-document character-level Shannon entropy — the cheap gibberish /
    * compression-ratio prior (low entropy → repeated filler, high →
    * random noise; prose sits in a narrow band). H = ln L − (Σ c·ln c)/L
    * over per-character counts c, length L. Engine-exactness is the
    * [[AnalyticsOps.textPerplexity]] recipe: each ln(c) is rounded ONCE
    * per distinct integer count (stable to an engine's ulp) and the
    * weighted sum accumulates in DECIMAL — exact and order-free under
    * partial aggregation — with ONE float finish. The per-(doc, char)
    * aggregate is the only corpus-scale shuffle; its key domain is
    * docs × alphabet. */
  val textEntropy: Q = (s, d) => {
    val counts = docs(s, d)
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
    val term = round(log(col("c").cast(DoubleType)), 6).cast(DecimalType(18, 6))
    counts.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("len"),
        count(lit(1)).as("distinct_chars"),
        sum(term * col("c")).as("s"))
      .select(col("doc_id"), col("len"), col("distinct_chars"),
        round(log(col("len").cast(DoubleType))
          - col("s").cast(DoubleType) / col("len"), 6).as("entropy_nats"))
      .orderBy(col("doc_id"))
  }

  /** Vocabulary-richness audit per language: token total, vocabulary
    * size, hapax legomena (words seen exactly once), dis legomena
    * (exactly twice), hapax share of the vocabulary and type-token
    * ratio. Hapax share is the classic Zipf-consistency check (~50% in
    * natural language; far lower in templated/duplicated text, so a
    * collapsing hapax share flags boilerplate BEFORE dedup runs) and
    * bounds the unseen-mass estimate (Good–Turing's n₁/N). Words
    * aggregate by PolyHash so the exchange carries (lang, int64) keys
    * with map-side partial counts — the [[graft.operators
    * .AnalyticsOps]] lm_bigram_entropy posture; the oracle replays the
    * hash, so collisions merge identically. Counts are exact integers;
    * the two shares divide once each under identical formula text.
    *
    * 100 TB shape: one corpus scan, one vocabulary-bounded exchange,
    * |languages| rows out. */
  val textHapax: Q = (s, d) => {
    val counts = docs(s, d)
      .select(col("lang"), explode(words(col("text"))).as("w"))
      .select(col("lang"), graft.functions.PolyHash.poly_hash(col("w")).as("h"))
      .groupBy(col("lang"), col("h"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("lang"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("dis"))
      .select(col("lang"), col("n_tokens"), col("vocab"), col("hapax"),
        col("dis"),
        round(col("hapax").cast(DoubleType) / col("vocab").cast(DoubleType), 6)
          .as("hapax_share"),
        round(col("vocab").cast(DoubleType) / col("n_tokens").cast(DoubleType), 6)
          .as("ttr"))
      .orderBy(col("lang"))
  }

  val queries: Map[String, Q] = Map(
    "text_hapax" -> textHapax,
    "text_entropy" -> textEntropy,
    "quality_score_linear" -> qualityScoreLinear,
    "text_chunk" -> textChunk,
    "text_ngram_freq" -> textNgramFreq,
    "text_stats" -> textStats,
    "text_normalize" -> textNormalize,
    "text_quality" -> textQuality,
    "text_token_count" -> textTokenCount,
    "tokenizer_fertility" -> tokenizerFertility,
    "text_bpe_pairs" -> textBpePairs,
    "text_lang_id" -> textLangId,
    "text_fingerprint" -> textFingerprint,
    "text_scrub_pii" -> textScrubPii,
    "text_repetition" -> textRepetition,
    "text_doc_freq" -> textDocFreq,
    "text_keywords" -> textKeywords,
    "text_zipf_slope" -> textZipfSlope,
    "text_topk_coverage" -> textTopkCoverage,
    "text_burstiness" -> textBurstiness,
    "lang_id_confusion" -> langIdConfusion,
    "quality_dup_correlation" -> qualityDupCorrelation,
    "text_ascii_audit" -> textAsciiAudit,
  )

  val oracle: Map[String, String] = Map(
    "text_hapax" -> {
      import graft.functions.PolyHash
      s"""WITH wc AS (
           SELECT lang, ${PolyHash.duckSql("w")} AS h, COUNT(*) AS c
           FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
                 FROM documents)
           GROUP BY 1, 2)
         SELECT lang,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(COUNT(*) FILTER (WHERE c = 1) AS BIGINT) AS hapax,
           CAST(COUNT(*) FILTER (WHERE c = 2) AS BIGINT) AS dis,
           round(CAST(COUNT(*) FILTER (WHERE c = 1) AS DOUBLE) /
             CAST(COUNT(*) AS DOUBLE), 6) AS hapax_share,
           round(CAST(COUNT(*) AS DOUBLE) /
             CAST(SUM(c) AS DOUBLE), 6) AS ttr
         FROM wc GROUP BY lang ORDER BY lang"""
    },
    "text_zipf_slope" ->
      s"""WITH wc AS (
           SELECT lang, w, COUNT(*) AS c
           FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
                 FROM documents)
           GROUP BY lang, w),
         rk AS (
           SELECT lang, c,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, w) AS rk
           FROM wc),
         pts AS (
           SELECT lang, c,
             CAST(round(ln(rk), 6) AS DECIMAL(18,6)) AS x,
             CAST(round(ln(c), 6) AS DECIMAL(18,6)) AS y
           FROM rk WHERE rk <= $zipfRanks),
         agg AS (
           SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_ranks,
             CAST(SUM(c) AS BIGINT) AS head_tokens,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sx2
           FROM pts GROUP BY lang)
         SELECT lang, n_ranks, head_tokens,
           round((CAST(n_ranks AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n_ranks AS DOUBLE) * CAST(sx2 AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS zipf_slope
         FROM agg ORDER BY lang""",
    "text_topk_coverage" ->
      s"""WITH wc AS (
           SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
           FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
                 FROM documents)
           GROUP BY lang, w),
         rk AS (
           SELECT lang, c,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, w) AS rk
           FROM wc),
         tot AS (
           SELECT lang, CAST(SUM(c) AS BIGINT) AS total_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_types
           FROM wc GROUP BY lang),
         ks AS (SELECT CAST(k AS BIGINT) AS k
                FROM (VALUES ${coverageKs.map(k => s"($k)").mkString(", ")})
                  t(k)),
         h AS (
           SELECT lang, k, CAST(COUNT(*) AS BIGINT) AS head_types,
             CAST(SUM(c) AS BIGINT) AS head_tokens
           FROM rk JOIN ks ON rk.rk <= ks.k
           WHERE rk.rk <= ${coverageKs.max}
           GROUP BY lang, k)
         SELECT h.lang, h.k, h.head_types, h.head_tokens,
           tot.total_tokens, tot.n_types,
           round(CAST(h.head_tokens AS DOUBLE) / tot.total_tokens, 6)
             AS coverage
         FROM h JOIN tot USING (lang) ORDER BY h.lang, h.k""",
    "text_burstiness" ->
      s"""WITH dc AS (
           SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS c
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                 FROM documents)
           GROUP BY w, doc_id),
         nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
         m AS (
           SELECT w, CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(c) AS BIGINT) AS tot_c,
             CAST(SUM(c * c) AS BIGINT) AS sq_c
           FROM dc GROUP BY w)
         SELECT w AS word, df, tot_c,
           round((CAST(n_docs AS DOUBLE) * CAST(sq_c AS DOUBLE)
               - CAST(tot_c AS DOUBLE) * CAST(tot_c AS DOUBLE))
             / (CAST(n_docs - 1 AS DOUBLE) * CAST(tot_c AS DOUBLE)), 6)
             AS burstiness
         FROM m CROSS JOIN nd
         ORDER BY df DESC, word LIMIT $burstTopWords""",
    "text_entropy" ->
      """WITH c AS (
           SELECT doc_id, ch, COUNT(*) AS c
           FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch
                 FROM documents)
           GROUP BY doc_id, ch),
         agg AS (
           SELECT doc_id, CAST(SUM(c) AS BIGINT) AS len,
             COUNT(*) AS distinct_chars,
             SUM(CAST(round(ln(CAST(c AS DOUBLE)), 6) AS DECIMAL(18,6)) * c)
               AS s
           FROM c GROUP BY doc_id)
         SELECT doc_id, len, distinct_chars,
           round(ln(CAST(len AS DOUBLE)) - CAST(s AS DOUBLE) / len, 6)
             AS entropy_nats
         FROM agg ORDER BY doc_id""",
    "quality_score_linear" ->
      """WITH f AS (
           SELECT doc_id,
             LEAST(CAST(len(string_split(text, ' ')) AS BIGINT), 200) AS f_len,
             CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a')))
               AS BIGINT) AS f_stop,
             CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT)
               AS f_sym,
             CAST(len(string_split(text, ' '))
               - len(list_distinct(string_split(text, ' '))) AS BIGINT) AS f_rep
           FROM documents),
         m AS (
           SELECT doc_id, f_len, f_stop, f_sym, f_rep,
             f_len * 4 + f_stop * 8 - f_sym * 2 - f_rep * 3 - 256 AS margin
           FROM f)
         SELECT doc_id, f_len, f_stop, f_sym, f_rep, margin,
           round(1.0 / (1.0 + exp(CAST(margin AS DOUBLE) / -256.0)), 6) AS p_keep,
           margin >= 0 AS keep
         FROM m ORDER BY doc_id""",
    "text_ascii_audit" ->
      """WITH m AS (
           SELECT source,
             list_max([ascii(text[i]) FOR i IN range(1, len(text) + 1)])
               AS max_cp
           FROM documents)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(max_cp) AS BIGINT) AS max_codepoint,
           CAST(SUM(CASE WHEN max_cp > 127 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_non_ascii,
           round(CAST(SUM(CASE WHEN max_cp > 127 THEN 1 ELSE 0 END)
               AS DOUBLE) / COUNT(*), 6) AS non_ascii_share
         FROM m GROUP BY source ORDER BY source""",
    "quality_dup_correlation" ->
      """WITH f AS (
           SELECT md5(text) AS content_hash,
             LEAST(CAST(len(string_split(text, ' ')) AS BIGINT), 200) * 4
             + CAST(len(list_filter(string_split(text, ' '),
                 w -> w IN ('the', 'a'))) AS BIGINT) * 8
             - CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                 AS BIGINT) * 2
             - CAST(len(string_split(text, ' '))
                 - len(list_distinct(string_split(text, ' '))) AS BIGINT) * 3
             - 256 AS margin
           FROM documents),
         s AS (SELECT content_hash, CAST(COUNT(*) AS BIGINT) AS n_copies
               FROM f GROUP BY content_hash)
         SELECT CASE WHEN s.n_copies = 1 THEN '1_unique'
                     WHEN s.n_copies = 2 THEN '2_pair'
                     ELSE '3_plus' END AS dup_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT f.content_hash) AS BIGINT) AS n_clusters,
           round(CAST(SUM(f.margin) AS DOUBLE) / COUNT(*), 6) AS mean_margin,
           round(CAST(SUM(CASE WHEN f.margin >= 0 THEN 1 ELSE 0 END)
             AS DOUBLE) / COUNT(*), 6) AS keep_rate
         FROM f JOIN s USING (content_hash)
         GROUP BY 1 ORDER BY dup_bucket""",
    "text_keywords" ->
      """WITH occ AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM occ GROUP BY doc_id, word),
         vocab AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM occ GROUP BY word),
         n AS (SELECT COUNT(*) AS n_docs FROM documents),
         scored AS (
           SELECT t.doc_id, t.word, t.tf, v.df,
             CAST(t.tf * n.n_docs AS DOUBLE) / v.df AS score
           FROM tf t JOIN vocab v USING (word) CROSS JOIN n),
         rk AS (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, word) AS rk
           FROM scored)
         SELECT doc_id, CAST(rk AS BIGINT) AS rk, word, tf, df,
           round(score, 6) AS score
         FROM rk WHERE rk <= 3 ORDER BY doc_id, rk""",
    "text_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         base AS (
           SELECT doc_id, len(ws) AS n_words, len(list_distinct(ws)) AS n_uniq,
             CASE WHEN len(ws) >= 2
               THEN list_transform(generate_series(1, len(ws) - 1),
                      i -> ws[i] || ' ' || ws[i + 1])
               ELSE [] END AS bg
           FROM w),
         top AS (
           SELECT doc_id, MAX(cnt) AS top_cnt FROM (
             SELECT doc_id, word, COUNT(*) AS cnt
             FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
             GROUP BY doc_id, word)
           GROUP BY doc_id)
         SELECT b.doc_id, CAST(b.n_words AS BIGINT) AS n_words,
           CAST(n_uniq AS DOUBLE) / b.n_words AS uniq_word_frac,
           CASE WHEN len(bg) > 0
             THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
             ELSE 0.0 END AS dup_bigram_frac,
           CAST(t.top_cnt AS DOUBLE) / b.n_words AS top_word_frac
         FROM base b JOIN top t ON b.doc_id = t.doc_id
         ORDER BY b.doc_id""",
    "text_doc_freq" ->
      """WITH occ AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         vocab AS (
           SELECT word, COUNT(DISTINCT doc_id) AS df FROM occ GROUP BY word)
         SELECT o.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(v.df) AS BIGINT) AS sum_df,
           CAST(MIN(v.df) AS BIGINT) AS min_df,
           CAST(SUM(v.df) AS DOUBLE) / COUNT(*) AS mean_df,
           CAST(SUM(CASE WHEN v.df <= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS rare_frac
         FROM occ o JOIN vocab v ON o.word = v.word
         GROUP BY o.doc_id ORDER BY o.doc_id""",
    "text_chunk" ->
      """SELECT doc_id, CAST(start / 150 AS BIGINT) AS chunk_id,
             md5(substr(text, start + 1, 200)) AS chunk_hash,
             CAST(length(substr(text, start + 1, 200)) AS BIGINT) AS chunk_len
         FROM documents,
              UNNEST(generate_series(0, GREATEST(length(text) - 1, 0), 150)) AS t(start)
         ORDER BY doc_id, chunk_id""",
    "text_ngram_freq" ->
      """WITH ws AS (
           SELECT lang, string_split(text, ' ') AS w FROM documents
           WHERE len(string_split(text, ' ')) >= 2),
         bg AS (
           SELECT lang, unnest(list_transform(generate_series(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i + 1])) AS bigram
           FROM ws),
         cnt AS (SELECT lang, bigram, COUNT(*) AS n FROM bg GROUP BY lang, bigram),
         rk AS (SELECT lang, bigram, n,
                  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rn
                FROM cnt)
         SELECT lang, CAST(rn AS BIGINT) AS rn, bigram, n FROM rk
         WHERE rn <= 10 ORDER BY lang, rn""",
    "text_fingerprint" -> {
      import graft.functions.PolyHash
      s"""SELECT doc_id,
         list_reduce(list_prepend(0::BIGINT,
             [${PolyHash.duckSql("w")} FOR w IN string_split(text, ' ')]),
           (a, h) -> (a * 31 + h) % ${PolyHash.P}) AS fingerprint
         FROM documents ORDER BY doc_id"""
    },
    "text_scrub_pii" ->
      """SELECT doc_id,
         md5(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '\+?\d[\d -]{7,}\d', '[PHONE]', 'g')) AS scrub_hash,
         CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(text, '\+?\d[\d -]{7,}\d')) AS BIGINT) AS n_phones
         FROM documents ORDER BY doc_id""",
    "text_normalize" ->
      """SELECT doc_id,
         md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                            ' +', ' ', 'g')) AS norm_hash,
         CAST(length(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                    ' +', ' ', 'g')) AS BIGINT) AS norm_len
         FROM documents ORDER BY doc_id""",
    "text_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
         MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
         FROM documents GROUP BY lang ORDER BY lang""",
    "text_quality" ->
      """SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) AS avg_word_len,
         CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS DOUBLE)
           / len(string_split(text, ' ')) AS stop_ratio,
         ROUND(LEAST(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100)
           * (1.0 - CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS DOUBLE)
           / len(string_split(text, ' '))), 6) AS quality
         FROM documents ORDER BY doc_id""",
    "text_token_count" ->
      s"""SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
         ${graft.functions.BpeTable.duckCountSql("text")} AS n_bpe_tokens
         FROM documents ORDER BY doc_id""",
    "tokenizer_fertility" ->
      s"""WITH per_doc AS (
           SELECT lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
             ${graft.functions.BpeTable.duckCountSql("text")} AS bpe,
             n_chars
           FROM documents),
         agg AS (
           SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(ws) AS BIGINT) AS n_words,
             CAST(SUM(bpe) AS BIGINT) AS n_tokens,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars
           FROM per_doc GROUP BY lang)
         SELECT lang, n_docs, n_words, n_tokens,
           round(CAST(n_tokens AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
             AS fertility,
           round(CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
             AS chars_per_token
         FROM agg ORDER BY lang""",
    "text_bpe_pairs" ->
      s"""WITH words AS (
           SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         syms AS (
           SELECT ${graft.functions.BpeTable.duckSymbolsSql(
             "w", graft.functions.BpeTable.charPairRules)} AS ss
           FROM words WHERE w <> ''),
         pairs AS (
           SELECT unnest([ss[bi] || ' ' || ss[bi + 1] FOR bi IN range(1, len(ss))]) AS pair
           FROM syms WHERE len(ss) >= 2)
         SELECT pair, COUNT(*) AS cnt FROM pairs
         GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20""",
    "text_lang_id" ->
      """WITH c AS (
           SELECT doc_id, lang AS true_lang,
             len(list_filter(string_split(text,' '), w -> w IN ('the','a','of'))) AS c_en,
             len(list_filter(string_split(text,' '), w -> w IN ('der','die','und'))) AS c_de,
             len(list_filter(string_split(text,' '), w -> w IN ('el','los','que'))) AS c_es,
             len(list_filter(string_split(text,' '), w -> w IN ('le','les','et'))) AS c_fr,
             len(list_filter(string_split(text,' '), w -> w IN ('de','shi','bu'))) AS c_zh
           FROM documents)
         SELECT doc_id,
           CASE WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
                WHEN c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
                WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es'
                WHEN c_fr >= c_zh THEN 'fr'
                ELSE 'zh' END AS pred_lang,
           true_lang,
           (CASE WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
                WHEN c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
                WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es'
                WHEN c_fr >= c_zh THEN 'fr'
                ELSE 'zh' END = true_lang) AS is_match
         FROM c ORDER BY doc_id""",
    "lang_id_confusion" ->
      """WITH c AS (
           SELECT doc_id, lang AS true_lang,
             len(list_filter(string_split(text,' '), w -> w IN ('the','a','of'))) AS c_en,
             len(list_filter(string_split(text,' '), w -> w IN ('der','die','und'))) AS c_de,
             len(list_filter(string_split(text,' '), w -> w IN ('el','los','que'))) AS c_es,
             len(list_filter(string_split(text,' '), w -> w IN ('le','les','et'))) AS c_fr,
             len(list_filter(string_split(text,' '), w -> w IN ('de','shi','bu'))) AS c_zh
           FROM documents),
         p AS (
           SELECT true_lang,
             CASE WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
                  WHEN c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
                  WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es'
                  WHEN c_fr >= c_zh THEN 'fr'
                  ELSE 'zh' END AS pred_lang
           FROM c),
         bt AS (
           SELECT true_lang AS lang, CAST(COUNT(*) AS BIGINT) AS n_true,
             CAST(SUM(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END)
               AS BIGINT) AS tp
           FROM p GROUP BY 1),
         bp AS (
           SELECT pred_lang AS lang, CAST(COUNT(*) AS BIGINT) AS n_pred
           FROM p GROUP BY 1)
         SELECT bt.lang, bt.n_true, bt.tp,
           CAST(COALESCE(bp.n_pred, 0) AS BIGINT) AS n_pred,
           CASE WHEN COALESCE(bp.n_pred, 0) > 0 THEN
             round(CAST(bt.tp AS DOUBLE)
               / CAST(COALESCE(bp.n_pred, 0) AS DOUBLE), 6) END AS precision,
           round(CAST(bt.tp AS DOUBLE) / CAST(bt.n_true AS DOUBLE), 6)
             AS recall,
           round(2.0 * CAST(bt.tp AS DOUBLE)
             / CAST(COALESCE(bp.n_pred, 0) + bt.n_true AS DOUBLE), 6) AS f1
         FROM bt LEFT JOIN bp USING (lang)
         ORDER BY bt.lang""",
  )
}
