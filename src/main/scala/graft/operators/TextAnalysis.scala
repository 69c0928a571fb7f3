package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Text

/** Text-analysis operators for training-data pipelines: language ID, quality
  * scoring, token counting, fingerprinting. All pure column expressions
  * (whole-stage codegen; zero shuffles; scale = embarrassingly parallel scan).
  */
object TextAnalysis {

  /** Stopword marker lists for the n-gram/stopword language-ID heuristic.
    * Deterministic and tiny on purpose: the heuristic is the *shape* of a
    * production fastText-style classifier (score-per-language, argmax with a
    * fixed tie order) while staying exactly reproducible in the SQL oracle.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "un", "una", "por"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "un", "une", "est", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"),
    "zh" -> Seq() // no-latin-marker language: detected by CJK char presence
  )

  /** Language ID: CJK character ratio beats everything; otherwise the
    * language with the most stopword hits wins; ties broken by the fixed
    * order of `LangMarkers`; zero hits everywhere -> "und".
    */
  def langId(text: Column): Column = {
    val toks = Text.tokens(text)
    val cjk = size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
    val scores: Seq[(String, Column)] = LangMarkers.filter(_._2.nonEmpty).map {
      case (lang, markers) =>
        lang -> size(filter(toks, t => t.isin(markers: _*)))
    }
    // argmax with first-wins tie-break (fixed language order), zero -> "und"
    val maxScore = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pickFirstWins = scores.reverse.foldLeft(lit("und")) { case (els, (lang, s)) =>
      when(s === maxScore && maxScore > 0, lit(lang)).otherwise(els)
    }
    when(cjk > 0, lit("zh")).otherwise(pickFirstWins)
  }

  /** Quality features (reference-style heuristics scaled out):
    * character count, word count, mean word length, punctuation ratio,
    * stopword ratio, digit ratio, uppercase ratio — plus a composite
    * `quality_ok` gate like a C4/Gopher-style filter.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = Text.tokens(t)
    val nChars = length(t)
    val nWords = size(toks)
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
    df.withColumn("n_chars", nChars.cast(LongType))
      .withColumn("n_words", nWords.cast(LongType))
      .withColumn("mean_word_len",
        round(aggregate(toks, lit(0L), (acc, w) => acc + length(w)).cast(DoubleType) /
          greatest(nWords, lit(1)).cast(DoubleType), 6))
      .withColumn("punct_ratio",
        round(size(regexp_extract_all(t, lit("[\\.,;:!\\?]"), lit(0))).cast(DoubleType) /
          greatest(nChars, lit(1)).cast(DoubleType), 6))
      .withColumn("digit_ratio",
        round(size(regexp_extract_all(t, lit("[0-9]"), lit(0))).cast(DoubleType) /
          greatest(nChars, lit(1)).cast(DoubleType), 6))
      .withColumn("upper_ratio",
        round(size(regexp_extract_all(t, lit("[A-Z]"), lit(0))).cast(DoubleType) /
          greatest(nChars, lit(1)).cast(DoubleType), 6))
      .withColumn("stopword_ratio",
        round(size(filter(toks, w => w.isin(stop: _*))).cast(DoubleType) /
          greatest(nWords, lit(1)).cast(DoubleType), 6))
      .withColumn("quality_ok",
        (nWords >= 5) && (nWords <= 100000) && (col("mean_word_len") between(2.0, 15.0)))
  }

  /** Token counts: whitespace tokens and a BPE-ish regex segmentation
    * (letter runs / digit runs / single punctuation marks).
    */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("ws_tokens", size(Text.tokens(t)).cast(LongType))
      .withColumn("bpe_ish_tokens",
        size(regexp_extract_all(t, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
          .cast(LongType))
  }

  /** Gopher-style repetition quality signals (Rae et al. 2021, table A1
    * shape): duplicate-token fraction, duplicate 2/3-gram fractions, and
    * OVERLAP-WEIGHTED top-n-gram token fractions (top count * n / tokens —
    * occurrences of the most frequent n-gram counted with their overlaps,
    * so the value EXCEEDS 1.0 on heavily repeated text; Gopher's published
    * character-coverage metric is bounded by 1, so these columns and the
    * 0.20/0.18 gates are NOT numerically comparable to the paper's
    * thresholds — the overlap-weighted form is one array pass and
    * oracle-reproducible, coverage dedup is not), plus a composite
    * `repetition_ok` gate. One `NgramRepStats` pass per
    * n — O(tokens) per row inside whole-stage codegen, zero shuffles,
    * embarrassingly parallel at any corpus size. All fractions are
    * rounded to 6 decimals BEFORE the gate compares them, so the gate is
    * engine-reproducible. Thresholds are tuned to split this corpus
    * family; a production filter would tune them per source.
    */
  def repetitionFeatures(df: DataFrame, textCol: String): DataFrame = {
    import graft.functions.VecExprs
    val t = col(textCol)
    def frac(num: Column, den: Column): Column =
      round(num.cast(DoubleType) / greatest(den, lit(1L)).cast(DoubleType), 6)
    val out = df
      .withColumn("__s1", VecExprs.ngramRepStats(t, 1))
      .withColumn("__s2", VecExprs.ngramRepStats(t, 2))
      .withColumn("__s3", VecExprs.ngramRepStats(t, 3))
      .withColumn("dup_word_frac",
        frac(col("__s1.total") - col("__s1.distinct"), col("__s1.total")))
      .withColumn("dup_2gram_frac",
        frac(col("__s2.total") - col("__s2.distinct"), col("__s2.total")))
      .withColumn("dup_3gram_frac",
        frac(col("__s3.total") - col("__s3.distinct"), col("__s3.total")))
      .withColumn("top_2gram_frac", frac(col("__s2.top") * 2, col("__s1.total")))
      .withColumn("top_3gram_frac", frac(col("__s3.top") * 3, col("__s1.total")))
    // docs under 10 tokens pass: the top-n-gram fractions are dominated by
    // the tiny denominator there (one bigram in a 3-token doc covers 2/3 of
    // it); the reference Gopher rules likewise only apply repetition cuts
    // above a minimum length (a separate min-length filter handles shorts)
    out.withColumn("repetition_ok",
        col("__s1.total") < 10 ||
          (col("dup_word_frac") <= 0.65 && col("dup_2gram_frac") <= 0.10 &&
            col("top_2gram_frac") <= 0.20 && col("top_3gram_frac") <= 0.18))
      .drop("__s1", "__s2", "__s3")
  }

  /** Fingerprints: exact md5 of normalized content + min-shingle robust hash. */
  def fingerprints(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fp_exact", Text.contentFingerprint(col(textCol)))
      .withColumn("fp_minshingle", Text.minShingleFingerprint(col(textCol)))

  /** PII / link scrubbing patterns, in application order. Deliberately
    * restricted to the regex subset RE2 and java.util.regex agree on (no
    * backreferences, no lookaround): the scrub must produce BYTE-IDENTICAL
    * output on any engine so redaction is auditable — a corpus scrubbed
    * twice, or scrubbed and verified by a different system, hashes the
    * same. Order matters: URLs are scrubbed before emails so `user@host`
    * inside a URL is consumed by the URL rule.
    */
  val ScrubRules: Seq[(String, String, String)] = Seq(
    // (name, pattern, replacement token)
    ("url", "https?://[^\\s]+", "<URL>"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("phone", "\\+?[0-9][0-9() .-]{6,}[0-9]", "<PHONE>"),
  )

  /** Unicode NFC normalization with an audit flag — the encoding-repair
    * stage of corpus cleaning (decomposed combining sequences compose to
    * their canonical forms, so fingerprints/dedup see ONE byte
    * representation per canonically-equal string). Pure codegen'd scan
    * (loop expression `NfcNormalize`), zero shuffles; `nfc_changed`
    * aggregates into "how much mojibake did this shard carry" without
    * re-reading the text.
    */
  def normalizeUnicode(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("nfc_text",
        graft.functions.VecExprs.nfcNormalize(col(textCol)))
      .withColumn("nfc_changed", col(textCol) =!= col("nfc_text"))

  /** C4-style heuristic page/line cleaning (Raffel et al. 2020, "Exploring
    * the Limits of Transfer Learning" §2.2 — the published C4 rules, made
    * parametric). Line rules — a non-empty line is KEPT iff it (a) ends in
    * a terminal punctuation mark ('.', '!', '?', '"'), (b) has at least
    * `minWordsPerLine` whitespace-separated words, and (c) contains none of
    * `dropLineTokens` (case-insensitive — C4 drops "javascript" lines).
    * Page rule — `page_ok` iff at least `minLines` lines survive AND the
    * raw text contains none of `dropPageSubstrings` (case-insensitive —
    * C4 drops "lorem ipsum" and curly-brace pages).
    *
    * Output: idCols, `clean_text` (kept lines joined by newline),
    * `n_lines_total`, `n_lines_kept`, `page_ok`. Pure column expressions:
    * one codegen'd scan, zero shuffles, linear at any corpus size.
    */
  def c4Filter(df: DataFrame, textCol: String, idCols: Seq[String],
               minWordsPerLine: Int = 5, minLines: Int = 3,
               dropLineTokens: Seq[String] = Seq("javascript"),
               dropPageSubstrings: Seq[String] = Seq("lorem ipsum", "{")): DataFrame = {
    def lineOk(l: Column): Column = {
      val t = trim(l)
      val endOk = substring(t, -1, 1).isin(".", "!", "?", "\"")
      val wordsOk = size(split(t, "\\s+")) >= minWordsPerLine
      val tokenBad = dropLineTokens.map(tok => lower(l).contains(tok.toLowerCase))
        .reduceOption(_ || _).getOrElse(lit(false))
      endOk && wordsOk && !tokenBad
    }
    val pageBad = dropPageSubstrings
      .map(sub => lower(col(textCol)).contains(sub.toLowerCase))
      .reduceOption(_ || _).getOrElse(lit(false))
    // staged selects so the kept-lines array is computed once per row (the
    // filter lambdas are not cheap enough for CollapseProject to inline)
    df.select(idCols.map(col) ++ Seq(
        filter(split(col(textCol), "\n"),
          l => length(trim(l)) > 0).as("__lines"),
        pageBad.as("__page_bad")): _*)
      .select(idCols.map(col) ++ Seq(
        col("__lines"), col("__page_bad"),
        filter(col("__lines"), l => lineOk(l)).as("__kept")): _*)
      .select(idCols.map(col) ++ Seq(
        array_join(col("__kept"), "\n").as("clean_text"),
        size(col("__lines")).cast(LongType).as("n_lines_total"),
        size(col("__kept")).cast(LongType).as("n_lines_kept"),
        (size(col("__kept")) >= minLines && !col("__page_bad")).as("page_ok")): _*)
  }

  /** Redact PII/links from `textCol`: emits `scrubbed` plus one
    * `n_<rule>` match-count column per rule (the counts are the audit
    * trail — "how much PII did this shard contain" aggregates without
    * rereading the text). Pure column expressions: one codegen'd scan,
    * zero shuffles, linear at any corpus size.
    */
  def scrubPii(df: DataFrame, textCol: String): DataFrame = {
    val counted = ScrubRules.foldLeft(df) { case (d, (name, pat, _)) =>
      d.withColumn(s"n_$name",
        size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast(LongType))
    }
    // counts are measured on the ORIGINAL text per rule, but replacement
    // is sequential so earlier rules' tokens are never re-matched
    val scrubbed = ScrubRules.foldLeft(col(textCol)) {
      case (c, (_, pat, token)) => regexp_replace(c, pat, token)
    }
    counted.withColumn("scrubbed", scrubbed)
  }
}
