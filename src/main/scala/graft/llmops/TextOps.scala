package graft.llmops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language-ID heuristic,
  * and document fingerprinting.
  *
  * All are pure Column expressions (whole-stage codegen, no UDFs), so
  * they run inside the scan projection at 100 TB with zero extra
  * shuffles.
  */
object TextOps {

  /** Whitespace normalization + lowercase — the canonical text form. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alpha runs, digit runs, and single
    * punctuation marks each count as one token (a cheap stand-in for a
    * real byte-pair-encoding vocabulary).
    */
  def bpeTokenCount(text: Column): Column =
    size(call_function("regexp_extract_all", text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Exact occurrence count of any of `words` among the tokens. */
  def wordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(words)))

  // Tiny per-language stopword lists for the language-ID heuristic.
  val EnStop = Seq("the", "a", "and", "of", "to", "in", "is", "it")
  val DeStop = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein")
  val FrStop = Seq("le", "les", "et", "est", "pas", "avec", "dans", "une")
  val EsStop = Seq("el", "los", "y", "es", "no", "con", "por", "para")

  /** Count of CJK (Han) characters — the zh signal. */
  def cjkCount(text: Column): Column =
    length(regexp_replace(text, "[^\\u4e00-\\u9fff]", ""))

  /** Language-ID by stopword/charset scoring with a fixed priority
    * order (en > de > fr > es > zh) on ties. A real system would use
    * character n-gram models; the shape (per-row scoring expression,
    * argmax) is identical.
    */
  def langId(text: Column): Column = {
    val en = wordHits(text, EnStop)
    val de = wordHits(text, DeStop)
    val fr = wordHits(text, FrStop)
    val es = wordHits(text, EsStop)
    val zh = cjkCount(text)
    when(en >= de && en >= fr && en >= es && en >= zh, "en")
      .when(de >= fr && de >= es && de >= zh, "de")
      .when(fr >= es && fr >= zh, "fr")
      .when(es >= zh, "es")
      .otherwise("zh")
  }

  /** Heuristic quality score in [0,1]: rewards length and stopword
    * density, penalizes digit-heavy text.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val stopRatio = wordHits(text, EnStop).cast("double") / nTok
    val digitRatio =
      length(regexp_replace(text, "[^0-9]", "")).cast("double") / length(text).cast("double")
    lit(0.4) * least(nTok / 50.0, lit(1.0)) +
      lit(0.3) * least(stopRatio * 5.0, lit(1.0)) +
      lit(0.3) * (lit(1.0) - least(digitRatio * 10.0, lit(1.0)))
  }

  /** Content fingerprint: md5 of the normalized text (byte-identical
    * duplicates collapse).
    */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Canonical token-set fingerprint: md5 over the sorted distinct
    * tokens — invariant to word order and repetition, so shuffled
    * near-duplicates collapse too.
    */
  def tokenSetFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))
}
