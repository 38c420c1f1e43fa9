package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines
  * (north-star surface, SURVEY §7.4). All are pure `Column` expressions
  * built from `org.apache.spark.sql.functions` — codegen'd, no UDFs, so
  * they stay inside WholeStageCodegen and scale linearly with input at
  * 100 TB (no shuffle, no driver round-trips).
  *
  * Every function here has a DuckDB-SQL-expressible twin used as the
  * correctness oracle (SparkEntry.oracleSql) — the expressions are chosen
  * so both engines produce bit-identical results (integer counts, md5
  * hex, double arithmetic in fixed evaluation order).
  */
object TextFunctions {

  /** Regex-strip all border whitespace (SQL `trim` is space-only; Java
    * `String.trim` strips controls — this is the one normalization every
    * path shares, mirrored as `^\s+|\s+$` with the 'g' flag in DuckDB).
    */
  private def wsStrip(text: Column): Column =
    regexp_replace(text, "^\\s+|\\s+$", "")

  /** Whitespace tokenization count: split on `\s+` after border-strip,
    * with the empty-string guard both engines share.
    */
  def tokenCount(text: Column): Column = {
    val t = wsStrip(text)
    when(length(t) === 0, lit(0)).otherwise(size(split(t, "\\s+")))
  }

  /** Normalized document fingerprint: md5 of lowercase,
    * whitespace-collapsed text. Identical content → identical fingerprint
    * regardless of spacing/case — the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(wsStrip(lower(text)), "\\s+", " "))

  /** Shared English stopword list for ratio-style quality signals —
    * one constant used by BOTH the engine expression and the generated
    * DuckDB oracle so the two can never drift.
    */
  val stopwords: Seq[String] = Seq(
    "the", "and", "of", "is", "to", "in", "a", "that", "it", "for",
    "on", "with", "as", "was", "at", "by", "an", "be")

  /** Occurrence count of [[stopwords]] in `termCounts` (a TermCounts
    * map<term,count> column): a fixed fan of codegen'd map lookups, no
    * HOF (higher-order functions evaluate interpreted). Callers must
    * materialize the TermCounts column in a separate projection first —
    * referencing it here many times would otherwise duplicate the
    * map-building expression per lookup.
    */
  def stopwordCount(termCounts: Column): Column =
    stopwords.map(w => coalesce(try_element_at(termCounts, lit(w)), lit(0)))
      .reduce(_ + _)

  /** Marker-word language-ID heuristic: count hits from a tiny per-language
    * stopword set; predict the argmax, ties broken by language order,
    * no hits → "und". Deterministic and SQL-expressible; a real system
    * swaps in a character-n-gram model behind the same Column signature.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "und", "das", "ist"),
    "fr" -> Seq("le", "et", "les", "est"),
    "es" -> Seq("el", "los", "las", "es"),
    "zh" -> Seq("de0", "shi4", "le0", "zai4"))

  private def markerHits(text: Column, words: Seq[String]): Column = {
    // count words via padded LIKE — language-agnostic, same in DuckDB
    val padded = concat(lit(" "), lower(text), lit(" "))
    words.map(w => when(padded.contains(s" $w "), 1).otherwise(0))
      .reduce((a: Column, b: Column) => a + b)
  }

  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, words) => lang -> markerHits(text, words) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language (in langMarkers order) reaching the max score
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Heuristic quality score in [0,1]: blends token count saturation,
    * mean token length plausibility, punctuation and digit ratios.
    * Double arithmetic in a fixed evaluation order (single codegen'd
    * expression) so it reproduces bit-identically in the oracle; callers
    * round for display.
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nTokens = tokenCount(text).cast("double")
    val punct = (nChars - length(regexp_replace(text, "[.,;:!?]", ""))).cast("double")
    val digits = (nChars - length(regexp_replace(text, "[0-9]", ""))).cast("double")
    val lenScore = least(nTokens / lit(100.0), lit(1.0))
    val meanTok = when(nTokens > 0, nChars / nTokens).otherwise(lit(0.0))
    val tokScore = when(meanTok >= 3 && meanTok <= 10, lit(1.0)).otherwise(lit(0.5))
    val punctRatio = when(nChars > 0, punct / nChars).otherwise(lit(0.0))
    val digitRatio = when(nChars > 0, digits / nChars).otherwise(lit(0.0))
    lit(0.4) * lenScore + lit(0.3) * tokScore +
      lit(0.15) * (lit(1.0) - least(punctRatio * lit(10.0), lit(1.0))) +
      lit(0.15) * (lit(1.0) - least(digitRatio * lit(10.0), lit(1.0)))
  }

  /** Word n-gram shingles (lowercased, whitespace-tokenized). The MinHash /
    * Jaccard dedup unit. `transform` over a sequence of start offsets —
    * stays codegen-adjacent (no UDF).
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(regexp_replace(wsStrip(lower(text)), "\\s+", " "), " ")
    val starts = sequence(lit(0), greatest(size(toks) - n, lit(0)))
    array_distinct(
      when(size(toks) < n, array(array_join(toks, " ")))
        .otherwise(transform(starts, i => array_join(slice(toks, i + 1, lit(n)), " "))))
  }
}
