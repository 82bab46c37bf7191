package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: per-document
  * statistics/quality features, marker-based language ID, tokenizer-style
  * counting, and content fingerprinting. Everything is a codegen'd column
  * expression over the text column — no per-row UDF in the hot path, so
  * the operators vectorize and scale with the scan.
  */
object TextAnalysis {

  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Per-document statistics + a composite quality score. */
  def stats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = split(col(textCol), " ")
    val stopArr = array(Stopwords.map(lit): _*)
    docs.select(
      col(idCol),
      length(col(textCol)).as("n_chars"),
      size(words).as("n_tokens"),
      size(array_distinct(words)).as("n_types"),
      round(
        expr(s"aggregate(transform(split($textCol, ' '), w -> length(w)), 0L, (acc, x) -> acc + x)")
          .cast("double") / size(words), 4).as("avg_wlen"),
      round(size(filter(words, w => array_contains(stopArr, w))).cast("double") /
        size(words), 4).as("stop_ratio"),
      round(size(array_distinct(words)).cast("double") / size(words), 4).as("ttr"))
  }

  /** Marker-word language ID: score each language by marker hits, argmax
    * with lexicographic tie-break. (An n-gram-profile classifier reduces to
    * the same shape: per-language score columns + greatest().) */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "fast", "slow", "order"),
    "de" -> Seq("der", "die", "das", "und", "schnell"),
    "es" -> Seq("el", "la", "los", "rapido", "orden"),
    "fr" -> Seq("le", "la", "les", "vite", "ordre"),
    "zh" -> Seq("de", "shi", "kuai", "man", "biao"))

  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = split(col(textCol), " ")
    val scored = LangMarkers.toSeq.sortBy(_._1).foldLeft(docs.select(col(idCol), col(textCol))) {
      case (df, (lang, markers)) =>
        df.withColumn(s"score_$lang",
          size(filter(words, w => array_contains(array(markers.map(lit): _*), w))))
    }
    val langs = LangMarkers.keys.toSeq.sorted
    val best = langs.map(l => struct(col(s"score_$l").as("s"), lit(l).as("l")))
      .reduce((a, b) => when(b.getField("s") > a.getField("s"), b).otherwise(a))
    scored.select(col(idCol), best.getField("l").as("lang_pred"),
      greatest(langs.map(l => col(s"score_$l")): _*).as("best_score"))
  }

  /** Token counting: whitespace tokens and a BPE-ish regex segmentation
    * (letter runs | digit runs | single non-alnum). */
  def tokenCounts(docs: DataFrame, groupCol: String, textCol: String): DataFrame =
    docs.select(col(groupCol),
        size(split(col(textCol), " ")).as("ws"),
        size(expr(s"regexp_extract_all($textCol, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)")).as("bpe"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("ws_tokens"),
        sum(col("bpe")).as("bpe_tokens"))

  /** Content fingerprint: md5 over whitespace-normalized lowercase text —
    * the cheap first-pass near-dup key (differences in case/spacing
    * collapse to one fingerprint). */
  def fingerprint(docs: DataFrame, textCol: String): org.apache.spark.sql.Column =
    md5(lower(regexp_replace(trim(col(textCol)), " +", " ")))
}
