package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Text-analysis operators for training-data pipelines, over the
  * `documents(doc_id, text, lang, source, n_chars)` table.
  *
  * Everything here is built from `org.apache.spark.sql.functions`
  * (codegen'd, whole-stage) — no UDFs — except language-ID, which is
  * genuinely control-flow heavy and runs as one `mapPartitions` pass
  * with per-partition setup.
  */
object TextOps {

  val Stopwords: Seq[String] = Seq(
    "the", "a", "of", "and", "to", "in", "is", "it", "on", "for", "with",
    "as", "at", "by", "an", "be", "this", "that", "from", "or")

  /** whitespace tokens (documents.text is space-separated). */
  def tokens(text: Column): Column = split(text, " +")

  /** Token counting: whitespace tokens + a BPE-ish subword token count
    * (runs of letters, digits, or single punctuation — the classic
    * GPT-2-style pre-tokenizer shape, counted not materialized). */
  def withTokenCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("n_ws_tokens", size(tokens(col(textCol))))
      .withColumn("n_bpe_tokens",
        size(regexp_extract_all(col(textCol), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))))

  /** Quality scoring signals as exact integer counts (ratios are for
    * the caller — integers keep DuckDB-oracle comparisons exact). */
  def withQualitySignals(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    df.withColumn("n_chars_obs", length(col(textCol)))
      .withColumn("n_tokens", size(toks))
      .withColumn("n_stopwords",
        size(filter(toks, t => t.isInCollection(Stopwords))))
      .withColumn("n_punct",
        length(col(textCol)) - length(regexp_replace(col(textCol), lit("[.,;:!?]"), lit(""))))
      .withColumn("n_upper",
        length(col(textCol)) - length(regexp_replace(col(textCol), lit("[A-Z]"), lit(""))))
  }

  /** Document fingerprint: 64-bit content hash of the normalized text
    * (xxhash64 — Spark-native, seed 42) plus an md5 hex fingerprint
    * (portable to DuckDB for the oracle). */
  def withFingerprints(df: DataFrame, textCol: String = "text"): DataFrame = {
    val norm = lower(regexp_replace(col(textCol), lit("\\s+"), lit(" ")))
    df.withColumn("fp_md5", md5(norm))
      .withColumn("fp_xx64", xxhash64(norm))
  }

  /** Language-ID: stopword-profile n-gram heuristic. Tiny per-language
    * marker lists; score = marker hits; argmax wins, "und" if no hits.
    * mapPartitions: profiles built once per partition, no shuffle.
    */
  val LangMarkers: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "with", "is"),
    "de" -> Set("der", "die", "das", "und", "mit"),
    "es" -> Set("el", "la", "los", "con", "que"),
    "fr" -> Set("le", "la", "les", "avec", "est"),
    "zh" -> Set("的", "和", "是", "了", "在")
  )

  def withLangId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    // one struct(score, lang) per language; array_max = argmax because
    // struct ordering is field-by-field (score first, lang breaks ties
    // deterministically). Whole-stage codegen end to end — no UDF.
    val scored = LangMarkers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      struct(
        size(filter(toks, t => t.isInCollection(ms.toSeq))).as("score"),
        lit(lang).as("lang"))
    }
    df.withColumn("_ls", array_max(array(scored: _*)))
      .withColumn("lang_pred",
        when(col("_ls.score") > 0, col("_ls.lang")).otherwise(lit("und")))
      .drop("_ls")
  }
}
