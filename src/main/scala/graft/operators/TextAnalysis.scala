package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.sources.Tables

/** Text-analysis queries over `documents` (SURVEY §2 E8–E11). */
object TextAnalysis {

  /** E10 — whitespace + BPE-ish token counting. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      TextFns.wsTokenCount(col("text")).cast("long").as("ws_tokens"),
      TextFns.bpeTokenCount(col("text")).cast("long").as("bpe_tokens"),
      length(col("text")).cast("long").as("text_chars"))
    .orderBy(col("doc_id"))

  val tokenCountSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS bpe_tokens,
      |  CAST(length(text) AS BIGINT) AS text_chars
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** E9 — quality scoring: log-length × vocab diversity × stopword factor. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      round(TextFns.distinctRatio(col("text")), 4).as("distinct_ratio"),
      round(TextFns.stopwordRatio(col("text")), 4).as("stopword_ratio"),
      round(TextFns.qualityScore(col("text")), 4).as("quality"))
    .orderBy(col("doc_id"))

  val qualityScoreSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |SELECT doc_id,
      |  round(CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 4) AS distinct_ratio,
      |  round(CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(w), 4) AS stopword_ratio,
      |  round(ln(CAST(len(w) AS DOUBLE) + 1)
      |    * (CAST(len(list_distinct(w)) AS DOUBLE) / len(w))
      |    * (1.0 - CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(w)), 4) AS quality
      |FROM t
      |ORDER BY doc_id""".stripMargin

  /** E8 — language-ID heuristic vs the labeled lang column (rows-only;
    * LangIdSpec covers semantic accuracy on crafted sentences — the
    * synthetic corpus text is English-ish regardless of its label).
    */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      TextFns.langId(col("text")).as("predicted_lang"),
      col("lang").as("labeled_lang"))
    .orderBy(col("doc_id"))

  /** E11 — winnowing fingerprints (rows-only; FingerprintSpec asserts
    * the near-dup-overlap property).
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(TextFns.fingerprints(col("text"))).as("n_fingerprints"),
      array_min(TextFns.fingerprints(col("text"))).as("min_fp"))
    .orderBy(col("doc_id"))
}
