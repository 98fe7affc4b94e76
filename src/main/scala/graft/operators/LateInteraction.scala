package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables

/** E88 — late-interaction retrieval scoring (ColBERT's MaxSim,
  * Khattab & Zaharia 2020): score(q, d) = Σ_{query token} max_{doc
  * token} ⟨E(qt), E(dt)⟩ — per-token interaction kept until scoring
  * instead of pooling to one vector, the middle ground between
  * bi-encoder ANN (E6) and full cross-attention rerank.
  *
  * Token "embeddings" are derived DETERMINISTICALLY from character
  * arithmetic (an integer-lattice hash both engines compute exactly),
  * so the whole pipeline — per-token dots, per-query-token max, MaxSim
  * sum, ranking — is exact integer math and fully oracle-checkable;
  * a real deployment swaps the derivation for a model's token vectors
  * and keeps the identical plan.
  *
  * Scale shape: DISTINCT doc tokens (max over duplicates is the same
  * max) joined against a bounded literal query-token list (real query
  * batches are 10²–10³ tokens — always broadcastable); cost is linear
  * in corpus vocabulary-per-doc × query tokens, the same contract as a
  * posting-list traversal. Two map-side-combined aggregates follow; the
  * final top-k is a per-query bounded window.
  */
object LateInteraction {

  /** The dim-d lattice coordinate of a token: mixes the first two
    * character codes, the length, and the dim index into [-9, 9].
    */
  private def dimOf(tok: Column, d: Int): Column =
    (ascii(substring(tok, 1, 1)) * 31 +
      when(length(tok) < 2, 0).otherwise(ascii(substring(tok, 2, 1))) * 17 +
      length(tok) * 7 + lit(d) * 13) % 19 - 9

  private val dims = 4

  val queries: Seq[(Long, String)] = Seq(
    (1L, "fast hash join"), (2L, "slow table scan"), (3L, "stream window agg"))

  def maxSimRerank(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import spark.implicits._
    val qToks = queries
      .flatMap { case (id, text) => text.split(" ").map(t => (id, t)) }
      .toDF("q_id", "q_tok")
    val dToks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("d_tok"))
      .filter(col("d_tok") =!= "")
      .distinct()
    val dot = (0 until dims)
      .map(d => dimOf(col("q_tok"), d) * dimOf(col("d_tok"), d))
      .reduce(_ + _)
    val ranked = dToks
      .crossJoin(broadcast(qToks))
      .groupBy(col("q_id"), col("doc_id"), col("q_tok"))
      .agg(max(dot).as("best"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("best")).as("score"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rnk") <= k)
    ranked.select(col("q_id"), col("rnk"), col("doc_id"), col("score"))
      .orderBy(col("q_id"), col("rnk"))
  }

  val maxSimRerankSql: String =
    """WITH q_toks AS (
      |  SELECT * FROM (VALUES
      |    (1, 'fast'), (1, 'hash'), (1, 'join'),
      |    (2, 'slow'), (2, 'table'), (2, 'scan'),
      |    (3, 'stream'), (3, 'window'), (3, 'agg')) AS t(q_id, q_tok)),
      |d_toks AS (
      |  SELECT DISTINCT doc_id, tok AS d_tok
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  WHERE tok <> ''),
      |pairs AS (
      |  SELECT q.q_id, d.doc_id, q.q_tok,
      |    max((( ascii(substr(q.q_tok,1,1))*31
      |          + CASE WHEN length(q.q_tok) < 2 THEN 0 ELSE ascii(substr(q.q_tok,2,1)) END*17
      |          + length(q.q_tok)*7 + 0*13) % 19 - 9)
      |       *(( ascii(substr(d.d_tok,1,1))*31
      |          + CASE WHEN length(d.d_tok) < 2 THEN 0 ELSE ascii(substr(d.d_tok,2,1)) END*17
      |          + length(d.d_tok)*7 + 0*13) % 19 - 9)
      |      + (( ascii(substr(q.q_tok,1,1))*31
      |          + CASE WHEN length(q.q_tok) < 2 THEN 0 ELSE ascii(substr(q.q_tok,2,1)) END*17
      |          + length(q.q_tok)*7 + 1*13) % 19 - 9)
      |       *(( ascii(substr(d.d_tok,1,1))*31
      |          + CASE WHEN length(d.d_tok) < 2 THEN 0 ELSE ascii(substr(d.d_tok,2,1)) END*17
      |          + length(d.d_tok)*7 + 1*13) % 19 - 9)
      |      + (( ascii(substr(q.q_tok,1,1))*31
      |          + CASE WHEN length(q.q_tok) < 2 THEN 0 ELSE ascii(substr(q.q_tok,2,1)) END*17
      |          + length(q.q_tok)*7 + 2*13) % 19 - 9)
      |       *(( ascii(substr(d.d_tok,1,1))*31
      |          + CASE WHEN length(d.d_tok) < 2 THEN 0 ELSE ascii(substr(d.d_tok,2,1)) END*17
      |          + length(d.d_tok)*7 + 2*13) % 19 - 9)
      |      + (( ascii(substr(q.q_tok,1,1))*31
      |          + CASE WHEN length(q.q_tok) < 2 THEN 0 ELSE ascii(substr(q.q_tok,2,1)) END*17
      |          + length(q.q_tok)*7 + 3*13) % 19 - 9)
      |       *(( ascii(substr(d.d_tok,1,1))*31
      |          + CASE WHEN length(d.d_tok) < 2 THEN 0 ELSE ascii(substr(d.d_tok,2,1)) END*17
      |          + length(d.d_tok)*7 + 3*13) % 19 - 9)) AS best
      |  FROM d_toks d CROSS JOIN q_toks q
      |  GROUP BY q.q_id, d.doc_id, q.q_tok),
      |scores AS (
      |  SELECT q_id, doc_id, CAST(sum(best) AS BIGINT) AS score
      |  FROM pairs GROUP BY q_id, doc_id),
      |ranked AS (
      |  SELECT CAST(q_id AS BIGINT) AS q_id,
      |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS INTEGER) AS rnk,
      |    doc_id, score
      |  FROM scores)
      |SELECT q_id, rnk, doc_id, score
      |FROM ranked WHERE rnk <= 10
      |ORDER BY q_id, rnk""".stripMargin
}
