package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables

/** Corpus governance audits for the training-data pipeline (SURVEY §2
  * E85–E87): blocklist-lexicon content filtering, corpus snapshot diff,
  * and the Heaps'-law vocabulary-growth audit — the release-gate checks
  * that run beside dedup/quality before a corpus ships.
  */
object CorpusAudit {

  // ---- E85: blocklist-lexicon content filter ------------------------

  /** Weighted unsafe-term lexicon scoring (the wordlist gate of the
    * C4/RefinedWeb recipe: a curated lexicon, a per-document weighted
    * hit rate, a threshold). The lexicon is a literal broadcast (real
    * lists are 10²–10⁴ terms — always broadcastable); the corpus side
    * is one explode→join→aggregate, map-side combined on doc_id, so
    * cost is linear in corpus tokens at any scale. Stand-in terms are
    * drawn from the synthetic vocabulary; swap the list, not the plan.
    */
  val lexicon: Seq[(String, Int)] = Seq(("slow", 3), ("big", 2), ("merge", 1))

  def lexiconFilter(spark: SparkSession, dir: String, threshold: Double = 0.2): DataFrame = {
    import spark.implicits._
    val lex = lexicon.toDF("tok", "w")
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val scored = toks
      .join(broadcast(lex), Seq("tok"), "left")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_tok"),
        coalesce(sum(col("w")), lit(0L)).as("hits"))
      .select(col("doc_id"), col("source"), col("n_tok"),
        (col("hits").cast("double") / col("n_tok")).as("score"))
    scored
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("score") >= threshold, 1L).otherwise(0L)).as("n_flagged"),
        round(avg(col("score")), 6).as("avg_score"),
        round(max(col("score")), 6).as("max_score"))
      .orderBy(col("source"))
  }

  val lexiconFilterSql: String =
    """WITH toks AS (
      |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id, source, count(*) AS n_tok,
      |    CAST(sum(CASE tok WHEN 'slow' THEN 3 WHEN 'big' THEN 2
      |                      WHEN 'merge' THEN 1 ELSE 0 END) AS DOUBLE)
      |      / count(*) AS score
      |  FROM toks WHERE tok <> ''
      |  GROUP BY doc_id, source)
      |SELECT source,
      |  count(*) AS n_docs,
      |  CAST(sum(CASE WHEN score >= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
      |  round(avg(score), 6) AS avg_score,
      |  round(max(score), 6) AS max_score
      |FROM scored
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // ---- E86: corpus snapshot diff ------------------------------------

  /** Diff two corpus versions (the dataset-release changelog: which
    * documents were added / removed / changed / carried between v1 and
    * v2 — the audit that makes a training-set rebuild explainable).
    * Identity = doc_id, content identity = md5(text); the diff is ONE
    * full-outer join on doc_id with hash compare — at 100 TB both
    * sides hash-partition on doc_id and only (id, md5) pairs move, not
    * text. v2 is derived in-query deterministically (drops, edits,
    * additions) so the oracle reproduces it exactly.
    */
  def corpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val v1 = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
    val base = Tables.documents(spark, dir)
    val v2 = base.filter(col("doc_id") % 17 =!= 3) // removed
      .select(col("doc_id"), col("source"),
        md5(when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text"))).as("h")) // changed
      .unionByName(base.filter(col("doc_id") % 23 === 5) // added (new ids)
        .select((col("doc_id") + 1000000).as("doc_id"), col("source"),
          md5(col("text")).as("h")))
    v1.select(col("doc_id"), col("source").as("src1"), col("h").as("h1"))
      .join(v2.select(col("doc_id"), col("source").as("src2"), col("h").as("h2")),
        Seq("doc_id"), "full_outer")
      .select(
        when(col("h1").isNull, "added")
          .when(col("h2").isNull, "removed")
          .when(col("h1") =!= col("h2"), "changed")
          .otherwise("unchanged").as("status"),
        coalesce(col("src1"), col("src2")).as("source"),
        col("doc_id"))
      .groupBy(col("status"), col("source"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"))
      .orderBy(col("status"), col("source"))
  }

  val corpusDiffSql: String =
    """WITH v1 AS (
      |  SELECT doc_id, source, md5(text) AS h FROM documents),
      |v2 AS (
      |  SELECT doc_id, source,
      |    md5(CASE WHEN doc_id % 11 = 0 THEN concat(text, ' v2') ELSE text END) AS h
      |  FROM documents WHERE doc_id % 17 <> 3
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, source, md5(text) AS h
      |  FROM documents WHERE doc_id % 23 = 5),
      |d AS (
      |  SELECT
      |    CASE WHEN a.h IS NULL THEN 'added'
      |         WHEN b.h IS NULL THEN 'removed'
      |         WHEN a.h <> b.h THEN 'changed'
      |         ELSE 'unchanged' END AS status,
      |    coalesce(a.source, b.source) AS source,
      |    coalesce(a.doc_id, b.doc_id) AS doc_id
      |  FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
      |SELECT status, source, count(*) AS n,
      |  CAST(min(doc_id) AS BIGINT) AS first_doc
      |FROM d
      |GROUP BY status, source
      |ORDER BY status, source""".stripMargin

  // ---- E87: Heaps'-law vocabulary growth ----------------------------

  /** Vocabulary-growth audit (Heaps' law V(T) = K·T^β): scan the corpus
    * in doc_id order, record (tokens seen, distinct types seen) at each
    * corpus decile, and fit β by least squares on the log-log points —
    * natural corpora sit at β≈0.5–0.7; β near 1 means unbounded novel
    * junk (OCR noise, random ids), β near 0 means template spam. The
    * E35 Zipf audit reads the frequency table; this reads ACCUMULATION,
    * which is what predicts tokenizer-vocab coverage on a 10× corpus.
    * The TYPE unit is the word BIGRAM (Heaps over n-grams — the same
    * law with a larger exponent): the synthetic corpus has a closed
    * unigram vocabulary that saturates in the first decile, while its
    * bigram space keeps growing, so the fit stays informative — and a
    * real corpus audit wants the n-gram curve anyway, since it is what
    * bounds a subword tokenizer's merge-table coverage.
    *
    * Scale shape: per-token work is one groupBy(token).min(first rank);
    * the only global sort is row_number over DOC KEYS (id + count, not
    * text). The decile table is 10 rows, broadcast to both probes; the
    * log-log fit floors to integer micro-logs (exact BIGINT sums, one
    * fixed-order double expression — the E35 recipe) so the fit is
    * bit-identical cross-engine.
    */
  def heapsLaw(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      // types = word bigrams; zip_with of the two shifted slices is
      // empty for 1-token docs, no branch needed
      .withColumn("grams", expr(
        "CASE WHEN size(toks) >= 2 THEN " +
          "zip_with(slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1)," +
          " (a, b) -> concat(a, ' ', b)) ELSE array() END"))
    val ranked = docs
      .select(col("doc_id"), col("grams"), size(col("toks")).as("n_tok"))
      .withColumn("doc_rank", row_number().over(Window.orderBy(col("doc_id"))))
    val nDocs = ranked.agg(max(col("doc_rank")).as("n_docs"))
    val checkpoints = nDocs
      .select(explode(sequence(lit(1), lit(10))).as("decile"), col("n_docs"))
      .select(col("decile"), floor(col("n_docs") * col("decile") / 10).cast("long").as("rank_cut"))
    // Accumulation via ONE running-sum window over the doc order the
    // row_number already paid for, then an EQUI join picks the decile
    // rows — no broadcast range join. New-type counts per rank densify
    // through the ranked frame (left equi join on first-occurrence
    // rank), so the cumulative count exists at EVERY rank cut.
    val firstRank = ranked
      .select(col("doc_rank"), explode(col("grams")).as("tok"))
      .groupBy(col("tok")).agg(min(col("doc_rank")).as("fr"))
    val newAtRank = firstRank.groupBy(col("fr")).agg(count(lit(1)).as("new_types"))
    val cumW = Window.orderBy(col("doc_rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = ranked.select(col("doc_rank"), col("n_tok"))
      .join(newAtRank, col("doc_rank") === col("fr"), "left")
      .select(col("doc_rank"), col("n_tok"), coalesce(col("new_types"), lit(0L)).as("nt"))
      .select(col("doc_rank"),
        sum(col("n_tok")).over(cumW).as("tokens_seen"),
        sum(col("nt")).over(cumW).as("vocab_seen"))
    val points = cum
      .join(broadcast(checkpoints), col("doc_rank") === col("rank_cut"))
      .select(col("decile"), col("rank_cut"), col("tokens_seen"), col("vocab_seen"))
    val fit = points
      .select(
        floor(log(col("tokens_seen").cast("double")) * 1e6).cast("long").as("xu"),
        floor(log(col("vocab_seen").cast("double")) * 1e6).cast("long").as("yu"))
      .agg(count(lit(1)).as("k"), sum(col("xu")).as("sx"), sum(col("yu")).as("sy"),
        sum(col("xu") * col("yu")).as("sxy"), sum(col("xu") * col("xu")).as("sxx"))
      .select(
        ((col("k").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (col("k").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double"))).as("beta"))
    points.crossJoin(broadcast(fit))
      .select(col("decile"), col("rank_cut").as("n_docs"),
        col("tokens_seen"), col("vocab_seen"),
        round(col("beta"), 6).as("heaps_beta"))
      .orderBy(col("decile"))
  }

  val heapsLawSql: String =
    """WITH docs AS (
      |  SELECT doc_id, toks,
      |    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS grams,
      |    row_number() OVER (ORDER BY doc_id) AS doc_rank
      |  FROM (SELECT doc_id,
      |          list_filter(string_split(text, ' '), t -> t <> '') AS toks
      |        FROM documents)),
      |cuts AS (
      |  SELECT decile, CAST(floor(n_docs * decile / 10) AS BIGINT) AS rank_cut
      |  FROM (SELECT unnest(range(1, 11)) AS decile,
      |               (SELECT max(doc_rank) FROM docs) AS n_docs)),
      |toks_seen AS (
      |  SELECT c.decile, c.rank_cut,
      |    CAST(sum(len(d.toks)) AS BIGINT) AS tokens_seen
      |  FROM docs d JOIN cuts c ON d.doc_rank <= c.rank_cut
      |  GROUP BY c.decile, c.rank_cut),
      |first_rank AS (
      |  SELECT tok, min(doc_rank) AS fr
      |  FROM (SELECT doc_rank, unnest(grams) AS tok FROM docs)
      |  GROUP BY tok),
      |vocab_seen AS (
      |  SELECT c.decile, CAST(count(*) AS BIGINT) AS vocab_seen
      |  FROM first_rank f JOIN cuts c ON f.fr <= c.rank_cut
      |  GROUP BY c.decile),
      |points AS (
      |  SELECT t.decile, t.rank_cut, t.tokens_seen, v.vocab_seen
      |  FROM toks_seen t JOIN vocab_seen v USING (decile)),
      |fit AS (
      |  SELECT (CAST(count(*) AS DOUBLE) * CAST(sum(xu * yu) AS DOUBLE) -
      |          CAST(sum(xu) AS DOUBLE) * CAST(sum(yu) AS DOUBLE)) /
      |         (CAST(count(*) AS DOUBLE) * CAST(sum(xu * xu) AS DOUBLE) -
      |          CAST(sum(xu) AS DOUBLE) * CAST(sum(xu) AS DOUBLE)) AS beta
      |  FROM (SELECT
      |          CAST(floor(ln(CAST(tokens_seen AS DOUBLE)) * 1000000) AS BIGINT) AS xu,
      |          CAST(floor(ln(CAST(vocab_seen AS DOUBLE)) * 1000000) AS BIGINT) AS yu
      |        FROM points))
      |SELECT decile, rank_cut AS n_docs, tokens_seen, vocab_seen,
      |  round(beta, 6) AS heaps_beta
      |FROM points CROSS JOIN fit
      |ORDER BY decile""".stripMargin
}
