package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables

/** Corpus governance audits for the training-data pipeline (SURVEY §2
  * E85–E87, E112–E115): blocklist-lexicon content filtering, corpus
  * snapshot diff, the Heaps'-law vocabulary-growth audit, PMI
  * collocation mining, source-concentration measurement, the
  * Zipf rank-frequency fit, and per-source distribution divergence —
  * the release-gate checks that run beside dedup/quality before a
  * corpus ships.
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

  // ---- E112: PMI collocation mining ---------------------------------

  /** Top pointwise-mutual-information collocations (Church & Hanks
    * 1990 — the phrase-mining score behind multi-word-expression
    * detection and phrase-aware tokenizer vocabularies). PMI =
    * ln(c(w1w2)·B / (c(w1·)·c(·w2))) over bigram events with a
    * min-count floor (rare pairs have unboundedly inflated PMI — the
    * documented pathology the floor removes). Counts are exact
    * integers, the products stay under 2^53 so the double division is
    * exact-operand cross-engine, PMI floors to integer micro-nats.
    *
    * Scale shape: one codegen'd zip_with bigram pass, vocab²-bounded
    * margin joins, and a TakeOrdered top-k (bounded heap per
    * partition + driver merge — never a single-partition sort).
    */
  def collocations(spark: SparkSession, dir: String,
                   minCount: Long = 5L, k: Int = 50): DataFrame = {
    val bg = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(explode(expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1)," +
          " (a, b) -> struct(a AS w1, b AS w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bc = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_b"))
    val c1 = bc.groupBy(col("w1")).agg(sum(col("c_b")).as("c_1"))
    val c2 = bc.groupBy(col("w2")).agg(sum(col("c_b")).as("c_2"))
    val b = bg.count()
    bc.filter(col("c_b") >= minCount)
      .join(c1.hint("shuffle_hash"), "w1")
      .join(c2.hint("shuffle_hash"), "w2")
      .withColumn("pmi_micro",
        floor(log((col("c_b") * lit(b)).cast("double") /
          (col("c_1") * col("c_2")).cast("double")) * 1e6).cast("long"))
      .select(col("w1"), col("w2"), col("c_b"), col("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
      .limit(k)
  }

  val collocationsSql: String =
    """WITH d AS (SELECT string_split(text, ' ') AS w FROM documents),
      |bg AS (
      |  SELECT
      |    unnest(list_transform(range(len(w) - 1), i -> w[i+1])) AS w1,
      |    unnest(list_transform(range(len(w) - 1), i -> w[i+2])) AS w2
      |  FROM d),
      |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_b FROM bg GROUP BY 1, 2),
      |c1 AS (SELECT w1, CAST(sum(c_b) AS BIGINT) AS c_1 FROM bc GROUP BY 1),
      |c2 AS (SELECT w2, CAST(sum(c_b) AS BIGINT) AS c_2 FROM bc GROUP BY 1),
      |b AS (SELECT CAST(sum(c_b) AS BIGINT) AS b FROM bc)
      |SELECT w1, w2, c_b,
      |  CAST(floor(ln(CAST(c_b * (SELECT b FROM b) AS DOUBLE) /
      |    CAST(c_1 * c_2 AS DOUBLE)) * 1e6) AS BIGINT) AS pmi_micro
      |FROM bc JOIN c1 USING (w1) JOIN c2 USING (w2)
      |WHERE c_b >= 5
      |ORDER BY pmi_micro DESC, w1, w2
      |LIMIT 50""".stripMargin

  // ---- E113: source-concentration measurement -----------------------

  /** Source-concentration audit: the Herfindahl-Hirschman index over
    * per-source token shares plus the effective-source count (1/HHI) —
    * the diversity number a data card reports (a corpus can have 20
    * sources and still be one source in effect). All arithmetic is
    * exact: per-source counts aggregate distributed; the scalar HHI
    * fold runs driver-side on the source-cardinality handful with
    * arbitrary-precision integers (BigInt — the N² products overflow
    * longs past ~3M tokens), mirrored by the oracle's HUGEINT floor
    * divisions.
    */
  def sourceConcentration(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("n_toks"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = counts.map(c => BigInt(c._2)).sum
    val ss = counts.map(c => BigInt(c._2) * BigInt(c._2)).sum
    val row = (
      counts.length.toLong,
      n.toLong,
      (ss * 1000000 / (n * n)).toLong,
      (n * n * 1000000 / ss).toLong,
      (BigInt(counts.map(_._2).max) * 10000 / n).toLong)
    val s = spark
    import s.implicits._
    Seq(row).toDF("n_sources", "n_toks", "hhi_e6", "eff_sources_micro",
      "top_share_bp")
  }

  val sourceConcentrationSql: String =
    """WITH c AS (
      |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n
      |  FROM documents GROUP BY 1),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n_sources,
      |             CAST(sum(n) AS HUGEINT) AS nt,
      |             sum(CAST(n AS HUGEINT) * n) AS ss,
      |             CAST(max(n) AS HUGEINT) AS mx
      |      FROM c)
      |SELECT n_sources,
      |  CAST(nt AS BIGINT) AS n_toks,
      |  CAST((ss * 1000000) // (nt * nt) AS BIGINT) AS hhi_e6,
      |  CAST((nt * nt * 1000000) // ss AS BIGINT) AS eff_sources_micro,
      |  CAST((mx * 10000) // nt AS BIGINT) AS top_share_bp
      |FROM t""".stripMargin

  // ---- E130: empirical-Bayes rate shrinkage ---------------------------

  /** Empirical-Bayes shrinkage of per-source flag rates (the
    * beta-binomial/James–Stein correction — Efron & Morris 1975;
    * Robbins 1956: a 2-document source at 100% flagged must NOT
    * outrank a 10k-document source at 60% in a curation triage list;
    * shrink each source's rate toward the corpus rate with strength
    * κ from the method-of-moments prior fit, κ = m(1−m)/v − 1).
    * The flag here is the E85 lexicon signal (doc contains a
    * weight-≥2 blocklist term); shrunk rate = (k + κm)/(n + κ).
    *
    * Determinism: n/k are exact integers; m, v, κ and the shrunk
    * rates are ONE pinned float chain over those integers (identical
    * operand order both engines), floored to basis points.
    *
    * Scale shape: one codegen'd flag projection + ONE source-keyed
    * aggregate; the prior fit folds over the |sources|-row frame via
    * one-row broadcasts (allowlisted).
    */
  def ebShrinkage(spark: SparkSession, dir: String): DataFrame = {
    val heavy = lexicon.filter(_._2 >= 2).map(_._1)
    val perSource = Tables.documents(spark, dir)
      .select(col("source"),
        heavy.map(t => array_contains(split(col("text"), " "), t))
          .reduce(_ || _).cast("long").as("flagged"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("flagged")).as("k"))
    val m = perSource.agg(
      (sum(col("k")).cast("double") / sum(col("n")).cast("double")).as("m"))
    val v = perSource.crossJoin(broadcast(m))
      .select((col("n").cast("double") *
        (col("k").cast("double") / col("n").cast("double") - col("m")) *
        (col("k").cast("double") / col("n").cast("double") - col("m")))
        .as("w2"), col("n"))
      .agg((sum(col("w2")) / sum(col("n")).cast("double")).as("v"))
    perSource.crossJoin(broadcast(m)).crossJoin(broadcast(v))
      .withColumn("kappa",
        when(col("v") > 0.0,
          greatest(col("m") * (lit(1.0) - col("m")) / col("v") - 1.0, lit(0.0)))
          .otherwise(lit(1e6)))
      .select(col("source"), col("n").as("n_docs"), col("k").as("n_flagged"),
        expr("k * 10000 div n").as("raw_bp"),
        floor((col("k").cast("double") + col("kappa") * col("m")) /
          (col("n").cast("double") + col("kappa")) * 10000).cast("long")
          .as("shrunk_bp"),
        floor(col("kappa") * 1000).cast("long").as("kappa_milli"))
      .orderBy(col("source"))
  }

  val ebShrinkageSql: String =
    """WITH ps AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN list_contains(string_split(text, ' '), 'slow')
      |                    OR list_contains(string_split(text, ' '), 'big')
      |             THEN 1 ELSE 0 END) AS BIGINT) AS k
      |  FROM documents GROUP BY 1),
      |m AS (SELECT CAST(sum(k) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS m
      |      FROM ps),
      |v AS (
      |  SELECT sum(CAST(n AS DOUBLE)
      |      * (CAST(k AS DOUBLE) / CAST(n AS DOUBLE) - m)
      |      * (CAST(k AS DOUBLE) / CAST(n AS DOUBLE) - m))
      |    / CAST(sum(n) AS DOUBLE) AS v
      |  FROM ps CROSS JOIN m),
      |kap AS (
      |  SELECT CASE WHEN v > 0.0
      |              THEN greatest(m * (1.0 - m) / v - 1.0, 0.0)
      |              ELSE 1000000.0 END AS kappa
      |  FROM m CROSS JOIN v)
      |SELECT source, n AS n_docs, k AS n_flagged,
      |  CAST(k * 10000 // n AS BIGINT) AS raw_bp,
      |  CAST(floor((CAST(k AS DOUBLE) + kappa * m)
      |    / (CAST(n AS DOUBLE) + kappa) * 10000) AS BIGINT) AS shrunk_bp,
      |  CAST(floor(kappa * 1000) AS BIGINT) AS kappa_milli
      |FROM ps CROSS JOIN m CROSS JOIN kap
      |ORDER BY source""".stripMargin

  // ---- E132: winsorized robust per-source stats ------------------------

  /** Winsorized length statistics per source (Tukey 1962; Dixon 1960:
    * clamp the tails at global p05/p95 before averaging, so a
    * handful of megadocs or truncation stubs cannot move a source's
    * reported typical length — the robust column a data card wants
    * next to the raw mean, and the cheap guardrail before any
    * threshold keyed on "average doc length"). Reports the winsorized
    * mean, the raw mean, and how many docs each tail clamped.
    *
    * Determinism: the clamp bounds are FLOORS of the shared exact-
    * interpolation percentiles, so clamped lengths stay exact
    * integers and every mean is an integer-division milli-unit —
    * nothing float-accumulates.
    *
    * Scale shape: one bounded percentile aggregate broadcast
    * (allowlisted) + ONE source-keyed aggregate over the clamped
    * projection (map-side combined).
    */
  def winsorizedStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars"))
    // round to 6 dp BEFORE floor-ing on both engines: Spark percentile
    // and DuckDB quantile_cont lerp with different operand orders, and
    // a last-ulp difference at an integer-valued cut flips floor() by 1
    // (the histogramVarWidth cross-engine defect class)
    val bounds = docs.agg(
      floor(round(expr("percentile(n_chars, 0.05)"), 6)).cast("long").as("lo"),
      floor(round(expr("percentile(n_chars, 0.95)"), 6)).cast("long").as("hi"))
    docs.crossJoin(broadcast(bounds))
      .select(col("source"),
        least(greatest(col("n_chars"), col("lo")), col("hi")).as("w"),
        col("n_chars"),
        (col("n_chars") < col("lo")).cast("long").as("clo"),
        (col("n_chars") > col("hi")).cast("long").as("chi"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w")).as("sw"), sum(col("n_chars")).as("sr"),
        sum(col("clo")).as("n_clamped_lo"), sum(col("chi")).as("n_clamped_hi"))
      .select(col("source"), col("n_docs"),
        expr("sw * 1000 div n_docs").as("winsor_mean_milli"),
        expr("sr * 1000 div n_docs").as("raw_mean_milli"),
        col("n_clamped_lo"), col("n_clamped_hi"))
      .orderBy(col("source"))
  }

  val winsorizedStatsSql: String =
    """WITH b AS (
      |  SELECT CAST(floor(round(quantile_cont(n_chars, 0.05), 6)) AS BIGINT) AS lo,
      |         CAST(floor(round(quantile_cont(n_chars, 0.95), 6)) AS BIGINT) AS hi
      |  FROM documents),
      |c AS (
      |  SELECT source,
      |    least(greatest(n_chars, lo), hi) AS w, n_chars,
      |    CASE WHEN n_chars < lo THEN 1 ELSE 0 END AS clo,
      |    CASE WHEN n_chars > hi THEN 1 ELSE 0 END AS chi
      |  FROM documents CROSS JOIN b)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(w) * 1000 // count(*) AS BIGINT) AS winsor_mean_milli,
      |  CAST(sum(n_chars) * 1000 // count(*) AS BIGINT) AS raw_mean_milli,
      |  CAST(sum(clo) AS BIGINT) AS n_clamped_lo,
      |  CAST(sum(chi) AS BIGINT) AS n_clamped_hi
      |FROM c GROUP BY source
      |ORDER BY source""".stripMargin

  // ---- E131: Gini / Lorenz token-mass concentration --------------------

  /** Token-mass inequality audit (Gini 1912 via the rank formula;
    * Lorenz 1905 curve at document deciles): how concentrated the
    * corpus's token mass is in its longest documents — the per-DOC
    * complement of E113's per-SOURCE HHI, and the number that says
    * whether a doc-uniform sample under-represents the corpus by
    * tokens (high Gini ⇒ token-weighted sampling, E124, is needed).
    * G = 2·Σ rank·len / (n·T) − (n+1)/n over lengths ranked
    * ascending; the Lorenz points report the token share held by the
    * shortest d/10 of documents.
    *
    * Determinism: rank/len/cumulative sums are exact integers on a
    * (len, doc_id) total order (ties broken by id — identical both
    * engines); G and the shares are single pinned divisions of exact
    * longs, micro-/bp-floored.
    *
    * Scale shape: one global rank (oracle form — the E98 trade; the
    * E13d bucket-offset cumsum over length bands is the 100 TB path)
    * + ONE running-sum window + a 10-row decile-cut equi join and a
    * one-row totals broadcast (allowlisted).
    */
  def giniLorenz(spark: SparkSession, dir: String): DataFrame = {
    val ranked = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("len"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("len"), col("doc_id"))).cast("long"))
    val totals = ranked.agg(count(lit(1)).as("n"), sum(col("len")).as("t"),
      sum(col("rank") * col("len")).as("a"))
    val cuts = totals.select(
      explode(sequence(lit(1), lit(10))).as("decile"), col("n"))
      .select(col("decile"),
        floor(col("n") * col("decile") / 10).cast("long").as("rank_cut"))
    val cum = ranked
      .withColumn("cum_toks", sum(col("len")).over(
        Window.orderBy(col("len"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
    cum.join(broadcast(cuts), col("rank") === col("rank_cut"))
      .crossJoin(broadcast(totals))
      .select(col("decile"), col("rank_cut").as("docs_cut"), col("cum_toks"),
        expr("cum_toks * 10000 div t").as("share_bp"),
        floor(((lit(2L) * col("a")).cast("double") /
          (col("n") * col("t")).cast("double") -
          (col("n") + 1).cast("double") / col("n").cast("double")) * 1e6)
          .cast("long").as("gini_micro"))
      .orderBy(col("decile"))
  }

  val giniLorenzSql: String =
    """WITH ranked AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
      |    CAST(row_number() OVER (ORDER BY len(string_split(text, ' ')),
      |      doc_id) AS BIGINT) AS rank
      |  FROM documents),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |               CAST(sum(len) AS BIGINT) AS t,
      |               CAST(sum(rank * len) AS BIGINT) AS a
      |        FROM ranked),
      |cuts AS (
      |  SELECT decile, CAST(floor(n * decile / 10) AS BIGINT) AS rank_cut
      |  FROM (SELECT unnest(range(1, 11)) AS decile, n FROM tot)),
      |cum AS (
      |  SELECT rank, CAST(sum(len) OVER (ORDER BY len, doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_toks
      |  FROM ranked)
      |SELECT decile, rank_cut AS docs_cut, cum_toks,
      |  CAST(cum_toks * 10000 // t AS BIGINT) AS share_bp,
      |  CAST(floor((CAST(2 * a AS DOUBLE) / CAST(n * t AS DOUBLE)
      |    - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6) AS BIGINT)
      |    AS gini_micro
      |FROM cum JOIN cuts ON rank = rank_cut
      |CROSS JOIN tot
      |ORDER BY decile""".stripMargin

  // ---- E126: Good–Turing missing-mass / coverage estimate -------------

  /** Simple Good–Turing frequency-of-frequencies audit (Good 1953;
    * Gale & Sampson 1995): the count-of-counts table N_r, the GT
    * re-estimated counts r* = (r+1)·N_{r+1}/N_r, the missing mass
    * P₀ = N₁/N (the probability that the NEXT token drawn is a type
    * this corpus has never seen — the principled coverage number
    * behind "is this corpus big enough", complementing E87/E114's
    * growth-curve fits), and the Chao1 richness estimate
    * V + N₁²/(2N₂) of the true vocabulary size.
    *
    * Types are word TRIGRAMS (the E87 device: the synthetic unigram
    * vocabulary is closed and saturates, so its N₁ is empty; the
    * trigram space has the real long tail GT exists for). Chao1 uses
    * the bias-corrected form N₁(N₁−1)/(2(N₂+1)), defined even at
    * N₂ = 0.
    *
    * Determinism: N_r, N, V are exact integers; r*, P₀ and Chao1 are
    * single divisions of exact-integer products, micro-floored.
    *
    * Scale shape: ONE trigram-vocab-bounded count aggregate, ONE
    * ≤10-row count-of-counts aggregate, a self-join on r+1 over
    * those rows, and one-row totals broadcasts (allowlisted).
    */
  def goodTuring(spark: SparkSession, dir: String, maxR: Int = 10): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(explode(expr(
        "transform(sequence(1, size(ws) - 2), i -> concat_ws(' '," +
          " element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2)))"))
        .as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("c"))
    val nr = counts.groupBy(col("c").as("r")).agg(count(lit(1)).as("n_r"))
    val totals = counts.agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
    val n12 = nr.agg(
      coalesce(sum(when(col("r") === 1L, col("n_r"))), lit(0L)).as("n1"),
      coalesce(sum(when(col("r") === 2L, col("n_r"))), lit(0L)).as("n2"))
    nr.filter(col("r") <= maxR)
      .join(broadcast(nr.select((col("r") - 1).as("r"), col("n_r").as("n_r1"))),
        Seq("r"), "left")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(n12))
      .select(col("r"), col("n_r"),
        floor((col("r") + 1).cast("double") *
          coalesce(col("n_r1"), lit(0L)).cast("double")
          / col("n_r").cast("double") * 1e6).cast("long").as("r_star_micro"),
        floor(col("n1").cast("double") / col("n").cast("double") * 1e6)
          .cast("long").as("p0_micro"),
        col("v"),
        (col("v") + floor((col("n1") * (col("n1") - 1)).cast("double")
          / (lit(2L) * (col("n2") + 1)).cast("double")).cast("long"))
          .as("chao1"))
      .orderBy(col("r"))
  }

  val goodTuringSql: String =
    """WITH counts AS (
      |  SELECT gram, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT unnest(list_transform(range(1, len(ws) - 1),
      |          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gram
      |        FROM (SELECT string_split(text, ' ') AS ws FROM documents)
      |        WHERE len(ws) >= 3)
      |  GROUP BY 1),
      |nr AS (SELECT c AS r, CAST(count(*) AS BIGINT) AS n_r
      |       FROM counts GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v
      |  FROM counts),
      |n12 AS (
      |  SELECT CAST(coalesce(sum(CASE WHEN r = 1 THEN n_r END), 0) AS BIGINT)
      |           AS n1,
      |         CAST(coalesce(sum(CASE WHEN r = 2 THEN n_r END), 0) AS BIGINT)
      |           AS n2
      |  FROM nr)
      |SELECT a.r, a.n_r,
      |  CAST(floor(CAST(a.r + 1 AS DOUBLE) * CAST(coalesce(b.n_r, 0) AS DOUBLE)
      |    / CAST(a.n_r AS DOUBLE) * 1e6) AS BIGINT) AS r_star_micro,
      |  CAST(floor(CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE) * 1e6) AS BIGINT)
      |    AS p0_micro,
      |  v,
      |  v + CAST(floor(CAST(n1 * (n1 - 1) AS DOUBLE)
      |    / CAST(2 * (n2 + 1) AS DOUBLE)) AS BIGINT) AS chao1
      |FROM nr a LEFT JOIN nr b ON b.r = a.r + 1
      |CROSS JOIN tot CROSS JOIN n12
      |WHERE a.r <= 10
      |ORDER BY a.r""".stripMargin

  // ---- E127: term burstiness (Fano factor) -----------------------------

  /** Church–Gale burstiness audit (Church & Gale 1995: content words
    * are BURSTY — their per-document counts are overdispersed relative
    * to Poisson, while function words are uniform; the variance-to-
    * mean Fano factor separates them). For the `k` highest-document-
    * frequency terms this reports F = σ²/μ over per-document counts
    * (zeros included): F ≈ 1 means Poisson-uniform, F ≫ 1 means the
    * term clumps into few documents — template/boilerplate content a
    * curation pass inspects.
    *
    * Determinism: F = (S₂·n − S₁²)/(n·S₁) over exact integer sums
    * (zero docs contribute nothing to S₁/S₂ and only the factor n, so
    * no corpus × vocab densification), micro-floored from identical
    * doubles.
    *
    * Scale shape (r12 rewrite): the (token, doc) counts are computed
    * INSIDE each document row — sort the doc's tokens, find run
    * starts, zip starts with their successors into (token, run
    * length) pairs — so the only exchange left is the vocab-bounded
    * token aggregate (map-side combined). The previous form shuffled
    * the distinct (token, doc) pairs (data-sized — the reason E127
    * grew 3.5× on 10× data in the r11 scale study); this one ships
    * per-partition token partials only. O(L log L) in-row sort per
    * doc, no window, no UDF. Then the one-row doc-count broadcast
    * (allowlisted) and TakeOrdered top-k as before.
    */
  def burstiness(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nDocsRow = docs.agg(count(lit(1)).as("n_docs"))
    val td = Tables.atComputeParallelism(docs)
      .select(col("doc_id"), array_sort(split(col("text"), " ")).as("ws"))
      .select(col("doc_id"), col("ws"),
        expr("filter(sequence(1, size(ws)), " +
          "i -> i = 1 OR element_at(ws, i) != element_at(ws, i - 1))").as("starts"))
      .select(col("doc_id"), explode(expr(
        "zip_with(starts, " +
          "concat(slice(starts, 2, size(starts)), array(size(ws) + 1)), " +
          "(a, b) -> struct(element_at(ws, a) AS token, " +
          "CAST(b - a AS BIGINT) AS x))")).as("tx"))
      .select(col("doc_id"), col("tx.token").as("token"), col("tx.x").as("x"))
    td.groupBy(col("token"))
      .agg(count(lit(1)).as("df"), sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"))
      .crossJoin(broadcast(nDocsRow))
      .select(col("token"), col("df"), col("s1"),
        floor((col("s2") * col("n_docs") - col("s1") * col("s1")).cast("double")
          / (col("n_docs") * col("s1")).cast("double") * 1e6).cast("long")
          .as("fano_micro"))
      .orderBy(col("df").desc, col("token"))
      .limit(k)
  }

  val burstinessSql: String =
    """WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      |td AS (
      |  SELECT token, doc_id, CAST(count(*) AS BIGINT) AS x
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |        FROM documents)
      |  GROUP BY 1, 2),
      |t AS (
      |  SELECT token, CAST(count(*) AS BIGINT) AS df,
      |         CAST(sum(x) AS BIGINT) AS s1,
      |         CAST(sum(x * x) AS BIGINT) AS s2
      |  FROM td GROUP BY 1)
      |SELECT token, df, s1,
      |  CAST(floor(CAST(s2 * n_docs - s1 * s1 AS DOUBLE)
      |    / CAST(n_docs * s1 AS DOUBLE) * 1e6) AS BIGINT) AS fano_micro
      |FROM t CROSS JOIN nd
      |ORDER BY df DESC, token
      |LIMIT 50""".stripMargin

  // ---- E114: Zipf rank-frequency fit ---------------------------------

  /** Zipf's-law audit: the log-log OLS slope of unigram frequency
    * against frequency rank over the head of the vocabulary (Zipf
    * 1949; Piantadosi 2014 reviews why natural corpora sit near −1).
    * A corpus whose slope drifts far from −1 signals template/boiler-
    * plate contamination (too flat: generated spam; too steep: tiny
    * effective vocabulary) — a one-number data-card check beside
    * Heaps' β (E87).
    *
    * Determinism mirrors E87: ranks and frequencies are exact
    * integers identical cross-engine (count desc, token asc total
    * order), the fit runs on micro-nat-floored logs with exact long
    * sums, and only the final slope division is floating point.
    *
    * Scale shape: ONE vocab-bounded hash aggregate (map-side
    * combined), a TakeOrdered top-R head (bounded heap per partition +
    * driver merge — never a vocab-wide sort), a window over R=64 rows,
    * and a one-row fit broadcast (plan-gate allowlisted, the
    * heaps_law class).
    */
  def zipfLaw(spark: SparkSession, dir: String, topR: Int = 64): DataFrame = {
    val head = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(topR)
    val ranked = head.withColumn("rank",
      row_number().over(Window.orderBy(col("freq").desc, col("token"))).cast("long"))
    val fit = ranked
      .select(
        floor(log(col("rank").cast("double")) * 1e6).cast("long").as("xu"),
        floor(log(col("freq").cast("double")) * 1e6).cast("long").as("yu"))
      .agg(count(lit(1)).as("k"), sum(col("xu")).as("sx"), sum(col("yu")).as("sy"),
        sum(col("xu") * col("yu")).as("sxy"), sum(col("xu") * col("xu")).as("sxx"))
      .select(
        ((col("k").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (col("k").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double"))).as("slope"))
    ranked.crossJoin(broadcast(fit))
      .select(col("rank"), col("token"), col("freq"),
        round(col("slope"), 6).as("zipf_slope"))
      .orderBy(col("rank"))
  }

  val zipfLawSql: String =
    """WITH head AS (
      |  SELECT token, CAST(count(*) AS BIGINT) AS freq
      |  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |  GROUP BY 1 ORDER BY freq DESC, token LIMIT 64),
      |ranked AS (
      |  SELECT *, row_number() OVER (ORDER BY freq DESC, token) AS rank FROM head),
      |fit AS (
      |  SELECT (CAST(count(*) AS DOUBLE) * CAST(sum(xu * yu) AS DOUBLE) -
      |          CAST(sum(xu) AS DOUBLE) * CAST(sum(yu) AS DOUBLE)) /
      |         (CAST(count(*) AS DOUBLE) * CAST(sum(xu * xu) AS DOUBLE) -
      |          CAST(sum(xu) AS DOUBLE) * CAST(sum(xu) AS DOUBLE)) AS slope
      |  FROM (SELECT
      |          CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000) AS BIGINT) AS xu,
      |          CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000000) AS BIGINT) AS yu
      |        FROM ranked))
      |SELECT CAST(rank AS BIGINT) AS rank, token, freq,
      |  round(slope, 6) AS zipf_slope
      |FROM ranked CROSS JOIN fit
      |ORDER BY rank""".stripMargin

  // ---- E115: per-source distribution divergence (JSD) ----------------

  /** Per-source Jensen–Shannon divergence against the corpus unigram
    * distribution (Lin 1991) — the domain-drift number a mixture
    * designer reads before reweighting (E66/E108 consume weights; this
    * AUDITS how far each source's token distribution actually sits
    * from the blend). JSD is symmetric and bounded by ln 2, unlike the
    * PSI (E83) which explodes on disjoint support.
    *
    * Determinism: every per-token term is floored to HALF-micro-nats
    * (the ½ factors of JSD folded into the floor constant) and summed
    * as exact longs; p and q are divisions of exact integers, so all
    * doubles entering ln are bit-identical cross-engine. Tokens the
    * source does NOT contain contribute analytically — their entire
    * KL(corpus‖M) mass is ln 2 · (1 − Σ_present q) — so the join stays
    * on the source's own (source, token) support and no source × vocab
    * densification ever materializes.
    *
    * Scale shape: one (source, token) hash aggregate (map-side
    * combined), an equi-join back to the vocab-bounded corpus margin,
    * a |sources|-row broadcast for totals, and a one-row grand-total
    * broadcast (allowlisted).
    */
  def sourceJsd(spark: SparkSession, dir: String): DataFrame = {
    val tc = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("cs"))
    val corpus = tc.groupBy(col("token")).agg(sum(col("cs")).as("c"))
    val totals = tc.groupBy(col("source"))
      .agg(sum(col("cs")).as("ns"), count(lit(1)).as("n_types"))
    val grand = corpus.agg(sum(col("c")).as("n"))
    val terms = tc
      .join(corpus.hint("shuffle_hash"), "token")
      .join(broadcast(totals.select(col("source"), col("ns"))), "source")
      .crossJoin(broadcast(grand))
      .withColumn("p", col("cs").cast("double") / col("ns").cast("double"))
      .withColumn("q", col("c").cast("double") / col("n").cast("double"))
      .select(col("source"), col("c"),
        floor(col("p") * log(lit(2.0) * col("p") / (col("p") + col("q"))) * 5e5)
          .cast("long").as("tp"),
        floor(col("q") * log(lit(2.0) * col("q") / (col("p") + col("q"))) * 5e5)
          .cast("long").as("tq"))
    terms.groupBy(col("source"))
      .agg(sum(col("tp") + col("tq")).as("pm"), sum(col("c")).as("sc"))
      .join(broadcast(totals), "source")
      .crossJoin(broadcast(grand))
      .select(col("source"), col("ns").as("n_toks"), col("n_types"),
        (col("pm") + floor(log(lit(2.0)) *
          ((col("n") - col("sc")).cast("double") / col("n").cast("double")) * 5e5)
          .cast("long")).as("jsd_micro"))
      .orderBy(col("source"))
  }

  val sourceJsdSql: String =
    """WITH tc AS (
      |  SELECT source, token, CAST(count(*) AS BIGINT) AS cs
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token
      |        FROM documents)
      |  GROUP BY 1, 2),
      |corpus AS (SELECT token, CAST(sum(cs) AS BIGINT) AS c FROM tc GROUP BY 1),
      |totals AS (SELECT source, CAST(sum(cs) AS BIGINT) AS ns,
      |                  CAST(count(*) AS BIGINT) AS n_types
      |           FROM tc GROUP BY 1),
      |grand AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM corpus),
      |terms AS (
      |  SELECT source, c,
      |    CAST(floor(p * ln(2.0 * p / (p + q)) * 500000) AS BIGINT) AS tp,
      |    CAST(floor(q * ln(2.0 * q / (p + q)) * 500000) AS BIGINT) AS tq
      |  FROM (SELECT t.source, c,
      |          CAST(cs AS DOUBLE) / CAST(ns AS DOUBLE) AS p,
      |          CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS q
      |        FROM tc t JOIN corpus USING (token) JOIN totals USING (source)
      |        CROSS JOIN grand)),
      |ps AS (SELECT source, CAST(sum(tp + tq) AS BIGINT) AS pm,
      |              CAST(sum(c) AS BIGINT) AS sc
      |       FROM terms GROUP BY 1)
      |SELECT source, ns AS n_toks, n_types,
      |  pm + CAST(floor(ln(2.0) * (CAST(n - sc AS DOUBLE) / CAST(n AS DOUBLE))
      |    * 500000) AS BIGINT) AS jsd_micro
      |FROM ps JOIN totals USING (source) CROSS JOIN grand
      |ORDER BY source""".stripMargin
}
