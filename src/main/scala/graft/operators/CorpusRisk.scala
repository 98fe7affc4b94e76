package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus-risk audit tier: memorization-exposure scoring and
  * excess-loss domain reweighting — the two numbers a pretraining-data
  * owner reads before fixing the mixture. Public anchors: Lee et al.
  * 2022 ("Deduplicating Training Data Makes Language Models Better" —
  * duplicated-passage memorization), Xie et al. 2023 (DoReMi domain
  * reweighting by excess loss).
  */
object CorpusRisk {

  /** E108 — duplicated-passage exposure (Lee et al. 2022: passages
    * duplicated across documents are the ones models memorize and
    * regurgitate; the per-document risk number is the fraction of its
    * 8-gram passages that also occur in ANOTHER document). Distinct
    * per-doc 8-grams → cross-corpus spread count → per-doc exposed
    * fraction in exact basis points. Complements E18 (within-doc
    * repetition) and E20d (substring REMOVAL): this is the audit that
    * says which surviving docs still carry shared passages.
    *
    * Scale shape: grams travel as 60-bit md5-prefix keys (16-byte
    * strings never shuffle); two thin-key exchanges (gram, then doc)
    * and a broadcast-free aggregate each side — linear in corpus
    * bytes, no pair enumeration anywhere.
    */
  def dupExposure(spark: SparkSession, dir: String, n: Int = 8): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.HashFns.shingles(col("text"), n)).as("gram"))
      .select(col("doc_id"),
        conv(substring(md5(col("gram")), 1, 15), 16, 10).cast("long").as("gk"))
      .distinct()
    val spread = grams.groupBy(col("gk"))
      .agg(count(lit(1)).as("n_docs_gram"))
    grams.join(spread.hint("shuffle_hash"), "gk")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum((col("n_docs_gram") >= 2).cast("long")).as("n_shared"))
      .withColumn("exposure_bp", expr("n_shared * 10000 div n_grams"))
      .select(col("doc_id"), col("n_grams"), col("n_shared"), col("exposure_bp"))
      .orderBy(col("doc_id"))
  }

  val dupExposureSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (
      |  SELECT DISTINCT doc_id,
      |    ('0x' || substr(md5(array_to_string(w[i:i+7], ' ')), 1, 15))::BIGINT AS gk
      |  FROM t, unnest(generate_series(1, greatest(len(w) - 7, 1))) AS u(i)),
      |s AS (SELECT gk, count(*) AS n_docs_gram FROM g GROUP BY 1)
      |SELECT doc_id,
      |  count(*) AS n_grams,
      |  CAST(sum(CASE WHEN n_docs_gram >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
      |  CAST(sum(CASE WHEN n_docs_gram >= 2 THEN 1 ELSE 0 END) * 10000
      |    // count(*) AS BIGINT) AS exposure_bp
      |FROM g JOIN s USING (gk)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** E111 — Kneser-Ney bigram LM scoring (Kneser & Ney 1995; Chen &
    * Goodman 1998's interpolated form with fixed discount d = 0.75 —
    * the KenLM-style fluency scorer CCNet (Wenzek et al. 2020) filters
    * web text with; the unigram E10e/logprob family's context-aware
    * upgrade). The model trains on the corpus itself and every doc is
    * scored by its mean bigram NLL:
    *   P(w2|w1) = (c(w1w2) − d)/c(w1) + (d·N1+(w1·)/c(w1)) · N1+(·w2)/B
    * with B the distinct-bigram count. All counts are exact integers;
    * the float expression tree is pinned operand-for-operand in the
    * oracle, per-bigram NLL floors to integer micro-nats before the
    * doc sum (the unigram-LM playbook), and the final per-token figure
    * is a ratio of exact integers. Docs shorter than 2 tokens score
    * NULL (no bigram evidence).
    *
    * Scale shape: bigram generation is one codegen'd zip_with pass (no
    * self-join); the count/statistic joins are all BIGRAM-TABLE-sized
    * (vocab²-bounded, never corpus-sized); doc scoring joins on 60-bit
    * md5-prefix bigram keys so token text never re-shuffles.
    */
  def knBigramNll(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val bg = docs
      .select(col("doc_id"), explode(expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1)," +
          " (a, b) -> struct(a AS w1, b AS w2))")).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bc = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_b"))
    val c1 = bc.groupBy(col("w1"))
      .agg(sum(col("c_b")).as("c_1"), count(lit(1)).as("n1f"))
    val cw2 = bc.groupBy(col("w2")).agg(count(lit(1)).as("n_prec"))
    val nbb = bc.count()
    val bkey = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      conv(substring(md5(concat(a, lit("\u0001"), b)), 1, 15), 16, 10).cast("long")
    val prob = bc
      .join(c1.hint("shuffle_hash"), "w1")
      .join(cw2.hint("shuffle_hash"), "w2")
      .withColumn("lp_micro",
        floor(log(
          (col("c_b").cast("double") - lit(0.75)) / col("c_1") +
            (lit(0.75) * col("n1f")) / col("c_1") *
              (col("n_prec").cast("double") / lit(nbb))) * 1e6).cast("long"))
      .select(bkey(col("w1"), col("w2")).as("bk"), col("lp_micro"))
    bg.select(col("doc_id"), bkey(col("w1"), col("w2")).as("bk"))
      .join(prob.hint("shuffle_hash"), "bk")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_micro")).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        (-col("s").cast("double") / 1e6 / col("n_bigrams")).as("nll_per_token"))
      // 1-token docs have no bigram rows: reattach with NULL score
      .join(docs.select(col("doc_id")), Seq("doc_id"), "right")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("nll_per_token"))
      .orderBy(col("doc_id"))
  }

  val knBigramNllSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |bg AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(len(w) - 1), i -> w[i+1])) AS w1,
      |    unnest(list_transform(range(len(w) - 1), i -> w[i+2])) AS w2
      |  FROM d),
      |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_b FROM bg GROUP BY 1, 2),
      |c1 AS (SELECT w1, CAST(sum(c_b) AS BIGINT) AS c_1,
      |              CAST(count(*) AS BIGINT) AS n1f FROM bc GROUP BY 1),
      |cw2 AS (SELECT w2, CAST(count(*) AS BIGINT) AS n_prec FROM bc GROUP BY 1),
      |nbb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM bc),
      |prob AS (
      |  SELECT
      |    ('0x' || substr(md5(bc.w1 || chr(1) || bc.w2), 1, 15))::BIGINT AS bk,
      |    CAST(floor(ln(
      |      (CAST(c_b AS DOUBLE) - 0.75) / c_1 +
      |      (0.75 * n1f) / c_1 * (CAST(n_prec AS DOUBLE) / (SELECT n FROM nbb))
      |    ) * 1e6) AS BIGINT) AS lp_micro
      |  FROM bc JOIN c1 USING (w1) JOIN cw2 USING (w2)),
      |s AS (
      |  SELECT doc_id, count(*) AS n_bigrams, CAST(sum(lp_micro) AS BIGINT) AS s
      |  FROM (SELECT doc_id,
      |          ('0x' || substr(md5(w1 || chr(1) || w2), 1, 15))::BIGINT AS bk
      |        FROM bg) g
      |  JOIN prob USING (bk)
      |  GROUP BY 1)
      |SELECT d.doc_id,
      |  CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
      |  -CAST(s.s AS DOUBLE) / 1e6 / s.n_bigrams AS nll_per_token
      |FROM d LEFT JOIN s ON d.doc_id = s.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** E109 — DoReMi-style excess-loss domain weights (Xie et al. 2023:
    * upweight the domains whose loss under the shared model most
    * exceeds their loss under a per-domain reference — the domains the
    * mixture is under-serving). One-shot static analogue with the E10e
    * unigram-LM pair as proxy/reference: proxy loss = corpus-global
    * add-1 unigram NLL, reference loss = the domain's OWN unigram NLL,
    * both summed in exact integer micro-nats (the unigram-LM
    * playbook); weight ∝ token-share × exp(η · excess-per-token),
    * normalized over an alphabetical fixed-order fold (the E13c
    * denominator device) and rounded to 6.
    *
    * Scale shape: both NLL sums are VOCABULARY-sized joins (per-domain
    * count × per-token logprob — token occurrences never re-shuffle);
    * the final fold runs driver-side on the source-cardinality handful
    * (the sqParams bounded-collect contract).
    */
  def doremiWeights(spark: SparkSession, dir: String,
                    eta: Double = 1.0): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
    val domCounts = toks.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("c_st"))
    val globCounts = domCounts.groupBy(col("token"))
      .agg(sum(col("c_st")).as("c_t"))
    val globTotals = globCounts
      .agg(sum(col("c_t")).as("n_total"), count(lit(1)).as("v"))
    val domTotals = domCounts.groupBy(col("source"))
      .agg(sum(col("c_st")).as("n_s"),
        count(lit(1)).as("v_s"))
    val globLp = globCounts.crossJoin(broadcast(globTotals))
      .select(col("token"),
        floor(log((col("c_t") + 1).cast("double") /
          (col("n_total") + col("v")).cast("double")) * 1e6).cast("long")
          .as("glp_micro"))
    val rows = domCounts
      .join(globLp.hint("shuffle_hash"), "token")
      .join(broadcast(domTotals), "source")
      .withColumn("dlp_micro",
        floor(log((col("c_st") + 1).cast("double") /
          (col("n_s") + col("v_s")).cast("double")) * 1e6).cast("long"))
      .groupBy(col("source"))
      .agg(first(col("n_s")).as("n_toks"),
        (-sum(col("c_st") * col("glp_micro"))).as("proxy_mnats"),
        (-sum(col("c_st") * col("dlp_micro"))).as("ref_mnats"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)

    val nAll = rows.map(_._2).sum
    val raw = rows.map { case (s, n, proxy, ref) =>
      val excess = math.max(0L, proxy - ref)
      val w = (n.toDouble / nAll) * math.exp(eta * (excess.toDouble / n / 1e6))
      (s, n, proxy, ref, proxy - ref, w)
    }
    val denom = raw.foldLeft(0.0)(_ + _._6)
    val out = raw.map { case (s, n, proxy, ref, excess, w) =>
      (s, n, proxy, ref, excess,
        BigDecimal(w / denom).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    spark.createDataFrame(out.toIndexedSeq)
      .toDF("source", "n_toks", "proxy_mnats", "ref_mnats", "excess_mnats", "weight")
      .orderBy(col("source"))
  }

  val doremiWeightsSql: String =
    """WITH toks AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
      |dc AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c_st
      |       FROM toks GROUP BY 1, 2),
      |gc AS (SELECT token, CAST(sum(c_st) AS BIGINT) AS c_t FROM dc GROUP BY 1),
      |gt AS (SELECT CAST(sum(c_t) AS BIGINT) AS n_total,
      |              CAST(count(*) AS BIGINT) AS v FROM gc),
      |dt AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s,
      |              CAST(count(*) AS BIGINT) AS v_s FROM dc GROUP BY 1),
      |glp AS (
      |  SELECT token,
      |    CAST(floor(ln(CAST(c_t + 1 AS DOUBLE) / (n_total + v)) * 1e6) AS BIGINT)
      |      AS glp_micro
      |  FROM gc, gt),
      |agg AS (
      |  SELECT dc.source,
      |    CAST(min(dt.n_s) AS BIGINT) AS n_toks,
      |    CAST(-sum(dc.c_st * glp.glp_micro) AS BIGINT) AS proxy_mnats,
      |    CAST(-sum(dc.c_st *
      |      CAST(floor(ln(CAST(dc.c_st + 1 AS DOUBLE) / (dt.n_s + dt.v_s)) * 1e6)
      |        AS BIGINT)) AS BIGINT) AS ref_mnats
      |  FROM dc JOIN glp USING (token) JOIN dt ON dc.source = dt.source
      |  GROUP BY 1),
      |w AS (
      |  SELECT source, n_toks, proxy_mnats, ref_mnats,
      |    proxy_mnats - ref_mnats AS excess_mnats,
      |    (CAST(n_toks AS DOUBLE) / (SELECT sum(n_toks) FROM agg))
      |      * exp(greatest(proxy_mnats - ref_mnats, 0) / CAST(n_toks AS DOUBLE) / 1e6)
      |      AS w_raw
      |  FROM agg),
      |d AS (SELECT list_reduce(
      |        list_prepend(0.0, list(w_raw ORDER BY source)),
      |        (a, b) -> a + b) AS denom FROM w)
      |SELECT source, n_toks, proxy_mnats, ref_mnats, excess_mnats,
      |  round(w_raw / denom, 6) AS weight
      |FROM w, d
      |ORDER BY source""".stripMargin
}
