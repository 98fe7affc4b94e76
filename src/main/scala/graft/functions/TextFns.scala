package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis battery for training-data pipelines (SURVEY §2 E8–E11).
  * All pure builtin column expressions — codegen'd, no UDFs.
  */
object TextFns {

  /** E10 — whitespace token count. */
  def wsTokenCount(text: Column): Column = size(split(trim(text), "\\s+"))

  /** E10 — BPE-ish token count: letter runs, digit runs, and single
    * punctuation marks each count as one token (a cheap proxy for a BPE
    * pre-tokenizer's word-split stage).
    */
  val bpeTokenPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(call_function("regexp_extract_all", text, lit(bpeTokenPattern), lit(0)))

  /** Distinct-word ratio — low values signal boilerplate/repetition. */
  def distinctRatio(text: Column): Column = {
    val toks = split(text, " ")
    size(array_distinct(toks)).cast("double") / size(toks)
  }

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** C64 — the `_analyze` chain (standard tokenizer → lowercase →
    * stop filter → `minimal_english` stemmer), as pure array/column
    * expressions over a text column. The stemmer is Lucene's
    * EnglishMinimalStemmer rule verbatim: strip one trailing plural
    * 's' when length ≥ 3 and the 's' is not part of '-ss'/'-us'
    * (glass, bus keep theirs). Every step is a codegen'd higher-order
    * function — the analyzer costs a projection, never a shuffle.
    */
  val analyzerStopwords: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

  def stemMinimalEnglish(t: Column): Column =
    when(length(t) >= 3 && t.endsWith("s") &&
      !t.endsWith("ss") && !t.endsWith("us"),
      t.substr(lit(1), length(t) - 1)).otherwise(t)

  def analyzeTokens(text: Column): Column =
    transform(
      filter(split(lower(text), "\\s+"),
        t => t =!= "" && !t.isin(analyzerStopwords.map(x => x: Any): _*)),
      stemMinimalEnglish(_))

  /** Stopword ratio — a natural-language-likeness signal. */
  def stopwordRatio(text: Column): Column = {
    val toks = split(text, " ")
    size(filter(toks, t => t.isin(stopwords.map(x => x: Any): _*))).cast("double") / size(toks)
  }

  /** E9 — composite quality score:
    * log-length × vocabulary diversity × (1 - stopword excess).
    * Deterministic arithmetic reproduced verbatim in the DuckDB oracle.
    */
  def qualityScore(text: Column): Column =
    log(size(split(text, " ")).cast("double") + 1) *
      distinctRatio(text) * (lit(1.0) - stopwordRatio(text))

  // ---- E8: language ID (stopword-profile heuristic) ------------------

  /** Tiny per-language function-word profiles (public-knowledge lists). */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "ich", "zu", "mit"),
    "es" -> Seq("el", "la", "los", "de", "que", "y", "es", "en", "un", "por"),
    "fr" -> Seq("le", "la", "les", "et", "est", "je", "ne", "que", "des", "une"))

  /** Distinctive character trigrams per language — the n-gram half of
    * the heuristic; catches text whose function words are absent
    * (compound nouns, telegraphic style).
    */
  val trigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("ing", "tio", "ght", "wh"),
    "de" -> Seq("sch", "ung", "ein", "ich"),
    "es" -> Seq("cio", "ado", "nte", "que"),
    "fr" -> Seq("eau", "oux", "ais", "que"))

  /** E8 — argmax over combined function-word + char-n-gram profile
    * scores; "und" (unknown) when nothing matches. One native kernel
    * pass (graft.plans.LangIdExpr) — the Column formulation it replaces
    * (4× interpreted `filter(toks, isin)` HOFs + a 16-branch trigram
    * contains chain) re-split the text per language and cost 5× more;
    * the kernel reproduces its arithmetic bit-for-bit, so the DuckDB
    * oracle is unchanged.
    */
  def langId(text: Column): Column =
    graft.plans.LangIdExpr.langId(text, langProfiles, trigramProfiles)

  // ---- E11: document fingerprinting (winnowing) ----------------------

  /** E11 — winnowing (Schleimer et al., SIGMOD 2003, public algorithm):
    * hash word k-grams, take the min hash of each sliding window of
    * `window` consecutive k-gram hashes, dedupe. Robust position-free
    * fingerprints: near-identical docs share most fingerprints.
    */
  def fingerprints(text: Column, k: Int = 3, window: Int = 4): Column =
    fingerprintsFromHashes(HashFns.shingleHashes(text, k), window)

  /** Window-min fold over a PRE-MATERIALIZED k-gram hash column.
    *
    * Callers on a hot path must bind the shingle hashes to their own
    * projected column first and pass the attribute here: a lambda body
    * holds its free subtrees by EXPRESSION, not by reference, so with
    * the fused form the `slice(hs, i, w)` inside `transform` re-ran the
    * whole shingle-hash pass once per window position — O(positions ×
    * corpus-hash) per document (r14 Probe: the q_dedup_lcs fingerprint
    * stage at 2.3 s where the linear form takes ~0.1 s). With `hs` an
    * attribute the lambda slices a materialized array instead.
    */
  def fingerprintsFromHashes(hs: Column, window: Int = 4): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(hs) - (window - 1), lit(1))),
        i => array_min(slice(hs, i, lit(window)))))
}
