package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** E10e — unigram-LM tokenizer TRAINING (Kudo 2018, "Subword
  * Regularization": the SentencePiece `unigram` model — the other
  * mainstream subword scheme beside BPE, and the one whose EM
  * training a data pipeline runs to fit a tokenizer to its corpus).
  * Completes the tokenizer family: E10b/E10d apply fixed BPE tables,
  * E10c trains BPE merges, this trains the unigram piece inventory.
  *
  * Public algorithm: seed a large candidate inventory from frequent
  * substrings, then EM — the E-step computes EXPECTED piece counts per
  * word with forward–backward over all segmentations, the M-step
  * re-normalizes piece probabilities, and pruning shrinks the
  * inventory toward the target size (Kudo prunes by likelihood loss;
  * this prunes lowest-probability multi-char pieces, the standard
  * simplification, documented honestly). Single-character pieces are
  * never pruned, so every string stays segmentable (Kudo §3.2's
  * character coverage guarantee).
  *
  * Spark-first shape (the E10c/BpeTrain contract): the corpus is
  * scanned ONCE into a frequency-weighted DISTINCT word vocabulary;
  * every EM round is a VOCABULARY-sized job — the bounded piece table
  * (≤ seedSize rows, plan-sized like the PQ codebooks and sqParams)
  * broadcasts in the task closure, each word runs an O(len·maxLen)
  * forward–backward DP, and expected counts come back through ONE
  * piece-keyed groupBy-sum. Fractional expectations are quantized to
  * integer micro-counts BEFORE the shuffle (the embed-pool rule), so
  * sums are exact under any partitioning and training is bit-stable.
  */
object UnigramLm {

  private val NegInf = Double.NegativeInfinity

  private def logAdd(a: Double, b: Double): Double =
    if (a == NegInf) b else if (b == NegInf) a
    else if (a > b) a + math.log1p(math.exp(b - a))
    else b + math.log1p(math.exp(a - b))

  /** Forward–backward expected piece counts over all segmentations of
    * one word, plus the word's log-likelihood. Deterministic: fixed
    * iteration order, plain double arithmetic inside one task.
    */
  private[graft] def expectedCounts(
      word: String, lp: Map[String, Double], maxLen: Int): (Seq[(String, Double)], Double) = {
    val n = word.length
    val alpha = Array.fill(n + 1)(NegInf); alpha(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      while (l <= math.min(maxLen, i)) {
        val piece = word.substring(i - l, i)
        lp.get(piece).foreach(p => alpha(i) = logAdd(alpha(i), alpha(i - l) + p))
        l += 1
      }
      i += 1
    }
    if (alpha(n) == NegInf) return (Seq.empty, NegInf)
    val beta = Array.fill(n + 1)(NegInf); beta(n) = 0.0
    i = n - 1
    while (i >= 0) {
      var l = 1
      while (l <= math.min(maxLen, n - i)) {
        val piece = word.substring(i, i + l)
        lp.get(piece).foreach(p => beta(i) = logAdd(beta(i), beta(i + l) + p))
        l += 1
      }
      i -= 1
    }
    val acc = scala.collection.mutable.Map.empty[String, Double]
    var j = 0
    while (j < n) {
      var l = 1
      while (l <= math.min(maxLen, n - j)) {
        val piece = word.substring(j, j + l)
        lp.get(piece).foreach { p =>
          val c = math.exp(alpha(j) + p + beta(j + l) - alpha(n))
          acc(piece) = acc.getOrElse(piece, 0.0) + c
        }
        l += 1
      }
      j += 1
    }
    (acc.toSeq, alpha(n))
  }

  /** Viterbi (max-probability) segmentation under the trained model. */
  private[graft] def viterbi(
      word: String, lp: Map[String, Double], maxLen: Int): Seq[String] = {
    val n = word.length
    val best = Array.fill(n + 1)(NegInf); best(0) = 0.0
    val back = Array.fill(n + 1)(0)
    var i = 1
    while (i <= n) {
      var l = 1
      while (l <= math.min(maxLen, i)) {
        lp.get(word.substring(i - l, i)).foreach { p =>
          if (best(i - l) + p > best(i)) { best(i) = best(i - l) + p; back(i) = l }
        }
        l += 1
      }
      i += 1
    }
    if (best(n) == NegInf) return Seq.empty
    val out = scala.collection.mutable.ListBuffer.empty[String]
    i = n
    while (i > 0) { out.prepend(word.substring(i - back(i), i)); i -= back(i) }
    out.toSeq
  }

  /** Train on the corpus; returns (final piece table, per-round corpus
    * log-likelihood in micro-nats). The LL sequence is the EM
    * convergence certificate the spec asserts non-decreasing.
    */
  def trainWithStats(spark: SparkSession, dir: String,
                     seedSize: Int = 256, vocabTarget: Int = 96,
                     emRounds: Int = 4, maxPieceLen: Int = 6): (DataFrame, Seq[Long]) = {
    import spark.implicits._
    val words = Tables.atComputeParallelism(
        Tables.documents(spark, dir).select(col("text")))
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .cache()

    // seed: frequency-weighted substrings of the word vocabulary. The
    // substring table is vocab-sized × O(len·maxLen) — ranked and CUT
    // DISTRIBUTED (TakeOrdered, bounded exchange); only the seedSize
    // winners and the alphabet-bounded single chars reach the driver.
    val subsDf = words.flatMap { case (w, f) =>
      for {
        start <- 0 until w.length
        len <- 1 to math.min(maxPieceLen, w.length - start)
      } yield (w.substring(start, start + len), f)
    }.toDF("piece", "w").groupBy("piece").agg(sum(col("w")).as("w"))
    val singles = subsDf.filter(length(col("piece")) === 1)
      .as[(String, Long)].collect().sortBy(_._1)
    val multi = subsDf.filter(length(col("piece")) > 1)
      .orderBy(col("w").desc, col("piece")).limit(seedSize)
      .as[(String, Long)].collect()
    var inv: Seq[(String, Double)] = {
      val total = (singles ++ multi).map(_._2).sum.toDouble
      (singles ++ multi).map { case (p, w) => (p, math.log(w / total)) }.toSeq
    }

    val lls = scala.collection.mutable.ListBuffer.empty[Long]
    for (round <- 1 to emRounds) {
      val lp = inv.toMap
      val maxL = maxPieceLen
      // E-step: micro-quantized expected counts + corpus LL, one shuffle
      val stats = words.flatMap { case (w, f) =>
        val (cs, ll) = expectedCounts(w, lp, maxL)
        cs.map { case (p, c) => (p, math.floor(c * f * 1e6).toLong, 0L) } :+
          (("", 0L, if (ll == NegInf) 0L else math.floor(ll * f * 1e6).toLong))
      }.toDF("piece", "micro", "ll_micro")
        .groupBy("piece")
        .agg(sum(col("micro")).as("micro"), sum(col("ll_micro")).as("ll"))
        .as[(String, Long, Long)].collect()
      lls += stats.map(_._3).sum
      // M-step: normalize; floor singles so coverage survives pruning
      val counts = stats.filter(_._1.nonEmpty).map { case (p, m, _) => (p, m) }.toMap
      val kept = inv.map { case (p, _) =>
        val m = counts.getOrElse(p, 0L)
        (p, if (p.length == 1) math.max(m, 1L) else m)
      }.filter(_._2 > 0L)
      // prune lowest-mass multi-char pieces toward the target
      val (s1, mN) = kept.partition(_._1.length == 1)
      val target = math.max(vocabTarget - s1.size,
        mN.size - math.max((seedSize - vocabTarget) / emRounds, 1))
      val prunedMulti = mN.sortBy { case (p, m) => (-m, p) }.take(math.max(target, 0))
      val total = (s1 ++ prunedMulti).map(_._2).sum.toDouble
      inv = (s1 ++ prunedMulti).map { case (p, m) => (p, math.log(m / total)) }
        .sortBy(_._1)
    }
    words.unpersist()

    val out = inv.sortBy { case (p, l) => (-l, p) }.zipWithIndex
      .map { case ((p, l), i) => (i + 1, p, p.length, math.rint(math.exp(l) * 1e8) / 1e8) }
      .toSeq.toDF("rnk", "piece", "piece_len", "prob")
    (out, lls.toSeq)
  }

  def train(spark: SparkSession, dir: String): DataFrame =
    trainWithStats(spark, dir)._1
}
