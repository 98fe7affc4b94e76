package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native language-ID kernel (SURVEY §2 E8 hot path).
  *
  * The first implementation scored each language with an interpreted
  * `filter(toks, t.isin(profile))` higher-order function plus a
  * 16-branch trigram `contains` chain — 4 per-row closures over the
  * token array and 4 full re-splits of the text, which regressed
  * q_lang_id 0.21→1.02 s when trigrams were added. This expression
  * computes all four scores in ONE pass: a single whitespace scan
  * tokenizes the text, each token does one hash-map probe that yields a
  * per-language membership bitmask, and the 16 trigram searches are
  * plain indexOf over the lowered text.
  *
  * Oracle parity: the arithmetic reproduces the Column formulation
  * bit-for-bit — IEEE doubles, same operation order
  * (`matches/n + hits/nTri * 0.3`), token count replicating
  * `split(lower(text), "\\s+")` with limit -1 (leading AND trailing
  * empty tokens kept: n = separator-runs + 1), and the argmax tie order
  * of the Column fold (LAST equal-scoring language wins). The DuckDB
  * oracle SQL is unchanged.
  */
case class LangIdExpr(
    child: Expression,
    profiles: Seq[(String, Seq[String])],
    trigrams: Seq[(String, Seq[String])])
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lang_id expects string, got ${t.catalogString}")
  }

  private val nLangs = profiles.size
  @transient private lazy val langNames: Array[UTF8String] =
    profiles.map(p => UTF8String.fromString(p._1)).toArray
  /** token → bitmask of languages whose function-word profile contains it. */
  @transient private lazy val tokenMask: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    profiles.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        m.merge(w, Integer.valueOf(1 << i), (a, b) => Integer.valueOf(a | b))
      }
    }
    m
  }
  @transient private lazy val triArr: Array[Array[String]] = {
    val byLang = trigrams.toMap
    profiles.map { case (lang, _) => byLang(lang).toArray }.toArray
  }

  private def isSpace(c: Char): Boolean = // java.util.regex \s
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    val len = text.length
    val counts = new Array[Int](nLangs)
    // one scan: count separator runs (n_toks = runs + 1, matching
    // split-with-limit=-1 semantics) and probe each token once
    var sepRuns = 0
    var i = 0
    while (i < len) {
      if (isSpace(text.charAt(i))) {
        sepRuns += 1
        while (i < len && isSpace(text.charAt(i))) i += 1
      } else {
        val start = i
        while (i < len && !isSpace(text.charAt(i))) i += 1
        val mask = tokenMask.get(text.substring(start, i))
        if (mask != null) {
          val m = mask.intValue()
          var l = 0
          while (l < nLangs) {
            if (((m >> l) & 1) == 1) counts(l) += 1
            l += 1
          }
        }
      }
    }
    val nToks = sepRuns + 1
    // per-language score with the EXACT operation order of the Column
    // formulation: cnt/n + (hitSum/nTri) * 0.3
    val scores = new Array[Double](nLangs)
    var l = 0
    while (l < nLangs) {
      var hits = 0.0
      val tri = triArr(l)
      var t = 0
      while (t < tri.length) {
        if (text.contains(tri(t))) hits += 1.0
        t += 1
      }
      scores(l) = counts(l).toDouble / nToks + hits / tri.length * 0.3
      l += 1
    }
    var best = scores(0)
    l = 1
    while (l < nLangs) { if (scores(l) > best) best = scores(l); l += 1 }
    // fold-left tie order: LAST equal-scoring language wins
    var pick = -1
    l = 0
    while (l < nLangs) { if (scores(l) == best && scores(l) > 0) pick = l; l += 1 }
    if (pick < 0) LangIdExpr.UND else langNames(pick)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangIdExpr {
  private val UND = UTF8String.fromString("und")

  def langId(text: Column,
             profiles: Seq[(String, Seq[String])],
             trigrams: Seq[(String, Seq[String])]): Column =
    GraftColumnBridge.toColumn(
      LangIdExpr(GraftColumnBridge.toExpression(text), profiles, trigrams))
}
