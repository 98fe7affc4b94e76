package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** BYTE-level BPE token counter (E10d, F4 kernel family) — the
  * GPT-2-class scheme modern pipelines denominate budgets in, next to
  * E10b's word-internal character BPE (Sennrich).
  *
  * Public algorithm (Radford et al. 2019, "Language Models are
  * Unsupervised Multitask Learners", §2.2 + the published encoder.py):
  *   1. pre-tokenize with the leading-space convention — a pretoken is
  *      (optional single space) + letter run | digit run | punct run;
  *      the space BELONGS to the following word ("Ġword"), GPT-2's
  *      signature property, so "the cat" → [the][ cat], and
  *      whitespace itself costs tokens only via those prefixes;
  *   2. map the pretoken's UTF-8 BYTES to symbols (here: latin-1 chars,
  *      a bijective byte→char image — the same trick as GPT-2's
  *      bytes_to_unicode, chosen so the merge machinery can reuse
  *      E10b's string-keyed ranks);
  *   3. greedily merge the lowest-ranked adjacent pair until none
  *      remains (identical inference loop to BpeTokenizer.encodeWord).
  *
  * The merge table is a FIXED, GPT-2-STYLE fragment pinned in source:
  * rank tiers mirror what the published vocab.bpe learns first —
  * space+letter fusions ("Ġt", "Ġa", …), top English letter pairs,
  * then the common subwords they compose ("Ġthe", "ing", …). A frozen
  * table (not the 50k-entry original) keeps counts deterministic and
  * reviewable; the kernel accepts any ordered table, so swapping in a
  * full learned file is a data change, not a code change. KernelSpec
  * pins exact token vectors against an independent replica.
  *
  * Why UTF-8 bytes matter: E10b's char BPE counts a multi-byte
  * codepoint as one symbol; byte BPE charges its true byte cost —
  * the difference IS the fertility gap frontier tokenizers report on
  * non-ASCII text, and budget ledgers (E13b-e) must see it.
  */
case class BpeByteCountExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_byte_token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_byte_token_count expects string, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    BpeByteTokenizer.countTokens(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeByteTokenizer {

  /** Bijective byte→symbol image: latin-1 char of the unsigned byte.
    * (GPT-2 remaps to printable codepoints for file round-trips; a
    * direct latin-1 image is the same bijection without the shuffle.)
    */
  private def toSymbols(bytes: Array[Byte]): Array[String] =
    bytes.map(b => (b & 0xff).toChar.toString)

  private val SP = " " // 0x20 as a latin-1 symbol

  /** Ranked GPT-2-style merge fragment. Tier 1: space+letter fusions
    * (the very first merges a byte-level table learns — almost every
    * English word occurrence is space-prefixed). Tier 2: top English
    * letter byte-pairs. Tier 3: the common subwords they compose,
    * including space-carrying whole words ("Ġthe", "Ġof", …) and the
    * multi-byte UTF-8 continuation pair (0xC3 0xA9 = "é") so non-ASCII
    * text exercises genuine byte merges.
    */
  val merges: Vector[(String, String)] = Vector(
    // tier 1: Ġ+letter
    SP -> "t", SP -> "a", SP -> "i", SP -> "o", SP -> "s",
    SP -> "w", SP -> "b", SP -> "c", SP -> "f", SP -> "m",
    SP -> "p", SP -> "d", SP -> "h", SP -> "l", SP -> "e",
    // tier 2: top letter pairs
    "t" -> "h", "i" -> "n", "e" -> "r", "a" -> "n", "r" -> "e",
    "o" -> "n", "e" -> "n", "a" -> "t", "e" -> "s", "o" -> "r",
    "t" -> "e", "e" -> "d", "i" -> "s", "i" -> "t", "a" -> "l",
    "s" -> "t", "n" -> "g", "s" -> "e", "h" -> "e", "l" -> "e",
    // tier 3: composed subwords and space-carrying words
    (SP + "t") -> "h", (SP + "th") -> "e", (SP + "a") -> "n",
    (SP + "an") -> "d", (SP + "o") -> "f", (SP + "t") -> "o",
    (SP + "i") -> "s", (SP + "i") -> "n", (SP + "w") -> "as",
    "a" -> "s", "in" -> "g", "e" -> "nt", "n" -> "t", "o" -> "u",
    (SP + "s") -> "p", (SP + "sp") -> "ar", "a" -> "r", "ar" -> "k",
    (SP + "spar") -> "k",
    // tier 4: digits and the é continuation pair
    "1" -> "9", "2" -> "0", "0" -> "0",
    "Ã" -> "©")

  private val ranks: java.util.HashMap[String, Integer] =
    BpeTokenizer.ranksOf(merges)

  /** GPT-2-style pre-tokenization: (optional leading space) + letter
    * run | digit run | punct run; non-space whitespace and spaces not
    * followed by a word stand alone. Operates on chars (class tests),
    * byte mapping happens per pretoken.
    */
  def preTokenize(text: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val len = text.length
    var i = 0
    while (i < len) {
      val c = text.charAt(i)
      val hasSpace = c == ' ' && i + 1 < len && !text.charAt(i + 1).isWhitespace
      val s = i
      val j = if (hasSpace) i + 1 else i
      val cj = if (j < len) text.charAt(j) else c
      if (!hasSpace && c.isWhitespace) { out += c.toString; i += 1 }
      else if (cj.isLetter) {
        i = j; while (i < len && text.charAt(i).isLetter) i += 1
        out += text.substring(s, i)
      } else if (cj.isDigit) {
        i = j; while (i < len && text.charAt(i).isDigit) i += 1
        out += text.substring(s, i)
      } else {
        i = j
        while (i < len && !text.charAt(i).isWhitespace &&
          !text.charAt(i).isLetter && !text.charAt(i).isDigit) i += 1
        out += text.substring(s, i)
      }
    }
    out.toList
  }

  /** Encode one pretoken: UTF-8 bytes → latin-1 symbols → greedy
    * lowest-rank merges (the shared inference loop).
    */
  def encodePretoken(pre: String): List[String] = {
    val syms = toSymbols(pre.getBytes("UTF-8"))
    if (syms.length <= 1) return syms.toList
    BpeTokenizer.encodeWord(syms.mkString, ranks)
  }

  def encode(text: String): List[String] = preTokenize(text).flatMap(encodePretoken)

  private val memoCap = 1 << 16
  private val memo = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  def countTokens(text: String): Int = {
    var n = 0
    preTokenize(text).foreach { w =>
      val cached = memo.get(w)
      if (cached != null) n += cached.intValue()
      else {
        val c = encodePretoken(w).length
        if (memo.size < memoCap) memo.putIfAbsent(w, Integer.valueOf(c))
        n += c
      }
    }
    n
  }

  def bpeByteTokenCount(text: Column): Column =
    GraftColumnBridge.toColumn(BpeByteCountExpr(GraftColumnBridge.toExpression(text)))
}
