package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Sketches

/** Property tests for the native sketch kernels (F4) over seeded random
  * inputs — the invariants the dedup/ANN operators rely on.
  */
class KernelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rng = new scala.util.Random(7)
  private val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
  private def randDoc(maxLen: Int): Seq[String] =
    Seq.fill(1 + rng.nextInt(maxLen))(words(rng.nextInt(words.length)))

  private val docs = (1 to 200).map(i => (i.toLong, randDoc(30)))
  private lazy val df = docs.toDF("id", "toks").cache()

  test("ngram hashes: positional count is max(len-n+1, 1); distinct is sorted-unique of positional") {
    val got = df.select(col("id"), size(col("toks")).as("len"),
        Sketches.ngramHashes(col("toks"), 3, distinct = false).as("pos"),
        Sketches.ngramHashes(col("toks"), 3, distinct = true).as("dst"))
      .as[(Long, Int, Seq[Long], Seq[Long])].collect()
    got.foreach { case (id, len, pos, dst) =>
      assert(pos.length == math.max(len - 2, 1), s"doc $id")
      assert(dst == pos.distinct.sorted, s"doc $id")
    }
  }

  test("ngram hashes are order-sensitive and content-determined") {
    val a = Seq("x", "y", "z", "w")
    val b = Seq("y", "x", "z", "w") // same multiset, different order
    val got = Seq((1L, a), (2L, b), (3L, a)).toDF("id", "toks")
      .select(col("id"), Sketches.ngramHashes(col("toks"), 3, distinct = false).as("h"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(1L) == got(3L))          // deterministic
    assert(got(1L) != got(2L))          // order matters
  }


  test("lang-id kernel matches an independent reference over seeded random texts") {
    import graft.functions.TextFns
    val langRng = new scala.util.Random(13)
    val profWords = TextFns.langProfiles.flatMap(_._2)
    val triByLang = TextFns.trigramProfiles.toMap
    val noise = Vector("qqq", "zzz7", "Mixed", "UPPER", "12,3", "x")
    val seps = Vector(" ", "  ", "\t", " \n ")
    def randText(): String = {
      val n = langRng.nextInt(12)
      val toks = Seq.fill(n)(
        if (langRng.nextBoolean()) profWords(langRng.nextInt(profWords.length))
        else noise(langRng.nextInt(noise.length)))
      val lead = if (langRng.nextInt(4) == 0) " " else ""
      val trail = if (langRng.nextInt(4) == 0) "\t" else ""
      lead + toks.mkString(seps(langRng.nextInt(seps.length))) + trail
    }
    // independent reference: Java split semantics (limit -1 keeps boundary
    // empties, like Spark's split), the documented score formula, and the
    // fold's LAST-equal-wins argmax
    def ref(text: String): String = {
      val lowered = text.toLowerCase(java.util.Locale.ROOT)
      val toks = lowered.split("\\s+", -1)
      val n = math.max(toks.length, 1)
      val scores = TextFns.langProfiles.map { case (lang, prof) =>
        val cnt = toks.count(prof.contains)
        val tri = triByLang(lang)
        val hits = tri.count(lowered.contains).toDouble
        (lang, cnt.toDouble / n + hits / tri.length * 0.3)
      }
      val best = scores.map(_._2).max
      scores.foldLeft("und") { case (acc, (lang, s)) =>
        if (s == best && s > 0) lang else acc
      }
    }
    val texts = (1 to 300).map(i => (i.toLong, randText()))
    val got = texts.toDF("id", "text")
      .select(col("id"), TextFns.langId(col("text")).as("lang"))
      .as[(Long, String)].collect().toMap
    texts.foreach { case (id, t) =>
      assert(got(id) == ref(t), s"text #$id: ${t.take(60)}")
    }
    // explicit edge cases: empty text and pure whitespace score 0 -> und
    val edge = Seq((1L, ""), (2L, "   "), (3L, "\t\n")).toDF("id", "text")
      .select(col("id"), TextFns.langId(col("text")).as("lang"))
      .as[(Long, String)].collect().toMap
    assert(edge.values.forall(_ == "und"))
  }

  test("minhash signature: k-wide, order- and multiplicity-invariant (a set function)") {
    val base = docs.map { case (i, toks) => (i, toks.map(t => t.hashCode.toLong)) }
    val variants = base.map { case (i, hs) =>
      (i, hs, rng.shuffle(hs ++ hs.take(hs.length / 2))) // shuffled + duplicated
    }
    val got = variants.toDF("id", "hs", "hs2")
      .select(col("id"),
        Sketches.minhash(col("hs"), 64).as("s1"),
        Sketches.minhash(col("hs2"), 64).as("s2"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    got.foreach { case (id, s1, s2) =>
      assert(s1.length == 64 && s1 == s2, s"doc $id")
    }
  }

  test("band keys: bands-wide; equal signatures collide per band, disjoint shingle sets rarely do") {
    val sig = df.select(col("id"), Sketches.ngramHashes(col("toks"), 3, distinct = true).as("sh"))
      .withColumn("s", Sketches.minhash(col("sh"), 64))
      .select(col("id"), Sketches.bandKeys(col("s"), 16, 4).as("bk"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sig.values.forall(_.length == 16))
    // identical docs -> identical band keys (determinism across rows)
    val twin = Seq((1L, docs.head._2), (2L, docs.head._2)).toDF("id", "toks")
      .select(col("id"),
        Sketches.bandKeys(Sketches.minhash(
          Sketches.ngramHashes(col("toks"), 3, distinct = true), 64), 16, 4).as("bk"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(twin(1L) == twin(2L))
  }

  test("BPE kernel: pinned token vectors (values cross-checked against an independent python replica)") {
    import graft.plans.BpeTokenizer
    assert(BpeTokenizer.encodeWord("the") == List("the"))
    assert(BpeTokenizer.encodeWord("hash") == List("hash"))
    assert(BpeTokenizer.encodeWord("table") == List("table"))
    assert(BpeTokenizer.encodeWord("merge") == List("merge"))
    assert(BpeTokenizer.encodeWord("batch") == List("batch"))
    assert(BpeTokenizer.encodeWord("key") == List("key"))
    assert(BpeTokenizer.encodeWord("dup") == List("dup"))
    assert(BpeTokenizer.encodeWord("fast") == List("fa", "st"))
    assert(BpeTokenizer.encodeWord("stream") == List("stre", "a", "m"))
    assert(BpeTokenizer.encodeWord("window") == List("w", "in", "d", "o", "w"))
    assert(BpeTokenizer.encodeWord("order") == List("or", "d", "er"))
    assert(BpeTokenizer.encodeWord("100") == List("1", "00"))
    assert(BpeTokenizer.encodeWord("antidisestablishment") ==
      List("an", "t", "i", "d", "is", "es", "tab", "l", "is", "h", "m", "ent"))
    // full-text path: pre-tokenizer + per-word encode, punctuation kept
    assert(BpeTokenizer.encode("the fast key order sort, 100 windows!") ==
      List("the", "fa", "st", "key", "or", "d", "er", "s", "ort", ",",
        "1", "00", "w", "in", "d", "o", "w", "s", "!"))
  }

  test("BPE kernel properties: bounds, additivity, and expression == JVM path") {
    import graft.plans.BpeTokenizer
    val texts = (1 to 100).map(i => randDoc(20).mkString(" ") + s" id$i 4711 !")
    texts.foreach { t =>
      val pre = BpeTokenizer.preTokenize(t)
      val toks = BpeTokenizer.encode(t)
      // every word yields >=1 token and <= its char count; concatenating
      // a word's tokens reconstructs the word (BPE never loses bytes)
      assert(toks.length >= pre.length && toks.length == BpeTokenizer.countTokens(t))
      pre.foreach { w =>
        val e = BpeTokenizer.encodeWord(w)
        assert(e.nonEmpty && e.length <= w.length && e.mkString == w)
      }
    }
    val viaExpr = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), BpeTokenizer.bpeTokenCount(col("text")).as("n"))
      .as[(Long, Int)].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(viaExpr(i.toLong) == BpeTokenizer.countTokens(t), s"text $i")
    }
  }

  test("byte-BPE kernel: pinned vectors incl. leading-space and multi-byte UTF-8 merges") {
    import graft.plans.BpeByteTokenizer
    // hand-traced against the pinned table
    assert(BpeByteTokenizer.encode("the cat") == List("th", "e", " c", "at"))
    assert(BpeByteTokenizer.encode("a spark") == List("a", " spark"))
    assert(BpeByteTokenizer.encode("the and of") == List("th", "e", " and", " of"))
    assert(BpeByteTokenizer.encode("100") == List("1", "00"))
    assert(BpeByteTokenizer.encode("2020") == List("20", "20"))
    // é is TWO bytes (C3 A9) fused by the continuation merge: one token
    // bare, two with the unfused leading space
    assert(BpeByteTokenizer.encode("é").length == 1)
    assert(BpeByteTokenizer.encode(" é").length == 2)
    // the leading space belongs to the word: GPT-2's signature shape
    assert(BpeByteTokenizer.preTokenize("the fast cat") ==
      List("the", " fast", " cat"))
    assert(BpeByteTokenizer.preTokenize("a  b") == List("a", " ", " b"))
  }

  test("byte-BPE matches an independent replica; reconstruction + expression path hold") {
    import graft.plans.{BpeByteTokenizer => B}
    // independent replica: regex pre-tokenizer + repeated-scan merge
    // loop (different mechanics from the kernel's single-pass scan)
    val pat = java.util.regex.Pattern.compile(
      " ?\\p{L}+| ?\\p{Nd}+| ?[^\\p{L}\\p{Nd}\\s]+|\\s")
    def rePre(t: String): List[String] = {
      val m = pat.matcher(t)
      val out = scala.collection.mutable.ListBuffer.empty[String]
      while (m.find()) out += m.group()
      out.toList
    }
    val rank: Map[(String, String), Int] =
      B.merges.zipWithIndex.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    def reEncode(pre: String): List[String] = {
      var syms = pre.getBytes("UTF-8").map(b => (b & 0xff).toChar.toString).toList
      var go = true
      while (go && syms.length > 1) {
        val pairs = syms.zip(syms.tail)
        val ranked = pairs.flatMap(p => rank.get(p).map(r => (r, p)))
        if (ranked.isEmpty) go = false
        else {
          val (_, (a, b)) = ranked.minBy(_._1)
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var rest = syms
          while (rest.nonEmpty) rest match {
            case x :: y :: t if x == a && y == b => out += x + y; rest = t
            case x :: t => out += x; rest = t
            case Nil => ()
          }
          syms = out.toList
        }
      }
      syms
    }
    val texts = (1 to 80).map(i =>
      randDoc(15).mkString(" ") + s" the spark and café $i 2020!")
    texts.foreach { t =>
      val mine = B.encode(t)
      val ref = rePre(t).flatMap(reEncode)
      assert(mine == ref, s"mismatch on: $t\n$mine\n$ref")
      // reconstruction: byte image survives tokenization exactly
      assert(mine.mkString == new String(
        t.getBytes("UTF-8").map(b => (b & 0xff).toChar)))
      assert(B.countTokens(t) == mine.length)
    }
    val viaExpr = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), B.bpeByteTokenCount(col("text")).as("n"))
      .as[(Long, Int)].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(viaExpr(i.toLong) == B.countTokens(t), s"text $i")
    }
  }

  test("BPE training matches an independent in-memory replica; learned table feeds the kernel") {
    import graft.plans.BpeTokenizer
    // deliberately repetitive corpus so early merges are unambiguous
    val corpus = Seq(
      "the cat sat on the mat the cat sat",
      "the hatter chatted that the cat heard",
      "that mat sat flat that mat sat flat",
      "chat chat chatter chatted scatter")
    // ---- independent replica (recursion + sorting, no shared code) ----
    val pat = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]".r
    def mergeSeq(s: List[String], a: String, b: String): List[String] = s match {
      case x :: y :: rest if x == a && y == b => (a + b) :: mergeSeq(rest, a, b)
      case x :: rest => x :: mergeSeq(rest, a, b)
      case Nil => Nil
    }
    var vocab: Map[List[String], Long] = corpus.flatMap(t => pat.findAllIn(t))
      .groupBy(identity).map { case (w, g) => w.map(_.toString).toList -> g.size.toLong }
    val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var stop = false
    while (expected.length < 12 && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case List(a, b) => counts((a, b)) += f
          case _ =>
        }
      }
      val ranked = counts.toSeq.sortBy { case ((a, b), w) => (-w, a, b) }
      if (ranked.isEmpty || ranked.head._2 < 2) stop = true
      else {
        val ((a, b), w) = ranked.head
        expected += ((expected.length.toLong, a, b, w))
        vocab = vocab.toSeq.map { case (syms, f) => mergeSeq(syms, a, b) -> f }
          .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
      }
    }
    // ---- engine ----
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = graft.operators.BpeTrain.learnMergesDf(df, 12)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == expected.toSeq, s"got=$got\nexpected=$expected")
    // ---- learned table through the inference kernel ----
    val tbl = BpeTokenizer.ranksOf(got.map(m => (m._2, m._3)))
    val learnedTokens = BpeTokenizer.preTokenize(corpus.mkString(" "))
      .map(w => BpeTokenizer.encodeWord(w, tbl).length).sum
    val charTokens = BpeTokenizer.preTokenize(corpus.mkString(" "))
      .map(_.length).sum
    assert(learnedTokens < charTokens, "learned merges must compress the training corpus")
    // the corpus's dominant pairs must surface in the first merges
    val firstPairs = got.take(4).map(m => m._2 + m._3)
    assert(firstPairs.exists(p => p.contains("at") || p.contains("th")),
      s"unexpected head of merge table: $firstPairs")
  }

  test("lcs_spans kernel: every maximal shared run >= minRun, vs a naive replica") {
    val rng = new scala.util.Random(17)
    def doc() = Seq.fill(10 + rng.nextInt(60))(rng.nextInt(6).toLong)
    // naive: for every (i, j) where a run STARTS (not preceded by a
    // match), walk its full length; report (len, b_end_exclusive)
    def naive(a: Seq[Long], b: Seq[Long], minRun: Int): Seq[(Int, Int)] =
      (for {
        i <- a.indices; j <- b.indices
        if a(i) == b(j) && (i == 0 || j == 0 || a(i - 1) != b(j - 1))
      } yield {
        var k = 0
        while (i + k < a.length && j + k < b.length && a(i + k) == b(j + k)) k += 1
        (k, j + k)
      }).filter(_._1 >= minRun).sorted
    val cases = Seq.fill(30)((doc(), doc())) :+ {
      // planted: two disjoint runs plus a sub-minRun one
      val run1 = Seq.fill(7)(99L); val run2 = Seq.fill(5)(88L)
      ((run1 ++ Seq(1L, 2L) ++ run2 ++ Seq(3L), Seq(4L, 5L) ++ run1 ++ Seq(6L) ++ run2))
    }
    val got = cases.toDF("a", "b")
      .select(graft.plans.LcsSpans(col("a"), col("b"), 4))
      .as[Seq[(Int, Int)]].collect().toSeq.map(_.sorted)
    cases.zip(got).foreach { case ((a, b), g) =>
      assert(g == naive(a, b, 4), s"a=$a b=$b got=$g want=${naive(a, b, 4)}")
    }
  }

  test("simhash: equal token multisets agree; near-identical docs are close, unrelated far") {
    val doc = randDoc(60)
    val near = doc.updated(0, "CHANGED")
    val far = Seq.fill(60)("completely") ++ Seq.fill(60)("unrelated")
    def sim(toks: Seq[String]): Long =
      Seq(Tuple1(toks)).toDF("toks")
        .select(Sketches.simhash(Sketches.ngramHashes(col("toks"), 1, distinct = false)))
        .as[Long].head()
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(sim(doc) == sim(doc))
    assert(ham(sim(doc), sim(near)) < ham(sim(doc), sim(far)),
      s"near=${ham(sim(doc), sim(near))} far=${ham(sim(doc), sim(far))}")
  }
}
