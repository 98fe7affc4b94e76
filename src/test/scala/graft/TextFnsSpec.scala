package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns

class TextFnsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("compression-ratio signal: repetitive text deflates far better than varied text (E32)") {
    val spam = ("buy now " * 200).trim
    val varied = (1 to 200).map(i => s"w${i * 7919 % 9973}x$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-comp").toString
    Seq((0L, spam, "en", "s", spam.length.toLong),
        (1L, varied, "en", "s", varied.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.operators.Curation.compressionRatio(spark, dir)
      .select("doc_id", "ratio").as[(Long, Double)].collect().toMap
    assert(r(0L) < 0.1, s"template spam should collapse under deflate, got ${r(0L)}")
    assert(r(1L) > 0.3, s"varied text should resist, got ${r(1L)}")
    assert(r(0L) < r(1L) / 3)
  }

  test("domain blocklist is dot-suffix, not substring (E24 rule pin)") {
    // hosts are src<N>.example.com (+ cdn. prefix on doc_id%9==0)
    val full = graft.operators.Curation
      .domainFilter(spark, TestSpark.sf, blocklist = Seq("example.com"))
      .agg(sum(col("n_docs")).as("d"), sum(col("n_blocked")).as("b"))
      .as[(Long, Long)].collect().head
    assert(full._1 == full._2, "every host is a subdomain of example.com — all must block")
    val sub = graft.operators.Curation
      .domainFilter(spark, TestSpark.sf, blocklist = Seq("xample.com"))
      .agg(sum(col("n_blocked")).as("b")).as[Long].collect().head
    assert(sub == 0L, "substring tail 'xample.com' must NOT block (no dot boundary)")
  }

  test("analyzer chain: lowercase, stop filter, minimal_english stemmer rule edges (C64)") {
    val got = Seq("The Tables AND ponies pass US buses it glass bus is As")
      .toDF("text")
      .select(TextFns.analyzeTokens(col("text"))).as[Seq[String]].collect().head
    // "the"/"and"/"it"/"is"/"as" are stopwords (case-folded first);
    // tables->table, ponies->ponie, buses->buse (plural s stripped);
    // pass/glass (-ss) and us/bus (-us, len<3) keep their s
    assert(got == Seq("table", "ponie", "pass", "us", "buse", "glass", "bus"),
      s"chain output mismatch: $got")
  }

  test("langId picks the right profile on crafted sentences") {
    val df = Seq(
      ("the cat and the dog is in the house", "en"),
      ("der hund und die katze ist nicht hier und das haus", "de"),
      ("el perro y la casa de los gatos es grande y es bonita", "es"),
      ("le chat et les chiens est une belle maison je ne sais", "fr"),
      // no function words at all — char-trigram evidence must decide
      ("zugverbindung hauptbahnhof schnellzug einfahrt", "de"),
      ("walking talking shopping motivation", "en"),
      ("zzz qqq xxx", "und")
    ).toDF("text", "expected")
    val got = df.select(TextFns.langId(col("text")).as("got"), col("expected"))
      .as[(String, String)].collect()
    got.foreach { case (g, e) => assert(g == e, s"expected $e got $g") }
  }

  test("token counts: whitespace and BPE-ish") {
    val df = Seq("hello world, it's 42 degrees").toDF("text")
    val (ws, bpe) = df.select(
      TextFns.wsTokenCount(col("text")),
      TextFns.bpeTokenCount(col("text"))).as[(Int, Int)].collect().head
    assert(ws == 5)
    // hello|world|,|it|'|s|42|degrees
    assert(bpe == 8)
  }

  test("quality score rewards diverse text over repetition") {
    val df = Seq(
      ("a", "the quick brown fox jumps over one lazy dog near riverbanks"),
      ("b", "spam spam spam spam spam spam spam spam spam spam")
    ).toDF("id", "text")
    val m = df.select(col("id"), TextFns.qualityScore(col("text")).as("q"))
      .as[(String, Double)].collect().toMap
    assert(m("a") > m("b"))
  }

  test("winnowing fingerprints overlap heavily for near-identical docs") {
    val base = (1 to 80).map(i => s"w$i").mkString(" ")
    val nearDup = base.replace("w40 ", "w40x ")
    val other = (1 to 80).map(i => s"v$i").mkString(" ")
    val df = Seq(("base", base), ("dup", nearDup), ("other", other)).toDF("id", "text")
    val fps = df.select(col("id"), TextFns.fingerprints(col("text")).as("fp"))
      .as[(String, Seq[Long])].collect().toMap.view.mapValues(_.toSet).toMap
    val overlapDup = (fps("base") & fps("dup")).size.toDouble / fps("base").size
    val overlapOther = (fps("base") & fps("other")).size.toDouble / fps("base").size
    assert(overlapDup > 0.7, s"near-dup overlap $overlapDup")
    assert(overlapOther == 0.0)
  }
}
