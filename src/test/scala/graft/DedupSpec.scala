package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashFns
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Ground truth: brute-force exact Jaccard over all pairs. */
  private def bruteForcePairs(threshold: Double): Set[(Long, Long)] = {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), array_distinct(HashFns.shingleHashes(col("text"), 3)).as("sh"))
    val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("j", HashFns.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("j") >= threshold)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
  }

  test("minhash LSH finds all true near-dup pairs (recall vs brute force)") {
    val truth = bruteForcePairs(0.7)
    assert(truth.nonEmpty, "test corpus should contain planted near-dups")
    val found = Dedup.minhashPairs(spark, TestSpark.sf, 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // verification step makes precision exact; banding gives high recall at j>=0.7
    assert(found.subsetOf(truth), s"false positives: ${found -- truth}")
    val recall = (found & truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall too low (found ${found.size} of ${truth.size})")
  }

  test("simhash flags planted near-identical docs, not unrelated ones") {
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val nearDup = base.replace("token7 ", "token7x ")
    val other = (1 to 60).map(i => s"word$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairsDf(df, maxHamming = 6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("ngram jaccard drops an over-cap hot prefix block but keeps normal blocks") {
    // a corpus where one two-word prefix is degenerate-hot (above
    // maxBucketSize) — the log-domain skew case the cap exists for
    // every hot doc is a true near-dup of every other (shared 30-token
    // body, one unique token) — uncapped, the block would emit
    // (210+ choose 2) ≈ 22k pairs; the cap must emit zero
    val hotBody = (1 to 30).map(j => s"common$j").mkString(" ")
    val hot = (1L to (Dedup.maxBucketSize + 10L)).map { i =>
      (i, s"hot prefix $hotBody unique$i")
    }
    val cold = Seq(
      (9001L, "cold block " + (1 to 30).map(j => s"shared$j").mkString(" ")),
      (9002L, "cold block " + (1 to 30).map(j => s"shared$j").mkString(" ") + " tail"))
    val dir = java.nio.file.Files.createTempDirectory("graft-hotblock").toString
    (hot ++ cold).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Dedup.ngramJaccard(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // the cold pair survives; the hot block contributes NO pairs — the
    // cap turned a (210 choose 2) quadratic block into zero work
    assert(pairs == Set((9001L, 9002L)), s"got $pairs")
    // exact dups planted INSIDE a hot block still link via canonical
    // corpus' separate star-edge mining (linear, uncapped)
    val hotDup = hot :+ (8000L -> hot.head._2) :+ (8001L -> hot.head._2)
    val dir2 = java.nio.file.Files.createTempDirectory("graft-hotdup").toString
    (hotDup ++ cold).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val labels = Dedup.canonicalCorpus(spark, dir2).as[(Long, Long)].collect().toMap
    assert(labels(8000L) == 1L && labels(8001L) == 1L,
      "exact dups in an over-cap block must still share a keeper")
  }

  test("canonical corpus matches union-find over the mined pair graph") {
    val labels = Dedup.canonicalCorpus(spark, TestSpark.sf)
      .as[(Long, Long)].collect().toMap
    // ground truth: union-find over the same edges, computed locally
    val edges = Dedup.ngramJaccard(spark, TestSpark.sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map[Long, Long]().withDefault(identity)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
    }
    labels.foreach { case (doc, keep) => assert(keep == find(doc), s"doc $doc") }
    assert(labels.nonEmpty && labels.exists { case (d, k) => d != k })

    // the distributed label-propagation path (forced by a 0 edge bound)
    // must produce the identical mapping as the small-graph fast path
    val distributed = Dedup.canonicalCorpus(spark, TestSpark.sf, smallGraphMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(distributed == labels)
  }

  test("paragraph dedup flags a passage shared across otherwise-distinct docs") {
    // one exact 10-word passage pasted into two unique documents — the
    // boilerplate case document-level near-dup misses (Lee et al. 2022)
    val shared = (1 to 10).map(i => s"shared$i").mkString(" ")
    val tailA = (1 to 10).map(i => s"aonly$i").mkString(" ")
    val tailB = (1 to 10).map(i => s"bonly$i").mkString(" ")
    val clean = (1 to 20).map(i => s"clean$i").mkString(" ")
    val df = Seq(
      (1L, s"$shared $tailA"), (2L, s"$shared $tailB"), (3L, clean)
    ).toDF("doc_id", "text")
    val got = Dedup.paragraphDedupDf(df)
      .select("doc_id", "n_paragraphs", "n_dup_paragraphs")
      .as[(Long, Long, Long)].collect()
      .map { case (d, n, dup) => d -> ((n, dup)) }.toMap
    assert(got(1L) == ((2L, 1L)) && got(2L) == ((2L, 1L)) && got(3L) == ((2L, 0L)))
  }

  test("paragraph dedup: a remnant tail window still counts; within-doc repeats flagged") {
    // 25 words -> 3 windows (10, 10, 5); windows 1 and 2 are identical
    val rep = (1 to 10).map(i => s"r$i").mkString(" ")
    val tail = (1 to 5).map(i => s"t$i").mkString(" ")
    val df = Seq((7L, s"$rep $rep $tail")).toDF("doc_id", "text")
    val got = Dedup.paragraphDedupDf(df)
      .select("doc_id", "n_paragraphs", "n_dup_paragraphs", "dup_ratio")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq((7L, 3L, 2L, 0.6667)))
  }

  test("multi-scale passage profile: short-scale overlap invisible at longer scales") {
    // a 5-word fragment shared by two otherwise-unique 25-word docs is
    // a dup ONLY at scale 5 (longer windows absorb the unique tails);
    // two identical 50-word docs duplicate at every scale
    val sh = (1 to 5).map(i => s"s$i").mkString(" ")
    val a = (1 to 20).map(i => s"a$i").mkString(" ")
    val b = (1 to 20).map(i => s"b$i").mkString(" ")
    val c = (1 to 50).map(i => s"c$i").mkString(" ")
    val df = Seq((1L, s"$sh $a"), (2L, s"$sh $b"), (3L, c), (4L, c))
      .toDF("doc_id", "text")
    val got = Dedup.passageScaleProfileDf(df)
      .select("scale", "n_passages", "n_dup_passages", "n_docs_affected")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (5L, 30L, 22L, 4L),   // shared fragment + both copies of c
      (10L, 16L, 10L, 2L),  // only the identical docs still collide
      (25L, 6L, 4L, 2L),
      (50L, 4L, 2L, 2L)))
  }

  test("LCS overlap verifier: phase-shifted shared run found with exact length") {
    val run = (1 to 20).map(i => s"run$i").mkString(" ")
    val shortRun = (1 to 5).map(i => s"sr$i").mkString(" ")
    val pre1 = (1 to 3).map(i => s"p$i").mkString(" ")
    val pre2 = (1 to 11).map(i => s"q$i").mkString(" ")
    val df = Seq(
      (1L, s"$pre1 $run x1 x2 x3 x4 x5"),        // run at offset 3
      (2L, s"$pre2 $run y1 y2"),                  // same run at offset 11
      (3L, s"$shortRun z1 z2 z3 z4 z5 z6 z7"),    // shares only a 5-word run w/ 4
      (4L, s"$shortRun w1 w2 w3 w4 w5 w6 w7"),
      (5L, (1 to 30).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = Dedup.lcsOverlapDf(df, minRun = 8)
      .as[(Long, Long, Long)].collect().toSeq
    // fixed 10-word windows would MISS the (3,11) phase shift; the
    // winnowing candidates + LCS verify find it with the exact length
    assert(got == Seq((1L, 2L, 20L)), s"got $got")
  }

  test("expensive kernels evaluate ONCE in the physical plan (EvalOnce barrier holds)") {
    // without the EvalOnce barrier, predicate pushdown inlines the
    // aliased kernel into the join condition AND leaves the projection
    // copy — lcs_words ran twice (r7 plan), the banded levenshtein DP
    // three times. Count kernel CALL SITES in the executed plan text.
    // pre-execution plan: the single-eval property is decided at
    // optimization time, and the executed AQE plan's toString would
    // print Final AND Initial sections, double-counting every call
    def callSites(df: org.apache.spark.sql.DataFrame, fn: String): Int = {
      val plan = df.queryExecution.executedPlan.toString
      s"$fn\\(".r.findAllIn(plan).size
    }
    val docs = Seq(
      (1L, (1 to 20).map(i => s"r$i").mkString(" ") + " a b c"),
      (2L, "x y " + (1 to 20).map(i => s"r$i").mkString(" ")),
      (3L, (1 to 20).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    assert(callSites(Dedup.lcsOverlapDf(docs, 8), "lcs_words") == 1)
    assert(callSites(
      Dedup.levenshteinPairs(spark, TestSpark.sf), "levenshtein") == 1)
  }

  test("substring removal cuts the duplicated span from later docs only; overlaps merge; idempotent") {
    def run(lo: Int, hi: Int) = (lo to hi).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, "a1 a2 a3 a4 a5 " + run(1, 15) + " z1 z2 z3 z4 z5"),
      (2L, "b1 b2 b3 b4 b5 " + run(6, 20) + " y1 y2 y3 y4 y5"),
      (3L, "c1 c2 c3 " + run(1, 20) + " w1 w2 w3 w4"),
      (4L, (1 to 30).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.substringRemovalDf(docs, minRun = 10)
      .select("doc_id", "n_cuts", "words_removed", "n_words_after", "text_clean")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1 is the lowest id in every pair it joins: keeps its copy
    assert(out(1L)._2 == 0 && out(1L)._3 == 0)
    // doc 2 loses its 10-word overlap with doc 1 (r6..r15)
    assert(out(2L)._3 == 10 && out(2L)._4 == 15, s"doc2 ${out(2L)}")
    assert(!out(2L)._5.contains("r6") && out(2L)._5.contains("b1"))
    // doc 3's two overlapping spans ([r1..r15] vs 1, [r6..r20] vs 2)
    // merge into ONE 20-word island
    assert(out(3L)._2 == 1 && out(3L)._3 == 20 && out(3L)._4 == 7, s"doc3 ${out(3L)}")
    // unrelated doc untouched
    assert(out(4L)._3 == 0)
    // idempotence: a second pass over the cleaned corpus cuts nothing
    val cleaned = out.values.toSeq.map(r => (r._1, r._5)).toDF("doc_id", "text")
    val second = Dedup.substringRemovalDf(cleaned, minRun = 10)
      .agg(sum("words_removed")).as[Long].head()
    assert(second == 0, s"second pass removed $second words")
  }

  test("substring removal FIXPOINT cleans a doc with three disjoint duplicated runs") {
    def run(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val (r1, r2, r3) = (run("a", 20), run("b", 15), run("c", 12))
    val docs = Seq(
      (1L, s"k1 k2 k3 $r1 k4 k5 $r2 k6 k7 $r3 k8 k9"),      // keeper (lowest id)
      (2L, s"m1 m2 $r1 m3 m4 m5 $r2 m6 $r3 m7 m8 m9 m10"),  // three disjoint runs
      (3L, (1 to 25).map(i => s"n$i").mkString(" "))
    ).toDF("doc_id", "text")
    // one pass cuts ALL THREE maximal runs (the lcs_spans kernel — a
    // one-longest-span kernel would leave r2 and r3 for later rounds)
    val one = Dedup.substringRemovalDf(docs, minRun = 10)
      .filter(col("doc_id") === 2L)
      .select("n_cuts", "words_removed").as[(Long, Long)].head()
    assert(one == (3L, 47L), s"single pass: $one")
    // the fixpoint certifies: one cut round, then a fresh mining finds
    // nothing — converged with rounds=1
    val fix = Dedup.substringRemovalFixpointDf(docs, minRun = 10)
      .select("doc_id", "n_cuts", "words_removed", "n_words_after", "rounds", "converged", "text_clean")
      .as[(Long, Long, Long, Long, Long, Boolean, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(fix(2L)._2 == 3 && fix(2L)._3 == 47, s"doc2 ${fix(2L)}")
    assert(!fix(2L)._7.contains("a1") && !fix(2L)._7.contains("b1") &&
      !fix(2L)._7.contains("c1") && fix(2L)._7.contains("m1"))
    assert(fix(2L)._4 == 10)
    assert(fix(2L)._5 == 1 && fix(2L)._6, s"rounds/converged ${fix(2L)}")
    // keeper and unrelated doc untouched
    assert(fix(1L)._3 == 0 && fix(3L)._3 == 0)
    // the round bound exits BEFORE the certification mining: everything
    // cut, but convergence unproven — reported honestly
    val bounded = Dedup.substringRemovalFixpointDf(docs, minRun = 10, maxRounds = 1)
      .filter(col("doc_id") === 2L)
      .select("words_removed", "rounds", "converged")
      .as[(Long, Long, Boolean)].head()
    assert(bounded == (47L, 1L, false), s"bounded: $bounded")
  }

  test("lcs_words kernel matches a naive independent replica on random inputs") {
    val rng = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d")
    def doc() = Seq.fill(3 + rng.nextInt(40))(vocab(rng.nextInt(vocab.length)))
    def naive(x: Seq[String], y: Seq[String]): Int =
      (for { i <- x.indices; j <- y.indices } yield {
        var k = 0
        while (i + k < x.length && j + k < y.length && x(i + k) == y(j + k)) k += 1
        k
      }).maxOption.getOrElse(0)
    val cases = Seq.fill(25)((doc(), doc()))
    val got = cases.toDF("a", "b")
      .select(graft.plans.LcsWords(col("a"), col("b"))).as[Int].collect().toSeq
    assert(got == cases.map { case (a, b) => naive(a, b) })
  }

  test("exact dedup groups identical texts") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "different")).toDF("doc_id", "text")
    val groups = df.groupBy(md5(col("text"))).agg(min("doc_id").as("keep"), count(lit(1)).as("n"))
      .select("keep", "n").as[(Long, Long)].collect().toMap
    assert(groups(1L) == 2L && groups(3L) == 1L)
  }

  /** Write a planted documents table and return its dir. */
  private def plantDocs(tag: String, rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-$tag").toString
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("cross-corpus near-dup reports only pairs that straddle the reference boundary (E46)") {
    def words(p: String) = (1 to 30).map(i => s"$p$i").mkString(" ")
    def nearCopy(p: String) = (words(p) + " tailword")
    val dir = plantDocs("cross", Seq(
      (0L, words("w"), "src0"),            // reference
      (1L, nearCopy("w"), "src9"),         // incoming near-copy -> reported
      (2L, words("v"), "src8"),            // both outside -> not reported
      (3L, nearCopy("v"), "src9"),
      (4L, words("u"), "src1"),            // both inside -> not reported
      (5L, nearCopy("u"), "src2")))
    val got = Dedup.crossCorpusDedup(spark, dir)
      .select("doc_id", "source", "ref_doc").as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "src9", 0L)),
      s"only the boundary-straddling pair may be reported, got $got")
  }

  test("bloom paragraph dedup: no false negatives on a re-sent doc; FP rate bounded; deterministic (E45)") {
    val refText = (1 to 40).map(i => s"ref$i").mkString(" ")
    val fresh = (1 to 200).map(i => s"fresh${i * 7919 % 99991}n$i").mkString(" ")
    val dir = plantDocs("bloom", Seq(
      (0L, refText, "src0"),               // builds the filter
      (1L, refText, "src9"),               // exact re-send: every window must hit
      (2L, fresh, "src9")))                // fresh doc: only Bloom FPs may hit
    val got = Dedup.bloomDedup(spark, dir)
      .select("doc_id", "n_paras", "n_hits", "flagged")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    // Bloom contract: membership queries on inserted keys NEVER miss
    assert(got(1L)._2 == got(1L)._3 && got(1L)._4,
      s"re-sent doc must hit on every window: ${got(1L)}")
    val fpRate = got(2L)._3.toDouble / got(2L)._2
    assert(!got(2L)._4 && fpRate < 0.05,
      s"fresh doc false-positive rate $fpRate exceeds bound")
    val again = Dedup.bloomDedup(spark, dir)
      .select("doc_id", "n_paras", "n_hits", "flagged")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(again == got, "bloom dedup must be deterministic")
  }

  test("leakage-free split: no dup cluster straddles train and val (E47)") {
    val perCluster = Dedup.leakFreeSplit(spark, TestSpark.sf)
      .groupBy(col("keep_id"))
      .agg(countDistinct(col("split")).as("n_splits"), count(lit(1)).as("n"))
    assert(perCluster.filter(col("n_splits") =!= 1).count() == 0,
      "every cluster must land in exactly one split")
    val splits = Dedup.leakFreeSplit(spark, TestSpark.sf)
      .groupBy(col("split")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(splits.getOrElse("train", 0L) > 0 && splits.getOrElse("val", 0L) > 0,
      s"both splits must be populated at the 20% cluster rate, got $splits")
  }

  test("candidate-audit parks memoize per data fingerprint and invalidate on data change (E20e)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-candmemo").toString
    def writeDocs(n: Int): Unit =
      (0 until n).map(i => (i.toLong,
          s"alpha beta gamma delta epsilon zeta doc $i words repeat repeat", "web"))
        .toDF("doc_id", "text", "source")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    writeDocs(6)
    val audit1 = Dedup.dedupCandidateAudit(spark, dir)
      .select("n_docs", "n_buckets").as[(Long, Long)].head()
    assert(audit1._1 == 6)
    // second call on unchanged data: served from the memoized park,
    // identical numbers
    val audit1b = Dedup.dedupCandidateAudit(spark, dir)
      .select("n_docs", "n_buckets").as[(Long, Long)].head()
    assert(audit1b == audit1)
    // regenerate the table in place: the file-listing fingerprint must
    // change, so the memoized posting/bucket parks rebuild instead of
    // serving the 6-doc generation (the r13 nngraph stale-key lesson).
    // n_buckets comes FROM the park — unique per-doc texts mean more
    // docs strictly widen the bucket set, so a stale park would show.
    writeDocs(9)
    val audit2 = Dedup.dedupCandidateAudit(spark, dir)
      .select("n_docs", "n_buckets").as[(Long, Long)].head()
    assert(audit2._1 == 9, "n_docs must reflect the regenerated table")
    assert(audit2._2 > audit1._2,
      s"bucket park must be rebuilt from the new postings (${audit2._2} vs ${audit1._2})")
  }

  test("LSH planner: threshold monotone in bands; deployed 16x4 knee brackets 0.7 (E39)") {
    val rows = Dedup.lshPlanner(spark, TestSpark.sf)
      .select("bands", "rows_per_band", "s_threshold", "p_at_050", "p_at_090", "deployed")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5)))
    // more bands = lower S-curve threshold (strictly monotone)
    rows.sliding(2).foreach { case Array(a, b) => assert(a._3 > b._3, s"$a vs $b") }
    // the shipped 16x4 point: high-Jaccard pairs almost surely collide,
    // low-Jaccard pairs almost surely don't — the knee straddles 0.7
    val d = rows.find(_._6).get
    assert(d._1 == 16 && d._2 == 4)
    assert(d._3 > 0.4 && d._3 < 0.8, s"knee ${d._3}")
    assert(d._5 > 0.99, s"p@0.9 ${d._5}")
    assert(d._4 < 0.65, s"p@0.5 ${d._4}")
  }
}
