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
