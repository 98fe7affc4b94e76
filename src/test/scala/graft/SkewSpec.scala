package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join is result-equivalent to the plain join under heavy skew") {
    // hot key: 90% of the big side is user 7
    val big = ((1 to 900).map(i => (7L, s"evt$i")) ++ (1 to 100).map(i => (i.toLong % 50, s"x$i")))
      .toDF("user_id", "payload")
    val small = (0L to 60L).map(u => (u, s"name$u")).toDF("user_id", "name")

    val plain = big.join(small, "user_id")
      .select("user_id", "payload", "name").as[(Long, String, String)].collect().sorted
    val salted = Skew.saltedJoin(big, small, "user_id", buckets = 8)
      .select("user_id", "payload", "name").as[(Long, String, String)].collect().sorted
    assert(salted.sameElements(plain))
    assert(plain.nonEmpty)

    // the hot key's rows really do spread across multiple salt buckets
    val spread = big.withColumn("s",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(8)))
      .filter(col("user_id") === 7).select("s").distinct().count()
    assert(spread > 4)
  }
}
