package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Security

/** C74 — DLS/FLS enforcement contract. */
class SecuritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("DLS filter is total; denied fields are gone; masked field is one-way but stable") {
    val v = Security.readAs(spark, TestSpark.sf, "analyst")
    // no document outside the stored query is visible
    assert(v.filter(!col("event_type").isin("purchase", "view")).count() == 0)
    // FLS: the denied field does not exist on the secured frame at all
    assert(!v.columns.contains("props"))
    // masking: no raw id survives, but identity is preserved (stable
    // hash) so grouping/joining on the masked column still works
    val masked = v.select("user_id").as[String].collect()
    assert(masked.forall(s => s.length == 12 && s.forall("0123456789abcdef".contains(_))))
    // and none of them equals the raw id's own digits
    assert(!masked.exists(s => s.matches("[0-9]{1,4}")))
    val realDistinct = graft.sources.Tables.events(spark, TestSpark.sf)
      .filter(col("event_type").isin("purchase", "view"))
      .select(countDistinct(col("user_id"))).as[Long].head()
    assert(v.select(countDistinct(col("user_id"))).as[Long].head() == realDistinct)
  }

  test("the DLS predicate pushes into the parquet scan") {
    val v = Security.readAs(spark, TestSpark.sf, "oncall")
    val scan = v.queryExecution.executedPlan.toString()
    assert(scan.contains("PushedFilters") &&
      scan.contains("event_type"), s"plan:\n$scan")
    assert(v.filter(col("event_type") =!= "error").count() == 0)
  }

  test("unknown role is a driver-time error, not an open view") {
    intercept[IllegalArgumentException](Security.readAs(spark, TestSpark.sf, "intern"))
  }
}
