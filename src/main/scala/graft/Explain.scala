package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan audit: dump explain("formatted") of every query to a file,
  * PLUS a machine-readable `<outFile>.audit.json` with per-query
  * counts of the plan shapes the scale contract cares about
  * (CartesianProduct, BroadcastNestedLoopJoin, exchanges, scans) —
  * `tools/check_plans.py` gates on it, so "0 CartesianProduct, BNLJ
  * only in the documented classes" is an enforced artifact instead of
  * a round-close narrative.
  * Usage: runMain graft.Explain <sfDir> <outFile>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outFile = args.lift(1).getOrElse("/tmp/explains.txt")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    val audit = new StringBuilder
    def count(plan: String, token: String): Int =
      token.r.findAllIn(plan).size
    SparkEntry.queries.toSeq.sortBy(_._1).zipWithIndex.foreach { case ((name, fn), i) =>
      sb.append(s"\n===================== $name =====================\n")
      val plan =
        try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"EXPLAIN FAILED: ${e.getMessage}" }
      sb.append(plan)
      if (i > 0) audit.append(",\n")
      audit.append(s""" "$name": {"cartesian": ${count(plan, "CartesianProduct")},""" +
        s""" "bnlj": ${count(plan, "BroadcastNestedLoopJoin")},""" +
        s""" "exchanges": ${count(plan, "Exchange")},""" +
        s""" "scans": ${count(plan, "Scan parquet")},""" +
        s""" "failed": ${plan.startsWith("EXPLAIN FAILED")}}""")
    }
    Files.writeString(Paths.get(outFile), sb.toString)
    Files.writeString(Paths.get(outFile + ".audit.json"),
      "{\n" + audit.toString + "\n}\n")
    spark.stop()
  }
}
