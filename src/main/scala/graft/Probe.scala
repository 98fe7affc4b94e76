package graft

import org.apache.spark.sql.SparkSession

/** Scratch timing harness for local iteration (not part of the driver
  * contract): times one named query N times at a given SF dir and
  * prints per-run wall-clock so a hot spot can be bisected.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      System.gc()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[probe] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
