package graft

import org.apache.spark.sql.SparkSession

/** One-stop session factory with graft's recommended configuration —
  * what a library user calls instead of hand-assembling confs.
  */
object GraftSession {
  def builder(master: String = "local[*]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      // local-mode default; a real cluster raises this (or lets AQE
      // coalesce) — never leave Spark's 200 default on a laptop
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // the driver-generated events table uses parquet TIMESTAMP(NANOS)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // native expressions available from SQL without registration calls
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // static conf (must precede session creation): the generated-class
      // cache defaults to 100 entries — query batteries the size of this
      // library's thrash it (~+0.1 s per small query once exceeded)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")

  def get(master: String = "local[*]"): SparkSession = {
    val s = builder(master).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
