package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the given SF dir and
  * emits EXACTLY ONE compact JSON line as the last thing on stdout.
  *
  * The driver parses that line from captured process output, and its
  * capture window is finite — so timings are rounded to milliseconds
  * (3 decimals, shortest-round-trip toString keeps them short), the line
  * is printed after `spark.stop()` so no log output can follow it, and
  * the same JSON is also written to `bench_out.json` in the working
  * directory as a redundant, truncation-proof copy.
  */
object Bench {
  private def ms3(v: Double): Double = math.round(v * 1000) / 1000.0

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Warm the JVM before timing: codegen compilation, classloading, and
    // the page cache dominate a fresh-JVM first pass. Run the full query
    // battery untimed at the smallest available SF (cheap — the data is
    // 100x smaller), then count the tables at the target SF. What's
    // timed below is steady-state execution, not JIT startup.
    val warmDir = {
      val p = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (p.isDirectory && p.getPath != sfDir) p.getPath else sfDir
    }
    if (warmDir != sfDir)
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    graft.sources.Tables.all.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    // Each query is timed REPS times and the MEDIAN is reported: a single
    // sample per query proved untrustworthy (an 11x swing was observed on
    // byte-identical code between two runs — GC debt from earlier queries
    // and JIT/AQE variance land on whichever query is unlucky). A GC+pause
    // before each query's runs keeps one query's garbage from being
    // charged to the next one's wall-clock.
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt).getOrElse(3)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      System.gc()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(times.length / 2)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + ms3(v) }
      .mkString("{", ",", "}")
    val total = ms3(results.map(_._2).sum)
    val sfNum = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1)).getOrElse("0")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":$sfNum}"""
    // Redundant full copy on disk (survives any stdout truncation).
    try {
      val w = new java.io.PrintWriter("bench_out.json")
      try w.println(line) finally w.close()
    } catch { case _: Throwable => () }
    // Stop Spark BEFORE printing so its shutdown logging (if any escapes
    // the ERROR level) cannot land after the JSON line in the capture.
    spark.stop()
    println(line)
    System.out.flush()
    // Give any output-forwarding thread (sbt StdoutOutput pump) a moment
    // to drain before the JVM exits.
    Thread.sleep(300)
  }
}
