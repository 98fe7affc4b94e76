package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the given SF dir and
  * emits EXACTLY ONE compact JSON line as the last thing on stdout.
  *
  * The driver parses that line from a FINITE tail-capture of process
  * output — a ~2.2 KB line lost its head once the query count grew, so
  * the line is kept aggressively small:
  *   - per-query values are INTEGER MILLISECONDS; the headline `value`
  *     stays in seconds per the driver contract;
  *   - the line carries values ONLY: `"qv":[…]` holds the integer-ms
  *     medians in sorted-query-name order and `"nq"` the count (a
  *     parse sanity check). Query names are recoverable by sorting
  *     `SparkEntry.queries.keys`; `bench_out.json` is the
  *     authoritative name→seconds map. History: a per-query object
  *     crossed ~1.57 KB at 147 queries → two-array `qk`/`qv` form;
  *     at 182 queries that form neared its ~1.6 KB envelope → `qk`
  *     dropped (this step was pre-decided in round 6). ~4.6 B/entry:
  *     headroom to 300+ queries.
  * The FULL names and 3-decimal-second timings are always written to
  * `bench_out.json` in the working directory as the lossless copy, and
  * the line is printed after `spark.stop()` so no log output follows it.
  *
  * A query whose every rep throws reports -1 (ms) and contributes 0 to
  * the total — a broken query must look broken, not fast.
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
      // static conf, must precede session creation: the generated-class
      // cache defaults to 100 entries — thrashing at 152 queries × many
      // codegen stages each (measured: ~+0.1-0.15 s additive on every
      // small query once the battery outgrew the cache)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
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
    val onlyWarm = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).toSet).filter(_.nonEmpty)
    if (warmDir != sfDir)
      SparkEntry.queries.foreach { case (n, fn) =>
        if (onlyWarm.forall(_.contains(n)))
          try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    graft.sources.Tables.all.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    // Each query is timed REPS times and the MEDIAN of SUCCESSFUL runs is
    // reported: a single sample per query proved untrustworthy (an 11x
    // swing was observed on byte-identical code between two runs — GC
    // debt from earlier queries and JIT/AQE variance land on whichever
    // query is unlucky). A GC before each query's runs keeps one query's
    // garbage from being charged to the next one's wall-clock.
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS")
      .flatMap(s => scala.util.Try(s.toInt).toOption).filter(_ > 0).getOrElse(3)
    // Diagnostic subset (comma-separated names): times ONLY those
    // queries — for isolating battery-interaction effects (JIT/code
    // cache). Never set by the driver; full battery is the default.
    val only = onlyWarm
    val battery = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results: Seq[(String, Option[Double])] =
      battery.map { case (name, fn) =>
        System.gc()
        val times = (1 to reps).flatMap { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
          catch { case _: Throwable => None }
        }.sorted
        name -> (if (times.isEmpty) None else Some(times(times.length / 2)))
      }
    // Round-6's pre-decided step, taken at 182 entries (the two-array
    // form would cross its ~1.6 KB envelope near 185): `qk` is DROPPED
    // from stdout — `qv` carries the integer-ms medians in sorted-name
    // order plus an `nq` count as a parse sanity check, and the keys
    // are recoverable as the sorted query names (exactly how `battery`
    // is built above). ~8.3 B/entry → ~4.6: headroom to 300+ queries.
    // bench_out.json remains the lossless full-name, 3-decimal copy.
    val qv = results.map { case (_, v) =>
      v.map(t => math.round(t * 1000).toString).getOrElse("-1")
    }.mkString("[", ",", "]")
    val total = ms3(results.flatMap(_._2).sum)
    val sfNum = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1)).getOrElse("0")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","nq":${results.length},"qv":$qv,"sf":$sfNum}"""
    // Lossless copy on disk: FULL query names, seconds at 3 decimals.
    try {
      val fullQs = results.map { case (name, v) =>
        "\"" + name + "\":" + v.map(t => ms3(t).toString).getOrElse("-1")
      }.mkString("{", ",", "}")
      val w = new java.io.PrintWriter("bench_out.json")
      try w.println(
        s"""{"metric":"total","value":$total,"unit":"sec","queries":$fullQs,"sf":$sfNum}""")
      finally w.close()
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
