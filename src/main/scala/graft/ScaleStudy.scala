package graft

import org.apache.spark.sql.SparkSession

/** §8 scaling-study harness for the dedup tail (local iteration tool,
  * not part of the driver contract): prints the winnowing candidate
  * statistics of the PRODUCTION (xxhash64) pipeline plus wall times for
  * the two heaviest entries (q_dedup_lcs, q_dedup_substring) at a given
  * SF dir. Run at sf0.1 and a GenScale sf1 to measure the candidate-
  * growth curve behind the "winnowing prune" claim:
  *
  *   sbt "runMain graft.GenScale /root/testdata/sf0.1 /tmp/graft_data/sf1 10"
  *   sbt "runMain graft.ScaleStudy /root/testdata/sf0.1"
  *   sbt "runMain graft.ScaleStudy /tmp/graft_data/sf1"
  */
object ScaleStudy {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional second arg: comma-separated query names to time instead
    // of the default dedup-tail pair (candidate stats print only for
    // the default run — they belong to the winnowing study)
    val names = if (args.length > 1) args(1).split(",").toSeq
                else Seq("q_dedup_lcs", "q_dedup_substring")
    // `recall` mode (r13, VERDICT #6): measure every ANN scale path's
    // recall@5 against the exact brute-force baseline AT THIS SF, so
    // index-quality claims track data growth instead of resting on the
    // sf0.01 spec pins alone. §8k records the sf0.1 numbers.
    if (names == Seq("recall")) {
      def pairs(name: String): Set[(Long, Long)] =
        SparkEntry.queries(name)(spark, sfDir)
          .select("q_id", "n_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val base = pairs("q_ann_topk")
      Seq("q_ann_lsh", "q_ann_ivf", "q_ann_sq", "q_ann_bq", "q_ann_pq",
          "q_ann_ivfpq", "q_ann_graph", "q_ann_graph_hr").foreach { n =>
        val r = pairs(n).intersect(base).size.toDouble / base.size
        println(f"[scale] $sfDir recall@5 $n: $r%.3f")
      }
      spark.stop()
      return
    }
    if (args.length <= 1) {
      val stats = graft.operators.Dedup.candidateStats(
        graft.sources.Tables.documents(spark, sfDir)).collect().head
      println(s"[scale] $sfDir candidateStats: " +
        stats.schema.fieldNames.zip(stats.toSeq).map { case (n, v) => s"$n=$v" }
          .mkString(", "))
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      System.gc()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[scale] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
