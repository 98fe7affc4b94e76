package graft.sources

import org.apache.spark.sql.SparkSession

/** Resolution point for every engine-managed scratch artifact: the
  * memoized index builds (IVF / PQ / NN-graph / inverted index /
  * rollup / media / canonical-labels) and the parked corpus-sized
  * intermediates (Dedup.parkTemp / ensurePark).
  *
  * These artifacts are written and read by SPARK JOBS — executor
  * tasks on a multi-node cluster — so the root must be a filesystem
  * every node and the driver can see. `java.io.tmpdir` is only that
  * in local mode; a driver-local path on a real cluster means each
  * executor writes its task's files to its own disk and the read-back
  * sees partial or no data. Deployments set `spark.graft.scratch.dir`
  * to a shared location (HDFS / S3 / NFS — the same class of path as
  * the Spark checkpoint dir); the tmpdir default keeps zero-config
  * local runs working.
  */
object Scratch {

  val confKey = "spark.graft.scratch.dir"

  def root(spark: SparkSession): String =
    spark.conf.get(confKey, sys.props("java.io.tmpdir"))

  /** `<root>/<name>` composed URI-safely (the root may be an
    * `hdfs://`/`s3a://` URI, which `java.io.File` would mangle).
    */
  def path(spark: SparkSession, name: String): String =
    new org.apache.hadoop.fs.Path(root(spark), name).toString
}
