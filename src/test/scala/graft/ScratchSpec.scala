package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Scratch

/** The scratch-root contract: every engine-managed artifact (memoized
  * indexes, parked intermediates) must land under the configurable
  * shared root so a multi-node deployment can point it at HDFS/S3/NFS
  * — r13 wrote parks to the driver-local tmpdir unconditionally, which
  * scatters executor-written parquet across node-local disks.
  */
class ScratchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("scratch root defaults to tmpdir and follows spark.graft.scratch.dir") {
    assert(Scratch.root(spark) == sys.props("java.io.tmpdir"))
    val alt = java.nio.file.Files.createTempDirectory("graft-scratch-alt").toString
    spark.conf.set(Scratch.confKey, alt)
    try {
      assert(Scratch.root(spark) == alt)
      assert(Scratch.path(spark, "x") == s"$alt/x")
    } finally spark.conf.unset(Scratch.confKey)
    assert(Scratch.root(spark) == sys.props("java.io.tmpdir"))
  }

  test("a memoized index build lands under the configured scratch root") {
    val alt = java.nio.file.Files.createTempDirectory("graft-scratch-idx").toString
    spark.conf.set(Scratch.confKey, alt)
    try {
      val path = graft.operators.Similarity.ensureIvfIndex(spark, TestSpark.sf)
      assert(path.startsWith(alt), s"$path not under $alt")
      assert(new java.io.File(s"$path/_COMPLETE").exists())
      assert(new java.io.File(s"$path/cells").exists())
    } finally spark.conf.unset(Scratch.confKey)
  }
}
