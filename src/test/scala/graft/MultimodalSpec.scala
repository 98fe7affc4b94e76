package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("media table carries binary payload + typed metadata") {
    val m = Multimodal.mediaTable(spark, TestSpark.sf)
    assert(m.schema("media").dataType.typeName == "binary")
    val kinds = m.select("kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic and byte-length preserving") {
    val f1 = Multimodal.features(spark, TestSpark.sf).collect()
    val f2 = Multimodal.features(spark, TestSpark.sf).collect()
    assert(f1.sameElements(f2))
    // n_bytes equals the document length (ascii text payload)
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), length(col("text")).as("n")).as[(Long, Int)].collect().toMap
    f1.foreach(r => assert(r.getAs[Int]("n_bytes") == docs(r.getAs[Long]("doc_id"))))
  }

  test("frame sampling reassembles to a prefix-consistent byte slicing") {
    val media = Multimodal.mediaTable(spark, TestSpark.sf)
    val frames = Multimodal.sampleFrames(spark, media, stride = 1)
    // stride=1: concatenating all frames restores the original payload
    val rebuilt = frames.orderBy("doc_id", "frame_idx")
      .as[Multimodal.Frame].collect()
      .groupBy(_.doc_id).view.mapValues(_.sortBy(_.frame_idx).flatMap(_.frame_bytes).toSeq).toMap
    val original = media.filter(col("kind") === "video")
      .select("doc_id", "media").as[(Long, Array[Byte])].collect().toMap
    assert(rebuilt.keySet == original.keySet)
    rebuilt.foreach { case (id, bytes) => assert(bytes == original(id).toSeq, s"doc $id") }
    // stride=2 keeps roughly half the frames
    val n1 = frames.count()
    val n2 = Multimodal.sampleFrames(spark, media, stride = 2).count()
    assert(n2 < n1 && n2 > 0)
  }
}
