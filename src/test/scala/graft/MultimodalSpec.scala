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

  test("resize scales payload bytes proportionally to target area and is deterministic") {
    val media = Multimodal.mediaTable(spark, TestSpark.sf)
    def canon(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Array[Byte]]("media").toSeq))
      .sortBy(_._1)
    val r1 = Multimodal.resize(spark, media, 32, 32).collect()
    val r2 = Multimodal.resize(spark, media, 32, 32).collect()
    assert(r1.nonEmpty)
    assert(canon(r1).sameElements(canon(r2)))
    val srcDims = media.filter(col("kind") === "image")
      .select(col("doc_id"), col("media"), col("width"), col("height"))
      .as[(Long, Array[Byte], Int, Int)].collect()
      .map(t => t._1 -> t).toMap
    r1.foreach { row =>
      val id = row.getAs[Long]("doc_id")
      val (_, bytes, w, h) = srcDims(id)
      assert(row.getAs[Int]("width") == 32 && row.getAs[Int]("height") == 32)
      val expected = math.min(
        math.max((bytes.length.toLong * 32 * 32 / (w.toLong * h)).toInt, 1),
        bytes.length)
      assert(row.getAs[Array[Byte]]("media").length == expected, s"doc $id")
    }
  }

  test("real PNG payloads decode through the feature pipeline (javax.imageio path)") {
    import graft.functions.ImageCodec
    // a genuine PNG payload, synthesized deterministically
    val png = ImageCodec.syntheticPng(48, 32, seed = 7L)
    val img = ImageCodec.decode(png).get
    assert(img.getWidth == 48 && img.getHeight == 32)
    val rows = Seq(Multimodal.MediaRow(1L, "image", png, 48, 32, 1)).toDF()
    val out = Multimodal.extractFeatures(spark, rows).collect().head
    // the feature is computed from DECODED PIXELS, not payload bytes:
    // it must equal the norm of the channel-mean vector exactly
    val expected = math.sqrt(ImageCodec.channelMeans(img).map(x => x * x).sum)
    assert(out.getAs[Double]("feat_norm") == expected)
    assert(out.getAs[Int]("n_bytes") == png.length)
  }

  test("real PNG resize decodes, area-resamples, and re-encodes") {
    import graft.functions.ImageCodec
    val png = ImageCodec.syntheticPng(64, 64, seed = 11L)
    val rows = Seq(Multimodal.MediaRow(2L, "image", png, 64, 64, 1)).toDF()
    val out = Multimodal.resize(spark, rows, 16, 16).collect().head
    val decoded = ImageCodec.decode(out.getAs[Array[Byte]]("media")).get
    assert(decoded.getWidth == 16 && decoded.getHeight == 16)
    // area-averaging preserves overall brightness within integer-floor
    // error: compare channel means of source and resampled image
    val srcMeans = ImageCodec.channelMeans(ImageCodec.decode(png).get)
    val dstMeans = ImageCodec.channelMeans(decoded)
    srcMeans.zip(dstMeans).foreach { case (s, d) =>
      assert(math.abs(s - d) < 0.02, s"channel mean drifted: $s vs $d")
    }
    // determinism: same input → byte-identical PNG
    val again = Multimodal.resize(spark, rows, 16, 16).collect().head
    assert(out.getAs[Array[Byte]]("media").toSeq ==
      again.getAs[Array[Byte]]("media").toSeq)
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
