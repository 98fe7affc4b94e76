package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{AudioCodec, ImageCodec}
import graft.sources.Tables

/** Multimodal (binary) column plumbing (SURVEY §2 E12).
  *
  * Models the media pipeline of a training-data system: an opaque
  * `binary` payload column + typed metadata, with decode/feature-extract
  * running as a per-partition batch transform (`mapPartitions`) — the
  * Spark shape under which a real decoder (image/audio libs, GPU
  * batches) would run. The decode step is REAL for JDK-decodable
  * formats (PNG/BMP/GIF via `javax.imageio` — see ImageCodec): bytes →
  * pixels → channel statistics / interpolating resample → re-encoded
  * payload. Payloads the JDK can't read (JPEG2000, video containers,
  * audio, and this table's synthesized text bytes) fall back to a
  * clearly-marked deterministic byte-level path — the production shape,
  * where a codec plugin handles what it can and flags the rest.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, kind: String, media: Array[Byte],
                      width: Int, height: Int, n_frames: Int)
  case class MediaFeature(doc_id: Long, kind: String, n_bytes: Int,
                          checksum: Long, feat_norm: Double)

  /** Synthesize the media table with REAL payloads where a JDK codec
    * exists: image rows carry an actual PNG (ImageCodec.syntheticPng),
    * audio rows an actual 16-bit WAV (AudioCodec.syntheticWav, pitch
    * and length varying by doc_id), video rows the document bytes (no
    * JDK video codec — the documented sandbox boundary). Payload
    * synthesis is partition-local codec work — the same mapPartitions
    * batch shape the decode stage uses.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // codec synthesis is per-row CPU work: run at compute parallelism,
    // not scan-split parallelism (one parquet file = one task)
    Tables.atComputeParallelism(
        Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val kind = (id % 3) match {
            case 0 => "image"; case 1 => "audio"; case _ => "video"
          }
          val width = (64 + id % 512).toInt
          val height = (64 + id % 256).toInt
          val media: Array[Byte] = kind match {
            case "image" => // BMP: real JDK codec, no deflate cost
              ImageCodec.syntheticBmp(math.min(width, 96), math.min(height, 96), id)
            case "audio" =>
              AudioCodec.syntheticWav(200.0 + (id % 20) * 40.0, (2000 + (id % 10) * 400).toInt)
            case _ => text.getBytes("UTF-8")
          }
          MediaRow(id, kind, media, width, height, (id % 30 + 1).toInt)
        }
      }.toDF()
  }

  /** Per-partition batch decode + feature extraction.
    *
    * JDK-decodable payloads (PNG/BMP/GIF) take the REAL path: decode to
    * pixels, feature = per-channel mean-intensity vector. Everything
    * else falls back to `decodeStub`'s byte-histogram feature. Both
    * paths share the batch shape — iterate the partition, emit one row
    * per item, no shuffle — and the payload checksum is byte-level in
    * both (it fingerprints the stored bytes, not the decoded pixels).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val (checksum, stubFeat) = decodeStub(r.media)
        // codec dispatch by sniffing: image readers, then audio
        // readers, then the byte-level fallback — a plugin chain
        val featNorm = ImageCodec.decode(r.media) match {
          case Some(img) =>
            math.sqrt(ImageCodec.channelMeans(img).map(x => x * x).sum)
          case None => AudioCodec.decode(r.media) match {
            case Some(a) =>
              val f = Array(AudioCodec.rms(a), AudioCodec.peak(a),
                AudioCodec.zeroCrossRate(a) / 1000.0, AudioCodec.durationSec(a))
              math.sqrt(f.map(x => x * x).sum)
            case None =>
              math.sqrt(stubFeat.map(x => x.toDouble * x).sum)
          }
        }
        MediaFeature(r.doc_id, r.kind, r.media.length, checksum, featNorm)
      }
    }.toDF()
  }

  /** The deterministic byte-level fallback for payloads no JDK codec
    * reads (also supplies the payload checksum for every row).
    */
  private def decodeStub(bytes: Array[Byte]): (Long, Array[Float]) = {
    val feat = new Array[Float](8)
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      sum = sum * 31 + (bytes(i) & 0xFF)
      feat(i % 8) += (bytes(i) & 0xFF) / 255.0f
      i += 1
    }
    (sum, feat)
  }

  case class Resized(doc_id: Long, kind: String, media: Array[Byte],
                     width: Int, height: Int)

  /** Resize stage: scale each image payload to `targetW`×`targetH`.
    *
    * Decodable payloads take the REAL path: decode → area-averaging
    * resample (ImageCodec.resample — deterministic pixel arithmetic)
    * → PNG re-encode. Undecodable payloads fall back to
    * nearest-neighbor sampling over the raw byte buffer, which keeps
    * the proportional-shrink contract (output bytes scale with
    * target/source area). Both paths are partition-local (no shuffle)
    * — exactly how a batch image-resize stage feeds a
    * fixed-input-size trainer.
    */
  def resize(spark: SparkSession, media: DataFrame,
             targetW: Int = 32, targetH: Int = 32): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select(col("doc_id"), col("kind"), col("media"), col("width"), col("height"))
      .as[(Long, String, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, kind, bytes, w, h) =>
          ImageCodec.decode(bytes) match {
            case Some(img) =>
              Resized(id, kind,
                ImageCodec.encodePng(ImageCodec.resample(img, targetW, targetH)),
                targetW, targetH)
            case None =>
              val srcArea = math.max(w.toLong * h, 1L)
              val outLen = math.max(
                (bytes.length.toLong * targetW * targetH / srcArea).toInt, 1)
              val out = new Array[Byte](math.min(outLen, bytes.length))
              var i = 0
              while (i < out.length) {
                // nearest-neighbor over the byte buffer (fallback resampler)
                out(i) = bytes((i.toLong * bytes.length / out.length).toInt)
                i += 1
              }
              Resized(id, kind, out, targetW, targetH)
          }
        }
      }.toDF()
  }

  case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Frame sampling: split each "video" payload into n_frames equal
    * byte slices and keep every `stride`-th frame — the batch shape of
    * a real decode-and-sample stage (STUB decode, real plumbing: one
    * output row per sampled frame, partition-local, no shuffle).
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int = 2): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("doc_id"), col("media"), col("n_frames"))
      .as[(Long, Array[Byte], Int)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes, nFrames) =>
          val frameLen = math.max(bytes.length / math.max(nFrames, 1), 1)
          (0 until nFrames by stride).iterator
            .map { i =>
              val from = math.min(i * frameLen, bytes.length)
              val until = if (i == nFrames - 1) bytes.length
                          else math.min(from + frameLen, bytes.length)
              Frame(id, i, java.util.Arrays.copyOfRange(bytes, from, until))
            }
            .filter(_.frame_bytes.nonEmpty)
        }
      }.toDF()
  }

  /** Media-table location for a data dir (under java.io.tmpdir, never
    * inside the read-only data dir; versioned key like the IVF and
    * inverted indexes).
    */
  def mediaPath(dir: String): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    new java.io.File(sys.props("java.io.tmpdir"), s"graft-media-v1-$key").getPath
  }

  /** Synthesize-once: the media table is a stand-in for a STORED input
    * (a real pipeline reads payload bytes from object storage, it does
    * not synthesize them per query). Write it per data dir on first
    * use; every later query decodes the stored payloads — so the E12
    * query times codec decode, not payload synthesis.
    */
  def ensureMediaTable(spark: SparkSession, dir: String): String = {
    val path = mediaPath(dir)
    val marker = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker))
      mediaTable(spark, dir).write.mode("overwrite").parquet(path)
    path
  }

  // ---- E90: perceptual image dedup (aHash) ---------------------------

  case class ImgHash(doc_id: Long, ahash: Long)

  /** Synthetic image corpus for the perceptual-dedup path: every doc
    * renders the pattern of its `doc_id % 40` family, brightness-shifted
    * per member (aHash-invariant by design) and, for every fifth doc, an
    * 8×8 corner patch (flips ~1 hash bit) — exact-dup families with
    * planted near-dup members and 40 distinct base patterns.
    */
  private def syntheticVariant(id: Long): Array[Byte] = {
    val img = ImageCodec.decode(ImageCodec.syntheticBmp(64, 64, id % 40)).get
    val shift = ((id % 7) * 3).toInt
    var y = 0
    while (y < 64) {
      var x = 0
      while (x < 64) {
        val p = img.getRGB(x, y)
        def ch(v: Int) = math.min(v + shift, 255)
        img.setRGB(x, y,
          (ch((p >> 16) & 0xFF) << 16) | (ch((p >> 8) & 0xFF) << 8) | ch(p & 0xFF))
        x += 1
      }
      y += 1
    }
    if (id % 5 == 0) {
      var py = 0
      while (py < 8) { var px = 0; while (px < 8) { img.setRGB(px, py, 0); px += 1 }; py += 1 }
    }
    ImageCodec.encodeBmp(img)
  }

  /** E90 — near-duplicate image detection by perceptual hash (the
    * image-side sibling of E3 SimHash: decode → aHash64 → banded
    * Hamming join; the multimodal-corpus dedup step every image
    * training set runs). Candidate generation is the pigeonhole band
    * trick — 4×16-bit bands, a pair within Hamming ≤ 3 MUST share a
    * band — so no all-pairs kernel exists at any scale; band buckets
    * carry a declared skew cap (oversized buckets are boilerplate
    * patterns, dropped like E2's). Decode+hash is partition-local
    * codec work at compute parallelism; the output is the bounded
    * Hamming histogram with sample pairs.
    */
  def imageDedup(spark: SparkSession, dir: String,
                 maxHamming: Int = 3, bucketCap: Int = 1000): DataFrame = {
    import spark.implicits._
    val hashes = Tables.atComputeParallelism(
        Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val img = ImageCodec.decode(syntheticVariant(id)).get
          ImgHash(id, ImageCodec.aHash64(img))
        }
      }.toDF()
    val bands = hashes.select(col("doc_id"), col("ahash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("ahash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bkey"))): _*)).as("bk"))
      .select(col("doc_id"), col("ahash"), col("bk.band"), col("bk.bkey"))
    val small = bands.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("bn")).filter(col("bn") <= bucketCap)
      .select(col("band"), col("bkey"))
    val capped = bands.join(small, Seq("band", "bkey"))
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.ahash").bitwiseXOR(col("b.ahash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
    pairs.groupBy(col("hamming"))
      .agg(count(lit(1)).as("n_pairs"),
        min(struct(col("doc_a"), col("doc_b"))).as("s"))
      .select(col("hamming"), col("n_pairs"),
        col("s.doc_a").as("sample_a"), col("s.doc_b").as("sample_b"))
      .orderBy(col("hamming"))
  }

  /** E12 query surface: metadata + extracted features, deterministic. */
  def features(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(spark,
        Tables.atComputeParallelism(
          spark.read.parquet(ensureMediaTable(spark, dir))))
      .select(col("doc_id"), col("kind"), col("n_bytes"), col("checksum"),
        round(col("feat_norm"), 4).as("feat_norm"))
      .orderBy(col("doc_id"))
}
