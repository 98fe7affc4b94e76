package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Pure-JVM audio codec for the multimodal pipeline (SURVEY §2 E12).
  *
  * `javax.sound.sampled` ships with the JDK (WAV/AIFF/AU readers — no
  * native libraries), so the audio half of the decode stage is REAL for
  * those containers: bytes → PCM samples → signal features (duration,
  * RMS level, peak, zero-crossing rate — the standard cheap features an
  * audio curation pass computes before expensive model scoring).
  * Compressed codecs (MP3/AAC/Opus) have no JDK decoder and fall back
  * to the caller's byte-level path — the same documented sandbox
  * boundary as ImageCodec's non-JDK formats.
  */
object AudioCodec {

  final case class AudioInfo(sampleRate: Float, channels: Int,
                             nSamples: Int, samples: Array[Double])

  /** bytes → mono-folded PCM in [-1,1], None for non-audio payloads.
    * 16-bit signed little/big-endian and 8-bit formats are handled —
    * the WAV shapes `AudioSystem` emits.
    */
  def decode(bytes: Array[Byte]): Option[AudioInfo] =
    try {
      val in: AudioInputStream =
        AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val frameSize = fmt.getFrameSize
        val data = in.readAllBytes()
        if (frameSize <= 0 || data.length < frameSize) None
        else {
          val nFrames = data.length / frameSize
          val ch = fmt.getChannels
          val bytesPerSample = fmt.getSampleSizeInBits / 8
          val big = fmt.isBigEndian
          val samples = new Array[Double](nFrames)
          var f = 0
          while (f < nFrames) {
            // fold channels to mono by averaging
            var acc = 0.0
            var c = 0
            while (c < ch) {
              val off = f * frameSize + c * bytesPerSample
              val v =
                if (bytesPerSample == 2) {
                  val (b0, b1) = (data(off) & 0xFF, data(off + 1) & 0xFF)
                  (if (big) (b0 << 8) | b1 else (b1 << 8) | b0).toShort / 32768.0
                } else (data(off) & 0xFF) / 128.0 - 1.0 // 8-bit unsigned
              acc += v
              c += 1
            }
            samples(f) = acc / ch
            f += 1
          }
          Some(AudioInfo(fmt.getSampleRate, ch, nFrames, samples))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  def durationSec(a: AudioInfo): Double = a.nSamples / a.sampleRate.toDouble

  def rms(a: AudioInfo): Double = {
    var s = 0.0; var i = 0
    while (i < a.samples.length) { s += a.samples(i) * a.samples(i); i += 1 }
    math.sqrt(s / math.max(a.samples.length, 1))
  }

  def peak(a: AudioInfo): Double = {
    var m = 0.0; var i = 0
    while (i < a.samples.length) { m = math.max(m, math.abs(a.samples(i))); i += 1 }
    m
  }

  /** Zero crossings per second — the cheap pitch/noisiness proxy. */
  def zeroCrossRate(a: AudioInfo): Double = {
    var n = 0; var i = 1
    while (i < a.samples.length) {
      if ((a.samples(i - 1) >= 0) != (a.samples(i) >= 0)) n += 1
      i += 1
    }
    n / math.max(durationSec(a), 1e-9)
  }

  /** Deterministic 16-bit mono WAV: a sine at freqHz scaled by amp.
    *
    * For whole-number freq and rate the phase is range-reduced EXACTLY
    * in integers ((freq·i) mod rate — one period of the sine) before
    * the one libm call, so `sin` only ever sees arguments in [0, 2π),
    * where implementations agree to ~1 ulp. Unreduced arguments grow
    * to thousands of radians, where each libm's own range reduction
    * differs enough across platforms that a sub-ulp disagreement can
    * move the int16 truncation — the cross-engine oracle
    * (Multimodal.multimodalMetaSql) replays this exact formula, so the
    * reduction is what makes the replay platform-robust rather than
    * ~1e-5-per-corpus flaky.
    *
    * ORACLE CONTRACT: the replica covers ONLY the whole-number-freq
    * branch (it truncates freq to BIGINT before the mod) — the media
    * table's pitch ladder (200 + (id%20)·40) is all-integer by
    * construction; a non-integer pitch takes the unreduced fallback
    * below, which the static SQL cannot mirror.
    */
  def syntheticWav(freqHz: Double, nSamples: Int,
                   sampleRate: Float = 8000f, amp: Double = 0.5): Array[Byte] = {
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val rate = sampleRate.toDouble
    val exactPhase = freqHz.isWhole && rate.isWhole
    val fL = freqHz.toLong
    val rL = math.max(rate.toLong, 1L)
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val angle =
        if (exactPhase) 2 * math.Pi * ((fL * i) % rL) / rate
        else 2 * math.Pi * freqHz * i / rate
      val v = (math.sin(angle) * amp * 32767).toInt
      pcm(i * 2) = (v & 0xFF).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val stream = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nSamples)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }
}
