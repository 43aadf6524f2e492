package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** The header parsers against REAL encoders: bytes produced by the JDK's
  * own PNG writer (ImageIO) and WAV writer (javax.sound) — not our
  * synthesized fixtures — must parse to the dimensions/rates the encoder
  * was asked for. This pins the offsets to the actual container specs,
  * shrinking the multimodal stub boundary to pixel decoding only.
  */
class MediaHeaderSpec extends AnyFunSpec with SparkTestBase {

  private def realPng(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff8800) // non-trivial content
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def realWav(sampleRate: Float, bits: Int, channels: Int): Array[Byte] = {
    val fmt = new AudioFormat(sampleRate, bits, channels, true, false)
    val frames = 32
    val data = new Array[Byte](frames * fmt.getFrameSize)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  it("parses width/height/bit-depth from ImageIO-encoded PNGs") {
    import spark.implicits._
    val rows = Seq((1L, realPng(123, 45)), (2L, realPng(640, 480)))
      .toDF("id", "payload")
      .withColumn("hx", hex(col("payload")))
      .select(col("id"), Multimodal.pngMagicOk(col("hx")).as("ok"),
        Multimodal.pngWidth(col("hx")).as("w"),
        Multimodal.pngHeight(col("hx")).as("h"),
        Multimodal.pngBitDepth(col("hx")).as("d"))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows(1L) == ((true, 123L, 45L, 8L)))
    assert(rows(2L) == ((true, 640L, 480L, 8L)))
  }

  it("parses channels/sample-rate/bits from javax.sound-encoded WAVs") {
    import spark.implicits._
    val rows = Seq((1L, realWav(16000f, 16, 2)), (2L, realWav(44100f, 8, 1)))
      .toDF("id", "payload")
      .withColumn("hx", hex(col("payload")))
      .select(col("id"), Multimodal.wavMagicOk(col("hx")).as("ok"),
        Multimodal.wavChannels(col("hx")).as("ch"),
        Multimodal.wavSampleRate(col("hx")).as("sr"),
        Multimodal.wavBitsPerSample(col("hx")).as("b"))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows(1L) == ((true, 2L, 16000L, 16L)))
    assert(rows(2L) == ((true, 1L, 44100L, 8L)))
  }

  it("rejects non-matching magic (a text payload is neither PNG nor WAV)") {
    import spark.implicits._
    val r = Seq((1L, "plain text, definitely not a container".getBytes))
      .toDF("id", "payload")
      .withColumn("hx", hex(col("payload")))
      .select(Multimodal.pngMagicOk(col("hx")).as("p"),
        Multimodal.wavMagicOk(col("hx")).as("w"))
      .collect().head
    assert(!r.getBoolean(0) && !r.getBoolean(1))
  }
}
