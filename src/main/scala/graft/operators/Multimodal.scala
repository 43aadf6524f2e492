package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads are opaque `binary` columns
  * with a typed metadata struct travelling alongside. The decode step is a
  * STUB (no image/audio codecs in this container) — deliberately
  * deterministic so the surrounding Spark plumbing (schema, batch shape,
  * partition-preserving mapPartitions) is real and testable.
  *
  * Scale notes: payloads never leave their partition (no shuffle in the
  * decode path); metadata extraction is pure projection, so Parquet scans
  * prune to exactly the columns touched.
  */
object Multimodal {

  /** Opaque media record: id + raw payload bytes + source tag. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], source: String)

  /** Typed decode output. Width/height/n_frames come from the stub codec. */
  case class MediaFeatures(
      doc_id: Long,
      byte_len: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      frame_hashes: Seq[String])

  /** Documents re-cast as opaque binary payloads (stand-in for real blobs). */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"), col("source"))
      .as[MediaRecord]
  }

  /** STUB decode: a deterministic fake codec. Real plumbing, fake pixels.
    * Runs partition-locally via mapPartitions — the shape a real decoder
    * (batched JNI / native call) would use; swap `decodeOne` for the codec.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition "codec" init would happen here (once, not per record)
      it.map(decodeOne)
    }
  }

  /** Batched decode: groups records into fixed-size batches inside each
    * partition — the call shape a vectorized codec (JNI / Arrow batch
    * API) needs, mirroring what `mapInPandas` gives Python users — then
    * decodes each batch. Same results as [[decodeFeatures]]
    * (spec-checked); payloads still never leave their partition.
    */
  def decodeFeaturesBatched(
      media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real codec would decode the whole `batch` in one native call
        batch.map(decodeOne)
      }
    }
  }

  /** ---- STUB: deterministic fake decode (no codecs in container). ---- */
  private def decodeOne(m: MediaRecord): MediaFeatures = {
    val len = m.payload.length
    val nFrames = math.max(1, len / 100)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = (0 until math.min(nFrames, 3)).map { f =>
      val start = f * (len / math.max(nFrames, 1))
      val end = math.min(len, start + 16)
      md.reset()
      md.digest(java.util.Arrays.copyOfRange(m.payload, start, end))
        .map(b => f"$b%02x").mkString
    }
    MediaFeatures(m.doc_id, len, 16 + len % 640, 16 + len % 480, nFrames, hashes)
  }

  /** Oracle-checked metadata extraction over the binary payload: byte
    * length, header hash, 3 deterministic "frame sample" chunk hashes,
    * and ENDIAN-AWARE fixed-offset header fields (pure SQL arithmetic so
    * DuckDB reproduces it exactly).
    *
    * The header fields are the real media-metadata capability: every
    * container format (PNG IHDR, WAV fmt, MP4 boxes) stores dimensions /
    * sample rates as fixed-offset integers, so width-at-offset-N parses
    * as a declarative byte expression fused into the scan — no codec, no
    * UDF, nothing leaves codegen. Payload bytes here are ASCII, so
    * byte(i) == ascii(char i) in both engines; on true binary the same
    * shape uses substring-on-binary + conv(hex). `magic_u32_be` reads
    * bytes 1-4 big-endian, `version_u16_le` bytes 5-6 little-endian.
    */
  def qMultimodalMeta(s: SparkSession, dir: String): DataFrame = {
    val chunks = (0 until 3).map(i =>
      md5(expr(s"substring(text, CAST(1 + $i * (length(text) div 4) AS INT), 16)")).as(s"chunk$i"))
    def byteAt(i: Int) = ascii(substring(col("text"), i, 1)).cast("long")
    val magic = (((byteAt(1) * 256 + byteAt(2)) * 256 + byteAt(3)) * 256 + byteAt(4))
      .as("magic_u32_be")
    val version = (byteAt(5) + byteAt(6) * 256).as("version_u16_le")
    Tables.documents(s, dir)
      .select(Seq(
        col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("byte_len"),
        md5(substring(col("text"), 1, 32)).as("header_hash"),
        magic, version) ++ chunks: _*)
      .orderBy("doc_id")
  }

  val oracleMultimodalMeta: String = {
    val chunks = (0 until 3).map(i =>
      s"md5(substring(text, 1 + $i * (length(text) // 4), 16)) AS chunk$i").mkString(", ")
    def byteAt(i: Int) = s"CAST(ascii(substring(text, $i, 1)) AS BIGINT)"
    s"""SELECT doc_id,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       |  md5(substring(text, 1, 32)) AS header_hash,
       |  (((${byteAt(1)} * 256 + ${byteAt(2)}) * 256 + ${byteAt(3)}) * 256 + ${byteAt(4)}) AS magic_u32_be,
       |  (${byteAt(5)} + ${byteAt(6)} * 256) AS version_u16_le,
       |  $chunks
       |FROM documents ORDER BY doc_id""".stripMargin
  }
}
