package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media
  * payloads travel as opaque `binary` columns with typed metadata, and
  * decode / feature-extraction / resize / frame-sampling run as typed
  * `mapPartitions` batch stages (the Scala analogue of `mapInPandas`:
  * one decoder instantiation per partition, records streamed through).
  *
  * The decode step is a STUB: real image/audio codecs are not available
  * in this environment, so [[Codec.decode]] derives deterministic fake
  * dimensions/features from an md5 of the payload bytes. Everything
  * around it — schema, binary transport, partitioning, batch shape,
  * feature output — is real and tested, and the determinism lets the
  * DuckDB oracle verify the full pipeline end-to-end (`mm_features`).
  */
object Multimodal {

  /** A media record: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      modality: String, // image | audio | video
      payload: Array[Byte],
      source: String)

  /** Decoded per-record features (stub decoder output). */
  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      byte_len: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      feat0: Double,
      feat7: Double)

  /** The stub "codec". In production this object would wrap the native
    * decoder handle created once per partition (expensive init amortized
    * across the partition's records — the reason decode runs in
    * `mapPartitions`, not per-row UDFs).
    */
  object Codec {
    private def md5hex(bytes: Array[Byte]): String = {
      val d = MessageDigest.getInstance("MD5").digest(bytes)
      d.map(b => f"$b%02x").mkString
    }
    private def hex(h: String, from: Int, len: Int): Long =
      java.lang.Long.parseLong(h.substring(from, from + len), 16)

    /** Deterministic fake decode: dimensions and an 8-dim feature vector
      * derived from the payload digest. Real decode would be `???` here;
      * the fake keeps the pipeline testable end-to-end.
      */
    def decode(r: MediaRecord): MediaFeatures = {
      val h = md5hex(r.payload)
      val frames = r.modality match {
        case "image" => 1L
        case "audio" => 1L + hex(h, 8, 4) % 1000L // "samples/1k"
        case _       => 1L + hex(h, 8, 4) % 240L  // "video frames"
      }
      MediaFeatures(
        r.media_id, r.modality,
        byte_len = r.payload.length.toLong,
        width = 16L + hex(h, 0, 4) % 1920L,
        height = 16L + hex(h, 4, 4) % 1080L,
        n_frames = frames,
        feat0 = hex(h, 16, 2).toDouble / 255.0,
        feat7 = hex(h, 30, 2).toDouble / 255.0)
    }
  }

  /** Build the media table from `documents`: payload = UTF-8 bytes of
    * the text (stand-in for real image/audio bytes), modality assigned
    * round-robin by doc_id. Deterministic → oracle-reproducible.
    */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    graft.core.Tables(s, dir).documents
      .select(
        $"doc_id".as("media_id"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          ($"doc_id" % 3 + 1).cast("int")).as("modality"),
        encode($"text", "UTF-8").as("payload"),
        $"source")
      .as[MediaRecord]
  }

  /** Decode stage: one codec per partition, records streamed through. */
  def decodeAll(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real pipeline: val codec = NativeCodec.open(...) — once per task
      it.map(Codec.decode)
    }
  }

  /** Resize stage: fit decoded dimensions into a target box preserving
    * aspect ratio (integer arithmetic → deterministic, oracle-checkable).
    * In production the pixel resampling would run next to the decoder in
    * the same mapPartitions stage; the dimension math is the real part.
    */
  def resizeTo(feats: Dataset[MediaFeatures], boxW: Long, boxH: Long): DataFrame = {
    import feats.sparkSession.implicits._
    // scale = min(boxW/w, boxH/h) in exact rational form:
    // pick the axis by cross-multiplication, then floor-scale the other.
    val heightBinding = $"width" * boxH <= $"height" * boxW
    feats.toDF()
      .select($"media_id", $"width", $"height")
      .withColumn("fit_w",
        when(heightBinding,
          floor($"width" * boxH / $"height").cast("long")).otherwise(boxW))
      .withColumn("fit_h",
        when(heightBinding, boxH)
          .otherwise(floor($"height" * boxW / $"width").cast("long")))
      .select($"media_id", $"width", $"height",
        greatest($"fit_w", lit(1L)).as("out_w"),
        greatest($"fit_h", lit(1L)).as("out_h"))
  }

  /** Frame-sampling stage (video → every k-th frame index), showing a
    * 1→N typed generator over decoded metadata.
    */
  def sampleFrames(feats: Dataset[MediaFeatures], everyK: Long): DataFrame = {
    import feats.sparkSession.implicits._
    feats.toDF()
      .filter($"modality" === "video")
      .select($"media_id", explode(sequence(lit(0L), $"n_frames" - 1, lit(everyK)))
        .as("frame_idx"))
  }
}
