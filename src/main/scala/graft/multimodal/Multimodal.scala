package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.security.MessageDigest

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media
  * payloads travel as opaque `binary` columns with typed metadata, and
  * decode / feature-extraction / resize / frame-sampling run as typed
  * `mapPartitions` batch stages (the Scala analogue of `mapInPandas`:
  * one decoder instantiation per partition, records streamed through).
  *
  * The IMAGE path is REAL: [[mediaTable]] encodes each image payload as
  * genuine PNG bytes (`javax.imageio` — pure JDK, no native libs), and
  * [[Codec.decode]] / [[boxFilterResize]] decode those bytes with
  * `ImageIO.read` and operate on the actual raster — dimensions, pixel
  * statistics, and the box-filter downsample all come from decoded
  * pixels, not from metadata. The image CONTENT is a deterministic
  * gray-level pattern derived from the document digest, which is what
  * lets the DuckDB oracle reproduce the decoded statistics end-to-end
  * (PNG is lossless, so encode→decode round-trips samples exactly).
  *
  * AUDIO / VIDEO decode remains a deterministic stub: the container has
  * no audio/video codecs (JDK ships none), so those branches derive fake
  * sample/frame counts from an md5 of the payload — honest about what is
  * stubbed while keeping the 1→N frame-sampling plumbing testable.
  */
object Multimodal {

  /** A media record: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      modality: String, // image | audio | video
      payload: Array[Byte],
      source: String)

  /** Decoded per-record features. For images every field comes from the
    * real decoded raster (`byte_len` = decoded gray bytes = w·h); for
    * audio/video the stub derives them from the payload digest.
    */
  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      byte_len: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      feat0: Double,
      feat7: Double)

  private def md5hex(bytes: Array[Byte]): String = {
    val d = MessageDigest.getInstance("MD5").digest(bytes)
    d.map(b => f"$b%02x").mkString
  }
  private def hex(h: String, from: Int, len: Int): Long =
    java.lang.Long.parseLong(h.substring(from, from + len), 16)

  /** Image geometry + pixel seed from the document digest — the contract
    * shared by the PNG encoder and the DuckDB oracle. Small images
    * (16-63 × 16-47) keep the per-doc pixel count ≤ ~3k so the oracle's
    * pixel explode stays cheap at every gate SF.
    */
  private[multimodal] def imageGeometry(h: String): (Int, Int, Int) = (
    16 + (hex(h, 0, 4) % 48L).toInt,
    16 + (hex(h, 4, 4) % 32L).toInt,
    (hex(h, 8, 2) % 256L).toInt)

  /** The deterministic gray value at (x, y) — what the encoder writes
    * and the oracle recomputes.
    */
  private[multimodal] def pixel(x: Int, y: Int, seed: Int): Int =
    (x * 31 + y * 17 + seed) % 256

  /** Encode the deterministic pattern as real PNG bytes. */
  private[multimodal] def encodePng(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixel(x, y, seed)); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** The codec. Images decode for real (ImageIO over the PNG payload);
    * audio/video fall back to the documented digest stub. In production
    * the per-partition decoder handle would be opened once in
    * `mapPartitions` and shared across the partition's records — the
    * reason decode is a partition stage, not a per-row UDF.
    */
  object Codec {

    def decode(r: MediaRecord): MediaFeatures = r.modality match {
      case "image" => decodeImage(r)
      case _       => decodeStub(r)
    }

    /** REAL decode: dimensions and features from the decoded raster. */
    private def decodeImage(r: MediaRecord): MediaFeatures = {
      val img = ImageIO.read(new ByteArrayInputStream(r.payload))
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      MediaFeatures(
        r.media_id, r.modality,
        byte_len = w.toLong * h, // decoded gray bytes, not PNG container size
        width = w.toLong, height = h.toLong,
        n_frames = 1L,
        feat0 = sum.toDouble / (w.toLong * h) / 255.0, // mean luminance
        feat7 = raster.getSample(w - 1, h - 1, 0).toDouble / 255.0)
    }

    /** Stub decode for the codec-less modalities: deterministic fake
      * dimensions/features from an md5 of the payload bytes. Real decode
      * would replace exactly this function.
      */
    private def decodeStub(r: MediaRecord): MediaFeatures = {
      val h = md5hex(r.payload)
      val frames = r.modality match {
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

  /** Build the media table from `documents`: modality round-robin by
    * doc_id; image payloads are REAL PNG bytes of the deterministic
    * digest-derived pattern, audio/video payloads are the UTF-8 text
    * bytes (opaque stand-ins). Runs as a `mapPartitions` stage like the
    * decode side — the encoder is per-partition state, records streamed.
    */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    graft.core.Tables(s, dir).documents
      .select($"doc_id", $"text", $"source")
      .as[(Long, String, String)]
      .mapPartitions { it =>
        it.map { case (docId, text, source) =>
          val modality = Seq("image", "audio", "video")((docId % 3).toInt)
          val textBytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val payload =
            if (modality == "image") {
              val (w, h, seed) = imageGeometry(md5hex(textBytes))
              encodePng(w, h, seed)
            } else textBytes
          MediaRecord(docId, modality, payload, source)
        }
      }
  }

  /** Decode stage: one codec per partition, records streamed through. */
  def decodeAll(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real pipeline: val codec = NativeCodec.open(...) — once per task
      it.map(Codec.decode)
    }
  }

  /** Resize PLANNING stage: fit decoded dimensions into a target box
    * preserving aspect ratio (integer cross-multiplication — exact, no
    * floating-point scale). [[boxFilterResize]] applies the same rule to
    * the real raster; this metadata-only form is the cheap planner for
    * batch-size/packing decisions upstream of the pixel work.
    */
  def resizeTo(feats: Dataset[MediaFeatures], boxW: Long, boxH: Long): DataFrame = {
    import feats.sparkSession.implicits._
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

  /** Per-image result of the real box-filter resize: aspect-fit output
    * dims plus exact statistics of the RESIZED raster (sum of output
    * pixels and the top-left output pixel) — scalars, so the oracle can
    * hash-compare the resample itself, not just the dimension math.
    */
  final case class ResizedImage(
      media_id: Long, width: Long, height: Long,
      out_w: Long, out_h: Long, px_sum: Long, px00: Long)

  /** REAL resize: decode the PNG, aspect-fit the target box (exact
    * cross-multiplication — no floating-point scale factor), then an
    * integer-area box filter: input column x belongs to output column
    * i = x·out_w / w (floor), which partitions the input grid into
    * contiguous boxes; each output pixel is the floor-mean of its box.
    * All-integer arithmetic → deterministic → oracle-replayable.
    *
    * Scale: one decode + one O(w·h) pass per image inside the existing
    * partition stage; no shuffle — the stage pipelines with decode.
    */
  def boxFilterResize(media: Dataset[MediaRecord], boxW: Int, boxH: Int): Dataset[ResizedImage] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "image").mapPartitions { it =>
      it.map { r =>
        val img = ImageIO.read(new ByteArrayInputStream(r.payload))
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val heightBinding = w.toLong * boxH <= h.toLong * boxW
        val ow = if (heightBinding) math.max(1L, w.toLong * boxH / h).toInt else boxW
        val oh = if (heightBinding) boxH else math.max(1L, h.toLong * boxW / w).toInt
        val sums = Array.ofDim[Long](ow * oh)
        val cnts = Array.ofDim[Long](ow * oh)
        var y = 0
        while (y < h) {
          val j = y * oh / h
          var x = 0
          while (x < w) {
            val idx = j * ow + x * ow / w
            sums(idx) += raster.getSample(x, y, 0)
            cnts(idx) += 1
            x += 1
          }
          y += 1
        }
        var pxSum = 0L
        var k = 0
        while (k < sums.length) { pxSum += sums(k) / cnts(k); k += 1 }
        ResizedImage(r.media_id, w.toLong, h.toLong, ow.toLong, oh.toLong,
          pxSum, sums(0) / cnts(0))
      }
    }
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
