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
  * The AUDIO path is REAL too: [[mediaTable]] writes each audio payload
  * as a genuine 16-bit mono PCM WAV (canonical 44-byte RIFF header), and
  * [[Codec.decode]] runs it through `javax.sound.sampled.AudioSystem` —
  * the sample rate, frame count, and amplitude statistics all come from
  * the decoded PCM stream and the codec-reported `AudioFormat`, not from
  * metadata. The waveform is a deterministic digest-seeded integer
  * sequence, so the DuckDB oracle regenerates the exact samples (PCM is
  * lossless).
  *
  * VIDEO: the JDK ships no video container demuxer, so the payload uses
  * a minimal deterministic container (`GVID` magic, frame count, then
  * length-prefixed real PNG frames). The DEMUX is original code by
  * necessity, but every frame decode is a real `ImageIO.read` over real
  * PNG bytes — per-frame dimensions and pixel statistics come from
  * decoded rasters. This is the honest JDK-only analogue of a keyframe
  * pipeline: container walk + per-frame image codec.
  */
object Multimodal {

  /** A media record: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      modality: String, // image | audio | video
      payload: Array[Byte],
      source: String)

  /** Decoded per-record features. Every field comes from the real
    * decode: images from the `ImageIO` raster (`byte_len` = decoded
    * gray bytes = w·h), audio from the `AudioSystem` PCM stream
    * (`byte_len` = decoded PCM bytes), video from the GVID demux +
    * per-frame `ImageIO` decode (`byte_len` = sum of frame rasters).
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

  /** Audio geometry from the document digest — (sample count 64-1024,
    * sample rate, waveform seed). The sample-count cap keeps the
    * oracle's sample explode ≤ ~1k rows per doc at every gate SF.
    */
  private[multimodal] def audioGeometry(h: String): (Int, Int, Int) = (
    64 + (hex(h, 0, 4) % 961L).toInt,
    Seq(8000, 16000, 22050, 44100)((hex(h, 4, 2) % 4L).toInt),
    hex(h, 8, 4).toInt)

  /** The deterministic 16-bit sample at frame i — what the WAV encoder
    * writes and the oracle recomputes. Range [-32768, 32767].
    */
  private[multimodal] def sample(i: Int, seed: Int): Int =
    (i * 73 + seed) % 65536 - 32768

  /** Video geometry from the digest — (frame count 1-24, frame width
    * 8-15, frame height 6-11, base seed). ≤ ~4k pixels per video.
    */
  private[multimodal] def videoGeometry(h: String): (Int, Int, Int, Int) = (
    1 + (hex(h, 0, 2) % 24L).toInt,
    8 + (hex(h, 2, 1) % 8L).toInt,
    6 + (hex(h, 3, 1) % 6L).toInt,
    (hex(h, 8, 2) % 256L).toInt)

  /** Frame f's pixel seed — each frame shifts the base pattern. */
  private[multimodal] def frameSeed(seed: Int, f: Int): Int = (seed + 11 * f) % 256

  /** A reusable PNG encoder handle — the write-side twin of
    * [[PngDecoder]], one `ImageWriter` serving a whole partition's
    * fixture synthesis.
    */
  private[multimodal] final class PngEncoder {
    private val writer = ImageIO.getImageWritersByFormatName("png").next()
    def write(img: BufferedImage): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(out)
      try {
        writer.setOutput(ios)
        writer.write(img)
      } finally ios.close()
      out.toByteArray
    }
  }

  /** Encode the deterministic pattern as real PNG bytes. */
  private[multimodal] def encodePng(w: Int, h: Int, seed: Int,
      enc: PngEncoder = new PngEncoder): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixel(x, y, seed)); x += 1 }
      y += 1
    }
    enc.write(img)
  }

  /** Encode the deterministic waveform as a real 16-bit mono PCM WAV:
    * canonical 44-byte RIFF header + little-endian samples — exactly
    * what `AudioSystem` parses back.
    */
  private[multimodal] def encodeWav(n: Int, rate: Int, seed: Int): Array[Byte] = {
    val data = 2 * n
    val buf = java.nio.ByteBuffer.allocate(44 + data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + data)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(data)
    var i = 0
    while (i < n) { buf.putShort(sample(i, seed).toShort); i += 1 }
    buf.array()
  }

  /** Encode the deterministic frame sequence as the `GVID` container:
    * magic + big-endian frame count, then per frame a big-endian byte
    * length + REAL PNG bytes of that frame's pattern.
    */
  private[multimodal] def encodeGvid(nf: Int, w: Int, h: Int, seed: Int,
      enc: PngEncoder = new PngEncoder): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.write("GVID".getBytes("US-ASCII"))
    dos.writeInt(nf)
    var f = 0
    while (f < nf) {
      val png = encodePng(w, h, frameSeed(seed, f), enc)
      dos.writeInt(png.length)
      dos.write(png)
      f += 1
    }
    dos.flush()
    out.toByteArray
  }

  /** Demux the `GVID` container into its PNG frame payloads (lazily —
    * callers sampling every k-th frame never materialize the rest).
    */
  private[multimodal] def demuxGvid(payload: Array[Byte]): Iterator[Array[Byte]] = {
    val in = new java.io.DataInputStream(new ByteArrayInputStream(payload))
    val magic = new Array[Byte](4)
    in.readFully(magic)
    require(new String(magic, "US-ASCII") == "GVID", "not a GVID container")
    val nf = in.readInt()
    Iterator.tabulate(nf) { _ =>
      val len = in.readInt()
      val png = new Array[Byte](len)
      in.readFully(png)
      png
    }
  }

  /** A reusable PNG decoder handle: one `ImageReader` instance serving
    * many payloads. The `ImageIO.read` convenience method re-runs plugin
    * lookup and stream setup per call — measurable overhead when a
    * partition decodes 10⁴-10⁵ small frames — so the partition stages
    * instantiate ONE of these per partition and stream records through
    * it: the per-partition codec-init discipline made concrete.
    */
  private[multimodal] final class PngDecoder {
    private val reader = ImageIO.getImageReadersByFormatName("png").next()
    def read(png: Array[Byte]): BufferedImage = {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(png))
      try {
        reader.setInput(iis, true, true)
        reader.read(0)
      } finally iis.close()
    }
  }

  /** The codec. All three modalities decode for real: ImageIO over the
    * PNG payload, `AudioSystem` over the WAV payload, GVID demux +
    * per-frame ImageIO for video. The partition stages below open one
    * [[PngDecoder]] per partition and pass it in — the reason decode is
    * a partition stage, not a per-row UDF.
    */
  object Codec {

    def decode(r: MediaRecord): MediaFeatures = decode(r, new PngDecoder)

    private[multimodal] def decode(r: MediaRecord, dec: PngDecoder): MediaFeatures =
      r.modality match {
        case "image" => decodeImage(r, dec)
        case "audio" => decodeAudio(r)
        case _       => decodeVideo(r, dec)
      }

    /** REAL decode: dimensions and features from the decoded raster. */
    private def decodeImage(r: MediaRecord, dec: PngDecoder): MediaFeatures = {
      val img = dec.read(r.payload)
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

    /** REAL audio decode: `AudioSystem` parses the WAV, and every output
      * field comes from the codec — sample rate and channel count from
      * the reported `AudioFormat`, frame count and amplitude statistics
      * from the decoded PCM bytes. width carries the sample rate,
      * height the channel count (the audio shape analogue of pixel
      * dims); feat0 is mean |amplitude|, feat7 the final sample, both
      * normalized to [0, 1].
      */
    private def decodeAudio(r: MediaRecord): MediaFeatures = {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new ByteArrayInputStream(r.payload))
      val fmt = ais.getFormat
      val pcm = ais.readAllBytes()
      ais.close()
      val n = pcm.length / 2
      val bb = java.nio.ByteBuffer.wrap(pcm).order(
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      var sumAbs = 0L
      var last = 0
      var i = 0
      while (i < n) { last = bb.getShort(2 * i).toInt; sumAbs += math.abs(last); i += 1 }
      MediaFeatures(
        r.media_id, r.modality,
        byte_len = pcm.length.toLong, // decoded PCM bytes, not container size
        width = fmt.getSampleRate.toLong,
        height = fmt.getChannels.toLong,
        n_frames = n.toLong,
        feat0 = sumAbs.toDouble / n / 32768.0,
        feat7 = (last + 32768).toDouble / 65536.0)
    }

    /** REAL video decode: demux the GVID container, `ImageIO.read` every
      * frame; dimensions from the first decoded frame, byte_len = total
      * decoded gray bytes, feat0 = mean luminance across all frames,
      * feat7 = the last frame's bottom-right pixel.
      */
    private def decodeVideo(r: MediaRecord, dec: PngDecoder): MediaFeatures = {
      var nf = 0
      var w = 0
      var h = 0
      var sum = 0L
      var lastCorner = 0
      demuxGvid(r.payload).foreach { png =>
        val img = dec.read(png)
        if (nf == 0) { w = img.getWidth; h = img.getHeight }
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        lastCorner = raster.getSample(w - 1, h - 1, 0)
        nf += 1
      }
      val px = nf.toLong * w * h
      MediaFeatures(
        r.media_id, r.modality,
        byte_len = px, width = w.toLong, height = h.toLong,
        n_frames = nf.toLong,
        feat0 = sum.toDouble / px / 255.0,
        feat7 = lastCorner.toDouble / 255.0)
    }
  }

  /** Session-scoped memo of the synthesized media table, persisted per
    * (session, corpus) like the dedup/ANN staged indexes. In production
    * the payload bytes are STORED input — a pipeline never re-encodes
    * its corpus per query — so the fixture encoder runs once and every
    * media query measures decode, not fixture synthesis.
    */
  private val mediaCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Dataset[MediaRecord]]

  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRecord] =
    mediaCache.getOrElseUpdate((s, dir), {
      import s.implicits._
      // durable: the encoded payload bytes ARE the stored input corpus
      // of a production media pipeline — synthesize once per corpus
      // generation, read parquet after (graft.core.Staging)
      // r17 optimization: the staged artifact reads back as ONE scan
      // partition (a single small parquet file under maxPartitionBytes),
      // which serialized every downstream codec stage onto one core of
      // the 32. Spread the cached table across the session's cores so
      // the decode mapPartitions stages — the entire cost of the mm_*
      // family — actually parallelize; per-row decode is pure, so the
      // values are unchanged. Scale-adaptive (defaultParallelism), not a
      // local constant; at 100 TB the payload table is many files and
      // splits naturally, making this a no-op-sized shuffle.
      graft.core.Staging.readElseBuild(s, dir, "media_table", Seq("documents")) {
        buildMediaTable(s, dir).toDF()
      }.repartition(s.sparkContext.defaultParallelism)
        .as[MediaRecord].persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** Drop the staged media tables (needed if a corpus dir is rewritten
    * in-session — same contract as the Dedup/Similarity caches).
    */
  def clearCaches(): Unit = {
    mediaCache.values.foreach(_.unpersist())
    mediaCache.clear()
  }

  /** Build the media table from `documents`: modality round-robin by
    * doc_id; every payload is a REAL decodable container — PNG bytes for
    * images, 16-bit PCM WAV for audio, the GVID PNG-frame container for
    * video — of the deterministic digest-derived content. Runs as a
    * `mapPartitions` stage like the decode side — the encoder is
    * per-partition state, records streamed.
    */
  private def buildMediaTable(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    graft.core.Tables(s, dir).documents
      .select($"doc_id", $"text", $"source")
      // the documents table is one small parquet file → one partition;
      // spread the encode (once per corpus generation) across the cores
      .repartition(s.sparkContext.defaultParallelism)
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val enc = new PngEncoder // one codec handle per task
        it.map { case (docId, text, source) =>
          val modality = Seq("image", "audio", "video")((docId % 3).toInt)
          val textBytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val digest = md5hex(textBytes)
          val payload = modality match {
            case "image" =>
              val (w, h, seed) = imageGeometry(digest)
              encodePng(w, h, seed, enc)
            case "audio" =>
              val (n, rate, seed) = audioGeometry(digest)
              encodeWav(n, rate, seed)
            case _ =>
              val (nf, w, h, seed) = videoGeometry(digest)
              encodeGvid(nf, w, h, seed, enc)
          }
          MediaRecord(docId, modality, payload, source)
        }
      }
  }

  /** Decode stage: one codec per partition, records streamed through. */
  def decodeAll(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val dec = new PngDecoder // one codec handle per task
      it.map(Codec.decode(_, dec))
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
      val dec = new PngDecoder
      it.map { r =>
        val img = dec.read(r.payload)
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

  /** Integer-exact analysis of one really-decoded waveform: every field
    * folds over the PCM samples, so the oracle replays it exactly.
    * energy = Σ v² stays ≤ 1024·2³⁰ ≈ 2⁴⁰ — well under the 2⁵³ portable
    * integer ceiling.
    */
  final case class AudioStats(
      media_id: Long, n_samples: Long, zero_crossings: Long,
      peak: Long, energy: Long)

  /** REAL audio analysis: decode via AudioSystem, then one integer pass —
    * sign-flip count (a zero sample is non-negative), peak |amplitude|,
    * and total energy. The silence/clipping gates a speech pipeline
    * filters on are thresholds over exactly these three statistics.
    */
  def audioStats(media: Dataset[MediaRecord]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "audio").mapPartitions { it =>
      it.map { r =>
        val ais = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new ByteArrayInputStream(r.payload))
        val fmt = ais.getFormat
        val pcm = ais.readAllBytes()
        ais.close()
        val bb = java.nio.ByteBuffer.wrap(pcm).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        val n = pcm.length / 2
        var crossings = 0L
        var peak = 0L
        var energy = 0L
        var prevNeg = false
        var i = 0
        while (i < n) {
          val v = bb.getShort(2 * i).toInt
          val neg = v < 0
          if (i > 0 && neg != prevNeg) crossings += 1
          prevNeg = neg
          val a = math.abs(v.toLong)
          if (a > peak) peak = a
          energy += v.toLong * v
          i += 1
        }
        AudioStats(r.media_id, n.toLong, crossings, peak, energy)
      }
    }
  }

  /** Per-clip perceptual audio signature: 16 energy-threshold bits
    * packed as two 8-bit bands.
    */
  final case class AudioSig(media_id: Long, n_samples: Long, s0: Long, s1: Long)

  /** REAL perceptual audio signature (a chromaprint-style energy
    * profile, radically simplified): decode the WAV, split the waveform
    * into 16 equal-index windows (sample i → window i·16/n), bit_w =
    * [16·E_w > ΣE] with E_w the window's Σv² — an integer
    * cross-multiplication, no float mean. Invariant to uniform volume
    * scaling (all window energies scale together), sensitive to WHERE
    * the energy sits — the audio analogue of [[aHashes]]' brightness
    * invariance. Two 8-bit bands make the any-band candidate join
    * pigeonhole-exact for hamming ≤ 1.
    */
  def audioSignatures(media: Dataset[MediaRecord]): Dataset[AudioSig] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "audio").mapPartitions { it =>
      it.map { r =>
        val ais = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new ByteArrayInputStream(r.payload))
        val fmt = ais.getFormat
        val pcm = ais.readAllBytes()
        ais.close()
        val bb = java.nio.ByteBuffer.wrap(pcm).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        val n = pcm.length / 2
        val e = Array.ofDim[Long](16)
        var i = 0
        while (i < n) {
          val v = bb.getShort(2 * i).toLong
          e(i * 16 / n) += v * v
          i += 1
        }
        val total = e.sum
        val bands = Array.ofDim[Long](2)
        var w = 0
        while (w < 16) {
          // exact in Long: E_w ≤ n·32768² ≤ 2^40, so 16·E_w ≤ 2^44
          if (e(w) * 16 > total) bands(w / 8) |= 1L << (w % 8)
          w += 1
        }
        AudioSig(r.media_id, n.toLong, bands(0), bands(1))
      }
    }
  }

  /** One decoded frame's content fingerprint: md5 of the canonical
    * row-major comma-joined pixel string — a PORTABLE digest both
    * engines can compute over the same text.
    */
  final case class FrameFingerprint(
      media_id: Long, frame_idx: Long, width: Long, height: Long,
      fingerprint: String)

  /** Per-image perceptual average-hash, packed as four 16-bit bands
    * (row-major bits 0-15, 16-31, 32-47, 48-63).
    */
  final case class AHash(media_id: Long, b0: Long, b1: Long, b2: Long, b3: Long)

  /** REAL perceptual hash (aHash): decode the PNG, squash the raster to
    * a FIXED 8×8 grid with the same integer-area box filter as
    * [[boxFilterResize]] — deliberately NOT aspect-preserving, because
    * the normalization is what makes hashes of different geometries
    * comparable — then bit k (row-major) = [64·box_k > Σ boxes], an
    * integer cross-multiplication instead of a float mean. All-integer →
    * deterministic → oracle-replayable. The four 16-bit bands support
    * the pigeonhole-exact hamming ≤ 3 candidate join downstream
    * (mm_ahash_dedup): ≤ 3 flipped bits cannot touch all 4 bands.
    *
    * Scale: one decode + one O(w·h) pass per image in the decode
    * partition stage, 4 longs of state per image — the banded self-join
    * is the only shuffle, identical to the simhash discipline.
    */
  def aHashes(media: Dataset[MediaRecord]): Dataset[AHash] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "image").mapPartitions { it =>
      val dec = new PngDecoder
      it.map { r =>
        val img = dec.read(r.payload)
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val sums = Array.ofDim[Long](64)
        val cnts = Array.ofDim[Long](64)
        var y = 0
        while (y < h) {
          val j = y * 8 / h
          var x = 0
          while (x < w) {
            val idx = j * 8 + x * 8 / w
            sums(idx) += raster.getSample(x, y, 0)
            cnts(idx) += 1
            x += 1
          }
          y += 1
        }
        val boxes = Array.tabulate(64)(k => sums(k) / cnts(k))
        val total = boxes.sum
        val bands = Array.ofDim[Long](4)
        var k = 0
        while (k < 64) {
          if (boxes(k) * 64 > total) bands(k / 16) |= 1L << (k % 16)
          k += 1
        }
        AHash(r.media_id, bands(0), bands(1), bands(2), bands(3))
      }
    }
  }

  /** Fingerprint every really-decoded frame of every video: demux, decode
    * each PNG, canonicalize the raster as row-major "v,v,…", md5 it.
    * Downstream exact frame-dedup is then a plain hash shuffle on the
    * fingerprint — the multimodal twin of document exact-dedup, and at
    * 100 TB the same one-shuffle shape.
    */
  def frameFingerprints(media: Dataset[MediaRecord]): Dataset[FrameFingerprint] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "video").mapPartitions { it =>
      val dec = new PngDecoder
      it.flatMap { r =>
        demuxGvid(r.payload).zipWithIndex.map { case (png, f) =>
          val img = dec.read(png)
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          val sb = new StringBuilder
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              if (sb.nonEmpty) sb.append(',')
              sb.append(raster.getSample(x, y, 0))
              x += 1
            }
            y += 1
          }
          FrameFingerprint(r.media_id, f.toLong, w.toLong, h.toLong,
            md5hex(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        }
      }
    }
  }

  /** Frame-sampling PLANNING stage (video → every k-th frame index), a
    * 1→N typed generator over decoded metadata — the cheap form when
    * only indices are needed downstream.
    */
  def sampleFrames(feats: Dataset[MediaFeatures], everyK: Long): DataFrame = {
    import feats.sparkSession.implicits._
    feats.toDF()
      .filter($"modality" === "video")
      .select($"media_id", explode(sequence(lit(0L), $"n_frames" - 1, lit(everyK)))
        .as("frame_idx"))
  }

  /** One sampled, REALLY-decoded video frame: its checksum proves the
    * pixels came out of ImageIO, not out of metadata.
    */
  final case class SampledFrame(
      media_id: Long, frame_idx: Long, width: Long, height: Long, px_sum: Long)

  /** REAL frame sampling: demux each video's GVID container and decode
    * every k-th PNG frame with ImageIO, emitting per-frame dimensions
    * and the decoded-pixel checksum. The demux iterator is lazy, but
    * skipped frames still stream past the reader — the honest cost shape
    * of sequential-container sampling (a production seekable container
    * would jump via its frame index; the per-frame DECODE cost here is
    * the part that scales, and it is paid only for sampled frames).
    */
  def sampleFramesDecoded(media: Dataset[MediaRecord], everyK: Int): Dataset[SampledFrame] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "video").mapPartitions { it =>
      val dec = new PngDecoder
      it.flatMap { r =>
        demuxGvid(r.payload).zipWithIndex.collect {
          case (png, f) if f % everyK == 0 =>
            val img = dec.read(png)
            val (w, h) = (img.getWidth, img.getHeight)
            val raster = img.getRaster
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
              y += 1
            }
            SampledFrame(r.media_id, f.toLong, w.toLong, h.toLong, sum)
        }
      }
    }
  }
}
