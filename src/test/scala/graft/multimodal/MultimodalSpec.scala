package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.SparkSpec

/** Unit behavior of the multimodal stages beyond the oracle gate: real
  * PNG encode→decode round-trip, hand-computed box-filter resample,
  * aspect-preserving resize math, stub determinism, and frame-sampling
  * stride.
  */
class MultimodalSpec extends SparkSpec {

  import Multimodal._

  /** PNG-encode an explicit gray pixel grid (row-major [y][x]). */
  private def png(rows: Array[Array[Int]]): Array[Byte] = {
    val h = rows.length
    val w = rows(0).length
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, rows(y)(x))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("image decode is REAL: ImageIO round-trips the encoded raster exactly") {
    // a known 3×2 grid: decode must recover dims, mean, and the corner
    // from the pixels, not from any metadata side-channel
    val rows = Array(Array(0, 100, 200), Array(50, 150, 250))
    val f = Codec.decode(MediaRecord(7L, "image", png(rows), "src"))
    assert(f.width == 3 && f.height == 2)
    assert(f.byte_len == 6) // decoded gray bytes
    assert(f.n_frames == 1)
    assert(f.feat0 == (0 + 100 + 200 + 50 + 150 + 250).toDouble / 6 / 255.0)
    assert(f.feat7 == 250.0 / 255.0) // bottom-right pixel
  }

  test("mediaTable image payloads are genuine PNGs matching the geometry contract") {
    val h = "0123456789abcdef0123456789abcdef"
    val (w, ht, seed) = Multimodal.imageGeometry(h)
    val bytes = Multimodal.encodePng(w, ht, seed)
    // PNG magic — a real container, not a fake byte blob
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte &&
      bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == w && img.getHeight == ht)
    // lossless round-trip of the deterministic pattern
    assert(img.getRaster.getSample(0, 0, 0) == Multimodal.pixel(0, 0, seed))
    assert(img.getRaster.getSample(w - 1, ht - 1, 0) ==
      Multimodal.pixel(w - 1, ht - 1, seed))
  }

  test("audio decode is REAL: AudioSystem round-trips the encoded waveform exactly") {
    // 5 known samples at 16 kHz; decode must recover rate/channels from
    // the codec-reported AudioFormat and amplitudes from the PCM bytes
    val wav = Multimodal.encodeWav(5, 16000, 70000) // seed folds mod 65536
    // RIFF/WAVE magic — a real container AudioSystem can parse
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val f = Codec.decode(MediaRecord(11L, "audio", wav, "src"))
    assert(f.width == 16000 && f.height == 1) // rate, channels from AudioFormat
    assert(f.n_frames == 5 && f.byte_len == 10) // decoded PCM bytes
    val samples = (0 until 5).map(Multimodal.sample(_, 70000))
    assert(f.feat0 == samples.map(math.abs(_).toLong).sum.toDouble / 5 / 32768.0)
    assert(f.feat7 == (samples.last + 32768).toDouble / 65536.0)
  }

  test("video decode is REAL: GVID demux + per-frame ImageIO decode") {
    val gvid = Multimodal.encodeGvid(3, 4, 2, 100)
    assert(new String(gvid.slice(0, 4), "US-ASCII") == "GVID")
    // demux yields 3 genuine PNGs
    val frames = Multimodal.demuxGvid(gvid).toSeq
    assert(frames.size == 3)
    frames.foreach(p => assert((p(0) & 0xff) == 0x89 && p(1) == 'P'.toByte))
    val f = Codec.decode(MediaRecord(12L, "video", gvid, "src"))
    assert(f.width == 4 && f.height == 2 && f.n_frames == 3)
    assert(f.byte_len == 3L * 4 * 2)
    val expectedSum = (for { fr <- 0 until 3; y <- 0 until 2; x <- 0 until 4 }
      yield Multimodal.pixel(x, y, Multimodal.frameSeed(100, fr)).toLong).sum
    assert(f.feat0 == expectedSum.toDouble / (3L * 4 * 2) / 255.0)
    assert(f.feat7 == Multimodal.pixel(3, 1, Multimodal.frameSeed(100, 2)).toDouble / 255.0)
  }

  test("audioStats folds the really-decoded waveform: crossings, peak, energy") {
    import spark.implicits._
    val (n, rate, seed) = (9, 8000, 65500) // seed chosen so signs flip
    val media = spark.createDataset(Seq(
      MediaRecord(30L, "audio", Multimodal.encodeWav(n, rate, seed), "s")))
    val got = audioStats(media).collect().head
    // expected stats re-derived from the deterministic waveform — equal
    // only if the WAV+AudioSystem round-trip preserved every sample
    val vs = (0 until n).map(Multimodal.sample(_, seed))
    val crossings = vs.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
    assert(vs.exists(_ < 0) && vs.exists(_ >= 0)) // the case exercises both signs
    assert(got == AudioStats(30L, n.toLong, crossings.toLong,
      vs.map(v => math.abs(v.toLong)).max,
      vs.map(v => v.toLong * v).sum))
  }

  test("frameFingerprints digests the canonical row-major decoded pixels") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      MediaRecord(31L, "video", Multimodal.encodeGvid(2, 3, 2, 40), "s")))
    val got = frameFingerprints(media).collect().sortBy(_.frame_idx)
    assert(got.length == 2)
    def expected(f: Int): String = {
      val s = (for (y <- 0 until 2; x <- 0 until 3)
        yield Multimodal.pixel(x, y, Multimodal.frameSeed(40, f))).mkString(",")
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    }
    assert(got(0) == FrameFingerprint(31L, 0L, 3L, 2L, expected(0)))
    assert(got(1) == FrameFingerprint(31L, 1L, 3L, 2L, expected(1)))
    assert(got(0).fingerprint != got(1).fingerprint) // frames genuinely differ
  }

  test("decoded frame sampling takes every k-th really-decoded frame") {
    import spark.implicits._
    val gvid = Multimodal.encodeGvid(9, 3, 2, 5)
    val media = spark.createDataset(Seq(MediaRecord(20L, "video", gvid, "s")))
    val got = sampleFramesDecoded(media, 4).collect().sortBy(_.frame_idx)
    assert(got.map(_.frame_idx).toSeq == Seq(0L, 4L, 8L))
    got.foreach { sf =>
      val want = (for { y <- 0 until 2; x <- 0 until 3 }
        yield Multimodal.pixel(x, y, Multimodal.frameSeed(5, sf.frame_idx.toInt)).toLong).sum
      assert(sf.width == 3 && sf.height == 2 && sf.px_sum == want)
    }
  }

  test("box-filter resize floor-averages each area box (hand-computed case)") {
    import spark.implicits._
    val rows = Array(Array(10, 20, 30, 40), Array(50, 60, 70, 80)) // 4×2
    val media = spark.createDataset(Seq(MediaRecord(3L, "image", png(rows), "s")))
    // 4×2 into a 2×2 box → width-bound: out 2×1; buckets {0,1}|{2,3} × {0,1}
    val got = boxFilterResize(media, 2, 2).collect().head
    assert(got == ResizedImage(3L, 4L, 2L, 2L, 1L,
      px_sum = (10 + 20 + 50 + 60) / 4 + (30 + 40 + 70 + 80) / 4, // 35 + 55
      px00 = 35L))
  }

  test("aHash: brightness shift preserves the hash; structural change flips bits") {
    import spark.implicits._
    // a 16×16 gradient, its +40 brightness-shifted twin (no mod-256
    // wrap: max 15+15+40 = 70), and a structurally different checker
    def grid(f: (Int, Int) => Int) =
      Array.tabulate(16, 16)((y, x) => f(x, y)).map(_.toArray)
    val media = spark.createDataset(Seq(
      MediaRecord(1L, "image", png(grid((x, y) => x + y)), "s"),
      MediaRecord(2L, "image", png(grid((x, y) => x + y + 40)), "s"),
      MediaRecord(3L, "image", png(grid((x, y) => (x + y) % 2 * 255)), "s")))
    val hs = aHashes(media).collect().map(h => h.media_id -> h).toMap
    // aHash bits compare each box to the global mean — a uniform
    // brightness shift moves both equally, so the hash is invariant
    assert(hs(1L) == hs(2L).copy(media_id = 1L),
      "brightness-shifted twin must hash identically")
    val hamming = Seq(
      (hs(1L).b0, hs(3L).b0), (hs(1L).b1, hs(3L).b1),
      (hs(1L).b2, hs(3L).b2), (hs(1L).b3, hs(3L).b3))
      .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
    info(s"gradient vs checker hamming = $hamming")
    assert(hamming > 3, "structurally different content must exceed the radius")
    // hand-check one bit: 16×16 into 8×8 → each box is a 2×2 floor-mean;
    // box (0,0) of the gradient = (0+1+1+2)/4 = 1, well below the mean
    assert((hs(1L).b0 & 1L) == 0L, "top-left gradient box sits below the mean")
  }

  test("audio signature: volume scaling preserves it; moved energy flips bits") {
    import spark.implicits._
    def wav(samples: Array[Int]): Array[Byte] = {
      val bytes = java.nio.ByteBuffer.allocate(samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(v => bytes.putShort(v.toShort))
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes.array()), fmt, samples.length)
      val out = new ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    // energy concentrated up front / the same clip at half volume /
    // the mirror image with the energy at the tail
    val front = Array.tabulate(64)(i => if (i < 16) 10000 else 100)
    val media = spark.createDataset(Seq(
      MediaRecord(1L, "audio", wav(front), "s"),
      MediaRecord(2L, "audio", wav(front.map(_ / 2)), "s"),
      MediaRecord(3L, "audio", wav(front.reverse), "s")))
    val sig = audioSignatures(media).collect().map(h => h.media_id -> h).toMap
    assert(sig(1L).n_samples == 64)
    // window energies all scale by 1/4 → every 16·E_w vs ΣE compare is unchanged
    assert((sig(1L).s0, sig(1L).s1) == (sig(2L).s0, sig(2L).s1),
      "half-volume clip must produce the identical signature")
    val hamming = java.lang.Long.bitCount(sig(1L).s0 ^ sig(3L).s0) +
      java.lang.Long.bitCount(sig(1L).s1 ^ sig(3L).s1)
    info(s"front-heavy vs tail-heavy hamming = $hamming")
    assert(hamming > 1, "moved energy must exceed the dedup radius")
  }

  test("resize planning fits into the box preserving aspect ratio") {
    import spark.implicits._
    val feats = Seq(
      MediaFeatures(1, "image", 10, 1920, 1080, 1, 0.1, 0.2), // wide
      MediaFeatures(2, "image", 10, 100, 400, 1, 0.1, 0.2),   // tall
      MediaFeatures(3, "image", 10, 336, 336, 1, 0.1, 0.2))   // exact
    val got = resizeTo(spark.createDataset(feats), 336, 336)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == ((336L, 189L))) // 1920x1080 → width-bound
    assert(got(2L) == ((84L, 336L)))  // 100x400 → height-bound
    assert(got(3L) == ((336L, 336L)))
    // aspect preserved within integer rounding
    assert(math.abs(336.0 / 189.0 - 1920.0 / 1080.0) < 0.02)
  }

  test("frame sampling emits every k-th frame index below n_frames") {
    import spark.implicits._
    val feats = Seq(MediaFeatures(9, "video", 10, 64, 64, 20, 0.0, 0.0))
    val idx = sampleFrames(spark.createDataset(feats), 7)
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(idx == Seq(0L, 7L, 14L))
  }
}
