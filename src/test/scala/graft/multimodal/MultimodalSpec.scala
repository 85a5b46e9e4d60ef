package graft.multimodal

import graft.SparkSpec

/** Unit behavior of the multimodal stages beyond the oracle gate:
  * deterministic decode, aspect-preserving resize math, and frame
  * sampling stride.
  */
class MultimodalSpec extends SparkSpec {

  import Multimodal._

  test("decode is deterministic and derives dimensions from the payload") {
    val r = MediaRecord(1L, "image", "hello".getBytes("UTF-8"), "src")
    val f1 = Codec.decode(r)
    val f2 = Codec.decode(r)
    assert(f1 == f2)
    assert(f1.byte_len == 5 && f1.n_frames == 1)
    assert(f1.width >= 16 && f1.height >= 16)
    assert(f1.feat0 >= 0.0 && f1.feat0 <= 1.0)
  }

  test("resize fits into the box preserving aspect ratio") {
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
