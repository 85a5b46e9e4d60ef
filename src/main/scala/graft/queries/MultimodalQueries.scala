package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal plumbing as oracle-checked queries. The IMAGE path is
  * real: payloads are genuine PNG bytes and every image statistic below
  * comes out of `ImageIO.read` + raster passes (decode, box-filter
  * resize). The image CONTENT is a deterministic digest-derived pattern,
  * so the DuckDB oracle regenerates the same pixel grid in SQL and
  * hash-compares the decoded numbers — the oracle never needs a PNG
  * decoder. Audio/video rows remain the documented digest stub.
  */
object MultimodalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // decode via typed mapPartitions (real ImageIO for images).
    "mm_features" -> { (s, dir) =>
      import s.implicits._
      Multimodal.decodeAll(Multimodal.mediaTable(s, dir))
        .toDF()
        .orderBy($"media_id")
    },

    // REAL box-filter resize of the decoded raster into a 12×12 box,
    // aspect-preserving; output-pixel checksum + top-left output pixel
    // prove the resample, not just the dimension math.
    "mm_resize" -> { (s, dir) =>
      import s.implicits._
      Multimodal.boxFilterResize(Multimodal.mediaTable(s, dir), 12, 12)
        .toDF()
        .orderBy($"media_id")
    },

    // 1→N frame sampling over decoded video metadata (every 7th frame).
    "mm_frame_sample" -> { (s, dir) =>
      import s.implicits._
      Multimodal.sampleFrames(
        Multimodal.decodeAll(Multimodal.mediaTable(s, dir)), 7L)
        .orderBy($"media_id", $"frame_idx")
    }
  )

  /** Media-table base: modality round-robin, payload digest (= md5 of
    * the UTF-8 text for every modality — images derive their GEOMETRY
    * from the same digest the encoder used).
    */
  private val MediaCte =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS modality,
      |    md5(text) AS h,
      |    octet_length(encode(text)) AS byte_len
      |  FROM documents)""".stripMargin

  /** Image geometry (the Multimodal.imageGeometry contract) and the
    * regenerated pixel grid `pv` — (x·31 + y·17 + seed) mod 256, exactly
    * what the PNG encoder wrote and ImageIO reads back (PNG lossless).
    */
  private val PixelCte =
    """im AS (
      |  SELECT media_id,
      |    16 + ('0x' || substr(h, 1, 4))::BIGINT % 48 AS width,
      |    16 + ('0x' || substr(h, 5, 4))::BIGINT % 32 AS height,
      |    ('0x' || substr(h, 9, 2))::BIGINT % 256 AS seed
      |  FROM m WHERE modality = 'image'),
      |ix AS (
      |  SELECT media_id, width, height, seed,
      |    unnest(generate_series(0, width - 1)) AS x
      |  FROM im),
      |pxy AS (
      |  SELECT media_id, width, height, seed, x,
      |    unnest(generate_series(0, height - 1)) AS y
      |  FROM ix),
      |pv AS (
      |  SELECT media_id, width, height, seed, x, y,
      |    (x * 31 + y * 17 + seed) % 256 AS v
      |  FROM pxy)""".stripMargin

  /** Stub features for the codec-less modalities (audio/video). */
  private val StubCte =
    """fs AS (
      |  SELECT media_id, modality, byte_len::BIGINT AS byte_len,
      |    16 + ('0x' || substr(h, 1, 4))::BIGINT % 1920 AS width,
      |    16 + ('0x' || substr(h, 5, 4))::BIGINT % 1080 AS height,
      |    CASE modality
      |      WHEN 'audio' THEN 1 + ('0x' || substr(h, 9, 4))::BIGINT % 1000
      |      ELSE 1 + ('0x' || substr(h, 9, 4))::BIGINT % 240 END AS n_frames,
      |    CAST(('0x' || substr(h, 17, 2))::BIGINT AS DOUBLE)
      |      / CAST(255 AS DOUBLE) AS feat0,
      |    CAST(('0x' || substr(h, 31, 2))::BIGINT AS DOUBLE)
      |      / CAST(255 AS DOUBLE) AS feat7
      |  FROM m WHERE modality <> 'image')""".stripMargin

  def oracle: Map[String, String] = Map(
    // image rows: real decoded statistics (byte_len = decoded gray
    // bytes; feat0 = mean luminance; feat7 = bottom-right pixel) —
    // regenerated from the deterministic pattern. Stub rows unchanged.
    "mm_features" ->
      s"""$MediaCte,
         |$PixelCte,
         |$StubCte,
         |fi AS (
         |  SELECT media_id, 'image' AS modality,
         |    (width * height)::BIGINT AS byte_len,
         |    width::BIGINT AS width, height::BIGINT AS height,
         |    1::BIGINT AS n_frames,
         |    CAST(SUM(v) AS DOUBLE) / (width * height) / CAST(255 AS DOUBLE) AS feat0,
         |    CAST(((width - 1) * 31 + (height - 1) * 17 + seed) % 256
         |      AS DOUBLE) / CAST(255 AS DOUBLE) AS feat7
         |  FROM pv GROUP BY media_id, width, height, seed)
         |SELECT * FROM fi
         |UNION ALL SELECT * FROM fs
         |ORDER BY media_id""".stripMargin,

    // replay the integer-area box filter: input pixel (x, y) belongs to
    // output pixel (x·out_w // width, y·out_h // height); each output
    // pixel is the floor-mean of its box; px_sum checksums the whole
    // resized raster.
    "mm_resize" ->
      s"""$MediaCte,
         |$PixelCte,
         |geo AS (
         |  SELECT media_id, width, height,
         |    CASE WHEN width * 12 <= height * 12
         |      THEN greatest(1, (width * 12) // height) ELSE 12 END AS ow,
         |    CASE WHEN width * 12 <= height * 12
         |      THEN 12 ELSE greatest(1, (height * 12) // width) END AS oh
         |  FROM im),
         |rb AS (
         |  SELECT p.media_id, g.width, g.height, g.ow, g.oh,
         |    (p.x * g.ow) // g.width AS i, (p.y * g.oh) // g.height AS j, p.v
         |  FROM pv p JOIN geo g USING (media_id)),
         |ob AS (
         |  SELECT media_id, width, height, ow, oh, i, j,
         |    CAST(SUM(v) AS BIGINT) // COUNT(*) AS o
         |  FROM rb GROUP BY media_id, width, height, ow, oh, i, j)
         |SELECT media_id,
         |  CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
         |  CAST(ow AS BIGINT) AS out_w, CAST(oh AS BIGINT) AS out_h,
         |  CAST(SUM(o) AS BIGINT) AS px_sum,
         |  CAST(MAX(CASE WHEN i = 0 AND j = 0 THEN o END) AS BIGINT) AS px00
         |FROM ob GROUP BY media_id, width, height, ow, oh
         |ORDER BY media_id""".stripMargin,

    // video stub rows only — unchanged by the real image path.
    "mm_frame_sample" ->
      s"""$MediaCte,
         |$StubCte
         |SELECT media_id, unnest(range(0, n_frames, 7)) AS frame_idx
         |FROM fs WHERE modality = 'video'
         |ORDER BY media_id, frame_idx""".stripMargin
  )
}
