package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal plumbing as oracle-checked queries: the decode stub is
  * deterministic (md5-derived), so the DuckDB oracle replays the whole
  * binary-column pipeline — build media table → decode → features /
  * frame-sampling — and hash-compares it end to end.
  */
object MultimodalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // decode via typed mapPartitions (real plumbing, stub codec).
    "mm_features" -> { (s, dir) =>
      import s.implicits._
      Multimodal.decodeAll(Multimodal.mediaTable(s, dir))
        .toDF()
        .orderBy($"media_id")
    },

    // resize decoded media into a 336×336 box, aspect-preserving.
    "mm_resize" -> { (s, dir) =>
      import s.implicits._
      Multimodal.resizeTo(
        Multimodal.decodeAll(Multimodal.mediaTable(s, dir)), 336L, 336L)
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

  private val FeatCte =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS modality,
      |    md5(text) AS h,
      |    octet_length(encode(text)) AS byte_len
      |  FROM documents),
      |f AS (
      |  SELECT media_id, modality, byte_len::BIGINT AS byte_len,
      |    16 + ('0x' || substr(h, 1, 4))::BIGINT % 1920 AS width,
      |    16 + ('0x' || substr(h, 5, 4))::BIGINT % 1080 AS height,
      |    CASE modality
      |      WHEN 'image' THEN 1
      |      WHEN 'audio' THEN 1 + ('0x' || substr(h, 9, 4))::BIGINT % 1000
      |      ELSE 1 + ('0x' || substr(h, 9, 4))::BIGINT % 240 END AS n_frames,
      |    CAST(('0x' || substr(h, 17, 2))::BIGINT AS DOUBLE)
      |      / CAST(255 AS DOUBLE) AS feat0,
      |    CAST(('0x' || substr(h, 31, 2))::BIGINT AS DOUBLE)
      |      / CAST(255 AS DOUBLE) AS feat7
      |  FROM m)""".stripMargin

  def oracle: Map[String, String] = Map(
    "mm_features" ->
      s"""$FeatCte
         |SELECT media_id, modality, byte_len, width, height, n_frames,
         |       feat0, feat7
         |FROM f ORDER BY media_id""".stripMargin,

    "mm_resize" ->
      s"""$FeatCte
         |SELECT media_id, width, height,
         |  greatest(CASE WHEN width * 336 <= height * 336
         |    THEN CAST(floor(CAST(width * 336 AS DOUBLE) / height) AS BIGINT)
         |    ELSE 336 END, 1) AS out_w,
         |  greatest(CASE WHEN width * 336 <= height * 336
         |    THEN 336
         |    ELSE CAST(floor(CAST(height * 336 AS DOUBLE) / width) AS BIGINT) END, 1) AS out_h
         |FROM f ORDER BY media_id""".stripMargin,

    "mm_frame_sample" ->
      s"""$FeatCte
         |SELECT media_id, unnest(range(0, n_frames, 7)) AS frame_idx
         |FROM f WHERE modality = 'video'
         |ORDER BY media_id, frame_idx""".stripMargin
  )
}
