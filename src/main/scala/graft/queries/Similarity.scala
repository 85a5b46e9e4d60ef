package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]` column, TESTDATA.md).
  *
  * Three tiers, same output shape (probe, rank, neighbor, cosine):
  *  - `ann_topk`        — brute-force exact baseline. The probe set is
  *    broadcast; the big side streams through one codegen'd projection,
  *    and top-k-per-probe happens via the bounded-heap GroupedTopK
  *    aggregate (shuffle O(probes × k)). Cost O(probes × vectors) — correct at any scale
  *    but linear in the corpus; the baseline the ANN tiers are judged
  *    against.
  *  - `ann_ivf_topk`    — IVF with the stored `label` as the coarse
  *    quantizer assignment (nprobe=1): search only the probe's own
  *    cluster. At 100 TB the cluster id is a parquet partition key →
  *    partition pruning makes the scan itself O(corpus / nlist).
  *  - `ann_lsh_topk`    — sign-LSH: 8 hyperplanes = coordinate signs of
  *    dims 1..8 → 256 buckets; candidates share the probe's bucket.
  *    Fully portable/deterministic (no RNG — the planes are axis-aligned;
  *    swap in seeded random hyperplanes at production scale).
  *
  * All cosine arithmetic is sequential-left-fold DOUBLE (bit-identical
  * in the DuckDB oracle); norms are computed once per vector before any
  * join.
  */
object Similarity {

  /** dot(x, y): native codegen'd left fold in double (same summation
    * order as the oracle's list_reduce — see [[graft.functions.FloatDot]]).
    */
  private def dot(x: Column, y: Column): Column =
    graft.functions.FloatDot.floatDot(x, y)

  /** Sign-LSH bucket of dims 1..8: Σ 2^(i-1)·[e_i > 0]. */
  private def signBucket(e: Column): Column = aggregate(
    transform(sequence(lit(1), lit(8)),
      i => when(element_at(e, i) > 0f, pow(lit(2), i - 1).cast("long")).otherwise(0L)),
    lit(0L), (acc, v) => acc + v)

  /** Vectors with precomputed squared norm (+ LSH bucket). */
  private def vecs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir).embeddings
      .repartition(s.sparkContext.defaultParallelism)
      .select(
      $"vec_id", $"label", $"embedding",
      dot($"embedding", $"embedding").as("norm2"),
      signBucket($"embedding").as("bucket"))
  }

  /** Per-probe top-k via the bounded-heap [[graft.functions.GroupedTopK]]
    * aggregate, not `row_number().over(partitionBy(probe))`: the window
    * form sorts EVERY candidate pair per probe partition, while the
    * aggregate keeps a k-element heap with partial aggregation — each map
    * task ships at most k pairs per probe, so at 100 TB the shuffle is
    * O(probes × k) and nothing is fully sorted. Ordering (cos desc,
    * neighbor asc) matches the oracle's row_number ordering exactly.
    */
  private def topk(pairs: DataFrame, k: Int)(implicit s: SparkSession): DataFrame = {
    import s.implicits._
    pairs
      .groupBy($"probe")
      .agg(graft.functions.GroupedTopK.groupedTopK($"cos", $"neighbor", k).as("top"))
      .select($"probe", posexplode($"top").as(Seq("pos", "t")))
      .select($"probe", ($"pos" + 1).as("rank"), $"t.id".as("neighbor"),
        round($"t.ord", 6).as("cos"))
      .orderBy($"probe", $"rank")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact brute-force baseline: 25 probes × corpus.
    "ann_topk" -> { (s, dir) =>
      implicit val sp: SparkSession = s
      import s.implicits._
      val v = vecs(s, dir)
      val probes = v.filter($"vec_id" < 25)
        .select($"vec_id".as("probe"), $"embedding".as("pe"), $"norm2".as("pn"))
      val pairs = v.join(broadcast(probes), $"vec_id" =!= $"probe")
        .withColumn("cos", dot($"pe", $"embedding") / sqrt($"pn" * $"norm2"))
        .select($"probe", $"vec_id".as("neighbor"), $"cos")
      topk(pairs, 10)
    },

    // IVF (nprobe=1): restrict the search to the probe's own cluster.
    "ann_ivf_topk" -> { (s, dir) =>
      implicit val sp: SparkSession = s
      import s.implicits._
      val v = vecs(s, dir)
      val probes = v.filter($"vec_id" < 50)
        .select($"vec_id".as("probe"), $"label".as("plabel"),
          $"embedding".as("pe"), $"norm2".as("pn"))
      val pairs = v.join(broadcast(probes),
        $"label" === $"plabel" && $"vec_id" =!= $"probe")
        .withColumn("cos", dot($"pe", $"embedding") / sqrt($"pn" * $"norm2"))
        .select($"probe", $"vec_id".as("neighbor"), $"cos")
      topk(pairs, 5)
    },

    // Sign-LSH: candidates share the probe's 8-bit sign bucket.
    "ann_lsh_topk" -> { (s, dir) =>
      implicit val sp: SparkSession = s
      import s.implicits._
      val v = vecs(s, dir)
      val probes = v.filter($"vec_id" < 50)
        .select($"vec_id".as("probe"), $"bucket".as("pbucket"),
          $"embedding".as("pe"), $"norm2".as("pn"))
      val pairs = v.join(broadcast(probes),
        $"bucket" === $"pbucket" && $"vec_id" =!= $"probe")
        .withColumn("cos", dot($"pe", $"embedding") / sqrt($"pn" * $"norm2"))
        .select($"probe", $"vec_id".as("neighbor"), $"cos")
      topk(pairs, 5)
    },

    "ann_centroids" -> { (s, dir) => centroids(s, dir) },

    "ann_quantize" -> { (s, dir) => quantize(s, dir) }
  )

  /** IVF "training" step: per-cluster centroids. Sums run in
    * DECIMAL(27,10) — exact and associative, so the result is identical
    * under any partitioning/aggregation order (a double sum would not
    * be); divided to double only at the end. Shape: posexplode →
    * partial+final HashAggregate on (label, pos).
    */
  private def centroids(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir).embeddings
      .select($"label", posexplode($"embedding").as(Seq("pos", "x")))
      .groupBy($"label", $"pos")
      // float → double first: Spark's float→decimal cast rounds via the
      // float's 7-digit shortest string; via double both engines round
      // the same exact binary value to 10 decimals.
      .agg((sum($"x".cast("double").cast("decimal(27,10)")).cast("double")
        / count(lit(1))).as("mean"))
      .filter($"pos" < 4) // report the leading components
      .orderBy($"label", $"pos")
  }

  /** Per-vector int8 quantization: scale by 127/max|x| and round —
    * the storage-shrink step before ANN serving.
    */
  private def quantize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val absMax = aggregate(
      transform($"embedding", x => abs(x.cast("double"))),
      lit(0.0), (acc, v) => greatest(acc, v))
    Tables(s, dir).embeddings
      .select($"vec_id", absMax.as("max_abs"),
        element_at($"embedding", 1).cast("double").as("x0"),
        element_at($"embedding", 8).cast("double").as("x7"))
      .select($"vec_id", round($"max_abs", 6).as("max_abs"),
        round($"x0" * 127.0 / $"max_abs").cast("long").as("q0"),
        round($"x7" * 127.0 / $"max_abs").cast("long").as("q7"))
      .orderBy($"vec_id")
  }

  /** Oracle CTE: vectors + norms (+ bucket), double arithmetic in the
    * same sequential fold order as the Spark side.
    */
  private val VecCte =
    """WITH v AS (
      |  SELECT vec_id, label, embedding,
      |    list_reduce(list_prepend(0.0::DOUBLE,
      |      list_transform(range(1, len(embedding) + 1),
      |        i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)),
      |      (x, y) -> x + y) AS norm2,
      |    list_reduce(list_prepend(0::BIGINT,
      |      list_transform(range(1, 9),
      |        i -> CASE WHEN embedding[i] > 0 THEN CAST(2**(i-1) AS BIGINT)
      |             ELSE 0::BIGINT END)),
      |      (x, y) -> x + y) AS bucket
      |  FROM embeddings)""".stripMargin

  private def oracleFor(probeLimit: Int, joinCond: String, k: Int): String =
    s"""$VecCte,
       |probes AS (SELECT vec_id AS probe, label AS plabel, bucket AS pbucket,
       |                  embedding AS pe, norm2 AS pn
       |           FROM v WHERE vec_id < $probeLimit),
       |pairs AS (
       |  SELECT p.probe, v.vec_id AS neighbor,
       |    list_reduce(list_prepend(0.0::DOUBLE,
       |      list_transform(range(1, len(p.pe) + 1),
       |        i -> p.pe[i]::DOUBLE * v.embedding[i]::DOUBLE)),
       |      (x, y) -> x + y) / sqrt(p.pn * v.norm2) AS cos
       |  FROM v JOIN probes p ON v.vec_id <> p.probe AND $joinCond),
       |ranked AS (
       |  SELECT probe, neighbor, cos,
       |    row_number() OVER (PARTITION BY probe ORDER BY cos DESC, neighbor) AS rank
       |  FROM pairs)
       |SELECT probe, rank, neighbor, round(cos, 6) AS cos
       |FROM ranked WHERE rank <= $k ORDER BY probe, rank""".stripMargin

  def oracle: Map[String, String] = Map(
    "ann_topk" -> oracleFor(25, "TRUE", 10),
    "ann_ivf_topk" -> oracleFor(50, "v.label = p.plabel", 5),
    "ann_lsh_topk" -> oracleFor(50, "v.bucket = p.pbucket", 5),

    "ann_centroids" ->
      """WITH e AS (
        |  SELECT label, i - 1 AS pos, embedding[i]::DOUBLE AS x
        |  FROM embeddings, (SELECT unnest(range(1, 129)) AS i) p
        |  WHERE i <= len(embedding))
        |SELECT label, pos,
        |  CAST(SUM(CAST(x AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*) AS mean
        |FROM e WHERE pos < 4 GROUP BY label, pos ORDER BY label, pos""".stripMargin,

    "ann_quantize" ->
      """WITH m AS (
        |  SELECT vec_id,
        |    list_reduce(list_prepend(0.0::DOUBLE,
        |      list_transform(embedding, x -> abs(x::DOUBLE))),
        |      (a, b) -> greatest(a, b)) AS max_abs,
        |    embedding[1]::DOUBLE AS x0, embedding[8]::DOUBLE AS x7
        |  FROM embeddings)
        |SELECT vec_id, round(max_abs, 6) AS max_abs,
        |  CAST(round(x0 * 127.0 / max_abs) AS BIGINT) AS q0,
        |  CAST(round(x7 * 127.0 / max_abs) AS BIGINT) AS q7
        |FROM m ORDER BY vec_id""".stripMargin
  )
}
