package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.kv.KvOps
import graft.shard.Sharding

/** The declared key-value query surface (SURVEY §2.3, K1–K10) as
  * oracle-checked queries. The op log is derived deterministically from
  * the `events` table ([[KvOps.opLog]]) including duplicate deliveries,
  * so the DuckDB oracle can re-derive the identical history in SQL and
  * pin the replay semantics (models/kv.go:40-54) and exactly-once dedup
  * (K4) down to the byte.
  */
object KvQueries {

  /** Shared oracle prefix: re-derives [[KvOps.opLog]] and the K4 dedup
    * (first delivery per (clientId, clientSeq) wins) in SQL.
    */
  private val OpsCte =
    """WITH base0 AS (
      |  SELECT event_id AS seq, user_id AS clientId, event_id AS clientSeq,
      |    CASE WHEN event_type = 'signup' THEN 'put'
      |         WHEN event_type IN ('purchase', 'click') THEN 'append'
      |         ELSE 'get' END AS op,
      |    chr(97 + CAST(user_id % 26 AS INTEGER)) AS key
      |  FROM events),
      |base AS (
      |  SELECT *, CASE WHEN op = 'get' THEN ''
      |    ELSE 'x' || clientId || '.' || seq || 'y' END AS value FROM base0),
      |ops AS (
      |  SELECT * FROM base
      |  UNION ALL
      |  SELECT seq + 1000000000, clientId, clientSeq, op, key, value
      |  FROM base WHERE seq % 7 = 0),
      |d AS (SELECT *, row_number() OVER (PARTITION BY clientId, clientSeq
      |                                   ORDER BY seq) AS rn FROM ops),
      |a AS (SELECT * FROM d WHERE rn = 1)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // K1-K4: final state per key after ordered, deduped replay.
    "kv_replay" -> { (s, dir) =>
      import s.implicits._
      KvOps.replay(KvOps.opLog(s, dir)).toDF().orderBy($"key")
    },

    // K1 linearizable reads: the state each Get observed.
    "kv_get_view" -> { (s, dir) =>
      import s.implicits._
      KvOps.reads(KvOps.opLog(s, dir)).toDF().orderBy($"seq")
    },

    // K5: shard routing distribution over all delivered ops (routing
    // happens per RPC, before dedup — shardkv/client.go:68-96).
    "kv_key2shard" -> { (s, dir) =>
      import s.implicits._
      KvOps.opLog(s, dir).toDF()
        .select($"key", (ascii(substring($"key", 1, 1)) % Sharding.NShards).as("shard"))
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_ops"), countDistinct($"key").as("n_keys"))
        .orderBy($"shard")
    },

    // K6: config-consulting routing — each delivered op resolves its
    // shard through the broadcast ShardConfig (the scripted final
    // config), exactly how shardkv clerks route
    // (shardkv/client.go:72-93); output is ops per replica group.
    "kv_shard_routing" -> { (s, dir) =>
      import s.implicits._
      val cfg = Sharding.scriptedHistory.last
      val cfgDf = cfg.shards.zipWithIndex
        .map { case (gid, shard) => (shard, gid) }.toDF("shard", "gid")
      KvOps.opLog(s, dir).toDF()
        .select((ascii(substring($"key", 1, 1)) % Sharding.NShards).as("shard"))
        .join(broadcast(cfgDf), "shard")
        .groupBy($"gid")
        .agg(count(lit(1)).as("n_ops"), countDistinct($"shard").as("n_shards"))
        .orderBy($"gid")
    },

    // K7-K10: the scripted Join/Join/Leave/Move config evolution; output
    // pins the deterministic greedy rebalance assignment.
    "shard_rebalance" -> { (s, _) =>
      import s.implicits._
      val c = Sharding.scriptedHistory.last
      c.shards.zipWithIndex
        .map { case (gid, shard) => (shard, gid, c.num) }
        .toDF("shard", "gid", "config_num")
        .orderBy($"shard")
    }
  )

  def oracle: Map[String, String] = Map(
    "kv_replay" ->
      s"""$OpsCte,
         |lp AS (SELECT key, max(CASE WHEN op = 'put' THEN seq END) AS lps
         |       FROM a GROUP BY key),
         |pv AS (SELECT a.key, a.value AS putv
         |       FROM a JOIN lp ON a.key = lp.key AND a.seq = lp.lps),
         |ap AS (SELECT a.key, string_agg(a.value, '' ORDER BY a.seq) AS apv
         |       FROM a JOIN lp ON a.key = lp.key
         |       WHERE a.op = 'append' AND a.seq > COALESCE(lp.lps, -1)
         |       GROUP BY a.key),
         |napp AS (SELECT key, count(*) FILTER (WHERE op <> 'get') AS n_applied
         |         FROM a GROUP BY key)
         |SELECT n.key, COALESCE(pv.putv, '') || COALESCE(ap.apv, '') AS value,
         |       n.n_applied
         |FROM napp n
         |LEFT JOIN pv ON pv.key = n.key
         |LEFT JOIN ap ON ap.key = n.key
         |ORDER BY n.key""".stripMargin,

    "kv_get_view" ->
      s"""$OpsCte,
         |e AS (SELECT *, count(CASE WHEN op = 'put' THEN 1 END)
         |        OVER (PARTITION BY key ORDER BY seq
         |              ROWS UNBOUNDED PRECEDING) AS epoch FROM a),
         |runs AS (SELECT *, string_agg(CASE WHEN op = 'append' THEN value END, '')
         |           OVER (PARTITION BY key, epoch ORDER BY seq
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS appr
         |         FROM e),
         |pb AS (SELECT key, epoch, value AS putv FROM e WHERE op = 'put')
         |SELECT r.seq, r.key, COALESCE(pb.putv, '') || COALESCE(r.appr, '') AS observed
         |FROM runs r LEFT JOIN pb ON pb.key = r.key AND pb.epoch = r.epoch
         |WHERE r.op = 'get' ORDER BY r.seq""".stripMargin,

    "kv_key2shard" ->
      s"""$OpsCte
         |SELECT ascii(substring(key, 1, 1)) % ${Sharding.NShards} AS shard,
         |       count(*) AS n_ops, count(DISTINCT key) AS n_keys
         |FROM ops GROUP BY 1 ORDER BY 1""".stripMargin,

    "kv_shard_routing" ->
      s"""$OpsCte,
         |cfg(shard, gid) AS (VALUES
         |  (0, 1), (1, 1), (2, 4), (3, 1), (4, 1),
         |  (5, 3), (6, 5), (7, 3), (8, 3), (9, 5)),
         |routed AS (
         |  SELECT ascii(substring(key, 1, 1)) % ${Sharding.NShards} AS shard FROM ops)
         |SELECT gid, count(*) AS n_ops, count(DISTINCT r.shard) AS n_shards
         |FROM routed r JOIN cfg ON r.shard = cfg.shard
         |GROUP BY gid ORDER BY gid""".stripMargin,

    // Pinned by hand-tracing the documented deterministic greedy
    // algorithm through the scripted history (see Sharding.scaladoc).
    "shard_rebalance" ->
      """SELECT * FROM (VALUES
        |  (0, 1, 4), (1, 1, 4), (2, 4, 4), (3, 1, 4), (4, 1, 4),
        |  (5, 3, 4), (6, 5, 4), (7, 3, 4), (8, 3, 4), (9, 5, 4))
        |AS t(shard, gid, config_num) ORDER BY shard""".stripMargin
  )
}
