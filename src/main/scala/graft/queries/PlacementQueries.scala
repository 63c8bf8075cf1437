package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Histogram, Layout, Sampling, Similarity}
import graft.sources.Sources

/** Round-7 placement/selection operators: rendezvous-hash shard
  * assignment, isotonic (PAV) score calibration, and farthest-point
  * coreset selection — each with a DuckDB oracle reproducing the
  * arithmetic exactly (q168's oracle replays the greedy traversal as a
  * chained-CTE program, so the gate proves every selection step). */
object PlacementQueries {

  // ── q166: rendezvous-hash sharding ─────────────────────────────────────

  /** q166: documents routed to 8 serving shards by highest-random-weight
    * hashing (one salted-md5 weight per shard, argmax), with per-shard
    * balance stats — the coordination-free placement every worker
    * computes identically; pure single projection, one metadata-scale
    * agg. */
  def q166Rendezvous(s: SparkSession, dir: String): DataFrame =
    Sources.documents(s, dir)
      .select(col("doc_id"), col("n_chars"),
        Layout.shardOf(col("doc_id"), 8).as("shard"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast(LongType).as("total_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("shard"))

  val q166Sql: String =
    """WITH f AS (SELECT doc_id, n_chars,
      |    unnest(range(0, 8)) AS shard FROM documents),
      |h AS (SELECT doc_id, n_chars, shard,
      |        CAST(list_sum(list_transform(range(1, 13), j ->
      |          (strpos('0123456789abcdef', substr(md5('rv'
      |             || CAST(shard AS VARCHAR) || '_'
      |             || CAST(doc_id AS VARCHAR)), j, 1)) - 1)
      |          * (1::BIGINT << (4 * (12 - j))))) AS BIGINT) AS hv
      |      FROM f),
      |a AS (SELECT doc_id, n_chars, shard FROM h
      |      QUALIFY row_number() OVER (PARTITION BY doc_id
      |        ORDER BY hv DESC, shard) = 1)
      |SELECT shard, count(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM a GROUP BY shard ORDER BY shard""".stripMargin

  // ── q167: isotonic calibration (PAV) ───────────────────────────────────

  /** q167: the q141 reliability diagram pushed through pool-adjacent-
    * violators via the minimax identity — per bin: raw empirical rate
    * and the monotone isotonic fit; the O(B³) minimax runs in one
    * nested-HOF projection over a single metadata-scale row. */
  def q167Isotonic(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val e = Sources.embeddings(s, dir).select(
      round(element_at(col("embedding"), 1).cast(DoubleType) * 1000000.0, 0)
        .cast(LongType).as("q"),
      when(col("label") <= 4, 1L).otherwise(0L).as("pos"))
    val bins = Histogram.calibrationBins(e, "q", "pos", bits = 4,
      mn = -1000000L, mx = 1000000L)
    Histogram.isotonicCalibration(bins, "bucket", "n", "n_pos")
      .orderBy(col("bucket"))
  }

  val q167Sql: String =
    """WITH q AS (SELECT
      |    CAST(round(embedding[1]::DOUBLE * 1000000.0, 0) AS BIGINT) AS q,
      |    CASE WHEN label <= 4 THEN 1 ELSE 0 END AS pos
      |  FROM embeddings),
      |c AS (SELECT LEAST(GREATEST(q, -1000000), 1000000) AS cq, pos FROM q),
      |b AS (SELECT ((cq + 1000000) * 15) // 2000000 AS bucket, pos FROM c),
      |g AS (SELECT bucket, count(*) AS n, CAST(SUM(pos) AS BIGINT) AS np
      |      FROM b GROUP BY bucket),
      |arr AS (SELECT list(bucket ORDER BY bucket) AS bk,
      |               list(n ORDER BY bucket) AS ns,
      |               list(np ORDER BY bucket) AS ps,
      |               count(*) AS m
      |        FROM g),
      |fit AS (SELECT bk, ns, ps,
      |          list_transform(range(1, m + 1), i ->
      |            list_max(list_transform(range(1, i + 1), j ->
      |              list_min(list_transform(range(i, m + 1), k ->
      |                round(CAST(list_sum(ps[j:k]) AS DOUBLE)
      |                  / CAST(list_sum(ns[j:k]) AS DOUBLE), 6)))))) AS iso
      |        FROM arr)
      |SELECT unnest(bk) AS bucket, unnest(ns) AS n, unnest(ps) AS n_pos,
      |  round(unnest(ps)::DOUBLE / unnest(ns), 6) AS raw_rate,
      |  unnest(iso) AS iso_rate
      |FROM fit ORDER BY bucket""".stripMargin

  // ── q168: farthest-point coreset ───────────────────────────────────────

  /** q168: greedy farthest-point traversal over the embeddings (k = 6,
    * start at min vec_id) — the 2-approximate k-center coreset; the
    * oracle replays the same greedy program as a chained-CTE pipeline,
    * so the gate proves every selection step, not just the final set. */
  def q168FarthestPoints(s: SparkSession, dir: String): DataFrame =
    Similarity.farthestPoints(Sources.embeddings(s, dir), "vec_id",
        "embedding", k = 6)
      .orderBy(col("sel_idx"))

  val q168Sql: String = {
    val dist = (a: String, b: String) =>
      s"round(list_sum(list_transform(range(1, 65), j -> " +
        s"($a.v[j]::DOUBLE - $b.v[j]::DOUBLE) * " +
        s"($a.v[j]::DOUBLE - $b.v[j]::DOUBLE))), 6)"
    val stages = new StringBuilder(
      s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
         |c0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
         |d1 AS (SELECT e.vec_id, e.v, ${dist("e", "c")} AS dm
         |       FROM e, c0 c),
         |c1 AS (SELECT vec_id, v, dm FROM d1 WHERE dm > 0
         |       ORDER BY dm DESC, vec_id LIMIT 1)""".stripMargin)
    for (i <- 2 to 5) {
      stages.append(
        s""",
           |d$i AS (SELECT d.vec_id, d.v,
           |         LEAST(d.dm, ${dist("d", "c")}) AS dm
           |       FROM d${i - 1} d, c${i - 1} c),
           |c$i AS (SELECT vec_id, v, dm FROM d$i WHERE dm > 0
           |       ORDER BY dm DESC, vec_id LIMIT 1)""".stripMargin)
    }
    stages.append(
      """
        |SELECT CAST(0 AS BIGINT) AS sel_idx, vec_id,
        |  CAST(NULL AS DOUBLE) AS dmin FROM c0
        |""".stripMargin)
    for (i <- 1 to 5)
      stages.append(
        s"UNION ALL SELECT CAST($i AS BIGINT), vec_id, dm FROM c$i\n")
    stages.append("ORDER BY sel_idx")
    stages.toString
  }

  // ── q169: weighted sample without replacement (A-ES) ───────────────────

  /** q169: exactly 10 docs per lang, sampled WITHOUT replacement with
    * probability proportional to length — Efraimidis–Spirakis keys from
    * salted md5, one projection + a WindowGroupLimit rank cut. */
  def q169WeightedTopK(s: SparkSession, dir: String): DataFrame =
    Sampling.weightedTopKPerStratum(
        Sources.documents(s, dir).select(col("doc_id"), col("lang"),
          col("n_chars")),
        "doc_id", "n_chars", "lang", salt = "aes", k = 10)
      .orderBy(col("lang"), col("doc_id"))

  val q169Sql: String =
    """WITH h AS (SELECT lang, doc_id, n_chars,
      |    CAST(list_sum(list_transform(range(1, 13), j ->
      |      (strpos('0123456789abcdef', substr(md5('aes_'
      |         || CAST(doc_id AS VARCHAR)), j, 1)) - 1)
      |      * (1::BIGINT << (4 * (12 - j))))) AS BIGINT) AS hv
      |  FROM documents),
      |k AS (SELECT lang, doc_id, n_chars,
      |        ln((hv + 1) / 281474976710656.0) / n_chars AS key
      |      FROM h)
      |SELECT lang, doc_id, n_chars FROM k
      |QUALIFY row_number() OVER (PARTITION BY lang
      |  ORDER BY key DESC, doc_id) <= 10
      |ORDER BY lang, doc_id""".stripMargin

  // ── q172: shard-rebalance audit ────────────────────────────────────────

  /** q172: what moves when the fleet grows 8 → 9 shards — per old shard:
    * how many keys leave (all leavers land on the NEW shard under
    * rendezvous hashing, ~1/9 of keys overall). The gate-checked proof
    * of the minimal-movement property on real data; two codegen'd
    * projections, one metadata-scale agg. */
  def q172ShardMoves(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    Sources.documents(s, dir)
      .select(col("doc_id"),
        Layout.shardOf(col("doc_id"), 8).as("old_shard"),
        Layout.shardOf(col("doc_id"), 9).as("graft_s9"))
      .groupBy(col("old_shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("old_shard") =!= col("graft_s9"), 1L).otherwise(0L))
          .cast(LongType).as("n_moved"))
      .withColumn("moved_frac",
        round(col("n_moved").cast(DoubleType) / col("n_docs"), 6))
      .orderBy(col("old_shard"))
  }

  val q172Sql: String =
    """WITH f AS (SELECT doc_id,
      |    unnest(range(0, 9)) AS shard FROM documents),
      |h AS (SELECT doc_id, shard,
      |        CAST(list_sum(list_transform(range(1, 13), j ->
      |          (strpos('0123456789abcdef', substr(md5('rv'
      |             || CAST(shard AS VARCHAR) || '_'
      |             || CAST(doc_id AS VARCHAR)), j, 1)) - 1)
      |          * (1::BIGINT << (4 * (12 - j))))) AS BIGINT) AS hv
      |      FROM f),
      |a8 AS (SELECT doc_id, shard AS s8 FROM h WHERE shard < 8
      |       QUALIFY row_number() OVER (PARTITION BY doc_id
      |         ORDER BY hv DESC, shard) = 1),
      |a9 AS (SELECT doc_id, shard AS s9 FROM h
      |       QUALIFY row_number() OVER (PARTITION BY doc_id
      |         ORDER BY hv DESC, shard) = 1)
      |SELECT a8.s8 AS old_shard, count(*) AS n_docs,
      |  CAST(SUM(CASE WHEN a8.s8 <> a9.s9 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_moved,
      |  round(CAST(SUM(CASE WHEN a8.s8 <> a9.s9 THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*), 6) AS moved_frac
      |FROM a8 JOIN a9 USING (doc_id)
      |GROUP BY a8.s8 ORDER BY old_shard""".stripMargin

  // ── q181: Hilbert-curve layout ─────────────────────────────────────────

  /** q181: the q84 clustering layout on the HILBERT curve — strictly
    * better locality than Morton order (consecutive cells always
    * grid-adjacent, no Z-jumps); per 1024-cell bucket: row count and
    * both dimensions' ranges. The 8-level rotation fold is unrolled at
    * plan time into one codegen'd projection; the oracle replays the
    * levels as chained CTEs. */
  def q181HilbertLayout(s: SparkSession, dir: String): DataFrame = {
    val ev = Sources.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"))
    Layout.withHilbertValue(ev, "user_id", "tus", bits = 8)
      .withColumn("bucket", call_function("div", col("hv"), lit(1024L)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_events"),
        min(col("user_id")).as("min_u"), max(col("user_id")).as("max_u"),
        min(col("tus")).as("min_t"), max(col("tus")).as("max_t"))
      .orderBy(col("bucket"))
  }

  // the level recurrence runs as a RECURSIVE CTE (per-level
  // materialization): inlining 8 levels as nested expressions would
  // nest x/y twice per level — exponential tree, same hazard the Spark
  // side avoids with its aggregate() fold
  val q181Sql: String =
    """WITH RECURSIVE e AS (SELECT user_id, epoch_us(ts) AS tus
      |                     FROM events),
      |s AS (SELECT MIN(user_id) AS amn, MAX(user_id) AS amx,
      |             MIN(tus) AS bmn, MAX(tus) AS bmx FROM e),
      |g0 AS (SELECT user_id, tus,
      |        CASE WHEN s.amx = s.amn THEN 0
      |          ELSE ((user_id - s.amn) * 255) // (s.amx - s.amn)
      |        END AS x,
      |        CASE WHEN s.bmx = s.bmn THEN 0
      |          ELSE ((tus - s.bmn) * 255) // (s.bmx - s.bmn)
      |        END AS y,
      |        CAST(0 AS BIGINT) AS d
      |      FROM e CROSS JOIN s),
      |hil(user_id, tus, x, y, d, lvl) AS (
      |  SELECT user_id, tus, x, y, d, 7 FROM g0
      |  UNION ALL
      |  SELECT user_id, tus,
      |    CASE WHEN (y & (1 << lvl)) > 0 THEN x
      |         WHEN (x & (1 << lvl)) > 0 THEN (1 << lvl) - 1 - y
      |         ELSE y END,
      |    CASE WHEN (y & (1 << lvl)) > 0 THEN y
      |         WHEN (x & (1 << lvl)) > 0 THEN (1 << lvl) - 1 - x
      |         ELSE x END,
      |    d + (1 << lvl) * (1 << lvl) * xor(
      |      3 * (CASE WHEN (x & (1 << lvl)) > 0 THEN 1 ELSE 0 END),
      |      CASE WHEN (y & (1 << lvl)) > 0 THEN 1 ELSE 0 END),
      |    lvl - 1
      |  FROM hil WHERE lvl >= 0)
      |SELECT d // 1024 AS bucket, count(*) AS n_events,
      |  min(user_id) AS min_u, max(user_id) AS max_u,
      |  min(tus) AS min_t, max(tus) AS max_t
      |FROM hil WHERE lvl = -1 GROUP BY 1 ORDER BY bucket""".stripMargin
}
