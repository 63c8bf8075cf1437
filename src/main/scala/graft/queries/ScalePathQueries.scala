package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Profiling, Similarity, TextDedup}
import graft.sources.Sources

/**
 * Round-11 scale-path twin gates (q297+): the operators whose round-10
 * gate ran on an exact all-pairs baseline get a SECOND gate over their
 * LSH-bucketed candidate path — same clustering/mining machinery, a pair
 * source whose plan contains no cartesian or broadcast-nested-loop join
 * (plan-asserted in PlanShapeSpec). This is the q41→q58 precedent applied
 * to DBSCAN and margin mining: the exact gate stays as the oracle
 * baseline; the twin proves the 100 TB code path bit-exactly against its
 * own DuckDB derivation.
 */
object ScalePathQueries {

  // q58's signature machinery: 16 seedless md5-parity hyperplanes,
  // 4 tables × 4 planes, over the 64-dim embeddings
  private val sigSql: String =
    """proj AS (
      |  SELECT vec_id, p,
      |    list_sum(list_transform(range(1, len(embedding) + 1),
      |      d -> embedding[d]::DOUBLE *
      |        ((strpos('0123456789abcdef',
      |            substr(md5(p::VARCHAR || '_' || (d - 1)::VARCHAR), 1, 1)) - 1)
      |          % 2 * 2 - 1))) AS proj
      |  FROM embeddings CROSS JOIN range(0, 16) t(p)),
      |sig AS (SELECT vec_id, p // 4 AS tbl,
      |          CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << (p % 4))
      |            ELSE 0 END) AS BIGINT) AS sig
      |        FROM proj GROUP BY vec_id, p // 4)""".stripMargin

  // Per-vector L2 norms hoisted ONCE (MATERIALIZED): the inline form
  // re-summed both norms per candidate PAIR, which put q297 on the
  // perturbation audit's 900 s budget-override list. sqrt → multiply →
  // divide runs in the identical order on identical doubles, so every
  // hashed cosine is bit-unchanged (same rewrite as q289Sql, verified
  // old-vs-new equal there).
  private val nvSql: String =
    """nv AS MATERIALIZED (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
      |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm
      |  FROM embeddings)""".stripMargin

  // pair cosine over nv rows a, b (requires $nvSql in the WITH chain)
  private val cosSql: String =
    """round(
      |    list_sum(list_transform(range(1, len(a.embedding) + 1),
      |      i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
      |    (a.nrm * b.nrm), 6)""".stripMargin

  // ── q297: DBSCAN over the LSH-bucketed ε-graph ─────────────────────────

  /** q297: [[Similarity.dbscanClustersFrom]] with the ε-graph from
    * [[Similarity.cosineNearDupPairsBucketed]] (4 tables × 4 planes,
    * cosine ≥ 0.375, minPts = 3) — q289's clustering machinery on the
    * candidate path that survives 10⁶+ vectors. Roles/clusters follow
    * the BUCKETED neighborhood (a recall-bounded subgraph of q289's
    * exact ε-graph), and the oracle reproduces the identical candidate
    * generation, so the gate is bit-exact, not approximate. */
  def q297DbscanBucketed(s: SparkSession, dir: String): DataFrame = {
    val emb = Sources.embeddings(s, dir)
    Similarity.dbscanClustersFrom(
        Similarity.cosineNearDupPairsBucketed(emb, "vec_id", "embedding",
            threshold = 0.375, nTables = 4, planesPerTable = 4, dims = 64)
          .select(col("d1"), col("d2")),
        emb.select(col("vec_id")), "vec_id", minPts = 3)
      .orderBy(col("vec_id"))
  }

  val q297Sql: String =
    s"""WITH RECURSIVE $sigSql,
      |$nvSql,
      |cand AS (SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
      |         FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.sig = b.sig
      |         WHERE a.vec_id < b.vec_id),
      |cs AS (SELECT c.d1, c.d2
      |       FROM cand c JOIN nv a ON a.vec_id = c.d1
      |                   JOIN nv b ON b.vec_id = c.d2
      |       WHERE $cosSql >= 0.375),
      |sym AS (SELECT d1 AS a, d2 AS b FROM cs
      |        UNION ALL SELECT d2, d1 FROM cs),
      |deg AS (SELECT a, COUNT(*) AS c FROM sym GROUP BY 1),
      |core AS (SELECT a AS node FROM deg WHERE c >= 3),
      |ce AS (SELECT d1, d2 FROM cs
      |       WHERE d1 IN (SELECT node FROM core)
      |         AND d2 IN (SELECT node FROM core)),
      |e AS (SELECT d1 AS a, d2 AS b FROM ce UNION SELECT d2, d1 FROM ce),
      |reach(n, m) AS (
      |  SELECT DISTINCT a AS n, a AS m FROM e
      |  UNION
      |  SELECT r.n, e.b FROM reach r JOIN e ON r.m = e.a),
      |comp AS (SELECT n, MIN(m) AS c FROM reach GROUP BY n),
      |cc AS (SELECT core.node, COALESCE(comp.c, core.node) AS cluster
      |       FROM core LEFT JOIN comp ON comp.n = core.node),
      |ba AS (SELECT s.a AS node, MIN(cc.cluster) AS cluster
      |       FROM sym s JOIN cc ON cc.node = s.b
      |       WHERE s.a NOT IN (SELECT node FROM core) GROUP BY s.a)
      |SELECT emb.vec_id,
      |  CASE WHEN cc.node IS NOT NULL THEN 'core'
      |       WHEN ba.node IS NOT NULL THEN 'border'
      |       ELSE 'noise' END AS role,
      |  CAST(COALESCE(cc.cluster, ba.cluster) AS BIGINT) AS cluster
      |FROM embeddings emb
      |LEFT JOIN cc ON cc.node = emb.vec_id
      |LEFT JOIN ba ON ba.node = emb.vec_id
      |ORDER BY emb.vec_id""".stripMargin

  // ── q298: margin mining over LSH cross-corpus candidates ───────────────

  /** q298: [[Similarity.marginMiningFrom]] over
    * [[Similarity.crossCorpusCandidates]] (even→odd halves, 4 tables ×
    * 4 planes, k = 4, τ = 1.05) — q247's ratio-margin criterion with
    * the candidate pool a real index would supply; neighborhood means
    * normalize over the pool (the CCMatrix practice). No cartesian in
    * the plan (PlanShapeSpec-asserted). */
  def q298MarginBucketed(s: SparkSession, dir: String): DataFrame = {
    val emb = Sources.embeddings(s, dir)
    Similarity.marginMiningFrom(
        Similarity.crossCorpusCandidates(
          emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") % 2 === 1),
          "vec_id", "embedding", nTables = 4, planesPerTable = 4,
          dims = 64),
        k = 4, tau = 1.05)
      .orderBy(col("src_id"))
  }

  val q298Sql: String =
    s"""WITH $sigSql,
      |$nvSql,
      |cand AS (SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS tgt_id
      |         FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.sig = b.sig
      |         WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1),
      |p AS (SELECT c.src_id, c.tgt_id,
      |        CAST($cosSql AS DECIMAL(18,6)) AS c
      |      FROM cand c JOIN nv a ON a.vec_id = c.src_id
      |                  JOIN nv b ON b.vec_id = c.tgt_id),
      |ra AS (SELECT *, row_number() OVER (PARTITION BY src_id
      |         ORDER BY c DESC, tgt_id) AS rna FROM p),
      |sa AS (SELECT src_id, SUM(c) AS sa, COUNT(*) AS ka
      |       FROM ra WHERE rna <= 4 GROUP BY 1),
      |rb AS (SELECT *, row_number() OVER (PARTITION BY tgt_id
      |         ORDER BY c DESC, src_id) AS rnb FROM p),
      |sb AS (SELECT tgt_id, SUM(c) AS sb, COUNT(*) AS kb
      |       FROM rb WHERE rnb <= 4 GROUP BY 1),
      |m AS (SELECT p.src_id, p.tgt_id, p.c,
      |        round(CAST(p.c AS DOUBLE) /
      |          ((CAST(sa.sa AS DOUBLE) / CAST(sa.ka AS DOUBLE) +
      |            CAST(sb.sb AS DOUBLE) / CAST(sb.kb AS DOUBLE)) / 2), 6)
      |          AS margin
      |      FROM p JOIN sa USING (src_id) JOIN sb USING (tgt_id)),
      |r AS (SELECT *, row_number() OVER (PARTITION BY src_id
      |        ORDER BY margin DESC, tgt_id) AS rn FROM m)
      |SELECT src_id, tgt_id, CAST(c AS DOUBLE) AS cosine, margin
      |FROM r WHERE rn = 1 AND margin >= 1.05 ORDER BY src_id""".stripMargin

  // ── q310: hubness audit over LSH-bucketed candidate lists ──────────────

  /** q310: [[Similarity.hubnessAuditFrom]] over
    * [[Similarity.cosineNearDupPairsBucketed]] candidates (4 tables ×
    * 4 planes, threshold −2 so every collided pair stays, k = 3) —
    * q264's k-occurrence N_k(x) computed within the candidate graph a
    * real ANN index would supply, which is exactly where hubness
    * corrupts recall measurements in production. The oracle reproduces
    * the identical candidate generation, so the gate is bit-exact. */
  def q310HubnessBucketed(s: SparkSession, dir: String): DataFrame = {
    val emb = Sources.embeddings(s, dir)
    Similarity.hubnessAuditFrom(
        Similarity.cosineNearDupPairsBucketed(emb, "vec_id", "embedding",
          threshold = -2.0, nTables = 4, planesPerTable = 4, dims = 64),
        emb.select(col("vec_id")), "vec_id", k = 3)
      .orderBy(col("vec_id"))
  }

  val q310Sql: String =
    s"""WITH $sigSql,
      |$nvSql,
      |cand AS (SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
      |         FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.sig = b.sig
      |         WHERE a.vec_id < b.vec_id),
      |p AS (SELECT c.d1, c.d2,
      |        CAST($cosSql AS DECIMAL(18,6)) AS c
      |      FROM cand c JOIN nv a ON a.vec_id = c.d1
      |                  JOIN nv b ON b.vec_id = c.d2),
      |sym AS (SELECT d1 AS src_id, d2 AS tgt_id, c FROM p
      |        UNION ALL SELECT d2, d1, c FROM p),
      |r AS (SELECT *, row_number() OVER (PARTITION BY src_id
      |        ORDER BY c DESC, tgt_id) AS rn FROM sym),
      |ind AS (SELECT tgt_id, COUNT(*) AS n_k FROM r
      |        WHERE rn <= 3 GROUP BY tgt_id)
      |SELECT e.vec_id, COALESCE(ind.n_k, 0) AS n_k,
      |  COALESCE(ind.n_k, 0) >= 6 AS is_hub,
      |  COALESCE(ind.n_k, 0) = 0 AS is_antihub
      |FROM embeddings e LEFT JOIN ind ON ind.tgt_id = e.vec_id
      |ORDER BY e.vec_id""".stripMargin

  // ── q336: onion layers over LSH-candidate 3-NN (q265's twin) ──────────

  /** q336: [[graft.operators.Graph.kCorePeel]] over the 3-NN graph built
    * from LSH candidate pairs ([[Similarity.knnEdgesFrom]]) — q265's
    * exact all-pairs kNN stayed quadratic by design (the r13 weak-
    * scaling bench measured it at ×13.6 for 5× rows); this is its
    * cartesian-free 100 TB path, completing the baseline-twin set
    * (q41→q58, q247→q298, q289→q297, q264→q310, q265→q336). A vector
    * with NO candidate is isolated under the index and reports
    * (layer 0, in_core false) — peeled before round 1, degree 0. */
  def q336OnionBucketed(s: SparkSession, dir: String): DataFrame = {
    val emb = Sources.embeddings(s, dir)
    val knn = Similarity.knnEdgesFrom(
      Similarity.cosineNearDupPairsBucketed(emb, "vec_id", "embedding",
        threshold = -2.0, nTables = 4, planesPerTable = 4, dims = 64),
      k = 3)
    val peel = graft.operators.Graph.kCorePeel(knn, "a", "b", k = 4)
    emb.select(col("vec_id"))
      .join(peel.select(col("node").as("vec_id"), col("layer"),
        col("in_core")), Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("in_core").isNull, lit(0L)).otherwise(col("layer"))
          .as("layer"),
        coalesce(col("in_core"), lit(false)).as("in_core"))
      .orderBy(col("vec_id"))
  }

  // ── q338: hot-bucket-capped LSH near-dup pairs (the capped scale path) ──

  /** q338: [[Similarity.cosineNearDupPairsBucketedCapped]] — q58's
    * candidate generator with the r13-verdict hot-bucket cap
    * (maxBucket = 40: at sf0.01 that excludes the densest buckets, so
    * the gate exercises the exclusion rule, not just the happy path).
    * The oracle replays the identical census + cap, so the DETERMINISTIC
    * exclusion semantics are hash-verified, and the per-bucket candidate
    * fan-out is ≤ 40² by construction regardless of corpus density. */
  def q338CappedDupBucketed(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairsBucketedCapped(Sources.embeddings(s, dir),
        "vec_id", "embedding", threshold = 0.45, maxBucket = 40L,
        nTables = 4, planesPerTable = 4, dims = 64)
      .orderBy(col("d1"), col("d2"))

  val q338Sql: String =
    s"""WITH $sigSql,
      |$nvSql,
      |sizes AS (SELECT tbl, sig, COUNT(*) AS bs FROM sig GROUP BY 1, 2),
      |keep AS (SELECT tbl, sig FROM sizes WHERE bs <= 40),
      |ksig AS (SELECT s.vec_id, s.tbl, s.sig
      |         FROM sig s JOIN keep USING (tbl, sig)),
      |cand AS (SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
      |         FROM ksig a JOIN ksig b ON a.tbl = b.tbl AND a.sig = b.sig
      |         WHERE a.vec_id < b.vec_id),
      |pairs AS (SELECT c.d1, c.d2, $cosSql AS cosine
      |  FROM cand c JOIN nv a ON a.vec_id = c.d1
      |              JOIN nv b ON b.vec_id = c.d2)
      |SELECT d1, d2, cosine FROM pairs WHERE cosine >= 0.45
      |ORDER BY d1, d2""".stripMargin

  // ── q346: the production-configured cap (engages only under density) ──

  /** q346: [[Similarity.cosineNearDupPairsBucketedCapped]] at the
    * production configuration — maxBucket = 200, ABOVE every bucket at
    * the test SFs (sf0.01 max 49, sf0.1 max 177), so here the output
    * equals q58's and the oracle hash-verifies that an inactive cap is
    * a no-op. The cap exists for densification: on the 5× weak-scaling
    * corpus buckets reach ~600–900 members and the cap bounds the
    * pair-stage fan-out at 200² per bucket where the uncapped q58 path
    * grows as (5B)² — the BENCH_SCALING row that demonstrates the
    * insurance engaging (r13 verdict item 1's ≤ ~×3 criterion), while
    * q338's aggressive cap gates the exclusion RULE itself. */
  def q346CappedDupScaled(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairsBucketedCapped(Sources.embeddings(s, dir),
        "vec_id", "embedding", threshold = 0.45, maxBucket = 200L,
        nTables = 4, planesPerTable = 4, dims = 64)
      .orderBy(col("d1"), col("d2"))

  val q346Sql: String =
    s"""WITH $sigSql,
      |$nvSql,
      |sizes AS (SELECT tbl, sig, COUNT(*) AS bs FROM sig GROUP BY 1, 2),
      |keep AS (SELECT tbl, sig FROM sizes WHERE bs <= 200),
      |ksig AS (SELECT s.vec_id, s.tbl, s.sig
      |         FROM sig s JOIN keep USING (tbl, sig)),
      |cand AS (SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
      |         FROM ksig a JOIN ksig b ON a.tbl = b.tbl AND a.sig = b.sig
      |         WHERE a.vec_id < b.vec_id),
      |pairs AS (SELECT c.d1, c.d2, $cosSql AS cosine
      |  FROM cand c JOIN nv a ON a.vec_id = c.d1
      |              JOIN nv b ON b.vec_id = c.d2)
      |SELECT d1, d2, cosine FROM pairs WHERE cosine >= 0.45
      |ORDER BY d1, d2""".stripMargin

  // ── q350: salt-split hot buckets — the recall-preserving cap ──────────

  /** q350: [[Similarity.cosineNearDupPairsBucketedSaltSplit]] at q338's
    * exact configuration (maxBucket = 40, which ENGAGES at both test
    * SFs: sf0.01 max bucket 49, sf0.1 max 177) — over-cap buckets are
    * round-robin split into ⌈B/40⌉ sub-buckets and ALL sub-bucket block
    * pairs are joined, so every pair of the original bucket is still
    * generated while no single join cell exceeds 40² rows.
    *
    * The oracle is DELIBERATELY the UNCAPPED q58 computation (verbatim
    * candidate join, no split replay): hash-green here IS the proof
    * that the salt-split pair set equals the uncapped pair set on a
    * fixture where the cap engages — the r13–r15 verdicts' done-bar.
    * A split replay in the oracle could mask a dropped cross-block
    * pair; the uncapped oracle cannot. */
  def q350SaltSplitDup(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairsBucketedSaltSplit(
        Sources.embeddings(s, dir), "vec_id", "embedding",
        threshold = 0.45, maxBucket = 40L,
        nTables = 4, planesPerTable = 4, dims = 64)
      .orderBy(col("d1"), col("d2"))

  val q350Sql: String =
    s"""WITH $sigSql,
      |$nvSql,
      |cand AS (SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
      |         FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.sig = b.sig
      |         WHERE a.vec_id < b.vec_id),
      |pairs AS (SELECT c.d1, c.d2, $cosSql AS cosine
      |  FROM cand c JOIN nv a ON a.vec_id = c.d1
      |              JOIN nv b ON b.vec_id = c.d2)
      |SELECT d1, d2, cosine FROM pairs WHERE cosine >= 0.45
      |ORDER BY d1, d2""".stripMargin

  // ── q356: embedding dedup survivors over the salt-split path ──────────

  /** q356: the production embedding-dedup decision end-to-end on the
    * q350 machinery — salt-split LSH pairs (lossless, bounded cells) →
    * [[graft.operators.Graph.connectedComponents]] (HashMin: the
    * component label IS the min member id, i.e. the survivor) → one
    * decision row per duplicate cluster. This is the path that sidesteps
    * the quadratic-pair-output concern entirely: at 100 TB the pair set
    * is an intermediate, the CLUSTER table is the deliverable, and the
    * q83 keep-best discipline applies on top. The oracle replays the
    * uncapped candidates + full reachability, so the salt-split's
    * losslessness is hash-proven through the CLUSTER level too. */
  def q356EmbeddingDedup(s: SparkSession, dir: String): DataFrame = {
    val emb = Sources.embeddings(s, dir)
    val pairs = Similarity.cosineNearDupPairsBucketedSaltSplit(emb,
      "vec_id", "embedding", threshold = 0.45, maxBucket = 40L,
      nTables = 4, planesPerTable = 4, dims = 64)
    val comp = graft.operators.Graph.connectedComponents(
      pairs.select(col("d1"), col("d2")), "d1", "d2")
    comp.groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"))
      .select(col("component").as("cluster"),
        col("component").as("survivor_id"),
        col("n_members"),
        (col("n_members") - 1).as("n_removed"))
      .orderBy(col("cluster"))
  }

  val q356Sql: String =
    s"""WITH RECURSIVE $sigSql,
      |$nvSql,
      |cand AS (SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
      |         FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.sig = b.sig
      |         WHERE a.vec_id < b.vec_id),
      |cs AS (SELECT c.d1, c.d2
      |       FROM cand c JOIN nv a ON a.vec_id = c.d1
      |                   JOIN nv b ON b.vec_id = c.d2
      |       WHERE $cosSql >= 0.45),
      |e AS (SELECT d1 AS a, d2 AS b FROM cs
      |      UNION SELECT d2, d1 FROM cs),
      |reach(n, m) AS (
      |  SELECT DISTINCT a AS n, a AS m FROM e
      |  UNION
      |  SELECT r.n, e.b FROM reach r JOIN e ON r.m = e.a),
      |comp AS (SELECT n AS node, MIN(m) AS component FROM reach
      |         GROUP BY n),
      |sz AS (SELECT component, COUNT(*) AS n_members FROM comp
      |       GROUP BY 1)
      |SELECT component AS cluster, component AS survivor_id,
      |  n_members, n_members - 1 AS n_removed
      |FROM sz ORDER BY cluster""".stripMargin

  // ── q358: salt-split hot buckets on the TEXT MinHash-LSH path ─────────

  /** q358: [[TextDedup.minHashLshPairs]] at q19's exact configuration
    * (k = 16, r = 4, w = 3, threshold 0.5) with the r17 hot-bucket
    * policy ENGAGED: `maxBucket = 2`, which bites at both test SFs
    * (band-bucket max is 3 at sf0.01, 4 at sf0.1 — measured via the
    * oracle's own band CTE), so over-cap band buckets really do take
    * the salt-split block-join path here, not the plain single-key
    * join. The oracle is DELIBERATELY q19's UNCAPPED chain verbatim:
    * hash-green IS the proof that the text salt split loses no pair
    * (the q350 done-bar applied to the text twin — a split replay in
    * the oracle could mask a dropped cross-block pair; the uncapped
    * oracle cannot). PropertySpec holds the any-corpus/any-cap law. */
  def q358SaltSplitText(s: SparkSession, dir: String): DataFrame =
    TextDedup.minHashLshPairs(Sources.documents(s, dir), "doc_id", "text",
        k = 16, r = 4, w = 3, threshold = 0.5, maxBucket = Some(2L))
      .orderBy(col("d1"), col("d2"))

  val q358Sql: String = PipelineQueries.q19Sql

  // ── q375: incremental embedding dedup vs the cap-split stored index ────

  /** q375: [[Similarity.annIndex]] (maxBucket = 1 — the cap bites in
    * EVERY multi-member bucket) + [[Similarity.dedupAgainstAnnIndex]] —
    * the q362 pattern on the embedding side (the r17 verdict's item 2):
    * the even-id half is indexed with build-time cap-split, the odd-id
    * half arrives as the batch, candidates run census (METADATA here:
    * ≤ nTables·2^planes buckets, broadcast) → explode ≤ m → block join
    * with ≤ cap index rows per cell, then exact cosine ≥ 0.45 verifies.
    * The oracle is the UNCAPPED new×old collision chain (q338's
    * scaffolding restricted to even×odd), so hash-green proves the
    * build-time split loses no candidate — incremental ANN dedup of an
    * arriving batch against a 100 TB corpus index is the production
    * serving shape, and the index's hot buckets (its most-duplicated
    * content) are pre-split ONCE for every future batch. */
  def q375EmbIndexDedup(s: SparkSession, dir: String): DataFrame = {
    val emb = Sources.embeddings(s, dir)
    val corpus = emb.filter(col("vec_id") % 2 === 0)
    val idx = Similarity.annIndex(corpus, "vec_id", "embedding",
      nTables = 4, planesPerTable = 4, dims = 64, maxBucket = Some(1L))
    Similarity.dedupAgainstAnnIndex(emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", idx, corpus, threshold = 0.45,
        nTables = 4, planesPerTable = 4, dims = 64)
      .orderBy(col("d_new"), col("d_old"))
  }

  val q375Sql: String =
    s"""WITH $sigSql,
      |$nvSql,
      |cand AS (SELECT DISTINCT y.vec_id AS d_new, x.vec_id AS d_old
      |         FROM sig x JOIN sig y ON x.tbl = y.tbl AND x.sig = y.sig
      |         WHERE x.vec_id % 2 = 0 AND y.vec_id % 2 = 1),
      |pairs AS (SELECT c.d_new, c.d_old, $cosSql AS cosine
      |  FROM cand c JOIN nv a ON a.vec_id = c.d_new
      |              JOIN nv b ON b.vec_id = c.d_old)
      |SELECT d_new, d_old, cosine FROM pairs WHERE cosine >= 0.45
      |ORDER BY d_new, d_old""".stripMargin

  // ── q378/q379: the census→config prescription, gated ───────────────────

  /** The [[Profiling.dedupPolicyAudit]] decision chain over any CTE
    * prefix ending in `census(bs)`: size histogram → exact rank picks
    * (lower median, p99, dup-bucket lower median) → decision CASE with
    * the Scala side's literals replayed. */
  private def policyAuditSql(censusCtes: String, capTarget: Long,
                             spaceSize: Option[Long]): String = {
    val sat = spaceSize.map(s => s"n_rows >= $s").getOrElse("FALSE")
    val space = spaceSize.getOrElse(0L)
    s"""WITH $censusCtes,
      |hist AS (SELECT bs AS sz, COUNT(*) AS nb FROM census GROUP BY 1),
      |cum AS (SELECT sz, SUM(nb) OVER (ORDER BY sz) AS c FROM hist),
      |tot AS (SELECT CAST(COALESCE(SUM(nb), 0) AS BIGINT) AS n_buckets,
      |               CAST(COALESCE(SUM(sz * nb), 0) AS BIGINT) AS n_rows,
      |               CAST(COALESCE(MAX(sz), 0) AS BIGINT) AS max_bucket
      |        FROM hist),
      |p50 AS (SELECT CAST(COALESCE(MIN(sz), 0) AS BIGINT) AS p50_bucket
      |        FROM cum, tot WHERE c * 2 >= n_buckets),
      |p99 AS (SELECT CAST(COALESCE(MIN(sz), 0) AS BIGINT) AS p99_bucket
      |        FROM cum, tot WHERE c * 100 >= n_buckets * 99),
      |dcum AS (SELECT sz, SUM(nb) OVER (ORDER BY sz) AS c FROM hist
      |         WHERE sz >= 2),
      |dtot AS (SELECT COALESCE(SUM(nb), 0) AS dn FROM hist WHERE sz >= 2),
      |mult AS (SELECT CAST(COALESCE(MIN(sz), 0) AS BIGINT)
      |           AS multiplicity_est
      |         FROM dcum, dtot WHERE c * 2 >= dn)
      |SELECT n_buckets, n_rows, CAST($space AS BIGINT) AS space_size,
      |  max_bucket, p50_bucket, p99_bucket, multiplicity_est,
      |  CAST(CASE WHEN max_bucket <= $capTarget THEN 0
      |            WHEN $sat THEN multiplicity_est - 1
      |            ELSE $capTarget END AS BIGINT) AS rec_cap,
      |  CASE WHEN max_bucket <= $capTarget THEN 'uncapped'
      |       WHEN $sat THEN 'widen+drop-cap'
      |       WHEN max_bucket * max_bucket > n_rows
      |         THEN 'exact-dedup+salt-split'
      |       ELSE 'salt-split' END AS policy
      |FROM tot, p50, p99, mult""".stripMargin
  }

  /** q378: [[Profiling.dedupPolicyAudit]] on the SKEWED-fixture shape —
    * the MinHash band census ([[TextDedup.lshBandBucketSizes]], q19's
    * config) at capTarget = 2 (q358's gated salt-split cap). Band
    * hashes live in md5 space (spaceSize = None: saturation is
    * impossible, density can only be content replication), so the hot
    * tail (max 3 at sf0.01, 4 at sf0.1, over a p50 of 1) prescribes the
    * LOSSLESS salt-split — the q350/q358/q361/q362 configuration choice,
    * now a gated decision row instead of prose. */
  def q378PolicyAuditSkew(s: SparkSession, dir: String): DataFrame =
    Profiling.dedupPolicyAudit(
      TextDedup.lshBandBucketSizes(Sources.documents(s, dir),
        "doc_id", "text", k = 16, r = 4, w = 3),
      "bucket_size", capTarget = 2L, spaceSize = None)

  val q378Sql: String = policyAuditSql(
    """ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(1, len(w) - 1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      |       FROM ws WHERE len(w) >= 3),
      |hw AS (SELECT doc_id,
      |         CAST(list_sum(list_transform(range(1, 9), j ->
      |           (strpos('0123456789abcdef', substr(md5('a_' || s), j, 1)) - 1)
      |             * (1::BIGINT << (4 * (8 - j))))) AS BIGINT) AS h1,
      |         CAST(list_sum(list_transform(range(1, 9), j ->
      |           (strpos('0123456789abcdef', substr(md5('b_' || s), j, 1)) - 1)
      |             * (1::BIGINT << (4 * (8 - j))))) AS BIGINT) AS h2
      |       FROM sh),
      |sig AS (SELECT doc_id, i, min((h1 + i * h2) % 4294967296) AS sig
      |        FROM hw CROSS JOIN range(0, 16) t(i) GROUP BY doc_id, i),
      |bands AS (SELECT doc_id, i // 4 AS band,
      |            md5(string_agg(sig::VARCHAR, ',' ORDER BY i)) AS bh
      |          FROM sig GROUP BY doc_id, i // 4),
      |census AS (SELECT COUNT(*) AS bs FROM bands GROUP BY band, bh)""".stripMargin,
    capTarget = 2L, spaceSize = None)

  /** q379: [[Profiling.dedupPolicyAudit]] on the DENSE-fixture shape —
    * the 32-bit SimHash slice census ([[TextDedup.hammingBucketSizes]],
    * q109's config) at capTarget = 12 (q372's original cap) with the
    * slice space's true size (4 bands × 2⁸ = 1024). n_rows ≥ spaceSize
    * at both SFs (expected occupancy ≥ 1 — chance collisions dominate,
    * q363's measured negative), so the audit prescribes widen+drop-cap
    * with rec_cap = multiplicity − 1 — at sf0.1 that is cap 8,
    * mechanically reproducing q376's hand-chosen tight cap from the
    * census alone. */
  def q379PolicyAuditDense(s: SparkSession, dir: String): DataFrame =
    Profiling.dedupPolicyAudit(
      TextDedup.hammingBucketSizes(
        TextDedup.simHash(Sources.documents(s, dir), "doc_id", "text"),
        "doc_id", "simhash", bits = 32, bands = 4),
      "bucket_size", capTarget = 12L, spaceSize = Some(1024L))

  val q379Sql: String = policyAuditSql(
    PipelineQueries.simHashSliceSql(32, 8) +
      ",\ncensus AS (SELECT COUNT(*) AS bs FROM sl GROUP BY sl, sv)",
    capTarget = 12L, spaceSize = Some(1024L))

  /** q382: [[Profiling.dedupPolicyAudit]] on the ADVERSARIAL-skew
    * fixture the r18 verdict asked for — half the corpus collapsed onto
    * ONE text (every even doc_id), so four band buckets each hold
    * n_docs/2 members: the pathological pile no natural corpus slice
    * exhibits. The dominant-pile quadratic guard (max_bucket² > n_rows
    * — the biggest pile's pairwise output exceeds corpus-linear work)
    * fires and the audit prescribes exact-dedup BEFORE any pairwise
    * stage, salt-splitting only the residual. This branch is the r19
    * 10× measurement pair mechanized: the text salt-split held ×2.91 at
    * 10× (pile max ~40, 40² ≪ 200k slice rows) while the embedding
    * salt-split read ×19.04 (pile ~1770, 1770² ≫ 400k) — same lossless
    * operator, pile size flips the regime, and a lossless pairwise
    * stage on a giant identical pile is output-quadratic no matter the
    * plan shape. */
  def q382PolicyAuditPile(s: SparkSession, dir: String): DataFrame =
    Profiling.dedupPolicyAudit(
      TextDedup.lshBandBucketSizes(pileDocs(s, dir), "doc_id", "text",
        k = 16, r = 4, w = 3),
      "bucket_size", capTarget = 2L, spaceSize = None)

  /** The adversarial-pile fixture shared by q382 (the audit's DECISION)
    * and q385/q386 (the prescription's VALUE): half the corpus collapsed
    * onto ONE text — every even doc_id — so four band buckets each hold
    * n_docs/2 members. */
  private def pileDocs(s: SparkSession, dir: String): DataFrame =
    Sources.documents(s, dir).select(col("doc_id"),
      when(col("doc_id") % 2 === 0, lit("x y z w v"))
        .otherwise(col("text")).as("text"))

  /** SQL twin of [[pileDocs]] (CTE named `docs`). */
  private val pileDocsSql: String =
    """docs AS (SELECT doc_id,
      |           CASE WHEN doc_id % 2 = 0 THEN 'x y z w v' ELSE text END
      |             AS text
      |         FROM documents)""".stripMargin

  val q382Sql: String = policyAuditSql(
    s"""$pileDocsSql,
      |ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM docs),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(1, len(w) - 1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      |       FROM ws WHERE len(w) >= 3),
      |hw AS (SELECT doc_id,
      |         CAST(list_sum(list_transform(range(1, 9), j ->
      |           (strpos('0123456789abcdef', substr(md5('a_' || s), j, 1)) - 1)
      |             * (1::BIGINT << (4 * (8 - j))))) AS BIGINT) AS h1,
      |         CAST(list_sum(list_transform(range(1, 9), j ->
      |           (strpos('0123456789abcdef', substr(md5('b_' || s), j, 1)) - 1)
      |             * (1::BIGINT << (4 * (8 - j))))) AS BIGINT) AS h2
      |       FROM sh),
      |sig AS (SELECT doc_id, i, min((h1 + i * h2) % 4294967296) AS sig
      |        FROM hw CROSS JOIN range(0, 16) t(i) GROUP BY doc_id, i),
      |bands AS (SELECT doc_id, i // 4 AS band,
      |            md5(string_agg(sig::VARCHAR, ',' ORDER BY i)) AS bh
      |          FROM sig GROUP BY doc_id, i // 4),
      |census AS (SELECT COUNT(*) AS bs FROM bands GROUP BY band, bh)""".stripMargin,
    capTarget = 2L, spaceSize = None)

  // ── q380/q381: the embedding index at PRODUCTION cap vs uncapped ──────

  /** q380: q375's incremental-dedup chain at the PRODUCTION cap —
    * [[Similarity.annIndex]](maxBucket = 40, q338/q350's production
    * number) instead of q375's deliberately-maximal cap 1. The cap is
    * inactive at sf0.01 (even-id index bucket max 26 — the q346
    * convention: an inactive cap is hash-proven a no-op) and ENGAGES at
    * sf0.1 (62 over-cap buckets, max 98), where hash-green against the
    * same UNCAPPED oracle chain proves the build-time split is lossless
    * at the cap a deployment would actually ship. The r18 verdict's
    * missing BENCH_SCALING row (a production cap winning outright on
    * the embedding index, the q362 text precedent) benches THIS gate
    * against q381. */
  def q380EmbIndexProdCap(s: SparkSession, dir: String): DataFrame = {
    val emb = Sources.embeddings(s, dir)
    val corpus = emb.filter(col("vec_id") % 2 === 0)
    val idx = Similarity.annIndex(corpus, "vec_id", "embedding",
      nTables = 4, planesPerTable = 4, dims = 64, maxBucket = Some(40L))
    Similarity.dedupAgainstAnnIndex(emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", idx, corpus, threshold = 0.45,
        nTables = 4, planesPerTable = 4, dims = 64)
      .orderBy(col("d_new"), col("d_old"))
  }

  /** q381: the UNCAPPED comparator — the same chain over a plain
    * [[Similarity.annIndex]] (no build-time split; the collision join
    * takes the single-key shuffle_hash path). Exists so the weak-
    * scaling bench can read capped (q380) against uncapped (q381) on
    * identical corpora — sf0.1 output is identical by losslessness,
    * the PLANS differ. */
  def q381EmbIndexUncapped(s: SparkSession, dir: String): DataFrame = {
    val emb = Sources.embeddings(s, dir)
    val corpus = emb.filter(col("vec_id") % 2 === 0)
    val idx = Similarity.annIndex(corpus, "vec_id", "embedding",
      nTables = 4, planesPerTable = 4, dims = 64, maxBucket = None)
    Similarity.dedupAgainstAnnIndex(emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", idx, corpus, threshold = 0.45,
        nTables = 4, planesPerTable = 4, dims = 64)
      .orderBy(col("d_new"), col("d_old"))
  }

  /** q384: [[Profiling.dedupPolicyAudit]] on the fourth census family —
    * the EMBEDDING signature census ([[Similarity.lshBucketSizes]],
    * q58's 4×4-plane config) at capTarget = 40 (q338's production cap)
    * with the true space size (4 tables × 2⁴ = 64). The space is FULLY
    * saturated at both SFs (all 64 buckets occupied; n_rows 2000/8000 ≫
    * 64; max 49/177 — hash-pinning the exact numbers q350's scaladoc
    * quotes) so the audit reads widen+drop-cap: more planes per table
    * is the widen knob here (bucket space grows 2^planes), after which
    * the cap is RE-DERIVED by re-running the audit on the widened
    * census — in a saturated space multiplicity_est measures the
    * saturation level, not pile size, so rec_cap from THIS census is a
    * pre-widening reading (the audit→widen→re-audit→cap workflow q379
    * established; the post-widening production cap is q338/q380's 40). */
  def q384PolicyAuditEmb(s: SparkSession, dir: String): DataFrame =
    Profiling.dedupPolicyAudit(
      Similarity.lshBucketSizes(Sources.embeddings(s, dir),
        "vec_id", "embedding", nTables = 4, planesPerTable = 4,
        dims = 64),
      "bucket_size", capTarget = 40L, spaceSize = Some(64L))

  val q384Sql: String = policyAuditSql(
    sigSql + ",\ncensus AS (SELECT COUNT(*) AS bs FROM sig GROUP BY tbl, sig)",
    capTarget = 40L, spaceSize = Some(64L))

  /** q387: the audit→WIDEN→re-audit→cap loop closed (r19 verdict item
    * 2). q384 reads the 4×4-plane embedding census as SATURATED (n_rows
    * ≥ space 64), where `multiplicity_est` measures the saturation
    * level, not pile size — its rec_cap is knowingly a pre-widening
    * reading and the policy row says `widen+drop-cap`. THIS gate
    * performs the widen — planesPerTable 4 → 16, bucket space 4·2¹⁶ =
    * 262,144 ≫ n_rows 8,000/32,000 — and re-runs [[Profiling
    * .dedupPolicyAudit]] at the same capTarget on the WIDENED census
    * ([[Similarity.lshBucketSizes]] — still ONE map-side-combinable
    * hash-agg; the census stays ≤ min(corpus·tables, space) rows),
    * emitting the USABLE post-widening prescription. What it reveals on
    * the base corpus: the apparent piles (max 49/177 in the 16-value
    * space, hash-pinned by q384) were chance saturation collisions, not
    * content piles — the widened census reads max_bucket 2/4 ≤
    * capTarget, policy `uncapped`, rec_cap 0 at BOTH SFs (there are no
    * duplicate embedding vectors in the base corpora). On a pile-bearing
    * corpus the same re-audit reads the pile instead: identical vectors
    * sign identically in ANY widened space, so the verbatim scale
    * corpora's exact-copy piles become the widened max_bucket —
    * measured (BENCH_NOTES_r20): max_bucket = base-max × K exactly
    * (20/40/80 at 5×/10×/20×) with multiplicity_est = K (the verbatim
    * pile signature), and the policy flips to `salt-split` with
    * rec_cap 40 at 20×, the densification where piles exceed the cap —
    * the audit→widen→re-audit loop mechanically re-deriving q338/q380's
    * hand-chosen production cap. */
  def q387PolicyReauditWidened(s: SparkSession, dir: String): DataFrame =
    Profiling.dedupPolicyAudit(
      Similarity.lshBucketSizes(Sources.embeddings(s, dir),
        "vec_id", "embedding", nTables = 4, planesPerTable = 16,
        dims = 64),
      "bucket_size", capTarget = 40L, spaceSize = Some(262144L))

  val q387Sql: String = policyAuditSql(
    """proj AS (
      |  SELECT vec_id, p,
      |    list_sum(list_transform(range(1, len(embedding) + 1),
      |      d -> embedding[d]::DOUBLE *
      |        ((strpos('0123456789abcdef',
      |            substr(md5(p::VARCHAR || '_' || (d - 1)::VARCHAR), 1, 1)) - 1)
      |          % 2 * 2 - 1))) AS proj
      |  FROM embeddings CROSS JOIN range(0, 64) t(p)),
      |sig AS (SELECT vec_id, p // 16 AS tbl,
      |          CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << (p % 16))
      |            ELSE 0 END) AS BIGINT) AS sig
      |        FROM proj GROUP BY vec_id, p // 16),
      |census AS (SELECT COUNT(*) AS bs FROM sig GROUP BY tbl, sig)""".stripMargin,
    capTarget = 40L, spaceSize = Some(262144L))

  // ── q385/q386: the dominant-pile prescription run END-TO-END ──────────

  /** q385: [[TextDedup.exactThenLshDedup]] on q382's adversarial-pile
    * fixture — the exact chain q382's gated decision row prescribes
    * ("exact-dedup+salt-split"), run end-to-end so the audit's
    * highest-value branch has machine-checked VALUE, not just a
    * machine-checked decision (r19 verdict item 1). [[TextDedup
    * .exactDedup]] collapses the n/2-member pile (and sf0.1's natural
    * duplicate texts) to one survivor each; the q358 salt-split LSH
    * (maxBucket = 2 — engaging on the residual, whose natural band
    * buckets reach 3/4 at the test SFs) runs over survivors only, so
    * the pairwise stage never sees the pile. The oracle is the FULL
    * lossless UNCAPPED chain over the whole fixture corpus — q19's
    * computation, paying the B(B−1)/2 within-pile pairs in DuckDB —
    * collapsed to the prescription's pile-compressed form, with an
    * in-oracle `error()` guard (the q336 convention) proving the
    * collapse lossless: every same-text pair IS a full-chain candidate
    * (identical texts ⇒ identical bands), counted and compared to
    * Σ c(c−1)/2. Hash-green = the cheap chain carries exactly the
    * lossless chain's information. */
  def q385PilePrescribed(s: SparkSession, dir: String): DataFrame =
    TextDedup.exactThenLshDedup(pileDocs(s, dir), "doc_id", "text",
        k = 16, r = 4, w = 3, threshold = 0.5, maxBucket = Some(2L))
      .orderBy(col("kind"), col("d1"), col("d2"))

  /** q386: the NAIVE lossless comparator — the full uncapped
    * [[TextDedup.minHashLshPairs]] over the pile corpus (deliberately
    * paying the B²/2 within-pile candidate AND verify rows the
    * prescription avoids), collapsed AFTERWARDS to q385's output form:
    * within-group pairs with d1 = the group's min id ARE the member
    * map; cross-group pairs map to survivor pairs (jaccard is a pure
    * function of the two texts, so the collapse dedups bit-identical
    * rows). Shares q385's oracle — both hash-green proves prescribed ≡
    * naive ≡ the DuckDB lossless chain; BENCH_SCALING reads THIS gate
    * against q385 at 5×/10× for the quadratic-bend-flattened evidence
    * (the q380-vs-q381 shape, on the pile). */
  def q386PileNaive(s: SparkSession, dir: String): DataFrame = {
    val docs = pileDocs(s, dir)
    val pairs = TextDedup.minHashLshPairs(docs, "doc_id", "text",
      k = 16, r = 4, w = 3, threshold = 0.5, maxBucket = None)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("text"))
    val groups = docs.select(col("doc_id"),
      min(col("doc_id")).over(w).as("graft_surv"))
    // r20: lineage-cut — `j` feeds BOTH the exact and near branches, and
    // without the cut each branch re-ran the ENTIRE uncapped LSH chain
    // (the deliberately-quadratic naive path, the single most expensive
    // subtree in the suite) — the gate was paying its evidence cost
    // twice. The cut halves the gate without touching what it computes:
    // the naive chain still runs, exactly once.
    val j = pairs
      .join(groups.select(col("doc_id").as("d1"),
        col("graft_surv").as("graft_s1")), "d1")
      .join(groups.select(col("doc_id").as("d2"),
        col("graft_surv").as("graft_s2")), "d2")
      .localCheckpoint(eager = false)
    val exact = j
      .filter(col("graft_s1") === col("graft_s2") &&
        col("d1") === col("graft_s1"))
      .select(col("d1"), col("d2"), col("jaccard"), lit("exact").as("kind"))
    val near = j.filter(col("graft_s1") =!= col("graft_s2"))
      .select(least(col("graft_s1"), col("graft_s2")).as("d1"),
        greatest(col("graft_s1"), col("graft_s2")).as("d2"),
        col("jaccard"), lit("near").as("kind"))
      .distinct()
    exact.unionByName(near).orderBy(col("kind"), col("d1"), col("d2"))
  }

  /** q385/q386's shared oracle: the full-corpus UNCAPPED q19 chain over
    * the pile fixture, collapsed to the prescription's output form.
    * The `wg`-vs-`expect` guard machine-checks the collapse theorem
    * inside the oracle itself (riding the always-non-empty exact rows,
    * lazily via CASE — the q336 guard convention). */
  val q385Sql: String =
    s"""WITH $pileDocsSql,
      |g AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS surv
      |      FROM docs),
      |ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM docs),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(1, len(w) - 1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      |       FROM ws WHERE len(w) >= 3),
      |hw AS (SELECT doc_id,
      |         CAST(list_sum(list_transform(range(1, 9), j ->
      |           (strpos('0123456789abcdef', substr(md5('a_' || s), j, 1)) - 1)
      |             * (1::BIGINT << (4 * (8 - j))))) AS BIGINT) AS h1,
      |         CAST(list_sum(list_transform(range(1, 9), j ->
      |           (strpos('0123456789abcdef', substr(md5('b_' || s), j, 1)) - 1)
      |             * (1::BIGINT << (4 * (8 - j))))) AS BIGINT) AS h2
      |       FROM sh),
      |sig AS (SELECT doc_id, i, min((h1 + i * h2) % 4294967296) AS sig
      |        FROM hw CROSS JOIN range(0, 16) t(i) GROUP BY doc_id, i),
      |bands AS (SELECT doc_id, i // 4 AS band,
      |            md5(string_agg(sig::VARCHAR, ',' ORDER BY i)) AS bh
      |          FROM sig GROUP BY doc_id, i // 4),
      |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      |         FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
      |         WHERE a.doc_id < b.doc_id),
      |wg AS (SELECT COUNT(*) AS n FROM cand c
      |       JOIN g g1 ON g1.doc_id = c.d1
      |       JOIN g g2 ON g2.doc_id = c.d2
      |       WHERE g1.surv = g2.surv),
      |expect AS (SELECT COALESCE(SUM(c * (c - 1) // 2), 0) AS n
      |           FROM (SELECT COUNT(*) AS c FROM docs GROUP BY text)),
      |nearc AS (SELECT DISTINCT least(g1.surv, g2.surv) AS d1,
      |            greatest(g1.surv, g2.surv) AS d2
      |          FROM cand c JOIN g g1 ON g1.doc_id = c.d1
      |                      JOIN g g2 ON g2.doc_id = c.d2
      |          WHERE g1.surv <> g2.surv),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT c.d1, c.d2, count(*) AS inter FROM nearc c
      |          JOIN sh a ON a.doc_id = c.d1
      |          JOIN sh b ON b.doc_id = c.d2 AND b.s = a.s
      |          GROUP BY c.d1, c.d2)
      |SELECT d1, d2, jaccard, kind FROM (
      |  SELECT surv AS d1, doc_id AS d2, CAST(1.0 AS DOUBLE) AS jaccard,
      |    CASE WHEN (SELECT n FROM wg) <> (SELECT n FROM expect)
      |         THEN error('within-group LSH candidate set incomplete: the member-map collapse would be lossy')
      |         ELSE 'exact' END AS kind
      |  FROM g WHERE doc_id <> surv
      |  UNION ALL
      |  SELECT i.d1, i.d2,
      |    CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter) AS jaccard,
      |    'near' AS kind
      |  FROM inter i JOIN sz s1 ON i.d1 = s1.doc_id
      |               JOIN sz s2 ON i.d2 = s2.doc_id
      |  WHERE CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter) >= 0.5)
      |ORDER BY kind, d1, d2""".stripMargin

  // ── q383: incremental Hamming dedup vs the cap-split stored index ─────

  /** q383: [[TextDedup.hammingIndex]] (maxBucket = 1 — the cap bites in
    * EVERY multi-member slice bucket) + [[TextDedup
    * .dedupAgainstHammingIndex]] — the stored-index serving shape
    * completed for the THIRD dedup family (text q64/q362, embeddings
    * q375/q380; Hamming/phash previously had only self-join forms), on
    * the family's scale config (simHashWide 60-bit, 4×15-bit slices,
    * maxDist 3 — exact pigeonhole recall). Even ids are indexed with
    * build-time cap-split, odd ids arrive as the batch; the census is
    * metadata BY THE SPACE ITSELF (≤ 4·2¹⁵ occupied buckets regardless
    * of corpus size) so it broadcasts, then explode ≤ m → block join
    * with ≤ cap index rows per cell. Verification is a pure function of
    * the two hashes riding the rows — no second verify table. The
    * oracle is the UNCAPPED new×old slice-collision chain: hash-green
    * IS the losslessness proof (the q375 convention). */
  def q383HammingIndexDedup(s: SparkSession, dir: String): DataFrame =
    hammingIndexDedupAt(s, dir, maxBucket = Some(1L))

  /** The q383 chain with the index cap as the only knob — q383 gates
    * the deliberately-maximal split (cap 1), q388 the production cap,
    * q389 the uncapped comparator; all three share the UNCAPPED oracle
    * (the cap parameter is hash-proven lossless at every setting). */
  private def hammingIndexDedupAt(s: SparkSession, dir: String,
                                  maxBucket: Option[Long]): DataFrame = {
    val hashed = TextDedup.simHashWide(
      Sources.documents(s, dir), "doc_id", "text", 60)
    val idx = TextDedup.hammingIndex(
      hashed.filter(col("doc_id") % 2 === 0), "doc_id", "simhash",
      bits = 60, bands = 4, maxBucket = maxBucket)
    TextDedup.dedupAgainstHammingIndex(
        hashed.filter(col("doc_id") % 2 === 1), "doc_id", "simhash",
        idx, bits = 60, bands = 4, maxDist = 3)
      .orderBy(col("d_new"), col("d_old"))
  }

  /** q388: the Hamming stored index at a PRODUCTION cap (r19 verdict
    * item 5 — the q380 precedent on the Hamming column): maxBucket = 16
    * ≈ the census's hot-tail knee, ENGAGING at both SFs (even-id slice
    * buckets reach 78 at sf0.01 and 788 at sf0.1 — measured via the
    * oracle's own slice CTE), so over-cap buckets really take the
    * build-time round-robin split (m up to ⌈788/16⌉ = 50 cells) while
    * the under-cap tail rides the plain join. Same UNCAPPED oracle as
    * q383: hash-green IS the losslessness proof at the cap a deployment
    * would ship; BENCH_SCALING reads this gate against q389 for the
    * production-cap-wins-outright row. */
  def q388HammingIndexProdCap(s: SparkSession, dir: String): DataFrame =
    hammingIndexDedupAt(s, dir, maxBucket = Some(16L))

  /** q389: the UNCAPPED comparator — the same chain over a plain
    * [[TextDedup.hammingIndex]] (no build-time split; the collision
    * join takes the single-key shuffle_hash path, funnelling each hot
    * slice bucket through one join cell). Exists so the weak-scaling
    * bench can read capped (q383/q388) against uncapped on identical
    * corpora — output identical by losslessness, the PLANS differ
    * (q380-vs-q381, third family). */
  def q389HammingIndexUncapped(s: SparkSession, dir: String): DataFrame =
    hammingIndexDedupAt(s, dir, maxBucket = None)

  val q383Sql: String =
    s"""WITH ${PipelineQueries.simHashSliceSql(60, 15)},
      |cand AS (SELECT DISTINCT y.doc_id AS d_new, x.doc_id AS d_old,
      |           y.simhash AS h1, x.simhash AS h2
      |         FROM sl x JOIN sl y ON x.sl = y.sl AND x.sv = y.sv
      |         WHERE x.doc_id % 2 = 0 AND y.doc_id % 2 = 1)
      |SELECT d_new, d_old,
      |  CAST(bit_count(xor(h1, h2)) AS INTEGER) AS hamming
      |FROM cand WHERE bit_count(xor(h1, h2)) <= 3
      |ORDER BY d_new, d_old""".stripMargin

  // ── q339: the cap's explicit exclusion report ──────────────────────────

  /** q339: [[Similarity.lshExcludedBuckets]] — the buckets q338's cap
    * drops, as visible rows (tbl, sig, bucket_size). Exclusion must
    * never be silent: this is the table a dedup run publishes next to
    * its pair count so a reader can audit the recall trade. */
  def q339ExcludedBuckets(s: SparkSession, dir: String): DataFrame =
    Similarity.lshExcludedBuckets(Sources.embeddings(s, dir),
        "vec_id", "embedding", maxBucket = 40L,
        nTables = 4, planesPerTable = 4, dims = 64)
      .orderBy(col("tbl"), col("sig"))

  val q339Sql: String =
    s"""WITH $sigSql
      |SELECT tbl, sig, COUNT(*) AS bucket_size
      |FROM sig GROUP BY 1, 2 HAVING COUNT(*) > 40
      |ORDER BY tbl, sig""".stripMargin

  val q336Sql: String = {
    // q265's simultaneous-peel round, verbatim, over the candidate graph
    def peel(i: Int): String =
      s"""w$i AS MATERIALIZED (SELECT v.node FROM v${i - 1} v
         |  LEFT JOIN (SELECT a, COUNT(*) AS d FROM e${i - 1} GROUP BY a) g
         |    ON g.a = v.node
         |  WHERE COALESCE(g.d, 0) < 4),
         |l$i AS (SELECT node, $i AS layer FROM w$i),
         |v$i AS MATERIALIZED (SELECT v.node FROM v${i - 1} v
         |  LEFT JOIN w$i w ON w.node = v.node WHERE w.node IS NULL),
         |e$i AS MATERIALIZED (SELECT e.a, e.b FROM e${i - 1} e
         |  LEFT JOIN w$i wa ON wa.node = e.a
         |  LEFT JOIN w$i wb ON wb.node = e.b
         |  WHERE wa.node IS NULL AND wb.node IS NULL)""".stripMargin
    val rounds = (1 to 10).map(peel).mkString(",\n")
    val layerUnion = (1 to 10)
      .map(i => s"SELECT * FROM l$i").mkString(" UNION ALL ")
    // Convergence guard (r13 ADVICE): the oracle unrolls 10 peel rounds
    // while Spark's kCorePeel runs to convergence (≤ 50) — a fixture
    // needing an 11th round would silently report still-falling nodes as
    // in-core. g11 is what round 11 WOULD peel; if non-empty, error()
    // aborts the oracle with an explicit message (a loud err row in the
    // gate, not a confusing hash red). CASE guarantees lazy evaluation.
    val guard =
      """g11 AS (SELECT v.node FROM v10 v
        |  LEFT JOIN (SELECT a, COUNT(*) AS d FROM e10 GROUP BY a) g
        |    ON g.a = v.node
        |  WHERE COALESCE(g.d, 0) < 4)""".stripMargin
    s"""WITH $sigSql,
      |$nvSql,
      |cand AS (SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
      |         FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.sig = b.sig
      |         WHERE a.vec_id < b.vec_id),
      |p AS (SELECT c.d1, c.d2,
      |        CAST($cosSql AS DECIMAL(18,6)) AS c
      |      FROM cand c JOIN nv a ON a.vec_id = c.d1
      |                  JOIN nv b ON b.vec_id = c.d2),
      |sym AS (SELECT d1 AS src_id, d2 AS tgt_id, c FROM p
      |        UNION ALL SELECT d2, d1, c FROM p),
      |r AS (SELECT *, row_number() OVER (PARTITION BY src_id
      |        ORDER BY c DESC, tgt_id) AS rn FROM sym),
      |d0 AS (SELECT src_id AS a, tgt_id AS b FROM r WHERE rn <= 3),
      |e0 AS MATERIALIZED (SELECT DISTINCT a, b FROM (
      |        SELECT a, b FROM d0 UNION ALL SELECT b, a FROM d0)
      |       WHERE a <> b),
      |v0 AS MATERIALIZED (SELECT DISTINCT a AS node FROM e0),
      |$rounds,
      |$guard,
      |ly AS ($layerUnion)
      |SELECT emb.vec_id,
      |  CASE WHEN v0.node IS NULL THEN 0
      |       ELSE CAST(ly.layer AS BIGINT) END AS layer,
      |  CASE WHEN v0.node IS NULL THEN FALSE
      |       ELSE ly.layer IS NULL END AS in_core
      |FROM embeddings emb
      |LEFT JOIN v0 ON v0.node = emb.vec_id
      |LEFT JOIN ly ON ly.node = emb.vec_id
      |WHERE CASE WHEN (SELECT COUNT(*) FROM g11) = 0 THEN TRUE
      |  ELSE error('q336 oracle: peel needs >10 rounds') IS NOT NULL END
      |ORDER BY emb.vec_id""".stripMargin
  }
}
