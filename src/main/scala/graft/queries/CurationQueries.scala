package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{LatestSnapshot, Sampling, Similarity, TextAnalysis, TextDedup, VectorAggs}
import graft.sources.Sources

/** Round-3 training-pipeline widening: reproducible train/val/test
  * splitting, per-language quality curation, and deterministic distributed
  * k-means — each with a DuckDB oracle reproducing the md5/decimal
  * arithmetic exactly. */
object CurationQueries {

  // ── q59: deterministic stratified-reporting train/val/test split ───────

  /** q59: 80/10/10 split of the document corpus by md5 bucket (seedless,
    * repartition-stable), with the language tag carried for stratified
    * reporting — the reproducible-holdout primitive a training pipeline
    * needs (TABLESAMPLE/rand() are partitioning-dependent in Spark). */
  def q59Split(s: SparkSession, dir: String): DataFrame = {
    val langs = TextAnalysis.languageId(Sources.documents(s, dir),
      "doc_id", "text")
    Sampling.deterministicSplit(langs, "doc_id", "split",
        Seq(("train", 204), ("val", 230), ("test", 256)))
      .select(col("doc_id"), col("predicted_lang"), col("split"))
      .orderBy(col("doc_id"))
  }

  val q59Sql: String =
    """WITH w AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws
      |           FROM documents),
      |h AS (SELECT doc_id,
      |  len(list_intersect(ws, ['the','and','of','to','in'])) AS en,
      |  len(list_intersect(ws, ['el','la','de','que','los'])) AS es,
      |  len(list_intersect(ws, ['le','la','et','les','des'])) AS fr,
      |  len(list_intersect(ws, ['der','die','und','das','ist'])) AS de
      |FROM w),
      |langs AS (SELECT doc_id,
      |  CASE WHEN greatest(en, es, fr, de) = 0 THEN 'und'
      |       WHEN en >= es AND en >= fr AND en >= de THEN 'en'
      |       WHEN es >= fr AND es >= de THEN 'es'
      |       WHEN fr >= de THEN 'fr'
      |       ELSE 'de' END AS predicted_lang
      |FROM h),
      |b AS (SELECT doc_id,
      |  (strpos('0123456789abcdef',
      |     substr(md5('split_' || doc_id), 1, 1)) - 1) * 16
      |  + strpos('0123456789abcdef',
      |     substr(md5('split_' || doc_id), 2, 1)) - 1 AS bucket
      |  FROM documents)
      |SELECT l.doc_id, l.predicted_lang,
      |  CASE WHEN b.bucket < 204 THEN 'train'
      |       WHEN b.bucket < 230 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM langs l JOIN b ON l.doc_id = b.doc_id
      |ORDER BY l.doc_id""".stripMargin

  // ── q60: per-language top-k quality curation ───────────────────────────

  /** q60: the 5 highest-alpha-ratio documents per predicted language —
    * the group-limit curation cut (pick the best K per stratum). Compiles
    * to WindowGroupLimit: per-partition top-K heaps before the shuffle,
    * so the sort never sees more than K·partitions rows per group. */
  def q60TopQuality(s: SparkSession, dir: String): DataFrame = {
    // one scan: language + quality as stacked projection columns
    val (lang, _) = TextAnalysis.languageIdCols(col("text"))
    val alpha = TextAnalysis.qualityCols(col("text")).toMap.apply("alpha_ratio")
    val feats = Sources.documents(s, dir).select(col("doc_id"),
      lang.as("predicted_lang"), alpha.as("alpha_ratio"))
    LatestSnapshot.topK(feats, Seq("predicted_lang"),
        col("alpha_ratio").desc, Seq(col("doc_id").asc), 5)
      .select(col("predicted_lang"), col("doc_id"), col("alpha_ratio"))
      .orderBy(col("predicted_lang"), col("doc_id"))
  }

  val q60Sql: String =
    """WITH w AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws
      |           FROM documents),
      |h AS (SELECT doc_id,
      |  len(list_intersect(ws, ['the','and','of','to','in'])) AS en,
      |  len(list_intersect(ws, ['el','la','de','que','los'])) AS es,
      |  len(list_intersect(ws, ['le','la','et','les','des'])) AS fr,
      |  len(list_intersect(ws, ['der','die','und','das','ist'])) AS de
      |FROM w),
      |langs AS (SELECT doc_id,
      |  CASE WHEN greatest(en, es, fr, de) = 0 THEN 'und'
      |       WHEN en >= es AND en >= fr AND en >= de THEN 'en'
      |       WHEN es >= fr AND es >= de THEN 'es'
      |       WHEN fr >= de THEN 'fr'
      |       ELSE 'de' END AS predicted_lang
      |FROM h),
      |a AS (SELECT doc_id,
      |  CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
      |    / length(text) AS alpha_ratio
      |  FROM documents),
      |r AS (SELECT l.predicted_lang, a.doc_id, a.alpha_ratio,
      |        row_number() OVER (PARTITION BY l.predicted_lang
      |          ORDER BY a.alpha_ratio DESC, a.doc_id ASC) AS rn
      |      FROM a JOIN langs l ON a.doc_id = l.doc_id)
      |SELECT predicted_lang, doc_id, alpha_ratio FROM r WHERE rn <= 5
      |ORDER BY predicted_lang, doc_id""".stripMargin

  // ── q91: per-source quantile normalization of quality ──────────────────

  /** q91: alpha-ratio quality calibrated to a percent-rank WITHIN each
    * source — the cross-source score-comparability step before a global
    * quality cut. One window partitioned by source; no global sort. */
  def q91QuantileNormalize(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    val scored = docs.select(col("doc_id"), col("source"),
      graft.operators.ExactRound.halfAwayDiv(
        length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
          .cast("long") * lit(1000000L),
        length(col("text")).cast("long")).as("alpha_ppm"))
    TextAnalysis.quantileNormalize(scored, "source", "alpha_ppm")
      .orderBy(col("doc_id"))
  }

  val q91Sql: String =
    """WITH q AS (SELECT doc_id, source,
      |    (2 * 1000000 * length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
      |      + length(text)) // (2 * length(text)) AS alpha_ppm
      |  FROM documents),
      |r AS (SELECT doc_id, source, alpha_ppm,
      |        rank() OVER (PARTITION BY source ORDER BY alpha_ppm) AS rk,
      |        count(*) OVER (PARTITION BY source) AS np
      |      FROM q)
      |SELECT doc_id, source, alpha_ppm,
      |  CASE WHEN np > 1
      |    THEN (2 * 1000000 * (rk - 1) + (np - 1)) // (2 * (np - 1))
      |    ELSE 0 END AS q_norm_ppm
      |FROM r ORDER BY doc_id""".stripMargin

  // ── q61: deterministic distributed k-means (2 Lloyd rounds) ────────────

  /** q61: spherical k-means over the embedding corpus (k=4 smallest-id
    * seeds, 2 assignment rounds), summarized as per-cluster sizes and
    * exact-decimal centroid components — the coarse-quantizer trainer for
    * the IVF index (q55), itself distributed and oracle-checkable. */
  def q61KMeans(s: SparkSession, dir: String): DataFrame = {
    val assigned = VectorAggs.kMeans(Sources.embeddings(s, dir),
      "vec_id", "embedding", k = 4, iters = 2)
    val cent = VectorAggs.centroids(assigned, "cluster", "embedding")
    val n = assigned.groupBy(col("cluster")).agg(count(lit(1)).as("n_members"))
    cent.join(broadcast(n), "cluster")
      .select(col("cluster"), col("n_members"), col("dim"), col("centroid"))
      .orderBy(col("cluster"), col("dim"))
  }

  // ── q62: embedding L2 normalization (index preprocessing) ──────────────

  /** q62: per-vector L2 norm plus checksums of the normalized vector
    * (sequential-fold sums on both engines) — proves the unit-vector
    * preprocessing (`Similarity.withL2Normalized`) component-exact without
    * hashing a raw double array. */
  def q62VectorNorm(s: SparkSession, dir: String): DataFrame =
    Similarity.withL2Normalized(Sources.embeddings(s, dir), "embedding", "u")
      .select(col("vec_id"),
        round(Similarity.l2Norm(col("embedding")), 6).as("l2_norm"),
        round(aggregate(col("u"), lit(0.0), (a, x) => a + x), 6).as("unit_sum"),
        round(array_max(col("u")), 6).as("unit_max"))
      .orderBy(col("vec_id"))

  val q62Sql: String =
    """WITH n AS (SELECT vec_id, embedding,
      |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
      |    AS nrm FROM embeddings)
      |SELECT vec_id,
      |  round(nrm, 6) AS l2_norm,
      |  round(list_sum(list_transform(embedding, x -> x::DOUBLE / nrm)), 6)
      |    AS unit_sum,
      |  round(list_max(list_transform(embedding, x -> x::DOUBLE / nrm)), 6)
      |    AS unit_max
      |FROM n ORDER BY vec_id""".stripMargin

  // ── q63: PII-style pattern redaction ───────────────────────────────────

  /** q63: email + number redaction over the document corpus; the md5 of
    * the redacted text proves content (not just count) parity. */
  def q63Redact(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.redact(Sources.documents(s, dir), "doc_id", "text",
        Seq("[a-z]+@[a-z]+\\.[a-z]+" -> "<EMAIL>", "[0-9]+" -> "<NUM>"))
      .select(col("doc_id"), md5(col("redacted_text")).as("redacted_md5"),
        length(col("redacted_text")).as("redacted_len"), col("n_redacted"))
      .orderBy(col("doc_id"))

  val q63Sql: String =
    """WITH r AS (SELECT doc_id,
      |  regexp_replace(regexp_replace(text,
      |    '[a-z]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
      |    '[0-9]+', '<NUM>', 'g') AS rt,
      |  CAST(len(regexp_extract_all(text, '[a-z]+@[a-z]+\.[a-z]+')) AS BIGINT)
      |  + CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT)
      |    AS n_redacted
      |  FROM documents)
      |SELECT doc_id, md5(rt) AS redacted_md5, length(rt) AS redacted_len,
      |  n_redacted
      |FROM r ORDER BY doc_id""".stripMargin

  // ── q64: incremental dedup against a stored LSH index ──────────────────

  /** q64: the production dedup shape — even-id documents stand in for the
    * already-indexed corpus, odd-id documents for the incoming batch;
    * candidates come ONLY from new×index band collisions (no corpus
    * self-join), verified at exact Jaccard. Per-document K–M md5
    * signatures make the incremental result bit-identical to the batch
    * run's (new, old) pairs. */
  def q64IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    val (idxBands, idxShingles) = TextDedup.lshIndex(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    TextDedup.dedupAgainstIndex(docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", idxBands, idxShingles, threshold = 0.5)
      .orderBy(col("d_new"), col("d_old"))
  }

  /** q362: q64's incremental dedup with the index built CAP-SPLIT
    * (`lshIndex(maxBucket = 1)`, engaging at both SFs — the even-id
    * index has 19 multi-member band buckets at sf0.01, 238 at sf0.1):
    * the collision join runs census → explode → block join with ≤ 1
    * index row per cell. The oracle is q64's UNCAPPED chain verbatim,
    * so hash-green proves the build-time split loses no (new, old)
    * pair — the q358 done-bar applied to the production incremental
    * path, where the stored index's hot buckets are exactly the
    * most-duplicated corpus content. */
  def q362IncrementalDedupCapped(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    val (idxBands, idxShingles) = TextDedup.lshIndex(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
      maxBucket = Some(1L))
    TextDedup.dedupAgainstIndex(docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", idxBands, idxShingles, threshold = 0.5)
      .orderBy(col("d_new"), col("d_old"))
  }

  val q64Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
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
      |cand AS (SELECT DISTINCT b.doc_id AS d_new, a.doc_id AS d_old
      |         FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
      |         WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT c.d_new, c.d_old, count(*) AS inter
      |          FROM cand c
      |          JOIN sh a ON a.doc_id = c.d_new
      |          JOIN sh b ON b.doc_id = c.d_old AND b.s = a.s
      |          GROUP BY c.d_new, c.d_old)
      |SELECT i.d_new, i.d_old,
      |  CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter) AS jaccard
      |FROM inter i JOIN sz s1 ON i.d_new = s1.doc_id
      |             JOIN sz s2 ON i.d_old = s2.doc_id
      |WHERE CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter) >= 0.5
      |ORDER BY d_new, d_old""".stripMargin

  private[queries] def cosSql(v1: String, v2: String): String =
    s"""round(
       |    list_sum(list_transform(range(1, 65),
       |      i -> $v1[i]::DOUBLE * $v2[i]::DOUBLE)) /
       |    (sqrt(list_sum(list_transform(range(1, 65),
       |       i -> $v1[i]::DOUBLE * $v1[i]::DOUBLE))) *
       |     sqrt(list_sum(list_transform(range(1, 65),
       |       i -> $v2[i]::DOUBLE * $v2[i]::DOUBLE)))), 6)""".stripMargin

  /** CTE chain reproducing `VectorAggs.kMeans(k=4, iters=2)`: seeds → assign
    * (a1) → exact-decimal means (c1/c1v) → final assignment
    * `a2(vec_id, embedding, cluster)`. Shared by the q61 and q82 oracles. */
  private[queries] def kmeansA2Ctes: String =
    s"""seeds AS (
       |  SELECT vec_id AS cluster, embedding AS cv FROM embeddings
       |  ORDER BY vec_id LIMIT 4),
       |a1 AS (
       |  SELECT vec_id, embedding, cluster FROM (
       |    SELECT e.vec_id, e.embedding, s.cluster, row_number() OVER (
       |      PARTITION BY e.vec_id ORDER BY ${cosSql("e.embedding", "s.cv")}
       |        DESC, s.cluster ASC) AS rn
       |    FROM embeddings e CROSS JOIN seeds s) t WHERE rn = 1),
       |c1 AS (
       |  SELECT cluster, d, round(CAST(SUM(CAST(round(embedding[d]::DOUBLE, 6)
       |      AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS c
       |  FROM a1 CROSS JOIN range(1, 65) t(d) GROUP BY cluster, d),
       |c1v AS (SELECT cluster, array_agg(c ORDER BY d) AS cv
       |        FROM c1 GROUP BY cluster),
       |a2 AS (
       |  SELECT vec_id, embedding, cluster FROM (
       |    SELECT e.vec_id, e.embedding, v.cluster, row_number() OVER (
       |      PARTITION BY e.vec_id ORDER BY ${cosSql("e.embedding", "v.cv")}
       |        DESC, v.cluster ASC) AS rn
       |    FROM embeddings e CROSS JOIN c1v v) t WHERE rn = 1)""".stripMargin

  val q61Sql: String =
    s"""WITH $kmeansA2Ctes,
       |c2 AS (
       |  SELECT cluster, d, round(CAST(SUM(CAST(round(embedding[d]::DOUBLE, 6)
       |      AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS centroid
       |  FROM a2 CROSS JOIN range(1, 65) t(d) GROUP BY cluster, d),
       |n AS (SELECT cluster, COUNT(*) AS n_members FROM a2 GROUP BY cluster)
       |SELECT c2.cluster, n.n_members, c2.d - 1 AS dim, c2.centroid
       |FROM c2 JOIN n ON c2.cluster = n.cluster
       |ORDER BY c2.cluster, dim""".stripMargin

  // ── q82: SemDeDup — semantic dedup inside k-means clusters ─────────────

  /** q82: SemDeDup over the embedding corpus — k-means (k=4, 2 rounds)
    * clustering, then every vector with a smaller-id same-cluster
    * neighbor at cosine ≥ 0.4 is marked with its survivor (`dup_of`
    * NULL = kept). The pairwise test never leaves a cluster: an equi-join
    * on the cluster id, not all-pairs. The assignment is localCheckpointed
    * — it feeds both join sides and the final restitch. */
  def q82SemDedup(s: SparkSession, dir: String): DataFrame = {
    val assigned = VectorAggs.kMeans(Sources.embeddings(s, dir),
      "vec_id", "embedding", k = 4, iters = 2).localCheckpoint()
    VectorAggs.semDedup(assigned, "vec_id", "cluster", "embedding",
        threshold = 0.4)
      .orderBy(col("vec_id"))
  }

  val q82Sql: String =
    s"""WITH $kmeansA2Ctes,
       |d AS (SELECT x.vec_id, MIN(y.vec_id) AS dup_of
       |      FROM a2 x JOIN a2 y ON x.cluster = y.cluster
       |        AND y.vec_id < x.vec_id
       |        AND ${cosSql("x.embedding", "y.embedding")} >= 0.4
       |      GROUP BY x.vec_id)
       |SELECT a.vec_id, a.cluster, d.dup_of
       |FROM a2 a LEFT JOIN d USING (vec_id)
       |ORDER BY a.vec_id""".stripMargin

  // ── q349: split-leakage audit (near-dups straddling the split) ─────────

  /** q349: the eval-integrity check a split owes its users — verified
    * MinHash near-dup pairs (the q19 machinery) joined against the
    * deterministic 80/10/10 hash split (the q59 machinery), folded to
    * unordered split-pair counts. A `train/test` row with n_pairs > 0
    * means the held-out set contains near-copies of training documents
    * and every eval number on it is inflated; dedup must run BEFORE the
    * split (or the split must respect near-dup clusters). Composition of
    * two gated operators; exact integer counts.
    *
    * Scale shape: the split label is a narrow md5 projection (no
    * shuffle); the near-dup pairs are the banded LSH path; the two
    * label attaches are doc-keyed equi-joins on the (small) pair table. */
  def q349SplitLeakage(s: SparkSession, dir: String): DataFrame = {
    val d = Sources.documents(s, dir)
    val split = Sampling.deterministicSplit(
        d.select(col("doc_id")), "doc_id", "split",
        Seq(("train", 204), ("val", 230), ("test", 256)))
      .select(col("doc_id"), col("split"))
    val pairs = TextDedup.minHashLshPairs(d, "doc_id", "text",
      k = 16, r = 4, w = 3, threshold = 0.5)
    pairs
      .join(split.select(col("doc_id").as("d1"),
        col("split").as("graft_s1")), Seq("d1"))
      .join(split.select(col("doc_id").as("d2"),
        col("split").as("graft_s2")), Seq("d2"))
      .groupBy(least(col("graft_s1"), col("graft_s2")).as("split_a"),
        greatest(col("graft_s1"), col("graft_s2")).as("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("split_a"), col("split_b"), col("n_pairs"),
        (col("split_a") =!= col("split_b")).as("is_crossing"))
      .orderBy(col("split_a"), col("split_b"))
  }

  // ── q351: cluster-aware split (q349's prescribed remediation) ──────────

  /** q351: the fix q349's finding prescribes — the 80/10/10 hash split
    * keyed on the NEAR-DUP CONNECTED-COMPONENT id (q65's closure over
    * q349's verified MinHash pairs; singletons key on their own doc_id),
    * so every near-dup cluster lands in ONE split and no near-dup pair
    * can straddle train/test BY CONSTRUCTION, not by luck. Output: one
    * row per split with doc/cluster counts, the half-away ppm share
    * (the q318-shape balance audit — cluster-keying trades per-doc
    * balance for integrity, and the share column is where that trade is
    * read), and the within/crossing pair counts — n_pairs_crossing is
    * the gate's proof column: it must be 0 on every row.
    *
    * Scale shape: pairs + components are the gated q19/q65 machinery;
    * the split label is a narrow md5 projection over the cluster key;
    * the doc-level agg is one hash-agg; the pair-level attaches are
    * doc-keyed equi-joins on the (small) pair table. */
  def q351ClusterAwareSplit(s: SparkSession, dir: String): DataFrame =
    clusterAwareSplit(s, dir, maxBucket = None)

  /** q361: the q351 composition end-to-end over the CAPPED text-LSH
    * candidate path (q358's salt-split, maxBucket = 2 — engaging at
    * both test SFs). The oracle is q351's UNCAPPED chain verbatim:
    * hash-green proves the salt split is lossless through the whole
    * production composition — pairs → components → split → leak audit —
    * not just at the pair table (the q356 precedent on the text side). */
  def q361ClusterSplitCapped(s: SparkSession, dir: String): DataFrame =
    clusterAwareSplit(s, dir, maxBucket = Some(2L))

  private def clusterAwareSplit(s: SparkSession, dir: String,
                                maxBucket: Option[Long]): DataFrame = {
    val d = Sources.documents(s, dir)
    val pairs = TextDedup.minHashLshPairs(d, "doc_id", "text",
        k = 16, r = 4, w = 3, threshold = 0.5, maxBucket = maxBucket)
      .localCheckpoint(eager = false) // feeds the closure AND the audit
    val comp = graft.operators.Graph.connectedComponents(pairs, "d1", "d2")
    val split = Sampling.deterministicSplit(
        d.select(col("doc_id"))
          .join(comp.select(col("node").as("doc_id"), col("component")),
            Seq("doc_id"), "left")
          .withColumn("graft_key",
            coalesce(col("component"), col("doc_id"))),
        "graft_key", "split",
        Seq(("train", 204), ("val", 230), ("test", 256)))
      .select(col("doc_id"), col("graft_key"), col("split"))
      .localCheckpoint(eager = false) // read by 3 branches below
    val docAgg = split.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("graft_key")).as("n_clusters"))
    val total = split.agg(count(lit(1)).as("graft_t"))
    val labeled = pairs
      .join(split.select(col("doc_id").as("d1"),
        col("split").as("graft_s1")), Seq("d1"))
      .join(split.select(col("doc_id").as("d2"),
        col("split").as("graft_s2")), Seq("d2"))
    val within = labeled.filter(col("graft_s1") === col("graft_s2"))
      .groupBy(col("graft_s1").as("split"))
      .agg(count(lit(1)).as("graft_w"))
    // a crossing pair charges BOTH its endpoints' splits — symmetric, so
    // a reader never has to know which side "caused" it
    val crossing = labeled.filter(col("graft_s1") =!= col("graft_s2"))
      .select(col("graft_s1").as("split"))
      .unionByName(labeled.filter(col("graft_s1") =!= col("graft_s2"))
        .select(col("graft_s2").as("split")))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("graft_x"))
    docAgg.crossJoin(broadcast(total))
      .join(within, Seq("split"), "left")
      .join(crossing, Seq("split"), "left")
      .select(col("split"), col("n_docs"),
        graft.operators.ExactRound.halfAwayDiv(
          col("n_docs").cast("long") * lit(1000000L),
          col("graft_t").cast("long")).as("share_ppm"),
        col("n_clusters"),
        coalesce(col("graft_w"), lit(0L)).as("n_pairs_within"),
        coalesce(col("graft_x"), lit(0L)).as("n_pairs_crossing"))
      .orderBy(col("split"))
  }

  val q351Sql: String =
    """WITH RECURSIVE
      |ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
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
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT c.d1, c.d2, count(*) AS inter
      |          FROM cand c
      |          JOIN sh a ON a.doc_id = c.d1
      |          JOIN sh b ON b.doc_id = c.d2 AND b.s = a.s
      |          GROUP BY c.d1, c.d2),
      |dup AS (SELECT i.d1, i.d2
      |        FROM inter i JOIN sz s1 ON i.d1 = s1.doc_id
      |                     JOIN sz s2 ON i.d2 = s2.doc_id
      |        WHERE CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter)
      |          >= 0.5),
      |e AS (SELECT d1 AS a, d2 AS b FROM dup
      |      UNION SELECT d2 AS a, d1 AS b FROM dup),
      |reach(n, m) AS (
      |  SELECT DISTINCT a AS n, a AS m FROM e
      |  UNION
      |  SELECT r.n, e.b FROM reach r JOIN e ON r.m = e.a),
      |comp AS (SELECT n AS doc_id, MIN(m) AS component FROM reach
      |         GROUP BY n),
      |k AS (SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS key
      |      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
      |sp AS (SELECT doc_id, key,
      |         CASE WHEN bucket < 204 THEN 'train'
      |              WHEN bucket < 230 THEN 'val'
      |              ELSE 'test' END AS split
      |       FROM (SELECT doc_id, key,
      |               (strpos('0123456789abcdef',
      |                  substr(md5('split_' || key), 1, 1)) - 1) * 16
      |               + strpos('0123456789abcdef',
      |                  substr(md5('split_' || key), 2, 1)) - 1 AS bucket
      |             FROM k)),
      |tot AS (SELECT COUNT(*) AS t FROM sp),
      |dc AS (SELECT split, COUNT(*) AS n_docs,
      |         COUNT(DISTINCT key) AS n_clusters
      |       FROM sp GROUP BY 1),
      |pj AS (SELECT s1.split AS sa, s2.split AS sb
      |       FROM dup d JOIN sp s1 ON d.d1 = s1.doc_id
      |                  JOIN sp s2 ON d.d2 = s2.doc_id),
      |w AS (SELECT sa AS split, COUNT(*) AS nw FROM pj WHERE sa = sb
      |      GROUP BY 1),
      |x AS (SELECT split, COUNT(*) AS nx FROM (
      |        SELECT sa AS split FROM pj WHERE sa <> sb
      |        UNION ALL SELECT sb FROM pj WHERE sa <> sb)
      |      GROUP BY 1)
      |SELECT dc.split, dc.n_docs,
      |  CAST((2 * dc.n_docs::HUGEINT * 1000000 + tot.t)
      |    // (2 * tot.t::HUGEINT) AS BIGINT) AS share_ppm,
      |  dc.n_clusters,
      |  COALESCE(w.nw, 0) AS n_pairs_within,
      |  COALESCE(x.nx, 0) AS n_pairs_crossing
      |FROM dc CROSS JOIN tot
      |LEFT JOIN w ON w.split = dc.split
      |LEFT JOIN x ON x.split = dc.split
      |ORDER BY dc.split""".stripMargin

  val q349Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
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
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT c.d1, c.d2, count(*) AS inter
      |          FROM cand c
      |          JOIN sh a ON a.doc_id = c.d1
      |          JOIN sh b ON b.doc_id = c.d2 AND b.s = a.s
      |          GROUP BY c.d1, c.d2),
      |dup AS (SELECT i.d1, i.d2
      |        FROM inter i JOIN sz s1 ON i.d1 = s1.doc_id
      |                     JOIN sz s2 ON i.d2 = s2.doc_id
      |        WHERE CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter)
      |          >= 0.5),
      |b AS (SELECT doc_id,
      |        (strpos('0123456789abcdef',
      |           substr(md5('split_' || doc_id), 1, 1)) - 1) * 16
      |        + strpos('0123456789abcdef',
      |           substr(md5('split_' || doc_id), 2, 1)) - 1 AS bucket
      |      FROM documents),
      |sp AS (SELECT doc_id,
      |         CASE WHEN bucket < 204 THEN 'train'
      |              WHEN bucket < 230 THEN 'val'
      |              ELSE 'test' END AS split
      |       FROM b)
      |SELECT least(s1.split, s2.split) AS split_a,
      |  greatest(s1.split, s2.split) AS split_b,
      |  COUNT(*) AS n_pairs,
      |  least(s1.split, s2.split) <> greatest(s1.split, s2.split)
      |    AS is_crossing
      |FROM dup d JOIN sp s1 ON d.d1 = s1.doc_id
      |           JOIN sp s2 ON d.d2 = s2.doc_id
      |GROUP BY 1, 2 ORDER BY split_a, split_b""".stripMargin
}
