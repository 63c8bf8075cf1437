package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{DomainDedup, Graph, Relevance, Similarity, Sketches, TextAnalysis, TextDedup, VectorAggs}
import graft.sources.Sources

/**
 * Round-10 refinement operators: sub-document dedup with reconstruction,
 * cluster-based data pruning, diversified retrieval, and incremental
 * dedup-graph maintenance. Each query gates a [[graft.operators]]
 * component against an independent DuckDB derivation.
 */
object RefineQueries {

  // ── q218: CCNet-style paragraph-level dedup + reconstruction ───────────

  /** q218: corpus-wide first-wins paragraph dedup
    * ([[TextDedup.paragraphDedup]], 12-word paragraphs) — every
    * paragraph survives exactly once at its first (doc, position)
    * occurrence and documents are REASSEMBLED from their surviving
    * paragraphs; the removal stage q208's boilerplate audit only
    * reports. Gate = per-doc paragraph counts plus the md5/length of
    * the reconstructed text (content parity, not just counts). */
  def q218ParagraphDedup(s: SparkSession, dir: String): DataFrame =
    TextDedup.paragraphDedup(Sources.documents(s, dir), "doc_id", "text",
        pWords = 12)
      .select(col("doc_id"), col("n_paras"), col("n_kept"),
        md5(col("cleaned_text")).as("cleaned_md5"),
        length(col("cleaned_text")).cast("long").as("cleaned_len"))
      .orderBy(col("doc_id"))

  val q218Sql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |p AS (SELECT doc_id, unnest(range(0, (len(w) + 11) // 12)) AS pos, w
      |      FROM w),
      |p2 AS (SELECT doc_id, pos,
      |         array_to_string(list_slice(w, CAST(pos * 12 + 1 AS INT),
      |           CAST(pos * 12 + 12 AS INT)), ' ') AS pt
      |       FROM p),
      |o1 AS (SELECT md5(pt) AS ph, MIN(doc_id) AS fd FROM p2 GROUP BY 1),
      |o2 AS (SELECT o1.ph, o1.fd, MIN(p2.pos) AS fp
      |       FROM p2 JOIN o1 ON md5(p2.pt) = o1.ph AND p2.doc_id = o1.fd
      |       GROUP BY o1.ph, o1.fd),
      |k AS (SELECT p2.doc_id, p2.pos, p2.pt
      |      FROM p2 JOIN o2 ON md5(p2.pt) = o2.ph
      |        AND p2.doc_id = o2.fd AND p2.pos = o2.fp),
      |r AS (SELECT doc_id, COUNT(*) AS n_kept,
      |        string_agg(pt, ' ' ORDER BY pos) AS ct
      |      FROM k GROUP BY doc_id)
      |SELECT w.doc_id, CAST((len(w.w) + 11) // 12 AS BIGINT) AS n_paras,
      |  COALESCE(r.n_kept, 0) AS n_kept,
      |  md5(COALESCE(r.ct, '')) AS cleaned_md5,
      |  CAST(length(COALESCE(r.ct, '')) AS BIGINT) AS cleaned_len
      |FROM w LEFT JOIN r USING (doc_id) ORDER BY w.doc_id""".stripMargin

  // ── q219: prototypicality pruning (Sorscher 2022 / D4) ─────────────────

  /** q219: SSL-prototypes data pruning over the clustered embedding
    * corpus ([[VectorAggs.prototypePrune]] on the gated q61 k-means,
    * prune fraction 1/4) — inside each cluster the quarter closest to
    * the centroid (the easy, redundant examples) is marked pruned, the
    * hard tail kept. Ranks/counts/flags are exact integers; the 6-dp
    * prototype cosine rides along under the q62 round-6 precedent. */
  def q219PrototypePrune(s: SparkSession, dir: String): DataFrame = {
    val assigned = VectorAggs.kMeans(Sources.embeddings(s, dir),
      "vec_id", "embedding", k = 4, iters = 2).localCheckpoint()
    VectorAggs.prototypePrune(assigned, "vec_id", "cluster", "embedding",
        pruneNum = 1, pruneDen = 4)
      .orderBy(col("vec_id"))
  }

  val q219Sql: String =
    s"""WITH ${CurationQueries.kmeansA2Ctes},
       |c2 AS (
       |  SELECT cluster, d, round(CAST(SUM(CAST(round(embedding[d]::DOUBLE, 6)
       |      AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS c
       |  FROM a2 CROSS JOIN range(1, 65) t(d) GROUP BY cluster, d),
       |c2v AS (SELECT cluster, array_agg(c ORDER BY d) AS cv
       |        FROM c2 GROUP BY cluster),
       |sc AS (SELECT a2.vec_id, a2.cluster,
       |         ${CurationQueries.cosSql("a2.embedding", "c2v.cv")} AS pc
       |       FROM a2 JOIN c2v USING (cluster)),
       |r AS (SELECT vec_id, cluster, pc,
       |        row_number() OVER (PARTITION BY cluster
       |          ORDER BY pc DESC, vec_id) AS pr,
       |        COUNT(*) OVER (PARTITION BY cluster) AS nc
       |      FROM sc)
       |SELECT vec_id, cluster, CAST(nc AS BIGINT) AS n_cluster,
       |  CAST(pr AS BIGINT) AS proto_rank, pc AS proto_cos,
       |  (pr * 4 <= 1 * nc) AS pruned
       |FROM r ORDER BY vec_id""".stripMargin

  // ── q220: MMR diversified re-ranking (Carbonell & Goldstein 1998) ──────

  private val MmrK = 4
  private val MmrCandN = 10
  private val MmrLamNum = 7
  private val MmrLamDen = 10

  /** q220: maximal-marginal-relevance re-ranking
    * ([[Similarity.mmrRerank]]) — 3 query vectors against the rest of
    * the embedding corpus, top-10 cosine candidates per query, then 4
    * greedy MMR picks at λ = 0.7. The oracle replays the greedy
    * unrolled step by step (one CTE pair per round), with the scaled
    * integer-weight score so no division touches the argmax. */
  def q220MmrRerank(s: SparkSession, dir: String): DataFrame = {
    val emb = Sources.embeddings(s, dir)
    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding"))
    val corpus = emb.filter(col("vec_id") >= 3)
    Similarity.mmrRerank(qs, "qid", corpus, "vec_id", "embedding",
        k = MmrK, candN = MmrCandN,
        lambdaNum = MmrLamNum, lambdaDen = MmrLamDen)
      .orderBy(col("qid"), col("sel_idx"))
  }

  val q220Sql: String = {
    val cos = CurationQueries.cosSql _
    val negW = MmrLamDen - MmrLamNum
    val steps = (1 until MmrK).map { i =>
      s"""m$i AS (SELECT m.qid, m.vec_id, m.embedding, m.rel,
         |  ${if (i == 1) cos("m.embedding", "s.embedding")
            else s"greatest(m.ms, ${cos("m.embedding", "s.embedding")})"} AS ms
         |  FROM ${if (i == 1) "cd" else s"m${i - 1}"} m
         |  JOIN s${i - 1} s USING (qid) WHERE m.vec_id <> s.vec_id),
         |s$i AS (SELECT qid, vec_id, embedding, rel, ms FROM (
         |  SELECT m$i.*, row_number() OVER (PARTITION BY qid
         |    ORDER BY rel * $MmrLamNum - ms * $negW DESC, vec_id) AS rn
         |  FROM m$i) t WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val out = (0 until MmrK).map { i =>
      s"""SELECT qid, CAST($i AS BIGINT) AS sel_idx, vec_id, rel,
         |  ${if (i == 0) "CAST(NULL AS DOUBLE)" else "ms"} AS max_sim_prev
         |FROM s$i""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH qs AS (SELECT vec_id AS qid, embedding AS qv
       |  FROM embeddings WHERE vec_id < 3),
       |cd AS (SELECT qid, vec_id, embedding, rel FROM (
       |  SELECT q.qid, e.vec_id, e.embedding,
       |    ${cos("e.embedding", "q.qv")} AS rel,
       |    row_number() OVER (PARTITION BY q.qid
       |      ORDER BY ${cos("e.embedding", "q.qv")} DESC, e.vec_id) AS rn
       |  FROM embeddings e CROSS JOIN qs q WHERE e.vec_id >= 3) t
       |  WHERE rn <= $MmrCandN),
       |s0 AS (SELECT qid, vec_id, embedding, rel, CAST(NULL AS DOUBLE) AS ms
       |  FROM (SELECT cd.*, row_number() OVER (PARTITION BY qid
       |    ORDER BY rel DESC, vec_id) AS rn FROM cd) t WHERE rn = 1),
       |$steps
       |$out
       |ORDER BY qid, sel_idx""".stripMargin
  }

  // ── q221: incremental connected-components maintenance ─────────────────

  /** q221: fold a delta of near-dup edges into an existing component
    * labeling ([[Graph.incrementalComponents]]) — even-id documents'
    * LSH pairs stand in for yesterday's indexed graph (labeled by a
    * full CC run), pairs involving odd-id documents for today's delta.
    * The oracle computes components of the UNION graph from scratch
    * (recursive closure), so the gate PROVES the incremental algebra:
    * contracted-graph CC + one remap join ≡ full recomputation. */
  def q221IncrementalCC(s: SparkSession, dir: String): DataFrame = {
    val all = TextDedup.minHashLshPairs(Sources.documents(s, dir),
      "doc_id", "text", k = 16, r = 4, w = 3, threshold = 0.5)
      .localCheckpoint()
    val oldPairs = all.filter(col("d1") % 2 === 0 && col("d2") % 2 === 0)
    val delta = all.filter(col("d1") % 2 === 1 || col("d2") % 2 === 1)
    val prior = Graph.connectedComponents(oldPairs, "d1", "d2")
    Graph.incrementalComponents(prior, "node", "component", delta, "d1", "d2")
      .select(col("node").as("doc_id"), col("component"))
      .orderBy(col("doc_id"))
  }

  val q221Sql: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT d1, d2 FROM (
       |${PipelineQueries.q19Sql}
       |  )),
       |e AS (SELECT d1 AS a, d2 AS b FROM pairs
       |      UNION SELECT d2 AS a, d1 AS b FROM pairs),
       |reach(n, m) AS (
       |  SELECT DISTINCT a AS n, a AS m FROM e
       |  UNION
       |  SELECT r.n, e.b FROM reach r JOIN e ON r.m = e.a)
       |SELECT n AS doc_id, MIN(m) AS component FROM reach GROUP BY n
       |ORDER BY doc_id""".stripMargin

  // ── q222: IVFADC with residual encoding (Jégou 2011 §V proper) ─────────

  /** q222: the residual-encoding IVFADC serving path
    * ([[VectorAggs.ivfPqResidualRecall]]) — same layout as q217 (coarse
    * k=4 cells, nprobe=2, trained PQ m=4 k=16, recall@10) but the PQ
    * quantizes x − c(cell(x)) and the query LUT is per probed cell, as
    * the paper specifies. The q217→q222 recall delta is the value of
    * residual encoding at equal code budget. */
  def q222IvfResidualRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = Sources.embeddings(s, dir)
    VectorAggs.ivfPqResidualRecall(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") % 67 === 0), "vec_id",
        dims = 64, m = 4, k = 16,
        coarseK = 4, coarseIters = 2, nprobe = 2, topK = 10)
      .orderBy(col("qid"))
  }

  // q217's oracle chain with the PQ stages rebased onto residuals and a
  // cell-keyed query LUT
  val q222Sql: String = {
    val cos = CurationQueries.cosSql _
    s"""WITH ${CurationQueries.kmeansA2Ctes},
      |c2 AS (
      |  SELECT cluster, d, round(CAST(SUM(CAST(round(embedding[d]::DOUBLE, 6)
      |      AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS c
      |  FROM a2 CROSS JOIN range(1, 65) t(d) GROUP BY cluster, d),
      |c2v AS (SELECT cluster, array_agg(c ORDER BY d) AS cv
      |        FROM c2 GROUP BY cluster),
      |rv AS (SELECT a2.vec_id, a2.cluster,
      |         list_transform(range(1, 65),
      |           i -> a2.embedding[i]::DOUBLE - v.cv[i]) AS rv
      |       FROM a2 JOIN c2v v USING (cluster)),
      |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
      |       WHERE vec_id % 67 = 0),
      |pr AS (SELECT qid, cluster FROM (
      |         SELECT q.qid, v.cluster, row_number() OVER (
      |           PARTITION BY q.qid ORDER BY ${cos("q.qv", "v.cv")}
      |             DESC, v.cluster ASC) AS rn
      |         FROM qs q CROSS JOIN c2v v) t WHERE rn <= 2),
      |pq_sv AS (SELECT vec_id, t.j AS subspace,
      |         rv[t.j * 16 + 1 : t.j * 16 + 16] AS v
      |       FROM rv CROSS JOIN range(0, 4) t(j)),
      |pq_sd AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, rv
      |       FROM (SELECT vec_id, rv FROM rv ORDER BY vec_id LIMIT 16)),
      |pq_cb0 AS (SELECT t.j AS subspace, pq_sd.code,
      |          pq_sd.rv[t.j * 16 + 1 : t.j * 16 + 16] AS cv
      |        FROM pq_sd CROSS JOIN range(0, 4) t(j)),
      |pq_a1 AS (SELECT subspace, code, vec_id, v FROM (
      |         SELECT s.vec_id, s.subspace, s.v, c.code, row_number()
      |           OVER (PARTITION BY s.vec_id, s.subspace ORDER BY
      |             round(list_sum(list_transform(range(1, 17), i ->
      |               (s.v[i] - c.cv[i]) * (s.v[i] - c.cv[i]))), 6),
      |             c.code) AS rn
      |         FROM pq_sv s JOIN pq_cb0 c ON c.subspace = s.subspace) t
      |       WHERE rn = 1),
      |pq_m1 AS (SELECT subspace, code, d,
      |         round(CAST(SUM(CAST(round(v[d], 6)
      |             AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS c
      |       FROM pq_a1 CROSS JOIN range(1, 17) t(d)
      |       GROUP BY subspace, code, d),
      |pq_cb1 AS (SELECT subspace, code, array_agg(c ORDER BY d) AS cv
      |        FROM pq_m1 GROUP BY subspace, code),
      |pq_codes AS (SELECT vec_id, subspace, code FROM (
      |         SELECT s.vec_id, s.subspace, c.code, row_number()
      |           OVER (PARTITION BY s.vec_id, s.subspace ORDER BY
      |             round(list_sum(list_transform(range(1, 17), i ->
      |               (s.v[i] - c.cv[i]) * (s.v[i] - c.cv[i]))), 6),
      |             c.code) AS rn
      |         FROM pq_sv s JOIN pq_cb1 c ON c.subspace = s.subspace) t
      |       WHERE rn = 1),
      |qr AS (SELECT pr.qid, pr.cluster,
      |         list_transform(range(1, 65),
      |           i -> q.qv[i]::DOUBLE - v.cv[i]) AS qr
      |       FROM pr JOIN qs q USING (qid) JOIN c2v v USING (cluster)),
      |lut AS (SELECT qr.qid, qr.cluster, c.subspace, c.code,
      |         CAST(round(list_sum(list_transform(range(1, 17), i ->
      |           (qr.qr[c.subspace * 16 + i] - c.cv[i]) *
      |           (qr.qr[c.subspace * 16 + i] - c.cv[i]))), 6)
      |           AS DECIMAL(18,6)) AS d
      |       FROM qr CROSS JOIN pq_cb1 c),
      |cand AS (SELECT pr.qid, a2.vec_id, a2.cluster
      |         FROM a2 JOIN pr ON a2.cluster = pr.cluster),
      |adc AS (SELECT cd.qid, cd.vec_id, SUM(l.d) AS ad
      |        FROM cand cd
      |        JOIN pq_codes c ON c.vec_id = cd.vec_id
      |        JOIN lut l ON l.qid = cd.qid AND l.cluster = cd.cluster
      |          AND l.subspace = c.subspace AND l.code = c.code
      |        GROUP BY cd.qid, cd.vec_id),
      |ap AS (SELECT qid, vec_id FROM (
      |         SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
      |           ORDER BY ad, vec_id) AS rn FROM adc)
      |       WHERE rn <= 10),
      |ex AS (SELECT qid, vec_id FROM (
      |         SELECT qs.qid, e.vec_id, row_number() OVER (
      |           PARTITION BY qs.qid ORDER BY
      |             round(list_sum(list_transform(range(1, 65), i ->
      |               (e.embedding[i]::DOUBLE - qs.qv[i]::DOUBLE) *
      |               (e.embedding[i]::DOUBLE - qs.qv[i]::DOUBLE))), 6),
      |             e.vec_id) AS rn
      |         FROM embeddings e CROSS JOIN qs)
      |       WHERE rn <= 10),
      |r AS (SELECT ex.qid, COUNT(*) AS n_exact,
      |        CAST(COALESCE(SUM(CASE WHEN ap.vec_id IS NOT NULL
      |          THEN 1 END), 0) AS BIGINT) AS n_overlap
      |      FROM ex LEFT JOIN ap
      |        ON ex.qid = ap.qid AND ex.vec_id = ap.vec_id
      |      GROUP BY ex.qid)
      |SELECT qid, n_exact, n_overlap,
      |  CAST((1000000::HUGEINT * n_overlap::HUGEINT) // n_exact::HUGEINT
      |    AS BIGINT) AS recall_ppm
      |FROM r ORDER BY qid""".stripMargin
  }

  // ── q223: canary / secret-string memorization audit ────────────────────

  private val Canaries = Seq(
    "key agg row", "window spark", "graft canary 1787", "value table part")

  /** q223: exact canary-string audit ([[TextAnalysis.canaryScan]],
    * Carlini 2019 "Secret Sharer") — three strings that occur in the
    * corpus plus one injected marker that must NOT (its zero row with
    * NULL first_doc_id is the finding). Counts are length-difference
    * integer arithmetic — exact on both engines. */
  def q223CanaryScan(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.canaryScan(Sources.documents(s, dir), "doc_id", "text",
        Canaries)
      .orderBy(col("canary"))

  val q223Sql: String = {
    val list = Canaries.map(c => s"'$c'").mkString(", ")
    s"""WITH cs AS (SELECT unnest([$list]) AS canary),
       |h AS (SELECT cs.canary, d.doc_id,
       |        (length(d.text) - length(replace(d.text, cs.canary, '')))
       |          // length(cs.canary) AS occ
       |      FROM documents d CROSS JOIN cs
       |      WHERE strpos(d.text, cs.canary) > 0),
       |a AS (SELECT canary, COUNT(*) AS n_docs,
       |        CAST(SUM(occ) AS BIGINT) AS n_occurrences,
       |        MIN(doc_id) AS first_doc_id
       |      FROM h GROUP BY canary)
       |SELECT cs.canary, COALESCE(a.n_docs, 0) AS n_docs,
       |  COALESCE(a.n_occurrences, 0) AS n_occurrences, a.first_doc_id
       |FROM cs LEFT JOIN a USING (canary) ORDER BY cs.canary""".stripMargin
  }

  // ── q224: multi-probe LSH recall audit (Lv 2007) ───────────────────────

  /** q224: multi-probe vs single-probe LSH recall at EQUAL index size —
    * [[Similarity.multiProbeTopK]] (8 planes, 3 lowest-margin single-bit
    * probes) against [[Similarity.annTopK]] (same 8-plane table) and the
    * exact top-5, for the q92 query set. hits_multi ≥ hits_single per
    * query by the candidate-superset argument (spec-asserted); the gate
    * hashes the exact-integer hit counts. */
  def q224MultiProbeRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = Sources.embeddings(s, dir)
    val pred = col("vec_id") < 5
    val queries = emb.filter(pred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val scored = emb
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      .crossJoin(broadcast(queries))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine",
        round(Similarity.cosine(col("q_vec"), col("c_vec")), 6))
    val exact = graft.operators.LatestSnapshot.topK(scored, Seq("q_id"),
        col("cosine").desc, Seq(col("c_id").asc), 5)
      .select(col("q_id"), col("c_id"))
    val single = Similarity.annTopK(emb, "vec_id", "embedding", pred,
        k = 5, nPlanes = 8)
      .select(col("q_id"), col("c_id"), lit(1L).as("graft_s"))
    val multi = Similarity.multiProbeTopK(emb, "vec_id", "embedding", pred,
        k = 5, nPlanes = 8, dims = 64, nProbes = 3)
      .select(col("q_id"), col("c_id"), lit(1L).as("graft_m"))
    exact
      .join(single, Seq("q_id", "c_id"), "left")
      .join(multi, Seq("q_id", "c_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(col("graft_s")), lit(0L)).as("hits_single"),
        coalesce(sum(col("graft_m")), lit(0L)).as("hits_multi"))
      .orderBy(col("q_id"))
  }

  val q224Sql: String =
    """WITH proj AS (
      |  SELECT vec_id, p,
      |    list_sum(list_transform(range(1, len(embedding) + 1),
      |      d -> embedding[d]::DOUBLE *
      |        ((strpos('0123456789abcdef',
      |            substr(md5(p::VARCHAR || '_' || (d - 1)::VARCHAR), 1, 1)) - 1)
      |          % 2 * 2 - 1))) AS proj
      |  FROM embeddings CROSS JOIN range(0, 8) t(p)),
      |sig AS (SELECT vec_id,
      |          CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END)
      |            AS BIGINT) AS lsh_sig
      |        FROM proj GROUP BY vec_id),
      |q AS (SELECT e.vec_id AS q_id, e.embedding AS q_vec, s.lsh_sig
      |      FROM embeddings e JOIN sig s ON e.vec_id = s.vec_id
      |      WHERE e.vec_id < 5),
      |c AS (SELECT e.vec_id AS c_id, e.embedding AS c_vec, s.lsh_sig
      |      FROM embeddings e JOIN sig s ON e.vec_id = s.vec_id),
      |fl AS (SELECT vec_id, p FROM (
      |        SELECT vec_id, p, row_number() OVER (PARTITION BY vec_id
      |          ORDER BY round(abs(proj), 6), p) AS rn
      |        FROM proj WHERE vec_id < 5) t WHERE rn <= 3),
      |ps AS (SELECT q_id, q_vec, lsh_sig AS probe_sig, TRUE AS is_base
      |       FROM q
      |       UNION ALL
      |       SELECT q.q_id, q.q_vec, xor(q.lsh_sig, (1::BIGINT << fl.p)),
      |         FALSE
      |       FROM q JOIN fl ON fl.vec_id = q.q_id),
      |cosx AS (SELECT ps.q_id, c.c_id, round(
      |    list_sum(list_transform(range(1, len(ps.q_vec) + 1),
      |      i -> ps.q_vec[i]::DOUBLE * c.c_vec[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, len(ps.q_vec) + 1),
      |       i -> ps.q_vec[i]::DOUBLE * ps.q_vec[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, len(c.c_vec) + 1),
      |       i -> c.c_vec[i]::DOUBLE * c.c_vec[i]::DOUBLE)))), 6) AS cosine,
      |    ps.is_base
      |  FROM ps JOIN c ON c.lsh_sig = ps.probe_sig WHERE ps.q_id <> c.c_id),
      |sann AS (SELECT q_id, c_id FROM (
      |    SELECT q_id, c_id, row_number() OVER (
      |      PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rn
      |    FROM cosx WHERE is_base) t WHERE rn <= 5),
      |mann AS (SELECT q_id, c_id FROM (
      |    SELECT q_id, c_id, row_number() OVER (
      |      PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rn
      |    FROM cosx) t WHERE rn <= 5),
      |ac AS (SELECT q.q_id, e.vec_id AS c_id, round(
      |    list_sum(list_transform(range(1, len(q.q_vec) + 1),
      |      i -> q.q_vec[i]::DOUBLE * e.embedding[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, len(q.q_vec) + 1),
      |       i -> q.q_vec[i]::DOUBLE * q.q_vec[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
      |       i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))), 6)
      |    AS cosine
      |  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.q_id),
      |exact AS (SELECT q_id, c_id FROM (
      |    SELECT q_id, c_id, row_number() OVER (
      |      PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rn
      |    FROM ac) t WHERE rn <= 5)
      |SELECT x.q_id, COUNT(*) AS n_exact,
      |  CAST(SUM(CASE WHEN s.c_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS hits_single,
      |  CAST(SUM(CASE WHEN m.c_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS hits_multi
      |FROM exact x
      |LEFT JOIN sann s ON x.q_id = s.q_id AND x.c_id = s.c_id
      |LEFT JOIN mann m ON x.q_id = m.q_id AND x.c_id = m.c_id
      |GROUP BY x.q_id ORDER BY x.q_id""".stripMargin

  // ── q225: D4 pipeline — SemDeDup then prototype pruning ────────────────

  /** q225: the full D4 curation pipeline (Tirumala et al. 2023:
    * "D4: Improving LLM Pretraining via Document De-Duplication and
    * Diversification") — k-means clustering, SemDeDup drop (q82's
    * gated stage), then prototypicality pruning of the SURVIVORS with
    * centroids recomputed over the deduped set (the paper's order:
    * dedup first so prototypes aren't dragged toward duplicate clumps).
    * Every vector is labeled `dup` / `pruned` / `kept`; ranks ride
    * along for the pruned stage. */
  def q225D4Pipeline(s: SparkSession, dir: String): DataFrame = {
    val assigned = VectorAggs.kMeans(Sources.embeddings(s, dir),
      "vec_id", "embedding", k = 4, iters = 2).localCheckpoint()
    val sd = VectorAggs.semDedup(assigned, "vec_id", "cluster", "embedding",
      threshold = 0.4).localCheckpoint()
    val survivors = assigned
      .join(sd.filter(col("dup_of").isNull).select("vec_id"), Seq("vec_id"))
    val pruned = VectorAggs.prototypePrune(survivors, "vec_id", "cluster",
      "embedding", pruneNum = 1, pruneDen = 4)
    sd.join(pruned.select(col("vec_id"), col("proto_rank"), col("pruned")),
        Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        when(col("dup_of").isNotNull, lit("dup"))
          .when(col("pruned"), lit("pruned"))
          .otherwise(lit("kept")).as("stage"),
        col("proto_rank"))
      .orderBy(col("vec_id"))
  }

  val q225Sql: String =
    s"""WITH ${CurationQueries.kmeansA2Ctes},
       |dup AS (SELECT x.vec_id, MIN(y.vec_id) AS dup_of
       |      FROM a2 x JOIN a2 y ON x.cluster = y.cluster
       |        AND y.vec_id < x.vec_id
       |        AND ${CurationQueries.cosSql("x.embedding", "y.embedding")}
       |          >= 0.4
       |      GROUP BY x.vec_id),
       |sv AS (SELECT a2.vec_id, a2.cluster, a2.embedding
       |       FROM a2 LEFT JOIN dup USING (vec_id)
       |       WHERE dup.dup_of IS NULL),
       |c2 AS (
       |  SELECT cluster, d,
       |    CAST(SUM(CAST(round(embedding[d]::DOUBLE, 6)
       |      AS DECIMAL(38,6))) * 1000000 AS HUGEINT) AS s6,
       |    COUNT(*)::HUGEINT AS nc
       |  FROM sv CROSS JOIN range(1, 65) t(d) GROUP BY cluster, d),
       |c2m AS (SELECT cluster, d,
       |    CASE WHEN s6 < 0 THEN -((2 * (-s6) + nc) // (2 * nc))
       |         ELSE (2 * s6 + nc) // (2 * nc) END AS cm
       |  FROM c2),
       |c2v AS (SELECT cluster, array_agg(cm::DOUBLE / 1000000 ORDER BY d)
       |          AS cv
       |        FROM c2m GROUP BY cluster),
       |sc AS (SELECT sv.vec_id, sv.cluster,
       |         ${CurationQueries.cosSql("sv.embedding", "c2v.cv")} AS pc
       |       FROM sv JOIN c2v USING (cluster)),
       |r AS (SELECT vec_id, pc,
       |        row_number() OVER (PARTITION BY cluster
       |          ORDER BY pc DESC, vec_id) AS pr,
       |        COUNT(*) OVER (PARTITION BY cluster) AS nc
       |      FROM sc)
       |SELECT a2.vec_id, a2.cluster,
       |  CASE WHEN dup.dup_of IS NOT NULL THEN 'dup'
       |       WHEN r.pr * 4 <= r.nc THEN 'pruned'
       |       ELSE 'kept' END AS stage,
       |  CAST(r.pr AS BIGINT) AS proto_rank
       |FROM a2 LEFT JOIN dup USING (vec_id) LEFT JOIN r USING (vec_id)
       |ORDER BY a2.vec_id""".stripMargin

  // ── q226: dedup-yield accounting per source ────────────────────────────

  /** q226: what paragraph dedup buys, per source — token counts before
    * and after [[TextDedup.paragraphDedup]] (q218's stage) grouped by
    * source, with the removed-token ppm. The per-source removal rate is
    * the mixture-planning input: a source whose tokens are mostly
    * already-seen content contributes far less unique signal than its
    * raw size suggests (RefinedWeb/FineWeb report exactly this table).
    * All gated columns exact integers. */
  def q226DedupYield(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    val deduped = TextDedup.paragraphDedup(docs, "doc_id", "text",
      pWords = 12)
    docs.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("graft_t0"))
      .join(deduped.select(col("doc_id"),
        when(col("cleaned_text") === "", lit(0L))
          .otherwise(size(split(col("cleaned_text"), " ")).cast("long"))
          .as("graft_t1")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("graft_t0")).as("tokens_before"),
        sum(col("graft_t1")).as("tokens_after"))
      .withColumn("removed_ppm",
        expr("(1000000 * (tokens_before - tokens_after)) div tokens_before"))
      .orderBy(col("source"))
  }

  val q226Sql: String =
    """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w
      |      FROM documents),
      |p AS (SELECT doc_id, unnest(range(0, (len(w) + 11) // 12)) AS pos, w
      |      FROM w),
      |p2 AS (SELECT doc_id, pos,
      |         array_to_string(list_slice(w, CAST(pos * 12 + 1 AS INT),
      |           CAST(pos * 12 + 12 AS INT)), ' ') AS pt
      |       FROM p),
      |o1 AS (SELECT md5(pt) AS ph, MIN(doc_id) AS fd FROM p2 GROUP BY 1),
      |o2 AS (SELECT o1.ph, o1.fd, MIN(p2.pos) AS fp
      |       FROM p2 JOIN o1 ON md5(p2.pt) = o1.ph AND p2.doc_id = o1.fd
      |       GROUP BY o1.ph, o1.fd),
      |k AS (SELECT p2.doc_id, p2.pt
      |      FROM p2 JOIN o2 ON md5(p2.pt) = o2.ph
      |        AND p2.doc_id = o2.fd AND p2.pos = o2.fp),
      |t1 AS (SELECT doc_id,
      |         CAST(SUM(len(string_split(pt, ' '))) AS BIGINT) AS t1
      |       FROM k GROUP BY doc_id),
      |d AS (SELECT w.doc_id, w.source,
      |        CAST(len(w.w) AS BIGINT) AS t0, COALESCE(t1.t1, 0) AS t1
      |      FROM w LEFT JOIN t1 USING (doc_id))
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(t0) AS BIGINT) AS tokens_before,
      |  CAST(SUM(t1) AS BIGINT) AS tokens_after,
      |  CAST((1000000::HUGEINT * (SUM(t0) - SUM(t1))::HUGEINT)
      |    // SUM(t0)::HUGEINT AS BIGINT) AS removed_ppm
      |FROM d GROUP BY source ORDER BY source""".stripMargin

  // ── q227: end-to-end web-curation funnel (FineWeb shape) ───────────────

  /** q227: the FineWeb/RefinedWeb curation sequence end-to-end (Penedo
    * 2023/2024): URL dedup (q211's stage) → language filter (q24's
    * langID, keep `en`) → Gopher rule battery (q199, keep only passing
    * docs) → corpus-wide paragraph dedup (q218) — reported as ONE
    * funnel row of exact-integer stage counts plus the token yield of
    * the final dedup. Every stage is the already-gated operator applied
    * to the previous stage's survivors; the oracle recomputes the whole
    * chain independently. Synthetic URLs use q211's arithmetic device
    * so the oracle derives URL-dedup survivors from doc_id math. */
  def q227CurationFunnel(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
      .withColumn("url", concat(
        lit("https://"),
        when(col("doc_id") % 7 === 0, lit("www.")).otherwise(lit("")),
        lit("d"), (col("doc_id") % 50).cast("string"),
        when(col("doc_id") % 3 === 0, lit(".co.uk")).otherwise(lit(".com")),
        lit("/p/"), (col("doc_id") % 100).cast("string"),
        when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit("?utm="), (col("doc_id") % 5).cast("string")))
          .otherwise(lit(""))))
      .localCheckpoint()
    val s1 = DomainDedup.dedupByUrl(docs, "doc_id", "url").localCheckpoint()
    val s2 = s1.join(
      TextAnalysis.languageId(s1, "doc_id", "text")
        .filter(col("predicted_lang") === "en").select("doc_id"),
      Seq("doc_id")).localCheckpoint()
    val s3 = s2.join(
      TextAnalysis.gopherRuleAudit(s2, "doc_id", "text")
        .filter(col("keep")).select("doc_id"),
      Seq("doc_id")).localCheckpoint()
    val pd = TextDedup.paragraphDedup(s3, "doc_id", "text", pWords = 12)
    docs.agg(count(lit(1)).as("n_input"))
      .crossJoin(s1.agg(count(lit(1)).as("n_after_url")))
      .crossJoin(s2.agg(count(lit(1)).as("n_after_lang")))
      .crossJoin(s3.agg(count(lit(1)).as("n_after_quality")))
      .crossJoin(s3.agg(sum(size(split(col("text"), " ")).cast("long"))
        .as("tokens_before")))
      .crossJoin(pd.agg(sum(
        when(col("cleaned_text") === "", lit(0L))
          .otherwise(size(split(col("cleaned_text"), " ")).cast("long")))
        .as("tokens_after")))
  }

  val q227Sql: String =
    """WITH u AS (SELECT doc_id,
      |    'd' || CAST(doc_id % 50 AS VARCHAR) ||
      |      CASE WHEN doc_id % 3 = 0 THEN '.co.uk' ELSE '.com' END
      |      AS domain,
      |    CAST(doc_id % 100 AS VARCHAR) AS path
      |  FROM documents),
      |s1 AS (SELECT domain, path, MIN(doc_id) AS doc_id
      |       FROM u GROUP BY domain, path),
      |d1 AS (SELECT d.doc_id, d.text FROM documents d
      |       JOIN s1 ON s1.doc_id = d.doc_id),
      |lw AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws
      |       FROM d1),
      |lh AS (SELECT doc_id,
      |  len(list_intersect(ws, ['the','and','of','to','in'])) AS en,
      |  len(list_intersect(ws, ['el','la','de','que','los'])) AS es,
      |  len(list_intersect(ws, ['le','la','et','les','des'])) AS fr,
      |  len(list_intersect(ws, ['der','die','und','das','ist'])) AS de
      |FROM lw),
      |d2 AS (SELECT d1.doc_id, d1.text FROM d1 JOIN lh USING (doc_id)
      |       WHERE greatest(en, es, fr, de) > 0
      |         AND en >= es AND en >= fr AND en >= de),
      |gws AS (SELECT doc_id, string_split(text, ' ') AS w FROM d2),
      |gbase AS (SELECT doc_id,
      |    CAST(len(w) AS BIGINT) AS n_words,
      |    round(CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE)
      |      / len(w), 6) AS mean_word_len,
      |    CAST(len(list_filter(['the', 'and', 'of', 'a', 'to', 'in'],
      |      s -> list_contains(w, s))) AS BIGINT) AS n_stopwords,
      |    round(CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 6) AS ttr
      |  FROM gws),
      |gtc AS (SELECT doc_id, MAX(cnt) AS top_cnt FROM (
      |    SELECT doc_id, x, COUNT(*) AS cnt
      |    FROM (SELECT doc_id, unnest(w) AS x FROM gws) GROUP BY 1, 2)
      |  GROUP BY 1),
      |d3 AS (SELECT d2.doc_id, d2.text
      |       FROM d2 JOIN gbase USING (doc_id) JOIN gtc USING (doc_id)
      |       WHERE gbase.n_words BETWEEN 30 AND 5000
      |         AND gbase.mean_word_len BETWEEN 3.5 AND 10.0
      |         AND gbase.n_stopwords >= 2 AND gbase.ttr >= 0.5
      |         AND round(CAST(gtc.top_cnt AS DOUBLE) / gbase.n_words, 6)
      |           <= 0.1),
      |pw AS (SELECT doc_id, string_split(text, ' ') AS w FROM d3),
      |p AS (SELECT doc_id, unnest(range(0, (len(w) + 11) // 12)) AS pos, w
      |      FROM pw),
      |p2 AS (SELECT doc_id, pos,
      |         array_to_string(list_slice(w, CAST(pos * 12 + 1 AS INT),
      |           CAST(pos * 12 + 12 AS INT)), ' ') AS pt
      |       FROM p),
      |o1 AS (SELECT md5(pt) AS ph, MIN(doc_id) AS fd FROM p2 GROUP BY 1),
      |o2 AS (SELECT o1.ph, o1.fd, MIN(p2.pos) AS fp
      |       FROM p2 JOIN o1 ON md5(p2.pt) = o1.ph AND p2.doc_id = o1.fd
      |       GROUP BY o1.ph, o1.fd),
      |k AS (SELECT p2.doc_id, p2.pt
      |      FROM p2 JOIN o2 ON md5(p2.pt) = o2.ph
      |        AND p2.doc_id = o2.fd AND p2.pos = o2.fp)
      |SELECT
      |  (SELECT COUNT(*) FROM documents) AS n_input,
      |  (SELECT COUNT(*) FROM s1) AS n_after_url,
      |  (SELECT COUNT(*) FROM d2) AS n_after_lang,
      |  (SELECT COUNT(*) FROM d3) AS n_after_quality,
      |  (SELECT CAST(SUM(len(w)) AS BIGINT) FROM pw) AS tokens_before,
      |  (SELECT CAST(COALESCE(SUM(len(string_split(pt, ' '))), 0)
      |     AS BIGINT) FROM k) AS tokens_after""".stripMargin

  // ── q228: small-file compaction plan (OPTIMIZE bin-packing) ────────────

  /** q228: the lakehouse OPTIMIZE decision ([[Layout.compactionPlan]],
    * target 500 bytes) over a synthetic file listing (one "file" per
    * document, `n_chars` as its size): files under target are packed
    * into ⌊cum/target⌋ rewrite groups in (bytes, path) order via the
    * range-shuffled prefix sum, larger files left alone. Per-file
    * assignment gated exact. */
  def q228CompactionPlan(s: SparkSession, dir: String): DataFrame =
    graft.operators.Layout.compactionPlan(
        Sources.documents(s, dir).select(
          concat(lit("f"), col("doc_id").cast("string")).as("path"),
          col("n_chars")),
        "path", "n_chars", targetBytes = 500L)
      .orderBy(col("path"))

  val q228Sql: String =
    """WITH f AS (SELECT 'f' || CAST(doc_id AS VARCHAR) AS path,
      |        CAST(n_chars AS BIGINT) AS bytes FROM documents),
      |s AS (SELECT path, bytes,
      |        COALESCE(SUM(bytes) OVER (ORDER BY bytes, path
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
      |      FROM f WHERE bytes < 500)
      |SELECT path, bytes, TRUE AS compacted,
      |  CAST(c // 500 AS BIGINT) AS group_id
      |FROM s
      |UNION ALL
      |SELECT path, bytes, FALSE, NULL FROM f WHERE bytes >= 500
      |ORDER BY path""".stripMargin

  // ── q229: HyperLogLog distinct-count registers (Flajolet 2007) ─────────

  /** q229: per-source HLL(p=8) register sketches plus a global estimate
    * from the MERGED registers ([[graft.operators.Sketches.hllRegisters]]
    * /`hllMerge`/`hllEstimate`) — the mergeable-register complement to
    * q135's KMV: registers, harmonic numerator, and the floor estimate
    * are pure md5/integer arithmetic (common-denominator 2^R rewrite +
    * exact rational α_m), so unlike q33's opaque
    * `approx_count_distinct`, the ESTIMATE itself is gate-hashed; the
    * exact distinct count rides along as the accuracy companion. */
  def q229HllDistinct(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir).select(col("source"), col("text"))
    val per = Sketches.hllRegisters(docs, "text", "source", p = 8)
    val all = Sketches.hllMerge(
      Seq(per.withColumn("source", lit("ALL"))), "source")
    val est = Sketches.hllEstimate(per.unionByName(all), "source", p = 8)
    val exact = docs.groupBy(col("source"))
      .agg(count_distinct(col("text")).as("n_exact"))
      .unionByName(docs.agg(count_distinct(col("text")).as("n_exact"))
        .withColumn("source", lit("ALL"))
        .select(col("source"), col("n_exact")))
    exact.join(est, Seq("source"))
      .select(col("source"), col("n_exact"), col("n_buckets_set"),
        col("sum_rho"), col("harm_num"), col("est_floor"))
      .orderBy(col("source"))
  }

  val q229Sql: String =
    """WITH h AS (SELECT source,
      |    CAST(list_sum(list_transform(range(1, 9), j ->
      |      (strpos('0123456789abcdef', substr(md5(text), j, 1)) - 1)
      |        * (1::BIGINT << (4 * (8 - j))))) AS BIGINT) AS h
      |  FROM documents),
      |hh AS (SELECT source, h FROM h UNION ALL SELECT 'ALL', h FROM h),
      |b AS (SELECT source, h >> 24 AS bucket, h & 16777215 AS rest
      |      FROM hh),
      |r AS (SELECT source, bucket,
      |        MAX(CASE WHEN rest = 0 THEN 25
      |            ELSE 25 - length(bin(rest)) END) AS r
      |      FROM b GROUP BY 1, 2),
      |st AS (SELECT source, COUNT(*) AS n_buckets_set,
      |         CAST(SUM(r) AS BIGINT) AS sum_rho,
      |         CAST(SUM(1::BIGINT << CAST(25 - r AS INT)) AS BIGINT) AS hp
      |       FROM r GROUP BY 1),
      |s2 AS (SELECT source, n_buckets_set, sum_rho,
      |         hp + (256 - n_buckets_set) * 33554432 AS harm_num FROM st),
      |ex AS (SELECT source, count(DISTINCT text) AS n_exact
      |       FROM documents GROUP BY source
      |       UNION ALL
      |       SELECT 'ALL', count(DISTINCT text) FROM documents)
      |SELECT s2.source, ex.n_exact, s2.n_buckets_set, s2.sum_rho,
      |  s2.harm_num,
      |  CAST((7213::HUGEINT * 16777216::HUGEINT * 33554432::HUGEINT) //
      |    (2570790::HUGEINT * s2.harm_num::HUGEINT) AS BIGINT) AS est_floor
      |FROM s2 JOIN ex USING (source) ORDER BY s2.source""".stripMargin

  // ── q230: BM25 hard-negative mining (DPR, Karpukhin 2020) ──────────────

  private val negQueries: Seq[(Int, String)] = Seq(
    1 -> "join", 1 -> "index",
    2 -> "stream", 2 -> "shuffle",
    3 -> "cache", 3 -> "filter")

  private val negGold: Seq[(Int, Long)] =
    Seq(1 -> 5L, 1 -> 42L, 2 -> 7L, 3 -> 33L)

  /** q230: contrastive hard negatives for retriever training
    * ([[Relevance.hardNegatives]]): top-8 BM25 pool per query
    * (k1=1.5, b=0.75 — binary-exact), labeled-gold pairs anti-joined
    * away, survivors re-ranked 1..5. Scores are sums of pre-rounded
    * decimal contributions (the q76 portability contract), so ranks
    * and scores are gate-exact. */
  def q230HardNegatives(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val queries = negQueries.toDF("query_id", "term")
    val gold = negGold.toDF("query_id", "doc_id")
    Relevance.hardNegatives(Sources.documents(s, dir), "doc_id", "text",
        queries, "query_id", gold, n = 5, poolK = 8, k1 = 1.5, b = 0.75)
      .orderBy(col("query_id"), col("neg_rank"))
  }

  val q230Sql: String = {
    val qv = negQueries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    val gv = negGold.map { case (q, d) => s"($q, $d)" }.mkString(", ")
    s"""WITH qt AS (SELECT * FROM (VALUES $qv) AS v(query_id, term)),
       |gold AS (SELECT * FROM (VALUES $gv) AS g(query_id, doc_id)),
       |w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |dl AS (SELECT doc_id, len(w) AS dl FROM w),
       |t AS (SELECT doc_id, unnest(w) AS term FROM w),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM t
       |       WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2),
       |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |corpus AS (SELECT count(*) AS n_docs,
       |             CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
       |sc AS (SELECT tf.doc_id, tf.term,
       |    CAST(round(
       |      ln(1.0 + CAST(c.n_docs - d.df + 0.5 AS DOUBLE)
       |                 / CAST(d.df + 0.5 AS DOUBLE))
       |      * (CAST(tf.tf AS DOUBLE) * 2.5)
       |      / (CAST(tf.tf AS DOUBLE)
       |         + 1.5 * (0.25 + 0.75 * l.dl / c.avgdl)), 6)
       |      AS DECIMAL(18,6)) AS contrib
       |  FROM tf JOIN dfc d USING (term) JOIN dl l USING (doc_id)
       |  CROSS JOIN corpus c),
       |qs AS (SELECT qt.query_id, sc.doc_id,
       |         CAST(SUM(sc.contrib) AS DOUBLE) AS bm25,
       |         count(*) AS n_terms
       |       FROM sc JOIN qt USING (term) GROUP BY 1, 2),
       |pool AS (SELECT * FROM (SELECT qs.*, row_number() OVER (
       |           PARTITION BY query_id ORDER BY bm25 DESC, doc_id ASC)
       |           AS rn FROM qs) WHERE rn <= 8),
       |neg AS (SELECT p.query_id, p.doc_id, p.bm25, p.n_terms
       |        FROM pool p LEFT JOIN gold g
       |          ON g.query_id = p.query_id AND g.doc_id = p.doc_id
       |        WHERE g.doc_id IS NULL),
       |rr AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |         ORDER BY bm25 DESC, doc_id ASC) AS neg_rank FROM neg)
       |SELECT query_id, doc_id, bm25, n_terms,
       |  CAST(neg_rank AS BIGINT) AS neg_rank
       |FROM rr WHERE neg_rank <= 5
       |ORDER BY query_id, neg_rank""".stripMargin
  }

  // ── q231: tokenizer-coverage / OOV audit ───────────────────────────────

  /** q231: per-source OOV audit under the corpus's top-200 word
    * vocabulary ([[TextAnalysis.oovAudit]]) — exact token counts, OOV
    * token/type counts, and ⌊10⁶·oov/tokens⌋; the fertility-style check
    * run before committing a tokenizer to a mixture (Rust et al. ACL
    * 2021). Vocabulary selection is count-desc word-asc deterministic. */
  def q231OovAudit(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.oovAudit(Sources.documents(s, dir), "doc_id", "text",
        "source", vocabSize = 200)
      .orderBy(col("source"))

  val q231Sql: String =
    """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS w
      |           FROM documents),
      |v AS (SELECT w FROM (SELECT w, count(*) AS c FROM t GROUP BY 1
      |                     ORDER BY c DESC, w ASC LIMIT 200)),
      |a AS (SELECT t.source, t.w, (v.w IS NOT NULL) AS iv
      |      FROM t LEFT JOIN v ON t.w = v.w)
      |SELECT source, COUNT(*) AS n_tokens,
      |  CAST(SUM(CASE WHEN iv THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
      |  COUNT(DISTINCT CASE WHEN NOT iv THEN w END) AS n_oov_types,
      |  CAST((SUM(CASE WHEN iv THEN 0 ELSE 1 END)::HUGEINT * 1000000) //
      |    COUNT(*)::HUGEINT AS BIGINT) AS oov_ppm
      |FROM a GROUP BY source ORDER BY source""".stripMargin

  // ── q232: within-doc repetition profile (Gopher Table A1) ──────────────

  /** q232: the WITHIN-document repetition battery
    * ([[TextAnalysis.repetitionProfile]], 8-word paragraphs, repeated
    * 5-gram coverage) — duplicate-paragraph occurrence and character
    * fractions, top-2/3-gram shares, and the interval-union coverage of
    * repeated 5-grams, all ⌊10⁶·x⌋ exact integers. The self-repetition
    * complement to q198 (cross-doc runs) and q199 (word-level rules). */
  def q232RepetitionProfile(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionProfile(Sources.documents(s, dir), "doc_id",
        "text", pWords = 8, dupGramN = 5)
      .orderBy(col("doc_id"))

  val q232Sql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |nw AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words FROM w),
      |p AS (SELECT doc_id, unnest(range(0, (len(w) + 7) // 8)) AS pos, w
      |      FROM w),
      |p2 AS (SELECT doc_id,
      |         array_to_string(list_slice(w, CAST(pos * 8 + 1 AS INT),
      |           CAST(pos * 8 + 8 AS INT)), ' ') AS pt
      |       FROM p),
      |pc AS (SELECT doc_id, pt, COUNT(*) AS c,
      |         COUNT(*) * length(pt) AS ch FROM p2 GROUP BY 1, 2),
      |ps AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_paras,
      |         SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_p,
      |         SUM(ch) AS all_ch,
      |         SUM(CASE WHEN c >= 2 THEN ch ELSE 0 END) AS dup_ch
      |       FROM pc GROUP BY 1),
      |g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
      |         i -> w[i] || ' ' || w[i+1])) AS g
      |       FROM w WHERE len(w) >= 2),
      |t2 AS (SELECT doc_id, MAX(c) * 2 AS top2 FROM
      |       (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2)
      |       GROUP BY 1),
      |g3 AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
      |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
      |       FROM w WHERE len(w) >= 3),
      |t3 AS (SELECT doc_id, MAX(c) * 3 AS top3 FROM
      |       (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1, 2)
      |       GROUP BY 1),
      |g5 AS (SELECT doc_id, unnest(range(1, len(w) - 3)) AS i, w
      |       FROM w WHERE len(w) >= 5),
      |g5x AS (SELECT doc_id, CAST(i AS BIGINT) AS p,
      |          w[CAST(i AS INT)] || ' ' || w[CAST(i + 1 AS INT)] || ' ' ||
      |          w[CAST(i + 2 AS INT)] || ' ' || w[CAST(i + 3 AS INT)] ||
      |          ' ' || w[CAST(i + 4 AS INT)] AS g
      |        FROM g5),
      |r5 AS (SELECT doc_id, p, p + 4 AS e FROM
      |       (SELECT doc_id, p, COUNT(*) OVER
      |          (PARTITION BY doc_id, g) AS c FROM g5x)
      |       WHERE c >= 2),
      |sw AS (SELECT doc_id, GREATEST(0, e - GREATEST(p,
      |         COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY p, e
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |         + 1) + 1) AS addl
      |       FROM r5),
      |cv AS (SELECT doc_id, SUM(addl) AS cov FROM sw GROUP BY 1)
      |SELECT nw.doc_id, nw.n_words, ps.n_paras,
      |  CAST((COALESCE(ps.dup_p, 0)::HUGEINT * 1000000) //
      |    ps.n_paras::HUGEINT AS BIGINT) AS dup_para_ppm,
      |  CASE WHEN ps.all_ch > 0 THEN
      |    CAST((COALESCE(ps.dup_ch, 0)::HUGEINT * 1000000) //
      |      ps.all_ch::HUGEINT AS BIGINT) ELSE 0 END AS dup_para_char_ppm,
      |  CAST((COALESCE(t2.top2, 0)::HUGEINT * 1000000) //
      |    nw.n_words::HUGEINT AS BIGINT) AS top2_share_ppm,
      |  CAST((COALESCE(t3.top3, 0)::HUGEINT * 1000000) //
      |    nw.n_words::HUGEINT AS BIGINT) AS top3_share_ppm,
      |  CAST((COALESCE(cv.cov, 0)::HUGEINT * 1000000) //
      |    nw.n_words::HUGEINT AS BIGINT) AS dup5_cover_ppm
      |FROM nw JOIN ps USING (doc_id)
      |LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
      |LEFT JOIN cv USING (doc_id)
      |ORDER BY nw.doc_id""".stripMargin

  // ── q233: nearest-centroid (Rocchio) language classifier ───────────────

  private val centroidLabels = Seq("de", "en", "es", "fr", "zh")

  /** q233: the trained nearest-centroid classifier
    * ([[graft.operators.Classify.nearestCentroid]]) on the `lang` label,
    * resubstitution-evaluated — gate = the confusion matrix (true lang ×
    * predicted, exact doc counts). Scores are exact-integer
    * ⌊10¹²·dot/n_tokens_c⌋, so the argmax is engine-portable; the
    * resubstitution protocol (train == apply corpus) is the audit shape,
    * not a generalization claim. */
  def q233CentroidClassify(s: SparkSession, dir: String): DataFrame =
    graft.operators.Classify.nearestCentroid(Sources.documents(s, dir),
        "doc_id", "text", "lang", centroidLabels)
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("predicted"))

  val q233Sql: String = {
    val lv = centroidLabels.map(l => s"'$l'").mkString(", ")
    s"""WITH tf AS (SELECT doc_id, t AS term, COUNT(*) AS tf FROM
       |       (SELECT doc_id, unnest(string_split(text, ' ')) AS t
       |        FROM documents) GROUP BY 1, 2),
       |cent AS (SELECT tf.term, d.lang AS c, SUM(tf.tf) AS w
       |         FROM tf JOIN documents d USING (doc_id) GROUP BY 1, 2),
       |ct AS (SELECT c, SUM(w) AS n FROM cent GROUP BY 1),
       |dots AS (SELECT tf.doc_id, cent.c, SUM(tf.tf * cent.w) AS dot
       |         FROM tf JOIN cent USING (term) GROUP BY 1, 2),
       |lf AS (SELECT unnest([$lv]) AS c),
       |ap AS (SELECT d.doc_id, d.lang, lf.c,
       |         COALESCE(dt.dot, 0) AS dot, ct.n
       |       FROM documents d CROSS JOIN lf
       |       JOIN ct ON ct.c = lf.c
       |       LEFT JOIN dots dt ON dt.doc_id = d.doc_id AND dt.c = lf.c),
       |q AS (SELECT doc_id, lang, c,
       |        (dot::HUGEINT * 1000000000000::HUGEINT) // n::HUGEINT AS q
       |      FROM ap),
       |pr AS (SELECT doc_id, lang, c AS predicted, row_number() OVER (
       |         PARTITION BY doc_id ORDER BY q DESC, c ASC) AS rn FROM q)
       |SELECT lang, predicted, COUNT(*) AS n_docs
       |FROM pr WHERE rn = 1
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // ── q234: dedup-aware train/test split leakage audit ───────────────────

  /** q234: near-duplicate pairs STRADDLING the deterministic
    * train/val/test split (the Lee et al. ACL'22 finding that dup-driven
    * train→test leakage inflates eval) — the q19 LSH pair set joined to
    * each endpoint's md5-bucket split label, rolled up per
    * (split, split) cell with the leak flag. The audit a curation
    * pipeline runs BEFORE freezing an eval split. */
  def q234SplitLeakage(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    val pairs = TextDedup.minHashLshPairs(docs, "doc_id", "text",
      k = 16, r = 4, w = 3, threshold = 0.5)
    val split = graft.operators.Sampling.deterministicSplit(
      docs.select(col("doc_id")), "doc_id", "split",
      Seq("train" -> 204, "val" -> 230, "test" -> 256))
    pairs
      .join(split.select(col("doc_id").as("d1"),
        col("split").as("graft_sa")), "d1")
      .join(split.select(col("doc_id").as("d2"),
        col("split").as("graft_sb")), "d2")
      .groupBy(least(col("graft_sa"), col("graft_sb")).as("split_lo"),
        greatest(col("graft_sa"), col("graft_sb")).as("split_hi"))
      .agg(count(lit(1)).as("n_pairs"), max(col("jaccard")).as("max_jaccard"))
      .withColumn("leaked", col("split_lo") =!= col("split_hi"))
      .orderBy(col("split_lo"), col("split_hi"))
  }

  // wraps the ONE canonical LSH oracle chain (q19Sql) — a parameter
  // change there propagates here, instead of a drifting inline copy
  val q234Sql: String =
    s"""WITH pairs AS (
      |  SELECT d1, d2, jaccard FROM (
      |${PipelineQueries.q19Sql}
      |  )),
      |b AS (SELECT doc_id,
      |  (strpos('0123456789abcdef',
      |     substr(md5('split_' || doc_id), 1, 1)) - 1) * 16
      |  + strpos('0123456789abcdef',
      |     substr(md5('split_' || doc_id), 2, 1)) - 1 AS bucket
      |  FROM documents),
      |sp AS (SELECT doc_id,
      |  CASE WHEN bucket < 204 THEN 'train'
      |       WHEN bucket < 230 THEN 'val'
      |       ELSE 'test' END AS split
      |  FROM b),
      |j AS (SELECT LEAST(a.split, c.split) AS split_lo,
      |        GREATEST(a.split, c.split) AS split_hi, p.jaccard
      |      FROM pairs p JOIN sp a ON a.doc_id = p.d1
      |      JOIN sp c ON c.doc_id = p.d2)
      |SELECT split_lo, split_hi, COUNT(*) AS n_pairs,
      |  MAX(jaccard) AS max_jaccard,
      |  (split_lo <> split_hi) AS leaked
      |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ── q235: Bloom-prefiltered incremental snapshot dedup ─────────────────

  /** q235: dedup a new crawl batch (doc_id % 3 = 0) against the prior
    * snapshot (the rest) THE 100 TB WAY: a fixed-size Bloom filter over
    * the snapshot keys rides to every scan task
    * ([[graft.operators.Sketches.bloomBits]]/`bloomPrune`, k=4,
    * m=4096) and kills definite-new rows in the projection — only
    * bloom-POSITIVE candidates pay the exact confirm join. No false
    * negatives ⇒ the final keep set EQUALS the exact anti-join
    * (spec-asserted); the gate also hashes each delta row's
    * `bloom_positive` flag, which the oracle reproduces bit-for-bit
    * from the same md5 positions — the FP rate is audited, not
    * guessed. */
  def q235SnapshotDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    val snap = docs.filter(col("doc_id") % 3 =!= 0)
    val delta = docs.filter(col("doc_id") % 3 === 0)
    val bits = Sketches.bloomBits(snap.select(col("text")), "text",
      k = 4, mBits = 4096)
    val pos = Sketches.bloomPrune(delta.select(col("doc_id"), col("text")),
        "text", bits, k = 4, mBits = 4096)
      .select(col("doc_id"), lit(true).as("graft_bp"))
    val dup = delta
      .join(snap.select(col("text")).distinct(), Seq("text"), "left_semi")
      .select(col("doc_id"), lit(true).as("graft_dup"))
    delta.select(col("doc_id"))
      .join(pos, Seq("doc_id"), "left")
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("graft_bp"), lit(false)).as("bloom_positive"),
        coalesce(col("graft_dup"), lit(false)).as("is_dup"),
        (!coalesce(col("graft_dup"), lit(false))).as("keep"))
      .orderBy(col("doc_id"))
  }

  private def bloomPosSql(textExpr: String): String =
    s"""CAST(list_sum(list_transform(range(1, 9), j ->
       |      (strpos('0123456789abcdef',
       |         substr(md5('bf' || r.r || '_' || $textExpr), j, 1)) - 1)
       |        * (1::BIGINT << (4 * (8 - j))))) AS BIGINT) % 4096""".stripMargin

  val q235Sql: String =
    s"""WITH snap AS (SELECT text FROM documents WHERE doc_id % 3 <> 0),
       |delta AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
       |sbits AS (SELECT DISTINCT ${bloomPosSql("snap.text")} AS p
       |  FROM snap CROSS JOIN range(0, 4) r(r)),
       |dpos AS (SELECT d.doc_id, ${bloomPosSql("d.text")} AS p
       |  FROM delta d CROSS JOIN range(0, 4) r(r)),
       |hits AS (SELECT dp.doc_id, COUNT(*) AS nh
       |  FROM dpos dp JOIN sbits b ON b.p = dp.p GROUP BY 1),
       |dups AS (SELECT DISTINCT d.doc_id
       |  FROM delta d JOIN snap s ON s.text = d.text)
       |SELECT d.doc_id,
       |  COALESCE(h.nh, 0) = 4 AS bloom_positive,
       |  (dup.doc_id IS NOT NULL) AS is_dup,
       |  (dup.doc_id IS NULL) AS keep
       |FROM delta d LEFT JOIN hits h USING (doc_id)
       |LEFT JOIN dups dup USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  // ── q236: per-domain quality scorecard / blocklist candidates ──────────

  /** q236: the UT1-style domain blocklist construction input — per
    * registrable domain (same synthetic URL universe as q211), exact doc
    * and token counts, the Gopher-battery keep count (q199's gated
    * rules, default thresholds), ⌊10⁶·keep/docs⌋, and the blocklist
    * flag (keep rate under 50%). The decision table a crawl pipeline
    * feeds its domain filter. */
  def q236DomainScorecard(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
      .withColumn("url", concat(
        lit("https://"),
        when(col("doc_id") % 7 === 0, lit("www.")).otherwise(lit("")),
        lit("d"), (col("doc_id") % 50).cast("string"),
        when(col("doc_id") % 3 === 0, lit(".co.uk")).otherwise(lit(".com")),
        lit("/p/"), (col("doc_id") % 100).cast("string")))
    val audit = TextAnalysis.gopherRuleAudit(docs, "doc_id", "text")
    docs.select(col("doc_id"),
        DomainDedup.registrableDomain(col("url")).as("domain"),
        size(split(col("text"), " ")).cast("long").as("graft_tok"))
      .join(audit.select(col("doc_id"), col("keep")), Seq("doc_id"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
        sum(col("graft_tok")).as("n_tokens"))
      .withColumn("keep_ppm",
        expr("cast(n_keep * 1000000 as decimal(38,0)) div " +
          "cast(n_docs as decimal(38,0))").cast("long"))
      .withColumn("blocklisted", col("keep_ppm") < 500000L)
      .orderBy(col("domain"))
  }

  val q236Sql: String =
    """WITH u AS (SELECT doc_id,
      |    'd' || CAST(doc_id % 50 AS VARCHAR) ||
      |      CASE WHEN doc_id % 3 = 0 THEN '.co.uk' ELSE '.com' END
      |      AS domain,
      |    text
      |  FROM documents),
      |gws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |gbase AS (SELECT doc_id,
      |    CAST(len(w) AS BIGINT) AS n_words,
      |    round(CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE)
      |      / len(w), 6) AS mean_word_len,
      |    CAST(len(list_filter(['the', 'and', 'of', 'a', 'to', 'in'],
      |      s -> list_contains(w, s))) AS BIGINT) AS n_stopwords,
      |    round(CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 6) AS ttr
      |  FROM gws),
      |gtc AS (SELECT doc_id, MAX(cnt) AS top_cnt FROM (
      |    SELECT doc_id, x, COUNT(*) AS cnt
      |    FROM (SELECT doc_id, unnest(w) AS x FROM gws) GROUP BY 1, 2)
      |  GROUP BY 1),
      |k AS (SELECT gbase.doc_id,
      |    (gbase.n_words BETWEEN 30 AND 5000
      |     AND gbase.mean_word_len BETWEEN 3.5 AND 10.0
      |     AND gbase.n_stopwords >= 2 AND gbase.ttr >= 0.5
      |     AND round(CAST(gtc.top_cnt AS DOUBLE) / gbase.n_words, 6)
      |       <= 0.1) AS keep,
      |    gbase.n_words
      |  FROM gbase JOIN gtc USING (doc_id)),
      |a AS (SELECT u.domain, k.keep, k.n_words
      |      FROM u JOIN k USING (doc_id))
      |SELECT domain, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
      |  CAST(SUM(n_words) AS BIGINT) AS n_tokens,
      |  CAST((SUM(CASE WHEN keep THEN 1 ELSE 0 END)::HUGEINT * 1000000) //
      |    COUNT(*)::HUGEINT AS BIGINT) AS keep_ppm,
      |  CAST((SUM(CASE WHEN keep THEN 1 ELSE 0 END)::HUGEINT * 1000000) //
      |    COUNT(*)::HUGEINT AS BIGINT) < 500000 AS blocklisted
      |FROM a GROUP BY domain ORDER BY domain""".stripMargin

  // ── q239: Spearman rank agreement between two signals ──────────────────

  /** q239: Spearman ρ between the word-count and character-count
    * orderings of the corpus ([[graft.operators.Standardize
    * .spearmanRho]], id-tie-broken ranks via the distributed
    * GlobalRank) — the monotone-agreement audit between two quality
    * signals. Gate hashes exact (n, Σd²); ρ is one IEEE division of
    * those integers. */
  def q239SpearmanAgreement(s: SparkSession, dir: String): DataFrame =
    graft.operators.Standardize.spearmanRho(
      Sources.documents(s, dir).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        col("n_chars")),
      "doc_id", "n_words", "n_chars")

  val q239Sql: String =
    """WITH t AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
      |    n_chars FROM documents),
      |r AS (SELECT doc_id,
      |        row_number() OVER (ORDER BY nw, doc_id) AS rx,
      |        row_number() OVER (ORDER BY n_chars, doc_id) AS ry
      |      FROM t),
      |d AS (SELECT (rx - ry) * (rx - ry) AS d2 FROM r)
      |SELECT COUNT(*) AS n, CAST(SUM(d2) AS BIGINT) AS sum_d2,
      |  CASE WHEN COUNT(*) > 1 THEN
      |    round(1.0 - CAST(6::HUGEINT * SUM(d2)::HUGEINT AS DOUBLE) /
      |      CAST(COUNT(*)::HUGEINT *
      |        (COUNT(*)::HUGEINT * COUNT(*)::HUGEINT - 1) AS DOUBLE), 6)
      |  END AS rho
      |FROM d""".stripMargin

  // ── q240: PMI-ranked collocations (Church & Hanks 1990) ────────────────

  /** q240: the 20 strongest adjacent-word collocations by pointwise
    * mutual information ([[graft.operators.Itemsets.pmiCollocations]],
    * c_xy ≥ 5) — ranked by the EXACT probability ratio
    * ⌊10⁶·c_xy·Nu²/(Nb·c_x·c_y)⌋ (log-free: log is monotone, so the
    * ratio ordering IS the PMI ordering), every gated column an exact
    * integer. */
  def q240PmiCollocations(s: SparkSession, dir: String): DataFrame =
    graft.operators.Itemsets.pmiCollocations(Sources.documents(s, dir),
        "doc_id", "text", minCount = 5L, k = 20)
      .orderBy(col("ratio_q").desc, col("x").asc, col("y").asc)

  val q240Sql: String =
    """WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
      |p AS (SELECT w[CAST(i AS INT)] AS x, w[CAST(i + 1 AS INT)] AS y
      |      FROM (SELECT w, unnest(range(1, len(w))) AS i FROM w
      |            WHERE len(w) >= 2)),
      |cxy AS (SELECT x, y, COUNT(*) AS c_xy FROM p GROUP BY 1, 2
      |        HAVING COUNT(*) >= 5),
      |u AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
      |cu AS (SELECT t, COUNT(*) AS c FROM u GROUP BY 1),
      |nu AS (SELECT CAST(SUM(c) AS BIGINT) AS nu FROM cu),
      |nb AS (SELECT COUNT(*) AS nb FROM p),
      |j AS (SELECT cxy.x, cxy.y, cxy.c_xy, ux.c AS c_x, uy.c AS c_y,
      |        CAST((1000000::HUGEINT * cxy.c_xy::HUGEINT *
      |            nu.nu::HUGEINT * nu.nu::HUGEINT) //
      |          (nb.nb::HUGEINT * ux.c::HUGEINT * uy.c::HUGEINT)
      |          AS BIGINT) AS ratio_q
      |      FROM cxy JOIN cu ux ON ux.t = cxy.x
      |      JOIN cu uy ON uy.t = cxy.y
      |      CROSS JOIN nu CROSS JOIN nb)
      |SELECT x, y, c_xy, c_x, c_y, ratio_q FROM j
      |ORDER BY ratio_q DESC, x, y LIMIT 20""".stripMargin

  // ── q241: margin-based uncertainty sampling ────────────────────────────

  /** q241: the 25 documents the q233 centroid classifier is LEAST sure
    * about ([[graft.operators.Classify.uncertaintyMargin]] — smallest
    * top-1 vs top-2 score margin, Lewis & Gale 1994) — where a labeling
    * budget goes. Margins are exact integer score differences; the cut
    * is TakeOrdered on (margin, doc). */
  def q241UncertaintySample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Classify.uncertaintyMargin(Sources.documents(s, dir),
        "doc_id", "text", "lang", centroidLabels, k = 25)
      .orderBy(col("margin_q").asc, col("doc_id").asc)

  // wraps the q233 score-grid chain: identical CTEs up to `q`, then the
  // top-2 rank/margin cut instead of the argmax-confusion rollup
  val q241Sql: String = {
    val lv = centroidLabels.map(l => s"'$l'").mkString(", ")
    s"""WITH tf AS (SELECT doc_id, t AS term, COUNT(*) AS tf FROM
       |       (SELECT doc_id, unnest(string_split(text, ' ')) AS t
       |        FROM documents) GROUP BY 1, 2),
       |cent AS (SELECT tf.term, d.lang AS c, SUM(tf.tf) AS w
       |         FROM tf JOIN documents d USING (doc_id) GROUP BY 1, 2),
       |ct AS (SELECT c, SUM(w) AS n FROM cent GROUP BY 1),
       |dots AS (SELECT tf.doc_id, cent.c, SUM(tf.tf * cent.w) AS dot
       |         FROM tf JOIN cent USING (term) GROUP BY 1, 2),
       |lf AS (SELECT unnest([$lv]) AS c),
       |ap AS (SELECT d.doc_id, d.lang, lf.c,
       |         COALESCE(dt.dot, 0) AS dot, ct.n
       |       FROM documents d CROSS JOIN lf
       |       JOIN ct ON ct.c = lf.c
       |       LEFT JOIN dots dt ON dt.doc_id = d.doc_id AND dt.c = lf.c),
       |q AS (SELECT doc_id, lang, c,
       |        (dot::HUGEINT * 1000000000000::HUGEINT) // n::HUGEINT AS q
       |      FROM ap),
       |pr AS (SELECT doc_id, lang, c, q, row_number() OVER (
       |         PARTITION BY doc_id ORDER BY q DESC, c ASC) AS rn FROM q),
       |t1 AS (SELECT doc_id, lang, c AS predicted, q AS s1 FROM pr
       |       WHERE rn = 1),
       |t2 AS (SELECT doc_id, c AS runner_up, q AS s2 FROM pr WHERE rn = 2)
       |SELECT t1.doc_id, t1.lang, t1.predicted, t2.runner_up,
       |  CAST(t1.s1 - t2.s2 AS BIGINT) AS margin_q
       |FROM t1 JOIN t2 USING (doc_id)
       |ORDER BY margin_q ASC, t1.doc_id ASC LIMIT 25""".stripMargin
  }

  // ── q242: classifier reliability / calibration audit ───────────────────

  /** q242: the reliability-diagram table for the q212 linear quality
    * classifier against the English-language target
    * ([[graft.operators.Profiling.reliabilityBuckets]], 200-milli logit
    * buckets) — per bucket, exact doc counts and positive rate; a
    * calibrated score shows pos_ppm rising with the bucket. */
  def q242Reliability(s: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.linearQualityScore(
      Sources.documents(s, dir), "doc_id", "text",
      QualityQueries.q212MilliWeights.toMap, QualityQueries.q212BiasMilli)
    val withLang = scored.join(
      Sources.documents(s, dir).select(col("doc_id"), col("lang")),
      Seq("doc_id"))
    graft.operators.Profiling.reliabilityBuckets(withLang, "logit_milli",
        col("lang") === "en", bucketWidth = 200L)
      .orderBy(col("bucket"))
  }

  val q242Sql: String = {
    val values = QualityQueries.q212MilliWeights
      .map { case (t, w) => s"('$t', ${w}::BIGINT)" }.mkString(", ")
    s"""WITH w(term, wm) AS (VALUES $values),
       |t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |      FROM documents),
       |h AS (SELECT t.doc_id, CAST(SUM(w.wm) AS BIGINT) AS zsum
       |      FROM t JOIN w USING (term) GROUP BY t.doc_id),
       |sc AS (SELECT d.doc_id, d.lang,
       |         CAST(COALESCE(h.zsum, 0) +
       |           ${QualityQueries.q212BiasMilli} AS BIGINT) AS lm
       |       FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id),
       |b AS (SELECT CAST(FLOOR(lm::DOUBLE / 200.0) AS BIGINT) AS bucket,
       |        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
       |      FROM sc)
       |SELECT bucket, COUNT(*) AS n,
       |  CAST(SUM(pos) AS BIGINT) AS n_pos,
       |  CAST((SUM(pos)::HUGEINT * 1000000) // COUNT(*)::HUGEINT
       |    AS BIGINT) AS pos_ppm
       |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  // ── q243: competence-based curriculum admission (Platanios 2019) ───────

  /** q243: root-pacing curriculum admission steps for the corpus
    * ([[graft.operators.Sampling.curriculumAdmission]], difficulty =
    * word count, T = 1000 steps, c0 = 1/10) — the inverse of the √
    * pacing function computed wholly in exact integer arithmetic (the
    * square cancels the root), so every per-doc admit step is
    * gate-hashed. The training-scheduler input that decides WHEN each
    * example first appears. */
  def q243CurriculumAdmission(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.curriculumAdmission(
        Sources.documents(s, dir).select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_words")),
        "doc_id", "n_words", totalSteps = 1000L, c0Num = 1L, c0Den = 10L)
      .orderBy(col("doc_id"))

  val q243Sql: String =
    """WITH t AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nw
      |  FROM documents),
      |r AS (SELECT doc_id,
      |        row_number() OVER (ORDER BY nw, doc_id) AS r,
      |        COUNT(*) OVER () AS n
      |      FROM t)
      |SELECT doc_id, CAST(r AS BIGINT) AS difficulty_rank,
      |  CASE WHEN 100::HUGEINT * r * r <= 1::HUGEINT * n * n THEN 0
      |    ELSE CAST((1000::HUGEINT * (100::HUGEINT * r * r - n * n)
      |      + 99::HUGEINT * n * n - 1) // (99::HUGEINT * n * n) AS BIGINT)
      |  END AS admit_step
      |FROM r ORDER BY doc_id""".stripMargin

  // ── q244: code-switching / mixed-language audit ────────────────────────

  /** q244: per-document language-profile hit vectors and the mixed flag
    * ([[TextAnalysis.codeSwitchAudit]], minHits = 2) — the CCNet-style
    * mixed-language detector exposing the whole hit vector rather than
    * q47's argmax alone. One codegen'd projection; every column an
    * exact integer/boolean. */
  def q244CodeSwitch(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.codeSwitchAudit(Sources.documents(s, dir), "doc_id",
        "text", minHits = 2)
      .orderBy(col("doc_id"))

  val q244Sql: String =
    """WITH w AS (SELECT doc_id,
      |         list_distinct(string_split(text, ' ')) AS ws
      |       FROM documents),
      |h AS (SELECT doc_id,
      |  CAST(len(list_intersect(ws, ['the','and','of','to','in']))
      |    AS BIGINT) AS en_hits,
      |  CAST(len(list_intersect(ws, ['el','la','de','que','los']))
      |    AS BIGINT) AS es_hits,
      |  CAST(len(list_intersect(ws, ['le','la','et','les','des']))
      |    AS BIGINT) AS fr_hits,
      |  CAST(len(list_intersect(ws, ['der','die','und','das','ist']))
      |    AS BIGINT) AS de_hits
      |FROM w)
      |SELECT doc_id, en_hits, es_hits, fr_hits, de_hits,
      |  CAST((CASE WHEN en_hits >= 2 THEN 1 ELSE 0 END)
      |    + (CASE WHEN es_hits >= 2 THEN 1 ELSE 0 END)
      |    + (CASE WHEN fr_hits >= 2 THEN 1 ELSE 0 END)
      |    + (CASE WHEN de_hits >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_langs,
      |  ((CASE WHEN en_hits >= 2 THEN 1 ELSE 0 END)
      |    + (CASE WHEN es_hits >= 2 THEN 1 ELSE 0 END)
      |    + (CASE WHEN fr_hits >= 2 THEN 1 ELSE 0 END)
      |    + (CASE WHEN de_hits >= 2 THEN 1 ELSE 0 END)) >= 2 AS mixed
      |FROM h ORDER BY doc_id""".stripMargin

  // ── q245: payload magic-byte integrity audit ───────────────────────────

  /** q245: corrupt-file detection over synthesized binary payloads —
    * [[graft.operators.Multimodal.magicByteAudit]]: each doc claims a
    * type by doc_id % 3 (jpg/png/pdf) and carries the matching printable
    * signature prefix ONLY when doc_id % 2 = 0, so the gate proves the
    * byte-prefix check flags exactly the unprefixed half. (Real magic
    * bytes are non-printable; the operator takes arbitrary byte
    * signatures — the printable stand-ins keep the oracle replayable at
    * the string level.) */
  def q245MagicAudit(s: SparkSession, dir: String): DataFrame = {
    val magics = Map(
      "jpg" -> "JPG!".getBytes("UTF-8"),
      "png" -> "PNG#".getBytes("UTF-8"),
      "pdf" -> "%PDF".getBytes("UTF-8"))
    val claimed = when(col("doc_id") % 3 === 0, "jpg")
      .when(col("doc_id") % 3 === 1, "png").otherwise("pdf")
    val prefix = when(col("doc_id") % 3 === 0, "JPG!")
      .when(col("doc_id") % 3 === 1, "PNG#").otherwise("%PDF")
    val payload = when(col("doc_id") % 2 === 0,
      concat(prefix, col("text"))).otherwise(col("text")).cast("binary")
    graft.operators.Multimodal.magicByteAudit(
        Sources.documents(s, dir).select(col("doc_id"),
          claimed.as("claimed"), payload.as("payload")),
        "doc_id", "payload", "claimed", magics)
      .orderBy(col("doc_id"))
  }

  val q245Sql: String =
    """WITH p AS (SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'jpg'
      |         WHEN doc_id % 3 = 1 THEN 'png' ELSE 'pdf' END AS claimed,
      |    CASE WHEN doc_id % 2 = 0 THEN
      |      (CASE WHEN doc_id % 3 = 0 THEN 'JPG!'
      |            WHEN doc_id % 3 = 1 THEN 'PNG#' ELSE '%PDF' END) || text
      |    ELSE text END AS payload
      |  FROM documents)
      |SELECT doc_id, claimed,
      |  substr(payload, 1, 4) = (CASE WHEN claimed = 'jpg' THEN 'JPG!'
      |    WHEN claimed = 'png' THEN 'PNG#' ELSE '%PDF' END) AS magic_ok,
      |  CAST(length(payload) AS BIGINT) AS byte_len
      |FROM p ORDER BY doc_id""".stripMargin
}
