package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.operators.{Graph, Relevance, Sketches, Standardize, TextAnalysis, TextDedup}
import graft.sources.Sources

/** Round-6 graph/evaluation/join-pruning operators: PageRank survivor
  * scoring over the dedup graph, two-sample KS distribution drift,
  * Bloom-filter join pruning, and per-stratum ROC AUC — each with a
  * DuckDB oracle reproducing the arithmetic exactly (q147's oracle is
  * the PLAIN join, so the gate proves the Bloom filter admits no false
  * negatives end-to-end). */
object GraphEvalQueries {

  /** The q136 LSH near-dup graph: MinHash(16) bands(4×4), Jaccard ≥ 0.5. */
  private def dedupPairs(s: SparkSession, dir: String): DataFrame =
    TextDedup.minHashLshPairs(Sources.documents(s, dir),
      "doc_id", "text", k = 16, r = 4, w = 3, threshold = 0.5)

  /** The dedup-pair CTE reproducing [[dedupPairs]] — wraps the ONE
    * canonical LSH oracle chain (`PipelineQueries.q19Sql`) like
    * q150/q153 do, so an LSH parameter change propagates to every
    * dependent oracle from a single definition. */
  private val pairsCte: String =
    s"""WITH pairs AS (
       |  SELECT d1, d2 FROM (
       |${PipelineQueries.q19Sql}
       |  ))""".stripMargin

  // ── q145: PageRank over the dedup graph ────────────────────────────────

  /** q145: 3-iteration integer-scaled PageRank over the LSH near-dup
    * graph — the canonical-survivor centrality; one shuffle per round,
    * rank state only, bit-identical across engines. */
  def q145PageRank(s: SparkSession, dir: String): DataFrame =
    Graph.pageRank(dedupPairs(s, dir), "d1", "d2", iters = 3)
      .orderBy(col("node"))

  val q145Sql: String = pairsCte + """,
      |e AS (SELECT d1 AS s, d2 AS t FROM pairs
      |      UNION ALL SELECT d2, d1 FROM pairs),
      |deg AS (SELECT s AS node, count(*) AS deg FROM e GROUP BY s),
      |nn AS (SELECT count(*) AS n FROM deg),
      |p0 AS (SELECT node, deg, 1000000000000 // nn.n AS pr
      |       FROM deg CROSS JOIN nn),
      |i1 AS (SELECT e.t AS node, CAST(SUM(p.pr // p.deg) AS BIGINT) AS sin
      |       FROM e JOIN p0 p ON e.s = p.node GROUP BY e.t),
      |p1 AS (SELECT p.node, p.deg,
      |         3000000000000 // (20 * nn.n)
      |           + (17 * COALESCE(i.sin, 0)) // 20 AS pr
      |       FROM p0 p LEFT JOIN i1 i ON p.node = i.node CROSS JOIN nn),
      |i2 AS (SELECT e.t AS node, CAST(SUM(p.pr // p.deg) AS BIGINT) AS sin
      |       FROM e JOIN p1 p ON e.s = p.node GROUP BY e.t),
      |p2 AS (SELECT p.node, p.deg,
      |         3000000000000 // (20 * nn.n)
      |           + (17 * COALESCE(i.sin, 0)) // 20 AS pr
      |       FROM p1 p LEFT JOIN i2 i ON p.node = i.node CROSS JOIN nn),
      |i3 AS (SELECT e.t AS node, CAST(SUM(p.pr // p.deg) AS BIGINT) AS sin
      |       FROM e JOIN p2 p ON e.s = p.node GROUP BY e.t),
      |p3 AS (SELECT p.node, p.deg,
      |         3000000000000 // (20 * nn.n)
      |           + (17 * COALESCE(i.sin, 0)) // 20 AS pr
      |       FROM p2 p LEFT JOIN i3 i ON p.node = i.node CROSS JOIN nn)
      |SELECT node, deg, pr AS pr_scaled FROM p3 ORDER BY node""".stripMargin

  // ── q146: two-sample KS drift ──────────────────────────────────────────

  /** q146: KS statistic of each non-English language's document-length
    * distribution against the English baseline — integer-exact argmax
    * over cumulative-count cross-products, per-group windows only. */
  def q146KsDrift(s: SparkSession, dir: String): DataFrame =
    Standardize.ksDrift(Sources.documents(s, dir), "n_chars", "lang",
        baselineGroup = "en", groups = Seq("de", "es", "fr", "zh"))
      .orderBy(col("g"))

  val q146Sql: String =
    """WITH t AS (SELECT lang AS g, n_chars AS v, 1 AS kg, 0 AS kb
      |           FROM documents WHERE lang IN ('de', 'es', 'fr', 'zh')
      |           UNION ALL
      |           SELECT gg.g, n_chars, 0, 1
      |           FROM documents
      |           CROSS JOIN (SELECT unnest(['de','es','fr','zh']) AS g) gg
      |           WHERE lang = 'en'),
      |c AS (SELECT g, v, CAST(SUM(kg) AS BIGINT) AS kg,
      |        CAST(SUM(kb) AS BIGINT) AS kb
      |      FROM t GROUP BY g, v),
      |w AS (SELECT g, v,
      |        CAST(SUM(kg) OVER pw AS BIGINT) AS cg,
      |        CAST(SUM(kb) OVER pw AS BIGINT) AS cb,
      |        CAST(SUM(kg) OVER (PARTITION BY g) AS BIGINT) AS ng,
      |        CAST(SUM(kb) OVER (PARTITION BY g) AS BIGINT) AS nb
      |      FROM c
      |      WINDOW pw AS (PARTITION BY g ORDER BY v
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |s AS (SELECT g, MAX(ng) AS n_g, MAX(nb) AS n_b,
      |        MAX(abs(cg * nb - cb * ng) * 1048576 + v) AS best
      |      FROM w GROUP BY g)
      |SELECT g, n_g, n_b, best % 1048576 AS ks_at_value,
      |  round(CAST(best // 1048576 AS DOUBLE) / (n_g * n_b), 6) AS ks_stat
      |FROM s ORDER BY g""".stripMargin

  // ── q147: Bloom-filter join pruning ────────────────────────────────────

  /** q147: revenue of high-value orders by priority, with the lineitem
    * scan Bloom-pruned (k=3, 2^16 bits) before the join — the filter is
    * a narrow codegen'd bitmap probe, zero extra shuffle; the oracle is
    * the PLAIN join, so a hash match proves no false negatives. */
  def q147BloomJoin(s: SparkSession, dir: String): DataFrame = {
    val hi = Sources.orders(s, dir)
      .filter(col("o_totalprice") > 490000.0)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val bits = Sketches.bloomBits(hi, "o_orderkey", k = 3, mBits = 65536)
    val pruned = Sketches.bloomPrune(Sources.lineitem(s, dir),
      "l_orderkey", bits, k = 3, mBits = 65536)
    pruned.join(broadcast(hi), pruned("l_orderkey") === hi("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  val q147Sql: String =
    """SELECT o.o_orderpriority, count(*) AS n_items,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS revenue
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_totalprice > 490000.0
      |GROUP BY o.o_orderpriority
      |ORDER BY o.o_orderpriority""".stripMargin

  // ── q148: per-stratum ROC AUC ──────────────────────────────────────────

  /** q148: per-source AUC of the alpha-ratio quality score for
    * predicting English — Mann–Whitney rank-sum with exact tie
    * handling, int64 until one final division. */
  def q148GroupAuc(s: SparkSession, dir: String): DataFrame = {
    val alpha = TextAnalysis.qualityCols(col("text")).toMap.apply("alpha_ratio")
    val d = Sources.documents(s, dir).select(col("source"),
      round(alpha * 1000000.0, 0).cast(LongType).as("q"),
      when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
    Standardize.groupAuc(d, "q", "pos", "source")
      .orderBy(col("source"))
  }

  val q148Sql: String =
    """WITH d AS (SELECT source,
      |    CAST(round(
      |      CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
      |        / length(text) * 1000000.0, 0) AS BIGINT) AS q,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      |  FROM documents),
      |c AS (SELECT source, q, count(*) AS n, CAST(SUM(pos) AS BIGINT) AS np
      |      FROM d GROUP BY 1, 2),
      |w AS (SELECT source, q, n, np,
      |        CAST(SUM(n) OVER (PARTITION BY source ORDER BY q
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |          AS BIGINT) - n AS b
      |      FROM c),
      |s AS (SELECT source,
      |        CAST(SUM(np * (b * 2 + n + 1)) AS BIGINT) AS t2u,
      |        CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(np) AS BIGINT) AS n_pos
      |      FROM w GROUP BY source)
      |SELECT source, n, n_pos,
      |  CASE WHEN n_pos > 0 AND n - n_pos > 0 THEN
      |    round(CAST(t2u - n_pos * (n_pos + 1) AS DOUBLE)
      |      / (n_pos * (n - n_pos) * 2), 6) END AS auc
      |FROM s ORDER BY source""".stripMargin

  // ── q150: dedup-weighted effective token count ─────────────────────────

  /** q150: per-source corpus size where each document counts
    * tokens/cluster-size — the "effective data" metric after near-dup
    * discounting (a 5-copy template family contributes one document's
    * worth); composes LSH pairs → connected components → a doc-keyed
    * join, then one rollup with 6-dp-decimal weight sums. */
  def q150EffectiveTokens(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    val docs = Sources.documents(s, dir)
    val comp = Graph.connectedComponents(dedupPairs(s, dir), "d1", "d2")
    val sizes = comp.groupBy(col("component"))
      .agg(count(lit(1)).as("graft_csz"))
    val withSize = comp.join(sizes, "component")
      .select(col("node").as("doc_id"), col("graft_csz"))
    docs.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast(LongType).as("graft_tok"))
      .join(withSize, Seq("doc_id"), "left")
      .withColumn("graft_csz", coalesce(col("graft_csz"), lit(1L)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("graft_tok")).as("total_tokens"),
        sum(round(col("graft_tok").cast(DoubleType) / col("graft_csz"), 6)
          .cast(DecimalType(18, 6))).cast(DoubleType).as("effective_tokens"))
      .orderBy(col("source"))
  }

  val q150Sql: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT d1, d2 FROM (
       |${PipelineQueries.q19Sql}
       |  )),
       |e AS (SELECT d1 AS a, d2 AS b FROM pairs
       |      UNION SELECT d2 AS a, d1 AS b FROM pairs),
       |reach(n, m) AS (
       |  SELECT DISTINCT a AS n, a AS m FROM e
       |  UNION
       |  SELECT r.n, e.b FROM reach r JOIN e ON r.m = e.a),
       |comp AS (SELECT n AS doc_id, MIN(m) AS component FROM reach GROUP BY n),
       |csz AS (SELECT component, COUNT(*) AS graft_csz FROM comp
       |        GROUP BY component),
       |dsz AS (SELECT c.doc_id, s.graft_csz FROM comp c
       |        JOIN csz s ON c.component = s.component),
       |d AS (SELECT doc.source,
       |        len(string_split(doc.text, ' ')) AS tok,
       |        COALESCE(dsz.graft_csz, 1) AS csz
       |      FROM documents doc LEFT JOIN dsz ON doc.doc_id = dsz.doc_id)
       |SELECT source, count(*) AS n_docs,
       |  CAST(SUM(tok) AS BIGINT) AS total_tokens,
       |  CAST(SUM(CAST(round(CAST(tok AS DOUBLE) / csz, 6)
       |    AS DECIMAL(18,6))) AS DOUBLE) AS effective_tokens
       |FROM d GROUP BY source ORDER BY source""".stripMargin

  // ── q153: duplicate-cluster medoid survivors ───────────────────────────

  /** q153: per dup cluster, the most-central member (highest summed
    * in-cluster Jaccard, decimal-exact, min-id ties) — the survivor
    * policy that keeps the canonical copy; WindowGroupLimit top-1
    * sharing the component exchange. */
  def q153Medoids(s: SparkSession, dir: String): DataFrame =
    Graph.clusterMedoids(dedupPairs(s, dir), "d1", "d2", "jaccard")
      .orderBy(col("component"))

  val q153Sql: String =
    s"""WITH RECURSIVE jpairs AS (
       |  SELECT d1, d2, jaccard FROM (
       |${PipelineQueries.q19Sql}
       |  )),
       |e AS (SELECT d1 AS a, d2 AS b FROM jpairs
       |      UNION SELECT d2 AS a, d1 AS b FROM jpairs),
       |reach(n, m) AS (
       |  SELECT DISTINCT a AS n, a AS m FROM e
       |  UNION
       |  SELECT r.n, e.b FROM reach r JOIN e ON r.m = e.a),
       |comp AS (SELECT n AS node, MIN(m) AS component FROM reach GROUP BY n),
       |csz AS (SELECT component, COUNT(*) AS n_members FROM comp
       |        GROUP BY component),
       |inc AS (SELECT node, SUM(CAST(round(j, 6) AS DECIMAL(18,6))) AS sumj
       |        FROM (SELECT d1 AS node, jaccard AS j FROM jpairs
       |              UNION ALL SELECT d2, jaccard FROM jpairs)
       |        GROUP BY node),
       |rk AS (SELECT c.component, c.node, i.sumj,
       |         row_number() OVER (PARTITION BY c.component
       |           ORDER BY i.sumj DESC, c.node) AS r
       |       FROM comp c JOIN inc i ON c.node = i.node)
       |SELECT rk.component, rk.node AS medoid, csz.n_members,
       |  CAST(rk.sumj AS DOUBLE) AS medoid_score
       |FROM rk JOIN csz ON rk.component = csz.component
       |WHERE rk.r = 1 ORDER BY rk.component""".stripMargin

  // ── q156: profile drift between snapshots ──────────────────────────────

  /** q156: column-level profile drift between the even- and odd-id
    * halves of the documents table (stand-ins for old/new snapshots) —
    * two melted one-pass profiles, metadata-scale join, integer deltas. */
  def q156ProfileDrift(s: SparkSession, dir: String): DataFrame = {
    val d = Sources.documents(s, dir)
    graft.operators.Profiling.profileDiff(
        d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 === 1),
        Seq("lang", "n_chars"))
      .orderBy(col("col_name"))
  }

  val q156Sql: String =
    """WITH o AS (
      |  SELECT 'lang' AS col_name, count(*) AS old_rows,
      |    count(*) - count(lang) AS old_null,
      |    count(DISTINCT lang) AS old_distinct
      |  FROM documents WHERE doc_id % 2 = 0
      |  UNION ALL
      |  SELECT 'n_chars', count(*), count(*) - count(n_chars),
      |    count(DISTINCT n_chars)
      |  FROM documents WHERE doc_id % 2 = 0),
      |n AS (
      |  SELECT 'lang' AS col_name, count(*) AS new_rows,
      |    count(*) - count(lang) AS new_null,
      |    count(DISTINCT lang) AS new_distinct
      |  FROM documents WHERE doc_id % 2 = 1
      |  UNION ALL
      |  SELECT 'n_chars', count(*), count(*) - count(n_chars),
      |    count(DISTINCT n_chars)
      |  FROM documents WHERE doc_id % 2 = 1)
      |SELECT o.col_name, o.old_rows, n.new_rows,
      |  n.new_rows - o.old_rows AS d_rows,
      |  o.old_null, n.new_null, n.new_null - o.old_null AS d_null,
      |  o.old_distinct, n.new_distinct,
      |  n.new_distinct - o.old_distinct AS d_distinct
      |FROM o JOIN n USING (col_name)
      |ORDER BY o.col_name""".stripMargin

  // ── q157: embedding centroid drift ─────────────────────────────────────

  /** q157: per-label cosine between the even- and odd-id halves'
    * centroids — the representation-drift alarm; one posexplode pass,
    * exact-decimal centroid sums, metadata-scale joins. */
  def q157CentroidDrift(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.pmod
    val e = Sources.embeddings(s, dir)
      .withColumn("half", pmod(col("vec_id"), lit(2)))
    graft.operators.VectorAggs.centroidDrift(e, "label", "embedding", "half")
      .orderBy(col("label"))
  }

  val q157Sql: String =
    """WITH dims AS (
      |  SELECT label::VARCHAR AS label, vec_id % 2 AS half, d,
      |    round(CAST(SUM(CAST(round(embedding[d]::DOUBLE, 6)
      |        AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS c
      |  FROM embeddings CROSS JOIN range(1, 65) t(d)
      |  GROUP BY 1, 2, 3),
      |a AS (SELECT label, d, c AS ca FROM dims WHERE half = 0),
      |b AS (SELECT label, d, c AS cb FROM dims WHERE half = 1),
      |j AS (SELECT a.label, a.ca, b.cb
      |      FROM a JOIN b ON a.label = b.label AND a.d = b.d)
      |SELECT label, count(*) AS n_dims,
      |  round(CAST(SUM(CAST(round(ca * cb, 6) AS DECIMAL(28,6))) AS DOUBLE)
      |    / (sqrt(CAST(SUM(CAST(round(ca * ca, 6) AS DECIMAL(28,6)))
      |         AS DOUBLE))
      |       * sqrt(CAST(SUM(CAST(round(cb * cb, 6) AS DECIMAL(28,6)))
      |         AS DOUBLE))), 6) AS centroid_cos
      |FROM j GROUP BY label ORDER BY label""".stripMargin

  // ── q158: mutual information source ↔ lang ─────────────────────────────

  /** q158: per-source conditional entropy H(lang|source) and MI
    * contribution — the feature-relevance / leakage measure; one
    * contingency-table agg, metadata-scale windows, decimal-exact
    * term sums. */
  def q158MutualInfo(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.mutualInformation(
        Sources.documents(s, dir), "source", "lang")
      .orderBy(col("source"))

  val q158Sql: String =
    """WITH c AS (SELECT source, lang, count(*) AS nxy
      |           FROM documents GROUP BY 1, 2),
      |w AS (SELECT source, lang, nxy,
      |        CAST(SUM(nxy) OVER (PARTITION BY source) AS BIGINT) AS nx,
      |        CAST(SUM(nxy) OVER (PARTITION BY lang) AS BIGINT) AS ny,
      |        CAST(SUM(nxy) OVER () AS BIGINT) AS n
      |      FROM c),
      |t AS (SELECT source, nx,
      |        CAST(round((CAST(nxy AS DOUBLE) / nx)
      |          * ln(CAST(nx AS DOUBLE) / nxy), 6) AS DECIMAL(18,6)) AS h,
      |        CAST(round((CAST(nxy AS DOUBLE) / n)
      |          * ln((CAST(nxy AS DOUBLE) * n) / (CAST(nx AS DOUBLE) * ny)),
      |          6) AS DECIMAL(18,6)) AS mi
      |      FROM w)
      |SELECT source, MAX(nx) AS n, COUNT(*) AS n_y_values,
      |  CAST(SUM(h) AS DOUBLE) AS h_y_given_x,
      |  CAST(SUM(mi) AS DOUBLE) AS mi_contrib
      |FROM t GROUP BY source ORDER BY source""".stripMargin

  // ── q163: NDCG@10 ranking quality ──────────────────────────────────────

  /** q163: per-lang NDCG@10 of the length ranking (n_chars desc) against
    * graded relevance = occurrences of 'the' capped at 3 — the graded
    * ranking-metric layer for any ordering this engine produces; two
    * row_number windows on one partitioning, decimal term sums. */
  def q163Ndcg(s: SparkSession, dir: String): DataFrame = {
    val d = Sources.documents(s, dir).select(col("lang"), col("doc_id"),
      col("n_chars"),
      least(lit(3), size(filter(split(col("text"), " "),
        w => w === "the"))).cast(LongType).as("rel"))
    Relevance.ndcgAtK(d, "lang", "n_chars", "doc_id", "rel", k = 10)
      .orderBy(col("lang"))
  }

  val q163Sql: String =
    """WITH d AS (SELECT lang, doc_id, n_chars,
      |    LEAST(3, len(list_filter(string_split(text, ' '),
      |      x -> x = 'the'))) AS rel
      |  FROM documents),
      |r AS (SELECT lang, rel,
      |        row_number() OVER (PARTITION BY lang
      |          ORDER BY n_chars DESC, doc_id) AS pos,
      |        row_number() OVER (PARTITION BY lang
      |          ORDER BY rel DESC, doc_id) AS ipos
      |      FROM d),
      |g AS (SELECT lang, count(*) AS n_items,
      |        SUM(CASE WHEN pos <= 10 THEN
      |          CAST(round(CAST((1::BIGINT << rel) - 1 AS DOUBLE)
      |            / ln(CAST(pos AS DOUBLE) + 1.0), 6) AS DECIMAL(38,6))
      |          ELSE CAST(0 AS DECIMAL(38,6)) END) AS dcgd,
      |        SUM(CASE WHEN ipos <= 10 THEN
      |          CAST(round(CAST((1::BIGINT << rel) - 1 AS DOUBLE)
      |            / ln(CAST(ipos AS DOUBLE) + 1.0), 6) AS DECIMAL(38,6))
      |          ELSE CAST(0 AS DECIMAL(38,6)) END) AS idcgd
      |      FROM r GROUP BY lang)
      |SELECT lang, n_items, round(CAST(dcgd AS DOUBLE), 6) AS dcg,
      |  CASE WHEN idcgd > 0
      |    THEN round(CAST(dcgd AS DOUBLE) / CAST(idcgd AS DOUBLE), 6)
      |  END AS ndcg
      |FROM g ORDER BY lang""".stripMargin

  // ── q164: Cohen's kappa agreement ──────────────────────────────────────

  /** q164: per-source chance-corrected agreement (Cohen's κ) between the
    * q24 language-ID heuristic and the labeled lang column — "is the
    * classifier beating its marginals, per slice"; int64-exact
    * contingency/marginal counts, one fixed-association ratio. */
  def q164Kappa(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    val pred = TextAnalysis.languageId(docs, "doc_id", "text")
    val labeled = docs.select(col("doc_id"), col("source"), col("lang"))
      .join(pred.select(col("doc_id"), col("predicted_lang")), "doc_id")
    Standardize.cohenKappa(labeled, "predicted_lang", "lang", "source")
      .orderBy(col("source"))
  }

  val q164Sql: String =
    """WITH w AS (SELECT doc_id, source, lang,
      |    list_distinct(string_split(text, ' ')) AS ws FROM documents),
      |h AS (SELECT doc_id, source, lang,
      |  len(list_intersect(ws, ['the','and','of','to','in'])) AS en,
      |  len(list_intersect(ws, ['el','la','de','que','los'])) AS es,
      |  len(list_intersect(ws, ['le','la','et','les','des'])) AS fr,
      |  len(list_intersect(ws, ['der','die','und','das','ist'])) AS de
      |FROM w),
      |p AS (SELECT source, lang,
      |  CASE WHEN greatest(en, es, fr, de) = 0 THEN 'und'
      |       WHEN en >= es AND en >= fr AND en >= de THEN 'en'
      |       WHEN es >= fr AND es >= de THEN 'es'
      |       WHEN fr >= de THEN 'fr'
      |       ELSE 'de' END AS pred
      |FROM h),
      |cells AS (SELECT source, pred, lang, count(*) AS cn
      |          FROM p GROUP BY 1, 2, 3),
      |ma AS (SELECT source, pred, CAST(SUM(cn) AS BIGINT) AS na
      |       FROM cells GROUP BY 1, 2),
      |mb AS (SELECT source, lang, CAST(SUM(cn) AS BIGINT) AS nb
      |       FROM cells GROUP BY 1, 2),
      |tot AS (SELECT source, CAST(SUM(cn) AS BIGINT) AS n,
      |          CAST(SUM(CASE WHEN pred = lang THEN cn ELSE 0 END)
      |            AS BIGINT) AS agree
      |        FROM cells GROUP BY source),
      |pe AS (SELECT ma.source,
      |         CAST(SUM(ma.na * mb.nb) AS BIGINT) AS pe_num
      |       FROM ma JOIN mb ON ma.source = mb.source AND ma.pred = mb.lang
      |       GROUP BY ma.source)
      |SELECT t.source, t.n, t.agree AS n_agree,
      |  round(CAST(t.agree AS DOUBLE) / t.n, 6) AS po,
      |  round(CAST(coalesce(pe.pe_num, 0) AS DOUBLE)
      |    / CAST(t.n * t.n AS DOUBLE), 6) AS pe,
      |  CASE WHEN CAST(coalesce(pe.pe_num, 0) AS DOUBLE)
      |      / CAST(t.n * t.n AS DOUBLE) < 1.0
      |    THEN round((CAST(t.agree AS DOUBLE) / t.n
      |        - CAST(coalesce(pe.pe_num, 0) AS DOUBLE)
      |          / CAST(t.n * t.n AS DOUBLE))
      |      / (1.0 - CAST(coalesce(pe.pe_num, 0) AS DOUBLE)
      |          / CAST(t.n * t.n AS DOUBLE)), 6)
      |  END AS kappa
      |FROM tot t LEFT JOIN pe ON t.source = pe.source
      |ORDER BY t.source""".stripMargin

  // ── q175: two-hop neighborhoods ────────────────────────────────────────

  /** q175: friend-of-friend counts over the sorted-neighborhood CHAIN
    * graph (window 2, Levenshtein ≤ 220 — a union of path segments,
    * where strict two-hop neighborhoods are non-trivial; the LSH dedup
    * graph is all cliques, where they are empty by construction);
    * Σdeg² candidate volume, all equi-joins on the symmetrized edges. */
  def q175TwoHop(s: SparkSession, dir: String): DataFrame =
    Graph.twoHopCounts(
        TextDedup.sortedNeighborhoodPairs(Sources.documents(s, dir),
          "doc_id", "text", window = 2, maxDist = 220),
        "d1", "d2")
      .orderBy(col("doc_id"))

  val q175Sql: String =
    """WITH k AS (SELECT doc_id, text,
      |    substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 24)
      |      AS key
      |  FROM documents),
      |r AS (SELECT doc_id, text,
      |        row_number() OVER (ORDER BY key, doc_id) AS rn
      |      FROM k),
      |p AS (SELECT LEAST(a.doc_id, b.doc_id) AS d1,
      |        GREATEST(a.doc_id, b.doc_id) AS d2
      |      FROM r a JOIN r b ON b.rn = a.rn + 1
      |      WHERE levenshtein(a.text, b.text) <= 220),
      |e AS (SELECT d1 AS a, d2 AS b FROM p
      |      UNION SELECT d2 AS a, d1 AS b FROM p),
      |h2 AS (SELECT DISTINCT e1.a AS a, e2.b AS c
      |       FROM e e1 JOIN e e2 ON e1.b = e2.a
      |       WHERE e1.a <> e2.b),
      |fof AS (SELECT h.a, h.c FROM h2 h
      |        LEFT JOIN e ON h.a = e.a AND h.c = e.b
      |        WHERE e.a IS NULL)
      |SELECT a AS doc_id, count(*) AS n_two_hop
      |FROM fof GROUP BY a ORDER BY doc_id""".stripMargin

  // ── q179: average precision ────────────────────────────────────────────

  /** q179: per-lang average precision of the length ranking against
    * binary contains-'the' relevance — the PR-curve eval next to q148's
    * ROC AUC and q163's NDCG; one rank window, decimal P@k term sums. */
  def q179AvgPrecision(s: SparkSession, dir: String): DataFrame = {
    val d = Sources.documents(s, dir).select(col("lang"), col("doc_id"),
      col("n_chars"),
      when(size(filter(split(col("text"), " "),
        w => w === "the")) >= 1, 1L).otherwise(0L).as("rel"))
    Relevance.averagePrecision(d, "lang", "n_chars", "doc_id", "rel")
      .orderBy(col("lang"))
  }

  val q179Sql: String =
    """WITH d AS (SELECT lang, doc_id, n_chars,
      |    CASE WHEN len(list_filter(string_split(text, ' '),
      |      x -> x = 'the')) >= 1 THEN 1 ELSE 0 END AS rel
      |  FROM documents),
      |r AS (SELECT lang, rel,
      |        row_number() OVER w AS rn,
      |        CAST(SUM(rel) OVER (PARTITION BY lang
      |          ORDER BY n_chars DESC, doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |          AS BIGINT) AS cum
      |      FROM d
      |      WINDOW w AS (PARTITION BY lang ORDER BY n_chars DESC, doc_id)),
      |a AS (SELECT lang, count(*) AS n_items,
      |        CAST(SUM(rel) AS BIGINT) AS n_pos,
      |        SUM(CASE WHEN rel = 1 THEN
      |          CAST(round(CAST(cum AS DOUBLE) / CAST(rn AS DOUBLE), 6)
      |            AS DECIMAL(18,6)) END) AS apsum
      |      FROM r GROUP BY lang)
      |SELECT lang, n_items, n_pos,
      |  CASE WHEN n_pos > 0
      |    THEN round(CAST(apsum AS DOUBLE) / n_pos, 6) END
      |    AS avg_precision
      |FROM a ORDER BY lang""".stripMargin
  // ── q192: degree-oriented triangles on a skewed projection ─────────────

  /** q192: per-node triangle counts + clustering coefficients over the
    * item-transition graph of the events stream, with
    * `orientByDegree = true` (Cohen's re-orientation) — the gate entry
    * for the skew-bounded triangle path (previously spec-only). The
    * projection is DELIBERATELY Zipf-skewed: item = 100 div (k+1) over
    * the 0..99 props key folds half the key space onto item 1, so the
    * hub's fan-out is exactly what degree orientation exists to bound
    * (id orientation would give a low-id hub its degree² in 2-path
    * candidates; orientation caps out-degree at O(√m)). Edges are
    * consecutive-item transitions per user in (ts, event_id) order; the
    * oracle enumerates triangles with the PLAIN id orientation, so a
    * hash match re-proves orientation-invariance of the counts on real
    * data, not just the unit fixture. */
  def q192OrientedTriangles(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val item = call_function("div", lit(100L),
      regexp_extract(col("props"), "([0-9]+)", 1).cast(LongType) + 1L)
    val trans = Sources.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), item.as("item"))
      .withColumn("graft_prev", lag(col("item"), 1).over(w))
      .filter(col("graft_prev").isNotNull &&
        col("graft_prev") =!= col("item"))
      .select(least(col("graft_prev"), col("item")).as("u"),
        greatest(col("graft_prev"), col("item")).as("v"))
      .distinct()
    Graph.triangleCounts(trans, "u", "v", orientByDegree = true)
      .orderBy(col("node"))
  }

  val q192Sql: String =
    """WITH k AS (SELECT user_id, event_id,
      |    CAST(epoch_ns(ts) // 1000 AS BIGINT) AS tus,
      |    100 // (CAST(regexp_extract(props, '[0-9]+') AS BIGINT) + 1)
      |      AS item
      |  FROM events),
      |s AS (SELECT item,
      |        lag(item) OVER (PARTITION BY user_id
      |          ORDER BY tus, event_id) AS prev
      |      FROM k),
      |e AS (SELECT DISTINCT LEAST(prev, item) AS u,
      |        GREATEST(prev, item) AS v
      |      FROM s WHERE prev IS NOT NULL AND prev <> item),
      |deg AS (SELECT node, count(*) AS degree FROM
      |        (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      |        GROUP BY node),
      |tri AS (SELECT ab.u AS a, ab.v AS b, bc.v AS c
      |        FROM e ab JOIN e bc ON ab.v = bc.u
      |        JOIN e ac ON ac.u = ab.u AND ac.v = bc.v),
      |tpn AS (SELECT node, count(*) AS n_triangles FROM
      |        (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
      |         UNION ALL SELECT c FROM tri) GROUP BY node)
      |SELECT d.node, d.degree,
      |  COALESCE(t.n_triangles, 0) AS n_triangles,
      |  CASE WHEN d.degree >= 2 THEN
      |    round(2.0 * COALESCE(t.n_triangles, 0)
      |      / (d.degree * (d.degree - 1)), 6)
      |  END AS clustering_coeff
      |FROM deg d LEFT JOIN tpn t USING (node)
      |ORDER BY d.node""".stripMargin

  // ── q193: two-phase CC over long per-user event chains ─────────────────

  /** q193: connected components with `algorithm = "two-phase"` (Kiveris
    * et al. SoCC'14) over the consecutive-event chain graph — each
    * user's events, ordered by (ts, event_id), linked into a path. The
    * gate entry for the diameter-independent CC path (previously
    * spec-only): per-user chains run to ~90 events even at sf0.001, so
    * HashMin's default 25-round budget would THROW on this edge set
    * (diameter ≈ chain length), while the alternating large-star/
    * small-star rounds close it in O(log² n). The oracle is ground
    * truth BY CONSTRUCTION rather than a recursive CTE: a user's chain
    * is connected under any event ordering and chains of distinct
    * users are disjoint (an event belongs to exactly one user), so
    * component(node) = min event_id over the node's user — exact, and
    * O(n) to compute. */
  def q193ChainComponents(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val edges = Sources.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("graft_prev", lag(col("event_id"), 1).over(w))
      .filter(col("graft_prev").isNotNull)
      .select(col("graft_prev").as("src"), col("event_id").as("dst"))
    Graph.connectedComponents(edges, "src", "dst",
        algorithm = "two-phase")
      .orderBy(col("node"))
  }

  val q193Sql: String =
    """WITH c AS (SELECT user_id, count(*) AS n FROM events
      |           GROUP BY user_id),
      |lbl AS (SELECT e.event_id AS node,
      |          MIN(e.event_id) OVER (PARTITION BY e.user_id) AS component
      |        FROM events e JOIN c ON e.user_id = c.user_id
      |        WHERE c.n >= 2)
      |SELECT node, component FROM lbl ORDER BY node""".stripMargin

}
