package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Chunking, Classify, Graph, Relevance, Similarity, TextAnalysis, TextDedup}
import graft.sources.Sources

/**
 * Round-10 continuation queries (q277+): Kneser–Ney LM scoring, weighted
 * (multiset) Jaccard near-dup ranking, corpus distinct-n diversity, and
 * χ² term keyness. Each query gates a [[graft.operators]] component
 * against an independent DuckDB derivation on the exact-integer surface
 * (the libm-free discipline of the q200 round-9 fix).
 */
object FrontierQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Sources.documents(s, dir)

  // ── q277: interpolated Kneser–Ney bigram LM score ──────────────────────

  /** q277: per-document interpolated Kneser–Ney bigram score
    * ([[Relevance.kneserNeyScore]], D = 3/4) — the Chen & Goodman 1999
    * best-in-class smoothing with continuation-count backoff; the whole
    * hashed surface is exact integers (counts + ⌊10⁶·p⌋ sums), no libm. */
  def q277KneserNey(s: SparkSession, dir: String): DataFrame =
    Relevance.kneserNeyScore(docs(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val q277Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |pr AS (SELECT doc_id, unnest(list_transform(range(1, len(w)), j ->
      |         {'x': w[j], 'y': w[j+1]})) AS u
      |       FROM ws WHERE len(w) >= 2),
      |p AS (SELECT doc_id, u.x AS x, u.y AS y FROM pr),
      |cxy AS (SELECT x, y, COUNT(*) AS c_xy FROM p GROUP BY 1, 2),
      |bx AS (SELECT x, SUM(c_xy) AS ctx, COUNT(*) AS n1x FROM cxy GROUP BY 1),
      |byy AS (SELECT y, COUNT(*) AS n1y FROM cxy GROUP BY 1),
      |bt AS (SELECT COUNT(*) AS b FROM cxy),
      |tm AS (SELECT p.doc_id, c.c_xy, bx.ctx, bx.n1x, byy.n1y,
      |    (1000000::HUGEINT *
      |      ((4::HUGEINT * c.c_xy::HUGEINT - 3::HUGEINT) * bt.b::HUGEINT +
      |       3::HUGEINT * bx.n1x::HUGEINT * byy.n1y::HUGEINT)) //
      |    (4::HUGEINT * bx.ctx::HUGEINT * bt.b::HUGEINT) AS pq6
      |  FROM p JOIN cxy c USING (x, y)
      |  JOIN bx ON bx.x = p.x
      |  JOIN byy ON byy.y = p.y
      |  CROSS JOIN bt)
      |SELECT doc_id, COUNT(*) AS n_scored,
      |  CAST(SUM(c_xy) AS BIGINT) AS sum_cxy,
      |  CAST(SUM(ctx) AS BIGINT) AS sum_ctx,
      |  CAST(SUM(n1x) AS BIGINT) AS sum_n1x,
      |  CAST(SUM(n1y) AS BIGINT) AS sum_n1y,
      |  CAST(SUM(pq6) AS BIGINT) AS sum_pq6
      |FROM tm GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ── q278: tf-weighted (multiset) Jaccard over LSH candidates ───────────

  /** q278: exact tf-weighted Jaccard on the q19-parameter LSH candidate
    * pairs ([[TextDedup.weightedJaccardPairs]], k=16, r=4, w=3) — the
    * bag-semantics resemblance that separates templated documents set
    * Jaccard conflates. No ppm threshold applied (minPpm = 0): every
    * banded candidate sharing ≥ 1 shingle type is emitted; surface is
    * exact integers (w_inter, w_union, ⌊10⁶·J_w⌋). */
  def q278WeightedJaccard(s: SparkSession, dir: String): DataFrame =
    TextDedup.weightedJaccardPairs(docs(s, dir), "doc_id", "text",
        k = 16, r = 4, w = 3, minPpm = 0L)
      .orderBy(col("d1"), col("d2"))

  // same signature/banding chain as q19Sql, but scored on shingle BAGS
  val q278Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |shb AS (SELECT doc_id, s, COUNT(*) AS tf FROM (
      |          SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
      |            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      |          FROM ws WHERE len(w) >= 3)
      |        GROUP BY doc_id, s),
      |sh AS (SELECT doc_id, s FROM shb),
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
      |sz AS (SELECT doc_id, SUM(tf) AS n FROM shb GROUP BY doc_id),
      |mins AS (SELECT c.d1, c.d2, SUM(LEAST(a.tf, b.tf)) AS w_inter
      |         FROM cand c
      |         JOIN shb a ON a.doc_id = c.d1
      |         JOIN shb b ON b.doc_id = c.d2 AND b.s = a.s
      |         GROUP BY c.d1, c.d2)
      |SELECT m.d1, m.d2, CAST(m.w_inter AS BIGINT) AS w_inter,
      |  CAST(s1.n + s2.n - m.w_inter AS BIGINT) AS w_union,
      |  CAST((1000000::HUGEINT * m.w_inter::HUGEINT) //
      |    (s1.n + s2.n - m.w_inter)::HUGEINT AS BIGINT) AS wj_ppm
      |FROM mins m JOIN sz s1 ON m.d1 = s1.doc_id
      |JOIN sz s2 ON m.d2 = s2.doc_id
      |ORDER BY d1, d2""".stripMargin

  // ── q279: distinct-n corpus diversity per language ─────────────────────

  /** q279: distinct-1/2/3 n-gram diversity per language
    * ([[TextAnalysis.distinctNgramDiversity]], Li et al. 2016) — the
    * cross-document templating signal; exact type/slot counts + ppm. */
  def q279DistinctNgrams(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.distinctNgramDiversity(docs(s, dir), "text", "lang",
        maxN = 3)
      .orderBy(col("lang"))

  val q279Sql: String =
    """WITH ws AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
      |g1 AS (SELECT lang, unnest(w) AS g FROM ws WHERE len(w) >= 1),
      |g2 AS (SELECT lang, unnest(list_transform(range(1, len(w)), i ->
      |         w[i] || ' ' || w[i+1])) AS g
      |       FROM ws WHERE len(w) >= 2),
      |g3 AS (SELECT lang, unnest(list_transform(range(1, len(w) - 1), i ->
      |         w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
      |       FROM ws WHERE len(w) >= 3),
      |a1 AS (SELECT lang, COUNT(DISTINCT g) AS d, COUNT(*) AS t
      |       FROM g1 GROUP BY 1),
      |a2 AS (SELECT lang, COUNT(DISTINCT g) AS d, COUNT(*) AS t
      |       FROM g2 GROUP BY 1),
      |a3 AS (SELECT lang, COUNT(DISTINCT g) AS d, COUNT(*) AS t
      |       FROM g3 GROUP BY 1)
      |SELECT a1.lang,
      |  a1.d AS distinct1, a1.t AS total1,
      |  CAST((1000000::HUGEINT * a1.d::HUGEINT) // a1.t::HUGEINT AS BIGINT)
      |    AS distinct1_ppm,
      |  a2.d AS distinct2, a2.t AS total2,
      |  CAST((1000000::HUGEINT * a2.d::HUGEINT) // a2.t::HUGEINT AS BIGINT)
      |    AS distinct2_ppm,
      |  a3.d AS distinct3, a3.t AS total3,
      |  CAST((1000000::HUGEINT * a3.d::HUGEINT) // a3.t::HUGEINT AS BIGINT)
      |    AS distinct3_ppm
      |FROM a1 JOIN a2 USING (lang) JOIN a3 USING (lang)
      |ORDER BY lang""".stripMargin

  // ── q280: χ² term keyness (focus = English) ────────────────────────────

  /** q280: top-50 keywords of lang='en' vs rest by exact-rational χ²
    * ([[TextAnalysis.termKeyness]], Kilgarriff 2001) — over-represented
    * terms only, ranked on the integer-quantized ⌊10³·χ²⌋. */
  def q280TermKeyness(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.termKeyness(docs(s, dir), "text", "lang", focus = "en",
        k = 50)

  val q280Sql: String =
    """WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS term
      |           FROM documents),
      |c AS (SELECT term,
      |        SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS a,
      |        SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS b
      |      FROM t GROUP BY 1),
      |tot AS (SELECT SUM(a) AS na, SUM(b) AS nb FROM c),
      |k AS (SELECT term, a, b, tot.na, tot.nb,
      |        (tot.na - a) AS cc, (tot.nb - b) AS dd,
      |        a::HUGEINT * (tot.nb - b)::HUGEINT -
      |          b::HUGEINT * (tot.na - a)::HUGEINT AS crs
      |      FROM c CROSS JOIN tot)
      |SELECT term, CAST(a AS BIGINT) AS tf_focus, CAST(b AS BIGINT) AS tf_rest,
      |  CAST((1000::HUGEINT * (na + nb)::HUGEINT * crs * crs) //
      |    ((a + b)::HUGEINT * (cc + dd)::HUGEINT * na::HUGEINT * nb::HUGEINT)
      |    AS BIGINT) AS chi2_milli
      |FROM k WHERE crs > 0
      |ORDER BY chi2_milli DESC, term LIMIT 50""".stripMargin

  // ── q281: soft-dedup cluster down-weighting ────────────────────────────

  /** q281: per-document soft-dedup weights
    * ([[TextDedup.softDedupWeights]], SoftDeDup reweight-don't-remove):
    * LSH near-dup clusters (q19 parameters) → connected components →
    * weight_ppm = ⌊10⁶/|cluster|⌋; singletons weigh 1. */
  def q281SoftDedup(s: SparkSession, dir: String): DataFrame =
    TextDedup.softDedupWeights(docs(s, dir), "doc_id", "text",
        k = 16, r = 4, w = 3, threshold = 0.5)
      .orderBy(col("doc_id"))

  // wraps the canonical LSH chain (q19Sql) + the recursive-reachability
  // CC pattern (q275 precedent)
  val q281Sql: String =
    s"""WITH RECURSIVE pairs AS (SELECT d1, d2 FROM (
      |${PipelineQueries.q19Sql}
      |  )),
      |e AS (SELECT d1 AS a, d2 AS b FROM pairs
      |      UNION SELECT d2, d1 FROM pairs),
      |reach(n, m) AS (
      |  SELECT DISTINCT a AS n, a AS m FROM e
      |  UNION
      |  SELECT r.n, e.b FROM reach r JOIN e ON r.m = e.a),
      |comp AS (SELECT n, MIN(m) AS c FROM reach GROUP BY n),
      |cs AS (SELECT c, COUNT(*) AS sz FROM comp GROUP BY c)
      |SELECT d.doc_id,
      |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words,
      |  CAST(COALESCE(cs.sz, 1) AS BIGINT) AS cluster_size,
      |  CAST(1000000 // COALESCE(cs.sz, 1) AS BIGINT) AS weight_ppm
      |FROM documents d
      |LEFT JOIN comp ON comp.n = d.doc_id
      |LEFT JOIN cs ON cs.c = comp.c
      |ORDER BY d.doc_id""".stripMargin

  // ── q282: label-propagation communities ────────────────────────────────

  /** q282: synchronous deterministic label propagation
    * ([[Graph.labelPropagation]], Raghavan 2007, R = 3, plurality label
    * with min-label tie-break) on the exact-Jaccard ≥ 0.1 dedup graph —
    * the community structure INSIDE connected components. */
  def q282LabelProp(s: SparkSession, dir: String): DataFrame = {
    val edges = TextDedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text",
      w = 3, threshold = 0.1)
    Graph.labelPropagation(edges, "d1", "d2", rounds = 3)
      .orderBy(col("node"))
  }

  // three unrolled synchronous rounds, plurality + min-label ties
  val q282Sql: String = {
    def round(i: Int): String =
      s"""n$i AS (SELECT e.a AS node, l.lbl, COUNT(*) AS c
         |       FROM e JOIN l${i - 1} l ON l.node = e.b GROUP BY 1, 2),
         |l$i AS (SELECT node, lbl FROM (
         |         SELECT node, lbl, row_number() OVER (
         |           PARTITION BY node ORDER BY c DESC, lbl ASC) AS rn
         |         FROM n$i) WHERE rn = 1)""".stripMargin
    s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(1, len(w) - 1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      |       FROM ws WHERE len(w) >= 3),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |p AS (SELECT i.d1, i.d2
      |      FROM inter i JOIN sz s1 ON i.d1 = s1.doc_id
      |                   JOIN sz s2 ON i.d2 = s2.doc_id
      |      WHERE CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter) >= 0.1),
      |e AS (SELECT d1 AS a, d2 AS b FROM p UNION SELECT d2, d1 FROM p),
      |l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM e),
      |${(1 to 3).map(round).mkString(",\n")}
      |SELECT node, lbl AS label FROM l3 ORDER BY node""".stripMargin
  }

  // ── q283: inverse-Cloze-Task pair generation ───────────────────────────

  /** q283: deterministic ICT pseudo-query/context pairs
    * ([[Chunking.ictPairs]], Lee et al. 2019, q = 8 words, md5-derived
    * span start) — billions of retrieval training pairs from a raw
    * corpus, zero shuffle. */
  def q283IctPairs(s: SparkSession, dir: String): DataFrame =
    Chunking.ictPairs(docs(s, dir), "doc_id", "text", queryWords = 8,
        salt = "ict")
      .orderBy(col("doc_id"))

  val q283Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |f AS (SELECT doc_id, w, len(w) AS n FROM ws WHERE len(w) >= 9),
      |h AS (SELECT doc_id, w, n,
      |        CAST(list_sum(list_transform(range(1, 9), j ->
      |          (strpos('0123456789abcdef',
      |             substr(md5('ict_' || doc_id), j, 1)) - 1)
      |            * (1::BIGINT << (4 * (8 - j))))) AS BIGINT) % (n - 7) AS qs
      |      FROM f)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_words,
      |  CAST(qs AS BIGINT) AS q_start,
      |  array_to_string(w[qs + 1 : qs + 8], ' ') AS query_text,
      |  array_to_string(list_concat(w[1 : qs], w[qs + 9 : n]), ' ')
      |    AS context_text
      |FROM h ORDER BY doc_id""".stripMargin

  // ── q284: Dirichlet query-likelihood retrieval ─────────────────────────

  /** q284: top-15 documents for the 3-term query under Dirichlet-
    * smoothed query likelihood ([[Relevance.dirichletQueryLikelihood]],
    * Zhai & Lafferty 2001, μ = 2000) — same query as q154's boolean
    * retrieval, ranked on the exact-rational quantized smoothed mass. */
  def q284DirichletQl(s: SparkSession, dir: String): DataFrame =
    Relevance.dirichletQueryLikelihood(docs(s, dir), "doc_id", "text",
        Seq("batch", "scan", "data"), mu = 2000L, k = 15)

  /** Parameterized Dirichlet-QL oracle chain — shared by q284 and the
    * q288 ranking-agreement wrapper so the scoring SQL cannot drift. */
  private def dirichletSql(terms: Seq[String], mu: Long,
                           limit: Int): String = {
    val tv = terms.map(t => s"('$t')").mkString(", ")
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |dl AS (SELECT doc_id, len(w) AS dl FROM w),
      |t AS (SELECT doc_id, unnest(w) AS term FROM w),
      |n AS (SELECT COUNT(*) AS n FROM t),
      |qt AS (SELECT * FROM (VALUES $tv) AS v(term)),
      |cf AS (SELECT term, COUNT(*) AS cf FROM t
      |       WHERE term IN (SELECT term FROM qt) GROUP BY 1),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t
      |       WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
      |cand AS (SELECT DISTINCT doc_id FROM tf),
      |grid AS (SELECT c.doc_id, q.term, COALESCE(tf.tf, 0) AS tf,
      |           COALESCE(cf.cf, 0) AS cf, dl.dl
      |         FROM cand c CROSS JOIN qt q
      |         LEFT JOIN tf ON tf.doc_id = c.doc_id AND tf.term = q.term
      |         LEFT JOIN cf ON cf.term = q.term
      |         JOIN dl ON dl.doc_id = c.doc_id),
      |sc AS (SELECT g.doc_id, g.dl,
      |         SUM(CASE WHEN g.tf > 0 THEN 1 ELSE 0 END) AS n_hit_terms,
      |         SUM((1000000::HUGEINT *
      |           (g.tf::HUGEINT * n.n::HUGEINT +
      |            $mu::HUGEINT * g.cf::HUGEINT)) //
      |           (n.n::HUGEINT * (g.dl + $mu)::HUGEINT)) AS score_q6
      |       FROM grid g CROSS JOIN n GROUP BY 1, 2)
      |SELECT doc_id, CAST(dl AS BIGINT) AS dl,
      |  CAST(n_hit_terms AS BIGINT) AS n_hit_terms,
      |  CAST(score_q6 AS BIGINT) AS score_q6
      |FROM sc ORDER BY score_q6 DESC, doc_id LIMIT $limit""".stripMargin
  }

  val q284Sql: String = dirichletSql(Seq("batch", "scan", "data"), 2000L, 15)

  // ── q285: LSH blocking-quality audit (PC / RR) ─────────────────────────

  /** q285: pairs completeness and reduction ratio of the q19 LSH
    * blocking vs the exact Jaccard ≥ 0.5 ground truth
    * ([[TextDedup.blockingQualityAudit]], Christen 2012) — one exact-
    * integer summary row quantifying the banding trade-off. */
  def q285BlockingQuality(s: SparkSession, dir: String): DataFrame =
    TextDedup.blockingQualityAudit(docs(s, dir), "doc_id", "text",
        k = 16, r = 4, w = 3, threshold = 0.5)

  val q285Sql: String =
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
      |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |truth AS (SELECT i.d1, i.d2
      |          FROM inter i JOIN sz s1 ON i.d1 = s1.doc_id
      |                       JOIN sz s2 ON i.d2 = s2.doc_id
      |          WHERE CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter)
      |            >= 0.5),
      |nd AS (SELECT COUNT(*) AS n_docs FROM sz),
      |nc AS (SELECT COUNT(*) AS n_candidates FROM cand),
      |nt AS (SELECT COUNT(*) AS n_true_pairs FROM truth),
      |nf AS (SELECT COUNT(*) AS n_found FROM truth t
      |       JOIN cand c ON t.d1 = c.d1 AND t.d2 = c.d2)
      |SELECT CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(n_candidates AS BIGINT) AS n_candidates,
      |  CAST(n_true_pairs AS BIGINT) AS n_true_pairs,
      |  CAST(n_found AS BIGINT) AS n_found,
      |  CAST(n_docs * (n_docs - 1) // 2 AS BIGINT) AS total_pairs,
      |  CAST(CASE WHEN n_true_pairs = 0 THEN NULL
      |    ELSE (n_found::HUGEINT * 1000000) // n_true_pairs::HUGEINT
      |    END AS BIGINT) AS pc_ppm,
      |  CAST(((n_docs * (n_docs - 1) // 2 - n_candidates)::HUGEINT
      |    * 1000000) // (n_docs * (n_docs - 1) // 2)::HUGEINT AS BIGINT)
      |    AS rr_ppm
      |FROM nd CROSS JOIN nc CROSS JOIN nt CROSS JOIN nf""".stripMargin

  // ── q286: term dispersion (Gries DP) ───────────────────────────────────

  /** q286: Gries' deviation-of-proportions dispersion across sources for
    * the top-20 corpus terms ([[TextAnalysis.termDispersion]]) — the
    * spread-vs-concentration companion to raw frequency, exact-rational
    * with absent-stratum mass folded in analytically. */
  def q286TermDispersion(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.termDispersion(docs(s, dir), "text", "source", k = 20)

  val q286Sql: String =
    """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS term
      |           FROM documents),
      |sz AS (SELECT source, COUNT(*) AS sz FROM t GROUP BY 1),
      |n AS (SELECT SUM(sz) AS n FROM sz),
      |ts AS (SELECT term, source, COUNT(*) AS tfi FROM t GROUP BY 1, 2),
      |top AS (SELECT term, SUM(tfi) AS tf FROM ts GROUP BY 1
      |        ORDER BY tf DESC, term LIMIT 20),
      |j AS (SELECT ts.term, top.tf, ts.tfi, sz.sz
      |      FROM ts JOIN top USING (term) JOIN sz USING (source)),
      |agg AS (SELECT term, any_value(tf) AS tf,
      |          SUM(ABS(tfi::HUGEINT * n.n::HUGEINT -
      |            tf::HUGEINT * sz::HUGEINT)) AS pres,
      |          SUM(sz) AS cov
      |        FROM j CROSS JOIN n GROUP BY term)
      |SELECT term, CAST(tf AS BIGINT) AS tf,
      |  CAST((1000::HUGEINT * (pres + tf::HUGEINT * (n.n - cov)::HUGEINT))
      |    // (2::HUGEINT * tf::HUGEINT * n.n::HUGEINT) AS BIGINT)
      |    AS dp_milli
      |FROM agg CROSS JOIN n ORDER BY tf DESC, term""".stripMargin

  // ── q287: k-truss peel on the dedup graph ──────────────────────────────

  /** q287: 3-truss edges of the exact-Jaccard ≥ 0.1 dedup graph after 3
    * peel rounds ([[Graph.trussPeel]], Cohen 2008) — edges embedded in
    * ≥ 1 triangle of the surviving subgraph; the edge-level cohesion
    * test that strips bridge edges [[Graph.kCorePeel]] keeps. */
  def q287TrussPeel(s: SparkSession, dir: String): DataFrame = {
    val edges = TextDedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text",
      w = 3, threshold = 0.1)
    Graph.trussPeel(edges, "d1", "d2", k = 3, rounds = 3)
      .orderBy(col("a"), col("b"))
  }

  val q287Sql: String = {
    def round(i: Int): String =
      s"""sym$i AS (SELECT a, b FROM e${i - 1}
         |        UNION SELECT b, a FROM e${i - 1}),
         |sup$i AS (SELECT e.a, e.b, COUNT(*) AS support
         |         FROM e${i - 1} e
         |         JOIN sym$i x ON x.a = e.a
         |         JOIN sym$i y ON y.a = e.b AND y.b = x.b
         |         GROUP BY 1, 2),
         |s$i AS (SELECT e.a, e.b, COALESCE(p.support, 0) AS support
         |       FROM e${i - 1} e LEFT JOIN sup$i p
         |         ON p.a = e.a AND p.b = e.b),
         |e$i AS (SELECT a, b FROM s$i WHERE support >= 1)""".stripMargin
    s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(1, len(w) - 1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      |       FROM ws WHERE len(w) >= 3),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |p AS (SELECT i.d1, i.d2
      |      FROM inter i JOIN sz s1 ON i.d1 = s1.doc_id
      |                   JOIN sz s2 ON i.d2 = s2.doc_id
      |      WHERE CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter) >= 0.1),
      |e0 AS (SELECT LEAST(d1, d2) AS a, GREATEST(d1, d2) AS b FROM p
      |       GROUP BY 1, 2),
      |${(1 to 3).map(round).mkString(",\n")}
      |SELECT a, b, CAST(support AS BIGINT) AS support
      |FROM s3 WHERE support >= 1 ORDER BY a, b""".stripMargin
  }

  // ── q288: rank-biased overlap between BM25 and Dirichlet QL ────────────

  /** q288: RBO (p = 1/2, depth 20) between the BM25 and Dirichlet-QL
    * top-20 rankings for the same 3-term query
    * ([[Relevance.rankBiasedOverlap]], Webber 2010) — the top-weighted
    * agreement audit run before swapping retrieval scorers. */
  def q288RboAgreement(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
    val terms = Seq("vector", "join", "spark")
    // windows order 20-row top-k lists — bounded, not a data-scale sort
    val ra = Relevance.bm25TopK(d, "doc_id", "text", terms, k = 20,
        k1 = 1.5, b = 0.75)
      .select(col("doc_id"), row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id").asc)).as("rnk"))
    val rb = Relevance.dirichletQueryLikelihood(d, "doc_id", "text", terms,
        mu = 2000L, k = 20)
      .select(col("doc_id"), row_number().over(
        Window.orderBy(col("score_q6").desc, col("doc_id").asc)).as("rnk"))
    Relevance.rankBiasedOverlap(ra, rb, "doc_id", "rnk", depth = 20)
      .orderBy(col("d"))
  }

  // BM25 side mirrors q68Sql's scoring (k1 = 1.5, b = 0.75); Dirichlet
  // side wraps the shared dirichletSql chain
  val q288Sql: String =
    s"""WITH bmtop AS (SELECT doc_id, bm25 FROM (
      |  WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |  dl AS (SELECT doc_id, len(w) AS dl FROM w),
      |  t AS (SELECT doc_id, unnest(w) AS term FROM w),
      |  tf AS (SELECT doc_id, term, count(*) AS tf FROM t
      |         WHERE term IN ('vector', 'join', 'spark') GROUP BY 1, 2),
      |  dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |  corpus AS (SELECT count(*) AS n_docs,
      |               CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
      |  sc AS (SELECT tf.doc_id,
      |      CAST(round(
      |        ln(1.0 + CAST(c.n_docs - d.df + 0.5 AS DOUBLE)
      |                   / CAST(d.df + 0.5 AS DOUBLE))
      |        * (CAST(tf.tf AS DOUBLE) * 2.5)
      |        / (CAST(tf.tf AS DOUBLE)
      |           + 1.5 * (0.25 + 0.75 * l.dl / c.avgdl)), 6)
      |        AS DECIMAL(18,6)) AS contrib
      |    FROM tf JOIN dfc d USING (term) JOIN dl l USING (doc_id)
      |    CROSS JOIN corpus c)
      |  SELECT doc_id, CAST(SUM(contrib) AS DOUBLE) AS bm25
      |  FROM sc GROUP BY doc_id
      |  ORDER BY bm25 DESC, doc_id LIMIT 20)),
      |ra AS (SELECT doc_id, row_number() OVER (
      |         ORDER BY bm25 DESC, doc_id) AS rnk FROM bmtop),
      |dqtop AS (SELECT doc_id, score_q6 FROM (
      |${dirichletSql(Seq("vector", "join", "spark"), 2000L, 20)}
      |  )),
      |rb AS (SELECT doc_id, row_number() OVER (
      |         ORDER BY score_q6 DESC, doc_id) AS rnk FROM dqtop),
      |dd AS (SELECT unnest(range(1, 21)) AS d),
      |ov AS (SELECT dd.d, COUNT(*) AS overlap
      |       FROM ra JOIN rb USING (doc_id) CROSS JOIN dd
      |       WHERE ra.rnk <= dd.d AND rb.rnk <= dd.d GROUP BY dd.d),
      |per AS (SELECT dd.d, COALESCE(ov.overlap, 0) AS overlap
      |        FROM dd LEFT JOIN ov USING (d))
      |SELECT CAST(d AS BIGINT) AS d, CAST(overlap AS BIGINT) AS overlap,
      |  CAST((overlap * 1000000000) //
      |    (d * (1::BIGINT << d)) AS BIGINT) AS term_q9,
      |  CAST(SUM((overlap * 1000000000) // (d * (1::BIGINT << d)))
      |    OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rbo_q9
      |FROM per ORDER BY d""".stripMargin

  // ── q289: DBSCAN density clustering on embeddings ──────────────────────

  /** q289: DBSCAN over the embedding corpus
    * ([[Similarity.dbscanClusters]], Ester 1996; ε = cosine ≥ 0.375,
    * minPts = 3) — core/border/noise roles and min-id cluster labels,
    * all deterministic. */
  def q289Dbscan(s: SparkSession, dir: String): DataFrame =
    Similarity.dbscanClusters(Sources.embeddings(s, dir), "vec_id",
        "embedding", tau = 0.375, minPts = 3)
      .orderBy(col("vec_id"))

  // nv hoists each vector's L2 norm ONCE (MATERIALIZED): the inline form
  // re-summed both norms per PAIR — 3 list-lambda folds × n²/2 pairs was
  // ~830 s/statement at sf0.1, which made q289 the perturbation audit's
  // 2400 s budget-override row for three rounds. sqrt-then-multiply-then-
  // divide runs in the identical order on identical doubles, so the
  // hashed surface is bit-unchanged (verified old-vs-new equal at
  // sf0.01, and this rewrite cuts the statement to ~3.5 s at sf0.1).
  val q289Sql: String =
    """WITH RECURSIVE nv AS MATERIALIZED (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
      |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm
      |  FROM embeddings),
      |cs AS MATERIALIZED (
      |  SELECT a.vec_id AS d1, b.vec_id AS d2
      |  FROM nv a JOIN nv b ON a.vec_id < b.vec_id
      |  WHERE round(
      |    list_sum(list_transform(range(1, len(a.embedding) + 1),
      |      i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
      |    (a.nrm * b.nrm), 6)
      |    >= 0.375),
      |sym AS MATERIALIZED (SELECT d1 AS a, d2 AS b FROM cs
      |        UNION ALL SELECT d2, d1 FROM cs),
      |deg AS (SELECT a, COUNT(*) AS c FROM sym GROUP BY 1),
      |core AS (SELECT a AS node FROM deg WHERE c >= 3),
      |ce AS (SELECT d1, d2 FROM cs
      |       WHERE d1 IN (SELECT node FROM core)
      |         AND d2 IN (SELECT node FROM core)),
      |e AS MATERIALIZED (SELECT d1 AS a, d2 AS b FROM ce
      |                   UNION SELECT d2, d1 FROM ce),
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

  // md5-word helper: DuckDB replica of Sketches.hash32
  private def hash32Sql(arg: String): String =
    s"""CAST(list_sum(list_transform(range(1, 9), j ->
       |  (strpos('0123456789abcdef', substr(md5($arg), j, 1)) - 1)
       |    * (1::BIGINT << (4 * (8 - j))))) AS BIGINT)""".stripMargin

  // ── q290: fill-in-the-middle split planning ────────────────────────────

  /** q290: FIM (prefix, middle, suffix) split plan for every document
    * ([[Chunking.fimSplitPlan]], Bavarian 2022) — md5-derived uniform
    * cut points, PSM/SPM mode bit, and an md5 fingerprint pinning the
    * exact split content. */
  def q290FimPlan(s: SparkSession, dir: String): DataFrame =
    Chunking.fimSplitPlan(docs(s, dir), "doc_id", "text", salt = "fim")
      .orderBy(col("doc_id"))

  val q290Sql: String =
    s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |f AS (SELECT doc_id, w, len(w) AS n FROM ws),
      |h AS (SELECT doc_id, w, n,
      |        ${hash32Sql("'fim_a_' || doc_id")} % (n + 1) AS h1,
      |        ${hash32Sql("'fim_b_' || doc_id")} % (n + 1) AS h2,
      |        ${hash32Sql("'fim_m_' || doc_id")} % 2 AS hm
      |      FROM f),
      |c AS (SELECT doc_id, w, n, LEAST(h1, h2) AS cut1,
      |        GREATEST(h1, h2) AS cut2,
      |        CASE WHEN hm = 0 THEN 'psm' ELSE 'spm' END AS mode
      |      FROM h)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_words,
      |  CAST(cut1 AS BIGINT) AS cut1, CAST(cut2 AS BIGINT) AS cut2, mode,
      |  CAST(cut1 AS BIGINT) AS prefix_len,
      |  CAST(cut2 - cut1 AS BIGINT) AS middle_len,
      |  CAST(n - cut2 AS BIGINT) AS suffix_len,
      |  md5(COALESCE(array_to_string(w[1 : cut1], ' '), '') || '|' ||
      |      COALESCE(array_to_string(w[cut1 + 1 : cut2], ' '), '') || '|' ||
      |      COALESCE(array_to_string(w[cut2 + 1 : n], ' '), ''))
      |    AS parts_md5
      |FROM c ORDER BY doc_id""".stripMargin

  // ── q291: term burstiness (variance-to-mean ratio) ─────────────────────

  /** q291: Fano-factor burstiness of the top-30 corpus terms
    * ([[TextAnalysis.termBurstiness]], Church & Gale 1995) — exact
    * integer VMR from per-document count sufficient statistics. */
  def q291Burstiness(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.termBurstiness(docs(s, dir), "doc_id", "text", k = 30)

  val q291Sql: String =
    """WITH x AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |           FROM documents),
      |pc AS (SELECT doc_id, term, COUNT(*) AS x FROM x GROUP BY 1, 2),
      |nd AS (SELECT COUNT(*) AS nd FROM documents),
      |st AS (SELECT term, SUM(x) AS tf, SUM(x * x) AS sx2,
      |         COUNT(*) AS n_docs_with
      |       FROM pc GROUP BY 1)
      |SELECT term, CAST(tf AS BIGINT) AS tf,
      |  CAST(n_docs_with AS BIGINT) AS n_docs_with,
      |  CAST((1000::HUGEINT * (nd.nd::HUGEINT * sx2::HUGEINT -
      |    tf::HUGEINT * tf::HUGEINT)) //
      |    (nd.nd::HUGEINT * tf::HUGEINT) AS BIGINT) AS vmr_milli
      |FROM st CROSS JOIN nd
      |ORDER BY tf DESC, term LIMIT 30""".stripMargin

  // ── q292: Burrows' Delta stylometric distance ──────────────────────────

  /** q292: pairwise Burrows' Delta between sources over the top-20
    * corpus words ([[TextAnalysis.burrowsDelta]], Burrows 2002) —
    * z-scored frequency profiles in exact micro-integer units; the
    * register-similarity matrix behind source-mixing decisions. */
  def q292BurrowsDelta(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.burrowsDelta(docs(s, dir), "text", "source", m = 20)
      .orderBy(col("src_a"), col("src_b"))

  val q292Sql: String =
    """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS term
      |           FROM documents),
      |sz AS (SELECT source, COUNT(*) AS sz FROM t GROUP BY 1),
      |ts AS (SELECT term, source, COUNT(*) AS tf FROM t GROUP BY 1, 2),
      |top AS (SELECT term FROM (
      |          SELECT term, SUM(tf) AS tt FROM ts GROUP BY 1
      |          ORDER BY tt DESC, term LIMIT 20)),
      |grid AS (SELECT top.term, sz.source, sz.sz, COALESCE(ts.tf, 0) AS tf
      |         FROM sz CROSS JOIN top
      |         LEFT JOIN ts ON ts.term = top.term AND ts.source = sz.source),
      |g2 AS (SELECT term, source,
      |         (tf::HUGEINT * 1000000000) // sz::HUGEINT AS f FROM grid),
      |st AS (SELECT term, COUNT(*) AS s, SUM(f) AS sf,
      |         SUM(f::HUGEINT * f::HUGEINT) AS sf2
      |       FROM g2 GROUP BY 1),
      |v AS (SELECT term, s, sf,
      |        s::HUGEINT * sf2::HUGEINT - sf::HUGEINT * sf::HUGEINT AS var
      |      FROM st),
      |v0 AS (SELECT *, CASE WHEN var > 0
      |         THEN floor(sqrt(var::DOUBLE))::HUGEINT ELSE 0::HUGEINT
      |         END AS r0 FROM v),
      |iq AS (SELECT term, s, sf, var, CASE WHEN var > 0 THEN greatest(
      |         CASE WHEN r0 >= 2 AND (r0-2)*(r0-2) <= var
      |           THEN r0-2 ELSE 0 END,
      |         CASE WHEN r0 >= 1 AND (r0-1)*(r0-1) <= var
      |           THEN r0-1 ELSE 0 END,
      |         CASE WHEN r0*r0 <= var THEN r0 ELSE 0 END,
      |         CASE WHEN (r0+1)*(r0+1) <= var THEN r0+1 ELSE 0 END,
      |         CASE WHEN (r0+2)*(r0+2) <= var THEN r0+2 ELSE 0 END)
      |       ELSE 0::HUGEINT END AS isq FROM v0),
      |z AS (SELECT g.term, g.source,
      |        CASE WHEN i.var <= 0 THEN 0::HUGEINT
      |          ELSE (CASE WHEN g.f * i.s - i.sf < 0 THEN -1
      |                ELSE 1 END)::HUGEINT *
      |            ((1000000::HUGEINT * abs((g.f * i.s - i.sf)::HUGEINT))
      |              // i.isq)
      |        END AS zu
      |      FROM g2 g JOIN iq i USING (term))
      |SELECT a.source AS src_a, b.source AS src_b,
      |  CAST(SUM(ABS(a.zu - b.zu)) // 20000 AS BIGINT) AS delta_milli
      |FROM z a JOIN z b ON a.term = b.term AND a.source < b.source
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ── q293: content-defined chunking ─────────────────────────────────────

  /** q293: LBFS-style content-defined chunks for every document
    * ([[Chunking.contentDefinedChunks]], Muthitacharoen 2001; 2-word
    * window hash, mask 2⁴) — shift-resistant chunk boundaries with
    * per-chunk fingerprints for storage-dedup accounting. */
  def q293CdcChunks(s: SparkSession, dir: String): DataFrame =
    Chunking.contentDefinedChunks(docs(s, dir), "doc_id", "text",
        maskBits = 4, salt = "cdc")
      .orderBy(col("doc_id"), col("chunk_idx"))

  val q293Sql: String =
    s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |f AS (SELECT doc_id, w, len(w) AS n FROM ws),
      |c AS (SELECT doc_id, w, n,
      |        list_concat(CAST([0] AS BIGINT[]), CASE WHEN n >= 2 THEN
      |          list_filter(list_transform(range(2, n + 1), i ->
      |            CASE WHEN (${hash32Sql("'cdc_' || w[i-1] || ' ' || w[i]")})
      |                   % 16 = 0
      |            THEN i - 1 ELSE -1 END), x -> x >= 0)
      |          ELSE CAST([] AS BIGINT[]) END) AS st
      |      FROM f),
      |e AS (SELECT doc_id, w, n, st,
      |        list_concat(st[2 : len(st)], CAST([n] AS BIGINT[])) AS en
      |      FROM c),
      |g AS (SELECT doc_id, unnest(range(1, len(st) + 1)) AS j, st, en, w
      |      FROM e)
      |SELECT doc_id, CAST(j - 1 AS BIGINT) AS chunk_idx,
      |  CAST(st[j] AS BIGINT) AS chunk_start,
      |  CAST(en[j] - st[j] AS BIGINT) AS n_words,
      |  md5(array_to_string(w[st[j] + 1 : en[j]], ' ')) AS chunk_md5
      |FROM g ORDER BY doc_id, chunk_idx""".stripMargin

  // ── q294: pseudo-relevance-feedback expanded retrieval ─────────────────

  /** q294: Rocchio blind-feedback retrieval
    * ([[Relevance.prfExpandedRetrieve]]): seed BM25 top-10 → top-5
    * expansion terms by feedback-tf × 6-dp idf → expanded BM25 top-10;
    * the zero-supervision recall booster, fully distributed. */
  def q294PrfRetrieve(s: SparkSession, dir: String): DataFrame =
    Relevance.prfExpandedRetrieve(docs(s, dir), "doc_id", "text",
        seed = Seq("batch", "scan", "data"), fbK = 10, expK = 5, k = 10,
        k1 = 1.5, b = 0.75)
      .orderBy(col("bm25").desc, col("doc_id").asc)

  val q294Sql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |dl AS (SELECT doc_id, len(w) AS dl FROM w),
      |t AS (SELECT doc_id, unnest(w) AS term FROM w),
      |corpus AS (SELECT count(*) AS n_docs,
      |             CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
      |stf AS (SELECT doc_id, term, count(*) AS tf FROM t
      |        WHERE term IN ('batch', 'scan', 'data') GROUP BY 1, 2),
      |sdf AS (SELECT term, count(*) AS df FROM stf GROUP BY 1),
      |ssc AS (SELECT stf.doc_id,
      |          CAST(round(
      |            ln(1.0 + CAST(c.n_docs - d.df + 0.5 AS DOUBLE)
      |                       / CAST(d.df + 0.5 AS DOUBLE))
      |            * (CAST(stf.tf AS DOUBLE) * 2.5)
      |            / (CAST(stf.tf AS DOUBLE)
      |               + 1.5 * (0.25 + 0.75 * l.dl / c.avgdl)), 6)
      |            AS DECIMAL(18,6)) AS contrib
      |        FROM stf JOIN sdf d USING (term) JOIN dl l USING (doc_id)
      |        CROSS JOIN corpus c),
      |fb AS (SELECT doc_id FROM (
      |         SELECT doc_id, CAST(SUM(contrib) AS DOUBLE) AS bm25
      |         FROM ssc GROUP BY doc_id
      |         ORDER BY bm25 DESC, doc_id LIMIT 10)),
      |fbtf AS (SELECT t.term, COUNT(*) AS tfb
      |         FROM t JOIN fb USING (doc_id)
      |         WHERE t.term NOT IN ('batch', 'scan', 'data')
      |         GROUP BY 1),
      |cdf AS (SELECT term, COUNT(*) AS df FROM (
      |          SELECT DISTINCT doc_id, term FROM t
      |          WHERE term IN (SELECT term FROM fbtf)) GROUP BY 1),
      |nd AS (SELECT COUNT(*) AS nd FROM documents),
      |exp AS (SELECT f.term FROM fbtf f JOIN cdf USING (term) CROSS JOIN nd
      |        ORDER BY f.tfb * CAST(round(ln((nd.nd + 1.0) / (cdf.df + 1)),
      |          6) AS DECIMAL(18,6)) DESC, f.term ASC LIMIT 5),
      |qt AS (SELECT 'batch' AS term UNION ALL SELECT 'scan'
      |       UNION ALL SELECT 'data' UNION ALL SELECT term FROM exp),
      |etf AS (SELECT doc_id, term, count(*) AS tf FROM t
      |        WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
      |edf AS (SELECT term, count(*) AS df FROM etf GROUP BY 1),
      |esc AS (SELECT etf.doc_id,
      |          CAST(round(
      |            ln(1.0 + CAST(c.n_docs - d.df + 0.5 AS DOUBLE)
      |                       / CAST(d.df + 0.5 AS DOUBLE))
      |            * (CAST(etf.tf AS DOUBLE) * 2.5)
      |            / (CAST(etf.tf AS DOUBLE)
      |               + 1.5 * (0.25 + 0.75 * l.dl / c.avgdl)), 6)
      |            AS DECIMAL(18,6)) AS contrib
      |        FROM etf JOIN edf d USING (term) JOIN dl l USING (doc_id)
      |        CROSS JOIN corpus c)
      |SELECT doc_id, CAST(SUM(contrib) AS DOUBLE) AS bm25,
      |  count(*) AS n_terms
      |FROM esc GROUP BY doc_id
      |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin

  // ── q295: personalized PageRank seed expansion ─────────────────────────

  /** q295: seed-restart PageRank over the exact-Jaccard ≥ 0.1 dedup
    * graph ([[Graph.personalizedPageRank]], Haveliwala 2002; seeds =
    * doc_id ≡ 0 mod 5, 3 iterations) — random-walk proximity to a
    * curated seed list, integer-exact at scale 10¹². */
  def q295SeedPagerank(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val edges = TextDedup.ngramJaccardPairs(d, "doc_id", "text",
      w = 3, threshold = 0.1)
    Graph.personalizedPageRank(edges, "d1", "d2",
        d.filter(col("doc_id") % 5 === 0).select(col("doc_id")),
        "doc_id", iters = 3)
      .orderBy(col("node"))
  }

  val q295Sql: String = {
    def round(i: Int): String =
      s"""it$i AS (SELECT e.b AS node, CAST(SUM(p.pr // p.deg) AS BIGINT)
         |          AS sin
         |        FROM e JOIN pr${i - 1} p ON e.a = p.node GROUP BY e.b),
         |pr$i AS (SELECT p.node, p.deg, p.seed, p.ns,
         |          CASE WHEN p.seed = 1
         |            THEN 3000000000000 // (20 * p.ns) ELSE 0 END
         |            + (17 * COALESCE(i.sin, 0)) // 20 AS pr
         |        FROM pr${i - 1} p LEFT JOIN it$i i
         |          ON p.node = i.node)""".stripMargin
    s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(1, len(w) - 1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      |       FROM ws WHERE len(w) >= 3),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |p0 AS (SELECT i.d1, i.d2
      |       FROM inter i JOIN sz s1 ON i.d1 = s1.doc_id
      |                    JOIN sz s2 ON i.d2 = s2.doc_id
      |       WHERE CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter) >= 0.1),
      |e AS (SELECT d1 AS a, d2 AS b FROM p0 UNION SELECT d2, d1 FROM p0),
      |deg AS (SELECT a AS node, COUNT(*) AS deg FROM e GROUP BY a),
      |sd AS (SELECT node, deg,
      |         CASE WHEN node % 5 = 0 THEN 1 ELSE 0 END AS seed
      |       FROM deg),
      |nsq AS (SELECT SUM(seed) AS ns FROM sd),
      |pr0 AS (SELECT node, deg, seed, nsq.ns,
      |          CASE WHEN seed = 1 THEN 1000000000000 // nsq.ns
      |            ELSE 0 END AS pr
      |        FROM sd CROSS JOIN nsq),
      |${(1 to 3).map(round).mkString(",\n")}
      |SELECT node, CAST(deg AS BIGINT) AS deg, seed = 1 AS is_seed,
      |  CAST(pr AS BIGINT) AS ppr_scaled
      |FROM pr3 ORDER BY node""".stripMargin
  }

  // ── q296: split-conformal threshold + coverage audit ───────────────────

  /** q296: conformal bottom-α cut of the q212 quality-classifier logits
    * ([[Classify.conformalLowerThreshold]], α = 1/10; calibration =
    * the md5-even half) — the finite-sample-calibrated flagging budget,
    * exact integer order statistics end to end. */
  def q296Conformal(s: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.linearQualityScore(docs(s, dir), "doc_id",
        "text", QualityQueries.q212MilliWeights.toMap,
        QualityQueries.q212BiasMilli)
      .select(col("doc_id"), col("logit_milli"))
      .withColumn("is_cal",
        pmod(graft.operators.Sketches.hash32(
          concat(lit("conf_"), col("doc_id").cast("string"))), lit(2L))
          === 0L)
    Classify.conformalLowerThreshold(scored, "doc_id", "logit_milli",
      "is_cal", aNum = 1L, aDen = 10L)
  }

  // wraps the q212 scoring chain; the calibration flag is the repo's
  // md5-integer convention
  val q296Sql: String =
    s"""WITH sc AS (SELECT doc_id, logit_milli FROM (
      |${QualityQueries.q212Sql}
      |  )),
      |f AS (SELECT doc_id, logit_milli,
      |        (${hash32Sql("'conf_' || doc_id")}) % 2 = 0 AS is_cal
      |      FROM sc),
      |cal AS (SELECT doc_id, logit_milli FROM f WHERE is_cal),
      |nc AS (SELECT COUNT(*) AS n_cal FROM cal),
      |rk AS (SELECT logit_milli, row_number() OVER (
      |         ORDER BY logit_milli, doc_id) AS rn FROM cal),
      |qh AS (SELECT nc.n_cal,
      |         (1 * (nc.n_cal + 1) + 9) // 10 AS k_rank,
      |         (SELECT logit_milli FROM rk CROSS JOIN nc
      |          WHERE rn = (1 * (nc.n_cal + 1) + 9) // 10) AS q_hat
      |       FROM nc)
      |SELECT qh.n_cal, CAST(qh.k_rank AS BIGINT) AS k_rank,
      |  CAST(qh.q_hat AS BIGINT) AS q_hat,
      |  COUNT(*) AS n_test,
      |  CAST(SUM(CASE WHEN t.logit_milli < qh.q_hat THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_flagged,
      |  CAST((SUM(CASE WHEN t.logit_milli < qh.q_hat THEN 1 ELSE 0 END)
      |    ::HUGEINT * 1000000) // COUNT(*)::HUGEINT AS BIGINT)
      |    AS flagged_ppm
      |FROM f t CROSS JOIN qh WHERE NOT t.is_cal
      |GROUP BY qh.n_cal, qh.k_rank, qh.q_hat""".stripMargin
}
