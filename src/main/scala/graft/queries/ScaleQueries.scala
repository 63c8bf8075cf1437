package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Graph, Relevance, Sampling, TextAnalysis, TextDedup}
import graft.sources.Sources

/** Round-4 widening of the training-pipeline surface: duplicate CLUSTERS
  * (connected components over near-dup pairs), TF-IDF features, BM25
  * retrieval, Gopher-style repetition quality, and stratified sampling —
  * each with a DuckDB oracle reproducing the arithmetic exactly. */
object ScaleQueries {

  // ── q65: duplicate clusters (connected components over LSH pairs) ──────

  /** q65: near-dup PAIRS (q19's MinHash-LSH graph) closed into duplicate
    * CLUSTERS via distributed HashMin label propagation — the step that
    * turns pairwise similarity into "keep one survivor per component".
    * Oracle: a recursive CTE computes full reachability over the same
    * edge list and takes MIN per node. */
  def q65DupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = TextDedup.minHashLshPairs(Sources.documents(s, dir),
      "doc_id", "text", k = 16, r = 4, w = 3, threshold = 0.5)
    val comp = Graph.connectedComponents(pairs, "d1", "d2")
    val sizes = comp.groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"))
    // groupBy and join share the `component` exchange — no extra shuffle
    comp.join(sizes, "component")
      .select(col("node").as("doc_id"), col("component"), col("n_members"))
      .orderBy(col("doc_id"))
  }

  val q65Sql: String =
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
       |csz AS (SELECT component, COUNT(*) AS n_members
       |        FROM comp GROUP BY component)
       |SELECT c.doc_id, c.component, s.n_members
       |FROM comp c JOIN csz s ON c.component = s.component
       |ORDER BY c.doc_id""".stripMargin

  // ── q66: TF-IDF top terms per document ─────────────────────────────────

  /** q66: the 3 most characteristic terms per document by smoothed TF-IDF
    * (rounded to 6 dp before ranking; term-lexicographic ties). */
  def q66Tfidf(s: SparkSession, dir: String): DataFrame =
    Relevance.tfidfTopK(Sources.documents(s, dir), "doc_id", "text", k = 3)
      .orderBy(col("doc_id"), col("tfidf").desc, col("term"))

  val q66Sql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |t AS (SELECT doc_id, unnest(w) AS term FROM w),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
      |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |sc AS (SELECT tf.doc_id, tf.term, tf.tf, dfc.df,
      |         round(tf.tf * ln((n.n_docs + 1.0) / (dfc.df + 1.0)), 6) AS tfidf
      |       FROM tf JOIN dfc USING (term) CROSS JOIN n),
      |r AS (SELECT *, row_number() OVER (
      |        PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rn
      |      FROM sc)
      |SELECT doc_id, term, tf, df, tfidf FROM r WHERE rn <= 3
      |ORDER BY doc_id, tfidf DESC, term""".stripMargin

  // ── q67: Gopher-style repetition quality ───────────────────────────────

  /** q67: repetition/diversity signals per document (distinct-word ratio,
    * dominant-word mass, duplicate-bigram fraction) — narrow HOF
    * projections, zero shuffle. */
  def q67Repetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionStats(Sources.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  // DuckDB list lambdas: the index parameter of (x, i) -> is 1-based,
  // matching cnts[i] list indexing.
  val q67Sql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |a AS (SELECT doc_id, w, list_sort(list_distinct(w)) AS dw,
      |        CASE WHEN len(w) >= 2 THEN list_transform(range(1, len(w)),
      |          i -> w[i] || ' ' || w[i+1]) ELSE [] END AS bg
      |      FROM w),
      |c AS (SELECT doc_id, w, dw, bg,
      |        list_transform(dw, x -> len(list_filter(w, y -> y = x))) AS cnts
      |      FROM a),
      |m AS (SELECT doc_id, w, dw, bg, cnts, list_max(cnts) AS maxc FROM c)
      |SELECT doc_id,
      |  len(w) AS n_words,
      |  round(len(dw)::DOUBLE / len(w), 6) AS distinct_ratio,
      |  list_min(list_filter(dw, (x, i) -> cnts[i] = maxc)) AS top_word,
      |  round(maxc::DOUBLE / len(w), 6) AS top_word_frac,
      |  CASE WHEN len(bg) = 0 THEN CAST(0.0 AS DOUBLE)
      |       ELSE round(1.0 - len(list_distinct(bg))::DOUBLE / len(bg), 6)
      |  END AS dup_bigram_frac
      |FROM m ORDER BY doc_id""".stripMargin

  // ── q68: BM25 retrieval ────────────────────────────────────────────────

  /** q68: the 10 best documents for the query {vector, join, spark} under
    * BM25 (k1=1.5, b=0.75 — both exactly binary-representable so the
    * oracle's literals are bit-identical). Per-term contributions rounded
    * to 6 dp and summed as DECIMAL(18,6): order-independent. */
  def q68Bm25(s: SparkSession, dir: String): DataFrame =
    Relevance.bm25TopK(Sources.documents(s, dir), "doc_id", "text",
      terms = Seq("vector", "join", "spark"), k = 10, k1 = 1.5, b = 0.75)

  val q68Sql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |dl AS (SELECT doc_id, len(w) AS dl FROM w),
      |t AS (SELECT doc_id, unnest(w) AS term FROM w),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM t
      |       WHERE term IN ('vector', 'join', 'spark') GROUP BY 1, 2),
      |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |corpus AS (SELECT count(*) AS n_docs,
      |             CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
      |sc AS (SELECT tf.doc_id,
      |    CAST(round(
      |      ln(1.0 + CAST(c.n_docs - d.df + 0.5 AS DOUBLE)
      |                 / CAST(d.df + 0.5 AS DOUBLE))
      |      * (CAST(tf.tf AS DOUBLE) * 2.5)
      |      / (CAST(tf.tf AS DOUBLE)
      |         + 1.5 * (0.25 + 0.75 * l.dl / c.avgdl)), 6)
      |      AS DECIMAL(18,6)) AS contrib
      |  FROM tf JOIN dfc d USING (term) JOIN dl l USING (doc_id)
      |  CROSS JOIN corpus c)
      |SELECT doc_id, CAST(SUM(contrib) AS DOUBLE) AS bm25,
      |  count(*) AS n_terms
      |FROM sc GROUP BY doc_id
      |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin

  // ── q69: stratified deterministic sampling ─────────────────────────────

  /** q69: per-language downsampling of the corpus (en 25%, zh 75%, others
    * 50%) via the seedless md5 bucket — corpus rebalancing whose kept set
    * is stable under repartitioning and identical in any md5-bearing
    * engine. */
  def q69StratifiedSample(s: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedSample(Sources.documents(s, dir), "doc_id", "lang",
        salt = "strat", bounds = Seq("en" -> 64, "zh" -> 192),
        defaultBound = 128)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  val q69Sql: String =
    """WITH b AS (SELECT doc_id, lang,
      |  (strpos('0123456789abcdef',
      |     substr(md5('strat_' || doc_id), 1, 1)) - 1) * 16
      |  + strpos('0123456789abcdef',
      |     substr(md5('strat_' || doc_id), 2, 1)) - 1 AS bucket
      |  FROM documents)
      |SELECT doc_id, lang FROM b
      |WHERE bucket < CASE lang WHEN 'en' THEN 64 WHEN 'zh' THEN 192
      |               ELSE 128 END
      |ORDER BY doc_id""".stripMargin
}
