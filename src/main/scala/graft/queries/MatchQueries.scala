package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Sketches, TextDedup}
import graft.sources.Sources

/** Round-6 matching/sketching operators: prefix-filtered set-similarity
  * join (the lossless PPJoin-family candidate generator), classic
  * sorted-neighborhood dedup, and Count-Min-sketch frequency estimation —
  * each with a DuckDB oracle reproducing the arithmetic exactly (for
  * q142 the oracle is the GROUND-TRUTH all-pairs join, so the gate
  * verifies the prefix filter's losslessness, not just its code). */
object MatchQueries {

  // ── q142: prefix-filtered set-similarity self-join ─────────────────────

  /** q142: exact Jaccard ≥ 0.6 near-dup pairs via prefix filtering —
    * candidates only from RARE-shingle collisions (boilerplate shingles
    * never enter a prefix), zero recall loss. Oracle = unfiltered
    * all-pairs ground truth: a hash match PROVES losslessness. */
  def q142PrefixJoin(s: SparkSession, dir: String): DataFrame =
    TextDedup.prefixJaccardPairs(Sources.documents(s, dir), "doc_id",
        "text", w = 3, tNum = 3, tDen = 5)
      .orderBy(col("d1"), col("d2"))

  val q142Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(1, len(w) - 1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      |       FROM ws WHERE len(w) >= 3),
      |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      |         FROM sh a JOIN sh b ON a.s = b.s WHERE a.doc_id < b.doc_id),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT c.d1, c.d2, count(*) AS inter
      |          FROM cand c
      |          JOIN sh a ON a.doc_id = c.d1
      |          JOIN sh b ON b.doc_id = c.d2 AND b.s = a.s
      |          GROUP BY c.d1, c.d2)
      |SELECT i.d1, i.d2,
      |  CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter) AS jaccard
      |FROM inter i JOIN sz s1 ON i.d1 = s1.doc_id
      |             JOIN sz s2 ON i.d2 = s2.doc_id
      |WHERE CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter) >= 0.6
      |ORDER BY d1, d2""".stripMargin

  // ── q143: sorted-neighborhood dedup ────────────────────────────────────

  /** q143: near-dup pairs from the sorted-neighborhood method — sort by
    * a normalized 24-char text-prefix key, compare each doc with its 7
    * successors, verify with Levenshtein ≤ 60; O(n·w) comparisons, no
    * candidate blow-up. */
  def q143SortedNeighborhood(s: SparkSession, dir: String): DataFrame =
    TextDedup.sortedNeighborhoodPairs(Sources.documents(s, dir), "doc_id",
        "text", window = 8, maxDist = 60)
      .orderBy(col("d1"), col("d2"))

  val q143Sql: String =
    """WITH k AS (SELECT doc_id, text,
      |    substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 24)
      |      AS key
      |  FROM documents),
      |r AS (SELECT doc_id, text,
      |        row_number() OVER (ORDER BY key, doc_id) AS rn
      |      FROM k)
      |SELECT LEAST(a.doc_id, b.doc_id) AS d1,
      |  GREATEST(a.doc_id, b.doc_id) AS d2,
      |  levenshtein(a.text, b.text) AS edit_dist
      |FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 7
      |WHERE levenshtein(a.text, b.text) <= 60
      |ORDER BY d1, d2""".stripMargin

  // ── q144: Count-Min sketch heavy hitters ───────────────────────────────

  /** q144: CMS(4×256) frequency estimates for the corpus's top-10 words
    * next to their exact counts — the fixed-size (d·width counters)
    * frequency summary; estimates are md5-deterministic, never
    * undercount, and the gate checks them value-exactly. */
  def q144CmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val words = Sources.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("word"))
    val sketch = Sketches.cmsSketch(words, "word", d = 4, width = 256)
    // `top` feeds both the probe set and the final join — localCheckpoint
    // the 10 rows so the corpus word-count aggregation runs once, not
    // once per consumer (the pageRank lineage-cut pattern)
    val top = words.groupBy(col("word")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("word")).limit(10)
      .localCheckpoint()
    Sketches.cmsEstimate(sketch, top, "word", d = 4, width = 256)
      .join(top, "word")
      .select(col("word"), col("exact_n"), col("est_n"))
      .orderBy(col("exact_n").desc, col("word"))
  }

  val q144Sql: String =
    """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
      |           FROM documents),
      |ex AS (SELECT word, count(*) AS exact_n FROM w GROUP BY word),
      |top AS (SELECT word, exact_n FROM ex
      |        ORDER BY exact_n DESC, word LIMIT 10),
      |b AS (SELECT word, r,
      |        CAST(list_sum(list_transform(range(1, 9), j ->
      |          (strpos('0123456789abcdef',
      |             substr(md5('cms' || r || '_' || word), j, 1)) - 1)
      |            * (1::BIGINT << (4 * (8 - j))))) AS BIGINT) % 256 AS bucket
      |      FROM w CROSS JOIN range(0, 4) t(r)),
      |cnt AS (SELECT r, bucket, count(*) AS cnt FROM b GROUP BY r, bucket),
      |pr AS (SELECT t.word, s.r,
      |         CAST(list_sum(list_transform(range(1, 9), j ->
      |           (strpos('0123456789abcdef',
      |              substr(md5('cms' || s.r || '_' || t.word), j, 1)) - 1)
      |             * (1::BIGINT << (4 * (8 - j))))) AS BIGINT) % 256 AS bucket
      |       FROM top t CROSS JOIN range(0, 4) s(r))
      |SELECT t.word, t.exact_n, MIN(COALESCE(c.cnt, 0)) AS est_n
      |FROM pr JOIN top t USING (word)
      |LEFT JOIN cnt c ON c.r = pr.r AND c.bucket = pr.bucket
      |GROUP BY t.word, t.exact_n
      |ORDER BY t.exact_n DESC, t.word""".stripMargin

  // ── q154: boolean AND retrieval ────────────────────────────────────────

  /** q154: documents containing ALL of {batch, scan, data} — conjunctive
    * keyword retrieval; the isin cut runs before the doc-keyed agg, so
    * corpus volume never reaches the shuffle. */
  def q154BooleanRetrieve(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    graft.operators.Relevance.booleanRetrieve(docs, "doc_id", "text",
        Seq("batch", "scan", "data"))
      .join(docs.select(col("doc_id"), col("source"), col("lang")), "doc_id")
      .orderBy(col("doc_id"))
  }

  val q154Sql: String =
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |           FROM documents),
      |hit AS (SELECT doc_id FROM w WHERE word IN ('batch', 'scan', 'data')
      |        GROUP BY doc_id HAVING count(DISTINCT word) = 3)
      |SELECT h.doc_id, d.source, d.lang
      |FROM hit h JOIN documents d USING (doc_id)
      |ORDER BY h.doc_id""".stripMargin

  // ── q155: distribution-matching resample ───────────────────────────────

  /** q155: resample the corpus to a 4:2:2:1:1 en/de/es/fr/zh target mix
    * at the largest size the data supports — integer-exact keep rule
    * against the binding stratum, one narrow filter, no corpus shuffle.
    * Kept-set membership is pinned by the per-lang id sum. */
  def q155MatchDistribution(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.matchDistribution(Sources.documents(s, dir),
        "doc_id", "lang", "mix6",
        Seq("en" -> 4L, "de" -> 2L, "es" -> 2L, "fr" -> 1L, "zh" -> 1L))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"))
      .orderBy(col("lang"))

  val q155Sql: String =
    """WITH t AS (SELECT * FROM (VALUES ('en', 4), ('de', 2), ('es', 2),
      |             ('fr', 1), ('zh', 1)) v(lang, w)),
      |c AS (SELECT d.lang, count(*) AS n, any_value(t.w) AS w
      |      FROM documents d JOIN t ON d.lang = t.lang GROUP BY d.lang),
      |star AS (SELECT n AS n_star, w AS w_star FROM c
      |         ORDER BY CAST(n AS DOUBLE) / w, lang LIMIT 1),
      |keep AS (SELECT d.doc_id, d.lang
      |         FROM documents d JOIN c ON d.lang = c.lang CROSS JOIN star
      |         WHERE ((strpos('0123456789abcdef',
      |             substr(md5('mix6_' || d.doc_id), 1, 1)) - 1) * 16
      |           + strpos('0123456789abcdef',
      |             substr(md5('mix6_' || d.doc_id), 2, 1)) - 1)
      |           * star.w_star * c.n < 256 * c.w * star.n_star)
      |SELECT lang, count(*) AS n_kept,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
      |FROM keep GROUP BY lang ORDER BY lang""".stripMargin

  // ── q165: Jaro–Winkler verified pairs ──────────────────────────────────

  /** q165: sorted-neighborhood candidates re-scored with the native
    * jaro_winkler codegen kernel on a 64-char slice, keep sim ≥ 0.8 —
    * the oracle recomputes with DuckDB's own jaro_winkler_similarity,
    * so a green hash PROVES the custom Expression matches DuckDB's
    * implementation of the metric (window clamp, transposition count,
    * prefix boost) on every candidate pair, not just unit cases. */
  def q165JaroWinkler(s: SparkSession, dir: String): DataFrame =
    TextDedup.jaroWinklerPairs(Sources.documents(s, dir), "doc_id",
        "text", window = 8, minSim = 0.8, prefixLen = 64)
      .orderBy(col("d1"), col("d2"))

  val q165Sql: String =
    """WITH k AS (SELECT doc_id, substr(text, 1, 64) AS t,
      |    substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 24)
      |      AS key
      |  FROM documents),
      |r AS (SELECT doc_id, t,
      |        row_number() OVER (ORDER BY key, doc_id) AS rn
      |      FROM k),
      |sc AS (SELECT LEAST(a.doc_id, b.doc_id) AS d1,
      |         GREATEST(a.doc_id, b.doc_id) AS d2,
      |         round(jaro_winkler_similarity(a.t, b.t), 6) AS jw_sim
      |       FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 7)
      |SELECT d1, d2, jw_sim FROM sc WHERE jw_sim >= 0.8
      |ORDER BY d1, d2""".stripMargin
}
