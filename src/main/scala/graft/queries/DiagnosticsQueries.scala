package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Decay, Histogram, Profiling, Sampling, Selection, Similarity, TextAnalysis, TextDedup}
import graft.sources.Sources

/** Round-6 corpus-diagnostics and selection operators: table profiling
  * (ANALYZE), histogram-quantized percentiles, Pareto-frontier selection,
  * recency-decayed aggregation, unigram-entropy quality, cross-split
  * near-dup leakage auditing, and hard-negative mining — the
  * observe-and-select layer over an already-deduped corpus, each with a
  * DuckDB oracle reproducing the arithmetic exactly. */
object DiagnosticsQueries {

  // ── q110: column-level table profile (ANALYZE) ─────────────────────────

  /** q110: one-pass melted profile of the events table — row/null/distinct
    * counts plus canonical min/max per column. The data-card every ingest
    * writes first; one corpus scan total, not one per column. */
  def q110Profile(s: SparkSession, dir: String): DataFrame =
    Profiling.profile(Sources.events(s, dir),
        Seq("event_id", "user_id", "event_type", "value"))
      .orderBy(col("col_name"))

  val q110Sql: String =
    """SELECT 'event_id' AS col_name, count(*) AS n_rows,
      |    count(*) - count(event_id) AS n_null,
      |    count(DISTINCT event_id) AS n_distinct,
      |    CAST(min(event_id) AS VARCHAR) AS min_repr,
      |    CAST(max(event_id) AS VARCHAR) AS max_repr
      |  FROM events
      |UNION ALL
      |SELECT 'user_id', count(*), count(*) - count(user_id),
      |    count(DISTINCT user_id),
      |    CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
      |  FROM events
      |UNION ALL
      |SELECT 'event_type', count(*), count(*) - count(event_type),
      |    count(DISTINCT event_type), min(event_type), max(event_type)
      |  FROM events
      |UNION ALL
      |SELECT 'value', count(*), count(*) - count(value),
      |    count(DISTINCT CAST(CAST(round(value, 6) AS DECIMAL(18,6))
      |      AS VARCHAR)),
      |    CAST(CAST(round(min(value), 6) AS DECIMAL(18,6)) AS VARCHAR),
      |    CAST(CAST(round(max(value), 6) AS DECIMAL(18,6)) AS VARCHAR)
      |  FROM events
      |ORDER BY col_name""".stripMargin

  // ── q111: histogram-quantized percentiles ──────────────────────────────

  /** q111: per-language p50/p90/p99 of document length off 4096 equi-width
    * integer buckets — the percentile path that costs one corpus pass and
    * a metadata-scale aggregate instead of a global sort, with error
    * bounded by one bucket width and every number integer-exact. */
  def q111QuantizedPct(s: SparkSession, dir: String): DataFrame =
    Histogram.quantizedPercentiles(Sources.documents(s, dir),
        "n_chars", "lang", bits = 12, pcts = Seq(50, 90, 99))
      .orderBy(col("lang"), col("pct"))

  val q111Sql: String =
    """WITH s AS (SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx
      |           FROM documents),
      |b AS (SELECT lang,
      |        CASE WHEN s.mx = s.mn THEN 0
      |          ELSE ((n_chars - s.mn) * 4095) // (s.mx - s.mn) END AS bucket
      |      FROM documents CROSS JOIN s),
      |c AS (SELECT lang, bucket, count(*) AS cnt FROM b GROUP BY 1, 2),
      |cum AS (SELECT lang, bucket, cnt,
      |         CAST(SUM(cnt) OVER (PARTITION BY lang ORDER BY bucket
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS BIGINT) AS n_le,
      |         CAST(SUM(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
      |       FROM c),
      |p AS (SELECT * FROM (VALUES (50), (90), (99)) v(pct))
      |SELECT cum.lang, p.pct, cum.bucket,
      |  s.mn + (cum.bucket * (s.mx - s.mn)) // 4095 AS lo,
      |  s.mn + ((cum.bucket + 1) * (s.mx - s.mn)) // 4095 AS hi,
      |  cum.n_le, cum.n
      |FROM cum CROSS JOIN p CROSS JOIN s
      |WHERE 100 * cum.n_le >= p.pct * cum.n
      |  AND 100 * (cum.n_le - cum.cnt) < p.pct * cum.n
      |ORDER BY cum.lang, p.pct""".stripMargin

  // ── q112: Pareto-frontier selection ────────────────────────────────────

  /** q112: documents no other document strictly dominates on
    * (alpha-ratio quality, length) — 2-D skyline selection without
    * collapsing the axes into one score. Levels window is bounded by the
    * 6-dp score quantization; the corpus sees one agg + one broadcast
    * join. */
  def q112Pareto(s: SparkSession, dir: String): DataFrame = {
    val alpha = TextAnalysis.qualityCols(col("text")).toMap.apply("alpha_ratio")
    val docs = Sources.documents(s, dir)
      .select(col("doc_id"), round(alpha, 6).as("alpha_ratio"),
        col("n_chars"))
    Selection.paretoFrontier(docs, "alpha_ratio", "n_chars")
      .orderBy(col("doc_id"))
  }

  val q112Sql: String =
    """WITH q AS (SELECT doc_id,
      |    round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
      |      AS DOUBLE) / length(text), 6) AS alpha_ratio,
      |    n_chars
      |  FROM documents),
      |lv AS (SELECT alpha_ratio, MAX(n_chars) AS ymax
      |       FROM q GROUP BY alpha_ratio),
      |lw AS (SELECT alpha_ratio, ymax,
      |         MAX(ymax) OVER (ORDER BY alpha_ratio DESC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS yabove
      |       FROM lv),
      |fr AS (SELECT alpha_ratio, ymax FROM lw
      |       WHERE yabove IS NULL OR ymax > yabove)
      |SELECT q.doc_id, q.alpha_ratio, q.n_chars
      |FROM q JOIN fr ON q.alpha_ratio = fr.alpha_ratio
      |               AND q.n_chars = fr.ymax
      |ORDER BY q.doc_id""".stripMargin

  // ── q113: recency-decayed engagement ───────────────────────────────────

  /** q113: per-user 7-day-half-life decayed value sum, aged against the
    * corpus max timestamp — reproducible freshness scoring with
    * decimal-exact accumulation. */
  def q113Decayed(s: SparkSession, dir: String): DataFrame =
    Decay.halfLifeSum(Sources.events(s, dir), "ts", "value",
        Seq("user_id"), halfLifeDays = 7.0)
      .select(col("user_id"), col("n_events"),
        round(col("decayed_sum").cast(DoubleType), 6).as("decayed_sum"))
      .orderBy(col("user_id"))

  val q113Sql: String =
    """WITH m AS (SELECT MAX(CAST(epoch_ns(ts) // 1000 AS BIGINT)) AS asof
      |           FROM events),
      |t AS (SELECT user_id,
      |        CAST(round(value * power(2.0,
      |          -(CAST(m.asof - epoch_ns(ts) // 1000 AS DOUBLE)
      |            / 86400000000.0) / 7.0), 6) AS DECIMAL(18,6)) AS term
      |      FROM events CROSS JOIN m)
      |SELECT user_id, COUNT(*) AS n_events,
      |  round(CAST(SUM(term) AS DOUBLE), 6) AS decayed_sum
      |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin

  // ── q114: cross-split near-dup leakage audit ───────────────────────────

  /** q114: MinHash-LSH near-dup pairs that straddle the deterministic
    * train/val/test split — the contamination a per-split exact dedup
    * cannot see. Reuses the q19 LSH pipeline and the q59 split buckets;
    * the audit costs exactly one extra broadcast join over the pairs. */
  def q114SplitLeakage(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    val splits = Sampling.deterministicSplit(docs.select(col("doc_id")),
      "doc_id", "split",
      Seq(("train", 204), ("val", 230), ("test", 256)))
    val pairs = TextDedup.minHashLshPairs(docs, "doc_id", "text")
    pairs
      .join(splits.select(col("doc_id").as("d1"), col("split").as("split1")),
        Seq("d1"))
      .join(splits.select(col("doc_id").as("d2"), col("split").as("split2")),
        Seq("d2"))
      .filter(col("split1") =!= col("split2"))
      .select(col("d1"), col("d2"), col("jaccard"),
        col("split1"), col("split2"))
      .orderBy(col("d1"), col("d2"))
  }

  val q114Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(1, len(w) - 1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      |       FROM ws WHERE len(w) >= 3),
      |hw AS (SELECT doc_id,
      |         CAST(list_sum(list_transform(range(1, 9), j ->
      |           (strpos('0123456789abcdef', substr(md5('a_' || s), j, 1)) - 1)
      |             * power(16, 8 - j))) AS BIGINT) AS h1,
      |         CAST(list_sum(list_transform(range(1, 9), j ->
      |           (strpos('0123456789abcdef', substr(md5('b_' || s), j, 1)) - 1)
      |             * power(16, 8 - j))) AS BIGINT) AS h2
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
      |pairs AS (SELECT i.d1, i.d2,
      |    CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter) AS jaccard
      |  FROM inter i JOIN sz s1 ON i.d1 = s1.doc_id
      |  JOIN sz s2 ON i.d2 = s2.doc_id
      |  WHERE CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter) >= 0.5),
      |sp AS (SELECT doc_id,
      |  CASE WHEN bucket < 204 THEN 'train'
      |       WHEN bucket < 230 THEN 'val'
      |       ELSE 'test' END AS split
      |  FROM (SELECT doc_id,
      |    (strpos('0123456789abcdef',
      |       substr(md5('split_' || doc_id), 1, 1)) - 1) * 16
      |    + strpos('0123456789abcdef',
      |       substr(md5('split_' || doc_id), 2, 1)) - 1 AS bucket
      |    FROM documents))
      |SELECT p.d1, p.d2, p.jaccard, a.split AS split1, b.split AS split2
      |FROM pairs p JOIN sp a ON p.d1 = a.doc_id JOIN sp b ON p.d2 = b.doc_id
      |WHERE a.split <> b.split
      |ORDER BY p.d1, p.d2""".stripMargin

  // ── q115: unigram-entropy quality signal ───────────────────────────────

  /** q115: per-document word-distribution Shannon entropy (nats) plus
    * type/token counts — the information-density filter that catches
    * boilerplate repetition that length ratios miss. */
  def q115Entropy(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.wordEntropy(Sources.documents(s, dir), "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        round(col("entropy_nats").cast(DoubleType), 6).as("entropy_nats"))
      .orderBy(col("doc_id"))

  val q115Sql: String =
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |           FROM documents),
      |c AS (SELECT doc_id, w, count(*) AS c FROM t GROUP BY 1, 2),
      |n AS (SELECT doc_id, c,
      |        CAST(SUM(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n
      |      FROM c),
      |term AS (SELECT doc_id, n,
      |    CAST(round((CAST(c AS DOUBLE) / n) * ln(CAST(n AS DOUBLE) / c), 6)
      |      AS DECIMAL(18,6)) AS term
      |  FROM n)
      |SELECT doc_id, MAX(n) AS n_tokens, COUNT(*) AS n_types,
      |  round(CAST(SUM(term) AS DOUBLE), 6) AS entropy_nats
      |FROM term GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ── q116: hard-negative mining ─────────────────────────────────────────

  /** q116: for each anchor (every 100th vector) the 3 most-cosine-similar
    * vectors with a DIFFERENT label — contrastive hard negatives, one
    * corpus pass for all anchors, per-anchor top-k via WindowGroupLimit. */
  def q116HardNegatives(s: SparkSession, dir: String): DataFrame =
    Similarity.hardNegatives(Sources.embeddings(s, dir),
        "vec_id", "embedding", "label", col("vec_id") % 100 === 0, k = 3)
      .orderBy(col("anchor_id"), col("cosine").desc, col("neg_id"))

  val q116Sql: String =
    """WITH a AS (SELECT vec_id AS anchor_id, label AS anchor_label,
      |             embedding AS qv
      |           FROM embeddings WHERE vec_id % 100 = 0),
      |sc AS (SELECT a.anchor_id, a.anchor_label,
      |         e.vec_id AS neg_id, e.label AS neg_label,
      |         round(
      |           list_sum(list_transform(range(1, len(e.embedding) + 1),
      |             i -> e.embedding[i]::DOUBLE * a.qv[i]::DOUBLE)) /
      |           (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
      |              i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) *
      |            sqrt(list_sum(list_transform(range(1, len(a.qv) + 1),
      |              i -> a.qv[i]::DOUBLE * a.qv[i]::DOUBLE)))), 6) AS cosine
      |       FROM embeddings e CROSS JOIN a
      |       WHERE e.label <> a.anchor_label AND e.vec_id <> a.anchor_id),
      |rk AS (SELECT *, row_number() OVER (PARTITION BY anchor_id
      |         ORDER BY cosine DESC, neg_id) AS rn
      |       FROM sc)
      |SELECT anchor_id, anchor_label, neg_id, neg_label, cosine
      |FROM rk WHERE rn <= 3
      |ORDER BY anchor_id, cosine DESC, neg_id""".stripMargin
}
