package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Decay, EntityResolution, Funnel, Histogram, Itemsets, Profiling, Relevance, Sketches, Sampling, Selection, Similarity, Snapshot, Standardize, TextAnalysis, TextDedup, VectorAggs}
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
    val pairs = TextDedup.minHashLshPairs(docs, "doc_id", "text",
      k = 16, r = 4, w = 3, threshold = 0.5)
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

  // ── q117: mergeable equi-width histogram ───────────────────────────────

  /** q117: length histogram computed on two disjoint halves against a
    * FIXED domain and MERGED by bucket-count addition — the gate compares
    * against a direct full-corpus histogram, so the merge law is
    * hash-verified (the q95 pattern for histograms). */
  def q117HistMerge(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    val halves = Seq(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
      .map(Histogram.bucketCounts(_, "n_chars", bits = 8, mn = 0L, mx = 5000L))
    Histogram.mergeBucketCounts(halves).orderBy(col("bucket"))
  }

  val q117Sql: String =
    """SELECT (LEAST(GREATEST(n_chars, 0), 5000) * 255) // 5000 AS bucket,
      |  COUNT(*) AS n
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  // ── q118: prefix-blocking dedup groups ─────────────────────────────────

  /** q118: documents sharing their first 10 tokens, grouped by prefix
    * hash — the cheap blocking pass for truncated-scrape duplicates that
    * full-content hashing misses. */
  def q118PrefixClusters(s: SparkSession, dir: String): DataFrame =
    TextDedup.prefixClusters(Sources.documents(s, dir), "doc_id", "text",
        k = 10)
      .orderBy(col("prefix_hash"))

  val q118Sql: String =
    """WITH p AS (SELECT doc_id,
      |    md5(array_to_string((string_split(text, ' '))[1:10], ' '))
      |      AS prefix_hash
      |  FROM documents)
      |SELECT prefix_hash, COUNT(*) AS n_docs,
      |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      |FROM p GROUP BY 1 HAVING COUNT(*) > 1
      |ORDER BY prefix_hash""".stripMargin

  // ── q119: per-stratum z-score outliers ─────────────────────────────────

  /** q119: event values standardized within their event type (population
    * moments from decimal-exact sums), |z| ≥ 3 flagged — the anomaly
    * gate of a quality pipeline. */
  def q119ZScores(s: SparkSession, dir: String): DataFrame =
    Standardize.zScores(Sources.events(s, dir), "value", "event_type",
        sigma = 3.0)
      .select(col("event_id"), col("event_type"), col("value"), col("z"),
        col("is_outlier"))
      .orderBy(col("event_id"))

  val q119Sql: String =
    """WITH st AS (SELECT event_type, COUNT(*) AS n,
      |    SUM(CAST(round(value, 6) AS DECIMAL(18,6))) AS s1,
      |    SUM(CAST(round(value * value, 6) AS DECIMAL(28,6))) AS s2
      |  FROM events GROUP BY event_type),
      |m AS (SELECT event_type,
      |    CAST(s1 AS DOUBLE) / n AS mean,
      |    greatest(CAST(s2 AS DOUBLE) / n
      |      - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n),
      |      0.0) AS var
      |  FROM st),
      |z AS (SELECT e.event_id, e.event_type, e.value,
      |    round((e.value - m.mean) / sqrt(m.var), 6) AS z
      |  FROM events e JOIN m USING (event_type))
      |SELECT event_id, event_type, value, z, abs(z) >= 3.0 AS is_outlier
      |FROM z ORDER BY event_id""".stripMargin

  // ── q120: exact-total proportional sample ──────────────────────────────

  /** q120: exactly 100 documents allocated across languages by the
    * largest-remainder method and filled md5-first — the eval-set
    * contract "N docs with the corpus's language mix", integer-exact. */
  def q120ProportionalSample(s: SparkSession, dir: String): DataFrame =
    Sampling.proportionalQuota(
        Sources.documents(s, dir).select(col("doc_id"), col("lang")),
        "doc_id", "lang", salt = "ps", totalN = 100L)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  val q120Sql: String =
    """WITH c AS (SELECT lang, COUNT(*) AS ns FROM documents GROUP BY lang),
      |t AS (SELECT CAST(SUM(ns) AS BIGINT) AS n FROM c),
      |al AS (SELECT lang, ns, (100 * ns) // t.n AS base,
      |         (100 * ns) % t.n AS rem
      |       FROM c CROSS JOIN t),
      |rk AS (SELECT *, row_number() OVER (ORDER BY rem DESC, lang) AS rk,
      |         CAST(SUM(base) OVER () AS BIGINT) AS basesum FROM al),
      |q AS (SELECT lang,
      |        base + CASE WHEN rk <= 100 - basesum THEN 1 ELSE 0 END AS quota
      |      FROM rk),
      |r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
      |        ORDER BY md5('ps_' || doc_id), doc_id) AS rn
      |      FROM documents)
      |SELECT r.doc_id, r.lang FROM r JOIN q USING (lang)
      |WHERE rn <= quota ORDER BY doc_id""".stripMargin

  // ── q121: last-touch attribution ───────────────────────────────────────

  /** q121: each purchase credited to the user's most recent click within
    * one hour — one user-partitioned window pass, no event-log self-join
    * on an inequality. */
  def q121Attribution(s: SparkSession, dir: String): DataFrame =
    Funnel.lastTouch(Sources.events(s, dir), "user_id", "event_type",
        "ts", "event_id", sourceType = "click", convType = "purchase",
        windowSec = 3600L)
      .orderBy(col("event_id"))

  val q121Sql: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |    CAST(epoch_ns(ts) // 1000 AS BIGINT) AS tus FROM events),
      |w AS (SELECT event_id, user_id, event_type, tus,
      |    last_value(CASE WHEN event_type = 'click' THEN event_id END
      |        IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY tus, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS src_id,
      |    last_value(CASE WHEN event_type = 'click' THEN tus END
      |        IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY tus, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS src_tus
      |  FROM e)
      |SELECT event_id, user_id,
      |  CASE WHEN tus - src_tus <= 3600000000 THEN src_id END
      |    AS attributed_id,
      |  CASE WHEN tus - src_tus <= 3600000000
      |    THEN (tus - src_tus) // 1000000 END AS gap_s
      |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  // ── q122: binary sign-bit vector quantization ──────────────────────────

  /** q122: 64-dim embeddings collapsed to one int64 sign code plus its
    * popcount — the 256× compression that feeds Hamming candidate
    * generation (q109's pigeonhole search runs unchanged over these
    * codes; composition is spec-tested). */
  def q122SignCodes(s: SparkSession, dir: String): DataFrame = {
    val emb = Sources.embeddings(s, dir)
    VectorAggs.signCodes(emb, "vec_id", "embedding", dims = 64)
      .join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
      .select(col("vec_id"), col("code"), bit_count(col("code")).as("n_pos"),
        col("label"))
      .orderBy(col("vec_id"))
  }

  val q122Sql: String =
    """WITH c AS (SELECT vec_id, label,
      |    CAST(list_sum(list_transform(range(0, 64), i ->
      |      CASE WHEN embedding[i + 1] > 0 THEN
      |        CASE WHEN i = 63 THEN -9223372036854775807 - 1
      |             ELSE 1::BIGINT << i END
      |      ELSE 0 END)) AS BIGINT) AS code
      |  FROM embeddings)
      |SELECT vec_id, code, bit_count(code) AS n_pos, label
      |FROM c ORDER BY vec_id""".stripMargin

  // ── q123: incremental aggregate maintenance (IVM) ──────────────────────

  /** q123: a per-language (count, chars) materialized aggregate updated
    * from a snapshot diff — removed docs subtract, added docs add,
    * changed docs do both — and gate-compared against the oracle's
    * DIRECT aggregation of the new snapshot: the O(diff)-refresh law,
    * hash-verified. */
  def q123Ivm(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    def withKey(d: DataFrame): DataFrame =
      d.withColumn("graft_ck",
        concat_ws("|", col("text"), col("n_chars")))
    val a = withKey(docs)
    val changed = docs.filter(col("doc_id") % 11 =!= 0)
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" refreshed"))).otherwise(col("text")))
      .withColumn("n_chars", when(col("doc_id") % 7 === 0,
        col("n_chars") + 10).otherwise(col("n_chars")))
    val added = docs.filter(col("doc_id") % 11 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val b = withKey(changed.unionByName(added))
    val base = a.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("w_sum"))
    Snapshot.maintainAgg(base, a, b, "doc_id", "graft_ck", "lang", "n_chars")
      .orderBy(col("lang"))
  }

  val q123Sql: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN doc_id % 7 = 0 AND doc_id % 11 <> 0
      |    THEN n_chars + 10 ELSE n_chars END) AS BIGINT) AS w_sum
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ── q124: skip-gram co-occurrence mining ───────────────────────────────

  /** q124: top-20 unordered word pairs within ±2 positions — word2vec
    * context counting off shifted-slice zips, zero shuffle before the
    * pair-count agg. */
  def q124Skipgram(s: SparkSession, dir: String): DataFrame =
    graft.operators.Relevance.skipgramPairs(Sources.documents(s, dir),
        "text", window = 2, k = 20)

  val q124Sql: String =
    """WITH ws AS (SELECT string_split(text, ' ') AS w FROM documents),
      |p1 AS (SELECT unnest(list_transform(range(1, len(w)), j ->
      |         {'x': least(w[j], w[j+1]), 'y': greatest(w[j], w[j+1])})) AS u
      |       FROM ws WHERE len(w) >= 2),
      |p2 AS (SELECT unnest(list_transform(range(1, len(w) - 1), j ->
      |         {'x': least(w[j], w[j+2]), 'y': greatest(w[j], w[j+2])})) AS u
      |       FROM ws WHERE len(w) >= 3),
      |pr AS (SELECT u.x AS x, u.y AS y FROM p1
      |       UNION ALL SELECT u.x, u.y FROM p2)
      |SELECT x, y, COUNT(*) AS n FROM pr GROUP BY x, y
      |ORDER BY n DESC, x, y LIMIT 20""".stripMargin

  // ── q125: near-dup novelty scores ──────────────────────────────────────

  /** q125: per-document novelty (1 − max candidate Jaccard) over the
    * LSH candidate set — the graded dedup signal curation ranks by,
    * candidates collision-driven, never all-pairs. */
  def q125Novelty(s: SparkSession, dir: String): DataFrame =
    TextDedup.noveltyScores(Sources.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val q125Sql: String =
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
      |pairs AS (SELECT i.d1, i.d2,
      |    CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter) AS j
      |  FROM inter i JOIN sz s1 ON i.d1 = s1.doc_id
      |  JOIN sz s2 ON i.d2 = s2.doc_id),
      |sym AS (SELECT d1 AS doc_id, j FROM pairs
      |        UNION ALL SELECT d2, j FROM pairs),
      |ag AS (SELECT doc_id, MAX(j) AS mj, COUNT(*) AS n_candidates
      |       FROM sym GROUP BY doc_id)
      |SELECT d.doc_id, round(1.0 - COALESCE(ag.mj, 0.0), 6) AS novelty,
      |  COALESCE(ag.n_candidates, 0) AS n_candidates
      |FROM documents d LEFT JOIN ag USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  // ── q126: SCD type-2 intervalization ───────────────────────────────────

  /** q126: each user's event-type change log collapsed into validity
    * intervals with an is-current flag — the slowly-changing-dimension
    * build; one shuffle, two windows sharing the exchange. */
  def q126Scd2(s: SparkSession, dir: String): DataFrame =
    Snapshot.scd2(Sources.events(s, dir), "user_id", "event_type", "ts",
        "event_id")
      .orderBy(col("user_id"), col("valid_from_us"), col("event_id"))

  val q126Sql: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |    CAST(epoch_ns(ts) // 1000 AS BIGINT) AS tus FROM events),
      |c AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id
      |        ORDER BY tus, event_id) AS prev FROM e),
      |ch AS (SELECT event_id, user_id, event_type, tus FROM c
      |       WHERE prev IS NULL OR prev <> event_type),
      |iv AS (SELECT *, lead(tus) OVER (PARTITION BY user_id
      |         ORDER BY tus, event_id) AS vto FROM ch)
      |SELECT user_id, event_id, event_type, tus AS valid_from_us,
      |  vto AS valid_to_us, vto IS NULL AS is_current
      |FROM iv ORDER BY user_id, valid_from_us, event_id""".stripMargin

  // ── q127: per-stratum OLS trend lines ──────────────────────────────────

  /** q127: slope/intercept of quality (alpha ratio) on length per
    * language — per-group regression from mergeable decimal sufficient
    * statistics, one corpus hash-agg. */
  def q127GroupOls(s: SparkSession, dir: String): DataFrame = {
    val alpha = TextAnalysis.qualityCols(col("text")).toMap.apply("alpha_ratio")
    val docs = Sources.documents(s, dir)
      .select(col("lang"), col("n_chars"), round(alpha, 6).as("alpha_ratio"))
    Standardize.groupOls(docs, "n_chars", "alpha_ratio", "lang")
      .orderBy(col("lang"))
  }

  val q127Sql: String =
    """WITH q AS (SELECT lang, n_chars,
      |    round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
      |      AS DOUBLE) / length(text), 6) AS ar
      |  FROM documents),
      |st AS (SELECT lang, COUNT(*) AS n,
      |    SUM(CAST(round(CAST(n_chars AS DOUBLE), 6) AS DECIMAL(28,6))) AS sx,
      |    SUM(CAST(round(ar, 6) AS DECIMAL(28,6))) AS sy,
      |    SUM(CAST(round(CAST(n_chars AS DOUBLE) * ar, 6)
      |      AS DECIMAL(28,6))) AS sxy,
      |    SUM(CAST(round(CAST(n_chars AS DOUBLE) * CAST(n_chars AS DOUBLE), 6)
      |      AS DECIMAL(28,6))) AS sxx
      |  FROM q GROUP BY lang),
      |sl AS (SELECT lang, n, sx, sy,
      |    round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope
      |  FROM st)
      |SELECT lang, n, slope,
      |  round((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
      |    / CAST(n AS DOUBLE), 6) AS intercept
      |FROM sl ORDER BY lang""".stripMargin

  // ── q128: token-weighted percentiles ───────────────────────────────────

  /** q128: per-language token-weighted length percentiles — "the median
    * TOKEN lives in a document of length…", the corpus-budget view of
    * length, same integer-exact crossing test over cumulative weight. */
  def q128WeightedPct(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
      .select(col("lang"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("graft_w"))
    Histogram.weightedQuantizedPercentiles(docs, "n_chars", "graft_w",
        "lang", bits = 12, pcts = Seq(50, 90, 99))
      .orderBy(col("lang"), col("pct"))
  }

  val q128Sql: String =
    """WITH s AS (SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx
      |           FROM documents),
      |b AS (SELECT lang, len(string_split(text, ' ')) AS wgt,
      |        CASE WHEN s.mx = s.mn THEN 0
      |          ELSE ((n_chars - s.mn) * 4095) // (s.mx - s.mn) END AS bucket
      |      FROM documents CROSS JOIN s),
      |c AS (SELECT lang, bucket, CAST(SUM(wgt) AS BIGINT) AS cnt
      |      FROM b GROUP BY 1, 2),
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

  // ── q129: reciprocal-rank fusion (hybrid retrieval) ────────────────────

  /** q129: BM25 lexical top-50 fused with dense cosine top-50 by RRF —
    * hybrid search's standard calibration-free combiner; both input
    * lists are already-cut top-k, so the fusion is metadata-scale. */
  def q129Rrf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Sources.documents(s, dir)
    val queries = Seq((1, "stream"), (1, "window"), (1, "batch"))
      .toDF("query_id", "term")
    val bm = Relevance.bm25RetrieveAll(docs, "doc_id", "text", queries,
      "query_id", k = 50, k1 = 1.5, b = 0.75)
    // rank windows run over the ALREADY-CUT top-50 lists (metadata scale)
    val wA = org.apache.spark.sql.expressions.Window
      .orderBy(col("bm25").desc, col("doc_id"))
    val rankA = bm.select(col("doc_id"), row_number().over(wA).as("rank"))
    val e = Sources.embeddings(s, dir)
    val q0 = e.filter(col("vec_id") === 0)
      .select(col("embedding")).head.getSeq[Float](0).map(_.toDouble)
    val cosAll = e.select(col("vec_id").as("doc_id"),
      round(Similarity.cosine(col("embedding"),
        array(q0.map(lit): _*)), 6).as("cosine"))
    val top50 = cosAll.orderBy(col("cosine").desc, col("doc_id")).limit(50)
    val wB = org.apache.spark.sql.expressions.Window
      .orderBy(col("cosine").desc, col("doc_id"))
    val rankB = top50.select(col("doc_id"), row_number().over(wB).as("rank"))
    Relevance.rrfFuse(Seq(rankA, rankB), "doc_id", "rank",
      kRrf = 60, topN = 20)
  }

  val q129Sql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |dl AS (SELECT doc_id, len(w) AS dl FROM w),
      |t AS (SELECT doc_id, unnest(w) AS term FROM w),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM t
      |       WHERE term IN ('stream', 'window', 'batch') GROUP BY 1, 2),
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
      |  CROSS JOIN corpus c),
      |qs AS (SELECT doc_id, CAST(SUM(contrib) AS DOUBLE) AS bm25
      |       FROM sc GROUP BY 1),
      |ra AS (SELECT doc_id, row_number() OVER (
      |         ORDER BY bm25 DESC, doc_id) AS rnk FROM qs),
      |qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |cs AS (SELECT vec_id AS doc_id, round(
      |    list_sum(list_transform(range(1, len(embedding) + 1),
      |      i -> embedding[i]::DOUBLE * qv[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
      |       i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, len(qv) + 1),
      |       i -> qv[i]::DOUBLE * qv[i]::DOUBLE)))), 6) AS cosine
      |  FROM embeddings, qv),
      |rb AS (SELECT doc_id, row_number() OVER (
      |         ORDER BY cosine DESC, doc_id) AS rnk FROM cs),
      |co AS (SELECT doc_id, CAST(round(1.0 / (60 + rnk), 6)
      |         AS DECIMAL(18,6)) AS c
      |       FROM ra WHERE rnk <= 50
      |       UNION ALL
      |       SELECT doc_id, CAST(round(1.0 / (60 + rnk), 6)
      |         AS DECIMAL(18,6))
      |       FROM rb WHERE rnk <= 50)
      |SELECT doc_id, round(CAST(SUM(c) AS DOUBLE), 6) AS rrf,
      |  COUNT(*) AS n_lists
      |FROM co GROUP BY doc_id
      |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin

  // ── q130: bigram language-model quality ────────────────────────────────

  /** q130: mean add-one-smoothed corpus-bigram log-probability per doc —
    * the next-word-predictability quality signal; pairs from one
    * zip_with, term-keyed joins, decimal-exact sums. */
  def q130BigramLm(s: SparkSession, dir: String): DataFrame =
    Relevance.bigramLogProb(Sources.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val q130Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |pr AS (SELECT doc_id, unnest(list_transform(range(1, len(w)), j ->
      |         {'x': w[j], 'y': w[j+1]})) AS u
      |       FROM ws WHERE len(w) >= 2),
      |p AS (SELECT doc_id, u.x AS x, u.y AS y FROM pr),
      |cxy AS (SELECT x, y, count(*) AS c_xy FROM p GROUP BY 1, 2),
      |tt AS (SELECT unnest(string_split(text, ' ')) AS x FROM documents),
      |cx AS (SELECT x, count(*) AS c_x FROM tt GROUP BY 1),
      |v AS (SELECT count(*) AS v FROM cx),
      |tm AS (SELECT p.doc_id,
      |    CAST(round(ln(CAST(c.c_xy + 1 AS DOUBLE)
      |      / CAST(u.c_x + v.v AS DOUBLE)), 6) AS DECIMAL(18,6)) AS term
      |  FROM p JOIN cxy c USING (x, y) JOIN cx u USING (x) CROSS JOIN v),
      |agg AS (SELECT doc_id, COUNT(*) AS n_bigrams,
      |          CAST(SUM(term) * 1000000 AS BIGINT) AS sm
      |        FROM tm GROUP BY doc_id)
      |SELECT doc_id, n_bigrams,
      |  CASE WHEN sm < 0 THEN -((2 * (-sm) + n_bigrams) // (2 * n_bigrams))
      |       ELSE (2 * sm + n_bigrams) // (2 * n_bigrams)
      |  END AS avg_logp_micro
      |FROM agg ORDER BY doc_id""".stripMargin

  // ── q131: kNN label propagation audit ──────────────────────────────────

  /** q131: every 10th vector's label re-predicted by 5-NN majority vote
    * among the rest — the weak-supervision labeler and, on held-out
    * labeled rows, the standard label-quality audit. */
  def q131KnnLabels(s: SparkSession, dir: String): DataFrame =
    VectorAggs.knnPredict(Sources.embeddings(s, dir), "vec_id",
        "embedding", "label", col("vec_id") % 10 === 0, k = 5)
      .withColumn("is_correct", col("predicted_label") === col("true_label"))
      .orderBy(col("vec_id"))

  val q131Sql: String =
    """WITH q AS (SELECT vec_id AS q_id, embedding AS qv, label AS true_label
      |           FROM embeddings WHERE vec_id % 10 = 0),
      |sc AS (SELECT q.q_id, q.true_label, e.vec_id AS nid,
      |         e.label AS nlabel,
      |         round(
      |           list_sum(list_transform(range(1, len(e.embedding) + 1),
      |             i -> e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE)) /
      |           (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
      |              i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) *
      |            sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
      |              i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))), 6) AS c
      |       FROM embeddings e CROSS JOIN q WHERE e.vec_id % 10 <> 0),
      |rk AS (SELECT *, row_number() OVER (PARTITION BY q_id
      |         ORDER BY c DESC, nid) AS rn FROM sc),
      |vt AS (SELECT q_id, true_label, nlabel, COUNT(*) AS n_votes
      |       FROM rk WHERE rn <= 5 GROUP BY 1, 2, 3),
      |mj AS (SELECT *, row_number() OVER (PARTITION BY q_id
      |         ORDER BY n_votes DESC, nlabel) AS mr FROM vt)
      |SELECT q_id AS vec_id, nlabel AS predicted_label, n_votes,
      |  true_label, nlabel = true_label AS is_correct
      |FROM mj WHERE mr = 1 ORDER BY vec_id""".stripMargin

  // ── q132: leakage-cleaned eval split ───────────────────────────────────

  /** q132: the test split with every document near-dupping a TRAIN
    * document removed — the fix for what q114 reports; an eval set that
    * exact per-split dedup would silently leave contaminated. */
  def q132CleanSplit(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    val splits = Sampling.deterministicSplit(docs.select(col("doc_id")),
      "doc_id", "split",
      Seq(("train", 204), ("val", 230), ("test", 256)))
    val pairs = TextDedup.minHashLshPairs(docs, "doc_id", "text",
      k = 16, r = 4, w = 3, threshold = 0.5)
    val sym = pairs.select(explode(array(
        struct(col("d1").as("id"), col("d2").as("other")),
        struct(col("d2").as("id"), col("d1").as("other")))).as("c"))
      .select(col("c.id").as("doc_id"), col("c.other").as("other"))
    val leaky = sym
      .join(splits, Seq("doc_id"))
      .filter(col("split") === "test")
      .join(splits.select(col("doc_id").as("other"),
        col("split").as("graft_osplit")), Seq("other"))
      .filter(col("graft_osplit") === "train")
      .select(col("doc_id")).distinct()
    splits.filter(col("split") === "test")
      .join(leaky, Seq("doc_id"), "left_anti")
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  val q132Sql: String =
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
      |pairs AS (SELECT i.d1, i.d2
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
      |    FROM documents)),
      |sym AS (SELECT d1 AS id, d2 AS other FROM pairs
      |        UNION ALL SELECT d2, d1 FROM pairs),
      |leak AS (SELECT DISTINCT sym.id AS doc_id FROM sym
      |         JOIN sp a ON sym.id = a.doc_id AND a.split = 'test'
      |         JOIN sp b ON sym.other = b.doc_id AND b.split = 'train')
      |SELECT sp.doc_id FROM sp
      |WHERE sp.split = 'test'
      |  AND sp.doc_id NOT IN (SELECT doc_id FROM leak)
      |ORDER BY sp.doc_id""".stripMargin

  // ── q133: entity-resolution blocking ───────────────────────────────────

  /** q133: user pairs sharing ≥2 distinct (event_type, 6-dp value)
    * behavioral fingerprints (fingerprints seen by ≤10 users) — the
    * alias-detection blocking pass; inverted-index join, never all-pairs
    * users. */
  def q133EntityPairs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, StringType}
    val fp = Sources.events(s, dir)
      .select(col("user_id"), concat_ws("|", col("event_type"),
        round(col("value"), 6).cast(DecimalType(18, 6)).cast(StringType))
        .as("fp"))
    EntityResolution.sharedFingerprintPairs(fp, "user_id", "fp",
        minShared = 2, maxDf = 10)
      .orderBy(col("e1"), col("e2"))
  }

  val q133Sql: String =
    """WITH p AS (SELECT DISTINCT user_id,
      |    event_type || '|' ||
      |      CAST(CAST(round(value, 6) AS DECIMAL(18,6)) AS VARCHAR) AS fp
      |  FROM events),
      |d AS (SELECT fp FROM p GROUP BY fp
      |      HAVING count(*) >= 2 AND count(*) <= 10),
      |f AS (SELECT p.user_id, p.fp FROM p JOIN d USING (fp)),
      |pr AS (SELECT a.user_id AS e1, b.user_id AS e2, count(*) AS n_shared
      |       FROM f a JOIN f b ON a.fp = b.fp AND a.user_id < b.user_id
      |       GROUP BY 1, 2)
      |SELECT e1, e2, n_shared FROM pr WHERE n_shared >= 2
      |ORDER BY e1, e2""".stripMargin

  // ── q134: session-quality rollup ───────────────────────────────────────

  /** q134: per-user session metrics — session count, bounce (single-
    * event) sessions and rate, total in-session dwell — the engagement
    * rollup over the Sessionize assignment; one window pass + two
    * aggs. */
  def q134SessionMetrics(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sessionize
    val sess = Sessionize.sessions(Sources.events(s, dir), Seq("user_id"),
      "ts", gapSeconds = 1800L, tiebreak = Seq(col("event_id")))
    sess.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"),
        round(sum(when(col("n_events") === 1, 1L).otherwise(0L))
          .cast(DoubleType) / count(lit(1)), 6).as("bounce_rate"),
        sum(unix_micros(col("session_end")) -
          unix_micros(col("session_start"))).as("total_dur_us"))
      .orderBy(col("user_id"))
  }

  val q134Sql: String =
    """WITH e AS (SELECT event_id, user_id,
      |    CAST(epoch_ns(ts) // 1000 AS BIGINT) AS tus FROM events),
      |f AS (SELECT *, CASE WHEN
      |        lag(tus) OVER (PARTITION BY user_id
      |          ORDER BY tus, event_id) IS NULL
      |        OR tus - lag(tus) OVER (PARTITION BY user_id
      |          ORDER BY tus, event_id) > 1800000000
      |      THEN 1 ELSE 0 END AS nf FROM e),
      |ses AS (SELECT user_id, tus,
      |    CAST(SUM(nf) OVER (PARTITION BY user_id ORDER BY tus, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS sid
      |  FROM f),
      |sr AS (SELECT user_id, sid, COUNT(*) AS n_events,
      |         MIN(tus) AS st, MAX(tus) AS en
      |       FROM ses GROUP BY 1, 2)
      |SELECT user_id, COUNT(*) AS n_sessions,
      |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_bounce,
      |  round(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / COUNT(*), 6) AS bounce_rate,
      |  CAST(SUM(en - st) AS BIGINT) AS total_dur_us
      |FROM sr GROUP BY user_id ORDER BY user_id""".stripMargin

  // ── q135: KMV distinct-count sketch ────────────────────────────────────

  /** q135: per-source KMV(16) distinct-text estimates plus a global
    * estimate computed from the MERGED per-source sketches (never
    * rescanning the corpus) — the deterministic, oracle-checkable
    * cardinality sketch q33's HLL can't be; exact counts ride along as
    * the gate companion. */
  def q135KmvDistinct(s: SparkSession, dir: String): DataFrame = {
    val k = 16
    val docs = Sources.documents(s, dir).select(col("source"), col("text"))
    val perSource = Sketches.kmvSketch(docs, "text", "source", k)
    val global = Sketches.kmvMerge(
      Seq(perSource.withColumn("source", lit("ALL"))), "source", k)
    val est = Sketches.kmvEstimate(perSource.unionByName(global), "source", k)
    val exact = docs.groupBy(col("source"))
      .agg(count_distinct(col("text")).as("n_exact"))
      .unionByName(docs.agg(count_distinct(col("text")).as("n_exact"))
        .withColumn("source", lit("ALL"))
        .select(col("source"), col("n_exact")))
    exact.join(est, Seq("source"))
      .select(col("source"), col("n_exact"), col("n_kept"), col("h_k"),
        col("est_distinct"))
      .orderBy(col("source"))
  }

  val q135Sql: String =
    """WITH h AS (SELECT DISTINCT source,
      |    CAST(list_sum(list_transform(range(1, 9), j ->
      |      (strpos('0123456789abcdef', substr(md5(text), j, 1)) - 1)
      |        * (1::BIGINT << (4 * (8 - j))))) AS BIGINT) AS h
      |  FROM documents),
      |hd AS (SELECT DISTINCT source, h FROM
      |       (SELECT source, h FROM h UNION ALL SELECT 'ALL', h FROM h)),
      |rk AS (SELECT source, h, row_number() OVER (PARTITION BY source
      |         ORDER BY h) AS rn FROM hd),
      |sk AS (SELECT source, count(*) AS n_kept, max(h) AS h_k
      |       FROM rk WHERE rn <= 16 GROUP BY source),
      |ex AS (SELECT source, count(DISTINCT text) AS n_exact
      |       FROM documents GROUP BY source
      |       UNION ALL
      |       SELECT 'ALL', count(DISTINCT text) FROM documents)
      |SELECT sk.source, ex.n_exact, sk.n_kept,
      |  CASE WHEN sk.n_kept = 16 THEN sk.h_k END AS h_k,
      |  CASE WHEN sk.n_kept = 16
      |    THEN round(64424509440.0 / sk.h_k, 6) END AS est_distinct
      |FROM sk JOIN ex USING (source) ORDER BY sk.source""".stripMargin

  // ── q136: dedup-graph triangles / clustering coefficients ──────────────

  /** q136: per-document triangle counts and clustering coefficients over
    * the LSH near-dup graph — template families are triangle-dense,
    * revision chains triangle-free; the cohesion signal that picks the
    * survivor policy. */
  def q136Triangles(s: SparkSession, dir: String): DataFrame = {
    val pairs = TextDedup.minHashLshPairs(Sources.documents(s, dir),
      "doc_id", "text", k = 16, r = 4, w = 3, threshold = 0.5)
    graft.operators.Graph.triangleCounts(pairs, "d1", "d2")
      .orderBy(col("node"))
  }

  // wraps the ONE canonical LSH oracle chain (q19Sql) — a parameter
  // change there propagates here, instead of a drifting inline copy
  val q136Sql: String =
    s"""WITH pairs AS (
      |  SELECT d1, d2 FROM (
      |${PipelineQueries.q19Sql}
      |  )),
      |tri AS (SELECT ab.d1 AS a, ab.d2 AS b, bc.d2 AS c
      |        FROM pairs ab JOIN pairs bc ON ab.d2 = bc.d1
      |        JOIN pairs ac ON ac.d1 = ab.d1 AND ac.d2 = bc.d2),
      |tn AS (SELECT x AS node, count(*) AS n_triangles FROM (
      |         SELECT a AS x FROM tri UNION ALL SELECT b FROM tri
      |         UNION ALL SELECT c FROM tri) GROUP BY 1),
      |dg AS (SELECT x AS node, count(*) AS degree FROM (
      |         SELECT d1 AS x FROM pairs UNION ALL SELECT d2 FROM pairs)
      |       GROUP BY 1)
      |SELECT dg.node, dg.degree,
      |  COALESCE(tn.n_triangles, 0) AS n_triangles,
      |  CASE WHEN dg.degree >= 2 THEN
      |    round(2.0 * COALESCE(tn.n_triangles, 0)
      |      / (dg.degree * (dg.degree - 1)), 6) END AS clustering_coeff
      |FROM dg LEFT JOIN tn USING (node) ORDER BY dg.node""".stripMargin

  // ── q137: Otsu auto-threshold on quality ───────────────────────────────

  /** q137: the quality-score cut maximizing between-class variance over
    * the 8-bit score histogram — the data-driven threshold for curation
    * filters; one corpus pass, metadata-scale argmax, integer-exact up
    * to one final division. */
  def q137Otsu(s: SparkSession, dir: String): DataFrame = {
    val alpha = TextAnalysis.qualityCols(col("text")).toMap.apply("alpha_ratio")
    val docs = Sources.documents(s, dir)
      .select(round(alpha * 1000000.0, 0).cast("long").as("q"))
    Histogram.otsuThreshold(docs, "q", bits = 8, mn = 0L, mx = 1000000L)
      .orderBy(col("threshold_bucket"))
  }

  val q137Sql: String =
    """WITH q AS (SELECT CAST(round(
      |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
      |      / length(text) * 1000000.0, 0) AS BIGINT) AS v
      |  FROM documents),
      |c AS (SELECT (LEAST(GREATEST(v, 0), 1000000) * 255) // 1000000
      |        AS bucket, COUNT(*) AS n
      |      FROM q GROUP BY 1),
      |cm AS (SELECT bucket, n,
      |    CAST(SUM(n) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND CURRENT ROW) AS BIGINT) AS w0,
      |    CAST(SUM(bucket * n) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND CURRENT ROW) AS BIGINT) AS s0,
      |    CAST(SUM(n) OVER () AS BIGINT) AS wt,
      |    CAST(SUM(bucket * n) OVER () AS BIGINT) AS st
      |  FROM c),
      |sc AS (SELECT bucket, w0, wt - w0 AS w1, s0, st - s0 AS s1
      |       FROM cm WHERE w0 > 0 AND wt - w0 > 0),
      |bv AS (SELECT bucket, w0, w1,
      |    round(CAST(s0 * w1 - s1 * w0 AS DOUBLE)
      |      * CAST(s0 * w1 - s1 * w0 AS DOUBLE)
      |      / CAST(w0 * w1 AS DOUBLE), 6) AS between_var
      |  FROM sc),
      |rk AS (SELECT *, row_number() OVER (
      |         ORDER BY between_var DESC, bucket) AS r FROM bv)
      |SELECT bucket AS threshold_bucket,
      |  ((bucket + 1) * 1000000) // 255 AS threshold_value,
      |  between_var, w0, w1
      |FROM rk WHERE r = 1 ORDER BY threshold_bucket""".stripMargin

  // ── q173: MAD robust outliers ──────────────────────────────────────────

  /** q173: per-lang median-absolute-deviation outlier audit over doc
    * length — lower medians are exact row_number selections, so with an
    * integer column the whole operator is int64-exact (no float rules
    * at all); two window passes + two metadata joins. */
  def q173MadOutliers(s: SparkSession, dir: String): DataFrame =
    Standardize.madOutliers(Sources.documents(s, dir), "n_chars",
        "doc_id", "lang", k = 3L)
      .orderBy(col("lang"))

  val q173Sql: String =
    """WITH b AS (SELECT lang, doc_id, n_chars AS x FROM documents),
      |m AS (SELECT lang, x AS med FROM (
      |        SELECT lang, x, doc_id,
      |          row_number() OVER (PARTITION BY lang ORDER BY x, doc_id)
      |            AS rn,
      |          count(*) OVER (PARTITION BY lang) AS np
      |        FROM b) WHERE rn = (np + 1) // 2),
      |d AS (SELECT b.lang, b.doc_id, b.x, m.med, abs(b.x - m.med) AS dev
      |      FROM b JOIN m USING (lang)),
      |md AS (SELECT lang, dev AS mad FROM (
      |         SELECT lang, dev, doc_id,
      |           row_number() OVER (PARTITION BY lang ORDER BY dev, doc_id)
      |             AS rn,
      |           count(*) OVER (PARTITION BY lang) AS np
      |         FROM d) WHERE rn = (np + 1) // 2)
      |SELECT d.lang, count(*) AS n, max(d.med) AS med, max(md.mad) AS mad,
      |  CAST(SUM(CASE WHEN d.dev > 3 * md.mad THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_outliers
      |FROM d JOIN md USING (lang) GROUP BY d.lang ORDER BY d.lang""".stripMargin

  // ── q174: frequent co-occurring pairs ──────────────────────────────────

  /** q174: word pairs co-occurring in ≥ half of all documents, with
    * lift over independence — level-2 Apriori: the pair fan-out runs
    * over each doc's FREQUENT words only, support compares are integer
    * cross-products, lift an int64-products ratio. */
  def q174FrequentPairs(s: SparkSession, dir: String): DataFrame =
    Itemsets.frequentPairs(Sources.documents(s, dir), "doc_id", "text",
        supNum = 1, supDen = 2)
      .orderBy(col("w1"), col("w2"))

  val q174Sql: String =
    """WITH dw AS (SELECT DISTINCT doc_id,
      |    unnest(string_split(text, ' ')) AS w FROM documents),
      |nd AS (SELECT count(*) AS n FROM documents),
      |wc AS (SELECT w, count(*) AS wn FROM dw GROUP BY w),
      |fw AS (SELECT w, wn FROM wc, nd WHERE wn * 2 >= n * 1),
      |fdw AS (SELECT dw.doc_id, dw.w FROM dw JOIN fw ON dw.w = fw.w),
      |p AS (SELECT a.w AS w1, b.w AS w2, count(*) AS n_both
      |      FROM fdw a JOIN fdw b ON a.doc_id = b.doc_id AND a.w < b.w
      |      GROUP BY 1, 2)
      |SELECT p.w1, p.w2, CAST(p.n_both AS BIGINT) AS n_both,
      |  round(CAST(p.n_both * nd.n AS DOUBLE)
      |    / CAST(f1.wn * f2.wn AS DOUBLE), 6) AS lift
      |FROM p
      |JOIN fw f1 ON p.w1 = f1.w
      |JOIN fw f2 ON p.w2 = f2.w
      |CROSS JOIN nd
      |WHERE p.n_both * 2 >= nd.n * 1
      |ORDER BY p.w1, p.w2""".stripMargin

  // ── q178: winnowing fingerprints ───────────────────────────────────────

  /** q178: MOSS winnowing over word 3-grams, window 4 — per doc: how
    * many fingerprints the guarantee-bearing selection keeps (any shared
    * run of ≥ 6 words leaves a common fingerprint); one positional
    * window min + distinct, md5-deterministic. */
  def q178Winnowing(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnowedFingerprints(Sources.documents(s, dir), "doc_id",
        "text", w = 3, winnow = 4)
      .orderBy(col("doc_id"))

  val q178Sql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
      |           FROM documents),
      |g AS (SELECT doc_id,
      |        unnest(list_transform(range(0, len(ws) - 2), i ->
      |          {'pos': i, 'g': array_to_string(ws[i+1:i+3], ' ')})) AS s
      |      FROM t),
      |p AS (SELECT doc_id, s.pos AS pos,
      |        CAST(list_sum(list_transform(range(1, 11), j ->
      |          (strpos('0123456789abcdef', substr(md5(s.g), j, 1)) - 1)
      |          * (1::BIGINT << (4 * (10 - j))))) AS BIGINT) * 1048576 + s.pos AS enc
      |      FROM g),
      |m AS (SELECT doc_id, pos,
      |        min(enc) OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mn,
      |        count(*) OVER (PARTITION BY doc_id) AS n
      |      FROM p),
      |d AS (SELECT DISTINCT doc_id, mn FROM m WHERE pos <= n - 4)
      |SELECT doc_id, count(*) AS n_fingerprints,
      |  CAST(SUM(mn // 1048576) AS BIGINT) AS fp_sum, min(mn) AS fp_min
      |FROM d GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ── q180: Gini concentration ───────────────────────────────────────────

  /** q180: per-source Gini coefficient over doc lengths — "is one
    * producer dominating the bytes"; int64 rank-weighted sums, one
    * closing ratio. */
  def q180Gini(s: SparkSession, dir: String): DataFrame =
    Profiling.giniConcentration(Sources.documents(s, dir), "n_chars",
        "doc_id", "source")
      .orderBy(col("source"))

  val q180Sql: String =
    """WITH r AS (SELECT source, n_chars AS x,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id) AS i
      |  FROM documents),
      |a AS (SELECT source, count(*) AS n,
      |        CAST(SUM(x) AS BIGINT) AS sx,
      |        CAST(SUM(i * x) AS BIGINT) AS six
      |      FROM r GROUP BY source)
      |SELECT source, n, sx AS total,
      |  CASE WHEN sx > 0 THEN round(
      |    CAST(2 * six - (n + 1) * sx AS DOUBLE)
      |      / CAST(n * sx AS DOUBLE), 6) END AS gini
      |FROM a ORDER BY source""".stripMargin

  // ── q182: bootstrap confidence interval ────────────────────────────────

  /** q182: deterministic Poissonized-bootstrap 95% CI for mean doc
    * length per lang — 40 md5-seeded replicas, int64 weighted sums,
    * exact rank selection of the 2nd/39th replica means. */
  def q182BootstrapCI(s: SparkSession, dir: String): DataFrame =
    Profiling.bootstrapMeanCI(Sources.documents(s, dir), "n_chars",
        "doc_id", "lang", salt = "bs", nReplicas = 40)
      .orderBy(col("lang"))

  val q182Sql: String =
    """WITH r AS (SELECT lang, doc_id, n_chars,
      |    unnest(range(0, 40)) AS b FROM documents),
      |u AS (SELECT lang, doc_id, n_chars, b,
      |        (CAST(list_sum(list_transform(range(1, 13), j ->
      |          (strpos('0123456789abcdef', substr(md5('bs'
      |             || CAST(b AS VARCHAR) || '_'
      |             || CAST(doc_id AS VARCHAR)), j, 1)) - 1)
      |          * (1::BIGINT << (4 * (12 - j))))) AS BIGINT) + 1)
      |          / 281474976710656.0 AS uu
      |      FROM r),
      |w AS (SELECT lang, b, n_chars,
      |        CASE WHEN uu < 0.36787944117144233 THEN 0
      |             WHEN uu < 0.7357588823428847 THEN 1
      |             WHEN uu < 0.9196986029286058 THEN 2
      |             WHEN uu < 0.9810118431238462 THEN 3
      |             WHEN uu < 0.9963401531726563 THEN 4
      |             WHEN uu < 0.9994058151824183 THEN 5
      |             ELSE 6 END AS w
      |      FROM u),
      |m AS (SELECT lang, b, CAST(SUM(w * n_chars) AS BIGINT) AS swx,
      |        CAST(SUM(w) AS BIGINT) AS sw
      |      FROM w GROUP BY 1, 2),
      |mm AS (SELECT lang, b, CAST(swx AS DOUBLE) / sw AS mean
      |       FROM m WHERE sw > 0),
      |rk AS (SELECT lang, mean,
      |         row_number() OVER (PARTITION BY lang ORDER BY mean, b)
      |           AS rn
      |       FROM mm),
      |ci AS (SELECT lang, min(CASE WHEN rn = 2 THEN mean END) AS lo,
      |         min(CASE WHEN rn = 39 THEN mean END) AS hi
      |       FROM rk GROUP BY lang),
      |pt AS (SELECT lang, count(*) AS n,
      |         CAST(SUM(n_chars) AS BIGINT) AS sx
      |       FROM documents GROUP BY lang)
      |SELECT pt.lang, pt.n, round(CAST(pt.sx AS DOUBLE) / pt.n, 6) AS mean,
      |  round(ci.lo, 6) AS ci_lo, round(ci.hi, 6) AS ci_hi
      |FROM pt JOIN ci ON pt.lang = ci.lang ORDER BY pt.lang""".stripMargin

  // ── q183: k-anonymity audit ────────────────────────────────────────────

  /** q183: equivalence classes of (lang, source, length-bucket) with
    * fewer than 5 members and their l-diversity — the
    * re-identification risk report before a corpus release. */
  def q183KAnonymity(s: SparkSession, dir: String): DataFrame =
    Profiling.kAnonymityAudit(
        Sources.documents(s, dir).withColumn("len_bucket",
          call_function("div", col("n_chars"), lit(100L)))
          .withColumn("graft_sv",
            element_at(split(col("text"), " "), 1)),
        Seq("lang", "source", "len_bucket"), "graft_sv", k = 5L)
      .orderBy(col("lang"), col("source"), col("len_bucket"))

  val q183Sql: String =
    """WITH q AS (SELECT lang, source, n_chars // 100 AS len_bucket,
      |    string_split(text, ' ')[1] AS sv FROM documents)
      |SELECT lang, source, len_bucket, count(*) AS n,
      |  count(DISTINCT sv) AS l_diversity
      |FROM q GROUP BY 1, 2, 3 HAVING count(*) < 5
      |ORDER BY 1, 2, 3""".stripMargin

  // ── q187: Benford first-digit audit ────────────────────────────────────

  /** q187: per-event-type Benford audit of `value` — observed vs
    * expected leading-digit counts and per-digit χ² contributions;
    * digits come from the integer cent representation (no float
    * formatting), zero-observation digits ride the spine. */
  def q187Benford(s: SparkSession, dir: String): DataFrame =
    Profiling.benfordAudit(Sources.events(s, dir), "value", "event_type")
      .orderBy(col("event_type"), col("digit"))

  val q187Sql: String =
    """WITH v AS (SELECT event_type,
      |    CAST(round(abs(value) * 100.0, 0) AS BIGINT) AS cents
      |  FROM events),
      |o AS (SELECT event_type,
      |        CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
      |          AS digit,
      |        count(*) AS obs
      |      FROM v WHERE cents >= 1 GROUP BY 1, 2),
      |t AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS n
      |      FROM o GROUP BY 1),
      |sp AS (SELECT event_type, n, unnest(range(1, 10)) AS digit FROM t),
      |j AS (SELECT sp.event_type, sp.digit, sp.n,
      |        CAST(coalesce(o.obs, 0) AS BIGINT) AS n_obs,
      |        CAST(sp.n AS DOUBLE) * log10(1.0 + 1.0 / sp.digit) AS e
      |      FROM sp LEFT JOIN o ON sp.event_type = o.event_type
      |        AND sp.digit = o.digit)
      |SELECT event_type, digit, n, n_obs, round(e, 6) AS n_expected,
      |  round((n_obs - e) * (n_obs - e) / e, 6) AS chi2_term
      |FROM j ORDER BY event_type, digit""".stripMargin

  // ── q188: χ² categorical drift ─────────────────────────────────────────

  /** q188: per-source χ² homogeneity of the lang distribution against
    * the corpus-wide one — the categorical sibling of q146's KS test;
    * int64 counts, decimal term sums, zero cells on the spine. */
  def q188Chi2Drift(s: SparkSession, dir: String): DataFrame =
    Profiling.chiSquareDrift(Sources.documents(s, dir), "source", "lang")
      .orderBy(col("source"))

  val q188Sql: String =
    """WITH c AS (SELECT source, lang, count(*) AS o
      |           FROM documents GROUP BY 1, 2),
      |s AS (SELECT source, CAST(SUM(o) AS BIGINT) AS ns FROM c GROUP BY 1),
      |l AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS nc FROM c GROUP BY 1),
      |t AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM c),
      |sp AS (SELECT s.source, s.ns, l.lang, l.nc, t.n
      |       FROM s CROSS JOIN l CROSS JOIN t),
      |j AS (SELECT sp.source, sp.ns,
      |        CAST(sp.ns AS DOUBLE) * sp.nc / sp.n AS e,
      |        CAST(coalesce(c.o, 0) AS DOUBLE) AS o
      |      FROM sp LEFT JOIN c ON sp.source = c.source
      |        AND sp.lang = c.lang)
      |SELECT source, max(ns) AS n,
      |  CAST(count(*) - 1 AS BIGINT) AS dof,
      |  round(CAST(SUM(CAST(round((o - e) * (o - e) / e, 6)
      |    AS DECIMAL(18,6))) AS DOUBLE), 6) AS chi2
      |FROM j GROUP BY source ORDER BY source""".stripMargin
}
