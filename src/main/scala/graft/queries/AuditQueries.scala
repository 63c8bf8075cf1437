package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Profiling, Sampling, Standardize, TextAnalysis, TextDedup}
import graft.sources.Sources

/** Round-12 widening: the statistical-audit layer a curation pipeline
  * runs over its own metrics — vocabulary richness (Chao1), composition
  * diversity (Gini–Simpson), benchmark leakage (13-gram decontamination),
  * sampling uncertainty (hashed Poisson bootstrap), and distribution-free
  * two-sample drift (Mann–Whitney AUC, Kolmogorov–Smirnov) — every hashed
  * surface exact-integer by construction and nothing wider than BIGINT
  * (PORTABILITY.md rules 5–6). */
object AuditQueries {

  // ── q311: Chao1 vocabulary-richness lower bound ────────────────────────

  /** q311: per-language Chao1 richness ([[TextAnalysis.chao1Richness]],
    * Chao 1984) — how many word TYPES each language likely has beyond
    * the observed vocabulary, from the singleton/doubleton counts; the
    * type-count companion to q250's Good–Turing missing mass. */
  def q311Chao1(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chao1Richness(Sources.documents(s, dir), "text", "lang")
      .orderBy(col("lang"))

  val q311Sql: String =
    """WITH wc AS (SELECT lang, unnest(string_split(text, ' ')) AS w
      |            FROM documents),
      |cc AS (SELECT lang, w, COUNT(*) AS c FROM wc GROUP BY 1, 2),
      |a AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |        COUNT(*) AS n_types,
      |        CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
      |        CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
      |      FROM cc GROUP BY lang)
      |SELECT lang, n_tokens, n_types, f1, f2,
      |  CAST((2 * (2 * n_types::HUGEINT * (f2 + 1)
      |        + f1::HUGEINT * (f1 - 1)) * 1000000
      |      + 2 * (f2 + 1)::HUGEINT)
      |    // (2 * (2 * (f2 + 1))::HUGEINT) AS BIGINT) AS chao1_micro
      |FROM a ORDER BY lang""".stripMargin

  // ── q312: Gini–Simpson composition diversity ───────────────────────────

  /** q312: per-source Gini–Simpson index over language composition
    * ([[Profiling.giniSimpson]], Simpson 1949) — the probability two
    * documents drawn without replacement from a source differ in
    * language; the "is this crawl a monoculture" single number. */
  def q312GiniSimpson(s: SparkSession, dir: String): DataFrame =
    Profiling.giniSimpson(Sources.documents(s, dir), "source", "lang")
      .orderBy(col("source"))

  val q312Sql: String =
    """WITH cc AS (SELECT source, lang, COUNT(*) AS n FROM documents
      |            GROUP BY 1, 2),
      |a AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_rows,
      |        COUNT(*) AS n_categories,
      |        CAST(SUM(n::HUGEINT * (n - 1)) AS HUGEINT) AS same
      |      FROM cc GROUP BY source)
      |SELECT source, n_rows, n_categories,
      |  CASE WHEN n_rows >= 2 THEN
      |    CAST((2 * ((n_rows::HUGEINT * (n_rows - 1) - same) * 1000000)
      |        + n_rows::HUGEINT * (n_rows - 1))
      |      // (2 * n_rows::HUGEINT * (n_rows - 1)) AS BIGINT)
      |  END AS gini_simpson_micro
      |FROM a ORDER BY source""".stripMargin

  // ── q313: benchmark 13-gram decontamination ────────────────────────────

  /** q313: [[TextDedup.ngramDecontamination]] of every non-src0 document
    * against the src0 slice as a stand-in evaluation set (the GPT-3
    * appendix-C rule, Brown et al. 2020: any shared 13-gram flags the
    * training document) — the leakage audit that must precede trusting
    * any benchmark number. */
  def q313NgramDecontam(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    TextDedup.ngramDecontamination(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text", n = 13)
      .orderBy(col("doc_id"))
  }

  val q313Sql: String =
    """WITH ws AS (SELECT doc_id, source, string_split(text, ' ') AS w
      |            FROM documents),
      |sh AS (SELECT DISTINCT doc_id, source,
      |         array_to_string(w[i:i+12], ' ') AS s
      |       FROM (SELECT doc_id, source, w,
      |               unnest(range(1, len(w) - 11)) AS i
      |             FROM ws WHERE len(w) >= 13)),
      |b AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),
      |cs AS (SELECT doc_id, s FROM sh WHERE source <> 'src0'),
      |tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM cs GROUP BY 1),
      |hit AS (SELECT cs.doc_id, COUNT(*) AS n_contaminated
      |        FROM cs JOIN b USING (s) GROUP BY 1)
      |SELECT d.doc_id, COALESCE(tot.n_grams, 0) AS n_grams,
      |  COALESCE(hit.n_contaminated, 0) AS n_contaminated,
      |  COALESCE(hit.n_contaminated, 0) >= 1 AS is_contaminated
      |FROM documents d
      |LEFT JOIN tot USING (doc_id)
      |LEFT JOIN hit USING (doc_id)
      |WHERE d.source <> 'src0'
      |ORDER BY d.doc_id""".stripMargin

  // ── q314: hashed Poisson bootstrap CI for mean length ──────────────────

  /** q314: [[Sampling.poissonBootstrapMean]] of mean document length per
    * language (Chamandy 2012's one-pass Poisson bootstrap) — the
    * 5%-trimmed replicate band around each language's mean n_chars;
    * deterministic hash draws, so any engine reproduces the exact
    * interval. */
  def q314BootstrapMean(s: SparkSession, dir: String): DataFrame =
    Sampling.poissonBootstrapMean(Sources.documents(s, dir), "doc_id",
      "lang", "n_chars", salt = "pb12", reps = 20)

  val q314Sql: String = {
    val thresholds = Sampling.poissonThresholds48.mkString("[", ", ", "]")
    s"""WITH r AS (SELECT doc_id, lang, n_chars,
      |    unnest(range(0, 20)) AS rep FROM documents),
      |h AS (SELECT lang, n_chars, rep,
      |    CAST(list_sum(list_transform(range(1, 13), j ->
      |      (strpos('0123456789abcdef',
      |         substr(md5('pb12_' || CAST(rep AS VARCHAR) || '_'
      |           || CAST(doc_id AS VARCHAR)), j, 1)) - 1)
      |        * (1::BIGINT << (4 * (12 - j))))) AS BIGINT) AS h48
      |  FROM r),
      |w AS (SELECT lang, rep, n_chars,
      |    len(list_filter($thresholds, t -> h48 >= t)) AS wt
      |  FROM h),
      |rm AS (SELECT lang, rep,
      |    CASE WHEN SUM(wt) > 0 THEN
      |      CAST((2 * SUM(wt::HUGEINT * n_chars) * 1000000
      |          + SUM(wt)::HUGEINT)
      |        // (2 * SUM(wt)::HUGEINT) AS BIGINT) END AS m
      |  FROM w GROUP BY 1, 2),
      |pt AS (SELECT lang, COUNT(*) AS n_rows,
      |    CAST((2 * SUM(n_chars)::HUGEINT * 1000000 + COUNT(*))
      |      // (2 * COUNT(*)::HUGEINT) AS BIGINT) AS mean_micro
      |  FROM documents GROUP BY lang),
      |os AS (SELECT lang, m,
      |    row_number() OVER (PARTITION BY lang ORDER BY m) AS rn,
      |    COUNT(*) OVER (PARTITION BY lang) AS mn
      |  FROM rm WHERE m IS NOT NULL),
      |tr AS (SELECT lang, CAST(MAX(mn) AS BIGINT) AS n_reps,
      |    MAX(CASE WHEN rn = mn // 20 + 1 THEN m END) AS boot_lo_micro,
      |    MAX(CASE WHEN rn = mn - mn // 20 THEN m END) AS boot_hi_micro
      |  FROM os GROUP BY lang)
      |SELECT pt.lang, pt.n_rows, pt.mean_micro, tr.n_reps,
      |  tr.boot_lo_micro, tr.boot_hi_micro
      |FROM pt JOIN tr USING (lang)
      |ORDER BY pt.lang""".stripMargin
  }

  // ── q315: Mann–Whitney U / AUC between two languages ───────────────────

  /** q315: [[Standardize.mannWhitneyU]] on document length, en vs zh —
    * the exact doubled U statistic and its AUC reading P(len_en >
    * len_zh): the distribution-free stochastic-dominance answer a mean
    * comparison can't give under heavy tails. */
  def q315MannWhitney(s: SparkSession, dir: String): DataFrame =
    Standardize.mannWhitneyU(Sources.documents(s, dir), "n_chars",
      "lang", "en", "zh")

  val q315Sql: String =
    """WITH v AS (SELECT n_chars AS v,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ca,
      |    CAST(SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS cb
      |  FROM documents WHERE lang IN ('en', 'zh') GROUP BY 1),
      |c AS (SELECT v, ca, cb,
      |    SUM(cb) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
      |  FROM v)
      |SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b,
      |  CAST(SUM(ca * (2 * (cumb - cb) + cb)) AS BIGINT) AS u2_a,
      |  CASE WHEN SUM(ca) > 0 AND SUM(cb) > 0 THEN
      |    CAST((2 * SUM(ca * (2 * (cumb - cb) + cb))::HUGEINT * 1000000
      |        + 2 * SUM(ca)::HUGEINT * SUM(cb))
      |      // (2 * 2 * SUM(ca)::HUGEINT * SUM(cb)) AS BIGINT)
      |  END AS auc_micro
      |FROM c""".stripMargin

  // ── q316: Kolmogorov–Smirnov drift between two sources ─────────────────

  /** q316: [[Standardize.ksTwoSample]] on document length, src0 vs src1
    * — the exact sup-distance between the two length distributions as
    * an integer rational; the shape-sensitive drift companion to
    * q188's chi² and q249's W1. */
  def q316KsDrift(s: SparkSession, dir: String): DataFrame =
    Standardize.ksTwoSample(Sources.documents(s, dir), "n_chars",
      "source", "src0", "src1")

  val q316Sql: String =
    """WITH v AS (SELECT n_chars AS v,
      |    CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ca,
      |    CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS cb
      |  FROM documents WHERE source IN ('src0', 'src1') GROUP BY 1),
      |c AS (SELECT v, ca, cb,
      |    SUM(ca) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
      |    SUM(cb) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
      |  FROM v),
      |t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
      |        CAST(SUM(cb) AS BIGINT) AS nb FROM v),
      |m AS (SELECT MAX(ABS(c.cuma::HUGEINT * t.nb - c.cumb::HUGEINT * t.na))
      |        AS dn FROM c CROSS JOIN t)
      |SELECT t.na AS n_a, t.nb AS n_b,
      |  CAST(m.dn AS BIGINT) AS d_num,
      |  CAST(t.na::HUGEINT * t.nb AS BIGINT) AS d_den,
      |  CASE WHEN t.na > 0 AND t.nb > 0 THEN
      |    CAST((2 * m.dn::HUGEINT * 1000000 + t.na::HUGEINT * t.nb)
      |      // (2 * t.na::HUGEINT * t.nb) AS BIGINT)
      |  END AS d_micro
      |FROM m CROSS JOIN t""".stripMargin

  // ── q317: cross-source 13-gram leakage matrix ──────────────────────────

  /** q317: [[TextDedup.ngramLeakageMatrix]] over all source pairs — the
    * source-level triage of q313's document-level rule: which crawl
    * pairs share verbatim 13-grams at all, with exact counts and
    * containment shares. Only pairs with ≥ 1 shared gram emit (the
    * finding set). */
  def q317NgramLeakage(s: SparkSession, dir: String): DataFrame =
    TextDedup.ngramLeakageMatrix(Sources.documents(s, dir), "doc_id",
        "text", "source", n = 13)
      .orderBy(col("src_a"), col("src_b"))

  val q317Sql: String =
    """WITH ws AS (SELECT doc_id, source, string_split(text, ' ') AS w
      |            FROM documents),
      |sh AS (SELECT DISTINCT doc_id, source,
      |         array_to_string(w[i:i+12], ' ') AS s
      |       FROM (SELECT doc_id, source, w,
      |               unnest(range(1, len(w) - 11)) AS i
      |             FROM ws WHERE len(w) >= 13)),
      |ss AS (SELECT DISTINCT source, s FROM sh),
      |tot AS (SELECT source, COUNT(*) AS t FROM ss GROUP BY 1),
      |m AS (SELECT a.source AS src_a, b.source AS src_b,
      |        CAST(COUNT(*) AS BIGINT) AS n_shared_grams
      |      FROM ss a JOIN ss b ON a.s = b.s AND a.source < b.source
      |      GROUP BY 1, 2)
      |SELECT m.src_a, m.src_b, m.n_shared_grams,
      |  CAST(ta.t AS BIGINT) AS n_grams_a,
      |  CAST(tb.t AS BIGINT) AS n_grams_b,
      |  CAST((m.n_shared_grams::HUGEINT * 1000000) // ta.t AS BIGINT)
      |    AS contain_a_ppm,
      |  CAST((m.n_shared_grams::HUGEINT * 1000000) // tb.t AS BIGINT)
      |    AS contain_b_ppm
      |FROM m JOIN tot ta ON ta.source = m.src_a
      |       JOIN tot tb ON tb.source = m.src_b
      |ORDER BY m.src_a, m.src_b""".stripMargin

  // ── q318: deterministic hash-split balance audit ───────────────────────

  /** q318: [[Sampling.hashSplitAudit]] of an 80/10/10 train/val/test
    * hash split against language strata — every (lang, split) cell with
    * exact counts and signed ppm deviation from target; empty cells
    * emit explicitly (a small stratum landing 0 val docs IS the
    * finding). */
  def q318SplitAudit(s: SparkSession, dir: String): DataFrame =
    Sampling.hashSplitAudit(Sources.documents(s, dir), "doc_id", "lang",
        salt = "hs12",
        splits = Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .orderBy(col("lang"), col("split"))

  val q318Sql: String =
    """WITH h AS (SELECT doc_id, lang,
      |    CAST(list_sum(list_transform(range(1, 13), j ->
      |      (strpos('0123456789abcdef',
      |         substr(md5('hs12_' || CAST(doc_id AS VARCHAR)), j, 1)) - 1)
      |        * (1::BIGINT << (4 * (12 - j))))) AS BIGINT) AS h48
      |  FROM documents),
      |a AS (SELECT lang, CASE WHEN h48 % 100 < 80 THEN 'train'
      |        WHEN h48 % 100 < 90 THEN 'val' ELSE 'test' END AS split
      |      FROM h),
      |c AS (SELECT lang, split, COUNT(*) AS n FROM a GROUP BY 1, 2),
      |sp AS (SELECT * FROM (VALUES ('train', 80), ('val', 10),
      |         ('test', 10)) AS t(split, pct)),
      |st AS (SELECT DISTINCT lang FROM documents),
      |tot AS (SELECT lang, SUM(n) AS t FROM c GROUP BY 1)
      |SELECT st.lang, sp.split,
      |  CAST(COALESCE(c.n, 0) AS BIGINT) AS n_rows,
      |  CAST((COALESCE(c.n, 0)::HUGEINT * 1000000) // tot.t AS BIGINT)
      |    AS share_ppm,
      |  CAST(sp.pct * 10000 AS BIGINT) AS target_ppm,
      |  CAST((COALESCE(c.n, 0)::HUGEINT * 1000000) // tot.t
      |    - sp.pct * 10000 AS BIGINT) AS dev_ppm
      |FROM st CROSS JOIN sp
      |LEFT JOIN c ON c.lang = st.lang AND c.split = sp.split
      |JOIN tot ON tot.lang = st.lang
      |ORDER BY st.lang, sp.split""".stripMargin

  // ── q319: Neyman optimal sampling allocation ───────────────────────────

  /** q319: [[Sampling.neymanAllocation]] of a 1000-doc eval budget
    * across languages by n_chars variability (Neyman 1934) — bigger AND
    * noisier strata get more budget; the design step before q120's
    * proportional fill. */
  def q319Neyman(s: SparkSession, dir: String): DataFrame =
    Sampling.neymanAllocation(Sources.documents(s, dir), "lang",
        "n_chars", totalN = 1000L)
      .orderBy(col("lang"))

  val q319Sql: String =
    """WITH m AS (SELECT lang, COUNT(*) AS n_rows,
      |    SUM(n_chars)::HUGEINT AS s1,
      |    SUM(n_chars * n_chars)::HUGEINT AS s2
      |  FROM documents GROUP BY lang),
      |w AS (SELECT lang, n_rows,
      |    CAST(floor(sqrt(CAST(n_rows::HUGEINT * s2 - s1 * s1 AS DOUBLE)))
      |      AS BIGINT) AS weight
      |  FROM m),
      |wm AS (SELECT MAX(weight) AS wmax FROM w),
      |we AS (SELECT w.lang, w.n_rows, w.weight,
      |    CASE WHEN wm.wmax = 0 THEN 1 ELSE w.weight END AS w2
      |  FROM w CROSS JOIN wm),
      |t AS (SELECT SUM(w2)::HUGEINT AS wt FROM we),
      |q AS (SELECT we.lang, we.n_rows, we.weight,
      |    (1000::HUGEINT * we.w2) // t.wt AS base,
      |    (1000::HUGEINT * we.w2) % t.wt AS rem
      |  FROM we CROSS JOIN t),
      |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, lang ASC)
      |        AS rk,
      |      (SELECT 1000 - SUM(base) FROM q) AS slots
      |  FROM q)
      |SELECT lang, CAST(n_rows AS BIGINT) AS n_rows, weight,
      |  CAST(base + CASE WHEN rk <= slots THEN 1 ELSE 0 END AS BIGINT)
      |    AS alloc
      |FROM r ORDER BY lang""".stripMargin

  // ── q320: McNemar paired-filter disagreement ───────────────────────────

  /** q320: [[graft.operators.Classify.mcnemarFilters]] per source of
    * the alpha-ratio quality rule (≥ 0.70) against the length rule
    * (≥ 600 chars) — the paired test of whether the two admission rules
    * genuinely disagree, from the discordant cells only. */
  def q320Mcnemar(s: SparkSession, dir: String): DataFrame = {
    val alphaPpm = graft.operators.ExactRound.halfAwayDiv(
      length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
        .cast(org.apache.spark.sql.types.LongType) * lit(1000000L),
      length(col("text")).cast(org.apache.spark.sql.types.LongType))
    graft.operators.Classify.mcnemarFilters(Sources.documents(s, dir),
        "source", alphaPpm >= 700000L, col("n_chars") >= 600L)
      .orderBy(col("source"))
  }

  val q320Sql: String =
    """WITH l AS (SELECT source,
      |    (2 * 1000000 * length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
      |      + length(text)) // (2 * length(text)) AS ppm,
      |    n_chars
      |  FROM documents),
      |f AS (SELECT source, ppm >= 700000 AS a, n_chars >= 600 AS b FROM l),
      |g AS (SELECT source,
      |    CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
      |    CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n10,
      |    CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n01,
      |    CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n00
      |  FROM f GROUP BY source)
      |SELECT source, n11, n10, n01, n00,
      |  CASE WHEN n10 + n01 > 0 THEN
      |    CAST((2 * ((n10 - n01)::HUGEINT * (n10 - n01)) * 1000000
      |        + (n10 + n01))
      |      // (2 * (n10 + n01)::HUGEINT) AS BIGINT)
      |  END AS mcnemar_micro
      |FROM g ORDER BY source""".stripMargin

  // ── q321: snapshot diff audit ──────────────────────────────────────────

  /** q321: [[Profiling.snapshotDiff]] between two synthetic snapshot
    * cuts of the documents table (old = id mod 7 ≠ 1, new = id mod 11
    * ≠ 2 with every id mod 13 = 3 text revised) — the row-level
    * added/removed/changed reconciliation a history/current dual-write
    * owes before an overwrite is trusted. */
  def q321SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    val oldSnap = docs.filter(col("doc_id") % 7 =!= 1)
    val newSnap = docs.filter(col("doc_id") % 11 =!= 2)
      .withColumn("text", when(col("doc_id") % 13 === 3,
        concat(col("text"), lit(" v2"))).otherwise(col("text")))
    Profiling.snapshotDiff(oldSnap, newSnap, "doc_id",
      Seq("text", "lang"))
  }

  val q321Sql: String =
    """WITH o AS (SELECT doc_id,
      |    md5(concat_ws('|', COALESCE(text, ' '), COALESCE(lang, ' ')))
      |      AS h
      |  FROM documents WHERE doc_id % 7 <> 1),
      |n AS (SELECT doc_id,
      |    md5(concat_ws('|',
      |      COALESCE(CASE WHEN doc_id % 13 = 3 THEN text || ' v2'
      |        ELSE text END, ' '),
      |      COALESCE(lang, ' '))) AS h
      |  FROM documents WHERE doc_id % 11 <> 2),
      |j AS (SELECT COALESCE(o.doc_id, n.doc_id) AS id, o.h AS ho,
      |        n.h AS hn
      |      FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
      |  CAST(SUM(CASE WHEN ho IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_added,
      |  CAST(SUM(CASE WHEN hn IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_removed,
      |  CAST(SUM(CASE WHEN ho IS NOT NULL AND hn IS NOT NULL
      |    AND ho <> hn THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
      |  CAST(SUM(CASE WHEN ho = hn THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_unchanged
      |FROM j""".stripMargin

  // ── q322: SCD2 validity intervals from the event log ───────────────────

  /** q322: [[graft.operators.History.scd2Intervals]] of each user's
    * event_type timeline — the Kimball type-2 interval table (one row
    * per run of consecutive equal values, valid_to open on the last)
    * that makes "status at time T" one lookup instead of a log scan. */
  def q322Scd2(s: SparkSession, dir: String): DataFrame =
    graft.operators.History.scd2Intervals(Sources.events(s, dir),
        "user_id", "event_type", "ts", "event_id")
      .orderBy(col("user_id"), col("version"))

  val q322Sql: String =
    """WITH e AS (SELECT user_id, event_type, ts, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev
      |  FROM events),
      |m AS (SELECT *, CASE WHEN prev IS NULL OR prev <> event_type
      |        THEN 1 ELSE 0 END AS nw FROM e),
      |r AS (SELECT *, SUM(nw) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |      FROM m),
      |g AS (SELECT user_id, run, MAX(event_type) AS event_type,
      |        MIN(ts) AS valid_from, COUNT(*) AS n_events
      |      FROM r GROUP BY 1, 2)
      |SELECT user_id, CAST(run AS BIGINT) AS version, event_type,
      |  valid_from,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY run)
      |    AS valid_to,
      |  CAST(n_events AS BIGINT) AS n_events
      |FROM g ORDER BY user_id, version""".stripMargin
}
