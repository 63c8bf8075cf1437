package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Packing, Sampling, TextAnalysis, TextDedup}
import graft.sources.Sources

/** Round-8 operators: greedy subword tokenization against a
  * corpus-learned vocabulary (the BPE-apply loop real LLM budgets are
  * counted in), DSIR-style importance resampling, pairwise aligned
  * exact-substring runs, and the curriculum interleave training order —
  * each with a DuckDB oracle replaying the exact same arithmetic. */
object TokenQueries {

  // ── q194: greedy subword tokenization (BPE-apply) ──────────────────────

  /** q194: per-language whitespace-vs-subword token accounting under a
    * corpus-learned 20-entry character-n-gram vocabulary — the greedy
    * longest-match walk of [[TextAnalysis.greedyTokenCountCol]], with
    * the vocabulary learned by [[TextAnalysis.learnCharNgramVocab]]
    * (top char 2..4-grams by occurrence-weighted frequency, ties by
    * text). The oracle re-learns the same vocabulary and replays the
    * same walk as a recursive CTE over (word, cursor) states, so a
    * hash match proves the codegen'd fold takes the IDENTICAL token
    * boundaries at every position of every distinct word. Token counts
    * shuffle only (lang, word) keys; the walk itself is one projection.
    */
  def q194BpeTokens(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    val vocab = TextAnalysis.learnCharNgramVocab(docs, "text", k = 20)
    val wf = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("graft_w"))
      .filter(length(col("graft_w")) >= 1)
      .groupBy(col("lang"), col("graft_w"))
      .agg(count(lit(1)).as("graft_wc"))
    wf.select(col("lang"), col("graft_wc"),
        TextAnalysis.greedyTokenCountCol(col("graft_w"), vocab)
          .cast(LongType).as("graft_ntok"))
      .groupBy(col("lang"))
      .agg(sum(col("graft_wc")).as("n_words"),
        sum(col("graft_wc") * col("graft_ntok")).as("n_subword_tokens"))
      .withColumn("tokens_per_word",
        round(col("n_subword_tokens").cast(DoubleType) /
          col("n_words"), 6))
      .orderBy(col("lang"))
  }

  val q194Sql: String =
    """WITH RECURSIVE w AS (SELECT lang, unnest(string_split(text, ' ')) AS word
      |           FROM documents),
      |wf AS (SELECT lang, word, count(*) AS wc FROM w
      |       WHERE length(word) >= 1 GROUP BY 1, 2),
      |dw AS (SELECT word, CAST(SUM(wc) AS BIGINT) AS wc FROM wf
      |       GROUP BY word),
      |gr AS (
      |  SELECT unnest(list_transform(range(1, length(word)),
      |           i -> substr(word, i, 2))) AS ng, wc
      |  FROM dw WHERE length(word) >= 2
      |  UNION ALL
      |  SELECT unnest(list_transform(range(1, length(word) - 1),
      |           i -> substr(word, i, 3))), wc
      |  FROM dw WHERE length(word) >= 3
      |  UNION ALL
      |  SELECT unnest(list_transform(range(1, length(word) - 2),
      |           i -> substr(word, i, 4))), wc
      |  FROM dw WHERE length(word) >= 4),
      |top AS (SELECT ng FROM (
      |          SELECT ng, CAST(SUM(wc) AS BIGINT) AS cnt FROM gr
      |          GROUP BY ng ORDER BY cnt DESC, ng LIMIT 20)),
      |pos0 AS (SELECT word, unnest(range(1, length(word) + 1)) AS pos
      |         FROM dw),
      |m AS (SELECT p.word, p.pos,
      |        COALESCE(MAX(length(t.ng)), 1) AS step
      |      FROM pos0 p LEFT JOIN top t
      |        ON substr(p.word, p.pos, length(t.ng)) = t.ng
      |      GROUP BY p.word, p.pos),
      |r(word, pos, cnt) AS (
      |  SELECT word, 1, 0 FROM dw
      |  UNION ALL
      |  SELECT r.word, r.pos + m.step, r.cnt + 1
      |  FROM r JOIN m ON r.word = m.word AND r.pos = m.pos),
      |tok AS (SELECT word, MAX(cnt) AS ntok FROM r GROUP BY word)
      |SELECT f.lang, CAST(SUM(f.wc) AS BIGINT) AS n_words,
      |  CAST(SUM(f.wc * t.ntok) AS BIGINT) AS n_subword_tokens,
      |  round(CAST(SUM(f.wc * t.ntok) AS DOUBLE) / SUM(f.wc), 6)
      |    AS tokens_per_word
      |FROM wf f JOIN tok t ON f.word = t.word
      |GROUP BY f.lang ORDER BY f.lang""".stripMargin

  // ── q195: DSIR importance resampling ───────────────────────────────────

  /** q195: the 20 documents DSIR selects toward an English target — log
    * importance weights from [[Sampling.dsirLogWeights]] (hashed-unigram
    * target/raw likelihood ratio, 256 md5 buckets, add-one smoothing,
    * 6-dp-decimal term sums), resampled by deterministic Gumbel-top-k:
    * key = logw + round(−ln(−ln(u)), 6) with u = (first-48-md5-bits +
    * 0.5)/2^48 of "g195_doc_id" — the +0.5 keeps u strictly inside
    * (0, 1) so the double Gumbel never hits ±∞ (the A-ES +1 convention
    * would allow u = 1 here), and both addends are DECIMAL(18,6) so the
    * rank cut is exact on both engines. Output is the selected set in
    * doc_id order. */
  def q195DsirSelect(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    val lw = Sampling.dsirLogWeights(docs, "doc_id", "text",
      col("lang") === "en")
    val h48 = conv(substring(md5(concat(lit("g195_"),
      col("doc_id").cast("string"))), 1, 12), 16, 10).cast(LongType)
    val u = (h48.cast(DoubleType) + lit(0.5)) / lit(281474976710656.0)
    val gumbel = round(-log(-log(u)), 6).cast(DecimalType(18, 6))
    lw.join(docs.select(col("doc_id"), col("lang"), col("source")), "doc_id")
      .withColumn("graft_key", col("logw") + gumbel)
      .orderBy(col("graft_key").desc, col("doc_id"))
      .limit(20)
      .select(col("doc_id"), col("lang"), col("source"), col("n_words"),
        col("logw").cast(DoubleType).as("logw"),
        col("graft_key").cast(DoubleType).as("g_key"))
      .orderBy(col("doc_id"))
  }

  val q195Sql: String =
    """WITH w AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
      |           FROM documents),
      |ww AS (SELECT doc_id, lang, word,
      |        (strpos('0123456789abcdef',
      |           substr(md5('dsir_' || word), 1, 1)) - 1) * 16
      |        + strpos('0123456789abcdef',
      |            substr(md5('dsir_' || word), 2, 1)) - 1 AS b
      |       FROM w WHERE length(word) >= 1),
      |rb AS (SELECT b, count(*) AS r FROM ww GROUP BY b),
      |tb AS (SELECT b, count(*) AS t FROM ww WHERE lang = 'en' GROUP BY b),
      |sp AS (SELECT unnest(range(0, 256)) AS b),
      |st AS (SELECT sp.b, COALESCE(rb.r, 0) AS r, COALESCE(tb.t, 0) AS t
      |       FROM sp LEFT JOIN rb USING (b) LEFT JOIN tb USING (b)),
      |tot AS (SELECT CAST(SUM(r) AS BIGINT) AS rr,
      |          CAST(SUM(t) AS BIGINT) AS tt FROM st),
      |term AS (SELECT st.b,
      |          CAST(round(ln(((st.t + 1.0) * (tot.rr + 256)) /
      |            ((st.r + 1.0) * (tot.tt + 256))), 6)
      |            AS DECIMAL(18,6)) AS term
      |         FROM st CROSS JOIN tot),
      |lw AS (SELECT ww.doc_id, count(*) AS n_words,
      |         SUM(t.term) AS logw
      |       FROM ww JOIN term t ON ww.b = t.b GROUP BY ww.doc_id),
      |g AS (SELECT d.doc_id, d.lang, d.source, lw.n_words, lw.logw,
      |        lw.logw + CAST(round(-ln(-ln(
      |          (CAST(list_sum(list_transform(range(1, 13), j ->
      |             (strpos('0123456789abcdef', substr(md5('g195_'
      |                || CAST(d.doc_id AS VARCHAR)), j, 1)) - 1)
      |             * (1::BIGINT << (4 * (12 - j))))) AS BIGINT) + 0.5)
      |          / 281474976710656.0)), 6) AS DECIMAL(18,6)) AS gkey
      |      FROM documents d JOIN lw ON d.doc_id = lw.doc_id),
      |sel AS (SELECT * FROM g ORDER BY gkey DESC, doc_id LIMIT 20)
      |SELECT doc_id, lang, source, n_words,
      |  CAST(logw AS DOUBLE) AS logw, CAST(gkey AS DOUBLE) AS g_key
      |FROM sel ORDER BY doc_id""".stripMargin

  // ── q196: pairwise aligned exact-substring runs ────────────────────────

  /** q196: every maximal verbatim run of ≥ 8 tokens shared between a
    * document pair — [[TextDedup.alignedSharedRuns]]'s diagonal gap-run
    * merge over positional 5-grams (total-occurrence cap 64, the
    * deterministic hot-gram exclusion both engines replay). The oracle
    * rebuilds the same positional grams, the same capped gram join, and
    * the same (d1, d2, diagonal)-keyed run merge, so a hash match proves
    * the alignment bookkeeping (offsets, run extents, token counts)
    * end to end. */
  def q196AlignedRuns(s: SparkSession, dir: String): DataFrame =
    TextDedup.alignedSharedRuns(Sources.documents(s, dir), "doc_id", "text",
        w = 5, gramCap = 64, minTokens = 8)
      .orderBy(col("d1"), col("d2"), col("start1"), col("start2"))

  val q196Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |gu AS (SELECT doc_id,
      |        unnest(list_transform(range(1, len(w) - 3),
      |          j -> {'pos': j - 1, 's': array_to_string(w[j:j+4], ' ')}))
      |          AS u
      |      FROM ws WHERE len(w) >= 5),
      |g AS (SELECT doc_id, u.pos AS pos, u.s AS s FROM gu),
      |keep AS (SELECT s FROM g GROUP BY s
      |         HAVING count(*) <= 64 AND count(DISTINCT doc_id) >= 2),
      |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, a.pos AS p1, b.pos AS p2,
      |        a.pos - b.pos AS diag
      |      FROM g a JOIN g b ON a.s = b.s AND a.doc_id < b.doc_id
      |      WHERE a.s IN (SELECT s FROM keep)),
      |flags AS (SELECT d1, d2, p1, p2, diag,
      |    CASE WHEN p1 - lag(p1) OVER (PARTITION BY d1, d2, diag ORDER BY p1) = 1
      |         THEN 0 ELSE 1 END AS nf
      |  FROM p),
      |runs AS (SELECT d1, d2, p1, p2, diag,
      |    SUM(nf) OVER (PARTITION BY d1, d2, diag ORDER BY p1
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |  FROM flags)
      |SELECT d1, d2, CAST(MIN(p1) AS BIGINT) AS start1,
      |  CAST(MIN(p2) AS BIGINT) AS start2,
      |  CAST(MAX(p1) - MIN(p1) + 5 AS BIGINT) AS n_tokens,
      |  COUNT(*) AS n_grams
      |FROM runs GROUP BY d1, d2, diag, run
      |HAVING MAX(p1) - MIN(p1) + 5 >= 8
      |ORDER BY d1, d2, start1, start2""".stripMargin

  // ── q198: per-document duplication profile ─────────────────────────────

  /** q198: per-document verbatim-duplication coverage —
    * [[TextDedup.duplicationProfile]] over the q196 run set: every doc's
    * token count, tokens inside ≥ 1 cross-document run (interval UNION —
    * overlapping runs from different partners must not double-count),
    * and the covered fraction. The oracle extends the q196 SQL with the
    * same sweep (distinct intervals, running-max-end subtraction), so a
    * hash match proves the union bookkeeping and the zero-fill for docs
    * with no runs. */
  def q198DupProfile(s: SparkSession, dir: String): DataFrame =
    TextDedup.duplicationProfile(Sources.documents(s, dir), "doc_id",
        "text", w = 5, gramCap = 64, minTokens = 8)
      .orderBy(col("doc_id"))

  val q198Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |gu AS (SELECT doc_id,
      |        unnest(list_transform(range(1, len(w) - 3),
      |          j -> {'pos': j - 1, 's': array_to_string(w[j:j+4], ' ')}))
      |          AS u
      |      FROM ws WHERE len(w) >= 5),
      |g AS (SELECT doc_id, u.pos AS pos, u.s AS s FROM gu),
      |keep AS (SELECT s FROM g GROUP BY s
      |         HAVING count(*) <= 64 AND count(DISTINCT doc_id) >= 2),
      |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, a.pos AS p1, b.pos AS p2,
      |        a.pos - b.pos AS diag
      |      FROM g a JOIN g b ON a.s = b.s AND a.doc_id < b.doc_id
      |      WHERE a.s IN (SELECT s FROM keep)),
      |flags AS (SELECT d1, d2, p1, p2, diag,
      |    CASE WHEN p1 - lag(p1) OVER (PARTITION BY d1, d2, diag ORDER BY p1) = 1
      |         THEN 0 ELSE 1 END AS nf
      |  FROM p),
      |runs AS (SELECT d1, d2, p1, p2, diag,
      |    SUM(nf) OVER (PARTITION BY d1, d2, diag ORDER BY p1
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |  FROM flags),
      |r2 AS (SELECT d1, d2, MIN(p1) AS s1, MIN(p2) AS s2,
      |         MAX(p1) - MIN(p1) + 5 AS nt
      |       FROM runs GROUP BY d1, d2, diag, run
      |       HAVING MAX(p1) - MIN(p1) + 5 >= 8),
      |iv AS (SELECT DISTINCT doc_id, s, e FROM (
      |         SELECT d1 AS doc_id, s1 AS s, s1 + nt - 1 AS e FROM r2
      |         UNION ALL
      |         SELECT d2 AS doc_id, s2 AS s, s2 + nt - 1 AS e FROM r2) u),
      |sw AS (SELECT doc_id, s, e,
      |         COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
      |           AS pme
      |       FROM iv),
      |cov AS (SELECT doc_id,
      |          SUM(GREATEST(0, e - GREATEST(s, pme + 1) + 1)) AS c
      |        FROM sw GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(COALESCE(cov.c, 0) AS BIGINT) AS covered_tokens,
      |  round(CAST(COALESCE(cov.c, 0) AS DOUBLE) /
      |    len(string_split(d.text, ' ')), 6) AS dup_fraction
      |FROM documents d LEFT JOIN cov ON d.doc_id = cov.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // ── q197: curriculum interleave training order ─────────────────────────

  /** q197: the curriculum-interleave training order over the document
    * corpus — [[Packing.curriculumInterleave]] grouped by source, scored
    * by n_chars (integer-exact, so both engines' orderings are trivially
    * identical): best docs first within each source, round-robin across
    * sources. The oracle replays both windows; a hash match proves the
    * distributed global position (range shuffle + offsets broadcast)
    * equals the single-window row_number to the last row. */
  def q197Curriculum(s: SparkSession, dir: String): DataFrame =
    Packing.curriculumInterleave(Sources.documents(s, dir), "doc_id",
        "source", col("n_chars"))
      .orderBy(col("global_pos"))

  val q197Sql: String =
    """WITH r AS (SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id) AS rank_in_group
      |  FROM documents),
      |g AS (SELECT doc_id, source, rank_in_group,
      |    row_number() OVER (ORDER BY rank_in_group, source) AS global_pos
      |  FROM r)
      |SELECT doc_id, source, rank_in_group,
      |  CAST(global_pos AS BIGINT) AS global_pos
      |FROM g ORDER BY global_pos""".stripMargin

  // ── q237: tokenizer-accurate sequence packing ──────────────────────────

  /** q237: the q77 concat-and-chunk pack plan costed in LEARNED subword
    * tokens instead of whitespace words — per-doc counts from the q194
    * greedy walk ([[TextAnalysis.greedyTokenCountCol]] under the
    * corpus-learned 20-entry vocabulary) folded in ONE codegen'd
    * projection (transform + aggregate over the split array — no
    * explode, no join), then [[Packing.packPlan]]'s distributed exact
    * prefix sum into 512-token contexts. Budgets a training run in the
    * units the tokenizer actually bills. */
  def q237TokenPacking(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    val vocab = TextAnalysis.learnCharNgramVocab(docs, "text", k = 20)
    val tokCount = aggregate(
      transform(filter(split(col("text"), " "), w => length(w) >= 1),
        w => TextAnalysis.greedyTokenCountCol(w, vocab).cast("long")),
      lit(0L), (acc, x) => acc + x)
    Packing.packPlan(docs, "doc_id", "text", ctxLen = 512,
        tokenCount = Some(tokCount))
      .orderBy(col("doc_id"))
  }

  // reuses q194's recursive-CTE greedy walk verbatim (same vocabulary,
  // same boundaries), then q77's prefix-sum chunk arithmetic
  val q237Sql: String =
    """WITH RECURSIVE w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |           FROM documents),
      |wf AS (SELECT doc_id, word, count(*) AS wc FROM w
      |       WHERE length(word) >= 1 GROUP BY 1, 2),
      |dw AS (SELECT word, CAST(SUM(wc) AS BIGINT) AS wc FROM wf
      |       GROUP BY word),
      |gr AS (
      |  SELECT unnest(list_transform(range(1, length(word)),
      |           i -> substr(word, i, 2))) AS ng, wc
      |  FROM dw WHERE length(word) >= 2
      |  UNION ALL
      |  SELECT unnest(list_transform(range(1, length(word) - 1),
      |           i -> substr(word, i, 3))), wc
      |  FROM dw WHERE length(word) >= 3
      |  UNION ALL
      |  SELECT unnest(list_transform(range(1, length(word) - 2),
      |           i -> substr(word, i, 4))), wc
      |  FROM dw WHERE length(word) >= 4),
      |top AS (SELECT ng FROM (
      |          SELECT ng, CAST(SUM(wc) AS BIGINT) AS cnt FROM gr
      |          GROUP BY ng ORDER BY cnt DESC, ng LIMIT 20)),
      |pos0 AS (SELECT word, unnest(range(1, length(word) + 1)) AS pos
      |         FROM dw),
      |m AS (SELECT p.word, p.pos,
      |        COALESCE(MAX(length(t.ng)), 1) AS step
      |      FROM pos0 p LEFT JOIN top t
      |        ON substr(p.word, p.pos, length(t.ng)) = t.ng
      |      GROUP BY p.word, p.pos),
      |r(word, pos, cnt) AS (
      |  SELECT word, 1, 0 FROM dw
      |  UNION ALL
      |  SELECT r.word, r.pos + m.step, r.cnt + 1
      |  FROM r JOIN m ON r.word = m.word AND r.pos = m.pos),
      |tok AS (SELECT word, MAX(cnt) AS ntok FROM r GROUP BY word),
      |dt AS (SELECT f.doc_id, CAST(SUM(f.wc * t.ntok) AS BIGINT) AS nt
      |       FROM wf f JOIN tok t ON f.word = t.word GROUP BY 1),
      |t AS (SELECT d.doc_id, COALESCE(dt.nt, 0) AS n_tokens
      |      FROM documents d LEFT JOIN dt USING (doc_id)),
      |p AS (SELECT doc_id, n_tokens,
      |    CAST(COALESCE(SUM(n_tokens) OVER (
      |      ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS start_tok
      |  FROM t)
      |SELECT doc_id, n_tokens, start_tok,
      |  start_tok // 512 AS first_chunk,
      |  (start_tok + greatest(n_tokens, 1) - 1) // 512 AS last_chunk,
      |  ((start_tok + greatest(n_tokens, 1) - 1) // 512)
      |    - (start_tok // 512) + 1 AS n_chunks
      |FROM p ORDER BY doc_id""".stripMargin

  // ── q238: filter-threshold sweep (calibration curve) ───────────────────

  private val sweepThresholds: Seq[Long] =
    Seq(-600L, -400L, -200L, 0L, 200L, 400L, 600L, 800L)

  /** q238: the kept-volume calibration curve for the q212 linear quality
    * classifier — [[graft.operators.Selection.thresholdSweep]] over its
    * milli-logits with token weights: one corpus pass computes every
    * candidate cut's surviving docs/tokens (exact counts + ppm), the
    * table a pipeline reads to pick the threshold that hits its token
    * budget. */
  def q238ThresholdSweep(s: SparkSession, dir: String): DataFrame =
    graft.operators.Selection.thresholdSweep(
        TextAnalysis.linearQualityScore(Sources.documents(s, dir),
          "doc_id", "text", QualityQueries.q212MilliWeights.toMap,
          QualityQueries.q212BiasMilli),
        "logit_milli", "n_terms", sweepThresholds)
      .orderBy(col("threshold"))

  val q238Sql: String = {
    val values = QualityQueries.q212MilliWeights
      .map { case (t, w) => s"('$t', ${w}::BIGINT)" }.mkString(", ")
    val tvals = sweepThresholds.map(t => s"($t)").mkString(", ")
    s"""WITH w(term, wm) AS (VALUES $values),
       |t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |      FROM documents),
       |h AS (SELECT t.doc_id, CAST(SUM(w.wm) AS BIGINT) AS zsum
       |      FROM t JOIN w USING (term) GROUP BY t.doc_id),
       |n AS (SELECT doc_id,
       |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_terms
       |      FROM documents),
       |sc AS (SELECT n.doc_id, n.n_terms,
       |         CAST(COALESCE(h.zsum, 0) +
       |           ${QualityQueries.q212BiasMilli} AS BIGINT) AS lm
       |       FROM n LEFT JOIN h ON n.doc_id = h.doc_id),
       |th(t) AS (VALUES $tvals),
       |tot AS (SELECT COUNT(*) AS nd, CAST(SUM(n_terms) AS BIGINT) AS nw
       |        FROM sc)
       |SELECT CAST(th.t AS BIGINT) AS threshold,
       |  CAST(SUM(CASE WHEN sc.lm >= th.t THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_docs_kept,
       |  CAST(SUM(CASE WHEN sc.lm >= th.t THEN sc.n_terms ELSE 0 END)
       |    AS BIGINT) AS n_tokens_kept,
       |  CAST(tot.nd AS BIGINT) AS n_docs_total,
       |  tot.nw AS n_tokens_total,
       |  CAST((SUM(CASE WHEN sc.lm >= th.t THEN 1 ELSE 0 END)::HUGEINT
       |    * 1000000) // tot.nd::HUGEINT AS BIGINT) AS docs_ppm,
       |  CAST((SUM(CASE WHEN sc.lm >= th.t THEN sc.n_terms ELSE 0 END)
       |    ::HUGEINT * 1000000) // tot.nw::HUGEINT AS BIGINT) AS tokens_ppm
       |FROM sc CROSS JOIN th CROSS JOIN tot
       |GROUP BY th.t, tot.nd, tot.nw ORDER BY threshold""".stripMargin
  }
}
