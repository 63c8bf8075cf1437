package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Chunking, Classify, Graph, Itemsets, LatestSnapshot, Layout, Profiling, Relevance, Similarity, TextAnalysis, TextDedup, VectorAggs}
import graft.sources.Sources

/**
 * Round-10 mining/selection/measurement operators (q246–q265): CCNet
 * perplexity tiering, margin-based pair mining, corpus ablation and
 * drift audits (leave-one-source-out, exact Wasserstein-1), vocabulary
 * statistics (Good–Turing missing mass, Heaps growth), JL projection
 * distortion, lexicon tagging, span-corruption planning, word2phrase
 * merging, robust centroids, the RedPajama-V2 signals table, storage
 * encoding planning, Pearson proxy checks, normal-equations probe
 * training, MaxSim retrieval, coreset sampling, hubness, and k-core
 * onion layers. Each query gates a [[graft.operators]] component
 * against an independent DuckDB derivation.
 */
object MiningQueries {

  // ── q246: CCNet head/middle/tail perplexity tiers ──────────────────────

  /** q246: per-language head/middle/tail tier assignment
    * ([[Relevance.perplexityTiers]]) over the interpolated-perplexity
    * scores of q200 — the CCNet corpus split (Wenzek 2020). The gate
    * hashes every document's (lang, portable score, tier): boundaries
    * derive from the exact BIGINT `sum_pq6 div n_scored`, so the whole
    * assignment is engine-exact with no tolerance column. */
  def q246CcnetTiers(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    val scored = Relevance.interpolatedPerplexity(docs, "doc_id", "text",
        lambda = 0.75)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    Relevance.perplexityTiers(scored, "doc_id", "lang")
      .orderBy(col("doc_id"))
  }

  // wraps the canonical interpolated-perplexity chain (q200Sql) — a
  // parameter change there propagates here, not a drifting inline copy
  val q246Sql: String =
    s"""WITH ppl AS (
      |  SELECT doc_id, n_scored, sum_pq6 FROM (
      |${QualityQueries.q200Sql}
      |  )),
      |sc AS (SELECT p.doc_id, d.lang,
      |         CAST(p.sum_pq6 // p.n_scored AS BIGINT) AS pq6_mean
      |       FROM ppl p JOIN documents d USING (doc_id)),
      |dist AS (SELECT lang, pq6_mean, COUNT(*) AS n FROM sc GROUP BY 1, 2),
      |cw AS (SELECT lang, pq6_mean,
      |         COALESCE(SUM(n) OVER (PARTITION BY lang
      |           ORDER BY pq6_mean DESC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           AS cum0,
      |         SUM(n) OVER (PARTITION BY lang) AS tot
      |       FROM dist),
      |tier AS (SELECT lang, pq6_mean,
      |         CASE WHEN 3 * cum0 < tot THEN 'head'
      |              WHEN 3 * cum0 < 2 * tot THEN 'middle'
      |              ELSE 'tail' END AS tier
      |       FROM cw)
      |SELECT sc.doc_id, sc.lang, sc.pq6_mean, t.tier
      |FROM sc JOIN tier t USING (lang, pq6_mean)
      |ORDER BY sc.doc_id""".stripMargin

  // ── q247: margin-based cross-corpus pair mining ────────────────────────

  /** q247: margin-mined best pairs between the even-id and odd-id halves
    * of the embedding corpus — [[Similarity.marginMining]] with k = 4
    * neighborhoods and ratio-margin threshold 1.05 (Artetxe & Schwenk
    * 2019); the bitext/near-pair mining criterion that normalizes away
    * hub vectors. Gate = each source's winning target with its cosine
    * and margin. */
  def q247MarginMining(s: SparkSession, dir: String): DataFrame = {
    val emb = Sources.embeddings(s, dir)
    Similarity.marginMining(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", k = 4, tau = 1.05)
      .orderBy(col("src_id"))
  }

  val q247Sql: String =
    """WITH sv AS (SELECT vec_id AS src_id, embedding AS v
      |            FROM embeddings WHERE vec_id % 2 = 0),
      |tv AS (SELECT vec_id AS tgt_id, embedding AS v
      |       FROM embeddings WHERE vec_id % 2 = 1),
      |p AS (SELECT s.src_id, t.tgt_id,
      |        CAST(round(list_sum(list_transform(range(1, len(s.v) + 1),
      |            i -> s.v[i]::DOUBLE * t.v[i]::DOUBLE)) /
      |          (sqrt(list_sum(list_transform(range(1, len(s.v) + 1),
      |             i -> s.v[i]::DOUBLE * s.v[i]::DOUBLE))) *
      |           sqrt(list_sum(list_transform(range(1, len(t.v) + 1),
      |             i -> t.v[i]::DOUBLE * t.v[i]::DOUBLE)))), 6)
      |          AS DECIMAL(18,6)) AS c
      |      FROM sv s CROSS JOIN tv t),
      |ra AS (SELECT *, row_number() OVER (PARTITION BY src_id
      |         ORDER BY c DESC, tgt_id) AS rna FROM p),
      |sa AS (SELECT src_id, SUM(c) AS sa, COUNT(*) AS ka
      |       FROM ra WHERE rna <= 4 GROUP BY 1),
      |rb AS (SELECT *, row_number() OVER (PARTITION BY tgt_id
      |         ORDER BY c DESC, src_id) AS rnb FROM p),
      |sb AS (SELECT tgt_id, SUM(c) AS sb, COUNT(*) AS kb
      |       FROM rb WHERE rnb <= 4 GROUP BY 1),
      |m AS (SELECT p.src_id, p.tgt_id, p.c,
      |        round(CAST(p.c AS DOUBLE) /
      |          ((CAST(sa.sa AS DOUBLE) / CAST(sa.ka AS DOUBLE) +
      |            CAST(sb.sb AS DOUBLE) / CAST(sb.kb AS DOUBLE)) / 2), 6)
      |          AS margin
      |      FROM p JOIN sa USING (src_id) JOIN sb USING (tgt_id)),
      |r AS (SELECT *, row_number() OVER (PARTITION BY src_id
      |        ORDER BY margin DESC, tgt_id) AS rn FROM m)
      |SELECT src_id, tgt_id, CAST(c AS DOUBLE) AS cosine, margin
      |FROM r WHERE rn = 1 AND margin >= 1.05 ORDER BY src_id""".stripMargin

  // ── q248: leave-one-source-out corpus impact ───────────────────────────

  /** q248: the per-source data-ablation audit
    * ([[Profiling.leaveOneOutImpact]]): token share, counterfactual
    * corpus mean length without the source, and exclusive-vocabulary
    * contribution — every column an exact count or positive-ppm
    * integral division. */
  def q248LooImpact(s: SparkSession, dir: String): DataFrame =
    Profiling.leaveOneOutImpact(Sources.documents(s, dir), "doc_id",
        "text", "source")
      .orderBy(col("source"))

  val q248Sql: String =
    """WITH per AS (SELECT source, COUNT(*) AS n_docs,
      |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |       FROM documents GROUP BY source),
      |sw AS (SELECT DISTINCT source, unnest(string_split(text, ' ')) AS w
      |       FROM documents),
      |spread AS (SELECT w, COUNT(*) AS nsrc, MIN(source) AS solo
      |           FROM sw GROUP BY w),
      |excl AS (SELECT solo AS source, COUNT(*) AS vocab_excl
      |         FROM spread WHERE nsrc = 1 GROUP BY solo),
      |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS nn,
      |          CAST(SUM(n_tokens) AS BIGINT) AS tt,
      |          (SELECT COUNT(*) FROM spread) AS vv
      |        FROM per)
      |SELECT per.source, per.n_docs, per.n_tokens,
      |  CAST((per.n_tokens::HUGEINT * 1000000) // tot.tt AS BIGINT)
      |    AS token_share_ppm,
      |  CAST((tot.tt::HUGEINT * 1000000) // tot.nn AS BIGINT)
      |    AS mean_with_ppm,
      |  CASE WHEN tot.nn > per.n_docs THEN
      |    CAST(((tot.tt - per.n_tokens)::HUGEINT * 1000000) //
      |      (tot.nn - per.n_docs) AS BIGINT) END AS mean_wo_ppm,
      |  CASE WHEN tot.nn > per.n_docs THEN
      |    CAST(((tot.tt - per.n_tokens)::HUGEINT * 1000000) //
      |      (tot.nn - per.n_docs) AS BIGINT) -
      |    CAST((tot.tt::HUGEINT * 1000000) // tot.nn AS BIGINT)
      |    END AS delta_mean_ppm,
      |  COALESCE(excl.vocab_excl, 0) AS vocab_excl,
      |  tot.vv - COALESCE(excl.vocab_excl, 0) AS vocab_without
      |FROM per LEFT JOIN excl USING (source) CROSS JOIN tot
      |ORDER BY per.source""".stripMargin

  // ── q249: Wasserstein-1 length-distribution drift ──────────────────────

  /** q249: exact earth-mover distance between every source's document
    * word-length distribution and the rest of the corpus
    * ([[Profiling.w1StrataDrift]]) — the integral-CDF companion to
    * q146's KS point statistic, entirely in integer arithmetic. */
  def q249W1Drift(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    Profiling.w1StrataDrift(
        docs.select(col("source"),
          size(split(col("text"), " ")).as("n_words")),
        "n_words", "source")
      .orderBy(col("source"))
  }

  val q249Sql: String =
    """WITH sl AS (SELECT source,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS v,
      |         COUNT(*) AS c
      |       FROM documents GROUP BY 1, 2),
      |sup AS (SELECT v, SUM(c) AS call FROM sl GROUP BY v),
      |st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ns FROM sl GROUP BY 1),
      |tot AS (SELECT CAST(SUM(call) AS BIGINT) AS n FROM sup),
      |grid AS (SELECT st.source, st.ns, sup.v, sup.call,
      |           COALESCE(sl.c, 0) AS c
      |         FROM st CROSS JOIN sup
      |         LEFT JOIN sl ON sl.source = st.source AND sl.v = sup.v),
      |cum AS (SELECT source, ns, v,
      |          SUM(c) OVER (PARTITION BY source ORDER BY v) AS cums,
      |          SUM(call) OVER (PARTITION BY source ORDER BY v) AS cumall,
      |          COALESCE(LEAD(v) OVER (PARTITION BY source ORDER BY v) - v,
      |            0) AS gap
      |        FROM grid),
      |agg AS (SELECT c.source, MAX(c.ns) AS n_docs,
      |          MAX(t.n - c.ns) AS n_rest,
      |          SUM(c.gap::HUGEINT *
      |            abs(c.cums::HUGEINT * (t.n - c.ns) -
      |                (c.cumall - c.cums)::HUGEINT * c.ns)) AS w1raw
      |        FROM cum c CROSS JOIN tot t GROUP BY c.source)
      |SELECT source, n_docs, n_rest,
      |  CASE WHEN n_rest > 0 THEN
      |    CAST((w1raw * 1000000) // (n_docs::HUGEINT * n_rest) AS BIGINT)
      |    END AS w1_ppm
      |FROM agg ORDER BY source""".stripMargin

  // ── q250: Good–Turing missing-mass audit ───────────────────────────────

  /** q250: per-source unseen-vocabulary probability mass
    * ([[TextAnalysis.missingMassAudit]]) — the Good–Turing hapax share
    * n₁/N with exact token/type/hapax/dis-legomena counts. */
  def q250MissingMass(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.missingMassAudit(Sources.documents(s, dir), "text",
        "source")
      .orderBy(col("source"))

  val q250Sql: String =
    """WITH wc AS (SELECT source, unnest(string_split(text, ' ')) AS w
      |            FROM documents),
      |cc AS (SELECT source, w, COUNT(*) AS c FROM wc GROUP BY 1, 2)
      |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  COUNT(*) AS n_types,
      |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |  CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dis,
      |  CAST((SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)::HUGEINT * 1000000) //
      |    SUM(c)::HUGEINT AS BIGINT) AS missing_mass_ppm
      |FROM cc GROUP BY source ORDER BY source""".stripMargin

  // ── q251: Heaps-law vocabulary growth curve ────────────────────────────

  /** q251: cumulative vocabulary after each doc-id-ordered decile of the
    * corpus ([[TextAnalysis.vocabGrowthCurve]]) — each word counted in
    * the tranche of its first containing document, so `cum_vocab` is the
    * exact prefix vocabulary V(n). */
  def q251VocabGrowth(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabGrowthCurve(Sources.documents(s, dir), "doc_id",
        "text", buckets = 10)
      .orderBy(col("bucket"))

  val q251Sql: String =
    """WITH tr AS (SELECT doc_id, ntile(10) OVER (ORDER BY doc_id) AS bucket
      |            FROM documents),
      |fd AS (SELECT w, MIN(doc_id) AS doc_id FROM (
      |         SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |         FROM documents) GROUP BY w),
      |nw AS (SELECT tr.bucket, COUNT(*) AS new_words
      |       FROM fd JOIN tr USING (doc_id) GROUP BY 1),
      |tk AS (SELECT tr.bucket, COUNT(*) AS n_docs,
      |         CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT)
      |           AS n_tokens
      |       FROM documents d JOIN tr USING (doc_id) GROUP BY 1)
      |SELECT CAST(tk.bucket AS BIGINT) AS bucket, tk.n_docs, tk.n_tokens,
      |  COALESCE(nw.new_words, 0) AS new_words,
      |  CAST(SUM(COALESCE(nw.new_words, 0)) OVER (ORDER BY tk.bucket)
      |    AS BIGINT) AS cum_vocab,
      |  CAST(SUM(tk.n_tokens) OVER (ORDER BY tk.bucket) AS BIGINT)
      |    AS cum_tokens
      |FROM tk LEFT JOIN nw USING (bucket) ORDER BY bucket""".stripMargin

  // ── q252: Johnson–Lindenstrauss distortion audit ───────────────────────

  /** q252: distance preservation of the 64 → 16 Rademacher JL projection
    * over disjoint (even, +1) probe pairs
    * ([[Similarity.jlDistortionPairs]]) — squared distances before and
    * after, and the floored preservation ratio whose concentration near
    * 10⁶ is the JL guarantee. The oracle re-derives the SAME md5 sign
    * matrix (the q23 hyperplane scheme) and replays the sequential
    * folds. */
  def q252JlDistortion(s: SparkSession, dir: String): DataFrame =
    Similarity.jlDistortionPairs(Sources.embeddings(s, dir), "vec_id",
        "embedding", dims = 64, dOut = 16)
      .orderBy(col("a_id"))

  val q252Sql: String =
    """WITH e AS (SELECT vec_id,
      |         list_transform(embedding, v -> v::DOUBLE) AS x
      |       FROM embeddings),
      |pj AS (SELECT vec_id, p,
      |         list_sum(list_transform(range(1, 65),
      |           d -> x[d] * ((strpos('0123456789abcdef',
      |               substr(md5(p::VARCHAR || '_' || (d - 1)::VARCHAR),
      |                 1, 1)) - 1) % 2 * 2 - 1))) AS yp
      |       FROM e CROSS JOIN range(0, 16) t(p)),
      |y AS (SELECT vec_id, list(yp ORDER BY p) AS y FROM pj GROUP BY 1),
      |pr AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      |         list_sum(list_transform(range(1, 65),
      |           d -> (a.x[d] - b.x[d]) * (a.x[d] - b.x[d]))) AS od2,
      |         list_sum(list_transform(range(1, 17),
      |           d -> (ya.y[d] - yb.y[d]) * (ya.y[d] - yb.y[d]))) AS pd2
      |       FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
      |       JOIN y ya ON ya.vec_id = a.vec_id
      |       JOIN y yb ON yb.vec_id = b.vec_id
      |       WHERE a.vec_id % 2 = 0)
      |SELECT a_id, b_id, round(od2, 6) AS orig_d2, round(pd2, 6) AS proj_d2,
      |  CASE WHEN od2 > 0 THEN
      |    CAST(floor((1000000.0 * pd2) / (16.0 * od2)) AS BIGINT)
      |    END AS ratio_ppm
      |FROM pr ORDER BY a_id""".stripMargin

  // ── q253: lexicon/topic tagging ────────────────────────────────────────

  /** The tagging lexicon (tag, phrase) — 1/2-word phrases over the
    * corpus vocabulary; the single constant both the Spark query and the
    * oracle VALUES list derive from. */
  private val tagLexicon: Seq[(String, String)] = Seq(
    "storage" -> "table", "storage" -> "row", "storage" -> "column",
    "storage" -> "part",
    "exec" -> "scan", "exec" -> "filter", "exec" -> "hash value",
    "exec" -> "merge",
    "stream" -> "stream", "stream" -> "window", "stream" -> "batch",
    "perf" -> "fast", "perf" -> "slow", "perf" -> "big table")

  /** q253: dominant topic per document under the phrase lexicon
    * ([[TextAnalysis.lexiconTag]]) — per-doc winning tag (most phrase
    * hits, ties to the lexicographically first tag), its hit count, and
    * the tag breadth; docs with zero hits drop out. */
  def q253LexiconTag(s: SparkSession, dir: String): DataFrame = {
    val hits = TextAnalysis.lexiconTag(Sources.documents(s, dir), "doc_id",
      "text", tagLexicon)
    val breadth = hits.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tags"), sum(col("n_hits")).as("total_hits"))
    LatestSnapshot.topK(hits, Seq("doc_id"), col("n_hits").desc,
        Seq(col("tag").asc), 1)
      .select(col("doc_id"), col("tag").as("top_tag"),
        col("n_hits").as("top_hits"))
      .join(breadth, "doc_id")
      .orderBy(col("doc_id"))
  }

  private val lexValues: String = tagLexicon
    .map { case (t, p) => s"('$t', '$p')" }.mkString(", ")

  val q253Sql: String =
    s"""WITH lex(tag, gram) AS (VALUES $lexValues),
      |ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |grams AS (
      |  SELECT doc_id, unnest(w) AS gram FROM ws
      |  UNION ALL
      |  SELECT doc_id, unnest(list_transform(range(1, len(w)),
      |    i -> w[i] || ' ' || w[i+1]))
      |  FROM ws WHERE len(w) >= 2),
      |hits AS (SELECT g.doc_id, l.tag, COUNT(*) AS n_hits
      |         FROM grams g JOIN lex l ON g.gram = l.gram
      |         GROUP BY 1, 2),
      |br AS (SELECT doc_id, COUNT(*) AS n_tags,
      |         CAST(SUM(n_hits) AS BIGINT) AS total_hits
      |       FROM hits GROUP BY 1),
      |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
      |        ORDER BY n_hits DESC, tag) AS rn FROM hits)
      |SELECT r.doc_id, r.tag AS top_tag, r.n_hits AS top_hits,
      |  br.n_tags, br.total_hits
      |FROM r JOIN br USING (doc_id) WHERE r.rn = 1
      |ORDER BY r.doc_id""".stripMargin

  // ── q254: T5 span-corruption mask planning ─────────────────────────────

  /** q254: the deterministic span-corruption plan
    * ([[Chunking.spanMaskPlan]], 20-word blocks, 3-word spans) — per doc
    * the span count, masked-token count and ppm, and the md5 fingerprint
    * of every span start (so the gate pins each md5-chosen offset). */
  def q254SpanMask(s: SparkSession, dir: String): DataFrame =
    Chunking.spanMaskPlan(Sources.documents(s, dir), "doc_id", "text",
        blockWords = 20, spanWords = 3, salt = "g254")
      .orderBy(col("doc_id"))

  val q254Sql: String =
    """WITH d AS (SELECT doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      |       FROM documents),
      |p AS (SELECT doc_id, n, n // 20 AS nb, n - (n // 20) * 20 AS rem
      |      FROM d),
      |st AS (SELECT doc_id, n,
      |         list_concat(
      |           CASE WHEN nb > 0 THEN
      |             list_transform(range(0, nb), b -> b * 20 +
      |               CAST(list_sum(list_transform(range(1, 9), j ->
      |                 (strpos('0123456789abcdef', substr(
      |                    md5('g254_' || doc_id || '_' || b), j, 1)) - 1)
      |                   * (1::BIGINT << (4 * (8 - j))))) AS BIGINT) % 18)
      |           ELSE [] END,
      |           CASE WHEN rem >= 3 THEN
      |             [nb * 20 +
      |               CAST(list_sum(list_transform(range(1, 9), j ->
      |                 (strpos('0123456789abcdef', substr(
      |                    md5('g254_' || doc_id || '_t'), j, 1)) - 1)
      |                   * (1::BIGINT << (4 * (8 - j))))) AS BIGINT) % (rem - 3 + 1)]
      |           ELSE [] END) AS starts
      |      FROM p)
      |SELECT doc_id, n AS n_words,
      |  CAST(len(starts) AS BIGINT) AS n_spans,
      |  CAST(len(starts) * 3 AS BIGINT) AS n_masked,
      |  CAST((len(starts)::HUGEINT * 3 * 1000000) // n AS BIGINT)
      |    AS masked_ppm,
      |  md5(array_to_string(list_transform(starts, x -> x::VARCHAR), ','))
      |    AS starts_md5
      |FROM st ORDER BY doc_id""".stripMargin

  // ── q255: word2phrase collocation merging ──────────────────────────────

  /** q255: the corpus rewritten with collocations merged
    * ([[TextAnalysis.collocationMerge]], δ = 5, τ = 6/5) — per doc the
    * merge count, post-merge token count, and the md5 of the rewritten
    * text, so the gate pins every merge decision AND the reassembly. */
  def q255CollocationMerge(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.collocationMerge(Sources.documents(s, dir), "doc_id",
        "text", delta = 5L, tauNum = 6L, tauDen = 5L)
      .orderBy(col("doc_id"))

  val q255Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sl AS (SELECT doc_id, i, w[i] AS x, w[i+1] AS y
      |       FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
      |             FROM ws WHERE len(w) >= 2)),
      |cxy AS (SELECT x, y, COUNT(*) AS c FROM sl GROUP BY 1, 2),
      |cu AS (SELECT t, COUNT(*) AS c FROM (
      |         SELECT unnest(string_split(text, ' ')) AS t FROM documents)
      |       GROUP BY 1),
      |n AS (SELECT SUM(c) AS n FROM cu),
      |sc AS (SELECT sl.doc_id, sl.i,
      |         (cxy.c - 5)::HUGEINT * n.n::HUGEINT AS num,
      |         ux.c::HUGEINT * uy.c::HUGEINT AS den
      |       FROM sl JOIN cxy USING (x, y)
      |       JOIN cu ux ON ux.t = sl.x
      |       JOIN cu uy ON uy.t = sl.y
      |       CROSS JOIN n),
      |pk AS (SELECT doc_id, list(num ORDER BY i) AS nums,
      |         list(den ORDER BY i) AS dens
      |       FROM sc GROUP BY doc_id),
      |mg AS (SELECT ws.doc_id, ws.w,
      |         CASE WHEN pk.nums IS NULL THEN []::BOOLEAN[]
      |         ELSE list_transform(range(1, len(pk.nums) + 1), i ->
      |           nums[i] * 5 >= 6 * dens[i]
      |           AND (i = 1 OR nums[i] * dens[i-1] > nums[i-1] * dens[i])
      |           AND (i = len(nums) OR
      |                nums[i] * dens[i+1] >= nums[i+1] * dens[i]))
      |         END AS m
      |       FROM ws LEFT JOIN pk USING (doc_id)),
      |rw AS (SELECT doc_id, w, m,
      |         list_filter(list_transform(range(1, len(w) + 1), i ->
      |           CASE WHEN i > 1 AND i - 1 <= len(m) AND m[i-1] THEN NULL
      |                WHEN i <= len(m) AND m[i] THEN w[i] || '_' || w[i+1]
      |                ELSE w[i] END), x -> x IS NOT NULL) AS out
      |       FROM mg)
      |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
      |  CAST(len(list_filter(m, x -> x)) AS BIGINT) AS n_merges,
      |  CAST(len(w) - len(list_filter(m, x -> x)) AS BIGINT)
      |    AS n_tokens_after,
      |  md5(array_to_string(out, ' ')) AS merged_md5
      |FROM rw ORDER BY doc_id""".stripMargin

  // ── q256: geometric median (Weiszfeld) robust centroid ─────────────────

  /** q256: per-label geometric median of the embedding corpus
    * ([[VectorAggs.geometricMedian]], 2 Weiszfeld rounds from the
    * component mean) — the outlier-resistant class center; gate = every
    * (label, dim) component of the final estimate. */
  def q256GeometricMedian(s: SparkSession, dir: String): DataFrame =
    VectorAggs.geometricMedian(Sources.embeddings(s, dir), "label",
        "embedding", iters = 2)
      .orderBy(col("label"), col("dim"))

  val q256Sql: String = {
    // one Weiszfeld round: points e + estimate v{i-1} → estimate v{i}
    def round_(i: Int): String =
      s"""w$i AS (SELECT e.label, e.x,
         |  greatest(sqrt(list_sum(list_transform(range(1, 65), j ->
         |    (e.x[j] - v.cv[j]) * (e.x[j] - v.cv[j])))), 1e-9) AS wd
         |  FROM e JOIN v${i - 1} v USING (label)),
         |s$i AS (SELECT label, d,
         |    SUM(CAST(round(x[d] / wd, 6) AS DECIMAL(38,6))) AS sx
         |  FROM w$i CROSS JOIN range(1, 65) t(d) GROUP BY label, d),
         |iw$i AS (SELECT label,
         |    SUM(CAST(round(1.0 / wd, 6) AS DECIMAL(38,6))) AS sw
         |  FROM w$i GROUP BY label),
         |e$i AS (SELECT s$i.label, s$i.d,
         |    round(CAST(s$i.sx AS DOUBLE) / CAST(iw$i.sw AS DOUBLE), 6) AS c
         |  FROM s$i JOIN iw$i USING (label)),
         |v$i AS (SELECT label, array_agg(c ORDER BY d) AS cv
         |  FROM e$i GROUP BY label)""".stripMargin
    s"""WITH e AS (SELECT label,
      |         list_transform(embedding, v -> v::DOUBLE) AS x
      |       FROM embeddings),
      |m0 AS (SELECT label, d, round(CAST(SUM(CAST(round(x[d], 6)
      |           AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS c
      |       FROM e CROSS JOIN range(1, 65) t(d) GROUP BY label, d),
      |v0 AS (SELECT label, array_agg(c ORDER BY d) AS cv
      |       FROM m0 GROUP BY label),
      |${round_(1)},
      |${round_(2)},
      |n AS (SELECT label, COUNT(*) AS n_members FROM e GROUP BY label)
      |SELECT e2.label, n.n_members, CAST(e2.d - 1 AS BIGINT) AS dim,
      |  e2.c AS gmedian
      |FROM e2 JOIN n USING (label)
      |ORDER BY e2.label, dim""".stripMargin
  }

  // ── q257: per-document quality-signals table (RedPajama-V2 shape) ──────

  /** q257: the wide per-document signals table a curation run ships
    * alongside the corpus (the RedPajama-V2 "quality signals" artifact,
    * Together 2023): raw metadata + exact surface ratios (q25) +
    * heuristic language ID (q24) + the Gopher rule verdict (q199) +
    * self-repetition coverage (q232) + the CCNet perplexity tier (q246)
    * — one row per document, every signal from an already-verified
    * operator, so filters compose downstream as plain column predicates.
    * Documents too short to score a perplexity tier carry NULL there
    * (left join), never a fabricated value. */
  def q257SignalsTable(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    val qual = TextAnalysis.qualityScore(docs, "doc_id", "text")
    val langId = TextAnalysis.languageId(docs, "doc_id", "text")
    val gopher = TextAnalysis.gopherRuleAudit(docs, "doc_id", "text")
      .select(col("doc_id"), col("n_failed").as("gopher_failed"),
        col("keep").as("gopher_keep"))
    val rep = TextAnalysis.repetitionProfile(docs, "doc_id", "text",
        pWords = 8, dupGramN = 5)
      .select(col("doc_id"), col("dup5_cover_ppm"))
    val tier = Relevance.perplexityTiers(
        Relevance.interpolatedPerplexity(docs, "doc_id", "text",
          lambda = 0.75)
          .join(docs.select(col("doc_id"), col("lang")), "doc_id"),
        "doc_id", "lang")
      .select(col("doc_id"), col("tier").as("ppl_tier"))
    docs.select(col("doc_id"), col("source"), col("lang"))
      .join(qual, "doc_id")
      .join(langId, "doc_id")
      .join(gopher, "doc_id")
      .join(rep, "doc_id")
      .join(tier, Seq("doc_id"), "left")
      .orderBy(col("doc_id"))
  }

  // composes the verified oracle chains of q25/q24/q199/q232/q246 — a
  // parameter change in any constituent propagates here automatically
  val q257Sql: String =
    s"""WITH s25 AS (SELECT * FROM (
      |${PipelineQueries.q25Sql}
      |)),
      |s24 AS (SELECT * FROM (
      |${PipelineQueries.q24Sql}
      |)),
      |gp AS (SELECT doc_id, n_failed AS gopher_failed,
      |         keep AS gopher_keep FROM (
      |${QualityQueries.q199Sql}
      |)),
      |rp AS (SELECT doc_id, dup5_cover_ppm FROM (
      |${RefineQueries.q232Sql}
      |)),
      |tr AS (SELECT doc_id, tier AS ppl_tier FROM (
      |${q246Sql}
      |))
      |SELECT d.doc_id, d.source, d.lang,
      |  s25.n_chars, s25.n_words, s25.mean_word_len, s25.stopword_ratio,
      |  s25.alpha_ratio, s24.predicted_lang, s24.lang_score,
      |  gp.gopher_failed, gp.gopher_keep, rp.dup5_cover_ppm, tr.ppl_tier
      |FROM documents d
      |JOIN s25 USING (doc_id) JOIN s24 USING (doc_id)
      |JOIN gp USING (doc_id) JOIN rp USING (doc_id)
      |LEFT JOIN tr USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  // ── q258: column encoding-size planner ─────────────────────────────────

  private val encCols: Seq[(String, String)] = Seq(
    "l_orderkey" -> "int", "l_partkey" -> "int", "l_linenumber" -> "int",
    "l_returnflag" -> "str", "l_linestatus" -> "str")

  /** q258: exact per-column encoded sizes (plain / zigzag-varint /
    * dictionary) over five lineitem columns
    * ([[Layout.encodingPlan]]) — the writer's encoding pick, integer-
    * exact on both engines (bit lengths via `bin()`, never log2). */
  def q258EncodingPlan(s: SparkSession, dir: String): DataFrame =
    Layout.encodingPlan(Sources.lineitem(s, dir), encCols.map(_._1))
      .orderBy(col("col_name"))

  val q258Sql: String = {
    def block(c: String, kind: String): String = kind match {
      case "int" =>
        s"""SELECT '$c' AS col_name, 'int' AS kind,
           |  COUNT(*) AS n_values, COUNT(DISTINCT $c) AS n_distinct,
           |  CAST(SUM((length(bin(CAST(CASE WHEN $c >= 0 THEN $c * 2
           |    ELSE -$c * 2 - 1 END AS BIGINT))) + 6) // 7) AS BIGINT)
           |    AS vb,
           |  NULL::BIGINT AS sb, NULL::BIGINT AS dlen
           |FROM lineitem""".stripMargin
      case _ =>
        s"""SELECT '$c' AS col_name, 'str' AS kind,
           |  COUNT(*) AS n_values, COUNT(DISTINCT $c) AS n_distinct,
           |  NULL::BIGINT AS vb,
           |  CAST(SUM(length($c)) AS BIGINT) AS sb,
           |  (SELECT CAST(SUM(length(x)) AS BIGINT)
           |   FROM (SELECT DISTINCT $c AS x FROM lineitem)) AS dlen
           |FROM lineitem""".stripMargin
    }
    s"""WITH per AS (
      |${encCols.map { case (c, k) => block(c, k) }.mkString("\nUNION ALL\n")}
      |),
      |m AS (SELECT *,
      |  CASE WHEN kind = 'int' THEN n_values * 8
      |       ELSE sb + n_values * 4 END AS plain_bytes,
      |  CASE WHEN kind = 'int' THEN vb END AS varint_bytes,
      |  n_values * ((length(bin(n_distinct - 1)) + 7) // 8) +
      |    CASE WHEN kind = 'int' THEN n_distinct * 8
      |         ELSE dlen + n_distinct * 4 END AS dict_bytes
      |FROM per),
      |b AS (SELECT *,
      |  CASE WHEN varint_bytes IS NOT NULL AND varint_bytes <= dict_bytes
      |         AND varint_bytes <= plain_bytes THEN 'varint'
      |       WHEN dict_bytes <= plain_bytes THEN 'dict'
      |       ELSE 'plain' END AS best_encoding,
      |  least(plain_bytes, dict_bytes,
      |    COALESCE(varint_bytes, plain_bytes)) AS best_bytes
      |FROM m)
      |SELECT col_name, kind, n_values, n_distinct,
      |  CAST(plain_bytes AS BIGINT) AS plain_bytes,
      |  CAST(varint_bytes AS BIGINT) AS varint_bytes,
      |  CAST(dict_bytes AS BIGINT) AS dict_bytes, best_encoding,
      |  CAST(((plain_bytes - best_bytes)::HUGEINT * 1000000) //
      |    plain_bytes::HUGEINT AS BIGINT) AS savings_ppm
      |FROM b ORDER BY col_name""".stripMargin
  }

  // ── q259: Pearson proxy-signal correlation ─────────────────────────────

  /** q259: per-source Pearson correlation between document word count
    * and embedding L2 norm ([[Profiling.pearsonByStrata]]) — the
    * cheap-metadata vs expensive-representation sanity check run before
    * trusting the cheap signal as a filter proxy. */
  def q259PearsonProxy(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    val emb = Sources.embeddings(s, dir)
      .select(col("vec_id").as("doc_id"),
        sqrt(Similarity.dotHof(col("embedding").cast("array<double>"),
          col("embedding").cast("array<double>"))).as("l2_norm"))
    val paired = docs
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).as("n_words"))
      .join(emb, "doc_id")
    Profiling.pearsonByStrata(paired, "n_words", "l2_norm", "source")
      .orderBy(col("source"))
  }

  val q259Sql: String =
    """WITH p AS (SELECT d.source,
      |    CAST(len(string_split(d.text, ' ')) AS DECIMAL(18,6)) AS x,
      |    CAST(round(sqrt(list_sum(list_transform(
      |        range(1, len(e.embedding) + 1),
      |        i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))), 6)
      |      AS DECIMAL(18,6)) AS y
      |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
      |a AS (SELECT source, COUNT(*) AS n,
      |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
      |    SUM(x * x) AS sxx, SUM(y * y) AS syy
      |  FROM p GROUP BY source)
      |SELECT source, n,
      |  CASE WHEN n >= 2
      |    AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
      |        CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      |    AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
      |        CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
      |  THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
      |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
      |        CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
      |        CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
      |  END AS r_pearson
      |FROM a ORDER BY source""".stripMargin

  // ── q260/q261: linear-probe training by exact normal equations ─────────

  private def probeFeatures(s: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    Sources.documents(s, dir).select(col("doc_id"), col("source"),
      when(col("lang") === "en", 1L).otherwise(0L).as("is_en"),
      size(filter(words, w => w.isInCollection(
        Seq("the", "and", "of", "a", "to", "in")))).cast("long")
        .as("n_stop"),
      size(words).cast("long").as("n_words"))
  }

  // the same feature projection, shared by both oracle CTEs
  private val probeFeatureSql: String =
    """f AS (SELECT doc_id, source,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
      |    CAST(len(list_filter(string_split(text, ' '),
      |      w -> w IN ('the', 'and', 'of', 'a', 'to', 'in'))) AS BIGINT)
      |      AS x1,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x2
      |  FROM documents),
      |st AS (SELECT COUNT(*) AS n,
      |    SUM(x1) AS s1, SUM(x2) AS s2, SUM(x1 * x1) AS s11,
      |    SUM(x1 * x2) AS s12, SUM(x2 * x2) AS s22, SUM(y) AS sy,
      |    SUM(x1 * y) AS s1y, SUM(x2 * y) AS s2y, SUM(y * y) AS syy
      |  FROM f),
      |dd AS (SELECT *,
      |    n::HUGEINT * (s11::HUGEINT * s22 - s12::HUGEINT * s12) -
      |    s1::HUGEINT * (s1::HUGEINT * s22 - s12::HUGEINT * s2) +
      |    s2::HUGEINT * (s1::HUGEINT * s12 - s11::HUGEINT * s2) AS det,
      |    sy::HUGEINT * (s11::HUGEINT * s22 - s12::HUGEINT * s12) -
      |    s1::HUGEINT * (s1y::HUGEINT * s22 - s12::HUGEINT * s2y) +
      |    s2::HUGEINT * (s1y::HUGEINT * s12 - s11::HUGEINT * s2y) AS d0,
      |    n::HUGEINT * (s1y::HUGEINT * s22 - s12::HUGEINT * s2y) -
      |    sy::HUGEINT * (s1::HUGEINT * s22 - s12::HUGEINT * s2) +
      |    s2::HUGEINT * (s1::HUGEINT * s2y - s1y::HUGEINT * s2) AS d1,
      |    n::HUGEINT * (s11::HUGEINT * s2y - s1y::HUGEINT * s12) -
      |    s1::HUGEINT * (s1::HUGEINT * s2y - s1y::HUGEINT * s2) +
      |    sy::HUGEINT * (s1::HUGEINT * s12 - s11::HUGEINT * s2) AS d2
      |  FROM st),
      |bb AS (SELECT *,
      |    CASE WHEN det <> 0
      |      THEN round(CAST(d0 AS DOUBLE) / CAST(det AS DOUBLE), 6)
      |      END AS beta0,
      |    CASE WHEN det <> 0
      |      THEN round(CAST(d1 AS DOUBLE) / CAST(det AS DOUBLE), 6)
      |      END AS beta1,
      |    CASE WHEN det <> 0
      |      THEN round(CAST(d2 AS DOUBLE) / CAST(det AS DOUBLE), 6)
      |      END AS beta2
      |  FROM dd)""".stripMargin

  /** q260: the least-squares English-ness probe fit by exact normal
    * equations ([[Classify.linearProbeTrainExact]]) — ŷ = β₀ + β₁·n_stop
    * + β₂·n_words against is_en; one row with the exact determinant,
    * exact-ppm coefficients, and in-sample R² in exact ppm (bounded
    * ≤ 10⁶ — the raw num/den rational outgrew int64 at sf0.1, the r13
    * audit finding). The hashed surface is all-integer (the portable
    * variant; r10's red row hashed 6-dp double quotients, which round
    * differently across DuckDB libm builds). */
  def q260ProbeTrain(s: SparkSession, dir: String): DataFrame =
    Classify.linearProbeTrainExact(probeFeatures(s, dir), "is_en",
      "n_stop", "n_words")

  val q260Sql: String =
    s"""WITH $probeFeatureSql
      |SELECT n, CAST(det AS BIGINT) AS det,
      |  CAST(CASE WHEN det <> 0 THEN
      |    (CASE WHEN (d0 < 0) <> (det < 0) THEN -1 ELSE 1 END)::HUGEINT
      |      * ((1000000::HUGEINT * abs(d0)) // abs(det))
      |    END AS BIGINT) AS beta0_ppm,
      |  CAST(CASE WHEN det <> 0 THEN
      |    (CASE WHEN (d1 < 0) <> (det < 0) THEN -1 ELSE 1 END)::HUGEINT
      |      * ((1000000::HUGEINT * abs(d1)) // abs(det))
      |    END AS BIGINT) AS beta1_ppm,
      |  CAST(CASE WHEN det <> 0 THEN
      |    (CASE WHEN (d2 < 0) <> (det < 0) THEN -1 ELSE 1 END)::HUGEINT
      |      * ((1000000::HUGEINT * abs(d2)) // abs(det))
      |    END AS BIGINT) AS beta2_ppm,
      |  CAST(CASE WHEN det <> 0 AND n::HUGEINT * syy - sy::HUGEINT * sy > 0
      |    THEN (2 * 1000000::HUGEINT
      |        * abs(n::HUGEINT * (d0 * sy::HUGEINT + d1 * s1y::HUGEINT
      |            + d2 * s2y::HUGEINT) - det * (sy::HUGEINT * sy))
      |        + abs(det * (n::HUGEINT * syy - sy::HUGEINT * sy)))
      |      // (2 * abs(det * (n::HUGEINT * syy - sy::HUGEINT * sy)))
      |    END AS BIGINT) AS r2_ppm
      |FROM dd""".stripMargin

  /** q261: per-source confusion matrix of the trained probe at the 0.5
    * decision boundary ([[Classify.linearProbeConfusion]]) — the
    * reliability read before the probe is trusted as a filter. */
  def q261ProbeConfusion(s: SparkSession, dir: String): DataFrame =
    Classify.linearProbeConfusion(probeFeatures(s, dir), "is_en",
        "n_stop", "n_words", "source")
      .orderBy(col("source"))

  val q261Sql: String =
    s"""WITH $probeFeatureSql
      |SELECT f.source, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN f.y = 1 AND
      |    bb.beta0 + bb.beta1 * f.x1 + bb.beta2 * f.x2 >= 0.5
      |    THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |  CAST(SUM(CASE WHEN f.y = 0 AND
      |    bb.beta0 + bb.beta1 * f.x1 + bb.beta2 * f.x2 >= 0.5
      |    THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      |  CAST(SUM(CASE WHEN f.y = 1 AND NOT
      |    (bb.beta0 + bb.beta1 * f.x1 + bb.beta2 * f.x2 >= 0.5)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS fn,
      |  CAST(SUM(CASE WHEN f.y = 0 AND NOT
      |    (bb.beta0 + bb.beta1 * f.x1 + bb.beta2 * f.x2 >= 0.5)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS tn
      |FROM f CROSS JOIN bb
      |GROUP BY f.source ORDER BY f.source""".stripMargin

  // ── q262: ColBERT-style MaxSim late-interaction retrieval ──────────────

  /** q262: top-5 documents per query under the MaxSim late-interaction
    * score ([[Similarity.maxSimTopK]], 4 sub-vectors of 16 dims) —
    * queries are the `vec_id % 50 = 0` rows, corpus the rest; each
    * query slice finds its best-matching document slice and the
    * per-slice maxima sum. */
  def q262MaxSim(s: SparkSession, dir: String): DataFrame = {
    val emb = Sources.embeddings(s, dir)
    Similarity.maxSimTopK(
        emb.filter(col("vec_id") % 50 === 0),
        emb.filter(col("vec_id") % 50 =!= 0),
        "vec_id", "embedding", dims = 64, m = 4, k = 5)
      .orderBy(col("q_id"), col("d_id"))
  }

  val q262Sql: String =
    """WITH q AS (SELECT vec_id AS q_id, embedding AS v
      |           FROM embeddings WHERE vec_id % 50 = 0),
      |d AS (SELECT vec_id AS d_id, embedding AS v
      |      FROM embeddings WHERE vec_id % 50 <> 0),
      |qs AS (SELECT q_id, i, list_transform(
      |         list_slice(v, i * 16 + 1, i * 16 + 16), x -> x::DOUBLE)
      |         AS sv
      |       FROM q CROSS JOIN range(0, 4) t(i)),
      |dsl AS (SELECT d_id, j, list_transform(
      |          list_slice(v, j * 16 + 1, j * 16 + 16), x -> x::DOUBLE)
      |          AS sv
      |        FROM d CROSS JOIN range(0, 4) t(j)),
      |pc AS (SELECT qs.q_id, dsl.d_id, qs.i,
      |         MAX(CAST(round(
      |           list_sum(list_transform(range(1, 17),
      |             t -> qs.sv[t] * dsl.sv[t])) /
      |           (sqrt(list_sum(list_transform(range(1, 17),
      |              t -> qs.sv[t] * qs.sv[t]))) *
      |            sqrt(list_sum(list_transform(range(1, 17),
      |              t -> dsl.sv[t] * dsl.sv[t])))), 6)
      |           AS DECIMAL(18,6))) AS best
      |       FROM qs CROSS JOIN dsl GROUP BY 1, 2, 3),
      |sc AS (SELECT q_id, d_id, SUM(best) AS maxsim FROM pc GROUP BY 1, 2),
      |r AS (SELECT *, row_number() OVER (PARTITION BY q_id
      |        ORDER BY maxsim DESC, d_id) AS rn FROM sc)
      |SELECT q_id, d_id, CAST(maxsim AS DOUBLE) AS maxsim
      |FROM r WHERE rn <= 5 ORDER BY q_id, d_id""".stripMargin

  // ── q263: lightweight coreset sampling ─────────────────────────────────

  /** q263: the 25-point importance-weighted coreset of the embedding
    * corpus ([[VectorAggs.lightweightCoreset]], Bachem 2018) — ids with
    * their distance-to-mean, floor-ppm sensitivity, and unbiasing
    * weight; the md5-seeded A-ES draw is replayed exactly by the
    * oracle. */
  def q263Coreset(s: SparkSession, dir: String): DataFrame =
    VectorAggs.lightweightCoreset(Sources.embeddings(s, dir), "vec_id",
        "embedding", t = 25, salt = "g263")
      .orderBy(col("vec_id"))

  val q263Sql: String =
    """WITH e AS (SELECT vec_id,
      |         list_transform(embedding, v -> v::DOUBLE) AS x
      |       FROM embeddings),
      |m AS (SELECT d, round(CAST(SUM(CAST(round(x[d], 6)
      |          AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS c
      |      FROM e CROSS JOIN range(1, 65) t(d) GROUP BY d),
      |mu AS (SELECT array_agg(c ORDER BY d) AS mu FROM m),
      |sc AS (SELECT e.vec_id,
      |         CAST(round(list_sum(list_transform(range(1, 65), j ->
      |           (e.x[j] - mu.mu[j]) * (e.x[j] - mu.mu[j]))), 6)
      |           AS DECIMAL(18,6)) AS d2
      |       FROM e CROSS JOIN mu),
      |tt AS (SELECT SUM(d2) AS s, COUNT(*) AS n FROM sc),
      |qq AS (SELECT sc.vec_id, sc.d2,
      |         CASE WHEN CAST(tt.s AS DOUBLE) > 0
      |           THEN 0.5 / tt.n +
      |             CAST(sc.d2 AS DOUBLE) / (2.0 * CAST(tt.s AS DOUBLE))
      |           ELSE 1.0 / tt.n END AS q
      |       FROM sc CROSS JOIN tt),
      |k AS (SELECT *,
      |        ln(CAST(CAST(list_sum(list_transform(range(1, 13), j ->
      |          (strpos('0123456789abcdef',
      |             substr(md5('g263_' || vec_id), j, 1)) - 1)
      |            * (1::BIGINT << (4 * (12 - j))))) AS BIGINT) + 1 AS DOUBLE)
      |          / 281474976710656.0) / q AS aes
      |      FROM qq),
      |r AS (SELECT *, row_number() OVER (ORDER BY aes DESC, vec_id) AS rn
      |      FROM k)
      |SELECT vec_id, CAST(d2 AS DOUBLE) AS d2_mean,
      |  CAST(floor(q * 1000000.0) AS BIGINT) AS sens_ppm,
      |  CAST(floor(1000000.0 / (25.0 * q)) AS BIGINT) AS weight_ppm
      |FROM r WHERE rn <= 25 ORDER BY vec_id""".stripMargin

  // ── q264: hubness audit ────────────────────────────────────────────────

  /** q264: per-vector k-occurrence N₅ over the embedding corpus
    * ([[Similarity.hubnessAudit]]) — the Radovanović 2010 hubness
    * measurement with hub (N_k ≥ 2k) and anti-hub (N_k = 0) flags. */
  def q264Hubness(s: SparkSession, dir: String): DataFrame =
    Similarity.hubnessAudit(Sources.embeddings(s, dir), "vec_id",
        "embedding", k = 5)
      .orderBy(col("vec_id"))

  val q264Sql: String =
    """WITH p AS (SELECT a.vec_id AS src_id, b.vec_id AS tgt_id,
      |        CAST(round(list_sum(list_transform(
      |            range(1, len(a.embedding) + 1),
      |            i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
      |          (sqrt(list_sum(list_transform(
      |             range(1, len(a.embedding) + 1),
      |             i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE))) *
      |           sqrt(list_sum(list_transform(
      |             range(1, len(b.embedding) + 1),
      |             i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))),
      |          6) AS DECIMAL(18,6)) AS c
      |      FROM embeddings a CROSS JOIN embeddings b
      |      WHERE a.vec_id <> b.vec_id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY src_id
      |        ORDER BY c DESC, tgt_id) AS rn FROM p),
      |ind AS (SELECT tgt_id, COUNT(*) AS n_k FROM r WHERE rn <= 5
      |        GROUP BY tgt_id)
      |SELECT e.vec_id, COALESCE(ind.n_k, 0) AS n_k,
      |  COALESCE(ind.n_k, 0) >= 10 AS is_hub,
      |  COALESCE(ind.n_k, 0) = 0 AS is_antihub
      |FROM embeddings e LEFT JOIN ind ON ind.tgt_id = e.vec_id
      |ORDER BY e.vec_id""".stripMargin

  // ── q265: onion-layer k-core peeling of the kNN graph ──────────────────

  /** q265: onion layers of the symmetrized 3-NN embedding graph under
    * 4-core peeling ([[Graph.kCorePeel]]) — every vector stamped with
    * the parallel-peel round that removed it (NULL = survives in the
    * 4-core); the structural-embeddedness grade of each point in the
    * ANN graph. */
  def q265OnionLayers(s: SparkSession, dir: String): DataFrame = {
    val emb = Sources.embeddings(s, dir)
    // r20: the all-pairs loop fixes of Similarity.cosineNearDupPairs —
    // spread the stream side over the cluster (single-split scan ⇒ the
    // quadratic loop otherwise runs on one core) and hoist the
    // per-vector self-norms so each pair pays one dot product;
    // dot/(√na·√nb) is bit-identical to the fused cosine_sim.
    val np = s.sparkContext.defaultParallelism
    val pairs = emb.repartition(np, col("vec_id"))
      .select(col("vec_id").as("src_id"), col("embedding").as("graft_av"),
        sqrt(graft.functions.VectorFunctions.dotProduct(
          col("embedding"), col("embedding"))).as("graft_an"))
      .crossJoin(broadcast(emb.select(col("vec_id").as("tgt_id"),
        col("embedding").as("graft_bv"),
        sqrt(graft.functions.VectorFunctions.dotProduct(
          col("embedding"), col("embedding"))).as("graft_bn"))))
      .filter(col("src_id") =!= col("tgt_id"))
      .select(col("src_id"), col("tgt_id"),
        round(graft.functions.VectorFunctions.dotProduct(
            col("graft_av"), col("graft_bv")) /
          (col("graft_an") * col("graft_bn")), 6)
          .as("graft_c"))
    // exact 3-NN via the bounded-priority-queue aggregate: (−cos, tgt)
    // ascending ≡ (cos desc, tgt asc) — same selection as a window
    // top-k, but O(k) state per src and a k·|src| shuffle instead of
    // shuffling + sorting the full |src|² candidate fan-out
    // (operators.TopK: the map-side combine emits ≤k rows per src per
    // task, so the wire carries the RESULT, not the candidates). The
    // key stays a 6-dp-rounded DOUBLE: distinct 6-dp values order
    // exactly like their decimals, and the queue's interpreted
    // comparator is much cheaper on primitive doubles.
    val knn = graft.operators.TopK.kSmallest(pairs, Seq(col("src_id")),
        Seq("nc" -> (-col("graft_c")), "tgt_id" -> col("tgt_id")), 3)
      .select(col("src_id").as("a"), col("tgt_id").as("b"))
    Graph.kCorePeel(knn, "a", "b", k = 4)
      .select(col("node").as("vec_id"), col("layer"), col("in_core"))
      .orderBy(col("vec_id"))
  }

  val q265Sql: String = {
    // one simultaneous-peel round over LIVE nodes (a node stripped of
    // its last edge has degree 0 and must peel): live l{i-1} + edges
    // e{i-1} → weak w{i} → live v{i}, edges e{i}
    def peel(i: Int): String =
      s"""w$i AS MATERIALIZED (SELECT v.node FROM v${i - 1} v
         |  LEFT JOIN (SELECT a, COUNT(*) AS d FROM e${i - 1} GROUP BY a) g
         |    ON g.a = v.node
         |  WHERE COALESCE(g.d, 0) < 4),
         |l$i AS (SELECT node, $i AS layer FROM w$i),
         |v$i AS MATERIALIZED (SELECT v.node FROM v${i - 1} v
         |  LEFT JOIN w$i w ON w.node = v.node WHERE w.node IS NULL),
         |e$i AS MATERIALIZED (SELECT e.a, e.b FROM e${i - 1} e
         |  LEFT JOIN w$i wa ON wa.node = e.a
         |  LEFT JOIN w$i wb ON wb.node = e.b
         |  WHERE wa.node IS NULL AND wb.node IS NULL)""".stripMargin
    val rounds = (1 to 10).map(peel).mkString(",\n")
    val layerUnion = (1 to 10)
      .map(i => s"SELECT * FROM l$i").mkString(" UNION ALL ")
    s"""WITH p AS (SELECT a.vec_id AS src_id, b.vec_id AS tgt_id,
      |        CAST(round(list_sum(list_transform(
      |            range(1, len(a.embedding) + 1),
      |            i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
      |          (sqrt(list_sum(list_transform(
      |             range(1, len(a.embedding) + 1),
      |             i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE))) *
      |           sqrt(list_sum(list_transform(
      |             range(1, len(b.embedding) + 1),
      |             i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))),
      |          6) AS DECIMAL(18,6)) AS c
      |      FROM embeddings a CROSS JOIN embeddings b
      |      WHERE a.vec_id <> b.vec_id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY src_id
      |        ORDER BY c DESC, tgt_id) AS rn FROM p),
      |d0 AS (SELECT src_id AS a, tgt_id AS b FROM r WHERE rn <= 3),
      |e0 AS MATERIALIZED (SELECT DISTINCT a, b FROM (
      |        SELECT a, b FROM d0 UNION ALL SELECT b, a FROM d0)
      |       WHERE a <> b),
      |v0 AS MATERIALIZED (SELECT DISTINCT a AS node FROM e0),
      |$rounds,
      |ly AS ($layerUnion),
      |nd AS (SELECT node FROM v0)
      |SELECT nd.node AS vec_id, CAST(ly.layer AS BIGINT) AS layer,
      |  ly.layer IS NULL AS in_core
      |FROM nd LEFT JOIN ly USING (node)
      |ORDER BY vec_id""".stripMargin
  }

  // ── q266: order-independent content digest ─────────────────────────────

  /** q266: per-source multiset content digest of (doc_id, text, lang)
    * ([[Profiling.contentDigest]]) — the layout/order-invariant dataset
    * identity two snapshot copies must share row-for-row. The mod-2⁶⁴
    * digest doesn't fit int64, so the GATE surface splits it into two
    * exact 32-bit BIGINT halves (hi = digest div 2³², lo = digest mod
    * 2³²) — the r11 rule that no hashed gate column may be a DECIMAL
    * wider than 18 digits; the operator itself keeps the one-column
    * DECIMAL(38,0) digest for programmatic use. */
  def q266ContentDigest(s: SparkSession, dir: String): DataFrame =
    Profiling.contentDigest(Sources.documents(s, dir), "source",
        Seq("doc_id", "text", "lang"))
      .select(col("source"), col("n_rows"),
        expr("CAST(digest div 4294967296 AS BIGINT)").as("digest_hi32"),
        pmod(col("digest"), lit(4294967296L))
          .cast(org.apache.spark.sql.types.LongType).as("digest_lo32"))
      .orderBy(col("source"))

  /** Exact integer decode of 8 hex chars of md5 column `m` starting at
    * 1-based offset `off+1` — per-nibble value times an exact 16^k
    * integer literal, summed as HUGEINTs. No `power(16, …)`: that is
    * double libm arithmetic inside a hashed surface, the exact
    * portability class that made q266 red in r10 (bit-identical on
    * DuckDB 1.0.0, divergent on the driver's build). */
  private def hex8Sql(off: Int): String =
    (1 to 8).map { j =>
      s"(strpos('0123456789abcdef', substr(m, ${off + j}, 1)) - 1)" +
        s"::HUGEINT * ${BigInt(16).pow(8 - j)}::HUGEINT"
    }.mkString(" + ")

  val q266Sql: String =
    s"""WITH h AS (SELECT source,
      |    md5(concat_ws('|', COALESCE(doc_id::VARCHAR, ' '),
      |      COALESCE(text, ' '), COALESCE(lang, ' '))) AS m
      |  FROM documents),
      |v AS (SELECT source,
      |    (${hex8Sql(0)}) * 4294967296::HUGEINT +
      |    (${hex8Sql(8)}) AS hv
      |  FROM h)
      |SELECT source, COUNT(*) AS n_rows,
      |  CAST((SUM(hv) % 18446744073709551616::HUGEINT)
      |    // 4294967296::HUGEINT AS BIGINT) AS digest_hi32,
      |  CAST((SUM(hv) % 18446744073709551616::HUGEINT)
      |    % 4294967296::HUGEINT AS BIGINT) AS digest_lo32
      |FROM v GROUP BY source ORDER BY source""".stripMargin

  // ── q267: Apriori frequent trigram mining ──────────────────────────────

  /** q267: every adjacent 3-token sequence with corpus support ≥ 6
    * ([[Itemsets.aprioriTrigrams]]) — candidates generated only from
    * frequent bigrams (the anti-monotone pruning), with constituent
    * bigram supports alongside. */
  def q267AprioriTrigrams(s: SparkSession, dir: String): DataFrame =
    Itemsets.aprioriTrigrams(Sources.documents(s, dir), "text",
        minSupport = 6L)
      .orderBy(col("trigram"))

  val q267Sql: String =
    """WITH ws AS (SELECT string_split(text, ' ') AS w FROM documents),
      |bg AS (SELECT w[i] AS x, w[i+1] AS y FROM (
      |         SELECT w, unnest(range(1, len(w))) AS i
      |         FROM ws WHERE len(w) >= 2)),
      |b2 AS (SELECT x, y, COUNT(*) AS c FROM bg GROUP BY 1, 2
      |       HAVING COUNT(*) >= 6),
      |cand AS (SELECT l.x || ' ' || l.y || ' ' || r.y AS trigram,
      |           l.c AS c_xy, r.c AS c_yz
      |         FROM b2 l JOIN b2 r ON r.x = l.y),
      |tg AS (SELECT w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS trigram
      |       FROM (SELECT w, unnest(range(1, len(w) - 1)) AS i
      |             FROM ws WHERE len(w) >= 3)),
      |tc AS (SELECT tg.trigram, COUNT(*) AS n FROM tg
      |       JOIN (SELECT DISTINCT trigram FROM cand) c USING (trigram)
      |       GROUP BY tg.trigram HAVING COUNT(*) >= 6)
      |SELECT tc.trigram, tc.n, cand.c_xy, cand.c_yz
      |FROM tc JOIN cand USING (trigram)
      |ORDER BY tc.trigram""".stripMargin

  // ── q268: TextRank keyword extraction ──────────────────────────────────

  /** q268: the corpus's top-20 TextRank keywords (Mihalcea & Tarau,
    * EMNLP 2004) — integer-scaled PageRank ([[Graph.pageRank]], 3
    * rounds) over the 150 strongest ±2-window co-occurrence edges
    * ([[Relevance.skipgramPairs]]); the unsupervised keyword extractor
    * built entirely from two already-verified operators. */
  def q268TextRank(s: SparkSession, dir: String): DataFrame = {
    val edges = Relevance.skipgramPairs(Sources.documents(s, dir), "text",
      window = 2, k = 150)
    Graph.pageRank(edges, "x", "y", iters = 3)
      .orderBy(col("pr_scaled").desc, col("node").asc)
      .limit(20)
      .select(col("node").as("keyword"), col("deg"), col("pr_scaled"))
      .orderBy(col("keyword"))
  }

  val q268Sql: String =
    """WITH ws AS (SELECT string_split(text, ' ') AS w FROM documents),
      |g1 AS (SELECT unnest(list_transform(range(1, len(w)), j ->
      |         {'x': least(w[j], w[j+1]), 'y': greatest(w[j], w[j+1])})) AS u
      |       FROM ws WHERE len(w) >= 2),
      |g2 AS (SELECT unnest(list_transform(range(1, len(w) - 1), j ->
      |         {'x': least(w[j], w[j+2]), 'y': greatest(w[j], w[j+2])})) AS u
      |       FROM ws WHERE len(w) >= 3),
      |gp AS (SELECT u.x AS x, u.y AS y FROM g1
      |       UNION ALL SELECT u.x, u.y FROM g2),
      |top AS (SELECT x, y FROM (
      |          SELECT x, y, COUNT(*) AS n FROM gp GROUP BY x, y
      |          ORDER BY n DESC, x, y LIMIT 150)),
      |e AS (SELECT x AS s, y AS t FROM top
      |      UNION ALL SELECT y, x FROM top),
      |deg AS (SELECT s AS node, count(*) AS deg FROM e GROUP BY s),
      |nn AS (SELECT count(*) AS n FROM deg),
      |pr0 AS (SELECT node, deg, 1000000000000 // nn.n AS pr
      |        FROM deg CROSS JOIN nn),
      |it1 AS (SELECT e.t AS node, CAST(SUM(p.pr // p.deg) AS BIGINT) AS sin
      |        FROM e JOIN pr0 p ON e.s = p.node GROUP BY e.t),
      |pr1 AS (SELECT p.node, p.deg,
      |          3000000000000 // (20 * nn.n)
      |            + (17 * COALESCE(i.sin, 0)) // 20 AS pr
      |        FROM pr0 p LEFT JOIN it1 i ON p.node = i.node CROSS JOIN nn),
      |it2 AS (SELECT e.t AS node, CAST(SUM(p.pr // p.deg) AS BIGINT) AS sin
      |        FROM e JOIN pr1 p ON e.s = p.node GROUP BY e.t),
      |pr2 AS (SELECT p.node, p.deg,
      |          3000000000000 // (20 * nn.n)
      |            + (17 * COALESCE(i.sin, 0)) // 20 AS pr
      |        FROM pr1 p LEFT JOIN it2 i ON p.node = i.node CROSS JOIN nn),
      |it3 AS (SELECT e.t AS node, CAST(SUM(p.pr // p.deg) AS BIGINT) AS sin
      |        FROM e JOIN pr2 p ON e.s = p.node GROUP BY e.t),
      |pr3 AS (SELECT p.node, p.deg,
      |          3000000000000 // (20 * nn.n)
      |            + (17 * COALESCE(i.sin, 0)) // 20 AS pr
      |        FROM pr2 p LEFT JOIN it3 i ON p.node = i.node CROSS JOIN nn)
      |SELECT keyword, deg, pr_scaled FROM (
      |  SELECT node AS keyword, deg, pr AS pr_scaled FROM pr3
      |  ORDER BY pr DESC, node LIMIT 20)
      |ORDER BY keyword""".stripMargin

  // ── q269: k-center coverage radius audit ───────────────────────────────

  /** q269: the coverage report behind the 2-approximate k-center
    * selection — every vector assigned to its nearest q168 center
    * (min 6-dp L2², ties to the smaller center id), with per-center
    * population, radius (max d²), and mean d²; the number that says
    * whether k centers actually COVER the space, which the selection
    * alone never shows. */
  def q269KCenterCoverage(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions
    val emb = Sources.embeddings(s, dir)
    val cvec = Similarity.farthestPoints(emb, "vec_id", "embedding", k = 6)
      .select(col("vec_id").as("center_id"))
      .join(emb.select(col("vec_id").as("center_id"),
        col("embedding").as("graft_cv")), "center_id")
    val assigned = emb.crossJoin(broadcast(cvec))
      .withColumn("graft_d2",
        round(VectorFunctions.l2Sq(col("embedding"), col("graft_cv")), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
    LatestSnapshot.topK(assigned, Seq("vec_id"), col("graft_d2").asc,
        Seq(col("center_id").asc), 1)
      .groupBy(col("center_id"))
      .agg(count(lit(1)).as("n_assigned"),
        max(col("graft_d2")).cast("double").as("radius_d2"),
        round(sum(col("graft_d2")).cast("double") / count(lit(1)), 6)
          .as("mean_d2"))
      .orderBy(col("center_id"))
  }

  // wraps the canonical greedy-selection chain (q168Sql), so the
  // centers here are BY CONSTRUCTION the gate-verified q168 picks
  val q269Sql: String =
    s"""WITH cs AS (SELECT vec_id AS center_id FROM (
      |${PlacementQueries.q168Sql}
      |)),
      |cv AS (SELECT cs.center_id, e.embedding AS v
      |       FROM cs JOIN embeddings e ON e.vec_id = cs.center_id),
      |a AS (SELECT e.vec_id, cv.center_id,
      |        CAST(round(list_sum(list_transform(range(1, 65), j ->
      |          (e.embedding[j]::DOUBLE - cv.v[j]::DOUBLE) *
      |          (e.embedding[j]::DOUBLE - cv.v[j]::DOUBLE))), 6)
      |          AS DECIMAL(18,6)) AS d2
      |      FROM embeddings e CROSS JOIN cv),
      |b AS (SELECT * FROM (SELECT *, row_number() OVER (
      |        PARTITION BY vec_id ORDER BY d2, center_id) AS rn FROM a)
      |      WHERE rn = 1)
      |SELECT center_id, COUNT(*) AS n_assigned,
      |  CAST(MAX(d2) AS DOUBLE) AS radius_d2,
      |  round(CAST(SUM(d2) AS DOUBLE) / COUNT(*), 6) AS mean_d2
      |FROM b GROUP BY center_id ORDER BY center_id""".stripMargin

  // ── q270: k-anonymity / l-diversity privacy audit ──────────────────────

  /** q270: the full privacy-release table over QI = (lang, 50-char
    * length bucket) with sensitive attribute `source`
    * ([[Profiling.privacyAudit]], k = 5, l = 3) — every group's
    * population, sensitive diversity, and both verdicts; the
    * homogeneity check k-anonymity alone misses. */
  def q270PrivacyAudit(s: SparkSession, dir: String): DataFrame =
    Profiling.privacyAudit(
        Sources.documents(s, dir)
          .withColumn("len_bucket", expr("n_chars div 50")),
        Seq("lang", "len_bucket"), "source", k = 5L, l = 3L)
      .orderBy(col("lang"), col("len_bucket"))

  val q270Sql: String =
    """SELECT lang, n_chars // 50 AS len_bucket, COUNT(*) AS n,
      |  COUNT(DISTINCT source) AS l_distinct,
      |  COUNT(*) >= 5 AS k_anonymous,
      |  COUNT(DISTINCT source) >= 3 AS l_diverse
      |FROM documents GROUP BY lang, n_chars // 50
      |ORDER BY lang, len_bucket""".stripMargin

  // ── q271: dedup-graph mixing by source (modularity statistics) ─────────

  private def dedupEdges(s: SparkSession, dir: String): DataFrame =
    TextDedup.minHashLshPairs(Sources.documents(s, dir), "doc_id", "text",
      k = 16, r = 4, w = 3, threshold = 0.5)

  /** q271: the Newman-modularity sufficient statistics of the LSH
    * dedup graph under the SOURCE partition
    * ([[Graph.partitionMixing]]) — per source the internal/cross edge
    * counts and degree sums that say whether near-duplicates stay
    * within sources or leak across them. */
  def q271SourceMixing(s: SparkSession, dir: String): DataFrame =
    Graph.partitionMixing(dedupEdges(s, dir), "d1", "d2",
        Sources.documents(s, dir), "doc_id", "source")
      .orderBy(col("source"))

  // wraps the ONE canonical LSH oracle chain (q19Sql), like q203/q145
  val q271Sql: String =
    s"""WITH pairs AS (SELECT d1, d2 FROM (
      |${PipelineQueries.q19Sql}
      |)),
      |e AS (SELECT DISTINCT least(d1, d2) AS a, greatest(d1, d2) AS b
      |      FROM pairs WHERE d1 <> d2),
      |t AS (SELECT e.a, e.b, da.source AS la, db.source AS lb
      |      FROM e JOIN documents da ON da.doc_id = e.a
      |      JOIN documents db ON db.doc_id = e.b),
      |m AS (SELECT COUNT(*) AS m FROM t),
      |sides AS (SELECT la AS lab, la = lb AS inter FROM t
      |          UNION ALL SELECT lb, la = lb FROM t),
      |pl AS (SELECT lab, COUNT(*) AS degree_sum,
      |         CAST(SUM(CASE WHEN inter THEN 1 ELSE 0 END) // 2 AS BIGINT)
      |           AS internal_edges,
      |         CAST(SUM(CASE WHEN NOT inter THEN 1 ELSE 0 END) AS BIGINT)
      |           AS cross_edges
      |       FROM sides GROUP BY lab),
      |nd AS (SELECT d.source AS lab, COUNT(*) AS n_nodes
      |       FROM documents d
      |       WHERE d.doc_id IN (SELECT a FROM e UNION SELECT b FROM e)
      |       GROUP BY d.source)
      |SELECT pl.lab AS source, nd.n_nodes, pl.internal_edges,
      |  pl.cross_edges, pl.degree_sum, m.m AS m_edges
      |FROM pl JOIN nd USING (lab) CROSS JOIN m
      |ORDER BY source""".stripMargin

  // ── q272: degree assortativity of the dedup graph ──────────────────────

  /** q272: the dedup graph's degree-assortativity coefficient (Newman
    * 2002) — Pearson correlation of endpoint degrees over all directed
    * edge instances, via [[Profiling.pearsonByStrata]]; disassortative
    * graphs (hubs linking to leaves — the boilerplate-star shape) go
    * negative. */
  def q272Assortativity(s: SparkSession, dir: String): DataFrame = {
    // localCheckpoint: the canonical edge list feeds THREE consumers
    // (both sides of the degree attach + the degree agg itself) — without
    // the cut each branch re-runs the whole LSH pair chain (the q175
    // symmetrized-edge precedent; measured ~2× on the sf0.1 bench)
    val p = dedupEdges(s, dir)
      .select(least(col("d1"), col("d2")).as("a"),
        greatest(col("d1"), col("d2")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(eager = false)
    val sym = p.union(p.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("graft_d"))
    val joined = sym
      .join(deg.select(col("node").as("a"), col("graft_d").as("deg_a")),
        Seq("a"))
      .join(deg.select(col("node").as("b"), col("graft_d").as("deg_b")),
        Seq("b"))
      .withColumn("graft_all", lit("all"))
    Profiling.pearsonByStrata(joined, "deg_a", "deg_b", "graft_all")
      .select(col("n").as("n_edge_ends"),
        col("r_pearson").as("assortativity"))
  }

  val q272Sql: String =
    s"""WITH pairs AS (SELECT d1, d2 FROM (
      |${PipelineQueries.q19Sql}
      |)),
      |e AS (SELECT DISTINCT least(d1, d2) AS a, greatest(d1, d2) AS b
      |      FROM pairs WHERE d1 <> d2),
      |sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
      |deg AS (SELECT a AS node, COUNT(*) AS d FROM sym GROUP BY a),
      |j AS (SELECT CAST(da.d AS DECIMAL(18,6)) AS x,
      |        CAST(round(CAST(db.d AS DOUBLE), 6) AS DECIMAL(18,6)) AS y
      |      FROM sym JOIN deg da ON da.node = sym.a
      |      JOIN deg db ON db.node = sym.b),
      |ag AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
      |         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      |       FROM j)
      |SELECT n AS n_edge_ends,
      |  CASE WHEN n >= 2
      |    AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
      |        CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      |    AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
      |        CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
      |  THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
      |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
      |        CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
      |        CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
      |  END AS assortativity
      |FROM ag""".stripMargin

  // ── q273: cross-lingual vocabulary overlap matrix ──────────────────────

  private val overlapLangs = Seq("de", "en", "es", "fr", "zh")

  /** q273: exact Jaccard overlap of every language pair's vocabulary
    * ([[TextAnalysis.vocabOverlapMatrix]]) — shared-type counts and
    * floor-ppm similarity for all 10 pairs from one corpus pass. */
  def q273VocabOverlap(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabOverlapMatrix(Sources.documents(s, dir), "text",
        "lang", overlapLangs)
      .orderBy(col("group_a"), col("group_b"))

  val q273Sql: String = {
    val flagCols = overlapLangs.zipWithIndex.map { case (l, i) =>
      s"MAX(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS f$i"
    }.mkString(", ")
    val pairRows = (for {
      i <- overlapLangs.indices; j <- overlapLangs.indices if i < j
    } yield
      s"""SELECT '${overlapLangs(i)}' AS group_a,
         |  '${overlapLangs(j)}' AS group_b,
         |  CAST(SUM(f$i) AS BIGINT) AS n_a,
         |  CAST(SUM(f$j) AS BIGINT) AS n_b,
         |  CAST(SUM(f$i * f$j) AS BIGINT) AS n_both,
         |  CAST((SUM(f$i * f$j)::HUGEINT * 1000000) //
         |    (SUM(f$i) + SUM(f$j) - SUM(f$i * f$j))::HUGEINT AS BIGINT)
         |    AS jaccard_ppm
         |FROM fl""".stripMargin).mkString("\nUNION ALL\n")
    s"""WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS t
      |           FROM documents),
      |fl AS (SELECT t, $flagCols FROM w GROUP BY t)
      |SELECT * FROM (
      |$pairRows
      |) ORDER BY group_a, group_b""".stripMargin
  }

  // ── q274: b-bit minwise calibration (Li & König 2010) ──────────────────

  /** q274: 1-bit minhash estimates vs exact Jaccard on the verified
    * near-dup pairs ([[TextDedup.bBitMinwiseCalibration]], k = 16) —
    * the audit that says whether the 32× signature-storage shrink is
    * safe at the pipeline's similarity threshold. */
  def q274BBitMinwise(s: SparkSession, dir: String): DataFrame =
    TextDedup.bBitMinwiseCalibration(Sources.documents(s, dir), "doc_id",
        "text", k = 16, w = 3, threshold = 0.5)
      .orderBy(col("d1"), col("d2"))

  val q274Sql: String =
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
      |          GROUP BY c.d1, c.d2),
      |jac AS (SELECT i.d1, i.d2,
      |    CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter) AS jaccard
      |  FROM inter i JOIN sz s1 ON i.d1 = s1.doc_id
      |               JOIN sz s2 ON i.d2 = s2.doc_id
      |  WHERE CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter) >= 0.5),
      |hw AS (SELECT doc_id,
      |         CAST(list_sum(list_transform(range(1, 9), j ->
      |           (strpos('0123456789abcdef', substr(md5('a_' || s), j, 1)) - 1)
      |             * (1::BIGINT << (4 * (8 - j))))) AS BIGINT) AS h1,
      |         CAST(list_sum(list_transform(range(1, 9), j ->
      |           (strpos('0123456789abcdef', substr(md5('b_' || s), j, 1)) - 1)
      |             * (1::BIGINT << (4 * (8 - j))))) AS BIGINT) AS h2
      |       FROM sh),
      |sig AS (SELECT doc_id, i, min((h1 + i * h2) % 4294967296) % 2 AS bit
      |        FROM hw CROSS JOIN range(0, 16) t(i) GROUP BY doc_id, i),
      |ag AS (SELECT p.d1, p.d2,
      |         CAST(SUM(CASE WHEN a.bit = b.bit THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_agree
      |       FROM jac p JOIN sig a ON a.doc_id = p.d1
      |                  JOIN sig b ON b.doc_id = p.d2 AND b.i = a.i
      |       GROUP BY 1, 2)
      |SELECT p.d1, p.d2, p.jaccard, g.n_agree,
      |  CAST((greatest(2 * g.n_agree - 16, 0)::HUGEINT * 1000000) //
      |    16::HUGEINT AS BIGINT) AS est_ppm
      |FROM jac p JOIN ag g ON p.d1 = g.d1 AND p.d2 = g.d2
      |ORDER BY p.d1, p.d2""".stripMargin

  // ── q275: dedup-graph percolation sweep ────────────────────────────────

  private val percThresholds = Seq(5, 10, 50)

  /** q275: the percolation profile of the exact-Jaccard dedup graph —
    * at each similarity threshold, the component structure
    * ([[Graph.connectedComponents]]) collapses or fragments: node/edge
    * counts, component count, and the giant-component share. The
    * phase-transition read that picks a dedup threshold structurally
    * (where the giant component dissolves) instead of by eyeballing
    * pair counts. */
  def q275Percolation(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    // ONE pass of the exact-Jaccard chain at the lowest threshold,
    // lineage-cut; each sweep point is then a cheap filter of the saved
    // pair list instead of a full inverted-index join re-run (3× chain
    // + per-CC-round recompute before; measured the bench's #2 cost)
    val base = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
        w = 3, threshold = percThresholds.min / 100.0)
      .localCheckpoint(eager = false)
    percThresholds.map { t =>
      val pairs = base.filter(col("jaccard") >= t / 100.0)
      val comp = Graph.connectedComponents(pairs, "d1", "d2")
      val sizes = comp.groupBy(col("component"))
        .agg(count(lit(1)).as("graft_sz"))
      val summary = sizes.agg(count(lit(1)).as("n_components"),
        sum(col("graft_sz")).as("n_nodes"),
        max(col("graft_sz")).as("giant_size"))
      summary.crossJoin(broadcast(
          pairs.agg(count(lit(1)).as("n_edges"))))
        .select(lit(t.toLong).as("threshold_pct"), col("n_nodes"),
          col("n_edges"), col("n_components"), col("giant_size"),
          expr("cast(giant_size * 1000000 as decimal(38,0)) div " +
            "cast(n_nodes as decimal(38,0))").cast("bigint")
            .as("giant_ppm"))
    }.reduce(_.unionByName(_)).orderBy(col("threshold_pct"))
  }

  val q275Sql: String = {
    // per threshold: the exact-Jaccard pair set, its transitive closure
    // (the q65 recursive-reachability pattern), and the summary row
    def block(t: Int): String =
      s"""p$t AS (SELECT i.d1, i.d2
         |  FROM inter i JOIN sz s1 ON i.d1 = s1.doc_id
         |               JOIN sz s2 ON i.d2 = s2.doc_id
         |  WHERE CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter)
         |    >= ${t / 100.0}),
         |e$t AS (SELECT d1 AS a, d2 AS b FROM p$t
         |        UNION SELECT d2, d1 FROM p$t),
         |reach$t(n, m) AS (
         |  SELECT DISTINCT a AS n, a AS m FROM e$t
         |  UNION
         |  SELECT r.n, e.b FROM reach$t r JOIN e$t e ON r.m = e.a),
         |comp$t AS (SELECT n, MIN(m) AS c FROM reach$t GROUP BY n),
         |cs$t AS (SELECT c, COUNT(*) AS sz FROM comp$t GROUP BY c),
         |row$t AS (SELECT $t AS threshold_pct,
         |    CAST(SUM(sz) AS BIGINT) AS n_nodes,
         |    (SELECT COUNT(*) FROM p$t) AS n_edges,
         |    COUNT(*) AS n_components,
         |    CAST(MAX(sz) AS BIGINT) AS giant_size,
         |    CAST((MAX(sz)::HUGEINT * 1000000) // SUM(sz)::HUGEINT
         |      AS BIGINT) AS giant_ppm
         |  FROM cs$t)""".stripMargin
    s"""WITH RECURSIVE
      |ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(1, len(w) - 1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      |       FROM ws WHERE len(w) >= 3),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |${percThresholds.map(block).mkString(",\n")}
      |SELECT CAST(threshold_pct AS BIGINT) AS threshold_pct, n_nodes,
      |  n_edges, n_components, giant_size, giant_ppm FROM (
      |${percThresholds.map(t => s"SELECT * FROM row$t")
        .mkString(" UNION ALL ")}
      |) ORDER BY threshold_pct""".stripMargin
  }

  // ── q276: filter yield matrix over the signals table ───────────────────

  /** q276: the what-if yield of each candidate curation filter over the
    * q257 signals table — per filter (and their conjunction), surviving
    * document/token counts and token share; the one-pass ablation read
    * a mixture decision starts from, computed WITHOUT materializing any
    * filtered corpus. */
  def q276FilterYield(s: SparkSession, dir: String): DataFrame = {
    val sig = q257SignalsTable(s, dir)
      .select(col("n_words").cast("long").as("graft_w"),
        col("gopher_keep"), col("predicted_lang"), col("ppl_tier"),
        col("dup5_cover_ppm"))
    val filters: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "all" -> lit(true),
      "gopher_keep" -> col("gopher_keep"),
      "pred_en" -> (col("predicted_lang") === "en"),
      "not_ppl_tail" ->
        (col("ppl_tier").isNotNull && col("ppl_tier") =!= "tail"),
      "low_repetition" -> (col("dup5_cover_ppm") < 200000L),
      "conjunction" -> (col("gopher_keep") &&
        (col("predicted_lang") === "en") &&
        col("ppl_tier").isNotNull && (col("ppl_tier") =!= "tail") &&
        (col("dup5_cover_ppm") < 200000L)))
    val agg = sig.agg(
      sum(col("graft_w")).as("graft_t"),
      filters.flatMap { case (n, c) => Seq(
        sum(when(c, 1L).otherwise(0L)).as(s"graft_d_$n"),
        sum(when(c, col("graft_w")).otherwise(0L)).as(s"graft_w_$n"))
      }: _*)
    filters.map { case (n, _) =>
      agg.select(lit(n).as("filter_name"),
        col(s"graft_d_$n").as("n_docs"),
        col(s"graft_w_$n").as("n_tokens"),
        expr(s"cast(graft_w_$n * 1000000 as decimal(38,0)) div " +
          "cast(graft_t as decimal(38,0))").cast("bigint")
          .as("token_share_ppm"))
    }.reduce(_.unionByName(_)).orderBy(col("filter_name"))
  }

  // wraps the composed q257 signals chain — filters evaluate on the
  // SAME verified surface the signals gate hashes
  val q276Sql: String =
    s"""WITH sig AS (SELECT * FROM (
      |${q257Sql}
      |)),
      |f AS (SELECT n_words,
      |    TRUE AS c_all,
      |    gopher_keep AS c_gopher_keep,
      |    predicted_lang = 'en' AS c_pred_en,
      |    ppl_tier IS NOT NULL AND ppl_tier <> 'tail' AS c_not_ppl_tail,
      |    dup5_cover_ppm < 200000 AS c_low_repetition,
      |    (gopher_keep AND predicted_lang = 'en' AND ppl_tier IS NOT NULL
      |     AND ppl_tier <> 'tail' AND dup5_cover_ppm < 200000)
      |      AS c_conjunction
      |  FROM sig),
      |t AS (SELECT CAST(SUM(n_words) AS HUGEINT) AS tt FROM f)
      |SELECT filter_name, n_docs, n_tokens,
      |  CAST((n_tokens::HUGEINT * 1000000) // t.tt AS BIGINT)
      |    AS token_share_ppm
      |FROM (
      |${Seq("all", "gopher_keep", "pred_en", "not_ppl_tail",
          "low_repetition", "conjunction").map(n =>
        s"""SELECT '$n' AS filter_name,
           |  CAST(SUM(CASE WHEN c_$n THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_docs,
           |  CAST(SUM(CASE WHEN c_$n THEN n_words ELSE 0 END) AS BIGINT)
           |    AS n_tokens
           |FROM f""".stripMargin).mkString("\nUNION ALL\n")}
      |) CROSS JOIN t ORDER BY filter_name""".stripMargin
}
