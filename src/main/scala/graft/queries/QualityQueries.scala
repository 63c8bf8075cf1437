package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Decontamination, DomainDedup, Multimodal, Packing, Profiling, Relevance, Sampling, Sketches, TextAnalysis, TextDedup, VectorAggs}
import graft.sources.Sources

/** Round-9 curation-quality operators: the Gopher-style multi-rule
  * quality audit, Jelinek–Mercer interpolated perplexity scoring, and
  * embedding-space (semantic) benchmark decontamination — each with a
  * DuckDB oracle reproducing the arithmetic exactly. */
object QualityQueries {

  // ── q199: Gopher-style rule battery ────────────────────────────────────

  /** q199: per-document multi-rule quality audit —
    * [[TextAnalysis.gopherRuleAudit]] with per-rule booleans, failure
    * count, and the conjunctive keep flag. Thresholds are picked so the
    * synthetic corpus actually splits on every rule (word count ≥ 30
    * fails the short tail; top-share ≤ 0.1 fails repetitive docs). */
  def q199RuleAudit(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherRuleAudit(Sources.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val q199Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |base AS (SELECT doc_id,
      |    CAST(len(w) AS BIGINT) AS n_words,
      |    round(CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE)
      |      / len(w), 6) AS mean_word_len,
      |    CAST(len(list_filter(['the', 'and', 'of', 'a', 'to', 'in'],
      |      s -> list_contains(w, s))) AS BIGINT) AS n_stopwords,
      |    round(CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 6) AS ttr
      |  FROM ws),
      |tc AS (SELECT doc_id, MAX(cnt) AS top_cnt FROM (
      |    SELECT doc_id, x, COUNT(*) AS cnt
      |    FROM (SELECT doc_id, unnest(w) AS x FROM ws) GROUP BY 1, 2)
      |  GROUP BY 1),
      |j AS (SELECT b.*,
      |    round(CAST(t.top_cnt AS DOUBLE) / b.n_words, 6) AS top_share
      |  FROM base b JOIN tc t USING (doc_id)),
      |r AS (SELECT doc_id, n_words, mean_word_len, n_stopwords, ttr,
      |    top_share,
      |    n_words BETWEEN 30 AND 5000 AS r_word_count,
      |    mean_word_len BETWEEN 3.5 AND 10.0 AS r_mean_word_len,
      |    n_stopwords >= 2 AS r_stopwords,
      |    ttr >= 0.5 AS r_ttr,
      |    top_share <= 0.1 AS r_top_share
      |  FROM j)
      |SELECT *,
      |  CAST((NOT r_word_count)::INT + (NOT r_mean_word_len)::INT +
      |    (NOT r_stopwords)::INT + (NOT r_ttr)::INT +
      |    (NOT r_top_share)::INT AS BIGINT) AS n_failed,
      |  (r_word_count AND r_mean_word_len AND r_stopwords AND r_ttr
      |    AND r_top_share) AS keep
      |FROM r ORDER BY doc_id""".stripMargin

  // ── q200: interpolated-bigram perplexity ───────────────────────────────

  /** q200: per-document perplexity under the Jelinek–Mercer interpolated
    * corpus bigram LM (λ = 0.75) — [[Relevance.interpolatedPerplexity]];
    * the CCNet-style perplexity quality filter with the corpus as its own
    * reference model. The GATE hashes only the engine-portable surface —
    * exact per-doc sums of the model inputs plus the integer-quantized
    * probability sum ⌊10⁶·p⌋ (λ = 3/4 is rational, so it's computed with
    * pure integer arithmetic in both engines); `sum_logp`/`ppl` stay in
    * the operator's API output but off the hash because libm `ln`/`exp`
    * digits are not portable (the round-9 q200/q204 red rows). */
  def q200DocPerplexity(s: SparkSession, dir: String): DataFrame =
    Relevance.interpolatedPerplexity(Sources.documents(s, dir), "doc_id",
        "text", lambda = 0.75)
      .select(col("doc_id"), col("n_scored"), col("sum_cxy"),
        col("sum_cx"), col("sum_cy"), col("sum_pq6"))
      .orderBy(col("doc_id"))

  val q200Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |pr AS (SELECT doc_id, unnest(list_transform(range(1, len(w)), j ->
      |         {'x': w[j], 'y': w[j+1]})) AS u
      |       FROM ws WHERE len(w) >= 2),
      |p AS (SELECT doc_id, u.x AS x, u.y AS y FROM pr),
      |cxy AS (SELECT x, y, COUNT(*) AS c_xy FROM p GROUP BY 1, 2),
      |tt AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
      |cu AS (SELECT t, COUNT(*) AS c FROM tt GROUP BY 1),
      |n AS (SELECT SUM(c) AS n FROM cu),
      |tm AS (SELECT p.doc_id, c.c_xy, ux.c AS c_x, uy.c AS c_y,
      |    (1000000::HUGEINT *
      |      (75::HUGEINT * c.c_xy::HUGEINT * n.n::HUGEINT +
      |       25::HUGEINT * uy.c::HUGEINT * ux.c::HUGEINT)) //
      |    (100::HUGEINT * ux.c::HUGEINT * n.n::HUGEINT) AS pq6
      |  FROM p JOIN cxy c USING (x, y)
      |  JOIN cu ux ON ux.t = p.x
      |  JOIN cu uy ON uy.t = p.y
      |  CROSS JOIN n)
      |SELECT doc_id, COUNT(*) AS n_scored,
      |  CAST(SUM(c_xy) AS BIGINT) AS sum_cxy,
      |  CAST(SUM(c_x) AS BIGINT) AS sum_cx,
      |  CAST(SUM(c_y) AS BIGINT) AS sum_cy,
      |  CAST(SUM(pq6) AS BIGINT) AS sum_pq6
      |FROM tm GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ── q201: semantic decontamination ─────────────────────────────────────

  /** q201: training vectors (vec_id % 13 ≠ 0) whose cosine to any
    * benchmark vector (vec_id % 13 = 0) reaches τ = 0.375 (exactly
    * representable) — [[Decontamination.semanticContaminated]], the
    * paraphrase-robust complement to q75's verbatim n-gram filter. */
  def q201EmbedDecontam(s: SparkSession, dir: String): DataFrame = {
    val emb = Sources.embeddings(s, dir)
    Decontamination.semanticContaminated(
        emb.filter(col("vec_id") % 13 =!= 0),
        emb.filter(col("vec_id") % 13 === 0),
        "vec_id", "embedding", tau = 0.375)
      .orderBy(col("vec_id"))
  }

  val q201Sql: String =
    """WITH ev AS (SELECT vec_id AS eid, embedding AS evv
      |            FROM embeddings WHERE vec_id % 13 = 0),
      |cs AS (SELECT t.vec_id, ev.eid, round(
      |    list_sum(list_transform(range(1, len(t.embedding) + 1),
      |      i -> t.embedding[i]::DOUBLE * ev.evv[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, len(t.embedding) + 1),
      |       i -> t.embedding[i]::DOUBLE * t.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, len(ev.evv) + 1),
      |       i -> ev.evv[i]::DOUBLE * ev.evv[i]::DOUBLE)))), 6) AS c
      |  FROM embeddings t CROSS JOIN ev WHERE t.vec_id % 13 <> 0)
      |SELECT vec_id, COUNT(*) AS n_eval_hits, MAX(c) AS max_cosine
      |FROM cs WHERE c >= 0.375 GROUP BY vec_id ORDER BY vec_id""".stripMargin

  // ── q202: product-quantization encode ──────────────────────────────────

  /** q202: PQ encode of the embedding corpus — [[VectorAggs.pqEncode]]
    * with 4 subspaces of 16 dims and a 16-codeword seeded codebook; one
    * row per (vector, subspace) with the code and quantization error. */
  def q202PqEncode(s: SparkSession, dir: String): DataFrame =
    VectorAggs.pqEncode(Sources.embeddings(s, dir), "vec_id", "embedding",
        dims = 64, m = 4, k = 16)
      .orderBy(col("vec_id"), col("subspace"))

  val q202Sql: String =
    """WITH cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code,
      |         embedding AS cv
      |       FROM (SELECT vec_id, embedding FROM embeddings
      |             ORDER BY vec_id LIMIT 16)),
      |d AS (SELECT e.vec_id, t.j AS subspace, cb.code,
      |        round(list_sum(list_transform(range(1, 17), i ->
      |          (e.embedding[t.j * 16 + i]::DOUBLE -
      |             cb.cv[t.j * 16 + i]::DOUBLE) *
      |          (e.embedding[t.j * 16 + i]::DOUBLE -
      |             cb.cv[t.j * 16 + i]::DOUBLE))), 6) AS dist
      |      FROM embeddings e CROSS JOIN cb CROSS JOIN range(0, 4) t(j)),
      |r AS (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
      |        ORDER BY dist, code) AS rn FROM d)
      |SELECT vec_id, CAST(subspace AS INT) AS subspace,
      |  CAST(code AS INT) AS code, dist AS l2_sq
      |FROM r WHERE rn = 1 ORDER BY vec_id, subspace""".stripMargin

  // ── q203: cross-source near-dup overlap matrix ─────────────────────────

  /** q203: the source-pair near-duplication matrix over the verified
    * MinHash-LSH pairs (q19 parameters) — [[TextDedup.crossSourceOverlap]];
    * the audit run before mixture-weight selection. */
  def q203SourceOverlap(s: SparkSession, dir: String): DataFrame =
    TextDedup.crossSourceOverlap(Sources.documents(s, dir), "doc_id",
        "text", "source", k = 16, r = 4, w = 3, threshold = 0.5)
      .orderBy(col("src_a"), col("src_b"))

  // wraps the ONE canonical LSH oracle chain (q19Sql) — a parameter
  // change there propagates here, instead of a drifting inline copy
  val q203Sql: String =
    s"""WITH pairs AS (
      |  SELECT d1, d2, jaccard FROM (
      |${PipelineQueries.q19Sql}
      |  )),
      |sp AS (SELECT p.jaccard,
      |         LEAST(a.source, b.source) AS src_a,
      |         GREATEST(a.source, b.source) AS src_b
      |       FROM pairs p
      |       JOIN documents a ON a.doc_id = p.d1
      |       JOIN documents b ON b.doc_id = p.d2)
      |SELECT src_a, src_b, COUNT(*) AS n_pairs, MAX(jaccard) AS max_jaccard
      |FROM sp GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin

  // ── q204: perplexity-weighted mixture planning ─────────────────────────

  /** q204: per-source sampling weights from the interpolated-perplexity
    * scores — [[Sampling.perplexityMixtureWeights]] over q200's per-doc
    * output, strata = `source`. The GATE hashes the portable surface
    * only: exact doc/token counts, `mass_q` (Σ quantized probability —
    * predictable sources accrue more mass per token, the same direction
    * as the 1/ppl deflation), and the integer `weight_ppm`; the
    * libm-derived `sum_ppl`/`mass`/`weight` stay API-only (q200's
    * portability contract, inherited). */
  def q204MixtureWeights(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    Sampling.perplexityMixtureWeights(
        Relevance.interpolatedPerplexity(docs, "doc_id", "text",
          lambda = 0.75),
        "doc_id", docs, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("mass_q"), col("weight_ppm"))
      .orderBy(col("source"))
  }

  // wraps the canonical interpolated-perplexity chain (q200Sql) — a
  // parameter change there propagates here, not a drifting inline copy
  val q204Sql: String =
    s"""WITH ppl AS (
      |  SELECT doc_id, n_scored, sum_pq6 FROM (
      |${q200Sql}
      |  )),
      |st AS (SELECT d.source, COUNT(*) AS n_docs,
      |         CAST(SUM(p.n_scored) AS BIGINT) AS n_tokens,
      |         CAST(SUM(p.sum_pq6) AS BIGINT) AS mass_q
      |       FROM ppl p JOIN documents d USING (doc_id)
      |       GROUP BY d.source),
      |tot AS (SELECT SUM(mass_q)::HUGEINT AS total FROM st)
      |SELECT st.source, st.n_docs, st.n_tokens, st.mass_q,
      |  CAST((1000000::HUGEINT * st.mass_q::HUGEINT) // tot.total
      |    AS BIGINT) AS weight_ppm
      |FROM st CROSS JOIN tot ORDER BY st.source""".stripMargin

  // ── q205: length-grouped batch assembly ────────────────────────────────

  /** q205: sorted-batching padding audit — [[Packing.lengthGroupedBatches]]
    * over whitespace token counts, 32 docs per batch; one row per batch
    * with its padding waste. */
  def q205LengthBatching(s: SparkSession, dir: String): DataFrame =
    Packing.lengthGroupedBatches(Sources.documents(s, dir), "doc_id",
        size(split(col("text"), " ")), batchSize = 32)
      .orderBy(col("batch_id"))

  val q205Sql: String =
    """WITH m AS (SELECT doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS len
      |       FROM documents),
      |r AS (SELECT len, (row_number() OVER (ORDER BY len DESC, doc_id) - 1)
      |        // 32 AS batch_id
      |      FROM m),
      |b AS (SELECT batch_id, COUNT(*) AS n_docs, MAX(len) AS max_len,
      |        CAST(SUM(len) AS BIGINT) AS total_tokens
      |      FROM r GROUP BY batch_id)
      |SELECT batch_id, n_docs, max_len, total_tokens,
      |  n_docs * max_len AS padded_tokens,
      |  n_docs * max_len - total_tokens AS padding_tokens,
      |  CASE WHEN n_docs * max_len > 0 THEN
      |    CAST((2 * (n_docs * max_len - total_tokens)::HUGEINT * 1000000
      |        + n_docs * max_len)
      |      // (2 * (n_docs * max_len)::HUGEINT) AS BIGINT)
      |  ELSE 0 END AS padding_ppm
      |FROM b ORDER BY batch_id""".stripMargin

  // ── q206: KMV θ-intersection across sources ────────────────────────────

  /** q206: estimated distinct-3-shingle intersection for every source
    * pair from k=64 KMV sketches — [[Sketches.kmvIntersectPairs]]; the
    * sketch-state answer to q203's exact audit (k·|sources| rows of
    * state instead of per-pair corpus joins). */
  def q206KmvIntersect(s: SparkSession, dir: String): DataFrame = {
    val sh = TextDedup.shingles(Sources.documents(s, dir), "source",
      "text", w = 3)
    Sketches.kmvIntersectPairs(
        Sketches.kmvSketch(sh, "s", "source", k = 64), "source", k = 64)
      .orderBy(col("src_a"), col("src_b"))
  }

  val q206Sql: String =
    """WITH ws AS (SELECT source, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT source,
      |         unnest(list_transform(range(1, len(w) - 1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      |       FROM ws WHERE len(w) >= 3),
      |h AS (SELECT DISTINCT source, CAST(list_sum(list_transform(range(1, 9),
      |        j -> (strpos('0123456789abcdef', substr(md5(s), j, 1)) - 1)
      |          * (1::BIGINT << (4 * (8 - j))))) AS BIGINT) AS h
      |      FROM sh),
      |rk AS (SELECT source, h, row_number() OVER (PARTITION BY source
      |         ORDER BY h) AS rn FROM h),
      |sk AS (SELECT source, h FROM rk WHERE rn <= 64),
      |st AS (SELECT source, COUNT(*) AS n, MAX(h) AS hk FROM sk
      |       GROUP BY source),
      |stc AS (SELECT source, CASE WHEN n = 64 THEN hk
      |          ELSE 4294967296 END AS cut0 FROM st),
      |p AS (SELECT a.source AS src_a, b.source AS src_b,
      |        LEAST(a.cut0, b.cut0) AS cut
      |      FROM stc a JOIN stc b ON a.source < b.source),
      |cm AS (SELECT p.src_a, p.src_b, COUNT(*) AS nc
      |       FROM p JOIN sk x ON x.source = p.src_a
      |       JOIN sk y ON y.source = p.src_b AND y.h = x.h
      |       WHERE x.h <= p.cut GROUP BY 1, 2),
      |na AS (SELECT p.src_a, p.src_b, COUNT(*) AS n_a
      |       FROM p JOIN sk x ON x.source = p.src_a
      |       WHERE x.h <= p.cut GROUP BY 1, 2),
      |nb AS (SELECT p.src_a, p.src_b, COUNT(*) AS n_b
      |       FROM p JOIN sk y ON y.source = p.src_b
      |       WHERE y.h <= p.cut GROUP BY 1, 2)
      |SELECT p.src_a, p.src_b,
      |  COALESCE(cm.nc, 0) AS n_common,
      |  CASE WHEN p.cut > 0 THEN
      |    round((CAST(COALESCE(cm.nc, 0) AS DOUBLE) * 4294967296.0) /
      |      CAST(p.cut AS DOUBLE), 6) END AS est_intersection,
      |  CASE WHEN COALESCE(na.n_a, 0) + COALESCE(nb.n_b, 0)
      |         - COALESCE(cm.nc, 0) > 0 THEN
      |    round(CAST(COALESCE(cm.nc, 0) AS DOUBLE) /
      |      CAST(COALESCE(na.n_a, 0) + COALESCE(nb.n_b, 0)
      |        - COALESCE(cm.nc, 0) AS DOUBLE), 6) END AS est_jaccard
      |FROM p LEFT JOIN cm USING (src_a, src_b)
      |LEFT JOIN na USING (src_a, src_b)
      |LEFT JOIN nb USING (src_a, src_b)
      |ORDER BY src_a, src_b""".stripMargin

  // ── q207: perceptual-hash near-dup over media payloads ─────────────────

  /** q207: aHash near-dup pairs over binary payloads —
    * [[Multimodal.perceptualHash]] + the SimHash banded Hamming join
    * (bands = 4, maxDist = 3). The corpus is unioned with an id-shifted
    * copy of itself (the q18 device) so every payload has one exact
    * twin: the gate then proves identical payloads collide at Hamming 0
    * through the full banding path, alongside any accidental near-misses.
    * The twin lives at −doc_id − 1 — a disjoint id space at ANY corpus
    * size (a fixed +10000 shift collided with real ids once the corpus
    * reached 10000 documents). */
  /** NOTE (r18): this 32-bit/4×8-bit-slice configuration saturates its
    * 256-value slice space at corpus scale — q374 is the same pipeline
    * on the scale configuration (perceptualHashWide 60-bit, 15-bit
    * slices, drop-cap) and is the config a production deployment should
    * pin; this gate remains as the 32-bit baseline. */
  def q207PhashPairs(s: SparkSession, dir: String): DataFrame = {
    val payloads = Sources.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val doubled = payloads.union(
      payloads.select(-col("doc_id") - 1, col("payload")))
    TextDedup.hammingPairs(
        Multimodal.perceptualHash(doubled, "doc_id", "payload"),
        "doc_id", "phash", bits = 32, bands = 4, maxDist = 3)
      .orderBy(col("d1"), col("d2"))
  }

  val q207Sql: String =
    """WITH u AS (SELECT doc_id, text FROM documents
      |           UNION ALL SELECT -doc_id - 1, text FROM documents),
      |px AS (SELECT doc_id, i,
      |    (strpos('0123456789abcdef', substr(CASE WHEN i < 16
      |       THEN md5(text || '_px0') ELSE md5(text || '_px1') END,
      |       2 * (i % 16) + 1, 1)) - 1) * 16 +
      |    (strpos('0123456789abcdef', substr(CASE WHEN i < 16
      |       THEN md5(text || '_px0') ELSE md5(text || '_px1') END,
      |       2 * (i % 16) + 2, 1)) - 1) AS v
      |  FROM u CROSS JOIN range(0, 32) t(i)),
      |ps AS (SELECT doc_id, SUM(v) AS s FROM px GROUP BY doc_id),
      |ph AS (SELECT px.doc_id,
      |    CAST(SUM(CASE WHEN px.v * 32 > ps.s THEN (1::BIGINT << px.i)
      |      ELSE 0 END) AS BIGINT) AS phash
      |  FROM px JOIN ps USING (doc_id) GROUP BY px.doc_id),
      |sl AS (SELECT doc_id, phash, t.sl, (phash >> (t.sl * 8)) & 255 AS sv
      |       FROM ph CROSS JOIN range(0, 4) t(sl)),
      |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
      |           a.phash AS h1, b.phash AS h2
      |         FROM sl a JOIN sl b ON a.sl = b.sl AND a.sv = b.sv
      |         WHERE a.doc_id < b.doc_id)
      |SELECT d1, d2, CAST(bit_count(xor(h1, h2)) AS INTEGER) AS hamming
      |FROM cand WHERE bit_count(xor(h1, h2)) <= 3
      |ORDER BY d1, d2""".stripMargin

  // ── q374: perceptual-hash dedup on the SCALE config (wide + drop-cap) ──

  /** q374: q207's image near-dup pipeline rewired onto the Hamming
    * family's scale configuration (the r17 verdict's "wire the chosen
    * config through the Multimodal call site"):
    * [[Multimodal.perceptualHashWide]] at 60 bits feeds
    * [[TextDedup.hammingPairsDropCap]] (4×15-bit bands — 2¹⁵ values per
    * slice vs q207's 2⁸ — with maxBucket = 4). On this corpus the wide
    * phash space is collision-driven (bucket max 4 at sf0.01, 8 at
    * sf0.1: exact-dup twin piles), so the cap is inactive at sf0.01 and
    * engages only on sf0.1's hottest piles — both facts hash-verified
    * by the oracle's replayed census. Recall trade, stated honestly
    * (r18 ADVICE): exact-dup twins share an IDENTICAL phash, so a
    * twin pile's four agreeing slice buckets all contain the whole
    * pile — a pile larger than maxBucket is over-cap on ALL four
    * slices at once and its pairs ARE dropped (the deterministic
    * drop-cap trade; sf0.1's bucket max 8 > cap 4 means this bites
    * here). The loss is published, never silent: q377 gates
    * [[TextDedup.hammingExcludedBuckets]] at exactly this config. */
  def q374PhashWideDropCap(s: SparkSession, dir: String): DataFrame = {
    val payloads = Sources.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val doubled = payloads.union(
      payloads.select(-col("doc_id") - 1, col("payload")))
    TextDedup.hammingPairsDropCap(
        Multimodal.perceptualHashWide(doubled, "doc_id", "payload", 60),
        "doc_id", "phash", bits = 60, bands = 4, maxDist = 3,
        maxBucket = 4L)
      .orderBy(col("d1"), col("d2"))
  }

  val q374Sql: String =
    """WITH u AS (SELECT doc_id, text FROM documents
      |           UNION ALL SELECT -doc_id - 1, text FROM documents),
      |px AS (SELECT doc_id, i,
      |    (strpos('0123456789abcdef', substr(md5(text || '_px' ||
      |       (i // 16)::VARCHAR), 2 * (i % 16) + 1, 1)) - 1) * 16 +
      |    (strpos('0123456789abcdef', substr(md5(text || '_px' ||
      |       (i // 16)::VARCHAR), 2 * (i % 16) + 2, 1)) - 1) AS v
      |  FROM u CROSS JOIN range(0, 60) t(i)),
      |ps AS (SELECT doc_id, SUM(v) AS s FROM px GROUP BY doc_id),
      |ph AS (SELECT px.doc_id,
      |    CAST(SUM(CASE WHEN px.v * 60 > ps.s THEN (1::BIGINT << px.i)
      |      ELSE 0 END) AS BIGINT) AS phash
      |  FROM px JOIN ps USING (doc_id) GROUP BY px.doc_id),
      |sl AS (SELECT doc_id, phash, t.sl,
      |         (phash >> (t.sl * 15)) & 32767 AS sv
      |       FROM ph CROSS JOIN range(0, 4) t(sl)),
      |sz AS (SELECT sl, sv, COUNT(*) AS bs FROM sl GROUP BY 1, 2),
      |ksl AS (SELECT s.doc_id, s.phash, s.sl, s.sv
      |        FROM sl s JOIN sz ON sz.sl = s.sl AND sz.sv = s.sv
      |        WHERE sz.bs <= 4),
      |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
      |           a.phash AS h1, b.phash AS h2
      |         FROM ksl a JOIN ksl b ON a.sl = b.sl AND a.sv = b.sv
      |         WHERE a.doc_id < b.doc_id)
      |SELECT d1, d2, CAST(bit_count(xor(h1, h2)) AS INTEGER) AS hamming
      |FROM cand WHERE bit_count(xor(h1, h2)) <= 3
      |ORDER BY d1, d2""".stripMargin

  // ── q377: q374's exclusion table — the drop-cap loss, published ───────

  /** q377: [[TextDedup.hammingExcludedBuckets]] at EXACTLY q374's
    * configuration (60-bit wide phash over the doubled corpus, 4 bands,
    * maxBucket = 4) — the audit table a capped dedup run publishes next
    * to its pair count (the q339/q373 convention: exclusion is never
    * silent; r18 ADVICE asked for it at this call site specifically
    * because over-cap identical-hash twin piles lose their pairs on all
    * four slices at once). Two claims become hash-verified here: the
    * result is EMPTY at sf0.01 (bucket max 4 = cap — q374's "cap
    * inactive at sf0.01" claim) and non-empty at sf0.1 (the hottest
    * twin piles, the rows whose pairs q374 drops). */
  def q377PhashExcludedBuckets(s: SparkSession, dir: String): DataFrame = {
    val payloads = Sources.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val doubled = payloads.union(
      payloads.select(-col("doc_id") - 1, col("payload")))
    TextDedup.hammingExcludedBuckets(
        Multimodal.perceptualHashWide(doubled, "doc_id", "payload", 60),
        "doc_id", "phash", bits = 60, bands = 4, maxBucket = 4L)
      .orderBy(col("sl"), col("sv"))
  }

  val q377Sql: String =
    """WITH u AS (SELECT doc_id, text FROM documents
      |           UNION ALL SELECT -doc_id - 1, text FROM documents),
      |px AS (SELECT doc_id, i,
      |    (strpos('0123456789abcdef', substr(md5(text || '_px' ||
      |       (i // 16)::VARCHAR), 2 * (i % 16) + 1, 1)) - 1) * 16 +
      |    (strpos('0123456789abcdef', substr(md5(text || '_px' ||
      |       (i // 16)::VARCHAR), 2 * (i % 16) + 2, 1)) - 1) AS v
      |  FROM u CROSS JOIN range(0, 60) t(i)),
      |ps AS (SELECT doc_id, SUM(v) AS s FROM px GROUP BY doc_id),
      |ph AS (SELECT px.doc_id,
      |    CAST(SUM(CASE WHEN px.v * 60 > ps.s THEN (1::BIGINT << px.i)
      |      ELSE 0 END) AS BIGINT) AS phash
      |  FROM px JOIN ps USING (doc_id) GROUP BY px.doc_id),
      |sl AS (SELECT doc_id, phash, t.sl,
      |         (phash >> (t.sl * 15)) & 32767 AS sv
      |       FROM ph CROSS JOIN range(0, 4) t(sl))
      |SELECT sl, sv, COUNT(*) AS bucket_size
      |FROM sl GROUP BY 1, 2 HAVING COUNT(*) > 4
      |ORDER BY sl, sv""".stripMargin

  // ── q208: boilerplate n-gram audit ─────────────────────────────────────

  /** q208: per-document boilerplate fraction —
    * [[TextDedup.boilerplateProfile]] with 3-shingles and df ≥ 3; the
    * router for boilerplate-stripping and the df-side diagnostic for the
    * `maxDf` candidate cap. */
  def q208Boilerplate(s: SparkSession, dir: String): DataFrame =
    TextDedup.boilerplateProfile(Sources.documents(s, dir), "doc_id",
        "text", w = 3, minDf = 3)
      .orderBy(col("doc_id"))

  val q208Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(1, len(w) - 1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      |       FROM ws WHERE len(w) >= 3),
      |hv AS (SELECT s FROM sh GROUP BY s
      |       HAVING COUNT(DISTINCT doc_id) >= 3),
      |pd AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
      |bl AS (SELECT sh.doc_id, COUNT(*) AS n_boilerplate
      |       FROM sh JOIN hv USING (s) GROUP BY sh.doc_id)
      |SELECT pd.doc_id, pd.n_shingles,
      |  COALESCE(bl.n_boilerplate, 0) AS n_boilerplate,
      |  round(CAST(COALESCE(bl.n_boilerplate, 0) AS DOUBLE) /
      |    CAST(pd.n_shingles AS DOUBLE), 6) AS boiler_frac
      |FROM pd LEFT JOIN bl USING (doc_id) ORDER BY pd.doc_id""".stripMargin

  // ── q209: per-source data card ─────────────────────────────────────────

  /** q209: the per-source datasheet row — [[Profiling.sourceDataCard]]:
    * doc/token counts, language spread, exact-dup rate, token-length
    * spread with exact interpolated median. */
  def q209DataCard(s: SparkSession, dir: String): DataFrame =
    Profiling.sourceDataCard(Sources.documents(s, dir), "source", "lang",
        "text")
      .orderBy(col("source"))

  val q209Sql: String =
    """WITH m AS (SELECT source, lang, md5(text) AS h,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
      |       FROM documents)
      |SELECT source,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(ntok) AS BIGINT) AS n_tokens,
      |  COUNT(DISTINCT lang) AS n_langs,
      |  round(CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS en_frac,
      |  COUNT(DISTINCT h) AS n_distinct_texts,
      |  round(1.0 - CAST(COUNT(DISTINCT h) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS exact_dup_frac,
      |  MIN(ntok) AS min_tokens,
      |  round(quantile_cont(ntok, 0.5), 6) AS median_tokens,
      |  MAX(ntok) AS max_tokens
      |FROM m GROUP BY source ORDER BY source""".stripMargin

  // ── q210: join-key skew audit ──────────────────────────────────────────

  /** q210: the top-10 hottest lineitem part keys with row/cumulative
    * shares — [[Profiling.keySkewAudit]]; the measurement behind
    * salting / broadcast / AQE-threshold choices. */
  def q210SkewAudit(s: SparkSession, dir: String): DataFrame =
    Profiling.keySkewAudit(Sources.lineitem(s, dir), "l_partkey", k = 10)
      .orderBy(col("rank"))

  val q210Sql: String =
    """WITH c AS (SELECT l_partkey, COUNT(*) AS n FROM lineitem
      |           GROUP BY l_partkey),
      |t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_rows, COUNT(*) AS n_keys
      |      FROM c),
      |r AS (SELECT l_partkey, n,
      |        row_number() OVER (ORDER BY n DESC, l_partkey) AS rank
      |      FROM c QUALIFY rank <= 10),
      |cs AS (SELECT *, SUM(n) OVER (ORDER BY rank
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
      |       FROM r)
      |SELECT cs.rank, cs.l_partkey, cs.n,
      |  round(CAST(cs.n AS DOUBLE) / CAST(t.n_rows AS DOUBLE), 6) AS share,
      |  round(CAST(cs.cum_n AS DOUBLE) / CAST(t.n_rows AS DOUBLE), 6)
      |    AS cum_share,
      |  t.n_keys, t.n_rows
      |FROM cs CROSS JOIN t ORDER BY cs.rank""".stripMargin

  // ── q211: URL dedup + per-domain caps ──────────────────────────────────

  /** q211: the RefinedWeb-style URL/domain curation stage
    * ([[DomainDedup]]) — documents get a deterministic synthetic URL
    * (with `www.` prefixes, ports-free hosts, trailing slashes, query
    * strings, and `co.uk`-style multi-level suffixes, so the normalizer
    * and public-suffix logic are genuinely exercised), then: exact
    * first-wins dedup on the normalized URL, token caps per registrable
    * domain (d1.com tightened, d2.co.uk loosened, 120 tokens default,
    * admission by ascending doc_id), and a per-domain audit row. The
    * oracle derives the same expectations ARITHMETICALLY from doc_id —
    * an independent path that never runs the string machinery under
    * test. All gated columns are exact integers. */
  def q211DomainCaps(s: SparkSession, dir: String): DataFrame = {
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
    val surv = DomainDedup.dedupByUrl(docs, "doc_id", "url")
    val kept = DomainDedup.capPerDomain(surv, "doc_id", "url",
      size(split(col("text"), " ")),
      Map("d1.com" -> 60L, "d2.co.uk" -> 10000L), defaultBudget = 120L)
    val perDomainSurv = surv
      .withColumn("domain", DomainDedup.registrableDomain(col("url")))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        (sum(col("n_copies")) - count(lit(1))).as("n_url_dups"))
    val perDomainKept = kept.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_tokens")).as("n_tokens_kept"))
    perDomainSurv.join(perDomainKept, Seq("domain"), "left")
      .select(col("domain"), col("n_urls"), col("n_url_dups"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"))
      .orderBy(col("domain"))
  }

  // ── q213: first-occurrence novelty profile ─────────────────────────────

  /** q213: per-document novelty — [[TextDedup.noveltyProfile]] with
    * 3-shingles: how many of a doc's distinct shingles it introduces to
    * the corpus in ascending-id order (the dedup-yield signal; Σ n_novel
    * over an id prefix = that prefix's distinct-shingle count). Gate
    * columns are exact integers incl. the ⌊10⁶·frac⌋ quantization. */
  def q213NoveltyProfile(s: SparkSession, dir: String): DataFrame =
    TextDedup.noveltyProfile(Sources.documents(s, dir), "doc_id", "text",
        w = 3)
      .orderBy(col("doc_id"))

  val q213Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(1, len(w) - 1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      |       FROM ws WHERE len(w) >= 3),
      |o AS (SELECT s, MIN(doc_id) AS fd FROM sh GROUP BY s)
      |SELECT sh.doc_id, COUNT(*) AS n_shingles,
      |  CAST(SUM(CASE WHEN o.fd = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_novel,
      |  CAST((1000000::HUGEINT *
      |      CAST(SUM(CASE WHEN o.fd = sh.doc_id THEN 1 ELSE 0 END)
      |        AS HUGEINT)) // CAST(COUNT(*) AS HUGEINT) AS BIGINT)
      |    AS novelty_ppm
      |FROM sh JOIN o USING (s)
      |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin

  // ── q214: epoch allocation under a token budget ────────────────────────

  /** q214: data-constrained epoch planning (Muennighoff 2023) —
    * [[Sampling.epochAllocation]] over per-source token counts with a
    * 3-epoch repetition cap and budget = ⌊16·total/5⌋ (3.2 corpus
    * passes, computed FROM the data so both engines derive it
    * identically): small sources saturate at 3 epochs, the freed budget
    * water-fills into the large ones. All gated columns exact
    * integers. */
  def q214EpochAllocation(s: SparkSession, dir: String): DataFrame = {
    val tk = Sources.documents(s, dir)
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    val total = tk.agg(sum(col("n_tokens"))).head.getLong(0)
    Sampling.epochAllocation(tk, "source", "n_tokens",
        budgetTokens = 16L * total / 5L, maxEpochs = 3)
      .orderBy(col("source"))
  }

  val q214Sql: String =
    """WITH tk AS (SELECT source,
      |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
      |           AS n_tokens
      |       FROM documents GROUP BY source),
      |b AS (SELECT (16::HUGEINT * CAST(SUM(n_tokens) AS HUGEINT)) // 5
      |        AS bt, COUNT(*) AS n
      |      FROM tk),
      |o AS (SELECT source, n_tokens,
      |        row_number() OVER (ORDER BY n_tokens, source) AS j,
      |        SUM(n_tokens) OVER (ORDER BY n_tokens, source
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |      FROM tk),
      |s AS (SELECT o.*, b.bt, b.n,
      |        (b.bt - 3::HUGEINT * (o.cum - o.n_tokens)::HUGEINT) >=
      |          (3::HUGEINT * o.n_tokens::HUGEINT *
      |            (b.n - o.j + 1)::HUGEINT) AS saturated
      |      FROM o CROSS JOIN b),
      |t2 AS (SELECT CAST(SUM(CASE WHEN saturated THEN 1 ELSE 0 END)
      |           AS BIGINT) AS satn,
      |         CAST(COALESCE(SUM(CASE WHEN saturated THEN n_tokens END), 0)
      |           AS HUGEINT) AS sattok
      |       FROM s),
      |a AS (SELECT s.source, s.n_tokens, s.saturated,
      |        CASE WHEN s.saturated THEN 3::HUGEINT * s.n_tokens::HUGEINT
      |             ELSE (s.bt - 3::HUGEINT * t2.sattok) //
      |               (s.n - t2.satn)::HUGEINT END AS alloc
      |      FROM s CROSS JOIN t2)
      |SELECT source, n_tokens, saturated,
      |  CAST(alloc AS BIGINT) AS alloc_tokens,
      |  CAST((1000::HUGEINT * alloc) // n_tokens::HUGEINT AS BIGINT)
      |    AS epochs_milli
      |FROM a ORDER BY source""".stripMargin

  // ── q215: PQ-ADC top-k recall audit ────────────────────────────────────

  /** q215: asymmetric-distance top-10 over the q202 PQ index, graded by
    * recall against the exact ℓ² scan — [[VectorAggs.pqAdcRecall]] with
    * the q202 parameters (64 dims, 4×16 codebook) and every 67th vector
    * as the query set. ADC distances are exact DECIMAL sums of 6-dp
    * subspace entries, so the top-k and the integer recall columns are
    * engine-portable. */
  def q215PqRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = Sources.embeddings(s, dir)
    VectorAggs.pqAdcRecall(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") % 67 === 0), "vec_id",
        dims = 64, m = 4, k = 16, topK = 10)
      .orderBy(col("qid"))
  }

  // wraps the canonical PQ-encode chain (q202Sql) — parameter changes
  // there propagate here, not a drifting inline copy
  val q215Sql: String =
    s"""WITH codes AS (SELECT vec_id, subspace, code FROM (
      |${q202Sql}
      |  )),
      |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
      |       WHERE vec_id % 67 = 0),
      |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code,
      |         embedding AS cv
      |       FROM (SELECT vec_id, embedding FROM embeddings
      |             ORDER BY vec_id LIMIT 16)),
      |lut AS (SELECT qs.qid, t.j AS subspace, cb.code,
      |        CAST(round(list_sum(list_transform(range(1, 17), i ->
      |          (qs.qv[t.j * 16 + i]::DOUBLE - cb.cv[t.j * 16 + i]::DOUBLE) *
      |          (qs.qv[t.j * 16 + i]::DOUBLE - cb.cv[t.j * 16 + i]::DOUBLE)
      |          )), 6) AS DECIMAL(18,6)) AS d
      |      FROM qs CROSS JOIN cb CROSS JOIN range(0, 4) t(j)),
      |adc AS (SELECT l.qid, c.vec_id, SUM(l.d) AS ad
      |        FROM codes c
      |        JOIN lut l ON l.subspace = c.subspace AND l.code = c.code
      |        GROUP BY l.qid, c.vec_id),
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

  // ── q216: trained-PQ recall audit ──────────────────────────────────────

  /** q216: the q215 recall audit with a TRAINED codebook — one
    * per-subspace Lloyd round ([[VectorAggs.pqTrain]], Jégou §III)
    * instead of raw seeds; same queries, same k/m/topK, so the q215→q216
    * delta IS the value of training the quantizer. Exact-decimal
    * centroid means (the q61 rule) keep the whole chain
    * engine-portable. */
  def q216TrainedPqRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = Sources.embeddings(s, dir)
    val cb = VectorAggs.pqTrain(emb, "vec_id", "embedding",
      dims = 64, m = 4, k = 16, iters = 1)
    VectorAggs.pqAdcRecallWith(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") % 67 === 0), "vec_id",
        cb, dims = 64, m = 4, topK = 10)
      .orderBy(col("qid"))
  }

  private val q216SubL2 =
    """round(list_sum(list_transform(range(1, 17), i ->
      |             (s.v[i]::DOUBLE - c.cv[i]::DOUBLE) *
      |             (s.v[i]::DOUBLE - c.cv[i]::DOUBLE))), 6)""".stripMargin

  val q216Sql: String =
    s"""WITH sv AS (SELECT vec_id, t.j AS subspace,
      |         embedding[t.j * 16 + 1 : t.j * 16 + 16] AS v
      |       FROM embeddings CROSS JOIN range(0, 4) t(j)),
      |sd AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code,
      |         embedding
      |       FROM (SELECT vec_id, embedding FROM embeddings
      |             ORDER BY vec_id LIMIT 16)),
      |cb0 AS (SELECT t.j AS subspace, sd.code,
      |          sd.embedding[t.j * 16 + 1 : t.j * 16 + 16] AS cv
      |        FROM sd CROSS JOIN range(0, 4) t(j)),
      |a1 AS (SELECT subspace, code, vec_id, v FROM (
      |         SELECT s.vec_id, s.subspace, s.v, c.code, row_number()
      |           OVER (PARTITION BY s.vec_id, s.subspace ORDER BY
      |             ${q216SubL2}, c.code) AS rn
      |         FROM sv s JOIN cb0 c ON c.subspace = s.subspace) t
      |       WHERE rn = 1),
      |m1 AS (SELECT subspace, code, d,
      |         round(CAST(SUM(CAST(round(v[d]::DOUBLE, 6)
      |             AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS c
      |       FROM a1 CROSS JOIN range(1, 17) t(d)
      |       GROUP BY subspace, code, d),
      |cb1 AS (SELECT subspace, code, array_agg(c ORDER BY d) AS cv
      |        FROM m1 GROUP BY subspace, code),
      |codes AS (SELECT vec_id, subspace, code FROM (
      |         SELECT s.vec_id, s.subspace, c.code, row_number()
      |           OVER (PARTITION BY s.vec_id, s.subspace ORDER BY
      |             ${q216SubL2}, c.code) AS rn
      |         FROM sv s JOIN cb1 c ON c.subspace = s.subspace) t
      |       WHERE rn = 1),
      |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
      |       WHERE vec_id % 67 = 0),
      |lut AS (SELECT q.qid, c.subspace, c.code,
      |         CAST(round(list_sum(list_transform(range(1, 17), i ->
      |           (q.qv[c.subspace * 16 + i]::DOUBLE - c.cv[i]::DOUBLE) *
      |           (q.qv[c.subspace * 16 + i]::DOUBLE - c.cv[i]::DOUBLE)
      |           )), 6) AS DECIMAL(18,6)) AS d
      |       FROM qs q CROSS JOIN cb1 c),
      |adc AS (SELECT l.qid, c.vec_id, SUM(l.d) AS ad
      |        FROM codes c
      |        JOIN lut l ON l.subspace = c.subspace AND l.code = c.code
      |        GROUP BY l.qid, c.vec_id),
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

  // ── q217: IVF+PQ combined query path ───────────────────────────────────

  /** q217: the full billion-scale ANN serving stack graded end-to-end —
    * [[VectorAggs.ivfPqRecall]]: coarse k-means cells (the q61 surface,
    * k=4, 2 rounds), nprobe=2 cell probing, trained-PQ ADC (the q216
    * chain) over probed cells only, recall@10 vs the exact scan. The
    * q216→q217 recall delta is the price of cell pruning; the scan
    * volume drop is what it buys. */
  def q217IvfPqRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = Sources.embeddings(s, dir)
    VectorAggs.ivfPqRecall(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") % 67 === 0), "vec_id",
        dims = 64, m = 4, k = 16,
        coarseK = 4, coarseIters = 2, nprobe = 2, topK = 10)
      .orderBy(col("qid"))
  }

  // composes the TWO canonical oracle chains — coarse k-means
  // (CurationQueries.kmeansA2Ctes, the q61/q82 CTEs) and trained PQ
  // (the q216 CTEs, pq_-prefixed to avoid name collisions)
  val q217Sql: String = {
    val cos = CurationQueries.cosSql _
    s"""WITH ${CurationQueries.kmeansA2Ctes},
      |c2 AS (
      |  SELECT cluster, d, round(CAST(SUM(CAST(round(embedding[d]::DOUBLE, 6)
      |      AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS c
      |  FROM a2 CROSS JOIN range(1, 65) t(d) GROUP BY cluster, d),
      |c2v AS (SELECT cluster, array_agg(c ORDER BY d) AS cv
      |        FROM c2 GROUP BY cluster),
      |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
      |       WHERE vec_id % 67 = 0),
      |pr AS (SELECT qid, cluster FROM (
      |         SELECT q.qid, v.cluster, row_number() OVER (
      |           PARTITION BY q.qid ORDER BY ${cos("q.qv", "v.cv")}
      |             DESC, v.cluster ASC) AS rn
      |         FROM qs q CROSS JOIN c2v v) t WHERE rn <= 2),
      |pq_sv AS (SELECT vec_id, t.j AS subspace,
      |         embedding[t.j * 16 + 1 : t.j * 16 + 16] AS v
      |       FROM embeddings CROSS JOIN range(0, 4) t(j)),
      |pq_sd AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code,
      |         embedding
      |       FROM (SELECT vec_id, embedding FROM embeddings
      |             ORDER BY vec_id LIMIT 16)),
      |pq_cb0 AS (SELECT t.j AS subspace, pq_sd.code,
      |          pq_sd.embedding[t.j * 16 + 1 : t.j * 16 + 16] AS cv
      |        FROM pq_sd CROSS JOIN range(0, 4) t(j)),
      |pq_a1 AS (SELECT subspace, code, vec_id, v FROM (
      |         SELECT s.vec_id, s.subspace, s.v, c.code, row_number()
      |           OVER (PARTITION BY s.vec_id, s.subspace ORDER BY
      |             round(list_sum(list_transform(range(1, 17), i ->
      |               (s.v[i]::DOUBLE - c.cv[i]::DOUBLE) *
      |               (s.v[i]::DOUBLE - c.cv[i]::DOUBLE))), 6),
      |             c.code) AS rn
      |         FROM pq_sv s JOIN pq_cb0 c ON c.subspace = s.subspace) t
      |       WHERE rn = 1),
      |pq_m1 AS (SELECT subspace, code, d,
      |         round(CAST(SUM(CAST(round(v[d]::DOUBLE, 6)
      |             AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS c
      |       FROM pq_a1 CROSS JOIN range(1, 17) t(d)
      |       GROUP BY subspace, code, d),
      |pq_cb1 AS (SELECT subspace, code, array_agg(c ORDER BY d) AS cv
      |        FROM pq_m1 GROUP BY subspace, code),
      |pq_codes AS (SELECT vec_id, subspace, code FROM (
      |         SELECT s.vec_id, s.subspace, c.code, row_number()
      |           OVER (PARTITION BY s.vec_id, s.subspace ORDER BY
      |             round(list_sum(list_transform(range(1, 17), i ->
      |               (s.v[i]::DOUBLE - c.cv[i]::DOUBLE) *
      |               (s.v[i]::DOUBLE - c.cv[i]::DOUBLE))), 6),
      |             c.code) AS rn
      |         FROM pq_sv s JOIN pq_cb1 c ON c.subspace = s.subspace) t
      |       WHERE rn = 1),
      |cand AS (SELECT pr.qid, a2.vec_id
      |         FROM a2 JOIN pr ON a2.cluster = pr.cluster),
      |lut AS (SELECT q.qid, c.subspace, c.code,
      |         CAST(round(list_sum(list_transform(range(1, 17), i ->
      |           (q.qv[c.subspace * 16 + i]::DOUBLE - c.cv[i]::DOUBLE) *
      |           (q.qv[c.subspace * 16 + i]::DOUBLE - c.cv[i]::DOUBLE)
      |           )), 6) AS DECIMAL(18,6)) AS d
      |       FROM qs q CROSS JOIN pq_cb1 c),
      |adc AS (SELECT cd.qid, cd.vec_id, SUM(l.d) AS ad
      |        FROM cand cd
      |        JOIN pq_codes c ON c.vec_id = cd.vec_id
      |        JOIN lut l ON l.qid = cd.qid AND l.subspace = c.subspace
      |          AND l.code = c.code
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

  // ── q212: linear quality-classifier apply ──────────────────────────────

  /** The model: term → weight in milli-units, shared by the Spark query
    * and the oracle SQL (the VALUES list is GENERATED from this seq, so
    * the two sides cannot drift). Integer weights keep the logit exact. */
  val q212MilliWeights: Seq[(String, Long)] = Seq(
    "spark" -> 400L, "table" -> 250L, "query" -> 300L, "window" -> 200L,
    "merge" -> 150L, "fast" -> 100L, "sort" -> 80L,
    "slow" -> -300L, "scan" -> -120L, "the" -> -50L, "a" -> -40L)
  val q212BiasMilli: Long = -100L

  /** q212: fastText-style linear quality classifier applied at corpus
    * scale — [[TextAnalysis.linearQualityScore]] with the
    * [[q212MilliWeights]] model. The gate hashes only exact integers
    * (term/hit counts, the milli-logit, the sign label); σ stays an
    * API-only column (q200's portability rule). */
  def q212QualityClassifier(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.linearQualityScore(Sources.documents(s, dir), "doc_id",
        "text", q212MilliWeights.toMap, q212BiasMilli)
      .select(col("doc_id"), col("n_terms"), col("n_hits"),
        col("logit_milli"), col("label"))
      .orderBy(col("doc_id"))

  val q212Sql: String = {
    val values = q212MilliWeights
      .map { case (t, w) => s"('$t', ${w}::BIGINT)" }.mkString(", ")
    s"""WITH w(term, wm) AS (VALUES $values),
      |t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |      FROM documents),
      |h AS (SELECT t.doc_id, COUNT(*) AS n_hits,
      |        CAST(SUM(w.wm) AS BIGINT) AS zsum
      |      FROM t JOIN w USING (term) GROUP BY t.doc_id),
      |n AS (SELECT doc_id,
      |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_terms
      |      FROM documents)
      |SELECT n.doc_id, n.n_terms,
      |  COALESCE(h.n_hits, 0) AS n_hits,
      |  CAST(COALESCE(h.zsum, 0) + ${q212BiasMilli} AS BIGINT)
      |    AS logit_milli,
      |  (COALESCE(h.zsum, 0) + ${q212BiasMilli}) > 0 AS label
      |FROM n LEFT JOIN h ON n.doc_id = h.doc_id
      |ORDER BY n.doc_id""".stripMargin
  }

  val q211Sql: String =
    """WITH u AS (SELECT doc_id,
      |    'd' || CAST(doc_id % 50 AS VARCHAR) ||
      |      CASE WHEN doc_id % 3 = 0 THEN '.co.uk' ELSE '.com' END
      |      AS domain,
      |    CAST(doc_id % 100 AS VARCHAR) AS path,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w
      |  FROM documents),
      |s AS (SELECT domain, path, MIN(doc_id) AS doc_id,
      |        COUNT(*) AS n_copies
      |      FROM u GROUP BY domain, path),
      |sv AS (SELECT s.domain, s.doc_id, s.n_copies, u.w
      |       FROM s JOIN u ON s.doc_id = u.doc_id),
      |cum AS (SELECT domain, doc_id, n_copies, w,
      |    COALESCE(SUM(w) OVER (PARTITION BY domain ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre,
      |    CASE WHEN domain = 'd1.com' THEN 60
      |         WHEN domain = 'd2.co.uk' THEN 10000
      |         ELSE 120 END AS cap
      |  FROM sv)
      |SELECT domain,
      |  COUNT(*) AS n_urls,
      |  CAST(SUM(n_copies) - COUNT(*) AS BIGINT) AS n_url_dups,
      |  CAST(SUM(CASE WHEN pre + w <= cap THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_kept,
      |  CAST(SUM(CASE WHEN pre + w <= cap THEN w ELSE 0 END) AS BIGINT)
      |    AS n_tokens_kept
      |FROM cum GROUP BY domain ORDER BY domain""".stripMargin
}
