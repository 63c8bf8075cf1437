package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Chunking, Decontamination, MergeableStats, Packing, Relevance, Sampling, Similarity, Snapshot, Standardize, TextAnalysis, VectorAggs}
import graft.sources.Sources

/** Round-5 corpus-assembly operators: benchmark decontamination, batch
  * BM25 retrieval mining, sequence packing, source mixing, and matryoshka
  * truncation quality — the steps between "deduped corpus" and "training
  * batches", each with a DuckDB oracle reproducing the arithmetic
  * exactly. */
object CorpusQueries {

  // ── q75: benchmark decontamination ─────────────────────────────────────

  /** q75: train docs (doc_id % 13 ≠ 0) sharing ≥1 4-gram with the held-out
    * benchmark slice (doc_id % 13 = 0) — the n-gram-overlap
    * decontamination filter, eval side broadcast. */
  def q75Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    Decontamination.contaminated(
        docs.filter(col("doc_id") % 13 =!= 0),
        docs.filter(col("doc_id") % 13 === 0),
        "doc_id", "text", w = 4)
      .orderBy(col("doc_id"))
  }

  val q75Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(1, len(w) - 2),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]))
      |           AS s
      |       FROM ws WHERE len(w) >= 4)
      |SELECT t.doc_id,
      |  COUNT(DISTINCT t.s) AS n_shared_ngrams,
      |  COUNT(DISTINCT e.doc_id) AS n_eval_docs_hit
      |FROM sh t JOIN sh e ON t.s = e.s AND e.doc_id % 13 = 0
      |WHERE t.doc_id % 13 <> 0
      |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  // ── q76: batch BM25 retrieval (query table → per-query top-k) ──────────

  private val retrievalQueries: Seq[(Int, String)] = Seq(
    1 -> "join", 1 -> "merge",
    2 -> "scan", 2 -> "filter",
    3 -> "stream", 3 -> "window", 3 -> "batch")

  /** q76: top-5 documents per query for a 3-query batch under BM25
    * (k1=1.5, b=0.75 — exactly binary-representable), one corpus pass for
    * the whole query table. */
  def q76Retrieve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val queries = retrievalQueries.toDF("query_id", "term")
    Relevance.bm25RetrieveAll(Sources.documents(s, dir), "doc_id", "text",
        queries, "query_id", k = 5, k1 = 1.5, b = 0.75)
      .orderBy(col("query_id"), col("bm25").desc, col("doc_id"))
  }

  val q76Sql: String = {
    val values = retrievalQueries
      .map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    s"""WITH qt AS (SELECT * FROM (VALUES $values) AS v(query_id, term)),
       |w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |dl AS (SELECT doc_id, len(w) AS dl FROM w),
       |t AS (SELECT doc_id, unnest(w) AS term FROM w),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM t
       |       WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2),
       |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |corpus AS (SELECT count(*) AS n_docs,
       |             CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
       |sc AS (SELECT tf.doc_id, tf.term,
       |    CAST(round(
       |      ln(1.0 + CAST(c.n_docs - d.df + 0.5 AS DOUBLE)
       |                 / CAST(d.df + 0.5 AS DOUBLE))
       |      * (CAST(tf.tf AS DOUBLE) * 2.5)
       |      / (CAST(tf.tf AS DOUBLE)
       |         + 1.5 * (0.25 + 0.75 * l.dl / c.avgdl)), 6)
       |      AS DECIMAL(18,6)) AS contrib
       |  FROM tf JOIN dfc d USING (term) JOIN dl l USING (doc_id)
       |  CROSS JOIN corpus c),
       |qs AS (SELECT qt.query_id, sc.doc_id,
       |         CAST(SUM(sc.contrib) AS DOUBLE) AS bm25,
       |         count(*) AS n_terms
       |       FROM sc JOIN qt USING (term) GROUP BY 1, 2),
       |r AS (SELECT *, row_number() OVER (
       |        PARTITION BY query_id ORDER BY bm25 DESC, doc_id ASC) AS rn
       |      FROM qs)
       |SELECT query_id, doc_id, bm25, n_terms FROM r WHERE rn <= 5
       |ORDER BY query_id, bm25 DESC, doc_id""".stripMargin
  }

  // ── q77: sequence packing (concat-and-chunk) ───────────────────────────

  /** q77: packing plan at a 512-token context — per doc, its position in
    * the concatenated token stream and the context chunks it spans, via a
    * distributed exact prefix sum (no single-partition window). */
  def q77Packing(s: SparkSession, dir: String): DataFrame =
    Packing.packPlan(Sources.documents(s, dir), "doc_id", "text",
        ctxLen = 512)
      .orderBy(col("doc_id"))

  // The window SUM is CAST to BIGINT (DuckDB window SUM over
  // INTEGER/BIGINT yields HUGEINT — the q46 lesson).
  val q77Sql: String =
    """WITH t AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
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

  // ── q78: data mixing toward a uniform language distribution ───────────

  /** q78: per-language kept counts after deterministically downsampling
    * every language to a uniform share (integer-exact keep rule, seedless
    * md5 randomness). */
  def q78UniformMix(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    val totals = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val kept = Sampling.uniformMix(docs, "doc_id", "lang", salt = "mix")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
    totals.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy(col("lang"))
  }

  val q78Sql: String =
    """WITH c AS (SELECT lang, count(*) AS ns FROM documents GROUP BY lang),
      |t AS (SELECT CAST(SUM(ns) AS BIGINT) AS n, count(*) AS k FROM c),
      |f AS (SELECT d.lang FROM documents d JOIN c USING (lang) CROSS JOIN t
      |  WHERE ((strpos('0123456789abcdef',
      |            substr(md5('mix_' || d.doc_id), 1, 1)) - 1) * 16
      |         + strpos('0123456789abcdef',
      |            substr(md5('mix_' || d.doc_id), 2, 1)) - 1)
      |        * t.k * c.ns < 256 * t.n),
      |kept AS (SELECT lang, count(*) AS n_kept FROM f GROUP BY lang)
      |SELECT c.lang, c.ns AS n_docs,
      |  COALESCE(kept.n_kept, 0) AS n_kept
      |FROM c LEFT JOIN kept USING (lang) ORDER BY c.lang""".stripMargin

  // ── q80: temperature-flattened language mixing ─────────────────────────

  /** q80: per-language kept counts after temperature sampling with α=½
    * (p/q = 1/2): kept counts follow √n_lang, the smallest language is
    * kept whole. Integer-exact keep rule — `bucket²·n_s < 256²·n_min` —
    * so the oracle reproduces the decision in pure int arithmetic. */
  def q80TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    val totals = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val kept = Sampling.temperatureMix(docs, "doc_id", "lang",
        salt = "temp", p = 1, q = 2)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
    totals.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy(col("lang"))
  }

  val q80Sql: String =
    """WITH c AS (SELECT lang, count(*) AS ns FROM documents GROUP BY lang),
      |m AS (SELECT MIN(ns) AS nmin FROM c),
      |b AS (SELECT lang,
      |    CAST((strpos('0123456789abcdef',
      |            substr(md5('temp_' || doc_id), 1, 1)) - 1) * 16
      |         + strpos('0123456789abcdef',
      |            substr(md5('temp_' || doc_id), 2, 1)) - 1 AS BIGINT)
      |      AS bk
      |  FROM documents),
      |f AS (SELECT b.lang FROM b JOIN c USING (lang) CROSS JOIN m
      |  WHERE b.bk * b.bk * c.ns < 65536 * m.nmin),
      |kept AS (SELECT lang, count(*) AS n_kept FROM f GROUP BY lang)
      |SELECT c.lang, c.ns AS n_docs,
      |  COALESCE(kept.n_kept, 0) AS n_kept
      |FROM c LEFT JOIN kept USING (lang) ORDER BY c.lang""".stripMargin

  // ── q81: unigram-LM quality score ──────────────────────────────────────

  /** q81: mean token log-probability per document under the corpus's own
    * unigram distribution — the trained-LM-free perplexity proxy. Exact
    * decimal contribution sums (6-dp rounded per term), so the score is
    * partitioning- and engine-stable. */
  def q81UnigramLogProb(s: SparkSession, dir: String): DataFrame =
    Relevance.unigramLogProb(Sources.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val q81Sql: String =
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |       FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
      |ct AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS ct FROM tf GROUP BY term),
      |n AS (SELECT CAST(SUM(ct) AS DOUBLE) AS n_total FROM ct),
      |sc AS (SELECT tf.doc_id, tf.tf,
      |         CAST(round(ln(CAST(ct.ct AS DOUBLE) / n.n_total), 6)
      |           AS DECIMAL(18,6)) * tf.tf AS contrib
      |       FROM tf JOIN ct USING (term) CROSS JOIN n),
      |agg AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
      |          CAST(SUM(contrib) * 1000000 AS BIGINT) AS sm
      |        FROM sc GROUP BY doc_id)
      |SELECT doc_id, n_tokens,
      |  CASE WHEN sm < 0 THEN -((2 * (-sm) + n_tokens) // (2 * n_tokens))
      |       ELSE (2 * sm + n_tokens) // (2 * n_tokens) END AS avg_logp_micro
      |FROM agg ORDER BY doc_id""".stripMargin

  // ── q86: vocabulary coverage curve (tokenizer sizing) ──────────────────

  /** q86: token-mass coverage of the top-{10,100,1000} most frequent
    * terms — the BPE-vocab sizing curve, ranked distributed (range
    * repartition + offsets, no 1-partition window over the vocab). */
  def q86VocabCoverage(s: SparkSession, dir: String): DataFrame =
    Relevance.vocabCoverage(Sources.documents(s, dir), "text",
        cutoffs = Seq(10, 100, 1000))
      .orderBy(col("cutoff"))

  val q86Sql: String =
    """WITH t AS (SELECT unnest(string_split(text, ' ')) AS term
      |       FROM documents),
      |ct AS (SELECT term, count(*) AS ct FROM t GROUP BY term),
      |r AS (SELECT term, ct,
      |        row_number() OVER (ORDER BY ct DESC, term ASC) AS rank
      |      FROM ct),
      |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS n_total,
      |               count(*) AS n_types FROM ct),
      |cuts AS (SELECT * FROM (VALUES (10), (100), (1000)) c(cutoff)),
      |cov AS (SELECT c.cutoff,
      |          CAST(SUM(CASE WHEN r.rank <= c.cutoff THEN r.ct ELSE 0 END)
      |            AS BIGINT) AS covered_tokens
      |        FROM r CROSS JOIN cuts c GROUP BY c.cutoff)
      |SELECT cov.cutoff, cov.covered_tokens, tot.n_types, tot.n_total,
      |  CAST(cov.covered_tokens AS DOUBLE) / tot.n_total AS coverage
      |FROM cov CROSS JOIN tot ORDER BY cov.cutoff""".stripMargin

  // ── q87: per-dimension embedding whitening ─────────────────────────────

  /** q87: z-score whitening of the embedding corpus, summarized per
    * vector as sequential-fold sum / min / max of the whitened components
    * (the q62 checksum pattern — proves component-exactness without
    * hashing raw double arrays). Stats are one broadcast row; whitening
    * is a narrow codegen'd HOF. */
  def q87Whiten(s: SparkSession, dir: String): DataFrame =
    VectorAggs.whiten(Sources.embeddings(s, dir), "vec_id", "embedding")
      .select(col("vec_id"),
        round(aggregate(col("whitened"), lit(0.0), (a, x) => a + x), 6)
          .as("white_sum"),
        round(array_min(col("whitened")), 6).as("white_min"),
        round(array_max(col("whitened")), 6).as("white_max"))
      .orderBy(col("vec_id"))

  val q87Sql: String =
    """WITH x AS (SELECT vec_id, d, embedding[d]::DOUBLE AS x
      |       FROM embeddings CROSS JOIN range(1, 65) t(d)),
      |st AS (SELECT d,
      |    round(CAST(SUM(CAST(round(x, 6) AS DECIMAL(38,6))) AS DOUBLE)
      |      / COUNT(*), 6) AS mean,
      |    round(CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(38,6))) AS DOUBLE)
      |      / COUNT(*), 6) AS msq
      |  FROM x GROUP BY d),
      |sd AS (SELECT d, mean,
      |         round(sqrt(greatest(msq - mean * mean, 0)), 6) AS sd
      |       FROM st),
      |w AS (SELECT x.vec_id, x.d,
      |        CASE WHEN s.sd = 0 THEN 0.0
      |             ELSE (x.x - s.mean) / s.sd END AS w
      |      FROM x JOIN sd s USING (d)),
      |v AS (SELECT vec_id, array_agg(w ORDER BY d) AS wv
      |      FROM w GROUP BY vec_id)
      |SELECT vec_id, round(list_sum(wv), 6) AS white_sum,
      |  round(list_min(wv), 6) AS white_min,
      |  round(list_max(wv), 6) AS white_max
      |FROM v ORDER BY vec_id""".stripMargin

  // ── q88: sliding-window RAG chunking ───────────────────────────────────

  /** q88: 64-token windows at stride 48 (16-token overlap) per document —
    * the retrieval-corpus chunker. Pure per-row int math + one explode:
    * no shuffle, no window function; chunk content is carried as md5 so
    * the gate hash-checks the exact slices. */
  def q88SlidingChunks(s: SparkSession, dir: String): DataFrame =
    Chunking.slidingChunks(Sources.documents(s, dir), "doc_id", "text",
        chunkLen = 64, stride = 48)
      .orderBy(col("doc_id"), col("chunk_idx"))

  val q88Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |n AS (SELECT doc_id, w, len(w) AS n FROM ws),
      |c AS (SELECT doc_id, w, n,
      |        unnest(range(0, CASE WHEN n <= 64 THEN 1
      |                             ELSE (n - 64 + 47) // 48 + 1 END))
      |          AS chunk_idx
      |      FROM n)
      |SELECT doc_id, chunk_idx,
      |  chunk_idx * 48 AS start_tok,
      |  least(chunk_idx * 48 + 64, n) - chunk_idx * 48 AS n_chunk_tokens,
      |  md5(array_to_string(
      |    w[chunk_idx * 48 + 1 : least(chunk_idx * 48 + 64, n)], ' '))
      |    AS chunk_md5
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  // ── q90: BPE merge-candidate mining (bigram counts + PMI) ──────────────

  /** q90: the 20 most frequent adjacent token pairs with their PMI — the
    * counting step a BPE/WordPiece trainer iterates. All-occurrence
    * counts (no per-doc dedup), fixed-association PMI arithmetic, top-k
    * via TakeOrderedAndProject. */
  def q90BigramPmi(s: SparkSession, dir: String): DataFrame =
    Relevance.bigramPmiTopK(Sources.documents(s, dir), "text", k = 20)

  val q90Sql: String =
    """WITH ws AS (SELECT string_split(text, ' ') AS w FROM documents),
      |p AS (SELECT unnest(list_transform(range(1, len(w)),
      |         i -> {'x': w[i], 'y': w[i+1]})) AS p
      |      FROM ws WHERE len(w) >= 2),
      |cxy AS (SELECT p.x AS x, p.y AS y, count(*) AS c_xy FROM p
      |        GROUP BY 1, 2),
      |t AS (SELECT unnest(w) AS term FROM ws),
      |cx AS (SELECT term, count(*) AS c FROM t GROUP BY term),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tok FROM cx),
      |np AS (SELECT count(*) AS n_pair FROM p)
      |SELECT cxy.x, cxy.y, cxy.c_xy, a.c AS c_x, b.c AS c_y,
      |  round(ln((CAST(cxy.c_xy AS DOUBLE) * tot.n_tok * tot.n_tok)
      |    / (CAST(np.n_pair AS DOUBLE) * a.c * b.c)), 6) AS pmi
      |FROM cxy JOIN cx a ON cxy.x = a.term JOIN cx b ON cxy.y = b.term
      |CROSS JOIN tot CROSS JOIN np
      |ORDER BY cxy.c_xy DESC, cxy.x, cxy.y LIMIT 20""".stripMargin

  // ── q95: mergeable per-language stats (incremental maintenance) ────────

  /** q95: token stats computed on two disjoint halves and MERGED — the
    * gate compares against the oracle's direct full-corpus computation,
    * so the semigroup law `merge(stats(A), stats(B)) = stats(A∪B)` is
    * hash-verified, not just spec-asserted. */
  def q95MergeableStats(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    val halves = Seq(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
      .map(MergeableStats.tokenStats(_, "lang", "text"))
    MergeableStats.withDerived(MergeableStats.merge(halves))
      .orderBy(col("lang"))
  }

  val q95Sql: String =
    """WITH t AS (SELECT lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS n_tokens,
      |  MIN(nt) AS min_toks, MAX(nt) AS max_toks,
      |  round(CAST(SUM(nt) AS DOUBLE) / COUNT(*), 6) AS mean_toks
      |FROM t GROUP BY lang ORDER BY lang""".stripMargin

  // ── q96: exactly-N-per-stratum deterministic sample ────────────────────

  /** q96: exactly 5 documents per language, chosen by seedless md5 order
    * — the exact-size eval-set cut (rate-based samplers can't promise a
    * count). WindowGroupLimit keeps per-stratum state at N per task. */
  def q96ExactNSample(s: SparkSession, dir: String): DataFrame =
    Sampling.exactNPerStratum(Sources.documents(s, dir), "doc_id", "lang",
        salt = "ex", n = 5)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  val q96Sql: String =
    """WITH r AS (SELECT doc_id, lang, row_number() OVER (
      |    PARTITION BY lang ORDER BY md5('ex_' || doc_id), doc_id) AS rn
      |  FROM documents)
      |SELECT doc_id, lang FROM r WHERE rn <= 5 ORDER BY doc_id""".stripMargin

  // ── q97: unigram distribution drift (batch monitoring) ─────────────────

  /** q97: smoothed KL divergence of even-id vs odd-id documents' unigram
    * distributions per language — the batch-vs-batch drift monitor. */
  def q97UnigramDrift(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    Relevance.unigramDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "lang", "text")
      .orderBy(col("lang"))
  }

  val q97Sql: String =
    """WITH ta AS (SELECT lang, unnest(string_split(text, ' ')) AS term
      |       FROM documents WHERE doc_id % 2 = 0),
      |tb AS (SELECT lang, unnest(string_split(text, ' ')) AS term
      |       FROM documents WHERE doc_id % 2 = 1),
      |ca AS (SELECT lang, term, count(*) AS ca FROM ta GROUP BY 1, 2),
      |cb AS (SELECT lang, term, count(*) AS cb FROM tb GROUP BY 1, 2),
      |j AS (SELECT COALESCE(ca.lang, cb.lang) AS lang,
      |        COALESCE(ca.term, cb.term) AS term,
      |        COALESCE(ca.ca, 0) AS ca, COALESCE(cb.cb, 0) AS cb
      |      FROM ca FULL OUTER JOIN cb
      |        ON ca.lang = cb.lang AND ca.term = cb.term),
      |tot AS (SELECT lang, CAST(SUM(ca) AS BIGINT) AS n_a,
      |          CAST(SUM(cb) AS BIGINT) AS n_b, count(*) AS vocab
      |        FROM j GROUP BY lang),
      |sc AS (SELECT j.lang,
      |    CAST(round(1e6
      |        * (CAST(j.ca + 1 AS DOUBLE) / (t.n_a + t.vocab))
      |        * ln((CAST(j.ca + 1 AS DOUBLE) / (t.n_a + t.vocab))
      |           / (CAST(j.cb + 1 AS DOUBLE) / (t.n_b + t.vocab))), 6)
      |      AS DECIMAL(28,6)) AS contrib
      |  FROM j JOIN tot t ON j.lang = t.lang)
      |SELECT sc.lang, t.n_a, t.n_b, t.vocab,
      |  round(CAST(SUM(sc.contrib) AS DOUBLE), 6) AS kl_micro_nats
      |FROM sc JOIN tot t ON sc.lang = t.lang
      |GROUP BY sc.lang, t.n_a, t.n_b, t.vocab
      |ORDER BY sc.lang""".stripMargin

  // ── q104: quality-weighted sampling ────────────────────────────────────

  /** q104: per-language kept counts under score-proportional sampling
    * (keep probability = 6-dp alpha ratio) — the soft quality cut that
    * preserves tail diversity. */
  def q104WeightedSample(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val alpha = TextAnalysis.qualityCols(col("text")).toMap.apply("alpha_ratio")
    val docs = Sources.documents(s, dir)
      .select(col("doc_id"), col("lang"), round(alpha, 6).as("alpha_ratio"))
    val totals = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val kept = Sampling.weightedSample(docs, "doc_id", "alpha_ratio",
        salt = "wq")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
    totals.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy(col("lang"))
  }

  val q104Sql: String =
    """WITH q AS (SELECT doc_id, lang,
      |    round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
      |      AS DOUBLE) / length(text), 6) AS alpha_ratio
      |  FROM documents),
      |b AS (SELECT doc_id, lang, alpha_ratio,
      |    CAST(list_sum(list_transform(range(1, 5), j ->
      |      (strpos('0123456789abcdef',
      |         substr(md5('wq_' || doc_id), j, 1)) - 1)
      |        * (1::BIGINT << (4 * (4 - j))))) AS DOUBLE) AS bk
      |  FROM q),
      |kept AS (SELECT lang, count(*) AS n_kept FROM b
      |         WHERE bk < alpha_ratio * 65536.0 GROUP BY lang),
      |tot AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang)
      |SELECT tot.lang, tot.n_docs, COALESCE(kept.n_kept, 0) AS n_kept
      |FROM tot LEFT JOIN kept USING (lang) ORDER BY tot.lang""".stripMargin

  // ── q107: per-language token quotas ────────────────────────────────────

  /** q107: best documents per language admitted under a 2 000-token
    * per-language quota (en gets 4 000) — the quota form of corpus
    * mixing. One stratum-partitioned window; no global machinery. */
  def q107SourceQuota(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{ExactRound, Selection}
    val scored = Sources.documents(s, dir).select(col("doc_id"), col("lang"),
      ExactRound.halfAwayDiv(
        length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
          .cast("long") * lit(1000000L),
        length(col("text")).cast("long")).as("alpha_ppm"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    Selection.underBudgetPerStratum(scored, "n_tokens", "lang",
        Seq(col("alpha_ppm").desc, col("doc_id").asc),
        budgets = Map("en" -> 4000L), defaultBudget = 2000L)
      .select(col("doc_id"), col("lang"), col("alpha_ppm"),
        col("n_tokens"), col("cum_before"))
      .orderBy(col("doc_id"))
  }

  val q107Sql: String =
    """WITH q AS (SELECT doc_id, lang,
      |    (2 * 1000000 * length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
      |      + length(text)) // (2 * length(text)) AS alpha_ppm,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |o AS (SELECT *, CAST(COALESCE(SUM(n_tokens) OVER (
      |        PARTITION BY lang ORDER BY alpha_ppm DESC, doc_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS cum_before
      |  FROM q)
      |SELECT doc_id, lang, alpha_ppm, n_tokens, cum_before FROM o
      |WHERE cum_before + n_tokens
      |      <= CASE WHEN lang = 'en' THEN 4000 ELSE 2000 END
      |ORDER BY doc_id""".stripMargin

  // ── q108: snapshot diff (incremental refresh work list) ────────────────

  /** q108: per-document diff between a simulated re-crawl (doc_id % 11
    * rows dropped, doc_id % 7 texts edited) and the original corpus —
    * the added/removed/changed work list an incremental refresh
    * re-embeds and re-dedups instead of the whole corpus. */
  def q108SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Snapshot
    val a = Sources.documents(s, dir)
    val b = a.filter(col("doc_id") % 11 =!= 0)
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" refreshed"))).otherwise(col("text")))
    Snapshot.diff(a, b, "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  val q108Sql: String =
    """WITH a AS (SELECT doc_id, md5(text) AS ha FROM documents),
      |b AS (SELECT doc_id, md5(CASE WHEN doc_id % 7 = 0
      |          THEN text || ' refreshed' ELSE text END) AS hb
      |      FROM documents WHERE doc_id % 11 <> 0)
      |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
      |  CASE WHEN a.ha IS NULL THEN 'added'
      |       WHEN b.hb IS NULL THEN 'removed'
      |       WHEN a.ha <> b.hb THEN 'changed'
      |       ELSE 'unchanged' END AS status
      |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
      |ORDER BY doc_id""".stripMargin

  // ── q79: matryoshka truncation quality ─────────────────────────────────

  /** q79: per vector, the L2 norm and the cosine retained when truncating
    * the 64-dim embedding to its first 16 dims — the cut-depth signal for
    * a cheaper ANN index. Narrow codegen'd projection, zero shuffle. */
  def q79Matryoshka(s: SparkSession, dir: String): DataFrame =
    Similarity.matryoshkaStats(Sources.embeddings(s, dir),
        "vec_id", "embedding", dims = 16)
      .orderBy(col("vec_id"))

  val q79Sql: String =
    """WITH n AS (SELECT vec_id, len(embedding) AS dim,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> x::DOUBLE * x::DOUBLE))) AS nf,
      |    sqrt(list_sum(list_transform(embedding[1:16],
      |      x -> x::DOUBLE * x::DOUBLE))) AS np
      |  FROM embeddings)
      |SELECT vec_id, dim, round(nf, 6) AS l2_norm,
      |  round(CASE WHEN nf = 0 THEN 0.0 ELSE np / nf END, 6) AS cos_trunc
      |FROM n ORDER BY vec_id""".stripMargin

  // ── q184: MERGE-style upsert/delete application ────────────────────────

  /** q184: the Delta-style MERGE INTO observable semantics over the
    * per-user latest-state snapshot — derived upserts, deletes, and
    * brand-new keys applied via one key-partitioned anti-join + union. */
  def q184MergeApply(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DoubleType
    val e = Sources.events(s, dir).select(col("user_id"), col("value"),
      unix_micros(col("ts")).as("graft_tus"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("graft_tus").desc, col("event_id").desc)
    val cur = e.withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1)
      .select(col("user_id"), col("value"))
    val uid = col("user_id")
    val ch = cur.filter(uid % 3 === 0 || uid % 7 === 0)
      .select(uid,
        when(uid % 7 === 0, lit(null).cast(DoubleType))
          .otherwise(col("value") + 1000.0).as("value"),
        when(uid % 7 === 0, "D").otherwise("U").as("op"))
      .unionByName(cur.filter(uid % 10 === 0)
        .select((uid + 10000L).as("user_id"),
          (col("value") + 5000.0).as("value"), lit("U").as("op")))
    Snapshot.mergeApply(cur, ch, "user_id", "op")
      .select(col("user_id"), round(col("value"), 6).as("value"))
      .orderBy(col("user_id"))
  }

  val q184Sql: String =
    """WITH e AS (SELECT user_id, value,
      |    CAST(epoch_ns(ts) // 1000 AS BIGINT) AS tus, event_id
      |  FROM events),
      |cur AS (SELECT user_id, value FROM e
      |        QUALIFY row_number() OVER (PARTITION BY user_id
      |          ORDER BY tus DESC, event_id DESC) = 1),
      |ch AS (SELECT user_id,
      |         CASE WHEN user_id % 7 = 0 THEN NULL
      |              ELSE value + 1000.0 END AS value,
      |         CASE WHEN user_id % 7 = 0 THEN 'D' ELSE 'U' END AS op
      |       FROM cur WHERE user_id % 3 = 0 OR user_id % 7 = 0
      |       UNION ALL
      |       SELECT user_id + 10000, value + 5000.0, 'U'
      |       FROM cur WHERE user_id % 10 = 0),
      |m AS (SELECT c.user_id, c.value FROM cur c
      |      LEFT JOIN ch ON c.user_id = ch.user_id
      |      WHERE ch.user_id IS NULL
      |      UNION ALL
      |      SELECT user_id, value FROM ch WHERE op = 'U')
      |SELECT user_id, round(value, 6) AS value
      |FROM m ORDER BY user_id""".stripMargin

  // ── q186: incremental join maintenance ─────────────────────────────────

  /** q186: the orders⋈customer view maintained incrementally under
    * insert-only deltas on BOTH sides (ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB) — the
    * oracle recomputes the FULL new join from scratch, so a green hash
    * PROVES the maintenance algebra, not just the code. */
  def q186JoinIvm(s: SparkSession, dir: String): DataFrame = {
    val aOld = Sources.orders(s, dir).select(col("o_orderkey"),
      col("o_custkey").as("custkey"), col("o_totalprice"))
    val bOld = Sources.customer(s, dir).select(
      col("c_custkey").as("custkey"), col("c_mktsegment"))
    val deltaA = aOld.filter(col("o_orderkey") % 5 === 0)
      .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
        when(col("o_orderkey") % 10 === 0, col("custkey") + 10000L)
          .otherwise(col("custkey")).as("custkey"),
        (col("o_totalprice") + 1.5).as("o_totalprice"))
    val deltaB = bOld.filter(col("custkey") % 4 === 0)
      .select((col("custkey") + 10000L).as("custkey"),
        col("c_mktsegment"))
    Snapshot.maintainJoin(aOld, deltaA, bOld, deltaB, "custkey")
      .select(col("o_orderkey"), col("custkey"), col("c_mktsegment"),
        round(col("o_totalprice"), 6).as("totalprice"))
      .orderBy(col("o_orderkey"), col("custkey"))
  }

  val q186Sql: String =
    """WITH a0 AS (SELECT o_orderkey, o_custkey AS custkey, o_totalprice
      |            FROM orders),
      |b0 AS (SELECT c_custkey AS custkey, c_mktsegment FROM customer),
      |da AS (SELECT o_orderkey + 10000000 AS o_orderkey,
      |         CASE WHEN o_orderkey % 10 = 0 THEN custkey + 10000
      |              ELSE custkey END AS custkey,
      |         o_totalprice + 1.5 AS o_totalprice
      |       FROM a0 WHERE o_orderkey % 5 = 0),
      |db AS (SELECT custkey + 10000 AS custkey, c_mktsegment
      |       FROM b0 WHERE custkey % 4 = 0),
      |an AS (SELECT * FROM a0 UNION ALL SELECT * FROM da),
      |bn AS (SELECT * FROM b0 UNION ALL SELECT * FROM db)
      |SELECT an.o_orderkey, an.custkey, bn.c_mktsegment,
      |  round(an.o_totalprice, 6) AS totalprice
      |FROM an JOIN bn ON an.custkey = bn.custkey
      |ORDER BY an.o_orderkey, an.custkey""".stripMargin

  // ── q190: Zipf rank-frequency fit ──────────────────────────────────────

  /** q190: per-lang Zipf fit — OLS slope of ln(count) on ln(rank) over
    * the word frequency table (a healthy natural-language corpus slopes
    * near −1; synthetic or templated text flattens) — one word-count
    * agg, one per-lang rank window, the q127 decimal-moment OLS. */
  def q190Zipf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DoubleType
    val wc = Sources.documents(s, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("cnt"))
    val wRank = Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("w"))
    val pts = wc.withColumn("graft_rnk", row_number().over(wRank))
      .select(col("lang"),
        log(col("graft_rnk").cast(DoubleType)).as("lx"),
        log(col("cnt").cast(DoubleType)).as("ly"))
    Standardize.groupOls(pts, "lx", "ly", "lang").orderBy(col("lang"))
  }

  val q190Sql: String =
    """WITH wc AS (SELECT lang, unnest(string_split(text, ' ')) AS w
      |            FROM documents),
      |c AS (SELECT lang, w, count(*) AS cnt FROM wc GROUP BY 1, 2),
      |r AS (SELECT lang, cnt,
      |        row_number() OVER (PARTITION BY lang
      |          ORDER BY cnt DESC, w) AS rnk
      |      FROM c),
      |q AS (SELECT lang, ln(CAST(rnk AS DOUBLE)) AS lx,
      |        ln(CAST(cnt AS DOUBLE)) AS ly FROM r),
      |st AS (SELECT lang, COUNT(*) AS n,
      |    SUM(CAST(round(lx, 6) AS DECIMAL(28,6))) AS sx,
      |    SUM(CAST(round(ly, 6) AS DECIMAL(28,6))) AS sy,
      |    SUM(CAST(round(lx * ly, 6) AS DECIMAL(28,6))) AS sxy,
      |    SUM(CAST(round(lx * lx, 6) AS DECIMAL(28,6))) AS sxx
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

  // ── q191: KWIC concordance ─────────────────────────────────────────────

  /** q191: keyword-in-context lines for the term 'data' (±3 words) —
    * the search/review primitive; positions filtered from an index
    * sequence, bounded slices, no explode of non-matches. */
  def q191Kwic(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.concordance(Sources.documents(s, dir), "doc_id", "text",
        term = "data", window = 3)
      .orderBy(col("doc_id"), col("pos"))

  val q191Sql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
      |           FROM documents),
      |p AS (SELECT doc_id, ws,
      |        unnest(list_filter(range(1, len(ws) + 1),
      |          i -> ws[i] = 'data')) AS pos
      |      FROM t)
      |SELECT doc_id, pos,
      |  array_to_string(ws[GREATEST(pos - 3, 1):LEAST(pos + 3, len(ws))],
      |    ' ') AS context
      |FROM p ORDER BY doc_id, pos""".stripMargin
}
