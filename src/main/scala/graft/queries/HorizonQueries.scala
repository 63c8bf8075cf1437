package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{ExactRound, Graph, Relevance, Standardize, TextDedup}
import graft.sources.Sources

/** Round-11 widening: cascade-model ranking quality (ERR), seed-anchored
  * graph centrality, multi-rater label reliability, and character-level
  * near-dup grading — every hashed surface exact-integer by construction
  * (the PORTABILITY.md discipline: no rounded rationals, no libm). */
object HorizonQueries {

  // ── q299: Expected Reciprocal Rank @10 ─────────────────────────────────

  /** q299: ERR@10 per language (Chapelle 2009 cascade model) over the
    * q163 ranking (n_chars desc, doc_id tiebreak; graded rel = capped
    * count of "the") — the satisfaction-aware companion to q163's NDCG.
    * One exact integer numerator over the constant denominator
    * lcm(1..10)·2^30; top-10 selection via the bounded-priority-queue
    * collector, so nothing is globally sorted. */
  def q299Err(s: SparkSession, dir: String): DataFrame = {
    val d = Sources.documents(s, dir).select(col("lang"), col("doc_id"),
      col("n_chars"),
      least(lit(3), size(filter(split(col("text"), " "),
        w => w === "the"))).cast(LongType).as("rel"))
    Relevance.errAtK(d, "lang", "n_chars", "doc_id", "rel", k = 10,
        gradeBits = 3)
      .orderBy(col("lang"))
  }

  val q299Sql: String =
    """WITH RECURSIVE d AS (SELECT lang, doc_id, n_chars,
      |    LEAST(3, len(list_filter(string_split(text, ' '),
      |      x -> x = 'the'))) AS rel
      |  FROM documents),
      |r AS (SELECT lang, rel, row_number() OVER (PARTITION BY lang
      |        ORDER BY n_chars DESC, doc_id) AS rn
      |      FROM d QUALIFY rn <= 10),
      |g AS (SELECT lang, count(*) AS n_items FROM r GROUP BY lang),
      |rec(lang, rn, num, prod) AS (
      |  SELECT lang, 0, 0::BIGINT, 1::BIGINT FROM g
      |  UNION ALL
      |  SELECT rec.lang, rec.rn + 1,
      |    rec.num + (2520 // (rec.rn + 1))
      |      * (1::BIGINT << (3 * (10 - (rec.rn + 1))))
      |      * ((1::BIGINT << r.rel) - 1) * rec.prod,
      |    rec.prod * ((1::BIGINT << 3) - (1::BIGINT << r.rel) + 1)
      |  FROM rec JOIN r ON r.lang = rec.lang AND r.rn = rec.rn + 1),
      |fin AS (SELECT lang, MAX(rn) AS mr FROM rec GROUP BY lang),
      |sel AS (SELECT rec.lang, rec.num FROM rec
      |        JOIN fin ON rec.lang = fin.lang AND rec.rn = fin.mr)
      |SELECT g.lang, CAST(g.n_items AS BIGINT) AS n_items,
      |  sel.num AS err_num,
      |  2520::BIGINT * (1::BIGINT << 30) AS err_den,
      |  (2 * sel.num * 1000000 + 2520::BIGINT * (1::BIGINT << 30))
      |    // (2 * 2520::BIGINT * (1::BIGINT << 30)) AS err_micro
      |FROM g JOIN sel ON g.lang = sel.lang
      |ORDER BY g.lang""".stripMargin

  // ── q300: harmonic centrality from seed documents ──────────────────────

  /** q300: harmonic centrality of every node of the q19 near-dup graph
    * w.r.t. the 5 smallest-id nodes as trusted seeds (Marchiori & Latora
    * 2001; Boldi & Vigna 2014) — multi-source BFS to depth 6, hashed as
    * the exact Σ⌊10⁶/d⌋ integer. */
  def q300Harmonic(s: SparkSession, dir: String): DataFrame = {
    // the LSH chain feeds three consumers (edges, node set, seed cut) —
    // cut its lineage ONCE so the chain runs once, not per consumer
    val pairs = TextDedup.minHashLshPairs(Sources.documents(s, dir),
      "doc_id", "text", k = 16, r = 4, w = 3, threshold = 0.5)
      .localCheckpoint()
    val nodes = pairs.select(col("d1").as("node"))
      .union(pairs.select(col("d2").as("node"))).distinct()
    val seeds = nodes.orderBy(col("node")).limit(5)
    Graph.harmonicCentrality(pairs, "d1", "d2", seeds, "node", maxDepth = 6)
      .select(col("node").as("doc_id"), col("n_seeds_reached"),
        col("score_micro"))
      .orderBy(col("doc_id"))
  }

  val q300Sql: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT d1, d2 FROM (
       |${PipelineQueries.q19Sql}
       |  )),
       |e AS (SELECT d1 AS a, d2 AS b FROM pairs
       |      UNION SELECT d2 AS a, d1 AS b FROM pairs),
       |nodes AS (SELECT DISTINCT a AS node FROM e),
       |seeds AS (SELECT node FROM nodes ORDER BY node LIMIT 5),
       |reach(seed, node, d) AS (
       |  SELECT node, node, 0 FROM seeds
       |  UNION
       |  SELECT r.seed, e.b, r.d + 1 FROM reach r
       |  JOIN e ON e.a = r.node WHERE r.d < 6),
       |dm AS (SELECT seed, node, MIN(d) AS d FROM reach
       |       GROUP BY seed, node),
       |sc AS (SELECT node, CAST(count(*) AS BIGINT) AS n_seeds_reached,
       |         CAST(SUM(1000000 // d) AS BIGINT) AS score_micro
       |       FROM dm WHERE d >= 1 GROUP BY node)
       |SELECT n.node AS doc_id,
       |  COALESCE(sc.n_seeds_reached, 0) AS n_seeds_reached,
       |  COALESCE(sc.score_micro, 0) AS score_micro
       |FROM nodes n LEFT JOIN sc ON sc.node = n.node
       |ORDER BY doc_id""".stripMargin

  // ── q301: Krippendorff's alpha over heuristic quality raters ───────────

  /** q301: inter-rater reliability (Krippendorff 1970, nominal) of three
    * deterministic quality "raters" — alpha-ratio tier, length tier,
    * stopword tier — the standard "do our quality heuristics even agree"
    * audit before any of them gates a corpus cut. Exact integer
    * D_o/D_e rationals; alpha in half-away micro units. */
  def q301Krippendorff(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    val alphaPpm = ExactRound.halfAwayDiv(
      length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
        .cast(LongType) * lit(1000000L),
      length(col("text")).cast(LongType))
    val nStop = size(filter(split(col("text"), " "),
      w => w.isInCollection(Seq("the", "and", "of", "a", "to", "in"))))
    val labeled = docs.select(col("doc_id"),
      when(alphaPpm < 700000L, 0).when(alphaPpm < 850000L, 1).otherwise(2)
        .as("ra"),
      when(col("n_chars") < 600, 0).when(col("n_chars") < 1200, 1)
        .otherwise(2).as("rb"),
      when(nStop < 5, 0).when(nStop < 15, 1).otherwise(2).as("rc"))
    val long = labeled.select(col("doc_id"), col("ra").as("label"))
      .union(labeled.select(col("doc_id"), col("rb").as("label")))
      .union(labeled.select(col("doc_id"), col("rc").as("label")))
    Standardize.krippendorffAlpha(long, "doc_id", "label")
  }

  val q301Sql: String =
    """WITH l AS (SELECT doc_id,
      |    (2 * 1000000 * length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
      |      + length(text)) // (2 * length(text)) AS ppm,
      |    n_chars,
      |    len(list_filter(string_split(text, ' '),
      |      x -> x IN ('the', 'and', 'of', 'a', 'to', 'in'))) AS ns
      |  FROM documents),
      |v AS (SELECT doc_id, CASE WHEN ppm < 700000 THEN 0
      |        WHEN ppm < 850000 THEN 1 ELSE 2 END AS label FROM l
      |      UNION ALL
      |      SELECT doc_id, CASE WHEN n_chars < 600 THEN 0
      |        WHEN n_chars < 1200 THEN 1 ELSE 2 END FROM l
      |      UNION ALL
      |      SELECT doc_id, CASE WHEN ns < 5 THEN 0
      |        WHEN ns < 15 THEN 1 ELSE 2 END FROM l),
      |uc AS (SELECT doc_id, label, count(*) AS nuc FROM v GROUP BY 1, 2),
      |pu AS (SELECT doc_id, SUM(nuc) AS r, SUM(nuc * (nuc - 1)) AS dou
      |       FROM uc GROUP BY doc_id),
      |da AS (SELECT count(*) AS n_units, MIN(r) AS rmin, MAX(r) AS rmax,
      |         SUM(dou) AS do0 FROM pu),
      |ca AS (SELECT label, SUM(nuc) AS nc FROM uc GROUP BY label),
      |de AS (SELECT SUM(nc) AS nn, SUM(nc * (nc - 1)) AS de0 FROM ca),
      |x AS (SELECT n_units, rmin AS n_raters, rmin = rmax AS complete,
      |        (n_units * rmin * (rmin - 1) - do0)::HUGEINT AS a,
      |        (n_units * rmin * (rmin - 1))::HUGEINT AS b,
      |        (nn * (nn - 1) - de0)::HUGEINT AS c,
      |        (nn * (nn - 1))::HUGEINT AS d
      |      FROM da CROSS JOIN de)
      |SELECT CAST(n_units AS BIGINT) AS n_units,
      |  CAST(n_raters AS BIGINT) AS n_raters, complete,
      |  CAST(a AS BIGINT) AS do_num,
      |  CAST(b AS BIGINT) AS do_den,
      |  CAST(c AS BIGINT) AS de_num,
      |  CAST(d AS BIGINT) AS de_den,
      |  CASE WHEN c <> 0 THEN
      |    CASE WHEN (b * c - a * d) < 0
      |      THEN -CAST(((2 * (-(b * c - a * d)) * 1000000 + b * c)
      |        // (2 * b * c)) AS BIGINT)
      |      ELSE CAST(((2 * (b * c - a * d) * 1000000 + b * c)
      |        // (2 * b * c)) AS BIGINT) END
      |  END AS alpha_micro
      |FROM x""".stripMargin

  // ── q302: character-bigram F1 over near-dup candidates ─────────────────

  /** q302: chrF-style character-bigram F1 (Popović 2015) for every q19
    * LSH candidate pair — the character-level second opinion on word
    * Jaccard; F1 = 2m/(h+r) as one exact rational in micro units. */
  def q302ChrF(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    val pairs = TextDedup.minHashLshPairs(docs, "doc_id", "text",
      k = 16, r = 4, w = 3, threshold = 0.5)
    TextDedup.charBigramF1Pairs(docs, pairs, "doc_id", "text")
      .orderBy(col("d1"), col("d2"))
  }

  val q302Sql: String =
    s"""WITH pairs AS (
       |  SELECT d1, d2 FROM (
       |${PipelineQueries.q19Sql}
       |  )),
       |bg AS (SELECT doc_id, g, count(*) AS c FROM
       |         (SELECT doc_id, unnest(list_transform(
       |            range(1, length(text)), i -> substr(text, i, 2))) AS g
       |          FROM documents WHERE length(text) >= 2)
       |       GROUP BY doc_id, g),
       |tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS tot FROM bg
       |        GROUP BY doc_id),
       |ov AS (SELECT p.d1, p.d2,
       |         CAST(SUM(LEAST(b1.c, b2.c)) AS BIGINT) AS m
       |       FROM pairs p
       |       JOIN bg b1 ON b1.doc_id = p.d1
       |       JOIN bg b2 ON b2.doc_id = p.d2 AND b2.g = b1.g
       |       GROUP BY p.d1, p.d2)
       |SELECT p.d1, p.d2, COALESCE(ov.m, 0) AS m,
       |  COALESCE(t1.tot, 0) AS h, COALESCE(t2.tot, 0) AS r,
       |  (4 * COALESCE(ov.m, 0) * 1000000
       |    + (COALESCE(t1.tot, 0) + COALESCE(t2.tot, 0)))
       |    // (2 * (COALESCE(t1.tot, 0) + COALESCE(t2.tot, 0)))
       |    AS f1_micro
       |FROM pairs p
       |LEFT JOIN ov ON ov.d1 = p.d1 AND ov.d2 = p.d2
       |LEFT JOIN tot t1 ON t1.doc_id = p.d1
       |LEFT JOIN tot t2 ON t2.doc_id = p.d2
       |ORDER BY p.d1, p.d2""".stripMargin

  // ── q303: facility-location greedy subset selection ────────────────────

  /** q303: submodular facility-location greedy
    * ([[graft.operators.VectorAggs.facilityLocationGreedy]], Lin &
    * Bilmes 2011) — pick 5 of the 16 candidate vectors (vec_id < 16)
    * that maximize total corpus coverage Σ_v max_s cos(v, s); the
    * oracle replays all 5 greedy rounds unrolled, decimal-exact. */
  def q303Facility(s: SparkSession, dir: String): DataFrame =
    graft.operators.VectorAggs.facilityLocationGreedy(
        Sources.embeddings(s, dir), "vec_id", "embedding",
        col("vec_id") < 16, k = 5)
      .orderBy(col("sel_rank"))

  val q303Sql: String = {
    val cos = CurationQueries.cosSql _
    val rounds = (1 to 5).map { i =>
      val excl = (1 until i).map(j => s"sims.c <> (SELECT c FROM s$j)")
        .mkString(" AND ")
      val where = if (i == 1) "" else s"WHERE $excl"
      s"""g$i AS (SELECT sims.c,
         |  CAST(SUM(greatest(sims.sim - cv${i - 1}.cov,
         |    CAST(0 AS DECIMAL(18,6)))) AS DECIMAL(38,6)) AS gain
         |  FROM sims JOIN cv${i - 1} ON sims.v = cv${i - 1}.v
         |  $where GROUP BY sims.c),
         |s$i AS (SELECT c, gain FROM g$i ORDER BY gain DESC, c LIMIT 1),
         |cv$i AS (SELECT cv${i - 1}.v,
         |  CAST(greatest(cv${i - 1}.cov, sims.sim) AS DECIMAL(18,6)) AS cov
         |  FROM cv${i - 1} JOIN sims ON sims.v = cv${i - 1}.v
         |  JOIN s$i ON sims.c = s$i.c)""".stripMargin
    }.mkString(",\n")
    val out = (1 to 5).map(i =>
      s"SELECT CAST($i AS BIGINT) AS sel_rank, c AS vec_id, " +
        s"CAST(gain * 1000000 AS BIGINT) AS gain_micro FROM s$i")
      .mkString("\nUNION ALL ")
    s"""WITH cands AS (SELECT vec_id AS c, embedding AS cv
       |  FROM embeddings WHERE vec_id < 16),
       |sims AS (SELECT e.vec_id AS v, c.c,
       |  CAST(${cos("e.embedding", "c.cv")} AS DECIMAL(18,6)) AS sim
       |  FROM embeddings e CROSS JOIN cands c),
       |cv0 AS (SELECT DISTINCT v, CAST(0 AS DECIMAL(18,6)) AS cov
       |        FROM sims),
       |$rounds
       |$out
       |ORDER BY sel_rank""".stripMargin
  }

  // ── q304: priority sampling with HT subset-sum prices ──────────────────

  /** q304: priority sampling ([[graft.operators.Sampling.prioritySample]],
    * Duffield–Lund–Thorup 2007) of 20 documents weighted by n_chars —
    * every kept row priced at its exact Horvitz–Thompson weight
    * max(w, τ) as a rational (integer cross-multiplied τ comparison). */
  def q304Priority(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.prioritySample(
        Sources.documents(s, dir), "doc_id", "n_chars",
        salt = "ps11", k = 20)
      .orderBy(col("rn"))

  val q304Sql: String =
    """WITH w AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
      |    CAST(list_sum(list_transform(range(1, 13), j ->
      |      (strpos('0123456789abcdef',
      |         substr(md5('ps11_' || CAST(doc_id AS VARCHAR)), j, 1)) - 1)
      |        * (1::BIGINT << (4 * (12 - j))))) AS BIGINT) AS h
      |  FROM documents),
      |q AS (SELECT doc_id, w, w * 281474976710656 AS qn, h + 1 AS qd,
      |        CAST(w * 281474976710656 AS DOUBLE) / CAST(h + 1 AS DOUBLE)
      |          AS qdbl
      |      FROM w),
      |r AS (SELECT *, row_number() OVER (ORDER BY qdbl DESC, doc_id)
      |        AS rn FROM q QUALIFY rn <= 21),
      |tau AS (SELECT qn AS tn, qd AS td FROM r WHERE rn = 21),
      |s AS (SELECT * FROM r WHERE rn <= 20)
      |SELECT s.doc_id, s.w, CAST(s.rn AS BIGINT) AS rn,
      |  CASE WHEN tau.tn IS NULL OR s.w * tau.td >= tau.tn
      |       THEN s.w ELSE tau.tn END AS ht_num,
      |  CASE WHEN tau.tn IS NULL OR s.w * tau.td >= tau.tn
      |       THEN 1 ELSE tau.td END AS ht_den,
      |  CASE WHEN tau.tn IS NULL OR s.w * tau.td >= tau.tn
      |    THEN s.w * 1000000
      |    ELSE CAST((2 * tau.tn::HUGEINT * 1000000 + tau.td)
      |      // (2 * tau.td::HUGEINT) AS BIGINT) END
      |    AS ht_micro
      |FROM s LEFT JOIN tau ON TRUE
      |ORDER BY s.rn""".stripMargin

  // ── q305: BPE merge-rule training ──────────────────────────────────────

  /** q305: the first 5 BPE merges learned from the corpus word-frequency
    * dictionary ([[graft.operators.TextAnalysis.learnBpeMerges]],
    * Sennrich 2016) — the tokenizer-trainer artifact, exact counts and
    * a deterministic (count desc, left, right) tiebreak. */
  def q305Bpe(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.learnBpeMerges(
        Sources.documents(s, dir), "text", nMerges = 5)
      .orderBy(col("rank"))

  /** The shared BPE-trainer CTE chain (wf, w0, p/m/w 1..5) — q305 reads
    * the merge table off it, q307 re-applies the same merges to the
    * per-language dictionary. One canonical copy, no drift. */
  private def bpeStagesSql: String = {
    val stages = (1 to 5).map { i =>
      s"""p$i AS (SELECT u.l AS l, u.r AS r,
         |  CAST(SUM(f) AS BIGINT) AS cnt FROM (
         |    SELECT f, unnest(list_transform(range(1, len(ws)),
         |      j -> {'l': ws[j], 'r': ws[j + 1]})) AS u
         |    FROM (SELECT string_split(s, ' ') AS ws, f FROM w${i - 1}) q
         |    WHERE len(ws) >= 2) z
         |  GROUP BY u.l, u.r),
         |m$i AS (SELECT l, r, cnt FROM p$i
         |        ORDER BY cnt DESC, l, r LIMIT 1),
         |w$i AS (SELECT trim(replace(replace(
         |    ' ' || replace(w${i - 1}.s, ' ', '  ') || ' ',
         |    ' ' || m.l || '  ' || m.r || ' ',
         |    ' ' || m.l || m.r || ' '), '  ', ' ')) AS s, f
         |  FROM w${i - 1} CROSS JOIN m$i m)""".stripMargin
    }.mkString(",\n")
    s"""wf AS (SELECT w, count(*) AS f FROM
       |    (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
       |  WHERE length(w) > 0 GROUP BY w),
       |w0 AS (SELECT array_to_string(list_transform(
       |    range(1, length(w) + 1), i -> substr(w, i, 1)), ' ') AS s, f
       |  FROM wf),
       |$stages""".stripMargin
  }

  val q305Sql: String = {
    val out = (1 to 5).map(i =>
      s"""SELECT CAST($i AS BIGINT) AS rank, l AS "left", r AS "right",
         |  cnt AS pair_count FROM m$i""".stripMargin)
      .mkString("\nUNION ALL ")
    s"""WITH $bpeStagesSql
       |$out
       |ORDER BY rank""".stripMargin
  }

  // ── q306: confident-learning label-noise joint ─────────────────────────

  private val clLabels = Seq("de", "en", "es", "fr", "zh")

  /** q306: the confident joint C[noisy][predicted]
    * ([[graft.operators.Classify.confidentJoint]], Northcutt 2021) of
    * the lang labels under the q233 Rocchio scores — off-diagonal cells
    * estimate label errors; thresholds are exact per-class score-mean
    * rationals, qualification by integer cross-multiplication. */
  def q306ConfidentJoint(s: SparkSession, dir: String): DataFrame =
    graft.operators.Classify.confidentJoint(Sources.documents(s, dir),
        "doc_id", "text", "lang", clLabels)
      .orderBy(col("lang"), col("predicted"))

  val q306Sql: String = {
    val lv = clLabels.map(l => s"'$l'").mkString(", ")
    s"""WITH tf AS (SELECT doc_id, t AS term, COUNT(*) AS tf FROM
       |       (SELECT doc_id, unnest(string_split(text, ' ')) AS t
       |        FROM documents) GROUP BY 1, 2),
       |cent AS (SELECT tf.term, d.lang AS c, SUM(tf.tf) AS w
       |         FROM tf JOIN documents d USING (doc_id) GROUP BY 1, 2),
       |ct AS (SELECT c, SUM(w) AS n FROM cent GROUP BY 1),
       |dots AS (SELECT tf.doc_id, cent.c, SUM(tf.tf * cent.w) AS dot
       |         FROM tf JOIN cent USING (term) GROUP BY 1, 2),
       |lf AS (SELECT unnest([$lv]) AS c),
       |ap AS (SELECT d.doc_id, d.lang, lf.c,
       |         COALESCE(dt.dot, 0) AS dot, ct.n
       |       FROM documents d CROSS JOIN lf
       |       JOIN ct ON ct.c = lf.c
       |       LEFT JOIN dots dt ON dt.doc_id = d.doc_id AND dt.c = lf.c),
       |q AS (SELECT doc_id, lang, c,
       |        (dot::HUGEINT * 1000000000000::HUGEINT) // n::HUGEINT AS q
       |      FROM ap),
       |thr AS (SELECT c, CAST(SUM(q) AS BIGINT) AS tnum,
       |          COUNT(*) AS tden
       |        FROM q WHERE lang = c GROUP BY c),
       |nl AS (SELECT lang, COUNT(*) AS n_labeled FROM documents
       |       GROUP BY lang),
       |qual AS (SELECT q.doc_id, q.lang, q.c, q.q FROM q
       |         JOIN thr ON thr.c = q.c
       |         WHERE q.q::HUGEINT * thr.tden::HUGEINT
       |               >= thr.tnum::HUGEINT),
       |best AS (SELECT doc_id, lang, c AS predicted, row_number() OVER (
       |           PARTITION BY doc_id ORDER BY q DESC, c ASC) AS rn
       |         FROM qual)
       |SELECT b.lang, b.predicted, COUNT(*) AS n_confident, nl.n_labeled
       |FROM best b JOIN nl ON nl.lang = b.lang WHERE rn = 1
       |GROUP BY b.lang, b.predicted, nl.n_labeled
       |ORDER BY b.lang, b.predicted""".stripMargin
  }

  // ── q307: BPE subword fertility per language ───────────────────────────

  /** q307: tokens-per-word fertility per language under the q305 merge
    * table ([[graft.operators.TextAnalysis.bpeFertility]], Rust 2021's
    * tokenizer-quality lens) — which languages the learned vocabulary
    * under-serves; exact integer counts + half-away fertility micro. */
  def q307BpeFertility(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.bpeFertility(Sources.documents(s, dir),
        "text", "lang", nMerges = 5)
      .orderBy(col("lang"))

  val q307Sql: String = {
    val applies = (1 to 5).map { i =>
      s"""lw$i AS (SELECT lang, trim(replace(replace(
         |    ' ' || replace(lw${i - 1}.s, ' ', '  ') || ' ',
         |    ' ' || m.l || '  ' || m.r || ' ',
         |    ' ' || m.l || m.r || ' '), '  ', ' ')) AS s, f
         |  FROM lw${i - 1} CROSS JOIN m$i m)""".stripMargin
    }.mkString(",\n")
    s"""WITH $bpeStagesSql,
       |lwf AS (SELECT lang, w, count(*) AS f FROM
       |    (SELECT lang, unnest(string_split(text, ' ')) AS w
       |     FROM documents) t
       |  WHERE length(w) > 0 GROUP BY lang, w),
       |lw0 AS (SELECT lang, array_to_string(list_transform(
       |    range(1, length(w) + 1), i -> substr(w, i, 1)), ' ') AS s, f
       |  FROM lwf),
       |$applies
       |SELECT lang, CAST(SUM(f) AS BIGINT) AS n_words,
       |  CAST(SUM(f * len(string_split(s, ' '))) AS BIGINT) AS n_subwords,
       |  (2 * CAST(SUM(f * len(string_split(s, ' '))) AS BIGINT) * 1000000
       |    + CAST(SUM(f) AS BIGINT)) // (2 * CAST(SUM(f) AS BIGINT))
       |    AS fertility_micro
       |FROM lw5 GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ── q308: iterative proportional fitting (raking) ──────────────────────

  /** q308: IPF raking ([[graft.operators.Sampling.ipfRake]], Deming &
    * Stephan 1940) of the (lang, source) table to uniform marginals on
    * BOTH axes — 2 sweeps in exact integer ppm fixed point; the
    * balancing a single-axis mixer cannot do. */
  def q308IpfRake(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.ipfRake(Sources.documents(s, dir),
      "lang", "source", sweeps = 2)

  val q308Sql: String = {
    def half(i: Int, prev: String, axis: String, axisSize: String) =
      s"""s$i AS (SELECT $axis, SUM(n_docs::HUGEINT * w_ppm::HUGEINT)
         |          AS sm FROM $prev GROUP BY $axis),
         |c$i AS (SELECT p.lang, p.source, p.n_docs,
         |  CAST((2 * p.w_ppm::HUGEINT * t.nn::HUGEINT * 1000000
         |        + $axisSize::HUGEINT * s$i.sm)
         |    // (2 * $axisSize::HUGEINT * s$i.sm) AS BIGINT) AS w_ppm
         |  FROM $prev p JOIN s$i USING ($axis) CROSS JOIN t)""".stripMargin
    s"""WITH c0 AS (SELECT lang, source, count(*) AS n_docs,
       |    1000000::BIGINT AS w_ppm
       |  FROM documents GROUP BY lang, source),
       |t AS (SELECT SUM(n_docs) AS nn, COUNT(DISTINCT lang) AS nr,
       |        COUNT(DISTINCT source) AS nc FROM c0),
       |${half(1, "c0", "lang", "t.nr")},
       |${half(2, "c1", "source", "t.nc")},
       |${half(3, "c2", "lang", "t.nr")},
       |${half(4, "c3", "source", "t.nc")}
       |SELECT lang, source, n_docs, w_ppm FROM c4
       |ORDER BY lang, source""".stripMargin
  }

  // ── q309: AMS second-moment (F2) sketch ────────────────────────────────

  /** q309: the AMS tug-of-war F₂ sketch
    * ([[graft.operators.Sketches.amsF2]], Alon–Matias–Szegedy 1996)
    * over per-source event user keys — self-join size estimated from
    * 32 ±1 estimators, exact F₂ alongside so the gate pins the
    * observed error; all integer arithmetic. */
  def q309AmsF2(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.amsF2(
      Sources.events(s, dir).select(col("event_type").as("stratum"),
        col("user_id")),
      "stratum", "user_id", k = 32)

  val q309Sql: String =
    """WITH c AS (SELECT event_type AS stratum, user_id AS k,
      |    count(*) AS c FROM events GROUP BY 1, 2),
      |ex AS (SELECT stratum,
      |         CAST(SUM(c::HUGEINT * c::HUGEINT) AS BIGINT)
      |           AS f2_exact,
      |         CAST(SUM(c) AS BIGINT) AS n_rows
      |       FROM c GROUP BY stratum),
      |sg AS (SELECT stratum, k, c, j,
      |         CASE WHEN (strpos('0123456789abcdef',
      |             substr(md5('ams_' || CAST(j AS VARCHAR) || '_'
      |               || CAST(k AS VARCHAR)), 1, 1)) - 1) % 2 = 0
      |           THEN 1 ELSE -1 END AS s
      |       FROM c CROSS JOIN range(0, 32) t(j)),
      |z AS (SELECT stratum, j, CAST(SUM(s * c) AS BIGINT) AS z
      |      FROM sg GROUP BY stratum, j),
      |est AS (SELECT stratum,
      |          CAST(SUM(z::HUGEINT * z::HUGEINT) AS BIGINT)
      |            AS est_sum,
      |          COUNT(*) AS n_sketches
      |        FROM z GROUP BY stratum)
      |SELECT ex.stratum, ex.n_rows, ex.f2_exact, est.est_sum,
      |  CAST(est.n_sketches AS BIGINT) AS n_sketches,
      |  CAST((2 * est.est_sum::HUGEINT * 1000000 + est.n_sketches)
      |    // (2 * est.n_sketches::HUGEINT) AS BIGINT) AS f2_est_micro
      |FROM ex JOIN est USING (stratum)
      |ORDER BY ex.stratum""".stripMargin
}
