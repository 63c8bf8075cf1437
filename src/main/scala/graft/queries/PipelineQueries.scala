package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Multimodal, Similarity, TextAnalysis, TextDedup}
import graft.sources.Sources

/**
 * Training-data-pipeline operator queries (dedup, similarity search, text
 * analysis, multimodal) over the `documents` and `embeddings` testdata
 * tables, each with a DuckDB oracle.
 *
 * Everything probabilistic (MinHash, SimHash, hyperplane LSH) uses
 * md5-derived hashing, which both engines compute identically — so even
 * the sketch pipelines hash-match the oracle exactly, not just
 * statistically. Cosine scores are rounded to 6 dp on both sides before
 * ranking: the underlying double folds are sequential in both engines, and
 * rounding absorbs any last-ulp divergence.
 */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String) = Sources.documents(s, dir)
  private def embs(s: SparkSession, dir: String) = Sources.embeddings(s, dir)

  // ── Exact dedup ────────────────────────────────────────────────────────

  /** q18: exact dedup by content hash over a self-union (guaranteed
    * duplicates): smallest doc_id survives, copies counted. */
  def q18DedupExact(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), md5(col("text")).as("text_md5"))
    TextDedup.exactDedup(d.union(d), "doc_id", Seq("text_md5"))
      .select(col("doc_id"), col("text_md5"), col("n_copies"))
      .orderBy(col("doc_id"))
  }

  val q18Sql: String =
    """SELECT min(doc_id) AS doc_id, text_md5, count(*) AS n_copies
      |FROM (SELECT doc_id, md5(text) AS text_md5 FROM documents
      |      UNION ALL
      |      SELECT doc_id, md5(text) AS text_md5 FROM documents) u
      |GROUP BY text_md5 ORDER BY doc_id""".stripMargin

  // ── MinHash + LSH near-dup ─────────────────────────────────────────────

  /** q19: MinHash(16)+LSH(4 bands × 4) candidate pairs verified at exact
    * 3-shingle Jaccard ≥ 0.5. r=4 keeps the band-collision rate for
    * low-similarity pairs at j⁴ — on a vocab-dense corpus r=2 floods the
    * verifier with ~j² false candidates (measured 25× slower at sf0.1). */
  def q19MinHashLsh(s: SparkSession, dir: String): DataFrame =
    TextDedup.minHashLshPairs(docs(s, dir), "doc_id", "text",
        k = 16, r = 4, w = 3, threshold = 0.5)
      .orderBy(col("d1"), col("d2"))

  val q19Sql: String =
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
      |          GROUP BY c.d1, c.d2)
      |SELECT i.d1, i.d2,
      |  CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter) AS jaccard
      |FROM inter i JOIN sz s1 ON i.d1 = s1.doc_id JOIN sz s2 ON i.d2 = s2.doc_id
      |WHERE CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter) >= 0.5
      |ORDER BY d1, d2""".stripMargin

  // ── Exact n-gram Jaccard (inverted-index join, the LSH ground truth) ───

  /** q20: exact 3-shingle Jaccard ≥ 0.5 pairs via inverted-index join. */
  def q20NgramJaccard(s: SparkSession, dir: String): DataFrame =
    TextDedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text",
        w = 3, threshold = 0.5)
      .orderBy(col("d1"), col("d2"))

  val q20Sql: String =
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
      |FROM inter i JOIN sz s1 ON i.d1 = s1.doc_id JOIN sz s2 ON i.d2 = s2.doc_id
      |WHERE CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter) >= 0.5
      |ORDER BY d1, d2""".stripMargin

  /** q85: asymmetric containment pairs — |A∩B| / min(|A|,|B|) ≥ 0.6 —
    * the subsumption/quote-inclusion detector Jaccard misses. */
  def q85NgramContainment(s: SparkSession, dir: String): DataFrame =
    TextDedup.ngramContainmentPairs(docs(s, dir), "doc_id", "text",
        w = 3, threshold = 0.6)
      .orderBy(col("d1"), col("d2"))

  val q85Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(1, len(w) - 1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      |       FROM ws WHERE len(w) >= 3),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT i.d1, i.d2, i.inter, s1.n AS n1, s2.n AS n2,
      |  CAST(i.inter AS DOUBLE) / least(s1.n, s2.n) AS containment
      |FROM inter i JOIN sz s1 ON i.d1 = s1.doc_id JOIN sz s2 ON i.d2 = s2.doc_id
      |WHERE CAST(i.inter AS DOUBLE) / least(s1.n, s2.n) >= 0.6
      |ORDER BY d1, d2""".stripMargin

  /** q101: MinHash estimator calibration over the exact near-dup pairs —
    * signature-agreement estimate vs true Jaccard, the measurement that
    * sizes k. */
  def q101MinhashCalibration(s: SparkSession, dir: String): DataFrame =
    TextDedup.minHashCalibration(docs(s, dir), "doc_id", "text",
        k = 16, w = 3, threshold = 0.5)
      .orderBy(col("d1"), col("d2"))

  val q101Sql: String =
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
      |sig AS (SELECT doc_id, i, min((h1 + i * h2) % 4294967296) AS sig
      |        FROM hw CROSS JOIN range(0, 16) t(i) GROUP BY doc_id, i),
      |ag AS (SELECT p.d1, p.d2,
      |         CAST(SUM(CASE WHEN a.sig = b.sig THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_agree
      |       FROM jac p JOIN sig a ON a.doc_id = p.d1
      |                  JOIN sig b ON b.doc_id = p.d2 AND b.i = a.i
      |       GROUP BY 1, 2)
      |SELECT p.d1, p.d2, p.jaccard, g.n_agree,
      |  round(CAST(g.n_agree AS DOUBLE) / 16, 6) AS est_jaccard,
      |  round(CAST(g.n_agree AS DOUBLE) / 16 - p.jaccard, 6) AS est_error
      |FROM jac p JOIN ag g ON p.d1 = g.d1 AND p.d2 = g.d2
      |ORDER BY p.d1, p.d2""".stripMargin

  /** q106: edit-distance-verified near-dups — LSH candidates cut at
    * Levenshtein ≤ 60, the character-level dedup notion. */
  def q106EditDistance(s: SparkSession, dir: String): DataFrame =
    TextDedup.editDistancePairs(docs(s, dir), "doc_id", "text",
        maxDist = 60)
      .orderBy(col("d1"), col("d2"))

  val q106Sql: String =
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
      |         WHERE a.doc_id < b.doc_id)
      |SELECT c.d1, c.d2,
      |  levenshtein(t1.text, t2.text) AS edit_dist
      |FROM cand c JOIN documents t1 ON c.d1 = t1.doc_id
      |            JOIN documents t2 ON c.d2 = t2.doc_id
      |WHERE levenshtein(t1.text, t2.text) <= 60
      |ORDER BY c.d1, c.d2""".stripMargin

  /** q98: maximal repeated-substring spans (every 5-gram shared with
    * another doc), merged per document — the exact-substring dedup cut
    * list. */
  def q98RepeatedSpans(s: SparkSession, dir: String): DataFrame =
    TextDedup.repeatedSpans(docs(s, dir), "doc_id", "text", w = 5)
      .orderBy(col("doc_id"), col("span_start"))

  val q98Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |gu AS (SELECT doc_id,
      |        unnest(list_transform(range(1, len(w) - 3),
      |          j -> {'pos': j - 1, 's': array_to_string(w[j:j+4], ' ')}))
      |          AS u
      |      FROM ws WHERE len(w) >= 5),
      |g AS (SELECT doc_id, u.pos AS pos, u.s AS s FROM gu),
      |dfc AS (SELECT s, count(DISTINCT doc_id) AS nd FROM g GROUP BY s),
      |sh AS (SELECT g.doc_id, g.pos FROM g JOIN dfc USING (s)
      |       WHERE dfc.nd > 1),
      |flags AS (SELECT doc_id, pos,
      |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) = 1
      |         THEN 0 ELSE 1 END AS nf
      |  FROM sh),
      |runs AS (SELECT doc_id, pos,
      |    CAST(SUM(nf) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS run_id
      |  FROM flags)
      |SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 4 AS span_end,
      |  COUNT(*) AS n_grams
      |FROM runs GROUP BY doc_id, run_id
      |ORDER BY doc_id, span_start""".stripMargin

  // ── SimHash signatures ─────────────────────────────────────────────────

  /** q21: 32-bit SimHash per document. */
  def q21SimHash(s: SparkSession, dir: String): DataFrame =
    TextDedup.simHash(docs(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val q21Sql: String =
    """WITH words AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
      |               FROM documents),
      |bits AS (SELECT doc_id, b,
      |           (strpos('0123456789abcdef',
      |              substr(md5(w), (b // 4) + 1, 1)) - 1) AS nib
      |         FROM words CROSS JOIN range(0, 32) t(b)),
      |bsum AS (SELECT doc_id, b,
      |           sum(((nib >> (3 - (b % 4))) & 1) * 2 - 1) AS bsum
      |         FROM bits GROUP BY doc_id, b)
      |SELECT doc_id,
      |  CAST(sum(CASE WHEN bsum > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT)
      |    AS simhash
      |FROM bsum GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q109: SimHash near-dups by exact-recall Hamming search — pigeonhole
    * banding (4×8-bit slices of the 32-bit hash) guarantees every pair
    * within 3 bits collides on some slice; bit_count(xor) verifies. */
  def q109HammingPairs(s: SparkSession, dir: String): DataFrame =
    TextDedup.hammingPairs(
        TextDedup.simHash(docs(s, dir), "doc_id", "text"),
        "doc_id", "simhash", bits = 32, bands = 4, maxDist = 3)
      .orderBy(col("d1"), col("d2"))

  /** q363: q109's pigeonhole Hamming search with the salt-split cap
    * ENGAGED (maxBucket = 8): the 4×8-bit slice space holds only 1024
    * buckets, so at ~1.9k docs (sf0.01) buckets average ~7.5 members
    * and at ~19k (sf0.1) ~75 — the (slice, value) self-join is the
    * DENSEST single-key shape in the dedup layer, far hotter than the
    * text band join, and identical signatures (exact dups) pile onto
    * all four of their slices. The oracle is q109's UNCAPPED chain:
    * hash-green = losslessness with the cap engaging hard at both SFs. */
  def q363HammingCapped(s: SparkSession, dir: String): DataFrame =
    TextDedup.hammingPairs(
        TextDedup.simHash(docs(s, dir), "doc_id", "text"),
        "doc_id", "simhash", bits = 32, bands = 4, maxDist = 3,
        maxBucket = Some(8L))
      .orderBy(col("d1"), col("d2"))

  /** The q109/q363/q371/q372/q373 simhash + pigeonhole-slice WITH-chain
    * members at any (bits, sliceBits): words → ±1 bit sums → `bits`-wide
    * simhash → (slice, value) rows over 4 bands. */
  private[queries] def simHashSliceSql(bits: Int, sliceBits: Int): String = {
    // the chain hardcodes 4 bands (range(0, 4)); an inconsistent
    // (bits, sliceBits) pair would build a silently wrong oracle
    require(bits == 4 * sliceBits,
      s"simHashSliceSql: bits=$bits must equal 4*sliceBits=${4 * sliceBits}")
    val mask = (1L << sliceBits) - 1
    s"""words AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
      |               FROM documents),
      |bits AS (SELECT doc_id, b,
      |           (strpos('0123456789abcdef',
      |              substr(md5(w), (b // 4) + 1, 1)) - 1) AS nib
      |         FROM words CROSS JOIN range(0, $bits) t(b)),
      |bsum AS (SELECT doc_id, b,
      |           sum(((nib >> (3 - (b % 4))) & 1) * 2 - 1) AS bsum
      |         FROM bits GROUP BY doc_id, b),
      |sh AS (SELECT doc_id,
      |  CAST(sum(CASE WHEN bsum > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT)
      |    AS simhash
      |  FROM bsum GROUP BY doc_id),
      |sl AS (SELECT doc_id, simhash, t.sl,
      |         (simhash >> (t.sl * $sliceBits)) & $mask AS sv
      |       FROM sh CROSS JOIN range(0, 4) t(sl))""".stripMargin
  }

  val q109Sql: String =
    s"""WITH ${simHashSliceSql(32, 8)},
      |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
      |           a.simhash AS h1, b.simhash AS h2
      |         FROM sl a JOIN sl b ON a.sl = b.sl AND a.sv = b.sv
      |         WHERE a.doc_id < b.doc_id)
      |SELECT d1, d2,
      |  CAST(bit_count(xor(h1, h2)) AS INTEGER) AS hamming
      |FROM cand WHERE bit_count(xor(h1, h2)) <= 3
      |ORDER BY d1, d2""".stripMargin

  // ── q371/q372/q373: the Hamming family's dense-space scale path ───────

  /** q371: [[TextDedup.hammingPairs]] over a WIDENED signature —
    * [[TextDedup.simHashWide]] at 60 bits, 4 bands ⇒ 15-bit slices,
    * 2¹⁵ = 32,768 values per band vs the 32-bit config's 256 (q109) —
    * the scale remedy the q363 honest-negative prescribed for uniformly
    * dense pigeonhole spaces. Measured on this corpus the widening cuts
    * bucket density ~10× at the median (sf0.1: median 1 vs 5, p99 69
    * vs 538) but the text's boilerplate clusters STILL pile identical
    * wide signatures into hot buckets (max 1582 at sf0.1) — which is
    * why the ≤~×3 sharedBands row belongs to q372's widened+drop-cap
    * composition, not to any uncapped generator (verbatim replicas
    * share every slice at any width, so uncapped pair output is
    * quadratic in replication BY CONSTRUCTION). Pigeonhole recall stays
    * EXACT (maxDist 3 ≤ bands − 1) over the finer 60-bit near-dup
    * notion; the oracle replays the full chain. */
  def q371HammingWide(s: SparkSession, dir: String): DataFrame =
    TextDedup.hammingPairs(
        TextDedup.simHashWide(docs(s, dir), "doc_id", "text", 60),
        "doc_id", "simhash", bits = 60, bands = 4, maxDist = 3)
      .orderBy(col("d1"), col("d2"))

  val q371Sql: String =
    s"""WITH ${simHashSliceSql(60, 15)},
      |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
      |           a.simhash AS h1, b.simhash AS h2
      |         FROM sl a JOIN sl b ON a.sl = b.sl AND a.sv = b.sv
      |         WHERE a.doc_id < b.doc_id)
      |SELECT d1, d2,
      |  CAST(bit_count(xor(h1, h2)) AS INTEGER) AS hamming
      |FROM cand WHERE bit_count(xor(h1, h2)) <= 3
      |ORDER BY d1, d2""".stripMargin

  /** q372: [[TextDedup.hammingPairsDropCap]] — widened slices AND the
    * bounded-volume drop-cap composed: 60-bit simhash, 4×15-bit bands,
    * maxBucket = 12, which ENGAGES at both SFs (over-cap buckets: 18 at
    * sf0.01, 186 at sf0.1 — the boilerplate signature clusters). Per
    *-bucket fan-out is ≤ 12² by construction and total candidate volume
    * stays bounded under densification (the sharedBands weak-scaling
    * row), which no lossless generator can promise — its pair OUTPUT is
    * quadratic in bucket density. The recall trade is deterministic
    * (kept pair ⟺ some under-cap agreeing slice), replayed exactly by
    * the oracle's census + cap, and published loudly by q373. */
  def q372HammingDropCap(s: SparkSession, dir: String): DataFrame =
    TextDedup.hammingPairsDropCap(
        TextDedup.simHashWide(docs(s, dir), "doc_id", "text", 60),
        "doc_id", "simhash", bits = 60, bands = 4, maxDist = 3,
        maxBucket = 12L)
      .orderBy(col("d1"), col("d2"))

  val q372Sql: String =
    s"""WITH ${simHashSliceSql(60, 15)},
      |sz AS (SELECT sl, sv, COUNT(*) AS bs FROM sl GROUP BY 1, 2),
      |ksl AS (SELECT s.doc_id, s.simhash, s.sl, s.sv
      |        FROM sl s JOIN sz ON sz.sl = s.sl AND sz.sv = s.sv
      |        WHERE sz.bs <= 12),
      |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
      |           a.simhash AS h1, b.simhash AS h2
      |         FROM ksl a JOIN ksl b ON a.sl = b.sl AND a.sv = b.sv
      |         WHERE a.doc_id < b.doc_id)
      |SELECT d1, d2,
      |  CAST(bit_count(xor(h1, h2)) AS INTEGER) AS hamming
      |FROM cand WHERE bit_count(xor(h1, h2)) <= 3
      |ORDER BY d1, d2""".stripMargin

  /** q373: [[TextDedup.hammingExcludedBuckets]] at q372's exact
    * configuration — the dropped slice buckets as visible rows
    * (sl, sv, bucket_size): the audit table a capped Hamming dedup run
    * publishes next to its pair count (the q339 convention). */
  def q373HammingExcluded(s: SparkSession, dir: String): DataFrame =
    TextDedup.hammingExcludedBuckets(
        TextDedup.simHashWide(docs(s, dir), "doc_id", "text", 60),
        "doc_id", "simhash", bits = 60, bands = 4, maxBucket = 12L)
      .orderBy(col("sl"), col("sv"))

  val q373Sql: String =
    s"""WITH ${simHashSliceSql(60, 15)}
      |SELECT sl, sv, COUNT(*) AS bucket_size
      |FROM sl GROUP BY 1, 2 HAVING COUNT(*) > 12
      |ORDER BY sl, sv""".stripMargin

  /** q376: q372's widened+drop-cap pipeline at the TIGHT production cap
    * (maxBucket = 8): the knob positioned BELOW the expected duplication
    * multiplicity, so under K-fold corpus densification every
    * replicated bucket (≥ K members per original doc) is dropped
    * outright and the run degrades to census + small-bucket joins —
    * the configuration whose weak-scaling ratio stays ≤ ~×3 under
    * sharedBands where q372's cap = 12 pays the (≤ cap)² pair output on
    * kept replicated buckets (measured ×4.46: lossless-within-cap
    * physics, sub-linear but quadratic in kept-bucket density). Same
    * deterministic recall contract, oracle replays census + cap at 8. */
  def q376HammingTightCap(s: SparkSession, dir: String): DataFrame =
    TextDedup.hammingPairsDropCap(
        TextDedup.simHashWide(docs(s, dir), "doc_id", "text", 60),
        "doc_id", "simhash", bits = 60, bands = 4, maxDist = 3,
        maxBucket = 8L)
      .orderBy(col("d1"), col("d2"))

  val q376Sql: String =
    s"""WITH ${simHashSliceSql(60, 15)},
      |sz AS (SELECT sl, sv, COUNT(*) AS bs FROM sl GROUP BY 1, 2),
      |ksl AS (SELECT s.doc_id, s.simhash, s.sl, s.sv
      |        FROM sl s JOIN sz ON sz.sl = s.sl AND sz.sv = s.sv
      |        WHERE sz.bs <= 8),
      |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
      |           a.simhash AS h1, b.simhash AS h2
      |         FROM ksl a JOIN ksl b ON a.sl = b.sl AND a.sv = b.sv
      |         WHERE a.doc_id < b.doc_id)
      |SELECT d1, d2,
      |  CAST(bit_count(xor(h1, h2)) AS INTEGER) AS hamming
      |FROM cand WHERE bit_count(xor(h1, h2)) <= 3
      |ORDER BY d1, d2""".stripMargin

  // ── Similarity search ──────────────────────────────────────────────────

  /** q22: brute-force cosine top-10 to vec 0 (exact baseline; the scan is
    * a narrow map + TakeOrderedAndProject). */
  def q22CosineTopK(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding")).head.getSeq[Float](0).map(_.toDouble)
    Similarity.bruteForceTopK(e, "vec_id", "embedding", q, k = 10)
      .withColumn("cosine", round(col("cosine"), 6))
      .orderBy(col("cosine").desc, col("vec_id").asc)
  }

  val q22Sql: String =
    """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id, round(
      |  list_sum(list_transform(range(1, len(embedding) + 1),
      |    i -> embedding[i]::DOUBLE * qv[i]::DOUBLE)) /
      |  (sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
      |     i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) *
      |   sqrt(list_sum(list_transform(range(1, len(qv) + 1),
      |     i -> qv[i]::DOUBLE * qv[i]::DOUBLE)))), 6) AS cosine
      |FROM embeddings, q
      |ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin

  /** q23: ANN — random-hyperplane LSH(8) bucket join for query vecs 0–4,
    * exact cosine re-rank, top-5 per query. */
  def q23AnnLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.annTopK(embs(s, dir), "vec_id", "embedding",
        col("vec_id") < 5, k = 5, nPlanes = 8)
      .orderBy(col("q_id"), col("c_id"))

  /** Shared CTE chain for the ANN oracles (q23/q92): hyperplane
    * signatures, query/corpus sides, bucket-joined candidate cosines. */
  private val annCosCtes: String =
    """proj AS (
      |  SELECT vec_id, p,
      |    list_sum(list_transform(range(1, len(embedding) + 1),
      |      d -> embedding[d]::DOUBLE *
      |        ((strpos('0123456789abcdef',
      |            substr(md5(p::VARCHAR || '_' || (d - 1)::VARCHAR), 1, 1)) - 1)
      |          % 2 * 2 - 1))) AS proj
      |  FROM embeddings CROSS JOIN range(0, 8) t(p)),
      |sig AS (SELECT vec_id,
      |          CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END)
      |            AS BIGINT) AS lsh_sig
      |        FROM proj GROUP BY vec_id),
      |q AS (SELECT e.vec_id AS q_id, e.embedding AS q_vec, s.lsh_sig
      |      FROM embeddings e JOIN sig s ON e.vec_id = s.vec_id
      |      WHERE e.vec_id < 5),
      |c AS (SELECT e.vec_id AS c_id, e.embedding AS c_vec, s.lsh_sig
      |      FROM embeddings e JOIN sig s ON e.vec_id = s.vec_id),
      |cos AS (SELECT q_id, c_id, round(
      |    list_sum(list_transform(range(1, len(q_vec) + 1),
      |      i -> q_vec[i]::DOUBLE * c_vec[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, len(q_vec) + 1),
      |       i -> q_vec[i]::DOUBLE * q_vec[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, len(c_vec) + 1),
      |       i -> c_vec[i]::DOUBLE * c_vec[i]::DOUBLE)))), 6) AS cosine
      |  FROM q JOIN c USING (lsh_sig) WHERE q_id <> c_id)""".stripMargin

  val q23Sql: String =
    s"""WITH $annCosCtes,
       |ranked AS (SELECT q_id, c_id, cosine, row_number() OVER (
       |    PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rn FROM cos)
       |SELECT q_id, c_id, cosine FROM ranked WHERE rn <= 5
       |ORDER BY q_id, c_id""".stripMargin

  /** q92: recall@5 of the LSH(8) ANN against the exact brute-force top-5
    * for the same query set — the measurement that tunes the
    * planes-vs-bucket-size trade before an index ships. */
  def q92AnnRecall(s: SparkSession, dir: String): DataFrame =
    Similarity.annRecallAtK(embs(s, dir), "vec_id", "embedding",
        col("vec_id") < 5, k = 5, nPlanes = 8)
      .orderBy(col("q_id"))

  val q92Sql: String =
    s"""WITH $annCosCtes,
       |ann AS (SELECT q_id, c_id FROM (
       |    SELECT q_id, c_id, row_number() OVER (
       |      PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rn
       |    FROM cos) t WHERE rn <= 5),
       |ac AS (SELECT q.q_id, e.vec_id AS c_id, round(
       |    list_sum(list_transform(range(1, len(q.q_vec) + 1),
       |      i -> q.q_vec[i]::DOUBLE * e.embedding[i]::DOUBLE)) /
       |    (sqrt(list_sum(list_transform(range(1, len(q.q_vec) + 1),
       |       i -> q.q_vec[i]::DOUBLE * q.q_vec[i]::DOUBLE))) *
       |     sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
       |       i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))), 6)
       |    AS cosine
       |  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.q_id),
       |exact AS (SELECT q_id, c_id FROM (
       |    SELECT q_id, c_id, row_number() OVER (
       |      PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rn
       |    FROM ac) t WHERE rn <= 5)
       |SELECT x.q_id, COUNT(*) AS n_exact,
       |  CAST(SUM(CASE WHEN a.c_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_hits,
       |  round(CAST(SUM(CASE WHEN a.c_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS DOUBLE) / COUNT(*), 6) AS recall
       |FROM exact x LEFT JOIN ann a ON x.q_id = a.q_id AND x.c_id = a.c_id
       |GROUP BY x.q_id ORDER BY x.q_id""".stripMargin

  // ── Text analysis ──────────────────────────────────────────────────────

  /** q24: stopword-profile language ID. */
  def q24LangId(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.languageId(docs(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val q24Sql: String =
    """WITH w AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws
      |           FROM documents),
      |h AS (SELECT doc_id,
      |  len(list_intersect(ws, ['the','and','of','to','in'])) AS en,
      |  len(list_intersect(ws, ['el','la','de','que','los'])) AS es,
      |  len(list_intersect(ws, ['le','la','et','les','des'])) AS fr,
      |  len(list_intersect(ws, ['der','die','und','das','ist'])) AS de
      |FROM w)
      |SELECT doc_id,
      |  CASE WHEN greatest(en, es, fr, de) = 0 THEN 'und'
      |       WHEN en >= es AND en >= fr AND en >= de THEN 'en'
      |       WHEN es >= fr AND es >= de THEN 'es'
      |       WHEN fr >= de THEN 'fr'
      |       ELSE 'de' END AS predicted_lang,
      |  greatest(en, es, fr, de) AS lang_score
      |FROM h ORDER BY doc_id""".stripMargin

  /** q25: quality metrics (ratios, single exact divisions). */
  def q25Quality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityScore(docs(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val q25Sql: String =
    """SELECT doc_id,
      |  length(text) AS n_chars,
      |  len(string_split(text, ' ')) AS n_words,
      |  CAST(length(text) AS DOUBLE) / len(string_split(text, ' '))
      |    AS mean_word_len,
      |  CAST(len(list_filter(string_split(text, ' '),
      |      x -> x IN ('the','and','of','a','to','in'))) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS stopword_ratio,
      |  CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
      |    / length(text) AS alpha_ratio
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q26: whitespace + BPE-ish regex token counts. */
  def q26TokenCount(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenCounts(docs(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val q26Sql: String =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_ws_tokens,
      |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
      |    AS n_re_tokens,
      |  length(text) AS n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q27: content md5 + winnowing-style min shingle hash. */
  def q27Fingerprint(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprint(docs(s, dir), "doc_id", "text", w = 4)
      .orderBy(col("doc_id"))

  val q27Sql: String =
    """WITH ws AS (SELECT doc_id, text, string_split(text, ' ') AS w
      |            FROM documents)
      |SELECT doc_id, md5(text) AS content_md5,
      |  CASE WHEN len(w) >= 4 THEN
      |    list_min(list_transform(range(1, len(w) - 2),
      |      i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])))
      |  ELSE md5(text) END AS min_shingle_hash
      |FROM ws ORDER BY doc_id""".stripMargin

  // ── Multimodal (binary payload + stub decode) ──────────────────────────

  /** q28: binary payload column + deterministic stub decode → typed
    * metadata (schema/plumbing real, codec stubbed). */
  def q28Multimodal(s: SparkSession, dir: String): DataFrame = {
    val withPayload = docs(s, dir)
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
    Multimodal.decodeMetaColumns(withPayload, "payload")
      .select(col("doc_id"), col("byte_len"), col("width"), col("height"),
        col("n_frames"))
      .orderBy(col("doc_id"))
  }

  val q28Sql: String =
    """SELECT doc_id,
      |  CAST(strlen(text) AS BIGINT) AS byte_len,
      |  (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
      |    + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) + 1 AS width,
      |  (strpos('0123456789abcdef', substr(md5(text), 3, 1)) - 1) * 16
      |    + (strpos('0123456789abcdef', substr(md5(text), 4, 1)) - 1) + 1 AS height,
      |  (strpos('0123456789abcdef', substr(md5(text), 5, 1)) - 1) + 1 AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  // ── Analytic window functions (lag/lead/frames) ────────────────────────

  /** q29: lag/lead + 3-row moving sum per user over event time. */
  def q29WindowFuncs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Sources.events(s, dir)
      .select(col("event_id"), col("user_id"), col("value"), col("ts"))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("next_value", lead(col("value"), 1).over(w))
      .withColumn("moving_sum",
        sum(col("value").cast(DecimalType(18, 2)))
          .over(w.rowsBetween(-2, 0)).cast(DoubleType))
      .drop("ts")
      .orderBy(col("event_id"))
  }

  val q29Sql: String =
    """SELECT event_id, user_id, value,
      |  lag(value, 1) OVER w AS prev_value,
      |  lead(value, 1) OVER w AS next_value,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin

  // ── Rollup + set operations ────────────────────────────────────────────

  /** q30: ROLLUP aggregation with grand-total row. */
  def q30Rollup(s: SparkSession, dir: String): DataFrame =
    Sources.events(s, dir)
      .rollup(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
      .orderBy(col("event_type").asc_nulls_first)

  val q30Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events GROUP BY ROLLUP(event_type)
      |ORDER BY event_type NULLS FIRST""".stripMargin

  /** q31: INTERSECT — users with both click and error events. */
  def q31Intersect(s: SparkSession, dir: String): DataFrame = {
    val ev = Sources.events(s, dir)
    ev.filter(col("event_type") === "click").select("user_id")
      .intersect(ev.filter(col("event_type") === "error").select("user_id"))
      .orderBy(col("user_id"))
  }

  val q31Sql: String =
    """SELECT user_id FROM events WHERE event_type = 'click'
      |INTERSECT
      |SELECT user_id FROM events WHERE event_type = 'error'
      |ORDER BY user_id""".stripMargin

  /** q32: EXCEPT — users with clicks but no errors. */
  def q32Except(s: SparkSession, dir: String): DataFrame = {
    val ev = Sources.events(s, dir)
    ev.filter(col("event_type") === "click").select("user_id")
      .except(ev.filter(col("event_type") === "error").select("user_id"))
      .orderBy(col("user_id"))
  }

  val q32Sql: String =
    """SELECT user_id FROM events WHERE event_type = 'click'
      |EXCEPT
      |SELECT user_id FROM events WHERE event_type = 'error'
      |ORDER BY user_id""".stripMargin

  /** q33: HLL approximate distinct, gated against the exact count. The
    * raw sketch estimate is implementation-specific across engines, so it
    * can't be hashed directly; instead the output carries the EXACT
    * distinct count plus `approx_within_5pct` — whether the HLL estimate
    * landed within ±5% of exact — and the oracle asserts that flag is
    * literally TRUE for every group. The hash then verifies everything
    * except the sketch's private value, and a drifting sketch flips the
    * flag and fails the gate. ApproxDistinctSpec asserts the same bound
    * in-suite. */
  def q33ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Sources.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("exact_users"), col("n_events"),
        (abs(col("approx_users") - col("exact_users")).cast(DoubleType)
          / col("exact_users") <= 0.05).as("approx_within_5pct"))
      .orderBy(col("event_type"))

  val q33Sql: String =
    """SELECT event_type,
      |  COUNT(DISTINCT user_id) AS exact_users,
      |  COUNT(*) AS n_events,
      |  TRUE AS approx_within_5pct
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q34: pivot event types to columns (counts; absent combinations 0). */
  def q34Pivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Sources.events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("user_id") +:
        types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy(col("user_id"))
  }

  val q34Sql: String =
    """SELECT user_id,
      |  count(*) FILTER (WHERE event_type = 'click') AS click,
      |  count(*) FILTER (WHERE event_type = 'error') AS error,
      |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  count(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q35: salted skew join — provably identical results to the plain
    * join, which is exactly what the oracle runs. */
  def q35SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val orders = Sources.orders(s, dir)
    val cust = Sources.customer(s, dir)
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
    graft.operators.SkewJoin.saltedInnerJoin(orders, cust, "o_custkey", n = 8)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("c_name"))
      .orderBy(col("o_orderkey"))
  }

  val q35Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, c_name
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin
}
