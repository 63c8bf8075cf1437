package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{AsOfJoin, IntervalJoin, Similarity, TextAnalysis, TextDedup}
import graft.sources.Sources

/** Remaining function surface (SURVEY §2.9's imported-but-unused built-ins,
  * ranking analytics) and the flagship curation composite. */
object ExtrasQueries {

  /** q36: sha2 / concat_ws / trim / upper — the template functions the
    * reference imports but never calls (2-spark…py:9), exposed for real. */
  def q36StringFuncs(s: SparkSession, dir: String): DataFrame =
    Sources.customer(s, dir).select(
      col("c_custkey"),
      upper(trim(col("c_name"))).as("name_up"),
      sha2(concat_ws("|", col("c_name"), col("c_mktsegment")), 256)
        .as("row_hash"))
    .orderBy(col("c_custkey"))

  val q36Sql: String =
    """SELECT c_custkey, upper(trim(c_name)) AS name_up,
      |  sha256(concat_ws('|', c_name, c_mktsegment)) AS row_hash
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** q37: ranking analytics — rank / dense_rank / percent_rank per order
    * priority (percent_rank = (rank-1)/(n-1), exact division). */
  def q37Ranks(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Sources.orders(s, dir).select(
        col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        percent_rank().over(w).as("prnk"))
      .orderBy(col("o_orderkey"))
  }

  val q37Sql: String =
    """SELECT o_orderkey, o_orderpriority, o_totalprice,
      |  rank() OVER w AS rnk,
      |  dense_rank() OVER w AS drnk,
      |  percent_rank() OVER w AS prnk
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice DESC, o_orderkey ASC)
      |ORDER BY o_orderkey""".stripMargin

  /**
   * q38: the curation pipeline composite — what this engine exists for at
   * 100 TB: quality gate (length + alpha ratio) → language gate → near-dup
   * removal (canonical = smallest doc_id of each ≥0.5-Jaccard pair
   * survives, via left_anti join on the dup-pair d2 side). Every stage is
   * an operator verified individually by q19/q24/q25; this proves they
   * compose. Dedup goes through MinHash+LSH (the 100 TB plan — candidate
   * volume bounded by band collisions, not Σ df² of the shingle index);
   * the oracle reproduces the same banded pipeline, so the check is exact.
   */
  def q38Curation(s: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(s, dir)
    // quality + language features stack in ONE projection over one scan
    // (the column-level TextAnalysis API) — joining derived frames of the
    // same corpus would be a full self-join shuffle at 100 TB
    val (lang, _) = TextAnalysis.languageIdCols(col("text"))
    val quality = TextAnalysis.qualityCols(col("text")).toMap
    val feats = docs.select(col("doc_id"),
      lang.as("predicted_lang"),
      quality("n_words").as("n_words"),
      quality("alpha_ratio").as("alpha_ratio"))
    val dups = TextDedup.minHashLshPairs(docs, "doc_id", "text",
        k = 16, r = 4, w = 3, threshold = 0.5)
      .select(col("d2").as("doc_id")).distinct()
    feats
      .filter(col("n_words") >= 10 && col("alpha_ratio") > 0.5 &&
        col("predicted_lang") =!= "und")
      .join(dups, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("predicted_lang"), col("n_words"),
        col("alpha_ratio"))
      .orderBy(col("doc_id"))
  }

  val q38Sql: String =
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
      |inter AS (SELECT c.d1, c.d2, count(*) AS inter
      |          FROM cand c
      |          JOIN sh a ON a.doc_id = c.d1
      |          JOIN sh b ON b.doc_id = c.d2 AND b.s = a.s
      |          GROUP BY c.d1, c.d2),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |dups AS (SELECT DISTINCT i.d2 AS doc_id
      |         FROM inter i JOIN sz s1 ON i.d1 = s1.doc_id
      |                      JOIN sz s2 ON i.d2 = s2.doc_id
      |         WHERE CAST(i.inter AS DOUBLE) / (s1.n + s2.n - i.inter) >= 0.5),
      |feats AS (SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_words,
      |  CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
      |    / length(text) AS alpha_ratio,
      |  list_distinct(string_split(text, ' ')) AS wset
      |  FROM documents),
      |h AS (SELECT doc_id,
      |  len(list_intersect(wset, ['the','and','of','to','in'])) AS en,
      |  len(list_intersect(wset, ['el','la','de','que','los'])) AS es,
      |  len(list_intersect(wset, ['le','la','et','les','des'])) AS fr,
      |  len(list_intersect(wset, ['der','die','und','das','ist'])) AS de
      |  FROM feats),
      |langs AS (SELECT doc_id,
      |  CASE WHEN greatest(en, es, fr, de) = 0 THEN 'und'
      |       WHEN en >= es AND en >= fr AND en >= de THEN 'en'
      |       WHEN es >= fr AND es >= de THEN 'es'
      |       WHEN fr >= de THEN 'fr'
      |       ELSE 'de' END AS predicted_lang
      |  FROM h)
      |SELECT f.doc_id, l.predicted_lang, f.n_words, f.alpha_ratio
      |FROM feats f
      |JOIN langs l ON f.doc_id = l.doc_id
      |WHERE f.n_words >= 10 AND f.alpha_ratio > 0.5
      |  AND l.predicted_lang <> 'und'
      |  AND f.doc_id NOT IN (SELECT doc_id FROM dups)
      |ORDER BY f.doc_id""".stripMargin

  /** q39: as-of join — each view event gets the latest purchase (same
    * user, purchase time ≤ view time). The operator Spark lacks natively;
    * DuckDB's built-in ASOF JOIN is the oracle. */
  def q39AsOfJoin(s: SparkSession, dir: String): DataFrame = {
    val events = Sources.events(s, dir)
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_event_id"),
        col("value").as("purchase_value"))
    AsOfJoin(views, purchases, Seq("user_id"), "ts",
        Seq("purchase_event_id", "purchase_value"),
        rightOrder = col("purchase_event_id"))
      .select(col("event_id"), col("user_id"), col("value"),
        col("purchase_event_id"), col("purchase_value"))
      .orderBy(col("event_id"))
  }

  val q39Sql: String =
    """WITH rdedup AS (
      |  SELECT user_id, ts, max(event_id) AS purchase_event_id
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
      |r AS (SELECT d.user_id, d.ts, d.purchase_event_id,
      |        e.value AS purchase_value
      |      FROM rdedup d JOIN events e ON e.event_id = d.purchase_event_id)
      |SELECT l.event_id, l.user_id, l.value,
      |  r.purchase_event_id, r.purchase_value
      |FROM events l
      |ASOF JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
      |WHERE l.event_type = 'view'
      |ORDER BY l.event_id""".stripMargin

  /** q40: bucketized interval join — event pairs per user within 60 s
    * (later ← earlier). Oracle is the plain inequality join. */
  def q40IntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Sources.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    IntervalJoin(ev, ev, Seq("user_id"), "ts", maxDelayMicros = 60000000L)
      .filter(col("l_event_id") =!= col("r_event_id"))
      .select(col("l_event_id"), col("r_event_id"), col("user_id"),
        col("l_event_type"), col("r_event_type"))
      .orderBy(col("l_event_id"), col("r_event_id"))
  }

  val q40Sql: String =
    """SELECT l.event_id AS l_event_id, r.event_id AS r_event_id,
      |  l.user_id, l.event_type AS l_event_type, r.event_type AS r_event_type
      |FROM events l JOIN events r
      |  ON l.user_id = r.user_id
      | AND r.ts <= l.ts AND r.ts >= l.ts - INTERVAL 60 SECOND
      | AND l.event_id <> r.event_id
      |ORDER BY l_event_id, r_event_id""".stripMargin

  /** q41: embedding-cosine near-dup pairs (exact, cosine ≥ 0.45). */
  def q41CosineNearDup(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairs(Sources.embeddings(s, dir),
        "vec_id", "embedding", threshold = 0.45)
      .orderBy(col("d1"), col("d2"))

  val q41Sql: String =
    """SELECT a.vec_id AS d1, b.vec_id AS d2, round(
      |  list_sum(list_transform(range(1, len(a.embedding) + 1),
      |    i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
      |  (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
      |     i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE))) *
      |   sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1),
      |     i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))), 6)
      |  AS cosine
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE round(
      |  list_sum(list_transform(range(1, len(a.embedding) + 1),
      |    i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
      |  (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
      |     i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE))) *
      |   sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1),
      |     i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))), 6) >= 0.45
      |ORDER BY d1, d2""".stripMargin

  /** q58: LSH-bucketed cosine near-dup pairs (4 tables × 4 hyperplanes,
    * exact-cosine verify ≥ 0.45) — q41's scale path; the oracle reproduces
    * the same md5-derived hyperplane tables, so even the recall trade is
    * hash-verified. */
  def q58CosineDupBucketed(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairsBucketed(Sources.embeddings(s, dir),
        "vec_id", "embedding", threshold = 0.45,
        nTables = 4, planesPerTable = 4, dims = 64)
      .orderBy(col("d1"), col("d2"))

  val q58Sql: String =
    """WITH proj AS (
      |  SELECT vec_id, p,
      |    list_sum(list_transform(range(1, len(embedding) + 1),
      |      d -> embedding[d]::DOUBLE *
      |        ((strpos('0123456789abcdef',
      |            substr(md5(p::VARCHAR || '_' || (d - 1)::VARCHAR), 1, 1)) - 1)
      |          % 2 * 2 - 1))) AS proj
      |  FROM embeddings CROSS JOIN range(0, 16) t(p)),
      |sig AS (SELECT vec_id, p // 4 AS tbl,
      |          CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << (p % 4))
      |            ELSE 0 END) AS BIGINT) AS sig
      |        FROM proj GROUP BY vec_id, p // 4),
      |cand AS (SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
      |         FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.sig = b.sig
      |         WHERE a.vec_id < b.vec_id),
      |pairs AS (SELECT c.d1, c.d2, round(
      |    list_sum(list_transform(range(1, len(a.embedding) + 1),
      |      i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
      |       i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1),
      |       i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))), 6)
      |    AS cosine
      |  FROM cand c JOIN embeddings a ON a.vec_id = c.d1
      |              JOIN embeddings b ON b.vec_id = c.d2)
      |SELECT d1, d2, cosine FROM pairs WHERE cosine >= 0.45
      |ORDER BY d1, d2""".stripMargin
}
