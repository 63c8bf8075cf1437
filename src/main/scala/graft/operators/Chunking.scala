package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Content-defined chunking (CDC) over document text: chunk boundaries are
 * placed after words whose md5 starts with '0' (expected chunk length 16
 * words), so boundaries depend only on CONTENT — an insertion early in a
 * document shifts every fixed-width window but leaves all later CDC
 * chunks identical. Chunk-hash overlap then finds partially-overlapping
 * documents that whole-document hashing misses and shingle pipelines pay
 * Σdf² for: the rolling-hash dedup of rsync/LBFS (Muthitacharoen et al.,
 * SOSP'01), applied to corpus curation.
 *
 * Shape at scale: one shuffle on doc id for the boundary prefix-sum
 * window, a chunk rollup that reuses the same partitioning, and one
 * shuffle on chunk hash for the corpus-wide frequency — the same
 * inverted-index cost model as exact dedup, but over ~|words|/16 chunk
 * rows instead of per-shingle rows.
 */
object Chunking {

  /** (id, chunk_id, chunk_md5, n_words): CDC chunks per document. The
    * chunk id is the count of boundary words strictly before each
    * position (prefix-sum window); chunk content is re-assembled in
    * position order (sorted struct collect — collect_list alone has no
    * order guarantee). */
  def chunks(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = docs.select(col(idCol),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "word")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boundary = when(substring(md5(col("word")), 1, 1) === "0", 1L)
      .otherwise(0L)
    t.withColumn("chunk_id", coalesce(sum(boundary).over(w), lit(0L)))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("word")))),
            s => s.getField("word")))).as("chunk_md5"),
        count(lit(1)).as("n_words"))
  }

  /**
   * Sliding-window chunks with overlap — the RAG/embedding chunker:
   * fixed `chunkLen`-token windows advancing by `stride` tokens
   * (overlap = chunkLen − stride), the shape retrieval corpora are cut
   * into before embedding. Emits (id, chunk_idx, start_tok, n_chunk_
   * tokens, chunk_md5); the md5 stands in for the chunk text so results
   * stay narrow and hash-checkable (callers embedding the chunks slice
   * the text the same way).
   *
   * Everything is a single narrow projection + explode of a
   * per-row-computed index sequence: no shuffle, no window function, no
   * state — chunk arithmetic is pure int math on the token count, so a
   * document's chunks are independent of every other document (unlike
   * [[Packing.packPlan]], whose global offsets need the corpus prefix
   * sum). The word array is bound to a column before the explode
   * (generators get no CSE — an inlined split would re-run per chunk).
   */
  def slidingChunks(docs: DataFrame, idCol: String, textCol: String,
                    chunkLen: Int, stride: Int): DataFrame = {
    require(chunkLen >= 1 && stride >= 1 && stride <= chunkLen,
      s"need 1 <= stride <= chunkLen, got chunkLen=$chunkLen stride=$stride")
    val ws = col("graft_ws")
    val n = size(ws).cast("long")
    // ceil((n - chunkLen) / stride) + 1 in exact int math, min 1 chunk
    val nChunks = when(n <= chunkLen, lit(1L))
      .otherwise(call_function("div",
        n - chunkLen + stride - 1, lit(stride.toLong)) + 1)
    docs.select(col(idCol), split(col(textCol), " ").as("graft_ws"))
      .select(col(idCol), ws,
        explode(sequence(lit(0L), nChunks.cast("long") - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * stride).as("start_tok"),
        least(col("chunk_idx") * stride + chunkLen, size(ws).cast("long"))
          .minus(col("chunk_idx") * stride).as("n_chunk_tokens"),
        md5(concat_ws(" ", slice(ws,
          (col("chunk_idx") * stride + 1).cast("int"),
          least(col("chunk_idx") * stride + chunkLen, size(ws).cast("long"))
            .minus(col("chunk_idx") * stride).cast("int"))))
          .as("chunk_md5"))
  }

  /** Per-document chunk-sharing stats: total chunks and how many of them
    * also occur in at least one OTHER document — the partial-overlap
    * signal. */
  def sharedChunkStats(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val ch = chunks(docs, idCol, textCol)
    val freq = ch.groupBy(col("chunk_md5"))
      .agg(countDistinct(col(idCol)).as("n_docs_with_chunk"))
    ch.join(freq, "chunk_md5")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_docs_with_chunk") > 1, 1L).otherwise(0L))
          .as("n_shared_chunks"))
  }

  /**
   * T5-style span-corruption mask planning (Raffel et al. 2020 §3.1.4):
   * a deterministic per-document plan of which word spans a denoising
   * objective masks. Instead of sequential greedy sampling (which can't
   * run columnar), the document is cut into fixed `blockWords` blocks
   * and each block masks ONE `spanWords` span at an md5-chosen offset —
   * non-overlapping by construction, the mask ratio is spanWords /
   * blockWords by design, and the whole plan is a single codegen'd
   * projection (sequence + transform over the word count; the text
   * itself is never exploded). The tail block masks a span only when it
   * still fits. Offsets are hash32(salt‖doc‖block) mod the block's
   * valid-start count — integer-exact and oracle-replayable.
   *
   * Scale shape: zero shuffle — per-row arithmetic on the word count and
   * literal-salted hashes; `starts_md5` fingerprints the span-start list
   * so the gate pins every offset without hashing an array column.
   */
  def spanMaskPlan(docs: DataFrame, idCol: String, textCol: String,
                   blockWords: Int = 20, spanWords: Int = 3,
                   salt: String = "mask"): DataFrame = {
    require(spanWords >= 1 && blockWords > spanWords,
      s"need blockWords=$blockWords > spanWords=$spanWords >= 1")
    import org.apache.spark.sql.types.LongType
    val b = blockWords.toLong
    val l = spanWords.toLong
    val withN = docs.select(col(idCol),
      size(split(col(textCol), " ")).cast(LongType).as("graft_n"))
    val offs = (blk: Column, mod: Column) =>
      pmod(Sketches.hash32(concat(lit(s"${salt}_"),
        col(idCol).cast("string"), lit("_"), blk.cast("string"))), mod)
    val planned = withN
      .withColumn("graft_nb", expr(s"graft_n div $b"))
      .withColumn("graft_rem", col("graft_n") - col("graft_nb") * b)
      .withColumn("graft_full",
        when(col("graft_nb") > 0,
          transform(sequence(lit(0L), col("graft_nb") - 1),
            blk => blk * b + offs(blk, lit(b - l + 1))))
          .otherwise(array().cast("array<bigint>")))
      .withColumn("graft_tail",
        when(col("graft_rem") >= l,
          array(col("graft_nb") * b +
            offs(lit("t"), col("graft_rem") - l + 1)))
          .otherwise(array().cast("array<bigint>")))
      .withColumn("graft_starts",
        concat(col("graft_full"), col("graft_tail")))
    planned.select(col(idCol), col("graft_n").as("n_words"),
      size(col("graft_starts")).cast(LongType).as("n_spans"),
      (size(col("graft_starts")) * l).cast(LongType).as("n_masked"),
      expr(s"cast(size(graft_starts) * $l * 1000000 as decimal(38,0)) " +
        "div cast(graft_n as decimal(38,0))").cast(LongType)
        .as("masked_ppm"),
      md5(array_join(transform(col("graft_starts"), _.cast("string")),
        ",")).as("starts_md5"))
  }

  /**
   * Inverse-Cloze-Task pair generation (Lee, Chang & Toutanova, ACL
   * 2019 — ORQA's retrieval pre-training): from each document, pull one
   * pseudo-query span of `queryWords` words and pair it with the rest of
   * the document as its pseudo-evidence context. ICT needs no labels —
   * the extraction IS the supervision — which is why it's the standard
   * way to mint billions of retrieval training pairs from a raw corpus.
   *
   * The span start is hash32(salt‖doc) mod (n − q + 1): deterministic,
   * uniform over valid starts, oracle-replayable (the md5-integer
   * convention every sampler in this repo uses). Documents shorter than
   * `queryWords` + 1 words are skipped (no context would remain).
   * Output: (id, n_words, q_start, query_text, context_text) — context
   * is prefix ++ suffix with the span excised, matching the paper's
   * setup where the query sentence is REMOVED from its context so the
   * model can't string-match.
   *
   * Scale shape: zero shuffle — one projection computing word count,
   * hashed offset, and two array slices per row; the corpus is never
   * exploded or joined.
   */
  def ictPairs(docs: DataFrame, idCol: String, textCol: String,
               queryWords: Int = 8, salt: String = "ict"): DataFrame = {
    require(queryWords >= 1, s"queryWords=$queryWords must be positive")
    import org.apache.spark.sql.types.LongType
    val q = queryWords.toLong
    val ws = col("graft_ws")
    docs.select(col(idCol), split(col(textCol), " ").as("graft_ws"))
      .withColumn("graft_n", size(ws).cast(LongType))
      .filter(col("graft_n") >= q + 1)
      .withColumn("q_start",
        pmod(Sketches.hash32(concat(lit(s"${salt}_"),
          col(idCol).cast("string"))), col("graft_n") - q + 1))
      .select(col(idCol), col("graft_n").as("n_words"), col("q_start"),
        concat_ws(" ", slice(ws, (col("q_start") + 1).cast("int"),
          lit(queryWords))).as("query_text"),
        concat_ws(" ", concat(
          slice(ws, lit(1), col("q_start").cast("int")),
          slice(ws, (col("q_start") + q + 1).cast("int"),
            (col("graft_n") - col("q_start") - q).cast("int"))))
          .as("context_text"))
  }

  /**
   * Fill-in-the-middle split planning (Bavarian et al. 2022, "Efficient
   * Training of Language Models to Fill in the Middle" — the FIM
   * transform every code LLM's data pipeline applies to ~50% of
   * documents): cut each document at two uniform positions into
   * (prefix, middle, suffix), emit the document reordered PSM
   * (prefix‖suffix‖middle) or SPM, so the model learns infilling from
   * an autoregressive objective. Both cut points and the mode bit are
   * md5-derived (the repo's seedless-randomness convention):
   * c₁/c₂ = sorted(hash mod (n+1)) give P(uniform unordered cuts),
   * matching the paper's character-level splitting done here at word
   * level. Output: (id, n_words, cut1, cut2, mode, prefix/middle/
   * suffix lengths, parts_md5) — `parts_md5` fingerprints the three
   * parts joined with an out-of-alphabet separator, pinning the exact
   * split content without hashing three long strings in the gate.
   *
   * Scale shape: zero shuffle — per-row hashes, two array slices, one
   * md5; the corpus is never exploded or joined.
   */
  def fimSplitPlan(docs: DataFrame, idCol: String, textCol: String,
                   salt: String = "fim"): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val ws = col("graft_ws")
    val h = (tag: String, mod: Column) =>
      pmod(Sketches.hash32(concat(lit(s"${salt}_${tag}_"),
        col(idCol).cast("string"))), mod)
    docs.select(col(idCol), split(col(textCol), " ").as("graft_ws"))
      .withColumn("graft_n", size(ws).cast(LongType))
      .withColumn("graft_h1", h("a", col("graft_n") + 1))
      .withColumn("graft_h2", h("b", col("graft_n") + 1))
      .withColumn("cut1", least(col("graft_h1"), col("graft_h2")))
      .withColumn("cut2", greatest(col("graft_h1"), col("graft_h2")))
      .withColumn("mode",
        when(h("m", lit(2L)) === 0, lit("psm")).otherwise(lit("spm")))
      .select(col(idCol), col("graft_n").as("n_words"),
        col("cut1"), col("cut2"), col("mode"),
        col("cut1").as("prefix_len"),
        (col("cut2") - col("cut1")).as("middle_len"),
        (col("graft_n") - col("cut2")).as("suffix_len"),
        md5(concat_ws("|",
          concat_ws(" ", slice(ws, lit(1), col("cut1").cast("int"))),
          concat_ws(" ", slice(ws, (col("cut1") + 1).cast("int"),
            (col("cut2") - col("cut1")).cast("int"))),
          concat_ws(" ", slice(ws, (col("cut2") + 1).cast("int"),
            (col("graft_n") - col("cut2")).cast("int")))))
          .as("parts_md5"))
  }

  /**
   * Content-defined chunking (the LBFS rolling-hash cut rule,
   * Muthitacharoen et al., SOSP 2001 — the boundary scheme behind every
   * dedup store: rsync, restic, data-lake file CDC): a chunk boundary
   * falls BEFORE word i wherever the hash of the local 2-word window
   * (w[i−1], w[i]) is ≡ 0 mod 2^`maskBits`. Because the cut depends
   * only on LOCAL content, an insertion early in a document shifts at
   * most one chunk's boundaries — fixed-size chunking ([[chunks]])
   * re-cuts everything downstream, which is why storage dedup uses CDC.
   * Expected chunk length is 2^maskBits words; per-chunk `chunk_md5`
   * makes cross-document shared storage measurable with one hash join.
   *
   * Output: one row per (doc, chunk) with 0-based `chunk_start`, `n_words`,
   * and the chunk fingerprint. Deterministic: the window hash is the
   * repo's md5-word convention, oracle-replayable.
   *
   * Scale shape: boundary detection is a single array expression
   * (transform + filter over the word positions — no explode before
   * the per-chunk rows), then ONE generator emits the chunk structs.
   * Zero joins, zero shuffle.
   */
  def contentDefinedChunks(docs: DataFrame, idCol: String, textCol: String,
                           maskBits: Int = 4,
                           salt: String = "cdc"): DataFrame = {
    require(maskBits >= 1 && maskBits <= 20,
      s"maskBits=$maskBits out of range [1, 20]")
    import org.apache.spark.sql.types.LongType
    val mask = (1L << maskBits) - 1L
    val ws = col("graft_ws")
    val n = size(ws).cast(LongType)
    // 0-based starts: 0 plus every i−1 (0-based) where the window
    // (w[i−1], w[i]) (1-based) hashes to 0 under the mask, i in 2..n
    val cutAt = (i: Column) => pmod(Sketches.hash32(concat(lit(s"${salt}_"),
      element_at(ws, (i - 1).cast("int")), lit(" "),
      element_at(ws, i.cast("int")))), lit(mask + 1)) === 0
    docs.select(col(idCol), split(col(textCol), " ").as("graft_ws"))
      .withColumn("graft_starts",
        concat(array(lit(0L)),
          when(n >= 2,
            filter(transform(sequence(lit(2L), n),
              i => when(cutAt(i), i - 1).otherwise(lit(-1L))),
              x => x >= 0))
            .otherwise(array().cast("array<bigint>"))))
      .withColumn("graft_ends",
        concat(slice(col("graft_starts"), lit(2),
          size(col("graft_starts")) - 1),
          array(n)))
      .select(col(idCol),
        posexplode(zip_with(col("graft_starts"), col("graft_ends"),
          (s, e) => struct(s.as("s"), (e - s).as("l"),
            concat_ws(" ", slice(col("graft_ws"), (s + 1).cast("int"),
              (e - s).cast("int"))).as("t")))))
      .select(col(idCol), col("pos").cast(LongType).as("chunk_idx"),
        col("col.s").as("chunk_start"), col("col.l").as("n_words"),
        md5(col("col.t")).as("chunk_md5"))
  }
}
