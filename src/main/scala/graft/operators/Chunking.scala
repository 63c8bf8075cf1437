package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

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
}
