package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus snapshot diff — the incremental-maintenance question "what
 * changed since the last crawl": which documents were added, removed, or
 * content-changed between two snapshots. Downstream this IS the work
 * list: only `changed`/`added` rows need re-embedding, re-indexing, and
 * re-deduping (against the stored LSH index — `dedupAgainstIndex`), so a
 * refresh costs O(diff), not O(corpus).
 *
 * One full-outer join on the id plus a hash comparison — both sides'
 * content hashes are computed in the scan projection, so the join
 * carries (id, hash), never the payload. At 100 TB both snapshots
 * shuffle once on the id; with both stored bucketed on the id
 * (`Sinks.writeBucketed`) the join is exchange-free.
 */
object Snapshot {

  /** (idCol, status ∈ added|removed|changed|unchanged): `b` relative to
    * `a`, with content identity = md5 of `contentCol`. */
  def diff(a: DataFrame, b: DataFrame, idCol: String,
           contentCol: String): DataFrame = {
    val ha = a.select(col(idCol), md5(col(contentCol)).as("graft_ha"))
    val hb = b.select(col(idCol), md5(col(contentCol)).as("graft_hb"))
    ha.join(hb, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("graft_ha").isNull, lit("added"))
          .when(col("graft_hb").isNull, lit("removed"))
          .when(col("graft_ha") =!= col("graft_hb"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Rollup of [[diff]]: (status, n) — the refresh-size report. */
  def diffCounts(a: DataFrame, b: DataFrame, idCol: String,
                 contentCol: String): DataFrame =
    diff(a, b, idCol, contentCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
}
