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

  /**
   * SCD type-2 intervalization: collapse a change log into validity
   * intervals — one row per (key, attribute run) with
   * [valid_from, valid_to) bounds and an is-current flag. The
   * slowly-changing-dimension build every warehouse runs on entity
   * change streams; downstream point-in-time joins ride [[AsOfJoin]].
   *
   * Consecutive repeats of the same attribute value are collapsed first
   * (lag), then each surviving change row takes the NEXT change's
   * timestamp as its exclusive upper bound (lead) — two passes over one
   * key-partitioned ordering, so the plan is one shuffle and two window
   * evaluations sharing that exchange. Timestamps are surfaced as epoch
   * micros (engine-portable; NULL upper bound = current).
   *
   * vs [[History.scd2Intervals]] (the q322 twin): use THIS one when the
   * caller needs epoch-micro bounds and a plain lag-collapse keyed by a
   * distinct row id; use History.scd2Intervals when the caller needs
   * 1-based VERSION numbers, per-run event counts, and raw-timestamp
   * bounds. Tie handling differs on purpose: here same-timestamp order
   * is broken by `idCol` (a unique row id must exist); there the caller
   * names an explicit `tieCol` and runs carry their event count.
   */
  def scd2(df: DataFrame, keyCol: String, attrCol: String, tsCol: String,
           idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val changes = df
      .withColumn("graft_prev", lag(col(attrCol), 1).over(w))
      .filter(col("graft_prev").isNull || col("graft_prev") =!= col(attrCol))
    changes
      .withColumn("graft_to", lead(unix_micros(col(tsCol)), 1).over(w))
      .select(col(keyCol), col(idCol), col(attrCol),
        unix_micros(col(tsCol)).as("valid_from_us"),
        col("graft_to").as("valid_to_us"),
        col("graft_to").isNull.as("is_current"))
  }

  /**
   * Incremental maintenance of a per-stratum materialized aggregate
   * (count + sum): `base` is agg(a) as already materialized; the result
   * equals agg(b), computed as base + a delta derived ONLY from rows
   * whose content identity differs between the snapshots. This is the
   * materialized-view update that costs O(diff), not O(corpus): at
   * 100 TB the nightly refresh re-aggregates the changed rows, never
   * rescans the snapshot.
   *
   * `contentCol` must cover every input the aggregate reads (stratum and
   * weight included) — a weight change invisible to the content hash
   * would silently skip its delta. Removed/changed rows subtract their
   * OLD (stratum, weight); added/changed rows add their NEW ones, so
   * rows migrating across strata maintain both sides. Strata whose
   * count reaches zero drop out, matching a direct re-aggregation.
   *
   * `base` columns: (strataCol, n_docs, w_sum).
   */
  /**
   * MERGE-style upsert/delete application: the Delta/Iceberg `MERGE
   * INTO` observable semantics without a table format — `changes`
   * carries an op column ('U' upserts the row, 'D' deletes the key) and
   * the result is the post-merge snapshot. Keys present in `changes`
   * take the change's version (or vanish); everything else carries
   * over. One key-partitioned anti-join + a union — no full rewrite of
   * untouched partitions at scale when the snapshot is partitioned on
   * the key's buckets.
   *
   * `changes` must have at most one row per key (the usual MERGE
   * precondition); enforce upstream with [[LatestSnapshot]] when the
   * changelog has history.
   */
  def mergeApply(current: DataFrame, changes: DataFrame, keyCol: String,
                 opCol: String): DataFrame = {
    // an unrecognized op (a typo, a producer's 'I' dialect) must ERROR,
    // not silently delete: the anti-join removes every changed key
    // regardless of op, so only validated keys may enter it — the check
    // rides the key column and cannot be pruned
    val checkedKey = when(col(opCol).isin("U", "D"), col(keyCol))
      .otherwise(raise_error(concat(
        lit(s"mergeApply: op must be 'U' or 'D', got '"),
        col(opCol), lit("' at key "),
        col(keyCol).cast(org.apache.spark.sql.types.StringType))))
    val kept = current.join(
      changes.select(checkedKey.as(keyCol)), Seq(keyCol), "left_anti")
    kept.unionByName(
      changes.filter(col(opCol) === "U").drop(opCol))
  }

  /**
   * Incremental JOIN maintenance (insert-only deltas): the view delta
   * of A ⋈ B under ΔA, ΔB is ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB, so the new
   * view is old ∪ delta — no recompute of A_old⋈B_old, which is the
   * whole point when the old sides are 100 TB and the deltas are a
   * day's partition. The q186 gate PROVES the algebra: the oracle
   * computes the full new join from scratch and the hashes must agree.
   *
   * All three delta terms join on the same key — one partitioning,
   * and the Δ sides are small (broadcast when they fit).
   */
  def maintainJoin(aOld: DataFrame, deltaA: DataFrame, bOld: DataFrame,
                   deltaB: DataFrame, keyCol: String): DataFrame = {
    val oldView = aOld.join(bOld, keyCol)
    val delta = deltaA.join(bOld, keyCol)
      .unionByName(aOld.join(deltaB, keyCol))
      .unionByName(deltaA.join(deltaB, keyCol))
    oldView.unionByName(delta)
  }

  def maintainAgg(base: DataFrame, a: DataFrame, b: DataFrame,
                  idCol: String, contentCol: String, strataCol: String,
                  weightCol: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val ha = a.select(col(idCol), md5(col(contentCol)).as("graft_ha"),
      col(strataCol).as("graft_sa"),
      col(weightCol).cast(LongType).as("graft_wa"))
    val hb = b.select(col(idCol), md5(col(contentCol)).as("graft_hb"),
      col(strataCol).as("graft_sb"),
      col(weightCol).cast(LongType).as("graft_wb"))
    // one pass over the joined snapshots: keep only rows whose content
    // identity differs, then EXPLODE each into its signed contributions
    // (subtract the old side, add the new) — two filtered re-reads of
    // the join would run the corpus-scale full-outer join twice
    val j = ha.join(hb, Seq(idCol), "full_outer")
      .filter(col("graft_ha").isNull || col("graft_hb").isNull ||
        col("graft_ha") =!= col("graft_hb"))
    val delta = j
      .select(explode(array(
        struct(col("graft_sa").as("s"), lit(-1L).as("dn"),
          (-col("graft_wa")).as("dw"),
          col("graft_ha").isNotNull.as("keep")),
        struct(col("graft_sb").as("s"), lit(1L).as("dn"),
          col("graft_wb").as("dw"),
          col("graft_hb").isNotNull.as("keep")))).as("c"))
      .filter(col("c.keep"))
      .groupBy(col("c.s").as(strataCol))
      .agg(sum(col("c.dn")).as("graft_dn"),
        sum(col("c.dw")).as("graft_dw"))
    base.join(delta, Seq(strataCol), "full_outer")
      .select(col(strataCol),
        (coalesce(col("n_docs"), lit(0L)) +
          coalesce(col("graft_dn"), lit(0L))).as("n_docs"),
        (coalesce(col("w_sum"), lit(0L)) +
          coalesce(col("graft_dw"), lit(0L))).as("w_sum"))
      .filter(col("n_docs") > 0)
  }
}
