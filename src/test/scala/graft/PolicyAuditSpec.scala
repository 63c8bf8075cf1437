package graft

import graft.operators.Profiling

/** Hand-computed expectations for [[Profiling.dedupPolicyAudit]] — the
  * census→configuration prescription (r18 verdict item 3), independent of
  * the DuckDB gates (q378 skewed fixture, q379 dense fixture). */
class PolicyAuditSpec extends SparkSpec {
  import spark.implicits._

  // 7 buckets with sizes 1,1,1,1,2,3,10 → n_rows 19, max 10,
  // lower-median 1 (cum at sz=1 is 4, 2·4 ≥ 7), p99 10 (needs cum ≥ ⌈6.93⌉),
  // multiplicity_est 3 (dup sizes 2,3,10: cum at sz=3 is 2, 2·2 ≥ 3)
  private def census =
    Seq(1L, 1L, 1L, 1L, 2L, 3L, 10L).zipWithIndex
      .map { case (bs, i) => (i.toString, bs) }
      .toDF("bucket", "bs")

  private def row(df: org.apache.spark.sql.DataFrame) = {
    val r = df.collect()
    assert(r.length == 1)
    r.head
  }

  test("dedupPolicyAudit: under-target census reads uncapped") {
    val r = row(Profiling.dedupPolicyAudit(census, "bs", capTarget = 10L))
    assert(r.getLong(0) == 7L && r.getLong(1) == 19L) // n_buckets, n_rows
    assert(r.getLong(2) == 0L)                        // space_size (hash space)
    assert(r.getLong(3) == 10L && r.getLong(4) == 1L) // max, p50
    assert(r.getLong(5) == 10L && r.getLong(6) == 3L) // p99, multiplicity
    assert(r.getLong(7) == 0L && r.getString(8) == "uncapped")
  }

  test("dedupPolicyAudit: dominant pile (max² > n_rows) prescribes exact-dedup first") {
    // max 10 in a 19-row census: 100 > 19 — the pile's pairwise output
    // exceeds corpus-linear work (the q350-at-10× regime)
    val r = row(Profiling.dedupPolicyAudit(census, "bs", capTarget = 4L))
    assert(r.getLong(7) == 4L && r.getString(8) == "exact-dedup+salt-split")
  }

  test("dedupPolicyAudit: modest piles in a roomy space prescribe salt-split") {
    // max 4 in a 27-row census: 16 ≤ 27 — the quadratic term stays
    // dominated by linear work (the q358-at-10× regime)
    val modest = (Seq.fill(20)(1L) ++ Seq(3L, 4L)).zipWithIndex
      .map { case (bs, i) => (i.toString, bs) }
      .toDF("bucket", "bs")
    val r = row(Profiling.dedupPolicyAudit(modest, "bs", capTarget = 2L))
    assert(r.getLong(7) == 2L && r.getString(8) == "salt-split")
  }

  test("dedupPolicyAudit: saturated space prescribes widen+drop-cap below multiplicity") {
    val r = row(Profiling.dedupPolicyAudit(census, "bs", capTarget = 4L,
      spaceSize = Some(19L))) // n_rows = 19 ≥ spaceSize → saturated
    assert(r.getLong(2) == 19L)
    assert(r.getLong(7) == 2L && r.getString(8) == "widen+drop-cap")
  }

  test("dedupPolicyAudit: roomy declared space skips the saturated branch") {
    val r = row(Profiling.dedupPolicyAudit(census, "bs", capTarget = 4L,
      spaceSize = Some(1000L))) // 19 < 1000 → not saturated; pile guard fires
    assert(r.getString(8) == "exact-dedup+salt-split" && r.getLong(7) == 4L)
  }

  test("dedupPolicyAudit: empty census emits the all-zero uncapped row") {
    val empty = Seq.empty[(String, Long)].toDF("bucket", "bs")
    val r = row(Profiling.dedupPolicyAudit(empty, "bs", capTarget = 4L))
    assert((0 to 7).forall(i => r.getLong(i) == 0L))
    assert(r.getString(8) == "uncapped")
  }
}
