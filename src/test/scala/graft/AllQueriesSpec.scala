package graft

/**
 * Executes EVERY registered SparkEntry query end-to-end at sf0.001 and
 * fails on throw — the guard that keeps a registered-but-broken query
 * (round 2's q55) from shipping invisibly. Also asserts the contract the
 * driver gate depends on: an oracle entry for every query and no oracle
 * for an unregistered query.
 */
class AllQueriesSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  // rows == 0 is legal for a handful of set-difference queries on tiny SF;
  // everything else must produce rows, or the query is silently dead
  private val mayBeEmpty = Set(
    "q16_anti_join", "q19_minhash_lsh", "q20_ngram_jaccard", "q23_ann_lsh",
    "q32_except", "q38_curation", "q40_interval_join", "q41_cosine_near_dup",
    "q55_ivf_ann", "q58_cosine_dup_bucketed", "q64_incremental_dedup",
    // q133: at sf0.001 no user pair shares >=2 capped fingerprints —
    // the threshold legitimately empties on tiny data (47 pairs at sf0.01)
    "q133_entity_pairs",
    // q377: the drop-cap exclusion table at q374's config is empty
    // WHEREVER the cap doesn't engage — sf0.001 and sf0.01 by design
    // (emptiness there is itself a hash-verified claim; 72 rows at
    // sf0.1 where the twin piles exceed the cap)
    "q377_phash_excluded")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query has an oracle") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"missing oracles: $noOracle")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
