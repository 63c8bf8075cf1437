package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{CoreQueries, ExtrasQueries, PipelineQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q10DashboardJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg"              -> (CoreQueries.q01Agg _),
    "q02_latest_event"     -> (CoreQueries.q02LatestEvent _),
    "q03_top_desc"         -> (CoreQueries.q03TopDesc _),
    "q04_top_asc"          -> (CoreQueries.q04TopAsc _),
    "q05_movers_union"     -> (CoreQueries.q05MoversUnion _),
    "q06_global_sort"      -> (CoreQueries.q06GlobalSort _),
    "q07_scalar_agg"       -> (CoreQueries.q07ScalarAgg _),
    "q08_percent_of_total" -> (CoreQueries.q08PercentOfTotal _),
    "q09_case_when"        -> (CoreQueries.q09CaseWhen _),
    "q10_dashboard_join"   -> (CoreQueries.q10DashboardJoin _),
    "q11_explode_words"    -> (CoreQueries.q11ExplodeWords _),
    "q12_filter"           -> (CoreQueries.q12Filter _),
    "q13_count"            -> (CoreQueries.q13Count _),
    "q14_group_distinct"   -> (CoreQueries.q14GroupDistinct _),
    "q15_semi_join"        -> (CoreQueries.q15Semi _),
    "q16_anti_join"        -> (CoreQueries.q16Anti _),
    "q17_from_unixtime"    -> (CoreQueries.q17FromUnixtime _),
    "q18_dedup_exact"      -> (PipelineQueries.q18DedupExact _),
    "q19_minhash_lsh"      -> (PipelineQueries.q19MinHashLsh _),
    "q20_ngram_jaccard"    -> (PipelineQueries.q20NgramJaccard _),
    "q21_simhash"          -> (PipelineQueries.q21SimHash _),
    "q22_cosine_topk"      -> (PipelineQueries.q22CosineTopK _),
    "q23_ann_lsh"          -> (PipelineQueries.q23AnnLsh _),
    "q24_lang_id"          -> (PipelineQueries.q24LangId _),
    "q25_quality"          -> (PipelineQueries.q25Quality _),
    "q26_token_count"      -> (PipelineQueries.q26TokenCount _),
    "q27_fingerprint"      -> (PipelineQueries.q27Fingerprint _),
    "q28_multimodal"       -> (PipelineQueries.q28Multimodal _),
    "q29_window_funcs"     -> (PipelineQueries.q29WindowFuncs _),
    "q30_rollup"           -> (PipelineQueries.q30Rollup _),
    "q31_intersect"        -> (PipelineQueries.q31Intersect _),
    "q32_except"           -> (PipelineQueries.q32Except _),
    "q33_approx_distinct"  -> (PipelineQueries.q33ApproxDistinct _),
    "q34_pivot"            -> (PipelineQueries.q34Pivot _),
    "q35_salted_join"      -> (PipelineQueries.q35SaltedJoin _),
    "q36_string_funcs"     -> (ExtrasQueries.q36StringFuncs _),
    "q37_ranks"            -> (ExtrasQueries.q37Ranks _),
    "q38_curation"         -> (ExtrasQueries.q38Curation _),
    "q39_asof_join"        -> (ExtrasQueries.q39AsOfJoin _),
    "q40_interval_join"    -> (ExtrasQueries.q40IntervalJoin _),
    "q41_cosine_near_dup"  -> (ExtrasQueries.q41CosineNearDup _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_agg"              -> CoreQueries.q01Sql,
    "q02_latest_event"     -> CoreQueries.q02Sql,
    "q03_top_desc"         -> CoreQueries.q03Sql,
    "q04_top_asc"          -> CoreQueries.q04Sql,
    "q05_movers_union"     -> CoreQueries.q05Sql,
    "q06_global_sort"      -> CoreQueries.q06Sql,
    "q07_scalar_agg"       -> CoreQueries.q07Sql,
    "q08_percent_of_total" -> CoreQueries.q08Sql,
    "q09_case_when"        -> CoreQueries.q09Sql,
    "q10_dashboard_join"   -> CoreQueries.q10Sql,
    "q11_explode_words"    -> CoreQueries.q11Sql,
    "q12_filter"           -> CoreQueries.q12Sql,
    "q13_count"            -> CoreQueries.q13Sql,
    "q14_group_distinct"   -> CoreQueries.q14Sql,
    "q15_semi_join"        -> CoreQueries.q15Sql,
    "q16_anti_join"        -> CoreQueries.q16Sql,
    "q17_from_unixtime"    -> CoreQueries.q17Sql,
    "q18_dedup_exact"      -> PipelineQueries.q18Sql,
    "q19_minhash_lsh"      -> PipelineQueries.q19Sql,
    "q20_ngram_jaccard"    -> PipelineQueries.q20Sql,
    "q21_simhash"          -> PipelineQueries.q21Sql,
    "q22_cosine_topk"      -> PipelineQueries.q22Sql,
    "q23_ann_lsh"          -> PipelineQueries.q23Sql,
    "q24_lang_id"          -> PipelineQueries.q24Sql,
    "q25_quality"          -> PipelineQueries.q25Sql,
    "q26_token_count"      -> PipelineQueries.q26Sql,
    "q27_fingerprint"      -> PipelineQueries.q27Sql,
    "q28_multimodal"       -> PipelineQueries.q28Sql,
    "q29_window_funcs"     -> PipelineQueries.q29Sql,
    "q30_rollup"           -> PipelineQueries.q30Sql,
    "q31_intersect"        -> PipelineQueries.q31Sql,
    "q32_except"           -> PipelineQueries.q32Sql,
    // q33 omitted: HLL sketches differ across engines (rows-only check)
    "q34_pivot"            -> PipelineQueries.q34Sql,
    "q35_salted_join"      -> PipelineQueries.q35Sql,
    "q36_string_funcs"     -> ExtrasQueries.q36Sql,
    "q37_ranks"            -> ExtrasQueries.q37Sql,
    "q38_curation"         -> ExtrasQueries.q38Sql,
    "q39_asof_join"        -> ExtrasQueries.q39Sql,
    "q40_interval_join"    -> ExtrasQueries.q40Sql,
    "q41_cosine_near_dup"  -> ExtrasQueries.q41Sql,
  )
}
