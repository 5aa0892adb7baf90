package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Keys match SURVEY.md §2 ids exactly; every oracle=YES row has a matching
  * DuckDB 1.0.0 SQL in [[oracleSql]] with identical column names/aliases.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.qAggBasic(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 scans / sources / sinks
    "q_scan_project" -> (Relational.qScanProject _),
    "q_scan_filter" -> (Relational.qScanFilter _),
    "q_scan_count" -> (Relational.qScanCount _),
    "q_sink_roundtrip" -> (Relational.qSinkRoundtrip _),
    // §2.2 projection / filter / predicates
    "q_filter_complex" -> (Relational.qFilterComplex _),
    "q_case_null" -> (Relational.qCaseNull _),
    // §2.3 joins
    "q_join_inner" -> (Relational.qJoinInner _),
    "q_join_broadcast" -> (Relational.qJoinBroadcast _),
    "q_join_left" -> (Relational.qJoinLeft _),
    "q_join_full" -> (Relational.qJoinFull _),
    "q_join_semi" -> (Relational.qJoinSemi _),
    "q_join_anti" -> (Relational.qJoinAnti _),
    "q_join_theta" -> (Relational.qJoinTheta _),
    "q_join_cross" -> (Relational.qJoinCross _),
    "q_join_asof" -> (Relational.qJoinAsof _),
    "q_join_multiway" -> (Relational.qJoinMultiway _),
    // §2.4 aggregation
    "q_agg_basic" -> (Relational.qAggBasic _),
    "q_agg_distinct" -> (Relational.qAggDistinct _),
    "q_agg_having" -> (Relational.qAggHaving _),
    "q_agg_stats" -> (Relational.qAggStats _),
    "q_agg_percentile" -> (Relational.qAggPercentile _),
    "q_agg_rollup" -> (Relational.qAggRollup _),
    "q_agg_cube" -> (Relational.qAggCube _),
    "q_agg_gsets" -> (Relational.qAggGsets _),
    "q_agg_hll" -> (Relational.qAggHll _),
    // §2.5 windows
    "q_win_rank" -> (Relational.qWinRank _),
    "q_win_running" -> (Relational.qWinRunning _),
    "q_win_lag_lead" -> (Relational.qWinLagLead _),
    "q_win_ntile_pct" -> (Relational.qWinNtilePct _),
    "q_win_range_frame" -> (Relational.qWinRangeFrame _),
    "q_win_time_range" -> (Relational.qWinTimeRange _),
    // §2.6 sort / limit / top-k
    "q_sort_multi" -> (Relational.qSortMulti _),
    "q_topk" -> (Relational.qTopk _),
    "q_topk_per_group" -> (Relational.qTopkPerGroup _),
    // §2.7 set ops
    "q_union_all" -> (Relational.qUnionAll _),
    "q_union_distinct" -> (Relational.qUnionDistinct _),
    "q_intersect" -> (Relational.qIntersect _),
    "q_except" -> (Relational.qExcept _),
    // §2.11 subqueries
    "q_subq_scalar" -> (Relational.qSubqScalar _),
    "q_subq_in" -> (Relational.qSubqIn _),
    // §2.8 scalar functions
    "q_fn_string" -> (Scalars.qFnString _),
    "q_fn_date" -> (Scalars.qFnDate _),
    "q_fn_math" -> (Scalars.qFnMath _),
    "q_fn_array" -> (Scalars.qFnArray _),
    "q_fn_map" -> (Scalars.qFnMap _),
    "q_fn_json" -> (Scalars.qFnJson _),
    // §2.9 search-engine core
    "q_tokenize" -> (Search.qTokenize _),
    "q_term_freq" -> (Search.qTermFreq _),
    "q_doc_freq" -> (Search.qDocFreq _),
    "q_inverted_index" -> (Search.qInvertedIndex _),
    "q_tfidf" -> (Search.qTfidf _),
    "q_search_and" -> (Search.qSearchAnd _),
    "q_search_or" -> (Search.qSearchOr _),
    "q_search_phrase" -> (Search.qSearchPhrase _),
    "q_doc_stats" -> (Search.qDocStats _),
    // §2.10 LLM-pipeline
    "q_dedup_exact" -> (Pipeline.qDedupExact _),
    "q_dedup_near" -> (Pipeline.qDedupNear _),
    "q_sim_cosine_topk" -> (Pipeline.qSimCosineTopk _),
    "q_sim_centroids" -> (Pipeline.qSimCentroids _),
    "q_text_lang_dist" -> (Pipeline.qTextLangDist _),
    "q_ngrams" -> (Pipeline.qNgrams _),
    // §2.12 events (batch)
    "q_evt_tumbling" -> (Events.qEvtTumbling _),
    "q_evt_sliding" -> (Events.qEvtSliding _),
    "q_evt_session" -> (Events.qEvtSession _),
    "q_evt_funnel" -> (Events.qEvtFunnel _),
    // §2.12 structured streaming (oracle=unit)
    "s_stream_tumbling" -> (graft.streaming.Streams.sStreamTumbling _),
    "s_stream_dedup" -> (graft.streaming.Streams.sStreamDedup _),
    "s_stream_late" -> (graft.streaming.Streams.sStreamLate _),
    "s_stream_stateful" -> (graft.streaming.Streams.sStreamStateful _),
    // §2.13 UDF / UDAF / UDTF / custom Expression
    "q_udf_scalar" -> (graft.udf.Custom.qUdfScalar _),
    "q_udaf_typed" -> (graft.udf.Custom.qUdafTyped _),
    "q_udtf_explode" -> (graft.udf.Custom.qUdtfExplode _),
    "x_expr_custom" -> (graft.udf.Custom.xExprCustom _),
  )

  /** DuckDB 1.0.0 SQL oracle per query key (omitted for oracle=unit rows). */
  def oracleSql: Map[String, String] = Map(
    "q_scan_project" -> Relational.qScanProjectSql,
    "q_scan_filter" -> Relational.qScanFilterSql,
    "q_scan_count" -> Relational.qScanCountSql,
    "q_filter_complex" -> Relational.qFilterComplexSql,
    "q_case_null" -> Relational.qCaseNullSql,
    "q_join_inner" -> Relational.qJoinInnerSql,
    "q_join_broadcast" -> Relational.qJoinBroadcastSql,
    "q_join_left" -> Relational.qJoinLeftSql,
    "q_join_full" -> Relational.qJoinFullSql,
    "q_join_semi" -> Relational.qJoinSemiSql,
    "q_join_anti" -> Relational.qJoinAntiSql,
    "q_join_theta" -> Relational.qJoinThetaSql,
    "q_join_cross" -> Relational.qJoinCrossSql,
    "q_join_asof" -> Relational.qJoinAsofSql,
    "q_join_multiway" -> Relational.qJoinMultiwaySql,
    "q_agg_basic" -> Relational.qAggBasicSql,
    "q_agg_distinct" -> Relational.qAggDistinctSql,
    "q_agg_having" -> Relational.qAggHavingSql,
    "q_agg_stats" -> Relational.qAggStatsSql,
    "q_agg_percentile" -> Relational.qAggPercentileSql,
    "q_agg_rollup" -> Relational.qAggRollupSql,
    "q_agg_cube" -> Relational.qAggCubeSql,
    "q_agg_gsets" -> Relational.qAggGsetsSql,
    "q_win_rank" -> Relational.qWinRankSql,
    "q_win_running" -> Relational.qWinRunningSql,
    "q_win_lag_lead" -> Relational.qWinLagLeadSql,
    "q_win_ntile_pct" -> Relational.qWinNtilePctSql,
    "q_win_range_frame" -> Relational.qWinRangeFrameSql,
    "q_win_time_range" -> Relational.qWinTimeRangeSql,
    "q_sort_multi" -> Relational.qSortMultiSql,
    "q_topk" -> Relational.qTopkSql,
    "q_topk_per_group" -> Relational.qTopkPerGroupSql,
    "q_union_all" -> Relational.qUnionAllSql,
    "q_union_distinct" -> Relational.qUnionDistinctSql,
    "q_intersect" -> Relational.qIntersectSql,
    "q_except" -> Relational.qExceptSql,
    "q_subq_scalar" -> Relational.qSubqScalarSql,
    "q_subq_in" -> Relational.qSubqInSql,
    "q_fn_string" -> Scalars.qFnStringSql,
    "q_fn_date" -> Scalars.qFnDateSql,
    "q_fn_math" -> Scalars.qFnMathSql,
    "q_fn_array" -> Scalars.qFnArraySql,
    "q_fn_map" -> Scalars.qFnMapSql,
    "q_fn_json" -> Scalars.qFnJsonSql,
    "q_tokenize" -> Search.qTokenizeSql,
    "q_term_freq" -> Search.qTermFreqSql,
    "q_doc_freq" -> Search.qDocFreqSql,
    "q_inverted_index" -> Search.qInvertedIndexSql,
    "q_tfidf" -> Search.qTfidfSql,
    "q_search_and" -> Search.qSearchAndSql,
    "q_search_or" -> Search.qSearchOrSql,
    "q_search_phrase" -> Search.qSearchPhraseSql,
    "q_doc_stats" -> Search.qDocStatsSql,
    "q_dedup_exact" -> Pipeline.qDedupExactSql,
    "q_dedup_near" -> Pipeline.qDedupNearSql,
    "q_sim_cosine_topk" -> Pipeline.qSimCosineTopkSql,
    "q_sim_centroids" -> Pipeline.qSimCentroidsSql,
    "q_text_lang_dist" -> Pipeline.qTextLangDistSql,
    "q_ngrams" -> Pipeline.qNgramsSql,
    "q_evt_tumbling" -> Events.qEvtTumblingSql,
    "q_evt_sliding" -> Events.qEvtSlidingSql,
    "q_evt_session" -> Events.qEvtSessionSql,
    "q_evt_funnel" -> Events.qEvtFunnelSql,
    "q_udf_scalar" -> graft.udf.Custom.qUdfScalarSql,
    "q_udaf_typed" -> graft.udf.Custom.qUdafTypedSql,
    "q_udtf_explode" -> graft.udf.Custom.qUdtfExplodeSql,
  )
}
