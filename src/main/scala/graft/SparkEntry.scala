package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every oracle-checked (★) operator has a `queries` entry AND an
  * `oracleSql` entry with identical output column names; rows-only (☆)
  * operators have a `queries` entry plus a ScalaTest spec.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Tpch.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B — transform / parse battery
    "q_apache_parse"  -> (LogAnalytics.apacheParse(_, _)),
    "q_user_agents"   -> (LogAnalytics.userAgents(_, _)),
    "q_lambda_events" -> (LogAnalytics.lambdaEvents(_, _)),
    // C — OpenSearch-style log analytics
    "q_date_histogram"     -> (LogAnalytics.dateHistogram(_, _)),
    "q_terms_agg"          -> (LogAnalytics.termsAgg(_, _)),
    "q_search"             -> (LogAnalytics.search(_, _)),
    "q_error_rate"         -> (LogAnalytics.errorRate(_, _)),
    "q_percentiles"        -> (LogAnalytics.percentiles(_, _)),
    "q_percentiles_approx" -> (LogAnalytics.percentilesApprox(_, _)),
    "q_cardinality"        -> (LogAnalytics.cardinality(_, _)),
    "q_cardinality_approx" -> (LogAnalytics.cardinalityApprox(_, _)),
    "q_top_users_per_type" -> (LogAnalytics.topUsersPerType(_, _)),
    "q_sessionize"         -> (LogAnalytics.sessionize(_, _)),
    "q_enrich_join"        -> (LogAnalytics.enrichJoin(_, _)),
    "q_exists_orders"      -> (Extras.customersWithOrders(_, _)),
    "q_missing_orders"     -> (Extras.customersWithoutOrders(_, _)),
    "q_rollup_revenue"     -> (Extras.rollupRevenue(_, _)),
    "q_moving_avg"         -> (Extras.movingAvg(_, _)),
    "q_value_histogram"    -> (Extras.valueHistogram(_, _)),
    "q_latest_per_user"    -> (Extras.latestEventPerUser(_, _)),
    "q_asof_join"          -> (Extras.asofViewBeforePurchase(_, _)),
    "q_pivot_events"       -> (Extras.pivotEvents(_, _)),
    "q_cube_revenue"       -> (Extras.cubeRevenue(_, _)),
    "q_window_ranks"       -> (Extras.windowRanks(_, _)),
    "q_interval_join"      -> (Extras.viewsBeforePurchase(_, _)),
    "q_session_window"     -> (Extras.sessionWindows(_, _)),
    "q_json_extract"       -> (Extras.jsonExtract(_, _)),
    "q_full_outer_daily"   -> (Extras.fullOuterDaily(_, _)),
    "q_stats_agg"          -> (Extras.statsAgg(_, _)),
    "q_set_ops"            -> (Extras.setOps(_, _)),
    "q_derivative"         -> (LogAnalytics.derivative(_, _)),
    "q_anomaly_days"       -> (LogAnalytics.anomalyDays(_, _)),
    "q_terms_other"        -> ((s, d) => LogAnalytics.termsWithOther(s, d)),
    "q_date_histogram_filled" -> (LogAnalytics.dateHistogramFilled(_, _)),
    "q_freq_items"         -> ((s, d) => Extras.freqItems(s, d)),
    // E — training-data pipeline: dedup / similarity / text / multimodal
    "q_dedup_exact"     -> (Dedup.exact(_, _)),
    "q_dedup_minhash"   -> (Dedup.minhashPairs(_, _)),
    "q_dedup_simhash"   -> (Dedup.simhashPairs(_, _)),
    "q_ngram_jaccard"   -> (Dedup.ngramJaccard(_, _)),
    "q_dedup_embedding" -> (Dedup.embeddingPairs(_, _)),
    "q_dedup_corpus"    -> (Dedup.canonicalCorpus(_, _)),
    "q_ann_topk"        -> (Similarity.annTopK(_, _)),
    "q_ann_topk_agg"    -> (Similarity.annTopKAgg(_, _)),
    "q_ann_lsh"         -> (Similarity.annLsh(_, _)),
    "q_ann_ivf"         -> ((s, d) => Similarity.annIvf(s, d)),
    "q_token_count"     -> (TextAnalysis.tokenCount(_, _)),
    "q_quality_score"   -> (TextAnalysis.qualityScore(_, _)),
    "q_lang_id"         -> (TextAnalysis.langId(_, _)),
    "q_fingerprint"     -> (TextAnalysis.fingerprint(_, _)),
    "q_multimodal_meta" -> (Multimodal.features(_, _)),
    "q_dedup_levenshtein" -> (Dedup.levenshteinPairs(_, _)),
    "q_sample_stratified" -> (Curation.stratifiedSample(_, _)),
    "q_quality_filter"    -> (Curation.qualityFilter(_, _)),
    "q_pii_scrub"         -> (Curation.piiScrub(_, _)),
    "q_contamination"     -> ((s, d) => Curation.contamination(s, d)),
    "q_tfidf_terms"       -> ((s, d) => TextAnalysis.tfidfTerms(s, d)),
    "q_sig_terms"         -> ((s, d) => TextAnalysis.significantTerms(s, d)),
    // D — general batch analytics
    "q_pricing_summary"      -> (Tpch.pricingSummary(_, _)),
    "q_revenue_filter"       -> (Tpch.revenueFilter(_, _)),
    "q_shipping_priority"    -> (Tpch.shippingPriority(_, _)),
    "q_local_supplier_volume" -> (Tpch.localSupplierVolume(_, _)),
    "q_small_qty_revenue"    -> (Tpch.smallQtyRevenue(_, _)),
    "q_running_revenue"      -> (Tpch.runningRevenue(_, _)),
  )

  /** DuckDB-runnable oracle SQL, same column names as the Spark plan. */
  def oracleSql: Map[String, String] = Map(
    "q_apache_parse"       -> LogAnalytics.apacheParseSql,
    "q_user_agents"        -> LogAnalytics.userAgentsSql,
    "q_lambda_events"      -> LogAnalytics.lambdaEventsSql,
    "q_date_histogram"     -> LogAnalytics.dateHistogramSql,
    "q_terms_agg"          -> LogAnalytics.termsAggSql,
    "q_search"             -> LogAnalytics.searchSql,
    "q_error_rate"         -> LogAnalytics.errorRateSql,
    "q_percentiles"        -> LogAnalytics.percentilesSql,
    "q_cardinality"        -> LogAnalytics.cardinalitySql,
    "q_top_users_per_type" -> LogAnalytics.topUsersPerTypeSql,
    "q_sessionize"         -> LogAnalytics.sessionizeSql,
    "q_enrich_join"        -> LogAnalytics.enrichJoinSql,
    "q_dedup_exact"     -> Dedup.exactSql,
    "q_ngram_jaccard"   -> Dedup.ngramJaccardSql,
    "q_dedup_embedding" -> Dedup.embeddingPairsSql,
    "q_dedup_corpus"    -> Dedup.canonicalCorpusSql,
    "q_ann_topk"        -> Similarity.annTopKSql,
    "q_ann_topk_agg"    -> Similarity.annTopKSql,
    "q_exists_orders"   -> Extras.customersWithOrdersSql,
    "q_missing_orders"  -> Extras.customersWithoutOrdersSql,
    "q_rollup_revenue"  -> Extras.rollupRevenueSql,
    "q_moving_avg"      -> Extras.movingAvgSql,
    "q_value_histogram" -> Extras.valueHistogramSql,
    "q_latest_per_user" -> Extras.latestEventPerUserSql,
    "q_asof_join"       -> Extras.asofViewBeforePurchaseSql,
    "q_pivot_events"    -> Extras.pivotEventsSql,
    "q_cube_revenue"    -> Extras.cubeRevenueSql,
    "q_window_ranks"    -> Extras.windowRanksSql,
    "q_interval_join"   -> Extras.viewsBeforePurchaseSql,
    "q_session_window"  -> Extras.sessionWindowsSql,
    "q_json_extract"    -> Extras.jsonExtractSql,
    "q_full_outer_daily" -> Extras.fullOuterDailySql,
    "q_stats_agg"        -> Extras.statsAggSql,
    "q_lang_id"          -> TextAnalysis.langIdSql,
    "q_set_ops"          -> Extras.setOpsSql,
    "q_derivative"      -> LogAnalytics.derivativeSql,
    "q_anomaly_days"    -> LogAnalytics.anomalyDaysSql,
    "q_terms_other"     -> LogAnalytics.termsWithOtherSql,
    "q_date_histogram_filled" -> LogAnalytics.dateHistogramFilledSql,
    "q_dedup_levenshtein" -> Dedup.levenshteinPairsSql,
    "q_sample_stratified" -> Curation.stratifiedSampleSql,
    "q_quality_filter"    -> Curation.qualityFilterSql,
    "q_pii_scrub"         -> Curation.piiScrubSql,
    "q_contamination"     -> Curation.contaminationSql,
    "q_tfidf_terms"       -> TextAnalysis.tfidfTermsSql,
    "q_sig_terms"         -> TextAnalysis.significantTermsSql,
    "q_token_count"     -> TextAnalysis.tokenCountSql,
    "q_quality_score"   -> TextAnalysis.qualityScoreSql,
    "q_pricing_summary"      -> Tpch.pricingSummarySql,
    "q_revenue_filter"       -> Tpch.revenueFilterSql,
    "q_shipping_priority"    -> Tpch.shippingPrioritySql,
    "q_local_supplier_volume" -> Tpch.localSupplierVolumeSql,
    "q_small_qty_revenue"    -> Tpch.smallQtyRevenueSql,
    "q_running_revenue"      -> Tpch.runningRevenueSql,
  )
}
