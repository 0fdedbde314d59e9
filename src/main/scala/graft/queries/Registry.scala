package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-checked operator exercise (SURVEY §2 row). */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

/** Central registry aggregated by SparkEntry; modules contribute
  * their SURVEY §2 rows here.
  */
object Registry {
  def all: Seq[QueryDef] = Seq(
    QueryDef("q1_pricing", Analytic.q1Pricing, Some(Analytic.q1PricingSql)),
    QueryDef("q3_priority", Analytic.q3Priority, Some(Analytic.q3PrioritySql)),
    QueryDef("q5_volume", Analytic.q5Volume, Some(Analytic.q5VolumeSql)),
    QueryDef("q_topn_window", Analytic.qTopnWindow, Some(Analytic.qTopnWindowSql)),
    QueryDef("q_events_window", Analytic.qEventsWindow, Some(Analytic.qEventsWindowSql)),
    QueryDef("q_sessionize", Analytic.qSessionize, Some(Analytic.qSessionizeSql)),
    QueryDef("src_select_alias", SourceQueries.srcSelectAlias, Some(SourceQueries.srcSelectAliasSql)),
    QueryDef("src_json_nested", SourceQueries.srcJsonNested, Some(SourceQueries.srcJsonNestedSql)),
    QueryDef("src_bbox_filter", SourceQueries.srcBboxFilter, Some(SourceQueries.srcBboxFilterSql)),
    QueryDef("src_filter_eq", SourceQueries.srcFilterEq, Some(SourceQueries.srcFilterEqSql)),
    QueryDef("src_filter_in", SourceQueries.srcFilterIn, Some(SourceQueries.srcFilterInSql)),
    QueryDef("src_limit", SourceQueries.srcLimit, Some(SourceQueries.srcLimitSql)),
    QueryDef("src_multilayer", SourceQueries.srcMultilayer, Some(SourceQueries.srcMultilayerSql)),
    QueryDef("src_geometry_split", SourceQueries.srcGeometrySplit, Some(SourceQueries.srcGeometrySplitSql)),
    QueryDef("src_divisions_clip", SourceQueries.srcDivisionsClip, Some(SourceQueries.srcDivisionsClipSql)),
    QueryDef("tr_normalize_roads", TransformQueries.trNormalizeRoads, Some(TransformQueries.trNormalizeRoadsSql)),
    QueryDef("tr_normalize_buildings", TransformQueries.trNormalizeBuildings, Some(TransformQueries.trNormalizeBuildingsSql)),
    QueryDef("tr_normalize_places", TransformQueries.trNormalizePlaces, Some(TransformQueries.trNormalizePlacesSql)),
    QueryDef("tr_clip_strings", TransformQueries.trClipStrings, Some(TransformQueries.trClipStringsSql)),
    QueryDef("tr_safe_numeric", TransformQueries.trSafeNumeric, Some(TransformQueries.trSafeNumericSql)),
    QueryDef("tr_first_of_array", TransformQueries.trFirstOfArray, Some(TransformQueries.trFirstOfArraySql)),
    QueryDef("tr_sanitize_fields", TransformQueries.trSanitizeFields, Some(TransformQueries.trSanitizeFieldsSql)),
    QueryDef("tr_metadata_enrich", TransformQueries.trMetadataEnrich, Some(TransformQueries.trMetadataEnrichSql)),
    QueryDef("tr_drop_invalid", TransformQueries.trDropInvalid, Some(TransformQueries.trDropInvalidSql)),
    QueryDef("geo_bbox_agg", GeoQueries.geoBboxAgg, Some(GeoQueries.geoBboxAggSql)),
    QueryDef("geo_line_length", GeoQueries.geoLineLength, Some(GeoQueries.geoLineLengthSql)),
    QueryDef("geo_point_in_bbox", GeoQueries.geoPointInBbox, Some(GeoQueries.geoPointInBboxSql)),
    QueryDef("geo_haversine", GeoQueries.geoHaversine, Some(GeoQueries.geoHaversineSql)),
    QueryDef("dd_exact", LlmQueries.ddExact, Some(LlmQueries.ddExactSql)),
    QueryDef("dd_minhash_lsh", LlmQueries.ddMinhashLsh, None),
    QueryDef("dd_simhash", LlmQueries.ddSimhash, None),
    QueryDef("dd_ngram_jaccard", LlmQueries.ddNgramJaccard, Some(LlmQueries.ddNgramJaccardSql)),
    QueryDef("sim_cosine_topk", LlmQueries.simCosineTopk, Some(LlmQueries.simCosineTopkSql)),
    QueryDef("sim_lsh_ann", LlmQueries.simLshAnn, None),
    QueryDef("sim_centroid", LlmQueries.simCentroid, Some(LlmQueries.simCentroidSql)),
    QueryDef("tx_tokens", LlmQueries.txTokens, Some(LlmQueries.txTokensSql)),
    QueryDef("tx_quality", LlmQueries.txQuality, Some(LlmQueries.txQualitySql)),
    QueryDef("tx_langid", LlmQueries.txLangid, Some(LlmQueries.txLangidSql)),
    QueryDef("tx_fingerprint", LlmQueries.txFingerprint, Some(LlmQueries.txFingerprintSql)),
    QueryDef("mm_binary_meta", LlmQueries.mmBinaryMeta, Some(LlmQueries.mmBinaryMetaSql)),
    QueryDef("ref_roads", RefQueries.refRoads, Some(RefQueries.refRoadsSql)),
    QueryDef("ref_buildings", RefQueries.refBuildings, Some(RefQueries.refBuildingsSql)),
    QueryDef("ref_education", RefQueries.refEducation, Some(RefQueries.refEducationSql)),
    QueryDef("ref_markets", RefQueries.refMarkets, Some(RefQueries.refMarketsSql)),
    QueryDef("ref_power", RefQueries.refPower, Some(RefQueries.refPowerSql)),
    QueryDef("q_exists", Analytic2.qExists, Some(Analytic2.qExistsSql)),
    QueryDef("q_not_exists", Analytic2.qNotExists, Some(Analytic2.qNotExistsSql)),
    QueryDef("q_rollup", Analytic2.qRollup, Some(Analytic2.qRollupSql)),
    QueryDef("q_percentiles", Analytic2.qPercentiles, Some(Analytic2.qPercentilesSql)),
    QueryDef("q_pivot", Analytic2.qPivot, Some(Analytic2.qPivotSql)),
    QueryDef("q_enrich_join", Analytic2.qEnrichJoin, Some(Analytic2.qEnrichJoinSql)),
    QueryDef("q_salted_agg", Analytic2.qSaltedAgg, Some(Analytic2.qSaltedAggSql)),
    QueryDef("dd_exact_norm", LlmQueries.ddExactNorm, Some(LlmQueries.ddExactNormSql)),
    QueryDef("tx_bigrams", LlmQueries.txBigrams, Some(LlmQueries.txBigramsSql)),
    QueryDef("tx_vocab_approx", LlmQueries.txVocabApprox, None),
    QueryDef("q_asof_join", Analytic2.qAsofJoin, Some(Analytic2.qAsofJoinSql)),
    QueryDef("tx_tfidf", LlmQueries.txTfidf, Some(LlmQueries.txTfidfSql)),
    QueryDef("dd_dedup_groups", LlmQueries.ddDedupGroups, Some(LlmQueries.ddDedupGroupsSql)),
    QueryDef("geo_centroid", GeoQueries.geoCentroid, Some(GeoQueries.geoCentroidSql)),
    QueryDef("pipe_clean_corpus", LlmQueries.pipeCleanCorpus, Some(LlmQueries.pipeCleanCorpusSql)),
    QueryDef("q_moving_avg", Analytic2.qMovingAvg, Some(Analytic2.qMovingAvgSql)),
    QueryDef("q_ntile", Analytic2.qNtile, Some(Analytic2.qNtileSql)),
    QueryDef("q_histogram", Analytic2.qHistogram, Some(Analytic2.qHistogramSql)),
    QueryDef("geo_grid_join", GeoQueries.geoGridJoin, Some(GeoQueries.geoGridJoinSql)),
    QueryDef("geo_bbox_typed", GeoQueries.geoBboxTyped, Some(GeoQueries.geoBboxTypedSql)),
    QueryDef("q_topn_heap", Analytic2.qTopnHeap, Some(Analytic2.qTopnHeapSql)),
    QueryDef("src_regex_extract", SourceQueries.srcRegexExtract, Some(SourceQueries.srcRegexExtractSql)),
    QueryDef("src_intersect", SourceQueries.srcIntersect, Some(SourceQueries.srcIntersectSql)),
    QueryDef("src_except", SourceQueries.srcExcept, Some(SourceQueries.srcExceptSql)),
    QueryDef("sm_split_assign", LlmQueries.smSplitAssign, Some(LlmQueries.smSplitAssignSql)),
    QueryDef("sm_stratified", LlmQueries.smStratified, Some(LlmQueries.smStratifiedSql))
  )
}
