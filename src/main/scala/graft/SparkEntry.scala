package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.coverage.{LlmOpQueries => L, OperatorQueries => Q, OracleSql}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The carrier-KPI shape: role-playing broadcast joins + conditional
    * aggregation + ordering, over tables with no session-config demands
    * (events.parquet needs the ns-timestamp legacy flag — avoided here so
    * the smoke check passes in any driver-owned session). */
  def entry(spark: SparkSession): DataFrame =
    Q.j2RolePlayingJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s4_scan_count" -> (Q.s4ScanCount _),
    "s6_ctas_projection" -> (Q.s6CtasProjection _),
    "s7_anti_join_dedup" -> (Q.s7AntiJoinDedup _),
    "s2_json_decode" -> (Q.s2JsonDecode _),
    "p1_cast_trim" -> (Q.p1CastTrim _),
    "p2_null_empty_filter" -> (Q.p2NullEmptyFilter _),
    "p3_conjunctive_filter" -> (Q.p3ConjunctiveFilter _),
    "p4_flag_projection" -> (Q.p4FlagProjection _),
    "p6_case_label" -> (Q.p6CaseLabel _),
    "p8_range_predicate" -> (Q.p8RangePredicate _),
    "p9_set_membership" -> (Q.p9SetMembership _),
    "p10_try_cast" -> (Q.p10TryCast _),
    "p11_inequality_filter" -> (Q.p11InequalityFilter _),
    "j1_left_join_agg" -> (Q.j1LeftJoinAgg _),
    "j2_role_playing_join" -> (Q.j2RolePlayingJoin _),
    "j7_agg_agg_join" -> (Q.j7AggAggJoin _),
    "j_semi_join" -> (Q.jSemiJoin _),
    "j_asof_join" -> (Q.jAsofJoin _),
    "j_range_join" -> (Q.jRangeJoin _),
    "j_skew_salted" -> (Q.jSkewSalted _),
    "j_scd2_merge" -> (Q.jScd2Merge _),
    "a1_group_multi_agg" -> (Q.a1GroupMultiAgg _),
    "a2_distinct" -> (Q.a2Distinct _),
    "u1_union_dedup" -> (Q.u1UnionDedup _),
    "a4_daily_count" -> (Q.a4DailyCount _),
    "a5_two_key_count" -> (Q.a5TwoKeyCount _),
    "a6_conditional_agg" -> (Q.a6ConditionalAgg _),
    "a7_avg" -> (Q.a7Avg _),
    "a8_count_distinct" -> (Q.a8CountDistinct _),
    "a9_global_scalars" -> (Q.a9GlobalScalars _),
    "a10_filtered_counts" -> (Q.a10FilteredCounts _),
    "a11_having_duplicates" -> (Q.a11HavingDuplicates _),
    "a12_minute_buckets" -> (Q.a12MinuteBuckets _),
    "o3_top_k" -> (Q.o3TopK _),
    "f_md5_surrogate_key" -> (Q.fMd5SurrogateKey _),
    "f_datetime_extract" -> (Q.fDatetimeExtract _),
    "f_string_compare" -> (Q.fStringCompare _),
    "f_null_functions" -> (Q.fNullFunctions _),
    "w_row_number_latest" -> (Q.wRowNumberLatest _),
    "w_running_sum" -> (Q.wRunningSum _),
    "w_lag_rank" -> (Q.wLagRank _),
    "w_sessionize" -> (Q.wSessionize _),
    "w_sessionize_salted" -> (Q.wSessionizeSalted _),
    "w_sessionize_10x" -> (Q.wSessionize10x _),
    "a8_approx_count_distinct" -> (Q.a8ApproxCountDistinct _),
    "a_rollup" -> (Q.aRollup _),
    "a_grouping_sets" -> (Q.aGroupingSets _),
    "w_ntile" -> (Q.wNtile _),
    "a_percentile" -> (Q.aPercentile _),
    "a_percentile_approx" -> (Q.aPercentileApprox _),
    "a_pivot" -> (Q.aPivot _),
    // LLM-training-data operators (documents / embeddings tables)
    "t_token_count" -> (L.tTokenCount _),
    "t_quality_score" -> (L.tQualityScore _),
    "t_language_id" -> (L.tLanguageId _),
    "t_fingerprint" -> (L.tFingerprint _),
    "dedup_exact_clusters" -> (L.dedupExactClusters _),
    "dedup_exact_count" -> (L.dedupExactCount _),
    "dedup_minhash_pairs" -> (L.dedupMinhashPairs _),
    "dedup_minhash_verified" -> (L.dedupMinhashVerified _),
    "dedup_span_report" -> (L.dedupSpanReport _),
    "dedup_span_excise" -> (L.dedupSpanExcise _),
    "t_bpe_merges" -> (L.tBpeMerges _),
    "t_bpe_tokenize" -> (L.tBpeTokenize _),
    "dedup_streaming_replay" -> (L.dedupStreamingReplay _),
    "dedup_minhash_pairs_10x" -> (L.dedupMinhashPairs10x _),
    "dedup_simhash_pairs" -> (L.dedupSimhashPairs _),
    "dedup_simhash_verified" -> (L.dedupSimhashVerified _),
    "dedup_cluster_assign" -> (L.dedupClusterAssign _),
    "dedup_incremental" -> (L.dedupIncremental _),
    "dedup_span_report_10x" -> (L.dedupSpanReport10x _),
    "dedup_ngram_jaccard" -> (L.dedupNgramJaccard _),
    "dedup_embedding_cosine" -> (L.dedupEmbeddingCosine _),
    "dedup_embedding_cosine_10x" -> (L.dedupEmbeddingCosine10x _),
    "samp_deterministic" -> (L.sampDeterministic _),
    "samp_shuffle_shards" -> (L.sampShuffleShards _),
    "samp_mix_weighted" -> (L.sampMixWeighted _),
    "dedup_lines" -> (L.dedupLines _),
    "samp_stratified" -> (L.sampStratified _),
    "samp_split_counts" -> (L.sampSplitCounts _),
    "samp_domain_cap" -> (L.sampDomainCap _),
    "samp_token_budget" -> (L.sampTokenBudget _),
    "t_bm25_topk" -> (L.tBm25TopK _),
    "t_nb_classify" -> (L.tNbClassify _),
    "t_repetition" -> (L.tRepetition _),
    "t_filter_cascade" -> (L.tFilterCascade _),
    "t_lm_perplexity" -> (L.tLmPerplexity _),
    "t_dsir_select" -> (L.tDsirSelect _),
    "t_lm_perplexity_10x" -> (L.tLmPerplexity10x _),
    "t_html_extract" -> (L.tHtmlExtract _),
    "o_zorder_key" -> (Q.oZorderKey _),
    "s_jsonl_roundtrip" -> (L.sJsonlRoundtrip _),
    "t_unicode_normalize" -> (L.tUnicodeNormalize _),
    "t_curation_pipeline" -> (L.tCurationPipeline _),
    "t_chunk_windows" -> (L.tChunkWindows _),
    "t_decontaminate" -> (L.tDecontaminate _),
    "t_decontaminate_bloom" -> (L.tDecontaminateBloom _),
    "t_decontaminate_10x" -> (L.tDecontaminate10x _),
    "t_pii_redact" -> (L.tPiiRedact _),
    "t_salient_terms" -> (L.tSalientTerms _),
    "t_salient_terms_10x" -> (L.tSalientTerms10x _),
    "t_top_terms" -> (L.tTopTerms _),
    "t_pack_plan" -> (L.tPackPlan _),
    "v_quantize_int8" -> (L.vQuantizeInt8 _),
    "sim_brute_force_topk" -> (L.simBruteForceTopK _),
    "sim_lsh_recall" -> (L.simLshRecall _),
    "sim_ivf_recall" -> (L.simIvfRecall _),
    "sim_ivf_indexed" -> (L.simIvfIndexed _),
    "mm_decode_featurize" -> (L.mmDecodeFeaturize _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = OracleSql.sql
}
