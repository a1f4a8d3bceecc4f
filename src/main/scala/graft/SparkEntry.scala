package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{LearnOps, OracleSql, PipelineOps, Queries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory surface (SURVEY.md §2): each entry is
  * one implemented operator; `oracleSql` holds the DuckDB-equivalent SQL the
  * driver uses for the correctness gate. Entries without an oracle are
  * non-SQL-expressible (full dedup pipeline, float cosine ranking) and get
  * the driver's rows-only check.
  */
object SparkEntry {

  /** Flagship: full near-duplicate clustering of a Common-Crawl-style page
    * table derived from sf0.001 documents (url, cluster_id, confidence). */
  def entry(spark: SparkSession): DataFrame = {
    val pages = graft.data.WebText.fromDocuments(spark, "/root/testdata/sf0.001").toDF()
    graft.dedup.Pipeline.run(spark, pages, graft.dedup.DedupConfig())
  }

  /** Full pipeline as a catalog query (rows-only check: hierarchical
    * clustering + confidences are not SQL-expressible). */
  private def dedupClusterWebtext(s: SparkSession, dir: String): DataFrame = {
    val pages = graft.data.WebText.fromDocuments(s, dir).toDF()
    graft.dedup.Pipeline.run(s, pages, graft.dedup.DedupConfig())
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // scans
    "scan_docs" -> (Queries.scanDocs _),
    // blocking predicates (SURVEY.md §2.2)
    "pred_first_token" -> (Queries.predFirstToken _),
    "pred_first_two_tokens" -> (Queries.predFirstTwoTokens _),
    "pred_token_field" -> (Queries.predTokenField _),
    "pred_common_integer" -> (Queries.predCommonInteger _),
    "pred_alpha_numeric" -> (Queries.predAlphaNumeric _),
    "pred_near_integers" -> (Queries.predNearIntegers _),
    "pred_hundred_integer" -> (Queries.predHundredInteger _),
    "pred_hundred_integers_odd" -> (Queries.predHundredIntegersOdd _),
    "pred_first_integer" -> (Queries.predFirstInteger _),
    "pred_fingerprint" -> (Queries.predFingerprint _),
    "pred_one_gram_fingerprint" -> (Queries.predOneGramFingerprint _),
    "pred_two_gram_fingerprint" -> (Queries.predTwoGramFingerprint _),
    "pred_common_four_gram" -> (Queries.predCommonFourGram _),
    "pred_common_six_gram" -> (Queries.predCommonSixGram _),
    "pred_same_three_char_start" -> (Queries.predSameThreeCharStart _),
    "pred_same_five_char_start" -> (Queries.predSameFiveCharStart _),
    "pred_same_seven_char_start" -> (Queries.predSameSevenCharStart _),
    "pred_suffix_array" -> (Queries.predSuffixArray _),
    "pred_sorted_acronym" -> (Queries.predSortedAcronym _),
    "pred_common_two_tokens" -> (Queries.predCommonTwoTokens _),
    "pred_common_three_tokens" -> (Queries.predCommonThreeTokens _),
    "pred_common_two_elements" -> (Queries.predCommonTwoElements _),
    "pred_common_three_elements" -> (Queries.predCommonThreeElements _),
    "pred_whole_field" -> (Queries.predWholeField _),
    "pred_whole_set" -> (Queries.predWholeSet _),
    "pred_first_last_set_element" -> (Queries.predFirstLastSetElement _),
    "pred_magnitude_cardinality" -> (Queries.predMagnitudeOfCardinality _),
    "pred_exists" -> (Queries.predExists _),
    "pred_order_of_magnitude" -> (Queries.predOrderOfMagnitude _),
    "pred_round_to1" -> (Queries.predRoundTo1 _),
    "pred_latlong_grid" -> (Queries.predLatLongGrid _),
    "pred_double_metaphone" -> (Queries.predDoubleMetaphone _), // rows-only (no DuckDB metaphone)
    // pair generation (§2.3)
    "pairs_self_join" -> (Queries.pairsSelfJoin _),
    "pairs_record_link" -> (Queries.pairsRecordLink _),
    // scoring (§2.4)
    "score_jaccard_tokens" -> (Queries.scoreJaccardTokens _),
    "score_features" -> (PipelineOps.scoreFeatures _),
    "score_lr_sigmoid" -> (PipelineOps.scoreLrSigmoid _),
    "score_geo_price" -> (PipelineOps.scoreGeoPrice _),
    "score_cosine_tfidf" -> (PipelineOps.scoreCosineTfidf _),
    "score_cosine_set" -> (PipelineOps.scoreCosineSet _),
    "score_lcs_suffix" -> (PipelineOps.scoreLcsSuffix _),
    "tfidf_search" -> (PipelineOps.tfidfSearch _),
    // clustering (§2.5)
    "cluster_cc" -> (Queries.clusterConnectedComponents _),
    "cluster_gazette_topn" -> (Queries.clusterGazetteTopN _),
    "dedup_cluster_webtext" -> (dedupClusterWebtext _), // rows-only
    // relational rubric (§2.8)
    "q1_agg" -> (Queries.q1Agg _),
    "q_join_agg" -> (Queries.qJoinAgg _),
    "q_window_topn" -> (Queries.qWindowTopN _),
    "q_anti_join" -> (Queries.qAntiJoin _),
    "q_semi_join" -> (Queries.qSemiJoin _),
    "q_set_ops" -> (Queries.qSetOps _),
    "q_sort_limit" -> (Queries.qSortLimit _),
    "q_count_distinct" -> (Queries.qCountDistinct _),
    "q_events_window" -> (Queries.qEventsWindow _),
    "q_json_extract" -> (Queries.qJsonExtract _),
    "scan_csv_preprocess" -> (Queries.scanCsvPreprocess _),
    // training-data pipeline operators
    "dedup_exact" -> (PipelineOps.dedupExact _),
    "dedup_minhash_sig" -> (PipelineOps.minhashSignatures _),
    "dedup_minhash_lsh" -> (PipelineOps.dedupMinhashLsh _),
    "dedup_simhash16" -> (PipelineOps.simhash16 _),
    "dedup_ngram_jaccard" -> (PipelineOps.dedupNgramJaccard _),
    "text_token_stats" -> (PipelineOps.textTokenStats _),
    "text_bpe_tokens" -> (PipelineOps.textBpeTokens _),
    "text_quality" -> (PipelineOps.textQuality _),
    "text_langid" -> (PipelineOps.textLangId _),
    "text_fingerprint" -> (PipelineOps.textFingerprint _),
    "ann_l2_topk" -> (PipelineOps.annTopK _),
    "ann_cosine_topk" -> (PipelineOps.annCosine _),
    "dedup_embed_cosine" -> (PipelineOps.dedupEmbedCosine _),
    "mm_frame_sample" -> (PipelineOps.mmFrameSample _),
    "gazette_search_empty_fill" -> (PipelineOps.gazetteSearchEmptyFill _),
    "training_pairs" -> (PipelineOps.trainingPairs _),
    "training_pairs_link" -> (PipelineOps.trainingPairsLink _),
    "mm_binary_meta" -> (PipelineOps.mmBinaryMeta _),
    "canonical_rep" -> (PipelineOps.canonicalRep _), // rows-only (affine-gap centroid)
    // learning surface (§2.7)
    "learn_cover" -> (LearnOps.learnCover _),
    "learn_predicates" -> (LearnOps.learnPredicates _), // rows-only (set-cover search)
    "learn_lr_score" -> (LearnOps.learnLrScore _), // rows-only (IRLS fit)
    "learn_disagreement" -> (LearnOps.learnDisagreement _),
    "learn_weighted_sample" -> (LearnOps.learnWeightedSample _),
    "score_datamodel" -> (LearnOps.scoreDatamodel _),
    "trained_partition" -> (LearnOps.trainedPartition _), // rows-only (full learned loop)
    "trained_restaurant" -> (LearnOps.trainedRestaurant _), // rows-only (reference's own benchmark)
    "trained_link" -> (LearnOps.trainedLink _), // rows-only (learned RecordLink.join)
    "trained_search" -> (LearnOps.trainedSearch _), // rows-only (learned Gazetteer.search)
    "trained_restaurant_link" -> (LearnOps.trainedRestaurantLink _), // rows-only (canonical_matching.py)
    "trained_restaurant_gazette" -> (LearnOps.trainedRestaurantGazette _), // rows-only (canonical_gazetteer.py)
    // kernel-only ops promoted to catalog rows (rows-only)
    "score_blend_lcs" -> (PipelineOps.scoreBlendLcs _),
    "pred_metaphone_token" -> (Queries.predMetaphoneToken _), // rows-only (no DuckDB metaphone)
    "score_affine_gap" -> (Queries.scoreAffineGap _) // rows-only (affine-gap DP)
  )

  def oracleSql: Map[String, String] = OracleSql.sql
}
