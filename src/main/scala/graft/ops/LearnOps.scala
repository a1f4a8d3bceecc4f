package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.learn.{BlockLearner, Cover, Disagreement, LogisticRegression, NamedPredicate, PredicateZoo}

/**
 * Catalog queries for the learning surface (SURVEY.md §2.7): predicate
 * coverage, blocking-rule learning, deterministic classifier fitting and
 * the active-learning disagreement ranking — each over deterministic
 * fixtures derived from the `documents` table so runs are reproducible at
 * any SF.
 */
object LearnOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Deterministic labeled "match" fixture: each of the first 25 docs
    * paired with itself minus its last two word tokens — a truncation dup,
    * the common web near-dup (f2 keeps >= 1 token so predicates see text).
    * pair_id = 0..n-1 in doc_id order. */
  private def matchFixture(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).filter(col("doc_id") < 25)
      .select(col("doc_id"), col("text"))
    val trunc = expr(
      "array_join(slice(split(text, ' '), 1, greatest(size(split(text, ' ')) - 2, 1)), ' ')")
    d.select(col("doc_id").as("pair_id"), col("text").as("f1"), trunc.as("f2"))
  }

  /** Consecutive-doc pair fixture for the coverage oracle: (doc d, doc d+1)
    * — unrelated in general, so coverage counts are discriminative. */
  private def consecutivePairs(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    d.as("a").join(d.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
      .select(col("a.doc_id").as("pair_id"),
        col("a.text").as("f1"), col("b.text").as("f2"))
  }

  /** The SQL-expressible subset of the zoo used by the oracle-checked
    * coverage query (the full 24-predicate zoo runs in `learn_predicates`;
    * DuckDB can express these four exactly). */
  private def oraclePreds: Seq[NamedPredicate] = {
    val all = PredicateZoo.stringPredicates("text").map(p => p.name -> p).toMap
    Seq("(wholeFieldPredicate, text)", "(firstTokenPredicate, text)",
      "(tokenFieldPredicate, text)", "(sameThreeCharStartPredicate, text)")
      .map(all)
  }

  /** Match-cover counts per predicate over the consecutive-pair fixture —
    * the `BlockLearner.cover` table (`training.py:97-123`) surfaced as a
    * catalog query, DuckDB-oracled for the 4 SQL-expressible predicates. */
  def learnCover(s: SparkSession, dir: String): DataFrame =
    Cover.matchCover(consecutivePairs(s, dir), oraclePreds)
      .groupBy(col("predicate"))
      .agg(count(lit(1)).as("covered_pairs"))

  /** Learned blocking-rule set (`BlockLearner.learn`, `training.py:37-95` +
    * `branch_and_bound.py:46-90`) over the truncation-dup fixture: the
    * cheapest predicate subset covering all coverable matches. Rows-only
    * (set-cover search is not SQL-expressible); semantics are golden-tested
    * against `tests/test_training.py` in LearnSpec. */
  def learnPredicates(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val records = docs(s, dir).filter(col("doc_id") < 300)
      .select(col("doc_id").as("rid"), col("text").as("f"))
    val learned = BlockLearner.learn(
      matchFixture(s, dir), records, PredicateZoo.stringPredicates("text"), recall = 1.0)
    learned.predicates.sorted
      .map(p => (p, learned.targetCover.toLong, learned.covered.size.toLong))
      .toDF("predicate", "target_cover", "covered_matches")
  }

  /** Deterministic LR fit + distributed inference — the train→score loop
    * (`labeler.py:79-98` fit, `core.py:78-79` predict_proba): labels come
    * from the truncation fixture (match) and consecutive pairs (distinct),
    * features are integer token-overlap ratios; the fitted weights then
    * score the candidate pairs in the cluster. Rows-only: the IRLS fit has
    * no SQL analogue; determinism + separation are spec-tested. */
  def learnLrScore(s: SparkSession, dir: String): DataFrame = {
    def feats(df: DataFrame) = df.select(col("pair_id"),
      (size(array_intersect(Queries.toks(col("f1")), Queries.toks(col("f2")))).cast("double") /
        greatest(size(array_union(Queries.toks(col("f1")), Queries.toks(col("f2")))), lit(1)))
        .as("f_jac"),
      when(col("f1") === col("f2"), 1.0).otherwise(0.0).as("f_exact"))
    val pos = feats(matchFixture(s, dir)).withColumn("label", lit(1))
    val neg = feats(consecutivePairs(s, dir).filter(col("pair_id") < 25))
      .withColumn("label", lit(0))
    val (x, y) = LogisticRegression.collectTraining(
      pos.unionByName(neg), Seq("f_jac", "f_exact"), "label")
    val model = LogisticRegression.fit(x, y)
    // inference runs distributed over a fresh candidate frame
    feats(consecutivePairs(s, dir))
      .select(col("pair_id"),
        floor(LogisticRegression.scoreColumn(model,
          Seq(col("f_jac"), col("f_exact"))) * 1000000).cast("long").as("score_q"))
  }

  /** The full learned-settings loop as one catalog query —
    * `train → partition` (`api.py:1100-1195,151-195`, see
    * [[graft.learn.TrainedDedupe]]): truncation-dup positives + consecutive
    * negatives train the blocker and classifier; the corpus (originals +
    * their truncations under shifted rids) is then partitioned under the
    * learned settings. Rows-only (set cover + IRLS + linkage); the loop's
    * semantics are spec-tested in TrainedDedupeSpec. */
  def trainedPartition(s: SparkSession, dir: String): DataFrame = {
    val trunc = expr(
      "array_join(slice(split(f, ' '), 1, greatest(size(split(f, ' ')) - 2, 1)), ' ')")
    val base = docs(s, dir).filter(col("doc_id") < 300)
      .select(col("doc_id").as("rid"), col("text").as("f"))
    val records = base.unionByName(
      base.select((col("rid") + 100000L).as("rid"), trunc.as("f")))
    val pos = matchFixture(s, dir)
      .select(col("pair_id"), col("f1"), col("f2"), lit(1).as("label"))
    val neg = consecutivePairs(s, dir).filter(col("pair_id") < 25)
      .select((col("pair_id") + 1000L).as("pair_id"), col("f1"), col("f2"),
        lit(0).as("label"))
    val settings = graft.learn.TrainedDedupe.train(pos.unionByName(neg), records)
    graft.learn.TrainedDedupe.partition(records, settings)
  }

  /** Predicate-vote-weighted candidate sampling (`labeler.py:170-203`,
    * see [[Cover.weightedPairSample]]) over the first 100 docs with the
    * SQL-expressible predicate subset — DuckDB-oracled end to end
    * (integer-quantized votes, deterministic top-50). */
  def learnWeightedSample(s: SparkSession, dir: String): DataFrame = {
    val records = docs(s, dir).filter(col("doc_id") < 100)
      .filter(col("text").isNotNull && col("text") =!= "")
      .select(col("doc_id").as("rid"), col("text").as("f"))
    val n = records.count()
    Cover.weightedPairSample(records, oraclePreds, n,
      sampleSize = 50, maxCover = n * (n - 1) / 2)
  }

  // catalog queries are pure functions of (spark, dir), so per-JVM
  // memoization of the deterministic trained settings is sound — it keeps
  // the driver Verify gate from re-running identical trainings for each
  // facade entry (trained_link + trained_search share one, the two
  // restaurant link entries share another)
  private val settingsCache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
  private def memo[T <: AnyRef](key: String)(mk: => T): T =
    settingsCache.computeIfAbsent(key, _ => mk).asInstanceOf[T]

  /** Train learned settings on the truncation fixture — shared by the
    * trained_link / trained_search catalog entries (same labels as
    * [[trainedPartition]], smaller record sample for verify runtime). */
  private def trainedSettings(s: SparkSession, dir: String): graft.learn.TrainedDedupe.Settings =
    memo(s"trunc:$dir") { trainedSettingsUncached(s, dir) }

  private def trainedSettingsUncached(s: SparkSession, dir: String): graft.learn.TrainedDedupe.Settings = {
    val records = docs(s, dir).filter(col("doc_id") < 150)
      .select(col("doc_id").as("rid"), col("text").as("f"))
    val pos = matchFixture(s, dir)
      .select(col("pair_id"), col("f1"), col("f2"), lit(1).as("label"))
    val neg = consecutivePairs(s, dir).filter(col("pair_id") < 25)
      .select((col("pair_id") + 1000L).as("pair_id"), col("f1"), col("f2"),
        lit(0).as("label"))
    graft.learn.TrainedDedupe.train(pos.unionByName(neg), records)
  }

  /** Learned-settings `RecordLink.join` (`api.py:411-520`, see
    * [[graft.learn.TrainedDedupe.link]]) as a catalog query: left = first
    * 150 docs, right = their truncations under shifted rids; greedy
    * one-to-one matches above 0.5. Rows-only (set cover + IRLS); semantics
    * spec-tested in TrainedDedupeSpec. */
  def trainedLink(s: SparkSession, dir: String): DataFrame = {
    val trunc = expr(
      "array_join(slice(split(f, ' '), 1, greatest(size(split(f, ' ')) - 2, 1)), ' ')")
    val left = docs(s, dir).filter(col("doc_id") < 150)
      .select(col("doc_id").as("rid"), col("text").as("f"))
    val right = left.select((col("rid") + 100000L).as("rid"), trunc.as("f"))
    val settings = trainedSettings(s, dir)
    graft.learn.TrainedDedupe.link(left, right, settings)
      .select(col("rid_l"), col("rid_r"),
        floor(col("score") * 1000000).cast("long").as("score_q"))
  }

  /** Learned-settings `Gazetteer.search` with empty-fill
    * (`api.py:938-1024`, see [[graft.learn.TrainedDedupe.search]]) as a
    * catalog query: index = first 150 docs, queries = truncations of docs
    * 100-200 (half in-index, half novel → null match rows). Rows-only. */
  def trainedSearch(s: SparkSession, dir: String): DataFrame = {
    val trunc = expr(
      "array_join(slice(split(f, ' '), 1, greatest(size(split(f, ' ')) - 2, 1)), ' ')")
    val index = docs(s, dir).filter(col("doc_id") < 150)
      .select(col("doc_id").as("rid"), col("text").as("f"))
    val queries = docs(s, dir).filter(col("doc_id") >= 100 && col("doc_id") < 200)
      .select((col("doc_id") + 100000L).as("rid"), col("text").as("f"))
      .select(col("rid"), trunc.as("f")) // docs 150+ are novel -> empty-fill rows
    val settings = trainedSettings(s, dir)
    graft.learn.TrainedDedupe.search(queries, index, settings)
      .select(col("query_rid"), col("match_rid"),
        floor(col("score") * 1000000).cast("long").as("score_q"))
  }

  /** The reference's own canonical benchmark through the learned loop
    * (`benchmarks/canonical.py` — see [[graft.learn.Restaurant]]): 864
    * restaurant records, 5-variable model, train → partition(0.5), plus
    * the `common.py:51-81` report as columns on every row. Rows-only (set
    * cover + IRLS + affine-gap linkage); RestaurantSpec asserts the
    * precision/recall >= 0.9 floors. Ignores `dir` — the input is the
    * reference's fixture, not the synthetic corpus. */
  def trainedRestaurant(s: SparkSession, dir: String): DataFrame = {
    val (clusters, _, rep) = graft.learn.Restaurant.run(s)
    clusters
      .withColumn("confidence_q", floor(col("confidence") * 10000).cast("long"))
      .drop("confidence")
      .withColumn("n_true", lit(rep.nTrue))
      .withColumn("n_found", lit(rep.nFound))
      .withColumn("precision_q", lit(math.floor(rep.precision * 10000).toLong))
      .withColumn("recall_q", lit(math.floor(rep.recall * 10000).toLong))
  }

  /** The reference's RecordLink benchmark (`benchmarks/canonical_matching
    * .py` — see [[graft.learn.Restaurant.runLink]]): restaurant-1 ×
    * restaurant-2, learned two-sided blocking, one-to-one join at 0.5, with
    * the report as columns. Rows-only; RestaurantLinkSpec asserts the
    * >= 0.9 floors (measured precision 0.9903 / recall 0.9107). */
  /** One shared training for both restaurant link entries (deterministic,
    * so the memo only saves the driver gate a duplicate run). */
  private def restaurantLink(s: SparkSession)
      : (DataFrame, DataFrame, graft.learn.TrainedDedupe.Settings) =
    memo("restaurant-link") { graft.learn.Restaurant.trainLink(s) }

  def trainedRestaurantLink(s: SparkSession, dir: String): DataFrame = {
    import graft.learn.{Restaurant, TrainedDedupe}
    val (d1, d2, settings) = restaurantLink(s)
    val links = TrainedDedupe.linkFields(d1, d2, Restaurant.LinkVariables, settings)
    val rep = Restaurant.report(Restaurant.trueLinkDupes(d1, d2),
      links.select(least(col("rid_l"), col("rid_r")).as("a"),
        greatest(col("rid_l"), col("rid_r")).as("b")))
    links.withColumn("score_q", floor(col("score") * 10000).cast("long"))
      .drop("score")
      .withColumn("n_true", lit(rep.nTrue))
      .withColumn("precision_q", lit(math.floor(rep.precision * 10000).toLong))
      .withColumn("recall_q", lit(math.floor(rep.recall * 10000).toLong))
  }

  /** The reference's Gazetteer benchmark (`benchmarks/canonical_gazetteer
    * .py` — see [[graft.learn.Restaurant.runGazetteer]]): index
    * restaurant-2, search restaurant-1 n_matches=1 with empty-fill.
    * Rows-only; same spec floors. */
  def trainedRestaurantGazette(s: SparkSession, dir: String): DataFrame = {
    import graft.learn.{Restaurant, TrainedDedupe}
    val (d1, d2, settings) = restaurantLink(s)
    val results = TrainedDedupe.searchFields(d1, d2, Restaurant.LinkVariables,
      settings, n = 1)
    val rep = Restaurant.report(Restaurant.trueLinkDupes(d1, d2),
      results.filter(col("match_rid").isNotNull)
        .select(least(col("query_rid"), col("match_rid")).as("a"),
          greatest(col("query_rid"), col("match_rid")).as("b")))
    results.withColumn("score_q", floor(col("score") * 10000).cast("long"))
      .drop("score")
      .withColumn("precision_q", lit(math.floor(rep.precision * 10000).toLong))
      .withColumn("recall_q", lit(math.floor(rep.recall * 10000).toLong))
  }

  /** Active-learning disagreement top-k (`labeler.py:348-398` as a batch
    * ranking, see [[graft.learn.Disagreement]]): candidates scored by the
    * fixed-sigmoid classifier, "covered" = the whole-field blocking
    * decision. Integer-quantized keys keep the DuckDB oracle exact. */
  def learnDisagreement(s: SparkSession, dir: String): DataFrame = {
    val cand = consecutivePairs(s, dir).select(
      col("pair_id").as("id_a"), (col("pair_id") + 1).as("id_b"),
      round(lit(1.0) / (lit(1.0) + exp(-(lit(8.0) *
        size(array_intersect(Queries.toks(col("f1")), Queries.toks(col("f2")))) /
        greatest(size(array_union(Queries.toks(col("f1")), Queries.toks(col("f2")))), lit(1)) -
        lit(4.0)))), 6).as("score"),
      when(col("f1") === col("f2"), 1).otherwise(0).as("covered"))
    Disagreement.topK(cand, 20)
      .select(col("id_a"), col("id_b"), col("tier"),
        floor(col("rank_key") * 1000000).cast("long").as("key_q"))
  }

  /**
   * The full typed featurizer as a catalog query — `DataModel.distances`
   * over EVERY oracle-expressible variable kind (`datamodel.py:106-144`):
   * exact, text (tf cosine), set (set cosine), price (log10 distance,
   * `<=0` = NaN-missing), latlong (sqrt haversine), categorical dummies,
   * exists dummies, an interaction product that inherits the price
   * missing rule, and the trailing `1 - is_missing` indicator block.
   * String/shortstring (affine gap) are excluded only because DuckDB
   * cannot express the DP — they are golden- and spec-covered. Floats
   * rounded to 6, the engine-portable convention [[PipelineOps.scoreGeoPrice]]
   * established.
   */
  def scoreDatamodel(s: SparkSession, dir: String): DataFrame = {
    import graft.learn.DataModel
    import DataModel.Variable
    val d = docs(s, dir).select(
      col("doc_id"),
      regexp_extract(col("text"), "^([a-z0-9']+[^a-z0-9']+[a-z0-9']+)", 1).as("key"),
      col("source").as("src"),
      substring(col("text"), 1, 40).as("head"),
      array_join(array_distinct(split(substring(col("text"), 1, 60), " ")),
        DataModel.SetSep).as("toks"),
      (col("doc_id") % 1000).cast("double").cast("string").as("price"),
      concat_ws(",",
        ((col("doc_id") * 7 % 18000) / lit(100.0) - 90).cast("string"),
        ((col("doc_id") * 13 % 36000) / lit(100.0) - 180).cast("string")).as("loc"),
      when(col("lang").isin("en", "fr"), col("lang")).otherwise("other").as("cat"),
      when(col("doc_id") % 3 === 0, lit(null).cast("string"))
        .otherwise(col("source")).as("ex"))
      .filter(col("key") =!= "")
    val p = d.as("a").join(d.as("b"),
      col("a.key") === col("b.key") && col("a.doc_id") < col("b.doc_id"))
    val vars = Seq(
      Variable("src", "exact"),
      Variable("head", "text"),
      Variable("toks", "set"),
      Variable("price", "price", hasMissing = true),
      Variable("loc", "latlong"),
      Variable("cat", "categorical", categories = Seq("en", "fr", "other")),
      Variable("ex", "exists", hasMissing = true),
      Variable("ix", "interaction", interactionFields = Seq("price", "src")))
    val feats = DataModel.featureColumns(vars,
      f => col(s"a.$f"), f => col(s"b.$f"))
    p.select(Seq(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")) ++
      feats.zipWithIndex.map { case (c, i) => round(c, 6).as(s"x$i") }: _*)
  }
}
