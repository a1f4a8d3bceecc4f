package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Driver-facing query catalog: every implemented operator from SURVEY.md §2
 * as a (SparkSession, sfDir) => DataFrame, with a DuckDB-equivalent oracle in
 * [[OracleSql]]. Column names are aligned between both sides (the driver
 * sorts columns by name before hashing).
 *
 * Portability rules used throughout (Spark semantics == DuckDB semantics):
 *  - tokens via regexp `[a-z0-9']+` group 0 (identical in Java regex / RE2)
 *  - portable 60-bit hash: first 15 hex chars of md5 -> BIGINT
 *  - float outputs avoided: integer counts, fixed-point quantization
 *    (floor(x*1e5)), or DECIMAL
 */
object Queries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  private def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Portable 60-bit hash of a string column (md5 hex prefix -> bigint). */
  def h60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Word tokens `[a-z0-9']+` of a string column. */
  def toks(c: Column): Column = regexp_extract_all(c, lit("[a-z0-9']+"), lit(0))

  // ---------------------------------------------------------------- scans

  /** Plain projection scan with pushed filter (§2.1 in-memory dict scan). */
  def scanDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), col("lang"), col("n_chars"))
      .filter(col("n_chars") > 100)

  // ----------------------------------------------- simple string predicates

  def predFirstToken(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      regexp_extract(col("text"), "^([a-z0-9']+)", 1).as("key"))
      .filter(col("key") =!= "")

  def predFirstTwoTokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      regexp_extract(col("text"), "^([a-z0-9']+[^a-z0-9']+[a-z0-9']+)", 1).as("key"))
      .filter(col("key") =!= "")

  def predTokenField(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), explode(array_distinct(toks(col("text")))).as("key"))

  def predCommonInteger(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      explode(array_distinct(transform(
        regexp_extract_all(col("source"), lit("[0-9]+"), lit(0)),
        x => x.cast("long").cast("string")))).as("key"))

  def predAlphaNumeric(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      explode(array_distinct(regexp_extract_all(col("source"),
        lit("[a-z]*[0-9][a-z0-9]*"), lit(0)))).as("key"))

  def predNearIntegers(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        explode(array_distinct(regexp_extract_all(col("source"), lit("[0-9]+"), lit(0)))).as("i"))
      .select(col("doc_id"),
        explode(array(col("i").cast("long") - 1, col("i").cast("long"),
          col("i").cast("long") + 1)).as("key"))
      .distinct()

  def predHundredInteger(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        explode(array_distinct(regexp_extract_all(col("source"), lit("[0-9]+"), lit(0)))).as("i"))
      .select(col("doc_id"),
        when(col("i").cast("long") < 100, lit("00"))
          .otherwise(concat((col("i").cast("long") / 100).cast("long").cast("string"), lit("00")))
          .as("key"))
      .distinct()

  def predFirstInteger(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      regexp_extract(concat(col("n_chars").cast("string"), lit(" "), col("source")),
        "^([0-9]+)", 1).as("key"))
      .filter(col("key") =!= "")

  def predFingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      concat_ws("", array_sort(split(col("text"), " "))).as("key"))

  def predOneGramFingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      concat_ws("", array_sort(array_distinct(
        regexp_extract_all(translate(col("text"), " ", ""), lit("."), lit(0))))).as("key"))

  // despaced text projected ONCE, outside the per-gram lambda (inside the
  // lambda it would be re-evaluated per element)
  private def despacedGramKeys(s: SparkSession, dir: String, n: Int): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), translate(col("text"), " ", "").as("d"))
      .select(col("doc_id"), explode(array_distinct(expr(
        s"transform(sequence(1, greatest(length(d) - ${n - 1}, 0)), i -> substring(d, i, $n))"
      ))).as("key"))

  def predCommonFourGram(s: SparkSession, dir: String): DataFrame =
    despacedGramKeys(s, dir, 4)

  def predCommonSixGram(s: SparkSession, dir: String): DataFrame =
    despacedGramKeys(s, dir, 6)

  def predTwoGramFingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), translate(col("text"), " ", "").as("d"))
      .select(col("doc_id"),
        concat_ws("", array_sort(array_distinct(expr(
          "transform(sequence(1, greatest(length(d) - 1, 0)), i -> substring(d, i, 2))"
        )))).as("key"))

  def predSameThreeCharStart(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      substring(translate(col("text"), " ", ""), 1, 3).as("key"))

  def predSameSevenCharStart(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      substring(translate(col("text"), " ", ""), 1, 7).as("key"))

  /** suffixArray semantics (all suffixes len>=5) applied to the first 24
    * chars — bounded O(L) keys per doc for the SQL-checkable variant. */
  def predSuffixArray(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), substring(col("text"), 1, 24).as("t"))
      .select(col("doc_id"),
        explode(array_distinct(expr(
          "transform(sequence(1, greatest(length(t) - 4, 0)), i -> substring(t, i, length(t) - i + 1))"
        ))).as("key"))

  def predSortedAcronym(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      concat_ws("", array_sort(transform(split(col("text"), " "),
        t => substring(t, 1, 1)))).as("key"))

  // ------------------------------------------------------------ set preds

  def predCommonTwoTokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"),
        explode(array_distinct(expr(
          "transform(sequence(1, greatest(size(t) - 1, 0)), i -> concat(t[i-1], ' ', t[i]))"
        ))).as("key"))

  def predCommonTwoElements(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), array_sort(array_distinct(toks(col("text")))).as("t"))
      .select(col("doc_id"),
        explode(array_distinct(expr(
          "transform(sequence(1, greatest(size(t) - 1, 0)), i -> concat(t[i-1], ' ', t[i]))"
        ))).as("key"))

  def predCommonThreeTokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(expr(
          "transform(sequence(1, greatest(size(t) - 2, 0)), i -> concat(t[i-1], ' ', t[i], ' ', t[i+1]))"
        ))).as("key"))

  def predCommonThreeElements(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), array_sort(array_distinct(toks(col("text")))).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(expr(
          "transform(sequence(1, greatest(size(t) - 2, 0)), i -> concat(t[i-1], ' ', t[i], ' ', t[i+1]))"
        ))).as("key"))

  /** wholeFieldPredicate over the text field (kernel:
    * [[graft.texthash.Predicates.wholeFieldPredicate]]); empty fields emit
    * no key, matching `predicate_functions.py:19-21`. */
  def predWholeField(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), col("text").as("key"))
      .filter(col("key").isNotNull && col("key") =!= "")

  /** wholeSetPredicate: canonical "(a, b, c)" repr of the sorted-distinct
    * token set (kernel: [[graft.texthash.Predicates.wholeSetPredicate]]). */
  def predWholeSet(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      concat(lit("("),
        concat_ws(", ", array_sort(array_distinct(toks(col("text"))))),
        lit(")")).as("key"))

  def predFirstLastSetElement(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      array_min(toks(col("text"))).as("first_el"),
      array_max(toks(col("text"))).as("last_el"))

  def predMagnitudeOfCardinality(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      round(log10(size(array_distinct(toks(col("text")))).cast("double")))
        .cast("long").cast("string").as("key"))

  def predExists(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      when(col("text").isNotNull && length(col("text")) > 0, "1").otherwise("0").as("key"))

  // ----------------------------------------------------- numeric/geo preds

  def predOrderOfMagnitude(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders").select(col("o_orderkey"),
      when(col("o_totalprice") > 0,
        round(log10(col("o_totalprice"))).cast("long")).as("key"))

  def predLatLongGrid(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events").select(col("event_id"),
      (floor(pmod(col("value"), lit(180.0)) * 10) / 10 - 90.0).cast("decimal(10,1)").as("lat_g"),
      (floor(pmod(col("value") * 2, lit(360.0)) * 10) / 10 - 180.0).cast("decimal(10,1)").as("lon_g"))

  // --------------------------------------------------- pair generation

  /** Dedupe self-join on a block key (first two tokens), each unordered pair
    * once, a < b (api.py:282-294). */
  def pairsSelfJoin(s: SparkSession, dir: String): DataFrame = {
    val keyed = docs(s, dir).select(col("doc_id"),
      regexp_extract(col("text"), "^([a-z0-9']+[^a-z0-9']+[a-z0-9']+)", 1).as("key"))
      .filter(col("key") =!= "")
    keyed.as("a").join(keyed.as("b"),
      col("a.key") === col("b.key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** RecordLink two-table join (api.py:448-459): even docs vs odd docs on
    * first-token key. */
  def pairsRecordLink(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"),
      regexp_extract(col("text"), "^([a-z0-9']+)", 1).as("key"))
    val left = d.filter(col("doc_id") % 2 === 0)
    val right = d.filter(col("doc_id") % 2 === 1)
    left.as("a").join(right.as("b"), col("a.key") === col("b.key"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  // --------------------------------------------------------- scoring

  /** Exact token-set Jaccard for blocked pairs, as exact integer counts
    * (datamodel.py:106-124 featurizer -> CosineSet analogue). */
  def scoreJaccardTokens(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"),
      array_distinct(toks(col("text"))).as("t"),
      regexp_extract(col("text"), "^([a-z0-9']+[^a-z0-9']+[a-z0-9']+)", 1).as("key"))
      .filter(col("key") =!= "")
    d.as("a").join(d.as("b"),
      col("a.key") === col("b.key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        size(array_intersect(col("a.t"), col("b.t"))).cast("long").as("inter_cnt"),
        size(array_union(col("a.t"), col("b.t"))).cast("long").as("union_cnt"))
      .distinct()
  }

  // ------------------------------------------------------- clustering ops

  /** Distributed connected components vs a recursive-CTE oracle: edges are
    * (doc_id, 2*doc_id) forests (clustering.py:97-170 semantics). */
  def clusterConnectedComponents(s: SparkSession, dir: String): DataFrame = {
    val ids = docs(s, dir).select(col("doc_id"))
    val maxId = ids.agg(max("doc_id")).head().getLong(0)
    // zero-pad ids so the CC's lexicographic min label == numeric min
    val edges = ids.filter(col("doc_id") > 0 && col("doc_id") * 2 <= maxId)
      .select(lpad(col("doc_id").cast("string"), 12, "0").as("a"),
        lpad((col("doc_id") * 2).cast("string"), 12, "0").as("b"))
    graft.dedup.ConnectedComponents.run(edges)
      .select(col("id").cast("long").as("node"), col("comp").cast("long").as("comp"))
  }

  /** Gazetteer top-n matching (clustering.py:299-311): top 2 by score per
    * left id, score = shared-token count (integer). */
  def clusterGazetteTopN(s: SparkSession, dir: String): DataFrame = {
    val scored = scoreJaccardTokens(s, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a")).orderBy(col("inter_cnt").desc, col("id_b").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 2)
      .select(col("id_a"), col("id_b"), col("inter_cnt"), col("rnk"))
  }

  // --------------------------------------------- relational rubric (§2.8)

  def q1Agg(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem").groupBy(col("l_returnflag"))
      .agg(sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_c"),
        count(lit(1)).as("cnt"))

  def qJoinAgg(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders").join(tbl(s, dir, "customer"),
      col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("revenue_c"),
        count(lit(1)).as("n_orders"))

  def qWindowTopN(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    tbl(s, dir, "orders").withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rnk"))
  }

  def qAntiJoin(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "customer").join(tbl(s, dir, "orders"),
      col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"))

  def qSemiJoin(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "customer").join(tbl(s, dir, "orders"),
      col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"))

  /** EXCEPT / INTERSECT / UNION in one result (one labeled row per nation key
    * and op), so the oracle hash is non-vacuous at every SF — at sf >= 0.01
    * customers cover all supplier nations and a bare EXCEPT is empty. */
  def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val c = tbl(s, dir, "customer").select(col("c_nationkey").as("nk")).distinct()
    val sup = tbl(s, dir, "supplier").select(col("s_nationkey").as("nk")).distinct()
    c.exceptAll(sup).select(lit("except").as("op"), col("nk"))
      .unionAll(c.intersect(sup).select(lit("intersect").as("op"), col("nk")))
      .unionAll(c.union(sup).distinct().select(lit("union").as("op"), col("nk")))
  }


  def predHundredIntegersOdd(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        explode(array_distinct(regexp_extract_all(col("source"), lit("[0-9]+"), lit(0)))).as("i"))
      .select(col("doc_id"),
        when(col("i").cast("long") < 100,
          concat(lit("0"), (col("i").cast("long") % 2).cast("string")))
          .otherwise(concat((col("i").cast("long") / 100).cast("long").cast("string"),
            lit("0"), (col("i").cast("long") % 2).cast("string")))
          .as("key"))
      .distinct()

  def predSameFiveCharStart(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      substring(translate(col("text"), " ", ""), 1, 5).as("key"))

  /** roundTo1 semantics (one significant figure); half-up tie rule on both
    * engines (the reference's Python banker's rounding differs only at exact
    * .5 boundaries — semantic parity is unit-tested in Predicates.roundTo1). */
  def predRoundTo1(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders").select(col("o_orderkey"),
      (floor(col("o_totalprice") / pow(lit(10.0), floor(log10(col("o_totalprice")))) + 0.5)
        * pow(lit(10.0), floor(log10(col("o_totalprice"))))).cast("long").as("key"))

  def qCountDistinct(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders").join(tbl(s, dir, "customer"),
      col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"))

  /** Tumbling-hour aggregation over the event stream table (epoch seconds
    * for engine-portable output). */
  def qEventsWindow(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events")
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_c"))

  def qJsonExtract(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events")
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("k_sum"), count(lit(1)).as("n"))

  /** CSV source + reference pre_process normalization (common.py:12-29):
    * writes a deterministic CSV once, reads it back through spark.read.csv
    * and normalizes. Rows-only check (no CSV registered in the oracle). */
  /** Double Metaphone block keys (predicate_functions.py:154-165): whole-field
    * codes tagged `w:` and per-token codes tagged `t:`. Kernel is the pure
    * Scala [[graft.texthash.Metaphone]] (golden-tested); rows-only check —
    * DuckDB has no metaphone function. Typed flatMap is acceptable here
    * (predicate emission is a per-row scalar kernel; the flagship pipeline's
    * hot path keeps its own codegen'd key expressions). */
  def predDoubleMetaphone(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, t) =>
        val whole = graft.texthash.Predicates.doubleMetaphone(t).map("w:" + _)
        val toks = graft.texthash.Predicates.metaphoneToken(t).map("t:" + _)
        (whole ++ toks).iterator.map(k => (id, k))
      }
      .toDF("doc_id", "key")
  }

  /** Per-token Double Metaphone keys alone (`metaphoneToken`,
    * predicate_functions.py:158-165) — the whole-field variant has its own
    * entry in [[predDoubleMetaphone]]. Rows-only + kernel goldens. */
  def predMetaphoneToken(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, t) =>
        graft.texthash.Predicates.metaphoneToken(t).iterator.map(k => (id, k))
      }
      .toDF("doc_id", "key")
  }

  /** Normalized affine-gap string distance (`affinegap`'s
    * `normalizedAffineGapDistance`, the String-variable comparator,
    * `variables/string.py:78`) over the first-two-tokens blocked pairs —
    * the per-pair DP kernel [[graft.texthash.AffineGap]] (golden-tested vs
    * the reference fixtures) run distributed on 32-char prefixes (bounded
    * per-pair work; the full-string variant is the canonicalization path,
    * [[graft.cluster.Canonical]]). Rows-only: a 5-parameter affine-gap DP
    * has no SQL analogue. Output quantized x1e5 for stable row dumps. */
  def scoreAffineGap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"),
      substring(col("text"), 1, 32).as("t"),
      regexp_extract(col("text"), "^([a-z0-9']+[^a-z0-9']+[a-z0-9']+)", 1).as("key"))
      .filter(col("key") =!= "")
    d.as("a").join(d.as("b"),
        col("a.key") === col("b.key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.t").as("t_a"), col("b.t").as("t_b"))
      .distinct()
      .as[(Long, Long, String, String)]
      .map { case (a, b, ta, tb) =>
        (a, b, math.floor(
          graft.texthash.AffineGap.normalizedAffineGapDistance(ta, tb) * 100000).toLong)
      }
      .toDF("id_a", "id_b", "affine_q")
  }

  def scanCsvPreprocess(s: SparkSession, dir: String): DataFrame = {
    // fixed fixture path: the 200 rows are dir-independent, and a stable
    // location lets the DuckDB oracle read_csv the very same file
    val csvPath = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_csv_fixture.csv").getAbsolutePath
    val f = new java.io.File(csvPath)
    if (!f.exists()) {
      val rows = (0 until 200).map { i =>
        val st = graft.texthash.TextHash.mix64(42L + i)
        s"$i,\"  Name   ${(st % 97).abs} \",'City ${(st % 13).abs}'"
      }
      val w = new java.io.PrintWriter(f)
      w.println("id,name,city"); rows.foreach(w.println); w.close()
    }
    s.read.option("header", "true").csv(csvPath)
      .select(col("id").cast("long").as("id"),
        graft.expr.functions.normalize_text(col("name")).as("name"),
        graft.expr.functions.normalize_text(col("city")).as("city"))
  }

  def qSortLimit(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .select(col("l_orderkey"), col("l_linenumber"))
      .limit(50)
}
