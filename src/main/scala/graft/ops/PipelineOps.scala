package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Queries.{h60, toks}

/**
 * Large-scale training-data pipeline operators (beyond the reference's own
 * surface): exact dedup, portable MinHash/LSH dedup, SimHash, n-gram Jaccard,
 * ANN similarity search, text analysis (lang-id, quality, token stats,
 * fingerprinting). Each has a DuckDB oracle in [[OracleSql]] built from the
 * same portable primitives (md5-based 60-bit hash, integer quantization).
 */
object PipelineOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  // -------------------------------------------------------- exact dedup

  /** Exact dedup over a corpus with case-variant copies: hash-groupBy on the
    * normalized text; per group the representative is min(doc_id) — the
    * hash-groupBy analogue of `getCanonicalRep` (canonical.py:56-79). */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), col("text"))
    val variants = base.select((col("doc_id") + 1000000L).as("doc_id"),
      upper(col("text")).as("text"))
    base.unionAll(variants)
      .groupBy(h60(lower(col("text"))).as("key_h"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("sz"))
  }

  // ------------------------------------------------- portable minhash/LSH

  /** Distinct word tokens per doc — the shared first scan of the portable
    * minhash / simhash family (one (doc_id, tok) row per distinct token). */
  private def distinctTokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), explode(array_distinct(toks(col("text")))).as("tok"))

  /** Per-doc 8-function MinHash signature over word tokens, portable across
    * engines (md5-based hashes) — the LSH analogue of the TfidfPredicate
    * family (predicates.py:276-325). Output one row per (doc, hash index).
    * (Kept in the exploded shape: an A/B against the wide-aggregation form
    * measured the 8-column min agg ~2x slower for THIS query — the wide
    * shape pays off only when the band keys are consumed wide, as in
    * [[dedupMinhashLsh]].) */
  def minhashSignatures(s: SparkSession, dir: String): DataFrame =
    distinctTokens(s, dir).select(col("doc_id"), col("tok"),
      explode(sequence(lit(0), lit(7))).as("j"))
      .select(col("doc_id"), col("j"),
        h60(concat_ws("#", col("tok"), col("j").cast("string"))).as("h"))
      .groupBy(col("doc_id"), col("j"))
      .agg(min(col("h")).as("mh"))

  /** One wide aggregation: (doc_id, mh0..mh7) — feeds the LSH band keys. */
  private def minhashWide(tok: DataFrame): DataFrame = {
    val mhs = (0 to 7).map(j =>
      min(h60(concat_ws("#", col("tok"), lit(j.toString)))).as(s"mh$j"))
    tok.groupBy(col("doc_id")).agg(mhs.head, mhs.tail: _*)
  }

  /** Band-key document-frequency cap for the catalog LSH self-join — the
    * canopy stop-word rule (`canopy_index.py:25`) scaled to the oracle-SF
    * corpus; shared verbatim by [[OracleSql.LSH_SQL]]. */
  val LshHotKeyCap = 50L

  /** LSH band candidate pairs: 2 bands x 4 rows over the 8-hash signature;
    * docs sharing a full band become a pair (a < b, distinct) — the
    * CompoundPredicate AND-construction (predicates.py:346-376).
    * Band keys with document frequency > [[LshHotKeyCap]] are dropped via a
    * broadcast anti-join BEFORE the self-join (the same stop-word rule as the
    * flagship [[graft.dedup.Blocking]]), so a boilerplate-heavy key can never
    * make the join near-quadratic. */
  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    // band keys built straight from the wide signature row (r6): the
    // (doc, j)-exploded layout + collect_list re-aggregation shuffled the
    // signature table twice for strings the wide row already determines.
    // Key strings are IDENTICAL: sort_array over the same "j:mh" members.
    val wide = minhashWide(distinctTokens(s, dir))
    def bandKey(band: Int) = concat_ws(",", sort_array(array(
      (4 * band until 4 * band + 4).map(j =>
        concat_ws(":", lit(j.toString), col(s"mh$j").cast("string"))): _*)))
    val bandRows = wide.select(col("doc_id"),
      explode(array(
        struct(lit(0).as("band"), bandKey(0).as("bk")),
        struct(lit(1).as("band"), bandKey(1).as("bk")))).as("s"))
      .select(col("doc_id"), col("s.band").as("band"), col("s.bk").as("bk"))
    val hot = bandRows.groupBy(col("band"), col("bk"))
      .agg(count(lit(1)).as("df")).filter(col("df") > LshHotKeyCap)
      .select(col("band"), col("bk"))
    val kept = bandRows.join(broadcast(hot), Seq("band", "bk"), "left_anti")
    kept.as("a").join(kept.as("b"),
      col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  // ------------------------------------------------------ portable simhash

  /** 16-bit portable SimHash over distinct word tokens. */
  def simhash16(s: SparkSession, dir: String): DataFrame =
    simhash16FromTokens(distinctTokens(s, dir))

  private def simhash16FromTokens(toks: DataFrame): DataFrame = {
    // one aggregation with 16 vote columns (r6, the ngram-jaccard shape):
    // the 16-way bit explode + two groupBys shuffled 16x the rows for sums
    // the wide row expresses directly. Same ±1 integer votes, same result.
    val tok = toks.select(col("doc_id"), h60(col("tok")).as("h"))
    val votes = (0 to 15).map(b =>
      sum(expr(s"((h >> $b) & 1) * 2 - 1")).as(s"v$b"))
    tok.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 to 15).map(b =>
          when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
          .as("simhash"))
  }

  // -------------------------------------------------- n-gram jaccard dedup

  /** SimHash-prefilter Hamming radius for [[dedupNgramJaccard]] (16-bit
    * portable simhash); shared verbatim by the DuckDB oracle. */
  val NgramPrefilterHamming = 12

  /** Word-3-gram Jaccard (integer counts) for LSH candidate pairs —
    * near-dup verification, commonThreeTokens analogue over pairs.
    * Scale shape matches the flagship scoring stage (`dedup/Scoring.scala`):
    * candidate pairs are first prefiltered on the 8-byte simhash16
    * fingerprints (hamming <= [[NgramPrefilterHamming]]); only survivors
    * join the full gram ARRAYS for the exact verify, so the wide-payload
    * join never sees the raw candidate stream. */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val grams = docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(1, greatest(size(t) - 2, 0)), i -> concat(t[i-1], ' ', t[i], ' ', t[i+1]))"
      )).as("g"))
    // ONE aggregation pass computes the 8 minhash values AND the 16 simhash
    // vote counters as wide agg columns — the r3 shared-scan property
    // WITHOUT the r4 persist (whose one-shot materialization cost the
    // driver bench +20%): a single token subtree in the plan, its exchange
    // reused across the self-join sides (ReusedExchange, plan-audited). The
    // fingerprint then RIDES the band-key rows through the LSH self-join,
    // so the Hamming prefilter needs no separate fingerprint joins at all.
    val tok = distinctTokens(s, dir).withColumn("h", h60(col("tok")))
    val mhs = (0 to 7).map(j =>
      min(h60(concat_ws("#", col("tok"), lit(j.toString)))).as(s"mh$j"))
    val votes = (0 to 15).map(b =>
      sum(expr(s"((h >> $b) & 1) * 2 - 1")).as(s"v$b"))
    val agg = tok.groupBy(col("doc_id")).agg(mhs.head, (mhs.tail ++ votes): _*)
    val simhash = (0 to 15).map(b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    def bandKey(band: Int) = concat_ws(",", sort_array(array(
      (4 * band until 4 * band + 4).map(j =>
        concat_ws(":", lit(j.toString), col(s"mh$j").cast("string"))): _*)))
    val bandRows = agg.select(col("doc_id"), simhash.as("fp"),
      explode(array(
        struct(lit(0).as("band"), bandKey(0).as("bk")),
        struct(lit(1).as("band"), bandKey(1).as("bk")))).as("s"))
      .select(col("doc_id"), col("fp"), col("s.band").as("band"), col("s.bk").as("bk"))
    val hot = bandRows.groupBy(col("band"), col("bk"))
      .agg(count(lit(1)).as("df")).filter(col("df") > LshHotKeyCap)
      .select(col("band"), col("bk"))
    val kept = bandRows.join(broadcast(hot), Seq("band", "bk"), "left_anti")
    val pairs = kept.as("a").join(kept.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      .filter(graft.expr.functions.hamming64(col("a.fp"), col("b.fp"))
        <= NgramPrefilterHamming)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    pairs
      .join(grams.select(col("doc_id").as("id_a"), col("g").as("g_a")), Seq("id_a"))
      .join(grams.select(col("doc_id").as("id_b"), col("g").as("g_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("g_a"), col("g_b"))).cast("long").as("inter_cnt"),
        size(array_union(col("g_a"), col("g_b"))).cast("long").as("union_cnt"))
  }

  // --------------------------------------------------------- text analysis

  /** Token/char statistics per document. */
  def textTokenStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      size(toks(col("text"))).cast("long").as("n_tokens"),
      size(array_distinct(toks(col("text")))).cast("long").as("n_distinct"),
      length(col("text")).cast("long").as("len_chars"))

  /** BPE-ish token count: a lookahead-free simplification of the GPT-2
    * pre-tokenizer regex (optional leading space + letter/digit run, or
    * punctuation run, or whitespace run) — the standard cheap estimate of
    * LLM token counts for budget accounting. Kept to regex features RE2 and
    * Java share so the DuckDB oracle runs the IDENTICAL pattern. */
  def textBpeTokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      size(regexp_extract_all(col("text"),
        lit(" ?[a-z0-9']+| ?[^ a-z0-9']+| +"), lit(0))).cast("long").as("n_bpe"),
      length(col("text")).cast("long").as("n_chars_t"))

  /** Quality-score features: integer-safe ratios (x1000). */
  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    val stop = array(lit("the"), lit("a"), lit("and"), lit("of"), lit("to"))
    docs(s, dir).select(col("doc_id"),
      floor(size(array_intersect(array_distinct(t), stop)) * 1000
        / greatest(size(array_distinct(t)), lit(1))).cast("long").as("stop_ratio_q"),
      floor((length(col("text")) - length(translate(col("text"), ".,!?;:", ""))) * 1000
        / greatest(length(col("text")), lit(1))).cast("long").as("punct_ratio_q"),
      floor(length(translate(col("text"), " ", "")) * 1000
        / greatest(size(t), lit(1))).cast("long").as("mean_tok_len_q"))
  }

  /** n-gram-free language-ID heuristic: stopword votes per language,
    * argmax with lexicographic tie-break. */
  def textLangId(s: SparkSession, dir: String): DataFrame = {
    val t = array_distinct(toks(col("text")))
    def votes(words: Seq[String]): Column =
      size(array_intersect(t, array(words.map(lit): _*)))
    val en = votes(Seq("the", "a", "and", "of", "to", "is"))
    val de = votes(Seq("der", "die", "das", "und", "ist"))
    val fr = votes(Seq("le", "la", "et", "les", "est"))
    docs(s, dir).select(col("doc_id"),
      when(en >= de && en >= fr, "en")
        .when(de >= fr, "de")
        .otherwise("fr").as("lang_pred"),
      en.cast("long").as("en_votes"))
  }

  /** Positional rolling fingerprint: sum over tokens of
    * (h60(token) mod 1000003) * position — document fingerprinting with
    * exact integer arithmetic. */
  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("doc_id"), ((h60(col("tok")) % 1000003L) * (col("pos") + 1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("fingerprint"))

  // ------------------------------------------------------ similarity search

  /** Hyperplane component row for bit `i`: a deterministic pseudo-random
    * integer in [-1000, 1000] per dimension, derived from the md5 of
    * "hp#i#d" (d 1-based) — the IDENTICAL derivation the DuckDB oracle
    * evaluates in SQL, so cell assignment stays bit-exact across engines.
    * Computed ONCE on the driver and inlined as literal arrays; round 2
    * evaluated the md5 inside the row expression, costing bits x dims
    * digest calls per indexed row. */
  private def hyperplane(i: Int, dims: Int): Array[Long] =
    Array.tabulate(dims) { d0 =>
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(s"hp#$i#${d0 + 1}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex15 = digest.map("%02x".format(_)).mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex15, 16) % 2001L) - 1000L
    }

  /** 4-bit random-hyperplane LSH cell over a quantized integer embedding
    * column named `q`: sign of the exact integer dot product against each
    * precomputed [[hyperplane]] row (zip_with + aggregate — codegen'd, no
    * per-row hashing). The hyperplane array is sliced to each row's own
    * width, so a row shorter than `dims` dots against the hyperplane prefix
    * (the DuckDB oracle's per-row `generate_series(1, len(q))` semantics)
    * instead of zip_with null-padding the tail into a silently-0 bit. */
  private def lshCell(dims: Int): Column = {
    def bit(i: Int): Column = {
      val h = slice(array(hyperplane(i, dims).map(lit): _*), lit(1), size(col("q")))
      val dot = aggregate(
        zip_with(col("q"), h, (x, w) => x * w), lit(0L), (acc, v) => acc + v)
      when(dot >= 0, lit(1)).otherwise(lit(0))
    }
    (bit(0) * 8 + bit(1) * 4 + bit(2) * 2 + bit(3)).as("cell")
  }

  /** Quantized LSH-cell index over an arbitrary embeddings frame
    * (vec_id, embedding: array<numeric>) → (vec_id, q: array<bigint>,
    * cell: int) — shared by the catalog ANN/dedup ops and the multimodal
    * extract→index→pair flow. The MAX embedding width sizes the inlined
    * hyperplane matrix (driver-side setup, one tiny agg — at production
    * scale the width comes from table metadata/config, not a scan);
    * [[lshCell]] slices per row, so ragged widths stay oracle-exact, and an
    * empty table short-circuits to an empty frame rather than failing the
    * width peek. */
  def indexEmbeddings(embeddings: DataFrame): DataFrame = {
    val base = embeddings.select(col("vec_id"),
      expr("transform(embedding, x -> cast(floor(cast(x as double) * 100000) as bigint))").as("q"))
    val dims = base.agg(max(size(col("q")))).head.get(0)
    if (dims == null) base.withColumn("cell", lit(0)).limit(0)
    else base.withColumn("cell", lshCell(dims.asInstanceOf[Int]))
  }

  private def annIndexed(s: SparkSession, dir: String): DataFrame =
    indexEmbeddings(emb(s, dir))

  /** XOR masks probed per query: all cells within Hamming distance 2 of the
    * query's own 4-bit cell (11 of 16). The probe radius is the recall/cost
    * dial: the sandbox embeddings are uniform-random unit vectors — the
    * adversarial case, nearest-neighbor cos ~ 0.34 so each hyperplane bit
    * agrees only with p ~ 0.61 — and radius 2 is what recall >= 0.7 costs
    * there; clustered real-world embeddings reach it at radius 0-1. */
  private val AnnProbeMasks = Seq(0, 1, 2, 4, 8, 3, 5, 6, 9, 10, 12)

  /** Bucketed candidate pairs (query_id, neighbor_id): each query probes its
    * own LSH cell plus the multiprobe neighborhood [[AnnProbeMasks]];
    * candidates come from an EQUI-join on the cell key — never a cross join
    * — then the exact re-rank tail runs on the bounded candidate set. */
  private def annCandidates(indexed: DataFrame): DataFrame = {
    val probes = indexed.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"),
        explode(array(AnnProbeMasks.map(m => expr(s"cell ^ $m")): _*)).as("cell"))
    probes.join(indexed.select(col("vec_id").as("neighbor_id"), col("cell")), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
  }

  /** LSH-bucketed top-5 nearest neighbors by exact quantized L2 distance for
    * the first 10 query vectors (deterministic across engines: embeddings
    * quantized to ints via floor(x*1e5), cells + distances exact in int64;
    * the DuckDB oracle replicates the identical multiprobe candidate set). */
  def annTopK(s: SparkSession, dir: String): DataFrame = {
    val e = annIndexed(s, dir)
    // dist2 via the codegen'd integer kernel (zip_with-identical null
    // semantics) — the interpreted HOF chain was the per-candidate hot loop
    val dist = annCandidates(e)
      .join(e.select(col("vec_id").as("query_id"), col("q").as("qv")), Seq("query_id"))
      .join(e.select(col("vec_id").as("neighbor_id"), col("q").as("nv")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.expr.functions.dist_sq_i64(col("qv"), col("nv")).as("dist2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("dist2").asc, col("neighbor_id").asc)
    dist.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("dist2"))
  }

  /** LSH-bucketed cosine top-k: same integer-exact multiprobe candidate
    * stage as [[annTopK]], float re-rank tail (float math — no SQL oracle;
    * rows-only check + the integer L2 variant cover it). */
  def annCosine(s: SparkSession, dir: String): DataFrame = {
    val e = annIndexed(s, dir)
    val v = emb(s, dir).select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    val dist = annCandidates(e)
      .join(v.select(col("vec_id").as("query_id"), col("v").as("qv")), Seq("query_id"))
      .join(v.select(col("vec_id").as("neighbor_id"), col("v").as("nv")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (expr("aggregate(zip_with(qv, nv, (x, y) -> x * y), 0D, (acc, v) -> acc + v)") /
          (sqrt(expr("aggregate(qv, 0D, (acc, x) -> acc + x * x)")) *
            sqrt(expr("aggregate(nv, 0D, (acc, x) -> acc + x * x)")))).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    dist.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      // the per-row double sums run in list order in BOTH engines (Spark's
      // aggregate HOF and DuckDB's list_aggregate are sequential), so the
      // cosine is bit-identical cross-engine and the quantized column is
      // oracle-checkable despite the float tail
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        floor(lit(100000.0) * col("cosine")).cast("long").as("cos_q"))
  }

  /** Embedding-cosine near-duplicate pairs (`dedup_embed_cosine`): vectors
    * sharing a hyperplane-LSH cell, kept when the exact quantized cosine is
    * >= 0.15 — the embedding-space analogue of the MinHash band join
    * (candidates from an equi-join on the cell key, never all pairs; at
    * production scale more planes shrink the cells, same shape). Integer
    * dot/norm aggregates + a single double division keep the DuckDB oracle
    * bit-exact, like [[scoreCosineTfidf]]. */
  def dedupEmbedCosine(s: SparkSession, dir: String): DataFrame =
    embedCosinePairs(emb(s, dir), minCosQ = 15000L)

  /** Embedding-cosine near-dup pairs over ANY (vec_id, embedding) frame —
    * the reusable core of [[dedupEmbedCosine]], and the tail of the
    * multimodal flow ([[Multimodal.extract]] features → [[indexEmbeddings]]
    * cells → same-cell pairs). */
  def embedCosinePairs(embeddings: DataFrame, minCosQ: Long): DataFrame = {
    // norms precomputed ONCE per vector (not once per pair side), and the
    // pairwise dot is a codegen'd integer kernel with zip_with-identical
    // null semantics — the interpreted HOF aggregates were the per-pair
    // hot loop (guide order-of-operations step 2: per-task work). Values
    // are bit-identical: same exact long sums, same double ops.
    val e = indexEmbeddings(embeddings)
      .withColumn("n2", graft.expr.functions.norm2_i64(col("q")))
    val a = e.select(col("cell"), col("vec_id").as("id_a"), col("q").as("qa"), col("n2").as("n2a"))
    val b = e.select(col("cell"), col("vec_id").as("id_b"), col("q").as("qb"), col("n2").as("n2b"))
    a.join(b, Seq("cell")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        floor(lit(100000.0) * least(lit(1.0),
          graft.expr.functions.dot_i64(col("qa"), col("qb")).cast("double") /
            (sqrt(col("n2a").cast("double")) * sqrt(col("n2b").cast("double")))))
          .cast("long").as("cos_q"))
      .filter(col("cos_q") >= minCosQ)
  }

  /** Exact brute-force L2 top-k over a supplied corpus — the small-N
    * exactness oracle used by tests to measure the bucketed path's recall
    * (deliberately NOT a catalog query: all-pairs does not scale). */
  def annBruteForce(e: DataFrame, k: Int = 5): DataFrame = {
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qv"))
    val dist = queries.crossJoin(e.select(col("vec_id").as("neighbor_id"), col("q").as("nv")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        expr("aggregate(zip_with(qv, nv, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)")
          .as("dist2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("dist2").asc, col("neighbor_id").asc)
    dist.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("dist2"))
  }


  // ------------------------------------------------- featurizer / classifier

  /** Pairwise feature vector — the `DataModel.distances` featurizer shape
    * (datamodel.py:106-144): per-field comparators, an interaction product
    * and a missing-indicator dummy, integer-exact for portability. */
  def scoreFeatures(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"),
      array_distinct(Queries.toks(col("text"))).as("t"),
      col("text"), col("n_chars"),
      regexp_extract(col("text"), "^([a-z0-9']+[^a-z0-9']+[a-z0-9']+)", 1).as("key"))
      .filter(col("key") =!= "")
    d.as("a").join(d.as("b"),
      col("a.key") === col("b.key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        size(array_intersect(col("a.t"), col("b.t"))).cast("long").as("f_inter"),
        size(array_union(col("a.t"), col("b.t"))).cast("long").as("f_union"),
        when(col("a.text") === col("b.text"), 1L).otherwise(0L).as("f_exact"),
        abs(col("a.n_chars") - col("b.n_chars")).cast("long").as("f_len_diff"))
      .withColumn("f_interaction", col("f_inter") * col("f_exact"))
      .withColumn("f_missing", when(col("f_union") === 0, 1L).otherwise(0L))
      .distinct()
  }

  /** Logistic-regression inference as one Column expression
    * (api.py:1143-1148 classifier -> core.py:78-79 predict_proba):
    * score = sigmoid(w * jaccard + b) with fixed weights, rounded to 6dp. */
  def scoreLrSigmoid(s: SparkSession, dir: String): DataFrame = {
    val f = scoreFeatures(s, dir)
    f.select(col("id_a"), col("id_b"),
      round(lit(1.0) / (lit(1.0) +
        exp(-(lit(8.0) * col("f_inter") / greatest(col("f_union"), lit(1L)) - lit(4.0)))), 6)
        .as("score"))
  }

  /** Featurizer over the non-string comparator zoo — haversine^0.5
    * (latlong.py:16-18), price log-distance (price.py:17-24), categorical +
    * exists dummies (categorical_type.py:12-27, exists.py:25-38) — on
    * deterministic synthetic geo/price/presence fields derived from doc_id
    * (the testdata has no native latlong/price columns; the derivation is
    * integer-exact so the oracle reproduces it bit-for-bit, and the float
    * comparator outputs are rounded to 6dp like score_lr_sigmoid's). */
  def scoreGeoPrice(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"),
      regexp_extract(col("text"), "^([a-z0-9']+[^a-z0-9']+[a-z0-9']+)", 1).as("key"),
      ((col("doc_id") * 7 % 18000) / lit(100.0) - 90).as("lat"),
      ((col("doc_id") * 13 % 36000) / lit(100.0) - 180).as("lon"),
      (col("doc_id") % 1000).cast("double").as("price"),
      when(col("doc_id") % 3 === 0, lit(null).cast("string"))
        .otherwise(col("source")).as("ex"),
      when(col("lang").isin("en", "fr"), col("lang")).otherwise("other").as("cat"))
      .filter(col("key") =!= "")
    val p = d.as("a").join(d.as("b"),
      col("a.key") === col("b.key") && col("a.doc_id") < col("b.doc_id"))
    val catCols = Comparators.categoricalDummies(
      col("a.cat"), col("b.cat"), Seq("en", "fr", "other"))
      .zipWithIndex.map { case (c, i) => c.as(s"cat_d${i + 1}") }
    val exCols = Comparators.existsDummies(col("a.ex"), col("b.ex"))
      .zipWithIndex.map { case (c, i) => c.as(s"ex_d${i + 1}") }
    val priceDist = Comparators.priceLogDiff(col("a.price"), col("b.price"))
    p.select(Seq(
      col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
      round(Comparators.haversineSqrt(col("a.lat"), col("a.lon"),
        col("b.lat"), col("b.lon")), 6).as("geo_dist"),
      coalesce(round(priceDist, 6), lit(-1.0)).as("price_dist"),
      when(priceDist.isNull, 1L).otherwise(0L).as("price_missing")) ++
      catCols ++ exCols: _*)
      .distinct()
  }

  /** Candidate pairs by the first-two-tokens key (the same blocking join
    * [[scoreFeatures]] uses) — shared by the comparator catalog queries. */
  private def keyPairs(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"),
      regexp_extract(col("text"), "^([a-z0-9']+[^a-z0-9']+[a-z0-9']+)", 1).as("key"))
      .filter(col("key") =!= "")
    d.as("a").join(d.as("b"),
      col("a.key") === col("b.key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** CosineTextSimilarity (`variables/string.py:103-109`) as a catalog
    * query: corpus-idf-weighted cosine over word-token counts for the
    * blocked candidate pairs, quantized (floor x1e5) for the integer-exact
    * oracle. Distributed df/idf table + integer dot — see
    * [[Comparators.tfidfWeights]]. */
  def scoreCosineTfidf(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val n = d.count()
    val toked = d.select(col("doc_id"), Queries.toks(col("text")).as("terms"))
    val w = Comparators.tfidfWeights(toked, "doc_id", "terms", n)
    Comparators.cosineTfidf(keyPairs(s, dir), w, "doc_id")
      .select(col("id_a"), col("id_b"),
        floor(lit(100000.0) * col("cosine")).cast("long").as("cosine_q"))
  }

  /**
   * TF-IDF search (`canopy_index.py:51-78` + the stop-word rule at
   * `canopy_index.py:25`): for each query doc, the corpus docs whose
   * idf-weighted cosine is >= 0.8 (the reference's tightest canopy
   * threshold, `variables/string.py:68`). Stop terms — document frequency
   * above max(1000, 5%·N), the reference's own cutoff — are excluded from
   * the index entirely, so they neither generate candidates nor contribute
   * to the cosine, exactly like `initSearch` dropping them from the zope
   * index. Candidates = query-corpus pairs sharing at least one indexed
   * (non-stop) term; verify = exact integer-weighted cosine
   * ([[Comparators.cosineTfidf]]). Semantic bound: idf is the smoothed
   * ln((N+1)/(df+1))+1 of [[Comparators.tfidfWeights]], not zope's exact
   * weighting — thresholds tune accordingly.
   */
  def tfidfSearch(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val n = d.count()
    val cap = math.max(1000L, (0.05 * n).toLong)
    val toked = d.select(col("doc_id"), Queries.toks(col("text")).as("terms"))
    // weights AND the df table come from ONE tf aggregation (exchange-reused
    // sub-plan) — df used to be re-derived with a second full corpus
    // explode+distinct+groupBy per call
    val (w, dfTab) = Comparators.tfidfWeightsWithDf(toked, "doc_id", "terms", n)
    val okTerms = dfTab.filter(col("df") <= cap).select(col("term"))
    val wIdx = w.join(okTerms, Seq("term")) // stop terms never enter the index
    val qTerms = wIdx.filter(col("doc_id") < 50)
      .select(col("term"), col("doc_id").as("id_a"))
    val cand = qTerms
      .join(wIdx.select(col("term"), col("doc_id").as("id_b")), Seq("term"))
      .select(col("id_a"), col("id_b")).distinct()
    Comparators.cosineTfidf(cand, wIdx, "doc_id")
      .select(col("id_a"), col("id_b"),
        floor(lit(100000.0) * col("cosine")).cast("long").as("cosine_q"))
      .filter(col("cosine_q") >= 80000)
  }

  /** CosineSetSimilarity (`variables/set.py:31-36`): same corpus-weighted
    * cosine with 0/1 term presence over the distinct-token set field. */
  def scoreCosineSet(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val n = d.count()
    val toked = d.select(col("doc_id"), Queries.toks(col("text")).as("terms"))
    val w = Comparators.tfidfWeights(toked, "doc_id", "terms", n, setSemantics = true)
    Comparators.cosineTfidf(keyPairs(s, dir), w, "doc_id")
      .select(col("id_a"), col("id_b"),
        floor(lit(100000.0) * col("cosine")).cast("long").as("cosine_q"))
  }

  /**
   * Suffix-pass exact-overlap score (`score_lcs_suffix`): the
   * longest-common-substring length for pairs that share at least one
   * fixed-width character window — completing the suffix-array substring
   * pass (north rule: "longest-common-substring length from the suffix
   * pass"; reference `suffixArray`, `predicate_functions.py:142-147`).
   *
   * Identity making this exact AND distributed: a common substring of
   * length L >= w contains exactly L - w + 1 consecutive aligned w-windows,
   * so LCS = w - 1 + (longest run of shared windows along one diagonal
   * i - j). The run detection is the gaps-and-islands trick (grp = i -
   * row_number within the (pair, diagonal) partition) — partitioned window,
   * map-side-combinable aggs, no per-pair quadratic DP anywhere. Windows are
   * taken from a bounded 32-char prefix so per-doc work is O(1) (the
   * flagship's sampled [[graft.texthash.TextHash.suffixKeys]] plays the
   * candidate role at full scale).
   */
  def scoreLcsSuffix(s: SparkSession, dir: String): DataFrame = {
    val w = 6
    val cap = 50L // stop-word rule (hotKeyAbsCap analogue, Blocking.scala)
    val d = docs(s, dir).select(col("doc_id"), substring(col("text"), 1, 32).as("t"))
      .filter(length(col("t")) >= w)
    val wins = d.select(col("doc_id"), explode(expr(
      s"transform(sequence(1, greatest(length(t) - ${w - 1}, 0)), i -> named_struct('i', i, 'win', substring(t, i, $w)))")).as("s"))
      .select(col("doc_id"), col("s.i").as("i"), col("s.win").as("win"))
    // candidates come from RARE shared windows only: boilerplate windows
    // (df > cap) generate quadratic pairs with no real-overlap evidence —
    // the same broadcast-anti-join stop-word shape as the flagship blocking.
    // The 16x cut measured at sf0.1: 6.49M -> 395k candidate pairs.
    val hot = wins.groupBy(col("win")).agg(count(lit(1)).as("df"))
      .filter(col("df") > cap).select(col("win"))
    val kept = wins.join(broadcast(hot), Seq("win"), "left_anti")
    val cand = kept.as("a").join(kept.as("b"),
        col("a.win") === col("b.win") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // exact verify for the bounded candidate set: every candidate pair
    // shares a w-window, so its longest common substring is >= w and the
    // diagonal-run identity (w - 1 + longest run of shared aligned windows)
    // equals the direct DP longest-common-substring length — pinned by the
    // OpsSpec property test. One codegen'd kernel call per pair over the
    // 32-char prefixes replaces the r5 exploded window equi-joins
    // (cand × ~27 windows/side, two extra shuffles) + the collect_list
    // run-walk aggregation (guide §2.4: remove shuffles outright).
    cand
      .join(d.select(col("doc_id").as("id_a"), col("t").as("t_a")), Seq("id_a"))
      .join(d.select(col("doc_id").as("id_b"), col("t").as("t_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.expr.functions.lcs_len(col("t_a"), col("t_b")).as("lcs_len"))
  }

  /** The flagship's blended score — `greatest(jaccard, lcs_norm)` on the
    * suffix-pass candidate pairs (`dedup/Scoring.scala` scoreLcs blend) —
    * made DuckDB-exact: char-5-gram Jaccard (the shingle role, computed on
    * gram STRINGS so both engines agree) and LCS/min-prefix-length, both
    * integer-quantized with `div` arithmetic (no float sums anywhere). */
  def scoreBlendLcs(s: SparkSession, dir: String): DataFrame = {
    val lcs = scoreLcsSuffix(s, dir)
    val grams = docs(s, dir).select(col("doc_id"), array_distinct(expr(
      "transform(sequence(1, greatest(length(text) - 4, 0)), i -> substring(text, i, 5))"
    )).as("g"))
    val lens = docs(s, dir)
      .select(col("doc_id"), length(substring(col("text"), 1, 32)).cast("long").as("lenp"))
    lcs
      .join(grams.select(col("doc_id").as("id_a"), col("g").as("g_a")), Seq("id_a"))
      .join(grams.select(col("doc_id").as("id_b"), col("g").as("g_b")), Seq("id_b"))
      .join(lens.select(col("doc_id").as("id_a"), col("lenp").as("lenp_a")), Seq("id_a"))
      .join(lens.select(col("doc_id").as("id_b"), col("lenp").as("lenp_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        greatest(
          expr("(100000 * cast(size(array_intersect(g_a, g_b)) as bigint)) div " +
            "greatest(cast(size(g_a) + size(g_b) - size(array_intersect(g_a, g_b)) as bigint), 1)"),
          expr("(100000 * lcs_len) div least(lenp_a, lenp_b)")).as("blend_q"))
  }

  /** Canonical representative per exact-dup group (rows-only: affine-gap
    * centroid is not SQL-expressible) — canonical.py:56-79 over the
    * case-variant corpus of [[dedupExact]]. */
  def canonicalRep(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), col("text"))
    val variants = base.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(upper(substring(col("text"), 1, 12)), substring(col("text"), 13, 100000)).as("text"))
    val all = base.unionAll(variants)
      .withColumn("cluster_id", Queries.h60(lower(col("text"))).cast("string"))
      .withColumn("url", col("doc_id").cast("string"))
    graft.cluster.Canonical.canonicalize(all)
  }

  /** Gazetteer search with `_format_search_results` empty-fill semantics
    * (api.py:1007-1024): even docs are the canonical index, odd docs the
    * queries; each query surfaces with its best blocked match by integer
    * token-Jaccard — or, when blocking finds no candidate, with the
    * (-1, -1) empty-result sentinel row. Portable ints end to end. */
  def gazetteSearchEmptyFill(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"),
      array_distinct(toks(col("text"))).as("t"),
      regexp_extract(col("text"), "^([a-z0-9']+)", 1).as("key"))
    val canonical = d.filter(col("doc_id") % 2 === 0 && col("key") =!= "")
    val queries = d.filter(col("doc_id") % 2 === 1)
    val scored = queries.as("q").join(canonical.as("c"), col("q.key") === col("c.key"))
      .select(col("q.doc_id").as("query_id"), col("c.doc_id").as("match_id"),
        expr("""size(array_intersect(q.t, c.t)) * 1000000L
                div greatest(size(array_union(q.t, c.t)), 1)""").as("score_q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score_q").desc, col("match_id").asc)
    val top = scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1).drop("rnk")
    queries.select(col("doc_id").as("query_id")).distinct()
      .join(top, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("match_id"), lit(-1L)).as("match_id"),
        coalesce(col("score_q"), lit(-1L)).as("score_q"))
  }

  /** `training_data_dedupe` over the documents table (convenience.py:295-351):
    * common key = the first-two-tokens block key, distinct pairs from 500
    * deterministic triangular-decoded samples. */
  def trainingPairs(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"),
      regexp_extract(col("text"), "^([a-z0-9']+[^a-z0-9']+[a-z0-9']+)", 1).as("key"))
    graft.dedup.TrainingData.trainingDataDedupe(d, "doc_id", "key", sampleSize = 500)
  }

  /** `training_data_link` over even/odd splits of the documents table
    * (convenience.py:219-278): common key = first token, 500 deterministic
    * grid-decoded distinct samples. */
  def trainingPairsLink(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"),
      regexp_extract(col("text"), "^([a-z0-9']+)", 1).as("key"))
      .filter(col("key") =!= "")
    graft.dedup.TrainingData.trainingDataLink(
      d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1),
      "doc_id", "key", sampleSize = 500)
  }

  // ---------------------------------------------------------- multimodal

  /** Binary-column metadata pass: treat the payload as an opaque blob with
    * typed metadata (doc text stands in for image bytes in this sandbox). */
  def mmBinaryMeta(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      length(col("text").cast("binary")).cast("long").as("n_bytes"),
      h60(col("text")).as("content_h"))

  /** Frame sampling over opaque media blobs (`mm_frame_sample`): treat the
    * payload as fixed-rate media (1 frame / 4 KiB here; real codecs replace
    * the divisor, not the plan) and emit every `every`-th frame index plus
    * its byte offset — the partition-parallel index arithmetic that drives
    * a frame-extraction stage (the decode itself stays in
    * [[Multimodal.extract]]'s batched stub; this op is the SCHEDULE, which
    * is pure relational work and therefore oracle-checkable). */
  def mmFrameSample(s: SparkSession, dir: String): DataFrame = {
    val bytesPerFrame = 4096L
    val every = 3
    docs(s, dir)
      .select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"))
      // deterministic synthetic payload size: text bytes stand in for media
      // bytes, scaled so docs span multiple frames
      .select(col("doc_id"), (col("n_bytes") * 97L).as("media_bytes"))
      .select(col("doc_id"), col("media_bytes"),
        expr(s"(media_bytes + ${bytesPerFrame - 1L}) div $bytesPerFrame").as("n_frames"))
      // empty/null payloads have no frames (and sequence() rejects an
      // inverted range), so they emit no schedule rows
      .filter(col("n_frames") >= 1L)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1L, lit(every.toLong))).as("frame_idx"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        (col("frame_idx") * bytesPerFrame).as("byte_offset"))
  }
}
