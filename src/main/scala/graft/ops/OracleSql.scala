package graft.ops

/**
 * DuckDB-dialect oracles, one per entry in [[graft.SparkEntry.queries]].
 * Each is semantically identical to the Spark query (same column names,
 * same value types; integer/decimal outputs wherever floats would risk
 * cross-engine drift).
 */
object OracleSql {

  /** word tokens `[a-z0-9']+` (single quote doubled for SQL literals) */
  private val TOKS = "regexp_extract_all(text, '[a-z0-9'']+')"
  /** portable 60-bit hash */
  private def H60(x: String) = s"CAST('0x' || substr(md5($x), 1, 15) AS BIGINT)"

  private val TWO_TOKEN_KEY =
    "regexp_extract(text, '^([a-z0-9'']+[^a-z0-9'']+[a-z0-9'']+)', 1)"

  /** TF-IDF cosine over blocked pairs; mirrors Comparators.tfidfWeights /
    * cosineTfidf exactly (same idf quantization, same float op order). */
  private def cosineSql(setSemantics: Boolean): String = {
    val tf =
      if (setSemantics)
        s"""SELECT DISTINCT doc_id, term, 1 AS tf FROM
              (SELECT doc_id, unnest($TOKS) AS term FROM documents)"""
      else
        s"""SELECT doc_id, term, count(*) AS tf FROM
              (SELECT doc_id, unnest($TOKS) AS term FROM documents)
            GROUP BY doc_id, term"""
    s"""
      WITH n AS (SELECT count(*) AS n FROM documents),
      tf AS ($tf),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      w AS (SELECT doc_id, tf.term AS term,
              tf.tf * CAST(floor(1000.0 * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0)) AS BIGINT) AS w
            FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
      nrm AS (SELECT doc_id, sum(w * w) AS norm2 FROM w GROUP BY doc_id),
      k AS (SELECT doc_id, $TWO_TOKEN_KEY AS key FROM documents),
      p AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM k a JOIN k b ON a.key = b.key AND a.doc_id < b.doc_id
            WHERE a.key <> ''),
      dot AS (SELECT p.id_a, p.id_b, sum(wa.w * wb.w) AS dot
              FROM p JOIN w wa ON wa.doc_id = p.id_a
                     JOIN w wb ON wb.doc_id = p.id_b AND wb.term = wa.term
              GROUP BY p.id_a, p.id_b)
      SELECT p.id_a, p.id_b,
        CAST(floor(100000.0 * least(1.0, COALESCE(dot.dot, 0) /
          (sqrt(CAST(na.norm2 AS DOUBLE)) * sqrt(CAST(nb.norm2 AS DOUBLE))))) AS BIGINT) AS cosine_q
      FROM p LEFT JOIN dot ON p.id_a = dot.id_a AND p.id_b = dot.id_b
      JOIN nrm na ON na.doc_id = p.id_a
      JOIN nrm nb ON nb.doc_id = p.id_b"""
  }

  private val SCORE_JACCARD_CTE = s"""
    WITH d AS (
      SELECT doc_id, list_distinct($TOKS) AS t, $TWO_TOKEN_KEY AS key FROM documents)
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
      CAST(len(list_intersect(a.t, b.t)) AS BIGINT) AS inter_cnt,
      CAST(len(a.t) + len(b.t) - len(list_intersect(a.t, b.t)) AS BIGINT) AS union_cnt
    FROM d a JOIN d b USING (key)
    WHERE a.doc_id < b.doc_id AND a.key <> ''"""

  private val MINHASH_SIG_CTE = s"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(list_distinct($TOKS)) AS tok FROM documents),
    tj AS (SELECT doc_id, tok, unnest(generate_series(0, 7)) AS j FROM tok)
    SELECT doc_id, j,
      min(CAST('0x' || substr(md5(tok || '#' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT)) AS mh
    FROM tj GROUP BY doc_id, j"""

  // band keys with document frequency > 50 (PipelineOps.LshHotKeyCap) are
  // dropped before the self-join — the canopy stop-word rule
  private val LSH_SQL = s"""
    WITH sig AS ($MINHASH_SIG_CTE),
    bk AS (
      SELECT doc_id, j // 4 AS band,
        string_agg(CAST(j AS VARCHAR) || ':' || CAST(mh AS VARCHAR), ',' ORDER BY j) AS bkey
      FROM sig GROUP BY doc_id, j // 4),
    kept AS (
      SELECT bk.* FROM bk
      JOIN (SELECT band, bkey FROM bk GROUP BY band, bkey HAVING count(*) <= 50) ok
      USING (band, bkey))
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM kept a JOIN kept b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id"""

  private val SIMHASH16_SQL = s"""
    WITH tok16 AS (SELECT DISTINCT doc_id, unnest(list_distinct($TOKS)) AS tok FROM documents),
    h16 AS (SELECT doc_id, ${H60("tok")} AS h FROM tok16),
    bits16 AS (SELECT doc_id, b, ((h >> b) & 1) * 2 - 1 AS v
             FROM h16, (SELECT unnest(generate_series(0, 15)) AS b)),
    votes16 AS (SELECT doc_id, b, sum(v) AS vote FROM bits16 GROUP BY doc_id, b)
    SELECT doc_id, CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
    FROM votes16 GROUP BY doc_id"""

  val sql: Map[String, String] = Map(
    // ------------------------------------------------------------- scans
    "scan_docs" ->
      "SELECT doc_id, lang, n_chars FROM documents WHERE n_chars > 100",

    // the CSV fixture is written by the Spark query to a FIXED tmp path; the
    // oracle reads the same file and mirrors the normalize_text chain
    // (collapse 2+ spaces, \n -> space, trim, strip '"', strip "'", lower)
    "scan_csv_preprocess" -> {
      def norm(x: String) =
        s"""lower(trim(trim(trim(replace(regexp_replace($x, '  +', ' ', 'g'), chr(10), ' ')), '"'), ''''))"""
      s"""
      SELECT CAST(id AS BIGINT) AS id, ${norm("name")} AS name, ${norm("city")} AS city
      FROM read_csv('${System.getProperty("java.io.tmpdir")}/graft_csv_fixture.csv',
                    header=true, quote='"', all_varchar=true)"""
    },

    // -------------------------------------------------------- predicates
    "pred_first_token" -> s"""
      SELECT doc_id, regexp_extract(text, '^([a-z0-9'']+)', 1) AS key
      FROM documents WHERE regexp_extract(text, '^([a-z0-9'']+)', 1) <> ''""",

    "pred_first_two_tokens" -> s"""
      SELECT doc_id, $TWO_TOKEN_KEY AS key
      FROM documents WHERE $TWO_TOKEN_KEY <> ''""",

    "pred_token_field" -> s"""
      SELECT doc_id, unnest(list_distinct($TOKS)) AS key FROM documents""",

    "pred_common_integer" -> """
      SELECT DISTINCT doc_id, CAST(CAST(i AS BIGINT) AS VARCHAR) AS key
      FROM (SELECT doc_id, unnest(list_distinct(regexp_extract_all(source, '[0-9]+'))) AS i
            FROM documents)""",

    "pred_alpha_numeric" -> """
      SELECT doc_id, unnest(list_distinct(regexp_extract_all(source, '[a-z]*[0-9][a-z0-9]*'))) AS key
      FROM documents""",

    "pred_near_integers" -> """
      SELECT DISTINCT doc_id, CAST(i AS BIGINT) + d AS key
      FROM (SELECT doc_id, unnest(list_distinct(regexp_extract_all(source, '[0-9]+'))) AS i
            FROM documents), (SELECT unnest([-1, 0, 1]) AS d)""",

    "pred_hundred_integer" -> """
      SELECT DISTINCT doc_id,
        CASE WHEN CAST(i AS BIGINT) < 100 THEN '00'
             ELSE CAST(CAST(i AS BIGINT) // 100 AS VARCHAR) || '00' END AS key
      FROM (SELECT doc_id, unnest(list_distinct(regexp_extract_all(source, '[0-9]+'))) AS i
            FROM documents)""",

    "pred_first_integer" -> """
      SELECT doc_id, regexp_extract(CAST(n_chars AS VARCHAR) || ' ' || source, '^([0-9]+)', 1) AS key
      FROM documents
      WHERE regexp_extract(CAST(n_chars AS VARCHAR) || ' ' || source, '^([0-9]+)', 1) <> ''""",

    "pred_fingerprint" -> """
      SELECT doc_id, array_to_string(list_sort(string_split(text, ' ')), '') AS key
      FROM documents""",

    "pred_one_gram_fingerprint" -> """
      SELECT doc_id,
        array_to_string(list_sort(list_distinct(regexp_extract_all(replace(text, ' ', ''), '.'))), '') AS key
      FROM documents""",

    "pred_two_gram_fingerprint" -> """
      SELECT doc_id, array_to_string(list_sort(list_distinct(
        list_transform(generate_series(1, greatest(len(replace(text,' ','')) - 1, 0)),
                       i -> substr(replace(text,' ',''), i, 2)))), '') AS key
      FROM documents""",

    "pred_common_four_gram" -> """
      SELECT doc_id, unnest(list_distinct(
        list_transform(generate_series(1, greatest(len(replace(text,' ','')) - 3, 0)),
                       i -> substr(replace(text,' ',''), i, 4)))) AS key
      FROM documents""",

    "pred_common_six_gram" -> """
      SELECT doc_id, unnest(list_distinct(
        list_transform(generate_series(1, greatest(len(replace(text,' ','')) - 5, 0)),
                       i -> substr(replace(text,' ',''), i, 6)))) AS key
      FROM documents""",

    "pred_same_three_char_start" -> """
      SELECT doc_id, substr(replace(text, ' ', ''), 1, 3) AS key FROM documents""",

    "pred_same_seven_char_start" -> """
      SELECT doc_id, substr(replace(text, ' ', ''), 1, 7) AS key FROM documents""",

    "pred_suffix_array" -> """
      SELECT doc_id, unnest(list_distinct(
        list_transform(generate_series(1, greatest(len(t) - 4, 0)),
                       i -> substr(t, i, len(t) - i + 1)))) AS key
      FROM (SELECT doc_id, substr(text, 1, 24) AS t FROM documents)""",

    "pred_sorted_acronym" -> """
      SELECT doc_id, array_to_string(list_sort(
        list_transform(string_split(text, ' '), t -> substr(t, 1, 1))), '') AS key
      FROM documents""",

    "pred_common_two_tokens" -> """
      SELECT doc_id, unnest(list_distinct(
        list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                       i -> t[i] || ' ' || t[i+1]))) AS key
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)""",

    "pred_common_two_elements" -> s"""
      SELECT doc_id, unnest(list_distinct(
        list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                       i -> t[i] || ' ' || t[i+1]))) AS key
      FROM (SELECT doc_id, list_sort(list_distinct($TOKS)) AS t FROM documents)""",

    "pred_common_three_tokens" -> """
      SELECT doc_id, unnest(list_distinct(
        list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS key
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      WHERE len(t) >= 3""",

    "pred_common_three_elements" -> s"""
      SELECT doc_id, unnest(list_distinct(
        list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS key
      FROM (SELECT doc_id, list_sort(list_distinct($TOKS)) AS t FROM documents)
      WHERE len(t) >= 3""",

    "pred_whole_field" -> """
      SELECT doc_id, text AS key FROM documents
      WHERE text IS NOT NULL AND text <> ''""",

    "pred_whole_set" -> s"""
      SELECT doc_id,
        '(' || array_to_string(list_sort(list_distinct($TOKS)), ', ') || ')' AS key
      FROM documents""",

    "pred_first_last_set_element" -> s"""
      SELECT doc_id, list_aggregate($TOKS, 'min') AS first_el,
             list_aggregate($TOKS, 'max') AS last_el
      FROM documents""",

    "pred_magnitude_cardinality" -> s"""
      SELECT doc_id, CAST(CAST(round(log10(CAST(len(list_distinct($TOKS)) AS DOUBLE))) AS BIGINT) AS VARCHAR) AS key
      FROM documents""",

    "pred_exists" -> """
      SELECT doc_id, CASE WHEN text IS NOT NULL AND len(text) > 0 THEN '1' ELSE '0' END AS key
      FROM documents""",

    "pred_order_of_magnitude" -> """
      SELECT o_orderkey, CASE WHEN o_totalprice > 0
        THEN CAST(round(log10(o_totalprice)) AS BIGINT) END AS key
      FROM orders""",

    // --------------------------------------------------- pair generation
    "pairs_self_join" -> s"""
      WITH k AS (SELECT doc_id, $TWO_TOKEN_KEY AS key FROM documents)
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM k a JOIN k b USING (key)
      WHERE a.doc_id < b.doc_id AND a.key <> ''""",

    "pairs_record_link" -> """
      WITH k AS (SELECT doc_id, regexp_extract(text, '^([a-z0-9'']+)', 1) AS key FROM documents)
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM k a JOIN k b USING (key)
      WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1""",

    // ----------------------------------------------------------- scoring
    "score_jaccard_tokens" -> SCORE_JACCARD_CTE,

    // -------------------------------------------------------- clustering
    "cluster_cc" -> """
      WITH RECURSIVE
      edges AS (SELECT doc_id AS a, doc_id * 2 AS b FROM documents
                WHERE doc_id > 0 AND doc_id * 2 <= (SELECT max(doc_id) FROM documents)),
      sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
      reach(n, r) AS (
        SELECT a, b FROM sym
        UNION SELECT a, a FROM sym
        UNION SELECT reach.n, sym.b FROM reach JOIN sym ON reach.r = sym.a)
      SELECT n AS node, min(r) AS comp FROM reach GROUP BY n""",

    "cluster_gazette_topn" -> s"""
      WITH scored AS ($SCORE_JACCARD_CTE)
      SELECT id_a, id_b, inter_cnt, rnk FROM (
        SELECT *, row_number() OVER (PARTITION BY id_a ORDER BY inter_cnt DESC, id_b ASC) AS rnk
        FROM scored) WHERE rnk <= 2""",

    // --------------------------------------------- relational rubric ops
    "q1_agg" -> """
      SELECT l_returnflag, CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
             count(*) AS cnt
      FROM lineitem GROUP BY l_returnflag""",

    "q_join_agg" -> """
      SELECT c_mktsegment, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
             count(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment""",

    "q_window_topn" -> """
      SELECT o_custkey, o_orderkey, rnk FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        FROM orders) WHERE rnk <= 3""",

    "q_anti_join" -> """
      SELECT c_custkey FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",

    "q_semi_join" -> """
      SELECT c_custkey FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",

    "q_set_ops" -> """
      WITH c AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
           s AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
      SELECT 'except' AS op, nk FROM (SELECT nk FROM c EXCEPT SELECT nk FROM s)
      UNION ALL
      SELECT 'intersect' AS op, nk FROM (SELECT nk FROM c INTERSECT SELECT nk FROM s)
      UNION ALL
      SELECT 'union' AS op, nk FROM (SELECT nk FROM c UNION SELECT nk FROM s)""",

    "q_sort_limit" -> """
      SELECT l_orderkey, l_linenumber FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC LIMIT 50""",

    // ------------------------------------------- training-pipeline extras
    "dedup_exact" -> s"""
      WITH all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 1000000, upper(text) FROM documents)
      SELECT ${H60("lower(text)")} AS key_h, min(doc_id) AS rep_id, count(*) AS sz
      FROM all_docs GROUP BY 1""",

    "dedup_minhash_sig" -> MINHASH_SIG_CTE,

    "dedup_minhash_lsh" -> LSH_SQL,

    "dedup_simhash16" -> s"""
      WITH tok AS (SELECT DISTINCT doc_id, unnest(list_distinct($TOKS)) AS tok FROM documents),
      h AS (SELECT doc_id, ${H60("tok")} AS h FROM tok),
      bits AS (SELECT doc_id, b, ((h >> b) & 1) * 2 - 1 AS v
               FROM h, (SELECT unnest(generate_series(0, 15)) AS b)),
      votes AS (SELECT doc_id, b, sum(v) AS vote FROM bits GROUP BY doc_id, b)
      SELECT doc_id, CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY doc_id""",

    // simhash16 prefilter (hamming <= 12, PipelineOps.NgramPrefilterHamming)
    // before the full-gram-array verify join — same shape as the flagship
    "dedup_ngram_jaccard" -> s"""
      WITH grams AS (
        SELECT doc_id, list_distinct(
          list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      lsh_pairs AS ($LSH_SQL),
      fp AS ($SIMHASH16_SQL),
      pairs AS (
        SELECT p.id_a, p.id_b FROM lsh_pairs p
        JOIN fp fa ON p.id_a = fa.doc_id JOIN fp fb ON p.id_b = fb.doc_id
        WHERE bit_count(xor(fa.simhash, fb.simhash)) <= 12)
      SELECT p.id_a, p.id_b,
        CAST(len(list_intersect(a.g, b.g)) AS BIGINT) AS inter_cnt,
        CAST(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS BIGINT) AS union_cnt
      FROM pairs p JOIN grams a ON p.id_a = a.doc_id JOIN grams b ON p.id_b = b.doc_id""",

    "text_token_stats" -> s"""
      SELECT doc_id, CAST(len($TOKS) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct($TOKS)) AS BIGINT) AS n_distinct,
             CAST(len(text) AS BIGINT) AS len_chars
      FROM documents""",

    "text_bpe_tokens" -> """
      SELECT doc_id,
        CAST(len(regexp_extract_all(text, ' ?[a-z0-9'']+| ?[^ a-z0-9'']+| +')) AS BIGINT) AS n_bpe,
        CAST(len(text) AS BIGINT) AS n_chars_t
      FROM documents""",

    "text_quality" -> s"""
      SELECT doc_id,
        CAST(floor(len(list_intersect(list_distinct($TOKS), ['the','a','and','of','to'])) * 1000.0
          / greatest(len(list_distinct($TOKS)), 1)) AS BIGINT) AS stop_ratio_q,
        CAST(floor((len(text) - len(translate(text, '.,!?;:', ''))) * 1000.0
          / greatest(len(text), 1)) AS BIGINT) AS punct_ratio_q,
        CAST(floor(len(replace(text, ' ', '')) * 1000.0
          / greatest(len($TOKS), 1)) AS BIGINT) AS mean_tok_len_q
      FROM documents""",

    "text_langid" -> s"""
      WITH v AS (SELECT doc_id,
        len(list_intersect(list_distinct($TOKS), ['the','a','and','of','to','is'])) AS en,
        len(list_intersect(list_distinct($TOKS), ['der','die','das','und','ist'])) AS de,
        len(list_intersect(list_distinct($TOKS), ['le','la','et','les','est'])) AS fr
        FROM documents)
      SELECT doc_id,
        CASE WHEN en >= de AND en >= fr THEN 'en' WHEN de >= fr THEN 'de' ELSE 'fr' END AS lang_pred,
        CAST(en AS BIGINT) AS en_votes
      FROM v""",

    "text_fingerprint" -> s"""
      WITH pt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                         unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
                  FROM documents)
      SELECT doc_id, CAST(sum((${H60("tok")} % 1000003) * pos) AS BIGINT) AS fingerprint
      FROM pt GROUP BY doc_id""",

    // 4-bit random-hyperplane LSH cells (integer-exact) + Hamming-1
    // multiprobe + exact L2 re-rank — replicates PipelineOps.annTopK's
    // bucketed candidate set bit-for-bit
    "ann_l2_topk" -> {
      def bit(i: Int, weight: Int) = s"""
        (CASE WHEN list_aggregate(list_transform(generate_series(1, len(q)),
           d -> q[d] * ((CAST('0x' || substr(md5('hp#$i#' || CAST(d AS VARCHAR)), 1, 15) AS BIGINT) % 2001) - 1000)),
           'sum') >= 0 THEN $weight ELSE 0 END)"""
      s"""
      WITH e AS (SELECT vec_id,
          list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100000) AS BIGINT)) AS q
        FROM embeddings),
      c AS (SELECT vec_id, q,
          ${bit(0, 8)} + ${bit(1, 4)} + ${bit(2, 2)} + ${bit(3, 1)} AS cell
        FROM e),
      probes AS (SELECT vec_id AS query_id,
          unnest([cell, xor(cell, 1), xor(cell, 2), xor(cell, 4), xor(cell, 8),
                  xor(cell, 3), xor(cell, 5), xor(cell, 6), xor(cell, 9),
                  xor(cell, 10), xor(cell, 12)]) AS cell
        FROM c WHERE vec_id < 10),
      cand AS (SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
        FROM probes p JOIN c ON p.cell = c.cell WHERE c.vec_id <> p.query_id),
      d AS (SELECT cand.query_id, cand.neighbor_id,
          list_aggregate(list_transform(generate_series(1, len(a.q)),
            i -> (a.q[i] - b.q[i]) * (a.q[i] - b.q[i])), 'sum')::BIGINT AS dist2
        FROM cand JOIN c a ON cand.query_id = a.vec_id JOIN c b ON cand.neighbor_id = b.vec_id)
      SELECT query_id, neighbor_id, rnk, dist2 FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist2 ASC, neighbor_id ASC) AS rnk
        FROM d) WHERE rnk <= 5"""
    },


    // bucketed cosine top-k: identical multiprobe candidate set to
    // ann_l2_topk; the double sums run in list order in both engines, so
    // the quantized cosine is bit-exact cross-engine
    "ann_cosine_topk" -> {
      def bit(i: Int, weight: Int) = s"""
        (CASE WHEN list_aggregate(list_transform(generate_series(1, len(q)),
           d -> q[d] * ((CAST('0x' || substr(md5('hp#$i#' || CAST(d AS VARCHAR)), 1, 15) AS BIGINT) % 2001) - 1000)),
           'sum') >= 0 THEN $weight ELSE 0 END)"""
      s"""
      WITH e AS (SELECT vec_id,
          list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100000) AS BIGINT)) AS q,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      c AS (SELECT vec_id, q, v,
          ${bit(0, 8)} + ${bit(1, 4)} + ${bit(2, 2)} + ${bit(3, 1)} AS cell
        FROM e),
      probes AS (SELECT vec_id AS query_id,
          unnest([cell, xor(cell, 1), xor(cell, 2), xor(cell, 4), xor(cell, 8),
                  xor(cell, 3), xor(cell, 5), xor(cell, 6), xor(cell, 9),
                  xor(cell, 10), xor(cell, 12)]) AS cell
        FROM c WHERE vec_id < 10),
      cand AS (SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
        FROM probes p JOIN c ON p.cell = c.cell WHERE c.vec_id <> p.query_id),
      d AS (SELECT cand.query_id, cand.neighbor_id,
          list_aggregate(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]), 'sum') /
          (sqrt(list_aggregate(list_transform(a.v, x -> x * x), 'sum')) *
           sqrt(list_aggregate(list_transform(b.v, x -> x * x), 'sum'))) AS cosine
        FROM cand JOIN c a ON cand.query_id = a.vec_id JOIN c b ON cand.neighbor_id = b.vec_id)
      SELECT query_id, neighbor_id, rnk,
        CAST(floor(100000.0 * cosine) AS BIGINT) AS cos_q
      FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
        FROM d) WHERE rnk <= 5"""
    },

    // same-cell candidate pairs + exact integer-quantized cosine filter
    "dedup_embed_cosine" -> {
      def bit(i: Int, weight: Int) = s"""
        (CASE WHEN list_aggregate(list_transform(generate_series(1, len(q)),
           d -> q[d] * ((CAST('0x' || substr(md5('hp#$i#' || CAST(d AS VARCHAR)), 1, 15) AS BIGINT) % 2001) - 1000)),
           'sum') >= 0 THEN $weight ELSE 0 END)"""
      s"""
      WITH e AS (SELECT vec_id,
          list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100000) AS BIGINT)) AS q
        FROM embeddings),
      c AS (SELECT vec_id, q,
          ${bit(0, 8)} + ${bit(1, 4)} + ${bit(2, 2)} + ${bit(3, 1)} AS cell
        FROM e),
      p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.q AS qa, b.q AS qb
            FROM c a JOIN c b ON a.cell = b.cell AND a.vec_id < b.vec_id)
      SELECT id_a, id_b, cos_q FROM (
        SELECT id_a, id_b,
          CAST(floor(100000.0 * least(1.0,
            CAST(list_aggregate(list_transform(generate_series(1, len(qa)), i -> qa[i] * qb[i]), 'sum') AS DOUBLE) /
            (sqrt(CAST(list_aggregate(list_transform(qa, x -> x * x), 'sum') AS DOUBLE)) *
             sqrt(CAST(list_aggregate(list_transform(qb, x -> x * x), 'sum') AS DOUBLE))))) AS BIGINT) AS cos_q
        FROM p)
      WHERE cos_q >= 15000"""
    },

    // pmod mirrored EXACTLY: Spark only adds the modulus when the fmod is
    // negative (no second fmod, so no extra rounding step) — a naive
    // ((x % m) + m) % m loses low bits on the + m and flips floor boundaries
    "pred_latlong_grid" -> {
      def pm(e: String, m: String) =
        s"(CASE WHEN ($e) % $m < 0 THEN ($e) % $m + $m ELSE ($e) % $m END)"
      s"""
      SELECT event_id,
        CAST(floor(${pm("value", "180.0")} * 10) / 10 - 90.0 AS DECIMAL(10,1)) AS lat_g,
        CAST(floor(${pm("value * 2", "360.0")} * 10) / 10 - 180.0 AS DECIMAL(10,1)) AS lon_g
      FROM events"""
    },

    "pred_hundred_integers_odd" -> """
      SELECT DISTINCT doc_id,
        CASE WHEN CAST(i AS BIGINT) < 100 THEN '0' || CAST(CAST(i AS BIGINT) % 2 AS VARCHAR)
             ELSE CAST(CAST(i AS BIGINT) // 100 AS VARCHAR) || '0' || CAST(CAST(i AS BIGINT) % 2 AS VARCHAR) END AS key
      FROM (SELECT doc_id, unnest(list_distinct(regexp_extract_all(source, '[0-9]+'))) AS i
            FROM documents)""",

    "pred_same_five_char_start" -> """
      SELECT doc_id, substr(replace(text, ' ', ''), 1, 5) AS key FROM documents""",

    "pred_round_to1" -> """
      SELECT o_orderkey,
        CAST(floor(o_totalprice / pow(10.0, floor(log10(o_totalprice))) + 0.5)
             * pow(10.0, floor(log10(o_totalprice))) AS BIGINT) AS key
      FROM orders""",

    "q_count_distinct" -> """
      SELECT c_mktsegment, count(DISTINCT o_custkey) AS n_cust
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment""",

    "q_events_window" -> """
      SELECT event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
             count(*) AS n, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
      FROM events GROUP BY event_type, date_trunc('hour', ts)""",

    "q_json_extract" -> """
      SELECT event_type, CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
             count(*) AS n
      FROM events GROUP BY event_type""",

    "score_features" -> """
      WITH d AS (
        SELECT doc_id, list_distinct(regexp_extract_all(text, '[a-z0-9'']+')) AS t,
               text, n_chars,
               regexp_extract(text, '^([a-z0-9'']+[^a-z0-9'']+[a-z0-9'']+)', 1) AS key
        FROM documents)
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(len(list_intersect(a.t, b.t)) AS BIGINT) AS f_inter,
        CAST(len(a.t) + len(b.t) - len(list_intersect(a.t, b.t)) AS BIGINT) AS f_union,
        CASE WHEN a.text = b.text THEN 1 ELSE 0 END AS f_exact,
        CAST(abs(a.n_chars - b.n_chars) AS BIGINT) AS f_len_diff,
        CAST(len(list_intersect(a.t, b.t)) AS BIGINT) * (CASE WHEN a.text = b.text THEN 1 ELSE 0 END) AS f_interaction,
        CASE WHEN len(a.t) + len(b.t) - len(list_intersect(a.t, b.t)) = 0 THEN 1 ELSE 0 END AS f_missing
      FROM d a JOIN d b USING (key)
      WHERE a.doc_id < b.doc_id AND a.key <> ''""",

    "score_lr_sigmoid" -> """
      WITH d AS (
        SELECT doc_id, list_distinct(regexp_extract_all(text, '[a-z0-9'']+')) AS t,
               regexp_extract(text, '^([a-z0-9'']+[^a-z0-9'']+[a-z0-9'']+)', 1) AS key
        FROM documents),
      f AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
          len(list_intersect(a.t, b.t)) AS fi,
          len(a.t) + len(b.t) - len(list_intersect(a.t, b.t)) AS fu
        FROM d a JOIN d b USING (key)
        WHERE a.doc_id < b.doc_id AND a.key <> '')
      SELECT id_a, id_b,
        round(1.0 / (1.0 + exp(-(8.0 * fi / greatest(fu, 1) - 4.0))), 6) AS score
      FROM f""",

    // empty-fill gazetteer search: every odd-doc query surfaces; unmatched
    // queries get the (-1, -1) sentinel (the reference's empty tuple)
    "gazette_search_empty_fill" -> s"""
      WITH d AS (
        SELECT doc_id, list_distinct($TOKS) AS t,
               regexp_extract(text, '^([a-z0-9'']+)', 1) AS key
        FROM documents),
      canon AS (SELECT * FROM d WHERE doc_id % 2 = 0 AND key <> ''),
      qs AS (SELECT * FROM d WHERE doc_id % 2 = 1),
      scored AS (
        SELECT q.doc_id AS query_id, c.doc_id AS match_id,
          len(list_intersect(q.t, c.t)) * 1000000
            // greatest(len(q.t) + len(c.t) - len(list_intersect(q.t, c.t)), 1) AS score_q
        FROM qs q JOIN canon c ON q.key = c.key),
      top AS (
        SELECT query_id, match_id, score_q FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score_q DESC, match_id ASC) AS rnk
          FROM scored) WHERE rnk = 1)
      SELECT q.doc_id AS query_id,
        COALESCE(t.match_id, -1) AS match_id,
        COALESCE(t.score_q, -1) AS score_q
      FROM (SELECT DISTINCT doc_id FROM qs) q
      LEFT JOIN top t ON q.doc_id = t.query_id""",

    // non-string comparators: haversine^0.5 + price log-dist (round 6dp like
    // score_lr_sigmoid) + categorical/exists dummies, on doc_id-derived
    // synthetic fields. Categorical outcomes for (en, fr, other):
    // [(en,en),(fr,fr),(other,other),(en,fr),(en,other),(fr,other)] -> 5 dummies
    "score_geo_price" -> s"""
      WITH d AS (
        SELECT doc_id, $TWO_TOKEN_KEY AS key,
          (doc_id * 7 % 18000) / 100.0 - 90 AS lat,
          (doc_id * 13 % 36000) / 100.0 - 180 AS lon,
          CAST(doc_id % 1000 AS DOUBLE) AS price,
          CASE WHEN doc_id % 3 = 0 THEN NULL ELSE source END AS ex,
          CASE WHEN lang IN ('en', 'fr') THEN lang ELSE 'other' END AS cat
        FROM documents),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          a.lat AS lat1, a.lon AS lon1, b.lat AS lat2, b.lon AS lon2,
          a.price AS p1, b.price AS p2,
          least(a.cat, b.cat) AS clo, greatest(a.cat, b.cat) AS chi,
          (a.ex IS NOT NULL AND a.ex <> '') AS pa,
          (b.ex IS NOT NULL AND b.ex <> '') AS pb
        FROM d a JOIN d b USING (key)
        WHERE a.doc_id < b.doc_id AND a.key <> '')
      SELECT DISTINCT id_a, id_b,
        round(sqrt(2 * 6371.0088 * asin(sqrt(
          pow(sin(radians(lat2 - lat1) / 2), 2) +
          cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(radians(lon2 - lon1) / 2), 2)
        ))), 6) AS geo_dist,
        CASE WHEN p1 <= 0 OR p2 <= 0 THEN -1.0
             ELSE round(abs(log10(p1) - log10(p2)), 6) END AS price_dist,
        CASE WHEN p1 <= 0 OR p2 <= 0 THEN 1 ELSE 0 END AS price_missing,
        CASE WHEN clo = 'fr' AND chi = 'fr' THEN 1 ELSE 0 END AS cat_d1,
        CASE WHEN clo = 'other' AND chi = 'other' THEN 1 ELSE 0 END AS cat_d2,
        CASE WHEN clo = 'en' AND chi = 'fr' THEN 1 ELSE 0 END AS cat_d3,
        CASE WHEN clo = 'en' AND chi = 'other' THEN 1 ELSE 0 END AS cat_d4,
        CASE WHEN clo = 'fr' AND chi = 'other' THEN 1 ELSE 0 END AS cat_d5,
        CASE WHEN pa AND pb THEN 1 ELSE 0 END AS ex_d1,
        CASE WHEN (pa OR pb) AND NOT (pa AND pb) THEN 1 ELSE 0 END AS ex_d2
      FROM p""",

    // The typed DataModel featurizer (datamodel.py:106-144): every
    // oracle-expressible variable kind + interaction + missing indicators.
    // Floats round(,6) per the score_geo_price convention; dummies and
    // indicators emit DOUBLE to match the featurizer's column types.
    "score_datamodel" -> s"""
      WITH d AS (
        SELECT doc_id, $TWO_TOKEN_KEY AS key,
          source AS src,
          substring(text, 1, 40) AS head,
          list_distinct(list_filter(string_split(substring(text, 1, 60), ' '),
            x -> x <> '')) AS toks,
          CAST(doc_id % 1000 AS DOUBLE) AS price,
          (doc_id * 7 % 18000) / 100.0 - 90 AS lat,
          (doc_id * 13 % 36000) / 100.0 - 180 AS lon,
          CASE WHEN lang IN ('en', 'fr') THEN lang ELSE 'other' END AS cat,
          CASE WHEN doc_id % 3 = 0 THEN NULL ELSE source END AS ex
        FROM documents),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          a.src AS src1, b.src AS src2,
          list_filter(string_split(a.head, ' '), x -> x <> '') AS ta,
          list_filter(string_split(b.head, ' '), x -> x <> '') AS tb,
          a.toks AS sa, b.toks AS sb,
          a.price AS p1, b.price AS p2,
          a.lat AS lat1, a.lon AS lon1, b.lat AS lat2, b.lon AS lon2,
          least(a.cat, b.cat) AS clo, greatest(a.cat, b.cat) AS chi,
          (a.ex IS NOT NULL AND a.ex <> '') AS pa,
          (b.ex IS NOT NULL AND b.ex <> '') AS pb
        FROM d a JOIN d b USING (key)
        WHERE a.doc_id < b.doc_id AND a.key <> ''),
      f AS (SELECT id_a, id_b,
          CASE WHEN src1 = src2 THEN 1.0 ELSE 0.0 END AS ex0,
          COALESCE(list_sum(list_transform(list_distinct(ta),
            t -> len(list_filter(ta, z -> z = t)) * len(list_filter(tb, z -> z = t)))), 0) AS dot,
          COALESCE(list_sum(list_transform(list_distinct(ta),
            t -> pow(len(list_filter(ta, z -> z = t)), 2))), 0) AS na,
          COALESCE(list_sum(list_transform(list_distinct(tb),
            t -> pow(len(list_filter(tb, z -> z = t)), 2))), 0) AS nb,
          len(sa) AS la, len(sb) AS lb, len(list_intersect(sa, sb)) AS li,
          CASE WHEN p1 <= 0 OR p2 <= 0 THEN NULL
               ELSE abs(log10(p1) - log10(p2)) END AS praw,
          sqrt(2 * 6371.0088 * asin(sqrt(
            pow(sin(radians(lat2 - lat1) / 2), 2) +
            cos(radians(lat1)) * cos(radians(lat2)) *
              pow(sin(radians(lon2 - lon1) / 2), 2)))) AS hav,
          clo, chi, pa, pb
        FROM p)
      SELECT id_a, id_b,
        ex0 AS x0,
        CASE WHEN na * nb > 0
             THEN round(dot / sqrt(CAST(na AS DOUBLE) * nb), 6) ELSE 0.0 END AS x1,
        CASE WHEN la * lb > 0
             THEN round(li / sqrt(CAST(la AS DOUBLE) * lb), 6) ELSE 0.0 END AS x2,
        COALESCE(round(praw, 6), 0.0) AS x3,
        round(hav, 6) AS x4,
        CASE WHEN clo = 'fr' AND chi = 'fr' THEN 1.0 ELSE 0.0 END AS x5,
        CASE WHEN clo = 'other' AND chi = 'other' THEN 1.0 ELSE 0.0 END AS x6,
        CASE WHEN clo = 'en' AND chi = 'fr' THEN 1.0 ELSE 0.0 END AS x7,
        CASE WHEN clo = 'en' AND chi = 'other' THEN 1.0 ELSE 0.0 END AS x8,
        CASE WHEN clo = 'fr' AND chi = 'other' THEN 1.0 ELSE 0.0 END AS x9,
        CASE WHEN pa AND pb THEN 1.0 ELSE 0.0 END AS x10,
        CASE WHEN (pa OR pb) AND NOT (pa AND pb) THEN 1.0 ELSE 0.0 END AS x11,
        COALESCE(round(praw * ex0, 6), 0.0) AS x12,
        CASE WHEN praw IS NULL THEN 0.0 ELSE 1.0 END AS x13,
        1.0 AS x14,
        1.0 AS x15,
        CASE WHEN praw IS NULL THEN 0.0 ELSE 1.0 END AS x16
      FROM f""",

    // TF-IDF cosine: idf quantized to ints (x1000) so dot/norms are exact
    // integer sums; the one double division at the end is deterministic
    "score_cosine_tfidf" -> cosineSql(setSemantics = false),
    "score_cosine_set" -> cosineSql(setSemantics = true),

    // TF-IDF search: stop terms (df > max(1000, 5%N)) excluded from the
    // index; candidates share an indexed term; weighted cosine >= 0.8
    "tfidf_search" -> s"""
      WITH n AS (SELECT count(*) AS n FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM
               (SELECT doc_id, unnest($TOKS) AS term FROM documents)
             GROUP BY doc_id, term),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      ok AS (SELECT df.term FROM df CROSS JOIN n
             WHERE df.df <= greatest(1000, CAST(floor(0.05 * n.n) AS BIGINT))),
      w AS (SELECT doc_id, tf.term AS term,
              tf.tf * CAST(floor(1000.0 * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0)) AS BIGINT) AS w
            FROM tf JOIN df ON tf.term = df.term
                   JOIN ok ON ok.term = tf.term CROSS JOIN n),
      nrm AS (SELECT doc_id, sum(w * w) AS norm2 FROM w GROUP BY doc_id),
      q AS (SELECT term, doc_id AS id_a FROM w WHERE doc_id < 50),
      p AS (SELECT DISTINCT q.id_a, w2.doc_id AS id_b
            FROM q JOIN w w2 ON w2.term = q.term),
      dot AS (SELECT p.id_a, p.id_b, sum(wa.w * wb.w) AS dot
              FROM p JOIN w wa ON wa.doc_id = p.id_a
                     JOIN w wb ON wb.doc_id = p.id_b AND wb.term = wa.term
              GROUP BY p.id_a, p.id_b)
      SELECT id_a, id_b, cosine_q FROM (
        SELECT p.id_a, p.id_b,
          CAST(floor(100000.0 * least(1.0, COALESCE(dot.dot, 0) /
            (sqrt(CAST(na.norm2 AS DOUBLE)) * sqrt(CAST(nb.norm2 AS DOUBLE))))) AS BIGINT) AS cosine_q
        FROM p LEFT JOIN dot ON p.id_a = dot.id_a AND p.id_b = dot.id_b
        JOIN nrm na ON na.doc_id = p.id_a
        JOIN nrm nb ON nb.doc_id = p.id_b)
      WHERE cosine_q >= 80000""",

    // LCS = w-1 + longest diagonal run of shared w-char windows
    // (gaps-and-islands on i - row_number), over a 32-char prefix, w = 6.
    // Candidates from rare (df <= 50) shared windows; verify is exact.
    "score_lcs_suffix" -> """
      WITH d AS (SELECT doc_id, substr(text, 1, 32) AS t FROM documents
                 WHERE len(substr(text, 1, 32)) >= 6),
      wins AS (SELECT doc_id, s['i'] AS i, s['win'] AS win FROM
        (SELECT doc_id, unnest(list_transform(
           generate_series(1, greatest(len(t) - 5, 0)),
           i -> {'i': i, 'win': substr(t, i, 6)})) AS s FROM d)),
      rare AS (SELECT win FROM (SELECT win, count(*) AS df FROM wins GROUP BY win)
               WHERE df <= 50),
      cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
               FROM wins a JOIN rare ON a.win = rare.win
               JOIN wins b ON a.win = b.win AND a.doc_id < b.doc_id),
      pa AS (SELECT c.id_a, c.id_b, w.i, w.win
             FROM cand c JOIN wins w ON w.doc_id = c.id_a),
      pr AS (SELECT pa.id_a, pa.id_b, pa.i AS i, wb.i AS j
             FROM pa JOIN wins wb ON wb.doc_id = pa.id_b AND wb.win = pa.win),
      r AS (SELECT id_a, id_b, i - j AS diag, i,
              i - row_number() OVER (PARTITION BY id_a, id_b, i - j ORDER BY i) AS grp
            FROM pr),
      runs AS (SELECT id_a, id_b, count(*) AS run
               FROM r GROUP BY id_a, id_b, diag, grp)
      SELECT id_a, id_b, CAST(max(run) + 5 AS BIGINT) AS lcs_len
      FROM runs GROUP BY id_a, id_b""",

    "score_blend_lcs" -> """
      WITH d AS (SELECT doc_id, substr(text, 1, 32) AS t FROM documents
                 WHERE len(substr(text, 1, 32)) >= 6),
      wins AS (SELECT doc_id, s['i'] AS i, s['win'] AS win FROM
        (SELECT doc_id, unnest(list_transform(
           generate_series(1, greatest(len(t) - 5, 0)),
           i -> {'i': i, 'win': substr(t, i, 6)})) AS s FROM d)),
      rare AS (SELECT win FROM (SELECT win, count(*) AS df FROM wins GROUP BY win)
               WHERE df <= 50),
      cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
               FROM wins a JOIN rare ON a.win = rare.win
               JOIN wins b ON a.win = b.win AND a.doc_id < b.doc_id),
      pa AS (SELECT c.id_a, c.id_b, w.i, w.win
             FROM cand c JOIN wins w ON w.doc_id = c.id_a),
      pr AS (SELECT pa.id_a, pa.id_b, pa.i AS i, wb.i AS j
             FROM pa JOIN wins wb ON wb.doc_id = pa.id_b AND wb.win = pa.win),
      r AS (SELECT id_a, id_b, i - j AS diag, i,
              i - row_number() OVER (PARTITION BY id_a, id_b, i - j ORDER BY i) AS grp
            FROM pr),
      runs AS (SELECT id_a, id_b, count(*) AS run
               FROM r GROUP BY id_a, id_b, diag, grp),
      lcs AS (SELECT id_a, id_b, CAST(max(run) + 5 AS BIGINT) AS lcs_len
              FROM runs GROUP BY id_a, id_b),
      grams AS (SELECT doc_id, list_distinct(list_transform(
                  generate_series(1, greatest(len(text) - 4, 0)),
                  i -> substr(text, i, 5))) AS g FROM documents),
      lens AS (SELECT doc_id, CAST(len(substr(text, 1, 32)) AS BIGINT) AS lenp
               FROM documents)
      SELECT l.id_a, l.id_b,
        greatest(
          (100000 * CAST(len(list_intersect(a.g, b.g)) AS BIGINT)) //
            greatest(CAST(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS BIGINT), 1),
          (100000 * l.lcs_len) // least(la.lenp, lb.lenp)) AS blend_q
      FROM lcs l
      JOIN grams a ON l.id_a = a.doc_id JOIN grams b ON l.id_b = b.doc_id
      JOIN lens la ON l.id_a = la.doc_id JOIN lens lb ON l.id_b = lb.doc_id""",

    // training_data_dedupe: match = within-key combinations; distinct = 500
    // hash-sampled triangular-decoded pairs minus matches (i*(b+i+2) is
    // always even so // and div agree; IEEE sqrt is correctly rounded)
    "training_pairs" -> s"""
      WITH ids AS (
        SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS idx
        FROM (SELECT DISTINCT doc_id FROM documents)),
      params AS (SELECT count(*) AS n, count(*) * (count(*) - 1) // 2 AS np FROM ids),
      dk AS (SELECT doc_id, $TWO_TOKEN_KEY AS key FROM documents),
      matched AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM dk a JOIN dk b USING (key) WHERE a.doc_id < b.doc_id),
      ks AS (
        SELECT CAST('0x' || substr(md5('tp#' || CAST(m AS VARCHAR)), 1, 15) AS BIGINT) % np AS k
        FROM generate_series(0, 499) t(m), params),
      ij AS (
        SELECT k, CAST(floor((-(1 - 2 * n) - 2 * sqrt(2 * (np - k) + 0.25)) / 2) AS BIGINT) AS i, n
        FROM ks, params),
      pij AS (SELECT i, k + (i * ((1 - 2 * n) + i + 2)) // 2 + 1 AS j FROM ij),
      decoded AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM pij JOIN ids a ON pij.i = a.idx JOIN ids b ON pij.j = b.idx)
      SELECT 'match' AS label, id_a, id_b FROM matched
      UNION ALL
      SELECT 'distinct' AS label, d.id_a, d.id_b FROM decoded d
      WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.id_a = d.id_a AND m.id_b = d.id_b)""",

    // training_data_link: match = cross-split key joins; distinct = 500
    // hash-sampled A x B grid indices ((k // nB, k % nB)) minus matches
    "training_pairs_link" -> s"""
      WITH d AS (
        SELECT doc_id, regexp_extract(text, '^([a-z0-9'']+)', 1) AS key
        FROM documents WHERE regexp_extract(text, '^([a-z0-9'']+)', 1) <> ''),
      a AS (SELECT doc_id, key, row_number() OVER (ORDER BY doc_id) - 1 AS idx
            FROM d WHERE doc_id % 2 = 0),
      b AS (SELECT doc_id, key, row_number() OVER (ORDER BY doc_id) - 1 AS idx
            FROM d WHERE doc_id % 2 = 1),
      params AS (SELECT (SELECT count(*) FROM a) AS na, (SELECT count(*) FROM b) AS nb),
      matched AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM a JOIN b USING (key)),
      ks AS (
        SELECT CAST('0x' || substr(md5('tl#' || CAST(m AS VARCHAR)), 1, 15) AS BIGINT) % (na * nb) AS k
        FROM generate_series(0, 499) t(m), params),
      decoded AS (
        SELECT DISTINCT ia.doc_id AS id_a, ib.doc_id AS id_b
        FROM (SELECT k // nb AS i, k % nb AS j FROM ks, params) p
        JOIN a ia ON p.i = ia.idx JOIN b ib ON p.j = ib.idx)
      SELECT 'match' AS label, id_a, id_b FROM matched
      UNION ALL
      SELECT 'distinct' AS label, d.id_a, d.id_b FROM decoded d
      WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.id_a = d.id_a AND m.id_b = d.id_b)""",

    "mm_binary_meta" -> s"""
      SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
             ${H60("text")} AS content_h
      FROM documents""",

    // frame-sampling schedule: ceil-div frame count, every-3rd frame index
    "mm_frame_sample" -> """
      SELECT doc_id, n_frames, frame_idx, frame_idx * 4096 AS byte_offset
      FROM (
        SELECT doc_id, n_frames,
               unnest(generate_series(0, n_frames - 1, 3)) AS frame_idx
        FROM (SELECT doc_id,
                (CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) * 97 + 4095) // 4096 AS n_frames
              FROM documents)
        WHERE n_frames >= 1)""",

    // predicate match-cover counts over consecutive-doc pairs; each branch
    // mirrors the StringPredicate semantics LearnOps applies through the
    // kernels: field preprocessed (strip punctuation — none in this corpus —
    // and collapse whitespace), falsy raw field -> no keys, cover iff key
    // sets intersect. Zero-cover predicates surface in neither engine.
    "learn_cover" -> """
      WITH p AS (
        SELECT a.doc_id AS pair_id,
               trim(regexp_replace(a.text, '\s+', ' ', 'g')) AS f1,
               trim(regexp_replace(b.text, '\s+', ' ', 'g')) AS f2
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        WHERE a.text IS NOT NULL AND a.text <> ''
          AND b.text IS NOT NULL AND b.text <> ''),
      c AS (
        SELECT '(wholeFieldPredicate, text)' AS predicate, count(*) AS covered_pairs
        FROM p WHERE f1 = f2
        UNION ALL
        SELECT '(firstTokenPredicate, text)', count(*) FROM p
        WHERE regexp_extract(f1, '^([\w'']+)', 1) <> ''
          AND regexp_extract(f1, '^([\w'']+)', 1) = regexp_extract(f2, '^([\w'']+)', 1)
        UNION ALL
        SELECT '(tokenFieldPredicate, text)', count(*) FROM p
        WHERE list_has_any(regexp_extract_all(f1, '[\w'']+'), regexp_extract_all(f2, '[\w'']+'))
        UNION ALL
        SELECT '(sameThreeCharStartPredicate, text)', count(*) FROM p
        WHERE substr(replace(f1, ' ', ''), 1, 3) = substr(replace(f2, ' ', ''), 1, 3))
      SELECT predicate, covered_pairs FROM c WHERE covered_pairs > 0""",

    // predicate-vote-weighted candidate sampling: blocks per predicate over
    // the preprocessed field, pairs within block, votes = 1e9 div
    // cover_count for predicates below the all-pairs ceiling, top-50
    "learn_weighted_sample" -> """
      WITH r AS (
        SELECT doc_id AS rid, trim(regexp_replace(text, '\s+', ' ', 'g')) AS f
        FROM documents WHERE doc_id < 100 AND text IS NOT NULL AND text <> ''),
      nn AS (SELECT count(*) AS n FROM r),
      b AS (
        SELECT '(wholeFieldPredicate, text)' AS predicate, f AS block, rid FROM r
        UNION ALL
        SELECT '(firstTokenPredicate, text)', regexp_extract(f, '^([\w'']+)', 1), rid
        FROM r WHERE regexp_extract(f, '^([\w'']+)', 1) <> ''
        UNION ALL
        SELECT '(tokenFieldPredicate, text)', tok, rid FROM (
          SELECT rid, unnest(list_distinct(regexp_extract_all(f, '[\w'']+'))) AS tok FROM r)
        UNION ALL
        SELECT '(sameThreeCharStartPredicate, text)', substr(replace(f, ' ', ''), 1, 3), rid
        FROM r),
      sz AS (SELECT predicate, block, count(*) AS sz FROM b GROUP BY 1, 2),
      elig AS (SELECT predicate FROM (SELECT predicate, max(sz) AS m FROM sz GROUP BY 1), nn
               WHERE m < nn.n),
      p AS (SELECT DISTINCT x.predicate, x.rid AS a, y.rid AS b
            FROM b x JOIN b y ON x.predicate = y.predicate AND x.block = y.block
                              AND x.rid < y.rid
            JOIN elig e ON e.predicate = x.predicate),
      cnt AS (SELECT predicate, count(*) AS cover_count FROM p, nn GROUP BY predicate, nn.n
              HAVING count(*) < (nn.n * (nn.n - 1)) // 2),
      w AS (SELECT a, b, CAST(sum(1000000000 // cover_count) AS BIGINT) AS weight_q
            FROM p JOIN cnt USING (predicate) GROUP BY a, b)
      SELECT a, b, weight_q FROM w ORDER BY weight_q DESC, a ASC, b ASC LIMIT 50""",

    // disagreement top-20: tiered ranking over the fixed-sigmoid classifier
    // score and the whole-field blocker decision (see learn.Disagreement)
    "learn_disagreement" -> """
      WITH d AS (
        SELECT a.doc_id AS id_a, a.doc_id + 1 AS id_b,
          round(1.0 / (1.0 + exp(-(8.0 *
            len(list_intersect(list_distinct(regexp_extract_all(a.text, '[a-z0-9'']+')),
                               list_distinct(regexp_extract_all(b.text, '[a-z0-9'']+')))) /
            greatest(len(list_distinct(regexp_extract_all(a.text, '[a-z0-9'']+'))) +
                     len(list_distinct(regexp_extract_all(b.text, '[a-z0-9'']+'))) -
                     len(list_intersect(list_distinct(regexp_extract_all(a.text, '[a-z0-9'']+')),
                                        list_distinct(regexp_extract_all(b.text, '[a-z0-9'']+')))), 1)
            - 4.0))), 6) AS score,
          CASE WHEN a.text = b.text THEN 1 ELSE 0 END AS covered
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1),
      t AS (
        SELECT id_a, id_b,
          CASE WHEN covered = 0 AND score > 0.5 THEN 1
               WHEN covered = 1 THEN 2 ELSE 3 END AS tier,
          CASE WHEN covered = 0 AND score > 0.5 THEN score
               WHEN covered = 1 THEN -abs(score - 0.5)
               ELSE abs(score - covered) / 2 END AS rank_key
        FROM d)
      SELECT id_a, id_b, tier, CAST(floor(rank_key * 1000000) AS BIGINT) AS key_q
      FROM t ORDER BY tier ASC, rank_key DESC, id_a ASC, id_b ASC LIMIT 20"""
  )
}
