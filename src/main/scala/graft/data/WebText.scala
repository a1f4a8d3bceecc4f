package graft.data

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.texthash.TextHash.mix64

/**
 * Deterministic synthetic Common-Crawl-style webtext (FIXTURES.md F1):
 * schema per BASELINE.json `input_hint` — (url, warc_ts, html, text, lang)
 * plus the ground-truth `entity_id` side column (the analogue of the
 * reference benchmarks' `unique_id`, `benchmarks/common.py:51-61`).
 *
 * Two sources, both pure functions of (seed, id) — no wall clock, no Random:
 *  - [[synthetic]]: self-contained corpus from `spark.range` (unit tests)
 *  - [[fromDocuments]]: derives pages from the driver-provided
 *    `documents.parquet` (bench/correctness runs), injecting near-duplicate
 *    variants at controlled edit rates so expected Jaccard at k=5 straddles
 *    the LSH threshold.
 */
object WebText {

  final case class Page(url: String, warc_ts: Timestamp, html: Array[Byte],
                        text: String, lang: String, entity_id: Long)

  private val Epoch = 1735689600000L // 2025-01-01T00:00:00Z, fixed

  private val Vocab: Array[String] = {
    // deterministic 20k-word vocabulary: web-scale text draws from a large
    // lexicon; a toy vocabulary makes UNRELATED docs look alike (round-1's
    // 256-word soup measured cross-doc char-5 jaccard p50 = 0.175 — an
    // adversarial artifact no real Common-Crawl corpus has)
    val roots = Array("spark", "query", "table", "scan", "join", "merge", "sort",
      "batch", "stream", "window", "hash", "key", "row", "column", "data",
      "filter", "group", "agg", "part", "order", "line", "value", "fast",
      "slow", "big", "small", "the", "a", "customer", "vector")
    (0 until 20000).map { i =>
      val r = roots(i % roots.length)
      if (i < roots.length) r else r + (i / roots.length).toString
    }.toArray
  }

  /** Deterministic base text for an entity: ~`len` vocab words, ranks drawn
    * log-uniformly (~ Zipf s=1, the shape of natural-language frequencies):
    * a few very common words plus a long tail, like real web text. */
  private def baseText(entity: Long, seed: Long, len: Int): String = {
    var st = mix64(seed ^ mix64(entity))
    val lnV = math.log(Vocab.length)
    val sb = new StringBuilder
    var i = 0
    while (i < len) {
      st = mix64(st)
      if (i > 0) sb.append(' ')
      val u = (st >>> 11).toDouble / (1L << 53).toDouble // uniform [0,1)
      val rank = math.min(Vocab.length - 1, math.exp(u * lnV).toInt - 1)
      sb.append(Vocab(math.max(0, rank)))
      i += 1
    }
    sb.toString
  }

  /** Seeded near-duplicate edit of a text; `v` selects the edit recipe.
    * Edit classes mirror FIXTURES.md F1: token swap, token drop, token
    * replace, whitespace/case noise (normalization-invariant -> exact dup
    * after normalize). */
  def variantText(base: String, entity: Long, v: Int, seed: Long): String = {
    if (v == 0) return base
    val toks = base.split(" ").toBuffer
    var st = mix64(seed ^ mix64(entity * 31 + v))
    def nextInt(bound: Int): Int = { st = mix64(st); (((st % bound) + bound) % bound).toInt }
    nextInt(4) match {
      case 0 => // swap two tokens
        val i = nextInt(toks.length); val j = nextInt(toks.length)
        val t = toks(i); toks(i) = toks(j); toks(j) = t
        toks.mkString(" ")
      case 1 => // drop a token
        toks.remove(nextInt(toks.length))
        toks.mkString(" ")
      case 2 => // replace a token with an out-of-vocab marker
        toks(nextInt(toks.length)) = "zq" + nextInt(1000)
        toks.mkString(" ")
      case 3 => // whitespace + case noise only: identical after normalization
        val i = nextInt(toks.length)
        toks(i) = toks(i).toUpperCase(java.util.Locale.ROOT)
        toks.mkString("  ")
    }
  }

  private def mkPage(entity: Long, v: Int, text: String, lang: String, seed: Long): Page = {
    val url = s"https://site${(((mix64(entity) % 100) + 100) % 100)}.example/p/$entity/v$v"
    val ts = new Timestamp(Epoch + (((mix64(entity * 7 + v) % 10000000L) + 10000000L) % 10000000L) * 1000L)
    val html = s"<html><body>$text</body></html>".getBytes("UTF-8")
    Page(url, ts, html, text, lang, entity)
  }

  /** Number of duplicate variants for an entity: 0..3 extra pages,
    * distribution ~ (40% none, 30% 1, 20% 2, 10% 3). */
  private def nVariants(entity: Long, seed: Long): Int = {
    val r = (((mix64(seed ^ mix64(entity + 999)) % 10) + 10) % 10).toInt
    if (r < 4) 0 else if (r < 7) 1 else if (r < 9) 2 else 3
  }

  /** Self-contained deterministic corpus: `nEntities` entities, each with
    * 0-3 near-duplicate variants (cluster sizes 1-4). */
  def synthetic(spark: SparkSession, nEntities: Long, seed: Long = 42L,
                wordsPerDoc: Int = 40): Dataset[Page] = {
    import spark.implicits._
    spark.range(nEntities).as[Long].flatMap { entity =>
      val base = baseText(entity, seed, wordsPerDoc)
      val lang = if (((mix64(entity + 5) % 100) + 100) % 100 < 95) "en"
                 else if (mix64(entity + 6) % 2 == 0) "de" else "fr"
      (0 to nVariants(entity, seed)).map { v =>
        mkPage(entity, v, variantText(base, entity, v, seed), lang, seed)
      }
    }
  }

  /** Pages derived from the driver testdata `documents.parquet`
    * (TESTDATA.md): each document becomes an entity with 0-3 near-duplicate
    * variants. Uses the documents' own text + lang. Entity ids are offset
    * into their own namespace so the corpus can be unioned with
    * [[synthetic]] without url collisions. */
  def fromDocuments(spark: SparkSession, sfDir: String, seed: Long = 42L): Dataset[Page] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text", $"lang")
      .as[(Long, String, String)]
      .flatMap { case (docId, text, lang) =>
        val entity = docId + 1000000000L
        (0 to nVariants(entity, seed)).map { v =>
          mkPage(entity, v, variantText(text, entity, v, seed), lang, seed)
        }
      }
  }

  /** Bench corpus: documents-derived pages unioned with a `mult`x synthetic
    * corpus (disjoint entity namespaces) — sized so throughput numbers are
    * meaningful at each SF even though `documents` itself stays small. */
  def benchCorpus(spark: SparkSession, sfDir: String, mult: Int = 20,
                  seed: Long = 42L): DataFrame = {
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    fromDocuments(spark, sfDir, seed).toDF()
      .unionAll(synthetic(spark, nDocs * mult, seed).toDF())
  }

  /** Ground-truth duplicate pairs (a < b by url) within each entity —
    * the `get_true_dupes` analogue (`benchmarks/common.py:51-61`),
    * generalized from size-2 groups to all intra-entity pairs. */
  def truePairs(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select($"url".as("a"), $"entity_id").as("x")
      .join(pages.select($"url".as("b"), $"entity_id").as("y"), "entity_id")
      .filter($"a" < $"b")
      .select($"a", $"b")
  }
}
