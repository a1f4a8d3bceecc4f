package graft.ops

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.data.WebText
import graft.dedup.{DedupConfig, Matching}
import graft.streaming.GazetteerStream

class OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("greedy one-to-one matching matches reference semantics (clustering.py:284-296)") {
    val scored = Seq(
      ("q1", "c5", 0.1), ("q1", "c6", 0.72), ("q1", "c7", 0.2), ("q1", "c8", 0.6),
      ("q2", "c5", 0.2), ("q2", "c6", 0.2), ("q2", "c7", 0.72), ("q2", "c8", 0.3),
      ("q3", "c5", 0.24), ("q3", "c6", 0.72), ("q3", "c7", 0.24), ("q3", "c8", 0.65),
      ("q4", "c5", 0.63), ("q4", "c6", 0.96), ("q4", "c7", 0.23)
    ).toDF("a", "b", "score")
    val got = Matching.greedyOneToOne(scored)
      .as[(String, String, Double)].collect().toSet
    assert(got == Set(("q4", "c6", 0.96), ("q2", "c7", 0.72), ("q3", "c8", 0.65), ("q1", "c5", 0.1)))
  }

  test("gazetteer top-n window (clustering.py:299-311)") {
    val scored = Seq(
      ("q1", "c1", 0.9), ("q1", "c2", 0.8), ("q1", "c3", 0.7),
      ("q2", "c1", 0.4), ("q2", "c2", 0.0)
    ).toDF("a", "b", "score")
    val got = Matching.gazetteTopN(scored, threshold = 0.1, n = 2)
      .select("a", "b").as[(String, String)].collect().toSet
    assert(got == Set(("q1", "c1"), ("q1", "c2"), ("q2", "c1")))
  }

  test("streaming gazetteer: stream-static LSH join finds near-dups (api.py:938-995)") {
    val cfg = DedupConfig()
    val canonicalPages = WebText.synthetic(spark, 50).toDF()
      .filter($"url".endsWith("/v0"))
    val canonical = GazetteerStream.canonicalIndex(canonicalPages, cfg).cache()

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    // query three pages: two near-dup variants of canonical entities + one novel
    val variants = WebText.synthetic(spark, 50).toDF()
      .filter(!$"url".endsWith("/v0")).limit(2)
      .select($"url", $"text").as[(String, String)].collect()
    stream.addData(variants.toSeq :+ (("https://novel.example/x", "entirely novel text nobody has indexed before zebra quantum")))

    val matches = GazetteerStream.matches(
      stream.toDF().toDF("url", "text"), canonical, cfg, threshold = 0.5)
    val q = matches.writeStream.format("memory").queryName("gaz_matches")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("gaz_matches")
      .select($"query_url", $"match_url").as[(String, String)].collect()
    // each variant should match its own entity's canonical page; novel -> none
    assert(got.nonEmpty)
    assert(got.forall { case (qu, mu) =>
      qu.split("/p/")(1).split("/")(0) == mu.split("/p/")(1).split("/")(0)
    })
    assert(!got.exists(_._1.contains("novel")))
    assert(got.map(_._1).distinct.length == 2)
  }

  test("LCS diagonal-run identity == DP longest common substring (score_lcs_suffix core)") {
    // a common substring of length L >= w contains exactly L-w+1 consecutive
    // aligned w-windows on one diagonal, so LCS = w-1 + max diagonal run;
    // checked against the classic DP on random small-alphabet strings
    val w = 3
    def dpLcs(a: String, b: String): Int = {
      val m = Array.ofDim[Int](a.length + 1, b.length + 1); var best = 0
      for (i <- 1 to a.length; j <- 1 to b.length)
        if (a(i - 1) == b(j - 1)) { m(i)(j) = m(i - 1)(j - 1) + 1; best = math.max(best, m(i)(j)) }
      best
    }
    val rnd = new scala.util.Random(42)
    def rs(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    for (_ <- 1 to 20) {
      val (sa, sb) = (rs(8 + rnd.nextInt(12)), rs(8 + rnd.nextInt(12)))
      val wins = Seq((1L, sa), (2L, sb)).toDF("doc_id", "t")
        .select($"doc_id", explode(expr(
          s"transform(sequence(1, greatest(length(t) - ${w - 1}, 0)), i -> named_struct('i', i, 'win', substring(t, i, $w)))")).as("s"))
        .select($"doc_id", $"s.i".as("i"), $"s.win".as("win"))
      val pr = wins.filter($"doc_id" === 1).as("a")
        .join(wins.filter($"doc_id" === 2).as("b"), col("a.win") === col("b.win"))
        .select(col("a.i").as("i"), col("b.i").as("j"))
      val byDiag = org.apache.spark.sql.expressions.Window
        .partitionBy($"diag").orderBy($"i")
      val got = pr.withColumn("diag", $"i" - $"j")
        .withColumn("grp", $"i" - row_number().over(byDiag))
        .groupBy($"diag", $"grp").agg(count(lit(1)).as("run"))
        .agg(max($"run")).as[Option[Long]].head()
      val expected = dpLcs(sa, sb)
      if (expected >= w) assert(got.contains(expected.toLong - w + 1), s"'$sa' vs '$sb': dp=$expected got=$got")
      else assert(got.isEmpty, s"'$sa' vs '$sb': no shared window expected, got=$got")
    }
  }

  test("streaming gazetteer end-to-end: foreachBatch search + novel indexing") {
    val cfg = DedupConfig()
    val dir = java.nio.file.Files.createTempDirectory("gaz_stream").toString
    val path = s"$dir/index"
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Option[String])]
    val q = GazetteerStream.run(stream.toDF().toDF("url", "text"), path, cfg,
      threshold = 0.5) { batchResults =>
      seen ++= batchResults.select($"query_url", $"match_url")
        .as[(String, Option[String])].collect()
    }
    val base = "the quick brown fox jumps over the lazy dog near the river"
    val other = "entirely different content about spark catalyst codegen spans"
    stream.addData(Seq(("p1", base), ("p2", other)))
    q.processAllAvailable()
    // batch 1 ran against an empty index: both empty-fill, both indexed
    assert(seen.toSet == Set(("p1", None), ("p2", None)))
    assert(graft.io.TableIO.read(spark, path).count() == 2)
    seen.clear()
    stream.addData(Seq(("p3", base + " extra"), ("p4", "novel xylophone zebra quantum entangled")))
    q.processAllAvailable()
    q.stop()
    val m = seen.toMap
    assert(m("p3").contains("p1"), "near-dup of a record indexed by batch 1 must match it")
    assert(m("p4").isEmpty)
    // p4 (novel) was indexed; p3 (matched) was not
    assert(graft.io.TableIO.read(spark, path).count() == 3)
  }

  test("gazetteer index/unindex round trip with REPLACE + empty-fill (api.py:694-776,1007-1024)") {
    import graft.dedup.Gazetteer
    val cfg = DedupConfig()
    val dir = java.nio.file.Files.createTempDirectory("gaz_idx").toString
    val path = s"$dir/index"
    val base = "the quick brown fox jumps over the lazy dog near the riverbank today"
    val other = "spark catalyst expressions compile into whole stage codegen spans quickly"

    // index two canonical records
    Gazetteer.index(spark, path,
      Seq(("c1", base), ("c2", other)).toDF("url", "text"), cfg)
    val queries = Seq(("q1", base + " extra"), ("q2", "nothing remotely similar xylophone zebra")).toDF("url", "text")
    val r1 = Gazetteer.search(spark, path, queries, cfg, threshold = 0.5)
      .as[(String, Option[String], Option[Float])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(r1("q1")._1.contains("c1"))
    assert(r1("q2") == ((None, None)), "unmatched query must surface with empty fill")

    // a batch carrying the SAME url twice collapses to one row (REPLACE-by-
    // url invariant — a duplicate would break the Iceberg MERGE and double-
    // insert on parquet; ADVICE r4)
    Gazetteer.index(spark, path,
      Seq(("c3", "first version of this page"), ("c3", "second version of this page"))
        .toDF("url", "text"), cfg)
    assert(graft.io.TableIO.read(spark, path).filter($"url" === "c3").count() == 1,
      "duplicate urls in one batch must collapse to one index row")
    Gazetteer.unindex(spark, path, Seq("c3").toDF("url"))

    // REPLACE: re-index c1 with different content -> old blocks gone
    Gazetteer.index(spark, path, Seq(("c1", other + " replaced")).toDF("url", "text"), cfg)
    assert(graft.io.TableIO.read(spark, path).count() == 2, "same-key index must replace, not append")
    val r2 = Gazetteer.search(spark, path, queries, cfg, threshold = 0.5)
      .as[(String, Option[String], Option[Float])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(r2("q1")._1.isEmpty, "replaced record must no longer match its old text")

    // unindex c2: a query for `other` must no longer reach it (the surviving
    // match is c1, whose REPLACE text is also near `other`)
    Gazetteer.unindex(spark, path, Seq(Tuple1("c2")).toDF("url"))
    assert(graft.io.TableIO.read(spark, path).count() == 1)
    val r3 = Gazetteer.search(spark, path,
      Seq(("q3", other)).toDF("url", "text"), cfg, threshold = 0.5, n = 5)
      .as[(String, Option[String], Option[Float])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(!r3.values.exists(_._1.contains("c2")), "unindexed record must not match")
    assert(r3("q3")._1.contains("c1"))
    // unindex c1 too -> fully empty fill
    Gazetteer.unindex(spark, path, Seq(Tuple1("c1")).toDF("url"))
    val r4 = Gazetteer.search(spark, path,
      Seq(("q4", other)).toDF("url", "text"), cfg, threshold = 0.5)
      .as[(String, Option[String], Option[Float])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(r4("q4") == ((None, None)), "empty index must still surface the query")
  }

  test("gazetteer swap crash recovery + production MERGE/DELETE SQL") {
    import graft.dedup.Gazetteer
    import org.apache.hadoop.fs.Path
    val cfg = DedupConfig()
    val dir = java.nio.file.Files.createTempDirectory("gaz_crash").toString
    val path = s"$dir/index"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Gazetteer.index(spark, path, Seq(("c1", base)).toDF("url", "text"), cfg)

    // crash window 1: live was moved aside but the promotion rename never
    // ran (no __tmp). The next operation must restore __old, not silently
    // start an empty index.
    fs.rename(new Path(path), new Path(path + "__old"))
    val r = Gazetteer.search(spark, path, Seq(("q", base)).toDF("url", "text"), cfg, 0.5)
      .as[(String, Option[String], Option[Float])].collect()
      .map(x => x._1 -> x._2).toMap
    assert(r("q").contains("c1"), "recovery must restore the previous index version")
    assert(fs.exists(new Path(path)) && !fs.exists(new Path(path + "__old")))

    // crash window 2: the replacement was FULLY written to __tmp (complete
    // _SUCCESS) and live was moved aside -> recovery promotes __tmp
    val rows2 = Gazetteer.signatureRows(
      Seq(("c1", base), ("c2", "completely different replacement content rows")).toDF("url", "text"), cfg)
    graft.io.TableIO.write(rows2, path + "__tmp")
    fs.rename(new Path(path), new Path(path + "__old"))
    Gazetteer.unindex(spark, path, Seq(Tuple1("not-present")).toDF("url"))
    assert(graft.io.TableIO.read(spark, path).count() == 2,
      "a complete __tmp must be promoted over the stale __old")

    // production branch: catalog maintenance is incremental SQL, not rewrite
    assert(Gazetteer.mergeSql("graft.db.gaz", "upd") ==
      """MERGE INTO graft.db.gaz t USING upd u ON t.url = u.url
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(Gazetteer.deleteSql("graft.db.gaz", "del") ==
      "DELETE FROM graft.db.gaz WHERE url IN (SELECT url FROM del)")
  }

  test("streaming exact dedup: watermarked first-per-fingerprint + windowed dup stats") {
    import graft.streaming.StreamingDedup
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1735689600000L
    def ts(min: Long) = new Timestamp(t0 + min * 60000L)

    val stream = MemoryStream[(String, Timestamp, String)]
    stream.addData(
      ("u1", ts(0), "alpha beta gamma delta"),
      ("u2", ts(1), "ALPHA  beta gamma delta"), // same after normalize -> dup
      ("u3", ts(2), "completely different content here"),
      ("u4", ts(3), "alpha beta gamma delta") // dup again
    )
    val dedup = StreamingDedup.exactDedupStream(
      stream.toDF().toDF("url", "warc_ts", "text"), watermark = "10 minutes")
    val q = dedup.writeStream.format("memory").queryName("sd_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val kept = spark.table("sd_out").select($"url").as[String].collect().toSet
    assert(kept.contains("u3"))
    assert((kept & Set("u1", "u2", "u4")).size == 1, s"exactly one of the dups must survive: $kept")

    val stream2 = MemoryStream[(String, Timestamp, String)]
    stream2.addData(
      ("u1", ts(0), "alpha beta gamma delta"),
      ("u2", ts(5), "alpha beta gamma delta"),
      ("u3", ts(7), "unique page content"),
      ("u4", ts(200), "late window closer page")) // advances watermark past window 1
    val stats = StreamingDedup.windowedDupStats(
      stream2.toDF().toDF("url", "warc_ts", "text"), window = "1 hour", watermark = "1 hour")
    val q2 = stats.writeStream.format("memory").queryName("sd_stats")
      .outputMode("append").start()
    q2.processAllAvailable(); q2.stop()
    val rows = spark.table("sd_stats").select($"n_pages").as[Long].collect()
    assert(rows.toSeq == Seq(2L), s"one dup fingerprint with 2 pages expected: ${rows.toSeq}")
  }

  test("multimodal extract: partition-batched decode stub over binary column") {
    val pages = WebText.synthetic(spark, 20).toDF().select($"url", $"html")
    val metas = Multimodal.extract(pages).collect()
    assert(metas.length == pages.count())
    assert(metas.forall(_.kind == "html"))
    assert(metas.forall(m => m.n_bytes > 0 && m.features.length == 8))
    // deterministic across runs
    val again = Multimodal.extract(pages).collect()
    assert(metas.map(m => (m.url, m.width, m.height)).toSet ==
      again.map(m => (m.url, m.width, m.height)).toSet)
    // null/empty payload safety
    val junk = Seq(("u1", null.asInstanceOf[Array[Byte]]), ("u2", Array.emptyByteArray))
      .toDF("url", "html")
    val jm = Multimodal.extract(junk).collect()
    assert(jm.forall(m => m.n_bytes == 0 && m.features.isEmpty))
  }

  test("multimodal e2e: extract features -> LSH cell index -> embed-cosine pairs") {
    // synthetic binary payloads: u1/u2 byte-identical (decode stub is a pure
    // function of the bytes -> identical feature vectors), u3.. distinct
    val payload = Array.tabulate[Byte](256)(i => (i * 7 % 127).toByte)
    val pages = (Seq(("u1", payload), ("u2", payload.clone())) ++
      (3 to 12).map(i => (s"u$i", Array.tabulate[Byte](200 + i)(j => ((j * i + 13) % 125).toByte))))
      .toDF("url", "html")
    val feats = Multimodal.extract(pages).toDF()
      .select(xxhash64($"url").as("vec_id"), $"features".as("embedding"), $"url")
    val idOf = feats.select($"url", $"vec_id").as[(String, Long)].collect().toMap
    // identical payloads must land in the same cell and verify at cosine 1.0
    val pairs = PipelineOps.embedCosinePairs(feats.select($"vec_id", $"embedding"),
      minCosQ = 99000L)
      .as[(Long, Long, Long)].collect()
    val dupPair = (math.min(idOf("u1"), idOf("u2")), math.max(idOf("u1"), idOf("u2")))
    val hit = pairs.find(p => (p._1, p._2) == dupPair)
    assert(hit.isDefined, s"identical-payload pair not surfaced: ${pairs.toSeq}")
    assert(hit.get._3 == 100000L, s"identical features must verify at cos_q=100000, got ${hit.get._3}")
    // the index itself: one cell per row, quantized vectors intact
    val idx = PipelineOps.indexEmbeddings(feats.select($"vec_id", $"embedding"))
    assert(idx.count() == 12)
    val cells = idx.select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    assert(cells(idOf("u1")) == cells(idOf("u2")))
    // empty-frame safety (the ANN advisory fix)
    val empty = PipelineOps.indexEmbeddings(
      feats.select($"vec_id", $"embedding").limit(0))
    assert(empty.count() == 0)
  }

  test("canonicalize clusters distributed (canonical.py:56-79)") {
    val clustered = Seq(
      ("u1", "c1", "mary crane"),
      ("u2", "c1", "mary crane east"),
      ("u3", "c1", "mary crane west"),
      ("u4", "c2", "lone doc text")
    ).toDF("url", "cluster_id", "text")
    val rows = graft.cluster.Canonical.canonicalize(clustered)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(rows("c1")._3 == "mary crane")
    assert(rows("c1")._1 == "u1")
    assert(rows("c1")._2 == "u3") // longest text; length tie -> max id
    assert(rows("c2")._3 == "lone doc text")
  }
}
