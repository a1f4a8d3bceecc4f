package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.expr.{functions => gf}
import graft.texthash.TextHash

/** Catalyst expression ≡ pure-Scala kernel parity (SURVEY.md §7.1 fallback
  * property: expr == pure function), plus codegen sanity. */
class ExprsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val samples = Seq(
    "The  Quick Brown Fox\nJumps over",
    "mississippi",
    "a",
    "",
    "  \"quoted  thing\"  ",
    "unicode héllo wörld text goes here",
    null
  )

  test("jaccard_sorted rejects pre-migration long arrays at analysis time") {
    // round-3 migrated shingles to array<int>; a long-backed array must fail
    // the analyzer with the migration message, never misread (ADVICE r4)
    val df = spark.range(1)
      .select(array(lit(1L), lit(2L)).as("a"), array(lit(1L)).as("b"))
    val e = intercept[Exception] {
      df.select(gf.jaccard_sorted($"a", $"b")).collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + "|" + chain(t.getCause)
    assert(chain(e).contains("ARRAY<INT>"), chain(e).take(500))
    // and the persisted-table guard names the migration explicitly
    val dir = java.nio.file.Files.createTempDirectory("graft-longshingles").toString
    spark.range(3).select($"id".as("url"),
      array(lit(1L), lit(2L)).as("shingles")).write.mode("overwrite").parquet(dir)
    val g = intercept[IllegalStateException] {
      graft.io.TableIO.requireIntShingles(spark.read.parquet(dir), "test table")
    }
    assert(g.getMessage.contains("re-index") || g.getMessage.contains("re-run"),
      g.getMessage)
  }

  test("normalize_text column == TextHash.normalizeText") {
    val got = samples.toDF("t").select(gf.normalize_text($"t")).as[String].collect()
    val want = samples.map(TextHash.normalizeText)
    assert(got.toSeq == want)
  }

  test("shingle_hashes column == TextHash.shingleHashes") {
    val nonNull = samples.filter(_ != null)
    val got = nonNull.toDF("t").select(gf.shingle_hashes($"t", 3, 42L)).as[Seq[Int]].collect()
    val want = nonNull.map(s => TextHash.shingleHashes(s, 3, 42L).toSeq)
    assert(got.map(_.toSeq).toSeq == want.toSeq)
  }

  test("minhash_sig / band_keys columns == pure kernels") {
    val nonNull = samples.filter(s => s != null && s.length >= 3)
    val got = nonNull.toDF("t")
      .select(gf.band_keys(gf.minhash_sig(gf.shingle_hashes($"t", 3, 42L), 64, 42L), 16))
      .as[Seq[Long]].collect()
    val want = nonNull.map { s =>
      TextHash.bandKeys(TextHash.minhashSignature(TextHash.shingleHashes(s, 3, 42L), 64, 42L), 16).toSeq
    }
    assert(got.map(_.toSeq).toSeq == want.toSeq)
  }

  test("simhash64 column == TextHash.simhashText") {
    val nonNull = samples.filter(_ != null)
    val got = nonNull.toDF("t").select(gf.simhash64($"t", 42L)).as[Long].collect()
    assert(got.toSeq == nonNull.map(TextHash.simhashText(_, 42L)))
  }

  test("jaccard_sorted and hamming64 columns == pure kernels") {
    val rows = Seq(
      (Seq(1, 2, 3), Seq(2, 3, 4), 0L, -1L),
      (Seq(1), Seq(1), 5L, 5L),
      (Seq.empty[Int], Seq(9), Long.MaxValue, Long.MinValue))
    val got = rows.toDF("x", "y", "h1", "h2")
      .select(gf.jaccard_sorted($"x", $"y"), gf.hamming64($"h1", $"h2"))
      .as[(Double, Int)].collect()
    val want = rows.map { case (x, y, h1, h2) =>
      (TextHash.jaccardSorted(x.toArray, y.toArray), TextHash.hamming64(h1, h2))
    }
    assert(got.toSeq == want)
  }

  test("suffix_keys column == TextHash.suffixKeys") {
    val got = Seq("abcdefghijklmno").toDF("t")
      .select(gf.suffix_keys($"t", 6, 3, 42L)).as[Seq[Long]].collect().head
    assert(got.toSeq == TextHash.suffixKeys("abcdefghijklmno", 6, 3, 42L).toSeq)
  }

  test("TextHash.hashString matches Spark's builtin xxhash64") {
    val strs = samples.filter(_ != null)
    val got = strs.toDF("t").select(xxhash64($"t")).as[Long].collect()
    assert(got.toSeq == strs.map(TextHash.hashString(_, 42L))) // Spark default seed = 42
  }

  test("signature stage stays inside whole-stage codegen (no fallback)") {
    val df = spark.range(4)
      .select(concat(lit("hello world wide web of text "), $"id".cast("string")).as("t"))
      .select(gf.minhash_sig(gf.shingle_hashes(gf.normalize_text($"t"), 5, 42L), 32, 42L).as("sig"))
    // "*(n)" marks operators inside a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"plan lacks codegen span:\n$plan")
    // and it actually executes through the generated path
    assert(df.collect().head.getSeq[Long](0).length == 32)
  }
}
