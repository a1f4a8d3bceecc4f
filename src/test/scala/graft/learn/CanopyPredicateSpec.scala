package graft.learn

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Learnable LSH canopy predicates — the `index_predicates=True` mode
  * (`training.py:97-103`) with `TfidfNGramCanopyPredicate`'s thresholds
  * realized as pure char-2-gram MinHash band-key functions
  * ([[PredicateZoo.canopyPredicates]]). */
class CanopyPredicateSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private val ps = PredicateZoo.canopyPredicates("f")

  test("canopy keys: deterministic, banded, threshold- and field-disjoint") {
    val a = "the quick brown fox jumps over the lazy dog near the river bank"
    val b = a.replace("quick", "quikc")
    val c = "zzyzx qwopf vbnmk jxqzw hguyt plmok wsxcd rfvbgt yhnmju ikolp"
    assert(ps.map(_.name) === Seq(0.2, 0.4, 0.6, 0.8)
      .map(t => s"(TfidfNGramCanopyPredicate-$t, f)"))
    ps.foreach { p =>
      assert(p(a) === p(a), s"${p.name} not deterministic")
      assert(p(a).nonEmpty && p("") === Set.empty)
    }
    val loose = ps.head
    val tight = ps.last
    assert(loose(a).intersect(loose(b)).nonEmpty, "near-dup missed by the 0.2 canopy")
    assert(tight(a).intersect(tight(b)).nonEmpty, "one-char edit missed by the 0.8 canopy")
    assert(tight(a).intersect(tight(c)).isEmpty, "unrelated pair co-keyed at 0.8")
    // different thresholds / fields never share key space
    assert(loose(a).intersect(tight(a)).isEmpty)
    assert(PredicateZoo.canopyPredicates("g").head(a).intersect(loose(a)).isEmpty)
  }

  test("index_predicates=True: the set-cover learner picks a canopy over costly simple predicates") {
    // every record shares the token "international", so every token / gram /
    // token-metaphone / suffix predicate blocks many comparison pairs, while
    // the match pairs share NO exact token or token bigram (every token
    // vowel-typo'd between sides), break whole-field metaphone (the r->l
    // consonant swap), and break the char-set fingerprints (zz vs yy): the
    // only CHEAP full-recall cover left is an LSH canopy over the high
    // char-2-gram similarity
    val stems = Seq(
      Seq("nebulokar", "vartexim", "quilmorand", "dazzenbrook", "yelforth"),
      Seq("marzipolen", "kestrunov", "fovialware", "wumberling", "ostrevank"),
      Seq("telkridon", "josmendor", "parvinkel", "husfeldan", "imbrovek"),
      Seq("gribnalow", "solticewd", "menkoradt", "fipzorbel", "ulmswick"),
      Seq("crandleton", "bovickmar", "sumpterhol", "jelkinrod", "adwersby"),
      Seq("pindrexon", "halzoomer", "rotweldig", "cabnishol", "ewkridge"))
    val matches = stems.zipWithIndex.map { case (ws, i) =>
      // per-entity unique stems (entities mutually dissimilar), vowel-suffix
      // typos between sides (no shared token), x-prepension breaks the
      // whole-field metaphone, zz/yy break the char-set fingerprints
      val base = ws.map(_ + "a").mkString(" ") + " zz international"
      val dup = ("x" + ws.head + "e") +: ws.tail.map(_ + "e") :+ "yy" :+ "international"
      (i.toLong, base, dup.mkString(" "))
    }
    val fillers = Seq(
      ("zygote", "marsh", "plinth"), ("quartz", "bluff", "gnome"),
      ("fjord", "sketch", "pyre"), ("plump", "wizard", "crux"),
      ("dwarf", "jockey", "vex"), ("glyph", "vortex", "husk"),
      ("crisp", "blanket", "mirth"), ("jumbo", "squash", "knell"))
    val distinct = fillers.map { case (w1, w2, w3) => s"$w1 $w2 international $w3" }
    val records = (matches.flatMap(m => Seq(m._2, m._3)) ++ distinct)
      .zipWithIndex.map { case (f, i) => (i.toLong, f) }.toDF("rid", "f")
    val matchesDf = matches.toDF("pair_id", "f1", "f2")

    val zooSimple = PredicateZoo.stringPredicates("f")
    val zooIndexed = zooSimple ++ PredicateZoo.canopyPredicates("f")
    val simple = BlockLearner.learn(matchesDf, records, zooSimple, recall = 1.0)
    val indexed = BlockLearner.learn(matchesDf, records, zooIndexed, recall = 1.0)
    info(s"simple-only: ${simple.predicates.mkString(" | ")} cost=${simple.coverCount}")
    info(s"indexed: ${indexed.predicates.mkString(" | ")} cost=${indexed.coverCount}")
    assert(indexed.predicates.exists(_.contains("TfidfNGramCanopyPredicate")),
      s"no canopy learned: ${indexed.predicates}")
    assert(indexed.coverCount < simple.coverCount,
      "the canopy solution must be cheaper than the simple-only cover")
    assert(indexed.covered.size === 6, "canopy cover must reach full recall")

    // the learned canopy survives the settings round trip and blocks the
    // match pairs through the trained pipeline surface
    val vars = Seq(DataModel.Variable("f", "string"))
    val labeled = (matches.map { case (i, a, b) => (i, a, b, 1) } ++
      (0 until 6).map(i => (6L + i, matches(i)._2, distinct(i), 0)))
      .toDF("pair_id", "f_1", "f_2", "label")
    val settings = TrainedDedupe.trainFields(labeled, records, vars,
      indexPredicates = true)
    val active = TrainedDedupe.resolveFields(settings.rules, vars)
    assert(active.nonEmpty)
    val pairs = TrainedDedupe.blockPairsFields(records, active, graft.dedup.DedupConfig())
      .select(col("a"), col("b")).as[(Long, Long)].collect().toSet
    (0 until 6).foreach { i =>
      assert(pairs.contains((2L * i, 2L * i + 1)), s"match pair $i not blocked")
    }
  }
}
