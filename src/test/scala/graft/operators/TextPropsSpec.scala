package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based laws for the text/dedup column operators, evaluated
  * through real Spark plans (a deterministic seeded generator drives
  * the corpus; assertions hold for every generated row).
  */
class TextPropsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val wordGen = Gen.oneOf("spark", "scan", "agg", "a", "the",
    "key", "Σω", "naïve", "x1")
  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 30)
    ws <- Gen.listOfN(n, wordGen)
    sep <- Gen.oneOf(" ", "  ", "\t", " \n ")
  } yield ws.mkString(sep)

  private def corpus(count: Int): Seq[String] = {
    var seed = org.scalacheck.rng.Seed(7L)
    (0 until count).flatMap { i =>
      val r = textGen.apply(Gen.Parameters.default.withSize(1 + i % 50), seed)
      seed = seed.next
      r
    }
  }

  test("token laws: no empty tokens; count bounded by text length; separator-insensitive") {
    import spark.implicits._
    val df = corpus(300).toDF("text")
    val toks = df.select($"text", TextAnalysis.tokens($"text").as("t"))
    assert(toks.filter(exists($"t", x => length(x) === 0)).count() == 0)
    assert(toks.filter(size($"t") > length($"text")).count() == 0)
    // re-joining with single spaces and re-tokenizing is a fixpoint
    val rejoined = toks.select(concat_ws(" ", $"t").as("text2"), $"t")
      .select(TextAnalysis.tokens($"text2").as("t2"), $"t")
    assert(rejoined.filter(not($"t2" === $"t")).count() == 0)
  }

  test("shingle laws: count = max(0, n_tokens - 2) before dedup; every shingle has 3 tokens") {
    import spark.implicits._
    val df = corpus(300).toDF("text")
    val r = df.select(
      size(TextAnalysis.tokens($"text")).as("n"),
      Dedup.shingles($"text").as("sh"),
      Dedup.shingleHashes($"text").as("shh"))
    // distinct shingle set is bounded by the raw count
    assert(r.filter(size($"sh") > greatest($"n" - 2, lit(0))).count() == 0)
    assert(r.filter(exists($"sh", s => size(split(s, " ")) =!= 3)).count() == 0)
    // the hashed kernel tracks the string kernel 1:1 (collision guard)
    assert(r.filter(size($"shh") =!= size($"sh")).count() == 0)
  }

  test("jaccard laws: self-similarity 1, symmetric input gives symmetric output") {
    import spark.implicits._
    // duplicate every doc under two ids: every (2k, 2k+1) pair must
    // appear with jaccard 1.0
    val docs = corpus(40).filter(_.trim.split("\\s+").count(_.nonEmpty) >= 3)
      .zipWithIndex.flatMap { case (t, i) => Seq((2L * i, t), (2L * i + 1, t)) }
    val tmp = java.nio.file.Files.createTempDirectory("jacc").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val pairs = Dedup.jaccardPairs(spark, tmp)
      .filter($"id_b" === $"id_a" + 1 && $"id_a" % 2 === 0)
    val nDocPairs = docs.size / 2
    assert(pairs.count() == nDocPairs)
    assert(pairs.filter($"jaccard" =!= 1.0).count() == 0)
  }

  test("minhash signature of identical shingle sets is identical") {
    import spark.implicits._
    val docs = corpus(30).filter(_.trim.split("\\s+").count(_.nonEmpty) >= 3)
      .zipWithIndex.flatMap { case (t, i) => Seq((2L * i, t), (2L * i + 1, t)) }
    val tmp = java.nio.file.Files.createTempDirectory("mh").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val sig = Dedup.minhashSignatures(spark, tmp)
    val a = sig.filter($"doc_id" % 2 === 0)
      .select(($"doc_id" / 2).cast("long").as("k"), $"sig".as("sa"))
    val b = sig.filter($"doc_id" % 2 === 1)
      .select((($"doc_id" - 1) / 2).cast("long").as("k"), $"sig".as("sb"))
    assert(a.join(b, "k").filter($"sa" =!= $"sb").count() == 0)
  }

  test("normalizer laws: idempotent, agrees with the regex reference, kills case/ws variance") {
    import spark.implicits._
    val df = corpus(300).toDF("text")
    // reference semantics: NFC, Unicode-White_Space runs → one space,
    // trim, per-char simple lowercase (corpus is BMP, so per-char =
    // per-code-point)
    val ref = udf { (t: String) =>
      java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)
        .replaceAll("[\\t\\n\\x0B\\f\\r \\x{0085}\\x{00A0}\\x{1680}" +
          "\\x{2000}-\\x{200A}\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]+", " ")
        .trim.map(Character.toLowerCase)
    }
    val n = df.select(Dedup.normalizeText($"text").as("a"),
      ref($"text").as("b"),
      Dedup.normalizeText(Dedup.normalizeText($"text")).as("aa"),
      Dedup.normalizeText(upper($"text")).as("au"))
    assert(n.filter($"a" =!= $"b").count() == 0, "kernel != regex reference")
    assert(n.filter($"a" =!= $"aa").count() == 0, "not idempotent")
    // uppercasing the input cannot change the canonical form (ASCII
    // round-trip; the generator's unicode words are case-stable here)
    assert(n.filter($"a" =!= $"au").count() == 0, "case variance survived")
  }

  test("normalizer unicode: NFC folds accent forms, White_Space class, simple casing, null-safe") {
    import spark.implicits._
    val rows = Seq(
      // NBSP / ideographic space / line+paragraph separators collapse
      ("Hello  World", "hello world"),
      ("　\tA B  ", "a b"),
      // composed and decomposed accents canonicalize to the same form
      ("Café  CRÈME", "café crème"),
      ("Café CRÈME", "café crème"),
      // SIMPLE case mapping (utf8proc/DuckDB-LOWER semantics): İ → i
      // (one code point), Σ → σ even word-finally (no special casing)
      ("İSTANBUL ΣΟΦΟΣ", "istanbul σοφοσ"),
      // U+001C–1F are Character.isWhitespace but NOT Unicode
      // White_Space — they must survive, or Spark and RE2 disagree
      ("\u001c\u001dX", "\u001c\u001dx"),
      ("", ""), ("   ", ""))
    val got = rows.toDF("t", "want")
      .select(Dedup.normalizeText($"t").as("got"), $"want")
    assert(got.filter($"got" =!= $"want").count() == 0,
      got.collect().mkString("\n"))
    // a null document normalizes to null (one null-fingerprint group on
    // both engines — MD5(NULL) is NULL in DuckDB too), never an NPE
    val n = Seq((1L, null: String), (2L, "x")).toDF("doc_id", "text")
      .select(Dedup.normalizeText($"text").as("n"))
    assert(n.filter($"n".isNull).count() == 1)
  }

  test("dup-mass laws: 1 on a fully duplicated corpus, 0 on disjoint vocab, bounded on real text") {
    import spark.implicits._
    // every doc duplicated under two ids → every shingle has DF ≥ 2 →
    // mass exactly 1 wherever shingles exist
    val dup = (0L until 20L).flatMap(i => Seq(
      (2 * i, s"alpha$i beta$i gamma$i delta$i"),
      (2 * i + 1, s"alpha$i beta$i gamma$i delta$i")))
    val t1 = java.nio.file.Files.createTempDirectory("dupmass1").toString
    dup.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$t1/documents.parquet")
    val m1 = TextAnalysis.queries("txt_dup_mass")(spark, t1)
    assert(m1.filter($"n_shingles" > 0 && $"dup_mass" =!= 1.0).count() == 0)
    assert(m1.filter($"n_shingles" === 0 && $"dup_mass" =!= 0.0).count() == 0)
    // per-doc private vocabularies → no shingle is shared → mass 0
    val uniq = (0L until 20L).map(i => (i, s"u${i}a u${i}b u${i}c u${i}d"))
    val t2 = java.nio.file.Files.createTempDirectory("dupmass2").toString
    uniq.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$t2/documents.parquet")
    val m2 = TextAnalysis.queries("txt_dup_mass")(spark, t2)
    assert(m2.filter($"dup_mass" =!= 0.0).count() == 0)
    assert(m2.filter($"n_shingles" =!= 2L).count() == 0) // 4 tokens → 2 shingles
  }

  test("unigram NLL: hand-computed fixture; zero for a single-token vocabulary") {
    import spark.implicits._
    // corpus "a a a b" + "b": counts a=3, b=2, total=5
    val t1 = java.nio.file.Files.createTempDirectory("nll1").toString
    Seq((1L, "a a a b"), (2L, "b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$t1/documents.parquet")
    val exp1 = BigDecimal(-(3 * math.log(3.0 / 5) + math.log(2.0 / 5)) / 4)
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp2 = BigDecimal(-math.log(2.0 / 5))
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byId = TextAnalysis.queries("txt_unigram_nll")(spark, t1)
      .select($"doc_id", $"n_tokens", $"nll")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byId(1L) == ((4L, exp1)), s"doc1: ${byId(1L)} want ($exp1)")
    assert(byId(2L) == ((1L, exp2)), s"doc2: ${byId(2L)} want ($exp2)")
    // one-token vocabulary: p = 1 everywhere → NLL 0
    val t2 = java.nio.file.Files.createTempDirectory("nll2").toString
    Seq((1L, "x x x"), (2L, "x")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$t2/documents.parquet")
    assert(TextAnalysis.queries("txt_unigram_nll")(spark, t2)
      .filter(abs($"nll") > 1e-12).count() == 0)
  }

  test("entropy laws: bounded by ln(n_types), zero iff one distinct token, order-invariant") {
    import spark.implicits._
    val df = corpus(300).toDF("text")
    val e = df.select(TextAnalysis.tokens($"text").as("t"))
      .select($"t", size(array_distinct($"t")).as("types"),
        round(TextAnalysis.entropyKernel($"t"), 6).as("h"),
        round(TextAnalysis.entropyKernel(reverse($"t")), 6).as("hrev"))
    assert(e.filter($"h" < 0).count() == 0)
    // H <= ln(types) (+rounding slack); equality at uniform counts
    assert(e.filter($"h" > round(log($"types".cast("double")), 6) + 1e-6)
      .count() == 0)
    assert(e.filter($"types" <= 1 && $"h" =!= 0.0).count() == 0)
    assert(e.filter($"types" > 1 && $"h" === 0.0).count() == 0)
    // a bag-of-tokens permutation cannot change the distribution
    assert(e.filter($"h" =!= $"hrev").count() == 0)
  }

  test("NB quality classifier separates its training labels; empty docs score the prior") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val out = TextAnalysis.queries("txt_quality_classifier")(spark, sf)
      .select($"doc_id", $"label", $"nb_score")
      .as[(Long, Long, Double)].collect()
    assert(out.nonEmpty)
    val pos = out.filter(_._2 == 1L).map(_._3)
    val neg = out.filter(_._2 == 0L).map(_._3)
    // the gate's 25th-percentile cut guarantees both classes on the
    // real fixture; a trained NB must at minimum rank its own
    // training classes apart in the mean
    assert(pos.nonEmpty && neg.nonEmpty)
    assert(pos.sum / pos.length > neg.sum / neg.length,
      s"mean pos ${pos.sum / pos.length} <= mean neg ${neg.sum / neg.length}")
    // directed: an empty-token doc scores exactly the smoothed prior
    val tmp = java.nio.file.Files.createTempDirectory("nb").toString
    // alphas sorted: [0, a1, a4, a5] → q25 = 0.75·a1 > 0, so the
    // empty doc (alpha_r 0) is the one gate failure
    Seq(
      (1L, "alpha beta alpha beta gamma", "s1"),
      (3L, "", "s1"),              // no tokens at all
      (4L, "delta delta delta", "s1"),
      (5L, "epsilon zeta eta theta", "s1")
    ).toDF("doc_id", "text", "source")
      .select($"doc_id", $"text", lit("en").as("lang"), $"source",
        org.apache.spark.sql.functions.length($"text").cast("long").as("n_chars"))
      .write.parquet(s"$tmp/documents.parquet")
    val r = TextAnalysis.queries("txt_quality_classifier")(spark, tmp)
      .select($"doc_id", $"label", $"nb_score")
      .as[(Long, Long, Double)].collect().map(x => x._1 -> (x._2, x._3)).toMap
    val pd = r.values.count(_._1 == 1L)
    val nd = r.values.count(_._1 == 0L)
    val prior = math.log((pd + 1).toDouble / (nd + 1))
    val rounded = BigDecimal(prior).setScale(5,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val (emptyLabel, emptyScore) = r(3L)
    assert(emptyLabel == 0L, "empty text: alpha_r 0 must fail a mixed gate")
    assert(math.abs(emptyScore - rounded) < 1e-9,
      s"empty doc scored $emptyScore, smoothed prior is $rounded")
  }
}
