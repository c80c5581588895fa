package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native vector/ngram expressions: SQL surface, null semantics, and
  * equivalence with the reference formulations.
  */
class VectorExpressionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.register(s)
    s
  }

  test("vector_dot/vector_norm: SQL surface, exact values, null propagation") {
    import spark.implicits._
    Seq(
      (Some(Seq(1.0f, 2.0f, 3.0f)), Some(Seq(4.0f, 5.0f, 6.0f))),
      (Some(Seq(1.5f, -2.0f)), Some(Seq(0.5f, 0.25f))),
      (None, Some(Seq(1.0f))))
      .toDF("a", "b")
      .select($"a".cast("array<float>").as("a"), $"b".cast("array<float>").as("b"))
      .createOrReplaceTempView("v")
    val rows = spark.sql(
      "SELECT vector_dot(a, b) AS d, vector_norm(a) AS n FROM v").collect()
    assert(rows(0).getDouble(0) == 1.0 * 4 + 2.0 * 5 + 3.0 * 6)
    assert(rows(0).getDouble(1) == math.sqrt(1.0 + 4.0 + 9.0))
    assert(rows(1).getDouble(0) == 1.5 * 0.5 + (-2.0) * 0.25)
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1), "null input must propagate")
  }

  test("vector_dot accumulates left-to-right like the UDF kernel it replaced") {
    import spark.implicits._
    // catastrophic-cancellation probe: result depends on accumulation
    // order, so equality with the scalar left-to-right loop pins it
    val a = Array(1e8f, 1f, -1e8f, 1f)
    val b = Array(1f, 1f, 1f, 1f)
    var want = 0.0
    for (i <- a.indices) want += a(i).toDouble * b(i).toDouble
    val got = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      .select($"a".cast("array<float>").as("a"), $"b".cast("array<float>").as("b"))
      .select(graft.functions.VectorFunctions.dot($"a", $"b").as("d"))
      .head().getDouble(0)
    assert(got == want)
  }

  test("minhash_sig equals the per-seed avalanche reference; null/empty → sentinel") {
    import spark.implicits._
    // reference: the Scala loop the native kernel replaced
    def refSig(hs: Seq[Long]): Seq[Long] = {
      val sig = Array.fill(graft.operators.Dedup.NumHashes)(Long.MaxValue)
      hs.foreach { h =>
        var k = 0
        while (k < sig.length) {
          var x = h ^ (0x9e3779b97f4a7c15L * (k + 1))
          x ^= (x >>> 33); x *= 0xff51afd7ed558ccdL; x ^= (x >>> 33)
          if (x < sig(k)) sig(k) = x
          k += 1
        }
      }
      sig.toSeq
    }
    val docs = Seq("a b c d e f", "x y z w", "a a a a a", "").toDF("text")
    val got = docs
      .select(graft.operators.Dedup.minhashSig(
        graft.operators.Dedup.shingleHashes($"text")).as("sig"))
      .as[Seq[Long]].collect()
    val want = docs.select($"text").as[String].collect()
      .map(t => refSig(graft.operators.Dedup.distinctNgrams(t, 3)
        .map(graft.operators.Dedup.fnv1a)))
    assert(got.toSeq.map(_.toSeq) == want.toSeq.map(_.toSeq))
    // empty shingle set (the "" doc) → sentinel, same as the old UDF
    assert(got.last.forall(_ == Long.MaxValue))
    // SQL surface + null input → sentinel (NOT null): the expression is
    // non-null-propagating by contract
    val viaSql = spark.sql(
      "SELECT minhash_sig(CAST(NULL AS ARRAY<BIGINT>)) AS sig")
      .as[Seq[Long]].head()
    assert(viaSql.size == graft.operators.Dedup.NumHashes
      && viaSql.forall(_ == Long.MaxValue))
  }

  test("packed_pairs: sorted-distinct pair emission, packing round-trips") {
    import spark.implicits._
    val got = spark.sql(
      "SELECT packed_pairs(CAST(ARRAY(5, 2, 9, 2, 5) AS ARRAY<BIGINT>)) AS p")
      .as[Seq[Long]].head()
    // distinct {2,5,9} → pairs (2,5),(2,9),(5,9) in order
    val want = Seq((2L, 5L), (2L, 9L), (5L, 9L)).map { case (a, b) => (a << 32) | b }
    assert(got == want)
    // unpack round-trip (the shape buildJaccardPairs relies on)
    assert(want.map(p => (p >>> 32, p & 0xffffffffL)) == Seq((2L, 5L), (2L, 9L), (5L, 9L)))
    // empty and singleton buckets emit nothing
    assert(spark.sql("SELECT packed_pairs(CAST(ARRAY(7) AS ARRAY<BIGINT>)) AS p")
      .as[Seq[Long]].head().isEmpty)
    // out-of-range ids fail loudly instead of corrupting keys (a
    // literal input is constant-folded on the driver, so the kernel's
    // IllegalArgumentException arrives unwrapped; from executors it
    // comes wrapped in a SparkException — either way the message names
    // the violated packing range)
    val e = intercept[Throwable] {
      spark.sql(s"SELECT packed_pairs(CAST(ARRAY(1, ${1L << 31}) AS ARRAY<BIGINT>)) AS p")
        .collect()
    }
    assert(e.getMessage.contains("packed-pair range")
      || Option(e.getCause).exists(_.getMessage.contains("packed-pair range")))
  }

  test("ngram_hashes equals the string-shingle path hashed element-for-element") {
    import spark.implicits._
    val docs = Seq("a b c d e", "x y", "", "a a a a a a a a a a")
      .toDF("text")
    val got = docs
      .select(graft.operators.Dedup.shingleHashes($"text").as("h"))
      .as[Seq[Long]].collect()
    val want = docs.select($"text").as[String].collect()
      .map(t => graft.operators.Dedup.distinctNgrams(t, 3)
        .map(graft.operators.Dedup.fnv1a))
    assert(got.toSeq.map(_.toSeq) == want.toSeq.map(_.toSeq))
    // decontamination width: < n tokens → empty array, not null
    val short = Seq("one two three").toDF("text")
      .select(graft.operators.TextAnalysis.decontamGramHashes($"text").as("h"))
      .as[Seq[Long]].head()
    assert(short.isEmpty)
  }
}
