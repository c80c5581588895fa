package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level pins for the contracts the round-9 adversarial-corpus
  * sweep established (tools/make_adversarial.py → Verify → DuckDB):
  * null text is an empty file/no tokens, and the shared FNV-1a base
  * hash folds over Unicode code points — the only definition both
  * engines can state. The sweep itself (all declared queries
  * hash-exact on the adversarial fixture) is the end-to-end form;
  * these unit pins fail closer to the cause.
  */
class AdversarialKernelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("fnv1a folds over code points, not UTF-16 units") {
    // U+1F600 GRINNING FACE: one code point, two UTF-16 units. The
    // hash must equal one FNV-1a step with the code-point value —
    // what DuckDB's ord() states — not two surrogate steps.
    val cp = 0x1F600
    var h = 0xcbf29ce484222325L
    h ^= cp
    h *= 0x100000001b3L
    assert(Dedup.fnv1a(new String(Character.toChars(cp))) == h)
    // ASCII unchanged by the definition (code point == char)
    var h2 = 0xcbf29ce484222325L
    "ab".foreach { c => h2 ^= c; h2 *= 0x100000001b3L }
    assert(Dedup.fnv1a("ab") == h2)
  }

  test("null text is an empty file to the DNA codec") {
    import graft.codec.{DnaCodec, Utf8Chunker}
    assert(Utf8Chunker.chunkBytes(null, 64).isEmpty)
    assert(DnaCodec.createDnaChunks(null, 64, 10).isEmpty)
    // md5 of the empty byte string — the same checksum an empty file gets
    assert(DnaCodec.md5HexUtf8(null) == DnaCodec.md5HexUtf8(""))
    val r = DnaCodec.processText(null, 64, 10)
    assert(r.status == "success" && r.dnaChunksCount == 0)
  }

  test("null text yields zero-token metrics across the text kernels") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("nulldoc").toString
    Seq((0L, null.asInstanceOf[String], "en", "src0", 0L),
      (1L, "plain text here", "en", "src0", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val ent = TextAnalysis.queries("txt_entropy")(spark, tmp)
      .as[(Long, Double)].collect().toMap
    assert(ent(0L) == 0.0)
    val rep = TextAnalysis.queries("txt_repetition")(spark, tmp)
      .filter($"doc_id" === 0).as[(Long, Long, Double, Double, Double)]
      .collect().head
    assert(rep == ((0L, 0L, 0.0, 0.0, 0.0)))
    // dna pipeline: the null doc discovers as an empty file and
    // reconstructs to the empty string
    val rt = DnaPipeline.queries("dna_roundtrip")(spark, tmp)
      .filter($"doc_id" === 0).collect().head
    assert(rt.getAs[String]("status") == "success" &&
      rt.getAs[Long]("n_chunks") == 0L)
    val rec = DnaPipeline.queries("dna_reconstruct")(spark, tmp)
      .filter($"doc_id" === 0).collect().head
    assert(rec.getAs[String]("recon_md5") ==
      graft.codec.DnaCodec.md5HexUtf8(""))
  }

  test("Spark round never emits negative zero (the oracle +0.0 convention's other half)") {
    // the sf1 find: DuckDB's ROUND preserves the sign of zero, Spark's
    // BigDecimal-based round cannot produce -0.0 — the oracles
    // normalize their side with `+ 0.0`, and THIS pin holds the Spark
    // side of the contract so the two can never drift: if round ever
    // started emitting -0.0, the driver compare would format it "-0"
    // against the oracle's "0"
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, round}
    val tiny = Seq(-1e-9, -4.9e-7, -0.0, 0.0, 4.9e-7, -1e-300)
    val out = tiny.toDF("x")
      .select(round(col("x"), 6).as("r"))
      .as[Double].collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r) !=
        java.lang.Double.doubleToRawLongBits(-0.0),
        s"round emitted negative zero (bits ${java.lang.Long.toHexString(
          java.lang.Double.doubleToRawLongBits(r))})")
    }
    assert(out.forall(_ == 0.0))
  }
}
