package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.DnaFunctions

class DnaPipelineSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("fused pipeline: every document roundtrips") {
    import spark.implicits._
    val bad = DnaPipeline.fileReport(spark, sf)
      .filter($"status" =!= "success" ||
        $"original_checksum" =!= $"reconstructed_checksum")
      .count()
    assert(bad == 0)
  }

  test("grouped reconstruction equals original text") {
    import spark.implicits._
    val recon = DnaPipeline.queries("dna_reconstruct")(spark, sf)
    val expected = graft.Tables.documents(spark, sf)
      .select($"doc_id", md5(to_binary($"text", lit("utf-8"))).as("recon_md5"))
    assert(recon.except(expected).count() == 0)
    assert(expected.except(recon).count() == 0)
  }

  test("dedup is idempotent: tracking everything leaves nothing to process") {
    val files = DnaPipeline.discover(spark, sf)
    val all = DnaPipeline.dedupAgainstTracking(files, files)
    assert(all.count() == 0)
    // and against an empty tracking set, everything flows through
    val none = DnaPipeline.dedupAgainstTracking(files, files.limit(0))
    assert(none.count() == files.count())
  }

  test("corrupted chunks fail validation (dead-letter branch predicate)") {
    import spark.implicits._
    val chunks = DnaPipeline.chunkRelation(spark, sf).limit(20)
      // flip the sequence: decoded bytes no longer match the checksum
      .withColumn("dna_sequence", reverse($"dna_sequence"))
      .withColumn("valid",
        DnaFunctions.validateChunk($"dna_sequence", $"chunk_nbytes", $"checksum"))
    val n = chunks.count()
    val invalid = chunks.filter(!$"valid").count()
    assert(n == 20 && invalid > 15, s"expected most corrupted chunks invalid, got $invalid/$n")
  }

  test("encoded sequences never contain homopolymers") {
    import spark.implicits._
    val n = DnaPipeline.chunkRelation(spark, sf)
      .filter(DnaFunctions.hasHomopolymers($"dna_sequence"))
      .count()
    assert(n == 0)
  }
}
