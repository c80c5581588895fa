package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Bq]] — binary quantization: the sign-signature contract, stored
  * parity, stateless appends, and recall sanity after the exact
  * re-rank.
  */
class BqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("signature pins: sign bits, zero-pad, exact-zero, dim cap") {
    assert(Bq.signature(Seq(1f, -1f, 0f, 2f)) == ((1L << 0) | (1L << 3)))
    assert(Bq.signature(null) == 0L)
    assert(Bq.signature(Seq.empty) == 0L)
    assert(Bq.signature(Seq.fill(64)(-1f)) == 0L)
    assert(Bq.signature(Seq.fill(64)(1f)) == -1L) // all 64 bits set
    // dims past Dim are ignored (the fixed-width signature contract)
    assert(Bq.signature(Seq.fill(70)(1f)) == -1L)
  }

  test("stored probe is identical to the session probe") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bqspec")
      .toString + "/bq"
    Bq.writeBqIndex(spark, sf, dir)
    val session = Bq.topkBq(spark, sf)
      .as[(Long, Long, Double, Int)].collect().toSet
    val stored = Bq.topkBqStored(spark, sf, dir)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(session.nonEmpty && stored == session)
  }

  test("top-k recall vs brute force is reasonable after the exact re-rank") {
    import spark.implicits._
    val bf = Similarity.queries("sim_topk_bruteforce")(spark, sf)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val bq = Bq.topkBq(spark, sf)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    assert(bf.nonEmpty)
    val recall = (bf & bq).size.toDouble / bf.size
    info(f"recall@5 = $recall%.3f over ${bf.size} pairs")
    // 1 bit/dim is the lossiest point of the spectrum; the floor just
    // pins that the sign pattern carries real signal on the fixture
    assert(recall >= 0.5, f"recall $recall%.3f under the 0.5 floor")
  }

  test("append is stateless: clones land on the build's signatures and probe-visible") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("bqappend")
      .toString + "/bq"
    Bq.writeBqIndex(spark, sf, dir)
    val batch = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    Bq.appendToBqIndex(spark, dir, batch)
    val sigs = spark.read.parquet(s"$dir/sigs")
      .as[(Long, Long)].collect().toMap
    (0L until 10L).foreach { id =>
      assert(sigs(id + 1000000L) == sigs(id), s"clone of $id diverged")
    }
  }
}
