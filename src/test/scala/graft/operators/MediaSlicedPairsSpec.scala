package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded-peak-disk sliced MEDIA pair build (r18 verdict item 1 —
  * writeEmbPairsSliced transferred to the verify-at-join shape) is
  * OUTPUT-IDENTICAL to the monolithic [[Multimodal.writeMediaPairs]]:
  * buckets and cosine are pure functions of the decode-seam signature,
  * a candidate pair arises only within one table's bucket (tables
  * partition across passes), per-pass dropDuplicates + the fold's
  * cross-pass dedup compose to exactly the global dropDuplicates, and
  * the rounded cos_sim is a deterministic pair function so every
  * surviving row is value-identical in whichever pass found it.
  */
class MediaSlicedPairsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Media corpus with (a) byte-EXACT duplicate payloads — the
    * mirrored-collection shape, cos = 1.0, colliding in EVERY LSH
    * table, so the cross-pass dedup is maximally exercised (the same
    * pair surfaces in tables of different passes on every split) —
    * (b) near-dup payloads (high word-3-gram overlap, cos ≥ ~0.9 on
    * the decode-seam signature), and (c) unrelated content.
    */
  private def fixture(): String = {
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "kappa lambda mu nu xi omicron pi rho sigma tau"
    val tmp = java.nio.file.Files.createTempDirectory("slicedmedia").toString
    Seq(
      (1L, a), (2L, a), (3L, a), // exact 3-way mirror
      (4L, s"$a trailing extra"), // near-dup of the mirror
      (5L, b), (6L, b), // exact pair
      (7L, "completely different unrelated content words here now"),
      (8L, ""))
      .toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"),
        lit("spec").as("source"), length($"text").cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private def readPairs(dir: String): Set[(Long, Long, Double)] = {
    import spark.implicits._
    Dedup.readEmbPairs(spark, dir)
      .select($"id_a", $"id_b", $"cos_sim")
      .as[(Long, Long, Double)].collect().toSet
  }

  test("sliced media build ≡ monolithic, cross-pass dedup exact") {
    val tmp = fixture()
    val mono = s"$tmp/mono"
    Multimodal.writeMediaPairs(spark, tmp, mono)
    val monoPairs = readPairs(mono)
    // the exact mirrors alone must produce their in-group pairs
    assert(monoPairs.map(p => (p._1, p._2)).intersect(
        Set((1L, 2L), (1L, 3L), (2L, 3L), (5L, 6L))).size == 4,
      s"fixture must produce the planted exact-dup pairs: $monoPairs")
    for (passes <- Seq(1, 3, 8)) {
      val sliced = s"$tmp/sliced$passes"
      Multimodal.writeMediaPairsSliced(spark, tmp, sliced, passes)
      assert(readPairs(sliced) == monoPairs,
        s"sliced($passes) diverged from the monolithic media build")
      val fs = new org.apache.hadoop.fs.Path(sliced)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${sliced}_slices")),
        "the slice workspace must be cleaned up")
      assert(fs.listStatus(new org.apache.hadoop.fs.Path(sliced))
        .exists(_.getPath.getName.startsWith("shard=")),
        "stored layout must be shard-partitioned like writeMediaPairs")
    }
  }

  test("auto dispatch: listing-priced probe, identical output on both branches") {
    val tmp = fixture()
    val mono = s"$tmp/amono"
    Multimodal.writeMediaPairs(spark, tmp, mono)
    val monoPairs = readPairs(mono)
    val bytes = Dedup.documentsBytes(spark, tmp)
    assert(bytes > 0 && bytes < Multimodal.SlicedMediaPairsBytesThreshold,
      s"tiny fixture must sit under the default threshold: $bytes")
    // default threshold → monolithic branch
    val autoMono = s"$tmp/automono"
    Multimodal.writeMediaPairsAuto(spark, tmp, autoMono)
    assert(readPairs(autoMono) == monoPairs)
    // forced zero threshold → sliced branch (derived pass count);
    // output still identical and the workspace gone (proves WHICH
    // branch ran — the SlicedPairsSpec dispatch-pinning convention)
    val autoSliced = s"$tmp/autosliced"
    Multimodal.writeMediaPairsAuto(spark, tmp, autoSliced, thresholdBytes = 0L)
    assert(readPairs(autoSliced) == monoPairs)
    val fs = new org.apache.hadoop.fs.Path(autoSliced)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${autoSliced}_slices")),
      "sliced-branch workspace must be cleaned up")
  }
}
