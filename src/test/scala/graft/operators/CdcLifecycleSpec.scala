package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The CDC chunk index's takedown lifecycle (round-16 verdict item):
  * the carrier-count algebra that lets a doc-level delete subtract
  * from an 8-bytes-per-chunk index instead of forcing a rebuild.
  * Pins: delete stops a sole-carrier chunk from answering while a
  * shared chunk keeps answering; delete+probe ≡ a fresh rebuild over
  * the surviving docs; compaction changes no probe answer while
  * physically dropping cancelled rows; a leftover compaction staging
  * dir (the crash window) corrupts nothing and a re-compact succeeds.
  */
class CdcLifecycleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** A corpus whose chunk-sharing structure the tests can name: the
    * CDC divisor is 64 code points expected chunk length, so a long
    * shared passage yields shared INTERIOR chunks between its
    * carriers. Doc 1 and doc 2 share passage A (chunks of A carried
    * twice); doc 3 carries passage B alone; doc 10 (the probe batch,
    * doc_id % IncrementalMod == 0) contains BOTH passages.
    */
  private def fixture(): String = {
    import spark.implicits._
    def passage(seed: String): String =
      (0 until 40).map(i => s"$seed$i token$i word${i * 7 % 13}").mkString(" ")
    val a = passage("alpha")
    val b = passage("bravo")
    val tmp = java.nio.file.Files.createTempDirectory("cdclife").toString
    Seq(
      (1L, s"$a"),
      (2L, s"intro text $a"),
      (3L, s"$b"),
      (10L, s"$a middle filler $b")
    ).toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"),
        lit("spec").as("source"), length($"text").cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private def probe(tmp: String, dir: String): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    Dedup.incrementalCdcMass(spark, tmp, dir)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("takedown: sole-carrier chunks stop answering, shared chunks keep answering") {
    val tmp = fixture()
    val dir = s"$tmp/idx"
    // historical = docs 1, 2, 3; probe batch = doc 10
    Dedup.writeCdcIndex(spark, tmp, dir, col("doc_id") % 10 =!= 0)
    val before = probe(tmp, dir)(10L)
    assert(before._2 > 0, s"probe must see passages A and B as dup: $before")

    // delete doc 3 — passage B's ONLY carrier: B's mass must drop out
    Dedup.deleteFromCdcIndex(spark, tmp, dir, col("doc_id") === 3L)
    val afterB = probe(tmp, dir)(10L)
    assert(afterB._2 < before._2,
      s"B's sole carrier deleted, dup mass must drop: $before -> $afterB")

    // delete doc 1 — passage A still carried by doc 2: A keeps answering
    Dedup.deleteFromCdcIndex(spark, tmp, dir, col("doc_id") === 1L)
    val afterA = probe(tmp, dir)(10L)
    assert(afterA._2 > 0,
      s"A survives via doc 2, some dup mass must remain: $afterA")
    assert(afterA._2 <= afterB._2, s"deleting can never add mass: $afterB -> $afterA")

    // delete + probe ≡ a FRESH index over exactly the surviving docs
    val fresh = s"$tmp/idx_fresh"
    Dedup.writeCdcIndex(spark, tmp, fresh, col("doc_id") === 2L)
    assert(probe(tmp, fresh) == probe(tmp, dir),
      "takedown must answer exactly like a rebuild over survivors")
  }

  test("compaction folds counts without changing any probe answer; crash window is safe") {
    val tmp = fixture()
    val dir = s"$tmp/idx"
    Dedup.writeCdcIndex(spark, tmp, dir, col("doc_id") % 10 =!= 0)
    Dedup.deleteFromCdcIndex(spark, tmp, dir, col("doc_id") === 3L)
    val before = probe(tmp, dir)

    // a leftover staging dir from a crashed compaction must corrupt
    // nothing (readers never look at *_staging) and the next compact
    // must clear it
    val staging = new java.io.File(s"$dir/chunks_staging")
    staging.mkdirs()
    new java.io.File(staging, "garbage.txt").createNewFile()
    assert(probe(tmp, dir) == before, "staging leftovers must not affect reads")

    Dedup.compactCdcIndex(spark, dir)
    assert(probe(tmp, dir) == before, "compaction must not change answers")
    assert(!staging.exists(), "compaction swap consumes the staging dir")

    // physically folded: one row per hash, no non-positive counts
    val rows = spark.read.parquet(s"$dir/chunks")
    assert(rows.filter(col("cnt") <= 0).count() == 0,
      "cancelled rows must be gone after compaction")
    assert(rows.groupBy(col("h")).count().filter(col("count") > 1).count() == 0,
      "compaction must leave one row per hash")
  }

  test("legacy h-only index: probes keep answering; subtractive ops refuse loudly") {
    import spark.implicits._
    val tmp = fixture()
    val dir = s"$tmp/idx"
    // build a counted index, then rewrite its chunk files WITHOUT the
    // cnt column — exactly what a pre-carrier-count deployment left
    // on disk
    Dedup.writeCdcIndex(spark, tmp, dir, col("doc_id") % 10 =!= 0)
    val legacy = spark.read.parquet(s"$dir/chunks")
      .select($"h", $"bkt").collect()
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/chunks"), true)
    spark.createDataFrame(java.util.Arrays.asList(legacy: _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("h",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("bkt",
            org.apache.spark.sql.types.IntegerType))))
      .write.partitionBy("bkt").parquet(s"$dir/chunks")
    // probe: legacy rows count as one carrier — existence semantics,
    // so the answers equal the counted index's
    val fresh = s"$tmp/idx_fresh"
    Dedup.writeCdcIndex(spark, tmp, fresh, col("doc_id") % 10 =!= 0)
    assert(probe(tmp, dir) == probe(tmp, fresh),
      "legacy index must keep answering with existence semantics")
    // subtractive ops: the arithmetic legacy rows would corrupt must
    // refuse, not silently zero shared chunks
    val e1 = intercept[IllegalArgumentException] {
      Dedup.deleteFromCdcIndex(spark, tmp, dir, col("doc_id") === 3L)
    }
    assert(e1.getMessage.contains("legacy"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Dedup.compactCdcIndex(spark, dir)
    }
    assert(e2.getMessage.contains("legacy"), e2.getMessage)
  }

  test("MIXED legacy+counted index: probes answer, subtractive ops refuse deterministically") {
    import spark.implicits._
    val tmp = fixture()
    val dir = s"$tmp/idx"
    // legacy build (h-only rewrite, as above) + a counted append on
    // top — the exact state the probe's coalesce serves and a
    // one-sampled-footer gate would pass or fail depending on which
    // footer the reader happened to sample
    Dedup.writeCdcIndex(spark, tmp, dir, col("doc_id") % 10 === 1)
    val legacy = spark.read.parquet(s"$dir/chunks")
      .select($"h", $"bkt").collect()
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/chunks"), true)
    spark.createDataFrame(java.util.Arrays.asList(legacy: _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("h",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("bkt",
            org.apache.spark.sql.types.IntegerType))))
      .write.partitionBy("bkt").parquet(s"$dir/chunks")
    Dedup.appendToCdcIndex(spark, tmp, dir, col("doc_id") % 10 === 2)
    // the mixed index keeps probing (coalesce semantics = the fresh
    // index over both slices)
    val fresh = s"$tmp/idx_fresh"
    Dedup.writeCdcIndex(spark, tmp, fresh,
      col("doc_id") % 10 === 1 || col("doc_id") % 10 === 2)
    assert(probe(tmp, dir) == probe(tmp, fresh),
      "mixed index must keep answering with coalesce semantics")
    // ...but subtraction/compaction against its legacy rows must
    // refuse EVERY time: legacy-only hashes would fold to NULL and
    // vanish, mixed hashes would undercount
    val e1 = intercept[IllegalArgumentException] {
      Dedup.deleteFromCdcIndex(spark, tmp, dir, col("doc_id") === 11L)
    }
    assert(e1.getMessage.contains("legacy"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Dedup.compactCdcIndex(spark, dir)
    }
    assert(e2.getMessage.contains("legacy"), e2.getMessage)
  }

  test("append after compaction keeps the algebra: re-ingest makes a chunk historical again") {
    val tmp = fixture()
    val dir = s"$tmp/idx"
    Dedup.writeCdcIndex(spark, tmp, dir, col("doc_id") % 10 =!= 0)
    Dedup.deleteFromCdcIndex(spark, tmp, dir, col("doc_id") === 3L)
    Dedup.compactCdcIndex(spark, dir)
    val purged = probe(tmp, dir)(10L)
    // re-append doc 3: passage B counts as historical again, exactly
    // as the never-deleted index would have answered
    Dedup.appendToCdcIndex(spark, tmp, dir, col("doc_id") === 3L)
    val reingested = probe(tmp, dir)(10L)
    val fresh = s"$tmp/idx_fresh"
    Dedup.writeCdcIndex(spark, tmp, fresh, col("doc_id") % 10 =!= 0)
    assert(reingested == probe(tmp, fresh)(10L),
      s"delete+compact+append must equal the never-deleted index: $purged -> $reingested")
  }
}
