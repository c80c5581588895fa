package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The pHash index's append/takedown lifecycle (round-16 verdict
  * item — the layout was write-only): append ≡ rebuild on both the
  * per-media band index and the collapsed group index (min/sum are
  * associative, so append deltas fold to the rebuild's rows), media-
  * level tombstones stop a deleted media from answering immediately
  * (delete+probe ≡ rebuild-over-survivors), and compaction changes no
  * answer while physically purging tombstoned rows.
  */
class PhashLifecycleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Docs = media (mediaRelation synthesizes payloads from text via
    * the hermetic decoder): 1 and 2 are byte-identical (same phash),
    * 3 is distinct; the probe batch (ids % IncrementalMod == 0) has
    * 10 ≡ 1/2 and 20 ≡ 3 — so every probe answer is predictable from
    * which historical carriers survive.
    */
  private def fixture(): String = {
    import spark.implicits._
    val a = (0 until 60).map(i => s"alpha$i beta${i * 3} gm$i").mkString(" ")
    val b = (0 until 60).map(i => s"delta$i zeta${i * 5} qq$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("phlife").toString
    Seq((1L, a), (2L, a), (3L, b), (10L, a), (20L, b))
      .toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"),
        lit("spec").as("source"), length($"text").cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private def pairs(tmp: String, dir: String): Set[(Long, Long)] = {
    import spark.implicits._
    Multimodal.incrementalPhashPairs(spark, tmp, dir)
      .select($"new_id", $"old_id").as[(Long, Long)].collect().toSet
  }

  private def collapsed(tmp: String, dir: String): Set[(Long, Long, Int, Long, Long)] = {
    import spark.implicits._
    Multimodal.incrementalPhashCollapsed(spark, tmp, dir)
      .as[(Long, Long, Int, Long, Long)].collect().toSet
  }

  test("per-media index: append ≡ rebuild; delete ≡ rebuild over survivors; compact is invisible") {
    val tmp = fixture()
    val inc = s"$tmp/inc"
    Multimodal.writePhashIndex(spark, tmp, inc, col("media_id") === 1L)
    Multimodal.appendToPhashIndex(spark, tmp, inc,
      col("media_id") === 2L || col("media_id") === 3L)
    val full = s"$tmp/full"
    Multimodal.writePhashIndex(spark, tmp, full, col("media_id") % 10 =!= 0)
    val baseline = pairs(tmp, full)
    // identical texts must pair exactly; near-pairs between the two
    // scenes may also exist (the fake decoder's hashes are close) —
    // all assertions below compare against rebuild baselines, never
    // an absolute pair list
    assert(Set((10L, 1L), (10L, 2L), (20L, 3L)).subsetOf(baseline),
      s"fixture: $baseline")
    assert(pairs(tmp, inc) == baseline, "append must equal rebuild")

    // takedown doc 3: no pair may name it, and the surviving answers
    // are exactly a rebuild over {1, 2}
    import spark.implicits._
    Multimodal.deleteFromPhashIndex(spark, inc, Seq(3L).toDF("media_id"))
    val no3 = s"$tmp/no3"
    Multimodal.writePhashIndex(spark, tmp, no3,
      col("media_id") === 1L || col("media_id") === 2L)
    val afterB = pairs(tmp, inc)
    assert(!afterB.exists(_._2 == 3L), "deleted media must stop answering")
    assert(afterB == pairs(tmp, no3), "delete ≡ rebuild over survivors")
    // takedown doc 1 — 10 still pairs with surviving carrier 2
    Multimodal.deleteFromPhashIndex(spark, inc, Seq(1L).toDF("media_id"))
    val afterA = pairs(tmp, inc)
    assert(afterA.contains((10L, 2L)),
      "shared hash keeps answering through the surviving carrier")
    assert(!afterA.exists(r => r._2 == 1L || r._2 == 3L))

    val before = pairs(tmp, inc)
    Multimodal.compactPhashIndex(spark, inc)
    assert(pairs(tmp, inc) == before, "compaction must not change answers")
    assert(!new java.io.File(s"$inc/_graft_tombstones").exists(),
      "compaction clears tombstones last")
    val left = spark.read.parquet(s"$inc/bands")
      .filter(col("media_id").isin(1L, 3L)).count()
    assert(left == 0, "tombstoned rows must be physically purged")
  }

  test("collapsed group index: append deltas fold to the rebuild (rep = min, n = sum)") {
    val tmp = fixture()
    val inc = s"$tmp/ginc"
    // append order chosen so the LATER delta carries the SMALLER rep:
    // the fold must still elect rep 1 and n 2 for the shared hash
    Multimodal.writePhashGroupsIndex(spark, tmp, inc, col("media_id") === 2L)
    Multimodal.appendToPhashGroupsIndex(spark, tmp, inc,
      col("media_id") === 1L || col("media_id") === 3L)
    val full = s"$tmp/gfull"
    Multimodal.writePhashGroupsIndex(spark, tmp, full,
      col("media_id") % 10 =!= 0)
    val baseline = collapsed(tmp, full)
    assert(baseline.exists(r => r._2 == 1L && r._5 == 2L),
      s"the shared hash must fold to (rep 1, n 2): $baseline")
    assert(collapsed(tmp, inc) == baseline, "append must equal rebuild")

    // physical fold: compaction leaves one row per hash, same answers
    Multimodal.compactPhashGroupsIndex(spark, inc)
    assert(collapsed(tmp, inc) == baseline, "compaction must not change answers")
    // one row per (band, hash) — each hash legitimately spans all
    // four band partitions
    val dupRows = spark.read.parquet(s"$inc/groups")
      .groupBy(col("band"), col("phash")).count()
      .filter(col("count") > 1).count()
    assert(dupRows == 0, "compaction must leave one row per (band, hash)")
  }
}
