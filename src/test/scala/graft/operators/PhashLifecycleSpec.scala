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

  test("collapsed takedown: rep re-election, count decrement, delete ≡ rebuild over survivors") {
    import spark.implicits._
    // local fixture: 1, 2, 4 share hash A; 3 is hash B; the probe
    // batch has 10 ≡ A and 20 ≡ B — so every re-election step is
    // predictable
    val a = (0 until 60).map(i => s"alpha$i beta${i * 3} gm$i").mkString(" ")
    val b = (0 until 60).map(i => s"delta$i zeta${i * 5} qq$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("phtake").toString
    Seq((1L, a), (2L, a), (3L, b), (4L, a), (5L, a), (10L, a), (20L, b))
      .toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"),
        lit("spec").as("source"), length($"text").cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def rebuildOver(pred: org.apache.spark.sql.Column): Set[(Long, Long, Int, Long, Long)] = {
      val fresh = s"$tmp/fresh_${java.util.UUID.randomUUID().toString.take(6)}"
      Multimodal.writePhashGroupsIndex(spark, tmp, fresh, pred)
      collapsed(tmp, fresh)
    }
    val dir = s"$tmp/gdel"
    Multimodal.writePhashGroupsIndex(spark, tmp, dir,
      col("media_id").isin(1L, 2L, 3L, 4L))
    val base = collapsed(tmp, dir)
    assert(base.exists(r => r._2 == 1L && r._5 == 3L),
      s"fixture: hash A must fold to (rep 1, n 3): $base")
    // delete the stored REP of hash A: the index must name a
    // SURVIVING representative (2) and decrement n — exactly the
    // rebuild over survivors
    Multimodal.deleteFromPhashGroupsIndex(spark, dir, Seq(1L).toDF("media_id"))
    val afterRep = collapsed(tmp, dir)
    assert(afterRep.exists(r => r._2 == 2L && r._5 == 2L),
      s"rep re-election must name the min SURVIVING member: $afterRep")
    assert(!afterRep.exists(r => r._2 == 1L),
      "a deleted media must never be named as a representative")
    assert(afterRep == rebuildOver(col("media_id").isin(2L, 3L, 4L)),
      "delete must equal the rebuild over survivors")
    // delete the remaining carriers: the hash-A group vanishes
    Multimodal.deleteFromPhashGroupsIndex(spark, dir,
      Seq(2L, 4L).toDF("media_id"))
    val afterAll = collapsed(tmp, dir)
    assert(afterAll == rebuildOver(col("media_id") === 3L),
      "a group whose every member is deleted must stop answering")
    // idempotent re-delete (the crash-retry path)
    Multimodal.deleteFromPhashGroupsIndex(spark, dir, Seq(2L).toDF("media_id"))
    assert(collapsed(tmp, dir) == afterAll, "re-delete must be a no-op")
    // append AFTER the deletes: the new carrier answers with itself
    // as rep — the post-delete fold still equals the rebuild
    Multimodal.appendToPhashGroupsIndex(spark, tmp, dir,
      col("media_id") === 5L)
    val afterApp = collapsed(tmp, dir)
    assert(afterApp == rebuildOver(col("media_id").isin(3L, 5L)),
      "append onto a deleted-from index must equal the rebuild")
    // compaction: answers unchanged, tombstones retired, members purged
    Multimodal.compactPhashGroupsIndex(spark, dir)
    assert(collapsed(tmp, dir) == afterApp,
      "compaction must not change answers")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/_graft_member_tombstones")), "compaction retires tombstones")
    assert(spark.read.parquet(s"$dir/members")
      .filter(col("media_id").isin(1L, 2L, 4L)).count() == 0,
      "compaction must purge tombstoned members physically")
    // crash-window heal: the writer lands members BEFORE groups, so a
    // crash between the two leaves members AHEAD — the batch is
    // invisible to probes (stale, never corrupt) and compaction heals
    // FORWARD to the full state (it rebuilds groups from the
    // authoritative membership). Simulate the window by appending a
    // batch's members rows without its groups rows.
    val healDir = s"$tmp/gheal"
    Multimodal.writePhashGroupsIndex(spark, tmp, healDir,
      col("media_id").isin(1L, 3L))
    val preHeal = collapsed(tmp, healDir)
    val ph2 = Multimodal.queries("mm_phash")(spark, tmp)
      .filter(col("media_id") === 2L)
      .select(col("phash")).collect().head.getLong(0)
    Seq((ph2, 2L))
      .toDF("phash", "media_id")
      .select(col("phash"), col("media_id"),
        pmod(xxhash64(col("phash")),
          lit(Multimodal.PhashMembersBuckets.toLong)).cast("int").as("mbkt"))
      .write.mode("append").partitionBy("mbkt")
      .parquet(s"$healDir/members")
    assert(collapsed(tmp, healDir) == preHeal,
      "the crash window leaves probes STALE (batch invisible), never corrupt")
    Multimodal.compactPhashGroupsIndex(spark, healDir)
    assert(collapsed(tmp, healDir) ==
      rebuildOver(col("media_id").isin(1L, 2L, 3L)),
      "compaction must heal the members-ahead crash window forward")

    // a pre-sidecar (legacy) layout refuses the takedown loudly
    val legacy = s"$tmp/glegacy"
    Multimodal.writePhashGroupsIndex(spark, tmp, legacy,
      col("media_id") === 3L)
    fs.delete(new org.apache.hadoop.fs.Path(s"$legacy/members"), true)
    val e = intercept[IllegalArgumentException] {
      Multimodal.deleteFromPhashGroupsIndex(spark, legacy,
        Seq(3L).toDF("media_id"))
    }
    assert(e.getMessage.contains("members sidecar"), e.getMessage)

    // ...and refuses an APPEND just as loudly: appending would seed a
    // batch-only members sidecar, and the next compaction — which
    // treats members as authoritative — would rebuild groups from it
    // and silently drop every pre-sidecar group (data loss, not
    // staleness; the r17 advice item)
    val ea = intercept[IllegalArgumentException] {
      Multimodal.appendToPhashGroupsIndex(spark, tmp, legacy,
        col("media_id") === 5L)
    }
    assert(ea.getMessage.contains("members sidecar"), ea.getMessage)
    assert(collapsed(tmp, legacy) == rebuildOver(col("media_id") === 3L),
      "the refused append must leave the legacy layout untouched")
  }

  test("empty takedown batch is a no-op (no tombstone append, no groups rewrite)") {
    import spark.implicits._
    val tmp = fixture()
    val dir = s"$tmp/gempty"
    Multimodal.writePhashGroupsIndex(spark, tmp, dir,
      col("media_id") % 10 =!= 0)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def groupFiles(): Set[String] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$dir/groups"), true)
      val buf = scala.collection.mutable.Set.empty[String]
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile) buf += s"${f.getPath}@${f.getModificationTime}"
      }
      buf.toSet
    }
    val before = groupFiles()
    val baseline = collapsed(tmp, dir)
    // a streamed takedown feed fires triggers with no matching media;
    // each must cost nothing — not a distinct-hash-sized rewrite
    Multimodal.deleteFromPhashGroupsIndex(spark, dir,
      Seq.empty[Long].toDF("media_id"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/_graft_member_tombstones")),
      "an empty batch must not append a tombstone file")
    assert(groupFiles() == before,
      "an empty batch must not rewrite the groups relation")
    assert(collapsed(tmp, dir) == baseline)
  }
}
