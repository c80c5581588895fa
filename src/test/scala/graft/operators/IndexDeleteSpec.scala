package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The delete half of the stored-index lifecycle: tombstones hide
  * deleted ids from every probe immediately; compaction physically
  * purges them and refreshes metadata; the two states answer
  * identically; deletes are idempotent; and the probes keep their
  * scan pruning through the tombstone anti-join.
  */
class IndexDeleteSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rows(df: org.apache.spark.sql.DataFrame) = {
    import df.sparkSession.implicits._
    df.as[(Long, Long, Double, Int)].collect().toSet
  }

  private def purged(id: Long): Boolean =
    id % Similarity.PurgeMod == Similarity.PurgeRes

  test("purged queries: no deleted id answers, deleted ids still ask") {
    import spark.implicits._
    // purged ids that are ALSO queries exist only once the corpus
    // reaches lcm(QueryStride, PurgeMod)·... — gate the still-ask
    // assertion on the fixture actually containing one
    val askers = graft.Tables.embeddings(spark, sf).select($"vec_id")
      .filter($"vec_id" % Similarity.QueryStride === 0 &&
        $"vec_id" % Similarity.PurgeMod === Similarity.PurgeRes)
      .as[Long].collect().toSet
    Seq("sim_ann_lsh_purged", "sim_ann_ivf_purged").foreach { q =>
      val res = rows(Similarity.queries(q)(spark, sf))
      assert(res.nonEmpty, s"$q returned nothing")
      assert(!res.exists(r => purged(r._2)),
        s"$q surfaced a deleted id as a neighbor")
      if (askers.nonEmpty)
        assert(res.exists(r => askers(r._1)),
          s"$q dropped a deleted id from the ASKER side")
      // if the UNDELETED probe surfaces any purged id, deletion must
      // have changed the answer (at this SF the slice may simply miss
      // every top-k — value equality is the sf0.01 oracle's job)
      val plain = rows(Similarity.queries(
        q.replace("_purged", "_stored"))(spark, sf))
      if (plain.exists(r => purged(r._2)))
        assert(res != plain,
          s"$q equals the undeleted probe — the purge slice did nothing")
    }
  }

  test("LSH: tombstoned probe == compacted probe; compaction purges physically") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lshdel").toString + "/idx"
    Similarity.writeLshIndex(spark, sf, dir)
    val ids = graft.Tables.embeddings(spark, sf).select($"vec_id")
      .filter($"vec_id" % Similarity.PurgeMod === Similarity.PurgeRes)
    Similarity.deleteFromIndex(spark, dir, ids)
    val tombstoned = rows(Similarity.topkLshStored(spark, sf, dir))
    assert(tombstoned.nonEmpty && !tombstoned.exists(r => purged(r._2)))

    Similarity.compactLshIndex(spark, dir)
    assert(rows(Similarity.topkLshStored(spark, sf, dir)) == tombstoned,
      "compaction changed the probe answer")
    // tombstone relation gone with the retired root; rows physically absent
    assert(!new java.io.File(s"$dir/_graft_tombstones").exists)
    val raw = spark.read.parquet(dir).select($"vec_id").as[Long].collect()
    assert(raw.nonEmpty && !raw.exists(purged),
      "compacted layout still holds deleted rows")
  }

  test("IVF: tombstoned probe == compacted probe; occupancy refreshed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivfdel").toString + "/idx"
    Similarity.writeIvfIndex(spark, sf, dir)
    val ids = graft.Tables.embeddings(spark, sf).select($"vec_id")
      .filter($"vec_id" % Similarity.PurgeMod === Similarity.PurgeRes)
    Similarity.deleteFromIndex(spark, dir, ids)
    // idempotency: a takedown feed may re-deliver — listing ids twice
    // must not change anything downstream
    Similarity.deleteFromIndex(spark, dir, ids)
    val tombstoned = rows(Similarity.topkIvfStored(spark, sf, dir))
    assert(tombstoned.nonEmpty && !tombstoned.exists(r => purged(r._2)))

    Similarity.compactIvfIndex(spark, dir)
    // nprobe pricing shifts with the refreshed occupancy; equality is
    // asserted at a PINNED nprobe so it isolates candidate-set parity
    val np = 4
    val again = rows(Similarity.topkIvfStored(spark, sf, dir, nprobe = np))
    // rebuild the tombstoned state on a fresh dir for the pinned-np compare
    val dir2 = java.nio.file.Files.createTempDirectory("ivfdel2").toString + "/idx"
    Similarity.writeIvfIndex(spark, sf, dir2)
    Similarity.deleteFromIndex(spark, dir2, ids)
    assert(again == rows(Similarity.topkIvfStored(spark, sf, dir2, nprobe = np)),
      "compacted and tombstoned probes diverge at a pinned nprobe")

    assert(!new java.io.File(s"$dir/_graft_tombstones").exists)
    val asg = Similarity.readIvfIndex(spark, dir).assigned
    val remaining = asg.select($"vec_id").as[Long].collect()
    assert(remaining.nonEmpty && !remaining.exists(purged))
    // occupancy equals the physical post-purge counts
    val occ = spark.read.parquet(s"$dir/centroids")
      .select($"cell", $"occupancy").as[(Long, Long)].collect().toMap
    val truth = asg.groupBy($"cell").count().as[(Long, Long)].collect().toMap
    assert(occ.filter(_._2 > 0) == truth,
      "compacted occupancy diverged from the physical counts")
  }

  test("code indexes (PQ/SQ/BQ): same tombstone seam, compactCodesIndex purges") {
    import spark.implicits._
    val ids = graft.Tables.embeddings(spark, sf).select($"vec_id")
      .filter($"vec_id" % Similarity.PurgeMod === Similarity.PurgeRes)
    val cases: Seq[(String, String => Unit, String => org.apache.spark.sql.DataFrame, String)] = Seq(
      ("pq", dir => Pq.writePqIndex(spark, sf, dir),
        dir => Pq.topkPqStored(spark, sf, dir), "codes"),
      ("sq", dir => Sq.writeSqIndex(spark, sf, dir),
        dir => Sq.topkSqStored(spark, sf, dir), "codes"),
      ("bq", dir => Bq.writeBqIndex(spark, sf, dir),
        dir => Bq.topkBqStored(spark, sf, dir), "sigs"))
    cases.foreach { case (name, write, probe, sub) =>
      val dir = java.nio.file.Files.createTempDirectory(s"${name}del")
        .toString + "/idx"
      write(dir)
      Similarity.deleteFromIndex(spark, dir, ids)
      val tombstoned = rows(probe(dir))
      assert(tombstoned.nonEmpty && !tombstoned.exists(r => purged(r._2)),
        s"$name: deleted id still served")
      Similarity.compactCodesIndex(spark, dir, sub)
      assert(rows(probe(dir)) == tombstoned,
        s"$name: compaction changed the probe answer")
      assert(!new java.io.File(s"$dir/_graft_tombstones").exists)
      val raw = spark.read.parquet(s"$dir/$sub").select($"vec_id")
        .as[Long].collect()
      assert(raw.nonEmpty && !raw.exists(purged),
        s"$name: compacted layout still holds deleted rows")
    }
  }

  test("purged IVF probe keeps its dynamic cell pruning above the anti-join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivfpd").toString + "/idx"
    Similarity.writeIvfIndex(spark, sf, dir)
    Similarity.deleteFromIndex(spark, dir,
      graft.Tables.embeddings(spark, sf).select($"vec_id")
        .filter($"vec_id" % Similarity.PurgeMod === Similarity.PurgeRes))
    val probe = Similarity.topkIvfStored(spark, sf, dir)
    val scan = probe.queryExecution.executedPlan.toString.split('\n')
      .filter(_.contains("FileScan parquet"))
      .find(_.contains("assignments"))
      .getOrElse(fail("no assignments FileScan in the purged probe plan"))
    val pf = scan.replaceAll(".*PartitionFilters: \\[", "").takeWhile(_ != ']')
    assert(pf.contains("cell") && pf.contains("dynamicpruning"),
      s"purged probe scan lost its partition pruning: $scan")
  }

  test("purged LSH probe keeps its pushed bucket filter above the anti-join") {
    val dir = java.nio.file.Files.createTempDirectory("lshpd").toString + "/idx"
    import spark.implicits._
    Similarity.writeLshIndex(spark, sf, dir)
    Similarity.deleteFromIndex(spark, dir,
      graft.Tables.embeddings(spark, sf).select($"vec_id")
        .filter($"vec_id" % Similarity.PurgeMod === Similarity.PurgeRes))
    val probe = Similarity.topkLshStored(spark, sf, dir)
    val scans = probe.queryExecution.executedPlan.toString.split('\n')
      .filter(_.contains("FileScan parquet"))
    val idxScan = scans.find(s => s.contains("idx") && s.contains("bucket"))
      .getOrElse(fail("no stored-index FileScan in the purged probe plan"))
    assert(idxScan.contains("PushedFilters: [") &&
      idxScan.replaceAll(".*PushedFilters: \\[", "").takeWhile(_ != ']')
        .contains("In(bucket"),
      s"bucket pushdown lost through the tombstone anti-join: $idxScan")
  }
}
