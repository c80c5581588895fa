package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The versioned index root's manifest-pointer cutover (r17 verdict
  * item 5): probes resolve `_graft_current` once and read an
  * immutable version directory, compaction builds a new version and
  * repoints atomically — so a reader concurrent with compaction never
  * sees the in-place swap's missing-directory window. Pinned here by
  * actually racing a probe loop against repeated compactions, on
  * BOTH template instantiations (LSH, and IVF — whose in-place
  * compactor performs two sequential swaps that can expose
  * assignments and occupancy out of step to a racing reader).
  */
class LshVersionedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def probe(root: String): Set[(Long, Long)] = {
    import spark.implicits._
    Similarity.topkLshVersioned(spark, sf, root)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
  }

  test("versioned build/compact/delete answer exactly like the plain stored index") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("lshver").toString
    val root = s"$tmp/root"
    Similarity.writeLshIndexVersioned(spark, sf, root)
    val plain = s"$tmp/plain"
    Similarity.writeLshIndex(spark, sf, plain)
    val expected = Similarity.topkLshStored(spark, sf, plain)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    assert(probe(root) == expected, "versioned probe must equal the stored one")

    // compaction changes WHICH directory serves, never what it answers
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def versions(): Set[String] = fs.listStatus(
        new org.apache.hadoop.fs.Path(root))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v_"))
      .map(_.getPath.getName).toSet
    val v0 = versions()
    Similarity.compactLshIndexVersioned(spark, root)
    assert(probe(root) == expected, "compaction must not change answers")
    assert(versions() != v0 || versions().size > 1,
      "compaction must have produced a new version")
    // tombstones apply to the live version and survive the cutover
    // physically purged (the compact rewrite folds them)
    val someVec = expected.head._2
    Similarity.deleteFromIndexVersioned(spark, root,
      Seq(someVec).toDF("vec_id"))
    val afterDel = probe(root)
    assert(!afterDel.exists(_._2 == someVec),
      "a tombstoned vector must stop answering on the live version")
    Similarity.compactLshIndexVersioned(spark, root)
    assert(probe(root) == afterDel,
      "compacting the tombstones must not change answers")
    // retention horizon: repeated compactions keep live + 2 retired
    Similarity.compactLshIndexVersioned(spark, root)
    Similarity.compactLshIndexVersioned(spark, root)
    assert(versions().size <= 3,
      s"retention must bound version count: ${versions()}")
  }

  test("probes race concurrent compactions with zero failures and stable answers") {
    val tmp = java.nio.file.Files.createTempDirectory("lshverrace").toString
    val root = s"$tmp/root"
    Similarity.writeLshIndexVersioned(spark, sf, root)
    val expected = probe(root)
    assert(expected.nonEmpty)
    @volatile var failure: Option[Throwable] = None
    @volatile var reads = 0
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      try {
        while (!stop.get()) {
          val got = probe(root)
          if (got != expected)
            throw new AssertionError(
              s"concurrent probe diverged: ${(got diff expected).take(3)}")
          reads += 1
        }
      } catch { case t: Throwable => failure = Some(t) }
    }, "lsh-versioned-reader")
    reader.start()
    try {
      // three full compaction cutovers while the reader loops — under
      // the in-place swap this window transiently 404s the directory;
      // under the versioned root every resolve serves a live snapshot
      for (_ <- 0 until 3) Similarity.compactLshIndexVersioned(spark, root)
    } finally {
      stop.set(true)
      reader.join(120000)
    }
    assert(failure.isEmpty,
      s"concurrent reader failed: ${failure.map(_.toString).getOrElse("")}")
    assert(reads >= 1, "the race must have exercised at least one read")
    assert(probe(root) == expected)
  }

  private def probeIvf(root: String): Set[(Long, Long)] = {
    import spark.implicits._
    Similarity.topkIvfVersioned(spark, sf, root)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
  }

  test("IVF instantiation: versioned build/compact/delete equal the plain stored index") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ivfver").toString
    val root = s"$tmp/root"
    Similarity.writeIvfIndexVersioned(spark, sf, root)
    val plain = s"$tmp/plain"
    Similarity.writeIvfIndex(spark, sf, plain)
    val expected = Similarity.topkIvfStored(spark, sf, plain)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    assert(probeIvf(root) == expected)
    Similarity.compactIvfIndexVersioned(spark, root)
    assert(probeIvf(root) == expected, "cutover compaction must not change answers")
    // the shared tombstone mechanism routes to the live version, and
    // the next cutover folds it physically WITH occupancy refreshed
    // in the same atomic flip
    val someVec = expected.head._2
    Similarity.deleteFromIndexVersioned(spark, root, Seq(someVec).toDF("vec_id"))
    val afterDel = probeIvf(root)
    assert(!afterDel.exists(_._2 == someVec))
    Similarity.compactIvfIndexVersioned(spark, root)
    assert(probeIvf(root) == afterDel)
    val live = Similarity.resolveCurrentVersion(spark, root)
    assert(spark.read.parquet(s"$live/assignments")
      .filter($"vec_id" === someVec).count() == 0,
      "the cutover compaction must purge tombstoned rows physically")
    // occupancy equals the folded row counts — the pair the in-place
    // compactor exposes out of step mid-maintenance
    val occ = spark.read.parquet(s"$live/centroids")
      .select($"cell", $"occupancy").as[(Long, Long)].collect().toMap
    val rows = spark.read.parquet(s"$live/assignments")
      .groupBy($"cell").count().as[(Long, Long)].collect().toMap
    assert(rows.forall { case (c, n) => occ.getOrElse(c, 0L) == n },
      s"occupancy out of step with folded assignments: $occ vs $rows")
  }

  test("IVF probes race concurrent cutover compactions") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfverrace").toString
    val root = s"$tmp/root"
    Similarity.writeIvfIndexVersioned(spark, sf, root)
    val expected = probeIvf(root)
    assert(expected.nonEmpty)
    @volatile var failure: Option[Throwable] = None
    @volatile var reads = 0
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      try {
        while (!stop.get()) {
          val got = probeIvf(root)
          if (got != expected)
            throw new AssertionError(
              s"concurrent IVF probe diverged: ${(got diff expected).take(3)}")
          reads += 1
        }
      } catch { case t: Throwable => failure = Some(t) }
    }, "ivf-versioned-reader")
    reader.start()
    try {
      for (_ <- 0 until 3) Similarity.compactIvfIndexVersioned(spark, root)
    } finally {
      stop.set(true)
      reader.join(120000)
    }
    assert(failure.isEmpty,
      s"concurrent reader failed: ${failure.map(_.toString).getOrElse("")}")
    assert(reads >= 1)
    assert(probeIvf(root) == expected)
  }
}
