package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The versioned LSH root's manifest-pointer cutover (r17 verdict
  * item 5): probes resolve `_graft_current` once and read an
  * immutable version directory, compaction builds a new version and
  * repoints atomically — so a reader concurrent with compaction never
  * sees the in-place swap's missing-directory window. Pinned here by
  * actually racing a probe loop against repeated compactions.
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
}
