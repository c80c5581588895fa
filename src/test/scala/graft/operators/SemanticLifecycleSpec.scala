package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The semantic-dedup stored lifecycle (r16 verdict item 3): the
  * coarse quantizer is trained on the HISTORICAL corpus and frozen as
  * a stored index; the nightly batch is assigned to the frozen cells
  * and deduped against stored cell members only (new×old); takedown
  * is the shared ANN tombstone mechanism — erasing a stored vector's
  * tombstone-visible row stops it SUPPRESSING new content from the
  * next probe (the sole-suppressor round trip pins non-vacuity
  * deterministically, independent of which fixture ids happen to
  * collide at the driver SFs).
  */
class SemanticLifecycleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Dim = Similarity.Dim

  private def vec(hot: Int, v: Float = 1.0f): Seq[Float] =
    (0 until Dim).map(i => if (i == hot) v else 0.0f)

  /** Corpus: historical 1 ≈ batch 10 (sole suppressor, cos 1.0),
    * historical 3 ⊥ everything, batch 20 ⊥ everything (always kept).
    * Ids follow the declared slices: % IncrementalMod == 0 is the
    * batch, the rest historical.
    */
  private def fixture(): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("semlife").toString
    Seq(
      (1L, vec(0), 0),
      (3L, vec(1), 0),
      (7L, vec(2), 0),
      (10L, vec(0, 0.5f), 1),
      (20L, vec(3), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  private def kept(tmp: String, dir: String): Set[Long] = {
    import spark.implicits._
    Dedup.incrementalSemanticKept(spark, tmp, dir, Dedup.SemanticThreshold)
      .as[Long].collect().toSet
  }

  test("frozen cells: batch suppressed by stored cell-mates; erasure flips it back") {
    val tmp = fixture()
    val dir = s"$tmp/semidx"
    Dedup.writeSemanticIndex(spark, tmp, dir)
    // the stored index holds the HISTORICAL slice only
    val storedIds = spark.read.parquet(s"$dir/assignments")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(storedIds == Set(1L, 3L, 7L),
      s"the frozen index must hold the historical slice only: $storedIds")
    // batch 10 is cosine-1.0 with stored 1 (same direction, different
    // norm) — suppressed; 20 is orthogonal to everything — kept
    assert(kept(tmp, dir) == Set(20L),
      "a batch vector with a stored cell-mate within threshold is dropped")
    // the sole-suppressor erasure round trip: delete 1, re-probe —
    // 10 joins the kept set immediately (non-vacuity by construction)
    Similarity.deleteFromIndex(spark, dir, {
      import spark.implicits._
      Seq(1L).toDF("vec_id")
    })
    assert(kept(tmp, dir) == Set(10L, 20L),
      "erasing the sole suppressor must readmit the batch vector")
    // physical purge changes no answer and retires the tombstones
    Similarity.compactIvfIndex(spark, dir)
    assert(kept(tmp, dir) == Set(10L, 20L),
      "compaction must not change the kept set")
    assert(spark.read.parquet(s"$dir/assignments")
      .filter(col("vec_id") === 1L).count() == 0,
      "compaction must purge the tombstoned assignment physically")
  }

  test("the quantizer is FROZEN: a batch assigned through the stored centroids, not retrained") {
    val tmp = fixture()
    val dir = s"$tmp/semidx2"
    Dedup.writeSemanticIndex(spark, tmp, dir)
    val preCents = spark.read.parquet(s"$dir/centroids")
      .select(col("cell"), col("centroid")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    // probing twice (and after a delete) never rewrites the trained
    // state — the steady-state probe reads, it does not train
    kept(tmp, dir)
    Similarity.deleteFromIndex(spark, dir, {
      import spark.implicits._
      Seq(3L).toDF("vec_id")
    })
    kept(tmp, dir)
    val postCents = spark.read.parquet(s"$dir/centroids")
      .select(col("cell"), col("centroid")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    assert(postCents == preCents,
      "probes and deletes must never touch the frozen quantizer")
  }
}
