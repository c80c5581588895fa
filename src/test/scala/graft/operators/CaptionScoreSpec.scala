package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Cross-modal pair curation (`mm_caption_score`) — the CLIP-filter
  * contract: one row per (media, caption) pair sharing an id, scores
  * are exact rounded cosines between the decode-seam signature and
  * the caption embedding, the mismatch flag is the threshold gate,
  * and zero-norm rows on either side never produce a row (no cosine
  * exists). Value parity vs DuckDB is the oracle's job; this spec
  * pins the join semantics and the driver-free plan.
  */
class CaptionScoreSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("one row per nonzero pair; exact cosine; threshold flag consistent") {
    import spark.implicits._
    val rows = Multimodal.queries("mm_caption_score")(spark, sf)
      .as[(Long, Double, Long)].collect()
    assert(rows.nonEmpty)
    // exactly the id intersection of nonzero-signature media and
    // nonzero-norm captions, one row each
    val sigIds = Multimodal.signaturesWith(
        spark, Multimodal.mediaRelation(spark, sf), Multimodal.FakeDecoder)
      .select($"vec_id").as[Long].collect().toSet
    val capIds = graft.Tables.embeddings(spark, sf)
      .select($"vec_id").as[Long].collect().toSet
    assert(rows.map(_._1).toSet == (sigIds & capIds))
    assert(rows.map(_._1).distinct.length == rows.length, "duplicate pair rows")
    // scores are cosines; the flag is exactly the threshold gate
    assert(rows.forall { case (_, s, _) => s >= -1.0001 && s <= 1.0001 })
    assert(rows.forall { case (_, s, m) =>
      m == (if (s < Multimodal.CaptionKeepThreshold) 1L else 0L) })
    // both classes present on the fixture (the threshold is chosen to
    // split it — a one-sided fixture would leave the gate untested)
    assert(rows.exists(_._3 == 1L) && rows.exists(_._3 == 0L))
    // recompute a sample of scores exactly from the raw inputs
    val sigs = Multimodal.signaturesWith(
        spark, Multimodal.mediaRelation(spark, sf), Multimodal.FakeDecoder)
      .as[(Long, Array[Float], Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val caps = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap
    rows.take(25).foreach { case (id, s, _) =>
      val (sig, snrm) = sigs(id)
      val cap = caps(id)
      var dot = 0.0
      var enrm = 0.0
      var i = 0
      while (i < sig.length) {
        dot += sig(i).toDouble * cap(i).toDouble
        enrm += cap(i).toDouble * cap(i).toDouble
        i += 1
      }
      val want = BigDecimal(dot / snrm / math.sqrt(enrm))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(want == s, s"pair $id: $want != $s")
    }
  }

  test("pipe_mm_pair_curate composes its three gates exactly") {
    import spark.implicits._
    val kept = Multimodal.queries("pipe_mm_pair_curate")(spark, sf)
      .as[(Long, Double, Long)].collect()
    assert(kept.nonEmpty)
    val scores = Multimodal.queries("mm_caption_score")(spark, sf)
      .as[(Long, Double, Long)].collect()
    val matched = scores.filter(_._3 == 0L).map(r => r._1 -> r._2).toMap
    val bigEnough = Multimodal.mediaRelation(spark, sf)
      .filter(col("meta.n_bytes") >= Multimodal.CurateMinBytes)
      .select($"media_id").as[Long].collect().toSet
    val dups = Multimodal.queries("dedup_media_cluster")(spark, sf)
      .filter($"media_id" =!= $"rep_id")
      .select($"media_id").as[Long].collect().toSet
    val expect = (matched.keySet & bigEnough) -- dups
    assert(kept.map(_._1).toSet == expect,
      s"pipeline membership diverged: missing ${(expect -- kept.map(_._1).toSet).take(3)}")
    assert(kept.forall { case (id, s, n) =>
      matched(id) == s && n >= Multimodal.CurateMinBytes })
    // each gate bites on the fixture — a pipeline whose stages are
    // all no-ops wouldn't be testing the composition
    assert(kept.length < scores.count(_._3 == 0L),
      "size/dup gates removed nothing — fixture too weak")
    assert(scores.exists(_._3 == 1L), "caption gate removed nothing")
  }

  test("plan: one equi-join, no cartesian, no driver collect") {
    val df = Multimodal.queries("mm_caption_score")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"pair scoring must stay an equi-join:\n$p")
  }
}
