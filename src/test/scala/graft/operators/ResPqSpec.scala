package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Residual IVF-PQ ([[Pq.resPqIndex]] / [[Pq.topkIvfPqRes]]): the
  * fidelity contract that justifies the residual encoding (same code
  * budget, strictly lower quantization error than raw PQ — Jégou
  * §IV-B), agreement with the exact-IVF probe, and the structural
  * invariants of the codes relation.
  */
class ResPqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** Mean squared reconstruction error over the corpus for a given
    * decode: the measurable quantity the residual encoding improves.
    */
  private def mse(recon: Map[Long, Array[Double]]): Double = {
    import spark.implicits._
    val corpus = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val total = corpus.map { case (id, v) =>
      val r = recon(id)
      var e = 0.0
      var i = 0
      while (i < r.length) {
        val x = if (v != null && i < v.length) v(i).toDouble else 0.0
        val d = x - r(i)
        e += d * d
        i += 1
      }
      e
    }.sum
    total / corpus.length
  }

  test("residual encoding cuts reconstruction error vs raw PQ at the same code budget") {
    import spark.implicits._
    val raw = Pq.pqIndex(spark, sf)
    val res = Pq.resPqIndex(spark, sf)

    val rawRecon = raw.codes.select($"vec_id", $"codes")
      .as[(Long, Array[Int])].collect().map { case (id, cs) =>
        id -> cs.zipWithIndex.flatMap { case (c, sub) =>
          raw.codebooks(sub)(c).map(_.toDouble) }
      }.toMap
    val resRecon = res.codes.select($"vec_id", $"cell", $"codes")
      .as[(Long, Long, Array[Int])].collect().map { case (id, cell, cs) =>
        val mean = res.means(cell.toInt)
        id -> cs.zipWithIndex.flatMap { case (c, sub) =>
          res.codebooks(sub)(c).zipWithIndex.map { case (w, i) =>
            mean(sub * Pq.SubDim + i) + w.toDouble } }
      }.toMap

    val (mseRaw, mseRes) = (mse(rawRecon), mse(resRecon))
    info(f"reconstruction MSE raw=$mseRaw%.6f residual=$mseRes%.6f " +
      f"(ratio ${mseRes / mseRaw}%.3f)")
    assert(mseRes < mseRaw,
      f"residual MSE $mseRes%.6f should beat raw $mseRaw%.6f")
  }

  test("residual probe agrees with the exact-IVF probe at least as well as raw IVF-PQ") {
    import spark.implicits._
    val exact = Similarity.queries("sim_ann_ivf")(spark, sf)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val raw = Pq.topkIvfPq(spark, sf)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val res = Pq.topkIvfPqRes(spark, sf)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val aRaw = (exact & raw).size.toDouble / exact.size
    val aRes = (exact & res).size.toDouble / exact.size
    info(f"agreement with exact IVF: raw=$aRaw%.3f residual=$aRes%.3f")
    assert(aRes >= 0.9, f"residual agreement $aRes%.3f under the 0.9 floor")
    assert(aRes >= aRaw - 1e-9,
      f"residual agreement $aRes%.3f fell below raw $aRaw%.3f")
  }

  test("codes relation carries the IVF assignment and full-width code arrays") {
    import spark.implicits._
    val res = Pq.resPqIndex(spark, sf)
    val asg = Similarity.ivfIndex(spark, sf).assigned
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toMap
    val rows = res.codes.select($"vec_id", $"cell", $"codes")
      .as[(Long, Long, Array[Int])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, cell, cs) =>
      assert(asg(id) == cell, s"vec $id: codes cell $cell != assigned ${asg(id)}")
      assert(cs.length == Pq.PqSubvectors)
      assert(cs.forall(c => c >= 0 && c < Pq.PqCodewords))
    }
  }
}
