package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** OPQ-P — the permutation contract: a bijection of the dims, derived
  * from corpus variances by the serpentine deal, and actually
  * balancing per-subspace variance vs plain consecutive slicing.
  * Value correctness (codes + probe) is the dynamic oracle's job.
  */
class OpqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def exactVars(): Array[Double] = {
    import spark.implicits._
    val rows = graft.Tables.embeddings(spark, sf)
      .select($"embedding").as[Array[Float]].collect()
    val dim = Similarity.Dim
    Array.tabulate(dim) { i =>
      val xs = rows.map(v => if (i < v.length) v(i).toDouble else 0.0)
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
  }

  test("permutation is a bijection following the serpentine variance deal") {
    val perm = Pq.opqIndex(spark, sf).perm
    assert(perm.length == Similarity.Dim && perm.toSet == (0 until Similarity.Dim).toSet,
      "perm is not a bijection of the dims")
    // reconstruct the expected deal from exact variances (driver-side
    // double arithmetic; the fixture has no variance near-ties, so the
    // ranking is stable against summation-order differences)
    val vars = exactVars()
    val ranked = (0 until Similarity.Dim).sortBy(i => (-vars(i), i))
    val nSub = Pq.PqSubvectors
    val slots = Array.fill(nSub)(scala.collection.mutable.ArrayBuffer.empty[Int])
    ranked.zipWithIndex.foreach { case (d, r) =>
      val (block, pos) = (r / nSub, r % nSub)
      slots(if (block % 2 == 0) pos else nSub - 1 - pos) += d
    }
    assert(perm.toSeq == slots.flatMap(_.iterator).toSeq,
      "trained permutation diverged from the serpentine variance deal")
  }

  test("per-subspace variance is more balanced than consecutive slicing") {
    val vars = exactVars()
    val perm = Pq.opqIndex(spark, sf).perm
    def ratio(assign: Int => Int): Double = {
      val sums = new Array[Double](Pq.PqSubvectors)
      (0 until Similarity.Dim).foreach(j => sums(j / Pq.SubDim) += vars(assign(j)))
      sums.max / sums.min
    }
    val opq = ratio(j => perm(j))
    val plain = ratio(identity)
    info(f"variance-sum max/min: opq=$opq%.4f plain=$plain%.4f")
    assert(opq <= plain + 1e-12,
      s"serpentine deal did not balance variance: $opq > $plain")
  }

  test("probe contract: k rows per query, no self-neighbors, exact-cosine ranked") {
    import spark.implicits._
    val res = Pq.queries("sim_ann_opq")(spark, sf)
      .as[(Long, Long, Double, Int)].collect()
    assert(res.nonEmpty)
    res.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length == Similarity.TopK, s"query $q: ${rows.length} rows")
      assert(!rows.exists(_._2 == q), s"query $q returned itself")
      val byRank = rows.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"query $q: cosines not rank-ordered")
    }
  }
}
