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

  test("variance-skewed corpus: OPQ recall beats consecutive-slice PQ") {
    import spark.implicits._
    // the corpus OPQ exists for: per-dim variance decays across the
    // dims, so plain PQ's consecutive slices put all the signal in the
    // first subspaces and spend the rest of the code budget on noise;
    // the serpentine deal spreads it. Deterministic LCG vectors.
    val dim = Similarity.Dim
    def lcg(seed: Long): Long = seed * 6364136223846793005L + 1442695040888963407L
    val rows = (0L until 2000L).map { id =>
      var s0 = lcg(id + 7)
      val v = Array.tabulate(dim) { i =>
        s0 = lcg(s0)
        val u = ((s0 >>> 11).toDouble / (1L << 53).toDouble) - 0.5
        (u / (1.0 + i * 0.35)).toFloat // strong variance decay over dims
      }
      (id, v)
    }
    val dir = java.nio.file.Files.createTempDirectory("opqskew").toString
    rows.toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")

    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val truth = Similarity.topkBruteForce(spark, dir)
        .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
      val got = df.select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
      assert(truth.nonEmpty)
      (truth & got).size.toDouble / truth.size
    }
    val rPq = recallOf(Pq.topkPq(spark, dir))
    val rOpq = recallOf(Pq.topkOpq(spark, dir))
    info(f"skewed-corpus recall: pq=$rPq%.3f opq=$rOpq%.3f")
    assert(rOpq >= rPq,
      f"OPQ ($rOpq%.3f) did not beat plain PQ ($rPq%.3f) on the skewed corpus")
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
