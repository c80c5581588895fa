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

  test("procrustes recovers a known rotation exactly") {
    val dim = Similarity.Dim
    def lcg(seed: Long): Long = seed * 6364136223846793005L + 1442695040888963407L
    // a deterministic dense orthogonal R*: eigenvectors of a fixed
    // random symmetric matrix (Jacobi output columns are orthonormal)
    var s0 = 42L
    val sym = Array.tabulate(dim, dim) { (i, j) => 0.0 }
    for (i <- 0 until dim; j <- i until dim) {
      s0 = lcg(s0)
      val u = ((s0 >>> 11).toDouble / (1L << 53).toDouble) - 0.5
      sym(i)(j) = u; sym(j)(i) = u
    }
    val rStar = Pca.jacobiEigen(sym)._2 // columns orthonormal → matrix orthogonal
    // sample x, pretend the reconstructions are exactly R* x: the
    // Procrustes argmax of tr(RM), M = Σ x (R*x)ᵀ, must be R* itself
    val xs = (0 until 200).map { id =>
      var s1 = lcg(id + 13)
      Array.tabulate(dim) { _ =>
        s1 = lcg(s1)
        ((s1 >>> 11).toDouble / (1L << 53).toDouble) - 0.5
      }
    }
    val m = Array.ofDim[Double](dim, dim)
    xs.foreach { x =>
      val xh = Array.tabulate(dim) { r =>
        var acc = 0.0; var i = 0
        while (i < dim) { acc += rStar(r)(i) * x(i); i += 1 }
        acc
      }
      for (r <- 0 until dim; i <- 0 until dim) m(r)(i) += x(r) * xh(i)
    }
    val rGot = Pq.procrustesRotation(m)
    val dev = (0 until dim).flatMap(a => (0 until dim).map(b =>
      math.abs(rGot(a)(b) - rStar(a)(b)))).max
    assert(dev < 1e-8, f"procrustes missed the known rotation by $dev%.2e")
  }

  test("rotation alternation: orthogonal R, error no worse than the perm init") {
    val (rot, errs) = Pq.trainRotation(spark, sf)
    val dim = Similarity.Dim
    // R orthogonal (the stored-reader contract, checked at train time)
    val dev = (0 until dim).flatMap(a => (0 until dim).map { b =>
      var acc = 0.0; var i = 0
      while (i < dim) { acc += rot(a)(i) * rot(b)(i); i += 1 }
      math.abs(acc - (if (a == b) 1.0 else 0.0))
    }).max
    assert(dev < 1e-9, f"trained R deviates from orthogonal by $dev%.2e")
    info(s"error trace: ${errs.map(e => f"$e%.6f").mkString(" -> ")}")
    // errs(0) is the PERM-INIT quantization error (codebooks trained
    // at R0); the alternation must not end worse than it started
    assert(errs.last <= errs.head * 1.001 + 1e-12,
      s"rotation refinement worsened the error: ${errs.toSeq}")
    // the long trace pins the OpqRotIters horizon: the passes BEYOND
    // it must recover less than half of what the shipped passes got
    val (_, long) = Pq.trainRotation(spark, sf, iters = Pq.OpqRotIters * 2)
    info(s"${Pq.OpqRotIters * 2}-pass trace: " +
      long.map(e => f"$e%.6f").mkString(" -> "))
    val shipped = long(0) - long(Pq.OpqRotIters - 1)
    val tail = long(Pq.OpqRotIters - 1) - long.min
    assert(tail <= math.max(shipped * 0.5, 1e-9),
      s"error still falling after the shipped horizon: ${long.toSeq}")
  }

  test("rotated-anisotropic corpus: the rotation recovers what the permutation can't see") {
    import spark.implicits._
    // the skewed LCG corpus ROTATED by a dense orthogonal Q: per-dim
    // variances become near-uniform, so the variance-ranking
    // permutation is blind (OPQ-P ≈ plain PQ), while the alternation
    // can turn the frame back toward the decaying spectrum. The
    // assertion is on the training objective itself: the refined R's
    // sample quantization error must beat the perm init's.
    val dim = Similarity.Dim
    def lcg(seed: Long): Long = seed * 6364136223846793005L + 1442695040888963407L
    var s0 = 4242L
    val sym = Array.ofDim[Double](dim, dim)
    for (i <- 0 until dim; j <- i until dim) {
      s0 = lcg(s0)
      val u = ((s0 >>> 11).toDouble / (1L << 53).toDouble) - 0.5
      sym(i)(j) = u; sym(j)(i) = u
    }
    val q = Pca.jacobiEigen(sym)._2
    val rows = (0L until 2000L).map { id =>
      var s1 = lcg(id + 7)
      val raw = Array.tabulate(dim) { i =>
        s1 = lcg(s1)
        val u = ((s1 >>> 11).toDouble / (1L << 53).toDouble) - 0.5
        u / (1.0 + i * 0.35)
      }
      val v = Array.tabulate(dim) { r =>
        var acc = 0.0; var i = 0
        while (i < dim) { acc += q(r)(i) * raw(i); i += 1 }
        acc.toFloat
      }
      (id, v)
    }
    val dir = java.nio.file.Files.createTempDirectory("opqrotskew").toString
    rows.toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")
    val (_, errs) = Pq.trainRotation(spark, dir)
    info(s"rotated-corpus error trace: ${errs.map(e => f"$e%.6f").mkString(" -> ")}")
    assert(errs.last < errs.head,
      s"rotation refinement did not improve on the blind permutation: ${errs.toSeq}")
    // and the probe-level effect, logged for NOTES
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val truth = Similarity.topkBruteForce(spark, dir)
        .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
      val got = df.select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
      (truth & got).size.toDouble / truth.size
    }
    val rPerm = recallOf(Pq.topkOpq(spark, dir))
    val rRot = recallOf(Pq.topkOpqRot(spark, dir))
    info(f"rotated-corpus recall: opq-perm=$rPerm%.3f opq-rot=$rRot%.3f")
    assert(rRot >= rPerm - 0.08,
      f"rotation recall ($rRot%.3f) collapsed vs permutation ($rPerm%.3f)")
  }

  test("stored OPQ-R: corrupt rotation table fails loudly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("opqrotbad").toString
    Pq.writeOpqRotIndex(spark, sf, dir)
    // round trip first: the stored probe equals the session probe
    val a = Pq.topkOpqRot(spark, sf).collect().toSeq
    val b = Pq.topkOpqRotStored(spark, sf, dir).collect().toSeq
    assert(a == b)
    // corrupt: scale one row (breaks orthogonality, keeps shape)
    val rot = spark.read.parquet(s"$dir/rot")
    rot.select($"r", org.apache.spark.sql.functions.transform($"vals",
        v => v * 2.0).as("vals"))
      .write.mode("overwrite").parquet(s"$dir/rot_bad")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/rot"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/rot_bad"),
      new org.apache.hadoop.fs.Path(s"$dir/rot"))
    val e = intercept[IllegalArgumentException] {
      Pq.readOpqRotIndex(spark, dir)
    }
    assert(e.getMessage.contains("orthogonal"))
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
