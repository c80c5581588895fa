package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants the DuckDB oracle can't state for the PCA family: the
  * eigendecomposition's defining properties, training-path agreement,
  * and the projection/residual algebra against a from-scratch driver
  * recompute.
  */
class PcaSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def corpus(): Array[Array[Float]] = {
    import spark.implicits._
    graft.Tables.embeddings(spark, sf)
      .filter(size($"embedding") >= Similarity.Dim)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1).map(_._2)
  }

  test("trained components are orthonormal, variance-ordered eigenvectors of the covariance") {
    val m = Pca.pcaModel(spark, sf)
    val d = Similarity.Dim
    assert(m.comps.length == Pca.PcaDim && m.comps.forall(_.length == d))
    assert(m.eigvals.length == d)
    // orthonormality
    for (a <- m.comps.indices; b <- a until m.comps.length) {
      val dot = (0 until d).map(i => m.comps(a)(i) * m.comps(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"w($a)·w($b) = $dot")
    }
    // variance-descending, PSD-nonnegative spectrum
    assert(m.eigvals.zip(m.eigvals.tail).forall { case (x, y) => x >= y })
    assert(m.eigvals.forall(_ >= -1e-9))
    // eigen residual against an independently-recomputed population
    // covariance: ||C w − λ w||∞ small relative to λ_max
    val xs = corpus()
    val n = xs.length.toDouble
    val mean = Array.tabulate(d)(i => xs.map(_(i).toDouble).sum / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      xs.map(x => (x(i) - mean(i)) * (x(j) - mean(j))).sum / n)
    val scale = math.max(m.eigvals.head, 1e-12)
    for (c <- m.comps.indices) {
      val w = m.comps(c)
      val cw = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * w(j)).sum)
      val resid = (0 until d).map(i => math.abs(cw(i) - m.eigvals(c) * w(i))).max
      assert(resid / scale < 1e-7, s"eigpair $c residual $resid")
    }
    // the trained mean matches the recompute (one-pass vs two-pass drift)
    for (i <- 0 until d)
      assert(math.abs(m.mean(i) - mean(i)) < 1e-9)
    // total spectrum mass = trace(C)
    val trace = (0 until d).map(i => cov(i)(i)).sum
    assert(math.abs(m.eigvals.sum - trace) / math.max(trace, 1e-12) < 1e-8)
  }

  test("PCA training is deterministic and the distributed path agrees with the driver path") {
    val a = Pca.trainPca(spark, sf)
    val b = Pca.trainPca(spark, sf)
    // driver path is bit-reproducible
    assert(a.mean.sameElements(b.mean))
    assert(a.comps.zip(b.comps).forall { case (x, y) => x.sameElements(y) })
    assert(a.eigvals.sameElements(b.eigvals))
    // the fixture sits under the flops cap (driver path); forcing the
    // distributed accumulation (maxDriverFlops = 0) must agree up to
    // partition-ordered double-addition drift in the SUMS — compare
    // via subspace alignment, not element-wise (a last-ulp covariance
    // change can swap near-degenerate eigenpairs)
    assert(corpus().length.toDouble * Similarity.Dim * Similarity.Dim
      <= Similarity.DriverTrainFlopsCap)
    val dist = Pca.trainPca(spark, sf, maxDriverFlops = 0)
    assert(a.mean.zip(dist.mean).forall { case (x, y) => math.abs(x - y) < 1e-9 })
    assert(a.eigvals.zip(dist.eigvals).forall { case (x, y) =>
      math.abs(x - y) < 1e-8 })
    // every driver-path component lies in the distributed-path span:
    // ||w − Σ_c (w·v_c) v_c|| ≈ 0
    for (w <- a.comps) {
      val proj = Array.fill(Similarity.Dim)(0.0)
      for (v <- dist.comps) {
        val dot = (0 until Similarity.Dim).map(i => w(i) * v(i)).sum
        for (i <- 0 until Similarity.Dim) proj(i) += dot * v(i)
      }
      val resid = math.sqrt(
        (0 until Similarity.Dim).map(i => (w(i) - proj(i)) * (w(i) - proj(i))).sum)
      assert(resid < 1e-6, s"component left the distributed-path span: $resid")
    }
  }

  test("emb_pca / emb_pca_recon match a from-scratch recompute; projection variance = eigenvalue") {
    import spark.implicits._
    val m = Pca.pcaModel(spark, sf)
    val rows = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap
    val pv = Pca.queries("emb_pca")(spark, sf)
      .as[(Long, Int, Double)].collect()
    assert(pv.length == rows.size * Pca.PcaDim)
    val byVec = pv.groupBy(_._1)
    pv.foreach { case (id, c, got) =>
      val x = rows(id)
      val n = math.min(x.length, Similarity.Dim)
      val want = (0 until n).map(i => (x(i).toDouble - m.mean(i)) * m.comps(c)(i)).sum
      assert(math.abs(got - BigDecimal(want).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12, s"vec $id comp $c")
    }
    // population variance of each component's projections ≈ its
    // eigenvalue (exact when the sample is the corpus, as here)
    for (c <- 0 until Pca.PcaDim) {
      val vals = byVec.values.map(_.find(_._2 == c).get._3).toArray
      val mu = vals.sum / vals.length
      val varc = vals.map(v => (v - mu) * (v - mu)).sum / vals.length
      assert(math.abs(varc - m.eigvals(c)) < 1e-4,
        s"comp $c: var $varc vs eig ${m.eigvals(c)}")
    }
    // residuals: nonnegative, and orthonormality identity holds
    val err = Pca.queries("emb_pca_recon")(spark, sf)
      .as[(Long, Double)].collect().toMap
    assert(err.values.forall(_ >= 0.0))
    err.foreach { case (id, e) =>
      val x = rows(id)
      val n = math.min(x.length, Similarity.Dim)
      val ssq = (0 until n).map { i =>
        val v = x(i).toDouble - m.mean(i); v * v
      }.sum
      val pvsq = (0 until Pca.PcaDim).map { c =>
        val p = (0 until n).map(i => (x(i).toDouble - m.mean(i)) * m.comps(c)(i)).sum
        p * p
      }.sum
      val want = math.max(ssq - pvsq, 0.0)
      assert(math.abs(e - want) < 1e-4, s"vec $id recon $e vs $want")
    }
  }

  test("emb_whiten = pv/sqrt(eigval); zero-variance components pin to 0.0, never NaN") {
    import spark.implicits._
    val m = Pca.pcaModel(spark, sf)
    // whitened coordinates match the from-scratch recompute on the
    // real corpus (all eigenvalues positive here → division path)
    val pvRows = Pca.queries("emb_pca")(spark, sf)
      .as[(Long, Int, Double)].collect()
    val wv = Pca.queries("emb_whiten")(spark, sf)
      .as[(Long, Int, Double)].collect().map { case (id, c, v) => (id, c) -> v }.toMap
    assert(wv.size == pvRows.length)
    // recompute from raw embeddings (pvRows are rounded to 6dp, so a
    // recompute from them would double-round; go back to the vectors)
    val rows = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap
    rows.foreach { case (id, x) =>
      val n = math.min(x.length, Similarity.Dim)
      for (c <- 0 until Pca.PcaDim) {
        val p = (0 until n).map(i => (x(i).toDouble - m.mean(i)) * m.comps(c)(i)).sum
        val lam = m.eigvals(c)
        val want = if (lam > 0) p / math.sqrt(lam) else 0.0
        assert(math.abs(wv((id, c)) - BigDecimal(want).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12, s"vec $id comp $c")
      }
    }
    // whitened population variance of every positive-λ component is 1
    val byComp = Pca.queries("emb_whiten")(spark, sf)
      .as[(Long, Int, Double)].collect().groupBy(_._2)
    for (c <- 0 until Pca.PcaDim if m.eigvals(c) > 0) {
      val vals = byComp(c).map(_._3)
      val mu = vals.sum / vals.length
      val varc = vals.map(v => (v - mu) * (v - mu)).sum / vals.length
      assert(math.abs(varc - 1.0) < 1e-3, s"comp $c whitened var $varc")
    }
    // degenerate corpus: rank-2 data → eigenvalues for kept components
    // 2..15 are exactly 0 (the covariance is exactly block-zero there,
    // Jacobi never rotates those planes). Without the λ≤0 pin the
    // kernel would emit 0/√0 = NaN; with it, exactly 0.0.
    val tmp = java.nio.file.Files.createTempDirectory("pcawhiten").toString
    val dim = Similarity.Dim
    val rnd = new scala.util.Random(7)
    (0L until 40L).map { i =>
      val v = new Array[Float](dim)
      v(0) = rnd.nextGaussian().toFloat
      v(1) = rnd.nextGaussian().toFloat
      (i, v)
    }.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val md = Pca.trainPca(spark, tmp)
    assert((2 until Pca.PcaDim).forall(c => md.eigvals(c) <= 0.0),
      "degenerate corpus must have ≤0 eigenvalues in the kept range")
    val wvd = Pca.queries("emb_whiten")(spark, tmp)
      .as[(Long, Int, Double)].collect()
    assert(wvd.forall(r => !r._3.isNaN))
    assert(wvd.filter(_._2 >= 2).forall(_._3 == 0.0),
      "zero-variance components must whiten to exactly 0.0")
    // and the two live components still whiten to unit variance
    val live = wvd.filter(_._2 < 2).groupBy(_._2)
    for ((c, g) <- live) {
      val vals = g.map(_._3)
      val mu = vals.sum / vals.length
      val varc = vals.map(v => (v - mu) * (v - mu)).sum / vals.length
      assert(math.abs(varc - 1.0) < 1e-3, s"degenerate comp $c var $varc")
    }
  }

  test("short and empty vectors follow the min(len, Dim) prefix contract") {
    import spark.implicits._
    // training must ignore the ragged rows; application projects the
    // prefix (the IVF kernel contract), empty → all-zero projections
    // and zero residual
    val tmp = java.nio.file.Files.createTempDirectory("pcashort").toString
    val dim = Similarity.Dim
    val rnd = new scala.util.Random(11)
    val full = (0L until 40L).map(i =>
      (i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val ragged = Seq(
      (100L, Array.fill(3)(1.0f)), // short: 3-term prefix
      (101L, Array.empty[Float]))  // empty: zero terms
    (full ++ ragged).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val m = Pca.trainPca(spark, tmp)
    assert(m.n == 40L) // ragged rows excluded from training
    val pv = Pca.queries("emb_pca")(spark, tmp)
      .as[(Long, Int, Double)].collect().groupBy(_._1)
    assert(pv.keySet.size == 42) // but every row projects
    pv(100L).foreach { case (_, c, got) =>
      val want = (0 until 3).map(i => (1.0 - m.mean(i)) * m.comps(c)(i)).sum
      assert(math.abs(got - BigDecimal(want).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
    assert(pv(101L).forall(_._3 == 0.0))
    val err = Pca.queries("emb_pca_recon")(spark, tmp)
      .as[(Long, Double)].collect().toMap
    assert(err(101L) == 0.0 && err(100L) >= 0.0)
  }

  test("jacobi eigensolver pins a known spectrum") {
    // diag(5,2,1) rotated by a fixed orthogonal matrix must come back
    // with the same eigenvalues and (up to sign) eigenvectors
    val theta = 0.6
    val r = Array(
      Array(math.cos(theta), -math.sin(theta), 0.0),
      Array(math.sin(theta), math.cos(theta), 0.0),
      Array(0.0, 0.0, 1.0))
    val lam = Array(5.0, 2.0, 1.0)
    val a = Array.tabulate(3, 3)((i, j) =>
      (0 until 3).map(k => r(i)(k) * lam(k) * r(j)(k)).sum)
    val (ev, vecs) = Pca.jacobiEigen(a)
    val sorted = ev.sorted(Ordering[Double].reverse)
    assert(sorted.zip(lam).forall { case (x, y) => math.abs(x - y) < 1e-12 })
    // each recovered eigenvector matches a column of r up to sign
    for (k <- 0 until 3) {
      val idx = ev.indexWhere(x => math.abs(x - lam(k)) < 1e-9)
      val v = Array.tabulate(3)(i => vecs(i)(idx))
      val dot = math.abs((0 until 3).map(i => v(i) * r(i)(k)).sum)
      assert(math.abs(dot - 1.0) < 1e-12, s"eigvec $k misaligned: $dot")
    }
  }
}
