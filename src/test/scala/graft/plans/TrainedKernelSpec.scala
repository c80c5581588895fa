package graft.plans

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Unit pins for the round-12 native kernels that carry TRAINED or
  * SIZED state (PqAdc, NearestCells, PcaProject, the adaptive
  * LshBuckets): each is compared against a reference reimplementation
  * of the exact Scala-UDF logic it replaced, on seeded random inputs
  * plus the edge that motivated each contract (short vectors → zero
  * padding, empty vector → NaN similarity ordering, ties → lowest id).
  * The end-to-end form is the oracle sweep (all declared queries
  * hash-exact on every fixture); these fail closer to the cause.
  */
class TrainedKernelSpec extends AnyFunSuite {

  private def fa(xs: Float*): GenericArrayData = new GenericArrayData(xs.toArray)

  private val rnd = new scala.util.Random(7)

  test("adaptivePlanes: integer-exact occupancy sizing with both clamps") {
    import Similarity.{adaptivePlanes, MinPlanes, MaxPlanes, TargetBucketRows}
    assert(TargetBucketRows == 32)
    // degenerate and tiny corpora sit at the min clamp
    assert(adaptivePlanes(0) == MinPlanes)
    assert(adaptivePlanes(1) == MinPlanes)
    // exact power-of-two boundaries: 2^p * 32 >= n is integer compare,
    // no float log to round the wrong way at the edge
    assert(adaptivePlanes(128) == 2)   // 4 * 32 == 128 exactly
    assert(adaptivePlanes(129) == 3)
    assert(adaptivePlanes(2000) == 6)  // the sf0.1 corpus: old hand sizing
    assert(adaptivePlanes(2048) == 6)  // 64 * 32 == 2048 exactly
    assert(adaptivePlanes(2049) == 7)
    assert(adaptivePlanes(20000) == 10) // the sf1 fixture
    assert(adaptivePlanes(500) == 4)   // sf0.01/sf0.001
    // max clamp: beyond 32 * 2^24 vectors occupancy grows again
    assert(adaptivePlanes(Long.MaxValue) == MaxPlanes)
    assert(adaptivePlanes((TargetBucketRows.toLong << MaxPlanes) + 1) == MaxPlanes)
  }

  test("LshBuckets: plane-count slicing is prefix-consistent") {
    val emb = fa(Array.fill(64)(rnd.nextGaussian().toFloat): _*)
    val p6 = LshKernels.buckets(emb, 6).toLongArray()
    val p10 = LshKernels.buckets(emb, 10).toLongArray()
    assert(p6.length == Similarity.NumTables && p10.length == Similarity.NumTables)
    p6.indices.foreach { t =>
      val b6 = p6(t) & 0xffffffffL
      val b10 = p10(t) & 0xffffffffL
      // the first 6 sign bits are the same planes — a 10-plane bucket
      // masked to 6 bits IS the 6-plane bucket
      assert((b10 & 0x3f) == b6, s"table $t prefix drift")
      assert((b6 >> 6) == 0, s"table $t has bits beyond its plane count")
    }
  }

  test("PqAdc kernel matches the replaced UDF arithmetic, incl. short vectors") {
    val cb = Array.fill(8, 16, 8)(rnd.nextGaussian().toFloat)
    def reference(q: Array[Float], codes: Array[Int]): Double = {
      var total = 0.0
      var sub = 0
      while (sub < 8) {
        val cw = cb(sub)(codes(sub))
        val off = sub * 8
        var partial = 0.0
        var i = 0
        while (i < 8) {
          val x = if (off + i < q.length) q(off + i).toDouble else 0.0
          partial += x * cw(i).toDouble
          i += 1
        }
        total += partial
        sub += 1
      }
      total
    }
    (0 until 50).foreach { _ =>
      val len = Seq(64, 64, 64, 30, 0)(rnd.nextInt(5)) // mostly full, some short
      val q = Array.fill(len)(rnd.nextGaussian().toFloat)
      val codes = Array.fill(8)(rnd.nextInt(16))
      val got = PqKernels.adc(new GenericArrayData(q),
        new GenericArrayData(codes), cb)
      val want = reference(q, codes)
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(want), s"ADC drift: $got != $want")
    }
  }

  test("NearestCells matches the replaced sortBy order, incl. NaN and ties") {
    def reference(cents: Array[(Long, Array[Float], Double)],
        emb: Array[Float], n: Int): Seq[Long] = {
      val nv = math.sqrt(emb.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
      cents.map { case (cid, cv, cn) =>
        var dot = 0.0; var i = 0
        val m = math.min(emb.length, cv.length)
        while (i < m) { dot += emb(i).toDouble * cv(i).toDouble; i += 1 }
        (cid, dot / nv / cn)
      }.sortBy { case (cid, sim) => (-sim, cid) }.take(n).map(_._1).toSeq
    }
    val cents = Array.tabulate(23) { c =>
      val cv = Array.fill(64)(rnd.nextGaussian().toFloat)
      val cn = math.sqrt(cv.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
      (c.toLong, cv, if (cn == 0) 1.0 else cn)
    }
    (0 until 30).foreach { _ =>
      val emb = Array.fill(64)(rnd.nextGaussian().toFloat)
      val got = IvfKernels.nearestCells(new GenericArrayData(emb), cents, IvfKernels.buildHier(cents), 4)
        .toLongArray().toSeq
      assert(got == reference(cents, emb, 4))
    }
    // empty vector: norm 0 → every sim NaN → order falls to cid asc,
    // under Double TOTAL order (NaN sorts last in the negated-asc key)
    val gotEmpty = IvfKernels
      .nearestCells(new GenericArrayData(Array.emptyFloatArray), cents, IvfKernels.buildHier(cents), 3)
      .toLongArray().toSeq
    assert(gotEmpty == reference(cents, Array.emptyFloatArray, 3))
    assert(gotEmpty == Seq(0L, 1L, 2L))
    // exact tie (duplicate centroids) → lowest centroid id wins
    val dup = Array(
      (5L, cents(0)._2, cents(0)._3),
      (2L, cents(0)._2, cents(0)._3),
      (9L, cents(1)._2, cents(1)._3))
    val embT = Array.fill(64)(rnd.nextGaussian().toFloat)
    val gotTie = IvfKernels.nearestCells(new GenericArrayData(embT), dup, IvfKernels.buildHier(dup), 2)
      .toLongArray().toSeq
    assert(gotTie == reference(dup, embT, 2))
    // the duplicate-centroid tie resolves to the lower cid: 2 ranks
    // before 5 in the full ordering
    val full = IvfKernels.nearestCells(new GenericArrayData(embT), dup, IvfKernels.buildHier(dup), 3)
      .toLongArray().toSeq
    assert(full.indexOf(2L) < full.indexOf(5L))
  }

  test("hierarchical NearestCells is bit-identical to the flat scan at every width") {
    // the r12-verdict item-1 contract: the two-level coarse quantizer
    // may only PRUNE groups that cannot rank, never change the answer
    // — same cells, same order, ties / NaN / zero-norm included. The
    // flat reference is the kernel itself with hier = null (the
    // sub-threshold dispatch), so the equality is over the exact
    // shipped code paths.
    def mk(k: Int, clustered: Boolean): Array[(Long, Array[Float], Double)] = {
      val topics = Array.fill(12, 64)(rnd.nextGaussian().toFloat)
      Array.tabulate(k) { c =>
        val cv =
          if (clustered) {
            val t = topics(c % 12)
            Array.tabulate(64)(i => t(i) + 0.15f * rnd.nextGaussian().toFloat)
          } else Array.fill(64)(rnd.nextGaussian().toFloat)
        val cn = math.sqrt(cv.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
        (c.toLong, cv, if (cn == 0) 1.0 else cn)
      }
    }
    for (clustered <- Seq(true, false); k <- Seq(64, 200)) {
      val cents = mk(k, clustered)
      // duplicate-centroid ties straddling group boundaries
      cents(k - 1) = (cents(k - 1)._1, cents(3)._2, cents(3)._3)
      val hier = IvfKernels.buildHier(cents)
      assert(hier != null, s"k=$k must build a hierarchy")
      var pruned = false
      for (n <- Seq(1, 4, 16); trial <- 0 until 40) {
        val emb = trial match {
          case 0 => new Array[Float](64) // zero norm → all-NaN sims
          case 1 => Array.fill(30)(rnd.nextGaussian().toFloat) // short → flat fallback
          case 2 => cents(7)._2.clone() // exactly on a centroid
          case _ => Array.fill(64)(rnd.nextGaussian().toFloat)
        }
        val flat = IvfKernels
          .nearestCells(new GenericArrayData(emb), cents, null, n)
          .toLongArray().toSeq
        val viaHier = IvfKernels
          .nearestCells(new GenericArrayData(emb), cents, hier, n)
          .toLongArray().toSeq
        assert(viaHier == flat,
          s"hier/flat drift at k=$k n=$n clustered=$clustered trial=$trial: " +
            s"$viaHier != $flat")
        pruned = true
      }
      assert(pruned)
    }
  }

  test("NearestCells bound clamps to 1 when the query is inside a group's cone") {
    // The r13-ADVICE counterexample, pinned as a directed geometry:
    // cos(θ−δ) is only an upper bound on member cosine when θ ≥ δ.
    // With the query INSIDE a wide group's radius (θ < δ) a member can
    // be coincident with it (cosine 1 > cos(δ−θ)), so the unclamped
    // bound pruned the group holding the true nearest centroid. Built
    // in the plane of the first two coordinates: group 0 = {A at 10°,
    // B at 80°} off s0 = 0° (δ0 = 80°), group 1 = {C at 40°} with
    // s1 = C (δ1 = 0). Query = A: true best is A (sim 1), but the
    // unclamped group-0 bound cos(10°−80°) ≈ 0.342 ranks below C's
    // sim cos(30°) ≈ 0.866, so group 0 was pruned after C was found.
    val d = 64
    def unit(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      val v = new Array[Float](d)
      v(0) = math.cos(r).toFloat
      v(1) = math.sin(r).toFloat
      v
    }
    def withNorm(cid: Long, cv: Array[Float]): (Long, Array[Float], Double) = {
      val cn = math.sqrt(cv.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
      (cid, cv, cn)
    }
    val cents = Array(
      withNorm(0L, unit(10)),  // A — group 0
      withNorm(1L, unit(80)),  // B — group 0 (widens δ0 to 80°)
      withNorm(2L, unit(40)))  // C — group 1, its own super-centroid
    val s0 = Array.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
    val s1 = cents(2)._2.map(_.toDouble)
    val d0 = math.toRadians(80)
    val hier = new IvfKernels.Hier(
      Array(s0, s1),
      Array(Array(0, 1), Array(2)),
      Array(math.cos(d0), 1.0),
      Array(math.sin(d0), 0.0))
    val query = cents(0)._2.clone() // coincident with member A, θ0 = 10° < δ0
    val flat = IvfKernels
      .nearestCells(new GenericArrayData(query), cents, null, 1)
      .toLongArray().toSeq
    assert(flat == Seq(0L), "flat scan must rank A first")
    val viaHier = IvfKernels
      .nearestCells(new GenericArrayData(query), cents, hier, 1)
      .toLongArray().toSeq
    assert(viaHier == flat,
      s"inside-cone query pruned the true nearest group: $viaHier != $flat")
  }

  test("PcaProject matches the replaced centered-dot UDF, incl. short vectors") {
    val mean = Array.fill(64)(rnd.nextGaussian())
    val comps = Array.fill(16, 64)(rnd.nextGaussian())
    def reference(emb: Array[Float]): Array[Double] = {
      val n = math.min(emb.length, 64)
      Array.tabulate(16) { c =>
        var acc = 0.0; var i = 0
        while (i < n) { acc += (emb(i).toDouble - mean(i)) * comps(c)(i); i += 1 }
        acc
      }
    }
    (0 until 30).foreach { _ =>
      val len = Seq(64, 64, 10, 0)(rnd.nextInt(4))
      val emb = Array.fill(len)(rnd.nextGaussian().toFloat)
      val got = PcaKernels.project(new GenericArrayData(emb), mean, comps, 64)
        .toDoubleArray().toSeq
      val want = reference(emb).toSeq
      assert(got.map(java.lang.Double.doubleToLongBits) ==
        want.map(java.lang.Double.doubleToLongBits))
    }
  }
}
