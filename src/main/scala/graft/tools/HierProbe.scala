package graft.tools

import graft.plans.IvfKernels
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Measurement harness for the hierarchical coarse quantizer (r13
  * verdict item 5): on the ISOTROPIC test fixture the ⌈√k⌉ super-cell
  * prune never fires (every group's δ ≈ 75–80°, every bound ≈ 1), so
  * the ~√k·w scanned-members claim rested on the bit-identity spec
  * alone. This probe builds the corpus shape the claim is ABOUT — a
  * mixture of Gaussians, the clustered geometry of real embedding
  * corpora — trains centroids with the kernel conventions (spherical
  * k-means, max-dot assignment, lowest-index tiebreak), and measures
  * scanned members + wall time for the flat scan vs the hierarchy on
  * the SAME shipped kernel ([[IvfKernels.nearestCells]] with
  * hier=null vs built), asserting bit-identical outputs as it goes.
  *
  * Driver-side, no SparkSession: the unit under measurement is the
  * per-row kernel, and the distributed wrapper adds nothing to the
  * scanned-member count. Deterministic (fixed seed); run with
  * `sbt "runMain graft.tools.HierProbe [sigma ...]"`.
  */
object HierProbe {
  def main(args: Array[String]): Unit = {
    val sigmas = if (args.nonEmpty) args.map(_.toDouble).toSeq
      else Seq(0.15, 0.3, 0.6, 1.0) // tight topics → isotropic limit
    val d = 64
    val k = 448 // the sf10 cell count (√n sizing at 200k rows)
    val topics = 32
    val nRows = 20000
    val n = 1 // assignment cardinality (ivf_build's shape)
    sigmas.foreach { sigma =>
      val rnd = new scala.util.Random(41)
      val centers = Array.fill(topics, d)(rnd.nextGaussian())
      def sample(): Array[Float] = {
        val t = centers(rnd.nextInt(topics))
        Array.tabulate(d)(i => (t(i) + sigma * rnd.nextGaussian()).toFloat)
      }
      // train k centroids on a sample with the trainer conventions:
      // init = first k distinct samples, 5 Lloyd iterations, max-dot
      // assignment, mean-then-renormalize — enough to land centroids
      // in the clustered geometry the probe is about
      val train = Array.fill(4096)(sample())
      var cents = Array.tabulate(k)(c => train(c % train.length).clone())
      (0 until 5).foreach { _ =>
        val sums = Array.ofDim[Double](k, d)
        val counts = new Array[Int](k)
        train.foreach { v =>
          var best = 0; var bestDot = Double.MinValue
          var c = 0
          while (c < k) {
            var dot = 0.0; var i = 0
            while (i < d) { dot += v(i).toDouble * cents(c)(i); i += 1 }
            if (dot > bestDot) { bestDot = dot; best = c }
            c += 1
          }
          var i = 0
          while (i < d) { sums(best)(i) += v(i); i += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(k) { c =>
          if (counts(c) == 0) cents(c)
          else Array.tabulate(d)(i => (sums(c)(i) / counts(c)).toFloat)
        }
      }
      val withNorm = cents.zipWithIndex.map { case (cv, c) =>
        val nn = math.sqrt(cv.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
        (c.toLong, cv, if (nn == 0) 1.0 else nn)
      }
      val hier = IvfKernels.buildHier(withNorm)
      require(hier != null, s"k=$k below HierMinCells?")
      val rows = Array.fill(nRows)(sample())

      def run(h: IvfKernels.Hier): (Long, Long, Seq[Seq[Long]]) = {
        IvfKernels.scannedMembers.reset()
        IvfKernels.countScans = true
        val t0 = System.nanoTime()
        val out = rows.map(r => IvfKernels
          .nearestCells(new GenericArrayData(r), withNorm, h, n)
          .toLongArray().toSeq)
        val dt = System.nanoTime() - t0
        IvfKernels.countScans = false
        (IvfKernels.scannedMembers.sum(), dt / 1000000, out.toSeq)
      }
      val (flatScans, flatMs, flatOut) = run(null)
      val (hierScans, hierMs, hierOut) = run(hier)
      require(flatOut == hierOut, "hier/flat output drift — bound broken")
      println(f"sigma=$sigma%.2f k=$k rows=$nRows " +
        f"flat: $flatScans%d scans ($flatMs%d ms)  " +
        f"hier: $hierScans%d scans ($hierMs%d ms)  " +
        f"members/row ${hierScans.toDouble / nRows}%.1f vs $k%d " +
        f"(${100.0 * hierScans / flatScans}%.1f%%)")
    }
  }
}
