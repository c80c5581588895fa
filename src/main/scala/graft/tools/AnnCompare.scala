// Cross-family ANN audit: every declared ANN probe on the SAME corpus
// and query set, measured on two axes — recall@k against brute-force
// truth, and steady-state probe wall time (builds paid separately,
// printed for context). The table this prints is the artifact NOTES
// records; it is how a deployment picks a family (and how we know the
// residual encoding actually buys fidelity, not just a spec claim).
// Run with `sbt "runMain graft.tools.AnnCompare [sfDir]"`.
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object AnnCompare {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    import graft.operators.{Pca, Pq, Similarity, Sq}

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select($"q_id", $"n_id").as[(Long, Long)].collect().toSet

    def timed[T](f: => T): (T, Double) = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    graft.SparkEntry.queries("q1_agg")(spark, sf).count() // warm up

    // truth: exact top-k (the same contract every probe re-ranks to)
    val (truth, tBrute) = timed(pairs(
      Similarity.queries("sim_topk_bruteforce")(spark, sf)))
    require(truth.nonEmpty, s"empty brute-force truth at $sf")

    // pay every build once, OUTSIDE the probe timings
    val (_, bIvf) = timed(Similarity.ivfIndex(spark, sf))
    val (_, bPq) = timed { Pq.pqIndex(spark, sf).codes.count() }
    val (_, bRes) = timed { Pq.resPqIndex(spark, sf).codes.count() }
    val (_, bSq) = timed { Sq.sqIndex(spark, sf).codes.count() }
    println(f"[build] brute(truth)=$tBrute%.2f ivf=$bIvf%.2f pq=$bPq%.2f " +
      f"res=$bRes%.2f sq=$bSq%.2f s (lsh/proj/pca build inside first probe)")

    val probes: Seq[(String, () => DataFrame)] = Seq(
      "sim_ann_ivf" -> (() => Similarity.queries("sim_ann_ivf")(spark, sf)),
      "sim_ann_lsh" -> (() => Similarity.queries("sim_ann_lsh")(spark, sf)),
      "sim_ann_proj" -> (() => Similarity.queries("sim_ann_proj")(spark, sf)),
      "sim_ann_pca" -> (() => Pca.queries("sim_ann_pca")(spark, sf)),
      "sim_ann_pq" -> (() => Pq.queries("sim_ann_pq")(spark, sf)),
      "sim_ann_opq" -> (() => Pq.queries("sim_ann_opq")(spark, sf)),
      "sim_ann_ivfpq" -> (() => Pq.queries("sim_ann_ivfpq")(spark, sf)),
      "sim_ann_ivfpq_res" -> (() => Pq.queries("sim_ann_ivfpq_res")(spark, sf)),
      "sim_ann_bq" -> (() => graft.operators.Bq.queries("sim_ann_bq")(spark, sf)),
      "sim_ann_sq" -> (() => Sq.queries("sim_ann_sq")(spark, sf)),
      "sim_ann_ivfsq" -> (() => Sq.queries("sim_ann_ivfsq")(spark, sf)))

    println(f"family           recall@${Similarity.TopK}  warm-probe-s  (|truth|=${truth.size})")
    probes.foreach { case (name, q) =>
      val (_, cold) = timed(pairs(q()))      // first call may pay a build
      val (got, warm) = timed(pairs(q()))    // steady state
      val recall = (truth & got).size.toDouble / truth.size
      println(f"$name%-17s $recall%8.3f    $warm%8.2f   (first ${cold}%.2f)")
    }

    // C-sweep for the coarse-projection probes: is the recall dilution
    // the constant budget C failing to cover a neighborhood that GREW
    // (the duplicated-copy fixture property), or the projection itself?
    Seq(100, 400, 1600).foreach { c =>
      val (gp, tp) = timed(pairs(Similarity.topkProjected(spark, sf,
        candidates = c)))
      val rp = (truth & gp).size.toDouble / truth.size
      println(f"[csweep] sim_ann_proj C=$c%-5d recall=$rp%.3f warm=$tp%.2f s")
    }
    spark.stop()
  }
}
