package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Output-invariance pins for the round-13 coarse-stage rework: the
  * broadcast-matrix scan (Similarity.coarseScanTopC), the
  * per-partition winnow (winnowTopPerKey), and the PQ ADC LUT scan
  * must reproduce EXACTLY what the replaced join + rank-window
  * formulation produced — same candidate sets, bit-identical scores.
  * The reference formulations are rebuilt inline here (they no longer
  * exist in src), so a regression in the kernels can't hide behind a
  * shared implementation.
  */
class CoarseScanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("coarseScanTopC equals the replaced window-over-join coarse pass (JL and PCA)") {
    import spark.implicits._
    import graft.functions.VectorFunctions
    for (idx <- Seq(Similarity.projIndex(spark, sf), Pca.pcaIndex(spark, sf))) {
      val prj = idx.select($"vec_id", $"pv".cast("array<double>").as("pv"), $"pn")
      val qProj = prj.filter($"vec_id" % Similarity.QueryStride === 0)
        .select($"vec_id".as("q_id"), $"pv".as("q_pv"), $"pn".as("q_pn"))
      val reference = broadcast(qProj)
        .join(prj, $"q_id" =!= $"vec_id")
        .select($"q_id", $"vec_id".as("n_id"),
          VectorFunctions.cosineFrom(
            VectorFunctions.dot($"q_pv", $"pv"), $"q_pn", $"pn").as("proj_sim"))
        .withColumn("crank", row_number().over(
          Window.partitionBy($"q_id").orderBy($"proj_sim".desc, $"n_id".asc)))
        .filter($"crank" <= Similarity.ProjCandidates)
        .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
      val got = Similarity.coarseScanTopC(spark, sf, idx, Similarity.ProjCandidates)
        .withColumn("crank", row_number().over(
          Window.partitionBy($"q_id").orderBy($"proj_sim".desc, $"n_id".asc)))
        .filter($"crank" <= Similarity.ProjCandidates)
        .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
      assert(got == reference,
        s"coarse candidate drift: missing ${(reference -- got).take(5)}, " +
          s"extra ${(got -- reference).take(5)}")
      assert(reference.nonEmpty)
    }
  }

  test("winnowTopPerKey keeps a superset of every global top-k, scores untouched") {
    import spark.implicits._
    // adversarial scores: duplicates, NaN, infinities, negatives —
    // the comparator edge cases of Spark's DESC total order
    val rows = (for {
      q <- 0L until 7L
      i <- 0L until 400L
    } yield (q, i, (i % 13 match {
      case 0 => Double.NaN
      case 1 => Double.PositiveInfinity
      case 2 => Double.NegativeInfinity
      case _ => math.sin(q * 400 + i.toDouble)
    }))).toSeq
    val df = spark.createDataset(rows).toDF("q_id", "n_id", "s").repartition(5)
    val w = Window.partitionBy($"q_id").orderBy($"s".desc, $"n_id".asc)
    def topk(src: org.apache.spark.sql.DataFrame) = src
      .withColumn("r", row_number().over(w)).filter($"r" <= 10)
      .select($"q_id", $"n_id", $"s")
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2, java.lang.Double.doubleToLongBits(t._3))).toSet
    assert(topk(Similarity.winnowTopPerKey(df, 10)) == topk(df))
  }

  test("PQ LUT scan scores are bit-identical to the PqAdc kernel per (query, row)") {
    import spark.implicits._
    val idx = Pq.pqIndex(spark, sf)
    val cb = idx.codebooks
    val qRows = graft.Tables.embeddings(spark, sf)
      .filter($"vec_id" % Similarity.QueryStride === 0)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val codes = idx.codes.select($"vec_id", $"codes")
      .as[(Long, Array[Int])].collect()
    qRows.foreach { case (_, q) =>
      // LUT construction exactly as pqProbe builds it
      var off = 0
      val lut = cb.map { sub =>
        val row = sub.map { cw =>
          var partial = 0.0
          var i = 0
          while (i < cw.length) {
            if (off + i < q.length)
              partial += q(off + i).toDouble * cw(i).toDouble
            i += 1
          }
          partial
        }
        off += sub(0).length
        row
      }
      codes.take(50).foreach { case (_, cs) =>
        var total = 0.0
        var sub = 0
        while (sub < lut.length) { total += lut(sub)(cs(sub)); sub += 1 }
        val viaKernel = graft.plans.PqKernels.adc(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(q),
          new org.apache.spark.sql.catalyst.util.GenericArrayData(cs), cb)
        assert(java.lang.Double.doubleToLongBits(total) ==
          java.lang.Double.doubleToLongBits(viaKernel),
          s"ADC drift: $total != $viaKernel")
      }
    }
  }
}
