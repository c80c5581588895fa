package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** txt_distinct_kmv — the KMV sketch's estimator and algebra: accuracy
  * against the exact distinct count, the exact small-sketch branch,
  * and the union property the TOTAL scope is read from.
  */
class KmvSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def result() = {
    import spark.implicits._
    TextAnalysis.queries("txt_distinct_kmv")(spark, sf)
      .as[(String, Int, java.lang.Long, Double)].collect()
      .map { case (scope, k, kth, est) => scope -> ((k, kth, est)) }.toMap
  }

  /** Exact distinct 63-bit shingle hashes, per source — the ground
    * truth the estimator approximates, and the raw stream the merge
    * test recomputes sketches from.
    */
  private def exactSets(): Map[String, Set[Long]] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.Tables.documents(spark, sf)
      .select($"source", explode(Dedup.shingleHashes($"text")).as("h64"))
      .select($"source", ($"h64".bitwiseAND(lit(Long.MaxValue))).as("h"))
      .as[(String, Long)].collect()
      .groupBy(_._1).map { case (s, rows) => s -> rows.map(_._2).toSet }
  }

  test("estimate lands within the sketch's error class of the exact count") {
    val exact = exactSets()
    val res = result()
    val exactTotal = exact.values.flatten.toSet.size
    val estTotal = res("*")._3
    info(f"total: exact=$exactTotal est=$estTotal%.1f " +
      f"(err ${(estTotal - exactTotal) / exactTotal * 100}%.1f%%)")
    // 1/sqrt(1024) ~ 3.1% sigma; 15% is ~5 sigma on the fixed corpus
    assert(math.abs(estTotal - exactTotal) <= 0.15 * exactTotal)
    exact.foreach { case (src, set) =>
      val (_, _, est) = res(src)
      assert(math.abs(est - set.size) <= math.max(0.15 * set.size, 1.0),
        s"$src: exact=${set.size} est=$est")
    }
  }

  test("a sketch that never filled reports the exact count") {
    val exact = exactSets()
    val res = result()
    res.foreach { case (scope, (kUsed, _, est)) =>
      if (kUsed < TextAnalysis.KmvK) {
        val truth = if (scope == "*") exact.values.flatten.toSet.size
          else exact(scope).size
        assert(kUsed == truth && est == truth.toDouble,
          s"$scope: k_used=$kUsed est=$est exact=$truth")
      }
    }
  }

  test("TOTAL scope equals the sketch of the union (KMV merge property)") {
    val exact = exactSets()
    val res = result()
    val k = TextAnalysis.KmvK
    // ground-truth global sketch: k smallest distinct hashes overall
    val globalSketch = exact.values.flatten.toSet.toSeq.sorted.take(k)
    val (kUsed, kth, _) = res("*")
    assert(kUsed == math.min(k, globalSketch.size))
    assert(kth.longValue == globalSketch.last,
      s"total kth ${kth} != ground truth ${globalSketch.last}")
    // and the same holds per source (each scope IS a KMV sketch)
    exact.foreach { case (src, set) =>
      val sk = set.toSeq.sorted.take(k)
      assert(res(src)._2.longValue == sk.last, s"$src kth mismatch")
    }
  }
}
