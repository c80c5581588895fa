package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Sq]] — scalar quantization: the reconstruction-error contract,
  * session/stored probe identity, recall sanity against brute force,
  * and the loud-failure contracts for corrupt indexes.
  */
class SqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("quantization error is bounded by half a step per dimension") {
    import spark.implicits._
    val idx = Sq.sqIndex(spark, sf)
    val dl = idx.deltas
    val dec = idx.decodeTable
    val byId = idx.codes.select($"vec_id", $"codes")
      .as[(Long, Array[Byte])].collect().toMap
    val corpus = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
    assert(corpus.nonEmpty)
    corpus.foreach { case (id, v) =>
      val cs = byId(id)
      var d = 0
      while (d < Sq.SqDim) {
        val orig = if (v != null && d < v.length) v(d).toDouble else 0.0
        val decoded = dec(d)(cs(d) & 0xFF)
        // half a quantization step, plus float slack for the
        // round-at-the-boundary case
        assert(math.abs(decoded - orig) <= dl(d) / 2.0 + 1e-9,
          s"vec $id dim $d: orig=$orig decoded=$decoded step=${dl(d)}")
        d += 1
      }
    }
  }

  test("encodeDim clamps and pins the constant-dimension case") {
    assert(Sq.encodeDim(5.0, 5.0, 0.0) == 0)     // mx == mn → code 0
    assert(Sq.encodeDim(0.0, 0.0, 1.0) == 0)
    assert(Sq.encodeDim(255.0, 0.0, 1.0) == 255)
    assert(Sq.encodeDim(-10.0, 0.0, 1.0) == 0)   // below range clamps
    assert(Sq.encodeDim(999.0, 0.0, 1.0) == 255) // above range clamps
    assert(Sq.encodeDim(0.5, 0.0, 1.0) == 1)     // round half up
  }

  test("stored probe is identical to the session probe") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sqspec")
      .toString + "/sq"
    Sq.writeSqIndex(spark, sf, dir)
    val session = Sq.topkSq(spark, sf)
      .as[(Long, Long, Double, Int)].collect().toSet
    val stored = Sq.topkSqStored(spark, sf, dir)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(session.nonEmpty)
    assert(stored == session)
  }

  test("top-k recall vs brute force is high after the exact re-rank") {
    import spark.implicits._
    val bf = Similarity.queries("sim_topk_bruteforce")(spark, sf)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val sq = Sq.topkSq(spark, sf)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    assert(bf.nonEmpty)
    val recall = (bf & sq).size.toDouble / bf.size
    assert(recall >= 0.8, s"recall $recall over ${bf.size} pairs")
  }

  test("ivfsq matches the exact-IVF probe's answers at SQ8 fidelity") {
    import spark.implicits._
    // same probed cells by construction (the shared ivfIndex), so the
    // diff between sim_ann_ivf and sim_ann_ivfsq isolates the SQ
    // coarse cut: at one byte/dim the decode-dot ranking should keep
    // nearly every exact winner inside the top-C survivors
    val ivf = Similarity.queries("sim_ann_ivf")(spark, sf)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val ivfsq = Sq.topkIvfSq(spark, sf)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    val agree = (ivf & ivfsq).size.toDouble / ivf.size
    assert(agree >= 0.9, s"agreement $agree over ${ivf.size} pairs")
    // and the contract shape: at most TopK rows per query
    val perQ = Sq.topkIvfSq(spark, sf).groupBy($"q_id").count()
      .as[(Long, Long)].collect()
    assert(perQ.forall(_._2 <= Similarity.TopK))
  }

  test("decodeDot kernel equals the scan kernel's accumulation") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val idx = Sq.sqIndex(spark, sf)
    val dec = idx.decodeTable
    // a short (zero-padded) query against a full-width codes row: the
    // expression must add q[i]·decoded[i][code] for i < len and skip
    // the padded tail — identical bits to the mapPartitions scan
    val q = Array[Float](0.5f, -1.25f, 2.0f)
    val codes = Array.tabulate[Byte](Sq.SqDim)(i => (i * 3).toByte)
    val got = graft.plans.SqKernels.decodeDot(
      ArrayData.toArrayData(q), codes, dec)
    var want = 0.0
    var i = 0
    while (i < Sq.SqDim) {
      val qv = if (i < q.length) q(i).toDouble else 0.0
      want += qv * dec(i)(codes(i) & 0xFF)
      i += 1
    }
    assert(java.lang.Double.doubleToLongBits(got) ==
      java.lang.Double.doubleToLongBits(want))
    // short codes fail loudly (the corrupt-index contract)
    val e = intercept[IllegalArgumentException] {
      graft.plans.SqKernels.decodeDot(
        ArrayData.toArrayData(q), Array[Byte](1, 2), dec)
    }
    assert(e.getMessage.contains("codes"))
  }

  test("corrupt codes rows fail loudly instead of shrinking candidates") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sqspec")
      .toString + "/sq"
    Sq.writeSqIndex(spark, sf, dir)
    Seq((424242L, Array[Byte](1, 2, 3), 1.0))
      .toDF("vec_id", "codes", "dnrm")
      .write.mode("append").parquet(s"$dir/codes")
    val e = intercept[Exception] {
      Sq.topkSqStored(spark, sf, dir).collect()
    }
    assert(e.getMessage != null)
  }

  test("a params table not covering the dim contract fails loudly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sqspec")
      .toString + "/sq"
    Sq.writeSqIndex(spark, sf, dir)
    // drop a dim from params and rewrite
    val partial = spark.read.parquet(s"$dir/params").filter($"dim" =!= 7)
      .collect()
    spark.createDataFrame(
        spark.sparkContext.parallelize(partial.toSeq),
        spark.read.parquet(s"$dir/params").schema)
      .write.mode("overwrite").parquet(s"$dir/params2")
    val e = intercept[IllegalArgumentException] {
      Sq.readSqIndex(spark,
        { // swap params2 in as params under a fresh dir layout
          val d2 = java.nio.file.Files.createTempDirectory("sqspec")
            .toString + "/sq2"
          spark.read.parquet(s"$dir/params2").write.parquet(s"$d2/params")
          spark.read.parquet(s"$dir/codes").write.parquet(s"$d2/codes")
          d2
        })
    }
    assert(e.getMessage.contains("params"))
  }
}
