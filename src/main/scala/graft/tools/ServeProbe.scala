// Serving-latency curve for the stored-index probe entry points
// (topkLshStoredFor / topkIvfStoredFor) — the measurement behind
// VecStream's scale claim: a micro-batch of B live queries should pay
// for ITS buckets/cells, so per-trigger latency tracks B (plus a
// fixed open-the-index cost), not corpus size. Probes batch sizes
// 1/10/100/1000 against indexes built at two corpus decades; each
// cell is the median of 3 timed runs in a fresh session (the
// ProfStored convention: nothing cached, planes/centroids re-read per
// call exactly as a serving trigger would).
// Run with `sbt "runMain graft.tools.ServeProbe [sfDir ...]"`.
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

object ServeProbe {
  def main(args: Array[String]): Unit = {
    val sfs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity

    for (sf <- sfs) {
      val dir = java.nio.file.Files.createTempDirectory("serveprobe").toString
      Similarity.writeLshIndex(spark, sf, s"$dir/lsh")
      Similarity.writeIvfIndex(spark, sf, s"$dir/ivf")
      val s2 = spark.newSession()
      val n = graft.Tables.embeddings(s2, sf).count()

      def queriesOf(b: Int): DataFrame = {
        import s2.implicits._
        graft.Tables.embeddings(s2, sf)
          .orderBy($"vec_id").limit(b)
          .select($"vec_id".as("q_id"), $"embedding".as("q_emb"),
            graft.functions.VectorFunctions.norm($"embedding").as("q_nrm"))
      }

      def median3(run: () => Long): (Double, Long) = {
        var rows = 0L
        val ts = (1 to 3).map { _ =>
          System.gc()
          val t0 = System.nanoTime()
          rows = run()
          (System.nanoTime() - t0) / 1e9
        }
        (ts.sorted.apply(1), rows)
      }

      for (b <- Seq(1, 10, 100, 1000)) {
        val q = queriesOf(b)
        val (lsh, lr) = median3(() =>
          Similarity.topkLshStoredFor(s2, q, s"$dir/lsh").count())
        val (ivf, ir) = median3(() =>
          Similarity.topkIvfStoredFor(s2, q, s"$dir/ivf").count())
        println(f"[serve] n=$n%-8d B=$b%-5d lsh=$lsh%6.2f s ($lr%5d rows)  " +
          f"ivf=$ivf%6.2f s ($ir%5d rows)")
      }
    }
    spark.stop()
  }
}
