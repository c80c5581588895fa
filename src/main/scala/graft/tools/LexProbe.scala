// Probe-only latency for the stored lexical index — the measurement
// behind the bm25 serving claim: once the index is built, a probe
// pays for ITS terms' buckets (partition-pruned scan + matching
// postings), not corpus size, so probe latency across corpus decades
// should grow with the probed terms' posting lists, never with the
// index. The declared stored queries rebuild the index per run (the
// stored convention), so their bench curve is build-dominated; this
// tool separates the two. Median of 3 fresh-session probes per cell.
// Run: sbt "runMain graft.tools.LexProbe /tmp/graft_sf1 /tmp/graft_sf10"
package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Lexical

object LexProbe {
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

    for (sf <- sfs) {
      val dir = java.nio.file.Files.createTempDirectory("lexprobe").toString
      val t0 = System.nanoTime()
      Lexical.writeLexIndex(spark, sf, dir)
      val buildS = (System.nanoTime() - t0) / 1e9
      def med(f: SparkSession => Long): (Double, Long) = {
        val runs = (1 to 3).map { _ =>
          val s2 = spark.newSession()
          val t = System.nanoTime()
          val n = f(s2)
          ((System.nanoTime() - t) / 1e9, n)
        }
        (runs.map(_._1).sorted.apply(1), runs.head._2)
      }
      val (probeS, pn) = med(s2 => Lexical.topkBm25Stored(s2, dir).count())
      val (serveS, sn) = med { s2 =>
        import s2.implicits._
        Lexical.bm25For(s2, dir,
          Lexical.ServeQueries.toDF("query_id", "term")).count()
      }
      println(f"$sf%-22s build=$buildS%7.2fs probe=$probeS%6.2fs ($pn rows) " +
        f"serve4=$serveS%6.2fs ($sn rows)")
    }
    spark.stop()
  }
}
