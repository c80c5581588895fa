// Probe-ONLY timing for the stored LSH index (the r13 ProfStored
// convention: write once, fresh session, 3 timed probes) — the
// measurement behind verdict item 3's done-criterion: past the
// pushdown cap the batched probe must stay within ~2x the under-cap
// number instead of cliffing onto a full scan-join.
// Run with `sbt "runMain graft.tools.LshProbeBench [sfDir]"`.
package graft.tools

import org.apache.spark.sql.SparkSession

object LshProbeBench {
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
    val dir = java.nio.file.Files.createTempDirectory("lshprobe").toString
    graft.operators.Similarity.writeLshIndex(spark, sf, dir)
    val s2 = spark.newSession()
    (1 to 3).foreach { i =>
      System.gc()
      val t0 = System.nanoTime()
      val n = graft.operators.Similarity.topkLshStored(s2, sf, dir).count()
      println(f"[probe] run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
