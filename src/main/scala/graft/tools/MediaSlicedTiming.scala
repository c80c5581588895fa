// Same-process A/B timing for the media pair build forms, with a
// transient-disk sampler (the r18 sliced-build measurement harness
// applied to the media family). Usage:
//   sbt "runMain graft.tools.MediaSlicedTiming <sfDir> [mono|sliced|both] [passes]"
// Prints per-form wall seconds, output row count, and the minimum
// free bytes observed on the output filesystem during each build
// (peak transient = free-before − min-free).
package graft.tools

import org.apache.spark.sql.SparkSession

object MediaSlicedTiming {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = if (args.length > 1) args(1) else "both"
    val passes = if (args.length > 2) args(2).toInt else 0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tmpRoot = java.nio.file.Files.createTempDirectory("mediapairs_ab")
    @volatile var minFree = Long.MaxValue
    @volatile var sampling = false
    val sampler = new Thread(() => {
      val f = tmpRoot.toFile
      while (sampling) {
        minFree = math.min(minFree, f.getUsableSpace)
        Thread.sleep(500)
      }
    })

    def timed(label: String)(f: String => Unit): Unit = {
      val out = tmpRoot.resolve(label).toString
      val freeBefore = tmpRoot.toFile.getUsableSpace
      minFree = Long.MaxValue
      System.gc()
      val t0 = System.nanoTime()
      f(out)
      val secs = (System.nanoTime() - t0) / 1e9
      val rows = spark.read.parquet(out).count()
      println(f"[media-ab] $label: $secs%.1f s, $rows rows, " +
        f"peak transient ${(freeBefore - minFree) / 1e9}%.1f GB " +
        f"(min free ${minFree / 1e9}%.1f GB)")
    }

    sampling = true
    sampler.start()
    try {
      if (mode == "mono" || mode == "both")
        timed("mono")(out =>
          graft.operators.Multimodal.writeMediaPairs(spark, sf, out))
      if (mode == "sliced" || mode == "both")
        timed("sliced")(out =>
          graft.operators.Multimodal.writeMediaPairsSliced(spark, sf, out,
            passes))
    } finally {
      sampling = false
      spark.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(tmpRoot.toFile)
    }
  }
}
