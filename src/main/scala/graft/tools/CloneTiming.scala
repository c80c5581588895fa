// Micro A/B for cloneIndexDir strategies on a many-tiny-file stored
// layout. `sbt "runMain graft.tools.CloneTiming [sfDir]"`.
package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Similarity

object CloneTiming {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[clone] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val base = Similarity.writeIvfIndexOnce(spark, sf)
    val conf = spark.sparkContext.hadoopConfiguration
    val srcP = new org.apache.hadoop.fs.Path(base)
    val fs = srcP.getFileSystem(conf)
    val n = fs.listFiles(srcP, true)
    var cnt = 0
    while (n.hasNext) { n.next(); cnt += 1 }
    println(s"[clone] files in src: $cnt")

    // unique workspace per run, dropped at the end (r18 advice: fixed
    // /tmp/clone_* paths raced concurrent runs and leaked leftovers)
    val work = java.nio.file.Files.createTempDirectory("clone_ab")
    try {
      for (round <- 1 to 3) {
        time(s"serial FileUtil.copy (round $round)") {
          val dst = new org.apache.hadoop.fs.Path(s"$work/serial_$round")
          fs.delete(dst, true)
          require(org.apache.hadoop.fs.FileUtil.copy(
            fs, srcP, fs, dst, false, conf))
        }
        time(s"parallel cloneIndexDir (round $round)") {
          Similarity.cloneIndexDir(spark, base, s"$work/par_$round")
        }
        time(s"java.nio walk+copy (round $round)") {
          val srcDir = java.nio.file.Paths.get(base)
          val dstDir = work.resolve(s"nio_$round")
          val st = java.nio.file.Files.walk(srcDir)
          try st.forEach { p =>
            val d = dstDir.resolve(srcDir.relativize(p))
            if (java.nio.file.Files.isDirectory(p))
              java.nio.file.Files.createDirectories(d)
            else java.nio.file.Files.copy(p, d,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          } finally st.close()
        }
      }
    } finally {
      spark.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(work.toFile)
    }
  }
}
