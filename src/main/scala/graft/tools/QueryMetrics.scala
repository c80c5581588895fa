// Host-phase-INDEPENDENT evidence for removed passes: runs declared
// queries with a SparkListener and reports jobs, tasks, input bytes
// read, and shuffle bytes written — deterministic counters that do
// not swing with the sandbox's 2x hypervisor throughput phases the
// way wall seconds do (the r18 measurement caveat). Usage:
//   sbt "runMain graft.tools.QueryMetrics <sfDir> <query> [query ...]"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

object QueryMetrics {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "pass at least one declared query name")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var tasks = 0L
    @volatile var inputBytes = 0L
    @volatile var shuffleWrite = 0L
    @volatile var jobs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        tasks += 1
        Option(te.taskMetrics).foreach { m =>
          inputBytes += m.inputMetrics.bytesRead
          shuffleWrite += m.shuffleWriteMetrics.bytesWritten
        }
      }
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    })

    // warm up + fill session caches the bench order would have filled
    graft.SparkEntry.queries("q1_agg")(spark, sf).count()

    names.foreach { q =>
      // settle listener events from the previous query
      Thread.sleep(500)
      tasks = 0; inputBytes = 0; shuffleWrite = 0; jobs = 0
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sf).count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"[qmetrics] $q: $secs%.2f s, jobs=$jobs, tasks=$tasks, " +
        f"input=${inputBytes / 1e6}%.1f MB, shuffleWrite=${shuffleWrite / 1e6}%.1f MB")
    }
    spark.stop()
  }
}
