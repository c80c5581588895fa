// Skip-ratio probe for the clustered layout: builds the z-order and
// linear layouts for an sf dir's events and prints files-kept/total
// for the combined, user-only, and ts-only boxes, plus box row counts.
// Run: sbt "runMain graft.tools.LayoutProbe /root/testdata/sf0.1"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.ClusteredLayout

object LayoutProbe {
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
    import spark.implicits._

    val ev = graft.Tables.events(spark, sf).select($"event_id", $"user_id",
      $"event_type", $"value", expr("unix_micros(ts) div 1000").as("ts_ms"))
    val (mnU, mxU, mnT, mxT) = ev.agg(min($"user_id"), max($"user_id"),
      min($"ts_ms"), max($"ts_ms")).as[(Long, Long, Long, Long)].head()
    val base = java.nio.file.Files.createTempDirectory("layoutprobe").toString

    for ((name, zo) <- Seq("zorder" -> true, "linear" -> false)) {
      val dir = s"$base/$name"
      val t0 = System.nanoTime()
      ClusteredLayout.writeClustered(ev, dir, "user_id", "ts_ms", zorder = zo)
      val buildS = (System.nanoTime() - t0) / 1e9
      def cut(r1: (Long, Long), r2: (Long, Long)): String = {
        val (k, t) = ClusteredLayout.selectFiles(spark, dir, r1, r2)
        s"${k.size}/$t"
      }
      val rows = ClusteredLayout.scanBox(spark, dir, "user_id", "ts_ms",
        ClusteredLayout.BoxUsers, ClusteredLayout.BoxTsMs).count()
      println(f"$name%7s build=$buildS%.2fs rows=$rows " +
        s"both=${cut(ClusteredLayout.BoxUsers, ClusteredLayout.BoxTsMs)} " +
        s"userOnly=${cut(ClusteredLayout.BoxUsers, (mnT, mxT))} " +
        s"tsOnly=${cut((mnU, mxU), ClusteredLayout.BoxTsMs)}")
      if (zo) {
        val t1 = System.nanoTime()
        ClusteredLayout.buildBloomSidecar(spark, dir, "event_id")
        val bloomS = (System.nanoTime() - t1) / 1e9
        val (kPresent, tot) = ClusteredLayout.selectFilesByKey(spark, dir,
          ClusteredLayout.LookupIds)
        val (kAbsent, _) = ClusteredLayout.selectFilesByKey(spark, dir,
          Seq(987654321L))
        println(f"  bloom build=$bloomS%.2fs " +
          s"lookup(${ClusteredLayout.LookupIds.length} ids)=${kPresent.size}/$tot " +
          s"absent=${kAbsent.size}/$tot")
      }
    }
    spark.stop()
  }
}
