// Ad-hoc stage timing for a query's component relations: run with
// `sbt "runMain graft.tools.StageTiming [sfDir]"`. Times each stage of
// the exact-Jaccard pair build separately so optimization effort goes
// where the seconds are.
package graft.tools

import org.apache.spark.sql.SparkSession

object StageTiming {
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
    import spark.implicits._
    import org.apache.spark.sql.functions._

    def time[T](label: String)(f: => T): T = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm up
    graft.SparkEntry.queries("q1_agg")(spark, sf).count()

    val rel = time("shingleRelation build+persist+count") {
      val r = graft.operators.Dedup.shingleRelation(spark, sf)
      r.count(); r
    }
    time("exploded rows count")(rel.select(explode($"sh")).count())
    val buckets = time("groupBy shingle collect_list") {
      rel.select($"doc_id", explode($"sh").as("shingle"))
        .groupBy($"shingle").agg(collect_list($"doc_id").as("ids"))
        .filter(size($"ids") > 1 && size($"ids") <= 1000)
    }
    time("bucket count")(buckets.count())
    time("pair emission + count agg") {
      buckets.select(explode(
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.plans.PackedPairs(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("ids"))))).as("p"))
        .groupBy($"p").agg(count(lit(1))).count()
    }
    time("full jaccardPairs (cached)")(
      graft.operators.Dedup.jaccardPairs(spark, sf).count())
    spark.stop()
  }
}
