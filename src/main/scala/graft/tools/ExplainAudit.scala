// Plan audit: run with `sbt "Test/runMain graft.tools.ExplainAudit"`.
// Checks each headline query's physical plan for the properties the
// 100 TB design depends on: parquet filter pushdown + column pruning,
// broadcast joins for dims, whole-stage codegen coverage.
package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val interesting = args.drop(1) match {
      case Array() => Seq("q1_agg", "q2_filter_scan", "q3_join_agg", "q6_topk",
        "q13_join_chain", "dedup_ngram_jaccard", "sim_topk_bruteforce", "mm_meta")
      case rest => rest.toSeq
    }
    interesting.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
      val s = plan.toString
      def has(p: String) = s.contains(p)
      println(s"== $name")
      println(s"  PushedFilters: ${if (has("PushedFilters: [")) extract(s, "PushedFilters: ") else "-"}")
      println(s"  ReadSchema:    ${if (has("ReadSchema")) extract(s, "ReadSchema: ") else "-"}")
      println(s"  broadcast=${s.split('\n').count(_.contains("BroadcastHashJoin"))}" +
        s" smj=${s.split('\n').count(_.contains("SortMergeJoin"))}" +
        s" bnlj=${s.split('\n').count(_.contains("BroadcastNestedLoopJoin"))}" +
        s" exchanges=${s.split('\n').count(_.contains("Exchange"))}" +
        s" wscg=${s.split('\n').count(_.trim.startsWith("*("))}")
    }
    spark.stop()
  }

  private def extract(s: String, key: String): String =
    s.split('\n').filter(_.contains(key)).map(_.trim.take(140)).distinct.mkString(" | ")
}
