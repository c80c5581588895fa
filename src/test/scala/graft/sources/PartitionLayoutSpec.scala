package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout lever #3 (alongside bucketing — BucketedJoinSpec —
  * and AQE skew — AqeSkewSpec): date-partitioned layout for the event
  * stream, the 100 TB time-series staple. A day-scoped query over a
  * `partitionBy("day")` table must prune at the DIRECTORY level —
  * visible as PartitionFilters on the scan (and absent from
  * DataFilters) — so a one-day query reads 1/Nth of the corpus no
  * matter how large the history grows.
  */
class PartitionLayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("day-partitioned events: day filters prune partitions at the scan") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("daypart").toString
    val days = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"event_type",
        (expr("unix_micros(ts) div 1000") / 86400000L).cast("long").as("day"))
    days.write.mode("overwrite").partitionBy("day").parquet(tmp)

    val all = spark.read.parquet(tmp)
    // partition-directory values come back type-inferred (int here)
    val someDay = all.agg(min($"day").cast("long")).head().getLong(0)
    val q = all.filter($"day" === someDay)

    // correctness: partition-pruned result equals the unpartitioned filter
    assert(q.count() == days.filter($"day" === someDay).count())
    assert(q.count() > 0)

    // the day predicate must land in PartitionFilters (directory
    // pruning), not DataFilters (which would scan every file and
    // filter rows after the fact)
    val scan = q.queryExecution.executedPlan.toString.split('\n')
      .find(_.contains("FileScan parquet")).get
    assert(scan.contains("PartitionFilters: [") &&
      scan.replaceAll(".*PartitionFilters: \\[", "").takeWhile(_ != ']')
        .contains("day"), scan)
    val dataFilters = scan.replaceAll(".*DataFilters: \\[", "").takeWhile(_ != ']')
    assert(!dataFilters.contains("day"),
      s"day predicate fell into DataFilters (no pruning): $scan")
  }
}
