package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bucketed-table co-location contract: the recurring
  * content-hash tracking anti-join (the reference's unprocessed-file
  * filter) runs with ZERO exchange when both sides are stored bucketed
  * on the hash — the shuffle moved to write time, amortized over every
  * ingest cycle. Broadcast is disabled for the join so the test proves
  * the BUCKETING eliminated the exchange, not the small fixture.
  */
class BucketedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("bucketed tracking anti-join: no exchange, same result as the shuffled plan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets")
    // shared getOrCreate session: restore the PRIOR threshold, not the
    // Spark default (AqeSkewSpec pattern)
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.getOption(thresholdKey)
    spark.conf.set(thresholdKey, "-1")
    try {
      val docs = graft.Tables.documents(spark, sf)
        .select($"doc_id",
          md5(to_binary($"text", lit("utf-8"))).as("content_fp"))
      // corpus side + an already-processed tracking side (every 3rd doc)
      BucketedTables.writeBucketed(docs, "corpus_fp", "content_fp", 8,
        s"$dir/corpus_fp")
      BucketedTables.writeBucketed(
        docs.filter($"doc_id" % 3 === 0).select($"content_fp").distinct(),
        "tracking_fp", "content_fp", 8, s"$dir/tracking_fp")


      val anti = spark.table("corpus_fp")
        .join(spark.table("tracking_fp"), Seq("content_fp"), "left_anti")
      val p = anti.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed anti-join still shuffles:\n$p")
      assert(p.contains("SortMergeJoin"), p) // broadcast disabled above
      assert(p.contains("Bucketed: true"), s"scan did not use buckets:\n$p")

      // same rows as the plain shuffled anti-join over the raw parquet
      val expected = docs.join(
        docs.filter($"doc_id" % 3 === 0).select($"content_fp").distinct(),
        Seq("content_fp"), "left_anti")
      assert(anti.count() == expected.count())
      assert(anti.select($"doc_id").except(expected.select($"doc_id")).isEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS corpus_fp")
      spark.sql("DROP TABLE IF EXISTS tracking_fp")
      saved match {
        case Some(v) => spark.conf.set(thresholdKey, v)
        case None    => spark.conf.unset(thresholdKey)
      }
      // external-path tables: dropping the catalog entry leaves the
      // files — delete the temp dir too
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
