package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the runtime re-plan half of the skew story (the other half,
  * two-phase salted aggregation, is Skew.saltedAgg): AQE must detect a
  * skewed join partition at runtime and split it — the lever that
  * saves a 100 TB join when one key holds a disproportionate share of
  * the rows and no plan-time salting was applied. Thresholds are
  * lowered to fixture scale; the MECHANISM under test (skew detection
  * + partition splitting in the final adaptive plan) is the same one
  * production-sized thresholds drive.
  */
class AqeSkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("AQE splits the hot partition of a skewed sort-merge join at runtime") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 95% of the left rows share one hot key; the right side is a
      // small dimension but broadcast is disabled, so without skew
      // handling one task would sort/join almost the whole left side
      val left = spark.range(0, 200000)
        .select(when($"id" % 20 =!= 0, lit(7L)).otherwise($"id").as("key"),
          concat(lit("payload_payload_payload_"), $"id").as("pad"))
      val right = spark.range(0, 1000).select($"id".as("key"),
        ($"id" * 2).as("dim"))
      val joined = left.join(right, "key")
      // collect() drives THIS Dataset's QueryExecution (count() would
      // plan a separate one and leave this plan unexecuted/non-final).
      // hot key 7: the 190000 rows with id % 20 != 0; scattered keys
      // (multiples of 20) only match the 0..999 dimension → 50 rows
      assert(joined.collect().length == 190000 + 50)
      // the FINAL adaptive plan (post-execution) must mark the join
      // skew-handled: OptimizeSkewedJoin rewrote the hot partition
      // into multiple splits
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"AQE did not split the skewed join:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("evt_asof stays correct under a pathologically hot user") {
    // a power user holding 99% of the event stream: the as-of window
    // sorts that user inside ONE task (inherent to running-state
    // semantics — splitting a user's timeline would need boundary
    // state handoff), so the pin here is CORRECTNESS under skew plus
    // the absence of any per-user materialization blowup. 20k
    // alternating click/purchase events → every purchase attributes
    // to the click immediately before it.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("hotasof").toString
    val hot = (0 until 20000).map { i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L), 99L,
        if (i % 2 == 0) "click" else "purchase", 1.0, "{}")
    }
    val cold = (0 until 200).map { i =>
      (20000L + i, new java.sql.Timestamp(1700000000000L + i * 1000L),
        (i % 10).toLong, if (i % 2 == 0) "click" else "purchase", 1.0, "{}")
    }
    (hot ++ cold)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = Relational.queries("evt_asof")(spark, tmp)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val hotRows = r.filter(_._1 == 99L)
    assert(hotRows.length == 10000)
    // purchase i attributes to click i-1, lag exactly one second
    assert(hotRows.forall(x => x._4 == x._2 - 1 && x._6 == 1000L))
    // the cold users are unaffected by the hot partition
    assert(r.count(_._1 != 99L) == 100)
  }
}
