package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence pin for the 2-pass skew variant of evt_asof (the r12
  * stretch item): the prefix-scan decomposition must reproduce the
  * declared single-window query EXACTLY — on the real fixture, under
  * forced many-chunk splitting (a tiny chunk width makes nearly every
  * event its own chunk, exercising carry-through-empty-chunks and
  * chunk-boundary attribution), and on the hot-user skew fixture.
  */
class AsofTwoPassSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    df.as[(Long, Long, Long, Long, Long, Long)].collect().toSet
  }

  test("two-pass asof equals the declared window form on the real fixture") {
    val expect = rows(Relational.queries("evt_asof")(spark, sf))
    assert(expect.nonEmpty)
    assert(rows(Relational.asofTwoPass(spark, sf)) == expect)
  }

  test("forced many-chunk splitting: carry crosses empty chunks and boundaries") {
    // 1-second chunks on a fixture whose events span days: nearly
    // every event is alone in its chunk, every attribution crosses
    // chunk boundaries through runs of empty chunks — the carry path
    // does all the work
    val expect = rows(Relational.queries("evt_asof")(spark, sf))
    assert(rows(Relational.asofTwoPass(spark, sf, chunkMs = 1000L)) == expect)
  }

  test("hot-user skew: the variant matches the window form and splits the hot timeline") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("twopassasof").toString
    // one user with 20k alternating click/purchase events spread over
    // ~28 days (so the default day chunking genuinely splits it),
    // plus cold users
    val hot = (0 until 20000).map { i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 120000L), 99L,
        if (i % 2 == 0) "click" else "purchase", 1.0, "{}")
    }
    val cold = (0 until 200).map { i =>
      (20000L + i, new java.sql.Timestamp(1700000000000L + i * 1000L),
        (i % 10).toLong, if (i % 2 == 0) "click" else "purchase", 1.0, "{}")
    }
    (hot ++ cold)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val expect = rows(Relational.queries("evt_asof")(spark, tmp))
    val got = rows(Relational.asofTwoPass(spark, tmp))
    assert(got == expect)
    // sanity on the hot user's shape: every purchase attributes to the
    // click 2 minutes before it
    val hotRows = got.filter(_._1 == 99L)
    assert(hotRows.size == 10000)
    assert(hotRows.forall(x => x._4 == x._2 - 1 && x._6 == 120000L))
    // the hot timeline really does split across chunks under the
    // default day width (the point of the variant)
    val span = 20000L * 120000L
    assert(span / Relational.AsofChunkMs >= 25,
      "fixture must span enough days to exercise multi-chunk carry")
  }
}
