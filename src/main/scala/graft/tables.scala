package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated star schema
  * (TESTDATA.md): region nation customer supplier part orders lineitem
  * events documents embeddings — one parquet per table under the sf dir.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  /** Normalize the events `ts` column to a microsecond TimestampType
    * regardless of how the fixture generation wrote it — the driver has
    * shipped BOTH physical encodings across rounds:
    *
    *  - TIMESTAMP(NANOS): Spark reads it as a nanos LongType under
    *    `spark.sql.legacy.parquet.nanosAsLong` (set by our session
    *    builders). The ns→us conversion must be integer division
    *    (`div`): Column `/` promotes to double, and ns epoch values
    *    (~1.7e18) exceed double's 2^53 exact range, so a truncating
    *    cast back can be off by 1 us — enough to drop an event on a
    *    window boundary into the wrong time bucket vs an oracle that
    *    reads TIMESTAMP_NS exactly.
    *  - TIMESTAMP(MICROS) without timezone: Spark reads TIMESTAMP_NTZ,
    *    which unix_micros/window functions reject. Every session here
    *    runs `spark.sql.session.timeZone=UTC`, so the NTZ→TIMESTAMP
    *    cast is wall-clock-identical and matches the DuckDB oracle's
    *    naive read of the same values.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
