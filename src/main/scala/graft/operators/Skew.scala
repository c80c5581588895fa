package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (builder brief / SURVEY.md §4): when one key
  * dominates a shuffle (a viral document hash, a null-ish default key),
  * AQE's skew-join split handles joins, but a skewed AGGREGATION still
  * funnels one key into one task. Salting splits each key across
  * `buckets` partial groups, then merges — two light shuffles instead
  * of one stalled straggler.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(key ⊕ salt) partial-agg,
    * then groupBy(key) merge. `partials` aggregate raw columns into the
    * salted groups; `merges` combine the partial columns.
    *
    * saltedAgg(df, $"k", 16,
    *   Seq(sum($"v").as("s"), count(lit(1)).as("c")),
    *   Seq(sum($"s").as("s"), sum($"c").as("c")))
    */
  def saltedAgg(df: DataFrame, key: Column, buckets: Int,
      partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    val salted = df
      .withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(buckets)))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partials.head, partials.tail: _*)
    salted
      .groupBy(col("__key"))
      .agg(merges.head, merges.tail: _*)
      .withColumnRenamed("__key", "key")
  }
}
