package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table storage — the third co-location lever next to
  * broadcast (small dims) and salting (skew): both sides of a
  * recurring equi-join stored pre-hash-partitioned AND bucket-sorted
  * on the join key, so the join runs with ZERO exchange on every
  * subsequent read — the shuffle happens once at write time and is
  * amortized over every later run.
  *
  * The motivating join is the reference pipeline's unprocessed-file
  * filter (`dags/dag.py:454-470`): every ingest cycle anti-joins the
  * incoming corpus against the ever-growing content-hash tracking
  * table. At 100 TB that tracking table is billions of rows — far
  * beyond broadcast — and re-shuffling BOTH sides on every cycle makes
  * the dedup step the pipeline's dominant recurring cost. Stored
  * bucketed by `content_fp`, each cycle's anti-join reads co-located
  * buckets directly (`Bucketed: true` scans, SortMergeJoin with no
  * Exchange — BucketedJoinSpec pins the plan).
  *
  * Sizing: pick bucket count so one bucket ≈ one task's worth of data
  * at the TARGET corpus size (e.g. 2⁴ buckets per TB at 64 MB splits);
  * both tables must use the SAME count, since Spark only elides the
  * exchange when bucket counts match (or divide evenly with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
  */
object BucketedTables {

  /** Write `df` as a parquet table bucketed and bucket-sorted on
    * `key`, stored at `path` (external table — no warehouse-relative
    * state; the catalog entry carries the bucket spec that lets later
    * scans skip the exchange).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, path: String): Unit =
    df.write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
}
