package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.DnaFunctions

/** The reference pipeline end-to-end (SURVEY.md §2.9/§3.1) as a
  * Structured Streaming job: file source → content-hash dedup →
  * fused DNA process → fan-out sinks, with the tracking table,
  * dead-letter branch and status events.
  *
  * Reference mechanics re-expressed (T1–T5):
  *  - 30-min cron rescan (`dags/dag.py:39`) → file-source stream;
  *    `Trigger.AvailableNow` per run (or `ProcessingTime` for a
  *    long-lived daemon). The checkpoint replaces Airflow's metadata.
  *  - Content-hash exactly-once (`dags/dag.py:452-474`): Spark's file
  *    source dedups by PATH only, so the md5 anti-join against the
  *    tracking table stays — a rename can't re-process content, and the
  *    append-only tracking write keeps `ON CONFLICT DO NOTHING`
  *    semantics (`dags/dag.py:743`) because membership is checked
  *    before every insert.
  *  - Dead-letter routing (`dags/dag.py:285-318`): failed branch of the
  *    same DataFrame → JSON error records + payload copy.
  *  - Status events (`dags/dag.py:320-345`): append-only event table,
  *    latest-wins view — fixes the reference's lost-UPDATE quirk
  *    (SURVEY.md §7.4) while keeping the final-table contract.
  */
object FilePipeline {

  /** The reference's processing-status state machine
    * (`dags/dag.py:103-110`; lifecycle `README.md:91-98`). RETRYING and
    * DEAD_LETTER exist in the reference's enum but are never persisted
    * to its DB (SURVEY.md §7.4) — here every state is a legal event.
    */
  sealed abstract class Status(val name: String)
  object Status {
    case object Pending extends Status("pending")
    case object Processing extends Status("processing")
    case object Completed extends Status("completed")
    case object Failed extends Status("failed")
    case object Retrying extends Status("retrying")
    case object DeadLetter extends Status("dead_letter")
    val all: Seq[Status] =
      Seq(Pending, Processing, Completed, Failed, Retrying, DeadLetter)
    def parse(s: String): Option[Status] = all.find(_.name == s)
  }

  /** The five reference config knobs (`dags/dag.py:661-667`) plus the
    * engine's own failure-injection bound.
    */
  case class Config(
      chunkSize: Int = 1000,
      errorCorrectionSymbols: Int = 10,
      maxRetries: Int = 3,
      circuitBreakerThreshold: Int = 5,
      maxFileBytes: Long = 16L * 1024 * 1024)

  case class Dirs(
      input: String,
      output: String,
      reports: String,
      tracking: String,
      deadLetter: String,
      statusEvents: String,
      checkpoint: String,
      chunks: String = "") // S8 chunk+meta sink; "" disables

  /** Pluggable tracking store (S5/S9): where the content-hash
    * exactly-once membership lives. The parquet table is the default
    * deployment; [[JdbcTrackingStore]] is drop-in parity with the
    * reference's Postgres `processed_files` (`init-scripts.sql:5-14`),
    * executed for real against Derby in JdbcPipelineSpec. Both sides
    * of the contract matter: [[knownHashes]] feeds the anti-join that
    * makes reprocessing impossible, [[upsert]] must itself be
    * idempotent on `file_hash` so a replayed micro-batch (foreachBatch
    * is at-least-once on failure) cannot double-insert.
    */
  sealed trait TrackingStore extends Serializable {
    /** Distinct `file_hash` of everything ever tracked. */
    def knownHashes(spark: SparkSession): DataFrame
    /** Idempotent append of
      * (file_hash, file_path, file_size, status, output_file) rows.
      */
    def upsert(spark: SparkSession, rows: DataFrame): Unit
  }

  /** Default store: the status-partitioned parquet tracking table
    * (status-scoped sweeps prune partitions instead of scanning all
    * history). Idempotence comes from the caller's anti-join — the
    * same ordering the reference relies on (`dags/dag.py:452-474`).
    */
  final case class ParquetTracking(dir: String) extends TrackingStore {
    def knownHashes(spark: SparkSession): DataFrame =
      if (Files.exists(Paths.get(dir)))
        spark.read.parquet(dir).select("file_hash").distinct()
      else spark.emptyDataFrame.withColumn("file_hash", lit(null).cast("string"))
        .limit(0).select("file_hash")
    def upsert(spark: SparkSession, rows: DataFrame): Unit =
      rows.select(col("file_hash"), col("file_path"), col("file_size"),
        current_timestamp().as("processed_at"), col("status"), col("output_file"))
        .write.mode("append").partitionBy("status").parquet(dir)
  }

  /** The reference's JDBC tracking table as the store: reads go
    * through `spark.read.jdbc`, writes through the executor-side
    * insert-if-absent batches of [[graft.sources.JdbcTracking.upsert]]
    * (Postgres `ON CONFLICT DO NOTHING` / Derby `MERGE`), which makes
    * the upsert idempotent at the DATABASE, not just via the anti-join.
    */
  final case class JdbcTrackingStore(url: String, user: String,
      password: String, dialect: graft.sources.JdbcTracking.SqlDialect)
    extends TrackingStore {
    def knownHashes(spark: SparkSession): DataFrame =
      graft.sources.JdbcTracking.read(spark, url, user, password, dialect)
        .select("file_hash").distinct()
    def upsert(spark: SparkSession, rows: DataFrame): Unit =
      graft.sources.JdbcTracking.upsert(rows, url, user, password, dialect)
  }

  /** S4 (`dags/dag.py:426-443`): if the input directory has no .txt
    * files, synthesize a small sample so a demo run has work to do.
    * Returns true if the bootstrap file was written.
    */
  def bootstrapSampleInput(inputDir: String): Boolean = {
    Files.createDirectories(Paths.get(inputDir))
    val hasTxt = Files.list(Paths.get(inputDir)).toArray
      .exists(_.toString.endsWith(".txt"))
    if (hasTxt) false
    else {
      val lorem =
        "Lorem ipsum dolor sit amet, consectetur adipiscing elit, sed do " +
          "eiusmod tempor incididunt ut labore et dolore magna aliqua."
      Files.write(Paths.get(inputDir, "sample_input.txt"),
        lorem.getBytes(StandardCharsets.UTF_8))
      true
    }
  }

  /** S1/S2/F1/F3: streaming whole-file text source with the file-record
    * projection (path, name, content hash, size).
    */
  def readFiles(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream
      .format("text")
      .option("wholetext", "true")
      .option("pathGlobFilter", "*.txt")
      .load(inputDir)
      .select(
        col("_metadata.file_path").as("file_path"),
        element_at(split(col("_metadata.file_path"), "/"), -1).as("filename"),
        col("value").as("content"),
        md5(to_binary(col("value"), lit("utf-8"))).as("file_hash"),
        octet_length(col("value")).cast("long").as("file_size"))

  /** Batch form of the same source (the reference's non-streaming DAG
    * run over a directory).
    */
  def readFilesBatch(spark: SparkSession, inputDir: String): DataFrame =
    spark.read
      .format("text")
      .option("wholetext", "true")
      .option("pathGlobFilter", "*.txt")
      .load(inputDir)
      .select(
        col("_metadata.file_path").as("file_path"),
        element_at(split(col("_metadata.file_path"), "/"), -1).as("filename"),
        col("value").as("content"),
        md5(to_binary(col("value"), lit("utf-8"))).as("file_hash"),
        octet_length(col("value")).cast("long").as("file_size"))

  /** One micro-batch: dedup → process → fan-out. Also the per-run body
    * of the batch entry point.
    */
  def processBatch(spark: SparkSession, files: DataFrame, dirs: Dirs,
      cfg: Config = Config(), store: Option[TrackingStore] = None): Unit = {
    import spark.implicits._

    // F4: empty-input gate (`dags/dag.py:816-821`) — nothing to do,
    // touch no sink.
    if (files.isEmpty) return

    val tracking = store.getOrElse(ParquetTracking(dirs.tracking))

    // J1/T2: anti-join on content hash against the tracking table.
    val tracked: DataFrame = tracking.knownHashes(spark)
    val fresh = files
      .dropDuplicates("file_hash") // first occurrence within the batch wins
      .join(tracked, Seq("file_hash"), "left_anti")

    // Fused per-file pipeline (no shuffle): encode→validate→reconstruct.
    // Files over the size bound are failed without processing (the
    // dead-letter branch needs a deterministic trigger in tests too).
    val processed = fresh
      .withColumn("oversize", $"file_size" > cfg.maxFileBytes)
      // register on the BATCH's session: inside foreachBatch the
      // micro-batch DataFrame belongs to a cloned session whose
      // function registry was snapshotted at query start — registering
      // on the outer session would leave `dna_process` unresolved on
      // the first-ever streaming batch of a fresh session
      .withColumn("r",
        when(!$"oversize",
          DnaFunctions.dnaProcessNative(files.sparkSession, cfg.chunkSize,
            cfg.errorCorrectionSymbols)($"content")))
      .withColumn("status",
        when($"oversize", lit("failed"))
          .when($"r.status" === "success" &&
            $"r.original_checksum" === $"r.reconstructed_checksum", lit("completed"))
          .otherwise(lit("failed")))
      .withColumn("error_message",
        when($"oversize", concat(lit("file exceeds maxFileBytes="), lit(cfg.maxFileBytes)))
          .when($"status" === "failed", lit("checksum mismatch after reconstruction")))
      .persist()

    try {
      val ok = processed.filter($"status" === "completed")
      val failed = processed.filter($"status" =!= "completed")

      // S6: reconstructed text, one exact-named file per input
      // (`processed_{filename}`, dags/dag.py:577) — executor-side
      // writer; on a cluster this is a DFS client, locally java.nio.
      Files.createDirectories(Paths.get(dirs.output))
      val outDir = dirs.output
      ok.select($"filename", $"content").as[(String, String)]
        .foreachPartition { it: Iterator[(String, String)] =>
          it.foreach { case (name, text) =>
            Files.write(Paths.get(outDir, s"processed_$name"),
              text.getBytes(StandardCharsets.UTF_8))
          }
        }

      // S7: per-file DNA report (nested JSON)
      ok.select($"file_path", $"filename", $"file_hash",
        $"r.original_checksum".as("original_checksum"),
        $"r.reconstructed_checksum".as("reconstructed_checksum"),
        $"r.n_chunks".as("dna_chunks_count"),
        $"r.total_dna_bases".as("total_dna_bases"),
        lit(cfg.chunkSize).as("chunk_size"),
        lit(cfg.errorCorrectionSymbols).as("error_correction_symbols"),
        current_timestamp().as("processed_at"))
        .write.mode("append").json(dirs.reports)

      // S8: per-chunk DNA + metadata sink, partitioned by file hash
      // (`dags/dag.py:540-569`), when a chunks dir is configured.
      if (dirs.chunks.nonEmpty)
        ok.select($"file_hash", $"content")
          .withColumn("chunk",
            explode(DnaFunctions.dnaChunks(cfg.chunkSize, cfg.errorCorrectionSymbols)($"content")))
          .select($"file_hash", $"chunk.chunk_id", $"chunk.idx",
            $"chunk.dna_sequence", $"chunk.checksum", $"chunk.ecc_hex",
            $"chunk.chunk_nbytes")
          .write.mode("append").partitionBy("file_hash").json(dirs.chunks)

      // S10: dead-letter sink — error metadata + original payload;
      // dead-letter filename mirrors the reference's
      // `failed_{timestamp}_{filename}` (X19, dags/dag.py:294-296).
      failed.select($"file_path", $"filename", $"file_hash", $"file_size",
        $"error_message", $"content".as("payload"),
        format_string("failed_%s_%s",
          date_format(current_timestamp(), "yyyyMMdd_HHmmss"), $"filename")
          .as("dead_letter_file"),
        current_timestamp().as("failed_at"))
        .write.mode("append").json(dirs.deadLetter)

      // S9: tracking upsert (content-addressed; the anti-join above
      // plus the store's own insert-if-absent keep ON CONFLICT DO
      // NOTHING semantics) through the pluggable store
      tracking.upsert(spark,
        processed.select($"file_hash", $"file_path", $"file_size", $"status",
          when($"status" === "completed",
            concat(lit("processed_"), $"filename")).as("output_file")))

      // S11/T4: status events, append-only
      processed.select($"file_hash", $"status",
        current_timestamp().as("event_time"))
        .write.mode("append").parquet(dirs.statusEvents)
    } finally processed.unpersist()
  }

  /** T4: latest-wins status view over the append-only event table. */
  def currentStatus(spark: SparkSession, statusEventsDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("file_hash"))
      .orderBy(col("event_time").desc)
    spark.read.parquet(statusEventsDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Streaming entry point (T1). `Trigger.AvailableNow` = one drain of
    * everything new, the per-run shape; pass
    * `Trigger.ProcessingTime("30 minutes")` for the reference's cadence
    * as a daemon.
    */
  def run(spark: SparkSession, dirs: Dirs, cfg: Config = Config(),
      trigger: Trigger = Trigger.AvailableNow(),
      store: Option[TrackingStore] = None): StreamingQuery =
    readFiles(spark, dirs.input).writeStream
      .option("checkpointLocation", dirs.checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(spark, batch, dirs, cfg, store)
      }
      .start()

  /** Batch entry point: same body, one pass (the reference's DAG run). */
  def runBatch(spark: SparkSession, dirs: Dirs, cfg: Config = Config()): Unit =
    processBatch(spark, readFilesBatch(spark, dirs.input), dirs, cfg)
}
