package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pipeline semantics (SURVEY.md §5.2(3–4)): roundtrip
  * identity on the reference's own sample corpus, dedup idempotence
  * across runs (content-hash, not path), dead-letter routing, and the
  * latest-wins status view.
  */
class FilePipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Golden corpus = the reference repo's sample inputs (data, not
    * code): exercises sub-chunk files, multi-byte UTF-8 (`éàçùñ`, em
    * dash) and multi-chunk sizes. Copied into the test's input dir.
    */
  private val goldenDir = Paths.get("/root/reference/data/input")

  private def freshDirs(): FilePipeline.Dirs = {
    val root = Files.createTempDirectory("graft-pipe")
    def p(n: String) = root.resolve(n).toString
    FilePipeline.Dirs(p("input"), p("output"), p("reports"), p("tracking"),
      p("dead"), p("status"), p("checkpoint"))
  }

  private def copyGolden(input: String): Seq[Path] = {
    Files.createDirectories(Paths.get(input))
    val files = Files.list(goldenDir).toArray.map(_.asInstanceOf[Path])
      .filter(_.toString.endsWith(".txt")).toSeq
    files.map(f => Files.copy(f, Paths.get(input, f.getFileName.toString)))
  }

  test("streaming run: every golden file roundtrips byte-identically") {
    val dirs = freshDirs()
    val inputs = copyGolden(dirs.input)
    assert(inputs.nonEmpty)

    val q = FilePipeline.run(spark, dirs,
      FilePipeline.Config(chunkSize = 64, errorCorrectionSymbols = 4))
    q.awaitTermination()

    inputs.foreach { in =>
      val out = Paths.get(dirs.output, s"processed_${in.getFileName}")
      assert(Files.exists(out), s"missing $out")
      assert(java.util.Arrays.equals(Files.readAllBytes(in), Files.readAllBytes(out)),
        s"roundtrip mismatch for ${in.getFileName}")
    }
    val tracked = spark.read.parquet(dirs.tracking)
    assert(tracked.count() == inputs.size)
    assert(tracked.filter("status = 'completed'").count() == inputs.size)
    val reports = spark.read.json(dirs.reports)
    assert(reports.count() == inputs.size)
    assert(reports.filter("original_checksum <> reconstructed_checksum").count() == 0)
  }

  test("ProcessingTime daemon: batch 2 dedups against batch 1 hashes without restarting") {
    import org.apache.spark.sql.streaming.Trigger
    // the reference's deployment shape is a 30-minute cron cadence
    // (dags/dag.py:39-40); the daemon equivalent is one long-lived
    // query on Trigger.ProcessingTime, where each file drop becomes
    // its own micro-batch and dedup must hold ACROSS micro-batches
    val dirs = freshDirs()
    Files.createDirectories(Paths.get(dirs.input))
    Files.write(Paths.get(dirs.input, "first.txt"),
      "daemon batch one".getBytes(StandardCharsets.UTF_8))
    val q = FilePipeline.run(spark, dirs,
      FilePipeline.Config(chunkSize = 64, errorCorrectionSymbols = 4),
      trigger = Trigger.ProcessingTime("100 milliseconds"))
    try {
      q.processAllAvailable()
      assert(Files.exists(Paths.get(dirs.output, "processed_first.txt")))
      assert(spark.read.parquet(dirs.tracking).count() == 1)

      // second drop while the daemon stays up: a renamed duplicate of
      // batch 1's content plus a genuinely new file
      Files.write(Paths.get(dirs.input, "dup_of_first.txt"),
        "daemon batch one".getBytes(StandardCharsets.UTF_8))
      Files.write(Paths.get(dirs.input, "second.txt"),
        "daemon batch two".getBytes(StandardCharsets.UTF_8))
      q.processAllAvailable()

      val t = spark.read.parquet(dirs.tracking)
      assert(t.count() == 2, "duplicate content must not re-track in a later micro-batch")
      assert(!Files.exists(Paths.get(dirs.output, "processed_dup_of_first.txt")))
      assert(Files.exists(Paths.get(dirs.output, "processed_second.txt")))
      // and this really was multi-batch daemon execution, not one drain
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2)
    } finally q.stop()
  }

  test("second run is a no-op; renamed duplicate content is skipped (content-hash dedup)") {
    val dirs = freshDirs()
    copyGolden(dirs.input)
    FilePipeline.runBatch(spark, dirs)
    val n1 = spark.read.parquet(dirs.tracking).count()

    // same content under a NEW path + one genuinely new file
    val dup = Files.list(goldenDir).toArray.map(_.asInstanceOf[Path])
      .filter(_.toString.endsWith(".txt")).head
    Files.copy(dup, Paths.get(dirs.input, "renamed_copy.txt"))
    Files.write(Paths.get(dirs.input, "brand_new.txt"),
      "never seen before".getBytes(StandardCharsets.UTF_8))

    FilePipeline.runBatch(spark, dirs)
    val t = spark.read.parquet(dirs.tracking)
    // only brand_new.txt got a new tracking row; the renamed copy did not
    assert(t.count() == n1 + 1)
    assert(!Files.exists(Paths.get(dirs.output, "processed_renamed_copy.txt")))
    assert(Files.exists(Paths.get(dirs.output, "processed_brand_new.txt")))
  }

  test("oversize files route to the dead-letter sink with error metadata") {
    val dirs = freshDirs()
    Files.createDirectories(Paths.get(dirs.input))
    Files.write(Paths.get(dirs.input, "ok.txt"), "small".getBytes)
    Files.write(Paths.get(dirs.input, "big.txt"), ("x" * 4096).getBytes)

    FilePipeline.runBatch(spark, dirs, FilePipeline.Config(maxFileBytes = 1024))
    val dead = spark.read.json(dirs.deadLetter)
    assert(dead.count() == 1)
    val row = dead.select("filename", "error_message").collect().head
    assert(row.getString(0) == "big.txt")
    assert(row.getString(1).contains("maxFileBytes"))
    // failed files are tracked (status=failed) and never written to output
    assert(spark.read.parquet(dirs.tracking).filter("status = 'failed'").count() == 1)
    assert(!Files.exists(Paths.get(dirs.output, "processed_big.txt")))
    assert(Files.exists(Paths.get(dirs.output, "processed_ok.txt")))
  }

  test("chunk+meta sink writes per-chunk records partitioned by file hash") {
    val dirs0 = freshDirs()
    val dirs = dirs0.copy(chunks =
      Paths.get(dirs0.checkpoint).getParent.resolve("chunks").toString)
    Files.createDirectories(Paths.get(dirs.input))
    Files.write(Paths.get(dirs.input, "a.txt"), ("z" * 200).getBytes)
    FilePipeline.runBatch(spark, dirs, FilePipeline.Config(chunkSize = 64))
    val chunks = spark.read.json(dirs.chunks)
    assert(chunks.count() == 4) // ceil(200/64)
    assert(chunks.select("file_hash").distinct().count() == 1)
    assert(chunks.columns.toSet.contains("dna_sequence"))
  }

  test("sample-input bootstrap fires only on an empty input dir") {
    val dirs = freshDirs()
    assert(FilePipeline.bootstrapSampleInput(dirs.input))
    assert(Files.exists(Paths.get(dirs.input, "sample_input.txt")))
    assert(!FilePipeline.bootstrapSampleInput(dirs.input)) // second call: no-op
    FilePipeline.runBatch(spark, dirs)
    assert(Files.exists(Paths.get(dirs.output, "processed_sample_input.txt")))
  }

  test("status ADT round-trips its wire names") {
    import FilePipeline.Status
    assert(Status.all.size == 6)
    Status.all.foreach(s => assert(Status.parse(s.name).contains(s)))
    assert(Status.parse("bogus").isEmpty)
  }

  test("status events resolve latest-wins") {
    val dirs = freshDirs()
    Files.createDirectories(Paths.get(dirs.input))
    Files.write(Paths.get(dirs.input, "a.txt"), "alpha".getBytes)
    FilePipeline.runBatch(spark, dirs)
    val st = FilePipeline.currentStatus(spark, dirs.statusEvents)
    assert(st.count() == 1)
    assert(st.filter("status = 'completed'").count() == 1)
  }
}
