package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Golden parity against the reference's own published outputs
  * (`/root/reference/data/output/processed_*.txt`, read-only data):
  * running our pipeline with the reference's default config
  * (chunk_size=1000, nsym=10, `dags/dag.py:64,72`) over its inputs must
  * reproduce its outputs byte-for-byte, and the per-file report fields
  * must match what the reference's math implies.
  */
class GoldenParitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val refIn = Paths.get("/root/reference/data/input")
  private val refOut = Paths.get("/root/reference/data/output")

  test("reference defaults reproduce the reference's outputs byte-for-byte") {
    val root = Files.createTempDirectory("graft-golden")
    def p(n: String) = root.resolve(n).toString
    val dirs = FilePipeline.Dirs(p("in"), p("out"), p("rep"), p("trk"),
      p("dead"), p("status"), p("ckpt"))
    Files.createDirectories(Paths.get(dirs.input))
    val inputs = Files.list(refIn).toArray.map(_.asInstanceOf[Path])
      .filter(_.toString.endsWith(".txt")).toSeq
    inputs.foreach(f => Files.copy(f, Paths.get(dirs.input, f.getFileName.toString)))

    FilePipeline.runBatch(spark, dirs) // Config() == reference defaults

    // every published golden output matches ours byte-for-byte
    val golden = Files.list(refOut).toArray.map(_.asInstanceOf[Path])
      .filter(_.getFileName.toString.startsWith("processed_"))
    assert(golden.nonEmpty)
    golden.foreach { g =>
      val ours = Paths.get(dirs.output, g.getFileName.toString)
      assert(Files.exists(ours), s"missing ${g.getFileName}")
      assert(java.util.Arrays.equals(Files.readAllBytes(g), Files.readAllBytes(ours)),
        s"byte mismatch vs reference for ${g.getFileName}")
    }

    // report math: chunk counts at chunk_size=1000 for the known sizes
    val rep = spark.read.json(dirs.reports)
    val counts = rep.select("filename", "dna_chunks_count").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("sample2.txt") == 1)        //   14 B
    assert(counts("sample3.txt") == 1)        //  144 B (multi-byte UTF-8)
    assert(counts("sample_input.txt") == 1)   //  653 B
    assert(counts("test_shakespear.txt") == 2) // 1411 B → 2 chunks
    // ~5.05 DNA bases per input byte (8/log2(3)), reference expansion
    val bases = rep.select("filename", "total_dna_bases").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val size = Map("sample2.txt" -> 14L, "sample3.txt" -> 144L,
      "sample_input.txt" -> 653L, "test_shakespear.txt" -> 1411L)
    size.foreach { case (f, n) =>
      val ratio = bases(f).toDouble / n
      assert(ratio > 4.8 && ratio < 5.3, s"$f expansion $ratio out of range")
    }
  }
}
