// Ad-hoc stage timing for sim_ann_pq (r13 verdict item 6): split the
// query's cost into build / ADC coarse scan / exact re-rank so the
// 8.8x-per-decade curve gets attributed to a stage instead of guessed
// at. Run with `sbt "runMain graft.tools.PqProbe [sfDir]"`.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PqProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    graft.SparkEntry.queries("q1_agg")(spark, sf).count() // warm up

    val idx = time("pq_build (train + encode + persist)") {
      val i = graft.operators.Pq.pqIndex(spark, sf)
      i.codes.count(); i
    }
    time("codes scan only (count)")(idx.codes.count())
    val full = time("sim_ann_pq steady-state (coarse + rerank, index cached)") {
      graft.operators.Pq.queries("sim_ann_pq")(spark, sf).count()
    }
    // re-rank alone: feed fineRerank a synthetic coarse candidate set
    // of the real shape (|Q| x PqCandidates rows of valid n_ids)
    val coarse = time("synthetic coarse build") {
      val q = graft.operators.Pq.queryRelation(spark, sf).select($"q_id")
      val ids = graft.Tables.embeddings(spark, sf)
        .select($"vec_id".as("n_id"))
        .orderBy($"n_id").limit(graft.operators.Pq.PqCandidates)
      val c = q.crossJoin(ids)
      c.count(); c
    }
    time("fineRerank alone (full-embedding join + window)") {
      graft.operators.Pq.fineRerank(spark, sf, coarse,
        graft.operators.Similarity.TopK).count()
    }
    println(s"[stage] rows: $full")
    spark.stop()
  }
}
