// Ad-hoc phase timing for the sim_ann_ivf_versioned lifecycle: clone,
// cutover, compaction, probe — so optimization effort goes where the
// seconds are. `sbt "runMain graft.tools.IvfVersionedTiming [sfDir]"`.
package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Similarity

object IvfVersionedTiming {
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

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm up + the session-cached ivf build off the timed path (the
    // bench attribution: ivf_build carries the corpus build)
    graft.SparkEntry.queries("q1_agg")(spark, sf).count()
    time("ivf_build (carries session build)")(
      graft.SparkEntry.queries("ivf_build")(spark, sf).count())

    // the declared query's body, phase by phase (cutVersion is private;
    // the pointer write is driver-side FS work, folded into "clone+cut")
    val root = Similarity.storedQueryDir("ivfver_timing", sf)
    val base = Similarity.writeIvfIndexOnce(spark, sf)
    time("clone+cut (pointer by hand)") {
      Similarity.cloneIndexDir(spark, base, s"$root/v_t0",
        Seq("_graft_tombstones"))
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(root, "_graft_current")
      val fs = p.getFileSystem(conf)
      val out = fs.create(p, true)
      try out.write("v_t0".getBytes("UTF-8")) finally out.close()
    }
    // compaction sub-phases, replicated from compactIvfIndexVersioned
    locally {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val cur = Similarity.resolveCurrentVersion(spark, root)
      val fresh = s"$root/v_t1"
      val idx = time("  compact: readIvfIndex (centroid collect)")(
        Similarity.readIvfIndex(spark, cur))
      time("  compact: assignments rewrite") {
        idx.assigned.select($"vec_id", $"embedding", $"nrm", $"cell")
          .repartition($"cell")
          .write.partitionBy("cell").parquet(s"$fresh/assignments")
      }
      val counts = time("  compact: counts read-back") {
        spark.read.parquet(s"$fresh/assignments")
          .groupBy($"cell").agg(count(lit(1)).as("n"))
          .select($"cell".cast("long"), $"n")
          .as[(Long, Long)].collect().toMap
      }
      time("  compact: centroids re-read + collect") {
        spark.read.parquet(s"$cur/centroids")
          .select($"cell", $"centroid", $"cnrm")
          .as[(Long, Seq[Float], Double)].collect().sortBy(_._1)
      }
      time("  compact: centroids write") {
        idx.cents.toSeq
          .map { case (cid, cv, cn) =>
            (cid, cv.toSeq, cn, counts.getOrElse(cid, 0L)) }
          .toDF("cell", "centroid", "cnrm", "occupancy")
          .write.parquet(s"$fresh/centroids")
      }
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(root, "_graft_current")
      val fs = p.getFileSystem(conf)
      val out = fs.create(p, true)
      try out.write("v_t1".getBytes("UTF-8")) finally out.close()
    }
    time("compactIvfIndexVersioned (the real one)")(
      Similarity.compactIvfIndexVersioned(spark, root))
    time("probe count")(
      Similarity.topkIvfVersioned(spark, sf, root).count())
    // and the full declared query for the end-to-end number
    time("sim_ann_ivf_versioned TOTAL")(
      graft.SparkEntry.queries("sim_ann_ivf_versioned")(spark, sf).count())
    spark.stop()
  }
}
