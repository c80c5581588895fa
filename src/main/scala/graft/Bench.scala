package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shuffle width defaults to the thread count (right at bench SF);
    // scale fixtures size it independently — the deployment knob the
    // sizing table documents (partitions grow with data, threads with
    // cores). The driver never sets it, so driver artifacts keep the
    // committed sizing.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/shuffle paths so the first timed query isn't
    // paying one-time JIT + executor-spinup cost
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // deterministic order + GC fence: map iteration order shifts as
    // queries are added, which made per-query timings depend on which
    // heavy query ran before them. `*_build` lines run FIRST so index
    // construction is attributed to its own bench line and every
    // index-consuming query (sim_ann_*, dedup_semantic, emb_knn_label)
    // measures steady-state probe cost — the build-once contract.
    // Build lines are DEPENDENCY-ordered, not just alphabetical: the
    // pair-relation builds consume base indexes (emb_pairs_build walks
    // Similarity.lshIndex), so base index builds run in tier 0 and
    // derived builds in tier 1 — otherwise an alphabetically-earlier
    // consumer silently absorbs its dependency's build cost and the
    // dependency's own line measures a warm no-op (r9 verdict: lsh_build
    // read 0.14 s against its 0.82 line because emb_pairs_build < l).
    // build ordering tiers: plain builds (tier 0) run first, builds
    // derived from a session-cached relation (tier 1) after it, and
    // builds that CONSUME another build's cache (tier 2 —
    // hybrid_build writes the pairs_build relation + lsh_build index
    // to their stored dirs) last, so each build line measures its own
    // work and never steals an upstream build's attribution
    val buildTier = Map(
      "emb_pairs_build" -> 1, "pairs_build" -> 1, "hybrid_build" -> 2)
    // a failed query must be LOUD: recording a ~0s time would sail
    // under the budget tripwire and read as a clean fast pass
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // optional comma-separated subset for local scale-curve runs
    // (e.g. the sf1 fixture); the driver never sets it, so driver
    // artifacts always measure the full surface
    val subset = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a typo'd name silently shrinking the run would look like a clean
    // fast pass — same LOUDNESS rule as failed queries
    subset.foreach { qs =>
      val unknown = qs -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_QUERIES names unknown queries: ${unknown.mkString(", ")}")
    }
    // optional per-query best-of-N (SPARK_GRAFT_BEST_OF=2) for local
    // A/B runs on a contended machine: re-run each query and keep the
    // fastest, damping scheduler jitter (two driver artifacts differed
    // ~35% on identical code paths at r10→r11). The driver never sets
    // it, so driver artifacts stay single-shot with the same schema.
    // Build-attributed lines — `*_build`, plus the session-cached DNA
    // relations that land on their first consumers (dna_chunks,
    // dna_roundtrip per the bench_budget comment) — always keep their
    // FIRST run: a re-run hits the session cache, and min() would
    // report a warm no-op as the build cost.
    val bestOf = math.max(1,
      sys.env.get("SPARK_GRAFT_BEST_OF").map(_.trim.toInt).getOrElse(1))
    def buildAttributed(n: String): Boolean =
      n.endsWith("_build") || n == "dna_chunks" || n == "dna_roundtrip"
    val results = SparkEntry.queries.toSeq
      .filter { case (name, _) => subset.forall(_.contains(name)) }
      .sortBy { case (name, _) =>
        (if (!name.endsWith("_build")) 3
         else buildTier.getOrElse(name, 0), name) }
      .map { case (name, fn) =>
      def once(): Double = {
        System.gc()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case e: Throwable =>
          failed += name
          System.err.println(s"[bench] QUERY FAILED: $name: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      val first = once()
      val t =
        if (bestOf <= 1 || buildAttributed(name) || failed.contains(name)) first
        else (first +: Seq.fill(bestOf - 1)(once())).min
      name -> t
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // per-query regression tripwire: compare against the committed
    // budget lines (bench_budget.json); a query at >2x its line is a
    // regression that must be either fixed or re-budgeted consciously
    val violations = Bench.budgetViolations(results)
    violations.foreach { case (name, t, b) =>
      System.err.println(f"[bench] BUDGET EXCEEDED: $name took $t%.2f s > 2x budget $b%.2f s")
    }
    val vjson = violations
      .map { case (n, t, b) => s"\"" + n + "\":{\"sec\":" + t + ",\"budget\":" + b + "}" }
      .mkString("{", ",", "}")
    val fjson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // `total_sec` REPEATS the total at the very end of the line: the
    // driver's artifact keeps the tail, so a head truncation must not
    // be able to drop the round's total. The full line is also written
    // to bench_last.json, committed per round as the durable record.
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","budget_violations":$vjson,"failed":$fjson,"total_sec":$total}"""
    println(json)
    // The durable record is written ONLY by a full-surface run under
    // the committed sizing: a subset run (SPARK_GRAFT_QUERIES), a
    // non-default shuffle width (SPARK_GRAFT_SHUFFLE), or best-of-N
    // re-runs would silently replace the committed artifact with
    // numbers measured under different conditions, schema-identical
    // and undetectable (the subset form of this reached a commit
    // twice before the guard existed). The stdout JSON still prints
    // for local reading either way.
    // SPARK_GRAFT_CPUS counts too (r12 advice): a non-default thread
    // count changes both parallelism and the shuffle default, and the
    // cpu count is not recorded in the JSON, so its clobber would be
    // schema-identical and undetectable
    val defaultConditions =
      subset.isEmpty && sys.env.get("SPARK_GRAFT_SHUFFLE").isEmpty &&
        sys.env.get("SPARK_GRAFT_CPUS").isEmpty && bestOf == 1
    if (!defaultConditions && subset.isEmpty)
      System.err.println(
        "[bench] non-default knobs set: bench_last.json NOT updated")
    // Load-contention guard (r13 verdict item 2): the env-knob guard
    // closed knob clobbers, but a full-surface run on a CONTENDED
    // machine still replaced the committed idle artifact with numbers
    // ~2x uniformly inflated (r13's end-of-round snapshot: 100.7 s
    // idle -> 160.5 s contended, 9 spurious violations, identical
    // code). A total regressing >1.5x vs the committed artifact is the
    // contention signature, not a plan change - refuse the write
    // unless SPARK_GRAFT_BENCH_FORCE=1 says "yes, this regression is
    // real and I want it recorded".
    val contentionGuardOk = {
      val prior = try {
        val txt = java.nio.file.Files.readString(
          java.nio.file.Paths.get("bench_last.json"))
        """"value"\s*:\s*([0-9][0-9.eE+-]*)""".r
          .findFirstMatchIn(txt).map(_.group(1).toDouble)
      } catch { case scala.util.control.NonFatal(_) => None }
      prior match {
        case Some(p) if total > 1.5 * p &&
            !sys.env.get("SPARK_GRAFT_BENCH_FORCE").contains("1") =>
          System.err.println(
            f"[bench] total $total%.1f s regresses >1.5x vs committed " +
              f"$p%.1f s - contention signature; bench_last.json NOT " +
              "updated (set SPARK_GRAFT_BENCH_FORCE=1 to override)")
          false
        case _ => true
      }
    }
    if (defaultConditions && contentionGuardOk)
      try
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("bench_last.json"), json + "\n")
      catch { case scala.util.control.NonFatal(e) =>
        // Files.writeString actually THROWS on I/O failure (PrintWriter
        // would swallow it behind its error flag and commit a truncated
        // "durable record")
        System.err.println(s"[bench] could not write bench_last.json: $e")
      }
    spark.stop()
  }

  /** Budget lines from bench_budget.json (flat name→seconds map; the
    * `_comment` key and absent file are tolerated so Bench never fails
    * on the guard itself).
    */
  def budgets(): Map[String, Double] = try {
    val src = scala.io.Source.fromFile("bench_budget.json")
    val txt = try src.mkString finally src.close()
    """"([A-Za-z0-9_]+)"\s*:\s*([0-9][0-9.eE+-]*)""".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  } catch { case scala.util.control.NonFatal(_) => Map.empty }

  /** A violation needs BOTH 2× the line and +300 ms over it: sub-0.2 s
    * lines double on pure scheduler jitter (observed 0.16 → 0.42 → 0.22
    * across back-to-back runs), and a flapping tripwire trains readers
    * to ignore it. Real regressions — a kernel going interpreted, a new
    * shuffle — blow through both terms.
    */
  def budgetViolations(results: Seq[(String, Double)]): Seq[(String, Double, Double)] = {
    val b = budgets()
    results.flatMap { case (name, t) =>
      b.get(name).collect {
        case line if t > 2 * line && t > line + 0.3 => (name, t, line)
      }
    }
  }
}
