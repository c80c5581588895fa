package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** Physical-plan regression guards: the properties the 100 TB design
  * depends on must survive refactors — filters reaching the parquet
  * scan, column pruning, broadcast joins on dimension tables, and no
  * accidental exchanges on scan-only queries.
  */
class PlanQualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def count(s: String, needle: String): Int =
    s.split('\n').count(_.contains(needle))

  test("q2: filters and 4-column projection reach the parquet scan") {
    val p = plan("q2_filter_scan")
    assert(p.contains("DataFilters: [isnotnull(l_shipdate"), p)
    val scanLine = p.split('\n').find(_.contains("FileScan parquet")).get
    // pruned read: shipdate/quantity/extendedprice/discount only
    assert(!scanLine.contains("l_orderkey") && !scanLine.contains("l_comment"), scanLine)
  }

  test("dimension joins broadcast (q3: 2, q13: 3, q14: 2), none sort-merge") {
    for ((q, n) <- Seq("q3_join_agg" -> 2, "q13_join_chain" -> 3,
        "q14_supplier_volume" -> 2)) {
      val p = plan(q)
      assert(count(p, "BroadcastHashJoin") == n, s"$q:\n$p")
      assert(count(p, "SortMergeJoin") == 0, s"$q has a sort-merge join")
    }
  }

  test("metadata projection never exchanges (mm_meta is scan+project only)") {
    val p = plan("mm_meta")
    assert(count(p, "Exchange") == 0, p)
  }

  test("build-once relations are actually reused: consumers read the cache") {
    // the round-7 session-cached relations (shingle hashes, exact-
    // Jaccard pairs, DNA chunks, fused file report): a refactor that
    // silently bypasses the cache re-runs the tokenize/encode kernels
    // per consumer — the regression this guards against. Build first,
    // then every consumer's plan must read InMemoryTableScan and not
    // re-plan the parquet scan of `documents`.
    Dedup.jaccardPairs(spark, sf).count()
    DnaPipeline.chunkRelation(spark, sf).count()
    DnaPipeline.fileReport(spark, sf).count()
    // (the InMemoryRelation node prints its stored BUILD plan — a
    // FileScan inside it is expected; what matters is that the
    // consumer's own access path is an InMemoryTableScan)
    for (q <- Seq("dedup_ngram_jaccard", "dedup_minhash_lsh", "dna_validate",
        "dna_stats", "pipe_status_report", "dna_roundtrip")) {
      val p = plan(q)
      assert(count(p, "InMemoryTableScan") >= 1, s"$q bypasses the cache:\n$p")
    }
  }

  test("similarity query-set predicate pushes into the scan") {
    val p = plan("sim_topk_bruteforce")
    assert(p.contains("% 100) = 0)"), p)
  }

  test("vector scoring runs as native codegen expressions, not Scala UDFs") {
    // the round-5 promotion: vector_dot/vector_norm walk ArrayData in
    // generated Java. A refactor back to a Scala UDF re-introduces
    // per-row Seq[Float] deserialization (measured 2-2.6x on every
    // similarity query) and shows up as ScalaUDF in the plan.
    for (q <- Seq("sim_topk_bruteforce", "dedup_semantic")) {
      val p = plan(q)
      assert(p.contains("vector_dot"), s"$q lost the native kernel:\n$p")
      assert(!p.toLowerCase.contains("scalaudf"),
        s"$q scores through a Scala UDF again:\n$p")
    }
  }

  test("scan-side pruning on the narrow text operators (doc_id+text only)") {
    val p = plan("txt_tokens")
    val scanLine = p.split('\n').find(_.contains("FileScan parquet")).get
    assert(!scanLine.contains("n_chars") && !scanLine.contains("source"), scanLine)
  }

  test("q16 JSON extraction scan reads only (event_type, props)") {
    val p = plan("q16_json_extract")
    val scanLine = p.split('\n').find(_.contains("FileScan parquet")).get
    assert(scanLine.contains("event_type") && scanLine.contains("props"), scanLine)
    assert(!scanLine.contains("user_id") && !scanLine.contains("value"), scanLine)
  }

  test("bm25: the query-term filter culls the token stream before any exchange") {
    // cost ∝ matching postings requires the isin(term) filter to run
    // map-side, under the tf aggregate's exchange — a filter above an
    // exchange would shuffle the whole corpus token stream first
    val p = plan("txt_bm25_topk")
    val lines = p.split('\n')
    val filterIdx = lines.indexWhere(l =>
      l.contains("Filter") && l.contains("spark"))
    val exchangeAbove = lines.take(filterIdx).count(_.contains("Exchange"))
    assert(filterIdx >= 0, s"no query-term filter in the plan:\n$p")
    // plan trees print root-first: exchanges BEFORE the filter line are
    // its ancestors. The filter's own subtree (scan → filter) must sit
    // under every exchange of its branch, so at least the tf-aggregate
    // exchange prints above it
    assert(exchangeAbove >= 1, s"term filter not below the tf exchange:\n$p")
    val scanIdx = lines.indexWhere(l => l.contains("FileScan parquet"),
      filterIdx)
    assert(scanIdx > filterIdx,
      s"term filter does not sit directly on the token stream:\n$p")
  }

  test("dedup_substring: df aggregate is map-side-combinable; dup semi-join broadcasts") {
    val p = plan("dedup_substring")
    // array_distinct makes the df count a plain partial_count aggregate
    // (no (g, doc_id) distinct exchange): exactly one HashAggregate
    // pair on the shingle key feeding the dup-set side
    assert(count(p, "BroadcastHashJoin") >= 1,
      s"dup-set semi-join did not broadcast:\n$p")
    // the only wide exchanges: the df aggregate on g and the per-doc
    // window; the final run aggregate must REUSE the window's doc_id
    // partitioning rather than adding a third
    assert(count(p, "Exchange hashpartitioning") <= 2,
      s"unexpected extra exchange:\n$p")
  }

  test("txt_shard: one map-side-combinable exchange to the 16-row audit, no window") {
    val p = plan("txt_shard")
    // the audit must be a single hash aggregate pair on the shard key
    // (partial count/sum/bit_xor collapse per split before the
    // exchange) — a second wide exchange or a window would mean the
    // layout audit shuffles the corpus instead of 16 partial rows
    assert(count(p, "Exchange hashpartitioning") == 1, p)
    assert(count(p, "Window") == 0, p)
  }

  test("txt_mix_sample: rate table broadcasts; corpus scan stays narrow") {
    val p = plan("txt_mix_sample")
    // the per-source rate relation joins back as a broadcast — a
    // sort-merge join here would shuffle the whole corpus on `source`
    // (a handful of hot keys) just to attach one double per row
    assert(count(p, "BroadcastHashJoin") >= 1, p)
    assert(count(p, "SortMergeJoin") == 0, p)
    // only the sources-sized count agg exchanges by hash; the keep
    // filter itself is row-local on the scan side of the join
    assert(count(p, "Exchange hashpartitioning") <= 1, p)
  }

  test("emb_outliers: centroid + threshold relations broadcast; no corpus window") {
    val p = plan("emb_outliers")
    // every tiny relation (label→centroid array twice — the dist
    // relation is re-derived per consumer — and label→p90) must
    // broadcast back; partitioning the corpus by ~10 labels — join or
    // window — is the skew anti-pattern txt_quality_gate eliminated
    assert(count(p, "BroadcastHashJoin") == 3, p)
    assert(count(p, "SortMergeJoin") == 0, p)
    assert(count(p, "Window") == 0, p)
    // wide exchanges: the (label, dim) + label centroid aggs (×2
    // consumers; identical subtrees, collapsed by ReuseExchange at
    // execution) and the label-keyed percentile agg (partial
    // value-count maps over 5-rounded dist2)
    assert(count(p, "Exchange hashpartitioning") <= 5, p)
  }

  test("IVF default probe plan has no candidate-dedup exchange (single assignment)") {
    // round-4 win: with assign=1 a vector reaches a query through at
    // most one probed cell, so the probe plan needs no dropDuplicates —
    // the only shuffle is the top-k window's q_id partition
    val p = plan("sim_ann_ivf")
    val dedupAgg = p.split('\n').filter(l =>
      l.contains("HashAggregate") && l.contains("q_id") && l.contains("n_id"))
    assert(dedupAgg.isEmpty, s"unexpected candidate dedup:\n$p")
    assert(count(p, "Exchange hashpartitioning") == 1, p)
  }

  test("embedding LSH candidate dedup ships no vectors through its exchange") {
    // round-4 win: multi-table collisions dedup on bare id pairs;
    // embeddings re-attach after — the dedup HashAggregate must not
    // carry embedding or norm columns
    val emb = graft.Tables.embeddings(spark, sf)
    val p = Dedup.embeddingLshPairs(emb, 0.9)
      .queryExecution.executedPlan.toString
    val dedupLines = p.split('\n').filter(l =>
      l.contains("HashAggregate") && l.contains("id_a"))
    assert(dedupLines.nonEmpty, s"expected an id-pair dedup aggregate in:\n$p")
    assert(dedupLines.forall(l => !l.contains("emb_") && !l.contains("nrm_")),
      s"vectors crossed the dedup exchange:\n$p")
  }

  test("per-row curation operators never exchange (txt_repetition, txt_redact, emb_project)") {
    // all are single-pass row kernels / regex maps — any Exchange is a
    // refactor accident that turns a linear scan into a shuffle
    for (q <- Seq("txt_repetition", "txt_redact", "emb_project")) {
      val p = plan(q)
      assert(count(p, "Exchange") == 0, s"$q:\n$p")
    }
  }

  test("stratified sample pre-filters before the rank window sees rows") {
    // the md5-prefix filter must run below the window (cutting its
    // input), not above it — above would rank the whole corpus
    val p = plan("txt_stratified_sample")
    val lines = p.split('\n')
    val winIdx = lines.indexWhere(_.contains("RunningWindowFunction")) match {
      case -1 => lines.indexWhere(_.contains("Window"))
      case i  => i
    }
    val filterIdx = lines.lastIndexWhere(l =>
      l.contains("Filter") && l.contains("md5"))
    assert(winIdx >= 0 && filterIdx > winIdx,
      s"hash pre-filter is not below the window:\n$p")
  }

  test("decontamination joins gram hashes, never gram strings or token arrays") {
    // the inverted-index join must move 8-byte hashes; a join carrying
    // the token arrays or gram strings re-creates the 7.4 s plan
    val p = plan("txt_decontaminate")
    val joinLines = p.split('\n').filter(_.contains("Join"))
    assert(joinLines.nonEmpty, p)
    assert(joinLines.forall(l => l.contains("gh") && !l.contains("ts#") &&
      !l.contains("text#")), s"join is not on bare gram hashes:\n$p")
  }

  test("dedup_embedding runs no driver collect: construction is fully lazy") {
    // Round-1 regression: the query used to collect() the whole
    // embeddings table to the driver while BUILDING the DataFrame (a
    // 100 TB corpus kills the driver before the query even runs). The
    // blocked self-join plan is declarative: constructing it must
    // launch zero Spark jobs.
    val dataJobs = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("")
        // `spark.read.parquet` schema inference reads one footer on
        // every read call — a metadata job, not a data collect
        if (!site.startsWith("parquet at tables.scala")) { dataJobs.add(site); () }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = SparkEntry.queries("dedup_embedding")(spark, sf)
      df.queryExecution.executedPlan // force planning too, not just analysis
      Thread.sleep(1000) // listener bus is async; collect jobs would have been posted already
      assert(dataJobs.isEmpty,
        s"dedup_embedding construction launched Spark job(s): $dataJobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("bloom prefilter culls the raw gram stream map-side, below the join") {
    // the whole point of the sketch: mightContain must run on the
    // train side's raw gram stream (directly over its Generate), below
    // the join and below any exchange the grams would cross — a filter
    // above the join means the join moved every gram and the sketch
    // bought nothing. At fixture scale the eval side broadcasts, so
    // the train stream crosses NO exchange at all (the strongest form:
    // scan → gram explode → bloom cull → joined in the map stage).
    val p = plan("txt_bloom_decontaminate")
    val lines = p.split('\n')
    val fi = lines.indexWhere(_.contains("bloom_might_contain"))
    val ji = lines.indexWhere(l => l.contains("Join") && l.contains("gh"))
    assert(fi >= 0, s"bloom filter missing from the plan:\n$p")
    // first occurrence is the probe branch (printed first); between
    // the join and the filter at most shuffle/sort plumbing — never an
    // aggregate or the Generate itself (which would put the filter on
    // the wrong side of the gram explode)
    assert(ji >= 0 && fi > ji, s"bloom filter is not below the join:\n$p")
    assert(!lines.slice(ji + 1, fi).exists(l =>
      l.contains("HashAggregate") || l.contains("Generate")),
      s"bloom filter does not sit on the raw gram stream:\n$p")
  }

  test("vocab top-V is a TakeOrdered heap over one token-keyed exchange, not a global sort") {
    val p = plan("txt_vocab")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(count(p, "Exchange hashpartitioning(token") == 1, p)
    // below the heap (deeper in the tree) sits only the agg + scan: a
    // Sort there would mean the full token relation is globally sorted
    // before the top-V — the O(n log n) plan TakeOrdered exists to
    // avoid. (The id window's own Sort above the heap ranks V rows.)
    val lines = p.split('\n')
    val toi = lines.indexWhere(_.contains("TakeOrderedAndProject"))
    assert(toi >= 0 && !lines.drop(toi + 1).exists(_.contains("Sort ")),
      s"global sort below the top-V heap:\n$p")
  }

  test("training windows never exchange (row-local explode)") {
    val p = plan("txt_windows")
    assert(count(p, "Exchange") == 0, s"txt_windows:\n$p")
  }

  test("curation pipeline fuses: quality gate sits directly on a scan, no materialization") {
    // the composition contract: chaining the four curation stages must
    // not change how the first stage plans — the length/alpha/ttr gate
    // still evaluates adjacent to the documents scan (no exchange in
    // between), and no stage materializes an intermediate
    val p = plan("pipe_curate")
    val lines = p.split('\n')
    val fi = lines.indexWhere(l =>
      l.contains("Filter") && l.contains("length(text"))
    assert(fi >= 0, s"quality-gate filter missing from the plan:\n$p")
    val si = lines.indexWhere(_.contains("FileScan parquet"), fi)
    assert(si > fi &&
      !lines.slice(fi + 1, si).exists(_.contains("Exchange")),
      s"quality gate is not scan-adjacent:\n$p")
    assert(!p.contains("InMemoryTableScan"),
      s"unexpected materialization between curation stages:\n$p")
  }

  test("IVF-PQ coarse pass reads (vec_id, cell) + codes — corpus vectors only reach the re-rank") {
    // the composition's point at 10⁹ vectors: the cell-keyed candidate
    // join ships 8-code rows, never the 256-byte embeddings. A
    // refactor that joins the full `assigned` relation (it carries
    // embedding + nrm) silently re-ships the vectors through the
    // coarse join — visible as those columns on the cached-index scan.
    val p = plan("sim_ann_ivfpq")
    val cellScans = p.split('\n')
      .filter(l => l.contains("InMemoryTableScan") && l.contains("cell"))
    assert(cellScans.nonEmpty, s"expected a cached (vec_id, cell) scan:\n$p")
    assert(cellScans.forall(l => !l.contains("embedding") && !l.contains("nrm")),
      s"coarse pass ships corpus vectors:\n$p")
  }

  test("residual IVF-PQ coarse pass ships codes, not corpus vectors") {
    // same contract as the raw composition: the cell-keyed candidate
    // join carries (vec_id, cell, codes) — the 256-byte embeddings
    // only reach the exact re-rank
    val p = plan("sim_ann_ivfpq_res")
    val cellScans = p.split('\n')
      .filter(l => l.contains("InMemoryTableScan") && l.contains("codes"))
    assert(cellScans.nonEmpty, s"expected a cached residual-codes scan:\n$p")
    assert(cellScans.forall(l => !l.contains("embedding") && !l.contains("nrm")),
      s"residual coarse pass ships corpus vectors:\n$p")
  }

  test("no declared query windows over bare `source` (class-wide skew guard)") {
    // A Window whose ONLY partition key is `source` routes every
    // document of a source through one task and buffers the partition
    // whole — at 100 TB with a handful of sources that is an unbounded
    // single-task sort. Per-source statistics must be two-phase
    // aggregates (partial map-side, merged per source) joined back,
    // the shape txt_quality_gate moved to in round 8. Guarded
    // class-wide so no future operator re-introduces the pattern.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    // the one principled exception: txt_stratified_sample's FINAL
    // re-rank window reads at most StratSalts×StratQuota rows per
    // source — a constant fixed by phase 1's (source, salt) partial
    // rank, not a corpus-scaled partition. Pinned below: exactly one
    // source-only window, and the salted phase-1 window must exist.
    val boundedFinalRank = Set("txt_stratified_sample")
    // the other principled exception: cum-sum / total windows that run
    // over a HISTOGRAM aggregate — at most sources × distinct-value
    // rows, a bounded domain that is corpus-size-INDEPENDENT (the
    // whole point of those queries). Pinned structurally per query:
    // every source-only window must sit above an Aggregate keyed on
    // the named histogram value column, so a refactor that windows raw
    // documents again trips the guard. txt_len_quantiles buckets on
    // token length; txt_ppl_buckets on the ROUNDED bigram nll (domain
    // bounded by value range × 10⁵, never the corpus).
    val boundedHistogram = Map(
      "txt_len_quantiles" -> "len", "txt_ppl_buckets" -> "nll",
      "txt_token_budget" -> "nll")
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      val lp = SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
      val wins = lp.collect { case w: LWindow => w }
      val bad = wins.filter(w => w.partitionSpec.nonEmpty &&
        w.partitionSpec.flatMap(_.references.toSeq).map(_.name).distinct == Seq("source"))
      if (boundedFinalRank(name)) {
        assert(bad.length == 1 && wins.exists(
          _.partitionSpec.flatMap(_.references.toSeq).map(_.name).contains("salt")),
          s"$name lost its bounded two-phase rank shape:\n$lp")
      } else if (boundedHistogram.contains(name)) {
        val key = boundedHistogram(name)
        assert(bad.nonEmpty && bad.forall(_.child.collectFirst {
          case a: Aggregate
            if a.groupingExpressions.exists(_.references.exists(_.name == key)) => a
        }.nonEmpty),
          s"$name's source windows no longer read the bounded (source, $key) histogram:\n$lp")
      } else assert(bad.isEmpty,
        s"$name has a Window partitioned solely by `source`:\n${bad.mkString("\n")}")
    }
  }

  test("retention collapses events map-side before its first exchange") {
    // the (user, day) distinct must partial-aggregate on the scan side
    // — the wide event stream crosses its only exchange pre-collapsed
    val p = plan("evt_retention")
    assert(count(p, "HashAggregate(keys=[user_id") >= 2,
      s"no map-side (user, day) partial dedup:\n$p")
  }

  test("round-9 row-local operators never exchange (emb_pca/recon/whiten, txt_c4_rules, pca_build)") {
    for (q <- Seq("emb_pca", "emb_pca_recon", "emb_whiten", "txt_c4_rules")) {
      val p = plan(q)
      assert(count(p, "Exchange") == 0, s"$q grew a shuffle:\n$p")
    }
    // the trained model is a driver-local relation — plan is a bare
    // LocalTableScan, no Spark job beyond emitting it
    val pb = plan("pca_build")
    assert(count(pb, "Exchange") == 0 && pb.contains("LocalTableScan"), pb)
  }

  test("BPE: encode pass never exchanges; the merge table is a driver-local relation") {
    // txt_bpe_tokens is ONE narrow scan — the model rides the udf
    // closure, so a 100 TB encode pass shuffles nothing
    for (q <- Seq("txt_bpe_tokens", "txt_bpe_encode", "txt_windows_bpe")) {
      val p = plan(q)
      assert(count(p, "Exchange") == 0, s"$q grew a shuffle:\n$p")
    }
    val pb = plan("bpe_build")
    assert(count(pb, "Exchange") == 0 && pb.contains("LocalTableScan"), pb)
  }

  test("sim_ann_pca: query sides broadcast; corpus vectors only reach the re-rank join") {
    val p = plan("sim_ann_pca")
    // coarse pass: broadcast projected queries x projected-index scan;
    // fine pass: broadcast full-width query set into the candidate
    // re-rank — the wide corpus never sort-merges on either stage
    assert(count(p, "BroadcastHashJoin") >= 2, s"query sides not broadcast:\n$p")
    assert(count(p, "SortMergeJoin") == 0, s"corpus-side sort-merge appeared:\n$p")
  }

  test("dedup_lines ships 8-byte line hashes through its shuffles, never line text") {
    val p = plan("dedup_lines")
    // election + verify exchanges key on the xxhash64 column
    assert(p.contains("hashpartitioning(lh"), p)
    assert(!p.split('\n').exists(_.contains("hashpartitioning(line")),
      s"line text became a shuffle key:\n$p")
    // keeper election partial-aggregates map-side (the skew collapse)
    assert(count(p, "partial_min") >= 1, s"no map-side keeper partial:\n$p")
  }

  test("evt_anomaly: per-type stats broadcast back; no window over the daily series") {
    val p = plan("evt_anomaly")
    assert(count(p, "BroadcastHashJoin") == 1 && count(p, "SortMergeJoin") == 0, p)
    assert(count(p, "Window") == 0, s"daily series grew a window:\n$p")
  }

  test("pipe_train_manifest: text never reappears past the curate stages") {
    // the manifest agg consumes (doc_id, n_tokens) scalars; a refactor
    // that re-reads document text for the shard keys would show a
    // second text-bearing scan feeding the final aggregate
    val p = plan("pipe_train_manifest")
    assert(count(p, "HashAggregate(keys=[shard") >= 2,
      s"no map-side manifest partial:\n$p")
  }

  test("evt_dau_mau: map-side user-day collapse, bounded explode, broadcast day join") {
    val p = plan("evt_dau_mau")
    // the distinct partial-aggregates before the exchange (twice: the
    // raw user-day collapse and the post-explode contribution dedup)
    assert(count(p, "HashAggregate(keys=[user_id") >= 2, p)
    // the 30-day contribution is a Generate explode, never a window
    assert(count(p, "Generate explode") >= 1 && count(p, "Window") == 0, p)
    // the per-day DAU/MAU relations are tiny: their join broadcasts
    assert(count(p, "BroadcastHashJoin") == 1 && count(p, "SortMergeJoin") == 0, p)
  }

  test("incremental dedup probes: the batch's bucket set is pushed into the stored scan") {
    // the 100 TB contract of the incremental shape: the stored band
    // relation is read under the batch's (band/table, bucket) filter —
    // partition pruning on the directory column plus a pushed bucket
    // predicate — never scanned in full below the cap
    for ((name, part, bucketCol) <- Seq(
        ("dedup_minhash_incremental", "band", "bucket"),
        ("dedup_embedding_incremental", "table", "bucket"),
        ("dedup_phash_incremental", "band", "bval"))) {
      val p = plan(name)
      // identify the stored-band scans by their non-empty partition
      // filter on the directory column (paths truncate in the plan
      // string, so match structure, not the location); the collapse-
      // first phash probe legitimately has TWO — the (band, bval)-
      // pruned hash-qualification scan and the single-band-directory
      // member expansion — so the pin asserts at least one scan
      // carries the pushed bucket set
      val bandScans = p.split('\n').filter { l =>
        val i = l.indexOf("PartitionFilters: [")
        l.contains("FileScan parquet") && i >= 0 &&
          l.substring(i).contains(s"$part#")
      }
      assert(bandScans.nonEmpty,
        s"$name: no stored scan with a $part partition filter:\n$p")
      assert(bandScans.exists(l =>
        l.contains(s"In($bucketCol") || l.contains(s"$bucketCol#")),
        s"$name: bucket set not pushed: ${bandScans.mkString("\n")}")
    }
  }

  test("evt_concurrency: bucket equi-joins only — never a theta join") {
    // the whole point of the interior/edge decomposition: a
    // point-in-interval join with no equi key must NOT fall back to
    // BroadcastNestedLoopJoin/CartesianProduct — the bucket id is the
    // equi key and the range predicate rides as a residual
    val p = plan("evt_concurrency")
    assert(count(p, "BroadcastNestedLoopJoin") == 0 &&
      count(p, "CartesianProduct") == 0, p)
    // event scans prune to the 3 used columns
    val evScan = p.split('\n').find(l =>
      l.contains("FileScan parquet") && l.contains("events")).get
    assert(!evScan.contains("props"), s"unused columns not pruned: $evScan")
  }

  test("dedup_cdc: shuffles key on the 8-byte chunk hash, never chunk text") {
    val p = plan("dedup_cdc")
    // df aggregate + probe join exchange on the hash column; document
    // text never becomes a shuffle key (chunks travel as (h, l) pairs)
    assert(p.contains("hashpartitioning(h"), p)
    assert(!p.split('\n').exists(_.contains("hashpartitioning(text")),
      s"text became a shuffle key:\n$p")
  }

  test("dedup_cdc_incremental: touched buckets are pushed into the stored chunk scan") {
    val p = plan("dedup_cdc_incremental")
    val idxScan = p.split('\n').find { l =>
      val i = l.indexOf("PartitionFilters: [")
      l.contains("FileScan parquet") && i >= 0 && l.substring(i).contains("bkt#")
    }
    assert(idxScan.isDefined,
      s"no stored scan with a bkt partition filter:\n$p")
  }

  test("takedown probes keep their pruning THROUGH the tombstone anti-join") {
    // the scaladoc claim made checkable: a LEFT ANTI join's left side
    // passes partition/pushed filters through, so a tombstoned layout
    // probes exactly the row groups the un-tombstoned one did. Checked
    // on the two r16 tombstone families (the ANN families are pinned
    // by IndexDeleteSpec).
    val pp = plan("dedup_phash_purged")
    assert(pp.split('\n').exists(_.contains("LeftAnti")),
      s"phash purged probe lost its tombstone anti-join:\n$pp")
    // collapse-first probe: the hash-qualification scan keeps the
    // pushed (band, bval) set; the member-expansion scan (where the
    // tombstone anti-join lives) prunes to one band directory
    val ppScans = pp.split('\n').filter { l =>
      val i = l.indexOf("PartitionFilters: [")
      l.contains("FileScan parquet") && i >= 0 && l.substring(i).contains("band#")
    }
    assert(ppScans.nonEmpty,
      s"phash purged: no stored scan with a band partition filter:\n$pp")
    assert(ppScans.exists(l => l.contains("bval#") || l.contains("In(bval")),
      s"phash purged: bucket set not pushed: ${ppScans.mkString("\n")}")

    val cp = plan("evt_concurrency_purged")
    assert(cp.split('\n').exists(_.contains("LeftAnti")),
      s"concurrency purged serve lost its tombstone anti-join:\n$cp")
    val cpScan = cp.split('\n').find { l =>
      val i = l.indexOf("PartitionFilters: [")
      l.contains("FileScan parquet") && i >= 0 && l.substring(i).contains("day#")
    }
    assert(cpScan.isDefined,
      s"concurrency purged: no stored scan with a day partition filter:\n$cp")
    assert(cpScan.get.contains("bkt#") || cpScan.get.contains("In(bkt"),
      s"concurrency purged: bucket set not pushed: ${cpScan.get}")
  }

  test("semantic takedown probe: cell pruning pushes through the tombstone anti-join") {
    // the r17 family: the stored-assignments scan must carry the
    // batch's probed-cell partition filter even with tombstones
    // anti-joined on its left side, and the collapsed pHash takedown
    // probe keeps the (band, bval) pushdown of its incremental twin
    val sp = plan("dedup_semantic_purged")
    assert(sp.split('\n').exists(_.contains("LeftAnti")),
      s"semantic purged probe lost its tombstone anti-join:\n$sp")
    val spScan = sp.split('\n').find { l =>
      val i = l.indexOf("PartitionFilters: [")
      l.contains("FileScan parquet") && i >= 0 && l.substring(i).contains("cell#")
    }
    assert(spScan.isDefined,
      s"semantic purged: no stored scan with a cell partition filter:\n$sp")

    val gp = plan("dedup_phash_purged_collapsed")
    val gpScan = gp.split('\n').find { l =>
      val i = l.indexOf("PartitionFilters: [")
      l.contains("FileScan parquet") && i >= 0 && l.substring(i).contains("band#")
    }
    assert(gpScan.isDefined,
      s"collapsed phash purged: no stored scan with a band partition filter:\n$gp")
    assert(gpScan.get.contains("bval#") || gpScan.get.contains("In(bval"),
      s"collapsed phash purged: bucket set not pushed: ${gpScan.get}")
  }

  test("evt_concurrency_stored: the edge scan is day-pruned and bucket-pushed") {
    val p = plan("evt_concurrency_stored")
    val edgeScan = p.split('\n').find { l =>
      val i = l.indexOf("PartitionFilters: [")
      l.contains("FileScan parquet") && i >= 0 && l.substring(i).contains("day#")
    }
    assert(edgeScan.isDefined,
      s"no stored scan with a day partition filter:\n$p")
    assert(edgeScan.get.contains("bkt#") || edgeScan.get.contains("In(bkt"),
      s"bucket set not pushed: ${edgeScan.get}")
  }

  test("dedup_embedding_window: the id cap is a pushed scan predicate") {
    // the window query's whole point is O(K²) cost at any corpus
    // scale — that holds only if vec_id < K reaches the parquet scan
    // (reading the corpus then filtering would be O(n) scan + O(K²))
    val p = plan("dedup_embedding_window")
    val scans = p.split('\n').filter(_.contains("FileScan parquet"))
    assert(scans.nonEmpty, p)
    assert(p.contains(s"LessThan(vec_id,${Dedup.EmbWindowK})"),
      s"id window not pushed to the scan:\n$p")
  }

  test("evt_asof: type filter in the scan, ONE exchange, never an inequality join") {
    val p = plan("evt_asof")
    // the as-of is a window over one user-keyed exchange — a refactor
    // that reintroduces a theta join (BNLJ/cartesian) or a second
    // shuffle is exactly the 100 TB regression this pins
    assert(count(p, "Exchange") == 1, p)
    assert(count(p, "BroadcastNestedLoopJoin") == 0 &&
      count(p, "CartesianProduct") == 0, p)
    val scanLine = p.split('\n').find(_.contains("FileScan parquet")).get
    assert(scanLine.contains("event_type"), s"type filter not in scan: $scanLine")
    assert(!scanLine.contains("props") && !scanLine.contains("value"),
      s"unused columns not pruned: $scanLine")
  }

  test("evt_asof auto-selects the 2-pass form on detected skew, answer unchanged") {
    // r13 verdict stretch item 8: the declared evt_asof probes max
    // per-user row count and swaps in asofTwoPass past the task-size
    // threshold. Forcing the threshold to 0 must take the 2-pass
    // branch (visible as the chunk-summary join the windowed plan
    // cannot contain) with the windowed branch's exact rows; the
    // default threshold on the fixture must stay on the one-exchange
    // windowed plan (pinned by the evt_asof plan test above).
    val windowed = Relational.asofWindowed(spark, sf)
    val forced = Relational.asofAuto(spark, sf, threshold = 0L)
    assert(count(forced.queryExecution.executedPlan.toString, "Exchange") > 1,
      "threshold=0 did not select the 2-pass plan")
    val rows = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.toSeq).toSet
    assert(rows(forced) == rows(windowed),
      "auto-selected 2-pass answer drifted from the windowed form")
    assert(Relational.maxUserRows(spark, sf) > 0)
  }

  test("evt_attrib_window: binned equi-join carries the range residual, no theta join") {
    val p = plan("evt_attrib_window")
    assert(count(p, "BroadcastNestedLoopJoin") == 0 &&
      count(p, "CartesianProduct") == 0,
      s"range join degenerated to a theta join:\n$p")
    // the range predicate must ride the equi-join as a residual, not
    // disappear: the join line (BHJ here, SMJ at scale) carries it
    val joinLine = p.split('\n')
      .find(l => l.contains("HashJoin") || l.contains("SortMergeJoin"))
    assert(joinLine.isDefined, p)
    assert(joinLine.get.contains(">="), s"range residual missing: ${joinLine.get}")
  }

  test("txt_decontaminate_fuzzy: classify pass reuses the cached pair relation") {
    Dedup.jaccardPairs(spark, sf).count()
    val p = plan("txt_decontaminate_fuzzy")
    assert(p.contains("InMemoryTableScan"),
      s"fuzzy decontamination re-built the pair relation instead of reading the cache:\n$p")
  }

  test("pipe_data_audit: FK checks run as broadcast anti-joins, never sort-merge") {
    // at bench SF the dim sides broadcast; the guard is that no check
    // degenerates into a sort-merge (which would mean a full exchange
    // of the fact table per constraint)
    val p = plan("pipe_data_audit")
    assert(count(p, "BroadcastHashJoin") >= 2 &&
      p.contains("LeftAnti") && count(p, "SortMergeJoin") == 0,
      s"audit anti-joins lost their broadcast shape:\n$p")
  }

  test("txt_drift_kl: term totals reuse the (source, term) exchange — one tokenize") {
    // the join's right branch rolls term totals up FROM the left's
    // (source, term) aggregate; both branches share one canonicalized
    // shuffle, so the RUNTIME plan must tokenize the corpus ONCE. The
    // contract is single-tokenize, not the optimizer's spelling of it:
    // exchange/stage reuse is best-effort across Spark versions, so
    // the reuse markers are accepted as evidence but the stable
    // assertion is the documents-scan count in the final adaptive plan
    // (a reused branch prints a ReusedQueryStage stub, not a second
    // FileScan). The configs the behavior depends on are pinned here
    // rather than assumed from defaults.
    spark.conf.set("spark.sql.exchange.reuse", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val df = SparkEntry.queries("txt_drift_kl")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val reused = p.contains("ReusedQueryStage") || p.contains("ReusedExchange")
    val docScans = p.linesIterator
      .count(l => l.contains("Scan parquet") && l.contains("documents"))
    assert(reused || docScans <= 1,
      s"no reused stage and $docScans documents scans — " +
        s"the corpus is tokenized twice:\n$p")
  }
}
