package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-15 additions the DuckDB oracle states only
  * end-to-end: the CDC chunker's kernel laws (tiling, edit locality —
  * the property that makes content-defined boundaries the scale answer
  * to sub-document dedup), evt_concurrency's interior/edge bucket
  * decomposition against the naive point-in-interval join (including a
  * directed multi-hour session that forces the interior path), and
  * txt_ppl_buckets' tercile arithmetic over the shared bigram score.
  */
class CdcConcurrencySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  // --- cdcChunks kernel laws ---------------------------------------

  test("cdc chunks tile the text exactly: lengths sum, hashes match slices") {
    val text = "The quick brown fox jumps over the lazy dog. " * 20
    val chunks = Dedup.cdcChunks(text)
    val cps = text.codePoints().toArray
    assert(chunks.map(_._2).sum == cps.length, "chunk lengths must tile the text")
    assert(chunks.forall(_._2 > 0), "no empty chunks")
    // each chunk's hash is fnv1a of the corresponding code-point slice
    var off = 0
    chunks.foreach { case (h, l) =>
      val slice = new String(cps, off, l)
      assert(Dedup.fnv1a(slice) == h, s"chunk at $off hashes its slice")
      off += l
    }
  }

  test("cdc edge cases: empty none, sub-window one chunk, astral code points") {
    assert(Dedup.cdcChunks("").isEmpty)
    assert(Dedup.cdcChunks(null).isEmpty)
    val short = "hello world!" // 12 cps < window 16
    assert(Dedup.cdcChunks(short) == Seq((Dedup.fnv1a(short), 12)))
    // astral-plane text: lengths count CODE POINTS (what DuckDB's
    // len/substr state), never UTF-16 units
    val emoji = new String(Character.toChars(0x1F600)) * 40
    val ch = Dedup.cdcChunks(emoji)
    assert(ch.map(_._2).sum == 40)
  }

  test("cdc edit locality: a 1-char edit far from both ends disturbs O(1) chunks") {
    val rnd = new scala.util.Random(42)
    def rndText(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val a = rndText(600)
    val b = rndText(600)
    val orig = a + "x" + b
    val edit = a + "y" + b
    val co = Dedup.cdcChunks(orig)
    val ce = Dedup.cdcChunks(edit)
    // boundary decisions whose window excludes the edited position are
    // identical, so all but the chunks overlapping the edit's window
    // neighborhood survive — the multiset symmetric difference is a
    // handful of chunks, never proportional to the text
    val mo = co.groupBy(identity).view.mapValues(_.size).toMap
    val me = ce.groupBy(identity).view.mapValues(_.size).toMap
    val diff = (mo.keySet ++ me.keySet).toSeq
      .map(k => math.abs(mo.getOrElse(k, 0) - me.getOrElse(k, 0))).sum
    assert(diff <= 6, s"edit disturbed $diff chunk instances (expected O(1))")
    // a fixed-width chunker would shift EVERY boundary after the edit;
    // sanity-check the property is non-trivial: the texts do differ
    assert(co != ce)
  }

  test("dedup_cdc: shared spans are duplicated mass, unique docs carry none") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("cdcdocs").toString
    val shared = ("content defined chunking splits documents at rolling " +
      "hash cut points so shared passages land in identical chunks " +
      "regardless of their offset within the carrying document. ") * 3
    val docs = Seq(
      (1L, "PREFIX ALPHA " * 10 + shared, "en", "a", 0L),
      (2L, "completely different lead-in text " * 8 + shared, "en", "a", 0L),
      (3L, "ZZZZ 9999 @@@@ unique untiled content 0123456789 " * 12, "en", "a", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Dedup.queries("dedup_cdc")(spark, tmp)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // both carriers of the shared passage see duplicated chunk mass
    assert(out(1L)._2 > 0 && out(1L)._3 > 200, s"doc 1 dup mass: ${out(1L)}")
    assert(out(2L)._2 > 0 && out(2L)._3 > 200, s"doc 2 dup mass: ${out(2L)}")
    // the unique doc shares nothing
    assert(out(3L)._2 == 0 && out(3L)._3 == 0, s"doc 3 should be clean: ${out(3L)}")
    // totals are sane: dup counts bounded by totals
    out.values.foreach { case (n, dn, _) => assert(dn <= n) }
  }

  test("dedup_containment catches a small doc pasted inside a big one; jaccard misses it") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("contdocs").toString
    // doc 1: a short notice. doc 2: the same notice embedded in a much
    // longer carrier — containment(1→2) ≈ 1 while jaccard = |A|/|B| ≪ 0.6.
    val notice = "this material is licensed under the creative commons " +
      "attribution share alike license version four point zero " +
      "as published by the creative commons foundation"
    val filler = (1 to 40).map(i =>
      s"paragraph $i discusses entirely unrelated subject matter " +
        s"number $i with vocabulary specific to section $i").mkString(" ")
    val docs = Seq(
      (1L, notice, "en", "a", 0L),
      (2L, filler + " " + notice + " " + filler.replace("paragraph", "chapter"), "en", "a", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val cont = Dedup.queries("dedup_containment")(spark, tmp).collect()
    assert(cont.length == 1, s"expected the embedded pair, got ${cont.mkString(";")}")
    val r = cont.head
    assert(r.getAs[Long]("contained_id") == 1L)
    assert(r.getAs[Double]("containment") >= 0.95)
    assert(r.getAs[Double]("jaccard") < Dedup.JaccardThreshold,
      "fixture must be a pair jaccard rejects — otherwise the test proves nothing")
    val jac = Dedup.queries("dedup_ngram_jaccard")(spark, tmp).collect()
    assert(jac.isEmpty, s"jaccard should miss the asymmetric pair: ${jac.mkString(";")}")
  }

  test("dedup_cdc_cluster: shared-passage carriers cluster; the unique doc stays out") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("cdcclu").toString
    val shared = ("a passage long enough to clear the shared-mass threshold " +
      "when both carriers chunk it at identical content-defined cuts ") * 4
    val docs = Seq(
      (1L, "LEAD ONE " * 12 + shared, "en", "a", 0L),
      (2L, "totally different opener text " * 9 + shared, "en", "a", 0L),
      (3L, "XQZV 77 unrelated filler content with private vocabulary " * 10, "en", "a", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val cc = Dedup.queries("dedup_cdc_cluster")(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.keySet == Set(1L, 2L), s"unexpected membership: $cc")
    assert(cc(1L) == 1L && cc(2L) == 1L, s"wrong representative: $cc")
  }

  test("dedup_cdc_incremental: probe equals the kernel reference; append ≡ rebuild") {
    import org.apache.spark.sql.functions.col
    val dirA = java.nio.file.Files.createTempDirectory("cdcidxA").toString
    Dedup.writeCdcIndex(spark, sf, dirA, col("doc_id") % Dedup.IncrementalMod =!= 0)
    val out = Dedup.incrementalCdcMass(spark, sf, dirA).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // driver-recomputed reference straight from the kernel (500 docs)
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val oldH = docs.filter(_._1 % Dedup.IncrementalMod != 0)
      .flatMap(kv => Dedup.cdcChunks(kv._2).map(_._1)).toSet
    val expect = docs.filter(_._1 % Dedup.IncrementalMod == 0).map { case (id, t) =>
      val ch = Dedup.cdcChunks(t)
      id -> ((ch.size.toLong,
        ch.count(c => oldH(c._1)).toLong,
        ch.filter(c => oldH(c._1)).map(_._2.toLong).sum))
    }.toMap
    assert(out == expect)
    // append parity: half the history at build, the rest appended —
    // the probe must not be able to tell
    val dirB = java.nio.file.Files.createTempDirectory("cdcidxB").toString
    val old = col("doc_id") % Dedup.IncrementalMod =!= 0
    Dedup.writeCdcIndex(spark, sf, dirB, old && col("doc_id") % 2 === 0)
    Dedup.appendToCdcIndex(spark, sf, dirB, old && col("doc_id") % 2 =!= 0)
    val appended = Dedup.incrementalCdcMass(spark, sf, dirB).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(appended == out, "append+probe diverged from rebuild+probe")
  }

  // --- evt_concurrency ----------------------------------------------

  /** Naive point-in-interval reference computed in-test: sessions by
    * the same gap rule, then a BETWEEN join — what the bucket
    * decomposition must equal exactly.
    */
  private def naiveConcurrency(dir: String) = {
    import spark.implicits._
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts_ms", $"event_id")
    val ev = graft.Tables.events(spark, dir)
      .select($"user_id", $"event_id", expr("unix_micros(ts) div 1000").as("ts_ms"))
    val sess = ev
      .withColumn("prev", lag($"ts_ms", 1).over(byUser))
      .withColumn("brk", when($"prev".isNull || $"ts_ms" - $"prev" > Relational.SessionGapMs, 1L).otherwise(0L))
      .withColumn("session_idx", sum($"brk").over(byUser.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy($"user_id", $"session_idx")
      .agg(min($"ts_ms").as("s_ms"), max($"ts_ms").as("e_ms"))
    val other = ev.select($"user_id".as("e_user"), $"ts_ms")
    sess.join(other,
        $"ts_ms" >= $"s_ms" && $"ts_ms" <= $"e_ms" && $"e_user" =!= $"user_id",
        "left")
      .groupBy($"user_id", $"session_idx")
      .agg(count($"ts_ms").as("n_concurrent"))
  }

  test("evt_concurrency equals the naive interval join on the real corpus") {
    val fast = Relational.queries("evt_concurrency")(spark, sf)
    val naive = naiveConcurrency(sf)
    assert(fast.count() == naive.count())
    assert(fast.except(naive).count() == 0 && naive.except(fast).count() == 0,
      "bucket decomposition diverged from the naive interval join")
  }

  test("evt_concurrency interior path: a multi-hour session counts interior-bucket events exactly") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("concfix").toString
    val base = 1700000000000L // ms epoch
    // user 1: one 6-hour session (events every 20 min — never breaks
    // the 30-min gap), guaranteeing interior buckets (b1-b0 >= 2)
    val longSession = (0 to 18).map(i =>
      (100L + i, base + i * 1200000L, 1L, "view", 1.0, "{}"))
    // user 2: events scattered across those hours — some inside
    // interior buckets of user 1's session, some outside the session
    val scattered = Seq(
      (200L, base + 90 * 60000L, 2L, "click", 1.0, "{}"),   // h1.5: interior
      (201L, base + 150 * 60000L, 2L, "click", 1.0, "{}"),  // h2.5: interior
      (202L, base + 10 * 60000L, 2L, "click", 1.0, "{}"),   // h0: edge bucket, in range
      (203L, base - 3600000L, 2L, "click", 1.0, "{}"),      // before: out of range
      (204L, base + 9 * 3600000L, 2L, "click", 1.0, "{}"))  // after: out of range
    val df = (longSession ++ scattered)
      .toDF("event_id", "ts_ms", "user_id", "event_type", "value", "props")
      .select($"event_id", timestamp_millis($"ts_ms").as("ts"),
        $"user_id", $"event_type", $"value", $"props")
    df.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val fast = Relational.queries("evt_concurrency")(spark, tmp)
    val naive = naiveConcurrency(tmp)
    assert(fast.except(naive).count() == 0 && naive.except(fast).count() == 0)
    // and the directed expectation: user 1's long session sees exactly
    // the three in-range user-2 events
    val u1 = fast.filter($"user_id" === 1L).collect()
    assert(u1.length == 1 && u1.head.getAs[Long]("n_concurrent") == 3L,
      s"expected 3 concurrent events, got ${u1.mkString(",")}")
  }

  test("evt_concurrency: pre-1970 timestamps keep the bucket containment invariant (floor division)") {
    import spark.implicits._
    // truncating `div` rounds NEGATIVE epochs toward zero, breaking
    // ts ≥ bkt·B (an interior bucket could then claim events outside
    // the session); the floor-division fix must make the decomposed
    // join agree with the naive BETWEEN join on a corpus whose
    // sessions straddle the epoch. Long sessions (events every 20 min
    // across 6 h) force the interior path on the negative side.
    val tmp = java.nio.file.Files.createTempDirectory("negepoch").toString
    val base = -86400000L * 3 + 1800000L // ~3 days before the epoch
    val u1 = (0 to 18).map(i =>
      (100L + i, base + i * 1200000L, 1L, "view", 1.0, "{}"))
    val u2 = Seq(
      (200L, base + 90 * 60000L, 2L, "click", 1.0, "{}"),  // interior, in range
      (201L, base + 150 * 60000L, 2L, "click", 1.0, "{}"), // interior, in range
      (202L, base - 3600000L, 2L, "click", 1.0, "{}"),     // before the session
      (203L, base + 9 * 3600000L, 2L, "click", 1.0, "{}")) // after the session
    // a third user whose whole session straddles ts = 0 exactly
    val u3 = (0 to 6).map(i =>
      (300L + i, -3600000L + i * 1200000L, 3L, "view", 1.0, "{}"))
    (u1 ++ u2 ++ u3)
      .toDF("event_id", "ts_ms", "user_id", "event_type", "value", "props")
      .select($"event_id", timestamp_millis($"ts_ms").as("ts"),
        $"user_id", $"event_type", $"value", $"props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val fast = Relational.queries("evt_concurrency")(spark, tmp)
    val naive = naiveConcurrency(tmp)
    assert(fast.except(naive).count() == 0 && naive.except(fast).count() == 0,
      s"decomposed ≠ naive on negative epochs:\n${fast.collect().mkString("\n")}\nvs\n${naive.collect().mkString("\n")}")
    val u1row = fast.filter($"user_id" === 1L).collect()
    assert(u1row.length == 1 && u1row.head.getAs[Long]("n_concurrent") == 2L,
      s"expected the 2 in-range user-2 events: ${u1row.mkString(",")}")
    // the stored layout agrees too (floor-div day/bucket assignment)
    val dir = java.nio.file.Files.createTempDirectory("negepochL").toString
    Relational.writeConcurrencyLayout(spark, tmp, dir)
    val served = Relational.concurrencyFromStored(spark, tmp, dir, serveMod = 1L)
    assert(served.except(naive).count() == 0 &&
      naive.except(served).count() == 0,
      "stored serve diverged from the naive join on negative epochs")
  }

  test("evt_concurrency_stored: serve slice equals the session query's slice") {
    import spark.implicits._
    val stored = Relational.queries("evt_concurrency_stored")(spark, sf)
    val slice = Relational.queries("evt_concurrency")(spark, sf)
      .filter($"user_id" % Relational.ConcServeMod === 0)
    assert(stored.count() == slice.count())
    assert(stored.except(slice).count() == 0 && slice.except(stored).count() == 0,
      "stored serve diverged from the session query's slice")
    assert(stored.count() > 0, "serve slice empty — vacuous test")
  }

  test("concurrency layout: append ≡ rebuild; crash window undercounts; repair restores") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def ms(s: org.apache.spark.sql.SparkSession, pred: org.apache.spark.sql.Column) =
      graft.Tables.events(s, sf)
        .select($"user_id", expr("unix_micros(ts) div 1000").as("ts_ms"))
        .filter(pred)
    // full build vs two appends split by user parity
    val dirA = java.nio.file.Files.createTempDirectory("concA").toString
    Relational.writeConcurrencyLayout(spark, sf, dirA)
    val full = Relational.concurrencyFromStored(spark, sf, dirA).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val dirB = java.nio.file.Files.createTempDirectory("concB").toString
    Relational.appendToConcurrencyLayout(spark, ms(spark, col("user_id") % 2 === 0), dirB)
    Relational.appendToConcurrencyLayout(spark, ms(spark, col("user_id") % 2 =!= 0), dirB)
    val appended = Relational.concurrencyFromStored(spark, sf, dirB).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(appended == full, "append+probe diverged from rebuild+probe")
    // crash window: second append lands events but not counts —
    // interior legs undercount (never overcount); repair restores
    val dirC = java.nio.file.Files.createTempDirectory("concC").toString
    Relational.appendToConcurrencyLayout(spark, ms(spark, col("user_id") % 2 === 0), dirC)
    Relational.appendToConcurrencyLayout(spark, ms(spark, col("user_id") % 2 =!= 0), dirC,
      mergeCounts = false)
    val crashed = Relational.concurrencyFromStored(spark, sf, dirC).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(crashed.keySet == full.keySet)
    assert(crashed.forall { case (k, v) => v <= full(k) },
      "crash window must never OVERcount")
    Relational.repairConcurrencyLayout(spark, dirC)
    val repaired = Relational.concurrencyFromStored(spark, sf, dirC).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(repaired == full, "repair did not restore the full-build answers")
  }

  test("concurrency takedown: deleted users answer for nobody; delete is idempotent; compact/repair invisible") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("concDel").toString
    Relational.writeConcurrencyLayout(spark, sf, dir)
    val purge = graft.operators.Similarity.PurgeMod
    val res = graft.operators.Similarity.PurgeRes
    val delIds = graft.Tables.events(spark, sf)
      .select($"user_id").filter($"user_id" % purge === res).distinct()
    Relational.deleteFromConcurrencyLayout(spark, dir, delIds)
    val ownerPred = col("user_id") % purge =!= res
    // serveMod = 1: every surviving user is served, so the deleted
    // users' contributions are guaranteed to be exercised at sf0.001
    def serve(): Map[(Long, Long), Long] =
      Relational.concurrencyFromStored(spark, sf, dir, serveMod = 1L,
          ownerPred = ownerPred)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = serve()
    // ground truth: a fresh layout over the SURVIVING users' events
    val survivorsDir = java.nio.file.Files.createTempDirectory("concSurv").toString
    Relational.appendToConcurrencyLayout(spark,
      graft.Tables.events(spark, sf)
        .select($"user_id", expr("unix_micros(ts) div 1000").as("ts_ms"))
        .filter(ownerPred), survivorsDir)
    val want = Relational.concurrencyFromStored(spark, sf, survivorsDir,
        serveMod = 1L, ownerPred = ownerPred)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty, "takedown serve empty — vacuous test")
    assert(got == want, "takedown must answer like a rebuild over survivors")
    // the deletion was non-vacuous: the pre-delete layout answers MORE
    val preDir = java.nio.file.Files.createTempDirectory("concPre").toString
    Relational.writeConcurrencyLayout(spark, sf, preDir)
    val pre = Relational.concurrencyFromStored(spark, sf, preDir,
        serveMod = 1L, ownerPred = ownerPred)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pre.exists { case (k, v) => v > want(k) },
      "fixture never exercised the deleted users' contributions")
    // idempotent: re-running the same delete changes nothing (the
    // users' cbu rows are gone, so the subtraction is zero)
    Relational.deleteFromConcurrencyLayout(spark, dir, delIds)
    assert(serve() == want, "re-delete must be a no-op")
    // compaction purges rows without changing answers, clears tombstones
    Relational.compactConcurrencyLayout(spark, dir)
    assert(serve() == want, "compaction must not change answers")
    assert(!new java.io.File(s"$dir/_graft_user_tombstones").exists())
    assert(spark.read.parquet(s"$dir/events")
      .filter($"user_id" % purge === res).count() == 0,
      "tombstoned users' rows must be physically purged")
    // repair (sidecars from tombstone-filtered events) is also invisible
    Relational.repairConcurrencyLayout(spark, dir)
    assert(serve() == want, "repair after takedown must preserve answers")
  }

  // --- txt_ppl_buckets ----------------------------------------------

  test("txt_ppl_buckets: threshold cuts honor the tercile counts modulo ties; buckets order by nll") {
    import spark.implicits._
    val out = TextAnalysis.queries("txt_ppl_buckets")(spark, sf)
    val rows = out.collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getString(3)))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val n = rs.length.toLong
      val cut1 = (n + 2) / 3
      val cut2 = (2 * n + 2) / 3
      val head = rs.filter(_._3 == "head")
      val headMid = rs.filter(r => r._3 == "head" || r._3 == "middle")
      // quantile-threshold semantics: the bucket reaches its tercile
      // count, overshooting only by ties AT the cutoff value
      assert(head.length >= cut1, s"$src: head ${head.length} < $cut1")
      val t1Ties = head.count(_._2 == head.map(_._2).max)
      assert(head.length - t1Ties < cut1,
        s"$src: head overshoots beyond its cutoff ties")
      assert(headMid.length >= cut2, s"$src: head+middle < $cut2")
      val t2Ties = headMid.count(_._2 == headMid.map(_._2).max)
      assert(headMid.length - t2Ties < cut2,
        s"$src: middle overshoots beyond its cutoff ties")
      // buckets respect the score ordering strictly at the boundaries
      val midVals = rs.filter(_._3 == "middle").map(_._2)
      val tailVals = rs.filter(_._3 == "tail").map(_._2)
      if (midVals.nonEmpty)
        assert(head.map(_._2).max < midVals.min, s"$src: head/middle overlap")
      if (midVals.nonEmpty && tailVals.nonEmpty)
        assert(midVals.max < tailVals.min, s"$src: middle/tail overlap")
    }
    // the published score IS txt_bigram_nll's (shared definition)
    val nll = TextAnalysis.queries("txt_bigram_nll")(spark, sf)
      .select($"doc_id", $"nll".as("ref"))
    assert(out.join(nll, "doc_id").filter($"nll" =!= $"ref").count() == 0)
  }

  test("txt_token_budget: kept mass reaches half the source's tokens, overshooting only by the cut bin") {
    import spark.implicits._
    val kept = TextAnalysis.queries("txt_token_budget")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // totals from the corpus itself (same token class as the query)
    val all = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source",
        size(TextAnalysis.tokens($"text")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val totals = all.groupBy(_._2).map { case (s, xs) => s -> xs.map(_._3).sum }
    kept.groupBy(_._2).foreach { case (src, rs) =>
      val budget = (totals(src) + 1) / 2
      val mass = rs.map(_._3).sum
      assert(mass >= budget, s"$src: kept mass $mass < budget $budget")
      val cut = rs.map(_._4).max
      val cutBinMass = rs.filter(_._4 == cut).map(_._3).sum
      assert(mass - cutBinMass < budget,
        s"$src: kept mass overshoots beyond the boundary score bin")
      // every kept doc scores at or under every dropped doc
      val keptIds = rs.map(_._1).toSet
      val dropped = all.filter(x => x._2 == src && !keptIds(x._1)).map(_._1).toSet
      if (dropped.nonEmpty) {
        val nll = TextAnalysis.queries("txt_bigram_nll")(spark, sf)
          .select($"doc_id", $"nll").collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(dropped.forall(id => nll(id) > cut),
          s"$src: a dropped doc scores at/under the cut")
      }
    }
    assert(kept.nonEmpty)
  }
}
