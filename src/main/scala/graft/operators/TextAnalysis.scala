package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for a large-scale training-data pipeline
  * (builder brief; generalizes the reference's text handling,
  * `plugins/utils/dna_encoding.py:282-305` / `dags/dag.py:454-470`):
  * token counting, quality scoring, language ID, fingerprinting,
  * repetition/length profiling, sampling, packing, decontamination,
  * redaction, mixing weights.
  *
  * The per-document operators are ROW-LOCAL — built-in column
  * expressions where the expression stays cheap, tight-loop UDF
  * kernels where Catalyst's higher-order functions would interpret
  * per element (NOTES perf lesson 1) — so they stay narrow: one
  * parquet scan, no shuffle, linear with input splits at 100 TB (and
  * streaming-composable, which rests on row-locality, not on being
  * UDF-free). The corpus-level operators (decontamination,
  * stratified sampling, packing, mixing weights) shuffle exactly once
  * each, keyed as their Scaladoc states.
  */
object TextAnalysis {

  /** Whitespace tokens of `text` (empty tokens dropped, so leading /
    * trailing / repeated whitespace can't produce phantom tokens).
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** BPE-ish subword segmentation: runs of letters, runs of digits, or a
    * single non-space symbol — the common pre-tokenizer regex shape.
    * Extraction (not split) so the pattern stays RE2-safe for the oracle.
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeishPattern), lit(0))

  /** Per-doc bigram-LM cross-entropy under the corpus model with
    * add-one smoothing, p(w|prev) = (C(prev,w)+1)/(C(prev,·)+V) —
    * ONE definition consumed by txt_bigram_nll, txt_ppl_buckets AND
    * txt_token_budget (the classifier must bucket the exact score it
    * publishes). Bigram emission is ROW-LOCAL (a transform over the
    * token array — no positional self-join); the model is two keyed
    * count aggs (bigram, then prev — the second a rollup of the
    * first, never a second corpus pass) and V rides as a 1-row
    * broadcast. Counts are exact integers; ln products round(5) like
    * txt_unigram_nll. Docs with <2 tokens carry zero bigrams → 0.0
    * (the LEFT-JOIN pin).
    *
    * Built ONCE per (session, corpus) and PERSISTED, like
    * [[graft.operators.Dedup.shingleRelation]]: three declared
    * consumers read it, and two of them (the bucket/budget
    * classifiers) reference it from BOTH sides of their
    * cutoff-histogram/probe split — uncached, the LM would retrain
    * and the corpus re-tokenize once per subtree (the r15
    * txt_token_budget budget violation). The persisted relation is
    * per-doc-narrow (five scalar columns), and `n_tokens` /
    * `source` ride along from the SAME tokenize pass so the budget
    * classifier never re-scans documents for them.
    * Output: (doc_id, source, n_tokens, n_bigrams, nll).
    */
  private def bigramScoreRelation(s: SparkSession, d: String): DataFrame =
    bigramScoreCache.getOrBuild(s, d) {
      import s.implicits._
      // NOT persisted, measured: three subtrees read `docs` (the
      // bigram explode, the vocabulary count, the per-doc base), but
      // caching the token arrays across them changed nothing at sf10
      // (60.0 s vs 59.3) — the build's cost is the ~100M-row bigram
      // aggregate itself, not the repeated tokenize, and the cache
      // would pin corpus-sized arrays for no win.
      val docs = Tables.documents(s, d)
        .select($"doc_id", $"source", tokens($"text").as("toks"))
      // Bigram identity travels as 8-byte xxhash64 keys from the
      // moment of emission — the hashing happens INSIDE the row-local
      // transform, so token strings never leave their row, let alone
      // reach an exchange: every model shuffle below (the per-doc tf,
      // the two count rollups, the tf⋈bc⋈pc probe joins) moves
      // fixed-width longs. The shingleHashes convention: equal to
      // string grouping modulo a 2⁻⁶⁴ collision (the oracle groups
      // the STRINGS, so the hash-exact gate would catch one). kb =
      // hash(prev, cur) determines kp = hash(prev) (same kb ⇒ same
      // prev), so kp rides the tf aggregate as max() instead of a
      // second key column.
      val pairs = docs.select($"doc_id", explode(when(size($"toks") >= 2,
        expr("""transform(sequence(2, size(toks)),
                i -> struct(xxhash64(element_at(toks, i - 1),
                              element_at(toks, i)) AS kb,
                            xxhash64(element_at(toks, i - 1)) AS kp))"""))
        .otherwise(expr("array()"))).as("bg"))
        .select($"doc_id", $"bg.kb".as("kb"), $"bg.kp".as("kp"))
      val tf = pairs.groupBy($"doc_id", $"kb")
        .agg(count(lit(1)).as("tf"), max($"kp").as("kp"))
      val bc = tf.groupBy($"kb")
        .agg(sum($"tf").as("cbg"), max($"kp").as("kp"))
      val pc = bc.groupBy($"kp").agg(sum($"cbg").as("cprev"))
      val vocab = docs.select(explode($"toks").as("tok"))
        .agg(countDistinct(xxhash64($"tok")).as("v"))
      val per = tf.join(bc.select($"kb", $"cbg"), Seq("kb"))
        .join(pc, Seq("kp"))
        .crossJoin(broadcast(vocab))
        .groupBy($"doc_id")
        .agg(sum($"tf").as("n_bigrams"),
          (-sum($"tf" * log(($"cbg" + 1).cast("double") /
            ($"cprev" + $"v").cast("double"))) / sum($"tf")).as("nll"))
      val out = docs.select($"doc_id", $"source",
          size($"toks").cast("long").as("n_tokens"))
        .join(per, Seq("doc_id"), "left")
        .select($"doc_id", $"source", $"n_tokens",
          coalesce($"n_bigrams", lit(0L)).as("n_bigrams"),
          round(coalesce($"nll", lit(0.0)), 5).as("nll"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out
    }

  private val bigramScoreCache = new SessionCache[DataFrame](df =>
    scala.util.Try(df.unpersist(blocking = false)))

  /** English stopword set used by the language-ID heuristic and the
    * quality score's stopword ratio. Small and closed on purpose —
    * the heuristic must be reproducible in ANSI SQL for the oracle.
    */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
    "was", "for", "on", "with", "as", "at", "by", "it", "be", "this")

  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => t.isInCollection(Stopwords)))

  /** KMV sketch size. σ ≈ 1/√k ≈ 3.1% relative error — the corpus-
    * stats accuracy class; production would raise it, the estimator
    * and the merge algebra are k-independent.
    */
  val KmvK = 1024

  /** 2⁶³ as an exact double — the KMV hash-space size (the sketch
    * ranks the sign-cleared 63-bit FNV, so the estimator's unit
    * interval is [0, 2⁶³)).
    */
  private val TwoTo63 = 9223372036854775808.0

  /** The KMV sketch as a typed Aggregator: the buffer IS the sketch —
    * the [[KmvK]] smallest DISTINCT hashes seen, kept in a sorted set.
    * `reduce` inserts under the cap, `merge` is the KMV union (take
    * the k smallest of both sketches) — so Spark's map-side partial
    * aggregation computes per-partition sketches and the exchange
    * carries only sketch-sized buffers (≤ sources × k longs), never a
    * corpus-scaled partition. This is the shape the class-wide
    * source-window skew guard demands (PlanQualitySpec) AND the
    * production deployment: per-shard sketches merge without
    * re-reading anything. Output is the sketch ascending, so
    * element_at(-1) is h₍ₖ₎.
    */
  object KmvAggregator extends org.apache.spark.sql.expressions.Aggregator[
      Long, java.util.TreeSet[java.lang.Long], Seq[Long]] {
    type Buf = java.util.TreeSet[java.lang.Long]
    def zero: Buf = new java.util.TreeSet[java.lang.Long]()
    // in-place mutation — the Aggregator buffer contract; a persistent
    // TreeSet here allocated per shingle and cost ~1.5× at sf10
    def reduce(b: Buf, h: Long): Buf = {
      if (b.size < KmvK) b.add(h)
      else if (h < b.last && b.add(h)) b.pollLast()
      b
    }
    def merge(b1: Buf, b2: Buf): Buf = {
      b1.addAll(b2)
      while (b1.size > KmvK) b1.pollLast()
      b1
    }
    def finish(b: Buf): Seq[Long] = {
      import scala.jdk.CollectionConverters._
      b.iterator().asScala.map(_.longValue).toSeq
    }
    def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** KMV sketches per scope over a keyed hash stream — shared by
    * txt_distinct_kmv and txt_overlap_kmv. Phase 1: per-partition
    * sketches in one imperative pass (scopes × k TreeSets; each
    * partition's output is an exact KMV sketch of its rows by the
    * same insert rule — and ~1.6× cheaper at sf10 than routing every
    * hash row through the typed Aggregator machinery, 22 s → 14 s).
    * Phase 2: the partition sketches union-merge through
    * [[KmvAggregator]] (exact, because every global top-k member is
    * in its partition's top-k), over ≤ partitions × scopes × k rows.
    * Output: (scope, sketch ascending); scopes with no hashes are
    * absent.
    */
  private def kmvSketches(
      hs: org.apache.spark.sql.Dataset[(String, Long)]): DataFrame = {
    val s = hs.sparkSession
    import s.implicits._
    val k = KmvK
    val winnowed = hs.mapPartitions { it =>
      val state = scala.collection.mutable.LinkedHashMap
        .empty[String, java.util.TreeSet[java.lang.Long]]
      it.foreach { case (src, h) =>
        val ts = state.getOrElseUpdate(src, new java.util.TreeSet[java.lang.Long]())
        if (ts.size < k) ts.add(h)
        else if (h < ts.last && ts.add(h)) ts.pollLast()
      }
      import scala.jdk.CollectionConverters._
      state.iterator.flatMap { case (src, ts) =>
        ts.iterator().asScala.map(h => (src, h.longValue)).toArray.iterator
      }
    }
    winnowed.groupByKey(_._1).mapValues(_._2)
      .agg(KmvAggregator.toColumn.name("sketch"))
      .toDF("scope", "sketch")
  }

  /** The corpus's (source, sign-cleared shingle hash) stream — the
    * input every KMV surface sketches.
    */
  private def kmvHashes(
      docs: DataFrame): org.apache.spark.sql.Dataset[(String, Long)] = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select($"source", explode(Dedup.shingleHashes($"text")).as("h64"))
      .select($"source", ($"h64".bitwiseAND(lit(Long.MaxValue))).as("h"))
      .as[(String, Long)]
  }

  /** The TOTAL scope from merged per-source sketches — exact by the
    * KMV merge property (every global top-k member is in its source's
    * top-k).
    */
  private def totalKmvSketch(perSrc: DataFrame): DataFrame = {
    val s = perSrc.sparkSession
    import s.implicits._
    perSrc.select(explode($"sketch").as("h")).as[Long]
      .select(KmvAggregator.toColumn.name("sketch"))
      .select(lit("*").as("scope"), $"sketch")
  }

  /** The estimator over a (scope, sketch) relation — the shared tail
    * of the session and stored distinct-count queries.
    */
  private def kmvEstimates(sketches: DataFrame): DataFrame = {
    val s = sketches.sparkSession
    import s.implicits._
    val k = KmvK
    sketches
      .select($"scope",
        size($"sketch").cast("int").as("k_used"),
        when(size($"sketch") > 0, element_at($"sketch", -1)).as("kth_hash"))
      .withColumn("est_distinct",
        when($"k_used" < k, $"k_used".cast("double"))
          .otherwise(round(lit((k - 1).toDouble * TwoTo63) /
            $"kth_hash".cast("double"), 4)))
      .select($"scope", $"k_used", $"kth_hash", $"est_distinct")
  }

  /** Persist the corpus's per-source KMV sketches as a (scope, sketch)
    * relation — sources × k longs; the TOTAL scope is derivable (the
    * merge property), so only per-source sketches are stored.
    *
    * TAKEDOWN contract, stated: KMV cannot unmerge — the sketch keeps
    * the k smallest hashes, and removing a document cannot recover the
    * hashes it displaced. Erasure against a stored KMV is therefore a
    * REBUILD over survivors (this writer), unlike the CMS
    * ([[subtractFromCmsSketch]] — linear, subtracts exactly) and the
    * counts-add layouts. A deployment needing deletable distinct
    * counts keeps per-shard/per-day sketches and rebuilds only the
    * affected shard.
    */
  def writeKmvSketch(s: SparkSession, d: String, outDir: String): Unit =
    kmvSketches(kmvHashes(Tables.documents(s, d)))
      .write.mode("overwrite").parquet(outDir)

  /** Merge a document batch into a STORED sketch — incremental corpus
    * stats: a nightly/streaming ingest scans only the BATCH (one
    * sketch pass), rereads the sketch-sized stored relation, union-
    * merges by the aggregator algebra (sketch(A ∪ B) = sketch(
    * sketch(A) ∪ sketch(B)) — exact, order-independent), and promotes
    * the rewrite with the crash-safe two-rename swap. Single-writer
    * per sketch dir, the stored-index discipline.
    */
  def mergeIntoKmvSketch(s: SparkSession, sketchDir: String,
      batch: DataFrame): Unit = {
    import s.implicits._
    val stored = s.read.parquet(sketchDir).select($"scope", $"sketch")
    val merged = kmvSketches(stored
      .unionByName(kmvSketches(kmvHashes(batch)))
      .select($"scope", explode($"sketch").as("h"))
      .as[(String, Long)])
    val tmp = new org.apache.hadoop.fs.Path(sketchDir + "_fresh")
    merged.write.mode("overwrite").parquet(tmp.toString)
    Similarity.swapDirInto(s, tmp, new org.apache.hadoop.fs.Path(sketchDir))
  }

  /** Count-min sketch geometry (Cormode & Muthukrishnan, J.Alg'05).
    * Per-query overcount ≤ (e/width)·N with prob 1−e^−depth; at width
    * 16384 that is ~1.7·10⁻⁴·N — an order under [[HhPhi]], so the CMS
    * cull admits only tokens within a thin fringe of the threshold
    * while candidates stay O(1/φ). Correctness never depends on the
    * geometry: CMS never UNDERcounts (every true heavy hitter
    * survives the cull) and the exact verify pass removes every false
    * positive — the txt_bloom_decontaminate discipline.
    */
  val CmsDepth = 4
  val CmsWidth = 16384

  /** Heavy-hitter threshold as a corpus fraction: a token is heavy
    * when its occurrence count ≥ max(1, ⌈φ·N⌉) over N total tokens.
    */
  val HhPhi = 0.002

  /** Second hash of the Kirsch–Mitzenmacher family g_j = h₁ + j·h₂
    * (two independent hashes simulate the pairwise-independent family
    * the CMS bounds assume): the splitmix64 finalizer over the shared
    * FNV-1a, forced odd so no row degenerates into a copy of row 0.
    */
  @inline private def cmsH2(h1: Long): Long = {
    var z = h1 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) | 1L
  }

  /** The CMS point estimate: min over the depth rows' cells. */
  @inline private[graft] def cmsMin(tab: Array[Long], t: String): Long = {
    val h1 = Dedup.fnv1a(t); val h2 = cmsH2(h1)
    var est = Long.MaxValue
    var j = 0
    while (j < CmsDepth) {
      val c = tab(j * CmsWidth + (((h1 + j * h2) & Long.MaxValue) % CmsWidth).toInt)
      if (c < est) est = c
      j += 1
    }
    est
  }

  /** The corpus token stream every CMS surface counts — txt_vocab's
    * explode, typed.
    */
  private def hhTokens(docs: DataFrame): org.apache.spark.sql.Dataset[String] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(explode(tokens($"text")).as("token")).as[String]
  }

  /** One-pass distributed CMS build: each partition folds its tokens
    * into a LOCAL depth×width table in one imperative scan (the
    * kmvSketches phase-1 shape), and the partials element-wise ADD
    * through one reduce — CMS is LINEAR (cms(A ⊎ B) = cms(A) +
    * cms(B)), so the combine carries ≤ partitions × 512 KB sketch
    * rows, never token-scaled state. Returns (table, total tokens N).
    */
  private[graft] def buildCms(
      toks: org.apache.spark.sql.Dataset[String]): (Array[Long], Long) = {
    val s = toks.sparkSession
    import s.implicits._
    val (depth, width) = (CmsDepth, CmsWidth)
    toks.mapPartitions { it =>
      val tab = new Array[Long](depth * width)
      var n = 0L
      it.foreach { t =>
        val h1 = Dedup.fnv1a(t); val h2 = cmsH2(h1)
        var j = 0
        while (j < depth) {
          tab(j * width + (((h1 + j * h2) & Long.MaxValue) % width).toInt) += 1
          j += 1
        }
        n += 1
      }
      Iterator.single((tab, n))
    }.reduce { (a, b) =>
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  /** The cull → exact-verify tail shared by the session and stored
    * heavy-hitter queries: broadcast the sketch, keep only tokens
    * whose CMS estimate clears the threshold (no false negatives —
    * CMS only overcounts), then count the SURVIVORS exactly and gate
    * on the true count. The exact groupBy shuffles candidate-scaled
    * occurrences (O(1/φ) tokens plus the collision fringe), never the
    * full vocabulary — the shape that makes "what dominates this
    * corpus" a sketch-state question at 100 TB instead of txt_vocab's
    * vocabulary-wide exchange.
    */
  private def heavyHittersFrom(toks: org.apache.spark.sql.Dataset[String],
      tab: Array[Long], total: Long): DataFrame = {
    val s = toks.sparkSession
    import s.implicits._
    val thresh = math.max(1L, math.ceil(HhPhi * total).toLong)
    val bc = s.sparkContext.broadcast(tab)
    toks.mapPartitions { it =>
      val t0 = bc.value
      it.filter(t => cmsMin(t0, t) >= thresh)
    }.toDF("token")
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" >= thresh)
      .select($"token", $"cnt",
        round($"cnt".cast("double") / lit(total.toDouble), 6).as("share"))
  }

  /** The CMS as a SPARSE (row, bucket, cnt) cell relation — ≤
    * depth×width rows regardless of corpus size (driver-built by
    * design: the sketch IS driver-sized). The token total N is
    * derivable as the sum of row 0's cells (every token increments
    * exactly one bucket per row), so it is not stored separately.
    */
  private def cmsCells(s: SparkSession, tab: Array[Long]): DataFrame = {
    import s.implicits._
    val rows = for {
      j <- 0 until CmsDepth
      b <- 0 until CmsWidth
      if tab(j * CmsWidth + b) != 0L
    } yield (j, b, tab(j * CmsWidth + b))
    rows.toDF("row", "bucket", "cnt").repartition(1)
  }

  private def readCms(s: SparkSession, dir: String): (Array[Long], Long) = {
    import s.implicits._
    val tab = new Array[Long](CmsDepth * CmsWidth)
    // sketch-sized collect (≤ depth×width cells) — the stored-model
    // read shape, corpus-size-independent
    s.read.parquet(dir).select($"row", $"bucket", $"cnt")
      .as[(Int, Int, Long)].collect()
      .foreach { case (j, b, c) => tab(j * CmsWidth + b) = c }
    var total = 0L
    var b = 0
    while (b < CmsWidth) { total += tab(b); b += 1 }
    (tab, total)
  }

  /** Persist the corpus CMS (see [[cmsCells]]). */
  def writeCmsSketch(s: SparkSession, d: String, outDir: String): Unit =
    cmsCells(s, buildCms(hhTokens(Tables.documents(s, d)))._1)
      .write.mode("overwrite").parquet(outDir)

  /** Merge a document batch into a STORED CMS — incremental corpus
    * stats: one sketch pass over the BATCH, a sketch-sized reread,
    * element-wise ADD (linearity makes the merge exact and order-
    * independent), crash-safe two-rename promotion. Single-writer per
    * sketch dir, the stored-index discipline.
    */
  def mergeIntoCmsSketch(s: SparkSession, sketchDir: String,
      batch: DataFrame): Unit =
    applyToCmsSketch(s, sketchDir, batch, sign = 1L)

  /** Subtract a document batch FROM a stored CMS — the takedown half
    * CMS linearity buys for free (KMV, by contrast, cannot unmerge —
    * its takedown is a rebuild, stated on [[writeKmvSketch]]): one
    * sketch pass over the DELETED docs, element-wise subtract, same
    * crash-safe swap. Exact, not approximate: subtracting the batch's
    * own cell counts leaves the table bit-identical to a fresh sketch
    * over the surviving docs, by linearity. Contract: subtract only
    * batches previously merged (the counts-add layouts' takedown
    * contract — negative cells would otherwise under-count forever).
    */
  def subtractFromCmsSketch(s: SparkSession, sketchDir: String,
      batch: DataFrame): Unit =
    applyToCmsSketch(s, sketchDir, batch, sign = -1L)

  private def applyToCmsSketch(s: SparkSession, sketchDir: String,
      batch: DataFrame, sign: Long): Unit = {
    val (stored, _) = readCms(s, sketchDir)
    val (fresh, _) = buildCms(hhTokens(batch))
    var i = 0
    while (i < fresh.length) { fresh(i) = stored(i) + sign * fresh(i); i += 1 }
    val tmp = new org.apache.hadoop.fs.Path(sketchDir + "_fresh")
    cmsCells(s, fresh).write.mode("overwrite").parquet(tmp.toString)
    Similarity.swapDirInto(s, tmp, new org.apache.hadoop.fs.Path(sketchDir))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.,
    // RANDOM'02) over the corpus's 3-gram shingles, per source and
    // total — the 100 TB "how many distinct shingles does this corpus
    // have" question, answered in ONE scan with sketch-sized state
    // ([[KmvAggregator]]: map-side partial sketches, union-merged)
    // instead of the full distinct shuffle an exact count pays (q10's
    // shape). The TOTAL scope is the union of the merged per-source
    // sketches (the KMV merge property — sources × k rows, corpus-
    // size-independent), which is also how a deployment combines
    // per-shard sketches without re-reading anything.
    // est = (k−1)·2⁶³/h₍ₖ₎, exact count when the sketch never filled.
    // Hash = the shared FNV-1a over the shingle string with the sign
    // bit cleared, so the DuckDB oracle restates the ranking over
    // identical BIGINT values.
    "txt_distinct_kmv" -> { (s, d) =>
      val perSrc = kmvSketches(kmvHashes(Tables.documents(s, d)))
      kmvEstimates(perSrc.unionByName(totalKmvSketch(perSrc)))
    },

    // The stored-sketch round trip (the *_stored convention): persist
    // the per-source sketches, read them back, estimate from the
    // stored relation — the incremental-corpus-stats deployment shape
    // (mergeIntoKmvSketch keeps the same relation current batch by
    // batch). Long arrays round-trip parquet exactly, so this shares
    // txt_distinct_kmv's oracle verbatim.
    "txt_distinct_kmv_stored" -> { (s, d) =>
      import s.implicits._
      val dir = Similarity.storedQueryDir("kmv", d)
      writeKmvSketch(s, d, dir)
      val perSrc = s.read.parquet(dir).select($"scope", $"sketch")
      kmvEstimates(perSrc.unionByName(totalKmvSketch(perSrc)))
    },

    // Corpus heavy hitters — the "which tokens dominate this corpus"
    // question (boilerplate detection, stopword inventories,
    // tokenizer sanity) answered WITHOUT the full-vocabulary shuffle
    // txt_vocab pays: a count-min sketch built in one scan with
    // sketch-sized merged state ([[buildCms]] — linear, so map-side
    // partials element-wise add), broadcast back as a cull, then an
    // EXACT count of the O(1/φ) survivors gated on the true count.
    // Output is exact — threshold ⌈φ·N⌉ over total tokens N — so the
    // oracle is the plain GROUP BY … HAVING restatement and the
    // sketch geometry can never desynchronize it.
    "txt_heavy_hitters" -> { (s, d) =>
      val toks = hhTokens(Tables.documents(s, d))
      val (tab, total) = buildCms(toks)
      heavyHittersFrom(toks, tab, total)
    },

    // The stored-sketch round trip (the *_stored convention): persist
    // the sparse cell relation, read it back, cull+verify from the
    // STORED sketch — the nightly-ingest deployment shape
    // (mergeIntoCmsSketch keeps the same relation current batch by
    // batch; streamed by DocStream.heavyHittersStream). Exact output
    // ⇒ shares the session oracle string verbatim.
    "txt_heavy_hitters_stored" -> { (s, d) =>
      val dir = Similarity.storedQueryDir("cms", d)
      writeCmsSketch(s, d, dir)
      val toks = hhTokens(Tables.documents(s, d))
      val (tab, total) = readCms(s, dir)
      heavyHittersFrom(toks, tab, total)
    },

    // The sketch-state takedown round trip (the *_purged convention on
    // the CMS side): sketch the full corpus, SUBTRACT the purge
    // slice's own counts (exact by CMS linearity — the table ends
    // bit-identical to a fresh sketch over the survivors), cull+verify
    // over the surviving docs. N rederives from row 0 post-subtract,
    // so the threshold moves with the erasure; oracle = the plain
    // GROUP BY … HAVING over surviving documents.
    "txt_heavy_hitters_purged" -> { (s, d) =>
      import s.implicits._
      val dir = Similarity.storedQueryDir("cms_purge", d)
      writeCmsSketch(s, d, dir)
      subtractFromCmsSketch(s, dir, Tables.documents(s, d)
        .filter($"doc_id" % Similarity.PurgeMod === Similarity.PurgeRes))
      val survivors = hhTokens(Tables.documents(s, d)
        .filter($"doc_id" % Similarity.PurgeMod =!= Similarity.PurgeRes))
      val (tab, total) = readCms(s, dir)
      heavyHittersFrom(survivors, tab, total)
    },

    // Per-source heavy hitters — boilerplate detection per DOMAIN (the
    // C4/Gopher cleaning question: which tokens dominate within each
    // source, not the corpus): the same CMS machinery over the
    // (source ⊕ token) composite key, per-source totals from one
    // sources-sized aggregate, per-source thresholds ⌈φ·N_src⌉ culled
    // at the scan and exact-verified — output exact, oracle the plain
    // per-source GROUP BY … HAVING.
    "txt_heavy_hitters_by_source" -> { (s, d) =>
      import s.implicits._
      val pairs = Tables.documents(s, d)
        .select($"source", explode(tokens($"text")).as("token"))
        .as[(String, String)]
      val keyed = pairs.map { case (src, t) => src + " " + t }
      val (tab, _) = buildCms(keyed)
      // per-source token totals: one sources-sized aggregate (the
      // driver map is |sources|, bounded by the catalog, not the data)
      val totals = pairs.toDF("source", "token")
        .groupBy($"source").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      val thresh = totals.map { case (src, n) =>
        src -> math.max(1L, math.ceil(HhPhi * n).toLong) }
      val bcTab = s.sparkContext.broadcast(tab)
      val bcThresh = s.sparkContext.broadcast(thresh)
      // the (source, total, threshold) gate relation — sources-sized,
      // broadcast into the exact-verify tail
      val gates = totals.toSeq
        .map { case (src, n) => (src, n, thresh(src)) }
        .toDF("source", "n", "th")
      pairs.mapPartitions { it =>
        val (t0, th) = (bcTab.value, bcThresh.value)
        it.filter { case (src, t) =>
          cmsMin(t0, src + " " + t) >= th.getOrElse(src, Long.MaxValue)
        }
      }.toDF("source", "token")
        .groupBy($"source", $"token").agg(count(lit(1)).as("cnt"))
        .join(broadcast(gates), Seq("source"))
        .filter($"cnt" >= $"th")
        .select($"source", $"token", $"cnt",
          round($"cnt".cast("double") / $"n".cast("double"), 6).as("share"))
    },

    // Sketch SET OPERATIONS — the theta-sketch intersection over the
    // KMV sketches: per source, how much of its TRAIN-split shingle
    // set leaks from the EVAL split (the decontamination-exposure
    // question, answered from two sketch passes instead of an exact
    // gram join — the txt_decontaminate shape without touching the
    // gram relation twice). θ = min of the two sketches' thresholds
    // (an unfilled sketch keeps everything: θ = 2⁶³−1); both sketches
    // cut to < θ are uniform samples of their sets at rate θ/2⁶³, so
    // |∩cut|·2⁶³/θ estimates the true intersection and the count
    // ratio estimates Jaccard (θ cancels). When both sketches are
    // unfilled the counts — and the estimates — are EXACT. Each
    // source joins one broadcast eval-sketch row: the set algebra
    // runs on k-sized arrays, never on the gram relation.
    "txt_overlap_kmv" -> { (s, d) =>
      import s.implicits._
      val k = KmvK
      val base = Tables.documents(s, d)
        .select($"source", splitPrefix($"doc_id").as("split"),
          explode(Dedup.shingleHashes($"text")).as("h64"))
        .select($"source", $"split",
          ($"h64".bitwiseAND(lit(Long.MaxValue))).as("h"))
      val trainSk = kmvSketches(base
        .filter($"split" >= EvalSplitThreshold)
        .select($"source", $"h").as[(String, Long)])
        .select($"scope".as("source"), $"sketch")
      val evalSk = kmvSketches(base
        .filter($"split" < EvalSplitThreshold)
        .select(lit("eval").as("source"), $"h").as[(String, Long)])
        .select($"sketch".as("esk"))
      def thetaOf(c: Column): Column =
        when(size(c) < k, lit(Long.MaxValue)).otherwise(element_at(c, -1))
      trainSk.crossJoin(broadcast(evalSk))
        .withColumn("theta", least(thetaOf($"sketch"), thetaOf($"esk")))
        .withColumn("acut", filter($"sketch", x => x < $"theta"))
        .withColumn("bcut", filter($"esk", x => x < $"theta"))
        .withColumn("n_inter", size(array_intersect($"acut", $"bcut")).cast("int"))
        .withColumn("n_union",
          (size($"acut") + size($"bcut") - $"n_inter").cast("int"))
        .select($"source", $"n_inter", $"n_union",
          round($"n_inter".cast("double") * lit(TwoTo63) /
            $"theta".cast("double"), 4).as("est_inter"),
          when($"n_union" === 0, lit(0.0))
            .otherwise(round($"n_inter".cast("double") / $"n_union", 6))
            .as("jaccard_est"))
    },
    // Token counting: whitespace tokens + BPE-ish subword count +
    // distinct-token (type) count per document.
    "txt_tokens" -> { (s, d) =>
      import s.implicits._
      val toks = tokens($"text")
      Tables.documents(s, d).select(
        $"doc_id",
        size(toks).cast("long").as("n_tokens"),
        size(bpeishTokens($"text")).cast("long").as("n_bpeish"),
        size(array_distinct(toks)).cast("long").as("n_types"))
    },

    // Quality scoring: length, mean token length, stopword ratio,
    // alpha-char ratio, type/token ratio — the standard cheap filters
    // a pretraining pipeline runs before anything expensive.
    "txt_quality" -> { (s, d) =>
      import s.implicits._
      val toks = tokens($"text")
      val n = size(toks).cast("double")
      Tables.documents(s, d).select(
        $"doc_id",
        length($"text").cast("long").as("n_chars"),
        round(length(regexp_replace($"text", "[^A-Za-z]", "")) /
          greatest(length($"text"), lit(1)).cast("double"), 6).as("alpha_ratio"),
        round(coalesce(aggregate(transform(toks, t => length(t)), lit(0),
          (acc, x) => acc + x), lit(0)).cast("double") / greatest(n, lit(1.0)), 6)
          .as("mean_token_len"),
        round(stopwordCount(toks) / greatest(n, lit(1.0)), 6).as("stopword_ratio"),
        round(size(array_distinct(toks)) / greatest(n, lit(1.0)), 6).as("type_token_ratio"))
    },

    // Language ID: closed-set stopword-density heuristic. Real
    // pipelines use char-n-gram models; the heuristic is deliberately
    // SQL-reproducible so the oracle can state it independently.
    "txt_langid" -> { (s, d) =>
      import s.implicits._
      val toks = tokens($"text")
      Tables.documents(s, d).select(
        $"doc_id",
        when(stopwordCount(toks) / greatest(size(toks), lit(1)).cast("double") >= 0.05,
          lit("en")).otherwise(lit("und")).as("pred_lang"),
        $"lang".as("true_lang"))
    },

    // The curation filter itself: documents passing the cheap quality
    // gates (the rows a pretraining pipeline would keep).
    "txt_quality_filter" -> { (s, d) =>
      import s.implicits._
      qualityGate(Tables.documents(s, d))
        .select($"doc_id", $"lang", length($"text").as("n_chars"))
    },

    // Document fingerprinting: md5 over the sorted distinct token set —
    // a canonical content fingerprint stable under token reordering
    // (the word-level analogue of the reference's content-hash dedup
    // key, dags/dag.py:454-463).
    "txt_fingerprint" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).select(
        $"doc_id",
        md5(to_binary(concat_ws(" ", array_sort(array_distinct(tokens($"text")))),
          lit("utf-8"))).as("token_set_fp"),
        md5(to_binary($"text", lit("utf-8"))).as("content_fp"))
    },

    // Sequence packing for pretraining: assign each document to the
    // fixed-token-budget pack its cumulative offset starts in, packing
    // WITHIN each (source, doc-range) shard. The shard key is what
    // makes the running sum scale: source alone has a handful of
    // values, which would funnel a 100 TB corpus through a few window
    // partitions — the ShardDocs doc-id range bounds every partition
    // regardless of corpus size (one shard covers all test-scale docs,
    // so outputs are unchanged there). Deterministic: doc_id order
    // within shard. pack_id restarts per shard, so the shard column is
    // part of the output key: a pack is (source, shard, pack_id) —
    // without it, packs from different shards of one source would
    // collide once the corpus exceeds ShardDocs.
    "txt_pack" -> { (s, d) =>
      import s.implicits._
      packStage(Tables.documents(s, d)
        .select($"doc_id", $"source", size(tokens($"text")).as("n_tokens")))
    },

    // The end-to-end curation showcase: the full pre-training data
    // path — quality gate → exact-dup keeplist → held-out split +
    // benchmark decontamination → token packing — composed as ONE
    // declarative plan, so Catalyst sees the whole pipeline (filters
    // fuse into the scan, each stage's exchange is keyed as its
    // component operator documents, and the row count only shrinks
    // stage to stage). This is the library's composition contract:
    // operators are plain DataFrame transforms, so chaining them costs
    // nothing extra at plan time — no materialization between stages.
    "pipe_curate" -> { (s, d) =>
      import s.implicits._
      // 1+2: the SHARED quality gate ([[qualityGate]] — one definition
      // with txt_quality_filter), then a per-content-hash keeplist.
      // n_tokens and the content hash are computed ONCE in the gate's
      // projection so the wide text column never crosses an exchange
      // (the tokenize-once lesson); everything downstream moves
      // (doc_id, source, fp, n_tokens) only.
      val kept = qualityGate(Tables.documents(s, d))
        .select($"doc_id", $"source", md5($"text").as("fp"),
          size(tokens($"text")).as("n_tokens"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"fp").orderBy($"doc_id")))
        .filter($"rn" === 1)
      // 3: the SHARED split rule ([[splitPrefix]], same as
      // decontamSides) keeps the training side; contaminated docs out
      val (train, evalGrams) = decontamSides(s, d)
      val contaminated = train.join(evalGrams, Seq("gh"))
        .select($"doc_id").distinct()
      val curated = kept
        .filter(splitPrefix($"doc_id") >= EvalSplitThreshold)
        .join(contaminated, Seq("doc_id"), "left_anti")
      // 4: the SHARED packing stage ([[packStage]], one definition
      // with txt_pack) over the survivors
      packStage(curated.select($"doc_id", $"source", $"n_tokens"))
        .select($"doc_id", $"source", $"n_tokens", $"pack_id")
    },

    // The capstone manifest a training job hands to its data loader:
    // the full curation pipeline (pipe_curate — shared definition, by
    // reference) re-sharded with the txt_shard rule into a 16-row
    // relation of per-shard doc counts, token mass, and an order-
    // independent bit_xor membership fingerprint (the audit that the
    // loader read exactly the curated set). Cost beyond pipe_curate
    // itself: one map-side-combinable 16-group agg over the survivors'
    // (doc_id, n_tokens) scalars — the wide text never reappears.
    "pipe_train_manifest" -> { (s, d) =>
      import s.implicits._
      manifestFrom(queries("pipe_curate")(s, d)
        .select($"doc_id", $"n_tokens".as("nt")))
    },

    // The manifest re-weighed in trained-BPE tokens — the declared
    // form of [[trainManifestBpe]], so the parameterized token
    // accounting is oracle-checked, not just spec-checked: DuckDB
    // recomputes the curate chain AND every word's BPE tokens from
    // the merge literals, then reconciles the same 16-row manifest
    // (oracle lives with the model: Bpe.dynamicOracles).
    "pipe_train_manifest_bpe" -> ((s, d) => trainManifestBpe(s, d)),

    // Training windows budgeted in trained-BPE tokens — the declared
    // form of [[txtWindowsBpe]] (oracle with the model:
    // Bpe.dynamicOracles re-derives every window from merge literals).
    "txt_windows_bpe" -> ((s, d) => txtWindowsBpe(s, d)),

    // Deterministic hash sampling — the staple curation subsample at
    // corpus scale: keep a document iff the leading hex byte of
    // md5(doc_id) sorts below the rate threshold ('1a' ≈ 26/256 ≈ 10%).
    // A pure pushdown-able filter: no shuffle, no RNG state, the SAME
    // subset on every engine, every rerun, and every partitioning —
    // the reproducibility property rand()-based sampling lacks, and
    // what makes train/eval splits auditable.
    "txt_sample_det" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .filter(substring(
          md5(to_binary($"doc_id".cast("string"), lit("utf-8"))), 1, 2)
          < SampleThreshold)
        .select($"doc_id", $"source", $"lang", length($"text").as("n_chars"))
    },

    // Benchmark decontamination: flag training documents sharing any
    // DecontamN-token n-gram with the held-out eval split (here a
    // deterministic md5-prefix split; in production the eval side is
    // the benchmark suite). The scale shape is an inverted index on
    // 8-byte gram hashes: explode → distinct → one equi-join shuffle
    // keyed by gram hash — never a doc×doc comparison. Eval grams stay
    // a relation (joined, not broadcast): at 100 TB the eval side can
    // itself be large.
    "txt_decontaminate" -> { (s, d) =>
      val (train, evalGrams) = decontamSides(s, d)
      contaminationReport(train, evalGrams)
    },

    // Bloom-prefiltered decontamination — the same EXACT semantics as
    // txt_decontaminate, computed the way a 100 TB corpus wants it:
    // the held-out side's distinct gram hashes fold into a Bloom
    // filter (exact distributed sketch via df.stat.bloomFilter) that
    // ships to every executor once; the training side's gram stream is
    // then culled MAP-SIDE by mightContain BEFORE the join exchange,
    // so the wide shuffle carries only probable hits (~fpp of the
    // corpus gram stream) instead of every gram. The exact equi-join
    // verify on the survivors removes the false positives — the Bloom
    // is a prefilter, never a correctness dependency, which is why the
    // output stays hash-oracled with the exact-decontamination SQL.
    // Sized by BloomExpectedGrams: overflow only degrades fpp (more
    // rows survive to the verify join), never the result.
    "txt_bloom_decontaminate" -> { (s, d) =>
      import s.implicits._
      val (train, evalGrams) = decontamSides(s, d)
      // stat.bloomFilter executes its aggregation EAGERLY and throws an
      // NPE from BloomFilter.readFrom (null aggregate buffer) when its
      // input is empty — possible on degenerate corpora. Catch exactly
      // that signature and report zero contamination; anything else
      // (executor loss, OOM) still propagates. An isEmpty() pre-gate
      // would instead run the whole eval-side gram aggregation as an
      // extra job on every healthy run.
      val bloomOpt =
        try Some(evalGrams.stat.bloomFilter("gh", BloomExpectedGrams, BloomFpp))
        catch { case _: NullPointerException => None }
      bloomOpt match {
        case None => contaminationReport(train.limit(0), evalGrams)
        case Some(bloom) =>
          val mightContain = udf((gh: Long) => bloom.mightContain(gh))
            .withName("bloom_might_contain")
          contaminationReport(train.filter(mightContain($"gh")), evalGrams)
      }
    },

    // Vocabulary build — the tokenizer-construction step: global token
    // counts, top-VocabSize by (count desc, token asc), contiguous ids
    // in that order. One explode → partial-agg shuffle keyed by token
    // (map-side combine collapses each split's repeats before the
    // exchange); the global top-V is TakeOrderedAndProject (per-
    // partition heaps, no full sort), and the id-assigning window runs
    // over the V-row survivor set — bounded by the vocab size, never
    // the corpus.
    "txt_vocab" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select(explode(tokens($"text")).as("token"))
        .groupBy($"token").agg(count(lit(1)).as("n_occ"))
        .orderBy($"n_occ".desc, $"token".asc)
        .limit(VocabSize)
        .withColumn("token_id",
          (row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy($"n_occ".desc, $"token".asc)) - 1).cast("long"))
        .select($"token", $"token_id", $"n_occ")
    },

    // Fixed-token training windows: each document cut into
    // WinTokens-token windows every WinStride tokens (overlap
    // WinTokens - WinStride) — the sample-shaping step between
    // curation and tokenization. Output stays NARROW: (win_id,
    // tok_start, n_toks) offsets plus an md5 fingerprint of the
    // window's token text — at 100 TB the windows table is offsets +
    // checksums, and slicing is a narrow map at read time. Row-local:
    // explode of a per-row sequence, zero shuffle, linear in corpus
    // tokens.
    "txt_windows" -> ((s, d) =>
      windowsOver(Tables.documents(s, d), tokens(col("text")))),

    // Unigram Shannon entropy per document — the "natural text vs
    // degenerate/generated" quality signal (low entropy = stuck
    // generator or keyword stuffing; ~ln(types) = natural prose).
    // Same row-local shape as txt_repetition: one hashmap kernel pass,
    // zero shuffle; the oracle states the identical quantity
    // relationally (unnest → counts → ln) via the algebraic form
    // H = ln(n) − Σ c·ln(c) / n, which both engines sum in double.
    // Parity rests on rounding absorbing the ≤1-ulp ln() and
    // summation-order differences (~1e-15 on ≤100-term docs) — the
    // same tolerance class as every ROUND(SUM(double)) oracle in the
    // suite, NOT the bit-exact left-to-right contract of the vector
    // kernels (entropy's ln makes that unattainable across engines).
    // round(5), not 6: a doc landing within ~1 ulp of a 5e-7 rounding
    // boundary could flip the 6th digit on one engine; two more orders
    // of margin drown the drift on any corpus.
    "txt_entropy" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id",
          round(entropyKernel(tokens($"text")), 5).as("entropy"))
    },

    // Intra-document repetition signals (the Gopher-style quality
    // gates): duplicate-token ratio, duplicate-2-gram ratio, and the
    // corpus's classic "stuck generator" tell — the fraction of 2-grams
    // taken by the single most frequent one. One tight kernel pass per
    // row (hash map over 2-grams), zero shuffle: the oracle states the
    // same metrics relationally (unnest → group) to pin the values.
    "txt_repetition" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", repetitionKernel(tokens($"text")).as("r"))
        .select($"doc_id",
          $"r.n_tok".cast("long").as("n_tokens"),
          round(($"r.n_tok" - $"r.n_types").cast("double") /
            greatest($"r.n_tok", lit(1)), 6).as("dup_token_ratio"),
          round(($"r.n_2grams" - $"r.d_2grams").cast("double") /
            greatest($"r.n_2grams", lit(1)), 6).as("dup_2gram_ratio"),
          round($"r.max_2gram".cast("double") /
            greatest($"r.n_2grams", lit(1)), 6).as("top_2gram_frac"))
    },

    // Stratified (per-source quota) sampling — the data-mixing staple:
    // exactly StratQuota docs per source, chosen by deterministic
    // md5-rank so every engine and rerun picks the same docs. Three
    // stages so it scales: a pushdown-able hash pre-filter culls the
    // scan, then the classic distributed exact top-k — rank within
    // (source, salt) and keep each salt bucket's top quota (a bucket's
    // top-k is a superset of its members of the global top-k), then
    // re-rank the ≤ StratSalts×StratQuota survivors per source. The
    // final window IS keyed by bare source, but its input is a
    // CONSTANT per source (the phase-1 cap), never corpus-scaled —
    // the allowlisted exception PlanQualitySpec's skew guard pins.
    "txt_stratified_sample" -> { (s, d) =>
      import s.implicits._
      val h = md5($"doc_id".cast("string"))
      val salted = Tables.documents(s, d)
        .filter(substring(h, 1, 2) < StratPrefilter)
        .select($"doc_id", $"source", h.as("h"),
          pmod(xxhash64($"doc_id"), lit(StratSalts)).as("salt"))
        .withColumn("bucket_rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"source", $"salt").orderBy($"h", $"doc_id")))
        .filter($"bucket_rank" <= StratQuota)
      salted
        .withColumn("samp_rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"source").orderBy($"h", $"doc_id")))
        .filter($"samp_rank" <= StratQuota)
        .select($"doc_id", $"source", $"samp_rank".cast("long").as("samp_rank"))
    },

    // Data-mixing accounting: per-source document/token totals, each
    // source's share of the corpus, and the resampling weight that
    // would equalize token mass across sources (weight > 1 ⇒
    // under-represented). One groupBy shuffle to a per-SOURCE relation
    // (cardinality = number of sources, small by definition at any
    // corpus size), then window totals over that tiny relation — the
    // corpus itself is scanned exactly once.
    "txt_mix_weights" -> { (s, d) =>
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window.partitionBy()
      Tables.documents(s, d)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(tokens($"text")).cast("long")).as("n_tokens"))
        .select($"source", $"n_docs", $"n_tokens",
          round($"n_tokens" / sum($"n_tokens").over(w), 6).as("token_share"),
          round((sum($"n_tokens").over(w) / count(lit(1)).over(w)) / $"n_tokens", 6)
            .as("mix_weight"))
    },

    // ADAPTIVE quality gating: instead of one global threshold, keep
    // documents at or above their OWN source's 25th-percentile alpha
    // ratio — web-crawl and academic-text sources have very different
    // "normal", and a fixed cut over-prunes one and under-prunes the
    // other. Thresholds are a two-phase AGGREGATE (partial map-side
    // value-count maps over 6-rounded alpha_r, merged per source) into
    // a sources-sized relation that is broadcast-joined back — never a
    // window partitioned by bare `source`, which would route every
    // document of a source through ONE task and buffer it whole. Both
    // engines interpolate identically over the same 6-rounded values,
    // so the gate is engine-exact at the boundary.
    "txt_quality_gate" -> { (s, d) =>
      import s.implicits._
      val scored = gateScored(s, d)
      val thresholds = gateThresholds(scored)
      scored.join(broadcast(thresholds), Seq("source"))
        .filter($"alpha_r" >= $"thresh")
        .select($"doc_id", $"source", $"alpha_r", $"thresh")
    },

    // Trained quality classifier — the FineWeb-edu/GPT-3 filter
    // pattern: a cheap-to-apply token model DISTILLED from expensive
    // labels (here the declared percentile gate as weak supervision;
    // in production, LLM or human labels on a sample), scored over
    // every document so the expensive labeler never touches the full
    // corpus. Multinomial naive Bayes with add-one smoothing over the
    // corpus vocabulary: per-token log-odds w(t) = ln((c⁺+1)/(N⁺+V))
    // − ln((c⁻+1)/(N⁻+V)), doc score = smoothed log prior + Σ tf·w.
    // Scale shape: tf (one (doc,tok) shuffle, shared kernel), class
    // counts (one tok-keyed shuffle of the tf relation), scalars and
    // priors as 1-row broadcasts, then the score join tf⋈w on tok —
    // every stage keyed, nothing driver-side; the weight relation is
    // vocabulary-sized so it stays a shuffle join, never a collect.
    // Float sums group-accumulate then round(5), the txt_unigram_nll
    // convention. Docs with no tokens score the prior alone (the
    // LEFT-JOIN pin); a degenerate all-pass gate keeps finite weights
    // through the +1 prior/count smoothing.
    "txt_quality_classifier" -> { (s, d) =>
      val (w, prior) = nbModel(s, d)
      scoreWithNbModel(s, d, w, prior)
    },

    // The stored-model round trip (the txt_bpe_tokens_stored /
    // sim_ann_pq_stored convention) — and the classifier's actual
    // deployment mode: train ONCE (on the labeled corpus; in
    // production, a labeled sample), persist the vocabulary-sized
    // weight relation + the prior, score any later corpus from the
    // stored model without touching the labeler again. Parquet
    // round-trips the double weights exactly, so this shares
    // txt_quality_classifier's oracle verbatim.
    "txt_quality_classifier_stored" -> { (s, d) =>
      val (w, prior) = readNbModel(s, storedNbModelDir(s, d))
      scoreWithNbModel(s, d, w, prior)
    },

    // The classifier's right-to-erasure round trip: train + persist,
    // unlearn the purge slice by count subtraction (one tokenize of
    // the DELETED docs — never a retrain), score the SURVIVING corpus
    // with the folded model. The model state is linear in training
    // docs, so subtract ≡ retrain-over-survivors-with-frozen-labels
    // EXACTLY (the oracle restates that retrain from the base tables;
    // NbLifecycleSpec pins the equivalence in weight space too).
    // Labels are FROZEN at training time (the stored thresholds):
    // erasure removes a training example, it does not re-run the
    // labeler over the survivors — the production semantics when the
    // labeler is an expensive LLM/human pass.
    "txt_quality_classifier_purged" -> { (s, d) =>
      import s.implicits._
      // snapshot-clone of the shared stored model (build-once
      // attribution): clone + count-subtraction unlearning + scoring,
      // never a second train
      val dir = Similarity.storedQueryDir("nbmodel_p", d)
      Similarity.cloneIndexDir(s, storedNbModelDir(s, d), dir)
      // corpus-slice takedown: tf from the session cache (the scorer
      // below reads it anyway) — the unlearning pass stops paying its
      // own tokenize of the deleted docs
      deleteFromNbModelSlice(s, d, dir,
        $"doc_id" % Similarity.PurgeMod === Similarity.PurgeRes)
      val (w, prior) = readNbModel(s, dir)
      scoreWithNbModel(s, d, w, prior,
        $"doc_id" % Similarity.PurgeMod =!= Similarity.PurgeRes)
    },

    // The classifier's nightly-ingest round trip (the
    // dedup_minhash_incremental convention): train the base model on
    // the historical slice — thresholds frozen FROM that slice — then
    // ingest the new batch by counts-add against the frozen
    // supervision (one tokenize of the BATCH, never a corpus
    // retrain), and score the full corpus with the folded model.
    // Base + append ≡ one train over the union with the base slice's
    // labels, by the same linearity the purged form subtracts with
    // (NbLifecycleSpec pins it; the oracle restates the union train
    // with slice-derived thresholds). The output's `label` column
    // stays the full-corpus gate label — the classifier family's
    // shared output contract — while the SCORES come from the
    // frozen-supervision incremental model.
    "txt_quality_classifier_incremental" -> { (s, d) =>
      import s.implicits._
      val dir = Similarity.storedQueryDir("nbmodel_i", d)
      writeNbModel(s, d, dir,
        $"doc_id" % Dedup.IncrementalMod =!= 0)
      // corpus-slice ingest: tf from the session cache the scorer
      // below reads anyway — one corpus tokenize for the whole line
      appendToNbModelSlice(s, d, dir,
        $"doc_id" % Dedup.IncrementalMod === 0)
      val (w, prior) = readNbModel(s, dir)
      scoreWithNbModel(s, d, w, prior)
    },

    // TF-IDF keyword extraction: top-3 terms per document by
    // tf·ln(N/df), deterministic tiebreak on the term. The inverted
    // shapes are all map-side-combinable aggregations (term counts,
    // doc frequencies); N is a one-row broadcast relation, not a
    // driver count, so the plan stays fully declarative. Ranking uses
    // the ROUNDED score so rank ties break identically in every
    // engine.
    "txt_tfidf_top" -> { (s, d) =>
      import s.implicits._
      val toks = Tables.documents(s, d)
        .select($"doc_id", explode(tokens($"text")).as("term"))
      val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      // df derives FROM tf (its rows are exactly the distinct
      // (doc_id, term) pairs): one corpus tokenization, and the
      // (doc_id, term) exchange is shared between the join's branches
      val dfr = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"tfidf".desc, $"term".asc)
      tf.join(dfr, Seq("term"))
        .crossJoin(broadcast(nDocs))
        .select($"doc_id", $"term",
          round($"tf" * log($"n_docs".cast("double") / $"df"), 6).as("tfidf"))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"doc_id", $"term", $"tfidf", $"rk".cast("long").as("rk"))
    },

    // BM25 retrieval scoring (Robertson et al., the Lucene-default
    // +1 IDF variant): top-[[Bm25K]] documents for the fixed query
    // [[Bm25QueryTerms]] with k1/b literals. Scale shape: the
    // query-term filter lands BEFORE the tf shuffle (a handful of
    // terms survive the scan), doc lengths are a narrow no-shuffle
    // projection, corpus stats a 1-row broadcast — so cost is
    // ∝ matching postings, never ∝ corpus × vocabulary. round(6) on
    // the per-doc sum of ≤|Q| O(1)-magnitude contributions is far
    // above double-addition drift; ordering uses the ROUNDED score +
    // doc_id so the top-k SET is engine-exact at the boundary.
    "txt_bm25_topk" -> { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      // the doc-length projection is consumed twice (corpus stats,
      // per-doc join) and therefore tokenizes twice: column pruning
      // specializes each consumer's subplan, so ReuseExchange cannot
      // serve both from one pass (verified — a forced repartition
      // only added a shuffle without achieving reuse). At deployment
      // scale doc length is a STORED column of the corpus table
      // (computed once at ingest), which removes both passes.
      val dl = docs.select($"doc_id", size(tokens($"text")).as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"),
        avg($"dl").as("avgdl"))
      val tf = docs
        .select($"doc_id", explode(tokens($"text")).as("term"))
        .filter($"term".isin(Bm25QueryTerms: _*))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val dfr = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val idf = log(($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5)) + lit(1.0))
      val denom = $"tf" + lit(Bm25K1) *
        (lit(1.0 - Bm25B) + lit(Bm25B) * $"dl" / $"avgdl")
      tf.join(broadcast(dfr), Seq("term"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .select($"doc_id", (idf * ($"tf" * lit(Bm25K1 + 1.0)) / denom).as("c"))
        .groupBy($"doc_id").agg(round(sum($"c"), 6).as("score"))
        .orderBy($"score".desc, $"doc_id".asc)
        .limit(Bm25K)
    },

    // Corpus length profiling — the distribution snapshot a curation
    // run consults before choosing filter thresholds: per-source doc
    // counts and interpolated length/token quantiles. Spark
    // `percentile` and DuckDB `quantile_cont` share the same
    // index = p·(n−1) linear-interpolation definition, so the oracle
    // pins exact values. One shuffle to per-source groups; the exact
    // percentile buffers one group's values — at extreme group sizes
    // switch to approx_percentile (t-digest, mergeable) and a
    // tolerance check.
    "txt_len_stats" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select($"source", length($"text").cast("double").as("nc"),
          size(tokens($"text")).cast("double").as("nt"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          round(expr("percentile(nc, 0.5)"), 4).as("p50_chars"),
          round(expr("percentile(nc, 0.9)"), 4).as("p90_chars"),
          round(expr("percentile(nt, 0.5)"), 4).as("p50_tokens"),
          round(expr("percentile(nt, 0.9)"), 4).as("p90_tokens"))
    },

    // Exact length quantiles at histogram cost — the 100 TB-safe form
    // of txt_len_stats' percentile() (whose aggregation buffer holds
    // EVERY group value, corpus-scaled state per source): token
    // lengths live on a bounded domain, so one groupBy(source, len)
    // histogram (the exchange carries source × distinct-lengths rows,
    // corpus-size-independent) plus a histogram-sized cumulative
    // window yields EXACT quantiles — qth = smallest len with
    // cumulative count ≥ ⌈q·n⌉, the percentile_disc convention. The
    // TOTAL scope re-aggregates the per-source histogram (histogram-
    // sized, the KMV merge-property trick), so the corpus is scanned
    // once. Context-window planning: p50/p90/p99 sequence lengths per
    // source decide packing and truncation budgets.
    "txt_len_quantiles" -> { (s, d) =>
      import s.implicits._
      // GROUPING SETS ((source, len), (len)) — ONE scan+tokenize pass
      // feeds both scopes (a naive per-source histogram re-aggregated
      // for the TOTAL row duplicates the corpus scan in the DAG;
      // measured by ExplainAudit, two FileScans → one); grouping()
      // marks the all-sources rows, surfaced as the '*' scope
      val hist = Tables.documents(s, d)
        .select($"source",
          size(tokens(coalesce($"text", lit("")))).cast("long").as("len"))
        .groupingSets(Seq(Seq($"source", $"len"), Seq($"len")),
          $"source", $"len")
        .agg(count(lit(1)).as("c"), grouping($"source").as("g"))
        .select(when($"g" === 1, lit("*"))
          .otherwise($"source").as("source"), $"len", $"c")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source").orderBy($"len")
      val cum = hist
        .withColumn("cum", sum($"c").over(w))
        .withColumn("n", sum($"c").over(
          org.apache.spark.sql.expressions.Window.partitionBy($"source")))
      def pick(q: Double) =
        min(when($"cum" >= ceil(lit(q) * $"n"), $"len"))
      cum.groupBy($"source")
        .agg(max($"n").as("n_docs"), pick(0.5).as("p50"),
          pick(0.9).as("p90"), pick(0.99).as("p99"))
        .select($"source", $"n_docs", $"p50", $"p90", $"p99")
    },

    // PII-style pattern scrub over the event property payloads: count
    // and redact emails, IPv4s, and digit runs. Pure per-row regex
    // column expressions — no shuffle, codegen'd, linear at any scale.
    // (On the synthetic corpus only digit runs occur; the email/IP
    // patterns exercise the same code path and stay engine-portable
    // RE2-safe regexes.)
    "txt_redact" -> { (s, d) =>
      import s.implicits._
      // counts reconcile with the redaction: each pattern is counted
      // on the string AS IT IS when that pattern's replacement runs
      // (email on raw, IP after emails are gone, digit runs after IPs
      // are gone) — so n_x is exactly the number of [X]/# substitutions
      // in `redacted`, with no double-counting of digits inside an
      // email or IP
      val afterEmail = regexp_replace($"props", EmailPattern, "[EMAIL]")
      val afterIp = regexp_replace(afterEmail, Ipv4Pattern, "[IP]")
      Tables.events(s, d).select(
        $"event_id",
        size(regexp_extract_all($"props", lit(EmailPattern), lit(0)))
          .cast("long").as("n_email"),
        size(regexp_extract_all(afterEmail, lit(Ipv4Pattern), lit(0)))
          .cast("long").as("n_ip"),
        size(regexp_extract_all(afterIp, lit(NumPattern), lit(0)))
          .cast("long").as("n_num"),
        regexp_replace(afterIp, NumPattern, "#").as("redacted"))
    },

    // Duplicated-text-mass triage (Lee et al., "Deduplicating Training
    // Data Makes Language Models Better", ACL 2022 measure): per
    // document, the fraction of its distinct word-3-gram shingles that
    // occur in ANY other document — the number a curation run consults
    // to decide how aggressive its dedup pass must be. Reads the
    // build-once shingle relation (the tokenize+hash pass is never
    // re-run), one shingle-keyed DF aggregation + one doc-keyed
    // re-aggregation; a doc's shingles are distinct, so cross-doc DF>1
    // ⇔ the shingle exists elsewhere. Shingle-less docs report 0.
    "txt_dup_mass" -> { (s, d) =>
      import s.implicits._
      val rows = Dedup.shingleRows(s, d)
      val dfr = rows.groupBy($"shingle").agg(count(lit(1)).as("df"))
      val per = rows.join(dfr, Seq("shingle"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when($"df" > 1, 1L).otherwise(0L)).as("n_dup"))
      Tables.documents(s, d).select($"doc_id")
        .join(per, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"n_shingles", lit(0L)).as("n_shingles"),
          coalesce($"n_dup", lit(0L)).as("n_dup"),
          round(coalesce($"n_dup", lit(0L)).cast("double") /
            greatest(coalesce($"n_shingles", lit(0L)), lit(1L)), 6)
            .as("dup_mass"))
    },

    // Unigram cross-entropy quality proxy — the SQL-expressible
    // stand-in for LM-perplexity filtering (CCNet-style): per
    // document, mean −ln p̂(token) under the corpus unigram
    // distribution. High = rare-token soup (OCR noise, codes); low =
    // stopword-heavy boilerplate; curation keeps a band. One corpus
    // tokenization feeds both tf and the corpus counts (the tfidf
    // exchange-sharing shape); the corpus total is a 1-row broadcast.
    // round(5): the per-doc Σ tf·ln p runs over ≤types terms in
    // engine-local order — the txt_entropy tolerance class.
    "txt_unigram_nll" -> { (s, d) =>
      import s.implicits._
      val toks = Tables.documents(s, d)
        .select($"doc_id", explode(tokens($"text")).as("tok"))
      val tf = toks.groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
      val cnt = tf.groupBy($"tok").agg(sum($"tf").as("c"))
      // the corpus total as ONE narrow scan of per-doc token counts —
      // deriving it from `cnt` would recompute the whole tokenize→tf
      // →count subtree a third time for a single scalar (exact same
      // integer either way)
      val total = Tables.documents(s, d)
        .agg(sum(size(tokens($"text")).cast("long")).as("total"))
      val per = tf.join(cnt, Seq("tok"))
        .crossJoin(broadcast(total))
        .groupBy($"doc_id")
        .agg(sum($"tf").as("n_tokens"),
          (-sum($"tf" * log($"c".cast("double") / $"total")) / sum($"tf"))
            .as("nll"))
      Tables.documents(s, d).select($"doc_id")
        .join(per, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"n_tokens", lit(0L)).as("n_tokens"),
          round(coalesce($"nll", lit(0.0)), 5).as("nll"))
    },

    // Per-source distribution drift — the mixture-monitoring question
    // ("which domain's unigram distribution moved away from the
    // corpus"; run per snapshot/day in deployment, scoped per source
    // here): KL(P_source ‖ P_corpus) over whitespace-token unigrams,
    // decomposed so every corpus-scaled row needs only ITS OWN counts:
    // KL_s = (Σ_t c_st·ln(c_st/c_t))/n_s − ln(n_s/N). One tokenize
    // pass: term totals derive FROM the (source, term) aggregate (its
    // exchange is shared between the join's branches, the tfidf
    // shape), and n_s/N live on the final sources-sized relation — N
    // as a window over ≤|sources| rows, never a second corpus scan.
    // Each source's terms are a subset of the corpus's, so ln's
    // argument is always finite and KL ≥ 0. Float sums round(6) after
    // the n_s division (drift ≪ rounding, the txt_unigram_nll note).
    "txt_drift_kl" -> { (s, d) =>
      import s.implicits._
      val st = Tables.documents(s, d)
        .select($"source", explode(tokens($"text")).as("term"))
        .groupBy($"source", $"term").agg(count(lit(1)).as("c"))
      val ct = st.groupBy($"term").agg(sum($"c").as("ct"))
      val per = st.join(ct, Seq("term"))
        .groupBy($"source")
        .agg(sum($"c").cast("long").as("n_tokens"),
          sum($"c" * log($"c".cast("double") / $"ct")).as("ssum"))
      per
        .withColumn("total", sum($"n_tokens").over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
        .select($"source", $"n_tokens",
          round($"ssum" / $"n_tokens" -
            log($"n_tokens".cast("double") / $"total"), 6).as("kl"))
    },

    // Bigram-LM cross-entropy — the stronger perplexity-filter proxy
    // (the unigram NLL's conditional sibling; the KenLM-filter shape
    // without the external LM). The whole chain lives in
    // The LM-build line (the pairs_build convention): training the
    // corpus bigram model + materializing the per-doc score relation
    // is the family's dominant cost, amortized across three declared
    // consumers — so the bench reports it on its own *_build line and
    // the consumers measure steady-state probes of the session-cached
    // relation. Declared output IS the full score relation.
    "bigram_lm_build" -> ((s, d) => bigramScoreRelation(s, d)),

    // [[bigramScoreRelation]], shared with txt_ppl_buckets and
    // txt_token_budget (declared output is the score triple; the
    // relation's classifier columns project away).
    "txt_bigram_nll" -> { (s, d) =>
      bigramScoreRelation(s, d).select(col("doc_id"), col("n_bigrams"),
        col("nll"))
    },

    // CCNet-style perplexity buckets (Wenzek et al., "CCNet:
    // Extracting High Quality Monolingual Datasets from Web Crawl
    // Data"): documents split per source into head / middle / tail
    // terciles of the bigram-LM cross-entropy — the deployment
    // artifact a curation pipeline mixes by (keep head, downsample
    // middle, drop tail). The score is the SHARED persisted
    // [[bigramScoreRelation]] (one definition with txt_bigram_nll, so
    // the classifier and its score can never drift — and the LM
    // trains once per session, not once per consumer subtree).
    // Tercile CUTOFF VALUES come from
    // the txt_len_quantiles histogram discipline — NOT a per-source
    // rank over documents, which would route a source's every doc
    // through one window task (the class-wide skew guard): counts
    // collapse map-side to (source, nll) histogram rows (bounded by
    // the ROUNDED-score domain, corpus-size-independent), the cum-sum
    // window runs over that bounded relation, t_q = smallest nll with
    // cum ≥ ⌈q·n⌉ (exact integer forms (n+2) div 3, (2n+2) div 3),
    // and docs classify by a broadcast sources-sized cut join. Ties
    // AT a cutoff land in the lower bucket — quantile-threshold
    // semantics, the family convention.
    "txt_ppl_buckets" -> { (s, d) =>
      import s.implicits._
      val W = org.apache.spark.sql.expressions.Window
      val score = bigramScoreRelation(s, d)
        .select($"doc_id", $"source", $"nll")
      val hist = score.groupBy($"source", $"nll").agg(count(lit(1)).as("c"))
      val cuts = hist
        .withColumn("cum", sum($"c").over(W.partitionBy($"source")
          .orderBy($"nll")
          .rowsBetween(W.unboundedPreceding, W.currentRow)))
        .withColumn("n", sum($"c").over(W.partitionBy($"source")))
        .groupBy($"source")
        .agg(min(when($"cum" >= expr("(n + 2) div 3"), $"nll")).as("t1"),
          min(when($"cum" >= expr("(2 * n + 2) div 3"), $"nll")).as("t2"))
      score.join(broadcast(cuts), Seq("source"))
        .select($"doc_id", $"source", $"nll",
          when($"nll" <= $"t1", lit("head"))
            .when($"nll" <= $"t2", lit("middle"))
            .otherwise(lit("tail")).as("ppl_bucket"))
    },

    // Token-budget curation — the data-mixing question at the TOKEN
    // level (a training run buys token mass, not document count):
    // per source, keep the lowest-perplexity documents until HALF the
    // source's token mass is selected. Same bounded-histogram
    // discipline as txt_ppl_buckets (never a per-document window over
    // bare source): token mass collapses map-side to (source, ROUNDED
    // nll) rows, the cum-sum window runs over that bounded relation,
    // the cut is the smallest nll whose cumulative token mass reaches
    // ⌈T/2⌉ = (T+1) div 2, and docs classify by a broadcast
    // sources-sized cut join. Ties at the cut keep (threshold
    // semantics — the budget is met, overshooting only by the
    // boundary score bin). Output = the kept manifest rows.
    "txt_token_budget" -> { (s, d) =>
      import s.implicits._
      val W = org.apache.spark.sql.expressions.Window
      val score = bigramScoreRelation(s, d)
        .select($"doc_id", $"source", $"n_tokens", $"nll")
      val hist = score.groupBy($"source", $"nll")
        .agg(sum($"n_tokens").as("tm"))
      val cuts = hist
        .withColumn("cum", sum($"tm").over(W.partitionBy($"source")
          .orderBy($"nll")
          .rowsBetween(W.unboundedPreceding, W.currentRow)))
        .withColumn("t", sum($"tm").over(W.partitionBy($"source")))
        .groupBy($"source")
        .agg(min(when($"cum" >= expr("(t + 1) div 2"), $"nll")).as("cut"))
      score.join(broadcast(cuts), Seq("source"))
        .filter($"nll" <= $"cut")
        .select($"doc_id", $"source", $"n_tokens", $"nll")
    },

    // Deterministic training-shard layout audit: route each document
    // to one of 16 shards by a stable id hash (the first md5 nibble —
    // content-free, so shard membership survives text edits), then
    // audit the layout per shard: doc count, token mass, and an
    // ORDER-INDEPENDENT membership fingerprint (bit_xor of a 32-bit
    // md5-derived doc key). The assignment column is exactly what a
    // shard writer's `repartition(shard)` routes on at 100 TB; the
    // audit is one map-side-combinable aggregation to a 16-row
    // relation (partial bit_xor/sum/count collapse per input split
    // before the exchange), and the fingerprint lets two independent
    // runs — or two engines — certify identical shard membership
    // without ever comparing document lists.
    "txt_shard" -> { (s, d) =>
      import s.implicits._
      val h = md5($"doc_id".cast("string"))
      Tables.documents(s, d)
        .select(
          conv(substring(h, 1, 1), 16, 10).cast("int").as("shard"),
          conv(substring(h, 1, 8), 16, 10).cast("long").as("mk"),
          coalesce(size(tokens($"text")), lit(0)).cast("long").as("n_toks"))
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_toks").as("n_tokens"),
          expr("bit_xor(mk)").as("member_fp"))
    },

    // Temperature-based mixture resampling (the multi-source/
    // multilingual rebalancing staple, α = 1/2): each source keeps
    // documents at rate min(1, MixBaseRate·√(n_max/n_s)) — the
    // largest source is cut to MixBaseRate while smaller sources keep
    // proportionally more, flattening the source distribution toward
    // uniform exactly as p_s ∝ n_s^α resampling does. The keep
    // decision is a deterministic integer compare,
    // hash32(doc) < ⌊rate·2³²⌋ — the same subset on every engine,
    // rerun, and partitioning (the txt_sample_det reproducibility
    // contract). The rate table derives from ONE per-source count
    // aggregation (a sources-sized relation, broadcast back), so the
    // corpus is scanned once with a row-local filter. Cross-engine
    // exactness by construction: n_max/n_s divides exact longs, sqrt
    // is IEEE-correctly-rounded, round(,6) then ·2³² (exact power-of-
    // two scaling) and floor leave no ulp room for disagreement.
    "txt_mix_sample" -> { (s, d) =>
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window.partitionBy()
      val rates = Tables.documents(s, d)
        .groupBy($"source").agg(count(lit(1)).as("n"))
        .select($"source",
          round(least(lit(1.0),
            lit(MixBaseRate) * sqrt(max($"n").over(w).cast("double") / $"n")), 6)
            .as("keep_rate"))
      val hv = conv(substring(
        md5(concat(lit("mix|"), $"doc_id".cast("string"))), 1, 8), 16, 10)
        .cast("long")
      Tables.documents(s, d)
        .join(broadcast(rates), Seq("source"))
        .filter(hv < floor($"keep_rate" * lit(4294967296.0)).cast("long"))
        .select($"doc_id", $"source", $"keep_rate")
    },

    // Gopher-style quality rule battery (Rae et al. 2021, Table A1 —
    // the published heuristic suite for web-scale pretraining
    // corpora): per-document metrics plus one 0/1 flag per rule,
    // n_fail and an overall pass. Rules: word count within
    // [GopherMinWords, GopherMaxWords]; mean word length within
    // [GopherMeanWlenMin, GopherMeanWlenMax]; fraction of words
    // containing an alphabetic character >= GopherAlphaFracMin;
    // stopword count >= GopherMinStopwords; symbol ('#' / '...')
    // -to-word ratio <= GopherSymbolRatioMax. Flags derive from the
    // ROUNDED metrics (the repo-wide threshold convention), so both
    // engines gate on identical doubles. Entirely row-local — one
    // scan, no shuffle, linear at 100 TB. NULL text yields NULL
    // metrics, whose comparisons are NULL, and CASE/when treat that
    // as fail on both engines.
    "txt_gopher_rules" -> { (s, d) =>
      import s.implicits._
      val toks = tokens($"text")
      val nw = size(toks).cast("double")
      val base = Tables.documents(s, d).select(
        $"doc_id",
        size(toks).cast("long").as("n_words"),
        round(coalesce(aggregate(transform(toks, t => length(t)), lit(0),
          (acc, x) => acc + x), lit(0)).cast("double") / greatest(nw, lit(1.0)), 6)
          .as("mean_wlen"),
        round(size(filter(toks, t => t.rlike("[A-Za-z]"))) /
          greatest(nw, lit(1.0)), 6).as("alpha_frac"),
        stopwordCount(toks).cast("long").as("n_stop"),
        round(regexp_count($"text", lit("#|\\.\\.\\.")) /
          greatest(nw, lit(1.0)), 6).as("sym_ratio"))
      val flags = Seq(
        $"n_words" >= GopherMinWords && $"n_words" <= GopherMaxWords,
        $"mean_wlen" >= GopherMeanWlenMin && $"mean_wlen" <= GopherMeanWlenMax,
        $"alpha_frac" >= GopherAlphaFracMin,
        $"n_stop" >= GopherMinStopwords,
        $"sym_ratio" <= GopherSymbolRatioMax)
      val nOk = flags.map(f => when(f, 1L).otherwise(0L)).reduce(_ + _)
      base.withColumn("n_fail", lit(flags.size.toLong) - nOk)
        .withColumn("pass", when($"n_fail" === 0L, 1L).otherwise(0L))
    },

    // C4 cleaning heuristics (Raffel et al. 2020 §2.2, the published
    // rule set minus the external bad-words list and the span dedup,
    // which is [[Dedup]]'s dedup_lines/dedup_substring): a line is
    // retained iff it ends in a terminal punctuation mark, holds at
    // least C4MinLineWords words, and lacks the word "javascript";
    // the page survives iff the retained text holds at least
    // C4MinSentences sentence marks and the raw page has neither
    // "lorem ipsum" nor a curly brace. Entirely row-local column
    // expressions — one scan, no shuffle, linear at 100 TB; at
    // deployment scale keep/text_clean become the ingest-time gate
    // and stored column. NULL text follows the repo's no-tokens
    // contract (zero counts, NULL rebuild, keep 0).
    "txt_c4_rules" -> { (s, d) =>
      import s.implicits._
      val ls = split($"text", "\n", -1)
      val keptL = filter(ls, l =>
        trim(l).rlike(C4EndMarkClass + "$") &&
          size(tokens(l)) >= C4MinLineWords &&
          !l.rlike("(?i)\\bjavascript\\b"))
      val clean = when($"text".isNull, lit(null).cast("string"))
        .otherwise(concat_ws("\n", keptL))
      Tables.documents(s, d).select(
        $"doc_id",
        coalesce(size(ls), lit(0)).cast("long").as("n_lines"),
        coalesce(size(keptL), lit(0)).cast("long").as("n_kept"),
        coalesce(regexp_count(clean, lit(C4EndMarkSentence)), lit(0))
          .cast("long").as("n_sentences"),
        when(lower($"text").contains("lorem ipsum"), 1L).otherwise(0L)
          .as("has_lorem"),
        when($"text".contains("{"), 1L).otherwise(0L).as("has_brace"),
        clean.as("text_clean"))
        .withColumn("keep",
          when($"n_sentences" >= C4MinSentences &&
            $"has_lorem" === 0L && $"has_brace" === 0L, 1L).otherwise(0L))
    })

  /** N-gram length for decontamination overlap (13 is the common
    * published choice for web-scale corpora; 8 keeps the synthetic
    * short-doc fixtures meaningful while exercising the same plan).
    */
  val DecontamN = 8

  /** Gopher rule bounds (Rae et al. 2021, Table A1). Word-count /
    * mean-word-length / alpha-fraction / symbol-ratio bounds are the
    * published values (the fixture's 10–99-word docs split ~55/45 on
    * the 50-word floor); the stopword floor uses this repo's closed
    * [[Stopwords]] set (Gopher's rule counts hits from a comparable
    * small closed list).
    */
  val GopherMinWords = 50
  val GopherMaxWords = 100000
  val GopherMeanWlenMin = 3.0
  val GopherMeanWlenMax = 10.0
  val GopherAlphaFracMin = 0.8
  val GopherMinStopwords = 2
  val GopherSymbolRatioMax = 0.1

  /** C4 rule constants (Raffel et al. 2020 §2.2). The terminal-mark
    * class is the paper's period/exclamation/question/end-quote set;
    * the sentence counter counts the sentence-ENDING marks (.!?) in
    * the retained text. Regexes are RE2-safe character classes so both
    * engines match identically.
    */
  val C4MinLineWords = 5
  val C4MinSentences = 3
  val C4EndMarkClass = "[.!?\"]"
  val C4EndMarkSentence = "[.!?]"

  /** BM25 parameters — the standard k1/b defaults and a fixed query
    * over corpus-vocabulary terms (a declared query has no runtime
    * input; the terms are literals the same way the quality thresholds
    * are).
    */
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25K = 20
  val Bm25QueryTerms: Seq[String] = Seq("spark", "join", "filter")

  /** The md5-prefix used for the train/eval document split — ONE
    * definition shared by decontamination and pipe_curate so the split
    * rule cannot drift between consumers.
    */
  private[graft] def splitPrefix(id: Column): Column =
    substring(md5(id.cast("string")), 1, 2)

  /** The cheap row-local quality gate (length / alpha-ratio / TTR
    * thresholds) — one definition shared by txt_quality_filter and
    * pipe_curate so the thresholds cannot drift. Returns the surviving
    * rows unprojected.
    */
  private[graft] def qualityGate(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val toks = tokens($"text")
    df.filter(length($"text") >= 100 &&
      length(regexp_replace($"text", "[^A-Za-z]", "")) /
        greatest(length($"text"), lit(1)).cast("double") >= 0.7 &&
      size(array_distinct(toks)) /
        greatest(size(toks).cast("double"), lit(1.0)) >= 0.2)
  }

  /** The token-packing stage over (doc_id, source, n_tokens) rows —
    * one definition shared by txt_pack and pipe_curate: per
    * (source, shard) running token sum → PackTokens-sized pack ids.
    */
  private def packStage(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source", $"shard").orderBy($"doc_id")
    df.select($"doc_id", $"source", $"n_tokens",
        floor($"doc_id" / lit(ShardDocs.toDouble)).cast("long").as("shard"))
      .withColumn("cum", sum($"n_tokens").over(w))
      .select($"doc_id", $"source", $"shard", $"n_tokens",
        floor(($"cum" - $"n_tokens") / lit(PackTokens.toDouble)).cast("long")
          .as("pack_id"))
  }

  /** The window machinery behind txt_windows, over ANY per-doc token
    * stream — the "token" a training job budgets is a PARAMETER
    * (whitespace tokens for the declared query, BPE tokens via
    * [[txtWindowsBpe]]), the windowing/fingerprint contract is not.
    */
  private def windowsOver(docs: DataFrame, toks: Column): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select($"doc_id", toks.as("ts"))
      .select($"doc_id", $"ts", explode(expr(
        s"sequence(0, cast((greatest(size(ts) - $WinTokens, 0) + ${WinStride - 1}) div $WinStride AS INT))"))
        .as("w"))
      .select($"doc_id", $"w".cast("long").as("win_id"),
        ($"w" * WinStride).cast("long").as("tok_start"),
        least(lit(WinTokens), size($"ts") - $"w" * WinStride).cast("long")
          .as("n_toks"),
        md5(to_binary(concat_ws(" ", slice($"ts", $"w" * WinStride + 1,
          least(lit(WinTokens), size($"ts") - $"w" * WinStride))),
          lit("utf-8"))).as("win_fp"))
  }

  /** txt_windows budgeted in trained-BPE tokens: the same row-local
    * window plan over the [[Bpe.tokensArrayUdf]] stream — window
    * lengths now mean what the loader's sequence budget means.
    */
  def txtWindowsBpe(s: SparkSession, d: String): DataFrame =
    windowsOver(Tables.documents(s, d),
      Bpe.tokensArrayUdf(Bpe.bpeModel(s, d))(col("text")))

  /** The manifest stage behind pipe_train_manifest, over ANY
    * (doc_id, nt) token-mass relation: md5 shard/membership keys from
    * doc_id, one 16-group map-side-combinable agg. Membership (n_docs,
    * member_fp) depends only on doc_id — swapping the token counter
    * can re-weigh shards but never changes WHICH docs are in them
    * (spec-pinned in BpeSpec).
    */
  private def manifestFrom(docTokens: DataFrame): DataFrame = {
    val s = docTokens.sparkSession
    import s.implicits._
    val h = md5($"doc_id".cast("string"))
    docTokens
      .select(
        conv(substring(h, 1, 1), 16, 10).cast("int").as("shard"),
        conv(substring(h, 1, 8), 16, 10).cast("long").as("mk"),
        $"nt".cast("long").as("nt"))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"nt").as("n_tokens"),
        expr("bit_xor(mk)").as("member_fp"))
  }

  /** pipe_train_manifest with token mass in trained-BPE tokens: the
    * curated membership joined to [[Bpe.tokenMass]] — one narrow
    * doc_id-keyed join (16 bytes/row), then the same 16-row agg. The
    * loader-facing numbers now budget what the tokenizer will emit.
    */
  def trainManifestBpe(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    manifestFrom(queries("pipe_curate")(s, d).select($"doc_id")
      .join(Bpe.tokenMass(s, d), Seq("doc_id")))
  }

  /** The two sides of decontamination, shared by the exact and Bloom
    * paths so the gram projection and split rule cannot drift between
    * them: (training gram rows (doc_id, source, gh), distinct held-out
    * gram hashes (gh)). The kernel emits per-doc-distinct grams, so
    * each shared gram counts once per doc with no extra dedup
    * exchange.
    */
  private def decontamSides(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val grams = Tables.documents(s, d)
      .select($"doc_id", $"source", decontamGramHashes($"text").as("ghs"),
        splitPrefix($"doc_id").as("split"))
    val train = grams.filter($"split" >= EvalSplitThreshold)
      .select($"doc_id", $"source", explode($"ghs").as("gh"))
    val evalGrams = grams.filter($"split" < EvalSplitThreshold)
      .select(explode($"ghs").as("gh")).distinct()
    (train, evalGrams)
  }

  /** Exact contamination verify + per-doc tally — the tail both
    * decontamination paths end in (the Bloom path pre-culls `train`
    * before calling this, which is why its result is identical).
    */
  private def contaminationReport(train: DataFrame, evalGrams: DataFrame): DataFrame = {
    val s = train.sparkSession
    import s.implicits._
    train.join(evalGrams, Seq("gh"))
      .groupBy($"doc_id", $"source")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Eval-split bound for decontamination: md5 prefix < '0d' ≈ 5% of
    * docs form the held-out side; the rest are the training side.
    */
  val EvalSplitThreshold = "0d"

  /** Docs kept per source by txt_stratified_sample. */
  val StratQuota = 5

  /** Salt-bucket fan-out of txt_stratified_sample's phase-1 partial
    * rank: the final per-source re-rank reads at most
    * StratSalts×StratQuota rows per source — a constant, which is what
    * makes the bare-source window skew-proof at any corpus size.
    */
  val StratSalts = 32

  /** Bloom sizing for txt_bloom_decontaminate: expected distinct
    * held-out gram hashes and target false-positive rate. ~1 MiB of
    * bits at these values — broadcast-trivial. An eval side larger
    * than expected only degrades the fpp (more rows reach the exact
    * verify join); the RESULT never depends on the sketch.
    */
  val BloomExpectedGrams = 1L << 20
  val BloomFpp = 0.03

  /** Vocabulary size kept by txt_vocab (count-desc, token-asc order —
    * fully deterministic, so ids are stable across engines and runs).
    */
  val VocabSize = 1000

  /** Training-window shape for txt_windows: WinTokens-token windows
    * every WinStride tokens (WinTokens - WinStride tokens of overlap,
    * the common causal-LM ~1/6 overlap). Sized to the fixture corpus
    * (docs average ~54 tokens, max ~100) so multi-window docs AND
    * partial tail windows are exercised; production callers pass their
    * context length (the operator's math is size-agnostic).
    */
  val WinTokens = 48
  val WinStride = 40

  /** Hash pre-filter bound for txt_stratified_sample ('80' ≈ 50%):
    * correctness-neutral as long as ≥ quota docs per source survive
    * (window rank finishes the exact quota); the lever that keeps the
    * rank window's input small at corpus scale.
    */
  val StratPrefilter = "80"

  /** Engine-portable (RE2-safe, no backtracking constructs) scrub
    * patterns for txt_redact.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val NumPattern = "[0-9]+"

  /** Distinct DecontamN-gram 64-bit hashes per document — the same
    * native [[graft.plans.NgramHashes]] expression as Dedup's shingle
    * paths (shared tokenize pass + FNV-1a), so decontamination can
    * never silently diverge from the shingle / minhash / LSH paths. A
    * tight kernel per NOTES perf lesson 1: the declarative form
    * (transform over sequence + slice + concat_ws + xxhash64) is
    * interpreted per gram element and measured 7.4 s at sf0.1 — the
    * bench's heaviest query — vs linear kernel time. The oracle counts
    * distinct gram STRINGS, so the hash choice is free (collisions at
    * ~10⁵ grams are ~10⁻¹⁰).
    */
  def decontamGramHashes(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.NgramHashes(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), DecontamN))

  /** Unigram entropy kernel: H = ln(n) − Σ c·ln(c) / n over the token
    * counts — one hashmap pass (NOTES perf lesson 1). Empty docs → 0.
    */
  val entropyKernel: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (toksIn: Seq[String]) =>
      val toks = Option(toksIn).getOrElse(Seq.empty) // null text = no tokens
      val n = toks.length
      if (n == 0) 0.0
      else {
        val m = new java.util.HashMap[String, Int]()
        toks.foreach(t => m.merge(t, 1, Integer.sum))
        var slc = 0.0
        m.values.forEach(c => slc += c * math.log(c.toDouble))
        math.log(n.toDouble) - slc / n
      }
    }

  /** Single-pass repetition metrics per document. */
  final case class RepStats(n_tok: Int, n_types: Int, n_2grams: Int,
      d_2grams: Int, max_2gram: Int)

  /** Repetition metrics kernel: one hash-map pass over the token
    * stream. A tight-loop UDF per NOTES perf lesson 1 — the relational
    * form (explode 2-grams → two groupBys) would shuffle the whole
    * corpus twice for per-row-computable metrics.
    */
  val repetitionKernel: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (toksIn: Seq[String]) =>
      val toks = Option(toksIn).getOrElse(Seq.empty) // null text = no tokens
      val nTok = toks.length
      val types = new java.util.HashSet[String]()
      val grams = new java.util.HashMap[String, Int]()
      var i = 0
      var max2 = 0
      while (i < nTok) {
        types.add(toks(i))
        if (i + 1 < nTok) {
          val c = grams.merge(toks(i) + " " + toks(i + 1), 1, Integer.sum)
          if (c > max2) max2 = c
        }
        i += 1
      }
      RepStats(nTok, types.size, math.max(nTok - 1, 0), grams.size, max2)
    }

  /** Hex prefix bound for [[queries txt_sample_det]]: '1a' keeps hash
    * prefixes 00..19 = 26 of 256 ≈ 10.2% of documents.
    */
  val SampleThreshold = "1a"

  /** Token budget per training pack (txt_pack). */
  val PackTokens = 2048

  /** Documents per packing shard (txt_pack): bounds every window
    * partition to ShardDocs rows however large the corpus grows.
    */
  val ShardDocs = 100000L

  /** Base keep-rate for the LARGEST source in txt_mix_sample; smaller
    * sources keep min(1, MixBaseRate·√(n_max/n_s)). A power of two so
    * the rate arithmetic stays exactly representable.
    */
  val MixBaseRate = 0.25

  private[operators] val sqlToks = "list_filter(regexp_split_to_array(text, '\\s+'), t -> len(t) > 0)"
  private val sqlStop = Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** DuckDB restatement of Spark's `conv(substring(md5(x),1,8),16,10)`
    * — the first 32 md5 bits as a BIGINT, built from eight hex-digit
    * strpos terms (DuckDB has no base-conversion function).
    */
  private[operators] def sqlHex32(md5Expr: String): String =
    (0 until 8).map { i =>
      s"(strpos('0123456789abcdef', substr($md5Expr, ${i + 1}, 1)) - 1) * ${1L << (4 * (7 - i))}"
    }.mkString("(", " + ", ")")

  /** The bigram-NLL CTE chain (through the per-doc `per` relation),
    * shared verbatim by the `txt_bigram_nll` oracle and the
    * `txt_ppl_buckets` oracle that ranks over it — the SQL image of
    * [[bigramScoreRelation]].
    */
  private lazy val bigramNllCtes: String =
    s"""toks AS (SELECT doc_id, $sqlToks AS t FROM documents),
          bg AS (SELECT doc_id,
              unnest(list_transform(generate_series(2, len(t)),
                i -> t[i-1])) AS prev,
              unnest(list_transform(generate_series(2, len(t)),
                i -> t[i])) AS cur
            FROM toks WHERE len(t) >= 2),
          tf AS (SELECT doc_id, prev, cur, COUNT(*) AS tf FROM bg
            GROUP BY doc_id, prev, cur),
          bc AS (SELECT prev, cur, SUM(tf) AS cbg FROM tf
            GROUP BY prev, cur),
          pc AS (SELECT prev, SUM(cbg) AS cprev FROM bc GROUP BY prev),
          voc AS (SELECT COUNT(DISTINCT tok) AS v FROM
            (SELECT unnest($sqlToks) AS tok FROM documents)),
          per AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n,
              -SUM(tf * ln((cbg + 1)::DOUBLE / (cprev + v)::DOUBLE))
                / SUM(tf) AS nll
            FROM tf JOIN bc USING (prev, cur) JOIN pc USING (prev)
              CROSS JOIN voc
            GROUP BY doc_id)"""

  /** The pipe_curate CTE chain, shared verbatim by the `pipe_curate`
    * oracle and the `pipe_train_manifest` oracle that nests it.
    */
  private[operators] lazy val curateOracle: String =
    s"""WITH q AS (
          SELECT doc_id, source, text FROM documents
          WHERE LENGTH(text) >= 100
            AND LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE /
              GREATEST(LENGTH(text), 1) >= 0.7
            AND len(list_distinct($sqlToks))::DOUBLE /
              GREATEST(len($sqlToks), 1) >= 0.2),
        k AS (
          SELECT doc_id, source, text FROM (
            SELECT doc_id, source, text, ROW_NUMBER() OVER (
              PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM q)
          WHERE rn = 1),
        tok AS (SELECT doc_id, $sqlToks AS ts FROM documents),
        g AS (SELECT doc_id,
          CASE WHEN len(ts) >= $DecontamN
            THEN list_transform(range(0, len(ts) - ${DecontamN - 1}),
              i -> array_to_string(ts[i+1:i+$DecontamN], ' '))
            ELSE [] END AS gs,
          substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS split
          FROM tok),
        ev AS (SELECT DISTINCT gram FROM
          (SELECT unnest(gs) AS gram FROM g WHERE split < '$EvalSplitThreshold')),
        contaminated AS (SELECT DISTINCT doc_id FROM
          (SELECT doc_id, unnest(gs) AS gram FROM g
           WHERE split >= '$EvalSplitThreshold') t JOIN ev USING (gram)),
        c AS (
          SELECT k.doc_id, k.source, k.text FROM k
          WHERE substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 2) >= '$EvalSplitThreshold'
            AND k.doc_id NOT IN (SELECT doc_id FROM contaminated))
        SELECT doc_id, source, n_tokens,
          CAST(FLOOR((cum - n_tokens) / $PackTokens.0) AS BIGINT) AS pack_id
        FROM (SELECT doc_id, source, len($sqlToks) AS n_tokens,
          SUM(len($sqlToks)) OVER (
            PARTITION BY source, CAST(FLOOR(doc_id / $ShardDocs.0) AS BIGINT)
            ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM c)"""

  /** Exact-decontamination oracle, shared by `txt_decontaminate` and
    * `txt_bloom_decontaminate` — the Bloom path's whole point is that
    * its result is indistinguishable from the exact one.
    */
  private val decontamOracle: String =
    s"""WITH tok AS (SELECT doc_id, source, $sqlToks AS ts FROM documents),
        g AS (SELECT doc_id, source,
          CASE WHEN len(ts) >= $DecontamN
            THEN list_transform(range(0, len(ts) - ${DecontamN - 1}),
              i -> array_to_string(ts[i+1:i+$DecontamN], ' '))
            ELSE [] END AS gs,
          substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS split
          FROM tok),
        ev AS (SELECT DISTINCT gram FROM
          (SELECT unnest(gs) AS gram FROM g WHERE split < '$EvalSplitThreshold')),
        tr AS (SELECT DISTINCT doc_id, source, gram FROM
          (SELECT doc_id, source, unnest(gs) AS gram FROM g
           WHERE split >= '$EvalSplitThreshold'))
        SELECT doc_id, source, COUNT(*) AS n_shared
        FROM tr JOIN ev USING (gram)
        GROUP BY doc_id, source"""

  /** The gate's per-document alpha ratio — factored so the gate
    * query, the NB labeler, and the model takedown all compute the
    * SAME rounded expression (a fork here would fork labels).
    */
  private def gateScored(s: SparkSession, d: String): DataFrame =
    alphaR(Tables.documents(s, d))

  private def alphaR(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id", $"source",
      round(length(regexp_replace($"text", "[^A-Za-z]", "")) /
        greatest(length($"text"), lit(1)).cast("double"), 6).as("alpha_r"))
  }

  private def gateThresholds(scored: DataFrame): DataFrame = {
    import scored.sparkSession.implicits._
    scored.groupBy($"source")
      .agg(round(expr("percentile(alpha_r, 0.25)"), 6).as("thresh"))
  }

  /** Train the NB quality model: the gate's weak labels → per-token
    * log-odds weights (vocabulary-sized, stays distributed) + the
    * smoothed document-prior log-odds (one double). Shared by the
    * session query and the stored round trip so the training
    * arithmetic cannot fork.
    */
  def nbModel(s: SparkSession, d: String): (DataFrame, Double) = {
    val (classCnt, pd, nd) = nbCounts(s, d)
    (nbWeightsOf(classCnt), math.log((pd + 1).toDouble / (nd + 1)))
  }

  /** The model's SUFFICIENT STATISTICS — per-token class counts and
    * the labeled-document tallies. These are LINEAR in documents
    * (sums of per-doc contributions), which is what makes the stored
    * model erasable by subtraction ([[deleteFromNbModel]]); the
    * weights/prior are the nonlinear readout derived at use time.
    */
  private def nbCounts(s: SparkSession, d: String): (DataFrame, Long, Long) = {
    import s.implicits._
    val labeled = nbLabels(s, d)
    val tf = nbTf(s, d)
    val classCnt = tf.join(labeled, Seq("doc_id"))
      .groupBy($"tok")
      .agg(sum(when($"label" === 1, $"tf").otherwise(0L)).as("c_pos"),
        sum(when($"label" === 0, $"tf").otherwise(0L)).as("c_neg"))
    val (pd, nd) = labeled.agg(
        sum(when($"label" === 1, 1L).otherwise(0L)),
        sum(when($"label" === 0, 1L).otherwise(0L)))
      .as[(Long, Long)].first()
    (classCnt, pd, nd)
  }

  /** The add-one-smoothed log-odds readout over a (tok, c_pos, c_neg)
    * relation — shared by the in-session trainer and the stored-model
    * reader so the derived doubles are bit-identical on both paths.
    */
  private[operators] def nbWeightsOf(classCnt: DataFrame): DataFrame = {
    import classCnt.sparkSession.implicits._
    val scal = classCnt.agg(sum($"c_pos").as("np"), sum($"c_neg").as("nn"),
      count(lit(1)).as("v"))
    classCnt.crossJoin(broadcast(scal))
      .select($"tok",
        (log(($"c_pos" + 1).cast("double") / ($"np" + $"v")) -
          log(($"c_neg" + 1).cast("double") / ($"nn" + $"v"))).as("w"))
  }

  /** The gate's weak labels as a (doc_id, label) relation —
    * session-cached (the bigramScoreCache contract): the classifier
    * family's trainer, scorer, and stored round trip all reference
    * the labels, and the gate's percentile pass should run once per
    * (session, corpus), not once per reference.
    */
  private def nbLabels(s: SparkSession, d: String): DataFrame =
    nbLabelsCache.getOrBuild(s, d) {
      import s.implicits._
      val pass = queries("txt_quality_gate")(s, d)
        .select($"doc_id", lit(1L).as("pass"))
      Tables.documents(s, d).select($"doc_id")
        .join(pass, Seq("doc_id"), "left")
        .select($"doc_id", coalesce($"pass", lit(0L)).as("label"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  private val nbLabelsCache = new SessionCache[DataFrame](df =>
    scala.util.Try(df.unpersist(blocking = false)))

  /** The full-corpus (doc_id, tok, tf) relation — THE classifier
    * family's expensive intermediate (one tokenize + one keyed
    * shuffle), session-cached so training and scoring share one pass
    * instead of re-tokenizing the corpus per consumer (the r16
    * verdict's margin item on the stored line). Streaming batches
    * keep their own kernel ([[scoreDocsWithNbModel]]) — this cache is
    * the full-corpus path only.
    */
  private def nbTf(s: SparkSession, d: String): DataFrame =
    nbTfCache.getOrBuild(s, d) {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", explode(tokens($"text")).as("tok"))
        .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  private val nbTfCache = new SessionCache[DataFrame](df =>
    scala.util.Try(df.unpersist(blocking = false)))

  /** Score a corpus with a GIVEN NB model — row set is every document,
    * score = prior + Σ tf·w over the model's vocabulary (tokens absent
    * from the model contribute nothing — the stored model's contract
    * when scoring a LATER corpus; on the training corpus the
    * vocabulary covers everything, which is what the shared oracle
    * states).
    */
  def scoreWithNbModel(s: SparkSession, d: String, w: DataFrame,
      prior: Double, rowPred: Column = lit(true)): DataFrame = {
    import s.implicits._
    // full-corpus path: score from the session-cached tf relation
    // (rowPred is a doc_id predicate, so filtering the cached rows ≡
    // tokenizing the filtered docs) — training and scoring share one
    // tokenize pass
    val tf = nbTf(s, d).filter(rowPred)
    val per = tf.join(w, Seq("tok"))
      .groupBy($"doc_id").agg(sum($"tf" * $"w").as("sw"))
    val scored = Tables.documents(s, d).filter(rowPred).select($"doc_id")
      .join(per, Seq("doc_id"), "left")
      .select($"doc_id",
        round(lit(prior) + coalesce($"sw", lit(0.0)), 5).as("nb_score"))
    nbLabels(s, d)
      .join(scored, Seq("doc_id"))
      .select($"doc_id", $"label", $"nb_score")
  }

  /** The scoring core over a GIVEN docs relation — row set is every
    * input document, score = prior + Σ tf·w over the model's
    * vocabulary. Shared by the declared queries (via
    * [[scoreWithNbModel]], which joins the training labels back) and
    * the streaming scorer ([[graft.streaming.DocStream.scoreStream]]),
    * whose micro-batches are exactly this batch kernel's input.
    */
  def scoreDocsWithNbModel(docs: DataFrame, w: DataFrame,
      prior: Double): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = docs.select($"doc_id", explode(tokens($"text")).as("tok"))
    val tf = toks.groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
    val per = tf.join(w, Seq("tok"))
      .groupBy($"doc_id").agg(sum($"tf" * $"w").as("sw"))
    docs.select($"doc_id")
      .join(per, Seq("doc_id"), "left")
      .select($"doc_id",
        round(lit(prior) + coalesce($"sw", lit(0.0)), 5).as("nb_score"))
  }

  /** Persist the trained model AS ITS SUFFICIENT STATISTICS — the
    * (tok, c_pos, c_neg) count relation, the (pd, nd) labeled-doc
    * tallies, and the gate thresholds the labels came from. Counts
    * (not weights) are stored because counts are LINEAR in training
    * documents: a training-doc takedown appends the deleted docs'
    * contributions NEGATED ([[deleteFromNbModel]], the CDC counts-add
    * algebra) and every reader folds — whereas log-odds weights are
    * nonlinear and unsubtractable. The weights/prior a consumer
    * scores with are derived at read time by the same shared
    * arithmetic the in-session trainer uses ([[nbWeightsOf]]), so the
    * stored round trip stays bit-identical to the session model.
    * The thresholds sidecar freezes the weak supervision: erasure
    * removes a training example's counts, it never re-labels the
    * surviving corpus (the expensive labeler — here the percentile
    * gate, in production an LLM or human pass — ran once at training
    * time; its outputs are part of the model's provenance).
    */
  def writeNbModel(s: SparkSession, d: String, outDir: String): Unit = {
    import s.implicits._
    val (classCnt, pd, nd) = nbCounts(s, d)
    classCnt.write.mode("overwrite").parquet(s"$outDir/counts")
    Seq((pd, nd)).toDF("pd", "nd").write.mode("overwrite")
      .parquet(s"$outDir/scalars")
    gateThresholds(gateScored(s, d)).write.mode("overwrite")
      .parquet(s"$outDir/thresholds")
  }

  /** The session's shared stored NB model, written at most once per
    * (session, corpus) — build-once attribution (the writeLexIndexOnce
    * convention, r18): the stored scorer reads it directly, the
    * takedown query snapshots it by file clone (negative-count
    * unlearning rows never land on the shared base). The incremental
    * form trains a DIFFERENT artifact (slice-frozen thresholds) and
    * keeps its own build.
    */
  private val nbModelOnce = new SessionCache[String]()
  private def storedNbModelDir(s: SparkSession, d: String): String =
    nbModelOnce.getOrBuild(s, d) {
      val dir = Similarity.storedQueryDir("nbmodel", d)
      writeNbModel(s, d, dir)
      dir
    }

  /** Read a stored model back as (weights, prior): fold the count
    * algebra (sums per token; tokens whose every carrier was deleted
    * fold to 0+0 and drop, exactly as a retrain over survivors would
    * never see them), then derive the readout through the shared
    * arithmetic.
    */
  def readNbModel(s: SparkSession, indexDir: String): (DataFrame, Double) = {
    import s.implicits._
    val counts = s.read.parquet(s"$indexDir/counts")
      .groupBy($"tok")
      .agg(sum($"c_pos").as("c_pos"), sum($"c_neg").as("c_neg"))
      .filter($"c_pos" + $"c_neg" > 0)
    val (pd, nd) = s.read.parquet(s"$indexDir/scalars")
      .agg(sum($"pd"), sum($"nd")).as[(Long, Long)].first()
    (nbWeightsOf(counts), math.log((pd + 1).toDouble / (nd + 1)))
  }

  /** Unlearn a batch of TRAINING documents from a stored model — the
    * right-to-erasure path that costs one tokenize of the DELETED
    * docs (batch-sized, the deleteFromCdcIndex convention), never a
    * retrain: their labels are recomputed against the STORED
    * thresholds (bit-identical to the labels training used, since
    * both run the same rounded expression against the same frozen
    * cuts), their per-token class contributions and document tallies
    * are appended NEGATED, and every reader's fold makes the model
    * equal a retrain over the survivors WITH THE FROZEN LABELS —
    * spec-pinned by linearity (NbLifecycleSpec). Contract: delete
    * only docs the model was trained on, once (the counts-add
    * algebra cannot know a negative row arrived before its positive
    * twin). Physical purge of cancelled rows is [[compactNbModel]].
    */
  def deleteFromNbModel(s: SparkSession, indexDir: String,
      docs: DataFrame): Unit =
    appendNbContrib(s, indexDir, docs, sign = -1L, mode = "append")

  /** Ingest a batch of NEW training documents into a stored model —
    * the sign-flipped twin of [[deleteFromNbModel]] and the missing
    * half of the counts-add lifecycle (r17 verdict item 3): the batch
    * is labeled against the STORED thresholds (the frozen weak
    * supervision — the expensive labeler ran once at base-training
    * time) and its per-token class contributions and document tallies
    * are appended POSITIVE, so every reader's fold equals one train
    * over base ∪ batch with the frozen labels — nightly training-doc
    * ingest costs one tokenize of the BATCH, never a corpus retrain
    * (NbLifecycleSpec pins the linearity, and append-then-delete of
    * the same batch is an exact involution). Contract: append a doc
    * at most once, and never one the model already counts (the
    * counts-add algebra cannot detect a double add); batch docs whose
    * `source` has no stored threshold carry no supervision and
    * contribute nothing — stated, and restated by the oracle's inner
    * threshold join. Physical fold of the appended delta files is
    * [[compactNbModel]]; single-writer like all maintenance ops.
    */
  def appendToNbModel(s: SparkSession, indexDir: String,
      docs: DataFrame): Unit =
    appendNbContrib(s, indexDir, docs, sign = 1L, mode = "append")

  /** The shared signed-contribution kernel of the NB lifecycle:
    * label `docs` against the STORED frozen thresholds (the same
    * rounded expression training used, so lifecycle labeling can
    * never fork from training labeling), tokenize the batch alone,
    * and land `sign` × (per-token class counts, document tallies) on
    * the count algebra. Cost is batch-sized on every path.
    */
  private def appendNbContrib(s: SparkSession, indexDir: String,
      docs: DataFrame, sign: Long, mode: String,
      tfOverride: Option[DataFrame] = None,
      alphaOverride: Option[DataFrame] = None): Unit = {
    import s.implicits._
    val thr = s.read.parquet(s"$indexDir/thresholds")
    // the label relation feeds TWO actions (the counts write and the
    // scalars aggregate): unpersisted, each re-ran the alpha_r regex
    // pass over the batch (measured — the slice train paid alpha_r
    // 3x, r19 LifecycleTiming). It is (doc_id, label), docs-sized and
    // narrow; persist across the two actions and drop before return.
    val labeled = alphaOverride.getOrElse(alphaR(docs))
      .join(broadcast(thr), Seq("source"))
      .select($"doc_id",
        when($"alpha_r" >= $"thresh", 1L).otherwise(0L).as("label"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // corpus-slice callers pass the session-cached tf relation
      // filtered to the slice (≡ tokenizing the slice, deterministic
      // kernel); arbitrary-batch callers (streams) tokenize the batch
      val tf = tfOverride.getOrElse {
        docs.select($"doc_id", explode(tokens($"text")).as("tok"))
          .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
      }
      tf.join(labeled, Seq("doc_id"))
        .groupBy($"tok")
        .agg((lit(sign) * sum(when($"label" === 1, $"tf").otherwise(0L)))
            .as("c_pos"),
          (lit(sign) * sum(when($"label" === 0, $"tf").otherwise(0L)))
            .as("c_neg"))
        .write.mode(mode).parquet(s"$indexDir/counts")
      // Option-decode: an EMPTY batch (a feed trigger with no matching
      // docs) aggregates to one all-NULL row — a legitimate no-op, not
      // a crash (the appendToLexIndex batch-agg convention)
      val (pd, nd) = labeled.agg(
          sum(when($"label" === 1, 1L).otherwise(0L)),
          sum(when($"label" === 0, 1L).otherwise(0L)))
        .as[(Option[Long], Option[Long])].first()
      Seq((sign * pd.getOrElse(0L), sign * nd.getOrElse(0L))).toDF("pd", "nd")
        .write.mode(mode).parquet(s"$indexDir/scalars")
    } finally labeled.unpersist(blocking = false)
  }

  /** Train and persist an NB model on a SLICE of the corpus
    * (`trainPred`), with the weak-supervision thresholds computed
    * over that slice and stored FROZEN — the base build of the
    * incremental lifecycle: later batches enter via
    * [[appendToNbModel]] labeled against the same frozen cuts, so
    * base + appends ≡ one train over the union with the base slice's
    * supervision. The slice's own counts enter through the SAME
    * signed kernel the appends use, so base-training labeling and
    * lifecycle labeling are one code path.
    */
  def writeNbModel(s: SparkSession, d: String, outDir: String,
      trainPred: Column): Unit = {
    val docs = Tables.documents(s, d).filter(trainPred)
    // ONE alpha_r regex pass over the slice, shared by the thresholds
    // write and the contrib labeling (it ran twice — measured in the
    // r19 LifecycleTiming breakdown, where the slice train was 3.9 s
    // of the ~5 s incremental line); tf comes from the session-cached
    // full-corpus relation filtered to the slice (trainPred is a
    // doc_id predicate — every caller's split convention — and the
    // tokenize kernel is deterministic, so the filtered cache rows ≡
    // tokenizing the slice), sparing the train its own tokenize pass
    // next to the scorer's.
    val ar = alphaR(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      gateThresholds(ar).write.mode("overwrite")
        .parquet(s"$outDir/thresholds")
      appendNbContrib(s, outDir, docs, sign = 1L, mode = "overwrite",
        tfOverride = Some(nbTf(s, d).filter(trainPred)),
        alphaOverride = Some(ar))
    } finally ar.unpersist(blocking = false)
  }

  /** [[appendToNbModel]] for a CORPUS-SLICE batch (`pred` over
    * doc_id): identical answer through the same signed kernel, with
    * tf served from the session-cached full-corpus relation instead
    * of a fresh tokenize of the slice — the declared incremental
    * query's path (its scorer reads the same cache, so the whole
    * lifecycle tokenizes the corpus once). Arbitrary-relation batches
    * (streams) keep [[appendToNbModel]].
    */
  def appendToNbModelSlice(s: SparkSession, d: String, indexDir: String,
      pred: Column): Unit =
    appendNbContrib(s, indexDir, Tables.documents(s, d).filter(pred),
      sign = 1L, mode = "append",
      tfOverride = Some(nbTf(s, d).filter(pred)))

  /** [[deleteFromNbModel]] for a corpus-slice takedown (`pred` over
    * doc_id) — the purged query's path, same cache discipline.
    */
  def deleteFromNbModelSlice(s: SparkSession, d: String, indexDir: String,
      pred: Column): Unit =
    appendNbContrib(s, indexDir, Tables.documents(s, d).filter(pred),
      sign = -1L, mode = "append",
      tfOverride = Some(nbTf(s, d).filter(pred)))

  /** Fold the stored count algebra physically: one row per token,
    * all-zero rows dropped, one scalar row — no reader's answer
    * changes (readers already fold; NbLifecycleSpec pins it), this is
    * the takedown/append defrag. Staging + dir swap, crash-safe.
    */
  def compactNbModel(s: SparkSession, indexDir: String): Unit = {
    import s.implicits._
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val cTmp = new org.apache.hadoop.fs.Path(s"$indexDir/counts_compacting")
    fs.delete(cTmp, true)
    s.read.parquet(s"$indexDir/counts")
      .groupBy($"tok")
      .agg(sum($"c_pos").as("c_pos"), sum($"c_neg").as("c_neg"))
      .filter($"c_pos" + $"c_neg" > 0)
      .write.parquet(cTmp.toString)
    Similarity.swapDirInto(s, cTmp,
      new org.apache.hadoop.fs.Path(s"$indexDir/counts"))
    val sTmp = new org.apache.hadoop.fs.Path(s"$indexDir/scalars_compacting")
    fs.delete(sTmp, true)
    s.read.parquet(s"$indexDir/scalars")
      .agg(sum($"pd").as("pd"), sum($"nd").as("nd"))
      .write.parquet(sTmp.toString)
    Similarity.swapDirInto(s, sTmp,
      new org.apache.hadoop.fs.Path(s"$indexDir/scalars"))
  }

  /** The NB classifier restated over a TRAINING-ROW predicate:
    * thresholds and labels always come from the FULL corpus (the
    * frozen weak supervision), while counts, priors, and the output
    * row set restrict to `rowsWhere` — so the same builder states the
    * base classifier (`TRUE`) and the purged form (survivors), whose
    * contract is retrain-over-survivors-with-frozen-labels.
    */
  private def nbClassifierSql(rowsWhere: String): String =
    s"""WITH q AS (SELECT doc_id, source,
            ROUND(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE /
              GREATEST(LENGTH(text), 1), 6) AS alpha_r
            FROM documents),
          t AS (SELECT doc_id, alpha_r,
            ROUND(quantile_cont(alpha_r, 0.25) OVER (PARTITION BY source), 6)
              AS thresh
            FROM q),
          lab AS (SELECT doc_id,
            CAST(CASE WHEN alpha_r >= thresh THEN 1 ELSE 0 END AS BIGINT)
              AS label FROM t),
          toks AS (SELECT doc_id, unnest($sqlToks) AS tok FROM documents
            WHERE $rowsWhere),
          tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
            GROUP BY doc_id, tok),
          cc AS (SELECT tok,
              SUM(CASE WHEN label = 1 THEN tf ELSE 0 END) AS c_pos,
              SUM(CASE WHEN label = 0 THEN tf ELSE 0 END) AS c_neg
            FROM tf JOIN lab USING (doc_id) GROUP BY tok),
          scal AS (SELECT SUM(c_pos) AS np, SUM(c_neg) AS nn,
            COUNT(*) AS v FROM cc),
          pri AS (SELECT
              SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS pd,
              SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS nd
            FROM lab WHERE doc_id IN (SELECT doc_id FROM documents
              WHERE $rowsWhere)),
          w AS (SELECT tok,
              LN((c_pos + 1)::DOUBLE / (np + v))
                - LN((c_neg + 1)::DOUBLE / (nn + v)) AS w
            FROM cc, scal),
          per AS (SELECT doc_id, SUM(tf * w) AS sw
            FROM tf JOIN w USING (tok) GROUP BY doc_id)
          SELECT l.doc_id, l.label,
            ROUND(LN((pri.pd + 1)::DOUBLE / (pri.nd + 1))
              + COALESCE(per.sw, 0.0), 5) + 0.0 AS nb_score
          FROM lab l CROSS JOIN pri LEFT JOIN per ON per.doc_id = l.doc_id
          WHERE l.doc_id IN (SELECT doc_id FROM documents
            WHERE $rowsWhere)"""

  private lazy val nbClassifierOracle: String = nbClassifierSql("TRUE")

  /** The incremental classifier restated as ONE train over the union
    * with SLICE-derived thresholds: counts/prior label every doc
    * against the base slice's frozen percentile cuts (an inner
    * threshold join — a batch source absent from the slice carries no
    * supervision, the appendToNbModel contract), while the output's
    * `label` column is the full-corpus gate label (the family's
    * shared output contract).
    */
  private lazy val nbIncrClassifierOracle: String = {
    val slice = s"NOT (doc_id % ${Dedup.IncrementalMod} = 0)"
    s"""WITH q AS (SELECT doc_id, source,
            ROUND(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE /
              GREATEST(LENGTH(text), 1), 6) AS alpha_r
            FROM documents),
          tsl AS (SELECT source,
              ROUND(quantile_cont(alpha_r, 0.25), 6) AS thresh
            FROM q WHERE $slice GROUP BY source),
          flab AS (SELECT doc_id,
              CAST(CASE WHEN alpha_r >= thresh THEN 1 ELSE 0 END AS BIGINT)
                AS label
            FROM q JOIN tsl USING (source)),
          toks AS (SELECT doc_id, unnest($sqlToks) AS tok FROM documents),
          tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
            GROUP BY doc_id, tok),
          cc AS (SELECT tok,
              SUM(CASE WHEN label = 1 THEN tf ELSE 0 END) AS c_pos,
              SUM(CASE WHEN label = 0 THEN tf ELSE 0 END) AS c_neg
            FROM tf JOIN flab USING (doc_id) GROUP BY tok),
          scal AS (SELECT SUM(c_pos) AS np, SUM(c_neg) AS nn,
            COUNT(*) AS v FROM cc),
          pri AS (SELECT
              SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS pd,
              SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS nd
            FROM flab),
          w AS (SELECT tok,
              LN((c_pos + 1)::DOUBLE / (np + v))
                - LN((c_neg + 1)::DOUBLE / (nn + v)) AS w
            FROM cc, scal),
          per AS (SELECT doc_id, SUM(tf * w) AS sw
            FROM tf JOIN w USING (tok) GROUP BY doc_id),
          glab AS (SELECT doc_id,
              CAST(CASE WHEN alpha_r >= ROUND(quantile_cont(alpha_r, 0.25)
                OVER (PARTITION BY source), 6) THEN 1 ELSE 0 END AS BIGINT)
                AS label
            FROM q)
          SELECT g.doc_id, g.label,
            ROUND(LN((pri.pd + 1)::DOUBLE / (pri.nd + 1))
              + COALESCE(per.sw, 0.0), 5) + 0.0 AS nb_score
          FROM glab g CROSS JOIN pri LEFT JOIN per ON per.doc_id = g.doc_id"""
  }

  private lazy val oraclesBase: Map[String, String] = Map(
    // The sketch restated exactly: distinct shingle strings per
    // source, the shared FNV-1a's sign-cleared 63-bit value
    // (Dedup.sqlFnv63 — the first oracle where the hash VALUES
    // surface in output, so string construction and fold must match
    // the kernel bit-for-bit), rank ascending, k-prefix aggregate,
    // the TOTAL scope from the merged per-source sketches (the KMV
    // union property), and the same (k−1)·2⁶³/h₍ₖ₎ double arithmetic.
    "txt_distinct_kmv" ->
      s"""WITH toks AS (SELECT doc_id, source, $sqlToks t FROM documents),
          shl AS (SELECT doc_id, source, list_distinct(list_transform(
              generate_series(1, GREATEST(len(t) - 2, 0)),
              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) s FROM toks),
          grams AS (SELECT DISTINCT source, unnest(s) AS g FROM shl),
          h AS (SELECT DISTINCT source, ${Dedup.sqlFnv63("g")} AS h FROM grams),
          ranked AS (SELECT source, h, ROW_NUMBER() OVER (
              PARTITION BY source ORDER BY h ASC) AS rn FROM h),
          persrc AS (SELECT source AS scope, CAST(COUNT(*) AS INT) AS k_used,
              MAX(h) AS kth_hash
            FROM ranked WHERE rn <= $KmvK GROUP BY source),
          tot AS (SELECT '*' AS scope, CAST(COUNT(*) AS INT) AS k_used,
              MAX(h) AS kth_hash
            FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h ASC) AS rn
                  FROM (SELECT DISTINCT h FROM h))
            WHERE rn <= $KmvK),
          u AS (SELECT * FROM persrc UNION ALL SELECT * FROM tot)
          SELECT scope, k_used, kth_hash,
            CASE WHEN k_used < $KmvK THEN CAST(k_used AS DOUBLE)
              ELSE ROUND(${KmvK - 1}.0 * 9223372036854775808.0
                / CAST(kth_hash AS DOUBLE), 4) + 0.0
            END AS est_distinct
          FROM u""",
    // Histogram → cumulative window → smallest len with cum ≥ ⌈q·n⌉,
    // exactly the kernel's pick; the q·n products forced through
    // DOUBLE (the txt_heavy_hitters ceil-parity note). Empty/null
    // text counts as length 0 on both sides (COALESCE to '').
    "txt_len_quantiles" ->
      s"""WITH lens AS (
            SELECT source, CAST(len(list_filter(
              regexp_split_to_array(COALESCE(text, ''), '\\s+'),
              t -> len(t) > 0)) AS BIGINT) AS len
            FROM documents),
          persrc AS (SELECT source, len, COUNT(*) AS c
            FROM lens GROUP BY source, len),
          hist AS (SELECT * FROM persrc
            UNION ALL
            SELECT '*' AS source, len, CAST(SUM(c) AS BIGINT) AS c
            FROM persrc GROUP BY len),
          cum AS (SELECT source, len,
              SUM(c) OVER (PARTITION BY source ORDER BY len) AS cum,
              CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n
            FROM hist)
          SELECT source, MAX(n) AS n_docs,
            MIN(CASE WHEN cum >= CEIL(CAST(0.5 AS DOUBLE) * n) THEN len END) AS p50,
            MIN(CASE WHEN cum >= CEIL(CAST(0.9 AS DOUBLE) * n) THEN len END) AS p90,
            MIN(CASE WHEN cum >= CEIL(CAST(0.99 AS DOUBLE) * n) THEN len END) AS p99
          FROM cum GROUP BY source""",
    // The per-source gate restated exactly: per-source totals, counts,
    // threshold ⌈φ·N_src⌉ (DOUBLE-forced, the ceil-parity note).
    "txt_heavy_hitters_by_source" ->
      s"""WITH toks AS (SELECT source, unnest($sqlToks) AS token FROM documents),
          tot AS (SELECT source, COUNT(*) AS n FROM toks GROUP BY source),
          cnt AS (SELECT source, token, COUNT(*) AS cnt
            FROM toks GROUP BY source, token)
          SELECT c.source, c.token, c.cnt,
            ROUND(c.cnt::DOUBLE / t.n, 6) AS share
          FROM cnt c JOIN tot t USING (source)
          WHERE c.cnt >= GREATEST(CEIL(CAST($HhPhi AS DOUBLE) * t.n), 1)""",
    // Exact restatement — the CMS is a prefilter, never a correctness
    // dependency (the txt_bloom_decontaminate convention), so the
    // oracle is tokens → counts → the fraction-threshold gate. The φ·N
    // product is forced through DOUBLE so both sides ceil the same
    // IEEE value (DuckDB's decimal-literal multiply would round
    // exact-boundary corpora differently than the kernel's double).
    "txt_heavy_hitters" ->
      s"""WITH toks AS (SELECT unnest($sqlToks) AS token FROM documents),
          tot AS (SELECT COUNT(*) AS n FROM toks),
          cnt AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token)
          SELECT token, cnt, ROUND(cnt::DOUBLE / tot.n, 6) AS share
          FROM cnt, tot
          WHERE cnt >= GREATEST(CEIL(CAST($HhPhi AS DOUBLE) * tot.n), 1)""",
    // the takedown restated over the surviving documents only — the
    // subtraction's linearity argument made checkable
    "txt_heavy_hitters_purged" ->
      s"""WITH surv AS (SELECT * FROM documents
            WHERE NOT (doc_id % ${Similarity.PurgeMod} = ${Similarity.PurgeRes})),
          toks AS (SELECT unnest($sqlToks) AS token FROM surv),
          tot AS (SELECT COUNT(*) AS n FROM toks),
          cnt AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token)
          SELECT token, cnt, ROUND(cnt::DOUBLE / tot.n, 6) AS share
          FROM cnt, tot
          WHERE cnt >= GREATEST(CEIL(CAST($HhPhi AS DOUBLE) * tot.n), 1)""",
    // The theta-intersection restated on the same ranked-sketch CTEs:
    // list-built sketches (ascending), θ via the unfilled→2⁶³−1 rule,
    // cuts, list_intersect counts, and the identical double
    // arithmetic. The eval sketch aggregates under GROUP BY so an
    // empty eval split yields NO row (matching the engine's empty
    // relation), not a NULL-sketch row.
    "txt_overlap_kmv" ->
      s"""WITH toks AS (SELECT doc_id, source,
              substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS split,
              $sqlToks t FROM documents),
          shl AS (SELECT doc_id, source, split, list_distinct(list_transform(
              generate_series(1, GREATEST(len(t) - 2, 0)),
              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) s FROM toks),
          tg AS (SELECT DISTINCT source, unnest(s) AS g FROM shl
            WHERE split >= '$EvalSplitThreshold'),
          th AS (SELECT DISTINCT source, ${Dedup.sqlFnv63("g")} AS h FROM tg),
          tranked AS (SELECT source, h, ROW_NUMBER() OVER (
              PARTITION BY source ORDER BY h ASC) AS rn FROM th),
          tsk AS (SELECT source, list(h ORDER BY h) AS sk
            FROM tranked WHERE rn <= $KmvK GROUP BY source),
          eg AS (SELECT DISTINCT unnest(s) AS g FROM shl
            WHERE split < '$EvalSplitThreshold'),
          eh AS (SELECT DISTINCT ${Dedup.sqlFnv63("g")} AS h FROM eg),
          eranked AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h ASC) AS rn FROM eh),
          esk AS (SELECT 1 AS k1, list(h ORDER BY h) AS esk
            FROM eranked WHERE rn <= $KmvK GROUP BY 1),
          j AS (SELECT t.source, t.sk, e.esk,
              LEAST(
                CASE WHEN len(t.sk) < $KmvK THEN 9223372036854775807
                     ELSE t.sk[len(t.sk)] END,
                CASE WHEN len(e.esk) < $KmvK THEN 9223372036854775807
                     ELSE e.esk[len(e.esk)] END) AS theta
            FROM tsk t CROSS JOIN esk e),
          c AS (SELECT source, theta,
              list_filter(sk, x -> x < theta) AS acut,
              list_filter(esk, x -> x < theta) AS bcut FROM j),
          n AS (SELECT source, theta,
              len(list_intersect(acut, bcut)) AS ni,
              len(acut) + len(bcut) - len(list_intersect(acut, bcut)) AS nu
            FROM c)
          SELECT source, CAST(ni AS INT) AS n_inter, CAST(nu AS INT) AS n_union,
            ROUND(CAST(ni AS DOUBLE) * 9223372036854775808.0
              / CAST(theta AS DOUBLE), 4) + 0.0 AS est_inter,
            CASE WHEN nu = 0 THEN 0.0
              ELSE ROUND(CAST(ni AS DOUBLE) / nu, 6) + 0.0 END AS jaccard_est
          FROM n""",
    "txt_tokens" ->
      s"""SELECT doc_id,
          len($sqlToks) AS n_tokens,
          len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpeish,
          len(list_distinct($sqlToks)) AS n_types
          FROM documents""",
    "txt_quality" ->
      s"""SELECT doc_id,
          LENGTH(text) AS n_chars,
          ROUND(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE /
            GREATEST(LENGTH(text), 1), 6) AS alpha_ratio,
          ROUND(COALESCE(list_sum(list_transform($sqlToks, t -> len(t))), 0)::DOUBLE /
            GREATEST(len($sqlToks), 1), 6) AS mean_token_len,
          ROUND(len(list_filter($sqlToks, t -> list_contains($sqlStop, t)))::DOUBLE /
            GREATEST(len($sqlToks), 1), 6) AS stopword_ratio,
          ROUND(len(list_distinct($sqlToks))::DOUBLE /
            GREATEST(len($sqlToks), 1), 6) AS type_token_ratio
          FROM documents""",
    "txt_langid" ->
      s"""SELECT doc_id,
          CASE WHEN len(list_filter($sqlToks, t -> list_contains($sqlStop, t)))::DOUBLE /
            GREATEST(len($sqlToks), 1) >= 0.05
          THEN 'en' ELSE 'und' END AS pred_lang,
          lang AS true_lang
          FROM documents""",
    "txt_quality_filter" ->
      s"""SELECT doc_id, lang, LENGTH(text) AS n_chars FROM documents
          WHERE LENGTH(text) >= 100
            AND LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE /
              GREATEST(LENGTH(text), 1) >= 0.7
            AND len(list_distinct($sqlToks))::DOUBLE /
              GREATEST(len($sqlToks), 1) >= 0.2""",
    "txt_fingerprint" ->
      s"""SELECT doc_id,
          MD5(COALESCE(array_to_string(list_sort(list_distinct($sqlToks)), ' '), '')) AS token_set_fp,
          MD5(text) AS content_fp
          FROM documents""",
    "txt_sample_det" ->
      s"""SELECT doc_id, source, lang, LENGTH(text) AS n_chars FROM documents
          WHERE SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) < '$SampleThreshold'""",
    "txt_pack" ->
      s"""SELECT doc_id, source, shard, n_tokens,
          CAST(FLOOR((cum - n_tokens) / $PackTokens.0) AS BIGINT) AS pack_id
          FROM (SELECT doc_id, source, len($sqlToks) AS n_tokens,
            CAST(FLOOR(doc_id / $ShardDocs.0) AS BIGINT) AS shard,
            SUM(len($sqlToks)) OVER (
              PARTITION BY source, CAST(FLOOR(doc_id / $ShardDocs.0) AS BIGINT)
              ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM documents)""",
    "txt_decontaminate" -> decontamOracle,
    // Same exact result by construction (the Bloom is a prefilter the
    // exact verify join erases), so the same oracle pins it.
    "txt_bloom_decontaminate" -> decontamOracle,
    // The curation pipeline restated as one CTE chain: each stage is
    // the corresponding single-operator oracle applied to the previous
    // stage's survivors.
    "pipe_curate" -> curateOracle,
    // the curate chain verbatim as a nested CTE (the sim_recall_eval
    // nesting trick), re-sharded with the txt_shard arithmetic
    "pipe_train_manifest" ->
      s"""WITH cur AS ($curateOracle)
          SELECT CAST(strpos('0123456789abcdef',
              substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS INT) AS shard,
            COUNT(*) AS n_docs,
            CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
            bit_xor(${sqlHex32("md5(CAST(doc_id AS VARCHAR))")}) AS member_fp
          FROM cur GROUP BY 1""",
    "txt_vocab" ->
      s"""WITH toks AS (SELECT unnest($sqlToks) AS token FROM documents),
          cnt AS (SELECT token, COUNT(*) AS n_occ FROM toks GROUP BY token),
          top AS (SELECT token, n_occ FROM cnt
            ORDER BY n_occ DESC, token LIMIT $VocabSize)
          SELECT token, CAST(ROW_NUMBER() OVER (
            ORDER BY n_occ DESC, token) - 1 AS BIGINT) AS token_id, n_occ
          FROM top""",
    "txt_entropy" ->
      s"""WITH toks AS (SELECT doc_id, unnest($sqlToks) AS tok FROM documents),
          c AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok),
          e AS (SELECT doc_id, SUM(c * ln(c)) AS slc, SUM(c) AS n
            FROM c GROUP BY doc_id)
          SELECT d.doc_id,
            ROUND(COALESCE(ln(e.n) - e.slc / e.n, 0.0), 5) AS entropy
          FROM documents d LEFT JOIN e USING (doc_id)""",
    "txt_windows" ->
      s"""WITH t AS (SELECT doc_id, $sqlToks AS ts FROM documents),
          x AS (SELECT doc_id, ts, UNNEST(range(0,
            (GREATEST(len(ts) - $WinTokens, 0) + ${WinStride - 1}) // $WinStride
              + 1)) AS w
            FROM t)
          SELECT doc_id, CAST(w AS BIGINT) AS win_id,
            CAST(w * $WinStride AS BIGINT) AS tok_start,
            CAST(LEAST($WinTokens, len(ts) - w * $WinStride) AS BIGINT) AS n_toks,
            md5(COALESCE(array_to_string(ts[w * $WinStride + 1 :
              w * $WinStride + LEAST($WinTokens, len(ts) - w * $WinStride)],
              ' '), '')) AS win_fp
          FROM x""",
    "txt_repetition" ->
      s"""WITH tok AS (SELECT doc_id, COALESCE($sqlToks, []) AS ts FROM documents),
          base AS (SELECT doc_id, len(ts) AS n_tok,
            len(list_distinct(ts)) AS n_types,
            CASE WHEN len(ts) >= 2
              THEN list_transform(range(0, len(ts) - 1),
                i -> ts[i+1] || ' ' || ts[i+2])
              ELSE [] END AS gs
            FROM tok),
          gc AS (SELECT doc_id, gram, COUNT(*) AS c FROM
            (SELECT doc_id, unnest(gs) AS gram FROM base) GROUP BY doc_id, gram),
          m AS (SELECT doc_id, SUM(c) AS n2, COUNT(*) AS d2, MAX(c) AS mx
            FROM gc GROUP BY doc_id)
          SELECT b.doc_id, b.n_tok AS n_tokens,
            ROUND((b.n_tok - b.n_types)::DOUBLE / GREATEST(b.n_tok, 1), 6)
              AS dup_token_ratio,
            ROUND((COALESCE(m.n2, 0) - COALESCE(m.d2, 0))::DOUBLE /
              GREATEST(COALESCE(m.n2, 0), 1), 6) AS dup_2gram_ratio,
            ROUND(COALESCE(m.mx, 0)::DOUBLE /
              GREATEST(COALESCE(m.n2, 0), 1), 6) AS top_2gram_frac
          FROM base b LEFT JOIN m ON b.doc_id = m.doc_id""",
    "txt_stratified_sample" ->
      s"""SELECT doc_id, source, samp_rank FROM (
            SELECT doc_id, source,
              CAST(ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
                AS samp_rank
            FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '$StratPrefilter')
          WHERE samp_rank <= $StratQuota""",
    "txt_quality_gate" ->
      s"""WITH q AS (SELECT doc_id, source,
            ROUND(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE /
              GREATEST(LENGTH(text), 1), 6) AS alpha_r
            FROM documents),
          t AS (SELECT doc_id, source, alpha_r,
            ROUND(quantile_cont(alpha_r, 0.25) OVER (PARTITION BY source), 6)
              AS thresh
            FROM q)
          SELECT doc_id, source, alpha_r, thresh FROM t
          WHERE alpha_r >= thresh""",
    // the gate restated as the label CTE, then the full NB training
    // and scoring pipeline in static SQL: exact integer counts, LN
    // log-odds, group-sum + ROUND(5) (the txt_unigram_nll float
    // convention); the stored round trip shares it verbatim (parquet
    // round-trips the double weights/prior exactly)
    "txt_quality_classifier" -> nbClassifierOracle,
    "txt_quality_classifier_stored" -> nbClassifierOracle,
    // erasure ≡ retrain over survivors with frozen labels, restated
    // from the base tables (thresholds/labels over ALL docs — the
    // training-time supervision — counts/priors/rows over survivors)
    "txt_quality_classifier_purged" -> nbClassifierSql(
      s"NOT (doc_id % ${Similarity.PurgeMod} = ${Similarity.PurgeRes})"),
    "txt_quality_classifier_incremental" -> nbIncrClassifierOracle,
    // stored-sketch round trip: long arrays round-trip parquet
    // exactly, so the stored query shares the session oracle STRING
    // (the sim_ann_pq_stored convention) — appended post-Map below
    "txt_tfidf_top" ->
      s"""WITH toks AS (SELECT doc_id, unnest($sqlToks) AS term FROM documents),
          tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
            GROUP BY doc_id, term),
          dfx AS (SELECT term AS dterm, COUNT(*) AS df FROM tf GROUP BY term),
          n AS (SELECT COUNT(*) AS n_docs FROM documents),
          scored AS (SELECT doc_id, term,
            ROUND(tf * ln(n_docs::DOUBLE / df), 6) AS tfidf
            FROM tf JOIN dfx ON term = dterm CROSS JOIN n)
          SELECT doc_id, term, tfidf, rk FROM (
            SELECT doc_id, term, tfidf, ROW_NUMBER() OVER (
              PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rk
            FROM scored) WHERE rk <= 3""",
    "txt_bm25_topk" -> {
      val terms = Bm25QueryTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH dl AS (SELECT doc_id, len($sqlToks) AS dl FROM documents),
          stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
          tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM (
              SELECT doc_id, unnest($sqlToks) AS term FROM documents)
            WHERE term IN ($terms) GROUP BY doc_id, term),
          dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
          contrib AS (SELECT t.doc_id,
              ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
                (tf * ${Bm25K1 + 1.0}) /
                (tf + $Bm25K1 * (${1.0 - Bm25B} + $Bm25B * dl / avgdl)) AS c
            FROM tf t JOIN dfx USING (term)
            JOIN dl ON dl.doc_id = t.doc_id CROSS JOIN stats)
          SELECT doc_id, ROUND(SUM(c), 6) AS score
          FROM contrib GROUP BY doc_id
          ORDER BY score DESC, doc_id LIMIT $Bm25K"""
    },
    "txt_len_stats" ->
      s"""SELECT source, COUNT(*) AS n_docs,
          ROUND(quantile_cont(LENGTH(text)::DOUBLE, 0.5), 4) AS p50_chars,
          ROUND(quantile_cont(LENGTH(text)::DOUBLE, 0.9), 4) AS p90_chars,
          ROUND(quantile_cont(len($sqlToks)::DOUBLE, 0.5), 4) AS p50_tokens,
          ROUND(quantile_cont(len($sqlToks)::DOUBLE, 0.9), 4) AS p90_tokens
          FROM documents GROUP BY source""",
    "txt_mix_weights" ->
      s"""WITH per AS (SELECT source, COUNT(*) AS n_docs,
            CAST(SUM(len($sqlToks)) AS BIGINT) AS n_tokens
            FROM documents GROUP BY source)
          SELECT source, n_docs, n_tokens,
            ROUND(n_tokens / (SUM(n_tokens) OVER ()), 6) AS token_share,
            ROUND((SUM(n_tokens) OVER () / (COUNT(*) OVER ())) / n_tokens, 6)
              AS mix_weight
          FROM per""",
    "txt_redact" ->
      s"""WITH staged AS (SELECT event_id, props,
            regexp_replace(props, '$EmailPattern', '[EMAIL]', 'g') AS after_email,
            regexp_replace(regexp_replace(props, '$EmailPattern', '[EMAIL]', 'g'),
              '$Ipv4Pattern', '[IP]', 'g') AS after_ip
            FROM events)
          SELECT event_id,
          len(regexp_extract_all(props, '$EmailPattern')) AS n_email,
          len(regexp_extract_all(after_email, '$Ipv4Pattern')) AS n_ip,
          len(regexp_extract_all(after_ip, '$NumPattern')) AS n_num,
          regexp_replace(after_ip, '$NumPattern', '#', 'g') AS redacted
          FROM staged""",
    // same distinct word-3-gram shingle definition as the jaccard CTEs.
    // The oracle counts distinct 3-gram STRINGS where the engine counts
    // their 64-bit FNV-1a hashes (Dedup.shingleRows) — n_shingles/df
    // agree modulo a 2⁻⁶⁴ hash collision, the jaccard-family
    // convention (see Dedup.shingleHashes).
    "txt_dup_mass" ->
      s"""WITH toks AS (SELECT doc_id, $sqlToks t FROM documents),
          sh AS (SELECT doc_id, list_distinct(list_transform(
            generate_series(1, GREATEST(len(t) - 2, 0)),
            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) s FROM toks),
          srows AS (SELECT doc_id, unnest(s) AS g FROM sh),
          dfr AS (SELECT g, COUNT(*) AS df FROM srows GROUP BY g),
          per AS (SELECT doc_id, COUNT(*) AS n,
              SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS nd
            FROM srows JOIN dfr USING (g) GROUP BY doc_id)
          SELECT d.doc_id,
            CAST(COALESCE(per.n, 0) AS BIGINT) AS n_shingles,
            CAST(COALESCE(per.nd, 0) AS BIGINT) AS n_dup,
            ROUND(COALESCE(per.nd, 0)::DOUBLE /
              GREATEST(COALESCE(per.n, 0), 1), 6) AS dup_mass
          FROM documents d LEFT JOIN per USING (doc_id)""",
    "txt_unigram_nll" ->
      s"""WITH toks AS (SELECT doc_id, unnest($sqlToks) AS tok FROM documents),
          tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
            GROUP BY doc_id, tok),
          cnt AS (SELECT tok, SUM(tf) AS c FROM tf GROUP BY tok),
          tot AS (SELECT SUM(len($sqlToks)) AS total FROM documents),
          per AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n,
              -SUM(tf * ln(c::DOUBLE / total)) / SUM(tf) AS nll
            FROM tf JOIN cnt USING (tok) CROSS JOIN tot GROUP BY doc_id)
          SELECT d.doc_id,
            COALESCE(per.n, 0) AS n_tokens,
            ROUND(COALESCE(per.nll, 0.0), 5) AS nll
          FROM documents d LEFT JOIN per USING (doc_id)""",
    // the same decomposition restated: (source, term) counts, term
    // totals rolled up from them, the window-N over the per-source
    // relation; identical ln arithmetic, round(6) after the division
    "txt_drift_kl" ->
      s"""WITH st AS (SELECT source, term, COUNT(*) AS c FROM (
            SELECT source, unnest($sqlToks) AS term FROM documents)
            GROUP BY source, term),
          ct AS (SELECT term, SUM(c) AS ct FROM st GROUP BY term),
          per AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
              SUM(c * ln(c::DOUBLE / ct)) AS ssum
            FROM st JOIN ct USING (term) GROUP BY source)
          SELECT source, n_tokens,
            ROUND(ssum / n_tokens -
              ln(n_tokens::DOUBLE / (SUM(n_tokens) OVER ())), 6) AS kl
          FROM per""",
    // the same model restated: row-local bigram lists, two count
    // CTEs (the second rolls up the first), V from the distinct token
    // stream; identical add-one arithmetic, round(5) like the unigram
    "txt_bigram_nll" ->
      s"""WITH $bigramNllCtes
          SELECT d.doc_id,
            COALESCE(per.n, 0) AS n_bigrams,
            ROUND(COALESCE(per.nll, 0.0), 5) AS nll
          FROM documents d LEFT JOIN per USING (doc_id)""",
    // the full score relation the build line materializes: the
    // bigram chain plus the source/token-mass columns carried from
    // the same tokenize pass
    "bigram_lm_build" ->
      s"""WITH $bigramNllCtes
          SELECT d.doc_id, d.source,
            CAST(len($sqlToks) AS BIGINT) AS n_tokens,
            COALESCE(per.n, 0) AS n_bigrams,
            ROUND(COALESCE(per.nll, 0.0), 5) AS nll
          FROM documents d LEFT JOIN per USING (doc_id)""",
    // the SHARED bigram chain (one definition with txt_bigram_nll),
    // then the histogram cut restated: (source, nll) counts, cum-sum
    // over the bounded histogram, t_q = smallest nll with cum ≥ ⌈q·n⌉,
    // threshold classification (ties at a cutoff → the lower bucket)
    "txt_ppl_buckets" ->
      s"""WITH $bigramNllCtes,
          score AS (SELECT d.doc_id, d.source,
              ROUND(COALESCE(per.nll, 0.0), 5) AS nll
            FROM documents d LEFT JOIN per USING (doc_id)),
          hist AS (SELECT source, nll, COUNT(*) AS c FROM score
            GROUP BY source, nll),
          cm AS (SELECT source, nll,
              SUM(c) OVER (PARTITION BY source ORDER BY nll
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
              SUM(c) OVER (PARTITION BY source) AS n
            FROM hist),
          cuts AS (SELECT source,
              MIN(CASE WHEN cum >= (n + 2) // 3 THEN nll END) AS t1,
              MIN(CASE WHEN cum >= (2 * n + 2) // 3 THEN nll END) AS t2
            FROM cm GROUP BY source)
          SELECT s.doc_id, s.source, s.nll,
            CASE WHEN s.nll <= c.t1 THEN 'head'
                 WHEN s.nll <= c.t2 THEN 'middle'
                 ELSE 'tail' END AS ppl_bucket
          FROM score s JOIN cuts c USING (source)""",
    // the token-mass histogram cut restated: (source, nll) token
    // sums, cum over the bounded histogram, cut = smallest nll with
    // cumulative mass ≥ ⌈T/2⌉, keep rows at or under the cut
    "txt_token_budget" ->
      s"""WITH $bigramNllCtes,
          score AS (SELECT d.doc_id, d.source,
              CAST(len($sqlToks) AS BIGINT) AS n_tokens,
              ROUND(COALESCE(per.nll, 0.0), 5) AS nll
            FROM documents d LEFT JOIN per USING (doc_id)),
          hist AS (SELECT source, nll, SUM(n_tokens) AS tm FROM score
            GROUP BY source, nll),
          cm AS (SELECT source, nll,
              SUM(tm) OVER (PARTITION BY source ORDER BY nll
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
              SUM(tm) OVER (PARTITION BY source) AS t
            FROM hist),
          cuts AS (SELECT source,
              MIN(CASE WHEN cum >= (t + 1) // 2 THEN nll END) AS cut
            FROM cm GROUP BY source)
          SELECT s.doc_id, s.source, s.n_tokens, s.nll
          FROM score s JOIN cuts c USING (source)
          WHERE s.nll <= c.cut""",
    "txt_shard" ->
      s"""WITH b AS (SELECT
            strpos('0123456789abcdef',
              substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS shard,
            ${sqlHex32("md5(CAST(doc_id AS VARCHAR))")} AS mk,
            COALESCE(len($sqlToks), 0) AS n_toks
          FROM documents)
          SELECT CAST(shard AS INT) AS shard, COUNT(*) AS n_docs,
            CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
            bit_xor(mk) AS member_fp
          FROM b GROUP BY shard""",
    "txt_mix_sample" ->
      s"""WITH per AS (SELECT source, COUNT(*) AS n FROM documents
            GROUP BY source),
          r AS (SELECT source, ROUND(LEAST(1.0,
              $MixBaseRate * SQRT((MAX(n) OVER ())::DOUBLE / n)), 6)
              AS keep_rate FROM per)
          SELECT d.doc_id, d.source, r.keep_rate
          FROM documents d JOIN r USING (source)
          WHERE ${sqlHex32("md5('mix|' || CAST(d.doc_id AS VARCHAR))")}
            < CAST(FLOOR(keep_rate * 4294967296.0) AS BIGINT)""",
    // Metrics restated with the txt_quality conventions (same token
    // class, same GREATEST guards, same rounding); flags re-derived
    // from the rounded metrics so both engines gate on identical
    // doubles. Bounds interpolate from the shared constants; the
    // ::DOUBLE casts keep DuckDB's DECIMAL literal parsing out of the
    // comparisons (the emb_outliers lesson). NULL text → NULL metrics
    // → CASE arms fall through to 0, matching Spark's when/otherwise.
    "txt_gopher_rules" ->
      s"""WITH m AS (SELECT doc_id,
            len($sqlToks) AS n_words,
            ROUND(COALESCE(list_sum(list_transform($sqlToks, t -> len(t))), 0)::DOUBLE /
              GREATEST(len($sqlToks), 1), 6) AS mean_wlen,
            ROUND(len(list_filter($sqlToks, t -> regexp_matches(t, '[A-Za-z]')))::DOUBLE /
              GREATEST(len($sqlToks), 1), 6) AS alpha_frac,
            len(list_filter($sqlToks, t -> list_contains($sqlStop, t))) AS n_stop,
            ROUND(len(regexp_extract_all(text, '#|\\.\\.\\.'))::DOUBLE /
              GREATEST(len($sqlToks), 1), 6) AS sym_ratio
            FROM documents),
          f AS (SELECT doc_id, n_words, mean_wlen, alpha_frac, n_stop, sym_ratio,
            CASE WHEN n_words >= $GopherMinWords AND n_words <= $GopherMaxWords
              THEN 1 ELSE 0 END
            + CASE WHEN mean_wlen >= $GopherMeanWlenMin::DOUBLE
                AND mean_wlen <= $GopherMeanWlenMax::DOUBLE THEN 1 ELSE 0 END
            + CASE WHEN alpha_frac >= $GopherAlphaFracMin::DOUBLE THEN 1 ELSE 0 END
            + CASE WHEN n_stop >= $GopherMinStopwords THEN 1 ELSE 0 END
            + CASE WHEN sym_ratio <= $GopherSymbolRatioMax::DOUBLE THEN 1 ELSE 0 END
              AS n_ok
            FROM m)
          SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, mean_wlen,
            alpha_frac, CAST(n_stop AS BIGINT) AS n_stop, sym_ratio,
            CAST(5 - n_ok AS BIGINT) AS n_fail,
            CAST(CASE WHEN n_ok = 5 THEN 1 ELSE 0 END AS BIGINT) AS pass
          FROM f""",
    // Line retention restated with the dedup_lines conventions (split
    // on chr(10), ASCII-space trim, array_to_string-empty-is-NULL
    // coalesce) and the gopher-rules word-count class; NULL text
    // yields NULL lists/counts, coalesced to the zero-counts/NULL-
    // rebuild/keep-0 contract.
    "txt_c4_rules" ->
      s"""WITH l AS (SELECT doc_id, text,
            string_split(text, chr(10)) AS ls FROM documents),
          k AS (SELECT doc_id, text, ls,
            list_filter(ls, x -> regexp_matches(trim(x), '$C4EndMarkClass$$')
              AND len(list_filter(regexp_split_to_array(x, '\\s+'),
                t -> len(t) > 0)) >= $C4MinLineWords
              AND NOT regexp_matches(x, '(?i)\\bjavascript\\b')) AS kl
            FROM l),
          m AS (SELECT doc_id, text, ls, kl,
            CASE WHEN text IS NULL THEN NULL
              ELSE COALESCE(array_to_string(kl, chr(10)), '') END AS clean
            FROM k)
          SELECT doc_id,
            COALESCE(len(ls), 0)::BIGINT AS n_lines,
            COALESCE(len(kl), 0)::BIGINT AS n_kept,
            COALESCE(len(regexp_extract_all(clean, '$C4EndMarkSentence')), 0)::BIGINT
              AS n_sentences,
            CASE WHEN contains(lower(text), 'lorem ipsum')
              THEN 1 ELSE 0 END::BIGINT AS has_lorem,
            CASE WHEN contains(text, '{') THEN 1 ELSE 0 END::BIGINT AS has_brace,
            clean AS text_clean,
            CASE WHEN COALESCE(len(regexp_extract_all(clean, '$C4EndMarkSentence')), 0)
                >= $C4MinSentences
              AND NOT COALESCE(contains(lower(text), 'lorem ipsum'), FALSE)
              AND NOT COALESCE(contains(text, '{'), FALSE)
              THEN 1 ELSE 0 END::BIGINT AS keep
          FROM m""")

  /** The base map plus the stored round trips that share a session
    * oracle STRING verbatim (the sim_ann_pq_stored convention).
    */
  lazy val oracles: Map[String, String] =
    oraclesBase +
      ("txt_distinct_kmv_stored" -> oraclesBase("txt_distinct_kmv")) +
      ("txt_heavy_hitters_stored" -> oraclesBase("txt_heavy_hitters"))
}
