package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication operators for a training-data pipeline (builder
  * brief): exact content dedup (the scale generalization of the
  * reference's md5 tracking-table anti-join, `dags/dag.py:452-474`),
  * n-gram Jaccard near-dup, MinHash+LSH banding, SimHash, and
  * embedding-cosine near-dup.
  *
  * Scale design: every near-dup operator avoids the naive O(n²) cross
  * join. Pair generation goes through an inverted index (explode
  * shingles → equi-join on the shingle / band bucket), so the shuffle
  * key is the shingle and cost is Σ bucket², not n². The DuckDB
  * oracles state the same semantics quadratically — affordable at
  * verification scale, which is exactly the point: the oracle is the
  * spec, the Spark plan is the scale path.
  */
object Dedup {

  /** Distinct word n-grams of a document in one tokenize pass —
    * shared by the shingle paths here (n = 3) and txt_decontaminate
    * (n = [[TextAnalysis.DecontamN]]), so a tokenization change cannot
    * silently diverge between them. Semantics match the oracle's
    * regexp_split + list_transform CTE: split on \s+, drop empties,
    * join with single spaces, keep first-occurrence order, distinct.
    * One tight imperative pass because the equivalent Catalyst
    * transform/slice/concat_ws pipeline is evaluated interpretively
    * per element and dominated the shingle-producing stages (~3×).
    */
  private[graft] def distinctNgrams(text: String, n: Int): Seq[String] = {
    val toks = Option(text).getOrElse("").split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) Seq.empty[String]
    else {
      val out = new scala.collection.mutable.LinkedHashSet[String]
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out += sb.toString
        i += 1
      }
      out.toSeq
    }
  }

  /** Positional (in-order, NON-distinct) word n-grams — the shingle
    * stream [[graft.plans.NgramHashesPos]] hashes for the
    * duplicated-span paths (dedup_substring), where the i-th array slot
    * IS token position i. Tokenization is byte-identical to
    * [[distinctNgrams]] so the two shingle views can never diverge.
    */
  private[graft] def positionalNgrams(text: String, n: Int): Seq[String] = {
    val toks = Option(text).getOrElse("").split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) Seq.empty[String]
    else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" "))
  }

  private def distinctShingles(text: String): Seq[String] =
    distinctNgrams(text, 3)

  private val shinglesUdf = udf { (text: String) => distinctShingles(text) }

  def shingles(text: Column): Column = shinglesUdf(text)

  /** FNV-1a 64-bit — the single base hash shared by the inverted
    * index, the minhash signatures, the simhash bit votes, and the LSH
    * verify join, so a hash-function change cannot silently diverge
    * between paths. Folds over Unicode CODE POINTS (not UTF-16 code
    * units): DuckDB's `ord`/string indexing are code-point-based, so
    * this is the only definition both engines can state — charAt would
    * silently diverge on astral-plane text (emoji, CJK extensions),
    * caught by the round-9 adversarial-corpus sweep. A code point is
    * < 2²¹, so `h ^= cp` touches only the low 32 bits — exactly the
    * bounded-XOR form the HUGEINT oracle states.
    */
  @inline private[graft] def fnv1a(g: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < g.length) {
      val cp = g.codePointAt(i)
      h ^= cp
      h *= 0x100000001b3L
      i += Character.charCount(cp)
    }
    h
  }

  /** [[fnv1a]] restated as a DuckDB HUGEINT expression over string
    * column/alias `col` — kept adjacent to the kernel so neither can
    * drift. Folds the code points (ord/indexing are code-point-based
    * in DuckDB) with the low-32-bit XOR + wrapping multiply mod 2⁶⁴;
    * the result is the UNSIGNED 64-bit hash in [0, 2⁶⁴). Shared by
    * the simhash oracle and the KMV sketch oracle.
    */
  private[operators] def sqlFnv(col: String): String =
    s"""list_reduce(
        list_prepend(CAST('14695981039346656037' AS HUGEINT),
          list_transform(generate_series(1, len($col)), i -> CAST(ord($col[i]) AS HUGEINT))),
        (acc, c) -> ((acc - acc % 4294967296 + CAST(xor(CAST(acc % 4294967296 AS BIGINT), CAST(c AS BIGINT)) AS HUGEINT))
                     * CAST('1099511628211' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT))"""

  /** The sign-cleared 63-bit view of [[sqlFnv]] as a BIGINT — the
    * exact SQL image of the kernel-side `fnv1a(g) & Long.MaxValue`.
    */
  private[operators] def sqlFnv63(col: String): String =
    s"CAST(${sqlFnv(col)} % CAST('9223372036854775808' AS HUGEINT) AS BIGINT)"

  /** Distinct word-3-gram shingles pre-hashed to 64 bits in the same
    * tokenize pass (same dedup-on-strings semantics as [[shingles]], so
    * `size(shingleHashes)` = `size(shingles)` even under a hash
    * collision). Everything downstream — inverted index, minhash, LSH
    * verify — shuffles and intersects these 8-byte keys instead of
    * strings. (Collision odds across ~10⁵ distinct shingles are ~10⁻¹⁰
    * — far below the float-rounding tolerance of the oracle check.)
    * Native codegen expression: the hash array lands directly in an
    * ArrayData instead of round-tripping through a Scala-UDF Seq.
    */
  def shingleHashes(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.NgramHashes(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), 3))

  /** Positional (in-order, non-distinct) shingle hashes: slot i = the
    * 3-gram starting at 0-based token position i
    * ([[graft.plans.NgramHashesPos]]) — the duplicated-span stream
    * dedup_substring groups into maximal runs.
    */
  def posShingleHashes(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.NgramHashesPos(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), 3))

  /** doc_id → distinct 64-bit shingle-hash array, built ONCE per
    * (session, corpus) and persisted: the tokenize+hash pass is the
    * dedup family's dominant scan cost, and four consumers read the
    * same relation (the inverted index's exploded rows AND its per-doc
    * sizes, the minhash banding input, the LSH verify join). At corpus
    * scale this is the stored tokenize-once intermediate every
    * curation pipeline materializes before its dedup passes.
    */
  def shingleRelation(s: SparkSession, d: String): DataFrame =
    shingleRelCache.getOrBuild(s, d) {
      import s.implicits._
      // NOT widened (cf. Similarity.widenIfStarved): measured at sf10,
      // hash-exchanging the raw text to beat the row-group-starved
      // scan cost MORE than the serialized tokenize it saves
      // (pairs_build 100 s -> 120 s; round-robin with its
      // sort-before-repartition: 257 s) — this family's cost lives in
      // the downstream shingle-keyed shuffles, not the scan pass
      Tables.documents(s, d)
        .select($"doc_id", shingleHashes($"text").as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  private val shingleRelCache = new SessionCache[DataFrame](df =>
    scala.util.Try(df.unpersist(blocking = false)))

  /** doc_id → exploded distinct 64-bit shingle-hash rows (the
    * inverted-index relation).
    */
  private[operators] def shingleRows(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    shingleRelation(s, d).select($"doc_id", explode($"sh").as("shingle"))
  }

  /** doc_id → positional shingle-hash array, built ONCE per (session,
    * corpus) and persisted — the positional counterpart of
    * [[shingleRelation]]: duplicatedSpans reads it from two branches
    * (the df aggregate and the positional probe), and an uncached
    * relation would re-run the tokenize+hash kernel — the family's
    * dominant scan cost — once per branch.
    */
  private def posShingleRelation(s: SparkSession, d: String): DataFrame =
    posShingleRelCache.getOrBuild(s, d) {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", posShingleHashes($"text").as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  private val posShingleRelCache = new SessionCache[DataFrame](df =>
    scala.util.Try(df.unpersist(blocking = false)))

  /** Rolling-hash window (code points) for content-defined chunking:
    * a cut decision looks at exactly the last [[CdcWindow]] code
    * points, so boundaries depend only on LOCAL content.
    */
  private[graft] val CdcWindow = 16

  /** Expected CDC chunk length (code points). MUST stay a power of
    * two: the kernel tests `h & (D−1) == 0` on the SIGNED 64-bit
    * FNV-1a while the oracle tests the UNSIGNED HUGEINT `% D == 0` —
    * the two agree on the low bits only when D divides 2⁶⁴.
    */
  private[graft] val CdcDivisor = 64

  /** Content-defined chunking (the rsync/LBFS mechanism, FastCDC's
    * deployment shape): a cut falls AFTER 1-based code-point position
    * p (p ≥ [[CdcWindow]]) whenever the FNV-1a hash of the window-gram
    * ending at p is ≡ 0 mod [[CdcDivisor]]. Boundaries depend only on
    * local content, so an edit re-chunks O(1) chunks instead of
    * shifting every downstream boundary — the property fixed-width
    * chunking lacks, and the reason CDC is how sub-document dedup
    * survives insertions at corpus scale. Returns (chunk FNV-1a hash,
    * chunk length) per positional chunk, in order; text shorter than
    * the window is one chunk, empty text none. Chunk identity is
    * [[fnv1a]] over the chunk's code points (the family base hash;
    * the oracle groups chunk STRINGS — equivalent modulo a 2⁻⁶⁴
    * collision, the documented family convention).
    */
  private[graft] def cdcChunks(text: String): Seq[(Long, Int)] = {
    val t = Option(text).getOrElse("")
    if (t.isEmpty) return Seq.empty
    val cps = t.codePoints().toArray
    val n = cps.length
    @inline def fnvRange(a: Int, b: Int): Long = {
      var h = 0xcbf29ce484222325L
      var i = a
      while (i < b) { h ^= cps(i); h *= 0x100000001b3L; i += 1 }
      h
    }
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    // Boundary scan: O(n·W) by the declared semantics (FNV is not
    // rollable — xor and multiply do not commute). The obvious-looking
    // restructure (window offset outer, position inner, so inner
    // iterations carry no dependency chain) was measured WITHIN NOISE
    // of this form across alternating warm rounds (0.6–1.15×,
    // graft.tools.CdcKernelTiming, same-process A/B, r19): successive
    // positions' 16-step chains are already independent of each
    // other, so the out-of-order core overlaps them from the reorder
    // buffer, and the restructure's 8n-byte hash-array round trip per
    // offset eats what the dependency break buys. A measured
    // keep-as-is, not an oversight.
    var p = CdcWindow
    while (p <= n) {
      if ((fnvRange(p - CdcWindow, p) & (CdcDivisor - 1)) == 0L) cuts += p
      p += 1
    }
    if (cuts.isEmpty || cuts.last != n) cuts += n
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Int)](cuts.length)
    var a = 0
    cuts.foreach { b =>
      out += ((fnvRange(a, b), b - a))
      a = b
    }
    out.toSeq
  }

  private val cdcChunksUdf = udf { (text: String) => cdcChunks(text) }

  /** doc_id → positional CDC (hash, len) chunk array, built once per
    * (session, corpus) and persisted: the chunker is the family's
    * dominant scan cost here and the query reads it from two branches
    * (the cross-doc df aggregate and the positional probe) — the
    * [[posShingleRelation]] discipline.
    */
  private def cdcRelation(s: SparkSession, d: String): DataFrame =
    cdcRelCache.getOrBuild(s, d) {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", cdcChunksUdf($"text").as("ch"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  private val cdcRelCache = new SessionCache[DataFrame](df =>
    scala.util.Try(df.unpersist(blocking = false)))

  /** Shared-duplicated-mass threshold (code points) for
    * dedup_cdc_cluster edges: two docs sharing at least this much
    * chunk content are the same-passage family.
    */
  private[graft] val CdcClusterMinChars = 100

  /** Chunk document-frequency bound for the CDC pair index (the
    * MaxShingleDf argument: a chunk present in every doc is
    * boilerplate skew, not a duplication signal — and its bucket
    * would be quadratic).
    */
  private[graft] val MaxCdcDf = 1024

  /** dedup_cdc_cluster's edge relation — COMPONENT-exact, not
    * pair-exact, which is what lets the heavy case go linear (r18;
    * the sf100 decade measured this stage 9.0×/decade, linear in pair
    * mass): the declared output is connected components of E = {pairs
    * with ≥ [[CdcClusterMinChars]] code points of shared duplicated
    * chunk mass}, and components survive replacing any clique by a
    * star. A chunk of length ≥ the threshold is SELF-SUFFICIENT —
    * every pair of its carriers is in E outright — so its df-sized
    * carrier group contributes df−1 star edges to its min-id anchor
    * instead of C(df,2) clique edges (map-side-combinable min, no
    * collect_list, no pair emission at all). Pairs with NO
    * self-sufficient shared chunk qualify iff their SHORT-chunk
    * shared mass reaches the threshold (no long chunk ⇒ short mass =
    * total mass), so the pair-sum path runs over sub-threshold chunks
    * only — the inverted-index shape with the two-pass DF cull (the
    * [[jaccardPairs]] discipline), its collect_list bounded at
    * [[MaxCdcDf]] BY CONSTRUCTION. Components(stars ∪ shortPairs) =
    * components(E) exactly: each star/short edge is itself in E (a
    * shared self-sufficient chunk / a qualifying short sum), and each
    * E-edge either shares a long chunk (both ends reach its anchor)
    * or qualifies on short mass alone (emitted verbatim). The DuckDB
    * oracle states the FULL E closure, so the equivalence is
    * re-proved against an independent engine at every fixture;
    * CdcStarSpec pins the directed cases (long-chunk clique,
    * short-sum-only pair, mixed transitive chain, sub-threshold
    * non-edge) against a naive driver-side recomputation. The
    * long-duplicated-passage blowup — exactly the duplication-dense
    * corpus shape — rides the linear path; duplicate edges across the
    * two branches are fine (the CC kernel symmetrizes).
    */
  private[graft] def cdcClusterEdges(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dch = cdcRelation(s, d)
      .select($"doc_id", explode($"ch").as("c"))
      .select($"doc_id", $"c._1".as("h"), $"c._2".as("l"))
      .distinct()
    val keep = dch.groupBy($"h", $"l").agg(count(lit(1)).as("df"))
      .filter($"df" > 1 && $"df" <= MaxCdcDf)
      .select($"h", $"l")
    val culled = dch.join(keep, Seq("h", "l"), "left_semi")
    val long = culled.filter($"l" >= CdcClusterMinChars)
    val anchors = long.groupBy($"h", $"l")
      .agg(min($"doc_id").as("anchor"))
    val stars = long.join(anchors, Seq("h", "l"))
      .filter($"doc_id" =!= $"anchor")
      .select($"anchor".as("id_a"), $"doc_id".as("id_b"))
      .distinct()
    val shortPairs = culled.filter($"l" < CdcClusterMinChars)
      .groupBy($"h", $"l")
      .agg(collect_list($"doc_id").as("ids"))
      .select($"l", explode(bucketPairs($"ids")).as("p"))
      .groupBy($"p")
      .agg(sum($"l".cast("long")).as("shared_chars"))
      .filter($"shared_chars" >= CdcClusterMinChars)
      .select(shiftrightunsigned($"p", 32).as("id_a"),
        $"p".bitwiseAND(lit(0xffffffffL)).as("id_b"))
    stars.union(shortPairs)
  }

  /** Partition-bucket count for the stored CDC chunk-hash index
    * (pmod of the 64-bit chunk hash). The bucket DOMAIN is the bound
    * that makes the probe's partition pushdown driver-literal-safe:
    * a batch's touched-bucket set can never exceed it.
    */
  private[graft] val CdcIndexBuckets = 64

  /** Write the HISTORICAL CDC chunk-hash index — the snapshot half of
    * the sub-document incremental-dedup lifecycle: the distinct chunk
    * hashes of every historical document, bucket-partitioned by
    * pmod(h) and h-sorted within files. What the lifecycle amortizes
    * at 100 TB is the dominant cost of [[queries dedup_cdc]]: the
    * nightly probe never re-chunks or even re-reads historical TEXT —
    * it meets the past only as this per-distinct-chunk (hash, carrier
    * count) relation. Identity is the same [[fnv1a]]-over-code-points
    * chunk hash the session kernel emits, so an appended doc lands
    * exactly where a full rebuild would place it; the carrier count
    * is what makes doc-level takedown ([[deleteFromCdcIndex]])
    * subtractive instead of a full rebuild.
    */
  def writeCdcIndex(s: SparkSession, d: String, outDir: String,
      pred: Column): Unit =
    writeChunkHashes(cdcRelation(s, d).filter(pred), outDir, "overwrite")

  /** The session's shared HISTORICAL CDC index (docs outside the
    * nightly-batch slice), built at most once per (session, corpus) —
    * build-once attribution (the writeLexIndexOnce convention, r18):
    * the incremental probe serves it directly and the takedown query
    * snapshots it by file clone, so neither line re-bills the corpus
    * build. First-caller-builds is answer-identical regardless of
    * bench order — the write is a pure function of (corpus, dir).
    */
  private val cdcWriteOnce = new SessionCache[String]()
  private def historicalCdcIndexDir(s: SparkSession, d: String): String =
    cdcWriteOnce.getOrBuild(s, d) {
      val dir = Similarity.storedQueryDir("cdc_incr", d)
      writeCdcIndex(s, d, dir, col("doc_id") % IncrementalMod =!= 0)
      dir
    }

  /** The one layout writer all CDC index entry points share (full
    * build from the cached relation, corpus-slice append,
    * arbitrary-batch append, takedown): per-hash NET CARRIER COUNTS
    * (`cnt` = number of distinct batch documents carrying the chunk,
    * negated for deletes), pmod-bucket partition dirs, h-sorted
    * files. The counts-add algebra (the concurrency-sidecar
    * convention) is what makes doc-level takedown possible on an
    * 8-bytes-per-chunk index: a hash is historical iff its summed
    * count is positive, so deleting a doc decrements exactly the
    * chunks it carried and a chunk whose ONLY carriers are deleted
    * stops answering, while a chunk shared with surviving docs keeps
    * counting. Order-independent and exact under the single-writer /
    * exactly-once-ingest contract every stored maintainer here
    * assumes (appending the same doc twice would double its counts —
    * the content-hash idempotence layer lives in the ingest pipeline,
    * FilePipeline's anti-join, not in this layout). One definition so
    * the layouts cannot drift.
    */
  private def writeChunkHashes(rel: DataFrame, dir: String,
      saveMode: String, sign: Int = 1): Unit =
    rel
      .select(col("doc_id"), explode(expr("transform(ch, x -> x._1)")).as("h"))
      .distinct()
      .groupBy(col("h")).agg((count(lit(1)) * sign).as("cnt"))
      .withColumn("bkt", pmod(col("h"), lit(CdcIndexBuckets.toLong)).cast("int"))
      .repartition(col("bkt"))
      .sortWithinPartitions(col("bkt"), col("h"))
      .write.mode(saveMode).partitionBy("bkt")
      .parquet(s"$dir/chunks")

  /** Append a batch's per-hash carrier counts to a stored CDC index —
    * the rolling-ingest half: after a batch probes
    * ([[incrementalCdcMass]]) it is appended so the next batch sees it
    * as historical. Counts are per-batch (distinct docs in the batch
    * carrying the hash); cross-file rows of one hash SUM under the
    * counts-add algebra — exactly what lets [[deleteFromCdcIndex]]
    * subtract later — and [[compactCdcIndex]] is the periodic defrag,
    * the appendToMinhashIndex convention.
    */
  def appendToCdcIndex(s: SparkSession, d: String, indexDir: String,
      pred: Column): Unit =
    writeChunkHashes(cdcRelation(s, d).filter(pred), indexDir, "append")

  /** Doc-level takedown against a stored CDC index (the
    * deleteFromIndex convention on the sub-document side): the
    * deleted documents — a slice of the corpus the index ingested —
    * are re-chunked (the request's doc set is batch-sized; historical
    * TEXT beyond it is still never touched) and their per-hash
    * carrier counts appended NEGATED. From the next probe on, a chunk
    * whose only carriers were deleted stops counting as historical
    * mass; a chunk shared with surviving docs keeps answering.
    * Contract: delete only docs previously ingested (the standard
    * takedown flow) — the counts-add algebra has no way to know a
    * negative row arrived before its positive twin. Physical purge of
    * the cancelled rows is [[compactCdcIndex]], the periodic defrag.
    */
  def deleteFromCdcIndex(s: SparkSession, d: String, indexDir: String,
      pred: Column): Unit = {
    requireCountedCdcLayout(s, indexDir)
    writeChunkHashes(cdcRelation(s, d).filter(pred), indexDir, "append",
      sign = -1)
  }

  /** The subtractive ops' layout gate: a LEGACY (h-only) CDC index
    * stores existence, not carrier counts — subtracting against it
    * would zero a hash the moment ONE of its legacy carriers is
    * deleted, silently dropping chunks other historical docs still
    * carry. Probes stay back-compatible (legacy rows count as one
    * carrier — see the probe's coalesce); deletes and compaction
    * demand the counted layout and say how to get it.
    *
    * The check is PER-LAYOUT, not per-sampled-footer: a MIXED dir
    * (legacy build + counted appends — a state the probe's coalesce
    * explicitly serves) would pass a schema-of-one-footer gate
    * nondeterministically, and subtraction against its legacy rows is
    * exactly the corruption this gate exists to stop. Reading under
    * the explicit counted schema surfaces every legacy row as a NULL
    * cnt (counted writers always set cnt, so NULL ⇔ legacy), and the
    * gate requires zero of them — one column-pruned scan of the slim
    * hash relation, the right price for a destructive maintenance op.
    */
  private def requireCountedCdcLayout(s: SparkSession, indexDir: String): Unit = {
    import org.apache.spark.sql.functions.col
    val legacyRows = s.read.schema(cdcChunksSchema)
      .parquet(s"$indexDir/chunks")
      .filter(col("cnt").isNull).limit(1).count()
    require(legacyRows == 0L,
      s"$indexDir/chunks contains legacy h-only CDC rows (no carrier " +
        "counts): takedown/compaction need per-hash carrier counts to " +
        "subtract correctly - rebuild it with writeCdcIndex before deleting")
  }

  /** [[deleteFromCdcIndex]] for an ARBITRARY (doc_id, text) batch —
    * the takedown-stream entry point, mirroring
    * [[appendChunkHashesFor]].
    */
  def deleteChunkHashesFor(s: SparkSession, indexDir: String,
      docs: DataFrame): Unit = {
    import s.implicits._
    requireCountedCdcLayout(s, indexDir)
    writeChunkHashes(docs.select($"doc_id", cdcChunksUdf($"text").as("ch")),
      indexDir, "append", sign = -1)
  }

  /** Rewrite a stored CDC index with its count algebra folded: one
    * row per (bkt, h) with the summed net carrier count, rows at ≤ 0
    * dropped — so takedown tombstone rows stop occupying scan space
    * and append fragmentation defrags, without changing any probe's
    * answer (the probe already sums; CdcLifecycleSpec pins
    * compacted ≡ uncompacted). Staging + atomic-ish dir swap (the
    * Similarity convention): a crash before the swap leaves the old
    * layout fully intact.
    */
  def compactCdcIndex(s: SparkSession, indexDir: String): Unit = {
    import s.implicits._
    requireCountedCdcLayout(s, indexDir)
    val folded = s.read.schema(cdcChunksSchema).parquet(s"$indexDir/chunks")
      .groupBy($"bkt", $"h").agg(sum($"cnt").as("cnt"))
      .filter($"cnt" > 0)
      .repartition($"bkt")
      .sortWithinPartitions($"bkt", $"h")
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(s"$indexDir/chunks_staging")
    fs.delete(staging, true)
    folded.write.partitionBy("bkt").parquet(staging.toString)
    graft.operators.Similarity.swapDirInto(s, staging,
      new org.apache.hadoop.fs.Path(s"$indexDir/chunks"))
  }

  /** The stored chunk relation's schema, pinned (partition-column
    * inference defeats pruning — the readIvfIndex note).
    */
  private val cdcChunksSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("h",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("cnt",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("bkt",
      org.apache.spark.sql.types.IntegerType)))

  /** Incremental CDC duplicated-mass: the NEW batch's chunks probed
    * against a STORED historical chunk-hash index — same per-doc
    * output contract as [[queries dedup_cdc]] restricted to the batch,
    * with "duplicated" meaning the chunk content exists anywhere in
    * the ingested past. Only the batch is chunked; the stored side is
    * an 8-byte-hash relation orders of magnitude below the corpus
    * text, read under a pushed touched-bucket partition filter
    * (bounded by the [[CdcIndexBuckets]] domain, so the driver
    * collect can never exceed 64 rows — no cap guard needed), then
    * distinct-folded (append files may repeat a hash) and joined on
    * the 8-byte key. Within-batch duplication is the ordinary
    * dedup_cdc over the batch, the incrementalMinhashPairs convention.
    */
  def incrementalCdcMass(s: SparkSession, d: String, indexDir: String,
      batchPred: Column = col("doc_id") % IncrementalMod === 0): DataFrame = {
    import s.implicits._
    // the LAZY form: a declared query's plan stays inspectable (the
    // PlanQualitySpec pushdown pins and any .explain read the real
    // probe plan), and no append follows the probe here
    cdcMassBuild(s, indexDir,
      Tables.documents(s, d).filter(batchPred).select($"doc_id", $"text"),
      eager = false)
  }

  /** [[incrementalCdcMass]] for an ARBITRARY (doc_id, text) batch
    * relation — the SERVING form [[graft.streaming.DocStream
    * .cdcMassStream]] probes per micro-batch. Only the batch is
    * chunked (never the corpus the index summarizes), exactly ONCE
    * (the batch's chunk positions are cached across the
    * touched-bucket collect and the probe join, then dropped), and
    * the result is EAGERLY MATERIALIZED (localCheckpoint, lineage cut
    * from the index scan): the probe is pinned BEFORE any caller
    * appends this batch's hashes to the same index — a lazy plan
    * re-evaluated after the append would scan the just-appended files
    * and compare the batch against itself, silently breaking the
    * new×old contract (a public sink may defer consumption
    * arbitrarily). Everything else is byte-for-byte the declared
    * query's probe, so the stream and batch forms cannot drift.
    */
  def cdcMassFor(s: SparkSession, indexDir: String,
      docs: DataFrame): DataFrame =
    cdcMassBuild(s, indexDir, docs, eager = true)

  private def cdcMassBuild(s: SparkSession, indexDir: String,
      docs: DataFrame, eager: Boolean): DataFrame = {
    import s.implicits._
    val pos0 = docs
      .select($"doc_id", cdcChunksUdf($"text").as("ch"))
      .select($"doc_id", explode($"ch").as("c"))
      .select($"doc_id", $"c._1".as("h"), $"c._2".as("l"))
    // both forms pin the chunk positions across their two consumers
    // (the touched-bucket collect below materializes them, the probe
    // join reads them) so the chunker — the dominant per-batch cost —
    // runs ONCE (r19: the declared form previously stayed fully lazy
    // and paid the batch chunker twice, once at the collect and again
    // at action time; the probed-bucket collect makes this plan
    // partially eager regardless, and the stored-side scan with its
    // pushed bkt filter — the part the plan pins assert on — stays
    // inspectable). eager additionally persists so the checkpointed
    // RESULT below can drop the intermediate.
    val pos =
      if (eager)
        pos0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else pos0.localCheckpoint(true)
    val stored = s.read.schema(cdcChunksSchema).parquet(s"$indexDir/chunks")
    val bkts = pos
      .select(pmod($"h", lit(CdcIndexBuckets.toLong)).cast("int").as("bkt"))
      .distinct().collect().map(_.getInt(0))
    val pruned =
      if (bkts.isEmpty) stored.filter(lit(false))
      else stored.filter($"bkt".isin(bkts.map(Integer.valueOf).toIndexedSeq: _*))
    // historical = net carrier count positive: append rows add,
    // takedown rows subtract ([[deleteFromCdcIndex]]), so a chunk
    // whose only carriers were deleted drops out here — same
    // map-side-combinable aggregate the old distinct fold was.
    // coalesce(cnt, 1): a row from a LEGACY (pre-carrier-count,
    // h-only) index file reads as null under the explicit schema;
    // counting it as one carrier preserves the old existence
    // semantics exactly (sum ≥ 1 iff the hash is present), so probes
    // keep answering across an un-rebuilt index — while the
    // SUBTRACTIVE ops, whose arithmetic legacy rows would corrupt,
    // refuse such layouts loudly ([[requireCountedCdcLayout]]).
    val oldH = pruned
      .groupBy($"h").agg(sum(coalesce($"cnt", lit(1L))).as("c"))
      .filter($"c" > 0)
      .select($"h").withColumn("isdup", lit(1))
    val per = pos.join(oldH, Seq("h"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when($"isdup" === 1, 1L).otherwise(0L)).as("dup_chunks"),
        sum(when($"isdup" === 1, $"l".cast("long")).otherwise(0L))
          .as("dup_chars"))
    val out = docs.select($"doc_id")
      .join(per, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_chunks", lit(0L)).as("n_chunks"),
        coalesce($"dup_chunks", lit(0L)).as("dup_chunks"),
        coalesce($"dup_chars", lit(0L)).as("dup_chars"))
    if (!eager) out
    else {
      // batch-sized relation (per-doc rows), so the pinned copy is
      // small; see the cdcMassFor scaladoc for why it must be pinned
      val mat = out.localCheckpoint(true)
      pos.unpersist(blocking = false)
      mat
    }
  }

  /** Append an arbitrary (doc_id, text) batch's distinct chunk hashes
    * to a stored CDC index — [[appendToCdcIndex]] for the streamed
    * ingest path, sharing its layout exactly.
    */
  def appendChunkHashesFor(s: SparkSession, indexDir: String,
      docs: DataFrame): Unit = {
    import s.implicits._
    writeChunkHashes(docs.select($"doc_id", cdcChunksUdf($"text").as("ch")),
      indexDir, "append")
  }

  /** dedup_substring core: maximal runs of consecutive shingle
    * positions whose shingle occurs in ≥2 distinct documents.
    * Positions are 0-based token indices; consecutive duplicated
    * positions collapse via the gaps-and-islands key (pos − rank).
    * Shingle identity is the 64-bit FNV-1a hash (the family
    * convention; the oracle groups the 3-gram STRINGS — equivalent
    * modulo a 2⁻⁶⁴ collision, far below the check's tolerance).
    */
  private def duplicatedSpans(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val withArr = posShingleRelation(s, d)
    // shingles seen in ≥2 distinct docs. Per-doc positional duplicates
    // collapse ROW-LOCALLY (array_distinct) before the explode, so the
    // df aggregate is one map-side-combinable shuffle on the 8-byte
    // key — no (g, doc_id) distinct exchange at all.
    val dupShingles = withArr
      .select(explode(array_distinct($"sh")).as("g"))
      .groupBy($"g").agg(count(lit(1)).as("df"))
      .filter($"df" >= 2)
      .select($"g")
    // the positional stream probes the (small, aggregated) dup set —
    // a broadcast-able semi-join, so positions never shuffle on g;
    // the only wide exchange of the whole query is the per-doc window,
    // and the final run aggregate reuses its doc_id partitioning.
    val pos = withArr.select($"doc_id", posexplode($"sh").as(Seq("pos", "g")))
    val dupPos = pos.join(dupShingles, Seq("g"), "left_semi")
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    dupPos
      .withColumn("grp", $"pos" - row_number().over(w))
      .groupBy($"doc_id", $"grp")
      .agg(min($"pos").as("run_start"), max($"pos").as("run_end"),
        count(lit(1)).as("n_shingles"))
      .select($"doc_id", $"run_start", $"run_end", $"n_shingles")
  }

  /** Emit all ordered (a<b) pairs from one inverted-index bucket,
    * packed into one long (a<<32 | b) so the pair shuffle moves and
    * compares a single 8-byte key. Doc ids are table ordinals — far
    * below 2³¹ at any scale factor; the kernel's `require` makes a
    * schema/scale change that violates the packing fail loudly instead
    * of silently corrupting pair keys (a ≥2³¹-document corpus would
    * switch this to a struct key). Native codegen expression
    * ([[graft.plans.PackedPairs]]): sorts/dedups a primitive long
    * array in place, no boxed Seq per bucket.
    */
  private def bucketPairs(ids: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.PackedPairs(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(ids)))

  /** The Unicode White_Space set (U+0009–U+000D, U+0020, U+0085,
    * U+00A0, U+1680, U+2000–U+200A, U+2028, U+2029, U+202F, U+205F,
    * U+3000), enumerated explicitly so the DuckDB oracle can state the
    * IDENTICAL class as an RE2 character class — `Character
    * .isWhitespace` would NOT match (it adds the U+001C–1F separators
    * and drops NBSP/figure-space/narrow-NBSP).
    */
  @inline private[graft] def isNormWs(cp: Int): Boolean =
    (cp >= 0x09 && cp <= 0x0d) || cp == 0x20 || cp == 0x85 || cp == 0xa0 ||
      cp == 0x1680 || (cp >= 0x2000 && cp <= 0x200a) || cp == 0x2028 ||
      cp == 0x2029 || cp == 0x202f || cp == 0x205f || cp == 0x3000

  /** One-pass text canonicalization for [[queries dedup_exact_norm]],
    * Unicode-correct for real scraped corpora: NFC-normalize (composed
    * and decomposed accent forms hash identically), then trim +
    * collapse Unicode-whitespace runs ([[isNormWs]]) to one space +
    * per-code-point simple lowercase — the same three decisions DuckDB
    * makes in `nfc_normalize` / the explicit RE2 class / `LOWER`
    * (utf8proc's simple case mapping, which is also what per-code-point
    * `Character.toLowerCase` implements — deliberately NOT Java's
    * full-string special casing, which maps e.g. İ to two code points
    * where utf8proc maps to one). NULL passes through as NULL so a
    * null document lands in the null-fingerprint group on both engines
    * instead of NPE-ing the query. Residual contract caveat: simple
    * case mappings agree up to UNICODE-VERSION alignment of the JVM
    * and DuckDB's utf8proc — scripts whose lowercase mappings were
    * added later (Cherokee in 8.0, Georgian Mtavruli in 11.0) can
    * diverge across mismatched builds; the spec fixtures stay on
    * long-stable mappings.
    */
  val normalizeText: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      if (text == null) null
      else {
        val nfc = java.text.Normalizer.normalize(
          text, java.text.Normalizer.Form.NFC)
        val sb = new java.lang.StringBuilder(nfc.length)
        var i = 0
        var pendingSpace = false
        var started = false
        while (i < nfc.length) {
          val cp = nfc.codePointAt(i)
          if (isNormWs(cp)) { if (started) pendingSpace = true }
          else {
            if (pendingSpace) { sb.append(' '); pendingSpace = false }
            sb.appendCodePoint(Character.toLowerCase(cp))
            started = true
          }
          i += Character.charCount(cp)
        }
        sb.toString
      }
    }

  /** Document-frequency cutoff for candidate generation: a shingle
    * shared by more than this many documents is dropped from the
    * inverted index. A boilerplate 3-gram shared by 10⁵ documents in a
    * web corpus would otherwise emit 5·10⁹ pairs from a single bucket;
    * such shingles contribute negligible Jaccard evidence (every doc
    * has them), so dropping them bounds per-bucket pair emission at
    * cutoff²/2 while leaving near-dup pairs — whose similarity rests on
    * many shared shingles — intact. The cutoff sits far above any
    * document frequency in the test corpora (max DF is 7 at sf0.01 and
    * 25 at sf0.1), so outputs at verification scale are unchanged —
    * and the DuckDB oracle ([[jaccardCte]]) states the SAME DF-bounded
    * semantics, so the two engines agree even on corpora where a
    * shingle's DF crosses the cutoff.
    */
  val MaxShingleDf = 1000

  /** Exact Jaccard pairs via inverted index: group docs per shingle,
    * emit co-occurring pairs per bucket, count shared shingles per
    * pair; |A∪B| = |A|+|B|−|A∩B| with per-doc sizes from a narrow
    * projection. One shuffle on the shingle key + one on the pair key;
    * non-overlapping pairs never materialize, and the shingle relation
    * is computed once (a self-join would compute and shuffle it twice).
    *
    * Built ONCE per (session, corpus, maxDf) like the ANN indexes: the
    * pair relation is consumed by both `dedup_ngram_jaccard` (the pair
    * report) and `dedup_cluster` (the component collapse), and at
    * corpus scale it is a stored intermediate, not something each
    * downstream query re-shuffles the inverted index for. The bench
    * reports the build on its own line (`pairs_build`); consumers
    * measure steady-state cost.
    */
  def jaccardPairs(s: SparkSession, d: String,
      maxDf: Int = MaxShingleDf): DataFrame =
    jaccardPairsCache.getOrBuild(s, s"$maxDf#$d")(
      buildJaccardPairs(s, d, maxDf)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  private val jaccardPairsCache = new SessionCache[DataFrame](df =>
    scala.util.Try(df.unpersist(blocking = false)))

  private def buildJaccardPairs(s: SparkSession, d: String,
      maxDf: Int): DataFrame = {
    import s.implicits._
    val sizes = shingleRelation(s, d)
      .select($"doc_id", size($"sh").as("n_shingles"))
    val rows = shingleRows(s, d)
    // Two-pass DF cull: the count aggregate is map-side combinable
    // (a boilerplate shingle in 10⁸ documents contributes one partial
    // count per task, never a growing buffer), and the semi-join
    // against the 2 ≤ df ≤ maxDf keeplist bounds every collect_list
    // array at maxDf BY CONSTRUCTION — the single-pass form
    // materialized the hot shingle's full doc list in ONE aggregation
    // buffer before its filter could drop it (executor OOM on exactly
    // the boilerplate-heavy corpora the DF bound exists for). Both
    // passes and the post-join collect shuffle on the same shingle
    // key, so the join and the second aggregate reuse the
    // partitioning; output is unchanged (the DF bound was already the
    // stated semantics — see [[MaxShingleDf]]).
    val keep = rows.groupBy($"shingle").agg(count(lit(1)).as("df"))
      .filter($"df" > 1 && $"df" <= maxDf)
      .select($"shingle")
    val inter = rows
      .join(keep, Seq("shingle"), "left_semi")
      .groupBy($"shingle").agg(collect_list($"doc_id").as("ids"))
      .select(explode(bucketPairs($"ids")).as("p"))
      .groupBy($"p").agg(count(lit(1)).as("n_common"))
      .select(shiftrightunsigned($"p", 32).as("id_a"),
        $"p".bitwiseAND(lit(0xffffffffL)).as("id_b"), $"n_common")
    inter
      .join(sizes.select($"doc_id".as("id_a"), $"n_shingles".as("n_a")), "id_a")
      .join(sizes.select($"doc_id".as("id_b"), $"n_shingles".as("n_b")), "id_b")
      .select($"id_a", $"id_b", $"n_a", $"n_b",
        ($"n_common".cast("double") / ($"n_a" + $"n_b" - $"n_common")).as("jaccard"),
        // asymmetric overlap of the SMALLER set — carried on the same
        // build-once relation so dedup_containment costs no new wide
        // work (n_common is already here; least() is row-local)
        ($"n_common".cast("double") / least($"n_a", $"n_b")).as("containment"))
  }

  // MinHash parameters: 64 hashes = 32 bands × 2 rows.
  // P(miss | j=0.6) = (1 - 0.36)^32 ≈ 6e-7 — banding recall is high
  // enough that the LSH output equals the exact-threshold set in
  // practice, which is what lets the oracle state it exactly.
  val NumHashes = 64
  val BandRows = 2
  val NumBands: Int = NumHashes / BandRows

  /** One-pass MinHash signature over the doc's 64-bit shingle hashes
    * ([[shingleHashes]]): for each of the 64 seeds, the min of a
    * per-seed avalanche of the base hash — so the shingle strings are
    * tokenized and hashed exactly once per document and never leave the
    * map task. A document's shingle set always fits in task memory, so
    * this is a narrow map — no explode, no 64-column aggregation, no
    * shuffle. (The grouped min-aggregation form would only be needed if
    * a single record's shingle stream exceeded memory.) Native codegen
    * expression ([[graft.plans.MinhashSig]]): the signature is computed
    * straight off the input ArrayData, no Seq[Long] encoder round trip.
    * Null/empty input yields the sentinel all-MaxValue signature.
    */
  def minhashSig(hashes: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.MinhashSig(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(hashes)))

  /** doc_id → 64-element minhash signature (empty-shingle docs keep a
    * sentinel signature; they can only pair with other empty docs).
    * Reads the build-once [[shingleRelation]] like every other shingle
    * consumer — calling this directly must not re-run the tokenize+
    * hash scan the relation exists to amortize.
    */
  def minhashSignatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    shingleRelation(s, d)
      .select($"doc_id", minhashSig($"sh").as("sig"))
  }

  /** LSH candidate pairs: hash each band of the signature to a bucket,
    * self-join on (band, bucket). Returns distinct (id_a < id_b) pairs.
    *
    * Documents with no shingles (<3 tokens) are excluded BEFORE banding:
    * their sentinel all-Long.MaxValue signatures would otherwise collide
    * with each other in every band — k empty docs generating O(k²)
    * candidate pairs per band at scale — and they can never reach the
    * Jaccard threshold anyway (the exact path never emits them either,
    * since they produce no inverted-index rows).
    */
  def lshCandidates(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // <3 tokens ⇔ zero 3-gram shingles; the filter reads the persisted
    // shingle relation, so the tokenize kernel is not re-evaluated.
    val sig = shingleRelation(s, d)
      .filter(size($"sh") >= 1)
      .select($"doc_id", minhashSig($"sh").as("sig"))
    val buckets = bandBucketsOf(sig)
    buckets.as("a")
      .join(buckets.as("b"),
        $"a.band" === $"b.band" && $"a.bucket" === $"b.bucket" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
      .distinct()
  }

  /** (doc_id, band, bucket) rows from a (doc_id, sig) relation — the
    * banding step factored out of [[lshCandidates]] so the self-join
    * path and the stored incremental index write/probe share one
    * bucket definition (a band-hash change cannot fork them).
    */
  private def bandBucketsOf(sig: DataFrame): DataFrame = {
    import sig.sparkSession.implicits._
    val bands = array((0 until NumBands).map { b =>
      val cols = (0 until BandRows).map(r => element_at($"sig", b * BandRows + r + 1))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bucket"))
    }: _*)
    sig.select($"doc_id", explode(bands).as("bb"))
      .select($"doc_id", $"bb.band", $"bb.bucket")
  }

  /** Every [[IncrementalMod]]'th document is "the new batch" for the
    * incremental near-dup query — the declared split convention (the
    * QueryStride shape: deterministic, corpus-independent).
    */
  val IncrementalMod = 10L

  /** Bucket-pair cap for the incremental probe's pushed stored-index
    * filter (the [[Similarity.LshProbePushdownCap]] convention).
    */
  val MinhashPushdownCap = 65536

  /** Write the HISTORICAL minhash index — the snapshot half of the
    * incremental near-dedup lifecycle a 100 TB corpus runs nightly:
    * the tokenize-once shingle relation (verify side) plus the band-
    * bucket relation, band-partitioned and bucket-sorted so a probe's
    * pushed (band, bucket IN …) filter prunes directories and row
    * groups instead of scanning the corpus-sized index.
    */
  def writeMinhashIndex(s: SparkSession, d: String, outDir: String,
      pred: Column): Unit = {
    import s.implicits._
    val hist = shingleRelation(s, d).filter(pred)
    hist.select($"doc_id", $"sh")
      .write.mode("overwrite").parquet(s"$outDir/shingles")
    val sig = hist.filter(size($"sh") >= 1)
      .select($"doc_id", minhashSig($"sh").as("sig"))
    // one exchange keyed by the partition column → one file per band
    // directory here, tasks-per-band at deployment scale (the
    // writeIvfIndex note)
    // sort leads with the partition column (the writeLshIndex lesson:
    // sorting by bucket alone makes the dynamic-partition writer
    // insert its OWN sort on band over the stream, re-sorting and — if
    // it spills — interleaving the bucket order the row-group pruning
    // depends on)
    bandBucketsOf(sig)
      .repartition($"band")
      .sortWithinPartitions($"band", $"bucket")
      .write.mode("overwrite").partitionBy("band")
      .parquet(s"$outDir/bands")
  }

  /** Append a batch's shingles + band buckets to a STORED minhash
    * index — the rolling-ingest half of the incremental lifecycle:
    * after a batch probes ([[incrementalMinhashPairs]]) it is appended
    * so the NEXT batch sees it as historical, and no batch is ever
    * compared against less than the full ingested past. Bands append
    * as one bucket-sorted file per touched band directory (per-file
    * row-group pruning preserved, the appendToLshIndex convention);
    * shingle hashing and banding reuse the exact build kernels, so an
    * appended doc buckets exactly as a full rebuild would place it.
    * Single-writer, disjoint ids; periodic rewrite is the defrag path.
    */
  def appendToMinhashIndex(s: SparkSession, d: String, indexDir: String,
      pred: Column): Unit = {
    import s.implicits._
    val batch = shingleRelation(s, d).filter(pred)
    batch.select($"doc_id", $"sh")
      .write.mode("append").parquet(s"$indexDir/shingles")
    val sig = batch.filter(size($"sh") >= 1)
      .select($"doc_id", minhashSig($"sh").as("sig"))
    bandBucketsOf(sig)
      .repartition($"band")
      .sortWithinPartitions($"band", $"bucket")
      .write.mode("append").partitionBy("band")
      .parquet(s"$indexDir/bands")
  }

  /** Incremental near-dup: the NEW batch probed against a STORED
    * historical index — the production shape where a nightly ingest
    * pays new×old (and a separate within-batch pass, the ordinary
    * dedup_minhash_lsh over the batch) instead of re-deduping the
    * whole corpus. Only the batch is tokenized/signed; the stored
    * band relation is read under a pushed bucket filter when the
    * batch's bucket set fits [[MinhashPushdownCap]] (directory-pruned
    * by band, row-group-pruned by the sorted bucket), degrading to
    * the ordinary distributed equi-join above it (still
    * candidates-sized work — only the scan pruning is lost; the
    * bucket-chunked union of the LSH stored probe is the proven next
    * step if a deployment's batches outgrow the cap). Verification
    * joins the batch's session shingles with the stored verify-side
    * arrays over candidates only. Same pair contract as
    * dedup_minhash_lsh restricted to one-new-one-old, (new_id,
    * old_id) oriented.
    */
  def incrementalMinhashPairs(s: SparkSession, d: String,
      indexDir: String, pushdownCap: Int = MinhashPushdownCap,
      batchPred: Column = col("doc_id") % IncrementalMod === 0): DataFrame = {
    import s.implicits._
    val newSh = shingleRelation(s, d).filter(batchPred)
    val newSig = newSh.filter(size($"sh") >= 1)
      .select($"doc_id", minhashSig($"sh").as("sig"))
    // pin the batch's band relation once: it feeds the pushdown
    // collect AND the candidate join, and each unpinned reference
    // re-ran the minhash signature kernel over the batch (the
    // concurrencyFromStored discipline, r19)
    val newBands = bandBucketsOf(newSig)
      .select($"doc_id".as("new_id"), $"band", $"bucket")
      .localCheckpoint(true)
    // partition-column type pinned LONG→INT-free via explicit schema
    // (the readIvfIndex note: inferred dir values defeat pruning)
    val bandsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("band",
        org.apache.spark.sql.types.IntegerType)))
    val stored = s.read.schema(bandsSchema).parquet(s"$indexDir/bands")
      .select($"doc_id".as("old_id"), $"band", $"bucket")
    val probePairs = newBands.select($"band", $"bucket").distinct()
      .limit(pushdownCap + 1).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val oldBands =
      if (probePairs.length > pushdownCap) stored
      else if (probePairs.isEmpty) stored.filter(lit(false))
      else stored.filter(probePairs.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (b, ps) =>
          col("band") === b &&
            col("bucket").isin(ps.map(p => java.lang.Long.valueOf(p._2)).toIndexedSeq: _*)
        }.reduce(_ || _))
    val cands = newBands.join(oldBands, Seq("band", "bucket"))
      .select($"new_id", $"old_id").distinct()
    val oldSh = s.read.parquet(s"$indexDir/shingles")
    val verified = cands
      .join(newSh.select($"doc_id".as("new_id"), $"sh".as("sh_a")), "new_id")
      .join(oldSh.select($"doc_id".as("old_id"), $"sh".as("sh_b")), "old_id")
      .withColumn("n_common", size(array_intersect($"sh_a", $"sh_b")))
      .withColumn("jaccard", $"n_common".cast("double") /
        (size($"sh_a") + size($"sh_b") - $"n_common"))
    verified
      .filter(round($"jaccard", 6) >= JaccardThreshold)
      .select($"new_id", $"old_id", round($"jaccard", 6).as("jaccard"))
  }

  /** 64-bit SimHash as a scalar function: one pass over the token
    * array per document (a document's tokens always fit in task
    * memory, so there is nothing to distribute below the row).
    * Permutation-invariant by construction: bit votes are an
    * unordered sum.
    */
  val simhashUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (toks: Seq[String]) =>
      val votes = new Array[Int](64)
      Option(toks).getOrElse(Seq.empty).foreach { t =>
        val h = fnv1a(t) // the shared base hash
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      var fp = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
      fp
    }

  /** Grouped-aggregation SimHash (library form): per bit, sign of
    * Σ(±1) across exploded token hashes with map-side combine — the
    * shape to use if per-record token streams ever exceed task memory.
    */
  def simhash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tok = Tables.documents(s, d)
      .select($"doc_id", explode(TextAnalysis.tokens($"text")).as("tok"))
      .select($"doc_id", xxhash64($"tok").as("h"))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftright($"h", i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i"))
    val sums = tok.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64).map(i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    sums.select($"doc_id", fp.as("simhash"))
  }

  /** Cosine similarity between two float-array columns, computed in
    * double precision with left-to-right accumulation (matches the
    * oracle's arithmetic). Prefer the precomputed-norm form
    * (`VectorFunctions.cosineFrom`) inside pair joins.
    */
  def cosine(a: Column, b: Column): Column = {
    import graft.functions.VectorFunctions._
    cosineFrom(dot(a, b), norm(a), norm(b))
  }

  val JaccardThreshold = 0.6
  val CosineThreshold = 0.45

  /** Containment threshold for dedup_containment: the fraction of the
    * SMALLER document's shingle set that the pair shares. 0.8 is the
    * "one doc is essentially inside the other" operating point —
    * pairs Jaccard misses whenever the carrier is much larger.
    */
  val ContainmentThreshold = 0.8

  /** Lines-per-document bound for dedup_lines' packed keeper key
    * (doc_id·cap + pos): 2²¹ lines/doc leaves 2⁴² doc ids in 63 bits.
    */
  val LinePosCap = 1L << 21

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: one representative (min doc_id) per content hash.
    // Generalizes the reference's tracking-table dedup to a single
    // shuffle-on-hash aggregation.
    "dedup_exact" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .groupBy(md5(to_binary($"text", lit("utf-8"))).as("content_fp"))
        .agg(min($"doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
    },

    // Normalization-aware exact dedup: lowercase + collapse runs of
    // whitespace + trim before hashing. Case and whitespace variants
    // are the most common "exact" duplicates in scraped corpora —
    // byte-hash dedup misses them, near-dup machinery is overkill for
    // them. Same one-shuffle shape as dedup_exact; the normalizer is a
    // row-local single-pass kernel (NOTES perf lesson 1: the
    // regexp_replace form measured 3× the whole dedup_exact query at
    // sf0.1 — a JVM regex over every byte of the corpus).
    "dedup_exact_norm" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .groupBy(md5(to_binary(normalizeText($"text"), lit("utf-8")))
          .as("norm_fp"))
        .agg(min($"doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
    },

    // The deduplicated corpus itself: one surviving row per content
    // hash (lowest doc_id wins) — what downstream training reads.
    // Keeper selection is a partial-aggregable groupBy-min (skew-proof:
    // a pathological corpus that is ONE document duplicated n times
    // collapses map-side), then a semi-join on the unique doc_id
    // fetches the keeper's row — never a row_number window over the
    // content hash, which would funnel the degenerate dup-group
    // through a single task.
    "dedup_keeplist" -> { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      val keepers = docs
        .groupBy(md5(to_binary($"text", lit("utf-8"))).as("fp"))
        .agg(min($"doc_id").as("doc_id"))
        .select($"doc_id")
      docs.join(keepers, Seq("doc_id"), "left_semi")
        .select($"doc_id", $"source", $"n_chars")
    },

    // The exact-Jaccard pair relation build, benched on its own line
    // (runs first with the other *_build queries) so the two consumers
    // below report steady-state cost — the build-once contract.
    "pairs_build" -> { (s, d) =>
      import s.implicits._
      jaccardPairs(s, d)
        .select($"id_a", $"id_b", round($"jaccard", 6).as("jaccard"))
    },

    // The bounded-peak-disk sliced build round trip: K keyspace
    // passes write partial pair counts, one fold lands the stored
    // relation, a read-back serves it — byte-identical to pairs_build
    // (shared oracle), with peak transient disk ~1/K of the
    // monolithic build's (the sf100 single-box diagnosis).
    "pairs_build_sliced" -> { (s, d) =>
      import s.implicits._
      val dir = graft.operators.Similarity.storedQueryDir("pairsliced", d)
      // pass count derives from the input listing (slicedPasses): 2 at
      // bench scale, the measured 4 at the sf100 fixture — identical
      // output at any count (SlicedPairsSpec pins cross-pass folding)
      writeJaccardPairsSliced(s, d, dir)
      readJaccardPairs(s, dir)
        .select($"id_a", $"id_b", round($"jaccard", 6).as("jaccard"))
    },

    // Near-dup by exact word-3-gram Jaccard ≥ 0.6 via inverted index.
    "dedup_ngram_jaccard" -> { (s, d) =>
      import s.implicits._
      jaccardPairs(s, d)
        .filter(round($"jaccard", 6) >= JaccardThreshold)
        .select($"id_a", $"id_b", round($"jaccard", 6).as("jaccard"))
    },

    // Asymmetric containment dedup — the quote-inclusion / boilerplate-
    // envelope case Jaccard structurally misses: a short document
    // pasted inside a much longer one has j = |small|/|big| → 0 no
    // matter how completely it is contained, but containment
    // |A∩B| / min(|A|,|B|) → 1 (Broder'97 distinguishes resemblance
    // from containment for exactly this). Rides the SAME build-once
    // DF-bounded pair relation as the Jaccard family — n_common is
    // already on it, so this is a row-local rescale + filter, no new
    // wide work at any corpus size. contained_id names the smaller
    // shingle set (ties → id_a, restated in the oracle).
    "dedup_containment" -> { (s, d) =>
      import s.implicits._
      jaccardPairs(s, d)
        .filter(round($"containment", 6) >= ContainmentThreshold)
        .select($"id_a", $"id_b",
          when($"n_a" <= $"n_b", $"id_a").otherwise($"id_b")
            .as("contained_id"),
          round($"containment", 6).as("containment"),
          round($"jaccard", 6).as("jaccard"))
    },

    // Fuzzy benchmark decontamination — the NEAR-duplicate form of
    // txt_decontaminate (the dedup-based decontamination of Lee et
    // al.): a TRAINING document is contaminated when it is a
    // near-duplicate (n-gram Jaccard ≥ JaccardThreshold) of any
    // document in the held-out eval split (the same deterministic
    // md5-prefix split rule txt_decontaminate uses — shared
    // splitPrefix, so the splits cannot drift). Rides the build-once
    // verified pair relation: a cross-split near-dup IS a verified
    // pair whose sides fall on opposite sides of the split, so the
    // operator is one narrow classify pass over pairs the corpus
    // already paid for, plus a per-doc tally — no new wide work at
    // any corpus size.
    "txt_decontaminate_fuzzy" -> { (s, d) =>
      import s.implicits._
      val evalSide = (c: Column) =>
        TextAnalysis.splitPrefix(c) < TextAnalysis.EvalSplitThreshold
      queries("dedup_ngram_jaccard")(s, d)
        .withColumn("a_eval", evalSide($"id_a"))
        .withColumn("b_eval", evalSide($"id_b"))
        .filter($"a_eval" =!= $"b_eval")
        .select(when($"a_eval", $"id_b").otherwise($"id_a").as("doc_id"),
          $"jaccard")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_eval_neardups"),
          max($"jaccard").as("max_jaccard"))
    },

    // The duplication-profile report a curation run publishes — the
    // dedup family's capstone (the pipe_data_audit convention): ONE
    // union of independent 1-row aggregates over the family's
    // session-cached relations, so the dashboard costs aggregates,
    // not rebuilds — exact-dup doc count, near-dup and containment
    // pair counts off the build-once pair relation, CDC duplicated-
    // chunk share, duplicated-span count. The numbers an operator
    // reads before choosing which dedup passes to run at what
    // thresholds. (metric, value) rows; counts ride as exact doubles
    // (≪ 2⁵³), the share rounds like its source query.
    "pipe_dedup_audit" -> { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      def leg(name: String, v: DataFrame): DataFrame =
        v.select(lit(name).as("metric"), $"value")
      leg("docs", docs.agg(count(lit(1)).cast("double").as("value")))
        .union(leg("exact_dup_docs", docs.agg(
          (count(lit(1)) - countDistinct(md5($"text")))
            .cast("double").as("value"))))
        .union(leg("neardup_pairs", queries("dedup_ngram_jaccard")(s, d)
          .agg(count(lit(1)).cast("double").as("value"))))
        .union(leg("containment_pairs", queries("dedup_containment")(s, d)
          .agg(count(lit(1)).cast("double").as("value"))))
        .union(leg("cdc_dup_chunk_share", queries("dedup_cdc")(s, d)
          .agg(round(sum($"dup_chunks").cast("double") /
            sum($"n_chunks"), 6).as("value"))))
        .union(leg("dup_spans", queries("dedup_substring")(s, d)
          .agg(count(lit(1)).cast("double").as("value"))))
    },

    // ExactSubstr-style duplicated-span detection (the removal
    // counterpart of txt_dup_mass's measurement; Lee et al. ACL'22
    // "Deduplicating Training Data Makes Language Models Better"): a
    // token span is duplicated when every 3-gram shingle in it occurs
    // in at least one OTHER document; maximal such spans are reported
    // as runs of consecutive duplicated shingle positions
    // (gaps-and-islands over the positional shingle stream). A run
    // [run_start, run_end] covers tokens run_start..run_end+2
    // (0-based). Cross-document spans only — same-document repeats are
    // txt_repetition's domain. Scale shape: the positional stream is
    // narrow (8-byte hash + int pos); df needs one shuffle on the
    // shingle key, the run grouping one shuffle on doc_id — no pair
    // join at all, so this is the cheapest member of the family.
    "dedup_substring" -> ((s, d) => duplicatedSpans(s, d)),

    // Content-defined-chunk dedup mass — dedup_substring's character-
    // level, edit-resilient sibling (rsync/LBFS boundaries, the
    // FastCDC deployment shape): each document splits at rolling-hash
    // cut points ([[cdcChunks]]), and a chunk is duplicated when its
    // content occurs in ≥2 DISTINCT documents — same-doc repeats are
    // txt_repetition's domain, the dedup_substring convention. Per
    // doc: chunk count, duplicated-chunk count, duplicated code-point
    // mass — the numbers a curation pipeline thresholds to route docs
    // into "drop", "trim shared boilerplate", or "keep". Scale shape:
    // chunking is row-local and linear in bytes; the df aggregate
    // collapses row-locally distinct hashes map-side on an 8-byte key
    // (the dedup_substring discipline); the positional probe joins the
    // df≥2 set on the hash key — both sides already narrow — and the
    // final per-doc rollup is one doc_id exchange. No pair join, no
    // text on any shuffle.
    "dedup_cdc" -> { (s, d) =>
      import s.implicits._
      val rel = cdcRelation(s, d)
      val dup = rel
        .select(explode(array_distinct(expr("transform(ch, x -> x._1)")))
          .as("h"))
        .groupBy($"h").agg(count(lit(1)).as("df"))
        .filter($"df" >= 2)
        .select($"h", lit(1).as("isdup"))
      val pos = rel
        .select($"doc_id", explode($"ch").as("c"))
        .select($"doc_id", $"c._1".as("h"), $"c._2".as("l"))
      val per = pos.join(dup, Seq("h"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when($"isdup" === 1, 1L).otherwise(0L)).as("dup_chunks"),
          sum(when($"isdup" === 1, $"l".cast("long")).otherwise(0L))
            .as("dup_chars"))
      Tables.documents(s, d).select($"doc_id")
        .join(per, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"n_chunks", lit(0L)).as("n_chunks"),
          coalesce($"dup_chunks", lit(0L)).as("dup_chunks"),
          coalesce($"dup_chars", lit(0L)).as("dup_chars"))
    },

    // C4-style line-level dedup (Raffel et al. 2020 §2.2: "we
    // discarded all but one of any three-sentence span occurring more
    // than once", here at the line granularity the public C4 code
    // actually dedups on): a non-blank line occurring anywhere else in
    // the corpus survives only at its first occurrence (lowest
    // (doc_id, pos)); blank lines are document structure and always
    // survive; documents are reassembled from surviving lines in
    // original order. Scale shape — the part worth getting right at
    // 100 TB: line TEXT never rides ANY shuffle. Lines collapse to
    // 8-byte xxhash64 keys at the scan (the shingle-hash convention —
    // the DuckDB oracle elects on line STRINGS, so the two agree
    // modulo a 2⁻⁶⁴ collision, as documented for the jaccard family),
    // the keeper election's groupBy-min partially aggregates map-side
    // (a boilerplate line duplicated a billion times collapses to one
    // row per input split BEFORE the exchange — the skew lives exactly
    // there), the verify join moves only (hash, doc_id, pos) rows, the
    // surviving positions collapse to one array row per document, and
    // the full text moves through exactly ONE doc_id-keyed broadcast-
    // or-shuffle join, after which the rebuild (split → filter by
    // position → rejoin) is entirely row-local. Packed keeper key =
    // doc_id·2²¹ + pos bounds documents at 2²¹ lines (a 100 TB corpus
    // with longer docs raises [[LinePosCap]] — the key stays in the
    // 63-bit budget up to 2⁴² docs).
    "dedup_lines" -> { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      val nb = docs
        .select($"doc_id", posexplode(split($"text", "\n", -1)).as(Seq("pos", "line")))
        .filter(trim($"line") =!= "")
        .select($"doc_id", $"pos", xxhash64($"line").as("lh"))
      val keepers = nb.groupBy($"lh")
        .agg(min($"doc_id" * lit(LinePosCap) + $"pos").as("keep_key"))
      val keptPos = nb.join(keepers, Seq("lh"))
        .filter($"doc_id" * lit(LinePosCap) + $"pos" === $"keep_key")
        .groupBy($"doc_id").agg(collect_list($"pos").as("kept"))
      val ls = split($"text", "\n", -1)
      // index lambda i is 0-based; a line survives if blank or elected
      val keptLines = filter(ls, (x, i) =>
        trim(x) === "" || array_contains($"kept", i))
      docs.join(keptPos, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce(size(ls), lit(0)).cast("long").as("n_lines"),
          coalesce(size(keptLines), lit(0)).cast("long").as("n_kept"),
          when($"text".isNull, lit(null).cast("string"))
            .otherwise(concat_ws("\n", keptLines)).as("text_dedup"))
    },

    // MinHash+LSH: banding proposes candidates, exact Jaccard verifies
    // — but only over the candidate pairs (work ∝ Σ bucket collisions,
    // not the full inverted index). Same output contract as
    // dedup_ngram_jaccard: the LSH path must find the same pairs.
    "dedup_minhash_lsh" -> { (s, d) =>
      import s.implicits._
      // verify on the 8-byte hashed-shingle arrays, not the strings —
      // the candidate verify join is the widest shuffle of this query;
      // arrays come from the build-once shingle relation
      val docSh = shingleRelation(s, d)
      val verified = lshCandidates(s, d)
        .join(docSh.select($"doc_id".as("id_a"), $"sh".as("sh_a")), "id_a")
        .join(docSh.select($"doc_id".as("id_b"), $"sh".as("sh_b")), "id_b")
        .withColumn("n_common", size(array_intersect($"sh_a", $"sh_b")))
        .withColumn("jaccard", $"n_common".cast("double") /
          (size($"sh_a") + size($"sh_b") - $"n_common"))
      verified
        .filter(round($"jaccard", 6) >= JaccardThreshold)
        .select($"id_a", $"id_b", round($"jaccard", 6).as("jaccard"))
    },

    // SimHash fingerprints — fully oracled: FNV-1a and the bit votes
    // Incremental near-dup: write the historical (doc_id %
    // IncrementalMod ≠ 0) minhash index, probe the new batch against
    // it in the same declared query — the stored-lifecycle round trip
    // (the *_stored convention). new×old pairs only; within-batch
    // pairs are the ordinary dedup_minhash_lsh over the batch.
    "dedup_minhash_incremental" -> { (s, d) =>
      val dir = Similarity.storedQueryDir("mh_incr", d)
      writeMinhashIndex(s, d, dir, col("doc_id") % IncrementalMod =!= 0)
      incrementalMinhashPairs(s, d, dir)
    },

    // The embedding-side incremental form: historical vectors as a
    // stored LSH-layout index, the new batch bucketed at the index's
    // recorded plane count and pushed into the stored scan — new×old
    // cosine pairs only.
    "dedup_embedding_incremental" -> { (s, d) =>
      val dir = Similarity.storedQueryDir("emb_incr", d)
      writeEmbIncrIndex(s, d, dir)
      incrementalEmbeddingPairs(s, d, dir)
    },

    // The sub-document incremental form: historical CDC chunk hashes
    // as a stored bucket-partitioned index, the new batch's chunks
    // probed for duplicated mass against the ingested past — the
    // nightly shape where neither historical text nor historical
    // chunking is ever recomputed.
    "dedup_cdc_incremental" -> { (s, d) =>
      incrementalCdcMass(s, d, historicalCdcIndexDir(s, d))
    },

    // The takedown round trip (the sim_ann_*_purged convention on the
    // sub-document side): build the historical index, DELETE a slice
    // of ingested docs (doc_id ≡ PurgeRes mod PurgeMod — negative
    // carrier counts, the multi-TB layout untouched), probe the new
    // batch. Chunks whose only carriers were deleted stop counting as
    // historical mass; chunks shared with surviving docs keep
    // answering — the oracle restates exactly that set difference.
    "dedup_cdc_purged" -> { (s, d) =>
      // snapshot-clone of the session's shared historical index (the
      // build-once attribution convention — cloneIndexDir): this line
      // measures clone + takedown + probe, the deployment cost of a
      // takedown against an EXISTING index, not a second corpus build
      val dir = Similarity.storedQueryDir("cdc_purge", d)
      Similarity.cloneIndexDir(s, historicalCdcIndexDir(s, d), dir)
      deleteFromCdcIndex(s, d, dir,
        col("doc_id") % IncrementalMod =!= 0 &&
          col("doc_id") % Similarity.PurgeMod === Similarity.PurgeRes)
      incrementalCdcMass(s, d, dir)
    },

    // The CDC family's cluster form (every near-dup family collapses
    // to one representative — minhash, embedding, media, phash; this
    // is sub-document sharing's): docs joined by ≥ CdcClusterMinChars
    // of SHARED duplicated chunk mass, components collapsed by the
    // shared CC kernel. Pair generation is the inverted-index shape:
    // DF-bounded chunk buckets (a boilerplate chunk in every doc is
    // skew, not signal — the MaxShingleDf argument), packed 8-byte
    // pair keys, per-pair mass one map-side-combinable exchange.
    "dedup_cdc_cluster" -> { (s, d) =>
      import s.implicits._
      connectedComponents(cdcClusterEdges(s, d)).select($"doc_id", $"rep_id")
    },

    // are restated in DuckDB HUGEINT mod-2⁶⁴ arithmetic (see oracles),
    // so the 64-bit fingerprints are hash-exact across engines.
    "dedup_simhash" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id",
          simhashUdf(TextAnalysis.tokens($"text")).as("simhash"))
        .select($"doc_id", conv($"simhash".cast("string"), 10, 16).as("simhash_hex"))
    },

    // Embedding-cosine near-dup pairs — exact all-pairs semantics as a
    // fully distributed blocked self-join: nothing is ever collected to
    // or broadcast from the driver. Vectors are grouped into fixed-size
    // blocks by id range (ids are dense table ordinals, so `id div B`
    // gives balanced blocks with no count() pre-pass); the block-id
    // pairs (a ≤ b) form a tiny key-only relation, and two equi-joins
    // ship each block's matrix to its pair tasks, where a tight
    // primitive loop emits only near-threshold pairs. Per-task memory
    // is two blocks (~2 MB); work is O(n²) flops spread over B(B+1)/2
    // independent tasks — the intrinsic cost of the EXACT pair set this
    // query declares. The subquadratic scale path is LSH candidate
    // generation + exact verify (`embeddingLshPairs` below), which is
    // necessarily approximate: at this query's θ = arccos(0.45) ≈ 63°,
    // sign-hyperplane collision probability per plane is only ~0.65, so
    // no subquadratic parameterization reaches recall 1.0 — measured on
    // the test corpora, qualifying pairs sit continuously at the
    // threshold (cos 0.45–0.6), so the exact query stays exact.
    "dedup_embedding" -> ((s, d) => exactEmbeddingPairs(s, d, None)),

    // The exact pair baseline restricted to a deterministic id window
    // (all qualifying pairs among vec_id < [[EmbWindowK]]): at bench
    // SFs the window covers the whole corpus, so this IS
    // dedup_embedding; at scale fixtures it pins a fixed-size slice
    // whose DuckDB oracle stays tractable where the full exact
    // oracle's Θ(n²) self-join blows the sweep cap — the
    // scale-correctness gate for the embedding-pair family. The slice
    // is exact, not approximate: a pair qualifies among ids < K iff
    // it qualifies in the full corpus (pairwise cosine depends on
    // nothing else), so the window output equals the full output
    // filtered to the window, and the id filter pushes to the scan so
    // the Spark side costs O(K²) pair work regardless of n.
    "dedup_embedding_window" -> ((s, d) =>
      exactEmbeddingPairs(s, d, Some(EmbWindowK))),

    // The SUBQUADRATIC embedding near-dup — the declared scale path:
    // random-hyperplane LSH candidate generation + exact cosine verify
    // of candidates only ([[embeddingLshPairs]]). Declared at the
    // family threshold so its output is directly comparable with the
    // exact query above (on this corpus the threshold angle is wide,
    // so LSH recall < 1 BY DESIGN — the oracle therefore restates the
    // LSH candidate generation itself from the literal plane tensor,
    // the sim_ann_lsh pattern, making the approximate operator
    // hash-exact); at the real near-dup thresholds it exists for
    // (cos ≥ ~0.85, where true duplicates live) measured recall is 1.0
    // (PipelineOpsSpec "LSH embedding near-dup").
    "dedup_embedding_lsh" -> ((s, d) =>
      embeddingLshPairsIndexed(s, d, CosineThreshold)),

    // The verified embedding-LSH pair relation build, benched on its
    // own `*_build` line (those run first) so BOTH consumers —
    // dedup_embedding_lsh (the pair report) and dedup_embedding_cluster
    // (the component collapse) — report steady-state cost; mirrors
    // pairs_build for the Jaccard family. At corpus scale this is the
    // stored intermediate one job builds and later jobs read.
    "emb_pairs_build" -> ((s, d) =>
      embeddingLshPairsIndexed(s, d, CosineThreshold)),

    // The bounded-peak-disk sliced build round trip on the embedding
    // family (the pairs_build_sliced convention): K LSH-table passes
    // land verified pairs, one fold cross-pass-dedupes into the
    // stored relation, a read-back serves it — same answer as
    // emb_pairs_build (shared oracle), peak transient disk ~1/K of
    // the monolithic build that died at the sf100 fixture.
    "emb_pairs_build_sliced" -> { (s, d) =>
      import s.implicits._
      val dir = graft.operators.Similarity.storedQueryDir("embsliced", d)
      // derived pass count (slicedPasses): 2 at bench scale, the
      // measured 4 at the sf100 fixture — output identical at any count
      writeEmbPairsSliced(s, d, dir)
      readEmbPairs(s, dir).select($"id_a", $"id_b", $"cos_sim")
    },

    // The embedding family's cluster collapse — pairs alone don't
    // dedup a corpus (chains must merge): connected components over
    // the LSH near-dup pair graph, one representative (min vec_id)
    // per component. Same hybrid CC engine as dedup_cluster (bounded
    // driver union-find / fused propagation / large-star small-star);
    // the oracle states the components as a recursive transitive
    // closure over the SAME plane-literal LSH pair semantics.
    "dedup_embedding_cluster" -> { (s, d) =>
      import s.implicits._
      connectedComponents(embeddingLshPairsIndexed(s, d, CosineThreshold))
        .select($"doc_id".as("vec_id"), $"rep_id")
    },

    // SemDeDup-style semantic dedup: cluster by the build-once IVF
    // coarse quantizer (Similarity.ivfIndex — the same trained cells
    // the ANN path amortizes), then within each cell drop every vector
    // that has a lower-id cell-mate at cosine ≥ threshold; survivors
    // are the semantic representatives. Hash-oracled via the trained-
    // centroid literal trick (dynamicOracles below); the cluster-
    // collapse and no-kept-near-pair invariants are additionally
    // spec-pinned on the clustered fixture. Scale shape: one shuffle
    // keyed by cell; pair work is Σ m_cell² — n^1.5 for balanced
    // √n-cells — never the corpus n², and each join row is a narrow
    // (id, cos) after projection.
    "dedup_semantic" -> ((s, d) => semanticDedup(s, d, SemanticThreshold)),

    // ...and its stored/incremental lifecycle (the production shape):
    // freeze the historical-trained cells as a stored index, assign
    // the nightly batch to the FROZEN cells, keep batch vectors with
    // no surviving stored cell-mate within the threshold. Oracled via
    // the slice-trained centroid literals (dynamicOracles below).
    "dedup_semantic_incremental" -> { (s, d) =>
      incrementalSemanticKept(s, d, storedSemanticIndexDir(s, d),
        SemanticThreshold)
    },

    // the takedown round trip: tombstone a slice of the stored
    // historical vectors, re-probe — an erased vector stops
    // SUPPRESSING new content immediately (the batch vec it alone
    // suppressed joins the kept set)
    "dedup_semantic_purged" -> { (s, d) =>
      import s.implicits._
      // snapshot-clone of the shared stored semantic index — the
      // takedown line measures clone + delete + probe (build-once
      // attribution; the clone refuses a tombstoned source)
      val dir = Similarity.storedQueryDir("sem_purge", d)
      Similarity.cloneIndexDir(s, storedSemanticIndexDir(s, d), dir,
        Seq("_graft_tombstones"))
      Similarity.deleteFromIndex(s, dir,
        Tables.embeddings(s, d).select($"vec_id")
          .filter($"vec_id" % IncrementalMod =!= 0 &&
            $"vec_id" % Similarity.PurgeMod === Similarity.PurgeRes))
      incrementalSemanticKept(s, d, dir, SemanticThreshold)
    },

    // Near-dup CLUSTERING: pair detection alone doesn't dedup a corpus
    // — chains (a~b, b~c, a≁c) must collapse to one representative per
    // connected component. Min-label propagation over the exact-Jaccard
    // pair graph; the oracle states the same components as a recursive
    // transitive closure. Output: every doc in a dup component with its
    // component representative (min doc_id).
    "dedup_cluster" -> { (s, d) =>
      connectedComponents(queries("dedup_ngram_jaccard")(s, d))
    },

    // The STORED-path form of dedup_cluster, declared so the one-job-
    // builds / later-job-collapses lifecycle sits under the driver's
    // oracle gate and the bench, not just IndexStoreSpec: write the
    // verified pair relation shard-partitioned, read it back through
    // the explicit-schema stored reader, collapse components. Same
    // answer as dedup_cluster by construction (parquet DOUBLE
    // round-trips exactly; round-then-threshold applied on the read
    // side), so it shares that oracle verbatim.
    "dedup_cluster_stored" -> { (s, d) =>
      val dir = storedPairsDir(d)
      writeJaccardPairs(s, d, dir)
      clusterStored(s, dir)
    },

    // The pair-relation takedown round trip (the *_purged convention
    // on the stored pair layout every collapse/serve consumer reads):
    // write the pairs, tombstone a doc slice (a pair dies when EITHER
    // endpoint is deleted — it is evidence about two documents),
    // collapse — deleted docs stop clustering and components they
    // bridged SPLIT, which is what the closure-over-surviving-edges
    // oracle states. PairLifecycle spec pins the bridge split and
    // compaction invisibility.
    "dedup_cluster_purged" -> { (s, d) =>
      import s.implicits._
      val dir = storedPairsDir(d) + "_purge"
      writeJaccardPairs(s, d, dir)
      deleteFromPairsDir(s, dir, Tables.documents(s, d).select($"doc_id")
        .filter($"doc_id" % Similarity.PurgeMod === Similarity.PurgeRes))
      clusterStored(s, dir)
    },

    // The embedding-side counterpart of dedup_cluster_stored: write
    // the verified LSH pair relation shard-partitioned, read it back
    // through the explicit-schema stored reader, collapse components —
    // the lifecycle a 100 TB near-dup job actually runs (pairs built
    // once, collapsed by later jobs). Same answer as
    // dedup_embedding_cluster by construction, so it shares that
    // oracle verbatim.
    "dedup_embedding_cluster_stored" -> { (s, d) =>
      val dir = storedPairsDir(d) + "_emb"
      // size-adaptive (bit-identical branches): the sliced survival
      // path above the measured sf100 disk wall, monolithic below
      writeEmbPairsAuto(s, d, dir)
      embeddingClusterStored(s, dir)
    })

  /** Id cap for `dedup_embedding_window`: covers every bench-SF corpus
    * in full (sf0.1 has 2000 vectors, sf0.01/sf0.001 have 500) and
    * slices exactly the base copy out of the 10× sf1 fixture — the
    * full oracle's DuckDB cost at sf0.1 is the window oracle's cost at
    * ANY scale.
    */
  val EmbWindowK = 2000L

  /** The exact blocked all-pairs query (`dedup_embedding`), optionally
    * restricted to vec_id < idCap (`dedup_embedding_window`): the id
    * filter lands BEFORE blocking, so a windowed run reads and pairs
    * only the window (a pushed-down scan predicate), never the corpus.
    */
  private def exactEmbeddingPairs(s: SparkSession, d: String,
      idCap: Option[Long]): DataFrame = {
    import s.implicits._
    val base = idCap.foldLeft(Tables.embeddings(s, d))((df, k) =>
      df.filter($"vec_id" < k))
    val e = base
      .select(expr(s"vec_id div $EmbBlockRows").cast("int").as("blk"),
        $"vec_id", $"embedding")
    val blocks = e.groupBy($"blk")
      .agg(collect_list(struct($"vec_id", $"embedding")).as("vs"))
    // key-only (blk_a <= blk_b) pair relation: bytes, not vectors
    val blkIds = blocks.select($"blk")
    val pairIdx = blkIds.select($"blk".as("blk_a"))
      .join(blkIds.select($"blk".as("blk_b")), $"blk_a" <= $"blk_b")
    val joined = pairIdx
      .join(blocks.select($"blk".as("blk_a"), $"vs".as("va")), Seq("blk_a"))
      .join(blocks.select($"blk".as("blk_b"), $"vs".as("vb")), Seq("blk_b"))
      .select($"blk_a", $"blk_b", $"va", $"vb")
      .as[(Int, Int, Seq[(Long, Array[Float])], Seq[(Long, Array[Float])])]
    // emit just under the rounded threshold so ROUND(...,4) >= t
    // filters identically to the oracle at the boundary
    val preFilter = CosineThreshold - 1e-4
    joined.flatMap { case (ba, bb, va, vb) =>
      val a = va.sortBy(_._1).toArray
      val b = if (ba == bb) a else vb.sortBy(_._1).toArray
      val na = a.map { case (_, v) => math.sqrt(dotf(v, v)) }
      val nb = if (ba == bb) na else b.map { case (_, v) => math.sqrt(dotf(v, v)) }
      for {
        i <- a.indices.iterator
        j <- (if (ba == bb) i + 1 else 0) until b.length
        cos = dotf(a(i)._2, b(j)._2) / na(i) / nb(j)
        if cos >= preFilter
      } yield (a(i)._1, b(j)._1, cos)
    }.toDF("id_a", "id_b", "cos")
      .select($"id_a", $"id_b", round($"cos", 4).as("cos_sim"))
      .filter($"cos_sim" >= CosineThreshold)
  }

  /** Deterministic per-corpus location for the declared stored-pair
    * round trip — under the JVM temp dir, keyed by the corpus path so
    * concurrent Verify/Bench runs on different fixtures never collide.
    * The hashCode suffix keeps the key injective where the readable
    * sanitized prefix isn't (`/a/sf0.1` vs `/a/sf0_1` both sanitize to
    * the same text), and the pid suffix keeps two JVMs on the SAME
    * fixture (an overlapping Verify + Bench, which does happen) from
    * racing one directory's overwrite against the other's read — each
    * process writes and reads its own copy. Residue is
    * temp-dir-reclaimed, ≤ a few MB per fixture per process ever run.
    */
  private def storedPairsDir(d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_stored_pairs_" +
      d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      java.lang.Integer.toHexString(d.hashCode) + "_p" +
      ProcessHandle.current().pid()

  /** Iteration cap for [[connectedComponents]]: with pointer jumping
    * the propagation converges in O(log diameter) rounds, so 20 covers
    * any component of diameter ≲ 2²⁰ — far beyond near-dup graphs
    * (dup chains, not million-hop paths). A pathological deeper graph
    * hitting the cap FAILS FAST by default (requireConvergence):
    * coarser-than-final labels are a wrong dedup answer, never a
    * silent one. At web scale swap the simple propagation for
    * alternating large-star/small-star (O(log² n) rounds, same
    * relational shape).
    */
  val MaxCcIterations = 20

  /** Edge cap for the driver union-find fast path of
    * [[connectedComponents]]: collecting up to 2²⁰ 16-byte pairs is a
    * bounded ≤16 MB transfer and microseconds of union-find — the same
    * bounded-driver-work pattern as [[Similarity.DriverTrainFlopsCap]].
    * Near-dup pair graphs are tiny relative to their corpus (pairs
    * survive a 0.6-Jaccard threshold), so the fast path covers them
    * far beyond bench scale; a web-scale dup graph that exceeds the
    * cap runs the distributed propagation unchanged.
    */
  val CcDriverEdgeCap: Long = 1L << 20

  /** Connected components of an (id_a, id_b) pair relation. Small
    * graphs (≤ `maxDriverEdges`, counted on the — usually cached —
    * pair relation) collapse on the driver with min-root union-find:
    * at bench scale the distributed loop's cost was per-round fixed
    * overhead on a ~50-edge graph. Larger graphs run min-label
    * propagation: each round every node takes the min label among
    * itself, its neighbors, and its label's label (pointer jumping) —
    * one equi-join + one groupBy-min per round, all shuffles keyed by
    * node id. There the driver loop only CONVERGES the relational
    * rounds (each round's label sum is the fixpoint test); no edge or
    * label data ever reaches the driver. Both paths return the same
    * (doc_id, rep_id = min id in component) for every node in the
    * graph — the fixpoint of min propagation is exactly the union-find
    * min root.
    */
  def connectedComponents(pairs: DataFrame,
      maxDriverEdges: Long = CcDriverEdgeCap,
      maxIter: Int = MaxCcIterations,
      requireConvergence: Boolean = true): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    // gate and fetch in ONE action: limit(cap+1) stops scanning at the
    // cap instead of counting the whole relation, and a below-cap graph
    // arrives already collected — a count()-then-collect() gate would
    // materialize an uncached pair relation twice, and above-cap graphs
    // would pay a full extra pass just to learn they're big
    val probe: Option[Array[(Long, Long)]] =
      if (maxDriverEdges > 0 && maxDriverEdges < Int.MaxValue) {
        val rows = pairs.select($"id_a".cast("long"), $"id_b".cast("long"))
          .limit(maxDriverEdges.toInt + 1).as[(Long, Long)].collect()
        if (rows.length <= maxDriverEdges) Some(rows) else None
      } else None
    if (probe.isDefined) {
      val es = probe.get
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x // path compression
        while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        // union-by-min: the smaller root stays root, so every root is
        // its component's min id — the propagation fixpoint's labels
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
      val labels = parent.keys.toSeq.sorted.map(id => (id, find(id)))
      return s.createDataset(labels).toDF("doc_id", "rep_id")
    }
    // localCheckpoint (not persist): a cached-but-uncheckpointed loop
    // re-ANALYZES the full upstream lineage (the whole near-dup pair
    // plan) on every round's action — cache substitution happens after
    // optimization, so Catalyst costs grow with the input plan and the
    // round count; measured 2.5 s/round vs 0.8 s/round truncated, on
    // identical data. Truncation trades re-computability for it (on
    // executor loss the iteration restarts), the standard iterative-
    // graph trade; use reliable checkpointing on a long cluster run.
    val edges = pairs.select($"id_a".as("u"), $"id_b".as("v"))
      .union(pairs.select($"id_b".as("u"), $"id_a".as("v")))
      .localCheckpoint()
    var labels = edges.select($"u".as("id"), $"u".as("rep")).distinct()
      .localCheckpoint()
    // fixpoint test without a compare join: propagation labels only
    // ever DECREASE, so the exact decimal label sum strictly decreases
    // until the fixpoint — one scalar aggregate over the round's
    // already-computed labels instead of a two-shuffle diff join
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum($"rep".cast("decimal(38,0)")).as("s")).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // min over: own label, neighbors' labels, AND the label's own
      // label (pointer jumping) — the jump halves remaining path
      // lengths each round, so convergence is O(log diameter) rounds
      // instead of O(diameter). Neighbor-min and pointer-jump are the
      // SAME lookup — label(v) for each arc (u, v) — so one join over
      // the edge set augmented with this round's (id → rep) arcs
      // covers both: arc (u, v) yields the neighbor min, arc
      // (id, rep) yields label(rep), i.e. the jump. One exchange of
      // `labels` per round instead of two (it was previously shuffled
      // on id for the neighbor join and again on rep for the jump).
      val aug = edges.union(labels.select($"id".as("u"), $"rep".as("v")))
      val next = aug.join(labels.select($"id".as("v"), $"rep"), Seq("v"))
        .select($"u".as("id"), $"rep")
        .union(labels)
        .groupBy($"id").agg(min($"rep").as("rep"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      iter += 1
    }
    // Coarser-than-final labels are a WRONG dedup answer (components
    // that should merge, didn't) — never return them silently. The
    // declared queries run strict; callers doing exploratory passes on
    // pathological graphs can opt out and get the round-7-era WARN.
    if (!converged) {
      val msg = s"connectedComponents: no fixpoint after $maxIter rounds — " +
        "labels are a valid but possibly coarser-than-final refinement; " +
        "raise maxIter or use largeStarSmallStar (O(log^2 n) rounds)"
      if (requireConvergence) throw new IllegalStateException(msg)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
    }
    labels.select($"id".as("doc_id"), $"rep".as("rep_id"))
  }

  /** Web-scale connected components: alternating large-star /
    * small-star rounds (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14 — the published algorithm for
    * graphs whose components are too large/deep for label
    * propagation). Per round each node attaches neighbors to the
    * minimum of its closed neighborhood — large-star the strictly
    * larger neighbors, small-star the rest — a star step being three
    * node/edge-keyed exchanges (symmetrize-distinct, window-min,
    * output dedup) over the CURRENT edge set. The edge set contracts
    * toward min-rooted stars, so round cost SHRINKS as components
    * collapse, vs [[connectedComponents]]'s propagation whose every
    * round re-joins the full original edge set. Trade: the propagation
    * round is one join + one aggregate (cheaper on the bounded
    * near-dup graphs this library's dedup produces — measured at bench
    * scale); the star rounds' contracting work and O(log² n)-round
    * guarantee win on web-scale general graphs. Same contract as
    * [[connectedComponents]]: (doc_id, rep_id = min id of the
    * component) for every node that appears in `pairs`, including
    * nodes whose only rows are self-pairs — agreement is spec-pinned
    * on chain/cycle/mixed fixtures.
    */
  def largeStarSmallStar(pairs: DataFrame,
      maxIter: Int = MaxCcIterations,
      requireConvergence: Boolean = true): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val byU = org.apache.spark.sql.expressions.Window.partitionBy($"u")
    // one star round: m(u) = min(Γ(u) ∪ {u}) via window-min over the
    // symmetric adjacency; large attaches {v ∈ Γ(u) : v > u} to m(u),
    // small attaches {v ∈ Γ(u) : v ≤ u} and u itself. Output edges are
    // canonical (child, smaller-parent) arcs; self-arcs drop.
    def star(edges: DataFrame, large: Boolean): DataFrame = {
      val sym = edges.union(edges.select($"v".as("u"), $"u".as("v"))).distinct()
      val withMin = sym.select($"u", $"v",
        least(min($"v").over(byU), $"u").as("m"))
      val nbrs = (if (large) withMin.filter($"v" > $"u")
                  else withMin.filter($"v" <= $"u"))
        .select($"v".as("u"), $"m".as("v"))
      val self = // the outer distinct dedups; no inner pass needed
        if (large) nbrs.limit(0)
        else withMin.select($"u", $"m".as("v"))
      nbrs.union(self).filter($"u" =!= $"v").distinct()
    }
    // canonical fingerprint (count + order-free mod-2⁶⁴ wrapping hash
    // sum) detects the fixpoint without a diff join — and it is
    // PIGGYBACKED on the round's own materialization: the eager
    // localCheckpoint is the only action over the star output, so
    // accumulators filled in a pass-through map cost zero extra jobs
    // (previously a separate aggregate job per round: 76 → 60 jobs per
    // call on the 60-node deep-chain fixture; local wall time ~flat —
    // scheduler overhead, not scan cost, dominates there — the win at
    // scale is one fewer full edge-set scan per round). Task retries
    // can double-add a transformation-stage accumulator, so the
    // fingerprint is strictly a cheap FIRST filter: set equality is
    // decided by the TWO-sided exact except() confirm below (two-sided
    // because a retry-corrupted count could otherwise mask a strict
    // subset) — a corrupted fp costs at most an extra round or an
    // extra confirm, never a wrong result.
    def stepFp(e: DataFrame): (DataFrame, (Long, Long)) = {
      val cnt = s.sparkContext.longAccumulator
      val hsum = s.sparkContext.longAccumulator
      val out = star(star(e, large = true), large = false)
        .select($"u", $"v", xxhash64($"u", $"v").as("h"))
        .as[(Long, Long, Long)]
        .map { t => cnt.add(1L); hsum.add(t._3); (t._1, t._2) }
        .toDF("u", "v")
        .localCheckpoint()
      (out, (cnt.value, hsum.value))
    }
    // every endpoint node, captured BEFORE self-pairs are dropped: a
    // node whose only rows are (x, x) has no edges but still owns a
    // singleton component under the connectedComponents contract
    val nodes = pairs.select($"id_a".cast("long").as("n"))
      .union(pairs.select($"id_b".cast("long").as("n"))).distinct()
      .localCheckpoint()
    var edges = pairs
      .select(greatest($"id_a", $"id_b").cast("long").as("u"),
        least($"id_a", $"id_b").cast("long").as("v"))
      .filter($"u" =!= $"v").distinct()
      .localCheckpoint()
    // no initial-fingerprint job: the first compare is round 2 vs
    // round 1 (an input already at fixpoint just spends one extra
    // no-op round)
    var prevFp: Option[(Long, Long)] = None
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val (next, cur) = stepFp(edges)
      // the fingerprint is probabilistic — a hash-sum collision (or a
      // retry-corrupted accumulator) must not stop the loop early with
      // wrong components. Confirm the final round with an exact
      // two-sided set compare, cheap once the edge set has contracted
      // to stars (accumulator counts are NOT trusted here, so subset
      // relationships can't slip through a count coincidence).
      converged = prevFp.contains(cur) &&
        next.except(edges).isEmpty && edges.except(next).isEmpty
      prevFp = Some(cur)
      edges = next
      iter += 1
    }
    // same strict-by-default contract as [[connectedComponents]]: a
    // capped-out star contraction may still hold multi-level trees, so
    // silent best-effort labels would be a wrong dedup answer
    if (!converged) {
      val msg = s"largeStarSmallStar: no fixpoint after $maxIter rounds — " +
        "labels are best-effort (valid but possibly coarser); raise maxIter"
      if (requireConvergence) throw new IllegalStateException(msg)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
    }
    // fixpoint edges are (child, root) stars; every node (roots and
    // edge-less self-pair nodes included) also labels itself. groupBy-
    // min instead of a bare union-distinct so a non-converged cap-out
    // still yields one row per node (best-effort labels).
    edges.select($"u".as("doc_id"), $"v".as("rep_id"))
      .union(nodes.select($"n".as("doc_id"), $"n".as("rep_id")))
      .groupBy($"doc_id").agg(min($"rep_id").as("rep_id"))
  }

  /** Cosine bound for [[semanticDedup]]'s declared query: aligned with
    * [[CosineThreshold]] so the synthetic corpus (whose qualifying
    * pairs live at cos 0.45–0.6) produces a non-trivial kept set.
    * Real-corpus callers pass their own (SemDeDup reports ~0.95 for
    * web text).
    */
  val SemanticThreshold: Double = CosineThreshold

  /** Kept (representative) vec_ids after per-cell semantic dedup. */
  def semanticDedup(s: SparkSession, d: String, threshold: Double): DataFrame = {
    import s.implicits._
    import graft.functions.VectorFunctions
    val asg = Similarity.ivfIndex(s, d).assigned
      .select($"cell", $"vec_id", $"embedding", $"nrm")
    val dropped = asg.as("a")
      .join(asg.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("b.vec_id").as("vec_id"),
        VectorFunctions.cosineFrom(
          VectorFunctions.dot(col("a.embedding"), col("b.embedding")),
          col("a.nrm"), col("b.nrm")).as("cos"))
      .filter(round($"cos", 4) >= threshold)
      .select($"vec_id").distinct()
    Tables.embeddings(s, d).select($"vec_id")
      .join(dropped, Seq("vec_id"), "left_anti")
      .select($"vec_id")
  }

  // ------------------------------------------------------------------
  // SemDeDup's stored/incremental lifecycle (r16 verdict item 3) —
  // the production shape: the coarse quantizer is trained ONCE on the
  // historical corpus and FROZEN as a stored IVF index; each nightly
  // batch is assigned to those frozen cells and deduped against the
  // STORED cell members (new×old only — within-batch duplication is
  // the ordinary dedup_semantic over the batch, the incremental
  // convention), and takedown is the shared ANN tombstone mechanism:
  // a deleted historical vector stops suppressing new content from
  // the next probe. Re-clustering the corpus per run (what the
  // session-cached dedup_semantic models) is the BUILD, not the
  // steady state.
  // ------------------------------------------------------------------

  /** The declared historical slice the frozen quantizer trains on. */
  val SemanticHistoricalPred: Column = col("vec_id") % IncrementalMod =!= 0

  /** Freeze the historical-trained IVF cells as a stored index — the
    * [[Similarity.writeIvfIndex]] layout (cell-partitioned
    * assignments + bounded trained state), trained over the slice
    * only: at deployment the quantizer cannot see future batches.
    *
    * Streamed-takedown contract: the layout IS an IVF index and its
    * tombstone relation is the shared ANN one
    * ([[Similarity.deleteFromIndex]]), so the streamed erasure feed
    * is [[graft.streaming.VecStream.deleteStream]] pointed at this
    * directory — the semantic family needs no takedown stream of its
    * own, and batch/stream erasure share one kernel by construction.
    */
  def writeSemanticIndex(s: SparkSession, d: String, outDir: String): Unit =
    Similarity.writeIvfIndexOf(s,
      Similarity.ivfIndexFor(s, d, SemanticHistoricalPred, "semhist"), outDir)

  /** The session's shared stored semantic index, written at most once
    * per (session, corpus) — build-once attribution (the
    * writeLexIndexOnce convention, r18): the incremental probe serves
    * it directly, the takedown query snapshots it by file clone.
    */
  private val semWriteOnce = new SessionCache[String]()
  private def storedSemanticIndexDir(s: SparkSession, d: String): String =
    semWriteOnce.getOrBuild(s, d) {
      val dir = Similarity.storedQueryDir("sem_incr", d)
      writeSemanticIndex(s, d, dir)
      dir
    }

  /** The nightly batch's kept set against a STORED semantic index:
    * batch vectors are assigned to the FROZEN cells (the stored
    * centroids, the same kernel the build used), probed against the
    * stored cell members under a pushed cell partition filter
    * (cap-guarded — over the cap the join stays keyed on cell, just
    * unpruned), and a batch vector is dropped iff some surviving
    * stored member of its cell is within the semantic threshold.
    * Tombstoned ids drop at the scan ([[Similarity.readIvfIndex]]),
    * so takedown visibility is immediate.
    */
  def incrementalSemanticKept(s: SparkSession, d: String, indexDir: String,
      threshold: Double, pushdownCap: Int = MinhashPushdownCap,
      batchPred: Column = col("vec_id") % IncrementalMod === 0): DataFrame = {
    import s.implicits._
    import graft.functions.VectorFunctions
    val idx = Similarity.readIvfIndex(s, indexDir)
    val cells = Similarity.nearestCellsCol(idx.cents, 1) _
    // pin the batch's cell assignment once: it feeds the pushdown
    // collect AND the stored join, and the nearest-cell kernel (k
    // centroid dot products per vector) is the probe's expensive leg
    // (the concurrencyFromStored discipline, r19)
    val batch = Similarity.corpus(s, d).filter(batchPred)
      .select($"vec_id".as("b_id"), $"embedding".as("b_emb"),
        $"nrm".as("b_nrm"), explode(cells($"embedding")).as("cell"))
      .localCheckpoint(true)
    val probed = batch.select($"cell").distinct()
      .limit(pushdownCap + 1).collect().map(_.getLong(0))
    val stored =
      if (probed.length > pushdownCap) idx.assigned
      else if (probed.isEmpty) idx.assigned.filter(lit(false))
      else idx.assigned.filter($"cell".isin(
        probed.map(java.lang.Long.valueOf).toIndexedSeq: _*))
    val dropped = batch.join(stored, Seq("cell"))
      .select($"b_id",
        round(VectorFunctions.cosineFrom(
          VectorFunctions.dot($"b_emb", $"embedding"), $"b_nrm", $"nrm"),
          4).as("cos"))
      .filter($"cos" >= threshold)
      .select($"b_id".as("vec_id")).distinct()
    Tables.embeddings(s, d).filter(batchPred).select($"vec_id")
      .join(dropped, Seq("vec_id"), "left_anti")
      .select($"vec_id")
  }

  /** Rows per block of the exact blocked embedding self-join: two
    * blocks of 64-dim float vectors ≈ 2 MB per task — far under
    * executor memory at any corpus size (block COUNT grows with n, the
    * per-task footprint doesn't).
    */
  val EmbBlockRows = 4096

  /** The subquadratic scale path for embedding near-dup: candidate
    * pairs from the random-hyperplane LSH tables
    * (`Similarity.lshBuckets`), then exact cosine verification of the
    * candidates only. Approximate by construction — recall depends on
    * the threshold's angle; at the near-dup thresholds this is built
    * for (cos ≥ ~0.85, where true duplicates live) the per-table
    * collision probability is high and measured recall is 1.0 (spec:
    * PipelineOpsSpec "LSH embedding near-dup"); at looser thresholds
    * use the exact blocked query. Input: (vec_id LONG, embedding
    * ARRAY<FLOAT>).
    */
  def embeddingLshPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    import graft.functions.VectorFunctions
    // occupancy-adaptive bucket sizing: one COUNT of the input (a
    // build-once pair job reads it in full anyway) picks the plane
    // count that holds per-bucket occupancy at the target
    val np = Similarity.adaptivePlanes(emb.count())
    val bucketed = emb
      .select($"vec_id", explode(Similarity.lshBucketsPacked($"embedding", np)).as("tp"))
      .select($"vec_id", Similarity.unpackTable($"tp").as("table"),
        Similarity.unpackBucket($"tp").as("bucket"))
    val e = emb.select($"vec_id", $"embedding",
      VectorFunctions.norm($"embedding").as("nrm"))
    lshPairsVerify(bucketed, e, threshold)
  }

  /** Declared-query form of [[embeddingLshPairs]]: candidate buckets
    * come from the build-once persisted LSH index
    * ([[Similarity.lshIndex]] — the same relation `lsh_build` benches
    * and `sim_ann_lsh` probes), so the steady-state pair query never
    * re-evaluates the bucket kernel; only the verify side re-scans the
    * narrow (vec_id, embedding) columns for norms. The verified pair
    * relation itself is ALSO built once per (session, corpus,
    * threshold) and persisted — `dedup_embedding_lsh` (the pair
    * report) and `dedup_embedding_cluster` (the component collapse)
    * both consume it, the same build-once contract as
    * [[jaccardPairs]]; at corpus scale it is a stored intermediate.
    */
  def embeddingLshPairsIndexed(s: SparkSession, d: String,
      threshold: Double): DataFrame =
    embLshPairsCache.getOrBuild(s, s"$threshold#$d") {
      import s.implicits._
      import graft.functions.VectorFunctions
      val bucketed = Similarity.lshIndex(s, d)
        .select($"vec_id", $"table", $"bucket")
      val e = Tables.embeddings(s, d).select($"vec_id", $"embedding",
        VectorFunctions.norm($"embedding").as("nrm"))
      lshPairsVerify(bucketed, e, threshold)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  private val embLshPairsCache = new SessionCache[DataFrame](df =>
    scala.util.Try(df.unpersist(blocking = false)))

  // ------------------------------------------------------------------
  // Stored pair-relation contract — the stored-index convention
  // applied to the dedup pair graph. At 100 TB the pair relation is
  // THE expensive intermediate: ONE job runs the candidate+verify
  // build (`pairs_build` / `emb_pairs_build` above) and writes the
  // verified edges; LATER jobs — the component collapse, the pair
  // report, an incremental re-dedup — read them back without paying
  // the build again. The SessionCaches above model this in-process;
  // these functions ARE the cross-job form. Edges are written
  // partitioned by a bounded shard of the canonical lower id, so a
  // resumable / incremental consumer (re-verify one shard, collapse
  // shard-at-a-time, backfill a failed shard) reads ONE directory via
  // static partition pruning instead of the whole graph.
  // ------------------------------------------------------------------

  /** Shard count for stored pair relations: bounded directory fanout
    * (id_a % PairShards). 16 keeps per-shard file counts sane at any
    * scale; a deployment re-shards by writing with a different value —
    * readers never assume a count, they read the layout.
    */
  val PairShards = 16

  private[operators] def withShard(pairs: DataFrame): DataFrame =
    pairs.withColumn("shard",
      org.apache.spark.sql.functions.pmod(col("id_a"), lit(PairShards.toLong))
        .cast("int"))

  /** Pair-relation schema for stored reads — explicit for the same
    * partition-column-type reason as [[Similarity.readIvfIndex]]
    * (directory-value inference would type `shard` by parsing, and a
    * cast on the filter side defeats partition pruning).
    */
  private[operators] def pairSchema(simCol: String) = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id_a",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("id_b",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField(simCol,
      org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("shard",
      org.apache.spark.sql.types.IntegerType)))

  /** Write the verified exact-Jaccard pair relation ([[jaccardPairs]])
    * as shard-partitioned parquet. The UNROUNDED jaccard rides along
    * (parquet DOUBLE round-trips 64-bit values exactly — the PCA
    * stored-model lesson), so stored consumers apply the same
    * round-then-threshold the declared queries do.
    */
  def writeJaccardPairs(s: SparkSession, d: String, outDir: String,
      maxDf: Int = MaxShingleDf): Unit = {
    import s.implicits._
    // cluster rows into their shard before the partitioned write —
    // without this every upstream task writes into every shard
    // directory (tasks × shards files: measured 512 tiny files for 16
    // shards at sf0.1, and the dominant cost of the
    // dedup_cluster_stored line); one exchange keyed by the partition
    // column makes it one file per shard at bench scale, and at
    // deployment scale caps files-per-shard at the tasks holding that
    // shard (re-shard by raising PairShards, not by splitting files)
    withShard(jaccardPairs(s, d, maxDf)
      .select($"id_a", $"id_b", $"jaccard"))
      .repartition($"shard")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }

  /** Bounded-peak-disk pair build for disk-thin executors — the
    * sliced form of [[writeJaccardPairs]] (r17 verdict item 1): the
    * shingle keyspace is partitioned into `passes` slices by the
    * 64-bit shingle hash, each pass builds the DF-culled partial
    * co-occurrence counts for ITS shingles alone and lands them as
    * parquet, and one fold sums the partials into the exact pair
    * relation. Output-identical to the monolithic build
    * (SlicedPairsSpec pins it): a shingle lives in exactly one slice,
    * so its per-pass document frequency IS its global DF (the 2 ≤ df
    * ≤ maxDf cull decides identically), and per-pair n_common is the
    * sum of its per-slice shares; n_a/n_b come from the whole shingle
    * arrays, and the final division is one double op — bit-identical.
    *
    * Why this exists: the monolithic build's plan is measured-LINEAR
    * (NOTES r17 decade table) but its transient footprint holds the
    * ~5B-row occurrence exchange, two pair-relation exchanges, and
    * the output simultaneously — ≈85 GB at the sf100 fixture vs 71 GB
    * free on one box (44 `No space left on device` task failures).
    * Each BUILD pass exchanges ~1/passes of the occurrence relation
    * and retires its shuffle files before the next pass starts; the
    * FOLD is sliced too (the first sf100 attempt died here: summing
    * the partials and attaching sizes holds three pair-relation-sized
    * exchanges at once, ~50 GB of simultaneous shuffle footprint at
    * the sf100 fixture) — partials land partitioned by the OUTPUT
    * shard (a row-local function of the packed pair key), and each of
    * `foldSlices` fold passes partition-prunes to its shard group,
    * sums, attaches sizes, and writes those shards directly, so no
    * stage ever exchanges more than ~1/foldSlices of the pair
    * relation. The tokenize runs ONCE: the hashed shingle relation
    * lands as compact parquet and every pass re-reads it — a narrow
    * columnar scan, not a re-run of the family's dominant kernel.
    * At cluster scale the same slicing bounds per-node shuffle disk
    * on every executor; `passes`/`foldSlices` trade wall-clock (one
    * extra columnar scan per pass) for the disk ceiling.
    * Measured at the sf100 fixture (5M docs, local[16], 24 g heap):
    * completes in ~13.5 min where the monolithic build exhausts the
    * box's 67 GB free disk — peak usage ~24 GB transient + partials.
    */
  def writeJaccardPairsSliced(s: SparkSession, d: String, outDir: String,
      passes: Int = 0, maxDf: Int = MaxShingleDf,
      foldSlices: Int = 0): Unit = {
    import s.implicits._
    val inputBytes = documentsBytes(s, d)
    // passes <= 0 derives the count from the input listing
    // ([[slicedPasses]]) — 2 at bench scale, the measured 4 at the
    // sf100 fixture, more beyond it; an explicit value pins it (specs)
    val nPasses = if (passes >= 1) passes else slicedPasses(inputBytes, 150L)
    // the inter-pass GC nudge exists to retire the previous pass's
    // shuffle files (ContextCleaner) when the footprint matters; at
    // small inputs it is pure fixed overhead (~0.1-0.3 s per full GC
    // × 2·passes), so it engages only in the disk-bounded regime
    val retire: () => Unit =
      if (inputBytes > SlicedPairsBytesThreshold) () => System.gc()
      else () => ()
    val nFold = if (foldSlices < 1) nPasses else foldSlices
    val work = s"${outDir}_slices"
    val workPath = new org.apache.hadoop.fs.Path(work)
    val fs = workPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(workPath, true)
    // tokenize + hash once; passes read the compact columnar form.
    // n_shingles rides on the same write (one job, row-local extra
    // column): the fold passes project (doc_id, n_shingles) out of the
    // columnar layout — 16 bytes/doc, the shingle arrays stay unread —
    // so the separate sizes relation (a second full read-back job of
    // the shingle parquet) is gone.
    Tables.documents(s, d)
      .select($"doc_id", shingleHashes($"text").as("sh"))
      .select($"doc_id", $"sh", size($"sh").as("n_shingles"))
      .write.parquet(s"$work/shingles")
    val rel = s.read.parquet(s"$work/shingles").select($"doc_id", $"sh")
    for (k <- 0 until nPasses) {
      // slice INSIDE the array, then explode: explode-then-filter
      // materializes every pass's rows through the generate and drops
      // (passes-1)/passes of them, so K passes would pay K full
      // explodes; the array-level filter keeps total generate work at
      // ~1× plus K cheap array scans (identical rows reach the
      // aggregation either way — a doc with no shingles in the slice
      // contributes nothing under both forms)
      val rows = rel.select($"doc_id",
        explode(filter($"sh",
          x => pmod(x, lit(nPasses.toLong)) === lit(k.toLong))).as("shingle"))
      // per-slice DF cull ≡ global DF cull: slice membership is a
      // function of the shingle value, so this slice sees EVERY
      // occurrence of its shingles and no other's
      val keep = rows.groupBy($"shingle").agg(count(lit(1)).as("df"))
        .filter($"df" > 1 && $"df" <= maxDf)
        .select($"shingle")
      rows.join(keep, Seq("shingle"), "left_semi")
        .groupBy($"shingle").agg(collect_list($"doc_id").as("ids"))
        .select(explode(bucketPairs($"ids")).as("p"))
        .groupBy($"p").agg(count(lit(1)).as("n_common"))
        // the output shard is a row-local function of the packed key,
        // so partials can land pre-bucketed and the fold prunes to
        // its shard group at the SCAN (directory pruning, no decode
        // of other groups' rows)
        .withColumn("shard",
          pmod(shiftrightunsigned($"p", 32), lit(PairShards.toLong))
            .cast("int"))
        .repartition($"shard")
        .write.partitionBy("shard").parquet(s"$work/partial/pass=$k")
      // the pass's shuffle files are dead state once its partial
      // lands; nudge the ContextCleaner so the next pass starts from
      // ~zero retained shuffle footprint instead of accumulating all
      // passes' files (the exact monolithic failure mode)
      retire()
    }
    val partialSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_common",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("pass",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("shard",
        org.apache.spark.sql.types.IntegerType)))
    val sizesRel = s.read.parquet(s"$work/shingles")
      .select($"doc_id", $"n_shingles")
    val staging = new org.apache.hadoop.fs.Path(s"${outDir}_staging")
    fs.delete(staging, true)
    for (f <- 0 until nFold) {
      val folded = s.read.schema(partialSchema)
        .parquet(s"$work/partial")
        .filter(pmod($"shard", lit(nFold)) === f)
        .groupBy($"p", $"shard").agg(sum($"n_common").as("n_common"))
        .select(shiftrightunsigned($"p", 32).as("id_a"),
          $"p".bitwiseAND(lit(0xffffffffL)).as("id_b"),
          $"n_common", $"shard")
        .join(sizesRel
          // id_a determines the shard, so this join side prunes to
          // the fold group's docs (row-local predicate)
          .filter(pmod($"doc_id", lit(PairShards.toLong)) % nFold === f)
          .select($"doc_id".as("id_a"), $"n_shingles".as("n_a")), "id_a")
        .join(sizesRel
          .select($"doc_id".as("id_b"), $"n_shingles".as("n_b")), "id_b")
        .select($"id_a", $"id_b",
          ($"n_common".cast("double") / ($"n_a" + $"n_b" - $"n_common"))
            .as("jaccard"), $"shard")
      folded
        // RANGE-partition on (shard, id_a), never hash on shard alone:
        // hash-on-shard makes each shard ONE task, and at the sf100
        // fixture that task's dynamic-partition sort asks for a ~2 GB
        // contiguous page (measured: UNABLE_TO_ACQUIRE_MEMORY aborts
        // the fold write) — ranged tasks stay sampler-balanced while
        // still clustering rows into their shard directory, the
        // writeLexIndex lesson; files-per-shard ≈ tasks holding it
        .repartitionByRange($"shard", $"id_a")
        .sortWithinPartitions($"shard", $"id_a")
        .write.mode("append").partitionBy("shard")
        .parquet(staging.toString)
      retire()
    }
    graft.operators.Similarity.swapDirInto(s, staging,
      new org.apache.hadoop.fs.Path(outDir))
    fs.delete(workPath, true)
  }

  /** Documents-input bytes above which [[writeJaccardPairsAuto]]
    * dispatches to the sliced build. Calibrated from the measured
    * fixture decade: the monolithic build completed the ~60 MB-input
    * sf10 fixture comfortably (~110 s, transient footprint well under
    * disk) and exhausted a 71 GB-free box at the ~570 MB-input sf100
    * fixture (transient ≈ 85 GB ≈ 150× input — the occurrence
    * exchange, two pair exchanges, and the output held at once), so
    * the cutover sits between the two decades: above it the
    * monolithic form's transient footprint enters the
    * tens-of-gigabytes-per-node regime where disk-thin executors die,
    * while the sliced form's ~2.5 s/pass fixed overhead is noise.
    */
  private[graft] val SlicedPairsBytesThreshold: Long = 256L << 20

  /** Per-node transient-disk budget the sliced builds size their pass
    * count against, in GiB (`SPARK_GRAFT_SLICE_DISK_GB`, default 24 —
    * the measured peak of the 4-pass jaccard build at the sf100
    * fixture). A deployment with thinner shuffle disks lowers it and
    * gets more, smaller passes; the budget is a per-executor property,
    * so it is a conf, not a function of corpus size.
    */
  private[graft] def sliceDiskBudgetBytes: Long =
    sys.env.get("SPARK_GRAFT_SLICE_DISK_GB").map(_.trim.toLong)
      .getOrElse(24L) << 30

  /** Scale-adaptive pass count for the sliced pair builds: estimated
    * transient footprint (input bytes × the family's MEASURED
    * transient multiplier — ~150× for the text/shingle family, ~350×
    * for the embedding family whose pair exchanges carry the vectors
    * plus cross-pass verify duplication) divided by the per-node disk
    * budget, clamped to [2, 16]. A constant pass count is wrong in
    * both directions: 4 passes at bench scale pays 4× fixed pass
    * overhead to bound a footprint of a few MB, and 4 passes at 10×
    * the sf100 fixture would blow the very budget the slicing exists
    * to hold (the optimization-guide rule: derive partitioning from
    * input size, not a constant tuned for one scale). The floor is 2,
    * not 1, so the DECLARED sliced queries always exercise the
    * cross-pass fold they exist to prove. At the sf100 fixture the
    * formula reproduces the measured-complete configurations: jaccard
    * 570 MB × 150 / 24 GiB → 4; embeddings 270 MB × 350 / 24 GiB → 4.
    */
  private[graft] def slicedPasses(inputBytes: Long, multiplier: Long): Int = {
    val budget = math.max(1L << 30, sliceDiskBudgetBytes)
    val est = inputBytes * multiplier
    math.max(2, math.min(16, ((est + budget - 1) / budget).toInt))
  }

  /** Bytes under one of the corpus's tables — a NAMENODE listing
    * (content summary), no data scan; the dispatch probe must cost
    * nothing next to either build.
    */
  private[graft] def tableBytes(s: SparkSession, d: String,
      table: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$d/$table")
    p.getFileSystem(s.sparkContext.hadoopConfiguration)
      .getContentSummary(p).getLength
  }

  private[graft] def documentsBytes(s: SparkSession, d: String): Long =
    tableBytes(s, d, "documents.parquet")

  /** Size-adaptive pair-relation write: the monolithic single-plan
    * build below [[SlicedPairsBytesThreshold]] of documents input,
    * the bounded-peak-disk [[writeJaccardPairsSliced]] above it. The
    * two are bit-identical in output (SlicedPairsSpec), so the choice
    * is purely an execution-footprint one — exactly the decision a
    * deployment makes per corpus, made here from the input listing so
    * callers building stored pair artifacts ([[Similarity]]'s hybrid
    * family) inherit the sf100-measured survival path without a knob.
    * The sliced branch derives its pass count from the same listing
    * ([[slicedPasses]] — 4 at the sf100 fixture, matching the
    * completed measurement: ~24 GB peak vs the monolithic ~85 GB).
    */
  def writeJaccardPairsAuto(s: SparkSession, d: String, outDir: String,
      maxDf: Int = MaxShingleDf,
      thresholdBytes: Long = SlicedPairsBytesThreshold): Unit =
    if (documentsBytes(s, d) > thresholdBytes)
      writeJaccardPairsSliced(s, d, outDir, maxDf = maxDf)
    else writeJaccardPairs(s, d, outDir, maxDf)

  /** Read a stored Jaccard pair relation (all shards), minus any doc
    * tombstones ([[deleteFromPairsDir]]) — applied centrally so every
    * stored-pair consumer (the cluster collapse, the containment
    * rescale, the hybrid lexical leg) honors takedowns identically.
    */
  def readJaccardPairs(s: SparkSession, pairsDir: String): DataFrame =
    minusPairTombstones(s, pairsDir,
      s.read.schema(pairSchema("jaccard")).parquet(pairsDir))

  /** Doc-level takedown against a stored pair relation (Jaccard,
    * embedding or media layout — the tombstone relation is shared):
    * append the ids to an id-sized tombstone file; every stored
    * reader drops pairs with a deleted ENDPOINT (either side — a pair
    * is evidence about two documents, and erasing one invalidates the
    * pair), so the deleted doc stops clustering, stops serving as a
    * lexical-leg neighbor, and stops rescaling containment from the
    * next read, while the multi-TB shard layout stays untouched.
    * Physical purge is [[compactPairsDir]]. Idempotent; the
    * deleteFromIndex contract otherwise (single-writer, re-ingest
    * only after compaction).
    */
  def deleteFromPairsDir(s: SparkSession, pairsDir: String,
      docIds: DataFrame): Unit =
    docIds.select(col(docIds.columns.head).cast("long").as("doc_id"))
      .coalesce(1)
      .write.mode("append").parquet(s"$pairsDir/_graft_doc_tombstones")

  /** The tombstone anti-join the stored-pair readers apply — one
    * existence check and zero plan nodes when absent; BOTH endpoints
    * are checked (two anti-joins on the id-sized relation). Shard
    * pruning ([[readPairShard]]'s static predicate) pushes through
    * the anti-joins' left side.
    */
  private def minusPairTombstones(s: SparkSession, pairsDir: String,
      rows: DataFrame): DataFrame = {
    val tp = new org.apache.hadoop.fs.Path(s"$pairsDir/_graft_doc_tombstones")
    if (!tp.getFileSystem(s.sparkContext.hadoopConfiguration).exists(tp)) rows
    else {
      val ts = s.read.schema("doc_id BIGINT").parquet(tp.toString)
      rows
        .join(ts.select(col("doc_id").as("id_a")), Seq("id_a"), "left_anti")
        .join(ts.select(col("doc_id").as("id_b")), Seq("id_b"), "left_anti")
    }
  }

  /** Physically purge tombstoned pairs from a stored pair relation:
    * rewrite the shards minus pairs touching a deleted endpoint
    * (staging + dir swap — a crash before the swap leaves the old
    * layout AND its tombstones intact, so the anti-join stays
    * correct; the swap replaces the whole dir, so the promote itself
    * retires the purged rows and their tombstones in one rename —
    * no separate tombstone delete is needed or performed,
    * single-writer). The layout's score
    * column ("jaccard" for the text pairs, "cos_sim" for the
    * embedding/media pairs) is read FROM THE STORED FOOTERS, not a
    * parameter: a caller passing the wrong name for a destructive
    * rewrite would otherwise null the scores of every surviving pair
    * silently (the explicit schema reads an absent column as null) —
    * self-describing beats a footgun default.
    */
  def compactPairsDir(s: SparkSession, pairsDir: String): Unit = {
    import s.implicits._
    val storedCols = s.read.parquet(pairsDir).schema.fieldNames.toSet
    val simCol = Seq("jaccard", "cos_sim").filter(storedCols.contains) match {
      case Seq(one) => one
      case other => sys.error(
        s"$pairsDir is not a pair layout (score columns: $other; " +
          s"stored: ${storedCols.mkString(",")})")
    }
    val survivors = minusPairTombstones(s, pairsDir,
      s.read.schema(pairSchema(simCol)).parquet(pairsDir))
      .repartition($"shard")
    val fs = new org.apache.hadoop.fs.Path(pairsDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(s"${pairsDir}_staging")
    fs.delete(staging, true)
    survivors.write.partitionBy("shard").parquet(staging.toString)
    graft.operators.Similarity.swapDirInto(s, staging,
      new org.apache.hadoop.fs.Path(pairsDir))
  }

  /** One shard of a stored pair relation — the incremental/resumable
    * consumer's read; the filter is a static partition predicate, so
    * the scan touches one directory (IndexStoreSpec pins this on the
    * executed plan).
    */
  def readPairShard(pairs: DataFrame, shard: Int): DataFrame =
    pairs.filter(col("shard") === shard)

  /** `dedup_ngram_jaccard` from a stored pair relation — identical
    * output, no inverted-index build.
    */
  def ngramJaccardStored(s: SparkSession, pairsDir: String): DataFrame = {
    import s.implicits._
    readJaccardPairs(s, pairsDir)
      .filter(round($"jaccard", 6) >= JaccardThreshold)
      .select($"id_a", $"id_b", round($"jaccard", 6).as("jaccard"))
  }

  /** `dedup_cluster` from a stored pair relation: the one-job-builds/
    * later-job-collapses shape the 100 TB dedup story is made of.
    */
  def clusterStored(s: SparkSession, pairsDir: String): DataFrame =
    connectedComponents(ngramJaccardStored(s, pairsDir))

  /** Write the verified embedding-LSH pair relation
    * ([[embeddingLshPairsIndexed]]) shard-partitioned. cos_sim is
    * stored as the declared queries emit it (rounded to 4,
    * threshold-filtered): the verify threshold is part of the build's
    * identity, exactly as the LSH plane tensor is part of the index's.
    */
  def writeEmbPairs(s: SparkSession, d: String, outDir: String,
      threshold: Double = CosineThreshold): Unit =
    withShard(embeddingLshPairsIndexed(s, d, threshold))
      .repartition(col("shard")) // see writeJaccardPairs: one file per shard
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  /** Bounded-peak-disk embedding pair build — the
    * [[writeJaccardPairsSliced]] discipline transferred to the LSH
    * TABLE keyspace (the r18 seed, now measured necessary: the
    * monolithic build died at the sf100 fixture with 18 disk-full
    * task failures at ~473 s — the bucket self-join, the global
    * candidate dedup, and TWO pair-sized embedding joins held
    * simultaneously). A candidate pair arises only within one table's
    * bucket, so pass k verifies the tables ≡ k (mod passes) alone —
    * per-pass transient ≈ 1/passes of the bucket join and of the
    * verify joins — and lands its verified pairs PRE-BUCKETED by
    * output shard. Unlike the shingle slicing, one pair can surface
    * in several passes (near-dups collide in many tables — that is
    * what makes LSH recall work), so the fold's job is cross-pass
    * DEDUP, not summation: rounded cos_sim is a deterministic
    * function of the pair, every duplicate row is value-identical,
    * and dropDuplicates on the key is exact. The duplicated verify
    * work for cross-pass collisions is the price of the 1/K
    * footprint; it is bounded by the table count. The bucket kernel
    * runs ONCE (packed (table, bucket) relation + narrow norms
    * relation landed as work parquet; every pass re-reads the
    * columnar form — the tokenize-once convention), with
    * [[Similarity.lshPlanes]] sizing so bucketing is identical to
    * [[writeEmbPairs]]'s session-indexed path. Output bit-identical
    * (SlicedPairsSpec).
    */
  def writeEmbPairsSliced(s: SparkSession, d: String, outDir: String,
      passes: Int = 0, threshold: Double = CosineThreshold): Unit = {
    import s.implicits._
    import graft.functions.VectorFunctions
    val inputBytes = tableBytes(s, d, "embeddings.parquet")
    // passes <= 0 derives from the input listing ([[slicedPasses]];
    // the 350× multiplier is the embedding family's measured transient
    // share — pair exchanges carry the vectors plus cross-pass verify
    // duplication): 2 at bench scale, the measured-complete 4 at the
    // sf100 fixture. Explicit values pin it (specs).
    val nPasses = if (passes >= 1) passes else slicedPasses(inputBytes, 350L)
    // inter-pass GC: disk-bounded regime only (see writeJaccardPairsSliced)
    val retire: () => Unit =
      if (inputBytes > SlicedEmbPairsBytesThreshold) () => System.gc()
      else () => ()
    val work = s"${outDir}_slices"
    val workPath = new org.apache.hadoop.fs.Path(work)
    val fs = workPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(workPath, true)
    val np = Similarity.lshPlanes(s, d)
    Tables.embeddings(s, d)
      .select($"vec_id", $"embedding",
        VectorFunctions.norm($"embedding").as("nrm"))
      .write.parquet(s"$work/vecs")
    val vecs = s.read.parquet(s"$work/vecs")
    // land the bucket relation pre-partitioned by PASS, so each pass's
    // scan is a pruned directory read (1/passes of the relation)
    // instead of a full scan with a row filter per pass
    vecs.select($"vec_id",
        explode(Similarity.lshBucketsPacked($"embedding", np)).as("tp"))
      .select($"vec_id", Similarity.unpackTable($"tp").as("table"),
        Similarity.unpackBucket($"tp").as("bucket"))
      .withColumn("pass", pmod($"table", lit(nPasses)))
      .write.partitionBy("pass").parquet(s"$work/buckets")
    val bucketSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("table",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("pass",
        org.apache.spark.sql.types.IntegerType)))
    val bucketed = s.read.schema(bucketSchema).parquet(s"$work/buckets")
    for (k <- 0 until nPasses) {
      withShard(lshPairsVerify(
          bucketed.filter($"pass" === k)
            .select($"vec_id", $"table", $"bucket"), vecs, threshold))
        .repartition($"shard")
        .write.partitionBy("shard").parquet(s"$work/partial/pass=$k")
      // retire this pass's shuffle files before the next pass starts
      // (the monolithic failure mode is accumulation)
      retire()
    }
    val partialSchema = org.apache.spark.sql.types.StructType(
      pairSchema("cos_sim").fields :+
        org.apache.spark.sql.types.StructField("pass",
          org.apache.spark.sql.types.IntegerType))
    val staging = new org.apache.hadoop.fs.Path(s"${outDir}_staging")
    fs.delete(staging, true)
    val nFold = nPasses
    for (f <- 0 until nFold) {
      s.read.schema(partialSchema).parquet(s"$work/partial")
        .filter(pmod($"shard", lit(nFold)) === f)
        .dropDuplicates("id_a", "id_b")
        .select($"id_a", $"id_b", $"cos_sim", $"shard")
        // range, not hash-on-shard: the writeJaccardPairsSliced fold
        // lesson (one-task-per-shard dynamic-partition sorts ask for
        // multi-GB contiguous pages at the sf100 fixture)
        .repartitionByRange($"shard", $"id_a")
        .sortWithinPartitions($"shard", $"id_a")
        .write.mode("append").partitionBy("shard").parquet(staging.toString)
      retire()
    }
    graft.operators.Similarity.swapDirInto(s, staging,
      new org.apache.hadoop.fs.Path(outDir))
    fs.delete(workPath, true)
  }

  /** Embeddings-input bytes above which [[writeEmbPairsAuto]] goes
    * sliced. Calibrated like [[SlicedPairsBytesThreshold]]: the
    * monolithic build completed the 28 MB sf10 fixture in 26 s and
    * exhausted 73 GB of free disk at the 270 MB sf100 fixture
    * (transient ≈ 250× input — embedding pair exchanges carry the
    * vectors themselves, so the multiplier beats the text family's).
    */
  private[graft] val SlicedEmbPairsBytesThreshold: Long = 128L << 20

  /** Size-adaptive embedding pair build — [[writeJaccardPairsAuto]]'s
    * contract on the embedding family: listing-priced probe,
    * bit-identical branches, the sliced survival path above the
    * measured disk wall.
    */
  def writeEmbPairsAuto(s: SparkSession, d: String, outDir: String,
      threshold: Double = CosineThreshold,
      thresholdBytes: Long = SlicedEmbPairsBytesThreshold): Unit =
    if (tableBytes(s, d, "embeddings.parquet") > thresholdBytes)
      writeEmbPairsSliced(s, d, outDir, threshold = threshold)
    else writeEmbPairs(s, d, outDir, threshold)

  /** Read a stored embedding pair relation (all shards), minus any
    * doc tombstones — the [[readJaccardPairs]] takedown contract on
    * the embedding/media layout.
    */
  def readEmbPairs(s: SparkSession, pairsDir: String): DataFrame =
    minusPairTombstones(s, pairsDir,
      s.read.schema(pairSchema("cos_sim")).parquet(pairsDir))

  /** `dedup_embedding_lsh` from a stored pair relation. */
  def embeddingLshStored(s: SparkSession, pairsDir: String): DataFrame = {
    import s.implicits._
    readEmbPairs(s, pairsDir).select($"id_a", $"id_b", $"cos_sim")
  }

  /** `dedup_embedding_cluster` from a stored pair relation. */
  def embeddingClusterStored(s: SparkSession, pairsDir: String): DataFrame = {
    import s.implicits._
    connectedComponents(embeddingLshStored(s, pairsDir))
      .select($"doc_id".as("vec_id"), $"rep_id")
  }

  /** Shared core: bucket-collision candidates → bare-id-pair dedup →
    * exact cosine verify. Candidate generation and its multi-table
    * dedup move bare 16-byte id pairs only; embeddings re-attach AFTER
    * the dedup, so a pair colliding in several tables never ships its
    * vectors repeatedly through the widest shuffle.
    */
  /** Write the HISTORICAL embedding LSH index for the incremental
    * near-dup probe — the [[writeMinhashIndex]] lifecycle applied to
    * the embedding family, reusing the stored-LSH layout verbatim
    * (table-partitioned, bucket-sorted, plane-count sidecar) so
    * [[Similarity.readLshIndex]]/[[Similarity.readLshPlanes]] work
    * unchanged. Plane count is occupancy-adaptive to the HISTORICAL
    * side (the index's recorded sizing — a probe must bucket its
    * batch with it, never with the current corpus's).
    */
  def writeEmbIncrIndex(s: SparkSession, d: String, outDir: String,
      histPred: Column = col("vec_id") % IncrementalMod =!= 0): Unit = {
    import s.implicits._
    val old = Similarity.corpus(s, d).filter(histPred)
    val np = Similarity.adaptivePlanes(old.count())
    old.select($"vec_id", $"embedding", $"nrm",
        explode(Similarity.lshBucketsPacked($"embedding", np)).as("tp"))
      .select($"vec_id", $"embedding", $"nrm",
        Similarity.unpackTable($"tp").as("table"),
        Similarity.unpackBucket($"tp").as("bucket"))
      .repartition($"table").sortWithinPartitions($"table", $"bucket")
      .write.mode("overwrite").partitionBy("table").parquet(outDir)
    Similarity.writePlanesSidecar(s, outDir, np)
  }

  /** Incremental embedding near-dup: the NEW batch (vec_id %
    * [[IncrementalMod]] == 0) probed against the STORED historical
    * index — new×old cosine pairs only, the [[incrementalMinhashPairs]]
    * shape for vectors. The batch buckets at the index's recorded
    * plane count, its (table, bucket) set pushes down into the stored
    * scan under the shared cap (directory + row-group pruning;
    * distributed-join fallback above it), and the verify cosine reads
    * both sides FROM THE JOIN — the stored rows carry embedding+nrm,
    * so no second corpus lookup. A pair colliding in several tables
    * dedups before the report.
    */
  def incrementalEmbeddingPairs(s: SparkSession, d: String,
      indexDir: String, threshold: Double = CosineThreshold,
      pushdownCap: Int = MinhashPushdownCap,
      batchPred: Column = col("vec_id") % IncrementalMod === 0): DataFrame = {
    import s.implicits._
    import graft.functions.VectorFunctions
    val np = Similarity.readLshPlanes(s, indexDir)
    // the batch's bucketed relation feeds the pushdown collect AND the
    // candidate join — Spark does not dedupe common subplans, so the
    // batch's bucket kernel ran twice; the probe collect materializes
    // the plan at build time regardless, so pin the batch-sized rows
    // once (the concurrencyFromStored discipline, r19)
    val newB = Similarity.corpus(s, d)
      .filter(batchPred)
      .select($"vec_id", $"embedding", $"nrm",
        explode(Similarity.lshBucketsPacked($"embedding", np)).as("tp"))
      .select($"vec_id".as("new_id"), $"embedding".as("emb_a"),
        $"nrm".as("nrm_a"),
        Similarity.unpackTable($"tp").as("table"),
        Similarity.unpackBucket($"tp").as("bucket"))
      .localCheckpoint(true)
    val stored = Similarity.readLshIndex(s, indexDir)
      .select($"vec_id".as("old_id"), $"embedding".as("emb_b"),
        $"nrm".as("nrm_b"), $"table", $"bucket")
    val probePairs = newB.select($"table", $"bucket").distinct()
      .limit(pushdownCap + 1).collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    val oldB =
      if (probePairs.length > pushdownCap) stored
      else if (probePairs.isEmpty) stored.filter(lit(false))
      else stored.filter(probePairs.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (t, ps) =>
          col("table") === t &&
            col("bucket").isin(ps.map(p => Integer.valueOf(p._2)).toIndexedSeq: _*)
        }.reduce(_ || _))
    newB.join(oldB, Seq("table", "bucket"))
      .select($"new_id", $"old_id",
        round(VectorFunctions.cosineFrom(
          VectorFunctions.dot($"emb_a", $"emb_b"), $"nrm_a", $"nrm_b"), 4)
          .as("cos_sim"))
      .filter($"cos_sim" >= threshold)
      .dropDuplicates("new_id", "old_id")
  }

  private[operators] def lshPairsVerify(bucketed: DataFrame, e: DataFrame,
      threshold: Double): DataFrame = {
    val s = bucketed.sparkSession
    import s.implicits._
    import graft.functions.VectorFunctions
    val cand = bucketed.as("a")
      .join(bucketed.as("b"),
        $"a.table" === $"b.table" && $"a.bucket" === $"b.bucket" &&
          $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("id_a"), $"b.vec_id".as("id_b"))
      .dropDuplicates("id_a", "id_b") // a pair may collide in several tables
    cand
      .join(e.select($"vec_id".as("id_a"), $"embedding".as("emb_a"),
        $"nrm".as("nrm_a")), "id_a")
      .join(e.select($"vec_id".as("id_b"), $"embedding".as("emb_b"),
        $"nrm".as("nrm_b")), "id_b")
      .select($"id_a", $"id_b",
        round(VectorFunctions.cosineFrom(
          VectorFunctions.dot($"emb_a", $"emb_b"), $"nrm_a", $"nrm_b"), 4)
          .as("cos_sim"))
      .filter($"cos_sim" >= threshold)
  }

  /** Left-to-right double-precision dot product (same accumulation
    * order as the oracle's `list_sum(list_transform(...))`).
    */
  private def dotf(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  /** [[isNormWs]] as an RE2 character class (DuckDB regexp_replace):
    * the same explicit Unicode White_Space enumeration, kept adjacent
    * to the predicate so neither can drift without the other.
    */
  private val sqlNormWsClass =
    """[\t\n\x0B\f\r \x{0085}\x{00A0}\x{1680}\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]"""

  private val sqlToks =
    "list_filter(regexp_split_to_array(text, '\\s+'), t -> len(t) > 0)"
  /** DuckDB CTEs computing the DF-bounded pairwise 3-gram Jaccard —
    * the operator's actual contract at every scale: shingles whose
    * corpus document frequency exceeds [[MaxShingleDf]] contribute to
    * NO pair (the inverted-index cutoff that bounds bucket pair
    * emission), while per-doc sizes stay unfiltered. Stated as the
    * same inverted index relationally (gram rows → DF filter → bucket
    * self-join → size re-join) rather than a quadratic doc×doc
    * list_intersect, so the oracle matches the engine at corpora where
    * DF crosses the cutoff — at fixture scale (max DF 25) the two
    * formulations are value-identical, and this one is also far
    * cheaper for DuckDB at sf0.1.
    */
  /** The CDC chunking chain (through the per-doc positional `chunks`
    * relation, plus the `d` base), shared verbatim by the dedup_cdc
    * oracle and the dedup_cdc_incremental oracle — the SQL image of
    * [[cdcChunks]]: every window-end position's FNV elects cut
    * points, the length sentinel closes the final chunk,
    * lag-over-cuts rebuilds the segments.
    */
  private[operators] lazy val cdcChunkCtes: String =
    s"""d AS (SELECT doc_id, text, len(text) AS ln FROM documents),
          cuts AS (SELECT doc_id, p
            FROM d, UNNEST(generate_series($CdcWindow, ln)) AS u(p)
            WHERE ${sqlFnv(s"substr(text, p - ${CdcWindow - 1}, $CdcWindow)")}
              % $CdcDivisor = 0),
          bounds AS (SELECT doc_id, p FROM cuts
            UNION
            SELECT doc_id, ln FROM d WHERE ln > 0),
          seg AS (SELECT doc_id,
              COALESCE(lag(p) OVER (PARTITION BY doc_id ORDER BY p), 0) AS a,
              p AS b
            FROM bounds),
          chunks AS (SELECT s.doc_id, substr(d.text, a + 1, b - a) AS chunk
            FROM seg s JOIN d USING (doc_id) WHERE b > a)"""

  private[operators] val jaccardCte =
    s"""WITH toks AS (SELECT doc_id, $sqlToks t FROM documents),
        sh AS (SELECT doc_id, list_distinct(list_transform(
          generate_series(1, GREATEST(len(t) - 2, 0)),
          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) s FROM toks),
        srows AS (SELECT doc_id, unnest(s) AS g FROM sh),
        okrows AS (SELECT doc_id, g FROM srows
          JOIN (SELECT g, COUNT(*) AS df FROM srows GROUP BY g) USING (g)
          WHERE df BETWEEN 2 AND $MaxShingleDf),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            COUNT(*) AS n_common
          FROM okrows a JOIN okrows b
            ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
        pairs AS (SELECT id_a, id_b, sa.n AS n_a, sb.n AS n_b,
            n_common::DOUBLE / (sa.n + sb.n - n_common) AS j,
            n_common::DOUBLE / LEAST(sa.n, sb.n) AS cont
          FROM inter
          JOIN (SELECT doc_id, len(s) AS n FROM sh) sa ON sa.doc_id = id_a
          JOIN (SELECT doc_id, len(s) AS n FROM sh) sb ON sb.doc_id = id_b)"""

  /** Transitive closure of the exact-Jaccard dup graph — shared by
    * dedup_cluster and dedup_cluster_stored (the stored round trip may
    * not change the answer).
    */
  private lazy val clusterOracle: String = clusterOracleWith("")

  /** The transitive-closure cluster oracle with an optional extra
    * edge predicate — shared by dedup_cluster(_stored) (empty
    * predicate) and dedup_cluster_purged (both endpoints outside the
    * purge slice: exactly the pair set the tombstone anti-join
    * leaves).
    */
  private def clusterOracleWith(edgePred: String): String =
    s"""${jaccardCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
        dup AS (SELECT id_a, id_b FROM pairs
          WHERE ROUND(j, 6) >= $JaccardThreshold $edgePred),
        edges AS (SELECT id_a AS u, id_b AS v FROM dup
          UNION SELECT id_b, id_a FROM dup),
        reach(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
        SELECT u AS doc_id, LEAST(u, MIN(v)) AS rep_id
        FROM reach GROUP BY u"""

  private val baseOracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT MD5(text) AS content_fp, MIN(doc_id) AS keeper_id,
         COUNT(*) AS n_copies FROM documents GROUP BY 1""",
    // nfc_normalize + LOWER (utf8proc simple case mapping = the
    // kernel's per-code-point Character.toLowerCase) + the explicit
    // Unicode White_Space RE2 class ([[isNormWs]] enumerated) —
    // engine-identical on non-ASCII corpora, not just this fixture;
    // MD5(NULL) is NULL on both engines, so null docs share a group.
    "dedup_exact_norm" ->
      ("""SELECT MD5(TRIM(regexp_replace(LOWER(nfc_normalize(text)), '""" +
        sqlNormWsClass + """+', ' ', 'g'))) AS norm_fp,
         MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
         FROM documents GROUP BY 1"""),
    "dedup_keeplist" ->
      """SELECT doc_id, source, n_chars FROM (
         SELECT doc_id, source, n_chars, ROW_NUMBER() OVER (
           PARTITION BY MD5(text) ORDER BY doc_id ASC) AS rn
         FROM documents) WHERE rn = 1""",
    "pairs_build" ->
      s"""$jaccardCte
          SELECT id_a, id_b, ROUND(j, 6) AS jaccard FROM pairs""",
    // the sliced build is output-identical by construction (per-slice
    // DF ≡ global DF; n_common sums across slices) — same oracle
    "pairs_build_sliced" ->
      s"""$jaccardCte
          SELECT id_a, id_b, ROUND(j, 6) AS jaccard FROM pairs""",
    // the dashboard restated leg by leg over the SHARED CTE chains
    // (jaccard pairs, CDC chunks, positional 3-grams off the same
    // toks) — every leg is the corresponding query's own aggregate
    "pipe_dedup_audit" ->
      s"""$jaccardCte,
          $cdcChunkCtes,
          prows AS (SELECT doc_id,
              unnest(list_transform(generate_series(1, GREATEST(len(t) - 2, 0)),
                i -> i - 1)) AS pos,
              unnest(list_transform(generate_series(1, GREATEST(len(t) - 2, 0)),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
            FROM toks),
          pdup AS (SELECT g FROM (SELECT DISTINCT g, doc_id FROM prows)
            GROUP BY g HAVING COUNT(*) >= 2),
          spanruns AS (SELECT doc_id,
              pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
            FROM prows WHERE g IN (SELECT g FROM pdup)),
          cdcdup AS (SELECT chunk FROM (
              SELECT chunk, COUNT(DISTINCT doc_id) AS nd FROM chunks
              GROUP BY chunk)
            WHERE nd >= 2)
          SELECT 'docs' AS metric, CAST(COUNT(*) AS DOUBLE) AS value
            FROM documents
          UNION ALL
          SELECT 'exact_dup_docs',
            CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS DOUBLE)
            FROM documents
          UNION ALL
          SELECT 'neardup_pairs', CAST(COUNT(*) AS DOUBLE)
            FROM pairs WHERE ROUND(j, 6) >= $JaccardThreshold
          UNION ALL
          SELECT 'containment_pairs', CAST(COUNT(*) AS DOUBLE)
            FROM pairs WHERE ROUND(cont, 6) >= $ContainmentThreshold
          UNION ALL
          SELECT 'cdc_dup_chunk_share',
            ROUND(SUM(CASE WHEN f.chunk IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
              / COUNT(*), 6)
            FROM chunks c LEFT JOIN cdcdup f USING (chunk)
          UNION ALL
          SELECT 'dup_spans', CAST(COUNT(*) AS DOUBLE)
            FROM (SELECT DISTINCT doc_id, grp FROM spanruns)""",
    // the same pair relation rescaled to the smaller side's set size;
    // contained_id ties resolve to id_a in both engines
    "dedup_containment" ->
      s"""$jaccardCte
          SELECT id_a, id_b,
            CASE WHEN n_a <= n_b THEN id_a ELSE id_b END AS contained_id,
            ROUND(cont, 6) AS containment, ROUND(j, 6) AS jaccard
          FROM pairs WHERE ROUND(cont, 6) >= $ContainmentThreshold""",
    // SimHash restated in HUGEINT arithmetic mod 2⁶⁴: FNV-1a folds over
    // each token's Unicode CODE POINTS (ord/len are code-point-based in
    // DuckDB, matching the kernel's codePointAt loop) — a code point is
    // < 2²¹, so XOR touches only the low 32 bits and runs on BIGINT
    // while the wrapping multiply stays in HUGEINT. Per-bit ±1 votes,
    // sign → bit, then Spark's conv(…,10,16) semantics: two's-
    // complement view, uppercase hex, no leading zeros, 0 → '0'.
    "dedup_simhash" -> {
      val fnv = sqlFnv("tok")
      s"""WITH toks AS (
            SELECT doc_id, UNNEST($sqlToks) AS tok FROM documents),
          h AS (SELECT doc_id, $fnv AS h FROM toks),
          votes AS (
            SELECT doc_id, b.b,
              SUM(CASE WHEN (h // CAST(POWER(2, b.b) AS HUGEINT)) % 2 = 1 THEN 1 ELSE -1 END) AS v
            FROM h, generate_series(0, 63) AS b(b) GROUP BY doc_id, b.b),
          fp AS (
            SELECT doc_id, SUM(CASE WHEN v > 0 THEN CAST(POWER(2, b) AS HUGEINT) ELSE CAST(0 AS HUGEINT) END) AS fp
            FROM votes GROUP BY doc_id)
          SELECT d.doc_id,
            CASE WHEN f.fp IS NULL OR f.fp = 0 THEN '0'
              ELSE ltrim(to_hex(CAST(CASE WHEN f.fp >= CAST('9223372036854775808' AS HUGEINT)
                THEN f.fp - CAST('18446744073709551616' AS HUGEINT) ELSE f.fp END AS BIGINT)), '0')
            END AS simhash_hex
          FROM documents d LEFT JOIN fp f USING (doc_id)"""
    },
    "dedup_ngram_jaccard" ->
      s"""$jaccardCte
          SELECT id_a, id_b, ROUND(j, 6) AS jaccard FROM pairs
          WHERE ROUND(j, 6) >= $JaccardThreshold""",
    "dedup_minhash_lsh" ->
      s"""$jaccardCte
          SELECT id_a, id_b, ROUND(j, 6) AS jaccard FROM pairs
          WHERE ROUND(j, 6) >= $JaccardThreshold""",
    // the shared pair CTE restricted to one-new-one-old pairs and
    // oriented (new_id, old_id) — the incremental probe's contract
    "dedup_minhash_incremental" ->
      s"""$jaccardCte,
          qual AS (SELECT id_a, id_b, ROUND(j, 6) AS jac FROM pairs
            WHERE ROUND(j, 6) >= $JaccardThreshold),
          split AS (SELECT id_a, id_b, jac,
            CASE WHEN id_a % $IncrementalMod = 0 THEN 1 ELSE 0 END AS a_new,
            CASE WHEN id_b % $IncrementalMod = 0 THEN 1 ELSE 0 END AS b_new
            FROM qual)
          SELECT CASE WHEN a_new = 1 THEN id_a ELSE id_b END AS new_id,
            CASE WHEN a_new = 1 THEN id_b ELSE id_a END AS old_id,
            jac AS jaccard
          FROM split WHERE a_new + b_new = 1""",
    // the shared pair CTE with each side classified by the
    // decontamination split rule (substr(md5(id),1,2), the
    // txt_decontaminate oracle's convention) — a qualifying pair with
    // exactly one eval-side member contaminates its train-side member
    "txt_decontaminate_fuzzy" ->
      s"""$jaccardCte,
          qual AS (SELECT id_a, id_b, ROUND(j, 6) AS jac,
            CASE WHEN substr(md5(CAST(id_a AS VARCHAR)), 1, 2)
              < '${TextAnalysis.EvalSplitThreshold}' THEN 1 ELSE 0 END AS a_ev,
            CASE WHEN substr(md5(CAST(id_b AS VARCHAR)), 1, 2)
              < '${TextAnalysis.EvalSplitThreshold}' THEN 1 ELSE 0 END AS b_ev
            FROM pairs WHERE ROUND(j, 6) >= $JaccardThreshold)
          SELECT CASE WHEN a_ev = 0 THEN id_a ELSE id_b END AS doc_id,
            COUNT(*) AS n_eval_neardups, MAX(jac) AS max_jaccard
          FROM qual WHERE a_ev + b_ev = 1
          GROUP BY 1""",
    // Positional 3-gram stream (1-based list index → the engine's
    // 0-based token position), df over distinct docs, gaps-and-islands
    // run collapse. The oracle groups 3-gram STRINGS where the engine
    // groups their 64-bit FNV-1a hashes — identical modulo a 2⁻⁶⁴
    // collision (the family convention, see shingleHashes).
    "dedup_substring" ->
      s"""WITH toks AS (SELECT doc_id, $sqlToks t FROM documents),
          prows AS (SELECT doc_id,
              unnest(list_transform(generate_series(1, GREATEST(len(t) - 2, 0)),
                i -> i - 1)) AS pos,
              unnest(list_transform(generate_series(1, GREATEST(len(t) - 2, 0)),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
            FROM toks),
          dup AS (SELECT g FROM (SELECT DISTINCT g, doc_id FROM prows)
            GROUP BY g HAVING COUNT(*) >= 2),
          dpos AS (SELECT doc_id, pos FROM prows
            WHERE g IN (SELECT g FROM dup)),
          runs AS (SELECT doc_id, pos,
              pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
            FROM dpos)
          SELECT doc_id, MIN(pos) AS run_start, MAX(pos) AS run_end,
            COUNT(*) AS n_shingles
          FROM runs GROUP BY doc_id, grp""",
    // The chunker restated positionally: every window-end position's
    // FNV (the shared sqlFnv HUGEINT form) elects cut points, the
    // length sentinel closes the final chunk, lag-over-cuts rebuilds
    // the segments, and the dup election groups chunk STRINGS where
    // the engine groups their FNV hashes (equal modulo a 2⁻⁶⁴
    // collision, the family convention). D = $CdcDivisor divides 2⁶⁴,
    // so unsigned % D here ≡ the kernel's signed low-bit test.
    "dedup_cdc" ->
      s"""WITH $cdcChunkCtes,
          dup AS (SELECT chunk FROM (
              SELECT chunk, COUNT(DISTINCT doc_id) AS nd FROM chunks
              GROUP BY chunk)
            WHERE nd >= 2),
          per AS (SELECT c.doc_id,
              COUNT(*) AS n_chunks,
              CAST(SUM(CASE WHEN f.chunk IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS dup_chunks,
              CAST(SUM(CASE WHEN f.chunk IS NOT NULL THEN len(c.chunk)
                ELSE 0 END) AS BIGINT) AS dup_chars
            FROM chunks c LEFT JOIN dup f USING (chunk)
            GROUP BY c.doc_id)
          SELECT d.doc_id,
            COALESCE(per.n_chunks, 0) AS n_chunks,
            COALESCE(per.dup_chunks, 0) AS dup_chunks,
            COALESCE(per.dup_chars, 0) AS dup_chars
          FROM d LEFT JOIN per USING (doc_id)""",
    // the pair mass + transitive closure restated over the shared
    // chunk chain (the clusterOracle shape; chunk identity by STRING
    // where the engine uses the FNV hash — the family convention)
    "dedup_cdc_cluster" ->
      s"""WITH RECURSIVE $cdcChunkCtes,
          dch AS (SELECT DISTINCT doc_id, chunk FROM chunks),
          cdf AS (SELECT chunk FROM (
              SELECT chunk, COUNT(*) AS c FROM dch GROUP BY chunk)
            WHERE c BETWEEN 2 AND $MaxCdcDf),
          pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              CAST(SUM(len(a.chunk)) AS BIGINT) AS shared_chars
            FROM dch a JOIN dch b
              ON a.chunk = b.chunk AND a.doc_id < b.doc_id
            WHERE a.chunk IN (SELECT chunk FROM cdf)
            GROUP BY a.doc_id, b.doc_id),
          dup AS (SELECT id_a, id_b FROM pr
            WHERE shared_chars >= $CdcClusterMinChars),
          edges AS (SELECT id_a AS u, id_b AS v FROM dup
            UNION SELECT id_b, id_a FROM dup),
          reach(u, v) AS (
            SELECT u, v FROM edges
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
          SELECT u AS doc_id, LEAST(u, MIN(v)) AS rep_id
          FROM reach GROUP BY u""",
    // the same chunk chain, with "duplicated" = the chunk string
    // exists in ANY historical (doc_id % mod <> 0) document — the
    // stored-index probe restated as the split it implements
    "dedup_cdc_incremental" ->
      s"""WITH $cdcChunkCtes,
          newc AS (SELECT doc_id, chunk FROM chunks
            WHERE doc_id % $IncrementalMod = 0),
          oldc AS (SELECT DISTINCT chunk FROM chunks
            WHERE doc_id % $IncrementalMod <> 0),
          per AS (SELECT n.doc_id,
              COUNT(*) AS n_chunks,
              CAST(SUM(CASE WHEN o.chunk IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS dup_chunks,
              CAST(SUM(CASE WHEN o.chunk IS NOT NULL THEN len(n.chunk)
                ELSE 0 END) AS BIGINT) AS dup_chars
            FROM newc n LEFT JOIN oldc o USING (chunk)
            GROUP BY n.doc_id)
          SELECT d.doc_id,
            COALESCE(per.n_chunks, 0) AS n_chunks,
            COALESCE(per.dup_chunks, 0) AS dup_chunks,
            COALESCE(per.dup_chars, 0) AS dup_chars
          FROM d LEFT JOIN per USING (doc_id)
          WHERE d.doc_id % $IncrementalMod = 0""",
    // the takedown restated as the set difference the carrier-count
    // algebra implements: historical = ingested docs MINUS the purge
    // slice; everything else is the incremental probe verbatim
    "dedup_cdc_purged" ->
      s"""WITH $cdcChunkCtes,
          newc AS (SELECT doc_id, chunk FROM chunks
            WHERE doc_id % $IncrementalMod = 0),
          oldc AS (SELECT DISTINCT chunk FROM chunks
            WHERE doc_id % $IncrementalMod <> 0
              AND NOT (doc_id % ${Similarity.PurgeMod} = ${Similarity.PurgeRes})),
          per AS (SELECT n.doc_id,
              COUNT(*) AS n_chunks,
              CAST(SUM(CASE WHEN o.chunk IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS dup_chunks,
              CAST(SUM(CASE WHEN o.chunk IS NOT NULL THEN len(n.chunk)
                ELSE 0 END) AS BIGINT) AS dup_chars
            FROM newc n LEFT JOIN oldc o USING (chunk)
            GROUP BY n.doc_id)
          SELECT d.doc_id,
            COALESCE(per.n_chunks, 0) AS n_chunks,
            COALESCE(per.dup_chunks, 0) AS dup_chunks,
            COALESCE(per.dup_chars, 0) AS dup_chars
          FROM d LEFT JOIN per USING (doc_id)
          WHERE d.doc_id % $IncrementalMod = 0""",
    // Same election restated quadratically: parallel-unnest positions,
    // blank = trim-to-empty (both engines trim the ASCII space only),
    // keeper = min packed (doc_id, pos). The oracle elects on line
    // STRINGS where the engine elects on their xxhash64 — equal modulo
    // a 2⁻⁶⁴ collision, the jaccard-family convention (see
    // shingleHashes). The rebuild filters 1-based
    // indices so blank lines survive in place; COALESCE guards
    // DuckDB's empty-list array_to_string (NULL, where Spark's
    // concat_ws over an empty array is '').
    "dedup_lines" ->
      s"""WITH l AS (SELECT doc_id, text,
            string_split(text, chr(10)) AS ls FROM documents),
          lrows AS (SELECT doc_id,
              unnest(list_transform(generate_series(1, len(ls)), i -> i - 1)) AS pos,
              unnest(ls) AS line
            FROM l),
          nb AS (SELECT doc_id, pos, line FROM lrows WHERE trim(line) <> ''),
          keep AS (SELECT line, MIN(doc_id * $LinePosCap + pos) AS keep_key
            FROM nb GROUP BY line),
          kp AS (SELECT doc_id, list(pos) AS kept
            FROM nb JOIN keep USING (line)
            WHERE doc_id * $LinePosCap + pos = keep_key
            GROUP BY doc_id),
          built AS (SELECT l.doc_id, l.text, l.ls,
              list_transform(
                list_filter(generate_series(1, len(l.ls)),
                  i -> trim(l.ls[i]) = ''
                    OR list_contains(COALESCE(kp.kept, []), i - 1)),
                i -> l.ls[i]) AS kl
            FROM l LEFT JOIN kp USING (doc_id))
          SELECT doc_id,
            COALESCE(len(ls), 0)::BIGINT AS n_lines,
            COALESCE(len(kl), 0)::BIGINT AS n_kept,
            CASE WHEN text IS NULL THEN NULL
              ELSE COALESCE(array_to_string(kl, chr(10)), '') END AS text_dedup
          FROM built""",
    "dedup_cluster" -> clusterOracle,
    // byte-identical answer contract for the stored round trip: the
    // stored path must collapse exactly the components the in-session
    // path does, so it shares the oracle STRING, not a restatement
    "dedup_cluster_stored" -> clusterOracle,
    // the takedown restated: the closure runs over pairs whose BOTH
    // endpoints survive — exactly the tombstone anti-join's pair set
    "dedup_cluster_purged" -> clusterOracleWith(
      s"""AND NOT (id_a % ${Similarity.PurgeMod} = ${Similarity.PurgeRes})
          AND NOT (id_b % ${Similarity.PurgeMod} = ${Similarity.PurgeRes})"""),
    "dedup_embedding" -> exactPairOracle(""),
    // the same exact-pair statement restricted to the id window — the
    // slice is a WHERE on the join sides, so the oracle's cost is
    // O(K²) at any corpus scale (the whole point of the window query)
    "dedup_embedding_window" ->
      exactPairOracle(s"AND a.vec_id < $EmbWindowK AND b.vec_id < $EmbWindowK"),
    // LSH semantics restated from the literal hyperplane tensor (the
    // sim_ann_lsh oracle pattern, minus the query-side multiprobe —
    // pair candidates come from the corpus-side bucket self-join):
    // identical sign-bit buckets, candidate pairs deduped across
    // tables, exact rounded-cosine verify. Deterministic, hence
    // hash-checkable even where LSH recall < 1. The CTE text is
    // SHARED with the cluster oracle below (the jaccardCte pattern) so
    // the two can never assert different pair sets.
    "dedup_embedding_lsh" ->
      s"""WITH $embLshCte
          SELECT id_a, id_b, cos_sim FROM epairs""",
    // the embLshCte shape with the incremental split: plane count
    // derived from the HISTORICAL side's row count (the index's
    // recorded sizing), buckets over each side, new×old candidates,
    // exact rounded-cosine verify
    "dedup_embedding_incremental" ->
      s"""WITH prm AS (SELECT ${Similarity.planesPrmSql(
            s"embeddings WHERE vec_id % $IncrementalMod <> 0")} AS np),
          buck AS (
            SELECT vec_id, CAST(g.t - 1 AS INT) AS tbl,
              CAST(COALESCE(list_sum(list_transform(generate_series(1, prm.np),
                p -> CASE WHEN COALESCE(list_sum(list_transform(generate_series(1, ${Similarity.Dim}),
                  i -> embedding[i]::DOUBLE * m.pl[g.t][p][i])), 0.0) >= 0
                THEN 1 << (p - 1) ELSE 0 END)), 0) AS INT) AS bucket
            FROM embeddings, (SELECT ${Similarity.planesSql} AS pl) m, prm,
              generate_series(1, ${Similarity.NumTables}) AS g(t)),
          cand AS (
            SELECT DISTINCT a.vec_id AS new_id, b.vec_id AS old_id
            FROM buck a JOIN buck b
              ON a.tbl = b.tbl AND a.bucket = b.bucket
            WHERE a.vec_id % $IncrementalMod = 0
              AND b.vec_id % $IncrementalMod <> 0)
          SELECT new_id, old_id,
            ROUND(${Similarity.sqlCos("ea.embedding", "eb.embedding")}, 4) AS cos_sim
          FROM cand JOIN embeddings ea ON ea.vec_id = new_id
                    JOIN embeddings eb ON eb.vec_id = old_id
          WHERE ROUND(${Similarity.sqlCos("ea.embedding", "eb.embedding")}, 4)
            >= $CosineThreshold""",
    // the build line dumps the same relation it builds
    "emb_pairs_build" ->
      s"""WITH $embLshCte
          SELECT id_a, id_b, cos_sim FROM epairs""",
    // the sliced build is output-identical by construction (a pair
    // arises within one table's bucket; cross-pass duplicates are
    // value-identical and fold-deduped) — same oracle
    "emb_pairs_build_sliced" ->
      s"""WITH $embLshCte
          SELECT id_a, id_b, cos_sim FROM epairs""",
    // the same plane-literal LSH pair semantics, collapsed to
    // components by a recursive transitive closure (the dedup_cluster
    // oracle pattern)
    "dedup_embedding_cluster" ->
      s"""WITH RECURSIVE $embLshCte,
          edges AS (SELECT id_a AS u, id_b AS v FROM epairs
            UNION SELECT id_b, id_a FROM epairs),
          reach(u, v) AS (
            SELECT u, v FROM edges
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
          SELECT u AS vec_id, LEAST(u, MIN(v)) AS rep_id
          FROM reach GROUP BY u""")

  /** Static oracles — the stored embedding collapse shares
    * dedup_embedding_cluster's SQL verbatim (the dedup_cluster_stored
    * byte-identical answer contract: the stored round trip may not
    * change the answer).
    */
  val oracles: Map[String, String] = baseOracles +
    ("dedup_embedding_cluster_stored" -> baseOracles("dedup_embedding_cluster"))

  /** The exact all-pairs oracle statement, with an optional extra join
    * predicate (`dedup_embedding` passes none; `dedup_embedding_window`
    * passes the id window) — one definition so the full and windowed
    * statements can never assert different pair semantics.
    */
  private def exactPairOracle(extraOn: String): String =
    s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        ROUND(list_sum(list_transform(generate_series(1, len(a.embedding)),
            i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
          / SQRT(list_sum(list_transform(generate_series(1, len(a.embedding)),
            i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
          / SQRT(list_sum(list_transform(generate_series(1, len(b.embedding)),
            i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))), 4) AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id $extraOn
        WHERE ROUND(list_sum(list_transform(generate_series(1, len(a.embedding)),
            i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
          / SQRT(list_sum(list_transform(generate_series(1, len(a.embedding)),
            i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
          / SQRT(list_sum(list_transform(generate_series(1, len(b.embedding)),
            i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))), 4)
          >= $CosineThreshold"""

  /** Shared CTE text for the embedding-LSH pair oracles: plane-literal
    * sign-bit buckets, corpus-side candidate self-join, exact
    * rounded-cosine verify at [[CosineThreshold]] — one definition so
    * the pair oracle and the cluster oracle state the identical pair
    * set (the [[jaccardCte]] pattern).
    */
  private def embLshCte: String =
    s"""prm AS (SELECT ${Similarity.planesPrmSql()} AS np),
        buck AS (
          SELECT vec_id, CAST(g.t - 1 AS INT) AS tbl,
            CAST(COALESCE(list_sum(list_transform(generate_series(1, prm.np),
              p -> CASE WHEN COALESCE(list_sum(list_transform(generate_series(1, ${Similarity.Dim}),
                i -> embedding[i]::DOUBLE * m.pl[g.t][p][i])), 0.0) >= 0
              THEN 1 << (p - 1) ELSE 0 END)), 0) AS INT) AS bucket
          FROM embeddings, (SELECT ${Similarity.planesSql} AS pl) m, prm,
            generate_series(1, ${Similarity.NumTables}) AS g(t)),
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM buck a JOIN buck b
            ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
        epairs AS (
          SELECT id_a, id_b,
            ROUND(${Similarity.sqlCos("ea.embedding", "eb.embedding")}, 4) AS cos_sim
          FROM cand JOIN embeddings ea ON ea.vec_id = id_a
                    JOIN embeddings eb ON eb.vec_id = id_b
          WHERE ROUND(${Similarity.sqlCos("ea.embedding", "eb.embedding")}, 4)
            >= $CosineThreshold)"""

  /** Trained-state oracle for `dedup_semantic` (the last rows-only
    * query of the family): the shared centroid-literal CTEs from
    * [[Similarity.ivfOracleCtes]] reproduce the cell assignment, then
    * plain SQL restates the per-cell lower-id-mate drop rule and the
    * anti-join. Generated at Verify time (see Similarity's dynamic-
    * oracle note: only the centroid VALUES come from the Spark side;
    * assignment, pairing, cosine, and the kept set are recomputed
    * independently by DuckDB).
    */
  def dynamicOracles(s: SparkSession, d: String): Map[String, String] = {
    val (ctes, _) = Similarity.ivfOracleCtes(s, d)
    // the incremental/purged forms assign through the SLICE-trained
    // frozen quantizer, so their CTEs carry ITS centroid literals —
    // shared with the declared queries' session cache by cacheKey, so
    // one training run feeds both sides (the centroidLiterals
    // contract)
    val (semCtes, _) = Similarity.ivfOracleCtesOf(Similarity.centroidLiteralsOf(
      Similarity.ivfCentroidsFor(s, d, SemanticHistoricalPred, "semhist")))
    def semIncrSql(histExtra: String): String =
      s"""WITH $semCtes,
          dropped AS (
            SELECT DISTINCT b.vec_id
            FROM asg a JOIN asg b ON a.cell = b.cell
            JOIN embeddings ea ON ea.vec_id = a.vec_id
            JOIN embeddings eb ON eb.vec_id = b.vec_id
            WHERE a.vec_id % $IncrementalMod <> 0
              AND b.vec_id % $IncrementalMod = 0
              $histExtra
              AND ROUND(${Similarity.sqlCos("ea.embedding", "eb.embedding")}, 4)
                >= $SemanticThreshold)
          SELECT e.vec_id FROM embeddings e
          WHERE e.vec_id % $IncrementalMod = 0
            AND e.vec_id NOT IN (SELECT vec_id FROM dropped)"""
    Map(
      "dedup_semantic" ->
        s"""WITH $ctes,
            dropped AS (
              SELECT DISTINCT b.vec_id
              FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
              JOIN embeddings ea ON ea.vec_id = a.vec_id
              JOIN embeddings eb ON eb.vec_id = b.vec_id
              WHERE ROUND(${Similarity.sqlCos("ea.embedding", "eb.embedding")}, 4)
                >= $SemanticThreshold)
            SELECT e.vec_id FROM embeddings e
            WHERE e.vec_id NOT IN (SELECT vec_id FROM dropped)""",
      "dedup_semantic_incremental" -> semIncrSql(""),
      "dedup_semantic_purged" -> semIncrSql(
        s"AND NOT (a.vec_id % ${Similarity.PurgeMod} = ${Similarity.PurgeRes})"))
  }
}
