package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Approximate-nearest-neighbor search over the embeddings table
  * (builder brief): brute-force cosine top-k as the exact baseline,
  * and a random-hyperplane LSH bucketed variant as the scale path.
  *
  * Scale design: brute-force is a broadcast of the (small) query set
  * against a partitioned scan of the corpus — no shuffle of the corpus
  * itself; the per-query top-k is a windowed rank over query-keyed
  * partitions. The LSH path buckets the corpus once (narrow), then
  * probes only matching buckets, turning O(|Q|·n) distance evaluations
  * into O(|Q|·bucket). Hyperplanes are a deterministic seeded matrix
  * compiled into the plan as literals — no driver-side state, no
  * nondeterminism across executors.
  */
object Similarity {

  val TopK = 5
  /** Queries = every 100th vector; small, broadcastable. */
  val QueryStride = 100

  /** Deterministic purge slice for the *_purged queries: ids ≡
    * [[PurgeRes]] (mod [[PurgeMod]]) are DELETED from the stored index
    * before probing — ~6% of the corpus, coprime with [[QueryStride]]
    * so some purged ids are also queries (a deleted vector must stop
    * appearing as a NEIGHBOR while still being allowed to ask).
    */
  val PurgeMod = 17L
  val PurgeRes = 3L

  /** Multi-table random-hyperplane LSH (seed 42): `NumTables`
    * independent tables of an OCCUPANCY-ADAPTIVE number of sign bits
    * each. More tables → higher recall; more planes/table → smaller
    * buckets. Literal arrays so every executor compiles the same plan
    * with zero closure shipping.
    *
    * The plane count per table is derived from the corpus size, not
    * fixed: a fixed count makes per-bucket occupancy — and so
    * within-bucket candidate PAIRS, which grow with occupancy² — scale
    * linearly (quadratically) with the corpus, the measured 21.5×
    * sf0.1→sf1 curve of emb_pairs_build under the old `PlanesPerTable
    * = 6`. [[adaptivePlanes]] instead holds occupancy at
    * [[TargetBucketRows]] by choosing the smallest p in
    * [[MinPlanes]]..[[MaxPlanes]] with 2^p · TargetBucketRows ≥ n —
    * i.e. planes ≈ log₂(n / target), the standard hyperplane-LSH
    * sizing rule and the same derive-from-n discipline as
    * [[ivfK]]'s √n cells. Integer-exact (shift-and-compare, no
    * floating log whose ulps could disagree with the oracle's SQL
    * restatement at power-of-two boundaries); the DuckDB oracles
    * recompute the identical p from COUNT(*) ([[planesPrmSql]]), so
    * hash-exactness survives the sizing being dynamic. The recall
    * trade (more planes → lower per-table collision probability for
    * true near-dups) is paid once in tables/multiprobe width, not per
    * corpus doubling: at the near-dup thresholds this path is built
    * for, collision probability per plane is ≈ 0.82, so even 24
    * planes keep ≥8-table-with-multiprobe recall useful, and the
    * verify step is exact either way. [[MaxPlanes]] = 24 holds the
    * target occupancy to ~536 M vectors; a larger deployment raises
    * the cap (one constant — the seeded tensor just grows).
    */
  val NumTables = 8
  val MinPlanes = 2
  val MaxPlanes = 24
  /** Per-table bucket-occupancy target: ≈ n/2^p rows per bucket. 32
    * reproduces the round-10 hand sizing at sf0.1 (2000 vectors → 6
    * planes, ≈31 rows/bucket) so the bench-SF behavior is unchanged;
    * what changes is that 10× data now gets +3..4 planes instead of
    * 10× occupancy.
    */
  val TargetBucketRows = 32
  val Dim = 64

  /** Smallest p in [MinPlanes, MaxPlanes] with 2^p·TargetBucketRows ≥
    * n (= clamp(⌈log₂(n/TargetBucketRows)⌉)) — the ONE place the
    * sizing rule lives; [[planesPrmSql]] is its SQL restatement.
    */
  def adaptivePlanes(n: Long): Int = {
    var p = MinPlanes
    while (p < MaxPlanes && (1L << p) * TargetBucketRows < n) p += 1
    p
  }

  /** [[adaptivePlanes]] restated for DuckDB as a scalar subquery on
    * the same corpus the oracle scans — integer shift-and-compare, so
    * both engines derive the identical plane count from the identical
    * row count (no float log). COALESCE supplies the MaxPlanes clamp
    * when no p in range satisfies the bound.
    */
  def planesPrmSql(tbl: String = "embeddings"): String =
    s"""COALESCE((SELECT MIN(p) FROM generate_series($MinPlanes, $MaxPlanes) s(p)
        WHERE (1::BIGINT << p) * $TargetBucketRows >= (SELECT COUNT(*) FROM $tbl)), $MaxPlanes)"""

  lazy val planes: Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(NumTables, MaxPlanes, Dim)(rnd.nextGaussian())
  }

  /** The hyperplane tensor as a DuckDB list literal (tables × planes ×
    * dims), the same trick as [[Embeddings.projMatrixSql]]: the oracle
    * computes the identical sign-bit buckets from the identical seeded
    * doubles, which is what lets `lsh_build` be hash-checked instead of
    * rows-only. Double.toString round-trips to the same 64-bit value in
    * DuckDB, so both engines compare the same dot product against zero.
    */
  lazy val planesSql: String =
    planes.map(_.map(_.mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")).mkString("[", ", ", "]")

  private[operators] def corpus(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d).select($"vec_id", $"embedding",
      graft.functions.VectorFunctions.norm($"embedding").as("nrm"))
  }

  private[operators] def querySet(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    corpus(s, d).filter($"vec_id" % QueryStride === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"nrm".as("q_nrm"))
  }

  /** The declared purge slice (see [[PurgeMod]]) — id-only, the shape
    * a takedown feed delivers.
    */
  private def purgeIds(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d).select($"vec_id")
      .filter($"vec_id" % PurgeMod === PurgeRes)
  }

  /** Packed (table << 32 | bucket) signature longs per embedding — one
    * entry per hash table, ready to explode into the probe join. A
    * native codegen expression ([[graft.plans.LshBuckets]]): one
    * primitive pass over all tables×planes straight off ArrayData (48
    * interpreted Catalyst HOF dots per vector was the ANN path's
    * original hot spot; the UDF that replaced them still paid a
    * Seq[Float] → Seq[(Int,Int)] encoder round trip per row — gone
    * here, like the minhash/ngram/vector kernels before it).
    * `numPlanes` (from [[adaptivePlanes]]) selects the leading sign
    * bits of each table's seeded plane stack — compiled into the plan
    * as a literal, so the kernel stays branch-free per row.
    */
  def lshBucketsPacked(emb: org.apache.spark.sql.Column,
      numPlanes: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.LshBuckets(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(emb), numPlanes))

  /** The adaptive plane count for a corpus dir — one metadata-cheap
    * COUNT per (session, corpus), cached like the indexes it sizes.
    * Deterministic in the corpus, so index build, probe, and the
    * DuckDB oracle all derive the same p independently.
    */
  private val lshPlanesCache = new SessionCache[Integer]()
  def lshPlanes(s: SparkSession, d: String): Int =
    lshPlanesCache.getOrBuild(s, d)(Integer.valueOf(
      adaptivePlanes(Tables.embeddings(s, d).count()))).intValue

  private[operators] def unpackTable(p: org.apache.spark.sql.Column) =
    shiftrightunsigned(p, 32).cast("int")
  private[operators] def unpackBucket(p: org.apache.spark.sql.Column) =
    p.bitwiseAND(lit(0xffffffffL)).cast("int")

  /** Radius for [[rangeSearch]]: the declared threshold keeps ~140
    * pairs at sf0.01 on the isotropic fixture (non-trivial but
    * bounded); a production near-dup radius (≥0.85) is a parameter
    * away and the plan is unchanged.
    */
  val RangeRadius = 0.2

  /** Threshold (range) search — the radius-query sibling of top-k:
    * every corpus vector within cosine >= `radius` of each query. One
    * broadcast-join scan and a row-local filter on the ROUNDED score —
    * no window, no shuffle at all (top-k needs a per-query rank; range
    * search doesn't), so it scales as |Q| fused multiply-adds per
    * corpus row and emits matches in place. The gate compares the
    * rounded cosine (repo threshold convention) so both engines keep
    * the identical pair set.
    */
  def rangeSearch(s: SparkSession, d: String,
      radius: Double = RangeRadius): DataFrame = {
    import s.implicits._
    import graft.functions.VectorFunctions
    broadcast(querySet(s, d))
      .join(corpus(s, d), $"q_id" =!= $"vec_id")
      .select($"q_id", $"vec_id".as("n_id"),
        round(VectorFunctions.cosineFrom(
          VectorFunctions.dot($"q_emb", $"embedding"), $"q_nrm", $"nrm"),
          4).as("cos_sim"))
      .filter($"cos_sim" >= radius)
  }

  /** Bounded per-key top-k buffer for [[winnowTopPerKey]]: insertion
    * under EXACTLY Spark's sort order for `score DESC, id ASC` —
    * java.lang.Double total order (NaN greatest, so NaN ranks FIRST
    * descending, matching the window the winnow feeds), id ascending
    * on ties. Most rows fail the k-th-slot check in one compare.
    */
  private[operators] final class TopBuf(k: Int) {
    private val sims = new Array[Double](k)
    private val ids = new Array[Long](k)
    var size = 0
    private def before(aS: Double, aI: Long, bS: Double, bI: Long): Boolean = {
      val c = java.lang.Double.compare(aS, bS)
      c > 0 || (c == 0 && aI < bI)
    }
    def insert(sc: Double, id: Long): Unit = {
      if (size == k && !before(sc, id, sims(size - 1), ids(size - 1))) return
      var pos = if (size == k) size - 1 else size
      while (pos > 0 && before(sc, id, sims(pos - 1), ids(pos - 1))) {
        sims(pos) = sims(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
      }
      sims(pos) = sc; ids(pos) = id
      size = math.min(size + 1, k)
    }
    def foreach(f: (Double, Long) => Unit): Unit = {
      var i = 0
      while (i < size) { f(sims(i), ids(i)); i += 1 }
    }
  }

  /** Per-partition top-k winnow for the |Q|·n scoring streams: the
    * windowed `row_number().over(partitionBy(q_id))` rank is exact but
    * EXCHANGES AND SORTS every scored row — at 100× bench scale the
    * coarse stages score |Q|·n ≈ 4·10⁸ rows, and the rank window's
    * full shuffle+sort spilled for minutes (the sim_ann_pca sf10
    * measurement). The winnow keeps, inside each upstream task, a
    * bounded per-query buffer ([[TopBuf]]: |Q| × k entries — a few MB)
    * and emits only per-partition winners, ≤ partitions · |Q| · k
    * rows; the rank window then runs over that bounded relation.
    * EXACT by the superset argument: every global top-k row is a
    * top-k row of its own partition under the identical
    * (score DESC total order, id ASC) comparator, so no winner is
    * winnowed away — the downstream window sees everything it would
    * have ranked into the top k.
    */
  private[operators] def winnowTopPerKey(scored: DataFrame, k: Int): DataFrame = {
    val s = scored.sparkSession
    import s.implicits._
    val cols = scored.columns
    scored.as[(Long, Long, Double)].mapPartitions { it =>
      val heaps = new java.util.HashMap[Long, TopBuf]()
      it.foreach { case (q, i, sc) =>
        var b = heaps.get(q)
        if (b == null) { b = new TopBuf(k); heaps.put(q, b) }
        b.insert(sc, i)
      }
      val out = Vector.newBuilder[(Long, Long, Double)]
      heaps.forEach((q, buf) => buf.foreach((sc, i) => out += ((q, i, sc))))
      out.result().iterator
    }.toDF(cols.toIndexedSeq: _*)
  }

  /** The coarse projected scan behind [[coarseFineTopk]]: every
    * corpus row scored against the collected query matrix inside one
    * mapPartitions (see the call-site comment for why this beats the
    * broadcast join + rank window by orders of magnitude at scale).
    * `pv` is cast to ARRAY<DOUBLE> first — a float widens exactly, so
    * the JL (float) and PCA (double) indexes share one kernel with
    * bit-identical products either way.
    */
  private[operators] def coarseScanTopC(s: SparkSession, d: String,
      idx: DataFrame, candidates: Int): DataFrame = {
    import s.implicits._
    val prj = idx.select($"vec_id", $"pv".cast("array<double>").as("pv"), $"pn")
    val qRows = prj.filter($"vec_id" % QueryStride === 0)
      .as[(Long, Array[Double], Double)].collect().sortBy(_._1)
    val bc = s.sparkContext.broadcast(qRows)
    val n = rowCount(s, Tables.embeddings(s, d))
    val src = widenIfStarved(s, prj,
      qRows.length.toDouble * n * 16, $"vec_id", Tables.embeddings(s, d))
    src.as[(Long, Array[Double], Double)].mapPartitions { it =>
      val qs = bc.value
      val bufs = Array.fill(qs.length)(new TopBuf(candidates))
      it.foreach { case (vid, pv, pn) =>
        if (pv != null) {
          var qi = 0
          while (qi < qs.length) {
            val q = qs(qi)
            if (q._1 != vid) {
              val qpv = q._2
              var dot = 0.0
              var i = 0
              val m = math.min(qpv.length, pv.length)
              while (i < m) { dot += qpv(i) * pv(i); i += 1 }
              bufs(qi).insert(dot / q._3 / pn, vid)
            }
            qi += 1
          }
        }
      }
      val out = Vector.newBuilder[(Long, Long, Double)]
      var qi = 0
      while (qi < qs.length) {
        val qid = qs(qi)._1
        bufs(qi).foreach((sc, id) => out += ((qid, id, sc)))
        qi += 1
      }
      out.result().iterator
    }.toDF("q_id", "n_id", "proj_sim")
  }

  /** Brute-force top-k: broadcast queries × corpus scan → rounded
    * cosine → per-partition winnow → windowed rank over the winners
    * (rounded score + neighbor id tiebreak so the result is
    * engine-independent; the winnow is output-invariant, see
    * [[winnowTopPerKey]]).
    */
  def topkBruteForce(s: SparkSession, d: String, k: Int = TopK): DataFrame = {
    import s.implicits._
    import graft.functions.VectorFunctions
    val n = rowCount(s, Tables.embeddings(s, d))
    val scored = broadcast(querySet(s, d))
      .join(widenIfStarved(s, corpus(s, d),
        (n.toDouble / QueryStride) * n * Dim, $"vec_id"),
        $"q_id" =!= $"vec_id")
      .select($"q_id", $"vec_id".as("n_id"),
        round(VectorFunctions.cosineFrom(
          VectorFunctions.dot($"q_emb", $"embedding"), $"q_nrm", $"nrm"),
          4).as("cos_sim"))
    val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"n_id".asc)
    winnowTopPerKey(scored, k)
      .withColumn("rank", row_number().over(w)).filter($"rank" <= k)
      .select($"q_id", $"n_id", $"cos_sim", $"rank".cast("int").as("rank"))
  }

  /** Negatives per anchor for [[hardNegatives]] — the contrastive-
    * training convention of a handful of hard negatives per positive.
    */
  val HardNegK = 10

  /** Hard-negative mining for contrastive training (the retrieval /
    * embedding-finetune pipeline step): for each anchor in the query
    * slice, the [[HardNegK]] highest-cosine corpus vectors whose LABEL
    * differs — near the anchor in embedding space but semantically
    * wrong, exactly the negatives a contrastive loss learns most from
    * (the in-batch-negatives upgrade every dense-retrieval recipe
    * ships). Same scale shape as [[topkBruteForce]]: broadcast anchor
    * set × one corpus scan, label inequality applied AT the scan (no
    * post-rank refill — the top-k is over the already-filtered
    * stream), winnowed per-anchor top-k, labels rejoined onto the
    * |Q|·k result afterwards so the scored stream stays 3 columns
    * wide. Exact (rounded-cosine + id total order), oracle-restated.
    */
  def hardNegatives(s: SparkSession, d: String, k: Int = HardNegK): DataFrame = {
    import s.implicits._
    import graft.functions.VectorFunctions
    val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding",
      VectorFunctions.norm($"embedding").as("nrm"), $"label")
    val q = emb.filter($"vec_id" % QueryStride === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"),
        $"nrm".as("q_nrm"), $"label".as("q_label"))
    // the topkBruteForce row-group-starvation widen: the |Q|·n scored
    // stream must run as wide as the machine, not as wide as the
    // parquet's row-group count (measured: without it the sf10 scan
    // sat on a handful of tasks — 485 s vs 34 s widened)
    val n = rowCount(s, Tables.embeddings(s, d))
    val scored = broadcast(q)
      .join(widenIfStarved(s, emb,
        (n.toDouble / QueryStride) * n * Dim, $"vec_id"),
        $"q_id" =!= $"vec_id" && $"q_label" =!= $"label")
      .select($"q_id", $"vec_id".as("n_id"),
        round(VectorFunctions.cosineFrom(
          VectorFunctions.dot($"q_emb", $"embedding"), $"q_nrm", $"nrm"),
          4).as("cos_sim"))
    val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"n_id".asc)
    val ranked = winnowTopPerKey(scored, k)
      .withColumn("rank", row_number().over(w)).filter($"rank" <= k)
    val labels = Tables.embeddings(s, d).select($"vec_id", $"label")
    ranked
      .join(labels.select($"vec_id".as("q_id"), $"label".as("q_label")), Seq("q_id"))
      .join(labels.select($"vec_id".as("n_id"), $"label".as("n_label")), Seq("n_id"))
      .select($"q_id", $"q_label", $"n_id", $"n_label", $"cos_sim",
        $"rank".cast("int").as("rank"))
  }

  /** ANN-probed hard-negative mining — the deployment form of
    * [[hardNegatives]]: the exact miner is O(n²/stride) by
    * construction (measured 5.7×/decade — correct, honestly priced,
    * and not runnable at 100 TB), while every real contrastive
    * pipeline mines from the ANN index it already maintains (the DPR /
    * sentence-transformers recipe). Anchors probe a STORED IVF index
    * whose assignments carry the LABEL column, so the label-inequality
    * filter runs AT the cell-pruned scan — the top-k ranks the
    * already-filtered candidate stream (no post-rank refill), exactly
    * like the exact miner, just over the probed cells instead of the
    * whole corpus. Scores on returned pairs are EXACT rounded cosines
    * (approximation affects candidate coverage only); per-anchor cost
    * is nprobe cells' occupancy, not n — the same probe economics as
    * `sim_ann_ivf_stored`, whose quantizer/probe policy this shares
    * verbatim (one oracle restatement serves both). Recall vs the
    * exact miner is a NOTES table, the sim_recall_eval discipline.
    */
  def hardNegativesAnn(s: SparkSession, d: String,
      k: Int = HardNegK): DataFrame = {
    val dir = storedQueryDir("hardneg", d)
    writeHardNegIndex(s, d, dir)
    hardNegativesAnnStored(s, d, dir, k)
  }

  /** Append NEW labeled vectors to a stored hard-negative index
    * WITHOUT retraining — the nightly-ingest half of its lifecycle,
    * the [[appendToIvfIndex]] contract verbatim (frozen coarse
    * quantizer, appended cell files, occupancy refreshed crash-safe)
    * with the label riding each assignment row. Batch schema:
    * (vec_id, embedding, label); ids disjoint from stored ones.
    */
  def appendToHardNegIndex(s: SparkSession, indexDir: String,
      batch: DataFrame): Unit = {
    import s.implicits._
    val centRows = s.read.parquet(s"$indexDir/centroids")
      .select($"cell", $"centroid", $"cnrm", $"occupancy")
      .as[(Long, Seq[Float], Double, Long)].collect().sortBy(_._1)
    val cents = centRows.map { case (cid, cv, cn, _) => (cid, cv.toArray, cn) }
    val cells = nearestCellsCol(cents, 1) _
    val assigned = batch
      .select($"vec_id", $"embedding",
        graft.functions.VectorFunctions.norm($"embedding").as("nrm"),
        $"label".cast("int").as("label"))
      .withColumn("cell", explode(cells($"embedding")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val delta = assigned.groupBy($"cell").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
      assigned.select($"vec_id", $"embedding", $"nrm", $"label", $"cell")
        .repartition($"cell")
        .write.mode("append").partitionBy("cell")
        .parquet(s"$indexDir/assignments")
      val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/centroids_updating")
      centRows.toSeq
        .map { case (cid, cv, cn, occ) =>
          (cid, cv, cn, occ + delta.getOrElse(cid, 0L)) }
        .toDF("cell", "centroid", "cnrm", "occupancy")
        .write.mode("overwrite").parquet(tmp.toString)
      swapDirInto(s, tmp,
        new org.apache.hadoop.fs.Path(s"$indexDir/centroids"))
    } finally assigned.unpersist(blocking = false)
  }

  /** Physically purge tombstoned ids from a stored hard-negative
    * index — [[compactIvfIndex]]'s contract with the label column
    * carried through the rewrite: distributed sibling rewrite minus
    * tombstones, occupancy refreshed, trained centroids untouched,
    * tombstones cleared LAST (idempotent under crash).
    */
  def compactHardNegIndex(s: SparkSession, indexDir: String): Unit = {
    import s.implicits._
    val src = new org.apache.hadoop.fs.Path(s"$indexDir/assignments")
    val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/assignments_compacting")
    minusTombstones(s, indexDir,
        s.read.schema(hardNegAssignmentsSchema)
          .parquet(s"$indexDir/assignments"))
      .select($"vec_id", $"embedding", $"nrm", $"label", $"cell")
      .repartition($"cell")
      .write.mode("overwrite").partitionBy("cell").parquet(tmp.toString)
    val counts = s.read.schema(hardNegAssignmentsSchema)
      .parquet(tmp.toString)
      .groupBy($"cell").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val centRows = s.read.parquet(s"$indexDir/centroids")
      .select($"cell", $"centroid", $"cnrm")
      .as[(Long, Seq[Float], Double)].collect().sortBy(_._1)
    swapDirInto(s, tmp, src)
    val ctmp = new org.apache.hadoop.fs.Path(s"$indexDir/centroids_updating")
    centRows.toSeq
      .map { case (cid, cv, cn) => (cid, cv, cn, counts.getOrElse(cid, 0L)) }
      .toDF("cell", "centroid", "cnrm", "occupancy")
      .write.mode("overwrite").parquet(ctmp.toString)
    swapDirInto(s, ctmp,
      new org.apache.hadoop.fs.Path(s"$indexDir/centroids"))
    val tp = new org.apache.hadoop.fs.Path(tombstonesPath(indexDir))
    tp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(tp, true)
  }

  /** Mining probes 2× wider than serving: a missed near-neighbor in
    * search costs one result row; a missed hard negative costs
    * training signal, and mining is an offline batch job where the
    * extra cells are cheap (probe cost stays ∝ probed occupancy,
    * corpus-size-independent). Shared with the dynamic oracle so the
    * two cannot drift — measured recall vs the exact miner: 0.74 →
    * 1.00 (sf0.001), 0.72 → 0.98 (sf0.01) at 2× (NOTES r15 table).
    */
  val HardNegProbeBoost = 2

  def hardNegNProbe(k: Int, cellCounts: Array[Long]): Int =
    math.min(k, defaultNProbe(k, cellCounts) * HardNegProbeBoost)

  /** Write the label-carrying IVF index for [[hardNegativesAnn]]:
    * the shared session quantizer's assignments (identical cells to
    * `ivf_build` — same centroids, same kernel) joined with the
    * corpus labels ONCE at build time, partitioned by cell. Paying
    * the corpus-sized label join here is the point: probes filter on
    * a stored column instead of re-joining labels per batch.
    */
  def writeHardNegIndex(s: SparkSession, d: String, outDir: String): Unit = {
    import s.implicits._
    val idx = ivfIndex(s, d)
    idx.assigned.select($"vec_id", $"embedding", $"nrm", $"cell")
      .join(Tables.embeddings(s, d).select($"vec_id", $"label"), Seq("vec_id"))
      .repartition($"cell")
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$outDir/assignments")
    idx.cents.toSeq
      .map { case (cid, cv, cn) =>
        (cid, cv.toSeq, cn, idx.cellCounts(cid.toInt)) }
      .toDF("cell", "centroid", "cnrm", "occupancy")
      .write.mode("overwrite").parquet(s"$outDir/centroids")
  }

  private val hardNegAssignmentsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("vec_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("embedding",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType)),
    org.apache.spark.sql.types.StructField("nrm",
      org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("label",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("cell",
      org.apache.spark.sql.types.LongType)))

  /** Mine from a stored label-carrying index (the steady-state job):
    * cell-pruned scan → label filter at the scan → exact cosine →
    * winnowed per-anchor top-k; tombstoned ids anti-joined like every
    * stored reader. Output schema matches [[hardNegatives]] exactly
    * (labels rejoined onto the |Q|·k result, keeping the scored
    * stream 3 columns wide).
    */
  def hardNegativesAnnStored(s: SparkSession, d: String, indexDir: String,
      k: Int = HardNegK): DataFrame = {
    import s.implicits._
    import graft.functions.VectorFunctions
    val anchors = Tables.embeddings(s, d)
      .filter($"vec_id" % QueryStride === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"),
        VectorFunctions.norm($"embedding").as("q_nrm"),
        $"label".as("q_label"))
    hardNegativesAnnFor(s, d, indexDir, anchors, k)
  }

  /** The miner for an ARBITRARY anchor relation
    * (q_id, q_emb, q_nrm, q_label) — the serving entry point (the
    * topkLshStoredFor convention): a micro-batch of fresh training
    * anchors, a backfill slice, a different stride — all probe the
    * same stored index through the same cell-pruned, label-filtered
    * scan.
    */
  def hardNegativesAnnFor(s: SparkSession, d: String, indexDir: String,
      anchors: DataFrame, k: Int = HardNegK): DataFrame = {
    import s.implicits._
    import graft.functions.VectorFunctions
    val centRows = s.read.parquet(s"$indexDir/centroids")
      .select($"cell", $"centroid", $"cnrm", $"occupancy")
      .as[(Long, Seq[Float], Double, Long)].collect().sortBy(_._1)
    val cents = centRows.map { case (cid, cv, cn, _) => (cid, cv.toArray, cn) }
    val np = hardNegNProbe(cents.length, centRows.map(_._4))
    val assigned = minusTombstones(s, indexDir,
      s.read.schema(hardNegAssignmentsSchema)
        .parquet(s"$indexDir/assignments"))
    val probe = nearestCellsCol(cents, np) _
    val qCells = anchors.select($"q_id", $"q_emb", $"q_nrm", $"q_label",
      explode(probe($"q_emb")).as("cell"))
    val scored = broadcast(qCells)
      .join(assigned, Seq("cell"))
      .filter($"q_id" =!= $"vec_id" && $"q_label" =!= $"label")
      .select($"q_id", $"vec_id".as("n_id"),
        round(VectorFunctions.cosineFrom(
          VectorFunctions.dot($"q_emb", $"embedding"), $"q_nrm", $"nrm"),
          4).as("cos_sim"))
    val ranked = winnowTopPerKey(scored, k)
      .withColumn("rank", row_number().over(
        Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"n_id".asc)))
      .filter($"rank" <= k)
    // q_label comes from the ANCHOR relation (anchors need not be
    // corpus rows — the serving contract); n_label from the INDEX
    // itself (a 2-column pruned read of the assignments), so appended
    // vectors — index rows with no corpus counterpart — keep their
    // labels in the output too
    ranked
      .join(broadcast(anchors.select($"q_id", $"q_label").distinct()),
        Seq("q_id"))
      .join(s.read.schema(hardNegAssignmentsSchema)
        .parquet(s"$indexDir/assignments")
        .select($"vec_id".as("n_id"), $"label".as("n_label")), Seq("n_id"))
      .select($"q_id", $"q_label", $"n_id", $"n_label", $"cos_sim",
        $"rank".cast("int").as("rank"))
  }

  /** RRF fusion constant (Cormack et al., SIGIR'09 — the standard 60). */
  val RrfK0 = 60

  /** Hybrid retrieval — the production search deployment shape:
    * a DENSE ranking (embedding cosine) and a LEXICAL ranking (exact
    * word-3-gram Jaccard over the DF-bounded inverted index — the
    * BM25-class signal for doc-to-doc retrieval) fused by reciprocal
    * rank (score = Σ 1/(k₀+rank), a missing side contributes 0).
    * Lexical catches verbatim/boilerplate overlap the embedding
    * smooths over; dense catches paraphrase the lexical side can't
    * see — fusion beats either alone, which is why hybrid is the
    * retrieval default. The two leg rankings are the DECLARED
    * queries' machinery verbatim (the brute-force top-k and the
    * build-once pair relation), so the fusion adds only bounded
    * |Q|·k-row joins: documents and embeddings share the id space
    * (the TESTDATA contract — vec_id ≡ doc_id), rankings are
    * rounded-score + id ordered on both engines, and the fused score
    * is a 2-term sum rounded(6).
    */
  def hybridRrf(s: SparkSession, d: String, k: Int = TopK): DataFrame = {
    import s.implicits._
    val dense = topkBruteForce(s, d, k)
      .select($"q_id", $"n_id", $"rank".as("r_dense"))
    rrfFuse(s, dense, lexRanked(s, Dedup.jaccardPairs(s, d), k), k)
  }

  /** The lexical leg: the (undirected) verified-jaccard pair relation
    * oriented both ways, query-strided, ranked per query. Shared by
    * the session and stored hybrid paths so the leg semantics cannot
    * fork.
    */
  private def lexRanked(s: SparkSession, pairs: DataFrame,
      k: Int, qMod: Long = QueryStride): DataFrame = {
    import s.implicits._
    pairs
      .select($"id_a".as("q_id"), $"id_b".as("n_id"), $"jaccard")
      .union(pairs.select($"id_b".as("q_id"), $"id_a".as("n_id"), $"jaccard"))
      .filter($"q_id" % qMod === 0)
      .withColumn("r_lex", row_number().over(Window.partitionBy($"q_id")
        .orderBy(round($"jaccard", 6).desc, $"n_id".asc)))
      .filter($"r_lex" <= k)
      .select($"q_id", $"n_id", $"r_lex")
  }

  /** The RRF fusion tail — one definition (the rerankTail discipline):
    * full-outer join of the two bounded |Q|·k leg rankings, a missing
    * side contributes 0, rounded(6) before the final rank.
    */
  private def rrfFuse(s: SparkSession, dense: DataFrame, lex: DataFrame,
      k: Int): DataFrame = {
    import s.implicits._
    dense.join(lex, Seq("q_id", "n_id"), "full_outer")
      .select($"q_id", $"n_id",
        round(coalesce(lit(1.0) / (lit(RrfK0) + $"r_dense"), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK0) + $"r_lex"), lit(0.0)), 6)
          .as("rrf"))
      .withColumn("rank", row_number().over(Window.partitionBy($"q_id")
        .orderBy($"rrf".desc, $"n_id".asc)))
      .filter($"rank" <= k)
      .select($"q_id", $"n_id", $"rrf", $"rank".cast("int").as("rank"))
  }

  /** Hybrid retrieval served from STORED artifacts — the RAG
    * deployment form of [[hybridRrf]] (indexes built by one nightly
    * job, fused at query time by another): the dense leg is the
    * stored-LSH probe — APPROXIMATE, the latency/recall trade every
    * hybrid deployment makes, and the reason this is a separate
    * declared query with its own oracle (the session query's exact
    * brute-force leg stays the reference) — the lexical leg the
    * stored verified-jaccard pair relation, both through the shared
    * leg/fusion definitions above. Per-query cost: one bucket-pushed
    * probe + a shard-pruned pair read + two |Q|·k-bounded joins.
    */
  def hybridRrfStored(s: SparkSession, d: String, lshDir: String,
      pairsDir: String, k: Int = TopK): DataFrame = {
    import s.implicits._
    val dense = topkLshStored(s, d, lshDir, k)
      .select($"q_id", $"n_id", $"rank".cast("int").as("r_dense"))
    rrfFuse(s, dense, lexRanked(s, Dedup.readJaccardPairs(s, pairsDir), k), k)
  }

  /** Serve-slice modulus for sim_hybrid_serve: queries ≡ 0 (mod this)
    * — a strict sub-slice of the declared query set (a multiple of
    * [[QueryStride]]), modeling the per-request shape where a RAG
    * deployment answers a FEW queries from pre-built artifacts. Cost
    * scales with the request slice (probe fan-out + |slice|·k joins),
    * never with the corpus or the nightly build.
    */
  val HybridServeMod = 300L

  /** The query-time half of the hybrid lifecycle, serve-isolated (the
    * txt_bm25_serve convention): probe PRE-BUILT stored artifacts —
    * dense leg through the stored-LSH pushdown probe, lexical leg off
    * the stored pair relation — and fuse with the SHARED RRF tail.
    * Nothing is built here: the artifacts come from the build line
    * ([[queries hybrid_build]] / the session [[hybridArtifacts]]), so
    * the bench line for this query is the per-request serving cost a
    * deployment pays, not the nightly build sim_hybrid_stored's line
    * historically carried. Per-query independence makes the oracle
    * exactly the stored restatement filtered to the slice.
    */
  def hybridRrfServe(s: SparkSession, d: String, lshDir: String,
      pairsDir: String, k: Int = TopK): DataFrame = {
    import s.implicits._
    val slice = querySet(s, d).filter($"vec_id" % HybridServeMod === 0)
    val dense = topkLshStoredFor(s, slice, lshDir, k)
      .select($"q_id", $"n_id", $"rank".cast("int").as("r_dense"))
    rrfFuse(s, dense,
      lexRanked(s, Dedup.readJaccardPairs(s, pairsDir), k, HybridServeMod), k)
  }

  /** LSH-bucketed ANN: bucket corpus + queries, probe only the query's
    * bucket, rank within candidates. Approximate by construction
    * (recall < 1 when true neighbors land in other buckets).
    */
  // Query-side multiprobe: in each table, also probe the buckets at
  // Hamming distance 1 from the query signature (the planes whose
  // hyperplane the query sits closest to are the likeliest sign
  // flips; probing all single flips is the simple, deterministic
  // form). Corpus stays bucketed once — only the probe fan-out grows.
  // Flip count = the table's (adaptive) plane count, so multiprobe
  // width follows the sizing automatically.

  /** The bucketed-corpus LSH index, built once per (session, corpus)
    * like [[ivfIndex]]: at deployment scale this is a stored table
    * partitioned by (table, bucket) — queries only probe. The persist
    * models the stored index; `lsh_build` benchmarks the build on its
    * own line and `sim_ann_lsh` reports the steady-state probe cost.
    */
  private val lshIndexCache = new SessionCache[DataFrame](df =>
    // session already stopped when a sweep evicts → unpersist best-effort
    scala.util.Try(df.unpersist(blocking = false)))

  def lshIndex(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lshIndexCache.getOrBuild(s, d) {
      // the bucket kernel is tables × planes × dim per row — the same
      // work-conditioned widening as the IVF assignment pass (a
      // single-row-group corpus otherwise serializes the build). The
      // sizing probes (count + parquet footers) live INSIDE the
      // session-cached build: they price one build, not every probe
      // call that walks the index (moving them out added ~0.7 s to
      // the bench lsh_build line for nothing).
      val p = lshPlanes(s, d)
      val n = rowCount(s, Tables.embeddings(s, d))
      widenIfStarved(s, corpus(s, d), n.toDouble * NumTables * p * Dim, $"vec_id")
        .select($"vec_id", $"embedding", $"nrm",
          explode(lshBucketsPacked($"embedding", lshPlanes(s, d))).as("tp"))
        .select($"vec_id", $"embedding", $"nrm",
          unpackTable($"tp").as("table"), unpackBucket($"tp").as("bucket"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
  }

  def topkLsh(s: SparkSession, d: String, k: Int = TopK,
      multiprobe: Boolean = true): DataFrame =
    lshProbe(s, lshIndex(s, d), querySet(s, d), k, multiprobe, lshPlanes(s, d))

  /** The LSH probe against a GIVEN bucketed index — shared by the
    * session-cached path ([[topkLsh]]) and the stored-index path
    * ([[topkLshStored]]).
    */
  /** The (multi)probed buckets per query — (q_id, q_emb, q_nrm, table,
    * bucket) — shared by the probe join and the stored path's
    * pushdown-set derivation so the two can never drift.
    */
  private def probeBuckets(queries: DataFrame, numPlanes: Int,
      multiprobe: Boolean): DataFrame = {
    val qBase = queries
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        explode(lshBucketsPacked(col("q_emb"), numPlanes)).as("tp"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        unpackTable(col("tp")).as("table"), unpackBucket(col("tp")).as("bucket"))
    if (!multiprobe) qBase
    else qBase.select(col("q_id"), col("q_emb"), col("q_nrm"), col("table"),
      explode(array((lit(-1) +: (0 until numPlanes).map(lit(_))): _*)).as("flip"),
      col("bucket"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("table"),
        when(col("flip") === -1, col("bucket"))
          .otherwise(expr("bucket ^ shiftleft(1, flip)")).as("bucket"))
  }

  private def lshProbe(s: SparkSession, bucketed: DataFrame,
      queries: DataFrame, k: Int, multiprobe: Boolean,
      numPlanes: Int): DataFrame =
    probeJoin(s, bucketed, probeBuckets(queries, numPlanes, multiprobe), k)

  /** The probe join tail against a PRE-BUILT probe-bucket set — split
    * from [[lshProbe]] so the stored path can feed the same q it
    * collected the pushdown set from (one evaluation, no drift).
    */
  private def probeJoin(s: SparkSession, bucketed: DataFrame,
      q: DataFrame, k: Int): DataFrame =
    probeRank(s, probeScore(s, bucketed, q), k)

  /** The candidate join + scoring half of [[probeJoin]] — split out so
    * the over-cap stored probe can union several bucket-chunk scans
    * into ONE dedup/rank tail (each (table, bucket) pair lands in
    * exactly one chunk, so the union is the same candidate multiset
    * the unsplit join produces).
    */
  private def probeScore(s: SparkSession, bucketed: DataFrame,
      q: DataFrame): DataFrame = {
    import s.implicits._
    import graft.functions.VectorFunctions
    // A/B'd (r14): splitting the fat probe relation into a narrow
    // (q_id, table, bucket) join side + a separate |Q|-row q_emb
    // broadcast attached after the candidate filter measured 9.7-10.5 s
    // at sf10 vs 7.4-7.9 s for this single fat-broadcast join — the
    // second hash join per candidate row costs more than the smaller
    // broadcast saves. Kept single-join; numbers in NOTES.
    broadcast(q)
      .join(bucketed, Seq("table", "bucket"))
      .filter($"q_id" =!= $"vec_id")
      // score AT the probe site, then dedup multi-table collisions on
      // narrow 24-byte (q_id, n_id, cos_sim) rows — re-scoring a
      // colliding replica is cheaper than shipping both embedding
      // arrays through the dedup exchange (the same score comes out of
      // every replica, so dedup semantics are unchanged)
      .select($"q_id", $"vec_id".as("n_id"),
        round(VectorFunctions.cosineFrom(
          VectorFunctions.dot($"q_emb", $"embedding"), $"q_nrm", $"nrm"),
          4).as("cos_sim"))
  }

  private def probeRank(s: SparkSession, scored: DataFrame,
      k: Int): DataFrame = {
    import s.implicits._
    scored
      .dropDuplicates("q_id", "n_id")
      .withColumn("rank", row_number().over(
        Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"n_id".asc)))
      .filter($"rank" <= k)
      .select($"q_id", $"n_id", $"cos_sim", $"rank".cast("int").as("rank"))
  }

  /** IVF (inverted-file) ANN. The coarse quantizer is trained by
    * spherical k-means (a few Lloyd iterations) on a BOUNDED
    * deterministic sample, with k ≈ √n capped at `IvfKCap` — so the
    * centroid matrix is constant-size (broadcast via UDF closure),
    * assignment is O(n·k) with k independent of n, and nothing
    * unbounded ever reaches the driver: training collects at most
    * `IvfSampleCap` sample vectors (an index-build step, the standard
    * IVF construction), not the corpus. Each corpus vector is assigned
    * to its nearest centroid in one narrow pass; queries search only
    * their `NProbe` nearest cells. At 100 TB the assignment is computed
    * once and stored as a partition column; query cost is
    * NProbe/k of the corpus.
    */
  val IvfKCap = 4096
  val IvfSampleCap = 65536
  val LloydIters = 5
  val NProbe = 4
  /** Multi-assignment factor: each corpus vector is indexed in its
    * `IvfAssign` nearest cells. Raising it rescues recall for vectors
    * near cell boundaries — the dominant loss mode — at the price of a
    * ×`IvfAssign` index and a candidate-dedup exchange at query time
    * (single assignment needs no dedup: a vector can reach a query
    * through at most one probed cell). The default is single
    * assignment: it holds the 0.9 recall floor on the clustered
    * fixture (spec) with the leanest query plan; recall-sensitive
    * callers on boundary-heavy corpora pass 2.
    */
  val IvfAssign = 1
  /** Default fraction of cells a query probes when `nprobe` is not
    * given. 1/8 delivers the classic IVF trade on clustered corpora —
    * the realistic case: real embedding corpora cluster, and the
    * recall ≥ 0.9 floor at this default is spec-pinned on a
    * mixture-of-Gaussians-on-the-sphere fixture
    * (PipelineOpsSpec "IVF default probe on a clustered corpus").
    * ISOTROPIC vectors are the worst case for any coarse quantizer (a
    * top-5 neighbor at cos ≈ 0.4 sits ~65° away, nearly uncorrelated
    * with the query's cell; recall tracks the probed fraction almost
    * linearly). The build-time occupancy histogram detects that case
    * and widens the default probe ×2 ([[probeBoost]]: recall@5 0.80 at
    * 8/23 cells on the isotropic sf0.01 corpus); callers wanting ≥0.9
    * there still pass an explicit nprobe ≈ k/2.
    */
  val ProbeFraction = 0.125

  /** Ceiling on the DEFAULT probe width (round-11 verdict item 2).
    * With [[ivfK]]'s √n cells, per-query probe cost is nprobe · n/k ≈
    * nprobe · √n — scale-honest only while nprobe stays bounded. The
    * old uncapped ⌈k/8⌉ default grew nprobe with √n, making the
    * default probe a constant FRACTION of the corpus (n/8 per query,
    * no asymptotic win over a scan — the measured 16.8× sf0.1→sf1
    * sim_ann_ivfpq curve). Capping the base at 8 cells restores the
    * √n-per-query curve the √n-cell design promises (the FAISS
    * convention: nprobe is an absolute knob, not a fraction of nlist)
    * and is a no-op below k = 64 cells (≈4k vectors), so every bench-SF
    * plan and recall floor is unchanged. The recall trade at scale is
    * explicit: a constant probe width over more, finer cells sees a
    * shrinking corpus fraction; recall-sensitive large-corpus callers
    * pass nprobe (the documented convention) — the default optimizes
    * the declared steady-state probe cost.
    */
  val NProbeCap = 8

  /** k for a corpus of n vectors: ⌈√n⌉ capped — grows sublinearly, so
    * cells grow with √n while the centroid matrix stays broadcastable.
    */
  def ivfK(n: Long): Int =
    math.min(IvfKCap.toLong, math.max(1L, math.ceil(math.sqrt(n.toDouble)).toLong)).toInt

  /** Default cell probe count for a k-cell quantizer — the ONE place
    * the probe policy lives: shared by [[topkIvf]] and the generated
    * `sim_ann_ivf` oracle so the two cannot drift. Fraction-of-cells
    * between the [[NProbe]] floor and the [[NProbeCap]] ceiling.
    */
  def defaultNProbe(k: Int): Int =
    math.min(NProbeCap, math.max(NProbe, math.ceil(k * ProbeFraction).toInt))

  /** Occupancy-adaptive probe width (stored with the index): a
    * NEAR-UNIFORM cell-occupancy histogram is the isotropic signature
    * — no topic structure for the quantizer to exploit, neighbors
    * spread across cells, recall ≈ probed fraction — so the default
    * probe widens ×[[IvfUniformBoost]]. Skewed histograms (clustered
    * corpora, the realistic case) keep the lean base default: the
    * topic cells hold the neighbors. The statistic is the coefficient
    * of variation over ALL k cells (empty included — a clustered
    * corpus that leaves cells empty is maximally skewed): uniform
    * multinomial occupancy concentrates at CV ≈ √(k/n) ≲ 0.13 at the
    * 64·k minimum sample, far under [[IvfUniformCv]]; measured 0.200
    * on the isotropic sf0.01 corpus (recall@5 0.60 → 0.80 at the 2×
    * probes) vs 0.458 on the 20-topic clustered fixture (boost stays
    * 1, recall 1.0 unchanged) — PipelineOpsSpec pins both.
    */
  val IvfUniformCv = 0.35
  val IvfUniformBoost = 2

  def occupancyCv(cellCounts: Array[Long]): Double = {
    val xs = cellCounts.map(_.toDouble)
    val mean = xs.sum / xs.length
    if (mean == 0) 0.0
    else math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / xs.length) / mean
  }

  def probeBoost(cellCounts: Array[Long]): Int =
    if (cellCounts.length > 1 && occupancyCv(cellCounts) < IvfUniformCv)
      IvfUniformBoost
    else 1

  /** The occupancy-aware default probe: base policy × build-time
    * boost, capped at k. Shared by [[topkIvf]] and the dynamic oracle.
    */
  def defaultNProbe(k: Int, cellCounts: Array[Long]): Int =
    math.min(k, defaultNProbe(k) * probeBoost(cellCounts))

  /** Nearest-`n` centroid cells for a vector, as one narrow kernel
    * over the centroid matrix riding the plan as a reference constant
    * (ties → lowest centroid id) — native codegen
    * ([[graft.plans.NearestCells]]): the assignment pass is n·k dots
    * over the whole corpus, the heaviest per-row work of ivf_build,
    * and the former UDF paid a Seq[Float] → Seq[Long] encoder round
    * trip on every one.
    */
  private[operators] def nearestCellsCol(
      cents: Array[(Long, Array[Float], Double)], n: Int)(
      emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.NearestCells(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(emb), cents, n))

  /** Max multiply-adds the Lloyd loop may spend on the driver
    * (sample × k × dim × iters ≈ 1 s of one core). Below the cap the
    * bounded sample is collected and trained locally — no extra Spark
    * jobs, the right call at bench scale. Above it the assignment
    * step, embarrassingly parallel over the sample, runs on executors:
    * centroids broadcast out, per-partition partial sums come back and
    * are combined in partition order (deterministic given the session's
    * parallelism), so driver work per iteration is O(P·k·dim) instead
    * of O(sample·k·dim). At the caps (65536 × 4096 × 64 × 5 ≈ 8.6·10¹²
    * multiply-adds — hours on one core) training is distributed.
    */
  val DriverTrainFlopsCap: Double = 2e9

  /** Lloyd training cost estimate used to pick the driver/distributed
    * path (and to pin the bound in specs).
    */
  def trainFlops(sampleSize: Long, k: Long): Double =
    sampleSize.toDouble * k * Dim * LloydIters

  /** One Lloyd accumulation: add `v` to the sums/counts of its
    * max-cosine centroid (first-wins tiebreak → lowest centroid id).
    * Shared verbatim by the driver loop and the executor partials so
    * the two paths cannot drift.
    */
  private def accumulate(v: Array[Float], cents: Array[Array[Float]],
      sums: Array[Array[Double]], counts: Array[Int]): Unit = {
    var best = 0; var bestSim = Double.MinValue
    var c = 0
    while (c < cents.length) {
      var dot = 0.0; var i = 0
      val m = math.min(v.length, cents(c).length)
      while (i < m) { dot += v(i).toDouble * cents(c)(i).toDouble; i += 1 }
      if (dot > bestSim) { bestSim = dot; best = c }
      c += 1
    }
    var i = 0
    while (i < v.length) { sums(best)(i) += v(i); i += 1 }
    counts(best) += 1
  }

  /** Mean-then-renormalize update; empty cells keep their previous
    * centroid.
    */
  private def updateCents(cents: Array[Array[Float]],
      sums: Array[Array[Double]], counts: Array[Int]): Array[Array[Float]] =
    cents.zipWithIndex.map { case (old, c) =>
      if (counts(c) == 0) old
      else {
        val m = sums(c)
        val nrm = math.sqrt(m.map(x => x * x).sum)
        if (nrm == 0) old else m.map(x => (x / nrm).toFloat)
      }
    }

  /** Spherical k-means on a deterministic bounded sample: sample order
    * is by xxhash64(vec_id) (stable across runs and partitionings),
    * init is the first k sample vectors, assignment is max-cosine with
    * lowest-id tiebreak, update is mean-then-renormalize, empty cells
    * keep their previous centroid. Everything is deterministic given
    * the data, so specs and the rows-only driver check are stable.
    * Above `maxDriverFlops` the per-iteration assignment runs
    * distributed (see [[DriverTrainFlopsCap]]); the two paths differ
    * only in double-addition order (≤1e-14 relative).
    */
  /** Exact corpus row count without a Spark job when that's cheap: a
    * bounded number of parquet footers is read on the driver and their
    * record counts summed (the same figure a count() job would reduce
    * to); many-file tables fall back to the distributed count. The IVF
    * index build needs n only to size k ≈ √n — the footer path removes
    * one whole Spark job from every build at bench scale.
    */
  private[operators] def rowCount(s: SparkSession, df: DataFrame): Long = {
    val files = df.inputFiles
    if (files.nonEmpty && files.length <= 64) {
      try {
        val conf = s.sparkContext.hadoopConfiguration
        files.map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRecordCount finally r.close()
        }.sum
      } catch { case scala.util.control.NonFatal(_) => df.count() }
    } else df.count()
  }

  /** Unit-normalize on the driver/executor side (norm recomputed from
    * the raw floats — keeps the sample relation a bare column read).
    */
  private def unit(v: Array[Float]): Array[Float] = {
    var acc = 0.0; var i = 0
    while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
    val nrm = math.sqrt(acc)
    if (nrm == 0) v.clone() else v.map(x => (x / nrm).toFloat)
  }

  /** Hash-partitioned by id and id-sorted within each partition — the
    * distributed trainers' sample layout. A bare `repartition` pins
    * partition MEMBERSHIP but not in-partition ORDER (shuffle-block
    * fetch order varies run to run), and float accumulation is not
    * associative, so partial sums would drift by last-ulp between
    * runs. Keying the partitioner on the id and sorting in-partition
    * makes distributed training bit-reproducible, matching the
    * determinism contract the driver path already has.
    */
  private[operators] def deterministicSampleRdd(
      ds: org.apache.spark.sql.Dataset[(Long, Array[Float])],
      parallelism: Int): org.apache.spark.rdd.RDD[Array[Float]] =
    ds.rdd.partitionBy(new org.apache.spark.HashPartitioner(parallelism))
      .mapPartitions(it => it.toArray.sortBy(_._1).iterator.map(_._2))

  def trainCentroids(s: SparkSession, d: String,
      maxDriverFlops: Double = DriverTrainFlopsCap): Array[(Long, Array[Float], Double)] = {
    val emb = Tables.embeddings(s, d)
    trainCentroidsOn(s, emb, rowCount(s, emb), maxDriverFlops)
  }

  /** [[trainCentroids]] over an EXPLICIT embeddings relation with a
    * caller-supplied exact row count — the filtered-corpus entry the
    * semantic-dedup lifecycle trains its FROZEN historical quantizer
    * through. (The count must be passed: the footer fast-path of
    * [[rowCount]] sees a filtered scan's full files.) Arithmetic,
    * sampling, and determinism are the shared body's, unchanged.
    */
  private[operators] def trainCentroidsOn(s: SparkSession, emb: DataFrame,
      n: Long, maxDriverFlops: Double = DriverTrainFlopsCap): Array[(Long, Array[Float], Double)] = {
    import s.implicits._
    val k = ivfK(n)
    val sampleSize = math.min(math.max(64L * k, 1024L), IvfSampleCap.toLong).toInt
    // When the whole corpus fits in the sample cap, the sample IS the
    // corpus: a bare columnar scan with no sort and no norm expression
    // (normalization happens in `unit`), i.e. the cheapest possible
    // plan for the index-build job. Above the cap, the deterministic
    // hash-ordered prefix (stable across runs and partitionings).
    val sampleDs: org.apache.spark.sql.Dataset[(Long, Array[Float])] =
      if (n <= sampleSize)
        emb.select($"vec_id", $"embedding").as[(Long, Array[Float])]
      else emb.select($"vec_id", $"embedding")
        .orderBy(xxhash64($"vec_id"), $"vec_id")
        .limit(sampleSize)
        .select($"vec_id", $"embedding").as[(Long, Array[Float])]

    val cents: Array[Array[Float]] =
      if (trainFlops(sampleSize, k) <= maxDriverFlops) {
        val sample = sampleDs.collect().map(t => unit(t._2))
        require(sample.nonEmpty, "cannot train IVF centroids on an empty corpus")
        val dim = sample.head.length
        var cs: Array[Array[Float]] =
          (0 until k).map(i => sample(i % sample.length).clone()).toArray
        var iter = 0
        while (iter < LloydIters) {
          val sums = Array.fill(k)(new Array[Double](dim))
          val counts = new Array[Int](k)
          sample.foreach(v => accumulate(v, cs, sums, counts))
          cs = updateCents(cs, sums, counts)
          iter += 1
        }
        cs
      } else {
        val init = sampleDs.take(k).map(t => unit(t._2))
        require(init.nonEmpty, "cannot train IVF centroids on an empty corpus")
        val dim = init.head.length
        val rdd = deterministicSampleRdd(sampleDs,
          s.sparkContext.defaultParallelism).map(unit)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        var cs: Array[Array[Float]] =
          (0 until k).map(i => init(i % init.length).clone()).toArray
        var iter = 0
        while (iter < LloydIters) {
          val bc = s.sparkContext.broadcast(cs)
          val partials = rdd.mapPartitionsWithIndex { (pid, it) =>
            val cl = bc.value
            val sums = Array.fill(cl.length)(new Array[Double](dim))
            val counts = new Array[Int](cl.length)
            it.foreach(v => accumulate(v, cl, sums, counts))
            Iterator.single((pid, sums, counts))
          }.collect().sortBy(_._1) // combine in partition order: deterministic
          val sums = Array.fill(k)(new Array[Double](dim))
          val counts = new Array[Int](k)
          partials.foreach { case (_, ps, pc) =>
            var c = 0
            while (c < k) {
              var i = 0
              while (i < dim) { sums(c)(i) += ps(c)(i); i += 1 }
              counts(c) += pc(c)
              c += 1
            }
          }
          cs = updateCents(cs, sums, counts)
          bc.destroy()
          iter += 1
        }
        rdd.unpersist(blocking = false)
        cs
      }
    cents.zipWithIndex.map { case (cv, cid) =>
      val nrm = math.sqrt(cv.map(x => x.toDouble * x.toDouble).sum)
      (cid.toLong, cv, if (nrm == 0) 1.0 else nrm)
    }
  }

  /** Assignment passes above this many multiply-adds repartition a
    * row-group-starved scan to the session's cores first (~0.4 s of
    * one core — the point where a bounded shuffle of the corpus is
    * cheaper than serial compute). Below it the extra exchange costs
    * more than it saves (bench-SF plans stay shuffle-free).
    */
  val AssignRepartitionFlops: Double = 2e8

  /** Parquet read parallelism is ROW-GROUP-bounded, not byte-range
    * bounded: a single-row-group file yields ONE non-empty task no
    * matter how many byte splits the scheduler cuts (every scale
    * fixture here is written that way, and a freshly-ingested corpus
    * on a real cluster often is too — few big files from an upstream
    * writer). For scan-cheap queries that's irrelevant; for the IVF
    * assignment pass (n·k·d multiply-adds riding the scan) it
    * serializes the build: measured 10.2 s of kernel CPU on one core
    * vs a 51 MB corpus at sf10. When the kernel work crosses
    * [[AssignRepartitionFlops]] and the source cannot feed the
    * session's cores, one bounded round-robin exchange of the (id,
    * embedding, nrm) rows unlocks cores× assignment throughput; at
    * deployment scale (row groups ≫ cores) this is a no-op.
    */
  private[operators] def scanRowGroups(s: SparkSession, df: DataFrame): Long = {
    val files = df.inputFiles
    if (files.isEmpty || files.length > 64) Long.MaxValue // already wide
    else
      try {
        val conf = s.sparkContext.hadoopConfiguration
        files.map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRowGroups.size.toLong finally r.close()
        }.sum
      } catch { case scala.util.control.NonFatal(_) => Long.MaxValue }
  }

  /** Widen a per-row-kernel-heavy scan to the session's cores when
    * the parquet layout cannot (see [[scanRowGroups]]) and the kernel
    * work justifies one bounded exchange ([[AssignRepartitionFlops]]).
    * The exchange HASHES on the caller's row key — never round-robin:
    * RoundRobinPartitioning sorts every row first
    * (spark.sql.execution.sortBeforeRepartition, for deterministic
    * retries), and that sort runs on the starved partition layout the
    * widen exists to escape — measured 256 s for pairs_build at sf10
    * (one task Tim-sorting 1 GB of text rows) vs 100 s without the
    * widen and ~60 s with the hash exchange. Hash on a unique id
    * spreads rows evenly with zero sort.
    */
  private[operators] def widenIfStarved(s: SparkSession, df: DataFrame,
      flops: Double, key: org.apache.spark.sql.Column,
      layout: DataFrame = null): DataFrame = {
    val cores = s.sparkContext.defaultParallelism
    // `layout` carries the SOURCE table when `df` is a derived/cached
    // relation whose inputFiles no longer resolve to the parquet
    // (measured: the PQ codes cache reported no files, the widen
    // silently never fired, and the 3.2e9-add LUT scan ran on the one
    // task its single-row-group ancestry allowed)
    val probe = if (layout == null) df else layout
    if (flops >= AssignRepartitionFlops && scanRowGroups(s, probe) < cores)
      df.repartition(cores, key)
    else df
  }

  /** Uncompressed byte size of a scan's parquet source (row-group
    * metadata summed off the footers — no Spark job), for sizing the
    * [[widenIfStarved]] work estimate of text/decode kernels whose
    * per-row cost is byte-proportional rather than a fixed
    * vector-arithmetic count. Long.MaxValue when unknown/many-file
    * (those layouts are wide already, so the widen is moot).
    */
  private[operators] def scanBytes(s: SparkSession, df: DataFrame): Long = {
    val files = df.inputFiles
    if (files.isEmpty || files.length > 64) Long.MaxValue
    else
      try {
        val conf = s.sparkContext.hadoopConfiguration
        files.map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            var total = 0L
            r.getRowGroups.forEach(rg => total += rg.getTotalByteSize)
            total
          } finally r.close()
        }.sum
      } catch { case scala.util.control.NonFatal(_) => Long.MaxValue }
  }

  /** Rough multiply-add-equivalents per input byte for a tokenize /
    * hash / decode kernel (FNV per char, split scanning, histogram
    * accumulation are all a few ops per byte) — with
    * [[AssignRepartitionFlops]] this widens byte-heavy scans only
    * past ~6 MB of text per missing core, so bench-SF single-digit-MB
    * corpora keep their exchange-free plans.
    */
  private[operators] val TextKernelFlopsPerByte = 32.0

  def ivfAssignments(s: SparkSession, d: String,
      cents: Array[(Long, Array[Float], Double)],
      assign: Int = IvfAssign): DataFrame =
    ivfAssignmentsOn(s, corpus(s, d),
      rowCount(s, Tables.embeddings(s, d)), cents, assign)

  /** [[ivfAssignments]] over an EXPLICIT (vec_id, embedding, nrm)
    * relation with a caller-supplied exact row count (see the
    * [[trainCentroidsOn]] note) — same kernel, same widen policy.
    */
  private[operators] def ivfAssignmentsOn(s: SparkSession, src0: DataFrame,
      n: Long, cents: Array[(Long, Array[Float], Double)],
      assign: Int = IvfAssign): DataFrame = {
    import s.implicits._
    val cells = nearestCellsCol(cents, assign) _
    val src = widenIfStarved(s, src0,
      n.toDouble * cents.length * Dim, $"vec_id")
    src.select($"vec_id", $"embedding", $"nrm",
      explode(cells($"embedding")).as("cell"))
  }

  /** A built IVF index: the trained coarse quantizer plus the cell
    * assignments relation (vec_id, embedding, nrm, cell). IVF's whole
    * point is that the index is built ONCE and amortized over every
    * query after it — at deployment scale the assignments are computed
    * once and stored (a table partitioned/bucketed by cell; `cell` is
    * a plain column, so that is one `write.partitionBy("cell")` away),
    * and query cost is NProbe/k of the corpus. `ivfIndex` models the
    * build-once contract with a per-(session, corpus, assign) cache;
    * the bench reports the build as its own line (`ivf_build`) and
    * `sim_ann_ivf` as the steady-state probe cost — the standard way
    * ANN systems report build vs query throughput. A cold `topkIvf`
    * call with no prior build still works (it builds on miss); the
    * cache assumes the corpus dir is immutable, which holds for the
    * generated test corpora.
    */
  final case class IvfIndex(cents: Array[(Long, Array[Float], Double)],
      assigned: DataFrame, cellCounts: Array[Long])

  private val indexCache = new SessionCache[IvfIndex](idx =>
    scala.util.Try(idx.assigned.unpersist(blocking = false)))

  def ivfIndex(s: SparkSession, d: String, assign: Int = IvfAssign): IvfIndex =
    indexCache.getOrBuild(s, s"$assign#$d") {
      val cents = trainCentroids(s, d)
      val assigned = ivfAssignments(s, d, cents, assign)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // the occupancy histogram is part of the stored index (k ≤ 4096
      // counts — a bounded driver transfer, same class as the centroid
      // matrix): it prices the build's one warm-up pass and feeds the
      // occupancy-aware probe policy
      import s.implicits._
      val occ = assigned.groupBy($"cell").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
      val counts = Array.tabulate(cents.length)(c => occ.getOrElse(c.toLong, 0L))
      IvfIndex(cents, assigned, counts)
    }

  /** An IVF index trained AND assigned over a FILTERED corpus slice —
    * the historical-only quantizer the semantic-dedup lifecycle
    * freezes: at deployment the quantizer is trained on whatever
    * corpus existed at build time, and later batches are assigned to
    * those FROZEN cells, never retrained per run. `cacheKey` names
    * the slice for the session cache (same key + corpus ⇒ one
    * training run shared by Verify's query dump and the generated
    * oracle literals, the [[centroidLiterals]] contract).
    */
  def ivfIndexFor(s: SparkSession, d: String, pred: org.apache.spark.sql.Column,
      cacheKey: String, assign: Int = IvfAssign): IvfIndex =
    indexCache.getOrBuild(s, s"for:$cacheKey#$assign#$d") {
      import s.implicits._
      val (cents, n) = sliceCentsFor(s, d, pred, cacheKey)
      val assigned = ivfAssignmentsOn(s, corpus(s, d).filter(pred), n,
          cents, assign)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val occ = assigned.groupBy($"cell").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
      val counts = Array.tabulate(cents.length)(c => occ.getOrElse(c.toLong, 0L))
      IvfIndex(cents, assigned, counts)
    }

  /** The slice-trained quantizer ALONE — what the dynamic oracles
    * need: rendering oracle SQL must cost the (sampled) training, not
    * a full slice assignment + persist + occupancy job the literals
    * never read. Shared with [[ivfIndexFor]] through this cache, so a
    * session that runs both the declared query and the oracle dump
    * still trains exactly once.
    */
  def ivfCentroidsFor(s: SparkSession, d: String,
      pred: org.apache.spark.sql.Column,
      cacheKey: String): Array[(Long, Array[Float], Double)] =
    sliceCentsFor(s, d, pred, cacheKey)._1

  private def sliceCentsFor(s: SparkSession, d: String,
      pred: org.apache.spark.sql.Column,
      cacheKey: String): (Array[(Long, Array[Float], Double)], Long) =
    sliceCentsCache.getOrBuild(s, s"$cacheKey#$d") {
      val emb = Tables.embeddings(s, d).filter(pred)
      // exact count of the SLICE (rowCount's footer fast-path would
      // see the filtered scan's full files)
      val n = emb.count()
      (trainCentroidsOn(s, emb, n), n)
    }

  private val sliceCentsCache =
    new SessionCache[(Array[(Long, Array[Float], Double)], Long)]()

  def topkIvf(s: SparkSession, d: String, k: Int = TopK,
      nprobe: Int = -1, assign: Int = IvfAssign): DataFrame =
    ivfProbe(s, ivfIndex(s, d, assign), querySet(s, d), k, nprobe, assign)

  /** The IVF probe against a GIVEN index — the steady-state query job,
    * shared by the session-cached path ([[topkIvf]]) and the
    * stored-index path ([[topkIvfStored]]).
    */
  private def ivfProbe(s: SparkSession, idx: IvfIndex, queries: DataFrame,
      k: Int, nprobe: Int, assign: Int): DataFrame = {
    import s.implicits._
    import graft.functions.VectorFunctions
    val cents = idx.cents
    val assigned = idx.assigned
    val np = if (nprobe > 0) nprobe else defaultNProbe(cents.length, idx.cellCounts)
    // per query: its np nearest cells via the same kernel
    val probe = nearestCellsCol(cents, np) _
    val qCells = queries
      .select($"q_id", $"q_emb", $"q_nrm",
        explode(probe($"q_emb")).as("cell"))
    val scored = broadcast(qCells)
      .join(assigned, Seq("cell"))
      .filter($"q_id" =!= $"vec_id")
      // score AT the probe site; with multi-assignment a vector can
      // reach a query through several probed cells, so dedup — but on
      // narrow 24-byte (q_id, n_id, cos_sim) rows (identical score in
      // every replica), never shipping embedding arrays through the
      // exchange. Single assignment (the default) has no replicas and
      // skips the exchange entirely.
      .select($"q_id", $"vec_id".as("n_id"),
        round(VectorFunctions.cosineFrom(
          VectorFunctions.dot($"q_emb", $"embedding"), $"q_nrm", $"nrm"),
          4).as("cos_sim"))
    val deduped = if (assign > 1) scored.dropDuplicates("q_id", "n_id") else scored
    deduped
      .withColumn("rank", row_number().over(
        Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"n_id".asc)))
      .filter($"rank" <= k)
      .select($"q_id", $"n_id", $"cos_sim", $"rank".cast("int").as("rank"))
  }

  // ------------------------------------------------------------------
  // Stored-index layout — the deployment shape of the build-once
  // contract: ONE job builds an index and writes it as a
  // partition-laid-out parquet table; any LATER driver (a fresh
  // session, days later, a different cluster) reads it back and probes
  // without rebuilding. The session caches above model this contract
  // in-process; these functions ARE it. Probe jobs join the broadcast
  // query side on the partition column, so dynamic partition pruning
  // limits the stored scan to the probed cells/buckets — the property
  // IndexStoreSpec pins on the executed plan.
  // ------------------------------------------------------------------

  /** Write the built IVF index: assignments partitioned by `cell`
    * (a probe touching nprobe cells reads only those directories) plus
    * the bounded trained state (centroids, norms, occupancy — ≤
    * [[IvfKCap]] rows) as a small side table.
    */
  def writeIvfIndex(s: SparkSession, d: String, outDir: String,
      assign: Int = IvfAssign): Unit =
    writeIvfIndexOf(s, ivfIndex(s, d, assign), outDir)

  /** Write a GIVEN built index (the [[ivfIndexFor]] slice-trained
    * form included) in the standard stored layout.
    */
  private[operators] def writeIvfIndexOf(s: SparkSession, idx: IvfIndex,
      outDir: String): Unit = {
    import s.implicits._
    // cluster rows into their cell before the partitioned write: every
    // upstream task writing into every cell directory otherwise emits
    // tasks × cells tiny files (measured 512 files for 16 dirs on the
    // sibling pair-relation write); one exchange keyed by the
    // partition column makes it one file per cell here, and at
    // deployment scale caps files-per-cell at the tasks holding that
    // cell
    idx.assigned.select($"vec_id", $"embedding", $"nrm", $"cell")
      .repartition($"cell")
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$outDir/assignments")
    idx.cents.toSeq
      .map { case (cid, cv, cn) =>
        (cid, cv.toSeq, cn, idx.cellCounts(cid.toInt)) }
      .toDF("cell", "centroid", "cnrm", "occupancy")
      .write.mode("overwrite").parquet(s"$outDir/centroids")
  }

  /** The stored-assignments schema, passed explicitly so the `cell`
    * partition column comes back as the original LONG
    * (directory-value inference would make it INT, and the resulting
    * join-side cast would defeat partition pruning).
    */
  private val ivfAssignmentsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("vec_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("embedding",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType)),
    org.apache.spark.sql.types.StructField("nrm",
      org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("cell",
      org.apache.spark.sql.types.LongType)))

  /** Read a stored IVF index, minus any tombstoned ids. */
  def readIvfIndex(s: SparkSession, indexDir: String): IvfIndex = {
    import s.implicits._
    val cents = s.read.parquet(s"$indexDir/centroids")
      .select($"cell", $"centroid", $"cnrm", $"occupancy")
      .as[(Long, Seq[Float], Double, Long)].collect()
      .sortBy(_._1)
    IvfIndex(
      cents.map { case (cid, cv, cn, _) => (cid, cv.toArray, cn) },
      minusTombstones(s, indexDir,
        s.read.schema(ivfAssignmentsSchema).parquet(s"$indexDir/assignments")),
      cents.map(_._4))
  }

  /** Probe a STORED IVF index (written by [[writeIvfIndex]]) — the
    * separate-query-job half of the deployment shape; no session cache
    * involved, nothing rebuilt.
    */
  def topkIvfStored(s: SparkSession, d: String, indexDir: String,
      k: Int = TopK, nprobe: Int = -1, assign: Int = IvfAssign): DataFrame =
    topkIvfStoredFor(s, querySet(s, d), indexDir, k, nprobe, assign)

  /** The stored-IVF probe for an ARBITRARY query relation
    * (q_id, q_emb, q_nrm) — the serving entry point, mirroring
    * [[topkLshStoredFor]]: queries are independent rows, so any batch
    * of them (a micro-batch of live lookups, a backfill slice) probes
    * the same stored index through the same cell-pruned scan.
    */
  def topkIvfStoredFor(s: SparkSession, queries: DataFrame,
      indexDir: String, k: Int = TopK, nprobe: Int = -1,
      assign: Int = IvfAssign): DataFrame =
    ivfProbe(s, readIvfIndex(s, indexDir), queries, k, nprobe, assign)

  /** Append NEW vectors to a STORED IVF index WITHOUT retraining — the
    * nightly-ingest half of the build-once lifecycle. Only the k·d
    * centroid matrix is read back (never the stored assignments); the
    * batch is assigned against the FROZEN coarse quantizer with the
    * same native kernel the build used, so an appended vector lands in
    * exactly the cell a full rebuild with these centroids would give
    * it, and cell-partitioned rows are APPENDED (each batch's files
    * land inside the existing cell directories — files-per-cell grows
    * by the batch's tasks per append; periodic compaction or a rebuild
    * is the deployment's defragmentation, the FAISS convention that
    * retraining is a new index VERSION while appending is cheap). The
    * occupancy table is rewritten (bounded: k rows) so the
    * occupancy-aware probe policy prices the grown cells. Batch ids
    * must be disjoint from the stored ones (content-addressed
    * upstream, the tracking-table convention). Single-writer
    * maintenance op: a probe racing an append may see a partial batch
    * — a deployment needing atomic cutover versions the index dir.
    */
  def appendToIvfIndex(s: SparkSession, indexDir: String,
      batch: DataFrame, assign: Int = IvfAssign): Unit = {
    import s.implicits._
    val centRows = s.read.parquet(s"$indexDir/centroids")
      .select($"cell", $"centroid", $"cnrm", $"occupancy")
      .as[(Long, Seq[Float], Double, Long)].collect().sortBy(_._1)
    val cents = centRows.map { case (cid, cv, cn, _) => (cid, cv.toArray, cn) }
    val cells = nearestCellsCol(cents, assign) _
    val assigned = batch
      .select($"vec_id", $"embedding",
        graft.functions.VectorFunctions.norm($"embedding").as("nrm"))
      .select($"vec_id", $"embedding", $"nrm",
        explode(cells($"embedding")).as("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val delta = assigned.groupBy($"cell").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
      assigned.repartition($"cell")
        .write.mode("append").partitionBy("cell")
        .parquet(s"$indexDir/assignments")
      // NEVER overwrite the trained quantizer in place: a crash
      // mid-overwrite would destroy the only copy of the centroids
      // (irreplaceable without a retrain). Write a sibling, swap.
      val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/centroids_updating")
      centRows.toSeq
        .map { case (cid, cv, cn, occ) =>
          (cid, cv, cn, occ + delta.getOrElse(cid, 0L)) }
        .toDF("cell", "centroid", "cnrm", "occupancy")
        .write.mode("overwrite").parquet(tmp.toString)
      swapDirInto(s, tmp,
        new org.apache.hadoop.fs.Path(s"$indexDir/centroids"))
    } finally assigned.unpersist(blocking = false)
  }

  /** Swap a freshly-written sibling directory into place without a
    * window where the target is missing: target → `_old`, fresh →
    * target, drop `_old`. A crash between the renames leaves the fresh
    * copy intact under one of the two names — recoverable by hand —
    * never a deleted-only state. (Rename is atomic-cheap on HDFS/local;
    * an object store without rename versions whole index dirs instead,
    * the note on [[appendToIvfIndex]].)
    */
  private[graft] def swapDirInto(s: SparkSession,
      fresh: org.apache.hadoop.fs.Path,
      target: org.apache.hadoop.fs.Path): Unit = {
    val fs = target.getFileSystem(s.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(target.toString + "_old")
    fs.delete(old, true)
    if (fs.exists(target))
      require(fs.rename(target, old), s"swap: could not retire $target")
    require(fs.rename(fresh, target), s"swap: could not promote $fresh")
    fs.delete(old, true)
  }

  /** Byte-identical recursive snapshot of a stored layout —
    * [[graft.operators.Lexical.cloneLexIndex]]'s mechanism made
    * family-agnostic (r18 build-once attribution): a takedown /
    * maintenance declared query snapshots the session's shared base
    * artifact instead of paying a second corpus build, so its bench
    * line measures clone + maintenance + probe — the deployment cost
    * of the operation (a production index exists before the takedown
    * request arrives; rebuilding it per request was attribution
    * noise, not measured work). Callers clone a same-session fresh
    * build (quiescent by construction); `quiescenceMarkers` lets a
    * family refuse a source that has sprouted maintenance state
    * anyway (tombstones, pending markers), which would silently
    * change the clone's answers.
    */
  private[graft] def cloneIndexDir(s: SparkSession, srcDir: String,
      dstDir: String, quiescenceMarkers: Seq[String] = Nil): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(srcDir)
    val dst = new org.apache.hadoop.fs.Path(dstDir)
    val fs = src.getFileSystem(conf)
    quiescenceMarkers.foreach { m =>
      require(!fs.exists(new org.apache.hadoop.fs.Path(src, m)),
        s"$srcDir carries maintenance state ($m) - clone only a " +
          "quiescent layout")
    }
    fs.delete(dst, true)
    copyIndexTree(fs, conf, src, dst)
  }

  /** Byte-identical recursive copy of a stored layout. The layouts are
    * many tiny files (one per cell/band directory), and on the local
    * filesystem `FileUtil.copy` routes every one of them through
    * ChecksumFileSystem's re-derived per-file CRC streams — measured
    * 0.66 s for a 55-file / 1.3 MB IVF index where a plain java.nio
    * walk+copy of the same tree (CRC sidecars copied verbatim instead
    * of recomputed) takes 0.01 s. Local scheme takes the nio path; any
    * other filesystem keeps the Hadoop copy unchanged.
    *
    * CONTRACT (r18 advice): the source must be QUIESCENT and
    * immutable for the duration of the copy — true at every call
    * site (clones happen right after a fresh build, or behind
    * [[cloneIndexDir]]'s quiescence markers). CRC sidecars are copied
    * verbatim, so a layout mutated through the RAW path after its
    * checksummed write would clone a stale sidecar and poison
    * checksummed readers — never clone such a layout. Symlinked
    * directories are followed (`FOLLOW_LINKS`, matching
    * `FileUtil.copy`'s behavior — without it a dir symlink would
    * clone as a silently EMPTY directory), and a missing source fails
    * with the same descriptive error the Hadoop branch raises.
    */
  private[graft] def copyIndexTree(fs: org.apache.hadoop.fs.FileSystem,
      conf: org.apache.hadoop.conf.Configuration,
      src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Unit =
    if (fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
        fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]) {
      val srcDir = java.nio.file.Paths.get(src.toUri.getPath)
      val dstDir = java.nio.file.Paths.get(dst.toUri.getPath)
      require(java.nio.file.Files.exists(srcDir),
        s"could not clone $src to $dst: source does not exist")
      val st = java.nio.file.Files.walk(srcDir,
        java.nio.file.FileVisitOption.FOLLOW_LINKS)
      try st.forEach { p =>
        val d = dstDir.resolve(srcDir.relativize(p).toString)
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(d)
        else java.nio.file.Files.copy(p, d,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } finally st.close()
    } else
      require(
        org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, conf),
        s"could not clone $src to $dst")

  /** Tombstone relation of a stored index — an underscore-prefixed
    * CHILD of the index dir (Spark's parquet listing ignores hidden
    * paths, the `_graft_lsh_planes` sidecar mechanism), so it can live
    * inside the LSH layout's parquet root as well as the IVF dir
    * without ever surfacing as data rows.
    */
  private def tombstonesPath(indexDir: String): String =
    s"$indexDir/_graft_tombstones"

  private def hasTombstones(s: SparkSession, indexDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(tombstonesPath(indexDir))
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Delete ids from a STORED index (IVF or LSH layout) WITHOUT
    * rewriting it — the takedown/right-to-erasure half of the index
    * lifecycle, and at 100 TB the only affordable one: the op appends
    * the ids to a tombstone relation (id-sized) and every stored
    * reader anti-joins it, so a deleted vector stops appearing as a
    * NEIGHBOR immediately, across every probe family sharing the
    * layout, while the multi-TB assignments stay untouched. The
    * physical purge is [[compactIvfIndex]]/[[compactLshIndex]], which
    * fold the tombstones into the rewrite and clear them — the
    * log-structured-merge discipline. Deletes are idempotent (the
    * anti-join doesn't care how many times an id is listed); an id may
    * be RE-ingested via append only after a compaction has folded its
    * tombstone, else the tombstone would suppress the new row (ids are
    * content-addressed upstream, the tracking-table convention, so
    * reuse-before-compaction does not occur). Single-writer like the
    * appends. Occupancy/sidecar metadata is NOT touched: probe pricing
    * reads the pre-delete counts until compaction refreshes them — a
    * stale-performance, never-correctness trade, stated.
    *
    * TRAINED-STATE contract (the BPE/KMV stated-gap convention): this
    * op erases the vector's ROW — it stops being stored, returned, or
    * matched, which is what a data-subject takedown targets. The
    * trained quantizer state (IVF centroids, PQ/SQ/OPQ codebooks,
    * LSH planes) is aggregate statistics over the training sample and
    * is NOT re-derived per delete: centroids are means over thousands
    * of vectors, so one vector's residual influence is de-minimis and
    * affects only WHERE survivors are binned, never what is stored or
    * returned. A deployment required to unlearn training influence
    * itself retrains — a new index VERSION, the append scaladoc's
    * convention.
    */
  def deleteFromIndex(s: SparkSession, indexDir: String,
      ids: DataFrame): Unit =
    ids.select(col(ids.columns.head).cast("long").as("vec_id"))
      .coalesce(1)
      .write.mode("append").parquet(tombstonesPath(indexDir))

  /** The tombstone anti-join every stored reader applies — absent
    * tombstones cost one driver-side existence check and zero plan
    * nodes. The anti-join is on the scan side of the probes' pruning
    * filters, which push through a LEFT ANTI join's left side, so
    * bucket/cell pruning survives deletion (IndexDeleteSpec pins the
    * pushed filter).
    */
  private[operators] def minusTombstones(s: SparkSession, indexDir: String,
      rows: DataFrame): DataFrame =
    if (!hasTombstones(s, indexDir)) rows
    else rows.join(
      s.read.schema("vec_id BIGINT").parquet(tombstonesPath(indexDir)),
      Seq("vec_id"), "left_anti")

  /** Physically purge tombstones from a CODE index (PQ/SQ/BQ/residual
    * — any layout whose row data is one `<dir>/<sub>` parquet table
    * keyed by vec_id, with trained state in sibling tables the purge
    * never touches): rewrite the data subdir minus tombstoned rows
    * (schema-agnostic — the reader's anti-join already defines the
    * surviving set), swap, clear tombstones LAST (the compactIvfIndex
    * crash discipline: a crash leaves tombstones over already-purged
    * rows, re-applied idempotently).
    */
  def compactCodesIndex(s: SparkSession, indexDir: String,
      dataSubdir: String = "codes"): Unit = {
    val src = new org.apache.hadoop.fs.Path(s"$indexDir/$dataSubdir")
    val tmp = new org.apache.hadoop.fs.Path(
      s"$indexDir/${dataSubdir}_compacting")
    minusTombstones(s, indexDir, s.read.parquet(src.toString))
      .write.mode("overwrite").parquet(tmp.toString)
    swapDirInto(s, tmp, src)
    val tp = new org.apache.hadoop.fs.Path(tombstonesPath(indexDir))
    tp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(tp, true)
  }

  /** Defragment a stored IVF index after appends AND physically purge
    * tombstoned rows: rewrite the assignments one file per cell (each
    * [[appendToIvfIndex]] batch adds files inside the cell
    * directories; probes pay per-file footer/open cost, so periodic
    * compaction is the deployment's maintenance job — the counterpart
    * of a log-structured store's merge), minus any tombstoned ids
    * (the read path already anti-joins them), then refresh the
    * occupancy column from the compacted layout and clear the
    * tombstones LAST — a crash anywhere leaves tombstones in place
    * over already-purged rows, which the anti-join re-applies
    * idempotently (deletes can never resurrect). Single-writer like
    * the append (version the index dir for atomic cutover).
    */
  def compactIvfIndex(s: SparkSession, indexDir: String): Unit = {
    import s.implicits._
    val src = new org.apache.hadoop.fs.Path(s"$indexDir/assignments")
    val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/assignments_compacting")
    // distributed copy into a sibling dir, then swap — never a driver
    // collect, never a read-while-overwrite of the same directory,
    // never a window with no assignments on disk. readIvfIndex already
    // collects the centroid relation — reuse it below instead of a
    // second read+collect, and refresh occupancy from the persisted
    // folded rows instead of re-listing the freshly written sibling
    // (per-file footer cost over one-file-per-cell; the counted
    // relation IS the written one) — the compactIvfIndexVersioned
    // measurement.
    val idx = readIvfIndex(s, indexDir)
    val folded = idx.assigned
      .select($"vec_id", $"embedding", $"nrm", $"cell")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = try {
      folded.repartition($"cell")
        .write.mode("overwrite").partitionBy("cell").parquet(tmp.toString)
      // occupancy (k rows) refreshed so probe pricing reflects folded
      // deletes; centroid VECTORS are untouched (never overwrite the
      // trained quantizer in place — sibling+swap, the
      // appendToIvfIndex discipline)
      folded.groupBy($"cell").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
    } finally folded.unpersist(blocking = false)
    swapDirInto(s, tmp, src)
    val ctmp = new org.apache.hadoop.fs.Path(s"$indexDir/centroids_updating")
    idx.cents.toSeq
      .map { case (cid, cv, cn) =>
        (cid, cv.toSeq, cn, counts.getOrElse(cid, 0L)) }
      .toDF("cell", "centroid", "cnrm", "occupancy")
      .write.mode("overwrite").parquet(ctmp.toString)
    swapDirInto(s, ctmp,
      new org.apache.hadoop.fs.Path(s"$indexDir/centroids"))
    val tp = new org.apache.hadoop.fs.Path(tombstonesPath(indexDir))
    tp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(tp, true)
  }

  /** Write the built LSH index partitioned by table, each table's
    * rows SORTED by bucket so parquet row-group min/max stats prune
    * bucket predicates. Partitioning by bucket itself would be
    * scale-dishonest now that the plane count is occupancy-adaptive:
    * at [[MaxPlanes]]=24 it means 2^24 directories per table (and at
    * bench SF it already meant 512 tiny directories whose per-dir
    * commit+footer overhead dominated the query, the
    * dedup_cluster_stored tiny-file lesson one level up). Directory
    * count is now [[NumTables]] at ANY corpus size; bucket-level read
    * selectivity comes from the probe side pushing its bounded probed-
    * bucket set as a static filter ([[topkLshStored]]). The plane
    * count the index was built with is stored alongside it (an
    * underscore-prefixed sidecar Spark's parquet listing ignores, like
    * _SUCCESS), so a later probe job buckets its queries with the
    * INDEX's sizing even if the corpus has since grown past the next
    * sizing step.
    */
  def writeLshIndex(s: SparkSession, d: String, outDir: String): Unit = {
    import s.implicits._
    lshIndex(s, d).select($"vec_id", $"embedding", $"nrm", $"table", $"bucket")
      // cluster rows into their directory, sorted by bucket within it
      // — one bucket-ordered file per table at bench scale; at
      // deployment scale files-per-table is bounded by the tasks
      // holding that table and each file stays bucket-ordered. The
      // sort leads with table: it satisfies the dynamic-partition
      // writer's required ordering (sorting by bucket alone would make
      // the writer insert its OWN sort on table over the stream, both
      // re-sorting and — if that sort spills — interleaving the bucket
      // order the row-group pruning depends on), and it keeps files
      // bucket-ordered even when two tables hash to one shuffle
      // partition
      .repartition($"table").sortWithinPartitions($"table", $"bucket")
      .write.mode("overwrite").partitionBy("table").parquet(outDir)
    writePlanesSidecar(s, outDir, lshPlanes(s, d))
  }

  /** Write the plane-count sidecar for a stored LSH-layout index —
    * factored so every writer of the layout ([[writeLshIndex]], the
    * incremental dedup index) records its sizing the same way.
    */
  private[operators] def writePlanesSidecar(s: SparkSession, outDir: String,
      np: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(outDir, "_graft_lsh_planes")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(np.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Append NEW vectors to a STORED LSH index — the LSH counterpart
    * of [[appendToIvfIndex]], and the reason the plane-count sidecar
    * exists: the batch is bucketed with the INDEX's recorded plane
    * count (never the current corpus's adaptive sizing, which may
    * have stepped since the build), so appended vectors collide with
    * stored ones exactly as a rebuild at that sizing would. Each
    * append adds one bucket-sorted file per touched table directory;
    * per-file row-group pruning is preserved (every file stays
    * bucket-ordered), and compaction/rebuild is the defrag path as
    * with IVF. Single-writer, disjoint ids — the append conventions.
    */
  def appendToLshIndex(s: SparkSession, indexDir: String,
      batch: DataFrame): Unit = {
    import s.implicits._
    val planes = readLshPlanes(s, indexDir)
    batch
      .select($"vec_id", $"embedding",
        graft.functions.VectorFunctions.norm($"embedding").as("nrm"))
      .select($"vec_id", $"embedding", $"nrm",
        explode(lshBucketsPacked($"embedding", planes)).as("tp"))
      .select($"vec_id", $"embedding", $"nrm",
        unpackTable($"tp").as("table"), unpackBucket($"tp").as("bucket"))
      .repartition($"table").sortWithinPartitions($"table", $"bucket")
      .write.mode("append").partitionBy("table").parquet(indexDir)
  }

  /** Defragment a stored LSH index after appends — the LSH
    * counterpart of [[compactIvfIndex]] (r12 verdict item 2): each
    * [[appendToLshIndex]] batch adds one bucket-sorted file per
    * touched table directory, and while every file stays individually
    * bucket-ordered, probes pay per-file footer/open cost and
    * per-file row-group pruning degrades as files shrink — the exact
    * overhead the table-partitioned bucket-SORTED layout exists to
    * avoid. One distributed rewrite restores one bucket-ordered file
    * per table (same `repartition($"table")` +
    * `sortWithinPartitions(table, bucket)` discipline as the writer —
    * the dynamic-partition writer's required ordering, see
    * [[writeLshIndex]]), with the plane-count sidecar re-written into
    * the fresh layout BEFORE promotion so no reader ever sees a
    * sidecar-less index. Crash-safe via the same [[swapDirInto]]
    * two-rename (target → `_old`, fresh → target): a crash leaves a
    * complete copy under one of the two names, never a
    * deleted-only state. Tombstoned rows are physically purged by the
    * rewrite (readLshIndex anti-joins them) and the tombstone
    * relation vanishes WITH the retired root — the whole-dir swap is
    * what makes LSH compaction fold deletes with no extra step;
    * otherwise content is unchanged. Single-writer maintenance op
    * like the append (version the index dir for atomic cutover).
    */
  def compactLshIndex(s: SparkSession, indexDir: String): Unit = {
    import s.implicits._
    val src = new org.apache.hadoop.fs.Path(indexDir)
    val tmp = new org.apache.hadoop.fs.Path(indexDir + "_compacting")
    val planes = readLshPlanes(s, indexDir)
    readLshIndex(s, indexDir)
      .select($"vec_id", $"embedding", $"nrm", $"bucket", $"table")
      .repartition($"table").sortWithinPartitions($"table", $"bucket")
      .write.mode("overwrite").partitionBy("table").parquet(tmp.toString)
    val p = new org.apache.hadoop.fs.Path(tmp, "_graft_lsh_planes")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(planes.toString.getBytes("UTF-8")) finally out.close()
    swapDirInto(s, tmp, src)
  }

  // ------------------------------------------------------------------
  // Versioned index root — manifest-pointer atomic cutover (r17
  // verdict item 5), templated on the LSH family. The in-place
  // [[swapDirInto]] maintenance ops carry a stated single-writer
  // contract, but a CONCURRENT READER mid-swap can transiently see a
  // missing directory — and deployments run probes 24/7. Under a
  // versioned root, the layout lives in immutable version dirs and
  // `<root>/_graft_current` names the live one: a probe resolves the
  // pointer ONCE and reads that version for its whole lifetime
  // (snapshot isolation), while compaction builds a NEW version and
  // repoints the manifest with one atomic rename. The pointer file is
  // tiny, so the cutover is atomic on any store with atomic rename;
  // object stores without one version the POINTER via their
  // conditional-put instead — the layout itself never needs renames.
  // Outgoing versions are retired two cutovers later (the two most
  // recent RETIRED generations stay on disk), so a reader that
  // resolved just before a cutover finishes its scan against intact
  // files; the gap this leaves — a reader slower than THREE
  // consecutive compactions — is the stated residual, same as every
  // MVCC store's vacuum horizon, and the retention depth is the
  // cutover call's parameter.
  // ------------------------------------------------------------------

  private def currentPointer(root: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(root, "_graft_current")

  /** Resolve a versioned root's live version directory — called once
    * per probe/maintenance entry, never per file.
    */
  def resolveCurrentVersion(s: SparkSession, root: String): String = {
    val p = currentPointer(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val name =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        "UTF-8").trim
      finally in.close()
    s"$root/$name"
  }

  /** Atomically repoint `<root>/_graft_current` at `version`, then
    * retire every version directory beyond the live one and the
    * `keepRetired` most recent retired generations. The pointer lands
    * via write-temp + atomic rename-overwrite, so a concurrent
    * resolve sees either the old or the new name, never a torn file.
    */
  private[operators] def cutVersion(s: SparkSession, root: String,
      version: String, keepRetired: Int = 2): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val ptr = currentPointer(root)
    val fs = ptr.getFileSystem(conf)
    if (fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
        fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]) {
      // On the local CHECKSUMMED fs the crc sidecar turns the pointer
      // flip into TWO renames (data file, then `.crc`) — a reader
      // between them fails with ChecksumException (caught once by
      // LshVersionedSpec's cutover race). The pointer is a ~12-byte
      // version name: write it RAW (no sidecar — absent crc files are
      // not verified on read) and flip with one ATOMIC_MOVE; retire
      // any sidecar a pre-fix checksummed writer left so readers never
      // verify the new pointer against a stale crc. One-time
      // transitional race, accepted (r18 advice): a reader that opened
      // a stale PRE-FIX .crc before the deleteIfExists below and reads
      // the pointer after the move can still hit one ChecksumException
      // at the upgrade boundary — benign afterward, since no new crc
      // is ever written for the pointer.
      val rootP = java.nio.file.Paths.get(
        new org.apache.hadoop.fs.Path(root).toUri.getPath)
      java.nio.file.Files.createDirectories(rootP)
      val tmpP = rootP.resolve(
        s"_graft_current_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
      java.nio.file.Files.write(tmpP, version.getBytes("UTF-8"))
      java.nio.file.Files.deleteIfExists(
        rootP.resolve("." + ptr.getName + ".crc"))
      java.nio.file.Files.move(tmpP, rootP.resolve(ptr.getName),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      val tmp = new org.apache.hadoop.fs.Path(root,
        s"_graft_current_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
      val out = fs.create(tmp, true)
      try out.write(version.getBytes("UTF-8")) finally out.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        tmp.toUri, conf)
      fc.rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
    // retired versions are immutable, so recency by modification time
    // orders generations; the live version is kept unconditionally
    val vers = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v_"))
    val keep = vers.sortBy(-_.getModificationTime)
      .take(keepRetired + 1).map(_.getPath.getName).toSet + version
    vers.filter(st => !keep.contains(st.getPath.getName))
      .foreach(st => fs.delete(st.getPath, true))
  }

  private[operators] def freshVersionName(): String =
    s"v_${java.util.UUID.randomUUID().toString.replace("-", "").take(12)}"

  /** Build an LSH index under a VERSIONED root: the layout lands in a
    * fresh version dir, then the pointer cuts over — an existing
    * serving root is rebuilt in place with zero reader disruption.
    */
  def writeLshIndexVersioned(s: SparkSession, d: String,
      root: String): Unit = {
    val name = freshVersionName()
    writeLshIndex(s, d, s"$root/$name")
    cutVersion(s, root, name)
  }

  /** Probe a versioned LSH root — [[topkLshStored]] against the
    * version resolved ONCE at entry.
    */
  def topkLshVersioned(s: SparkSession, d: String, root: String,
      k: Int = TopK, multiprobe: Boolean = true,
      pushdownCap: Int = LshProbePushdownCap): DataFrame =
    topkLshStored(s, d, resolveCurrentVersion(s, root), k, multiprobe,
      pushdownCap)

  /** Append into the LIVE version (parquet files are immutable and
    * the append is additive, so concurrent readers are at worst
    * snapshot-stale — they miss the new files they never listed).
    */
  def appendToLshIndexVersioned(s: SparkSession, root: String,
      batch: DataFrame): Unit =
    appendToLshIndex(s, resolveCurrentVersion(s, root), batch)

  /** Tombstone ids in the LIVE version (id-sized append — the
    * [[deleteFromIndex]] contract; a reader that listed the tombstone
    * relation before the append is snapshot-stale for its lifetime).
    */
  def deleteFromIndexVersioned(s: SparkSession, root: String,
      ids: DataFrame): Unit =
    deleteFromIndex(s, resolveCurrentVersion(s, root), ids)

  /** Compact a versioned LSH root with zero reader disruption: the
    * folded, tombstone-purged layout is built as a NEW version dir
    * (planes sidecar first, the compactLshIndex discipline), then the
    * pointer cuts over atomically and generations past the retention
    * horizon retire. In-flight probes keep reading the version they
    * resolved; the next probe resolves the fresh one.
    * LshVersionedSpec drives probes CONCURRENTLY with this and pins
    * zero failures and stable answers.
    */
  def compactLshIndexVersioned(s: SparkSession, root: String): Unit = {
    import s.implicits._
    val cur = resolveCurrentVersion(s, root)
    val name = freshVersionName()
    val fresh = s"$root/$name"
    val planes = readLshPlanes(s, cur)
    readLshIndex(s, cur)
      .select($"vec_id", $"embedding", $"nrm", $"bucket", $"table")
      .repartition($"table").sortWithinPartitions($"table", $"bucket")
      .write.mode("overwrite").partitionBy("table").parquet(fresh)
    writePlanesSidecar(s, fresh, planes)
    cutVersion(s, root, name)
  }

  /** The versioned-root template applied to the IVF family — the
    * same pointer/retention machinery ([[cutVersion]] /
    * [[resolveCurrentVersion]] are family-agnostic), and the family
    * where the atomic cutover matters MOST: in-place
    * [[compactIvfIndex]] performs TWO sequential swaps (assignments,
    * then centroids), so a concurrent reader can catch occupancy out
    * of step with the folded rows even when each swap alone is clean
    * — the versioned cutover replaces both with one pointer flip.
    */
  def writeIvfIndexVersioned(s: SparkSession, d: String, root: String,
      assign: Int = IvfAssign): Unit = {
    val name = freshVersionName()
    writeIvfIndex(s, d, s"$root/$name", assign)
    cutVersion(s, root, name)
  }

  /** Probe a versioned IVF root — [[topkIvfStored]] against the
    * version resolved once at entry.
    */
  def topkIvfVersioned(s: SparkSession, d: String, root: String,
      k: Int = TopK, nprobe: Int = -1, assign: Int = IvfAssign): DataFrame =
    topkIvfStored(s, d, resolveCurrentVersion(s, root), k, nprobe, assign)

  /** Append into the live IVF version (frozen-quantizer assignment,
    * the [[appendToIvfIndex]] contract; readers are at worst
    * snapshot-stale).
    */
  def appendToIvfIndexVersioned(s: SparkSession, root: String,
      batch: DataFrame, assign: Int = IvfAssign): Unit =
    appendToIvfIndex(s, resolveCurrentVersion(s, root), batch, assign)

  /** Compact a versioned IVF root with zero reader disruption: the
    * tombstone-folded assignments land in a NEW version dir, its
    * occupancy is computed from the folded rows, the centroid vectors
    * carry over unchanged, and the pointer flips once — assignments
    * and occupancy become visible ATOMICALLY, where the in-place
    * compactor's two swaps expose an inconsistent pair to a racing
    * reader. [[deleteFromIndexVersioned]] is shared with the LSH root
    * (the tombstone relation is the family-agnostic one).
    */
  def compactIvfIndexVersioned(s: SparkSession, root: String): Unit = {
    import s.implicits._
    val cur = resolveCurrentVersion(s, root)
    val name = freshVersionName()
    val fresh = s"$root/$name"
    // readIvfIndex already collects the centroid relation (sorted by
    // cell) — reuse it for the occupancy rewrite instead of a second
    // read+collect of `$cur/centroids`, and count occupancy from the
    // persisted folded rows instead of re-listing the freshly written
    // assignments (the read-back paid per-file footer cost over the
    // one-file-per-cell layout: measured 1.0 s vs ~0.2 s for the
    // cached agg at sf0.1; the counted relation IS the written one).
    val idx = readIvfIndex(s, cur)
    val folded = idx.assigned
      .select($"vec_id", $"embedding", $"nrm", $"cell")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      folded.repartition($"cell")
        .write.partitionBy("cell").parquet(s"$fresh/assignments")
      val counts = folded.groupBy($"cell").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
      idx.cents.toSeq
        .map { case (cid, cv, cn) =>
          (cid, cv.toSeq, cn, counts.getOrElse(cid, 0L)) }
        .toDF("cell", "centroid", "cnrm", "occupancy")
        .write.parquet(s"$fresh/centroids")
    } finally folded.unpersist(blocking = false)
    cutVersion(s, root, name)
  }

  /** The plane count a stored LSH index was built with (sidecar
    * written by [[writeLshIndex]]).
    */
  def readLshPlanes(s: SparkSession, indexDir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(indexDir, "_graft_lsh_planes")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim.toInt
    finally in.close()
  }

  /** Read a stored LSH index (schema passed for the same
    * partition-column-type reason as [[readIvfIndex]]; `bucket` is a
    * data column sorted within each file, `table` the partition
    * directory).
    */
  def readLshIndex(s: SparkSession, indexDir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.types.StructField("nrm",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("table",
        org.apache.spark.sql.types.IntegerType)))
    minusTombstones(s, indexDir, s.read.schema(schema).parquet(indexDir))
  }

  /** A probe GROUP's distinct (table, bucket) set is pushed to the
    * stored scan as a static filter when it has at most this many
    * pairs — parquet then prunes row groups by the bucket min/max
    * stats the bucket-sorted layout guarantees. The cap bounds filter
    * size per scan: |pairs| ≤ |Q|·NumTables·(planes+1). A query batch
    * whose pair set exceeds the cap no longer falls back to one full
    * scan-join (r13 verdict item 3: that cliff measured 2.4 s →
    * 9.6–17.4 s at sf10) — [[topkLshStored]] greedy-packs the queries
    * into cap-sized groups and unions the per-group probes, so every
    * scan keeps its pushdown and total row groups read stays
    * proportional to the buckets actually probed.
    */
  val LshProbePushdownCap = 65536

  /** Probe a STORED LSH index (written by [[writeLshIndex]]) — query
    * buckets are computed with the index's stored plane count, and the
    * bounded probed-bucket set is pushed down as a per-table IN filter
    * so the scan reads only probed row groups (the bucket-directory
    * pruning the old 2^planes-directory layout did, without its
    * directory explosion).
    */
  def topkLshStored(s: SparkSession, d: String, indexDir: String,
      k: Int = TopK, multiprobe: Boolean = true,
      pushdownCap: Int = LshProbePushdownCap): DataFrame =
    topkLshStoredFor(s, querySet(s, d), indexDir, k, multiprobe, pushdownCap)

  /** The stored-LSH probe for an ARBITRARY query relation
    * (q_id, q_emb, q_nrm) — the serving entry point: queries are
    * independent rows, so any batch of them (a micro-batch of live
    * lookups, a backfill slice) probes the same stored index through
    * the same pushdown machinery. [[topkLshStored]] is this applied
    * to the declared corpus query set.
    */
  def topkLshStoredFor(s: SparkSession, queries: DataFrame,
      indexDir: String, k: Int = TopK, multiprobe: Boolean = true,
      pushdownCap: Int = LshProbePushdownCap): DataFrame = {
    val planes = readLshPlanes(s, indexDir)
    // the probe-bucket relation is the join's BROADCAST side —
    // driver-sized by definition — so it is collected ONCE and
    // rebuilt as a local relation: the pushdown set derives from the
    // same collected rows (one evaluation, no drift) with no
    // session-lifetime persist (r12 advice: the old MEMORY_AND_DISK
    // cache was never unpersisted, pinning one RDD per probe call in
    // the block manager for the session's lifetime)
    val qDf = probeBuckets(queries, planes, multiprobe)
    val qRows = qDf.collect()
    
    val ti = qDf.schema.fieldIndex("table")
    val bi = qDf.schema.fieldIndex("bucket")
    val idx = readLshIndex(s, indexDir)
    if (qRows.isEmpty) // no queries → empty probe
      return probeJoin(s, idx.filter(lit(false)), s.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        qDf.schema), k)
    val pairs = qRows.map(r => (r.getInt(ti), r.getInt(bi))).toSet
    if (pairs.size <= pushdownCap) {
      // under-cap: one scan, one pushed filter — the proven plan
      val q = s.createDataFrame(java.util.Arrays.asList(qRows: _*), qDf.schema)
      val byTable = pairs.groupBy(_._1)
        .map { case (t, rs) => (t, rs.map(_._2).toSeq.sorted) }
      val pruned = idx.filter(byTable.map { case (t, bs) =>
        col("table") === t && col("bucket").isin(bs.map(Integer.valueOf): _*)
      }.reduce(_ || _))
      return probeJoin(s, pruned, q, k)
    }
    // Over-cap (r13 verdict item 3): chunk the BUCKET space, not the
    // query set. The index is table-partitioned and bucket-sorted, so
    // a chunk of contiguous (table, bucket) pairs prunes to exactly
    // its own files/row groups — G chunks together read the probed
    // buckets ONCE, where G query-groups would re-scan the index G
    // times (measured: query-grouping at sf10 sat at ~11 s, no better
    // than the full-scan fallback it replaced). Each (table, bucket)
    // pair — index AND query side — lands in exactly one chunk, so
    // the unioned candidate multiset equals the unsplit join's, and
    // the shared dedup/rank tail makes the answer identical
    // (IndexStoreSpec pins it under a forced tiny cap).
    val byPair = qRows.groupBy(r => (r.getInt(ti), r.getInt(bi)))
    val chunks = pairs.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (t, ps) =>
        ps.map(_._2).toSeq.sorted.grouped(pushdownCap).map(bs => (t, bs))
    }
    val scored = chunks.map { case (t, bs) =>
      val pruned = idx.filter(col("table") === t &&
        col("bucket").isin(bs.map(Integer.valueOf): _*))
      val rows = bs.flatMap(b => byPair.getOrElse((t, b), Array.empty)).toArray
      val gq = s.createDataFrame(
        java.util.Arrays.asList(rows: _*), qDf.schema)
      probeScore(s, pruned, gq)
    }.reduce(_.union(_))
    probeRank(s, scored, k)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_bruteforce" -> ((s, d) => topkBruteForce(s, d)),
    "sim_hard_negatives" -> ((s, d) => hardNegatives(s, d)),
    // the deployment-scale miner: stored label-carrying IVF, probed —
    // see hardNegativesAnn; oracle is the full probe restated with
    // trained centroid literals (dynamicOracles)
    "sim_hard_negatives_ann" -> ((s, d) => hardNegativesAnn(s, d)),
    "sim_hybrid_rrf" -> ((s, d) => hybridRrf(s, d)),
    // The hybrid nightly build as its own bench line (the pairs_build
    // convention): writes BOTH stored artifacts (dense-leg LSH index +
    // lexical-leg pair relation) and declares the heavier one — the
    // pair relation read back from disk — as the verifiable output
    // (the LSH half's content is lsh_build's oracle, same index
    // written to a second dir). Runs first in bench order, so the
    // three hybrid consumers below measure steady-state serving cost.
    "hybrid_build" -> { (s, d) =>
      import s.implicits._
      val (_, pairsDir) = hybridArtifacts(s, d)
      Dedup.readJaccardPairs(s, pairsDir)
        .select($"id_a", $"id_b", round($"jaccard", 6).as("jaccard"))
    },
    // hybrid retrieval from stored artifacts (dense = stored-LSH
    // probe, lex = stored pair relation) — own oracle: the dense leg
    // is approximate by design, so it is NOT sim_hybrid_rrf's answer
    "sim_hybrid_stored" -> { (s, d) =>
      val (lshDir, pairsDir) = hybridArtifacts(s, d)
      hybridRrfStored(s, d, lshDir, pairsDir)
    },
    // the per-request serving form: a query SLICE answered from the
    // pre-built artifacts — see [[hybridRrfServe]]
    "sim_hybrid_serve" -> { (s, d) =>
      val (lshDir, pairsDir) = hybridArtifacts(s, d)
      hybridRrfServe(s, d, lshDir, pairsDir)
    },
    // fusion-level quality audit (the sim_recall_eval convention one
    // level up): per query, how much of the EXACT hybrid ranking the
    // stored/approximate serving path retains — the number a
    // deployment tracks when it trades the brute-force leg for the
    // LSH probe
    "sim_hybrid_recall_eval" -> { (s, d) =>
      import s.implicits._
      val (lshDir, pairsDir) = hybridArtifacts(s, d)
      val exact = hybridRrf(s, d).select($"q_id", $"n_id")
      val stored = hybridRrfStored(s, d, lshDir, pairsDir)
        .select($"q_id", $"n_id", lit(1).as("hit"))
      exact.join(stored, Seq("q_id", "n_id"), "left_outer")
        .groupBy($"q_id")
        .agg(count(lit(1)).as("n_true"),
          count($"hit").as("n_hits"),
          round(count($"hit").cast("double") / count(lit(1)), 6)
            .as("recall"))
    },
    "sim_range" -> ((s, d) => rangeSearch(s, d)),
    // ANN quality audit — recall@k of the IVF probe against the
    // brute-force truth, the metric every ANN deployment tracks
    // before trading exactness for speed. Both inputs are declared
    // queries (truth from the same rounded-cosine kernel, candidates
    // from the cached build-once index), each |Q|·k rows — the join
    // and per-query agg are trivia next to the scans they audit, so
    // the line measures steady-state probe+scan cost. n_true counts
    // the truth rows (k when the corpus has that many neighbors), so
    // recall stays honest on degenerate tiny-corpus queries.
    "sim_recall_eval" -> { (s, d) =>
      import s.implicits._
      val bf = topkBruteForce(s, d).select($"q_id", $"n_id")
      val ivf = topkIvf(s, d).select($"q_id", $"n_id", lit(1).as("hit"))
      bf.join(ivf, Seq("q_id", "n_id"), "left")
        .groupBy($"q_id")
        .agg(count(lit(1)).as("n_true"), count($"hit").as("n_hits"))
        .select($"q_id", $"n_true", $"n_hits",
          round($"n_hits".cast("double") / $"n_true", 6).as("recall"))
    },
    // Plane-derived variants (lsh/proj) are fully oracled via the
    // compiled-in literal plane/matrix trick; the IVF family is oracled
    // the same way with the TRAINED centroids rendered at Verify time
    // (see dynamicOracles below). Recall is additionally spec-tested
    // against the brute-force baseline.
    "sim_ann_lsh" -> ((s, d) => topkLsh(s, d)),
    // The STORED-path form of sim_ann_lsh (the sim_ann_ivf_stored
    // pattern): write the bucketed index as table-partitioned,
    // bucket-SORTED parquet with its plane-count sidecar, probe
    // through the stored readers — buckets computed with the INDEX's
    // recorded sizing, the probed-bucket set pushed down so row-group
    // stats prune the scan. Same answer as sim_ann_lsh by
    // construction, so it shares that oracle verbatim.
    "sim_ann_lsh_stored" -> { (s, d) =>
      topkLshStored(s, d, writeLshIndexOnce(s, d))
    },
    // The DELETE half of the stored lifecycle as a declared query
    // (takedown/right-to-erasure): build the index, tombstone the
    // deterministic purge slice, probe THROUGH the tombstones — a
    // deleted vector never surfaces as a neighbor, the multi-TB
    // layout is untouched, and the probe keeps its bucket pushdown
    // (the anti-join sits above the pruned scan). Physical purge =
    // compactLshIndex; IndexDeleteSpec pins tombstoned ≡ compacted.
    "sim_ann_lsh_purged" -> { (s, d) =>
      // snapshot-clone of the shared stored index (build-once
      // attribution): this line measures clone + delete + probe —
      // the takedown cost against an EXISTING index
      val dir = storedQueryDir("lshpurge", d)
      cloneIndexDir(s, writeLshIndexOnce(s, d), dir,
        Seq("_graft_tombstones"))
      deleteFromIndex(s, dir, purgeIds(s, d))
      topkLshStored(s, d, dir)
    },
    // The 24/7-serving lifecycle on a VERSIONED root (manifest-pointer
    // atomic cutover): build a version, cut the pointer, compact into
    // a SECOND version + cut again, probe through the resolved live
    // version — reader-visible state flips atomically, never through
    // the in-place swap's missing-directory window (LshVersionedSpec
    // drives probes concurrently with the compaction). Answers equal
    // sim_ann_lsh by construction — shared oracle.
    "sim_ann_lsh_versioned" -> { (s, d) =>
      // first version = snapshot-clone of the shared base layout
      // (byte-identical to writeLshIndexVersioned's fresh build —
      // the write is deterministic), so this line measures the
      // lifecycle it declares: cutover + compaction + probe
      val root = storedQueryDir("lshver", d)
      val name = freshVersionName()
      cloneIndexDir(s, writeLshIndexOnce(s, d), s"$root/$name",
        Seq("_graft_tombstones"))
      cutVersion(s, root, name)
      compactLshIndexVersioned(s, root)
      topkLshVersioned(s, d, root)
    },
    "lsh_build" -> { (s, d) =>
      import s.implicits._
      // the shared STORED base layout is written here too
      // (writeLshIndexOnce — the bm25_build convention): the *_build
      // line carries the corpus build, so the stored/purged/versioned
      // consumers measure steady-state probe + maintenance cost
      writeLshIndexOnce(s, d)
      lshIndex(s, d).select($"vec_id", $"table", $"bucket")
    },
    // The index build as a first-class, separately-benchmarked step
    // (runs before sim_ann_ivf in the alphabetical bench order, so the
    // sim_ann_ivf line is the steady-state probe cost; sim_ann_ivf is
    // correct without it — it builds on cache miss).
    "ivf_build" -> { (s, d) =>
      import s.implicits._
      // stored base written here too (the lsh_build note above)
      writeIvfIndexOnce(s, d)
      ivfIndex(s, d).assigned.select($"vec_id", $"cell")
    },
    "sim_ann_ivf" -> ((s, d) => topkIvf(s, d)),
    // The STORED-path form of sim_ann_ivf (round-11 verdict item 4;
    // dedup_cluster_stored's pattern applied to the similarity side):
    // write the built IVF index — centroid layout + cell-partitioned
    // assignments — then probe it through the stored readers, so the
    // one-job-builds / later-jobs-probe ANN lifecycle sits under the
    // driver's oracle gate and the bench, not just IndexStoreSpec.
    // Same answer as sim_ann_ivf by construction (the stored probe
    // reads back the identical centroids and assignments —
    // IndexStoreSpec pins fresh-session parity), so it shares that
    // oracle verbatim.
    "sim_ann_ivf_stored" -> { (s, d) =>
      topkIvfStored(s, d, writeIvfIndexOnce(s, d))
    },
    // The versioned-root lifecycle on the IVF family (the
    // sim_ann_lsh_versioned template ported — r18): build a version,
    // compact into a second one (assignments + occupancy become
    // visible atomically via the pointer flip, where the in-place
    // compactor's two swaps can expose an inconsistent pair to a
    // racing reader), probe the live version. Same answers as
    // sim_ann_ivf by construction — shared dynamic oracle.
    "sim_ann_ivf_versioned" -> { (s, d) =>
      // first version = snapshot-clone of the shared base (the
      // sim_ann_lsh_versioned convention): the line measures
      // cutover + compaction + probe, not a repeat corpus build
      val root = storedQueryDir("ivfver", d)
      val name = freshVersionName()
      cloneIndexDir(s, writeIvfIndexOnce(s, d), s"$root/$name",
        Seq("_graft_tombstones"))
      cutVersion(s, root, name)
      compactIvfIndexVersioned(s, root)
      topkIvfVersioned(s, d, root)
    },
    // IVF twin of sim_ann_lsh_purged: same tombstone relation, same
    // reader-side anti-join, cell pruning preserved. Occupancy (and
    // so the probe's nprobe pricing) reads the PRE-delete counts until
    // compaction refreshes them — stated, and exactly what keeps this
    // oracle-exact against the session-trained nprobe.
    "sim_ann_ivf_purged" -> { (s, d) =>
      // snapshot-clone of the shared stored index — clone + delete +
      // probe (the sim_ann_lsh_purged attribution)
      val dir = storedQueryDir("ivfpurge", d)
      cloneIndexDir(s, writeIvfIndexOnce(s, d), dir,
        Seq("_graft_tombstones"))
      deleteFromIndex(s, dir, purgeIds(s, d))
      topkIvfStored(s, d, dir)
    },
    // Coarse-to-fine ANN over the JL projection: score EVERY corpus
    // vector in the 16-dim projected space (4× less arithmetic and
    // memory traffic than full-width scoring), keep the top
    // ProjCandidates per query, then re-rank only those candidates
    // with the exact 64-dim cosine. At corpus scale the projected
    // vectors are the stored search structure (project once, like the
    // LSH/IVF builds); unlike bucketed ANN there is no recall cliff
    // from hard cell boundaries — candidates are a global projected
    // top-C. Fully hash-oracled (literal matrix); recall floor
    // additionally spec-pinned.
    "sim_ann_proj" -> ((s, d) => topkProjected(s, d)),
    // Declared form emits exploded scalar rows (vec_id, dim, pv) — the
    // driver's pandas compare can't hash a raw array column (the
    // emb_project pattern) — and is fully hash-oracled via the literal
    // projection matrix. The build itself (projIndex persist) is what
    // the bench line times; the explode is a narrow decoration.
    "proj_build" -> { (s, d) =>
      import s.implicits._
      projIndex(s, d)
        .select($"vec_id", posexplode($"pv").as(Seq("dim", "pv")))
        .select($"vec_id", $"dim", round($"pv".cast("double"), 6).as("pv"))
    })

  /** Deterministic per-corpus location for a declared stored-index /
    * stored-model round trip (`sim_ann_ivf_stored` and the family it
    * templated: lsh/pq/pca/bpe stored probes) — under the JVM temp
    * dir, keyed by corpus path (hashCode keeps the key injective past
    * sanitization) and pid (two JVMs on the same fixture never race
    * one directory's overwrite against the other's read). Residue is
    * temp-dir-reclaimed, ≤ a few MB per fixture per process.
    */
  /** The hybrid-retrieval stored artifacts (dense-leg LSH index +
    * lexical-leg verified-jaccard pair relation), written ONCE per
    * (session, corpus) — sim_hybrid_stored and sim_hybrid_recall_eval
    * both consume them, and the pair-relation write is the family's
    * heaviest build (pairs_build alone is ~110 s at sf10), so a second
    * rebuild inside the same session is pure waste. Standalone runs
    * stay self-contained: the first caller builds.
    */
  private def hybridArtifacts(s: SparkSession, d: String): (String, String) =
    hybridArtifactsCache.getOrBuild(s, d) {
      // the dense leg IS the shared stored LSH base (same write, same
      // bytes — build-once attribution, r18); consumers only read it,
      // and every mutating lifecycle clones before touching a layout
      val lshDir = writeLshIndexOnce(s, d)
      val pairsDir = storedQueryDir("hybpairs", d)
      // size-adaptive: the sliced build above the measured disk-wall
      // threshold (bit-identical output), the single-plan build below
      Dedup.writeJaccardPairsAuto(s, d, pairsDir)
      (lshDir, pairsDir)
    }

  private val hybridArtifactsCache = new SessionCache[(String, String)]()

  private[graft] def storedQueryDir(kind: String, d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_stored_${kind}_" +
      d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      java.lang.Integer.toHexString(d.hashCode) + "_p" +
      ProcessHandle.current().pid()

  private def storedIvfDir(d: String): String = storedQueryDir("ivf", d)

  /** Shared stored base layouts, written at most once per (session,
    * corpus) — build-once attribution (the writeLexIndexOnce
    * convention, r18): the stored probes serve the base directly;
    * the purged/versioned lifecycle queries snapshot it by file clone
    * ([[cloneIndexDir]]), so no declared line re-bills the corpus
    * build. First-caller-builds is answer-identical regardless of
    * bench order — the write is a pure function of (corpus, dir).
    */
  private val lshWriteOnce = new SessionCache[String]()
  def writeLshIndexOnce(s: SparkSession, d: String): String =
    lshWriteOnce.getOrBuild(s, d) {
      val dir = storedQueryDir("lsh", d)
      writeLshIndex(s, d, dir)
      dir
    }

  private val ivfWriteOnce = new SessionCache[String]()
  def writeIvfIndexOnce(s: SparkSession, d: String): String =
    ivfWriteOnce.getOrBuild(s, d) {
      val dir = storedIvfDir(d)
      writeIvfIndex(s, d, dir)
      dir
    }

  /** Candidate pool per query for [[topkProjected]]: the re-rank
    * budget must COVER the query's local neighborhood (its topic
    * cluster) — within-neighborhood ordering is exactly what the
    * projection blurs, so the exact pass needs the whole neighborhood
    * to re-rank. 100 ≈ the fixture/test cluster size (measured recall
    * 0.99 there; 0.61 at C=25). Scale C with expected cluster size,
    * not with corpus size.
    */
  val ProjCandidates = 100

  /** The projected corpus as a build-once index (like [[lshIndex]] /
    * [[ivfIndex]]): projected once per (session, corpus), persisted —
    * at deployment scale the 16-dim vectors are a stored table and
    * queries only scan it. `proj_build` benchmarks the build on its
    * own line; `sim_ann_proj` is the steady-state search cost.
    */
  private val projIndexCache = new SessionCache[DataFrame](df =>
    scala.util.Try(df.unpersist(blocking = false)))

  def projIndex(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.VectorFunctions
    projIndexCache.getOrBuild(s, d) {
      // the projection kernel is n·16·64 multiply-adds riding the
      // scan — the same work-conditioned widening as the other index
      // builds (sized once per session-cached build)
      val emb = Tables.embeddings(s, d)
      widenIfStarved(s, emb,
          rowCount(s, emb).toDouble * 16 * Dim, $"vec_id")
        .select($"vec_id", Embeddings.projectUdf($"embedding").as("pv"))
        .select($"vec_id", $"pv", VectorFunctions.norm($"pv").as("pn"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
  }

  def topkProjected(s: SparkSession, d: String, k: Int = TopK,
      candidates: Int = ProjCandidates): DataFrame =
    coarseFineTopk(s, d, projIndex(s, d), k, candidates)

  /** The coarse-to-fine probe shared by the JL ([[topkProjected]]) and
    * trained-PCA ([[Pca.topkPca]]) paths: `idx` is any projected index
    * (vec_id, pv: float or double array, pn); projected cosine over
    * the full corpus keeps top-C per query (UNROUNDED — bit-identical
    * doubles on both engines make the order exact), then the exact
    * full-width cosine re-ranks only the candidates. One definition so
    * the tie-breaks/rounding can never drift between the two kernels
    * and their oracles.
    */
  private[operators] def coarseFineTopk(s: SparkSession, d: String,
      idx: DataFrame, k: Int, candidates: Int): DataFrame = {
    import s.implicits._
    import graft.functions.VectorFunctions
    // coarse pass: projected cosine over the full corpus, top-C kept —
    // as a broadcast-MATRIX scan, not a join. The broadcast
    // nested-loop join form materialized BOTH projected vectors into
    // every one of the |Q|·n joined rows (≈120 GB of row copies at
    // sf10) before the projection computed one double from them, and
    // then exchanged+sorted the full scored stream for the rank
    // window; at 100× bench scale that was minutes of spill. Here the
    // collected query matrix (|Q|·projDim doubles — driver-bounded by
    // the 1/QueryStride sampling) rides a broadcast; ONE pass over
    // the corpus scores each row against all queries in primitive
    // arrays and feeds per-query bounded buffers ([[TopBuf]]), so
    // only per-partition winners (≤ partitions·|Q|·C rows) reach the
    // exact rank window. Output-invariant: same left-to-right double
    // dot, same dot/q_pn/pn division order, same
    // (sim DESC total order, id ASC) comparator as the window —
    // per-partition top-C is a superset of global top-C.
    val coarse = coarseScanTopC(s, d, idx, candidates)
      .withColumn("crank", row_number().over(
        Window.partitionBy($"q_id").orderBy($"proj_sim".desc, $"n_id".asc)))
      .filter($"crank" <= candidates)
      .select($"q_id", $"n_id")
    // fine pass: exact full-width cosine on the C candidates only
    val full = corpus(s, d)
    val fine = coarse
      .join(full.select($"vec_id".as("n_id"), $"embedding", $"nrm"), Seq("n_id"))
      .join(broadcast(querySet(s, d)), Seq("q_id"))
      .select($"q_id", $"n_id",
        round(VectorFunctions.cosineFrom(
          VectorFunctions.dot($"q_emb", $"embedding"), $"q_nrm", $"nrm"),
          4).as("cos_sim"))
    fine
      .withColumn("rank", row_number().over(
        Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"n_id".asc)))
      .filter($"rank" <= k)
      .select($"q_id", $"n_id", $"cos_sim", $"rank".cast("int").as("rank"))
  }

  private[operators] def sqlCos(a: String, b: String): String =
    s"""(list_sum(list_transform(generate_series(1, len($a)),
        i -> $a[i]::DOUBLE * $b[i]::DOUBLE))
      / SQRT(list_sum(list_transform(generate_series(1, len($a)),
        i -> $a[i]::DOUBLE * $a[i]::DOUBLE)))
      / SQRT(list_sum(list_transform(generate_series(1, len($b)),
        i -> $b[i]::DOUBLE * $b[i]::DOUBLE))))"""

  /** The LSH probe pipeline restated in SQL, parameterized by an
    * extra predicate on the INDEX side of the candidate join
    * (`b` = the bucketed corpus rows) — "" for the plain probe, the
    * purge-slice exclusion for sim_ann_lsh_purged. Queries are never
    * filtered: deletion removes a vector from the index, not from the
    * set of askers.
    */
  private def lshOracleSql(indexPred: String): String =
    s"""WITH prm AS (SELECT ${planesPrmSql()} AS np),
          buck AS (
            SELECT vec_id, embedding, CAST(g.t - 1 AS INT) AS tbl,
              CAST(COALESCE(list_sum(list_transform(generate_series(1, prm.np),
                p -> CASE WHEN COALESCE(list_sum(list_transform(generate_series(1, $Dim),
                  i -> embedding[i]::DOUBLE * m.pl[g.t][p][i])), 0.0) >= 0
                THEN 1 << (p - 1) ELSE 0 END)), 0) AS INT) AS bucket
            FROM embeddings, (SELECT $planesSql AS pl) m, prm,
              generate_series(1, $NumTables) AS g(t)),
          qprobe AS (
            SELECT vec_id AS q_id, tbl,
              CASE WHEN f.fl = -1 THEN bucket ELSE xor(bucket, 1 << f.fl) END AS bucket
            FROM buck, prm, generate_series(-1, ${MaxPlanes - 1}) AS f(fl)
            WHERE f.fl < prm.np AND vec_id % $QueryStride = 0),
          cand AS (
            SELECT DISTINCT q.q_id, b.vec_id AS n_id
            FROM qprobe q JOIN buck b ON q.tbl = b.tbl AND q.bucket = b.bucket
            WHERE q.q_id <> b.vec_id $indexPred),
          scored AS (
            SELECT c.q_id, c.n_id, ROUND(${sqlCos("q.embedding", "n.embedding")}, 4) + 0.0 AS cos_sim
            FROM cand c JOIN embeddings q ON q.vec_id = c.q_id
                       JOIN embeddings n ON n.vec_id = c.n_id)
          SELECT q_id, n_id, cos_sim, rank FROM (
            SELECT q_id, n_id, cos_sim, CAST(ROW_NUMBER() OVER (
              PARTITION BY q_id ORDER BY cos_sim DESC, n_id ASC) AS INT) AS rank
            FROM scored) WHERE rank <= $TopK"""

  private val baseOracles: Map[String, String] = Map(
    "sim_topk_bruteforce" ->
      s"""WITH scored AS (
            SELECT q.vec_id AS q_id, c.vec_id AS n_id,
              ROUND(${sqlCos("q.embedding", "c.embedding")}, 4) + 0.0 AS cos_sim
            FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
            WHERE q.vec_id % $QueryStride = 0)
          SELECT q_id, n_id, cos_sim, rank FROM (
            SELECT q_id, n_id, cos_sim, CAST(ROW_NUMBER() OVER (
              PARTITION BY q_id ORDER BY cos_sim DESC, n_id ASC) AS INT) AS rank
            FROM scored) WHERE rank <= $TopK""",
    // the brute-force restatement with the label inequality AT the
    // join, labels carried through (the engine rejoins them post-rank;
    // same rows either way since labels are functionally dependent on
    // the ids)
    "sim_hard_negatives" ->
      s"""WITH scored AS (
            SELECT q.vec_id AS q_id, q.label AS q_label,
              c.vec_id AS n_id, c.label AS n_label,
              ROUND(${sqlCos("q.embedding", "c.embedding")}, 4) + 0.0 AS cos_sim
            FROM embeddings q JOIN embeddings c
              ON q.vec_id <> c.vec_id AND q.label <> c.label
            WHERE q.vec_id % $QueryStride = 0)
          SELECT q_id, q_label, n_id, n_label, cos_sim, rank FROM (
            SELECT q_id, q_label, n_id, n_label, cos_sim,
              CAST(ROW_NUMBER() OVER (
                PARTITION BY q_id ORDER BY cos_sim DESC, n_id ASC) AS INT) AS rank
            FROM scored) WHERE rank <= $HardNegK""",
    // Hybrid RRF restated end-to-end: the lexical leg is the shared
    // DF-bounded jaccardCte (Dedup's pair relation verbatim), the
    // dense leg the brute-force rounded-cosine ranking, fusion the
    // 2-term reciprocal-rank sum with 1.0::DOUBLE (the DECIMAL-literal
    // lesson), rounded(6) before the final rank so ties break
    // engine-identically.
    "sim_hybrid_rrf" ->
      s"""${graft.operators.Dedup.jaccardCte},
          dense0 AS (
            SELECT q.vec_id AS q_id, c.vec_id AS n_id,
              ROUND(${sqlCos("q.embedding", "c.embedding")}, 4) + 0.0 AS cos_sim
            FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
            WHERE q.vec_id % $QueryStride = 0),
          dense AS (SELECT q_id, n_id, r_dense FROM (
            SELECT q_id, n_id, ROW_NUMBER() OVER (
              PARTITION BY q_id ORDER BY cos_sim DESC, n_id ASC) AS r_dense
            FROM dense0) WHERE r_dense <= $TopK),
          lex0 AS (SELECT id_a AS q_id, id_b AS n_id, j FROM pairs
            UNION ALL SELECT id_b, id_a, j FROM pairs),
          lex AS (SELECT q_id, n_id, r_lex FROM (
            SELECT q_id, n_id, ROW_NUMBER() OVER (
              PARTITION BY q_id ORDER BY ROUND(j, 6) DESC, n_id ASC) AS r_lex
            FROM lex0 WHERE q_id % $QueryStride = 0) WHERE r_lex <= $TopK),
          fused AS (SELECT
              COALESCE(d.q_id, l.q_id) AS q_id,
              COALESCE(d.n_id, l.n_id) AS n_id,
              ROUND(COALESCE(1.0::DOUBLE / ($RrfK0 + d.r_dense), 0.0)
                + COALESCE(1.0::DOUBLE / ($RrfK0 + l.r_lex), 0.0), 6) + 0.0 AS rrf
            FROM dense d FULL OUTER JOIN lex l
              ON d.q_id = l.q_id AND d.n_id = l.n_id)
          SELECT q_id, n_id, rrf, rank FROM (
            SELECT q_id, n_id, rrf, CAST(ROW_NUMBER() OVER (
              PARTITION BY q_id ORDER BY rrf DESC, n_id ASC) AS INT) AS rank
            FROM fused) WHERE rank <= $TopK""",
    // The stored hybrid: the LSH probe pipeline (nested WITH — the
    // sim_recall_eval parenthesized-CTE-body trick) as the dense leg,
    // the shared jaccard CTEs as the lexical leg, the same RRF tail.
    "sim_hybrid_stored" ->
      s"""WITH dense1 AS (${lshOracleSql("")}),
          ${graft.operators.Dedup.jaccardCte.replaceFirst("WITH ", "")},
          dense AS (SELECT q_id, n_id, rank AS r_dense FROM dense1),
          lex0 AS (SELECT id_a AS q_id, id_b AS n_id, j FROM pairs
            UNION ALL SELECT id_b, id_a, j FROM pairs),
          lex AS (SELECT q_id, n_id, r_lex FROM (
            SELECT q_id, n_id, ROW_NUMBER() OVER (
              PARTITION BY q_id ORDER BY ROUND(j, 6) DESC, n_id ASC) AS r_lex
            FROM lex0 WHERE q_id % $QueryStride = 0) WHERE r_lex <= $TopK),
          fused AS (SELECT
              COALESCE(d.q_id, l.q_id) AS q_id,
              COALESCE(d.n_id, l.n_id) AS n_id,
              ROUND(COALESCE(1.0::DOUBLE / ($RrfK0 + d.r_dense), 0.0)
                + COALESCE(1.0::DOUBLE / ($RrfK0 + l.r_lex), 0.0), 6) + 0.0 AS rrf
            FROM dense d FULL OUTER JOIN lex l
              ON d.q_id = l.q_id AND d.n_id = l.n_id)
          SELECT q_id, n_id, rrf, rank FROM (
            SELECT q_id, n_id, rrf, CAST(ROW_NUMBER() OVER (
              PARTITION BY q_id ORDER BY rrf DESC, n_id ASC) AS INT) AS rank
            FROM fused) WHERE rank <= $TopK""",
    // The brute-force CTE minus the window: the gate compares the
    // rounded score against the radius cast ::DOUBLE (DuckDB parses
    // the bare literal as DECIMAL — the emb_outliers lesson).
    "sim_range" ->
      s"""WITH scored AS (
            SELECT q.vec_id AS q_id, c.vec_id AS n_id,
              ROUND(${sqlCos("q.embedding", "c.embedding")}, 4) AS cos_sim
            FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
            WHERE q.vec_id % $QueryStride = 0)
          SELECT q_id, n_id, cos_sim FROM scored
          WHERE cos_sim >= $RangeRadius::DOUBLE""",
    // Same seeded projection matrix as a SQL literal (shared with
    // emb_project): REAL cast mirrors the kernel's acc.toFloat, the
    // outer DOUBLE + round mirrors the declared query. COALESCE pins
    // the empty-embedding case (kernel sums zero terms → 0.0f; DuckDB
    // list_sum over no rows → NULL).
    "proj_build" ->
      s"""SELECT vec_id, CAST(g.k - 1 AS INT) AS dim,
          ROUND(CAST(CAST(COALESCE(list_sum(list_transform(generate_series(1, $Dim),
            i -> embedding[i]::DOUBLE * m.p[g.k][i])), 0.0) AS REAL) AS DOUBLE), 6) + 0.0 AS pv
          FROM embeddings, (SELECT ${Embeddings.projMatrixSql} AS p) m,
            generate_series(1, ${Embeddings.ProjDim}) AS g(k)""",
    // Sign-bit bucket per (vector, table) from the literal hyperplane
    // tensor: bit p set iff dot(embedding, plane[t][p]) >= 0 — the same
    // double accumulation on both engines, so buckets are hash-exact.
    // COALESCE(..., 0.0) >= 0 pins the empty-embedding case (kernel:
    // dot stays 0.0 → every bit set). The plane count is re-derived
    // from COUNT(*) by the prm CTE ([[planesPrmSql]]) — the oracle
    // follows the occupancy-adaptive sizing automatically.
    "lsh_build" ->
      s"""WITH prm AS (SELECT ${planesPrmSql()} AS np)
          SELECT vec_id, CAST(g.t - 1 AS INT) AS "table",
          CAST(COALESCE(list_sum(list_transform(generate_series(1, prm.np),
            p -> CASE WHEN COALESCE(list_sum(list_transform(generate_series(1, $Dim),
              i -> embedding[i]::DOUBLE * m.pl[g.t][p][i])), 0.0) >= 0
            THEN 1 << (p - 1) ELSE 0 END)), 0) AS INT) AS bucket
          FROM embeddings, (SELECT $planesSql AS pl) m, prm,
            generate_series(1, $NumTables) AS g(t)""",
    // Full LSH probe restated in SQL: same sign-bit buckets (above),
    // query side fanned out over the no-flip probe (-1) plus all
    // Hamming-1 flips (flip count = the adaptive plane count),
    // candidates deduped across tables, exact cosine re-rank — the
    // literal planes make the whole approximate operator
    // deterministic, hence hash-checkable.
    "sim_ann_lsh" -> lshOracleSql(""),
    // Coarse-to-fine projected ANN restated in SQL: identical JL
    // projection (literal matrix, REAL cast), unrounded projected
    // cosine picks the top-C candidates per query (bit-equal doubles →
    // identical order), exact full-width cosine re-ranks them.
    "sim_ann_proj" ->
      s"""WITH pv AS (
            SELECT vec_id, embedding,
              list_transform(generate_series(1, ${Embeddings.ProjDim}), k ->
                CAST(COALESCE(list_sum(list_transform(generate_series(1, $Dim),
                  i -> embedding[i]::DOUBLE * m.p[k][i])), 0.0) AS REAL)) AS pv
            FROM embeddings, (SELECT ${Embeddings.projMatrixSql} AS p) m),
          coarse AS (
            SELECT q_id, n_id FROM (
              SELECT q.vec_id AS q_id, c.vec_id AS n_id, ROW_NUMBER() OVER (
                PARTITION BY q.vec_id ORDER BY ${sqlCos("q.pv", "c.pv")} DESC, c.vec_id ASC) AS crank
              FROM pv q JOIN pv c ON q.vec_id <> c.vec_id
              WHERE q.vec_id % $QueryStride = 0) WHERE crank <= $ProjCandidates),
          scored AS (
            SELECT c.q_id, c.n_id, ROUND(${sqlCos("q.embedding", "n.embedding")}, 4) + 0.0 AS cos_sim
            FROM coarse c JOIN embeddings q ON q.vec_id = c.q_id
                         JOIN embeddings n ON n.vec_id = c.n_id)
          SELECT q_id, n_id, cos_sim, rank FROM (
            SELECT q_id, n_id, cos_sim, CAST(ROW_NUMBER() OVER (
              PARTITION BY q_id ORDER BY cos_sim DESC, n_id ASC) AS INT) AS rank
            FROM scored) WHERE rank <= $TopK""")

  /** Static oracles — the stored LSH probe shares sim_ann_lsh's SQL
    * verbatim: the stored round trip may not change the answer
    * (IndexStoreSpec pins fresh-session parity), so a divergence reads
    * as a stored-path bug, exactly what the gate should catch.
    */
  val oracles: Map[String, String] =
    baseOracles +
      // exact-vs-stored hybrid overlap: both pipelines verbatim as
      // nested CTE bodies, joined on (q_id, n_id) — COUNT(st.n_id)
      // counts only matched rows under the LEFT JOIN (the
      // sim_recall_eval shape; lives OUTSIDE baseOracles because it
      // composes two of its entries)
      ("sim_hybrid_recall_eval" ->
        s"""WITH ex AS (${baseOracles("sim_hybrid_rrf")}),
            st AS (${baseOracles("sim_hybrid_stored")})
            SELECT ex.q_id, COUNT(*) AS n_true, COUNT(st.n_id) AS n_hits,
              ROUND(COUNT(st.n_id)::DOUBLE / COUNT(*), 6) AS recall
            FROM ex LEFT JOIN st
              ON ex.q_id = st.q_id AND ex.n_id = st.n_id
            GROUP BY ex.q_id""") +
      // the nightly-build artifact read back: the stored pair relation
      // is pairs_build's content verbatim (round-on-read)
      ("hybrid_build" ->
        s"""${graft.operators.Dedup.jaccardCte}
            SELECT id_a, id_b, ROUND(j, 6) AS jaccard FROM pairs""") +
      // per-query independence: the serve slice is the stored
      // restatement filtered to its queries (rankings are per-q_id
      // partitions, so restricting queries commutes with both legs
      // and the fusion)
      ("sim_hybrid_serve" ->
        s"""SELECT q_id, n_id, rrf, rank
            FROM (${baseOracles("sim_hybrid_stored")})
            WHERE q_id % $HybridServeMod = 0""") +
      ("sim_ann_lsh_stored" -> baseOracles("sim_ann_lsh")) +
      // versioned root: same layout per version, same probe — the
      // manifest pointer changes WHICH directory serves, never what
      // it answers, so the stored oracle carries verbatim
      ("sim_ann_lsh_versioned" -> baseOracles("sim_ann_lsh")) +
      // the purge slice excluded on the INDEX side only — queries
      // still ask, deleted ids never answer
      ("sim_ann_lsh_purged" ->
        lshOracleSql(s"AND b.vec_id % $PurgeMod <> $PurgeRes"))

  // ----- dynamic (trained-state) oracles ------------------------------
  //
  // The IVF family was the last rows-only group: cell membership
  // depends on the TRAINED centroids, and Lloyd iterations are not
  // SQL. But training is fully deterministic given the corpus
  // (deterministic sample order, fixed init, first-wins ties), so the
  // literal-constant trick that oracled the plane-derived family
  // extends: Verify renders the trained quantizer as DuckDB literals
  // and the oracle INDEPENDENTLY recomputes everything downstream of
  // training — per-vector cell similarity, argmax assignment, the
  // query probe, candidate generation, exact re-rank, per-cell dedup.
  // Only the centroid VALUES are taken from the Spark side (dumped,
  // like the seeded planes — but data-dependent, hence generated at
  // Verify time rather than compiled in). Double.toString round-trips
  // the exact 64-bit value through DuckDB's parser, and each float
  // centroid component is exactly representable as a double, so both
  // engines compare bit-identical similarities.

  /** The trained quantizer for corpus `d` as DuckDB literals:
    * (centroid matrix [k][Dim], centroid norms [k], k). Reads the
    * session's cached [[ivfIndex]], so Verify's parquet dump and the
    * generated oracle SQL share one training run by construction.
    */
  def centroidLiterals(s: SparkSession, d: String): (String, String, Int) =
    centroidLiteralsOf(ivfIndex(s, d).cents)

  private[operators] def centroidLiteralsOf(
      cents: Array[(Long, Array[Float], Double)]): (String, String, Int) = {
    val cv = cents.map(_._2.map(_.toDouble.toString).mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")
    val cn = cents.map(_._3.toString).mkString("[", ", ", "]")
    (cv, cn, cents.length)
  }

  /** Shared oracle CTE text: `m` (centroid literals), `sims` (every
    * (vec_id, cell, sim) pair — the [[nearestCellsCol]] kernel
    * restated: dot over min(len, Dim) terms, divided by the vector
    * norm then the stored centroid norm, in that order), `asg` (argmax
    * cell, lowest-cell tiebreak — single assignment, the declared
    * default). Returns (cteSql, k).
    */
  private[operators] def ivfOracleCtes(s: SparkSession, d: String): (String, Int) =
    ivfOracleCtesOf(centroidLiterals(s, d))

  /** The shared CTE text for ANY trained quantizer's literals — the
    * slice-trained ([[ivfIndexFor]]) indexes render their oracles
    * through this with their own centroids.
    */
  private[operators] def ivfOracleCtesOf(
      lits: (String, String, Int)): (String, Int) = {
    val (cv, cn, k) = lits
    val ctes =
      s"""m AS (SELECT $cv AS cv, $cn AS cn),
          sims AS (
            SELECT e.vec_id, g.c,
              (COALESCE(list_sum(list_transform(generate_series(1, LEAST(len(e.embedding), $Dim)),
                 i -> e.embedding[i]::DOUBLE * m.cv[g.c][i])), 0.0)
               / SQRT(list_sum(list_transform(generate_series(1, len(e.embedding)),
                 i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))
               / m.cn[g.c]) AS sim
            FROM embeddings e, m, generate_series(1, $k) AS g(c)),
          asg AS (
            SELECT vec_id, CAST(c - 1 AS BIGINT) AS cell FROM (
              SELECT vec_id, c, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY sim DESC, c ASC) AS rn FROM sims)
            WHERE rn = 1)"""
    (ctes, k)
  }

  /** Oracles whose SQL embeds the trained quantizer — generated per
    * (session, corpus) at Verify time and merged over the static map.
    */
  def dynamicOracles(s: SparkSession, d: String): Map[String, String] = {
    val (ctes, k) = ivfOracleCtes(s, d)
    // same occupancy-aware policy as topkIvf (the shared cached index,
    // so the boost decision is identical by construction)
    val np = defaultNProbe(k, ivfIndex(s, d).cellCounts)
    // Full probe pipeline restated: top-np cells per query by the
    // same similarity kernel, candidates from the probed cells'
    // assignments, exact rounded-cosine re-rank (the sim_ann_lsh
    // oracle pattern; IvfAssign=1 → no cross-cell dedup needed).
    def ivfSqlFor(indexPred: String): String =
      s"""WITH $ctes,
          qprobe AS (
            SELECT vec_id AS q_id, CAST(c - 1 AS BIGINT) AS cell FROM (
              SELECT vec_id, c, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY sim DESC, c ASC) AS rn
              FROM sims WHERE vec_id % $QueryStride = 0)
            WHERE rn <= $np),
          cand AS (
            SELECT q.q_id, a.vec_id AS n_id
            FROM qprobe q JOIN asg a ON q.cell = a.cell
            WHERE q.q_id <> a.vec_id $indexPred),
          scored AS (
            SELECT c.q_id, c.n_id, ROUND(${sqlCos("q.embedding", "n.embedding")}, 4) + 0.0 AS cos_sim
            FROM cand c JOIN embeddings q ON q.vec_id = c.q_id
                       JOIN embeddings n ON n.vec_id = c.n_id)
          SELECT q_id, n_id, cos_sim, rank FROM (
            SELECT q_id, n_id, cos_sim, CAST(ROW_NUMBER() OVER (
              PARTITION BY q_id ORDER BY cos_sim DESC, n_id ASC) AS INT) AS rank
            FROM scored) WHERE rank <= $TopK"""
    val ivfSql = ivfSqlFor("")
    Map(
      "ivf_build" ->
        s"""WITH $ctes
            SELECT vec_id, cell FROM asg""",
      "sim_ann_ivf" -> ivfSql,
      // byte-identical answer contract for the stored round trip (the
      // dedup_cluster_stored convention): the stored probe must return
      // exactly what the in-session probe returns, so it shares the
      // oracle STRING, not a restatement
      "sim_ann_ivf_stored" -> ivfSql,
      // versioned root: the pointer changes WHICH directory serves,
      // never what it answers — the stored oracle carries verbatim
      "sim_ann_ivf_versioned" -> ivfSql,
      // purge slice excluded on the INDEX side only (the lsh_purged
      // convention); nprobe pricing is the PRE-delete occupancy on
      // both sides — the stored index's counts are untouched until
      // compaction, and this np came from the same full corpus
      "sim_ann_ivf_purged" ->
        ivfSqlFor(s"AND a.vec_id % $PurgeMod <> $PurgeRes"),
      // The ANN miner restated end-to-end: same quantizer CTEs with
      // the miner's own 2×-boosted probe width (hardNegNProbe, shared
      // so the two cannot drift), candidates label-filtered AT the
      // candidate join (the stored index carries the label; the
      // oracle reads it off embeddings — functionally dependent on
      // vec_id, so identical rows), exact rounded-cosine rank to
      // HardNegK with labels carried through.
      "sim_hard_negatives_ann" ->
        s"""WITH $ctes,
            qprobe AS (
              SELECT vec_id AS q_id, CAST(c - 1 AS BIGINT) AS cell FROM (
                SELECT vec_id, c, ROW_NUMBER() OVER (
                  PARTITION BY vec_id ORDER BY sim DESC, c ASC) AS rn
                FROM sims WHERE vec_id % $QueryStride = 0)
              WHERE rn <= ${hardNegNProbe(k, ivfIndex(s, d).cellCounts)}),
            cand AS (
              SELECT q.q_id, a.vec_id AS n_id
              FROM qprobe q JOIN asg a ON q.cell = a.cell
              JOIN embeddings eq ON eq.vec_id = q.q_id
              JOIN embeddings en ON en.vec_id = a.vec_id
              WHERE q.q_id <> a.vec_id AND eq.label <> en.label),
            scored AS (
              SELECT c.q_id, q.label AS q_label, c.n_id, n.label AS n_label,
                ROUND(${sqlCos("q.embedding", "n.embedding")}, 4) + 0.0 AS cos_sim
              FROM cand c JOIN embeddings q ON q.vec_id = c.q_id
                         JOIN embeddings n ON n.vec_id = c.n_id)
            SELECT q_id, q_label, n_id, n_label, cos_sim, rank FROM (
              SELECT q_id, q_label, n_id, n_label, cos_sim,
                CAST(ROW_NUMBER() OVER (
                  PARTITION BY q_id ORDER BY cos_sim DESC, n_id ASC) AS INT) AS rank
              FROM scored) WHERE rank <= $HardNegK""",
      // The ivf and brute-force pipelines verbatim as nested
      // subqueries (DuckDB allows WITH inside a parenthesized CTE
      // body), joined on (q_id, n_id); COUNT(ivf.n_id) counts only
      // matched truth rows under the LEFT JOIN.
      "sim_recall_eval" ->
        s"""WITH ivf AS ($ivfSql),
            bf AS (${oracles("sim_topk_bruteforce")})
            SELECT bf.q_id, COUNT(*) AS n_true, COUNT(ivf.n_id) AS n_hits,
              ROUND(COUNT(ivf.n_id)::DOUBLE / COUNT(*), 6) AS recall
            FROM bf LEFT JOIN ivf
              ON bf.q_id = ivf.q_id AND bf.n_id = ivf.n_id
            GROUP BY bf.q_id""")
  }
}
