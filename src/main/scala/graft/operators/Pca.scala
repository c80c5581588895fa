package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus PCA over the embedding table — the classical dimensionality
  * reduction a retrieval/curation pipeline trains once and applies
  * everywhere (whitening before ANN indexing, residual-based
  * off-manifold scoring, variance-ordered feature triage). Complements
  * [[Embeddings.projPlanes]]: JL is data-oblivious (seeded at compile
  * time), PCA is TRAINED state, so it follows the IVF/PQ family's
  * contract — deterministic training cached per (session, corpus), and
  * oracles that embed the trained model as literals rendered at Verify
  * time ([[dynamicOracles]]).
  *
  * Scale shape (the part that must survive 100 TB): training reduces
  * the corpus to d + d² running sums — ONE pass producing a ~33 KB
  * partial per partition, combined in partition order on the driver
  * (bit-reproducible, the [[Similarity.deterministicSampleRdd]]
  * determinism contract) — then the eigensolve is an O(d³·sweeps)
  * driver step on a 64×64 matrix (~10⁷ flops, scale-independent).
  * Under [[Similarity.DriverTrainFlopsCap]] the accumulation itself
  * runs on the collected sample (the same driver/distributed split as
  * [[Similarity.trainCentroids]]; the two paths differ only in double
  * addition order, ≤1e-14 relative). Application (emb_pca /
  * emb_pca_recon) is a pure row-local map — zero shuffle at any scale.
  */
object Pca {

  /** Principal components kept (matches [[Embeddings.ProjDim]] so the
    * JL and PCA variants are interchangeable downstream).
    */
  val PcaDim = 16

  /** Sweep cap for the cyclic Jacobi eigensolver; 64×64 symmetric
    * matrices converge in well under 16 sweeps, the cap only bounds
    * adversarial numerics.
    */
  val JacobiMaxSweeps = 64

  /** Trained model: per-dimension sample mean, orthonormal component
    * rows (PcaDim × Dim, variance-descending), ALL Dim eigenvalues of
    * the population covariance (for explained-variance ratios), and
    * the sample size that produced them.
    */
  final case class PcaModel(mean: Array[Double], comps: Array[Array[Double]],
      eigvals: Array[Double], n: Long)

  private val cache = new SessionCache[PcaModel]()

  def pcaModel(s: SparkSession, d: String): PcaModel =
    cache.getOrBuild(s, s"pca#$d")(trainPca(s, d))

  /** One-pass mean + raw-second-moment accumulation (C = E[xxᵀ] − μμᵀ,
    * population normalization) over the deterministic training sample
    * (the corpus itself when it fits [[Similarity.IvfSampleCap]], else
    * the hash-ordered prefix — the trainCentroids policy), then a
    * driver-side cyclic Jacobi eigensolve. Vectors shorter than
    * [[Similarity.Dim]] are excluded from TRAINING (a ragged mean is
    * ill-defined); application handles them via the min(len, Dim)
    * prefix contract shared with the IVF kernels.
    */
  def trainPca(s: SparkSession, d: String,
      maxDriverFlops: Double = Similarity.DriverTrainFlopsCap): PcaModel = {
    import s.implicits._
    val dim = Similarity.Dim
    val emb = Tables.embeddings(s, d).filter(size($"embedding") >= dim)
    val n = emb.count()
    require(n > 0, s"cannot train PCA on a corpus with no full-width vectors: $d")
    val sampleSize = math.min(n, Similarity.IvfSampleCap.toLong).toInt
    val sampleDs: org.apache.spark.sql.Dataset[(Long, Array[Float])] =
      if (n <= sampleSize)
        emb.select($"vec_id", $"embedding").as[(Long, Array[Float])]
      else emb.select($"vec_id", $"embedding")
        .orderBy(xxhash64($"vec_id"), $"vec_id")
        .limit(sampleSize)
        .select($"vec_id", $"embedding").as[(Long, Array[Float])]

    // partials: [0, d) running Σx, [d, d + d²) running Σxxᵀ (row-major)
    def accumulate(acc: Array[Double], v: Array[Float]): Unit = {
      var i = 0
      while (i < dim) {
        val xi = v(i).toDouble
        acc(i) += xi
        val base = dim + i * dim
        var j = 0
        while (j < dim) { acc(base + j) += xi * v(j); j += 1 }
        i += 1
      }
    }

    val sums = new Array[Double](dim + dim * dim)
    if (sampleSize.toDouble * dim * dim <= maxDriverFlops) {
      sampleDs.collect().foreach(t => accumulate(sums, t._2))
    } else {
      val partials = Similarity
        .deterministicSampleRdd(sampleDs, s.sparkContext.defaultParallelism)
        .mapPartitionsWithIndex { (pid, it) =>
          val acc = new Array[Double](dim + dim * dim)
          it.foreach(v => accumulate(acc, v))
          Iterator.single((pid, acc))
        }.collect().sortBy(_._1) // combine in partition order: deterministic
      partials.foreach { case (_, p) =>
        var i = 0
        while (i < sums.length) { sums(i) += p(i); i += 1 }
      }
    }

    val cnt = sampleSize.toDouble
    val mean = Array.tabulate(dim)(i => sums(i) / cnt)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      sums(dim + i * dim + j) / cnt - mean(i) * mean(j))
    val (eigvals, vecs) = jacobiEigen(cov)
    // variance-descending order, index-ascending tiebreak; sign pinned
    // so the largest-|entry| coordinate (first on ties) is positive —
    // eigenvectors are otherwise only defined up to ±1
    val order = eigvals.indices.sortBy(i => (-eigvals(i), i))
    val comps = order.take(PcaDim).map { c =>
      val w = Array.tabulate(dim)(i => vecs(i)(c))
      var best = 0
      var i = 1
      while (i < dim) { if (math.abs(w(i)) > math.abs(w(best))) best = i; i += 1 }
      if (w(best) < 0) w.map(-_) else w
    }.toArray
    PcaModel(mean, comps, order.map(eigvals).toArray, n)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector COLUMNS). Fixed upper-triangle sweep
    * order and a pure-arithmetic rotation make the result a
    * deterministic function of the input matrix.
    */
  private[operators] def jacobiEigen(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm: Double = {
      var acc = 0.0
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) { acc += a(p)(q) * a(p)(q); q += 1 }
        p += 1
      }
      math.sqrt(2 * acc)
    }
    val frob = math.sqrt(m.map(_.map(x => x * x).sum).sum)
    val tol = 1e-13 * math.max(frob, 1e-300)
    var sweep = 0
    while (offNorm > tol && sweep < JacobiMaxSweeps) {
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val t =
              if (math.abs(theta) > 1e10) 1 / (2 * theta)
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1 / math.sqrt(t * t + 1)
            val sn = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - sn * akq
              a(k)(q) = sn * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - sn * aqk
              a(q)(k) = sn * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - sn * vkq
              v(k)(q) = sn * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Spark-round-compatible decimal rounding for model values emitted
    * as literal columns on BOTH sides of the oracle compare (no
    * rounding op runs in either engine, so engine round() semantics
    * never enter).
    */
  private def rd(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Projections of the min(len, Dim) prefix (the IVF kernel contract;
    * zero terms → 0.0), per component in ascending order — the exact
    * accumulation the oracle restates with list_sum.
    */
  private def projections(m: PcaModel, emb: Seq[Float]): Array[Double] = {
    val n = math.min(emb.length, Similarity.Dim)
    val out = new Array[Double](m.comps.length)
    var c = 0
    while (c < m.comps.length) {
      val w = m.comps(c)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += (emb(i).toDouble - m.mean(i)) * w(i); i += 1 }
      out(c) = acc
      c += 1
    }
    out
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Bench build line: trains (or hits the session cache) and emits
    // the model — component loadings with eigenvalues and explained-
    // variance ratios. Values are pre-rounded ONCE on the driver and
    // shared with the oracle literals, so the compare pins the
    // literal round-trip (the ivf_build convention); the arithmetic
    // itself is cross-checked by emb_pca / emb_pca_recon, where DuckDB
    // recomputes every projection from raw corpus data.
    "pca_build" -> { (s, d) =>
      import s.implicits._
      val m = pcaModel(s, d)
      val tv = m.eigvals.sum
      val rows = for {
        c <- m.comps.indices
        i <- 0 until Similarity.Dim
      } yield (c, i, rd(m.comps(c)(i), 6), rd(m.eigvals(c), 6),
        if (tv > 0) rd(m.eigvals(c) / tv, 6) else 0.0)
      rows.toDF("comp", "dim", "loading", "eigval", "evr")
    },

    // Mean-centered projection onto the trained components — the
    // stored-column form a 100 TB deployment materializes at ingest.
    // Pure row-local map over the corpus (the model rides the udf
    // closure: PcaDim·Dim doubles), exploded to scalar rows for the
    // driver compare.
    "emb_pca" -> ((s, d) => projectWith(s, d, pcaModel(s, d))),

    // PCA whitening — the projection rescaled so each kept component
    // has unit corpus variance (wv_c = pv_c / √λ_c), the standard
    // preconditioning before cosine/Euclidean ANN indexing and any
    // isotropy-assuming downstream model. A component whose eigenvalue
    // is ≤ 0 carries no corpus variance: its whitened coordinate is
    // pinned to 0.0 on BOTH sides rather than divided by a rounding-
    // noise √λ. Bit-exactness needs no tolerance: pv is the same
    // left-to-right kernel emb_pca pins, λ rides to the oracle as a
    // Double.toString literal, and IEEE sqrt + division are correctly
    // rounded in both engines. Row-local, zero shuffle.
    "emb_whiten" -> { (s, d) =>
      import s.implicits._
      val m = pcaModel(s, d)
      val lam = m.eigvals.take(m.comps.length)
      val wh = udf { (emb: Seq[Float]) =>
        val pv = projections(m, emb)
        val out = new Array[Double](pv.length)
        var c = 0
        while (c < pv.length) {
          out(c) = if (lam(c) > 0) pv(c) / math.sqrt(lam(c)) else 0.0
          c += 1
        }
        out.toSeq
      }
      Tables.embeddings(s, d)
        .select($"vec_id", posexplode(wh($"embedding")).as(Seq("comp", "wv")))
        .select($"vec_id", $"comp", round($"wv", 6).as("wv"))
    },

    // ANN through the trained subspace — sim_ann_proj with loadings
    // that FOLLOW the corpus instead of a data-oblivious JL matrix.
    "sim_ann_pca" -> ((s, d) => topkPca(s, d)),

    // The STORED-path form of sim_ann_pca (the sim_ann_ivf_stored
    // pattern): write the trained model, read it back, rebuild the
    // projected index from the stored loadings, probe — the train-
    // once / tokenize-and-search-later lifecycle under the oracle
    // gate. Parquet DOUBLE round-trips the exact 64-bit loadings, so
    // it shares sim_ann_pca's oracle verbatim.
    "sim_ann_pca_stored" -> { (s, d) =>
      val dir = Similarity.storedQueryDir("pcam", d)
      writePcaModel(s, d, dir)
      topkPcaStored(s, d, dir)
    },

    // PCA reconstruction error — the residual mass outside the kept
    // subspace, the "off-manifold vector" score of embedding-space
    // curation (a high-residual vector is one the corpus's principal
    // structure cannot explain). Orthonormality turns it into
    // ‖x−μ‖² − Σ_c pv_c² (O(d·k), no reconstruction matmul); the
    // GREATEST(·, 0) clamp — on both sides — absorbs the last-ulp
    // negative the subtraction can produce when the subspace captures
    // a vector exactly. Row-local, zero shuffle.
    "emb_pca_recon" -> { (s, d) =>
      import s.implicits._
      val m = pcaModel(s, d)
      val err = udf { (emb: Seq[Float]) =>
        val n = math.min(emb.length, Similarity.Dim)
        var ssq = 0.0
        var i = 0
        while (i < n) {
          val x = emb(i).toDouble - m.mean(i)
          ssq += x * x
          i += 1
        }
        val pv = projections(m, emb)
        var pvsq = 0.0
        var c = 0
        while (c < pv.length) { pvsq += pv(c) * pv(c); c += 1 }
        math.max(ssq - pvsq, 0.0)
      }
      Tables.embeddings(s, d)
        .select($"vec_id", round(err($"embedding"), 5).as("err2"))
    })

  /** Candidate pool for [[topkPca]] — the ProjCandidates rationale:
    * the exact re-rank must cover the query's topic neighborhood,
    * because within-neighborhood order is what the projection blurs.
    */
  val PcaCandidates: Int = Similarity.ProjCandidates

  /** The PCA-projected corpus as a build-once index (vec_id,
    * pv[PcaDim] doubles, pn) — the TRAINED counterpart of
    * [[Similarity.projIndex]]: where JL is data-oblivious, the PCA
    * loadings put the coarse pass in the subspace that actually
    * carries the corpus's variance. Built once per (session, corpus)
    * and persisted; its cost rides sim_ann_pca's bench line (the
    * projection is one narrow map, trivia next to the coarse scan).
    */
  private val pcaIndexCache = new SessionCache[org.apache.spark.sql.DataFrame](
    df => scala.util.Try(df.unpersist(blocking = false)))

  private[operators] def pcaIndex(s: SparkSession, d: String): DataFrame =
    pcaIndexWith(s, d, pcaModel(s, d), s"pcaidx#$d")

  private def pcaIndexWith(s: SparkSession, d: String, m: PcaModel,
      key: String): DataFrame = {
    import s.implicits._
    pcaIndexCache.getOrBuild(s, key) {
      Tables.embeddings(s, d)
        .select($"vec_id", projectCol(m, $"embedding").as("pv"))
        // native double-array kernel (VectorKernels.normD): same
        // left-to-right accumulation as the oracle's list_sum
        .withColumn("pn", graft.functions.VectorFunctions.norm($"pv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
  }

  /** Coarse-to-fine ANN over the trained subspace — exactly
    * [[Similarity.coarseFineTopk]] (ONE shared probe definition with
    * the JL path, so tie-breaks and rounding can never drift) over the
    * PCA-projected index. The coarse cosine runs as the native
    * double-array codegen kernels (VectorKernels.dotD/normD): the
    * dot/÷√/÷√ association matches the oracle's sqlCos term-for-term,
    * so the candidate order is bit-identical cross-engine. Cost ∝
    * |Q|·corpus on 16-d doubles, broadcast query side.
    */
  def topkPca(s: SparkSession, d: String, k: Int = Similarity.TopK,
      candidates: Int = PcaCandidates): DataFrame =
    Similarity.coarseFineTopk(s, d, pcaIndex(s, d), k, candidates)

  /** [[topkPca]] with a STORED model — the separate-query-job half:
    * the projected index is rebuilt from the stored loadings (one
    * narrow map), nothing retrained; projections are bit-identical to
    * the build session's (the parquet-DOUBLE round-trip), so the
    * probe results are too.
    */
  def topkPcaStored(s: SparkSession, d: String, modelDir: String,
      k: Int = Similarity.TopK, candidates: Int = PcaCandidates): DataFrame =
    Similarity.coarseFineTopk(s, d,
      pcaIndexWith(s, d, readPcaModel(s, modelDir), s"pcaidx#stored#$modelDir#$d"),
      k, candidates)

  /** The emb_pca projection given a model (cached or stored). */
  private def projectWith(s: SparkSession, d: String, m: PcaModel): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d)
      .select($"vec_id",
        posexplode(projectCol(m, $"embedding")).as(Seq("comp", "pv")))
      .select($"vec_id", $"comp", round($"pv", 6).as("pv"))
  }

  /** The trained projection as a native codegen column
    * ([[graft.plans.PcaProject]]) — the model rides the plan as a
    * reference object instead of a UDF closure, and the kernel reads
    * ArrayData directly (no per-row Seq encoder round trip).
    */
  private def projectCol(m: PcaModel,
      emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.PcaProject(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(emb),
        m.mean, m.comps, Similarity.Dim))

  // ------------------------------------------------------------------
  // Stored-model contract (the stored-index convention): ONE job
  // trains and writes the model; any LATER driver reads it back and
  // projects without retraining. Parquet DOUBLE round-trips the exact
  // 64-bit values, so stored-model projections are bit-identical to
  // build-session projections (IndexStoreSpec pins this in a fresh
  // session whose training cache is provably cold).
  // ------------------------------------------------------------------

  /** Write the trained model: component loadings (one row per
    * component) plus a 1-row stats table (mean, full spectrum, n).
    */
  def writePcaModel(s: SparkSession, d: String, outDir: String): Unit = {
    import s.implicits._
    val m = pcaModel(s, d)
    m.comps.zipWithIndex.map { case (w, c) => (c, w.toSeq) }.toSeq
      .toDF("comp", "loading")
      .write.mode("overwrite").parquet(s"$outDir/components")
    Seq((m.mean.toSeq, m.eigvals.toSeq, m.n))
      .toDF("mean", "eigvals", "n")
      .write.mode("overwrite").parquet(s"$outDir/stats")
  }

  /** Read a stored model (component order restored by the comp id). */
  def readPcaModel(s: SparkSession, modelDir: String): PcaModel = {
    import s.implicits._
    val comps = s.read.parquet(s"$modelDir/components")
      .select($"comp", $"loading").as[(Int, Seq[Double])]
      .collect().sortBy(_._1).map(_._2.toArray)
    val (mean, eig, n) = s.read.parquet(s"$modelDir/stats")
      .select($"mean", $"eigvals", $"n")
      .as[(Seq[Double], Seq[Double], Long)].collect().head
    PcaModel(mean.toArray, comps, eig.toArray, n)
  }

  /** Project with a STORED model — the separate-query-job half; no
    * session cache involved, nothing retrained.
    */
  def projectStored(s: SparkSession, d: String, modelDir: String): DataFrame =
    projectWith(s, d, readPcaModel(s, modelDir))

  /** Static oracles: none — every PCA oracle embeds trained state. */
  val oracles: Map[String, String] = Map.empty

  /** Trained model as DuckDB literals (Double.toString round-trips to
    * the identical 64-bit value) plus the pre-rounded build rows.
    */
  def dynamicOracles(s: SparkSession, d: String): Map[String, String] = {
    val m = pcaModel(s, d)
    val dim = Similarity.Dim
    val mu = m.mean.map(_.toString).mkString("[", ", ", "]")
    val w = m.comps.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")
    val tv = m.eigvals.sum
    val buildRows = m.comps.indices.flatMap { c =>
      (0 until dim).map { i =>
        s"(${c}, ${i}, ${rd(m.comps(c)(i), 6)}, ${rd(m.eigvals(c), 6)}, " +
          s"${if (tv > 0) rd(m.eigvals(c) / tv, 6) else 0.0})"
      }
    }.mkString(", ")
    val pm = s"pm AS (SELECT $mu AS mu, $w AS w)"
    // the kernel's projection restated; cRef is the 1-based component
    // index expression at the use site (a column ref or a lambda var)
    def pvExpr(cRef: String) =
      s"""COALESCE(list_sum(list_transform(
          generate_series(1, LEAST(len(e.embedding), $dim)),
          i -> (e.embedding[i]::DOUBLE - pm.mu[i]) * pm.w[$cRef][i])), 0.0)"""
    val pvc = pvExpr("c")
    val base = Map(
      // ::DOUBLE on every value column: DuckDB parses the bare decimal
      // literals in VALUES as DECIMAL (the emb_outliers lesson), which
      // would print with trailing zeros and hash-mismatch
      "pca_build" ->
        s"""SELECT CAST(comp AS INT) AS comp, CAST(dim AS INT) AS dim,
            loading::DOUBLE AS loading, eigval::DOUBLE AS eigval,
            evr::DOUBLE AS evr
            FROM (VALUES $buildRows) t(comp, dim, loading, eigval, evr)""",
      "emb_pca" ->
        s"""WITH $pm
            SELECT e.vec_id, CAST(g.c - 1 AS INT) AS comp,
              ROUND(${pvExpr("g.c")}, 6) + 0.0 AS pv
            FROM embeddings e, pm, generate_series(1, ${m.comps.length}) AS g(c)""",
      // λ as a Double.toString literal; ≤0 eigenvalues pin wv to 0.0
      // exactly as the kernel does (never divide by √rounding-noise)
      "emb_whiten" ->
        s"""WITH $pm, lam AS (SELECT ${m.eigvals.take(m.comps.length)
              .mkString("[", ", ", "]")} AS l)
            SELECT e.vec_id, CAST(g.c - 1 AS INT) AS comp,
              ROUND(CASE WHEN lam.l[g.c] > 0
                THEN (${pvExpr("g.c")}) / sqrt(lam.l[g.c])
                ELSE 0.0 END, 6) + 0.0 AS wv
            FROM embeddings e, pm, lam,
              generate_series(1, ${m.comps.length}) AS g(c)""",
      // the whole coarse-to-fine ANN restated: identical projection
      // per vector (mu/w literals), UNROUNDED projected cosine picks
      // top-C (sqlCos's dot/÷√/÷√ association = the kernel's, so the
      // doubles and hence the order are bit-identical), exact
      // full-width cosine re-ranks — the sim_ann_proj oracle with the
      // trained subspace in place of the JL literal
      "sim_ann_pca" -> {
        val pvList =
          s"""list_transform(generate_series(1, ${m.comps.length}), c ->
              COALESCE(list_sum(list_transform(
                generate_series(1, LEAST(len(e.embedding), $dim)),
                i -> (e.embedding[i]::DOUBLE - pm.mu[i]) * pm.w[c][i])), 0.0))"""
        s"""WITH $pm,
            pv AS (SELECT e.vec_id, e.embedding, $pvList AS pv
                   FROM embeddings e, pm),
            coarse AS (
              SELECT q_id, n_id FROM (
                SELECT q.vec_id AS q_id, c.vec_id AS n_id, ROW_NUMBER() OVER (
                  PARTITION BY q.vec_id
                  ORDER BY ${Similarity.sqlCos("q.pv", "c.pv")} DESC,
                    c.vec_id ASC) AS crank
                FROM pv q JOIN pv c ON q.vec_id <> c.vec_id
                WHERE q.vec_id % ${Similarity.QueryStride} = 0)
              WHERE crank <= $PcaCandidates),
            scored AS (
              SELECT c.q_id, c.n_id,
                ROUND(${Similarity.sqlCos("q.embedding", "n.embedding")}, 4) + 0.0 AS cos_sim
              FROM coarse c JOIN embeddings q ON q.vec_id = c.q_id
                           JOIN embeddings n ON n.vec_id = c.n_id)
            SELECT q_id, n_id, cos_sim, rank FROM (
              SELECT q_id, n_id, cos_sim, CAST(ROW_NUMBER() OVER (
                PARTITION BY q_id ORDER BY cos_sim DESC, n_id ASC) AS INT) AS rank
              FROM scored) WHERE rank <= ${Similarity.TopK}"""
      },
      // ssq and each pv accumulate left-to-right over the same prefix,
      // the component sum-of-squares left-to-right over c, and the
      // square is a self-multiply (never POW) — the exact kernel
      // order, so the subtraction sees identical doubles.
      "emb_pca_recon" ->
        s"""WITH $pm
            SELECT e.vec_id,
              ROUND(GREATEST(
                COALESCE(list_sum(list_transform(
                  generate_series(1, LEAST(len(e.embedding), $dim)),
                  i -> (e.embedding[i]::DOUBLE - pm.mu[i])
                     * (e.embedding[i]::DOUBLE - pm.mu[i]))), 0.0)
                - COALESCE(list_sum(list_transform(
                  generate_series(1, ${m.comps.length}),
                  c -> ($pvc) * ($pvc))), 0.0),
                0.0), 5) AS err2
            FROM embeddings e, pm""")
    // stored probe shares the session-path oracle verbatim (the
    // Similarity.oracles sim_ann_lsh_stored convention)
    base + ("sim_ann_pca_stored" -> base("sim_ann_pca"))
  }
}
