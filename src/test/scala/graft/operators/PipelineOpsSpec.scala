package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the training-data pipeline operators (dedup, similarity,
  * text analysis) — the invariants the DuckDB oracle can't state
  * (hash-dependent fingerprints, ANN recall).
  */
class PipelineOpsSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("minhash LSH finds exactly the exact-jaccard pairs at the threshold") {
    val exact = Dedup.queries("dedup_ngram_jaccard")(spark, sf)
    val lsh = Dedup.queries("dedup_minhash_lsh")(spark, sf)
    assert(lsh.except(exact).count() == 0, "LSH reported a pair exact jaccard rejects")
    assert(exact.except(lsh).count() == 0, "LSH missed a qualifying pair")
  }

  test("simhash: identical texts collide; reordering tokens preserves the fingerprint") {
    import spark.implicits._
    // simhash sums per-token bit votes — a bag-of-tokens permutation
    // must produce the identical fingerprint.
    val docs = graft.Tables.documents(spark, sf).limit(50)
      .select($"doc_id", $"text")
    val shuffled = docs.select($"doc_id",
      concat_ws(" ", reverse(split($"text", " "))).as("text"))
    val a = Dedup.simhash(spark, sf).withColumnRenamed("simhash", "sh_a")
    // recompute over a view with reversed token order
    shuffled.createOrReplaceTempView("permuted")
    val tok = spark.table("permuted")
      .select($"doc_id", explode(TextAnalysis.tokens($"text")).as("tok"))
      .select($"doc_id", xxhash64($"tok").as("h"))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftright($"h", i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i"))
    val sums = tok.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64).map(i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    val b = sums.select($"doc_id", fp.as("sh_b"))
    val diff = a.join(b, "doc_id").filter($"sh_a" =!= $"sh_b").count()
    assert(diff == 0)
    // and the scalar (per-document) form is permutation-invariant too
    val u = docs
      .select(Dedup.simhashUdf(TextAnalysis.tokens($"text")).as("x"),
        Dedup.simhashUdf(reverse(TextAnalysis.tokens($"text"))).as("y"))
      .filter($"x" =!= $"y").count()
    assert(u == 0)
  }

  test("LSH ANN top-5 recall vs brute force stays above its measured floor") {
    import spark.implicits._
    val sf01 = "/root/testdata/sf0.01"
    val bf = Similarity.topkBruteForce(spark, sf01, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.topkLsh(spark, sf01, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    assert(ann.nonEmpty)
    assert(ann.map(_._1).subsetOf(bf.map(_._1)))
    // Deterministic (seeded planes, fixed data): measured 0.96 at
    // round 1 with Hamming-1 multiprobe (0.64 single-probe). Near-
    // random embeddings are LSH's worst case — real corpora cluster
    // tighter; NumTables / MultiprobeFlips trade probe cost for recall.
    val recall = (bf & ann).size.toDouble / bf.size
    assert(recall >= 0.9, s"ANN recall regressed: $recall")
    // the built index's row contract: one bucket entry per (vector, table)
    assert(Similarity.lshIndex(spark, sf01).count() ==
      500L * Similarity.NumTables)
  }

  test("salted aggregation equals direct aggregation") {
    import spark.implicits._
    val df = graft.Tables.lineitem(spark, sf)
    val direct = df.groupBy($"l_returnflag".as("key"))
      .agg(round(sum($"l_quantity"), 2).as("s"), count(lit(1)).as("c"))
    val salted = Skew.saltedAgg(df, $"l_returnflag", buckets = 16,
      Seq(sum($"l_quantity").as("s"), count(lit(1)).as("c")),
      Seq(round(sum($"s"), 2).as("s"), sum($"c").as("c")))
    assert(direct.except(salted).count() == 0)
    assert(salted.except(direct).count() == 0)
  }

  test("IVF ANN top-5 recall vs brute force stays above its measured floor") {
    import spark.implicits._
    val sf01 = "/root/testdata/sf0.01"
    val bf = Similarity.topkBruteForce(spark, sf01, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    // the test embeddings are ISOTROPIC — the coarse quantizer's worst
    // case, where recall tracks the probed fraction — so this spec
    // passes the recall-favoring nprobe ≈ k/2 a caller would choose
    // there (k = ivfK(500) = 23 cells at sf0.01). The speedup-bearing
    // DEFAULT probe is pinned on the clustered fixture below.
    val ivf = Similarity.topkIvf(spark, sf01, k = 5, nprobe = 12, assign = 2)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    // measured 1.00 at round 1 (12 of 23 cells, 2-way multi-assignment)
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.9, s"IVF recall regressed: $recall")
  }

  test("trained-state oracles: centroid literals round-trip and cover the IVF family") {
    // The DuckDB bit-exactness itself is the driver's gate (and
    // tools/check_oracle.py locally); this pins the CONTRACT — the
    // dynamic map covers exactly the trained-state queries, doesn't
    // collide with a static oracle, and embeds the session's cached
    // centroids verbatim (Double.toString round-trips, so the literal
    // DuckDB parses is the same 64-bit value the kernel used).
    val sim = Similarity.dynamicOracles(spark, sf)
    val ded = Dedup.dynamicOracles(spark, sf)
    assert(sim.keySet == Set("ivf_build", "sim_ann_ivf", "sim_ann_ivf_stored",
      "sim_ann_ivf_purged", "sim_ann_ivf_versioned", "sim_recall_eval",
      "sim_hard_negatives_ann"))
    assert(ded.keySet == Set("dedup_semantic",
      "dedup_semantic_incremental", "dedup_semantic_purged"))
    val static = graft.SparkEntry.oracleSql.keySet
    assert((sim.keySet ++ ded.keySet).forall(!static.contains(_)))
    val cents = Similarity.ivfIndex(spark, sf).cents
    val (cv, cn, k) = Similarity.centroidLiterals(spark, sf)
    assert(k == cents.length)
    val c0 = cents.head._2.head
    assert(cv.contains(c0.toDouble.toString) &&
      c0.toDouble.toString.toDouble == c0.toDouble)
    assert(cn.contains(cents.head._3.toString))
    assert(sim("ivf_build").contains(cv) && sim("sim_ann_ivf").contains(cv) &&
      ded("dedup_semantic").contains(cv))
  }

  test("IVF occupancy auto-probe: isotropic corpus detected, recall >= 0.8 at <= 2x probes") {
    // The coarse quantizer's worst case is an ISOTROPIC corpus (no
    // topic structure; recall ≈ probed fraction). The build-time
    // occupancy histogram detects it — near-uniform cell counts — and
    // doubles the default probe: recall@5 0.60 → 0.80 at 8 of 23
    // cells (round-8 measurement), still a ~3× candidate cut. Callers
    // wanting ≥0.9 on isotropic data pass nprobe ≈ k/2 (floored spec
    // above); clustered corpora keep the lean default (spec below).
    import spark.implicits._
    val sf01 = "/root/testdata/sf0.01"
    val idx = Similarity.ivfIndex(spark, sf01)
    info(f"isotropic occupancy cv = ${Similarity.occupancyCv(idx.cellCounts)}%.3f")
    assert(Similarity.probeBoost(idx.cellCounts) == Similarity.IvfUniformBoost,
      "near-uniform occupancy must trigger the probe boost")
    val bf = Similarity.topkBruteForce(spark, sf01, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.topkIvf(spark, sf01, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    val np = Similarity.defaultNProbe(idx.cents.length, idx.cellCounts)
    info(f"isotropic auto-probe recall@5 = $recall%.3f ($np of ${idx.cents.length} cells)")
    assert(np <= 2 * Similarity.defaultNProbe(idx.cents.length), "probe cost cap blown")
    assert(ivf.nonEmpty && recall >= 0.8,
      s"isotropic auto-probe recall regressed: $recall")
  }

  /** Mixture-of-Gaussians-on-the-sphere embeddings — the shape real
    * corpora have (documents cluster by topic). 20 clusters × 100
    * members, σ·√dim ≈ 0.4 of noise per member (within-cluster cos
    * ≈ 0.93, cross-cluster ≈ 0). Deterministic: fixed seed.
    */
  private lazy val clusteredFixture: String = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      v.map(x => (x / n).toFloat)
    }
    val centers = Array.fill(20)(
      unit(Array.fill(Similarity.Dim)(rnd.nextGaussian().toFloat)))
    val rows = (0 until 2000).map { i =>
      val c = centers(i % 20)
      val v = unit(c.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
      (i.toLong, v.toSeq)
    }
    val tmp = java.nio.file.Files.createTempDirectory("ivfclu").toString
    rows.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  test("IVF default probe on a clustered corpus: recall >= 0.9 at 1/8 of cells") {
    import spark.implicits._
    // the occupancy histogram is SKEWED here (topic cells; measured cv
    // ≈ 0.46) so the auto-boost must stay out of the way — the lean
    // 1/8 default is the whole point on realistic clustered corpora
    val idx = Similarity.ivfIndex(spark, clusteredFixture)
    info(f"clustered occupancy cv = ${Similarity.occupancyCv(idx.cellCounts)}%.3f")
    assert(Similarity.probeBoost(idx.cellCounts) == 1,
      "clustered occupancy must NOT trigger the probe boost")
    val bf = Similarity.topkBruteForce(spark, clusteredFixture, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.topkIvf(spark, clusteredFixture, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    // k = ivfK(2000) = 45 cells; the default probes
    // max(4, ceil(45/8)) = 6 of them — an 8× candidate cut — and the
    // 20 topic clusters keep true neighbors inside the probed cells.
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.9, s"IVF clustered-default recall regressed: $recall")
  }

  test("semantic dedup collapses a clustered corpus; keeps no same-cell pair above threshold") {
    import spark.implicits._
    import graft.functions.VectorFunctions
    // 20 tight topic clusters of 100 (member-to-member cos ≈ 0.86);
    // at τ = 0.8 per-cell greedy dedup must collapse each cell to few
    // representatives (#cells = ivfK(2000) = 45)
    val tau = 0.8
    val kept = Dedup.semanticDedup(spark, clusteredFixture, tau)
      .as[Long].collect().toSet
    assert(kept.nonEmpty && kept.size <= 200,
      s"expected strong collapse on 20-cluster corpus, kept ${kept.size} of 2000")
    // invariant of the greedy rule: among kept vectors sharing a cell,
    // no pair at cos >= τ can survive
    val asg = Similarity.ivfIndex(spark, clusteredFixture).assigned
      .select($"cell", $"vec_id", $"embedding", $"nrm")
      .filter($"vec_id".isInCollection(kept))
    val offenders = asg.as("a")
      .join(asg.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(VectorFunctions.cosineFrom(
        VectorFunctions.dot(col("a.embedding"), col("b.embedding")),
        col("a.nrm"), col("b.nrm")).as("cos"))
      .filter(round($"cos", 4) >= tau)
    assert(offenders.count() == 0, "a kept same-cell pair exceeds the threshold")
    // deterministic: rerun reproduces the kept set (build-once index)
    val again = Dedup.semanticDedup(spark, clusteredFixture, tau)
      .as[Long].collect().toSet
    assert(again == kept)
  }

  test("dup clustering reaches its fixpoint: every edge internal to one component") {
    import spark.implicits._
    val pairs = Dedup.queries("dedup_ngram_jaccard")(spark, sf)
    val cc = Dedup.connectedComponents(pairs).persist()
    val rep = cc.select($"doc_id", $"rep_id")
    // both endpoints of every pair carry the same representative
    val split = pairs
      .join(rep.select($"doc_id".as("id_a"), $"rep_id".as("ra")), Seq("id_a"))
      .join(rep.select($"doc_id".as("id_b"), $"rep_id".as("rb")), Seq("id_b"))
      .filter($"ra" =!= $"rb")
    assert(split.count() == 0, "an edge crosses two components — not converged")
    // representative canonicality: rep_id <= doc_id, and a component's
    // representative maps to itself
    assert(cc.filter($"rep_id" > $"doc_id").count() == 0)
    val repsSelf = rep.select($"rep_id".as("doc_id")).distinct()
      .join(rep, Seq("doc_id"))
      .filter($"rep_id" =!= $"doc_id")
    assert(repsSelf.count() == 0, "a representative is not its own rep")
    cc.unpersist()
  }

  test("index caches are per-session: same session hits, sibling session misses") {
    // the round-4 cache keyed on identityHashCode could hand a new
    // session a dead session's index after GC; sessionUUID keys cannot
    // collide. newSession() shares the context but is a distinct
    // session with its own UUID → must get its own index entry.
    val a1 = Similarity.lshIndex(spark, sf)
    val a2 = Similarity.lshIndex(spark, sf)
    assert(a1 eq a2, "same session should reuse its cached LSH index")
    val sibling = spark.newSession()
    val b = Similarity.lshIndex(sibling, sf)
    assert(!(a1 eq b), "a different session must not inherit another session's index")
    val i1 = Similarity.ivfIndex(spark, sf)
    val i2 = Similarity.ivfIndex(spark, sf)
    assert(i1 eq i2)
    assert(!(i1 eq Similarity.ivfIndex(sibling, sf)))
    // the exact-Jaccard pair relation is build-once the same way (it
    // feeds both dedup_ngram_jaccard and dedup_cluster)
    val p1 = Dedup.jaccardPairs(spark, sf)
    val p2 = Dedup.jaccardPairs(spark, sf)
    assert(p1 eq p2, "same session should reuse its cached pair relation")
    assert(!(p1 eq Dedup.jaccardPairs(sibling, sf)))
  }

  test("JL projection preserves norms in expectation and cluster separation") {
    import spark.implicits._
    // deterministic: identical output on rerun (library form keeps the
    // (vec_id, proj array<float>) shape; the declared query explodes it
    // for the driver's scalar-row compare)
    val a = Embeddings.project(spark, sf)
      .as[(Long, Seq[Float])].collect().toMap
    val b = Embeddings.project(spark, sf)
      .as[(Long, Seq[Float])].collect().toMap
    assert(a == b)
    // E||Px||² = ||x||² (planes scaled 1/√k): corpus-mean ratio near 1
    val src = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toMap
    def sq(v: Seq[Float]): Double = v.map(x => x.toDouble * x).sum
    val ratios = src.keys.toSeq.map(id => sq(a(id)) / sq(src(id)))
    val mean = ratios.sum / ratios.size
    assert(mean > 0.75 && mean < 1.25, s"norm-preservation ratio drifted: $mean")
    // cluster structure survives: on the 20-cluster fixture, projected
    // within-cluster cosine stays far above projected cross-cluster
    val proj = Embeddings.project(spark, clusteredFixture)
      .as[(Long, Seq[Float])].collect().toMap
    def cos(x: Seq[Float], y: Seq[Float]): Double = {
      val d = x.zip(y).map { case (p, q) => p.toDouble * q }.sum
      d / math.sqrt(sq(x)) / math.sqrt(sq(y))
    }
    val ids = proj.keys.toSeq.sorted.take(400)
    val (within, cross) = ids.combinations(2).toSeq
      .map { case Seq(i, j) => (i % 20 == j % 20, cos(proj(i), proj(j))) }
      .partition(_._1)
    val wMean = within.map(_._2).sum / within.size
    val cMean = cross.map(_._2).sum / cross.size
    assert(wMean > cMean + 0.3,
      s"projected separation collapsed: within=$wMean cross=$cMean")
  }

  test("coarse-to-fine projected ANN: clustered floor >= 0.9; isotropic measured") {
    import spark.implicits._
    // clustered corpora (the realistic shape): cluster members stay
    // co-located under JL, so a top-C that covers the cluster contains
    // the true neighbors — floor-pinned at the C = 100 default
    // (measured 0.99; C below cluster size degrades: 0.61 at C = 25)
    val bfC = Similarity.topkBruteForce(spark, clusteredFixture, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val prC = Similarity.topkProjected(spark, clusteredFixture, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val recallC = (bfC & prC).size.toDouble / bfC.size
    assert(recallC >= 0.9, s"projected-ANN clustered recall regressed: $recallC")
    // isotropic (the projection's worst case — cosine gaps ~1/√64 vs
    // ~1/√16 projection noise): measured and reported, not floored;
    // recall tracks the re-rank budget (0.32@25, 0.52@50, 0.76@100,
    // 0.84@150 of 500 at round 5) — use IVF/LSH or a larger C there
    val sf01 = "/root/testdata/sf0.01"
    val bfI = Similarity.topkBruteForce(spark, sf01, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val prI = Similarity.topkProjected(spark, sf01, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val recallI = (bfI & prI).size.toDouble / bfI.size
    info(f"isotropic projected-ANN recall@5 = $recallI%.2f at C=${Similarity.ProjCandidates}")
    assert(prI.nonEmpty && recallI >= 0.2, s"implausibly low: $recallI")
  }

  test("PQ ANN: code laws; clustered recall >= 0.9 on 32x-compressed codes; isotropic measured") {
    import spark.implicits._
    // code laws: exactly PqSubvectors codes per vector, every code a
    // valid codebook index — the 8-byte representation standing in for
    // the 256-byte vector (the 32× scan-bytes cut that is PQ's point)
    val idx = Pq.pqIndex(spark, clusteredFixture)
    assert(idx.codes.filter(size($"codes") =!= Pq.PqSubvectors).count() == 0)
    assert(idx.codes.select(explode($"codes").as("c"))
      .filter($"c" < 0 || $"c" >= Pq.PqCodewords).count() == 0)
    assert(idx.codebooks.length == Pq.PqSubvectors &&
      idx.codebooks.forall(_.length == Pq.PqCodewords))
    // clustered corpora: the ADC coarse pass + C=100 exact re-rank
    // holds the same 0.9 floor as the projected path
    val bfC = Similarity.topkBruteForce(spark, clusteredFixture, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val pqC = Pq.topkPq(spark, clusteredFixture, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val recallC = (bfC & pqC).size.toDouble / bfC.size
    assert(recallC >= 0.9, s"PQ clustered recall regressed: $recallC")
    // isotropic: quantization noise vs ~1/√64 cosine gaps — measured
    // and reported (the IVF/proj worst-case convention)
    val sf01 = "/root/testdata/sf0.01"
    val bfI = Similarity.topkBruteForce(spark, sf01, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val pqI = Pq.topkPq(spark, sf01, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val recallI = (bfI & pqI).size.toDouble / bfI.size
    info(f"isotropic PQ recall@5 = $recallI%.2f at C=${Pq.PqCandidates}")
    assert(pqI.nonEmpty && recallI >= 0.2, s"implausibly low: $recallI")
  }

  test("PQ at production parameters: 256-codeword books, recall >= the 16-codeword fixture") {
    import spark.implicits._
    // codewords is a parameter, not a constant: the same trainer,
    // encoder, and search run the production 256/8-bit shape. On the
    // clustered fixture the finer quantizer must not lose recall vs
    // the 16-codeword fixture books.
    val bf = Similarity.topkBruteForce(spark, clusteredFixture, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    def recallAt(codewords: Int): Double = {
      val pq = Pq.topkPq(spark, clusteredFixture, k = 5, codewords = codewords)
        .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
      (bf & pq).size.toDouble / bf.size
    }
    val r16 = recallAt(Pq.PqCodewords)
    val r256 = recallAt(256)
    info(f"clustered recall@5: 16-codeword $r16%.3f, 256-codeword $r256%.3f")
    assert(r256 >= r16,
      s"production books lost recall: 256-cw $r256 < 16-cw $r16")
    // code laws hold at the production width too
    val idx = Pq.pqIndex(spark, clusteredFixture, codewords = 256)
    assert(idx.codes.filter(size($"codes") =!= Pq.PqSubvectors).count() == 0)
    assert(idx.codes.select(explode($"codes").as("c"))
      .filter($"c" < 0 || $"c" >= 256).count() == 0)
    assert(idx.codebooks.forall(_.length == 256))
  }

  test("PCA-projected ANN: clustered recall >= 0.9 through the trained subspace") {
    import spark.implicits._
    // the trained counterpart of the JL coarse pass: 20 topic
    // directions live in a <=20-dim subspace, so the 16 variance-top
    // components separate clusters and the C=100 exact re-rank
    // recovers within-cluster order — same floor as the proj path
    val bf = Similarity.topkBruteForce(spark, clusteredFixture, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val pca = Pca.topkPca(spark, clusteredFixture, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    assert(pca.nonEmpty)
    val recall = (bf & pca).size.toDouble / bf.size
    assert(recall >= 0.9, s"PCA-ANN clustered recall regressed: $recall")
  }

  test("IVF-PQ composed ANN: clustered recall >= 0.9 with both indexes bounding the work") {
    import spark.implicits._
    // the deployment composition: probed cells bound WHICH vectors are
    // ADC-scored, codes bound the bytes each one costs; candidates
    // must be a subset of the probed-cell members, so recall is capped
    // by IVF's — the spec pins that the PQ coarse pass doesn't lose
    // the neighbors IVF kept (C=100 covers the probed topic cells)
    val bf = Similarity.topkBruteForce(spark, clusteredFixture, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val ivfpq = Pq.topkIvfPq(spark, clusteredFixture, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val recall = (bf & ivfpq).size.toDouble / bf.size
    assert(recall >= 0.9, s"IVF-PQ clustered recall regressed: $recall")
    // composition sanity: IVF-PQ results ⊆ what plain IVF's candidate
    // set could produce is structural; cheap cross-check instead: the
    // composed path can't beat brute force's neighbor set
    assert(ivfpq.forall { case (q, _) => bf.exists(_._1 == q) })
  }

  test("dedup_embedding_cluster agrees with star-CC over the same LSH pair graph") {
    import spark.implicits._
    // independent-algorithm cross-check (the dedup_cluster three-way
    // pattern): the declared query runs the hybrid CC engine; the
    // alternating-star algorithm must produce the identical
    // (vec_id, rep_id = component min) labels from the same pairs
    val sf01 = "/root/testdata/sf0.01"
    val pairs = Dedup.queries("dedup_embedding_lsh")(spark, sf01)
      .select($"id_a", $"id_b")
    val got = Dedup.queries("dedup_embedding_cluster")(spark, sf01)
      .as[(Long, Long)].collect().toSet
    val stars = Dedup.largeStarSmallStar(pairs)
      .as[(Long, Long)].collect().toSet
    assert(got.nonEmpty, "fixture produced no embedding near-dup components")
    assert(got == stars,
      s"extra=${got -- stars} missing=${stars -- got}")
    // every pair's endpoints share a rep, and each rep is its own rep
    val rep = got.toMap
    val prs = pairs.as[(Long, Long)].collect()
    assert(prs.forall { case (a, b) => rep(a) == rep(b) })
    assert(rep.values.forall(r => rep(r) == r))
  }

  test("semantic dedup drops only vectors with an exact near-dup partner") {
    import spark.implicits._
    // every dropped vector must appear as the HIGHER id of some exact
    // near-dup pair (same-cell pairs are a subset of all pairs), so
    // dedup_semantic can never discard a vector the exact pair set
    // wouldn't flag
    val kept = Dedup.semanticDedup(spark, sf, Dedup.SemanticThreshold)
      .as[Long].collect().toSet
    val all = graft.Tables.embeddings(spark, sf)
      .select($"vec_id").as[Long].collect().toSet
    val dropped = all -- kept
    val pairHi = Dedup.queries("dedup_embedding")(spark, sf)
      .select($"id_b").as[Long].collect().toSet
    assert(dropped.subsetOf(pairHi),
      s"dropped without an exact pair partner: ${dropped -- pairHi}")
  }

  test("tfidf: hand-computed scores, top-3 bound, deterministic tiebreak") {
    import spark.implicits._
    // 3 docs over a 4-term vocab: df(a)=3, df(b)=2, df(c)=1, df(d)=1
    val docs = Seq(
      (0L, "a a b c"),   // tf: a=2 b=1 c=1
      (1L, "a b b"),     // tf: a=1 b=2
      (2L, "a d"))       // tf: a=1 d=1
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("tfidf").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.queries("txt_tfidf_top")(spark, tmp)
      .as[(Long, String, Double, Long)].collect().toSet
    def s(tf: Int, df: Int) =
      BigDecimal(tf * math.log(3.0 / df))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // ln(3/3)=0 ⇒ 'a' scores 0 everywhere and loses to any positive
    // score; doc 0 keeps its full 3 (c > b > a alphabetical tiebreak
    // among... c=ln3 > b=ln1.5 > a=0), doc 1 = (b, a), doc 2 = (d, a)
    val want = Set(
      (0L, "c", s(1, 1), 1L), (0L, "b", s(1, 2), 2L), (0L, "a", s(2, 3), 3L),
      (1L, "b", s(2, 2), 1L), (1L, "a", s(1, 3), 2L),
      (2L, "d", s(1, 1), 1L), (2L, "a", s(1, 3), 2L))
    assert(got == want, s"got $got")
  }

  test("connected components of an empty pair relation is empty (no iteration)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).count() == 0)
  }

  test("connected components converges on a deep chain within the iteration cap") {
    import spark.implicits._
    // a 60-node path graph, forced onto the DISTRIBUTED propagation
    // (maxDriverEdges = 0): plain min-propagation needs 59 rounds —
    // far past MaxCcIterations — so this passes only because pointer
    // jumping halves remaining path lengths each round (O(log n))
    val chain = (0L until 59L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(chain, maxDriverEdges = 0)
    val reps = cc.select($"rep_id").distinct().as[Long].collect().toSeq
    assert(reps == Seq(0L), s"chain did not collapse to one component: $reps")
    assert(cc.count() == 60)
  }

  test("CC cap-out fails fast by default; opt-out returns labeled best-effort") {
    import spark.implicits._
    // a 60-node path needs ~7 pointer-jumping rounds (+1 confirm);
    // maxIter = 1 cannot converge — the strict default must THROW
    // rather than return coarser-than-final labels (a silent wrong
    // dedup answer), on BOTH distributed CC paths
    val chain = (0L until 59L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val eProp = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxDriverEdges = 0, maxIter = 1).count()
    }
    assert(eProp.getMessage.contains("no fixpoint"))
    val eStar = intercept[IllegalStateException] {
      Dedup.largeStarSmallStar(chain, maxIter = 1).count()
    }
    assert(eStar.getMessage.contains("no fixpoint"))
    // explicit opt-out: still one label row per node (valid partition
    // refinement), just not necessarily final
    val be = Dedup.connectedComponents(chain, maxDriverEdges = 0,
      maxIter = 1, requireConvergence = false)
    assert(be.count() == 60)
    val beStar = Dedup.largeStarSmallStar(chain, maxIter = 1,
      requireConvergence = false)
    assert(beStar.count() == 60)
  }

  test("large-star/small-star CC agrees with both existing paths") {
    import spark.implicits._
    // deep chain (the star algorithm's O(log²)-round claim territory),
    // cycle+chord+tail, isolated pair, min-inside-chain — and the real
    // near-dup pair graph from the fixture corpus
    val chain = (0L until 59L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // (50, 50): a node whose ONLY row is a self-pair must still get a
    // singleton label from every path
    val mixed = Seq((7L, 3L), (3L, 11L), (20L, 21L), (21L, 22L),
      (20L, 22L), (22L, 25L), (40L, 41L), (50L, 50L)).toDF("id_a", "id_b")
    val corpus = Dedup.jaccardPairs(spark, sf)
      .filter(round($"jaccard", 6) >= Dedup.JaccardThreshold)
      .select($"id_a", $"id_b")
    for (g <- Seq(chain, mixed, corpus)) {
      val stars = Dedup.largeStarSmallStar(g).as[(Long, Long)].collect().toSet
      val prop = Dedup.connectedComponents(g, maxDriverEdges = 0)
        .as[(Long, Long)].collect().toSet
      val uf = Dedup.connectedComponents(g).as[(Long, Long)].collect().toSet
      assert(stars == prop && stars == uf,
        s"star-CC disagrees: extra=${stars -- prop} missing=${prop -- stars}")
    }
  }

  test("CC driver union-find and distributed propagation agree") {
    import spark.implicits._
    // mixed shape: a chain, a triangle with a chord, an isolated pair,
    // and ids arriving in edge order that differs from component order
    val edges = Seq(
      (7L, 3L), (3L, 11L),            // chain with min inside
      (20L, 21L), (21L, 22L), (20L, 22L), (22L, 25L), // cycle + tail
      (40L, 41L))                      // isolated pair
      .toDF("id_a", "id_b")
    def run(cap: Long) = Dedup.connectedComponents(edges, cap)
      .as[(Long, Long)].collect().toSet
    val driver = run(Dedup.CcDriverEdgeCap)
    val dist = run(0)
    assert(driver == dist, s"paths diverged: $driver vs $dist")
    assert(driver == Set((3L, 3L), (7L, 3L), (11L, 3L),
      (20L, 20L), (21L, 20L), (22L, 20L), (25L, 20L),
      (40L, 40L), (41L, 40L)))
  }

  test("IVF Lloyd training is driver-bounded and the distributed path agrees") {
    // path selection: bench-scale corpora train on the driver; the
    // parameter caps would cost hours of one core and cross to the
    // distributed assignment path
    assert(Similarity.trainFlops(64L * Similarity.ivfK(500), Similarity.ivfK(500))
      <= Similarity.DriverTrainFlopsCap)
    assert(Similarity.trainFlops(Similarity.IvfSampleCap, Similarity.IvfKCap)
      > Similarity.DriverTrainFlopsCap)
    // forcing the distributed path (maxDriverFlops = 0) must reproduce
    // the driver-path centroids up to double-addition order (≤1e-14
    // relative): pairwise cosine of corresponding centroids ≈ 1
    val local = Similarity.trainCentroids(spark, clusteredFixture)
    val dist = Similarity.trainCentroids(spark, clusteredFixture, maxDriverFlops = 0)
    assert(local.length == dist.length)
    local.zip(dist).foreach { case ((idA, a, na), (idB, b, nb)) =>
      assert(idA == idB)
      var dot = 0.0; var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
      val cos = dot / na / nb
      assert(cos >= 1.0 - 1e-9, s"centroid $idA diverged: cos=$cos")
    }
  }

  test("dedup_substring: maximal cross-doc duplicated runs, hand-computed") {
    import spark.implicits._
    // doc 0/1 share the token prefix "a b c d" -> duplicated shingles
    // "a b c" (pos 0) and "b c d" (pos 1) form ONE maximal run in each;
    // doc 3 carries the same two shingles at NON-adjacent positions
    // (0 and 6) -> two single-shingle runs (the gaps-and-islands case);
    // doc 2 shares nothing.
    val tmp = java.nio.file.Files.createTempDirectory("substr").toString
    Seq(
      (0L, "a b c d e f"),
      (1L, "a b c d x y"),
      (2L, "zz ww qq"),
      (3L, "a b c q q q b c d q"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.queries("dedup_substring")(spark, tmp)
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(got == Set(
      (0L, 0, 1, 2L),
      (1L, 0, 1, 2L),
      (3L, 0, 0, 1L),
      (3L, 6, 6, 1L)))
    // a doc shorter than one shingle can't crash the positional kernel
    Seq((9L, "one two")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    assert(Dedup.queries("dedup_substring")(spark, tmp).count() == 0)
  }

  test("dedup_lines: first occurrence survives, blanks survive, docs rebuilt in order") {
    import spark.implicits._
    // doc 0 owns "alpha beta" (pos 0) and a self-repeat at pos 2; doc 1
    // repeats it again plus a unique line; doc 2 is blank-structured
    // around a line doc 0 also holds; doc 3 is null text; doc 4 empty.
    val tmp = java.nio.file.Files.createTempDirectory("lines").toString
    Seq(
      (0L, Some("alpha beta\nshared tail\nalpha beta")),
      (1L, Some("only mine\nalpha beta")),
      (2L, Some("\nshared tail\n  \nkept solo")),
      (3L, None: Option[String]),
      (4L, Some("")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.queries("dedup_lines")(spark, tmp)
      .as[(Long, Long, Long, Option[String])].collect()
      .map(r => r._1 -> r).toMap
    // doc 0: keeps pos 0+1, drops its own pos-2 repeat
    assert(got(0L) == ((0L, 3L, 2L, Some("alpha beta\nshared tail"))))
    // doc 1: "alpha beta" lost to doc 0, unique line kept
    assert(got(1L) == ((1L, 2L, 1L, Some("only mine"))))
    // doc 2: blanks (empty + spaces) survive in place; "shared tail"
    // lost to doc 0's earlier occurrence; unique line kept
    assert(got(2L) == ((2L, 4L, 3L, Some("\n  \nkept solo"))))
    // null text: no lines, NULL rebuild
    assert(got(3L) == ((3L, 0L, 0L, None)))
    // empty text: one blank line, kept verbatim
    assert(got(4L) == ((4L, 1L, 1L, Some(""))))
    // corpus invariant at the fixture: token mass never grows, and a
    // doc's surviving text is always a subsequence of its lines
    val full = Dedup.queries("dedup_lines")(spark, sf)
    assert(full.filter($"n_kept" > $"n_lines").count() == 0)
    assert(full.filter($"text_dedup".isNull && $"n_lines" > 0).count() == 0)
  }

  test("sim_recall_eval: per-query recall matches an independent set intersection") {
    import spark.implicits._
    val r = Similarity.queries("sim_recall_eval")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(r.nonEmpty)
    val bf = Similarity.topkBruteForce(spark, sf)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.topkIvf(spark, sf)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    assert(r.map(_._1).toSet == bf.map(_._1))
    r.foreach { case (q, nTrue, nHits, rec) =>
      val truth = bf.filter(_._1 == q)
      val hits = truth.count(ivf.contains)
      assert(nTrue == truth.size && nHits == hits, s"q=$q")
      assert(math.abs(rec - hits.toDouble / truth.size) < 1e-6, s"q=$q")
    }
  }

  test("txt_c4_rules: line retention and page gates pin the published rule set") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("c4").toString
    val keepLine = "this line has enough words to pass."
    Seq(
      // doc 0: three proper sentences on kept lines → keep
      (0L, Some(s"$keepLine\n$keepLine\nanother full sentence right here today!")),
      // doc 1: line lacks terminal punctuation → dropped → 0 sentences
      (1L, Some("this line has enough words but no mark")),
      // doc 2: four words only → dropped despite the period
      (2L, Some("too few words here.")),
      // doc 3: javascript line dropped, case-insensitively
      (3L, Some(s"please enable JavaScript to continue reading this.\n$keepLine")),
      // doc 4: lorem ipsum page-gate fires even with clean lines
      (4L, Some(s"$keepLine\n$keepLine\nlorem ipsum dolor sit amet today.")),
      // doc 5: curly brace page-gate
      (5L, Some(s"$keepLine\n$keepLine\nfunction f() { return 1; } is code.")),
      // doc 6: null text → zero counts, NULL rebuild
      (6L, None: Option[String]),
      // doc 7: kept lines but only two sentence marks → dropped
      (7L, Some(s"$keepLine\n$keepLine")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.queries("txt_c4_rules")(spark, tmp)
      .as[(Long, Long, Long, Long, Long, Long, Option[String], Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(0L)._8 == 1L && got(0L)._3 == 3L && got(0L)._4 == 3L)
    assert(got(1L)._3 == 0L && got(1L)._8 == 0L)
    assert(got(2L)._3 == 0L)
    assert(got(3L)._3 == 1L && got(3L)._7 == Some(keepLine))
    assert(got(4L)._5 == 1L && got(4L)._8 == 0L && got(4L)._3 == 3L)
    assert(got(5L)._6 == 1L && got(5L)._8 == 0L)
    assert(got(6L) == ((6L, 0L, 0L, 0L, 0L, 0L, None, 0L)))
    assert(got(7L)._3 == 2L && got(7L)._4 == 2L && got(7L)._8 == 0L)
    // corpus invariants: kept ⊆ lines; keep ⇒ sentence floor met
    val full = TextAnalysis.queries("txt_c4_rules")(spark, sf)
    assert(full.filter($"n_kept" > $"n_lines").count() == 0)
    assert(full.filter($"keep" === 1L &&
      $"n_sentences" < TextAnalysis.C4MinSentences).count() == 0)
  }

  test("evt_dau_mau: trailing-window MAU matches an independent recompute") {
    import spark.implicits._
    val r = Relational.queries("evt_dau_mau")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(r.nonEmpty)
    // MAU bounds DAU; stickiness is exactly their quotient
    r.foreach { case (_, dau, mau, st) =>
      assert(mau >= dau && st == dau.toDouble / mau.toDouble)
    }
    // independent recompute from the raw user-day set
    val ud = graft.Tables.events(spark, sf)
      .select($"user_id", expr("unix_micros(ts) div 1000 div 86400000").as("day"))
      .distinct().as[(Long, Long)].collect()
    val byDay = ud.groupBy(_._2)
    r.foreach { case (day, dau, mau, _) =>
      assert(dau == byDay(day).length, s"day $day dau")
      val want = ud.filter { case (_, d2) =>
        d2 <= day && d2 > day - Relational.MauWindowDays
      }.map(_._1).distinct.length
      assert(mau == want, s"day $day mau $mau vs $want")
    }
    // every observed day reports
    assert(r.map(_._1).toSet == byDay.keySet)
  }

  test("evt_anomaly: z-scores match exact-moment recompute; constant series pin z=0") {
    import spark.implicits._
    val r = Relational.queries("evt_anomaly")(spark, sf)
      .as[(String, Long, Long, Double, Long)].collect()
    assert(r.nonEmpty)
    // recompute from the (type, day) counts with the same exact
    // integer moments — z must be BIT-equal (no tolerance)
    val daily = r.groupBy(_._1)
    daily.foreach { case (_, rows) =>
      val n = rows.length.toDouble
      val sc = rows.map(_._3).sum.toDouble
      val sc2 = rows.map(c => c._3 * c._3).sum.toDouble
      val mu = sc / n
      val sd = math.sqrt(math.max(sc2 / n - mu * mu, 0.0))
      rows.foreach { case (_, _, cnt, z, flag) =>
        val want = if (sd == 0.0) 0.0 else (cnt.toDouble - mu) / sd
        assert(z == want, s"z drifted: $z vs $want")
        assert(flag == (if (math.abs(z) > Relational.ZScoreThreshold) 1L else 0L))
      }
    }
    // constant series: one event per day → sd=0 → z=0, never NaN
    val tmp = java.nio.file.Files.createTempDirectory("anom").toString
    (0 until 5).map(i => (i.toLong,
        java.sql.Timestamp.valueOf(s"2026-01-0${i + 1} 00:00:00"),
        1L, "ping", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val const = Relational.queries("evt_anomaly")(spark, tmp)
      .as[(String, Long, Long, Double, Long)].collect()
    assert(const.length == 5 && const.forall(c => c._4 == 0.0 && c._5 == 0L))
  }

  test("pipe_train_manifest reconciles with pipe_curate") {
    import spark.implicits._
    val man = TextAnalysis.queries("pipe_train_manifest")(spark, sf)
      .as[(Int, Long, Long, Long)].collect()
    assert(man.nonEmpty && man.map(_._1).distinct.length == man.length)
    val cur = TextAnalysis.queries("pipe_curate")(spark, sf)
      .select($"doc_id", $"n_tokens").as[(Long, Int)].collect()
    // shard totals cover exactly the curated set
    assert(man.map(_._2).sum == cur.length)
    assert(man.map(_._3).sum == cur.map(_._2.toLong).sum)
    // per-shard membership fingerprint: xor of the same 32-bit keys
    def hex32(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
    }
    val wantFp = cur.groupBy(c => (hex32(c._1) >> 28).toInt)
      .map { case (sh, rows) => sh -> rows.map(c => hex32(c._1)).reduce(_ ^ _) }
    man.foreach { case (sh, _, _, fp) =>
      assert(wantFp(sh) == fp, s"shard $sh fingerprint")
    }
  }

  test("PQ Lloyd training is flops-guarded and the distributed path agrees") {
    // fixture parameters sit far under the driver cap; production
    // 256-codeword books at the full sample cap would exceed it, so
    // the guard (not a comment) decides the path
    assert(Similarity.trainFlops(Similarity.IvfSampleCap, Pq.PqCodewords)
      <= Similarity.DriverTrainFlopsCap)
    assert(Similarity.trainFlops(Similarity.IvfSampleCap, 256)
      > Similarity.DriverTrainFlopsCap)
    // forcing the distributed branch (maxDriverFlops = 0) must
    // reproduce the driver-path codebooks up to partition-ordered
    // double-addition drift
    val local = Pq.trainCodebooks(spark, sf)
    val dist = Pq.trainCodebooks(spark, sf, maxDriverFlops = 0)
    assert(local.length == dist.length)
    for (sub <- local.indices; code <- local(sub).indices) {
      val (a, b) = (local(sub)(code), dist(sub)(code))
      assert(a.length == b.length)
      var d2 = 0.0; var i = 0
      while (i < a.length) {
        val dd = a(i).toDouble - b(i).toDouble; d2 += dd * dd; i += 1
      }
      assert(math.sqrt(d2) <= 1e-6,
        s"codebook[$sub][$code] diverged: l2=${math.sqrt(d2)}")
    }
  }

  test("deterministic sample is invariant under repartitioning and rerun") {
    import spark.implicits._
    val ids = { () =>
      TextAnalysis.queries("txt_sample_det")(spark, sf)
        .select($"doc_id").as[Long].collect().toSet
    }
    val first = ids()
    assert(first.nonEmpty)
    assert(ids() == first) // rerun-stable (no RNG state)
    // the same predicate over a differently-partitioned relation
    // selects the same documents — the property rand() sampling lacks
    val repart = graft.Tables.documents(spark, sf).repartition(7)
      .filter(substring(
        md5(to_binary($"doc_id".cast("string"), lit("utf-8"))), 1, 2)
        < TextAnalysis.SampleThreshold)
      .select($"doc_id").as[Long].collect().toSet
    assert(repart == first)
  }

  test("token counting handles edge whitespace and empty strings") {
    import spark.implicits._
    val df = Seq(("", 0), ("  ", 0), (" a  b ", 2), ("one", 1))
      .toDF("text", "expected")
    val got = df.select(size(TextAnalysis.tokens($"text")).as("n"), $"expected")
      .filter($"n" =!= $"expected").count()
    assert(got == 0)
  }

  test("shingles: fewer tokens than n yields no shingles, not a crash") {
    import spark.implicits._
    val df = Seq("a b", "a b c", "a b c d").toDF("text")
      .select(size(Dedup.shingles($"text")).as("n"))
    assert(df.as[Int].collect().toSeq == Seq(0, 1, 2))
  }

  test("null text is null-safe across the dedup kernels (empty, not NPE)") {
    import spark.implicits._
    val df = Seq((1L, null: String), (2L, "a b c d")).toDF("doc_id", "text")
    val r = df.select(
      size(Dedup.shingles($"text")).as("n_sh"),
      Dedup.simhashUdf(TextAnalysis.tokens($"text")).as("sh"),
      size(Dedup.minhashSig(Dedup.shingleHashes($"text"))).as("n_sig"))
      .collect()
    assert(r(0).getInt(0) == 0)     // null text -> no shingles
    assert(r(0).getLong(1) == 0L)   // null text -> zero simhash votes
    assert(r(0).getInt(2) == Dedup.NumHashes) // sentinel sig, right arity
    assert(r(1).getInt(0) == 2)
  }

  test("high-DF shingle guard bounds inverted-index pair emission") {
    import spark.implicits._
    // 60 docs that share ONE boilerplate shingle ("common boiler plate")
    // but are otherwise unique: the hot bucket alone would emit
    // 60*59/2 = 1770 pairs. With a DF cutoff below 60 the bucket is
    // dropped and emission is zero — the guard that stops a 10⁵-doc
    // boilerplate bucket emitting 5·10⁹ pairs at corpus scale.
    val docs = (0 until 60).map(i =>
      (i.toLong, s"common boiler plate unique$i filler$i word$i"))
    val tmp = java.nio.file.Files.createTempDirectory("hotdf").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    assert(Dedup.jaccardPairs(spark, tmp).count() == 1770)
    assert(Dedup.jaccardPairs(spark, tmp, maxDf = 10).count() == 0)
    // the default cutoff is far above any test-corpus DF (max 25 at
    // sf0.1), so declared query outputs are unchanged by the guard
    assert(Dedup.MaxShingleDf > 25 * 4)
  }

  test("DF cull runs BEFORE collect_list: hot key never reaches an aggregation buffer") {
    import spark.implicits._
    // One boilerplate shingle in 80 docs with maxDf = 10: the
    // single-pass form would materialize the hot bucket's 80-element
    // doc list in ONE aggregation buffer before its filter dropped it
    // (the executor-OOM shape at 10⁸ docs). The two-pass form must
    // (a) keep moderate-DF pairs intact, (b) drop the hot bucket, and
    // (c) show the cull in the PLAN: a LeftSemi join upstream of the
    // collect_list aggregate, and a count-style partial aggregate —
    // never a collect_list — on the relation that sees unbounded DF.
    val hot = (0 until 80).map(i =>
      (i.toLong, s"common boiler plate unique$i filler$i word$i"))
    // two exact near-dup docs sharing a moderate shingle set
    val dup = Seq((100L, "alpha beta gamma delta"),
      (101L, "alpha beta gamma delta"))
    val tmp = java.nio.file.Files.createTempDirectory("hotcull").toString
    (hot ++ dup).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val pairs = Dedup.jaccardPairs(spark, tmp, maxDf = 10)
    val got = pairs.collect()
    assert(got.length == 1 && got(0).getAs[Long]("id_a") == 100L &&
      got(0).getAs[Long]("id_b") == 101L &&
      got(0).getAs[Double]("jaccard") == 1.0)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"expected the DF-cull semi-join in the plan:\n$plan")
    // collect_list appears exactly once (the bounded post-cull
    // aggregate); the unbounded pre-cull pass is a count aggregate
    val nCollect = "collect_list".r.findAllIn(plan).length
    assert(nCollect >= 1 && plan.indexOf("LeftSemi") >= 0 &&
      plan.indexOf("collect_list") < plan.indexOf("LeftSemi"),
      // executedPlan prints top-down: the collect_list aggregate must
      // sit ABOVE (before, in print order) the semi-join feeding it
      s"collect_list must consume the culled relation:\n$plan")
  }

  test("dedup_cdc_cluster plan carries the same pre-collect DF cull") {
    // the edge relation, not the declared query: connectedComponents
    // materializes the (tiny) component map, so the query's own plan
    // is a LocalTableScan that hides the upstream shape. r18 star
    // reduction: TWO branches union'd, BOTH downstream of the DF-cull
    // semi-join — the long-chunk star branch carries a min() anchor
    // aggregate and NO collect_list (that is the reduction: df-sized
    // groups never buffer a doc list, never emit clique pairs), the
    // short-chunk branch keeps the bounded collect_list shape.
    val df = Dedup.cdcClusterEdges(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert("LeftSemi".r.findAllIn(plan).length >= 2,
      s"expected the chunk-DF cull semi-join under both branches:\n$plan")
    // one logical collect_list aggregate = at most two prints
    // (partial + final); a star branch buffering doc lists would
    // double the count
    assert("collect_list".r.findAllIn(plan).length <= 2,
      s"exactly the short-chunk branch may buffer doc lists:\n$plan")
    assert(plan.contains("min(doc_id"),
      s"expected the star branch's map-side-combinable anchor min:\n$plan")
  }

  test("empty-shingle docs are excluded from LSH banding (no sentinel pair blowup)") {
    import spark.implicits._
    // 50 short docs (<3 tokens) share the sentinel signature; before the
    // guard they collided in all 32 bands -> 1225 candidate pairs.
    val shorts = (0 until 50).map(i => (i.toLong, s"tiny$i doc"))
    val dups = Seq((100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "alpha beta gamma delta epsilon zeta"))
    val tmp = java.nio.file.Files.createTempDirectory("sentinel").toString
    (shorts ++ dups).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val cand = Dedup.lshCandidates(spark, tmp)
      .as[(Long, Long)].collect().toSet
    assert(cand == Set((100L, 101L)),
      s"sentinel docs leaked into candidates: $cand")
  }

  test("embedding LSH scale path: recall 1.0 on near-dup clusters at cos>=0.9") {
    import spark.implicits._
    // 40 seeded random unit vectors, each with a tiny perturbation of
    // itself (cos >= ~0.999): the LSH candidates + exact-verify path
    // must find exactly the 40 planted pairs (random 64-dim vectors are
    // near-orthogonal, so nothing else reaches 0.9). Deterministic:
    // fixed seed, fixed planes.
    val rnd = new scala.util.Random(7)
    val base = Array.fill(40)(Array.fill(Similarity.Dim)(rnd.nextGaussian().toFloat))
    val rows = base.zipWithIndex.flatMap { case (v, i) =>
      val nrm = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      val unit = v.map(x => (x / nrm).toFloat)
      val pert = unit.zipWithIndex.map { case (x, j) =>
        (x + (if (j == 0) 0.01f else 0f)) }
      Seq((2L * i, unit.toSeq), (2L * i + 1, pert.toSeq))
    }
    val df = rows.toSeq.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val got = Dedup.embeddingLshPairs(df, 0.9)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val want = (0 until 40).map(i => (2L * i, 2L * i + 1)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("IVF centroid count is sqrt(n) capped — independent of corpus blowup") {
    // assignment cost is O(n·k): k must not grow linearly with n
    assert(Similarity.ivfK(500) == 23)
    assert(Similarity.ivfK(2000) == 45)
    assert(Similarity.ivfK(100L * 1000 * 1000 * 1000) == Similarity.IvfKCap)
    // trained matrix matches the formula (constant-size broadcast side)
    val cents = Similarity.trainCentroids(spark, "/root/testdata/sf0.01")
    assert(cents.length == Similarity.ivfK(500))
    // centroids are unit-normalized (spherical k-means invariant)
    assert(cents.forall { case (_, _, nrm) => math.abs(nrm - 1.0) < 1e-6 })
    // the built index covers the corpus exactly once at the default
    // single assignment (the ivf_build query's row contract)
    val built = Similarity.ivfIndex(spark, "/root/testdata/sf0.01")
    assert(built.assigned.count() == 500)
  }

  test("bloom decontamination equals the exact path (sketch is a prefilter, not semantics)") {
    val sf01 = "/root/testdata/sf0.01"
    val exact = TextAnalysis.queries("txt_decontaminate")(spark, sf01)
    val bloom = TextAnalysis.queries("txt_bloom_decontaminate")(spark, sf01)
    assert(exact.count() > 0)
    assert(bloom.except(exact).isEmpty && exact.except(bloom).isEmpty)
  }

  test("training windows tile each document: stride spacing, full coverage, bounded length") {
    import spark.implicits._
    val W = TextAnalysis.WinTokens
    val S = TextAnalysis.WinStride
    val wins = TextAnalysis.queries("txt_windows")(spark, sf)
      .select($"doc_id", $"win_id", $"tok_start", $"n_toks")
      .as[(Long, Long, Long, Long)].collect().groupBy(_._1)
    val nTok = TextAnalysis.queries("txt_tokens")(spark, sf)
      .select($"doc_id", $"n_tokens").as[(Long, Long)].collect().toMap
    assert(wins.nonEmpty && wins.keySet == nTok.keySet)
    wins.foreach { case (doc, ws) =>
      val n = nTok(doc)
      val sorted = ws.sortBy(_._2)
      // contiguous ids from 0, stride-spaced starts, ≤W tokens each
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
      assert(sorted.forall { case (_, w, st, nt) => st == w * S && nt <= W })
      // full coverage: the last window ends exactly at the doc's end,
      // and every non-final window is full-width
      assert(sorted.last._3 + sorted.last._4 == n)
      assert(sorted.init.forall(_._4 == W))
      // window count matches the declared formula
      assert(sorted.length == 1 + (math.max(n - W, 0) + S - 1) / S)
    }
  }

  test("vocab ids are contiguous ranks in (count desc, token asc) order") {
    import spark.implicits._
    val v = TextAnalysis.queries("txt_vocab")(spark, sf)
      .select($"token", $"token_id", $"n_occ")
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(v.nonEmpty && v.length <= TextAnalysis.VocabSize)
    assert(v.map(_._2).toSeq == v.indices.map(_.toLong))
    v.sliding(2).foreach {
      case Array((t1, _, c1), (t2, _, c2)) =>
        assert(c1 > c2 || (c1 == c2 && t1 < t2))
      case _ =>
    }
  }

  test("cohort retention: offset 0 is the cohort census and bounds every later offset") {
    import spark.implicits._
    val r = Relational.queries("evt_retention")(spark, sf)
      .select($"cohort_day", $"day_offset", $"n_users")
      .as[(Long, Long, Long)].collect()
    assert(r.nonEmpty && r.forall(_._2 >= 0))
    val byCohort = r.groupBy(_._1)
    byCohort.foreach { case (_, rows) =>
      val at0 = rows.find(_._2 == 0).map(_._3)
      // every user's first day is offset 0, so the census row exists
      // and no later offset can exceed it
      assert(at0.nonEmpty)
      assert(rows.forall(_._3 <= at0.get))
    }
    // offset-0 rows partition the user base: they sum to the distinct
    // user count of the whole event stream
    val users = graft.Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(byCohort.values.map(_.find(_._2 == 0).get._3).sum == users)
  }

  test("int8 quantization: error bounded by scale/2, range bounded by ±127, exact on zeros") {
    import spark.implicits._
    val q = Embeddings.queries("emb_quantize")(spark, sf)
      .select($"vec_id", $"dim", $"qv", $"scale")
      .as[(Long, Int, Int, Double)].collect()
    val raw = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, e) => id -> e }.toMap
    assert(q.nonEmpty)
    q.foreach { case (id, dim, qv, scale) =>
      val x = raw(id)(dim).toDouble
      assert(math.abs(qv) <= 127)
      if (scale == 0) assert(qv == 0 && x == 0)
      // round-to-nearest: dequantized value within half a step (+eps
      // for the x = ±amax boundary where 127*scale ≈ amax in FP)
      else assert(math.abs(x - qv * scale) <= scale / 2 + 1e-9,
        s"vec $id dim $dim: x=$x qv=$qv scale=$scale")
    }
  }

  test("normalized exact dedup collapses case/whitespace variants; byte dedup does not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("norm_dedup").toString
    Seq(
      (1L, "The Quick  Brown Fox", "en", "a", 20L),
      (2L, "the quick brown\tfox ", "en", "a", 20L), // variant of 1
      (3L, "an entirely different doc", "en", "a", 25L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val norm = Dedup.queries("dedup_exact_norm")(spark, dir)
      .select($"keeper_id", $"n_copies").as[(Long, Long)].collect().toSet
    assert(norm == Set((1L, 2L), (3L, 1L)), s"got $norm")
    val exact = Dedup.queries("dedup_exact")(spark, dir)
    assert(exact.count() == 3) // byte-hash sees three distinct docs
  }

  test("curation pipeline: quality-gated, dup-free, train-split-only, uncontaminated") {
    import spark.implicits._
    val curated = TextAnalysis.queries("pipe_curate")(spark, sf)
    val ids = curated.select($"doc_id").as[Long].collect().toSet
    assert(ids.nonEmpty)
    // ⊆ the standalone quality gate's survivors
    val quality = TextAnalysis.queries("txt_quality_filter")(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(quality))
    // exact-dup free: one doc per content hash among the curated set
    val docs = graft.Tables.documents(spark, sf)
    val hashes = docs.filter($"doc_id".isInCollection(ids))
      .select(md5($"text")).as[String].collect()
    assert(hashes.length == hashes.distinct.length)
    // train split only, and disjoint from the flagged contaminated set
    val eval = docs.filter(
      substring(md5($"doc_id".cast("string")), 1, 2) <
        TextAnalysis.EvalSplitThreshold)
      .select($"doc_id").as[Long].collect().toSet
    assert((ids & eval).isEmpty)
    val contaminated = TextAnalysis.queries("txt_decontaminate")(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    assert((ids & contaminated).isEmpty)
  }

  test("funnel stages are monotone and stage 1 is the viewer census") {
    import spark.implicits._
    val f = Relational.queries("evt_funnel")(spark, sf)
      .select($"stage", $"n_users").as[(Int, Long)].collect().toMap
    assert(f.keySet == Set(1, 2, 3))
    // ordered reachability: stage-k users are a subset of stage-(k-1)
    assert(f(1) >= f(2) && f(2) >= f(3) && f(3) > 0)
    val viewers = graft.Tables.events(spark, sf)
      .filter($"event_type" === "view").select($"user_id").distinct().count()
    assert(f(1) == viewers)
  }

  test("gopher rules: a constructed corpus trips each rule independently") {
    import spark.implicits._
    // one doc per failure mode, plus one that passes everything
    val good = (Seq("the", "and", "of") ++
      (1 to 57).map(i => s"word$i")).mkString(" ")       // 60 ok words
    val short = "the cat and dog sat"                    // 5 words
    val numeric = (1 to 60).map(_ => "12345").mkString(" ") // no alpha, no stop
    val symbols = (Seq("the", "and") ++ (1 to 48).map(i => s"word$i") ++
      (1 to 10).map(i => s"trail$i...")).mkString(" ")   // 10/60 symbol marks
    val longWords = (Seq("the", "and") ++
      (1 to 58).map(_ => "abcdefghijklmno")).mkString(" ") // mean wlen ≈ 14.6
    val docs = Seq((0L, good), (1L, short), (2L, numeric),
      (3L, symbols), (4L, longWords)).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("gopher").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.queries("txt_gopher_rules")(spark, tmp)
      .select($"doc_id", $"n_words", $"n_stop", $"n_fail", $"pass")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, 60L, 3L, 0L, 1L)))  // passes all five
    assert(got(1L) == ((1L, 5L, 2L, 1L, 0L)))   // word-count floor only
    assert(got(2L)._4 == 2L && got(2L)._5 == 0L) // alpha + stopword rules
    assert(got(3L) == ((3L, 60L, 2L, 1L, 0L)))  // symbol ratio only
    assert(got(4L) == ((4L, 60L, 2L, 1L, 0L)))  // mean word length only
    // on the real corpus: n_words is txt_tokens' n_tokens, and pass
    // is exactly the zero-fail rows
    val g = TextAnalysis.queries("txt_gopher_rules")(spark, sf)
    val t = TextAnalysis.queries("txt_tokens")(spark, sf)
    assert(g.join(t, "doc_id").filter($"n_words" =!= $"n_tokens").count() == 0)
    assert(g.filter(($"pass" === 1L) =!= ($"n_fail" === 0L)).count() == 0)
    assert(g.filter($"pass" === 1L).count() > 0)
  }

  test("topk paths: a census of sessions in total order over the event alphabet") {
    import spark.implicits._
    val paths = Relational.queries("evt_topk_paths")(spark, sf)
      .as[(String, Long)].collect()
    assert(paths.nonEmpty && paths.length <= Relational.PathTopK)
    // the declared ordering (count desc, path asc) is total and kept
    assert(paths.sameElements(paths.sortBy { case (p, n) => (-n, p) }))
    // each path spells event types from the corpus alphabet
    val types = graft.Tables.events(spark, sf).select($"event_type")
      .distinct().as[String].collect().toSet
    assert(paths.forall(_._1.split(">").forall(types.contains)))
    // top paths cover no more sessions than exist
    val nSessions = Relational.queries("evt_sessions")(spark, sf).count()
    assert(paths.map(_._2).sum <= nSessions)
  }

  test("range search: clears the radius, contains the qualifying top-k, monotone in radius") {
    import spark.implicits._
    val range = Similarity.queries("sim_range")(spark, sf)
      .as[(Long, Long, Double)].collect().toSet
    assert(range.nonEmpty)
    assert(range.forall(_._3 >= Similarity.RangeRadius))
    // independent path: every brute-force top-k row at/above the
    // radius must appear (window+rank there, bare filter here)
    val topk = Similarity.topkBruteForce(spark, sf)
      .select($"q_id", $"n_id", $"cos_sim").as[(Long, Long, Double)]
      .collect().filter(_._3 >= Similarity.RangeRadius).toSet
    assert(topk.nonEmpty && topk.subsetOf(range))
    // a tighter radius returns a subset
    val tight = Similarity.rangeSearch(spark, sf, radius = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(tight.subsetOf(range))
  }

  test("evt_asof: picks the latest prior click; ties break on event_id; no-click sentinel") {
    import spark.implicits._
    def t(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val tmp = java.nio.file.Files.createTempDirectory("asof").toString
    Seq(
      // user 1: two clicks before the purchase → latest one wins
      (10L, t(10), 1L, "click", 1.0, "{}"),
      (11L, t(20), 1L, "click", 1.0, "{}"),
      (12L, t(30), 1L, "purchase", 5.0, "{}"),
      // user 2: click only AFTER the purchase → sentinel -1s
      (20L, t(40), 2L, "purchase", 5.0, "{}"),
      (21L, t(50), 2L, "click", 1.0, "{}"),
      // user 3: click at the SAME ts as the purchase — smaller
      // event_id sorts before the purchase in the total order → it
      // attributes; a same-ts click with a LARGER id must not
      (30L, t(60), 3L, "click", 1.0, "{}"),
      (31L, t(60), 3L, "purchase", 5.0, "{}"),
      (32L, t(60), 3L, "click", 1.0, "{}"),
      // a view between click and purchase must not break attribution
      (40L, t(70), 4L, "click", 1.0, "{}"),
      (41L, t(75), 4L, "view", 0.0, "{}"),
      (42L, t(80), 4L, "purchase", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = Relational.queries("evt_asof")(spark, tmp)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(x => x._2 -> x).toMap
    assert(r.size == 4)
    val (_, _, p1, c1, ct1, lag1) = r(12L)
    assert(c1 == 11L && lag1 == p1 - ct1 && lag1 == 10000L)
    assert(r(20L)._4 == -1L && r(20L)._5 == -1L && r(20L)._6 == -1L)
    assert(r(31L)._4 == 30L && r(31L)._6 == 0L,
      "same-ts smaller-id click must attribute; larger-id must not")
    assert(r(42L)._4 == 40L && r(42L)._6 == 10000L)
  }

  test("evt_attrib_window: window boundaries, cent-exact sums, zero-click purchases kept") {
    import spark.implicits._
    val W = Relational.AttribWindowMs
    def t(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)
    val tmp = java.nio.file.Files.createTempDirectory("attrib").toString
    val pTs = 2L * W + 1000L // purchase sits just after a bucket edge
    Seq(
      // user 1 clicks around the purchase at pTs:
      (1L, t(pTs - W - 1), 1L, "click", 1.00, "{}"),  // 1ms too old
      (2L, t(pTs - W), 1L, "click", 2.25, "{}"),      // exactly at the edge: IN
      (3L, t(pTs - 1), 1L, "click", 3.10, "{}"),      // just inside: IN
      (4L, t(pTs), 1L, "click", 4.00, "{}"),          // at p_ts: OUT (exclusive)
      (5L, t(pTs), 1L, "purchase", 9.99, "{}"),
      // user 2's click inside user 1's window must not leak across users
      (6L, t(pTs - 10), 2L, "click", 7.00, "{}"),
      // user 2: purchase with no clicks in window
      (7L, t(pTs + 5000), 2L, "purchase", 1.00, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = Relational.queries("evt_attrib_window")(spark, tmp)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(x => x._2 -> x).toMap
    assert(r.size == 2)
    // user 1: clicks 2 and 3 qualify → 225 + 310 cents
    assert(r(5L)._4 == 2L && r(5L)._5 == 535L)
    // user 2: its own click is 5s+10ms before its purchase → inside
    // the window; user 1's clicks never leak in
    assert(r(7L)._4 == 1L && r(7L)._5 == 700L)
  }

  test("txt_decontaminate_fuzzy: train-side docs only, consistent with the pair relation") {
    import spark.implicits._
    val fuzzy = Dedup.queries("txt_decontaminate_fuzzy")(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(fuzzy.nonEmpty)
    def isEval(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      f"${md(0) & 0xff}%02x" < TextAnalysis.EvalSplitThreshold
    }
    // every flagged doc is on the TRAIN side of the split
    assert(fuzzy.forall(f => !isEval(f._1)))
    // independent recompute from the declared pair relation: the
    // flagged set is exactly the train members of cross-split pairs
    val pairs = Dedup.queries("dedup_ngram_jaccard")(spark, sf)
      .as[(Long, Long, Double)].collect()
    val cross = pairs.filter(p => isEval(p._1) != isEval(p._2))
      .map(p => (if (isEval(p._1)) p._2 else p._1, p._3))
    val want = cross.groupBy(_._1).map { case (id, xs) =>
      (id, xs.length.toLong, xs.map(_._2).max) }
    assert(fuzzy.map(f => (f._1, f._2, f._3)).toSet == want.toSet)
  }

  test("evt_asof / evt_attrib_window: property sweep vs brute-force recompute") {
    import spark.implicits._
    // random event tables drawn on a W/4 grid ±1ms jitter, so exact
    // window edges, same-ts ties, and bucket crossings occur often —
    // the bucketed range join and the windowed as-of must match a
    // direct per-user brute-force recompute on every draw
    val W = Relational.AttribWindowMs
    val types = Array("click", "purchase", "view")
    for (seed <- Seq(7, 41)) {
      val r = new scala.util.Random(seed)
      val rows = (0 until 400).map { i =>
        val ms = r.nextInt(12).toLong * (W / 4) + (r.nextInt(3) - 1)
        (i.toLong, new java.sql.Timestamp(1700000000000L + ms),
          (r.nextInt(8) + 1).toLong, types(r.nextInt(3)),
          r.nextInt(50000) / 100.0, "{}")
      }
      val tmp = java.nio.file.Files.createTempDirectory(s"prop$seed").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")
      case class Ev(id: Long, ms: Long, user: Long, typ: String, v: Double)
      val evs = rows.map(t => Ev(t._1, t._2.getTime, t._3, t._4, t._5))
      val purchases = evs.filter(_.typ == "purchase")

      val asof = Relational.queries("evt_asof")(spark, tmp)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .map(x => x._2 -> x).toMap
      assert(asof.size == purchases.size)
      purchases.foreach { p =>
        val prior = evs.filter(c => c.typ == "click" && c.user == p.user &&
          (c.ms < p.ms || (c.ms == p.ms && c.id < p.id)))
        val want = if (prior.isEmpty) (-1L, -1L, -1L) else {
          val c = prior.maxBy(c => (c.ms, c.id))
          (c.id, c.ms, p.ms - c.ms)
        }
        val got = asof(p.id)
        assert((got._4, got._5, got._6) == want, s"asof seed=$seed p=${p.id}")
      }

      val attrib = Relational.queries("evt_attrib_window")(spark, tmp)
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(x => x._2 -> x).toMap
      assert(attrib.size == purchases.size)
      purchases.foreach { p =>
        val in = evs.filter(c => c.typ == "click" && c.user == p.user &&
          c.ms >= p.ms - W && c.ms < p.ms)
        val wantCents = in.map(c => math.floor(c.v * 100 + 0.5).toLong).sum
        val got = attrib(p.id)
        assert(got._4 == in.size.toLong && got._5 == wantCents,
          s"attrib seed=$seed p=${p.id}: got $got want (${in.size}, $wantCents)")
      }

      // windowed funnel: stage membership and exact lag mass recomputed
      // per user from the same random draw (deadline edges included —
      // the grid makes ts == v_ts + W occur, which must still convert:
      // the bound is inclusive)
      val byUser = evs.groupBy(_.user)
      case class St(users: Long, lag: Long)
      var s1 = St(0, 0); var s2 = St(0, 0); var s3 = St(0, 0)
      byUser.foreach { case (_, es) =>
        val views = es.filter(_.typ == "view")
        if (views.nonEmpty) {
          val vTs = views.map(_.ms).min
          s1 = St(s1.users + 1, s1.lag)
          val clicks = es.filter(c => c.typ == "click" &&
            c.ms > vTs && c.ms <= vTs + W)
          if (clicks.nonEmpty) {
            val cTs = clicks.map(_.ms).min
            s2 = St(s2.users + 1, s2.lag + (cTs - vTs))
            val buys = es.filter(c => c.typ == "purchase" &&
              c.ms > cTs && c.ms <= cTs + W)
            if (buys.nonEmpty)
              s3 = St(s3.users + 1, s3.lag + (buys.map(_.ms).min - cTs))
          }
        }
      }
      val fun = Relational.queries("evt_funnel_windowed")(spark, tmp)
        .as[(Long, Long, Long)].collect().map(x => x._1 -> (x._2, x._3)).toMap
      for ((stage, want) <- Seq(1L -> s1, 2L -> s2, 3L -> s3)) {
        if (want.users > 0)
          assert(fun(stage) == ((want.users, want.lag)),
            s"funnel seed=$seed stage=$stage: got ${fun(stage)} want $want")
        else
          // an empty stage must be ABSENT — an overcounting bug that
          // invents conversions would otherwise slip past the sweep
          assert(!fun.contains(stage),
            s"funnel seed=$seed stage=$stage: spurious row ${fun.get(stage)}")
      }
    }
  }

  test("incremental minhash: new-vs-old pairs only, pushdown and fallback agree") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("incr").toString
    def words(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    // 22 words → 20 shingles; changing the last word flips 3 shingles:
    // common 17 / union 23 → jaccard 0.739 ≥ threshold 0.6
    val base = words("alpha", 21)
    val docs = Seq(
      (10L, s"$base tail0"),   // NEW (id % 10 == 0)
      (3L,  s"$base tail1"),   // old near-dup of 10 → pair (10, 3)
      (7L,  s"$base tail2"),   // old near-dup of 10 → pair (10, 7)
      (20L, words("beta", 22)),  // NEW
      (30L, words("beta", 22)),  // NEW exact dup of 20 → within-batch,
                                 // NOT a new×old pair
      (11L, words("gamma", 22)), // old
      (12L, words("gamma", 22)), // old dup of 11 → old×old, excluded
      (40L, words("delta", 22))  // NEW, unrelated
    ).toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"),
        lit("spec").as("source"), length($"text").cast("long").as("n_chars"))
    docs.write.parquet(s"$tmp/documents.parquet")

    val dir = s"$tmp/index"
    Dedup.writeMinhashIndex(spark, tmp, dir,
      col("doc_id") % Dedup.IncrementalMod =!= 0)
    val got = Dedup.incrementalMinhashPairs(spark, tmp, dir)
      .select($"new_id", $"old_id").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 3L), (10L, 7L)),
      s"expected exactly the engineered new-vs-old pairs, got $got")
    // forced over-cap → the distributed-join fallback; answer identical
    val fb = Dedup.incrementalMinhashPairs(spark, tmp, dir, pushdownCap = 0)
      .select($"new_id", $"old_id").as[(Long, Long)].collect().toSet
    assert(fb == got, "fallback join diverged from the pushed probe")
    // jaccard values survive the round trip at the declared rounding
    val j = Dedup.incrementalMinhashPairs(spark, tmp, dir)
      .select($"jaccard").as[Double].collect()
    assert(j.forall(_ >= Dedup.JaccardThreshold))

    // a batch with nothing shingled (< 3 tokens per doc) probes empty
    val tmp2 = java.nio.file.Files.createTempDirectory("incr2").toString
    Seq((100L, "one two"), (5L, words("eps", 22)))
      .toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"),
        lit("spec").as("source"), length($"text").cast("long").as("n_chars"))
      .write.parquet(s"$tmp2/documents.parquet")
    val dir2 = s"$tmp2/index"
    Dedup.writeMinhashIndex(spark, tmp2, dir2,
      col("doc_id") % Dedup.IncrementalMod =!= 0)
    assert(Dedup.incrementalMinhashPairs(spark, tmp2, dir2).count() == 0)
  }

  test("incremental embedding dedup: new-vs-old pairs only, pushdown and fallback agree") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("eincr").toString
    def unit(axis: Int): Array[Float] = {
      val v = new Array[Float](64); v(axis) = 1.0f; v
    }
    def mix(a: Int, b: Int, ca: Float, cb: Float): Array[Float] = {
      val v = new Array[Float](64); v(a) = ca; v(b) = cb; v
    }
    val vecs = Seq(
      (3L, unit(1)),                       // old
      (10L, mix(1, 2, 0.995f, 0.0998f)),   // NEW near-dup of 3 → pair
      (11L, unit(9)), (12L, unit(9)),      // old×old dup, excluded
      (20L, unit(7)), (30L, mix(7, 8, 0.995f, 0.0998f)), // NEW×NEW, excluded
      (40L, unit(5))                       // NEW, unrelated
    )
    vecs.toDF("vec_id", "embedding").write.parquet(s"$tmp/embeddings.parquet")
    val dir = s"$tmp/index"
    Dedup.writeEmbIncrIndex(spark, tmp, dir)
    val got = Dedup.incrementalEmbeddingPairs(spark, tmp, dir)
      .select($"new_id", $"old_id").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 3L)),
      s"expected exactly the engineered new-vs-old pair, got $got")
    val fb = Dedup.incrementalEmbeddingPairs(spark, tmp, dir, pushdownCap = 0)
      .select($"new_id", $"old_id").as[(Long, Long)].collect().toSet
    assert(fb == got, "fallback join diverged from the pushed probe")
    val cos = Dedup.incrementalEmbeddingPairs(spark, tmp, dir)
      .select($"cos_sim").as[Double].collect()
    assert(cos.forall(_ >= Dedup.CosineThreshold))
  }

  test("hybrid RRF: both-legs neighbor outranks single-leg; fusion arithmetic exact") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("rrf").toString
    // doc 1 matches query doc 0 in BOTH legs (shared shingles + close
    // vector); doc 2 only in the dense leg (no token overlap)
    Seq((0L, "a b c d"), (1L, "a b c d"), (2L, "x y z w"))
      .toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"),
        lit("spec").as("source"), length($"text").cast("long").as("n_chars"))
      .write.parquet(s"$tmp/documents.parquet")
    def mix(ca: Float, cb: Float): Array[Float] = {
      val v = new Array[Float](64); v(1) = ca; v(2) = cb; v
    }
    Seq((0L, mix(1.0f, 0.0f)), (1L, mix(0.99f, 0.141f)),
        (2L, mix(0.8f, 0.6f)))
      .toDF("vec_id", "embedding").write.parquet(s"$tmp/embeddings.parquet")
    val got = Similarity.hybridRrf(spark, tmp)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    def rrf(rs: Int*): Double = {
      val s = rs.map(r => 1.0 / (Similarity.RrfK0 + r)).sum
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // doc 1: dense rank 1 AND lexical rank 1; doc 2: dense rank 2 only
    assert(got((0L, 1L)) == ((rrf(1, 1), 1)), s"got ${got.get((0L, 1L))}")
    assert(got((0L, 2L)) == ((rrf(2), 2)), s"got ${got.get((0L, 2L))}")
  }

  test("sim_hybrid_serve ≡ sim_hybrid_stored restricted to the serve slice") {
    import spark.implicits._
    // per-query independence is the serve oracle's whole argument:
    // restricting the query set must commute with both legs and the
    // fusion, so the serve slice's rows are exactly the stored
    // query's rows for those q_ids — pinned here on the real corpus
    val stored = graft.SparkEntry.queries("sim_hybrid_stored")(spark, sf)
      .filter($"q_id" % Similarity.HybridServeMod === 0)
      .as[(Long, Long, Double, Int)].collect().toSet
    val serve = graft.SparkEntry.queries("sim_hybrid_serve")(spark, sf)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(serve.nonEmpty, "serve slice must be non-empty at sf0.001")
    assert(serve == stored, s"serve diverged: ${serve.diff(stored).take(3)}")
    // the slice is strict: a multiple of the query stride, so every
    // served query is a declared query — and not all of them
    assert(Similarity.HybridServeMod % Similarity.QueryStride == 0)
  }

  test("pair-relation takedown: deleting a bridge doc splits its cluster; compact is invisible") {
    import spark.implicits._
    def words(p: String, n: Int): String =
      (0 until n).map(i => s"$p$i").mkString(" ")
    // doc 2 bridges: it contains doc 1 (A+C) and doc 3 (C+B) as
    // spans, so pairs (1,2) and (2,3) clear the 0.6 threshold while
    // (1,3) — sharing only the C interior — does not
    val a = words("aa", 30); val c = words("cc", 50); val b = words("bb", 30)
    val tmp = java.nio.file.Files.createTempDirectory("pairdel").toString
    Seq((1L, s"$a $c"), (2L, s"$a $c $b"), (3L, s"$c $b"))
      .toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"),
        lit("spec").as("source"), length($"text").cast("long").as("n_chars"))
      .write.parquet(s"$tmp/documents.parquet")
    val dir = s"$tmp/pairs"
    Dedup.writeJaccardPairs(spark, tmp, dir)
    def thresholded(): Set[(Long, Long)] =
      Dedup.readJaccardPairs(spark, dir)
        .filter(round($"jaccard", 6) >= Dedup.JaccardThreshold)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // the fixture is what the test needs it to be — fail loudly if not
    assert(thresholded() == Set((1L, 2L), (2L, 3L)),
      s"bridge fixture drifted: ${thresholded()}")
    val before = Dedup.clusterStored(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(before == Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      s"bridge must co-cluster all three: $before")
    // takedown the bridge: both its pairs die, 1 and 3 fall apart
    Dedup.deleteFromPairsDir(spark, dir, Seq(2L).toDF("doc_id"))
    assert(Dedup.clusterStored(spark, dir).count() == 0,
      "deleting the bridge must dissolve the cluster")
    assert(thresholded().isEmpty, "no pair may survive a deleted endpoint")
    // compaction: same answers, tombstoned pairs physically gone
    Dedup.compactPairsDir(spark, dir)
    assert(Dedup.clusterStored(spark, dir).count() == 0)
    assert(spark.read.parquet(dir).filter($"id_a" === 2L || $"id_b" === 2L)
      .count() == 0, "purged pairs must be physically gone")
    assert(!new java.io.File(s"$dir/_graft_doc_tombstones").exists())
  }

  test("compactPairsDir infers the score column from the footers (cos_sim layouts survive)") {
    import spark.implicits._
    // the destructive rewrite must read the layout's OWN score column:
    // a wrong name under an explicit schema reads as null and the swap
    // would erase every score permanently
    val sfDir = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("embcompact").toString
    Dedup.writeEmbPairs(spark, sfDir, dir)
    val before = Dedup.readEmbPairs(spark, dir)
      .select($"id_a", $"id_b", $"cos_sim").as[(Long, Long, Double)]
      .collect().toSet
    assert(before.nonEmpty, "embedding pair fixture empty — vacuous")
    val anyId = before.head._1
    Dedup.deleteFromPairsDir(spark, dir, Seq(anyId).toDF("doc_id"))
    Dedup.compactPairsDir(spark, dir)
    val after = Dedup.readEmbPairs(spark, dir)
      .select($"id_a", $"id_b", $"cos_sim").as[(Long, Long, Double)]
      .collect().toSet
    assert(after == before.filter(p => p._1 != anyId && p._2 != anyId),
      "compaction must preserve cos_sim values while purging the endpoint")
    assert(after.forall(p => !p._3.isNaN), "scores must survive the rewrite")
    // a non-pair directory fails loudly instead of rewriting garbage
    val bogus = java.nio.file.Files.createTempDirectory("notpairs").toString
    Seq((1L, "x")).toDF("doc_id", "text").write.parquet(s"$bogus/p")
    val e = intercept[RuntimeException] {
      Dedup.compactPairsDir(spark, s"$bogus/p")
    }
    assert(e.getMessage.contains("not a pair layout"), e.getMessage)
  }

  test("rolling ingest: appended batches become historical for the next probe") {
    import spark.implicits._
    // --- minhash side ---
    val tmp = java.nio.file.Files.createTempDirectory("roll").toString
    def words(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val base = words("alpha", 21)
    // doc 1: day-0 historical; doc 10: day-1 batch, near-dup of 1;
    // doc 20: day-2 batch, near-dup of 10 (and of 1)
    Seq(
      (1L, s"$base tail0"),
      (10L, s"$base tail1"),
      (20L, s"$base tail2")
    ).toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"),
        lit("spec").as("source"), length($"text").cast("long").as("n_chars"))
      .write.parquet(s"$tmp/documents.parquet")
    val mhDir = s"$tmp/mh"
    Dedup.writeMinhashIndex(spark, tmp, mhDir, col("doc_id") === 1L)
    val day1 = Dedup.incrementalMinhashPairs(spark, tmp, mhDir,
        batchPred = col("doc_id") === 10L)
      .select($"new_id", $"old_id").as[(Long, Long)].collect().toSet
    assert(day1 == Set((10L, 1L)), s"day1 $day1")
    // append day-1's batch; day-2 must now pair with BOTH 1 and 10
    Dedup.appendToMinhashIndex(spark, tmp, mhDir, col("doc_id") === 10L)
    val day2 = Dedup.incrementalMinhashPairs(spark, tmp, mhDir,
        batchPred = col("doc_id") === 20L)
      .select($"new_id", $"old_id").as[(Long, Long)].collect().toSet
    assert(day2 == Set((20L, 1L), (20L, 10L)), s"day2 $day2")

    // --- embedding side: the existing appendToLshIndex composes,
    // because writeEmbIncrIndex stores the stored-LSH layout ---
    val etmp = java.nio.file.Files.createTempDirectory("eroll").toString
    def mix(a: Int, b: Int, ca: Float, cb: Float): Array[Float] = {
      val v = new Array[Float](64); v(a) = ca; v(b) = cb; v
    }
    Seq(
      (1L, mix(1, 2, 1.0f, 0.0f)),
      (10L, mix(1, 2, 0.995f, 0.0998f)),
      (20L, mix(1, 2, 0.98f, 0.199f))
    ).toDF("vec_id", "embedding").write.parquet(s"$etmp/embeddings.parquet")
    val eDir = s"$etmp/lsh"
    Dedup.writeEmbIncrIndex(spark, etmp, eDir, histPred = col("vec_id") === 1L)
    val e1 = Dedup.incrementalEmbeddingPairs(spark, etmp, eDir,
        batchPred = col("vec_id") === 10L)
      .select($"new_id", $"old_id").as[(Long, Long)].collect().toSet
    assert(e1 == Set((10L, 1L)), s"emb day1 $e1")
    Similarity.appendToLshIndex(spark, eDir,
      spark.read.parquet(s"$etmp/embeddings.parquet")
        .filter(col("vec_id") === 10L))
    val e2 = Dedup.incrementalEmbeddingPairs(spark, etmp, eDir,
        batchPred = col("vec_id") === 20L)
      .select($"new_id", $"old_id").as[(Long, Long)].collect().toSet
    assert(e2 == Set((20L, 1L), (20L, 10L)), s"emb day2 $e2")
  }
}
