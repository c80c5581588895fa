package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Static vector kernels callable from generated Java: the loops read
  * `ArrayData` directly (an offset walk over the unsafe buffer for
  * parquet/UnsafeRow-backed arrays), so the hot pair-scoring path has
  * ZERO per-row deserialization — the Scala-UDF form first copies each
  * array into a `Seq[Float]` through the encoder. Accumulation stays
  * left-to-right double so results are bit-equal to the UDF kernels
  * and the DuckDB oracle's `list_sum(list_transform(...))`.
  */
object VectorKernels {
  def dot(a: ArrayData, b: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.numElements(), b.numElements())
    while (i < n) {
      // a NULL element would silently read as 0.0 and skew the score —
      // refuse, like packed_pairs/minhash_sig (cheap predictable branch)
      require(!a.isNullAt(i) && !b.isNullAt(i),
        "vector_dot: NULL element in input array")
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1
    }
    acc
  }
  def norm(a: ArrayData): Double = math.sqrt(dot(a, a))

  /** ARRAY<DOUBLE> variants (the trained-PCA projection index): same
    * left-to-right accumulation, `getDouble` walk.
    */
  def dotD(a: ArrayData, b: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.numElements(), b.numElements())
    while (i < n) {
      require(!a.isNullAt(i) && !b.isNullAt(i),
        "vector_dot: NULL element in input array")
      acc += a.getDouble(i) * b.getDouble(i); i += 1
    }
    acc
  }
  def normD(a: ArrayData): Double = math.sqrt(dotD(a, a))
}

/** vector_dot(array<float>, array<float>) → double, whole-stage
  * codegen via [[VectorKernels]]. SURVEY §4.2 phase-2 promotion for
  * the similarity family's hot path.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isDouble: Boolean = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  // element types only — ArrayType equality would also compare
  // containsNull, rejecting e.g. an array literal against a nullable
  // parquet column. Ignoring containsNull is safe because the kernels
  // reject NULL elements loudly at runtime (isNullAt → throw), so a
  // nullable-typed column with no actual nulls works and one WITH
  // nulls fails with a real error instead of a wrong dot product
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(et1, _), ArrayType(et2, _))
          if et1 == et2 && (et1 == FloatType || et1 == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vector_dot requires matching (ARRAY<FLOAT|DOUBLE>, same), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (isDouble)
      VectorKernels.dotD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isDouble) "dotD" else "dot"
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VectorKernels.$fn($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** ngram_hashes(text, n) → array<bigint>: distinct word n-gram FNV-1a
  * hashes in one tokenize pass (delegates to the shared
  * `Dedup.distinctNgrams` + `fnv1a`, so shingle/minhash/LSH and
  * decontamination stay hash-identical). Native so the shingle-heavy
  * dedup scans skip the Scala-UDF UTF8String→String→Seq round trip on
  * the result side — the output lands directly in an ArrayData.
  */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes requires STRING, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = s"ngram_hashes_$n"

  override protected def nullSafeEval(text: Any): Any =
    NgramKernels.hashes(text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NgramKernels.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

/** Static kernel for [[NgramHashes]], callable from generated Java. */
object NgramKernels {
  def hashes(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val grams = graft.operators.Dedup.distinctNgrams(
      if (text == null) "" else text.toString, n)
    val out = new Array[Long](grams.length)
    var i = 0
    grams.foreach { g => out(i) = graft.operators.Dedup.fnv1a(g); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Positional variant: slot i = hash of the n-gram starting at token
    * i, duplicates kept — the duplicated-span stream.
    */
  def posHashes(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val grams = graft.operators.Dedup.positionalNgrams(
      if (text == null) "" else text.toString, n)
    val out = new Array[Long](grams.length)
    var i = 0
    grams.foreach { g => out(i) = graft.operators.Dedup.fnv1a(g); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** ngram_hashes_pos(text) → array<bigint>: positional, in-order,
  * non-distinct n-gram hashes — slot i is the n-gram starting at token
  * position i (0-based). Same tokenization and FNV-1a hash as
  * [[NgramHashes]]; the position-preserving stream the duplicated-span
  * dedup (dedup_substring) groups into maximal runs.
  */
case class NgramHashesPos(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes_pos requires STRING, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = s"ngram_hashes_pos_$n"

  override protected def nullSafeEval(text: Any): Any =
    NgramKernels.posHashes(text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NgramKernels.posHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramHashesPos =
    copy(child = newChild)
}

/** minhash_sig(array<bigint>) → array<bigint>: the 64-seed
  * min-of-avalanche MinHash signature in one primitive pass over the
  * shingle-hash array — the banding path's hot kernel, promoted from a
  * Scala UDF so the per-document `Seq[Long]` encoder round trip
  * disappears (the signature is computed straight off `ArrayData` and
  * lands in one). NOT null-propagating: a null/empty hash array yields
  * the all-Long.MaxValue sentinel signature, matching the UDF it
  * replaces (null text → sentinel sig, which can only band-collide
  * with other empty docs).
  */
case class MinhashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<BIGINT>, got ${other.sql}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sig"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    MinhashKernels.signature(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val javaType =
      org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.javaType(dataType)
    ev.copy(
      code = c.code + code"""
        $javaType ${ev.value} = graft.plans.MinhashKernels.signature(
          ${c.isNull} ? null : ${c.value});""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

/** packed_pairs(array<bigint>) → array<bigint>: all ordered (a<b)
  * pairs of the distinct ids in one inverted-index bucket, packed into
  * one long (a<<32 | b) — the pair-emission kernel of the exact-Jaccard
  * path, promoted from a Scala UDF: the for-comprehension built boxed
  * Seq[Long]s per bucket; this sorts/dedups a primitive array in place
  * and writes pairs straight into the output buffer.
  */
case class PackedPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"packed_pairs requires ARRAY<BIGINT>, got ${other.sql}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "packed_pairs"

  override protected def nullSafeEval(ids: Any): Any =
    PairKernels.packedPairs(ids.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PairKernels.packedPairs($c)")

  override protected def withNewChildInternal(newChild: Expression): PackedPairs =
    copy(child = newChild)
}

/** Static kernel for [[PackedPairs]], callable from generated Java. */
object PairKernels {
  def packedPairs(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    val arr = new Array[Long](n)
    var i = 0
    while (i < n) {
      // a NULL element would silently read as 0 via getLong, packing a
      // phantom doc 0 into every pair — corruption, so refuse it
      require(!ids.isNullAt(i), "packed_pairs: NULL id in bucket array")
      arr(i) = ids.getLong(i); i += 1
    }
    java.util.Arrays.sort(arr)
    var m = 0 // distinct in place (sorted)
    i = 0
    while (i < n) {
      if (m == 0 || arr(m - 1) != arr(i)) { arr(m) = arr(i); m += 1 }
      i += 1
    }
    // doc ids are table ordinals, far below 2³¹ at any scale factor;
    // fail loudly if a schema/scale change ever violates the packing
    require(m == 0 || (arr(0) >= 0 && arr(m - 1) < (1L << 31)),
      s"doc_id out of packed-pair range [0, 2^31): ${arr(0)}..${arr(m - 1)}")
    // m(m-1)/2 must stay an Int: callers bound buckets by MaxShingleDf
    // (1000), but this is a registered SQL function — guard the math
    // rather than overflow into a negative allocation
    require(m <= 65536,
      s"packed_pairs: bucket of $m distinct ids exceeds the 65536 cap " +
        "(pair emission is quadratic — apply a DF cutoff upstream)")
    val out = new Array[Long](m * (m - 1) / 2)
    var k = 0
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m) { out(k) = (arr(i) << 32) | arr(j); k += 1; j += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Static kernel for [[MinhashSig]], callable from generated Java.
  * Same avalanche (splitmix-style) per-seed rehash as the UDF it
  * replaced — signatures are bit-identical.
  */
object MinhashKernels {
  def signature(hs: ArrayData): ArrayData = {
    val m = graft.operators.Dedup.NumHashes
    val sig = Array.fill(m)(Long.MaxValue)
    if (hs != null) {
      val n = hs.numElements()
      var j = 0
      while (j < n) {
        // a NULL element would read as hash 0 and fold a phantom
        // shingle into the signature — refuse, like packed_pairs
        require(!hs.isNullAt(j), "minhash_sig: NULL hash in input array")
        val h = hs.getLong(j)
        var k = 0
        while (k < m) {
          var x = h ^ (0x9e3779b97f4a7c15L * (k + 1))
          x ^= (x >>> 33); x *= 0xff51afd7ed558ccdL; x ^= (x >>> 33)
          if (x < sig(k)) sig(k) = x
          k += 1
        }
        j += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }
}

/** vector_norm(array<float>) → double (√Σa²), codegen'd. */
case class VectorNorm(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_norm requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }
  private def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_norm"

  override protected def nullSafeEval(a: Any): Any =
    if (isDouble) VectorKernels.normD(a.asInstanceOf[ArrayData])
    else VectorKernels.norm(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isDouble) "normD" else "norm"
    defineCodeGen(ctx, ev, a => s"graft.plans.VectorKernels.$fn($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): VectorNorm =
    copy(child = newChild)
}

/** lsh_buckets(array<float>, numPlanes) → array<bigint>: the
  * multi-table random-hyperplane signature as packed
  * (table << 32 | bucket) longs — one kernel pass over all
  * NumTables × numPlanes sign-bit dots straight off `ArrayData`, the
  * last ANN kernel still paying a per-row Seq[Float] → Seq[(Int,Int)]
  * UDF round trip. `numPlanes` is the occupancy-adaptive plane count
  * ([[graft.operators.Similarity.adaptivePlanes]]), baked into the
  * plan as a generated-code literal: each table uses the leading
  * `numPlanes` planes of the seeded stack. Identical double
  * accumulation (emb[i].toDouble × plane[i], left-to-right) to the
  * UDF it replaces, so buckets — and the lsh_build / sim_ann_lsh
  * oracles that recompute them from the plane literals — are
  * bit-identical. Empty input: zero dots, every bit set (dot >= 0),
  * matching the kernel contract the oracle's COALESCE pins.
  */
case class LshBuckets(child: Expression, numPlanes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets requires ARRAY<FLOAT>, got ${other.sql}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override protected def nullSafeEval(emb: Any): Any =
    LshKernels.buckets(emb.asInstanceOf[ArrayData], numPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.LshKernels.buckets($c, $numPlanes)")

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

/** Static kernel for [[LshBuckets]], callable from generated Java. */
object LshKernels {
  def buckets(emb: ArrayData, numPlanes: Int): ArrayData = {
    val ps = graft.operators.Similarity.planes
    val m = if (emb == null) 0 else emb.numElements()
    val out = new Array[Long](ps.length)
    var t = 0
    while (t < ps.length) {
      val tp = ps(t)
      var bucket = 0
      var p = 0
      val pn = math.min(numPlanes, tp.length)
      while (p < pn) {
        val w = tp(p)
        var dot = 0.0
        var i = 0
        val n = math.min(m, w.length)
        while (i < n) { dot += emb.getFloat(i).toDouble * w(i); i += 1 }
        if (dot >= 0) bucket |= (1 << p)
        p += 1
      }
      out(t) = (t.toLong << 32) | bucket.toLong
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** pq_adc(query array<float>, codes array<int>) → double: the PQ
  * asymmetric-distance score against the TRAINED codebooks, as a
  * native codegen expression — the last pair-scoring kernel still
  * paying a per-row Seq[Float]/Seq[Int] encoder round trip (at 10×
  * bench scale the IVF-PQ probe scores ~10⁶ candidate rows; the
  * boxing, not the arithmetic, dominated). The codebook tensor is a
  * plan constant shipped once per plan via `addReferenceObj` (it is
  * trained state, so it cannot be a compile-time literal like the LSH
  * planes — the sim_ann_pq/sim_ann_ivfpq oracles already render it at
  * Verify time). Accumulation is per-subspace partial dots then a
  * cross-subspace sum, bit-identical to the UDF it replaces and to the
  * oracle's nested list_sum; query elements past the vector's length
  * read as 0.0 (the short-vector padding contract).
  */
case class PqAdc(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Float]]]) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(org.apache.spark.sql.types.IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (ARRAY<FLOAT>, ARRAY<INT>), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(q: Any, codes: Any): Any =
    PqKernels.adc(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    defineCodeGen(ctx, ev, (q, c) => s"graft.plans.PqKernels.adc($q, $c, $cb)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

/** Static kernel for [[PqAdc]], callable from generated Java. */
object PqKernels {
  def adc(q: ArrayData, codes: ArrayData,
      cb: Array[Array[Array[Float]]]): Double = {
    val m = q.numElements()
    require(codes.numElements() >= cb.length,
      "pq_adc: codes array shorter than the codebook's subspace count")
    var total = 0.0
    var off = 0
    var sub = 0
    while (sub < cb.length) {
      require(!codes.isNullAt(sub), "pq_adc: NULL code in codes array")
      val cw = cb(sub)(codes.getInt(sub))
      var partial = 0.0
      var i = 0
      while (i < cw.length) {
        if (off + i < m) {
          require(!q.isNullAt(off + i), "pq_adc: NULL element in query vector")
          partial += q.getFloat(off + i).toDouble * cw(i).toDouble
        }
        i += 1
      }
      total += partial
      off += cw.length
      sub += 1
    }
    total
  }
}

/** pca_project(emb array<float>) → array<double>: projection onto the
  * TRAINED PCA loadings (centered dot per component), as a native
  * codegen expression — same plan-constant treatment as [[PqAdc]]
  * (trained state via `addReferenceObj`, never a compile-time
  * literal). Replaces the row-local Scala UDF on the emb_pca /
  * sim_ann_pca index-build path: the 64×16 arithmetic is cheap, the
  * per-row Seq[Float] → Seq[Double] encoder round trip was the cost.
  * Accumulation is per-component left-to-right over
  * (emb[i] − mean[i]) · w[i] with i < min(len, dim), bit-identical to
  * the UDF and the oracle's list_sum restatement.
  */
case class PcaProject(child: Expression, mean: Array[Double],
    comps: Array[Array[Double]], dim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pca_project requires ARRAY<FLOAT>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pca_project"

  override protected def nullSafeEval(emb: Any): Any =
    PcaKernels.project(emb.asInstanceOf[ArrayData], mean, comps, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val meanRef = ctx.addReferenceObj("pcaMean", mean, "double[]")
    val compsRef = ctx.addReferenceObj("pcaComps", comps, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.PcaKernels.project($c, $meanRef, $compsRef, $dim)")
  }

  override protected def withNewChildInternal(newChild: Expression): PcaProject =
    copy(child = newChild)
}

/** Static kernel for [[PcaProject]], callable from generated Java. */
object PcaKernels {
  def project(emb: ArrayData, mean: Array[Double],
      comps: Array[Array[Double]], dim: Int): ArrayData = {
    val n = math.min(if (emb == null) 0 else emb.numElements(), dim)
    val out = new Array[Double](comps.length)
    var c = 0
    while (c < comps.length) {
      val w = comps(c)
      var acc = 0.0
      var i = 0
      while (i < n) {
        require(!emb.isNullAt(i), "pca_project: NULL element in input array")
        acc += (emb.getFloat(i).toDouble - mean(i)) * w(i)
        i += 1
      }
      out(c) = acc
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** nearest_cells(emb array<float>) → array<bigint>: the `n` nearest
  * IVF centroid cells by cosine (ties → lowest centroid id), as a
  * native codegen expression over the broadcast-as-plan-constant
  * centroid matrix — the assignment kernel of ivf_build (n·k dot
  * products over the whole corpus, the heaviest build line at 10×
  * bench scale) and of every IVF probe's query side, previously a
  * Seq[Float] → Seq[Long] UDF round trip per row. Same arithmetic as
  * the UDF it replaces: left-to-right double dot against each
  * centroid, divided by the vector norm then the stored centroid norm
  * in that order, ranked by java.lang.Double total order descending
  * (the Scala 2.13 sortBy default) with the centroid-id tiebreak —
  * bit-identical cells, so the Verify-time centroid-literal oracles
  * are untouched.
  */
case class NearestCells(child: Expression,
    cents: Array[(Long, Array[Float], Double)], n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells requires ARRAY<FLOAT>, got ${other.sql}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override protected def nullSafeEval(emb: Any): Any =
    IvfKernels.nearestCells(emb.asInstanceOf[ArrayData], cents, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the tuple-array type has no stable Java source name — ship it as
    // Object and cast inside the Scala kernel
    val centsRef = ctx.addReferenceObj("ivfCents", cents, "java.lang.Object")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.IvfKernels.nearestCells($c, $centsRef, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

/** Static kernel for [[NearestCells]], callable from generated Java. */
object IvfKernels {
  def nearestCells(emb: ArrayData, centsObj: Object, n: Int): ArrayData = {
    val cents = centsObj.asInstanceOf[Array[(Long, Array[Float], Double)]]
    val m = emb.numElements()
    var acc = 0.0
    var i = 0
    while (i < m) {
      require(!emb.isNullAt(i), "nearest_cells: NULL element in input array")
      val x = emb.getFloat(i).toDouble
      acc += x * x
      i += 1
    }
    val nv = math.sqrt(acc)
    val ids = new Array[Long](cents.length)
    val sims = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val (cid, cv, cn) = cents(c)
      var dot = 0.0
      var j = 0
      val lim = math.min(m, cv.length)
      while (j < lim) { dot += emb.getFloat(j).toDouble * cv(j).toDouble; j += 1 }
      ids(c) = cid
      sims(c) = dot / nv / cn
      c += 1
    }
    // rank (sim desc, cid asc) under java.lang.Double total order —
    // the exact order Scala's sortBy((-sim, cid)) produced
    val idx = Array.range(0, cents.length)
    val boxed = idx.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, new java.util.Comparator[Integer] {
      def compare(a: Integer, b: Integer): Int = {
        // ascending on the NEGATED sim, not descending on sim: the two
        // differ for NaN (total order puts NaN greatest, so a NaN sim
        // must sort LAST here, exactly as sortBy(-sim) did)
        val s = java.lang.Double.compare(-sims(a.intValue), -sims(b.intValue))
        if (s != 0) s else java.lang.Long.compare(ids(a.intValue), ids(b.intValue))
      }
    })
    val take = math.min(n, cents.length)
    val out = new Array[Long](take)
    var o = 0
    while (o < take) { out(o) = ids(boxed(o).intValue); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
