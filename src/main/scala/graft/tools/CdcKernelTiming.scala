// Same-process A/B for the CDC chunker's boundary scan: the shipped
// per-position dependent-chain kernel vs the offset-outer restructure
// that LOOKED like a latency win and measured within noise of it
// across alternating warm rounds (0.6-1.15x — the r19 rejected lever,
// kept here so the measurement is re-runnable).
// Also asserts the two produce IDENTICAL chunk sequences on every
// input (the hash is the declared semantics — only evaluation order
// may change).
//   sbt "runMain graft.tools.CdcKernelTiming [nDocs] [docLen]"
package graft.tools

object CdcKernelTiming {
  // the rejected restructure: window offset outer, position inner
  private def chunksOffsetOuter(text: String): Seq[(Long, Int)] = {
    val W = graft.operators.Dedup.CdcWindow
    val D = graft.operators.Dedup.CdcDivisor
    val cps = text.codePoints().toArray
    val n = cps.length
    if (n == 0) return Seq.empty
    @inline def fnvRange(a: Int, b: Int): Long = {
      var h = 0xcbf29ce484222325L
      var i = a
      while (i < b) { h ^= cps(i); h *= 0x100000001b3L; i += 1 }
      h
    }
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    if (n >= W) {
      val h = new Array[Long](n + 1)
      java.util.Arrays.fill(h, W, n + 1, 0xcbf29ce484222325L)
      var j = 0
      while (j < W) {
        val off = W - j
        var p = W
        while (p <= n) { h(p) = (h(p) ^ cps(p - off)) * 0x100000001b3L; p += 1 }
        j += 1
      }
      var p = W
      while (p <= n) {
        if ((h(p) & (D - 1)) == 0L) cuts += p
        p += 1
      }
    }
    if (cuts.isEmpty || cuts.last != n) cuts += n
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Int)](cuts.length)
    var a = 0
    cuts.foreach { b => out += ((fnvRange(a, b), b - a)); a = b }
    out.toSeq
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 2000
    val docLen = if (args.length > 1) args(1).toInt else 2000
    val rnd = new scala.util.Random(7)
    val docs = Array.fill(nDocs)(
      Array.fill(docLen)(('a' + rnd.nextInt(27)).toChar match {
        case c if c > 'z' => ' '
        case c => c
      }).mkString)

    // equivalence on every doc first (plus unicode/short edge cases)
    val edge = Seq("", "ab", "a" * 15, "a" * 16, "héllo wörld " * 40,
      "😀 emoji pad " * 50)
    (docs.take(50) ++ edge).foreach { d =>
      require(graft.operators.Dedup.cdcChunks(d) == chunksOffsetOuter(d),
        s"kernel divergence on ${d.take(40)}")
    }
    println("[cdc-kernel] equivalence: ok (50 random + edge cases)")

    def bench(label: String)(f: String => Seq[(Long, Int)]): Double = {
      var sink = 0L
      // warm up JIT
      docs.take(200).foreach(d => sink += f(d).length)
      System.gc()
      val t0 = System.nanoTime()
      docs.foreach(d => sink += f(d).length)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[cdc-kernel] $label: $secs%.3f s ($sink chunks)")
      secs
    }
    // alternate the two kernels so neither owns a warmer JIT/CPU phase
    for (round <- 1 to 3) {
      val a = bench(s"dependent-chain (shipped), round $round")(
        graft.operators.Dedup.cdcChunks)
      val b = bench(s"offset-outer (rejected), round $round")(chunksOffsetOuter)
      println(f"[cdc-kernel] round $round shipped/rejected: ${b / a}%.2fx")
    }
  }
}
