package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Invariants the DuckDB oracle can't state for the BPE family:
  * hand-checked training on pinned corpora (merge order, counts,
  * tie-breaks, stopping), the encode≡training-representation agreement
  * that justifies restating encode as the oracle's recursive argmin
  * CTE, and the encode kernel's structural properties (lossless
  * concatenation, code-point splitting, long-word bypass).
  */
class BpeSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Write a tiny documents.parquet under a temp sf-dir so trainBpe
    * sees a hand-pinned corpus through the normal Tables path.
    */
  private def corpusDir(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpecorpus").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("training learns merges in frequency order with exact weighted counts") {
    // words: ab ×3, abc ×2 → pairs (a,b):5, (b,c):2 → merge (a,b,5);
    // then reps [ab], [ab,c] → (ab,c):2 → merge (ab,c,2); then no
    // multi-symbol words remain → stop
    val d = corpusDir(Seq("ab ab ab", "abc abc"))
    val m = Bpe.trainBpe(spark, d)
    assert(m.merges.toSeq == Seq(("a", "b", 5L), ("ab", "c", 2L)))
  }

  test("equal-count merges tie-break to the lexicographically smallest pair") {
    val d = corpusDir(Seq("ab cd ab cd"))
    val m = Bpe.trainBpe(spark, d)
    assert(m.merges.toSeq == Seq(("a", "b", 2L), ("c", "d", 2L)))
  }

  test("adjacent-pair counts are the classical overlapping count; repeats merge left-to-right") {
    // "aaa" ×2: (a,a) counts twice per word → 4; after merging LTR
    // non-overlapping each word is [aa, a] → (aa,a):2 → merge; then
    // single symbols → stop
    val d = corpusDir(Seq("aaa aaa"))
    val m = Bpe.trainBpe(spark, d)
    assert(m.merges.toSeq == Seq(("a", "a", 4L), ("aa", "a", 2L)))
    // encode agrees with the training representation
    assert(Bpe.encodeWord("aaa", m.ranks).toSeq == Seq("aaa"))
    // [a,a,a,a]: merge at 0 → [aa,a,a]; the rank-0 (a,a) at index 1
    // beats the rank-1 (aa,a) at index 0 → [aa,aa] — the same result
    // training's left-to-right merge-all produces
    assert(Bpe.encodeWord("aaaa", m.ranks).toSeq == Seq("aa", "aa"))
  }

  test("pairs below the min frequency are not merged; single-char words train nothing") {
    val d = corpusDir(Seq("x y z"))
    val m = Bpe.trainBpe(spark, d)
    assert(m.merges.isEmpty)
    // encode with an empty model = the code-point split
    assert(Bpe.encodeWord("xyz", m.ranks).toSeq == Seq("x", "y", "z"))
    // the declared build query emits an empty, correctly-typed frame
    val df = Bpe.queries("bpe_build")(spark, d)
    assert(df.count() == 0)
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq(("rank", "int"), ("lhs", "string"), ("rhs", "string"), ("freq", "bigint")))
  }

  test("encode of every trained word type equals the training loop's final symbols") {
    // the agreement that lets the oracle restate encode (global-argmin
    // one-merge-per-step) while training applies merges in rank order:
    // on the real corpus the two formulations coincide word-for-word
    val reps = Bpe.trainedReps(spark, sf)
    val m = Bpe.bpeModel(spark, sf)
    assert(reps.nonEmpty && m.merges.nonEmpty)
    reps.foreach { case (w, sym) =>
      assert(Bpe.encodeWord(w, m.ranks).toSeq == sym.toSeq,
        s"encode('$w') diverged from the training representation")
    }
  }

  test("encode is lossless, code-point-based, and bypasses long words") {
    val m = Bpe.bpeModel(spark, sf)
    // concatenating tokens reproduces the word, for ASCII and for
    // multi-byte/surrogate-pair content alike
    for (w <- Seq("hello", "héllo…", "日本語テスト", "a😀b", "x"))
      assert(Bpe.encodeWord(w, m.ranks).mkString == w)
    // surrogate pairs split as ONE symbol, not two UTF-16 halves
    assert(Bpe.codePoints("a😀b").toSeq == Seq("a", "😀", "b"))
    // 64 code points encodes; 65 bypasses as a single opaque token
    val at = "a" * Bpe.BpeMaxWordLen
    assert(Bpe.encodeWord(at, Map(("a", "a") -> 0)).forall(_.forall(_ == 'a')))
    assert(Bpe.encodeWord(at + "a", Map(("a", "a") -> 0)).toSeq == Seq(at + "a"))
  }

  test("txt_bpe_tokens: per-doc counts match a driver recompute; empty text counts zero") {
    import spark.implicits._
    val d = corpusDir(Seq("ab ab abc", "", "  ", "zzz ab"))
    val m = Bpe.bpeModel(spark, d)
    val got = Bpe.queries("txt_bpe_tokens")(spark, d)
      .as[(Long, Long, Long)].collect()
      .map { case (k, a, b) => (k, (a, b)) }.toMap
    val expect = Seq("ab ab abc", "", "  ", "zzz ab").zipWithIndex.map { case (t, i) =>
      val ws = t.split("\\s+").filter(_.nonEmpty)
      (i.toLong, (ws.length.toLong, ws.map(w => Bpe.encodeWord(w, m.ranks).length.toLong).sum))
    }.toMap
    assert(got == expect)
    assert(got(1L) == ((0L, 0L)) && got(2L) == ((0L, 0L)))
  }

  test("trainManifestBpe: identical shard membership to the declared manifest, BPE token mass") {
    import spark.implicits._
    // swapping the token counter re-weighs shards but never changes
    // WHICH docs are in them: n_docs and member_fp must be bit-equal
    // to pipe_train_manifest's, and the re-weighed token mass must
    // equal a driver recompute from txt_bpe_tokens over the curated set
    val declared = TextAnalysis.queries("pipe_train_manifest")(spark, sf)
      .as[(Int, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val bpe = TextAnalysis.trainManifestBpe(spark, sf)
      .as[(Int, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(bpe.keySet == declared.keySet)
    declared.foreach { case (shard, (_, nDocs, _, fp)) =>
      assert(bpe(shard)._2 == nDocs, s"shard $shard doc count changed")
      assert(bpe(shard)._4 == fp, s"shard $shard membership changed")
    }
    val curated = TextAnalysis.queries("pipe_curate")(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    val nbpe = Bpe.queries("txt_bpe_tokens")(spark, sf)
      .select($"doc_id", $"n_bpe").as[(Long, Long)].collect().toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def shardOf(id: Long): Int = Integer.parseInt(
      md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 1), 16)
    val expect = curated.groupBy(shardOf).map { case (sh, ids) =>
      sh -> ids.iterator.map(nbpe).sum
    }
    assert(bpe.view.mapValues(_._3).toMap == expect,
      "BPE token mass diverged from the driver recompute")
  }

  test("txtWindowsBpe: offsets, counts, and fingerprints match a driver recompute over the BPE stream") {
    import spark.implicits._
    val m = Bpe.bpeModel(spark, sf)
    val got = TextAnalysis.txtWindowsBpe(spark, sf)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(got.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    val (wT, wS) = (TextAnalysis.WinTokens, TextAnalysis.WinStride)
    val expect = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().flatMap {
        case (id, null) =>
          // the declared txt_windows null-doc contract: least/greatest
          // SKIP the null size, so a null-text doc emits one
          // (0, 0, WinTokens, md5("")) row on both engines
          Seq((id, 0L, 0L, wT.toLong,
            md.digest("".getBytes("UTF-8")).map("%02x".format(_)).mkString))
        case (id, text) =>
          val toks = text.split("\\s+").filter(_.nonEmpty)
            .flatMap(w => Bpe.encodeWord(w, m.ranks))
          val nWin = (math.max(toks.length - wT, 0) + wS - 1) / wS + 1
          (0 until nWin).map { w =>
            val n = math.min(wT, toks.length - w * wS)
            val fp = md.digest(toks.slice(w * wS, w * wS + n).mkString(" ")
              .getBytes("UTF-8")).map("%02x".format(_)).mkString
            (id, w.toLong, (w * wS).toLong, n.toLong, fp)
          }
      }.toSet
    assert(got == expect, "BPE windows diverged from the driver recompute")
  }

  test("bpe_vocab: contiguous ids, code-point-sorted alphabet first, merges in rank order") {
    import spark.implicits._
    val v = Bpe.queries("bpe_vocab")(spark, sf)
      .as[(Int, String, String)].collect().sortBy(_._1)
    val m = Bpe.bpeModel(spark, sf)
    assert(v.nonEmpty)
    assert(v.map(_._1).toSeq == v.indices.toSeq, "ids not contiguous from 0")
    val (alpha, merges) = v.partition(_._3 == "char")
    // alphabet block precedes the merge block and is cp-sorted, unique
    assert(alpha.map(_._1).toSeq == (0 until alpha.length))
    assert(alpha.map(_._2.codePointAt(0)).toSeq == alpha.map(_._2.codePointAt(0)).sorted.toSeq)
    assert(alpha.map(_._2).distinct.length == alpha.length)
    assert(alpha.forall(t => t._2.codePointCount(0, t._2.length) == 1),
      "alphabet entry with more than one code point")
    // merge ids are |A| + rank; token = lhs+rhs
    assert(merges.length == m.merges.length)
    merges.zipWithIndex.foreach { case ((id, tok, _), i) =>
      assert(id == alpha.length + i && tok == m.merges(i)._1 + m.merges(i)._2)
    }
    // every char of every trainable word is in the alphabet
    val chars = alpha.map(_._2).toSet
    Bpe.trainedReps(spark, sf).keys.foreach { w =>
      Bpe.codePoints(w).foreach(c => assert(chars.contains(c), s"'$c' of '$w' not in alphabet"))
    }
  }

  test("txt_bpe_encode: the tokenized corpus matches a driver recompute and reconstructs the text") {
    import spark.implicits._
    val m = Bpe.bpeModel(spark, sf)
    val vocab = Bpe.queries("bpe_vocab")(spark, sf)
      .as[(Int, String, String)].collect()
    val ids = scala.collection.mutable.HashMap[String, Int]()
    vocab.sortBy(_._1).foreach { case (id, tok, _) =>
      if (!ids.contains(tok)) ids(tok) = id
    }
    val got = Bpe.queries("txt_bpe_encode")(spark, sf)
      .as[(Long, Long, String, Int)].collect()
    assert(got.nonEmpty)
    val byDoc = got.groupBy(_._1)
    graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().foreach {
        case (id, null) => assert(!byDoc.contains(id))
        case (id, text) =>
          val words = text.split("\\s+").filter(_.nonEmpty)
          val stream = words.flatMap(w => Bpe.encodeWord(w, m.ranks))
          val rows = byDoc.getOrElse(id, Array.empty).sortBy(_._2)
          assert(rows.map(_._2).toSeq == stream.indices.map(_.toLong).toSeq,
            s"doc $id positions not contiguous")
          assert(rows.map(_._3).toSeq == stream.toSeq, s"doc $id token stream diverged")
          rows.foreach { case (_, _, tok, tid) =>
            assert(tid == ids.getOrElse(tok, -1), s"doc $id token '$tok' id $tid")
          }
          // lossless: concatenating the stream reproduces the words
          assert(rows.map(_._3).mkString == words.mkString)
      }
  }

  test("a stored model tokenizes a DIFFERENT corpus with frozen ids") {
    import spark.implicits._
    // the actual cross-corpus deployment: train on corpus A, write the
    // artifact, tokenize corpus B with A's merges and A's ids — B's
    // novel symbols are OOV (-1), never silently assigned new ids
    val trainDir = corpusDir(Seq("ab ab ab", "abc abc"))
    val dir = java.nio.file.Files.createTempDirectory("bpecross").toString
    Bpe.writeBpeModel(spark, trainDir, dir)
    val evalDir = corpusDir(Seq("ab abc zq"))
    val got = Bpe.bpeEncodeStored(spark, evalDir, dir)
      .as[(Long, Long, String, Int)].collect().sortBy(r => (r._1, r._2))
    // trained vocab: alphabet a,b,c (ids 0,1,2) + merges ab(3), abc(4)
    // "ab" -> [ab](3); "abc" -> [abc](4); "zq" -> [z,q] both OOV
    assert(got.map(t => (t._3, t._4)).toSeq ==
      Seq(("ab", 3), ("abc", 4), ("z", -1), ("q", -1)))
  }

  test("encode-kernel laws on generated Unicode words: lossless, bounded, deterministic") {
    // a deterministic-seeded sweep over the Unicode space the fixtures
    // can't enumerate: surrogate pairs, combining marks, ZWJ
    // sequences, RTL, control chars — for ANY word and ANY merge
    // table, encode must concatenate back to the word, never emit an
    // empty token, and respect the bypass boundary
    import org.scalacheck.Gen
    val cpGen: Gen[String] = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      Gen.oneOf("é", "ß", "ñ", "Σ", "ω", "д").map(identity),
      Gen.oneOf("日", "本", "語", "中").map(identity),
      Gen.oneOf("😀", "🎉", "𝕏").map(identity),           // surrogate pairs
      Gen.oneOf("́", "̈").map(identity),          // combining marks
      Gen.oneOf("‍", "א", "ا").map(identity) // ZWJ, RTL
    )
    val wordGen: Gen[String] = for {
      n <- Gen.choose(1, 80) // crosses the BpeMaxWordLen=64 boundary
      cps <- Gen.listOfN(n, cpGen)
    } yield cps.mkString
    val m = Bpe.bpeModel(spark, sf)
    var seed = org.scalacheck.rng.Seed(13L)
    (0 until 500).foreach { i =>
      wordGen.apply(Gen.Parameters.default.withSize(1 + i % 60), seed).foreach { w =>
        val toks = Bpe.encodeWord(w, m.ranks)
        assert(toks.mkString == w,
          s"lossy encode of ${w.map(c => f"${c.toInt}%04x").mkString(" ")}")
        assert(toks.forall(_.nonEmpty), s"empty token from '$w'")
        val nCp = w.codePointCount(0, w.length)
        if (nCp > Bpe.BpeMaxWordLen)
          assert(toks.length == 1, s"long word not bypassed: $nCp cps")
        else assert(toks.length <= nCp, s"more tokens than code points for '$w'")
        assert(Bpe.encodeWord(w, m.ranks).toSeq == toks.toSeq, "nondeterministic encode")
      }
      seed = seed.next
    }
  }

  test("model is a deterministic function of the corpus") {
    val m1 = Bpe.trainBpe(spark, sf)
    val m2 = Bpe.trainBpe(spark, sf)
    assert(m1.merges.toSeq == m2.merges.toSeq)
  }

  /** Deterministic synthetic word-frequency table with enough pair
    * structure to sustain thousands of merges: pseudo-words over a
    * 26-letter alphabet, zipf-ish frequencies, seeded RNG.
    */
  private def syntheticWordTable(nTypes: Int, seed: Long): Array[(String, Long)] = {
    val rnd = new scala.util.Random(seed)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val byWord = scala.collection.mutable.LinkedHashMap[String, Long]()
    while (byWord.size < nTypes) {
      val len = 6 + rnd.nextInt(12)
      val w = Array.fill(len)(alpha(rnd.nextInt(26))).mkString
      val f = 1L + rnd.nextInt(50).toLong
      byWord.update(w, byWord.getOrElse(w, 0L) + f)
    }
    byWord.toArray
  }

  test("incremental merge loop is identical to the from-scratch reference") {
    // on the real sf corpus word table at the production default…
    val corpusWc = Bpe.wordTable(spark, sf)
    assert(Bpe.mergeLoop(corpusWc, Bpe.BpeNumMerges).toSeq ==
      Bpe.mergeLoopReference(corpusWc, Bpe.BpeNumMerges).toSeq)
    // …and on a 20k-type synthetic table, where the reference loop is
    // still affordable at 256 merges
    val wc = syntheticWordTable(20000, seed = 42L)
    assert(Bpe.mergeLoop(wc, 256).toSeq == Bpe.mergeLoopReference(wc, 256).toSeq)
  }

  test("production-vocab train: 8k merges, prefix property, bounded driver time") {
    val wc = syntheticWordTable(20000, seed = 42L)
    val t0 = System.nanoTime()
    val big = Bpe.mergeLoop(wc, 8192)
    val sec = (System.nanoTime() - t0) / 1e9
    // (a) the vocab knob actually reaches production scale on this table
    assert(big.length == 8192, s"only ${big.length} merges learned")
    // (b) greedy determinism ⇒ a smaller vocab is a strict prefix —
    // the property that links the 256-merge reference equivalence to
    // the 8k-merge regime the reference loop can't affordably verify
    assert(Bpe.mergeLoop(wc, 256).toSeq == big.take(256).toSeq)
    // (c) driver time bounded (the PQ trainer convention: generous
    // ceiling, catches the O(types × maxLen × merges) regression —
    // the from-scratch loop at this size needs ~2e9 pair recounts)
    assert(sec < 60.0, f"8k-merge train took $sec%.1f s")
  }

  test("property sweep: incremental ≡ reference on random word tables") {
    // the structured tests pin two corpora; this sweeps the space the
    // incremental loop's bookkeeping could get wrong — tiny alphabets
    // force heavy merge interaction (repeats, self-merges aa+a,
    // chains), random freqs exercise the weighted tie-breaks
    val rnd = new scala.util.Random(7L)
    (0 until 60).foreach { it =>
      val alphaSize = 2 + rnd.nextInt(5)
      val nTypes = 5 + rnd.nextInt(120)
      val byWord = scala.collection.mutable.LinkedHashMap[String, Long]()
      (0 until nTypes).foreach { _ =>
        val len = 1 + rnd.nextInt(10)
        val w = Array.fill(len)(('a' + rnd.nextInt(alphaSize)).toChar).mkString
        byWord.update(w, byWord.getOrElse(w, 0L) + 1L + rnd.nextInt(5))
      }
      val wc = byWord.toArray
      val inc = Bpe.mergeLoop(wc, 64).toSeq
      val ref = Bpe.mergeLoopReference(wc, 64).toSeq
      assert(inc == ref,
        s"iteration $it diverged (alpha=$alphaSize, types=${wc.length}):\n" +
          s"  inc=$inc\n  ref=$ref\n  wc=${wc.toSeq}")
    }
  }

  test("encode beyond the memo cap stays correct and allocation-bounded") {
    // fresh model (unique corpus → unique memo key), tiny injected cap
    val d = corpusDir(Seq("memocap xy xz yz xy xz"))
    val m = Bpe.trainBpe(spark, d)
    val cap = 64
    val enc = Bpe.encoder(m, memoCap = cap)
    // 50× the cap in distinct words: every encode must equal the
    // uncached kernel, cached or not
    val words = (0 until cap * 50).map(i => s"w${i}xyz${i % 7}")
    words.foreach { w =>
      assert(enc(w).toSeq == Bpe.encodeWord(w, m.ranks).toSeq, s"mismatch on $w")
    }
    // the memo stopped allocating at the cap
    assert(Bpe.memoSize(m) <= cap,
      s"memo grew to ${Bpe.memoSize(m)} entries past the $cap cap")
    // and beyond-cap words still encode deterministically on re-query
    assert(enc(words.last).toSeq == Bpe.encodeWord(words.last, m.ranks).toSeq)
  }
}
