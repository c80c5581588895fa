package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The decode seam both ways (r10 verdict item 7): the declared
  * queries run the hermetic FakeDecoder (oracle-gated), and the REAL
  * JDK ImageIO decoder must work behind the SAME seam — dimensions and
  * pixel-luminance features off an actual in-memory PNG, undecodable
  * payloads degrading to None/zero-vector instead of failing the
  * partition. No media files or external codecs: the PNG is built with
  * java.awt and round-tripped through ImageIO bytes.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** A w×h PNG whose pixels are all the given grey level. */
  private def png(w: Int, h: Int, grey: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (grey << 16) | (grey << 8) | grey
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("JDK ImageIO decoder is available and reads a real PNG's dimensions") {
    assert(Multimodal.JdkImageDecoder.available, "JDK has no image readers?")
    assert(Multimodal.JdkImageDecoder.dims(png(64, 48, 200)) == Some((64, 48)))
  }

  test("real-decoder features: luminance histogram over decoded pixels") {
    // uniform grey 200 → every pixel lands in bin 200*16/256 = 12;
    // frequencies sum to 1 exactly (single bin)
    val f = Multimodal.JdkImageDecoder.features(png(10, 10, 200))
    assert(f.length == Multimodal.FeatureBins)
    assert(f(12) == 1.0f, s"expected all mass in bin 12, got ${f.toSeq}")
    assert(f.sum == 1.0f)
  }

  test("undecodable payloads degrade to None/zero-vector, never throw") {
    val garbage = "definitely not an image".getBytes("UTF-8")
    assert(Multimodal.JdkImageDecoder.dims(garbage).isEmpty)
    assert(Multimodal.JdkImageDecoder.features(garbage).toSeq ==
      Seq.fill(Multimodal.FeatureBins)(0.0f))
    assert(Multimodal.JdkImageDecoder.dims(Array.empty[Byte]).isEmpty)
  }

  test("the partition-batched decode path runs BOTH decoders behind one seam") {
    import spark.implicits._
    // a mixed media relation: one real PNG, one garbage payload
    val media = Seq(
      (1L, png(8, 8, 100)),
      (2L, "not an image".getBytes("UTF-8"))
    ).toDF("media_id", "payload")

    val real = Multimodal
      .decodeFeaturesWith(spark, media, Multimodal.JdkImageDecoder)
      .as[(Long, Array[Float])].collect().toMap
    // grey 100 → bin 100*16/256 = 6, full mass; garbage → zero vector
    assert(real(1L)(6) == 1.0f)
    assert(real(2L).toSeq == Seq.fill(Multimodal.FeatureBins)(0.0f))

    val fake = Multimodal
      .decodeFeaturesWith(spark, media, Multimodal.FakeDecoder)
      .as[(Long, Array[Float])].collect().toMap
    // the stub is total and byte-driven: mass ≈ 1 on any payload
    assert(math.abs(fake(1L).sum - 1.0f) < 1e-4)
    assert(math.abs(fake(2L).sum - 1.0f) < 1e-4)
  }

  test("declared mm_features path is pinned to the hermetic FakeDecoder") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val viaSeam = Multimodal
      .decodeFeaturesWith(spark, Multimodal.mediaRelation(spark, sf),
        Multimodal.FakeDecoder)
      .as[(Long, Array[Float])].collect().toMap
    val declared = Multimodal.decodeFeatures(spark, sf)
      .as[(Long, Array[Float])].collect().toMap
    assert(declared.keySet == viaSeam.keySet)
    declared.foreach { case (id, f) =>
      assert(f.toSeq == viaSeam(id).toSeq, s"decoder drift on media $id")
    }
  }

  /** A mono 16-bit little-endian WAV over the given samples. */
  private def wav16(samples: Array[Short]): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      in, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** The same content as a mono 8-bit UNSIGNED WAV (the classic low-fi
    * WAV encoding) — one unsigned byte per sample.
    */
  private def wav8(samples: Array[Int]): Array[Byte] = {
    val data = samples.map(v => (v & 0xff).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      in, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("JDK audio decoder reads a real WAV's channels and frame count") {
    assert(Multimodal.JdkAudioDecoder.available, "JDK has no audio writers?")
    val bytes = wav16(Array.fill[Short](480)(0))
    assert(Multimodal.JdkAudioDecoder.dims(bytes) == Some((1, 480)))
  }

  test("audio features: amplitude histogram over decoded samples") {
    // constant sample 16384 → level (16384>>8)+128 = 192 → bin
    // 192*16/256 = 12, full mass; silence (0) → bin 8
    val loud = Multimodal.JdkAudioDecoder.features(wav16(Array.fill[Short](100)(16384)))
    assert(loud.length == Multimodal.FeatureBins)
    assert(loud(12) == 1.0f, s"expected all mass in bin 12, got ${loud.toSeq}")
    val silent = Multimodal.JdkAudioDecoder.features(wav16(Array.fill[Short](100)(0)))
    assert(silent(8) == 1.0f, s"expected all mass in bin 8, got ${silent.toSeq}")
  }

  test("audio sample-width normalization: 8-bit unsigned bins like 16-bit") {
    // unsigned byte 192 is the same amplitude as signed 16384 — the
    // pcm16 normalization must land both in the same bin
    val b8 = Multimodal.JdkAudioDecoder.features(wav8(Array.fill(100)(192)))
    assert(b8(12) == 1.0f, s"expected all mass in bin 12, got ${b8.toSeq}")
  }

  test("undecodable audio degrades to None/zero-vector, never throws") {
    val garbage = "definitely not audio".getBytes("UTF-8")
    assert(Multimodal.JdkAudioDecoder.dims(garbage).isEmpty)
    assert(Multimodal.JdkAudioDecoder.features(garbage).toSeq ==
      Seq.fill(Multimodal.FeatureBins)(0.0f))
    assert(Multimodal.JdkAudioDecoder.dims(Array.empty[Byte]).isEmpty)
    // an image is not audio either — modality misroutes degrade too
    assert(Multimodal.JdkAudioDecoder.dims(png(4, 4, 10)).isEmpty)
  }

  test("the partition-batched decode path runs the audio decoder behind the seam") {
    import spark.implicits._
    val media = Seq(
      (1L, wav16(Array.fill[Short](64)(16384))),
      (2L, "not audio".getBytes("UTF-8"))
    ).toDF("media_id", "payload")
    val real = Multimodal
      .decodeFeaturesWith(spark, media, Multimodal.JdkAudioDecoder)
      .as[(Long, Array[Float])].collect().toMap
    assert(real(1L)(12) == 1.0f)
    assert(real(2L).toSeq == Seq.fill(Multimodal.FeatureBins)(0.0f))
  }

  // ----- video (MJPEG-in-AVI through the RIFF walker) ----------------

  private def jpeg(w: Int, h: Int, grey: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (grey << 16) | (grey << 8) | grey
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Minimal structurally-valid MJPEG AVI: RIFF('AVI ') with a token
    * hdrl LIST and a movi LIST holding one '00dc' chunk per frame
    * (odd-sized payloads exercise the even-padding rule).
    */
  private def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, (v >> 8 & 0xff).toByte,
        (v >> 16 & 0xff).toByte, (v >> 24 & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(fourcc: String, data: Array[Byte]): Array[Byte] =
      cc(fourcc) ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
    val avih = chunk("avih", new Array[Byte](56))
    val hdrl = chunk("LIST", cc("hdrl") ++ avih)
    val movi = chunk("LIST",
      cc("movi") ++ frames.flatMap(f => chunk("00dc", f)))
    val body = cc("AVI ") ++ hdrl ++ movi
    cc("RIFF") ++ le32(body.length) ++ body
  }

  test("JDK video decoder: frame payloads, dims, and mean-histogram features") {
    assume(Multimodal.JdkVideoDecoder.available)
    val fs = Seq(jpeg(6, 4, 0), jpeg(6, 4, 128), jpeg(6, 4, 255))
    val avi = mjpegAvi(fs)
    val d = Multimodal.JdkVideoDecoder
    assert(d.frames(avi).map(_.toSeq) == fs.map(_.toSeq),
      "RIFF walk must return the exact frame payloads in order")
    assert(d.dims(avi).contains((6, 4)))
    // features are the elementwise MEAN of the per-frame image
    // histograms — shared kernel, recomputed here independently
    val want = fs.map(Multimodal.JdkImageDecoder.features)
      .transpose.map(xs => xs.sum / fs.length)
    assert(d.features(avi).toSeq == want)
    // a 1-frame video bins exactly like its still image
    val one = mjpegAvi(Seq(fs(1)))
    assert(d.features(one).toSeq ==
      Multimodal.JdkImageDecoder.features(fs(1)).toSeq)
  }

  test("video decoder totality: junk, truncated AVI, and non-AVI RIFF degrade") {
    val d = Multimodal.JdkVideoDecoder
    for (bad <- Seq(null, Array.emptyByteArray, "not a video".getBytes("UTF-8"),
        png(3, 3, 7), mjpegAvi(Seq(jpeg(4, 4, 9))).take(40).toArray,
        "RIFF   WAVE".getBytes("US-ASCII"))) {
      assert(d.dims(bad).isEmpty)
      assert(d.features(bad).toSeq == Seq.fill(Multimodal.FeatureBins)(0.0f))
    }
    // corrupt FRAME inside a well-formed container: skipped, not zeroed
    val good = jpeg(5, 5, 64)
    val mixed = mjpegAvi(Seq(Array[Byte](1, 2, 3), good))
    assert(d.dims(mixed).contains((5, 5)))
    assert(d.features(mixed).toSeq ==
      Multimodal.JdkImageDecoder.features(good).toSeq)
  }

  test("the partition-batched decode path runs the video decoder behind the seam") {
    assume(Multimodal.JdkVideoDecoder.available)
    import spark.implicits._
    val media = Seq(
      (1L, mjpegAvi(Seq(jpeg(8, 8, 200), jpeg(8, 8, 200)))),
      (2L, "not a video".getBytes("UTF-8"))
    ).toDF("media_id", "payload")
    val real = Multimodal
      .decodeFeaturesWith(spark, media, Multimodal.JdkVideoDecoder)
      .as[(Long, Array[Float])].collect().toMap
    assert(real(1L).sum > 0.99f && real(1L).sum < 1.01f,
      "mean histogram must stay a frequency distribution")
    assert(real(2L).toSeq == Seq.fill(Multimodal.FeatureBins)(0.0f))
  }

  test("video features ceil-stride: a 15-frame clip samples ACROSS the clip, not its head") {
    assume(Multimodal.JdkVideoDecoder.available)
    // floor stride would decode frames 0..7 and never see the tail;
    // ceil stride (2 here) must sample 0,2,...,14 — pinned by making
    // the head frames one shade and the tail another
    val fs = (0 until 15).map(i => jpeg(4, 4, if (i < 8) 0 else 250))
    val got = Multimodal.JdkVideoDecoder.features(mjpegAvi(fs))
    val want = (0 until 15 by 2).map(i => fs(i))
      .map(Multimodal.JdkImageDecoder.features)
      .transpose.map(xs => xs.sum / 8)
    assert(got.toSeq == want)
    // tail shade present in the mean — head-only sampling would zero it
    assert(got.last > 0f, "clip tail never sampled")
  }

  test("adversarially nested LISTs cannot overflow the walk; rec sublists keep frame order") {
    // the ordering half builds JPEG payloads — guard like the sibling
    // video tests so a writer-less JVM cancels instead of failing
    assume(Multimodal.JdkVideoDecoder.available)
    val d = Multimodal.JdkVideoDecoder
    // ~60k nested LIST('rec ') headers: a recursive walk would
    // StackOverflow (fatal — escapes NonFatal) and kill the task
    val n = 60000
    val buf = java.nio.ByteBuffer.allocate(12 + n * 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + n * 12)
      .put("AVI ".getBytes("US-ASCII"))
    for (k <- 0 until n)
      buf.put("LIST".getBytes("US-ASCII")).putInt(4 + (n - 1 - k) * 12)
        .put("rec ".getBytes("US-ASCII"))
    assert(d.frames(buf.array()).isEmpty)
    assert(d.features(buf.array()).toSeq ==
      Seq.fill(Multimodal.FeatureBins)(0.0f))

    // in-order traversal: frame, LIST rec(frame, frame), frame must
    // come back 0,1,2,3 — an out-of-order stack walk would scramble
    // frame_idx
    val f = (0 until 4).map(i => jpeg(3, 3, i * 60))
    def le32(v: Int) = Array((v & 0xff).toByte, (v >> 8 & 0xff).toByte,
      (v >> 16 & 0xff).toByte, (v >> 24 & 0xff).toByte)
    def cc(s: String) = s.getBytes("US-ASCII")
    def chunk(fcc: String, data: Array[Byte]) =
      cc(fcc) ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
    val rec = chunk("LIST", cc("rec ") ++ chunk("00dc", f(1)) ++ chunk("00dc", f(2)))
    val movi = chunk("LIST",
      cc("movi") ++ chunk("00dc", f(0)) ++ rec ++ chunk("00dc", f(3)))
    val body = cc("AVI ") ++ movi
    val avi = cc("RIFF") ++ le32(body.length) ++ body
    assert(d.frames(avi).map(_.toSeq) == f.map(_.toSeq),
      "rec-sublist frames out of order")
  }

  test("real frame sampling: stride over container frames, non-video rows emit nothing") {
    assume(Multimodal.JdkVideoDecoder.available)
    import spark.implicits._
    val fs = (0 until 5).map(i => jpeg(4, 4, i * 50))
    val media = Seq(
      (1L, mjpegAvi(fs)),
      (2L, "plain text".getBytes("UTF-8"))
    ).toDF("media_id", "payload")
    val rows = Multimodal
      .sampleFramesWith(spark, media, Multimodal.JdkVideoDecoder, stride = 2)
      .as[(Long, Int, Array[Byte])].collect()
    assert(rows.forall(_._1 == 1L), "non-container payloads must emit no rows")
    assert(rows.map(_._2).sorted.toSeq == Seq(0, 2, 4))
    rows.foreach { case (_, i, f) => assert(f.toSeq == fs(i).toSeq) }
  }

  test("contentSketch: exact signed 4-gram accumulation, total on degenerate input") {
    // hand-rolled reference on a tiny payload
    val b = "abcdef".getBytes("US-ASCII")
    val want = new Array[Float](Multimodal.SigDim)
    (0 to b.length - 4).foreach { i =>
      val h = (0 until 4).foldLeft(0L)((a, j) => a * Multimodal.SigP + (b(i + j) & 0xff))
      want((h % Multimodal.SigDim).toInt) +=
        (if ((h / Multimodal.SigDim) % 2 == 0) 1f else -1f)
    }
    assert(Multimodal.contentSketch(b).toSeq == want.toSeq)
    // < SigGram bytes → no grams → zero vector; null → zero vector
    assert(Multimodal.contentSketch("abc".getBytes).forall(_ == 0f))
    assert(Multimodal.contentSketch(null).forall(_ == 0f))
    // determinism across calls
    assert(Multimodal.contentSketch(b).toSeq == Multimodal.contentSketch(b).toSeq)
  }

  test("signature signs CONTENT, not container bytes: PNG vs BMP of the same pixels") {
    assume(Multimodal.JdkImageDecoder.available)
    // a non-uniform image so the signature is information-bearing
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 16).foreach(y => (0 until 16).foreach { x =>
      val g = (x * 16 + y * 3) % 256
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    })
    def enc(fmt: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    val (pngB, bmpB) = (enc("png"), enc("bmp"))
    assert(!java.util.Arrays.equals(pngB, bmpB), "containers must differ")
    val d = Multimodal.JdkImageDecoder
    // identical decoded luminance ⇒ identical signatures, despite
    // byte-level-different containers — the property the near-dup
    // pairing rests on
    assert(d.signature(pngB).toSeq == d.signature(bmpB).toSeq)
    assert(d.signature(pngB).exists(_ != 0f))
    // a different image signs differently
    assert(d.signature(pngB).toSeq != d.signature(png(16, 16, 7)).toSeq)
    // undecodable → zero signature (excluded from pairing upstream)
    assert(d.signature("junk".getBytes).forall(_ == 0f))
  }

  test("dedup_media pairs equal the exact cosine pair set (LSH recall on the fixture)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val sigs = Multimodal.signaturesWith(
      spark, Multimodal.mediaRelation(spark, dir), Multimodal.FakeDecoder)
      .as[(Long, Array[Float], Double)].collect()
    assert(sigs.nonEmpty && sigs.forall(_._3 > 0),
      "zero-content rows must be excluded before pairing")
    def cos(a: (Long, Array[Float], Double), b: (Long, Array[Float], Double)): Double = {
      var acc = 0.0; var i = 0
      while (i < a._2.length) { acc += a._2(i).toDouble * b._2(i).toDouble; i += 1 }
      BigDecimal(acc / a._3 / b._3)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val exact = (for {
      a <- sigs; b <- sigs if a._1 < b._1
      c = cos(a, b) if c >= Multimodal.MediaCosineThreshold
    } yield (a._1, b._1, c)).toSet
    val got = Multimodal.queries("dedup_media")(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == exact,
      s"LSH pair set diverged: missing ${(exact -- got).take(3)}, extra ${(got -- exact).take(3)}")
    assert(exact.nonEmpty, "fixture should contain at least one media near-dup pair")
  }
}
