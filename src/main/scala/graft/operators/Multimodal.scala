package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column operators (builder brief): treat image/audio/video
  * payloads as opaque `binary` columns with typed metadata, and run
  * decode / feature-extract / frame-sample as partition-batched
  * transformations.
  *
  * The container has no media codecs, so the DECODE KERNEL IS A STUB —
  * `FakeDecoder` below is a clearly-marked deterministic stand-in (it
  * derives "dimensions" and "pixels" from the payload bytes). Everything
  * around it is the real engineering and is real here: the
  * binary-plus-metadata schema, partition-batched execution via
  * `mapPartitions` (one decoder instance per partition, the same shape
  * a JNI/FFI codec binding needs), fixed-width feature vectors, and
  * stride frame-sampling. Payloads come from the `documents` table
  * (UTF-8 bytes as the opaque blob) so every stage is oracle-checkable.
  */
object Multimodal {

  /** The decode seam: bytes in → dimensions + fixed-shape features
    * out. Implementations are Serializable values whose instances ride
    * the task closure; a JNI/FFI-backed codec would instead lazy-init
    * its native context inside `mapPartitions` (the slot is marked in
    * [[decodeFeaturesWith]]). The DECLARED queries always run the
    * hermetic [[FakeDecoder]] so the oracle stays deterministic;
    * deployments pass [[JdkImageDecoder]] (or their own binding) to
    * [[decodeFeaturesWith]].
    */
  trait MediaDecoder extends Serializable {
    def name: String

    /** Decoded (width, height), or None when this codec can't read the
      * payload — callers decide whether undecodable media dead-letters
      * or degrades (the FilePipeline dead-letter convention).
      */
    def dims(bytes: Array[Byte]): Option[(Int, Int)]

    /** Fixed-width feature vector ([[FeatureBins]] entries) — total:
      * must return the zero vector, never throw, on undecodable input.
      */
    def features(bytes: Array[Byte]): Array[Float]
  }

  val FeatureBins = 16

  /** STUB: deterministic stand-in for an image/audio decoder — derives
    * "dimensions" and "pixels" from the payload bytes, so every stage
    * around it is oracle-checkable in a container with no media
    * payloads. The hermetic default for all declared queries.
    */
  object FakeDecoder extends MediaDecoder {
    val name = "fake"

    def width(nBytes: Long): Int = (nBytes % 640 + 1).toInt
    def height(nBytes: Long): Int = (nBytes * 7 % 480 + 1).toInt

    // null payload = empty payload (the mediaRelation coalesce
    // contract, honored here too so the trait's totality promise
    // holds for callers that skip mediaRelation)
    def dims(bytes: Array[Byte]): Option[(Int, Int)] = {
      val n = if (bytes == null) 0L else bytes.length.toLong
      Some((width(n), height(n)))
    }

    /** "Pixel statistics": a 16-bin byte histogram normalized to
      * frequencies — fixed-width Array[Float], the shape a real
      * embedding/feature extractor returns.
      */
    def features(bytes: Array[Byte]): Array[Float] = {
      val b = if (bytes == null) Array.emptyByteArray else bytes
      val hist = new Array[Int](FeatureBins)
      var i = 0
      while (i < b.length) {
        hist((b(i) & 0xff) * FeatureBins / 256) += 1
        i += 1
      }
      val n = math.max(b.length, 1).toFloat
      hist.map(_ / n)
    }
  }

  /** A REAL decoder behind the same seam, with zero added
    * dependencies: `javax.imageio` ships in the JDK and reads
    * PNG/JPEG/GIF/BMP. Gated on [[available]] (reader registry
    * non-empty — headless-safe); undecodable payloads yield
    * None/zero-vector rather than throwing, so a mixed corpus streams
    * through without a partition ever failing. Features are the same
    * 16-bin histogram shape as the stub, computed over decoded PIXEL
    * LUMINANCE instead of payload bytes. MultimodalSpec round-trips an
    * in-memory PNG through it; the declared queries stay on
    * [[FakeDecoder]].
    */
  object JdkImageDecoder extends MediaDecoder {
    val name = "jdk-imageio"

    def available: Boolean =
      try javax.imageio.ImageIO.getReaderFormatNames.nonEmpty
      catch { case scala.util.control.NonFatal(_) => false }

    private def read(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (bytes == null) None
      else
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        catch { case scala.util.control.NonFatal(_) => None }

    def dims(bytes: Array[Byte]): Option[(Int, Int)] =
      read(bytes).map(img => (img.getWidth, img.getHeight))

    def features(bytes: Array[Byte]): Array[Float] = read(bytes) match {
      case None => new Array[Float](FeatureBins)
      case Some(img) =>
        val hist = new Array[Int](FeatureBins)
        val (w, h) = (img.getWidth, img.getHeight)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            // integer ITU-R 601 luma; 0..255 → 16 bins like the stub
            val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
              114 * (rgb & 0xff)) / 1000
            hist(lum * FeatureBins / 256) += 1
            x += 1
          }
          y += 1
        }
        val n = math.max(w * h, 1).toFloat
        hist.map(_ / n)
    }
  }

  /** A REAL audio decoder behind the same seam, again with zero added
    * dependencies: `javax.sound.sampled` ships in the JDK and reads
    * WAV/AIFF/AU containers. With the image decoder this shrinks the
    * environmental stub to VIDEO only (no container format ships with
    * the JDK). The (width, height) dims contract maps to
    * (channels, frames); features are the same [[FeatureBins]]-bin
    * histogram shape as the other decoders, computed over decoded
    * SAMPLE AMPLITUDE (any PCM width/endianness is normalized through
    * the JDK's converter to signed 16-bit first, so an 8-bit unsigned
    * WAV and its 16-bit equivalent land in the same bins). Undecodable
    * payloads yield None/zero-vector, never throw — the mixed-corpus
    * totality rule. Deployment note: `features` materializes one
    * decoded payload at a time per partition (bounded by the largest
    * single clip, not the partition), which is the same per-row
    * footprint contract as image decode; hour-long audio would chunk
    * the stream instead.
    */
  object JdkAudioDecoder extends MediaDecoder {
    val name = "jdk-audio"

    def available: Boolean =
      try javax.sound.sampled.AudioSystem.getAudioFileTypes.nonEmpty
      catch { case scala.util.control.NonFatal(_) => false }

    private def open(bytes: Array[Byte]): Option[javax.sound.sampled.AudioInputStream] =
      if (bytes == null) None
      else
        try Option(javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes)))
        catch {
          // getAudioInputStream throws the CHECKED
          // UnsupportedAudioFileException on non-audio bytes — the
          // routine "not this modality" case, not an error
          case _: javax.sound.sampled.UnsupportedAudioFileException => None
          case scala.util.control.NonFatal(_) => None
        }

    /** Re-encode to signed 16-bit PCM at the source rate/channels —
      * sample-width/endianness normalization only, so no resampler is
      * required of the JDK's converter graph.
      */
    private def pcm16(in: javax.sound.sampled.AudioInputStream): Option[javax.sound.sampled.AudioInputStream] = {
      val f = in.getFormat
      val t = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        f.getSampleRate, 16, f.getChannels, 2 * f.getChannels,
        f.getSampleRate, false)
      try Option(javax.sound.sampled.AudioSystem.getAudioInputStream(t, in))
      catch { case scala.util.control.NonFatal(_) => None }
    }

    def dims(bytes: Array[Byte]): Option[(Int, Int)] = open(bytes).map { in =>
      try {
        val frames = in.getFrameLength
        (in.getFormat.getChannels,
          math.min(math.max(frames, 0L), Int.MaxValue.toLong).toInt)
      } finally in.close()
    }

    def features(bytes: Array[Byte]): Array[Float] =
      open(bytes).flatMap(pcm16) match {
        case None => new Array[Float](FeatureBins)
        case Some(in) =>
          try {
            val pcm = in.readAllBytes()
            val hist = new Array[Int](FeatureBins)
            var i = 0
            while (i + 1 < pcm.length) {
              // little-endian signed 16-bit → 0..255 "amplitude level"
              // → 16 bins, the luminance-binning convention
              val s = ((pcm(i + 1) << 8) | (pcm(i) & 0xff)).toShort
              hist(((s >> 8) + 128) * FeatureBins / 256) += 1
              i += 2
            }
            val n = math.max(pcm.length / 2, 1).toFloat
            hist.map(_ / n)
          } catch {
            case scala.util.control.NonFatal(_) => new Array[Float](FeatureBins)
          } finally in.close()
      }
  }

  /** Optional decoder capability: containers that hold addressable
    * frames ([[JdkVideoDecoder]]; an animated-GIF or native-codec
    * binding would too). Lets [[sampleFramesWith]] stay decoder-
    * agnostic. `sampledFrames` exists so a container implementation
    * can COPY only the frames a stride selects — the default
    * materializes everything and strides after, which a large-clip
    * decoder should override.
    */
  trait FrameSource extends Serializable {
    /** Raw frame payloads in container order; empty when unparseable. */
    def frames(bytes: Array[Byte]): Seq[Array[Byte]]

    /** (frame_idx, payload) for every stride-th frame. */
    def sampledFrames(bytes: Array[Byte], stride: Int): Seq[(Int, Array[Byte])] = {
      val fs = frames(bytes)
      fs.indices.by(math.max(1, stride)).map(i => (i, fs(i)))
    }
  }

  /** A REAL video decoder behind the same seam, still with zero added
    * dependencies — which is possible because the oldest mainstream
    * video container is just a RIFF chunk tree with per-frame payloads:
    * MJPEG-in-AVI ('RIFF..AVI ', frames in '##dc'/'##db' chunks inside
    * the 'movi' LIST, each an ordinary JPEG that `javax.imageio`
    * decodes). This closes the environmental stub entirely: image,
    * audio, AND video now each have a working JDK decoder behind the
    * seam, and `FakeDecoder` remains only as the hermetic default the
    * declared oracles need. Modern codecs (H.264+) genuinely need a
    * native library — that binding would slot into the same
    * mapPartitions seam — but the CONTAINER/frame plumbing this
    * decoder exercises is the part the engine owns.
    *
    * dims = (width, height) of the first decodable frame; features =
    * the elementwise MEAN of the per-frame luminance histograms
    * ([[JdkImageDecoder.features]] on each sampled frame — shared
    * kernel, so a 1-frame video bins exactly like its still image),
    * ceil-stride-sampled ACROSS the whole clip so at most
    * [[VideoMaxDecodedFrames]] frames decode regardless of clip
    * length. The walk records (offset, length) ranges and copies only
    * the frames actually consumed — per-row allocation is frames-used
    * × frame size, never clip size. Malformed RIFF, non-AVI bytes,
    * pathological nesting, or undecodable frames degrade to
    * None/zero-vector, never throw (the mixed-corpus totality rule).
    */
  object JdkVideoDecoder extends MediaDecoder with FrameSource {
    val name = "jdk-mjpeg-avi"

    def available: Boolean = JdkImageDecoder.available

    /** (offset, length) of each '##dc'/'##db' chunk body under 'movi',
      * in file order; empty on anything that is not a parseable AVI.
      * Tolerant ITERATIVE walk (an explicit range stack, so
      * adversarially-nested LISTs cannot StackOverflow a task — that
      * error is fatal and would escape a NonFatal catch): bad sizes or
      * truncation end the walk rather than throw.
      */
    private def frameRanges(bytes: Array[Byte]): Seq[(Int, Int)] = {
      if (bytes == null || bytes.length < 12) return Nil
      def fourcc(off: Int): String =
        new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      def u32(off: Int): Long =
        (bytes(off) & 0xffL) | (bytes(off + 1) & 0xffL) << 8 |
          (bytes(off + 2) & 0xffL) << 16 | (bytes(off + 3) & 0xffL) << 24
      if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return Nil
      def isFrameChunk(cc: String): Boolean =
        cc.length == 4 && cc(0).isDigit && cc(1).isDigit &&
          (cc.endsWith("dc") || cc.endsWith("db"))
      val out = Seq.newBuilder[(Int, Int)]
      // ranges still to scan; LIST bodies push their inner range and
      // the remainder of the outer one — frame chunks can sit under
      // 'movi' directly or 'rec ' sublists
      var stack = List((12, bytes.length))
      try {
        while (stack.nonEmpty) {
          var (p, until) = stack.head
          stack = stack.tail
          var walking = true
          while (walking && p + 8 <= until) {
            val cc = fourcc(p)
            val size = u32(p + 4)
            val dataStart = p + 8
            if (size < 0 || dataStart + size > until) walking = false // truncated
            else {
              val dataEnd = (dataStart + size).toInt
              if (cc == "LIST" && size >= 4) {
                // depth-first IN ORDER: the LIST body scans next, the
                // remainder of this range after it — same emission
                // order as the recursive walk, no recursion depth
                stack = (dataStart + 4, dataEnd) ::
                  (dataEnd + (size.toInt & 1), until) :: stack
                walking = false
              } else {
                if (isFrameChunk(cc) && size > 0)
                  out += ((dataStart, size.toInt))
                p = dataEnd + (size.toInt & 1) // chunks pad to even
              }
            }
          }
        }
        out.result()
      } catch { case scala.util.control.NonFatal(_) => Nil }
    }

    private def copyRange(bytes: Array[Byte], r: (Int, Int)): Array[Byte] =
      java.util.Arrays.copyOfRange(bytes, r._1, r._1 + r._2)

    /** Raw frame payloads in file order — the materializing accessor;
      * [[features]]/[[dims]]/[[sampledFrames]] go through
      * [[frameRanges]] and copy only what they consume.
      */
    def frames(bytes: Array[Byte]): Seq[Array[Byte]] =
      frameRanges(bytes).map(copyRange(bytes, _))

    override def sampledFrames(bytes: Array[Byte],
        stride: Int): Seq[(Int, Array[Byte])] = {
      val rs = frameRanges(bytes)
      rs.indices.by(math.max(1, stride))
        .map(i => (i, copyRange(bytes, rs(i))))
    }

    def dims(bytes: Array[Byte]): Option[(Int, Int)] =
      frameRanges(bytes).iterator
        .flatMap(r => JdkImageDecoder.dims(copyRange(bytes, r)))
        .nextOption()

    def features(bytes: Array[Byte]): Array[Float] = {
      val rs = frameRanges(bytes)
      if (rs.isEmpty) return new Array[Float](FeatureBins)
      // ceil stride: samples spread across the WHOLE clip (floor would
      // decode only the first consecutive 8 of a 9..15-frame clip)
      val stride = (rs.length + VideoMaxDecodedFrames - 1) / VideoMaxDecodedFrames
      val sampled = rs.indices.by(math.max(1, stride))
        .take(VideoMaxDecodedFrames)
        .map(i => copyRange(bytes, rs(i)))
      // decodable frames only: a corrupt frame must not drag the mean
      // toward zero
      val hists = sampled.map(JdkImageDecoder.features)
        .filter(_.exists(_ != 0f))
      if (hists.isEmpty) return new Array[Float](FeatureBins)
      val acc = new Array[Float](FeatureBins)
      hists.foreach { h =>
        var i = 0
        while (i < FeatureBins) { acc(i) += h(i); i += 1 }
      }
      acc.map(_ / hists.length)
    }
  }

  /** Decode-cost bound for [[JdkVideoDecoder.features]]: stride-sample
    * so at most this many frames decode per clip — per-row work is
    * bounded by frame size × this constant, not clip length (the
    * mm_frame_sample stride convention applied inside the kernel).
    */
  val VideoMaxDecodedFrames = 8

  /** The media relation: opaque payload + typed metadata struct. At
    * 100 TB this is a parquet table of real payloads partitioned by
    * media type / date; metadata travels in-row so planning never
    * touches payload bytes (column pruning drops `payload` whenever a
    * query reads only metadata).
    */
  def mediaRelation(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // null text = empty payload (the DnaPipeline.discover contract):
    // the decode kernels stay total on corpora with null rows
    val t = coalesce($"text", lit(""))
    Tables.documents(s, d).select(
      $"doc_id".as("media_id"),
      to_binary(t, lit("utf-8")).as("payload"),
      lit("fake/text-as-image").as("media_type"),
      struct(
        octet_length(to_binary(t, lit("utf-8"))).cast("long").as("n_bytes"),
        (octet_length(to_binary(t, lit("utf-8"))) % 640 + 1).as("width"),
        (octet_length(to_binary(t, lit("utf-8"))).cast("long") * 7 % 480 + 1)
          .cast("int").as("height"),
        lit(3).as("channels")).as("meta"))
  }

  /** Partition-batched decode through the [[MediaDecoder]] seam: one
    * decoder per partition (the slot where a JNI/FFI binding would
    * lazily initialize its native context once per task, not once per
    * row).
    */
  def decodeFeaturesWith(s: SparkSession, media: DataFrame,
      decoder: MediaDecoder): DataFrame = {
    import s.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition native-context init would go here
        it.map { case (id, bytes) => (id, decoder.features(bytes)) }
      }.toDF("media_id", "features")
  }

  /** The declared decode path — hermetic [[FakeDecoder]], so the
    * mm_features oracle stays a pure function of the fixture.
    */
  def decodeFeatures(s: SparkSession, d: String): DataFrame =
    decodeFeaturesWith(s, mediaRelation(s, d), FakeDecoder)

  /** REAL frame sampling through a frame-addressable decoder: one row
    * per sampled frame (media_id, frame_idx, frame) — the deployment
    * form of mm_frame_sample for container payloads (the declared
    * query keeps its hermetic text-stride form for the oracle).
    * Partition-batched like [[decodeFeaturesWith]]; the stride bounds
    * per-clip emission, and non-container payloads simply emit no
    * rows (the mixed-corpus totality rule).
    */
  def sampleFramesWith(s: SparkSession, media: DataFrame,
      src: FrameSource, stride: Int = 1): DataFrame = {
    import s.implicits._
    val step = math.max(1, stride)
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          src.sampledFrames(bytes, step).map { case (i, f) => (id, i, f) }
        }
      }.toDF("media_id", "frame_idx", "frame")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Metadata projection: must never deserialize payload bytes —
    // column pruning reads only the meta struct at the scan.
    "mm_meta" -> { (s, d) =>
      import s.implicits._
      mediaRelation(s, d).select(
        $"media_id", $"media_type",
        $"meta.n_bytes", $"meta.width", $"meta.height", $"meta.channels")
    },

    // Stride frame-sampling: every k-th "frame" (byte/char) of the
    // payload — the video keyframe-sampling access pattern.
    "mm_frame_sample" -> { (s, d) =>
      import s.implicits._
      val k = 16
      val t = coalesce($"text", lit(""))
      Tables.documents(s, d).select(
        $"doc_id".as("media_id"),
        concat_ws("", transform(
          sequence(lit(1),
            greatest(ceil(length(t) / lit(k.toDouble)), lit(1)).cast("int")),
          i => substring(t, (i - lit(1)) * k + 1, lit(1)))).as("frames"))
    },

    // Feature extraction through the partition-batched decode path.
    // Histogram frequencies are k/n with k,n integers — exactly
    // representable ratios compared as rounded doubles in the oracle.
    "mm_features" -> { (s, d) =>
      import s.implicits._
      decodeFeatures(s, d).select(
        $"media_id",
        round(element_at($"features", 5).cast("double"), 6).as("bin4_freq"),
        round(element_at($"features", 7).cast("double"), 6).as("bin6_freq"),
        round(aggregate($"features", lit(0.0), (a, x) => a + x.cast("double")), 4)
          .as("mass"))
    })

  val oracles: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id AS media_id, 'fake/text-as-image' AS media_type,
         octet_length(encode(COALESCE(text, ''))) AS n_bytes,
         CAST(octet_length(encode(COALESCE(text, ''))) % 640 + 1 AS INT) AS width,
         CAST(octet_length(encode(COALESCE(text, ''))) * 7 % 480 + 1 AS INT) AS height,
         3 AS channels
         FROM documents""",
    "mm_frame_sample" ->
      """SELECT doc_id AS media_id,
         array_to_string(list_transform(
           generate_series(1, CAST(GREATEST(CEIL(LENGTH(COALESCE(text, '')) / 16.0), 1) AS BIGINT)),
           i -> COALESCE(text, '')[(i-1)*16 + 1]), '') AS frames
         FROM documents""",
    // BYTE-exact restatement: the stubbed decoder bins UTF-8 BYTES
    // (bin = byte // 16 = the byte's high hex nibble), so the oracle
    // reads each byte's first hex digit off hex(encode(text)) — valid
    // on any corpus, not just ASCII (round-9 adversarial sweep).
    "mm_features" ->
      """WITH chars AS (
           SELECT doc_id, octet_length(encode(COALESCE(text, ''))) AS n,
             list_transform(generate_series(1, octet_length(encode(COALESCE(text, '')))),
               i -> instr('0123456789ABCDEF',
                 substring(hex(encode(COALESCE(text, ''))), 2*i - 1, 1)) - 1) AS bins
           FROM documents)
         SELECT doc_id AS media_id,
           ROUND((len(list_filter(bins, b -> b = 4))::FLOAT /
             GREATEST(n, 1))::DOUBLE, 6) AS bin4_freq,
           ROUND((len(list_filter(bins, b -> b = 6))::FLOAT /
             GREATEST(n, 1))::DOUBLE, 6) AS bin6_freq,
           ROUND(list_sum(list_transform(generate_series(0, 15),
             b -> (len(list_filter(bins, x -> x = b))::FLOAT /
               GREATEST(n, 1))::DOUBLE)), 4) AS mass
         FROM chars""")
}
