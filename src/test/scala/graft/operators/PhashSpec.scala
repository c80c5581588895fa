package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [[Multimodal.phashGrid]] / the pHash family: kernel edge pins, the
  * banding pigeonhole, and — through the REAL JDK image decoder — the
  * perceptual properties that justify the operator: container
  * invariance, resize tolerance, luminance-affine tolerance, and
  * unrelated-content separation (none of which the byte-4-gram
  * content signature provides for resizing).
  */
class PhashSpec extends AnyFunSuite {

  private def img(w: Int, h: Int, fmt: String)(lum: (Int, Int) => Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val g = lum(x, y) & 0xff
        im.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, fmt, out)
    out.toByteArray
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private def phashImg(bytes: Array[Byte]): Long =
    Multimodal.phashOf(Multimodal.JdkImageDecoder)(bytes).get._3

  // a smooth "scene": the same function of normalized coordinates at
  // any raster size, so two resolutions depict identical content
  private def scene(w: Int, h: Int)(x: Int, y: Int): Int = {
    val (u, v) = (x.toDouble / w, y.toDouble / h)
    (127 + 60 * math.sin(6 * u + 2) * math.cos(5 * v) + 40 * u - 30 * v).toInt
  }

  test("kernel edges: degenerate dims, empty and null content hash to zero") {
    assert(Multimodal.phashGrid(0, 5, Array[Byte](1, 2)) == 0L)
    assert(Multimodal.phashGrid(5, 0, Array[Byte](1, 2)) == 0L)
    assert(Multimodal.phashGrid(4, 4, Array.emptyByteArray) == 0L)
    assert(Multimodal.phashGrid(4, 4, null) == 0L)
    // constant content: every non-DC coefficient is exactly 0 -> no bit
    assert(Multimodal.phashGrid(16, 16, Array.fill[Byte](256)(100)) == 0L)
  }

  test("banding pigeonhole: any <=3-bit corruption shares a band (property)") {
    val rnd = new scala.util.Random(7)
    (0 until 2000).foreach { _ =>
      val a = rnd.nextLong()
      var b = a
      (0 until rnd.nextInt(Multimodal.PhashThreshold + 1)).foreach { _ =>
        b ^= 1L << rnd.nextInt(64)
      }
      val shares = (0 until Multimodal.PhashBands).exists { k =>
        ((a >>> (16 * k)) & 0xffffL) == ((b >>> (16 * k)) & 0xffffL)
      }
      assert(shares, f"no shared band for a=$a%016x b=$b%016x")
    }
  }

  test("collapse-first cluster equals CC over the full pair graph (blow-up argument)") {
    import org.apache.spark.sql.functions.col
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val full = Dedup.connectedComponents(
        Multimodal.queries("dedup_phash")(spark, sf)
          .select(col("id_a"), col("id_b")))
      .as[(Long, Long)].collect().toMap
    // identical-hash members carry hamming-0 edges, so the full graph
    // already contains every node the collapsed form emits — the two
    // labelings must be EQUAL, not just consistent
    val collapsed = Multimodal.queries("dedup_phash_cluster")(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(collapsed.nonEmpty)
    assert(collapsed == full,
      s"diff: ${(collapsed.toSet diff full.toSet).take(3)} / " +
        s"${(full.toSet diff collapsed.toSet).take(3)}")
  }

  test("real decoder: container-invariant (PNG == BMP), resize- and luminance-tolerant, unrelated separates") {
    val base = img(64, 64, "png")(scene(64, 64))
    val bmp = img(64, 64, "bmp")(scene(64, 64))
    val doubled = img(128, 128, "png")(scene(128, 128))
    val shrunk = img(32, 32, "png")(scene(32, 32))
    val affine = img(64, 64, "png")((x, y) => scene(64, 64)(x, y) / 2 + 10)
    val unrelated = img(64, 64, "png")((x, y) => (x * 37 ^ y * 101) % 256)

    val pBase = phashImg(base)
    assert(pBase != 0L)
    assert(phashImg(bmp) == pBase, "pixel-identical containers must hash equal")

    val hUp = hamming(phashImg(doubled), pBase)
    val hDown = hamming(phashImg(shrunk), pBase)
    val hAff = hamming(phashImg(affine), pBase)
    val hUnrel = hamming(phashImg(unrelated), pBase)
    info(s"hamming: 2x=$hUp 0.5x=$hDown affine=$hAff unrelated=$hUnrel")
    assert(hUp <= 8, s"2x resize moved $hUp bits")
    assert(hDown <= 8, s"0.5x resize moved $hDown bits")
    assert(hAff <= 8, s"affine luminance moved $hAff bits")
    assert(hUnrel >= 16, s"unrelated content only $hUnrel bits away")
  }
}
