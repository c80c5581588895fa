package graft.codec

/** Base-3 (trit) codecs over big-endian byte blocks.
  *
  * Semantics match the reference exactly
  * (`plugins/utils/dna_encoding.py:47-130`):
  *   - empty input and zero both encode to the single trit `[0]`
  *     (`dna_encoding.py:49-54`);
  *   - the whole block is one big-endian unsigned integer, so leading
  *     zero bytes collapse on encode and are restored on decode via the
  *     caller-supplied fixed width (`dna_encoding.py:63-76`);
  *   - decode left-pads to `targetLengthBytes` and keeps the low-order
  *     bytes if the value is wider (`dna_encoding.py:71-76`).
  */
object Trits {

  /** Bytes → base-3 digits, most-significant trit first.
    *
    * In-place repeated division of a base-2³² limb array by 3 —
    * numerically identical to the reference's arbitrary-precision
    * divmod loop, but allocation-free per digit (BigInt divideAndRemainder
    * allocates two objects per trit and made the codec the pipeline's
    * hot spot: ~50× slower at chunk_size=1000).
    */
  def bytesToTrits(data: Array[Byte]): Array[Int] = {
    if (data.isEmpty) return Array(0)
    val nl = (data.length + 3) / 4
    val limbs = new Array[Int](nl) // big-endian base-2^32
    val lead = data.length - (nl - 1) * 4
    var acc = 0
    var i = 0
    while (i < lead) { acc = (acc << 8) | (data(i) & 0xff); i += 1 }
    limbs(0) = acc
    var li = 1
    while (li < nl) {
      limbs(li) = ((data(i) & 0xff) << 24) | ((data(i + 1) & 0xff) << 16) |
        ((data(i + 2) & 0xff) << 8) | (data(i + 3) & 0xff)
      i += 4; li += 1
    }
    var start = 0
    while (start < nl && limbs(start) == 0) start += 1
    if (start == nl) return Array(0)
    // divide by 3^19 per pass (19 trits per limb walk), then expand
    // each base-3^19 superdigit locally — same digit sequence as
    // dividing by 3 once per trit, ~19× fewer limb operations
    val supers = new scala.collection.mutable.ArrayBuffer[Long](data.length / 2 + 1)
    while (start < nl) {
      var rem = 0L
      var j = start
      while (j < nl) {
        val cur = (rem << 32) | (limbs(j) & 0xffffffffL)
        limbs(j) = (cur / Radix).toInt
        rem = cur % Radix
        j += 1
      }
      supers += rem // least-significant superdigit of the remaining value
      while (start < nl && limbs(start) == 0) start += 1
    }
    // most-significant superdigit expands to its minimal trit count
    var msd = supers(supers.length - 1)
    var msdTrits = 0
    while (msd > 0) { msd /= 3; msdTrits += 1 }
    val total = (supers.length - 1) * RadixTrits + math.max(msdTrits, 1)
    val arr = new Array[Int](total)
    var p = total - 1
    var si = 0
    while (si < supers.length - 1) {
      var v = supers(si)
      var c = 0
      while (c < RadixTrits) { arr(p) = (v % 3).toInt; v /= 3; p -= 1; c += 1 }
      si += 1
    }
    var v = supers(supers.length - 1)
    while (p >= 0) { arr(p) = (v % 3).toInt; v /= 3; p -= 1 }
    arr
  }

  private final val RadixTrits = 19
  private final val Radix = 1162261467L // 3^19 < 2^31

  /** Trits → fixed-width big-endian bytes (left-pad zeros / keep the
    * low-order `targetLengthBytes` bytes when wider). Horner evaluation
    * into base-2³² limbs (multiply-by-3-and-add in place).
    */
  def tritsToBytes(trits: Seq[Int], targetLengthBytes: Int): Array[Byte] = {
    var limbs = new Array[Int](math.max(1, trits.length / 20 + 1))
    var used = 1 // limbs are little-endian here; index 0 = least significant
    // Horner in radix 3^19: fold 19 trits into one superdigit, then one
    // multiply-add limb walk per group instead of per trit
    val ts = trits.toIndexedSeq
    val n = ts.length
    var gStart = 0
    while (gStart < n) {
      val g = if (gStart == 0 && n % RadixTrits != 0) n % RadixTrits else RadixTrits
      var gv = 0L
      var k = gStart
      while (k < gStart + g) { gv = gv * 3 + ts(k); k += 1 }
      var mult = 1L
      var c = 0
      while (c < g) { mult *= 3; c += 1 }
      var carry = gv
      var j = 0
      while (j < used) {
        val cur = (limbs(j) & 0xffffffffL) * mult + carry
        limbs(j) = cur.toInt
        carry = cur >>> 32
        j += 1
      }
      while (carry != 0) {
        if (used == limbs.length) limbs = java.util.Arrays.copyOf(limbs, used * 2)
        limbs(used) = carry.toInt
        carry = carry >>> 32
        used += 1
      }
      gStart += g
    }
    // little-endian limbs → big-endian bytes, minimal width
    val bytes = new Array[Byte](used * 4)
    var j = 0
    while (j < used) {
      val v = limbs(j)
      val base = bytes.length - 4 * j
      bytes(base - 1) = v.toByte
      bytes(base - 2) = (v >>> 8).toByte
      bytes(base - 3) = (v >>> 16).toByte
      bytes(base - 4) = (v >>> 24).toByte
      j += 1
    }
    val byteLength = math.max(1, targetLengthBytes)
    val raw = bytes.dropWhile(_ == 0) match {
      case a if a.isEmpty => Array[Byte](0)
      case a              => a
    }
    val data =
      if (raw.length < byteLength)
        Array.fill[Byte](byteLength - raw.length)(0) ++ raw
      else raw
    if (data.length < targetLengthBytes)
      Array.fill[Byte](targetLengthBytes - data.length)(0) ++ data
    else if (data.length > targetLengthBytes && targetLengthBytes > 0)
      data.takeRight(targetLengthBytes)
    else data
  }

  /** Bit-string → trits (legacy path, `dna_encoding.py:78-104`; dead on
    * the reference pipeline but part of its public codec surface).
    */
  def binaryToTrits(binaryString: String): Array[Int] = {
    var value = BigInt(binaryString, 2)
    if (value == 0) return Array(0)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (value > 0) {
      buf += (value % 3).toInt
      value /= 3
    }
    buf.reverseIterator.toArray
  }

  /** Trits → bit-string, zero-filled to `targetBitLength` when given
    * (`dna_encoding.py:106-130`).
    */
  def tritsToBinary(trits: Seq[Int], targetBitLength: Int = -1): String = {
    var value = BigInt(0)
    trits.foreach(t => value = value * 3 + t)
    val s = value.toString(2)
    if (targetBitLength > 0 && s.length < targetBitLength)
      ("0" * (targetBitLength - s.length)) + s
    else s
  }
}
