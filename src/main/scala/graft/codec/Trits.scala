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

  /** Bytes → base-3 digits, most-significant trit first. */
  def bytesToTrits(data: Array[Byte]): Array[Int] = {
    if (data.isEmpty) return Array(0)
    var value = BigInt(1, data) // unsigned big-endian
    if (value == 0) return Array(0)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
    val three = BigInt(3)
    while (value > 0) {
      val (q, r) = value /% three
      buf += r.toInt
      value = q
    }
    buf.reverseIterator.toArray
  }

  /** Trits → fixed-width big-endian bytes (left-pad zeros / keep the
    * low-order `targetLengthBytes` bytes when wider).
    */
  def tritsToBytes(trits: Seq[Int], targetLengthBytes: Int): Array[Byte] = {
    var value = BigInt(0)
    trits.foreach(t => value = value * 3 + t)
    val byteLength = math.max(1, targetLengthBytes)
    val raw = value.toByteArray.dropWhile(_ == 0) match {
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
