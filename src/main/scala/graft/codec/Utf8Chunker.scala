package graft.codec

import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}
import java.nio.ByteBuffer

/** UTF-8-safe fixed-size chunker.
  *
  * Semantics match the reference (`plugins/utils/dna_encoding.py:282-305`):
  * split the UTF-8 byte stream into slices of at most `maxBytes`
  * (minimum 1), backing the cut off so no code point is split; if even a
  * 1-byte slice can't align (a code point longer than `maxBytes`), force
  * exactly 1 byte forward — the downstream validator then rejects the
  * file, as the reference's strict `.decode('utf-8')` would.
  *
  * Note the README claims word-aware splitting (`README.md:36`) but the
  * code is only code-point-aware; we implement the code's semantics.
  */
object Utf8Chunker {

  /** (start, end) byte offsets of each chunk, end-exclusive. */
  def chunkOffsets(utf8Bytes: Array[Byte], chunkSize: Int): Seq[(Int, Int)] = {
    val maxBytes = math.max(1, chunkSize)
    val n = utf8Bytes.length
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var start = 0
    while (start < n) {
      var end = math.min(start + maxBytes, n)
      // back off while the byte AT the cut is a UTF-8 continuation byte
      // (equivalent to the reference's decode-retry loop on valid input)
      while (end > start && end < n && (utf8Bytes(end) & 0xc0) == 0x80)
        end -= 1
      if (end <= start) end = start + 1 // force ≥1 byte (dna_encoding.py:300-304)
      out += ((start, end))
      start = end
    }
    out.toSeq
  }

  /** Chunk a string into UTF-8 byte slices of at most `chunkSize`
    * bytes. Null text chunks as the empty file (the
    * null-doc-is-empty-file contract of DnaPipeline.discover).
    */
  def chunkBytes(text: String, chunkSize: Int): Seq[Array[Byte]] = {
    val bytes = (if (text == null) "" else text).getBytes(StandardCharsets.UTF_8)
    chunkOffsets(bytes, chunkSize).map { case (s, e) => bytes.slice(s, e) }
  }

  /** Strict UTF-8 decode: None on malformed input (mirrors Python's
    * raising `.decode('utf-8')`, unlike Java's default replacement).
    */
  def decodeStrict(bytes: Array[Byte]): Option[String] =
    try {
      val decoder = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      Some(decoder.decode(ByteBuffer.wrap(bytes)).toString)
    } catch {
      case _: CharacterCodingException => None
    }
}
