package graft.codec

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** One DNA chunk with its metadata — mirrors the reference dataclass
  * (`plugins/utils/dna_encoding.py:14-24`). `originalBinary` is always
  * empty on the pipeline path (`dna_encoding.py:322`).
  */
case class DnaChunk(
    chunkId: String,
    index: Int,
    dnaSequence: String,
    originalBinary: String,
    originalLengthBytes: Int,
    errorCorrectionCode: Array[Byte],
    checksum: String,
    chunkSize: Int)

/** The per-file encode → validate → reconstruct pipeline as pure
  * functions (no Spark dependency), mirroring the reference processor
  * (`plugins/utils/dna_encoding.py:270-398, 416-476`).
  */
object DnaCodec {

  def md5Hex(bytes: Array[Byte]): String = {
    val d = MessageDigest.getInstance("MD5").digest(bytes)
    d.map(b => f"${b & 0xff}%02x").mkString
  }

  /** Null text is an empty file to this codec (the
    * null-doc-is-empty-file contract of DnaPipeline.discover) — the
    * codec stays total even when called outside the coalescing
    * pipeline entry.
    */
  def md5HexUtf8(text: String): String =
    md5Hex((if (text == null) "" else text).getBytes(StandardCharsets.UTF_8))

  /** Split text into UTF-8-safe chunks, each carrying RS parity, an MD5
    * checksum of its original bytes, and its Goldman DNA sequence
    * (`dna_encoding.py:270-335`).
    */
  def createDnaChunks(text: String, chunkSize: Int = 1000,
      errorCorrectionSymbols: Int = 10): Seq[DnaChunk] =
    Utf8Chunker.chunkBytes(text, chunkSize).zipWithIndex.map {
      case (chunkBytes, index) =>
        DnaChunk(
          chunkId = f"dna_chunk_$index%03d",
          index = index,
          dnaSequence = Goldman.bytesToDna(chunkBytes),
          originalBinary = "",
          originalLengthBytes = chunkBytes.length,
          errorCorrectionCode = ReedSolomon.parity(chunkBytes, errorCorrectionSymbols),
          checksum = md5Hex(chunkBytes),
          chunkSize = chunkBytes.length)
    }

  /** Decode a chunk's DNA back to its original bytes. */
  def chunkBytesOf(chunk: DnaChunk): Array[Byte] =
    Goldman.dnaToBytes(chunk.dnaSequence, chunk.originalLengthBytes)

  /** Decode + strict-UTF-8 + checksum validation
    * (`dna_encoding.py:371-398`).
    */
  def validateChunkIntegrity(chunk: DnaChunk): Boolean = {
    val bytes = chunkBytesOf(chunk)
    Utf8Chunker.decodeStrict(bytes).isDefined && md5Hex(bytes) == chunk.checksum
  }

  /** Sort by index, decode each chunk, concatenate
    * (`dna_encoding.py:337-369`). Throws on undecodable chunks like the
    * reference.
    */
  def reconstructText(chunks: Seq[DnaChunk]): String =
    chunks.sortBy(_.index).map { c =>
      Utf8Chunker.decodeStrict(chunkBytesOf(c)).getOrElse(
        throw new IllegalStateException(s"chunk ${c.chunkId} is not valid UTF-8"))
    }.mkString

  /** Whole-file result — the reference's per-file report
    * (`dna_encoding.py:416-476`): chunk, validate every chunk, rebuild,
    * compare whole-file checksums.
    */
  case class FileResult(
      originalChecksum: String,
      reconstructedChecksum: String,
      dnaChunksCount: Int,
      totalDnaBases: Long,
      status: String,
      errorMessage: Option[String],
      chunks: Seq[DnaChunk])

  def processText(text: String, chunkSize: Int = 1000,
      errorCorrectionSymbols: Int = 10): FileResult = {
    val originalChecksum = md5HexUtf8(text)
    try {
      val chunks = createDnaChunks(text, chunkSize, errorCorrectionSymbols)
      // single decode pass: validate each chunk AND collect its decoded
      // text (the reference decodes twice — validate at :440-446, then
      // reconstruct at :449; SURVEY §3.2 marks this compute-once-reuse)
      val reconstructed = chunks.sortBy(_.index).map { c =>
        val bytes = chunkBytesOf(c)
        val decoded = Utf8Chunker.decodeStrict(bytes)
        if (decoded.isEmpty || md5Hex(bytes) != c.checksum)
          throw new IllegalStateException(s"invalid chunk: ${c.chunkId}")
        decoded.get
      }.mkString
      val reconstructedChecksum = md5HexUtf8(reconstructed)
      if (reconstructedChecksum != originalChecksum)
        throw new IllegalStateException("reconstruction checksum mismatch")
      FileResult(originalChecksum, reconstructedChecksum, chunks.length,
        chunks.map(_.dnaSequence.length.toLong).sum, "success", None, chunks)
    } catch {
      case e: Exception =>
        FileResult(originalChecksum, "", 0, 0L, "error", Some(e.getMessage), Nil)
    }
  }
}
