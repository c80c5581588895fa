package graft.codec

/** Goldman rotation-code DNA mapping — 1 base per trit, never repeating
  * the previous base, so encoded sequences contain no homopolymers.
  *
  * Semantics match the reference exactly
  * (`plugins/utils/dna_encoding.py:132-204`):
  *   - first trit maps over `{A,C,G}` only (`dna_encoding.py:151-153`);
  *   - subsequent trits map over the three bases ≠ previous, in
  *     `A,C,G,T` order (`dna_encoding.py:155-157`);
  *   - decode uppercases its input and maps unknown bases to trit 0
  *     (`dna_encoding.py:178-188`), still advancing `previous` to the
  *     unknown character itself (so a garbage base never matches the
  *     "minus previous" alphabet either).
  */
object Goldman {
  private val Bases = Array('A', 'C', 'G', 'T')

  def tritsToDna(trits: Seq[Int]): String = {
    if (trits.isEmpty) return ""
    val sb = new StringBuilder(trits.length)
    var previous: Char = 0
    var first = true
    trits.foreach { trit =>
      val base =
        if (first) Bases(trit % 3)
        else {
          // the three bases != previous, in A,C,G,T order
          var idx = trit % 3
          var i = 0
          var chosen: Char = 0
          while (chosen == 0 && i < 4) {
            if (Bases(i) != previous) {
              if (idx == 0) chosen = Bases(i)
              idx -= 1
            }
            i += 1
          }
          chosen
        }
      sb.append(base)
      previous = base
      first = false
    }
    sb.toString
  }

  def dnaToTrits(dna: String): Array[Int] = {
    val up = dna.toUpperCase
    val out = new Array[Int](up.length)
    var previous: Char = 0
    var first = true
    var i = 0
    while (i < up.length) {
      val base = up.charAt(i)
      val trit =
        if (first) base match {
          case 'A' => 0; case 'C' => 1; case 'G' => 2; case _ => 0
        }
        else {
          // index of base within (Bases minus previous); unknown → 0
          var idx = 0; var found = -1; var j = 0
          while (j < 4) {
            if (Bases(j) != previous) {
              if (Bases(j) == base) found = idx
              idx += 1
            }
            j += 1
          }
          if (found >= 0) found else 0
        }
      out(i) = trit
      previous = base
      first = false
      i += 1
    }
    out
  }

  /** Bytes → trits → DNA (`dna_encoding.py:196-199`). */
  def bytesToDna(data: Array[Byte]): String =
    tritsToDna(scala.collection.immutable.ArraySeq.unsafeWrapArray(
      Trits.bytesToTrits(data)))

  /** DNA → trits → fixed-width bytes (`dna_encoding.py:201-204`). */
  def dnaToBytes(dna: String, targetLengthBytes: Int): Array[Byte] =
    Trits.tritsToBytes(scala.collection.immutable.ArraySeq.unsafeWrapArray(
      dnaToTrits(dna)), targetLengthBytes)

  /** Adjacent-repeat check (`dna_encoding.py:223`); encode guarantees
    * this is false for every sequence it emits.
    */
  def hasHomopolymers(dna: String): Boolean = {
    var i = 0
    while (i + 1 < dna.length) {
      if (dna.charAt(i) == dna.charAt(i + 1)) return true
      i += 1
    }
    false
  }
}
