package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Primitive-loop vector kernels for the similarity operators.
  *
  * Why UDFs and not `zip_with`/`aggregate`: Catalyst evaluates
  * higher-order functions interpretively, allocating per element; a
  * tight `while` loop over the backing arrays is ~10× faster at the
  * 4M-pair scale of the near-dup join and keeps identical left-to-right
  * double accumulation (so results stay bit-equal to the DuckDB
  * oracle's `list_sum(list_transform(...))`).
  */
object VectorFunctions {

  private def dotLoop(a: Seq[Float], b: Seq[Float]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  /** Σ aᵢ·bᵢ in double precision, left-to-right. */
  val dot = udf { (a: Seq[Float], b: Seq[Float]) => dotLoop(a, b) }

  /** √(Σ aᵢ²) — the per-vector factor of cosine similarity; compute it
    * once per vector, not once per pair.
    */
  val norm = udf { (a: Seq[Float]) => math.sqrt(dotLoop(a, a)) }

  /** Cosine from a precomputed pair dot and per-side norms; division
    * order matches the oracle's `dot / SQRT(na) / SQRT(nb)`.
    */
  def cosineFrom(dotCol: Column, normA: Column, normB: Column): Column =
    dotCol / normA / normB
}
