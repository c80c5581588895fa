package graft.functions

import org.apache.spark.sql.Column

/** Primitive-loop vector kernels for the similarity operators.
  *
  * Why not `zip_with`/`aggregate`: Catalyst evaluates higher-order
  * functions interpretively, allocating per element; a tight `while`
  * loop is ~10× faster at the 4M-pair scale of the near-dup join.
  * `dot`/`norm` are native Catalyst expressions (SURVEY §4.2 phase-2):
  * the generated Java walks `ArrayData` in place, with none of the
  * Scala-UDF per-row Seq[Float] deserialization — and keeps identical
  * left-to-right double accumulation (so results stay bit-equal to
  * the previous UDF kernels and the DuckDB oracle's
  * `list_sum(list_transform(...))`).
  */
object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Σ aᵢ·bᵢ in double precision, left-to-right (codegen'd). */
  def dot(a: Column, b: Column): Column =
    column(graft.plans.VectorDot(expression(a), expression(b)))

  /** √(Σ aᵢ²) — the per-vector factor of cosine similarity; compute it
    * once per vector, not once per pair (codegen'd).
    */
  def norm(a: Column): Column =
    column(graft.plans.VectorNorm(expression(a)))

  /** Cosine from a precomputed pair dot and per-side norms; division
    * order matches the oracle's `dot / SQRT(na) / SQRT(nb)`.
    */
  def cosineFrom(dotCol: Column, normA: Column, normB: Column): Column =
    dotCol / normA / normB
}
