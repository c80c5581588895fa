package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point: registers the native codec expressions as
  * SQL functions. Install at session build time with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`; for an already-running
  * session use [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** Wraps a builder with an arity check so a wrong-arg-count SQL call
    * fails with the function's signature instead of a raw
    * IndexOutOfBounds from `args(i)`.
    */
  private def arity(sig: String, n: Int)(b: Seq[Expression] => Expression)
      : Seq[Expression] => Expression =
    args => {
      if (args.length != n) throw new IllegalArgumentException(
        s"$sig expects $n argument(s), got ${args.length}")
      b(args)
    }

  /** (name, info, builder) triples for every engine SQL function. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("dna_encode"),
        new ExpressionInfo(classOf[DnaEncode].getName, "dna_encode"),
        arity("dna_encode(bytes)", 1)(args => DnaEncode(args.head))),
      (FunctionIdentifier("dna_decode"),
        new ExpressionInfo(classOf[DnaDecode].getName, "dna_decode"),
        arity("dna_decode(dna, width)", 2)(args => DnaDecode(args(0), args(1)))),
      (FunctionIdentifier("vector_dot"),
        new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
        arity("vector_dot(a, b)", 2)(args => VectorDot(args(0), args(1)))),
      (FunctionIdentifier("vector_norm"),
        new ExpressionInfo(classOf[VectorNorm].getName, "vector_norm"),
        arity("vector_norm(a)", 1)(args => VectorNorm(args.head))),
      (FunctionIdentifier("packed_pairs"),
        new ExpressionInfo(classOf[PackedPairs].getName, "packed_pairs"),
        arity("packed_pairs(ids)", 1)(args => PackedPairs(args.head))),
      (FunctionIdentifier("minhash_sig"),
        new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
        arity("minhash_sig(hashes)", 1)(args => MinhashSig(args.head))),
      (FunctionIdentifier("lsh_buckets"),
        new ExpressionInfo(classOf[LshBuckets].getName, "lsh_buckets"),
        arity("lsh_buckets(embedding, num_planes)", 2)(args => args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) =>
            LshBuckets(args(0), n)
          case other => throw new IllegalArgumentException(
            s"lsh_buckets: num_planes must be an integer literal, got $other")
        })),
      (FunctionIdentifier("ngram_hashes"),
        new ExpressionInfo(classOf[NgramHashes].getName, "ngram_hashes"),
        arity("ngram_hashes(text, n)", 2)(args => args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) =>
            NgramHashes(args(0), n)
          case other => throw new IllegalArgumentException(
            s"ngram_hashes: n must be an integer literal, got $other")
        })),
      (FunctionIdentifier("dna_process"),
        new ExpressionInfo(classOf[DnaProcess].getName, "dna_process"),
        arity("dna_process(text, chunk_size, nsym)", 3)(args => {
          def intLit(e: Expression, name: String): Int = e match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"dna_process: $name must be an integer literal, got $other")
          }
          DnaProcess(args(0), intLit(args(1), "chunk_size"), intLit(args(2), "nsym"))
        })))

  /** Late registration into an existing session's function registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
