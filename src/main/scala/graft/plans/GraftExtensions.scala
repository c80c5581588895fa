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

  /** (name, info, builder) triples for every engine SQL function. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("dna_encode"),
        new ExpressionInfo(classOf[DnaEncode].getName, "dna_encode"),
        (args: Seq[Expression]) => DnaEncode(args.head)),
      (FunctionIdentifier("dna_decode"),
        new ExpressionInfo(classOf[DnaDecode].getName, "dna_decode"),
        (args: Seq[Expression]) => DnaDecode(args(0), args(1))),
      (FunctionIdentifier("vector_dot"),
        new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
        (args: Seq[Expression]) => VectorDot(args(0), args(1))),
      (FunctionIdentifier("vector_norm"),
        new ExpressionInfo(classOf[VectorNorm].getName, "vector_norm"),
        (args: Seq[Expression]) => VectorNorm(args.head)),
      (FunctionIdentifier("packed_pairs"),
        new ExpressionInfo(classOf[PackedPairs].getName, "packed_pairs"),
        (args: Seq[Expression]) => PackedPairs(args.head)),
      (FunctionIdentifier("minhash_sig"),
        new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
        (args: Seq[Expression]) => MinhashSig(args.head)),
      (FunctionIdentifier("ngram_hashes"),
        new ExpressionInfo(classOf[NgramHashes].getName, "ngram_hashes"),
        (args: Seq[Expression]) => args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) =>
            NgramHashes(args(0), n)
          case other => throw new IllegalArgumentException(
            s"ngram_hashes: n must be an integer literal, got $other")
        }),
      (FunctionIdentifier("dna_process"),
        new ExpressionInfo(classOf[DnaProcess].getName, "dna_process"),
        (args: Seq[Expression]) => {
          def intLit(e: Expression, name: String): Int = e match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"dna_process: $name must be an integer literal, got $other")
          }
          DnaProcess(args(0), intLit(args(1), "chunk_size"), intLit(args(2), "nsym"))
        }))

  /** Late registration into an existing session's function registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
