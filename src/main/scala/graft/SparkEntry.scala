package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Bpe, Bq, Dedup, DnaPipeline, Embeddings, Lexical, Multimodal, Pca, Pq, Relational, Similarity, Sq, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator module's named queries;
  * `oracleSql` carries the DuckDB-equivalent SQL for each (omitted for
  * non-SQL-expressible operators, which get a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ DnaPipeline.queries ++
      TextAnalysis.queries ++ Dedup.queries ++ Similarity.queries ++
      Multimodal.queries ++ Embeddings.queries ++ Pq.queries ++ Sq.queries ++ Pca.queries ++
      Bpe.queries ++ Bq.queries ++ Lexical.queries ++
      graft.sources.ClusteredLayout.queries ++ graft.sources.Formats.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ DnaPipeline.oracles ++
      TextAnalysis.oracles ++ Dedup.oracles ++ Similarity.oracles ++
      Multimodal.oracles ++ Embeddings.oracles ++ Pq.oracles ++ Sq.oracles ++ Bq.oracles ++
      Lexical.oracles ++ graft.sources.ClusteredLayout.oracles ++
      graft.sources.Formats.oracles

  /** Oracles whose SQL embeds deterministically-TRAINED state (the IVF
    * centroids) as literals, so they must be rendered against the
    * corpus being verified rather than compiled in. Verify merges these
    * over [[oracleSql]]; everything downstream of training is
    * recomputed independently by DuckDB (see Similarity's dynamic-
    * oracle note).
    */
  def dynamicOracleSql(spark: SparkSession, sfDir: String): Map[String, String] =
    Similarity.dynamicOracles(spark, sfDir) ++
      Dedup.dynamicOracles(spark, sfDir) ++ Pq.dynamicOracles(spark, sfDir) ++
      Sq.dynamicOracles(spark, sfDir) ++
      Pca.dynamicOracles(spark, sfDir) ++ Bpe.dynamicOracles(spark, sfDir)
}
