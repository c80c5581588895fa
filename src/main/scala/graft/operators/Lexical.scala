package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Stored lexical (postings) index — the BM25 side of the one-job-
  * builds / later-jobs-probe lifecycle the ANN families already have
  * (Similarity.writeLshIndex et al.). `txt_bm25_topk` recomputes term
  * frequencies from raw text on every call; at 100 TB the corpus is
  * tokenized ONCE and retrieval serves from a stored inverted index —
  * the Lucene/ES deployment shape, here as plain partitioned parquet:
  *
  *  - `postings/` — (term, doc_id, tf, dl), directory-partitioned by
  *    `pbucket = pmod(hash(term), PostingBuckets)` and sorted by
  *    (term, doc_id) inside each partition, so a query-term probe is
  *    PARTITION-PRUNED to its buckets and row-group-pruned to its
  *    terms (parquet min/max over the sorted term column). The doc
  *    length is DENORMALIZED into the posting row (one extra int per
  *    posting) so scoring never joins a corpus-sized doc-length
  *    relation: probe cost is ∝ matching postings, full stop.
  *  - `doclen/` — (doc_id, dl), the "doc length is a stored column
  *    computed at ingest" note on txt_bm25_topk made real; kept for
  *    append-time stats maintenance (and as the normalized source of
  *    truth for dl).
  *  - `stats/` — one row (n_docs, avgdl): the corpus constants BM25
  *    needs, broadcast at probe time.
  *
  * Per-term document frequency is NOT stored: the probe derives df
  * from its own pruned postings (exact — the postings for a term are
  * all of that term's docs), so appends can never leave a stale df
  * sidecar behind. Writes stage into a sibling directory and promote
  * via [[Similarity.swapDirInto]] (crash-safe, never a missing-index
  * window); appends add files inside the bucket directories and
  * refresh `stats/` from the OLD stats + the batch aggregate (O(batch),
  * no corpus rescan), same single-writer contract as the ANN appends.
  *
  * Reference behavior: AslaneMortreau/Airflow-Pipeline-Text-Processing
  * has no retrieval surface; BM25 per Robertson et al. (the Lucene
  * +1-IDF variant), constants shared with TextAnalysis.Bm25*.
  */
object Lexical {

  /** Term-hash directory fan-out. 64 buckets keeps sf-scale file
    * counts sane while giving a 3-term query a ≤3/64 partition read;
    * at 100 TB the knob grows with corpus vocabulary (buckets are
    * directories — cheap), the probe still reads |terms| buckets.
    */
  val PostingBuckets = 64

  private def bucketCol(term: org.apache.spark.sql.Column) =
    pmod(hash(term), lit(PostingBuckets))

  /** The pbucket values of `terms`, computed THROUGH the same Catalyst
    * hash the writer used (never a JVM-side reimplementation that
    * could drift from Murmur3's seed/width).
    */
  private def bucketsFor(s: SparkSession, terms: Seq[String]): Seq[Int] = {
    import s.implicits._
    terms.toDF("term").select(bucketCol($"term").cast("int")).distinct()
      .collect().map(_.getInt(0)).toSeq
  }

  /** (term, doc_id, tf, dl) for every document in `docs`. */
  private def postingsOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select($"doc_id", TextAnalysis.tokens($"text").as("toks"))
      .select($"doc_id", size($"toks").as("dl"), explode($"toks").as("term"))
      .groupBy($"term", $"doc_id", $"dl")
      .agg(count(lit(1)).as("tf"))
  }

  /** Build the stored index for the corpus under `d` at `outDir`. */
  def writeLexIndex(s: SparkSession, d: String, outDir: String): Unit = {
    import s.implicits._
    val staging = new org.apache.hadoop.fs.Path(outDir + "_staging")
    val fs = staging.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(staging, true)
    val post = postingsOf(Tables.documents(s, d))
      .withColumn("pbucket", bucketCol($"term"))
    // one exchange on pbucket lands each bucket in one task, whose
    // sortWithinPartitions gives parquet the sorted term column the
    // probe's row-group pruning relies on
    post.repartition($"pbucket")
      .sortWithinPartitions($"term", $"doc_id")
      .write.partitionBy("pbucket").parquet(s"$staging/postings")
    Tables.documents(s, d)
      .select($"doc_id", size(TextAnalysis.tokens($"text")).as("dl"))
      .write.parquet(s"$staging/doclen")
    // corpus stats from the doclen relation JUST WRITTEN — a 2-column
    // parquet scan, not a third tokenize pass over the raw text
    s.read.parquet(s"$staging/doclen")
      .agg(count(lit(1)).as("n_docs"), avg($"dl").as("avgdl"))
      .write.parquet(s"$staging/stats")
    Similarity.swapDirInto(s, staging, new org.apache.hadoop.fs.Path(outDir))
  }

  /** Append a document batch to a stored index. Postings/doclen files
    * land inside the existing layout (files-per-bucket grows by one
    * per append task — periodic rebuild is the defragmentation, the
    * ANN-append convention); `stats/` is refreshed from the old row +
    * the batch aggregate, O(batch), then swapped in crash-safe. Batch
    * doc_ids must be disjoint from the stored ones (content-addressed
    * upstream, the tracking-table convention). Single-writer.
    */
  def appendToLexIndex(s: SparkSession, indexDir: String,
      docs: DataFrame): Unit = {
    import s.implicits._
    postingsOf(docs)
      .withColumn("pbucket", bucketCol($"term"))
      .repartition($"pbucket")
      .sortWithinPartitions($"term", $"doc_id")
      .write.mode("append").partitionBy("pbucket")
      .parquet(s"$indexDir/postings")
    val dl = docs.select($"doc_id", size(TextAnalysis.tokens($"text")).as("dl"))
    dl.write.mode("append").parquet(s"$indexDir/doclen")
    val (bn, bsum) = dl.agg(count(lit(1)), sum($"dl"))
      .as[(Long, Option[Long])].head()
    val (n0, avg0) = s.read.parquet(s"$indexDir/stats")
      .as[(Long, Double)].head()
    val n1 = n0 + bn
    val avg1 = if (n1 == 0) 0.0 else (n0 * avg0 + bsum.getOrElse(0L)) / n1
    val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/stats_updating")
    Seq((n1, avg1)).toDF("n_docs", "avgdl")
      .write.mode("overwrite").parquet(tmp.toString)
    Similarity.swapDirInto(s, tmp,
      new org.apache.hadoop.fs.Path(s"$indexDir/stats"))
  }

  /** Top-[[TextAnalysis.Bm25K]] BM25 over the STORED index: partition-
    * pruned postings scan → df from the pruned rows → row-local score
    * contributions → one doc_id aggregate over matching rows only.
    * Identical output to `txt_bm25_topk` by construction (same math,
    * same rounding, same ordering), which is what lets the stored
    * query share that oracle string verbatim.
    */
  def topkBm25Stored(s: SparkSession, indexDir: String,
      terms: Seq[String] = TextAnalysis.Bm25QueryTerms): DataFrame = {
    import s.implicits._
    import TextAnalysis.{Bm25B, Bm25K, Bm25K1}
    val qb = bucketsFor(s, terms)
    val post = s.read.parquet(s"$indexDir/postings")
      .filter($"pbucket".isin(qb: _*) && $"term".isin(terms: _*))
      .select($"term", $"doc_id", $"tf", $"dl")
    val dfr = post.groupBy($"term").agg(count(lit(1)).as("df"))
    val stats = s.read.parquet(s"$indexDir/stats")
    val idf = log(($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5)) + lit(1.0))
    val denom = $"tf" + lit(Bm25K1) *
      (lit(1.0 - Bm25B) + lit(Bm25B) * $"dl" / $"avgdl")
    post.join(broadcast(dfr), Seq("term"))
      .crossJoin(broadcast(stats))
      .select($"doc_id", (idf * ($"tf" * lit(Bm25K1 + 1.0)) / denom).as("c"))
      .groupBy($"doc_id").agg(round(sum($"c"), 6).as("score"))
      .orderBy($"score".desc, $"doc_id".asc)
      .limit(Bm25K)
  }

  private def storedLexDir(d: String): String =
    Similarity.storedQueryDir("bm25", d)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The index build as its own bench line (the lsh_build
    // convention); the declared output is the TERM SUMMARY of the
    // WRITTEN postings — read back from disk, so the oracle row also
    // gates the parquet round trip — not the vocabulary-free internal
    // layout (pbucket is Murmur3, unverifiable in ANSI SQL; its
    // correctness is pinned by txt_bm25_topk_stored equaling the
    // fresh-scan oracle, which would lose postings if bucketing or
    // pruning mismatched).
    "bm25_build" -> { (s, d) =>
      import s.implicits._
      val dir = storedLexDir(d)
      writeLexIndex(s, d, dir)
      s.read.parquet(s"$dir/postings")
        .groupBy($"term")
        .agg(count(lit(1)).as("df"),
          sum($"tf").cast("long").as("tf_total"))
    },
    // Stored-probe round trip: write, then serve the fixed query from
    // the stored layout. Shares txt_bm25_topk's oracle verbatim.
    "txt_bm25_topk_stored" -> { (s, d) =>
      val dir = storedLexDir(d)
      writeLexIndex(s, d, dir)
      topkBm25Stored(s, dir)
    }
  )

  val oracles: Map[String, String] = Map(
    "bm25_build" ->
      s"""WITH tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM (
            SELECT doc_id, unnest(${TextAnalysis.sqlToks}) AS term
            FROM documents) GROUP BY doc_id, term)
          SELECT term, COUNT(*) AS df,
            CAST(SUM(tf) AS BIGINT) AS tf_total
          FROM tf GROUP BY term""",
    "txt_bm25_topk_stored" -> TextAnalysis.oracles("txt_bm25_topk")
  )
}
