package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for a large-scale training-data pipeline
  * (builder brief; generalizes the reference's text handling,
  * `plugins/utils/dna_encoding.py:282-305` / `dags/dag.py:454-470`):
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * All operators are pure column expressions (whole-stage codegen'd, no
  * UDFs) so they stay narrow — one parquet scan, no shuffle, and they
  * scale linearly with input splits at 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokens of `text` (empty tokens dropped, so leading /
    * trailing / repeated whitespace can't produce phantom tokens).
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** BPE-ish subword segmentation: runs of letters, runs of digits, or a
    * single non-space symbol — the common pre-tokenizer regex shape.
    * Extraction (not split) so the pattern stays RE2-safe for the oracle.
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeishPattern), lit(0))

  /** English stopword set used by the language-ID heuristic and the
    * quality score's stopword ratio. Small and closed on purpose —
    * the heuristic must be reproducible in ANSI SQL for the oracle.
    */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
    "was", "for", "on", "with", "as", "at", "by", "it", "be", "this")

  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => t.isInCollection(Stopwords)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting: whitespace tokens + BPE-ish subword count +
    // distinct-token (type) count per document.
    "txt_tokens" -> { (s, d) =>
      import s.implicits._
      val toks = tokens($"text")
      Tables.documents(s, d).select(
        $"doc_id",
        size(toks).cast("long").as("n_tokens"),
        size(bpeishTokens($"text")).cast("long").as("n_bpeish"),
        size(array_distinct(toks)).cast("long").as("n_types"))
    },

    // Quality scoring: length, mean token length, stopword ratio,
    // alpha-char ratio, type/token ratio — the standard cheap filters
    // a pretraining pipeline runs before anything expensive.
    "txt_quality" -> { (s, d) =>
      import s.implicits._
      val toks = tokens($"text")
      val n = size(toks).cast("double")
      Tables.documents(s, d).select(
        $"doc_id",
        length($"text").cast("long").as("n_chars"),
        round(length(regexp_replace($"text", "[^A-Za-z]", "")) /
          greatest(length($"text"), lit(1)).cast("double"), 6).as("alpha_ratio"),
        round(aggregate(transform(toks, t => length(t)), lit(0),
          (acc, x) => acc + x).cast("double") / greatest(n, lit(1.0)), 6)
          .as("mean_token_len"),
        round(stopwordCount(toks) / greatest(n, lit(1.0)), 6).as("stopword_ratio"),
        round(size(array_distinct(toks)) / greatest(n, lit(1.0)), 6).as("type_token_ratio"))
    },

    // Language ID: closed-set stopword-density heuristic. Real
    // pipelines use char-n-gram models; the heuristic is deliberately
    // SQL-reproducible so the oracle can state it independently.
    "txt_langid" -> { (s, d) =>
      import s.implicits._
      val toks = tokens($"text")
      Tables.documents(s, d).select(
        $"doc_id",
        when(stopwordCount(toks) / greatest(size(toks), lit(1)).cast("double") >= 0.05,
          lit("en")).otherwise(lit("und")).as("pred_lang"),
        $"lang".as("true_lang"))
    },

    // The curation filter itself: documents passing the cheap quality
    // gates (the rows a pretraining pipeline would keep).
    "txt_quality_filter" -> { (s, d) =>
      import s.implicits._
      val toks = tokens($"text")
      val n = size(toks).cast("double")
      Tables.documents(s, d)
        .withColumn("alpha_ratio",
          length(regexp_replace($"text", "[^A-Za-z]", "")) /
            greatest(length($"text"), lit(1)).cast("double"))
        .withColumn("ttr", size(array_distinct(toks)) / greatest(n, lit(1.0)))
        .filter(length($"text") >= 100 && $"alpha_ratio" >= 0.7 && $"ttr" >= 0.2)
        .select($"doc_id", $"lang", length($"text").as("n_chars"))
    },

    // Document fingerprinting: md5 over the sorted distinct token set —
    // a canonical content fingerprint stable under token reordering
    // (the word-level analogue of the reference's content-hash dedup
    // key, dags/dag.py:454-463).
    "txt_fingerprint" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).select(
        $"doc_id",
        md5(to_binary(concat_ws(" ", array_sort(array_distinct(tokens($"text")))),
          lit("utf-8"))).as("token_set_fp"),
        md5(to_binary($"text", lit("utf-8"))).as("content_fp"))
    },

    // Sequence packing for pretraining: assign each document to the
    // fixed-token-budget pack its cumulative offset starts in, packing
    // WITHIN each (source, doc-range) shard. The shard key is what
    // makes the running sum scale: source alone has a handful of
    // values, which would funnel a 100 TB corpus through a few window
    // partitions — the ShardDocs doc-id range bounds every partition
    // regardless of corpus size (one shard covers all test-scale docs,
    // so outputs are unchanged there). Deterministic: doc_id order
    // within shard. pack_id restarts per shard, so the shard column is
    // part of the output key: a pack is (source, shard, pack_id) —
    // without it, packs from different shards of one source would
    // collide once the corpus exceeds ShardDocs.
    "txt_pack" -> { (s, d) =>
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source", $"shard").orderBy($"doc_id")
      Tables.documents(s, d)
        .select($"doc_id", $"source", size(tokens($"text")).as("n_tokens"),
          floor($"doc_id" / lit(ShardDocs.toDouble)).cast("long").as("shard"))
        .withColumn("cum", sum($"n_tokens").over(w))
        .select($"doc_id", $"source", $"shard", $"n_tokens",
          floor(($"cum" - $"n_tokens") / lit(PackTokens.toDouble)).cast("long")
            .as("pack_id"))
    },

    // Deterministic hash sampling — the staple curation subsample at
    // corpus scale: keep a document iff the leading hex byte of
    // md5(doc_id) sorts below the rate threshold ('1a' ≈ 26/256 ≈ 10%).
    // A pure pushdown-able filter: no shuffle, no RNG state, the SAME
    // subset on every engine, every rerun, and every partitioning —
    // the reproducibility property rand()-based sampling lacks, and
    // what makes train/eval splits auditable.
    "txt_sample_det" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .filter(substring(
          md5(to_binary($"doc_id".cast("string"), lit("utf-8"))), 1, 2)
          < SampleThreshold)
        .select($"doc_id", $"source", $"lang", length($"text").as("n_chars"))
    })

  /** Hex prefix bound for [[queries txt_sample_det]]: '1a' keeps hash
    * prefixes 00..19 = 26 of 256 ≈ 10.2% of documents.
    */
  val SampleThreshold = "1a"

  /** Token budget per training pack (txt_pack). */
  val PackTokens = 2048

  /** Documents per packing shard (txt_pack): bounds every window
    * partition to ShardDocs rows however large the corpus grows.
    */
  val ShardDocs = 100000L

  private val sqlToks = "list_filter(regexp_split_to_array(text, '\\s+'), t -> len(t) > 0)"
  private val sqlStop = Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  val oracles: Map[String, String] = Map(
    "txt_tokens" ->
      s"""SELECT doc_id,
          len($sqlToks) AS n_tokens,
          len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpeish,
          len(list_distinct($sqlToks)) AS n_types
          FROM documents""",
    "txt_quality" ->
      s"""SELECT doc_id,
          LENGTH(text) AS n_chars,
          ROUND(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE /
            GREATEST(LENGTH(text), 1), 6) AS alpha_ratio,
          ROUND(COALESCE(list_sum(list_transform($sqlToks, t -> len(t))), 0)::DOUBLE /
            GREATEST(len($sqlToks), 1), 6) AS mean_token_len,
          ROUND(len(list_filter($sqlToks, t -> list_contains($sqlStop, t)))::DOUBLE /
            GREATEST(len($sqlToks), 1), 6) AS stopword_ratio,
          ROUND(len(list_distinct($sqlToks))::DOUBLE /
            GREATEST(len($sqlToks), 1), 6) AS type_token_ratio
          FROM documents""",
    "txt_langid" ->
      s"""SELECT doc_id,
          CASE WHEN len(list_filter($sqlToks, t -> list_contains($sqlStop, t)))::DOUBLE /
            GREATEST(len($sqlToks), 1) >= 0.05
          THEN 'en' ELSE 'und' END AS pred_lang,
          lang AS true_lang
          FROM documents""",
    "txt_quality_filter" ->
      s"""SELECT doc_id, lang, LENGTH(text) AS n_chars FROM documents
          WHERE LENGTH(text) >= 100
            AND LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE /
              GREATEST(LENGTH(text), 1) >= 0.7
            AND len(list_distinct($sqlToks))::DOUBLE /
              GREATEST(len($sqlToks), 1) >= 0.2""",
    "txt_fingerprint" ->
      s"""SELECT doc_id,
          MD5(array_to_string(list_sort(list_distinct($sqlToks)), ' ')) AS token_set_fp,
          MD5(text) AS content_fp
          FROM documents""",
    "txt_sample_det" ->
      s"""SELECT doc_id, source, lang, LENGTH(text) AS n_chars FROM documents
          WHERE SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) < '$SampleThreshold'""",
    "txt_pack" ->
      s"""SELECT doc_id, source, shard, n_tokens,
          CAST(FLOOR((cum - n_tokens) / $PackTokens.0) AS BIGINT) AS pack_id
          FROM (SELECT doc_id, source, len($sqlToks) AS n_tokens,
            CAST(FLOOR(doc_id / $ShardDocs.0) AS BIGINT) AS shard,
            SUM(len($sqlToks)) OVER (
              PARTITION BY source, CAST(FLOOR(doc_id / $ShardDocs.0) AS BIGINT)
              ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM documents)""")
}
