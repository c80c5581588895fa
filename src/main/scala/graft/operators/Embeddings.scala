package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Embedding-table analytics beyond similarity search: per-label
  * centroids (the feature-averaging shape of training-data curation)
  * and corpus-wide n-gram frequency (the wordcount-at-scale shape).
  *
  * Centroids via posexplode → groupBy(label, dim) → avg: one shuffle
  * keyed by (label, dim) with full map-side combine — at 100 TB this
  * is the canonical way to average wide vectors without building a
  * per-executor dense accumulator of every label.
  */
object Embeddings {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-label, per-dimension centroid — rounded in both engines.
    "emb_centroids" -> { (s, d) =>
      import s.implicits._
      Tables.embeddings(s, d)
        .select($"label", posexplode($"embedding").as(Seq("dim", "v")))
        .groupBy($"label", $"dim")
        .agg(round(avg($"v".cast("double")), 6).as("centroid_v"),
          count(lit(1)).as("n_vecs"))
    },

    // Corpus-wide top word-3-grams by document frequency, deterministic
    // tiebreak on the gram text.
    "txt_top_ngrams" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select(explode(Dedup.shingles($"text")).as("gram"))
        .groupBy($"gram").agg(count(lit(1)).as("doc_freq"))
        .orderBy($"doc_freq".desc, $"gram".asc)
        .limit(20)
    },

    // kNN label vote: each query vector takes the majority label of
    // its 5 nearest neighbors (ties → lowest label) — the classic
    // embedding-space classifier used for quality/topic propagation
    // over an unlabeled corpus. Composes the brute-force top-k with a
    // label join + vote; swap in the IVF/LSH probe for the same vote
    // at corpus scale.
    "emb_knn_label" -> { (s, d) =>
      import s.implicits._
      val nn = Similarity.topkBruteForce(s, d)
      val lab = Tables.embeddings(s, d).select($"vec_id".as("n_id"), $"label")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"votes".desc, $"label".asc)
      nn.join(lab, "n_id")
        .groupBy($"q_id", $"label").agg(count(lit(1)).as("votes"))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" === 1)
        .select($"q_id", $"label".as("knn_label"), $"votes")
    },

    // Symmetric int8 quantization — the 4× storage/bandwidth lever of
    // corpus-scale vector search: per vector, scale = max|x|/127 and
    // q_i = clamp(round(x_i/scale), ±127). Pure row-local map, zero
    // shuffle; at 100 TB the quantized table IS the stored index and
    // full-precision vectors page in only for re-ranking. Declared as
    // exploded scalar rows (the emb_project pattern); rounding is
    // floor(x+0.5) in BOTH engines (Spark round() and DuckDB round()
    // disagree on half-away-from-zero for negatives), and the scale
    // column is the bit-equal double amax/127 on both sides.
    "emb_quantize" -> { (s, d) =>
      import s.implicits._
      Tables.embeddings(s, d)
        .select($"vec_id", $"embedding",
          array_max(transform($"embedding", x => abs(x.cast("double"))))
            .as("amax"))
        .select($"vec_id", $"amax",
          posexplode($"embedding").as(Seq("dim", "v")))
        .select($"vec_id", $"dim".cast("int").as("dim"),
          when($"amax" === 0d, lit(0L)).otherwise(
            greatest(lit(-127L), least(lit(127L),
              floor($"v".cast("double") / ($"amax" / 127.0d) + 0.5d))))
            .cast("int").as("qv"),
          ($"amax" / 127.0d).as("scale"))
    },

    // Johnson–Lindenstrauss random projection 64 → 16 dims: the cheap
    // transform that makes downstream ANN / clustering 4× narrower at
    // corpus scale (project once, store, search in the small space).
    // Seeded literal planes (like Similarity.planes) so every executor
    // and every rerun computes identical projections; a narrow pure
    // map, no shuffle. Declared query emits exploded scalar rows
    // (vec_id, dim, pv) — the driver's compare requires hashable
    // columns — and is fully oracled: the seeded matrix is embedded in
    // the DuckDB SQL as a literal, so both engines run the identical
    // double accumulation and float cast.
    "emb_project" -> { (s, d) =>
      import s.implicits._
      project(s, d)
        .select($"vec_id", posexplode($"proj").as(Seq("dim", "pv")))
        .select($"vec_id", $"dim", round($"pv".cast("double"), 6).as("pv"))
    })

  /** Library form of the JL projection: (vec_id, proj array<float>). */
  def project(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d)
      .select($"vec_id", projectUdf($"embedding").as("proj"))
  }

  /** Projection target dimension. */
  val ProjDim = 16

  /** Seeded Gaussian projection matrix, scaled 1/√k so expected squared
    * norms are preserved (JL). Literal data: compiled identically on
    * every executor, zero closure shipping.
    */
  lazy val projPlanes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(ProjDim, Similarity.Dim)(rnd.nextGaussian() / math.sqrt(ProjDim))
  }

  /** The projection matrix as a DuckDB list-of-lists literal, so the
    * oracle runs the *same* seeded matrix. Double.toString is the
    * shortest round-trip decimal: DuckDB parses it back to the
    * identical 64-bit value, keeping the double accumulation
    * bit-equal on both sides.
    */
  lazy val projMatrixSql: String =
    projPlanes.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")

  val projectUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (emb: Seq[Float]) =>
      val ps = projPlanes
      val out = new Array[Float](ps.length)
      var k = 0
      while (k < ps.length) {
        val p = ps(k)
        var acc = 0.0
        var i = 0
        val n = math.min(emb.length, p.length)
        while (i < n) { acc += emb(i) * p(i); i += 1 }
        out(k) = acc.toFloat
        k += 1
      }
      out.toSeq
    }

  private val sqlToks =
    "list_filter(regexp_split_to_array(text, '\\s+'), t -> len(t) > 0)"

  val oracles: Map[String, String] = Map(
    // constant 1..64 series (DuckDB can't lateral-join generate_series
    // on a column; 64 = the corpus dim ceiling, TESTDATA.md), BOUNDED
    // by each vector's own length so a shorter vector emits
    // len(embedding) rows — exactly the Spark side's posexplode —
    // instead of padding NULL-qv rows out to 64
    "emb_quantize" ->
      """WITH b AS (SELECT vec_id, embedding,
           list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS amax
           FROM embeddings)
         SELECT vec_id, CAST(g.i - 1 AS INT) AS dim,
           CAST(CASE WHEN amax = 0 THEN 0 ELSE
             GREATEST(-127, LEAST(127,
               FLOOR(embedding[g.i]::DOUBLE / (amax / 127.0) + 0.5)))
           END AS INT) AS qv,
           amax / 127.0 AS scale
         FROM b, generate_series(1, 64) AS g(i)
         WHERE g.i <= len(embedding)""",
    "emb_centroids" ->
      """SELECT label, CAST(g.i - 1 AS INT) AS dim,
         ROUND(AVG(embedding[g.i]::DOUBLE), 6) AS centroid_v,
         COUNT(*) AS n_vecs
         FROM embeddings, generate_series(1, 64) AS g(i)
         GROUP BY label, g.i""",
    "txt_top_ngrams" ->
      s"""WITH toks AS (SELECT doc_id, $sqlToks t FROM documents),
          grams AS (SELECT doc_id, UNNEST(list_distinct(list_transform(
            generate_series(1, GREATEST(len(t) - 2, 0)),
            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS gram FROM toks)
          SELECT gram, COUNT(*) AS doc_freq FROM grams
          GROUP BY gram ORDER BY doc_freq DESC, gram ASC LIMIT 20""",
    // Identical seeded matrix as a SQL literal; CAST..AS REAL mirrors
    // the kernel's acc.toFloat, the outer DOUBLE cast + round mirrors
    // the Spark query's pv.cast(double). COALESCE pins the
    // empty/short-embedding case to the kernel's semantics (zero terms
    // summed → 0.0f; DuckDB list_sum over all-NULL products → NULL).
    "emb_project" ->
      s"""SELECT vec_id, CAST(g.k - 1 AS INT) AS dim,
          ROUND(CAST(CAST(COALESCE(list_sum(list_transform(generate_series(1, ${Similarity.Dim}),
            i -> embedding[i]::DOUBLE * m.p[g.k][i])), 0.0) AS REAL) AS DOUBLE), 6) AS pv
          FROM embeddings, (SELECT $projMatrixSql AS p) m,
            generate_series(1, $ProjDim) AS g(k)""",
    "emb_knn_label" -> {
      def cos(a: String, b: String) =
        s"""(list_sum(list_transform(generate_series(1, len($a)),
            i -> $a[i]::DOUBLE * $b[i]::DOUBLE))
          / SQRT(list_sum(list_transform(generate_series(1, len($a)),
            i -> $a[i]::DOUBLE * $a[i]::DOUBLE)))
          / SQRT(list_sum(list_transform(generate_series(1, len($b)),
            i -> $b[i]::DOUBLE * $b[i]::DOUBLE))))"""
      s"""WITH scored AS (
            SELECT q.vec_id AS q_id, c.vec_id AS n_id, c.label,
              ROUND(${cos("q.embedding", "c.embedding")}, 4) AS cos_sim
            FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
            WHERE q.vec_id % ${Similarity.QueryStride} = 0),
          ranked AS (
            SELECT q_id, label, ROW_NUMBER() OVER (
              PARTITION BY q_id ORDER BY cos_sim DESC, n_id ASC) AS rank
            FROM scored),
          votes AS (
            SELECT q_id, label, COUNT(*) AS votes FROM ranked
            WHERE rank <= ${Similarity.TopK} GROUP BY q_id, label)
          SELECT q_id, label AS knn_label, votes FROM (
            SELECT q_id, label, votes, ROW_NUMBER() OVER (
              PARTITION BY q_id ORDER BY votes DESC, label ASC) AS rk
            FROM votes) WHERE rk = 1"""
    })
}
