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
    },

    // Per-label embedding outlier gate — the "mislabeled / off-manifold
    // vector" triage of embedding-space curation: squared L2 distance
    // to the vector's own label centroid, flagged when strictly above
    // the label's p90. Scale shape mirrors txt_quality_gate: centroids
    // are the (label, dim)-keyed aggregation collapsed to a
    // labels-sized ARRAY relation broadcast back (never a window over
    // the corpus); the distance is a row-local ordered fold over the
    // dimension zip — identical accumulation order in both engines on
    // the 6-rounded centroids; and the p90 thresholds are a second
    // labels-keyed aggregation over the 5-rounded distances, broadcast
    // for the final filter. The dist relation is re-derived by each
    // consumer (threshold agg, final filter — the bm25 doc-length
    // convention; ReuseExchange collapses the duplicated centroid
    // broadcast at execution), so cost is a few corpus scans + the
    // (label, dim) exchange + tiny broadcasts — no corpus-keyed
    // shuffle, no vec_id-keyed re-aggregation. At deployment scale
    // dist2 would be a stored column computed once at ingest.
    "emb_outliers" -> { (s, d) =>
      import s.implicits._
      val cent = Tables.embeddings(s, d)
        .select($"label", posexplode($"embedding").as(Seq("dim", "v")))
        .groupBy($"label", $"dim")
        .agg(round(avg($"v".cast("double")), 6).as("c"))
        .groupBy($"label")
        .agg(transform(array_sort(collect_list(struct($"dim", $"c"))),
          x => x("c")).as("cent"))
      val dist = Tables.embeddings(s, d)
        .join(broadcast(cent), Seq("label"))
        .select($"vec_id", $"label",
          round(aggregate(
            zip_with($"embedding", slice($"cent", lit(1), size($"embedding")),
              (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
            lit(0.0), (a, v) => a + v), 5).as("dist2"))
      // thresh is deliberately UNROUNDED: the oracle restates Spark's
      // exact interpolation arithmetic ((hi−pos)·d_lo + (pos−lo)·d_hi,
      // verified bit-equal against Percentile's output), so both
      // engines hold the identical double — while ROUNDING it would
      // introduce a divergence, because the lerp of two 5-rounded
      // values lands on exact decimal .5 boundaries where Spark
      // (shortest-repr HALF_UP) and DuckDB (binary-value rounding)
      // disagree.
      val thr = dist.groupBy($"label")
        .agg(expr("percentile(dist2, 0.9)").as("thresh"))
      dist.join(broadcast(thr), Seq("label"))
        .filter($"dist2" > $"thresh")
        .select($"vec_id", $"label", $"dist2", $"thresh")
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
         ROUND(AVG(embedding[g.i]::DOUBLE), 6) + 0.0 AS centroid_v,
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
            i -> embedding[i]::DOUBLE * m.p[g.k][i])), 0.0) AS REAL) AS DOUBLE), 6) + 0.0 AS pv
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
              ROUND(${cos("q.embedding", "c.embedding")}, 4) + 0.0 AS cos_sim
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
    },
    // Centroids restated as the same rounded (label, dim) averages
    // (the emb_centroids convention), gathered into a dim-ordered
    // list; the distance fold runs over the vector's own length
    // (mirrors the Spark side's slice), and NULL-embedding rows are
    // dropped up front — exactly the Spark side's net behavior (NULL
    // dist2 is invisible to `percentile` and to the final filter),
    // where COALESCE-ing them to 0.0 would shift the label's
    // threshold. The p90 threshold does NOT use quantile_cont: its
    // interpolation drifts an ulp from Spark's `percentile` on some
    // inputs (algebraically equal, floating-point different). Instead
    // the oracle states Percentile's exact arithmetic on the sorted
    // distances — pos = 0.9·(n−1), lo = ⌊pos⌋,
    // thresh = (lo+1−pos)·d[lo] + (pos−lo)·d[lo+1] (the CONVEX form,
    // bit-verified against Spark), with Percentile's equal-keys early
    // return (d[lo] = d[lo+1] ⇒ thresh = d[lo] exactly — the convex
    // sum is NOT bit-stable on duplicated values). 0.9 must be cast
    // ::DOUBLE: DuckDB parses the bare literal as DECIMAL, whose
    // exact-decimal pos yields different interpolation weights than
    // Spark's double multiply. Same doubles, same ops, identical
    // 64-bit result — so thresh needs no rounding on either side.
    "emb_outliers" ->
      """WITH c AS (SELECT label, g.i AS i,
           ROUND(AVG(embedding[g.i]::DOUBLE), 6) AS c
           FROM embeddings, generate_series(1, 64) AS g(i)
           GROUP BY label, g.i),
         cl AS (SELECT label, list(c ORDER BY i) AS cent FROM c
           GROUP BY label),
         dist AS (SELECT e.vec_id, e.label,
             ROUND(COALESCE(list_sum(list_transform(
               generate_series(1, len(e.embedding)),
               i -> (e.embedding[i]::DOUBLE - cent[i]) *
                    (e.embedding[i]::DOUBLE - cent[i]))), 0.0), 5) AS dist2
           FROM embeddings e JOIN cl USING (label)
           WHERE e.embedding IS NOT NULL),
         srt AS (SELECT label, list(dist2 ORDER BY dist2) AS ds
           FROM dist GROUP BY label),
         t AS (SELECT label,
             CASE WHEN ds[LEAST(lo + 2, len(ds))] = ds[lo + 1]
               THEN ds[lo + 1]
               ELSE (lo + 1 - pos) * ds[lo + 1] +
                 (pos - lo) * ds[LEAST(lo + 2, len(ds))]
             END AS thresh
           FROM (SELECT label, ds, 0.9::DOUBLE * (len(ds) - 1) AS pos,
             CAST(FLOOR(0.9::DOUBLE * (len(ds) - 1)) AS BIGINT) AS lo
             FROM srt))
         SELECT vec_id, dist.label, dist2, thresh
         FROM dist JOIN t USING (label)
         WHERE dist2 > thresh""")
}
