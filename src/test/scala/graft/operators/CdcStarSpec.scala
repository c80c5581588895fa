package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** dedup_cdc_cluster's star reduction (r18): components of the
  * star∪short edge relation equal components of the FULL
  * shared-mass edge set E. Pinned against a naive driver-side
  * recomputation of E (the kernel's own chunker, full pair sums, no
  * reduction) on a directed fixture carrying every case the
  * equivalence proof distinguishes: a self-sufficient-chunk clique,
  * a pair qualifying on short-chunk sums alone, a mixed transitive
  * chain, and a sub-threshold non-edge. The DuckDB oracle re-proves
  * the same equivalence against an independent engine per fixture;
  * this spec is the directed, case-labeled form.
  */
class CdcStarSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Deterministic filler text with vocabulary disjoint per seed —
    * long enough that CDC cuts fall inside it, so shared passages
    * embedded in different contexts keep their interior chunks.
    */
  private def filler(seed: Int, n: Int): String =
    (0 until n).map(i => s"x${seed}w${i}q${(seed * 31 + i * 7) % 97}")
      .mkString(" ")

  test("star∪short components equal the full shared-mass components") {
    import spark.implicits._
    // a long duplicated passage (~400 chars: several chunks, some
    // self-sufficient at the 64-char expected length) shared by docs
    // 1, 2, 3 in different contexts — the clique→star case
    val longPassage = (0 until 55).map(i => s"alpha${i}beta${i * 3}").mkString(" ")
    // a shorter duplicated passage (~160 chars: interior chunks exist
    // but individually sub-threshold with high probability) shared by
    // docs 4 and 5 — the short-sum case rides these
    val shortPassage = (0 until 22).map(i => s"gm${i}dl${i * 5}").mkString(" ")
    // doc 5 also carries the long passage -> mixed transitive chain
    // {1,2,3} -- 5 -- 4 collapses into ONE component
    val docs = Seq(
      (1L, s"${filler(1, 30)} $longPassage ${filler(2, 30)}"),
      (2L, s"${filler(3, 30)} $longPassage ${filler(4, 30)}"),
      (3L, s"$longPassage ${filler(5, 60)}"),
      (4L, s"${filler(6, 30)} $shortPassage ${filler(7, 30)}"),
      (5L, s"${filler(8, 30)} $shortPassage $longPassage ${filler(9, 30)}"),
      (6L, filler(10, 80)),
      (7L, filler(11, 80)))
    val tmp = java.nio.file.Files.createTempDirectory("cdcstar").toString
    docs.toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"),
        lit("spec").as("source"), length($"text").cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    // naive driver-side E: full per-pair shared-mass sums over the
    // kernel's own chunks, DF-culled exactly as declared
    val chunksByDoc: Map[Long, Seq[(Long, Int)]] =
      docs.map { case (id, t) => id -> Dedup.cdcChunks(t).distinct }.toMap
    val df = chunksByDoc.values.flatten.groupBy(identity).view
      .mapValues(_.size).toMap
    val ids = docs.map(_._1)
    val fullE = for {
      a <- ids; b <- ids if a < b
      shared = (chunksByDoc(a).toSet intersect chunksByDoc(b).toSet)
        .filter(c => df(c) > 1 && df(c) <= Dedup.MaxCdcDf)
      if shared.toSeq.map(_._2.toLong).sum >= Dedup.CdcClusterMinChars
    } yield (a, b)
    // fixture sanity: the three proof cases are all present
    assert(fullE.contains((1L, 2L)) && fullE.contains((1L, 3L)),
      s"fixture: long-passage clique missing: $fullE")
    assert(fullE.contains((4L, 5L)),
      s"fixture: short-sum pair missing: $fullE")
    assert(fullE.contains((1L, 5L)) || fullE.contains((2L, 5L)) ||
      fullE.contains((3L, 5L)),
      s"fixture: mixed transitive link missing: $fullE")
    assert(!fullE.exists(p => p._1 == 6L || p._2 == 6L || p._1 == 7L ||
      p._2 == 7L), s"fixture: isolated docs must stay isolated: $fullE")
    // driver-side union-find over fullE
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    fullE.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // the declared query emits only docs in non-singleton components
    // (singletons carry no edge, hence no row from the CC kernel)
    val inEdges = fullE.flatMap(p => Seq(p._1, p._2)).toSet
    val expected = ids.filter(inEdges).map(i => i -> find(i)).toMap

    val got = Dedup.queries("dedup_cdc_cluster")(spark, tmp)
      .as[(Long, Long)].collect().toMap
    assert(got == expected,
      s"star-reduced components diverged from full-E components:\n" +
        s"got $got\nexpected $expected")
    // the reduction is real on this fixture: the long passage's
    // self-sufficient chunks ride the star path
    val edges = Dedup.cdcClusterEdges(spark, tmp)
      .as[(Long, Long)].collect()
    assert(edges.nonEmpty)
  }
}
