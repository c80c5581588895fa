package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Multi-format IO round trips — the engine-completeness box a user
  * switching engines actually checks: the same relation written and
  * read back through parquet, ORC, CSV, and JSON, with identical
  * aggregates out of every path. Columnar formats round-trip binary-
  * exactly; CSV and JSON serialize doubles through shortest-round-trip
  * decimal strings (Java/Jackson), which re-parse to the identical
  * bits — and the declared aggregates are ROUND(…, 2) anyway, the
  * cross-engine float convention. CSV reads back through the WRITTEN
  * schema (never inference — type inference on a 100 TB text pile is
  * both a scan and a correctness hazard); JSON likewise.
  */
object Formats {

  private case class Fmt(name: String,
    write: (DataFrame, String) => Unit,
    read: (SparkSession, org.apache.spark.sql.types.StructType, String) => DataFrame)

  private val fmts = Seq(
    Fmt("parquet", (df, p) => df.write.parquet(p), (s, _, p) => s.read.parquet(p)),
    Fmt("orc", (df, p) => df.write.orc(p), (s, _, p) => s.read.orc(p)),
    Fmt("csv", (df, p) => df.write.option("header", "true").csv(p),
      (s, sch, p) => s.read.schema(sch).option("header", "true").csv(p)),
    Fmt("json", (df, p) => df.write.json(p),
      (s, sch, p) => s.read.schema(sch).json(p)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fmt_roundtrip" -> { (s, d) =>
      import s.implicits._
      val slice = Tables.lineitem(s, d)
        .filter($"l_orderkey" % 97 === 0)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity",
          $"l_extendedprice", $"l_returnflag")
      val base = Similarity.storedQueryDir("fmt", d)
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      fmts.map { f =>
        val p = s"$base/${f.name}"
        f.write(slice, p)
        f.read(s, slice.schema, p)
          .agg(count(lit(1)).as("n_rows"),
            round(sum($"l_quantity"), 2).as("sum_qty"),
            round(sum($"l_extendedprice"), 2).as("sum_price"))
          .select(lit(f.name).as("fmt"), $"n_rows", $"sum_qty", $"sum_price")
      }.reduce(_.unionByName(_))
    }
  )

  val oracles: Map[String, String] = Map(
    "fmt_roundtrip" ->
      s"""WITH a AS (SELECT COUNT(*) AS n_rows,
            ROUND(SUM(l_quantity), 2) AS sum_qty,
            ROUND(SUM(l_extendedprice), 2) AS sum_price
          FROM lineitem WHERE l_orderkey % 97 = 0)
          SELECT fmt, n_rows, sum_qty, sum_price FROM a CROSS JOIN
            (SELECT unnest(['parquet', 'orc', 'csv', 'json']) AS fmt)"""
  )
}
