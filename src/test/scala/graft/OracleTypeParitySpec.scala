package graft

import org.scalatest.funsuite.AnyFunSuite

/** Oracle OUTPUT-TYPE drift guard — the r14 near-miss class made
  * un-shippable: DuckDB widens SUM(BIGINT) to HUGEINT and windowed
  * SUMs to decimal128, so an uncast aggregate feeding an oracle output
  * column hash-mismatches the driver compare (int64 vs Decimal('160'))
  * even when every value is equal. `tools/check_oracle_types.py`
  * DESCRIBEs every static oracle over the sf0.001 tables (type
  * resolution only, no execution — cheap even for the O(n²)-shaped
  * oracles) and fails on any decimal-family output column; Spark-side
  * results are int64/double/string/binary/bool/list everywhere, so a
  * decimal column IS a missing CAST. Dynamic (trained-literal) oracles
  * follow the same SQL conventions and are swept by the full
  * check_oracle.py run each round (which now also value-level
  * type-checks via Arrow).
  *
  * Cancels (not fails) when python3+duckdb or the testdata fixture is
  * absent — those are driver-side-container facts, not repo facts.
  */
class OracleTypeParitySpec extends AnyFunSuite {

  test("no static oracle resolves a decimal/hugeint output column") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/documents.parquet").exists(),
      "testdata fixture not present")
    val duck = try {
      new ProcessBuilder("python3", "-c", "import duckdb")
        .start().waitFor() == 0
    } catch { case _: Throwable => false }
    assume(duck, "python3+duckdb not available")
    // same escaping as Verify's dump — control chars would break json.load
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    val f = java.nio.file.Files.createTempFile("oracle_sql", ".json")
    java.nio.file.Files.writeString(f, json)
    val p = new ProcessBuilder("python3", "tools/check_oracle_types.py",
      sfDir, f.toString).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor() == 0, s"oracle type guard failed:\n$out")
    assert(out.contains(" 0 bad "), out)
  }
}
