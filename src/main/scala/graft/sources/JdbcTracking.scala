package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC parity for the reference's Postgres tracking table
  * (`init-scripts.sql:5-14`, probes `dags/dag.py:364-384`, upsert
  * `dags/dag.py:740-759`, status update `dags/dag.py:320-345`).
  *
  * The default deployment uses the parquet tracking table
  * (`FilePipeline`); this module exists for drop-in parity when the
  * tracking store must be the reference's own Postgres. No database
  * ships in this container, so these are compile-checked library
  * functions: reads go through `spark.read.jdbc` (predicate pushdown to
  * the indexed columns), writes through per-partition JDBC batches with
  * `ON CONFLICT (file_hash) DO NOTHING` — the reference's idempotent
  * insert, executed executor-side so a 1000-executor cluster doesn't
  * funnel inserts through the driver.
  */
object JdbcTracking {

  val Table = "processed_files"

  private def props(user: String, password: String): Properties = {
    val p = new Properties()
    p.setProperty("user", user)
    p.setProperty("password", password)
    p.setProperty("driver", "org.postgresql.Driver")
    p
  }

  /** S5: the tracking relation; Catalyst pushes `file_hash = x`
    * predicates down to the B-tree-indexed column.
    */
  def read(spark: SparkSession, url: String, user: String, password: String): DataFrame =
    spark.read.jdbc(url, Table, props(user, password))

  /** S5: `SELECT COUNT(*) FROM processed_files [WHERE file_hash=?]`
    * (`dags/dag.py:364-384`) — pushdown-friendly form.
    */
  def processedCount(spark: SparkSession, url: String, user: String,
      password: String, fileHash: Option[String] = None): Long = {
    val df = read(spark, url, user, password)
    fileHash.fold(df)(h => df.filter(df("file_hash") === h)).count()
  }

  /** S9: idempotent executor-side upsert of (file_hash, file_path,
    * file_size, status, output_file) rows — `ON CONFLICT DO NOTHING`
    * keeps content-addressed exactly-once (`dags/dag.py:740-759`).
    * Call from `foreachBatch`.
    */
  def upsert(batch: DataFrame, url: String, user: String, password: String): Unit = {
    val sql =
      s"""INSERT INTO $Table (file_hash, file_path, file_size, status, output_file)
          VALUES (?, ?, ?, ?, ?) ON CONFLICT (file_hash) DO NOTHING"""
    batch.select("file_hash", "file_path", "file_size", "status", "output_file")
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val conn = DriverManager.getConnection(url, user, password)
        try {
          conn.setAutoCommit(false)
          val st = conn.prepareStatement(sql)
          rows.foreach { r =>
            st.setString(1, r.getString(0))
            st.setString(2, r.getString(1))
            st.setLong(3, r.getLong(2))
            st.setString(4, r.getString(3))
            st.setString(5, if (r.isNullAt(4)) null else r.getString(4))
            st.addBatch()
          }
          st.executeBatch()
          conn.commit()
        } finally conn.close()
      }
  }

  /** S11: `UPDATE ... SET status=?, processed_at=NOW() WHERE
    * file_hash=?` (`dags/dag.py:320-345`).
    */
  def updateStatus(batch: DataFrame, url: String, user: String, password: String): Unit =
    batch.select("file_hash", "status")
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val conn = DriverManager.getConnection(url, user, password)
        try {
          conn.setAutoCommit(false)
          val st = conn.prepareStatement(
            s"UPDATE $Table SET status = ?, processed_at = NOW() WHERE file_hash = ?")
          rows.foreach { r =>
            st.setString(1, r.getString(1))
            st.setString(2, r.getString(0))
            st.addBatch()
          }
          st.executeBatch()
          conn.commit()
        } finally conn.close()
      }
}
