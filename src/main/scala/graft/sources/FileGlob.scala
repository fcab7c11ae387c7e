package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * File-glob listing — SURVEY §2.1 S5: the reference counts the bronze
 * bucket's files BEFORE reading them (`SELECT * FROM glob('s3://bronze/
 * *.parquet')`, `_init_duckdb.py:35`, `data_quality_check.py:43-45`) as a
 * cheap did-anything-land gate. The Spark twin lists via Hadoop
 * `FileSystem.globStatus` — the same FS abstraction every Spark scan uses,
 * so s3a/HDFS/local paths all work unchanged — and returns the listing AS
 * A DATAFRAME so the gate composes with the rest of a pipeline
 * (join/filter/count like any relation).
 *
 * Scale shape: the glob itself is a driver-side metadata call — exactly
 * what the reference does, and the right tool for its use (a file COUNT
 * gate over one bucket; object-store LIST calls are not data-plane work).
 * Spark's own scans do the same listing inside `InMemoryFileIndex`, going
 * distributed only past `spark.sql.sources.parallelPartitionDiscovery
 * .threshold` (32 dirs) — a many-prefix listing should simply read via
 * `spark.read` and let that machinery parallelize; this helper is the
 * pre-read GATE, not a data source.
 */
object FileGlob {

  /** One row per file matching `pattern`:
    * `(path, name, size_bytes, mod_time)` — empty frame (same schema) when
    * nothing matches, so downstream `count() == 0` is the no-data signal
    * (DuckDB's `glob()` likewise returns zero rows). Directories are
    * excluded: the gate counts FILES to read. */
  def listGlob(spark: SparkSession, pattern: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(pattern)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val statuses = Option(fs.globStatus(p))
      .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
    statuses.toSeq
      .filter(_.isFile)
      .map(s => (s.getPath.toString, s.getPath.getName, s.getLen,
        new java.sql.Timestamp(s.getModificationTime)))
      .toDF("path", "name", "size_bytes", "mod_time")
  }

  /** The reference's gate, composed: file count + total bytes of a glob. */
  def globSummary(spark: SparkSession, pattern: String): DataFrame =
    listGlob(spark, pattern)
      .agg(count(lit(1)).as("n_files"),
        coalesce(sum(col("size_bytes")), lit(0L)).as("total_bytes"))
}
