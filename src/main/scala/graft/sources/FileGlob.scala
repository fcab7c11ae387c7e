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
 * Scale shape: a glob is a metadata call — object-store LIST, not
 * data-plane work. It still runs INSIDE the plan (a one-task
 * `mapPartitions`, r7 review): the listing is lazy and re-executes with
 * every action over a shuffle-free frame, so a bench pass pays the real
 * listing like any other stage. A POLLING gate should rebuild the frame
 * per poll: Spark reuses a computed shuffle map stage when the same
 * Dataset object is re-collected, so an aggregated summary held across
 * polls would serve the first listing forever. Spark's own scans do the
 * equivalent inside `InMemoryFileIndex`,
 * going distributed past `spark.sql.sources.parallelPartitionDiscovery
 * .threshold` — a many-prefix listing should simply read via `spark.read`
 * and let that machinery parallelize; this helper is the pre-read GATE,
 * not a data source.
 */
object FileGlob {

  /** One row per filesystem entry matching `pattern`:
    * `(path, name, is_dir, size_bytes, mod_time)` — empty frame (same
    * schema) when nothing matches, so downstream `count() == 0` is the
    * no-data signal (DuckDB's `glob()` likewise returns zero rows).
    * Directories are INCLUDED with their recursive content size (r7
    * review): Spark-written datasets name `*.parquet` entries as
    * DIRECTORIES of part files (e.g. a bronzeSink output), and a gate that
    * skipped them would report "no data" on a fully landed corpus. */
  def listGlob(spark: SparkSession, pattern: String): DataFrame = {
    import spark.implicits._
    // the session's Hadoop conf, flattened to a serializable map so the
    // executor-side task can rebuild the right FileSystem (s3a creds etc.)
    val confEntries: Map[String, String] = {
      val c = spark.sessionState.newHadoopConf()
      val b = Map.newBuilder[String, String]
      val it = c.iterator()
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    spark.createDataset(Seq(pattern))
      .mapPartitions { pats =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        pats.flatMap { pat =>
          val p = new org.apache.hadoop.fs.Path(pat)
          val fs = p.getFileSystem(conf)
          Option(fs.globStatus(p))
            .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
            .iterator.map { s =>
              val size =
                if (s.isDirectory) fs.getContentSummary(s.getPath).getLength
                else s.getLen
              (s.getPath.toString, s.getPath.getName, s.isDirectory, size,
                new java.sql.Timestamp(s.getModificationTime))
            }
        }
      }
      .toDF("path", "name", "is_dir", "size_bytes", "mod_time")
  }

  /** The reference's gate, composed: file count + total bytes of a glob. */
  def globSummary(spark: SparkSession, pattern: String): DataFrame =
    listGlob(spark, pattern)
      .agg(count(lit(1)).as("n_files"),
        coalesce(sum(col("size_bytes")), lit(0L)).as("total_bytes"))
}
