package graft.layout

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Physical table layout for scale: small-file compaction and bucketing.
 *
 * The reference's ingest writes one parquet file per 50-event micro-batch
 * (`consumer_to_minio.py:33`) — at 100 TB/day that is millions of files/day:
 * unbounded listing time, footer-read amplification, and scheduler pressure.
 * SURVEY §7.4.5 flags compaction as the deliberate deviation; this module is
 * that deviation.
 *
 * Bucketing pre-shuffles a table ONCE at write time so every later
 * equi-join/aggregation on the bucket key runs shuffle-free — the standard
 * trade for fact tables that are joined on the same key by many queries.
 */
object TableLayout {

  /**
   * Rewrite a directory of many small parquet files into ~targetBytes files.
   * Reads once, writes once; the repartition count is derived from actual
   * on-disk size. Output lands in `outDir` (callers swap directories
   * atomically — never compact in place).
   */
  def compactSmallFiles(spark: SparkSession, inDir: String, outDir: String,
                        targetBytes: Long = 128L << 20): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inDir), spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(inDir)).getLength
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir)
      .repartition(parts)
      .write.mode("overwrite").parquet(outDir)
    parts.toLong
  }

  /**
   * Write `df` as a bucketed+sorted managed table on `key`. Joins and
   * aggregations on `key` between tables bucketed with the same count then
   * plan WITHOUT an Exchange on either side (verified by `TableLayoutSpec`).
   */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 32): Unit =
    writeBucketed(df, table, Seq(key), buckets)

  /** Drop a managed table AND its warehouse location. `mode("overwrite")`
    * alone is not enough across JVM sessions: a table directory orphaned by
    * a previous session (catalog entry gone, files present) makes CREATE
    * fail with LOCATION_ALREADY_EXISTS.
    *
    * The location is resolved from the CATALOG while the entry still exists
    * (r11 review): guessing `warehouse/<name>` was wrong for db-qualified
    * names (`db.tbl` lives at `warehouse/<db>.db/tbl`) and non-default
    * current databases — the real directory survived the drop and the next
    * saveAsTable failed with exactly the error this method documents itself
    * as preventing. The default managed location is ALSO cleaned (computed
    * per-database) to cover the orphaned-directory case, where no catalog
    * entry exists to resolve from.
    *
    * EXTERNAL tables (r11 advice): only the catalog ENTRY is dropped — no
    * location is deleted, matching DROP TABLE semantics (an external
    * location is user data the drop must preserve). That includes the
    * default-managed-location sweep (r12 review): an external table may
    * legally be registered AT the default warehouse path, so the sweep
    * runs only when the table was MANAGED.
    *
    * `sweepOrphanDir` (r12 review, second pass): with NO catalog entry the
    * default-path directory is AMBIGUOUS — it may be a crashed session's
    * orphaned managed dir (the case the sweep exists for) or the preserved
    * data of an external table a PREVIOUS dropTable call deliberately kept
    * (an idempotent cleanup script calling dropTable twice would otherwise
    * delete on the second call what the first call promised to preserve).
    * Default FALSE: a bare drop never destroys ambiguous data. Callers
    * about to CREATE a managed table at that location pass true — there
    * the directory must go either way, or the create itself fails with
    * LOCATION_ALREADY_EXISTS. */
  def dropTable(spark: SparkSession, table: String,
                sweepOrphanDir: Boolean = false): Unit = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val meta = scala.util.Try(
      spark.sessionState.catalog.getTableMetadata(ident)).toOption
    val isManaged = meta.exists(_.tableType ==
      org.apache.spark.sql.catalyst.catalog.CatalogTableType.MANAGED)
    val catalogLoc = meta.filter(_ => isManaged)
      .map(m => new org.apache.hadoop.fs.Path(m.location))
    spark.sql(s"DROP TABLE IF EXISTS ${ident.quotedString}")
    if (isManaged || (meta.isEmpty && sweepOrphanDir)) {
      val warehouse = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"))
      val db = ident.database.getOrElse(spark.catalog.currentDatabase)
      val defaultLoc =
        if (db == "default")
          new org.apache.hadoop.fs.Path(warehouse, ident.table.toLowerCase)
        else new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(warehouse, s"$db.db"),
          ident.table.toLowerCase)
      (catalogLoc.toSeq :+ defaultLoc).distinct.foreach { p =>
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      }
    }
  }

  /** Multi-column bucket key variant — e.g. the MinHash band index bucketed
    * by (band, band_hash) so incremental-dedup candidate joins read the
    * corpus side shuffle-free (only the new batch exchanges; proven in
    * `TableLayoutSpec`). Joins must use exactly the bucket columns. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit = {
    require(keys.nonEmpty, "at least one bucket key")
    // sweepOrphanDir = true: about to create a managed table at the default
    // location — an ambiguous leftover directory must go or the create
    // fails with LOCATION_ALREADY_EXISTS (see dropTable scaladoc)
    dropTable(df.sparkSession, table, sweepOrphanDir = true)
    df.write
      .mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Count parquet data files under a directory (compaction observability). */
  def dataFileCount(spark: SparkSession, dir: String): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }
}
