package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM, reused across suites). */
trait SparkSuite extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSuite.session

  def fixturePath(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  def rows(df: DataFrame): Seq[org.apache.spark.sql.Row] = df.collect().toSeq
}

object SparkSuite {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      // the deployment shape: graft sessions carry the SQL-function surface
      // and the serving boundary's read-only check rule (inert unless a
      // read-only ConnectServe endpoint is live — see ReadOnlyGuard)
      .withExtensions(new GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
