package graft.coverage

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/**
 * Testdata drift guard (round-5 verdict item 2): the driver has regenerated
 * `/root/testdata` with a different physical schema once already (events.ts
 * went nanos-as-long → timestamp[us] NTZ between rounds 4 and 5, which broke
 * sessionization at analysis time, in a different suite, two queries away
 * from the cause). This suite loads EVERY table through the same shared
 * loaders Verify/Bench use, at all three sf dirs, and pins the normalized
 * schema the operator inventory relies on — so the next writer drift fails
 * here, in one named place, with the table and column in the message.
 *
 * Pinning rules: key/id columns exact (a widened id would silently change
 * surrogate-key hashes); measure columns exact (fp width changes hash
 * output); temporal columns must be a timestamp flavor the operators accept
 * (TIMESTAMP or TIMESTAMP_NTZ both work for plain date math under the UTC
 * session — only `events.ts` must be exactly TIMESTAMP because the
 * sessionize/as-of paths call `unix_micros` on it, which is the function the
 * round-5 drift broke); embedding element type any fractional (operators
 * cast to double explicitly).
 */
class TestdataSchemaSpec extends SparkSuite {

  private val dirs =
    Seq("sf0.001", "sf0.01", "sf0.1").map(sf => s"/root/testdata/$sf")

  private def dt(df: DataFrame, c: String): DataType = df.schema(c).dataType

  private def assertCols(df: DataFrame, table: String, dir: String,
                         expected: (String, DataType)*): Unit =
    expected.foreach { case (c, t) =>
      assert(df.columns.contains(c), s"$dir/$table lost column $c")
      assert(dt(df, c) == t, s"$dir/$table.$c drifted: ${dt(df, c)} != $t")
    }

  private def assertTemporal(df: DataFrame, table: String, dir: String,
                             cols: String*): Unit =
    cols.foreach { c =>
      val t = dt(df, c)
      assert(t == TimestampType || t == TimestampNTZType,
        s"$dir/$table.$c drifted to non-timestamp $t")
    }

  test("events loader normalizes ts to TIMESTAMP (exact) at every sf") {
    for (dir <- dirs) {
      val e = OperatorQueries.T(spark, dir, "events")
      assert(dt(e, "ts") == TimestampType,
        s"$dir/events.ts must normalize to TIMESTAMP (unix_micros callers), got ${dt(e, "ts")}")
      assertCols(e, "events", dir,
        "event_id" -> LongType, "user_id" -> LongType,
        "event_type" -> StringType, "value" -> DoubleType,
        "props" -> StringType)
    }
  }

  test("TPC-H-ish tables keep their key/measure/temporal contract at every sf") {
    for (dir <- dirs) {
      val li = OperatorQueries.T(spark, dir, "lineitem")
      assertCols(li, "lineitem", dir,
        "l_orderkey" -> LongType, "l_partkey" -> LongType,
        "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
        "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
        "l_discount" -> DoubleType, "l_tax" -> DoubleType,
        "l_returnflag" -> StringType, "l_linestatus" -> StringType)
      assertTemporal(li, "lineitem", dir, "l_shipdate")

      val o = OperatorQueries.T(spark, dir, "orders")
      assertCols(o, "orders", dir,
        "o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
        "o_orderpriority" -> StringType)
      assertTemporal(o, "orders", dir, "o_orderdate")

      assertCols(OperatorQueries.T(spark, dir, "customer"), "customer", dir,
        "c_custkey" -> LongType, "c_nationkey" -> IntegerType,
        "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType)
      assertCols(OperatorQueries.T(spark, dir, "supplier"), "supplier", dir,
        "s_suppkey" -> LongType, "s_nationkey" -> IntegerType,
        "s_acctbal" -> DoubleType)
      assertCols(OperatorQueries.T(spark, dir, "part"), "part", dir,
        "p_partkey" -> LongType, "p_size" -> IntegerType,
        "p_retailprice" -> DoubleType, "p_brand" -> StringType)
      assertCols(OperatorQueries.T(spark, dir, "nation"), "nation", dir,
        "n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType,
        "n_name" -> StringType)
      assertCols(OperatorQueries.T(spark, dir, "region"), "region", dir,
        "r_regionkey" -> IntegerType, "r_name" -> StringType)
    }
  }

  test("documents and embeddings keep the LLM-operator contract at every sf") {
    for (dir <- dirs) {
      assertCols(LlmOpQueries.docs(spark, dir), "documents", dir,
        "doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType,
        "n_chars" -> LongType)
      val emb = LlmOpQueries.embeddings(spark, dir)
      assertCols(emb, "embeddings", dir,
        "vec_id" -> LongType, "label" -> IntegerType)
      dt(emb, "embedding") match {
        case ArrayType(et, _) =>
          assert(et == FloatType || et == DoubleType,
            s"$dir/embeddings.embedding element drifted to $et")
        case other =>
          fail(s"$dir/embeddings.embedding drifted to non-array $other")
      }
    }
  }
}
