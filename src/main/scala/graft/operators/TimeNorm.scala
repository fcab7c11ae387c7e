package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * TIMESTAMP_NTZ → TIMESTAMP normalization shared by the time-ordered
 * operators ([[Sessionize]], [[AsOfJoin]]) — ONE definition (r11 review;
 * the two had byte-identical private copies). Parquet testdata generations
 * differ in whether a timestamp column arrives as TIMESTAMP or
 * TIMESTAMP_NTZ, and mixing the two in a union/window either fails analysis
 * or silently coerces one side. Under a UTC session — every graft entry
 * point pins `spark.sql.session.timeZone=UTC` — the NTZ→TIMESTAMP cast
 * preserves both wall-clock and instant, so downstream ordering and window
 * boundaries are bit-identical.
 */
private[graft] object TimeNorm {
  def toTimestamp(df: DataFrame, tsCol: String): DataFrame =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast("timestamp"))
      case _ => df
    }
}
