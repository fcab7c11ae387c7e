package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Range join (point-in-interval): pair each point with every interval that
 * contains it.
 *
 * Spark plans a raw `p.t BETWEEN i.lo AND i.hi` join as
 * BroadcastNestedLoopJoin — O(|P|·|I|) compares, a 100 TB death sentence
 * when neither side broadcasts. The scale-correct shape: discretize to
 * fixed-width bins, explode each interval over the bins it touches, plain
 * EQUI-join on the bin, then verify exact containment. Each (point,
 * interval) pair meets in exactly one bin (the point's), so no dedup pass
 * is needed. Cost: a hash shuffle of |P| + |I|·(span/binWidth) rows —
 * linear, and skew behaves like any hot equi-key.
 *
 * Pick `binWidth` ≈ the typical interval span: much wider wastes the
 * verify filter, much narrower multiplies the interval-side explosion.
 */
object RangeJoin {

  def pointInInterval(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // loud scratch-name guard (r13 review): withColumn would silently
    // replace an input __bin and the equi-join would run on garbage
    Seq("points" -> points, "intervals" -> intervals).foreach { case (n, df) =>
      require(!df.columns.contains("__bin"),
        s"$n side already carries __bin — reserved by RangeJoin; rename it")
    }
    val p = points.withColumn("__bin",
      floor(col(ptCol) / binWidth).cast("long"))
    val i = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(i, Seq("__bin"))
      .filter(col(ptCol).between(col(loCol), col(hiCol)))
      .drop("__bin")
  }
}
