package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Shared column-level helpers used across the model layer.
 */
package object functions {

  /**
   * dbt_utils.generate_surrogate_key, bit-identical to the compiled macro the
   * reference ships (SURVEY §1.4.3; reference `fact_event.sql:98`, all
   * `dim_*.sql` finals):
   *
   *   md5(cast(coalesce(cast(col as varchar), '_dbt_utils_surrogate_key_null_') as varchar))
   *
   * Multi-column keys are interleaved with '-' separators, matching the macro.
   */
  def surrogateKey(cols: Column*): Column = {
    val parts = cols.map(c =>
      coalesce(c.cast("string"), lit("_dbt_utils_surrogate_key_null_")))
    val joined =
      if (parts.size == 1) parts.head
      else concat(parts.flatMap(p => Seq(p, lit("-"))).dropRight(1): _*)
    md5(joined)
  }

  /** NULL or empty-after-trim (the reference's recurring presence test). */
  def missing(c: Column): Column = c.isNull || c === ""

  /** present = NOT NULL and non-empty string. */
  def present(c: Column): Column = c.isNotNull && c =!= ""
}
