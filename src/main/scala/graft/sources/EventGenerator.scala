package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Synthetic logistics-event generator — the Scala mirror of the reference's
 * producer distributions (`src/api/generator.py:46-60`):
 *
 *  - `event_id`   uuid4-shaped (deterministic: md5-derived, version/variant
 *                 nibbles patched)
 *  - `order_id`   `ORD-??-####` (two letters + four digits, faker bothify)
 *  - `timestamp`  per-event UTC ISO instant (near-unique, like the
 *                 reference's `datetime.now()` per call)
 *  - `status`     uniform over the six lifecycle statuses
 *  - `origin`/`destination`  "City, CC" pairs from a pool wide enough that
 *                 locations are near-unique per event (the reference's
 *                 faker city+country draw: dim_location ≈ 2 rows/event)
 *  - `carrier_name` uniform over the four carriers
 *  - `latitude`/`longitude`  uniform in range, 6 dp (faker's precision)
 *  - `weight_kg`  round(uniform(1, 500), 2)
 *  - `estimated_delivery` uniform date in [today, +10d] — including the
 *                 SAME-DAY estimates that the warehouse flags
 *                 INVALID_ESTIMATED_DELIVERY via string comparison
 *                 (SURVEY §1.4.1), at the reference's ~1/11 rate
 *
 * Unlike the reference's driver-side loop, generation is a distributed
 * `spark.range(n)` projection of pure codegen'd Column expressions, seeded
 * and fully deterministic: fixture corpora at any scale are reproducible,
 * and nothing funnels through the driver.
 */
object EventGenerator {

  val statuses: Seq[String] = Seq(
    "Order Created", "Picked Up", "In Transit",
    "Out for Delivery", "Delivered", "Delayed")

  val carriers: Seq[String] = Seq("BlueDart", "FedEx", "DHL", "SwiftLogistics")

  /** Deterministic U[0,1) stream per (row id, salt, seed). */
  private def u(salt: Int, seed: Long): Column =
    pmod(xxhash64(col("id"), lit(salt), lit(seed)), lit(1000000000L))
      .cast("double") / 1e9

  /** Uniform pick from a literal pool. */
  private def pick(pool: Seq[String], salt: Int, seed: Long): Column =
    element_at(array(pool.map(lit): _*),
      (floor(u(salt, seed) * pool.size) + 1).cast("int"))

  /** One random letter (faker bothify draws from upper+lower). */
  private def letter(salt: Int, seed: Long): Column = {
    val alphabet = ('a' to 'z') ++ ('A' to 'Z')
    element_at(array(alphabet.map(c => lit(c.toString)): _*),
      (floor(u(salt, seed) * alphabet.size) + 1).cast("int"))
  }

  /**
   * `n` events as a DataFrame matching the raw wire schema (string-typed
   * temporal columns, like the reference's JSON payloads).
   *
   * @param seed   generator seed — same (n, seed, startInstant) ⇒ identical frame
   * @param startInstant ISO instant of the first event; subsequent events
   *                     advance 1s each (near-unique timestamps)
   */
  def events(spark: SparkSession, n: Long, seed: Long = 42L,
             startInstant: String = "2026-02-23T08:00:00+00:00"): DataFrame = {
    // `date_format`/`to_date` below evaluate in the SESSION time zone, so
    // the "same (n, seed, startInstant) ⇒ identical frame" claim only holds
    // under one tz (r11 review). Every graft entry point pins UTC; fail
    // loudly rather than generate a silently different corpus elsewhere.
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"EventGenerator needs spark.sql.session.timeZone=UTC (got '$tz') — " +
        "timestamp/date formatting is session-tz-dependent and would make " +
        "the generated corpus non-reproducible across deployments")
    val base = spark.range(n)
    val start = to_timestamp(lit(startInstant))

    // uuid4 shape from two md5 halves: 8-4-4-4-12 with version nibble '4'
    // and variant nibble '8' patched in
    val hex = md5(concat_ws("-", lit(seed), col("id"), lit("uuid")))
    val eventId = concat(
      substring(hex, 1, 8), lit("-"),
      substring(hex, 9, 4), lit("-4"),
      substring(hex, 14, 3), lit("-8"),
      substring(hex, 18, 3), lit("-"),
      substring(hex, 21, 12))

    val orderId = concat(lit("ORD-"),
      letter(1, seed), letter(2, seed), lit("-"),
      format_string("%04d", (floor(u(3, seed) * 10000)).cast("int")))

    val ts = date_format(
      start + col("id") * expr("INTERVAL 1 SECOND"),
      "yyyy-MM-dd'T'HH:mm:ssXXX")

    def place(saltCity: Int, saltCc: Int): Column = concat(
      lit("City"), format_string("%05d", (floor(u(saltCity, seed) * 100000)).cast("int")),
      lit(", "), pick(Seq("US", "DE", "FR", "IN", "CN", "BR", "GB", "JP", "AU",
        "CA", "MX", "ZA", "KR", "ES", "IT", "NL", "SE", "PL", "TR", "AR"),
        saltCc, seed))

    val estDelivery = date_format(
      date_add(to_date(start), (floor(u(9, seed) * 11)).cast("int")),
      "yyyy-MM-dd")

    base.select(
      eventId.as("event_id"),
      orderId.as("order_id"),
      ts.as("timestamp"),
      pick(statuses, 4, seed).as("status"),
      place(5, 6).as("origin"),
      place(7, 8).as("destination"),
      pick(carriers, 10, seed).as("carrier_name"),
      round(u(11, seed) * 180 - 90, 6).as("latitude"),
      round(u(12, seed) * 360 - 180, 6).as("longitude"),
      round(u(13, seed) * 499 + 1, 2).as("weight_kg"),
      estDelivery.as("estimated_delivery"))
  }
}
