package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextNormalizeSpec extends SparkSuite {
  import spark.implicits._

  private def cp(c: Int): String = new String(Character.toChars(c))

  private def norm(s: String): String =
    Seq(s).toDF("t").select(TextNormalize.normalizeText(col("t"))).head().getString(0)

  test("NFC composes decomposed accents") {
    val decomposed = "cafe" + cp(0x0301) // e + combining acute
    assert(norm(decomposed) === "caf" + cp(0x00E9))
    assert(norm(decomposed).length === 4)
  }

  test("zero-width chars vanish; controls stripped except newline and tab") {
    assert(norm("zero" + cp(0x200B) + "width" + cp(0xFEFF)) === "zerowidth")
    assert(norm("a" + cp(0x0007) + "b\nc\td") === "ab\nc\td")
  }

  test("typographic quotes, dashes, and NBSP fold to ASCII") {
    val s = cp(0x201C) + "hi" + cp(0x201D) + " " + cp(0x2018) + "x" + cp(0x2019) +
      " a" + cp(0x2013) + "b" + cp(0x2014) + "c" + cp(0x00A0) + "end"
    assert(norm(s) === "\"hi\" 'x' a-b-c end")
  }

  test("normalization is idempotent") {
    val dirty = "cafe" + cp(0x0301) + cp(0x200B) + " " + cp(0x201C) + "q" + cp(0x201D)
    assert(norm(norm(dirty)) === norm(dirty))
  }

  test("CRLF and LF twins normalize to identical bytes (\\r is a control char)") {
    val s = spark
    import s.implicits._
    val out = Seq(("a", "line one\r\nline two\r"), ("b", "line one\nline two"))
      .toDF("id", "text")
      .select(col("id"), TextNormalize.normalizeText(col("text")).as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("a") == out("b"))
    assert(!out("a").contains("\r"))
  }
}
