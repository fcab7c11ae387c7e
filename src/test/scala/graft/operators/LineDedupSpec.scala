package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSuite {
  import spark.implicits._

  // three "pages": boilerplate header repeats on all of them, page 1 also
  // repeats one of page 0's content lines; blank separator lines everywhere
  private def pages = Seq(
    (0L, "NAV HOME ABOUT\n\nunique zero alpha\nshared content line\n\nCOPYRIGHT FOOTER"),
    (1L, "NAV HOME ABOUT\n\nshared content line\nunique one beta\n\nCOPYRIGHT FOOTER"),
    (2L, "NAV HOME ABOUT\n\nunique two gamma\n\nCOPYRIGHT FOOTER")
  ).toDF("id", "text")

  test("a document's OWN repeated line dedups to its first copy (global " +
      "first-occurrence applies within a document too)") {
    val doc = Seq((7L, "alpha beta gamma\nmiddle line\nalpha beta gamma\nend line"))
      .toDF("id", "text")
    val out = LineDedup.dedupLines(doc, "id", "text").collect()
    assert(out.length === 1)
    assert(out(0).getString(1) === "alpha beta gamma\nmiddle line\nend line")
    assert(out(0).getAs[Long]("n_lines") === 4L)
    assert(out(0).getAs[Long]("n_lines_kept") === 3L)
  }

  test("keeps the first occurrence of every duplicated line, in-order reassembly") {
    val out = LineDedup.dedupLines(pages, "id", "text").orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
    // page 0 saw everything first: unchanged
    assert(out(0).getString(1) ===
      "NAV HOME ABOUT\n\nunique zero alpha\nshared content line\n\nCOPYRIGHT FOOTER")
    // page 1 loses header, footer, and the shared content line; blanks stay
    assert(out(1).getString(1) === "\nunique one beta\n")
    // page 2 loses header and footer only
    assert(out(2).getString(1) === "\nunique two gamma\n")
  }

  test("n_lines / n_lines_kept account for drops; blank lines always survive") {
    val out = LineDedup.dedupLines(pages, "id", "text")
      .orderBy("id")
      .select("n_lines", "n_lines_kept").as[(Long, Long)].collect()
    assert(out(0) === ((6L, 6L)))
    assert(out(1) === ((6L, 3L))) // 2 blanks + "unique one beta"
    assert(out(2) === ((5L, 3L)))
  }

  test("a document whose every line loses disappears from the output") {
    val withClone = pages.unionByName(
      Seq((3L, "NAV HOME ABOUT\nshared content line\nCOPYRIGHT FOOTER"))
        .toDF("id", "text"))
    val out = LineDedup.dedupLines(withClone, "id", "text")
    assert(out.filter($"id" === 3L).isEmpty)
    assert(out.count() === 3)
  }

  test("minChars widens the bypass: short lines stop deduping") {
    val df = Seq((0L, "hi\nlong enough line"), (1L, "hi\nanother line")).toDF("id", "text")
    val strict = LineDedup.dedupLines(df, "id", "text", minChars = 1)
      .filter($"id" === 1L).select("text").as[String].head()
    assert(strict === "another line") // "hi" deduped away
    val loose = LineDedup.dedupLines(df, "id", "text", minChars = 3)
      .filter($"id" === 1L).select("text").as[String].head()
    assert(loose === "hi\nanother line") // "hi" bypasses dedup
  }

  test("first-occurrence selection is a partial+final aggregate, not a window (skew-proof)") {
    // a window formulation would sort every copy of a hot boilerplate line
    // inside ONE task; the min(struct) aggregate collapses copies map-side
    Seq(true, false).foreach { hashed =>
      val p = LineDedup.dedupLines(pages, "id", "text", hashedKeys = hashed)
        .queryExecution.executedPlan.toString
      assert(p.contains("partial_min"), s"hashed=$hashed no map-side combine:\n$p")
      assert(!p.contains("Window"), s"hashed=$hashed plans a window:\n$p")
    }
  }

  test("hashed keys (scale mode) produce exactly the exact-mode output") {
    val corpus = pages.unionByName(
      (10L until 60L).map(i => (i, s"unique filler $i\nNAV HOME ABOUT")).toDF("id", "text"))
    val hashed = LineDedup.dedupLines(corpus, "id", "text", hashedKeys = true)
    val exact = LineDedup.dedupLines(corpus, "id", "text", hashedKeys = false)
    assert(hashed.exceptAll(exact).isEmpty && exact.exceptAll(hashed).isEmpty)
  }

  test("within-doc dedup: first copy wins per DOC, cross-doc repeats untouched") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha line\nbeta line\nalpha line\ngamma line\nbeta line"),
      (2L, "alpha line\nalpha line")) // same line as doc 1 — must stay here
      .toDF("id", "text")
    val out = LineDedup.dedupLinesWithinDoc(docs, "text")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, "alpha line\nbeta line\ngamma line", 5L, 3L),
      (2L, "alpha line", 2L, 1L))) // within ITS doc only — not vs doc 1
  }

  test("within-doc dedup: minChars bypass keeps short/blank repeats; columns carried") {
    val s = spark
    import s.implicits._
    val docs = Seq((7L, "a longer heading\n***\n\n***\na longer heading", "en"))
      .toDF("id", "text", "lang")
    val out = LineDedup.dedupLinesWithinDoc(docs, "text", minChars = 5).head()
    assert(out.getString(1) === "a longer heading\n***\n\n***")
    assert(out.getString(2) === "en")          // non-text columns pass through
    assert(out.getLong(3) === 5L && out.getLong(4) === 4L)
    // reserved-name guard
    val bad = Seq((1L, "x", 2L)).toDF("id", "text", "n_lines")
    intercept[IllegalArgumentException](LineDedup.dedupLinesWithinDoc(bad, "text"))
  }

  test("within-doc dedup is a pure projection: no shuffle in the plan") {
    val s = spark
    import s.implicits._
    val docs = (1L to 100L).map(i => (i, s"l$i\nl$i")).toDF("id", "text")
    val plan = LineDedup.dedupLinesWithinDoc(docs, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
