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

  test("within-doc dedup: expression branch ≡ HOF branch on the crossover") {
    val s = spark
    import s.implicits._
    // every semantics corner in one fixture: raw-equality dups, bypassed
    // short/blank repeats (incl. a SHORT line equal to text inside a long
    // one), space-only lines, trailing newline (split keeps the empty
    // tail), multi-byte chars straddling the minChars count, and a dup
    // whose copies differ only in leading spaces (raw equality → NOT dups)
    val texts = Seq(
      "alpha line\nbeta line\nalpha line\ngamma line\nbeta line",
      "a longer heading\n***\n\n***\na longer heading",
      "  alpha line\nalpha line\n  alpha line",
      "日本語のテキスト行\nab\n日本語のテキスト行\nab",
      "trailing\n", "", " ", "solo",
      (1 to 50).map(i => s"line ${i % 7}").mkString("\n"))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (minChars <- Seq(0, 1, 5)) {
      // gate at 0 lines forces EVERY row down the expression branch;
      // a huge gate forces every row down the HOF branch
      val viaExpr = LineDedup.dedupLinesWithinDoc(docs, "text", minChars,
        quadraticMaxLines = 0).orderBy("id").collect().toSeq
      val viaHof = LineDedup.dedupLinesWithinDoc(docs, "text", minChars,
        quadraticMaxLines = Int.MaxValue).orderBy("id").collect().toSeq
      assert(viaExpr === viaHof, s"branches diverge at minChars=$minChars")
    }
    // null text: both branches propagate null (no NPE, no fabricated 0s)
    val withNull = docs.unionByName(
      Seq((99L, null: String)).toDF("id", "text"))
    for (gate <- Seq(0, Int.MaxValue)) {
      val r = LineDedup.dedupLinesWithinDoc(withNull, "text",
          quadraticMaxLines = gate)
        .filter(col("id") === 99L).head()
      assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3), r.toString)
    }
  }

  test("within-doc dedup: a pathological 10^5-line document in bounded time") {
    val s = spark
    import s.implicits._
    // 100k lines over 1k distinct values: the HOF branch's array_position
    // scan is O(lines²) ≈ 10^10 comparisons — hours; the gated expression
    // branch is one hash-set pass. Wall-bound generous for CI noise, but
    // far under any quadratic outcome.
    val n = 100000
    val text = (0 until n).map(i => s"line number ${i % 1000}").mkString("\n")
    val docs = Seq((1L, text)).toDF("id", "text")
    val t0 = System.nanoTime()
    val out = LineDedup.dedupLinesWithinDoc(docs, "text").head()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out.getLong(2) === n.toLong && out.getLong(3) === 1000L)
    assert(out.getString(1) ===
      (0 until 1000).map(i => s"line number $i").mkString("\n"))
    assert(secs < 60.0, s"pathological doc took $secs s — gate not engaged?")
  }
}
