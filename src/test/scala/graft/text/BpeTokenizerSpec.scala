package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BpeTokenizerSpec extends SparkSuite {

  private def corpus(text: String) = {
    val s = spark
    import s.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("learn picks max-count pairs with the deterministic tie-break") {
    // counts: newest×5, low×3, lower×2.
    // round 1: (w,e) wins at 7 (5 from newest + 2 from lower).
    // round 2: five pairs tie at 5 — (e,we), (l,o), (n,e), (s,t), (we,s) —
    // lexicographic tie-break picks (e, we).
    val merges = BpeTokenizer.learn(
      corpus("low low low lower lower newest newest newest newest newest"),
      "text", nMerges = 2)
    assert(merges == Seq(("w", "e"), ("e", "we")))
  }

  test("learn stops when the vocabulary exhausts") {
    val merges = BpeTokenizer.learn(corpus("ab ab ab"), "text", nMerges = 10)
    assert(merges == Seq(("a", "b"))) // one merge, then no pairs remain
  }

  test("segment applies merges greedily left-to-right in rank order") {
    val seg = BpeTokenizer.tokenize(
      corpus("newest wewe aaa"), "doc_id", "text",
      Seq(("w", "e"), ("e", "we"), ("a", "a")))
      .collect().head
    // newest: n,e,w,e,s,t -(w,e)-> n,e,we,s,t -(e,we)-> n,ewe,s,t
    // wewe:   w,e,w,e     -(w,e)-> we,we
    // aaa:    a,a,a       -(a,a)-> aa,a  (left-to-right, no overlap)
    assert(seg.getAs[String]("text_bpe") == "n@@ewe@@s@@t we@@we aa@@a")
    assert(seg.getAs[Int]("n_subwords") == 8)
    assert(seg.getAs[Int]("n_tokens") == 3)
  }

  test("segmentation with no merges is per-character; rejoining recovers the word") {
    val seg = BpeTokenizer.tokenize(corpus("abc"), "doc_id", "text", Seq.empty)
      .collect().head
    assert(seg.getAs[String]("text_bpe") == "a@@b@@c")
    assert(seg.getAs[Int]("n_subwords") == 3)
  }

  test("non-ASCII words are excluded from training but still segment") {
    val merges = BpeTokenizer.learn(corpus("héllo héllo héllo ab ab"), "text",
      nMerges = 1)
    assert(merges == Seq(("a", "b"))) // héllo gated out of the vocab
    val seg = BpeTokenizer.tokenize(corpus("héllo"), "doc_id", "text", merges)
      .collect().head
    assert(seg.getAs[String]("text_bpe") == "h@@é@@l@@l@@o")
  }

  test("learned merges reduce the corpus subword count monotonically") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = BpeTokenizer.learn(docs, "text", nMerges = 24, vocabCap = 2000)
    assert(m.nonEmpty)
    val none = BpeTokenizer.tokenize(docs, "doc_id", "text", Seq.empty)
      .agg(sum("n_subwords")).head().getLong(0)
    val trained = BpeTokenizer.tokenize(docs, "doc_id", "text", m)
      .agg(sum("n_subwords")).head().getLong(0)
    assert(trained < none, s"merges did not compress: $trained vs $none")
  }
}
