package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ShufflingSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = (0L until 1000L).toDF("id")

  test("every row gets exactly one (shard, pos); pos is 1..count per shard") {
    val out = Shuffling.shuffled(corpus, "id", seed = "s1", nShards = 8).cache()
    assert(out.count() === 1000)
    assert(out.select("id").distinct().count() === 1000)
    val perShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .collect()
    assert(perShard.length === 8)
    perShard.foreach { r =>
      assert(r.getAs[Long]("lo") === 1L)
      assert(r.getAs[Long]("hi") === r.getAs[Long]("n"))
    }
    out.unpersist()
  }

  test("deterministic: same seed twice is identical, new seed is a different permutation") {
    val a = Shuffling.shuffled(corpus, "id", "epoch0", 4)
    val b = Shuffling.shuffled(corpus, "id", "epoch0", 4)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val c = Shuffling.shuffled(corpus, "id", "epoch1", 4)
    assert(!a.exceptAll(c).isEmpty) // some row moved
  }

  test("shard assignment is stable under corpus appends") {
    val small = Shuffling.shuffled(corpus.filter($"id" < 100), "id", "s", 8)
      .select("id", "shard")
    val big = Shuffling.shuffled(corpus, "id", "s", 8)
      .select("id", "shard").filter($"id" < 100)
    assert(small.exceptAll(big).isEmpty && big.exceptAll(small).isEmpty)
  }

  test("shards are roughly balanced (16-bit bucket mod n)") {
    val counts = Shuffling.shuffled(corpus, "id", "bal", 8)
      .groupBy("shard").count().select("count").as[Long].collect()
    // 1000 rows over 8 shards: expect ~125 each; hash uniformity keeps the
    // spread well inside ±50% at this n
    assert(counts.min > 62 && counts.max < 188,
      s"unbalanced shards: ${counts.toSeq}")
  }

  test("shuffledLocalRank is row-for-row identical to the Window form") {
    // the one-exchange variant must be a pure plan change: same (shard, pos)
    // for every row, at more than one shard width and on a multi-column frame
    val wide = corpus.withColumn("payload", concat(lit("p"), $"id"))
    for (nShards <- Seq(4, 7)) {
      val a = Shuffling.shuffled(wide, "id", "parity", nShards)
      val b = Shuffling.shuffledLocalRank(wide, "id", "parity", nShards)
      assert(a.schema == b.schema, s"schema drift at nShards=$nShards")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"row drift at nShards=$nShards")
    }
  }

  test("shuffledLocalRank pays exactly ONE exchange (the Window form pays it too, plus its own)") {
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString()
        .linesIterator.count(_.contains("Exchange"))
    assert(exchanges(Shuffling.shuffledLocalRank(corpus, "id", "x", 4)) === 1)
    // and the write path's input plan carries no second exchange either:
    // sortWithinPartitions is partition-local by construction
    assert(exchanges(Shuffling.shuffledLocalRank(corpus, "id", "x", 4)
      .sortWithinPartitions("shard", "pos")) === 1)
  }

  test("writeShuffled lays out one directory per shard, rows in pos order") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shuffle").toString
    Shuffling.writeShuffled(corpus, "id", "w", nShards = 4, path = dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 1000)
    assert(back.select("shard").distinct().count() === 4)
    // each shard holds a complete 1..n pos range, and its parquet rows are
    // already in pos order (trainers stream files sequentially, no sort)
    (0 until 4).foreach { sh =>
      val ps = spark.read.parquet(s"$dir/shard=$sh")
        .select("pos").collect().map(_.getLong(0))
      assert(ps.toSet === (1L to ps.length).toSet, s"shard $sh range")
      assert(ps.toSeq === ps.sorted.toSeq, s"shard $sh file order")
    }
  }
}
