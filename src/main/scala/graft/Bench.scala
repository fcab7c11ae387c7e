package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
 * prints one JSON line (driver contract).
 *
 * Methodology per BASELINE.md §d: *warm* query execution. Each query's
 * DataFrame is prepared once (prepared-statement model), the session's hot
 * tables live in the buffer pool (populated by the untimed warmup pass), and
 * each timed run then re-executes every stage — shuffles, joins, broadcasts
 * — end to end. This mirrors the DuckDB baseline's warm repeat-runs (OS page
 * cache + buffer manager + cached catalog).
 *
 * AQE is OFF by default here (SPARK_GRAFT_AQE to override): at bench scale
 * its stage-materialization barriers add fixed latency per query that swamps
 * sub-second stages; measured neutral-to-worse across the width sweep. At
 * 100 TB with real shuffles the trade-off reverses — production sessions
 * should enable AQE for skew-join splitting and partition coalescing.
 *
 * Flagship floor (j2_role_playing_join, sf0.1): 0.235 s min-of-10 in
 * isolation (graft.tools.Probe), invariant across shuffle widths 4-16. The
 * plan is already the target shape — zero-Exchange ShuffledHashJoin on the
 * orderkey-co-partitioned cached fact tables, all four dims broadcast,
 * partial+final agg, coalesce(1) in place of a range-partitioned sort — so
 * the residual vs DuckDB's ~0.05 s is local-mode fixed cost (per-execution
 * broadcast-build jobs and stage scheduling under host CPU steal), not a
 * missing optimization; on a real cluster the same plan amortizes those
 * barriers over seconds-long stages. Numbers in the bench JSON read higher
 * than the isolated floor when the interleaved passes contend with the
 * multi-second 10× scaling queries.
 *
 * Skew-join floor (j_skew_salted, sf0.1): 0.52/0.54 s min-of-10 in
 * isolation (graft.tools.SkewAB, two quiet windows, loadavg 2.8/3.4),
 * with the full variant ladder pinning the attribution: targeted 0.52,
 * detection-free salting 0.28, blanket salting 0.26-0.30, plain join 0.26,
 * plain+SHJ 0.28-0.32 (result sets machine-checked equal across variants
 * before timing). The ~0.25 s delta between targeted and detection-free is
 * ENTIRELY the hot-key detection chain — sample → count → collect →
 * broadcast is three serialized job barriers over a ~6k-row sample, a
 * fixed local stage cost; the salting machinery itself adds ~0.01-0.03 s
 * over a plain join (negative stage-collapse A/B). Collapsing detection
 * into blanket salting would halve the LOCAL floor but replicates the dim
 * 4x on EVERY key — at 100 TB the targeted form's bounded sample +
 * broadcast mark is the scale-correct trade, and its fixed barriers
 * amortize over seconds-long stages exactly like j2's. DuckDB's 0.125 s on
 * the same query is the single-process floor with none of those barriers.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Shuffle width: re-swept late round 4 after the multi-second text
    // queries joined the set. The original sweep over sub-second queries
    // favored 6-8 (totals 8.7/8.4/8.5/10.5/16.1 s at w=4/6/8/16/32 — task
    // launch cost dominates megabyte partitions), but the LM/curation
    // queries explode ~3M rows and were width-starved at 8: w=8 vs w=16
    // full-set totals 44.4 vs 33.7 s — the small queries pay ≤ 0.1 s each
    // while t_lm_perplexity_10x halves (15.5 → 7.6) and t_curation_pipeline
    // drops 6.5 → 2.5. Width 16 is the better global trade now.
    // Production sessions size this to cluster cores.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", math.min(cpus.toInt, 16).toString)
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "false")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", aqe)
      // Latency trims for sub-second stages over megabyte-scale data: codec
      // startup per shuffle block costs more than the bytes it saves, both
      // on the shuffle path and in the cached-table columnar store.
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.broadcast.compress", "false")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Prepared-statement model: each query's DataFrame (analysis +
    // optimization + physical planning) is built ONCE; timed passes measure
    // execution. Each noop-sink write plans a fresh write job over the cached
    // logical plan, so every timed run re-executes all stages — shuffles
    // included — from the persisted session tables. The only frames
    // persisted beyond the input tables are the dedup operators' internal
    // sketch intermediates (multi-consumer within one plan, like a SQL
    // engine's materialized CTE); resetDerivedCaches() below invalidates
    // them before every timed pass, so each pass pays that computation once
    // rather than the first pass filling a cache the rest re-read.
    // SPARK_GRAFT_ONLY: comma-separated query-name filter for isolated
    // profiling runs; absent → the full set (the driver's mode).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(o) => SparkEntry.queries.filter { case (n, _) => o(n) }
      case None => SparkEntry.queries
    }
    val prepared = selected.map { case (name, fn) =>
      name -> (try Some(fn(spark, sfDir)) catch { case _: Throwable => None })
    }

    // Timed action: the noop sink, NOT count(). count() lets Catalyst prune
    // every column a no-filter projection computes — t_filter_cascade's whole
    // regex-metric stage collapsed to counting cached input rows (0.04 s at
    // sf1 where the evaluated query costs seconds), and every projection-only
    // query's scaling ratio read as a flat 1.0× artifact. The noop sink
    // evaluates the full SELECT on the executors and discards it — the same
    // work DuckDB's fetchall-based baseline pays, minus driver transfer.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup pass (untimed): JIT, codegen cache, table buffer pool, broadcasts
    prepared.foreach { case (_, df) =>
      try df.foreach(run) catch { case _: Throwable => () }
    }

    // Timed: 5 interleaved passes over the whole query set, min per query.
    // This container sits on a shared host with heavy CPU steal (measured
    // ~50% of user time) injecting random multi-second stalls; interleaving
    // keeps one stall from poisoning every repeat of a single query, and the
    // min recovers the true warm execution time the baseline methodology
    // asks for (BASELINE.md §d).
    val names = selected.keys.toSeq
    val times = scala.collection.mutable.Map.empty[String, Double]
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    for (pass <- 1 to 5) {
      // derived results (sketch frames) recompute fresh in every pass;
      // the input-table buffer pool stays warm (BASELINE.md §d methodology)
      graft.coverage.LlmOpQueries.resetDerivedCaches()
      for (name <- names) {
        // multi-second queries (the 10× scaling runs) get 2 timed passes,
        // not 5 — steal noise is proportionally small on them, and the
        // repeats would dominate the bench's wall-clock budget
        val skip = pass > 2 && times.get(name).exists(_ >= 5.0)
        if (!skip) {
          val t0 = System.nanoTime()
          val ok = try {
            prepared(name) match {
              case Some(df) => run(df); true
              case None => failed += name; false
            }
          } catch { case _: Throwable => failed += name; false }
          val t = (System.nanoTime() - t0) / 1e9
          // a crash-path timing is not a latency — only record successes;
          // a later success also CLEARS the failed mark (r11 review: a
          // transient pass-1 error left the query in BOTH failed:[…] and
          // queries:{…} with a valid min — contradictory output)
          if (ok) {
            failed -= name
            if (!times.contains(name) || t < times(name)) times(name) = t
          }
        }
      }
    }
    val results = names.map(n => n -> times.getOrElse(n, -1.0))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // 1-min loadavg: this container shares a host with heavy CPU steal and
    // totals swing ~2× with it (NOTES_r2) — stamp the load so any reader can
    // judge whether a number came from a quiet or a stormy window.
    val load1 = try {
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    } catch { case _: Throwable => -1.0 }
    // escape the interpolated path like Verify does (r11 review): a quote
    // or backslash in SPARK_GRAFT_SF_DIR would otherwise emit invalid JSON
    // and lose the round's timings to the driver's json.load
    val sfJson = "\"" + sfDir.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // cpus + shuffle width stamped into the line (r14 verdict item 2): the
    // driver's low-core run could not VERIFY that SPARK_GRAFT_CPUS takes
    // effect (every sf0.1 ratio ≈ 1 — fixed-cost-bound rows) and flagged
    // suspect_cpus_ignored; the stamp plus the x_scaling_probe row make the
    // parallelism signal checkable from the parsed line alone.
    val jsonLine =
      s"""{"metric":"total","value":$total,"unit":"sec","cpus":${cpus.toInt},"shuffle_partitions":${shufflePartitions.toInt},"queries":$qs,"failed":$failedJson,"sf":$sfJson,"loadavg1":$load1}"""
    // The driver records only the LAST 2000 characters of stdout and tries
    // to parse one JSON line out of that tail (BENCH_r01..r13 all carry
    // `"tail": <2000 chars>, "parsed": null` — the full 128-query line is
    // ~5 KB, so its head was always cut off and no round ever parsed).
    // Contract fix (r12/r13 verdict item): print the FULL line first (for
    // humans scrolling the log), then a COMPACT line LAST — total + the
    // slowest queries, truncated to fit the tail window with sbt's trailing
    // "[success] Total time: …" line budgeted — so the driver's parse is
    // finally non-null. The complete per-query map is always written intact
    // to bench_out.json (README "Bench artifacts"): that file remains the
    // canonical artifact; the stdout line is the driver-facing summary.
    println(jsonLine)
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2)
    // failed list bounded to 10 names + a count (r14 review): an unbounded
    // list inside the fixed suffix would blow the 2000-char tail exactly in
    // a mass-failure run — the one where the failed set IS the signal. The
    // complete list is always in the full line above and in bench_out.json.
    val failedCompact = failed.take(10).map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val fixed =
      s""","n_queries":${results.size},"full":"bench_out.json","n_failed":${failed.size},"failed":$failedCompact,"sf":$sfJson,"loadavg1":$load1}"""
    val head =
      s"""{"metric":"total","value":${math.round(total * 1000) / 1000.0},"unit":"sec","cpus":${cpus.toInt},"shuffle_partitions":${shufflePartitions.toInt},"queries":{"""
    val budget = 1700 - fixed.length - head.length
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 0
    slowest.foreach { case (k, v) =>
      val e = "\"" + k + "\":" + (math.round(v * 1000) / 1000.0)
      if (used + e.length + 1 <= budget) { entries += e; used += e.length + 1 }
    }
    println(head + entries.mkString(",") + "}" + fixed)
    // bench_out.json: the whole line, intact, for any reader.
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json"))
      java.nio.file.Files.write(out,
        (jsonLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case t: Throwable =>
      System.err.println(s"[Bench] could not write bench_out.json: $t")
    }
    graft.coverage.OperatorQueries.clearCache()
    graft.coverage.LlmOpQueries.clearCache()
    spark.stop()
  }
}
