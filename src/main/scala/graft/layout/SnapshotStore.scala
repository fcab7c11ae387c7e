package graft.layout

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Atomic snapshot publish for parquet tables — the mechanism behind the
 * reference's reader/writer isolation (`Business_KPI_dashboard.py:10-14`
 * opens the warehouse read-only while the hourly pipeline rewrites it; DuckDB
 * arbitrates with a file lock). Over distributed parquet there is no lock
 * manager; the equivalent guarantee is IMMUTABILITY + an atomic pointer:
 *
 *  - every publish writes a brand-new `snapshot-<version>/` directory —
 *    never in place, so no reader ever observes a half-written table;
 *  - `_latest` (a one-line file naming the current snapshot dir) is swapped
 *    with an atomic rename (`FileContext.rename(OVERWRITE)` — atomic on
 *    POSIX and HDFS; object stores substitute their own atomic-swap
 *    primitive) — a reader resolves the pointer and reads a consistent,
 *    complete snapshot regardless of concurrent publishes;
 *  - old snapshots stay readable until explicitly pruned, so long-running
 *    readers finish on the version they started with (snapshot isolation,
 *    the same contract table formats provide — this is the minimal
 *    self-contained form of it).
 *
 * A crashed publish leaves an orphan `snapshot-*` directory and an untouched
 * pointer: invisible to readers, reclaimed by `prune`. Re-running the
 * publish is safe (fresh version number) — the idempotence story the README
 * scopes to the engine.
 */
object SnapshotStore {

  private val Pointer = "_latest"

  /** Per-snapshot publish marker, written after the parquet data is
    * complete and immediately before the pointer swap. Distinguishes a
    * crashed publish's orphan directory from a genuinely published old
    * snapshot (r12 review): without it, `prune` counted orphans toward
    * `keep` and could displace the most recent PREVIOUS snapshot from the
    * retention window — deleting exactly the version a long-running reader
    * that started before the latest publish is still on. A crash in the
    * marker→swap window leaves a marked-but-never-pointed dir; the NEXT
    * successful publish reclassifies it (r13 review): when the pointer
    * swings O→N, any marked version strictly between O and N is a KNOWN
    * crashed publish — pointer versions are monotonic (next = max+1), so
    * nothing above O was ever reader-visible — and its marker is removed
    * so it stops consuming a keep slot at prune time. Until that next
    * publish lands it harmlessly counts toward keep (retention errs toward
    * keeping); the much larger write-window crash (no marker) is
    * classified as an orphan immediately. Single-writer publish is assumed
    * throughout (as `nextVersion`'s read-modify-write already requires).
    * The reclassification leans on pointer MONOTONICITY, which this API
    * guarantees — if an operator manually rolls the pointer back (out-of-API
    * disaster recovery), versions above it are genuinely published, not
    * crash orphans: re-publish the rolled-back-to data as a NEW version
    * instead of leaving a rewound pointer in place, or the next publish
    * will unmark (and prune will reclaim) the newer history. */
  private val Published = "_PUBLISHED"

  /** Store-level flag: this root's snapshots carry [[Published]] markers.
    * Its ABSENCE means the store predates the marker scheme (r12 second
    * pass): every unmarked pre-upgrade snapshot would otherwise classify as
    * a crashed-publish orphan, and the FIRST prune after upgrading would
    * delete all but the pointed-at one — ignoring `keep` and destroying
    * exactly the reader-grace window the markers exist to protect. On the
    * first marker-aware operation over a legacy store, every version at or
    * below the pointer is back-filled with a marker (conservative: a
    * legacy crash orphan then merely consumes a keep slot, the pre-r12
    * behavior — retention errs toward keeping) and the flag is written, so
    * only post-upgrade unmarked directories ever classify as orphans. */
  private val SchemeFlag = "_MARKER_SCHEME_V1"

  private def migrateLegacyMarkers(f: org.apache.hadoop.fs.FileSystem,
                                   root: String,
                                   curVersion: Option[Long]): Unit = {
    val flag = new org.apache.hadoop.fs.Path(s"$root/$SchemeFlag")
    if (f.exists(flag)) return
    curVersion.foreach { cur =>
      f.listStatus(new org.apache.hadoop.fs.Path(root))
        .map(_.getPath.getName)
        .flatMap(n => versionOf(n).map(v => (n, v)))
        .filter(_._2 <= cur)
        .foreach { case (n, _) =>
          f.create(new org.apache.hadoop.fs.Path(s"$root/$n/$Published"), true)
            .close()
        }
    }
    f.create(flag, true).close()
  }

  /** Version of a `snapshot-<n>` directory name; None for anything else
    * (a stray `snapshot-tmp`, a hand-copied `snapshot-3.bak`, …) so foreign
    * entries can never brick publish or prune. */
  private def versionOf(name: String): Option[Long] =
    if (name.startsWith("snapshot-")) {
      val suffix = name.stripPrefix("snapshot-")
      if (suffix.nonEmpty && suffix.forall(_.isDigit)) scala.util.Try(suffix.toLong).toOption
      else None
    } else None

  private def fc(spark: SparkSession, root: String) =
    org.apache.hadoop.fs.FileContext.getFileContext(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)

  private def fs(spark: SparkSession, root: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)

  /** Next version = 1 + max existing (crashed publishes included, so an
    * orphan dir is never re-used). */
  private def nextVersion(spark: SparkSession, root: String): Long = {
    val p = new org.apache.hadoop.fs.Path(root)
    val f = fs(spark, root)
    if (!f.exists(p)) 0L
    else f.listStatus(p).map(_.getPath.getName)
      .flatMap(versionOf)
      .foldLeft(-1L)(math.max) + 1L
  }

  /** Write `df` as the table's next immutable snapshot and atomically
    * repoint `_latest` at it. Returns the snapshot directory. */
  def publish(df: DataFrame, root: String): String = {
    val spark = df.sparkSession
    val version = nextVersion(spark, root)
    val dir = s"$root/snapshot-$version"
    df.write.mode("error").parquet(dir) // never in place; fails on dir reuse
    val f = fs(spark, root)
    // 'no pointer' (first publish) and 'unparseable pointer' (hand-edited
    // or corrupt _latest) are NOT the same case (r13 advice): treating the
    // latter as None would drop the unmark floor to -1 and strip
    // _PUBLISHED from every genuinely published snapshot below `version`,
    // letting the next prune reclaim the entire retention history. Abort
    // loudly instead — an operator must repair the pointer first.
    val prevVersion = latest(spark, root).map(_.split('/').last).map { n =>
      versionOf(n).getOrElse(throw new IllegalStateException(
        s"publish aborted before unmark pass: $Pointer names '$n', which is " +
          s"not a snapshot-<version> directory; repair the pointer before " +
          s"publishing (proceeding would misclassify all published " +
          s"snapshots as crashed publishes)"))
    }
    // legacy stores first get their pre-upgrade snapshots back-filled with
    // markers (BEFORE this publish's own marker — otherwise the new marker
    // would make the store look scheme-aware while older published
    // versions still classify as orphans)
    migrateLegacyMarkers(f, root, prevVersion)
    // A MARKED dir strictly between the current pointer and this publish's
    // version is a crashed marker→swap-window publish that was never
    // reader-visible (pointer versions are monotone): unmark it so it
    // classifies as an orphan at the next prune instead of consuming a
    // keep slot and displacing the newest genuinely reader-visible
    // previous snapshot (see [[Published]]). This runs BEFORE the swap and
    // FAILS LOUDLY (r13 second pass): once the pointer advances past a
    // stale marker, no later publish's (pointer, version) window covers it
    // again — marked-below-pointer is indistinguishable from genuinely
    // published — so the swap must not happen until the window is clean.
    // A failed publish is retried by the operator with the same pointer,
    // which re-attempts the same unmarks; a crash mid-loop likewise leaves
    // the pointer untouched for the retry. Only markers are deleted here,
    // never data.
    val floor = prevVersion.getOrElse(-1L)
    f.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName)
      .flatMap(n => versionOf(n).map(v => (n, v)))
      .filter { case (_, v) => v > floor && v < version }
      .foreach { case (n, _) =>
        val m = new org.apache.hadoop.fs.Path(s"$root/$n/$Published")
        if (f.exists(m) && !f.delete(m, false))
          throw new java.io.IOException(
            s"publish aborted before pointer swap: could not unmark crashed " +
              s"publish $n (its $Published would permanently consume a keep slot)")
      }
    // publish marker: data is complete from here on — see [[Published]]
    f.create(new org.apache.hadoop.fs.Path(s"$dir/$Published"), true).close()
    val tmp = new org.apache.hadoop.fs.Path(s"$root/.$Pointer.tmp")
    val dst = new org.apache.hadoop.fs.Path(s"$root/$Pointer")
    val out = f.create(tmp, true)
    try out.write(s"snapshot-$version\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fc(spark, root).rename(tmp, dst,
      org.apache.hadoop.fs.Options.Rename.OVERWRITE) // the atomic swap
    dir
  }

  /** The current snapshot directory, or None before the first publish. */
  def latest(spark: SparkSession, root: String): Option[String] = {
    val ptr = new org.apache.hadoop.fs.Path(s"$root/$Pointer")
    val f = fs(spark, root)
    if (!f.exists(ptr)) None
    else {
      val in = f.open(ptr)
      try {
        val name = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        if (name.isEmpty) None else Some(s"$root/$name")
      } finally in.close()
    }
  }

  /** Read the table as of its current snapshot. The returned frame is bound
    * to that snapshot directory: later publishes do not change what it
    * reads (snapshot isolation for long-running readers). */
  def readLatest(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(latest(spark, root).getOrElse(
      throw new IllegalStateException(s"no published snapshot under $root")))

  /** Delete all but the newest `keep` PUBLISHED snapshots, never the
    * pointed-at one. Run from the writer once readers' grace period has
    * passed.
    *
    * Classification (r12 review — orphans used to consume keep slots):
    *  - versions NEWER than the current pointer are left untouched — an
    *    unmarked one may be a concurrent publish mid-write;
    *  - at or below the pointer, only snapshots carrying the [[Published]]
    *    marker (or the pointed-at one itself) count toward `keep`;
    *    unmarked ones are crashed-publish orphans — readers can never have
    *    resolved them through the pointer — and are always reclaimed. */
  def prune(spark: SparkSession, root: String, keep: Int = 2): Seq[String] = {
    require(keep >= 1, "keep at least one snapshot")
    val f = fs(spark, root)
    val current = latest(spark, root).map(_.split('/').last)
    val curVersion = current.flatMap(versionOf)
    // nothing was ever published → nothing is reclaimable; any directory
    // present may be the FIRST publish mid-write (no pointer to fence it)
    if (curVersion.isEmpty) return Seq.empty
    // pre-upgrade stores: back-fill markers before classifying anything
    migrateLegacyMarkers(f, root, curVersion)
    val all = f.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName)
      .flatMap(n => versionOf(n).map(v => (n, v)))
      .sortBy(_._2)
    def isPublished(name: String): Boolean =
      current.contains(name) ||
        f.exists(new org.apache.hadoop.fs.Path(s"$root/$name/$Published"))
    val eligible = all.filter { case (_, v) =>
      curVersion.forall(v <= _) // never touch a possible in-flight publish
    }
    val published = eligible.filter { case (n, _) => isPublished(n) }
    val keepers = published.takeRight(keep).map(_._1).toSet ++ current
    val victims = eligible.map(_._1).filterNot(keepers)
    victims.foreach { n =>
      f.delete(new org.apache.hadoop.fs.Path(s"$root/$n"), true)
    }
    victims.toSeq
  }
}
