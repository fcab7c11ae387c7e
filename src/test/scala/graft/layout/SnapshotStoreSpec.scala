package graft.layout

import graft.SparkSuite
import java.nio.file.Files

class SnapshotStoreSpec extends SparkSuite {
  import spark.implicits._

  test("publish → read round-trip; republish swaps the pointer, old snapshot intact") {
    val root = Files.createTempDirectory("graft-snap").toString + "/t"
    assert(SnapshotStore.latest(spark, root).isEmpty)

    val v0 = SnapshotStore.publish((1 to 10).toDF("x"), root)
    assert(SnapshotStore.latest(spark, root).contains(v0))
    assert(SnapshotStore.readLatest(spark, root).count() === 10)

    // a long-running reader binds to v0 BEFORE the next publish...
    val oldReader = SnapshotStore.readLatest(spark, root)
    val v1 = SnapshotStore.publish((1 to 25).toDF("x"), root)
    assert(v1 !== v0)
    // ...new readers see v1, the bound reader still sees complete v0
    assert(SnapshotStore.readLatest(spark, root).count() === 25)
    assert(oldReader.count() === 10)
  }

  test("a crashed publish (orphan snapshot dir, pointer untouched) is invisible and reclaimed") {
    val root = Files.createTempDirectory("graft-snap2").toString + "/t"
    SnapshotStore.publish((1 to 5).toDF("x"), root)
    // simulate a writer that died after writing data but before the swap
    (1 to 99).toDF("x").write.parquet(s"$root/snapshot-7")
    assert(SnapshotStore.readLatest(spark, root).count() === 5)
    // the next publish must NOT reuse the orphan's version
    SnapshotStore.publish((1 to 6).toDF("x"), root)
    assert(SnapshotStore.latest(spark, root).exists(_.endsWith("snapshot-8")))
    assert(SnapshotStore.readLatest(spark, root).count() === 6)
    // prune reclaims the orphan and the superseded original
    val removed = SnapshotStore.prune(spark, root, keep = 1)
    assert(removed.toSet === Set("snapshot-0", "snapshot-7"))
    assert(SnapshotStore.readLatest(spark, root).count() === 6)
  }

  test("prune never deletes the pointed-at snapshot") {
    val root = Files.createTempDirectory("graft-snap3").toString + "/t"
    (0 until 4).foreach(i => SnapshotStore.publish((0 to i).toDF("x"), root))
    val removed = SnapshotStore.prune(spark, root, keep = 1)
    assert(removed.toSet === Set("snapshot-0", "snapshot-1", "snapshot-2"))
    assert(SnapshotStore.readLatest(spark, root).count() === 4)
  }

  test("an orphan never displaces a published snapshot from the keep window") {
    // r12 review: publish 4, crash-orphan 5 (data written, pointer never
    // swapped), publish 6. keep=2 must retain {4, 6} — the old
    // count-orphans-toward-keep behavior kept {5, 6} and deleted 4, the
    // exact version a reader that started before the last publish is on.
    val root = Files.createTempDirectory("graft-snap4").toString + "/t"
    (0 to 4).foreach(i => SnapshotStore.publish(Seq(i).toDF("x"), root))
    (1 to 99).toDF("x").write.parquet(s"$root/snapshot-5") // no marker
    SnapshotStore.publish(Seq(6).toDF("x"), root)
    val removed = SnapshotStore.prune(spark, root, keep = 2)
    assert(removed.contains("snapshot-5"))   // orphan reclaimed…
    assert(!removed.contains("snapshot-4"))  // …without displacing v4
    assert(spark.read.parquet(s"$root/snapshot-4").count() === 1)
    assert(SnapshotStore.readLatest(spark, root).head().getInt(0) === 6)
  }

  test("upgrading a legacy (marker-less) store never mass-deletes published snapshots") {
    // r12 second pass: snapshots written by the pre-marker code have no
    // _PUBLISHED files — without migration, the first prune would classify
    // ALL of them as crash orphans and delete everything but the pointed-at
    // one, ignoring keep. Simulate a legacy store by stripping the markers.
    val root = Files.createTempDirectory("graft-snap7").toString + "/t"
    (0 until 3).foreach(i => SnapshotStore.publish(Seq(i).toDF("x"), root))
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    (0 until 3).foreach { v =>
      f.delete(new org.apache.hadoop.fs.Path(s"$root/snapshot-$v/_PUBLISHED"), false)
    }
    f.delete(new org.apache.hadoop.fs.Path(s"$root/_MARKER_SCHEME_V1"), false)
    val removed = SnapshotStore.prune(spark, root, keep = 2)
    assert(removed.toSet === Set("snapshot-0"))          // keep=2 honored
    assert(spark.read.parquet(s"$root/snapshot-1").count() === 1)
    // migration is one-time: markers are back-filled, so a later prune
    // still treats the old versions as published
    assert(SnapshotStore.prune(spark, root, keep = 2).isEmpty)
  }

  test("a marked-but-never-pointed crash is unmarked by the next publish") {
    // r13 review: a crash BETWEEN the _PUBLISHED marker write and the
    // pointer swap leaves a marked dir that counts toward keep, transiently
    // displacing the newest reader-visible previous snapshot. The next
    // successful swap (pointer O→N) proves every marked version in (O, N)
    // was never reader-visible and unmarks it.
    val root = Files.createTempDirectory("graft-snap8").toString + "/t"
    (0 to 1).foreach(i => SnapshotStore.publish(Seq(i).toDF("x"), root)) // pointer → 1
    // crash in the marker→swap window: data AND marker written, no swap
    Seq(99).toDF("x").write.parquet(s"$root/snapshot-2")
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    f.create(new org.apache.hadoop.fs.Path(s"$root/snapshot-2/_PUBLISHED"), true).close()
    SnapshotStore.publish(Seq(3).toDF("x"), root) // pointer 1→3 unmarks 2
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$root/snapshot-2/_PUBLISHED")))
    // keep=2 retains the reader-visible {1, 3}; the crashed 2 is reclaimed
    val removed = SnapshotStore.prune(spark, root, keep = 2)
    assert(removed.toSet === Set("snapshot-0", "snapshot-2"))
    assert(spark.read.parquet(s"$root/snapshot-1").count() === 1)
    assert(SnapshotStore.readLatest(spark, root).head().getInt(0) === 3)
  }

  test("publish aborts on an unparseable _latest pointer, markers intact") {
    // r13 advice: a hand-edited/corrupt pointer must NOT be treated as 'no
    // pointer' — that would drop the unmark floor to -1, strip _PUBLISHED
    // from every genuinely published snapshot, and let the next prune
    // reclaim the whole retention history.
    val root = Files.createTempDirectory("graft-snap-corrupt").toString + "/t"
    (0 to 2).foreach(i => SnapshotStore.publish(Seq(i).toDF("x"), root))
    val markers = (0 to 2).map(v =>
      java.nio.file.Paths.get(s"$root/snapshot-$v/_PUBLISHED"))
    markers.foreach(m => assert(Files.exists(m)))
    // corrupt the pointer the way an operator's stray edit would (drop the
    // Hadoop local-FS checksum sidecar too, or the read fails as a
    // ChecksumException instead of reaching the parse guard under test)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/_latest"), "snapshot-oops\n")
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$root/._latest.crc"))
    val e = intercept[IllegalStateException](
      SnapshotStore.publish(Seq(9).toDF("x"), root))
    assert(e.getMessage.contains("snapshot-oops"), e.getMessage)
    // nothing was unmarked: every published snapshot keeps its marker
    markers.foreach(m => assert(Files.exists(m),
      s"$m stripped by a publish that should have aborted first"))
    // repair the pointer → publish works again and the history is intact
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/_latest"), "snapshot-2\n")
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$root/._latest.crc"))
    SnapshotStore.publish(Seq(9).toDF("x"), root)
    markers.foreach(m => assert(Files.exists(m)))
    assert(SnapshotStore.readLatest(spark, root).count() === 1)
  }

  test("prune leaves versions newer than the pointer alone (in-flight publish)") {
    val root = Files.createTempDirectory("graft-snap5").toString + "/t"
    SnapshotStore.publish(Seq(1).toDF("x"), root)
    // a concurrent publish mid-write: data dir exists, pointer not swapped
    Seq(2).toDF("x").write.parquet(s"$root/snapshot-9")
    val removed = SnapshotStore.prune(spark, root, keep = 1)
    assert(removed.isEmpty)
    assert(spark.read.parquet(s"$root/snapshot-9").count() === 1)
    // before ANY publish, prune is a no-op (no pointer to fence in-flights)
    val root2 = Files.createTempDirectory("graft-snap6").toString + "/t"
    Seq(1).toDF("x").write.parquet(s"$root2/snapshot-0")
    assert(SnapshotStore.prune(spark, root2, keep = 1).isEmpty)
  }
}
