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
}
