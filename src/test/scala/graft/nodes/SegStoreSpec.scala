package graft.nodes

import org.scalatest.funsuite.AnyFunSuite

/** Direct drills for the columnar MoR state store (in-package so the
  * private[nodes] surface is reachable): per-wave FILE-COUNT control
  * (VERDICT r16 next #3 — a delta-sized wave must land as ONE parquet
  * file, not ~shuffle.partitions), composite-key tombstone channels
  * (the MinHash/DHash bucket-drop carrier), the generation rule under
  * them, and the deferred one-fold file-retirement ledger (ADVICE r16:
  * disk usage must stay bounded at ~2 fold generations). */
class SegStoreSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  import org.apache.spark.storage.StorageLevel

  private def parquetLeaves(root: java.io.File): Seq[java.io.File] =
    if (!root.exists()) Nil
    else org.apache.commons.io.FileUtils
      .listFiles(root, Array("parquet"), true)
      .toArray(Array.empty[java.io.File]).toSeq

  private def dataDirs(root: java.io.File): Seq[String] =
    parquetLeaves(root).map(_.getParentFile.getName).distinct.sorted

  test("a delta-sized wave lands as exactly ONE parquet file (segments " +
    "and tombstones), even when the input plan is shuffle-partitioned") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_segspec_").toString
    val st = new SegStore("spec", root = Some(tmp))
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .persist(StorageLevel.MEMORY_AND_DISK)
    st.reset(base)
    // a grouped frame comes out of a shuffle: without file-count control
    // this writes one part file per shuffle partition
    val delta = spark.range(8).selectExpr("id + 10 as id")
      .groupBy("id").count().selectExpr("id", "cast(id as string) as v")
    st.appendSegment(delta)
    st.appendTombstones("id", Seq(1L).toDF("id"))
    val dirs = new java.io.File(tmp).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.startsWith("part-"))
    assert(dirs.length == 2, s"expected 2 wave dirs, got ${dirs.toSeq}")
    dirs.foreach { d =>
      val files = parquetLeaves(d)
      assert(files.length == 1,
        s"wave ${d.getName} wrote ${files.length} part files — the " +
          "delta-sized wave must coalesce to one")
    }
    assert(st.live.count() == 9) // 2 base - 1 tombstoned + 8 segment
    st.unpersistAll()
  }

  test("composite-key tombstones kill every live row of the bucket at " +
    "their generation, and a LATER re-insert of the same bucket survives") {
    import spark.implicits._
    val st = new SegStore("spec2")
    val base = Seq((0, 10L, "x1"), (0, 10L, "x2"), (1, 20L, "y"))
      .toDF("band", "band_hash", "member").persist(StorageLevel.MEMORY_AND_DISK)
    st.reset(base)
    // drop bucket (0, 10) whole
    st.appendTombstones(Seq("band", "band_hash"), Seq((0, 10L)).toDF("band", "band_hash"))
    assert(st.live.select("member").collect().map(_.getString(0)).toSet == Set("y"))
    // a later wave repopulates the dropped bucket: generation rule keeps it
    st.appendSegment(Seq((0, 10L, "x3")).toDF("band", "band_hash", "member"))
    assert(st.live.select("member").collect().map(_.getString(0)).toSet ==
      Set("y", "x3"))
    // a SECOND drop of the same bucket kills the re-insert too
    st.appendTombstones(Seq("band", "band_hash"), Seq((0, 10L)).toDF("band", "band_hash"))
    assert(st.live.select("member").collect().map(_.getString(0)).toSet == Set("y"))
    st.unpersistAll()
  }

  test("fold retires files ONE FOLD LATE: the pre-fold generation's files " +
    "survive the fold that supersedes them and are deleted by the next " +
    "one — disk stays bounded at ~2 generations") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_segspec_f_").toString
    val st = new SegStore("spec3", root = Some(tmp), foldEvery = 2)
    st.reset(Seq((1L, "a")).toDF("id", "v").persist(StorageLevel.MEMORY_AND_DISK))
    st.appendSegment(Seq((2L, "b")).toDF("id", "v"))
    // the store dir materializes lazily on the first write
    val storeDir = new java.io.File(tmp).listFiles().filter(_.isDirectory).head
    st.appendSegment(Seq((3L, "c")).toDF("id", "v"))
    assert(st.needsFold)
    val n = st.fold()
    assert(n == 3L, s"fold must return the new base row count, got $n")
    // generation 1's wave files (part-0, part-1) retired but NOT deleted:
    // frames handed out before the fold may still reference them lazily
    val afterFold1 = dataDirs(storeDir)
    assert(afterFold1.count(_.startsWith("part-")) == 2 &&
      afterFold1.count(_.startsWith("fold-")) == 1,
      s"after fold 1: $afterFold1")
    st.appendSegment(Seq((4L, "d")).toDF("id", "v"))
    st.appendSegment(Seq((5L, "e")).toDF("id", "v"))
    assert(st.fold() == 5L)
    // fold 2 deletes generation 1's retired files; generation 2's (the
    // waves between the folds + fold 1's own file) are now retired
    val afterFold2 = dataDirs(storeDir)
    assert(afterFold2.count(_.startsWith("part-")) == 2 &&
      afterFold2.count(_.startsWith("fold-")) == 2,
      s"after fold 2 the pre-fold-1 wave files must be gone: $afterFold2")
    assert(st.live.count() == 5)
    st.unpersistAll()
  }
}
