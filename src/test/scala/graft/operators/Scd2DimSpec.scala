package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streamed SCD2 merge's core guarantees: commutative batch
  * application (late updates splice exactly), replay idempotence, and
  * bucket-scoped rewrites.
  */
class Scd2DimSpec extends SparkSpec {

  private def mkUpdates(rows: Seq[(Long, String, String, Long)]): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("user_id", "ts", "segment", "event_id")
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
        col("segment"), col("event_id"))
  }

  private def mkDim0(rows: Seq[(Long, String)]): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("user_id", "segment")
  }

  private def snapshot(path: String): Seq[Row2] =
    Scd2Dim.read(spark, path).collect().toSeq
      .map(r => Row2(r.getLong(0), r.getString(1),
        r.getTimestamp(2).toString, r.getTimestamp(3).toString, r.getBoolean(4)))
      .sortBy(r => (r.user, r.from))

  case class Row2(user: Long, seg: String, from: String, to: String, cur: Boolean)

  test("a late update splices into the middle of the timeline") {
    val path = Files.createTempDirectory("graft_scd2_late_").toString
    Scd2Dim.seed(mkDim0(Seq(7L -> "S0")), "1992-01-01 00:00:00", path)
    Scd2Dim.upsertBatch(spark, mkUpdates(Seq((7L, "2024-01-10 00:00:00", "S2", 2L))), path)
    // t1 < t2 arrives AFTER t2 was applied — row surgery would corrupt this
    Scd2Dim.upsertBatch(spark, mkUpdates(Seq((7L, "2024-01-05 00:00:00", "S1", 1L))), path)
    val rows = snapshot(path)
    assert(rows.map(r => (r.seg, r.from.take(10), r.to.take(10), r.cur)) == Seq(
      ("S0", "1992-01-01", "2024-01-05", false),
      ("S1", "2024-01-05", "2024-01-10", false),
      ("S2", "2024-01-10", "9999-12-31", true)))
  }

  test("batch application is commutative: shuffled slice order converges") {
    val updates = (1 to 60).map { i =>
      (i % 7L, f"2024-02-${i % 28 + 1}%02d 0${i % 9}:00:00", s"S$i", i.toLong)
    }
    val slices = updates.grouped(20).toSeq
    def apply(order: Seq[Int]): Seq[Row2] = {
      val p = Files.createTempDirectory("graft_scd2_comm_").toString
      Scd2Dim.seed(mkDim0((0L to 6L).map(_ -> "BASE")), "1992-01-01 00:00:00", p)
      order.foreach(i => Scd2Dim.upsertBatch(spark, mkUpdates(slices(i)), p))
      snapshot(p)
    }
    val a = apply(Seq(0, 1, 2))
    val b = apply(Seq(2, 0, 1))
    assert(a == b)
  }

  test("at-least-once replay of a batch is idempotent") {
    val path = Files.createTempDirectory("graft_scd2_replay_").toString
    Scd2Dim.seed(mkDim0(Seq(1L -> "A", 2L -> "B")), "1992-01-01 00:00:00", path)
    val b1 = Seq((1L, "2024-03-01 12:00:00", "A2", 10L), (2L, "2024-03-02 12:00:00", "B2", 11L))
    Scd2Dim.upsertBatch(spark, mkUpdates(b1), path)
    val once = snapshot(path)
    Scd2Dim.upsertBatch(spark, mkUpdates(b1), path) // redelivery
    assert(snapshot(path) == once)
  }

  test("a mismatched persisted bucket count fails loudly at the writer") {
    val path = Files.createTempDirectory("graft_scd2_nb_").toString
    Scd2Dim.seed(mkDim0(Seq(1L -> "A")), "1992-01-01 00:00:00", path)
    KeyBuckets.publish(spark, path, nb = 16)
    val e = intercept[IllegalArgumentException] {
      Scd2Dim.upsertBatch(spark,
        mkUpdates(Seq((1L, "2024-01-01 00:00:00", "B", 1L))), path)
    }
    assert(e.getMessage.contains("_graft_buckets"))
  }

  test("a crash before the ledger advance is invisible; the retry completes") {
    // the jointly-atomic commit (r11 verdict task 4): a multi-bucket merge
    // publishes new v= directories for EVERY touched bucket and then
    // advances the root ledger with one atomic rename — a writer killed
    // between the data writes and that rename must leave readers on the
    // pre-merge dimension for ALL buckets (never some merged, some not),
    // and a retry of the same batch must complete cleanly.
    import org.apache.hadoop.fs.Path
    val fs = new Path("/tmp").getFileSystem(spark.sessionState.newHadoopConf())
    val p = Files.createTempDirectory("graft_scd2_crash_").toString
    Scd2Dim.seed(mkDim0((0L to 31L).map(_ -> "BASE")), "1992-01-01 00:00:00", p)
    val before = snapshot(p)
    // updates spanning several keys -> several buckets in one merge
    val batch = (0L to 9L).map(u => (u, "2024-06-01 00:00:00", "NEW", 100L + u))

    // the crash: everything up to (but excluding) the ledger advance
    val Some((v, buckets)) = Scd2Dim.mergeUncommitted(spark, mkUpdates(batch), p)
    assert(buckets.size > 1, "fixture must touch several buckets")
    // the new version directories are ON DISK for every touched bucket...
    buckets.foreach(b => assert(fs.exists(new Path(p, s"kb=$b/v=$v")),
      s"uncommitted rewrite of bucket $b must be staged on disk"))
    // ...and readers see NONE of it — the pre-merge dimension, exactly
    assert(snapshot(p) == before,
      "readers must see the pre-merge dimension across ALL buckets in the crash window")

    // the retry (writer re-entry heals the orphans, then merges) completes
    Scd2Dim.upsertBatch(spark, mkUpdates(batch), p)
    val after = snapshot(p)
    assert(after.size == before.size + batch.size)
    assert(after.filter(_.cur).count(_.seg == "NEW") == batch.size)
    // the orphaned uncommitted version was healed at writer re-entry, and
    // each touched bucket keeps the committed version plus at most the
    // one-generation GC grace (the version readers resolved under the
    // previous ledger — see gcSuperseded)
    buckets.foreach { b =>
      val vs = fs.listStatus(new Path(p, s"kb=$b"))
        .filter(_.getPath.getName.startsWith("v=")).map(_.getPath.getName).toSeq
      assert(vs.sorted == Seq("v=0", "v=1"),
        s"bucket $b must keep the committed version + one grace generation, got $vs")
    }
    assert(!fs.exists(new Path(p + ".merge_stage")))
  }

  test("a reader planned before a commit survives it; reclamation is one merge later") {
    import org.apache.hadoop.fs.Path
    val p = Files.createTempDirectory("graft_scd2_grace_").toString
    val fs = new Path(p).getFileSystem(spark.sessionState.newHadoopConf())
    Scd2Dim.seed(mkDim0((0L to 15L).map(_ -> "BASE")), "1992-01-01 00:00:00", p)
    def touch(seg: String, ts: String, eidBase: Long): Unit =
      Scd2Dim.upsertBatch(spark,
        mkUpdates((0L to 15L).map(u => (u, ts, seg, eidBase + u))), p)
    touch("S1", "2024-01-01 00:00:00", 100L)
    // the reader plans HERE, under the current ledger: its version
    // directories are resolved at construction time
    val planned = Scd2Dim.read(spark, p)
    val expect = snapshot(p)
    // the next merge commits a new version of every bucket and GCs —
    // the one-generation grace must retain the reader's version
    touch("S2", "2024-02-01 00:00:00", 200L)
    val got = planned.collect().toSeq
      .map(r => Row2(r.getLong(0), r.getString(1),
        r.getTimestamp(2).toString, r.getTimestamp(3).toString, r.getBoolean(4)))
      .sortBy(r => (r.user, r.from))
    assert(got == expect,
      "a reader planned before the commit must complete on its exact snapshot")
    // one-generation bound: the two-merges-old seed version is reclaimed
    // (every existing bucket was touched by both merges), the previous
    // committed version is retained
    val v0 = fs.globStatus(new Path(p, "kb=*/v=0"))
    assert(v0 == null || v0.isEmpty,
      "versions superseded two merges ago must be reclaimed")
    assert(fs.globStatus(new Path(p, "kb=*/v=1")).nonEmpty,
      "the previously committed version must survive one GC generation")
  }

  test("a pinned snapshot read survives TWO merges of its buckets; a stale pin is ignored") {
    import org.apache.hadoop.fs.Path
    val p = Files.createTempDirectory("graft_scd2_pin_").toString
    val fs = new Path(p).getFileSystem(spark.sessionState.newHadoopConf())
    Scd2Dim.seed(mkDim0((0L to 15L).map(_ -> "BASE")), "1992-01-01 00:00:00", p)
    def touch(seg: String, ts: String, eidBase: Long): Unit =
      Scd2Dim.upsertBatch(spark,
        mkUpdates((0L to 15L).map(u => (u, ts, seg, eidBase + u))), p)
    val expect = snapshot(p)
    val got = Scd2Dim.withSnapshot(spark, p) { snap =>
      // TWO merges of every bucket commit (and GC) while the bracket is
      // open — the plain-read one-generation grace would have reclaimed
      // the seed version after the second; the reader pin must retain it
      touch("S1", "2024-01-01 00:00:00", 100L)
      touch("S2", "2024-02-01 00:00:00", 200L)
      assert(fs.globStatus(new Path(p, "kb=*/v=0")).nonEmpty,
        "the pinned snapshot's version directories were reclaimed")
      snap.collect().toSeq
        .map(r => Row2(r.getLong(0), r.getString(1),
          r.getTimestamp(2).toString, r.getTimestamp(3).toString, r.getBoolean(4)))
        .sortBy(r => (r.user, r.from))
    }
    assert(got == expect,
      "a pinned snapshot must read its exact resolution across any number of merges")
    // pin released: the next merge reclaims the stale versions
    touch("S3", "2024-03-01 00:00:00", 300L)
    val v0 = fs.globStatus(new Path(p, "kb=*/v=0"))
    assert(v0 == null || v0.isEmpty,
      "versions below every live pin and past the grace must be reclaimed")
    // a pin whose reader crashed (older than the TTL) must not block GC
    val stale = new Path(p, "_reader_pins/pin-crashed")
    val out = fs.create(stale, false)
    try out.write("0".getBytes("UTF-8")) finally out.close()
    fs.setTimes(stale, System.currentTimeMillis() - Scd2Dim.PinTtlMs - 60000L, -1)
    touch("S4", "2024-04-01 00:00:00", 400L)
    val v2 = fs.globStatus(new Path(p, "kb=*/v=2"))
    assert(v2 == null || v2.isEmpty,
      "an expired pin must not block reclamation")
  }

  private def mkChanges(rows: Seq[(Long, String, String, Long, String)]): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("user_id", "ts", "segment", "event_id", "op")
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
        col("segment"), col("event_id"), col("op"))
  }

  test("a changefeed delete closes the current version; a re-insert re-opens") {
    val path = Files.createTempDirectory("graft_scd2_del_").toString
    Scd2Dim.seed(mkDim0(Seq(7L -> "S0", 8L -> "T0")), "1992-01-01 00:00:00", path)
    Scd2Dim.cdcBatch(spark, mkChanges(Seq(
      (7L, "2024-01-05 00:00:00", "S1", 1L, "u"),
      (7L, "2024-01-10 00:00:00", null, 2L, "d"))), path)
    val churned = snapshot(path)
    // 7's current version is CLOSED at the delete ts, no successor row;
    // 8 untouched
    assert(churned.map(r => (r.user, r.seg, r.from.take(10), r.to.take(10), r.cur)) == Seq(
      (7L, "S0", "1992-01-01", "2024-01-05", false),
      (7L, "S1", "2024-01-05", "2024-01-10", false),
      (8L, "T0", "1992-01-01", "9999-12-31", true)))
    // re-insert opens a FRESH version from the re-insert ts
    Scd2Dim.cdcBatch(spark, mkChanges(Seq(
      (7L, "2024-02-01 00:00:00", "S2", 3L, "u"))), path)
    val back = snapshot(path).filter(_.user == 7L)
    assert(back.map(r => (r.seg, r.from.take(10), r.to.take(10), r.cur)) == Seq(
      ("S0", "1992-01-01", "2024-01-05", false),
      ("S1", "2024-01-05", "2024-01-10", false),
      ("S2", "2024-02-01", "9999-12-31", true)))
  }

  test("a LATE delete splices: it closes the version it lands inside") {
    val path = Files.createTempDirectory("graft_scd2_dell_").toString
    Scd2Dim.seed(mkDim0(Seq(7L -> "S0")), "1992-01-01 00:00:00", path)
    Scd2Dim.upsertBatch(spark, mkUpdates(Seq((7L, "2024-03-01 00:00:00", "S1", 9L))), path)
    // a delete OLDER than the open row arrives late — the tombstone must
    // close S0 at its ts and leave the later S1 change point intact
    Scd2Dim.cdcBatch(spark, mkChanges(Seq(
      (7L, "2024-01-15 00:00:00", null, 5L, "d"))), path)
    val rows = snapshot(path)
    assert(rows.map(r => (r.seg, r.from.take(10), r.to.take(10), r.cur)) == Seq(
      ("S0", "1992-01-01", "2024-01-15", false),
      ("S1", "2024-03-01", "9999-12-31", true)))
  }

  test("a NULL op is an upsert row image (null-safe split)") {
    val path = Files.createTempDirectory("graft_scd2_delnull_").toString
    Scd2Dim.seed(mkDim0(Seq(7L -> "S0")), "1992-01-01 00:00:00", path)
    Scd2Dim.cdcBatch(spark, mkChanges(Seq(
      (7L, "2024-01-05 00:00:00", "S1", 1L, null))), path)
    assert(snapshot(path).map(r => (r.seg, r.cur)) ==
      Seq(("S0", false), ("S1", true)))
  }

  test("a pre-tombstone layout fails loudly at the writer, reads stay exact") {
    val path = Files.createTempDirectory("graft_scd2_legacy_").toString
    Scd2Dim.seed(mkDim0(Seq(7L -> "S0")), "1992-01-01 00:00:00", path)
    // simulate a pre-r17 artifact: strip the del column from the stored
    // bucket (rewrite its v=0 files without it)
    val spark0 = spark
    val dirs = new org.apache.hadoop.fs.Path(path)
    val fs = dirs.getFileSystem(spark0.sessionState.newHadoopConf())
    val vdirs = fs.globStatus(new org.apache.hadoop.fs.Path(path, "kb=*/v=*"))
      .filter(_.isDirectory).map(_.getPath)
    vdirs.foreach { vd =>
      val legacy = spark0.read.parquet(vd.toString).drop("del")
      val tmp = vd.toString + ".legacy_tmp"
      legacy.write.mode("overwrite").parquet(tmp)
      fs.delete(vd, true)
      fs.rename(new org.apache.hadoop.fs.Path(tmp), vd)
    }
    // reads inject del = false — exact (a legacy dim holds no tombstones)
    assert(snapshot(path).map(_.seg) == Seq("S0"))
    // writers refuse with the fix named (no silent mixed-schema store)
    val ex = intercept[IllegalArgumentException] {
      Scd2Dim.upsertBatch(spark, mkUpdates(Seq((7L, "2024-01-05 00:00:00", "S1", 1L))), path)
    }
    assert(ex.getMessage.contains("pre-tombstone"), s"wrong failure: ${ex.getMessage}")
  }

  test("a merge rewrites only the touched kb= buckets") {
    val path = Files.createTempDirectory("graft_scd2_prune_").toString
    Scd2Dim.seed(mkDim0((0L to 63L).map(_ -> "BASE")), "1992-01-01 00:00:00", path)
    val dirsBefore = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("kb=")).map(d => d.getName ->
        d.listFiles().map(f => (f.getName, f.lastModified())).toSet).toMap
    assert(dirsBefore.size == Scd2Dim.NB, "seed must populate every bucket")
    // one key -> one bucket touched
    Scd2Dim.upsertBatch(spark, mkUpdates(Seq((5L, "2024-04-01 00:00:00", "X", 99L))), path)
    val dirsAfter = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("kb=")).map(d => d.getName ->
        d.listFiles().map(f => (f.getName, f.lastModified())).toSet).toMap
    val changed = dirsBefore.keys.filter(k => dirsBefore(k) != dirsAfter(k)).toSeq
    assert(changed.size == 1,
      s"exactly one bucket directory must change, got: $changed")
    // and the dim still holds every seeded key
    assert(Scd2Dim.read(spark, path).select("user_id").distinct().count() == 64)
  }
}
