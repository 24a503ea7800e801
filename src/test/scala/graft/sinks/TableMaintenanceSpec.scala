package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Design claims behind the pl18 gate: the threshold trigger's both
  * branches, index-routed folded lookups staying exact at EVERY point of
  * the merge/maintain lifecycle (stale index + unfolded merges included),
  * the snapshot publish being exactly-once under replay, and each
  * maintenance boundary being crash-recoverable. */
class TableMaintenanceSpec extends SparkSpec {

  private def customers =
    graft.sources.Tables(spark, "/root/testdata/sf0.001").customer

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-maint-$tag").toString

  private def ch1 = customers
    .filter(col("c_custkey") % 7 === 0)
    .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
      (col("c_acctbal") + 500).as("c_acctbal"),
      lit("SEG1").as("c_mktsegment"), lit("U").as("op"))
    .unionByName(customers
      .filter(col("c_custkey") % 11 === 3 && col("c_custkey") % 7 =!= 0)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"), lit("D").as("op")))

  test("lookupThroughIndex equals read().filter at every lifecycle point") {
    val root = tmpDir("lk")
    val tbl = s"$root/tbl"; val idx = s"$root/idx"
    MorTable.writeBase(customers, tbl, "c_custkey")
    BloomSkipIndex.write(spark, s"$tbl/data", "c_custkey", 1 << 13, 5, idx)
    val keys = Seq(3L, 7L, 14L, 33L)
    def check(tag: String): Unit = {
      val got = MorTable.lookupThroughIndex(spark, tbl, "c_custkey", idx, keys)
        .orderBy("c_custkey").collect().map(_.toSeq).toSeq
      val want = MorTable.read(spark, tbl, "c_custkey")
        .filter(col("c_custkey").isin(keys: _*))
        .orderBy("c_custkey").collect().map(_.toSeq).toSeq
      assert(got == want, s"$tag: indexed lookup diverged from folded filter")
    }
    check("fresh base")
    MorTable.merge(ch1, tbl, "c_custkey", "op", 1L)
    check("stale index + one unfolded merge")
    assert(!TableMaintenance.maintain(spark, tbl, "c_custkey", idx, None, 2),
      "one batch below the threshold must no-op")
    check("after the no-op pass")
    assert(TableMaintenance.maintain(spark, tbl, "c_custkey", idx, None, 1),
      "threshold met must fold")
    assert(TableMaintenance.tombstoneBatches(spark, tbl) == 0)
    check("after fold + index refresh")
  }

  test("snapshot publish is exactly-once: a replayed maintenance run at " +
       "the same backlog re-publishes nothing") {
    val root = tmpDir("snap")
    val tbl = s"$root/tbl"; val idx = s"$root/idx"; val snap = s"$root/snap"
    MorTable.writeBase(customers, tbl, "c_custkey")
    BloomSkipIndex.write(spark, s"$tbl/data", "c_custkey", 1 << 13, 5, idx)
    MorTable.merge(ch1, tbl, "c_custkey", "op", 1L)
    assert(TableMaintenance.maintain(spark, tbl, "c_custkey", idx, Some(snap), 1))
    val n1 = LayoutSink.readManifested(spark, snap).count()
    assert(n1 == MorTable.read(spark, tbl, "c_custkey").count())
    // replay the publish leg directly (a crash after compact, before the
    // manifest seal, retries the whole pass; backlog is now 0 so maintain
    // no-ops — a SECOND merge at the same max seq would publish the same
    // batch id, which the manifest short-circuits)
    assert(!LayoutSink.appendExactlyOnceManifest(
      MorTable.read(spark, tbl, "c_custkey"), snap, 1L),
      "same-batch publish must short-circuit")
    assert(LayoutSink.readManifested(spark, snap).count() == n1)
  }

  test("crash between compact and index refresh: lookups stay exact " +
       "(reading more files, never wrong), and the next pass repairs") {
    val root = tmpDir("crash")
    val tbl = s"$root/tbl"; val idx = s"$root/idx"
    MorTable.writeBase(customers, tbl, "c_custkey")
    BloomSkipIndex.write(spark, s"$tbl/data", "c_custkey", 1 << 13, 5, idx)
    MorTable.merge(ch1, tbl, "c_custkey", "op", 1L)
    // simulate the crash window: compact ran, refresh did not
    MorTable.compact(spark, tbl, "c_custkey")
    val keys = Seq(7L, 14L)
    val got = MorTable.lookupThroughIndex(spark, tbl, "c_custkey", idx, keys)
      .orderBy("c_custkey").collect().map(_.toSeq).toSeq
    val want = MorTable.read(spark, tbl, "c_custkey")
      .filter(col("c_custkey").isin(keys: _*))
      .orderBy("c_custkey").collect().map(_.toSeq).toSeq
    assert(got == want,
      "a stale index over a compacted table must read extra, never wrong")
    // the index's rows all point at files compaction removed — the next
    // refresh must rebuild without going empty or stale
    BloomSkipIndex.update(spark, s"$tbl/data", "c_custkey", idx)
    val again = MorTable.lookupThroughIndex(spark, tbl, "c_custkey", idx, keys)
      .orderBy("c_custkey").collect().map(_.toSeq).toSeq
    assert(again == want)
    assert(spark.read.parquet(idx).count() > 0)
  }
}
