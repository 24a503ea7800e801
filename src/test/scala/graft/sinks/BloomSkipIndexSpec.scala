package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Design claims of [[BloomSkipIndex]] the s21 oracle cannot see: the
  * no-false-negative file selection, the fact that the probe actually
  * PRUNES on a range layout, O(|new files|) maintenance, and the
  * loud-failure geometry/emptiness contracts. */
class BloomSkipIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-bskip-$tag").toString

  private def baseName(s: String): String =
    s.substring(s.lastIndexOf('/') + 1)

  test("lookup equals the direct filter; selection covers every file " +
       "that truly holds a key and prunes the rest on a range layout") {
    val t = graft.sources.Tables(spark, sf)
    val tbl = tmp("t1") + "/tbl"; val idx = tmp("t1") + "/idx"
    val src = t.lineitem.select("l_orderkey", "l_partkey", "l_quantity")
    LayoutSink.writeRangeLayout(src, "l_orderkey", 12, tbl)
    BloomSkipIndex.write(spark, tbl, "l_orderkey", 1 << 13, 5, idx)

    val keys = Seq(1L, 32L, 1000L)
    val got = BloomSkipIndex.lookup(spark, tbl, idx, "l_orderkey", keys)
      .orderBy("l_orderkey", "l_partkey").collect().toSeq
    val want = spark.read.parquet(tbl)
      .filter(col("l_orderkey").isin(keys: _*))
      .orderBy("l_orderkey", "l_partkey").collect().toSeq
    assert(got == want)

    // no false negatives: every file truly containing a key is selected
    val selected = BloomSkipIndex
      .matchingFiles(spark, idx, keys).map(baseName).toSet
    val truth = spark.read.parquet(tbl)
      .filter(col("l_orderkey").isin(keys: _*))
      .select(input_file_name()).distinct()
      .collect().map(r => baseName(r.getString(0))).toSet
    assert(truth.subsetOf(selected))

    // and it PRUNES: 3 clustered keys cannot touch most of 12 range files
    val total = spark.read.parquet(tbl)
      .select(input_file_name()).distinct().count()
    assert(selected.size < total,
      s"selected ${selected.size} of $total files — no pruning happened")
  }

  test("update folds only unindexed files and drops rows for removed " +
       "ones; lookups then see appended data") {
    val t = graft.sources.Tables(spark, sf)
    val tbl = tmp("t2") + "/tbl"; val idx = tmp("t2") + "/idx"
    val src = t.lineitem.select("l_orderkey", "l_partkey")
    LayoutSink.writeRangeLayout(
      src.filter(col("l_orderkey") % 2 === 0), "l_orderkey", 6, tbl)
    BloomSkipIndex.write(spark, tbl, "l_orderkey", 1 << 13, 5, idx)
    val before = spark.read.parquet(idx).count()

    src.filter(col("l_orderkey") % 2 === 1).repartition(3)
      .write.mode("append").parquet(tbl)
    BloomSkipIndex.update(spark, tbl, "l_orderkey", idx)
    val after = spark.read.parquet(idx)
    assert(after.count() == before + 3)
    // exactly one row per live data file
    val liveNames = new java.io.File(tbl).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_")
        && !f.getName.startsWith(".") && f.getName.endsWith(".parquet"))
      .map(_.getName).toSet
    val idxNames = after.select("file").collect()
      .map(r => baseName(r.getString(0))).toSet
    assert(idxNames == liveNames)

    // odd keys live only in appended files; the lookup must find them
    val got = BloomSkipIndex.lookup(spark, tbl, idx, "l_orderkey", Seq(1L, 3L))
      .orderBy("l_orderkey", "l_partkey").collect().toSeq
    val want = spark.read.parquet(tbl)
      .filter(col("l_orderkey").isin(1L, 3L))
      .orderBy("l_orderkey", "l_partkey").collect().toSeq
    assert(got == want && got.nonEmpty)

    // idempotent: a second update with no new files is a no-op
    BloomSkipIndex.update(spark, tbl, "l_orderkey", idx)
    assert(spark.read.parquet(idx).count() == before + 3)
  }

  test("zero surviving files short-circuits to an empty frame with the " +
       "table schema") {
    val t = graft.sources.Tables(spark, sf)
    val tbl = tmp("t3") + "/tbl"; val idx = tmp("t3") + "/idx"
    val src = t.lineitem.select("l_orderkey", "l_partkey")
    LayoutSink.writeRangeLayout(src, "l_orderkey", 4, tbl)
    BloomSkipIndex.write(spark, tbl, "l_orderkey", 1 << 16, 7, idx)
    // a key far outside the domain: with 2^16 bits over ~6k keys the FP
    // rate is ~0, so no file survives and the table is never read
    val out = BloomSkipIndex.lookup(
      spark, tbl, idx, "l_orderkey", Seq(Long.MaxValue - 17))
    assert(out.columns.toSeq == Seq("l_orderkey", "l_partkey"))
    assert(out.count() == 0)
  }

  test("mixed geometry in the artifact fails loudly at probe time") {
    val t = graft.sources.Tables(spark, sf)
    val tbl = tmp("t4") + "/tbl"; val idx = tmp("t4") + "/idx"
    LayoutSink.writeRangeLayout(
      t.lineitem.select("l_orderkey"), "l_orderkey", 4, tbl)
    BloomSkipIndex.write(spark, tbl, "l_orderkey", 1 << 13, 5, idx)
    // poison: one row with a different geometry (a wrong-geometry probe
    // would be a SILENT false negative — the contract is to refuse)
    spark.read.parquet(idx)
      .limit(1)
      .withColumn("n_bits", lit(1 << 14))
      .write.mode("append").parquet(idx)
    val e = intercept[IllegalArgumentException] {
      BloomSkipIndex.matchingFiles(spark, idx, Seq(1L))
    }
    assert(e.getMessage.contains("geometry"))
  }

  test("update on a PARTITIONED layout sees the same recursive file set " +
       "write indexed — maintenance must never empty a good sidecar") {
    val t = graft.sources.Tables(spark, sf)
    val tbl = tmp("t7") + "/tbl"; val idx = tmp("t7") + "/idx"
    val src = t.lineitem.select("l_orderkey", "l_partkey", "l_returnflag")
    src.filter(col("l_orderkey") % 2 === 0)
      .write.partitionBy("l_returnflag").parquet(tbl)
    BloomSkipIndex.write(spark, tbl, "l_orderkey", 1 << 13, 5, idx)
    val before = spark.read.parquet(idx).count()
    assert(before > 0, "partitioned layouts must index their leaf files")
    // no new files: update must be a no-op, not an empty overwrite
    BloomSkipIndex.update(spark, tbl, "l_orderkey", idx)
    assert(spark.read.parquet(idx).count() == before)
    // new files inside partition dirs fold in
    src.filter(col("l_orderkey") % 2 === 1)
      .write.mode("append").partitionBy("l_returnflag").parquet(tbl)
    BloomSkipIndex.update(spark, tbl, "l_orderkey", idx)
    assert(spark.read.parquet(idx).count() > before)
    val got = BloomSkipIndex.lookup(spark, tbl, idx, "l_orderkey", Seq(1L, 2L))
      .orderBy("l_orderkey", "l_partkey").collect().toSeq
    val want = spark.read.parquet(tbl)
      .filter(col("l_orderkey").isin(1L, 2L))
      .orderBy("l_orderkey", "l_partkey").collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("an int-typed key column probes correctly — the hash is " +
       "canonicalized to long, so probe literals and column values agree") {
    import spark.implicits._
    val tbl = tmp("t6") + "/tbl"; val idx = tmp("t6") + "/idx"
    val df = (0 until 1000).map(i => (i, s"v$i")).toDF("k", "v") // k: int
    LayoutSink.writeRangeLayout(df, "k", 4, tbl)
    BloomSkipIndex.write(spark, tbl, "k", 1 << 13, 5, idx)
    val got = BloomSkipIndex.lookup(spark, tbl, idx, "k", Seq(7L, 500L))
      .orderBy("k").collect().toSeq
    val want = spark.read.parquet(tbl).filter(col("k").isin(7, 500))
      .orderBy("k").collect().toSeq
    assert(got == want && got.nonEmpty,
      "int keys must not false-negative against long probe literals")
  }

  test("maintenance diffs canonical FULL paths: identically-named part " +
       "files in different partition dirs are distinct files") {
    import spark.implicits._
    val root = tmp("t8"); val tbl = root + "/tbl"; val idx = root + "/idx"
    (0 until 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(1).write.parquet(tbl + "/p=0")
    BloomSkipIndex.write(spark, tbl, "k", 1 << 13, 5, idx)
    // place a SECOND file with the SAME basename into a new partition dir
    // — exactly what one partitionBy job produces (identical part number
    // + job UUID in every partition dir it writes)
    val stage = root + "/stage"
    (1000 until 1100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(1).write.parquet(stage)
    val p0name = new java.io.File(tbl + "/p=0").listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getName
    val staged = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val p1 = new java.io.File(tbl + "/p=1"); assert(p1.mkdirs())
    java.nio.file.Files.copy(staged.toPath,
      new java.io.File(p1, p0name).toPath)
    // a basename diff would see p=1's file as already indexed and NEVER
    // fold it — a permanent silent false negative on its keys
    BloomSkipIndex.update(spark, tbl, "k", idx)
    assert(spark.read.parquet(idx).count() == 2)
    val got = BloomSkipIndex.lookup(spark, tbl, idx, "k", Seq(1005L))
      .select("k").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1005L), s"same-basename partition file not indexed: $got")
    // remove p=0's file while its same-named twin survives in p=1: the
    // stale row must DROP (a basename diff keeps it, and lookups then
    // try to read a nonexistent path)
    assert(new java.io.File(tbl + s"/p=0/$p0name").delete())
    BloomSkipIndex.update(spark, tbl, "k", idx)
    assert(spark.read.parquet(idx).count() == 1)
    assert(BloomSkipIndex.lookup(spark, tbl, idx, "k", Seq(5L)).isEmpty,
      "key living only in the removed file must now be absent")
    assert(BloomSkipIndex.lookup(spark, tbl, idx, "k", Seq(1005L))
      .select("k").collect().map(_.getLong(0)).toSeq == Seq(1005L))
  }

  private def renameDir(from: String, to: String): Unit =
    assert(new java.io.File(from).renameTo(new java.io.File(to)), s"$from -> $to")

  private def copyDir(from: String, to: String): Unit = {
    val src = java.nio.file.Paths.get(from)
    val dst = java.nio.file.Paths.get(to)
    java.nio.file.Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t): Unit
      else { java.nio.file.Files.copy(p, t): Unit }
    }
  }

  test("a hard crash between the two publish renames self-repairs at the " +
       "next entry point — no manual recovery") {
    val t = graft.sources.Tables(spark, sf)
    val root = tmp("t9"); val tbl = root + "/tbl"; val idx = root + "/idx"
    LayoutSink.writeRangeLayout(
      t.lineitem.select("l_orderkey"), "l_orderkey", 4, tbl)
    BloomSkipIndex.write(spark, tbl, "l_orderkey", 1 << 13, 5, idx)
    val want = BloomSkipIndex.matchingFiles(spark, idx, Seq(1L)).toSet

    // crash point: after rename(idx -> _old), before rename(_next -> idx)
    // — both siblings complete, the index dir missing. Repair must
    // complete the publish from _next (the newer, fully-written state).
    copyDir(idx, idx + "_next")
    renameDir(idx, idx + "_old")
    assert(BloomSkipIndex.matchingFiles(spark, idx, Seq(1L)).toSet == want)
    assert(new java.io.File(idx).exists())
    assert(!new java.io.File(idx + "_old").exists())
    assert(!new java.io.File(idx + "_next").exists())

    // degenerate crash state: only _old survives — repair rewinds to it
    renameDir(idx, idx + "_old")
    assert(BloomSkipIndex.matchingFiles(spark, idx, Seq(1L)).toSet == want)
    assert(new java.io.File(idx).exists())

    // update() repairs too, then proceeds normally
    renameDir(idx, idx + "_old")
    BloomSkipIndex.update(spark, tbl, "l_orderkey", idx)
    assert(BloomSkipIndex.matchingFiles(spark, idx, Seq(1L)).toSet == want)
  }

  test("empty key set is refused") {
    val t = graft.sources.Tables(spark, sf)
    val tbl = tmp("t5") + "/tbl"; val idx = tmp("t5") + "/idx"
    LayoutSink.writeRangeLayout(
      t.lineitem.select("l_orderkey"), "l_orderkey", 2, tbl)
    BloomSkipIndex.write(spark, tbl, "l_orderkey", 1 << 13, 5, idx)
    intercept[IllegalArgumentException] {
      BloomSkipIndex.lookup(spark, tbl, idx, "l_orderkey", Seq.empty)
    }
  }
}
