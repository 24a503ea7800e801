package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Design claims behind the j10/j11 merge-on-read gates: a merge never
  * touches existing files (the O(|changeset|) write bound), sequence
  * numbers order stacked merges correctly, the fold equals the eager
  * merge across multiple changesets, compaction is result-invisible and
  * clears the tombstones, and the base scan's key pruning survives the
  * tombstone anti-join. */
class MorTableSpec extends SparkSpec {

  private def customers =
    graft.sources.Tables(spark, "/root/testdata/sf0.001").customer

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-mor-$tag").toString

  private def listData(dir: String): Set[(String, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(s"$dir/data"))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getPath, f.lastModified)).toSet
  }

  private def changes1 = customers
    .filter(col("c_custkey") % 7 === 0)
    .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
      (col("c_acctbal") + 500).as("c_acctbal"),
      lit("SEG1").as("c_mktsegment"), lit("U").as("op"))
    .unionByName(customers.filter(col("c_custkey") % 11 === 3)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"), lit("D").as("op")))
    // delete-wins on the %7 ∩ %11 overlap, and one op per key (the
    // applyChanges contract both forms share)
    .withColumn("__rk", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("c_custkey")
        .orderBy(col("op").desc)))
    .filter(col("__rk") === 1).drop("__rk")

  // second changeset: re-update some survivors, re-insert a deleted key
  private def changes2 = customers
    .filter(col("c_custkey") % 7 === 0 && col("c_custkey") % 3 === 0)
    .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
      lit(-1.0).as("c_acctbal"), lit("SEG2").as("c_mktsegment"),
      lit("U").as("op"))
    .unionByName(customers.filter(col("c_custkey") === 14) // 14 % 7 = 0
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"), lit("D").as("op")))
    .withColumn("__rk", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("c_custkey")
        .orderBy(col("op").desc)))
    .filter(col("__rk") === 1).drop("__rk")

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("c_custkey").collect().map(_.toSeq).toSeq

  test("a merge writes new files only — every base file survives " +
       "byte-identical (the O(|changeset|) write bound)") {
    val dir = tmpDir("writebound")
    MorTable.writeBase(customers, dir, "c_custkey")
    val before = listData(dir)
    MorTable.merge(changes1, dir, "c_custkey", "op", 1L)
    val after = listData(dir)
    assert(before.subsetOf(after),
      "merge must never rewrite or touch an existing base file")
    assert(after.size > before.size, "merge must append its rows")
  }

  test("two stacked merges fold to exactly the eager merge of both " +
       "changesets (sequence ordering: later tombstones mask earlier " +
       "versions, never their own batch's rows)") {
    val dir = tmpDir("stacked")
    MorTable.writeBase(customers, dir, "c_custkey")
    MorTable.merge(changes1, dir, "c_custkey", "op", 1L)
    MorTable.merge(changes2, dir, "c_custkey", "op", 2L)
    val mor = MorTable.read(spark, dir, "c_custkey")
    val eager = graft.operators.Merge.applyChanges(
      graft.operators.Merge.applyChanges(customers, changes1,
        Seq("c_custkey"), "op"),
      changes2, Seq("c_custkey"), "op")
    assert(sortedRows(mor.select(eager.columns.map(col).toIndexedSeq: _*))
      == sortedRows(eager),
      "merge-on-read fold must equal the eager double merge")
  }

  test("compaction is result-invisible, clears the tombstones, and " +
       "restores the single-base layout") {
    val dir = tmpDir("compact")
    MorTable.writeBase(customers, dir, "c_custkey")
    MorTable.merge(changes1, dir, "c_custkey", "op", 1L)
    MorTable.merge(changes2, dir, "c_custkey", "op", 2L)
    val before = sortedRows(MorTable.read(spark, dir, "c_custkey"))
    MorTable.compact(spark, dir, "c_custkey")
    assert(!new java.io.File(s"$dir/deletes").exists,
      "compaction must clear the delete files")
    val foldedDf = MorTable.read(spark, dir, "c_custkey")
    val after = sortedRows(foldedDf)
    assert(after == before, "compaction must not change the folded state")
    // a third merge on the compacted table keeps working — sequences are
    // lifetime-monotone, so it must exceed the re-stamped base (seq 2);
    // pin the collected pre-merge state so the lazy read cannot pick up
    // the new files
    val foldedLocal = spark.createDataFrame(
      java.util.Arrays.asList(foldedDf.collect(): _*), foldedDf.schema)
    MorTable.merge(changes1, dir, "c_custkey", "op", 3L)
    val eager3 = graft.operators.Merge.applyChanges(foldedLocal, changes1,
      Seq("c_custkey"), "op")
    assert(sortedRows(MorTable.read(spark, dir, "c_custkey")
        .select(eager3.columns.map(col).toIndexedSeq: _*))
      == sortedRows(eager3),
      "post-compaction merges must fold to the eager merge of the " +
        "compacted state")
  }

  test("a crashed first merge (tombstone dir created, no part files yet) " +
       "reads as the pre-merge table, never as an unreadable one") {
    val dir = tmpDir("crashwin")
    MorTable.writeBase(customers, dir, "c_custkey")
    // the documented crash window: data-before-tombstones, Overwrite
    // created deletes/__seq=1/ but no parquet landed before the crash
    assert(new java.io.File(s"$dir/deletes/$SeqColName=1").mkdirs())
    val got = sortedRows(MorTable.read(spark, dir, "c_custkey")
      .select(customers.columns.map(col).toIndexedSeq: _*))
    assert(got == sortedRows(customers),
      "an empty tombstone directory must fold as zero deletes")
  }

  private val SeqColName = "__seq"

  private def changes1Evolved = changes1.withColumn("c_tier",
    when(col("c_acctbal") > 5000, lit("gold")).otherwise(lit("std")))

  test("additive evolution: an evolved merge null-backfills old rows at " +
       "read, keeps the write bound, folds to the eager merge, and " +
       "replays convergently at the same seq") {
    val dir = tmpDir("evolve")
    MorTable.writeBase(customers, dir, "c_custkey")
    val before = listData(dir)
    MorTable.merge(changes1Evolved, dir, "c_custkey", "op", 1L)
    // the evolution is O(|changeset|) too: no base file touched
    assert(before.subsetOf(listData(dir)),
      "an evolved merge must never rewrite a base file")
    val mor = MorTable.read(spark, dir, "c_custkey")
    assert(mor.columns.contains("c_tier"), "read must surface the new column")
    // old rows read back null; merged rows carry the written values
    val eager = graft.operators.Merge.applyChanges(
      customers.withColumn("c_tier", lit(null).cast("string")),
      changes1Evolved, Seq("c_custkey"), "op")
    assert(sortedRows(mor.select(eager.columns.map(col).toIndexedSeq: _*))
      == sortedRows(eager),
      "evolved fold must equal the eager merge with null-backfilled base")
    // at-least-once replay of the SAME evolved merge converges
    MorTable.merge(changes1Evolved, dir, "c_custkey", "op", 1L)
    assert(sortedRows(MorTable.read(spark, dir, "c_custkey")
        .select(eager.columns.map(col).toIndexedSeq: _*))
      == sortedRows(eager),
      "replaying an evolved merge must converge, not duplicate")
  }

  test("evolution crash windows: a stale (narrow) sidecar still reads the " +
       "whole table minus the new column; a widened sidecar over data " +
       "that never landed reads all-null for it") {
    val dir = tmpDir("evolvecrash")
    MorTable.writeBase(customers, dir, "c_custkey")
    MorTable.merge(changes1Evolved, dir, "c_custkey", "op", 1L)
    val wide = java.nio.file.Paths.get(s"$dir/_schema/schema.json")
    val wideJson = java.nio.file.Files.readString(wide)
    // tampering below bypasses the Hadoop local FS, so its checksum
    // sidecar (.schema.json.crc) goes stale — drop it or reads fail on
    // the CRC, which is a test-harness artifact, not a product path
    def dropCrc(): Unit = {
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"$dir/_schema/.schema.json.crc")): Unit
    }
    // window (a): data landed, crash before the sidecar publish — readers
    // pin the OLD schema; the new column is invisible but nothing breaks
    java.nio.file.Files.writeString(wide,
      org.apache.spark.sql.types.StructType(
        customers.schema.fields).json)
    dropCrc()
    val narrow = MorTable.read(spark, dir, "c_custkey")
    assert(!narrow.columns.contains("c_tier"),
      "pre-publish readers must see the old schema")
    val eagerNarrow = graft.operators.Merge.applyChanges(
      customers, changes1, Seq("c_custkey"), "op")
    assert(sortedRows(narrow.select(
        eagerNarrow.columns.map(col).toIndexedSeq: _*))
      == sortedRows(eagerNarrow),
      "the narrow read must still fold every row correctly")
    // window (b): sidecar widened, crash before the data write — every
    // file lacks the column, the read backfills all-null
    java.nio.file.Files.writeString(wide, wideJson)
    dropCrc()
    val dataDir = new java.io.File(s"$dir/data/$SeqColName=1")
    dataDir.listFiles.foreach(f => assert(f.delete()))
    assert(dataDir.delete())
    val allNull = MorTable.read(spark, dir, "c_custkey")
    assert(allNull.columns.contains("c_tier"))
    assert(allNull.filter(col("c_tier").isNotNull).count() == 0,
      "with no post-evolution data file, the column is all null")
  }

  test("compaction across the evolution boundary materializes the widened " +
       "schema physically and stays result-invisible") {
    val dir = tmpDir("evolvecompact")
    MorTable.writeBase(customers, dir, "c_custkey")
    MorTable.merge(changes1Evolved, dir, "c_custkey", "op", 1L)
    val before = sortedRows(MorTable.read(spark, dir, "c_custkey"))
    MorTable.compact(spark, dir, "c_custkey")
    assert(sortedRows(MorTable.read(spark, dir, "c_custkey")) == before,
      "compaction must not change the folded state")
    // every compacted file physically carries the new column now — no
    // backfill left to do (footer-level check, not sidecar-level)
    val files = new java.io.File(s"$dir/data").listFiles
      .filter(_.getName.startsWith(s"$SeqColName="))
      .flatMap(_.listFiles).filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val footer = spark.read.parquet(f.getPath)
      assert(footer.columns.contains("c_tier"),
        s"compacted file ${f.getName} must materialize the widened schema")
    }
    // post-compaction evolved state accepts further merges
    MorTable.merge(changes2.withColumn("c_tier", lit("v2")), dir,
      "c_custkey", "op", 2L)
    val again = MorTable.read(spark, dir, "c_custkey")
    assert(again.filter(col("c_tier") === "v2").count() > 0)
  }

  test("a changeset missing a stored column is refused loudly — evolution " +
       "is additive only") {
    val dir = tmpDir("evolverefuse")
    MorTable.writeBase(customers, dir, "c_custkey")
    val e = intercept[IllegalArgumentException] {
      MorTable.merge(changes1.drop("c_mktsegment"), dir, "c_custkey", "op", 1L)
    }
    assert(e.getMessage.contains("c_mktsegment"))
  }

  test("streaming CDC intake: micro-batches land as sequenced merges, " +
       "the folded state equals the eager double merge, and a replayed " +
       "batch (at-least-once delivery) converges instead of duplicating") {
    val dir = tmpDir("stream"); val ckpt = tmpDir("stream-ckpt")
    MorTable.writeBase(customers, dir, "c_custkey")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment", "op")
    def tuples(df: org.apache.spark.sql.DataFrame) =
      df.select(col("c_custkey").cast("long"), col("c_name"),
          col("c_nationkey").cast("long"), col("c_acctbal").cast("double"),
          col("c_mktsegment"), col("op"))
        .as[(Long, String, Long, Double, String, String)].collect().toSeq
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long, Double, String, String)]
    val q = graft.streaming.EventStreams.streamChangesToMor(
      ms.toDF().toDF(cols: _*), dir, "c_custkey", "op", ckpt)
    try {
      ms.addData(tuples(changes1): _*); q.processAllAvailable()
      ms.addData(tuples(changes2): _*); q.processAllAvailable()
    } finally q.stop()
    val eager = graft.operators.Merge.applyChanges(
      graft.operators.Merge.applyChanges(customers, changes1,
        Seq("c_custkey"), "op"),
      changes2, Seq("c_custkey"), "op")
    def folded() = sortedRows(MorTable.read(spark, dir, "c_custkey")
      .select(eager.columns.map(col).toIndexedSeq: _*))
    val want = sortedRows(eager)
    assert(folded() == want,
      "streamed merges must fold to the eager double merge")
    // foreachBatch replays a batch after a crash — the same-sequence
    // overwrite commit must converge to the identical state
    MorTable.merge(changes1, dir, "c_custkey", "op", 1L)
    assert(folded() == want, "a replayed batch must not change the state")
  }

  test("the tombstone anti-join preserves key pushdown on the data scan " +
       "(file pruning stays live at 100 TB)") {
    val dir = tmpDir("prune")
    MorTable.writeBase(customers, dir, "c_custkey")
    MorTable.merge(changes1, dir, "c_custkey", "op", 1L)
    val plan = MorTable.read(spark, dir, "c_custkey")
      .filter(col("c_custkey") < 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_custkey), " +
      "LessThan(c_custkey,50)]") ||
      plan.contains("LessThan(c_custkey,50)"),
      s"key predicate must reach the parquet scan:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      "the tombstone fold must stay an equi anti-join")
  }
}
