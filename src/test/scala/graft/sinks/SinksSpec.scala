package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** S7-S11 sink semantics: round-trips, batching, success accounting below
  * the 0.8 threshold, dry-run side-effect freedom, whole-tree read-back. */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-sink-test").toString

  private def records = DocumentSink.prepare(
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"),
    lit("things"), col("id"))

  test("document sink round-trips rows losslessly through JSON") {
    val dir = tmp()
    DocumentSink.write(records, dir)
    val back = graft.sources.Tables.documentSinkScan(spark, dir)
    assert(back.count() === 3L)
    val names = back.select(get_json_object($"data", "$.name").as("n"))
      .collect().map(_.getString(0)).sorted
    assert(names.toSeq === Seq("a", "b", "c"))
    assert(back.select("collection").distinct().head.getString(0) === "things")
  }

  test("batched sink: all records committed → report ok, files readable") {
    val dir = tmp() + "/batches"
    val report = DocumentSink.writeBatched(records,
      new DocumentSink.LocalJsonBatchWriter(dir), batchSize = 2)
    assert(report.total === 3L)
    assert(report.succeeded === 3L)
    assert(report.ok)
    assert(spark.read.json(dir).count() === 3L)
  }

  test("batched sink: successive invocations to one dir append, never clobber") {
    val dir = tmp() + "/multi"
    DocumentSink.writeBatched(records, new DocumentSink.LocalJsonBatchWriter(dir), 2)
    DocumentSink.writeBatched(records, new DocumentSink.LocalJsonBatchWriter(dir), 2)
    // same writer instance reused across separate jobs must not clobber either
    val shared = new DocumentSink.LocalJsonBatchWriter(dir)
    DocumentSink.writeBatched(records, shared, 2)
    DocumentSink.writeBatched(records, shared, 2)
    assert(spark.read.json(dir).count() === 12L)
  }

  test("batched sink: failing transport → warn-and-continue, ok=false below 0.8") {
    val failing = new DocumentSink.BatchWriter {
      def commit(batch: Seq[(String, String, String)]): Int =
        throw new RuntimeException("transport down")
    }
    val report = DocumentSink.writeBatched(records, failing, batchSize = 1)
    assert(report.total === 3L)
    assert(report.succeeded === 0L)
    assert(!report.ok)
  }

  test("success ratio boundary: exactly 0.8 passes, below fails") {
    assert(DocumentSink.UploadReport(10, 8).ok)
    assert(!DocumentSink.UploadReport(10, 7).ok)
    assert(DocumentSink.UploadReport(0, 0).ok) // vacuous success
  }

  test("dry run previews deterministically and writes nothing") {
    val dir = tmp() + "/never-created"
    val preview = DocumentSink.dryRun(records, Seq(col("document_id").cast("long")), 2)
      .collect()
    assert(preview.length === 2)
    assert(preview.map(_.getAs[String]("document_id")).toSeq === Seq("1", "2"))
    assert(!new java.io.File(dir).exists)
  }

  test("whole-tree sink writes one keyed JSON object; read-back verifies") {
    val file = tmp() + "/tree.json"
    val df = Seq((10L, "x", 1.5), (20L, "y", 2.5)).toDF("id", "name", "score")
    TreeSink.writeWholeTree(df, "id", file)
    val back = TreeSink.readWholeTree(spark, file)
    assert(back.count() === 2L)
    val scores = back.select(get_json_object($"rec", "$.score").cast("double"))
      .collect().map(_.getDouble(0)).sorted
    assert(scores.toSeq === Seq(1.5, 2.5))
    // id column excluded from the record once it is the map key (P18)
    assert(back.select(get_json_object($"rec", "$.id")).head.isNullAt(0))
    // single JSON object on disk
    val raw = new String(Files.readAllBytes(java.nio.file.Paths.get(file)), "UTF-8")
    assert(raw.startsWith("{") && raw.endsWith("}"))
  }

  test("pac node + per-path rows produce the reference tree shape") {
    val agg = Seq(("b1", 2024L, 10.0, 20.0)).toDF("brand_id", "cycle", "democrat", "republican")
    val paths = TreeSink.preparePaths(agg,
      Seq(lit("brands"), $"brand_id", lit("records"), $"cycle", lit("pac")),
      TreeSink.pacNode($"democrat", $"republican"))
    val row = paths.head
    assert(row.getString(0) === "brands/b1/records/2024/pac")
    assert(row.getString(1) === """{"pac":{"democrat":10.0,"republican":20.0}}""")
  }

  test("range layout writes files covering disjoint sorted key ranges") {
    val df = spark.range(0, 10000).toDF("k")
      .select((col("k") * 2654435761L % 10000).as("k")) // scrambled input
    val out = tmp()
    LayoutSink.writeRangeLayout(df, "k", 4, out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(files.length === 4)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("k"), max("k")).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    // disjoint, ordered ranges: every file's min exceeds the previous max
    ranges.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(lo2 > hi, s"file ranges overlap: $ranges")
    }
    // nothing lost through the shuffle+sort
    assert(spark.read.parquet(out).count() === 10000)
  }

  test("z-order layout prunes the second dimension where a linear sort cannot") {
    // 64×64 uniform grid: z-order files cover compact (x, y) regions;
    // x-sorted files cover x-stripes spanning ALL of y.
    val grid = spark.range(0, 64L * 64).toDF("i")
      .select((col("i") / 64).cast("long").as("x"), (col("i") % 64).as("y"))
    val zOut = tmp(); val linOut = tmp()
    LayoutSink.writeZOrderLayout(grid, "x", "y", 16, zOut, bits = 6)
    LayoutSink.writeRangeLayout(grid, "x", 16, linOut)
    // files a reader filtering y < 8 must open, by per-file min/max stats
    def filesOverlapping(dir: String): Int =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
        .count { f =>
          val r = spark.read.parquet(f.toString).agg(min("y"), max("y")).head
          r.getLong(0) < 8 // yMin < 8 ⇒ the file intersects the slice
        }
    val zFiles = filesOverlapping(zOut)
    val linFiles = filesOverlapping(linOut)
    assert(linFiles === 16, "x-stripes all span the full y range")
    assert(zFiles <= 8, s"z-order must bound the y extent per file ($zFiles)")
    assert(spark.read.parquet(zOut).count() === 64L * 64)
  }

  test("compact collapses a fragmented table to byte-derived file counts") {
    def parquetFiles(dir: String) = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val in = tmp(); val out = tmp(); val outSorted = tmp()
    spark.range(0, 20000).toDF("k").repartition(50)
      .write.mode("overwrite").parquet(in)
    assert(parquetFiles(in).length === 50, "fixture must be fragmented")
    val total = parquetFiles(in).map(_.length).sum
    // target a quarter of the bytes per file → ceil(4) output files
    val n = LayoutSink.compact(spark, in, out, (total + 3) / 4)
    assert(n === 4 && parquetFiles(out).length === 4)
    // lossless: same rows, same sum
    val back = spark.read.parquet(out).agg(count(lit(1)), sum("k")).head
    assert(back.getLong(0) === 20000L && back.getLong(1) === 19999L * 10000)
    // sortCol variant compacts AND restores disjoint per-file key ranges
    LayoutSink.compact(spark, in, outSorted, (total + 3) / 4, Some("k"))
    val ranges = parquetFiles(outSorted).map { f =>
      val r = spark.read.parquet(f.toString).agg(min("k"), max("k")).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(lo2 > hi, "ranges must be disjoint")
      case _ =>
    }
  }

  test("quantized z-order prunes domains far wider than the bit budget") {
    // Same 64×64 grid, but each dimension stretched to a domain the raw
    // 6-bit interleave cannot hold (x up to ~63e9, y offset + stride):
    // min/max scaling must recover the grid before interleaving.
    val grid = spark.range(0, 64L * 64).toDF("i")
      .select(((col("i") / 64).cast("long") * 1000000007L).as("x"),
        ((col("i") % 64) * 97L + 5L).as("y"))
    val out = tmp()
    LayoutSink.writeZOrderLayoutQuantized(grid, "x", "y", 16, out, bits = 6)
    val yCut = 8L * 97L + 5L // the scaled image of the y < 8 slice
    val zFiles = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .count { f =>
        spark.read.parquet(f.toString).agg(min("y")).head.getLong(0) < yCut
      }
    assert(zFiles <= 8, s"quantized z-order must bound the y extent ($zFiles)")
    // nothing lost, values untouched (the z column never survives the write)
    val back = spark.read.parquet(out)
    assert(back.count() === 64L * 64)
    assert(back.columns.sorted === Array("x", "y"))
    assert(back.agg(max("x"), max("y")).head ===
      org.apache.spark.sql.Row(63L * 1000000007L, 63L * 97L + 5L))
  }
}
