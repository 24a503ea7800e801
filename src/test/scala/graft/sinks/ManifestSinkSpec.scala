package graft.sinks

import graft.SparkSpec
import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.functions._

/** A local FileSystem whose rename is COPY+DELETE — the S3-family shape:
  * the destination appears while the source still exists, directories
  * move file by file, and a reader listing mid-rename observes partial
  * state. The manifest commit protocol must be exactly-once on top of
  * this, because it never depends on rename at all. */
class CopyDeleteRenameFileSystem
    extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "cdrename"
  override def getUri: java.net.URI = java.net.URI.create("cdrename:///")
  override def rename(src: Path, dst: Path): Boolean = {
    CopyDeleteRenameFileSystem.renames.incrementAndGet()
    // copy then delete — non-atomic, like an object-store "rename"
    FileUtil.copy(this, src, this, dst, true, getConf)
  }
}
object CopyDeleteRenameFileSystem {
  val renames = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** The exactly-once replay/straggler contract of
  * [[LayoutSink.appendExactlyOnceManifest]] over a filesystem whose
  * rename is non-atomic (copy+delete) — the round-16 verdict's "make the
  * S3 escape real" task: commit = immutable manifest, readers resolve
  * via manifests, replay detection keys on manifest presence. */
class ManifestSinkSpec extends SparkSpec {

  private lazy val scheme: String = {
    spark.sparkContext.hadoopConfiguration.set("fs.cdrename.impl",
      classOf[CopyDeleteRenameFileSystem].getName)
    "cdrename"
  }

  private def tmpTable(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft-manifest-$tag").toString
    s"$scheme://$d/table"
  }

  private def batch(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"row$i")).toDF("id", "payload")
  }

  private def readIds(path: String): Seq[Long] =
    LayoutSink.readManifested(spark, path)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("commit → read-back; replay returns false and changes nothing; " +
       "distinct batches union — all over a copy+delete-rename fs") {
    val tbl = tmpTable("basic")
    assert(LayoutSink.appendExactlyOnceManifest(batch(0, 10), tbl, 0L))
    assert(readIds(tbl) == (0L until 10L))
    // replay of the same batch id: manifest short-circuits
    assert(!LayoutSink.appendExactlyOnceManifest(batch(0, 10), tbl, 0L))
    assert(readIds(tbl) == (0L until 10L))
    assert(LayoutSink.appendExactlyOnceManifest(batch(10, 15), tbl, 1L))
    assert(readIds(tbl) == (0L until 15L))
  }

  test("time travel: asOfBatch reads exactly the manifests with id <= N, " +
       "snapshots coexist, and an empty snapshot fails loudly") {
    val tbl = tmpTable("asof")
    assert(LayoutSink.appendExactlyOnceManifest(batch(0, 5), tbl, 0L))
    assert(LayoutSink.appendExactlyOnceManifest(batch(5, 9), tbl, 1L))
    assert(LayoutSink.appendExactlyOnceManifest(batch(9, 12), tbl, 2L))
    def ids(asOf: Long): Seq[Long] =
      LayoutSink.readManifested(spark, tbl, asOf)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(0L) == (0L until 5L))
    assert(ids(1L) == (0L until 9L))
    // both snapshots and the latest view are live at once — immutable
    // manifests share the same part files
    assert(ids(Long.MaxValue) == (0L until 12L))
    assert(readIds(tbl) == (0L until 12L))
    intercept[IllegalArgumentException] {
      LayoutSink.readManifested(spark, tbl, -1L)
    }
  }

  test("a crashed attempt (parts written, no manifest) is invisible to " +
       "readers; the retry commits fresh and the sweep reclaims the orphan") {
    val tbl = tmpTable("crash")
    assert(LayoutSink.appendExactlyOnceManifest(batch(0, 5), tbl, 0L))
    // simulate a crashed attempt of batch 1: an attempt-shaped dir full
    // of parts, with no manifest ever written
    val fs = new Path(tbl).getFileSystem(
      spark.sessionState.newHadoopConf())
    batch(90, 99).write.parquet(s"$tbl/batch1-deadbeefdead")
    assert(readIds(tbl) == (0L until 5L),
      "uncommitted parts must be invisible to manifest readers")
    // the retry commits under a fresh attempt dir
    assert(LayoutSink.appendExactlyOnceManifest(batch(5, 8), tbl, 1L))
    assert(readIds(tbl) == (0L until 8L),
      "the retry's rows, never the crashed attempt's, are the batch")
    // the sweep removes the orphan (its batch has a sealed manifest
    // naming a different attempt) and leaves committed attempts alone
    assert(LayoutSink.sweepOrphanAttempts(spark, tbl) == 1)
    assert(!fs.exists(new Path(s"$tbl/batch1-deadbeefdead")))
    assert(readIds(tbl) == (0L until 8L))
    assert(LayoutSink.sweepOrphanAttempts(spark, tbl) == 0)
  }

  test("a crashed mid-write manifest (unsealed: no count trailer) does " +
       "not block the retry and is not readable") {
    val tbl = tmpTable("unsealed")
    assert(LayoutSink.appendExactlyOnceManifest(batch(0, 5), tbl, 0L))
    val fs = new Path(tbl).getFileSystem(
      spark.sessionState.newHadoopConf())
    // batch 1's committer crashed after writing half the manifest
    val out = fs.create(new Path(s"$tbl/_manifest_batch1"), false)
    out.write("batch1-aaaaaaaaaaaa/part-00000.parquet\n".getBytes)
    out.close()
    assert(readIds(tbl) == (0L until 5L),
      "an unsealed manifest must not be readable")
    assert(LayoutSink.appendExactlyOnceManifest(batch(5, 9), tbl, 1L),
      "the retry must take over a provably-dead unsealed manifest")
    assert(readIds(tbl) == (0L until 9L))
  }

  test("losing the one-winner gate: a pre-existing sealed manifest makes " +
       "the late committer a replay, and its attempt files are reclaimed") {
    val tbl = tmpTable("race")
    assert(LayoutSink.appendExactlyOnceManifest(batch(0, 5), tbl, 0L))
    val fs = new Path(tbl).getFileSystem(
      spark.sessionState.newHadoopConf())
    val attemptsBefore = fs.listStatus(new Path(tbl))
      .count(_.getPath.getName.startsWith("batch"))
    assert(!LayoutSink.appendExactlyOnceManifest(batch(50, 60), tbl, 0L))
    assert(readIds(tbl) == (0L until 5L))
    val attemptsAfter = fs.listStatus(new Path(tbl))
      .count(_.getPath.getName.startsWith("batch"))
    assert(attemptsAfter == attemptsBefore,
      "the losing attempt's directory must be reclaimed")
  }

  test("the non-atomic rename really was exercised (the mock is live) " +
       "and the commit protocol itself never renames: visibility flips " +
       "only at manifest creation") {
    CopyDeleteRenameFileSystem.renames.set(0)
    val tbl = tmpTable("norename")
    assert(LayoutSink.appendExactlyOnceManifest(batch(0, 10), tbl, 0L))
    // Spark's task committer renames inside the attempt dir — that is
    // fine (a half-renamed ATTEMPT is invisible: readers never list) —
    // but nothing may be renamed INTO the visible manifest namespace
    assert(CopyDeleteRenameFileSystem.renames.get() > 0,
      "the copy+delete rename path must actually have been exercised")
    val fs = new Path(tbl).getFileSystem(
      spark.sessionState.newHadoopConf())
    val visible = fs.listStatus(new Path(tbl)).map(_.getPath.getName).toSet
    assert(visible.exists(_.startsWith("_manifest_batch0")))
    assert(readIds(tbl) == (0L until 10L))
  }
}
