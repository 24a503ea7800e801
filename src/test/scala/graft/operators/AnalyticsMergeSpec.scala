package graft.operators

import graft.{GraftCache, SparkSpec}
import org.apache.spark.sql.functions._

/** Funnel ordering semantics, retention cohort math, CDC merge rules, and
  * the table profiler's per-column stats. */
class AnalyticsMergeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val events = Seq(
    // u1 completes view → click → purchase in order
    (1L, "view", ts("2024-01-01 10:00:00")),
    (1L, "click", ts("2024-01-01 10:05:00")),
    (1L, "purchase", ts("2024-01-01 10:10:00")),
    // u2 clicks BEFORE viewing: reaches step 1 only (order matters)
    (2L, "click", ts("2024-01-02 09:00:00")),
    (2L, "view", ts("2024-01-02 09:30:00")),
    // u3 views and clicks, never purchases
    (3L, "view", ts("2024-01-03 08:00:00")),
    (3L, "click", ts("2024-01-03 08:01:00")),
    // u4 purchase only: reaches no step
    (4L, "purchase", ts("2024-01-04 12:00:00"))
  ).toDF("user_id", "event_type", "ts")

  test("funnel counts users per ordered step with strict ordering") {
    val out = EventAnalytics.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    GraftCache.release()
    assert(out === Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
  }

  test("funnel step binds to the EARLIEST qualifying event (min-completion)") {
    // view@10:00, click@09:00 (before) and click@10:30 (after): the user
    // still converts because a later click exists.
    val e = Seq(
      (7L, "view", ts("2024-01-01 10:00:00")),
      (7L, "click", ts("2024-01-01 09:00:00")),
      (7L, "click", ts("2024-01-01 10:30:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.funnel(e, "user_id", "event_type", "ts",
        Seq("view", "click")).collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    GraftCache.release()
    assert(out === Map(1 -> 1L, 2 -> 1L))
  }

  test("funnel registers its per-step frames with GraftCache") {
    GraftCache.release()
    EventAnalytics.funnel(events, "user_id", "event_type", "ts",
      Seq("view", "click")).collect()
    assert(GraftCache.trackedCount === 2)
    GraftCache.release()
    assert(GraftCache.trackedCount === 0)
  }

  test("retention assigns each activity day to the user's first-day cohort") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00")), // cohort 01-01, offset 0
      (1L, ts("2024-01-03 10:00:00")), // offset 2
      (1L, ts("2024-01-03 23:00:00")), // same day: one distinct user
      (2L, ts("2024-01-03 01:00:00"))  // cohort 01-03, offset 0
    ).toDF("user_id", "ts")
    val out = EventAnalytics.retention(e, "user_id", "ts")
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("2024-01-01", 0) -> 1L, ("2024-01-01", 2) -> 1L, ("2024-01-03", 0) -> 1L))
  }

  private val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "v")

  test("applyChanges upserts, inserts, deletes, and no-ops absent deletes") {
    val changes = Seq(
      (2L, "b2", 25.0, "U"), // update
      (3L, "c", 30.0, "D"),  // delete
      (4L, "d", 40.0, "U"),  // insert
      (9L, "x", 0.0, "D")    // delete of absent key: no-op
    ).toDF("k", "name", "v", "op")
    val out = Merge.applyChanges(base, changes, Seq("k"), "op")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(out === Map(
      1L -> ("a", 10.0), 2L -> ("b2", 25.0), 4L -> ("d", 40.0)))
  }

  test("applyChanges is idempotent: re-applying the same changeset is a no-op") {
    val changes = Seq(
      (2L, "b2", 25.0, "U"), (3L, "c", 30.0, "D"), (4L, "d", 40.0, "U")
    ).toDF("k", "name", "v", "op")
    val once = Merge.applyChanges(base, changes, Seq("k"), "op")
    val twice = Merge.applyChanges(once, changes, Seq("k"), "op")
    assert(twice.collect().toSet === once.collect().toSet)
  }

  test("applyChanges lets an upsert write a null over a base value") {
    val changes = Seq((1L, null.asInstanceOf[String], 11.0, "U"))
      .toDF("k", "name", "v", "op")
    val out = Merge.applyChanges(base, changes, Seq("k"), "op")
      .filter($"k" === 1L).select("name", "v").head
    assert(out.isNullAt(0) && out.getDouble(1) === 11.0)
  }

  test("applyChanges rejects a schema-mismatched changeset") {
    val bad = Seq((1L, "a", "U")).toDF("k", "name", "op")
    intercept[IllegalArgumentException] {
      Merge.applyChanges(base, bad, Seq("k"), "op")
    }
  }

  test("profile reports per-column null/distinct/min/max") {
    val df = Seq(
      (Some(1L), Some("x")), (Some(1L), None), (Some(3L), Some("y"))
    ).toDF("id", "s")
    val out = Aggregations.profile(df).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(out("id") === ((3L, 3L, 2L, "1", "3")))
    assert(out("s") === ((3L, 2L, 2L, "x", "y")))
  }

  test("scd2History chains validity intervals per key, ties broken") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "v1"),
      (1L, ts("2024-01-05 00:00:00"), 3L, "v2b"), // same ts as next: tie
      (1L, ts("2024-01-05 00:00:00"), 2L, "v2a"), // tie-break by seq
      (2L, ts("2024-02-01 00:00:00"), 4L, "w1")
    ).toDF("k", "t", "seq", "tag")
    val out = Merge.scd2History(log, Seq("k"), "t", Seq("seq"))
      .collect().map(r => r.getString(3) ->
        (Option(r.getTimestamp(5)).map(_.toString), r.getBoolean(6))).toMap
    assert(out("v1") === ((Some("2024-01-05 00:00:00.0"), false)))
    assert(out("v2a") === ((Some("2024-01-05 00:00:00.0"), false))) // closed by v2b
    assert(out("v2b") === ((None, true)))
    assert(out("w1") === ((None, true)))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged by fingerprint") {
    val oldSnap = Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("c")),
      (5L, None), (6L, None)).toDF("id", "fp")
    val newSnap = Seq((2L, Some("b")), (3L, Some("C2")), (4L, Some("d")),
      (5L, None), (6L, Some("f"))).toDF("id", "fp")
    val out = Merge.snapshotDiff(oldSnap, newSnap, "id", "fp")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added",
      // null fingerprints compare null-safe: present rows never
      // masquerade as added/removed, and null==null is unchanged
      5L -> "unchanged", 6L -> "changed"))
    intercept[IllegalArgumentException] {
      Merge.snapshotDiff(oldSnap.withColumn("status", lit("x")), newSnap,
        "id", "fp")
    }
  }

  test("knnJoin ranks exact cosine neighbours per query") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),  // query
      (1L, Array(1.0f, 0.1f)),  // nearest
      (2L, Array(0.5f, 0.5f)),
      (3L, Array(-1.0f, 0.0f)) // opposite
    ).toDF("vec_id", "embedding")
    val out = VectorOps.knnJoin(vecs, "vec_id", "embedding", $"vec_id" === 0L, 2)
      .orderBy("rk").collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(out.toSeq === Seq((1L, 1), (2L, 2)))
  }
}
