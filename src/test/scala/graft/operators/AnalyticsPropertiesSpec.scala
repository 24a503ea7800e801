package graft.operators

import graft.{GraftCache, SparkSpec}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants for the round-5 analytics operators: funnel
  * monotonicity, retention cohort conservation, SCD2 timeline partition,
  * merge idempotence, Z-value bijectivity. Raw ScalaCheck, bounded Spark
  * jobs per property (same idiom as [[CurationPropertiesSpec]]). */
class AnalyticsPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, trials: Int = 8): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(trials), p)
    assert(res.passed, res.status.toString)
  }

  /** Random small event logs: (user, type, second-offset). */
  private val logGen: Gen[List[(Long, String, Int)]] =
    Gen.chooseNum(5, 60).flatMap(n => Gen.listOfN(n, for {
      u <- Gen.chooseNum(1L, 8L)
      t <- Gen.oneOf("view", "click", "purchase", "other")
      s <- Gen.chooseNum(0, 10000)
    } yield (u, t, s)))

  private def toEvents(log: List[(Long, String, Int)]) =
    log.map { case (u, t, s) =>
      (u, t, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusSeconds(s)))
    }.toDF("user_id", "event_type", "ts")

  test("property: funnel step counts are monotonically non-increasing") {
    check(Prop.forAll(logGen) { log =>
      val out = EventAnalytics.funnel(toEvents(log), "user_id", "event_type",
          "ts", Seq("view", "click", "purchase"))
        .orderBy("step").collect().map(_.getLong(2))
      GraftCache.release()
      out.sliding(2).forall { case Array(a, b) => b <= a; case _ => true }
    })
  }

  test("property: retention day-0 users per cohort sum to the user universe") {
    // every user is active on their own cohort day, so offset-0 rows
    // partition the universe: sum(users @ offset 0) == distinct users
    check(Prop.forAll(logGen) { log =>
      val events = toEvents(log)
      val day0 = EventAnalytics.retention(events, "user_id", "ts")
        .filter(col("day_offset") === 0)
        .agg(coalesce(sum("users"), lit(0L))).head.getLong(0)
      day0 === events.select("user_id").distinct().count()
    })
  }

  test("property: SCD2 intervals chain without gaps or overlaps per key") {
    check(Prop.forAll(logGen) { log =>
      val versions = toEvents(log)
        .withColumn("seq", monotonically_increasing_id())
      val hist = Merge.scd2History(versions, Seq("user_id"), "ts", Seq("seq"))
        .select("user_id", "valid_from", "valid_to")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), Option(r.getTimestamp(2))))
        .groupBy(_._1)
      hist.values.forall { rows =>
        val sorted = rows.sortBy(r => (r._2.getTime, r._3.map(_.getTime).getOrElse(Long.MaxValue)))
        // exactly one open interval, and each valid_to equals a successor's valid_from
        sorted.count(_._3.isEmpty) == 1 &&
          sorted.zip(sorted.tail).forall { case ((_, _, to), (_, from2, _)) =>
            to.contains(from2)
          }
      }
    })
  }

  test("property: merge is idempotent for any disjoint-op changeset") {
    val changeGen = for {
      base <- Gen.listOfN(10, Gen.chooseNum(1L, 20L)).map(_.distinct)
      ops <- Gen.listOfN(10, for {
        k <- Gen.chooseNum(1L, 30L)
        op <- Gen.oneOf("U", "D")
        v <- Gen.chooseNum(0, 100)
      } yield (k, op, v))
    } yield (base, ops.groupBy(_._1).map(_._2.head).toList) // one op per key
    check(Prop.forAll(changeGen) { case (baseKeys, ops) =>
      val base = baseKeys.map(k => (k, k * 10.0)).toDF("k", "v")
      val changes = ops.map { case (k, op, v) => (k, v.toDouble, op) }
        .toDF("k", "v", "op")
      val once = Merge.applyChanges(base, changes, Seq("k"), "op")
      val twice = Merge.applyChanges(once, changes, Seq("k"), "op")
      twice.collect().toSet == once.collect().toSet
    })
  }

  test("property: snapshotDiff partitions ids; self-diff is all-unchanged; " +
      "empty-old is all-added") {
    val snapGen = for {
      ids <- Gen.chooseNum(1, 25).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(1L, 40L)).map(_.distinct))
      drop <- Gen.someOf(ids)
      edit <- Gen.someOf(ids)
    } yield (ids, drop.toSet, edit.toSet)
    check(Prop.forAll(snapGen) { case (ids, dropped, edited) =>
      val old = ids.map(i => (i, s"fp$i")).toDF("id", "fp")
      val neu = ids.filterNot(dropped)
        .map(i => (i, if (edited(i)) s"fp$i'" else s"fp$i")).toDF("id", "fp")
      val out = Merge.snapshotDiff(old, neu, "id", "fp")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val self = Merge.snapshotDiff(old, old, "id", "fp")
        .collect().map(_.getString(1)).toSet
      out.keySet == ids.toSet &&                        // partition: no loss
        ids.forall { i =>
          val expect =
            if (dropped(i)) "removed"
            else if (edited(i)) "changed"
            else "unchanged"
          out(i) == expect
        } &&
        (self.isEmpty || self == Set("unchanged")) && {
          val fromEmpty = Merge.snapshotDiff(
            old.filter(lit(false)), neu, "id", "fp")
            .collect().map(_.getString(1)).toSet
          fromEmpty.isEmpty || fromEmpty == Set("added")
        }
    }, trials = 6)
  }

  test("property: gramCoverage is 1.0 whenever the reference contains the docs") {
    val docGen = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, for {
      id <- Gen.chooseNum(1L, 50L)
      len <- Gen.chooseNum(2, 10)
      toks <- Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc", "dd", "ee"))
    } yield (id, toks.mkString(" "))).map(_.distinctBy(_._1)))
    check(Prop.forAll(docGen) { docs =>
      val df = docs.toDF("id", "text")
      val out = Curation.gramCoverage(df, df, "id", "text", 2)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      GraftCache.release(blocking = true)
      // every doc has >= 2 tokens, so every doc scores — at coverage 1.0
      out.keySet == docs.map(_._1).toSet && out.values.forall(_ == 1.0)
    }, trials = 6)
  }

  test("property: z-value interleave is a bijection on 16-bit pairs") {
    val pairGen = Gen.listOfN(40, for {
      a <- Gen.chooseNum(0L, 65535L)
      b <- Gen.chooseNum(0L, 65535L)
    } yield (a, b))
    check(Prop.forAll(pairGen) { pairs =>
      val df = pairs.toDF("a", "b")
      val zs = df.select(graft.sinks.LayoutSink.zValue(col("a"), col("b")))
        .collect().map(_.getLong(0))
      zs.distinct.length == pairs.distinct.length &&
        zs.forall(z => z >= 0 && z < (1L << 32))
    })
  }
}
