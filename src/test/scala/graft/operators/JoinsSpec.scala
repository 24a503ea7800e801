package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join and banded range join semantics: boundary inclusion,
  * no-match nulls, tie-breaks, radius edges. */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at or before each left ts") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0, 1L),
      (1L, ts("2024-01-01 11:00:00"), 110.0, 2L),
      (2L, ts("2024-01-01 10:30:00"), 200.0, 3L)
    ).toDF("key", "qts", "price", "qid")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 10:30:00")), // after q1 → 100.0
      (11L, 1L, ts("2024-01-01 11:00:00")), // exactly at q2 → 110.0 (<=)
      (12L, 2L, ts("2024-01-01 10:00:00")), // before any quote → null
      (13L, 3L, ts("2024-01-01 12:00:00"))  // key with no quotes → null
    ).toDF("trade_id", "key", "tts")
    val out = Joins.asofJoin(trades, $"key", $"tts",
        quotes, $"key", $"qts", $"qid", Seq("price"))
      .select("trade_id", "price").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out(10L) === 100.0)
    assert(out(11L) === 110.0)
    assert(out(12L) === null)
    assert(out(13L) === null)
  }

  test("asofJoin breaks right-side ties by the tie-break column (highest wins)") {
    val right = Seq(
      (1L, ts("2024-01-01 00:00:00"), "first", 1L),
      (1L, ts("2024-01-01 00:00:00"), "second", 2L)
    ).toDF("key", "rts", "tag", "rid")
    val left = Seq((9L, 1L, ts("2024-01-02 00:00:00"))).toDF("lid", "key", "lts")
    val out = Joins.asofJoin(left, $"key", $"lts", right, $"key", $"rts",
      $"rid", Seq("tag")).select("tag").head.getString(0)
    assert(out === "second") // latest by (ts, tie) carries forward
  }

  test("rangeSelfPairs includes the exact radius boundary and excludes beyond") {
    val df = Seq(
      (1L, 100L, ts("2024-01-01 00:00:00")),
      (1L, 101L, ts("2024-01-01 01:00:00")), // 3600s from 100 → included at r=3600
      (1L, 102L, ts("2024-01-01 02:00:01")), // 3601s from 101 → excluded
      (2L, 103L, ts("2024-01-01 00:30:00"))  // other key
    ).toDF("k", "id", "t")
    val pairs = Joins.rangeSelfPairs(df, "k", "t", "id", radiusSec = 3600L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((100L, 101L)))
  }

  test("rangeSelfPairs finds each qualifying pair exactly once across buckets") {
    // Timestamps straddling bucket boundaries must not duplicate pairs.
    val df = (0L until 20L).map(i =>
      (1L, i, ts(f"2024-01-01 00:${i % 60}%02d:00"))).toDF("k", "id", "t")
    val pairs = Joins.rangeSelfPairs(df, "k", "t", "id", radiusSec = 120L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length === pairs.distinct.length)
    // brute-force check
    val rows = df.collect().map(r => (r.getLong(1), r.getTimestamp(2).getTime / 1000))
    val expected = (for {
      (ia, ta) <- rows; (ib, tb) <- rows
      if ia < ib && math.abs(ta - tb) <= 120
    } yield (ia, ib)).toSet
    assert(pairs.toSet === expected)
  }

  test("saltedJoin equals the plain join and spreads rows across salts") {
    val fact = (0L until 300L).map(i => (i % 3, i)).toDF("key", "rid") // 3 hot keys
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (9L, "unmatched"))
      .toDF("key", "tag")
    val salted = Joins.saltedJoin(fact, dim, "key", $"rid", salts = 4)
      .select("key", "rid", "tag").collect().toSet
    val plain = fact.join(dim, Seq("key")).select("key", "rid", "tag")
      .collect().toSet
    assert(salted === plain)
    assert(salted.size === 300) // every fact row matched exactly once
    // the hot key's rows really spread: >1 distinct salt per key
    val spread = fact.select($"key",
        (graft.operators.Curation.idHash($"rid") % 4).as("salt"))
      .groupBy("key").agg(countDistinct("salt").as("d")).collect()
      .map(_.getLong(1))
    assert(spread.forall(_ > 1))
  }

  test("bloomPrefilteredJoin equals the plain join for string and long keys") {
    val big = (0L until 2000L).map(i => (s"k${i % 500}", i)).toDF("key", "rid")
    val small = Seq(("k1", "a"), ("k2", "b"), ("k499", "c"), ("kMISS", "z"))
      .toDF("key", "tag")
    val out = Joins.bloomPrefilteredJoin(big, small, "key", expectedItems = 10)
      .select("key", "rid", "tag").collect().toSet
    val plain = big.join(small, Seq("key")).select("key", "rid", "tag")
      .collect().toSet
    assert(out === plain)
    assert(out.size === 12) // 3 matched keys x 4 rows each
  }

  test("bloomPrefilteredJoin survives an adversarial fpp of ~1 (all false positives)") {
    // With expectedItems=1 and a saturated sketch every probe may return
    // true — the exact join must still produce exactly the plain result.
    val big = (0L until 500L).map(i => (i % 50, i)).toDF("key", "rid")
    val small = (0L until 50L by 7).map(k => (k, s"t$k")).toDF("key", "tag")
    val out = Joins.bloomPrefilteredJoin(big, small, "key",
        expectedItems = 1, fpp = 0.5)
      .select("key", "rid", "tag").collect().toSet
    val plain = big.join(small, Seq("key")).select("key", "rid", "tag")
      .collect().toSet
    assert(out === plain)
  }

  test("bloomPrefilteredJoin drops null big-side keys like the inner join does") {
    val big = Seq((Some(1L), 10L), (None, 11L), (Some(2L), 12L))
      .toDF("key", "rid")
    val small = Seq((1L, "a"), (2L, "b")).toDF("key", "tag")
    val out = Joins.bloomPrefilteredJoin(big, small, "key", expectedItems = 10)
      .select("rid").as[Long].collect().toSet
    assert(out === Set(10L, 12L))
  }

  test("bloomPrefilteredJoin across a persisted boundary cuts big-side shuffle-read rows") {
    // The operator's reason to exist: the small side comes back from a SINK
    // (parquet written by an earlier stage), so InjectRuntimeFilter cannot
    // see through the boundary and plant its own runtime bloom filter. With
    // broadcast disabled (the too-big-to-broadcast scenario the operator
    // targets), the exact join shuffles both sides — task metrics must show
    // the prefilter collapsing the big side's shuffle-read records to the
    // joining sliver instead of the whole table.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    (0L until 50L by 25L).map(k => (k, s"t$k")).toDF("key", "tag")
      .write.mode("overwrite").parquet(s"$dir/small.parquet")
    val small = spark.read.parquet(s"$dir/small.parquet") // 2 keys: 0, 25
    val big = (0L until 20000L).map(i => (i % 1000, i)).toDF("key", "rid")

    class ShuffleReadCounter extends SparkListener {
      val records = new java.util.concurrent.atomic.AtomicLong(0)
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          records.addAndGet(te.taskMetrics.shuffleReadMetrics.recordsRead)
    }
    def shuffleRecords(df: => org.apache.spark.sql.DataFrame): Long = {
      val c = new ShuffleReadCounter
      spark.sparkContext.addSparkListener(c)
      try {
        df.write.format("noop").mode("overwrite").save()
        // The listener bus is async — wait until the counter holds still
        // for three consecutive 100ms reads before trusting it.
        var stable = 0; var prev = -1L
        while (stable < 3) {
          Thread.sleep(100)
          val cur = c.records.get()
          stable = if (cur == prev) stable + 1 else 0
          prev = cur
        }
        prev
      } finally spark.sparkContext.removeSparkListener(c)
    }

    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = shuffleRecords(big.join(small, Seq("key")))
      val bloomed = shuffleRecords(Joins.bloomPrefilteredJoin(
        big, small, "key", expectedItems = 10, fpp = 0.001))
      // Results identical (the correctness half of the contract) …
      assert(Joins.bloomPrefilteredJoin(big, small, "key", 10, 0.001)
        .collect().toSet === big.join(small, Seq("key")).collect().toSet)
      // … and the plain join really shuffled the whole big side while the
      // prefiltered one shipped only the joining keys (40 rows + fp noise).
      assert(plain > 15000L, s"plain join shuffled only $plain records — " +
        "broadcast was not disabled, the measurement is void")
      assert(bloomed < plain / 10,
        s"bloom prefilter did not reduce shuffle reads: $bloomed vs $plain")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("bloom prefilter actually prunes: pruned scan row count shrinks") {
    val big = (0L until 1000L).map(i => (i, i)).toDF("key", "rid")
    val small = Seq((3L, "a"), (7L, "b")).toDF("key", "tag")
    val bf = small.stat.bloomFilter(xxhash64($"key"), 10, 0.01)
    val bytes = {
      val os = new java.io.ByteArrayOutputStream(); bf.writeTo(os); os.toByteArray
    }
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val kept = big.filter(ColumnBridge.column(graft.functions.BloomMightContain(
      ColumnBridge.expression(xxhash64($"key")), bytes))).count()
    // 2 true keys + fp at 1% over 998 candidates: far below the full 1000
    assert(kept >= 2 && kept < 100)
  }
}
