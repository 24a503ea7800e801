package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Source-layer specs: CSV inference, schema discovery, bucketized
  * co-located joins (the no-shuffle path), metadata columns. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("csv scan infers schema from a headered file (S1)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    Seq((1L, "x", 1.5), (2L, "y", 2.5)).toDF("id", "name", "score")
      .write.mode("overwrite").option("header", "true").csv(dir)
    val back = Tables.csv(spark, dir)
    assert(back.count() === 2L)
    val types = back.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("name") === "string")
    assert(types("score") === "double")
    assert(back.agg(sum("score")).head.getDouble(0) === 4.0)
  }

  test("discoverColumns exposes the schema like SHOW COLUMNS (S5)") {
    val df = Seq((1, "a")).toDF("id", "name")
    assert(Tables.discoverColumns(df) === Seq("id", "name"))
  }

  test("bucketized tables join without a shuffle on the bucketed key") {
    val n = 4
    val left = (1 to 100).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 100).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    Tables.bucketize(left, "graft_bkt_left", Seq("k"), n)
    Tables.bucketize(right, "graft_bkt_right", Seq("k"), n)
    // Force a sort-merge join — broadcast would trivially avoid shuffles.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bkt_left")
        .join(spark.table("graft_bkt_right"), "k")
      assert(joined.count() === 100L)
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty, "bucketed join must not shuffle either side")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("jdbc reader passes options validation and fails only at connection (S2-S4)") {
    // No JDBC endpoint exists in this environment; the point is that the
    // failure is a driver/connection error, NOT an options error like the
    // query+dbtable conflict this helper once had.
    val e = intercept[Exception] {
      Tables.jdbc(spark, "jdbc:nosuchdb://nowhere/x", "SELECT 1 AS one").count()
    }
    val msg = e.getMessage.toLowerCase
    assert(!msg.contains("dbtable"), s"options conflict resurfaced: $msg")
    assert(msg.contains("driver") || msg.contains("connect"), s"unexpected error: $msg")
  }

  test("jdbc scan round-trips rows through an embedded Derby database (S2-S4 loopback)") {
    // Derby ships on the Spark classpath, so the JDBC scan path — Spark's
    // JDBCRelation planning, query pushdown via the `query` option,
    // per-partition cursor reads — is verified against a real SQL engine
    // in-process, not just options-validated.
    val tmp = sys.props("java.io.tmpdir")
    System.setProperty("derby.system.home", tmp) // keep derby.log out of the repo
    val dbDir = s"$tmp/graft_derby_${ProcessHandle.current().pid()}"
    val url = s"jdbc:derby:$dbDir;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE contributions (id INT, ticker VARCHAR(10), amount DOUBLE)")
      val ps = conn.prepareStatement("INSERT INTO contributions VALUES (?, ?, ?)")
      for (i <- 1 to 25) {
        ps.setInt(1, i); ps.setString(2, s"T${i % 5}"); ps.setDouble(3, i * 10.5)
        ps.addBatch()
      }
      assert(ps.executeBatch().length === 25)
    } finally conn.close()
    // Pushed query: the GROUP BY executes inside Derby, as the reference
    // pushes its SELECTs to Snowflake/MySQL.
    val agg = Tables.jdbc(spark, url,
      "SELECT ticker, CAST(sum(amount) AS DOUBLE) AS total FROM contributions GROUP BY ticker")
    val out = agg.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.size === 5)
    assert(out("T1") === (1 + 6 + 11 + 16 + 21) * 10.5)
    // Whole-table scan path.
    assert(Tables.jdbc(spark, url, "SELECT * FROM contributions").count() === 25L)
  }

  test("jdbcPartitioned plans N parallel range partitions and loses no rows") {
    // The scale behavior the single-cursor loopback doesn't exercise:
    // partitionColumn splits the scan into numPartitions range cursors.
    val tmp = sys.props("java.io.tmpdir")
    System.setProperty("derby.system.home", tmp)
    val dbDir = s"$tmp/graft_derby_part_${ProcessHandle.current().pid()}"
    val url = s"jdbc:derby:$dbDir;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE issues (id INT, sev VARCHAR(10))")
      val ps = conn.prepareStatement("INSERT INTO issues VALUES (?, ?)")
      for (i <- 1 to 40) { ps.setInt(1, i); ps.setString(2, s"S${i % 3}"); ps.addBatch() }
      assert(ps.executeBatch().length === 40)
    } finally conn.close()
    val df = Tables.jdbcPartitioned(spark, url, "issues", "id",
      lowerBound = 1, upperBound = 41, numPartitions = 4)
    // The plan must carry one range predicate per partition (the parallel
    // cursors), and their union must be exactly the table: no row lost at
    // a bound, none double-read by overlapping ranges.
    assert(df.rdd.getNumPartitions === 4, "one JDBC cursor per range split")
    val perPart = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPart.forall(n => n > 0 && n < 40), s"unbalanced split: ${perPart.toSeq}")
    assert(df.select("id").collect().map(_.getInt(0)).sorted.toSeq === (1 to 40))
    // N-cursor extraction must equal 1-cursor extraction row for row —
    // the correctness claim behind using partitioned JDBC at scale.
    val partRows = df.collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    val singleRows = Tables.jdbc(spark, url, "SELECT id, sev FROM issues")
      .collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    assert(partRows === singleRows, "partitioned and single-cursor reads differ")
  }

  test("every Tables accessor analyzes against the live testdata (schema-drift gate)") {
    // Round-10 lesson: the driver regenerated events.ts from TIMESTAMP(NANOS)
    // to plain timestamp[us] and the hard-coded nanos workaround failed
    // ANALYSIS for every consumer — 18 queries and the whole bench died at
    // verdict time. This spec moves that detection to `sbt test` time:
    // accessing .schema forces full analysis of each accessor's plan.
    val t = Tables(spark, "/root/testdata/sf0.001")
    val accessors: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "region" -> (() => t.region), "nation" -> (() => t.nation),
      "customer" -> (() => t.customer), "supplier" -> (() => t.supplier),
      "part" -> (() => t.part), "orders" -> (() => t.orders),
      "lineitem" -> (() => t.lineitem), "events" -> (() => t.events),
      "documents" -> (() => t.documents), "embeddings" -> (() => t.embeddings))
    accessors.foreach { case (name, mk) =>
      val schema = mk().schema // throws AnalysisException on drift
      assert(schema.fields.nonEmpty, s"$name: empty schema")
    }
    // The one normalized contract consumers rely on: events.ts is a
    // microsecond TimestampType whatever the physical encoding.
    assert(t.events.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }

  test("testdata schemas match the pinned contract (loud driver-drift signal)") {
    // The drift gate above proves every accessor still ANALYZES; this one
    // catches the quieter failure: a type flip that still analyzes but
    // changes semantics downstream (timestamp→date survives analysis and
    // silently breaks oracle hash-matching; r10's ts flip is the family).
    // A failure here is the driver regenerating testdata with new shapes —
    // the fix is to update sources/queries/oracles for the new shape, then
    // re-pin this map.
    val expected = Map(
      "region" -> "r_regionkey:int, r_name:string",
      "nation" -> "n_nationkey:int, n_name:string, n_regionkey:int",
      "customer" -> ("c_custkey:bigint, c_name:string, c_nationkey:int, " +
        "c_acctbal:double, c_mktsegment:string"),
      "supplier" -> "s_suppkey:bigint, s_name:string, s_nationkey:int, s_acctbal:double",
      "part" -> ("p_partkey:bigint, p_name:string, p_brand:string, p_type:string, " +
        "p_size:int, p_retailprice:double"),
      "orders" -> ("o_orderkey:bigint, o_custkey:bigint, o_orderstatus:string, " +
        "o_totalprice:double, o_orderdate:timestamp_ntz, o_orderpriority:string"),
      "lineitem" -> ("l_orderkey:bigint, l_partkey:bigint, l_suppkey:bigint, " +
        "l_linenumber:int, l_quantity:double, l_extendedprice:double, " +
        "l_discount:double, l_tax:double, l_returnflag:string, " +
        "l_linestatus:string, l_shipdate:timestamp_ntz"),
      // events.ts is NOT pinned to one physical type: normalizeEventTs
      // supports three encodings by design, and the driver has already
      // flipped between two of them (r10). Pinning one would fail sbt test
      // spuriously on a supported input (round-11 advice) — ts is checked
      // against the supported-encoding SET below instead.
      "events" -> ("event_id:bigint, ts:<supported>, user_id:bigint, " +
        "event_type:string, value:double, props:string"),
      "documents" -> "doc_id:bigint, text:string, lang:string, source:string, n_chars:bigint",
      "embeddings" -> "vec_id:bigint, embedding:array<float>, label:int")
    // The encodings normalizeEventTs dispatches on — any of these in
    // events.ts is a supported input, not drift.
    val supportedTs = Set("bigint", "timestamp_ntz", "timestamp")
    expected.foreach { case (table, want) =>
      val got = spark.read
        .parquet(s"/root/testdata/sf0.001/$table.parquet")
        .schema.fields
        .map { f =>
          val t =
            if (table == "events" && f.name == "ts" &&
              supportedTs(f.dataType.simpleString)) "<supported>"
            else f.dataType.simpleString
          s"${f.name}:$t"
        }.mkString(", ")
      assert(got === want,
        s"\ndriver testdata drift in `$table` — update sources/queries/oracles " +
          "for the new shape, then re-pin this contract")
    }
  }

  test("events accepts long-nanos, NTZ, and UTC-timestamp ts encodings — and rejects others") {
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("graft-events-enc")
    def dirFor(tag: String): String = {
      val d = base.resolve(tag); java.nio.file.Files.createDirectories(d); d.toString
    }
    val micros = Seq(0L, 1704067200000000L, 1704067200123456L) // epoch us
    // (a) legacy shape: raw long nanos (what nanosAsLong surfaces
    // TIMESTAMP(NANOS) parquet as)
    val longDir = dirFor("long")
    micros.map(u => Tuple2(u * 1000L, 1L)).toDF("ts", "event_id")
      .write.mode("overwrite").parquet(s"$longDir/events.parquet")
    // (b) current testdata shape: timestamp[us] without UTC adjustment → NTZ
    val ntzDir = dirFor("ntz")
    micros.map(Tuple1(_)).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        lit(1L).as("event_id"))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")
    // (c) UTC-adjusted timestamp → plain TimestampType passthrough
    val utcDir = dirFor("utc")
    micros.map(Tuple1(_)).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"), lit(1L).as("event_id"))
      .write.mode("overwrite").parquet(s"$utcDir/events.parquet")
    // All three must normalize to identical TimestampType values (UTC
    // session, so NTZ wall-clock == instant).
    Seq(longDir, ntzDir, utcDir).foreach { d =>
      val df = Tables(spark, d).events
      assert(df.schema("ts").dataType === TimestampType, s"$d: wrong type")
      val got = df.select(unix_micros(col("ts")).as("us"))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got === micros.sorted, s"$d: values drifted")
    }
    // (d) anything else is a loud failure, not a silent misread
    val badDir = dirFor("bad")
    Seq(("2024-01-01", 1L)).toDF("ts", "event_id")
      .write.mode("overwrite").parquet(s"$badDir/events.parquet")
    intercept[IllegalStateException] { Tables(spark, badDir).events }
  }

  test("withMetadata adds processed_date/data_source/record_type (P9)") {
    val out = Seq((1, "x")).toDF("id", "name")
      .transform(df => graft.operators.Cleaning.withMetadata(df, "csv", "contribution"))
    assert(out.columns.takeRight(3).toSeq ===
      Seq("processed_date", "data_source", "record_type"))
    val row = out.head
    assert(row.getAs[String]("data_source") === "csv")
    assert(row.getAs[String]("record_type") === "contribution")
    assert(!row.isNullAt(row.fieldIndex("processed_date")))
  }
}
