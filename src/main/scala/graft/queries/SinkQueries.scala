package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Aggregations, Dedup}
import graft.sinks.{BloomSkipIndex, DeltaExport, DocumentSink, LayoutSink, TreeSink}
import graft.sources.Tables

/** Oracle-checked round-trip queries for the sink layer (SURVEY.md §2.1
  * S6-S11): each query WRITES through a sink, READS the output back through
  * the corresponding scan (S6), and aggregates the read-back rows — the
  * DuckDB oracle computes the same aggregate straight from the source
  * parquet, so a pass proves the write+read round-trip is lossless.
  *
  * Side-effect note: sink output lives under a PER-PROCESS directory
  * (java.io.tmpdir/graft_sinks_run<pid>) and is recreated (overwrite /
  * clean-then-write) on every run, so results are deterministic across
  * reruns AND two concurrent drivers on one machine (e.g. Verify and Bench)
  * cannot race on each other's clean/write/read-back. Within one process,
  * repeated runs of a query reuse the same path, preserving the
  * idempotent-rerun semantics the pipeline queries exercise. Stale
  * directories from dead processes are left to tmpdir cleanup.
  */
object SinkQueries {
  type Q = (SparkSession, String) => DataFrame

  private val runId: Long = ProcessHandle.current().pid()

  private[queries] def sinkDir(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_sinks_run$runId/$name"

  /** Per-process embedded-Derby database URL for the external-SQL gate
    * queries. Pid-suffixed like the sink dirs (two concurrent drivers
    * never share a database; `BenchHygiene.sweepStale` reclaims dead
    * processes' leftovers — it already matches the `graft_derby_` prefix).
    * derby.system.home keeps derby.log out of the repo. */
  private[queries] def derbyUrl(tag: String): String = {
    val tmp = sys.props("java.io.tmpdir")
    System.setProperty("derby.system.home", tmp)
    s"jdbc:derby:$tmp/graft_derby_$tag$runId;create=true"
  }

  /** Recursive local delete (for sinks that append uniquely-named files). */
  private[queries] def clean(dir: String): Unit = {
    val root = new java.io.File(dir)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    if (root.exists) rm(root)
  }

  def queries: Map[String, Q] = Map(
    // ------------------------------------------------------------------ S1
    // CSV scan round-trip: write orders as headered CSV, read it back with
    // schema inference (pd.read_csv ≡ Tables.csv), re-aggregate — proves
    // the inferred-schema CSV path parses types losslessly.
    "s1_csv_scan" -> ((s, dir) => {
      val t = Tables(s, dir)
      val out = sinkDir("s1_csv")
      t.orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .write.mode("overwrite").option("header", "true").csv(out)
      Tables.csv(s, out)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderpriority")
    }),

    // --------------------------------------------------------------- S2-S4
    // External-SQL scan round-trip through embedded Derby: stage customer
    // into a REAL SQL engine over JDBC, then read back through
    // Tables.jdbc with the whole aggregation PUSHED to the remote engine —
    // the reference's Snowflake/MySQL cursor pattern
    // (pac_snowflake_pipeline.py:38-65, index_align_to_firebase.py:118-141)
    // exercised end-to-end against the oracle, not just spec-validated.
    // Identifiers are quoted throughout: Spark's JDBC writer creates
    // case-sensitive quoted lowercase columns, and Derby would otherwise
    // uppercase every unquoted name on both sides of the round-trip.
    "s2_jdbc_roundtrip" -> ((s, dir) => {
      val t = Tables(s, dir)
      val url = derbyUrl("s2gate")
      // createTableColumnTypes: Derby maps StringType to CLOB by default,
      // and CLOB columns cannot appear in a GROUP BY — the pushed
      // aggregation needs a comparable VARCHAR.
      val props = new java.util.Properties
      props.setProperty("createTableColumnTypes", "c_mktsegment VARCHAR(16)")
      t.customer.select("c_custkey", "c_mktsegment", "c_acctbal")
        .coalesce(1) // one INSERT connection; a small dim into embedded Derby
        .write.mode("overwrite").jdbc(url, "customer_ext", props)
      // Spark's JDBC writer quotes COLUMN identifiers but passes the table
      // name through as-is (Derby folds it to CUSTOMER_EXT) — so the
      // pushed query quotes columns and leaves the table unquoted.
      Tables.jdbc(s, url,
        """SELECT "c_mktsegment" AS "segment", CAST(COUNT(*) AS BIGINT) AS "n",
          |CAST(SUM("c_acctbal") AS DOUBLE) AS "bal_raw"
          |FROM customer_ext GROUP BY "c_mktsegment"""".stripMargin)
        .select(col("segment"), col("n"),
          round(col("bal_raw"), 2).as("bal_total"))
        .orderBy("segment")
    }),

    // --------------------------------------------------------------- S2-S4
    // Partition-parallel JDBC extraction vs the oracle: the same staged
    // table read back through N range cursors (Tables.jdbcPartitioned) and
    // re-aggregated in Spark — a lost or double-read row at any range
    // bound changes n/hash. This is the scale form of the external-SQL
    // scan: extraction parallelism = numPartitions, not one cursor.
    "s3_jdbc_partitioned" -> ((s, dir) => {
      val t = Tables(s, dir)
      val url = derbyUrl("s3gate")
      val staged = t.customer.select("c_custkey", "c_mktsegment", "c_acctbal")
      staged.coalesce(1)
        .write.mode("overwrite").jdbc(url, "customer_ext", new java.util.Properties)
      val maxKey = staged.agg(max("c_custkey")).head.getLong(0) // bounds metadata
      Tables.jdbcPartitioned(s, url, "customer_ext", "c_custkey",
          lowerBound = 1, upperBound = maxKey + 1, numPartitions = 4)
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n"),
          round(sum("c_acctbal"), 2).as("bal_total"))
        .orderBy("segment")
    }),

    // ----------------------------------------------------------------- s12
    // ORC scan round-trip: write lineitem columns as ORC, read back, re-
    // aggregate — proves the ORC path preserves decimals/dates/strings
    // (the second columnar source format next to parquet).
    "s12_orc_scan" -> ((s, dir) => {
      val t = Tables(s, dir)
      val out = sinkDir("s12_orc")
      t.lineitem.select("l_returnflag", "l_linestatus", "l_quantity", "l_shipdate")
        .write.mode("overwrite").orc(out)
      Tables.orc(s, out)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          round(sum("l_quantity"), 2).as("qty_total"),
          max("l_shipdate").cast("string").as("last_ship"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ----------------------------------------------------------------- s13
    // JSON-lines scan round-trip: write customer columns as JSON lines,
    // read back with schema inference, re-aggregate — the generic
    // landing-zone ingest path (API exports, event dumps).
    "s13_json_scan" -> ((s, dir) => {
      val t = Tables(s, dir)
      val out = sinkDir("s13_json")
      t.customer.select("c_mktsegment", "c_custkey", "c_acctbal")
        .write.mode("overwrite").json(out)
      Tables.json(s, out)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum("c_custkey").as("key_sum"),
          round(sum("c_acctbal"), 2).as("bal_total"))
        .orderBy("c_mktsegment")
    }),

    // ----------------------------------------------------------------- s14
    // Hive-style partitioned write + partition-PRUNED read-back: orders
    // land as o_year=YYYY directories; the filtered scan reads ONE
    // partition's files (PartitionFilters, plan-audited) — the directory-
    // level pruning that makes a 100 TB table queryable by date.
    "s14_partitioned_scan" -> ((s, dir) => {
      val t = Tables(s, dir)
      val out = sinkDir("s14_part")
      t.orders.withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year").parquet(out)
      s.read.parquet(out).filter(col("o_year") === 1997)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderpriority")
    }),

    // ----------------------------------------------------------------- s16
    // Bucketed big-big join: both sides written as bucketed tables on the
    // join key (co-located by bucket hash), then joined with NO shuffle on
    // either side (plan-audited) — the 100 TB path for repeated joins on a
    // stable key, where pre-bucketing pays one write-time shuffle to erase
    // every future join's. Table names embed the pid so two concurrent
    // drivers (Verify + Bench) cannot race in the shared warehouse; the
    // oracle re-joins the source parquet directly (bucketing is a plan
    // property, the join result is the contract).
    "s16_bucketed_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      val ot = s"s16_orders_$runId"
      val lt = s"s16_lineitem_$runId"
      Tables.bucketize(t.orders.select("o_orderkey", "o_orderpriority"),
        ot, Seq("o_orderkey"), 16)
      Tables.bucketize(
        t.lineitem.select("l_orderkey", "l_extendedprice", "l_discount"),
        lt, Seq("l_orderkey"), 16)
      val o = s.table(ot)
      val l = s.table(lt)
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy("o_orderpriority")
    }),

    // ----------------------------------------------------------------- s17
    // Quantized z-order layout round-trip: lineitem rewritten with files
    // covering compact (l_orderkey, l_partkey) REGIONS (each key min/max-
    // scaled onto the interleave grid — raw keys overflow 16 bits at
    // sf ≥ 0.1), then scanned back with a selective predicate on BOTH
    // dimensions — the multi-dimension data-skipping shape where a single-
    // key sort prunes only its own stripe. The oracle replays filter+agg
    // over the source parquet: the layout is a storage property, the
    // read-back result is the contract (plan-audited: both predicates
    // reach the scan as PushedFilters).
    // Round-10 cost cut: the layout ships only the columns the read-back
    // needs (l_extendedprice dropped — it rode the range shuffle solely
    // for a second aggregate the qty sum already proves), and 8 files at
    // sf0.1 instead of 16 — fewer, larger files mean fewer footer writes
    // while each still covers a compact Z-region.
    "s17_zorder_scan" -> ((s, dir) => {
      val t = Tables(s, dir)
      val path = sinkDir("s17_zorder")
      LayoutSink.writeZOrderLayoutQuantized(
        t.lineitem.select("l_orderkey", "l_partkey", "l_returnflag",
          "l_quantity"),
        "l_orderkey", "l_partkey", 8, path)
      s.read.parquet(path)
        .filter(col("l_orderkey") < 3000 && col("l_partkey") < 500)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(sum("l_quantity"), 2).as("qty_total"))
        .orderBy("l_returnflag")
    }),

    // ----------------------------------------------------------------- s19
    // Small-file compaction round-trip: orders deliberately fragmented into
    // 48 appended files (a simulated nightly-ingest backlog), compacted by
    // LayoutSink.compact — output file count derived from actual bytes,
    // rewrite via shuffle-free coalesce — then read back and aggregated;
    // the oracle computes the same aggregate straight from the source, so
    // a pass proves compaction is lossless. File-count collapse itself is
    // asserted in the SinksSpec (a storage property, not a row contract).
    // ------------------------------------------------------------------ S20
    // Manifest-committed exactly-once append, end to end: three batches
    // land via appendExactlyOnceManifest (attempt-unique part dirs +
    // create-if-absent manifest — no rename anywhere in the commit, the
    // object-store-safe protocol), the middle one is REPLAYED (must
    // short-circuit), and the read resolves through the manifests only.
    // The aggregate must equal the plain table scan — commits are
    // exactly-once and readers see whole batches or nothing.
    "s20_manifest_sink" -> ((s, dir) => {
      val t = Tables(s, dir)
      val tbl = sinkDir("s20_manifest_table")
      clean(tbl)
      val src = t.orders.select("o_orderkey", "o_orderpriority",
        "o_totalprice")
      LayoutSink.appendExactlyOnceManifest(
        src.filter(col("o_orderkey") % 3 === 0), tbl, 0L)
      LayoutSink.appendExactlyOnceManifest(
        src.filter(col("o_orderkey") % 3 === 1), tbl, 1L)
      LayoutSink.appendExactlyOnceManifest(
        src.filter(col("o_orderkey") % 3 === 1), tbl, 1L) // replay: no-op
      LayoutSink.appendExactlyOnceManifest(
        src.filter(col("o_orderkey") % 3 === 2), tbl, 2L)
      LayoutSink.readManifested(s, tbl)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderpriority")
    }),

    // ----------------------------------------------------------------- s22
    // Snapshot time travel over the manifest protocol: three
    // batch-numbered manifest commits, then TWO coexisting reads — the
    // table as of batch 1 (manifests 0..1) and the latest — rolled into
    // one tagged report. Immutable manifests make the snapshot exactly
    // "union of manifests with id ≤ N"; no copy, no extra metadata, the
    // Iceberg/Delta snapshot-read shape on the rename-less commit.
    "s22_time_travel" -> ((s, dir) => {
      val t = Tables(s, dir)
      val tbl = sinkDir("s22_tt_table")
      clean(tbl)
      val src = t.orders.select("o_orderkey", "o_orderpriority",
        "o_totalprice")
      (0L to 2L).foreach { b =>
        LayoutSink.appendExactlyOnceManifest(
          src.filter(col("o_orderkey") % 3 === b), tbl, b): Unit
      }
      def report(df: DataFrame, tag: String): DataFrame =
        df.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            round(sum("o_totalprice"), 2).as("total"))
          .select(lit(tag).as("snapshot"), col("o_orderpriority"),
            col("n"), col("total"))
      report(LayoutSink.readManifested(s, tbl, asOfBatch = 1L), "asof_1")
        .unionByName(report(LayoutSink.readManifested(s, tbl), "latest"))
        .orderBy("snapshot", "o_orderpriority")
    }),

    // ----------------------------------------------------------------- s24
    // Delta-protocol export ([[graft.sinks.DeltaExport]]): two appends
    // into a PARTITIONED table published as public-format
    // `_delta_log/*.json` commits (protocol/metaData/add actions, Spark
    // schemaString, Hive-style partition paths + partitionValues), a
    // replayed version-1 commit that must no-op, a copy-on-write DELETE
    // (remove + rewrite actions), and two coexisting snapshot reads off
    // the from-scratch log-replay reader: the table as of version 1 and
    // the latest. Grouping by the partition column makes the oracle
    // sensitive to partitionValues reconstruction (data files do not
    // carry partition columns, per the protocol) and the delete
    // predicate's complement pins the rewrite's survivor set.
    "s24_delta_export" -> ((s, dir) => {
      val t = Tables(s, dir)
      val tbl = sinkDir("s24_delta_table")
      clean(tbl)
      val src = t.orders.select("o_orderkey", "o_orderpriority",
        "o_totalprice")
      DeltaExport.commitAppend(src.filter(col("o_orderkey") % 3 === 0), tbl,
        Seq("o_orderpriority"), expectedVersion = 0L): Unit
      DeltaExport.commitAppend(src.filter(col("o_orderkey") % 3 === 1), tbl,
        Seq("o_orderpriority"), expectedVersion = 1L): Unit
      DeltaExport.commitAppend(src.filter(col("o_orderkey") % 3 === 1), tbl,
        Seq("o_orderpriority"), expectedVersion = 1L): Unit // replay: no-op
      DeltaExport.checkpoint(s, tbl): Unit // both reads route through it
      DeltaExport.commitDeleteWhere(s, tbl, col("o_orderkey") % 6 === 0,
        expectedVersion = 2L): Unit
      def report(df: DataFrame, tag: String): DataFrame =
        df.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            round(sum("o_totalprice"), 2).as("total"))
          .select(lit(tag).as("snapshot"), col("o_orderpriority"),
            col("n"), col("total"))
      report(DeltaExport.snapshot(s, tbl, asOfVersion = 1L), "asof_1")
        .unionByName(report(DeltaExport.snapshot(s, tbl), "latest"))
        .orderBy("snapshot", "o_orderpriority")
    }),

    // ----------------------------------------------------------------- s25
    // STATS-BASED DATA SKIPPING through the Delta export
    // ([[DeltaExport.snapshotWhere]]): lineitem lands range-laid by
    // l_orderkey so every file's add.stats carries a tight [min,max];
    // the reader prunes files from the LOG alone (zero footer reads —
    // the stats were collected once, at commit time, from the staged
    // files' footers) and re-applies the exact predicate. The oracle is
    // the plain filtered aggregate: equality pins that pruning loses no
    // rows; the spec pins that files are actually skipped.
    "s25_delta_stats_skip" -> ((s, dir) => {
      val t = Tables(s, dir)
      val tbl = sinkDir("s25_delta_table")
      clean(tbl)
      val src = t.lineitem
        .select("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag")
        .repartitionByRange(8, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
      DeltaExport.commitAppend(src, tbl, expectedVersion = 0L): Unit
      DeltaExport.snapshotWhere(s, tbl,
          col("l_orderkey") <= 1000L && col("l_quantity") >= 25)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(sum("l_extendedprice"), 2).as("revenue"))
        .orderBy("l_returnflag")
    }),

    // ----------------------------------------------------------------- s26
    // OPTIMIZE ([[DeltaExport.optimizeCompact]]): three micro-batch
    // appends leave small-file debt in every o_orderpriority partition
    // (including the space-bearing '4-NOT SPECIFIED', so the rewrite
    // round-trips the percent-encoded log paths); the dataChange=false
    // compaction commit must leave both the full fold and a
    // stats-skipped slice of the rewritten files byte-exact.
    "s26_delta_optimize" -> ((s, dir) => {
      val t = Tables(s, dir)
      val tbl = sinkDir("s26_delta_table")
      clean(tbl)
      val src = t.orders.select("o_orderkey", "o_orderpriority",
        "o_totalprice")
      (0 until 3).foreach { m =>
        DeltaExport.commitAppend(src.filter(col("o_orderkey") % 3 === m), tbl,
          Seq("o_orderpriority"), expectedVersion = m.toLong): Unit
      }
      DeltaExport.optimizeCompact(s, tbl, expectedVersion = 3L): Unit
      def report(df: DataFrame, tag: String): DataFrame =
        df.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            round(sum("o_totalprice"), 2).as("total"))
          .select(lit(tag).as("slice"), col("o_orderpriority"),
            col("n"), col("total"))
      report(DeltaExport.snapshot(s, tbl), "all")
        .unionByName(report(
          DeltaExport.snapshotWhere(s, tbl, col("o_orderkey") <= 500L),
          "k_le_500"))
        .orderBy("slice", "o_orderpriority")
    }),

    // ----------------------------------------------------------------- s27
    // OPTIMIZE ZORDER BY ([[DeltaExport.optimizeZOrder]]): the scattered
    // export overlaps the whole (l_orderkey, l_partkey) plane in every
    // file, so s25's skipping has nothing to prune on a 2-D box; the
    // Morton rewrite (dataChange=false, like s26) re-lays each file as a
    // compact REGION of the plane, and the same [[snapshotWhere]] then
    // reads only the box's files. The oracle is the plain 2-D filter:
    // layout is invisible to the answer.
    "s27_delta_zorder" -> ((s, dir) => {
      val t = Tables(s, dir)
      val tbl = sinkDir("s27_delta_table")
      clean(tbl)
      val src = t.lineitem
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
        .repartition(8)
      DeltaExport.commitAppend(src, tbl, expectedVersion = 0L): Unit
      DeltaExport.optimizeZOrder(s, tbl, "l_orderkey", "l_partkey",
        targetFileBytes = 1L << 20, expectedVersion = 1L): Unit
      DeltaExport.snapshotWhere(s, tbl,
          col("l_orderkey") <= 2000L && col("l_partkey") <= 150L)
        .agg(count(lit(1)).as("n"),
          round(coalesce(sum("l_extendedprice"), lit(0.0)), 2).as("revenue"),
          round(coalesce(sum("l_quantity"), lit(0.0)), 2).as("qty"))
    }),

    // ----------------------------------------------------------------- s21
    // Per-file Bloom skipping index ([[graft.sinks.BloomSkipIndex]]): the
    // standing slice range-lays by the lookup key, ONE scan folds each
    // file's key hashes into a sidecar row, an arriving slice appends as
    // unsorted extra files and the index maintains itself in O(|new
    // files|), and the point lookup probes the SIDECAR (never the table),
    // reads only surviving files, and re-applies the exact predicate —
    // so the result is FP-invariant and the oracle is the plain IN
    // filter. Keys 1/32 live in the standing half, 3/33 in the appended
    // files: a false negative in either build or update drops rows here.
    "s21_bloom_skip" -> ((s, dir) => {
      val t = Tables(s, dir)
      val tbl = sinkDir("s21_bloom_table"); val idx = sinkDir("s21_bloom_index")
      clean(tbl); clean(idx); clean(idx + "_next"); clean(idx + "_old")
      val src = t.lineitem.select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
      LayoutSink.writeRangeLayout(
        src.filter(col("l_orderkey") % 3 =!= 0), "l_orderkey", 12, tbl)
      BloomSkipIndex.write(s, tbl, "l_orderkey", 1 << 13, 5, idx)
      src.filter(col("l_orderkey") % 3 === 0).repartition(4)
        .write.mode("append").parquet(tbl)
      BloomSkipIndex.update(s, tbl, "l_orderkey", idx)
      BloomSkipIndex.lookup(s, tbl, idx, "l_orderkey", Seq(1L, 3L, 32L, 33L))
        .orderBy("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    }),

    "s19_compaction" -> ((s, dir) => {
      val t = Tables(s, dir)
      val frag = sinkDir("s19_frag"); val comp = sinkDir("s19_compact")
      clean(frag); clean(comp)
      t.orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .repartition(48)
        .write.mode("overwrite").parquet(frag)
      LayoutSink.compact(s, frag, comp, 8L * 1024 * 1024)
      s.read.parquet(comp)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderpriority")
    }),

    // ----------------------------------------------------------------- s18
    // Schema-evolution scan: two parquet snapshots of one logical table,
    // the second carrying a column the first lacks (the additive evolution
    // every long-lived 100 TB table undergoes), read as ONE frame via
    // mergeSchema — early-snapshot rows surface NULL for the late column
    // and the footer-merge touches only file METADATA, never row data.
    // The snapshots are partition directories (v=1/v=2), so the read also
    // exercises evolution UNDER partition discovery. The oracle replays
    // the union arithmetically from the source table: rows routed to v=1
    // contribute NULL priority.
    "s18_schema_evolution" -> ((s, dir) => {
      val t = Tables(s, dir)
      val base = sinkDir("s18_evo")
      clean(base)
      t.orders.select("o_orderkey", "o_totalprice")
        .filter(col("o_orderkey") % 2 === 0)
        .write.mode("overwrite").parquet(s"$base/v=1")
      t.orders.select("o_orderkey", "o_totalprice", "o_orderpriority")
        .filter(col("o_orderkey") % 2 === 1)
        .write.mode("overwrite").parquet(s"$base/v=2")
      s.read.option("mergeSchema", "true").parquet(base)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderpriority")
    }),

    // ------------------------------------------------------------------ S7
    // Per-document sink: nation → {collection, document_id, data-JSON} →
    // collection-partitioned JSON → scan back (S6) → per-collection count +
    // key checksum parsed out of the data JSON.
    "s7_sink_roundtrip" -> ((s, dir) => {
      val t = Tables(s, dir)
      val out = sinkDir("s7")
      val src = t.nation.select(
        col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"))
      val recs = DocumentSink.prepare(src,
        concat(lit("nations_"), (col("n_nationkey") % 2).cast("string")),
        col("n_nationkey"))
      DocumentSink.write(recs, out)
      Tables.documentSinkScan(s, out)
        .groupBy("collection")
        .agg(count(lit(1)).as("n"),
          sum(get_json_object(col("data"), "$.n_nationkey").cast("long")).as("key_sum"))
        .select(col("collection").cast("string").as("collection"), col("n"), col("key_sum"))
        .orderBy("collection")
    }),

    // ------------------------------------------------------------------ S8
    // Batched sink: customer → executor-side batches of 256 through the
    // local batch transport → read back → count + checksum + the reference's
    // ≥0.8 success accounting (pac_snowflake_pipeline.py:365).
    "s8_batched_sink" -> ((s, dir) => {
      val t = Tables(s, dir)
      val out = sinkDir("s8")
      clean(out)
      val src = t.customer.select(col("c_custkey"), col("c_acctbal"))
      val recs = DocumentSink.prepare(src, lit("customers"), col("c_custkey"))
      val report = DocumentSink.writeBatched(recs,
        new DocumentSink.LocalJsonBatchWriter(out), batchSize = 256)
      Tables.documentSinkScan(s, out)
        .agg(count(lit(1)).as("n_docs"),
          sum(get_json_object(col("data"), "$.c_custkey").cast("long")).as("key_sum"))
        .select(col("n_docs"), col("key_sum"),
          lit(report.succeeded).as("n_succeeded"), lit(report.ok).as("success_ok"))
    }),

    // ------------------------------------------------------------------ S9
    // Whole keyed tree: supplier → one {id → record} JSON object → read-back
    // verification (count + checksum), index_align_to_firebase.py:223-259.
    "s9_tree_roundtrip" -> ((s, dir) => {
      val t = Tables(s, dir)
      val out = sinkDir("s9/tree.json")
      val src = t.supplier.select(
        col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"), col("s_acctbal"))
      TreeSink.writeWholeTree(src, "s_suppkey", out)
      TreeSink.readWholeTree(s, out)
        .agg(count(lit(1)).as("n"),
          round(sum(get_json_object(col("rec"), "$.s_acctbal").cast("double")), 2)
            .as("acctbal_total"))
    }),

    // ----------------------------------------------------------------- S10
    // Per-path tree sink: the realtime pipeline end-to-end — party pivot
    // (A4) → ticker→brand lookup join (J1, misses skipped) → nested pac node
    // → path-keyed JSON rows → read back and flatten.
    "s10_tree_paths" -> ((s, dir) => {
      val t = Tables(s, dir)
      val out = sinkDir("s10")
      val agg = Aggregations.partyPivot(
        CoreQueries.pacFrame(t), "ticker", "cycle", "committee_name", "amount")
      // Single-digit tickers get brands; the rest exercise the skip path.
      val mapping = agg.select("ticker").distinct()
        .filter(length(col("ticker")) === 2)
        .withColumn("brand_id", concat(lit("B_"), col("ticker")))
      val joined = Dedup.lookupJoin(agg, mapping, "ticker")
      val paths = TreeSink.preparePaths(
        joined,
        Seq(lit("brands"), col("brand_id"), lit("records"), col("cycle"), lit("pac")),
        TreeSink.pacNode(round(col("democrat_total"), 2), round(col("republican_total"), 2)))
      TreeSink.writePerPath(paths, out)
      s.read.json(out)
        .select(col("path"),
          get_json_object(col("value"), "$.pac.democrat").cast("double").as("democrat"),
          get_json_object(col("value"), "$.pac.republican").cast("double").as("republican"))
        .orderBy("path")
    }),

    // ----------------------------------------------------------------- S11
    // Dry-run sink: deterministic preview of the first 5 documents, no
    // write (pac_data_processor.py:227-239).
    "s11_dryrun" -> ((s, dir) => {
      val t = Tables(s, dir)
      val src = t.orders.select(col("o_orderkey"), col("o_orderpriority"))
      val recs = DocumentSink.prepare(src, lit("orders"), col("o_orderkey"))
      DocumentSink.dryRun(recs, Seq(col("document_id").cast("long")), 5)
    })
  )

  def oracles: Map[String, String] = Map(
    "s1_csv_scan" ->
      """SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "s2_jdbc_roundtrip" ->
      """SELECT c_mktsegment AS segment, count(*) AS n,
        |  round(sum(c_acctbal), 2) AS bal_total
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "s3_jdbc_partitioned" ->
      """SELECT c_mktsegment AS segment, count(*) AS n,
        |  round(sum(c_acctbal), 2) AS bal_total
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "s16_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "s17_zorder_scan" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_quantity), 2) AS qty_total
        |FROM lineitem WHERE l_orderkey < 3000 AND l_partkey < 500
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "s19_compaction" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // s21's lookup re-applies the exact predicate after file pruning, so
    // the oracle is the plain IN filter — any bloom false negative
    // (build, update, or geometry drift) surfaces as missing rows.
    "s21_bloom_skip" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_orderkey IN (1, 3, 32, 33)
        |ORDER BY 1, 2, 3, 4""".stripMargin,
    // s22: the as-of-1 snapshot is exactly the %3∈{0,1} slice set,
    // latest is the whole table — snapshot reads are pure filters on the
    // committed batches.
    "s22_time_travel" ->
      """SELECT 'asof_1' AS snapshot, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderkey % 3 IN (0, 1) GROUP BY 2
        |UNION ALL
        |SELECT 'latest' AS snapshot, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 2
        |ORDER BY 1, 2""".stripMargin,
    // s20 re-assembles the whole orders slice set through the manifest
    // protocol — exactly-once commits make it the plain scan.
    "s20_manifest_sink" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // s24: version 1 holds slices 0 and 1 of o_orderkey mod 3; the
    // version-2 delete removes the o_orderkey % 6 = 0 half of slice 0.
    "s24_delta_export" ->
      """WITH v1 AS (
        |  SELECT * FROM orders WHERE o_orderkey % 3 IN (0, 1)),
        |vl AS (SELECT * FROM v1 WHERE o_orderkey % 6 <> 0)
        |SELECT 'asof_1' AS snapshot, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM v1 GROUP BY 2
        |UNION ALL
        |SELECT 'latest' AS snapshot, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM vl GROUP BY 2
        |ORDER BY 1, 2""".stripMargin,
    // s25: skipping is transparent — the oracle is the plain filter.
    "s25_delta_stats_skip" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem
        |WHERE l_orderkey <= 1000 AND l_quantity >= 25
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // s27: z-order is a layout change only — the 2-D box answer is the
    // plain filter.
    "s27_delta_zorder" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  round(coalesce(sum(l_extendedprice), 0), 2) AS revenue,
        |  round(coalesce(sum(l_quantity), 0), 2) AS qty
        |FROM lineitem
        |WHERE l_orderkey <= 2000 AND l_partkey <= 150""".stripMargin,
    // s26: OPTIMIZE rearranges files only — both slices fold as if the
    // compaction never happened.
    "s26_delta_optimize" ->
      """SELECT 'all' AS slice, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 2
        |UNION ALL
        |SELECT 'k_le_500' AS slice, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderkey <= 500 GROUP BY 2
        |ORDER BY 1, 2""".stripMargin,
    "s18_schema_evolution" ->
      """SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END
        |    AS o_orderpriority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    "s12_orc_scan" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS qty_total,
        |  CAST(max(l_shipdate) AS VARCHAR) AS last_ship
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "s13_json_scan" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(c_custkey) AS BIGINT) AS key_sum,
        |  round(sum(c_acctbal), 2) AS bal_total
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "s14_partitioned_scan" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE year(o_orderdate) = 1997
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "s7_sink_roundtrip" ->
      """SELECT 'nations_' || CAST(n_nationkey % 2 AS VARCHAR) AS collection,
        |  count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS key_sum
        |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin,
    "s8_batched_sink" ->
      """SELECT count(*) AS n_docs, CAST(sum(c_custkey) AS BIGINT) AS key_sum,
        |  count(*) AS n_succeeded, true AS success_ok
        |FROM customer""".stripMargin,
    "s9_tree_roundtrip" ->
      """SELECT count(*) AS n, round(sum(s_acctbal), 2) AS acctbal_total
        |FROM supplier""".stripMargin,
    "s10_tree_paths" ->
      s"""WITH ${CoreQueries.partyPivotSql},
         |mapping AS (
         |  SELECT DISTINCT ticker, 'B_' || ticker AS brand_id
         |  FROM agg WHERE length(ticker) = 2)
         |SELECT 'brands/' || brand_id || '/records/' || CAST(cycle AS VARCHAR) || '/pac' AS path,
         |  democrat_total AS democrat, republican_total AS republican
         |FROM agg JOIN mapping USING (ticker)
         |ORDER BY path""".stripMargin,
    "s11_dryrun" ->
      """SELECT 'orders' AS collection, CAST(o_orderkey AS VARCHAR) AS document_id,
        |  '{"o_orderkey":' || o_orderkey || ',"o_orderpriority":"' || o_orderpriority || '"}' AS data
        |FROM orders ORDER BY o_orderkey LIMIT 5""".stripMargin
  )
}
