package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Aggregations, Bloom, Cleaning, Dedup, Derivations, Joins, Merge, Quality, TextOps}
import graft.sources.Tables

/** Core relational operator queries — one oracle-checked query per operator
  * family in SURVEY.md §2 (P/D/J/A/T), expressed on the driver testdata.
  *
  * Conventions for DuckDB-oracle parity:
  *  - every aggregate / computed column is aliased identically on both sides;
  *  - arithmetic double results are `round(x, 2)` on both sides (pass-through
  *    doubles are left raw — they are bit-identical out of parquet);
  *  - every query ends in a fully tie-broken ORDER BY so row order is
  *    deterministic on both sides;
  *  - int32 columns are cast to long (DuckDB aggregates/joins promote to
  *    BIGINT; keeps dtypes aligned).
  */
object CoreQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Fixed batch clock for P9 metadata stamping (session timezone is UTC in
    * Verify/Bench) — the ONE shared constant both the Spark query and the
    * DuckDB oracle literal are generated from. */
  val MetadataClock = "2024-06-01 00:00:00"

  /** KMV sketch size for the a20/a21 distinct-count gates — small enough
    * that the estimator's error is visibly non-zero (the gate reports it
    * honestly), large enough that every testdata SF has more distinct
    * orderkeys than k, keeping the estimate branch active at all scales. */
  val KmvK = 256

  /** Sketch size for the grouped daily-distinct gate (a23): below the
    * per-day user cardinality at sf0.01/sf0.1 (estimate branch live)
    * and above sf0.001's (exact-below-k branch live). */
  val KmvDailyK = 64

  /** Bloom-filter geometry for the x98 pruning gate: 2^16 bits / 4
    * probes keeps the FP rate well under 1% at sf0.1's supplier-key
    * cardinality (n/m ≈ 0.006) while the gate result stays exact at ANY
    * FP rate — the geometry only tunes how much the prune saves. */
  val BloomBits = 1 << 16
  val BloomProbes = 4

  /** Build-side nation for the x98 prune (testdata nations are synthetic
    * NATION_<k> names; NATION_19 holds suppliers at every SF — 1 at
    * sf0.001, 6 at sf0.01, 42 at sf0.1 — so the gate is never vacuously
    * empty at any scale). */
  val BloomNation = "NATION_19"

  /** The `orders` column set, shared by the a14 profile oracle generator —
    * row parity with `Aggregations.profile(orders)` needs the same SET of
    * columns (both sides order by column name at the end). */
  private val OrdersProfileCols = Seq("o_orderkey", "o_custkey",
    "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

  /** PAC-shaped frame synthesized from orders: keyword-bearing committee
    * names (one value carries both republican+democrat keywords for the
    * precedence test), blank/null tickers (P15) and non-positive amounts
    * (P16). Shared by d3_party_pivot and the tree-sink round-trip. */
  def pacFrame(t: Tables): DataFrame =
    t.orders.select(
      when(col("o_custkey") % 89 === 0, lit(null))
        .when(col("o_custkey") % 97 === 0, lit(""))
        .otherwise(concat(lit("T"), (col("o_custkey") % 50).cast("string")))
        .as("ticker"),
      year(col("o_orderdate")).cast("long").as("cycle"),
      when(col("o_orderpriority") === "1-URGENT", "GOP Victory Fund")
        .when(col("o_orderpriority") === "2-HIGH", "Democrats for Conservative Values")
        .when(col("o_orderpriority") === "3-MEDIUM", "Progressive Future PAC")
        .when(col("o_orderpriority") === "4-NOT SPECIFIED", "Neutral Business Alliance")
        .otherwise("Liberal Action Network").as("committee_name"),
      when(col("o_orderkey") % 101 === 0, -col("o_totalprice"))
        .otherwise(col("o_totalprice")).as("amount"))

  /** DuckDB SQL equivalent of [[pacFrame]] + the D3 classifier, as CTEs
    * `src` and `cls` (party column) — shared by oracle generators. */
  def pacFrameSql: String = {
    def likes(keywords: Seq[String]) =
      keywords.map(k => s"lower(committee_name) LIKE '%$k%'").mkString("(", " OR ", ")")
    s"""src AS (
       |  SELECT CASE WHEN o_custkey % 89 = 0 THEN NULL
       |              WHEN o_custkey % 97 = 0 THEN ''
       |              ELSE 'T' || CAST(o_custkey % 50 AS VARCHAR) END AS ticker,
       |    CAST(year(o_orderdate) AS BIGINT) AS cycle,
       |    CASE o_orderpriority
       |      WHEN '1-URGENT' THEN 'GOP Victory Fund'
       |      WHEN '2-HIGH' THEN 'Democrats for Conservative Values'
       |      WHEN '3-MEDIUM' THEN 'Progressive Future PAC'
       |      WHEN '4-NOT SPECIFIED' THEN 'Neutral Business Alliance'
       |      ELSE 'Liberal Action Network' END AS committee_name,
       |    CASE WHEN o_orderkey % 101 = 0 THEN -o_totalprice ELSE o_totalprice END AS amount
       |  FROM orders),
       |cls AS (
       |  SELECT *, CASE WHEN ${likes(Derivations.RepublicanKeywords)} THEN 'republican'
       |                 WHEN ${likes(Derivations.DemocratKeywords)} THEN 'democrat'
       |            END AS party
       |  FROM src)""".stripMargin
  }

  /** DuckDB SQL for the party pivot over [[pacFrameSql]] (CTE `agg`). */
  def partyPivotSql: String =
    s"""${pacFrameSql},
       |agg AS (
       |  SELECT ticker, cycle,
       |    round(sum(CASE WHEN party = 'democrat' THEN amount ELSE 0 END), 2) AS democrat_total,
       |    round(sum(CASE WHEN party = 'republican' THEN amount ELSE 0 END), 2) AS republican_total
       |  FROM cls
       |  WHERE ticker IS NOT NULL AND ticker <> '' AND amount IS NOT NULL AND amount > 0
       |  GROUP BY 1,2
       |  HAVING sum(CASE WHEN party = 'democrat' THEN amount ELSE 0 END) > 0
       |      OR sum(CASE WHEN party = 'republican' THEN amount ELSE 0 END) > 0)""".stripMargin

  /** The j5/j10/j11 CDC changeset over the customer snapshot — updates
    * %7 (+1000 balance, UPDATED segment), deletes %11=3 (delete wins on
    * overlap via the %7-first CASE order), inserts %13=1 under shifted
    * keys. ONE builder so the eager-merge gate (j5) and the
    * merge-on-read gates (j10/j11) provably apply the identical change. */
  private def customerChanges(c: DataFrame): DataFrame = {
    val upserts = c
      .filter(col("c_custkey") % 7 === 0 || col("c_custkey") % 11 === 3)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        when(col("c_custkey") % 7 === 0, col("c_acctbal") + 1000)
          .otherwise(col("c_acctbal")).as("c_acctbal"),
        when(col("c_custkey") % 7 === 0, lit("UPDATED"))
          .otherwise(col("c_mktsegment")).as("c_mktsegment"),
        when(col("c_custkey") % 11 === 3, lit("D")).otherwise(lit("U")).as("op"))
    val inserts = c.filter(col("c_custkey") % 13 === 1)
      .select((col("c_custkey") + 10000000L).as("c_custkey"),
        concat(lit("NEW_"), col("c_custkey").cast("string")).as("c_name"),
        col("c_nationkey"), lit(0.0).as("c_acctbal"), col("c_mktsegment"),
        lit("U").as("op"))
    upserts.unionByName(inserts)
  }

  /** Second-night changeset for pl18 — updates %9=2 (doubled balance,
    * PHASE2 segment), deletes %17=5 (delete wins on overlap), full rows
    * derived from the ORIGINAL snapshot so the oracle replays it as a
    * pure customer-table expression. */
  private def customerChanges2(c: DataFrame): DataFrame = c
    .filter(col("c_custkey") % 9 === 2 || col("c_custkey") % 17 === 5)
    .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
      when(col("c_custkey") % 9 === 2, col("c_acctbal") * 2)
        .otherwise(col("c_acctbal")).as("c_acctbal"),
      when(col("c_custkey") % 9 === 2, lit("PHASE2"))
        .otherwise(col("c_mktsegment")).as("c_mktsegment"),
      when(col("c_custkey") % 17 === 5, lit("D")).otherwise(lit("U")).as("op"))

  def queries: Map[String, Q] = Map(
    // ----------------------------------------------------------------- PL20
    // LAKEHOUSE PUBLISH: the bridge from the engine-internal MOR table
    // to external readers — every CDC changeset that merges into the MOR
    // table ([[MorTable.merge]]) also publishes as ONE atomic
    // Delta-protocol commit ([[DeltaExport.commitMergeByKey]]: files
    // carrying changed keys removed, survivors + upserts re-added), so a
    // Delta reader outside the engine sees exactly MorTable.read at every
    // version. Stages pin the full-base publish, both incremental
    // publishes read back BY VERSION (time travel over the export), the
    // new-key / updated-segment / phase2-segment slices of the latest
    // snapshot, an EXACT row-level equality count between the external
    // snapshot and the internal fold (null-safe equality on every
    // column — the whole bridge claim in one number), and the replayed
    // publish no-op. A checkpoint lands before the reads, so snapshot
    // resolution also routes through the O(live-files) path. Oracle =
    // the eager double merge, segments modeled through both changesets.
    "pl20_lakehouse_publish" -> ((s, dir) => {
      import s.implicits._
      val c = Tables(s, dir).customer
      val tbl = SinkQueries.sinkDir("pl20_mor")
      val dlt = SinkQueries.sinkDir("pl20_delta")
      Seq(tbl, dlt).foreach(SinkQueries.clean)
      val cols = c.columns.toSeq
      graft.sinks.MorTable.writeBase(c, tbl, "c_custkey")
      graft.sinks.DeltaExport.commitAppend(
        graft.sinks.MorTable.read(s, tbl, "c_custkey")
          .select(cols.map(col): _*), dlt, expectedVersion = 0L): Unit
      graft.sinks.MorTable.merge(customerChanges(c), tbl, "c_custkey", "op", 1L)
      graft.sinks.DeltaExport.commitMergeByKey(s, dlt, customerChanges(c),
        "c_custkey", "op", expectedVersion = 1L): Unit
      graft.sinks.MorTable.merge(customerChanges2(c), tbl, "c_custkey", "op", 2L)
      graft.sinks.DeltaExport.commitMergeByKey(s, dlt, customerChanges2(c),
        "c_custkey", "op", expectedVersion = 2L): Unit
      val replay = graft.sinks.DeltaExport.commitMergeByKey(s, dlt,
        customerChanges2(c), "c_custkey", "op", expectedVersion = 2L)
      graft.sinks.DeltaExport.checkpoint(s, dlt): Unit
      val v0 = graft.sinks.DeltaExport.snapshot(s, dlt, asOfVersion = 0L)
      val v1 = graft.sinks.DeltaExport.snapshot(s, dlt, asOfVersion = 1L)
      val vl = graft.sinks.DeltaExport.snapshot(s, dlt)
      val morR = graft.sinks.MorTable.read(s, tbl, "c_custkey")
        .select(cols.map(n => col(n).as(s"m_$n")): _*)
      val eq = vl.join(morR,
          cols.map(n => col(n) <=> col(s"m_$n")).reduce(_ && _), "inner")
        .count()
      Seq(
        ("1_base_published", v0.count()),
        ("2_v1_rows", v1.count()),
        ("3_latest_rows", vl.count()),
        ("4_new_keys_live", vl.filter(col("c_custkey") > 10000000L).count()),
        ("5_updated_latest",
          vl.filter(col("c_mktsegment") === "UPDATED").count()),
        ("6_phase2_latest",
          vl.filter(col("c_mktsegment") === "PHASE2").count()),
        ("7_exact_match_mor", eq),
        ("8_replay_noop", if (replay == -1L) 1L else 0L)
      ).toDF("stage", "n").orderBy("stage")
    }),

    // ----------------------------------------------------------------- PL23
    // The EXPORT TIER'S DAY-2 LOOP, composed end to end: a CDF-enabled
    // Delta table takes two CDC merges bookmarked by `txn`
    // ([[DeltaExport.commitMergeByKey]]), with an OPTIMIZE between them —
    // the exact interleaving that silently swallowed a replayed batch
    // under a fixed batch→version mapping. Stages pin: the folded
    // snapshot, OPTIMIZE's data-invisibility (as-of the rearrange commit
    // equals as-of the merge before it), the change feed's per-class
    // counts for BOTH merges — including the re-insert of a key the
    // first merge deleted, and the no-feed delete of an already-missing
    // key — the feed's silence across the OPTIMIZE, pre==post image
    // counts, the txn bookmark after a checkpoint, and both replay
    // no-ops. The oracle rebuilds every count from the changeset
    // arithmetic.
    "pl23_delta_maintenance" -> ((s, dir) => {
      import s.implicits._
      val c = Tables(s, dir).customer
      val tbl = SinkQueries.sinkDir("pl23_delta")
      SinkQueries.clean(tbl)
      val D = graft.sinks.DeltaExport
      D.commitAppend(c, tbl, expectedVersion = 0L,
        enableChangeFeed = true): Unit
      val v1 = D.commitMergeByKey(s, tbl, customerChanges(c), "c_custkey",
        "op", txn = Some(("pl23", 0L)))
      val v2 = D.optimizeCompact(s, tbl)
      val v3 = D.commitMergeByKey(s, tbl, customerChanges2(c), "c_custkey",
        "op", txn = Some(("pl23", 1L)))
      D.checkpoint(s, tbl): Unit
      val r1 = D.commitMergeByKey(s, tbl, customerChanges(c), "c_custkey",
        "op", txn = Some(("pl23", 0L)))
      val r2 = D.commitMergeByKey(s, tbl, customerChanges2(c), "c_custkey",
        "op", txn = Some(("pl23", 1L)))
      val fc = D.changeFeed(s, tbl, 1L, v3)
        .groupBy("_commit_version", "_change_type").count().collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
        .withDefaultValue(0L)
      Seq(
        ("1_latest_rows", D.snapshot(s, tbl).count()),
        ("2_optimize_invisible", D.snapshot(s, tbl, asOfVersion = v2).count()),
        ("3_feed_v1_inserts", fc((v1, "insert"))),
        ("4_feed_v1_updates", fc((v1, "update_postimage"))),
        ("5_feed_v1_deletes", fc((v1, "delete"))),
        ("6_feed_optimize", D.changeFeed(s, tbl, v2, v2).count()),
        ("7_feed_v3_inserts", fc((v3, "insert"))),
        ("8_feed_v3_updates", fc((v3, "update_postimage"))),
        ("9_feed_v3_deletes", fc((v3, "delete"))),
        ("a_pre_eq_post",
          if (fc((v1, "update_preimage")) == fc((v1, "update_postimage")) &&
            fc((v3, "update_preimage")) == fc((v3, "update_postimage"))) 1L
          else 0L),
        ("b_txn_bookmark", if (D.lastTxnVersion(s, tbl, "pl23") == 1L) 1L else 0L),
        ("c_replay_noops",
          (if (r1 == -1L) 1L else 0L) + (if (r2 == -1L) 1L else 0L))
      ).toDF("stage", "n").orderBy("stage")
    }),

    // ----------------------------------------------------------------- PL18
    // The TABLE TIER's nightly maintenance loop, composed end to end
    // (round-17 verdict #5): a MOR table takes two nights of CDC merges;
    // the threshold-triggered maintenance pass no-ops while the backlog
    // is below water, then fires — MorTable.compact folds the
    // tombstones, BloomSkipIndex.update refreshes the point-lookup
    // sidecar over the folded files, and the folded state publishes as
    // a manifest-committed immutable snapshot. Funnel stages pin every
    // leg: the folded count, BOTH trigger branches, zero backlog after
    // the fold, index-routed point lookups EQUAL on the live (stale
    // index + unfolded merges) and folded tables, the snapshot count,
    // and the idempotent second pass. Oracle = the eager double merge.
    "pl18_table_maintenance" -> ((s, dir) => {
      import s.implicits._
      val c = Tables(s, dir).customer
      val tbl = SinkQueries.sinkDir("pl18_mor")
      val idx = SinkQueries.sinkDir("pl18_skipidx")
      val snap = SinkQueries.sinkDir("pl18_snapshot")
      Seq(tbl, idx, idx + "_next", idx + "_old", snap)
        .foreach(SinkQueries.clean)
      val keys = Seq(2L, 3L, 14L, 22L, 10000001L)
      graft.sinks.MorTable.writeBase(c, tbl, "c_custkey")
      graft.sinks.BloomSkipIndex.write(
        s, s"$tbl/data", "c_custkey", 1 << 13, 5, idx)
      graft.sinks.MorTable.merge(customerChanges(c), tbl, "c_custkey", "op", 1L)
      // night 1: backlog (1 batch) below the threshold — must no-op
      val noop1 = !graft.sinks.TableMaintenance.maintain(
        s, tbl, "c_custkey", idx, Some(snap), minTombstoneBatches = 2)
      graft.sinks.MorTable.merge(customerChanges2(c), tbl, "c_custkey", "op", 2L)
      // point lookup while the index is STALE and two merges are
      // unfolded — correctness must not depend on maintenance timing
      val live = graft.sinks.MorTable.lookupThroughIndex(
        s, tbl, "c_custkey", idx, keys).count()
      // night 2: backlog (2 batches) at the threshold — fold + refresh +
      // publish
      val ran = graft.sinks.TableMaintenance.maintain(
        s, tbl, "c_custkey", idx, Some(snap), minTombstoneBatches = 2)
      val post = graft.sinks.MorTable.lookupThroughIndex(
        s, tbl, "c_custkey", idx, keys).count()
      val left = graft.sinks.TableMaintenance.tombstoneBatches(s, tbl)
      val snapN = graft.sinks.LayoutSink.readManifested(s, snap).count()
      val noop2 = !graft.sinks.TableMaintenance.maintain(
        s, tbl, "c_custkey", idx, Some(snap), minTombstoneBatches = 2)
      val merged = graft.sinks.MorTable.read(s, tbl, "c_custkey").count()
      Seq(
        ("1_base", c.count()),
        ("2_merged", merged),
        ("3_first_pass_noop", if (noop1) 1L else 0L),
        ("4_compaction_ran", if (ran) 1L else 0L),
        ("5_tombstones_left", left.toLong),
        ("6_lookup_live", live),
        ("7_lookup_post", post),
        ("8_snapshot", snapN),
        ("9_second_pass_noop", if (noop2) 1L else 0L)
      ).toDF("stage", "n").orderBy("stage")
    }),
    // ---------------------------------------------------------------- A1/A8
    // Group-sum over sort keys (pac_data_processor.py:69) — TPC-H Q1 shape.
    "a1_group_sum" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 2).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ------------------------------------------------------------------- A3
    // Per-cycle sum + count sorted by key (pac_data_processor.py:357-360);
    // order year stands in for election_cycle.
    "a3_cycle_breakdown" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.orders
        .withColumn("cycle", year(col("o_orderdate")).cast("long"))
        .groupBy("cycle")
        .agg(round(sum("o_totalprice"), 2).as("total"), count(lit(1)).as("n"))
        .orderBy("cycle")
    }),

    // ------------------------------------------------------------ A4+P15+P16
    // Conditional pivot aggregation (pac_snowflake_realtime.py:90-128): the
    // keyword classifier (D3, precedence-ordered) buckets amounts per
    // (user, day); zero-only groups dropped.
    "a4_conditional_pivot" -> ((s, dir) => {
      val t = Tables(s, dir)
      val cls = when(lower(col("event_type")).contains("purchase") ||
                     lower(col("event_type")).contains("signup"), "conversion")
        .when(lower(col("event_type")).contains("click") ||
              lower(col("event_type")).contains("view"), "engagement")
        .otherwise(lit(null))
      Aggregations.conditionalPivot(
          t.events.filter(col("user_id").isNotNull),
          Seq(col("user_id"), to_date(col("ts")).as("day")),
          cls, col("value"),
          Seq("conversion" -> "conversion_total", "engagement" -> "engagement_total"))
        .filter(col("conversion_total") > 0 || col("engagement_total") > 0)
        .select(col("user_id"), col("day"),
          round(col("conversion_total"), 2).as("conversion_total"),
          round(col("engagement_total"), 2).as("engagement_total"))
        .orderBy("user_id", "day")
    }),

    // ---------------------------------------------------------------- D1+A5
    // Right-closed pd.cut binning (pac_data_processor.py:45-49) + frequency
    // count (value_counts, :352).
    "d1_amount_bins" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.orders
        .select(Derivations.amountCategory(col("o_totalprice")).as("amount_category"))
        .groupBy("amount_category")
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("amount_category"))
    }),

    // ------------------------------------------------------------------- D2
    // isin classification (pac_data_processor.py:52).
    "d2_company_type" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .withColumn("company_type",
          Derivations.companyType(col("c_mktsegment"), Seq("AUTOMOBILE", "MACHINERY")))
        .groupBy("company_type")
        .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("total_acctbal"))
        .orderBy("company_type")
    }),

    // -------------------------------------------------------------- D4+P10
    // Composite dedup key (pac_data_processor.py:174-178) and the
    // deterministic variant of the uuid id (SURVEY.md §7.3).
    "d4_composite_key" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.nation
        .select(
          col("n_nationkey").cast("long").as("n_nationkey"),
          Derivations.compositeKey(col("n_name"), col("n_nationkey")).as("composite_key"),
          Cleaning.deterministicId(col("n_name"), col("n_nationkey").cast("string")).as("det_id"))
        .orderBy("n_nationkey")
    }),

    // --------------------------------------------------------------- D3+A4
    // The reference's flagship realtime aggregation (pac_snowflake_realtime
    // .py:90-128) on a PAC-shaped frame synthesized from orders: committee
    // names are keyword-bearing (including a both-keywords row that must
    // classify republican by precedence, SURVEY.md §7.4(6)); blank/null
    // tickers and non-positive amounts exercise the P15/P16 skip filters.
    "d3_party_pivot" -> ((s, dir) => {
      val t = Tables(s, dir)
      Aggregations.partyPivot(pacFrame(t), "ticker", "cycle", "committee_name", "amount")
        .select(col("ticker"), col("cycle"),
          round(col("democrat_total"), 2).as("democrat_total"),
          round(col("republican_total"), 2).as("republican_total"))
        .orderBy("ticker", "cycle")
    }),

    // ------------------------------------------------------------------ A11
    // Exact interpolated percentiles per group — beyond the reference's
    // aggregate surface (SURVEY.md §2.5 notes these come free in Spark).
    "a11_percentiles" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.orders.groupBy("o_orderpriority")
        .agg(
          round(percentile(col("o_totalprice"), lit(0.5)), 2).as("median_price"),
          round(percentile(col("o_totalprice"), lit(0.9)), 2).as("p90_price"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    // ------------------------------------------------------------------ A12
    // ROLLUP grouping sets over the Q1 keys — subtotal + grand-total rows.
    "a12_rollup" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    // ------------------------------------------------------------------ A15
    // CUBE: all four grouping combinations in one Expand+aggregate pass
    // (the flag×status slice a12's ROLLUP cannot produce).
    "a15_cube" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem.cube("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    // ------------------------------------------------------------------ A13
    // Second-moment statistics per group: stddev, Pearson correlation and
    // sample covariance between quantity and unit price — single-pass
    // codegen'd aggregates (sum/sum-of-squares/cross-sums under the hood),
    // one keyed shuffle with map-side partials; no window, no self-join.
    "a13_group_stats" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem.groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("qty_stddev"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_corr"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("qty_price_covar"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // ------------------------------------------------------------------- A7
    "a7_distinct_values" -> ((s, dir) =>
      Aggregations.distinctValues(Tables(s, dir).orders, "o_orderpriority")),

    // ---------------------------------------------------------------- A6+A8+A9
    "a8_global_stats" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.orders.agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("o_custkey")).as("n_custs"),
        round(sum("o_totalprice"), 2).as("total"),
        round(avg("o_totalprice"), 2).as("avg_price"))
    }),

    // ------------------------------------------------------- A1/A8 (decimal)
    // DecimalType money twin of a1/a8 — SURVEY §7.4(4)'s float-money
    // caveat closed with a proven upgrade path, not a promise: cast the
    // money column to DECIMAL(18,2) at the scan and every downstream
    // aggregate is EXACT (decimal addition never rounds; double sums
    // drift with row count and addition order, which a 100 TB ledger
    // cannot tolerate). The per-row double→decimal cast is unambiguous
    // on both engines: source prices carry 2 decimal digits, so no
    // value sits near a half-ulp rounding boundary. Totals are emitted
    // as canonical decimal STRINGS so the gate proves digit-exact
    // agreement rather than comparing through a float round trip.
    "a19_decimal_money" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("__sp"),
          sum(col("l_quantity").cast("decimal(18,2)")).as("__sq"))
        .select(col("l_returnflag"), col("n"),
          col("__sp").cast("string").as("sum_price"),
          col("__sq").cast("string").as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // ----------------------------------------------------------------- x98
    // Bloom-filter join pruning (runtime-filter shape, explicit): the
    // build side's join keys (suppliers of one nation, ~1/25 of
    // suppliers) fold into ONE array<long> row that broadcasts to every
    // lineitem task; rows that cannot match are dropped at the scan —
    // BEFORE any exchange — and only the surviving slice pays the exact
    // semi-join + aggregation. At 100 TB the pruned mass never enters
    // the shuffle; the gate's result is the exact join's (a Bloom filter
    // has no false negatives, and false positives die in the semi-join),
    // so the oracle is the plain three-table join — FP-rate-invariant by
    // construction. Decimal-string totals, a19's digit-exact convention.
    "x98_bloom_prune" -> ((s, dir) => {
      val t = Tables(s, dir)
      val keys = t.supplier
        .join(t.nation.filter(col("n_name") === BloomNation),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey").cast("long").as("s_suppkey"))
      // one driver-side row of BloomBits/8 bytes — the filter-build step
      val words = keys.agg(
        Bloom.sketch(xxhash64(col("s_suppkey")), BloomBits, BloomProbes)
          .as("words"))
        .head().getAs[scala.collection.Seq[Long]]("words").toArray
      val pruned = Bloom.pruneInline(
        t.lineitem.select(col("l_suppkey").cast("long").as("l_suppkey"),
          col("l_extendedprice")),
        xxhash64(col("l_suppkey")), words, BloomBits, BloomProbes)
      // merge hint = the 100 TB shape: at production scale the build side
      // (all suppliers of a nation) exceeds the broadcast threshold and
      // the exact join is a shuffle join — the bloom's value is pruning
      // BELOW that exchange. The inline-literal prune pins that shape
      // (plan-audited): a crossJoin-broadcast prune here would be hoisted
      // above the semi-join by PushDownLeftSemiAntiJoin and filter
      // nothing from the shuffle.
      pruned
        .join(keys.hint("merge"), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("__sp"))
        .select(col("l_suppkey"), col("n_items"),
          col("__sp").cast("string").as("sum_price"))
        .orderBy("l_suppkey")
    }),

    // ----------------------------------------------------------- A6 (sketch)
    // KMV distinct-count sketch — the bounded-memory scale path for A6's
    // COUNT(DISTINCT) (the HLL spec covers error; THIS gate is
    // oracle-exact because "k smallest distinct 60-bit hashes" is a
    // deterministic set function DuckDB replays as ORDER BY hash LIMIT k).
    // The query runs the full 100 TB shape: per-shard sketches (≤ KmvK
    // longs leave each shard — the exact form would shuffle every
    // distinct key), then the LOSSLESS merge (re-aggregating the exploded
    // shard sketches with the same aggregate), then the estimate as a
    // fixed scalar-double expression. The oracle sketches the flat corpus
    // directly — merge must be result-invisible. exact/err columns keep
    // the gate honest about the estimator's actual error (~2-6% at
    // k=256), not just its determinism.
    "a20_kmv_distinct" -> ((s, dir) => {
      val t = Tables(s, dir)
      val hashed = t.lineitem.select(
        col("l_linenumber").cast("long").as("shard"),
        TextOps.md5Hash60(col("l_orderkey").cast("string")).as("h"))
      val shardSk = hashed.groupBy("shard")
        .agg(Aggregations.kmvSketch(col("h"), KmvK).as("sk"))
      val merged = shardSk.select(explode(col("sk")).as("h"))
        .agg(Aggregations.kmvSketch(col("h"), KmvK).as("sk"))
      val exact = t.lineitem.agg(
        countDistinct(col("l_orderkey")).as("exact_distinct"),
        countDistinct(col("l_linenumber")).as("n_shards"))
      merged.select(
          size(col("sk")).cast("long").as("n_sketch"),
          // element_at(sk, size(sk)), not element_at(sk, KmvK): the sketch
          // is ascending, so the last element IS the oracle's max(hv), and
          // a below-k sketch (corpus with < k distinct keys) degrades to
          // the same value on both sides instead of a Spark-side NULL
          // (round-13 advice — the KmvK form was gated only by a test-data
          // cardinality assumption).
          element_at(col("sk"), size(col("sk"))).as("kth_hash"),
          Aggregations.kmvEstimate(col("sk"), KmvK).as("est_distinct"))
        .crossJoin(broadcast(exact))
        .select(col("n_shards"), col("n_sketch"), col("kth_hash"),
          col("est_distinct"), col("exact_distinct"),
          expr("(abs(est_distinct - exact_distinct) * 1000000) div exact_distinct")
            .as("err_ppm"))
    }),

    // -------------------------------------------------------- A6 (lifecycle)
    // The stored-sketch lifecycle — the band/PQ-index steady-state move
    // applied to a corpus STATISTIC: the nightly build sketches the
    // standing base once and stores k hashes; when a batch arrives, only
    // the batch is scanned (O(|batch|)) and its hashes merge with the
    // STORED sketch — the standing corpus is never rescanned, yet the
    // merged sketch equals the from-scratch corpus sketch EXACTLY
    // (lossless merge: any corpus-k-smallest hash from the base is within
    // the base's k smallest). The oracle sketches base ∪ batch flat; the
    // incremental path must land on the same k hashes.
    "a21_kmv_incremental" -> ((s, dir) => {
      val t = Tables(s, dir)
      val key = TextOps.md5Hash60(col("l_orderkey").cast("string")).as("h")
      val idx = SinkQueries.sinkDir("a21_kmv_sketch")
      t.lineitem.filter(col("l_orderkey") % 10 =!= 0).select(key)
        .agg(Aggregations.kmvSketch(col("h"), KmvK).as("sk"))
        .select(explode(col("sk")).as("h"))
        .write.mode("overwrite").parquet(idx)
      val merged = s.read.parquet(idx).select(col("h"))
        .union(t.lineitem.filter(col("l_orderkey") % 10 === 0).select(key))
        .agg(Aggregations.kmvSketch(col("h"), KmvK).as("sk"))
      val exact = t.lineitem.agg(
        countDistinct(col("l_orderkey")).as("exact_distinct"))
      merged.select(
          size(col("sk")).cast("long").as("n_sketch"),
          // last element == oracle's max(hv); degrades identically below k
          // (see a20_kmv_distinct).
          element_at(col("sk"), size(col("sk"))).as("kth_hash"),
          Aggregations.kmvEstimate(col("sk"), KmvK).as("est_distinct"))
        .crossJoin(broadcast(exact))
        .select(col("n_sketch"), col("kth_hash"), col("est_distinct"),
          col("exact_distinct"))
    }),

    // ---------------------------------------------------------- A6 (grouped)
    // The sketch as a GROUPED aggregate — daily distinct users, the
    // classic product-analytics cardinality series: one pass, partial
    // aggregation per (day × partition), ≤ k longs per day crossing the
    // exchange where exact per-day COUNT(DISTINCT) shuffles every
    // (day, user) pair. k sits BELOW the sf0.01/sf0.1 per-day
    // cardinality and above sf0.001's, so the estimate branch and the
    // exact-below-k branch are both live across the test scales. The
    // exact column rides along to keep the error honest per group.
    "a23_daily_distinct" -> ((s, dir) => {
      val t = Tables(s, dir)
      val ev = t.events.filter(col("user_id").isNotNull)
        .select(col("ts").cast("date").as("day"),
          TextOps.md5Hash60(col("user_id").cast("string")).as("h"),
          col("user_id"))
      ev.groupBy("day")
        .agg(Aggregations.kmvSketch(col("h"), KmvDailyK).as("sk"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(col("day"),
          size(col("sk")).cast("long").as("n_sketch"),
          Aggregations.kmvEstimate(col("sk"), KmvDailyK).as("est_users"),
          col("exact_users"))
        .orderBy("day")
    }),

    // --------------------------------------------------------- A11 (sketch)
    // Quantiles from a log-bucketed histogram — the DDSketch idea on
    // EXACT integer arithmetic (bit-length + top-4-bits mantissa,
    // γ = 2^(1/8) ≈ 1.09), completing the sketch triad (distinct = KMV
    // a20-a23, heavy hitters = Misra-Gries x46, quantiles = this). The
    // bucket counts are the mergeable 100 TB path (a few hundred longs
    // per partition, map-side combinable) where a11's exact percentiles
    // need a global sort; the gate emits per percentile the containing
    // bucket's integer bounds AND the true rank statistic, so the
    // sketch's ≤ ~9% relative error is in the artifact.
    "a24_value_histogram" -> ((s, dir) => {
      val t = Tables(s, dir)
      Aggregations.logHistogramPercentiles(
        t.events.select(col("value")), "value", Seq(50, 95, 99))
    }),

    // ---------------------------------------------------------- A6 (overlap)
    // Set-overlap estimation from KMV sketches (Beyer et al., SIGMOD
    // 2007 §5): given only the two sets' sketches — never the sets —
    // estimate |A∩B| and Jaccard. THE planning primitive before a
    // cross-corpus dedup at 100 TB ("how much does the new crawl overlap
    // the standing corpus?" from 2·k stored longs instead of a corpus-
    // pair join). Merge the two sketches into the union sketch; the
    // fraction of its hashes present in BOTH input sketches estimates
    // Jaccard; intersection = Ĵ · |A∪B|̂. Every derived number is
    // integer (ppm) or the fixed scalar-double estimate expression —
    // deterministic on both engines. A = orderkeys with a returned line,
    // B = orderkeys with a line-1 ship: real overlap, neither subset.
    "a22_kmv_overlap" -> ((s, dir) => {
      val t = Tables(s, dir)
      val h = TextOps.md5Hash60(col("l_orderkey").cast("string")).as("h")
      val a = t.lineitem.filter(col("l_returnflag") === "R").select(h)
      val b = t.lineitem.filter(col("l_linenumber") === 1).select(h)
      def sk(df: DataFrame) =
        df.agg(Aggregations.kmvSketch(col("h"), KmvK).as("sk"))
      val skA = sk(a).select(col("sk").as("ska"))
      val skB = sk(b).select(col("sk").as("skb"))
      val both = skA.crossJoin(broadcast(skB))
      val stats = both.select(
        size(col("ska")).cast("long").as("n_a"),
        size(col("skb")).cast("long").as("n_b"),
        // union sketch = k smallest of the merged hash sets (array ops —
        // the sketches are k-row driver-free columns)
        slice(array_sort(array_union(col("ska"), col("skb"))), 1, KmvK)
          .as("sku"))
        .select(col("n_a"), col("n_b"), col("sku"),
          size(col("sku")).cast("long").as("n_u"),
          Aggregations.kmvEstimate(col("sku"), KmvK).as("est_union"))
      val withJ = stats
        .crossJoin(broadcast(skA)).crossJoin(broadcast(skB))
        .select(col("n_a"), col("n_b"), col("n_u"), col("est_union"),
          size(filter(col("sku"),
            x => array_contains(col("ska"), x) && array_contains(col("skb"), x)))
            .cast("long").as("j_common"))
      val exact = t.lineitem.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey")).distinct()
        .join(t.lineitem.filter(col("l_linenumber") === 1)
          .select(col("l_orderkey")).distinct(), Seq("l_orderkey"))
        .agg(count(lit(1)).as("exact_intersection"))
      withJ.crossJoin(broadcast(exact)).select(
        col("n_a"), col("n_b"), col("n_u"), col("j_common"),
        expr("(j_common * 1000000) div n_u").as("jaccard_ppm"),
        expr("(j_common * est_union) div n_u").as("est_intersection"),
        col("exact_intersection"))
    }),

    // ------------------------------------------------------------------ A10
    // Count reconciliation (check_duplicates.py:124-172): incoming
    // (customers) vs existing (suppliers) per nation key.
    "a10_reconcile" -> ((s, dir) => {
      val t = Tables(s, dir)
      Aggregations.reconcile(
        t.customer.select(col("c_nationkey").cast("long").as("nationkey")),
        t.supplier.select(col("s_nationkey").cast("long").as("nationkey")),
        "nationkey")
    }),

    // ------------------------------------------------------------------- T1
    // nlargest top-k rows (pac_data_processor.py:64), tie-broken.
    "t1_topk_rows" -> ((s, dir) => {
      val t = Tables(s, dir)
      Aggregations.topKRows(
        t.orders.select("o_orderkey", "o_totalprice"),
        col("o_totalprice"), Seq(col("o_orderkey")), 5)
    }),

    // ------------------------------------------------------------------- T2
    // Top-k groups by total (pac_data_processor.py:347).
    "t2_topk_groups" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem.groupBy("l_suppkey")
        .agg(round(sum("l_extendedprice"), 2).as("total"))
        .orderBy(desc("total"), col("l_suppkey"))
        .limit(10)
    }),

    // ----------------------------------------------------------------- x38
    // Top-k per group via the custom bounded-heap physical operator
    // (plans/TopKPerKey.scala — LogicalPlan + SparkStrategy + SparkPlan):
    // top-3 orders per order priority by price. Result-identical to a
    // row_number window (the oracle IS that window), but the plan is
    // partial heap → ONE exchange of ≤k rows per (key × partition) →
    // final heap — no per-group sort anywhere (plan-audited in
    // TopKPerKeySpec).
    "x38_native_topk" -> ((s, dir) => {
      val t = Tables(s, dir)
      graft.plans.TopKPerKey.topKPerKey(
          t.orders.select("o_orderpriority", "o_orderkey", "o_totalprice"),
          Seq("o_orderpriority"),
          Seq(desc("o_totalprice"), col("o_orderkey")), 3)
        .orderBy(col("o_orderpriority"), desc("o_totalprice"), col("o_orderkey"))
    }),

    // ------------------------------------------------------------------- J1
    // Broadcast lookup join (pac_snowflake_realtime.py:135-148): fact rows
    // join two small dims; both joins broadcast, zero extra shuffles.
    "j1_lookup_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      Dedup.lookupJoin(
          Dedup.lookupJoin(t.customer.withColumnRenamed("c_nationkey", "n_nationkey"),
            t.nation, "n_nationkey"),
          t.region.withColumnRenamed("r_regionkey", "n_regionkey"), "n_regionkey")
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_customers"), round(sum("c_acctbal"), 2).as("total_acctbal"))
        .orderBy("r_name")
    }),

    // ------------------------------------------------------------- J2 (keep-first)
    // Deterministic keep-first dedup (SURVEY.md §7.4(3)). Window form: at
    // lineitem's ~7 rows/key the min_by aggregation form ships whole-row
    // structs for little partial-agg reduction and measures slower.
    "j2_dedup_keepfirst" -> ((s, dir) => {
      val t = Tables(s, dir)
      Dedup.keepFirst(t.lineitem,
          Seq("l_partkey", "l_suppkey"),
          Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber")))
        .agg(count(lit(1)).as("n_survivors"), round(sum("l_quantity"), 2).as("qty"))
    }),

    // ------------------------------------------------------------- J2 (anti-join)
    // Upload-vs-existing dedup shape (pac_snowflake_pipeline.py:209-250):
    // customers with no urgent order.
    "j2_anti_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      Dedup.antiJoinExisting(
          t.customer.select(col("c_custkey")),
          t.orders.filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"))
        .orderBy("c_custkey")
    }),

    // ------------------------------------------------------------------- J3
    // As-of join (engine extension): each event picks up the latest order
    // of the same customer with o_orderdate <= ts, via union + keyed
    // carry-forward (one shuffle, no inequality join). Aggregated per
    // matched order priority.
    "j3_asof_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      Joins.asofJoin(
          t.events.select(col("event_id"), col("user_id"), col("ts")),
          col("user_id"), col("ts"),
          t.orders, col("o_custkey"), col("o_orderdate"),
          col("o_orderkey"),
          carryCols = Seq("o_orderpriority", "o_totalprice"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_events"),
          round(sum("o_totalprice"), 2).as("matched_total"))
        .orderBy("o_orderpriority")
    }),

    // ------------------------------------------------------------------- J4
    // Bounded range self-join (engine extension): order pairs of the same
    // customer within 30 days, banded into radius-wide buckets so the
    // plan is an equi hash join (never O(n²)).
    "j4_range_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      Joins.rangeSelfPairs(t.orders, "o_custkey", "o_orderdate", "o_orderkey",
          radiusSec = 30L * 24 * 3600)
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("key")).as("n_customers"))
    }),

    // ------------------------------------------------------------------- J5
    // CDC snapshot merge (engine extension): apply a deterministic
    // changeset (updates %7, deletes %11, inserts %13 with shifted keys,
    // delete-wins on overlap) to the customer snapshot via ONE full-outer
    // keyed join, then aggregate the merged state per segment.
    "j5_upsert_merge" -> ((s, dir) => {
      val c = Tables(s, dir).customer
      Merge.applyChanges(c, customerChanges(c), Seq("c_custkey"), "op")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("bal_total"))
        .orderBy("c_mktsegment")
    }),

    // ------------------------------------------------------------------ J10
    // j5's merge as MERGE-ON-READ — the table-tier tombstone shape
    // (Iceberg/Delta): the identical changeset lands as one delete file
    // + one appended data file (O(|changeset|) bytes; every base file
    // untouched — at 100 TB the eager j5 rewrite moves the whole table
    // per merge), and the READ folds them with one key anti-join. Same
    // oracle as j5: the storage strategy must be result-invisible.
    "j10_mor_merge" -> ((s, dir) => {
      val c = Tables(s, dir).customer
      val tbl = SinkQueries.sinkDir("j10_mor_table")
      graft.sinks.MorTable.writeBase(c, tbl, "c_custkey")
      graft.sinks.MorTable.merge(customerChanges(c), tbl, "c_custkey", "op", 1L)
      graft.sinks.MorTable.read(s, tbl, "c_custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("bal_total"))
        .orderBy("c_mktsegment")
    }),

    // ------------------------------------------------------------------ J11
    // J10's maintenance half: compaction folds the tombstones into a
    // fresh range-laid base (read-side anti-join cost capped, key
    // pruning restored on the merged rows) and must be result-invisible
    // — the read off the compacted table shares j5's oracle verbatim.
    "j11_mor_compact" -> ((s, dir) => {
      val c = Tables(s, dir).customer
      val tbl = SinkQueries.sinkDir("j11_mor_table")
      graft.sinks.MorTable.writeBase(c, tbl, "c_custkey")
      graft.sinks.MorTable.merge(customerChanges(c), tbl, "c_custkey", "op", 1L)
      graft.sinks.MorTable.compact(s, tbl, "c_custkey")
      graft.sinks.MorTable.read(s, tbl, "c_custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("bal_total"))
        .orderBy("c_mktsegment")
    }),

    // ------------------------------------------------------------------ J12
    // ADDITIVE SCHEMA EVOLUTION through a MOR merge (round-17 verdict
    // #3): the changeset carries a column the base has never seen
    // (c_tier). The merge lands it physically in its own seq files, the
    // sidecar widens, and the READ null-backfills every pre-evolution
    // row through the pinned schema — zero base bytes rewritten. The
    // oracle is the eager rewrite with the same evolution applied:
    // storage strategy AND evolution mechanics must be result-invisible.
    // n_tiered counts non-null c_tier (exactly the post-evolution rows),
    // pinning the backfill behavior in the hash.
    "j12_mor_evolve" -> ((s, dir) => {
      val c = Tables(s, dir).customer
      val tbl = SinkQueries.sinkDir("j12_mor_table")
      graft.sinks.MorTable.writeBase(c, tbl, "c_custkey")
      val ch = customerChanges(c).withColumn("c_tier",
        when(col("c_acctbal") > 5000, lit("gold")).otherwise(lit("std")))
      graft.sinks.MorTable.merge(ch, tbl, "c_custkey", "op", 1L)
      morEvolveReport(graft.sinks.MorTable.read(s, tbl, "c_custkey"))
    }),

    // ------------------------------------------------------------------ J14
    // J12's evolution contract carried ACROSS THE LAKEHOUSE BRIDGE: the
    // same evolved changeset (c_tier rides in) merges into a
    // Delta-protocol export instead of the MOR table —
    // [[graft.sinks.DeltaExport.commitMergeByKey]] widens the published
    // schema via a new metaData action in the SAME atomic commit,
    // untouched files null-backfill through the reader schema, and the
    // external snapshot must equal the eager evolved merge. Shares j12's
    // oracle verbatim: internal table and external export answer the
    // backfill-sensitive rollup identically.
    "j14_delta_evolve" -> ((s, dir) => {
      val c = Tables(s, dir).customer
      val tbl = SinkQueries.sinkDir("j14_delta_table")
      SinkQueries.clean(tbl)
      graft.sinks.DeltaExport.commitAppend(c, tbl, expectedVersion = 0L): Unit
      val ch = customerChanges(c).withColumn("c_tier",
        when(col("c_acctbal") > 5000, lit("gold")).otherwise(lit("std")))
      graft.sinks.DeltaExport.commitMergeByKey(s, tbl, ch, "c_custkey", "op",
        expectedVersion = 1L): Unit
      morEvolveReport(graft.sinks.DeltaExport.snapshot(s, tbl))
    }),

    // ------------------------------------------------------------------ J15
    // CHANGE DATA FEED across the bridge: the SAME evolved merge as j14,
    // but the deliverable is the commit's row-level delta read back
    // through [[graft.sinks.DeltaExport.changeFeed]] — deletes and
    // update pre-images with the base's ORIGINAL values (c_tier
    // null-backfilled, pinned by n_tiered=0), post-images and inserts
    // with the changeset's values (n_tiered=n). The oracle derives each
    // class directly from the customer arithmetic: the feed must be the
    // exact delta, not a diff approximation.
    "j15_delta_cdf" -> ((s, dir) => {
      val c = Tables(s, dir).customer
      val tbl = SinkQueries.sinkDir("j15_delta_table")
      SinkQueries.clean(tbl)
      graft.sinks.DeltaExport.commitAppend(c, tbl, expectedVersion = 0L,
        enableChangeFeed = true): Unit
      val ch = customerChanges(c).withColumn("c_tier",
        when(col("c_acctbal") > 5000, lit("gold")).otherwise(lit("std")))
      graft.sinks.DeltaExport.commitMergeByKey(s, tbl, ch, "c_custkey", "op",
        expectedVersion = 1L): Unit
      graft.sinks.DeltaExport.changeFeed(s, tbl, 1L, 1L)
        .groupBy("_change_type")
        .agg(count(lit(1)).as("n"),
          round(sum("c_acctbal"), 2).as("bal_total"),
          count(col("c_tier")).as("n_tiered"))
        .orderBy("_change_type")
    }),

    // ------------------------------------------------------------------ J13
    // J12's maintenance half: compaction across the evolution boundary
    // MATERIALIZES the widened schema (the folded base carries c_tier
    // physically, nulls for pre-evolution rows) and must stay
    // result-invisible — shares j12's oracle verbatim.
    "j13_mor_evolve_compact" -> ((s, dir) => {
      val c = Tables(s, dir).customer
      val tbl = SinkQueries.sinkDir("j13_mor_table")
      graft.sinks.MorTable.writeBase(c, tbl, "c_custkey")
      val ch = customerChanges(c).withColumn("c_tier",
        when(col("c_acctbal") > 5000, lit("gold")).otherwise(lit("std")))
      graft.sinks.MorTable.merge(ch, tbl, "c_custkey", "op", 1L)
      graft.sinks.MorTable.compact(s, tbl, "c_custkey")
      morEvolveReport(graft.sinks.MorTable.read(s, tbl, "c_custkey"))
    }),

    // ------------------------------------------------------------------- J9
    // Snapshot diff by content fingerprint: the validation report a
    // nightly ingest runs before swapping snapshots — added / removed /
    // changed / unchanged discovered from two keyed snapshots (j5 applies
    // a KNOWN changeset; this derives the changeset two snapshots imply).
    // Old = docs except doc_id%7=3; new = docs except doc_id%7=0, with
    // every doc_id%5=0 text edited — all four statuses populated. One
    // full-outer join over (id, sha256) projections; bodies never ship.
    "j9_snapshot_diff" -> ((s, dir) => {
      val t = Tables(s, dir)
      def fp(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_id"),
          graft.operators.TextOps.fingerprint(col("text")).as("fp"))
      val oldSnap = fp(t.documents).filter(col("doc_id") % 7 =!= 3)
      val newSnap = fp(t.documents
          .withColumn("text", when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" rev2"))).otherwise(col("text"))))
        .filter(col("doc_id") % 7 =!= 0)
      graft.operators.Merge.snapshotDiff(oldSnap, newSnap, "doc_id", "fp")
        .groupBy("status")
        .agg(count(lit(1)).as("n_docs"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
        .orderBy("status")
    }),

    // ------------------------------------------------------------------- J6
    // SCD type-2 history build (engine extension): orders as a per-customer
    // change log → versioned rows with validity intervals, aggregated per
    // priority (version counts, open versions, total closed-interval days).
    "j6_scd2" -> ((s, dir) => {
      val t = Tables(s, dir)
      Merge.scd2History(
          t.orders.select("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority"),
          Seq("o_custkey"), "o_orderdate", Seq("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_versions"),
          sum(when(col("is_current"), 1L).otherwise(0L)).as("n_current"),
          sum(when(col("is_current"), 0L)
            .otherwise(datediff(col("valid_to"), col("valid_from")).cast("long")))
            .as("closed_days"))
        .orderBy("o_orderpriority")
    }),

    // ------------------------------------------------------------------- U2
    // Unpivot/melt (wide → long reshape): lineitem measures to
    // (metric, value) rows, re-aggregated per metric. The inverse of the
    // A4 pivot; `unpivot` is a zero-shuffle row-local fan-out.
    "u2_unpivot" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "metric", "value")
        .groupBy("metric")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("value_total"))
        .orderBy("metric")
    }),

    // ------------------------------------------------------------------ A18
    // Per-group mode (most frequent value): two keyed aggregations with a
    // max_by argmax — no window, no in-group sort; ties break to the
    // lowest value via the (count, -value) ordering struct.
    "a18_group_mode" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("c_mktsegment")
        .agg(
          max_by(col("c_nationkey"),
            struct(col("cnt"), (-col("c_nationkey")).as("neg"))).cast("long")
            .as("mode_nation"),
          max(struct(col("cnt"), (-col("c_nationkey")).as("neg")))
            .getField("cnt").as("n"))
        .orderBy("c_mktsegment")
    }),

    // ------------------------------------------------------------------ A16
    // Incremental aggregate maintenance: two half-snapshots (orders before/
    // since 1998) each aggregate alone, then merge by sum-of-sums — the
    // never-rescan-history rollup. The oracle aggregates the full table
    // directly, so the merge must be exactly re-aggregable.
    "a16_incremental_agg" -> ((s, dir) => {
      val t = Tables(s, dir)
      def snap(cond: org.apache.spark.sql.Column) =
        t.orders.filter(cond).groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), sum("o_totalprice").as("total"))
      Aggregations.mergeAggSnapshots(
          Seq(snap(year(col("o_orderdate")) < 1998),
            snap(year(col("o_orderdate")) >= 1998)),
          Seq("o_orderpriority"))
        .select(col("o_orderpriority"), col("n"),
          round(col("total"), 2).as("total"))
        .orderBy("o_orderpriority")
    }),

    // ------------------------------------------------------------------ A17
    // Declarative data-quality report: row rules fold into ONE conditional-
    // sum scan; uniqueness adds a keyed distinct; referential integrity an
    // anti join against the broadcast dimension.
    "a17_quality_checks" -> ((s, dir) => {
      val t = Tables(s, dir)
      Quality.report(t.customer,
          rowRules = Seq(
            Quality.notNull("c_name"),
            Quality.inRange("c_acctbal", 0, 5000),
            Quality.matches("c_mktsegment", "^(AUTOMOBILE|BUILDING)$")),
          keyCols = Some(Seq("c_custkey")),
          refs = Seq(("c_nationkey", t.nation.select(col("n_nationkey")), "n_nationkey")))
        .orderBy("rule")
    }),

    // ------------------------------------------------------------------ A14
    // Table profiler (engine extension): per-column row/non-null/distinct
    // counts and min/max — one column-pruned scan per column, unioned.
    "a14_profile" -> ((s, dir) =>
      Aggregations.profile(Tables(s, dir).orders).orderBy("column")),

    // ------------------------------------------------------------------- J7
    // Skew-safe salted join: lineitem × supplier on suppkey with the
    // dimension replicated over 8 deterministic salt buckets — the manual
    // hot-key spreading technique; the aggregate proves it is
    // result-identical to the plain join (which is all the oracle runs).
    "j7_salted_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      Joins.saltedJoin(
          t.lineitem.select(col("l_suppkey").as("s_suppkey"),
            col("l_orderkey"), col("l_extendedprice")),
          t.supplier.select("s_suppkey", "s_nationkey"),
          "s_suppkey", col("l_orderkey"), salts = 8)
        .groupBy(col("s_nationkey").cast("long").as("s_nationkey"))
        .agg(count(lit(1)).as("n"),
          round(sum("l_extendedprice"), 2).as("revenue"))
        .orderBy("s_nationkey")
    }),

    // ------------------------------------------------------------------- J8
    // Bloom-prefiltered join: lineitem probes a sketch of the urgent-1997
    // order keys before its exchange, so ~96% of lineitem rows drop at the
    // scan instead of shuffling; the exact join removes sketch false
    // positives, so the oracle is the PLAIN join — equivalence by
    // construction at any fpp.
    "j8_bloom_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      val hot = t.orders
        .filter(col("o_orderpriority") === "1-URGENT" &&
          year(col("o_orderdate")) === 1997)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate"))
      Joins.bloomPrefilteredJoin(
          t.lineitem.select("l_orderkey", "l_extendedprice", "l_discount"),
          hot, "l_orderkey", expectedItems = 200000)
        .groupBy(month(col("o_orderdate")).as("o_month"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy("o_month")
    }),

    // --------------------------------------------------------------- P3+P4
    // Trim + lower + numeric coercion (pac_data_processor.py:30-39).
    "p3_clean_normalize" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer.select(
          col("c_custkey"),
          trim(col("c_name")).as("c_name"),
          lower(col("c_mktsegment")).as("segment"),
          Cleaning.toNumericFill0(col("c_acctbal")).as("acctbal"))
        .orderBy("c_custkey")
    }),

    // ------------------------------------------------------------------- P5
    // Name-pattern type coercion (pac_snowflake_pipeline.py:88-113) applied
    // to an all-string frame: *id → long, *date → timestamp, *value → money.
    // Deliberately NOT on the events table (r10 lesson: when the events
    // source broke, every cleaning gate riding it vanished too — §2
    // cleaning coverage must not be correlated with one source's health).
    "p5_name_coercion" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.orders.select(
          col("o_orderkey").cast("string").as("record_id"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("order_date"),
          col("o_totalprice").cast("string").as("total_value"))
        .transform(Cleaning.cleanGeneric)
        .orderBy("record_id")
    }),

    // ------------------------------------------------------------------- P6
    // Datetime coercion standalone gate (pd.to_datetime(errors='coerce'),
    // pac_snowflake_pipeline.py:108-113): parseable strings → timestamps,
    // injected garbage → null, aggregated by parsed year (-1 = unparseable)
    // so the malformed branch is visible in the output, not just absorbed.
    "p6_datetime_coercion" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.orders
        .select(when(col("o_orderkey") % 7 === 0, lit("not-a-date"))
          .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
          .as("raw"))
        .select(Cleaning.toDatetime(col("raw")).as("parsed"))
        .groupBy(coalesce(year(col("parsed")), lit(-1)).cast("long").as("yr"))
        .agg(count(lit(1)).as("n"))
        .orderBy("yr")
    }),

    // --------------------------------------------------------------- §2.7
    // Set operations surfaced as first-class ops (the reference never
    // unions its datasets; Spark gives union/intersect/except free):
    // customers active in 1995 vs 1996 — overlapping sets, so all three
    // counts are non-trivial. INTERSECT/EXCEPT are distinct-semantics on
    // both engines.
    "u1_set_ops" -> ((s, dir) => {
      val t = Tables(s, dir)
      def buyers(yr: Int) =
        t.orders.filter(year(col("o_orderdate")) === yr).select("o_custkey")
      val a = buyers(1995)
      val b = buyers(1996)
      a.union(b).distinct().agg(count(lit(1)).as("n_union"))
        .crossJoin(a.intersect(b).agg(count(lit(1)).as("n_intersect")))
        .crossJoin(a.except(b).agg(count(lit(1)).as("n_except")))
    }),

    // --------------------------------------------------------------- P2+P7
    // Strict column normalization + drop-all-null-rows, both firing on real
    // data: a messy extract (spaced/mixed-case headers, the shape Snowflake
    // exports arrive in) plus an injected all-null row. normalizeColumns
    // must produce the clean names the aggregate references (analysis
    // fails otherwise); dropAllNullRows must remove the injected row (row
    // counts mismatch otherwise). (pac_snowflake_realtime.py:78;
    // pac_snowflake_pipeline.py:116)
    "p2_normalize_dropnull" -> ((s, dir) => {
      val t = Tables(s, dir)
      val messy = t.customer.select(
        col("c_custkey").as("  Cust Key "),
        col("c_name").as("Cust  Name"),
        col("c_mktsegment").as("Market Segment"))
      val allNull = s.createDataFrame(
        java.util.Collections.singletonList(
          org.apache.spark.sql.Row(null, null, null)),
        org.apache.spark.sql.types.StructType(
          messy.schema.fields.map(_.copy(nullable = true))))
      messy.union(allNull)
        .transform(Cleaning.normalizeColumns)
        .transform(Cleaning.cleanGeneric)
        .groupBy("market_segment")
        .agg(count(lit(1)).as("n"),
          sum(col("cust_key")).as("key_sum"),
          max(length(col("cust_name"))).cast("long").as("max_name_len"))
        .orderBy("market_segment")
    }),

    // --------------------------------------------------------------- P7+P8
    // Null handling: injected nulls, then the global numeric/string fills
    // (pac_snowflake_pipeline.py:95,116; pac_snowflake_realtime.py:85).
    // On customer, not events — same de-correlation rationale as P5.
    "p8_null_fill" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .select(
          when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")).as("bal"),
          when(col("c_mktsegment") === "BUILDING", lit(null)).otherwise(col("c_mktsegment")).as("seg"))
        .transform(Cleaning.fillNumericNulls)
        .transform(Cleaning.fillStringNulls)
        .groupBy("seg")
        .agg(count(lit(1)).as("n"), round(sum("bal"), 2).as("bal_total"))
        .orderBy("seg")
    }),

    // ------------------------------------------------------------------ P9
    // Metadata stamping under a FIXED batch clock: the reference stamps
    // datetime.now() (pac_data_processor.py:55-57) which no oracle can
    // replay; the fixed-clock variant pins processed_date to the batch's
    // logical time, flipping P9 from spec-only to oracle-covered.
    "p9_metadata" -> ((s, dir) => {
      val t = Tables(s, dir)
      Cleaning.withMetadata(t.region.select("r_regionkey", "r_name"),
          "csv", "region", Some(MetadataClock))
        .orderBy("r_regionkey")
    }),

    // ------------------------------------------------------------------ P11
    // Timestamp → ISO-8601 string (.isoformat(), pac_data_processor.py:118).
    "p11_iso8601" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.orders.select(col("o_orderkey"), Cleaning.toIso8601(col("o_orderdate")).as("iso"))
        .orderBy("o_orderkey")
    }),

    // ------------------------------------------------------------- P13+P14
    // Filter + projection pushdown (TPC-H Q6 shape): both the date predicate
    // and the 2-column read reach the parquet scan.
    "p14_pushdown_filter" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_discount") > 0.05)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy("l_returnflag")
    }),

    // ------------------------------------------------------------------ P18'
    // JSON extraction over the events props column (engine extension noted in
    // SURVEY.md §2.8 — the reference only serializes JSON).
    "p18_json_extract" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.events
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(sum("k").as("k_sum"), count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // ------------------------------------------------------- multi-way join
    // TPC-H Q3 shape: 3-way join, segment filter, top-10 revenue orders.
    "join_q3_revenue" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer.filter(col("c_mktsegment") === "BUILDING")
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    }),

    // ------------------------------------------------------- multi-way join
    // TPC-H Q18 shape: HAVING-filtered big orders (the aggregate-then-
    // filter pattern) semi-joining orders + customer; the heavy lineitem
    // aggregation happens FIRST so only qualifying order keys reach the
    // joins — filter-early at the aggregate level.
    "join_q18_big_orders" -> ((s, dir) => {
      val t = Tables(s, dir)
      val big = t.lineitem.groupBy("l_orderkey")
        .agg(round(sum("l_quantity"), 2).as("total_qty"))
        .filter(col("total_qty") > 150)
      big.join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(desc("total_qty"), col("o_orderkey"))
        .limit(10)
    }),

    // ------------------------------------------------------- multi-way join
    // TPC-H Q10 shape: returned-item revenue per customer over one quarter
    // — selective date + returnflag filters reach both scans, nation
    // broadcasts, top-20 customers by lost revenue.
    "join_q10_returns" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .join(t.orders.filter(
            col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(t.lineitem.filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20)
    }),

    // ------------------------------------------------------- multi-way join
    // TPC-H Q5 shape: 6-way join with co-located supplier/customer nation.
    "join_q5_nation_revenue" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.supplier,
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(t.nation, col("s_nationkey") === col("n_nationkey"))
        .join(t.region, col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    })
  )

  /** j5's eager-merge replay — shared verbatim by j10 (merge-on-read
    * fold) and j11 (compacted fold): the storage strategy is
    * result-invisible, so all three gates pin the same merged state. */
  /** The shared j12/j13 report over the folded state: segment rollup +
    * the evolution-sensitive columns (n_tiered counts non-null c_tier —
    * old rows must read back null; n_gold checks the values landed). */
  private def morEvolveReport(folded: DataFrame): DataFrame =
    folded.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        round(sum("c_acctbal"), 2).as("bal_total"),
        count(col("c_tier")).as("n_tiered"),
        sum(when(col("c_tier") === "gold", 1L).otherwise(0L)).as("n_gold"))
      .orderBy("c_mktsegment")

  /** j12/j13: the eager-rewrite image of the evolved merge — the change
    * CTE gains c_tier, base rows surface NULL for it, and the rollup
    * replays the backfill-sensitive counts. */
  private lazy val morEvolveSql: String =
    """WITH ch AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 1000 ELSE c_acctbal END AS c_acctbal,
        |    CASE WHEN c_custkey % 7 = 0 THEN 'UPDATED' ELSE c_mktsegment END AS c_mktsegment,
        |    CASE WHEN c_custkey % 11 = 3 THEN 'D' ELSE 'U' END AS op
        |  FROM customer WHERE c_custkey % 7 = 0 OR c_custkey % 11 = 3
        |  UNION ALL
        |  SELECT c_custkey + 10000000, 'NEW_' || CAST(c_custkey AS VARCHAR),
        |    c_nationkey, CAST(0.0 AS DOUBLE), c_mktsegment, 'U'
        |  FROM customer WHERE c_custkey % 13 = 1
        |), cht AS (
        |  SELECT *, CASE WHEN c_acctbal > 5000 THEN 'gold' ELSE 'std' END AS c_tier
        |  FROM ch
        |), merged AS (
        |  SELECT
        |    CASE WHEN ch.op IS NOT NULL THEN ch.c_mktsegment ELSE b.c_mktsegment END AS c_mktsegment,
        |    CASE WHEN ch.op IS NOT NULL THEN ch.c_acctbal ELSE b.c_acctbal END AS c_acctbal,
        |    CASE WHEN ch.op IS NOT NULL THEN ch.c_tier ELSE NULL END AS c_tier
        |  FROM customer b FULL OUTER JOIN cht ch ON b.c_custkey = ch.c_custkey
        |  WHERE ch.op IS NULL OR ch.op <> 'D')
        |SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal_total,
        |  count(c_tier) AS n_tiered,
        |  CAST(sum(CASE WHEN c_tier = 'gold' THEN 1 ELSE 0 END) AS BIGINT) AS n_gold
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin

  /** pl18: the eager image of two stacked merges (m1, m2 — the same
    * full-outer-join shape as j5's oracle, chained), then the funnel —
    * every storage-mechanics stage (trigger branches, backlog, replay
    * no-op) pins to a literal the Spark side must EARN from the real
    * filesystem state, and every data stage to an m2 count. */
  private lazy val tableMaintenanceSql: String = {
    val keysIn = "(2, 3, 14, 22, 10000001)"
    """WITH ch1 AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 1000 ELSE c_acctbal END AS c_acctbal,
      |    CASE WHEN c_custkey % 7 = 0 THEN 'UPDATED' ELSE c_mktsegment END AS c_mktsegment,
      |    CASE WHEN c_custkey % 11 = 3 THEN 'D' ELSE 'U' END AS op
      |  FROM customer WHERE c_custkey % 7 = 0 OR c_custkey % 11 = 3
      |  UNION ALL
      |  SELECT c_custkey + 10000000, 'NEW_' || CAST(c_custkey AS VARCHAR),
      |    c_nationkey, CAST(0.0 AS DOUBLE), c_mktsegment, 'U'
      |  FROM customer WHERE c_custkey % 13 = 1
      |), m1 AS MATERIALIZED (
      |  SELECT coalesce(ch.c_custkey, b.c_custkey) AS c_custkey
      |  FROM customer b FULL OUTER JOIN ch1 ch ON b.c_custkey = ch.c_custkey
      |  WHERE ch.op IS NULL OR ch.op <> 'D'
      |), ch2 AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 17 = 5 THEN 'D' ELSE 'U' END AS op
      |  FROM customer WHERE c_custkey % 9 = 2 OR c_custkey % 17 = 5
      |), m2 AS MATERIALIZED (
      |  SELECT coalesce(ch.c_custkey, b.c_custkey) AS c_custkey
      |  FROM m1 b FULL OUTER JOIN ch2 ch ON b.c_custkey = ch.c_custkey
      |  WHERE ch.op IS NULL OR ch.op <> 'D')
      |SELECT stage, n FROM (
      |  SELECT '1_base' AS stage, count(*) AS n FROM customer
      |  UNION ALL SELECT '2_merged', count(*) FROM m2
      |  UNION ALL SELECT '3_first_pass_noop', CAST(1 AS BIGINT)
      |  UNION ALL SELECT '4_compaction_ran', CAST(1 AS BIGINT)
      |  UNION ALL SELECT '5_tombstones_left', CAST(0 AS BIGINT)
      |  UNION ALL SELECT '6_lookup_live',
      |    (SELECT count(*) FROM m2 WHERE c_custkey IN KEYS)
      |  UNION ALL SELECT '7_lookup_post',
      |    (SELECT count(*) FROM m2 WHERE c_custkey IN KEYS)
      |  UNION ALL SELECT '8_snapshot', count(*) FROM m2
      |  UNION ALL SELECT '9_second_pass_noop', CAST(1 AS BIGINT)
      |) ORDER BY stage""".stripMargin.replace("KEYS", keysIn)
  }

  private lazy val upsertMergeSql: String =
    """WITH ch AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 1000 ELSE c_acctbal END AS c_acctbal,
        |    CASE WHEN c_custkey % 7 = 0 THEN 'UPDATED' ELSE c_mktsegment END AS c_mktsegment,
        |    CASE WHEN c_custkey % 11 = 3 THEN 'D' ELSE 'U' END AS op
        |  FROM customer WHERE c_custkey % 7 = 0 OR c_custkey % 11 = 3
        |  UNION ALL
        |  SELECT c_custkey + 10000000, 'NEW_' || CAST(c_custkey AS VARCHAR),
        |    c_nationkey, CAST(0.0 AS DOUBLE), c_mktsegment, 'U'
        |  FROM customer WHERE c_custkey % 13 = 1
        |), merged AS (
        |  SELECT
        |    CASE WHEN ch.op IS NOT NULL THEN ch.c_mktsegment ELSE b.c_mktsegment END AS c_mktsegment,
        |    CASE WHEN ch.op IS NOT NULL THEN ch.c_acctbal ELSE b.c_acctbal END AS c_acctbal
        |  FROM customer b FULL OUTER JOIN ch ON b.c_custkey = ch.c_custkey
        |  WHERE ch.op IS NULL OR ch.op <> 'D')
        |SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal_total
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin

  def oracles: Map[String, String] = Map(
    "a1_group_sum" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice),2) AS sum_base_price,
         round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
         round(avg(l_quantity),2) AS avg_qty,
         count(*) AS n
         FROM lineitem GROUP BY 1,2 ORDER BY 1,2""",
    "a19_decimal_money" ->
      """SELECT l_returnflag, count(*) AS n,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS sum_price,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS sum_qty
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    // The bloom prune is result-invisible (no false negatives; false
    // positives die in the semi-join), so the oracle is the exact
    // three-table join the filter accelerates.
    "x98_bloom_prune" ->
      s"""SELECT CAST(l.l_suppkey AS BIGINT) AS l_suppkey,
         count(*) AS n_items,
         CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS sum_price
         FROM lineitem l
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         WHERE n.n_name = '$BloomNation'
         GROUP BY 1 ORDER BY 1""",
    // The sketch is a deterministic set function: the k smallest DISTINCT
    // 60-bit md5 hashes. DuckDB's image is a sort-limit over the distinct
    // hashes of the flat corpus — no sharding, no merge — so the gate
    // proves the engine's shard-and-merge path lands on the identical set.
    // The estimate replays the exact scalar-double expression tree
    // ((k-1) · (2^60 / h_k), floored): IEEE ops are deterministic; only
    // aggregation order is not, and none happens in the estimate.
    "a20_kmv_distinct" -> s"""
         WITH h AS (SELECT DISTINCT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),1,15))::BIGINT AS hv FROM lineitem),
         sk AS (SELECT hv FROM h ORDER BY hv LIMIT $KmvK),
         agg AS (SELECT max(hv) AS kth_hash, count(*) AS n_sketch FROM sk),
         ex AS (SELECT count(DISTINCT l_orderkey) AS exact_distinct,
                       count(DISTINCT l_linenumber) AS n_shards FROM lineitem),
         est AS (SELECT n_shards, n_sketch, kth_hash,
           CASE WHEN n_sketch < $KmvK THEN n_sketch
                ELSE CAST(floor(${KmvK - 1}.0 * (1152921504606846976.0 / CAST(kth_hash AS DOUBLE))) AS BIGINT) END AS est_distinct,
           exact_distinct FROM agg, ex)
         SELECT n_shards, n_sketch, kth_hash, est_distinct, exact_distinct,
           (abs(est_distinct - exact_distinct) * 1000000) // exact_distinct AS err_ppm
         FROM est""",
    // a24: the histogram replay — integer bucketization (length of the
    // binary rendering + shifts, both engines pad-free), ceil-rank
    // selection, and the rank-th smallest micro-value.
    "a24_value_histogram" -> s"""
         WITH vals AS (
           SELECT CAST(floor(value * 1000000) AS BIGINT) AS v FROM events
           WHERE value IS NOT NULL AND value > 0
             AND CAST(floor(value * 1000000) AS BIGINT) > 0),
         n AS (SELECT count(*) AS n FROM vals),
         bk AS (
           SELECT msb, CASE WHEN msb <= 4 THEN v ELSE v >> CAST(msb - 4 AS INT) END AS sub,
                  count(*) AS c
           FROM (SELECT v, CAST(length(bin(v)) AS BIGINT) AS msb FROM vals)
           GROUP BY 1, 2),
         cum AS (
           SELECT msb, sub, CAST(SUM(c) OVER (ORDER BY msb, sub) AS BIGINT) AS cum
           FROM bk),
         rk AS (
           SELECT CAST(p AS BIGINT) AS p, (n * p + 99) // 100 AS rank
           FROM (VALUES (50), (95), (99)) t(p), n),
         sel AS (
           SELECT p, rank, msb, sub FROM (
             SELECT r.p, r.rank, c.msb, c.sub,
               row_number() OVER (PARTITION BY r.p ORDER BY c.msb, c.sub) AS rn
             FROM rk r JOIN cum c ON c.cum >= r.rank)
           WHERE rn = 1),
         ex AS (SELECT v, row_number() OVER (ORDER BY v) AS xr FROM vals)
         SELECT p, rank,
           CASE WHEN msb <= 4 THEN sub ELSE sub << CAST(msb - 4 AS INT) END AS bucket_lo,
           CASE WHEN msb <= 4 THEN sub ELSE ((sub + 1) << CAST(msb - 4 AS INT)) - 1 END AS bucket_hi,
           v AS exact_micro
         FROM sel JOIN ex ON ex.xr = sel.rank
         ORDER BY p""",
    // Grouped sketch: per-day k-smallest via a ranked window over the
    // distinct (day, hash) pairs.
    "a23_daily_distinct" -> s"""
         WITH h AS (SELECT DISTINCT CAST(ts AS DATE) AS day,
                ('0x' || substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS hv
                FROM events WHERE user_id IS NOT NULL),
         rk AS (SELECT day, hv, row_number() OVER (PARTITION BY day ORDER BY hv) AS rn FROM h),
         sk AS (SELECT day, count(*) AS n_sketch, max(hv) AS kth FROM rk
                WHERE rn <= $KmvDailyK GROUP BY day),
         ex AS (SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS exact_users
                FROM events WHERE user_id IS NOT NULL GROUP BY 1)
         SELECT day, n_sketch,
           CASE WHEN n_sketch < $KmvDailyK THEN n_sketch
                ELSE CAST(floor(${KmvDailyK - 1}.0 * (1152921504606846976.0 / CAST(kth AS DOUBLE))) AS BIGINT) END AS est_users,
           exact_users
         FROM sk JOIN ex USING (day) ORDER BY day""",
    // The overlap estimator's relational image: sketch each side, take
    // the k smallest of the union of the two sketches (= the union
    // sketch, losslessly), count the members present in BOTH sketches.
    // The union-membership argument: a union-sketch hash that is in A is
    // necessarily within A's own sketch (fewer than k union hashes sit
    // below it, so fewer than k of A's do) — so sketch membership is
    // set membership here, and both engines count the same j.
    "a22_kmv_overlap" -> s"""
         WITH la AS (SELECT DISTINCT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),1,15))::BIGINT AS hv
                     FROM lineitem WHERE l_returnflag = 'R'),
         lb AS (SELECT DISTINCT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),1,15))::BIGINT AS hv
                FROM lineitem WHERE l_linenumber = 1),
         ska AS (SELECT hv FROM la ORDER BY hv LIMIT $KmvK),
         skb AS (SELECT hv FROM lb ORDER BY hv LIMIT $KmvK),
         u AS (SELECT hv FROM (SELECT hv FROM ska UNION SELECT hv FROM skb)
               ORDER BY hv LIMIT $KmvK),
         sizes AS (SELECT (SELECT count(*) FROM ska) AS n_a,
                          (SELECT count(*) FROM skb) AS n_b,
                          (SELECT count(*) FROM u) AS n_u,
                          (SELECT max(hv) FROM u) AS mx,
                          (SELECT count(*) FROM u
                           WHERE hv IN (SELECT hv FROM ska)
                             AND hv IN (SELECT hv FROM skb)) AS j_common),
         est AS (SELECT n_a, n_b, n_u, j_common,
           CASE WHEN n_u < $KmvK THEN n_u
                ELSE CAST(floor(${KmvK - 1}.0 * (1152921504606846976.0 / CAST(mx AS DOUBLE))) AS BIGINT) END AS est_union
           FROM sizes),
         ex AS (SELECT count(*) AS exact_intersection FROM
                (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R') x
                JOIN (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_linenumber = 1) y
                USING (l_orderkey))
         SELECT n_a, n_b, n_u, j_common,
           (j_common * 1000000) // n_u AS jaccard_ppm,
           (j_common * est_union) // n_u AS est_intersection,
           exact_intersection
         FROM est, ex""",
    // Incremental build must be result-invisible: the oracle sketches the
    // whole corpus from scratch.
    "a21_kmv_incremental" -> s"""
         WITH h AS (SELECT DISTINCT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),1,15))::BIGINT AS hv FROM lineitem),
         sk AS (SELECT hv FROM h ORDER BY hv LIMIT $KmvK),
         agg AS (SELECT max(hv) AS kth_hash, count(*) AS n_sketch FROM sk),
         ex AS (SELECT count(DISTINCT l_orderkey) AS exact_distinct FROM lineitem)
         SELECT n_sketch, kth_hash,
           CASE WHEN n_sketch < $KmvK THEN n_sketch
                ELSE CAST(floor(${KmvK - 1}.0 * (1152921504606846976.0 / CAST(kth_hash AS DOUBLE))) AS BIGINT) END AS est_distinct,
           exact_distinct
         FROM agg, ex""",
    "a3_cycle_breakdown" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS cycle,
         round(sum(o_totalprice),2) AS total, count(*) AS n
         FROM orders GROUP BY 1 ORDER BY 1""",
    "a4_conditional_pivot" ->
      """SELECT user_id, CAST(ts AS DATE) AS day,
         round(sum(CASE WHEN lower(event_type) LIKE '%purchase%' OR lower(event_type) LIKE '%signup%' THEN value ELSE 0 END),2) AS conversion_total,
         round(sum(CASE WHEN NOT (lower(event_type) LIKE '%purchase%' OR lower(event_type) LIKE '%signup%') AND (lower(event_type) LIKE '%click%' OR lower(event_type) LIKE '%view%') THEN value ELSE 0 END),2) AS engagement_total
         FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL AND value > 0
         GROUP BY 1,2
         HAVING conversion_total > 0 OR engagement_total > 0
         ORDER BY 1,2""",
    "d1_amount_bins" ->
      """SELECT CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN NULL
                WHEN o_totalprice <= 10000 THEN 'Small (<$10K)'
                WHEN o_totalprice <= 100000 THEN 'Medium ($10K-$100K)'
                WHEN o_totalprice <= 500000 THEN 'Large ($100K-$500K)'
                ELSE 'Very Large (>$500K)' END AS amount_category,
         count(*) AS n FROM orders GROUP BY 1
         ORDER BY n DESC, amount_category NULLS FIRST""",
    "d2_company_type" ->
      """SELECT CASE WHEN c_mktsegment IN ('AUTOMOBILE','MACHINERY') THEN 'Tech' ELSE 'Other' END AS company_type,
         count(*) AS n, round(sum(c_acctbal),2) AS total_acctbal
         FROM customer GROUP BY 1 ORDER BY 1""",
    "d4_composite_key" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
         concat_ws('_', n_name, n_nationkey) AS composite_key,
         sha256(concat_ws('§', n_name, n_nationkey)) AS det_id
         FROM nation ORDER BY 1""",
    "d3_party_pivot" ->
      s"""WITH $partyPivotSql
         |SELECT ticker, cycle, democrat_total, republican_total
         |FROM agg ORDER BY 1,2""".stripMargin,
    "a11_percentiles" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
        |  round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price,
        |  count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "a12_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "a15_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "a13_group_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) AS qty_stddev,
        |  round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "a7_distinct_values" ->
      "SELECT DISTINCT o_orderpriority FROM orders ORDER BY 1",
    "a8_global_stats" ->
      """SELECT count(*) AS n_rows, count(DISTINCT o_custkey) AS n_custs,
         round(sum(o_totalprice),2) AS total, round(avg(o_totalprice),2) AS avg_price
         FROM orders""",
    "a10_reconcile" ->
      """SELECT COALESCE(i.nationkey, e.nationkey) AS nationkey,
         COALESCE(i.n,0) AS incoming_n, COALESCE(e.n,0) AS existing_n,
         COALESCE(i.n,0)+COALESCE(e.n,0) AS projected_total,
         COALESCE(e.n,0) >= COALESCE(i.n,0) AS possible_duplicates
         FROM (SELECT CAST(c_nationkey AS BIGINT) AS nationkey, count(*) AS n FROM customer GROUP BY 1) i
         FULL OUTER JOIN (SELECT CAST(s_nationkey AS BIGINT) AS nationkey, count(*) AS n FROM supplier GROUP BY 1) e
         ON i.nationkey = e.nationkey
         ORDER BY 1""",
    "t1_topk_rows" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 5",
    "t2_topk_groups" ->
      """SELECT l_suppkey, round(sum(l_extendedprice),2) AS total
         FROM lineitem GROUP BY 1 ORDER BY total DESC, l_suppkey LIMIT 10""",
    "x38_native_topk" ->
      """WITH ranked AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_orderpriority, o_orderkey, o_totalprice FROM ranked
        |WHERE rn <= 3
        |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin,
    "j1_lookup_join" ->
      """SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal),2) AS total_acctbal
         FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         GROUP BY 1 ORDER BY 1""",
    "j2_dedup_keepfirst" ->
      """SELECT count(*) AS n_survivors, round(sum(l_quantity),2) AS qty FROM (
           SELECT l_quantity, row_number() OVER (
             PARTITION BY l_partkey, l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
           FROM lineitem) WHERE rn = 1""",
    "j2_anti_join" ->
      """SELECT c_custkey FROM customer WHERE NOT EXISTS (
           SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY 1""",
    "j3_asof_join" ->
      """WITH u AS (
        |  SELECT o_custkey AS key, o_orderdate AS t, 0 AS is_left,
        |    o_orderkey AS tie, o_orderpriority, o_totalprice
        |  FROM orders
        |  UNION ALL
        |  SELECT user_id, ts, 1, NULL, NULL, NULL FROM events),
        |c AS (
        |  SELECT *,
        |    last_value(o_orderpriority IGNORE NULLS) OVER (
        |      PARTITION BY key ORDER BY t, is_left, tie
        |      ROWS UNBOUNDED PRECEDING) AS pri,
        |    last_value(o_totalprice IGNORE NULLS) OVER (
        |      PARTITION BY key ORDER BY t, is_left, tie
        |      ROWS UNBOUNDED PRECEDING) AS price
        |  FROM u)
        |SELECT pri AS o_orderpriority, count(*) AS n_events,
        |  round(sum(price), 2) AS matched_total
        |FROM c WHERE is_left = 1 GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    "j4_range_join" ->
      """SELECT count(*) AS n_pairs, count(DISTINCT a.o_custkey) AS n_customers
        |FROM orders a JOIN orders b
        |  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
        | AND abs(epoch(a.o_orderdate) - epoch(b.o_orderdate)) <= 2592000""".stripMargin,
    "j7_salted_join" ->
      """SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j8_bloom_join" ->
      """SELECT CAST(month(o_orderdate) AS INT) AS o_month, count(*) AS n,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1997
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // j10/j11 serve the IDENTICAL merged state through the merge-on-read
    // layout (tombstone fold / compacted fold) — the storage strategy is
    // result-invisible, so both share j5's oracle verbatim (the x73/x75
    // pattern applied to the table tier).
    "j5_upsert_merge" -> upsertMergeSql,
    "j10_mor_merge" -> upsertMergeSql,
    "j11_mor_compact" -> upsertMergeSql,
    "j12_mor_evolve" -> morEvolveSql,
    // j14: the export-side evolution answers j12's oracle verbatim —
    // the bridge claim at the schema boundary.
    "j14_delta_evolve" -> morEvolveSql,
    // j15: each CDF class rebuilt from the changeset arithmetic —
    // pre-images/deletes fold ORIGINAL balances (tier null → 0), post-
    // images the +1000 updates, inserts the zero-balance new keys.
    "j15_delta_cdf" ->
      """SELECT 'delete' AS _change_type, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(c_acctbal), 2) AS bal_total, CAST(0 AS BIGINT) AS n_tiered
        |FROM customer WHERE c_custkey % 11 = 3
        |UNION ALL
        |SELECT 'insert', CAST(count(*) AS BIGINT),
        |  round(sum(CAST(0.0 AS DOUBLE)), 2), CAST(count(*) AS BIGINT)
        |FROM customer WHERE c_custkey % 13 = 1
        |UNION ALL
        |SELECT 'update_postimage', CAST(count(*) AS BIGINT),
        |  round(sum(c_acctbal + 1000), 2), CAST(count(*) AS BIGINT)
        |FROM customer WHERE c_custkey % 7 = 0 AND c_custkey % 11 <> 3
        |UNION ALL
        |SELECT 'update_preimage', CAST(count(*) AS BIGINT),
        |  round(sum(c_acctbal), 2), CAST(0 AS BIGINT)
        |FROM customer WHERE c_custkey % 7 = 0 AND c_custkey % 11 <> 3
        |ORDER BY 1""".stripMargin,
    "j13_mor_evolve_compact" -> morEvolveSql,
    "pl18_table_maintenance" -> tableMaintenanceSql,
    // pl20: publish ∘ merge = merge ∘ publish — the external snapshots
    // replay as the eager double merge with segments carried through
    // both changesets; the exact-equality stage equals the latest count
    // by the bridge claim itself.
    "pl20_lakehouse_publish" ->
      """WITH ch1 AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 1000 ELSE c_acctbal END AS c_acctbal,
        |    CASE WHEN c_custkey % 7 = 0 THEN 'UPDATED' ELSE c_mktsegment END AS c_mktsegment,
        |    CASE WHEN c_custkey % 11 = 3 THEN 'D' ELSE 'U' END AS op
        |  FROM customer WHERE c_custkey % 7 = 0 OR c_custkey % 11 = 3
        |  UNION ALL
        |  SELECT c_custkey + 10000000, 'NEW_' || CAST(c_custkey AS VARCHAR),
        |    c_nationkey, CAST(0.0 AS DOUBLE), c_mktsegment, 'U'
        |  FROM customer WHERE c_custkey % 13 = 1
        |), m1 AS MATERIALIZED (
        |  SELECT coalesce(ch.c_custkey, b.c_custkey) AS c_custkey,
        |    CASE WHEN ch.op IS NOT NULL THEN ch.c_mktsegment
        |         ELSE b.c_mktsegment END AS c_mktsegment
        |  FROM customer b FULL OUTER JOIN ch1 ch ON b.c_custkey = ch.c_custkey
        |  WHERE ch.op IS NULL OR ch.op <> 'D'
        |), ch2 AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 9 = 2 THEN 'PHASE2' ELSE c_mktsegment END AS c_mktsegment,
        |    CASE WHEN c_custkey % 17 = 5 THEN 'D' ELSE 'U' END AS op
        |  FROM customer WHERE c_custkey % 9 = 2 OR c_custkey % 17 = 5
        |), m2 AS MATERIALIZED (
        |  SELECT coalesce(ch.c_custkey, b.c_custkey) AS c_custkey,
        |    CASE WHEN ch.op IS NOT NULL THEN ch.c_mktsegment
        |         ELSE b.c_mktsegment END AS c_mktsegment
        |  FROM m1 b FULL OUTER JOIN ch2 ch ON b.c_custkey = ch.c_custkey
        |  WHERE ch.op IS NULL OR ch.op <> 'D')
        |SELECT stage, n FROM (
        |  SELECT '1_base_published' AS stage, count(*) AS n FROM customer
        |  UNION ALL SELECT '2_v1_rows', count(*) FROM m1
        |  UNION ALL SELECT '3_latest_rows', count(*) FROM m2
        |  UNION ALL SELECT '4_new_keys_live', count(*) FROM m2
        |    WHERE c_custkey > 10000000
        |  UNION ALL SELECT '5_updated_latest', count(*) FROM m2
        |    WHERE c_mktsegment = 'UPDATED'
        |  UNION ALL SELECT '6_phase2_latest', count(*) FROM m2
        |    WHERE c_mktsegment = 'PHASE2'
        |  UNION ALL SELECT '7_exact_match_mor', count(*) FROM m2
        |  UNION ALL SELECT '8_replay_noop', CAST(1 AS BIGINT)
        |) ORDER BY stage""".stripMargin,
    // pl23: every stage count rebuilt from the two changesets' modular
    // arithmetic; v3's classes are judged against the POST-ch1 state
    // (deleted %11=3 keys re-insert under %9=2, vanish silently under
    // %17=5).
    "pl23_delta_maintenance" ->
      """WITH m1 AS MATERIALIZED (
        |  SELECT c_custkey FROM customer WHERE c_custkey % 11 <> 3
        |  UNION ALL
        |  SELECT c_custkey + 10000000 FROM customer WHERE c_custkey % 13 = 1
        |), m2 AS MATERIALIZED (
        |  SELECT c_custkey FROM m1
        |  WHERE NOT (c_custkey <= 10000000 AND c_custkey % 17 = 5)
        |  UNION ALL
        |  SELECT c_custkey FROM customer
        |  WHERE c_custkey % 9 = 2 AND c_custkey % 17 <> 5 AND c_custkey % 11 = 3)
        |SELECT stage, n FROM (
        |  SELECT '1_latest_rows' AS stage, count(*) AS n FROM m2
        |  UNION ALL SELECT '2_optimize_invisible', count(*) FROM m1
        |  UNION ALL SELECT '3_feed_v1_inserts', count(*) FROM customer
        |    WHERE c_custkey % 13 = 1
        |  UNION ALL SELECT '4_feed_v1_updates', count(*) FROM customer
        |    WHERE c_custkey % 7 = 0 AND c_custkey % 11 <> 3
        |  UNION ALL SELECT '5_feed_v1_deletes', count(*) FROM customer
        |    WHERE c_custkey % 11 = 3
        |  UNION ALL SELECT '6_feed_optimize', CAST(0 AS BIGINT)
        |  UNION ALL SELECT '7_feed_v3_inserts', count(*) FROM customer
        |    WHERE c_custkey % 9 = 2 AND c_custkey % 17 <> 5 AND c_custkey % 11 = 3
        |  UNION ALL SELECT '8_feed_v3_updates', count(*) FROM customer
        |    WHERE c_custkey % 9 = 2 AND c_custkey % 17 <> 5 AND c_custkey % 11 <> 3
        |  UNION ALL SELECT '9_feed_v3_deletes', count(*) FROM customer
        |    WHERE c_custkey % 17 = 5 AND c_custkey % 11 <> 3
        |  UNION ALL SELECT 'a_pre_eq_post', CAST(1 AS BIGINT)
        |  UNION ALL SELECT 'b_txn_bookmark', CAST(1 AS BIGINT)
        |  UNION ALL SELECT 'c_replay_noops', CAST(2 AS BIGINT)
        |) ORDER BY stage""".stripMargin,
    "j9_snapshot_diff" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |    sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f0,
        |    sha256(regexp_replace(lower(trim(
        |      CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END)),
        |      '\s+', ' ', 'g')) AS f1
        |  FROM documents),
        |old AS (SELECT doc_id, f0 AS f FROM fp WHERE doc_id % 7 <> 3),
        |new AS (SELECT doc_id, f1 AS f FROM fp WHERE doc_id % 7 <> 0),
        |d AS (
        |  SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
        |    CASE WHEN old.doc_id IS NULL THEN 'added'
        |         WHEN new.doc_id IS NULL THEN 'removed'
        |         WHEN old.f IS NOT DISTINCT FROM new.f THEN 'unchanged'
        |         ELSE 'changed' END AS status
        |  FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id)
        |SELECT status, count(*) AS n_docs,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "j6_scd2" ->
      """WITH hist AS (
        |  SELECT o_orderpriority,
        |    o_orderdate AS valid_from,
        |    lead(o_orderdate) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS valid_to
        |  FROM orders)
        |SELECT o_orderpriority, count(*) AS n_versions,
        |  CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_current,
        |  CAST(sum(CASE WHEN valid_to IS NULL THEN 0
        |    ELSE date_diff('day', valid_from, valid_to) END) AS BIGINT) AS closed_days
        |FROM hist GROUP BY 1 ORDER BY 1""".stripMargin,
    "u2_unpivot" ->
      """WITH long AS (
        |  SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT metric, count(*) AS n, round(sum(value), 2) AS value_total
        |FROM long GROUP BY 1 ORDER BY 1""".stripMargin,
    "a18_group_mode" ->
      """WITH counts AS (
        |  SELECT c_mktsegment, c_nationkey, count(*) AS cnt
        |  FROM customer GROUP BY 1, 2),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY c_mktsegment
        |    ORDER BY cnt DESC, c_nationkey ASC) AS rn
        |  FROM counts)
        |SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS mode_nation,
        |  cnt AS n
        |FROM ranked WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin,
    "a16_incremental_agg" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "a17_quality_checks" ->
      """SELECT * FROM (
        |  SELECT 'not_null(c_name)' AS rule,
        |    CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violations FROM customer
        |  UNION ALL
        |  SELECT 'in_range(c_acctbal)',
        |    CAST(sum(CASE WHEN c_acctbal IS NOT NULL
        |      AND NOT (c_acctbal >= 0 AND c_acctbal <= 5000)
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM customer
        |  UNION ALL
        |  SELECT 'matches(c_mktsegment)',
        |    CAST(sum(CASE WHEN c_mktsegment IS NOT NULL
        |      AND NOT regexp_matches(c_mktsegment, '^(AUTOMOBILE|BUILDING)$')
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM customer
        |  UNION ALL
        |  SELECT 'unique_key(c_custkey)',
        |    count(*) - count(DISTINCT c_custkey) FROM customer
        |  UNION ALL
        |  SELECT 'ref_integrity(c_nationkey->n_nationkey)',
        |    CAST(count(*) AS BIGINT) FROM customer
        |  WHERE c_nationkey IS NOT NULL
        |    AND c_nationkey NOT IN (SELECT n_nationkey FROM nation)
        |) ORDER BY rule""".stripMargin,
    "a14_profile" -> OrdersProfileCols.map(c =>
      s"""SELECT '$c' AS "column", count(*) AS n_rows, count($c) AS n_nonnull,
         |    count(DISTINCT $c) AS n_distinct,
         |    CAST(min($c) AS VARCHAR) AS min_value,
         |    CAST(max($c) AS VARCHAR) AS max_value
         |  FROM orders""".stripMargin)
      .mkString("SELECT * FROM (\n", "\n  UNION ALL\n", "\n) ORDER BY \"column\""),
    "p3_clean_normalize" ->
      """SELECT c_custkey, trim(c_name) AS c_name, lower(c_mktsegment) AS segment,
         COALESCE(CAST(c_acctbal AS DOUBLE), 0) AS acctbal
         FROM customer ORDER BY 1""",
    "u1_set_ops" ->
      """SELECT
        | (SELECT count(*) FROM (
        |    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |    UNION
        |    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)) AS n_union,
        | (SELECT count(*) FROM (
        |    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |    INTERSECT
        |    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)) AS n_intersect,
        | (SELECT count(*) FROM (
        |    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |    EXCEPT
        |    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)) AS n_except""".stripMargin,
    "p2_normalize_dropnull" ->
      """SELECT trim(c_mktsegment) AS market_segment, count(*) AS n,
         CAST(sum(c_custkey) AS BIGINT) AS key_sum,
         CAST(max(length(trim(c_name))) AS BIGINT) AS max_name_len
         FROM customer GROUP BY 1 ORDER BY 1""",
    "p5_name_coercion" ->
      """SELECT CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS record_id,
         CAST(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS order_date,
         COALESCE(CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE), 0) AS total_value
         FROM orders ORDER BY 1""",
    "p6_datetime_coercion" ->
      """SELECT CAST(COALESCE(year(try_cast(raw AS TIMESTAMP)), -1) AS BIGINT) AS yr, count(*) AS n
         FROM (SELECT CASE WHEN o_orderkey % 7 = 0 THEN 'not-a-date'
                      ELSE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') END AS raw
               FROM orders)
         GROUP BY 1 ORDER BY 1""",
    "p8_null_fill" ->
      """SELECT COALESCE(CASE WHEN c_mktsegment = 'BUILDING' THEN NULL ELSE c_mktsegment END, '') AS seg,
         count(*) AS n,
         round(sum(COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0)),2) AS bal_total
         FROM customer GROUP BY 1 ORDER BY 1""",
    "p9_metadata" ->
      s"""SELECT r_regionkey, r_name, TIMESTAMP '$MetadataClock' AS processed_date,
         |  'csv' AS data_source, 'region' AS record_type
         |FROM region ORDER BY 1""".stripMargin,
    "p11_iso8601" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS iso
         FROM orders ORDER BY 1""",
    "p14_pushdown_filter" ->
      """SELECT l_returnflag, count(*) AS n,
         round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_discount > 0.05
         GROUP BY 1 ORDER BY 1""",
    "p18_json_extract" ->
      """SELECT event_type, CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
         count(*) AS n FROM events GROUP BY 1 ORDER BY 1""",
    "join_q18_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING round(sum(l_quantity), 2) > 150)
        |SELECT c_name, o_orderkey, o_totalprice, total_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey LIMIT 10""".stripMargin,
    "join_q10_returns" ->
      """SELECT c_custkey, c_name, n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-10-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_returnflag = 'R'
        |GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "join_q3_revenue" ->
      """SELECT l_orderkey, o_orderdate,
         round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY 1,2 ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "join_q5_nation_revenue" ->
      """SELECT n_name, round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1 ORDER BY revenue DESC, n_name"""
  )
}
