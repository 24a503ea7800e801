package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark lacks as primitives, composed scale-first from
  * built-ins (engine extension; the reference has only J1/J2):
  * as-of joins via union + keyed carry-forward, and bounded range joins
  * via time-bucket banding. Both avoid the naive inequality-join plan
  * (broadcast nested loop, O(n·m)) — their only shuffles are on join keys.
  */
object Joins {

  /** As-of join: for every left row, attach `carryCols` from the LATEST
    * right row with the same key and `rightTs <= leftTs` (ties broken by
    * `rightTieBreak`, making the result total-order deterministic).
    *
    * Plan shape: tag + union both sides, one shuffle+sort per key, then a
    * running `last(..., ignoreNulls)` carry-forward — the canonical
    * distributed as-of (no per-row lookups, no range join). Right rows at
    * exactly leftTs sort before left rows, so "<=" semantics hold.
    * Left rows with no preceding right row carry nulls. */
  def asofJoin(left: DataFrame, leftKey: Column, leftTs: Column,
               right: DataFrame, rightKey: Column, rightTs: Column,
               rightTieBreak: Column, carryCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val reserved = Seq("__key", "__t", "__isLeft", "__tie")
    require(leftCols.intersect(carryCols).isEmpty,
      s"carryCols ${leftCols.intersect(carryCols).mkString(",")} collide with left columns " +
        "— rename one side before the as-of join")
    require(leftCols.intersect(reserved).isEmpty && carryCols.intersect(reserved).isEmpty,
      s"column names ${reserved.mkString(",")} are reserved by asofJoin")
    val l = left.select(
      (leftKey.as("__key") +: leftTs.as("__t") +: lit(1).as("__isLeft") +:
        lit(null).cast("long").as("__tie") +:
        leftCols.map(col).toIndexedSeq) ++
        carryCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      (rightKey.as("__key") +: rightTs.as("__t") +: lit(0).as("__isLeft") +:
        rightTieBreak.cast("long").as("__tie") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)).toIndexedSeq) ++
        carryCols.map(col): _*)
    val w = Window.partitionBy("__key")
      .orderBy(col("__t"), col("__isLeft"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = carryCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__isLeft") === 1)
      .drop("__key", "__t", "__isLeft", "__tie")
  }

  /** Bounded-range self-pairs: all (a, b) pairs with equal `keyCol`,
    * `a.idCol < b.idCol`, and |a.ts − b.ts| ≤ radius (seconds).
    *
    * Plan shape: band each row into a radius-wide time bucket; one side
    * additionally explodes into its adjacent buckets, so every qualifying
    * pair meets in exactly one (key, bucket) — an equi hash join — and the
    * exact radius predicate filters band false-positives. Work is bounded
    * by band occupancy, never O(n²) across the table. */
  def rangeSelfPairs(df: DataFrame, keyCol: String, tsCol: String,
                     idCol: String, radiusSec: Long): DataFrame = {
    val bucket = floor(unix_timestamp(col(tsCol)) / radiusSec)
    val a = df.select(col(keyCol).as("key"), col(idCol).as("id_a"),
      col(tsCol).as("ts_a"), bucket.as("bucket"))
    val b = df.select(col(keyCol).as("key"), col(idCol).as("id_b"),
        col(tsCol).as("ts_b"),
        explode(array(bucket - 1, bucket, bucket + 1)).as("bucket"))
    // Each qualifying pair meets in exactly one (key, bucket): a's bucket
    // is fixed and b's three exploded buckets are distinct — no dedup pass.
    a.join(b, Seq("key", "bucket"))
      .filter(col("id_a") < col("id_b") &&
        abs(unix_timestamp(col("ts_a")) - unix_timestamp(col("ts_b"))) <= radiusSec)
      .select("key", "id_a", "id_b")
  }

  /** Skew-safe replicated equi-join: when a fact table's hot join keys
    * would overwhelm single reducers and the dimension is too big to
    * broadcast (AQE's broadcast fallback) yet small enough to replicate,
    * salt each fact row deterministically (hash(`saltSrc`) mod `salts`)
    * and explode the dimension across ALL salt values — every (key, salt)
    * bucket is then ~1/salts of the hot key's rows, joined locally.
    * Result-identical to `fact.join(dim, key)`: each fact row meets its
    * dimension row in exactly one (key, salt) bucket. Cost: dimension
    * shuffle volume ×`salts` — the explicit knob AQE's skew-join split
    * automates; this operator is for engines/plans where the dimension
    * re-use makes the replication worth pinning statically. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltSrc: Column, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require((fact.columns ++ dim.columns).forall(_ != "__salt"),
      "column name __salt is reserved by saltedJoin")
    val f = fact.withColumn("__salt",
      (Curation.idHash(saltSrc) % salts).cast("int"))
    val d = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }

  /** Bloom-prefiltered inner equi-join: probe a compact sketch of
    * `small`'s keys on the `big` side BEFORE its shuffle exchange, so
    * non-joining big-side rows never pay shuffle IO; the exact join then
    * drops the sketch's false positives, making the result identical to
    * `big.join(small, Seq(key))` at every `fpp`.
    *
    * This is the semi-join-reduction move Spark's runtime bloom filter
    * (InjectRuntimeFilter) applies automatically when creation and probe
    * side are one optimized plan; the explicit form is for the 100 TB
    * pipeline shape where the small side was computed in an earlier stage
    * (persisted, checkpointed, or read back from a sink) and the planner
    * cannot see through it. Cost model: one extra pass over `small` to
    * build the sketch (map-side partial merge, driver holds only the
    * ~`-expectedItems·log(fpp)` bit array) against shuffle bytes saved on
    * `big` — wins whenever the join is selective on the big side. The
    * sketch ships with the task binary; at GB-scale filters switch to an
    * explicit broadcast variable instead.
    *
    * Both sides are hashed with XXH64 before put/probe, so any key type
    * works and put/probe agree by construction.
    */
  def bloomPrefilteredJoin(big: DataFrame, small: DataFrame, key: String,
                           expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val bf = small.stat.bloomFilter(xxhash64(col(key)), expectedItems, fpp)
    val bytes = {
      val os = new java.io.ByteArrayOutputStream()
      bf.writeTo(os)
      os.toByteArray
    }
    val mightContain = ColumnBridge.column(graft.functions.BloomMightContain(
      ColumnBridge.expression(xxhash64(col(key))), bytes))
    big.filter(mightContain).join(small, Seq(key))
  }
}
