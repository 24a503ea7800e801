package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-filter operators over the [[graft.functions.BloomSketch]]
  * aggregate: explicit, storable runtime filters (engine extension —
  * SURVEY.md §7.5(8)).
  *
  * Two deployment shapes, both composed so the final result is EXACT
  * (invariant to the filter's false-positive rate — the property that
  * makes every consumer oracle-checkable):
  *
  *  - JOIN PRUNING: fold the build side's join keys into one
  *    array<long> row, broadcast it, and filter the probe side ahead of
  *    the exact join. At 100 TB this is the difference between shuffling
  *    the full probe table and shuffling only the ~matching slice —
  *    Spark's AQE injects the same shape automatically for some plans
  *    (`spark.sql.optimizer.runtime.bloomFilter.enabled`), but only
  *    within one query; this form persists and composes (see below).
  *  - ADMISSION SCREENING: the filter is a STORED artifact over the
  *    seen-fingerprint history. Arrivals that MISS are definitely new and
  *    admit with no join at all; only the HIT slice (true dupes + false
  *    positives) pays the exact confirm join against the history. The
  *    filter then absorbs the admitted batch via [[orWords]] — O(filter
  *    size), never re-reading history.
  *
  * The read path ([[mightContain]]) is composed ENTIRELY from codegen'd
  * builtins (element_at / bitwise ops / constant shifts) — no UDF, no
  * custom expression, stays inside whole-stage codegen; the probe scheme
  * is shared bit-for-bit with the aggregate's Scala writer (see
  * [[graft.functions.BloomSketch]] scaladoc). All SQL-side arithmetic is
  * masked before any multiply, so ANSI mode cannot overflow. */
object Bloom {

  /** Aggregate: fold a long hash column into an nBits Bloom filter
    * (array of nBits/64 words). Any deterministic long hash works — the
    * filter never needs oracle replay (consumers are FP-invariant), so
    * callers use the codegen'd builtin `xxhash64` rather than the
    * md5-based oracle-replayable hash. */
  def sketch(hash: Column, nBits: Int, numProbes: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.BloomSketch(
      ColumnBridge.expression(hash), nBits, numProbes).toAggregateExpression())
  }

  /** Single-bit masks 1L<<0 .. 1L<<63 as a literal array — the dynamic
    * bit test `word & (1 << (pos & 63))` without a dynamic-shift builtin
    * (the Scala DSL's shift helpers take constant shift amounts only). */
  private def bitMasks: Column = array((0 until 64).map(i => lit(1L << i)): _*)

  /** True iff `hash` MIGHT be in the filter; false means definitely not.
    * Probe scheme must match the aggregate: base/step double hashing on
    * the masked hash, `step` forced odd so probes cycle the power-of-two
    * bit space. */
  def mightContain(words: Column, hash: Column, nBits: Int, numProbes: Int): Column = {
    require(nBits >= 64 && (nBits & (nBits - 1)) == 0,
      s"nBits must be a power of two >= 64, got $nBits")
    require(numProbes > 0, s"numProbes must be positive, got $numProbes")
    mightContainDyn(words, hash, lit(nBits), numProbes)
  }

  /** [[mightContain]] with the geometry as a COLUMN — the probe form the
    * sharded frame needs, where each shard row carries its own `n_bits`
    * (shards rotate independently, so geometries diverge). Same probe
    * scheme; the mask is computed per row instead of folded at plan time
    * (still all codegen'd builtins — when `nBits` is a literal, constant
    * folding collapses it to the static form's plan). `nBits` values must
    * individually satisfy the power-of-two contract; that is enforced at
    * filter BUILD time ([[sketch]]'s require), and geometry travels with
    * the stored artifact, so a probe can only ever see built values. */
  def mightContainDyn(words: Column, hash: Column, nBits: Column,
                      numProbes: Int): Column = {
    require(numProbes > 0, s"numProbes must be positive, got $numProbes")
    val m = nBits.cast("long") - lit(1L)
    val base = hash.bitwiseAND(m)
    val step = shiftrightunsigned(hash, 20).bitwiseAND(m).bitwiseOR(lit(1L))
    (0 until numProbes).map { i =>
      val pos = (base + lit(i.toLong) * step).bitwiseAND(m)
      val word = element_at(words, shiftrightunsigned(pos, 6).cast("int") + 1)
      val mask = element_at(bitMasks, pos.bitwiseAND(lit(63L)).cast("int") + 1)
      word.bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)
  }

  /** Lossless filter merge: filter(A ∪ B) = filter(A) | filter(B),
    * word-wise — the stored-artifact append is this one builtin
    * expression over two array<long> columns. */
  def orWords(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x.bitwiseOR(y))

  /** Prune `probe` rows ahead of an exact join: broadcast the one-row
    * filter frame and keep rows whose key hash might be in it. The
    * caller MUST follow with the exact join — the pruned frame still
    * contains the filter's false positives.
    *
    * CAVEAT (plan order): when the follow-up exact join is a SHUFFLE
    * join, `PushDownLeftSemiAntiJoin` hoists the semi/anti join BELOW
    * this cross join (its condition references only probe-side columns),
    * so the full probe side reaches the exchange and the filter runs
    * after — exactly the plan the prune exists to avoid. Use
    * [[pruneInline]] ahead of shuffle joins; this lazy form is for
    * pipelines whose confirm step cannot be reordered below it (e.g.
    * [[admit]], whose confirm join hangs off a column the cross join
    * produces). */
  def prune(probe: DataFrame, probeHash: Column, bloomDf: DataFrame,
            wordsCol: String, nBits: Int, numProbes: Int): DataFrame =
    probe.crossJoin(broadcast(bloomDf))
      .filter(mightContain(col(wordsCol), probeHash, nBits, numProbes))
      .drop(wordsCol)

  /** Prune with the filter words as ONE array literal (a single
    * `Literal` node holding nBits/64 longs — not a per-element
    * expression tree, so no codegen blow-up). The filter becomes an
    * ordinary probe-side predicate that sits directly over the scan,
    * BELOW any later exchange — the shape join reordering cannot undo,
    * and the right one ahead of a shuffle join. Fetching the words is
    * one driver-side row of nBits/8 bytes.
    *
    * GEOMETRY CEILING (measured): [[mightContain]] references its words
    * argument once per probe, so the literal lands numProbes times in
    * the predicate tree, and Catalyst's per-rule tree processing pays
    * for the array value far above its byte size — a 16K-long literal
    * (1 Mi-bit filter, 4 probes) measured ~3 s of driver-side plan work
    * PER RUN (pl14, round 15). Keep this form under ~1–2K words
    * (≤ 128 Ki-bit filters); above that, ship the words as DATA — a
    * one-row local-relation broadcast cross join (the [[admit]] shape),
    * which carries the array in an InternalRow the tree rules never
    * traverse. */
  def pruneInline(probe: DataFrame, probeHash: Column, words: Array[Long],
                  nBits: Int, numProbes: Int): DataFrame =
    probe.filter(mightContain(typedlit(words), probeHash, nBits, numProbes))

  /** Store / rehydrate the one-row filter frame (words plus geometry, so
    * a reader cannot probe a filter with the wrong scheme). */
  def write(bloomDf: DataFrame, wordsCol: String, nBits: Int, numProbes: Int,
            path: String): Unit =
    bloomDf.select(col(wordsCol).as("words"),
        lit(nBits).as("n_bits"), lit(numProbes).as("n_probes"))
      .coalesce(1).write.mode("overwrite").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Admission screen: split `arrivals` on the stored filter, admit the
    * definite-new slice join-free, confirm the maybe-seen slice against
    * `history` exactly (anti-join on `fpCol`), and return every admitted
    * row. Result == arrivals ANTI-JOIN history regardless of FP rate —
    * the filter only decides how many rows pay the confirm join. */
  def admit(arrivals: DataFrame, history: DataFrame, fpCol: String,
            bloomDf: DataFrame, nBits: Int, numProbes: Int): DataFrame = {
    val screened = arrivals.crossJoin(broadcast(bloomDf.select(col("words"))))
      .withColumn("__maybe",
        mightContain(col("words"), xxhash64(col(fpCol)), nBits, numProbes))
      .drop("words")
    admitScreened(screened, history, fpCol)
  }

  /** The confirm half of every admission screen — ONE definition shared
    * by [[admit]], [[admitSharded]] and the lifecycle gates (pl14/x110):
    * given a frame carrying the screen's `__maybe` flag, admit the
    * definite-new slice join-free and confirm the maybe-seen slice
    * against `history` exactly (anti-join on `fpCol`); the flag is
    * dropped. Result == input ANTI-JOIN history at any FP rate. */
  def admitScreened(screened: DataFrame, history: DataFrame,
                    fpCol: String): DataFrame = {
    val definiteNew = screened.filter(!col("__maybe")).drop("__maybe")
    val confirmed = screened.filter(col("__maybe")).drop("__maybe")
      .join(history.select(col(fpCol)).distinct(), Seq(fpCol), "left_anti")
    definiteNew.unionByName(confirmed)
  }

  // ------------------------------------------------------- sharded filter

  /** SHARDED filter frame — the scale form of the stored admission filter
    * (round-15 verdict #1: a single one-row filter is hard-capped at 2^30
    * bits ≈ 130 M members at 4 probes; 100 TB of documents is 10⁹–10¹²
    * fingerprints). The fingerprint space is partitioned by hash bits the
    * probe scheme never reads: shard = (h >>> 50) & (nShards−1). The
    * frame holds exactly `nShards` rows
    *   (shard, words, n_bits, n_probes, n_shards)
    * with PER-SHARD geometry (`n_bits` is a row value, not a frame
    * constant), so shards rotate independently and total capacity is
    * nShards · 2^30 bits — 2^40 at the 1024-shard ceiling, ~10¹¹ members
    * at ≤50% fill. Probing routes each row to its shard's frame row via a
    * broadcast hash join (nShards tiny rows), the dynamic-geometry
    * [[mightContainDyn]] tests membership, and the driver only ever
    * touches per-shard SCALARS (fill ppm, member counts) — never a words
    * array: popcounts run distributedly via [[shardFill]].
    *
    * Routing bits 50..59 are disjoint from the probe scheme's base (bits
    * 0..29 at the 2^30/shard ceiling) and step (bits 20..49) windows, and
    * exist in both engine hash families (the 60-bit oracle-replayable
    * [[graft.functions.Md5Hash60]] and 64-bit `xxhash64`) — hence the
    * 1024-shard ceiling (10 routing bits under the 60-bit hash). */
  val ShardShift = 50

  /** Largest supported shard count: 10 routing bits (see [[ShardShift]]). */
  val MaxShards = 1024

  private def requireShards(nShards: Int): Unit =
    require(nShards >= 1 && nShards <= MaxShards &&
        (nShards & (nShards - 1)) == 0,
      s"nShards must be a power of two in [1, $MaxShards], got $nShards")

  /** Shard id of a hash: top routing bits, masked to the shard count. */
  def shardOf(hash: Column, nShards: Int): Column = {
    requireShards(nShards)
    shiftrightunsigned(hash, ShardShift)
      .bitwiseAND(lit((nShards - 1).toLong)).cast("int")
  }

  /** All-zero words for an empty shard — built with `array_repeat`, not a
    * big array literal (a multi-thousand-element `Literal` measured ~3 s
    * per run of driver-side tree processing — see [[pruneInline]]). */
  private def zeroWords(nBits: Column): Column =
    array_repeat(lit(0L), (nBits.cast("int") / 64).cast("int"))

  /** Build the sharded frame over `items` at a uniform starting geometry:
    * one groupBy-shard aggregation (map-side partial combine — only
    * nShards · nBits/8 bytes cross the wire), then a left join against
    * the full shard range so EMPTY shards materialize as zero-words rows
    * (every consumer — absorb, probe, fill — relies on the frame being
    * total over shard ids). */
  def sketchSharded(items: DataFrame, hash: Column, nBitsPerShard: Int,
                    numProbes: Int, nShards: Int): DataFrame = {
    requireShards(nShards)
    val built = items.groupBy(shardOf(hash, nShards).as("shard"))
      .agg(sketch(hash, nBitsPerShard, numProbes).as("words"))
    items.sparkSession.range(nShards)
      .select(col("id").cast("int").as("shard"))
      .join(built, Seq("shard"), "left")
      .select(col("shard"),
        coalesce(col("words"), zeroWords(lit(nBitsPerShard))).as("words"),
        lit(nBitsPerShard).as("n_bits"), lit(numProbes).as("n_probes"),
        lit(nShards).as("n_shards"))
  }

  /** Build shard rows at PER-SHARD geometries (the rebuild primitive):
    * one aggregation job per DISTINCT target `n_bits` (bounded by the ~25
    * possible powers of two, in practice 1–2), each covering only its
    * shards' slice of `items`. Returns exactly one row per target shard,
    * zero-words rows included. */
  def sketchShardedAt(items: DataFrame, hash: Column, targets: Map[Int, Int],
                      numProbes: Int, nShards: Int): DataFrame = {
    requireShards(nShards)
    require(targets.nonEmpty, "sketchShardedAt requires at least one target shard")
    val spark = items.sparkSession
    targets.groupBy(_._2).map { case (nb, entries) =>
      val ids = entries.keys.toSeq
      val built = items.filter(shardOf(hash, nShards).isin(ids: _*))
        .groupBy(shardOf(hash, nShards).as("shard"))
        .agg(sketch(hash, nb, numProbes).as("words"))
      import spark.implicits._
      ids.toDF("shard").join(built, Seq("shard"), "left")
        .select(col("shard"),
          coalesce(col("words"), zeroWords(lit(nb))).as("words"),
          lit(nb).as("n_bits"), lit(numProbes).as("n_probes"),
          lit(nShards).as("n_shards"))
    }.reduce(_ unionByName _)
  }

  /** Rejects probe frames already carrying columns this operator will
    * introduce — silent clobbering otherwise (the `Curation.requireAbsent`
    * guard discipline). */
  private def requireAbsent(df: DataFrame, names: String*): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has reserved column(s): ${clash.mkString(", ")}")
  }

  /** Route each probe row to its shard and test membership under that
    * shard's stored geometry — adds a `__maybe` column. The frame
    * broadcasts (nShards rows); the join key is the derived shard id, so
    * the test sits directly over the probe scan, below any later
    * exchange.
    *
    * The caller's routing constants are VALIDATED against the artifact's
    * own `n_shards`/`n_probes` columns, lazily on the broadcast side
    * (nShards rows — zero extra jobs): a stored frame re-read after the
    * shard-count constant changed would otherwise route probes to the
    * wrong shard rows, and the resulting false negatives silently become
    * re-admitted duplicates downstream of [[admitSharded]]. A probe row
    * whose shard has NO frame row fails loudly too — only a total frame
    * (every shard 0..n−1 present, as [[sketchSharded]] and the rotation
    * maintainer always produce) may serve; [[sketchShardedAt]] returns a
    * schema-identical PARTIAL frame by design, and defaulting its absent
    * shards to "unseen" would bypass the history confirm-join without
    * any error. */
  def screenSharded(probe: DataFrame, probeHash: Column, frame: DataFrame,
                    numProbes: Int, nShards: Int): DataFrame = {
    requireAbsent(probe, "__shard", "__w", "__nb", "__maybe")
    val checked = frame.select(
      col("shard").as("__shard"),
      when(col("n_shards") === lit(nShards) && col("n_probes") === lit(numProbes),
          col("words"))
        .otherwise(raise_error(concat(
          lit(s"sharded-bloom geometry mismatch: caller passed nShards=$nShards" +
            s" numProbes=$numProbes but the artifact row has n_shards="),
          col("n_shards"), lit(" n_probes="), col("n_probes"))))
        .as("__w"),
      col("n_bits").as("__nb"))
    probe.withColumn("__shard", shardOf(probeHash, nShards))
      .join(broadcast(checked), Seq("__shard"), "left")
      .withColumn("__maybe",
        when(col("__w").isNotNull,
          coalesce(mightContainDyn(col("__w"), probeHash, col("__nb"), numProbes),
            lit(false)))
        .otherwise(raise_error(concat(
          lit("sharded-bloom frame is not total: no row for shard "),
          col("__shard"),
          lit(s" of $nShards — a partial sketchShardedAt frame cannot serve")))))
      .drop("__shard", "__w", "__nb")
  }

  /** [[admit]] through the sharded frame: identical exact-result contract
    * (== arrivals ANTI-JOIN history at any FP rate); the shard routing
    * only changes which filter row screens each arrival. */
  def admitSharded(arrivals: DataFrame, history: DataFrame, fpCol: String,
                   frame: DataFrame, numProbes: Int, nShards: Int): DataFrame =
    admitScreened(screenSharded(arrivals, xxhash64(col(fpCol)), frame,
      numProbes, nShards), history, fpCol)

  /** Exact per-shard fill, in ppm of each shard's own geometry — the
    * rotation decision number, computed DISTRIBUTEDLY (bit_count folded
    * over the words inside the scan; the driver collects nShards scalar
    * rows, never a words array). Decimal floor-division keeps the
    * arithmetic bit-identical to integer `popcount·10⁶ / n_bits` (a
    * double division could round across the threshold). */
  def shardFill(frame: DataFrame): DataFrame =
    frame.select(col("shard"), col("n_bits"),
      floor(aggregate(col("words"), lit(0L), (acc, w) => acc + bit_count(w))
          .cast("decimal(38,0)") * 1000000 / col("n_bits"))
        .cast("long").as("fill_ppm"))

  /** Rebuild geometry for one saturated shard: smallest power of two
    * holding 2·members·probes bits (≤50% target fill with headroom),
    * floored at 2× the outgoing size — a bare doubling of a badly
    * undersized filter comes back still saturated. The per-SHARD 2^30
    * ceiling still applies (it is what sharding exists to multiply);
    * overflowing it means the shard count, not the geometry, is
    * undersized. */
  def rebuildBitsFor(outBits: Int, members: Long, numProbes: Int): Int = {
    var b = 2L * outBits
    while (b < 2L * members * numProbes) b *= 2
    require(b <= (1L << 30),
      s"per-shard rebuild geometry overflow: $b bits — increase nShards")
    b.toInt
  }

  /** Store / rehydrate the sharded frame (nShards rows; geometry rides
    * per row, so a reader cannot probe any shard with the wrong scheme). */
  def writeSharded(frame: DataFrame, path: String): Unit =
    frame.coalesce(1).write.mode("overwrite").parquet(path)

  def readSharded(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
