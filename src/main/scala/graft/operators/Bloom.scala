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
    val m = lit((nBits - 1).toLong)
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
    val definiteNew = screened.filter(!col("__maybe")).drop("__maybe")
    val confirmed = screened.filter(col("__maybe")).drop("__maybe")
      .join(history.select(col(fpCol)).distinct(), Seq(fpCol), "left_anti")
    definiteNew.unionByName(confirmed)
  }
}
