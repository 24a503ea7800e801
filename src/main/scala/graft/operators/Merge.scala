package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot-merge (CDC upsert) operator — engine extension. The reference's
  * idempotent re-run path deduplicates before upload (`pac_snowflake_pipeline
  * .py:338-346`, realized as [[Dedup.antiJoinExisting]]); this operator is
  * the full merge generalization a warehouse needs: apply a keyed changeset
  * of upserts and deletes to a base snapshot in one pass.
  */
object Merge {

  /** Apply `changes` to `base`, keyed by `keyCols`. `changes` carries the
    * base schema plus `opCol`: op "U" upserts (replaces the row when the
    * key exists, inserts otherwise), op "D" deletes (a delete for an absent
    * key is a no-op). `changes` must be unique per key — resolve multiple
    * ops per key upstream (e.g. [[Dedup.keepFirst]] by change sequence),
    * since merge semantics are undefined for conflicting same-key ops.
    *
    * Plan shape: ONE full-outer equi-join on `keyCols` — the canonical
    * distributed merge (what Delta/Iceberg MERGE lowers to): both sides
    * hash-partition by key, AQE broadcasts a small changeset and splits
    * skewed keys; no windows, no secondary pass. Non-key columns resolve
    * with a null-safe "change wins" rule on the op marker, so a null VALUE
    * in an upsert row correctly overwrites the base value. */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
                   opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    require(changes.columns.toSet == base.columns.toSet + opCol,
      s"changes must carry the base schema plus '$opCol' " +
        s"(base: ${base.columns.mkString(",")}; changes: ${changes.columns.mkString(",")})")
    val dataCols = base.columns.filterNot(keyCols.contains).toIndexedSeq
    val reserved = ("__op" +: dataCols.map("__c_" + _)) ++ dataCols.map("__b_" + _)
    require(base.columns.intersect(reserved).isEmpty,
      s"column names ${reserved.take(3).mkString(",")}… are reserved by applyChanges")
    val b = base.select(keyCols.map(col) ++ dataCols.map(c => col(c).as("__b_" + c)): _*)
    val ch = changes.select(keyCols.map(col) ++
      (dataCols.map(c => col(c).as("__c_" + c)) :+ col(opCol).as("__op")): _*)
    b.join(ch, keyCols, "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(keyCols.map(col) ++ dataCols.map(c =>
        when(col("__op").isNotNull, col("__c_" + c))
          .otherwise(col("__b_" + c)).as(c)): _*)
  }

  /** SCD type-2 history from a keyed change log: every log row becomes a
    * version with `valid_from` = its own `tsCol`, `valid_to` = the key's
    * NEXT version timestamp (null ⇒ current version), and `is_current`.
    * `tieBreak` columns make same-timestamp versions totally ordered.
    *
    * Plan shape: one `lead` window per key — a single hash-partition on the
    * key columns with an in-key sort, the minimal plan for "look one
    * version ahead" (version counts per key are bounded by change
    * frequency, so in-key sorts stay small even when the table is huge). */
  def scd2History(log: DataFrame, keyCols: Seq[String], tsCol: String,
                  tieBreak: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "scd2History needs at least one key column")
    require(!log.columns.exists(Set("valid_from", "valid_to", "is_current")),
      "column names valid_from/valid_to/is_current are reserved by scd2History")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    log.withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Per-row diff between two snapshots of a keyed table, compared by a
    * content fingerprint: status `added` (key only in new), `removed`
    * (only in old), `changed` (both, fingerprints differ), `unchanged`.
    * The validation report a nightly ingest runs before swapping
    * snapshots — [[applyChanges]] applies a KNOWN changeset; this
    * DISCOVERS the changeset two snapshots imply (and `removed` counts
    * catch the upstream-source-died regression a merge never sees).
    * Fingerprints should be content hashes
    * ([[TextOps.fingerprint]] / [[Curation.idHash]]-style), so the
    * comparison never ships document bodies. Returns (idCol, status).
    *
    * Plan shape: ONE full-outer equi-join on the key over two skinny
    * (key, fingerprint) projections — the same canonical merge join as
    * [[applyChanges]]; both sides hash-partition on the key, the status
    * is a row-local CASE, and no text column crosses the wire. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                   fpCol: String): DataFrame = {
    val reserved = Seq("__fp_old", "__fp_new", "__in_old", "__in_new", "status")
    require(oldDf.columns.intersect(reserved).isEmpty &&
      newDf.columns.intersect(reserved).isEmpty,
      "column names __fp_old/__fp_new/__in_old/__in_new/status are " +
        "reserved by snapshotDiff")
    // Null-marker columns ride along so a NULL fingerprint stays
    // distinguishable from an absent row after the full-outer join: with
    // the fingerprint alone, a present-but-null-fp row would classify as
    // added/removed, and two null fps would compare as "changed" instead
    // of null-safe "unchanged".
    oldDf.select(col(idCol), col(fpCol).as("__fp_old"),
        lit(true).as("__in_old"))
      .join(newDf.select(col(idCol), col(fpCol).as("__fp_new"),
        lit(true).as("__in_new")), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(col("__fp_old") <=> col("__fp_new"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
