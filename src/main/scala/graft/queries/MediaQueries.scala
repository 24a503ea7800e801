package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

/** Oracle-checked queries for the multimodal plumbing (engine extension —
  * builder brief): the decode step is a declared stub ([[Multimodal.FakeDecoder]],
  * no codecs in this container), but its deterministic features — payload
  * byte length and sha256 — ARE replayable in DuckDB over `encode(text)`,
  * so the whole mapPartitions path (schema, encoders, batch shape, feature
  * columns) is verified end-to-end, not just spec-tested.
  */
object MediaQueries {
  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // ----------------------------------------------------------------- x10
    // Media feature extraction: documents → opaque binary payload table →
    // batched per-partition decode (stubbed) → typed feature rows.
    "x10_media_features" -> ((s, dir) => {
      val t = Tables(s, dir)
      Multimodal.extractFeatures(s, Multimodal.asMediaTable(t.documents))
        .toDF()
        .select("doc_id", "payload_bytes", "fake_width", "payload_sha256", "lang")
        .orderBy("doc_id")
    })
  )

  def oracles: Map[String, String] = Map(
    // FakeDecoder features over utf-8 payload bytes: octet_length(encode(..))
    // = payload.length, sha256 hex matches the %02x-formatted digest,
    // fake_width = bytes % 640 (the stand-in for decoded width).
    "x10_media_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
        |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
        |  sha256(text) AS payload_sha256, lang
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
