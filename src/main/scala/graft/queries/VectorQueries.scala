package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.VectorOps
import graft.sources.Tables

/** Oracle-checked queries for the embedding similarity suite (engine
  * extension — SURVEY.md §7.5(8)) over the `embeddings` table.
  *
  * The DuckDB oracle replicates the exact double arithmetic: both sides cast
  * each float element to double and sequentially fold the products
  * (Spark `aggregate(zip_with(...))` ↔ DuckDB `list_sum(list_transform(
  * list_zip(...)))`), then `round(..., 6)`. Hyperplane literals are inlined
  * from [[VectorOps.hyperplanes]] on both sides, so LSH buckets agree by
  * construction.
  */
object VectorQueries {
  type Q = (SparkSession, String) => DataFrame

  val QueryVecId = 0L
  val K = 10
  val NumPlanes = 6
  val Dim = 64
  val NearDupThreshold = 0.3

  /** Fixed hyperplane set shared by the ANN query and its oracle. */
  val planes: Seq[Array[Double]] = VectorOps.hyperplanes(NumPlanes, Dim)

  def queries: Map[String, Q] = Map(
    // ------------------------------------------------------------------ x6
    // Exact brute-force cosine top-k: the correctness baseline — one pass
    // over the table, broadcast single-row query side, TakeOrdered top-k.
    "x6_brute_topk" -> ((s, dir) => {
      val t = Tables(s, dir)
      VectorOps.bruteForceTopK(t.embeddings, "vec_id", "embedding", QueryVecId, K)
    }),

    // ------------------------------------------------------------------ x7
    // ANN top-k via random-hyperplane LSH: candidates share the query's
    // bucket (hash join on `bucket`), exact cosine within the bucket.
    "x7_ann_topk" -> ((s, dir) => {
      val t = Tables(s, dir)
      VectorOps.annTopK(t.embeddings, "vec_id", "embedding", QueryVecId, K, planes)
    }),

    // ------------------------------------------------------------------ x8
    // Embedding-cosine near-duplicate pairs, LSH-bucket-blocked so the
    // pairwise comparison is bounded per block (never all-pairs).
    "x8_embed_neardups" -> ((s, dir) => {
      val t = Tables(s, dir)
      VectorOps.nearDupPairs(t.embeddings, "vec_id", "embedding", planes, NearDupThreshold)
        .orderBy("block", "id_a", "id_b")
    })
  )

  // --------------------------------------------------------- oracle SQL gen

  /** DuckDB sequential-fold double dot product of two list expressions. */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> x[1]::DOUBLE * x[2]::DOUBLE))"

  private def normSql(a: String): String =
    s"sqrt(list_sum(list_transform($a, v -> v::DOUBLE * v::DOUBLE)))"

  private def planeLit(p: Array[Double]): String =
    p.map(v => f"$v%.3f").mkString("[", ", ", "]")

  /** DuckDB LSH bucket id for a vector expression (bit i ⇔ dot > 0). */
  private def bucketSql(vec: String): String =
    planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${dotSql(vec, planeLit(p))} > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("CAST(", " + ", " AS BIGINT)")

  private def cosSql(a: String, b: String): String =
    s"round(${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}), 6)"

  def oracles: Map[String, String] = Map(
    "x6_brute_topk" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryVecId)
         |SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS sim_r
         |FROM embeddings e, q WHERE e.vec_id <> $QueryVecId
         |ORDER BY sim_r DESC, e.vec_id LIMIT $K""".stripMargin,
    "x7_ann_topk" -> {
      val probeList = ("q.bucket" +:
        planes.indices.map(i => s"xor(q.bucket, ${1L << i})")).mkString(", ")
      s"""WITH bkt AS (
         |  SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
         |q AS (SELECT bucket, embedding AS qv FROM bkt WHERE vec_id = $QueryVecId),
         |probes AS (SELECT u.pb AS bucket, q.qv FROM q, UNNEST([$probeList]) u(pb))
         |SELECT e.vec_id, ${cosSql("e.embedding", "p.qv")} AS sim_r
         |FROM bkt e JOIN probes p ON e.bucket = p.bucket
         |WHERE e.vec_id <> $QueryVecId
         |ORDER BY sim_r DESC, e.vec_id LIMIT $K""".stripMargin
    },
    "x8_embed_neardups" ->
      s"""WITH bkt AS (
         |  SELECT vec_id, embedding, ${bucketSql("embedding")} AS block FROM embeddings),
         |pairs AS (
         |  SELECT a.block, a.vec_id AS id_a, b.vec_id AS id_b,
         |    ${cosSql("a.embedding", "b.embedding")} AS sim_r
         |  FROM bkt a JOIN bkt b ON a.block = b.block AND a.vec_id < b.vec_id)
         |SELECT block, id_a, id_b, sim_r FROM pairs
         |WHERE sim_r >= $NearDupThreshold ORDER BY block, id_a, id_b""".stripMargin
  )
}
