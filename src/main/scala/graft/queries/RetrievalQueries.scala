package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, TextOps, VectorOps}
import graft.sources.Tables

/** Oracle-checked queries for the hybrid-retrieval suite (engine extension
  * — SURVEY.md §7.5(8)): BM25 lexical ranking over `documents`, cosine
  * semantic ranking over `embeddings` (vec_id is the document's embedding
  * id — the tables are generated as parallel keys), fused by reciprocal
  * rank. The oracle replays the identical BM25 expression tree — every
  * intermediate (tf, df, N, dl, avgdl) is an exactly-representable integer
  * in a double, so the round-4 scores agree bit-for-bit — and the identical
  * rank/fusion arithmetic.
  */
object RetrievalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Query bag for the lexical side (terms from the corpus vocabulary). */
  val QueryTerms = Seq("spark", "join", "window")

  /** The query document/embedding id: its embedding is the semantic query
    * vector, and the document itself is excluded from both rankings. */
  val QueryDocId = 0L

  /** Per-modality candidate budget and fused output size. */
  val CandidateK = 100
  val FusedK = 25

  def queries: Map[String, Q] = Map(
    // ----------------------------------------------------------------- x36
    // Hybrid retrieval with reciprocal-rank fusion: top-100 by BM25 over
    // the query terms, top-100 by cosine to the query embedding, RRF-fused
    // (k=60), top-25 out. Ranks are reported (0 = absent from that list),
    // so the oracle verifies both candidate lists, not just the fused
    // order.
    "x36_hybrid_rrf" -> ((s, dir) => {
      val t = Tables(s, dir)
      val toked = t.documents.filter(col("doc_id") =!= QueryDocId)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      val lex = Retrieval.topCandidates(
        Retrieval.bm25(toked, "doc_id", "toks", QueryTerms),
        "doc_id", "bm25", CandidateK)
      val q = t.embeddings.filter(col("vec_id") === QueryDocId)
        .select(col("embedding").as("__qv"),
          VectorOps.norm2(col("embedding")).as("__qn"))
      val sem = Retrieval.topCandidates(
        t.embeddings.filter(col("vec_id") =!= QueryDocId)
          .crossJoin(broadcast(q))
          .select(col("vec_id").as("doc_id"),
            round(VectorOps.dot(col("embedding"), col("__qv"))
              / (VectorOps.norm2(col("embedding")) * col("__qn")), 6).as("sim")),
        "doc_id", "sim", CandidateK)
      Retrieval.rrfFuse(lex.select("doc_id", "rank"),
          sem.select("doc_id", "rank"), "doc_id", FusedK)
        .orderBy(desc("rrf"), col("doc_id"))
    })
  )

  // --------------------------------------------------------- oracle SQL gen

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> x[1]::DOUBLE * x[2]::DOUBLE))"
  private def normSql(a: String): String =
    s"sqrt(list_sum(list_transform($a, v -> v::DOUBLE * v::DOUBLE)))"

  /** BM25 per-term score expression — the same tree as [[Retrieval.bm25]]:
    * ln((n − df + 0.5) / (df + 0.5) + 1.0) · (tf·(k1+1)) /
    * (tf + k1·(1 − b + b·dl/avgdl)), summed in term order. */
  private def bm25Sql: String = {
    val k1 = Retrieval.K1
    val b = Retrieval.B
    val termScores = QueryTerms.map { w =>
      s"""ln((n - df_$w + 0.5) / (df_$w + 0.5) + 1.0) * (tf_$w * ${k1 + 1})
         |      / (tf_$w + $k1 * (1 - $b + $b * dl / avgdl))""".stripMargin
    }.mkString(" + ")
    val tfCols = QueryTerms.map(w =>
      s"len(list_filter(toks, t -> t = '$w'))::DOUBLE AS tf_$w").mkString(",\n    ")
    val dfCols = QueryTerms.map(w =>
      s"sum(CASE WHEN tf_$w > 0 THEN 1.0 ELSE 0.0 END) AS df_$w").mkString(",\n    ")
    s"""counts AS (
       |  SELECT doc_id, len(toks)::DOUBLE AS dl,
       |    $tfCols
       |  FROM (SELECT doc_id, ${TextQueries.toksSql} AS toks FROM documents
       |        WHERE doc_id <> $QueryDocId)),
       |stats AS (
       |  SELECT avg(dl) AS avgdl, count(*)::DOUBLE AS n,
       |    $dfCols
       |  FROM counts),
       |bm AS (
       |  SELECT doc_id, round($termScores, 4) AS bm25 FROM counts, stats)""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "x36_hybrid_rrf" -> {
      val rrfK = Retrieval.RrfK
      s"""WITH $bm25Sql,
         |lex AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_a
         |  FROM bm ORDER BY bm25 DESC, doc_id LIMIT $CandidateK),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryDocId),
         |sims AS (
         |  SELECT e.vec_id AS doc_id,
         |    round(${dotSql("e.embedding", "q.qv")}
         |      / (${normSql("e.embedding")} * ${normSql("q.qv")}), 6) AS sim
         |  FROM embeddings e, q WHERE e.vec_id <> $QueryDocId),
         |sem AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id) AS rank_b
         |  FROM sims ORDER BY sim DESC, doc_id LIMIT $CandidateK),
         |fused AS (
         |  SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
         |    round(coalesce(1.0 / ($rrfK + rank_a), 0.0)
         |        + coalesce(1.0 / ($rrfK + rank_b), 0.0), 6) AS rrf,
         |    CAST(coalesce(rank_a, 0) AS BIGINT) AS rank_a,
         |    CAST(coalesce(rank_b, 0) AS BIGINT) AS rank_b
         |  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
         |SELECT doc_id, rrf, rank_a, rank_b FROM fused
         |ORDER BY rrf DESC, doc_id LIMIT $FusedK""".stripMargin
    }
  )
}
