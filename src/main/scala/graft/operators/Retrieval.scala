package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval operators (engine extension — SURVEY.md §7.5(8)): Okapi
  * BM25 lexical scoring and reciprocal-rank fusion, the retrieval layer a
  * RAG / training-data search stack runs over a curated corpus. Lexical and
  * semantic rankings are produced independently (BM25 here, cosine top-k
  * from [[VectorOps]]) and fused by RRF (Cormack, Clarke & Büttcher, SIGIR
  * 2009) — rank-based fusion needs no score normalization across the two
  * incomparable scales.
  *
  * Everything is codegen'd column expressions over keyed aggregates; the
  * only driver-sized structure is the fused candidate list itself (bounded
  * by the candidate budget `c`, a constant — never the corpus).
  */
object Retrieval {

  /** Okapi BM25 parameters (the standard defaults). */
  val K1 = 1.2
  val B = 0.75

  /** RRF smoothing constant (60 in the original paper). */
  val RrfK = 60

  /** Per-document Okapi BM25 score against a bag of query `terms`:
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1).
    *
    * Input `toked` must carry (idCol, toksCol: array<string>). Output:
    * (idCol, n_tokens, bm25) with the score rounded to 4 decimals — every
    * intermediate is an exactly-representable integer count below 2^53, so
    * an external engine replaying the same expression tree reproduces the
    * double bit-for-bit.
    *
    * Scale shape: one explode → keyed agg collapses each document to a row
    * of term counters ([[TextOps.wordCounts]], map-side partials), corpus
    * statistics (N, avgdl, per-term df) are ONE 1-row aggregate broadcast
    * back — two passes, no per-term join, nothing wider than (id, counters)
    * crosses a shuffle. */
  def bm25(toked: DataFrame, idCol: String, toksCol: String,
           terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val counts = TextOps.wordCounts(toked, idCol, toksCol, terms)
    val statAggs = avg(col("n_tokens").cast("double")).as("__avgdl") +:
      count(lit(1)).cast("double").as("__n") +:
      terms.map(w => sum(when(col(s"cnt_$w") > 0, 1.0).otherwise(0.0)).as(s"__df_$w"))
    val stats = counts.agg(statAggs.head, statAggs.tail: _*)
    val score = terms.map { w =>
      val tf = col(s"cnt_$w").cast("double")
      val df = col(s"__df_$w")
      val idf = log((col("__n") - df + 0.5) / (df + 0.5) + 1.0)
      idf * (tf * (K1 + 1)) /
        (tf + lit(K1) * (lit(1 - B) +
          lit(B) * col("n_tokens").cast("double") / col("__avgdl")))
    }.reduce(_ + _)
    counts.crossJoin(broadcast(stats))
      .select(col(idCol), col("n_tokens"), round(score, 4).as("bm25"))
  }

  /** Top-`c` candidate list by (`scoreCol` DESC, `idCol` ASC), with ranks
    * 1..c. The limit executes as TakeOrderedAndProject (no global sort of
    * the corpus); the row_number window then ranks ≤ c rows on a single
    * partition — bounded by the candidate budget, never the data. The
    * order key ends in the unique id, so the rank assignment (and the cut
    * at c) is total and reproducible. */
  def topCandidates(scored: DataFrame, idCol: String, scoreCol: String,
                    c: Int): DataFrame = {
    val w = Window.orderBy(desc(scoreCol), col(idCol))
    scored.orderBy(desc(scoreCol), col(idCol)).limit(c)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col(idCol), col(scoreCol), col("rank"))
  }

  /** Reciprocal-rank fusion of two candidate lists, each (idCol, rank):
    * rrf(d) = Σ_lists 1/(RrfK + rank_d), a list the document is absent
    * from contributing 0 (its rank reported as 0 — never null, so the
    * fused schema is stable). Returns the top `topK` by (rrf DESC, id) as
    * (idCol, rrf, rank_a, rank_b). Both inputs are candidate lists (≤ c
    * rows), so the full-outer join is trivially small at any corpus
    * scale. */
  def rrfFuse(ranksA: DataFrame, ranksB: DataFrame, idCol: String,
              topK: Int): DataFrame = {
    val a = ranksA.select(col(idCol), col("rank").as("rank_a"))
    val b = ranksB.select(col(idCol), col("rank").as("rank_b"))
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol),
        round(
          coalesce(lit(1.0) / (lit(RrfK) + col("rank_a")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfK) + col("rank_b")), lit(0.0)), 6)
          .as("rrf"),
        coalesce(col("rank_a"), lit(0L)).as("rank_a"),
        coalesce(col("rank_b"), lit(0L)).as("rank_b"))
      .orderBy(desc("rrf"), col(idCol))
      .limit(topK)
  }
}
