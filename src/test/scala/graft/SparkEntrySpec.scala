package graft

/** Driver-contract invariants: the gate silently weakens if a query lacks
  * an oracle (rows-only check) or an oracle names a missing query. */
class SparkEntrySpec extends SparkSpec {

  test("every declared query has an oracle and every oracle a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q.diff(o).isEmpty, s"queries without oracle: ${q.diff(o).toSeq.sorted}")
    assert(o.diff(q).isEmpty, s"oracles without query: ${o.diff(q).toSeq.sorted}")
  }

  test("query names are unique across packs (no silent map overwrites)") {
    import graft.queries._
    val packs = Seq(
      "core" -> CoreQueries.queries.keySet,
      "window" -> WindowQueries.queries.keySet,
      "text" -> TextQueries.queries.keySet,
      "vector" -> VectorQueries.queries.keySet,
      "media" -> MediaQueries.queries.keySet,
      "curation" -> CurationQueries.queries.keySet,
      "retrieval" -> RetrievalQueries.queries.keySet,
      "sink" -> SinkQueries.queries.keySet,
      "pipeline" -> PipelineQueries.queries.keySet)
    for {
      (na, a) <- packs; (nb, b) <- packs if na < nb
    } assert(a.intersect(b).isEmpty, s"$na and $nb share names: ${a.intersect(b)}")
    assert(SparkEntry.queries.size === packs.map(_._2.size).sum)
  }

  test("entry (driver smoke) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has a bench expectation and every expectation a query") {
    // Regression coverage silently lapses for any query missing from the
    // snapshot (Bench skips unknown keys), and a stale key means the
    // snapshot drifted from the suite — both must fail loudly here.
    val q = SparkEntry.queries.keySet
    val e = BenchExpectations.secondsAtSf01.keySet
    assert(q.diff(e).isEmpty, s"queries without expectation: ${q.diff(e).toSeq.sorted}")
    assert(e.diff(q).isEmpty, s"expectations without query: ${e.diff(q).toSeq.sorted}")
  }
}
