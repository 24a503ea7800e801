package graft

import org.scalatest.funsuite.AnyFunSuite

/** Harness-logic specs for [[Bench]] — the pure pieces whose failure modes
  * have cost rounds their artifacts: the shard contract-line parser (r10:
  * one broken query killed all 150 timings) and the cost-balanced shard
  * assignment. No SparkSession needed.
  */
class BenchSpec extends AnyFunSuite {

  test("parseContractLine extracts timings and errors from a child contract line") {
    val line =
      """{"metric":"total","value":3.5,"unit":"sec","sf":"/x","queries":{"a_q":1.25,"b_q":2.25},"regressions":[],"errors":{"c_q":"AnalysisException: [DATATYPE_MISMATCH] \"ts\" div","d_q":"shard failure: boom"}}"""
    val (timings, errors) = Bench.parseContractLine(
      s"some warmup noise\n$line\n" +
        """{"metric":"bench_summary","total":3.5,"unit":"sec","sf":"/x","n":2,"n_regressions":0,"n_errors":2}""")
    assert(timings === Map("a_q" -> 1.25, "b_q" -> 2.25))
    assert(errors.keySet === Set("c_q", "d_q"))
    assert(errors("c_q").contains("DATATYPE_MISMATCH"))
    assert(errors("c_q").contains("\"ts\""), "escaped quotes must round-trip")
  }

  test("parseContractLine tolerates a pre-errors-field contract line") {
    val line =
      """{"metric":"total","value":1.0,"unit":"sec","sf":"/x","queries":{"a_q":1.0},"regressions":[]}"""
    val (timings, errors) = Bench.parseContractLine(line)
    assert(timings === Map("a_q" -> 1.0))
    assert(errors.isEmpty)
  }

  test("parseContractLine fails loudly when no contract line exists") {
    intercept[RuntimeException] {
      Bench.parseContractLine("stderr noise only\nno json here")
    }
  }

  test("jsonStr escapes quotes, backslashes, and control characters") {
    assert(Bench.jsonStr("a\"b\\c\nd\te") === "\"a\\\"b\\\\c\\nd\\te\"")
    assert(Bench.jsonStr("plan:" + 1.toChar + "x") === "\"plan:\\u0001x\"")
  }

  test("shardAssignment covers every query exactly once and balances cost") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val bins = Bench.shardAssignment(names, 6)
    assert(bins.flatten.sorted === names, "every query lands in exactly one shard")
    val loads = bins.map(_.map(n =>
      BenchExpectations.secondsAtSf01.getOrElse(n, 1.0)).sum)
    // Greedy longest-first keeps the spread tight: no shard should carry
    // more than twice the lightest shard's load.
    assert(loads.max <= loads.min * 2.0 + 1.0, s"unbalanced shards: $loads")
  }
}
