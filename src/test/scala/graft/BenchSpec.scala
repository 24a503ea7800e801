package graft

import org.scalatest.funsuite.AnyFunSuite

/** Harness-logic specs for [[Bench]] — the pure pieces whose failure modes
  * have cost rounds their artifacts: the shard contract-line parser (r10:
  * one broken query killed all 150 timings) and the cost-balanced shard
  * assignment. No SparkSession needed.
  */
class BenchSpec extends AnyFunSuite {

  test("parseContractLine extracts timings, gc, and errors from a child contract line") {
    val line =
      """{"metric":"total","value":3.5,"unit":"sec","sf":"/x","queries":{"a_q":1.25,"b_q":2.25},"regressions":[],"errors":{"c_q":"AnalysisException: [DATATYPE_MISMATCH] \"ts\" div","d_q":"shard failure: boom"},"gc_ms":{"a_q":120,"b_q":7},"env":{"loadavg_start":"1.0 2.0 3.0","loadavg_end":"1.1 2.1 3.1","other_jvms_start":2,"other_jvms_end":2,"cpus":32}}"""
    val (timings, gc, errors) = Bench.parseContractLine(
      s"some warmup noise\n$line\n" +
        """{"metric":"bench_summary","total":3.5,"unit":"sec","sf":"/x","n":2,"n_regressions":0,"n_errors":2}""")
    assert(timings === Map("a_q" -> 1.25, "b_q" -> 2.25))
    assert(gc === Map("a_q" -> 120L, "b_q" -> 7L))
    assert(errors.keySet === Set("c_q", "d_q"))
    assert(errors("c_q").contains("DATATYPE_MISMATCH"))
    assert(errors("c_q").contains("\"ts\""), "escaped quotes must round-trip")
  }

  test("parseContractLine tolerates pre-gc/env contract lines (old children)") {
    val line =
      """{"metric":"total","value":1.0,"unit":"sec","sf":"/x","queries":{"a_q":1.0},"regressions":[]}"""
    val (timings, gc, errors) = Bench.parseContractLine(line)
    assert(timings === Map("a_q" -> 1.0))
    assert(gc.isEmpty)
    assert(errors.isEmpty)
  }

  test("parseContractLine is field-order independent and string-aware") {
    // errors precede queries; an error VALUE contains brace-and-marker
    // text that must not hijack extraction of the later real fields.
    val line =
      """{"metric":"total","value":1.0,"errors":{"e_q":"boom {\"gc_ms\":{ deep} \"queries\":{"},"queries":{"a_q":1.0},"gc_ms":{"a_q":42}}"""
    val (timings, gc, errors) = Bench.parseContractLine(line)
    assert(timings === Map("a_q" -> 1.0))
    assert(gc === Map("a_q" -> 42L))
    assert(errors("e_q").contains("deep"))
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

  test("jsonUnescape reverses every escape jsonStr produces") {
    val cases = Seq("a\"b\\c\nd\te\rf", "plan:" + 1.toChar + "x", "",
      "tricky \\n literal", "päivää")
    cases.foreach { s =>
      val quoted = Bench.jsonStr(s)
      assert(Bench.jsonUnescape(quoted.substring(1, quoted.length - 1)) === s,
        s"round-trip failed for: $s")
    }
  }

  test("contract line carries env telemetry and per-query gc_ms (self-adjudication)") {
    val result = Bench.BenchResult(
      timings = Seq("a_q" -> 1.25, "b_q" -> 2.5),
      gcMs = Map("a_q" -> 120L, "b_q" -> 7L),
      errors = Map("c_q" -> "boom \"quoted\" msg"))
    val env = EnvTelemetry.envJson(EnvTelemetry.loadavg, EnvTelemetry.otherJvms)
    val line = Bench.contractLine(result, "/x", "[]", env)
    // presence of the adjudication fields on the artifact line
    assert(line.contains("\"gc_ms\":{"), "gc_ms field must be on the contract line")
    assert(line.contains("\"env\":{"), "env field must be on the contract line")
    assert(line.contains("\"loadavg_start\":"))
    assert(line.contains("\"other_jvms_start\":"))
    assert(line.contains("\"cpus\":"))
    // and the line round-trips through the parser
    val (timings, gc, errors) = Bench.parseContractLine(line)
    assert(timings === Map("a_q" -> 1.25, "b_q" -> 2.5))
    assert(gc === Map("a_q" -> 120L, "b_q" -> 7L))
    assert(errors("c_q") === "boom \"quoted\" msg")
  }

  test("env telemetry reads real values on this box") {
    // loadavg: three space-separated decimals on Linux
    assert(EnvTelemetry.loadavg.split(" ").length === 3)
    // at minimum the sbt JVM running this spec's parent is visible
    assert(EnvTelemetry.otherJvms >= 0)
  }

  test("regressionsFor applies all three thresholds at the snapshot scale " +
       "only, and pastThresholds is its exact predicate") {
    val known = BenchExpectations.secondsAtSf01.toSeq.sortBy(-_._2)
    assert(known.nonEmpty)
    val (name, e) = known.head
    val slow = math.max(e * BenchExpectations.RegressionFactor + 1.0,
      BenchExpectations.MinFlagSec + 1.0)
    val result = Bench.BenchResult(
      timings = Seq(name -> slow, "unknown_query" -> 999.0),
      gcMs = Map.empty, errors = Map.empty)
    // flagged at the snapshot's own scale; unknown queries never flag
    assert(Bench.regressionsFor(result, "/root/testdata/sf0.1") ===
      Seq((name, e, slow)))
    // never flagged off-scale
    assert(Bench.regressionsFor(result, "/root/testdata/sf0.01") === Nil)
    // an in-expectation reading does not flag (solo_ok's predicate)
    assert(!Bench.pastThresholds(e, e))
    assert(Bench.pastThresholds(e, slow))
  }

  test("suite inflation: a uniformly loaded box clears phantom flags, a " +
       "localized regression still flags through the load, subset runs " +
       "stay raw, and the cap bounds self-excusal") {
    val snap = BenchExpectations.secondsAtSf01.toSeq.sortBy(_._1)
    def res(t: Seq[(String, Double)]) =
      Bench.BenchResult(t, Map.empty, Map.empty)
    val sf = "/root/testdata/sf0.1"
    // (a) the round-17 failure mode: every query uniformly 1.8x its floor
    // (driver-box contention) — the median captures it, zero flags raised
    val uniform = res(snap.map { case (n, e) => n -> e * 1.8 })
    assert(math.abs(Bench.suiteInflation(uniform) - 1.8) < 1e-9)
    assert(Bench.regressionsFor(uniform, sf) === Nil)
    // (b) one genuinely 4x-regressed query on a quiet suite: the median
    // stays 1.0 and the flag fires at full strength
    val (worst, we) = snap.maxBy(_._2)
    val localized = res(snap.map { case (n, e) =>
      n -> (if (n == worst) e * 4 else e) })
    assert(math.abs(Bench.suiteInflation(localized) - 1.0) < 1e-9)
    assert(Bench.regressionsFor(localized, sf).map(_._1) === Seq(worst))
    // (c) the same real regression UNDER the uniform load still flags:
    // normalization removes the load, not the regression
    val both = res(snap.map { case (n, e) =>
      n -> (if (n == worst) e * 4 * 1.8 else e * 1.8) })
    assert(Bench.regressionsFor(both, sf).map(_._1) === Seq(worst))
    // (d) targeted dev subsets (< InflationMinQueries known queries) stay
    // on the raw thresholds
    assert(Bench.suiteInflation(res(snap.take(5).map { case (n, e) =>
      n -> e * 1.8 })) === 1.0)
    // (e) the cap: a catastrophic uniform 7x cannot fully self-excuse —
    // inflation clamps at the cap (7/3 = 2.3x residual) and flags fire
    val catastrophic = res(snap.map { case (n, e) => n -> e * 7 })
    assert(Bench.suiteInflation(catastrophic)
      === BenchExpectations.InflationCap)
    assert(Bench.regressionsFor(catastrophic, sf).nonEmpty)
  }

  test("tampered-expectation smoke: the flag machinery actually reads the " +
       "snapshot — an expectation lowered 10x flags a measurement the " +
       "true floor accepts") {
    val (name, e) = BenchExpectations.secondsAtSf01.toSeq.maxBy(_._2)
    assert(!Bench.pastThresholds(e, e), s"$name at its own floor must pass")
    assert(Bench.pastThresholds(e / 10, e),
      "a tampered (10x lower) expectation must flag the same reading — " +
        "if this fails, flags no longer consult the snapshot at all")
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
