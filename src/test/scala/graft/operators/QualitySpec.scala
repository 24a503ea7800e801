package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quality rule semantics on violation-bearing frames (the a17 query runs
  * the same checks on clean TPC-H data, where several counts are zero). */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("ok"), Some(5.0)),
    (2L, None, Some(50.0)),      // null name; out of range
    (2L, Some("BAD!"), None),    // dup key; pattern violation; null range is OK
    (3L, Some("ok"), Some(-1.0)) // out of range
  ).toDF("k", "name", "v")

  test("rowChecks counts violations per rule in one pass") {
    val out = Quality.rowChecks(df, Seq(
        Quality.notNull("name"),
        Quality.inRange("v", 0, 10),
        Quality.matches("name", "^[a-z]+$")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("not_null(name)") === 1L)
    assert(out("in_range(v)") === 2L)   // 50.0 and -1.0; null v not counted
    assert(out("matches(name)") === 1L) // BAD!; null name not counted
  }

  test("uniqueKey counts surplus rows over distinct keys") {
    val out = Quality.uniqueKey(df, Seq("k")).head
    assert(out.getString(0) === "unique_key(k)")
    assert(out.getLong(1) === 1L) // 4 rows, 3 distinct keys
  }

  test("refIntegrity counts fact keys missing from the dimension") {
    val dim = Seq(1L, 3L).toDF("id")
    val out = Quality.refIntegrity(df, "k", dim, "id").head
    assert(out.getLong(1) === 2L) // both k=2 rows dangle
  }

  test("report unions row, key, and reference checks") {
    val dim = Seq(1L, 2L, 3L).toDF("id")
    val out = Quality.report(df,
        rowRules = Seq(Quality.notNull("name")),
        keyCols = Some(Seq("k")),
        refs = Seq(("k", dim, "id")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.size === 3)
    assert(out("not_null(name)") === 1L)
    assert(out("unique_key(k)") === 1L)
    assert(out("ref_integrity(k->id)") === 0L)
  }

  test("standardize: known z-scores, constant column -> 0, nulls propagate") {
    import spark.implicits._
    // x = 1,2,3: mean 2, stddev_pop sqrt(2/3); c constant; n has a null
    val df = Seq((1L, 1.0, 5.0, Some(10.0)), (2L, 2.0, 5.0, None),
      (3L, 3.0, 5.0, Some(20.0))).toDF("id", "x", "c", "n")
    val out = Quality.standardize(df, Seq("x", "c", "n"), precision = 6)
      .orderBy("id").collect()
    val s = math.sqrt(2.0 / 3.0)
    assert(math.abs(out(0).getAs[Double]("z_x") - math.rint(-1.0 / s * 1e6) / 1e6) < 1e-9)
    assert(out(1).getAs[Double]("z_x") === 0.0)
    assert(out.forall(_.getAs[Double]("z_c") === 0.0),
      "constant column must map to 0, not NaN")
    assert(out(1).isNullAt(out(1).fieldIndex("z_n")), "null feature stays null")
    assert(!out(0).isNullAt(out(0).fieldIndex("z_n")))
    // reserved output name rejected
    intercept[IllegalArgumentException] {
      Quality.standardize(df.withColumn("z_x", lit(0)), Seq("x"))
    }
  }

  test("fitLogistic learns a separable threshold; deterministic; composes " +
      "with scoreLinear") {
    import spark.implicits._
    // y = (x > 0) on a symmetric feature: GD must learn a positive
    // weight and classify the training set perfectly.
    val df = (-10 to 10).filter(_ != 0)
      .map(i => (i.toLong, i / 10.0, if (i > 0) 1 else 0))
      .toDF("id", "x", "y")
    val (w, b) = Quality.fitLogistic(df, Seq("x"), "y", iters = 20, step = 8.0)
    assert(w.head > 1.0, s"positive threshold weight, got ${w.head}")
    val scored = Quality.scoreLinear(df, Seq("x" -> w.head), b)
    val acc = scored.filter($"quality_pass" === ($"y" === 1)).count()
    assert(acc === 20L, s"separable data must classify perfectly, got $acc/20")
    // deterministic refit
    val (w2, b2) = Quality.fitLogistic(df, Seq("x"), "y", 20, 8.0)
    assert(w2 === w && b2 === b)
    intercept[IllegalArgumentException] {
      Quality.fitLogistic(df, Nil, "y", 1, 1.0)
    }
  }

  test("filterCascade: first-failure attribution, zero-drop stages report, " +
      "telescoping remainders, nulls survive") {
    import spark.implicits._
    // doc 1 fails rules 0 AND 1 → charged to 0 only; doc 2 fails 1;
    // doc 3 passes; doc 4 has a null metric → survives (null never drops);
    // rule 2 drops nothing and must still report.
    val df = Seq((1L, Some(5L), Some(9.0)), (2L, Some(50L), Some(9.0)),
      (3L, Some(50L), Some(3.0)), (4L, Some(50L), None))
      .toDF("id", "n", "m")
    val rules = Seq(
      Quality.Rule("min_n", $"n" < 10L),
      Quality.Rule("m_range", !$"m".between(0.0, 5.0)),
      Quality.Rule("never", lit(false)))
    val rep = Quality.filterCascade(df, rules).orderBy("stage").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rep === Array(
      (0, "min_n", 1L, 3L),
      (1, "m_range", 1L, 2L),
      (2, "never", 0L, 2L)))
    val survivors = Quality.cascadeSurvivors(df, rules)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(survivors === Array(3L, 4L),
      "null metric survives both the report and the filter consistently")
    assert(survivors.length === rep.last._4,
      "last n_remaining is the survivor count")
    intercept[IllegalArgumentException] { Quality.filterCascade(df, Nil) }
  }

  test("scoreLinear: sigmoid arithmetic, null-as-mean, gate on rounded score") {
    import spark.implicits._
    val df = Seq((1L, 1.0, Some(2.0)), (2L, -1.0, None), (3L, 0.0, Some(0.0)))
      .toDF("id", "a", "b")
    val w = Seq("a" -> 2.0, "b" -> -1.0)
    val out = Quality.scoreLinear(df, w, bias = 0.5).orderBy("id").collect()
    def sig(x: Double) = math.rint(1.0 / (1.0 + math.exp(-x)) * 1e6) / 1e6
    // row 1: 2*1 - 1*2 + 0.5 = 0.5; row 2: null b contributes 0 → -1.5
    assert(out(0).getAs[Double]("quality_score") === sig(0.5))
    assert(out(1).getAs[Double]("quality_score") === sig(-1.5))
    assert(out(2).getAs[Double]("quality_score") === sig(0.5))
    assert(out(0).getAs[Boolean]("quality_pass"))
    assert(!out(1).getAs[Boolean]("quality_pass"))
    // reserved output name rejected
    intercept[IllegalArgumentException] {
      Quality.scoreLinear(df.withColumn("quality_pass", lit(true)), w, 0.0)
    }
  }
}
