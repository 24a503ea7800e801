package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants for the cleaning layer (SURVEY.md §5 test
  * plan): normalization idempotence, coercion totality, dedup ⊆ input,
  * composite-key injectivity. Uses raw ScalaCheck (no scalatestplus bridge
  * in the build); each property runs a bounded number of Spark jobs. */
class CleaningPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, trials: Int = 15): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(trials), p)
    assert(res.passed, res.status.toString)
  }

  private val messyName: Gen[String] = for {
    base <- Gen.alphaNumStr.map(_.take(12)).suchThat(_.nonEmpty)
    pad <- Gen.oneOf("", " ", "  ", "\t")
    mid <- Gen.oneOf("", " ", "_")
  } yield s"$pad$base$mid${base.reverse}$pad"

  test("property: column-name normalization is idempotent on messy names") {
    check(Prop.forAll(Gen.listOfN(3, messyName)) { names0 =>
      val names = names0.zipWithIndex.map { case (n, i) => s"$n$i" } // unique
      val wide = names.foldLeft(Seq(1).toDF("seed"))((d, n) => d.withColumn(n, lit(1)))
      val once = Cleaning.normalizeColumns(wide).columns.toSeq
      val twice = Cleaning.normalizeColumns(Cleaning.normalizeColumns(wide)).columns.toSeq
      once == twice &&
        once.forall(c => c == c.toLowerCase && !c.exists(_.isWhitespace))
    })
  }

  test("property: numeric coercion is total (never throws; fill-0 never null)") {
    val s = Gen.oneOf(Gen.numStr, Gen.alphaStr, Gen.const(""),
      Gen.const("  12.5  "), Gen.const("1e3"), Gen.const("NaN"), Gen.const("-0.0"))
    check(Prop.forAll(Gen.listOfN(20, s)) { strs =>
      val rows = (strs :+ "sentinel").toDF("s")
        .select(Cleaning.toNumeric($"s").as("d"), Cleaning.toNumericFill0($"s").as("d0"))
        .collect()
      rows.forall(r => !r.isNullAt(1))
    }, trials = 10)
  }

  test("property: keep-first dedup is a subset of input, unique and total on keys") {
    val rowGen = for {
      k <- Gen.choose(0, 5)
      ts <- Gen.choose(0, 100)
      v <- Gen.choose(-1000, 1000)
    } yield (k, ts, v)
    check(Prop.forAll(Gen.nonEmptyListOf(rowGen).map(_.take(60))) { rows =>
      val out = Dedup.keepFirst(rows.toDF("k", "ts", "v"), Seq("k"), Seq($"ts", $"v"))
        .collect()
      val input = rows.toSet
      val keys = out.map(_.getInt(0))
      out.forall(r => input.contains((r.getInt(0), r.getInt(1), r.getInt(2)))) &&
        keys.distinct.length == keys.length &&
        keys.toSet == rows.map(_._1).toSet
    }, trials = 10)
  }

  test("property: composite keys are injective on separator-free tuples") {
    val field = Gen.alphaNumStr.map(_.take(8))
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.zip(field, field)).map(_.take(10))) { pairs =>
      val keys = pairs.toDF("a", "b")
        .select(Derivations.compositeKey($"a", $"b")).collect().map(_.getString(0))
      keys.distinct.length == pairs.distinct.length
    }, trials = 10)
  }
}
