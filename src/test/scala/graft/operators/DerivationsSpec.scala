package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D1-D4: binning boundary semantics (pd.cut right-closed), classifier
  * precedence, composite keys — FIXTURES.md §3 edge cases. */
class DerivationsSpec extends SparkSpec {
  import spark.implicits._

  test("amount binning reproduces pd.cut right-closed edges") {
    val cases = Seq(
      (-5.0, null), (0.0, null),                       // ≤ 0 → null
      (0.01, "Small (<$10K)"), (10000.0, "Small (<$10K)"),      // (0, 1e4]
      (10000.01, "Medium ($10K-$100K)"), (100000.0, "Medium ($10K-$100K)"),
      (100000.01, "Large ($100K-$500K)"), (500000.0, "Large ($100K-$500K)"),
      (500000.01, "Very Large (>$500K)"))
    val out = cases.map(_._1).toDF("amount")
      .select($"amount", Derivations.amountCategory($"amount").as("cat"))
      .collect().map(r => r.getDouble(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toMap
    cases.foreach { case (amt, expected) => assert(out(amt) === expected, s"amount $amt") }
  }

  test("null amount bins to null") {
    val out = Seq[Option[Double]](None).toDF("amount")
      .select(Derivations.amountCategory($"amount")).head
    assert(out.isNullAt(0))
  }

  test("party classifier: republican keywords take precedence over democrat") {
    val cases = Seq(
      ("Democrats for Conservative Values", "republican"), // both → republican
      ("GOP Victory Fund", "republican"),
      ("Progressive Future PAC", "democrat"),
      ("LIBERAL ACTION NETWORK", "democrat"),              // case-insensitive
      ("Neutral Business Alliance", null))
    val out = cases.map(_._1).toDF("name")
      .select($"name", Derivations.partyClass($"name").as("p"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toMap
    cases.foreach { case (n, expected) => assert(out(n) === expected, s"name $n") }
  }

  test("company type classification matches reference semantics") {
    val out = Seq("MSFT", "NVDA", "AAPL").toDF("t")
      .select(Derivations.companyType($"t").as("c")).collect().map(_.getString(0))
    assert(out.toSeq === Seq("Tech", "Tech", "Other"))
  }

  test("composite key joins fields with underscore, casting to string") {
    val out = Seq(("AAPL", 2024, 25000.5))
      .toDF("ticker", "cycle", "amount")
      .select(Derivations.compositeKey($"ticker", $"cycle", $"amount")).head.getString(0)
    assert(out === "AAPL_2024_25000.5")
  }
}
