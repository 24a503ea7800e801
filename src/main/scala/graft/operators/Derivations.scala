package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Derived-column functions (SURVEY.md §2.3 D1-D4).
  *
  * All pure `Column => Column` built-ins — none of the reference's scalar
  * `.apply` lambdas needs a UDF in Spark, which keeps every derivation inside
  * whole-stage codegen.
  */
object Derivations {

  /** D1: amount binning, `pd.cut(bins=[0,1e4,1e5,5e5,inf])`
    * (pac_data_processor.py:45-49).
    *
    * pd.cut intervals are RIGHT-closed: (0,10000] → Small, (10000,100000] →
    * Medium, (100000,500000] → Large, (500000,inf) → Very Large; values ≤ 0
    * (and null) → null. `Bucketizer` is left-closed so a `when` chain is the
    * correct mapping (SURVEY.md §7.4(1)).
    */
  def amountCategory(amount: Column): Column =
    when(amount.isNull || amount <= 0, lit(null))
      .when(amount <= 10000, "Small (<$10K)")
      .when(amount <= 100000, "Medium ($10K-$100K)")
      .when(amount <= 500000, "Large ($100K-$500K)")
      .otherwise("Very Large (>$500K)")

  /** D2: company-type classification
    * (`'Tech' if ticker in {MSFT,NVDA,TSLA} else 'Other'`,
    * pac_data_processor.py:52). */
  def companyType(ticker: Column, tech: Seq[String] = Seq("MSFT", "NVDA", "TSLA")): Column =
    when(ticker.isin(tech: _*), "Tech").otherwise("Other")

  /** D3: party keyword classification (pac_snowflake_realtime.py:103-114).
    * Republican keywords are checked BEFORE democrat keywords — a name
    * containing both counts republican (SURVEY.md §7.4(6)). Unmatched names
    * yield null (the reference skips them). */
  val RepublicanKeywords = Seq("republican", "gop", "conservative")
  val DemocratKeywords   = Seq("democrat", "democratic", "liberal", "progressive")

  def partyClass(committeeName: Column): Column = {
    val lc = lower(committeeName)
    val isRep = RepublicanKeywords.map(k => lc.contains(k)).reduce(_ || _)
    val isDem = DemocratKeywords.map(k => lc.contains(k)).reduce(_ || _)
    when(isRep, "republican").when(isDem, "democrat").otherwise(lit(null))
  }

  /** D4: composite dedup key — `_`-joined key fields
    * (pac_data_processor.py:174-178; generic variant
    * pac_snowflake_pipeline.py:224-231). */
  def compositeKey(cols: Column*): Column =
    concat_ws("_", cols.map(_.cast("string")): _*)
}
