package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (engine extension): a rule set evaluated
  * into one (rule, n_violations) report — the contract-enforcement layer a
  * production pipeline runs before publishing a snapshot.
  *
  * Scale shape: every row-local rule ([[notNull]], [[inRange]], [[matches]])
  * folds into a SINGLE conditional-sum aggregation pass over the table
  * (one scan, map-side partials, no shuffle beyond the 1-row rollup);
  * [[uniqueKey]] adds one keyed distinct, and [[refIntegrity]] one
  * left-anti join per referenced dimension (broadcast when small). Rules
  * never collect data — a report row is (name, count).
  */
object Quality {

  /** A named predicate whose FAILURES are counted. */
  final case class Rule(name: String, violation: Column)

  def notNull(c: String): Rule =
    Rule(s"not_null($c)", col(c).isNull)

  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"in_range($c)", col(c).isNotNull && !(col(c) >= lo && col(c) <= hi))

  def matches(c: String, pattern: String): Rule =
    Rule(s"matches($c)", col(c).isNotNull && !col(c).rlike(pattern))

  /** Row-local rules → one aggregation pass: each rule is a conditional sum.
    * Rules are aliased positionally (`__r0`…) through the wide row — rule
    * names carry parentheses, which column resolution would mis-parse —
    * and mapped back to names in the long form. */
  def rowChecks(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val sums = rules.zipWithIndex.map { case (r, i) =>
      sum(when(r.violation, 1L).otherwise(0L)).as(s"__r$i")
    }
    val wide = df.agg(sums.head, sums.tail: _*)
    val names = map(rules.zipWithIndex.flatMap { case (r, i) =>
      Seq(lit(s"__r$i"), lit(r.name))
    }: _*)
    // wide (1 row, |rules| cols) → long (rule, n_violations)
    wide.unpivot(Array.empty[Column],
        rules.indices.map(i => col(s"__r$i")).toArray, "rule", "n_violations")
      .withColumn("rule", element_at(names, col("rule")))
  }

  /** Key-uniqueness check: #rows − #distinct keys (0 ⇔ unique). */
  def uniqueKey(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val name = s"unique_key(${keyCols.mkString(",")})"
    df.agg((count(lit(1)) -
        count_distinct(struct(keyCols.map(col): _*))).as("n_violations"))
      .select(lit(name).as("rule"), col("n_violations"))
  }

  /** Referential integrity: fact keys absent from the dimension (nulls are
    * not violations — compose with [[notNull]] to forbid them). The anti
    * join broadcasts a small dimension; at scale both sides hash-partition
    * on the key. */
  def refIntegrity(fact: DataFrame, factKey: String,
                   dim: DataFrame, dimKey: String): DataFrame = {
    val name = s"ref_integrity($factKey->$dimKey)"
    fact.filter(col(factKey).isNotNull)
      .join(dim.select(col(dimKey).as(factKey)), Seq(factKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("rule"), col("n_violations"))
  }

  /** A full report: row rules in one pass + key/reference checks, unioned. */
  def report(df: DataFrame, rowRules: Seq[Rule],
             keyCols: Option[Seq[String]] = None,
             refs: Seq[(String, DataFrame, String)] = Nil): DataFrame = {
    val parts =
      (if (rowRules.nonEmpty) Seq(rowChecks(df, rowRules)) else Nil) ++
        keyCols.map(k => uniqueKey(df, k)).toSeq ++
        refs.map { case (fk, dim, dk) => refIntegrity(df, fk, dim, dk) }
    require(parts.nonEmpty, "at least one check")
    parts.reduce(_ unionByName _)
  }

  /** Z-score standardization of numeric feature columns — the
    * normalization pass before training a (quality) classifier on
    * per-document features: ONE aggregate computes every column's mean
    * and population stddev in a single codegen'd pass, broadcasts back
    * as a 1-row frame, and each row standardizes with no second shuffle —
    * the same measure-then-broadcast shape as percentile binning, never a
    * per-column pass or a sort. Adds `z_<col>` per input column (round
    * `precision` so an external replay of the same arithmetic agrees);
    * constant columns (stddev 0) map to 0 rather than NaN; null features
    * stay null. */
  def standardize(df: DataFrame, cols: Seq[String],
                  precision: Int = 4): DataFrame = {
    require(cols.nonEmpty, "at least one feature column")
    val clash = cols.map("z_" + _).filter(df.columns.contains)
    require(clash.isEmpty, s"output column(s) already present: ${clash.mkString(", ")}")
    val aggs = cols.flatMap(c =>
      Seq(avg(col(c)).as(s"__m_$c"), stddev_pop(col(c)).as(s"__s_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    cols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"z_$c",
        round(when(col(s"__s_$c") === 0, lit(0.0))
          .otherwise((col(c) - col(s"__m_$c")) / col(s"__s_$c")), precision))
    }.drop(cols.flatMap(c => Seq(s"__m_$c", s"__s_$c")): _*)
  }

  /** Fixed-weight linear quality scorer — the inference half of the
    * fastText/CCNet-style quality classifier whose training input
    * [[standardize]] builds: score = sigmoid(w · features + b), gate at
    * `threshold` on the ROUNDED score (both engines compare the same
    * 6-decimal value, so the boundary cannot flip on a ulp). Weights are
    * an ORDERED Seq, not a Map: the dot product folds left in the given
    * order so an external engine replaying the identical float addition
    * sequence agrees bit-for-bit before rounding. Null features
    * contribute 0 — in z-space that is the mean, so a short document
    * missing its bigram signal scores on its remaining features instead
    * of nulling out. Everything is one row-local codegen'd expression:
    * zero shuffles, scoring 100 TB is exactly one scan. */
  def scoreLinear(df: DataFrame, weights: Seq[(String, Double)],
                  bias: Double, threshold: Double = 0.5): DataFrame = {
    require(weights.nonEmpty, "at least one weight")
    require(!df.columns.contains("quality_score") &&
      !df.columns.contains("quality_pass"), "output columns already present")
    val dot = weights.map { case (c, w) =>
      coalesce(col(c), lit(0.0)) * lit(w)
    }.reduce(_ + _) + lit(bias)
    df.withColumn("quality_score",
        round(lit(1.0) / (lit(1.0) + exp(-dot)), 6))
      .withColumn("quality_pass", col("quality_score") >= threshold)
  }
}
