package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[Verify.materializeSharedCtes]] — the oracle-dump planner hint that
  * keeps the DuckDB replay inside the driver's budget (round-17's
  * artifact died to replay cost). The transform must mark EXACTLY the
  * multi-referenced CTE definitions, never WINDOW definitions, never
  * references, and must be idempotent — a wrong rewrite here corrupts
  * every oracle at once. */
class VerifySpec extends AnyFunSuite {

  test("multi-referenced CTEs get MATERIALIZED; single-referenced stay inlined") {
    val sql =
      """WITH shared AS (SELECT 1 AS x),
        |once AS (SELECT x FROM shared),
        |twice AS (SELECT x FROM shared)
        |SELECT * FROM once JOIN twice USING (x)""".stripMargin
    val out = Verify.materializeSharedCtes(sql)
    assert(out.contains("shared AS MATERIALIZED ("))
    assert(out.contains("once AS (")) // referenced once: untouched
    assert(out.contains("twice AS ("))
  }

  test("qualified references (q.col) count as references") {
    val sql =
      """WITH q AS (SELECT 1 AS qid),
        |a AS (SELECT q.qid FROM q),
        |b AS (SELECT q.qid FROM q)
        |SELECT * FROM a JOIN b USING (qid)""".stripMargin
    val out = Verify.materializeSharedCtes(sql)
    assert(out.contains("q AS MATERIALIZED ("))
  }

  test("WINDOW definitions are never touched, even when the window name " +
       "is referenced many times") {
    val sql =
      """WITH seq AS (SELECT 1 AS a)
        |SELECT sum(a) OVER w, avg(a) OVER w, min(a) OVER w
        |FROM seq WINDOW w AS (ORDER BY a)""".stripMargin
    val out = Verify.materializeSharedCtes(sql)
    assert(out.contains("WINDOW w AS ("))
    assert(!out.contains("WINDOW w AS MATERIALIZED"))
  }

  test("idempotent: already-MATERIALIZED CTEs are not re-marked") {
    val sql =
      """WITH shared AS MATERIALIZED (SELECT 1 AS x),
        |a AS (SELECT x FROM shared), b AS (SELECT x FROM shared)
        |SELECT * FROM a JOIN b USING (x)""".stripMargin
    val once = Verify.materializeSharedCtes(sql)
    assert(once == sql)
    val plain =
      """WITH s AS (SELECT 1 AS x), a AS (SELECT x FROM s),
        |b AS (SELECT x FROM s) SELECT * FROM a JOIN b USING (x)""".stripMargin
    assert(Verify.materializeSharedCtes(Verify.materializeSharedCtes(plain))
      == Verify.materializeSharedCtes(plain))
  }

  test("a name that prefixes another name is not rewritten at the longer " +
       "name's sites") {
    val sql =
      """WITH c AS (SELECT 1 AS x),
        |c2 AS (SELECT x FROM c),
        |u AS (SELECT x FROM c UNION ALL SELECT x FROM c2)
        |SELECT * FROM u JOIN c2 USING (x)""".stripMargin
    val out = Verify.materializeSharedCtes(sql)
    // c: def + 2 refs -> marked; c2: def + 2 refs -> marked, and the
    // \b boundaries keep the two rewrites from colliding
    assert(out.contains("c AS MATERIALIZED (SELECT 1"))
    assert(out.contains("c2 AS MATERIALIZED (SELECT x FROM c)"))
  }

  test("over the real oracle suite the transform only ever inserts " +
       "MATERIALIZED markers — stripping them recovers the input exactly") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val out = Verify.materializeSharedCtes(sql)
      assert(out.replace(" AS MATERIALIZED (", " AS (")
        == sql.replace(" AS MATERIALIZED (", " AS ("),
        s"$name: transform changed more than CTE markers")
    }
  }
}
