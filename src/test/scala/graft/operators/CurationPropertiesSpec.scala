package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants for the curation suite: nested sampling,
  * skew-safe cap equivalence, shuffle bijection, packing budget bounds.
  * Raw ScalaCheck, bounded Spark jobs per property (same idiom as
  * [[CleaningPropertiesSpec]]). */
class CurationPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, trials: Int = 8): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(trials), p)
    assert(res.passed, res.status.toString)
  }

  private val idsGen: Gen[List[Long]] =
    Gen.chooseNum(20, 120).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 100000L))).map(_.distinct)

  test("property: hash-bucket samples are NESTED — rate r1 <= r2 implies subset") {
    // The defining property of deterministic hash sampling: raising the
    // rate only ADDS rows, so a 1% sample is always inside the 10% sample
    // (rerunnable experiments at growing scale).
    val gen = for {
      ids <- idsGen
      r1 <- Gen.chooseNum(0, 1000)
      r2 <- Gen.chooseNum(0, 1000)
    } yield (ids, math.min(r1, r2), math.max(r1, r2))
    check(Prop.forAll(gen) { case (ids, lo, hi) =>
      val df = ids.map((_, "s")).toDF("id", "grp")
      def kept(rate: Int) =
        Curation.stratifiedSample(df, "grp", "id", Map.empty, rate)
          .select("id").collect().map(_.getLong(0)).toSet
      kept(lo).subsetOf(kept(hi))
    })
  }

  test("property: quotaCapSkewSafe AND quotaCapNative select exactly quotaCap's rows") {
    val gen = for {
      rows <- Gen.chooseNum(10, 80).flatMap(n => Gen.listOfN(n, for {
        id <- Gen.chooseNum(0L, 10000L)
        g <- Gen.oneOf("a", "b", "c")
      } yield (id, g)))
      k <- Gen.chooseNum(1, 8)
      salts <- Gen.chooseNum(1, 5)
    } yield (rows.distinctBy(_._1), k, salts)
    check(Prop.forAll(gen) { case (rows, k, salts) =>
      val df = rows.toDF("id", "grp")
      def ids(d: org.apache.spark.sql.DataFrame) =
        d.select("id").collect().map(_.getLong(0)).toSet
      val base = ids(Curation.quotaCap(df, "grp", "id", k))
      base == ids(Curation.quotaCapSkewSafe(df, "grp", "id", k, salts)) &&
        base == ids(Curation.quotaCapNative(df, "grp", "id", k))
    })
  }

  test("property: shardedShuffle is a bijection onto (shard, 1..shardSize)") {
    val gen = for {
      ids <- idsGen
      shards <- Gen.chooseNum(1, 6)
    } yield (ids, shards)
    check(Prop.forAll(gen) { case (ids, shards) =>
      val out = Curation.shardedShuffle(ids.toDF("id"), "id", shards)
        .select("id", "shard", "pos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      out.length == ids.size &&
        out.map(_._1).toSet == ids.toSet &&
        out.groupBy(_._2).values.forall { rows =>
          rows.map(_._3).sorted.toSeq == (1L to rows.length.toLong)
        }
    })
  }

  test("property: packing never overfills except the row that closes a bin") {
    val gen = for {
      rows <- Gen.chooseNum(5, 60).flatMap(n => Gen.listOfN(n, for {
        id <- Gen.chooseNum(0L, 10000L)
        sz <- Gen.chooseNum(1L, 900L)
      } yield (id, sz)))
      budget <- Gen.chooseNum(500L, 2000L)
    } yield (rows.distinctBy(_._1), budget)
    check(Prop.forAll(gen) { case (rows, budget) =>
      val bins = Curation.packSequences(rows.toDF("id", "n"), "id", "n", budget, 2)
        .groupBy("shard", "bin")
        .agg(sum("n").as("total"), max("n").as("mx"), count(lit(1)).as("cnt"))
        .collect()
      val totalRows = bins.map(_.getLong(4)).sum
      totalRows == rows.size && bins.forall { r =>
        val (total, mx, cnt) = (r.getLong(2), r.getLong(3), r.getLong(4))
        total <= budget || total - mx < budget || cnt == 1L
      }
    })
  }
}
