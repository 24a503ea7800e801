package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Design claims behind the x119 trained language-ID gate: the codegen'd
  * bigram-bucket counter matches a naive reference (including non-BMP
  * code points), the feature frame is exact relative frequencies, and
  * the one-vs-rest fit actually LEARNS the marked corpus (high recall
  * per language — far above the 44% majority class). */
class LangIdSpec extends SparkSpec {

  private def naive(s: String, buckets: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    val out = new Array[Long](buckets)
    cps.sliding(2).filter(_.length == 2)
      .foreach(p => out(((p(0) * 31 + p(1)) % buckets + buckets) % buckets) += 1)
    out.toSeq
  }

  test("CharBigramBuckets matches the naive code-point reference, " +
       "including surrogate pairs, empty, and single-char inputs") {
    val cases = Seq("", "a", "ab", "hello world", "der und die",
      "café crème", "a😀b" /* a😀b: 3 code points */)
    cases.foreach { s =>
      val got = graft.functions.CharBigramBuckets
        .count(UTF8String.fromString(s), 32).toSeq
      assert(got == naive(s, 32), s"mismatch on '$s'")
    }
  }

  test("hashedCharBigramFeatures emits exact relative frequencies that " +
       "sum to 1 and drops sub-bigram docs") {
    import spark.implicits._
    val docs = Seq((1L, "x", "abab"), (2L, "y", "z"), (3L, "y", ""))
      .toDF("doc_id", "lang", "text")
    val f = TextOps.hashedCharBigramFeatures(docs, "doc_id", "text", 8,
      carry = Seq("lang"))
    val rows = f.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L),
      "docs without a bigram must drop")
    val feats = (2 until rows.head.length).map(rows.head.getDouble)
    assert(math.abs(feats.sum - 1.0) < 1e-12)
    // "abab" has bigrams ab, ba, ab → one bucket at 2/3, one at 1/3
    assert(feats.sorted.reverse.take(2) == Seq(2.0 / 3, 1.0 / 3))
  }

  test("the one-vs-rest fit learns the marked corpus: every language's " +
       "recall beats 90% (majority class is ~44%)") {
    val conf = graft.queries.TextQueries.queries("x119_langid_train")(
      spark, "/root/testdata/sf0.001").collect()
    assert(conf.length == 5)
    conf.foreach { r =>
      val recall = r.getAs[Long]("recall_ppm")
      assert(recall >= 900000L,
        s"${r.getString(0)} recall $recall ppm — the learner must find " +
          "the marker signal")
    }
  }
}
