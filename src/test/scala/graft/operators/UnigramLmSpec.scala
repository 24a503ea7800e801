package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Design claims behind the x120/x121 unigram-LM gates: Viterbi picks
  * the cheapest segmentation with the shortest-last-piece tie rule,
  * unknown characters stay segmentable at the penalty cost, EM prunes
  * pieces no path uses while the alphabet survives, and the stored-vocab
  * applier equals a direct re-segmentation of the corpus. */
class UnigramLmSpec extends SparkSpec {

  private val Unk = 30000000L

  test("viterbiSegment picks the cheapest split; ties prefer the " +
       "shorter last piece") {
    val cost = Map("a" -> 10L, "b" -> 10L, "ab" -> 15L, "abb" -> 40L)
    // "ab" as one piece (15) beats a+b (20)
    assert(UnigramLm.viterbiSegment("ab", cost, 4, Unk) == Seq("ab"))
    // abb: ab+b (25) beats abb (40) and a+b+b (30)
    assert(UnigramLm.viterbiSegment("abb", cost, 4, Unk) == Seq("ab", "b"))
    // tie: with ab == a+b exactly, the shorter last piece wins → a, b
    val tie = Map("a" -> 10L, "b" -> 10L, "ab" -> 20L)
    assert(UnigramLm.viterbiSegment("ab", tie, 4, Unk) == Seq("a", "b"))
    // unknown char: penalty keeps the word segmentable
    assert(UnigramLm.viterbiSegment("axb", cost, 4, Unk) ==
      Seq("a", "x", "b"))
    assert(UnigramLm.viterbiSegment("", cost, 4, Unk) == Nil)
  }

  test("EM keeps the alphabet, prunes unused multi-char pieces, and " +
       "the piece counts stay exact integers") {
    import spark.implicits._
    val docs = Seq((1L, "abab abab cd"), (2L, "abab cd cd"))
      .toDF("doc_id", "text")
    val words = UnigramLm.wordCounts(docs, "text")
    val vocab = UnigramLm.fitViterbiEm(words, 4, 8, 2, Unk, 12)
    val pieces = vocab.map(_._1).toSet
    assert(Set("a", "b", "c", "d").subsetOf(pieces),
      "the alphabet must survive every iteration")
    // every multi-char survivor was actually used by some Viterbi path
    // under the FINAL costs (a pruning regression would leave stale
    // multis the paths no longer touch)
    val costs = vocab.map(v => v._1 -> v._3).toMap
    val used = words.collect().flatMap(r =>
      UnigramLm.viterbiSegment(r.getString(0), costs, 4, Unk)).toSet
    vocab.filter(_._1.length > 1).foreach { case (p, _, _) =>
      assert(used.contains(p), s"stale multi-char piece $p survived pruning")
    }
    // "abab" should compress below character level
    val seg = UnigramLm.viterbiSegment("abab", costs, 4, Unk)
    assert(seg.length < 4, s"EM failed to learn any compression: $seg")
  }

  test("the stored-vocab local applier equals direct re-segmentation " +
       "and hashes the full piece sequence") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001")
      .documents.limit(50)
    val words = UnigramLm.wordCounts(docs, "text")
    val vocab = UnigramLm.fitViterbiEm(words, 4, 16, 1, Unk, 12)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-unigram-vocab").toString
    UnigramLm.writeVocab(spark, vocab, dir)
    val back = UnigramLm.readVocab(spark, dir)
    assert(back == vocab, "vocab must round-trip exactly through parquet")
    val applied = UnigramLm.applyUnigramLocal(docs, "doc_id", "text",
      back, 4, Unk).collect().map(r => (r.getLong(0), r.getLong(1),
      r.getString(2))).sortBy(_._1)
    val costs = vocab.map(v => v._1 -> v._3).toMap
    val expected = docs.select(col("doc_id"),
        TextOps.tokens(col("text")).as("tk")).collect()
      .map { r =>
        val pieces = r.getSeq[String](1).flatMap(
          UnigramLm.viterbiSegment(_, costs, 4, Unk))
        val md = java.security.MessageDigest.getInstance("SHA-256")
        val fp = md.digest(pieces.mkString("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString
        (r.getLong(0), pieces.length.toLong, fp)
      }.sortBy(_._1)
    assert(applied.toSeq == expected.toSeq)
  }

  test("viterbiSegment steps CODE POINTS: non-BMP characters segment as " +
       "single characters, never lone surrogates") {
    val emoji = new String(Character.toChars(0x1F600)) // 1 cp, 2 units
    val cost = Map("a" -> 10L, "b" -> 10L)
    val segs = UnigramLm.viterbiSegment(s"a${emoji}b", cost, 4, 1000000L)
    assert(segs.length == 3, s"expected 3 pieces, got $segs")
    assert(segs(1) == emoji,
      "the non-BMP char must be one unk single-char piece")
    assert(segs.forall(p => !p.exists(c =>
      Character.isSurrogate(c) && p.codePointCount(0, p.length) == p.length)),
      "no piece may be a lone surrogate")
    // a vocab piece CONTAINING a non-BMP char must match as a unit
    val cost2 = cost + (s"a$emoji" -> 5L)
    assert(UnigramLm.viterbiSegment(s"a${emoji}b", cost2, 4, 1000000L)
      == Seq(s"a$emoji", "b"))
  }
  test("byte fallback: OOV pieces expand to <0xNN> UTF-8 byte tokens " +
       "(non-BMP = 4 bytes), coverage is total, vocab pieces untouched") {
    import graft.operators.TextOps
    assert(TextOps.byteFallbackTokens("\u00e9") == Seq("<0xC3>", "<0xA9>"))
    assert(TextOps.byteFallbackTokens(new String(Character.toChars(0x1F600)))
      .length == 4)
    assert(TextOps.isByteFallbackToken("<0xC3>"))
    assert(!TextOps.isByteFallbackToken("<0xg3>"))
    assert(!TextOps.isByteFallbackToken("plain"))
    import spark.implicits._
    val docs = Seq((1L, "aa ab \u03b1\u03b2"), (2L, "aa aa"))
      .toDF("doc_id", "text")
    val words = UnigramLm.wordCounts(docs.filter($"doc_id" === 2L), "text")
    val vocab = UnigramLm.fitViterbiEm(words, 4, 8, 1, 30000000L, 12)
    val out = UnigramLm.applyUnigramByteFallback(
      docs, "doc_id", "text", vocab, 4, 30000000L)
      .collect().sortBy(_.getLong(0))
    assert(out.forall(_.getBoolean(3)), "coverage must be total")
    // doc 1: 'b' and the Greek chars are OOV -> byte tokens appear
    assert(out(0).getLong(2) > 0, "OOV content must emit fallback bytes")
    // doc 2: all in-vocab -> zero fallback
    assert(out(1).getLong(2) == 0L)
  }
}
