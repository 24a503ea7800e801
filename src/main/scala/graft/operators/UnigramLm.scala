package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}

/** Unigram-LM subword tokenizer (Kudo, "Subword Regularization", ACL 2018
  * — the SentencePiece model), the OTHER standard tokenizer family next
  * to BPE ([[BpeTrainer]]): instead of learning merge RULES, learn a
  * piece VOCABULARY with costs and segment by cheapest-path Viterbi.
  *
  * This is the hard-EM (Viterbi-EM) variant on an exact integer lattice,
  * chosen so an external SQL engine replays the whole fit bit-for-bit
  * (the x100 discipline applied to EM):
  *
  *  - piece costs are integer MICRO-NATS: cost = −round(ln((cnt+1)/total)
  *    ·1e6) — the [[Curation]] DSIR lattice; the ln's 1-ulp libm variance
  *    is absorbed by the rounding, and everything downstream is exact
  *    integer arithmetic;
  *  - the E-step segments every DISTINCT WORD by Viterbi over those
  *    integer costs (ties: the SHORTEST last piece wins — the encoded
  *    candidate cost·8+k makes that a plain integer min in the replay);
  *  - the M-step recounts pieces from the segmentations (exact integer
  *    sums weighted by word frequency), prunes multi-char pieces that no
  *    path uses, keeps the single-char alphabet unconditionally (every
  *    word stays segmentable), re-smooths (+1) and re-derives costs.
  *
  * Scale shape (the SentencePiece production split): word counting is
  * ONE corpus pass with map-side combine; EM runs over the DISTINCT-WORD
  * frame (vocabulary-sized, never corpus-sized), each iteration one
  * distributed segment+recount job against the BROADCAST vocab; the
  * vocab itself is bounded driver state (≤ maxPieces + alphabet — the
  * centroid/codebook contract); serving is [[applyUnigramLocal]], a
  * constant-size zero-shuffle plan at any vocab size (the
  * [[BpeTrainer.applyMergesLocal]] seam).
  */
object UnigramLm {

  /** "Single character" everywhere in this file means one CODE POINT
    * (matching SQL `length`/`substr` and the oracle's DP) — a non-BMP
    * alphabet piece is 2 UTF-16 units but must still count as the
    * always-survives single-char class. */
  private def isOneCodePoint(p: String): Boolean =
    p.codePointCount(0, p.length) == 1

  /** Distinct words of the corpus with occurrence counts — the frame EM
    * iterates over. Tokenization is [[TextOps.tokens]] (lowercase,
    * whitespace), shared with every token-level operator. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wn"))

  /** Viterbi segmentation of one word under integer micro-nat piece
    * costs: cheapest total cost; on ties the candidate with the SHORTER
    * last piece wins at every prefix (k ascending, strictly-smaller
    * acceptance). Single characters absent from the vocab cost
    * `unkCostMicro` (a word can always be segmented); multi-char
    * candidates must be vocab members. */
  def viterbiSegment(word: String, cost: collection.Map[String, Long],
                     maxPieceLen: Int, unkCostMicro: Long): Seq[String] = {
    // the DP steps CODE POINTS, not UTF-16 units: the vocabulary, the
    // maxWordLen guard (Spark `length()`), and the oracle's per-position
    // substr/len DP are all code-point based — a code-unit DP would cut
    // any non-BMP character into lone surrogates, miss every vocabulary
    // piece containing it, and silently diverge from the replay
    val cps = word.codePoints().toArray
    val n = cps.length
    if (n == 0) return Nil
    def slice(from: Int, until: Int): String =
      new String(cps, from, until - from)
    val dp = Array.fill(n + 1)(Long.MaxValue)
    val bp = new Array[Int](n + 1)
    dp(0) = 0L
    var j = 1
    while (j <= n) {
      var k = 1
      val kMax = math.min(j, maxPieceLen)
      while (k <= kMax) {
        if (dp(j - k) != Long.MaxValue) {
          val piece = slice(j - k, j)
          val c =
            if (k == 1) cost.getOrElse(piece, unkCostMicro)
            else cost.getOrElse(piece, -1L)
          if (c >= 0L && dp(j - k) + c < dp(j)) {
            dp(j) = dp(j - k) + c
            bp(j) = k
          }
        }
        k += 1
      }
      j += 1
    }
    val out = List.newBuilder[String]
    val stack = collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) { stack += slice(p - bp(p), p); p -= bp(p) }
    stack.reverseIterator.foreach(out += _)
    out.result()
  }

  /** One E-step over the distinct-word frame: segment every word with
    * the broadcast costs, emit (piece, word-count) pairs, sum — the
    * piece counts of the current model's one-best segmentations. */
  private def viterbiCounts(words: DataFrame, cost: Map[String, Long],
                            maxPieceLen: Int,
                            unkCostMicro: Long): DataFrame = {
    val bc = words.sparkSession.sparkContext.broadcast(cost)
    val schema = StructType(Seq(
      StructField("piece", StringType, nullable = false),
      StructField("n", LongType, nullable = false)))
    words.select(col("word"), col("wn"))
      .mapPartitions { it =>
        val c = bc.value
        it.flatMap { r =>
          val wn = r.getLong(1)
          viterbiSegment(r.getString(0), c, maxPieceLen, unkCostMicro)
            .map(p => Row(p, wn))
        }
      }(Encoders.row(schema))
      .groupBy("piece").agg(sum(col("n")).as("cnt"))
  }

  /** Micro-nat costs from smoothed counts: −round(ln((cnt+1)/total)·1e6)
    * with total = Σ(cnt+1) over the vocab — all-integer outputs. */
  private def costsOf(counts: Seq[(String, Long)]): Seq[(String, Long, Long)] = {
    val total = counts.iterator.map(_._2 + 1L).sum
    counts.map { case (p, c) =>
      val sm = c + 1L
      (p, sm, -math.round(math.log(sm.toDouble / total) * 1e6))
    }
  }

  /** The seed vocabulary: every substring of length 1..maxPieceLen of
    * every distinct word, weighted by word frequency; the multi-char
    * candidates cut to the `maxPieces` most frequent (ties: piece ASC),
    * the single-char alphabet kept in full. Returns (piece, cnt) —
    * bounded driver state. */
  def seedVocab(words: DataFrame, maxPieceLen: Int,
                maxPieces: Int): Seq[(String, Long)] = {
    val subs = words.select(col("wn"),
        explode(flatten(transform(
          sequence(lit(1), length(col("word"))),
          i => transform(
            sequence(lit(1), least(lit(maxPieceLen),
              length(col("word")) - i + 1)),
            k => col("word").substr(i, k))))).as("piece"))
      .groupBy("piece").agg(sum(col("wn")).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val (chars, multi) = subs.partition(p => isOneCodePoint(p._1))
    val kept = multi.sortBy { case (p, c) => (-c, p) }.take(maxPieces)
    (chars ++ kept).sortBy(_._1).toSeq
  }

  /** The full hard-EM fit: seed → `iters` × (Viterbi E-step over the
    * distinct-word frame, integer recount, prune-unused-multis, +1
    * smoothing, micro-nat costs). Returns the final vocabulary
    * (piece, smoothed count, cost_micro) sorted by piece — bounded
    * driver state, ready for [[writeVocab]]. */
  def fitViterbiEm(words: DataFrame, maxPieceLen: Int, maxPieces: Int,
                   iters: Int, unkCostMicro: Long,
                   maxWordLen: Int): Seq[(String, Long, Long)] = {
    require(iters >= 1, "at least one EM iteration")
    val tooLong = words.filter(length(col("word")) > maxWordLen).count()
    require(tooLong == 0L,
      s"$tooLong word(s) exceed maxWordLen=$maxWordLen — the oracle's " +
        "unrolled DP cannot replay them")
    var vocab = costsOf(seedVocab(words, maxPieceLen, maxPieces))
    for (_ <- 1 to iters) {
      val counted = viterbiCounts(words,
        vocab.map(v => v._1 -> v._3).toMap, maxPieceLen, unkCostMicro)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      // prune multis no path uses; the single-char alphabet always
      // survives (count 0 → smoothing keeps it alive), so every word
      // stays segmentable
      val kept = vocab.map(_._1).filter(p =>
        isOneCodePoint(p) || counted.getOrElse(p, 0L) > 0L)
      vocab = costsOf(kept.sorted.map(p => (p, counted.getOrElse(p, 0L))))
    }
    vocab
  }

  def writeVocab(spark: org.apache.spark.sql.SparkSession,
                 vocab: Seq[(String, Long, Long)], path: String): Unit = {
    import spark.implicits._
    vocab.toDF("piece", "cnt", "cost_micro")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def readVocab(spark: org.apache.spark.sql.SparkSession,
                path: String): Seq[(String, Long, Long)] =
    spark.read.parquet(path).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  /** Tokenizer SERVING off a stored unigram vocabulary — the
    * [[BpeTrainer.applyMergesLocal]] contract: one narrow zero-shuffle
    * mapPartitions over (id, tokens), the vocab in one Broadcast, a
    * constant-size plan at any vocab size; per document one Viterbi DP
    * per word (O(len·maxPieceLen) hash lookups). Output matches the BPE
    * applier's shape: (id, n_pieces, piece_fp — sha256 over the
    * unit-separator-joined pieces of the whole document, words in
    * order), so one mis-segmented word anywhere flips the hash. */
  /** [[applyUnigramLocal]] with BYTE FALLBACK — SentencePiece's
    * production zero-UNK contract: the Viterbi DP runs unchanged (an
    * out-of-vocabulary single character still segments as one piece at
    * `unkCostMicro`), and each OOV piece then decomposes into its UTF-8
    * `<0xNN>` byte tokens ([[TextOps.byteFallbackTokens]] — a closed
    * 256-symbol alphabet the stored vocab implicitly reserves), so
    * EVERY emitted token is a vocab member or a byte symbol — a
    * held-out-script document tokenizes with 100% coverage instead of
    * leaking raw unknown characters to the id-mapping layer (where an
    * unmapped piece is a crash or a silent UNK bucket). Output adds
    * `n_fallback` (byte tokens emitted) and `all_covered` (measured,
    * not assumed: every final piece ∈ vocab ∪ byte alphabet); the
    * piece_fp hashes the POST-fallback sequence, so the expansion
    * itself is oracle-pinned. */
  def applyUnigramByteFallback(df: DataFrame, idCol: String, textCol: String,
                               vocab: Seq[(String, Long, Long)],
                               maxPieceLen: Int,
                               unkCostMicro: Long): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(
      vocab.map(v => v._1 -> v._3).toMap)
    val toked =
      df.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("__tk"))
    val outSchema = StructType(Seq(
      toked.schema("id"),
      StructField("n_pieces", LongType, nullable = false),
      StructField("n_fallback", LongType, nullable = false),
      StructField("all_covered", BooleanType, nullable = false),
      StructField("piece_fp", StringType, nullable = false)))
    toked.mapPartitions { it =>
      val cost = bc.value
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        val toks: Seq[String] =
          if (r.isNullAt(1)) Nil else r.getSeq[String](1)
        val pieces = toks.flatMap(
            viterbiSegment(_, cost, maxPieceLen, unkCostMicro))
          .flatMap(p =>
            if (cost.contains(p)) Seq(p) else TextOps.byteFallbackTokens(p))
        val nFb = pieces.count(TextOps.isByteFallbackToken)
        val covered = pieces.forall(p =>
          cost.contains(p) || TextOps.isByteFallbackToken(p))
        val digest = md.digest(pieces.mkString("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        Row(r.get(0), pieces.length.toLong, nFb.toLong, covered,
          digest.map("%02x".format(_)).mkString)
      }
    }(Encoders.row(outSchema))
  }

  def applyUnigramLocal(df: DataFrame, idCol: String, textCol: String,
                        vocab: Seq[(String, Long, Long)], maxPieceLen: Int,
                        unkCostMicro: Long): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(
      vocab.map(v => v._1 -> v._3).toMap)
    val toked =
      df.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("__tk"))
    val outSchema = StructType(Seq(
      toked.schema("id"),
      StructField("n_pieces", LongType, nullable = false),
      StructField("piece_fp", StringType, nullable = false)))
    toked.mapPartitions { it =>
      val cost = bc.value
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        val toks: Seq[String] =
          if (r.isNullAt(1)) Nil else r.getSeq[String](1)
        val pieces = toks.flatMap(
          viterbiSegment(_, cost, maxPieceLen, unkCostMicro))
        val digest = md.digest(pieces.mkString("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        Row(r.get(0), pieces.length.toLong,
          digest.map("%02x".format(_)).mkString)
      }
    }(Encoders.row(outSchema))
  }
}
