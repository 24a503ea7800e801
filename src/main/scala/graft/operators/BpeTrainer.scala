package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}

/** BPE merge-rule learning over the corpus's token sequences — the
  * tokenizer-TRAINING arrow of the pipeline (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016 §3.2;
  * the reference pipeline only APPLIES a fixed tokenization — learning the
  * vocabulary from the corpus is the step upstream of every token-budget
  * operator in this suite). Symbols here are whitespace tokens and a merge
  * joins two adjacent symbols with a space ("new" + "york" → "new york"),
  * i.e. the word-level variant that mines multi-word expressions; the
  * character-level variant is the same recurrence with a different initial
  * alphabet.
  *
  * Per iteration: count adjacent symbol pairs corpus-wide, pick the most
  * frequent (ties broken lexicographically — determinism the oracle
  * replays), merge its non-overlapping occurrences GREEDILY LEFT TO RIGHT
  * (the reference BPE semantics), re-number positions, repeat. Greedy
  * matters only when the pair is a symbol with itself: inside a maximal
  * run of that symbol, occurrences at odd in-run ranks merge and the rest
  * are consumed — which is exactly how the position formulation expresses
  * it, with no sequential per-document scan:
  *   runId = pos − rank-of-pos-among-this-symbol's-rows (gaps & islands),
  *   mergeStart = (sym,next)==(a,b) ∧ (a≠b ∨ in-run rank is odd),
  *   consumed  = previous row was a mergeStart.
  *
  * Scale shape: the corpus stays EXPLODED in long format (id, pos, sym)
  * across iterations — one explode total, then per iteration two
  * id-partitioned window passes, one pair-count aggregation (map-side
  * partials; pair vocabulary, not corpus, crosses the wire) and ONE
  * driver-side row (the argmax pair — the Lloyd-iteration pattern). Each
  * iteration local-checkpoints so the plan stays shallow over any
  * iteration count. Production tokenizer training runs on a bounded
  * sample of the corpus (hash-stratified, see Curation.stratifiedSample)
  * — the recurrence is the same; the gate trains on the whole table.
  *
  * Returns one row per iteration:
  *   (it, sym_a, sym_b, pair_n, n_merged)
  * where pair_n is the winning pair's corpus count at selection time and
  * n_merged the occurrences actually merged (< pair_n when occurrences
  * overlap inside same-symbol runs). */
object BpeTrainer {

  private val wSeq = Window.partitionBy("id").orderBy("pos")

  /** Corpus in long format: (id, pos, sym), pos 0-based and dense. */
  private def explodeTokens(df: DataFrame, idCol: String,
                            textCol: String): DataFrame =
    df.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("__tk"))
      .select(col("id"), posexplode(col("__tk")).as(Seq("pos", "sym")))

  /** Flag one rule's greedy merges over a long-format corpus: adds
    * `nsym`, `mstart` (this row starts a merge) and `consumed` (this row
    * was absorbed by its predecessor's merge). */
  private def flagMerges(seqs: DataFrame, a: String, b: String): DataFrame = {
    val adjacent = (col("sym") === a) && (col("nsym") === b)
    // the gaps-and-islands run machinery (two extra (id,sym[,runid])
    // sorts) only exists when the pair can overlap itself — dispatched at
    // plan-build time, so the common a≠b rule costs just the
    // sequence-order windows
    val flagged =
      if (a == b) {
        val wRun = Window.partitionBy("id", "sym").orderBy("pos")
        val wInRun = Window.partitionBy("id", "sym", "runid").orderBy("pos")
        seqs
          .withColumn("runid", col("pos") - row_number().over(wRun))
          .withColumn("nsym", lead(col("sym"), 1).over(wSeq))
          .withColumn("mstart",
            adjacent && row_number().over(wInRun) % 2 === 1)
      } else
        seqs
          .withColumn("nsym", lead(col("sym"), 1).over(wSeq))
          .withColumn("mstart", adjacent)
    flagged.withColumn("consumed",
      coalesce(lag(col("mstart"), 1).over(wSeq), lit(false)))
  }

  /** Apply flagged merges: drop consumed rows, rewrite merge starts to
    * the joined symbol, re-number positions densely. */
  private def applyFlagged(flagged: DataFrame): DataFrame =
    flagged
      .filter(!col("consumed"))
      .withColumn("npos", row_number().over(wSeq))
      .select(col("id"), col("npos").as("pos"),
        when(col("mstart"), concat(col("sym"), lit(" "), col("nsym")))
          .otherwise(col("sym")).as("sym"))

  def learnMerges(df: DataFrame, idCol: String, textCol: String,
                  iters: Int): DataFrame = {
    require(iters > 0, "iters must be positive")
    val spark = df.sparkSession
    import spark.implicits._

    var seqs = explodeTokens(df, idCol, textCol).localCheckpoint()
    // every applied merge removes exactly one row, so n_merged is the
    // row-count delta between checkpoints — no separate flagged-frame
    // materialization or filter-count job per iteration
    var nRows = seqs.count()
    val learned = ArrayBuffer.empty[(Int, String, String, Long, Long)]
    var it = 1
    var exhausted = false
    while (it <= iters && !exhausted) {
      val best = seqs
        .withColumn("nsym", lead(col("sym"), 1).over(wSeq))
        .filter(col("nsym").isNotNull)
        .groupBy("sym", "nsym").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("sym").asc, col("nsym").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        seqs = applyFlagged(flagMerges(seqs, a, b)).localCheckpoint()
        val newRows = seqs.count()
        learned += ((it, a, b, cnt, nRows - newRows))
        nRows = newRows
        it += 1
      }
    }
    learned.toSeq.toDF("it", "sym_a", "sym_b", "pair_n", "n_merged")
  }

  /** BPE training with BATCHED merge selection (round-15 verdict #4):
    * [[learnMerges]] runs one Spark job plus one driver argmax PER MERGE —
    * sample-bounded and correct, but a production ~32k-merge vocabulary
    * means 32k sequential jobs, days of scheduler latency regardless of
    * data size. Here each SCAN selects up to `batchN` pairs and applies
    * them in ONE merge pass, cutting the job count ~batchN×. Selection is
    * the standard non-interacting batch rule: walk pairs in (count desc,
    * lexicographic) order and accept a pair only if it shares NO symbol
    * with any pair already accepted this scan — where "symbols of a pair"
    * includes the MERGED symbol `a + " " + b` it would create: without
    * that, accepting ("a","b") alongside ("a b","d") would pass a naive
    * string-disjointness test while the first pair CREATES adjacencies of
    * the second, exactly the compound-aliasing class applyRulesLocal's
    * tuple keys closed. Non-interaction gives two
    * exact properties: (a) accepted pairs' occurrences can never overlap,
    * so one simultaneous greedy pass is well-defined and equals applying
    * them one-by-one in slot order; (b) applying an accepted pair cannot
    * create or destroy a later accepted pair's occurrences, so counts
    * stay selection-time-true. Batched therefore equals
    * serial greedy whenever serial's next argmax is never a pair CREATED
    * by an earlier merge of the same scan (the non-interacting-prefix
    * guarantee, spec-pinned at batchN = 1 where it is unconditional).
    * The recurrence itself is the gated contract — x111's oracle replays
    * selection, batching, and the merge passes exactly.
    *
    * Scale shape per scan: the same two window passes and one pair-count
    * aggregation as [[learnMerges]], plus one bounded driver fetch (the
    * ordered pair page the selection walks — ≤ max(64, 16·batchN) rows,
    * escalating only if a page exhausts before batchN accepted), and the
    * merge pass carries all batchN rules via one broadcast join. Returns
    * one row per accepted rule: (scan, slot, sym_a, sym_b, pair_n,
    * n_merged), slot = acceptance order within the scan. */
  def learnMergesBatched(df: DataFrame, idCol: String, textCol: String,
                         scans: Int, batchN: Int): DataFrame = {
    require(scans > 0, "scans must be positive")
    require(batchN > 0, "batchN must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    var seqs = explodeTokens(df, idCol, textCol).localCheckpoint()
    val learned = ArrayBuffer.empty[(Int, Int, String, String, Long, Long)]
    var scan = 1
    var exhausted = false
    while (scan <= scans && !exhausted) {
      val counts = seqs
        .withColumn("nsym", lead(col("sym"), 1).over(wSeq))
        .filter(col("nsym").isNotNull)
        .groupBy("sym", "nsym").agg(count(lit(1)).as("c"))
      val accepted = selectNonInteracting(counts, batchN)
      if (accepted.isEmpty) exhausted = true
      else {
        val flagged =
          flagMergesMulti(seqs, accepted.map(t => (t._1, t._2)))
            .localCheckpoint()
        val merged = flagged.filter(col("mstart"))
          .groupBy("sym", "nsym").agg(count(lit(1)).as("m"))
          .collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        accepted.zipWithIndex.foreach { case ((a, b, c), k) =>
          learned += ((scan, k + 1, a, b, c, merged.getOrElse((a, b), 0L)))
        }
        seqs = applyFlagged(flagged).localCheckpoint()
        scan += 1
      }
    }
    learned.toSeq
      .toDF("scan", "slot", "sym_a", "sym_b", "pair_n", "n_merged")
  }

  /** Greedy non-interacting selection over the ordered pair counts, with
    * bounded driver pages: fetch the top-k page, walk it in rank order
    * accepting symbol-disjoint pairs; escalate the page size only if it
    * exhausts before `n` accepted AND more pairs may exist (a fetched
    * page shorter than requested is the whole relation). The result is
    * page-size-invariant — identical to walking the full ordered list. */
  private def selectNonInteracting(counts: DataFrame,
                                   n: Int): Seq[(String, String, Long)] = {
    var k = math.max(64, 16 * n)
    while (true) {
      val page = counts
        .orderBy(col("c").desc, col("sym").asc, col("nsym").asc)
        .limit(k).collect()
      val acc = ArrayBuffer.empty[(String, String, Long)]
      // symbols touched by accepted pairs INCLUDING the merged symbol
      // each creates — a candidate touching any of them interacts
      val used = scala.collection.mutable.HashSet.empty[String]
      var i = 0
      while (i < page.length && acc.length < n) {
        val (a, b, c) =
          (page(i).getString(0), page(i).getString(1), page(i).getLong(2))
        if (!used(a) && !used(b)) {
          acc += ((a, b, c)); used += a; used += b; used += (a + " " + b)
        }
        i += 1
      }
      if (acc.length == n || page.length < k) return acc.toSeq
      k *= 4
    }
    Nil // unreachable
  }

  /** [[flagMerges]] for a SET of pairwise non-interacting rules in one
    * pass: the rules ride a broadcast join on (sym, nsym) — each row
    * matches at most one rule, and non-interaction guarantees merge
    * starts of different rules are never adjacent, so the shared
    * consumed = lag(mstart) arithmetic stays exact. The same-symbol
    * odd-in-run-rank gate is computed generically (per (id, sym, run))
    * and applied only to self-pair matches. */
  private def flagMergesMulti(seqs: DataFrame,
                              rules: Seq[(String, String)]): DataFrame = {
    val spark = seqs.sparkSession
    import spark.implicits._
    val withNsym =
      if (rules.exists(r => r._1 == r._2)) {
        val wRun = Window.partitionBy("id", "sym").orderBy("pos")
        val wInRun = Window.partitionBy("id", "sym", "runid").orderBy("pos")
        seqs.withColumn("runid", col("pos") - row_number().over(wRun))
          .withColumn("nsym", lead(col("sym"), 1).over(wSeq))
          .withColumn("__oddrank", row_number().over(wInRun) % 2 === 1)
          .drop("runid")
      } else
        seqs.withColumn("nsym", lead(col("sym"), 1).over(wSeq))
          .withColumn("__oddrank", lit(true))
    withNsym.join(broadcast(rules.toDF("__ra", "__rb")),
        col("sym") === col("__ra") && col("nsym") === col("__rb"), "left")
      .withColumn("mstart", col("__ra").isNotNull &&
        (col("__ra") =!= col("__rb") || col("__oddrank")))
      .drop("__ra", "__rb", "__oddrank")
      .withColumn("consumed",
        coalesce(lag(col("mstart"), 1).over(wSeq), lit(false)))
  }

  /** Tokenizer SERVING, declarative form: apply a STORED, ordered
    * merge-rule list to the corpus and summarize each document's final
    * symbol sequence (id, n_symbols, sym_fp — sha256 over the
    * unit-separator-joined symbols, so the whole rewritten sequence is
    * hash-pinned). Unlike training there is no per-iteration argmax, so
    * the entire apply is ONE declarative plan: a single exchange
    * partitions the exploded corpus by document, and every per-rule
    * window pass reuses that partitioning. The plan still GROWS one
    * window pass per rule, so this form is for short rule lists (gates,
    * diagnostics, the oracle-shaped twin); production rule counts (a
    * ~32k-merge vocab) go through [[applyMergesLocal]], which is
    * spec-pinned row-identical with a constant-size plan. Docs with no
    * tokens survive with n_symbols = 0 and the hash of the empty
    * string. */
  def applyMerges(df: DataFrame, idCol: String, textCol: String,
                  rules: Seq[(String, String)]): DataFrame = {
    var seqs = explodeTokens(df, idCol, textCol)
    for ((a, b) <- rules) seqs = applyFlagged(flagMerges(seqs, a, b))
    df.select(col(idCol).as("id")).join(seqs, Seq("id"), "left")
      .groupBy("id")
      .agg(count(col("pos")).as("n_symbols"),
        sha2(concat_ws("\u001f", transform(
          array_sort(collect_list(when(col("pos").isNotNull,
            struct(col("pos"), col("sym"))))),
          s => s.getField("sym"))), 256).as("sym_fp"))
  }

  // ------------------------------------------------ production-scale apply

  /** Tokenizer SERVING at production rule counts — same contract and
    * output as [[applyMerges]] (one row per document: id, n_symbols,
    * sym_fp), but executed as a bounded-local-state greedy loop per
    * document over the BROADCAST rule list instead of one window pass per
    * rule. [[applyMerges]]'s plan grows linearly in |rules| in both plan
    * size and window passes — fine at the 3-rule gate, unbuildable at a
    * real ~32k-merge vocabulary. Here the plan is CONSTANT-SIZE at any
    * rule count (one narrow mapPartitions over (id, tokens) — the rules
    * travel in one Broadcast, never in the plan), there is NO shuffle at
    * all (tokenization is embarrassingly parallel per document; the
    * declarative form's explode + re-group disappears), and per-document
    * work is one hash-set lookup per rule plus a greedy pass ONLY for
    * rules whose pair is actually adjacent somewhere in the document —
    * each such pass shrinks the sequence by ≥1 symbol, so scan work is
    * bounded by rules + tokens·merges regardless of vocab size.
    *
    * Row-identical to [[applyMerges]] for unique ids (every consumer):
    * spec-pinned by an exhaustive randomized equivalence test, and gated
    * by the same DuckDB oracle (x105 shares x101's replay). One row per
    * INPUT row here vs per distinct id there — same thing when idCol is
    * a key. */
  def applyMergesLocal(df: DataFrame, idCol: String, textCol: String,
                       rules: Seq[(String, String)]): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(rules.toArray)
    val toked =
      df.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("__tk"))
    val outSchema = StructType(Seq(
      toked.schema("id"),
      StructField("n_symbols", LongType, nullable = false),
      StructField("sym_fp", StringType, nullable = false)))
    toked.mapPartitions { it =>
      val rs = bc.value
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        val toks: Seq[String] =
          if (r.isNullAt(1)) Nil else r.getSeq[String](1)
        val out = applyRulesLocal(toks, rs)
        val digest = md.digest(
          out.mkString("\u001f").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        Row(r.get(0), out.length.toLong, hex(digest))
      }
    }(Encoders.row(outSchema))
  }

  /** [[applyMergesLocal]] with BYTE FALLBACK — the zero-UNK serve for
    * the BPE family: merges run unchanged (a rule only ever matches
    * symbols seen at train time, so out-of-vocabulary words pass
    * through un-merged), then every emitted SINGLE symbol absent from
    * the stored `alphabet` (the train corpus's distinct base symbols —
    * stored beside the rules, the vocab artifact a real tokenizer
    * ships) decomposes into `<0xNN>` UTF-8 byte tokens
    * ([[TextOps.byteFallbackTokens]]). Compound symbols (rule products)
    * are vocab members by construction. Output shape matches the
    * unigram fallback applier: n_symbols / n_fallback / all_covered
    * (measured) / sym_fp over the post-fallback sequence. */
  def applyMergesLocalByteFallback(df: DataFrame, idCol: String,
                                   textCol: String,
                                   rules: Seq[(String, String)],
                                   alphabet: Set[String]): DataFrame = {
    val bcRules = df.sparkSession.sparkContext.broadcast(rules.toArray)
    val bcAlpha = df.sparkSession.sparkContext.broadcast(alphabet)
    val compounds = rules.map { case (a, b) => a + " " + b }.toSet
    val bcComp = df.sparkSession.sparkContext.broadcast(compounds)
    val toked =
      df.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("__tk"))
    val outSchema = StructType(Seq(
      toked.schema("id"),
      StructField("n_symbols", LongType, nullable = false),
      StructField("n_fallback", LongType, nullable = false),
      StructField("all_covered", BooleanType, nullable = false),
      StructField("sym_fp", StringType, nullable = false)))
    toked.mapPartitions { it =>
      val rs = bcRules.value
      val alpha = bcAlpha.value
      val comp = bcComp.value
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        val toks: Seq[String] =
          if (r.isNullAt(1)) Nil else r.getSeq[String](1)
        val out = applyRulesLocal(toks, rs).flatMap { s =>
          if (alpha(s) || comp(s)) Seq(s)
          else TextOps.byteFallbackTokens(s)
        }
        val nFb = out.count(TextOps.isByteFallbackToken)
        val covered = out.forall(s =>
          alpha(s) || comp(s) || TextOps.isByteFallbackToken(s))
        val digest = md.digest(
          out.mkString("").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        Row(r.get(0), out.length.toLong, nFb.toLong, covered, hex(digest))
      }
    }(Encoders.row(outSchema))
  }

  /** Apply the ordered rule list to one document's symbols — the local
    * twin of rules-many [[flagMerges]]+[[applyFlagged]] passes, in the
    * production data structure (round-15 verdict #3): the sequence lives
    * in a doubly-linked slot array and every adjacent pair keeps a sorted
    * index of its occurrence positions, so
    *  - a DEAD rule costs one hash lookup (its pair has no index entry —
    *    pairs are keyed as TUPLES, never joined strings, so compound
    *    symbols cannot alias: rule ("a","b c") and adjacency ("a b","c")
    *    are distinct keys; round-15 advice);
    *  - a LIVE rule touches ONLY its occurrences, in document order
    *    (greedy left-to-right — inside a same-symbol run the surviving
    *    occurrence consumes its right neighbor, which deletes the
    *    overlapping candidate before it is visited, reproducing the
    *    declarative odd-in-run-rank semantics), each merge doing O(1)
    *    index edits on the ≤3 adjacencies it changes (eager removal —
    *    the indexes stay exact, no stale entries).
    * Total work is O((tokens + merges)·log tokens + rules) regardless of
    * how many rules fire — the round-15 form rescanned the whole document
    * once per LIVE rule, quadratic on long documents where many rules
    * fire (the chained same-symbol pathology). Spec-pinned equal to the
    * declarative [[applyMerges]] on randomized corpora and to a
    * rebuild-per-pass reference on adversarial same-symbol runs. */
  private[operators] def applyRulesLocal(
      tokens: Seq[String], rules: Array[(String, String)]): Seq[String] = {
    val n = tokens.length
    if (n < 2 || rules.isEmpty) return tokens
    val syms = new Array[String](n)
    tokens.copyToArray(syms)
    // slot links: nxt(i)/prv(i) = adjacent ALIVE slot, -1 at the ends
    val nxt = Array.tabulate(n)(i => if (i == n - 1) -1 else i + 1)
    val prv = Array.tabulate(n)(i => i - 1)
    val pairPos =
      new scala.collection.mutable.HashMap[(String, String), java.util.TreeSet[Integer]]()
    def addPos(a: String, b: String, p: Int): Unit =
      pairPos.getOrElseUpdate((a, b), new java.util.TreeSet[Integer]())
        .add(Integer.valueOf(p)): Unit
    def delPos(a: String, b: String, p: Int): Unit =
      pairPos.get((a, b)).foreach { s =>
        s.remove(Integer.valueOf(p))
        if (s.isEmpty) pairPos.remove((a, b)): Unit
      }
    var i = 0
    while (i < n - 1) { addPos(syms(i), syms(i + 1), i); i += 1 }
    var merges = 0
    var ri = 0
    while (ri < rules.length) {
      val rule = rules(ri)
      pairPos.get(rule).foreach { occ =>
        // snapshot the occurrence list: merges edit the index under us,
        // and a consumed overlapping candidate must validate stale
        val positions = occ.toArray(new Array[Integer](occ.size()))
        var k = 0
        while (k < positions.length) {
          val p = positions(k).intValue()
          val q = if (syms(p) == rule._1) nxt(p) else -1
          if (q != -1 && syms(q) == rule._2 &&
              pairPos.get(rule).exists(_.contains(Integer.valueOf(p)))) {
            val pp = prv(p)
            val nn = nxt(q)
            // eager index edits around the merge site (≤3 adjacencies)
            delPos(rule._1, rule._2, p)
            if (pp != -1) delPos(syms(pp), syms(p), pp)
            if (nn != -1) delPos(syms(q), syms(nn), q)
            syms(p) = syms(p) + " " + syms(q)
            syms(q) = null
            nxt(p) = nn
            if (nn != -1) prv(nn) = p
            if (pp != -1) addPos(syms(pp), syms(p), pp)
            if (nn != -1) addPos(syms(p), syms(nn), p)
            merges += 1
          }
          k += 1
        }
      }
      ri += 1
    }
    if (merges == 0) return tokens
    val out = new ArrayBuffer[String](n - merges)
    var c = 0
    while (c != -1) { out += syms(c); c = nxt(c) }
    out.toSeq
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = HexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
