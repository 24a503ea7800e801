package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

  def learnMerges(df: DataFrame, idCol: String, textCol: String,
                  iters: Int): DataFrame = {
    require(iters > 0, "iters must be positive")
    val spark = df.sparkSession
    import spark.implicits._

    val wSeq = Window.partitionBy("id").orderBy("pos")
    var seqs = df
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("__tk"))
      .select(col("id"), posexplode(col("__tk")).as(Seq("pos", "sym")))
      .localCheckpoint()

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
        val wRun = Window.partitionBy("id", "sym").orderBy("pos")
        val wInRun =
          Window.partitionBy("id", "sym", "runid").orderBy("pos")
        val adjacent = (col("sym") === a) && (col("nsym") === b)
        val flagged = seqs
          .withColumn("runid", col("pos") - row_number().over(wRun))
          .withColumn("nsym", lead(col("sym"), 1).over(wSeq))
          .withColumn("mstart",
            if (a == b) adjacent && row_number().over(wInRun) % 2 === 1
            else adjacent)
          .withColumn("consumed",
            coalesce(lag(col("mstart"), 1).over(wSeq), lit(false)))
          .localCheckpoint()
        val nMerged = flagged.filter(col("mstart")).count()
        seqs = flagged
          .filter(!col("consumed"))
          .withColumn("npos", row_number().over(wSeq))
          .select(col("id"), col("npos").as("pos"),
            when(col("mstart"), concat(col("sym"), lit(" "), col("nsym")))
              .otherwise(col("sym")).as("sym"))
          .localCheckpoint()
        learned += ((it, a, b, cnt, nMerged))
        it += 1
      }
    }
    learned.toSeq.toDF("it", "sym_a", "sym_b", "pair_n", "n_merged")
  }
}
