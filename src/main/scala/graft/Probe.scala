package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Dev-only micro-probe: times isolated stages of the text pipelines so
  * perf work targets measured bottlenecks, not guesses. Not part of the
  * library surface. Usage: runMain graft.Probe [sfDir] */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.configure(spark)
    val docs = graft.sources.Tables(spark, sfDir).documents

    def timed(name: String)(f: => Long): Unit = {
      f // warmup
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-46s ${(System.nanoTime() - t0) / 1e9}%6.2fs  n=$n")
    }

    timed("tokens explode count") {
      docs.select(explode(TextOps.tokens(col("text"))).as("t")).count()
    }
    timed("ngram5 array sizes sum") {
      docs.select(size(TextOps.ngrams(TextOps.tokens(col("text")), 5)).as("s"))
        .agg(sum("s")).head.getLong(0)
    }
    timed("ngram5 explode strings") {
      docs.select(explode(TextOps.ngrams(TextOps.tokens(col("text")), 5)).as("g"))
        .count()
    }
    timed("ngram5 MATERIALIZED toks: array sizes sum") {
      docs.select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
        .select(size(TextOps.ngrams(col("__tk"), 5)).as("s"))
        .agg(sum("s")).head.getLong(0)
    }
    timed("ngram5 materialized + explode + md5 + distinct") {
      docs.select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
        .select(col("doc_id"), explode(TextOps.ngrams(col("__tk"), 5)).as("g"))
        .select(col("doc_id"), TextOps.md5Hash60(col("g")).as("gh"))
        .distinct().count()
    }
    timed("shingle3 materialized, hash in transform (x4 form)") {
      docs.select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
        .select(explode(transform(
          TextOps.shingles(col("__tk")),
          s => TextOps.md5Hash60(s))).as("h"))
        .count()
    }
    timed("simhash 60-agg over materialized shingles (x18 sig)") {
      TextOps.simhashes(
        docs.select(col("doc_id").as("id"), TextOps.tokens(col("text")).as("__tk"))
          .select(col("id"), TextOps.shingles(col("__tk")).as("toks")),
        "id", "toks").select(max("simhash")).head.getLong(0)
    }
    // Does a wide HashAggregate fall out of codegen? Compare k sum buffers
    // on the same exploded hash frame.
    for (nAggs <- Seq(8, 16, 32, 60)) {
      timed(s"scaling: $nAggs sum aggs over exploded shingle hashes") {
        val exploded = docs
          .select(col("doc_id").as("id"), TextOps.tokens(col("text")).as("__tk"))
          .select(col("id"), explode(transform(TextOps.shingles(col("__tk")),
            s => TextOps.md5Hash60(s))).as("h"))
        val aggs = (0 until nAggs).map { j =>
          sum(shiftright(col("h"), j).bitwiseAND(1) * 2 - 1).as(s"b$j")
        }
        exploded.groupBy("id").agg(aggs.head, aggs.tail: _*).count()
      }
    }
    // Custom bounded-heap top-k vs the window row_number form, same
    // result set: is skipping the per-group sort worth a custom operator?
    val li = graft.sources.Tables(spark, sfDir).lineitem
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    for (k <- Seq(5, 50)) {
      timed(s"top-$k per suppkey: window row_number") {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("l_suppkey")
          .orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        li.withColumn("__rk", row_number().over(w))
          .filter(col("__rk") <= k).count()
      }
      timed(s"top-$k per suppkey: native bounded heap") {
        graft.plans.TopKPerKey.topKPerKey(li, Seq("l_suppkey"),
          Seq(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber")), k)
          .count()
      }
    }
    // The skew case: one monster key holds ~90% of the rows (the crawl's
    // top domain). The window form materializes + sorts the whole group
    // on one task; the heap streams it.
    val skewed = li.withColumn("skg",
      when(col("l_suppkey") % 10 =!= 0, lit(0L)).otherwise(col("l_suppkey")))
    timed("top-5 per SKEWED key (90% one key): window row_number") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("skg")
        .orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      skewed.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= 5).count()
    }
    timed("top-5 per SKEWED key (90% one key): native bounded heap") {
      graft.plans.TopKPerKey.topKPerKey(skewed, Seq("skg"),
        Seq(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber")), 5)
        .count()
    }

    // Incremental vs full cluster maintenance (the x48 story), pairs
    // PRECOMPUTED and pinned so only the clustering itself is timed: the
    // from-scratch CC loop iterates over corpus-sized frames, the
    // incremental merge over batch-sized ones.
    {
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val batch = docs.filter(col("doc_id") % 10 === 0)
      val corpusPairs = TextOps.minhashNearDups(corpus, "doc_id", "text", 0.8)
        .select("id_a", "id_b").persist()
      corpusPairs.count()
      val newPairs = TextOps
        .minhashNearDupsAgainst(batch, corpus, "doc_id", "text", 0.8)
        .select(col("id_new").as("id_a"), col("id_idx").as("id_b")).persist()
      newPairs.count()
      graft.GraftCache.release()
      val labels = graft.operators.Dedup
        .connectedComponents(corpusPairs, "id_a", "id_b").persist()
      labels.count()
      graft.GraftCache.release()
      timed("cluster labels: full CC rerun (corpus+batch pairs)") {
        val n = graft.operators.Dedup.connectedComponents(
          corpusPairs.unionByName(newPairs), "id_a", "id_b").count()
        graft.GraftCache.release(); n
      }
      timed("cluster labels: incremental merge of batch pairs") {
        val n = graft.operators.Dedup.incrementalComponents(
          labels, newPairs, "id_a", "id_b").count()
        graft.GraftCache.release(); n
      }
    }

    // Tokenizer serving at production rule counts (round-15 probe for the
    // x105 local applier): rules = the corpus's top-N adjacent token pairs
    // (one aggregation — live rules that actually fire, without paying N
    // sequential training iterations), applied via the bounded-local-state
    // loop. The numbers to look for: runtime ~flat from 10 → 1000 rules
    // (dead-rule skips are hash lookups; live passes pay for themselves in
    // removed symbols), where the declarative window form grows a plan
    // node per rule and stops building long before 32k.
    {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1)).orderBy(desc("c"), col("sym"), col("nsym"))
      val seqW = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      val topPairs = docs
        .select(col("doc_id"), posexplode(TextOps.tokens(col("text")))
          .as(Seq("pos", "sym")))
        .withColumn("nsym", lead(col("sym"), 1).over(seqW))
        .filter(col("nsym").isNotNull)
        .groupBy("sym", "nsym").agg(count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 1000)
        .orderBy("rk").select("sym", "nsym").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      for (n <- Seq(10, 100, 1000)) {
        timed(s"bpe applyMergesLocal, $n live rules") {
          graft.operators.BpeTrainer
            .applyMergesLocal(docs, "doc_id", "text", topPairs.take(n))
            .agg(sum("n_symbols")).head.getLong(0)
        }
      }
      timed("bpe applyMerges (declarative), 10 rules — the window form") {
        graft.operators.BpeTrainer
          .applyMerges(docs, "doc_id", "text", topPairs.take(10))
          .agg(sum("n_symbols")).head.getLong(0)
      }
    }
    spark.stop()
  }
}
