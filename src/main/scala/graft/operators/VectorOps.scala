package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity-search operators (engine extension — SURVEY.md
  * §7.5(8)): exact cosine top-k as the correctness baseline, and
  * random-hyperplane LSH bucketing as the scale path (candidate generation is
  * a hash-bucket join instead of an all-pairs cross join).
  *
  * Dot products use `zip_with` + `aggregate` higher-order functions — pure
  * Catalyst, codegen-friendly, sequential left-to-right summation (matching
  * DuckDB's list_inner_product order for oracle parity).
  */
object VectorOps {

  /** Sequential-fold dot product of two array<float|double> columns,
    * computed in doubles — a custom codegen'd Catalyst expression
    * ([[graft.functions.DotProduct]]): Spark's `zip_with`/`aggregate`
    * lambdas run interpreted, which dominates the similarity hot paths;
    * the expression compiles to a primitive loop with the identical
    * ascending fold order (bit-equal results). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** The pre-codegen HOF formulation of [[dot]], kept as the reference
    * semantics the custom expression is tested against. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Exact brute-force cosine top-k neighbours of one query vector.
    * The single-row query side (vector + precomputed norm) is broadcast;
    * the scan side streams, computing each row's norm once — at cluster
    * scale this is one pass over the embedding table with a
    * TakeOrderedAndProject, no shuffle of the vectors themselves. */
  def bruteForceTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                     queryId: Long, k: Int): DataFrame = {
    val q = embeddings.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qv"), norm2(col(vecCol)).as("__qn"))
    embeddings.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        round(dot(col(vecCol), col("__qv")) / (norm2(col(vecCol)) * col("__qn")), 6)
          .as("sim_r"))
      .orderBy(desc("sim_r"), col(idCol))
      .limit(k)
  }

  /** Deterministic random hyperplanes for LSH: `planes(i)(j)` from a fixed
    * seed, inlined as literals on both the Spark and oracle sides. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 7L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    // 3-decimal values parse to identical doubles in any engine.
    Seq.fill(numPlanes)(Array.fill(dim)((rnd.nextInt(2001) - 1000) / 1000.0))
  }

  def planeColumn(plane: Array[Double]): Column =
    array(plane.map(lit): _*)

  /** Johnson–Lindenstrauss random projection: d dims → `planes.length`
    * dims, coordinate j = dot(v, plane_j) / sqrt(outDim) over the same
    * deterministic 3-decimal plane matrix the LSH path inlines on both
    * engine sides. The JL lemma bounds pairwise-distance distortion at
    * (1±ε) for outDim = O(log n / ε²); with uniform[-1,1] plane entries
    * every squared distance additionally scales by their variance (1/3)
    * in expectation — a fixed monotone factor that cannot reorder
    * neighbours, so ranking-based consumers need no correction
    * (spec-pinned: ratio concentration AND top-k candidate recall).
    * This is the cheap pre-cut for vector workloads at scale: candidate
    * generation (top-k, near-dup blocking) runs in projected space at
    * d/outDim of the shuffle/cache bytes, exact verification re-reads
    * the full vectors for survivors only. Row-local, zero shuffles, one
    * codegen'd [[dot]] per output dim; coords round to 6 decimals
    * (oracle parity — 1e-6 is far below any JL ε anyone projects for). */
  def jlProject(df: DataFrame, vecCol: String, planes: Seq[Array[Double]],
                outCol: String = "projected"): DataFrame = {
    require(planes.nonEmpty, "at least one projection plane")
    require(!df.columns.contains(outCol), s"column $outCol already present")
    val s = 1.0 / math.sqrt(planes.length.toDouble)
    df.withColumn(outCol, array(planes.map(p =>
      round(dot(col(vecCol), planeColumn(p)) * s, 6)): _*))
  }

  /** Two-stage kNN join through the JL projection — the scale form of
    * [[knnJoin]]: stage 1 generates `candidates` per query by squared L2
    * in `planes`-projected space (the |Q|×N distance pass computes and
    * ships outDim/d of the vector bytes, and the bounded-heap operator
    * cuts it to ≤ candidates per (qid × partition) BEFORE any exchange);
    * stage 2 re-reads the FULL vectors behind the candidate join and
    * ranks exact cosine top-k. Candidates rank by PROJECTED COSINE —
    * the same metric the final ranking uses (JL preserves angles as well
    * as distances); ranking stage 1 by projected L2 against a cosine
    * stage 2 was measured at 0.23 recall on the synthetic embeddings
    * (unnormalized vectors order differently under the two metrics).
    * Matches [[knnJoin]] whenever the true top-k survive the cut — the
    * spec measures that recall on real embeddings; the operator's
    * CONTRACT is the two-stage computation itself, deterministic on both
    * engines (round-6 projected coords, round-6 similarities, id
    * tie-breaks), which is what the oracle replays. */
  def knnJoinProjected(embeddings: DataFrame, idCol: String, vecCol: String,
                       queryPred: Column, k: Int, candidates: Int,
                       planes: Seq[Array[Double]]): DataFrame = {
    require(candidates >= k, "candidate pool must cover k")
    val proj = jlProject(embeddings, vecCol, planes)
    val projSkinny = proj.select(col(idCol), col("projected"),
      norm2(col("projected")).as("__pn"))
    val qp = proj.filter(queryPred)
      .select(col(idCol).as("qid"), col("projected").as("__qp"),
        norm2(col("projected")).as("__qpn"))
    val sims = projSkinny.crossJoin(broadcast(qp))
      .filter(col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol),
        round(dot(col("projected"), col("__qp")) / (col("__pn") * col("__qpn")), 6)
          .as("sim_p"))
    val cands = graft.plans.TopKPerKey.topKPerKey(sims, Seq("qid"),
        Seq(desc("sim_p"), col(idCol)), candidates)
      .select("qid", idCol)
    val full = embeddings.select(col(idCol), col(vecCol).as("__v"),
      norm2(col(vecCol)).as("__n"))
    val qf = embeddings.filter(queryPred)
      .select(col(idCol).as("qid"), col(vecCol).as("__qv"),
        norm2(col(vecCol)).as("__qn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("sim_r"), col(idCol))
    cands.join(full, idCol)
      .join(broadcast(qf), "qid")
      .select(col("qid"), col(idCol),
        round(dot(col("__v"), col("__qv")) / (col("__n") * col("__qn")), 6)
          .as("sim_r"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Sign-of-dot-product LSH bucket id: bit i set iff dot(v, plane_i) > 0. */
  def lshBucket(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, planeColumn(p)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN top-k with multi-probe LSH: candidates are vectors in the query's
    * bucket OR any bucket within Hamming distance 1 of it (flip one
    * hyperplane bit) — recovers neighbours that fall just across one
    * hyperplane, the classic multi-probe recall fix. The probe buckets are
    * exploded on the (single-row) query side so candidate generation stays
    * an equi hash join on `bucket` — partitionable, never O(n²). */
  def annTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, planes: Seq[Array[Double]],
              multiProbe: Boolean = true): DataFrame = {
    val bucketed = embeddings
      .withColumn("bucket", lshBucket(col(vecCol), planes))
    val probes =
      if (multiProbe)
        array(col("bucket") +:
          planes.indices.map(i => col("bucket").bitwiseXOR(lit(1L << i))): _*)
      else array(col("bucket"))
    val q = bucketed.filter(col(idCol) === queryId)
      .select(explode(probes).as("bucket"),
        col(vecCol).as("__qv"), norm2(col(vecCol)).as("__qn"))
    bucketed.filter(col(idCol) =!= queryId)
      .join(broadcast(q), "bucket")
      .select(col(idCol),
        round(dot(col(vecCol), col("__qv")) / (norm2(col(vecCol)) * col("__qn")), 6)
          .as("sim_r"))
      .orderBy(desc("sim_r"), col(idCol))
      .limit(k)
  }

  // ------------------------------------------------------------------- IVF

  /** Squared L2 distance in the algebraic form dot(a,a) − 2·dot(a,b) +
    * dot(b,b) — fixed so the oracle computes the bit-identical value
    * (each dot is an ascending sequential fold). */
  def l2sq(a: Column, b: Column): Column =
    dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)

  /** Deterministic k-means coarse quantizer for IVF: centroids initialized
    * from the first k vectors by id, `iters` Lloyd iterations. Centroid
    * coordinates are ROUNDED to 6 decimals each update so an external
    * oracle can replay the iteration: summation-order ulp differences
    * (Spark partial aggregation vs a sequential engine) are absorbed by the
    * rounding unless a true mean lies within ~1 ulp of a 0.5e-6 boundary —
    * ~1e-10 per coordinate, ~1e-7 per run at k=8×dim=64×2 iters — a residual
    * (not zero) divergence risk, acceptable for a coarse quantizer.
    * Assignment ties break on lowest cid. Empty clusters drop out
    * (deterministically on both sides).
    *
    * Scale: each Lloyd iteration is one scan of the vectors — the argmin
    * assignment projection (zero-shuffle literal form at k ≤
    * [[ArgminLiteralMaxK]], broadcast-join form above — see
    * [[argminAssign]]) feeding a k×dim-sized aggregation with map-side
    * partial combine. Centroids live on the driver between iterations
    * (k×dim doubles — the same design as Spark MLlib's KMeans), so lineage
    * does not stack across iterations; the returned frame is a local k-row
    * table, free to reuse downstream. */
  def kmeansCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int): DataFrame = {
    val spark = embeddings.sparkSession
    var cents = collectCentroids(
      embeddings.filter(col(idCol) < k)
        .select(col(idCol).cast("long").as("cid"),
          transform(col(vecCol), _.cast("double")).as("c")))
    // Centroid update: posexplode to (cid, pos, e) and aggregate. The
    // explode is MAP-SIDE only — partial aggregation collapses each map
    // partition to ≤ k×dim avg buffers before the shuffle, so no row
    // amplification crosses the wire. (A 64-separate-avg single-groupBy
    // form was measured ~35% slower here: that many aggregate buffers
    // falls out of whole-stage codegen.)
    for (_ <- 1 to iters) {
      val assigned = argminAssign(embeddings, idCol, vecCol, cents)
      // collect the k×dim (cid, pos, mean) scalars and assemble the
      // centroid arrays on the driver: the former collect_list reshape
      // was a SECOND keyed shuffle per iteration whose only product was
      // k rows the driver was about to materialize anyway (optimization
      // r19 — one exchange per Lloyd iteration, not two; identical
      // round-6 means, identical cid/pos ordering, same k×dim driver
      // bound)
      val rows = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "e")))
        .groupBy("cid", "pos")
        .agg(round(avg(col("e").cast("double")), 6).as("m"))
        .collect()
      cents = rows.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map {
        case (cid, rs) =>
          (cid, rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
      }
    }
    spark.createDataFrame(cents).toDF("cid", "c")
  }

  /** Materializes a centroid frame as (cid, coordinates) pairs, sorted by
    * cid. k×dim doubles — bounded by the cluster count, never the data. */
  def collectCentroids(centroids: DataFrame): Seq[(Long, Seq[Double])] =
    centroids.select(col("cid").cast("long"), col("c")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).toSeq

  /** Cell count above which centroid assignment switches from the
    * zero-shuffle literal-argmin projection to the broadcast-join form
    * (round-13 verdict task 2). The literal form inlines k×dim double
    * literals and k struct expression trees into the plan — the right
    * zero-shuffle shape at gate-scale k (8–64 cells), but a plan/codegen
    * blow-up at production coarse-quantizer sizes (4k–64k cells ×
    * 768 dims would be tens of millions of literal nodes). 64 keeps every
    * existing gate on the measured literal path while anything
    * production-shaped routes through the join form. */
  val ArgminLiteralMaxK = 64

  /** Nearest-centroid assignment, form picked by cell count (the
    * [[graft.plans.TopKPerKey.topKPerKeyAuto]] pattern): at
    * k ≤ [[ArgminLiteralMaxK]] the zero-shuffle literal-argmin projection,
    * above it the broadcast-join form — same argmin semantics, same
    * double arithmetic, bit-identical assignments (spec-pinned). */
  private def argminAssign(embeddings: DataFrame, idCol: String, vecCol: String,
                           cents: Seq[(Long, Seq[Double])]): DataFrame =
    if (cents.size <= ArgminLiteralMaxK)
      argminAssignLiteral(embeddings, idCol, vecCol, cents)
    else
      argminAssignJoin(embeddings, idCol, vecCol, cents)

  /** The literal form of [[argminAssign]], a SINGLE zero-shuffle
    * projection: the k centroids are inlined as literal arrays and the
    * argmin is `array_min` over `struct(distance, cid)` candidates
    * (struct ordering = lexicographic, so ties break on lowest cid —
    * identical to the oracle's `row_number() OVER (ORDER BY dist, cid)`).
    * Replaces the previous crossJoin + row_number window, which shuffled k
    * copies of every row *carrying the full embedding* — k× vector
    * amplification through a sort, the dominant cost of IVF at scale.
    * Distances keep the exact [[l2sq]] algebraic form so assignment is
    * bit-identical to the replayed oracle; the constant `dot(c,c)` terms
    * fold at plan time. */
  private[operators] def argminAssignLiteral(embeddings: DataFrame, idCol: String,
                                  vecCol: String,
                                  cents: Seq[(Long, Seq[Double])]): DataFrame = {
    require(cents.nonEmpty, "argminAssign requires at least one centroid")
    val v = col(vecCol)
    val candidates = cents.map { case (cid, c) =>
      val cl = array(c.map(lit): _*)
      struct(l2sq(v, cl).as("d"), lit(cid).as("cid"))
    }
    embeddings.select(col(idCol).as("vec_id"), v.as("v"),
      array_min(array(candidates: _*)).getField("cid").as("cid"))
  }

  /** The large-k form of [[argminAssign]]: the WHOLE centroid table
    * becomes ONE array<struct<cid, c>> value in a one-row BROADCAST
    * relation (a single plan node whatever k is — no whole-codebook
    * literal, no codegen blow-up, and the k×dim doubles travel once per
    * executor via the BlockManager instead of inside every task binary),
    * joined onto the scan as a 1-row build side (no row amplification),
    * and the argmin is the codegen'd per-row fold
    * [[graft.functions.ArgMinCells]] — so the form keeps the literal
    * projection's ZERO-shuffle/zero-sort shape (a first draft reduced a
    * k-amplified candidate stream with `min(struct)`, which falls to
    * SortAggregate: k copies of every row through a per-partition sort —
    * exactly the amplification the literal argmin exists to avoid).
    * Arithmetic and tie-break parity with the literal form is pinned by
    * spec (bit-identical assignments, lowest-cid ties) and replayed by
    * the x92 oracle at k=256. */
  private[operators] def argminAssignJoin(embeddings: DataFrame, idCol: String,
                               vecCol: String,
                               cents: Seq[(Long, Seq[Double])]): DataFrame = {
    require(cents.nonEmpty, "argminAssign requires at least one centroid")
    val v = col(vecCol)
    embeddings
      .join(broadcast(cellsFrame(embeddings, cents)))
      .select(col(idCol).as("vec_id"), v.as("v"),
        argminCells(v, col("__cells")).getField("cid").as("cid"))
  }

  /** The centroid table as a ONE-ROW frame holding the whole
    * array<struct<cid, c>> — the broadcast transport of the large-k
    * assignment forms. */
  private def cellsFrame(df: DataFrame,
                         cents: Seq[(Long, Seq[Double])]): DataFrame =
    df.sparkSession.createDataFrame(Seq(Tuple1(cents))).toDF("__cells")

  /** Join the one-row [[cellsFrame]] when a large-k query-side form
    * needs the `__cells` column; identity below the threshold. */
  private def withCellsCol(df: DataFrame,
                           cents: Seq[(Long, Seq[Double])]): DataFrame =
    if (cents.size <= ArgminLiteralMaxK) df
    else df.join(broadcast(cellsFrame(df, cents)))

  /** The per-query probe-candidate array of struct(d, cid) over `vec`:
    * k literal structs below the threshold; above it the SAME shape as a
    * `transform` over the one-row-broadcast `__cells` column (caller
    * routes through [[withCellsCol]]) — the lambda runs interpreted, but
    * only per QUERY row, and the downstream
    * `array_sort`/`slice`/`explode` pipeline is shared verbatim, so the
    * probe ranking (struct ordering, lowest-cid ties) is identical by
    * construction. */
  private def probeCandsCol(vec: Column,
                            cents: Seq[(Long, Seq[Double])]): Column =
    if (cents.size <= ArgminLiteralMaxK)
      array(cents.map { case (cid, c) =>
        struct(l2sq(vec, array(c.map(lit): _*)).as("d"), lit(cid).as("cid"))
      }: _*)
    else
      transform(col("__cells"), cell =>
        struct(l2sq(vec, cell.getField("_2")).as("d"),
          cell.getField("_1").as("cid")))

  /** cid → centroid lookup map: the literal map below the threshold (k
    * entries inlined), built per row from `__cells` via
    * `map_from_entries` above it — query-side probe rows only, where
    * the row count is bounded by |Q|·nprobe. */
  private def centroidLookupCol(cents: Seq[(Long, Seq[Double])]): Column =
    if (cents.size <= ArgminLiteralMaxK) centroidMap(cents)
    else map_from_entries(transform(col("__cells"), cell =>
      struct(cell.getField("_1"), cell.getField("_2"))))

  /** All m codebooks as a ONE-ROW frame (`__cb`:
    * array<array<struct<cid, c>>>) — the broadcast transport of the
    * large-ks PQ forms, [[cellsFrame]]'s per-subspace generalization. */
  private def codebooksFrame(df: DataFrame,
                             codebooks: Seq[Seq[(Long, Seq[Double])]]): DataFrame =
    df.sparkSession.createDataFrame(Seq(Tuple1(codebooks))).toDF("__cb")

  /** Join the one-row [[codebooksFrame]] when the large-ks encode/LUT
    * forms need the `__cb` column; identity below the threshold. */
  private def withCodebooksCol(df: DataFrame,
                               codebooks: Seq[Seq[(Long, Seq[Double])]]): DataFrame =
    if (codebooks.map(_.size).sum <= ArgminLiteralMaxK) df
    else df.join(broadcast(codebooksFrame(df, codebooks)))

  /** Per-subspace code columns over sliced attributes `__s0..__s{m-1}`:
    * the literal per-entry argmin when the stage's TOTAL candidate count
    * m·ks ≤ [[ArgminLiteralMaxK]], the codegen'd
    * [[graft.functions.ArgMinCells]] fold over the joined `__cb` column
    * above it (caller routes the frame through [[withCodebooksCol]]) —
    * the ENCODE twin of [[argminAssign]]'s dispatch. The criterion is
    * m·ks, not per-subspace ks, because all m argmins land in ONE
    * projection stage: at m=8·ks=16 the literal form's generated method
    * already exceeds janino's 64 KB limit and whole-stage codegen FALLS
    * BACK — measured 2–5× slower than this fold (x70 3.75s → 0.80s, x74
    * 6.07s → 1.60s solo at sf0.1), so the broadcast form is also the
    * FAST path at gate geometry, not merely the large-ks safe one.
    * Identical arithmetic and lowest-cid ties either way (spec-pinned
    * both branches; gates cover both since the m=4·ks=8 specs stay
    * literal). */
  private def subspaceCodeCols(
      codebooks: Seq[Seq[(Long, Seq[Double])]]): Seq[Column] =
    if (codebooks.map(_.size).sum <= ArgminLiteralMaxK)
      codebooks.zipWithIndex.map { case (cb, j) =>
        array_min(array(cb.map { case (cid, c) =>
          struct(l2sq(col(s"__s$j"), array(c.map(lit): _*)).as("d"),
            lit(cid).as("cid"))
        }: _*)).getField("cid")
      }
    else
      codebooks.indices.map(j =>
        argminCells(col(s"__s$j"), element_at(col("__cb"), j + 1))
          .getField("cid"))

  /** [[graft.functions.ArgMinCells]] as a Column. */
  private def argminCells(vec: Column, cells: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.ArgMinCells(
      ColumnBridge.expression(vec), ColumnBridge.expression(cells)))
  }

  /** Nearest-centroid assignment: collects the (small, k-row) centroid frame
    * and delegates to the literal-array argmin projection. Returns
    * (vec_id, v, cid). */
  def assignToCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
                        centroids: DataFrame): DataFrame =
    argminAssign(embeddings, idCol, vecCol, collectCentroids(centroids))

  /** [[assignToCentroids]] also emitting the squared L2 distance to the
    * assigned centroid (rounded to 6 — pure deterministic arithmetic, so
    * an external replay of the same algebraic form agrees exactly): the
    * dispersion input drift monitoring needs. Same zero-shuffle literal
    * argmin; the duplicated array_min folds in whole-stage codegen's
    * subexpression elimination. */
  def assignToCentroidsWithDist(embeddings: DataFrame, idCol: String,
                                vecCol: String,
                                centroids: DataFrame): DataFrame = {
    val cents = collectCentroids(centroids)
    require(cents.nonEmpty, "at least one centroid")
    if (cents.size <= ArgminLiteralMaxK) {
      val v = col(vecCol)
      val candidates = array(cents.map { case (cid, c) =>
        val cl = array(c.map(lit): _*)
        struct(l2sq(v, cl).as("d"), lit(cid).as("cid"))
      }: _*)
      embeddings.select(col(idCol).as("vec_id"),
        array_min(candidates).getField("cid").as("cid"),
        round(array_min(candidates).getField("d"), 6).as("d2"))
    } else {
      // large-k: the broadcast-join argmin (see [[argminAssignJoin]]) —
      // min over the UNROUNDED distance then round, same order of
      // operations as the literal branch
      val v = col(vecCol)
      embeddings
        .join(broadcast(cellsFrame(embeddings, cents)))
        .select(col(idCol).as("vec_id"),
          argminCells(v, col("__cells")).as("__best"))
        .select(col("vec_id"), col("__best").getField("cid").as("cid"),
          round(col("__best").getField("d"), 6).as("d2"))
    }
  }

  /** Embedding-space drift between two snapshots — the vector analogue
    * of [[Curation.corpusDrift]]: centroids are fitted on the OLD
    * snapshot only (the reference geometry), both snapshots assign to
    * those FROZEN cells, and each cell reports population share
    * (old / new / delta) plus mean squared distance to its centroid per
    * side. A new embedding model, a source-mix shift, or an ingest bug
    * shows up as share deltas (density moved between regions) or a
    * dispersion jump (the new data does not fit the old geometry) —
    * before it degrades retrieval quality downstream.
    *
    * Scale shape: k-means touches only the old snapshot (bounded
    * iterations, k×dim driver-resident centroids by design); both
    * assignment passes are the zero-shuffle literal-argmin projection;
    * each snapshot collapses to ≤ k cell rows plus a 1-row total, and
    * the k-row frames full-outer-join. Cells empty on one side report
    * zero share and a null mean distance. */
  def embeddingDrift(oldE: DataFrame, newE: DataFrame, idCol: String,
                     vecCol: String, k: Int, iters: Int): DataFrame = {
    val cent = kmeansCentroids(oldE, idCol, vecCol, k, iters)
    def cellStats(df: DataFrame, sfx: String) = {
      val total = df.agg(count(lit(1)).cast("double").as(s"__t_$sfx"))
      assignToCentroidsWithDist(df, idCol, vecCol, cent)
        .groupBy("cid")
        .agg(count(lit(1)).as(s"n_$sfx"),
          round(avg("d2"), 4).as(s"mean_d2_$sfx"))
        .crossJoin(broadcast(total))
        .withColumn(s"share_$sfx", round(col(s"n_$sfx") / col(s"__t_$sfx"), 6))
        .drop(s"__t_$sfx")
    }
    cellStats(oldE, "old").join(cellStats(newE, "new"), Seq("cid"), "full_outer")
      .select(col("cid"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("share_old"), lit(0.0)).as("share_old"),
        coalesce(col("share_new"), lit(0.0)).as("share_new"),
        round(coalesce(col("share_new"), lit(0.0)) -
          coalesce(col("share_old"), lit(0.0)), 6).as("share_delta"),
        col("mean_d2_old"), col("mean_d2_new"))
  }

  /** Total-variation distance between two corpora's cell-share
    * distributions under ONE standing coarse quantizer, in parts per
    * million — the drift statistic a nightly index-maintenance job gates
    * retraining on (pl12). With per-cell counts n_old/n_new and totals
    * N_old/N_new,
    *   TVD = Σ_c |n_new·N_old − n_old·N_new| / (2·N_old·N_new)
    * and the ppm form keeps EVERY step in integer arithmetic
    * (numerator·10^6 floor-divided by the denominator) — no float
    * accumulation whose order Spark's aggregation could permute, so an
    * external integer replay agrees exactly. The collects are k rows —
    * bounded by the cell count, never the corpus; the assignments
    * themselves are the zero-shuffle literal-argmin projection. */
  def cellShareTvdPpm(oldE: DataFrame, newE: DataFrame, idCol: String,
                      vecCol: String, centroids: DataFrame): Long = {
    val cents = collectCentroids(centroids)
    tvdPpmFromCounts(collectCellCounts(oldE, idCol, vecCol, cents),
      collectCellCounts(newE, idCol, vecCol, cents))
  }

  /** Per-cell assignment counts under a standing quantizer, as the
    * (cid, n) frame the index maintainers store — the ONE spelling of
    * the cell-count contract shared by the drift statistic and the
    * streaming maintainer's seed/merge/retrain paths. */
  def cellCounts(df: DataFrame, idCol: String, vecCol: String,
                 cents: Seq[(Long, Seq[Double])]): DataFrame =
    argminAssign(df, idCol, vecCol, cents)
      .groupBy("cid").agg(count(lit(1)).as("n"))

  /** [[cellCounts]] collected to the driver — k rows, bounded by the
    * cell count, never the corpus. */
  def collectCellCounts(df: DataFrame, idCol: String, vecCol: String,
                        cents: Seq[(Long, Seq[Double])]): Map[Long, Long] =
    cellCounts(df, idCol, vecCol, cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** The integer-ppm TVD core of [[cellShareTvdPpm]] over PRE-AGGREGATED
    * per-cell counts — the form the streaming maintainer uses, where the
    * standing side's counts are a stored |cells|-row table updated per
    * batch instead of a corpus re-assignment. The per-term products and
    * the ×10^6 scaling run in BigInt: n_new·N_old alone overflows Long
    * once the corpus×batch product passes ~9.2e18, and the scaled
    * numerator a thousand times sooner (~4.6e12, i.e. a 5e8-row corpus
    * against a 1e5-row batch at high drift) — a silent wrap there would
    * read as ppm ≈ 0 and ADMIT exactly the most-drifted batch. The
    * result is ≤ 10^6, so the final narrowing is always exact. */
  def tvdPpmFromCounts(co: Map[Long, Long], cn: Map[Long, Long]): Long = {
    val (no, nn) = (BigInt(co.values.sum), BigInt(cn.values.sum))
    require(no > 0 && nn > 0, "both corpora must be non-empty")
    val num = (co.keySet ++ cn.keySet).toSeq.map { cid =>
      (BigInt(cn.getOrElse(cid, 0L)) * no - BigInt(co.getOrElse(cid, 0L)) * nn).abs
    }.sum
    (num * 1000000 / (2 * no * nn)).toLong
  }

  /** IVF top-k: assign every vector to its nearest k-means centroid, probe
    * the `nprobe` centroids nearest the query, exact cosine within the
    * probed cells. The inverted-file analogue of [[annTopK]]: candidate
    * generation is an equi join on the cell id. */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, centroids: DataFrame, nprobe: Int): DataFrame = {
    val assigned = assignToCentroids(embeddings, idCol, vecCol, centroids)
    val q = embeddings.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qv"), norm2(col(vecCol)).as("__qn"))
    val probeCells = centroids.crossJoin(broadcast(q))
      .select(col("cid"), l2sq(col("__qv"), col("c")).as("__dist"))
      .orderBy(col("__dist"), col("cid"))
      .limit(nprobe)
      .select("cid")
    assigned.filter(col("vec_id") =!= queryId)
      .join(broadcast(probeCells), "cid")
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dot(col("v"), col("__qv")) / (norm2(col("v")) * col("__qn")), 6)
          .as("sim_r"))
      .orderBy(desc("sim_r"), col("vec_id"))
      .limit(k)
  }

  /** Batch IVF kNN JOIN — the approximate scale path for [[knnJoin]]:
    * instead of comparing every query against the FULL corpus (|Q|×N
    * similarity rows), each query probes only its `nprobe` nearest
    * k-means cells and compares against those cells' members. At 100 TB
    * this is the difference between a |Q|×N cross and |Q|×(nprobe/k
    * fraction of N): candidate generation becomes an equi-join on the
    * cell id, exactly the partitionable-join-key shape of the dedup
    * suite. Recall is the IVF trade — neighbours living in unprobed
    * cells are missed (measure with the x64 recall query; raise
    * `nprobe` to trade cost for recall; nprobe = |cells| degenerates to
    * exact).
    *
    * Plan shape: cell assignment is the zero-shuffle literal-argmin
    * projection; per-query probe cells come from a literal
    * array_sort+slice over k centroid structs (driver-resident k×dim,
    * same contract as [[ivfTopK]]); the probe frame (|Q|×nprobe rows,
    * carrying the query vector) BROADCASTS onto the assigned corpus —
    * queries are a sampled subset by construction — and the per-query
    * ranking is one window over the probed candidates only. */
  def ivfKnnJoin(embeddings: DataFrame, idCol: String, vecCol: String,
                 queryPred: Column, k: Int, centroids: DataFrame,
                 nprobe: Int): DataFrame = {
    require(k > 0 && nprobe > 0)
    val cents = collectCentroids(centroids)
    require(cents.nonEmpty, "at least one centroid")
    val assigned = assignToCentroids(embeddings, idCol, vecCol, centroids)
    val probes = withCellsCol(
        embeddings.filter(queryPred)
          .select(col(idCol).as("qid"), col(vecCol).as("__qv"),
            norm2(col(vecCol)).as("__qn")),
        cents)
      .select(col("qid"), col("__qv"), col("__qn"),
        explode(slice(array_sort(probeCandsCol(col("__qv"), cents)),
          1, nprobe)).as("__p"))
      .select(col("qid"), col("__qv"), col("__qn"),
        col("__p").getField("cid").as("cid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("sim_r"), col("vec_id"))
    assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(dot(col("v"), col("__qv")) / (norm2(col("v")) * col("__qn")), 6)
          .as("sim_r"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  // ---------------------------------------------------------- quantization

  /** Scalar int8 quantization of an embedding to the fixed range [-1, 1]:
    * q_i = round(clamp(v_i) · 127) ∈ [-127, 127]. The standard 4×
    * compression for ANN indexes at scale — a 100 TB float corpus becomes
    * 25 TB of int8 codes, and distance scans read a quarter of the bytes.
    * A pure per-row projection: zero shuffles, codegen'd, linear in dim.
    * Fixed-range (not per-vector max-abs) so the code of a vector never
    * depends on another pass over the data. */
  val QuantScale = 127
  def quantizeInt8(vec: Column): Column =
    transform(vec, x =>
      round(least(greatest(x.cast("double"), lit(-1.0)), lit(1.0)) * QuantScale)
        .cast("int"))

  /** Dequantized reconstruction of [[quantizeInt8]] codes. */
  def dequantize(codes: Column): Column =
    transform(codes, q => q.cast("double") / QuantScale)

  /** Per-vector reconstruction error of the int8 code: mean squared error
    * and max absolute error across dimensions, each a sequential fold so
    * the oracle replays the exact summation order. For in-range inputs the
    * per-dimension error is bounded by 1/(2·127), so mse ≤ ~1.55e-5 — the
    * spec asserts that bound. */
  def quantError(vec: Column): Column = {
    val err = zip_with(vec, dequantize(quantizeInt8(vec)),
      (x, r) => x.cast("double") - r)
    struct(
      (aggregate(err, lit(0.0), (acc, e) => acc + e * e)
        / nullif(size(vec), lit(0))).as("mse"),
      array_max(transform(err, e => abs(e))).as("max_abs_err"))
  }

  /** Embedding-cosine near-duplicate pairs, blocked by LSH bucket so the
    * pairwise comparison is bounded per block. The block key is always
    * derived from [[lshBucket]] — never a low-cardinality label column,
    * which would make each block a self-cross-product (O(n²/k) at 100 TB).
    * With p hyperplanes there are 2^p buckets, so per-block size is ~n/2^p
    * and the self-join is a partitionable hash join on `block`. */
  def nearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
                   planes: Seq[Array[Double]], threshold: Double): DataFrame = {
    // Norms are computed ONCE per vector before the self-join — inside the
    // pair projection each norm would be re-evaluated per candidate pair.
    val bucketed = embeddings.select(
      lshBucket(col(vecCol), planes).as("block"),
      col(idCol).as("id"), col(vecCol).as("v"), norm2(col(vecCol)).as("n"))
    val a = bucketed.select(col("block"), col("id").as("id_a"),
      col("v").as("va"), col("n").as("na"))
    val b = bucketed.select(col("block"), col("id").as("id_b"),
      col("v").as("vb"), col("n").as("nb"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("block"), col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("sim_r"))
      .filter(col("sim_r") >= threshold)
  }

  /** Cross-frame embedding near-dup pairs — SEMANTIC decontamination:
    * eval/benchmark items whose embedding has a training-corpus
    * neighbour at round-6 cosine ≥ `threshold`. The embedding-space
    * companion to the n-gram forms ([[Curation.decontaminate]] exact,
    * fuzzy-jaccard x45): paraphrased or translated contamination shares
    * no n-grams but lands in the same region of embedding space, which
    * is why modern model cards run the semantic pass too. Candidates
    * block on the shared LSH bucket, only CROSS pairs are compared
    * (never within-frame — that is [[nearDupPairs]]), and the recall
    * caveat is the bucket's: near-dups straddling a hyperplane are
    * missed, the standard LSH trade.
    *
    * Scale shape: identical to [[nearDupPairs]] — norms computed once
    * per vector before the join, the join is an equi-join on the bucket
    * (partitionable, never all-pairs), and the eval side is tiny by
    * construction, so AQE broadcasts it. Returns (block, id_eval,
    * id_train, sim_r). */
  def nearDupPairsAgainst(eval: DataFrame, train: DataFrame, idCol: String,
                          vecCol: String, planes: Seq[Array[Double]],
                          threshold: Double): DataFrame = {
    def prep(df: DataFrame, id: String, v: String, n: String) =
      df.select(lshBucket(col(vecCol), planes).as("block"),
        col(idCol).as(id), col(vecCol).as(v), norm2(col(vecCol)).as(n))
    prep(eval, "id_eval", "va", "na")
      .join(prep(train, "id_train", "vb", "nb"), Seq("block"))
      .select(col("block"), col("id_eval"), col("id_train"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
          .as("sim_r"))
      .filter(col("sim_r") >= threshold)
  }

  /** SemDeDup semantic dedup (Abbas et al. 2023, arXiv:2303.09540): k-means
    * cluster the embeddings, compare pairs only WITHIN a cluster, and drop
    * every vector that has ANY smaller-id cluster-mate with round-6 cosine
    * ≥ `threshold` — whether or not that mate itself survives (the greedy
    * keep-lowest-id form, the same anti-chain shape as exact dedup's
    * keep-first). Returns (vec_id, cid, is_kept), one row per vector.
    *
    * Clustering is what makes this scale: candidate pairs are bounded per
    * cluster — never corpus-wide all-pairs — and the cluster count k is
    * the knob trading recall (near-dups straddling a centroid boundary are
    * missed) against per-cluster join size. Complements [[nearDupPairs]]:
    * LSH buckets block by random projection; SemDeDup blocks by learned
    * cluster structure, which concentrates semantic duplicates far better
    * when the corpus has topical clusters. Assignment is the zero-shuffle
    * literal-argmin projection ([[assignToCentroids]]); the self-join is
    * an equi-join on `cid`; no frame persists (every leg is a projection
    * over the scan, the cheapest thing to recompute). */
  def semanticDedup(embeddings: DataFrame, idCol: String, vecCol: String,
                    centroids: DataFrame, threshold: Double): DataFrame = {
    val assigned = assignToCentroids(embeddings, idCol, vecCol, centroids)
      .select(col("vec_id"), col("cid"), col("v"), norm2(col("v")).as("n"))
    val a = assigned.select(col("cid"), col("vec_id").as("id_a"),
      col("v").as("va"), col("n").as("na"))
    val b = assigned.select(col("cid"), col("vec_id").as("id_b"),
      col("v").as("vb"), col("n").as("nb"))
    val drops = a.join(b, Seq("cid"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
        >= threshold)
      .select(col("id_b").as("vec_id")).distinct()
    assigned.join(drops.withColumn("__dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"), col("__dup").isNull.as("is_kept"))
  }

  /** Exact cosine kNN JOIN for a query SUBSET: top-k neighbours of every
    * vector matching `queryPred`, in one pass over the embedding table.
    * The batch form of [[bruteForceTopK]] (which serves one query).
    *
    * Plan shape: the |Q|-row query side (vectors + precomputed norms) is
    * broadcast; the scan side computes its norm once per row, then the
    * |Q|×N similarity rows are cut to (qid, id, sim) — the embedding
    * itself NEVER enters the per-query ranking shuffle, so the
    * `row_number` window moves skinny 3-column rows hash-partitioned by
    * qid. Exact and linear in |Q|·N: right for a sampled/bounded query set
    * (the oracle-checkable baseline); for |Q| ~ N use the LSH-bucketed
    * candidate generation of [[annTopK]]/[[nearDupPairs]] instead. */
  def knnJoin(embeddings: DataFrame, idCol: String, vecCol: String,
              queryPred: Column, k: Int): DataFrame = {
    val q = embeddings.filter(queryPred)
      .select(col(idCol).as("qid"), col(vecCol).as("__qv"),
        norm2(col(vecCol)).as("__qn"))
    val scan = embeddings.select(col(idCol), col(vecCol).as("__v"),
      norm2(col(vecCol)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("sim_r"), col(idCol))
    scan.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol),
        round(dot(col("__v"), col("__qv")) / (col("__n") * col("__qn")), 6)
          .as("sim_r"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** [[knnJoin]] with the per-query ranking routed through the native
    * bounded-heap top-k operator ([[graft.plans.TopKPerKey]]): the |Q|×N
    * similarity rows are cut to ≤ k per (qid × input partition) by the
    * map-side partial heap BEFORE the ranking exchange, where the window
    * form shuffles all |Q|×N rows and fully SORTS every query's N
    * candidates just to keep k. The rank column is re-derived by a
    * row_number over the ≤ k×|Q| survivors — a frame smaller than the
    * window form's input by a factor of N/k. The heap operator's
    * key-cardinality contract holds structurally: the keys are the
    * bounded query subset. Row-identical to [[knnJoin]] (same total
    * order, same k). */
  def knnJoinNative(embeddings: DataFrame, idCol: String, vecCol: String,
                    queryPred: Column, k: Int): DataFrame = {
    val q = embeddings.filter(queryPred)
      .select(col(idCol).as("qid"), col(vecCol).as("__qv"),
        norm2(col(vecCol)).as("__qn"))
    val scan = embeddings.select(col(idCol), col(vecCol).as("__v"),
      norm2(col(vecCol)).as("__n"))
    val sims = scan.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol),
        round(dot(col("__v"), col("__qv")) / (col("__n") * col("__qn")), 6)
          .as("sim_r"))
    val cut = graft.plans.TopKPerKey.topKPerKey(sims, Seq("qid"),
      Seq(desc("sim_r"), col(idCol)), k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("sim_r"), col(idCol))
    cut.withColumn("rk", row_number().over(w))
  }

  /** Hard-negative mining for contrastive/embedding training (the
    * DPR/ANCE recipe — Karpukhin et al. 2020 §4.2, Xiong et al. 2021):
    * for each query vector, the k MOST similar candidates whose label
    * DIFFERS — semantically close yet wrong, exactly the negatives that
    * teach an encoder its decision boundary (random negatives are too
    * easy; same-label neighbors would be false negatives). The shape is
    * [[knnJoinNative]] with the label-mismatch predicate applied BEFORE
    * the heap cut, so the k survivors are all true negatives (filtering
    * after a plain kNN would return fewer than k wherever a query's
    * neighborhood is label-pure). Scale: broadcast query side, one
    * corpus scan, map-side partial heaps cut |Q|×N to ≤ k·|Q| before the
    * only exchange — at production |Q|~N, route candidates through the
    * IVF/PQ index instead (x76's routed form) and keep this predicate. */
  def hardNegatives(embeddings: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, queryPred: Column, k: Int): DataFrame =
    labelMatchedKnn(embeddings, idCol, vecCol, labelCol, queryPred, k,
      sameLabel = false, labelOut = "neg_label")

  /** The POSITIVE twin of [[hardNegatives]]: for each query vector, the k
    * most similar candidates whose label MATCHES — the in-batch positive
    * a contrastive pair needs when positives aren't given a priori
    * (nearest same-label neighbor as the anchor's positive; the pl15
    * training-pair exporter consumes k = 1). Same shape, same rounded
    * cosine, same tie order — only the label predicate flips. */
  def hardPositives(embeddings: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, queryPred: Column, k: Int): DataFrame =
    labelMatchedKnn(embeddings, idCol, vecCol, labelCol, queryPred, k,
      sameLabel = true, labelOut = "pos_label")

  private def labelMatchedKnn(embeddings: DataFrame, idCol: String,
                              vecCol: String, labelCol: String,
                              queryPred: Column, k: Int, sameLabel: Boolean,
                              labelOut: String): DataFrame = {
    val q = embeddings.filter(queryPred)
      .select(col(idCol).as("qid"), col(vecCol).as("__qv"),
        col(labelCol).as("__ql"), norm2(col(vecCol)).as("__qn"))
    val scan = embeddings.select(col(idCol), col(vecCol).as("__v"),
      col(labelCol).as("__l"), norm2(col(vecCol)).as("__n"))
    val labelPred =
      if (sameLabel) col("__l") === col("__ql") else col("__l") =!= col("__ql")
    val sims = scan.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("qid") && labelPred)
      .select(col("qid"), col(idCol), col("__l").as(labelOut),
        round(dot(col("__v"), col("__qv")) / (col("__n") * col("__qn")), 6)
          .as("sim_r"))
    val cut = graft.plans.TopKPerKey.topKPerKey(sims, Seq("qid"),
      Seq(desc("sim_r"), col(idCol)), k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("sim_r"), col(idCol))
    cut.withColumn("rk", row_number().over(w))
  }

  // ------------------------------------------------- product quantization

  /** Product-quantization codebooks (Jégou, Douze & Schmid, "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011): the vector
    * splits into `m` contiguous subvectors of dim/m coordinates, and each
    * subspace is coarse-quantized independently by the SAME deterministic
    * k-means as the IVF path ([[kmeansCentroids]]: first-ks init, round-6
    * centroid updates, lowest-cid tie-breaks — so an external oracle can
    * replay every codebook exactly). Returns one (cid, centroid) table per
    * subspace, driver-resident like IVF's centroids (m·ks·(dim/m) doubles,
    * bounded by the codebook — never the data).
    *
    * This is the standard 100 TB index form: a vector stores m codes
    * (one byte each at ks=256) instead of 4·dim float bytes — 16× for
    * dim=64/m=16 — and the distance scan reads codes + a per-query LUT
    * instead of the vectors. Composes with IVF ([[ivfKnnJoin]]): probe
    * cells first, ADC-rank the probed cells' codes, exact re-rank on the
    * full vectors for the survivors only (the [[knnJoinProjected]]
    * two-stage shape with codes as stage 1). */
  def pqCodebooks(embeddings: DataFrame, idCol: String, vecCol: String,
                  dim: Int, m: Int, ks: Int, iters: Int): Seq[Seq[(Long, Seq[Double])]] = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    // All m chains train FUSED: the m per-subspace Lloyd iterations are
    // independent projections of the SAME row, so each iteration is ONE
    // scan — per-subspace argmin cids, (subspace, cid, subvector) rows
    // stacked map-side, every subspace's k×sub means in one keyed
    // aggregation — instead of m separate sequential k-means jobs (m=8
    // ran 8.6s of driver-roundtrip Lloyd loops; fused, the whole
    // training costs what one chain does). Results are identical to
    // independent chains: the groups and their members never mix across
    // subspaces, and round-6 means absorb aggregation-order ulp exactly
    // as [[kmeansCentroids]] documents.
    val sliced = embeddings.select(col(idCol) +: (0 until m).map(j =>
      transform(slice(col(vecCol), j * sub + 1, sub), _.cast("double"))
        .as(s"__s$j")): _*)
    // one collect of the first-ks rows seeds every subspace's codebook
    val seed = sliced.filter(col(idCol) < ks)
      .select(col(idCol).cast("long").as("cid") +:
        (0 until m).map(j => col(s"__s$j")): _*)
      .collect()
      .map(r => (r.getLong(0), (0 until m).map(j => r.getSeq[Double](j + 1))))
      .sortBy(_._1).toSeq
    var cents: Seq[Seq[(Long, Seq[Double])]] =
      (0 until m).map(j => seed.map { case (cid, subs) => (cid, subs(j)) })
    for (_ <- 1 to iters) {
      // per-subspace argmin: literal candidates at ks ≤ ArgminLiteralMaxK,
      // the ArgMinCells fold over the one-row-broadcast codebook set above
      // (the iteration's plan must not inline m·ks literal trees at
      // production ks — the same dispatch as [[subspaceCodeCols]], built
      // from THIS iteration's centroids)
      val src = if (m * ks <= ArgminLiteralMaxK) sliced
        else sliced.join(broadcast(codebooksFrame(sliced, cents)))
      val stacked = src.select(explode(array((0 until m).map { j =>
        val v = col(s"__s$j")
        val cidCol =
          if (m * ks <= ArgminLiteralMaxK)
            array_min(array(cents(j).map { case (cid, c) =>
              struct(l2sq(v, array(c.map(lit): _*)).as("d"), lit(cid).as("cid"))
            }: _*)).getField("cid")
          else argminCells(v, element_at(col("__cb"), j + 1)).getField("cid")
        struct(lit(j).as("sub"), cidCol.as("cid"), v.as("v"))
      }: _*)).as("e"))
        .select(col("e.sub"), col("e.cid"),
          posexplode(col("e.v")).as(Seq("pos", "x")))
      val rows = stacked.groupBy("sub", "cid", "pos")
        .agg(round(avg(col("x")), 6).as("mx"))
        .collect()
      cents = (0 until m).map { j =>
        rows.filter(_.getInt(0) == j)
          .groupBy(_.getLong(1))
          .map { case (cid, rs) =>
            (cid, rs.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq)
          }
          .toSeq.sortBy(_._1)
      }
    }
    cents
  }

  /** PQ encoding: per subspace, the code is the argmin-distance codebook
    * entry (exact [[l2sq]] algebraic form, lowest-cid tie-break — the
    * [[assignToCentroids]] literal-argmin projection per subspace). A pure
    * zero-shuffle projection over one scan; subvector slices materialize
    * to attributes once so the ks-candidate argmin never re-slices.
    * Returns (id, codes array). */
  /** `carry` columns pass through unchanged beside (id, codes) — index
    * metadata written ONCE at build time (e.g. the label column the
    * hard-negative serve filters on), so serving never joins the corpus
    * for per-row attributes. */
  def pqEncode(embeddings: DataFrame, idCol: String, vecCol: String,
               codebooks: Seq[Seq[(Long, Seq[Double])]],
               carry: Seq[String] = Nil): DataFrame = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebook")
    val sub = codebooks.head.head._2.length
    val sliced = withCodebooksCol(
      embeddings.select((col(idCol) +: carry.map(col)) ++
        codebooks.indices.map(j =>
          slice(col(vecCol), j * sub + 1, sub).as(s"__s$j")): _*),
      codebooks)
    sliced.select((col(idCol) +: carry.map(col)) :+
      array(subspaceCodeCols(codebooks): _*).as("codes"): _*)
  }

  /** Per-query ADC lookup tables: for each subspace, a code → partial-
    * distance map computed ONCE per query row (m·ks small [[l2sq]]s of the
    * query subvector against the literal codebook) — the classic PQ
    * per-query LUT, expressed declaratively, so the scan side pays m
    * SCALAR map lookups + adds per (query, code) pair instead of m
    * dot-product triples. The lookup values are the identical double
    * arithmetic the oracle replays pairwise. */
  private def adcLutColumns(vecCol: String,
                            codebooks: Seq[Seq[(Long, Seq[Double])]]): Seq[Column] = {
    val sub = codebooks.head.head._2.length
    codebooks.zipWithIndex.map { case (cb, j) =>
      val qSub = slice(col(vecCol), j * sub + 1, sub)
      map(cb.flatMap { case (cid, c) =>
        Seq(lit(cid), l2sq(qSub, array(c.map(lit): _*)))
      }: _*).as(s"__lut$j")
    }
  }

  /** Project `keep` plus the per-subspace ADC LUT columns onto a QUERY
    * frame, the form picked by codebook size: the literal map at ks ≤
    * [[ArgminLiteralMaxK]] (m·ks literal entries — right at gate ks,
    * a plan blow-up at production ks), `map_from_entries` over the
    * one-row-broadcast `__cb` column above it. The HOF lambda runs
    * interpreted, but only per QUERY row — the query side is sampled/
    * bounded by construction everywhere LUTs are built; the corpus-side
    * ADC scan pays the same m map lookups either way. LUT VALUES are the
    * identical [[l2sq]] arithmetic in both forms. */
  private def withAdcLuts(frame: DataFrame, keep: Seq[Column], vecCol: String,
                          codebooks: Seq[Seq[(Long, Seq[Double])]]): DataFrame =
    if (codebooks.head.size <= ArgminLiteralMaxK)
      frame.select(keep ++ adcLutColumns(vecCol, codebooks): _*)
    else {
      val sub = codebooks.head.head._2.length
      val luts = codebooks.indices.map { j =>
        val qSub = slice(col(vecCol), j * sub + 1, sub)
        map_from_entries(transform(element_at(col("__cb"), j + 1),
          cell => struct(cell.getField("_1"),
            l2sq(qSub, cell.getField("_2"))))).as(s"__lut$j")
      }
      frame.join(broadcast(codebooksFrame(frame, codebooks)))
        .select(keep ++ luts: _*)
    }

  /** ADC distance from the stacked LUT columns and the codes array —
    * left-associated sum, matching the oracle's `+` chain. */
  private def adcDist(codebooks: Seq[Seq[(Long, Seq[Double])]]): Column =
    codebooks.indices.map(j =>
      element_at(col(s"__lut$j"), col("codes").getItem(j))).reduce(_ + _)

  /** Batch PQ kNN join by ASYMMETRIC distance computation (ADC): each
    * query's full-precision subvectors are compared against the CODES'
    * reconstructed centroids — distance = Σ_j l2sq(q_j, codebook_j[code_j]),
    * rounded to 6 (pure deterministic arithmetic; the oracle replays it).
    * The scan side carries only (id, m codes): at ks=256 that is m bytes
    * per vector against 4·dim for the exact join — the compressed-scan
    * form a 100 TB ANN index runs. Candidates cut through the native
    * bounded-heap operator before any exchange, exactly like
    * [[knnJoinNative]]. Approximate by construction (quantization error
    * moves near-boundary neighbours): measure recall against the exact
    * join per query — the x71 gate — and trade m/ks for recall. */
  def pqKnnJoin(embeddings: DataFrame, idCol: String, vecCol: String,
                queryPred: Column, k: Int,
                codebooks: Seq[Seq[(Long, Seq[Double])]]): DataFrame = {
    // The codes frame is the PQ INDEX — at scale it is precomputed and
    // stored (the band-index move); in-query, persist it so the ks·m-way
    // argmin encode runs once per vector, not re-inlined through the
    // broadcast join into every (query, vector) pair (the x66 projection-
    // inlining trap: measured 2× on x71, which also reuses the cache
    // across its ADC and refine branches). Caller releases via GraftCache.
    val codes = graft.GraftCache.persist(
      pqEncode(embeddings, idCol, vecCol, codebooks))
    val q = withAdcLuts(embeddings.filter(queryPred),
      Seq(col(idCol).as("qid")), vecCol, codebooks)
    val ranked = codes.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol), round(adcDist(codebooks), 6).as("adc_d2"))
    graft.plans.TopKPerKey.topKPerKey(ranked, Seq("qid"),
      Seq(col("adc_d2"), col(idCol)), k)
  }

  /** [[pqKnnJoin]] with the corpus side ALREADY encoded — the serving
    * form over a stored index ([[writePqIndex]]/[[appendPqIndex]]): the
    * query frame's per-row ADC LUTs broadcast onto the codes scan, so
    * the index is never reshuffled and the corpus vectors are never
    * read; candidates heap-cut per query before any exchange. The
    * building block the streaming semantic screen
    * ([[graft.streaming.EventStreams.screenArrivalsSemantic]]) runs per
    * micro-batch. */
  def pqKnnAgainstCodes(newVectors: DataFrame, idCol: String, vecCol: String,
                        codes: DataFrame, k: Int,
                        codebooks: Seq[Seq[(Long, Seq[Double])]]): DataFrame = {
    val q = withAdcLuts(newVectors,
      Seq(col(idCol).as("qid")), vecCol, codebooks)
    val ranked = codes.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol), round(adcDist(codebooks), 6).as("adc_d2"))
    graft.plans.TopKPerKey.topKPerKey(ranked, Seq("qid"),
      Seq(col("adc_d2"), col(idCol)), k)
  }

  /** Two-stage batch kNN OFF the stored PQ index — the deployed
    * high-recall serve (x71 measures the step-up: 0.27 raw ADC → 0.73
    * refined on the adversarial iid embeddings): stage 1 ranks the
    * stored codes by ADC ([[pqKnnAgainstCodes]]) and keeps `candidates`
    * per query, heap-cut before any exchange; stage 2 fetches ONLY the
    * survivors' full vectors — an equi join on id, candidate-pool-sized,
    * never corpus-sized — and re-ranks them exactly. The index answers
    * from m-byte codes; the corpus is touched `candidates` rows per
    * query deep. */
  def pqKnnAgainstCodesRefined(queries: DataFrame, idCol: String,
                               vecCol: String, full: DataFrame, k: Int,
                               candidates: Int,
                               codebooks: Seq[Seq[(Long, Seq[Double])]],
                               codes: DataFrame): DataFrame = {
    require(candidates >= k, "candidate pool must cover k")
    val cands = pqKnnAgainstCodes(queries, idCol, vecCol, codes, candidates,
      codebooks).select("qid", idCol)
    val fullV = full.select(col(idCol), col(vecCol).as("__v"))
    val qf = queries.select(col(idCol).as("qid"), col(vecCol).as("__qv"))
    val ranked = cands.join(fullV, idCol)
      .join(broadcast(qf), "qid")
      .select(col("qid"), col(idCol), l2sq(col("__v"), col("__qv")).as("__d"))
    graft.plans.TopKPerKey.topKPerKey(ranked, Seq("qid"),
        Seq(col("__d"), col(idCol)), k)
      .select(col("qid"), col(idCol), round(col("__d"), 6).as("d2"))
  }

  /** Hard-negative mining OFF the stored PQ index — the 100 TB form of
    * [[hardNegatives]] (whose exact scan is linear per mining batch):
    * stage 1 shortlists `candidates` per query by ADC over the STORED
    * codes with the label-mismatch predicate applied BEFORE the heap cut
    * — the index carries the label column ([[writePqIndex]]'s `carry`,
    * written once at build time), so serving reads labels as part of the
    * m-byte code rows and never joins the corpus; stage 2 re-ranks ONLY
    * the surviving true negatives on their full vectors (id equi join,
    * candidate-pool-sized) by the SAME rounded cosine as the exact miner,
    * so the two forms differ only in shortlist misses — which the recall
    * gate (x108) measures against the exact form, alongside x80/x82.
    * Every query fills k true negatives whenever its shortlist does. */
  def hardNegativesIndexed(queries: DataFrame, idCol: String, vecCol: String,
                           labelCol: String, full: DataFrame, k: Int,
                           candidates: Int,
                           codebooks: Seq[Seq[(Long, Seq[Double])]],
                           codes: DataFrame): DataFrame = {
    require(candidates >= k, "candidate pool must cover k")
    val q = withAdcLuts(queries,
      Seq(col(idCol).as("qid"), col(labelCol).as("__ql")), vecCol, codebooks)
    val ranked = codes.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("qid") && col(labelCol) =!= col("__ql"))
      .select(col("qid"), col(idCol), col(labelCol).as("neg_label"),
        round(adcDist(codebooks), 6).as("adc_d2"))
    val cands = graft.plans.TopKPerKey.topKPerKey(ranked, Seq("qid"),
        Seq(col("adc_d2"), col(idCol)), candidates)
      .select("qid", idCol, "neg_label")
    refineMined(cands, queries, idCol, vecCol, full, k, "neg_label")
  }

  /** Hard-negative mining through the ROUTED composed index — the form a
    * 100 TB miner actually deploys: each query's nprobe nearest cells
    * compute as a zero-shuffle projection, the candidate set is a cid
    * EQUI JOIN against the stored (range-laid) codes — the probe's
    * `cid IN` pushes to parquet min/max file pruning, so a mining batch
    * reads ~nprobe/k of the index, m bytes + one label per touched
    * vector — the label-mismatch predicate applies BEFORE the per-query
    * heap cut, and the exact cosine re-rank touches only survivors.
    * [[hardNegativesIndexed]] with x76's routing as stage 1; same output
    * contract, same oracle shape, recall bounded below the all-codes
    * form only by routing misses (neighbours outside the probed
    * cells). */
  def hardNegativesRouted(queries: DataFrame, idCol: String, vecCol: String,
                          labelCol: String, full: DataFrame, k: Int,
                          candidates: Int, nprobe: Int,
                          cents: Seq[(Long, Seq[Double])],
                          codebooks: Seq[Seq[(Long, Seq[Double])]],
                          codes: DataFrame): DataFrame =
    routedLabelMatchedKnn(queries, idCol, vecCol, labelCol, full, k,
      candidates, nprobe, cents, codebooks, codes,
      sameLabel = false, labelOut = "neg_label")

  /** The POSITIVE twin of [[hardNegativesRouted]] — the deploy form of
    * [[hardPositives]] (whose exact scan is linear per mining batch):
    * nearest SAME-label candidates off the stored routed index, the
    * label-EQUALITY predicate before the heap cut, exact cosine re-rank
    * of survivors. The pl15 training-pair exporter mines both sides of
    * its units through this routed path; x113 is the recall-honesty gate
    * vs the exact miner, mirroring x108's for negatives. */
  def hardPositivesRouted(queries: DataFrame, idCol: String, vecCol: String,
                          labelCol: String, full: DataFrame, k: Int,
                          candidates: Int, nprobe: Int,
                          cents: Seq[(Long, Seq[Double])],
                          codebooks: Seq[Seq[(Long, Seq[Double])]],
                          codes: DataFrame): DataFrame =
    routedLabelMatchedKnn(queries, idCol, vecCol, labelCol, full, k,
      candidates, nprobe, cents, codebooks, codes,
      sameLabel = true, labelOut = "pos_label")

  private def routedLabelMatchedKnn(
      queries: DataFrame, idCol: String, vecCol: String, labelCol: String,
      full: DataFrame, k: Int, candidates: Int, nprobe: Int,
      cents: Seq[(Long, Seq[Double])],
      codebooks: Seq[Seq[(Long, Seq[Double])]], codes: DataFrame,
      sameLabel: Boolean, labelOut: String): DataFrame = {
    require(candidates >= k, "candidate pool must cover k")
    require(cents.nonEmpty, "routed mining requires centroids")
    val v = col(vecCol)
    val qProbes = withCellsCol(queries, cents).select(col(idCol).as("qid"),
      explode(transform(slice(array_sort(probeCandsCol(v, cents)), 1, nprobe),
        p => p.getField("cid"))).as("cid"))
    val qLuts = withAdcLuts(queries,
      Seq(col(idCol).as("qid"), col(labelCol).as("__ql")), vecCol, codebooks)
    val labelPred =
      if (sameLabel) col(labelCol) === col("__ql")
      else col(labelCol) =!= col("__ql")
    val ranked = codes.join(broadcast(qProbes), "cid")
      .join(broadcast(qLuts), "qid")
      .filter(col(idCol) =!= col("qid") && labelPred)
      .select(col("qid"), col(idCol), col(labelCol).as(labelOut),
        round(adcDist(codebooks), 6).as("adc_d2"))
    val cands = graft.plans.TopKPerKey.topKPerKey(ranked, Seq("qid"),
        Seq(col("adc_d2"), col(idCol)), candidates)
      .select("qid", idCol, labelOut)
    refineMined(cands, queries, idCol, vecCol, full, k, labelOut)
  }

  /** BOTH mining sides off ONE ADC candidate scan (optimization r19 —
    * pl15 runs the positive and the negative miner over the same query
    * batch, same index, same probe fan-out; the only difference is the
    * row-local label predicate applied before each heap cut, so two
    * label-filtered cuts over a shared scanned frame produce candidate
    * sets identical by construction to two independent
    * [[routedLabelMatchedKnn]] scans — which the x108/x113 recall gates
    * keep gating individually). Returns (positives at kPos, negatives at
    * kNeg) with exactly [[hardPositivesRouted]]/[[hardNegativesRouted]]'s
    * columns and ranking. The shared frame persists through GraftCache
    * (two consumers; the harness releases it per query). */
  def minedPairsRouted(queries: DataFrame, idCol: String, vecCol: String,
                       labelCol: String, full: DataFrame, kPos: Int,
                       kNeg: Int, candidates: Int, nprobe: Int,
                       cents: Seq[(Long, Seq[Double])],
                       codebooks: Seq[Seq[(Long, Seq[Double])]],
                       codes: DataFrame): (DataFrame, DataFrame) = {
    require(candidates >= math.max(kPos, kNeg), "candidate pool must cover k")
    require(cents.nonEmpty, "routed mining requires centroids")
    val v = col(vecCol)
    val qProbes = withCellsCol(queries, cents).select(col(idCol).as("qid"),
      explode(transform(slice(array_sort(probeCandsCol(v, cents)), 1, nprobe),
        p => p.getField("cid"))).as("cid"))
    val qLuts = withAdcLuts(queries,
      Seq(col(idCol).as("qid"), col(labelCol).as("__ql")), vecCol, codebooks)
    val scanned = graft.GraftCache.persist(
      codes.join(broadcast(qProbes), "cid")
        .join(broadcast(qLuts), "qid")
        .filter(col(idCol) =!= col("qid"))
        .select(col("qid"), col(idCol), col(labelCol), col("__ql"),
          round(adcDist(codebooks), 6).as("adc_d2")))
    def side(pred: Column, labelOut: String, k: Int): DataFrame = {
      val cands = graft.plans.TopKPerKey.topKPerKey(scanned.filter(pred),
          Seq("qid"), Seq(col("adc_d2"), col(idCol)), candidates)
        .select(col("qid"), col(idCol), col(labelCol).as(labelOut))
      refineMined(cands, queries, idCol, vecCol, full, k, labelOut)
    }
    (side(col(labelCol) === col("__ql"), "pos_label", kPos),
      side(col(labelCol) =!= col("__ql"), "neg_label", kNeg))
  }

  /** Stage 2 of every indexed miner: exact cosine re-rank of the
    * shortlist on the full vectors (id equi join, candidate-pool-sized),
    * same rounded metric and tie order as the exact [[hardNegatives]] /
    * [[hardPositives]]. */
  private def refineMined(cands: DataFrame, queries: DataFrame,
                          idCol: String, vecCol: String,
                          full: DataFrame, k: Int,
                          labelOut: String): DataFrame = {
    val fullV = full.select(col(idCol), col(vecCol).as("__v"),
      norm2(col(vecCol)).as("__n"))
    val qf = queries.select(col(idCol).as("qid"), col(vecCol).as("__qv"),
      norm2(col(vecCol)).as("__qn"))
    val exact = cands.join(fullV, idCol).join(broadcast(qf), "qid")
      .select(col("qid"), col(idCol), col(labelOut),
        round(dot(col("__v"), col("__qv")) / (col("__n") * col("__qn")), 6)
          .as("sim_r"))
    val cut = graft.plans.TopKPerKey.topKPerKey(exact, Seq("qid"),
      Seq(desc("sim_r"), col(idCol)), k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("sim_r"), col(idCol))
    cut.withColumn("rk", row_number().over(w))
  }

  /** ROUTED batch kNN over the stored composed index
    * ([[writeIvfPqIndex]]) — the production batch-ANN join: each query
    * row computes its nprobe nearest cells as a zero-shuffle projection
    * (literal-centroid array_sort, ties on lowest cid — identical
    * arithmetic to the oracle's row_number replay), explodes to
    * (qid, cid, LUTs) probe rows, and the candidate set is an EQUI JOIN
    * on the cell id — the probe frame broadcasts onto the codes scan, so
    * the index is never fanned out per query the way the all-codes scan
    * ([[pqKnnAgainstCodes]]) is, and each query's ADC work shrinks to
    * its probed cells (~nprobe/k of the corpus, m bytes per touched
    * vector). Candidates heap-cut per qid before any exchange. The
    * nprobe = |cells| degenerate case equals the full ADC scan
    * (spec-pinned), and the ranking is oracle-gated end to end (x76). */
  def pqKnnAgainstCodesRouted(queries: DataFrame, idCol: String, vecCol: String,
                              k: Int, nprobe: Int,
                              cents: Seq[(Long, Seq[Double])],
                              codebooks: Seq[Seq[(Long, Seq[Double])]],
                              codes: DataFrame): DataFrame = {
    require(cents.nonEmpty, "routed kNN requires centroids")
    val v = col(vecCol)
    // probe pairs and LUTs broadcast as SEPARATE tiny frames: exploding
    // the LUT columns with the probes would ship every query's m maps
    // nprobe times in the broadcast payload (~nprobe× the necessary
    // bytes at production ks/m) — instead the codes scan joins the
    // (qid, cid) pairs on cid, then picks up each query's LUTs once via
    // the qid join
    val qProbes = withCellsCol(queries, cents).select(col(idCol).as("qid"),
      explode(transform(slice(array_sort(probeCandsCol(v, cents)), 1, nprobe),
        p => p.getField("cid"))).as("cid"))
    val qLuts = withAdcLuts(queries,
      Seq(col(idCol).as("qid")), vecCol, codebooks)
    val ranked = codes.join(broadcast(qProbes), "cid")
      .filter(col(idCol) =!= col("qid"))
      .join(broadcast(qLuts), "qid")
      .select(col("qid"), col(idCol), round(adcDist(codebooks), 6).as("adc_d2"))
    graft.plans.TopKPerKey.topKPerKey(ranked, Seq("qid"),
      Seq(col("adc_d2"), col(idCol)), k)
  }

  /** FILTERED routed kNN — the production "top-k among rows WHERE p"
    * serve over the stored composed index: the predicate evaluates over
    * CARRIED columns of the codes rows ([[writeIvfPqIndex]]'s `carry`,
    * written once at build), and is applied to the codes SCAN — below
    * the probe join and the per-query heap cut — so equality/range
    * predicates reach the parquet reader as PushedFilters beside the
    * probe's cid file pruning, arithmetic ones (a modulo) evaluate in
    * the scan-side filter directly above it (both plan-audited), and a
    * query still reads ~nprobe/k of the index, m bytes + the carried
    * columns per touched vector.
    * [[pqKnnAgainstCodesRouted]] with the predicate as stage 0; same
    * ADC ranking, ties on lowest id. Recall honesty: a stricter
    * predicate pushes the k-th TRUE filtered neighbour farther from the
    * query, so at fixed nprobe more of the exact filtered top-k falls
    * outside the probed cells — [[filteredRecallGrid]] measures exactly
    * that selectivity×nprobe interaction against the exact filtered
    * kNN (the x126/x128 gate pair). */
  def filteredKnnRouted(queries: DataFrame, idCol: String, vecCol: String,
                        k: Int, nprobe: Int,
                        cents: Seq[(Long, Seq[Double])],
                        codebooks: Seq[Seq[(Long, Seq[Double])]],
                        codes: DataFrame, pred: Column): DataFrame = {
    require(cents.nonEmpty, "routed kNN requires centroids")
    val v = col(vecCol)
    val qProbes = withCellsCol(queries, cents).select(col(idCol).as("qid"),
      explode(transform(slice(array_sort(probeCandsCol(v, cents)), 1, nprobe),
        p => p.getField("cid"))).as("cid"))
    val qLuts = withAdcLuts(queries,
      Seq(col(idCol).as("qid")), vecCol, codebooks)
    val ranked = codes.filter(pred).join(broadcast(qProbes), "cid")
      .filter(col(idCol) =!= col("qid"))
      .join(broadcast(qLuts), "qid")
      .select(col("qid"), col(idCol), round(adcDist(codebooks), 6).as("adc_d2"))
    graft.plans.TopKPerKey.topKPerKey(ranked, Seq("qid"),
      Seq(col("adc_d2"), col(idCol)), k)
  }

  /** The selectivity×nprobe honesty grid for [[filteredKnnRouted]]: for
    * each named predicate and each nprobe 1..maxProbe, the micro
    * recall@k of the filtered routed serve against the EXACT filtered
    * kNN (brute L2 over the predicate's survivors) — integer ppm, so an
    * external engine replays the exact numbers. ONE probe fan-out and
    * ONE ADC candidate scan at maxProbe serve the whole grid: the
    * predicates are row-local over carried columns, so filtering the
    * cached candidate frame is identical to filtering the codes scan
    * (what the serve does), and each grid cell is a filter + heap cut —
    * never |preds|·maxProbe separate scans. The exact side runs once
    * per predicate (build-time honesty cost, the x80/x108 discipline). */
  def filteredRecallGrid(queries: DataFrame, idCol: String, vecCol: String,
                         full: DataFrame, k: Int, maxProbe: Int,
                         cents: Seq[(Long, Seq[Double])],
                         codebooks: Seq[Seq[(Long, Seq[Double])]],
                         codes: DataFrame, carry: Seq[String],
                         preds: Seq[(String, Column)]): DataFrame = {
    require(maxProbe >= 1, "maxProbe must cover at least one cell")
    require(preds.nonEmpty, "grid needs at least one predicate")
    val qProbes = probeRankFrame(queries, idCol, vecCol, cents, maxProbe,
      carryQv = false)
    val qLuts = withAdcLuts(queries, Seq(col(idCol).as("qid")), vecCol,
      codebooks)
    val cand = graft.GraftCache.persist(
      codes.join(broadcast(qProbes), "cid")
        .filter(col(idCol) =!= col("qid"))
        .join(broadcast(qLuts), "qid")
        .select(Seq(col("qid"), col(idCol), col("__cellrank"),
          round(adcDist(codebooks), 6).as("adc_d2")) ++ carry.map(col): _*))
    preds.map { case (tag, p) =>
      val (exact, nExact) =
        exactHoldoutTopK(queries, idCol, vecCol, full.filter(p), k)
      recallByNprobe(cand.filter(p), exact, nExact, idCol, "adc_d2", k,
          maxProbe)
        .select(lit(tag).as("sel"), col("nprobe"), col("recall_ppm"))
    }.reduce(_ unionByName _)
  }

  /** Recall-vs-nprobe curve, fitted at index build time on a HELD-OUT
    * query sample (round-15 verdict #6): for each candidate nprobe
    * 1..maxProbe, the micro recall@k of the routed ADC serve against the
    * exact L2 top-k — hits·10⁶ / exact, all-integer so an external
    * engine replays the exact curve. Stored with the index, the curve
    * turns the serving knob from a guess into a contract: [[chooseNprobe]]
    * picks the cheapest nprobe that clears a requested recall floor.
    * Cost: ONE routed ADC pass at maxProbe (each candidate row carries
    * the RANK of the cell it was probed from, so the serve at any
    * smaller nprobe is a filter + heap cut over the same cached frame —
    * never maxProbe separate codes scans) plus one exact scan of
    * sample×corpus — build-time, amortized over every serve the index
    * answers. The per-nprobe results are definitionally identical to
    * [[pqKnnAgainstCodesRouted]] at that nprobe: "cells ranked ≤ np"
    * is exactly the slice that serve probes. */
  def fitRecallCurve(holdout: DataFrame, idCol: String, vecCol: String,
                     full: DataFrame, k: Int, maxProbe: Int,
                     cents: Seq[(Long, Seq[Double])],
                     codebooks: Seq[Seq[(Long, Seq[Double])]],
                     codes: DataFrame): DataFrame = {
    require(maxProbe >= 1, "maxProbe must cover at least one cell")
    val (exact, nExact) = exactHoldoutTopK(holdout, idCol, vecCol, full, k)
    val qProbes = probeRankFrame(holdout, idCol, vecCol, cents, maxProbe,
      carryQv = false)
    val qLuts = withAdcLuts(holdout, Seq(col(idCol).as("qid")), vecCol,
      codebooks)
    // no persist: the single-pass recallByNprobe reads the candidate
    // frame exactly once (the per-np loop it replaces read it maxProbe
    // times, which is what the cache was for)
    val cand = codes.join(broadcast(qProbes), "cid")
      .filter(col(idCol) =!= col("qid"))
      .join(broadcast(qLuts), "qid")
      .select(col("qid"), col(idCol), col("__cellrank"),
        round(adcDist(codebooks), 6).as("adc_d2"))
    recallByNprobe(cand, exact, nExact, idCol, "adc_d2", k, maxProbe)
  }

  /** Exact held-out ground truth shared by both curve fits: per-query
    * exact L2 top-k over the full corpus (broadcast query side, heap
    * cut before any exchange), cached, plus its row count. */
  private def exactHoldoutTopK(holdout: DataFrame, idCol: String,
                               vecCol: String, full: DataFrame,
                               k: Int): (DataFrame, DataFrame) = {
    val q = holdout.select(col(idCol).as("qid"), col(vecCol).as("__qv"))
    val exactP = full.select(col(idCol), col(vecCol).as("__v"))
      .crossJoin(broadcast(q)).filter(col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol), l2sq(col("__v"), col("__qv")).as("d2"))
    val exact = graft.GraftCache.persist(
      graft.plans.TopKPerKey.topKPerKey(exactP, Seq("qid"),
        Seq(col("d2"), col(idCol)), k).select("qid", idCol))
    (exact, exact.agg(count(lit(1)).as("n_exact")))
  }

  /** Each held-out query fanned out to its maxProbe nearest cells with
    * the cell's PROBE RANK riding along — the one frame every nprobe is
    * a filter of. `carryQv` keeps the query vector for curve fits whose
    * candidate distance is exact L2 (the coarse form). */
  private def probeRankFrame(holdout: DataFrame, idCol: String,
                             vecCol: String, cents: Seq[(Long, Seq[Double])],
                             maxProbe: Int, carryQv: Boolean): DataFrame = {
    val v = col(vecCol)
    val qv = if (carryQv) Seq(col(vecCol).as("__qv")) else Nil
    val qvOut = if (carryQv) Seq(col("__qv")) else Nil
    withCellsCol(holdout, cents)
      .select(col(idCol).as("qid") +: qv :+
        posexplode(transform(
          slice(array_sort(probeCandsCol(v, cents)), 1, maxProbe),
          p => p.getField("cid"))).as(Seq("__cr", "cid")): _*)
      .select(col("qid") +: qvOut :+
        (col("__cr") + 1).as("__cellrank") :+ col("cid"): _*)
  }

  /** The shared per-nprobe computation: "cells ranked ≤ np" is exactly
    * the slice that serve probes. ONE pass serves the whole curve: each
    * candidate row explodes to every nprobe ≥ its cell's probe rank (a
    * row is a candidate at np iff __cellrank ≤ np — the same membership
    * the per-np filter expressed), one (qid, nprobe)-keyed heap cut
    * ranks every curve point together, and one join+rollup counts the
    * hits. Replaces a maxProbe-branch union whose every branch re-read
    * the candidate frame through its own heap cut + join + global agg —
    * at gate scale the curve's cost was maxProbe-plan orchestration,
    * not data (optimization round 19; bit-identical points: per (qid,
    * np) group the candidate SET and the (distCol, idCol) order are
    * unchanged, and the ppm arithmetic is the same integer div). The
    * left join against the 1..maxProbe spine keeps zero-hit points as
    * rows, exactly as the old per-np global agg did. */
  private def recallByNprobe(cand: DataFrame, exact: DataFrame,
                             nExact: DataFrame, idCol: String,
                             distCol: String, k: Int,
                             maxProbe: Int): DataFrame = {
    val perNp = graft.plans.TopKPerKey.topKPerKey(
      cand.select(col("qid"), col(idCol), col(distCol),
        explode(sequence(col("__cellrank").cast("int"), lit(maxProbe)))
          .as("nprobe")),
      Seq("qid", "nprobe"), Seq(col(distCol), col(idCol)), k)
    val hits = perNp.join(exact, Seq("qid", idCol))
      .groupBy("nprobe").agg(count(lit(1)).as("n_hit"))
    nExact
      .select(explode(sequence(lit(1), lit(maxProbe))).as("nprobe"),
        col("n_exact"))
      .join(hits, Seq("nprobe"), "left")
      .select(col("nprobe"),
        expr("coalesce(n_hit, 0) * 1000000 div n_exact").as("recall_ppm"))
  }

  /** The serve-time half of the adaptive knob: the SMALLEST nprobe whose
    * held-out recall clears the floor, falling back to maxProbe when the
    * curve never reaches it (probe-everything is the honest ceiling —
    * residual misses there are PQ quantization, which no nprobe fixes).
    * One bounded driver fetch of maxProbe scalar rows. STALENESS: the
    * curve is a property of the index it was fitted on — any maintenance
    * that changes the cell population (append, compact, retrain) should
    * refit before serving through the old choice (x114 gates the
    * append case; pl12's drift gate is the retrain trigger). */
  def chooseNprobe(curve: DataFrame, floorPpm: Long, maxProbe: Int): Int = {
    val rows = curve.select("nprobe", "recall_ppm").collect()
      .map { r =>
        // an integer-div NULL means the fit saw zero exact neighbors —
        // an empty/self-only holdout; fail with the cause, not an NPE
        require(!r.isNullAt(1),
          "recall curve has no denominator: the held-out sample produced " +
            "zero exact neighbors (empty holdout?)")
        r.getInt(0) -> r.getLong(1)
      }
    rows.filter(_._2 >= floorPpm).map(_._1).sorted.headOption
      .getOrElse(maxProbe)
  }

  /** [[fitRecallCurve]] for an index WITHOUT PQ codes — the coarse-only
    * routed form pl12's exact-serving refresh pipeline runs: for each
    * nprobe 1..maxProbe, the held-out recall@k of "exact L2 within the
    * np nearest cells" against the exact L2 top-k over the whole
    * corpus. Same integer-ppm contract and the same
    * one-candidate-frame cost shape (each (query, vector) pair carries
    * the rank of its cell in the query's probe order; every nprobe is
    * a filter + heap cut over that cached frame), so a retrain that
    * changes the cells refits in one pass and [[chooseNprobe]] turns
    * the serve's probe count back into a contract. */
  def fitCoarseRecallCurve(holdout: DataFrame, idCol: String, vecCol: String,
                           full: DataFrame, k: Int, maxProbe: Int,
                           cents: Seq[(Long, Seq[Double])]): DataFrame = {
    require(maxProbe >= 1, "maxProbe must cover at least one cell")
    val (exact, nExact) = exactHoldoutTopK(holdout, idCol, vecCol, full, k)
    val qProbes = probeRankFrame(holdout, idCol, vecCol, cents, maxProbe,
      carryQv = true)
    val assigned = argminAssign(full, idCol, vecCol, cents)
    // no persist: single-pass recallByNprobe reads the frame once
    val cand = assigned.join(broadcast(qProbes), "cid")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as(idCol), col("__cellrank"),
        l2sq(col("v"), col("__qv")).as("d2"))
    recallByNprobe(cand, exact, nExact, idCol, "d2", k, maxProbe)
  }

  /** [[pqKnnAgainstCodesRouted]] with the centroid frame collected per
    * call — the one-shot batch form. Long-lived callers (the streaming
    * screen's per-micro-batch loop) pass the pre-collected seq instead,
    * so the centroid parquet is not re-read per trigger. */
  def pqKnnAgainstCodesRouted(queries: DataFrame, idCol: String, vecCol: String,
                              k: Int, nprobe: Int, centroids: DataFrame,
                              codebooks: Seq[Seq[(Long, Seq[Double])]],
                              codes: DataFrame): DataFrame =
    pqKnnAgainstCodesRouted(queries, idCol, vecCol, k, nprobe,
      collectCentroids(centroids), codebooks, codes)

  /** Two-stage PQ kNN — the deployed form: stage 1 shortlists `candidates`
    * per query by ADC over the compressed codes ([[pqKnnJoin]] — the pass
    * that reads m bytes/vector instead of 4·dim); stage 2 re-reads the
    * FULL vectors behind the candidate join and re-ranks exact L2 top-k.
    * The [[knnJoinProjected]] two-stage shape with PQ codes as the cheap
    * first pass. Recall = P(true top-k survive the ADC cut) — far above
    * the raw ADC top-k's (the shortlist only needs the true neighbours
    * ANYWHERE in the pool, not correctly ordered); both are measured by
    * the x71 gate, the candidate pool being the cost/recall knob. */
  def pqKnnJoinRefined(embeddings: DataFrame, idCol: String, vecCol: String,
                       queryPred: Column, k: Int, candidates: Int,
                       codebooks: Seq[Seq[(Long, Seq[Double])]]): DataFrame = {
    require(candidates >= k, "candidate pool must cover k")
    val cands = pqKnnJoin(embeddings, idCol, vecCol, queryPred, candidates,
      codebooks).select("qid", idCol)
    val full = embeddings.select(col(idCol), col(vecCol).as("__v"))
    val qf = embeddings.filter(queryPred)
      .select(col(idCol).as("qid"), col(vecCol).as("__qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("d2"), col(idCol))
    cands.join(full, idCol)
      .join(broadcast(qf), "qid")
      .select(col("qid"), col(idCol), l2sq(col("__v"), col("__qv")).as("d2"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** IVF-PQ top-k — the two quantizers composed, the standard billion-
    * scale index layout (FAISS IVFPQ without residual encoding; residuals
    * would PQ-encode v − centroid for finer cells at the cost of
    * per-cell codebooks): the coarse k-means quantizer routes the query
    * to its `nprobe` nearest cells, and ranking within the probed cells
    * is ADC over the PQ codes — so a query touches nprobe/k of the
    * corpus AND reads m bytes per touched vector. Candidate generation
    * stays an equi-join on the cell id; the ADC is the same per-query
    * LUT as [[pqTopK]]. Degenerates to exactly [[pqTopK]] at
    * nprobe = |cells| (spec-pinned). */
  def ivfPqTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                queryId: Long, k: Int, centroids: DataFrame, nprobe: Int,
                codebooks: Seq[Seq[(Long, Seq[Double])]]): DataFrame = {
    val cells = assignToCentroids(embeddings, idCol, vecCol, centroids)
      .select(col("vec_id").as(idCol), col("cid"))
    val qv = embeddings.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qv"))
    val probeCells = centroids.crossJoin(broadcast(qv))
      .select(col("cid"), l2sq(col("__qv"), col("c")).as("__dist"))
      .orderBy(col("__dist"), col("cid"))
      .limit(nprobe)
      .select("cid")
    val q = withAdcLuts(embeddings.filter(col(idCol) === queryId),
      Seq.empty, vecCol, codebooks)
    graft.GraftCache.persist(pqEncode(embeddings, idCol, vecCol, codebooks))
      .join(cells, idCol)
      .join(broadcast(probeCells), "cid")
      .filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), round(adcDist(codebooks), 6).as("adc_d2"))
      .orderBy(col("adc_d2"), col(idCol))
      .limit(k)
  }

  /** Single-query ADC top-k over PQ codes — [[bruteForceTopK]]'s shape
    * (broadcast one query row, one scan, TakeOrdered) with the scan
    * reading codes instead of vectors. Returns (id, adc_d2) ascending. */
  def pqTopK(embeddings: DataFrame, idCol: String, vecCol: String,
             queryId: Long, k: Int,
             codebooks: Seq[Seq[(Long, Seq[Double])]]): DataFrame =
    pqTopKOverCodes(embeddings, idCol, vecCol, queryId, k, codebooks,
      graft.GraftCache.persist(pqEncode(embeddings, idCol, vecCol, codebooks)))

  /** [[pqTopK]] against an EXTERNAL codes frame — the serving path over a
    * stored index ([[writePqIndex]]): the corpus's vectors are never
    * touched; only the query row is read full-precision. */
  def pqTopKOverCodes(embeddings: DataFrame, idCol: String, vecCol: String,
                      queryId: Long, k: Int,
                      codebooks: Seq[Seq[(Long, Seq[Double])]],
                      codes: DataFrame): DataFrame = {
    val q = withAdcLuts(embeddings.filter(col(idCol) === queryId),
      Seq.empty, vecCol, codebooks)
    codes
      .filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), round(adcDist(codebooks), 6).as("adc_d2"))
      .orderBy(col("adc_d2"), col(idCol))
      .limit(k)
  }

  /** Materialize the PQ index — `codes/` (id, m codes) and `codebooks/`
    * (subspace, cid, centroid) parquet — the store-the-derived-structure
    * move of the band index ([[graft.operators.TextOps.writeBandIndex]])
    * and the DSIR model applied to ANN: the nightly steady state trains
    * codebooks once, encodes once, and every later query or arriving
    * batch serves off the stored codes with ZERO corpus re-encoding.
    * At 100 TB the codes table is ~m bytes/vector — the index IS the
    * scannable artifact. */
  def writePqIndex(embeddings: DataFrame, idCol: String, vecCol: String,
                   codebooks: Seq[Seq[(Long, Seq[Double])]], dir: String,
                   carry: Seq[String] = Nil): Unit = {
    pqEncode(embeddings, idCol, vecCol, codebooks, carry)
      .write.mode("overwrite").parquet(s"$dir/codes")
    writeCodebooks(embeddings.sparkSession, codebooks, dir)
  }

  /** The one codebook serialization both index writers share —
    * [[readPqCodebooks]] is its single inverse, so the schema cannot
    * drift between the plain and the composed index formats. */
  private def writeCodebooks(spark: org.apache.spark.sql.SparkSession,
                             codebooks: Seq[Seq[(Long, Seq[Double])]],
                             dir: String): Unit = {
    import spark.implicits._
    codebooks.zipWithIndex
      .flatMap { case (cb, j) => cb.map { case (cid, c) => (j, cid, c) } }
      .toDF("sub", "cid", "c")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/codebooks")
  }

  /** Incremental maintenance of a [[writePqIndex]] index — the ANN twin
    * of [[graft.operators.TextOps.appendBandIndex]]: encode ONLY the
    * arriving batch with the STORED codebooks and append its codes, so
    * the next query serves base ∪ batch off the index with zero corpus
    * re-encoding and zero codebook retraining. Cost is O(|batch|) — the
    * standing codes are never read or rewritten. Codebooks drift as the
    * corpus distribution does; the recall audit (x71's machinery) against
    * a fresh exact join is the monitoring signal that schedules retrain +
    * re-encode, exactly like the band index's compact cycle. */
  def appendPqIndex(newVectors: DataFrame, idCol: String, vecCol: String,
                    dir: String): Unit =
    pqEncode(newVectors, idCol, vecCol,
        readPqCodebooks(newVectors.sparkSession, dir))
      .write.mode("append").parquet(s"$dir/codes")

  /** (id, codes, cid) in a SINGLE zero-shuffle projection over one scan —
    * both the cell id and the m codes are per-row argmins of the same
    * vector, so computing them together drops the build-time corpus
    * shuffle join the two-frame form paid (round-12 advice). Subvector
    * slices materialize to attributes once, exactly as [[pqEncode]]; the
    * cell argmin reads the unsliced vector alongside them. */
  def pqEncodeWithCells(embeddings: DataFrame, idCol: String,
                        vecCol: String, cents: Seq[(Long, Seq[Double])],
                        codebooks: Seq[Seq[(Long, Seq[Double])]],
                        carry: Seq[String] = Nil): DataFrame = {
    require(cents.nonEmpty, "at least one centroid")
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebook")
    val sub = codebooks.head.head._2.length
    val v = col(vecCol)
    val cidCol =
      if (cents.size <= ArgminLiteralMaxK)
        array_min(array(cents.map { case (cid, c) =>
          struct(l2sq(v, array(c.map(lit): _*)).as("d"), lit(cid).as("cid"))
        }: _*)).getField("cid")
      else argminCells(v, col("__cells")).getField("cid")
    val base =
      if (cents.size <= ArgminLiteralMaxK) embeddings
      else embeddings.join(broadcast(cellsFrame(embeddings, cents)))
    val sliced = withCodebooksCol(
      base.select((col(idCol) +: carry.map(col)) ++
        (codebooks.indices.map(j =>
          slice(v, j * sub + 1, sub).as(s"__s$j")) :+ cidCol.as("cid")): _*),
      codebooks)
    sliced.select((col(idCol) +: carry.map(col)) ++
      Seq(array(subspaceCodeCols(codebooks): _*).as("codes"), col("cid")): _*)
  }

  /** Materialize the COMPOSED IVF-PQ index — the billion-scale serving
    * layout: `codes/` carries (id, cid, m codes) RANGE-LAID by cell id
    * ([[graft.sinks.LayoutSink]]), so every file covers a disjoint cid
    * range and a probe's `cid IN (…)` predicate prunes whole files on
    * parquet min/max stats — a query physically reads ~nprobe/k of the
    * index, m bytes per surviving vector; `centroids/` and `codebooks/`
    * are the two driver-resident quantizers. The same
    * store-the-derived-structure move as the band index's bsig layout,
    * applied to the ANN cell. */
  def writeIvfPqIndex(embeddings: DataFrame, idCol: String, vecCol: String,
                      centroids: DataFrame,
                      codebooks: Seq[Seq[(Long, Seq[Double])]], dir: String,
                      numFiles: Int = 16,
                      carry: Seq[String] = Nil): Unit = {
    graft.sinks.LayoutSink.writeRangeLayout(
      pqEncodeWithCells(embeddings, idCol, vecCol, collectCentroids(centroids),
        codebooks, carry),
      "cid", numFiles, s"$dir/codes")
    centroids.coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    writeCodebooks(embeddings.sparkSession, codebooks, dir)
  }

  /** Incremental maintenance of the COMPOSED index ([[writeIvfPqIndex]])
    * — [[appendPqIndex]]'s twin: the arriving batch assigns to the
    * STORED centroids (zero-shuffle literal argmin) and encodes with the
    * STORED codebooks, and its (id, cid, codes) rows append in
    * O(|batch|); the standing rows are never read. Appended files are
    * not range-laid: cid file pruning degrades gracefully (extra files
    * scanned, correctness unaffected) until a periodic
    * [[graft.sinks.LayoutSink.compact]] by cid re-lays the codes — the
    * band index's append-then-compact lifecycle. */
  def appendIvfPqIndex(newVectors: DataFrame, idCol: String, vecCol: String,
                       dir: String): Unit = {
    val spark = newVectors.sparkSession
    pqEncodeWithCells(newVectors, idCol, vecCol,
        collectCentroids(spark.read.parquet(s"$dir/centroids")),
        readPqCodebooks(spark, dir))
      .write.mode("append").parquet(s"$dir/codes")
  }

  /** [[ivfPqTopK]] served OFF the stored index ([[writeIvfPqIndex]]):
    * the probe ranking runs exactly as the live form (stored centroids ×
    * broadcast query row — identical arithmetic, so the probed cells are
    * identical), the nprobe WINNING cell ids (bounded by construction)
    * collect to literals, and the codes scan carries `cid IN (probes)`
    * as a pushed filter — on the range layout that prunes whole files,
    * which is the read-path payoff the composed index exists for. The
    * corpus vectors are never read; results must be invisible vs the
    * live x72 form (shared oracle + equivalence spec). */
  def ivfPqTopKOverIndex(querySource: DataFrame, idCol: String, vecCol: String,
                         queryId: Long, k: Int, nprobe: Int,
                         centroids: DataFrame,
                         codebooks: Seq[Seq[(Long, Seq[Double])]],
                         codes: DataFrame): DataFrame = {
    val qv = querySource.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qv"))
    val probeIds = centroids.crossJoin(broadcast(qv))
      .select(col("cid"), l2sq(col("__qv"), col("c")).as("__dist"))
      .orderBy(col("__dist"), col("cid"))
      .limit(nprobe)
      .select("cid").collect().map(_.getLong(0)).toSeq
    // the serve itself IS pqTopKOverCodes over the probe-pruned codes —
    // one ranking implementation, so x73 and x75 cannot drift
    pqTopKOverCodes(querySource, idCol, vecCol, queryId, k, codebooks,
      codes.filter(col("cid").isin(probeIds: _*)))
  }

  /** Rehydrate the stored codebooks ([[writePqIndex]]) — m·ks·sub doubles,
    * exact through parquet, driver-resident like live-trained ones. */
  def readPqCodebooks(spark: org.apache.spark.sql.SparkSession,
                      dir: String): Seq[Seq[(Long, Seq[Double])]] = {
    val rows = spark.read.parquet(s"$dir/codebooks").collect()
    rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (_, rs) =>
      rs.map(r => (r.getLong(1), r.getSeq[Double](2))).sortBy(_._1).toSeq
    }
  }

  // ------------------------------------------------------ residual IVF-PQ

  /** Literal cid → centroid map for per-row centroid lookups. */
  private def centroidMap(cents: Seq[(Long, Seq[Double])]): Column =
    map(cents.flatMap { case (cid, c) =>
      Seq(lit(cid), array(c.map(lit): _*)) }: _*)

  /** Codegen'd element-wise vector subtraction (array<double> result) —
    * a custom expression ([[graft.functions.VectorSubtract]]) because
    * the zip_with lambda runs interpreted and the residual encode pays
    * it once per corpus row; bit-identical to
    * `zip_with(a, b, (x, c) => x.cast("double") - c)` on the
    * equal-length null-free inputs the residual paths feed it. */
  def vecSub(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.VectorSubtract(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** The pre-codegen HOF formulation of [[vecSub]], kept as the
    * reference semantics the custom expression is tested against. */
  def vecSubHof(a: Column, b: Column): Column =
    zip_with(a, b, (x, c) => x.cast("double") - c)

  /** Per-vector residual against its assigned coarse cell — (vec_id, cid,
    * residual) where residual_i = v_i − centroid(cid)_i in doubles. The
    * input to RESIDUAL product quantization (the standard FAISS IVFPQ
    * form): PQ codebooks trained on residuals concentrate their capacity
    * on WITHIN-cell variance — the coarse quantizer has already removed
    * the between-cell component — which is the main recall lever at fixed
    * m/ks over encoding raw vectors. One zero-shuffle projection: the
    * argmin assignment and the centroid-map lookup are row-local over
    * literal centroids (k×dim doubles inlined, same contract as
    * [[assignToCentroids]]); the subtraction is exact double arithmetic
    * an external oracle replays verbatim. */
  def residuals(embeddings: DataFrame, idCol: String, vecCol: String,
                cents: Seq[(Long, Seq[Double])]): DataFrame = {
    require(cents.nonEmpty, "at least one centroid")
    val v = col(vecCol)
    if (cents.size <= ArgminLiteralMaxK) {
      val candidates = cents.map { case (cid, c) =>
        struct(l2sq(v, array(c.map(lit): _*)).as("d"), lit(cid).as("cid"))
      }
      embeddings
        .select(col(idCol).as("vec_id"), v.as("__v"),
          array_min(array(candidates: _*)).getField("cid").as("cid"))
        .select(col("vec_id"), col("cid"),
          vecSub(col("__v"), element_at(centroidMap(cents), col("cid")))
            .as("residual"))
    } else {
      // large-k: broadcast-join argmin for the cell, then the centroid
      // lookup as a k-row broadcast HASH join on cid (the literal map
      // would inline k×dim doubles) — corpus rows stream, nothing
      // shuffles
      val centDf = embeddings.sparkSession
        .createDataFrame(cents).toDF("cid", "__c")
      argminAssignJoin(embeddings, idCol, vecCol, cents)
        .join(broadcast(centDf), "cid")
        .select(col("vec_id"), col("cid"),
          vecSub(col("v"), col("__c")).as("residual"))
    }
  }

  /** Residual-trained PQ codebooks: the per-subspace k-means chains of
    * [[pqCodebooks]] run over the RESIDUAL frame instead of the raw
    * vectors — identical deterministic recipe (first-ks init by id,
    * round-6 means, lowest-cid ties), so the oracle replays the chains
    * over its own residual CTE. */
  def pqCodebooksResidual(embeddings: DataFrame, idCol: String, vecCol: String,
                          cents: Seq[(Long, Seq[Double])], dim: Int, m: Int,
                          ks: Int, iters: Int): Seq[Seq[(Long, Seq[Double])]] =
    pqCodebooks(residuals(embeddings, idCol, vecCol, cents),
      "vec_id", "residual", dim, m, ks, iters)

  /** (id, codes, cid) with the codes encoding the RESIDUAL v − centroid
    * (cid) — [[pqEncodeWithCells]]'s residual twin, still one zero-shuffle
    * projection over one scan (assignment, centroid lookup, subtraction,
    * and the m per-subspace argmins are all row-local over literal
    * quantizers). */
  def residualEncodeWithCells(embeddings: DataFrame, idCol: String,
                              vecCol: String, cents: Seq[(Long, Seq[Double])],
                              codebooks: Seq[Seq[(Long, Seq[Double])]]): DataFrame = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebook")
    val sub = codebooks.head.head._2.length
    val sliced = withCodebooksCol(
      residuals(embeddings, idCol, vecCol, cents)
        .select(col("vec_id").as(idCol) +: col("cid") +:
          codebooks.indices.map(j =>
            slice(col("residual"), j * sub + 1, sub).as(s"__s$j")): _*),
      codebooks)
    sliced.select(col(idCol),
      array(subspaceCodeCols(codebooks): _*).as("codes"), col("cid"))
  }

  /** Single-query top-k over RESIDUAL-encoded codes: the query routes to
    * its `nprobe` nearest cells, and within each probed cell the ADC
    * compares the QUERY'S RESIDUAL against that cell — r_q(c) = q −
    * centroid(c) — so the LUTs are per (probe cell × subspace), computed
    * once per probed cell on the broadcast query side. The codes scan
    * pays exactly what the raw form pays (m map lookups + adds per
    * candidate); the residual subtraction never touches the corpus side,
    * whose residuals are already baked into the codes. */
  def ivfPqResidualTopKOverCodes(querySource: DataFrame, idCol: String,
                                 vecCol: String, queryId: Long, k: Int,
                                 nprobe: Int, cents: Seq[(Long, Seq[Double])],
                                 codebooks: Seq[Seq[(Long, Seq[Double])]],
                                 codes: DataFrame): DataFrame = {
    require(cents.nonEmpty, "at least one centroid")
    val qv = querySource.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qv"))
    val probes = withCellsCol(qv, cents)
      .select(col("__qv"),
        explode(transform(
          slice(array_sort(probeCandsCol(col("__qv"), cents)), 1, nprobe),
          p => p.getField("cid"))).as("cid"),
        centroidLookupCol(cents).as("__cmap"))
      .withColumn("__qr",
        vecSub(col("__qv"), element_at(col("__cmap"), col("cid"))))
    val q = withAdcLuts(probes, Seq(col("cid")), "__qr", codebooks)
    codes.filter(col(idCol) =!= queryId)
      .join(broadcast(q), "cid")
      .select(col(idCol), round(adcDist(codebooks), 6).as("adc_d2"))
      .orderBy(col("adc_d2"), col(idCol))
      .limit(k)
  }

  /** [[ivfPqResidualTopKOverCodes]] with the codes encoded in-query —
    * the live (index-less) form, x78's gate shape. */
  def ivfPqResidualTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                        queryId: Long, k: Int, nprobe: Int,
                        cents: Seq[(Long, Seq[Double])],
                        codebooks: Seq[Seq[(Long, Seq[Double])]]): DataFrame =
    ivfPqResidualTopKOverCodes(embeddings, idCol, vecCol, queryId, k, nprobe,
      cents, codebooks, graft.GraftCache.persist(
        residualEncodeWithCells(embeddings, idCol, vecCol, cents, codebooks)))

  /** Routed batch kNN over RESIDUAL-encoded codes — the residual twin of
    * [[pqKnnAgainstCodesRouted]]. One structural difference, inherent to
    * residual ADC: the LUTs depend on the (query, probed cell) PAIR —
    * each probe row carries the LUTs of the query's residual against
    * that cell — so LUTs ride WITH the probe rows instead of splitting
    * into a per-query frame (the raw form's broadcast-byte optimization
    * does not apply; the broadcast is |Q|·nprobe·m maps either way
    * here). Candidates are still the cid equi-join, still heap-cut per
    * query before any exchange. */
  def ivfPqResidualKnnOverCodes(queries: DataFrame, idCol: String,
                                vecCol: String, k: Int, nprobe: Int,
                                cents: Seq[(Long, Seq[Double])],
                                codebooks: Seq[Seq[(Long, Seq[Double])]],
                                codes: DataFrame): DataFrame = {
    require(cents.nonEmpty, "at least one centroid")
    val qProbes = withCellsCol(
        queries.select(col(idCol).as("qid"), col(vecCol).as("__qv")), cents)
      .select(col("qid"), col("__qv"),
        explode(transform(
          slice(array_sort(probeCandsCol(col("__qv"), cents)), 1, nprobe),
          p => p.getField("cid"))).as("cid"),
        centroidLookupCol(cents).as("__cmap"))
      .withColumn("__qr",
        vecSub(col("__qv"), element_at(col("__cmap"), col("cid"))))
    val qLuts = withAdcLuts(qProbes, Seq(col("qid"), col("cid")), "__qr",
      codebooks)
    val ranked = codes.join(broadcast(qLuts), "cid")
      .filter(col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol), round(adcDist(codebooks), 6).as("adc_d2"))
    graft.plans.TopKPerKey.topKPerKey(ranked, Seq("qid"),
      Seq(col("adc_d2"), col(idCol)), k)
  }

  /** Materialize the RESIDUAL composed index — [[writeIvfPqIndex]]'s
    * layout (codes range-laid by cid, centroids, codebooks) with the
    * codes residual-encoded: the stored form of [[ivfPqResidualTopK]],
    * so the nightly steady state trains once and every serve reads
    * probe-pruned files of m-byte codes. The quantizer tables stored
    * are exactly the live pair, so a serve off the store must be
    * result-invisible vs the live form (shared oracle). */
  def writeIvfPqResidualIndex(embeddings: DataFrame, idCol: String,
                              vecCol: String, cents: Seq[(Long, Seq[Double])],
                              codebooks: Seq[Seq[(Long, Seq[Double])]],
                              dir: String, numFiles: Int = 16): Unit = {
    val spark = embeddings.sparkSession
    graft.sinks.LayoutSink.writeRangeLayout(
      residualEncodeWithCells(embeddings, idCol, vecCol, cents, codebooks),
      "cid", numFiles, s"$dir/codes")
    spark.createDataFrame(cents).toDF("cid", "c")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    writeCodebooks(spark, codebooks, dir)
  }

  /** Incremental maintenance of a [[writeIvfPqResidualIndex]] index —
    * [[appendIvfPqIndex]]'s residual twin, closing the
    * {residual} × {append} lifecycle cell: the arriving batch assigns to
    * the STORED centroids, subtracts its cell's centroid, and encodes
    * the residual with the STORED residual codebooks — the same single
    * projection the build uses, O(|batch|), standing rows never read.
    * Appended files are not range-laid; cid file pruning degrades
    * gracefully until a periodic [[graft.sinks.LayoutSink.compact]] by
    * cid re-lays the codes. */
  def appendIvfPqResidualIndex(newVectors: DataFrame, idCol: String,
                               vecCol: String, dir: String): Unit = {
    val spark = newVectors.sparkSession
    residualEncodeWithCells(newVectors, idCol, vecCol,
        collectCentroids(spark.read.parquet(s"$dir/centroids")),
        readPqCodebooks(spark, dir))
      .write.mode("append").parquet(s"$dir/codes")
  }

  /** [[ivfPqResidualTopKOverCodes]] served OFF the stored residual index
    * ([[writeIvfPqResidualIndex]]): the nprobe winning cell ids (bounded
    * by construction) collect to literals and the codes scan carries
    * `cid IN (probes)` as a pushed filter — file pruning on the range
    * layout, the same read-path payoff as [[ivfPqTopKOverIndex]]. The
    * probe ranking arithmetic is identical to the live form, so the
    * probed cells — and therefore the results — are identical. */
  def ivfPqResidualTopKOverIndex(querySource: DataFrame, idCol: String,
                                 vecCol: String, queryId: Long, k: Int,
                                 nprobe: Int, cents: Seq[(Long, Seq[Double])],
                                 codebooks: Seq[Seq[(Long, Seq[Double])]],
                                 codes: DataFrame): DataFrame = {
    require(cents.nonEmpty, "at least one centroid")
    val qv = querySource.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qv"))
    val probeIds = withCellsCol(qv, cents)
      .select(explode(transform(
        slice(array_sort(probeCandsCol(col("__qv"), cents)), 1, nprobe),
        p => p.getField("cid"))).as("cid"))
      .collect().map(_.getLong(0)).toSeq
    ivfPqResidualTopKOverCodes(querySource, idCol, vecCol, queryId, k, nprobe,
      cents, codebooks, codes.filter(col("cid").isin(probeIds: _*)))
  }

  /** Rehydrate a stored centroid table ([[writeIvfPqIndex]] /
    * [[writeIvfPqResidualIndex]]) to the driver-resident seq the
    * residual serves take — k×dim doubles, exact through parquet. */
  def readCentroids(spark: org.apache.spark.sql.SparkSession,
                    dir: String): Seq[(Long, Seq[Double])] =
    collectCentroids(spark.read.parquet(s"$dir/centroids"))

  // ------------------------------------------------- index delete/compact

  /** Tombstone maintenance for a stored PQ / IVF-PQ index
    * ([[writePqIndex]] / [[writeIvfPqIndex]]): drop the removed ids'
    * rows from `codes/` and rewrite to `outPath` — composed with
    * [[graft.operators.Merge.snapshotDiff]]'s `removed` changeset, this
    * is the takedown/re-crawl path that previously forced a full index
    * rebuild. The rewrite touches ONLY the skinny codes (m bytes +
    * ids per vector — never the corpus vectors), the removal set joins
    * as a left-anti equi-join (AQE broadcasts it when small, the
    * expected case), and a cid-carrying index is re-RANGE-LAID by cid so
    * the probe-pruning layout survives the delete; a plain PQ index
    * rewrites as-is. Output to a new path; the atomic swap belongs to
    * the caller's table layer (same contract as
    * [[graft.sinks.LayoutSink.compact]]). Quantizers are untouched:
    * codes are per-row, so the surviving rows are bit-identical to
    * encoding the surviving corpus with the stored quantizers — deletes
    * never degrade the index, only distribution DRIFT does (the recall
    * audit schedules retrains, exactly as for appends). */
  def deletePqCodes(spark: org.apache.spark.sql.SparkSession, dir: String,
                    removedIds: DataFrame, idCol: String, outPath: String,
                    numFiles: Int = 16): Unit = {
    val codes = spark.read.parquet(s"$dir/codes")
    val pruned = codes.join(removedIds.select(col(idCol)), Seq(idCol), "left_anti")
    if (codes.columns.contains("cid"))
      graft.sinks.LayoutSink.writeRangeLayout(pruned, "cid", numFiles, outPath)
    else
      pruned.write.mode("overwrite").parquet(outPath)
  }

  // ------------------------------------------- OPQ (learned-rotation PQ)

  /** One-row broadcast transport of a dim×dim rotation (row-major) — the
    * [[cellsFrame]] pattern: dim² doubles ride ONE local-relation row,
    * never literal plan nodes (a 64×64 literal matrix in a projection
    * would both blow the janino method budget out of whole-stage codegen
    * and pay the measured big-literal driver plan tax on every query). */
  private def rotationFrame(df: DataFrame, r: Seq[Seq[Double]]): DataFrame =
    df.sparkSession.createDataFrame(Seq(Tuple1(r))).toDF("__rot")

  /** R·v over the joined `__rot` column: out[i] = Σ_j R[i][j]·v[j] — the
    * codegen'd [[dot]] ascending fold, UNROUNDED. Deliberately so:
    * rounding rotated coordinates to a decimal lattice makes every
    * downstream k-means mean an average of lattice rationals, which
    * lands EXACTLY on round-6 half-boundaries at high rate (measured:
    * 1–2 centroid-coordinate flips per DuckDB run, each amplified
    * through the fit) — full-entropy doubles keep boundary ties at the
    * negligible ulp rate the rest of the suite's chains live with, and
    * the ulp-level fold-vs-aggregate difference between engines is
    * absorbed by the round-6 at the chain means / ADC outputs exactly
    * as it is for the raw-embedding chains. */
  private def rotateCol(vec: Column): Column =
    transform(col("__rot"), row => dot(row, vec))

  /** Rotate `vecCol` in place by the dim×dim matrix `r`; every other
    * column passes through. This is the whole OPQ serving seam: the
    * rotation applies once at the boundary (corpus at build/append time,
    * query at serve time) and EVERYTHING downstream — coarse quantizer,
    * codebooks, encode, routed probe, ADC — runs verbatim in the rotated
    * space, so the entire stored-index lifecycle is inherited rather
    * than reimplemented. */
  def rotate(df: DataFrame, vecCol: String, r: Seq[Seq[Double]]): DataFrame = {
    val keep = df.columns.map(c =>
      if (c == vecCol) rotateCol(col(c)).as(c) else col(c))
    df.join(broadcast(rotationFrame(df, r))).select(keep.toSeq: _*)
  }

  def identityRotation(dim: Int): Seq[Seq[Double]] =
    Seq.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)

  /** decode(encode(·)) reconstruction over the joined `__cb` column and a
    * `codes` array — per subspace, the codebook centroid the code names,
    * concatenated back to a dim-vector. Used only inside the fit's one
    * cross-matrix scan. */
  private def reconstructCol: Column =
    flatten(zip_with(col("__cb"), col("codes"), (cbj, cj) =>
      element_at(map_from_entries(cbj), cj)))

  /** Fixed-point scales of the integer Procrustes solve. Cross-matrix
    * entries live at 1e6 (the round-6 lattice both engines' chain
    * replays already share); rotation entries at 1e8 — fine enough that
    * the quantized iteration's orthogonality defect (~dim·1e-8) is
    * invisible to the round-6 encode lattice, coarse enough that every
    * intermediate product-sum (≤ dim·(√3·1e8)² < 2e18) fits signed
    * 64-bit on the Spark driver and DuckDB's hugeint sums with 4×
    * headroom. */
  val CrossScale = 1000000L
  val PolarScale = 100000000L

  /** Round-half-away-from-zero integer division (b > 0, even) — the one
    * rounding rule Scala `/` (truncate) and DuckDB `//` (truncate) can
    * both express exactly: add ±b/2 toward the sign, then truncate. */
  private def rdiv(a: Long, b: Long): Long = {
    val h = b / 2
    (a + (if (a < 0) -h else h)) / b
  }

  /** Exact integer square root (largest t with t² ≤ v). */
  private def isqrt(v: Long): Long = {
    var t = math.sqrt(v.toDouble).toLong
    while ((t + 1) * (t + 1) <= v) t += 1
    while (t * t > v) t -= 1
    t
  }

  /** The Procrustes cross-matrix of one OPQ alternation, on the
    * [[CrossScale]] integer lattice: M[i][j] = rdiv(Σ rows yl[i]·xl[j],
    * n·1e6) where y = decode(encode(R·x)) lives in the ROTATED space, x
    * is the ORIGINAL vector's round-6 image, and yl/xl are their exact
    * 1e6 lattice integers — tr(RᵀM) is (up to constants) the negated
    * quantization error, so the orthogonal maximizer of tr(RᵀM) is the
    * rotation update (Ge, He, Ke & Sun, "Optimized Product
    * Quantization", CVPR 2013, the OPQ-NP R-step). ONE scan over
    * (x, codes): the double posexplode amplifies rows map-side only —
    * dim² sum/count buffers partial-aggregate before the exchange (the
    * [[kmeansCentroids]] shape). INTEGER sums are order-independent, so
    * the oracle's replay is bit-identical by construction — the
    * round-6-absorbs-ulp argument is NOT enough here, because the polar
    * solve downstream is ill-conditioned exactly when the corpus has
    * near-null covariance directions (measured: double-arithmetic
    * replays diverged at 1e-4 in the fitted rotation). */
  private def procrustesCrossInt(encoded: DataFrame, latticeXCol: String,
                                 codebooks: Seq[Seq[(Long, Seq[Double])]],
                                 dim: Int): Seq[Seq[Long]] = {
    // EXACT >64-bit summation on two LONG halves inside ONE un-exploded
    // native aggregate ([[graft.functions.CrossMatrixSum]], optimization
    // r19): the former double posexplode amplified every corpus row to
    // dim² rows through two Generates and a dim²-key hash aggregate —
    // measured as the single biggest job of every OPQ fit (2.4 s of
    // x129's ~9 s even after the decimal→long change this replaces in
    // turn). The aggregate replicates the exploded form's arithmetic
    // bit-for-bit: identical round(v·1e6)→long lattice images, products
    // summed per cell as (p div 1e9, p % 1e9) halves whose driver
    // recombination sh·1e9 + sl equals Σp per cell by the division
    // identity, and Math.multiplyExact/addExact abort loudly on overflow
    // exactly where ANSI arithmetic did. Integer sums are order-free, so
    // the oracle's hugeint replay is untouched.
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val agg = encoded
      .join(broadcast(codebooksFrame(encoded, codebooks)))
      .select(reconstructCol.as("__y"), col(latticeXCol).as("__x"))
      .agg(ColumnBridge.column(graft.functions.CrossMatrixSum(
        ColumnBridge.expression(col("__y")),
        ColumnBridge.expression(col("__x")),
        dim, CrossScale, HalfSplit).toAggregateExpression()).as("m"))
      .head().getSeq[Long](0)
    val dimSq = dim * dim
    val n = agg(2 * dimSq)
    val m = Array.ofDim[Long](dim, dim)
    if (n != 0L) {
      val den = java.math.BigInteger.valueOf(n * CrossScale)
      for (i <- 0 until dim; j <- 0 until dim) {
        val cell = i * dim + j
        val sum = java.math.BigInteger.valueOf(agg(cell))
          .multiply(java.math.BigInteger.valueOf(HalfSplit))
          .add(java.math.BigInteger.valueOf(agg(dimSq + cell)))
        m(i)(j) = rdivBig(sum, den)
      }
    }
    m.map(_.toSeq).toSeq
  }

  /** Split base of the exact two-long summation in
    * [[procrustesCrossInt]]. */
  private val HalfSplit = 1000000000L

  /** [[rdiv]] in BigInteger — the cross-matrix sums exceed 64 bits at
    * scale. BigInteger divide truncates toward zero like Scala Long. */
  private def rdivBig(a: java.math.BigInteger,
                      b: java.math.BigInteger): Long = {
    val h = b.shiftRight(1)
    val adj = if (a.signum < 0) a.subtract(h) else a.add(h)
    adj.divide(b).longValueExact
  }

  /** Default Newton–Schulz iteration count for [[polarFactorInt]]: from
    * the Frobenius-normalized start the smallest singular value grows
    * ~1.5× per step (σ ← 1.5σ − 0.5σ³), then converges quadratically
    * near 1 — 40 steps close a σmin/‖M‖_F ratio down to ~1e-6 with
    * margin (the correlated gate corpus's circulant mixing leaves
    * near-null covariance frequencies, so its cross-matrix IS
    * ill-conditioned: 16 steps measured RᵀR−I ≈ 0.14, 40 reach the 1e-8
    * lattice floor — below anything the round-6 encode lattice can
    * see). Each step is dim×dim driver arithmetic / three small matmul
    * CTEs in the replay — widening the count costs microseconds,
    * under-running it breaks orthogonality. */
  val NewtonSchulzIters = 40

  /** Orthogonal Procrustes factor polar(M) = U·Vᵀ WITHOUT an SVD: the
    * Newton–Schulz iteration X ← 1.5·X − 0.5·X·Xᵀ·X from X₀ = M/‖M‖_F
    * converges to the polar factor (Higham, "Computing the polar
    * decomposition — with applications", 1986; ‖M‖_F bounds σmax(X₀) ≤ 1,
    * inside the (0,√3) convergence region). An SVD is not replayable in
    * portable SQL; a fixed-iteration matmul chain on an EXACT INTEGER
    * lattice is: `m` enters at [[CrossScale]], X iterates at
    * [[PolarScale]], every product-sum is an exact 64-bit integer (so
    * summation order cannot matter), and every rescale is the shared
    * [[rdiv]] rule. Floating-point matmuls rounded per entry are NOT
    * enough: the polar map's sensitivity to M scales like 1/σmin, so on
    * an ill-conditioned cross-matrix the two engines' ulp-level sum
    * orders amplified to 1e-4 rotation disagreement (measured, round-16
    * form); on the integer lattice both engines compute the SAME bits by
    * construction. Driver-side dim×dim Long arithmetic (64³ multiplies
    * per matmul); all data-sized work stays in [[procrustesCrossInt]]'s
    * one scan. */
  def polarFactorInt(m: Seq[Seq[Long]],
                     iters: Int = NewtonSchulzIters): Seq[Seq[Double]] = {
    val n = m.size
    require(m.forall(_.size == n), "square matrix required")
    val fro2 = m.iterator.flatten.foldLeft(0L)((a, v) => a + v * v)
    require(fro2 > 0L, "polarFactor of a zero matrix")
    val t = isqrt(fro2) // ‖M‖_F at CrossScale
    var x = Array.tabulate(n, n)((i, j) => rdiv(m(i)(j) * PolarScale, t))
    for (_ <- 1 to iters) {
      val y = Array.tabulate(n, n) { (i, k) =>
        var acc = 0L; var j = 0
        while (j < n) { acc += x(i)(j) * x(k)(j); j += 1 }
        rdiv(acc, PolarScale)
      }
      val z = Array.tabulate(n, n) { (i, j) =>
        var acc = 0L; var k = 0
        while (k < n) { acc += y(i)(k) * x(k)(j); k += 1 }
        rdiv(acc, PolarScale)
      }
      x = Array.tabulate(n, n)((i, j) => rdiv(3L * x(i)(j) - z(i)(j), 2L))
    }
    x.map(_.map(_.toDouble / PolarScale).toSeq).toSeq
  }

  /** [[polarFactorInt]] from a double matrix — spec/driver convenience:
    * snaps entries to the [[CrossScale]] lattice, then the exact chain. */
  def polarFactor(m: Seq[Seq[Double]],
                  iters: Int = NewtonSchulzIters): Seq[Seq[Double]] =
    polarFactorInt(m.map(_.map(v => math.round(v * CrossScale))), iters)

  /** OPQ — the learned-rotation upgrade of [[pqCodebooks]] (Ge et al.,
    * CVPR 2013, OPQ-NP). Fixed-iteration alternation, every step on the
    * oracle's decimal lattice:
    *
    *   R₀ = I; repeat opqIters times {
    *     train codebooks on R_t·x           ([[pqCodebooks]], verbatim);
    *     y  = decode(encode(R_t·x));
    *     M  = avg y·round6(x)ᵀ on the 1e6 lattice
    *                                (ONE scan, [[procrustesCrossInt]]);
    *     R_{t+1} = polar(M)         ([[polarFactorInt]], driver-side)
    *   }; final codebooks train on R_final·x.
    *
    * The cross-matrix takes the ORIGINAL vector's round-6 image rather
    * than the raw double (a ≤5e-7 perturbation of the fit objective —
    * far below the quantization error the rotation is minimizing) so
    * that both sides of the product live on the exact integer lattice
    * and the whole R-step replays bit-identically.
    *
    * The rotation aligns the subspace split with the data's principal
    * structure — correlated coordinates that straddle the contiguous
    * split get rotated so their shared energy lands inside single
    * subspaces, cutting quantization MSE at equal m/ks (identical
    * codebook budget). On isotropic iid embeddings the gain is ~zero by
    * construction; the x116 gate measures it where cross-subspace
    * correlation exists. Returns (R_final, codebooks in R_final space).
    * Cost: opqIters+1 codebook trainings + opqIters cross-matrix scans. */
  def fitOpq(embeddings: DataFrame, idCol: String, vecCol: String,
             dim: Int, m: Int, ks: Int, kmIters: Int, opqIters: Int,
             nsIters: Int = NewtonSchulzIters)
      : (Seq[Seq[Double]], Seq[Seq[(Long, Seq[Double])]]) = {
    require(opqIters >= 0, "opqIters must be >= 0")
    var r = identityRotation(dim)
    // __xl: the ORIGINAL vector's round-6 lattice image — constant across
    // alternations (the rotation never touches it), one side of every
    // cross-matrix product
    def rotatedBoth() = embeddings
      .join(broadcast(rotationFrame(embeddings, r)))
      .select(col(idCol),
        transform(col(vecCol), v => round(v.cast("double"), 6)).as("__xl"),
        rotateCol(col(vecCol)).as("__rx"))
    var both = graft.GraftCache.persist(rotatedBoth())
    var cbs = pqCodebooks(both, idCol, "__rx", dim, m, ks, kmIters)
    for (_ <- 1 to opqIters) {
      val enc = pqEncode(both, idCol, "__rx", cbs, carry = Seq("__xl"))
      r = polarFactorInt(procrustesCrossInt(enc, "__xl", cbs, dim), nsIters)
      both = graft.GraftCache.persist(rotatedBoth())
      cbs = pqCodebooks(both, idCol, "__rx", dim, m, ks, kmIters)
    }
    (r, cbs)
  }

  /** Mean quantization error of an encode at its codebooks:
    * round(avg ‖v − decode(encode(v))‖², 6) — the objective OPQ's
    * rotation is fitted to reduce; reported next to recall so the gate
    * pins the mechanism, not just the outcome. One scan; `encoded`
    * carries (vecCol, codes). */
  def quantMse(encoded: DataFrame, vecCol: String,
               codebooks: Seq[Seq[(Long, Seq[Double])]]): DataFrame =
    encoded.join(broadcast(codebooksFrame(encoded, codebooks)))
      .select(reconstructCol.as("__y"), col(vecCol).as("__x"))
      .agg(round(avg(l2sq(col("__x"), col("__y"))), 6).as("mse"))

  /** Materialize the OPQ composed index: the rotation joins `centroids/`
    * and `codebooks/` as a third driver-resident artifact (`rotation/`,
    * dim rows — the index is self-contained), and `codes/` is
    * [[writeIvfPqIndex]] over the ROTATED corpus, range-laid by cell id
    * with the same probe-pruning read path. Appends, deletes, compaction
    * and the recall/nprobe maintenance all operate on the rotated-space
    * artifacts unchanged — the rotation only ever touches vectors at the
    * encode/query boundary. */
  def writeOpqIvfPqIndex(embeddings: DataFrame, idCol: String, vecCol: String,
                         rotation: Seq[Seq[Double]], centroids: DataFrame,
                         codebooks: Seq[Seq[(Long, Seq[Double])]], dir: String,
                         numFiles: Int = 16, carry: Seq[String] = Nil): Unit = {
    writeIvfPqIndex(rotate(embeddings, vecCol, rotation), idCol, vecCol,
      centroids, codebooks, dir, numFiles, carry)
    writeRotation(embeddings.sparkSession, rotation, dir)
  }

  def writeRotation(spark: org.apache.spark.sql.SparkSession,
                    rotation: Seq[Seq[Double]], dir: String): Unit = {
    import spark.implicits._
    rotation.zipWithIndex.map { case (row, i) => (i, row) }
      .toDF("i", "r").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/rotation")
  }

  def readRotation(spark: org.apache.spark.sql.SparkSession,
                   dir: String): Seq[Seq[Double]] =
    spark.read.parquet(s"$dir/rotation").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
      .map(_._2).toSeq

  /** [[appendIvfPqIndex]] through the STORED rotation — the OPQ index's
    * O(|batch|) maintenance: rotate the arriving batch at the boundary
    * with the artifact's own rotation (never a refit), then the
    * inherited append (stored centroids assign, stored codebooks encode,
    * one projection; standing rows never read). Delete, compact, and the
    * adaptive-nprobe maintenance inherit UNCHANGED: rotated-space codes
    * are plain IVF-PQ codes, and the rotation only ever touches vectors
    * at the encode/query boundary. */
  def appendOpqIvfPqIndex(newVectors: DataFrame, idCol: String,
                          vecCol: String, dir: String): Unit =
    appendIvfPqIndex(
      rotate(newVectors, vecCol, readRotation(newVectors.sparkSession, dir)),
      idCol, vecCol, dir)

  /** [[ivfPqTopKOverIndex]] through a stored rotation: rotate the query
    * source at the boundary, then the inherited routed serve — probe the
    * rotated centroids, `cid IN (probes)` file-pruned codes scan, ADC in
    * rotated space. One serving implementation for PQ and OPQ. */
  def opqTopKOverIndex(querySource: DataFrame, idCol: String, vecCol: String,
                       queryId: Long, k: Int, nprobe: Int,
                       rotation: Seq[Seq[Double]], centroids: DataFrame,
                       codebooks: Seq[Seq[(Long, Seq[Double])]],
                       codes: DataFrame): DataFrame =
    ivfPqTopKOverIndex(rotate(querySource, vecCol, rotation), idCol, vecCol,
      queryId, k, nprobe, centroids, codebooks, codes)
}
