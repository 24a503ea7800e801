package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** OPQ (learned-rotation PQ) design claims behind the x115/x116 gates:
  * the Newton–Schulz polar solve really produces the orthogonal
  * Procrustes factor, the fitted rotation is orthogonal, rotation is an
  * isometry of the encode space, and — the reason OPQ exists — the
  * learned rotation strictly cuts quantization MSE at equal m/ks on a
  * corpus with cross-subspace correlation while the stored-index serve
  * stays consistent with the live form. */
class OpqSpec extends SparkSpec {

  private def embeddings =
    graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings

  private def corr =
    graft.queries.VectorQueries.correlatedEmbeddings(embeddings)

  private val Dim = 64
  private val M = 8
  private val Ks = 16
  private val Iters = 2

  private def matmul(a: Seq[Seq[Double]], b: Seq[Seq[Double]]): Seq[Seq[Double]] =
    a.map(row => b.transpose.map(colv =>
      row.zip(colv).map { case (x, y) => x * y }.sum))

  private def maxAbs(m: Seq[Seq[Double]]): Double =
    m.iterator.flatten.map(math.abs).max

  private def minusIdentity(m: Seq[Seq[Double]]): Seq[Seq[Double]] =
    m.zipWithIndex.map { case (row, i) =>
      row.zipWithIndex.map { case (v, j) => if (i == j) v - 1.0 else v } }

  test("polarFactor of an orthogonal matrix is that matrix; of a scaled " +
       "rotation it recovers the rotation (the Procrustes factor)") {
    // 2D rotation embedded in 4D, scaled by 3 — polar factor strips the
    // scale and returns the rotation itself
    val c = math.cos(0.7); val s = math.sin(0.7)
    val rot = Seq(
      Seq(c, -s, 0.0, 0.0), Seq(s, c, 0.0, 0.0),
      Seq(0.0, 0.0, 1.0, 0.0), Seq(0.0, 0.0, 0.0, 1.0))
    val scaled = rot.map(_.map(_ * 3.0))
    // the convenience wrapper snaps the input to the 1e6 CrossScale
    // lattice, so the recovered factor is exact only to ~5e-7 (the
    // iteration itself adds ≤ the 1e-8 PolarScale lattice per entry)
    val p = VectorOps.polarFactor(scaled, 40)
    val diff = p.zip(rot).map { case (pr, rr) =>
      pr.zip(rr).map { case (a, b) => math.abs(a - b) }.max }.max
    assert(diff < 1e-6, s"polar factor diverged from the rotation: $diff")
    val pOfRot = VectorOps.polarFactor(rot, 40)
    val diff2 = pOfRot.zip(rot).map { case (pr, rr) =>
      pr.zip(rr).map { case (a, b) => math.abs(a - b) }.max }.max
    assert(diff2 < 1e-6)
  }

  test("fitOpq returns an orthogonal rotation (RᵀR = I to 1e-6) and " +
       "rotation preserves squared norms to the round-6 lattice") {
    val (r, _) = VectorOps.fitOpq(corr, "vec_id", "embedding",
      Dim, M, Ks, Iters, opqIters = 1)
    val rtr = matmul(r.transpose, r)
    val dev = maxAbs(minusIdentity(rtr))
    assert(dev < 1e-6, s"RᵀR deviates from I by $dev")
    // isometry: ‖R·x‖² == ‖x‖² within rotation orthogonality
    val rotated = VectorOps.rotate(corr, "embedding", r)
    val norms = corr.select(col("vec_id"),
        VectorOps.dot(col("embedding"), col("embedding")).as("n0"))
      .join(rotated.select(col("vec_id"),
        VectorOps.dot(col("embedding"), col("embedding")).as("n1")), "vec_id")
      .select(max(abs(col("n0") - col("n1")))).head.getDouble(0)
    // R's 1e-8 lattice moves ‖·‖² by ≤ dim·2·|x|·‖ΔR·x‖ ≈ 1e-4
    assert(norms < 1e-2, s"rotation is not an isometry: max |Δ‖x‖²| = $norms")
  }

  test("the learned rotation strictly reduces quantization MSE at equal " +
       "m/ks on the correlated corpus, and barely moves it on the iid one") {
    def mseOf(e: org.apache.spark.sql.DataFrame, opqIters: Int): Double = {
      val (r, cbs) = VectorOps.fitOpq(e, "vec_id", "embedding",
        Dim, M, Ks, Iters, opqIters)
      val rot = VectorOps.rotate(e, "embedding", r)
      val enc = VectorOps.pqEncode(rot, "vec_id", "embedding", cbs,
        carry = Seq("embedding"))
      VectorOps.quantMse(enc, "embedding", cbs).head.getDouble(0)
    }
    val pqCorr = mseOf(corr, 0) // opqIters=0 → R=I → plain PQ
    val opqCorr = mseOf(corr, 1)
    info(s"correlated corpus: PQ mse=$pqCorr OPQ mse=$opqCorr " +
      f"(${100.0 * (pqCorr - opqCorr) / pqCorr}%.1f%% lower)")
    assert(opqCorr < pqCorr * 0.97,
      s"OPQ must cut MSE ≥3% on the correlated corpus: pq=$pqCorr opq=$opqCorr")
    val pqIid = mseOf(embeddings, 0)
    val opqIid = mseOf(embeddings, 1)
    info(s"iid corpus: PQ mse=$pqIid OPQ mse=$opqIid")
    assert(opqIid < pqIid * 1.05,
      "OPQ must never make the iid (null-case) corpus materially worse")
  }

  test("stored OPQ index serves identically to the live rotated form and " +
       "the rotation survives the parquet roundtrip") {
    val e = corr
    val (r, cbs) = VectorOps.fitOpq(e, "vec_id", "embedding",
      Dim, M, Ks, Iters, opqIters = 1)
    val rot = VectorOps.rotate(e, "embedding", r)
    val cents = VectorOps.kmeansCentroids(rot, "vec_id", "embedding", 8, Iters)
    val dir = java.nio.file.Files.createTempDirectory("graft-opq-idx").toString
    VectorOps.writeOpqIvfPqIndex(e, "vec_id", "embedding", r, cents, cbs, dir)
    val rBack = VectorOps.readRotation(spark, dir)
    assert(rBack == r, "rotation must be exact through parquet")
    val live = VectorOps.ivfPqTopK(rot, "vec_id", "embedding", 0L, 5,
      cents, 2, cbs)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    val served = VectorOps.opqTopKOverIndex(e, "vec_id", "embedding", 0L, 5, 2,
      rBack, spark.read.parquet(s"$dir/centroids"),
      VectorOps.readPqCodebooks(spark, dir),
      spark.read.parquet(s"$dir/codes"))
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(served == live, "stored serve must equal the live rotated form")
  }
}
