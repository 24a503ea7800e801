package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native
  * typed-imperative aggregate — the mergeable, bounded-memory path for
  * COUNT(DISTINCT key) over a column whose cardinality would make the
  * exact form shuffle every distinct key (at 100 TB, "how many distinct
  * sessions/urls/orders" is a full-corpus exchange; the sketch crosses the
  * wire as ≤ k longs per partition).
  *
  * The sketch of a multiset is the set of the k SMALLEST distinct values
  * of a uniform hash of its elements (Bar-Yossef et al., "Counting
  * distinct elements in a data stream", RANDOM 2002; mergeability:
  * Beyer et al., SIGMOD 2007 §3). Two properties make it a first-class
  * engine citizen rather than a heuristic:
  *
  *  - DETERMINISTIC and ORDER-FREE: "k smallest distinct hashes of a set"
  *    does not depend on row order, partitioning, or merge tree shape —
  *    so the sketch is oracle-checkable (the DuckDB image is
  *    `SELECT DISTINCT h ORDER BY h LIMIT k`), unlike HLL whose register
  *    layout is implementation-defined.
  *  - LOSSLESSLY MERGEABLE: sketch(A ∪ B) = trim_k(sketch(A) ∪ sketch(B)),
  *    exactly. Per-shard sketches combine into the corpus sketch with no
  *    approximation added by the merge — the property the stored-sketch
  *    lifecycle (a21) is built on.
  *
  * Estimator: with hashes uniform on [0, 2^60) and h_k the k-th smallest,
  * E ≈ (k-1)·2^60/h_k (the unbiased form); below k distinct hashes the
  * sketch IS the distinct set and the count is exact. The estimate is
  * derived from the sketch by [[graft.operators.Aggregations.kmvEstimate]]
  * as a fixed scalar expression so both engines compute bit-identical
  * doubles.
  *
  * Input is a LongType hash column — callers hash keys through the
  * engine-standard 60-bit md5 ([[Md5Hash60]]) so the oracle can replay the
  * exact hash values; nulls are ignored. eval returns array<long> of the
  * surviving hashes ascending (the sketch itself, ≤ k entries).
  */
@ExpressionDescription(
  usage = "_FUNC_(hash, k) - KMV distinct-count sketch: the k smallest distinct values of a long hash column, ascending.")
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0, "k must be positive")

  type Buffer = java.util.TreeSet[java.lang.Long]

  override def createAggregationBuffer(): Buffer = new java.util.TreeSet[java.lang.Long]()

  /** Insert keeping only the k smallest distinct values: a full buffer
    * rejects anything ≥ its max without mutating (the common case once
    * the buffer saturates — one tree lookup per row). */
  private def insert(buf: Buffer, v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) buf.pollLast()
      ()
    }
  }

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Buffer, b: Buffer): Buffer = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  override def eval(buf: Buffer): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch requires a long hash column, got ${child.dataType}")
  override def prettyName: String = "kmv_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)
}
