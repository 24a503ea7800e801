package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bloom-filter membership sketch as a native typed-imperative aggregate —
  * the runtime-filter / admission-screen primitive (Bloom, CACM 1970;
  * Kirsch & Mitzenmacher, ESA 2006 for the double-hashing probe scheme).
  * At 100 TB the shape it enables is "prune the huge side BEFORE the
  * exchange": a selective join's build-side keys fold into nBits/8 bytes
  * that BROADCAST to every probe-side task, and rows that cannot possibly
  * match never enter the shuffle; the admission twin ("is this fingerprint
  * possibly in the seen-set?") screens arriving documents against a
  * stored filter without joining the full history — only the bloom-HIT
  * slice pays the exact confirm join.
  *
  * Engine-citizen properties, mirroring [[KmvSketch]]:
  *  - NO FALSE NEGATIVES, by construction: a member's probe bits are all
  *    set in any filter that absorbed it, under any partitioning or merge
  *    order. Every consumer query composes the filter with an exact
  *    confirm step, so results are invariant to false-positive rate and
  *    therefore oracle-checkable (the DuckDB image is the exact
  *    semi/anti-join the bloom accelerates).
  *  - LOSSLESSLY MERGEABLE: filter(A ∪ B) = filter(A) | filter(B),
  *    bitwise — per-shard filters OR into the corpus filter exactly, and
  *    the stored-artifact append is `zip_with(old, new, bitwise or)`, a
  *    builtin (no custom read path at all).
  *
  * Probe scheme (shared verbatim with the SQL-side reader
  * [[graft.operators.Bloom.mightContain]], which is composed purely from
  * codegen'd builtins): for a 60-bit non-negative hash h and nBits = 2^b,
  *   base = h & (nBits-1);  step = ((h >>> 20) & (nBits-1)) | 1
  *   pos_i = (base + i*step) & (nBits-1),  i = 0..numProbes-1
  * `step` is odd so probes never collapse onto one position when nBits is
  * a power of two; all arithmetic stays well under 2^62 so the SQL twin
  * is ANSI-overflow-safe. Input is the engine-standard 60-bit
  * [[Md5Hash60]] hash (nulls ignored); eval returns array<long> of the
  * nBits/64 filter words.
  */
@ExpressionDescription(
  usage = "_FUNC_(hash, nBits, numProbes) - Bloom filter over a long hash column as nBits/64 words.")
case class BloomSketch(
    child: Expression,
    nBits: Int,
    numProbes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(nBits >= 64 && (nBits & (nBits - 1)) == 0,
    s"nBits must be a power of two >= 64, got $nBits")
  require(numProbes > 0, s"numProbes must be positive, got $numProbes")

  private def words = nBits / 64

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  private def setBits(buf: Array[Long], h: Long): Unit = {
    val mask = nBits - 1
    val base = (h & mask).toInt
    val step = (((h >>> 20) & mask) | 1L).toInt
    var i = 0
    while (i < numProbes) {
      val pos = (base + i * step) & mask
      buf(pos >>> 6) |= (1L << (pos & 63))
      i += 1
    }
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) setBits(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](buf.length)
    var i = 0
    while (i < buf.length) { out(i) = buf(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_sketch requires a long hash column, got ${child.dataType}")
  override def prettyName: String = "bloom_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomSketch =
    copy(child = newChildren.head)
}
