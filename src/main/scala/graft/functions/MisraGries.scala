package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native typed-imperative aggregate —
  * the bounded-memory path for "which items occur more than n/(c+1) times"
  * over a column whose cardinality would make an exact `groupBy` shuffle
  * the whole vocabulary. The buffer holds AT MOST `capacity` counters no
  * matter how many distinct items stream through a partition, partial
  * buffers merge associatively map-side (standard partial-aggregation
  * shape), and only ≤ capacity (item, undercount) pairs ever cross the
  * wire per partition.
  *
  * Guarantee (Misra & Gries 1982; mergeability: Agarwal et al., PODS
  * 2012): for a total stream length n, every counter undercounts its item
  * by at most n/(capacity+1), so ANY item with true frequency
  * > n/(capacity+1) is present in the final summary — no false negatives.
  * The two-pass operator built on this
  * ([[graft.operators.Aggregations.heavyHitters]]) therefore returns the
  * EXACT deterministic heavy-hitter set: sketch → candidate set (superset
  * of the true heavy hitters) → broadcast semi-join → exact counts →
  * integer-arithmetic threshold.
  *
  * update: present → +1; room → insert(1); full → decrement ALL by 1,
  * dropping zeros (the classic c-way cancellation). merge: add counters,
  * then if over capacity subtract the (capacity+1)-th largest count from
  * all and drop non-positives — the summary stays ≤ capacity with the
  * error bounds SUMMING across merges (≤ n_total/(capacity+1) overall).
  *
  * Input must be a string column (the token/term/url shapes this serves);
  * nulls are ignored. eval returns map<string,long> of the surviving
  * counters (undercounts, NOT exact frequencies — callers wanting truth
  * run the second exact pass).
  */
@ExpressionDescription(
  usage = "_FUNC_(expr, capacity) - Misra-Gries heavy-hitter sketch of a string column.")
case class MisraGriesSketch(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]] {

  require(capacity > 0, "capacity must be positive")

  type Buffer = scala.collection.mutable.HashMap[String, Long]

  override def createAggregationBuffer(): Buffer =
    scala.collection.mutable.HashMap.empty[String, Long]

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < capacity => buf.update(item, 1L)
        case None =>
          // full and item absent: cancel one occurrence of every tracked
          // item against this one (the (capacity+1)-way cancellation that
          // yields the n/(capacity+1) undercount bound)
          val dead = new scala.collection.mutable.ArrayBuffer[String](4)
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (k, c) => if (c <= 0) dead += k }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: Buffer, b: Buffer): Buffer = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything and
      // drop non-positives: ≤ capacity survivors, error bounds additive
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - (capacity + 1))
      val dead = new scala.collection.mutable.ArrayBuffer[String]
      a.mapValuesInPlace((_, c) => c - d)
      a.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: Buffer): Any = {
    val keys = new Array[Any](buf.size)
    val vals = new Array[Any](buf.size)
    var i = 0
    buf.foreach { case (k, c) =>
      keys(i) = UTF8String.fromString(k); vals(i) = c; i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  // length-prefixed raw UTF-8, not writeUTF: writeUTF hard-fails on items
  // over 64 KB, and a heavy-hitter item can be any string (a URL, a
  // template paragraph) — the sketch must not crash on the data it exists
  // to summarize.
  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      val c = in.readLong()
      buf.update(new String(kb, java.nio.charset.StandardCharsets.UTF_8), c)
      i += 1
    }
    buf
  }

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries_sketch requires a string column, got ${child.dataType}")
  override def prettyName: String = "misra_gries_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesSketch =
    copy(child = newChildren.head)
}
