package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-saving (Metwally et al., "Efficient computation of frequent and
  * top-k elements in data streams", 2005) heavy-hitter buffer: at most
  * `capacity` counters; an unseen value evicts the minimum counter and
  * inherits its count as both estimate floor and error bound.
  *
  * Presence and bracketing guarantees hold for ANY stream or merge
  * order: every value with true count > N/capacity is present, and every
  * estimate ≥ the value's true count (estimate − error ≤ true ≤
  * estimate). The exact buffer contents and estimates, however, are
  * order-deterministic only in the no-eviction regime (distinct values ≤
  * capacity — the registry query's regime): once eviction starts, which
  * counter a merge evicts depends on the order partial buffers arrive,
  * which Spark does not fix across runs. Eviction ties break on the
  * value string so identical merge orders give identical buffers.
  */
final class SpaceSaving(val capacity: Int) {
  val counters: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty

  def add(v: String, inc: Long = 1L, err: Long = 0L): Unit =
    counters.get(v) match {
      case Some((c, e)) => counters(v) = (c + inc, e + err)
      case None if counters.size < capacity => counters(v) = (inc, err)
      case None =>
        val (mv, (mc, _)) = counters.minBy { case (k, (c, _)) => (c, k) }
        counters.remove(mv)
        counters(v) = (mc + inc, mc + err)
    }

  def mergeIn(o: SpaceSaving): Unit =
    o.counters.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
      .foreach { case (v, (c, e)) => add(v, c, e) }

  /** Top k by (estimate desc, value asc) — total, deterministic order. */
  def topK(k: Int): Seq[(String, Long, Long)] =
    counters.toSeq.map { case (v, (c, e)) => (v, c, e) }
      .sortBy { case (v, c, _) => (-c, v) }.take(k)
}

/** `topk_freq(value, k, capacity)` — one-pass mergeable heavy-hitters
  * aggregate returning `array<struct<value, est, err>>`.
  *
  * The §7.3 aggregate-tier extension: Spark's built-ins can answer top-k
  * frequencies only with a full groupBy + sort; this is the streaming
  * sketch shape — fixed memory per partition, partial-aggregable, one
  * shuffle of `capacity`-sized states instead of the whole key space.
  * With capacity ≥ distinct values the result is exact.
  */
case class TopKFreqAgg(
    child: Expression, k: Int, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSaving] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1 && capacity >= k)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_freq expects (string, k>=1, capacity>=k); got " +
        s"${child.dataType.simpleString}, k=$k, capacity=$capacity")

  override def dataType: DataType = ArrayType(new StructType()
    .add("value", StringType).add("est", LongType).add("err", LongType),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "topk_freq"

  override def createAggregationBuffer(): SpaceSaving = new SpaceSaving(capacity)

  override def update(b: SpaceSaving, input: InternalRow): SpaceSaving = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: SpaceSaving, o: SpaceSaving): SpaceSaving = {
    b.mergeIn(o); b
  }

  override def eval(b: SpaceSaving): Any =
    new GenericArrayData(b.topK(k).map { case (v, c, e) =>
      InternalRow(UTF8String.fromString(v), c, e)
    }.toArray[Any])

  override def serialize(b: SpaceSaving): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.capacity)
    out.writeInt(b.counters.size)
    // sorted serialization: byte-stable across identical buffers.
    // length-prefixed raw UTF-8, NOT writeUTF: writeUTF throws past 64 KB
    // of modified-UTF-8, and the aggregate's type check accepts any
    // string column (a document-sized value would crash the shuffle)
    b.counters.toSeq.sortBy(_._1).foreach { case (v, (c, e)) =>
      val vb = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(vb.length); out.write(vb)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSaving = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new SpaceSaving(in.readInt())
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val vb = new Array[Byte](in.readInt()); in.readFully(vb)
      val v = new String(vb, java.nio.charset.StandardCharsets.UTF_8)
      val c = in.readLong(); val e = in.readLong()
      b.counters(v) = (c, e)
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKFreqAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKFreqAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKFreqAgg = copy(child = c.head)
}

object TopKFreqAgg {
  /** Column form: `topk_freq(col, k, capacity)`. */
  def topkFreq(c: Column, k: Int, capacity: Int): Column =
    GraftBridge.column(
      TopKFreqAgg(GraftBridge.expression(c), k, capacity)
        .toAggregateExpression())
}
