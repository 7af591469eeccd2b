package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact-integer Gramian accumulator for an `array<bigint>` column: one
  * mergeable buffer carrying, over all rows,
  *
  *  - `nj(k)` — how many rows have a position k (ragged-aware),
  *  - `tj(k)` — the exact sum of non-null components at k,
  *  - `s(j,k)` (j ≤ k, packed at `k*(k+1)/2 + j`) — the exact sum of
  *    products of non-null component pairs.
  *
  * This is the single-corpus-pass moments engine behind
  * `graft.llm.EmbPca`: the previous formulation exploded dim²/2 pair
  * structs PER VECTOR into a dim²-key hash agg — numerically identical,
  * but it shuffles (and allocates) a dim²·n-row intermediate stream,
  * which made `emb_covariance` the engine's worst 10× sweep ratio (9.0×)
  * and capped the family at dim 512. Here each row folds into a flat
  * long buffer in place (dim²/2 multiply-adds, zero allocation), partial
  * buffers combine map-side, and exactly ONE buffer per partition
  * crosses the shuffle — the mergeable-sketch shape, with none of the
  * algebra downstream changing because the sums are bit-identical.
  *
  * Null/ragged parity with the explode formulation (the oracle contract):
  * a null component contributes to `nj` but not to `tj`/`s`, and a
  * position (or pair) whose every contribution was null evaluates to SQL
  * NULL — tracked in presence bitsets, since the explode's `sum()` skips
  * nulls but returns NULL over an all-null group. Pairs that never
  * co-occur in one row are emitted by neither formulation (arrays are
  * prefix-indexed, so pair (j,k), j≤k, co-occurs iff `nj(k) > 0` — the
  * consumer filters on that).
  *
  * All adds/multiplies are `Math.*Exact`: the explode path inherited
  * ANSI-mode overflow loudness from Spark's `sum`, and a silent wrap
  * here would corrupt the covariance without a trace.
  *
  * Buffer cost: `maxDim`(`maxDim`+1)/2 + 2·`maxDim` longs + 2 bitsets —
  * 4.2 MB at dim 1024, 67 MB at the 4096 ceiling; one per partition plus
  * one merged, far under executor budgets at either width. Past 4096 the
  * update fails loudly (never truncates): that regime wants a sharded
  * (block-partitioned) Gramian, which this engine does not claim.
  */
final class GramianBuf {
  var d: Int = 0
  var nj: Array[Long] = Array.emptyLongArray
  var tj: Array[Long] = Array.emptyLongArray
  var s: Array[Long] = Array.emptyLongArray
  // presence bits: tjSet(k) — any non-null component seen at k;
  // sSet(packed j,k) — any non-null product folded into s
  var tjSet: Array[Long] = Array.emptyLongArray
  var sSet: Array[Long] = Array.emptyLongArray

  @inline private def bitGet(b: Array[Long], i: Int): Boolean =
    (b(i >> 6) & (1L << (i & 63))) != 0
  @inline private def bitPut(b: Array[Long], i: Int): Unit =
    b(i >> 6) |= 1L << (i & 63)

  def grow(nd: Int): Unit = if (nd > d) {
    val np = nd * (nd + 1) / 2
    nj = java.util.Arrays.copyOf(nj, nd)
    tj = java.util.Arrays.copyOf(tj, nd)
    s = java.util.Arrays.copyOf(s, np)
    tjSet = java.util.Arrays.copyOf(tjSet, (nd + 63) >> 6)
    sSet = java.util.Arrays.copyOf(sSet, (np + 63) >> 6)
    d = nd
  }

  /** Fold one row's array in. Elements are read through `isNullAt` —
    * a null slot's `getLong` would read garbage, not null. */
  def add(a: ArrayData): Unit = {
    val n = a.numElements()
    grow(n)
    var k = 0
    while (k < n) {
      nj(k) += 1
      if (!a.isNullAt(k)) {
        val qk = a.getLong(k)
        tj(k) = Math.addExact(tj(k), qk)
        bitPut(tjSet, k)
        val base = k * (k + 1) / 2
        var j = 0
        while (j <= k) {
          if (!a.isNullAt(j)) {
            s(base + j) = Math.addExact(s(base + j), Math.multiplyExact(a.getLong(j), qk))
            bitPut(sSet, base + j)
          }
          j += 1
        }
      }
      k += 1
    }
  }

  /** Elementwise merge: unset positions hold 0, so a plain add plus a
    * bit-OR is exact in any merge order. */
  def mergeIn(o: GramianBuf): Unit = {
    grow(o.d)
    var i = 0
    while (i < o.d) { nj(i) += o.nj(i); tj(i) = Math.addExact(tj(i), o.tj(i)); i += 1 }
    i = 0
    val op = o.d * (o.d + 1) / 2
    while (i < op) { s(i) = Math.addExact(s(i), o.s(i)); i += 1 }
    i = 0
    while (i < o.tjSet.length) { tjSet(i) |= o.tjSet(i); i += 1 }
    i = 0
    while (i < o.sSet.length) { sSet(i) |= o.sSet(i); i += 1 }
  }

  /** (d, nj, tj-with-nulls, s-with-nulls) as Catalyst values. */
  def toRow: InternalRow = {
    val tjOut = new Array[Any](d)
    var i = 0
    while (i < d) { if (bitGet(tjSet, i)) tjOut(i) = tj(i); i += 1 }
    val np = d * (d + 1) / 2
    val sOut = new Array[Any](np)
    i = 0
    while (i < np) { if (bitGet(sSet, i)) sOut(i) = s(i); i += 1 }
    InternalRow(d, new GenericArrayData(nj.map(x => x: Any)),
      new GenericArrayData(tjOut), new GenericArrayData(sOut))
  }
}

/** `gramian(qa, maxDim)` — the one-pass exact moments aggregate.
  * Returns `struct<d:int, nj:array<bigint>, tj:array<bigint>,
  * s:array<bigint>>` with `s` packed upper-triangle at
  * `k*(k+1)/2 + j`. */
case class GramianAgg(
    child: Expression, maxDim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramianBuf] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if maxDim >= 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gramian expects (array<bigint>, maxDim>=1); got ${t.simpleString}, maxDim=$maxDim")
  }

  override def dataType: DataType = new StructType()
    .add("d", IntegerType, nullable = false)
    .add("nj", ArrayType(LongType, containsNull = false))
    .add("tj", ArrayType(LongType, containsNull = true))
    .add("s", ArrayType(LongType, containsNull = true))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "gramian"

  override def createAggregationBuffer(): GramianBuf = new GramianBuf

  override def update(b: GramianBuf, input: InternalRow): GramianBuf = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      if (a.numElements() > maxDim) throw new IllegalArgumentException(
        s"gramian: dim ${a.numElements()} exceeds maxDim $maxDim — a wider " +
          "corpus needs a sharded (block-partitioned) Gramian, not a bigger buffer")
      b.add(a)
    }
    b
  }

  override def merge(b: GramianBuf, o: GramianBuf): GramianBuf = { b.mergeIn(o); b }

  override def eval(b: GramianBuf): Any = b.toRow

  override def serialize(b: GramianBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.d)
    b.nj.foreach(out.writeLong)
    b.tj.foreach(out.writeLong)
    b.s.foreach(out.writeLong)
    b.tjSet.foreach(out.writeLong)
    b.sSet.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GramianBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new GramianBuf
    b.grow(in.readInt())
    def fill(a: Array[Long]): Unit = {
      var i = 0
      while (i < a.length) { a(i) = in.readLong(); i += 1 }
    }
    fill(b.nj); fill(b.tj); fill(b.s); fill(b.tjSet); fill(b.sSet)
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): GramianAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramianAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): GramianAgg = copy(child = c.head)
}

object GramianAgg {
  /** Column form: `gramian(col("qa"), maxDim)`. */
  def gramian(c: Column, maxDim: Int): Column =
    GraftBridge.column(
      GramianAgg(GraftBridge.expression(c), maxDim).toAggregateExpression())
}
