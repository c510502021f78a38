package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Runtime kernels of the one-pass inverted-index candidate generator
  * (r22 — the q18/q82 shape): per-posting-list id collection with a
  * HARD df cap, and local id-pair generation from the collected list.
  * Together they replace the df-cap count-aggregate + semi-join + posting
  * self-join (which re-ran the corpus scan+tokenize+shingle pass once per
  * consumer — 11 scans in q18's executed plan) with ONE pass over the
  * posting rows and ONE exchange of cap-bounded buffers. */
object PostingPairs {

  /** All index pairs (i < j) of a SORTED-ascending long array with the
    * strict value inequality `ids(i) < ids(j)` — exactly the pair
    * multiset of the posting self-join `a.__sh === b.__sh && a.__id <
    * b.__id` restricted to one shingle group: every unordered pair of
    * posting rows with distinct ids yields exactly one (i < j) index
    * pair (equal ids never pair, duplicate values multiply exactly as
    * the join would). Output bounded by C(cap, 2) — the df cap is the
    * admission contract upstream. */
  def sortedLongPairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](n * (n - 1) / 2)
    var i = 0
    while (i < n - 1) {
      val a = arr.getLong(i)
      var j = i + 1
      while (j < n) {
        val b = arr.getLong(j)
        if (a < b) out.add(InternalRow(a, b))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `sorted_long_pairs(ids)`: array<bigint> (sorted asc) →
  * array<struct<id_a:bigint, id_b:bigint>> — see
  * [[PostingPairs.sortedLongPairs]]. Codegen'd: the pair fan-out is the
  * hot path of the inverted-index dedup family. */
case class SortedLongPairs(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_long_pairs expects array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "sorted_long_pairs"
  override def nullSafeEval(v: Any): Any =
    PostingPairs.sortedLongPairs(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PostingPairs.sortedLongPairs($c)")
  override protected def withNewChildInternal(c: Expression): SortedLongPairs =
    copy(child = c)
}

object SortedLongPairs {
  def asColumn(ids: Column): Column =
    ColumnBridge.column(SortedLongPairs(ColumnBridge.expression(ids)))
}

/** Aggregation buffer of [[CappedLongIds]]: `n` counts EVERY input row
  * (nulls included — the df-cap contract counts posting ROWS, exactly
  * like the count-aggregate + `HAVING COUNT(*) <= cap` it replaces);
  * `ids` holds at most `cap` non-null values. Skipping appends past
  * `cap` is lossless: one more non-null id means n > cap, so the group
  * is discarded at eval anyway — per-group state is cap-bounded however
  * hot the posting list, which is what makes the one-pass form safe at
  * corpus scale (a boilerplate shingle in a billion docs buffers cap
  * ids, not a billion). */
final class CappedIdsBuffer(var n: Long, var size: Int, var ids: Array[Long]) {
  def append(v: Long, cap: Int): Unit = {
    if (size < cap) {
      if (size == ids.length) {
        val grown = new Array[Long](math.min(cap, math.max(8, ids.length * 2)))
        System.arraycopy(ids, 0, grown, 0, size)
        ids = grown
      }
      ids(size) = v
      size += 1
    }
  }
}

/** `capped_ids(id, cap)`: per-group capped distinct-row id collection —
  * the fused df-cap + collect of the inverted-index family. Returns the
  * group's non-null ids SORTED ascending when the group's ROW count
  * (nulls included) is ≤ `cap`, NULL otherwise. One map-side-combined
  * aggregation replaces the former two passes (count aggregate → filter
  * → left-semi join back onto the posting list) and bounds both the
  * aggregation state and the shuffled bytes at `cap` ids per group per
  * map partition. */
case class CappedLongIds(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedIdsBuffer] {
  require(cap >= 1, s"cap must be >= 1; got $cap")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "capped_ids"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"capped_ids expects bigint, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): CappedIdsBuffer =
    new CappedIdsBuffer(0L, 0, new Array[Long](8))

  override def update(buf: CappedIdsBuffer, input: InternalRow): CappedIdsBuffer = {
    val v = child.eval(input)
    buf.n += 1
    if (v != null) buf.append(v.asInstanceOf[Long], cap)
    buf
  }

  override def merge(buf: CappedIdsBuffer, other: CappedIdsBuffer): CappedIdsBuffer = {
    buf.n += other.n
    var i = 0
    while (i < other.size) { buf.append(other.ids(i), cap); i += 1 }
    buf
  }

  override def eval(buf: CappedIdsBuffer): Any = {
    if (buf.n > cap) null
    else {
      val out = java.util.Arrays.copyOf(buf.ids, buf.size)
      java.util.Arrays.sort(out)
      new GenericArrayData(out)
    }
  }

  override def serialize(buf: CappedIdsBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + 8 * buf.size)
    bb.putLong(buf.n)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedIdsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong()
    val size = bb.getInt()
    val ids = new Array[Long](math.max(size, 8))
    var i = 0
    while (i < size) { ids(i) = bb.getLong(); i += 1 }
    new CappedIdsBuffer(n, size, ids)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedLongIds =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedLongIds =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedLongIds =
    copy(child = newChildren.head)
}

object CappedLongIds {
  def asColumn(id: Column, cap: Int): Column =
    ColumnBridge.column(
      CappedLongIds(ColumnBridge.expression(id), cap).toAggregateExpression())
}
