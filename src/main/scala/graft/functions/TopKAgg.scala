package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, InterpretedOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{col, posexplode}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded-state grouped top-k — the scale-safe replacement for
  * `row_number().over(Window.partitionBy(group).orderBy(value, id))`
  * on CANDIDATE-SIZED relations (ANN shortlists, brute-force scans).
  *
  * The window form must co-locate every candidate of a group in one
  * task and sort them there: a hot group (one IVF cell holding a
  * dense embedding cluster) serializes its whole ~share²·n² candidate
  * mass into a single task — the measured ×100 mining straggler
  * (SCALE_NOTES finding 16, one 25-min task). Even the salted
  * two-stage `collect_list` top-k ([[graft.events.TopK.topKBy]])
  * buffers entire map-partition bucket contents before slicing.
  *
  * This aggregate keeps AT MOST `k` rows per group in every buffer:
  * map-side partial aggregation reduces each map task's contribution
  * per group to k rows before the shuffle, the shuffle carries
  * ≤ k·maps rows per group, and the reduce merge is a k-bounded
  * sorted-insert — no per-group sort of the candidate mass exists
  * anywhere in the plan. Skew relief is structural, not salted.
  *
  * Ordering contract (identical to the window form it replaces):
  * field 0 of the child struct is the ranking value (`asc` false =
  * descending, Spark sort semantics — NaN above every real value,
  * nulls last), field 1 the per-group-unique tiebreak id (ascending);
  * any further fields are payload carried through unordered.
  */
case class BoundedTopKAgg(
    child: Expression,
    k: Int,
    asc: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[InternalRow]] {

  require(k >= 1, s"bounded_top_k: k must be positive, got $k")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case st: StructType if st.length >= 2 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects struct(value, id, payload…), got ${other.simpleString}")
  }

  @transient private lazy val ordering = new InterpretedOrdering(Seq(
    SortOrder(BoundReference(0, structType(0).dataType, structType(0).nullable),
      if (asc) Ascending else Descending),
    SortOrder(BoundReference(1, structType(1).dataType, structType(1).nullable),
      Ascending)))

  @transient private lazy val proj = UnsafeProjection.create(structType)

  override def createAggregationBuffer(): ArrayBuffer[InternalRow] =
    ArrayBuffer.empty[InternalRow]

  /** Binary sorted-insert of an OWNED row; drops beyond k. The caller
    * guarantees `row` is not shared mutable state.
    */
  private def insertOwned(
      buf: ArrayBuffer[InternalRow], row: InternalRow): Unit = {
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ordering.compare(row, buf(mid)) < 0) hi = mid else lo = mid + 1
    }
    buf.insert(lo, row)
    if (buf.length > k) buf.remove(buf.length - 1)
  }

  override def update(
      buf: ArrayBuffer[InternalRow], input: InternalRow): ArrayBuffer[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      // compare BEFORE copying: rows that lose to the current worst
      // (the overwhelming majority on big groups) never allocate
      if (buf.length < k || ordering.compare(row, buf(buf.length - 1)) < 0)
        insertOwned(buf, proj(row).copy())
    }
    buf
  }

  override def merge(
      buf: ArrayBuffer[InternalRow],
      other: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] = {
    // deserialized rows are exclusively owned — no copy
    other.foreach { row =>
      if (buf.length < k || ordering.compare(row, buf(buf.length - 1)) < 0)
        insertOwned(buf, row)
    }
    buf
  }

  override def eval(buf: ArrayBuffer[InternalRow]): Any =
    new GenericArrayData(buf.toArray[Any])

  override def serialize(buf: ArrayBuffer[InternalRow]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val d = new DataOutputStream(out)
    d.writeInt(buf.length)
    buf.foreach { r =>
      val u = r match {
        case u: UnsafeRow => u
        case other        => proj(other)
      }
      val bytes = u.getBytes
      d.writeInt(bytes.length)
      d.write(bytes)
    }
    d.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[InternalRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val nf = structType.length
    val buf = new ArrayBuffer[InternalRow](n)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val row = new UnsafeRow(nf)
      row.pointTo(arr, len)
      buf += row
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_top_k"
  override def children: Seq[Expression] = child :: Nil

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopKAgg =
    copy(child = newChildren.head)
}

object BoundedTopK {

  /** Per-group top-k of `item` rows — `item` is a struct whose FIRST
    * field ranks (desc unless `asc`), SECOND field breaks ties (asc,
    * must be unique per group for determinism), remaining fields are
    * payload. Returns `(groupCols…, rank int 1-based, __item struct)`;
    * callers project `__item.<field>` back out. Row-identical to
    * `row_number().over(Window.partitionBy(groupCols).orderBy(value,
    * id)).where(rank <= k)` with every buffer k-bounded.
    */
  def topK(
      df: DataFrame,
      groupCols: Seq[String],
      item: Column,
      k: Int,
      asc: Boolean = false): DataFrame = {
    val agg = GraftExpressionBridge.column(
      BoundedTopKAgg(GraftExpressionBridge.expression(item), k, asc)
        .toAggregateExpression())
    df.groupBy(groupCols.map(col): _*)
      .agg(agg.as("__top"))
      .select(groupCols.map(col) :+ posexplode(col("__top")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).as("rank"), col("col").as("__item")): _*)
  }
}
