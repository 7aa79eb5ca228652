package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{BinaryType, DataType, StructType}

/** `latest_by(payload, ord)` — argmax aggregate with an object buffer.
  *
  * Spark's builtin `max_by(struct, struct)` carries a struct aggregation
  * buffer, which `HashAggregateExec` cannot hold in its mutable UnsafeRow —
  * the plan silently degrades to `SortAggregate`, sorting every partition
  * of every merge batch (measured in PlanSpec; at 10^10 events the
  * per-partition n·log n and spills are the upsert's dominant cost).
  * `TypedImperativeAggregate` instead runs under `ObjectHashAggregateExec`:
  * hash-based grouping with arbitrary JVM objects as state, falling back
  * to sort only under memory pressure.
  *
  * Semantics: keeps the `payload` row of the maximum `ord` (any orderable
  * type, including structs — ordering per Spark's interpreted ordering);
  * ties keep the first-seen buffer value, so callers wanting determinism
  * pass a total-order `ord` — the engine passes `(seq, commit)`, unique by
  * construction. NULL `ord` rows are ignored (matches max_by).
  */
case class LatestBy(
    payload: Expression,
    ord: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LatestBy.State] {

  override def children: Seq[Expression] = Seq(payload, ord)
  override def nullable: Boolean = true
  override def dataType: DataType = payload.dataType

  private lazy val ordering = TypeUtils.getInterpretedOrdering(ord.dataType)
  // ordinal-bound projections over raw VALUES (not the input schema)
  @transient private lazy val payloadProj =
    UnsafeProjection.create(Array(payload.dataType))
  @transient private lazy val ordProj =
    UnsafeProjection.create(Array(ord.dataType))
  @transient private lazy val pairProj =
    UnsafeProjection.create(Array(payload.dataType, ord.dataType))

  override def createAggregationBuffer(): LatestBy.State = LatestBy.State(null, null)

  override def update(buf: LatestBy.State, input: InternalRow): LatestBy.State = {
    val o = ord.eval(input)
    if (o == null) return buf
    if (buf.ord == null || ordering.gt(o, buf.ord.get(0, ord.dataType))) {
      // copy via UnsafeProjection — the input row's backing buffer is reused
      buf.ord = ordProj.apply(InternalRow(o)).copy()
      buf.payload = payloadProj.apply(InternalRow(payload.eval(input))).copy()
    }
    buf
  }

  override def merge(buf: LatestBy.State, other: LatestBy.State): LatestBy.State = {
    if (other.ord == null) buf
    else if (buf.ord == null ||
        ordering.gt(other.ord.get(0, ord.dataType), buf.ord.get(0, ord.dataType))) other
    else buf
  }

  override def eval(buf: LatestBy.State): Any =
    if (buf.payload == null) null else buf.payload.get(0, payload.dataType)

  override def serialize(buf: LatestBy.State): Array[Byte] = {
    if (buf.ord == null) return Array.emptyByteArray
    val row = pairProj.apply(InternalRow(
      buf.payload.get(0, payload.dataType), buf.ord.get(0, ord.dataType)))
    row.getBytes
  }

  override def deserialize(bytes: Array[Byte]): LatestBy.State = {
    if (bytes.isEmpty) return LatestBy.State(null, null)
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    LatestBy.State(
      ordProj.apply(InternalRow(row.get(1, ord.dataType))).copy(),
      payloadProj.apply(InternalRow(row.get(0, payload.dataType))).copy())
  }

  override def withNewMutableAggBufferOffset(offset: Int): LatestBy =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): LatestBy =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LatestBy =
    copy(payload = newChildren(0), ord = newChildren(1))
  override def prettyName: String = "latest_by"
}

object LatestBy {
  /** ord/payload held as 1-field UnsafeRows (copied, stable storage). */
  final case class State(var ord: UnsafeRow, var payload: UnsafeRow)

  def apply(payload: Column, ord: Column): Column = {
    import org.apache.spark.sql.graftbridge
    graftbridge.column(
      LatestBy(graftbridge.expression(payload),
        graftbridge.expression(ord)).toAggregateExpression())
  }
}
