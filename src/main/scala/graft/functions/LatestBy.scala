package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Expression, GenericInternalRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.types.DataType

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
  * type, including structs — ordering identical to Spark's SortOrder
  * Ascending/NullsFirst, the same total order the previous interpreted
  * form used); ties keep the first-seen buffer value, so callers wanting
  * determinism pass a total-order `ord` — the engine passes `(seq,
  * commit)`, unique by construction. NULL `ord` rows are ignored (matches
  * max_by).
  *
  * Hot-path design (this aggregate runs once per CDC event in the merge):
  *  - the buffer is ONE UnsafeRow `[payload, ord]` produced by a single
  *    UnsafeProjection and copied once per winner update — the previous
  *    shape evaluated two projections and two copies per update, which
  *    profiled at ~20% of merge CPU;
  *  - comparisons go through a codegen'd [[LazilyGeneratedOrdering]]
  *    (unboxed field compares) instead of the interpreted struct ordering
  *    (per-field boxing via `get(i, dataType)`);
  *  - `serialize` is just `row.getBytes` — the buffer already IS the wire
  *    format — and `deserialize` wraps the (freshly allocated, per
  *    `UnsafeRow.getBinary`) byte array without a further copy.
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

  // Codegen'd total order over the ord VALUE (held in a 1-field row).
  // Ascending + NullsFirst matches the interpreted ordering this replaces;
  // LazilyGeneratedOrdering itself falls back to interpreted on codegen
  // failure and is serialization-safe. JVM-global per ord type: a
  // per-task instance would re-enter Spark's codegen compile cache on
  // every task — its per-key lock serialized the many-tiny-tasks pipeline
  // regime (profiled: tasks parked in KeyLock.withLock under
  // LatestBy.ordering init). The generated comparator is stateless, so
  // sharing across tasks is safe.
  @transient private lazy val ordering: LazilyGeneratedOrdering =
    LatestBy.orderingFor(ord.dataType)
  // Reusable wrappers: aggregate instances are per-task and update/merge
  // are single-threaded within a task (same pattern as Spark's Collect).
  @transient private lazy val leftRow = new GenericInternalRow(1)
  @transient private lazy val rightRow = new GenericInternalRow(1)
  @transient private lazy val pairInput = new GenericInternalRow(2)
  @transient private lazy val pairProj =
    UnsafeProjection.create(Array(payload.dataType, ord.dataType))

  /** compare(a, b) > 0  ⇔  a > b under the ord total order. */
  private def gtOrd(a: Any, b: Any): Boolean = {
    leftRow.update(0, a)
    rightRow.update(0, b)
    ordering.compare(leftRow, rightRow) > 0
  }

  override def createAggregationBuffer(): LatestBy.State = LatestBy.State(null)

  override def update(buf: LatestBy.State, input: InternalRow): LatestBy.State = {
    val o = ord.eval(input)
    if (o == null) return buf
    if (buf.row == null || gtOrd(o, buf.row.get(1, ord.dataType))) {
      pairInput.update(0, payload.eval(input))
      pairInput.update(1, o)
      // one projection + one copy — the input row's backing buffer is reused
      buf.row = pairProj.apply(pairInput).copy()
    }
    buf
  }

  override def merge(buf: LatestBy.State, other: LatestBy.State): LatestBy.State = {
    if (other.row == null) buf
    else if (buf.row == null ||
        gtOrd(other.row.get(1, ord.dataType), buf.row.get(1, ord.dataType))) other
    else buf
  }

  override def eval(buf: LatestBy.State): Any =
    if (buf.row == null) null else buf.row.get(0, payload.dataType)

  override def serialize(buf: LatestBy.State): Array[Byte] =
    if (buf.row == null) Array.emptyByteArray else buf.row.getBytes

  override def deserialize(bytes: Array[Byte]): LatestBy.State = {
    if (bytes.isEmpty) return LatestBy.State(null)
    val row = new UnsafeRow(2)
    // the array comes from UnsafeRow.getBinary (always freshly allocated),
    // so pointing at it without a defensive copy is safe
    row.pointTo(bytes, bytes.length)
    LatestBy.State(row)
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
  /** Winner held as ONE 2-field UnsafeRow `[payload, ord]` (copied, stable
    * storage); `row == null` = empty buffer. */
  final case class State(var row: UnsafeRow)

  private val orderingCache =
    new java.util.concurrent.ConcurrentHashMap[DataType, LazilyGeneratedOrdering]

  private[functions] def orderingFor(dt: DataType): LazilyGeneratedOrdering =
    orderingCache.computeIfAbsent(dt, d =>
      new LazilyGeneratedOrdering(Seq(SortOrder(
        BoundReference(0, d, nullable = false), Ascending))))

  def apply(payload: Column, ord: Column): Column = {
    import org.apache.spark.sql.graftbridge
    graftbridge.column(
      LatestBy(graftbridge.expression(payload),
        graftbridge.expression(ord)).toAggregateExpression())
  }
}
