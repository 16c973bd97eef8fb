package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Exact distinct-count over a BOUNDED non-negative integer id domain,
  * accumulated in a dense bitmap — the Druid/ClickHouse `groupBitmap`
  * accelerator, implemented as a Catalyst `TypedImperativeAggregate`
  * (the deep aggregate extension point: partial states are opaque
  * byte-array buffers that Spark shuffles and merges, unlike the typed
  * `Aggregator` used by agg_custom_topk which rides Dataset encoders).
  *
  * Why it exists next to count(DISTINCT x): Spark's exact distinct
  * rewrites to a two-phase aggregate whose partial state is the SET of
  * distinct values seen per group — shuffle volume grows with value
  * cardinality, and multiple distincts in one query trigger the Expand
  * blow-up. A bitmap partial is O(domain/8) bytes REGARDLESS of row
  * count, merge is a word-wise OR (order-independent — deterministic
  * under any partitioning), and eval is a popcount. For dense bounded
  * domains (user ids, part keys — the dimension-key shape of every
  * fact table here) this is the standard OLAP accelerator; for sparse
  * or unbounded domains use HLL (approx_distinct_parts) — that split
  * is the documented contract, enforced by [[BitmapDistinct.MaxId]]
  * with a self-announcing failure (the Hist.bounded discipline), never
  * a silent wrong answer.
  *
  * Null ids are skipped (SQL count-distinct semantics). Ids must lie in
  * [0, MaxId); the 2²⁶ cap bounds any single buffer at 8 MiB. */
case class BitmapDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.BitSet]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bitmap_distinct expects an integral id column, got ${dt.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_distinct"

  override def createAggregationBuffer(): java.util.BitSet =
    new java.util.BitSet()

  override def update(buffer: java.util.BitSet,
                      input: InternalRow): java.util.BitSet = {
    val v = child.eval(input)
    if (v != null) {
      val id = v match {
        case i: java.lang.Integer => i.longValue()
        case l: java.lang.Long => l.longValue()
      }
      if (id < 0 || id >= BitmapDistinct.MaxId)
        throw new IllegalArgumentException(
          s"bitmap_distinct: id $id outside [0, ${BitmapDistinct.MaxId}) — " +
            "this aggregate is the dense bounded-domain accelerator; " +
            "use an approximate distinct (HLL) for unbounded domains")
      buffer.set(id.toInt)
    }
    buffer
  }

  override def merge(buffer: java.util.BitSet,
                     input: java.util.BitSet): java.util.BitSet = {
    buffer.or(input)
    buffer
  }

  override def eval(buffer: java.util.BitSet): Any =
    buffer.cardinality().toLong

  /** Density-adaptive partial encoding (the r11 verdict's volume lever):
    * a dense `BitSet.toByteArray` partial is O(highest-set-bit/8) bytes
    * REGARDLESS of cardinality — at the 2²⁶ cap that is up to 8 MiB per
    * (group × partition) partial even when the partition saw only a
    * handful of ids, and a 365-group × wide-shuffle workload ships
    * group·partition of them. Low-cardinality partials (the common
    * map-side case: each partition sees a slice of each group) now
    * serialize as delta-varint sorted ids instead; the encoding is
    * chosen per buffer by a conservative size comparison, so the wire
    * bytes are never worse than dense. `deserialize` restores the exact
    * same BitSet either way — merge stays a word-wise OR and every
    * result hash is unchanged. */
  override def serialize(buffer: java.util.BitSet): Array[Byte] = {
    val card = buffer.cardinality()
    // dense toByteArray size WITHOUT allocating it: (highest set bit + 7) / 8
    // — materializing up to 8 MiB just to size-compare would keep the heap
    // churn the sparse branch exists to avoid
    val denseLen = (buffer.length() + 7) / 8
    // varint of a 2²⁶ delta is ≤ 4 bytes; +6 covers header + cardinality
    if (card.toLong * 4 + 6 < denseLen) {
      val out = new java.io.ByteArrayOutputStream(card * 4 + 6)
      out.write(BitmapDistinct.FormatSparse)
      BitmapDistinct.writeVarInt(out, card)
      var prev = -1
      var i = buffer.nextSetBit(0)
      while (i >= 0) {
        BitmapDistinct.writeVarInt(out, i - prev) // deltas are >= 1
        prev = i
        i = buffer.nextSetBit(i + 1)
      }
      out.toByteArray
    } else {
      val dense = buffer.toByteArray
      val out = new Array[Byte](dense.length + 1)
      out(0) = BitmapDistinct.FormatDense
      System.arraycopy(dense, 0, out, 1, dense.length)
      out
    }
  }

  override def deserialize(storageFormat: Array[Byte]): java.util.BitSet =
    storageFormat(0) match {
      case BitmapDistinct.FormatDense =>
        java.util.BitSet.valueOf(java.nio.ByteBuffer.wrap(
          storageFormat, 1, storageFormat.length - 1))
      case BitmapDistinct.FormatSparse =>
        val in = new java.io.ByteArrayInputStream(
          storageFormat, 1, storageFormat.length - 1)
        val card = BitmapDistinct.readVarInt(in)
        val bs = new java.util.BitSet()
        var prev = -1
        var n = 0
        while (n < card) {
          prev += BitmapDistinct.readVarInt(in)
          bs.set(prev)
          n += 1
        }
        bs
      case other => throw new IllegalStateException(
        s"bitmap_distinct: unknown partial format byte $other")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapDistinct =
    copy(child = newChild)
}

object BitmapDistinct {
  /** Hard id-domain cap: 2²⁶ → one buffer ≤ 8 MiB. */
  val MaxId: Long = 1L << 26

  /** Partial wire-format tags (first byte of a serialized buffer). */
  private[functions] val FormatDense: Byte = 0
  private[functions] val FormatSparse: Byte = 1

  /** Unsigned LEB128 varint (7 bits per byte, high bit = continue). */
  private[functions] def writeVarInt(out: java.io.ByteArrayOutputStream,
                                     value: Int): Unit = {
    var v = value
    while ((v & ~0x7f) != 0) {
      out.write((v & 0x7f) | 0x80)
      v >>>= 7
    }
    out.write(v)
  }

  private[functions] def readVarInt(in: java.io.ByteArrayInputStream): Int = {
    var v = 0
    var shift = 0
    var b = in.read()
    while ((b & 0x80) != 0) {
      // EOF reads -1, whose sign bits keep the continue-bit test true —
      // without this check a truncated partial would spin the task
      // forever instead of failing fast like the unknown-format case
      if (b < 0) throw new IllegalStateException(
        "bitmap_distinct: truncated varint in partial (corrupt shuffle bytes)")
      v |= (b & 0x7f) << shift
      shift += 7
      b = in.read()
    }
    v | (b << shift)
  }

  /** Column API: exact distinct over a bounded id domain. */
  def bitmap_distinct(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      BitmapDistinct(org.apache.spark.sql.graft.Bridge.expression(c))
        .toAggregateExpression())
}
