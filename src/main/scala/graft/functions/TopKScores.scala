package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer with SET semantics: up to k (score, vec) pairs
  * held in two primitive long arrays, ordered (score DESC, vec ASC);
  * exact duplicates are no-ops. Insert/merge are O(k) — k is small (the
  * kNN family's 3..10), so a shift-insert beats any heap. */
final class TopKScoresBuf(val k: Int) extends Serializable {
  val scores = new Array[Long](k)
  val vecs = new Array[Long](k)
  var n = 0

  def insert(s: Long, v: Long): Unit = {
    var i = 0
    while (i < n && (scores(i) > s || (scores(i) == s && vecs(i) < v))) i += 1
    if (i >= k) return
    if (i < n && scores(i) == s && vecs(i) == v) return // exact duplicate
    var j = math.min(n, k - 1)
    while (j > i) { scores(j) = scores(j - 1); vecs(j) = vecs(j - 1); j -= 1 }
    scores(i) = s; vecs(i) = v
    if (n < k) n += 1
  }
}

/** Per-group top-k of (score, vec) pairs as a native Catalyst
  * `TypedImperativeAggregate` — the high-volume twin of the typed
  * `Aggregator` it replaced in the kNN edge build. The Dataset
  * `groupByKey(...).agg(Aggregator)` path decodes every input row to a
  * Scala tuple and round-trips the List buffer through an
  * ExpressionEncoder; at bucket-join pair volumes that object churn WAS
  * the dominant edge-build stage (r12 stage probe). This aggregate
  * evals two child expressions per InternalRow and keeps two primitive
  * long arrays — no per-row boxing, partials are 16·k+4 bytes.
  *
  * SET semantics (exact duplicates are no-ops) — which is what lets the
  * raw bucket self-join stream feed it directly: a pair colliding in c
  * LSH tables arrives c times with the identical pure-function score,
  * and the dedup happens in the O(k) buffer instead of a
  * pair-cardinality DISTINCT exchange. Merge inserts element-wise —
  * associative and commutative, so the result is partitioning-
  * independent (hash-gateable). Ordering (score DESC, vec ASC) is
  * total; the emitted array is exactly row_number's prefix. Null
  * scores/vecs are skipped (SQL aggregate convention). */
case class TopKScores(
    scoreExpr: Expression,
    vecExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKScoresBuf] {

  override def children: Seq[Expression] = Seq(scoreExpr, vecExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType == LongType && vecExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_scores expects (bigint, bigint), got " +
        s"(${scoreExpr.dataType.simpleString}, ${vecExpr.dataType.simpleString})")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score_u", LongType, nullable = false),
    StructField("vec_id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_scores"

  override def createAggregationBuffer(): TopKScoresBuf = new TopKScoresBuf(k)

  override def update(buffer: TopKScoresBuf, input: InternalRow): TopKScoresBuf = {
    val s = scoreExpr.eval(input)
    val v = vecExpr.eval(input)
    if (s != null && v != null)
      buffer.insert(s.asInstanceOf[Long], v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKScoresBuf, other: TopKScoresBuf): TopKScoresBuf = {
    var i = 0
    while (i < other.n) { buffer.insert(other.scores(i), other.vecs(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKScoresBuf): Any = {
    val out = new Array[Any](buffer.n)
    var i = 0
    while (i < buffer.n) {
      out(i) = InternalRow(buffer.scores(i), buffer.vecs(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: TopKScoresBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buffer.n)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) {
      bb.putLong(buffer.scores(i)); bb.putLong(buffer.vecs(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): TopKScoresBuf = {
    val bb = java.nio.ByteBuffer.wrap(storageFormat)
    val n = bb.getInt
    val buf = new TopKScoresBuf(k)
    buf.n = n
    var i = 0
    while (i < n) { buf.scores(i) = bb.getLong; buf.vecs(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKScores =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKScores =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKScores =
    copy(scoreExpr = newChildren(0), vecExpr = newChildren(1))
}

object TopKScores {
  /** Column API: per-group top-k (score DESC, vec ASC), set semantics. */
  def topk_scores(score: Column, vec: Column, k: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      TopKScores(
        org.apache.spark.sql.graft.Bridge.expression(score),
        org.apache.spark.sql.graft.Bridge.expression(vec),
        k).toAggregateExpression())
}
