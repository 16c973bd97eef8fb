package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Native AS-OF JOIN: the whole-operator extension point (custom
  * LogicalPlan + planner Strategy + physical SparkPlan, registered through
  * SparkSessionExtensions — the heaviest of the extension tiers, used
  * because Spark has no as-of join operator at all; the composed
  * union+window form ([[graft.queries.Temporal.asofJoinOrders]]) stays as
  * the portable baseline and supplies the oracle).
  *
  * Semantics (inner, backward-looking): for each left row, the single
  * right row with the same key and the greatest right-time ≤ left-time;
  * left rows with no such row are dropped. Ties at equal time take the
  * LAST right row in (key, time) order, so callers pre-dedup the right
  * side to one row per (key, time) — identical to DuckDB ASOF JOIN's
  * contract on a tie-broken build side.
  *
  * Physical shape — exactly what a purpose-built engine would run:
  *   - requiredChildDistribution clusters BOTH sides on the key, so
  *     EnsureRequirements co-partitions them with one exchange each (or
  *     zero, if an upstream shuffle already keyed them);
  *   - requiredChildOrdering asks each side for (key, time) ASC order;
  *     Spark plans partition-local sorts — no global sort anywhere;
  *   - doExecute is a zipPartitions single-pass streaming merge holding
  *     O(1) state per partition (ONE buffered right row) — never the
  *     pair blow-up of a range-join (every qualifying right row per left
  *     row) and never the two-sided materialization of the union+window
  *     form. Cost: one scan of each sorted side.
  *
  * At 100 TB both sides shuffle once on the key and stream. Key skew is
  * NOT AQE's to fix here: OptimizeSkewedJoin only rewrites
  * SortMergeJoin/ShuffledHashJoin and never splits partitions feeding a
  * custom BinaryExecNode — so for skewed keys the salted decomposition
  * ([[graft.queries.Temporal.asofJoinOrdersSalted]]), whose range-split
  * trick composes with any as-of implementation, IS the skew path;
  * this node is the uniform-key fast path. */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    payload: Seq[Attribute],
    forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payload
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: [[AsOfJoinPlan]] → [[AsOfJoinExec]]. Injected by
  * [[graft.functions.GraftExtensions]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt, p, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, p, fwd) :: Nil
    case _ => Nil
  }
}

/** `forward = false`: latest right row at-or-before each left time
  * (backward as-of, the default everywhere). `forward = true`: EARLIEST
  * right row at-or-after each left time — the "next event" lookup
  * (order → next shipment, click → next purchase). Same single-pass
  * streaming merge either way: backward retains ONE consumed row;
  * forward PEEKS the buffered head without consuming (sorted left times
  * mean a right row behind the current left time can never match a
  * later left, so discarding is safe, and the head may match many
  * consecutive lefts). Both are inner joins: unmatched lefts drop. */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    payload: Seq[Attribute],
    forward: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lki = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lti = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rki = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rti = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(lki >= 0 && lti >= 0 && rki >= 0 && rti >= 0,
      "as-of key/time attributes must come from the join children")
    val outAttrs = output
    val inAttrs = left.output ++ right.output
    val fwd = forward
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val project = UnsafeProjection.create(outAttrs, inAttrs)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // O(1) merge state (backward only): the latest right row at or
      // before the current left row's time, for the key it belongs to
      var curKey = 0L
      var curRow: InternalRow = null
      lIter.flatMap { l =>
        if (l.isNullAt(lki) || l.isNullAt(lti)) Iterator.empty
        else {
          val lk = l.getLong(lki)
          val lt = l.getLong(lti)
          var advance = true
          while (advance && rBuf.hasNext) {
            val h = rBuf.head
            // null key/time rows sort first (NULLS FIRST): consume and
            // drop — they are never a valid as-of point
            if (h.isNullAt(rki) || h.isNullAt(rti)) { rBuf.next() }
            else {
              val hk = h.getLong(rki)
              if (fwd) {
                // discard rows strictly behind (key, time): sorted left
                // times mean they can never match a later left either
                if (hk < lk || (hk == lk && h.getLong(rti) < lt)) rBuf.next()
                else advance = false
              } else if (hk < lk || (hk == lk && h.getLong(rti) <= lt)) {
                val r = rBuf.next()
                curKey = hk
                curRow = r.copy()
              } else advance = false
            }
          }
          if (fwd) {
            // PEEK, never consume: the head (first row at/after lt for
            // some key) may be the forward match of many lefts; it stays
            // pinned in the buffer (no underlying next() call) until a
            // later left advances past it
            if (rBuf.hasNext && !rBuf.head.isNullAt(rki) &&
                rBuf.head.getLong(rki) == lk) {
              joined(l, rBuf.head)
              Iterator.single(project(joined))
            } else Iterator.empty
          } else if (curRow != null && curKey == lk) {
            joined(l, curRow)
            Iterator.single(project(joined))
          } else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API over [[AsOfJoinPlan]]. */
object AsOfJoin {
  /** Inner backward as-of join of `left` against `right` on
    * `key`, carrying `payloadCols` from the matched right row. Key must
    * be BIGINT; times must be timestamp/timestamp_ntz (micros-ordered).
    * Callers project each side to the columns they need first (explicit
    * pruning — the optimizer does not see through a custom node). */
  def asof(left: DataFrame, leftKey: String, leftTime: String,
           right: DataFrame, rightKey: String, rightTime: String,
           payloadCols: Seq[String], forward: Boolean = false): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, side: String): Attribute = {
      val matches = p.output.filter(_.name == n)
      // mirror Spark's ambiguous-reference behavior: a post-join frame
      // with duplicate names must fail loudly, not bind the first match
      if (matches.length > 1)
        sys.error(s"as-of $side column '$n' is ambiguous: " +
          s"${matches.length} attributes share the name in ${p.output.map(_.name)}")
      matches.headOption.getOrElse(
        sys.error(s"as-of $side column '$n' not in ${p.output.map(_.name)}"))
    }
    val (lk, lt) = (attr(lPlan, leftKey, "left"), attr(lPlan, leftTime, "left"))
    val (rk, rt) = (attr(rPlan, rightKey, "right"), attr(rPlan, rightTime, "right"))
    require(lk.dataType == LongType && rk.dataType == LongType,
      s"as-of keys must be bigint, got ${lk.dataType}/${rk.dataType}")
    def timeOk(a: Attribute) =
      a.dataType == TimestampType || a.dataType == TimestampNTZType
    require(timeOk(lt) && timeOk(rt),
      s"as-of times must be timestamps, got ${lt.dataType}/${rt.dataType}")
    val pay = payloadCols.map(attr(rPlan, _, "payload"))
    org.apache.spark.sql.graft.Bridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lPlan, rPlan, lk, lt, rk, rt, pay, forward))
  }
}
