package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the scale properties claimed in the
  * scaladocs, asserted against the actual physical plans so a future
  * refactor can't silently trade them away. */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("pricing_summary: shipdate filter and column pruning reach the scan") {
    val p = plan("pricing_summary")
    assert(p.contains("PushedFilters") && p.contains("LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_orderkey"), "reads pruned columns only")
  }

  test("regional_revenue: dimension joins broadcast; year filter pushed as range") {
    val p = plan("regional_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), "year rewrite active")
  }

  test("top_parts_revenue: top-k plans as TakeOrderedAndProject, not global sort") {
    val p = plan("top_parts_revenue")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("semi/anti joins plan as Semi/Anti, with the selective filter pushed") {
    assert(plan("semi_join_heavy").contains("LeftSemi"))
    assert(plan("semi_join_heavy").contains("GreaterThan(l_quantity,45.0)"))
    assert(plan("anti_join_idle").contains("LeftAnti"))
  }

  test("window queries partition by key (no single-partition global window)") {
    // a Window with an empty partition spec would show 'Window [..] []'
    // after an Exchange SinglePartition — assert the partition column is in
    // the window spec instead
    val p = plan("window_top_orders")
    assert(p.contains("Window") && !p.contains("SinglePartition"),
      s"window funnels to one partition:\n$p")
  }

  test("wordcount aggregates partially before the shuffle (partial_count)") {
    assert(plan("wordcount").contains("partial_count"))
  }

  test("multikey grouping sets expand once (single Expand, single shuffle pair)") {
    val p = plan("multikey_counts")
    assert("Expand".r.findAllIn(p).length == 1)
  }
}
