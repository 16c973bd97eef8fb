package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The year-predicate rewrite must (a) preserve semantics and (b) actually
  * reach the parquet scan as a pushed range filter. */
class YearRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("year(ts) = N is pushed to the scan as a range") {
    val df = Tables.orders(spark, sf).filter(year(col("o_orderdate")) === 1998)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("GreaterThanOrEqual(o_orderdate") ||
        plan.contains("GreaterThanOrEqual(O_ORDERDATE")),
      s"range not pushed:\n$plan")
  }

  test("rewrite preserves semantics vs un-rewritten evaluation") {
    // month(+)year compound stays un-rewritten for month; compare counts
    // against a formulation the rule does not touch
    val rewritten = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) === 1998).count()
    val manual = Tables.orders(spark, sf)
      .filter(date_format(col("o_orderdate"), "yyyy") === "1998").count()
    assert(rewritten == manual && rewritten > 0)
  }

  test("literal-on-left and non-year predicates unaffected") {
    val n1 = Tables.orders(spark, sf).filter(lit(1998) === year(col("o_orderdate"))).count()
    val n2 = Tables.orders(spark, sf).filter(year(col("o_orderdate")) === 1998).count()
    assert(n1 == n2)
    // sanity: a different-year filter returns a different (smaller) set
    val other = Tables.orders(spark, sf).filter(year(col("o_orderdate")) === 1900).count()
    assert(other == 0)
  }
}
