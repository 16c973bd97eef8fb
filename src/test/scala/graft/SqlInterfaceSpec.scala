package graft

import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql surface: fixture views + the registered custom function
  * behave like the DataFrame formulations. */
class SqlInterfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("registerViews exposes every fixture table to SQL") {
    Tables.registerViews(spark, TestSpark.sf)
    Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT count(*) FROM $n").head().getLong(0) > 0, n)
    }
  }

  test("a full query runs through pure SQL and matches the DataFrame twin") {
    Tables.registerViews(spark, TestSpark.sf)
    val sqlResult = spark.sql(
      """SELECT l_returnflag, count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE year(o_orderdate) = 1998
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect().map(_.toString).toSeq
    import org.apache.spark.sql.functions._
    val dfResult = Tables.lineitem(spark, TestSpark.sf)
      .join(Tables.orders(spark, TestSpark.sf),
        col("l_orderkey") === col("o_orderkey"))
      .filter(year(col("o_orderdate")) === 1998)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag")
      .collect().map(_.toString).toSeq
    assert(sqlResult == dfResult && sqlResult.nonEmpty)
  }

  test("sql_above_avg_orders decorrelates — no nested-loop join in the plan") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val df = queries.Relational.sqlAboveAvgOrders(spark, TestSpark.sf)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val bad = plan.collect {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }
    assert(bad.isEmpty, s"correlated subquery did not decorrelate:\n${plan.toString.take(1500)}")
    // every customer with >1 distinct price has at least one above-average
    // order; count sanity against the distinct customer base
    val n = df.count()
    val customers = Tables.orders(spark, TestSpark.sf)
      .select("o_custkey").distinct().count()
    assert(n > 0 && n <= customers)
  }

  test("array_dot works over SQL views (extension function end-to-end)") {
    Tables.registerViews(spark, TestSpark.sf)
    val n = spark.sql(
      """SELECT vec_id,
        |       array_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                 CAST(embedding AS ARRAY<DOUBLE>)) AS sq_norm
        |FROM embeddings WHERE vec_id < 5""".stripMargin).collect()
    assert(n.length == 5 && n.forall(_.getDouble(1) > 0))
  }
}
