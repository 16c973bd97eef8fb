package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Source/sink matrix beyond the reference's text-only I/O: CSV, JSON
  * lines, and partitioned parquet round-trips with explicit schemas —
  * plus partition pruning visible in the plan for the partitioned write. */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scratch(name: String): String = {
    val p = Paths.get("target", "test-scratch", name)
    Files.createDirectories(p.getParent)
    p.toString
  }

  private lazy val events = Tables.eventsTs(spark, TestSpark.sf)
    .select("event_id", "user_id", "event_type", "value")

  test("CSV round-trip with explicit schema") {
    val dir = scratch("events-csv")
    events.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.count() == events.count())
    assert(back.orderBy("event_id").collect().toSeq ==
      events.orderBy("event_id").collect().toSeq)
  }

  test("JSON-lines round-trip preserves values") {
    val dir = scratch("events-json")
    events.write.mode("overwrite").json(dir)
    val back = spark.read.schema(events.schema).json(dir)
    assert(back.orderBy("event_id").collect().toSeq ==
      events.orderBy("event_id").collect().toSeq)
  }

  test("partitioned parquet write enables partition pruning") {
    val dir = scratch("orders-part")
    Tables.orders(spark, TestSpark.sf)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("o_year") === 1998)
    // plan must show partition filters, not a data filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_year"))
    val expected = Tables.orders(spark, TestSpark.sf)
      .filter(year(col("o_orderdate")) === 1998).count()
    assert(pruned.count() == expected)
  }
}
