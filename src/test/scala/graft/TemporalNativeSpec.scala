package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of operator (plans/AsOfJoin.scala): row-identity with
  * the composed union+window form, tie/miss semantics on a golden
  * corpus, and the physical shape the operator exists for. */
class TemporalNativeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  import spark.implicits._

  test("asof_join_native == composed asof_join_orders, row for row") {
    val native = queries.Temporal.asofJoinNative(spark, sf).collect()
      .map(_.toString).toSeq
    val composed = queries.Temporal.asofJoinOrders(spark, sf).collect()
      .map(_.toString).toSeq
    assert(native.nonEmpty && native == composed)
  }

  test("native as-of: golden ties, misses, and keyless users") {
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_asof_native_golden").getAbsolutePath
    Seq((100L, 1L, "F", 1.0, "2024-01-01 10:00:00", "1-URGENT"),
        (200L, 1L, "F", 1.0, "2024-01-01 12:00:00", "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "ds", "o_orderpriority")
      .withColumn("o_orderdate", to_timestamp(col("ds"))).drop("ds")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, "2024-01-01 09:00:00", 1L, "view"),   // before any order: drop
        (2L, "2024-01-01 10:00:00", 1L, "view"),   // tie: order AT ts visible
        (3L, "2024-01-01 11:59:00", 1L, "click"),
        (4L, "2024-01-01 12:00:00", 1L, "view"),
        (5L, "2024-01-01 13:00:00", 1L, "view"),
        (6L, "2024-01-01 13:00:00", 2L, "view"))   // user with no orders: drop
      .toDF("event_id", "tss", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = queries.Temporal.asofJoinNative(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("o_orderkey"))
    assert(got.toSeq == Seq(2L -> 100L, 3L -> 100L, 4L -> 200L, 5L -> 200L))
    // empty build side: inner as-of emits nothing
    val edir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_asof_native_empty").getAbsolutePath
    Tables.orders(spark, dir).limit(0)
      .write.mode("overwrite").parquet(s"$edir/orders.parquet")
    Tables.events(spark, dir)
      .write.mode("overwrite").parquet(s"$edir/events.parquet")
    assert(queries.Temporal.asofJoinNative(spark, edir).count() == 0)
  }

  test("forward native as-of: golden next-match, shared head, tie at ts, trailing drop") {
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_asof_fwd_golden").getAbsolutePath
    // orders for user 1 at 09:00, 09:30 (both should share the 10:00
    // event — the PEEK case), 10:00 (tie: event AT the order date
    // matches), 13:00 (after the last event: drops); user 2 has no events
    Seq((100L, 1L, "2024-01-01 09:00:00"),
        (200L, 1L, "2024-01-01 09:30:00"),
        (300L, 1L, "2024-01-01 10:00:00"),
        (400L, 1L, "2024-01-01 13:00:00"),
        (500L, 2L, "2024-01-01 09:00:00"))
      .toDF("o_orderkey", "o_custkey", "ds")
      .withColumn("o_orderdate", to_timestamp(col("ds"))).drop("ds")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, "2024-01-01 10:00:00", 1L, "view"),
        (2L, "2024-01-01 12:00:00", 1L, "click"))
      .toDF("event_id", "tss", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = queries.Temporal.asofJoinNativeFwd(spark, dir).collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[Long]("event_id"))
    assert(got.toSeq == Seq(100L -> 1L, 200L -> 1L, 300L -> 1L))
  }

  test("AsOfJoin.asof rejects ambiguous column names (r8 ADVICE)") {
    val a = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("k", "t")
    // a frame with two attributes literally named "t" (post-join shape)
    val twoT = a.select(col("k"), col("t"), col("t").as("t"))
    val err = intercept[RuntimeException] {
      graft.plans.AsOfJoin.asof(twoT, "k", "t", a.toDF("k2", "t2"), "k2", "t2",
        payloadCols = Seq.empty)
    }
    assert(err.getMessage.contains("ambiguous"), err.getMessage)
  }

  test("native as-of plans: one key exchange per side, local sorts, merge exec") {
    val p = queries.Temporal.asofJoinNative(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"custom exec missing:\n$p")
    assert("Exchange hashpartitioning\\((user_id|uid)#".r
      .findAllIn(p).length == 2, s"want exactly one key exchange per side:\n$p")
    // partition-local sorts only under the operator (global=false)
    assert("Sort \\[(user_id|uid)#\\d+L ASC NULLS FIRST, (ts|o_orderdate)#\\d+ ASC NULLS FIRST\\], false".r
      .findAllIn(p).length == 2, s"want two local (key, time) sorts:\n$p")
  }
}
