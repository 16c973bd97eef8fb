package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions.array_dot

class VectorExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("array_dot computes the dot product (Column API)") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
    assert(df.select(array_dot(col("a"), col("b"))).as[Double].head() == 32.0)
  }

  test("array_dot matches the interpreted fold bit-for-bit on fixture vectors") {
    val e = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val viaExpr = e.select(col("vec_id"), array_dot(col("v"), col("v")).as("d"))
      .as[(Long, Double)].collect().toMap
    val viaFold = e.select(col("vec_id"),
        aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("d"))
      .as[(Long, Double)].collect().toMap
    assert(viaExpr == viaFold)  // exact double equality — same fold order
  }

  test("array_dot is registered for SQL via GraftExtensions") {
    val out = spark.sql(
      "SELECT array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(out == 11.0)
  }

  test("SQL registration enforces arity (WRONG_NUM_ARGS, not silent drop)") {
    // bitmap_distinct(a, b) must FAIL analysis — before the arity gate it
    // silently ignored the second argument (wrong-answer shape); zero
    // args surfaced as a raw NoSuchElementException.
    val twoArgs = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT bitmap_distinct(id, id) FROM range(5)").collect()
    }
    assert(twoArgs.getMessage.contains("bitmap_distinct"))
    assert(twoArgs.getCondition != null &&
      twoArgs.getCondition.startsWith("WRONG_NUM_ARGS"))
    val zeroArgs = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT bitmap_distinct() FROM range(5)").collect()
    }
    assert(zeroArgs.getMessage.contains("bitmap_distinct"))
    val dotOne = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT array_dot(array(1.0D))").collect()
    }
    assert(dotOne.getMessage.contains("array_dot"))
  }

  test("array_dot rejects wrong input types at analysis") {
    val err = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").select(array_dot(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.contains("array_dot") || err.getMessage.contains("DATATYPE"))
  }

  test("null array input yields null, null-free path stays codegen'd") {
    val df = Seq((Some(Array(1.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    val r = df.select(array_dot(col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("bitmap_distinct == count(DISTINCT) per group across many partitions") {
    import graft.functions.BitmapDistinct.bitmap_distinct
    // 40 partitions force partial-buffer serialization + OR-merge
    val df = spark.range(0, 100000, 1, 40)
      .select((col("id") % 7).as("g"), (col("id") % 997).as("uid"))
    val bm = df.groupBy("g").agg(bitmap_distinct(col("uid")).as("n"))
      .as[(Long, Long)].collect().toMap
    val cd = df.groupBy("g").agg(countDistinct(col("uid")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(bm == cd && bm.values.forall(_ > 0))
  }

  test("bitmap_distinct is registered for SQL and skips nulls") {
    val out = spark.sql(
      "SELECT bitmap_distinct(x) AS n FROM VALUES (1L), (2L), (2L), (CAST(NULL AS LONG)) AS t(x)")
      .as[Long].head()
    assert(out == 2L)
  }

  test("bitmap_distinct fails self-announcingly outside the bounded domain") {
    import graft.functions.BitmapDistinct.bitmap_distinct
    val err = intercept[Exception] {
      Seq(1L << 30).toDF("x").agg(bitmap_distinct(col("x"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(m => m.contains("bitmap_distinct") && m.contains("outside")))
  }

  test("bitmap partials: sparse/dense round-trip, cross-encoding merge, wire-size win") {
    import graft.functions.BitmapDistinct
    val agg = BitmapDistinct(org.apache.spark.sql.graft.Bridge.expression(lit(0L)))
    def roundTrip(ids: Seq[Int]): java.util.BitSet = {
      val bs = new java.util.BitSet()
      ids.foreach(bs.set)
      agg.deserialize(agg.serialize(bs))
    }
    // sparse path: few ids across the full 2^26 domain, incl. both edges
    val sparseIds = Seq(0, 1, 63, 64, 8191, 1 << 20, (1 << 26) - 1)
    assert(roundTrip(sparseIds) == {
      val e = new java.util.BitSet(); sparseIds.foreach(e.set); e
    })
    // dense path: a solid run (sparse encoding would be larger)
    val denseIds = 0 until 4096
    assert(roundTrip(denseIds) == {
      val e = new java.util.BitSet(); denseIds.foreach(e.set); e
    })
    // empty buffer survives (all-null partition partial)
    assert(roundTrip(Nil).cardinality() == 0)
    // merge across encodings is still a word-wise OR after decode
    val a = new java.util.BitSet(); sparseIds.foreach(a.set)
    val b = new java.util.BitSet(); denseIds.foreach(b.set)
    val merged = agg.merge(
      agg.deserialize(agg.serialize(a)), agg.deserialize(agg.serialize(b)))
    assert(merged.cardinality() == (sparseIds ++ denseIds).distinct.size)
    // the volume lever: a 7-id partial at the top of the 2^26 domain is
    // a handful of bytes, not the ~8 MiB dense image
    val hi = new java.util.BitSet(); hi.set((1 << 26) - 1); hi.set(5)
    val wire = agg.serialize(hi)
    assert(wire.length < 32, s"sparse partial is ${wire.length}B")
    assert(hi.toByteArray.length > 8000000, "dense image really is ~8 MiB")
    assert(agg.deserialize(wire) == hi)
    // a buffer where dense wins still round-trips through the dense tag
    val full = new java.util.BitSet(); (0 until 100000).foreach(full.set)
    val denseWire = agg.serialize(full)
    assert(denseWire.length <= 100000 / 8 + 16)
    assert(agg.deserialize(denseWire) == full)
  }

  test("bitmap_distinct matches the oracle shape on the events fixture") {
    val rows = queries.Temporal.eventsUserBitmapDaily(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val exact = Tables.eventsTs(spark, TestSpark.sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") ==
        exact(r.getAs[java.sql.Date]("day").toString))
    }
  }
}
