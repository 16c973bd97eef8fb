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
    // a TRUNCATED sparse partial must fail fast, not spin the varint
    // loop on EOF's -1 forever (the continue bit is set in -1's sign)
    val truncated = wire.take(wire.length - 1)
    val tErr = intercept[IllegalStateException] { agg.deserialize(truncated) }
    assert(tErr.getMessage.contains("truncated"))
  }

  test("TopKScores: set semantics, order, round-trip, cross-buffer merge") {
    import graft.functions.{TopKScores, TopKScoresBuf}
    val agg = TopKScores(
      org.apache.spark.sql.graft.Bridge.expression(lit(0L)),
      org.apache.spark.sql.graft.Bridge.expression(lit(0L)), 3)
    val b = new TopKScoresBuf(3)
    // duplicates are no-ops; order is (score DESC, vec ASC)
    Seq((5L, 2L), (5L, 2L), (7L, 9L), (5L, 1L), (7L, 9L), (6L, 4L), (1L, 0L))
      .foreach { case (s, v) => b.insert(s, v) }
    assert(b.n == 3)
    assert((0 until b.n).map(i => (b.scores(i), b.vecs(i))) ==
      Seq((7L, 9L), (6L, 4L), (5L, 1L)))
    // serialize round-trip
    val rt = agg.deserialize(agg.serialize(b))
    assert((0 until rt.n).map(i => (rt.scores(i), rt.vecs(i))) ==
      (0 until b.n).map(i => (b.scores(i), b.vecs(i))))
    // merge dedups across buffers and is commutative
    val c = new TopKScoresBuf(3)
    Seq((7L, 9L), (8L, 3L), (5L, 1L)).foreach { case (s, v) => c.insert(s, v) }
    val m1 = agg.merge(agg.deserialize(agg.serialize(b)), c)
    val m2 = agg.merge(agg.deserialize(agg.serialize(c)),
      agg.deserialize(agg.serialize(b)))
    def flat(x: TopKScoresBuf) = (0 until x.n).map(i => (x.scores(i), x.vecs(i)))
    assert(flat(m1) == Seq((8L, 3L), (7L, 9L), (6L, 4L)))
    assert(flat(m1) == flat(m2))
    // end-to-end through a grouped agg with injected duplicates
    import graft.functions.TopKScores.topk_scores
    val df = Seq((1L, 10L, 100L), (1L, 10L, 100L), (1L, 20L, 90L),
      (1L, 30L, 110L), (2L, 40L, 50L))
      .toDF("qid", "vec_id", "score_u")
      .groupBy("qid").agg(topk_scores(col("score_u"), col("vec_id"), 2).as("t"))
      .select(col("qid"), col("t"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getLong(1))))
      .toMap
    assert(df(1L) == Seq((110L, 30L), (100L, 10L)))
    assert(df(2L) == Seq((50L, 40L)))
  }

  test("sorted_intersect_count == size(array_intersect) on sorted-distinct arrays") {
    // the r13 verify-path expression: contract is SORTED-DISTINCT long
    // arrays (exactly how hs / adjacency arrays are built); property-check
    // against the builtin on 200 random such pairs incl. empty/disjoint/
    // identical, driving BOTH the codegen path (DataFrame select) and the
    // interpreted path (eval via a filter on a literal-free projection)
    val rnd = new scala.util.Random(13)
    val cases = Seq(
      (Array.empty[Long], Array.empty[Long]),
      (Array.empty[Long], Array(1L, 5L)),
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L)),
      (Array(1L, 3L, 5L), Array(2L, 4L, 6L))) ++
      (1 to 200).map { _ =>
        def arr() = rnd.shuffle((0L to 200L).toList)
          .take(rnd.nextInt(40)).sorted.toArray
        (arr(), arr())
      }
    val df = cases.toDF("a", "b")
    val got = df.select(
        graft.functions.VectorFunctions.sorted_intersect_count(
          col("a"), col("b")).as("c"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("e"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    // null array → null (BinaryExpression null-intolerance)
    val n = Seq((Some(Array(1L)), Option.empty[Array[Long]])).toDF("a", "b")
      .select(graft.functions.VectorFunctions.sorted_intersect_count(
        col("a"), col("b")))
      .collect()
    assert(n.head.isNullAt(0))
    // SQL registration
    assert(spark.sql(
      "SELECT sorted_intersect_count(array(1L,2L,9L), array(2L,9L)) AS c")
      .as[Long].head() == 2L)
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
