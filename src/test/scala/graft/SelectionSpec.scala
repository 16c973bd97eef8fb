package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The approx-pruned exact selection kernel (operators/Selection.scala)
  * against an in-memory quantile_cont recompute — the kernel's whole
  * contract is that the approx band NEVER changes the answer. */
class SelectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** p·(n−1) linear interpolation — the percentile/quantile_cont rule. */
  private def medCont(xs: Seq[Long], p: Double): Double = {
    val s = xs.sorted
    val pos = p * (s.length - 1)
    val lo = pos.toLong.toInt
    val frac = pos - lo
    if (frac == 0) s(lo).toDouble
    else s(lo) + frac * (s(lo + 1) - s(lo))
  }

  test("quantileCont equals the exact interpolated quantile on varied shapes") {
    // deterministic LCG data: uniform, heavy-duplicate, skewed, negative
    def lcg(seed: Long, n: Int): Seq[Long] = {
      var x = seed
      (1 to n).map { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L; x
      }
    }
    val shapes: Seq[(String, Seq[Long])] = Seq(
      "uniform" -> lcg(42, 5001).map(_ % 1000000),
      "dupes" -> lcg(7, 5000).map(_ % 17),
      "skewed" -> lcg(99, 4999).map(v => (v % 1000) * (v % 1000)),
      "negative" -> lcg(3, 5000).map(_ % 2001 - 1000),
      "tiny" -> Seq(5L, 1L, 9L),
      "pair" -> Seq(2L, 8L),
      "single" -> Seq(4L))
    for ((name, xs) <- shapes; p <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      val df = xs.toDF("x")
      val got = operators.Selection.quantileCont(df, "x", p, xs.length)
      assert(got.contains(medCont(xs, p)), s"$name p=$p")
    }
  }

  test("adversarial all-distinct 4M rows: exact answer, collect bounded by cap") {
    // 4M distinct longs — the shape that priced the built-in percentile
    // at ~10 s (object-boxed count map) and that the r9 band-prefix
    // collect would have pulled ~5-10% of to the driver. The iterative
    // kernel must (a) still be exact, (b) collect at most CollectCap
    // values, (c) actually take >=1 pruning round (fast path, not
    // fallback).
    val n = 4000000L
    val df = spark.range(n).select((col("id") * 1000003L).as("x"))
    for (p <- Seq(0.37, 0.5)) {
      val pos = p * (n - 1)
      val r0 = pos.toLong
      val frac = pos - r0
      val expected = (1 - frac) * (r0 * 1000003L).toDouble +
        frac * ((r0 + 1) * 1000003L).toDouble
      val got = operators.Selection.quantileCont(df, "x", p, n)
      assert(got.contains(expected), s"p=$p")
      assert(operators.Selection.lastCollected > 0 &&
        operators.Selection.lastCollected <= operators.Selection.CollectCap,
        s"collected ${operators.Selection.lastCollected}")
      assert(operators.Selection.lastRounds >= 1,
        s"rounds ${operators.Selection.lastRounds}")
    }
  }

  test("heavy-duplicate band that cannot shrink resolves via constant-band path") {
    // one value carries 99% of the mass around the median: the band
    // stops shrinking at that value, and the kernel must short-circuit
    // (lo == hi) rather than loop to MaxRounds or collect the mass.
    val n = 200000
    val xs = Seq.fill(n - 2)(42L) ++ Seq(1L, 99L)
    val df = xs.toDF("x").repartition(8)
    val got = operators.Selection.quantileCont(df, "x", 0.5, n.toLong)
    assert(got.contains(42.0))
    assert(operators.Selection.lastCollected == -1) // no collect happened
  }

  test("quantileCont: empty input is None; result matches Spark's percentile") {
    assert(operators.Selection.quantileCont(
      Seq.empty[Long].toDF("x"), "x", 0.5, 0).isEmpty)
    val xs = (1L to 9999L).map(v => v * v % 100003)
    val df = xs.toDF("x")
    val builtin = df.agg(expr("percentile(x, 0.3D)")).head().getDouble(0)
    assert(operators.Selection.quantileCont(df, "x", 0.3, xs.length)
      .contains(builtin))
  }
}
