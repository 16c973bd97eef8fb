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
