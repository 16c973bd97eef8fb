package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed EXACT order statistics without a global sort and without
  * the built-in `percentile` aggregate (whose object-boxed count map
  * prices an all-distinct multi-million-sample input at ~10 s — the
  * measured `revenue_trend_theilsen` incident, PERF.md).
  *
  * Strategy: `approxQuantile` picks a PRUNING band around the target —
  * its error only affects how much survives pruning, never the answer,
  * because the rank arithmetic below is exact — then one exact count
  * locates the band's global offset and a TakeOrdered of the band
  * materializes just the values up to the target rank (a few percent of
  * the input for a median). A band that misses the ranks falls back to
  * the slow-but-sure aggregate, so the result is ALWAYS the same
  * p·(n−1) linear interpolation `percentile` (Spark) and
  * `quantile_cont` (DuckDB) compute on the identical values.
  *
  * 100 TB story: three scan-shaped passes (approx sketch, filter-count,
  * TakeOrdered) over the input — each fully distributed, partial-agg /
  * bounded-heap shaped — plus a driver collect of the sub-rank band
  * slice (model state, ~p·err·n values). No SinglePartition sort of
  * the data ever happens on the fast path. */
object Selection {

  /** Exact interpolated quantile of a long column. `n` is the exact
    * row count (callers usually already have it; pass `df.count()`
    * otherwise). Returns None iff n == 0. */
  def quantileCont(df: DataFrame, c: String, p: Double,
                   n: Long): Option[Double] = {
    require(p >= 0 && p <= 1, s"need 0 <= p <= 1, got $p")
    if (n == 0) return None
    val pos = p * (n - 1)
    val r0 = pos.toLong
    val frac = pos - r0
    val margin = 0.05
    val band = df.stat.approxQuantile(c,
      Array(math.max(0, p - margin), math.min(1, p + margin)), 0.01)
    lazy val fallback =
      Some(df.agg(expr(s"percentile($c, CAST($p AS DOUBLE))"))
        .head().getDouble(0))
    if (band.length < 2) return fallback
    val (lo, hi) = (band(0), band(1))
    val nBelow = df.filter(col(c) < lo).count()
    val inBand = df.filter(col(c) >= lo && col(c) <= hi)
    val nBand = inBand.count()
    // values needed at indices r0 and (when interpolating) r0+1; both
    // must land inside [nBelow, nBelow + nBand)
    val lastIdx = if (frac > 0) r0 + 1 else r0
    if (nBelow > r0 || nBelow + nBand <= lastIdx) return fallback
    val local = inBand.orderBy(col(c).asc)
      .limit((lastIdx - nBelow + 1).toInt)
      .collect().map(_.getLong(0))
    val v0 = local((r0 - nBelow).toInt).toDouble
    val v1 = local((lastIdx - nBelow).toInt).toDouble
    Some(v0 + frac * (v1 - v0))
  }
}
