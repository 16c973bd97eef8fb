package graft.queries

import org.apache.spark.sql.{DataFrame, Row}

/** The occupancy guard for driver-collected VALUE histograms.
  *
  * Several queries fold a corpus to a histogram keyed by a quantised
  * value — cents, $100 buckets, day counts, equi-width bins — and walk
  * it on the driver (rank selection, prefix-sum score maps). That is
  * sound model state ONLY because the key is bounded by the VALUE
  * RANGE, not the row count: 2-dp money spans ~10^5 cells, a corpus
  * time span ~10^4 days. The bound is a data property, though, not a
  * plan property — point the same query at a wide-range double column
  * (nanosecond latencies, unquantised floats) and the "histogram"
  * silently becomes the corpus riding a collect. Every such site must
  * collect through [[bounded]], which hard-fails past [[MaxCells]]
  * instead of OOMing the driver — the failure message names the
  * sketch fallback (equi-width [[Temporal.eventsValueQuantiles]]-style
  * binning, whose cell count is fixed by construction) so the operator
  * split is self-announcing, the containment-sketch discipline.
  *
  * 100 TB story: the guarded collect is over a POST-aggregation frame
  * (the groupBy(key) count already combined map-side), so the transfer
  * is ≤ MaxCells+1 narrow rows regardless of corpus size; the guard
  * caps driver memory at ~32 MB of rows. */
private[graft] object Hist {

  /** Hard cap on collected histogram cells. 2-dp money histograms are
    * ~10^5 cells and per-type variants a few ×10^5 — an order of
    * magnitude of headroom below the cap, while a raw unquantised
    * column blows past it immediately. */
  val MaxCells: Int = 1 << 20

  /** Collect `hist` (a small post-agg frame) with the occupancy guard.
    * `what` names the calling query in the failure message. The
    * limit(MaxCells+1) bounds the transfer BEFORE the check, so even
    * the failing case never ships more than cap+1 rows. */
  def bounded(hist: DataFrame, what: String,
              maxCells: Int = MaxCells): Array[Row] = {
    val rows = hist.limit(maxCells + 1).collect()
    require(rows.length <= maxCells,
      s"$what: value histogram exceeds $maxCells cells — the key column's " +
        "range is too wide for the driver-walk path (it would scale with " +
        "row count, not value range). Quantise the key coarser, or use the " +
        "fixed-width sketch shape (eventsValueQuantiles' equi-width bins).")
    rows
  }
}
