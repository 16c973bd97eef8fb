package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic arithmetic helpers.
  *
  * `round()` is NOT portable between Spark and DuckDB: Spark rounds the
  * shortest-decimal representation HALF_UP, DuckDB rounds the binary value
  * — at representation boundaries they disagree by one ulp of the target
  * scale (observed: 3/500 rows of a 4-dp quality score off by exactly
  * 1e-4). floor(x·10ⁿ + 0.5)/10ⁿ is pure IEEE double math: identical
  * inputs → identical outputs on every engine.
  */
object Det {
  def r(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    floor(c * p + 0.5).cast("double") / p
  }
  def rSql(x: String, scale: Int): String = {
    val p = math.pow(10, scale).toLong
    s"CAST(floor(($x) * $p + 0.5) AS DOUBLE) / $p"
  }
}
