package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Write-time co-located join: bucket BOTH fact tables by the join key at
  * write time (`bucketBy` + `sortBy`), so every later join on that key
  * runs with NO Exchange — the shuffle the reference's architecture pays
  * on every single job (mapper output → hash partition → reducer fetch,
  * worker/worker.py map→reduce barrier) is amortized once into the
  * storage layout.
  *
  * This is the single highest-leverage layout decision at 100 TB: a
  * fact-fact join (orders ⋈ lineitem) over bucketed tables reads
  * co-numbered buckets pairwise — zero network movement of either table —
  * where the unbucketed plan shuffles both sides in full. The demo query
  * registers the whole round trip (bucketed write → catalog read → join →
  * agg) in the driver's oracle gate; value-identity with the plain join
  * is the oracle, the no-Exchange plan shape is asserted in
  * BucketingSpec.
  *
  * Table names are keyed by (sfDir, applicationId) — the write happens
  * eagerly at DataFrame-construction time (same pattern as the TSV/CSV
  * sink round-trips), so concurrent sessions must not collide on one
  * catalog entry; within a session the write runs ONCE per sfDir
  * ([[bucketedTables]]) and later constructions reuse the catalog
  * tables. */
object BucketedJoin {

  private val Buckets = 16

  private def tableTag(spark: SparkSession, sfDir: String): String = {
    val sf = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val app = spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9_]", "_")
    s"${sf}_$app"
  }

  /** One bucketed write per (sfDir, session) — the materialize-once move
    * ([[graft.queries.Dedup]]'s cluster sinks): the write-time `bucketBy`
    * IS the operator's point, but re-materializing identical tables on
    * every construction (Verify, each bench pass, the PlanShapeSpec
    * sweep) proves nothing after the first — corpus dirs are immutable
    * for a session. computeIfAbsent publishes atomically: concurrent
    * constructors of the same (sfDir, app) block until the writer
    * finishes; a failed write leaves no mapping, so a later call
    * retries. */
  private val bucketedTables =
    new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  /** Per-orderstatus line stats through the bucketed orders⋈lineitem
    * join. Money integerised to cents before the sum (exact,
    * order-independent — see Relational's determinism discipline). */
  def bucketedJoinOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val tag = tableTag(spark, sfDir)
    val liTable = s"li_bkt_$tag"
    val ordTable = s"ord_bkt_$tag"
    bucketedTables.computeIfAbsent(tag, _ => {
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"),
          round(col("l_extendedprice") * 100).cast("long").as("price_c"))
        .write.mode("overwrite")
        .bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(liTable)
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderstatus"))
        .write.mode("overwrite")
        .bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ordTable)
      true
    })
    spark.table(liTable)
      .join(spark.table(ordTable), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_items"),
        (sum("price_c").cast("double") / 100).as("revenue"))
      .orderBy("o_orderstatus")
  }

  val bucketedJoinOrdersSql: String =
    """SELECT o_orderstatus, count(*) AS n_items,
      |       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100 AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bucketed_join_orders" -> ((s, d) => bucketedJoinOrders(s, d)))
  val oracles: Map[String, String] = Map(
    "bucketed_join_orders" -> bucketedJoinOrdersSql)
}
