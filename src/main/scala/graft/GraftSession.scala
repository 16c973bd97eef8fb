package graft

import org.apache.spark.sql.SparkSession

/** Shared session tuning for every entry point (Verify, Bench, tests).
  *
  * - AQE on: runtime shuffle-partition coalescing + skew-join splitting —
  *   the local stand-in for what matters on a 1000-executor cluster.
  * - Speculation parity with the reference's straggler detection
  *   (coordinator/server.py:74-75: 1.5× median, 0.25 quantile, 5s interval)
  *   — Spark's three configs map 1:1 (SURVEY.md §2.3 R1). Local mode
  *   ignores speculation, but the conf documents cluster intent.
  * - nanosAsLong: the `events` fixture stores ts as parquet
  *   TIMESTAMP(NANOS), which Spark 4 otherwise refuses to read
  *   (PARQUET_TYPE_ILLEGAL); we read it as Long and convert via
  *   [[Tables.eventsTs]].
  */
object GraftSession {
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Whole-stage-codegen compiled-class cache (static conf; default
      // 100 entries). The 269-query registry compiles ~8 codegen units
      // per query, so at the default size every unit is LRU-evicted
      // before its query runs again — each bench pass re-pays Janino
      // compilation (~0.25 s/query, FloorProbe r14) that a long-lived
      // production driver pays once. Sized to hold the whole suite;
      // entries are compiled classes (JVM code, never data), so this
      // cannot cache results across runs.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.speculation", "true")
      .config("spark.speculation.multiplier", "1.5")
      .config("spark.speculation.quantile", "0.25")
      .config("spark.speculation.interval", "5s")
      .config("spark.ui.enabled", "false")

  /** Local session for tests / ad-hoc mains. */
  def local(cpus: Int = Runtime.getRuntime.availableProcessors.min(32)): SparkSession = {
    val s = configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
