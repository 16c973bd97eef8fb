package graft

import org.apache.spark.sql.SparkSession

/** Plan-hygiene sweep: for every registered query, count parquet scans
  * per table and exchanges in the physical plan — the quick way to spot
  * a missing cache (same table scanned N times) or a shuffle regression
  * without reading 60 plans by hand.
  * Usage: tools/run.sh graft.Audit [sfDir]  */
object Audit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.Exchange
    val tableRe = raw".*/(\w+)\.parquet.*".r
    println(f"${"query"}%-24s scans cache exch  per-table (file scans only)")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        spark.catalog.clearCache()
        // AQE wraps the tree in an opaque AdaptiveSparkPlanExec — walk its
        // initial plan (post-EnsureRequirements, so exchanges are visible;
        // collect() does not descend into the adaptive node)
        val plan = fn(spark, sfDir).queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.initialPlan
          case p => p
        }
        val scans = plan.collect { case s: FileSourceScanExec =>
          s.relation.location.rootPaths.headOption.map(_.toString) match {
            case Some(tableRe(t)) => t
            case _ => "?"
          }
        }
        val cached = plan.collect { case c: InMemoryTableScanExec => c }.length
        val exch = plan.collect { case e: Exchange => e }.length
        val byTable = scans.groupBy(identity).view.mapValues(_.size)
          .toSeq.sortBy(-_._2).map { case (t, n) => s"$t:$n" }.mkString(" ")
        println(f"$name%-24s ${scans.size}%5d $cached%5d $exch%4d  $byTable")
      } catch {
        case e: Throwable => println(f"$name%-24s FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
