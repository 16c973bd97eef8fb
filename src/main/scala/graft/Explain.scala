package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection + cold/warm timing for one registered query.
  * Usage: tools/run.sh graft.Explain <query> [sfDir] [mode]  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "formatted"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).explain(mode)
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"run $round: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
