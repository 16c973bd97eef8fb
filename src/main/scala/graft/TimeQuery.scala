package graft

import org.apache.spark.sql.SparkSession

/** Bench-faithful timing for a few queries: same protocol as
  * [[Bench]] (untimed warmup, `spark.catalog.clearCache()` before every
  * run, noop sink, per-query min across passes) so numbers here are
  * directly comparable to BENCH entries — [[Explain]]'s count() loop
  * is NOT (no cache clearing, so per-run caches accumulate and GC noise
  * lands on later runs; count() also lets Catalyst prune the plan).
  *
  * Usage: tools/run.sh graft.TimeQuery <sfDir> <passes> <query...>
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    Seq("lineitem", "orders", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }
    val times = (1 to passes).map { p =>
      names.map { name =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"pass $p $name%-28s $s%8.3f s")
        name -> s
      }
    }
    names.foreach { n =>
      val best = times.map(_.toMap.apply(n)).min
      println(f"MIN   $n%-28s $best%8.3f s")
    }
    spark.stop()
  }
}
