package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe for the table_profile family (r13 optimization round):
  * times plan variants of the same profile computation to locate the
  * dominant cost (Expand SortAggregate from string min/max buffers vs
  * scan count). Not registered; numbers land in OPTIMIZATION_r13.md. */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    o.count()
    def time(label: String)(df: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-40s min ${ts.min}%7.3f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    val numCols = Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val strCols = Seq("o_orderstatus", "o_orderpriority")
    val all = numCols ++ strCols
    // v1: everything in one Expand agg (current tableProfile shape)
    time("v1 expand all (distinct+minmax str)") {
      o.agg(count(lit(1)).as("n"),
        all.flatMap(n => Seq(count_distinct(col(n)).as(n + "_nd"),
          min(col(n)).cast("string").as(n + "_mn"),
          max(col(n)).cast("string").as(n + "_mx"))): _*)
    }
    // v2: Expand agg with primitive-only buffers; string min/max in a
    // separate keyless agg
    time("v2 expand numeric + keyless str agg") {
      val a = o.agg(count(lit(1)).as("n"),
        (all.map(n => count_distinct(col(n)).as(n + "_nd")) ++
          numCols.flatMap(n => Seq(min(col(n)).cast("string").as(n + "_mn"),
            max(col(n)).cast("string").as(n + "_mx")))): _*)
      val b = o.agg(strCols.flatMap(n =>
        Seq(min(col(n)).as(n + "_mn"), max(col(n)).as(n + "_mx"))).head,
        strCols.flatMap(n =>
          Seq(min(col(n)).as(n + "_mn2"), max(col(n)).as(n + "_mx2"))).tail: _*)
      a.crossJoin(broadcast(b))
    }
    // v3: distincts only through Expand; ALL min/max keyless
    time("v3 expand distincts + keyless minmax") {
      val a = o.agg(count(lit(1)).as("n"),
        all.map(n => count_distinct(col(n)).as(n + "_nd")): _*)
      val b = o.agg(all.flatMap(n => Seq(min(col(n)).cast("string").as(n + "_mn"),
        max(col(n)).cast("string").as(n + "_mx"))).head,
        all.flatMap(n => Seq(min(col(n)).cast("string").as(n + "_mn2"),
          max(col(n)).cast("string").as(n + "_mx2"))).tail: _*)
      a.crossJoin(broadcast(b))
    }
    // v4: six separate single-distinct aggs (old approx shape, no HLL)
    time("v4 six single-distinct branches") {
      all.map { n =>
        o.agg(count(lit(1)).as("n"), count_distinct(col(n)).as("nd"))
          .select(lit(n).as("c"), col("n"), col("nd"))
      }.reduce(_.unionAll(_))
    }
    // v5: plain scan agg without distincts (floor)
    time("v5 keyless agg floor (no distinct)") {
      o.agg(count(lit(1)).as("n"),
        all.flatMap(n => Seq(min(col(n)).cast("string").as(n + "_mn"),
          max(col(n)).cast("string").as(n + "_mx"))): _*)
    }
    spark.stop()
  }
}
