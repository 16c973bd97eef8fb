package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-hygiene demonstrations that only show up in plans:
  *  - bucketed tables co-locate join keys at WRITE time, so the join
  *    runs with no Exchange (the shuffle the reference's architecture
  *    pays on every job is amortized into the layout);
  *  - dynamic partition pruning prunes fact partitions from a dim filter
  *    at runtime. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed fact-fact join elides the shuffle (no Exchange in plan)") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // the in-memory catalog forgets tables between JVMs but their files
    // survive in the warehouse dir — remove them or CTAS refuses
    Seq("li_b", "ord_b").foreach { t =>
      val p = java.nio.file.Paths.get("target", "spark-warehouse", t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    Tables.lineitem(spark, TestSpark.sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_b")
    Tables.orders(spark, TestSpark.sf)
      .select("o_orderkey", "o_orderstatus")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_b")
    // tiny test tables would be broadcast (which sidesteps buckets
    // entirely) — force the sort-merge path a 100 TB fact-fact join takes
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b").join(spark.table("ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and it's still correct
      val expected = Tables.lineitem(spark, TestSpark.sf).join(
        Tables.orders(spark, TestSpark.sf),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("dedup gate: base-index scan is partition-pruned to the batch's touched pb set") {
    // the live gate's scale contract: a micro-batch probes ONLY the
    // band-bucket dirs its own band values hash into — the base-index
    // scan must carry a PartitionFilter on pb, not read the whole index
    val inc = Seq((9100001L, "zzqq wwxx yyvv uupp ttrr ssnn"))
      .toDF("doc_id", "text")
    val ledger = queries.Dedup.dedupGateBatch(spark, TestSpark.sf, inc, 10L, None)
    val plan = ledger.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(pf.exists(f => f.contains("pb") && f.contains("IN")),
      s"no pb partition filter on the base-index scan:\n${plan.take(3000)}")
    // a 1-doc batch emits 32 band values -> at most 32 of the 64 dirs
    val inList = pf.filter(f => f.contains("pb") && f.contains("IN")).head
    assert(inList.count(_ == ',') < 63, s"prune not selective: $inList")
    // and the unique doc is admitted
    val row = ledger.collect().head
    assert(!row.getAs[Boolean]("rejected") && row.getAs[Long]("n_shingles") == 4L)
  }

  test("dynamic partition pruning from a selective dim filter") {
    val dir = java.nio.file.Paths.get("target", "test-scratch", "orders-dpp").toString
    Tables.orders(spark, TestSpark.sf)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    val fact = spark.read.parquet(dir)
    // dim: one row per year, filtered to a single year
    val dim = Tables.orders(spark, TestSpark.sf)
      .select(year(col("o_orderdate")).as("d_year")).distinct()
      .filter(col("d_year") === 1998)
    val joined = fact.join(dim, col("o_year") === col("d_year"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning") ||
      plan.toLowerCase.contains("runtimefilter"),
      s"no dynamic pruning in plan:\n${plan.take(2000)}")
    val expected = fact.filter(col("o_year") === 1998).count()
    assert(joined.count() == expected)
  }
}
