package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Parity with the reference's FRAMEWORK operators that aren't query-shaped
  * (SURVEY.md §2.1): F1 text scan, F8 TSV sink, F10 limited results read —
  * plus R4 concurrent jobs. Scratch files live under target/ (inside the
  * repo) and are cleaned up. */
class FrameworkParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scratch(name: String): String = {
    val p = Paths.get("target", "test-scratch", name)
    Files.createDirectories(p.getParent)
    p.toString
  }

  test("F1/F8/F10: text scan -> wordcount -> TSV sink -> limited read-back") {
    // F8: the reference writes `key\tvalue` lines (worker/worker.py:164-171),
    // keys sorted within partition. Write our wordcount the same way.
    val outDir = scratch("wordcount-tsv")
    val counts = queries.TextJobs.wordcount(spark, TestSpark.sf)
    counts.select(col("word"), col("cnt").cast("string"))
      .write.mode("overwrite").option("sep", "\t").csv(outDir)

    // F1: line-oriented text scan of what we just wrote
    val lines = spark.read.text(outDir + "/*.csv").as[String].collect()
    assert(lines.nonEmpty)
    val parsed = lines.map { l =>
      val Array(k, v) = l.split("\t", 2); k -> v.toLong
    }.toMap
    val expected = counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(parsed == expected)

    // F10: limited results read (client.py:138-140 --limit N)
    val limited = spark.read.text(outDir + "/*.csv").limit(5).collect()
    assert(limited.length == math.min(5, lines.length))
  }

  test("F8 sorted-key property: keys appear sorted within each output partition") {
    // worker/worker.py:167 iterates keys in sorted order per reduce partition
    val outDir = scratch("sorted-tsv")
    queries.TextJobs.wordcount(spark, TestSpark.sf)
      .repartition(4, col("word"))
      .sortWithinPartitions("word")
      .select(col("word"), col("cnt").cast("string"))
      .write.mode("overwrite").option("sep", "\t").csv(outDir)
    val files = Files.list(Paths.get(outDir)).iterator().asScala
      .filter(_.toString.endsWith(".csv")).toSeq
    assert(files.nonEmpty)
    files.foreach { f =>
      val keys = Files.readAllLines(f).asScala.map(_.split("\t")(0))
      assert(keys == keys.sorted, s"unsorted keys in $f")
    }
  }

  test("R4: concurrent jobs share one session (tests/test_mapreduce.py:204-250)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val jobs = Seq(
      Future(queries.TextJobs.wordcount(spark, TestSpark.sf).count()),
      Future(queries.Relational.pricingSummary(spark, TestSpark.sf).count()),
      Future(queries.TextJobs.grep(spark, TestSpark.sf, "(error|scan)").count()))
    val results = Await.result(Future.sequence(jobs), 120.seconds)
    assert(results.forall(_ > 0))
  }
}
