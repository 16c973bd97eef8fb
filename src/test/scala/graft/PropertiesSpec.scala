package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generated properties (SURVEY.md §5.3): invariants the
  * reference's architecture could violate (salted partitioner, worker
  * count changing results) and ours must not. Seeded sampling (no
  * scalatestplus bridge in the offline cache). */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val lineGen: Gen[String] =
    Gen.listOf(Gen.oneOf("hello", "world", "spark", "Data!", "MAP", "a", ""))
      .map(_.mkString(" "))
  private val linesGen: Gen[List[String]] = Gen.listOfN(30, lineGen)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def wc(lines: Seq[String], parts: Int): Map[String, Long] =
    lines.toDF("text").repartition(parts)
      .select(explode(split(lower(col("text")), "\\W+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("wordcount is invariant under partition count (num_maps/num_reduces analog)") {
    val partsGen = Gen.choose(1, 8)
    samples(linesGen.flatMap(l => partsGen.map(l -> _)), 8).foreach {
      case (lines, parts) if lines.nonEmpty =>
        assert(wc(lines, parts) == wc(lines, 1), s"parts=$parts")
      case _ =>
    }
  }

  test("shuffle partitioning is deterministic (fixes reference's salted hash, F4)") {
    // Python's salted str hash could route a key to different reducers in
    // different workers (SURVEY.md §2.1 F4); Spark's Murmur3 must not.
    samples(Gen.listOfN(20, Gen.alphaStr), 6).foreach { keys =>
      if (keys.nonEmpty) {
        def route = keys.toDF("k").select(pmod(hash(col("k")), lit(8)).as("p"))
          .collect().map(_.getInt(0)).toSeq
        assert(route == route)
        val a = route
        assert(a == route)
      }
    }
  }

  test("token conservation: sum of counts == total tokens emitted") {
    samples(linesGen, 8).foreach { lines =>
      if (lines.nonEmpty) {
        val total = lines.toDF("text")
          .select(explode(split(lower(col("text")), "\\W+")).as("word"))
          .filter(length(col("word")) > 0).count()
        assert(wc(lines, 4).values.sum == total)
      }
    }
  }
}
