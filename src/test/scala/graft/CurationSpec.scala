package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the curation operators: determinism, permutation/prefix
  * structure, and (for token_budget_sample) equality between the scalable
  * bucket decomposition and the naive corpus-wide window it replaces. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("corpus_shuffle: pos is a 1..n permutation within each shard") {
    val rows = queries.Curation.corpusShuffle(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (shard, grp) =>
      assert(shard >= 0 && shard < 16)
      val ps = grp.map(_.getAs[Int]("pos")).sorted
      assert(ps.toSeq == (1 to grp.length), s"shard $shard pos not a permutation")
    }
  }

  test("corpus_shuffle: assignment is a pure function of doc_id (rerun-stable)") {
    val a = queries.Curation.corpusShuffle(spark, sf).collect().map(_.toString).sorted
    val b = queries.Curation.corpusShuffle(spark, sf).collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("corpus_shuffle: nShards=1 is one global hash order") {
    val rows = queries.Curation.corpusShuffle(spark, sf, nShards = 1).collect()
    assert(rows.forall(_.getAs[Int]("shard") == 0))
    assert(rows.map(_.getAs[Int]("pos")).sorted.toSeq == (1 to rows.length))
  }

  test("token_budget_sample: bucket decomposition == naive per-source window") {
    val md = md5(col("doc_id").cast("string"))
    val w = Window.partitionBy("source")
      .orderBy(col("skey").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(filter(split(lower(col("text")), "\\W+"), t => length(t) > 0))
          .cast("long").as("n_tokens"),
        conv(substring(md, 1, 15), 16, 10).cast("long").as("skey"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"),
        (col("cum_tokens") <= 800L).as("keep"))
      .orderBy("doc_id")
      .collect().map(_.toString).toSeq
    val scalable = queries.Curation.tokenBudgetSample(spark, sf)
      .collect().map(_.toString).toSeq
    assert(scalable == naive && scalable.nonEmpty)
  }

  test("token_budget_sample: keep is prefix-closed in hash order, per source") {
    val rows = queries.Curation.tokenBudgetSample(spark, sf).collect()
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, grp) =>
      // in cum_tokens order, keeps strictly precede drops
      val inOrder = grp.sortBy(_.getAs[Long]("cum_tokens"))
      val firstDrop = inOrder.indexWhere(!_.getAs[Boolean]("keep"))
      if (firstDrop >= 0)
        assert(inOrder.drop(firstDrop).forall(!_.getAs[Boolean]("keep")),
          s"source $src: a keep follows a drop")
      // every kept doc is within budget; total kept mass ≤ budget
      val kept = grp.filter(_.getAs[Boolean]("keep"))
      assert(kept.map(_.getAs[Long]("n_tokens")).sum <= 800L, s"source $src over budget")
    }
  }

  test("token_budget_sample: budget 0 keeps only zero-token prefixes") {
    val rows = queries.Curation.tokenBudgetSample(spark, sf, budget = 0L).collect()
    assert(rows.filter(_.getAs[Boolean]("keep"))
      .forall(_.getAs[Long]("cum_tokens") == 0L))
  }

  test("leakage_safe_split: identical texts co-assign where the id-keyed split straddles") {
    import spark.implicits._
    // find two ids the ID-keyed split separates (one test-band, one train-band)
    val buckets = (1L to 300L).toDF("id")
      .select(col("id"), queries.Temporal.bucketCol(col("id")).as("b"))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("b")))
    val testId = buckets.find(_._2 < 5).get._1
    val trainId = buckets.find(_._2 >= 10).get._1
    val text = (1 to 40).map(i => s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"w$i").mkString(" ")
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_leak_split").getAbsolutePath
    Seq((testId, text, "en", "web", text.length.toLong),
        (trainId, text, "en", "web", text.length.toLong),
        (999999L, other, "en", "web", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // the id-keyed split DOES straddle the byte-identical pair …
    val byId = queries.Temporal.splitAssign(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(byId(testId) != byId(trainId),
      "fixture ids must land in different id-keyed splits")
    // … the content-keyed split does not: one cluster of two docs in ONE
    // split, and the computed straddle audit is zero
    val rows = queries.Curation.leakageSafeSplit(spark, dir).collect()
    assert(rows.forall(_.getAs[Long]("leaked_clusters") == 0L))
    val dupSplits = rows.filter(_.getAs[Long]("n_dup_docs") > 0)
    assert(dupSplits.length == 1 &&
      dupSplits.head.getAs[Long]("n_dup_docs") == 1L)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 3L &&
      rows.map(_.getAs[Long]("n_clusters")).sum == 2L)
  }

  test("leakage_safe_split: partitions the corpus; audit zero; shares sum to 1") {
    val rows = queries.Curation.leakageSafeSplit(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("leaked_clusters") == 0L))
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sf).count())
    assert(math.abs(rows.map(_.getAs[Double]("pct_docs")).sum - 1.0) < 1e-4)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dup_docs") ==
        r.getAs[Long]("n_docs") - r.getAs[Long]("n_clusters"))
    }
  }

  test("split_balance_audit reconciles with leakage_safe_split and itself") {
    val audit = queries.Curation.splitBalanceAudit(spark, sf).collect()
    val splits = queries.Curation.leakageSafeSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    // same split assignment: per-split doc totals agree across queries
    audit.groupBy(_.getString(0)).foreach { case (split, rows) =>
      assert(rows.map(_.getAs[Long]("n_docs")).sum == splits(split),
        s"$split doc totals diverge between the two split queries")
      // within-split shares partition 1 (up to the 1e-6 Det grid)
      val shareSum = rows.map(_.getAs[Double]("split_share")).sum
      assert(math.abs(shareSum - 1.0) < 1e-4, s"$split shares sum $shareSum")
      // deviations cancel per split (both share columns sum to ~1)
      val devSum = rows.map(_.getAs[Double]("dev")).sum
      assert(math.abs(devSum) < 1e-4, s"$split devs sum $devSum")
    }
    // full dense grid: every (split, lang) cell present
    assert(audit.length == splits.size *
      audit.map(_.getString(1)).distinct.length)
    // the audit is non-vacuous: the small eval splits genuinely deviate
    assert(audit.exists(r => math.abs(r.getAs[Double]("dev")) > 0.01))
  }
}
