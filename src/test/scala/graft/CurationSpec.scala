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

  test("semantic_decontamination catches a paraphrased leak the shingle audit misses") {
    import spark.implicits._
    // --- construct the corpus: 58 mutually-orthogonal background docs
    // (all tokens i-suffixed — no shared shingle anywhere) + a train doc
    // T and its PARAPHRASE P (synonym-substituted every 2-3 tokens: no 8
    // consecutive tokens survive; embeddings 0.96-cosine apart)
    def contentBucket(text: String): Int =
      Seq(text).toDF("text").select(queries.Temporal.bucketCol(
        md5(trim(regexp_replace(lower(col("text")), "\\W+", " "))))).head.getInt(0)
    def idBucket(id: Long): Int =
      Seq(id).toDF("x").select(queries.Temporal.bucketCol(col("x"))).head.getInt(0)
    val tBase = "the committee approved the annual budget proposal after " +
      "extensive deliberation on wednesday afternoon"
    val pBase = "the board endorsed the yearly spending plan after " +
      "long discussion on wednesday evening"
    // steer the CONTENT hash (split assignment) by a trailing token:
    // T must land in train (bucket >= 10), P in test/val (bucket < 10)
    val tText = (0 to 200).iterator.map(k => s"$tBase note$k")
      .find(contentBucket(_) >= 10).get
    val pText = (0 to 200).iterator.map(k => s"$pBase memo$k")
      .find(contentBucket(_) < 10).get
    // steer the DOC-ID hash: contamination_check splits by doc_id bucket,
    // so P must be one of ITS test docs and T one of its train docs
    val ids = (0L to 500L)
    val pId = ids.find(idBucket(_) < 5).get
    // odd id → T lands in the deltaMod=2 incoming shard (case 4 below)
    val tId = ids.find(id =>
      id != pId && id % 2 == 1 && idBucket(id) >= 10).get
    val bgIds = ids.filterNot(Set(pId, tId)).take(58)
    def oneHot(d: Int): Array[Float] =
      Array.tabulate(64)(i => if (i == d) 1.0f else 0.0f)
    val tVec = Array.tabulate(64)(i =>
      if (i == 58) 0.8f else if (i == 59) 0.6f else 0.0f)
    val pVec = Array.tabulate(64)(i =>
      if (i == 58) 0.6f else if (i == 59) 0.8f else 0.0f)
    val docs =
      bgIds.zipWithIndex.map { case (id, i) =>
        (id, s"bg$i word$i alpha$i beta$i gamma$i delta$i " +
          s"epsilon$i zeta$i eta$i theta$i", "en", "bg")
      } ++ Seq((tId, tText, "en", "core"), (pId, pText, "en", "core"))
    val vecs = bgIds.zipWithIndex.map { case (id, i) => (id, oneHot(i), 0) } ++
      Seq((tId, tVec, 1), (pId, pVec, 1))
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_semdecont_fixture").getAbsolutePath
    docs.map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // --- 1. byte-level split audit is CLEAN (all contents distinct)
    val lss = queries.Curation.leakageSafeSplit(spark, dir).collect()
    assert(lss.forall(_.getAs[Long]("leaked_clusters") == 0L))
    // --- 2. the verbatim shingle audit scores P zero (paraphrase shares
    // no 8-token run with anything in its train half)
    val contam = queries.TextAnalysis.contaminationCheck(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared_fps")).toMap
    assert(contam.contains(pId), "P must be a test doc for the shingle audit")
    assert(contam(pId) == 0L, s"shingle audit saw the paraphrase: ${contam(pId)}")
    // --- 3. the semantic gate catches it: P's nearest same-cell train
    // neighbor is T at cosine 0.96 >= tau, flagged leaked, and P's token
    // mass lands in its split's leak total
    val sd = queries.Curation.semanticDecontamination(spark, dir).collect()
    val pRow = sd.find(_.getAs[Long]("eval_doc") == pId)
      .getOrElse(fail(s"P ($pId) missing from the ledger"))
    assert(pRow.getAs[Boolean]("leaked"), "paraphrase not flagged")
    assert(pRow.getAs[Long]("train_doc") == tId)
    assert(pRow.getAs[Double]("cosine") >= 0.9)
    assert(Set("test", "val")(pRow.getAs[String]("split")))
    assert(pRow.getAs[Long]("split_leaked_tokens") >=
      pRow.getAs[Long]("n_tokens"))
    // the orthogonal background corpus stays clean at tau
    assert(sd.count(_.getAs[Boolean]("leaked")) == 1)

    // --- 4. the INCREMENTAL gate (reversed direction): with a deltaMod
    // that puts T in the incoming shard, T is rejected before landing —
    // its nearest eval neighbor is P at the same cosine
    val mod = 2L // tId is odd by construction → T is in the shard
    val sdd = queries.Curation
      .semanticDecontaminationDelta(spark, dir, deltaMod = mod).collect()
    assert(sdd.nonEmpty)
    // every ledger row is genuinely from the shard
    assert(sdd.forall(r => r.getAs[Long]("train_doc") % mod == mod - 1))
    val tRow = sdd.find(_.getAs[Long]("train_doc") == tId)
      .getOrElse(fail(s"T ($tId) missing from the shard ledger"))
    assert(tRow.getAs[Boolean]("rejected"), "incoming paraphrase-source not rejected")
    assert(tRow.getAs[Long]("eval_doc") == pId)
    assert(tRow.getAs[Double]("cosine") >= 0.9)
    assert(tRow.getAs[Long]("n_eval_dups") >= 1L)
    // the shard rollup books exactly the one rejection, on every row
    assert(sdd.forall(_.getAs[Long]("shard_rejected") == 1L))
    assert(sdd.forall(_.getAs[Long]("shard_docs") == sdd.length.toLong))
    // consistency with the full audit: the gate's rejection pair is the
    // full audit's leak pair, seen from the other side
    assert(pRow.getAs[Long]("train_doc") == tRow.getAs[Long]("train_doc"))
    // a shard that EXCLUDES T admits everything (background is orthogonal)
    val mod2 = (2L to mod + 1).find(m => tId % m != m - 1).get
    val clean = queries.Curation
      .semanticDecontaminationDelta(spark, dir, deltaMod = mod2).collect()
    assert(clean.forall(!_.getAs[Boolean]("rejected")))
  }

  test("decont gates: the persisted eval sink joins exchange-free on the static side") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // force the at-scale join shape: at 100 TB the eval side cannot
    // broadcast, so pin the SMJ path where the bucketing must carry
    val bKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(bKey)
    spark.conf.set(bKey, -1)
    try Seq(
      "semantic_decontamination_delta" ->
        queries.Curation.semanticDecontaminationDelta(spark, sf),
      "decont_gate_replay" -> queries.Curation.decontGateReplay(spark, sf),
      "semantic_decontamination" ->
        queries.Curation.semanticDecontamination(spark, sf)
    ).foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val evalScans = plan.collect {
        case s: FileSourceScanExec if s.output.exists(_.name == "eval_doc") => s
      }
      assert(evalScans.nonEmpty, s"$name: no eval-side file scan in plan")
      assert(evalScans.forall(_.bucketedScan),
        s"$name: eval-side scan is not a bucketed read")
      // no ShuffleExchange between the eval scan and its cell join: the
      // static side's HashPartitioning(cell, 32) must satisfy the join
      // directly (downstream per-train_doc window shuffles are the
      // QUERY's keys, not the substrate's — out of scope here)
      def pathTo(p: SparkPlan): Option[List[SparkPlan]] =
        if (evalScans.exists(_ eq p)) Some(List(p))
        else p.children.view.flatMap(pathTo).headOption.map(p :: _)
      val path = pathTo(plan).getOrElse(
        fail(s"$name: eval scan unreachable from root"))
      val joinIdx = path.lastIndexWhere(_.children.length == 2)
      assert(joinIdx >= 0, s"$name: no join above the eval scan")
      val between = path.drop(joinIdx)
      assert(!between.exists(_.isInstanceOf[ShuffleExchangeLike]),
        s"$name: a shuffle exchange sits between the bucketed eval scan " +
          s"and its join:\n${between.map(_.nodeName).mkString(" <- ")}")
    }
    finally spark.conf.set(bKey, prev)
  }
}
