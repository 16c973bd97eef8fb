package graft

import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("bpe train/apply/vocab: invariant under corpus repartitioning") {
    // rand()-style partition-position dependence would break all three;
    // the argmax tie-break (n desc, pair asc) and integerised sums are
    // what make the pipeline a pure function of the corpus MULTISET
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bpe_repart").getAbsolutePath
    Tables.documents(spark, sf).repartition(7)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(queries.TextAnalysis.bpeTrain(spark, dir, 5).collect().toSeq ==
      queries.TextAnalysis.bpeTrain(spark, sf, 5).collect().toSeq)
    assert(queries.TextAnalysis.bpeApply(spark, dir, 5).collect().toSeq ==
      queries.TextAnalysis.bpeApply(spark, sf, 5).collect().toSeq)
    assert(queries.TextAnalysis.bpeVocab(spark, dir, 5).collect().toSeq ==
      queries.TextAnalysis.bpeVocab(spark, sf, 5).collect().toSeq)
  }

  test("lang_id: one row per doc, prediction drawn from the profiled languages") {
    val rows = queries.TextAnalysis.langId(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    val langs = Set("en", "de", "fr", "es")
    assert(rows.forall(r => langs.contains(r.getAs[String]("pred_lang"))))
    // argmax property: predicted language's hits >= every other language's hits
    rows.foreach { r =>
      val hits = langs.map(l => l -> r.getAs[Int](s"hits_$l").toLong).toMap
      assert(hits(r.getAs[String]("pred_lang")) == hits.values.max)
    }
  }

  test("text_quality: ratios in [0,1], score consistent with bucket thresholds") {
    val rows = queries.TextAnalysis.textQuality(spark, sf).collect()
    rows.foreach { r =>
      val s = r.getAs[Double]("quality_score")
      assert(s >= 0.0 && s <= 1.0)
      val bucket = r.getAs[String]("quality_bucket")
      if (s >= 0.6) assert(bucket == "high")
      else if (s >= 0.4) assert(bucket == "medium")
      else assert(bucket == "low")
      assert(r.getAs[Double]("type_token_ratio") <= 1.0)
      assert(r.getAs[Double]("stopword_ratio") <= 1.0)
    }
  }

  test("token_counts: bpe tokens >= ws tokens (runs split finer), vocab <= ws tokens") {
    val rows = queries.TextAnalysis.tokenCounts(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("n_bpe_tokens") >= r.getAs[Int]("n_ws_tokens"))
      assert(r.getAs[Int]("n_vocab") <= r.getAs[Int]("n_ws_tokens"))
    }
  }

  test("doc_fingerprint: winnowing selects a subset of kgram hashes, bounds hold") {
    val rows = queries.TextAnalysis.docFingerprint(spark, sf).collect()
    rows.foreach { r =>
      val nk = r.getAs[Int]("n_kgrams")
      val nf = r.getAs[Int]("n_fingerprints")
      assert(nf > 0 && nf <= nk)
      // winnowing density ~ 2/(w+1) = 0.4; allow generous slack
      assert(nf <= nk * 0.8 + 4)
      assert(r.getAs[Long]("fp_min") <= r.getAs[Long]("fp_max"))
    }
  }

  test("repetition_score: fractions bounded, top token really is the max count") {
    val rows = queries.TextAnalysis.repetitionScore(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val n = r.getAs[Int]("n_tokens")
      val topCnt = r.getAs[Long]("top_token_cnt")
      assert(topCnt >= 1 && topCnt <= n)
      val dup = r.getAs[Double]("dup_bigram_frac")
      assert(dup >= 0.0 && dup < 1.0)
      val frac = r.getAs[Double]("top_token_frac")
      assert(frac > 0.0 && frac <= 1.0)
    }
  }

  test("sequence_pack: greedy invariants — budget respected, positions/seqs contiguous") {
    val rows = queries.TextAnalysis.sequencePack(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (shard, docs) =>
      val sorted = docs.sortBy(_.getAs[Long]("doc_id"))
      sorted.foreach(r => assert(r.getAs[Long]("doc_id") % 32 == shard))
      // seq ids non-decreasing in doc order, advancing by at most 1
      val seqs = sorted.map(_.getAs[Int]("seq_in_shard"))
      assert(seqs.head == 0)
      seqs.zip(seqs.tail).foreach { case (a, b) => assert(b == a || b == a + 1) }
      sorted.groupBy(_.getAs[Int]("seq_in_shard")).foreach { case (_, seqDocs) =>
        val inOrder = seqDocs.sortBy(_.getAs[Long]("doc_id"))
        // positions 0,1,2,... within the sequence
        assert(inOrder.map(_.getAs[Int]("pos_in_seq")).toSeq ==
          inOrder.indices.toSeq)
        // total tokens fit the budget (every fixture doc is under budget)
        assert(inOrder.map(_.getAs[Int]("n_tokens")).sum <= 256)
      }
      // greedy tightness: a new sequence only opens when the previous one
      // could not have taken the doc
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        if (b.getAs[Int]("seq_in_shard") == a.getAs[Int]("seq_in_shard") + 1) {
          val prevSeq = sorted.filter(_.getAs[Int]("seq_in_shard") == a.getAs[Int]("seq_in_shard"))
          assert(prevSeq.map(_.getAs[Int]("n_tokens")).sum + b.getAs[Int]("n_tokens") > 256)
        }
      }
    }
  }

  test("corpus_stats: shares sum to ~1, totals consistent with the corpus") {
    val rows = queries.TextAnalysis.corpusStats(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == Tables.documents(spark, sf).count())
    val shareSum = rows.map(_.getAs[Double]("doc_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-3)
    rows.foreach { r =>
      assert(r.getAs[Long]("total_chars") >= r.getAs[Long]("total_tokens"))
    }
  }

  test("contamination_check: bounded fractions, consistent counts, test split only") {
    val rows = queries.TextAnalysis.contaminationCheck(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nf = r.getAs[Long]("n_fps")
      val shared = r.getAs[Long]("n_shared_fps")
      assert(nf > 0 && shared >= 0 && shared <= nf)
      assert((r.getAs[Long]("n_train_docs") > 0) == (shared > 0))
      val c = r.getAs[Double]("contamination")
      assert(c >= 0.0 && c <= 1.0)
      // every audited doc must be in the test split (bucket < 5)
      val id = r.getAs[Long]("doc_id")
      val bucket = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString).take(15), 16) % 100
      assert(bucket < 5)
    }
  }

  test("quality_gate: keep iff reason ok; reasons honor rule priority") {
    val rows = queries.TextAnalysis.qualityGate(spark, sf).collect()
    val reasons = rows.map(_.getAs[String]("reason")).toSet
    assert(reasons.subsetOf(Set("ok", "too_short", "repetitive")))
    assert(reasons.contains("ok") && reasons.size >= 2, "gate must discriminate")
    rows.foreach { r =>
      val n = r.getAs[Int]("n_tokens")
      val dup = r.getAs[Double]("dup_bigram_frac")
      val expected =
        if (n < 20) "too_short" else if (dup > 0.05) "repetitive" else "ok"
      assert(r.getAs[String]("reason") == expected)
      assert(r.getAs[Boolean]("keep") == (expected == "ok"))
    }
  }

  test("gopher_quality: rule arithmetic and combined verdict on the fixture") {
    val rows = queries.TextAnalysis.gopherQuality(spark, sf).collect()
    val docs = Tables.documents(spark, sf).count()
    assert(rows.length == docs)
    rows.foreach { r =>
      val nWords = r.getAs[Int]("n_words")
      val pass = r.getAs[Boolean]("pass")
      // re-derive the verdict from the reported per-rule columns — `pass`
      // must be exactly their conjunction (rule changes fail HERE)
      val expected = nWords >= 20 && nWords <= 100000 &&
        r.getAs[Double]("mean_word_len") >= 3.0 &&
        r.getAs[Double]("mean_word_len") <= 10.0 &&
        r.getAs[Double]("symbol_ratio") <= 0.1 &&
        r.getAs[Double]("alpha_word_ratio") >= 0.8 &&
        r.getAs[Int]("stop_hits") >= 1
      assert(pass == expected, s"doc ${r.getAs[Long]("doc_id")}")
    }
    // the verdict must actually VARY on the fixture (short docs fail the
    // word-count rule; a constant column would verify nothing)
    assert(rows.exists(_.getAs[Boolean]("pass")))
    assert(rows.exists(!_.getAs[Boolean]("pass")))
  }

  test("pii_scrub: counts and redaction on a synthetic PII corpus; fixture is clean") {
    import spark.implicits._
    // the driver fixture has no digits/emails by construction — prove the
    // all-clean verdict there, then pin actual redaction on synthetic docs
    val fixture = queries.TextAnalysis.piiScrub(spark, sf).collect()
    assert(fixture.forall(r => !r.getAs[Boolean]("had_pii")
      && r.getAs[Int]("n_emails") == 0 && r.getAs[Int]("n_phones") == 0))
    val docs = Seq(
      (1L, "contact alice@example.com or bob.smith+x@sub.domain.org today"),
      (2L, "call +1 (555) 123-4567 now"),
      (3L, "mixed: c@d.io and 555-123-9999 and c@d.io again"),
      (4L, "clean text with no identifiers at all")
    ).toDF("doc_id", "text")
    val out = queries.TextAnalysis.piiScrubFrame(docs)
      .select("doc_id", "n_emails", "n_phones", "redact", "had_pii")
      .collect().sortBy(_.getAs[Long]("doc_id"))
    assert(out(0).getAs[Int]("n_emails") == 2 && out(0).getAs[Int]("n_phones") == 0)
    assert(out(0).getAs[String]("redact") ==
      "contact <EMAIL> or <EMAIL> today")
    assert(out(1).getAs[Int]("n_phones") == 1)
    assert(out(1).getAs[String]("redact") == "call <PHONE> now")
    assert(out(2).getAs[Int]("n_emails") == 2 && out(2).getAs[Int]("n_phones") == 1)
    assert(out(2).getAs[String]("redact") == "mixed: <EMAIL> and <PHONE> and <EMAIL> again")
    assert(!out(3).getAs[Boolean]("had_pii"))
    assert(out(3).getAs[String]("redact") == "clean text with no identifiers at all")
  }

  test("dsir_weights: target-language docs score higher than off-target docs") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    val rows = queries.TextAnalysis.dsirWeights(spark, sf).collect()
    assert(rows.length == docs.size) // every fixture doc tokenizes non-empty
    val (en, rest) = rows.partition(r => docs(r.getAs[Long]("doc_id")) == "en")
    def mean(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Double]("avg_logw")).sum / rs.length
    // the operator's entire point: importance weights separate the target
    // distribution from the raw mixture (absolute sign is NOT pinned —
    // add-one smoothing over hashed buckets shifts both means down;
    // measured gap with uni+bigram features is ~0.036)
    assert(mean(en) > mean(rest) + 0.02,
      s"en mean ${mean(en)} should exceed non-en mean ${mean(rest)}")
  }

  test("nb_quality_score: classifier reconstructs its rule labels on the fixture") {
    val labels = queries.TextAnalysis.gopherQuality(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("pass")).toMap
    val rows = queries.TextAnalysis.nbQualityScore(spark, sf).collect()
    assert(rows.length == labels.size)
    val agree = rows.count(r =>
      r.getAs[Boolean]("nb_pass") == labels(r.getAs[Long]("doc_id")))
    // smoothed hashed-unigram NB self-scored on its training labels: high
    // but not perfect agreement is the expected regime (hash collisions
    // and smoothing cap it well below memorization)
    assert(agree.toDouble / rows.length >= 0.75,
      s"NB agrees with Gopher labels on $agree/${rows.length}")
  }

  test("quality_calibration: bands reconcile with the scorer and labels; ordered") {
    val rows = queries.TextAnalysis.qualityCalibration(spark, sf).collect()
      .sortBy(_.getAs[Int]("band"))
    assert(rows.nonEmpty)
    // partitions the scored corpus; pass mass reconciles with the labels
    val nb = queries.TextAnalysis.nbQualityScore(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nb.length)
    val nPassTotal = queries.TextAnalysis.gopherQuality(spark, sf).collect()
      .count(_.getAs[Boolean]("pass"))
    assert(rows.map(_.getAs[Long]("n_pass")).sum == nPassTotal)
    // band geometry: clamped range, per-band means strictly increasing
    rows.foreach { r =>
      assert(r.getAs[Int]("band") >= -10 && r.getAs[Int]("band") <= 9)
      assert(r.getAs[Long]("n_pass") <= r.getAs[Long]("n_docs"))
    }
    val means = rows.map(_.getAs[Double]("mean_log_odds"))
    means.sliding(2).foreach { case Array(a, b) =>
      assert(b > a, "per-band mean log-odds must be strictly increasing")
    }
    // the readout's reason to exist: a calibrated scorer separates — the
    // top band passes at a higher rate than the bottom band
    assert(rows.last.getAs[Double]("pass_rate") >
      rows.head.getAs[Double]("pass_rate"))
  }

  test("quality_survival_curve: survival is a proper reverse cumsum of the bands") {
    val rows = queries.TextAnalysis.qualitySurvivalCurve(spark, sf).collect()
      .sortBy(_.getAs[Int]("band"))
    assert(rows.nonEmpty)
    // same banding as the calibration table: identical band set + doc counts
    val calib = queries.TextAnalysis.qualityCalibration(spark, sf).collect()
      .map(r => r.getAs[Int]("band") -> r.getAs[Long]("n_docs")).toMap
    assert(rows.map(r => r.getAs[Int]("band") -> r.getAs[Long]("n_docs")).toMap
      == calib)
    // reverse-cumsum law: surv(b) = Σ_{b' >= b} tokens(b'); lowest band = 100%
    val totTokens = rows.map(_.getAs[Long]("tokens")).sum
    var expect = totTokens
    rows.foreach { r =>
      assert(r.getAs[Long]("surv_tokens") == expect)
      expect -= r.getAs[Long]("tokens")
    }
    assert(rows.head.getAs[Double]("surv_token_share") == 1.0)
    val shares = rows.map(_.getAs[Double]("surv_token_share"))
    shares.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
  }

  test("lang_source_chi2: cells partition the corpus; chi2 telescopes from contribs") {
    val rows = queries.TextAnalysis.langSourceChi2(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("obs")).sum == total)
    // marginals: expected sums back to the row totals (within cell rounding)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, cells) =>
      val obsRow = cells.map(_.getAs[Long]("obs")).sum.toDouble
      val expRow = cells.map(_.getAs[Double]("expected")).sum
      assert(math.abs(expRow - obsRow) < 0.01 * cells.length + 1e-6)
    }
    // the constant chi2 column telescopes from the per-cell contributions
    val chi2 = rows.head.getAs[Double]("chi2")
    assert(rows.forall(_.getAs[Double]("chi2") == chi2))
    val sumContrib = rows.map(r =>
      math.round(r.getAs[Double]("contrib") * 1e6)).sum
    assert(math.round(chi2 * 1e6) == sumContrib)
    val dof = rows.head.getAs[Long]("dof")
    val nl = rows.map(_.getAs[String]("lang")).distinct.length
    val ns = rows.map(_.getAs[String]("source")).distinct.length
    assert(dof == (nl - 1).toLong * (ns - 1))
    assert(chi2 >= 0)
  }

  test("bigram_lm_score: in-domain docs have lower NLL than out-of-domain docs") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    val rows = queries.TextAnalysis.bigramLmScore(spark, sf).collect()
    // only docs with >= 1 bigram appear; every scored doc has positive NLL
    assert(rows.forall(_.getAs[Long]("n_bigrams") > 0))
    val (en, rest) = rows.partition(r => docs(r.getAs[Long]("doc_id")) == "en")
    def mean(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Double]("avg_nll")).sum / rs.length
    // trained on en: en docs are modeled (seen bigrams, low NLL), other
    // languages fall through to the backoff penalty
    assert(mean(en) < mean(rest),
      s"en mean NLL ${mean(en)} should be below non-en mean ${mean(rest)}")
  }

  test("bm25_topk: matches an in-memory BM25 recompute of the full ranking") {
    val got = queries.TextAnalysis.bm25TopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("matched_terms"),
        r.getAs[Double]("score")))
    assert(got.length == 10 && got.forall(_._2 <= 3) && got.forall(_._3 > 0))
    // full recompute with the same rational-idf formula
    val q = Seq("hash", "join", "vector")
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase(java.util.Locale.ROOT)
          .split("\\W+").filter(_.nonEmpty).toSeq)
    val n = docs.length.toLong
    val totLen = docs.map(_._2.length.toLong).sum
    val df = q.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    val scored = docs.map { case (id, toks) =>
      val len = toks.length
      val tsU = q.flatMap { t =>
        val tf = toks.count(_ == t)
        if (tf == 0) None
        else {
          val idf = (n - df(t) + 0.5) / (df(t) + 0.5)
          val norm = 1.0 - 0.75 + 0.75 * (len.toDouble * n / totLen)
          Some(math.floor(idf * (tf * 2.2) / (tf + 1.2 * norm) * 1e6 + 0.5).toLong)
        }
      }
      (id, tsU.length.toLong,
        math.floor(tsU.sum.toDouble / 1e6 * 1e4 + 0.5) / 1e4)
    }.filter(_._2 > 0)
    val want = scored.sortBy { case (id, _, s) => (-s, id) }.take(10).toSeq
    assert(got.toSeq == want)
  }

  test("quality_agreement: cells reconcile with the two gates; kappa recomputes") {
    val r = queries.TextAnalysis.qualityAgreement(spark, sf).head()
    val keep = queries.TextAnalysis.qualityGate(spark, sf).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Boolean]("keep")).toMap
    val pass = queries.TextAnalysis.gopherQuality(spark, sf).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Boolean]("pass")).toMap
    val bk = keep.count { case (d, k) => k && pass(d) }
    val bd = keep.count { case (d, k) => !k && !pass(d) }
    val go = keep.count { case (d, k) => k && !pass(d) }
    val po = keep.count { case (d, k) => !k && pass(d) }
    assert(r.getAs[Long]("n_docs") == keep.size)
    assert(r.getAs[Long]("both_keep") == bk && r.getAs[Long]("both_drop") == bd)
    assert(r.getAs[Long]("gate_only") == go && r.getAs[Long]("gopher_only") == po)
    val n = keep.size.toDouble
    val pObs = (bk + bd) / n
    val pExp = ((bk + go) / n) * ((bk + po) / n) + ((bd + po) / n) * ((bd + go) / n)
    val kappa = (pObs - pExp) / (1.0 - pExp)
    assert(math.abs(r.getAs[Double]("po") - pObs) < 1e-5)
    assert(math.abs(r.getAs[Double]("kappa") - kappa) < 1e-5)
    assert(r.getAs[Double]("kappa") <= 1.0)
  }

  test("dataset_card: every metric reconciles with its source query") {
    import org.apache.spark.sql.functions._
    val card = queries.TextAnalysis.datasetCard(spark, sf).collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Double]("value")).toMap
    assert(card.size == 9)
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    assert(card("n_docs") == n.toDouble)
    assert(card("n_sources") == docs.select("source").distinct().count().toDouble)
    assert(card("n_langs") == docs.select("lang").distinct().count().toDouble)
    val nEn = docs.filter(col("lang") === "en").count()
    assert(card("pct_en") == math.floor(nEn.toDouble / n * 1e6 + 0.5) / 1e6)
    val nUniq = docs.select(md5(col("text"))).distinct().count()
    assert(card("exact_dup_rate") ==
      math.floor((1.0 - nUniq.toDouble / n) * 1e6 + 0.5) / 1e6)
    // median: at least half the docs at or below, and p50 is attained
    val p50 = card("p50_chars").toLong
    assert(docs.filter(col("n_chars") <= p50).count() * 2 >= n)
    assert(docs.filter(col("n_chars") === p50).count() > 0)
    // keep rate reconciles with the quality gate itself
    val gate = queries.TextAnalysis.qualityGateFrame(docs)
    val keep = gate.filter(col("keep")).count().toDouble / gate.count()
    assert(card("quality_keep_rate") == math.floor(keep * 1e6 + 0.5) / 1e6)
    assert(card("total_tokens") > 0 && card("mean_chars") > 0)
  }

  test("readability: hand-computed Flesch counts (sentence floor, vowel-less fallback, complex words)") {
    import spark.implicits._
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_readability").getAbsolutePath
    // doc 1: w=6, sentences=2 ('.' and '!'), vowel groups=6, complex=0
    // doc 2: w=2, NO terminator -> s floored to 1; zero vowel groups in
    //        text, both words vowel-less -> y=2 (the +1-per-word rule)
    // doc 3: w=1, 5 vowel groups in one word -> complex, pct=1.0
    Seq((1L, "the cat sat. a dry gym!", "en", "a"),
        (2L, "tsk tsk", "en", "b"),
        (3L, "bananarama", "en", "c"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = queries.TextAnalysis.readability(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("flesch_ease"), r.getAs[Double]("fk_grade"),
          r.getAs[Double]("pct_complex"))).toMap
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-6
    // 206.835 - 1.015*(6/2) - 84.6*(6/6) = 119.19
    assert(close(rows("a")._1, 119.19), s"got ${rows("a")}")
    // 0.39*3 + 11.8*1 - 15.59 = -2.62
    assert(close(rows("a")._2, -2.62))
    assert(rows("a")._3 == 0.0)
    // 206.835 - 1.015*(2/1) - 84.6*(2/2) = 120.205
    assert(close(rows("b")._1, 120.205), s"got ${rows("b")}")
    // 206.835 - 1.015*1 - 84.6*5 = -217.18; 1 complex word of 1
    assert(close(rows("c")._1, -217.18), s"got ${rows("c")}")
    assert(rows("c")._3 == 1.0)
  }

  test("tokenizer_fertility: per-lang sums reconcile with bpe_apply; fertility >= 1") {
    val byLang = queries.TextAnalysis.tokenizerFertility(spark, sf).collect()
    assert(byLang.nonEmpty)
    byLang.foreach { r =>
      val w = r.getAs[Long]("n_words"); val s = r.getAs[Long]("n_syms")
      // a word is at least one symbol and at most its char count
      assert(s >= w, s"lang ${r.getAs[String]("lang")}: syms $s < words $w")
      assert(r.getAs[Double]("fertility") ==
        math.floor(s.toDouble / w * 1e6 + 0.5) / 1e6)
      assert(r.getAs[Double]("chars_per_sym") >= 1.0)
    }
    // same merge chain, same corpus: total symbols must agree exactly
    // with the per-doc bpe_apply readout
    val totalSyms = byLang.map(_.getAs[Long]("n_syms")).sum
    val applyTotal = queries.TextAnalysis.bpeApply(spark, sf).collect()
      .map(_.getAs[Long]("n_bpe_symbols")).sum
    assert(totalSyms == applyTotal, s"$totalSyms != $applyTotal")
  }

  test("pack_boundary_curve: nested power-of-two grids make cuts monotone; chunk math consistent") {
    val rows = queries.TextAnalysis.packBoundaryCurve(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("ctx")).toSeq == Seq(128, 256, 512, 1024))
    val total = rows.head.getAs[Long]("total_tokens")
    rows.foreach { r =>
      val ctx = r.getAs[Int]("ctx").toLong
      val chunks = r.getAs[Long]("n_chunks")
      // ceil-division bracketing and pad identity
      assert(chunks * ctx >= total && (chunks - 1) * ctx < total)
      assert(r.getAs[Long]("pad_tokens") == chunks * ctx - total)
      assert(r.getAs[Long]("n_docs_cut") <= r.getAs[Long]("n_docs"))
    }
    // every 1024-boundary is also a 512/256/128 boundary → cuts shrink with ctx
    val cuts = rows.sortBy(_.getAs[Int]("ctx")).map(_.getAs[Long]("n_docs_cut"))
    assert(cuts.zip(cuts.tail).forall { case (a, b) => a >= b }, cuts.mkString(","))
    // the curve discriminates on this corpus
    assert(cuts.head > cuts.last)
  }

  test("shard_plan: matches an in-memory prefix-sum writer; shards partition docs and tokens") {
    val rows = queries.TextAnalysis.shardPlan(spark, sf).collect()
    assert(rows.nonEmpty)
    // in-memory greedy writer with the same tokenizer
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map { r =>
        val t = r.getAs[String]("text").toLowerCase.replaceAll("\\W+", " ").trim
        val nt = if (t.isEmpty) 0L else t.split(" ").length.toLong
        (r.getAs[Long]("doc_id"), nt)
      }.sortBy(_._1)
    var off = 0L
    val assigned = docs.map { case (id, nt) =>
      val shard = off / 4096L; off += nt; (shard, id, nt) }
    val expect = assigned.groupBy(_._1).map { case (sh, xs) =>
      sh -> (xs.length.toLong, xs.map(_._2).min, xs.map(_._2).max, xs.map(_._3).sum) }
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (n, fd, ld, tk) = expect(r.getAs[Long]("shard"))
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("first_doc") == fd && r.getAs[Long]("last_doc") == ld)
      assert(r.getAs[Long]("shard_tokens") == tk)
      assert(r.getAs[Long]("fill_ppm") == math.floor(tk.toDouble * 1e6 / 4096 + 0.5).toLong)
    }
    // shards are a contiguous ascending sequence and doc ranges don't overlap
    val sh = rows.map(_.getAs[Long]("shard")).toSeq
    assert(sh == sh.sorted && sh.distinct == sh)
    val ranges = rows.sortBy(_.getAs[Long]("shard"))
      .map(r => (r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))
    assert(ranges.forall { case (a, b) => a <= b })
    assert(ranges.zip(ranges.tail).forall { case ((_, b1), (a2, _)) => b1 < a2 })
    // partition identity: every doc lands in exactly one shard
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.length)
    assert(rows.map(_.getAs[Long]("shard_tokens")).sum == docs.map(_._2).sum)
  }

  test("ngram_novelty_curve: novelty bounded, decile 0 anchored, totals close") {
    val rows = queries.TextAnalysis.ngramNoveltyCurve(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("decile")).toSeq == (0 to 9))
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_grams"))
      val ppm = r.getAs[Long]("novelty_ppm")
      assert(ppm >= 0 && ppm <= 1000000L)
    }
    // the first doc of the corpus contributes only novel k-grams, so
    // decile 0's novelty is strictly positive
    assert(rows.head.getAs[Long]("n_novel") > 0)
    // exactness: every hash is novel exactly once ⇒ Σ n_novel equals the
    // corpus-wide DISTINCT hash count (brute-forced with the same kernel)
    val all = new java.util.HashSet[java.lang.Long]()
    Tables.documents(spark, sf).select("text").collect().foreach { r =>
      val ns = r.getString(0).toLowerCase.replaceAll("\\W+", " ").trim
      queries.TextAnalysis.kgramHashes(ns).foreach(h => all.add(h))
    }
    assert(rows.map(_.getAs[Long]("n_novel")).sum == all.size.toLong)
  }

  test("zipf_fit: negative slope, meaningful fit, intercept anchors the top rank") {
    val r = queries.TextAnalysis.zipfFit(spark, sf).head()
    assert(r.getAs[Long]("n_ranks") > 10)
    val slope = r.getAs[Double]("slope")
    val r2 = r.getAs[Double]("r2")
    // frequency falls with rank, so the OLS slope is negative — but the
    // synthetic fixture vocabulary is ~31 near-uniform words, i.e. NOT
    // Zipfian, and the readout must SAY so: shallow slope (natural text
    // sits near −1), weak fit. Flagging exactly this regime is the
    // operator's job (template-generated corpora look like this).
    assert(slope < 0 && slope > -0.5, s"slope $slope")
    assert(r2 > 0 && r2 <= 1.0, s"r2 $r2")
    // intercept_ln ≈ ln(count at rank 1): the fitted line at x=0
    val topCnt = queries.TextJobs.wordcount(spark, sf).collect()
      .map(_.getAs[Long]("cnt")).max
    assert(math.abs(r.getAs[Double]("intercept_ln") - math.log(topCnt.toDouble))
      < 1.5, s"intercept ${r.getAs[Double]("intercept_ln")} vs ln($topCnt)")
  }

  test("quality_drift: bands partition the corpus; an injected junk shard alarms") {
    import spark.implicits._
    // fixture: bands cover every doc, ppm shares sum to ~1e6, tv sane
    val rows = queries.TextAnalysis.qualityDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_corpus")).sum == nDocs)
    val tv = rows.head.getAs[Long]("tv_ppm")
    assert(rows.forall(_.getAs[Long]("tv_ppm") == tv) && tv >= 0 && tv <= 1000000)
    val cppm = rows.map(_.getAs[Long]("corpus_ppm")).sum
    assert(math.abs(cppm - 1000000L) <= rows.length,
      s"corpus ppm shares sum $cppm")  // half-up per band: ±1 each
    // injected drift: shard docs are punctuation junk, base docs are the
    // fixture-like sentences -> disjoint bands -> TV near 1
    val dir = java.nio.file.Paths.get("target", "test-scratch",
      "qdrift").toAbsolutePath.toString
    val docs =
      (0L until 40L).filter(_ % 10 != 9).map(i => (i,
        "the quick brown fox jumps over the lazy dog near the river bank " +
          s"carrying item $i")) ++
        Seq(9L, 19L, 29L, 39L).map(i => (i, "!!! ??? *** !!! ??? ***"))
    docs.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val drifted = queries.TextAnalysis.qualityDrift(spark, dir).collect()
    assert(drifted.nonEmpty)
    // corpus INCLUDES the shard (4 of 40 docs), so the fully-disjoint
    // shard reads TV = 1 − 4/40 = 0.9 exactly
    assert(drifted.head.getAs[Long]("tv_ppm") == 900000L,
      s"junk shard must alarm: tv=${drifted.head.getAs[Long]("tv_ppm")}")
  }
}
