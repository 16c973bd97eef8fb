package graft

import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  import spark.implicits._

  test("assets: binary payload + typed metadata, modality split by doc_id parity") {
    val a = queries.Multimodal.assets(spark, sf).collect()
    assert(a.nonEmpty)
    a.foreach { x =>
      assert(x.payload.nonEmpty)
      if (x.doc_id % 2 == 0) { assert(x.modality == "image" && x.sample_rate == 0) }
      else { assert(x.modality == "audio" && x.sample_rate == 16000) }
      assert(x.width >= 64 && x.height >= 64)
    }
  }

  test("mm_features: checksum equals sum of strided features; deterministic across runs") {
    val rows1 = queries.Multimodal.mmFeatures(spark, sf).collect()
    val rows2 = queries.Multimodal.mmFeatures(spark, sf).collect()
    assert(rows1.map(_.toString).toSeq == rows2.map(_.toString).toSeq)
    rows1.foreach { r =>
      val strides = (0 to 3).map(i => r.getAs[Double](s"feat$i")).sum
      assert(strides.toLong == r.getAs[Long]("checksum"))
      assert(r.getAs[Int]("n_bytes") > 0)
    }
  }

  test("mm_resize: thumbnail fits 64x64 aspect-preserved; resample respects its budget") {
    val rows = queries.Multimodal.mmResize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val img = r.getAs[String]("modality") == "image"
      val (nw, nh) = (r.getAs[Int]("new_w"), r.getAs[Int]("new_h"))
      if (img) {
        assert(nw >= 1 && nw <= 64 && nh >= 1 && nh <= 64)
        assert(nw == 64 || nh == 64) // the long side saturates the box
        assert(r.getAs[Int]("new_rate") == 0)
      } else {
        assert(nw == 0 && nh == 0 && r.getAs[Int]("new_rate") == 8000)
      }
      val n = r.getAs[Int]("n_bytes"); val stride = r.getAs[Int]("stride")
      val cnt = r.getAs[Int]("n_resized")
      assert(stride == math.max(1, (n + 255) / 256))
      assert(cnt == (if (n == 0) 0 else (n - 1) / stride + 1))
      assert(cnt <= 256 || stride == 1)
      assert(r.getAs[Long]("checksum_resized") >= 0)
    }
  }

  test("mm_frame_sample: ceil(n/16) frames, frames are the strided bytes") {
    val frames = queries.Multimodal.mmFrameSampleBytes(spark, sf).collect()
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    frames.foreach { r =>
      val n = r.getAs[Int]("n_bytes")
      val k = r.getAs[Int]("n_frames")
      assert(k == (n + 15) / 16)
      val expect = texts(r.getAs[Long]("doc_id")).getBytes("UTF-8")
        .zipWithIndex.collect { case (b, i) if i % 16 == 0 => b }
      assert(r.getAs[Array[Byte]]("frame_bytes").toSeq == expect.toSeq)
    }
  }

  test("mm_frame_sample: scalar summaries match the sampled bytes") {
    val scalars = queries.Multimodal.mmFrameSample(spark, sf).collect()
    val bytes = queries.Multimodal.mmFrameSampleBytes(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("frame_bytes")).toMap
    assert(scalars.nonEmpty)
    scalars.foreach { r =>
      val fb = bytes(r.getAs[Long]("doc_id"))
      assert(r.getAs[Int]("first_frame") == (if (fb.isEmpty) -1 else fb(0) & 0xFF))
      assert(r.getAs[Long]("checksum_frames") == fb.map(b => (b & 0xFF).toLong).sum)
      assert(r.getAs[Int]("n_frames") == fb.length)
    }
  }

  test("mm_dedup: clean fixture has no byte-dups; doctored corpus groups them by modality") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the driver corpus has no byte-identical texts — all-clear is the
    // correct (oracled) answer there
    assert(queries.Multimodal.mmDedup(spark, sf).count() == 0)
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_mm_dedup").getAbsolutePath
    // doc_id parity defines modality: 2/4 are both "image" and share
    // payload bytes -> one group; 1 ("audio") shares the TEXT with 2 but
    // not the modality -> must not merge; 3/5 unique
    Seq((1L, "same bytes", "en", "web", 10L),
        (2L, "same bytes", "en", "web", 10L),
        (4L, "same bytes", "en", "web", 10L),
        (3L, "other audio", "en", "web", 11L),
        (5L, "lone audio", "en", "web", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = queries.Multimodal.mmDedup(spark, dir).collect()
    assert(got.length == 1)
    val g = got.head
    assert(g.getAs[String]("modality") == "image" &&
      g.getAs[Long]("n_assets") == 2 &&
      g.getAs[Long]("keeper_doc_id") == 2 &&
      g.getAs[Long]("dup_max_id") == 4)
  }

  test("mm_near_dedup: one-byte patch pairs at small hamming; modality never crosses") {
    // fixture sweep: every pair same-modality (doc_id parity) and <= 3
    val fix = queries.Multimodal.mmNearDedup(spark, sf).collect()
    fix.foreach { r =>
      assert(r.getAs[Long]("doc_a") % 2 == r.getAs[Long]("doc_b") % 2)
      assert(r.getAs[Int]("hamming") <= 3)
    }
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_mm_near").getAbsolutePath
    val base = (1 to 40).map(i => ('a' + i % 26).toChar.toString * 3).mkString("")
    val patched = base.updated(60, 'Z')          // one byte of 120 changed
    val other = (1 to 120).map(i => ('0' + i % 10).toChar).mkString("")
    // 2/4 image near-dups; 6 image but unrelated bytes; 1 audio copy of
    // the base text — same bytes, wrong modality, must not pair
    Seq((2L, base), (4L, patched), (6L, other), (1L, base))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = queries.Multimodal.mmNearDedup(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
        -> r.getAs[Int]("hamming")).toMap
    assert(got.contains((2L, 4L)), s"patched near-dup missed: $got")
    assert(got((2L, 4L)) <= 3)
    assert(!got.keySet.exists { case (a, b) => a == 6L || b == 6L },
      "unrelated asset paired")
    assert(!got.contains((1L, 2L)) && !got.contains((1L, 4L)),
      "modality boundary crossed")
  }

  test("mm_integrity: checks are data-dependent, counts reconcile") {
    val rows = queries.Multimodal.mmIntegrity(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val img = rows("image"); val aud = rows("audio")
    // the fixture genuinely splits on both rules — neither vacuous-pass
    // nor vacuous-fail (a rule that fires on 0% or 100% checks nothing)
    val imgBad = img.getAs[Long]("n_undersized")
    val audBad = aud.getAs[Long]("n_misaligned")
    assert(imgBad > 0 && imgBad < img.getAs[Long]("n_assets"))
    assert(audBad > 0 && audBad < aud.getAs[Long]("n_assets"))
    // cross-modality rules never fire; per-modality counts reconcile
    assert(img.getAs[Long]("n_misaligned") == 0)
    assert(aud.getAs[Long]("n_undersized") == 0)
    Seq(img, aud).foreach { r =>
      assert(r.getAs[Long]("n_ok") + r.getAs[Long]("n_empty") +
        r.getAs[Long]("n_undersized") + r.getAs[Long]("n_misaligned") ==
        r.getAs[Long]("n_assets"))
    }
  }

  test("crossmodal_retrieval: recall vs brute-force cross-modal leg; metadata exact") {
    import org.apache.spark.sql.functions._
    val k = 5
    val got = queries.Multimodal.crossmodalRetrieval(spark, sf).collect()
    // every result row is an asset of the requested modality with the
    // stored metadata (pure functions of doc_id in the fixture lake)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("modality") == "image" && id % 2 == 0)
      assert(r.getAs[Int]("width") == 64 + (id % 8).toInt * 16)
      assert(r.getAs[Int]("height") == 64 + (id % 4).toInt * 32)
    }
    // ranks are 1..k per query, cosine non-increasing within a query
    got.groupBy(_.getAs[Long]("qid")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      val cs = sorted.map(_.getAs[Double]("cosine"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    // brute-force cross-modal exact top-k: per text query, best k IMAGE
    // assets by cosine over the whole corpus (no IVF pruning)
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Double]]("v").toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        s += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      s / math.sqrt(na) / math.sqrt(nb)
    }
    val qids = got.map(_.getAs[Long]("qid")).distinct
    assert(qids.nonEmpty, "vacuous: no retrieval results at the fixture")
    var hits = 0; var total = 0
    qids.foreach { q =>
      val exact = emb.keys.toSeq
        .filter(id => id % 2 == 0 && id != q)
        .map(id => (cos(emb(q), emb(id)), id))
        .sortBy { case (c, id) => (-c, id) }.take(k).map(_._2).toSet
      val ann = got.filter(_.getAs[Long]("qid") == q)
        .map(_.getAs[Long]("doc_id")).toSet
      hits += (exact & ann).size; total += exact.size
    }
    val recall = hits.toDouble / total
    assert(recall >= 0.8,
      s"cross-modal candidate recall $recall below floor (hits=$hits/$total)")
  }
}
