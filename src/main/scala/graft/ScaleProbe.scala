package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale probe: synthesize a documents+embeddings corpus N×
  * the sf0.1 fixtures (same vocabulary/shape, deterministic LCG text,
  * ~1% injected near-dups) and time the document/vector operator family
  * against it. This is the evidence behind PERF.md's "would hold at
  * 100×" claims — fixtures verify correctness, this probes the scaling
  * exponent (a quadratic candidate blowup shows up here long before a
  * cluster does).
  *
  * After the timing loop, the ANN family also gets a RECALL probe:
  * top-5 overlap of the LSH/IVF output vs the exact brute-force baseline
  * at probe scale — approximation quality must hold as the corpus grows
  * (bucket occupancy and cell geometry both shift with n), not just at
  * fixture scale where SimilaritySpec bounds it.
  * Usage: tools/run.sh graft.ScaleProbe [nDocs] [nVecs] [outDir] [q1,q2,...] */
object ScaleProbe {

  private val Vocab: Array[String] = Array(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")

  /** Queries that read only documents/embeddings (the LLM-pipeline family). */
  private val DocQueries = Seq(
    "wordcount", "exact_dedup", "simhash_dedup", "minhash_lsh_dedup",
    "ngram_jaccard_dedup", "dedup_clusters", "doc_fingerprint",
    "repetition_score", "quality_gate", "sequence_pack", "split_assign",
    "contamination_check", "corpus_stats", "lang_id", "text_quality",
    "token_counts", "tfidf_top_terms", "bigrams",
    "doc_chunk", "doc_surprisal", "dedup_canonical", "embedding_quantize",
    "ann_cosine_topk", "ann_cosine_lsh", "ann_cosine_ivf",
    "embedding_cosine_dedup", "mm_features", "mm_frame_sample", "mm_fusion")

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 100000L
    val nVecs = if (args.length > 1) args(1).toLong else 40000L
    val dir = if (args.length > 2 && args(2).nonEmpty) args(2)
      else s"${System.getProperty("java.io.tmpdir")}/graft_scale_${nDocs}"
    val only: Set[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).filter(_.nonEmpty).toSet
      else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // -- synthesize documents: LCG text over the fixture vocabulary;
    //    every 100th doc is a near-dup of its predecessor (one token off)
    def lcg(s: Long): Long = s * 6364136223846793005L + 1442695040888963407L
    spark.range(nDocs).select(col("id").as("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val base = if (id % 100 == 99) id - 1 else id   // near-dup source
          var s = lcg(base ^ 0x5DEECE66DL)
          val n = 10 + java.lang.Math.floorMod(s >>> 16, 90L).toInt
          val sb = new StringBuilder
          var i = 0
          while (i < n) {
            s = lcg(s)
            sb.append(Vocab(java.lang.Math.floorMod(s >>> 16, Vocab.length.toLong).toInt))
            if (i < n - 1) sb.append(' ')
            i += 1
          }
          if (id % 100 == 99) sb.append(" dup")            // 1-token difference
          val text = sb.toString
          (id, text, "en", s"src${id % 20}", text.length.toLong)
        }
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")

    // -- synthesize embeddings: unit-ish LCG vectors; every 50th is a
    //    near-copy of its predecessor (tiny perturbation)
    spark.range(nVecs).select(col("id").as("vec_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val base = if (id % 50 == 49) id - 1 else id
          var s = lcg(base ^ 0xBADC0FFEL)
          val v = Array.fill(64) {
            s = lcg(s)
            ((s >>> 11).toDouble / (1L << 53).toDouble - 0.5).toFloat
          }
          if (id % 50 == 49) v(0) = v(0) + 1e-4f
          (id, v.toSeq, (id % 7).toInt)
        }
      }.toDF("vec_id", "embedding", "label")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")

    println(s"""{"corpus":"$dir","n_docs":$nDocs,"n_vecs":$nVecs}""")
    val run = if (only.isEmpty) DocQueries else DocQueries.filter(only)
    run.foreach { name =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val res = try {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        "ok"
      } catch { case e: Throwable => s"FAIL ${e.getClass.getSimpleName}" }
      val dt = (System.nanoTime() - t0) / 1e9
      // Locale.ROOT: the f-interpolator uses the default locale, which
      // would emit comma decimals (invalid JSON) on non-English JVMs
      println(String.format(java.util.Locale.ROOT,
        """{"query":"%s","sec":%.2f,"status":"%s"}""", name, Double.box(dt), res))
    }
    // -- ANN recall at probe scale (50 result rows per query — model-
    //    sized collects, not data)
    if (run.exists(Set("ann_cosine_lsh", "ann_cosine_ivf"))) {
      def top5(name: String): Set[(Long, Long)] =
        SparkEntry.queries(name)(spark, dir).select("qid", "vec_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val bf = top5("ann_cosine_topk")
      Seq("ann_cosine_lsh", "ann_cosine_ivf").filter(run.contains).foreach { name =>
        val recall = if (bf.isEmpty) 0.0
          else top5(name).intersect(bf).size.toDouble / bf.size
        println(String.format(java.util.Locale.ROOT,
          """{"query":"%s","recall_at_5":%.3f,"vs":"ann_cosine_topk","n_vecs":%d}""",
          name, Double.box(recall), Long.box(nVecs)))
      }
    }
    spark.stop()
  }
}
