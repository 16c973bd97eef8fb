package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-curation operators: the deterministic ordering / budgeting steps
  * between "filtered corpus" and "training shards" in an LLM data pipeline.
  * Both operators are pure integer arithmetic over md5-derived keys, so the
  * DuckDB twins are value-exact with no Det rounding at all.
  */
object Curation {

  // --------------------------------------------------------------------
  // Deterministic corpus shuffle (shard + position assignment)
  // --------------------------------------------------------------------

  private val ShuffleShards = 16

  /** The shared md5-derived shuffle key: first 15 hex chars of
    * md5(doc_id) as a 60-bit non-negative long. A pure function of the
    * id — reproducible across runs, engines, partitionings, and corpus
    * growth (the [[Temporal.bucketCol]] idiom, full-width). */
  private def shuffleKey(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")

  private def shuffleKeySql(id: String): String =
    s"CAST(CAST('0x' || substr(md5(CAST($id AS VARCHAR)), 1, 15) AS UBIGINT) AS BIGINT)"

  /** Deterministic global corpus shuffle: assign every doc a shard and a
    * position within that shard, both pure functions of doc_id — the
    * "shuffle the corpus before training" step, made reproducible (rerun
    * the pipeline, get byte-identical shards; add docs, existing docs
    * keep their relative order). shard = key mod nShards; pos = rank of
    * the doc's key within its shard (doc_id tie-break, though the 60-bit
    * key makes ties astronomically unlikely).
    *
    * Scale shape: ONE hash shuffle on `shard`, then a per-shard sort for
    * row_number — each window partition holds |corpus|/nShards docs, so
    * the knob IS the scale story: nShards grows with the corpus (100 TB /
    * 100k shards ≈ 1 GB per sort task), and no global sort or
    * SinglePartition funnel ever appears; the final orderBy is the
    * display contract, range-partitioned like every other query's. */
  def corpusShuffle(spark: SparkSession, sfDir: String,
                    nShards: Int = ShuffleShards): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val w = Window.partitionBy("shard").orderBy(col("skey").asc, col("doc_id").asc)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), shuffleKey(col("doc_id")).as("skey"))
      .withColumn("shard", pmod(col("skey"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("doc_id")
  }

  val corpusShuffleSql: String =
    s"""SELECT doc_id,
       |       CAST(skey % $ShuffleShards AS INTEGER) AS shard,
       |       CAST(row_number() OVER (PARTITION BY skey % $ShuffleShards
       |                               ORDER BY skey, doc_id) AS INTEGER) AS pos
       |FROM (SELECT doc_id, ${shuffleKeySql("doc_id")} AS skey FROM documents)
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // Token-budget sampling (per-source budget-capped ingestion)
  // --------------------------------------------------------------------

  private val BudgetDefault = 800L

  /** Per-source token-budget gate: walk each source's docs in
    * deterministic hash order and keep the prefix whose cumulative token
    * count stays within `budget` — the "cap every source at N tokens"
    * step of mixture construction (a raw-proportions corpus lets one
    * giant crawl swamp the mixture; a per-source cap equalizes, and the
    * hash order makes the kept subset a uniform, reproducible sample of
    * the source). Gate semantics are a PREFIX gate: keep ⇔ cumulative
    * tokens (all prior docs in hash order + own) ≤ budget; once the
    * budget line is crossed every later doc drops, so the kept set is
    * stable under re-ingestion, exactly like [[Temporal.splitAssign]].
    *
    * Scale shape — the oracle runs the obvious corpus-wide window
    * `sum() OVER (PARTITION BY source ORDER BY skey)`, which Spark must
    * NOT (source is low-cardinality: that window sorts the corpus in
    * |sources| tasks — the CLAUDE.md trap). Instead the cumsum
    * DECOMPOSES on the key's top 16 bits (bucket = first 4 md5 hex
    * chars, so bucket order is key-order at bucket granularity):
    * (1) a (source, bucket) token histogram — ≤ |sources|·65536 rows
    * regardless of corpus size, hence legitimately broadcastable;
    * (2) a tiny window over the histogram for the cumsum entering each
    * bucket; (3) a per-(source, bucket) window for the within-bucket
    * remainder — 65536-way-split partitions, ~1.5 GB each at 100 TB.
    * cum_tokens = (2) + (3) equals the oracle's single window exactly,
    * and the hash gate proves it per row. */
  def tokenBudgetSample(spark: SparkSession, sfDir: String,
                        budget: Long = BudgetDefault): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val md = md5(col("doc_id").cast("string"))
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.toks(col("text"))).cast("long").as("n_tokens"),
        conv(substring(md, 1, 15), 16, 10).cast("long").as("skey"),
        conv(substring(md, 1, 4), 16, 10).cast("int").as("bucket"))
    val wHist = Window.partitionBy("source").orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val hist = base.groupBy("source", "bucket")
      .agg(sum("n_tokens").as("btoks"))
      .withColumn("cum_before", coalesce(sum("btoks").over(wHist), lit(0L)))
      .select(col("source"), col("bucket"), col("cum_before"))
    val wIn = Window.partitionBy("source", "bucket")
      .orderBy(col("skey").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(hist), Seq("source", "bucket"))
      .withColumn("cum_tokens", col("cum_before") + sum("n_tokens").over(wIn))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"),
        (col("cum_tokens") <= budget).as("keep"))
      .orderBy("doc_id")
  }

  /** Oracle: the naive corpus-wide per-source window — DuckDB can afford
    * it at oracle scale, and hash-matching it proves the bucket
    * decomposition above computes the identical prefix sums. */
  val tokenBudgetSampleSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |         CAST(len(list_filter(string_split_regex(lower(text), '\\W+'),
       |                              x -> length(x) > 0)) AS BIGINT) AS n_tokens,
       |         ${shuffleKeySql("doc_id")} AS skey
       |  FROM documents)
       |SELECT doc_id, source, n_tokens,
       |       CAST(sum(n_tokens) OVER w AS BIGINT) AS cum_tokens,
       |       sum(n_tokens) OVER w <= $BudgetDefault AS keep
       |FROM t
       |WINDOW w AS (PARTITION BY source ORDER BY skey, doc_id
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // Systematic PPS sample (weighted, deterministic)
  // --------------------------------------------------------------------

  private val PpsK = 50L

  /** Systematic PPS sample: draw [[PpsK]] tickets proportional-to-size
    * (weight = n_chars) with a deterministic md5 permutation as the
    * "random" order — the weighted corpus subsample every
    * mixture/curriculum pipeline draws ("sample 50 docs, big docs
    * proportionally more often"), reproducible across runs and engines.
    * Classic systematic sampling: lay all docs on the cumulative-weight
    * line in md5-key order, drop K evenly-spaced tickets, and a doc is
    * picked `times_picked` = #tickets inside its weight span — computed
    * as floor(cum·K/total) − floor(cum_before·K/total), all BIGINT (cum ≤
    * ~1e14 chars at 100 TB × K=50 ≈ 5e15, well inside int64).
    *
    * The global cumsum is DECOMPOSED exactly like [[tokenBudgetSample]],
    * but the carry histogram here is GLOBAL (sampling crosses sources),
    * so the per-bucket totals (≤ 4096 rows — 3 hex chars of md5, bounded
    * regardless of corpus size) collect to the driver for the prefix
    * scan and broadcast back — the [[Temporal.eventsValueQuantiles]]
    * model-state pattern. The within-bucket window partitions on bucket:
    * no SinglePartition funnel; per-task sort is |corpus|/4096. `total`
    * is inlined as a literal from the same bounded collect. */
  def weightedSamplePps(spark: SparkSession, sfDir: String,
                        k: Long = PpsK): DataFrame = {
    import spark.implicits._
    require(k >= 1, s"k must be >= 1, got $k")
    val md = md5(col("doc_id").cast("string"))
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        coalesce(col("n_chars"), lit(0L)).as("w"),
        shuffleKey(col("doc_id")).as("skey"),
        conv(substring(md, 1, 3), 16, 10).cast("int").as("bucket"))
    // ≤ 4096 rows of model state, independent of corpus size
    val hist = base.groupBy("bucket").agg(sum("w").as("bw"))
      .collect().map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("bw")))
      .sortBy(_._1)
    val total = hist.map(_._2).sum
    if (total <= 0)
      return Seq.empty[(Long, String, Long, Long)]
        .toDF("doc_id", "source", "n_chars", "times_picked")
    val cumBefore = hist.map(_._1).zip(hist.scanLeft(0L)(_ + _._2))
    val carry = cumBefore.toSeq.toDF("bucket", "cum_before")
    val wIn = Window.partitionBy("bucket")
      .orderBy(col("skey").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(carry), "bucket")
      .withColumn("cum", col("cum_before") + sum("w").over(wIn))
      .withColumn("times_picked",
        expr(s"(cum * $k) DIV ${total}L - ((cum - w) * $k) DIV ${total}L"))
      .filter(col("times_picked") >= 1)
      .select(col("doc_id"), col("source"), col("w").as("n_chars"),
        col("times_picked"))
      .orderBy("doc_id")
  }

  /** Oracle: the naive corpus-wide window — affordable in DuckDB at
    * oracle scale; hash-matching proves the bucket decomposition and the
    * driver-side carry produce identical prefix sums and picks. */
  val weightedSamplePpsSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, source, COALESCE(n_chars, 0) AS w,
       |         ${shuffleKeySql("doc_id")} AS skey,
       |         CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 3)
       |              AS UBIGINT) AS INT) AS bucket
       |  FROM documents),
       |tot AS (SELECT CAST(sum(w) AS BIGINT) AS total FROM t),
       |c AS (SELECT doc_id, source, w,
       |             CAST(sum(w) OVER (ORDER BY bucket, skey, doc_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |               AS BIGINT) AS cum
       |      FROM t)
       |SELECT doc_id, source, w AS n_chars,
       |       CAST((cum * $PpsK) // tot.total
       |         - ((cum - w) * $PpsK) // tot.total AS BIGINT) AS times_picked
       |FROM c, tot
       |WHERE (cum * $PpsK) // tot.total
       |        - ((cum - w) * $PpsK) // tot.total >= 1
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // Registration
  // --------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_shuffle" -> ((s, d) => corpusShuffle(s, d)),
    "token_budget_sample" -> ((s, d) => tokenBudgetSample(s, d)),
    "weighted_sample_pps" -> ((s, d) => weightedSamplePps(s, d)))

  val oracles: Map[String, String] = Map(
    "corpus_shuffle" -> corpusShuffleSql,
    "token_budget_sample" -> tokenBudgetSampleSql,
    "weighted_sample_pps" -> weightedSamplePpsSql)
}
