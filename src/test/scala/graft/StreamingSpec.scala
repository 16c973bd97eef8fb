package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.streaming.StreamingJobs
import graft.streaming.StreamingJobs.Ev

/** Streaming semantics: the SAME transformation over a MemoryStream must
  * produce the batch twin's result once all data is processed — plus the
  * custom flatMapGroupsWithState sessionizer must match the built-in
  * session_window on closed sessions. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  import spark.implicits._

  private def eventRows: Seq[(Timestamp, String, Long, Double)] =
    Tables.eventsTs(spark, sf)
      .select("ts", "event_type", "user_id", "value")
      .as[(Timestamp, String, Long, Double)].collect().toSeq

  test("streamed tumbling window agg == batch twin (complete mode, all data)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "user_id", "value")
    val q = StreamingJobs.tumbling1h(df).writeStream
      .format("memory").queryName("tumbling_test").outputMode(OutputMode.Complete)
      .start()
    try {
      mem.addData(eventRows)
      q.processAllAvailable()
      val streamed = spark.table("tumbling_test")
        .orderBy("window_start", "event_type")
        .collect().map(_.toString).toSeq
      val batch = StreamingJobs.tumbling1h(Tables.eventsTs(spark, sf))
        .orderBy("window_start", "event_type")
        .collect().map(_.toString).toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streamed seasonal profile + bounded finisher == batch events_seasonal") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "user_id", "value")
    // the grouped profile streams (complete mode); the window finisher
    // runs over the <=24*|types| state table, exactly as it would over
    // a production state-store dump
    val q = queries.Temporal.seasonalBase(df).writeStream
      .format("memory").queryName("seasonal_test")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(eventRows)
      q.processAllAvailable()
      val streamed = queries.Temporal.seasonalFinish(spark.table("seasonal_test"))
        .collect().map(_.toString).toSeq
      val batch = queries.Temporal.eventsSeasonal(spark, sf)
        .collect().map(_.toString).toSeq
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream-static segment enrichment join == batch twin (complete mode)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "user_id", "value")
    val dim = Tables.customer(spark, sf)
    val q = StreamingJobs.segmentActivity(df, dim).writeStream
      .format("memory").queryName("segment_test").outputMode(OutputMode.Complete)
      .start()
    try {
      mem.addData(eventRows)
      q.processAllAvailable()
      val streamed = spark.table("segment_test")
        .orderBy("window_start", "segment")
        .collect().map(_.toString).toSeq
      val batch = StreamingJobs.segmentActivity(Tables.eventsTs(spark, sf), dim)
        .orderBy("window_start", "segment")
        .collect().map(_.toString).toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stateful sessionizer (flatMapGroupsWithState) == built-in session_window") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingJobs.sessionizeStateful(mem.toDS()).writeStream
      .format("memory").queryName("sessions_test").outputMode(OutputMode.Append)
      .start()
    try {
      val evs = eventRows.map { case (ts, et, uid, _) => Ev(uid, ts, et) }
      mem.addData(evs)
      q.processAllAvailable()
      // advance the watermark past every open session's timeout so all
      // sessions close (sentinel far in the future, single synthetic user)
      val maxTs = evs.map(_.ts.getTime).max
      mem.addData(Ev(-1L, new Timestamp(maxTs + 100L * 3600 * 1000), "flush"))
      q.processAllAvailable()
      val streamed = spark.table("sessions_test")
        .filter(col("user_id") >= 0)
        .select("user_id", "session_start", "session_last", "n_events")
        .orderBy("user_id", "session_start")
        .collect().map(_.toString).toSeq
      val batch = StreamingJobs.sessions4h(Tables.eventsTs(spark, sf))
        .select("user_id", "session_start", "session_last", "n_events")
        .orderBy("user_id", "session_start")
        .collect().map(_.toString).toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("foreachBatch incremental MV upsert == batch aggregate (multi-micro-batch)") {
    // the mv_refresh_incremental merge algebra, run as a STREAMING sink:
    // each micro-batch's partial (count, cents) agg upserts into MV
    // state by monoid merge — three separate micro-batches must land on
    // exactly the batch groupBy answer
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "user_id", "value")
    val mv = scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]
    val q = df.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.select(col("event_type"),
            round(col("value") * 100).cast("long").as("c"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("c").as("sc"))
          .collect().foreach { r =>
            val k = r.getAs[String]("event_type")
            val (n0, s0) = mv.getOrElse(k, (0L, 0L))
            mv(k) = (n0 + r.getAs[Long]("n"), s0 + r.getAs[Long]("sc"))
          }
    }.start()
    try {
      val rows = eventRows
      val (a, rest) = rows.splitAt(rows.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      Seq(a, b, c).foreach { part =>
        mem.addData(part)
        q.processAllAvailable()
      }
      val want = Tables.eventsTs(spark, sf)
        .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
        .groupBy("event_type").agg(count(lit(1)).as("n"), sum("c").as("sc"))
        .collect()
        .map(r => r.getAs[String]("event_type") ->
          (r.getAs[Long]("n"), r.getAs[Long]("sc"))).toMap
      assert(mv.toMap == want && mv.nonEmpty)
    } finally q.stop()
  }

  test("file-source stream (readStream parquet) == batch twin") {
    val q = StreamingJobs.tumbling1h(StreamingJobs.readEventsStream(spark, sf))
      .writeStream.format("memory").queryName("file_stream_test")
      .outputMode(OutputMode.Complete)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000L)
      val streamed = spark.table("file_stream_test")
        .orderBy("window_start", "event_type").collect().map(_.toString).toSeq
      val batch = StreamingJobs.tumbling1h(Tables.eventsTs(spark, sf))
        .orderBy("window_start", "event_type").collect().map(_.toString).toSeq
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming doc_chunk == batch doc_chunk (chunk-on-ingest is stateless)") {
    val schema = Tables.documents(spark, sf).schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sf)
    val q = queries.TextAnalysis.docChunkFrame(stream)
      .writeStream.format("memory").queryName("chunk_test")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000L)
      val streamed = spark.table("chunk_test")
        .orderBy("doc_id", "chunk_id").collect().map(_.toString).toSeq
      val batch = queries.TextAnalysis.docChunk(spark, sf)
        .collect().map(_.toString).toSeq
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("file-sink round-trip: availableNow parquet sink == batch twin, restart adds nothing") {
    // the one previously-untested streaming surface (r7 verdict #8): a
    // real file SINK — transactional parquet commit log + exactly-once
    // across restarts — not just MemoryStream/memory-sink parity
    def fresh(name: String): String = {
      val d = new java.io.File(System.getProperty("java.io.tmpdir"), name)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      if (d.exists()) rm(d)
      d.getAbsolutePath
    }
    val outDir = fresh("graft_stream_sink_out")
    val ckpt = fresh("graft_stream_sink_ckpt")
    val schema = Tables.documents(spark, sf).schema
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(sf)
      val q = queries.TextAnalysis.docChunkFrame(stream)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination(120000L) finally q.stop()
    }
    runOnce()
    val roundTrip = spark.read.parquet(outDir)
      .orderBy("doc_id", "chunk_id").collect().map(_.toString).toSeq
    val batch = queries.TextAnalysis.docChunk(spark, sf)
      .collect().map(_.toString).toSeq
    assert(roundTrip == batch && roundTrip.nonEmpty)
    // restart against the same checkpoint: source offsets are committed,
    // so the second run must be a no-op (no reprocess, no duplicates)
    runOnce()
    assert(spark.read.parquet(outDir).count() == roundTrip.size.toLong)
  }

  test("streaming CMS counters == batch counters (sketch agg over readStream)") {
    // the count-min counter fold is a stateless projection + grouped
    // count: in complete mode its streaming state is the FIXED 4096
    // counters, so the sketch is streamable by construction — prove it
    val stream = StreamingJobs.readEventsStream(spark, sf).select(col("user_id"))
    val q = queries.Temporal.cmsCounters(stream)
      .writeStream.format("memory").queryName("cms_test")
      .outputMode(OutputMode.Complete)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000L)
      val streamed = spark.table("cms_test")
        .orderBy("d", "b").collect().map(_.toString).toSeq
      val batch = queries.Temporal.cmsCounters(
        Tables.events(spark, sf).select(col("user_id")))
        .orderBy("d", "b").collect().map(_.toString).toSeq
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming quality gate == batch gate (stateless transform over readStream)") {
    val schema = Tables.documents(spark, sf).schema
    // fixture tables are single files, so stream the dir with a glob (the
    // same pattern as StreamingJobs.readEventsStream)
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sf)
    val q = queries.TextAnalysis.qualityGateFrame(stream)
      .writeStream.format("memory").queryName("qgate_test")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000L)
      val streamed = spark.table("qgate_test")
        .orderBy("doc_id").collect().map(_.toString).toSeq
      val batch = queries.TextAnalysis.qualityGate(spark, sf)
        .collect().map(_.toString).toSeq
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup drops injected duplicates (dropDuplicates + watermark)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = StreamingJobs.dedupEvents(df).writeStream
      .format("memory").queryName("dedup_test").outputMode(OutputMode.Append)
      .start()
    try {
      val base = eventRows.take(200).zipWithIndex.map { case ((ts, et, _, v), i) =>
        (i.toLong, ts, et, v)
      }
      // every event twice, duplicates in the same and later batches
      mem.addData(base ++ base.take(100))
      q.processAllAvailable()
      mem.addData(base.drop(100))  // late duplicates of the rest
      q.processAllAvailable()
      val out = spark.table("dedup_test")
      assert(out.count() == 200)
      assert(out.select("event_id").distinct().count() == 200)
    } finally q.stop()
  }

  test("streaming latest-state upsert == batch twin across micro-batches, any order") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "event_id", "event_type", "value")
    val q = StreamingJobs.latestState(df).writeStream
      .format("memory").queryName("latest_test")
      .outputMode(OutputMode.Update).start()
    try {
      val evs = Tables.eventsTs(spark, sf)
        .select("user_id", "ts", "event_id", "event_type", "value")
        .as[(Long, Timestamp, Long, String, Double)].collect().toSeq
      // adversarial replay: reverse event order, split across 3 batches —
      // the upsert must land on the same table as in-order batch
      val rev = evs.reverse
      val third = rev.length / 3
      mem.addData(rev.take(third)); q.processAllAvailable()
      mem.addData(rev.slice(third, 2 * third)); q.processAllAvailable()
      mem.addData(rev.drop(2 * third)); q.processAllAvailable()
      // Update-mode memory sink accumulates every per-batch update;
      // the final state per user is its row with the max n_events
      // (the count strictly increases on every upsert)
      val streamed = spark.table("latest_test").collect()
        .groupBy(_.getAs[Long]("user_id"))
        .map { case (_, rs) => rs.maxBy(_.getAs[Long]("n_events")) }
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("last_ts"),
          r.getAs[Long]("last_event_id"), r.getAs[String]("last_type"),
          r.getAs[Double]("last_value"), r.getAs[Long]("n_events")))
        .toSeq.sortBy(_._1)
      val batch = StreamingJobs.latestState(Tables.eventsTs(spark, sf))
        .orderBy("user_id").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("last_ts"),
          r.getAs[Long]("last_event_id"), r.getAs[String]("last_type"),
          r.getAs[Double]("last_value"), r.getAs[Long]("n_events")))
        .toSeq
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("stream-stream interval join == batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val memE = MemoryStream[(Long, Timestamp, Long, String)]
    val memA = MemoryStream[(Long, Timestamp, Long, String)]
    def frame(m: MemoryStream[(Long, Timestamp, Long, String)]) =
      m.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val q = StreamingJobs.errorContextJoin(frame(memE), frame(memA))
      .writeStream.format("memory").queryName("ssjoin_test")
      .outputMode(OutputMode.Append).start()
    try {
      val evs = Tables.eventsTs(spark, TestSpark.sf)
        .select("event_id", "ts", "user_id", "event_type")
        .as[(Long, Timestamp, Long, String)].collect().toSeq
      memE.addData(evs)
      memA.addData(evs)
      q.processAllAvailable()
      val streamed = spark.table("ssjoin_test")
        .orderBy("err_id", "act_id").collect().map(_.toString).toSeq
      val batchDf = Tables.eventsTs(spark, TestSpark.sf)
      val batch = StreamingJobs.errorContextJoin(batchDf, batchDf)
        .orderBy("err_id", "act_id").collect().map(_.toString).toSeq
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("checkpointed stream restarts exactly-once: no reprocess, no loss") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Files.createTempDirectory("graft_restart").toString
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
    val ev = Tables.eventsTs(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val half1 = ev.filter(col("event_id") % 2 === 0)
    val half2 = ev.filter(col("event_id") % 2 === 1)
    half1.write.parquet(inDir)
    def runOnce(): Unit = {
      val q = spark.readStream.schema(ev.schema).parquet(inDir)
        .select(col("event_id"), col("user_id"), col("value"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination(120000L) finally q.stop()
    }
    runOnce()
    val n1 = spark.read.parquet(outDir).count()
    assert(n1 == half1.count(), s"phase 1 wrote $n1")
    // drop the second half's files into the SAME input dir, restart from
    // the same checkpoint: only the new files may be processed
    val stage = s"$base/stage"
    half2.write.parquet(stage)
    Files.list(Paths.get(stage)).forEach { p =>
      if (p.getFileName.toString.endsWith(".parquet"))
        Files.move(p, Paths.get(inDir, "h2_" + p.getFileName.toString),
          StandardCopyOption.REPLACE_EXISTING)
    }
    runOnce()
    val out = spark.read.parquet(outDir)
    assert(out.count() == ev.count(), "restart lost or duplicated rows")
    assert(out.select("event_id").distinct().count() == ev.count())
    // a third restart with nothing new is a no-op
    runOnce()
    assert(spark.read.parquet(outDir).count() == ev.count())
  }

  test("streaming SCD2 (flatMapGroupsWithState) emits exactly the batch closed-history rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Timestamp)]
    val input = mem.toDF()
      .toDF("o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate")
      .as[StreamingJobs.OrdEv]
    val q = StreamingJobs.scd2Stateful(input).toDF().writeStream
      .format("memory").queryName("scd2_test")
      .outputMode(OutputMode.Append).start()
    try {
      // per-key in-order replay (the changelog contract): global
      // (date, orderkey) order preserves every customer's order, split
      // across 3 micro-batches so runs straddle batch boundaries
      val evs = Tables.orders(spark, sf)
        .select("o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate")
        .as[(Long, Long, String, Timestamp)].collect()
        .sortBy(e => (e._4.getTime, e._2)).toSeq
      val third = evs.length / 3
      mem.addData(evs.take(third)); q.processAllAvailable()
      mem.addData(evs.slice(third, 2 * third)); q.processAllAvailable()
      mem.addData(evs.drop(2 * third)); q.processAllAvailable()
      // batch side reads TIMESTAMP_NTZ → collect() yields LocalDateTime;
      // streamed side carries java.sql.Timestamp — normalize both
      def ms(x: Any): Long = x match {
        case t: Timestamp => t.getTime
        case d: java.time.LocalDateTime => Timestamp.valueOf(d).getTime
      }
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("o_custkey"), r.getAs[Long]("run_id"),
          r.getAs[String]("status"), ms(r.getAs[Any]("valid_from")),
          ms(r.getAs[Any]("valid_to")), r.getAs[Long]("n_orders"))
      val streamed = spark.table("scd2_test").collect().map(key).toSeq.sorted
      val batch = queries.Temporal.scd2OrderStatus(spark, sf)
        .filter(!col("is_current")).collect().map(key).toSeq.sorted
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("streaming last-touch attribution == batch twin, pairs straddle batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Timestamp)]
    val input = mem.toDS()
      .toDF("event_id", "user_id", "event_type", "ts")
      .as[StreamingJobs.AttrEv]
    val q = StreamingJobs.attributionStateful(input).toDF().writeStream
      .format("memory").queryName("attr_test")
      .outputMode(OutputMode.Append).start()
    try {
      // per-key in-order replay: global (ts, kind, event_id) order —
      // kind breaks same-instant ties clicks-first, the batch rule
      val evs = Tables.eventsTs(spark, sf)
        .filter(col("event_type").isin("click", "purchase"))
        .select("event_id", "user_id", "event_type", "ts")
        .as[(Long, Long, String, Timestamp)].collect()
        .sortBy(e => (e._4.getTime, if (e._3 == "click") 0 else 1, e._1))
        .toSeq
      val third = evs.length / 3
      mem.addData(evs.take(third)); q.processAllAvailable()
      mem.addData(evs.slice(third, 2 * third)); q.processAllAvailable()
      mem.addData(evs.drop(2 * third)); q.processAllAvailable()
      def ms(x: Any): Long = x match {
        case t: Timestamp => t.getTime
        case d: java.time.LocalDateTime => Timestamp.valueOf(d).getTime
      }
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
          ms(r.getAs[Any]("ts")),
          Option(r.getAs[java.lang.Long]("click_event_id")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("gap_min")).map(_.toDouble),
          r.getAs[Boolean]("attributed"))
      val streamed = spark.table("attr_test").collect().map(key).toSeq.sorted
      val batch = queries.Temporal.purchaseAttribution(spark, sf)
        .collect().map(key).toSeq.sorted
      assert(streamed.nonEmpty && streamed == batch)
      // the straddle pin: at least one purchase in a LATER batch
      // attributes to a click delivered in an EARLIER one — the keyed
      // state carrying the click across the boundary, not in-batch luck
      val batchOf = evs.zipWithIndex.map { case (e, i) =>
        e._1 -> (if (i < third) 0 else if (i < 2 * third) 1 else 2)
      }.toMap
      val straddled = spark.table("attr_test").collect().exists { r =>
        r.getAs[Boolean]("attributed") && {
          val click = r.getAs[java.lang.Long]("click_event_id").toLong
          batchOf(click) < batchOf(r.getAs[Long]("event_id"))
        }
      }
      assert(straddled, "no attributed pair straddled a batch boundary")
    } finally q.stop()
  }

  test("latest-state upsert state survives a checkpointed restart") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Files.createTempDirectory("graft_latest_restart").toString
    val inDir = s"$base/in"; val ckpt = s"$base/ckpt"
    val ev = Tables.eventsTs(spark, sf)
      .select("user_id", "ts", "event_id", "event_type", "value")
    // phase 1: the EARLY half of every user's history; phase 2: the rest.
    // If the mapGroupsWithState store did not recover from the
    // checkpoint, phase-2 counts would restart from 1 and the final
    // n_events could never reach the batch total.
    val half1 = ev.filter(col("event_id") % 2 === 0)
    val half2 = ev.filter(col("event_id") % 2 === 1)
    half1.write.parquet(inDir)
    val outDir = s"$base/out"
    def runOnce(): Unit = {
      // memory sink can't recover from a checkpoint — foreachBatch is
      // the recovery-capable sink for Update-mode stateful output
      val q = StreamingJobs.latestState(
          spark.readStream.schema(ev.schema).parquet(inDir))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir); ()
        }
        .outputMode(OutputMode.Update)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination(120000L) finally q.stop()
    }
    runOnce()
    val stage = s"$base/stage"
    half2.write.parquet(stage)
    Files.list(Paths.get(stage)).forEach { p =>
      if (p.getFileName.toString.endsWith(".parquet"))
        Files.move(p, Paths.get(inDir, "h2_" + p.getFileName.toString),
          StandardCopyOption.REPLACE_EXISTING)
    }
    runOnce()
    // the sink accumulates every emitted update across both phases:
    // per touched user the max-n_events row is the final state, and it
    // can only reach the two-phase lifetime total if the phase-1 state
    // store was recovered from the checkpoint
    val streamed = spark.read.parquet(outDir).collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (_, rs) => rs.maxBy(_.getAs[Long]("n_events")) }
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("last_event_id"),
        r.getAs[Long]("n_events"))).toSeq.sortBy(_._1)
    val batch = StreamingJobs.latestState(Tables.eventsTs(spark, sf))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("last_event_id"), r.getAs[Long]("n_events"))).toMap
    assert(streamed.nonEmpty)
    streamed.foreach { case (u, lastId, n) =>
      assert(batch(u) == ((lastId, n)), s"user $u diverged after restart")
    }
  }

  test("sliding windows: every event contributes to exactly 2 windows") {
    val n = Tables.eventsTs(spark, sf).count()
    val total = StreamingJobs.sliding6h3h(Tables.eventsTs(spark, sf))
      .agg(sum("n_events")).as[Long].head()
    assert(total == 2 * n)
  }

  test("watermark late-data accounting: streamed drop counter == batch audit") {
    implicit val sqlCtx = spark.sqlContext
    // one row per micro-batch => the stream's watermark advances per
    // event, exactly the audit's per-event high-watermark contract
    def t(s: String) = Timestamp.valueOf(s"2024-03-01 $s:00")
    val arrivals = Seq(               // (arrival order = event_id)
      (0L, t("00:30"), "view", 1L, 1.0),   // first row: no watermark yet
      (1L, t("06:10"), "view", 1L, 1.0),   // advances wm to 05:10
      (2L, t("01:30"), "view", 1L, 1.0),   // window end 02:00 < 05:10 -> DROP
      (3L, t("03:40"), "view", 1L, 1.0),   // end 04:00 < 05:10 -> DROP
      (4L, t("04:30"), "view", 1L, 1.0),   // end 05:00 < 05:10 -> DROP
      (5L, t("05:30"), "view", 1L, 1.0),   // end 06:00 > 05:10 -> kept
      (6L, t("07:00"), "view", 1L, 1.0),   // advances wm to 06:00
      (7L, t("05:15"), "view", 1L, 1.0))   // end 06:00 == wm -> DROP (wm >= end)
    val mem = MemoryStream[(Long, Timestamp, String, Long, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "event_type", "user_id", "value")
    val q = StreamingJobs.tumbling1h(df).writeStream
      .format("memory").queryName("late_audit_test")
      .outputMode(OutputMode.Append).start()
    val dropped =
      try {
        arrivals.foreach { r => mem.addData(r); q.processAllAvailable() }
        q.recentProgress
          .map(_.stateOperators.map(_.numRowsDroppedByWatermark).sum).sum
      } finally q.stop()
    val audit = StreamingJobs.lateAuditCore(spark,
      arrivals.toDF("event_id", "ts", "event_type", "user_id", "value")
        .withColumn("arr_us", col("event_id")),  // arrival clock = injection order
      3600L * 1000000)
    val byWindow = audit.collect()
      .map(r => r.getTimestamp(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    assert(audit.agg(sum("n_late")).head().getLong(0) == 4)
    assert(dropped == 4,
      s"stream dropped $dropped rows, audit says 4")
    assert(byWindow("2024-03-01 01:00:00.0") == ((1L, 1L)))
    assert(byWindow("2024-03-01 03:00:00.0") == ((1L, 1L)))
    assert(byWindow("2024-03-01 04:00:00.0") == ((1L, 1L)))
    assert(byWindow("2024-03-01 05:00:00.0") == ((2L, 1L)))  // 05:30 kept, 05:15 dropped
    assert(byWindow("2024-03-01 00:00:00.0") == ((1L, 0L)))
  }

  test("watermark_delay_curve: 60-minute point == late audit; drops monotone in delay") {
    val curve = StreamingJobs.watermarkDelayCurve(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    val auditTotal = StreamingJobs.eventsLateAudit(spark, sf)
      .agg(sum("n_late")).head().getLong(0)
    assert(curve(60) == auditTotal,
      "the curve's 60-minute point must equal the audit at its default delay")
    assert(curve(240) <= curve(60) && curve(60) <= curve(15) &&
      curve(15) <= curve(5), s"late counts must fall as delay grows: $curve")
    // jitter bounded by delay => nothing can be late
    assert(curve(240) == 0, "4h delay covers the 3h jitter entirely")
    assert(curve(5) > 0, "5m delay under 3h jitter must drop rows")
  }

  test("streaming decontamination gate: 3-micro-batch replay == batch delta gate ledger") {
    // the LIVE ingest gate: each micro-batch of incoming docs is scored
    // against the frozen eval split via foreachBatch(decontGateBatch) —
    // no state store, so the union over batches must equal the batch
    // semanticDecontaminationDelta ledger (rollup columns aside) when
    // the replayed docs are exactly its shard
    implicit val sqlCtx = spark.sqlContext
    // the batch gate's shard: train-split docs with doc_id % 10 == 9
    // (train = content-hash bucket >= 10, the splitAssigned convention)
    val shard = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 9 &&
        queries.Temporal.bucketCol(
          md5(trim(regexp_replace(lower(col("text")), "\\W+", " ")))) >= 10)
      .join(Tables.embeddings(spark, sf),
        col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text"), col("embedding"))
      .as[(Long, String, Seq[Float])].collect().toSeq
    assert(shard.size > 10, s"degenerate shard: ${shard.size}")
    def key(r: org.apache.spark.sql.Row): (Long, Long, Long, Double, Long, Boolean) =
      (r.getAs[Long]("train_doc"), r.getAs[Long]("n_tokens"),
        if (r.isNullAt(r.fieldIndex("eval_doc"))) -1L else r.getAs[Long]("eval_doc"),
        if (r.isNullAt(r.fieldIndex("cosine"))) -99.0 else r.getAs[Double]("cosine"),
        r.getAs[Long]("n_eval_dups"), r.getAs[Boolean]("rejected"))
    val want = queries.Curation.semanticDecontaminationDelta(spark, sf)
      .collect().map(key).toSet
    assert(want.size == shard.size,
      "batch ledger must cover the whole shard (top-N unclipped at this sf)")
    val got = scala.collection.concurrent.TrieMap
      .empty[(Long, Long, Long, Double, Long, Boolean), Unit]
    val mem = MemoryStream[(Long, String, Seq[Float])]
    val q = mem.toDF().toDF("doc_id", "text", "embedding")
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          queries.Curation.decontGateBatch(spark, sf, batch)
            .collect().foreach(r => got.put(key(r), ()))
      }.start()
    try {
      val third = shard.size / 3
      mem.addData(shard.take(third)); q.processAllAvailable()
      mem.addData(shard.slice(third, 2 * third)); q.processAllAvailable()
      mem.addData(shard.drop(2 * third)); q.processAllAvailable()
      assert(got.keySet.toSet == want)
      // the gate is non-vacuous on the fixture: some doc has a same-cell
      // eval neighbor (a real cosine, not the null sentinel)
      assert(want.exists(_._4 > -99.0))
    } finally q.stop()
  }

  test("live dedup gate: 3-batch replay == one-batch ledger (id-ordered arrival)") {
    // the LIVE near-dup admit gate: each micro-batch probes the standing
    // base index plus everything that arrived before it — with arrival
    // in doc_id order (the batch twin's definition of "earlier"), the
    // union over batches must row-equal the one-batch replay ledger
    implicit val sqlCtx = spark.sqlContext
    val shard = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 9)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(shard.size > 10, s"degenerate shard: ${shard.size}")
    def key(r: org.apache.spark.sql.Row): (Long, Long, Long, Double, Long, Boolean) =
      (r.getAs[Long]("in_doc"), r.getAs[Long]("n_shingles"),
        if (r.isNullAt(r.fieldIndex("dup_of"))) -1L else r.getAs[Long]("dup_of"),
        if (r.isNullAt(r.fieldIndex("jaccard"))) -1.0 else r.getAs[Double]("jaccard"),
        r.getAs[Long]("n_dups"), r.getAs[Boolean]("rejected"))
    val want = queries.Dedup.dedupGateReplay(spark, sf).collect().map(key).toSet
    assert(want.size == shard.size, "ledger must cover the whole shard")
    val got = scala.collection.concurrent.TrieMap
      .empty[(Long, Long, Long, Double, Long, Boolean), Unit]
    var arrived = Seq.empty[(Long, String)]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val prior = if (arrived.isEmpty) None
            else Some(arrived.toDF("doc_id", "text"))
          queries.Dedup.dedupGateBatch(spark, sf, batch, 10L, prior)
            .collect().foreach(r => got.put(key(r), ()))
          arrived = arrived ++
            batch.select("doc_id", "text").as[(Long, String)].collect().toSeq
          ()
      }.start()
    try {
      val third = shard.size / 3
      mem.addData(shard.take(third)); q.processAllAvailable()
      mem.addData(shard.slice(third, 2 * third)); q.processAllAvailable()
      mem.addData(shard.drop(2 * third)); q.processAllAvailable()
      assert(got.keySet.toSet == want)
      // non-vacuous: the generator's injected dup pairs straddle the
      // shard boundary (id % 100 == 99 is in the shard, id-1 in base),
      // so the fixture must reject through the BASE leg
      assert(want.exists(_._6), "no rejection on a fixture with injected dups")
    } finally q.stop()
  }

  test("dedup gate: first-occurrence-keeps across base, same-batch, and prior-batch legs") {
    // synthetic incoming docs drive the three candidate legs the fixture
    // replay cannot (its injected pairs all straddle the shard boundary):
    // same-batch earlier id, prior-batch arrival, and a base collision —
    // and a rejected doc still blocks its later copies (first-occurrence
    // convention: earlier ARRIVED, not earlier ADMITTED)
    val unique = "zzqq wwxx yyvv uupp ttrr ssnn qqmm"
    val baseText = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 =!= 9).orderBy("doc_id")
      .select("text").as[String].head()
    val b1 = Seq((9000001L, unique), (9000002L, unique)).toDF("doc_id", "text")
    val r1 = queries.Dedup.dedupGateBatch(spark, sf, b1, 10L, None)
      .collect().map(r => r.getAs[Long]("in_doc") -> r).toMap
    assert(!r1(9000001L).getAs[Boolean]("rejected"), "first occurrence admitted")
    assert(r1(9000002L).getAs[Boolean]("rejected"))
    assert(r1(9000002L).getAs[Long]("dup_of") == 9000001L)
    assert(r1(9000002L).getAs[Double]("jaccard") == 1.0)
    val b2 = Seq((9000003L, unique), (9000004L, baseText)).toDF("doc_id", "text")
    val r2 = queries.Dedup.dedupGateBatch(spark, sf, b2, 10L, Some(b1))
      .collect().map(r => r.getAs[Long]("in_doc") -> r).toMap
    // prior-batch leg: BOTH earlier copies match (the rejected 9000002
    // included); best = smallest id at the tied jaccard
    assert(r2(9000003L).getAs[Boolean]("rejected"))
    assert(r2(9000003L).getAs[Long]("dup_of") == 9000001L)
    assert(r2(9000003L).getAs[Long]("n_dups") == 2L)
    // base leg: an incoming copy of a standing corpus doc is rejected
    assert(r2(9000004L).getAs[Boolean]("rejected"))
    assert(r2(9000004L).getAs[Double]("jaccard") == 1.0)
  }

  test("one-stream live ingest: decont + dedup + drift + quality kernels compose per micro-batch") {
    // THE nightly ingest job: ONE stream of (doc_id, text, embedding)
    // rows, one foreachBatch running all four live kernels on the same
    // micro-batch frame — each kernel's union/fold over 3 batches must
    // equal that kernel fed the whole shard as one batch (state
    // threading and sink reuse compose; no kernel perturbs another
    // through the shared session caches or substrate sinks)
    implicit val sqlCtx = spark.sqlContext
    val shard = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 9)
      .join(Tables.embeddings(spark, sf), col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text"), col("embedding"))
      .as[(Long, String, Seq[Float])].collect().toSeq.sortBy(_._1)
    assert(shard.size > 10, s"degenerate shard: ${shard.size}")
    val fullDf = shard.toDF("doc_id", "text", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    val wantDecont = rows(queries.Curation.decontGateBatch(spark, sf, fullDf))
    val wantDedup = rows(queries.Dedup.dedupGateBatch(spark, sf,
      fullDf.select("doc_id", "text"), 10L, None))
    val wantDrift = rows(queries.Similarity.ingestDriftBatch(spark, sf,
      fullDf.select(col("doc_id").as("vec_id"), col("embedding")))._2)
    val wantQual = rows(queries.TextAnalysis.qualityDriftBatch(spark, sf,
      fullDf.select("doc_id", "text"))._2)
    val gotDecont = scala.collection.concurrent.TrieMap.empty[String, Unit]
    val gotDedup = scala.collection.concurrent.TrieMap.empty[String, Unit]
    var gotDrift = Set.empty[String]
    var gotQual = Set.empty[String]
    var driftState = Map.empty[Int, Long]
    var qualState = Map.empty[Long, Long]
    var arrived = Seq.empty[(Long, String)]
    val mem = MemoryStream[(Long, String, Seq[Float])]
    val q = mem.toDF().toDF("doc_id", "text", "embedding")
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val docs = batch.select("doc_id", "text")
          queries.Curation.decontGateBatch(spark, sf, batch)
            .collect().foreach(r => gotDecont.put(r.toString, ()))
          val prior = if (arrived.isEmpty) None
            else Some(arrived.toDF("doc_id", "text"))
          queries.Dedup.dedupGateBatch(spark, sf, docs, 10L, prior)
            .collect().foreach(r => gotDedup.put(r.toString, ()))
          val (ds2, driftLed) = queries.Similarity.ingestDriftBatch(spark, sf,
            batch.select(col("doc_id").as("vec_id"), col("embedding")),
            driftState)
          driftState = ds2; gotDrift = driftLed.collect().map(_.toString).toSet
          val (qs2, qualLed) = queries.TextAnalysis.qualityDriftBatch(
            spark, sf, docs, qualState)
          qualState = qs2; gotQual = qualLed.collect().map(_.toString).toSet
          arrived = arrived ++
            docs.as[(Long, String)].collect().toSeq
          ()
      }.start()
    try {
      val third = shard.size / 3
      mem.addData(shard.take(third)); q.processAllAvailable()
      mem.addData(shard.slice(third, 2 * third)); q.processAllAvailable()
      mem.addData(shard.drop(2 * third)); q.processAllAvailable()
      assert(gotDecont.keySet.toSet == wantDecont, "decont gate diverged")
      assert(gotDedup.keySet.toSet == wantDedup, "dedup gate diverged")
      assert(gotDrift == wantDrift, "drift monitor diverged")
      assert(gotQual == wantQual, "quality monitor diverged")
    } finally q.stop()
  }

  test("live quality monitor: multi-batch band fold == batch quality_drift, empty batch included") {
    // the quality axis of the live readout: per micro-batch, score the
    // incoming docs with the textQuality kernel, fold the ≤21 band
    // counts into the cumulative histogram, re-emit the TV ledger —
    // after the last batch it must row-equal the batch monitor, and an
    // empty micro-batch must not move it
    implicit val sqlCtx = spark.sqlContext
    val shard = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 9)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    assert(shard.size > 10, s"degenerate shard: ${shard.size}")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("band"), r.getAs[Double]("band_lo"),
        r.getAs[Long]("n_corpus"), r.getAs[Long]("n_shard"),
        r.getAs[Long]("corpus_ppm"), r.getAs[Long]("shard_ppm"),
        r.getAs[Long]("tv_ppm"))
    val want = queries.TextAnalysis.qualityDrift(spark, sf).collect().map(key).toSeq
    var state = Map.empty[Long, Long]
    val ledgers = scala.collection.mutable.ArrayBuffer.empty[Seq[
      (Long, Double, Long, Long, Long, Long, Long)]]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val (next, ledger) =
            queries.TextAnalysis.qualityDriftBatch(spark, sf, batch, state)
          state = next
          ledgers += ledger.collect().map(key).toSeq
          ()
      }.start()
    try {
      val third = shard.size / 3
      mem.addData(shard.take(third)); q.processAllAvailable()
      val afterFirst = ledgers.last
      mem.addData(Seq.empty[(Long, String)]); q.processAllAvailable()
      assert(ledgers.size >= 2 && ledgers.last == afterFirst,
        "an empty micro-batch must not move the cumulative ledger")
      mem.addData(shard.slice(third, 2 * third)); q.processAllAvailable()
      mem.addData(shard.drop(2 * third)); q.processAllAvailable()
      assert(ledgers.last == want,
        "cumulative live ledger != batch monitor on the same shard")
      assert(state.values.sum == shard.size.toLong)
    } finally q.stop()
  }

  test("live drift monitor: multi-batch occupancy fold == batch ingest_drift, empty batch included") {
    // the LIVE twin of the batch occupancy monitor: per micro-batch,
    // ingestDriftBatch places the incoming vectors, folds the per-cell
    // counts into the threaded cumulative state, and re-emits the TV
    // ledger — after the last batch the ledger must ROW-EQUAL the batch
    // monitor on the same shard, and an EMPTY micro-batch must leave
    // the ledger exactly where it was
    implicit val sqlCtx = spark.sqlContext
    val shard = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 10 === 9)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    assert(shard.size > 10, s"degenerate shard: ${shard.size}")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("cell"), r.getAs[Long]("n_corpus"),
        r.getAs[Long]("n_shard"), r.getAs[Long]("corpus_ppm"),
        r.getAs[Long]("shard_ppm"), r.getAs[Long]("tv_ppm"))
    val want = queries.Similarity.ingestDrift(spark, sf).collect().map(key).toSeq
    var state = Map.empty[Int, Long]
    val ledgers = scala.collection.mutable.ArrayBuffer.empty[Seq[
      (Long, Long, Long, Long, Long, Long)]]
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding")
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val (next, ledger) =
            queries.Similarity.ingestDriftBatch(spark, sf, batch, state)
          state = next
          ledgers += ledger.collect().map(key).toSeq
          ()
      }.start()
    try {
      val third = shard.size / 3
      mem.addData(shard.take(third)); q.processAllAvailable()
      val afterFirst = ledgers.last
      // empty micro-batch: state and ledger unchanged
      mem.addData(Seq.empty[(Long, Seq[Float])]); q.processAllAvailable()
      assert(ledgers.size >= 2 && ledgers.last == afterFirst,
        "an empty micro-batch must not move the cumulative ledger")
      mem.addData(shard.slice(third, 2 * third)); q.processAllAvailable()
      mem.addData(shard.drop(2 * third)); q.processAllAvailable()
      assert(ledgers.last == want,
        "cumulative live ledger != batch monitor on the same shard")
      // the fold really accumulated: total shard mass == |shard|
      assert(state.values.sum == shard.size.toLong)
      // intermediate ledgers carry intermediate mass (monotone fold)
      assert(afterFirst.map(_._3).sum < want.map(_._3).sum)
    } finally q.stop()
  }
}
