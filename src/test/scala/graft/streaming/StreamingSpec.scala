package graft.streaming

import graft.SparkTestBase
import graft.api.{functions => gf}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Q11 (SURVEY.md §2.5): streaming windowed sketches equal the batch result
  * over the same data — the sketches' merge associativity means incremental
  * stateful aggregation and one-shot batch aggregation converge to the same
  * final state for SummaryStats (exact) and to invariant-identical sketches
  * for t-digest/space-saving (merge-tree dependent, checked on exact fields
  * and at a forced identical merge tree). */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def eventRows(): Seq[(Timestamp, Double, String, Long)] = {
    // go through Tables.load so ts is TimestampType whatever parquet
    // encoding the driver last generated (long nanos / NTZ micros)
    val df = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    df.select(col("ts"), col("value"), col("event_type"), col("user_id"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1),
        r.getString(2), r.getLong(3))).toSeq
  }

  test("streaming windowed sketches == batch over the same rows (Q11)") {
    val rows = eventRows()
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Double, String, Long)]
    val sdf = stream.toDF().toDF("ts", "value", "event_type", "user_id")

    val agg = StreamingSketches.windowedSketches(
      sdf, "ts", "1 hour", "value", "event_type")
    val q = agg.writeStream.format("memory")
      .queryName("win_sketches").outputMode("complete").start()
    try {
      // feed in three micro-batches to force incremental state merges
      val (a, rest) = rows.splitAt(rows.length / 3)
      val (b, c) = rest.splitAt(rest.length / 3)
      Seq(a, b, c).foreach { chunk => stream.addData(chunk); q.processAllAvailable() }

      val streamed = spark.table("win_sketches")
        .select(col("window.start").as("ws"),
          gf.stats_count(col("value_stats")).as("cnt"),
          gf.stats_sum(col("value_stats")).as("sum"),
          gf.tdigest_size(col("value_tdigest")).as("td_n"),
          gf.tdigest_min(col("value_tdigest")).as("td_min"),
          gf.tdigest_max(col("value_tdigest")).as("td_max"),
          gf.tdigest_quantile(col("value_tdigest"), 0.5).as("td_p50"))
        .collect().map(r => r.getAs[Timestamp]("ws") ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
            r.getDouble(5), r.getDouble(6))).toMap

      val batchDf = rows.toDF("ts", "value", "event_type", "user_id")
      val batch = StreamingSketches.windowedSketches(
        batchDf, "ts", "1 hour", "value", "event_type")
        .select(col("window.start").as("ws"),
          gf.stats_count(col("value_stats")).as("cnt"),
          gf.stats_sum(col("value_stats")).as("sum"),
          gf.tdigest_size(col("value_tdigest")).as("td_n"),
          gf.tdigest_min(col("value_tdigest")).as("td_min"),
          gf.tdigest_max(col("value_tdigest")).as("td_max"),
          gf.tdigest_quantile(col("value_tdigest"), 0.5).as("td_p50"))
        .collect().map(r => r.getAs[Timestamp]("ws") ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
            r.getDouble(5), r.getDouble(6))).toMap

      assert(streamed.keySet == batch.keySet, "window sets differ")
      streamed.keySet.foreach { w =>
        val (sc, ss, sn, smin, smax, sp50) = streamed(w)
        val (bc, bs, bn, bmin, bmax, bp50) = batch(w)
        assert(sc == bc && sn == bn, s"counts differ in $w")
        assert(math.abs(ss - bs) < 1e-6 * math.max(1.0, math.abs(bs)), s"sums differ in $w")
        assert(smin == bmin && smax == bmax, s"min/max differ in $w")
        // quantile: merge-tree dependent; must stay within the rank
        // tolerance of the exact per-window median
        assert(math.abs(sp50 - bp50) <= 0.1 * (bmax - bmin), s"p50 far off in $w")
      }
    } finally q.stop()
  }

  test("streaming windowed exact_sum is BIT-identical to batch") {
    // the stats-sum equivalence above needs a 1e-6 tolerance (fp sums are
    // merge-tree dependent); exact_sum's streaming state merges must yield
    // the same bits as one batch pass — that is its contract
    val rows = eventRows()
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Double, String, Long)]
    val sdf = stream.toDF().toDF("ts", "value", "event_type", "user_id")
    val agg = sdf.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(gf.exact_sum(col("value")).as("es"))
    val q = agg.writeStream.format("memory")
      .queryName("es_stream").outputMode("complete").start()
    try {
      val (a, rest) = rows.splitAt(rows.length / 3)
      val (b, c) = rest.splitAt(rest.length / 3)
      Seq(a, b, c).foreach { chunk => stream.addData(chunk); q.processAllAvailable() }
      def key(r: org.apache.spark.sql.Row) =
        (r.getStruct(0).getAs[Timestamp](0), r.getString(1))
      val streamed = spark.table("es_stream").collect()
        .map(r => key(r) -> r.getDouble(2)).toMap
      val batch = rows.toDF("ts", "value", "event_type", "user_id")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(gf.exact_sum(col("value")).as("es"))
        .collect().map(r => key(r) -> r.getDouble(2)).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (k, v) =>
        assert(java.lang.Double.doubleToRawLongBits(v) ==
          java.lang.Double.doubleToRawLongBits(batch(k)), s"bits differ at $k")
      }
    } finally q.stop()
  }

  test("streaming top-k with watermark+append finalizes windows") {
    val rows = eventRows().sortBy(_._1.getTime)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Double, String, Long)]
    val sdf = stream.toDF().toDF("ts", "value", "event_type", "user_id")
    val agg = StreamingSketches.windowedSketches(
      sdf, "ts", "1 hour", "value", "event_type",
      watermark = Some("0 seconds"))
    val q = agg.writeStream.format("memory")
      .queryName("win_append").outputMode("append").start()
    try {
      stream.addData(rows)
      q.processAllAvailable()
      // push watermark past the last window with a far-future row, then emit
      val last = rows.last._1.getTime
      stream.addData(Seq((new Timestamp(last + 7200_000L), 0.0, "flush", 0L)))
      q.processAllAvailable()
      val out = spark.table("win_append")
      assert(out.count() > 0, "append mode should emit finalized windows")
      val checked = out.select(
        gf.ss_topk_string(col("item_topk"), 3).as("top")).collect()
      checked.foreach { r =>
        val arr = r.getSeq[org.apache.spark.sql.Row](0)
        assert(arr.nonEmpty && arr.size <= 3)
        // counts are sorted descending in a topk list
        val counts = arr.map(_.getLong(1))
        assert(counts == counts.sortBy(-_))
      }
    } finally q.stop()
  }

  test("dedupStream emits only first occurrence per content across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val sdf = stream.toDF().toDF("id", "text")
    val out = StreamingSketches.dedupStream(sdf, "text")
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      stream.addData(Seq((1L, "alpha beta"), (2L, "gamma")))
      q.processAllAvailable()
      // later batches repeat content (incl. normalization-equal) + one new doc
      stream.addData(Seq((3L, "ALPHA  beta"), (4L, "gamma"), (5L, "delta")))
      q.processAllAvailable()
      stream.addData(Seq((6L, "alpha beta")))
      q.processAllAvailable()
      val rows = spark.table("dedup_stream").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      // 3/4/6 suppressed (seen in earlier batches)
      assert(rows.map(_._1).toSeq == Seq(1L, 2L, 5L), rows.mkString(","))
    } finally q.stop()
  }

  test("dedupStream hash-key and full-text-key modes agree") {
    implicit val sqlCtx = spark.sqlContext
    def run(byHash: Boolean): Seq[Long] = {
      val stream = MemoryStream[(Long, String)]
      val out = StreamingSketches.dedupStream(
        stream.toDF().toDF("id", "text"), "text", keyByHash = byHash)
      val name = s"dedup_mode_$byHash"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        stream.addData(Seq((1L, "alpha"), (2L, "beta")))
        q.processAllAvailable()
        stream.addData(Seq((3L, "ALPHA"), (4L, "gamma")))
        q.processAllAvailable()
      } finally q.stop()
      val ids = spark.table(name).orderBy("id")
        .collect().map(_.getLong(0)).toSeq
      spark.sql(s"DROP TABLE IF EXISTS $name")
      ids
    }
    assert(run(byHash = true) == Seq(1L, 2L, 4L))
    assert(run(byHash = false) == Seq(1L, 2L, 4L))
  }

  test("dedupStream event-time TTL: in-window dups suppressed, expiry re-admits") {
    // event-time eviction: deterministic (watermark-driven), no wall-clock
    // sleeps — a processing-time timeout would also make the engine run
    // batches forever (shouldRunAnotherBatch always true), hanging
    // processAllAvailable
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    val stream = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingSketches.dedupStream(
      stream.toDF().toDF("id", "ts", "text").withWatermark("ts", "0 seconds"),
      "text", ttl = Some("1 hour"))
    val q = out.writeStream.format("memory").queryName("dedup_ttl")
      .outputMode("append").start()
    try {
      stream.addData(Seq((1L, new Timestamp(t0), "alpha")))
      q.processAllAvailable() // watermark -> t0; alpha expires at t0+1h
      // in-window duplicate: suppressed (wm still < t0+1h)
      stream.addData(Seq((2L, new Timestamp(t0 + 60_000L), "alpha"),
        (3L, new Timestamp(t0 + 60_000L), "beta")))
      q.processAllAvailable()
      assert(spark.table("dedup_ttl").orderBy("id")
        .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
      // advance the watermark past alpha's refreshed deadline (t0+1m+1h)
      stream.addData(Seq((4L, new Timestamp(t0 + 7_200_000L), "gamma")))
      q.processAllAvailable() // timeout fires: alpha (and beta) evicted
      // alpha re-admitted after event-time expiry
      stream.addData(Seq((5L, new Timestamp(t0 + 7_260_000L), "alpha")))
      q.processAllAvailable()
      val ids = spark.table("dedup_ttl").orderBy("id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(1L, 3L, 4L, 5L), s"got $ids")
    } finally q.stop()
    spark.sql("DROP TABLE IF EXISTS dedup_ttl")
  }

  test("dedupStream works on batch frames too") {
    import spark.implicits._
    val df = Seq((1L, "x y"), (2L, "x  Y"), (3L, "z")).toDF("id", "text")
    val got = StreamingSketches.dedupStream(df, "text")
      .orderBy("id").as[(Long, String)].collect()
    // same-batch duplicate winner is partition-order dependent: one of 1/2
    assert(got.length == 2 && got.map(_._1).contains(3L)
      && Set(1L, 2L).contains(got.map(_._1).min))
  }

  test("streaming sessionize (watermark+append) == batch sessions") {
    val rows = eventRows().sortBy(_._1.getTime)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Double, String, Long)]
    val sdf = stream.toDF().toDF("ts", "value", "event_type", "user_id")
    val agg = StreamingSketches.sessionize(
      sdf, "ts", "2 hours", "value", Seq("user_id"),
      watermark = Some("0 seconds"))
    val q = agg.writeStream.format("memory")
      .queryName("sess_append").outputMode("append").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      Seq(a, b).foreach { chunk => stream.addData(chunk); q.processAllAvailable() }
      // far-future flush row pushes the watermark past every real session
      val last = rows.last._1.getTime
      stream.addData(Seq((new Timestamp(last + 86400_000L), 0.0, "flush", -1L)))
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("user_id"), r.getAs[Timestamp]("first_ts").getTime,
          r.getAs[Timestamp]("last_ts").getTime, r.getAs[Long]("n_events"))
      val streamed = spark.table("sess_append")
        .where(col("user_id") >= 0).collect().map(key).toSet
      val batch = StreamingSketches.sessionize(
          rows.toDF("ts", "value", "event_type", "user_id"),
          "ts", "2 hours", "value", Seq("user_id"))
        .collect().map(key).toSet
      assert(streamed == batch,
        s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("sessionize on batch: session bounds respect the gap") {
    import spark.implicits._
    val t0 = 1700000000000L
    val df = Seq(
      (new Timestamp(t0), 1.0),
      (new Timestamp(t0 + 7_200_000L), 2.0), // exactly 2h later: MERGES
                                             // (session_window is end-inclusive)
      (new Timestamp(t0 + 14_400_001L), 3.0), // 2h + 1ms after previous: splits
      (new Timestamp(t0 + 14_460_001L), 4.0)).map { case (ts, v) => (ts, v, 7L) }
      .toDF("ts", "value", "user_id")
    val got = StreamingSketches.sessionize(df, "ts", "2 hours", "value", Seq("user_id"))
      .orderBy("first_ts")
      .select("n_events", "first_ts", "last_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime))
    assert(got.toSeq == Seq((2L, t0, t0 + 7_200_000L),
      (2L, t0 + 14_400_001L, t0 + 14_460_001L)))
  }

  test("file readStream (Tables.loadStream): sessionize + windowed sketches hash-match batch") {
    // the REAL file-source path: events parquet streamed via readStream in
    // multiple micro-batches (maxFilesPerTrigger=1), per-batch ts
    // normalization, watermark + append — sink rows must equal the batch
    // twin exactly on every deterministic field
    val base = java.nio.file.Files.createTempDirectory("graft_fstream").toString
    val evNorm = graft.sources.Tables.load(
      spark, "/root/testdata/sf0.001", "events")
    evNorm.coalesce(1).write.parquet(s"$base/events.parquet")
    val maxTs = evNorm.agg(max("ts")).head().getTimestamp(0)
    // a far-future flush file pushes the watermark past every real window
    Thread.sleep(1100) // distinct mod time → deterministic file order
    evNorm.limit(1)
      .withColumn("ts", lit(new Timestamp(maxTs.getTime + 365L * 86400L * 1000L)))
      .withColumn("user_id", lit(-1L))
      .withColumn("event_type", lit("flush"))
      .coalesce(1).write.mode("append").parquet(s"$base/events.parquet")

    val batch = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    def fileStream() = graft.sources.Tables.loadStream(spark, base, "events",
      Map("maxFilesPerTrigger" -> "1", "latestFirst" -> "false"))

    // --- sessionize ---
    val sq = StreamingSketches.sessionize(fileStream(), "ts", "2 hours",
        "value", Seq("user_id"), watermark = Some("0 seconds"))
      .writeStream.format("memory").queryName("file_sess")
      .outputMode("append").start()
    try { sq.processAllAvailable() } finally sq.stop()
    def sessKey(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("user_id"), r.getAs[Timestamp]("first_ts").getTime,
        r.getAs[Timestamp]("last_ts").getTime, r.getAs[Long]("n_events"),
        math.round(gfStatsSum(r) * 10000) / 10000.0)
    def gfStatsSum(r: org.apache.spark.sql.Row): Double = r.getAs[Double]("sum_v")
    val streamedSess = spark.table("file_sess")
      .where(col("user_id") >= 0)
      .select(col("user_id"), col("first_ts"), col("last_ts"), col("n_events"),
        gf.stats_sum(col("value_stats")).as("sum_v"))
      .collect().map(sessKey).toSet
    val batchSess = StreamingSketches.sessionize(batch, "ts", "2 hours",
        "value", Seq("user_id"))
      .select(col("user_id"), col("first_ts"), col("last_ts"), col("n_events"),
        gf.stats_sum(col("value_stats")).as("sum_v"))
      .collect().map(sessKey).toSet
    assert(streamedSess == batchSess,
      s"missing=${(batchSess -- streamedSess).take(3)} " +
        s"extra=${(streamedSess -- batchSess).take(3)}")
    assert(streamedSess.nonEmpty)

    // --- windowed sketches ---
    val wq = StreamingSketches.windowedSketches(fileStream(), "ts", "1 hour",
        "value", "event_type", watermark = Some("0 seconds"))
      .writeStream.format("memory").queryName("file_win")
      .outputMode("append").start()
    try { wq.processAllAvailable() } finally wq.stop()
    def winKey(r: org.apache.spark.sql.Row) =
      (r.getAs[Timestamp]("ws").getTime, r.getAs[Long]("cnt"),
        math.round(r.getAs[Double]("sum_v") * 10000) / 10000.0,
        r.getAs[Double]("mn"), r.getAs[Double]("mx"))
    def winCols(df: org.apache.spark.sql.DataFrame) = df.select(
      col("window.start").as("ws"),
      gf.stats_count(col("value_stats")).as("cnt"),
      gf.stats_sum(col("value_stats")).as("sum_v"),
      gf.stats_min(col("value_stats")).as("mn"),
      gf.stats_max(col("value_stats")).as("mx"))
    val streamedWin = winCols(spark.table("file_win"))
      .where(col("ws") <= lit(maxTs))
      .collect().map(winKey).toSet
    val batchWin = winCols(StreamingSketches.windowedSketches(batch, "ts",
        "1 hour", "value", "event_type"))
      .collect().map(winKey).toSet
    assert(streamedWin == batchWin,
      s"missing=${(batchWin -- streamedWin).take(3)} " +
        s"extra=${(streamedWin -- batchWin).take(3)}")
    assert(streamedWin.nonEmpty)
  }

  test("stateless curation kernels stream per-row: strip/chunk/domain/pii ≡ batch") {
    // the scan-side curation expressions carry no state, so they must run
    // unchanged on a readStream and emit exactly the batch rows (append
    // mode, no watermark needed)
    val base = java.nio.file.Files.createTempDirectory("graft_cstream").toString
    val docsB = spark.read.parquet(sf("documents"))
    docsB.coalesce(2).write.parquet(s"$base/documents.parquet")
    def curate(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      graft.ops.Text.stripHtml(concat(lit("<p>"), col("text"),
        lit("</p><script>x()</script> &amp; t"))).as("clean"),
      graft.ops.Web.registrableDomain(
        concat(lit("www.s"), (col("doc_id") % 7).cast("string"),
          lit(".co.uk"))).as("domain"),
      gf.pii_stats(col("text")).getField("n_emails").as("pii_emails"),
      graft.ops.Text.chunk(col("text"), 150, 30).as("chunks"))
    val q = curate(graft.sources.Tables.loadStream(spark, base, "documents",
        Map("maxFilesPerTrigger" -> "1")))
      .writeStream.format("memory").queryName("cur_stream")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("cur_stream")
    val batch = curate(spark.read.parquet(s"$base/documents.parquet"))
    assert(streamed.count() == docsB.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("round-8 scan-side signals stream per-row: normalize/script/deflate ≡ batch") {
    val base = java.nio.file.Files.createTempDirectory("graft_sstream").toString
    val docsB = spark.read.parquet(sf("documents"))
    docsB.coalesce(2).write.parquet(s"$base/documents.parquet")
    def score(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      gf.normalize_text(concat(lit("  MIX  "), col("text"))).as("norm"),
      gf.script_stats(translate(col("text"), "ae", "αб"))
        .getField("main_script").as("script"),
      gf.deflate_ratio(col("text")).as("zr"),
      gf.unicode_normalize(col("text"), "nfkc").as("nfkc"))
    val q = score(graft.sources.Tables.loadStream(spark, base, "documents",
        Map("maxFilesPerTrigger" -> "1")))
      .writeStream.format("memory").queryName("sig_stream")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("sig_stream")
    val batch = score(spark.read.parquet(s"$base/documents.parquet"))
    assert(streamed.count() == docsB.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming windowed per-script source top-k (update mode) ≡ batch") {
    // closes the round-8 loop: a SCAN-SIDE signal (script_stats) feeding
    // STATEFUL windowed Space-Saving state, through the real file
    // readStream protocol in update mode. Synthetic event-time from
    // doc_id; scripts made non-trivial by transliterating vowels; SS
    // capacity 64 ≥ 20 sources → exact counts, so streamed final state
    // must EQUAL batch (set equality per (window, script) key).
    val base = java.nio.file.Files.createTempDirectory("graft_stopk").toString
    val docsB = spark.read.parquet(sf("documents"))
    docsB.coalesce(3).write.parquet(s"$base/documents.parquet")
    def aggOf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("source"),
        // flip every third doc's MAJORITY script so the group key is real
        gf.script_stats(when(col("doc_id") % 3 === 0,
            translate(col("text"), "abcdefghijklmnopqrstuvwxyz",
              "αβγδεζηθικλμνξοπρστυφχψωαβ"))
          .otherwise(col("text")))
          .getField("main_script").as("script"),
        timestamp_millis(lit(1700000000000L) +
          (col("doc_id") % 6) * 3600000L).as("ts"))
      .groupBy(window(col("ts"), "2 hours"), col("script"))
      .agg(count(lit(1)).as("n"),
        gf.ss_topk_agg(col("source"), lit(1L), 64).as("topk"))
    val q = aggOf(graft.sources.Tables.loadStream(spark, base, "documents",
        Map("maxFilesPerTrigger" -> "1")))
      .writeStream.format("memory").queryName("script_topk")
      .outputMode("update").start()
    try { q.processAllAvailable() } finally q.stop()
    def finalize(df: org.apache.spark.sql.DataFrame) = df
      .select(col("window.start").as("ws"), col("script"), col("n"),
        gf.ss_topk_string(col("topk"), 5).as("top"))
      .collect()
      .map { r =>
        val top = r.getSeq[org.apache.spark.sql.Row](3)
          .map(t => (t.getString(0), t.getLong(1), t.getLong(2))).toSet
        (r.getAs[java.sql.Timestamp](0), r.getString(1)) ->
          ((r.getLong(2), top))
      }
    // update mode emits one row per key per refining micro-batch; n is
    // strictly increasing per key, so the final state is the max-n row
    val streamed = finalize(spark.table("script_topk"))
      .groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._2._1)._2 }
    val batch = finalize(aggOf(
      spark.read.parquet(s"$base/documents.parquet"))).toMap
    assert(streamed.keySet == batch.keySet, "window×script key sets differ")
    streamed.foreach { case (k, (n, top)) =>
      assert(n == batch(k)._1, s"count differs for $k")
      assert(top == batch(k)._2, s"top-k differs for $k: $top vs ${batch(k)._2}")
    }
    // the run must actually have exercised multiple scripts and windows
    assert(streamed.keySet.map(_._2).size >= 2)
    assert(streamed.keySet.map(_._1).size >= 2)
  }

  test("round-9 scan-side transforms stream per-row: markdown/FIM/readability ≡ batch") {
    // stripMarkdown, fimTransform, and readability are pure per-row
    // columns (no window, no shuffle) — they must run unchanged on a
    // streaming frame and agree with batch row-for-row
    val base = java.nio.file.Files.createTempDirectory("graft_r9s").toString
    val docsB = spark.read.parquet(sf("documents"))
    docsB.coalesce(2).write.parquet(s"$base/documents.parquet")
    def score(df: org.apache.spark.sql.DataFrame) = {
      val md = graft.ops.Text.fimTransform(
        df.select(col("doc_id"),
          graft.ops.Text.stripMarkdown(
            concat(lit("# T\n\n- a\n\n"), col("text"))).as("text")),
        "doc_id", col("text"), fimRate = 2)
      graft.ops.Text.readability(md, col("out_text"))
        .select(col("doc_id"), col("fim"), col("out_text"),
          col("n_words"), col("n_syllables"), col("fk_grade"))
    }
    val q = score(graft.sources.Tables.loadStream(spark, base, "documents",
        Map("maxFilesPerTrigger" -> "1")))
      .writeStream.format("memory").queryName("r9_scan")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("r9_scan")
    val batch = score(spark.read.parquet(s"$base/documents.parquet"))
    assert(streamed.count() == docsB.count())
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }

  test("round-9 eval kernels stream per-row: winnow/char-gram/lcs ≡ batch") {
    // winnow_fingerprints, char_gram_hashes, and token_lcs are pure
    // per-row expressions — a streaming quality monitor can score
    // documents with them with no state and batch-identical results
    val base = java.nio.file.Files.createTempDirectory("graft_r9e").toString
    val docsB = spark.read.parquet(sf("documents"))
    docsB.coalesce(2).write.parquet(s"$base/documents.parquet")
    val gfn = graft.api.functions
    def score(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        size(gfn.winnow_fingerprints(col("text"), 24, 16)).as("n_fp"),
        hash(gfn.winnow_fingerprints(col("text"), 24, 16)).as("fp_sig"),
        size(gfn.char_gram_hashes(col("text"), 6)).as("n_cg"),
        gfn.token_lcs(col("text"), reverse(col("text"))).as("lcs_rev"))
    val q = score(graft.sources.Tables.loadStream(spark, base, "documents",
        Map("maxFilesPerTrigger" -> "1")))
      .writeStream.format("memory").queryName("r9_eval")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("r9_eval")
    val batch = score(spark.read.parquet(s"$base/documents.parquet"))
    assert(streamed.count() == docsB.count())
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }

  test("blocklist matchStats/filterBlocked stream per-row ≡ batch (broadcast automaton)") {
    // the AC automaton is broadcast state built on the driver, not
    // streaming state — both transforms must run unchanged on a
    // readStream and emit exactly the batch rows
    val pats = Seq("spark", "slow", "a a", "table")
    val base = java.nio.file.Files.createTempDirectory("graft_blstream").toString
    val docsB = spark.read.parquet(sf("documents")).select("doc_id", "text")
    docsB.coalesce(2).write.parquet(s"$base/documents.parquet")
    val streamIn = graft.sources.Tables.loadStream(spark, base, "documents",
        Map("maxFilesPerTrigger" -> "1")).select("doc_id", "text")
    val q = graft.ops.Blocklist.matchStats(streamIn, "text", pats)
      .writeStream.format("memory").queryName("bl_stream")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("bl_stream")
    val batch = graft.ops.Blocklist.matchStats(docsB, "text", pats)
    assert(streamed.count() == docsB.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)

    val q2 = graft.ops.Blocklist.filterBlocked(streamIn, "text", pats)
      .writeStream.format("memory").queryName("blf_stream")
      .outputMode("append").start()
    try { q2.processAllAvailable() } finally q2.stop()
    val streamedF = spark.table("blf_stream")
    val batchF = graft.ops.Blocklist.filterBlocked(docsB, "text", pats)
    assert(streamedF.count() == batchF.count())
    assert(streamedF.exceptAll(batchF).isEmpty)
  }

  test("media decode kernels stream per-row: audio fingerprints + scene changes ≡ batch") {
    // decode/fingerprint/scene-cut are partition-local (mapPartitions, no
    // state, no shuffle) so they must run unchanged on a readStream —
    // the multimodal analog of the stateless curation-kernel contract
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_mstream").toString
    val ids = spark.read.parquet(sf("documents")).select("doc_id")
      .where(col("doc_id") < 100)
    ids.coalesce(2).write.parquet(s"$base/documents.parquet")
    def wavs(df: org.apache.spark.sql.DataFrame) =
      graft.media.Media.asMediaTable(
        df.select("doc_id").as[Long]
          .map(id => (id, graft.media.MediaGen.wavPayload(id)))
          .toDF("doc_id", "payload"), "doc_id", "payload")
    def vids(df: org.apache.spark.sql.DataFrame) =
      graft.media.Media.asMediaTable(
        df.select("doc_id").as[Long]
          .map(id => (id, graft.media.MediaGen.videoPayload(id)))
          .toDF("doc_id", "payload"), "doc_id", "payload")
    val streamIn = graft.sources.Tables.loadStream(spark, base, "documents",
      Map("maxFilesPerTrigger" -> "1"))
    val q1 = graft.media.Media.audioFingerprints(wavs(streamIn), 8)
      .writeStream.format("memory").queryName("afp_stream")
      .outputMode("append").start()
    try { q1.processAllAvailable() } finally q1.stop()
    val batch1 = graft.media.Media.audioFingerprints(wavs(ids), 8)
    assert(spark.table("afp_stream").exceptAll(batch1).isEmpty &&
      batch1.exceptAll(spark.table("afp_stream")).isEmpty)
    val q2 = graft.media.Media.sceneChanges(vids(streamIn), 64)
      .writeStream.format("memory").queryName("scn_stream")
      .outputMode("append").start()
    try { q2.processAllAvailable() } finally q2.stop()
    val batch2 = graft.media.Media.sceneChanges(vids(ids), 64)
    assert(spark.table("scn_stream").exceptAll(batch2).isEmpty &&
      batch2.exceptAll(spark.table("scn_stream")).isEmpty)
  }

  test("streaming drift monitoring: windowedCounts via readStream ≡ batch windowedDrift") {
    // the round-7 deployment story: the corpus-touching count stage runs
    // as a streaming stateful aggregation (watermark + append, state
    // evicted on window close); driftFromCounts on the sink table must
    // equal batch windowedDrift window-for-window, BIT-identical (the
    // counts are exact longs and the drift math is the same code path)
    val base = java.nio.file.Files.createTempDirectory("graft_dstream").toString
    val evNorm = graft.sources.Tables.load(
      spark, "/root/testdata/sf0.001", "events")
    evNorm.coalesce(1).write.parquet(s"$base/events.parquet")
    val maxTs = evNorm.agg(max("ts")).head().getTimestamp(0)
    Thread.sleep(1100) // distinct mod time → deterministic file order
    evNorm.limit(1)
      .withColumn("ts", lit(new Timestamp(maxTs.getTime + 365L * 86400L * 1000L)))
      .withColumn("event_type", lit("flush"))
      .coalesce(1).write.mode("append").parquet(s"$base/events.parquet")

    val stream = graft.sources.Tables.loadStream(spark, base, "events",
        Map("maxFilesPerTrigger" -> "1", "latestFirst" -> "false"))
      .withWatermark("ts", "0 seconds")
    val q = graft.ops.Drift.windowedCounts(stream, col("ts"),
        col("event_type"), "1 day")
      .writeStream.format("memory").queryName("drift_counts")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()

    // state must EVICT on window close: after the far-future flush file
    // every real window is finalized, so the store holds only the flush
    // window's (window, category) rows — not windows × vocab history
    val vocab = evNorm.select("event_type").distinct().count()
    val lastState = q.lastProgress.stateOperators(0).numRowsTotal
    assert(lastState <= vocab + 1,
      s"state not evicted: $lastState rows for vocab=$vocab")

    val streamed = graft.ops.Drift.driftFromCounts(
        spark.table("drift_counts").where(col("category") =!= "flush"),
        "1 day")
      .collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val batch = graft.ops.Drift.windowedDrift(
        graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events"),
        col("ts"), col("event_type"), "1 day")
      .collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(streamed.nonEmpty && streamed == batch,
      s"missing=${(batch -- streamed).take(2)} extra=${(streamed -- batch).take(2)}")
    spark.sql("DROP TABLE IF EXISTS drift_counts")
  }

  test("streaming profile (complete mode) == batch profile — live data-quality monitor") {
    // Profile.profile is ONE aggregation of mergeable sketches, so it runs
    // as a streaming global aggregation in complete mode with no code
    // changes. With kmvK/topCapacity ≥ every column's cardinality (events:
    // ≤952 distinct) the sketches are in their exact regimes, so the
    // streamed profile must equal the batch profile EXACTLY even though
    // the merge tree differs (KMV = set union; SS exact below capacity;
    // profile re-sorts SS ties deterministically).
    val base = java.nio.file.Files.createTempDirectory("graft_pstream").toString
    val evRaw = spark.read.parquet(sf("events"))
    evRaw.repartition(4).write.option("maxRecordsPerFile", "300")
      .parquet(s"$base/events.parquet") // several files → several batches
    val cols = Seq("event_type", "user_id", "value")
    val q = graft.ops.Profile.profile(
        graft.sources.Tables.loadStream(spark, base, "events",
          Map("maxFilesPerTrigger" -> "1")),
        cols, kmvK = 8192, topCapacity = 1024)
      .writeStream.format("memory").queryName("stream_profile")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()
    def key(r: org.apache.spark.sql.Row) = r.toSeq
    val streamed = spark.table("stream_profile").collect().map(key).toSet
    val batch = graft.ops.Profile.profile(
        graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events"),
        cols, kmvK = 8192, topCapacity = 1024)
      .collect().map(key).toSet
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(2)} extra=${(streamed -- batch).take(2)}")
    assert(streamed.size == cols.size)
    spark.sql("DROP TABLE IF EXISTS stream_profile")
  }

  test("streaming windowed kmv_distinct == batch (set-union state)") {
    val rows = eventRows()
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Double, String, Long)]
    val sdf = stream.toDF().toDF("ts", "value", "event_type", "user_id")
    val agg = sdf.groupBy(window(col("ts"), "1 day"))
      .agg(gf.kmv_agg(col("user_id"), 4096).as("sk"))
    val q = agg.writeStream.format("memory")
      .queryName("win_kmv").outputMode("complete").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      Seq(a, b).foreach { chunk => stream.addData(chunk); q.processAllAvailable() }
      val streamed = spark.table("win_kmv")
        .select(col("window.start").as("ws"),
          gf.kmv_distinct(col("sk")).as("d"))
        .collect().map(r => r.getAs[Timestamp]("ws") -> r.getDouble(1)).toMap
      val batch = rows.toDF("ts", "value", "event_type", "user_id")
        .groupBy(window(col("ts"), "1 day"))
        .agg(countDistinct("user_id").as("d"))
        .select(col("window.start").as("ws"), col("d"))
        .collect().map(r => r.getAs[Timestamp]("ws") -> r.getLong(1).toDouble).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming windowed cms == batch (grid-addition state)") {
    val rows = eventRows()
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Double, String, Long)]
    val sdf = stream.toDF().toDF("ts", "value", "event_type", "user_id")
    val agg = sdf.groupBy(window(col("ts"), "1 day"))
      .agg(gf.cms_agg(col("user_id"), 4, 4096).as("sk"))
    val q = agg.writeStream.format("memory")
      .queryName("win_cms").outputMode("complete").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      Seq(a, b).foreach { chunk => stream.addData(chunk); q.processAllAvailable() }
      // the wide grid is collision-free for this key set: streaming CMS
      // estimates must equal the exact per-window per-user counts
      val streamed = spark.table("win_cms")
        .select(col("window.start").as("ws"), col("sk")).collect().map { r =>
          val ws = r.getAs[Timestamp]("ws")
          val sk = graft.core.CountMin.deserialize(r.getAs[Array[Byte]]("sk"))
          ws -> sk
        }.toMap
      val batch = rows.toDF("ts", "value", "event_type", "user_id")
        .groupBy(window(col("ts"), "1 day"), col("user_id")).count()
        .select(col("window.start").as("ws"), col("user_id"), col("count"))
        .collect().groupBy(_.getAs[Timestamp]("ws"))
      batch.foreach { case (ws, rs) =>
        rs.foreach { r =>
          assert(streamed(ws).estimate(r.getLong(1)) == r.getLong(2),
            s"window $ws user ${r.getLong(1)}")
        }
        assert(streamed(ws).total == rs.map(_.getLong(2)).sum)
      }
    } finally q.stop()
  }
  test("intervalJoin batch mode: inclusive [ts, ts+horizon] bounds, " +
      "key isolation, right columns prefixed") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq((1L, ts("2024-01-10 00:00:00")),
      (2L, ts("2024-01-10 00:00:00"))).toDF("user_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-10 00:00:00")),  // == lower bound: in
      (1L, ts("2024-01-12 00:00:00")),  // == upper bound: in
      (1L, ts("2024-01-12 00:00:01")),  // 1s past horizon: out
      (1L, ts("2024-01-09 23:59:59")),  // before click: out
      (2L, ts("2024-01-11 00:00:00"))   // other user: only matches u2
    ).toDF("user_id", "ts")
    val got = StreamingJoins.intervalJoin(left, right, "user_id",
      "ts", "ts", "2 DAYS", "4 DAYS")
    assert(got.columns.toSeq == Seq("user_id", "ts", "r_ts"))
    val pairs = got.collect()
      .map(r => (r.getLong(0), r.getTimestamp(2).toString)).toSet
    assert(pairs == Set((1L, "2024-01-10 00:00:00.0"),
      (1L, "2024-01-12 00:00:00.0"), (2L, "2024-01-11 00:00:00.0")))
  }

  test("intervalJoin stream == batch; late right rows inside the " +
      "watermark still join") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = MemoryStream[(Long, java.sql.Timestamp)]
    val r = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamingJoins.intervalJoin(
      l.toDF.toDF("user_id", "ts"), r.toDF.toDF("user_id", "ts"),
      "user_id", "ts", "ts", "2 DAYS", "4 DAYS")
    val q = joined.writeStream.format("memory").queryName("ij_sink")
      .outputMode("append").start()
    try {
      l.addData((1L, ts("2024-01-10 00:00:00")),
        (2L, ts("2024-01-10 12:00:00")))
      r.addData((1L, ts("2024-01-11 00:00:00")))
      q.processAllAvailable()
      // batch 2: u2's purchase arrives LATE (event time older than the
      // seen max) but inside the 4-day watermark; u3 match is outside
      // the horizon
      l.addData((3L, ts("2024-01-20 00:00:00")))
      r.addData((2L, ts("2024-01-11 12:00:00")),
        (3L, ts("2024-01-23 00:00:00")))
      q.processAllAvailable()
      val got = spark.table("ij_sink")
        .select("user_id").as[Long].collect().sorted.toSeq
      assert(got == Seq(1L, 2L))
      val dropped = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      assert(dropped == 0L)
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS ij_sink")
    }
  }
}
