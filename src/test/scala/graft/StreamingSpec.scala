package graft

import graft.streaming.Streaming
import graft.streaming.Streaming.{Event, UserRunning}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming: windowed aggregation with watermark,
  * sessionization, and custom keyed state — driven by MemoryStream. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowedCounts aggregates per window and type over a stream") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streaming.windowedCounts(in.toDF(), "15 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()
    in.addData(
      Event(1, ts(5), 1, "click", 2.0),
      Event(2, ts(10), 2, "click", 3.0),
      Event(3, ts(20), 1, "view", 1.0))
    q.processAllAvailable()
    // append mode emits a window only once the watermark passes its
    // end — push the watermark forward with a later event
    in.addData(Event(4, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 3, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT event_type, n, sum_value FROM win_counts")
      .as[(String, Long, Double)].collect().toSet
    assert(rows.contains(("click", 2L, 5.0))) // both clicks in 10:00-10:15
    assert(rows.contains(("view", 1L, 1.0)))
  }

  test("sessionize groups events within the gap into one session") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts(0), 7, "click", 1.0),
      Event(2, ts(10), 7, "click", 1.0),  // same session (gap 30m)
      Event(3, ts(55), 7, "click", 1.0))  // new session
    in.addData(Event(4, java.sql.Timestamp.valueOf("2024-01-01 13:00:00"), 8, "click", 0.0))
    Streaming.runToMemory(spark, Streaming.sessionize(in.toDF(), "30 minutes"),
      "sessions", "append")
    val sess = spark.sql("SELECT user_id, n_events FROM sessions WHERE user_id = 7")
      .as[(Long, Long)].collect().toSeq.sortBy(-_._2)
    assert(sess.map(_._2) == Seq(2L, 1L))
  }

  test("runningPerUser keeps state across micro-batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val out = Streaming.runningPerUser(in.toDS()).toDF()
    val q = out.writeStream.format("memory").queryName("running")
      .outputMode("append").start()
    in.addData(Event(1, ts(0), 1, "click", 2.0), Event(2, ts(1), 1, "click", 3.0))
    q.processAllAvailable()
    in.addData(Event(3, ts(2), 1, "view", 5.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT user_id, n_events, total_value FROM running")
      .as[(Long, Long, Double)].collect().toSeq
    // state carried over: second batch reports cumulative 3 events / 10.0
    assert(rows.contains((1L, 3L, 10.0)))
  }

  test("dedupStream drops repeated fingerprints across micro-batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val withFp = Streaming.dedupStream(
      in.toDF().withColumn("fp", md5(col("event_type"))), "fp")
    val q = withFp.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    in.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 2, "click", 2.0))
    q.processAllAvailable()
    in.addData(Event(3, ts(2), 3, "click", 3.0), Event(4, ts(3), 4, "view", 4.0))
    q.processAllAvailable()
    q.stop()
    val kept = spark.sql("SELECT event_id FROM dedup_stream").as[Long].collect().toSet
    // one click survives (first seen), the later clicks are state-hits
    assert(kept == Set(1L, 4L))
  }

  test("intervalJoin matches in-window pairs and drops rows behind the watermark") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Event]
    val errors = MemoryStream[Event]
    val joined = Streaming.intervalJoin(
      clicks.toDF().select(col("event_id"), col("user_id"), col("ts")), "ts",
      errors.toDF().select(col("event_id").as("e_event_id"),
        col("user_id").as("e_user_id"), col("ts").as("e_ts")), "e_ts",
      col("user_id") === col("e_user_id") &&
        col("e_ts") >= col("ts") &&
        col("e_ts") <= col("ts") + expr("INTERVAL 1 HOUR"))
      .select(col("event_id"), col("e_event_id"))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    // in-window match (error 10 min after click), out-of-window error
    clicks.addData(Event(1, ts(0), 7, "click", 1.0))
    errors.addData(Event(100, ts(10), 7, "error", 0.0),
      Event(101, java.sql.Timestamp.valueOf("2024-01-01 23:00:00"), 7, "error", 0.0))
    q.processAllAvailable()
    val matched = spark.sql("SELECT event_id, e_event_id FROM ssjoin")
      .as[(Long, Long)].collect().toSet
    assert(matched == Set((1L, 100L)))
    // advance the watermark far past the join window on BOTH inputs
    // (the global watermark is the min across them)
    val late = java.sql.Timestamp.valueOf("2024-01-03 10:00:00")
    clicks.addData(Event(2, late, 8, "click", 1.0))
    errors.addData(Event(102, late, 9, "error", 0.0))
    q.processAllAvailable()
    // a row hours behind the watermark is dropped at ingest: it must
    // NOT match the (also state-evicted) click from the first batch
    errors.addData(Event(103, ts(5), 7, "error", 0.0))
    q.processAllAvailable()
    q.stop()
    val after = spark.sql("SELECT event_id, e_event_id FROM ssjoin")
      .as[(Long, Long)].collect().toSet
    assert(after == Set((1L, 100L)))
  }

  test("left-outer intervalJoin emits the null match once the watermark closes the window") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Event]
    val errors = MemoryStream[Event]
    val joined = Streaming.intervalJoin(
      clicks.toDF().select(col("event_id"), col("user_id"), col("ts")), "ts",
      errors.toDF().select(col("event_id").as("e_event_id"),
        col("user_id").as("e_user_id"), col("ts").as("e_ts")), "e_ts",
      col("user_id") === col("e_user_id") &&
        col("e_ts") >= col("ts") &&
        col("e_ts") <= col("ts") + expr("INTERVAL 1 HOUR"),
      joinType = "left_outer")
      .select(col("event_id"), col("e_event_id"))
    val q = joined.writeStream.format("memory").queryName("ssjoin_outer")
      .outputMode("append").start()
    // user 7 gets a match; user 8's click has no error in its window
    clicks.addData(Event(1, ts(0), 7, "click", 1.0), Event(2, ts(0), 8, "click", 1.0))
    errors.addData(Event(100, ts(10), 7, "error", 0.0))
    q.processAllAvailable()
    // the unmatched click's null row must NOT appear yet — its window
    // is still open
    val early = spark.sql("SELECT event_id, e_event_id FROM ssjoin_outer")
      .as[(Long, Option[Long])].collect().toSet
    assert(early == Set((1L, Some(100L))))
    // watermark far past the window on both inputs closes it
    val late = java.sql.Timestamp.valueOf("2024-01-02 10:00:00")
    clicks.addData(Event(3, late, 9, "click", 1.0))
    errors.addData(Event(101, late, 9, "error", 0.0))
    q.processAllAvailable()
    q.stop()
    val after = spark.sql("SELECT event_id, e_event_id FROM ssjoin_outer")
      .as[(Long, Option[Long])].collect().toSet
    assert(after.contains((2L, None)), s"expected the null match for the closed window, got $after")
  }

  test("readStream over the events parquet matches the batch result") {
    // the file source wants a directory: stage the single parquet file
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    val path = dir.toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val schema = spark.read.parquet(path).schema
    // ts arrives as a nanos long (nanosAsLong) or TIMESTAMP_NTZ (naive
    // micros) depending on the file — restore as SparkEntry.events does
    val restoreTs = (df: org.apache.spark.sql.DataFrame) =>
      schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    val stream = Streaming.windowedCounts(
      restoreTs(spark.readStream.schema(schema).parquet(path)), "6 hours")
    val q = stream.writeStream.format("memory").queryName("file_win")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT ws, event_type, n FROM file_win")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val want = Streaming.windowedCounts(restoreTs(spark.read.parquet(path)), "6 hours")
      .select("ws", "event_type", "n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming transforms run identically on a batch frame") {
    val batch = Seq(
      Event(1, ts(5), 1, "click", 2.0),
      Event(2, ts(10), 2, "click", 3.0)).toDF()
    val got = Streaming.windowedCounts(batch, "15 minutes")
      .select("event_type", "n", "sum_value").as[(String, Long, Double)].collect()
    assert(got.toSeq == Seq(("click", 2L, 5.0)))
  }

  test("q98 stream near-dup: multi-batch drain equals the batch replay") {
    // the staged q98 source is 4 files; with maxFilesPerTrigger=1 the
    // drain must split into multiple micro-batches — the property the
    // foreachBatch union has to be invariant to
    val stage = CurationQueries.q98Stage(spark, sf0001)
    val schema = spark.read.parquet(stage).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val seen = new java.util.concurrent.atomic.AtomicLong(0L)
    Streaming.runForeachBatch(spark, src, (b, _) => {
      batches.incrementAndGet(); seen.addAndGet(b.count()); ()
    })
    val deltaN = spark.read.parquet(stage).count()
    assert(batches.get() >= 2, s"expected a multi-batch drain, got ${batches.get()}")
    assert(seen.get() == deltaN, "drain lost or duplicated delta rows")
    // the drained union equals the direct batch computation of
    // delta-vs-base candidates + exact Jaccard
    val got = CurationQueries.q98StreamNeardup(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val delta = d.filter(col("doc_id") % 10 === 7)
    val sigs = graft.dedup.Dedup.bandedSignatures(delta, "doc_id", "text",
      CurationQueries.shingleN, CurationQueries.nPerm, CurationQueries.rowsPerBand)
    val cands = sigs.as("a")
      .join(CurationQueries.streamBaseBands(spark, sf0001).as("b"),
        col("a.band") === col("b.band") && col("a.bandsig") === col("b.bandsig"))
      .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
    val want = graft.dedup.Dedup
      .jaccardVerify(d, "doc_id", "text", cands, CurationQueries.shingleN)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(got == want, "streaming drain diverges from the batch replay")
    // every match crosses the slice boundary: id1 incoming, id2 corpus
    got.foreach { case (id1, id2, _) =>
      assert(id1 % 10 == 7 && id2 % 10 != 7) }
  }

  test("q98 per-batch candidate lookup prunes the at-rest band table to the batch's buckets") {
    // a ONE-doc batch carries ≤ 4 band signatures → ≤ 4 of the 16
    // sigbucket partitions; the batch's base-table scan must be an
    // explicit partition-filtered read, not a full-corpus scan
    val bandsPath = CurationQueries.streamBandsPath(spark, sf0001)
    val one = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") === 7)
    val batch = CurationQueries.q98BatchMatches(spark, one, bandsPath,
      spark.read.parquet(s"$sf0001/documents.parquet"))
    batch.collect() // force planning + execution (finalizes the AQE plan)
    val p = batch.queryExecution.executedPlan.toString
    val bandScans = p.split("\n").filter(_.contains("q98_bands"))
    assert(bandScans.nonEmpty, s"expected a scan of the at-rest band table:\n$p")
    bandScans.foreach { line =>
      assert(line.contains("PartitionFilters: [") && line.contains("sigbucket"),
        s"expected a sigbucket partition filter on the band scan:\n$line")
    }
    // the INSET carries the batch's own buckets — at most 4 of 16
    val inset = "sigbucket#\\d+ INSET ([0-9, ]+)".r.findFirstMatchIn(p)
    inset.foreach { m =>
      val n = m.group(1).split(",").length
      assert(n <= 4, s"one-doc batch pruned to $n buckets (expected ≤ 4)")
    }
  }

  test("q102 stream BM25: multi-batch drain; served search equals the one-shot q20") {
    // the staged delta must split into multiple micro-batches and
    // deliver every delta row exactly once
    val stage = Queries.q102Stage(spark, sf0001)
    val schema = spark.read.parquet(stage).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val seen = new java.util.concurrent.atomic.AtomicLong(0L)
    Streaming.runForeachBatch(spark, src, (b, _) => {
      batches.incrementAndGet(); seen.addAndGet(b.count()); ()
    })
    assert(batches.get() >= 2, s"expected a multi-batch drain, got ${batches.get()}")
    assert(seen.get() == spark.read.parquet(stage).count(),
      "drain lost or duplicated delta rows")
    // end to end: the search served from the streamed-in index equals
    // the one served from the one-shot full build (q102's internal
    // require() additionally pins the postings tables row for row)
    val got = SparkEntry.queries("q102_stream_bm25")(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSeq
    val want = SparkEntry.queries("q20_bm25")(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == want, "streamed-in BM25 index diverges from the one-shot build")
  }

  test("q160 CDC feed: the drained index equals the batch replay of the whole feed, bit for bit") {
    // the full-strength pin behind q160's parts-sized gates: after a
    // mixed insert/delete feed with two valve-fired compactions, the
    // at-rest lists (sidecarless by the final gate) must equal the
    // standing-quantizer assignment of base + inserts - deletes —
    // including the batch-3 deletes whose targets arrived through the
    // feed itself
    import graft.search.IVF
    SparkEntry.queries("q160_cdc_feed")(spark, sf0001).count()
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val path = PipelineQueries.roundtripPath(sf0001, "q160")
    val cents = spark.read.parquet(IVF.centroidsPath(path))
    val atRest = spark.read.parquet(IVF.listsPath(path))
      .select(col("vec_id"), col("v"), col("cid").cast("long").as("cid"))
    val survivors = e.filter(
      !(col("vec_id") >= 100 && col("vec_id") % 7 === 3) &&
        !(col("vec_id") < 100 && col("vec_id") % 5 === 2))
    val want = IVF.assign(survivors, "vec_id", "v", cents)
      .select(col("vec_id"), col("v"), col("cid").cast("long").as("cid"))
    assert(atRest.exceptAll(want).isEmpty && want.exceptAll(atRest).isEmpty,
      "CDC-drained at-rest lists diverge from the whole-feed batch replay")
  }

  test("q161 upsert revive: the post-revive index equals the replay where revived rows were never deleted, bit for bit") {
    // the full-strength pin behind q161's request-sized gates: after
    // the feed's last batch re-ingests tombstoned ids (compact-first
    // revive inside appendToIndex), the at-rest lists must equal the
    // standing-quantizer assignment of all-minus-stay-deleted — one
    // copy per revived id, no resurrection of the stay-deleted rows
    import graft.search.IVF
    SparkEntry.queries("q161_upsert_revive")(spark, sf0001).count()
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val path = PipelineQueries.roundtripPath(sf0001, "q161")
    val cents = spark.read.parquet(IVF.centroidsPath(path))
    val atRest = spark.read.parquet(IVF.listsPath(path))
      .select(col("vec_id"), col("v"), col("cid").cast("long").as("cid"))
    val survivors = e.filter(!(col("vec_id") >= 100 &&
      col("vec_id") % 7 === 3 && col("vec_id") % 3 =!= 0))
    val want = IVF.assign(survivors, "vec_id", "v", cents)
      .select(col("vec_id"), col("v"), col("cid").cast("long").as("cid"))
    assert(atRest.exceptAll(want).isEmpty && want.exceptAll(atRest).isEmpty,
      "post-revive lists diverge from the never-deleted replay")
  }

  test("q163 SQ8 revive: the post-revive code lists equal the never-deleted replay, byte for byte") {
    // the full-strength pin behind q163's request-sized gates: after
    // the quantized append path's compact-first revive, the at-rest
    // codes must equal the standing-geometry quantization of
    // all-minus-stay-deleted — byte-identical codes, one copy per
    // revived id (codes are a pure function of assignment + bounds)
    import graft.search.{IVF, SQ}
    SparkEntry.queries("q163_sq_revive")(spark, sf0001).count()
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val path = PipelineQueries.roundtripPath(sf0001, "q163")
    val cents = spark.read.parquet(s"$path/centroids")
    val ba = SQ.boundsArrays(spark.read.parquet(s"$path/bounds"))
    val survivors = e.filter(!(col("vec_id") >= 100 &&
      col("vec_id") % 7 === 3 && col("vec_id") % 3 =!= 0))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), base64(col("code")).as("c"),
        col("cid").cast("long").as("cid"))
    val atRest = rows(spark.read.parquet(IVF.listsPath(path)))
    val want = rows(SQ.quantized(survivors, "vec_id", "v", cents, ba))
    assert(atRest.exceptAll(want).isEmpty && want.exceptAll(atRest).isEmpty,
      "post-revive SQ8 codes diverge from the never-deleted replay")
  }

  test("q173 SQ8 CDC+revive+valve: the final code lists equal the standing-geometry survivor replay, byte for byte") {
    // the full-strength pin behind q173's oracle (which hashes only
    // the 10-row serve): after two mid-drain flips — the revive
    // compact-first and the valve compact — the at-rest codes must
    // equal the standing-geometry quantization of
    // all − stay-deleted − CDC-deleted, byte-identical, one copy per
    // revived id (codes are a pure function of assignment + bounds)
    import graft.search.{IVF, SQ}
    SparkEntry.queries("q173_sq_cdc_revive")(spark, sf0001).count()
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val path = PipelineQueries.roundtripPath(sf0001, "q173")
    val cents = spark.read.parquet(s"$path/centroids")
    val ba = SQ.boundsArrays(spark.read.parquet(s"$path/bounds"))
    val survivors = e.filter(
      !(col("vec_id") >= 100 && col("vec_id") < 300 &&
        col("vec_id") % 7 === 3 && col("vec_id") % 2 =!= 0) &&
      !(col("vec_id") < 100 && col("vec_id") % 3 === 0))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), base64(col("code")).as("c"),
        col("cid").cast("long").as("cid"))
    val atRest = rows(spark.read.parquet(IVF.listsPath(path)))
    val want = rows(SQ.quantized(survivors, "vec_id", "v", cents, ba))
    assert(atRest.exceptAll(want).isEmpty && want.exceptAll(atRest).isEmpty,
      "CDC+revive SQ8 codes diverge from the survivor replay")
  }

  test("q164 lexical CDC+revive: the standing postings table equals the from-scratch build over the survivors") {
    // the full-strength pin behind q164's oracle (which hashes only
    // the 3-term serve): after two mid-drain flips — the revive
    // compact and the valve compact — the WHOLE table must equal the
    // from-scratch build over base + inserts − stay-deleted −
    // CDC-deleted, every term included
    import graft.lexical.BM25
    SparkEntry.queries("q164_lex_cdc_revive")(spark, sf0001).count()
    val post = spark.table("bm25_cdc_" + PipelineQueries.sanitizeTag(sf0001))
      .select(col("doc"), col("len"), col("term"), col("tf"))
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val want = BM25.postings(
        d.filter(!(col("doc_id") >= 100 && col("doc_id") < 300 &&
            col("doc_id") % 9 === 4 && col("doc_id") % 2 === 0 &&
            col("doc_id") % 4 =!= 0) &&
          !(col("doc_id") < 100 && col("doc_id") % 3 === 0)),
        "doc_id", "text")
      .select(col("doc"), col("len"), col("term"), col("tf"))
    assert(post.exceptAll(want).isEmpty && want.exceptAll(post).isEmpty,
      "CDC+revive postings diverge from the from-scratch survivor build")
  }

  test("q159 valve-fired mid-drain postings compaction: the standing table equals the from-scratch build over the survivors") {
    // the full-strength pin behind q159's oracle (which hashes only
    // the 3-term serve): after the valve fires mid-drain and the
    // remaining batches append into the flipped generation, the WHOLE
    // standing postings table — every term, not just the queried ones
    // — must equal the from-scratch build over union-minus-deleted
    import graft.lexical.BM25
    SparkEntry.queries("q159_stream_bm25_valve")(spark, sf0001).count()
    val post = spark.table("bm25_valve_" + PipelineQueries.sanitizeTag(sf0001))
      .select(col("doc"), col("len"), col("term"), col("tf"))
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val want = BM25.postings(
        d.filter(!(col("doc_id") >= 100 && col("doc_id") % 9 === 4)),
        "doc_id", "text")
      .select(col("doc"), col("len"), col("term"), col("tf"))
    assert(post.exceptAll(want).isEmpty && want.exceptAll(post).isEmpty,
      "valve-compacted postings diverge from the from-scratch survivor build")
  }

  test("q127 per-batch IVF appends land new files only, and only under the batch's assigned lists") {
    // the vector-index twin of the BM25 streaming-scope contract:
    // each micro-batch assigns against the standing quantizer and may
    // create files only under the cid= directories its own vectors
    // land in — at-rest files byte-stable, per-trigger cost O(batch)
    import graft.search.IVF
    val path = java.nio.file.Files.createTempDirectory("ivf_sscope").toString + "/idx"
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    IVF.writeIndex(e.filter(col("vec_id") >= 100), "vec_id", "v", 8, 0, path)
    val cents = spark.read.parquet(IVF.centroidsPath(path)).localCheckpoint()
    def files(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(IVF.listsPath(path)))
        .filter(f => f.getName.endsWith(".parquet"))
        .map(f => f.getParentFile.getName + "/" + f.getName -> f.lastModified).toMap
    }
    val stage = PipelineQueries.stageOrderedFiles(
      e.filter(col("vec_id") < 100), "vec_id", 4,
      java.nio.file.Files.createTempDirectory("ivf_sstage").toString + "/stage")
    val src = spark.readStream.schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val snapshots = scala.collection.mutable.ArrayBuffer
      .empty[(Map[String, Long], Map[String, Long], Set[Long])]
    Streaming.runForeachBatch(spark, src, (batch, _) => {
      val b = batch.localCheckpoint()
      val before = files()
      IVF.appendToIndex(spark, path, b.select(col("vec_id"), col("v")), "vec_id", "v")
      val touched = IVF.assign(b, "vec_id", "v", cents)
        .select(col("cid").cast("long")).distinct().as[Long].collect().toSet
      snapshots += ((before, files(), touched))
      ()
    })
    assert(snapshots.length >= 2, "expected a multi-batch drain")
    snapshots.foreach { case (before, after, touched) =>
      before.foreach { case (name, m) =>
        assert(after.get(name).contains(m), s"at-rest list file $name rewritten mid-drain") }
      val newLists = (after.keySet -- before.keySet)
        .map(_.split("/").head.stripPrefix("cid=").toLong)
      assert(newLists.nonEmpty && newLists.subsetOf(touched),
        s"batch wrote lists $newLists outside its assigned cells $touched")
    }
  }

  test("q147 mid-drain delete: drained live rows equal the batch replay append-delete-append, bit for bit") {
    // the full-strength pin behind q147's parts-sized in-query gates
    // (the q116/q120 discipline): a delete request landing between
    // append micro-batches must leave the LIVE view row-identical to
    // the batch replay — union assigned under the standing quantizer,
    // deleted ids dropped — while the at-rest mass stands until
    // compaction folds the sidecar
    import graft.search.IVF
    val path = java.nio.file.Files.createTempDirectory("ivf_sdel").toString + "/idx"
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    IVF.writeIndex(e.filter(col("vec_id") >= 100), "vec_id", "v", 8, 0, path)
    val cents = spark.read.parquet(IVF.centroidsPath(path)).localCheckpoint()
    val stage = PipelineQueries.stageOrderedFiles(
      e.filter(col("vec_id") < 100), "vec_id", 4,
      java.nio.file.Files.createTempDirectory("ivf_sdel_stage").toString + "/stage")
    val src = spark.readStream.schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val delIds = e.filter(col("vec_id") >= 100 && col("vec_id") % 7 === 3)
      .select("vec_id").localCheckpoint()
    var deleted = -1L
    Streaming.runForeachBatch(spark, src, (batch, bid) => {
      IVF.appendToIndex(spark, path,
        batch.select(col("vec_id"), col("v")), "vec_id", "v")
      if (bid == 1L) deleted = IVF.deleteFromIndex(spark, path, delIds, "vec_id", countPresent = true)
    })
    assert(deleted == delIds.count(),
      "the mid-drain delete must hide exactly the request")
    val live = IVF.listsRows(spark, path)
      .select(col("vec_id"), col("v"), col("cid").cast("long").as("cid"))
    val want = IVF.assign(
        e.filter(!(col("vec_id") >= 100 && col("vec_id") % 7 === 3)),
        "vec_id", "v", cents)
      .select(col("vec_id"), col("v"), col("cid").cast("long").as("cid"))
    assert(live.exceptAll(want).isEmpty && want.exceptAll(live).isEmpty,
      "drained live view must equal the batch replay row for row")
    // hide-now: at-rest mass stands; remove-later: compaction folds
    assert(spark.read.parquet(IVF.listsPath(path)).count() == e.count())
    IVF.compactIndex(spark, path)
    assert(spark.read.parquet(IVF.listsPath(path)).count() == e.count() - deleted)
  }

  test("q158 valve-fired mid-drain compaction: at-rest lists equal the batch replay bit for bit, and a second cycle composes") {
    // the full-strength pin behind q158's parts-sized gates: when the
    // needsCompact valve fires INSIDE the drain and compaction runs
    // between micro-batches, the post-drain AT-REST lists (not just
    // the live view — the sidecar is gone) must equal the batch
    // replay's assignment of union-minus-deleted, and the flipped
    // generation must accept a whole second delete+compact cycle
    import graft.search.IVF
    val path = java.nio.file.Files.createTempDirectory("ivf_valve").toString + "/idx"
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    IVF.writeIndex(e.filter(col("vec_id") >= 100), "vec_id", "v", 8, 0, path)
    val cents = spark.read.parquet(IVF.centroidsPath(path)).localCheckpoint()
    val stage = PipelineQueries.stageOrderedFiles(
      e.filter(col("vec_id") < 100), "vec_id", 4,
      java.nio.file.Files.createTempDirectory("ivf_valve_stage").toString + "/stage")
    val src = spark.readStream.schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val delIds = e.filter(col("vec_id") >= 100 && col("vec_id") % 7 === 3)
      .select("vec_id").localCheckpoint()
    val nReq = delIds.count()
    var fired = List.empty[Long]
    Streaming.runForeachBatch(spark, src, (batch, bid) => {
      IVF.appendToIndex(spark, path,
        batch.select(col("vec_id"), col("v")), "vec_id", "v")
      if (bid == 1L) IVF.deleteFromIndex(spark, path, delIds, "vec_id", countPresent = true)
      if (IVF.needsCompact(spark, path, nReq - 1)) {
        fired ::= bid
        IVF.compactIndex(spark, path)
      }
    })
    assert(fired == List(1L), "the valve must fire exactly once, mid-drain")
    val atRest = spark.read.parquet(IVF.listsPath(path))
      .select(col("vec_id"), col("v"), col("cid").cast("long").as("cid"))
    val want = IVF.assign(
        e.filter(!(col("vec_id") >= 100 && col("vec_id") % 7 === 3)),
        "vec_id", "v", cents)
      .select(col("vec_id"), col("v"), col("cid").cast("long").as("cid"))
    assert(atRest.exceptAll(want).isEmpty && want.exceptAll(atRest).isEmpty,
      "valve-compacted at-rest lists must equal the batch replay bit for bit")
    // the flipped generation accepts a full second cycle
    val del2 = e.filter(col("vec_id") < 100 && col("vec_id") % 5 === 2)
      .select("vec_id").localCheckpoint()
    assert(IVF.deleteFromIndex(spark, path, del2, "vec_id", countPresent = true) == del2.count())
    IVF.compactIndex(spark, path)
    assert(spark.read.parquet(IVF.listsPath(path)).count()
      == e.count() - nReq - del2.count())
  }

  test("q156 mid-drain delete: drained live codes equal the batch replay append-delete-append, byte for byte") {
    // the full-strength pin behind q156's parts-sized occupancy gate:
    // a delete landing between SQ8 append micro-batches must leave
    // the LIVE view byte-identical to the batch replay — the union
    // quantized under the STANDING geometry, deleted ids dropped —
    // while the at-rest codes stand until compaction folds the sidecar
    import graft.search.{IVF, SQ}
    val path = java.nio.file.Files.createTempDirectory("sq_sdel").toString + "/idx"
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    SQ.writeIndex(e.filter(col("vec_id") >= 100), "vec_id", "v", 8, path)
    val cents = spark.read.parquet(s"$path/centroids").localCheckpoint()
    val ba = SQ.boundsArrays(spark.read.parquet(s"$path/bounds"))
      .localCheckpoint()
    val stage = PipelineQueries.stageOrderedFiles(
      e.filter(col("vec_id") < 100), "vec_id", 4,
      java.nio.file.Files.createTempDirectory("sq_sdel_stage").toString + "/stage")
    val src = spark.readStream.schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val delIds = e.filter(col("vec_id") >= 100 && col("vec_id") % 7 === 3)
      .select(col("vec_id").as("id")).localCheckpoint()
    var deleted = -1L
    Streaming.runForeachBatch(spark, src, (batch, bid) => {
      SQ.appendToIndex(spark, path,
        batch.select(col("vec_id"), col("v")), "vec_id", "v")
      if (bid == 1L) deleted = IVF.deleteFromIndex(spark, path, delIds, "id", countPresent = true)
    })
    assert(deleted == delIds.count(),
      "the mid-drain delete must hide exactly the request")
    val live = IVF.listsRows(spark, path)
      .select(col("id"), col("code"), col("cid").cast("long").as("cid"))
    val want = SQ.quantized(
        e.filter(!(col("vec_id") >= 100 && col("vec_id") % 7 === 3)),
        "vec_id", "v", cents, ba)
      .select(col("id"), col("code"), col("cid").cast("long").as("cid"))
    assert(live.exceptAll(want).isEmpty && want.exceptAll(live).isEmpty,
      "drained live codes must equal the batch replay byte for byte")
    // hide-now: at-rest code mass stands; remove-later: compaction folds
    assert(spark.read.parquet(IVF.listsPath(path)).count() == e.count())
    IVF.compactIndex(spark, path)
    assert(spark.read.parquet(IVF.listsPath(path)).count() == e.count() - deleted)
  }

  test("resumable drain: two runs over one checkpoint ingest each file exactly once into the IVF index") {
    // the production ingest loop: files land, the drain re-runs with
    // the SAME durable checkpoint, and only the delta reaches the
    // sink — proven end-to-end by appending both runs into one IVF
    // index and gating the final lists against a single batch
    // assignment of everything (any re-delivery would duplicate rows
    // and fail the exceptAll)
    import graft.search.IVF
    val root = java.nio.file.Files.createTempDirectory("resume_drain").toString
    val live = s"$root/live"; val ckpt = s"$root/ckpt"; val idx = s"$root/idx"
    new java.io.File(live).mkdirs()
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    IVF.writeIndex(e.filter(col("vec_id") >= 100), "vec_id", "v", 8, 0, idx)
    val staged = PipelineQueries.stageOrderedFiles(
      e.filter(col("vec_id") < 100), "vec_id", 4, s"$root/staged")
    val files = Option(new java.io.File(staged).listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    assert(files.length == 4)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    def drain(): Unit = {
      val src = spark.readStream
        .schema(spark.read.parquet(staged).schema)
        .option("maxFilesPerTrigger", 1).parquet(live)
      Streaming.runForeachBatchResumable(spark, src, ckpt, (b, _) => {
        val rows = b.localCheckpoint()
        seen += rows.count()
        IVF.appendToIndex(spark, idx, rows, "vec_id", "v")
      })
    }
    // run 1: only the first two files exist
    files.take(2).foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(live, f.getName)) }
    drain()
    val afterRun1 = seen.sum
    assert(afterRun1 == spark.read.parquet(files.take(2).map(_.getPath): _*).count(),
      "run 1 must deliver exactly the first two files")
    // run 2: the remaining files land; SAME checkpoint — only the
    // delta is delivered
    files.drop(2).foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(live, f.getName)) }
    drain()
    assert(seen.sum == e.filter(col("vec_id") < 100).count(),
      s"two drains must deliver every row exactly once, saw ${seen.sum}")
    // the end-to-end gate: the twice-drained index equals ONE batch
    // assignment of the whole union — re-delivery would duplicate
    val cents = spark.read.parquet(IVF.centroidsPath(idx))
    val streamed = spark.read.parquet(IVF.listsPath(idx))
      .select(col("vec_id"), col("v"), col("cid").cast("long").as("cid"))
    val expected = IVF.assign(e, "vec_id", "v", cents)
      .select(col("vec_id"), col("v"), col("cid").cast("long").as("cid"))
    assert(streamed.exceptAll(expected).isEmpty &&
      expected.exceptAll(streamed).isEmpty,
      "resumed drains must leave the index identical to one batch assignment")
  }

  test("q130 cumulative drain: q98's pairs plus exactly the earlier-batch incoming matches") {
    val cum = SparkEntry.queries("q130_stream_neardup_cumulative")(spark, sf0001)
      .select("id1", "id2", "jaccard").as[(Long, Long, Double)].collect().toSet
    val standingOnly = SparkEntry.queries("q98_stream_neardup")(spark, sf0001)
      .select("id1", "id2", "jaccard").as[(Long, Long, Double)].collect().toSet
    // the cumulative semantic can only ADD matches (same standing
    // corpus, same thresholds; registration widens the candidate set)
    assert(standingOnly.subsetOf(cum),
      "cumulative drain lost a standing-corpus match")
    // every extra pair is incoming x EARLIER-BATCH incoming, earlier
    // measured by the deterministic rank-quartile batch rule
    val incIds = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") % 10 === 7)
      .select("doc_id").as[Long].collect().sorted
    val batchOf = incIds.zipWithIndex
      .map { case (id, r) => id -> (r.toLong * 4 / incIds.length) }.toMap
    // sf0.001's incoming slice happens to carry no cross-batch
    // near-dups; the sf0.01 oracle is where the extras are EXERCISED
    // (13 cumulative pairs vs q98's 11). When present, every extra
    // must be incoming x earlier-batch incoming.
    val extras = cum -- standingOnly
    extras.foreach { case (id1, id2, _) =>
      assert(id1 % 10 == 7 && id2 % 10 == 7,
        s"extra pair ($id1, $id2) is not incoming x incoming")
      assert(batchOf(id2) < batchOf(id1),
        s"extra pair ($id1, $id2) does not respect arrival order")
    }
  }

  test("q128 streamed SQ8 ingest: gates pass and the streamed-in query vector is its own top hit") {
    // the in-query requires carry the heavy contracts (per-batch clamp
    // fraction under threshold, drained codes ≡ batch quantization);
    // this drives them at spec time and checks the freshness witness —
    // a vector that arrived only via the stream is immediately served
    val got = SparkEntry.queries("q128_stream_sq")(spark, sf0001)
      .select("vec_id", "rank").as[(Long, Long)].collect().toSeq
    assert(got.length == 10 && got.map(_._2).sorted == (1L to 10L))
    assert(got.find(_._2 == 1L).map(_._1).contains(1L),
      "the streamed-in query vector must surface as its own nearest neighbor")
  }

  test("q102 per-batch writes land new files only, and only in the batch's term buckets") {
    // the streaming-ingest twin of BM25Spec's append-scope contract:
    // EVERY micro-batch of the drain must write O(delta-batch) — new
    // files only, confined to buckets some batch term hashes to, the
    // at-rest files byte-stable. This is what keeps a 100 TB postings
    // table's streaming ingest from rewriting the index per trigger.
    val tbl = "bm25_stream_scope_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val path = java.nio.file.Files.createTempDirectory("bm25_sscope").toString + "/t"
    // small standing corpus, then drain the staged delta live
    val standing = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") >= 100)
    Queries.writePostings(spark, standing, tbl, path, "overwrite")
    def files(): Map[String, Long] =
      Option(new java.io.File(path).listFiles()).toSeq.flatten
        .filter(f => f.isFile && f.getName.startsWith("part-"))
        .map(f => f.getName -> f.lastModified).toMap
    val stage = Queries.q102Stage(spark, sf0001)
    val schema = spark.read.parquet(stage).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val snapshots = scala.collection.mutable.ArrayBuffer
      .empty[(Map[String, Long], Map[String, Long], Set[Int])]
    Streaming.runForeachBatch(spark, src, (batch, _) => {
      val b = batch.localCheckpoint() // batch frames are single-pass
      val before = files()
      Queries.writePostings(spark, b, tbl, path, "append")
      val touched = graft.lexical.BM25.postings(b, "doc_id", "text")
        .select(pmod(hash(col("term")), lit(Queries.bucketCountOf(spark, tbl))).cast("int"))
        .distinct().as[Int].collect().toSet
      snapshots += ((before, files(), touched))
      ()
    })
    assert(snapshots.length >= 2, "expected a multi-batch drain")
    snapshots.foreach { case (before, after, touched) =>
      before.foreach { case (name, m) =>
        assert(after.get(name).contains(m), s"at-rest file $name rewritten mid-drain") }
      val newBuckets = (after.keySet -- before.keySet).map { name =>
        "_(\\d{5})\\.".r.findFirstMatchIn(name)
          .getOrElse(fail(s"no bucket id in appended file name $name"))
          .group(1).toInt
      }
      assert(newBuckets.nonEmpty && newBuckets.subsetOf(touched),
        s"batch wrote buckets $newBuckets outside its term buckets $touched")
    }
  }
}
