package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the events stream.
  *
  * The reference is batch-only (SURVEY §2.7: "no streaming
  * whatsoever"), but the engine's event table IS a stream at rest —
  * these transforms are written against unbounded DataFrames
  * (`readStream` → transform → `writeStream`) and work identically on
  * batch frames, which is how the specs drive them (MemoryStream) and
  * how the bench replays them over the parquet table.
  *
  * Scale notes: the watermark bounds state: late rows beyond it are
  * dropped and window state is evicted, so state size is
  * O(active windows × groups), not O(stream length). Aggregations
  * shuffle on the group key exactly like their batch twins.
  */
object Streaming {

  /** Watermarked tumbling-window rollup per event type: the streaming
    * twin of q06's hourly batch rollup. 10-minute allowed lateness. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_value"))

  /** Per-user session windows with an inactivity gap — native
    * `session_window`, state evicted by the watermark. */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup: drop rows whose fingerprint was already
    * seen, with state bounded by the watermark —
    * `dropDuplicatesWithinWatermark` evicts fingerprints older than
    * the allowed lateness instead of keeping them forever (the
    * difference between O(stream) and O(window) state at ingest
    * scale). The batch twin is Dedup.exact/q30. */
  def dedupStream(events: DataFrame, fpCol: String, lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(fpCol)

  /** Stream-stream inner join within an event-time bound — the
    * impressions⋈clicks shape of event pipelines (here: which errors
    * followed a click). Both inputs are watermarked, and `cond` must
    * carry an event-time RANGE constraint between the two time
    * columns (e.g. `rTs >= lTs && rTs <= lTs + INTERVAL 12 HOURS`):
    * Spark derives each side's state-eviction watermark from that
    * range, so join state is bounded by watermark + window, not by
    * stream length. Matches are emitted as they are found (inner-join
    * append semantics); input rows older than the global watermark
    * minus the allowed lateness are DROPPED at ingest — the batch
    * twin of this operator is [[graft.operators.RangeJoin]], and
    * q83's oracle checks the drained stream against exactly that
    * batch formulation.
    *
    * `joinType` supports "inner" and the watermarked outer variants
    * ("left_outer"/"right_outer"/"full_outer"): an outer row's null
    * match is emitted only once the watermark proves no in-window
    * partner can still arrive — the streaming-correct version of
    * "clicks with no error within 12h". */
  def intervalJoin(left: DataFrame, leftTsCol: String,
                   right: DataFrame, rightTsCol: String,
                   cond: Column, lateness: String = "10 minutes",
                   joinType: String = "inner"): DataFrame =
    left.withWatermark(leftTsCol, lateness)
      .join(right.withWatermark(rightTsCol, lateness), cond, joinType)

  /** Event for the typed custom-state path. */
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  /** Running per-user aggregate emitted on every update. */
  case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state via flatMapGroupsWithState: a running
    * per-user counter that survives across micro-batches — the shape
    * to reach for when window/session semantics don't fit. State is
    * one small case class per active user; processing-time timeout
    * would bound it in production. */
  def runningPerUser(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { e => n += 1; tot += e.value }
          val next = UserRunning(uid, n, tot)
          state.update(next)
          Iterator(next)
      }
  }

  /** Wire a streaming source through a transform into an in-memory
    * sink and process everything currently available. Returns the
    * query name to select from.
    *
    * `statePartitions` sizes the state store: stateful streaming
    * reads `spark.sql.shuffle.partitions` ONCE at first micro-batch
    * and every partition carries its own state-store instance with
    * per-batch snapshot/commit overhead — a deployment knob that
    * should track state volume, not the batch session's default. The
    * session conf is restored afterwards so the batch plans around
    * the harness are untouched.
    *
    * CONCURRENCY CONTRACT: the override mutates the SESSION-global
    * `spark.sql.shuffle.partitions` for the duration of the run, so
    * any query planned concurrently on the same SparkSession would
    * silently pick up the streaming value. The declared-query harness
    * (Verify/Bench) is single-threaded, and the lock below serializes
    * overlapping runToMemory calls; a multi-tenant deployment should
    * instead run streams on `spark.newSession()` (per-session conf,
    * shared SparkContext). */
  private val confLock = new Object

  def runToMemory(spark: SparkSession, transformed: DataFrame, name: String,
                  outputMode: String = "append",
                  statePartitions: Int = 8): Unit = confLock.synchronized {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions)
    try {
      val q = transformed.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(outputMode)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.processAllAvailable()
      q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Drain a streaming source through a PER-MICRO-BATCH batch
    * transform (`foreachBatch`) until everything currently available
    * is processed — the harness for streaming operators whose batch
    * logic needs multiple aggregations or joins that Structured
    * Streaming's incremental planner cannot express in one stateful
    * query (e.g. MinHash signature derivation: two chained groupBys).
    * Inside `fn` the micro-batch is an ordinary DataFrame with the
    * full batch API; the contract is that `fn`'s effect is
    * batch-partition independent (each input row's output depends
    * only on that row and STATIC tables), so the drained union equals
    * the batch replay regardless of how the source splits batches.
    * No state store is involved and the session conf is untouched —
    * no lock needed. */
  def runForeachBatch(spark: SparkSession, src: DataFrame,
                      fn: (DataFrame, Long) => Unit): Unit =
    runDrain(src, None, fn)

  /** [[runForeachBatch]] with a DURABLE checkpoint — the production
    * ingest loop: files land in the source directory, the drain
    * re-runs on a schedule, and only data not already committed under
    * `checkpointDir` reaches the sink (a fresh run of the same
    * (source, checkpoint) pair after new files arrive delivers
    * exactly the delta; StreamingSpec drives two runs into one IVF
    * index and gates the final lists against a single batch
    * assignment). The one-shot harness queries keep
    * [[runForeachBatch]]'s per-run temp checkpoint deliberately —
    * their gates compare a COMPLETE drain against a batch replay.
    * foreachBatch's standard contract still applies across CRASHES:
    * a batch whose `fn` ran but whose checkpoint commit did not land
    * is re-run on restart, so a sink needs per-batchId idempotence
    * for exactly-once under mid-batch failure. The engine's append
    * sinks provide it — [[ExactlyOnce]] and the per-machinery
    * `appendToIndexIdempotent` / `appendToRegisterIdempotent` /
    * `writePostingsIdempotent` variants (q185/q186 declare the
    * contract under injected re-deliveries); a drain wired to the
    * RAW appends still fails loudly at the index-equality gates
    * rather than duplicating silently. */
  def runForeachBatchResumable(spark: SparkSession, src: DataFrame,
                               checkpointDir: String,
                               fn: (DataFrame, Long) => Unit): Unit =
    runForeachBatchResumable(spark, src, checkpointDir, fn, Nil)

  /** [[runForeachBatchResumable]] that also RETIRES the exactly-once
    * ledgers it feeds: after the drain completes, every ledger in
    * `sweepLedgers` drops its markers below the checkpoint's
    * committed low-watermark ([[checkpointWatermark]] — batch ids
    * the commit log has passed can never be re-delivered, so their
    * markers are dead weight; [[ExactlyOnce.sweepLedger]] states the
    * contract). This is what keeps a years-lived ingest stream's
    * ledger at O(live window) instead of one marker file per batch
    * forever. Pass the same ledger dirs the batch fn's idempotent
    * appends write (`<index>/applied__appends`, the register's
    * `<base>__applied`, …). */
  def runForeachBatchResumable(spark: SparkSession, src: DataFrame,
                               checkpointDir: String,
                               fn: (DataFrame, Long) => Unit,
                               sweepLedgers: Seq[java.io.File]): Unit = {
    runDrain(src, Some(checkpointDir), fn)
    if (sweepLedgers.nonEmpty)
      checkpointWatermark(checkpointDir).foreach { wm =>
        sweepLedgers.foreach(graft.streaming.ExactlyOnce.sweepLedger(_, wm))
      }
  }

  /** The checkpoint's committed LOW-WATERMARK: every batch id
    * strictly below the returned value has its commit recorded in
    * `checkpointDir/commits` and can never be re-delivered by a
    * restart of this checkpoint — the retirement bound
    * [[ExactlyOnce.sweepLedger]] takes. Returns maxCommitted + 1
    * (markers for committed batches are retirable INCLUSIVE of the
    * last: a batch whose commit landed never re-runs), or None for a
    * checkpoint that has never committed a batch. One directory
    * listing of batch-id-named commit files; never a data read. */
  def checkpointWatermark(checkpointDir: String): Option[Long] = {
    val ids = Option(new java.io.File(checkpointDir, "commits").listFiles())
      .toSeq.flatten.filter(_.isFile)
      .flatMap(f => scala.util.Try(f.getName.toLong).toOption)
    if (ids.isEmpty) None else Some(ids.max + 1)
  }

  /** The one drain harness both entry points share: AvailableNow
    * foreachBatch, optionally under a durable checkpoint. */
  private def runDrain(src: DataFrame, checkpointDir: Option[String],
                       fn: (DataFrame, Long) => Unit): Unit = {
    val w0 = src.writeStream
      .foreachBatch(fn)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    val q = checkpointDir
      .fold(w0)(c => w0.option("checkpointLocation", c))
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
