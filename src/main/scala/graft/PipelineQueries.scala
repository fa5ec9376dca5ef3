package graft

import graft.functions.VectorF._
import graft.multimodal.Multimodal
import graft.streaming.Streaming
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal + streaming query catalog. q50 exercises the binary
  * column path (documents' text bytes standing in for media blobs —
  * same typed plumbing); q60 runs the streaming sessionizer in batch
  * mode over the events table, with a gaps-and-islands SQL oracle.
  */
object PipelineQueries {

  /** Binary content analysis: byte size, binary-safe fingerprint,
    * sniffed format, and the first two stub features. Per-row
    * expressions only — scales with the scan. */
  def q50BinaryFeatures(s: SparkSession, dir: String): DataFrame = {
    val bin = col("text").cast("binary")
    val feats = Multimodal.featureStub(bin, 4)
    graft.sources.Tables.load(s, dir, "documents")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"),
        Multimodal.byteSize(bin).as("n_bytes"),
        Multimodal.fingerprint(bin).as("fp"),
        Multimodal.sniffFormat(bin).as("fmt"),
        round(element_at(feats, 1), 6).as("feat0"),
        round(element_at(feats, 2), 6).as("feat1"))
      .orderBy("doc_id")
  }

  val q50Sql: String = {
    val h = "('0x' || substr(md5(text), 1, 8))::BIGINT"
    def feat(j: Int) = s"ROUND((($h * ${j + 21} + $j * 7919) % 1000003) / 1000003.0 - 0.5, 6)"
    // the magic-byte CASE replays Multimodal.sniffFormat exactly:
    // hex() of the UTF-8 bytes, prefix-matched per format — a document
    // whose text happens to begin with 'RIFF' etc. must sniff the same
    // in both engines
    val fmt =
      """CASE WHEN substr(hex(encode(text)), 1, 8) = '89504E47' THEN 'png'
              WHEN substr(hex(encode(text)), 1, 6) = 'FFD8FF'   THEN 'jpeg'
              WHEN substr(hex(encode(text)), 1, 8) = '47494638' THEN 'gif'
              WHEN substr(hex(encode(text)), 1, 4) = '424D'     THEN 'bmp'
              WHEN substr(hex(encode(text)), 1, 8) = '52494646' THEN 'riff'
              WHEN substr(hex(encode(text)), 1, 8) = '1A45DFA3' THEN 'matroska'
              ELSE 'unknown' END"""
    s"""SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS fp,
       $fmt AS fmt,
       ${feat(0)} AS feat0,
       ${feat(1)} AS feat1
       FROM documents WHERE doc_id < 200 ORDER BY doc_id"""
  }

  /** Per-user session windows (30-minute gap) over the events table —
    * the Structured Streaming sessionizer run in batch mode; the
    * oracle replays it as gaps-and-islands SQL. Timestamps emitted as
    * epoch micros so both engines hash identically. */
  def q60Sessionize(s: SparkSession, dir: String): DataFrame =
    Streaming.sessionize(Queries.eventsTable(s, dir), "30 minutes")
      .select(col("user_id"),
        unix_micros(col("session_start")).as("start_us"),
        col("n_events"),
        round(col("sum_value") * 100).cast("long").as("sum_value_c"))
      .orderBy("user_id", "start_us")

  val q60Sql: String =
    """WITH lagd AS (SELECT user_id, ts, value,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events),
       flag AS (SELECT *, CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE
           THEN 1 ELSE 0 END AS new_s FROM lagd),
       sess AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
           ROWS UNBOUNDED PRECEDING) AS sid FROM flag)
       SELECT user_id, CAST(epoch_us(MIN(ts)) AS BIGINT) AS start_us,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
       FROM sess GROUP BY user_id, sid ORDER BY user_id, start_us"""

  /** Stage the events table into a file-stream source dir and open it
    * as a readStream with `ts` restored, shared by the streaming-
    * harness queries (q61, q69). events.parquet may be a single file
    * (testdata layout) or a Spark-written directory — stage either
    * shape recursively. The stage target is DELETED first:
    * directory-shaped sources have run-unique part-file names, and a
    * replace-only copy would accumulate stale parts across runs
    * (duplicated events ≠ the batch oracle). The copy itself is
    * read-only staging (not a write-under-test), so ONE staged copy
    * per (session, dir-content) serves every streaming query. */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    val stage = Memo.cachedValue(s, dir, "events_stage") {
      val path = roundtripPath(dir, "events_stream")
      val root = new java.io.File(path)
      FileTree.delete(root)
      root.mkdirs()
      // FLATTEN into the stage dir: the source may be the testdata's
      // single file OR a Spark-written directory (part files +
      // _SUCCESS/.crc markers). Part files must land as TOP-LEVEL
      // files — neither the batch schema read nor the file-stream
      // source descends into a non-partition subdirectory, so the
      // nested-copy staging of the directory shape read zero files
      // (surfaced by the 10× ScaleProbe corpus, whose events table is
      // directory-shaped). Markers are skipped; parquet part-file
      // names are run-unique, hence the full stage delete above.
      def copyFile(src: java.io.File): Unit = {
        java.nio.file.Files.copy(src.toPath,
          new java.io.File(root, src.getName).toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING); ()
      }
      val src = new java.io.File(s"$dir/events.parquet")
      if (src.isFile) copyFile(src)
      else Option(src.listFiles()).toSeq.flatten
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
        .foreach(copyFile)
      path
    }
    val schema = s.read.parquet(stage).schema
    val raw = s.readStream.schema(schema).parquet(stage)
    // ts arrives as raw nanos under nanosAsLong, or as TIMESTAMP_NTZ
    // when the file stores naive micros — restore, as in batch
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** q60's sessionizer executed UNDER THE LIVE STREAMING HARNESS:
    * readStream file source over the events parquet → session_window
    * aggregation → memory sink, Trigger.AvailableNow, complete output
    * (all session state emitted once the source drains). Complete
    * mode makes the streaming result equal the batch result row for
    * row, so this query shares q60's gaps-and-islands DuckDB oracle —
    * the streaming path sits under the correctness gate AND gets a
    * timed bench artifact, not just a MemoryStream spec. */
  def q61StreamSessionize(s: SparkSession, dir: String): DataFrame = {
    val events = eventsStream(s, dir)
    val sink = "q61_sessions_" + sanitizeTag(dir)
    Streaming.runToMemory(s, Streaming.sessionize(events, "30 minutes"),
      sink, "complete")
    s.table(sink)
      .select(col("user_id"),
        unix_micros(col("session_start")).as("start_us"),
        col("n_events"),
        round(col("sum_value") * 100).cast("long").as("sum_value_c"))
      .orderBy("user_id", "start_us")
  }

  /** APPEND-MODE streaming sessionize — the bounded-emission twin of
    * q61's complete-mode drain. Complete mode re-emits EVERY standing
    * session each micro-batch, so emission grows as state × batches
    * (the 13.6× asterisk on q61's 10× probe); append mode emits each
    * session EXACTLY ONCE, when the watermark passes its end, so
    * per-batch emission is bounded by the sessions that actually
    * closed. The staging range-splits the events into four ts-ordered
    * files with ascending mtimes (the q99 in-order micro-batch
    * discipline), so the watermark advances between batches and
    * sessions flush INCREMENTALLY — never one final dump — and a
    * SENTINEL punctuation event (user_id = −1, three days past the
    * last real event, the production heartbeat that bounds
    * stream-end latency) closes the tail sessions still within the
    * lateness allowance. The drained sink, sentinel filtered out,
    * equals the batch sessionizer row for row — q60's
    * gaps-and-islands oracle checks it. */
  def q111StreamSessionizeAppend(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stage = graft.Memo.cachedValue(s, dir, "q111_stage") {
      val ev = Queries.eventsTable(s, dir)
        .select(col("ts"), col("user_id"), col("value"))
      val p = stageOrderedFiles(ev, "ts", 4, roundtripPath(dir, "q111_stream"))
      // the sentinel appends AFTER the mtime pin, so its now-mtime
      // makes it the last micro-batch (the punctuation flush)
      val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
      Seq((new java.sql.Timestamp(maxTs.getTime + 3L * 24 * 3600 * 1000),
          -1L, 0.0))
        .toDF("ts", "user_id", "value").coalesce(1)
        .write.mode("append").parquet(p)
      p
    }
    val schema = s.read.parquet(stage).schema
    val src = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val sink = "q111_sessions_" + sanitizeTag(dir)
    Streaming.runToMemory(s, Streaming.sessionize(src, "30 minutes"),
      sink, "append")
    s.table(sink)
      .filter(col("user_id") >= 0)
      .select(col("user_id"),
        unix_micros(col("session_start")).as("start_us"),
        col("n_events"),
        round(col("sum_value") * 100).cast("long").as("sum_value_c"))
      .orderBy("user_id", "start_us")
  }

  /** Stream-static join under the live harness: the event stream is
    * enriched with the STATIC customer dimension (the canonical
    * streaming-enrichment shape — the dimension is broadcast per
    * micro-batch, no stream-stream state), then aggregated per
    * (segment, event_type) in complete mode so the streaming result
    * equals the batch join row for row — which is exactly what the
    * plain-SQL oracle checks. */
  def q69StreamEnrich(s: SparkSession, dir: String): DataFrame = {
    val events = eventsStream(s, dir)
    val dim = graft.sources.Tables.load(s, dir, "customer")
      .filter(col("c_custkey") < 150)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val enriched = events
      .select(col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("vc"))
      .join(broadcast(dim), "user_id")
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("vc")).as("sum_value_c"))
    val sink = "q69_enrich_" + sanitizeTag(dir)
    Streaming.runToMemory(s, enriched, sink, "complete")
    s.table(sink).orderBy("c_mktsegment", "event_type")
  }

  /** q06's hourly rollup executed UNDER THE LIVE STREAMING HARNESS:
    * watermarked 1-hour tumbling windows (`window(ts, '1 hour')`
    * starts are epoch-hour-aligned, identical to `date_trunc`),
    * values pre-scaled to integer cents so the windowed sum is exact
    * in any accumulation order. Complete mode drains every window
    * once the AvailableNow source is exhausted, so the streaming
    * result equals the batch rollup row for row — q06's oracle
    * checks it. */
  def q82StreamHourly(s: SparkSession, dir: String): DataFrame = {
    val events = eventsStream(s, dir)
    val agg = events
      .select(col("ts"), col("event_type"),
        round(col("value") * 100).cast("long").as("vc"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("vc")).as("sum_value_c"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value_c"))
    val sink = "q82_hourly_" + sanitizeTag(dir)
    Streaming.runToMemory(s, agg, sink, "complete")
    s.table(sink).orderBy("hour", "event_type")
  }

  /** STREAM-STREAM watermarked join under the live harness: the
    * click stream joined to the error stream on user within 12 hours
    * after the click — q66's range-join attribution, re-expressed as
    * two watermarked streams through [[Streaming.intervalJoin]]. The
    * AvailableNow file source delivers the staged events in one
    * micro-batch, so no row is late and the drained inner join equals
    * the batch range join row for row — q66's DuckDB oracle checks
    * it; StreamingSpec covers the late/dropped-row semantics the
    * batch oracle can't see. */
  def q83StreamStreamJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsStream(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("e_event_id"),
        col("user_id").as("e_user_id"), col("ts").as("e_ts"))
    val joined = Streaming.intervalJoin(clicks, "ts", errors, "e_ts",
      col("user_id") === col("e_user_id") &&
        col("e_ts") >= col("ts") &&
        col("e_ts") <= col("ts") + expr("INTERVAL 12 HOURS"))
      .select(col("event_id"), col("e_event_id"),
        (unix_micros(col("e_ts")) - unix_micros(col("ts"))).as("delta_us"))
    val sink = "q83_ssjoin_" + sanitizeTag(dir)
    Streaming.runToMemory(s, joined, sink, "append")
    s.table(sink).orderBy("event_id", "e_event_id")
  }

  // ---------- q85: real PNG decode ----------

  /** Deterministic RGB test pattern per media id: dims vary with the
    * id, every channel is an affine function of (x, y, id) mod 256 —
    * closed-form enough that the DuckDB oracle recomputes the exact
    * pixel sums from the formula while the Spark side must round-trip
    * them through a REAL encode → decode. */
  val pngN = 50
  val pngWBase = 16; val pngWMod = 5
  val pngHBase = 12; val pngHMod = 3
  private[graft] def pngPattern(id: Long): (Int, Int, Array[Byte]) = {
    val w = pngWBase + (id % pngWMod).toInt
    val h = pngHBase + (id % pngHMod).toInt
    val px = new Array[Byte](w * h * 3)
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(i) = ((x * 7 + y * 3 + id * 13) % 256).toByte
        px(i + 1) = ((x * 5 + y * 11 + id * 17) % 256).toByte
        px(i + 2) = ((x * 3 + y * 13 + id * 19) % 256).toByte
        i += 3
        x += 1
      }
      y += 1
    }
    (w, h, px)
  }

  /** The shared pattern→encode→sniff→decode→exact-channel-sums
    * pipeline behind q85/q90, parameterized over the per-id encoder
    * and the decoder — ONE pixel-sum implementation, two container
    * stories. Both codec steps are per-partition batched
    * ([[MediaFeatures]] shape) — media bytes never visit the driver;
    * the per-row imperative work is exactly the codec boundary
    * mapPartitions exists for. */
  private def channelSums(s: SparkSession,
                          encode: Long => Array[Byte],
                          decode: Array[Byte] => graft.multimodal.Png.Image)
      : DataFrame = {
    import s.implicits._
    s.range(pngN).select(col("id").as("media_id")).as[Long]
      .mapPartitions(_.map(id => (id, encode(id))))
      .toDF("media_id", "media")
      .select(col("media_id"), col("media"),
        Multimodal.sniffFormat(col("media")).as("fmt"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.map { case (id, bytes, fmt) =>
        val img = decode(bytes)
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < img.pixels.length) {
          sr += img.pixels(i) & 0xFF
          sg += img.pixels(i + 1) & 0xFF
          sb += img.pixels(i + 2) & 0xFF
          i += 3
        }
        (id, fmt, img.width.toLong, img.height.toLong, sr, sg, sb)
      })
      .toDF("media_id", "fmt", "width", "height", "sum_r", "sum_g", "sum_b")
      .orderBy("media_id")
  }

  /** REAL media decode under the oracle gate: generate the pattern,
    * encode it as an actual PNG (deflate + chunks + CRC), carry the
    * binary column through the relational magic-byte sniff, DECODE
    * the pixels back (inflate + unfilter), and aggregate exact
    * integer channel sums per image. The oracle computes the same
    * sums directly from the pattern formula, so a single wrong byte
    * anywhere in the codec path breaks the hash match. */
  def q85PngStats(s: SparkSession, dir: String): DataFrame =
    channelSums(s,
      id => { val (w, h, px) = pngPattern(id); graft.multimodal.Png.encode(w, h, px) },
      graft.multimodal.Png.decode)

  /** The pattern replayed relationally: a bounded (x, y) grid filtered
    * to each image's dims, channel formulas verbatim. */
  val q85Sql: String =
    s"""WITH ids AS (SELECT unnest(generate_series(0, ${pngN - 1})) AS media_id),
       dims AS (SELECT media_id, $pngWBase + media_id % $pngWMod AS w,
                       $pngHBase + media_id % $pngHMod AS h FROM ids),
       xs AS (SELECT unnest(generate_series(0, ${pngWBase + pngWMod - 2})) AS x),
       ys AS (SELECT unnest(generate_series(0, ${pngHBase + pngHMod - 2})) AS y),
       px AS (SELECT media_id, w, h,
                (x*7 + y*3 + media_id*13) % 256 AS r,
                (x*5 + y*11 + media_id*17) % 256 AS g,
                (x*3 + y*13 + media_id*19) % 256 AS b
              FROM dims, xs, ys WHERE x < w AND y < h)
       SELECT CAST(media_id AS BIGINT) AS media_id, 'png' AS fmt,
         CAST(MIN(w) AS BIGINT) AS width, CAST(MIN(h) AS BIGINT) AS height,
         CAST(SUM(r) AS BIGINT) AS sum_r, CAST(SUM(g) AS BIGINT) AS sum_g,
         CAST(SUM(b) AS BIGINT) AS sum_b
       FROM px GROUP BY media_id ORDER BY media_id"""

  /** MIXED-FORMAT media decode under the oracle gate: the same
    * deterministic pattern as q85, but the binary column holds TWO
    * real containers — JDK-written BMP for even ids, the engine's own
    * PNG for odd ids — and every row flows through the relational
    * magic-byte dispatch into ONE decoder ([[graft.multimodal
    * .ImageIoCodec]], which also cross-validates the hand-rolled PNG
    * encoder against the JDK's independent PNG reader). Both
    * containers are lossless, so exact integer channel sums replay
    * from the pattern formula; the format column pins the dispatch. */
  def q90MixedMedia(s: SparkSession, dir: String): DataFrame =
    channelSums(s,
      id => {
        val (w, h, px) = pngPattern(id)
        if (id % 2 == 0) graft.multimodal.ImageIoCodec.encodeBmp(w, h, px)
        else graft.multimodal.Png.encode(w, h, px)
      },
      graft.multimodal.ImageIoCodec.decodeRgb)

  /** q85's formula replay with the per-id container in the fmt
    * column. */
  val q90Sql: String =
    s"""WITH ids AS (SELECT unnest(generate_series(0, ${pngN - 1})) AS media_id),
       dims AS (SELECT media_id, $pngWBase + media_id % $pngWMod AS w,
                       $pngHBase + media_id % $pngHMod AS h FROM ids),
       xs AS (SELECT unnest(generate_series(0, ${pngWBase + pngWMod - 2})) AS x),
       ys AS (SELECT unnest(generate_series(0, ${pngHBase + pngHMod - 2})) AS y),
       px AS (SELECT media_id, w, h,
                (x*7 + y*3 + media_id*13) % 256 AS r,
                (x*5 + y*11 + media_id*17) % 256 AS g,
                (x*3 + y*13 + media_id*19) % 256 AS b
              FROM dims, xs, ys WHERE x < w AND y < h)
       SELECT CAST(media_id AS BIGINT) AS media_id,
         CASE WHEN media_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS fmt,
         CAST(MIN(w) AS BIGINT) AS width, CAST(MIN(h) AS BIGINT) AS height,
         CAST(SUM(r) AS BIGINT) AS sum_r, CAST(SUM(g) AS BIGINT) AS sum_g,
         CAST(SUM(b) AS BIGINT) AS sum_b
       FROM px GROUP BY media_id ORDER BY media_id"""

  // ---------- q152: multimodal near-dup (dHash + Hamming bands) ----------

  /** The image near-dup corpus: [[pngPattern]]'s formula for base ids,
    * and for ids ≥ [[dhashBase]] a NEAR-DUPLICATE of id − dhashBase —
    * same dims, same pattern, with the leftmost dHash cell column
    * brightened by a clamped +25 per channel (a deterministic "edited
    * crop-corner" perturbation: byte-different pixels, close
    * fingerprint — only the column-0/1 comparisons can flip, ≤ 8 of
    * 64 bits). Closed-form, so the oracle replays pixels, grid sums,
    * bits, bands, and Hamming distances exactly. */
  val dhashN = 60
  val dhashBase = 40
  val dhashTau = 12
  private[graft] def dhashPattern(id: Long): (Int, Int, Array[Byte]) = {
    val src = if (id >= dhashBase) id - dhashBase else id
    val (w, h, px) = pngPattern(src)
    if (id >= dhashBase) {
      var y = 0; var i = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          if (x < w / 9) {
            px(i) = math.min(255, (px(i) & 0xFF) + 25).toByte
            px(i + 1) = math.min(255, (px(i + 1) & 0xFF) + 25).toByte
            px(i + 2) = math.min(255, (px(i + 2) & 0xFF) + 25).toByte
          }
          i += 3; x += 1
        }
        y += 1
      }
    }
    (w, h, px)
  }

  /** 64-bit dHash of a decoded image: integer luma
    * (299r + 587g + 114b)/1000, average-pooled onto a 9×8 grid
    * (cx = x·9/w, cy = y·8/h — every cell non-empty since
    * w ≥ 9, h ≥ 8), bit k = cx·8+cy set when the right cell's mean
    * exceeds the left's (exact cross-multiplied compare — no float
    * division anywhere, so Spark and the SQL replay agree bit for
    * bit). The packing is COLUMN-MAJOR deliberately: a 16-bit band
    * is then two adjacent cell COLUMNS, so a spatially-local edit
    * (the planted corner perturbation, a watermark, a cropped edge)
    * dirties few bands and the pair still meets through a clean one
    * — row-major packing smears one edited column across all four
    * bands and the banded join misses exactly the near-dups it
    * exists to find. The per-image work is the codec boundary
    * (mapPartitions, like q85's channel sums); everything after the
    * hash is relational. */
  /** The shared 9×8 grid-pool + compare + column-major pack over any
    * luma accessor. An empty cell (an image narrower than 9 or
    * shorter than 8 grid units) makes both cross-products 0, so its
    * comparisons yield bit 0 deterministically — the SQL replay's
    * absent-join-row contributes the same 0 to the band sum. */
  private[graft] def dhashGrid(w: Int, h: Int)(luma: (Int, Int) => Long): Long = {
    val sums = Array.ofDim[Long](8, 9)
    val cnts = Array.ofDim[Long](8, 9)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cx = x * 9 / w; val cy = y * 8 / h
        sums(cy)(cx) += luma(x, y)
        cnts(cy)(cx) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        if (sums(cy)(cx + 1) * cnts(cy)(cx) > sums(cy)(cx) * cnts(cy)(cx + 1))
          hash |= 1L << (cx * 8 + cy)
        cx += 1
      }
      cy += 1
    }
    hash
  }

  private[graft] def dhash64(img: graft.multimodal.Png.Image): Long =
    dhashGrid(img.width, img.height) { (x, y) =>
      val i = (y * img.width + x) * 3
      val r = img.pixels(i) & 0xFF
      val g = img.pixels(i + 1) & 0xFF
      val b = img.pixels(i + 2) & 0xFF
      ((299 * r + 587 * g + 114 * b) / 1000).toLong
    }

  /** dHash of one raw luma plane (the video frame case — Y4M's Y
    * plane IS the luma, no RGB conversion). */
  private[graft] def dhashY(w: Int, h: Int, py: Array[Byte]): Long =
    dhashGrid(w, h)((x, y) => (py(y * w + x) & 0xFF).toLong)

  /** MULTIMODAL NEAR-DUP — the image dedup cell of the training-data
    * matrix (text has MinHash/SimHash/cosine; images get perceptual
    * dHash): encode each corpus image as a REAL PNG, decode it back,
    * dHash the decoded bitmap ([[dhash64]] — the whole codec round
    * trip is under the gate), then find near-duplicates RELATIONALLY
    * with the SimHash band discipline (`dedup/Dedup` q32): the
    * 64-bit fingerprint splits into four 16-bit bands, candidates
    * meet through a (band, value) equi-join — two images compare iff
    * they agree exactly on at least one band, NEVER all-pairs (the
    * planted column-0 perturbation dirties only band 0 under the
    * column-major packing; any pair whose differing bits cluster in
    * ≤ 3 bands shares a clean one) — and survivors are verified by exact
    * Hamming distance (bit_count(xor), codegen'd). At 100 TB the
    * band value is the shuffle key and pair work tracks candidate
    * count, the exact q32/q33 scale story. The oracle replays
    * pixels → luma grid → bits → bands → join → popcount from the
    * closed-form pattern, so one wrong byte anywhere in
    * encode/decode/hash/band/join breaks the hash match. */
  def q152ImageNeardup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.Png
    val feats = s.range(dhashN).select(col("id").as("media_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h, px) = dhashPattern(id)
        (id, dhash64(Png.decode(Png.encode(w, h, px))))
      })
      .toDF("media_id", "dhash")
      // one long per image — the feature table the banded join reads
      // twice (self-join sides)
      .localCheckpoint()
    val bands = feats.select(col("media_id"),
        posexplode(array((0 until 4).map(j =>
          shiftright(col("dhash"), j * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .toDF("media_id", "band", "bval")
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("a"), col("b.media_id").as("b"))
      .distinct()
    cand
      .join(feats.select(col("media_id").as("a"), col("dhash").as("ha")), "a")
      .join(feats.select(col("media_id").as("b"), col("dhash").as("hb")), "b")
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= dhashTau)
      .select(col("a"), col("b"), col("hamming"))
      .orderBy("a", "b")
  }

  /** The closed-form replay: pixels (clamped perturbation included) →
    * integer luma → 9×8 grid sums → cross-multiplied bits → 16-bit
    * band values (the packed 64-bit hash is never materialized in
    * SQL — bit 63 would wrap a BIGINT; Hamming sums per-band
    * popcounts instead, which is the same number) → band equi-join →
    * tau filter. */
  val q152Sql: String =
    s"""WITH ids AS (SELECT unnest(generate_series(0, ${dhashN - 1})) AS id),
       src AS (SELECT id, CASE WHEN id >= $dhashBase THEN id - $dhashBase ELSE id END AS s FROM ids),
       dims AS (SELECT id, s, $pngWBase + s % $pngWMod AS w,
                       $pngHBase + s % $pngHMod AS h FROM src),
       xs AS (SELECT unnest(generate_series(0, ${pngWBase + pngWMod - 2})) AS x),
       ys AS (SELECT unnest(generate_series(0, ${pngHBase + pngHMod - 2})) AS y),
       px AS (SELECT id, w, h, x, y,
                LEAST(255, (x*7 + y*3 + s*13) % 256 +
                  CASE WHEN id >= $dhashBase AND x < w // 9 THEN 25 ELSE 0 END) AS r,
                LEAST(255, (x*5 + y*11 + s*17) % 256 +
                  CASE WHEN id >= $dhashBase AND x < w // 9 THEN 25 ELSE 0 END) AS g,
                LEAST(255, (x*3 + y*13 + s*19) % 256 +
                  CASE WHEN id >= $dhashBase AND x < w // 9 THEN 25 ELSE 0 END) AS b
              FROM dims, xs, ys WHERE x < w AND y < h),
       lum AS (SELECT id, (x*9) // w AS cx, (y*8) // h AS cy,
                 (299*r + 587*g + 114*b) // 1000 AS l FROM px),
       cells AS (SELECT id, cy, cx, SUM(l) AS sm, COUNT(*) AS cnt
                 FROM lum GROUP BY id, cy, cx),
       bits AS (SELECT c1.id, c1.cy, c1.cx,
                  CASE WHEN c2.sm * c1.cnt > c1.sm * c2.cnt THEN 1 ELSE 0 END AS bit
                FROM cells c1 JOIN cells c2
                  ON c1.id = c2.id AND c1.cy = c2.cy AND c2.cx = c1.cx + 1
                WHERE c1.cx < 8),
       bands AS (SELECT id, (cx*8 + cy) // 16 AS band,
                   CAST(SUM(bit * (1 << ((cx*8 + cy) % 16))) AS BIGINT) AS bval
                 FROM bits GROUP BY id, (cx*8 + cy) // 16),
       cand AS (SELECT DISTINCT a.id AS a, b.id AS b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.bval = b.bval AND a.id < b.id),
       ham AS (SELECT cand.a, cand.b,
                 CAST(SUM(bit_count(xor(ba.bval, bb.bval))) AS BIGINT) AS hamming
               FROM cand
               JOIN bands ba ON ba.id = cand.a
               JOIN bands bb ON bb.id = cand.b AND bb.band = ba.band
               GROUP BY cand.a, cand.b)
       SELECT a, b, hamming FROM ham WHERE hamming <= $dhashTau ORDER BY a, b"""

  // ---------- q153: video near-dup (frame-aligned dHash) ----------

  /** The video near-dup corpus: q92's Y4M clip formulas for base
    * ids; ids ≥ [[vdupBase]] are NEAR-DUPLICATES of id − vdupBase —
    * same dims and frame count, Y plane's first pixel column
    * brightened by a clamped +25 per frame (the q152 perturbation on
    * the temporal axis: byte-different every frame, close per-frame
    * fingerprint — only grid-column-0 comparisons can flip). */
  val vdupN = 40
  val vdupBase = 25
  val vdupTau = 12
  private[graft] def vdupClip(id: Long)
      : (Int, Int, Seq[(Array[Byte], Array[Byte], Array[Byte])]) = {
    val src = if (id >= vdupBase) id - vdupBase else id
    val (w, h, n) = y4mDims(src)
    val frames = (0 until n).map { f =>
      val (py, pu, pv) = y4mFrame(src, w, h, f)
      if (id >= vdupBase) {
        var y = 0
        while (y < h) {
          py(y * w) = math.min(255, (py(y * w) & 0xFF) + 25).toByte
          y += 1
        }
      }
      (py, pu, pv)
    }
    (w, h, frames)
  }

  /** VIDEO NEAR-DUP — q152's perceptual dedup on the temporal axis,
    * the operator a multimodal training pipeline runs against
    * re-encoded/re-uploaded clips: each clip round-trips through a
    * REAL Y4M container (encode → decode), every STRIDE-SAMPLED
    * frame's Y plane reduces to a 64-bit dHash ([[dhashY]] — the Y
    * plane IS luma, no RGB conversion; per-clip work is the codec
    * boundary), and clip pairs meet RELATIONALLY through a
    * FRAME-ALIGNED band join: candidates agree on (frame_idx, band,
    * value) — temporal alignment rides the equi-join key, so a clip
    * only ever compares against clips that look alike at the SAME
    * sampled offset, never all-pairs — and survivors verify by exact
    * integer Hamming SUMMED over every aligned sampled frame,
    * admitted when ham_sum ≤ tau × frames_compared (integer compare,
    * no float means). Output (a, b, n_frames, ham_sum). At 100 TB
    * the (frame, band, value) triple is the shuffle key and pair
    * work tracks collision mass — the q152/q32 layout with time in
    * the key. Fully oracled from the closed-form plane formulas;
    * MultimodalSpec pins that every planted perturbed clip pair
    * survives both the banding and the tau gate. */
  def q153VideoNeardup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.Y4m
    val feats = s.range(vdupN).select(col("id").as("media_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val (w, h, frames) = vdupClip(id)
        val clip = Y4m.decode(Y4m.encode(w, h, frames))
        (0 until clip.nFrames).filter(_ % y4mStride == 0).map { f =>
          val (py, _, _) = clip.frame(f)
          (id, f.toLong, dhashY(clip.width, clip.height, py))
        }
      })
      .toDF("media_id", "frame_idx", "dhash")
      // one long per sampled frame — read by both band-join sides
      // and the verify joins
      .localCheckpoint()
    val bands = feats.select(col("media_id"), col("frame_idx"),
        posexplode(array((0 until 4).map(j =>
          shiftright(col("dhash"), j * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .toDF("media_id", "frame_idx", "band", "bval")
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.frame_idx") === col("b.frame_idx") &&
          col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("a"), col("b.media_id").as("b"))
      .distinct()
    val fa = feats.select(col("media_id").as("a"), col("frame_idx"),
      col("dhash").as("ha"))
    val fb = feats.select(col("media_id").as("b"), col("frame_idx"),
      col("dhash").as("hb"))
    cand
      .join(fa, "a")
      .join(fb, Seq("b", "frame_idx")) // temporal alignment: frames in BOTH
      .withColumn("ham", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("n_frames"), sum(col("ham")).as("ham_sum"))
      .filter(col("ham_sum") <= lit(vdupTau) * col("n_frames"))
      .select(col("a"), col("b"), col("n_frames"), col("ham_sum"))
      .orderBy("a", "b")
  }

  /** The closed-form replay: Y-plane formula (clamped column-0
    * perturbation included) → per-(clip, sampled frame) 9×8 grid →
    * cross-multiplied bits → 16-bit bands (column-major — the packed
    * 64-bit hash is never materialized, per-band popcounts sum to
    * the same Hamming) → frame-aligned band equi-join → per-pair
    * Hamming summed over aligned frames → integer tau admit. LAZY:
    * interpolates [[y4mStride]], declared later in this object — an
    * eager val would bake its pre-init 0 into the SQL (the
    * q128Sql/q132Sql lesson, third edition). */
  lazy val q153Sql: String =
    s"""WITH ids AS (SELECT unnest(generate_series(0, ${vdupN - 1})) AS id),
       src AS (SELECT id, CASE WHEN id >= $vdupBase THEN id - $vdupBase ELSE id END AS s FROM ids),
       dims AS (SELECT id, s, 8 + s % 3 AS w, 6 + s % 2 AS h,
                       4 + (s % 3) * 2 AS n FROM src),
       fs AS (SELECT unnest(generate_series(0, 7)) AS f),
       xs AS (SELECT unnest(generate_series(0, 9)) AS x),
       ys AS (SELECT unnest(generate_series(0, 6)) AS y),
       px AS (SELECT id, w, h, f, x, y,
                LEAST(255, (x*3 + y*5 + f*17 + s*7) % 256 +
                  CASE WHEN id >= $vdupBase AND x = 0 THEN 25 ELSE 0 END) AS py
              FROM dims, fs, xs, ys
              WHERE f < n AND f % $y4mStride = 0 AND x < w AND y < h),
       lum AS (SELECT id, f, (x*9) // w AS cx, (y*8) // h AS cy, py AS l FROM px),
       cells AS (SELECT id, f, cy, cx, SUM(l) AS sm, COUNT(*) AS cnt
                 FROM lum GROUP BY id, f, cy, cx),
       bits AS (SELECT c1.id, c1.f, c1.cy, c1.cx,
                  CASE WHEN c2.sm * c1.cnt > c1.sm * c2.cnt THEN 1 ELSE 0 END AS bit
                FROM cells c1 JOIN cells c2
                  ON c1.id = c2.id AND c1.f = c2.f AND c1.cy = c2.cy
                    AND c2.cx = c1.cx + 1
                WHERE c1.cx < 8),
       bands AS (SELECT id, f, (cx*8 + cy) // 16 AS band,
                   CAST(SUM(bit * (1 << ((cx*8 + cy) % 16))) AS BIGINT) AS bval
                 FROM bits GROUP BY id, f, (cx*8 + cy) // 16),
       cand AS (SELECT DISTINCT a.id AS a, b.id AS b
                FROM bands a JOIN bands b
                  ON a.f = b.f AND a.band = b.band AND a.bval = b.bval
                    AND a.id < b.id),
       pf AS (SELECT cand.a, cand.b, ba.f,
                SUM(bit_count(xor(ba.bval, bb.bval))) AS ham
              FROM cand
              JOIN bands ba ON ba.id = cand.a
              JOIN bands bb ON bb.id = cand.b AND bb.f = ba.f
                AND bb.band = ba.band
              GROUP BY cand.a, cand.b, ba.f),
       pairs AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_frames,
                   CAST(SUM(ham) AS BIGINT) AS ham_sum
                 FROM pf GROUP BY a, b)
       SELECT a, b, n_frames, ham_sum FROM pairs
       WHERE ham_sum <= $vdupTau * n_frames ORDER BY a, b"""

  // ---------- q154: audio near-dup (windowed energy fingerprint) ----------

  /** The audio near-dup corpus: q91's sawtooth waveforms for base
    * ids; ids ≥ [[adupBase]] are NEAR-DUPLICATES of id − adupBase —
    * the same track with an EDITED INTRO: samples falling in grid
    * windows 0/4/8/12 (of 65) get +25. The perturbed windows are
    * non-adjacent, so every affected energy comparison pits an
    * edited window against a clean neighbor; all such comparison
    * bits are < 16, i.e. confined to band 0 under sequential
    * packing — the q152 "only column 0 can flip" contract on the
    * sample axis. */
  val adupN = 40
  val adupBase = 25
  val adupTau = 8
  private[graft] def adupSamples(id: Long): (Int, Array[Short]) = {
    val src = if (id >= adupBase) id - adupBase else id
    val (rate, s) = wavPattern(src)
    if (id >= adupBase) {
      val n = s.length
      var t = 0
      while (t < n) {
        val w = t * 65 / n
        if (w < 16 && w % 4 == 0) s(t) = (s(t) + 25).toShort
        t += 1
      }
    }
    (rate, s)
  }

  /** 64-bit audio fingerprint: mean absolute amplitude over 65
    * grid-pooled windows ([[dhashGrid]]'s pooling on one axis), bit
    * i = window i+1 louder than window i (cross-multiplied — no
    * division), packed SEQUENTIALLY so a temporally-local edit
    * dirties temporally-adjacent bits and therefore few bands. */
  private[graft] def afingerprint(samples: Array[Short]): Long = {
    val n = samples.length
    val sums = new Array[Long](65)
    val cnts = new Array[Long](65)
    var t = 0
    while (t < n) {
      val w = t * 65 / n
      sums(w) += math.abs(samples(t).toInt)
      cnts(w) += 1
      t += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (sums(i + 1) * cnts(i) > sums(i) * cnts(i + 1)) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** AUDIO NEAR-DUP — the third modality of the perceptual-dedup
    * matrix (image q152, video q153): each corpus track round-trips
    * through a REAL PCM16 WAV container (encode → decode under the
    * gate), the decoded samples reduce to a 64-bit windowed-energy
    * fingerprint ([[afingerprint]] — the loudness-profile analog of
    * dHash, the shape audio fingerprinting actually uses), and
    * near-duplicates meet RELATIONALLY through the SimHash band
    * discipline: 4×16-bit bands, (band, value) equi-join — a pair
    * compares iff it agrees exactly on some band, never all-pairs —
    * then exact integer Hamming verify (bit_count(xor), codegen'd).
    * At 100 TB the band value is the shuffle key and pair work
    * tracks collision mass, the q32/q152 layout verbatim; the
    * per-track codec decode is the only imperative boundary. Fully
    * oracled: DuckDB replays waveform → |v| window sums → bits →
    * bands → join → popcount from the closed-form formulas, so one
    * wrong byte in WAV encode/decode/fingerprint/banding breaks the
    * hash match. MultimodalSpec pins that every planted edited-intro
    * pair survives banding with Hamming ≤ 7 (its flippable bits are
    * exactly the ≤ 7 clean-vs-edited window comparisons). */
  def q154AudioNeardup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.Wav
    val feats = s.range(adupN).select(col("id").as("media_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (rate, samples) = adupSamples(id)
        (id, afingerprint(Wav.decode(Wav.encode(rate, 1, samples)).samples))
      })
      .toDF("media_id", "fp")
      // one long per track — read by both band-join sides and the
      // verify joins
      .localCheckpoint()
    val bands = feats.select(col("media_id"),
        posexplode(array((0 until 4).map(j =>
          shiftright(col("fp"), j * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .toDF("media_id", "band", "bval")
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("a"), col("b.media_id").as("b"))
      .distinct()
    cand
      .join(feats.select(col("media_id").as("a"), col("fp").as("ha")), "a")
      .join(feats.select(col("media_id").as("b"), col("fp").as("hb")), "b")
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= adupTau)
      .select(col("a"), col("b"), col("hamming"))
      .orderBy("a", "b")
  }

  /** The closed-form replay: sawtooth samples (intro edit included)
    * → per-window |v| sums → cross-multiplied loudness bits → 16-bit
    * bands (the 64-bit fingerprint is never materialized in SQL —
    * bit 63 would wrap a BIGINT; Hamming sums per-band popcounts,
    * the same number) → band equi-join → tau filter. LAZY per the
    * house init-order rule for interpolating SQL vals. */
  lazy val q154Sql: String =
    s"""WITH ids AS (SELECT unnest(generate_series(0, ${adupN - 1})) AS id),
       src AS (SELECT id, CASE WHEN id >= $adupBase THEN id - $adupBase ELSE id END AS s FROM ids),
       dims AS (SELECT id, s, 800 + (s % 5) * 100 AS n, 7 + s % 11 AS k FROM src),
       ts AS (SELECT unnest(generate_series(0, 1199)) AS t),
       smp AS (SELECT id, (t*65) // n AS w,
                 abs(((t * k + s * 131) % 4096) - 2048 +
                   CASE WHEN id >= $adupBase AND (t*65) // n < 16
                          AND ((t*65) // n) % 4 = 0
                        THEN 25 ELSE 0 END) AS a
               FROM dims, ts WHERE t < n),
       wins AS (SELECT id, w, SUM(a) AS sm, COUNT(*) AS cnt
                FROM smp GROUP BY id, w),
       bits AS (SELECT w1.id, w1.w AS i,
                  CASE WHEN w2.sm * w1.cnt > w1.sm * w2.cnt THEN 1 ELSE 0 END AS bit
                FROM wins w1 JOIN wins w2
                  ON w1.id = w2.id AND w2.w = w1.w + 1
                WHERE w1.w < 64),
       bands AS (SELECT id, i // 16 AS band,
                   CAST(SUM(bit * (1 << (i % 16))) AS BIGINT) AS bval
                 FROM bits GROUP BY id, i // 16),
       cand AS (SELECT DISTINCT a.id AS a, b.id AS b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.bval = b.bval AND a.id < b.id),
       ham AS (SELECT cand.a, cand.b,
                 CAST(SUM(bit_count(xor(ba.bval, bb.bval))) AS BIGINT) AS hamming
               FROM cand
               JOIN bands ba ON ba.id = cand.a
               JOIN bands bb ON bb.id = cand.b AND bb.band = ba.band
               GROUP BY cand.a, cand.b)
       SELECT a, b, hamming FROM ham WHERE hamming <= $adupTau ORDER BY a, b"""

  /** REAL audio decode under the oracle gate: deterministic integer
    * sawtooth waveforms (pure integer arithmetic — no libm, so the
    * oracle replays samples exactly), encoded as genuine PCM16 WAV
    * files, carried as a binary column through the magic sniff (RIFF
    * container), decoded back by [[graft.multimodal.Wav]], and
    * reduced to exact integer sample statistics. The audio twin of
    * q85/q90. */
  val wavN = 40
  private[graft] def wavPattern(id: Long): (Int, Array[Short]) = {
    val n = 800 + (id % 5).toInt * 100
    val rate = 8000 + (id % 3).toInt * 4000
    val k = 7 + (id % 11).toInt
    val s = new Array[Short](n)
    var t = 0
    while (t < n) {
      s(t) = (((t.toLong * k + id * 131) % 4096) - 2048).toShort
      t += 1
    }
    (rate, s)
  }

  def q91WavStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = s.range(wavN).select(col("id").as("media_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (rate, samples) = wavPattern(id)
        (id, graft.multimodal.Wav.encode(rate, 1, samples))
      })
      .toDF("media_id", "media")
    media
      .select(col("media_id"), col("media"),
        Multimodal.sniffFormat(col("media")).as("fmt"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.map { case (id, bytes, fmt) =>
        val a = graft.multimodal.Wav.decode(bytes)
        var sumAbs = 0L
        var mn = Int.MaxValue
        var mx = Int.MinValue
        a.samples.foreach { v =>
          sumAbs += math.abs(v.toInt)
          if (v < mn) mn = v
          if (v > mx) mx = v
        }
        (id, fmt, a.sampleRate.toLong, a.samples.length.toLong,
          sumAbs, mn.toLong, mx.toLong)
      })
      .toDF("media_id", "fmt", "sample_rate", "n_samples", "sum_abs",
        "min_s", "max_s")
      .orderBy("media_id")
  }

  /** The waveform formula replayed over a bounded sample grid. */
  val q91Sql: String =
    s"""WITH ids AS (SELECT unnest(generate_series(0, ${wavN - 1})) AS media_id),
       dims AS (SELECT media_id, 800 + (media_id % 5) * 100 AS n,
                       8000 + (media_id % 3) * 4000 AS rate,
                       7 + media_id % 11 AS k FROM ids),
       ts AS (SELECT unnest(generate_series(0, 1199)) AS t),
       smp AS (SELECT media_id, n, rate,
                 ((t * k + media_id * 131) % 4096) - 2048 AS v
               FROM dims, ts WHERE t < n)
       SELECT CAST(media_id AS BIGINT) AS media_id, 'riff' AS fmt,
         CAST(MIN(rate) AS BIGINT) AS sample_rate,
         CAST(MIN(n) AS BIGINT) AS n_samples,
         CAST(SUM(abs(v)) AS BIGINT) AS sum_abs,
         CAST(MIN(v) AS BIGINT) AS min_s, CAST(MAX(v) AS BIGINT) AS max_s
       FROM smp GROUP BY media_id ORDER BY media_id"""

  /** REAL video-frame decode under the oracle gate: deterministic
    * C444 Y4M clips (per-frame integer plane patterns), the
    * [[Multimodal.sampleFrames]] plan explodes every stride-th frame
    * index from the catalog metadata, and each plan row decodes ONLY
    * its frame (Y4M frame access is O(1) — header + fixed stride),
    * reducing to exact per-plane integer sums. This closes the
    * multimodal matrix: text native, image (q85/q90), audio (q91),
    * video frames here — every modality decoding real containers. */
  val y4mN = 30
  val y4mStride = 2
  private[graft] def y4mDims(id: Long): (Int, Int, Int) =
    (8 + (id % 3).toInt, 6 + (id % 2).toInt, 4 + (id % 3).toInt * 2)

  private[graft] def y4mFrame(id: Long, w: Int, h: Int, f: Int)
      : (Array[Byte], Array[Byte], Array[Byte]) = {
    def plane(a: Int, b: Int, c: Int, d: Int): Array[Byte] = {
      val p = new Array[Byte](w * h)
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          p(i) = ((x * a + y * b + f * c + id * d) % 256).toByte
          i += 1
          x += 1
        }
        y += 1
      }
      p
    }
    (plane(3, 5, 17, 7), plane(11, 2, 23, 3), plane(7, 13, 29, 5))
  }

  def q92VideoFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // localCheckpoint: the media frame feeds BOTH the sampleFrames
    // plan and the decode join — without it each consumer re-runs
    // the clip encode
    val media = s.range(y4mN).select(col("id").as("media_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h, n) = y4mDims(id)
        val clip = graft.multimodal.Y4m.encode(w, h,
          (0 until n).map(f => y4mFrame(id, w, h, f)))
        (id, clip, n)
      })
      .toDF("media_id", "media", "n_frames")
      .select(col("media_id"), col("media"),
        struct(lit("y4m").as("format"), lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          col("n_frames").cast("int").as("n_frames")).as("meta"))
      .localCheckpoint()
    // the frame-sampling PLAN comes from catalog metadata (no decode),
    // then each (clip, frame) row decodes just its frame
    val plan = Multimodal.sampleFrames(media, "media_id", y4mStride)
    plan.join(media.select(col("media_id"), col("media")), "media_id")
      .as[(Long, Int, Array[Byte])]
      .mapPartitions(_.map { case (id, fidx, bytes) =>
        val clip = graft.multimodal.Y4m.decode(bytes)
        val (py, pu, pv) = clip.frame(fidx)
        def sum(p: Array[Byte]): Long = {
          var acc = 0L
          p.foreach(b => acc += (b & 0xFF))
          acc
        }
        (id, fidx.toLong, clip.width.toLong, clip.height.toLong,
          sum(py), sum(pu), sum(pv))
      })
      .toDF("media_id", "frame_idx", "width", "height",
        "sum_y", "sum_u", "sum_v")
      .orderBy("media_id", "frame_idx")
  }

  /** The plane formulas replayed over bounded (frame, x, y) grids. */
  val q92Sql: String =
    s"""WITH ids AS (SELECT unnest(generate_series(0, ${y4mN - 1})) AS media_id),
       dims AS (SELECT media_id, 8 + media_id % 3 AS w, 6 + media_id % 2 AS h,
                       4 + (media_id % 3) * 2 AS n FROM ids),
       fs AS (SELECT unnest(generate_series(0, 7)) AS f),
       xs AS (SELECT unnest(generate_series(0, 9)) AS x),
       ys AS (SELECT unnest(generate_series(0, 6)) AS y),
       px AS (SELECT media_id, w, h, f,
                (x*3 + y*5 + f*17 + media_id*7) % 256 AS py,
                (x*11 + y*2 + f*23 + media_id*3) % 256 AS pu,
                (x*7 + y*13 + f*29 + media_id*5) % 256 AS pv
              FROM dims, fs, xs, ys
              WHERE f < n AND f % $y4mStride = 0 AND x < w AND y < h)
       SELECT CAST(media_id AS BIGINT) AS media_id, CAST(f AS BIGINT) AS frame_idx,
         CAST(MIN(w) AS BIGINT) AS width, CAST(MIN(h) AS BIGINT) AS height,
         CAST(SUM(py) AS BIGINT) AS sum_y, CAST(SUM(pu) AS BIGINT) AS sum_u,
         CAST(SUM(pv) AS BIGINT) AS sum_v
       FROM px GROUP BY media_id, f ORDER BY media_id, frame_idx"""

  val q69Sql: String =
    """SELECT c_mktsegment, event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
       FROM events JOIN customer ON user_id = c_custkey
       WHERE c_custkey < 150
       GROUP BY c_mktsegment, event_type
       ORDER BY c_mktsegment, event_type"""

  /** Catalog-safe tag for a data dir (table/sink names must be
    * identifier-shaped); shared by every per-dir table and memory
    * sink so the character class lives in ONE place. */
  private[graft] def sanitizeTag(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Deterministic scratch path for write-then-read-back queries,
    * distinct per (query, sf) so runs never cross-contaminate. */
  private[graft] def roundtripPath(dir: String, q: String): String =
    s"/tmp/graft_rt/${q}_" + dir.replaceAll("[^A-Za-z0-9.]", "_")

  /** Stage `df` as `nFiles` range-split parquet files on `keyCol`
    * with ascending mtimes pinned to the key ranges, so a
    * maxFilesPerTrigger=1 file source drains them as `nFiles`
    * key-ordered micro-batches: the file source orders by
    * (mtime, path); range partition k holds lower keys than k+1 and
    * part file names sort with k, so both orderings agree. The ONE
    * definition of the drain-order recipe every streaming-ingest
    * harness shares (q99/q102/q111/q120/q127/q128 and the
    * write-scope specs); a file appended AFTER this call (q111's
    * sentinel) gets a now-mtime and therefore drains last. */
  private[graft] def stageOrderedFiles(df: DataFrame, keyCol: String,
                                       nFiles: Int, path: String): String = {
    df.repartitionByRange(nFiles, col(keyCol))
      .write.mode("overwrite").parquet(path)
    pinAscendingMtimes(
      Option(new java.io.File(path).listFiles()).toSeq.flatten
        .filter(_.getName.startsWith("part-")).sortBy(_.getName))
    path
  }

  /** Pin `parts` (in the given order) to ascending mtimes starting an
    * hour ago — the drain-order primitive [[stageOrderedFiles]] and
    * custom-split stage writers (q130's rank-quartile writer) share.
    * Every pin is asserted: a filesystem that rejects
    * `setLastModified` would otherwise leave a fresh mtime in place
    * and silently reorder the drain. */
  private[graft] def pinAscendingMtimes(parts: Seq[java.io.File]): Unit = {
    val t0 = System.currentTimeMillis() - 3600L * 1000L
    parts.zipWithIndex.foreach { case (f, i) =>
      require(f.setLastModified(t0 + i * 2000L),
        s"mtime pin failed on ${f.getName} — drain order would be undefined")
    }
  }

  /** S3/S4 round-trip under the oracle gate: write a slice of the
    * embeddings table — INCLUDING the float-array column — to
    * parquet (the reference's embeddings persist,
    * `src/pipeline/pipeline.py:100-102`), read it back, and
    * aggregate over the array values. The oracle computes the same
    * aggregate over the ORIGINAL table, so any loss or reordering in
    * the write/read path breaks the hash match. Integer-exact sums
    * (micro-units) so partial-agg merge order cannot matter. */
  def q52ParquetRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = roundtripPath(dir, "q52")
    graft.sources.Tables.load(s, dir, "embeddings")
      .filter(col("vec_id") < 500)
      .select(col("vec_id"), col("label"), col("embedding"))
      .write.mode("overwrite").parquet(path)
    s.read.parquet(path)
      .select(col("label"), col("vec_id"),
        round(norm2Sq(col("embedding").cast("array<double>")) * 1e6)
          .cast("long").as("nq"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), sum(col("nq")).as("sum_normsq_u"),
        sum(col("vec_id")).as("sum_id"))
      .orderBy("label")
  }

  val q52Sql: String =
    """SELECT label, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x)) * 1000000) AS BIGINT)) AS BIGINT) AS sum_normsq_u,
       CAST(SUM(vec_id) AS BIGINT) AS sum_id
       FROM embeddings WHERE vec_id < 500 GROUP BY label ORDER BY label"""

  /** S6 round-trip under the oracle gate: compute a metrics-style
    * table, write it as a single header CSV (the reference's results
    * export, `src/pipeline/evaluation.py:178`), read it back with
    * schema casts, return the re-read rows. Integer-cents sums keep
    * the text round-trip exact. */
  def q53CsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = roundtripPath(dir, "q53")
    graft.sources.Tables.load(s, dir, "customer")
      .join(broadcast(graft.sources.Tables.load(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        sum(round(col("c_acctbal") * 100).cast("long")).as("sum_bal_c"))
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
    s.read.option("header", "true").csv(path)
      .select(col("n_name"), col("n_cust").cast("long").as("n_cust"),
        col("sum_bal_c").cast("long").as("sum_bal_c"))
      .orderBy("n_name")
  }

  val q53Sql: String =
    """SELECT n_name, COUNT(*) AS n_cust,
       CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS sum_bal_c
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_name ORDER BY n_name"""

  /** The reference's full baseline dataflow (SURVEY §3.1) as ONE
    * declarative pipeline: ingest → clean → dedup-first → distributed
    * embed → multi-query exact kNN → resolve ids back to snippets.
    * Everything stays on executors; the only driver materialization
    * is the driver-contract result itself. Fully oracle-checked —
    * q46Sql replays every stage including the portable feature-hash
    * embedding. */
  def q46PipelineE2e(s: SparkSession, dir: String): DataFrame = {
    import graft.ingest.Ingest
    val raw = graft.sources.Tables.load(s, dir, "documents")
    val cleaned = raw.select(col("doc_id"),
      Ingest.cleanText(col("text")).as("text"))
    val deduped = Ingest.dedupFirst(cleaned, col("text"), col("doc_id"))
    val embedded = graft.embed.Embed
      .embedDocs(deduped, "doc_id", "text", new graft.embed.PortableHashEmbedder(64))
      .select(col("doc_id"), col("vec").cast("array<double>").as("v"))
    val queries = embedded.filter(col("doc_id") < 3)
      .select(col("doc_id").as("qid"), col("v").as("qv"))
    val hits = graft.search.Search
      .multiTopK(embedded, "doc_id", "v", queries, "qid", "qv", 5)
    hits.join(raw.select(col("doc_id"), Ingest.snippet(col("text"), 40).as("snippet")),
        "doc_id")
      .select(col("qid"), col("rank"), col("doc_id"), col("score"), col("snippet"))
      .orderBy("qid", "rank")
  }

  /** q46's oracle: the full baseline dataflow replayed — clean text,
    * keep-first dedup, the portable feature-hash embedding
    * (RetrievalQueries.embedCteSql), multi-query exact kNN with the
    * engine's tie order, snippets off the raw text. */
  val q46Sql: String =
    s"""WITH cl AS (SELECT doc_id,
           trim(regexp_replace(regexp_replace(text, '[\\r\\n]+', ' ', 'g'), '\\s+', ' ', 'g')) AS ctext
         FROM documents),
       base AS (SELECT doc_id, ctext FROM cl
         QUALIFY ROW_NUMBER() OVER (PARTITION BY ctext ORDER BY doc_id) = 1),
       ${RetrievalQueries.embedCteSql("base", "ctext", 64, "")},
       vec AS (SELECT doc_id, list(x ORDER BY j) AS v FROM vf GROUP BY doc_id),
       qs AS (SELECT doc_id AS qid, v AS qv FROM vec WHERE doc_id < 3),
       sc AS (SELECT q.qid, v.doc_id, list_dot_product(v.v, q.qv) AS s FROM vec v, qs q),
       r AS (SELECT qid, doc_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY s DESC, doc_id) AS BIGINT) AS rank,
             ROUND(s, 6) AS score FROM sc),
       snip AS (SELECT doc_id, regexp_replace(substr(text, 1, 40), '[\\r\\n]', ' ', 'g') AS snippet
         FROM documents)
       SELECT r.qid, r.rank, r.doc_id, r.score, snip.snippet
       FROM r JOIN snip ON r.doc_id = snip.doc_id
       WHERE rank <= 5 ORDER BY qid, rank"""

  /** Shared-artifact builds (see RetrievalQueries.builds). Staging
    * the events dir is pure driver-side file copying — constructing
    * the readStream frame forces it. */
  val builds: Map[String, (SparkSession, String) => Unit] = Map(
    "_build_events_stage" -> ((s, dir) => { eventsStream(s, dir); () }))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_pipeline_e2e" -> (q46PipelineE2e _),
    "q50_binary_features" -> (q50BinaryFeatures _),
    "q52_parquet_roundtrip" -> (q52ParquetRoundtrip _),
    "q53_csv_roundtrip" -> (q53CsvRoundtrip _),
    "q60_sessionize" -> (q60Sessionize _),
    "q61_stream_sessionize" -> (q61StreamSessionize _),
    "q111_stream_sessionize_append" -> (q111StreamSessionizeAppend _),
    "q69_stream_enrich" -> (q69StreamEnrich _),
    "q82_stream_hourly" -> (q82StreamHourly _),
    "q83_stream_stream_join" -> (q83StreamStreamJoin _),
    "q85_png_stats" -> (q85PngStats _),
    "q152_image_neardup" -> (q152ImageNeardup _),
    "q153_video_neardup" -> (q153VideoNeardup _),
    "q154_audio_neardup" -> (q154AudioNeardup _),
    "q90_mixed_media" -> (q90MixedMedia _),
    "q91_wav_stats" -> (q91WavStats _),
    "q92_video_frames" -> (q92VideoFrames _))

  // LAZY: q82 shares q06's oracle, so this map reaches back into
  // Queries — evaluating it during THIS object's clinit would NPE
  // whenever PipelineQueries initializes first (e.g. a spec calling
  // roundtripPath before any Queries member), because Queries' own
  // catalog vals concat this object's still-null maps. Deferring to
  // first use lets whichever object initializes first finish cleanly.
  lazy val oracle: Map[String, String] = Map(
    "q46_pipeline_e2e" -> q46Sql,
    "q50_binary_features" -> q50Sql,
    "q52_parquet_roundtrip" -> q52Sql,
    "q53_csv_roundtrip" -> q53Sql,
    "q60_sessionize" -> q60Sql,
    "q61_stream_sessionize" -> q60Sql,
    "q111_stream_sessionize_append" -> q60Sql,
    "q69_stream_enrich" -> q69Sql,
    "q82_stream_hourly" -> Queries.q06Sql,
    "q83_stream_stream_join" -> ScaleQueries.q66Sql,
    "q85_png_stats" -> q85Sql,
    "q152_image_neardup" -> q152Sql,
    "q153_video_neardup" -> q153Sql,
    "q154_audio_neardup" -> q154Sql,
    "q90_mixed_media" -> q90Sql,
    "q91_wav_stats" -> q91Sql,
    "q92_video_frames" -> q92Sql)
}
