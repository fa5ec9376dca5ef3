package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.CountMinSketch

/** Semantics + plan-shape tests for the scale-pattern operators:
  * as-of join, count–min sketch, bucketed co-located join, salted
  * skew join. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  // ---------- as-of join semantics ----------

  private lazy val left = Seq(
    (1L, 10L, "l-a"), (1L, 20L, "l-b"), (2L, 5L, "l-c"))
    .toDF("k", "ts", "name")
  private lazy val right = Seq(
    (1L, 10L, 99L), (1L, 10L, 100L), (1L, 15L, 101L), (3L, 1L, 200L))
    .toDF("k", "ts", "rid")

  test("asofJoin: at-or-before, greatest-tiebreak-wins, null when no match") {
    val out = AsOfJoin.asofJoin(left, right, "k", "ts", "rid")
      .select($"name", $"asof.rid".as("rid"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    // simultaneous right rows ARE visible (at-or-before), and of the
    // two rows tying on (k, ts) the greater rid wins
    assert(out("l-a") === Some(100L))
    // latest ts <= 20 is 15
    assert(out("l-b") === Some(101L))
    // no right row for k=2 at all
    assert(out("l-c") === None)
  }

  test("asofJoin and rangeJoin reject reserved column-name collisions") {
    import graft.operators.RangeJoin
    intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(left.withColumn("asof", lit(1)), right, "k", "ts", "rid")
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(left, right.withColumn("__side", lit(1)), "k", "ts", "rid")
    }
    intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(left.withColumn("__b", lit(1)),
        right.withColumnRenamed("ts", "rts"), "k", "ts", "rts", 10L)
    }
  }

  test("asofJoin preserves every left row and column") {
    val out = AsOfJoin.asofJoin(left, right, "k", "ts", "rid")
    assert(out.count() === left.count())
    assert(out.columns.toSeq === Seq("k", "ts", "name", "asof"))
  }

  test("asofJoin equals the naive theta-join argmax on real events") {
    val ev = Queries.eventsTable(spark, sf0001)
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_event_id"), $"user_id", $"ts", $"value")
    val fast = AsOfJoin.asofJoin(clicks, purchases, "user_id", "ts", "p_event_id")
      .select($"event_id", $"asof.p_event_id".as("p_event_id"))
    // ground truth: range theta-join + per-click argmax (the
    // row-multiplying plan the operator exists to avoid)
    val w = Window.partitionBy($"event_id")
      .orderBy($"p_ts".desc, $"p_event_id".desc)
    val naive = clicks.join(
        purchases.select($"p_event_id", $"user_id".as("p_uid"), $"ts".as("p_ts")),
        $"user_id" === $"p_uid" && $"p_ts" <= $"ts", "left")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"event_id", $"p_event_id")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("asofJoin plans exactly one shuffle (the key partitioning)") {
    val p = AsOfJoin.asofJoin(left, right, "k", "ts", "rid")
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles === 1, s"expected 1 shuffle, plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  // ---------- range join ----------

  test("rangeJoin equals the naive theta-join on real events, pairs unduplicated") {
    import graft.operators.RangeJoin
    val W = ScaleQueries.rangeWindowMicros
    val ev = Queries.eventsTable(spark, sf0001)
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id".as("e_event_id"), $"user_id", $"ts".as("e_ts"))
    val fast = RangeJoin.rangeJoin(clicks, errors, "user_id", "ts", "e_ts", W)
      .select($"event_id", $"e_event_id")
    val naive = clicks.join(errors.withColumnRenamed("user_id", "e_uid"),
        $"user_id" === $"e_uid" &&
          unix_micros($"e_ts") >= unix_micros($"ts") &&
          unix_micros($"e_ts") <= unix_micros($"ts") + W)
      .select($"event_id", $"e_event_id")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    // the two-bucket emission must not double-count any pair
    assert(fast.count() === fast.distinct().count())
  }

  test("rangeJoin boundary semantics: inclusive both ends, bucket-crossing pairs found") {
    import graft.operators.RangeJoin
    import org.apache.spark.sql.functions.timestamp_micros
    // W = 100 us buckets; pairs straddling a bucket boundary and pairs
    // exactly at the window edges
    val l = Seq((1L, 10L, 95L), (2L, 10L, 100L), (3L, 10L, 50L))
      .toDF("event_id", "user_id", "us")
      .select($"event_id", $"user_id", timestamp_micros($"us").as("ts"))
    val r = Seq((101L, 10L, 95L), (102L, 10L, 105L), (103L, 10L, 200L),
        (104L, 10L, 151L), (105L, 10L, 94L))
      .toDF("e_event_id", "user_id", "us")
      .select($"e_event_id", $"user_id", timestamp_micros($"us").as("e_ts"))
    val got = RangeJoin.rangeJoin(l, r, "user_id", "ts", "e_ts", 100L)
      .select($"event_id", $"e_event_id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === Set(
      (1L, 101L), // same instant start
      (1L, 102L), // crosses the 100-bucket boundary
      (1L, 104L), // far side of next bucket, still within 95+100
      (2L, 102L), (2L, 103L), (2L, 104L), // 200 = 100+W inclusive edge
      (3L, 101L), (3L, 102L), (3L, 105L))) // 150 window: 151 excluded
  }

  test("rangeJoin plans a hash equi-join on (key, bucket), never a nested loop") {
    import graft.operators.RangeJoin
    val ev = Queries.eventsTable(spark, sf0001)
    val l = ev.filter($"event_type" === "click").select($"event_id", $"user_id", $"ts")
    val r = ev.filter($"event_type" === "error")
      .select($"event_id".as("e_event_id"), $"user_id", $"ts".as("e_ts"))
    val p = RangeJoin.rangeJoin(l, r, "user_id", "ts", "e_ts", 1000000L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"))
    intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(l, r, "user_id", "ts", "e_ts", 0L)
    }
  }

  // ---------- count–min sketch ----------

  private def grid(df: org.apache.spark.sql.DataFrame, width: Int, depth: Int) =
    df.agg(CountMinSketch.sketch(CountMinSketch.hash32($"term"), $"w",
      width, depth).as("g"))

  test("CMS: estimates equal exact counts when the sketch is wide (no collisions)") {
    val df = Seq(("alpha", 3L), ("beta", 2L), ("alpha", 1L), ("gamma", 5L))
      .toDF("term", "w")
    val g = grid(df, 4096, 4)
    val est = g.select(
      CountMinSketch.estimate($"g", CountMinSketch.hash32(lit("alpha")), 4096, 4),
      CountMinSketch.estimate($"g", CountMinSketch.hash32(lit("beta")), 4096, 4),
      CountMinSketch.estimate($"g", CountMinSketch.hash32(lit("gamma")), 4096, 4),
      CountMinSketch.estimate($"g", CountMinSketch.hash32(lit("absent")), 4096, 4))
      .first()
    assert(est.getLong(0) === 4L)
    assert(est.getLong(1) === 2L)
    assert(est.getLong(2) === 5L)
    assert(est.getLong(3) === 0L)
  }

  test("CMS: estimates never underestimate, even under heavy collision") {
    val df = (0 until 300).map(i => (s"t$i", (i % 7 + 1).toLong)).toDF("term", "w")
    val g = df.agg(CountMinSketch.sketch(
      CountMinSketch.hash32($"term"), $"w", 16, 2).as("g"))
    val exact = (0 until 300).map(i => s"t$i" -> (i % 7 + 1).toLong).toMap
    val ests = g.select(array((0 until 300).map(i =>
        CountMinSketch.estimate($"g", CountMinSketch.hash32(lit(s"t$i")), 16, 2)): _*))
      .first().getSeq[Long](0)
    (0 until 300).foreach { i =>
      assert(ests(i) >= exact(s"t$i"), s"t$i underestimated")
    }
    // total mass per sketch row is conserved
    assert(ests.sum >= exact.values.sum)
  }

  test("CMS sketch plans as ObjectHashAggregate with a map-side partial") {
    val df = (0 until 100).map(i => (s"t$i", 1L)).toDF("term", "w")
    val p = grid(df.repartition(4), 512, 2).queryExecution.executedPlan.toString
    // partial + final ObjectHashAggregate: each task folds its rows
    // into a local grid and the exchange carries grids, not rows
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("CMS: partial-merge order does not change the grid") {
    val df = (0 until 500).map(i => (s"t${i % 40}", 1L)).toDF("term", "w")
    val one = grid(df.coalesce(1), 64, 3).first().getSeq[Long](0)
    val many = grid(df.repartition(7), 64, 3).first().getSeq[Long](0)
    assert(one === many)
  }

  test("CMS: null keys and weights are ignored, bad params rejected") {
    val df = Seq((Some("a"), Some(1L)), (None, Some(9L)), (Some("a"), None))
      .toDF("term", "w")
    val g = grid(df, 64, 2)
    val est = g.select(CountMinSketch.estimate($"g",
      CountMinSketch.hash32(lit("a")), 64, 2)).first().getLong(0)
    assert(est === 1L)
    // the require() fires at Column-construction (= analysis) time
    intercept[IllegalArgumentException] {
      CountMinSketch.sketch(lit(1L), lit(1L), 1, 2)
    }
    intercept[IllegalArgumentException] {
      CountMinSketch.sketch(lit(1L), lit(1L), 64, 0)
    }
  }

  test("CMS sketch aggregates incrementally under the streaming harness") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val q = in.toDF().toDF("term", "w")
      .agg(CountMinSketch.sketch(CountMinSketch.hash32($"term"), $"w", 64, 2).as("g"))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      in.addData(("a", 1L), ("b", 2L))
      q.processAllAvailable()
      in.addData(("a", 3L))
      q.processAllAvailable()
      val est = spark.table("cms_stream").select(
        CountMinSketch.estimate($"g", CountMinSketch.hash32(lit("a")), 64, 2),
        CountMinSketch.estimate($"g", CountMinSketch.hash32(lit("b")), 64, 2))
        .first()
      // the second micro-batch's rows merged into the same grid
      assert(est.getLong(0) === 4L)
      assert(est.getLong(1) === 2L)
    } finally q.stop()
  }

  // ---------- bucketed join plan shape ----------

  test("q64 core: bucketed sort-merge join + aggregate with ZERO exchanges") {
    val (ot, lt) = ScaleQueries.bucketedTables(spark, sf0001)
    val core = ScaleQueries.bucketedJoinCore(spark, ot, lt)
    val p = core.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
    assert(!p.contains("Exchange"), s"expected no exchange at all:\n$p")
    // results also match the straightforward non-bucketed plan
    val plain = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .join(spark.read.parquet(s"$sf0001/orders.parquet"),
        $"l_orderkey" === $"o_orderkey")
      .filter($"o_custkey" < 200)
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n_items"),
        sum(round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 10000)
          .cast("long")).as("rev_c4"))
      .select($"l_orderkey".as("o_orderkey"), $"n_items", $"rev_c4")
    assert(core.exceptAll(plain).isEmpty && plain.exceptAll(core).isEmpty)
  }

  // ---------- connected components ----------

  test("connected components: chains merge transitively, deterministic min-id labels") {
    import graft.operators.ConnectedComponents
    // chain 1-2-3-4 (never a direct 1-4 pair), separate pair 10-11,
    // plus an edge listed "backwards" (7, 6)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (7L, 6L))
      .toDF("id1", "id2")
    val comp = ConnectedComponents.components(edges, "id1", "id2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 6L -> 6L, 7L -> 6L))
  }

  test("connected components: long path converges; tight cap throws") {
    import graft.operators.ConnectedComponents
    val path = (0 until 9).map(i => (i.toLong, i + 1L)).toDF("id1", "id2")
    val comp = ConnectedComponents.components(path, "id1", "id2")
      .collect().map(_.getLong(1)).distinct
    assert(comp === Array(0L))
    intercept[IllegalStateException] {
      ConnectedComponents.components(path, "id1", "id2", maxIters = 2)
    }
    intercept[IllegalArgumentException] {
      ConnectedComponents.components(path, "id1", "id2", maxIters = 0)
    }
  }

  test("q68 clusters equal a driver-side union-find over the same pairs") {
    val pairs = CurationQueries.nearDupPairs(spark, sf0001)
      .filter($"jaccard" >= CurationQueries.nearDupTau)
      .select($"id1", $"id2")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture should contain near-dup pairs")
    // classic union-find ground truth
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = parent.keys.map(v => v -> find(v)).toMap
    val got = ScaleQueries.q68DedupClusters(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === truth)
  }

  // ---------- histogram quantiles ----------

  test("histogram quantiles: type-1 semantics, ties, multi-key, param guard") {
    import graft.operators.HistogramQuantiles
    val df = ((1 to 10).map(v => ("a", v.toLong)) ++
        Seq(("b", 1L), ("b", 1L), ("b", 1L), ("b", 9L)))
      .toDF("k", "v")
    val th = HistogramQuantiles.thresholds(df, "k", "v", Seq(1, 50, 90, 100))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // key a: values 1..10 — rank ceil(p·10/100)
    assert(th(("a", 1)) === 1L)    // ceil(0.1) = 1st smallest
    assert(th(("a", 50)) === 5L)   // 5th smallest
    assert(th(("a", 90)) === 9L)
    assert(th(("a", 100)) === 10L)
    // key b: [1,1,1,9] — p50 rank 2 lands inside the tie run
    assert(th(("b", 50)) === 1L)
    assert(th(("b", 90)) === 9L)   // rank ceil(3.6) = 4 → 9
    intercept[IllegalArgumentException] {
      HistogramQuantiles.thresholds(df, "k", "v", Seq(0, 50))
    }
  }

  test("histogram quantiles ignore null values and reject reserved names") {
    import graft.operators.HistogramQuantiles
    val df = Seq(("a", Some(1L)), ("a", None), ("a", Some(2L)), ("a", Some(3L)))
      .toDF("k", "v")
    val th = HistogramQuantiles.thresholds(df, "k", "v", Seq(50))
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    // over the 3 non-null values p50 rank is 2 → threshold 2; counting
    // the null row would shift it to 1
    assert(th(50) === 2L)
    intercept[IllegalArgumentException] {
      HistogramQuantiles.thresholds(df.withColumnRenamed("v", "percent"),
        "k", "percent", Seq(50))
    }
  }

  test("CMS estimate: null hash is null, out-of-range hash errors loudly") {
    val df = Seq(("alpha", 3L)).toDF("term", "w")
    val g = grid(df, 64, 2)
    val nullEst = g.select(CountMinSketch.estimate($"g",
      lit(null).cast("long"), 64, 2)).first()
    assert(nullEst.isNullAt(0))
    val bad = intercept[Exception] {
      g.select(CountMinSketch.estimate($"g", lit(-5L), 64, 2)).collect()
    }
    assert(bad.getMessage.contains("32-bit") ||
      String.valueOf(bad.getCause).contains("32-bit"))
    // aggregate side: a 64-bit hash input fails the task instead of
    // silently wrapping buckets
    val agg = intercept[Exception] {
      Seq((Long.MaxValue, 1L)).toDF("h", "w")
        .agg(CountMinSketch.sketch($"h", $"w", 64, 2)).collect()
    }
    assert(String.valueOf(agg.getMessage).contains("32-bit") ||
      String.valueOf(agg.getCause).contains("32-bit"))
  }

  test("histogram quantiles match the built-in exact percentile on real scores") {
    import graft.operators.HistogramQuantiles
    val scored = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"lang",
        round(graft.text.TextAnalysis.qualityScore($"text") * 10000)
          .cast("long").as("qs4"))
    val th = HistogramQuantiles.thresholds(scored, "lang", "qs4", Seq(50))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // percentile(..., 0.5) interpolates; the type-1 threshold must be
    // the bucket at-or-above the interpolated value's floor — compare
    // against a driver-side exact computation instead
    val byLang = scored.collect().groupBy(_.getString(0))
      .map { case (l, rows) => l -> rows.map(_.getLong(1)).sorted }
    byLang.foreach { case (l, vs) =>
      val rank = math.ceil(vs.length * 0.5).toInt
      assert(th(l) === vs(rank - 1), s"lang $l")
    }
  }

  // ---------- temperature mixture ----------

  test("q71: smallest language keeps ~everything, head languages downsample toward balance") {
    val rows = CurationQueries.all("q71_temperature_mix")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val minLang = rows.minBy(_._2)
    // the smallest language's threshold is the full LCG modulus → keeps all
    assert(minLang._3 === 1000003L)
    assert(minLang._4 === minLang._2)
    // keep RATE is monotone non-increasing in language size
    rows.sortBy(_._2).map(_._3).toSeq.sliding(2).foreach { w =>
      if (w.size == 2) assert(w.head >= w.last)
    }
    // kept counts are more balanced than inputs: max/min ratio shrinks
    val inRatio = rows.map(_._2).max.toDouble / rows.map(_._2).min
    val outRatio = rows.map(_._4).max.toDouble / math.max(rows.map(_._4).min, 1L)
    assert(outRatio <= inRatio)
  }

  // ---------- salted join equivalence ----------

  test("q65: salted join equals the plain equi-join aggregate") {
    val salted = ScaleQueries.q65SaltedJoin(spark, sf0001)
    val ev = Queries.eventsTable(spark, sf0001)
      .select($"user_id", round($"value" * 100).cast("long").as("vc"))
    val plain = spark.read.parquet(s"$sf0001/customer.parquet")
      .filter($"c_custkey" < 150)
      .select($"c_custkey".as("user_id"), $"c_mktsegment")
      .join(ev, "user_id")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"), sum($"vc").as("sum_value_c"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  // ---------- AQE skew-join vs manual salting (when each applies) ----------

  test("AQE splits a moderately-skewed join at runtime; salting handles it statically") {
    // A/B of the two skew tools on the SAME moderately-skewed join:
    // half the fact rows share one hot key. AQE's skew-join split is
    // the default answer — zero code, the optimizer divides the
    // oversized shuffle partition among extra tasks at runtime.
    // Manual salting (q65's Salting.saltedJoin) remains the static
    // fallback for the extreme tail: a single key so hot that even
    // its SPLITS overwhelm a task, or plans where AQE can't apply
    // (stateful streaming, Spark < 3 sinks). Sessions are isolated so
    // the tuned thresholds never leak into other suites.
    def skewedJoin(s: org.apache.spark.sql.SparkSession) = {
      val fact = s.range(40000).select(
        when(col("id") % 2 === 0, 0L).otherwise(col("id")).as("k"),
        (col("id") % 97).as("vc"))
      val dim = s.range(40000).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("name"))
      fact.join(dim, "k").groupBy(length(col("name")).as("len"))
        .agg(count(lit(1)).as("n"), sum(col("vc")).as("sv"))
    }
    def withConfs(skewOn: Boolean) = {
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", "8")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      s.conf.set("spark.sql.adaptive.enabled", "true")
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
      // scaled-down detection knobs: the test corpus is KBs, not the
      // 256 MB default threshold a real cluster uses
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      s
    }
    // collect the frame ITSELF (not an orderBy derivative): AQE
    // finalizes executedPlan per executed frame, so inspecting a
    // never-executed parent would read isFinalPlan=false
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
    val on = withConfs(skewOn = true)
    val dfOn = skewedJoin(on)
    val gotOn = rows(dfOn)
    val planOn = dfOn.queryExecution.executedPlan.toString
    assert(planOn.contains("skew=true"),
      s"AQE did not mark the skewed join (plan:\n${planOn.take(2000)})")
    val off = withConfs(skewOn = false)
    val dfOff = skewedJoin(off)
    val gotOff = rows(dfOff)
    assert(!dfOff.queryExecution.executedPlan.toString.contains("skew=true"))
    // same rows either way — the split is a physical rewrite only
    assert(gotOn == gotOff)
    // and the manual tool agrees on the same data (the q65 path)
    val factOff = off.range(40000).select(
      when(col("id") % 2 === 0, 0L).otherwise(col("id")).as("k"),
      (col("id") % 97).as("vc"))
    val dimOff = off.range(40000).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("name"))
    val saltedAgg = rows(graft.ingest.Salting
      .saltedJoin(factOff, col("k"), dimOff, "k", 8)
      .groupBy(length(col("name")).as("len"))
      .agg(count(lit(1)).as("n"), sum(col("vc")).as("sv")))
    assert(saltedAgg == gotOff)
  }
}
