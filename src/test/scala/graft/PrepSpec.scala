package graft

import graft.text.Chunker
import org.apache.spark.sql.functions._

/** Training-prep operators (chunking, repetition, decontamination,
  * centroid eval) — library-level edge cases; the declared queries
  * are oracle-gated. */
class PrepSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("q125 pack manifest is consistent with q77's audit: window counts, token totals, pad only on the tail") {
    val manifest = PrepQueries.q125PackManifest(spark, sf0001)
      .select("source", "window_id", "n_docs", "n_toks", "pad")
      .as[(String, Long, Long, Long, Long)].collect()
    val audit = PrepQueries.q77PackingStats(spark, sf0001)
      .select("source", "total_toks", "n_windows")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val bySource = manifest.groupBy(_._1)
    assert(bySource.keySet == audit.keySet)
    val L = PrepQueries.contextLen
    bySource.foreach { case (src, rows) =>
      val (totalToks, nWindows) = audit(src)
      // window ids are dense 0..n_windows-1 — concat-then-split
      // leaves no empty window
      assert(rows.map(_._2).sorted.toSeq == (0L until nWindows),
        s"$src window ids not dense")
      // every token lands in exactly one window
      assert(rows.map(_._4).sum == totalToks, s"$src token total")
      // pad = L - fill, zero everywhere except (possibly) the final
      // partial window
      assert(rows.forall(r => r._5 == L - r._4), s"$src pad arithmetic")
      val (tail, full) = rows.partition(_._2 == nWindows - 1)
      assert(full.forall(_._5 == 0L), s"$src non-tail window padded")
      assert(tail.head._5 >= 0L && tail.head._5 < L, s"$src tail pad bounds")
      // at least one doc contributes to every window
      assert(rows.forall(_._3 >= 1L), s"$src empty window row")
    }
  }

  test("q131 packed windows agree with q125's manifest and a driver-side byte replay") {
    val windows = PrepQueries.q131PackWindows(spark, sf0001)
      .select("source", "window_id", "n_docs", "window_md5")
      .as[(String, Long, Long, String)].collect()
    val manifest = PrepQueries.q125PackManifest(spark, sf0001)
      .select("source", "window_id", "n_docs")
      .as[(String, Long, Long)].collect()
    // same windows, same contributing-doc counts — the text artifact
    // and its manifest cannot disagree
    assert(windows.map(w => (w._1, w._2, w._3)).sorted.toSeq ==
      manifest.sorted.toSeq)
    // full driver-side replay of one source's windows: concatenate
    // the corpus in doc_id order, split every L tokens, md5 each
    val L = PrepQueries.contextLen
    val src0 = windows.map(_._1).min
    // faithful to the ENGINE's tokenizer (TextAnalysis.toks): SQL
    // trim strips spaces only (not \t\n like Java's), lower is
    // locale-independent (Locale.ROOT — a tr_TR default would fold
    // 'I' differently), and split keeps interior/trailing empties
    // (limit -1) exactly as Spark's split does
    def sqlTrim(s0: String): String = {
      var a = 0; var b = s0.length
      while (a < b && s0.charAt(a) == ' ') a += 1
      while (b > a && s0.charAt(b - 1) == ' ') b -= 1
      s0.substring(a, b)
    }
    val toks = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("source") === src0)
      .select("doc_id", "text").as[(Long, String)].collect()
      .sortBy(_._1)
      .flatMap(d => sqlTrim(d._2).toLowerCase(java.util.Locale.ROOT)
        .split("\\s+", -1))
    val wantMd5 = toks.grouped(L).map { g =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(g.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }.toSeq
    val gotMd5 = windows.filter(_._1 == src0).sortBy(_._2).map(_._4).toSeq
    assert(gotMd5 == wantMd5,
      s"window bytes diverge from the concat-then-split replay for $src0")
  }

  test("chunkRows covers every token with the configured overlap") {
    val d = df((1L, (1 to 100).map(i => s"t$i").mkString(" ")))
    val chunks = Chunker.chunkRows(d, "doc_id", "text", 32, 24)
      .orderBy("chunk_id")
      .select("chunk_id", "start_tok", "n_toks", "chunk_text")
      .as[(Long, Long, Long, String)].collect()
    // starts 1, 25, 49, 73, 97; last chunk is the 4-token tail
    assert(chunks.map(_._2).toSeq == Seq(1L, 25L, 49L, 73L, 97L))
    assert(chunks.map(_._3).toSeq == Seq(32L, 32L, 32L, 28L, 4L))
    assert(chunks.head._4.startsWith("t1 t2 ") && chunks.head._4.endsWith(" t32"))
    assert(chunks.last._4 == "t97 t98 t99 t100")
    // consecutive chunks overlap by chunkSize - stride = 8 tokens
    assert(chunks(0)._4.split(" ").takeRight(8).toSeq ==
      chunks(1)._4.split(" ").take(8).toSeq)
  }

  test("chunkRows: a doc shorter than one chunk yields exactly one chunk") {
    val d = df((1L, "a b c"))
    val chunks = Chunker.chunkRows(d, "doc_id", "text", 32, 24).collect()
    assert(chunks.length == 1)
    assert(chunks.head.getAs[String]("chunk_text") == "a b c")
    assert(chunks.head.getAs[Long]("n_toks") == 3L)
  }

  test("chunkRows: stride larger than chunkSize leaves gaps but still terminates") {
    val d = df((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
    val chunks = Chunker.chunkRows(d, "doc_id", "text", 2, 4)
      .orderBy("chunk_id").select("start_tok").as[Long].collect().toSeq
    assert(chunks == Seq(1L, 5L, 9L))
  }

  test("chunkRows rejects non-positive parameters") {
    val d = df((1L, "a"))
    intercept[IllegalArgumentException] {
      Chunker.chunkRows(d, "doc_id", "text", 0, 1)
    }
    intercept[IllegalArgumentException] {
      Chunker.chunkRows(d, "doc_id", "text", 8, 0)
    }
  }

  test("q73 repetition fractions: hand-checked doc and short-doc zero path") {
    // "a b a b a": bigrams [a b, b a, a b, b a] -> tot 4, dist 2, top 2
    // trigrams [a b a, b a b, a b a] -> tot 3, dist 2, top 2
    val d = df((0L, "a b a b a"), (1L, "x"))
    val staged = d.select(col("doc_id"),
      graft.text.TextAnalysis.toks(col("text")).as("__toks"))
    // drive the same private pipeline through the public query on a
    // temp view-free path: rebuild the rollup inline
    val g2 = staged.select(col("doc_id"),
      explode(graft.dedup.Dedup.shinglesFromToks(col("__toks"), 2,
        distinct = false)).as("g"))
      .groupBy("doc_id", "g").count()
      .groupBy("doc_id")
      .agg(sum("count").as("tot"), count(lit(1)).as("dist"), max("count").as("top"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(g2(0L) == ((4L, 2L, 2L)))
    assert(!g2.contains(1L)) // 1-token doc has no bigrams
  }

  test("shingleRowsPos: 1-based positions, full window coverage") {
    val d = df((7L, "a b c d e"))
    val rows = graft.dedup.Dedup.shingleRowsPos(d, "doc_id", "text", 3)
      .orderBy("pos").select("pos", "s").as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "a b c"), (2L, "b c d"), (3L, "c d e")))
    // a doc shorter than the window yields no rows
    assert(graft.dedup.Dedup.shingleRowsPos(df((1L, "a b")), "doc_id", "text", 3)
      .isEmpty)
    intercept[IllegalArgumentException] {
      graft.dedup.Dedup.shingleRowsPos(d, "doc_id", "text", 1)
    }
  }

  private def writeDocs(rows: (Long, String, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("prepdocs").toString
    rows.toDF("doc_id", "text", "lang")
      .select(col("doc_id"), col("text"), col("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q100: shared 20-token run is found, merged, and measured exactly") {
    def run(tag: String, k: Int) = (1 to k).map(i => s"$tag$i").mkString(" ")
    val shared = run("s", 20)
    // doc0: 5 unique + shared-20 + 5 unique = 30 toks; dup windows are
    // exactly the 5 fully inside the run (start 6..10) -> merged
    // island covers tokens 6..25 = 20 tokens
    val dir = writeDocs(
      (0L, run("u", 5) + " " + shared + " " + run("v", 5), "en"),
      (1L, run("w", 3) + " " + shared + " " + run("x", 7), "en"),
      (2L, run("z", 20), "en"))
    val out = PrepQueries.q100SubstringDedup(spark, dir)
      .select("doc_id", "n_windows", "n_dup_windows", "dup_tokens", "dup_frac")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (0L, 15L, 5L, 20L, 0.6667),
      (1L, 15L, 5L, 20L, 0.6667),
      (2L, 5L, 0L, 0L, 0.0)))
  }

  test("q100: two disjoint duplicated runs in one doc merge into two islands") {
    def run(tag: String, k: Int) = (1 to k).map(i => s"$tag$i").mkString(" ")
    val a = run("a", 16); val b = run("b", 16)
    // doc0 carries both runs separated by unique filler; docs 1/2 each
    // repeat one run. Coverage = 16 + 16, not one merged 42-token span.
    val dir = writeDocs(
      (0L, a + " " + run("f", 10) + " " + b, "en"),
      (1L, run("g", 4) + " " + a, "en"),
      (2L, b + " " + run("h", 4), "en"))
    val row = PrepQueries.q100SubstringDedup(spark, dir)
      .filter(col("doc_id") === 0L)
      .select("n_dup_windows", "dup_tokens").as[(Long, Long)].head()
    assert(row == ((2L, 32L)))
  }

  test("q106: covered tokens are cut, survivors keep order, clean docs pass through") {
    def run(tag: String, k: Int) = (1 to k).map(i => s"$tag$i").mkString(" ")
    val shared = run("s", 20)
    val dir = writeDocs(
      (0L, run("u", 5) + " " + shared + " " + run("v", 5), "en"),
      (1L, run("w", 3) + " " + shared + " " + run("x", 7), "en"),
      (2L, run("z", 20), "en"))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val out = PrepQueries.q106SubstringDedupApply(spark, dir)
      .select("doc_id", "n_toks", "n_kept", "clean_hash")
      .as[(Long, Long, Long, String)].collect().toSeq
    // the shared 20-token run (island tokens 6..25 / 4..23) is cut;
    // the unique flanks survive IN ORDER; doc2 is untouched
    assert(out == Seq(
      (0L, 30L, 10L, md5hex(run("u", 5) + " " + run("v", 5))),
      (1L, 30L, 10L, md5hex(run("w", 3) + " " + run("x", 7))),
      (2L, 20L, 20L, md5hex(run("z", 20)))))
  }

  test("q106 removal equals q100's island coverage doc by doc") {
    val audit = PrepQueries.q100SubstringDedup(spark, sf0001)
      .select("doc_id", "dup_tokens").as[(Long, Long)].collect().toMap
    val applied = PrepQueries.q106SubstringDedupApply(spark, sf0001)
      .select("doc_id", "n_toks", "n_kept").as[(Long, Long, Long)].collect()
    applied.foreach { case (d, nt, nk) =>
      assert(nt - nk == audit.getOrElse(d, 0L),
        s"doc $d: removed ${nt - nk} != audited ${audit.getOrElse(d, 0L)}")
    }
    assert(applied.exists { case (_, nt, nk) => nk < nt }) // removal happened
  }

  test("q108 water-filling: level, floors and remainder match the hand solution") {
    // sources 10/20/40 tokens, budget = 35: A keeps all 10; level
    // c = 12.5 caps B and C; floors 12+12, remainder 1 goes to B
    // (source order) -> 10 + 13 + 12 = 35
    val dir = java.nio.file.Files.createTempDirectory("q108docs").toString
    Seq((0L, (1 to 10).map("a" + _).mkString(" "), "en", "A"),
        (1L, (1 to 20).map("b" + _).mkString(" "), "en", "B"),
        (2L, (1 to 40).map("c" + _).mkString(" "), "en", "C"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = PrepQueries.q108BudgetAllocation(spark, dir)
      .select("source", "n_tokens", "alloc_tokens", "capped")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(("A", 10L, 10L, false), ("B", 20L, 13L, true),
      ("C", 40L, 12L, true)))
  }

  test("q108: allocations sum exactly to the budget and never exceed the source") {
    val out = PrepQueries.q108BudgetAllocation(spark, sf0001)
      .select("n_tokens", "alloc_tokens").as[(Long, Long)].collect()
    assert(out.nonEmpty && out.forall { case (n, a) => a >= 0 && a <= n })
    assert(out.map(_._2).sum == out.map(_._1).sum / 2)
  }

  test("q101: target-like docs outweigh off-target docs; n_feats = 2n-1") {
    // target (en) speaks 'cat dog fish', off-target (de) speaks
    // 'rock sand clay'; scored docs mirror one side each
    val dir = writeDocs(
      (0L, "cat dog fish cat dog", "en"),
      (1L, "dog fish cat fish dog", "en"),
      (2L, "rock sand clay rock sand", "de"),
      (3L, "sand clay rock clay sand", "de"))
    val w = PrepQueries.q101DsirWeights(spark, dir)
      .select("doc_id", "n_feats", "log_weight")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // 5 tokens -> 5 unigrams + 4 bigrams
    assert(w.values.forall(_._1 == 9L))
    assert(w(0L)._2 > 0 && w(1L)._2 > 0, s"target-like docs must score > 0: $w")
    assert(w(2L)._2 < 0 && w(3L)._2 < 0, s"off-target docs must score < 0: $w")
    assert(w(0L)._2 > w(2L)._2)
  }

  test("q112: tercile buckets are balanced and ordered by score") {
    val rows = PrepQueries.q112PerplexityFilter(spark, sf0001)
      .select("doc_id", "mean_logp", "ppl_bucket")
      .as[(Long, Double, String)].collect().toSeq
    val byBucket = rows.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    // NTILE(3) balance: bucket sizes differ by at most 1
    val sizes = byBucket.values.map(_.size)
    assert(sizes.max - sizes.min <= 1, s"unbalanced terciles: $byBucket")
    // ordering: every head score >= every middle score >= every tail
    assert(byBucket("head").min >= byBucket("middle").max)
    assert(byBucket("middle").min >= byBucket("tail").max)
    // scores are log-probs: strictly negative
    assert(rows.forall(_._2 < 0.0))
  }

  test("q112: curated-slice docs score no worse than the corpus on average") {
    // the LM is trained on src0/src1 — in-model docs must have higher
    // mean log-prob than the rest on average, or the filter is noise
    val scored = PrepQueries.q112PerplexityFilter(spark, sf0001)
      .join(spark.read.parquet(s"$sf0001/documents.parquet")
        .select(col("doc_id"), col("source")), "doc_id")
    val Seq((inModel, rest)) = scored
      .agg(avg(when(col("source").isin("src0", "src1"), col("mean_logp"))),
        avg(when(!col("source").isin("src0", "src1"), col("mean_logp"))))
      .as[(Double, Double)].collect().toSeq
    assert(inModel > rest,
      s"curated slice $inModel not above out-of-model $rest")
  }

  test("q113: drawn tokens track the allocation and never exceed the source") {
    val rows = PrepQueries.q113MixtureSample(spark, sf0001)
      .select("source", "alloc_tokens", "n_tokens_kept")
      .as[(String, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    val target = rows.map(_._2).sum.toDouble
    val drawn = rows.map(_._3).sum.toDouble
    // hash sampling is an expectation, not a quota: the corpus-wide
    // draw must land near the budget (deterministic per dataset)
    assert(drawn / target > 0.6 && drawn / target < 1.4,
      s"drawn $drawn vs target $target out of band")
  }

  test("q115: split totals cover the corpus and no pair straddles splits") {
    // the in-query require() already gates component-level agreement;
    // this pins the user-visible consequences
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    val counts = PrepQueries.q115LeakFreeSplit(spark, sf0001)
      .select("n").as[Long].collect().sum
    assert(counts == n, s"split counts $counts do not cover $n docs")
    // and a known near-dup pair really lands in one split
    val pair = CurationQueries.nearDupPairs(spark, sf0001)
      .filter(col("jaccard") >= CurationQueries.nearDupTau)
      .select("id1", "id2").as[(Long, Long)].head()
    val comp = graft.operators.ConnectedComponents.components(
      CurationQueries.nearDupPairs(spark, sf0001)
        .filter(col("jaccard") >= CurationQueries.nearDupTau), "id1", "id2")
    val lbl = comp.filter(col("v").isin(pair._1, pair._2))
      .select("component").distinct().count()
    assert(lbl == 1L, s"pair $pair not in one component")
  }

  test("q78 centroid eval on separable toy data reaches accuracy 1.0") {
    val e = Seq(
      (0L, 0, Seq(1.0f, 0.0f)), (1L, 0, Seq(0.9f, 0.1f)),
      (2L, 1, Seq(0.0f, 1.0f)), (3L, 1, Seq(0.1f, 0.9f)))
      .toDF("vec_id", "label", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("prep78").toString
    e.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = PrepQueries.q78CentroidClassify(spark, dir)
      .select("label", "acc").as[(Long, Double)].collect().toMap
    assert(out == Map(0L -> 1.0, 1L -> 1.0))
  }
}
