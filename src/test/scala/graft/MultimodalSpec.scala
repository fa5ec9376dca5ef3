package graft

import graft.multimodal.{DecodeStub, MediaFeatures, Multimodal}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing: schema, sniffing, stubbed
  * decode, frame sampling. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 1, 2, 3)
  private val jpg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 9)
  private val media = {
    val rows = java.util.Arrays.asList(
      Row(1L, png, Row("png", 64, 48, null)),
      Row(2L, jpg, Row("jpeg", 32, 32, null)),
      Row(3L, "plain bytes".getBytes("UTF-8"), Row(null, null, null, 10)))
    spark.createDataFrame(rows, Multimodal.mediaSchema)
  }

  test("media schema round-trips binary + metadata struct") {
    assert(media.schema == Multimodal.mediaSchema)
    assert(media.count() == 3)
    val w = media.filter(col("media_id") === 1)
      .select(col("meta.width")).as[Int].head()
    assert(w == 64)
  }

  test("sniffFormat dispatches on magic bytes") {
    val got = media.select(col("media_id"), Multimodal.sniffFormat(col("media")))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "png", 2L -> "jpeg", 3L -> "unknown"))
  }

  test("byteSize and fingerprint are binary-safe") {
    val (n, fp) = media.filter(col("media_id") === 1)
      .select(Multimodal.byteSize(col("media")), Multimodal.fingerprint(col("media")))
      .as[(Long, String)].head()
    assert(n == 7)
    assert(fp.matches("[0-9a-f]{32}"))
  }

  test("MediaFeatures.extract: distributed, deterministic, fixed dim") {
    val dec = new DecodeStub(16)
    val out = MediaFeatures.extract(media, "media_id", "media", dec)
      .as[(Long, Array[Float])].collect().toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    out.values.foreach(v => assert(v.length == 16))
    // determinism: repeated extraction yields identical features
    val again = MediaFeatures.extract(media, "media_id", "media", dec)
      .as[(Long, Array[Float])].collect().toMap
    assert(out(1L).toSeq == again(1L).toSeq)
    assert(out(1L).toSeq != out(2L).toSeq)
  }

  test("featureStub expression matches dim and range, oracle-style") {
    val feats = media.select(Multimodal.featureStub(col("media"), 8).as("f"))
      .as[Seq[Double]].collect()
    feats.foreach { f =>
      assert(f.size == 8)
      f.foreach(x => assert(x >= -0.5 && x < 0.5))
    }
  }

  test("sampleFrames explodes every stride-th frame index") {
    val frames = Multimodal.sampleFrames(media, "media_id", 3)
      .as[(Long, Int)].collect().toSeq.sorted
    assert(frames == Seq((3L, 0), (3L, 3), (3L, 6), (3L, 9)))
  }

  test("q152 image near-dup: banding finds every planted pair, dHash separates edits from strangers") {
    val pairs = SparkEntry.queries("q152_image_neardup")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    // every planted near-dup (id, id+dhashBase) survives the band
    // join AND the tau filter — the column-major packing keeps the
    // column-0 perturbation inside one band, so the other three
    // bands match exactly
    val planted = pairs.filter { case (a, b, _) =>
      b == a + PipelineQueries.dhashBase }
    assert(planted.size == PipelineQueries.dhashBase.toInt.min(
      PipelineQueries.dhashN - PipelineQueries.dhashBase),
      s"missing planted pairs: found ${planted.size}")
    // the perturbation flips only column-0/1 comparisons: 8 bits max
    planted.foreach { case (a, b, h) =>
      assert(h <= 8, s"planted pair ($a,$b) drifted to hamming $h") }
    // symmetry/dedup hygiene: a < b, no duplicates
    assert(pairs.forall { case (a, b, _) => a < b })
    assert(pairs.map(p => (p._1, p._2)).distinct.size == pairs.size)
    // the hash genuinely discriminates: some image pairs are NOT
    // near-dups (an all-pairs tau pass would make banding pointless)
    val n = PipelineQueries.dhashN.toLong
    assert(pairs.size < n * (n - 1) / 2,
      "every pair passed tau — the fingerprint separates nothing")
  }

  test("q153 video near-dup: frame-aligned banding finds every planted clip pair within budget") {
    val pairs = SparkEntry.queries("q153_video_neardup")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val planted = pairs.filter { case (a, b, _, _) =>
      b == a + PipelineQueries.vdupBase }
    assert(planted.size ==
      PipelineQueries.vdupN - PipelineQueries.vdupBase,
      s"missing planted clip pairs: found ${planted.size}")
    planted.foreach { case (a, b, nf, ham) =>
      // the column-0 perturbation flips at most the grid's occupied
      // column-0 comparisons per frame
      assert(nf >= 1 && ham <= 8 * nf,
        s"planted pair ($a,$b) drifted: $ham over $nf frames")
      // a same-source pair aligns on every sampled frame (same dims,
      // same frame count)
      val (_, _, n) = PipelineQueries.y4mDims(a)
      assert(nf == (n + PipelineQueries.y4mStride - 1) / PipelineQueries.y4mStride,
        s"planted pair ($a,$b) lost aligned frames: $nf")
    }
    assert(pairs.forall { case (a, b, _, _) => a < b })
    val nClips = PipelineQueries.vdupN.toLong
    assert(pairs.size < nClips * (nClips - 1) / 2,
      "every clip pair passed tau — the fingerprint separates nothing")
  }

  test("q154 audio near-dup: banding finds every planted edited-intro pair within the band-0 bit budget") {
    val pairs = SparkEntry.queries("q154_audio_neardup")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    val planted = pairs.filter { case (a, b, _) =>
      b == a + PipelineQueries.adupBase }
    assert(planted.size ==
      PipelineQueries.adupN - PipelineQueries.adupBase,
      s"missing planted track pairs: found ${planted.size}")
    planted.foreach { case (a, b, ham) =>
      // the intro edit touches windows 0/4/8/12 only; their ≤ 7
      // clean-vs-edited comparisons are the only flippable bits, and
      // all of them live in band 0 — bands 1..3 must agree exactly
      assert(ham <= 7, s"planted pair ($a,$b) drifted: hamming $ham")
    }
    assert(pairs.forall { case (a, b, _) => a < b })
    val n = PipelineQueries.adupN.toLong
    assert(pairs.size < n * (n - 1) / 2,
      "every track pair passed tau — the fingerprint separates nothing")
  }
}
