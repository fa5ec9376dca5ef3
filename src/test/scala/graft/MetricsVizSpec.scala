package graft

import graft.viz.MetricsViz

/** S7 plot sink: SVG bar charts from a metrics frame. */
class MetricsVizSpec extends SparkSpec {
  import spark.implicits._

  test("barSvg renders one bar per row, scaled to the max, XML-escaped") {
    val svg = MetricsViz.barSvg(
      Seq(("a<b", 1.0), ("s2", 0.5), ("s3", 2.0)), "drift & recall")
    assert(svg.startsWith("<svg"))
    assert(svg.linesIterator.count(_.contains("<rect")) == 4) // 3 bars + background
    assert(svg.contains("a&lt;b") && svg.contains("drift &amp; recall"))
    // tallest bar belongs to the max value: its printed label is there
    assert(svg.contains("2.0000") && svg.contains("0.5000"))
    assert(!svg.contains("NaN"))
  }

  test("writeBars emits one well-formed SVG per metric column of the sigma sweep") {
    val out = java.nio.file.Files.createTempDirectory("graft_viz").toString
    val sweep = RetrievalQueries.q56DpSweep(spark, sf0001)
    val paths = MetricsViz.writeBars(sweep, "sigma",
      Seq("attr_drift", "recall", "ndcg_ref"), out)
    assert(paths.size == 3)
    paths.foreach { p =>
      val s = java.nio.file.Files.readString(java.nio.file.Paths.get(p))
      assert(s.startsWith("<svg") && s.contains("</svg>"))
      assert(s.linesIterator.count(_.contains("<rect")) == 5) // 4 sigmas + bg
    }
  }
}
