package graft.viz

import org.apache.spark.sql.DataFrame

/** S7: the reference's plot sink (`src/pipeline/evaluation.py:187-217`,
  * `evaluation.py:353-398` — matplotlib bar charts of the metrics
  * table written next to the CSV), re-expressed without native
  * dependencies: a metrics DataFrame renders to a standalone SVG bar
  * chart (vector image, no JVM matplotlib exists). Like the
  * reference, the input is the tiny per-query/per-σ metrics table —
  * it is collected to the driver by design; everything upstream of
  * the plot stayed distributed.
  */
object MetricsViz {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Render (label, value) rows as a vertical bar chart. Deterministic
    * output (no timestamps, fixed formatting) so artifacts diff
    * cleanly between runs. */
  def barSvg(rows: Seq[(String, Double)], title: String,
             width: Int = 640, height: Int = 360): String = {
    require(rows.nonEmpty, "barSvg: no rows")
    val margin = 40
    val innerW = width - 2 * margin
    val innerH = height - 2 * margin
    val maxV = math.max(rows.map(_._2).max, 1e-12)
    val barW = innerW.toDouble / rows.size
    val bars = rows.zipWithIndex.map { case ((label, v), i) =>
      val h = math.max(0.0, v / maxV) * (innerH - 20)
      val x = margin + i * barW
      val y = height - margin - h
      f"""  <rect x="${x + barW * 0.1}%.1f" y="$y%.1f" width="${barW * 0.8}%.1f" height="$h%.1f" fill="#4878a8"/>
         |  <text x="${x + barW / 2}%.1f" y="${height - margin + 14}" font-size="10" text-anchor="middle">${esc(label)}</text>
         |  <text x="${x + barW / 2}%.1f" y="${y - 4}%.1f" font-size="10" text-anchor="middle">$v%.4f</text>""".stripMargin
    }.mkString("\n")
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" viewBox="0 0 $width $height">
       |  <rect width="$width" height="$height" fill="white"/>
       |  <text x="${width / 2}" y="20" font-size="14" text-anchor="middle">${esc(title)}</text>
       |  <line x1="$margin" y1="${height - margin}" x2="${width - margin}" y2="${height - margin}" stroke="black"/>
       |$bars
       |</svg>
       |""".stripMargin
  }

  /** Collect a SMALL metrics frame (one row per label — the σ-sweep
    * or per-query metrics shape) and write one SVG per value column,
    * mirroring the reference's one-PNG-per-metric loop. Returns the
    * written paths. */
  def writeBars(df: DataFrame, labelCol: String, valueCols: Seq[String],
                outDir: String): Seq[String] = {
    val rows = df.select(labelCol, valueCols: _*).collect()
    new java.io.File(outDir).mkdirs()
    valueCols.zipWithIndex.map { case (vc, i) =>
      // NULL metric cells (e.g. a COALESCE-less aggregate over an
      // empty group) are skipped, not rendered as a crash
      val data = rows.flatMap { r =>
        Option(r.get(i + 1)).map(v =>
          (String.valueOf(r.get(0)), v.asInstanceOf[Number].doubleValue()))
      }.toSeq
      val path = s"$outDir/$vc.svg"
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(path), barSvg(data, vc))
      path
    }
  }
}
