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

  /** Locale-invariant decimal formatting: SVG coordinates require a
    * '.' decimal separator whatever the JVM default locale, and
    * byte-identical artifacts across machines require the same. */
  private def d1(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
  private def d4(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

  /** Render (label, value) rows as a vertical bar chart. Deterministic
    * output (no timestamps, fixed locale-invariant formatting) so
    * artifacts diff cleanly between runs and machines. */
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
      s"""  <rect x="${d1(x + barW * 0.1)}" y="${d1(y)}" width="${d1(barW * 0.8)}" height="${d1(h)}" fill="#4878a8"/>
         |  <text x="${d1(x + barW / 2)}" y="${height - margin + 14}" font-size="10" text-anchor="middle">${esc(label)}</text>
         |  <text x="${d1(x + barW / 2)}" y="${d1(y - 4)}" font-size="10" text-anchor="middle">${d4(v)}</text>""".stripMargin
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
    * mirroring the reference's one-PNG-per-metric loop. NULL metric
    * cells are skipped; a column with NO renderable cells is skipped
    * entirely (no SVG for it) rather than aborting the remaining
    * columns. Returns the paths actually written. */
  def writeBars(df: DataFrame, labelCol: String, valueCols: Seq[String],
                outDir: String): Seq[String] = {
    val rows = df.select(labelCol, valueCols: _*).collect()
    new java.io.File(outDir).mkdirs()
    valueCols.zipWithIndex.flatMap { case (vc, i) =>
      val data = rows.flatMap { r =>
        Option(r.get(i + 1)).map(v =>
          (String.valueOf(r.get(0)), v.asInstanceOf[Number].doubleValue()))
      }.toSeq
      if (data.isEmpty) None
      else {
        val path = s"$outDir/$vc.svg"
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(path), barSvg(data, vc))
        Some(path)
      }
    }
  }
}
