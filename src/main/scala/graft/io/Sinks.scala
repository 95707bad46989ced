package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Sinks (SURVEY §2.1 S2/S3/S6, S7).
  *
  * S2 parquet: date/key-partitioned layout so downstream period filters
  * (P2) become partition PRUNING, not just row-group skipping — the
  * 100 TB reason the reference's "load everything then filter in memory"
  * (`market_analysis.py:656,674-678`) disappears.
  *
  * S7 HTML charts: the reference's `fig.write_html` dashboards
  * (`market_analysis.py:71,108,212,471,604,822`) re-expressed as
  * dependency-free inline-SVG documents. Deliberately driver-side over
  * ALREADY-AGGREGATED rows (every feeding aggregate is an oracle-checked
  * query; the render caps its input) — rendering is formatting, like S6.
  */
object Sinks {

  /** S2: parquet sink, optionally hive-partitioned by key columns. */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** S3: JSON-lines sink (`json.dump` of the symbol list,
    * data_fetching.py:56-57). */
  def json(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  private val SeriesColors =
    Seq("#4c78a8", "#f58518", "#54a24b", "#e45756", "#72b7b2", "#b279a2")

  private def esc(s: String): String =
    s.flatMap { case '<' => "&lt;"; case '>' => "&gt;"; case '&' => "&amp;"
                case '"' => "&quot;"; case c => c.toString }

  private def f(v: Double): String =
    if (v == v.toLong.toDouble && math.abs(v) < 1e15) v.toLong.toString
    else "%.6g".formatLocal(java.util.Locale.ROOT, v)

  /** S7: line/scatter chart over an aggregated frame → one
    * self-contained HTML file with an inline SVG (no JS, no external
    * assets). `xCol` and every `yCols` must be numeric (cast upstream).
    * Refuses more than `maxPoints` rows rather than silently collecting
    * a big frame: the input contract is "aggregate first" — exactly the
    * frames the reference plots.
    */
  def htmlChart(df: DataFrame, xCol: String, yCols: Seq[String],
                title: String, path: String, maxPoints: Int = 10000): Unit = {
    val rows = df
      // try_cast: under ANSI a malformed cast throws mid-collect; here a
      // non-numeric value becomes null and is dropped, so degenerate
      // input hits the loud require below instead of an opaque crash
      .select((xCol +: yCols).map(c =>
        org.apache.spark.sql.functions.expr(
          s"try_cast(`$c` AS DOUBLE)").as(c)): _*)
      .na.drop()
      .orderBy(col(xCol)).limit(maxPoints + 1).collect()
    require(rows.length <= maxPoints,
      s"htmlChart input exceeds $maxPoints rows — aggregate before plotting")
    require(rows.nonEmpty,
      "htmlChart input has no plottable rows (empty frame, or every row " +
      "has a null/non-numeric value in the selected columns)")
    val (w, h, pad) = (960, 480, 50)
    val xs = rows.map(_.getDouble(0))
    val ys = yCols.indices.map(i => rows.map(_.getDouble(i + 1)))
    val (xMin, xMax) = (xs.min, xs.max)
    val all = ys.flatten
    val (yMin, yMax) = (all.min, all.max)
    def sx(v: Double) =
      if (xMax == xMin) w / 2.0
      else pad + (v - xMin) / (xMax - xMin) * (w - 2 * pad)
    def sy(v: Double) =
      if (yMax == yMin) h / 2.0
      else h - pad - (v - yMin) / (yMax - yMin) * (h - 2 * pad)
    val lines = yCols.indices.map { i =>
      val pts = xs.zip(ys(i)).map { case (x, y) => s"${sx(x)},${sy(y)}" }
        .mkString(" ")
      val c = SeriesColors(i % SeriesColors.length)
      s"""<polyline fill="none" stroke="$c" stroke-width="1.5" points="$pts"/>"""
    }
    val legend = yCols.zipWithIndex.map { case (name, i) =>
      val c = SeriesColors(i % SeriesColors.length)
      s"""<text x="${pad + i * 160}" y="20" fill="$c">${esc(name)}</text>"""
    }
    val svg =
      s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h">
         |<text x="${w / 2}" y="20" text-anchor="middle" font-weight="bold">${esc(title)}</text>
         |<line x1="$pad" y1="${h - pad}" x2="${w - pad}" y2="${h - pad}" stroke="#888"/>
         |<line x1="$pad" y1="$pad" x2="$pad" y2="${h - pad}" stroke="#888"/>
         |<text x="$pad" y="${h - pad + 20}">${f(xMin)}</text>
         |<text x="${w - pad}" y="${h - pad + 20}" text-anchor="end">${f(xMax)}</text>
         |<text x="${pad - 5}" y="${h - pad}" text-anchor="end">${f(yMin)}</text>
         |<text x="${pad - 5}" y="${pad + 10}" text-anchor="end">${f(yMax)}</text>
         |${lines.mkString("\n")}
         |${legend.mkString("\n")}
         |</svg>""".stripMargin
    writeHtml(path, title, svg)
  }

  /** S7+M10: the Louvain/transition network render
    * (`market_analysis.py:396-471` plot_louvain_network): positions from
    * [[graft.cluster.Clustering.springLayout]], nodes colored by
    * community, edge width by weight. Inputs are the tiny aggregated
    * graph (dozens of nodes). */
  def htmlNetwork(pos: Map[Long, (Double, Double)],
                  edges: Seq[(Long, Long, Double)],
                  community: Map[Long, Long],
                  labels: Map[Long, String],
                  title: String, path: String): Unit = {
    val (w, h, pad) = (720, 720, 60)
    def sx(v: Double) = pad + (v + 1) / 2.0 * (w - 2 * pad)
    def sy(v: Double) = pad + (1 - (v + 1) / 2.0) * (h - 2 * pad)
    val maxW = math.max(edges.map(_._3).foldLeft(0.0)(math.max), 1e-12)
    val es = edges.collect { case (a, b, wt) if pos.contains(a) && pos.contains(b) =>
      val (ax, ay) = pos(a); val (bx, by) = pos(b)
      val sw = 0.5 + 3.5 * wt / maxW
      s"""<line x1="${sx(ax)}" y1="${sy(ay)}" x2="${sx(bx)}" y2="${sy(by)}" stroke="#bbb" stroke-width="$sw"/>"""
    }
    val ns = pos.toSeq.sortBy(_._1).map { case (id, (x, y)) =>
      val c = SeriesColors(
        (community.getOrElse(id, 0L) % SeriesColors.length).toInt.abs)
      val name = esc(labels.getOrElse(id, id.toString))
      s"""<circle cx="${sx(x)}" cy="${sy(y)}" r="8" fill="$c"><title>$name</title></circle>
         |<text x="${sx(x)}" y="${sy(y) - 12}" text-anchor="middle" font-size="11">$name</text>""".stripMargin
    }
    val svg =
      s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h">
         |<text x="${w / 2}" y="24" text-anchor="middle" font-weight="bold">${esc(title)}</text>
         |${es.mkString("\n")}
         |${ns.mkString("\n")}
         |</svg>""".stripMargin
    writeHtml(path, title, svg)
  }

  private def writeHtml(path: String, title: String, svg: String): Unit = {
    val html =
      s"""<!DOCTYPE html>
         |<html><head><meta charset="utf-8"><title>${esc(title)}</title>
         |<style>body{font-family:sans-serif;margin:20px}text{font-size:12px}</style>
         |</head><body>
         |$svg
         |</body></html>""".stripMargin
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, html)
  }

  /** S6: the reference's plain-text multi-section stats report
    * (`market_analysis.py:824-841`; mirrors
    * period_comparison_stats.txt's structure). Driver-side formatting of
    * already-aggregated rows — the distributed work happened upstream. */
  def periodReport(periodName: String, nTransitions: Long, avgDurationDays: Double,
                   nSymbols: Long, avgDailyVolume: Double,
                   topTransition: (String, String, Long)): String = {
    f"""Period: $periodName
       |----------------------------------------
       |Number of transitions: $nTransitions%,d
       |Average regime duration: $avgDurationDays%.1f days
       |Number of assets: $nSymbols%d
       |Average daily volume: $avgDailyVolume%,.2f
       |Most common transition: ${topTransition._1} -> ${topTransition._2} (${topTransition._3}%,d times)
       |""".stripMargin
  }
}
