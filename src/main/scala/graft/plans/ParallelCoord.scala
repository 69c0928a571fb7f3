package graft.plans

import graft.plans.Choices.SearchResult

/** Static parallel-coordinates rendering of a parameter search (reference
  * skrub/_data_ops/_parallel_coord.py — plotly Parcoords over cv_results).
  * The reference needs plotly at display time; graft emits a self-contained
  * inline SVG (same discipline as TableReport's charts): one vertical axis
  * per parameter plus a final score axis, one polyline per trial colored
  * blue→red by score, numeric axes min-max scaled (log-scaled on request,
  * mirroring the reference's log_scale_columns), non-numeric axes ordinal
  * with category tick labels and nulls as their own "Null" tick below the
  * categories (the reference's -1 encoding).
  *
  * Deterministic: no jitter (the reference jitters to de-overlap plotly
  * lines; an SVG with per-line opacity reads fine without it, and
  * determinism keeps the rendering testable).
  */
object ParallelCoord {

  private val W = 900
  private val H = 360
  private val PadX = 70
  private val PadTop = 40
  private val PadBottom = 20

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Blue (worst) → red (best), the reference's default "bluered" scale. */
  private def color(t: Double): String = {
    val c = math.max(0.0, math.min(1.0, t))
    f"rgb(${(c * 255).toInt}%d,0,${((1 - c) * 255).toInt}%d)"
  }

  private def fmt(v: Double): String =
    if (v == v.toLong.toDouble && math.abs(v) < 1e15) v.toLong.toString
    else f"$v%.4g"

  /** Render `results` (one line per trial). Axis order: sorted parameter
    * names, then score. `logScale` names parameters whose numeric axis is
    * log-scaled (values must be > 0).
    */
  def svg(results: Seq[SearchResult], logScale: Set[String]): String =
    svgTrials(results.map(r => (r.params, r.score)), logScale)

  def svg(results: Seq[SearchResult]): String = svg(results, Set.empty[String])

  /** Core rendering over bare (params, score) trials. */
  def svgTrials(trials: Seq[(Map[String, Any], Double)],
                logScale: Set[String] = Set.empty): String = {
    require(trials.nonEmpty, "no search results to render")
    val results = trials
    val paramNames = results.flatMap(_._1.keys).distinct.sorted
    val axes: Seq[String] = paramNames :+ "score"
    val nAxes = axes.length
    def axisX(i: Int): Double =
      if (nAxes == 1) W / 2.0
      else PadX + i.toDouble * (W - 2 * PadX) / (nAxes - 1)
    val y0 = H - PadBottom
    val y1 = PadTop

    def valueOf(r: (Map[String, Any], Double), axis: String): Option[Any] =
      if (axis == "score") Some(r._2) else r._1.get(axis).filter(_ != null)

    // per-axis scaler: Any -> [0, 1] position + tick list (pos, label)
    final case class Axis(pos: Any => Double, ticks: Seq[(Double, String)])
    val axisScales: Map[String, Axis] = axes.map { a =>
      val vals = results.flatMap(valueOf(_, a))
      val nums = vals.collect {
        case n: java.lang.Number => n.doubleValue()
        case b: Boolean          => if (b) 1.0 else 0.0
      }
      val axis =
        if (nums.length == vals.length && vals.nonEmpty) {
          val log = logScale.contains(a)
          def tr(v: Double) = if (log) math.log(v) else v
          val (mn, mx) = (nums.map(tr).min, nums.map(tr).max)
          val span = if (mx > mn) mx - mn else 1.0
          Axis(
            v => (tr(v match {
              case n: java.lang.Number => n.doubleValue()
              case b: Boolean          => if (b) 1.0 else 0.0
            }) - mn) / span,
            Seq(0.0 -> fmt(nums.min), 1.0 -> fmt(nums.max)))
        } else {
          // ordinal axis: sorted distinct string forms; nulls (absent
          // params) pin below the categories like the reference's -1
          val cats = vals.map(String.valueOf).distinct.sorted
          val hasNull = results.exists(valueOf(_, a).isEmpty)
          val offset = if (hasNull) 1 else 0
          val n = math.max(cats.length + offset - 1, 1)
          val idx = cats.zipWithIndex.map { case (c, i) => c -> (i + offset) }.toMap
          Axis(
            v => idx(String.valueOf(v)).toDouble / n,
            (if (hasNull) Seq(0.0 -> "Null") else Nil) ++
              cats.map(c => idx(c).toDouble / n -> c))
        }
      a -> axis
    }.toMap

    def yOf(frac: Double): Double = y0 - frac * (y0 - y1)

    val (sMin, sMax) = (results.map(_._2).min, results.map(_._2).max)
    val sSpan = if (sMax > sMin) sMax - sMin else 1.0
    val lines = results.map { r =>
      val pts = axes.zipWithIndex.map { case (a, i) =>
        val frac = valueOf(r, a).map(axisScales(a).pos).getOrElse(0.0)
        f"${axisX(i)}%.1f,${yOf(frac)}%.1f"
      }
      s"""<polyline points="${pts.mkString(" ")}" fill="none" """ +
        s"""stroke="${color((r._2 - sMin) / sSpan)}" """ +
        """stroke-width="1.5" opacity="0.65"/>"""
    }
    val axisMarks = axes.zipWithIndex.map { case (a, i) =>
      val x = axisX(i)
      val ticks = axisScales(a).ticks.map { case (frac, label) =>
        f"""<text x="${x + 4}%.1f" y="${yOf(frac)}%.1f" font-size="9">${esc(label)}</text>"""
      }.mkString
      f"""<line x1="$x%.1f" y1="$y1%d" x2="$x%.1f" y2="$y0%d" stroke="#999"/>""" +
        f"""<text x="$x%.1f" y="${y1 - 8}%d" font-size="11" text-anchor="middle">${esc(a)}</text>""" +
        ticks
    }
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$W" height="$H" """ +
      s"""font-family="monospace">\n${lines.mkString("\n")}\n""" +
      s"""${axisMarks.mkString("\n")}\n</svg>"""
  }

  /** Self-contained HTML page wrapping the SVG (reference
    * plot_parallel_coord returns a displayable figure; this is the
    * no-dependency equivalent).
    */
  def html(results: Seq[SearchResult], title: String = "Parameter search",
           logScale: Set[String] = Set.empty): String =
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>${esc(title)}</title></head>
       |<body><h1>${esc(title)}</h1>
       |<p>${results.length} trials; best score ${fmt(results.map(_.score).max)}</p>
       |${svg(results, logScale)}
       |</body></html>""".stripMargin
}
