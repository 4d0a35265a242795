package graft.notebook

/** The notebook's PLOT surface as a deterministic artifact — the
  * reference renders its minute-BBO chart with matplotlib
  * (`notebooks/bbo.ipynb`, final cell); this emits the same line
  * chart as a self-contained SVG string, built from PRE-SCALED
  * polyline geometry so the geometry itself can sit under the
  * driver's DuckDB hash (q_notebook_bbo_plot computes the scaled
  * "x,y x,y …" strings with engine-replicable arithmetic; this
  * object only wraps them in markup). Pure string building — no
  * rendering library, no fonts, no floats of its own — so the
  * output is byte-deterministic: same series in, same SVG out.
  */
object PlotSvg {

  /** One polyline: `points` is the SVG points attribute, already
    * scaled to the viewport ("x1,y1 x2,y2 …").
    */
  final case class Series(name: String, points: String)

  private val Palette = Seq("#4C78A8", "#F58518", "#54A24B", "#E45756",
    "#72B7B2", "#B279A2")

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** One bar group: `rects` is a space-separated list of pre-scaled
    * "x,y,w,h" quadruples (the gate's q_notebook_volume_plot output),
    * one per bar, already in viewport coordinates.
    */
  final case class Bars(name: String, rects: String)

  /** A complete SVG document of vertical bars — the notebook's 1-hour
    * TRADE volume panel (`bbo.ipynb` cell 2, `ax2.bar(..., width=1h,
    * align='edge')`). Geometry arrives pre-scaled exactly like
    * [[lineChart]]'s polylines, so the only non-hashed surface is
    * inert markup: each "x,y,w,h" quadruple becomes one `<rect>`.
    */
  def barChart(
      bars: Seq[Bars],
      width: Int = 960,
      height: Int = 480,
      pad: Int = 40,
      title: String = "",
  ): String = {
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" viewBox="0 0 $width $height">"""
    sb ++= s"""<rect x="0" y="0" width="$width" height="$height" fill="white"/>"""
    sb ++= s"""<rect x="$pad" y="$pad" width="${width - 2 * pad}" height="${height - 2 * pad}" fill="none" stroke="#cccccc"/>"""
    if (title.nonEmpty)
      sb ++= s"""<text x="${width / 2}" y="${pad / 2 + 6}" text-anchor="middle" font-family="sans-serif" font-size="14">${esc(title)}</text>"""
    bars.zipWithIndex.foreach { case (b, i) =>
      val color = Palette(i % Palette.size)
      b.rects.split(' ').filter(_.nonEmpty).foreach { quad =>
        val parts = quad.split(',')
        require(parts.length == 4,
          s"barChart: rect quadruple must be x,y,w,h — got '$quad'")
        sb ++= s"""<rect x="${esc(parts(0))}" y="${esc(parts(1))}" width="${esc(parts(2))}" height="${esc(parts(3))}" fill="$color" fill-opacity="0.7"/>"""
      }
      val ly = pad + 16 + 18 * i
      sb ++= s"""<rect x="${width - pad - 110}" y="${ly - 10}" width="12" height="12" fill="$color"/>"""
      sb ++= s"""<text x="${width - pad - 92}" y="$ly" font-family="sans-serif" font-size="12">${esc(b.name)}</text>"""
    }
    sb ++= "</svg>"
    sb.result()
  }

  /** The notebook's FULL figure — matplotlib's two sharex subplots
    * (price lines above volume bars, `bbo.ipynb` cell 2's
    * `plt.subplots(2, 1, sharex=True)`) as ONE SVG document: the
    * upper panel is [[lineChart]]'s markup, the lower [[barChart]]'s
    * translated below it. Markup-only composition — both panels'
    * pre-scaled geometry strings (the two gates' hash-oracled
    * outputs) embed verbatim, exactly as in the single-panel
    * documents, so stacking adds zero un-hashed arithmetic.
    */
  def stackedFigure(
      series: Seq[Series],
      bars: Seq[Bars],
      width: Int = 960,
      panelHeight: Int = 480,
      pad: Int = 40,
      title: String = "",
  ): String = {
    def inner(svg: String): String =
      svg.replaceFirst("^<svg[^>]*>", "").stripSuffix("</svg>")
    val top = lineChart(series, width, panelHeight, pad, title)
    val bottom = barChart(bars, width, panelHeight, pad)
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="${2 * panelHeight}" viewBox="0 0 $width ${2 * panelHeight}">""" +
      s"""<g>${inner(top)}</g>""" +
      s"""<g transform="translate(0,$panelHeight)">${inner(bottom)}</g>""" +
      "</svg>"
  }

  /** A complete SVG document: plot frame, one polyline per series,
    * and a simple legend. Viewport defaults match the gate's scaling
    * (40 px padding into a 960×480 canvas).
    */
  def lineChart(
      series: Seq[Series],
      width: Int = 960,
      height: Int = 480,
      pad: Int = 40,
      title: String = "",
  ): String = {
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" viewBox="0 0 $width $height">"""
    sb ++= s"""<rect x="0" y="0" width="$width" height="$height" fill="white"/>"""
    sb ++= s"""<rect x="$pad" y="$pad" width="${width - 2 * pad}" height="${height - 2 * pad}" fill="none" stroke="#cccccc"/>"""
    if (title.nonEmpty)
      sb ++= s"""<text x="${width / 2}" y="${pad / 2 + 6}" text-anchor="middle" font-family="sans-serif" font-size="14">${esc(title)}</text>"""
    series.zipWithIndex.foreach { case (s, i) =>
      val color = Palette(i % Palette.size)
      sb ++= s"""<polyline fill="none" stroke="$color" stroke-width="1.5" points="${esc(s.points)}"/>"""
      val ly = pad + 16 + 18 * i
      sb ++= s"""<rect x="${width - pad - 110}" y="${ly - 10}" width="12" height="12" fill="$color"/>"""
      sb ++= s"""<text x="${width - pad - 92}" y="$ly" font-family="sans-serif" font-size="12">${esc(s.name)}</text>"""
    }
    sb ++= "</svg>"
    sb.result()
  }
}
