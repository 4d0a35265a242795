package graft.notebook

import org.scalatest.funsuite.AnyFunSuite

/** The SVG wrapper around the hash-gated plot geometry: well-formed
  * XML, polylines carrying the gate's points attribute VERBATIM,
  * byte-deterministic output, and the live integration with the
  * q_notebook_bbo_plot rows.
  */
class PlotSvgSpec extends AnyFunSuite {

  test("complete well-formed SVG: one polyline per series, points " +
    "verbatim, escaping correct, byte-deterministic") {
    val series = Seq(
      PlotSvg.Series("ask", "40.00,240.00 480.00,40.00"),
      PlotSvg.Series("bid", "40.00,440.00 920.00,240.00"))
    val svg = PlotSvg.lineChart(series, title = "YES best bid/ask <minutely>")
    assert(svg == PlotSvg.lineChart(series, title = "YES best bid/ask <minutely>"))
    series.foreach(s => assert(svg.contains(s"""points="${s.points}"""")))
    assert(svg.contains("&lt;minutely&gt;"))
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(
        svg.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val polys = doc.getElementsByTagName("polyline")
    assert(polys.getLength == 2)
    assert((0 until 2).map(i =>
      polys.item(i).getAttributes.getNamedItem("points").getNodeValue) ==
      series.map(_.points))
  }

  test("barChart: one <rect> per quadruple, coordinates verbatim, " +
    "well-formed XML, malformed quadruples refuse loudly") {
    val bars = Seq(PlotSvg.Bars("volume",
      "40.00,240.00,293.33,200.00 333.33,40.00,293.33,400.00"))
    val svg = PlotSvg.barChart(bars, title = "hourly volume")
    assert(svg == PlotSvg.barChart(bars, title = "hourly volume"))
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(
        svg.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val rects = doc.getElementsByTagName("rect")
    // background + frame + 2 bars + 1 legend swatch
    assert(rects.getLength == 5)
    assert(svg.contains("""<rect x="40.00" y="240.00" width="293.33" height="200.00""""))
    assert(svg.contains("""<rect x="333.33" y="40.00" width="293.33" height="400.00""""))
    val ex = intercept[IllegalArgumentException] {
      PlotSvg.barChart(Seq(PlotSvg.Bars("bad", "40.00,240.00,293.33")))
    }
    assert(ex.getMessage.contains("x,y,w,h"))
  }

  test("stackedFigure: both panels' geometry verbatim in one " +
    "well-formed document, lower panel translated, deterministic") {
    val series = Seq(PlotSvg.Series("bid", "40.00,440.00 920.00,240.00"))
    val bars = Seq(PlotSvg.Bars("volume", "40.00,240.00,440.00,200.00"))
    val svg = PlotSvg.stackedFigure(series, bars, title = "fixture market")
    assert(svg == PlotSvg.stackedFigure(series, bars, title = "fixture market"))
    assert(svg.contains("""points="40.00,440.00 920.00,240.00""""))
    assert(svg.contains("""<rect x="40.00" y="240.00" width="440.00" height="200.00""""))
    assert(svg.contains("""transform="translate(0,480)""""))
    assert(svg.contains("""height="960""""))
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(
        svg.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    assert(doc.getElementsByTagName("g").getLength == 2)
    assert(doc.getElementsByTagName("polyline").getLength == 1)
    // exactly one <svg> root: the panel wrappers must have been stripped
    assert(doc.getElementsByTagName("svg").getLength == 1)
  }

  test("the gate rows render: q_notebook_volume_plot output wraps into " +
    "a parseable bar document with the geometry intact") {
    val spark = graft.TestSpark.spark
    val rows = graft.SparkEntry.queries("q_notebook_volume_plot")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 1)
    val rects = rows.head.getAs[String]("rects")
    assert(rows.head.getAs[Long]("n_bars") ==
      rects.split(' ').count(_.nonEmpty).toLong)
    assert(rects.matches(
      """(\d+\.\d{2},\d+\.\d{2},\d+\.\d{2},\d+\.\d{2})( \d+\.\d{2},\d+\.\d{2},\d+\.\d{2},\d+\.\d{2})*"""),
      s"scaled rect geometry shape: ${rects.take(80)}")
    val svg = PlotSvg.barChart(
      Seq(PlotSvg.Bars("volume", rects)), title = "hourly volume (fixture)")
    rects.split(' ').foreach { quad =>
      val p = quad.split(',')
      assert(svg.contains(
        s"""<rect x="${p(0)}" y="${p(1)}" width="${p(2)}" height="${p(3)}""""))
    }
    javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(
        svg.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  test("the gate rows render: q_notebook_bbo_plot output wraps into a " +
    "parseable document with every side's geometry intact") {
    val spark = graft.TestSpark.spark
    val rows = graft.SparkEntry.queries("q_notebook_bbo_plot")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val series = rows.map(r => PlotSvg.Series(
      r.getString(0), r.getAs[String]("points"))).toSeq
    val svg = PlotSvg.lineChart(series, title = "minute BBO (fixture)")
    series.foreach { x =>
      assert(x.points.matches("""(\d+\.\d{2},\d+\.\d{2})( \d+\.\d{2},\d+\.\d{2})*"""),
        s"scaled geometry shape: ${x.points.take(60)}")
      assert(svg.contains(s"""points="${x.points}""""))
    }
    javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(
        svg.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }
}
