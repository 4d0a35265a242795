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
