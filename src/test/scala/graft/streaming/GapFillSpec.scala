package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

private[streaming] case class GapFillSpecEv(
    event_id: Long, ts: Timestamp, event_type: String, value: Double)

/** The streaming gap-fill must emit exactly the batch spine: every
  * minute in [lo, hi] per series, last-observation carry-forward,
  * max_by(value, event_id) within a minute — and the answer must not
  * depend on how arrival slices into micro-batches.
  */
class GapFillSpec extends AnyFunSuite {

  private def rocksSession() = {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    s
  }

  

  private val t0 = 1751378400L // 2025-07-01 14:00:00 UTC, on a minute boundary
  private def ev(id: Long, minute: Int, sec: Int, series: String, v: Double): GapFillSpecEv =
    GapFillSpecEv(id, new Timestamp((t0 + minute * 60L + sec) * 1000L), series, v)

  // 10-minute window, two series: A observes minutes 0 (twice — later
  // event_id must win), 3, 9; B observes 1 and 4 only, so B's tail
  // minutes 5..9 are all carries and A leads with two gap minutes.
  private val fixture = Seq(
    ev(1, 0, 10, "A", 1.0), ev(5, 0, 5, "A", 2.0), // same minute: id 5 wins
    ev(2, 1, 0, "B", 10.0),
    ev(3, 3, 30, "A", 3.0),
    ev(4, 4, 59, "B", 20.0),
    ev(6, 9, 12, "A", 4.0),
  )

  /** Hand-rolled expectation: closed spine, per-series ffill. */
  private val expected: Seq[(String, String, Option[Double], Long)] = {
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    val lastPerMinute = fixture
      .groupBy(e => (e.event_type, e.ts.getTime / 60000L))
      .map { case (k, evs) => k -> evs.maxBy(_.event_id).value }
    (for (series <- Seq("A", "B")) yield {
      var carry: Option[Double] = None
      (0 until 10).map { m =>
        val o = lastPerMinute.get((series, t0 / 60 + m))
        if (o.isDefined) carry = o
        (fmt.format(java.time.Instant.ofEpochSecond(t0 + m * 60L)),
          series, carry, if (o.isDefined) 0L else 1L)
      }
    }).flatten.sortBy(r => (r._1, r._2))
  }

  private def run(name: String, slices: Seq[Seq[GapFillSpecEv]]): Seq[(String, String, Option[Double], Long)] = {
    val s = rocksSession()
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[GapFillSpecEv]
    val lo = t0 * 1000L
    val hi = (t0 + 9 * 60L) * 1000L
    val q = GapFill.filledSpine(input.toDS().toDF(), lo, hi)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
      .start()
    slices.foreach { sl => input.addData(sl: _*); q.processAllAvailable() }
    // the spine emits from the timer batch AFTER the final watermark
    // advance — poll the sink rather than assume a batch cadence
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (s.table(name).count() < 20) {
      assert(System.nanoTime() < deadline, "timed out waiting for the spine")
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
      Thread.sleep(50)
    }
    q.stop()
    val out = s.table(name)
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getLong(3)))
      .toSeq.sortBy(r => (r._1, r._2))
    s.catalog.dropTempView(name)
    out
  }

  test("single-batch arrival matches the hand-rolled batch ffill") {
    assert(run("gap_fill_one", Seq(fixture)) == expected)
  }

  test("micro-batch slicing (time-ordered) cannot change the spine") {
    // slices split on event-time order — with a 0s watermark a later
    // slice may not reach back before the high-water mark, same as any
    // ordered replay source
    val sliced = Seq(
      fixture.filter(_.ts.getTime < (t0 + 180) * 1000L),
      fixture.filter(e => e.ts.getTime >= (t0 + 180) * 1000L && e.ts.getTime < (t0 + 400) * 1000L),
      fixture.filter(_.ts.getTime >= (t0 + 400) * 1000L),
    )
    assert(run("gap_fill_sliced", sliced) == expected)
  }
}
