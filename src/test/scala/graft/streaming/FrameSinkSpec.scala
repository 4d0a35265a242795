package graft.streaming

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit, raise_error, when}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.RawLogSource

/** Batch-level properties of the exactly-once rotating frame sink: a
  * replayed batch reproduces byte-identical files (the idempotence the
  * crash-resume gate q_stream_sink_exactly_once rides on), hours
  * rotate into separate files, temp files stay invisible to discovery,
  * and lines survive verbatim in receipt order.
  */
class FrameSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(name: String): String = {
    val d = new File(sys.props("java.io.tmpdir"), name)
    org.apache.commons.io.FileUtils.deleteQuietly(d)
    d.mkdirs()
    d.getPath
  }

  private def rows(rs: Seq[(String, Long, String)]) = {
    import spark.implicits._
    rs.toDF("fileHour", "lineNo", "value")
  }

  private def readLines(f: File): Seq[String] = {
    val in = new com.github.luben.zstd.ZstdInputStream(
      new java.io.FileInputStream(f))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  test("hours rotate into separate files; lines verbatim in receipt order") {
    val dir = tmpDir("frame_sink_rotate")
    FrameSink.writeBatch(rows(Seq(
      ("2025-07-01-11", 20L, """{"b":2}"""),
      ("2025-07-01-10", 10L, """{"a":1}"""),
      ("2025-07-01-11", 5L, """{"b":1}"""),
    )), dir, batchId = 0L)
    val files = new File(dir).listFiles().map(_.getName).sorted
    assert(files.toSeq ===
      Seq("2025-07-01-10.b0.jsonl.zst", "2025-07-01-11.b0.jsonl.zst"))
    assert(readLines(new File(dir, files(0))) === Seq("""{"a":1}"""))
    // within an hour, receipt (lineNo) order wins over input order
    assert(readLines(new File(dir, files(1))) ===
      Seq("""{"b":1}""", """{"b":2}"""))
  }

  test("replaying a batch is idempotent: same files, same bytes") {
    val dir = tmpDir("frame_sink_idem")
    val batch = rows((1 to 50).map(i =>
      (s"2025-07-01-${10 + i % 2}", i.toLong, s"""{"i":$i}""")))
    FrameSink.writeBatch(batch, dir, batchId = 7L)
    val first = new File(dir).listFiles().map(f =>
      f.getName -> Files.readAllBytes(f.toPath).toSeq).toMap
    FrameSink.writeBatch(batch, dir, batchId = 7L) // the crash-replay
    val second = new File(dir).listFiles().map(f =>
      f.getName -> Files.readAllBytes(f.toPath).toSeq).toMap
    assert(second === first)
    assert(first.keySet ===
      Set("2025-07-01-10.b7.jsonl.zst", "2025-07-01-11.b7.jsonl.zst"))
  }

  test("distinct batches coexist; discover orders them within the hour " +
    "and fileHourOf strips the batch suffix") {
    val dir = tmpDir("frame_sink_multi")
    FrameSink.writeBatch(rows(Seq(("2025-07-01-10", 1L, "x"))), dir, 0L)
    FrameSink.writeBatch(rows(Seq(("2025-07-01-10", 2L, "y"))), dir, 1L)
    val found = RawLogSource.discover(dir)
    assert(found.map(p => new File(p).getName) ===
      Seq("2025-07-01-10.b0.jsonl.zst", "2025-07-01-10.b1.jsonl.zst"))
    assert(found.map(RawLogSource.fileHourOf).distinct === Seq("2025-07-01-10"))
  }

  test("leftover temp files are invisible to discovery") {
    val dir = tmpDir("frame_sink_tmp")
    FrameSink.writeBatch(rows(Seq(("2025-07-01-10", 1L, "x"))), dir, 0L)
    // simulate a crash mid-write: a stale temp file on disk
    Files.write(new File(dir, ".2025-07-01-11.b1.jsonl.zst.tmp").toPath,
      "partial".getBytes)
    assert(RawLogSource.discover(dir).map(p => new File(p).getName) ===
      Seq("2025-07-01-10.b0.jsonl.zst"))
  }

  test("a crash DURING the batch write (mid-partition) leaves no visible " +
    "file for that hour, and the replayed batch heals it completely") {
    import spark.implicits._
    val dir = tmpDir("frame_sink_midwrite")
    val poisoned = rows((1 to 20).map(i => ("2025-07-01-10", i.toLong, s"line$i")))
      .withColumn("value",
        when(col("lineNo") === 15L,
          raise_error(lit("graft-injected mid-write failure")))
          .otherwise(col("value")))
    intercept[Exception] {
      FrameSink.writeBatch(poisoned, dir, batchId = 3L)
    }
    // the hour's final file must NOT exist — only tmp garbage may remain,
    // and discovery must not see it
    assert(RawLogSource.discover(dir).isEmpty,
      s"partial write visible: ${new File(dir).listFiles().map(_.getName).mkString(",")}")
    // the retried batch (same id, full data) heals the hour
    FrameSink.writeBatch(
      rows((1 to 20).map(i => ("2025-07-01-10", i.toLong, s"line$i"))), dir, batchId = 3L)
    val found = RawLogSource.discover(dir)
    assert(found.map(p => new File(p).getName) === Seq("2025-07-01-10.b3.jsonl.zst"))
    assert(readLines(new File(found.head)) === (1 to 20).map(i => s"line$i"))
  }

  test("keyedLines buckets by UTC receipt hour and drops unparseable receipts") {
    import spark.implicits._
    val lines = Seq(
      """{"timestamp":"2025-07-01T10:59:59+00:00","message_type":"x","content":"a"}""",
      """{"timestamp":"2025-07-01T13:00:00+02:00","message_type":"x","content":"b"}""",
      """not json at all""",
    ).toDF("value")
    val keyed = FrameSink.keyedLines(lines).collect()
    assert(keyed.length === 2)
    assert(keyed.map(_.getString(0)).toSeq ===
      Seq("2025-07-01-10", "2025-07-01-11")) // +02:00 normalizes to 11 UTC
  }
}
