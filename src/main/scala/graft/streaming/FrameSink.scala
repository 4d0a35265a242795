package graft.streaming

import java.io.{File, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import com.github.luben.zstd.ZstdOutputStream
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Exactly-once, hour-rotated raw-frame sink for STREAMING ingest — the
  * collector's rotating log (K2, `collector/src/main.rs:137-183`,
  * flush cadence `:185-210`) under Structured Streaming's
  * failure/restart semantics.
  *
  * The collector appends each received frame line to the current hour's
  * `YYYY-MM-DD-HH.jsonl.zst` and rotates on the hour boundary. A
  * distributed restartable ingest can't use a plain append file — a
  * batch replayed after a crash would append its frames twice. This
  * sink makes the batch write IDEMPOTENT instead: every (hour, batch)
  * pair writes ONE deterministic file `HOUR.bBATCHID.jsonl.zst`
  * (temp-file + atomic rename), so replaying a failed batch rewrites
  * the same files byte-for-byte. Offset tracking (which source data is
  * in which batch) comes from the streaming checkpoint; idempotent
  * output + checkpointed offsets = exactly-once end to end.
  *
  * Lines are written VERBATIM (the sink never re-serializes), so the
  * output is byte-format-compatible with the collector's log by
  * construction, and `RawLogSource` re-reads it like any recorded log:
  * the `.bN` suffix sorts lexicographically after the hour key, hour
  * order across files and receipt order within a file are both
  * preserved, and `fileHourOf` strips the suffix at the first '.'.
  *
  * Scale shape: frames are partitioned by hour, so each hour file is
  * written by exactly one task (the collector is single-writer per
  * hour by definition) while distinct hours write in parallel across
  * the cluster; a long-running ingest distributes over time, not over
  * one hot hour.
  */
object FrameSink {

  /** Idempotent one-batch write. `rows` must have columns
    * (fileHour: String, lineNo: Long, value: String); lines land in
    * `dir/FILEHOUR.bBATCHID.jsonl.zst` in (fileHour, lineNo) order.
    * Re-invoking with the same rows and batchId reproduces identical
    * files (overwrite via atomic rename), which is what makes a
    * checkpoint-replayed batch harmless.
    */
  def writeBatch(rows: DataFrame, dir: String, batchId: Long): Unit = {
    new File(dir).mkdirs()
    rows
      .repartition(col("fileHour"))
      .sortWithinPartitions(col("fileHour"), col("lineNo"))
      .select(col("fileHour"), col("value"))
      .foreachPartition { (it: Iterator[Row]) =>
        var hour: String = null
        var out: OutputStreamWriter = null
        var tmp: File = null
        var fin: File = null
        def commit(): Unit = if (out != null) {
          out.close()
          if (!tmp.renameTo(fin))
            throw new java.io.IOException(s"rename ${tmp.getPath} -> ${fin.getPath} failed")
        }
        def roll(h: String): Unit = {
          commit()
          hour = h
          fin = new File(dir, s"$h.b$batchId.jsonl.zst")
          // leading '.' keeps half-written temp files invisible to
          // RawLogSource.discover's hour-pattern filter; rename is
          // atomic on a POSIX filesystem, so readers see either the
          // previous complete file or the new complete file
          tmp = new File(dir, s".$h.b$batchId.jsonl.zst.tmp")
          out = new OutputStreamWriter(
            new ZstdOutputStream(new FileOutputStream(tmp)),
            StandardCharsets.UTF_8)
        }
        it.foreach { r =>
          val h = r.getString(0)
          if (h != hour) roll(h)
          out.write(r.getString(1))
          out.write("\n")
        }
        commit()
      }
  }

  /** Raw frame lines (`value` column, e.g. `readStream.text`) keyed by
    * receipt time: UTC hour bucket for rotation, receipt micros for
    * within-hour order — the same arrival keying as
    * `RawLogSource.feedMessagesFromLines` (the collector stamps
    * `Utc::now` at append, `collector/src/main.rs:28`). Lines whose
    * receipt timestamp doesn't parse have no rotation key and are
    * dropped (dirty-data policy, same as the parse path).
    */
  def keyedLines(lines: DataFrame): DataFrame = {
    val ts = get_json_object(col("value"), "$.timestamp")
    val receipt = to_timestamp(ts)
    lines
      .filter(receipt.isNotNull)
      .select(
        date_format(
          convert_timezone(lit("UTC"), receipt.cast("timestamp_ntz")),
          "yyyy-MM-dd-HH").as("fileHour"),
        unix_micros(receipt).as("lineNo"),
        col("value"))
  }

  /** Start the checkpointed ingest: text lines → receipt-keyed →
    * idempotent hour-rotated batch writes. `failAfterBatch` injects a
    * crash at the WORST point — after batch N's output is fully on
    * disk but before the checkpoint commits it — so a restart from the
    * same checkpoint must replay that batch over its own leftovers;
    * anything short of idempotent output shows up as duplicated
    * frames.
    */
  def start(
      lines: DataFrame,
      dir: String,
      checkpoint: String,
      failAfterBatch: Option[Long] = None,
  ): StreamingQuery =
    keyedLines(lines).writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        writeBatch(df, dir, batchId)
        failAfterBatch.foreach { n =>
          if (batchId == n)
            throw new RuntimeException(
              s"graft-injected crash after batch $n write, before commit")
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
