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
  * the zero-padded `.bNNNNNNNNN` suffix sorts lexicographically in
  * batch order within an hour (a bare `.bN` would put b10 before b2
  * once a long-running ingest passes ten batches for one hour), hour
  * order across files and receipt order within a file are both
  * preserved, and `fileHourOf` strips the suffix at the first '.'.
  *
  * Ordering contract: within an hour, lines serialize in
  * (receipt micros, seq, bytes) order — a TOTAL order. `seq` is an
  * optional arrival-sequence column a source may supply (the DSv2 feed
  * source's per-partition index, a file reader's line number); absent
  * that, frames sharing a receipt microsecond order by their raw
  * bytes. Either way the order is deterministic, so a checkpoint-
  * replayed batch reproduces byte-identical files even when receipt
  * timestamps collide — the collector's single-writer append order
  * (`collector/src/main.rs:185-210`) can't be recovered from a
  * distributed shuffle, but byte-determinism, the property the
  * exactly-once guarantee actually needs, can.
  *
  * Scale shape: frames are partitioned by hour, so each hour file is
  * written by exactly one task (the collector is single-writer per
  * hour by definition) while distinct hours write in parallel across
  * the cluster; a long-running ingest distributes over time, not over
  * one hot hour.
  */
object FrameSink {

  /** Fixed-width batch suffix: lexicographic file order == numeric
    * batch order for any ingest shorter than a billion batches (a
    * year at one batch per second is ~31M).
    */
  private[streaming] def batchFileName(hour: String, batchId: Long): String =
    f"$hour.b$batchId%09d.jsonl.zst"

  /** Idempotent one-batch write. `rows` must have columns
    * (fileHour: String, lineNo: Long, value: String) and may carry an
    * optional `seq` arrival-sequence column; lines land in
    * `dir/FILEHOUR.bNNNNNNNNN.jsonl.zst` in (fileHour, lineNo[, seq],
    * value) order — total, so re-invoking with the same rows and
    * batchId reproduces byte-identical files (overwrite via atomic
    * rename) even when receipt timestamps collide, which is what makes
    * a checkpoint-replayed batch harmless.
    */
  /** The distributed shape of the batch write, exposed for the plan
    * assertion: ONE hash exchange on fileHour (each hour file written
    * by exactly one task) + a partition-local total-order sort — no
    * global sort barrier.
    */
  private[graft] def shaped(rows: DataFrame): DataFrame = {
    val sortKey =
      if (rows.columns.contains("seq"))
        Seq(col("fileHour"), col("lineNo"), col("seq"), col("value"))
      else Seq(col("fileHour"), col("lineNo"), col("value"))
    rows
      .repartition(col("fileHour"))
      .sortWithinPartitions(sortKey: _*)
      .select(col("fileHour"), col("value"))
  }

  def writeBatch(rows: DataFrame, dir: String, batchId: Long): Unit = {
    new File(dir).mkdirs()
    shaped(rows)
      .foreachPartition { (it: Iterator[Row]) =>
        // per-attempt temp name: under task retry or speculative
        // execution two attempts of the same partition may run
        // concurrently — a shared temp path would interleave their
        // writes and let one attempt's rename publish a half-written
        // file. Distinct temp files + atomic rename means the last
        // completed attempt wins with identical bytes.
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId().toString)
          .getOrElse(java.util.UUID.randomUUID().toString)
        var hour: String = null
        var out: OutputStreamWriter = null
        var tmp: File = null
        var fin: File = null
        def commit(): Unit = if (out != null) {
          out.close()
          if (!tmp.renameTo(fin))
            throw new java.io.IOException(s"rename ${tmp.getPath} -> ${fin.getPath} failed")
          // sweep orphaned temp files from failed/killed attempts of
          // THIS (hour, batch) file — without it a long-running ingest
          // accumulates hidden `.….aN.tmp` files forever. Deleting a
          // still-writing zombie attempt's temp is safe: its rename
          // fails and the attempt errors, but this attempt's rename
          // above already published identical bytes.
          val prefix = s".${fin.getName}.a"
          Option(fin.getParentFile.listFiles()).getOrElse(Array.empty)
            .foreach { f =>
              if (f.getName.startsWith(prefix) && f.getName.endsWith(".tmp"))
                f.delete()
            }
        }
        def roll(h: String): Unit = {
          commit()
          hour = h
          fin = new File(dir, batchFileName(h, batchId))
          // leading '.' keeps half-written temp files invisible to
          // RawLogSource.discover's hour-pattern filter; rename is
          // atomic on a POSIX filesystem, so readers see either the
          // previous complete file or the new complete file
          tmp = new File(dir, s".${batchFileName(h, batchId)}.a$attempt.tmp")
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
    * `Utc::now` at append, `collector/src/main.rs:28`). An input
    * `seq` column (a source-supplied arrival sequence) passes through
    * as a within-microsecond tiebreaker for `writeBatch`'s total
    * order; absent one, same-microsecond frames order by their bytes.
    *
    * Lines whose receipt timestamp doesn't parse have no rotation
    * key. Default policy: drop (mirrors the strict parse path).
    * `quarantine = true` is the long-running-ingest policy: they land
    * in `corrupt.bN.jsonl.zst` files instead — RETAINED byte-for-byte
    * for forensics, but invisible to `RawLogSource.discover`'s
    * hour-pattern filter, so replay semantics are identical either
    * way and no received byte is ever lost. (The reference collector
    * can't hit this case — it stamps its own receipt timestamp at
    * append — but a re-ingest of foreign or damaged logs can.)
    */
  val QuarantineKey = "corrupt"

  def keyedLines(lines: DataFrame, quarantine: Boolean = false): DataFrame = {
    val ts = get_json_object(col("value"), "$.timestamp")
    // try_to_timestamp: a PRESENT-but-malformed timestamp string must
    // classify as unparseable (null), not throw under ANSI mode —
    // found by the quarantine spec; plain to_timestamp would kill the
    // whole batch on one damaged line
    val receipt = try_to_timestamp(ts)
    val hour = date_format(
      convert_timezone(lit("UTC"), receipt.cast("timestamp_ntz")),
      "yyyy-MM-dd-HH")
    val filtered =
      if (quarantine) lines else lines.filter(receipt.isNotNull)
    filtered
      .select(
        (Seq(
          (if (quarantine) coalesce(hour, lit(QuarantineKey)) else hour)
            .as("fileHour"),
          coalesce(unix_micros(receipt), lit(0L)).as("lineNo")) ++
          (if (lines.columns.contains("seq"))
             Seq(col("seq").cast("long").as("seq"))
           else Nil) :+
          col("value")): _*)
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
      trigger: Trigger = Trigger.AvailableNow(),
      quarantine: Boolean = false,
  ): StreamingQuery =
    keyedLines(lines, quarantine).writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        writeBatch(df, dir, batchId)
        failAfterBatch.foreach { n =>
          if (batchId == n)
            throw new RuntimeException(
              s"graft-injected crash after batch $n write, before commit")
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
