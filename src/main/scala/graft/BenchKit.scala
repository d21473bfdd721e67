package graft

import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

/** Shared scaffolding for the JSONL bench instruments (DatsModeBench,
  * AbBench): JSON string escaping, row recording, GC-bracketed timing,
  * and the load sentinel. ONE copy, because the instruments' whole
  * value is cross-artifact comparability — a sentinel kernel or escape
  * table that drifted between two instruments would make their rows
  * silently incomparable, which is the exact failure the sentinel
  * exists to rule out. [[Bench]] embeds the same calibration kernel in
  * its single-JSON-line artifact (a different schema the driver
  * tail-parses); if the kernel changes here, change it there in the
  * same commit.
  */
object BenchKit {

  /** Escape for interpolation into a JSON string literal, so a quote
    * or backslash in a path cannot produce a malformed JSONL line. */
  def jstr(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Echo to stdout and append to the artifact. */
  def writeLine(out: Path, line: String): Unit = {
    println(line)
    Files.writeString(out, line + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  def record(out: Path, name: String, secs: Double, sf: String): Unit =
    writeLine(out, s"""{"name":"${jstr(name)}","secs":$secs,"sf":"${jstr(sf)}"}""")

  /** Wall-clock seconds of `f`, GC'd first so a prior query's garbage
    * is not charged to this one. */
  def timed(f: => Unit): Double = {
    System.gc()
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** Load sentinel (r16 verdict #2): /proc/loadavg plus the wall-time
    * of a FIXED single-task calibration kernel, recorded as a JSONL
    * row. Fixed single-thread work moves 1:1 with machine contention,
    * so any two artifacts can be compared on calibrated numbers: if
    * calib_sec moved, the machine moved, not the plans. */
  def sentinel(spark: SparkSession, out: Path, tag: String, sf: String): Unit = {
    val load = try Files.readString(Paths.get("/proc/loadavg"))
      .split("\\s+").take(3).mkString(",") catch { case _: Throwable => "" }
    val calib = timed(
      spark.range(0L, 200000000L, 1L, 1).selectExpr("sum(id)").collect())
    writeLine(out, s"""{"name":"sentinel_$tag","loadavg":[$load],""" +
      s""""calib_sec":$calib,"sf":"${jstr(sf)}"}""")
  }
}
