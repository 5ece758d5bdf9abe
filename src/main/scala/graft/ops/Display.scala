package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Human-readable formatters (SURVEY §2.7 X7-X10) as pure Column expressions
  * — display-layer analogs of the reference's msToHHMMSS (video.cpp:243-263),
  * readableDuration (comparison.cpp:229-247), readableFileSize
  * (comparison.cpp:249-257) and readableBitRate (comparison.cpp:259-264). */
object Display {

  /** ms -> "HH:MM:SS.mmm" (X7). */
  def msToHHMMSS(ms: Column): Column =
    format_string("%02d:%02d:%02d.%03d",
      (ms / 3600000L).cast("long"),
      (ms / 60000L % 60).cast("long"),
      (ms / 1000L % 60).cast("long"),
      (ms % 1000).cast("long"))

  /** ms -> "1h2m3s" (X8; zero components elided like the reference). */
  def readableDuration(ms: Column): Column = {
    val h = (ms / 3600000L).cast("long")
    val m = (ms / 60000L % 60).cast("long")
    val s = (ms / 1000L % 60).cast("long")
    concat(
      when(h > 0, format_string("%dh", h)).otherwise(lit("")),
      when(m > 0, format_string("%dm", m)).otherwise(lit("")),
      when(s > 0 || (h === 0 && m === 0), format_string("%ds", s)).otherwise(lit("")))
  }

  /** bytes -> "x.y kB/MB/GB", one decimal (X9). */
  def readableFileSize(bytes: Column): Column =
    when(bytes >= 1073741824L,
      format_string("%.1f GB", bytes / 1073741824.0))
      .when(bytes >= 1048576L, format_string("%.1f MB", bytes / 1048576.0))
      .when(bytes >= 1024L, format_string("%.1f kB", bytes / 1024.0))
      .otherwise(format_string("%d B", bytes.cast("long")))

  /** kbps -> "x kbps" (X10). */
  def readableBitRate(kbps: Column): Column =
    when(kbps >= 10000, format_string("%.1f Mbps", kbps / 1000.0))
      .otherwise(format_string("%d kbps", kbps.cast("long")))
}
