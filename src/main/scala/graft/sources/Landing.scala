package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import scala.jdk.CollectionConverters._

/**
 * Landing-directory lifecycle: fixture injection (offline stand-in for the
 * HTTP poller, reference S1/S2) and the processed-file marking protocol
 * (S5: rename consumed `*.json` to `read_*.json`,
 * 2-spark_processed_assats_list.py:69-87). In streaming mode the Structured
 * Streaming checkpoint subsumes this protocol; batch mode is the parity
 * baseline.
 */
object Landing {

  private val nameFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss").withZone(ZoneOffset.UTC)

  /** Bronze file name for a poll: `coincap_data_<yyyyMMdd_HHmmss>.json`,
    * formatted from the payload's own epoch-ms timestamp
    * (1-cloud_function_get_data.py:53-56). */
  def pollFileName(epochMs: Long): String =
    s"coincap_data_${nameFmt.format(Instant.ofEpochMilli(epochMs))}.json"

  /** S2: write one poll document into the landing dir. */
  def injectPoll(landingDir: String, json: String, epochMs: Long): Path = {
    val dir = Paths.get(landingDir)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(pollFileName(epochMs)), json)
  }

  /** Unconsumed poll files (not yet `read_`-prefixed, `.json` only —
    * 2-spark_processed_assats_list.py:81). */
  def pendingFiles(landingDir: String): Seq[Path] = {
    val dir = Paths.get(landingDir)
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith("coincap_data_") && n.endsWith(".json")
      }.toSeq.sortBy(_.getFileName.toString)
  }

  /** S5: mark consumed files. At-least-once semantics, same as the
    * reference: a crash between the Silver append and this rename replays
    * the file on the next run. */
  def markRead(landingDir: String): Unit =
    pendingFiles(landingDir).foreach { p =>
      Files.move(p, p.resolveSibling("read_" + p.getFileName.toString),
        StandardCopyOption.ATOMIC_MOVE)
    }
}
