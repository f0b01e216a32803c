package graft.tools

import java.nio.file.{Files, Paths}

/** The ONE parser for the bench JSON artifacts (BENCHFULL / BENCHSCALE*).
  * Four call sites used to carry hand-rolled copies of the same
  * substring+regex extraction (OperatorIndex's three slope readers and
  * Bench's prior-minima reader); a format change silently degrading one of
  * them to Map.empty — dropping slope columns or disabling the re-measure
  * with no error — is exactly the failure mode a single shared reader
  * removes. */
object BenchArtifacts {

  /** Per-query minima from the artifact's `"queries":{...}` section;
    * empty when the file or section is absent/unreadable. */
  def queriesOf(path: String): Map[String, Double] = {
    val txt = readOrEmpty(path)
    val start = txt.indexOf("\"queries\":{")
    if (start < 0) Map.empty
    else {
      val end = txt.indexOf('}', start)
      """"([^"]+)":([0-9.]+)""".r
        .findAllMatchIn(txt.substring(start + "\"queries\":{".length, end))
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
  }

  /** The artifact's `"sf"` field (the dataset it was measured against). */
  def sfOf(path: String): Option[String] = {
    val txt = readOrEmpty(path)
    """"sf":"([^"]+)"""".r.findFirstMatchIn(txt).map(_.group(1))
  }

  private def readOrEmpty(path: String): String =
    try {
      val p = Paths.get(path)
      if (Files.exists(p)) Files.readString(p) else ""
    } catch { case _: Throwable => "" }
}
