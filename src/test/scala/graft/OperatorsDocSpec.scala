package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Drift gate for the generated operator index: OPERATORS.md must equal
  * what `graft.tools.OperatorIndex.render()` produces from the current
  * SparkEntry registry + committed BENCHSCALE artifacts. On failure:
  * `sbt "runMain graft.tools.OperatorIndex"` and commit the result. */
class OperatorsDocSpec extends AnyFunSuite {

  test("OPERATORS.md is in sync with the SparkEntry registry") {
    val rendered = tools.OperatorIndex.render()
    val committed = Files.readString(Paths.get("OPERATORS.md"))
    assert(rendered === committed,
      "OPERATORS.md drifted — regenerate with sbt \"runMain graft.tools.OperatorIndex\"")
  }

  test("index covers every registry query exactly once") {
    val rendered = tools.OperatorIndex.render()
    val names = SparkEntry.queries.keySet
    names.foreach { n =>
      assert(rendered.contains(s"| $n |"), s"missing row for $n")
    }
    assert(rendered.contains(s"Total gate queries: ${names.size}."))
  }

  test("SURVEY.md mentions every gate query id (hand-written rows can't silently lag)") {
    val survey = Files.readString(Paths.get("SURVEY.md"))
    val missing = SparkEntry.queries.keySet
      .map(n => n.split("_").head) // the qNNN prefix
      .filterNot(survey.contains)
    assert(missing.isEmpty, s"SURVEY.md lacks rows mentioning: ${missing.toSeq.sorted}")
  }
}
