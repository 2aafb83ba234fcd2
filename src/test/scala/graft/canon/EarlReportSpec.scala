package graft.canon

import graft.tools.EarlReport
import org.scalatest.funsuite.AnyFunSuite

/** EARL conformance reporting (reference `src/lib.rs:206-272`):
  * the report runner covers the whole manifest and every entry
  * passes; the Turtle render carries one assertion per test. */
class EarlReportSpec extends AnyFunSuite {

  test("EARL report: 86/86 manifest entries pass, one assertion each") {
    val outcomes = EarlReport.run("src/test/resources")
    assert(outcomes.size == 86)
    val failed = outcomes.filterNot(_.passed)
    assert(failed.isEmpty, s"failed: ${failed.map(_.id)}")
    val ttl = EarlReport.render(outcomes, "2026-08-16", "2026-08-16T00:00:00Z")
    assert(ttl.sliding("earl:Assertion".length).count(_ == "earl:Assertion") == 86)
    assert(ttl.contains("earl:passed") && !ttl.contains("earl:failed"))
    assert(ttl.contains("<https://w3c.github.io/rdf-canon/tests/manifest#test001c>"))
    assert(ttl.contains("doap:implements           <https://www.w3.org/TR/rdf-canon/>"))
  }
}
