package graft.canon

import graft.rdf.NQuadsParser
import graft.util.MiniJson
import graft.util.MiniJson.{JArr, JObj, JStr}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** W3C rdfc10 conformance: all 88 manifest entries, mirroring the
  * reference runner (`/root/reference/src/lib.rs:104-168`):
  *  - RDFC10EvalTest      → canonical N-Quads byte equality
  *  - RDFC10MapTest       → issued-identifiers map equality
  *  - RDFC10NegativeEvalTest → must throw HndqCallLimitExceeded
  * SHA-384 entries dispatch on the `hashAlgorithm` field.
  */
class W3cRdfc10SuiteSpec extends AnyFunSuite {

  private def resource(path: String): String = {
    val url = getClass.getClassLoader.getResource(path)
    require(url != null, s"missing test resource $path")
    new String(Files.readAllBytes(Paths.get(url.toURI)), UTF_8)
  }

  private val manifest = MiniJson.parse(resource("manifest.jsonld")).asInstanceOf[JObj]
  private val entries = manifest("entries").get.asInstanceOf[JArr].v.map(_.asInstanceOf[JObj])

  test("manifest has the expected entry count") {
    assert(entries.size == 86)
  }

  entries.foreach { e =>
    val id = e.str("id").get
    val typ = e.str("type").get
    val name = e.str("name").getOrElse("")
    val action = e.str("action").get
    val result = e.str("result")
    val opts = e.str("hashAlgorithm") match {
      case Some("SHA384") => CanonOptions.sha384
      case _              => CanonOptions.default
    }

    test(s"$id [$typ] $name") {
      val quads = NQuadsParser.parseDocument(resource(action))
      typ match {
        case "rdfc:RDFC10EvalTest" =>
          val got = Rdfc10.canonicalize(quads, opts)
          assert(got == resource(result.get))
        case "rdfc:RDFC10MapTest" =>
          val got = Rdfc10.issue(quads, opts).issuedMap
          val exp = MiniJson.parse(resource(result.get)).asInstanceOf[JObj]
            .v.map { case (k, JStr(v)) => k -> v; case x => fail(s"bad map $x") }.toMap
          assert(got == exp)
        case "rdfc:RDFC10NegativeEvalTest" =>
          assertThrows[HndqCallLimitExceededException] {
            Rdfc10.canonicalize(quads, opts)
          }
        case other => fail(s"unsupported test type $other")
      }
    }
  }
}
