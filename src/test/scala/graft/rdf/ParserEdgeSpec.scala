package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

/** Parser edge cases beyond the W3C fixtures (which always separate
  * tokens with spaces). */
class ParserEdgeSpec extends AnyFunSuite {

  test("statement terminator directly after a blank node label: '_:b.'") {
    // valid N-Quads — '.' is only medial in BLANK_NODE_LABEL, so the
    // trailing dot is the terminator, no space required
    val qs = NQuadsParser.parseDocument("_:a <urn:p> _:b.\n")
    assert(qs.size == 1)
    assert(qs.head.s == "a" && qs.head.o == "b")
    assert(qs.head.oKind == TermKind.BNode)
  }

  test("medial dots stay in the label; trailing dots do not") {
    val qs = NQuadsParser.parseDocument("_:a.b <urn:p> _:c .\n")
    assert(qs.head.s == "a.b")
    // label + terminator + extra dot is garbage
    intercept[NQuadsParser.ParseException] {
      NQuadsParser.parseDocument("_:a <urn:p> _:b.. extra\n")
    }
  }

  test("graph-position bnode label followed directly by terminator") {
    val qs = NQuadsParser.parseDocument("<urn:s> <urn:p> <urn:o> _:g.\n")
    assert(qs.head.g == "g" && qs.head.gKind == TermKind.BNode)
  }

  test("out-of-range \\U escapes are parse errors, not JVM exceptions") {
    // \U00110000 is beyond U+10FFFF; \UFFFFFFFF wraps negative —
    // both must surface as ParseException so SQL surfaces map them
    // to NULL instead of a failed query
    for (bad <- Seq("\\U00110000", "\\UFFFFFFFF")) {
      intercept[NQuadsParser.ParseException] {
        NQuadsParser.parseDocument(s"""<urn:s> <urn:p> "$bad" .\n""")
      }
    }
    // valid supplementary code point still decodes
    val qs = NQuadsParser.parseDocument("<urn:s> <urn:p> \"\\U0001F303\" .\n")
    assert(qs.head.o == new String(Character.toChars(0x1F303)))
  }
}
