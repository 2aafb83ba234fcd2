package graft.canon

import graft.rdf.{Quad, TermKind}
import org.scalatest.funsuite.AnyFunSuite

/** Digest-pinned unit tests ported from the reference
  * (`/root/reference/src/canon.rs:1158-1427`): same inputs, same
  * expected SHA-256 hex — these pin INTERNAL intermediate values, not
  * just end-to-end output.
  */
class CanonUnitSpec extends AnyFunSuite {

  private def iri(s: String) = (TermKind.Iri, s)
  private def q(s: (Byte, String), p: String, o: (Byte, String)): Quad =
    Quad(s._1, s._2, p, o._1, o._2, "", "", TermKind.DefaultGraph, "")
  private def bn(l: String) = (TermKind.BNode, l)

  private val P = "http://example.com/#p"
  private val Q = "http://example.com/#q"
  private val R = "http://example.com/#r"
  private val S = "http://example.com/#s"
  private val T = "http://example.com/#t"
  private val U = "http://example.com/#u"

  test("issue identifier (4.5) — memoized counter") {
    val issuer = new IdentifierIssuer("c14n")
    assert(issuer.issue("b0") == "c14n0")
    assert(issuer.issue("b1") == "c14n1")
    assert(issuer.issue("b99") == "c14n2")
    assert(issuer.issue("xyz") == "c14n3")
    assert(issuer.issue("xyz") == "c14n3")
    assert(issuer.issue("b99") == "c14n2")
    assert(issuer.issue("b1") == "c14n1")
    assert(issuer.issue("b0") == "c14n0")
  }

  test("hash first degree quads — unique hashes") {
    val quads = Vector(
      q(iri("http://example.com/#p"), Q, bn("e0")),
      q(iri("http://example.com/#p"), R, bn("e1")),
      q(bn("e0"), S, iri(U)),
      q(bn("e1"), T, iri(U))
    )
    val st = new Rdfc10.State(quads, CanonOptions.default)
    assert(st.h1dq("e0") ==
      "21d1dd5ba21f3dee9d76c0c00c260fa6f5d5d65315099e553026f4828d0dc77a")
    assert(st.h1dq("e1") ==
      "6fa0b9bdb376852b5743ff39ca4cbf7ea14d34966b2828478fbf222e7c764473")
  }

  private val sharedQuads = Vector(
    q(iri("http://example.com/#p"), Q, bn("e0")),
    q(iri("http://example.com/#p"), Q, bn("e1")),
    q(bn("e0"), P, bn("e2")),
    q(bn("e1"), P, bn("e3")),
    q(bn("e2"), R, bn("e3"))
  )

  test("hash first degree quads — shared hashes") {
    val st = new Rdfc10.State(sharedQuads, CanonOptions.default)
    assert(st.h1dq("e0") ==
      "3b26142829b8887d011d779079a243bd61ab53c3990d550320a17b59ade6ba36")
    assert(st.h1dq("e1") ==
      "3b26142829b8887d011d779079a243bd61ab53c3990d550320a17b59ade6ba36")
    assert(st.h1dq("e2") ==
      "15973d39de079913dac841ac4fa8c4781c0febfba5e83e5c6e250869587f8659")
    assert(st.h1dq("e3") ==
      "7e790a99273eed1dc57e43205d37ce232252c85b26ca4a6ff74ff3b5aea7bccd")
  }

  test("hash related blank node (4.7)") {
    val st = new Rdfc10.State(Vector.empty, CanonOptions.default)
    st.canonicalIssuer.issue("e2") // -> c14n0
    val issuer = new IdentifierIssuer("b")
    val quad = q(bn("e0"), P, bn("e2"))
    assert(st.hrbn("e2", quad, issuer, 'o') ==
      "29cf7e22790bc2ed395b81b3933e5329fc7b25390486085cac31ce7252ca60fa")
  }

  test("hash n-degree quads (4.8) — two-result ordering") {
    val st = new Rdfc10.State(sharedQuads, CanonOptions.default)
    // replicate ca.3 + ca.4: unique hashes (e2, e3) get canonical ids
    val hashToBn = scala.collection.mutable.TreeMap.empty[String, Vector[String]](
      graft.rdf.CodePointOrdering)
    st.mentions.keysIterator.foreach { n =>
      val h = st.h1dq(n)
      hashToBn.update(h, hashToBn.getOrElse(h, Vector.empty) :+ n)
    }
    hashToBn.foreach { case (_, ids) =>
      if (ids.size == 1) st.canonicalIssuer.issue(ids.head)
    }
    val shared = hashToBn.filter(_._2.size > 1)
    assert(shared.size == 1)
    val results = shared.head._2.map { n =>
      val temp = new IdentifierIssuer("b")
      temp.issue(n)
      st.hndq(n, temp)._1
    }.sorted(graft.rdf.CodePointOrdering)
    assert(results(0) ==
      "2c0b377baf86f6c18fed4b0df6741290066e73c932861749b172d1e5560f5045")
    assert(results(1) ==
      "fbc300de5afafd97a4b9ee1e72b57754dcdcb7ebb724789ac6a94a5b82a48d30")
  }

  test("doc example: graph canonicalization with escaping (api.rs doc-test)") {
    val escaped = "\\u0008\\u0009\\u000a\\u000b\\u000c\\u000d\\u0022\\u005c\\u007f"
    val input =
      s"""_:e0 <http://example.org/vocab#next> _:e1 .
         |_:e0 <http://example.org/vocab#prev> _:e2 .
         |_:e1 <http://example.org/vocab#next> _:e2 .
         |_:e1 <http://example.org/vocab#prev> _:e0 .
         |_:e2 <http://example.org/vocab#next> _:e0 .
         |_:e2 <http://example.org/vocab#prev> _:e1 .
         |<urn:ex:s> <urn:ex:p> "$escaped" .
         |""".stripMargin
    val expected =
      "<urn:ex:s> <urn:ex:p> \"\\b\\t\\n\\u000B\\f\\r\\\"\\\\\\u007F\" .\n" +
        "_:c14n0 <http://example.org/vocab#next> _:c14n2 .\n" +
        "_:c14n0 <http://example.org/vocab#prev> _:c14n1 .\n" +
        "_:c14n1 <http://example.org/vocab#next> _:c14n0 .\n" +
        "_:c14n1 <http://example.org/vocab#prev> _:c14n2 .\n" +
        "_:c14n2 <http://example.org/vocab#next> _:c14n1 .\n" +
        "_:c14n2 <http://example.org/vocab#prev> _:c14n0 .\n"
    val quads = graft.rdf.NQuadsParser.parseDocument(input)
    assert(Rdfc10.canonicalize(quads, CanonOptions(hndqCallLimit = 10000)) == expected)
  }
}
