package graft.canon

import graft.rdf.{NQuadsParser, Quad, TermKind}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** Op 22 (`PerNodeHndqCallCounter`, reference `src/counter.rs:58-114`)
  * and the §1.2 issuer-replay regression. */
class CounterSpec extends AnyFunSuite {

  private def fixture(name: String): Seq[Quad] =
    NQuadsParser.parseDocument(new String(
      Files.readAllBytes(Paths.get(s"src/test/resources/rdfc10/$name-in.nq")), UTF_8))

  test("per-node budget diverges from the global budget (test054)") {
    // test054 makes 14 HNDQ calls total but touches each bnode at most
    // once per gossip path — a per-node budget of 1 suffices where the
    // global budget of 1 aborts immediately.
    val t54 = fixture("test054")
    intercept[HndqCallLimitExceededException] {
      Rdfc10.issue(t54, CanonOptions(hndqCallLimit = 1))
    }
    val r = Rdfc10.issue(t54, CanonOptions(1, "SHA-256", perNodeCounter = true))
    assert(r.hndqCalls == 14) // sum over nodes equals the global count
    // identical labels under either budget regime
    assert(r.issuedMap == Rdfc10.issue(t54).issuedMap)
  }

  test("per-node budget still rejects the poison clique (test074)") {
    intercept[HndqCallLimitExceededException] {
      Rdfc10.issue(fixture("test074"), CanonOptions(4000, "SHA-256", perNodeCounter = true))
    }
  }

  test("counter trace renderings match the reference Debug shapes") {
    val s = new SimpleHndqCallCounter(4000)
    s.add("x"); s.add("y")
    assert(s.traceRepr == " { counter: 2, limit: 4000 }")
    val p = new PerNodeHndqCallCounter(10)
    p.add("x"); p.add("x"); p.add("y")
    assert(p.traceRepr == " { counter: {\"x\": 2, \"y\": 1}, limit: 10, sum: 3 }")
  }

  test("issuer replay stays in issuance order past 10 temporaries (12-cycle)") {
    // A symmetric 12-bnode cycle: one shared-hash group whose winning
    // HNDQ result issues 12 temporaries (b0..b11). The reference
    // recovers replay order by LEXICOGRAPHICALLY inverting a HashMap
    // ("b10" < "b2"), which diverges from true issuance order at >= 11
    // temporaries; we follow the spec (insertion order) — this pins
    // that choice (see IdentifierIssuer scaladoc).
    val quads = (0 until 12).map { i =>
      Quad(TermKind.BNode, s"e$i", "urn:p:next",
        TermKind.BNode, s"e${(i + 1) % 12}", "", "", TermKind.DefaultGraph, "")
    }
    val res = Rdfc10.issue(quads)
    // insertion-order replay: walking the cycle from the winner e0
    // issues e0,e11,e10,...  (lexicographic replay would put b10/b11
    // before b2 and permute these labels)
    assert(res.issuedMap("e0") == "c14n0")
    assert(res.issuedMap("e11") == "c14n1")
    assert(res.issuedMap("e2") == "c14n10")
    assert(res.issuedMap("e1") == "c14n11")
    val doc = Rdfc10.canonicalize(quads)
    assert(graft.spark.CanonEngine.sha256Hex(doc) ==
      "c0175b2df46ab935e43d67b6dbc78860f6df54d5aab9efa1eff7be63dfb56458")
  }
}
