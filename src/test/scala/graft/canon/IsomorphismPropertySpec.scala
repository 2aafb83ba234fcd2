package graft.canon

import graft.rdf.{NQuadsParser, Quad, TermKind}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Generative version of the W3C "reordered/reversed" fixture pairs:
  * canonicalization must be invariant under (a) quad order shuffling
  * and (b) consistent blank-node renaming — the definition of
  * dataset isomorphism. (Raw ScalaCheck generators sampled with
  * deterministic seeds; the scalatest-scalacheck bridge is not in the
  * offline artifact cache.) */
class IsomorphismPropertySpec extends AnyFunSuite {

  private val iriGen = Gen.oneOf(
    "urn:ex:p", "urn:ex:q", "urn:ex:r", "urn:ex:s", "urn:ex:t")
  private val bnodeId = Gen.choose(0, 7)

  private val quadGen: Gen[Quad] = for {
    sIsB <- Gen.prob(0.7)
    s <- if (sIsB) bnodeId.map(i => (TermKind.BNode, s"b$i"))
         else iriGen.map(i => (TermKind.Iri, i + ":subj"))
    p <- iriGen
    oKind <- Gen.choose(0, 2)
    o <- oKind match {
      case 0 => iriGen.map(i => (TermKind.Iri, i + ":obj"))
      case 1 => bnodeId.map(i => (TermKind.BNode, s"b$i"))
      case _ => Gen.oneOf("v1", "v2", "日本語").map(v => (TermKind.Literal, v))
    }
    gIsB <- Gen.prob(0.2)
    g <- if (gIsB) bnodeId.map(i => (TermKind.BNode, s"b$i"))
         else Gen.const((TermKind.DefaultGraph, ""))
  } yield Quad(s._1, s._2, p, o._1, o._2, "", "", g._1, g._2)

  private val datasetGen: Gen[List[Quad]] =
    Gen.choose(1, 14).flatMap(n => Gen.listOfN(n, quadGen))

  private def sample(i: Long): List[Quad] =
    datasetGen.pureApply(Gen.Parameters.default, Seed(i))

  private def rename(q: Quad, f: String => String): Quad = {
    var r = q
    if (q.subjectIsBNode) r = r.copy(s = f(q.s))
    if (q.objectIsBNode) r = r.copy(o = f(q.o))
    if (q.graphIsBNode) r = r.copy(g = f(q.g))
    r
  }

  private val opts = CanonOptions(hndqCallLimit = 50000)
  private val Trials = 80

  test("canonical output invariant under shuffle + bnode renaming") {
    var checked = 0
    (0 until Trials).foreach { i =>
      val quads = sample(i.toLong)
      val base =
        try Some(Rdfc10.canonicalize(quads, opts))
        catch { case _: HndqCallLimitExceededException => None }
      base.foreach { expected =>
        val rnd = new scala.util.Random(i * 7919L + 13)
        val renaming = (0 to 7).map(k => s"b$k" -> s"x${rnd.nextInt(1000)}_$k").toMap
        val mutated = rnd.shuffle(quads.map(rename(_, renaming)))
        assert(Rdfc10.canonicalize(mutated, opts) == expected,
          s"trial $i not isomorphism-invariant; input=$quads")
        checked += 1
      }
    }
    assert(checked > Trials / 2, s"too many skipped trials: $checked")
  }

  test("canonical docs re-canonicalize to themselves (fixpoint)") {
    var checked = 0
    (1000 until 1000 + Trials).foreach { i =>
      val quads = sample(i.toLong)
      val doc =
        try Some(Rdfc10.canonicalize(quads, opts))
        catch { case _: HndqCallLimitExceededException => None }
      doc.foreach { d =>
        assert(Rdfc10.canonicalize(NQuadsParser.parseDocument(d), opts) == d)
        checked += 1
      }
    }
    assert(checked > Trials / 2)
  }
}
