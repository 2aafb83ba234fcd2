package graft.rdf

/** RDF term/quad data model.
  *
  * Mirrors the quad-over-term-ADT model of the reference
  * (zkp-ld/rdf-canon `src/api.rs:7-10`, oxrdf terms), but encoded as a
  * single flat case class so Spark's product encoder produces a flat
  * `StructType` of string/byte columns — columnar-prunable, codegen
  * friendly, and shuffle-cheap (no nested structs).
  *
  * Term kinds per position:
  *  - subject: IRI | blank node           (`src/api.rs:756-769`)
  *  - predicate: IRI only                 (`src/api.rs:739`)
  *  - object: IRI | blank node | literal  (`src/api.rs:771-784`)
  *  - graph: IRI | blank node | default   (`src/api.rs:786-799`)
  *
  * Literals are opaque lexical forms: never parsed or compared
  * numerically (`src/canon.rs:545,1142`). `oDt`/`oLang` are "" when
  * absent; a plain literal carries the implicit xsd:string datatype,
  * which canonical N-Quads suppresses on output.
  */
object TermKind {
  val Iri: Byte = 0
  val BNode: Byte = 1
  val Literal: Byte = 2
  val DefaultGraph: Byte = 3
}

final case class Quad(
    sKind: Byte,
    s: String,
    p: String,
    oKind: Byte,
    o: String,
    oDt: String,
    oLang: String,
    gKind: Byte,
    g: String
) {
  def subjectIsBNode: Boolean = sKind == TermKind.BNode
  def objectIsBNode: Boolean = oKind == TermKind.BNode
  def graphIsBNode: Boolean = gKind == TermKind.BNode
}

object Quad {
  val XsdString = "http://www.w3.org/2001/XMLSchema#string"

  def iriS(s: String): (Byte, String) = (TermKind.Iri, s)

  /** Triple in the default graph. */
  def triple(sKind: Byte, s: String, p: String, oKind: Byte, o: String,
             oDt: String = "", oLang: String = ""): Quad =
    Quad(sKind, s, p, oKind, o, oDt, oLang, TermKind.DefaultGraph, "")
}
