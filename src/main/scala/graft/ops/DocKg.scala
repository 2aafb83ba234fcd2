package graft.ops

import graft.rdf.TermKind
import graft.spark.{CanonEngine, CanonResult, KeyedQuad}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Small knowledge graph over the driver-provided `documents` table:
  * one RDF graph per `source`, documents as blank nodes, plus a
  * similarity chain — exercises the full canonicalization engine
  * against arbitrary external data (not just our synthetic corpus).
  */
object DocKg {

  /** (source, doc bnode) quads: type/lang/chars triples + a
    * next-doc chain per source ordered by (n_chars, doc_id). */
  def quads(documents: DataFrame): Dataset[KeyedQuad] = {
    val spark = documents.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("n_chars", "doc_id")
    val base = documents
      .select(col("source"), col("doc_id").cast("long").as("doc_id"),
        col("lang"), col("n_chars").cast("long").as("n_chars"))
      .withColumn("nxt", lead(col("doc_id"), 1).over(w))
    base.flatMap { r =>
      val source = r.getString(0)
      val id = r.getLong(1)
      val lang = r.getString(2)
      val nchars = r.getLong(3)
      val b = s"d$id"
      val out = Vector.newBuilder[KeyedQuad]
      def q(s: String, p: String, oKind: Byte, o: String): KeyedQuad =
        KeyedQuad(source, TermKind.BNode, s, p, oKind, o, "", "",
          TermKind.DefaultGraph, "")
      out += q(b, "urn:p:type", TermKind.Iri, "urn:c:Document")
      out += q(b, "urn:p:lang", TermKind.Literal, lang)
      out += q(b, "urn:p:chars", TermKind.Literal, nchars.toString)
      if (!r.isNullAt(4)) out += q(b, "urn:p:next", TermKind.BNode, s"d${r.getLong(4)}")
      out.result()
    }
  }

  def canonicalize(documents: DataFrame): Dataset[CanonResult] =
    CanonEngine.canonicalizePerGraph(quads(documents))
}
