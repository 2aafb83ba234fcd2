package graft.tools

import graft.canon.{CanonOptions, HndqCallLimitExceededException, Rdfc10}
import graft.rdf.NQuadsParser
import graft.util.MiniJson
import graft.util.MiniJson.{JArr, JObj, JStr}

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** EARL conformance report (reference `src/lib.rs:206-272`, published
  * report `tests/rust-zkp-ld-earl.ttl`): run every W3C rdfc10
  * manifest entry and emit one `earl:Assertion` per test in Turtle.
  *
  * Usage: EarlReport <fixtureDir = src/test/resources> [out.ttl]
  */
object EarlReport {

  final case class Outcome(id: String, passed: Boolean)

  private def read(dir: String, p: String): String =
    new String(Files.readAllBytes(Paths.get(dir, p)), UTF_8)

  /** Run the full manifest, mirroring the suite runner. */
  def run(fixtureDir: String): Seq[Outcome] = {
    val manifest = MiniJson.parse(read(fixtureDir, "manifest.jsonld")).asInstanceOf[JObj]
    val entries = manifest("entries").get.asInstanceOf[JArr].v.map(_.asInstanceOf[JObj])
    entries.map { e =>
      val id = e.str("id").get
      val typ = e.str("type").get
      val opts = e.str("hashAlgorithm") match {
        case Some("SHA384") => CanonOptions.sha384
        case _              => CanonOptions.default
      }
      val passed =
        try {
          val quads = NQuadsParser.parseDocument(read(fixtureDir, e.str("action").get))
          typ match {
            case "rdfc:RDFC10EvalTest" =>
              Rdfc10.canonicalize(quads, opts) == read(fixtureDir, e.str("result").get)
            case "rdfc:RDFC10MapTest" =>
              val exp = MiniJson.parse(read(fixtureDir, e.str("result").get))
                .asInstanceOf[JObj].v.collect { case (k, JStr(v)) => k -> v }.toMap
              Rdfc10.issue(quads, opts).issuedMap == exp
            case "rdfc:RDFC10NegativeEvalTest" =>
              try { Rdfc10.canonicalize(quads, opts); false }
              catch { case _: HndqCallLimitExceededException => true }
            case _ => false
          }
        } catch { case _: Exception => false }
      Outcome(id, passed)
    }
  }

  private val SoftwareId = "https://github.com/graft/rdfcanonspark"
  private val AssertorId = SoftwareId + "#assertor"

  /** Turtle render matching the reference's report shape. */
  def render(outcomes: Seq[Outcome], date: String, dateTime: String): String = {
    val header =
      s"""@prefix rdf:  <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
         |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
         |@prefix dc:   <http://purl.org/dc/terms/> .
         |@prefix foaf: <http://xmlns.com/foaf/0.1/> .
         |@prefix doap: <http://usefulinc.com/ns/doap#> .
         |@prefix earl: <http://www.w3.org/ns/earl#> .
         |@prefix xsd:  <http://www.w3.org/2001/XMLSchema#> .
         |
         |<> foaf:primaryTopic <$SoftwareId> ;
         |  dc:issued "$date"^^xsd:date ;
         |  foaf:maker <$AssertorId> .
         |
         |<$SoftwareId> a doap:Project ;
         |  doap:name                 "graft rdfcanonspark" ;
         |  doap:description          "A Scala Spark implementation of the RDF Dataset Canonicalization algorithm version 1.0 (RDFC-1.0)."@en ;
         |  doap:programming-language "Scala" ;
         |  doap:implements           <https://www.w3.org/TR/rdf-canon/> .
         |
         |<$AssertorId> a earl:Assertor ;
         |  foaf:name "graft rdfcanonspark test harness" .
         |""".stripMargin
    val assertions = outcomes.map { o =>
      val outcome = if (o.passed) "earl:passed" else "earl:failed"
      s"""
         |[ a               earl:Assertion ;
         |  earl:assertedBy <$AssertorId> ;
         |  earl:subject    <$SoftwareId> ;
         |  earl:test       <https://w3c.github.io/rdf-canon/tests/manifest${o.id}> ;
         |  earl:result     [ a            earl:TestResult ;
         |                    earl:outcome $outcome ;
         |                    dc:date      "$dateTime"^^xsd:dateTime
         |                  ] ;
         |  earl:mode     earl:automatic
         |] .
         |""".stripMargin
    }.mkString
    header + assertions
  }

  def main(args: Array[String]): Unit = {
    val fixtureDir = args.lift(0).getOrElse("src/test/resources")
    val out = args.lift(1).getOrElse("EARL.ttl")
    val outcomes = run(fixtureDir)
    val now = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
    val ttl = render(outcomes, now.take(10), now)
    Files.write(Paths.get(out), ttl.getBytes(UTF_8))
    val passed = outcomes.count(_.passed)
    println(s"EARL: $passed/${outcomes.size} passed -> $out")
    if (passed != outcomes.size) sys.exit(1)
  }
}
