package graft.spark

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** SQL-only surface: `rdfc10_canonicalize` / `rdfc10_issue` reachable
  * from `spark.sql` (injected by [[GraftExtensions]] at session build,
  * or [[GraftFunctions.register]] on a live session — both share the
  * same injection tuples). */
class SqlSurfaceSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestBase.spark
    GraftFunctions.register(s)
    s
  }

  import SqlSurfaceSpec.StreamQuad // streaming-test row shape (encoder-friendly)

  private def fixture(name: String): String =
    new String(Files.readAllBytes(
      Paths.get(s"src/test/resources/rdfc10/$name")), UTF_8)

  test("SQL-only canonicalization is byte-exact against the W3C golden") {
    import spark.implicits._
    Seq(fixture("test020-in.nq")).toDF("doc").createOrReplaceTempView("docs")
    val out = spark.sql("SELECT rdfc10_canonicalize(doc) AS canon FROM docs")
      .collect().head.getString(0)
    assert(out == fixture("test020-rdfc10.nq"))
  }

  test("SQL issue map matches the W3C map golden") {
    import spark.implicits._
    Seq(fixture("test003-in.nq")).toDF("doc").createOrReplaceTempView("docs3")
    val out = spark.sql("SELECT rdfc10_issue(doc) FROM docs3").collect().head.getString(0)
    assert(out == """{"e0":"c14n0"}""")
  }

  test("poison and garbage input yield NULL, not a failed query") {
    import spark.implicits._
    val poison = fixture("test074-in.nq")
    Seq(("poison", poison), ("garbage", "not n-quads at all"))
      .toDF("kind", "doc").createOrReplaceTempView("bad")
    val rows = spark.sql(
      "SELECT kind, rdfc10_canonicalize(doc) IS NULL AS is_null FROM bad")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(rows == Map("poison" -> true, "garbage" -> true))
  }

  test("SQL-only per-graph canonicalization == Dataset API, byte-equal") {
    // the distributed engine composed in pure SQL: GROUP BY repo +
    // the rdfc10_canon_dataset aggregate over the triple table must
    // reproduce CanonEngine.canonicalizePerGraph byte-for-byte
    import graft.pipeline.{Corpus, Kg}
    import spark.implicits._
    val cfg = Corpus.Config(nRepos = 6, baseFilesPerRepo = 4)
    val dictNames = (0 until cfg.nEntities).map(Corpus.entityName)
    val dict = spark.sparkContext.broadcast(dictNames.toSet)
    val files = Corpus.generate(spark, cfg)
    val linked = Kg.linkMentions(Kg.detectMentions(files, dict), dictNames.toDF("name"))
    val cc = Kg.connectedComponents(dictNames.toDF("name"), Kg.detectAliases(files))
    val triples = Kg.dedupTriples(Kg.emitTriples(linked, cc))
    triples.createOrReplaceTempView("triples")

    val viaSql = spark.sql(
      """SELECT repo,
        |       rdfc10_canon_dataset(subjKind, subj, pred, obj, objKind) AS r
        |FROM triples GROUP BY repo""".stripMargin)
      .selectExpr("repo", "r.status", "r.canonicalNQuads", "r.outputSha256")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getString(3))).toMap

    val viaApi = Kg.canonicalizeTriples(triples).collect()
      .map(r => r.key -> (r.status, r.canonicalNQuads, r.outputSha256)).toMap
    assert(viaSql == viaApi)
    assert(viaApi.size == cfg.nRepos && viaApi.values.forall(_._1 == "ok"))
  }

  test("SQL aggregate 9-arg quad form is byte-exact vs a W3C golden") {
    import spark.implicits._
    // dataset fixture with IRI/bnode graph names through the quad form
    val quads = graft.rdf.NQuadsParser.parseDocument(fixture("test070-in.nq"))
    quads.toDF().createOrReplaceTempView("quads70")
    val out = spark.sql(
      """SELECT rdfc10_canon_dataset(sKind, s, p, oKind, o, oDt, oLang, gKind, g) AS r
        |FROM quads70""".stripMargin)
      .selectExpr("r.canonicalNQuads").collect().head.getString(0)
    assert(out == fixture("test070-rdfc10.nq"))
  }

  test("SQL aggregate: poison group yields an error STATUS row, query survives") {
    import spark.implicits._
    val poison = graft.rdf.NQuadsParser.parseDocument(fixture("test074-in.nq"))
      .map(q => ("poison", q))
    val fine = graft.rdf.NQuadsParser.parseDocument(fixture("test020-in.nq"))
      .map(q => ("fine", q))
    (poison ++ fine).map { case (k, q) =>
      (k, q.sKind, q.s, q.p, q.oKind, q.o, q.oDt, q.oLang, q.gKind, q.g)
    }.toDF("k", "sKind", "s", "p", "oKind", "o", "oDt", "oLang", "gKind", "g")
      .createOrReplaceTempView("mixed")
    val rows = spark.sql(
      """SELECT k, rdfc10_canon_dataset(sKind, s, p, oKind, o, oDt, oLang, gKind, g) AS r
        |FROM mixed GROUP BY k""".stripMargin)
      .selectExpr("k", "r.status").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("fine") == "ok")
    assert(rows("poison") == "HndqCallLimitExceeded(4000)")
  }

  test("SQL aggregate dedups input quads (set semantics) in the buffer") {
    import spark.implicits._
    val quads = graft.rdf.NQuadsParser.parseDocument(fixture("test020-in.nq"))
    (quads ++ quads ++ quads).toDF().createOrReplaceTempView("dup20")
    val out = spark.sql(
      """SELECT rdfc10_canon_dataset(sKind, s, p, oKind, o, oDt, oLang, gKind, g) AS r
        |FROM dup20""".stripMargin)
      .selectExpr("r.canonicalNQuads", "r.quadCount").collect().head
    assert(out.getString(0) == fixture("test020-rdfc10.nq"))
    assert(out.getLong(1) == quads.size)
  }

  test("SQL aggregate buffer codec roundtrips (spill path) incl. supplementary chars") {
    // serialize/deserialize is the shuffle/spill codec between partial
    // and final aggregation — pin an explicit roundtrip including
    // astral-plane literals (writeUTF uses modified-UTF8 surrogates)
    val agg = Rdfc10CanonDataset((0 until 9).map(_ =>
      org.apache.spark.sql.catalyst.expressions.Literal("x")))
    val quads = graft.rdf.NQuadsParser.parseDocument(fixture("test060-in.nq"))
    val buf = agg.createAggregationBuffer()
    quads.foreach(buf.quads += _)
    buf.nullKindRows = 3L
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.quads.toVector == buf.quads.toVector)
    assert(back.nullKindRows == 3L, "poison count must survive the codec")
  }

  test("SQL aggregate codec rejects unknown buffer format versions loudly") {
    val agg = Rdfc10CanonDataset((0 until 9).map(_ =>
      org.apache.spark.sql.catalyst.expressions.Literal("x")))
    // both pre-v2 codecs began with writeInt(size) — first byte 0 for
    // any realistic size — so a v0/v1 streaming checkpoint fails with
    // the discard-and-rebuild message instead of deserializing garbage
    val preV2 = Array[Byte](0, 0, 0, 5, 1, 2, 3)
    val e = intercept[IllegalStateException](agg.deserialize(preV2))
    assert(e.getMessage.contains("discarded"))
  }

  test("SQL aggregate is byte-exact on the escaping torture fixture (test060)") {
    import spark.implicits._
    // the UTF8String round-trip (Catalyst strings) must preserve every
    // escape class: C0 controls, DEL, quotes, backslashes, U+1F303
    val quads = graft.rdf.NQuadsParser.parseDocument(fixture("test060-in.nq"))
    // spread across partitions so partial buffers merge via the codec
    spark.createDataset(quads).repartition(4).toDF()
      .createOrReplaceTempView("quads60")
    val out = spark.sql(
      """SELECT rdfc10_canon_dataset(sKind, s, p, oKind, o, oDt, oLang, gKind, g) AS r
        |FROM quads60""".stripMargin)
      .selectExpr("r.canonicalNQuads").collect().head.getString(0)
    assert(out == fixture("test060-rdfc10.nq"))
  }

  test("SQL aggregate survives literals past 64 KB through the spill codec") {
    import spark.implicits._
    // writeUTF dies at 65535 modified-UTF-8 bytes; document-body
    // literals routinely exceed that, and the codec runs on every
    // partial->final shuffle — the length-prefixed raw-UTF-8 codec
    // must carry a multi-hundred-KB multibyte literal byte-exactly
    val big = "é🌃x" * 40000 // ~280 KB UTF-8, incl. astral pairs
    val quads = Vector(
      graft.rdf.Quad(graft.rdf.TermKind.Iri, "http://e/s", "http://e/p",
        graft.rdf.TermKind.Literal, big, "", "",
        graft.rdf.TermKind.DefaultGraph, ""),
      graft.rdf.Quad(graft.rdf.TermKind.BNode, "b0", "http://e/p",
        graft.rdf.TermKind.Literal, big, "", "",
        graft.rdf.TermKind.DefaultGraph, ""))
    // direct codec roundtrip
    val agg = Rdfc10CanonDataset((0 until 9).map(_ =>
      org.apache.spark.sql.catalyst.expressions.Literal("x")))
    val buf = agg.createAggregationBuffer()
    quads.foreach(buf.quads += _)
    assert(agg.deserialize(agg.serialize(buf)).quads.toVector == quads)
    // end-to-end SQL path with forced partial merges
    spark.createDataset(quads).repartition(2).toDF()
      .createOrReplaceTempView("bigquads")
    val out = spark.sql(
      """SELECT rdfc10_canon_dataset(sKind, s, p, oKind, o, oDt, oLang, gKind, g) AS r
        |FROM bigquads""".stripMargin)
      .selectExpr("r.status", "r.canonicalNQuads").collect().head
    assert(out.getString(0) == "ok")
    assert(out.getString(1) ==
      graft.canon.Rdfc10.canonicalize(quads, graft.canon.CanonOptions.default))
  }

  test("SQL aggregate: a NULL kind row POISONS the group (error status, loud)") {
    import spark.implicits._
    val quads = graft.rdf.NQuadsParser.parseDocument(fixture("test020-in.nq"))
    quads.toDF().createOrReplaceTempView("q20clean")
    // round-4 silently SKIPPED null-kind rows, so an upstream bug (an
    // unintended outer-join null) surfaced as different canonical
    // bytes with no signal; the contract is "data errors become error
    // STATUS rows" — the group errors, the query survives
    val out = spark.sql(
      """SELECT rdfc10_canon_dataset(sKind, s, p, oKind, o, oDt, oLang, gKind, g) AS r
        |FROM (SELECT * FROM q20clean
        |      UNION ALL
        |      SELECT CAST(0 AS TINYINT), 'http://x/s', 'http://x/p',
        |             CAST(NULL AS TINYINT), 'dangling', '', '',
        |             CAST(3 AS TINYINT), '')""".stripMargin)
      .selectExpr("r.status", "r.canonicalNQuads").collect().head
    assert(out.getString(0) == "NullKindInput(1)")
    assert(out.getString(1) == "")
    // a clean group in the same query is unaffected
    val clean = spark.sql(
      """SELECT rdfc10_canon_dataset(sKind, s, p, oKind, o, oDt, oLang, gKind, g) AS r
        |FROM q20clean""".stripMargin)
      .selectExpr("r.status", "r.canonicalNQuads").collect().head
    assert(clean.getString(0) == "ok")
    assert(clean.getString(1) == fixture("test020-rdfc10.nq"))
  }

  test("SQL option parity: SHA-384 and HNDQ limits from pure SQL") {
    import spark.implicits._
    Seq(fixture("test075-in.nq")).toDF("doc").createOrReplaceTempView("docs75")
    // SHA-384 hash algorithm as a literal option — byte-equal to the
    // W3C sha384 golden (round-4 hard-coded CanonOptions.default)
    val sha384 = spark.sql(
      "SELECT rdfc10_canonicalize(doc, 'SHA-384') FROM docs75")
      .collect().head.getString(0)
    assert(sha384 == fixture("test075-rdfc10.nq"))
    assert(sha384 != spark.sql("SELECT rdfc10_canonicalize(doc) FROM docs75")
      .collect().head.getString(0))
    // custom HNDQ budget: test044 computes at the default budget but
    // exceeds a limit of 1 — NULL from canonicalize, named status
    Seq(fixture("test044-in.nq")).toDF("doc").createOrReplaceTempView("docs44")
    val rows = spark.sql(
      """SELECT rdfc10_canonicalize(doc) IS NULL AS ok_null,
        |       rdfc10_canonicalize(doc, 1) IS NULL AS limited_null,
        |       rdfc10_status(doc, 1) AS limited_status
        |FROM docs44""".stripMargin).collect().head
    assert(!rows.getBoolean(0), "test044 must compute at the default budget")
    assert(rows.getBoolean(1), "an HNDQ limit of 1 must poison test044")
    assert(rows.getString(2) == "HndqCallLimitExceeded(1)")
    // unknown algorithm / non-literal options fail fast at build
    val err = intercept[Exception](
      spark.sql("SELECT rdfc10_canonicalize(doc, 'MD5') FROM docs75").collect())
    assert(err.getMessage.contains("unknown hash algorithm")
      || err.getCause != null && err.getCause.getMessage.contains("unknown hash algorithm"))
    // duplicate same-type options must be rejected, not silently
    // last-one-wins (a conflicting-arguments typo would otherwise
    // produce wrong hashes with no error)
    def failsWith(sql: String, msg: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage.contains(msg)
        || e.getCause != null && e.getCause.getMessage.contains(msg), sql)
    }
    failsWith("SELECT rdfc10_canonicalize(doc, 'SHA-256', 'SHA-384') FROM docs75",
      "duplicate hash-algorithm")
    failsWith("SELECT rdfc10_issue(doc, 100, 4000) FROM docs75",
      "duplicate HNDQ call limit")
    failsWith("SELECT rdfc10_canonicalize(doc, 0) FROM docs75",
      "must be positive")
  }

  test("rdfc10_canon_dataset rejects a non-positive HNDQ limit at build time") {
    import spark.implicits._
    Seq(("g", 0.toByte, "_:a", "urn:p", "x", 2.toByte))
      .toDF("repo", "sk", "s", "p", "o", "ok").createOrReplaceTempView("dsneg")
    val e = intercept[Exception](spark.sql(
      """SELECT rdfc10_canon_dataset(sk, s, p, o, ok, 0) FROM dsneg
        |GROUP BY repo""".stripMargin).collect())
    assert(e.getMessage.contains("must be positive")
      || e.getCause != null && e.getCause.getMessage.contains("must be positive"))
  }

  test("rdfc10_status distinguishes parse failure from poison from ok") {
    import spark.implicits._
    Seq(("ok", fixture("test020-in.nq")),
      ("poison", fixture("test074-in.nq")),
      ("garbage", "not n-quads at all"))
      .toDF("kind", "doc").createOrReplaceTempView("statusdocs")
    val m = spark.sql("SELECT kind, rdfc10_status(doc) FROM statusdocs")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("ok") == "ok")
    assert(m("poison") == "HndqCallLimitExceeded(4000)")
    assert(m("garbage").startsWith("parse_error"), m("garbage"))
  }

  test("SQL aggregate accepts a trailing HNDQ-limit literal (6/10-arg forms)") {
    import spark.implicits._
    val quads = graft.rdf.NQuadsParser.parseDocument(fixture("test044-in.nq"))
    quads.toDF().createOrReplaceTempView("q44")
    val limited = spark.sql(
      """SELECT rdfc10_canon_dataset(sKind, s, p, oKind, o, oDt, oLang, gKind, g, 1) AS r
        |FROM q44""".stripMargin)
      .selectExpr("r.status").collect().head.getString(0)
    assert(limited == "HndqCallLimitExceeded(1)")
    val ok = spark.sql(
      """SELECT rdfc10_canon_dataset(sKind, s, p, oKind, o, oDt, oLang, gKind, g) AS r
        |FROM q44""".stripMargin)
      .selectExpr("r.status").collect().head.getString(0)
    assert(ok == "ok")
  }

  test("SQL aggregate canonicalizes a STREAMING groupBy with graphs split across batches") {
    // rdfc10_canon_dataset as a streaming aggregation: the state store
    // carries the quad buffer BETWEEN micro-batches through the
    // serialize/deserialize codec, and complete-mode output must equal
    // the batch aggregate even when one graph's quads arrive split
    // across two triggers (the hard case: no single batch ever sees
    // the whole graph).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val g20 = graft.rdf.NQuadsParser.parseDocument(fixture("test020-in.nq"))
      .map(q => ("g20", q))
    val g60 = graft.rdf.NQuadsParser.parseDocument(fixture("test060-in.nq"))
      .map(q => ("g60", q))
    def rows(xs: Seq[(String, graft.rdf.Quad)]): Seq[SqlSurfaceSpec.StreamQuad] =
      xs.map { case (k, q) =>
        SqlSurfaceSpec.StreamQuad(k, q.sKind, q.s, q.p, q.oKind, q.o, q.oDt,
          q.oLang, q.gKind, q.g)
      }
    val mem = MemoryStream[SqlSurfaceSpec.StreamQuad]
    val df = mem.toDF()
    df.createOrReplaceTempView("stream_quads")
    val q = spark.sql(
      """SELECT k, rdfc10_canon_dataset(sKind, s, p, oKind, o, oDt, oLang, gKind, g) AS r
        |FROM stream_quads GROUP BY k""".stripMargin)
      .writeStream.format("memory").queryName("stream_canon")
      .outputMode("complete").start()
    try {
      // batch 1: half of g20, all of g60's first half
      val (a20, b20) = g20.splitAt(g20.size / 2)
      val (a60, b60) = g60.splitAt(g60.size / 2)
      mem.addData(rows(a20 ++ a60)); q.processAllAvailable()
      mem.addData(rows(b20 ++ b60)); q.processAllAvailable()
      val out = spark.sql("select k, r.status, r.canonicalNQuads from stream_canon")
        .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
      assert(out("g20") == ("ok", fixture("test020-rdfc10.nq")))
      assert(out("g60") == ("ok", fixture("test060-rdfc10.nq")))
    } finally q.stop()
  }

  test("extension class injects the same functions at session build") {
    // GraftExtensions delegates to GraftFunctions.functions — assert
    // the injection list covers all names (the shared-session tests
    // above already prove the builders work end to end).
    val names = GraftFunctions.functions.map(_._1.funcName).toSet
    assert(names == Set("rdfc10_canonicalize", "rdfc10_issue", "rdfc10_status",
      "rdfc10_canon_dataset"))
    new GraftExtensions() // constructible for spark.sql.extensions
  }
}

object SqlSurfaceSpec {
  /** Row shape for the streaming-aggregation test: named fields give
    * the MemoryStream an encoder and the SQL its column names. */
  final case class StreamQuad(k: String, sKind: Byte, s: String, p: String,
                              oKind: Byte, o: String, oDt: String,
                              oLang: String, gKind: Byte, g: String)
}
