package graft.spark

import graft.canon.{CanonException, CanonOptions, Rdfc10}
import graft.rdf.{NQuadsParser, Quad, TermKind}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, Literal, UnaryExpression}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** SQL scalar function `rdfc10_canonicalize(nquads_doc)`: parse an
  * N-Quads document string, canonicalize it (RDFC-1.0), return the
  * canonical N-Quads document. NULL on unparseable or poison input
  * (HNDQ budget exceeded) — data errors stay data, they never kill
  * the query, matching the per-graph error-row semantics of
  * [[CanonEngine.canonicalizePerGraph]].
  *
  * CodegenFallback is deliberate: the kernel is a whole-document
  * recursive algorithm — there is nothing for codegen to fuse, and
  * the expression sits at the top of its projection.
  */
case class Rdfc10Canonicalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
  override def dataType: DataType = StringType
  override def prettyName: String = "rdfc10_canonicalize"

  override protected def nullSafeEval(input: Any): Any =
    try {
      val quads = NQuadsParser.parseDocument(input.asInstanceOf[UTF8String].toString)
      UTF8String.fromString(Rdfc10.canonicalize(quads, CanonOptions.default))
    } catch {
      case _: CanonException | _: NQuadsParser.ParseException => null
    }

  override protected def withNewChildInternal(newChild: Expression): Rdfc10Canonicalize =
    copy(child = newChild)
}

/** Same surface for the issued-identifiers map (the spec's
  * "canonicalized dataset"): `rdfc10_issue(nquads_doc)` → JSON map. */
case class Rdfc10Issue(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
  override def dataType: DataType = StringType
  override def prettyName: String = "rdfc10_issue"

  override protected def nullSafeEval(input: Any): Any =
    try {
      val quads = NQuadsParser.parseDocument(input.asInstanceOf[UTF8String].toString)
      val m = Rdfc10.issue(quads, CanonOptions.default).issuedMap
      UTF8String.fromString(
        m.toSeq.sorted.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}"))
    } catch {
      case _: CanonException | _: NQuadsParser.ParseException => null
    }

  override protected def withNewChildInternal(newChild: Expression): Rdfc10Issue =
    copy(child = newChild)
}

/** SQL aggregate `rdfc10_canon_dataset(...)`: per-GROUP RDFC-1.0
  * canonicalization — the SQL face of
  * [[CanonEngine.canonicalizePerGraph]], so the distributed engine
  * composes in pure SQL:
  *
  * {{{
  * SELECT repo, rdfc10_canon_dataset(subjKind, subj, pred, obj, objKind).*
  * FROM triples GROUP BY repo
  * }}}
  *
  * Accepts the 5-column triple-table shape (objects land in the
  * default graph, literals with empty datatype/lang — the builder
  * expands it) or the full 9-column quad shape
  * (sKind, s, p, oKind, o, oDt, oLang, gKind, g). Returns
  * struct(status, canonicalNQuads, issuedMapJson, outputSha256,
  * quadCount, bnodeCount, hndqCalls); a poisoned group yields an
  * error STATUS, never a failed query (reference negative-test
  * semantics, `tests/manifest.jsonld:851-857`).
  *
  * A `TypedImperativeAggregate` is the honest Catalyst home for this:
  * there is no partial aggregation to exploit (the kernel needs the
  * whole graph — SURVEY §4.3), but the buffer composes with
  * hash/sort aggregation, spilling, and AQE like any built-in
  * aggregate, and update/merge stay object-typed so quads are not
  * re-encoded per row. The buffer dedups quads as they arrive (set
  * semantics, reference `src/api.rs:287`), so buffer size is bounded
  * by the DISTINCT quad count of the group, not the input row count.
  */
case class Rdfc10CanonDataset(
    children: Seq[Expression],
    hndqCallLimit: Int = CanonOptions.default.hndqCallLimit,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashSet[Quad]] {

  override def prettyName: String = "rdfc10_canon_dataset"
  override def nullable: Boolean = false

  override def dataType: DataType = StructType(Seq(
    StructField("status", StringType, nullable = false),
    StructField("canonicalNQuads", StringType, nullable = false),
    StructField("issuedMapJson", StringType, nullable = false),
    StructField("outputSha256", StringType, nullable = false),
    StructField("quadCount", LongType, nullable = false),
    StructField("bnodeCount", IntegerType, nullable = false),
    StructField("hndqCalls", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.length != 9)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes 5 (triple) or 9 (quad) arguments")
    val kindOk = Seq(0, 3, 7).forall(i => children(i).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })
    val strOk = Seq(1, 2, 4, 5, 6, 8).forall(children(_).dataType == StringType)
    if (kindOk && strOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (int, string, string, int, string, string, string, int, string)")
  }

  override def createAggregationBuffer(): mutable.LinkedHashSet[Quad] =
    mutable.LinkedHashSet.empty

  private def str(e: Expression, row: InternalRow): String = {
    val v = e.eval(row)
    if (v == null) "" else v.asInstanceOf[UTF8String].toString
  }

  /** Standard aggregate null semantics for the kind columns: a row
    * with ANY null kind is skipped (like `sum` skips null inputs) —
    * the string columns null-coalesce to "", but a kind byte has no
    * usable default (0 = IRI would silently reinterpret the term). */
  override def update(buf: mutable.LinkedHashSet[Quad],
                      row: InternalRow): mutable.LinkedHashSet[Quad] = {
    val sk = children(0).eval(row)
    val ok = children(3).eval(row)
    val gk = children(7).eval(row)
    if (sk != null && ok != null && gk != null)
      buf += Quad(sk.asInstanceOf[Number].byteValue(), str(children(1), row),
        str(children(2), row), ok.asInstanceOf[Number].byteValue(),
        str(children(4), row), str(children(5), row), str(children(6), row),
        gk.asInstanceOf[Number].byteValue(), str(children(8), row))
    buf
  }

  override def merge(a: mutable.LinkedHashSet[Quad],
                     b: mutable.LinkedHashSet[Quad]): mutable.LinkedHashSet[Quad] = {
    a ++= b; a
  }

  override def eval(buf: mutable.LinkedHashSet[Quad]): Any = {
    val r = CanonEngine.canonicalizeOne("", buf.toVector,
      CanonOptions.default.copy(hndqCallLimit = hndqCallLimit),
      assumeDistinct = true) // the buffer is already a set
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(r.status), UTF8String.fromString(r.canonicalNQuads),
      UTF8String.fromString(r.issuedMapJson), UTF8String.fromString(r.outputSha256),
      r.quadCount, r.bnodeCount, r.hndqCalls))
  }

  // Spill codec: int-length-prefixed raw UTF-8, NOT writeUTF —
  // writeUTF throws UTFDataFormatException past 65535 encoded bytes,
  // and document-body literals routinely exceed 64 KB at the scale
  // this aggregate targets; a codec exception would fail the whole
  // query, contradicting the "poison yields an error STATUS" contract.
  private def writeStr(out: java.io.DataOutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    out.writeInt(b.length); out.write(b)
  }
  private def readStr(in: java.io.DataInputStream): String = {
    val b = new Array[Byte](in.readInt())
    in.readFully(b)
    new String(b, java.nio.charset.StandardCharsets.UTF_8)
  }

  override def serialize(buf: mutable.LinkedHashSet[Quad]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { q =>
      out.writeByte(q.sKind); writeStr(out, q.s); writeStr(out, q.p)
      out.writeByte(q.oKind); writeStr(out, q.o); writeStr(out, q.oDt)
      writeStr(out, q.oLang); out.writeByte(q.gKind); writeStr(out, q.g)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashSet[Quad] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.LinkedHashSet.empty[Quad]
    var i = 0
    while (i < n) {
      buf += Quad(in.readByte(), readStr(in), readStr(in), in.readByte(),
        readStr(in), readStr(in), readStr(in), in.readByte(), readStr(in))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): Rdfc10CanonDataset =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Rdfc10CanonDataset =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Rdfc10CanonDataset =
    copy(children = newChildren)
}

object Rdfc10CanonDataset {
  /** Builder: expand the 5-arg triple shape (subjKind, subj, pred,
    * obj, objKind) to the 9-arg quad shape — plain literals carry
    * dt = "" / lang = "" and everything lands in the default graph,
    * matching `Kg.canonicalizeTriples`. */
  def build(args: Seq[Expression]): Expression = args.length match {
    case 5 =>
      val e = lit("")
      Rdfc10CanonDataset(Seq(args(0), args(1), args(2), args(4), args(3),
        e, e, Literal(TermKind.DefaultGraph, ByteType), e))
    case _ => Rdfc10CanonDataset(args)
  }
  private def lit(s: String): Expression = Literal(UTF8String.fromString(s), StringType)
}

object GraftFunctions {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("rdfc10_canonicalize"),
      new ExpressionInfo(classOf[Rdfc10Canonicalize].getName, "rdfc10_canonicalize"),
      (children: Seq[Expression]) => Rdfc10Canonicalize(children.head)),
    (FunctionIdentifier("rdfc10_issue"),
      new ExpressionInfo(classOf[Rdfc10Issue].getName, "rdfc10_issue"),
      (children: Seq[Expression]) => Rdfc10Issue(children.head)),
    (FunctionIdentifier("rdfc10_canon_dataset"),
      new ExpressionInfo(classOf[Rdfc10CanonDataset].getName, "rdfc10_canon_dataset"),
      (children: Seq[Expression]) => Rdfc10CanonDataset.build(children))
  )

  /** Imperative registration on an existing session (tests, REPLs). */
  def register(spark: SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (id, info, builder) =>
      reg.registerFunction(id, info, builder)
    }
  }
}

/** Session-build wiring: `--conf spark.sql.extensions=graft.spark.GraftExtensions`
  * (or `SparkSession.builder.withExtensions(new GraftExtensions)`)
  * makes the RDFC-1.0 engine reachable from plain SQL like every
  * built-in function. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach(ext.injectFunction)
}
