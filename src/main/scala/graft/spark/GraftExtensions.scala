package graft.spark

import graft.canon.{CanonException, CanonOptions, Rdfc10}
import graft.rdf.NQuadsParser
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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

object GraftFunctions {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("rdfc10_canonicalize"),
      new ExpressionInfo(classOf[Rdfc10Canonicalize].getName, "rdfc10_canonicalize"),
      (children: Seq[Expression]) => Rdfc10Canonicalize(children.head)),
    (FunctionIdentifier("rdfc10_issue"),
      new ExpressionInfo(classOf[Rdfc10Issue].getName, "rdfc10_issue"),
      (children: Seq[Expression]) => Rdfc10Issue(children.head))
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
