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

  test("extension class injects the same functions at session build") {
    // GraftExtensions delegates to GraftFunctions.functions — assert
    // the injection list covers both names (the shared-session test
    // above already proves the builders work end to end).
    val names = GraftFunctions.functions.map(_._1.funcName).toSet
    assert(names == Set("rdfc10_canonicalize", "rdfc10_issue"))
    new GraftExtensions() // constructible for spark.sql.extensions
  }
}
