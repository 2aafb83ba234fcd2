package graft.pipeline

import graft.SparkTestBase
import graft.spark.CanonEngine
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental recanonicalization: only changed repos recompute, the
  * carried-forward state is byte-identical to a from-scratch run. */
class IncrementalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private val cfg = Corpus.Config(nRepos = 12, baseFilesPerRepo = 4)
  private val dictNames = (0 until cfg.nEntities).map(Corpus.entityName)

  private def mutate(files: org.apache.spark.sql.Dataset[FileRow],
                     repos: Set[String]): org.apache.spark.sql.Dataset[FileRow] = {
    import spark.implicits._
    // replace the mention text but KEEP the repo's alias facts: losing
    // an alias edge changes the GLOBAL canonical entity map, which
    // (correctly) forces a full recompute — tested separately. Merely
    // APPENDING a mention can leave the canonical output unchanged
    // (triples are set-deduplicated), so mentions are rewritten.
    files.map { f =>
      if (repos.contains(f.repo)) {
        val aliasLines = f.content.linesIterator
          .filter(_.contains("// alias:")).mkString("\n")
        val c = s"rewritten ${f.path} mentions ${Corpus.entityName(3)} only\n$aliasLines"
        f.copy(content = c, content_sha = CanonEngine.sha256Hex(c))
      } else f
    }
  }

  test("only changed repos recompute; state equals a from-scratch run") {
    val filesA = Corpus.generate(spark, cfg)
    // bootstrap: everything fresh
    val inc0 = Incremental.run(filesA, dictNames, None)
    val state0 = inc0.state.cache()
    assert(inc0.reused.count() == 0)
    val repos0 = state0.select("repo").collect().map(_.getString(0)).toSet
    assert(repos0.nonEmpty)

    // snapshot B: mutate two repos
    val changedRepos = repos0.toSeq.sorted.take(2).toSet
    val filesB = mutate(filesA, changedRepos)
    val inc1 = Incremental.run(filesB, dictNames, Some((inc0.ccFingerprint, state0)))

    val freshRepos = inc1.fresh.select("repo").collect().map(_.getString(0)).toSet
    assert(freshRepos == changedRepos, s"recomputed $freshRepos != $changedRepos")
    assert(inc1.reused.count() == repos0.size - changedRepos.size)

    // gold check: incremental state == from-scratch state, byte-exact
    val scratch = Incremental.run(filesB, dictNames, None)
    def shas(df: org.apache.spark.sql.DataFrame) =
      df.select("repo", "outputSha256", "canonicalNQuads").collect()
        .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(shas(inc1.state) == shas(scratch.state))

    // the mutated repos really changed output; the rest carried over
    val before = shas(state0)
    val after = shas(inc1.state)
    changedRepos.foreach(r => assert(before(r) != after(r), s"$r should differ"))
    (repos0 -- changedRepos).foreach(r => assert(before(r) == after(r)))
    state0.unpersist()
  }

  test("a changed canonical entity map soundly forces full recompute") {
    val filesA = Corpus.generate(spark, cfg)
    val inc0 = Incremental.run(filesA, dictNames, None)
    val state0 = inc0.state.cache()
    // pretend the previous run saw a different entity map
    val inc1 = Incremental.run(filesA, dictNames,
      Some((inc0.ccFingerprint + 1, state0)))
    assert(inc1.reused.count() == 0)
    assert(inc1.fresh.count() == state0.count())
    state0.unpersist()
  }
}
