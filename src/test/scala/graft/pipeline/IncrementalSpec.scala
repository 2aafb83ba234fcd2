package graft.pipeline

import graft.SparkTestBase
import graft.spark.CanonEngine
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental recanonicalization: only changed repos recompute, the
  * carried-forward state (content-addressed: rows hold shas, document
  * bodies live once in the doc store) is byte-identical to a
  * from-scratch run. */
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

  test("only changed repos recompute; resolved state equals a from-scratch run") {
    val filesA = Corpus.generate(spark, cfg)
    // bootstrap: everything fresh; the doc store starts from newDocs
    val inc0 = Incremental.run(filesA, dictNames, None)
    val state0 = inc0.state.cache()
    val docs0 = inc0.newDocs.cache()
    assert(inc0.reused.count() == 0)
    val repos0 = state0.select("repo").collect().map(_.getString(0)).toSet
    assert(repos0.nonEmpty)

    // state rows are content-addressed: NO document bodies in state
    assert(!state0.columns.contains("canonicalNQuads"),
      s"state must not carry document bodies: ${state0.columns.mkString(",")}")

    // snapshot B: mutate two repos
    val changedRepos = repos0.toSeq.sorted.take(2).toSet
    val filesB = mutate(filesA, changedRepos)
    val inc1 = Incremental.run(filesB, dictNames, Some((inc0.ccFingerprint, state0)))

    val freshRepos = inc1.fresh.select("repo").collect().map(_.getString(0)).toSet
    assert(freshRepos == changedRepos, s"recomputed $freshRepos != $changedRepos")
    assert(inc1.reused.count() == repos0.size - changedRepos.size)

    // the increment WRITES documents only for the changed sliver —
    // the unchanged corpus contributes zero bytes of document text
    // (this is the content-addressing contract that makes increment
    // cost independent of unchanged-corpus size)
    assert(inc1.newDocs.count() <= changedRepos.size,
      s"newDocs ${inc1.newDocs.count()} > changed ${changedRepos.size}")

    val docs1 = Incremental.appendDocs(docs0, inc1.newDocs)

    // gold check: incremental state == from-scratch state, byte-exact
    // through the content-addressed resolve join
    val scratch = Incremental.run(filesB, dictNames, None)
    def shas(df: org.apache.spark.sql.DataFrame) =
      df.select("repo", "outputSha256", "canonicalNQuads").collect()
        .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(shas(Incremental.resolve(inc1.state, docs1))
      == shas(Incremental.resolve(scratch.state, scratch.newDocs)))

    // the mutated repos really changed output; the rest carried over
    val before = shas(Incremental.resolve(state0, docs0))
    val after = shas(Incremental.resolve(inc1.state, docs1))
    changedRepos.foreach(r => assert(before(r) != after(r), s"$r should differ"))
    (repos0 -- changedRepos).foreach(r => assert(before(r) == after(r)))
    state0.unpersist(); docs0.unpersist()
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

  test("appendDocs is idempotent and dedups by sha (content addressing)") {
    val filesA = Corpus.generate(spark, cfg)
    val inc0 = Incremental.run(filesA, dictNames, None)
    val docs0 = inc0.newDocs.cache()
    val n = docs0.count()
    // shas are unique in the store
    assert(docs0.select("outputSha256").distinct().count() == n)
    // replaying the same append adds nothing
    assert(Incremental.appendDocs(docs0, inc0.newDocs).count() == n)
    // an unchanged-snapshot increment produces ZERO new documents and
    // zero fresh rows: the whole corpus carries forward as fixed-width
    // state rows only
    val inc1 = Incremental.run(filesA, dictNames,
      Some((inc0.ccFingerprint, inc0.state)))
    assert(inc1.fresh.count() == 0)
    assert(inc1.newDocs.count() == 0)
    assert(inc1.reused.count() == inc0.state.count())
    docs0.unpersist()
  }

  test("alias-carry increment == full-rescan increment; alias changes stay sound") {
    import spark.implicits._
    val filesA = Corpus.generate(spark, cfg)
    val inc0 = Incremental.run(filesA, dictNames, None)
    val state0 = inc0.state.cache()
    val aliases0 = inc0.aliases.cache()
    val repos0 = state0.select("repo").collect().map(_.getString(0)).toSet
    val changedRepos = repos0.toSeq.sorted.take(2).toSet
    val filesB = mutate(filesA, changedRepos)

    // equivalence: carrying unchanged repos' alias edges by fingerprint
    // must reproduce the full-content-rescan increment exactly
    val full = Incremental.run(filesB, dictNames, Some((inc0.ccFingerprint, state0)))
    val carry = Incremental.run(filesB, dictNames, Some((inc0.ccFingerprint, state0)),
      prevAliases = Some(aliases0))
    assert(carry.ccFingerprint == full.ccFingerprint)
    def stateMap(df: org.apache.spark.sql.DataFrame) =
      df.select("repo", "outputSha256").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(stateMap(carry.state) == stateMap(full.state))
    assert(carry.fresh.select("repo").collect().map(_.getString(0)).toSet
      == changedRepos)
    // the carried edge set equals a fresh full scan of the new corpus
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.select("repo", "src", "dst").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(edges(carry.aliases) == edges(Incremental.aliasEdgesByRepo(filesB)))

    // soundness: a NEW cross-group alias in a changed repo merges
    // entities -> the entity map moves -> even the carry path must
    // degrade to a full recompute (the ccFingerprint guard)
    val victim = changedRepos.head
    val filesC = filesA.map { f =>
      if (f.repo == victim) {
        val c = f.content +
          s"\n// alias: ${Corpus.entityName(1)} ${Corpus.entityName(5)}\n"
        f.copy(content = c, content_sha = graft.spark.CanonEngine.sha256Hex(c))
      } else f
    }
    val incC = Incremental.run(filesC, dictNames, Some((inc0.ccFingerprint, state0)),
      prevAliases = Some(aliases0))
    assert(incC.ccFingerprint != inc0.ccFingerprint,
      "new cross-group alias must move the entity map")
    assert(incC.reused.count() == 0, "entity-map move must force full recompute")
    state0.unpersist(); aliases0.unpersist()
  }

  test("vacuum drops orphaned documents and keeps live ones byte-identical") {
    import spark.implicits._
    val filesA = Corpus.generate(spark, cfg)
    val inc0 = Incremental.run(filesA, dictNames, None)
    val state0 = inc0.state.cache()
    val docs0 = inc0.newDocs.cache()

    // a mutation replaces two repos' outputs: their OLD documents
    // become orphans in the append-only store
    val changed = state0.select("repo").collect().map(_.getString(0))
      .toSeq.sorted.take(2).toSet
    val inc1 = Incremental.run(mutate(filesA, changed), dictNames,
      Some((inc0.ccFingerprint, state0)))
    val store = Incremental.appendDocs(docs0, inc1.newDocs).cache()
    val live = inc1.state.select("outputSha256").collect().map(_.getString(0)).toSet
    val all = store.select("outputSha256").collect().map(_.getString(0)).toSet
    assert((all -- live).nonEmpty, "mutation should have orphaned old docs")

    val vacuumed = Incremental.vacuum(store, inc1.state).cache()
    // orphans gone, exactly the live shas remain
    assert(vacuumed.select("outputSha256").collect().map(_.getString(0)).toSet
      == live)
    // live documents survive byte-identical
    def bodies(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val origBodies = bodies(store.select("outputSha256", "canonicalNQuads"))
    bodies(vacuumed.select("outputSha256", "canonicalNQuads")).foreach {
      case (sha, body) => assert(origBodies(sha) == body)
    }
    // resolve over the vacuumed store still yields every state row a body
    val resolved = Incremental.resolve(inc1.state, vacuumed)
    assert(resolved.where(col("canonicalNQuads").isNull).count() == 0)
    state0.unpersist(); docs0.unpersist(); store.unpersist(); vacuumed.unpersist()
  }

  test("bucketed increment == plain increment, and PRUNES unchanged partitions") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val nBuckets = 8
    val dir = java.nio.file.Files.createTempDirectory("bucketed-corpus")
    val pathA = dir.resolve("snapA").toString
    val pathB = dir.resolve("snapB").toString

    val filesA = Corpus.generate(spark, cfg)
    Incremental.writeBucketed(filesA, pathA, nBuckets)
    // one file per bucket directory (repartition on the bucket column)
    val bucketDirs = new java.io.File(pathA).listFiles()
      .filter(_.getName.startsWith(s"${Incremental.RepoBucketCol}=")).toSeq
    assert(bucketDirs.nonEmpty && bucketDirs.size <= nBuckets)

    val inc0 = Incremental.runBucketed(spark, pathA, dictNames, None,
      nBuckets = nBuckets)
    val state0 = inc0.state.cache()
    val repos0 = state0.select("repo").collect().map(_.getString(0)).toSet

    val changedRepos = repos0.toSeq.sorted.take(2).toSet
    Incremental.writeBucketed(mutate(filesA, changedRepos), pathB, nBuckets)

    // plan-level: the changed-file read must carry PartitionFilters
    // and touch fewer files than the full corpus
    import spark.implicits._
    val changedDf = changedRepos.toSeq.toDF("repo")
    val pruned = Incremental.prunedChangedFiles(
      spark.read.parquet(pathB), changedDf, nBuckets)
    pruned.toDF().count() // materialize: AQE finalizes the plan, metrics fill
    val finalPlan = pruned.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = finalPlan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, s"no parquet scan in the pruned plan:\n$finalPlan")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"changed-file scan has no partition filters: ${scan.partitionFilters}")
    val changedBuckets = changedDf
      .select(Incremental.repoBucket(nBuckets)).distinct().count()
    // selectedPartitions applies the static partition filters at file
    // listing — the authoritative count of bucket dirs actually read
    val partsRead = scan.selectedPartitions.partitionCount
    assert(partsRead == changedBuckets,
      s"pruned scan reads $partsRead bucket partitions, expected " +
        s"$changedBuckets (of ${bucketDirs.size})")
    assert(partsRead < bucketDirs.size,
      "pruning read every bucket — no partitions were skipped")

    // end-to-end: the bucketed increment's state equals the plain one
    val incPlain = Incremental.run(
      Incremental.readBucketed(spark, pathB), dictNames,
      Some((inc0.ccFingerprint, state0)))
    val incBucketed = Incremental.runBucketed(spark, pathB, dictNames,
      Some((inc0.ccFingerprint, state0)), nBuckets = nBuckets)
    assert(incBucketed.fresh.select("repo").collect().map(_.getString(0)).toSet
      == changedRepos)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(incBucketed.state) == rows(incPlain.state))
    assert(rows(incBucketed.newDocs) == rows(incPlain.newDocs))

    // layout metadata: a mismatched nBuckets must fail LOUDLY, never
    // silently prune with the wrong bucket function (the partition
    // filter would drop changed repos' files — silent data loss)
    assert(Incremental.readLayoutBuckets(spark, pathB).contains(nBuckets))
    val err = intercept[IllegalArgumentException] {
      Incremental.runBucketed(spark, pathB, dictNames,
        Some((inc0.ccFingerprint, state0)), nBuckets = nBuckets * 2)
    }
    assert(err.getMessage.contains("does not match the bucketed layout"),
      err.getMessage)
    state0.unpersist()
  }
}
