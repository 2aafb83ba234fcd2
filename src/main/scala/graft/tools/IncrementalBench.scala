package graft.tools

import graft.pipeline.{Corpus, FileRow, Incremental}
import graft.spark.CanonEngine
import org.apache.spark.storage.StorageLevel

/** Measured evidence for the incremental-recanonicalization cost
  * claim: an increment's expensive work (mention scan, link join,
  * RDFC-1.0 kernel) is O(changed repos), not O(corpus). Bootstraps a
  * synthetic corpus, mutates `nChanged` repos (keeping their alias
  * facts so the global entity map — and therefore the increment's
  * soundness guard — stays stable), and times the incremental run
  * against the bootstrap on the same session.
  *
  * The increment still pays two corpus-wide COLUMNAR passes by
  * design (per-repo fingerprints and the alias-edge scan for the CC
  * fingerprint guard) — cheap aggregations that scale with corpus
  * size but involve no canonicalization; the printed JSON separates
  * the ratio so that floor is visible.
  *
  * Usage: IncrementalBench [nRepos] [nChanged] [filesPerRepo] [mentionsPerFile] [padChars] [--cores N]
  */
object IncrementalBench {
  def main(args: Array[String]): Unit = {
    def pos(i: Int, dflt: Int): Int =
      args.lift(i).filterNot(_.startsWith("--")).map(_.toInt).getOrElse(dflt)
    val nRepos = pos(0, 20000)
    val nChanged = pos(1, 50)
    val filesPerRepo = pos(2, 6)
    val mentionsPerFile = pos(3, 8)
    val padChars = pos(4, 0)
    val cores = args.sliding(2)
      .collectFirst { case Array("--cores", v) => v.toInt }.getOrElse(32)
    val spark = CanonEngine.session(s"local[$cores]", shufflePartitions = cores)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val cfg = Corpus.Config(nRepos = nRepos, baseFilesPerRepo = filesPerRepo,
      mentionsPerFile = mentionsPerFile, contentPadChars = padChars)
    val dictNames = (0 until cfg.nEntities).map(Corpus.entityName)
    val files = Corpus.generate(spark, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    // corpus repo-name format (Corpus.buildFile): f"repo$idx%04d"
    val changed = (0 until nChanged).map(i => f"repo${i * (nRepos / nChanged)}%04d").toSet
    val changedBc = spark.sparkContext.broadcast(changed)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    // this host's steal waves swing single trials multi-x; warm-up
    // once (JIT/codegen) then min-of-N, like every bench in the repo
    def minOf(n: Int)(f: => Unit): Double = { f; (1 to n).map(_ => time(f)).min }

    val inc0 = Incremental.run(files, dictNames, None)
    val state0 = inc0.state.persist(StorageLevel.MEMORY_AND_DISK)
    require(state0.count() == nRepos.toLong, "bootstrap incomplete")
    // the alias edge set is part of the carried state (tiny —
    // dictionary-scale rows), exactly like the state table itself
    val aliases0 = inc0.aliases.persist(StorageLevel.MEMORY_AND_DISK)
    aliases0.count()

    val bootstrapSec = minOf(2) {
      Incremental.run(files, dictNames, None).state.count()
    }

    // mutate the changed repos' mention text, keep alias facts
    val filesB = files.map { f =>
      if (changedBc.value.contains(f.repo)) {
        val aliasLines = f.content.linesIterator
          .filter(_.contains("// alias:")).mkString("\n")
        val c = s"rewritten ${f.path} mentions ${Corpus.entityName(1)} only\n$aliasLines"
        f.copy(content = c, content_sha = CanonEngine.sha256Hex(c))
      } else f
    }.persist(StorageLevel.MEMORY_AND_DISK)
    filesB.count()

    var nFresh = 0L; var nReused = 0L; var nNewDocs = 0L
    def increment(prevA: Option[org.apache.spark.sql.DataFrame]): Unit = {
      val inc1 = Incremental.run(filesB, dictNames, Some((inc0.ccFingerprint, state0)),
        prevAliases = prevA)
      nFresh = inc1.fresh.count(); nReused = inc1.reused.count()
      nNewDocs = inc1.newDocs.count()
    }
    val incrementSec = minOf(2)(increment(Some(aliases0)))
    val incrementFullScanSec = minOf(2)(increment(None))
    require(nFresh == nChanged.toLong, s"fresh $nFresh != changed $nChanged")
    require(nReused == (nRepos - nChanged).toLong, s"reused $nReused")
    println(f"""{"job":"incremental_recanon","n_repos":$nRepos,"n_changed":$nChanged,"bootstrap_sec":$bootstrapSec%.2f,"increment_sec":$incrementSec%.2f,"increment_fullscan_sec":$incrementFullScanSec%.2f,"speedup":${bootstrapSec / incrementSec}%.1f,"fresh":$nFresh,"reused":$nReused,"new_docs":$nNewDocs}""")
    spark.stop()
  }
}
