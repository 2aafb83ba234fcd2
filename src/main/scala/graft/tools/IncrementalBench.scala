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
  * With `--bucketed N` the corpus is written to a temp dir via
  * [[Incremental.writeBucketed]] (N repo buckets) and both runs go
  * through [[Incremental.runBucketed]], with task input metrics
  * tracked: the printed `input_mb_*` fields evidence that an
  * increment's INPUT BYTES scale with the changed sliver's buckets
  * (plus the cheap columnar fingerprint pass), not the corpus —
  * use a padChars of 1000+ so the content column dominates.
  *
  * Usage: IncrementalBench [nRepos] [nChanged] [filesPerRepo] [mentionsPerFile] [padChars] [--cores N] [--bucketed N]
  */
object IncrementalBench {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // locale-safe f"%.3f" JSON
    def pos(i: Int, dflt: Int): Int =
      args.lift(i).filterNot(_.startsWith("--")).map(_.toInt).getOrElse(dflt)
    val nRepos = pos(0, 20000)
    val nChanged = pos(1, 50)
    val filesPerRepo = pos(2, 6)
    val mentionsPerFile = pos(3, 8)
    val padChars = pos(4, 0)
    val cores = args.sliding(2)
      .collectFirst { case Array("--cores", v) => v.toInt }.getOrElse(32)
    val bucketed = args.sliding(2)
      .collectFirst { case Array("--bucketed", v) => v.toInt }
    val spark = CanonEngine.session(s"local[$cores]", shufflePartitions = cores)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    if (bucketed.isDefined) {
      runBucketedMode(spark, nRepos, nChanged, filesPerRepo, mentionsPerFile,
        padChars, bucketed.get)
      spark.stop()
      return
    }

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

  /** Bucketed-layout variant: times AND meters input bytes. */
  private def runBucketedMode(spark: org.apache.spark.sql.SparkSession,
                              nRepos: Int, nChanged: Int, filesPerRepo: Int,
                              mentionsPerFile: Int, padChars: Int,
                              nBuckets: Int): Unit = {
    import spark.implicits._
    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          bytesRead.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(listener)
    def meteredOnce(f: => Unit): (Double, Long) = {
      Thread.sleep(500) // drain listener-bus events from prior phases
      bytesRead.set(0L)
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let this phase's task-end events land
      (sec, bytesRead.get())
    }
    // min-of-2 like every bench in the repo (host steal waves swing
    // single trials multi-x); input bytes come from the faster trial
    def metered(f: => Unit): (Double, Long) =
      Seq(meteredOnce(f), meteredOnce(f)).minBy(_._1)

    val cfg = Corpus.Config(nRepos = nRepos, baseFilesPerRepo = filesPerRepo,
      mentionsPerFile = mentionsPerFile, contentPadChars = padChars)
    val dictNames = (0 until cfg.nEntities).map(Corpus.entityName)
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed-bench")
    val pathA = dir.resolve("snapA").toString
    val pathB = dir.resolve("snapB").toString
    val files = Corpus.generate(spark, cfg)
    Incremental.writeBucketed(files, pathA, nBuckets)
    val changed = (0 until nChanged).map(i => f"repo${i * (nRepos / nChanged)}%04d").toSet
    val changedBc = spark.sparkContext.broadcast(changed)
    Incremental.writeBucketed(files.map { f =>
      if (changedBc.value.contains(f.repo)) {
        val aliasLines = f.content.linesIterator
          .filter(_.contains("// alias:")).mkString("\n")
        val c = s"rewritten ${f.path} mentions ${Corpus.entityName(1)} only\n$aliasLines"
        f.copy(content = c, content_sha = CanonEngine.sha256Hex(c))
      } else f
    }, pathB, nBuckets)

    // warm-up (JIT/codegen) then measure; min-of-2 like the plain mode
    var inc0: Incremental.Increment = null
    def bootstrap(): Unit = {
      inc0 = Incremental.runBucketed(spark, pathA, dictNames, None,
        nBuckets = nBuckets)
      require(inc0.state.count() == nRepos.toLong, "bootstrap incomplete")
    }
    bootstrap()
    val state0 = inc0.state.persist(StorageLevel.MEMORY_AND_DISK)
    state0.count()
    val aliases0 = inc0.aliases.persist(StorageLevel.MEMORY_AND_DISK)
    aliases0.count()
    val ccFp0 = inc0.ccFingerprint
    val (bootSec, bootBytes) = metered(bootstrap())

    var nFresh = 0L
    def increment(): Unit = {
      val inc1 = Incremental.runBucketed(spark, pathB, dictNames,
        Some((ccFp0, state0)), prevAliases = Some(aliases0),
        nBuckets = nBuckets)
      nFresh = inc1.fresh.count()
    }
    increment() // warm-up
    val (incSec, incBytes) = metered(increment())
    require(nFresh == nChanged.toLong, s"fresh $nFresh != changed $nChanged")
    val changedBuckets = changed.toSeq.toDF("repo")
      .select(Incremental.repoBucket(nBuckets)).distinct().count()
    println(f"""{"job":"incremental_recanon_bucketed","n_repos":$nRepos,"n_changed":$nChanged,"n_buckets":$nBuckets,"changed_buckets":$changedBuckets,"pad_chars":$padChars,"bootstrap_sec":$bootSec%.2f,"increment_sec":$incSec%.2f,"input_mb_bootstrap":${bootBytes / 1e6}%.1f,"input_mb_increment":${incBytes / 1e6}%.1f,"input_ratio":${bootBytes.toDouble / math.max(1L, incBytes)}%.1f}""")
  }
}
