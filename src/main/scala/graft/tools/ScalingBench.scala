package graft.tools

import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling evidence (BASELINE.json north rule).
  *
  * No real cluster exists in this sandbox, so the N→4N executor
  * criterion is evidenced by running the IDENTICAL job at local[8]
  * and local[32] on the same deterministic input and reporting
  * throughput at both plus scaling efficiency `(thr32 / thr8) / 4`
  * (target >= 0.8).
  *
  * Each core count runs in its OWN forked JVM (matching how two
  * cluster deployments are separate processes): a shared JVM
  * accumulates GC/codegen state across SparkContext restarts that
  * skews whichever run goes second.
  *
  * Usage:
  *   ScalingBench [nRepos] [filesPerRepo] [mentionsPerFile]   # fork 8 + 32
  *   ScalingBench --single <cores> <nRepos> <files> <mpf>     # one measurement
  */
object ScalingBench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def runJob(spark: SparkSession, cfg: graft.pipeline.Corpus.Config): Long = {
    import spark.implicits._
    val dictNames = (0 until cfg.nEntities).map(graft.pipeline.Corpus.entityName)
    val dict = spark.sparkContext.broadcast(dictNames.toSet)
    // persist the corpus: it is consumed by three scans (mentions,
    // aliases count, aliases collect). In the real pipeline this is a
    // columnar table on disk; in the bench it is generated, so cache
    // it once instead of regenerating per scan.
    val files = graft.pipeline.Corpus.generate(spark, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val mentions = graft.pipeline.Kg.detectMentions(files, dict)
      val linked = graft.pipeline.Kg.linkMentions(mentions, dictNames.toDF("name"))
      val aliases = graft.pipeline.Kg.detectAliases(files)
      val cc = graft.pipeline.Kg.connectedComponents(dictNames.toDF("name"), aliases)
      val triples = graft.pipeline.Kg.dedupTriples(
        graft.pipeline.Kg.emitTriples(linked, cc))
      graft.pipeline.Kg.canonicalizeTriples(triples).filter(_.status == "ok").count()
    } finally files.unpersist(blocking = false)
  }

  /** One measurement in this JVM: JIT warm-up run, then `trials`
    * timed runs; reports the MINIMUM (the host VM shows transient
    * steal-time spikes; min-of-N isolates the job's own cost).
    * Prints `RESULT <secs> <okGraphs>` on stdout. */
  private def single(cores: Int, cfg: graft.pipeline.Corpus.Config): Unit = {
    val spark = session(cores)
    runJob(spark, cfg) // full-size warm-up: JIT + codegen
    // The host VM shows transient multi-second steal-time spikes that
    // inflate in-task CPU 10x+. Take the minimum over trials and stop
    // once two trials agree within 15% of it (max 6) — the agreed
    // minimum is the job's own cost.
    var times = List.empty[Double]
    var ok = 0L
    var trial = 0
    var stable = false
    while (trial < 6 && !stable) {
      val t0 = System.nanoTime()
      ok = runJob(spark, cfg)
      times ::= (System.nanoTime() - t0) / 1e9
      trial += 1
      val best = times.min
      stable = trial >= 2 && times.count(_ <= best * 1.15) >= 2
      System.err.println(f"[scaling] cores=$cores trial=$trial ${times.head}%.2f s")
    }
    spark.stop()
    println(f"RESULT ${times.min}%.3f $ok")
  }

  private def fork(cores: Int, cfg: graft.pipeline.Corpus.Config): (Double, Long) = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments
    val cp = System.getProperty("java.class.path")
    val cmd = new java.util.ArrayList[String]()
    cmd.add(javaBin)
    jvmArgs.forEach(a => if (!a.startsWith("-agentlib")) cmd.add(a))
    cmd.add("-cp"); cmd.add(cp)
    cmd.add("graft.tools.ScalingBench"); cmd.add("--single")
    cmd.add(cores.toString); cmd.add(cfg.nRepos.toString)
    cmd.add(cfg.baseFilesPerRepo.toString); cmd.add(cfg.mentionsPerFile.toString)
    // stderr MUST be drained (inherit): an unconsumed pipe fills with
    // Spark log output and blocks the child's writer threads.
    val p = new ProcessBuilder(cmd)
      .redirectError(ProcessBuilder.Redirect.INHERIT)
      .start()
    val out = new String(p.getInputStream.readAllBytes())
    p.waitFor()
    val line = out.linesIterator.filter(_.startsWith("RESULT")).toSeq.headOption
      .getOrElse(sys.error(s"no RESULT from forked run @$cores:\n$out"))
    val parts = line.split(" ")
    (parts(1).toDouble, parts(2).toLong)
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--single")) {
      val Array(_, cores, repos, files, mpf) = args
      single(cores.toInt, graft.pipeline.Corpus.Config(
        nRepos = repos.toInt, baseFilesPerRepo = files.toInt,
        mentionsPerFile = mpf.toInt))
      return
    }
    val nRepos = args.lift(0).map(_.toInt).getOrElse(2000)
    val files = args.lift(1).map(_.toInt).getOrElse(16)
    val mpf = args.lift(2).map(_.toInt).getOrElse(10)
    val cfg = graft.pipeline.Corpus.Config(
      nRepos = nRepos, baseFilesPerRepo = files, mentionsPerFile = mpf)

    val (t8, ok8) = fork(8, cfg)
    val (t32, ok32) = fork(32, cfg)
    require(ok8 == ok32 && ok8 == nRepos.toLong, s"graph counts differ: $ok8 vs $ok32")
    val thr8 = nRepos / t8
    val thr32 = nRepos / t32
    val eff = (thr32 / thr8) / 4.0
    println(f"""{"job":"kg_canon_pipeline","graphs":$nRepos,"local8_sec":$t8%.2f,"local32_sec":$t32%.2f,"thr8_gps":$thr8%.2f,"thr32_gps":$thr32%.2f,"scaling_efficiency":$eff%.3f,"pass":${eff >= 0.8}}""")
  }
}
