package graft.tools

import graft.pipeline.{Corpus, KgPipeline}
import graft.spark.CanonEngine

/** Drive the KG-construction pipeline end-to-end on the deterministic
  * synthetic corpus.
  *
  * Usage: PipelineCli <workDir> [--repos N] [--files N] [--entities N]
  *                    [--cores N]
  * Re-running with the same workDir resumes from the snapshot
  * manifest (completed stages are skipped).
  */
object PipelineCli {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // locale-safe f"%.3f" JSON
    if (args.isEmpty) { System.err.println("usage: PipelineCli <workDir> [--repos N] [--files N] [--entities N] [--cores N]"); sys.exit(2) }
    val workDir = args(0)
    def opt(name: String, dflt: Int): Int =
      args.sliding(2).collectFirst { case Array(`name`, v) => v.toInt }.getOrElse(dflt)
    val cfg = Corpus.Config(
      nRepos = opt("--repos", 20),
      baseFilesPerRepo = opt("--files", 10),
      nEntities = opt("--entities", 128))
    val cores = opt("--cores", 8)

    val spark = CanonEngine.session(s"local[$cores]", shufflePartitions = cores)
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val report = KgPipeline.run(spark, workDir, cfg)
    val secs = (System.nanoTime() - t0) / 1e9

    report.stages.foreach { s =>
      println(f"stage ${s.name}%-10s rows=${s.rows}%8d ${if (s.skipped) "SKIPPED (resume)" else "ran"}")
    }
    println(f"precision=${report.precision}%.4f recall=${report.recall}%.4f")
    println(s"graphs ok=${report.okGraphs}/${report.totalGraphs}")
    println(f"wall=${secs}%.1f s  throughput=${report.totalGraphs / secs}%.2f graphs/s")
    val pass = report.precision >= 0.95 && report.recall >= 0.95 &&
      report.okGraphs == report.totalGraphs
    println(if (pass) "PIPELINE OK" else "PIPELINE FAILED")
    spark.stop()
    if (!pass) sys.exit(1)
  }
}
