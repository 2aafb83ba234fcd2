package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level profile of one SparkEntry query (SparkListener; no
  * caching side effects): wall, task-time, GC and shuffle bytes per
  * stage, after one untimed warm-up run.
  *
  *   QProfile <sfDir> <queryName> [cores]
  */
object QProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("q21_ngram_jaccard")
    val cores = args.lift(2).getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries.getOrElse(name, sys.error(s"unknown $name"))
    fn(spark, sfDir).count() // warm-up

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val dur = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        val tt = si.taskMetrics.executorRunTime / 1000.0
        val gc = si.taskMetrics.jvmGCTime / 1000.0
        val sw = si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1e6
        val sr = si.taskMetrics.shuffleReadMetrics.totalBytesRead / 1e6
        stages.add(
          f"stage ${si.stageId}%4d tasks=${si.numTasks}%4d wall=${dur / 1000.0}%6.2f s task=${tt}%7.2f s gc=$gc%5.1f shufW=$sw%7.1f MB shufR=$sr%7.1f MB  ${si.name.take(50)}")
      }
    })
    val t0 = System.nanoTime()
    val rows = fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"== $name rows=$rows wall=$wall%.2f s")
    stages.forEach(println)
    spark.stop()
  }
}
