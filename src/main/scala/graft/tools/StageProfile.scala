package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Plain-run stage timing via SparkListener (no caching side effects).
  * Usage: StageProfile <cores> <repos> <files> <mpf> [staged]
  * The optional 5th arg profiles the STAGED canon path (emitTriples →
  * dedupTriples → canonicalizeTriples, as the bench headline times it)
  * instead of the fused one. */
object StageProfile {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // locale-safe f"%.3f" JSON
    val staged = args.length > 4 && args(4) == "staged"
    val Array(cores, repos, files, mpf) = args.take(4).map(_.toInt)
    val cfg = graft.pipeline.Corpus.Config(
      nRepos = repos, baseFilesPerRepo = files, mentionsPerFile = mpf)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def job(): Long =
      if (staged) {
        import spark.implicits._
        val dictNames = (0 until cfg.nEntities).map(graft.pipeline.Corpus.entityName)
        val dict = spark.sparkContext.broadcast(dictNames.toSet)
        val files = graft.pipeline.Corpus.generate(spark, cfg)
        val mentions = graft.pipeline.Kg.detectMentions(files, dict)
        val linked = graft.pipeline.Kg.linkMentions(mentions, dictNames.toDF("name"))
        val aliases = graft.pipeline.Kg.detectAliases(files)
        val cc = graft.pipeline.Kg.connectedComponents(dictNames.toDF("name"), aliases)
        val triples = graft.pipeline.Kg.dedupTriples(
          graft.pipeline.Kg.emitTriples(linked, cc))
        graft.pipeline.Kg.canonicalizeTriples(triples)
          .filter(_.status == "ok").count()
      } else ScalingBench.runJob(spark, cfg)

    job() // warm-up

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val dur = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        val taskTime = si.taskMetrics.executorRunTime
        val gc = si.taskMetrics.jvmGCTime
        val deser = si.taskMetrics.executorDeserializeTime
        val shufW = si.taskMetrics.shuffleWriteMetrics.writeTime / 1000000L
        val shufMB = si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1e6
        val label = si.name.take(40) +
          f" gc=${gc / 1000.0}%.1f deser=${deser / 1000.0}%.1f shufW=${shufW / 1000.0}%.1f shufMB=$shufMB%.1f"
        stages.add((si.stageId, label, dur, si.numTasks, taskTime))
      }
    })
    val t0 = System.nanoTime()
    val ok = job()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"== cores=$cores wall=$wall%.2f ok=$ok")
    var sumDur = 0L
    var sumTask = 0L
    stages.forEach { case (id, name, dur, nt, tt) =>
      println(f"stage $id%4d $name%-75s wall=${dur / 1000.0}%7.2f s  tasks=$nt%4d  taskTime=${tt / 1000.0}%8.2f s")
      sumDur += dur; sumTask += tt
    }
    println(f"== sum(stage wall)=${sumDur / 1000.0}%.2f s  sum(taskTime)=${sumTask / 1000.0}%.2f core-s")
    spark.stop()
  }
}
