package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase-level wall-clock profile of the scaling job: materializes
  * each phase via localCheckpoint so the next phase does not
  * recompute upstream lineage, and prints per-phase seconds.
  * Usage: ProfilePipeline <cores> <nRepos> <files> <mpf>
  */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val Array(cores, repos, files, mpf) = args.map(_.toInt)
    val cfg = graft.pipeline.Corpus.Config(
      nRepos = repos, baseFilesPerRepo = files, mentionsPerFile = mpf)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // warm-up
    ScalingBench.runJob(spark, cfg.copy(nRepos = math.max(8, repos / 10)))
    println("[profile] ---- measured ----")
    val t0 = System.nanoTime()

    val dictNames = (0 until cfg.nEntities).map(graft.pipeline.Corpus.entityName)
    val dict = spark.sparkContext.broadcast(dictNames.toSet)
    val filesDf = phase("corpus")(
      graft.pipeline.Corpus.generate(spark, cfg).toDF().localCheckpoint())
    val mentions = phase("mentions")(
      graft.pipeline.Kg.detectMentions(filesDf.as[graft.pipeline.FileRow], dict)
        .toDF().localCheckpoint())
    val linked = phase("links")(
      graft.pipeline.Kg.linkMentions(
        mentions.as[graft.pipeline.Mention], dictNames.toDF("name"))
        .toDF().localCheckpoint())
    val aliases = phase("aliases")(
      graft.pipeline.Kg.detectAliases(filesDf.as[graft.pipeline.FileRow])
        .toDF().localCheckpoint())
    val cc = phase("cc")(
      graft.pipeline.Kg.connectedComponents(
        dictNames.toDF("name"), aliases.as[graft.pipeline.AliasEdge])
        .localCheckpoint())
    val triples = phase("triples")(
      graft.pipeline.Kg.dedupTriples(graft.pipeline.Kg.emitTriples(
        linked.as[graft.pipeline.LinkedMention], cc)).localCheckpoint())
    val n = phase("canon")(
      graft.pipeline.Kg.canonicalizeTriples(triples)
        .filter(_.status == "ok").count())
    println(f"[profile] TOTAL        ${(System.nanoTime() - t0) / 1e9}%8.2f s  ok=$n  triples=${triples.count()}")
    spark.stop()
  }
}
