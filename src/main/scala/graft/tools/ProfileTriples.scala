package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Drill into the triples+canon phases. Usage: <cores> <repos> <files> <mpf> */
object ProfileTriples {
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
      println(f"[p] $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val dictNames = (0 until cfg.nEntities).map(graft.pipeline.Corpus.entityName)
    val dict = spark.sparkContext.broadcast(dictNames.toSet)
    val filesDf = graft.pipeline.Corpus.generate(spark, cfg).toDF().localCheckpoint()
    val mentions = graft.pipeline.Kg.detectMentions(
      filesDf.as[graft.pipeline.FileRow], dict).toDF().localCheckpoint()
    val linked = graft.pipeline.Kg.linkMentions(
      mentions.as[graft.pipeline.Mention], dictNames.toDF("name")).toDF().localCheckpoint()
    val aliases = graft.pipeline.Kg.detectAliases(
      filesDf.as[graft.pipeline.FileRow]).toDF().localCheckpoint()
    val cc = graft.pipeline.Kg.connectedComponents(
      dictNames.toDF("name"), aliases.as[graft.pipeline.AliasEdge]).localCheckpoint()
    println("[p] --- inputs ready ---")

    val emit = graft.pipeline.Kg.emitTriples(
      linked.as[graft.pipeline.LinkedMention], cc)
    phase("emit.count")(println("  rows=" + emit.count()))
    val emitCp = phase("emit.checkpoint")(emit.localCheckpoint())
    val dedup = graft.pipeline.Kg.dedupTriples(emitCp)
    phase("dedup.count")(println("  rows=" + dedup.count()))
    val dedupCp = phase("dedup.checkpoint")(dedup.localCheckpoint())
    phase("canon")(println("  ok=" +
      graft.pipeline.Kg.canonicalizeTriples(dedupCp).filter(_.status == "ok").count()))
    // second canon run (warm)
    phase("canon.warm")(println("  ok=" +
      graft.pipeline.Kg.canonicalizeTriples(dedupCp).filter(_.status == "ok").count()))
    spark.stop()
  }
}
