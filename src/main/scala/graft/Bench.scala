package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: all SparkEntry operators on
  * SPARK_GRAFT_SF_DIR, plus a canonicalization-throughput headline
  * (the BASELINE.md metric: graphs/sec over a synthetic corpus).
  * Prints exactly ONE JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      results(name) = try time(fn(spark, sfDir).count())
      catch { case _: Throwable => -1.0 }
    }

    // headline: canonical N-Quads throughput (graphs/sec) on the
    // synthetic KG corpus (see BASELINE.md)
    val cfg = graft.pipeline.Corpus.Config(
      nRepos = 400, baseFilesPerRepo = 12, mentionsPerFile = 8)
    import spark.implicits._
    val dictNames = (0 until cfg.nEntities).map(graft.pipeline.Corpus.entityName)
    val dict = spark.sparkContext.broadcast(dictNames.toSet)
    def inputs() = {
      val files = graft.pipeline.Corpus.generate(spark, cfg)
      val mentions = graft.pipeline.Kg.detectMentions(files, dict)
      val linked = graft.pipeline.Kg.linkMentions(mentions, dictNames.toDF("name"))
      val aliases = graft.pipeline.Kg.detectAliases(files)
      val cc = graft.pipeline.Kg.connectedComponents(dictNames.toDF("name"), aliases)
      (linked, cc)
    }
    val stagedSecs = time {
      val (linked, cc) = inputs()
      val triples = graft.pipeline.Kg.dedupTriples(
        graft.pipeline.Kg.emitTriples(linked, cc))
      val n = graft.pipeline.Kg.canonicalizeTriples(triples)
        .filter(_.status == "ok").count()
      require(n == cfg.nRepos, s"canon bench: $n/${cfg.nRepos} graphs ok")
    }
    results("canon_staged_400graphs") = stagedSecs
    val canonSecs = time {
      val (linked, cc) = inputs()
      val n = graft.pipeline.Kg.canonicalizeFromMentions(linked, cc)
        .filter(_.status == "ok").count()
      require(n == cfg.nRepos, s"canon bench: $n/${cfg.nRepos} graphs ok")
    }
    results("canon_fused_400graphs") = canonSecs

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","graphs_per_sec":${cfg.nRepos / canonSecs}%.2f}""")
    spark.stop()
  }
}
