package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Incremental per-repo recanonicalization — the operational story at
  * 100 TB: a daily snapshot changes a sliver of repositories, so the
  * expensive stages (mention scan, link join, RDFC-1.0 kernel) must
  * run on exactly that sliver, never the corpus.
  *
  * Change detection:
  *  - per-repo input fingerprint = order-insensitive xor of
  *    xxhash64(path, content_sha) over the repo's files — one cheap
  *    columnar aggregation over the scan, no content reads beyond
  *    the already-materialized sha column;
  *  - a GLOBAL connected-components fingerprint guards correctness:
  *    alias edges from ANY repo can merge entities and thereby change
  *    blank-node labels inside UNCHANGED repos, so if the canonical
  *    entity map differs at all from the previous run the increment
  *    degrades (soundly) to a full recompute. In practice the
  *    dictionary-sized map is stable across snapshots.
  *
  * Unchanged repos carry their previous canonical output forward
  * untouched; deleted repos drop out (state inner-joins the current
  * snapshot's repo set). `IncrementalSpec` pins
  * incremental == from-scratch byte equality.
  */
object Incremental {

  /** (repo, fingerprint) for the current snapshot. bit_xor is the
    * order-insensitive, overflow-free combiner (ANSI mode rejects a
    * wrapping sum); paths are unique per repo, so xor cannot cancel. */
  def fingerprints(files: Dataset[FileRow]): DataFrame =
    files.toDF().groupBy("repo")
      .agg(expr("bit_xor(xxhash64(path, content_sha))").as("fingerprint"))

  /** Order-insensitive fingerprint of the canonical entity map. */
  def canonMapFingerprint(canonMap: DataFrame): Long = {
    val r = canonMap.agg(expr("bit_xor(xxhash64(entity, canonical))")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Result of one incremental run. `fresh` rows were recomputed,
    * `reused` rows carried forward; `state` is the full new snapshot
    * state (the table to persist for the next increment). */
  final case class Increment(ccFingerprint: Long, fresh: DataFrame, reused: DataFrame) {
    def state: DataFrame = fresh.unionByName(reused)
  }

  /** Canonicalize the snapshot incrementally against `prev` =
    * (previous ccFingerprint, previous state) from the last run; pass
    * None for the bootstrap (everything fresh). */
  def run(files: Dataset[FileRow], dictNames: Seq[String],
          prev: Option[(Long, DataFrame)],
          opts: graft.canon.CanonOptions = graft.canon.CanonOptions.default): Increment = {
    val spark = files.sparkSession
    import spark.implicits._
    val dictBc = spark.sparkContext.broadcast(dictNames.toSet)
    val dictDf = dictNames.toDF("name")

    val cc = Kg.connectedComponents(dictDf, Kg.detectAliases(files))
    val ccFp = canonMapFingerprint(cc)
    val fps = fingerprints(files)

    val changed: DataFrame = prev match {
      case Some((prevCcFp, prevState)) if prevCcFp == ccFp =>
        fps.join(
            prevState.select(col("repo"), col("fingerprint").as("prev_fp")),
            Seq("repo"), "left")
          .where(col("prev_fp").isNull || col("prev_fp") =!= col("fingerprint"))
          .select("repo", "fingerprint")
      case _ =>
        // no previous state, or the entity map moved: full recompute
        fps
    }

    // the expensive stages see ONLY the changed repos' files
    val changedFiles = files.toDF()
      .join(changed.select("repo"), Seq("repo"), "left_semi")
      .as[FileRow]
    val linked = Kg.linkMentions(Kg.detectMentions(changedFiles, dictBc), dictDf)
    val fresh = Kg.canonicalizeFromMentions(linked, cc, opts).toDF()
      .withColumnRenamed("key", "repo")
      .join(changed, Seq("repo"))
      .select("repo", "fingerprint", "status", "quadCount", "bnodeCount",
        "outputSha256", "canonicalNQuads")

    val reused: DataFrame = prev match {
      case Some((prevCcFp, prevState)) if prevCcFp == ccFp =>
        prevState
          .join(changed.select("repo"), Seq("repo"), "left_anti")
          .join(fps.select("repo"), Seq("repo"), "left_semi") // drop deleted repos
          .select("repo", "fingerprint", "status", "quadCount", "bnodeCount",
            "outputSha256", "canonicalNQuads")
      case _ => spark.emptyDataFrame
          .withColumn("repo", lit("")).limit(0)
          .select(lit("").as("repo"), lit(0L).as("fingerprint"),
            lit("").as("status"), lit(0L).as("quadCount"),
            lit(0).as("bnodeCount"), lit("").as("outputSha256"),
            lit("").as("canonicalNQuads"))
    }

    Increment(ccFp, fresh, reused)
  }
}
