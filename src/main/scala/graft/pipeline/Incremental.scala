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
  * State is CONTENT-ADDRESSED: the per-repo state rows carry only
  * `outputSha256` (plus small metrics); the canonical N-Quads
  * documents live once in a separate `(outputSha256, canonicalNQuads)`
  * doc store keyed by their own sha. An increment therefore writes
  * large strings only for freshly produced documents — carrying an
  * unchanged repo forward moves a fixed-width row, never its
  * multi-KB canonical text (the round-2 design rewrote every reused
  * document's string through each state union). [[Increment.resolve]]
  * joins the text back on demand; `IncrementalSpec` pins
  * incremental == from-scratch byte equality through that join.
  *
  * Unchanged repos carry their previous state rows forward untouched;
  * deleted repos drop out (state inner-joins the current snapshot's
  * repo set). The doc store is append-only garbage: orphaned documents
  * can be vacuumed by an occasional anti-join against state — never on
  * the increment's critical path.
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

  private val StateCols =
    Seq("repo", "fingerprint", "status", "quadCount", "bnodeCount", "outputSha256")

  /** Result of one incremental run. `fresh` rows were recomputed,
    * `reused` rows carried forward — both WITHOUT document bodies;
    * `state` is the full new snapshot state (the table to persist for
    * the next increment). `newDocs` holds the (outputSha256,
    * canonicalNQuads) pairs produced by THIS increment — append them
    * to the content-addressed doc store via [[appendDocs]].
    * `aliases` is the repo-attributed alias edge set for THIS
    * snapshot — persist it alongside `state` and pass it back as
    * `prevAliases` so the next increment's alias scan is O(changed)
    * instead of a full corpus content scan (see [[run]]). */
  final case class Increment(ccFingerprint: Long, fresh: DataFrame,
                             reused: DataFrame, newDocs: DataFrame,
                             aliases: DataFrame) {
    def state: DataFrame = fresh.unionByName(reused)
  }

  /** (repo, src, dst) alias edges — the repo-attributed variant of
    * `Kg.detectAliases`, so edges of unchanged repos can be carried
    * forward by fingerprint instead of re-scanned: alias facts are a
    * pure function of repo content, and an unchanged fingerprint
    * means unchanged content. */
  def aliasEdgesByRepo(files: Dataset[FileRow]): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.mapPartitions { it =>
      val re = Kg.AliasRe
      it.flatMap { f =>
        val m = re.matcher(f.content)
        val out = Vector.newBuilder[(String, String, String)]
        while (m.find()) out += ((f.repo, m.group(1), m.group(2)))
        out.result()
      }
    }.toDF("repo", "src", "dst").dropDuplicates("repo", "src", "dst")
  }

  /** Content-addressed append: only shas the store has not seen are
    * written (idempotent under replay). The delta is anti-joined
    * against the store's sha COLUMN — the store's document bodies are
    * never shuffled or rewritten, so an increment's append cost is
    * O(delta bodies + store keys), not O(store) (the previous
    * union+dropDuplicates re-deduped the whole store, bodies and all,
    * on every increment). */
  def appendDocs(store: DataFrame, newDocs: DataFrame): DataFrame = {
    val unseen = newDocs.dropDuplicates("outputSha256")
      .join(store.select("outputSha256"), Seq("outputSha256"), "left_anti")
    store.unionByName(unseen)
  }

  /** Orphan GC for the append-only doc store: keep exactly the
    * documents some live state row still references (left-semi on the
    * sha — one key-only shuffle, bodies move only into the surviving
    * output). Runs OFF the increment's critical path, occasionally —
    * orphans are only ever garbage, never a correctness issue, because
    * [[resolve]] joins BY sha and unreferenced shas can't be joined. */
  def vacuum(store: DataFrame, state: DataFrame): DataFrame =
    store.join(state.select("outputSha256").distinct(),
      Seq("outputSha256"), "left_semi")

  /** Join document bodies back onto state rows (broadcast-free: both
    * sides shuffle on the sha — at scale the doc store is as large as
    * the corpus output). Only ok-status rows have a document. */
  def resolve(state: DataFrame, docStore: DataFrame): DataFrame =
    state.join(docStore, Seq("outputSha256"), "left")
      .select((StateCols :+ "canonicalNQuads").map(col): _*)

  /** Canonicalize the snapshot incrementally against `prev` =
    * (previous ccFingerprint, previous state) from the last run; pass
    * None for the bootstrap (everything fresh).
    *
    * `prevAliases` (the previous run's [[Increment.aliases]]) makes
    * the alias scan itself incremental: without it every increment
    * pays one full-corpus CONTENT scan just to rebuild the global
    * entity map for the soundness guard — measured at 20k synthetic
    * repos that scan canceled the entire kernel saving
    * (IncrementalBench: increment 4.4 s vs bootstrap 3.8 s). With it,
    * only changed repos' content is scanned; unchanged repos' edges
    * carry forward BY FINGERPRINT (alias facts are a pure function of
    * content, and an unchanged fingerprint means unchanged content),
    * deleted repos' edges drop out, and the resulting global entity
    * map is identical to a full rescan — so the ccFingerprint guard
    * retains exactly its old semantics. */
  def run(files: Dataset[FileRow], dictNames: Seq[String],
          prev: Option[(Long, DataFrame)],
          opts: graft.canon.CanonOptions = graft.canon.CanonOptions.default,
          prevAliases: Option[DataFrame] = None): Increment = {
    val spark = files.sparkSession
    import spark.implicits._
    val dictBc = spark.sparkContext.broadcast(dictNames.toSet)
    val dictDf = dictNames.toDF("name")

    // per-repo fingerprints: one row per repo, consumed by FOUR
    // downstream paths (changed detection, the alias carry joins, the
    // reused semi-join, and — on bootstrap — the fresh join). Without
    // materialization each consumer re-runs the corpus-wide groupBy;
    // localCheckpoint computes it once (eager, tiny table).
    val fps = fingerprints(files).localCheckpoint()

    // fingerprint-changed repos (independent of the entity map)
    val changedByFp: DataFrame = prev match {
      case Some((_, prevState)) =>
        fps.join(
            prevState.select(col("repo"), col("fingerprint").as("prev_fp")),
            Seq("repo"), "left")
          .where(col("prev_fp").isNull || col("prev_fp") =!= col("fingerprint"))
          .select("repo", "fingerprint")
      case None => fps
    }

    // alias edges: dictionary-scale, consumed by the CC probes/collect
    // (several jobs) and returned as carried state — materialized once
    // so the content scan (or the carry joins) never re-executes
    // Repo-NAME lists are broadcast-hinted wherever they gate a
    // corpus-side semi-join: a name list is orders of magnitude
    // smaller than the content rows it filters at ANY corpus scale,
    // but the planner cannot see that through a localCheckpoint
    // boundary and falls back to a sort-merge join that shuffles the
    // whole content column — measured at 2000 padded repos (~550 MB
    // content) as a 22 s increment vs 3.5 s with the hint.
    val aliases: DataFrame = ((prev, prevAliases) match {
      case (Some(_), Some(prevA)) =>
        val changedRepos = changedByFp.select("repo")
        val changedFilesA = files.toDF()
          .join(broadcast(changedRepos), Seq("repo"), "left_semi").as[FileRow]
        prevA
          .join(broadcast(changedRepos), Seq("repo"), "left_anti") // stale edges of changed repos
          .join(broadcast(fps.select("repo")), Seq("repo"), "left_semi") // deleted repos drop
          .unionByName(aliasEdgesByRepo(changedFilesA))
      case _ => aliasEdgesByRepo(files)
    }).localCheckpoint()
    val cc = Kg.connectedComponents(dictDf,
      aliases.select("src", "dst").dropDuplicates("src", "dst").as[AliasEdge])
    val ccFp = canonMapFingerprint(cc)

    val changed: DataFrame = prev match {
      case Some((prevCcFp, _)) if prevCcFp == ccFp => changedByFp
      case _ =>
        // no previous state, or the entity map moved: full recompute
        fps
    }

    // the expensive stages see ONLY the changed repos' files; when
    // EVERYTHING is fresh (bootstrap / entity-map move: `changed` is
    // the fps reference itself) the semi-join is a no-op — skip it
    // rather than broadcast the full repo list for nothing.
    // Deployment note: this filter prunes ROWS after the scan; to
    // avoid READING unchanged content bytes at all, store the corpus
    // partitioned by repo bucket — the broadcast semi-join on the
    // partitioning column then triggers dynamic partition pruning and
    // unchanged partitions are never fetched from storage.
    val changedFiles =
      if (changed eq fps) files
      else files.toDF()
        .join(broadcast(changed.select("repo")), Seq("repo"), "left_semi")
        .as[FileRow]
    val linked = Kg.linkMentions(Kg.detectMentions(changedFiles, dictBc), dictDf)
    val freshFull = Kg.canonicalizeFromMentions(linked, cc, opts).toDF()
      .withColumnRenamed("key", "repo")
      .join(changed, Seq("repo"))
      .localCheckpoint() // computed once; consumed by fresh AND newDocs
    val fresh = freshFull.select(StateCols.map(col): _*)
    val newDocs = freshFull
      .where(col("status") === "ok")
      .select("outputSha256", "canonicalNQuads")
      .dropDuplicates("outputSha256")

    val reused: DataFrame = prev match {
      case Some((prevCcFp, prevState)) if prevCcFp == ccFp =>
        prevState
          .join(broadcast(changed.select("repo")), Seq("repo"), "left_anti")
          .join(broadcast(fps.select("repo")), Seq("repo"), "left_semi") // drop deleted repos
          .select(StateCols.map(col): _*)
      case _ =>
        spark.emptyDataFrame.limit(0)
          .select(lit("").as("repo"), lit(0L).as("fingerprint"),
            lit("").as("status"), lit(0L).as("quadCount"),
            lit(0).as("bnodeCount"), lit("").as("outputSha256"))
    }

    Increment(ccFp, fresh, reused, newDocs, aliases)
  }
}
