package graft.ops


import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Deduplication operators for training-data pipelines.
  *
  * Scale shape: every variant is a shuffle-on-key + per-bucket local
  * work — never a global cross join. Candidate generation (LSH bands /
  * simhash chunks / shared rare shingles) bounds pair enumeration to
  * same-bucket pairs; exact verification runs only on candidates.
  * Hot buckets (boilerplate / identical-content corpora) are guarded:
  * buckets larger than `maxBucket` degrade from all-pairs to STAR
  * candidates (every member ↔ the bucket's min id) — O(n) instead of
  * O(n²) while preserving duplicate-cluster connectivity.
  *
  * Signature computation (shingles, minhash, simhash) runs as typed
  * per-partition JVM kernels: these are tight per-row loops where
  * interpreted higher-order Column functions cost 50-100x; the
  * relational parts — banding, bucket joins, verification — stay
  * DataFrame so Catalyst plans the shuffles.
  *
  * Hashing is MD5-based and PORTABLE: `md5(x)` exists verbatim in
  * DuckDB, so every similarity value this module emits can be
  * recomputed independently by the SQL oracle (SparkEntry.oracleSql)
  * — and MD5 is collision-free at any realistic corpus size, unlike
  * the 31-polynomial rolling hash it replaced.
  */
object Dedup {

  /** Operator-internal caching of diamond-consumed signature tables
    * (see [[LshUtil.maybePersist]]); disable with
    * `-Dgraft.ops.cache=false` for A/B measurement. */
  private def maybePersist(df: DataFrame): DataFrame = LshUtil.maybePersist(df)

  /** Exact dedup: hash-groupBy on normalized content, keep the
    * smallest id as survivor. One shuffle on the content hash. */
  def exact(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val norm = lower(regexp_replace(col(textCol), lit("\\s+"), lit(" ")))
    docs.withColumn("content_key", sha2(norm, 256))
      .groupBy("content_key")
      .agg(min(col(idCol)).as("survivor_id"),
        count(lit(1)).as("dup_count"))
  }

  private def mix64(x0: Long): Long = graft.pipeline.Corpus.mix64(x0)

  /** First 8 bytes of MD5(s), big-endian (see [[LshUtil.md5Long]]). */
  def md5Long(s: String): Long = LshUtil.md5Long(s)

  private val WsRe = java.util.regex.Pattern.compile("\\s+")

  /** Distinct k-gram shingle hashes of the normalized text, sorted.
    * Shingle id = md5Long of the k-char window. Primitive kernel
    * (round 6): hashes go into a long[] sorted + deduped in place,
    * and each window is digested via [[LshUtil.md5LongRange]] — the
    * previous TreeSet[java.lang.Long] + substring + getBytes path
    * allocated ~120 B per window (boxed node + String + byte[]),
    * millions of times per task across the three consumers of the
    * shingle table. Output is bit-identical (sorted distinct longs). */
  def shingleHashes(text: String, k: Int = 5): Array[Long] = {
    val norm = WsRe.matcher(text.toLowerCase).replaceAll(" ")
    if (norm.length < k) return Array(md5Long(norm))
    val n = norm.length - k + 1
    val arr = new Array[Long](n)
    var i = 0
    while (i < n) { arr(i) = LshUtil.md5LongRange(norm, i, k); i += 1 }
    java.util.Arrays.sort(arr)
    var w = 0
    var r = 1
    while (r < n) {
      if (arr(r) != arr(w)) { w += 1; arr(w) = arr(r) }
      r += 1
    }
    if (w + 1 == n) arr else java.util.Arrays.copyOf(arr, w + 1)
  }

  /** (id, shingles[]) — typed kernel, sorted distinct hashes.
    * Diamond-consumed (df count, prefix window, candidate join, both
    * verify sides) — recomputed per consumer by default, which the
    * sf1 A/B measured as FASTER than caching (see
    * [[LshUtil.maybePersist]] for the numbers and the opt-in). */
  private def withShingles(docs: DataFrame, idCol: String, textCol: String,
                           k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // explicit hash(id) exchange so every consumer — banding/postings
    // AND both exact-verify join sides (which join on aliased id and
    // inherit this partitioning through the alias) — reuses ONE
    // computation of the shingle kernel instead of re-scanning and
    // re-hashing the corpus per subtree (same ReuseExchange pattern as
    // the inverted-postings repartition; kernel cost dominates at sf1)
    val numParts = spark.sessionState.conf.numShufflePartitions
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => (id, shingleHashes(text, k)) })
      .toDF("id", "sh")
      .repartition(numParts, col("id"))
      .transform(maybePersist)
  }

  /** Exact Jaccard on two sorted long arrays (merge intersect). */
  def jaccardSorted(a: Array[Long], b: Array[Long]): Double = {
    var i = 0; var j = 0; var common = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { common += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    common.toDouble / (a.length + b.length - common)
  }

  /** [[jaccardSorted]] with a threshold early-exit: returns the EXACT
    * jaccard for any pair that completes the merge, and -1.0 as soon
    * as the remaining elements provably cannot reach `threshold`
    * (common + min(remaining) below a conservative floor of the
    * required intersection size). A pair at or above the threshold can
    * never take the exit, so the verify filter emits the identical
    * (pair, jaccard) set — but the dissimilar majority of candidates
    * stops after a fraction of the merge (the verify stage was the
    * single largest slice of q21 at sf1: ~7k merge steps per pair,
    * most pairs nowhere near the threshold). */
  def jaccardSortedMin(a: Array[Long], b: Array[Long], threshold: Double): Double = {
    val la = a.length
    val lb = b.length
    // c / (la + lb - c) >= t  <=>  c >= t * (la + lb) / (1 + t);
    // floor() errs conservative (may scan slightly longer, never exits
    // on a pair that could still qualify)
    val need = math.floor(threshold * (la + lb) / (1.0 + threshold)).toInt
    var i = 0; var j = 0; var common = 0
    while (i < la && j < lb) {
      if (a(i) == b(j)) { common += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
      val remA = la - i
      val remB = lb - j
      if (common + (if (remA < remB) remA else remB) < need) return -1.0
    }
    common.toDouble / (la + lb - common)
  }

  private def bucketPairs(buckets: DataFrame, keys: Seq[String],
                          maxBucket: Int): DataFrame =
    LshUtil.bucketPairs(buckets, keys, maxBucket)

  /** Full inverted postings (id, n = |doc's shingle set|, shingle). */
  private def invertedPostings(sh: DataFrame): DataFrame =
    sh.select(col("id"), size(col("sh")).as("n"),
      explode(col("sh")).as("shingle"))

  /** PREFIX postings (the exact prefix-filtering principle of
    * All-Pairs / PPJoin / SSJoin): under a global shingle order —
    * (document frequency asc, shingle asc), i.e. rarest first — any
    * two sets with Jaccard >= t must share an element inside BOTH
    * prefixes of length |s| - ceil(t*|s|) + 1. Indexing only prefixes
    * is therefore LOSSLESS for the threshold join, and because the
    * prefix keeps each doc's rarest shingles, hot shingles nearly
    * vanish from the index: candidate work drops from
    * sum(df^2 over all shingles) to sum(prefix-df^2) — the round-3
    * sf1 bench measured the full-index variant going superlinear
    * (88 s at 10x rows) exactly through that df shift. Two extra
    * narrow shuffles (df join + per-doc rank, both spillable) buy a
    * quadratically smaller pair stage.
    *
    * `dfc` is the FULL per-shingle document-frequency table (computed
    * once by the caller and shared with the rare/over-df split, so the
    * cap semantics cannot drift between plans). A doc's prefix is a
    * DOWN-SET of the global order restricted to its shingles: if any
    * shared shingle of a pair is in both prefixes (guaranteed for
    * Jaccard >= t), then in particular the pair's RAREST shared
    * shingle is — the fact the plan-equivalence proof in
    * [[ngramJaccardPairs]] rests on. */
  private def prefixPostings(inverted: DataFrame, dfc: DataFrame,
                             threshold: Double): DataFrame = {
    // the df tie-break must be the UNSIGNED shingle order (= md5-hex
    // string order, which the DuckDB oracle uses): flip the sign bit
    val w = Window.partitionBy("id")
      .orderBy(col("df"), col("shingle").bitwiseXOR(lit(Long.MinValue)))
    // keeps the full-df column: the rare/over split and the stats
    // aggregates are plain predicates on it, so consumers never join
    // back to the df table (cache optional — see LshUtil.maybePersist)
    inverted.join(dfc, "shingle")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select("id", "shingle", "df", "rn", "n")
      .transform(maybePersist)
  }

  /** Bytes-per-document divisor for the size-based plan gate below:
    * deliberately BELOW the measured density (the sf0.1 documents
    * table measures ~119 compressed bytes/doc), so the derived doc
    * count OVERestimates and errs toward the prefix plan — the plan
    * that stays subquadratic at scale. Erring the other way (a
    * too-large divisor undercounting docs, full plan past the
    * threshold) re-opens the superlinear regime the sf1 bench
    * measured at 88 s vs 16 s; erring this way merely costs the
    * ~1.5 s prefix constant. */
  private val EstBytesPerDoc = 64L

  /** Estimated document count WITHOUT running a count() job: caller
    * hint if given, else Catalyst's row-count statistic when known
    * (LocalRelation, CBO), else plan sizeInBytes / [[EstBytesPerDoc]].
    * An unknown size propagates as Long.MaxValue → prefix plan. Since
    * the two plans emit the IDENTICAL pair set (see
    * [[ngramJaccardPairs]]), a misestimate is a pure performance
    * trade, never a correctness one. */
  private def estimatedDocs(docs: DataFrame, hint: Long): Long =
    if (hint >= 0L) hint
    else {
      val stats = docs.queryExecution.optimizedPlan.stats
      stats.rowCount.map(_.min(BigInt(Long.MaxValue)).toLong).getOrElse {
        val sz = stats.sizeInBytes
        if (sz >= BigInt(Long.MaxValue)) Long.MaxValue
        else math.max(1L, sz.toLong / EstBytesPerDoc)
      }
    }

  /** n-gram Jaccard near-dup via a PREFIX-FILTERED inverted shingle
    * index: candidates = pairs sharing a prefix shingle whose FULL
    * document frequency lies in [2, maxDf], verified with EXACT
    * Jaccard over the full shingle sets. Prefix filtering is lossless
    * (see [[prefixPostings]]); the only recall cut is the maxDf cap,
    * and shingles past it no longer vanish silently (a duplicate
    * cluster larger than maxDf shares ONLY over-df shingles): each
    * over-df shingle contributes STAR candidates from the first maxDf
    * ids of its FULL posting list to its min id — bounded recall
    * recovery; the remaining bound is quantified by
    * [[ngramShingleStats]].
    *
    * ADAPTIVE plan choice: the prefix filter's two extra narrow
    * shuffles (df join + per-doc rank) cost a ~1.5 s constant that
    * only pays off once the pair stage would otherwise dominate — the
    * sf1 bench measured full-index 88 s vs prefix 16 s at 50k docs,
    * while at 5k docs prefix is pure overhead. Below `prefixMinDocs`
    * (decided from plan statistics — see [[estimatedDocs]]; pass
    * `numDocsHint` when the caller knows the cardinality; no count()
    * job either way) the FULL inverted index is used instead.
    *
    * The EMITTED SET is identical on either plan (pinned by two
    * OpsSpec properties, including one whose maxDf actually binds):
    *  - both plans split rare/over-df shingles on the SAME table —
    *    the full per-shingle df (the prefix plan needs it anyway for
    *    its global order, the full plan's posting groupBy IS it), so
    *    a shingle is never "rare" on one plan and "over" on the
    *    other (the round-4 defect: the cap applied to prefix-df on
    *    one plan and full-df on the other);
    *  - the over-df star is built from the FULL posting list on both
    *    plans — identical input, identical star pairs;
    *  - for the rare path, the prefix plan's candidates are a subset
    *    of the full plan's, but no TRUE pair is lost: a pair with
    *    Jaccard >= t sharing any rare shingle also has its RAREST
    *    shared shingle rare (df-ascending order), and that shingle is
    *    in both prefixes (prefix-filter lemma + prefixes are
    *    down-sets of the order — see [[prefixPostings]]), so the
    *    prefix plan emits the pair through it; every extra full-plan
    *    candidate below threshold dies in the exact verify.
    *
    * `prefixMinDocs = 0` forces the prefix plan; `Int.MaxValue`
    * forces the full index. Returns (id_a, id_b, jaccard),
    * id_a < id_b. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.8,
                        idCol: String = "doc_id", textCol: String = "text",
                        k: Int = 5, maxDf: Int = 100,
                        prefixMinDocs: Int = 20000,
                        numDocsHint: Long = -1L): DataFrame = {
    val sh = withShingles(docs, idCol, textCol, k)
    val usePrefix = prefixMinDocs == 0 ||
      (prefixMinDocs != Int.MaxValue &&
        estimatedDocs(docs, numDocsHint) >= prefixMinDocs)
    // three consumers (df count, prefix/full postings, over-df star)
    // used to re-explode the shingle arrays each (the broadcast-join
    // plans left no common exchange to reuse); an explicit shingle
    // repartition gives all of them ONE identical Exchange subtree
    // that ReuseExchange/AQE stage reuse collapses, so the shingle
    // kernel + explode run once per query instead of 3-4x.
    // -Dgraft.ops.cache=true persists a copy instead (recompute
    // measured FASTER at sf1 than the columnar cache — the round-3
    // negative result — so caching stays opt-in). Width pinned to the
    // session's shuffle-partition knob, not AQE's small-input floor:
    // every downstream join/groupBy of this operator runs on these
    // partitions.
    val numParts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val inverted = invertedPostings(sh)
      .repartition(numParts, col("shingle"))
      .transform(maybePersist)
    // FULL per-shingle document frequency — the single df table both
    // the plan gate's rare/over split and the prefix order use
    val dfc = inverted.groupBy("shingle").agg(count(lit(1)).as("df"))
    // both plans carry the FULL per-shingle df on the postings
    // (prefixPostings keeps it; the full plan joins it on the shared
    // shingle partitioning — no exchange), so the rare split below is
    // a plain predicate instead of a join back to the df table
    val pre =
      if (usePrefix) prefixPostings(inverted, dfc, threshold)
      else inverted.join(dfc, "shingle").select("id", "shingle", "df")
    // rare path: filter to in-cap shingles BEFORE collecting, so no
    // aggregation buffer ever exceeds maxDf entries
    val rare = pre.where(col("df") <= maxDf && col("df") >= 2)
    val cand =
      if (usePrefix) {
        // PPJoin POSITIONAL filter (lossless, prefix plan only — the
        // full plan has no rank column): a candidate survives iff SOME
        // generating shingle admits the overlap upper bound
        //   1 + min(n_a - rn_a, n_b - rn_b) >= floor(t*(n_a+n_b)/(1+t))
        // where rn is the shingle's 1-based position in the doc's
        // full (df asc, shingle unsigned asc) order and n the doc's
        // shingle count. Lossless: for a TRUE pair (jaccard >= t),
        // every shared shingle sorts at or after the pair's RAREST
        // shared shingle s in both docs, so at s the bound counts all
        // shared elements — 1 + min(...) >= overlap >= the floor()
        // requirement (same conservative floor as jaccardSortedMin) —
        // and s is in-cap and in both prefixes whenever the rare path
        // emits the pair at all (the down-set argument above), so the
        // pair is generated AT s and passes there. Pairs pruned here
        // provably fail the exact verify, so the emitted set is
        // unchanged (pinned by the brute-force and prefix==full
        // OpsSpec properties); what it buys is a smaller pair-dedup
        // shuffle and fewer verify-join merges.
        val lists = rare.groupBy("shingle")
          .agg(collect_list(struct(col("id"), col("rn"), col("n"))).as("ps"))
        val need = floor(lit(threshold) * (col("a.n") + col("b.n")) /
          lit(1.0 + threshold))
        lists
          .select(explode(col("ps")).as("a"), col("ps"))
          .select(col("a"), explode(col("ps")).as("b"))
          .where(col("a.id") < col("b.id") &&
            lit(1) + least(col("a.n") - col("a.rn"), col("b.n") - col("b.rn")) >= need)
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      } else {
        val lists = rare.groupBy("shingle").agg(collect_list("id").as("ids"))
        lists
          .select(explode(col("ids")).as("id_a"), col("ids"))
          .select(col("id_a"), explode(col("ids")).as("id_b"))
          .where(col("id_a") < col("id_b"))
      }
    // over-df recovery: star from the shingle's min id to its first
    // maxDf FULL-posting ids — windowed (sort-based, spillable), never
    // a collect_list of an unbounded posting list; built from the full
    // inverted postings on BOTH plans so the stars are identical
    val overKeys = dfc.where(col("df") > maxDf).select("shingle")
    val w = Window.partitionBy("shingle").orderBy("id")
    val star = inverted.select("id", "shingle").join(overKeys, "shingle")
      .withColumn("rn", row_number().over(w))
      .withColumn("hub", min("id").over(w)) // prefix min on sorted ids = global min
      .where(col("rn") <= maxDf + 1 && col("id") =!= col("hub"))
      .select(col("hub").as("id_a"), col("id").as("id_b"))
    verifyJaccard(
      cand.select("id_a", "id_b").union(star.select("id_a", "id_b"))
        .dropDuplicates("id_a", "id_b"),
      sh, threshold)
  }

  /** Recall instrumentation for [[ngramJaccardPairs]] (one row),
    * using the SAME full-df cap semantics as the pair join (and both
    * of its physical plans, which emit identical sets): distinct
    * prefix shingles, shingles over the FULL-df cap — the exact key
    * set the over-df star degrades (+ their total full posting mass =
    * candidate entries the star does not fully expand), and documents
    * with ZERO in-range prefix postings. Such
    * a doc's true pairs are reachable only through the over-df star
    * — if a true pair shared a rare (full-df <= maxDf) shingle, the
    * pair's rarest shared shingle would be rare and sit in both
    * prefixes (see [[ngramJaccardPairs]]), indexing the doc. That is
    * the documented recall bound, tied to ground truth by the OpsSpec
    * star-recall property. `threshold` must match the pair join being
    * instrumented. */
  def ngramShingleStats(docs: DataFrame, threshold: Double = 0.8,
                        idCol: String = "doc_id",
                        textCol: String = "text", k: Int = 5,
                        maxDf: Int = 100): DataFrame = {
    val sh = withShingles(docs, idCol, textCol, k)
    // same single-exchange sharing as ngramJaccardPairs (see there)
    val inverted = invertedPostings(sh)
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions,
        col("shingle"))
    val dfc = inverted.groupBy("shingle").agg(count(lit(1)).as("df"))
    val pre = prefixPostings(inverted, dfc, threshold)
    // three aggregation branches instead of the previous five-branch
    // shape (distinct-prefix count, over-df aggs, plus a sh-distinct
    // anti-join for the unindexed docs): n_docs_unindexed is counted
    // as (all docs) − (docs with an in-cap prefix posting) — every
    // doc has ≥ 1 shingle, so distinct ids over the postings ARE the
    // doc count. Same values, fewer stages (q28's sf0.1 cost was
    // stage-count latency, not compute).
    val preAgg = pre.agg(
      count_distinct(col("shingle")).as("n_shingles"),
      count_distinct(when(col("df") <= maxDf && col("df") >= 2, col("id")))
        .as("n_docs_indexed"))
    // over-df stats come from the GLOBAL df table — the same key set
    // the pair join's star path degrades, prefix-present or not
    val overAgg = dfc.agg(
      sum(when(col("df") > maxDf, 1L).otherwise(0L)).as("n_overdf"),
      sum(when(col("df") > maxDf, col("df")).otherwise(0L)).as("overdf_mass"))
    val docAgg = inverted.agg(count_distinct(col("id")).as("n_docs"))
    preAgg.crossJoin(overAgg).crossJoin(docAgg)
      .select(col("n_shingles"), col("n_overdf"), col("overdf_mass"),
        (col("n_docs") - col("n_docs_indexed")).as("n_docs_unindexed"))
  }

  private def verifyJaccard(cand: DataFrame, sh: DataFrame,
                            threshold: Double): DataFrame = {
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    // threshold-aware merge: exact value for every emitted pair,
    // early-exit (-1.0, filtered) for provably-below candidates
    val jUdf = udf((x: Array[Long], y: Array[Long]) =>
      jaccardSortedMin(x, y, threshold))
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("jaccard", jUdf(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signature from sorted shingle hashes: m pseudo-
    * permutations via seeded splitmix re-hash; sig(i) = min over
    * shingles of mix64(s ^ seed_i). (Not oracle-replicated — the LSH
    * stage only generates candidates; emitted pairs are defined by the
    * exact-Jaccard verify, which IS replicated in SQL.) */
  def minhashSig(sh: Array[Long], m: Int): Array[Long] = {
    val sig = Array.fill(m)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      var b = 0
      while (b < m) {
        val h = mix64(sh(i) ^ (b.toLong * 0x9E3779B97F4A7C15L))
        if (h < sig(b)) sig(b) = h
        b += 1
      }
      i += 1
    }
    sig
  }

  /** MinHash + LSH banding: `m` minhashes in `bands` bands; docs
    * sharing any band bucket are candidates (hot buckets degrade to
    * star pairs past `maxBucket`); candidates verified with exact
    * Jaccard on the full shingle sets. Two shuffles (bucket groupBy,
    * verify join) — no O(n²). */
  def minhashLshPairs(docs: DataFrame, threshold: Double = 0.8,
                      idCol: String = "doc_id", textCol: String = "text",
                      k: Int = 5, m: Int = 32, bands: Int = 8,
                      maxBucket: Int = 2000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = m / bands
    val sh = withShingles(docs, idCol, textCol, k)
    val banded = sh.as[(Long, Array[Long])]
      .mapPartitions(_.flatMap { case (id, s) =>
        val sig = minhashSig(s, m)
        (0 until bands).iterator.map { b =>
          var h = b.toLong
          var r = 0
          while (r < rows) { h = mix64(h ^ sig(b * rows + r)); r += 1 }
          (id, b, h)
        }
      }).toDF("id", "band", "bucket")
    verifyJaccard(bucketPairs(banded, Seq("band", "bucket"), maxBucket),
      sh, threshold)
  }

  /** 64-bit SimHash over whitespace tokens (typed kernel). Bit b of
    * token hash = bit (3 - b%4) of hex digit b/4 of md5(token) —
    * exactly reproducible in SQL from `md5(tok)`. Sim bit b is set
    * when a majority of tokens have it set. */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    val toks = text.toLowerCase.split(" +")
    var t = 0
    while (t < toks.length) {
      val w = md5Long(toks(t)) // bit b (hex order) = bit 63-b of w
      var b = 0
      while (b < 64) { if (((w >>> (63 - b)) & 1L) == 1L) counts(b) += 1; b += 1 }
      t += 1
    }
    val n = toks.length
    var sim = 0L
    var b = 0
    while (b < 64) { if (counts(b) * 2 > n) sim |= (1L << b); b += 1 }
    sim
  }

  /** SimHash near-dup with a pigeonhole guarantee: the 64-bit
    * simhash is split into maxHamming+1 chunks, so any pair within
    * `maxHamming` shares at least one identical chunk — the emitted
    * set is exactly {pairs : hamming <= maxHamming} AS LONG AS no
    * chunk bucket exceeds `maxBucket` (hot buckets degrade to star
    * pairs, trading non-hub pair recall for bounded work; raise
    * maxBucket when exactness matters more than skew safety).
    * Bucket-join on (chunk index, value), then verify true hamming
    * (sim values re-joined by id AFTER pair dedup — the candidate
    * shuffle carries only ids). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text",
                   maxBucket: Int = 2000): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming in [0, 63]")
    val spark = docs.sparkSession
    import spark.implicits._
    val nChunks = maxHamming + 1
    val base = 64 / nChunks
    val rem = 64 % nChunks
    // first `rem` chunks are one bit wider; offsets cover all 64 bits
    val widths = (0 until nChunks).map(c => if (c < rem) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _).init
    // chunk rows CARRY the 8-byte simhash into their buckets, and the
    // hamming is computed cell-locally in one streaming pass per
    // bucket (same shape as Similarity.bucketCosPairs: all pairs for
    // buckets <= maxBucket, hub-star past it, task memory bounded at
    // maxBucket + 1 rows). The previous id-pairs shape joined the sim
    // table back onto the candidate set twice; for an 8-byte payload,
    // carrying it beats two join shuffles at any scale.
    val chunked = docs
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, t) =>
        val sim = simhash64(t)
        (0 until nChunks).iterator.map { c =>
          // width 64 (maxHamming = 0, one chunk): (1L << 64) is a
          // mod-64 JVM shift = 1, so the mask formula would be 0 and
          // every doc would share bucket 0 — the full-word mask is -1L
          val mask = if (widths(c) == 64) -1L else (1L << widths(c)) - 1L
          (id, c, (sim >>> offsets(c)) & mask, sim)
        }
      })
    chunkLocalHamming(chunked, maxBucket)
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Distinct same-bucket pair hammings from (id, chunk, val, sim)
    * rows — the cell-local combine of [[simhashPairs]]: one hash
    * exchange on (chunk, val) with a secondary sort on id, a
    * streaming pass per bucket (all pairs <= maxBucket, hub-star
    * beyond, bounded buffering), then an id-pair dedup. Duplicate
    * pairs across chunks carry the identical hamming, so keeping any
    * one row is exact. */
  private def chunkLocalHamming(rows: org.apache.spark.sql.Dataset[(Long, Int, Long, Long)],
                                maxBucket: Int): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val parts = spark.sessionState.conf.numShufflePartitions
    rows.toDF("id", "chunk", "val", "sim")
      .repartition(parts, col("chunk"), col("val"))
      .sortWithinPartitions("chunk", "val", "id")
      .as[(Long, Int, Long, Long)]
      .mapPartitions { rs =>
        val bit = rs.buffered
        new Iterator[(Long, Long, Int)] {
          private var out: Iterator[(Long, Long, Int)] = Iterator.empty
          private def advance(): Unit =
            while (!out.hasNext && bit.hasNext) {
              val chunk = bit.head._2
              val v = bit.head._3
              val buf = new scala.collection.mutable.ArrayBuffer[(Long, Long)]
              while (bit.hasNext && bit.head._2 == chunk && bit.head._3 == v &&
                     buf.length <= maxBucket) {
                val r = bit.next()
                buf += ((r._1, r._4))
              }
              if (buf.length <= maxBucket) {
                val k = buf.length
                out = (0 until k).iterator.flatMap { i =>
                  val (ia, sa) = buf(i)
                  ((i + 1) until k).iterator.map { j =>
                    val (ib, sb) = buf(j)
                    (ia, ib, java.lang.Long.bitCount(sa ^ sb))
                  }
                }
              } else {
                val (hid, hsim) = buf(0)
                val bufStars = (1 until buf.length).iterator.map { i =>
                  val (ib, sb) = buf(i)
                  (hid, ib, java.lang.Long.bitCount(hsim ^ sb))
                }
                val restStars = new Iterator[(Long, Long, Int)] {
                  def hasNext: Boolean =
                    bit.hasNext && bit.head._2 == chunk && bit.head._3 == v
                  def next(): (Long, Long, Int) = {
                    val r = bit.next()
                    (hid, r._1, java.lang.Long.bitCount(hsim ^ r._4))
                  }
                }
                out = bufStars ++ restStars
              }
            }
          def hasNext: Boolean = { advance(); out.hasNext }
          def next(): (Long, Long, Int) = { advance(); out.next() }
        }
      }.toDF("id_a", "id_b", "hamming")
      .dropDuplicates("id_a", "id_b")
  }
}
