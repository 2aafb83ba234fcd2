package graft.pipeline

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

final case class Mention(repo: String, path: String, entity: String,
                         offset: Long, surface: String)
final case class LinkedMention(repo: String, path: String, entity: String,
                               offset: Long, score: Double)
final case class AliasEdge(src: String, dst: String)

/** KG-construction operators around the canonicalization kernel
  * (SURVEY §2b). All DataFrame/Dataset-first; the only custom code
  * paths are `mapPartitions` for batched regex scanning (per the
  * north rule) and the per-graph canonicalization kernel.
  */
object Kg {

  private val TokenRe = java.util.regex.Pattern.compile("\\b[A-Z][A-Za-z0-9]*\\b")
  private val AliasRe = java.util.regex.Pattern.compile("// alias: (\\S+) (\\S+)")

  /** Mention detection: batched regex scan per file via mapPartitions
    * (pattern compiled once per partition; dictionary is a broadcast
    * hash set — no shuffle, no UDF-per-row overhead). */
  def detectMentions(files: Dataset[FileRow],
                     dict: Broadcast[Set[String]]): Dataset[Mention] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.mapPartitions { it =>
      val re = TokenRe
      it.flatMap { f =>
        val m = re.matcher(f.content)
        val out = Vector.newBuilder[Mention]
        while (m.find()) {
          val tok = m.group()
          if (dict.value.contains(tok))
            out += Mention(f.repo, f.path, tok, m.start().toLong, tok)
        }
        out.result()
      }
    }
  }

  /** Alias facts found in content (drive entity merging). */
  def detectAliases(files: Dataset[FileRow]): Dataset[AliasEdge] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.mapPartitions { it =>
      val re = AliasRe
      it.flatMap { f =>
        val m = re.matcher(f.content)
        val out = Vector.newBuilder[AliasEdge]
        while (m.find()) out += AliasEdge(m.group(1), m.group(2))
        out.result()
      }
    }.dropDuplicates("src", "dst")
  }

  /** Entity-link scoring: equi-join mentions against the entity
    * dictionary DataFrame — broadcast (the dictionary is tiny relative
    * to mentions at any scale) — and score the candidate. Exact
    * surface match scores 1.0; case-insensitive 0.7; links below
    * `minScore` are dropped. */
  def linkMentions(mentions: Dataset[Mention], dictDf: DataFrame,
                   minScore: Double = 0.5): Dataset[LinkedMention] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    mentions
      .join(broadcast(dictDf.withColumnRenamed("name", "cand")),
        lower(col("surface")) === lower(col("cand")), "inner")
      .withColumn("score",
        when(col("surface") === col("cand"), lit(1.0)).otherwise(lit(0.7)))
      .where(col("score") >= minScore)
      .select(col("repo"), col("path"), col("cand").as("entity"),
        col("offset"), col("score"))
      .as[LinkedMention]
  }

  /** Connected components over alias edges: iterative DataFrame
    * min-label propagation with per-iteration `localCheckpoint` to
    * truncate lineage (SURVEY §2b / §7.4-6). The edge set (entity
    * aliases) is orders of magnitude smaller than the corpus, so a
    * handful of small shuffles; convergence detected by a changed-row
    * count of 0. Returns (entity, canonical) for EVERY entity in
    * `vertices`, canonical = lexicographic min of its component.
    */
  def connectedComponents(vertices: DataFrame, edges: Dataset[AliasEdge],
                          maxIter: Int = 20, numPartitions: Int = 1): DataFrame = {
    val spark = vertices.sparkSession
    // The alias-edge set is dictionary-sized (orders of magnitude
    // smaller than the corpus): run the fixpoint on few partitions so
    // each tiny iteration is one task, not shuffle.partitions tasks.
    // At larger edge scales pass numPartitions ~ |edges| / 1e6.
    val sym = edges.toDF("a", "b")
      .union(edges.toDF().select(col("dst").as("a"), col("src").as("b")))
      .dropDuplicates("a", "b")
      .coalesce(numPartitions)
      .localCheckpoint()
    var labels = vertices.select(col("name").as("id"), col("name").as("label"))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val candidates = sym
        .join(labels, sym("a") === labels("id"))
        .select(col("b").as("id"), col("label"))
      val next = labels.union(candidates)
        .repartition(numPartitions, col("id"))
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint()
      val changed = next.alias("n")
        .join(labels.alias("o"), col("n.id") === col("o.id"))
        .where(col("n.label") =!= col("o.label"))
        .limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels.select(col("id").as("entity"), col("label").as("canonical"))
  }

  /** Triple emission: (repo, subj, pred, obj, objKind) rows.
    *
    * Entities become BLANK NODES (bnode label = canonical entity name,
    * content-derived — deterministic under rerun) so per-repo RDFC-1.0
    * does real work; files/repos are IRIs; labels are literals.
    * Co-occurrence edges come from a window `lead` over mention order
    * within each file. objKind: 0=IRI 1=bnode 2=literal.
    */
  def emitTriples(linked: Dataset[LinkedMention], canonMap: DataFrame): DataFrame = {
    val spark = linked.sparkSession

    val cm = canonMap.withColumnRenamed("entity", "ent_key")
    val m = linked.toDF()
      .join(broadcast(cm), col("entity") === col("ent_key"))
      .select(col("repo"), col("path"), col("canonical").as("ent"), col("offset"))

    val fileIri = concat(lit("urn:src:"), col("repo"), lit("/"), col("path"))
    val typed = m.select(col("repo"),
      col("ent").as("subj"), lit("urn:p:type").as("pred"),
      lit("urn:c:Entity").as("obj"), lit(0).cast("byte").as("objKind"))
    val mentioned = m.select(col("repo"),
      col("ent").as("subj"), lit("urn:p:mentionedIn").as("pred"),
      fileIri.as("obj"), lit(0).cast("byte").as("objKind"))
    val labeled = m.select(col("repo"),
      col("ent").as("subj"), lit("urn:p:label").as("pred"),
      col("ent").as("obj"), lit(2).cast("byte").as("objKind"))
    val w = Window.partitionBy("repo", "path").orderBy("offset")
    val cooc = m.withColumn("nxt", lead(col("ent"), 1).over(w))
      .where(col("nxt").isNotNull && col("nxt") =!= col("ent"))
      .select(col("repo"), col("ent").as("subj"),
        lit("urn:p:coOccursWith").as("pred"), col("nxt").as("obj"),
        lit(1).cast("byte").as("objKind"))
    val hasFile = m.select(col("repo"),
      concat(lit("urn:repo:"), col("repo")).as("subj"),
      lit("urn:p:hasFile").as("pred"), fileIri.as("obj"),
      lit(0).cast("byte").as("objKind"))
      .withColumn("subjKind", lit(0).cast("byte"))

    val bnodeSubj = typed.union(mentioned).union(labeled).union(cooc)
      .withColumn("subjKind", lit(1).cast("byte"))

    bnodeSubj.union(hasFile)
      .select("repo", "subjKind", "subj", "pred", "obj", "objKind")
  }

  /** Dedup with explicit skew break: repartition on (repo, salted
    * subject hash) BEFORE the per-partition distinct so one mega-repo
    * cannot pin the dedup shuffle to a single task, then a standard
    * dropDuplicates (AQE coalesces the small partitions after).
    */
  def dedupTriples(triples: DataFrame, saltBuckets: Int = 64): DataFrame =
    triples
      .repartition(col("repo"), pmod(xxhash64(col("subj")), lit(saltBuckets)))
      .dropDuplicates("repo", "subjKind", "subj", "pred", "obj", "objKind")

  /** Triples → per-repo canonical N-Quads via the RDFC-1.0 engine. */
  def canonicalizeTriples(triples: DataFrame,
                          opts: graft.canon.CanonOptions = graft.canon.CanonOptions.default)
      : Dataset[graft.spark.CanonResult] = {
    val spark = triples.sparkSession
    import spark.implicits._
    import graft.rdf.TermKind
    val keyed = triples.select("repo", "subjKind", "subj", "pred", "obj", "objKind")
      .as[(String, Byte, String, String, String, Byte)]
      .map { case (repo, sk, s, p, o, ok) =>
        // plain literals carry dt="" (implicit xsd:string; canonical
        // N-Quads suppresses it and our Quad equality uses "")
        graft.spark.KeyedQuad(repo, sk, s, p, ok, o, "", "",
          TermKind.DefaultGraph, "")
      }
    graft.spark.CanonEngine.canonicalizePerGraph(keyed, opts)
  }
}
