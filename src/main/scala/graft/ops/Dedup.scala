package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators for training-data pipelines.
  *
  * Scale shape: every variant is a shuffle-on-key + per-bucket local
  * work — never a global cross join. Candidate generation (LSH bands /
  * simhash chunks / shared rare shingles) bounds pair enumeration to
  * same-bucket pairs; exact verification runs only on candidates.
  *
  * Signature computation (shingles, minhash, simhash) runs as typed
  * per-partition JVM kernels: these are tight per-row loops (tens of
  * thousands of hash ops per document) where interpreted higher-order
  * Column functions cost 50-100x; the relational parts — banding,
  * bucket joins, verification — stay DataFrame so Catalyst plans the
  * shuffles. (Spark-guide preference (d): mapPartitions for genuine
  * per-partition imperative logic.)
  */
object Dedup {

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

  /** Distinct k-gram shingle hashes of the normalized text (JVM-side,
    * rolling over chars; deterministic splitmix64). */
  def shingleHashes(text: String, k: Int = 5): Array[Long] = {
    val norm = text.toLowerCase.replaceAll("\\s+", " ")
    if (norm.length <= k) return Array(mix64(norm.hashCode.toLong))
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i + k <= norm.length) {
      var h = 0L
      var j = 0
      while (j < k) { h = h * 31 + norm.charAt(i + j); j += 1 }
      set.add(mix64(h))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var n = 0
    while (it.hasNext) { out(n) = it.next(); n += 1 }
    out
  }

  /** (id, shingles[]) — typed kernel, sorted distinct hashes. */
  private def withShingles(docs: DataFrame, idCol: String, textCol: String,
                           k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => (id, shingleHashes(text, k)) })
      .toDF("id", "sh")
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

  private val jaccardUdf = udf(jaccardSorted _)

  /** n-gram Jaccard near-dup via an inverted shingle index:
    * candidates = pairs sharing a *discriminative* shingle (document
    * frequency <= maxDf; ultra-common shingles add O(df^2) candidate
    * pairs and ~no discrimination), verified with EXACT Jaccard over
    * the full shingle sets (the df cut only gates candidate
    * generation, never the similarity value). Returns
    * (id_a, id_b, jaccard), id_a < id_b. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.8,
                        idCol: String = "doc_id", textCol: String = "text",
                        k: Int = 5, maxDf: Int = 100): DataFrame = {
    val sh = withShingles(docs, idCol, textCol, k)
    val inverted = sh.select(col("id"), explode(col("sh")).as("shingle"))
    val rare = inverted.groupBy("shingle")
      .agg(collect_list("id").as("ids"), count(lit(1)).as("df"))
      .where(col("df") <= maxDf && col("df") >= 2)
    val cand = rare
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
    verifyJaccard(cand, sh, threshold)
  }

  private def verifyJaccard(cand: DataFrame, sh: DataFrame,
                            threshold: Double): DataFrame = {
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("jaccard", jaccardUdf(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signature from sorted shingle hashes: m pseudo-
    * permutations via seeded splitmix re-hash; sig(i) = min over
    * shingles of mix64(s ^ seed_i). */
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
    * sharing any band bucket are candidates; candidates verified with
    * exact Jaccard on the full shingle sets. Two shuffles (bucket
    * groupBy, verify join) — no O(n^2). */
  def minhashLshPairs(docs: DataFrame, threshold: Double = 0.8,
                      idCol: String = "doc_id", textCol: String = "text",
                      k: Int = 5, m: Int = 32, bands: Int = 8): DataFrame = {
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
    val l = banded.select(col("id").as("id_a"), col("band"), col("bucket"))
    val r = banded.select(col("id").as("id_b"), col("band"), col("bucket"))
    val cand = l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    verifyJaccard(cand, sh, threshold)
  }

  /** 64-bit SimHash from whitespace-token hashes (typed kernel). */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    var n = 0
    text.toLowerCase.split(" +").foreach { tok =>
      val h = mix64(tok.hashCode.toLong)
      var b = 0
      while (b < 64) { if (((h >>> b) & 1L) == 1L) counts(b) += 1; b += 1 }
      n += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) { if (counts(b) * 2 > n) sim |= (1L << b); b += 1 }
    sim
  }

  /** SimHash near-dup: band the 64-bit simhash into 4 x 16-bit chunks
    * (pigeonhole: hamming <= 3 => at least one identical chunk),
    * bucket-join on (chunk index, value), verify true hamming. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val withSim = docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => (id, simhash64(t)) })
      .toDF("id", "sim")
    val chunked = withSim.select(col("id"), col("sim"),
      posexplode(array((0 until 4).map { c =>
        shiftright(col("sim"), c * 16).bitwiseAND(lit(0xFFFFL))
      }: _*)).as(Seq("chunk", "val")))
    val l = chunked.select(col("id").as("id_a"), col("sim").as("sim_a"),
      col("chunk"), col("val"))
    val r = chunked.select(col("id").as("id_b"), col("sim").as("sim_b"),
      col("chunk"), col("val"))
    l.join(r, Seq("chunk", "val"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
