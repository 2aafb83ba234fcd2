package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators for training-data pipelines.
  *
  * Scale shape: every variant is a shuffle-on-key + per-bucket local
  * work — never a global cross join. Candidate generation (LSH bands /
  * simhash chunks / shared shingles) bounds pair enumeration to
  * same-bucket pairs; exact verification runs only on candidates.
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

  /** Character 5-gram shingle set of the normalized text (array of
    * 64-bit shingle hashes, distinct). */
  def shingles(text: Column, k: Int = 5): Column = {
    val norm = lower(regexp_replace(text, lit("\\s+"), lit(" ")))
    // sliding k-grams via sequence + substring; native + codegen
    array_distinct(transform(
      sequence(lit(1), greatest(length(norm) - (k - 1), lit(1))),
      i => xxhash64(norm.substr(i, lit(k)))))
  }

  /** n-gram Jaccard near-dup via an inverted shingle index:
    * explode(shingles) → self-join on shingle → pair intersection
    * counts → |A∩B| / (|A|+|B|-|A∩B|) >= threshold. The join key is
    * the shingle hash — co-partitioned, skew bounded by dropping
    * ultra-frequent shingles (`maxDf`). Returns (id_a, id_b, jaccard)
    * with id_a < id_b.
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.8,
                        idCol: String = "doc_id", textCol: String = "text",
                        k: Int = 5, maxDf: Int = 1000): DataFrame = {
    val withSets = docs.select(col(idCol).as("id"),
      shingles(col(textCol), k).as("sh"))
      .withColumn("setSize", size(col("sh")))
    val inverted = withSets.select(col("id"), col("setSize"),
      explode(col("sh")).as("shingle"))
    // stop-shingle removal: a shingle appearing in >maxDf docs adds
    // O(df^2) candidate pairs but ~no discrimination
    val filtered = inverted
      .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
      .where(col("df") <= maxDf)
    val a = filtered.select(col("id").as("id_a"), col("setSize").as("sz_a"), col("shingle"))
    val b = filtered.select(col("id").as("id_b"), col("setSize").as("sz_b"), col("shingle"))
    a.join(b, "shingle")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common") / (col("sz_a") + col("sz_b") - col("common")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signature: m independent permutations emulated by
    * seeded xxhash64 re-hashing of each shingle; signature[i] =
    * min_s xxhash64(s, seed_i). All native array functions. */
  def minhashSignature(sh: Column, m: Int = 32): Column =
    array((0 until m).map { i =>
      array_min(transform(sh, s => xxhash64(s, lit(i))))
    }: _*)

  /** MinHash + LSH banding: signatures of `m` minhashes split into
    * `bands` bands of m/bands rows; docs sharing any band bucket are
    * candidates; candidates verified with exact Jaccard on shingle
    * sets. Two shuffles (bucket groupBy, verify join) — no O(n²).
    */
  def minhashLshPairs(docs: DataFrame, threshold: Double = 0.8,
                      idCol: String = "doc_id", textCol: String = "text",
                      k: Int = 5, m: Int = 32, bands: Int = 8): DataFrame = {
    val rows = m / bands
    val withSets = docs.select(col(idCol).as("id"),
      shingles(col(textCol), k).as("sh"))
    val sig = withSets.withColumn("sig", minhashSignature(col("sh"), m))
    val banded = sig.select(col("id"), col("sh"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(concat_ws(",",
          slice(col("sig"), b * rows + 1, rows).cast("array<string>")), lit(b))
      }: _*)).as(Seq("band", "bucket")))
    val l = banded.select(col("id").as("id_a"), col("sh").as("sh_a"),
      col("band"), col("bucket"))
    val r = banded.select(col("id").as("id_b"), col("sh").as("sh_b"),
      col("band"), col("bucket"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")
    candidates
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("common") /
        (size(col("sh_a")) + size(col("sh_b")) - col("common")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash from whitespace-token hashes: for each bit,
    * sum(+1/-1 per token) > 0. Native: per-bit popcount via aggregate
    * over the token-hash array. */
  def simhash(text: Column): Column = {
    val toks = split(lower(text), " +")
    val hashes = transform(toks, t => xxhash64(t))
    // bit b of simhash = 1 if (#tokens with bit b set) * 2 > #tokens
    val n = size(hashes)
    val bits = (0 until 64).map { b =>
      when(aggregate(hashes, lit(0L),
        (acc, h) => acc + shiftright(h, b).bitwiseAND(lit(1L))) * 2 > n,
        lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** SimHash near-dup: band the 64-bit simhash into 4 × 16-bit chunks
    * (pigeonhole: hamming distance <= 3 ⇒ at least one identical
    * chunk), bucket-join on (chunk index, chunk value), verify true
    * hamming distance. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val withSim = docs.select(col(idCol).as("id"),
      simhash(col(textCol)).as("sim"))
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
