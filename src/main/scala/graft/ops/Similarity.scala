package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Similarity search over an embedding column (`array<float>`),
  * matching the `embeddings(vec_id, embedding, label)` table.
  *
  * Two paths:
  *  - brute-force cosine top-k: exact baseline. The pair enumeration
  *    is a join on a crossed bucket key (query side broadcast when
  *    small); dot products are native `zip_with`+`aggregate` (codegen).
  *  - LSH-bucketed ANN (random-hyperplane signatures): the scale
  *    path — candidates share a signature bucket, so work is
  *    #buckets × bucket² instead of n².
  */
object Similarity {

  /** dot(a, b) via zip_with + aggregate — native, no UDF. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for every vector (self-join without
    * self-pairs). O(n²) pair work — the correctness baseline for ANN;
    * use only on bounded inputs or broadcastable query sets.
    */
  def bruteForceTopK(vecs: DataFrame, k: Int = 5,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = vecs.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = vecs.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    val pairs = a.crossJoin(b).where(col("id_a") =!= col("id_b"))
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
    val w = Window.partitionBy("id_a").orderBy(col("cos").desc, col("id_b"))
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("id_a", "id_b", "cos", "rank")
  }

  /** Deterministic random hyperplanes: dim × nBits signs derived from
    * splitmix64 — same plane set on every run/executor. */
  private def hyperplaneSign(dim: Int, bit: Int, seed: Long): Array[Double] = {
    val arr = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      arr(i) = if ((graft.pipeline.Corpus.mix64(seed ^ (bit.toLong << 32) ^ i) & 1L) == 0L) 1.0 else -1.0
      i += 1
    }
    arr
  }

  /** nBits-bit random-hyperplane signature (sign of dot(v, plane_b)
    * per bit) — cosine-preserving LSH. Fully native: each plane is a
    * literal array, dot via zip_with. */
  def rhpSignature(vec: Column, dim: Int, nBits: Int = 16,
                   seed: Long = 42L): Column = {
    val bits = (0 until nBits).map { b =>
      val plane = array(hyperplaneSign(dim, b, seed).map(lit): _*)
      when(dot(vec, plane) >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** ANN top-k: bucket by signature bands (multi-probe via `bands`
    * sub-signatures), rank candidates inside buckets by exact cosine.
    * Recall < 1 by construction; report alongside the brute-force
    * baseline. */
  def annTopK(vecs: DataFrame, dim: Int, k: Int = 5, nBits: Int = 16,
              bands: Int = 4, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val bitsPerBand = nBits / bands
    val sig = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("sig", rhpSignature(col("v"), dim, nBits))
    val banded = sig.select(col("id"), col("v"),
      posexplode(array((0 until bands).map { b =>
        shiftright(col("sig"), b * bitsPerBand)
          .bitwiseAND(lit((1L << bitsPerBand) - 1))
      }: _*)).as(Seq("band", "bucket")))
    val l = banded.select(col("id").as("id_a"), col("v").as("v_a"),
      col("band"), col("bucket"))
    val r = banded.select(col("id").as("id_b"), col("v").as("v_b"),
      col("band"), col("bucket"))
    val cand = l.join(r, Seq("band", "bucket"))
      .where(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b", "v_a", "v_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
    val w = Window.partitionBy("id_a").orderBy(col("cos").desc, col("id_b"))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("id_a", "id_b", "cos", "rank")
  }
}
