package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Similarity search over an embedding column (`array<float>`),
  * matching the `embeddings(vec_id, embedding, label)` table.
  *
  * Two paths:
  *  - brute-force cosine top-k: exact baseline. O(n^2) pairs — use on
  *    bounded inputs or broadcastable query sets.
  *  - LSH-bucketed ANN (random-hyperplane signatures): the scale
  *    path — candidates share a signature band bucket, so pair work
  *    is #buckets x bucket^2 instead of n^2.
  *
  * Vectors are L2-normalized ONCE per row (typed kernel — a tight
  * float loop where interpreted higher-order Columns cost 50x);
  * after that cosine == dot product, computed per candidate pair.
  */
object Similarity {

  /** dot(a, b) via zip_with + aggregate — native Column form (used
    * where a one-off expression is clearer than a kernel). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def dotF(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i); i += 1 }
    s
  }

  private val dotUdf = udf((a: Array[Float], b: Array[Float]) => dotF(a, b))

  /** (id, unit-norm vector) via one typed pass. */
  private def normalized(vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    vecs.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) =>
        val n = math.sqrt(dotF(v, v))
        val u = if (n == 0) v else v.map(x => (x / n).toFloat)
        (id, u)
      }).toDF("id", "v")
  }

  /** Exact top-k cosine neighbors for every vector (self-join without
    * self-pairs) — the correctness baseline for ANN. */
  def bruteForceTopK(vecs: DataFrame, k: Int = 5,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val u = normalized(vecs, idCol, vecCol)
    val a = u.select(col("id").as("id_a"), col("v").as("v_a"))
    val b = u.select(col("id").as("id_b"), col("v").as("v_b"))
    val pairs = a.crossJoin(b).where(col("id_a") =!= col("id_b"))
      .withColumn("cos", dotUdf(col("v_a"), col("v_b")))
    val w = Window.partitionBy("id_a").orderBy(col("cos").desc, col("id_b"))
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("id_a", "id_b", "cos", "rank")
  }

  /** Deterministic random hyperplane sign for (dim i, bit b). */
  @inline private def planeSign(i: Int, bit: Int, seed: Long): Double =
    if ((graft.pipeline.Corpus.mix64(seed ^ (bit.toLong << 32) ^ i) & 1L) == 0L) 1.0 else -1.0

  /** nBits-bit random-hyperplane signature — cosine-preserving LSH
    * (typed kernel; deterministic planes from the seed). */
  def rhpSig(v: Array[Float], nBits: Int, seed: Long): Long = {
    var sig = 0L
    var b = 0
    while (b < nBits) {
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i) * planeSign(i, b, seed); i += 1 }
      if (s >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** ANN top-k: signature bands as buckets (multi-probe), exact
    * cosine ranking inside buckets. `bitsPerBand` controls the
    * bucket-size / recall trade-off (8 bits -> 256 buckets per band).
    * Recall < 1 by construction; compare against bruteForceTopK. */
  def annTopK(vecs: DataFrame, k: Int = 5, bands: Int = 3,
              bitsPerBand: Int = 8, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val nBits = bands * bitsPerBand
    require(nBits <= 63, "bands * bitsPerBand must be <= 63")
    val u = normalized(vecs, idCol, vecCol)
    val banded = u.as[(Long, Array[Float])]
      .mapPartitions(_.flatMap { case (id, v) =>
        val sig = rhpSig(v, nBits, seed)
        (0 until bands).iterator.map { b =>
          (id, v, b, (sig >>> (b * bitsPerBand)) & ((1L << bitsPerBand) - 1))
        }
      }).toDF("id", "v", "band", "bucket")
    val l = banded.select(col("id").as("id_a"), col("v").as("v_a"),
      col("band"), col("bucket"))
    val r = banded.select(col("id").as("id_b"), col("v").as("v_b"),
      col("band"), col("bucket"))
    val cand = l.join(r, Seq("band", "bucket"))
      .where(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b", "v_a", "v_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", dotUdf(col("v_a"), col("v_b")))
    val w = Window.partitionBy("id_a").orderBy(col("cos").desc, col("id_b"))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("id_a", "id_b", "cos", "rank")
  }
}
