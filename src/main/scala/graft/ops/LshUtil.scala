package graft.ops

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared LSH plumbing for the dedup/similarity families (one
  * implementation of the hot-bucket guard — a fix here fixes every
  * bucketed operator). */
object LshUtil {

  /** The effective operator-cache flag — the ONE place the
    * `graft.ops.cache` default lives, so A/B tooling (QueryBench)
    * can never print a label that disagrees with the behavior. */
  def cacheEnabled: Boolean =
    sys.props.getOrElse("graft.ops.cache", "false").toBoolean

  val md5Local: ThreadLocal[MessageDigest] = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** OPTIONAL persistence of diamond-consumed derived tables
    * (signature/norm tables feed 3-6 downstream scans each).
    * Default OFF — measured with `graft.tools.QueryBench` on the sf1
    * corpus (interleaved A/B, same windows): caching made q34 8x
    * SLOWER (180 s vs 22 s) and q21 ~1.4x slower — the per-row
    * kernels are cheap enough that recomputation beats the
    * columnar-cache round-trip plus the whole-stage-codegen and AQE
    * boundaries an InMemoryRelation introduces. The hook stays for
    * deployments where the upstream scan is genuinely expensive
    * (remote storage, wide rows): `-Dgraft.ops.cache=true`. */
  def maybePersist(df: DataFrame): DataFrame =
    if (cacheEnabled)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else df

  /** First 8 bytes of MD5(s), big-endian — the same 64 bits DuckDB's
    * `substr(md5(s), 1, 16)` hex-encodes, so set cardinalities and
    * per-bit tests computed here are reproducible in plain SQL. */
  def md5Long(s: String): Long = {
    val d = md5Local.get(); d.reset()
    val b = d.digest(s.getBytes(UTF_8))
    ((b(0) & 0xFFL) << 56) | ((b(1) & 0xFFL) << 48) |
      ((b(2) & 0xFFL) << 40) | ((b(3) & 0xFFL) << 32) |
      ((b(4) & 0xFFL) << 24) | ((b(5) & 0xFFL) << 16) |
      ((b(6) & 0xFFL) << 8) | (b(7) & 0xFFL)
  }

  /** Same-bucket candidate pairs with a hot-bucket guard.
    * Input rows: (id, keys...). Buckets of size <= maxBucket
    * contribute ALL intra-bucket pairs; larger buckets contribute
    * STAR pairs (member ↔ bucket min id) — bounded O(bucket) instead
    * of O(bucket²), preserving duplicate-cluster connectivity through
    * the hub while trading away non-hub pair recall (operators
    * document this cap; verification stages only ever shrink the
    * candidate set further). Returns distinct (id_a < id_b). */
  def bucketPairs(buckets: DataFrame, keys: Seq[String],
                  maxBucket: Int): DataFrame = {
    val kc = keys.map(col)
    val stats = buckets.groupBy(kc: _*)
      .agg(count(lit(1)).as("bkt_n"), min(col("id")).as("bkt_hub"))
    val tagged = buckets.join(stats, keys)
    val small = tagged.where(col("bkt_n") <= maxBucket)
    val l = small.select((col("id").as("id_a") +: kc): _*)
    val r = small.select((col("id").as("id_b") +: kc): _*)
    val allPairs = l.join(r, keys)
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    // hub = min id, so star pairs already satisfy id_a < id_b
    val star = tagged
      .where(col("bkt_n") > maxBucket && col("id") =!= col("bkt_hub"))
      .select(col("bkt_hub").as("id_a"), col("id").as("id_b"))
    allPairs.union(star).dropDuplicates("id_a", "id_b")
  }
}
