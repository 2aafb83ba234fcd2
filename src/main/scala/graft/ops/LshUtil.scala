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
  def md5Long(s: String): Long = md5LongRange(s, 0, s.length)

  /** Reusable per-thread scratch for [[md5LongRange]]: encode buffer,
    * digest instance, digest output — the shingle kernel calls this
    * once per k-char window (millions of times per task), and a
    * substring + getBytes + digest-array per call was the dominant
    * allocation churn of the q19/q21/q28 signature stage. */
  private final class Md5Scratch {
    val md: MessageDigest = MessageDigest.getInstance("MD5")
    var buf: Array[Byte] = new Array[Byte](256)
    val out: Array[Byte] = new Array[Byte](16)
  }
  private val md5Scratch = new ThreadLocal[Md5Scratch] {
    override def initialValue(): Md5Scratch = new Md5Scratch
  }

  /** First 8 md5 bytes (big-endian) of the UTF-8 encoding of
    * s[off, off+len) — byte-identical to
    * `md5Long(s.substring(off, off + len))`, including the '?' (0x3F)
    * replacement `String.getBytes(UTF_8)` emits for unpaired
    * surrogates (a surrogate pair split at the window edge encodes as
    * '?' exactly like the substring copy would), without allocating
    * the substring, its byte[], or the digest output. */
  def md5LongRange(s: String, off: Int, len: Int): Long = {
    val sc = md5Scratch.get()
    if (sc.buf.length < len * 4) sc.buf = new Array[Byte](len * 4)
    val b = sc.buf
    var n = 0
    var i = off
    val end = off + len
    while (i < end) {
      val c = s.charAt(i)
      if (c < 0x80) { b(n) = c.toByte; n += 1 }
      else if (c < 0x800) {
        b(n) = (0xC0 | (c >> 6)).toByte
        b(n + 1) = (0x80 | (c & 0x3F)).toByte
        n += 2
      } else if (Character.isHighSurrogate(c)) {
        if (i + 1 < end && Character.isLowSurrogate(s.charAt(i + 1))) {
          val cp = Character.toCodePoint(c, s.charAt(i + 1))
          b(n) = (0xF0 | (cp >> 18)).toByte
          b(n + 1) = (0x80 | ((cp >> 12) & 0x3F)).toByte
          b(n + 2) = (0x80 | ((cp >> 6) & 0x3F)).toByte
          b(n + 3) = (0x80 | (cp & 0x3F)).toByte
          n += 4
          i += 1
        } else { b(n) = '?'.toByte; n += 1 }
      } else if (Character.isLowSurrogate(c)) { b(n) = '?'.toByte; n += 1 }
      else {
        b(n) = (0xE0 | (c >> 12)).toByte
        b(n + 1) = (0x80 | ((c >> 6) & 0x3F)).toByte
        b(n + 2) = (0x80 | (c & 0x3F)).toByte
        n += 3
      }
      i += 1
    }
    val md = sc.md
    md.reset()
    md.update(b, 0, n)
    md.digest(sc.out, 0, 16)
    val o = sc.out
    ((o(0) & 0xFFL) << 56) | ((o(1) & 0xFFL) << 48) |
      ((o(2) & 0xFFL) << 40) | ((o(3) & 0xFFL) << 32) |
      ((o(4) & 0xFFL) << 24) | ((o(5) & 0xFFL) << 16) |
      ((o(6) & 0xFFL) << 8) | (o(7) & 0xFFL)
  }

  /** Same-bucket candidate pairs with a hot-bucket guard.
    * Input rows: (id, keys...). Buckets of size <= maxBucket
    * contribute ALL intra-bucket pairs; larger buckets contribute
    * STAR pairs (member ↔ bucket min id) — bounded O(bucket) instead
    * of O(bucket²), preserving duplicate-cluster connectivity through
    * the hub while trading away non-hub pair recall (operators
    * document this cap; verification stages only ever shrink the
    * candidate set further). Returns distinct (id_a < id_b).
    *
    * Plan shape (round 6): bucket size/hub come from WINDOW aggregates
    * over ONE hash exchange on the bucket keys instead of a groupBy +
    * join-back. The join-back version referenced `buckets` from four
    * physical subtrees with no common exchange (the stats join
    * broadcasts locally), so the signature lineage feeding this —
    * shingles + minhash for q19, simhash for q20, RHP banding or IVF
    * assignment for q23/q29/q30/q34/q35 — was recomputed per subtree
    * (q30's executed plan carried 28 parquet scans). Both remaining
    * branches (small-bucket pairs, hot-bucket star) hang off the SAME
    * Exchange(hash(keys)) node, which ReuseExchange/AQE stage reuse
    * collapses to one computation. The small-bucket collect_list is
    * bounded by maxBucket, and the pair expansion is generator-only
    * (no join): the one remaining shuffle after the window is the
    * (id_a, id_b) dedup, which carries ids ONLY. */
  def bucketPairs(buckets: DataFrame, keys: Seq[String],
                  maxBucket: Int): DataFrame = {
    val kc = keys.map(col)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(kc: _*)
    val tagged = buckets
      .withColumn("bkt_n", count(lit(1)).over(w))
      .withColumn("bkt_hub", min(col("id")).over(w))
    // small buckets: ids gathered per bucket (<= maxBucket elements by
    // the filter), pairs expanded in place — no self-join, and the
    // groupBy reuses the window's hash partitioning (no new exchange)
    val small = tagged.where(col("bkt_n") <= maxBucket)
      .groupBy(kc: _*).agg(collect_list(col("id")).as("ids"))
    val allPairs = small
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    // hub = min id, so star pairs already satisfy id_a < id_b
    val star = tagged
      .where(col("bkt_n") > maxBucket && col("id") =!= col("bkt_hub"))
      .select(col("bkt_hub").as("id_a"), col("id").as("id_b"))
    allPairs.union(star).dropDuplicates("id_a", "id_b")
  }
}
