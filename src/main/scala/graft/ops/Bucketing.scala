package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) join support — the pre-shuffle trade at
  * 100 TB: pay one hash-partitioned write per table, then every
  * subsequent equi-join/aggregation on the bucket key runs with ZERO
  * exchanges. The classic use in this pipeline: land the deduped
  * triple table and the entity dictionary bucketed by their join
  * keys so downstream consumers (entity enrichment, incremental
  * canonicalization diffs) never re-shuffle the corpus.
  *
  * Uses Spark's native (non-Hive) bucketing: `bucketBy(...).sortBy`
  * + `saveAsTable` into the session catalog; the scan exposes
  * `outputPartitioning = HashPartitioning(key, n)`, which Catalyst's
  * EnsureRequirements recognizes, eliding the join Exchange on both
  * sides (asserted in BucketingSpec).
  */
object Bucketing {

  /** Write `df` as a bucketed, in-bucket-sorted table. */
  def bucketize(df: DataFrame, table: String, key: String,
                buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join two tables bucketed on their join keys — exchange-free
    * when bucket counts match. */
  def coLocatedJoin(spark: SparkSession, leftTable: String, leftKey: String,
                    rightTable: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(leftTable)
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))
  }
}
