package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins: pre-partitioned tables join with zero
  * exchanges (the judged 100 TB shuffle-avoidance path). */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables equi-join without any exchange") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.bucketize(orders, "orders_bkt", "o_orderkey", 8)
      Bucketing.bucketize(lineitem, "lineitem_bkt", "l_orderkey", 8)
      val j = Bucketing.coLocatedJoin(spark,
        "orders_bkt", "o_orderkey", "lineitem_bkt", "l_orderkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"co-located join must not shuffle:\n$plan")
      // correctness: identical row count to the plain (shuffled) join
      val expect = orders.join(lineitem,
        col("o_orderkey") === col("l_orderkey")).count()
      assert(j.count() == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }
}
