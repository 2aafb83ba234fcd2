package graft

import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the plans we ship are the plans we
  * designed — filters reach the parquet scan, small dims broadcast,
  * column pruning survives, and per-graph canonicalization costs
  * exactly one hash exchange on the graph key. */
class PlanSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01: filter is pushed to the parquet scan and columns pruned") {
    val p = planOf(SparkEntry.queries("q01_filter_project")(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"), p)
    // projection needs only 3 columns; scan schema must not include others
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"), readSchema)
  }

  test("q03: dimension join is a broadcast hash join") {
    val p = planOf(SparkEntry.queries("q03_join_segment")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q04: star join broadcasts all three small dims") {
    val p = planOf(SparkEntry.queries("q04_star_join")(spark, sf))
    assert(p.split("BroadcastHashJoin").length >= 4, p) // 3+ broadcast joins
  }

  test("q39: date-part aggregation prunes the scan to exactly two columns") {
    val p = planOf(SparkEntry.queries("q39_date_parts")(spark, sf))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("o_orderdate") && readSchema.contains("o_totalprice"),
      readSchema)
    assert(!readSchema.contains("o_custkey") && !readSchema.contains("o_orderpriority"),
      readSchema)
  }

  test("q38: the props null/empty filter is pushed to the parquet scan") {
    val p = planOf(SparkEntry.queries("q38_json_extract")(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(props)"), p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("user_id"), readSchema) // pruned
  }

  test("canonicalization costs exactly one exchange, keyed on the graph") {
    import spark.implicits._
    val docs = spark.createDataset(Seq(("g1", "_:a <urn:p> _:b .")))
    val quads = graft.spark.CanonEngine.parseDocuments(docs)
    val plan = planOf(graft.spark.CanonEngine.canonicalizePerGraph(quads).toDF())
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, plan)
    assert(plan.contains("MapGroups"), plan)
  }

  test("whole-stage codegen covers the scan-side of aggregation queries") {
    val df = SparkEntry.queries("q02_agg_pricing")(spark, sf)
    df.collect() // AQE finalizes (and codegen-compiles) only on execution
    val p = planOf(df)
    assert(p.contains("isFinalPlan=true"), p)
    assert(p.contains("*(1)"), p) // '*' = WholeStageCodegen span
    // partial (map-side) aggregation must be present before the exchange
    assert(p.contains("partial_sum"), p)
  }

  test("ANN candidate dedup shuffles scalars only — never vectors") {
    // the distinct on (id_a, id_b) consumes the cell-local cosine rows
    // (id_a, id_b, cos): its shuffle must carry NO array column —
    // vectors travel once per band into their buckets and are never
    // re-attached to candidate pairs (the pre-r6 join-back shape)
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.types.ArrayType
    val df = graft.ops.Similarity.annTopK(
      spark.read.parquet(s"$sf/embeddings.parquet"), k = 3)
    val dedups = df.queryExecution.optimizedPlan.collect {
      case a: Aggregate
          if a.groupingExpressions.size == 2 &&
            Set("id_a", "id_b").subsetOf(a.output.map(_.name).toSet) => a
    }
    assert(dedups.nonEmpty, "candidate dedup aggregate not found")
    dedups.foreach { a =>
      val arrayCols = a.child.output.filter(_.dataType.isInstanceOf[ArrayType])
      assert(arrayCols.isEmpty,
        s"candidate dedup shuffle carries array columns: $arrayCols")
      assert(!a.output.exists(o => o.name == "v_a" || o.name == "v_b"), a.output)
    }
  }

  test("prefix-filtered jaccard join never plans a cartesian product") {
    // the candidate stage must stay bucket-local (shared prefix
    // shingle) at every threshold — a regression to an all-pairs or
    // broadcast-nested-loop shape would explode at scale. Checked on
    // BOTH plans of the adaptive switch (prefix forced with 0, full
    // index forced with MaxValue).
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    Seq(0, Int.MaxValue).foreach { minDocs =>
      val df = graft.ops.Dedup.ngramJaccardPairs(
        docs, threshold = 0.5, prefixMinDocs = minDocs)
      val p = planOf(df)
      assert(!p.contains("CartesianProduct"), s"minDocs=$minDocs: $p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"minDocs=$minDocs: $p")
    }
  }

  test("metadata-only multimodal projection does not read the payload column") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mm").toString
    graft.ops.Multimodal.syntheticMedia(spark, 10).write
      .mode("overwrite").parquet(dir)
    val p = planOf(graft.ops.Multimodal.metadataOnly(spark.read.parquet(dir)))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("payload"), readSchema)
  }
}
