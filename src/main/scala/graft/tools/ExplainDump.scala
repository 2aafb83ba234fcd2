package graft.tools

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for every SparkEntry query (or a
  * comma-separated subset) into one text file per query — the plan
  * evidence the optimization rounds commit under `plans/rNN/`.
  *
  *   ExplainDump <sfDir> <outDir> [q1,q2,...] [suffix]
  *
  * Writes `<outDir>/<query><suffix>.txt` (suffix defaults to
  * "_before"). Uses the same session shape as Bench so the plans match
  * what the bench executes (AQE on → initial plan; Exchange count and
  * join strategies are decided here).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/root/repo/plans/r06")
    val only = args.lift(2).map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val suffix = args.lift(3).getOrElse("_before")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.write(Paths.get(outDir, s"$name$suffix.txt"), plan.getBytes(UTF_8))
          println(s"[explain] wrote $name$suffix.txt")
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[explain] $name FAILED: $e")
        }
      }
    spark.stop()
  }
}
