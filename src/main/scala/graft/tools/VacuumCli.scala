package graft.tools

import graft.pipeline.Incremental
import graft.spark.CanonEngine

/** Doc-store orphan GC ([[Incremental.vacuum]]) as an operational
  * tool: read the content-addressed doc store and the current state
  * snapshot (parquet), keep only documents a live state row still
  * references, write the compacted store.
  *
  * Runs OFF the increment's critical path — orphans are never a
  * correctness problem (resolve joins by sha), only dead bytes, so
  * this is an occasional maintenance job like any table compaction.
  *
  * Usage: VacuumCli <storeDir> <stateDir> <outDir> [--cores N]
  */
object VacuumCli {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: VacuumCli <storeDir> <stateDir> <outDir> [--cores N]")
      sys.exit(2)
    }
    val Array(storeDir, stateDir, outDir) = args.take(3)
    // in-place vacuum guard: mode("overwrite") DELETES the target
    // before the lazy read of the same path ever executes, so
    // outDir == storeDir would destroy the store instead of
    // compacting it (and outDir == stateDir would eat the state)
    // toRealPath resolves symlinks (a symlinked alias of the store
    // must not slip past the guard); fall back to the normalized
    // absolute path for targets that do not exist yet
    def canonical(p: String): java.nio.file.Path = {
      val abs = java.nio.file.Paths.get(p).toAbsolutePath
      try abs.toRealPath()
      catch { case _: java.io.IOException => abs.normalize }
    }
    val outPath = canonical(outDir)
    Seq("store" -> storeDir, "state" -> stateDir).foreach { case (what, dir) =>
      if (canonical(dir) == outPath) {
        System.err.println(
          s"refusing in-place vacuum: <outDir> equals the $what dir '$dir' — " +
            "write to a fresh directory and swap afterwards")
        sys.exit(2)
      }
    }
    val cores = args.sliding(2)
      .collectFirst { case Array("--cores", v) => v.toInt }.getOrElse(8)
    val spark = CanonEngine.session(s"local[$cores]", shufflePartitions = cores)
    spark.sparkContext.setLogLevel("WARN")
    try {
      val store = spark.read.parquet(storeDir)
      val state = spark.read.parquet(stateDir)
      val before = store.count()
      val kept = Incremental.vacuum(store, state)
      kept.write.mode("overwrite").parquet(outDir)
      val after = spark.read.parquet(outDir).count()
      println(s"VACUUM kept=$after dropped=${before - after} of=$before -> $outDir")
    } finally spark.stop()
  }
}
