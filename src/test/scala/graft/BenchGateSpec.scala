package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-5 degraded-window self-identification in
  * [[Bench.degradedWindowConfirmed]] — the spread rule's blind spot
  * (two trials inflated by the same sustained host-degradation window
  * confirm each other) must surface as a flag in the errors map, not
  * require judge adjudication. No SparkSession needed: the decision is
  * a pure function of the trial log and the persisted record.
  */
class BenchGateSpec extends AnyFunSuite {
  private def trial(t: Double, before: Boolean, after: Boolean) =
    Bench.HeadlineTrial(t, before, after)

  test("the round-4 incident self-identifies with or without a record") {
    // r4 driver artifact: staged trials 149.18 (calm=true/false) and
    // 150.61 (false/false) confirmed each other; record was 4.33 s
    val trials = Seq(trial(149.18, before = true, after = false),
      trial(150.61, before = false, after = false))
    assert(Bench.degradedWindowConfirmed(trials, 149.18, Some(4.33)))
    // no record file: the not-calm probes are the fallback signal
    assert(Bench.degradedWindowConfirmed(trials, 149.18, None))
    // even if every probe had read calm, the record comparison flags it
    val calmTrials = trials.map(_.copy(calmBefore = true, calmAfter = true))
    assert(Bench.degradedWindowConfirmed(calmTrials, 149.18, Some(4.33)))
  }

  test("a clean calm-window record run carries no flag") {
    // r4 final record run: staged confirmed 4.33/4.33, calm probes
    val trials = Seq(trial(4.33, before = true, after = true),
      trial(4.33, before = true, after = true))
    assert(!Bench.degradedWindowConfirmed(trials, 4.33, Some(4.33)))
    assert(!Bench.degradedWindowConfirmed(trials, 4.33, None))
    // up to 2x the record is within the documented host-noise band
    assert(!Bench.degradedWindowConfirmed(trials.map(t => t.copy(t = 8.0)), 8.0, Some(4.33)))
  }

  test("near-record value with a drifted probe is NOT flagged (probe noise)") {
    // the probe ratchet drifts within-run (r4: +27% ALU drift starved
    // the old probe gate); when a record exists it supersedes probes,
    // so an honest 1.1x-of-record window with one not-calm probe ships
    // clean instead of crying wolf
    val trials = Seq(
      trial(4.9, before = true, after = false),
      trial(5.9, before = true, after = true))
    assert(!Bench.degradedWindowConfirmed(trials, 4.9, Some(4.33)))
    // without a record the same probes DO flag (no other signal)
    assert(Bench.degradedWindowConfirmed(trials, 4.9, None))
  }

  test("record-less fallback looks only at the CONFIRMING pair's probes") {
    // a rejected slow outlier with dirty probes must not taint an
    // otherwise calm confirmed pair
    val trials = Seq(
      trial(30.0, before = false, after = false), // wave-hit outlier, not in the pair
      trial(4.4, before = true, after = true),
      trial(4.5, before = true, after = true))
    assert(!Bench.degradedWindowConfirmed(trials, 4.4, None))
  }

  test("records file roundtrip and corrupt-file fallback") {
    val dir = java.nio.file.Files.createTempDirectory("benchgate")
    val p = dir.resolve("RECORDS.json").toString
    assert(Bench.readRecords(p).isEmpty) // absent
    java.nio.file.Files.write(dir.resolve("RECORDS.json"),
      "{\"canon_staged_20kgraphs\":4.33,\"canon_fused_20kgraphs\":1.815}".getBytes)
    val r = Bench.readRecords(p)
    assert(r == Map("canon_staged_20kgraphs" -> 4.33, "canon_fused_20kgraphs" -> 1.815))
    java.nio.file.Files.write(dir.resolve("RECORDS.json"), "not json".getBytes)
    assert(Bench.readRecords(p).isEmpty) // corrupt -> no record gate
  }
}
