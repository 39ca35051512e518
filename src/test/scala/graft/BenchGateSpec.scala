package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the bench self-defense gates: the canary contamination rule
  * (round-7 lesson: the ambient-loadavg gate passed a run at ambient 3.9
  * that carried a uniform ~+1.25 s per-query contention floor) and the
  * scaling-curve exponent fit. */
class BenchGateSpec extends AnyFunSuite {

  test("canary rule: clean at/below 3x floor, contaminated above") {
    assert(!Bench.isContaminated(canaryMedianSec = 0.10, floorSec = 0.10))
    assert(!Bench.isContaminated(canaryMedianSec = 0.30, floorSec = 0.10)) // exactly 3x: clean
    assert(Bench.isContaminated(canaryMedianSec = 0.31, floorSec = 0.10))
    // the r7 shape: +1.25 s additive floor on a ~0.1 s query — flagged
    assert(Bench.isContaminated(canaryMedianSec = 1.35, floorSec = 0.10))
  }

  test("canary rule: a broken floor can never invalidate a run") {
    assert(!Bench.isContaminated(canaryMedianSec = 99.0, floorSec = 0.0))
    assert(!Bench.isContaminated(canaryMedianSec = 99.0, floorSec = -1.0))
  }

  test("run rule: ambient load stamps even when both canaries pass (r12 blind spot)") {
    // the exact round-12 failure mode, replayed from BENCH.json's numbers:
    // cpu canary 0.0787 (floor 0.11), bw canary 0.4314 (floor 0.65) — both
    // comfortably clean — while the run launched at ambient loadavg 2.99
    // and the shared cohort carried a uniform 1.355× inflation. The run
    // rule must stamp contaminated: true from the JSON alone.
    assert(Bench.isRunContaminated(0.0787, 0.4314, ambientLoad = 2.99))
    // an idle launch with the same clean canaries stays clean
    assert(!Bench.isRunContaminated(0.0787, 0.4314, ambientLoad = 0.3))
    // record-bench convention headroom: ambient < 0.5 is well under the cap
    assert(!Bench.isRunContaminated(0.05, 0.3, ambientLoad = 0.49))
    // exactly at the cap: clean (the boundary mirrors isContaminated's)
    assert(!Bench.isRunContaminated(0.05, 0.3, ambientLoad = Bench.AmbientLoadCap))
    assert(Bench.isRunContaminated(0.05, 0.3, ambientLoad = Bench.AmbientLoadCap + 0.01))
    // either canary still stamps independently of ambient
    assert(Bench.isRunContaminated(3 * Bench.CanaryFloorSec + 0.01, 0.3, ambientLoad = 0.1))
    assert(Bench.isRunContaminated(0.05, 3 * Bench.BandwidthCanaryFloorSec + 0.01, ambientLoad = 0.1))
    // unreadable loadavg (-1, non-Linux) never stamps; a broken cap never
    // stamps — misconfiguration must not invalidate runs
    assert(!Bench.isRunContaminated(0.05, 0.3, ambientLoad = -1.0))
    assert(!Bench.isRunContaminated(0.05, 0.3, ambientLoad = 99.0, ambientCap = 0.0))
  }

  test("uniform-drift stamp: fires on the r14 finaltree records replayed, silent on the clean pair") {
    // replay the exact records that motivated the stamp: both r14
    // finaltree runs carried a uniform ~1.23x machine-state signature
    // against r13's committed record while passing every other gate;
    // the morning pair and the r15 quiet pair read parity
    def queriesOf(path: String): Map[String, Double] = {
      val f = new java.io.File(path)
      assert(f.isFile, s"committed bench record missing: $path")
      Bench.parseQueries(new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    }
    val ref = queriesOf("bench_logs/r13_final_168q_c.json")
    assert(ref.size >= 160)
    val (driftA, ratioA) =
      Bench.uniformDrift(queriesOf("bench_logs/r14_finaltree_171q_a.json"), ref)
    assert(driftA && ratioA > 1.2, s"finaltree-a must stamp (got $ratioA)")
    val (driftB, ratioB) =
      Bench.uniformDrift(queriesOf("bench_logs/r14_finaltree_171q_b.json"), ref)
    assert(driftB && ratioB > 1.2, s"finaltree-b must stamp (got $ratioB)")
    for (clean <- Seq("bench_logs/r14_final_171q_1.json",
        "bench_logs/r14_final_171q_2.json", "bench_logs/r14_bisect_171q.json")) {
      val (drift, ratio) = Bench.uniformDrift(queriesOf(clean), ref)
      assert(!drift && ratio > 0 && ratio < Bench.UniformDriftFactor,
        s"$clean must stay silent (got $ratio)")
    }
  }

  test("uniform-drift stamp: small shared cohorts never stamp; zero references are ignored") {
    val ref = (1 to 29).map(i => s"q$i" -> 1.0).toMap
    val cur = ref.map { case (k, _) => k -> 10.0 }
    assert(Bench.uniformDrift(cur, ref) == (false, -1.0)) // 29 < MinSharedForDrift
    val ref30 = (1 to 30).map(i => s"q$i" -> 1.0).toMap + ("z" -> 0.0)
    val cur30 = ref30.map { case (k, _) => k -> 2.0 }
    val (d, r) = Bench.uniformDrift(cur30, ref30) // "z" filtered, 30 remain
    assert(d && r == 2.0)
  }

  test("parseQueries reads exactly the dict fullJson writes") {
    val json = """{"metric":"total","value":1.5,"unit":"sec","queries":{"a_b":0.1234,"c":2.0},"min":{"a_b":0.1}}"""
    assert(Bench.parseQueries(json) == Map("a_b" -> 0.1234, "c" -> 2.0))
    assert(Bench.parseQueries("{}").isEmpty)
    assert(Bench.parseQueries("""{"queries":{}}""").isEmpty)
  }

  test("the COMMITTED pace reference parses (a spaced-separator rewrite would silently disable the stamp)") {
    val f = new java.io.File("bench_logs/pace_reference.json")
    assert(f.isFile, "bench_logs/pace_reference.json missing")
    val ref = Bench.parseQueries(new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    assert(ref.size >= 160, s"pace reference unreadable by parseQueries (got ${ref.size} entries)")
  }

  test("canary query is SF-independent and returns one row") {
    val spark = TestSpark.spark
    val rows = Bench.canaryQuery(spark).collect()
    assert(rows.length == 1)
    // deterministic: xxhash64 over a fixed range — same sum every run
    assert(rows(0).getLong(0) == Bench.canaryQuery(spark).collect()(0).getLong(0))
  }

  test("bandwidth canary: deterministic one-row result; floor gates via the shared rule") {
    val spark = TestSpark.spark
    val rows = Bench.bandwidthCanaryQuery(spark).collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) ==
      Bench.bandwidthCanaryQuery(spark).collect()(0).getLong(0))
    // the bw canary uses the same contamination rule with its own floor:
    // either canary over 3x its floor stamps the run
    assert(!Bench.isContaminated(1.95, floorSec = Bench.BandwidthCanaryFloorSec))
    assert(Bench.isContaminated(1.96, floorSec = Bench.BandwidthCanaryFloorSec))
  }

  test("windowed canary rule: a hot checkpoint taints exactly its adjacent windows") {
    val f = Bench.MicroCanaryFloorSec
    val bwF = Bench.MicroBandwidthCanaryFloorSec
    val clean = f; val hot = 3 * f + 0.01
    val bwClean = bwF
    // 4 checkpoints bracket 3 windows; checkpoint 1 hot ⇒ windows 0 and 1
    // (the windows it brackets) flagged, window 2 stays clean evidence
    assert(Bench.contaminatedWindows(
      Seq(clean, hot, clean, clean), Seq.fill(4)(bwClean)) ==
      Seq(true, true, false))
    // the bw canary flags through the same rule independently of cpu
    assert(Bench.contaminatedWindows(
      Seq.fill(4)(clean), Seq(bwClean, bwClean, 3 * bwF + 0.01, bwClean)) ==
      Seq(false, true, true))
    // all clean ⇒ no windows flagged; exactly 3x stays clean (the
    // isContaminated boundary)
    assert(Bench.contaminatedWindows(
      Seq(clean, 3 * f, clean), Seq.fill(3)(bwClean)) == Seq(false, false))
    // fewer than two checkpoints bracket no windows
    assert(Bench.contaminatedWindows(Seq(hot), Seq(bwClean)).isEmpty)
    assert(Bench.contaminatedWindows(Nil, Nil).isEmpty)
    // a failed checkpoint sample (-1) or broken floor never flags
    assert(Bench.contaminatedWindows(
      Seq(-1.0, clean, -1.0), Seq.fill(3)(bwClean)) == Seq(false, false))
    assert(Bench.contaminatedWindows(
      Seq(hot, hot), Seq(bwClean, bwClean), cpuFloor = 0.0) == Seq(false))
  }

  test("scaling slope: exact powers recover their exponent") {
    val sfs = Seq(0.001, 0.01, 0.1).map(math.log)
    def times(exp: Double) = Seq(0.001, 0.01, 0.1).map(sf => math.log(math.pow(sf, exp)))
    assert(math.abs(ScalingCurve.slope(sfs, times(1.0)) - 1.0) < 1e-9)
    assert(math.abs(ScalingCurve.slope(sfs, times(2.0)) - 2.0) < 1e-9)
    // constant time (fully overhead-dominated) fits exponent 0
    assert(math.abs(ScalingCurve.slope(sfs, Seq(0.0, 0.0, 0.0))) < 1e-9)
  }

  test("scaling targets all exist in the query registry") {
    val missing = ScalingCurve.Targets.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"unknown scaling targets: $missing")
  }

  test("reference-outlier guard: the r16 wav_profiles miss replayed fires; sane cases stay silent") {
    // the exact r16 failure: wav_profiles at 8.12 s vs its 2.21 s
    // reference (×3.7) inside a run pacing 1.10× overall — the within-run
    // spread rule saw identical reps and kept it. The guard must flag
    // exactly that query at that pace.
    val ref = Map("wav_profiles" -> 2.21, "a" -> 1.0, "b" -> 4.0)
    val cur = Map("wav_profiles" -> 8.12, "a" -> 1.1, "b" -> 4.4)
    assert(Bench.referenceOutliers(cur, ref, paceRatio = 1.10) == Set("wav_profiles"))
    // under the 2.5× factor: silent
    assert(Bench.referenceOutliers(
      Map("wav_profiles" -> 5.0, "a" -> 1.1), ref, 1.10).isEmpty)
    // machine-wide slowdown (pace past the ceiling) is the uniform-drift
    // stamp's territory — the guard must NOT fire a mass re-measure
    assert(Bench.referenceOutliers(cur, ref, paceRatio = 1.45).isEmpty)
    // no reference cohort (subset run, missing file): pace −1 → silent
    assert(Bench.referenceOutliers(cur, ref, paceRatio = -1.0).isEmpty)
    // a zero/negative reference time can never divide its way into a flag
    assert(Bench.referenceOutliers(
      Map("z" -> 1.0), Map("z" -> 0.0), 1.0).isEmpty)
    // new queries absent from the reference are never flagged
    assert(Bench.referenceOutliers(
      Map("new_q" -> 99.0), ref, 1.0).isEmpty)
  }

  test("compact line stays bounded under a full-suite rerun (r15 parsed:null)") {
    // the exact r15 failure replayed: every registered query flagged
    // suspicious (ambient residue > loadCap), so every name lands in the
    // rerun list. The compact stdout line must stay one parseable ≤2 KB
    // object no matter the suite size — names are inlined only up to
    // RerunInlineCap; the true count travels as rerun_count.
    val allNames = SparkEntry.queries.keys.toSeq.sorted
    assert(allNames.size >= 170, "registry shrank; the scenario lost its teeth")
    val top15 = allNames.take(15).map(_ -> 123.4567)
    val line = Bench.compactLine(
      total = 9999.9, topQueries = top15, queriesTotal = allNames.size,
      sfDir = "/root/testdata/sf0.1", contaminated = false,
      uniformDrift = false, paceRatio = 0.95, rerunNames = allNames,
      reps = 3, subset = false, failed = 0, settleSec = 42.0,
      outlierCount = allNames.size)
    assert(!line.contains("\n"))
    assert(line.length <= 2048, s"compact line ${line.length} chars > 2048")
    assert(line.contains(s""""rerun_count":${allNames.size}"""))
    // the r17 outlier guard's count is a bounded scalar, names stay in
    // the full record only
    assert(line.contains(s""""outlier_count":${allNames.size}"""))
    // the inline list is capped, and the cap is visible in the JSON shape
    val rerunField = line.split("\"rerun\":\\[")(1).split("\\]")(0)
    assert(rerunField.split(",").length == Bench.RerunInlineCap)
    // balanced braces/brackets — the crude structural check a tail-window
    // parser needs (no partial object can satisfy it)
    assert(line.count(_ == '{') == line.count(_ == '}'))
    assert(line.count(_ == '[') == line.count(_ == ']'))
    assert(line.startsWith("{") && line.endsWith("}"))
  }

  test("settleAmbient waits out loadavg residue and gives up at the bound") {
    // decaying residue: 4.2 → 2.8 → 1.1 (the driver-launch shape); the
    // settle loop must return the first under-cap sample and a positive wait
    val decay = Iterator(4.2, 2.8, 1.1)
    val (a1, w1) = Bench.settleAmbient(cap = 2.0, maxSec = 60.0,
      sample = () => decay.next(), sleepMs = 1)
    assert(a1 == 1.1 && w1 > 0.0)
    // already clean: no wait, no extra samples drawn
    var draws = 0
    val (a2, w2) = Bench.settleAmbient(cap = 2.0, maxSec = 60.0,
      sample = () => { draws += 1; 0.3 }, sleepMs = 1)
    assert(a2 == 0.3 && draws == 1 && w2 < 1.0)
    // never-settling load: gives up at the bound and reports the hot value
    // honestly (the contamination stamp then fires downstream as before)
    val (a3, w3) = Bench.settleAmbient(cap = 2.0, maxSec = 0.02,
      sample = () => 9.9, sleepMs = 1)
    assert(a3 == 9.9 && w3 >= 0.02)
    // settle disabled (maxSec 0): single sample, immediate return
    val (a4, _) = Bench.settleAmbient(cap = 2.0, maxSec = 0.0,
      sample = () => 9.9, sleepMs = 1)
    assert(a4 == 9.9)
  }
}
