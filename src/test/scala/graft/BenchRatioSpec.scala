package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench self-normalization math: parsing the previous artifact's
  * per-query map and the current/previous ratio + catalog-median that
  * machine-flags the shared-host uniform-slowdown mode (BENCH_NOTES r6).
  */
class BenchRatioSpec extends AnyFunSuite {

  test("parseQueries extracts the per-query map from a BENCH_OUT line") {
    val line =
      """{"metric":"total","value":62.100,"unit":"sec","n":5,""" +
        """"load_before":"2.1 1.9 1.5","load_after":"3.0 2.2 1.7",""" +
        """"queries":{"q01_group_agg":0.123,"q64_dedup_clusters":7.510,"q33_fingerprint":1.750},""" +
        """"sf":"/root/testdata/sf0.1"}"""
    assert(Bench.parseQueries(line) === Map(
      "q01_group_agg" -> 0.123,
      "q64_dedup_clusters" -> 7.51,
      "q33_fingerprint" -> 1.75))
  }

  test("parseQueries is empty on missing/malformed blocks") {
    assert(Bench.parseQueries("""{"metric":"total","value":1.0}""") === Map.empty)
    assert(Bench.parseQueries("""{"queries":{}}""") === Map.empty)
    assert(Bench.parseQueries("not json at all") === Map.empty)
  }

  test("ratiosVsPrevious: per-query ratios over the common set, median of odd/even counts") {
    val prev = Map("a" -> 2.0, "b" -> 1.0, "c" -> 4.0, "gone" -> 9.9, "zero" -> 0.0)
    val cur = Seq("a" -> 3.0, "b" -> 1.0, "c" -> 2.0, "new" -> 5.0, "zero" -> 1.0)
    val (rs, median) = Bench.ratiosVsPrevious(cur, prev)
    // "new" has no previous sample; "zero" would divide by zero — both excluded
    assert(rs === Seq("a" -> 1.5, "b" -> 1.0, "c" -> 0.5))
    assert(median === Some(1.0))
    val (_, evenMedian) = Bench.ratiosVsPrevious(cur.take(2), prev)
    assert(evenMedian === Some(1.25)) // (1.0 + 1.5) / 2
  }

  test("a uniform host slowdown moves the median itself") {
    val prev = Map("a" -> 1.0, "b" -> 2.0, "c" -> 3.0, "d" -> 4.0, "e" -> 5.0)
    val slowed = prev.toSeq.sortBy(_._1).map { case (k, v) => k -> v * 1.3 }
    val (_, m) = Bench.ratiosVsPrevious(slowed, prev)
    assert(math.abs(m.get - 1.3) < 1e-9)
    // whereas one real regression leaves the median at parity
    val oneRegression = prev.toSeq.sortBy(_._1).map {
      case ("c", v) => "c" -> v * 3.0
      case (k, v) => k -> v
    }
    val (rs, m2) = Bench.ratiosVsPrevious(oneRegression, prev)
    assert(m2 === Some(1.0))
    assert(rs.toMap.apply("c") === 3.0)
  }

  test("no previous artifact -> no comparison") {
    assert(Bench.ratiosVsPrevious(Seq("a" -> 1.0), Map.empty) === (Seq.empty, None))
  }

  test("parseSf reads the anchor's scale factor; a different sf must void the anchor") {
    val line =
      """{"metric":"total","value":62.100,"unit":"sec",""" +
        """"queries":{"q01_group_agg":0.123},"sf":"/root/testdata/sf0.1","vs_prev":null}"""
    assert(Bench.parseSf(line) === Some("/root/testdata/sf0.1"))
    assert(Bench.parseSf("""{"metric":"total","value":1.0}""") === None)
    // the guard the main loop applies: an sf0.01 run against an sf0.1
    // anchor compares nothing (a ~0.1x wall of ratios would otherwise be
    // shaped exactly like the host-slowdown signal vs_prev flags)
    val prevSf = Bench.parseSf(line)
    assert(!prevSf.contains("/root/testdata/sf0.01"))
    assert(prevSf.contains("/root/testdata/sf0.1"))
    // an anchor with NO sf field is of unknown scale and must also void
    // the comparison — `contains` rejects None where `forall` would
    // silently accept it
    val legacy = Bench.parseSf("""{"metric":"total","value":1.0,"queries":{"q01":0.1}}""")
    assert(legacy === None)
    assert(!legacy.contains("/root/testdata/sf0.1"),
      "a missing sf field must never match any anchor scale")
  }
}
