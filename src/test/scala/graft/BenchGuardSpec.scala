package graft

import org.scalatest.funsuite.AnyFunSuite

/** Synthetic-load test of the prior-round band guard (r14 advice #1):
  * BENCH_r14 archived q_text_quality at 1,340 ms (true time 182 ms)
  * because EVERY sample in the measurement window was inflated together —
  * min-of-3 cannot help when the contamination is sustained. The guard
  * compares against the previous round's archived queries_ms, the one
  * reference ambient load can't touch. No Spark session needed: the
  * guard is pure decision logic over (measured min, prior ms).
  */
class BenchGuardSpec extends AnyFunSuite {

  test("parsePriorQueriesMs reads integer-ms pairs out of an escaped artifact tail") {
    // shape of a real BENCH_r{N}.json: metadata + the run's stdout tail
    // as ONE escaped JSON string, containing (possibly truncated)
    // iter_spread arrays, the full-precision seconds line, queries_ms,
    // and the trailer
    val artifact =
      """{
        |  "n": 14, "rc": 0, "cpus": 32, "sf": 0.1,
        |  "tail": "spread_ms\",\"queries\":{\"q_topk\":[80,95],\"q_scan_parquet\":[52,60]}}\n{\"metric\":\"total\",\"value\":27.85,\"unit\":\"sec\",\"queries\":{\"q_topk\":0.080123,\"q_scan_parquet\":0.0529}}\n{\"metric\":\"queries_ms\",\"unit\":\"ms\",\"queries\":{\"q_topk\":80,\"q_scan_parquet\":52,\"q_text_quality\":1340,\"q_dedup_ngram\":2486}}\n{\"metric\":\"total_summary\",\"total_s\":27.85,\"n_queries\":97}"
        |}""".stripMargin
    val prior = BenchGuards.parsePriorQueriesMs(artifact)
    assert(prior === Map(
      "q_topk" -> 80L, "q_scan_parquet" -> 52L,
      "q_text_quality" -> 1340L, "q_dedup_ngram" -> 2486L))
    // iter-spread arrays and the fractional-seconds line must NOT leak in
    // as bogus priors (the regex's int+terminator shape excludes both) —
    // q_topk resolving to 80 (queries_ms), not 0 (truncated float) or
    // 80-from-array, is the witness
  }

  test("outOfBand: sustained contamination flagged, clean runs and noise not") {
    import BenchGuards.outOfBand
    // the r14 incident: prior 95 ms, every sample in the window ~1.3 s
    assert(outOfBand(minSec = 1.34, priorMs = 95),
      "13x-inflated sustained window must be out of band")
    // in-band rerun of the same query
    assert(!outOfBand(minSec = 0.182, priorMs = 95))
    // 3x boundary: just under stays in band
    assert(!outOfBand(minSec = 0.284, priorMs = 95))
    // absolute floor: a 5x blowup of a 50 ms query is scheduler noise
    // territory, not worth retry churn (250 ms absolute floor)
    assert(!outOfBand(minSec = 0.25, priorMs = 50))
    // ...but a genuinely heavy query 3x out IS flagged
    assert(outOfBand(minSec = 7.2, priorMs = 1800),
      "the r10 q_dedup_ngram shape (7.2 s vs 1.8 s band) must be flagged")
  }

  test("mergeMin: per-query min across prior artifacts keeps the clean recording in play") {
    // the default reference is min over the TWO newest archives: if the
    // newest one recorded a contamination-inflated time, the older clean
    // number still bands the next run
    val newest = Map("q_a" -> 1340L, "q_b" -> 500L, "q_new" -> 90L)
    val older = Map("q_a" -> 95L, "q_b" -> 520L)
    val merged = BenchGuards.mergeMin(Seq(newest, older))
    assert(merged === Map("q_a" -> 95L, "q_b" -> 500L, "q_new" -> 90L))
    assert(BenchGuards.mergeMin(Nil) === Map.empty)
  }

  test("simulated bench window: only the sustained-inflation query is flagged") {
    // replicate Bench's decision flow over synthetic sample windows
    val prior = Map("q_a" -> 100L, "q_b" -> 1800L, "q_new" -> 0L)
    def flagged(name: String, samples: Seq[Double],
                retrySamples: Seq[Double]): Boolean =
      prior.get(name).filter(_ > 0).exists { p =>
        var times = samples
        var extra = 0
        while (extra < 2 && BenchGuards.outOfBand(times.min, p)) {
          times = times ++ Seq(retrySamples(extra)); extra += 1
        }
        BenchGuards.outOfBand(times.min, p)
      }
    // sustained load: every sample including retries inflated ~13x
    assert(flagged("q_a", Seq(1.31, 1.34, 1.29), Seq(1.4, 1.35)))
    // transient burst: retries come back in band -> retry rescues the
    // number, nothing archived as suspect
    assert(!flagged("q_a", Seq(1.31, 1.34, 1.29), Seq(0.11, 0.1)))
    // clean heavy query: never enters the retry loop
    assert(!flagged("q_b", Seq(1.9, 2.1, 1.85), Seq(9.9, 9.9)))
    // query with no usable prior (new this round): guard disabled
    assert(!flagged("q_new", Seq(9.0, 9.0, 9.0), Seq(9.0, 9.0)))
  }
}
