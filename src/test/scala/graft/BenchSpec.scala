package graft

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The canonical-record protection contract: only an idle median-of-≥3
  * full-suite run may write the committed durable bench file; every
  * other shape diverts to a self-describing sibling. Pure logic — no
  * Spark session. */
class BenchSpec extends AnyFlatSpec with Matchers {

  private val canon = "/root/repo/BENCH_queries.json"

  behavior of "Bench.benchOutputFile"

  it should "write the canonical path only for an idle median-of-3 full run" in {
    Bench.benchOutputFile(canon, partial = false, runs = 3,
      loadavgStart = 0.4, siblingJvms = 0L) shouldBe canon
    // more runs are fine too
    Bench.benchOutputFile(canon, partial = false, runs = 5,
      loadavgStart = 1.5, siblingJvms = 0L) shouldBe canon
  }

  it should "divert a single-pass run to the _loaded sibling" in {
    // the r15 driver shape: runs=1 on a loaded machine overwrote the
    // committed record — this is exactly the write that must divert
    Bench.benchOutputFile(canon, partial = false, runs = 1,
      loadavgStart = 4.25, siblingJvms = 1L) shouldBe
      "/root/repo/BENCH_queries_loaded.json"
    // even an OTHERWISE idle single pass is not a canonical median
    Bench.benchOutputFile(canon, partial = false, runs = 1,
      loadavgStart = 0.1, siblingJvms = 0L) shouldBe
      "/root/repo/BENCH_queries_loaded.json"
  }

  it should "divert on load or sibling JVMs alone" in {
    Bench.benchOutputFile(canon, partial = false, runs = 3,
      loadavgStart = 1.51, siblingJvms = 0L) shouldBe
      "/root/repo/BENCH_queries_loaded.json"
    Bench.benchOutputFile(canon, partial = false, runs = 3,
      loadavgStart = 0.2, siblingJvms = 1L) shouldBe
      "/root/repo/BENCH_queries_loaded.json"
  }

  it should "divert when the environment probes are unreadable" in {
    // a record that cannot prove it was idle is not canonical
    Bench.benchOutputFile(canon, partial = false, runs = 3,
      loadavgStart = -1.0, siblingJvms = 0L) shouldBe
      "/root/repo/BENCH_queries_loaded.json"
    Bench.benchOutputFile(canon, partial = false, runs = 3,
      loadavgStart = 0.2, siblingJvms = -1L) shouldBe
      "/root/repo/BENCH_queries_loaded.json"
  }

  it should "divert a subset run to _partial before any load check" in {
    Bench.benchOutputFile(canon, partial = true, runs = 3,
      loadavgStart = 0.2, siblingJvms = 0L) shouldBe
      "/root/repo/BENCH_queries_partial.json"
    // subset + loaded is still _partial: the record is non-canonical for
    // the stronger reason (it isn't the suite at all)
    Bench.benchOutputFile(canon, partial = true, runs = 1,
      loadavgStart = 9.0, siblingJvms = 2L) shouldBe
      "/root/repo/BENCH_queries_partial.json"
  }

  it should "suffix non-.json paths directly" in {
    Bench.benchOutputFile("/tmp/bench_out", partial = false, runs = 1,
      loadavgStart = 0.1, siblingJvms = 0L) shouldBe "/tmp/bench_out_loaded"
  }
}
