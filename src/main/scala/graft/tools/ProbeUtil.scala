package graft.tools

/** Shared plumbing for the scale/decade probes (ScaleR19, SemDecade) —
  * one copy, so a fix to the sampler or the JSON-safe formatter cannot
  * silently miss a sibling tool. */
private[tools] object ProbeUtil {

  /** Locale.ROOT numeric formatting: probe records are parsed JSON
    * (tools/merge_scale.py) — a comma-decimal default locale would emit
    * `"wall_s":12,34` and invalidate them (the Bench.scala rule). */
  def num(fmt: String, v: Double): String =
    String.format(java.util.Locale.ROOT, fmt, Double.box(v))
}

/** 25 ms driver-heap peak sampler; `mark()` resets the peak to the
  * current usage so each operator's reading attributes to it and not to
  * the previous operator's garbage. */
private[tools] final class HeapSampler extends Thread {
  setDaemon(true)
  @volatile private var peak = 0L
  @volatile private var running = true
  def mark(): Unit = peak = used()
  def peakMb: Long = peak >> 20
  private def used(): Long = {
    val r = Runtime.getRuntime; r.totalMemory() - r.freeMemory()
  }
  override def run(): Unit = while (running) {
    val u = used(); if (u > peak) peak = u; Thread.sleep(25)
  }
  def shutdown(): Unit = running = false
}
