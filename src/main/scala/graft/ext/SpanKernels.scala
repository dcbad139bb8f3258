package graft.ext

import graft.functions.ShingleHashes

/** JVM kernels behind [[Dedup.duplicatedSpans]] / [[Dedup.stripDuplicatedSpans]].
  * Pure functions over strings — partition-local, no Spark types — kept
  * separate so they unit-test without a session and serialize cheaply
  * into the UDF closures.
  */
private[ext] object SpanKernels {

  /** Winnowing fingerprints (Schleimer et al. '03, robust winnowing): the
    * minimum `gram`-hash of every `w`-window of consecutive positions,
    * rightmost-minimum on ties, each selected position emitted once.
    * Guarantee: two copies of any common substring of length >=
    * w + gram - 1 select at least one identical (hash, aligned-content)
    * anchor. Hashes are the [[ShingleHashes]] rolling family (signed-long
    * min — arbitrary but identical on both copies, which is all
    * winnowing needs). Returns (hash, position) pairs in text order;
    * empty for null/short input. O(len) via a monotone deque. */
  def winnowAnchors(s: String, gram: Int, w: Int): Array[(Long, Int)] = {
    if (s == null || s.length < gram) return Array.empty
    val m = s.length - gram + 1
    val hs = new Array[Long](m)
    var i = 0
    ShingleHashes.anyWindow(s, gram, 0L) { h => hs(i) = h; i += 1; false }
    if (m <= w) {
      // single window: global rightmost minimum
      var best = 0
      var j = 1
      while (j < m) { if (hs(j) <= hs(best)) best = j; j += 1 }
      return Array((hs(best), best))
    }
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Int)]
    // monotone deque of indices with strictly increasing hash values;
    // rightmost-min tie-break = evict equal hashes when pushing
    val dq = new Array[Int](m)
    var head = 0; var tail = 0 // [head, tail)
    var last = -1
    var j = 0
    while (j < m) {
      while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
      dq(tail) = j; tail += 1
      val lo = j - w + 1
      if (lo >= 0) {
        while (dq(head) < lo) head += 1
        val sel = dq(head)
        if (sel != last) { out += ((hs(sel), sel)); last = sel }
      }
      j += 1
    }
    out.toArray
  }

  /** Maximal common extension around a seed match: verifies the
    * `gram`-char seed at (pa, pb) char-by-char (killing hash collisions
    * — returns null on mismatch or out-of-range), then extends left and
    * right as far as the strings agree. Returns (start_a, start_b, len). */
  def extendMatch(ta: String, tb: String, pa: Int, pb: Int,
                  gram: Int): (Int, Int, Int) = {
    if (ta == null || tb == null) return null
    if (pa < 0 || pb < 0 || pa + gram > ta.length || pb + gram > tb.length) return null
    var j = 0
    while (j < gram) {
      if (ta.charAt(pa + j) != tb.charAt(pb + j)) return null
      j += 1
    }
    var l = 0
    while (pa - l - 1 >= 0 && pb - l - 1 >= 0 &&
      ta.charAt(pa - l - 1) == tb.charAt(pb - l - 1)) l += 1
    var r = 0
    while (pa + gram + r < ta.length && pb + gram + r < tb.length &&
      ta.charAt(pa + gram + r) == tb.charAt(pb + gram + r)) r += 1
    (pa - l, pb - l, l + gram + r)
  }

  /** Maximal within-document repeated spans >= minLen: winnowing anchors
    * grouped by hash inside ONE text, each distinct position pair
    * extended to its maximal match (same guarantee as the cross-doc
    * path — a self-repeat of length >= w + gram - 1 always shares an
    * anchor with its copy). Pure per-document function; `maxPairs`
    * bounds the quadratic blowup of pathologically periodic documents
    * (the within-doc analog of the anchor-occurrence cap). Returns
    * distinct maximal (start_a, start_b, len) with start_a < start_b. */
  def selfRepeats(text: String, gram: Int, w: Int, minLen: Int,
                  maxPairs: Int): Array[(Int, Int, Int)] = {
    val anchors = winnowAnchors(text, gram, w)
    if (anchors.length < 2) return Array.empty
    val byHash = new java.util.HashMap[Long, java.util.ArrayList[Int]]
    anchors.foreach { case (h, p) =>
      byHash.computeIfAbsent(h, _ => new java.util.ArrayList[Int]).add(p)
    }
    val out = new java.util.LinkedHashSet[(Int, Int, Int)]
    var pairs = 0
    val it = byHash.values().iterator()
    while (it.hasNext && pairs < maxPairs) {
      val ps = it.next()
      if (ps.size > 1) {
        var i = 0
        while (i < ps.size && pairs < maxPairs) {
          var j = i + 1
          while (j < ps.size && pairs < maxPairs) {
            pairs += 1
            val m = extendMatch(text, text, ps.get(i), ps.get(j), gram)
            if (m != null && m._3 >= minLen && m._1 != m._2) {
              val span = if (m._1 < m._2) m else (m._2, m._1, m._3)
              out.add(span)
            }
            j += 1
          }
          i += 1
        }
      }
    }
    out.toArray(Array.empty[(Int, Int, Int)])
  }

  /** Remove the given (start, len) ranges from `text`, overlapping or
    * adjacent ranges merged first, out-of-bounds clamped. */
  def cutRanges(text: String, ranges: Array[(Int, Int)]): String = {
    if (ranges.isEmpty) return text
    val sorted = ranges
      .map { case (s, l) => (math.max(0, s), math.min(text.length.toLong, s.toLong + l).toInt) }
      .filter { case (s, e) => e > s }
      .sortBy(_._1)
    if (sorted.isEmpty) return text
    val sb = new java.lang.StringBuilder(text.length)
    var pos = 0
    var i = 0
    while (i < sorted.length) {
      val (s, e) = sorted(i)
      if (s > pos) sb.append(text, pos, s)
      if (e > pos) pos = e
      i += 1
    }
    if (pos < text.length) sb.append(text, pos, text.length)
    sb.toString
  }
}
