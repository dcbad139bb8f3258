package graft.functions

/** Minimal immutable open-addressed set of Longs for broadcast membership
  * probes on hot paths (the decontamination gram probe: one `contains` per
  * corpus CHARACTER). Linear probing at load factor <= 0.5 makes a miss
  * ~1-2 array reads — a sorted-array binary search costs ~log2(n)
  * dependent, cache-missing reads per probe, which measured ~3x slower
  * end-to-end on the same query. 0L marks empty slots, so membership of
  * literal 0L is tracked out-of-band.
  */
final class LongHashSet private (table: Array[Long], mask: Int, hasZero: Boolean)
    extends Serializable {

  def contains(h: Long): Boolean = {
    if (h == 0L) return hasZero
    var i = (h & mask).toInt
    while (true) {
      val v = table(i)
      if (v == h) return true
      if (v == 0L) return false
      i = (i + 1) & mask.toInt
    }
    false // unreachable: load factor <= 0.5 guarantees an empty slot
  }

  def size: Int = {
    var n = if (hasZero) 1 else 0
    var i = 0
    while (i < table.length) { if (table(i) != 0L) n += 1; i += 1 }
    n
  }
}

object LongHashSet {
  /** Build from (not necessarily distinct) values. The probed values are
    * expected pre-mixed (mix64 / murmur outputs), so their low bits index
    * uniformly without re-hashing. */
  def apply(values: Array[Long]): LongHashSet = {
    var cap = 2
    while (cap < values.length * 2) cap <<= 1
    val table = new Array[Long](cap)
    val mask = cap - 1
    var hasZero = false
    var k = 0
    while (k < values.length) {
      val h = values(k)
      if (h == 0L) hasZero = true
      else {
        var i = (h & mask).toInt
        while (table(i) != 0L && table(i) != h) i = (i + 1) & mask
        table(i) = h
      }
      k += 1
    }
    new LongHashSet(table, mask, hasZero)
  }
}
