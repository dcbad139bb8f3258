package graft.functions

/** Shared 64-bit mixing kernel (splitmix64 finalizer — a full permutation
  * of Long). Single source of truth for every hash family that remixes
  * (minhash affine pairs, simhash token hashes, shingle hashes, generator
  * shard seeds): a constant tweak here changes them all together instead
  * of silently diverging four private copies. */
object Mix {
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
