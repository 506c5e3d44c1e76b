package graft.functions

/** The splitmix64 finalizer (public-domain constant schedule) — the ONE
  * scrambler shared by the minhash family ([[MinHashSig]]), the simhash
  * family ([[SimHashSig]]), and the hyperplane-LSH plane generator
  * (`ops/Similarity`). Centralized so the hash families cannot silently
  * decorrelate through a one-sided edit.
  */
object SplitMix64 {
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
