package graft.ops

/** Tunables of the similarity/dedup family (MinHash-LSH, random-hyperplane
  * LSH, k-means IVF) — previously compile-time constants whose docstrings
  * said "raise at larger corpora" without a knob to raise.
  *
  * Every op takes a SimilarityConfig (defaulting to [[SimilarityConfig.Default]],
  * which reproduces the historical constants bit-for-bit), and every
  * DuckDB oracle generator takes the SAME config, so a non-default run
  * stays oracle-checkable — parity cannot silently break on a constant
  * change (it did once: the k-means SQL hardcoded 8/3).
  *
  * Scale guidance (why these are the knobs that must move with corpus
  * size n):
  *  - `lshRows` (hyperplane bits per band = lshBits/lshBands) bounds the
  *    embedding band key space at 2^lshRows keys; buckets average
  *    n/2^lshRows, so rows must grow ~log2(n) to keep buckets bounded.
  *    More bits at fixed band count also sharpens each band (lower false
  *    positive rate) — raise lshBits with corpus size.
  *  - `minHashK` controls band count (k/2 bands of 2 rows): more bands =
  *    higher near-dup recall at the same per-band precision. The MinHash
  *    band key space is already (2^31)^2 — bucket size there is driven by
  *    true near-dup clusters, which is what [[bucketCap]] guards.
  *  - `kmeansK` is the IVF cluster count: probe cost ∝ K·dim and
  *    per-cluster scan cost ∝ n/K, balanced at K ≈ √n (the standard IVF
  *    nlist rule).
  */
final case class SimilarityConfig(
    /** MinHash permutations; bands = minHashK/2 (2 rows per band). Even,
      * ≤ the family size (16). */
    minHashK: Int = 8,
    /** Random-hyperplane bits for embedding LSH. */
    lshBits: Int = 32,
    /** Bands the lshBits split into (lshBits divisible by lshBands). */
    lshBands: Int = 4,
    /** k-means cluster count (IVF nlist). */
    kmeansK: Int = 8,
    /** Lloyd iterations. */
    kmeansIters: Int = 3,
    /** Seed Lloyd with k-means‖ (Bahmani et al., VLDB 2012) instead of the
      * naive head-of-table seed. Deterministic (hash-coin sampling), label
      * -free, and the right choice once kmeansK grows with √n: the naive
      * seed draws all K centers from wherever the smallest vec_ids happen
      * to sit, while k-means‖ spreads them d²-proportionally in
      * O(kmeansParRounds) corpus passes. Opt-in because the DuckDB oracle
      * mirrors only the naive seed (the ‖ sampling is a multi-round
      * driver/cluster loop, not one SQL expression). */
    kmeansParSeeding: Boolean = false,
    /** k-means‖ sampling rounds (each ≈ one corpus pass; paper: O(log n)
      * in theory, ~4-8 in practice). */
    kmeansParRounds: Int = 4,
    /** k-means‖ per-round oversampling factor ℓ; 0 → 2·kmeansK (paper's
      * recommended range is 0.5k–2k). */
    kmeansParOversample: Int = 0,
    /** Fail-fast ceiling on any LSH band bucket: a larger bucket means the
      * key space is misconfigured for the corpus (or a huge exact-dup
      * cluster needs dedupExact first) — raise the rows/bits knobs rather
      * than this cap. */
    bucketCap: Int = 4096,
    /** Product-quantization subspaces (must divide the embedding dim 64).
      * Each vector compresses to pqM sub-codes — the corpus-sized ANN
      * structure shrinks from dim doubles to pqM small ints per vector. */
    pqM: Int = 8,
    /** Codes per subspace codebook (≤ 256 keeps a code byte-sized at
      * scale; the ADC lookup table is pqM × pqK integers). */
    pqK: Int = 16,
    /** Per-subspace Lloyd iterations for PQ codebook training. */
    pqIters: Int = 3,
    /** ADC candidate pool re-ranked with exact cosine (the refine step);
      * recall@k is governed by pqRefine/k, IO by pqRefine point reads. */
    pqRefine: Int = 50) {
  require(minHashK >= 2 && minHashK % 2 == 0, s"minHashK even >= 2 (got $minHashK)")
  require(lshBits % lshBands == 0, s"lshBands must divide lshBits ($lshBits/$lshBands)")
  /** Hyperplane bits per band — the embedding band key space is 2^lshRows. */
  def lshRows: Int = lshBits / lshBands
  require(lshRows <= 62, s"band key must fit a positive Long (rows=$lshRows)")
  require(pqM > 0 && 64 % pqM == 0, s"pqM must divide dim 64 (got $pqM)")
  require(pqK >= 2 && pqK <= 256, s"pqK in [2, 256] (got $pqK)")
  require(pqRefine > 0, s"pqRefine must be positive (got $pqRefine)")
  /** Dims per PQ subspace. */
  def pqSub: Int = 64 / pqM
}

object SimilarityConfig {
  /** The historical constants — every driver query runs with these. */
  val Default: SimilarityConfig = SimilarityConfig()

  /** Corpus-size-aware defaults: lshRows ≈ log2(n)+2 (expected bucket size
    * ≈ n/2^rows ≤ 1/4 corpus-independent), kmeansK ≈ √n, and more MinHash
    * bands at larger n to hold near-dup recall as shingle diversity grows. */
  def forCorpus(nDocs: Long): SimilarityConfig = {
    val log2n = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, nDocs)))
    val rows = math.min(24, log2n + 2)
    val bands = 4
    val k = if (nDocs > 1000000L) 16 else 8
    val km = math.max(8, math.min(65536, math.round(math.sqrt(nDocs.toDouble)).toInt))
    SimilarityConfig(
      minHashK = k,
      lshBits = rows * bands,
      lshBands = bands,
      kmeansK = km,
      kmeansIters = 3)
  }
}
