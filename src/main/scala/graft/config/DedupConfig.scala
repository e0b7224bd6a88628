package graft.config

/**
 * All tunables for the dedup pipeline in one place, mirroring the reference's
 * scattered constants (cf. /root/reference: improved_faiss_detector.py:629
 * threshold defaults, similarities/utils/util.py:174-176 mining caps,
 * literal_similarity.py:1023 LCS `min_same_len=70`).
 *
 * The LSH shape follows the standard S-curve: a pair with Jaccard similarity
 * `s` collides in at least one band with probability 1-(1-s^r)^b. With the
 * defaults (b=32, r=4, P=128) the 50% threshold is (1/b)^(1/r) ≈ 0.42, and
 * pairs at s >= 0.6 collide with prob > 0.995 — sized for the >= 0.99
 * dup-pair recall target in BASELINE.json.
 */
final case class DedupConfig(
    // MinHash / LSH
    numPerms: Int = 128,
    bands: Int = 32,
    // text shingling
    charGramK: Int = 5,
    // audio shingling (frame = 25 ms window, 10 ms hop; 8-frame shingles)
    frameMs: Int = 25,
    hopMs: Int = 10,
    framesPerShingle: Int = 6,
    energyLevels: Int = 16,
    // verify thresholds (per-modality, the analog of the reference's fusion
    // weights — improved_faiss_detector.py:238-250)
    textJaccardThreshold: Double = 0.6,
    // audio LSH uses wider bands (r=2) over the same perms: quantization-edge
    // flips in energy codes push worst-case true-pair jaccard toward ~0.45,
    // where r=2/b=64 still collides with prob ~1; the exact-jaccard floor plus
    // the PCM-correlation confirm restore precision.
    audioBands: Int = 64,
    audioJaccardThreshold: Double = 0.35,
    pcmCorrMin: Double = 0.95,
    simHashBits: Int = 60, // 60 portable bits (15 hex chars of md5)
    simHashScreenThreshold: Double = 0.5, // tests/test_literalsim.py:76 pins > 0.5
    // containment pass (literal_similarity.py:1023: shared substring > 70 => dup)
    containmentMinRun: Int = 70,
    // skew guards — "no silent caps": dropped buckets are counted in metrics
    maxBucketSize: Int = 2000,
    maxPairs: Long = 500000L, // utils/util.py:176
    // clustering
    minClusterSize: Int = 2,
    // determinism
    seed: Long = 42L
) {
  require(numPerms % bands == 0, "bands must divide numPerms")
  require(numPerms % audioBands == 0, "audioBands must divide numPerms")
  def rowsPerBand: Int = numPerms / bands
  def audioRowsPerBand: Int = numPerms / audioBands
}

object DedupConfig {
  val default: DedupConfig = DedupConfig()
}
