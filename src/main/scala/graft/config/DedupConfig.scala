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
    // text LSH runs on WORD-BIGRAM shingles (candidate generation only): the
    // char-gram background Jaccard between unrelated same-domain transcripts
    // is ~0.1, which leaks O(n^2 * 3e-3) false candidates through b=32/r=4;
    // word bigrams push background to ~0.01 (collision ~1e-8/band) while
    // near-dup transcripts keep J >= ~0.7 (collision ~1 across 32 bands).
    textLshWordNgram: Int = 2,
    // verify thresholds (per-modality, the analog of the reference's fusion
    // weights — improved_faiss_detector.py:238-250); verify metric = exact
    // CHAR-gram jaccard (finer-grained than the LSH's word bigrams)
    textJaccardThreshold: Double = 0.6,
    // audio LSH: r=4/b=32 over the 4-offset-stream shingles. Planted 35 dB
    // near-dups measure J >= ~0.8 -> band collision 1-(1-0.41)^32 ~ 1-5e-8;
    // the r=3/b=42 shape had background-J (~0.005) candidate mass growing
    // ~quadratically with corpus size (measured 108k candidates at 100k
    // clips, 32% jaccard-0) — r=4 cuts background collisions ~260x, which is
    // the difference between O(pairs) and O(n^2) verify shuffle at 10^12.
    audioBands: Int = 32,
    audioRowsPerBand: Int = 4,
    // OR'd audio band GROUPINGS (LshCandidates.bandKeysHashedGrouped): each
    // stride re-partitions the same 128 perms into 32 fresh r=4 quads, so a
    // near-dup pair gets bands*|strides| near-independent collision coins at
    // the SAME S-curve steepness. Sized for the measured miss tail: at 100k
    // clips all 63 recall misses sat in the b=32/r=4 S-curve's designed
    // probabilistic zone (median true J ~ 0.449, P(miss) ~ 0.26 per link);
    // three groupings cut that to ~(0.26)^3 ~ 0.018 per link, buying the
    // >= 0.999 recall margin, while background candidate mass grows only
    // LINEARLY (3x the r=4 background — a r=3 banding instead would grow it
    // ~260x and resurrect the O(n^2) verify-shuffle term at 10^12 rows).
    // Strides must be odd (coprime to numPerms); stride 1 = the original
    // contiguous banding, so Seq(1) is the pre-grouping store layout.
    audioBandGroupStrides: Seq[Int] = Seq(1, 33, 47),
    audioJaccardThreshold: Double = 0.35,
    // signature-estimate prefilter floor: >= 3.5 sigma below the 0.35 verify
    // threshold at P=128 (sigma ~ sqrt(.35*.65/128) ~ 0.042)
    audioEstimateMin: Double = 0.2,
    pcmCorrMin: Double = 0.95,
    simHashBits: Int = 60, // 60 portable bits (15 hex chars of md5)
    simHashScreenThreshold: Double = 0.5, // tests/test_literalsim.py:76 pins > 0.5
    // containment pass (literal_similarity.py:1023: shared substring > 70 => dup)
    containmentMinRun: Int = 70,
    // skew guards — "no silent caps": dropped buckets are counted in metrics
    maxBucketSize: Int = 2000,
    // salted repartitioning for hot (kept) LSH buckets: buckets larger than
    // this expand their pairs through a chunked salt shuffle so no single
    // task generates more than lshSaltChunk^2 pairs (a cap-sized bucket
    // expanded in place is ~2M pairs in one straggler task); buckets at or
    // below it expand in place with no extra shuffle
    lshSaltChunk: Int = 256,
    // containment fingerprint buckets cap out far lower: a fingerprint shared
    // by dozens of documents is boilerplate/template text (shorter than
    // minRun, or mass duplication the exact/minhash paths already catch),
    // and within-bucket pairing is quadratic — measured at 100k clips,
    // boilerplate-driven buckets produced 3.6M candidates of which 99.6%
    // died in the gram prefilter, at ~200s of join I/O (the standard
    // suffix-array-dedup move is exactly this: drop ubiquitous runs).
    // Dropped buckets are metered.
    containmentMaxBucket: Int = 64,
    // containment tier backend: false = winnowing screen + exact verify
    // (ContainmentJoin — the cheap default), true = the EXACT distributed
    // suffix-array substring pass (operators.SuffixArray — no sampling, same
    // predicate; bounded sort rounds over total transcript chars, the honest
    // exact-pass cost). Same pairs by construction (winnowing has exact
    // recall AND an exact verify), pinned by PipelineSpec/SuffixArraySpec —
    // with one unit caveat: the winnowing kernels count run length in
    // UTF-16 units (String.charAt) while the suffix array counts Unicode
    // code points (Spark substr semantics); the two differ only on
    // transcripts containing supplementary-plane characters, where the
    // suffix array's >= minRun is the stricter reading. BATCH-only knob:
    // IncrementalDedup.initialize pins the winnowing backend regardless —
    // the store's containment index is winnowing fingerprints, and
    // merge == rebuild requires both sides to cap hot runs the same way.
    containmentViaSuffixArray: Boolean = false,
    maxPairs: Long = 500000L, // utils/util.py:176
    // clustering
    minClusterSize: Int = 2,
    // determinism
    seed: Long = 42L,
    // when false, skips the driver-side metric collections (each one is a
    // serial Spark action; the bench measures the data path) — production
    // runs keep them on per the north rule's lineage+metrics requirement
    collectMetrics: Boolean = true,
    // when set, the signature stage is committed to a LakeTable under this
    // root instead of localCheckpoint: a restarted job whose input fingerprint
    // (row count + id hash) matches the committed snapshot RESUMES from it
    // without re-signing (north-rule resume-from-checkpoint; localCheckpoint
    // is lost with the executors on a real cluster)
    stageRoot: Option[String] = None
) {
  require(numPerms % bands == 0, "bands must divide numPerms")
  require(audioBands * audioRowsPerBand <= numPerms,
    "audio bands*rows must fit in numPerms")
  require(audioBandGroupStrides.nonEmpty &&
    audioBandGroupStrides.distinct == audioBandGroupStrides &&
    audioBandGroupStrides.forall(s => s > 0 && s % 2 == 1),
    "audioBandGroupStrides must be distinct positive odd ints")
  def rowsPerBand: Int = numPerms / bands

  /** 64-bit hash of every field the SIGNATURE columns depend on. Folded into
    * the resume fingerprint: a committed signature stage is only reusable if
    * it was produced under the same signature-relevant config — resuming a
    * re-tuned job from signatures computed with the old shingle/permutation
    * shape would silently produce wrong clusters. */
  def signatureConfigHash: Long = {
    val s = Seq(numPerms, charGramK, frameMs, hopMs, framesPerShingle,
      energyLevels, textLshWordNgram, simHashBits, containmentMinRun, seed)
      .mkString(",")
    val h1 = scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c)
    val h2 = scala.util.hashing.MurmurHash3.stringHash(s, 0x1b873593)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }
}

object DedupConfig {
  val default: DedupConfig = DedupConfig()
}
