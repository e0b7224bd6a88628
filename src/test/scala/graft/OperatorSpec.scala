package graft

import graft.functions.AudioPcm
import graft.operators.{ContainmentJoin, PairVerifier}
import org.apache.spark.sql.functions.{col, explode, size}

/** Kernel-level checks for the verify-stage primitives. */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  test("capPairs keeps the top maxPairs by score and reports the dropped count") {
    val pairs = (1 to 10).map(i => (s"a$i", s"b$i", i / 10.0, "m"))
      .toDF("a", "b", "score", "method")
    val (kept, dropped) = PairVerifier.capPairs(pairs, 4L)
    assert(dropped == 6L)
    val scores = kept.select("score").collect().map(_.getDouble(0)).sorted
    assert(scores.sameElements(Array(0.7, 0.8, 0.9, 1.0)))
    val (all, none) = PairVerifier.capPairs(pairs, 100L)
    assert(none == 0L && all.count() == 10L)
  }

  test("jaccardLongJvm: exact on sorted and unsorted inputs, edge cases") {
    assert(PairVerifier.jaccardLongJvm(Array(1L, 2L, 3L), Array(2L, 3L, 4L)) == 0.5)
    assert(PairVerifier.jaccardLongJvm(Array(3L, 1L, 2L), Array(4L, 2L, 3L)) == 0.5)
    assert(PairVerifier.jaccardLongJvm(Array(1L), Array(1L)) == 1.0)
    assert(PairVerifier.jaccardLongJvm(Array(1L), Array(2L)) == 0.0)
    assert(PairVerifier.jaccardLongJvm(Array.empty[Long], Array(1L)) == 0.0)
    assert(PairVerifier.jaccardLongJvm(null, Array(1L)) == 0.0)
  }

  test("estimateJvm: agreement fraction, length-mismatch guard") {
    assert(PairVerifier.estimateJvm(Array(1L, 2L, 3L, 4L), Array(1L, 9L, 3L, 8L)) == 0.5)
    assert(PairVerifier.estimateJvm(Array(1L, 2L), Array(1L, 2L, 3L)) == 0.0)
    assert(PairVerifier.estimateJvm(Array.empty[Long], Array.empty[Long]) == 0.0)
  }

  test("subword counting: BPE-ish regex splits punctuation and digit runs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-subword").toString
    Seq((1L, "Hello, world! v2.0 costs $3"), (2L, "plain words only"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_subword_stats")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // "hello , world ! v 2 . 0 costs $ 3" = 11 subtokens over 5 ws tokens
    assert(out(1L) == ((11L, 11L, 2.2)))
    assert(out(2L) == ((3L, 3L, 1.0)))
  }

  test("pcmCorrJvm int16 kernel is bit-identical to the decoded-float form") {
    val rng = new graft.sources.ClipCorpus.Rng(9L)
    def randBytes(n: Int) = Array.fill[Byte](n)((rng.nextInt(256) - 128).toByte)
    // the formulation pcmCorrJvm replaced: decode to float, correlate
    def floatCorr(a: Array[Byte], b: Array[Byte]): Double = {
      val xa = AudioPcm.decodeJvm(a); val xb = AudioPcm.decodeJvm(b)
      val n = math.min(xa.length, xb.length)
      var sab = 0.0; var saa = 0.0; var sbb = 0.0
      var i = 0
      while (i < n) {
        sab += xa(i).toDouble * xb(i); saa += xa(i).toDouble * xa(i)
        sbb += xb(i).toDouble * xb(i); i += 1
      }
      if (saa == 0.0 || sbb == 0.0) 0.0 else sab / math.sqrt(saa * sbb)
    }
    (0 until 30).foreach { _ =>
      val a = randBytes(4 + rng.nextInt(4000))
      val b = randBytes(4 + rng.nextInt(4001)) // odd lengths included
      assert(PairVerifier.pcmCorrJvm(a, b) == floatCorr(a, b))
    }
    assert(PairVerifier.pcmCorrJvm(null, randBytes(10)) == 0.0)
    assert(PairVerifier.pcmCorrJvm(randBytes(2), randBytes(10)) == 0.0)
    assert(PairVerifier.pcmCorrJvm(Array.fill[Byte](64)(0), randBytes(64)) == 0.0)
  }

  test("sortedDistinct sorts and dedups in place") {
    assert(AudioPcm.sortedDistinct(Array(5L, 1L, 5L, 3L, 1L), 5).toSeq == Seq(1L, 3L, 5L))
    assert(AudioPcm.sortedDistinct(Array(7L, 9L, 9L), 2).toSeq == Seq(7L, 9L))
    assert(AudioPcm.sortedDistinct(Array.empty[Long], 0).isEmpty)
  }

  test("winnowing guarantee: any shared run >= minRun yields a shared fingerprint") {
    val rng = new graft.sources.ClipCorpus.Rng(5L)
    def randText(n: Int): String =
      (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    (0 until 20).foreach { _ =>
      val shared = randText(70) // exactly minRun
      val a = randText(rng.nextInt(200)) + shared + randText(rng.nextInt(200))
      val b = randText(rng.nextInt(200)) + shared + randText(rng.nextInt(200))
      val fa = ContainmentJoin.fingerprintsJvm(a, 70).toSet
      val fb = ContainmentJoin.fingerprintsJvm(b, 70).toSet
      assert(fa.intersect(fb).nonEmpty, s"no shared fingerprint for run of 70")
      // and the exact confirm agrees
      assert(ContainmentJoin.longestCommonRunJvm(a, b) >= 70)
    }
  }

  test("portable winnowing kernel == declarative explode+window plan") {
    // q_containment_fp's oracle SQL mirrors the declarative plan; the query
    // itself runs the row-local kernel — this parity is what keeps the
    // oracle green. Covers: ASCII, multi-byte BMP, non-BMP (surrogate
    // pairs — code-point vs UTF-16 length divergence), exactly-minRun,
    // below-minRun, and repeated text (distinct semantics).
    val rng = new graft.sources.ClipCorpus.Rng(7L)
    def randText(n: Int): String =
      (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val minRun = 70
    val docs = Seq(
      "d0" -> randText(300),
      "d1" -> randText(70),                          // exactly minRun
      "d2" -> randText(69),                          // below: no fingerprints
      "d3" -> (randText(40) + "é↕ßπ" * 20 + randText(40)),    // multi-byte BMP
      "d4" -> (randText(50) + "😀x" * 30 + randText(50)), // non-BMP
      "d5" -> (randText(100) * 3)                    // repeats -> distinct
    ).toDF("doc_id", "t")
    val plan = ContainmentJoin
      .fingerprintsDeclarative(docs, "doc_id", "t", minRun, portable = true)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val kernel = ContainmentJoin.fingerprints(docs, "doc_id", "t", minRun,
      portable = true)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(kernel == plan,
      s"kernel-only=${kernel -- plan}, plan-only=${plan -- kernel}")
    assert(plan.nonEmpty && !plan.exists(_._1 == "d2"))
  }

  test("gram prefilter is a true necessary condition (never rejects a real run)") {
    val rng = new graft.sources.ClipCorpus.Rng(6L)
    def randText(n: Int): String =
      (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val w = 70 - ContainmentJoin.GramK + 1
    (0 until 20).foreach { _ =>
      val shared = randText(70 + rng.nextInt(60))
      val a = randText(rng.nextInt(150)) + shared + randText(rng.nextInt(150))
      val b = randText(rng.nextInt(150)) + shared + randText(rng.nextInt(150))
      val ga = ContainmentJoin.gramHashesJvm(a)
      val gb = ContainmentJoin.gramHashesJvm(b)
      assert(ContainmentJoin.sharedSortedJvm(ga, gb) >= w)
      assert(ContainmentJoin.sharedSorted31Jvm(
        ContainmentJoin.gramHashes31Jvm(a), ContainmentJoin.gramHashes31Jvm(b)) >= w)
    }
  }

  test("small-graph union-find CC equals iterative label propagation") {
    val rng = new graft.sources.ClipCorpus.Rng(11L)
    val edges = (0 until 400).map { _ =>
      val a = f"n${rng.nextInt(200)}%03d"; val b = f"n${rng.nextInt(200)}%03d"
      (a, b)
    }.filter(p => p._1 != p._2).toDF("a", "b")
    val iterative = graft.operators.ConnectedComponents.run(edges)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val local = graft.operators.ConnectedComponents.run(edges, nEdgesHint = 400L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(local == iterative)
    assert(local.nonEmpty)
  }

  test("gram prefilter survives repetitive (low-entropy) shared runs") {
    val rng = new graft.sources.ClipCorpus.Rng(7L)
    def randText(n: Int): String =
      (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val w = 70 - ContainmentJoin.GramK + 1
    // shared run with period 3 << w: few DISTINCT grams, but the multiset
    // intersection still counts every occurrence — a distinct-set prefilter
    // would reject exactly this boilerplate-padding case
    Seq("abc" * 30, "=" * 90, "na " * 35).foreach { shared =>
      val a = randText(100) + shared + randText(100)
      val b = randText(100) + shared + randText(100)
      val ga = ContainmentJoin.gramHashesJvm(a)
      val gb = ContainmentJoin.gramHashesJvm(b)
      assert(ContainmentJoin.sharedSortedJvm(ga, gb) >= w,
        s"prefilter rejected a real repetitive run (${shared.take(6)}...)")
      // the 31-bit pipeline variant is equally sound
      assert(ContainmentJoin.sharedSorted31Jvm(
        ContainmentJoin.gramHashes31Jvm(a), ContainmentJoin.gramHashes31Jvm(b)) >= w)
      // winnowing still selects a shared fingerprint on both sides
      val fa = ContainmentJoin.fingerprintsJvm(a, 70).toSet
      val fb = ContainmentJoin.fingerprintsJvm(b, 70).toSet
      assert(fa.intersect(fb).nonEmpty)
      assert(ContainmentJoin.longestCommonRunJvm(a, b) >= 70)
    }
  }

  test("fused int16 frame kernel == decode-then-frame float path (bit-exact)") {
    // the fused kernel works in the int16 domain (32768x the float RMS);
    // power-of-two scaling commutes with every rounding step, so the values
    // must match EXACTLY after rescale — not approximately
    val rng = new graft.sources.ClipCorpus.Rng(7L)
    (0 until 20).foreach { _ =>
      val n = 500 + rng.nextInt(4000)
      val bytes = Array.fill(2 * n)(rng.nextLong().toByte)
      val samples = AudioPcm.decodeJvm(bytes)
      val frame = 80 + rng.nextInt(200)
      val hop = 20 + rng.nextInt(100)
      val (rms, zcr) = AudioPcm.frameRmsZcrFromPcm(bytes, frame, hop)
      val rmsF = AudioPcm.frameRms(samples, frame, hop)
      val zcrF = AudioPcm.frameZcr(samples, frame, hop)
      assert(zcr.toSeq == zcrF.toSeq)
      assert(rms.length == rmsF.length)
      rms.indices.foreach { i =>
        assert(rms(i) == rmsF(i) * 32768.0,
          s"frame $i: ${rms(i)} vs ${rmsF(i) * 32768.0}")
      }
    }
  }

  test("cappedCollect bounds the gathered list but counts every member") {
    import graft.functions.CappedCollect.cappedCollect
    val rows = (0 until 1000).map(i => (if (i < 950) "hot" else "cold", f"id$i%04d"))
      .toDF("k", "id")
    val out = rows.groupBy("k").agg(cappedCollect(10)(col("id")).as("g"))
      .select(col("k"), size(col("g.ids")).as("kept"), col("g.n"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    // NO group's buffer exceeds cap+1 ids; true sizes stay exact
    assert(out("hot") == ((11, 950L)), s"hot=${out("hot")}")
    assert(out("cold") == ((11, 50L)), s"cold=${out("cold")}")
    // small groups keep their full membership (the pairing path needs it)
    val ids = rows.groupBy("k").agg(cappedCollect(100)(col("id")).as("g"))
      .filter(col("k") === "cold").select(explode(col("g.ids")))
      .collect().map(_.getString(0)).toSet
    assert(ids == (950 until 1000).map(i => f"id$i%04d").toSet)
  }

  test("fused one-shuffle bucket pairing == reference banded self-join") {
    // the pipeline's collect_list + nested-generator pair expansion must
    // emit exactly the pairs of the join-based oracle path on the same
    // signatures, including the bucket-size cap behavior
    val rng = new graft.sources.ClipCorpus.Rng(23L)
    val bands = 8; val rows = 2; val cap = 6
    val sigs = (0 until 120).map { i =>
      // planted collisions: ids sharing i/3 get identical signatures often
      val base = i / 3
      val sig = Array.tabulate(bands * rows)(p =>
        if (rng.nextInt(4) == 0) rng.nextLong() else (base * 31 + p).toLong)
      (f"c$i%03d", sig)
    }.toDF("clip_id", "sig")
    val (refPairs, refDropped) = graft.operators.LshCandidates.candidatePairs(
      sigs, "clip_id", bands, rows, cap)
    val (fusedPairs, fusedDropped) = graft.operators.LshCandidates.fusedCandidatePairs(
      Seq(("m", sigs, bands, rows)), "clip_id", cap)
    val ref = refPairs.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val fused = fusedPairs.select("a", "b")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(ref.nonEmpty, "degenerate fixture: no candidate pairs")
    assert(fused == ref)
    // both paths drop the same number of oversized buckets
    assert(fusedDropped.count() == refDropped.count())
  }

  test("grouped band keys: stride 1 reproduces bandKeysHashed; groupings partition the perms") {
    import graft.operators.LshCandidates
    // stride-1 grouping must emit bit-identical (band, bandVal) keys to the
    // contiguous banding — existing stores are the strides=Seq(1) case
    val sigs = (0 until 20)
      .map(i => (f"c$i%03d", Array.tabulate(128)(k => (i * 1315423911L + k * 2654435761L))))
      .toDF("clip_id", "sig")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val plain = rows(LshCandidates.bandKeysHashed(sigs, "clip_id", 32, 4))
    val g1 = rows(LshCandidates.bandKeysHashedGrouped(sigs, "clip_id", 32, 4, 128, Seq(1)))
    assert(g1 == plain)
    // each stride's 32 quads must partition all 128 perm indices (odd stride
    // = bijection mod 128), and no band quad may repeat across groupings —
    // repeated quads would be correlated coins, not extra OR'd chances
    val strides = graft.config.DedupConfig.default.audioBandGroupStrides
    val quads = strides.map { s =>
      (0 until 32).map(j => (0 until 4).map(k => ((j * 4 + k) * s) % 128).toSet)
    }
    quads.foreach(q => assert(q.flatten.toSet == (0 until 128).toSet))
    val all = quads.flatten
    assert(all.distinct.size == all.size, "band quads repeat across groupings")
    // grouped banding multiplies key rows by the grouping count
    val g3 = LshCandidates.bandKeysHashedGrouped(sigs, "clip_id", 32, 4, 128, strides)
    assert(g3.count() == 20L * 32 * strides.size)
    // VALUE parity for strides > 1, not just structural partitioning: the
    // runtime pmod/element_at loop arithmetic must reproduce hashes built
    // from the scala-side index formula, unrolled here as literal element_at
    // calls (one expected relation per stride: 32 unrolled structs stay
    // under Janino's 64 KB method limit — the loop-shaped production form
    // exists because 3x32 did not)
    import org.apache.spark.sql.functions.{array, element_at, lit, struct, xxhash64}
    val g3rows = g3.collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    strides.zipWithIndex.foreach { case (s, g) =>
      val expectedBands = (0 until 32).map { j =>
        val idxs = (0 until 4).map(k => ((j * 4 + k) * s) % 128)
        struct(lit(g * 32 + j).as("band"),
          xxhash64(array(idxs.map(i => element_at(col("sig"), i + 1)): _*))
            .as("bandVal"))
      }
      sigs.select(col("clip_id"), explode(array(expectedBands: _*)).as("_bk"))
        .select(col("clip_id"), col("_bk.band").as("band"), col("_bk.bandVal").as("bandVal"))
        .collect().foreach { r =>
          assert(g3rows((r.getString(0), r.getInt(1))) == r.getLong(2),
            s"stride=$s band=${r.getInt(1)} clip=${r.getString(0)}")
        }
    }
  }

  test("fusedCandidatePairsCut: pair parity with the uncut path, and free() releases the bucket cache") {
    import graft.operators.LshCandidates
    val rng = new scala.util.Random(7)
    val sigs = (0 until 120).map { i =>
      val base = i / 3
      val sig = Array.tabulate(8)(p =>
        if (rng.nextInt(4) == 0) rng.nextLong() else (base * 31 + p).toLong)
      (f"c$i%03d", sig)
    }.toDF("clip_id", "sig")
    val keyed = Seq("m" -> LshCandidates.bandKeysHashed(sigs, "clip_id", 4, 2))
    val (pairs, dropped, free) =
      LshCandidates.fusedCandidatePairsCut(keyed, "clip_id", 100,
        cacheBuckets = true)
    // reference: the un-fused string-key path (no shared bucket cache)
    val (refPairs, refDropped) =
      LshCandidates.candidatePairs(sigs, "clip_id", 4, 2, 100)
    def pset(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pset(pairs).nonEmpty && pset(pairs) == pset(refPairs))
    assert(dropped.count() == refDropped.count())
    // the lazy bucket cut materialized during the actions above; free() must
    // release its persisted blocks (persistentRdds dropped back to baseline)
    val before = spark.sparkContext.getPersistentRDDs.size
    free()
    assert(spark.sparkContext.getPersistentRDDs.size < before,
      "free() did not release the bucket-gather cache")
  }

  test("salted hot-bucket expansion emits exactly the in-place pairs") {
    // a deliberately hot KEPT band bucket: 60 ids share one signature (cap
    // 100 keeps it), plus a small bucket that stays on the in-place path.
    // saltChunk=7 forces the chunked salt shuffle (ceil(60/7)=9 chunks, 45
    // chunk-pair cells, <= 49 pairs generated per cell — the per-task bound
    // that makes a cap-sized bucket a set of uniform tasks instead of one
    // quadratic straggler).
    val hot = (0 until 60).map(i => (f"h$i%03d", Array.fill(8)(7L)))
    val small = (0 until 4).map(i => (f"s$i%03d", Array.fill(8)(11L)))
    val sigs = (hot ++ small).toDF("clip_id", "sig")
    def run(chunk: Int) = graft.operators.LshCandidates.fusedCandidatePairs(
      Seq(("m", sigs, 4, 2)), "clip_id", 100, saltChunk = chunk)
    val (saltedPairs, saltedDropped) = run(7)
    val (plainPairs, _) = run(Int.MaxValue)
    val s = saltedPairs.select("a", "b")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val p = plainPairs.select("a", "b")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(s == p)
    assert(s.size == 60 * 59 / 2 + 4 * 3 / 2) // exact all-pairs per bucket
    assert(s.forall { case (a, b) => a < b })  // orientation survives salting
    assert(saltedDropped.count() == 0)
  }

  test("salted expansion keeps its explicit task width under AQE") {
    // regression for the pitfall that silently undid the salt: a count-less
    // repartition(cols) before the quadratic expansion gets AQE-coalesced
    // back into ONE task, because coalescing sees only the few-KB
    // pre-expansion cell bytes. The fix pins the salted shuffle to the
    // session's shuffle-partition count, which AQE never coalesces. This
    // asserts the BEHAVIOR (a stage actually runs at the configured width
    // in this AQE-on session) rather than inspecting plan strings: every
    // other stage here is 4 input tasks or AQE-coalesced to ~1, so a stage
    // at width 8 can only be the pinned salted exchange.
    val width = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(width == 8) // the discrimination below assumes the test session
    val widths = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
        widths.add(e.stageInfo.numTasks): Unit
      }
    }
    val hot = (0 until 60).map(i => (f"h$i%03d", Array.fill(8)(7L)))
    val sigs = hot.toDF("clip_id", "sig")
    spark.sparkContext.addSparkListener(l)
    try {
      val (pairs, _) = graft.operators.LshCandidates.fusedCandidatePairs(
        Seq(("m", sigs, 4, 2)), "clip_id", 100, saltChunk = 7)
      assert(pairs.count() == 60L * 59 / 2)
      Thread.sleep(500) // listener bus drain
    } finally spark.sparkContext.removeSparkListener(l)
    val ws = widths.toArray(Array.empty[Integer]).map(_.intValue).toSeq
    assert(ws.exists(_ >= width),
      s"salted expansion ran at widths $ws — AQE coalesced the salt away")
    // isolate the salted exchange: in this AQE-on session every OTHER stage
    // is an input read (<= 4 tasks) or AQE-coalesced (~1 task), so the pinned
    // salted repartition must be the ONLY stage at the configured width —
    // if coalescing thresholds ever change and some unrelated shuffle runs
    // uncoalesced at 8, this count catches the discrimination going stale
    assert(ws.count(_ >= width) == 1,
      s"expected exactly one full-width stage (the pinned salt), got $ws")
  }
}
