package graft

import graft.config.DedupConfig
import graft.functions.{Hashing, SimHash, TextShingles}
import graft.operators.{LshCandidates, MinHasher}
import org.apache.spark.sql.functions._

/** Operator-level properties: MinHash estimates Jaccard, the Spark plan
  * matches the JVM oracle, LSH collides high-similarity pairs, SimHash
  * matches the reference's pinned behaviors (test_sim_score.py pattern). */
class MinHashSpec extends SparkSpec {
  import spark.implicits._

  test("Spark minhash signatures equal the JVM oracle signatures") {
    val docs = Seq(
      ("d1", Seq(1L, 2L, 3L, 999999L)),
      ("d2", Seq(5L, 2L, 3L)),
      ("d3", Seq(2000000000L, 7L))).toDF("id", "hs")
    val got = MinHasher.signatures(docs, "id", "hs", 16, 42L)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    docs.collect().foreach { r =>
      val id = r.getString(0)
      val hs = r.getSeq[Long](1)
      assert(got(id).sameElements(MinHasher.signatureJvm(hs, 16, 42L)), id)
    }
  }

  test("row-local signature UDF equals the declarative explode+groupBy plan") {
    val rng = new graft.sources.ClipCorpus.Rng(11L)
    val docs = (0 until 30).map { d =>
      val n = 1 + rng.nextInt(200)
      ("d" + d, (0 until n).map(_ => math.abs(rng.nextLong()) % Hashing.P).distinct)
    }.toDF("id", "hs")
    val declar = MinHasher.signatures(docs, "id", "hs", 64, 42L)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val fast = docs.select($"id", MinHasher.signatureUdf(64, 42L)($"hs").as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(declar.keySet == fast.keySet)
    declar.foreach { case (id, sig) => assert(sig == fast(id), id) }
  }

  test("minhash agreement estimates jaccard within 3 sigma (seeded property sweep)") {
    val rng = new graft.sources.ClipCorpus.Rng(7L)
    (0 until 20).foreach { trial =>
      val n1 = 20 + rng.nextInt(180)
      val n2 = 20 + rng.nextInt(180)
      val overlap = rng.nextInt(math.min(n1, n2) + 1)
      val a = (0 until n1).map(i => Hashing.md5Hash60Jvm(s"a$trial-$i") % Hashing.P).toSet
      val b = ((0 until overlap).map(i => Hashing.md5Hash60Jvm(s"a$trial-$i") % Hashing.P) ++
        (0 until (n2 - overlap)).map(i => Hashing.md5Hash60Jvm(s"b$trial-$i") % Hashing.P)).toSet
      val j = a.intersect(b).size.toDouble / a.union(b).size
      val p = 256
      val sa = MinHasher.signatureJvm(a, p, 42L)
      val sb = MinHasher.signatureJvm(b, p, 42L)
      val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / p
      val sigma = math.sqrt(j * (1 - j) / p) + 1e-9
      assert(math.abs(est - j) <= 3 * sigma + 0.02, s"trial $trial: est $est vs j $j")
    }
  }

  test("LSH: near-identical shingle sets collide, disjoint sets do not") {
    val base = (0 until 100).map(i => ("s" + i).hashCode.toLong.abs % Hashing.P)
    val near = base.drop(5) ++ (0 until 5).map(i => ("t" + i).hashCode.toLong.abs % Hashing.P)
    val far = (0 until 100).map(i => ("z" + i).hashCode.toLong.abs % Hashing.P)
    val df = Seq(("a", base), ("b", near), ("c", far)).toDF("id", "hs")
    val cfg = DedupConfig.default
    val sigs = MinHasher.signatures(df, "id", "hs", cfg.numPerms, cfg.seed)
    val (pairs, dropped) = LshCandidates.candidatePairs(sigs, "id", cfg)
    val got = pairs.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got.contains(("a", "b")), s"expected (a,b) in $got")
    assert(!got.contains(("a", "c")) && !got.contains(("b", "c")))
    assert(dropped.count() == 0)
  }

  test("simhash: identical text -> sim 1; near-identical long text -> sim > 0.5 (reference pin)") {
    // mirrors /root/reference/similarities/tests/test_literalsim.py:67-76
    val t1 = "the quick brown fox jumps over the lazy dog and runs far away into the deep woods tonight"
    val t2 = "the quick brown fox jumps over the lazy dog and runs far away into the deep woods today"
    val s1 = SimHash.signatureJvm(SimHash.tokenizeJvm(t1))
    val s2 = SimHash.signatureJvm(SimHash.tokenizeJvm(t2))
    val s1b = SimHash.signatureJvm(SimHash.tokenizeJvm(t1))
    assert(s1 == s1b)
    val sim = 1.0 - java.lang.Long.bitCount(s1 ^ s2).toDouble / SimHash.Bits
    assert(sim > 0.5, s"sim $sim")
    // unrelated texts score lower than near-identical ones
    val s3 = SimHash.signatureJvm(SimHash.tokenizeJvm("completely different content about spark catalyst optimizers"))
    val simFar = 1.0 - java.lang.Long.bitCount(s1 ^ s3).toDouble / SimHash.Bits
    assert(simFar < sim)
  }

  test("portable md5 hash: JVM == Catalyst column") {
    val df = Seq("hello", "spark graft", "", "ünïcode ✓").toDF("s")
    val rows = df.select($"s", Hashing.md5Hash60($"s").as("h")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == Hashing.md5Hash60Jvm(r.getString(0)), r.getString(0))
    }
  }

  test("char shingles: built-in plan matches naive sliding window") {
    val df = Seq(("x", "abcdefgh"), ("y", "ab")).toDF("id", "t")
    val got = df.select($"id", TextShingles.charShingles($"t", 5).as("sh"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("x") == "abcdefgh".sliding(5).toSeq.distinct)
    assert(got("y").isEmpty)
  }
}
