package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * MinHash signatures as a declarative plan: explode the shingle-hash array,
 * apply P affine permutations, and take per-permutation minima with a single
 * hash aggregation (`groupBy(id).agg(min(h1), ..., min(hP))`) — map-side
 * partial aggregation makes the shuffle carry only P longs per id.
 *
 * Re-expresses the reference's dense-embedding representation
 * (improved_faiss_detector.py:231-257 weighted concat) as the
 * similarity-preserving sketch for Jaccard (axes A+B representation swap).
 *
 * MinHash estimate: P(min_i(A) == min_i(B)) = J(A,B); the signature agreement
 * fraction is an unbiased estimator with stderr ~ sqrt(J(1-J)/P).
 */
object MinHasher {

  /**
   * @param df         input with an id column and a column of distinct
   *                   31-bit shingle hashes (array<long> in [0, P))
   * @param idCol      id column name
   * @param hashesCol  shingle-hash array column name
   * @return (id, sig array<long> of length numPerms); rows with empty
   *         shingle sets are dropped (no signature — mirrors the reference's
   *         empty-input guard, improved_faiss_detector.py:369-372).
   */
  def signatures(df: DataFrame, idCol: String, hashesCol: String,
                 numPerms: Int, seed: Long): DataFrame = {
    val coeffs = Hashing.permCoeffs(numPerms, seed)
    val exploded = df
      .filter(size(col(hashesCol)) > 0)
      .select(col(idCol), explode(col(hashesCol)).as("_h"))
    val mins: Seq[Column] = coeffs.toIndexedSeq.zipWithIndex.map { case ((a, b), i) =>
      min(Hashing.permute(col("_h"), a, b)).as(s"_m$i")
    }
    exploded
      .groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until numPerms).map(i => col(s"_m$i")): _*).as("sig"))
  }

  /**
   * Row-local signature column: the fast path for the clip pipeline. A
   * MinHash signature is a pure function of the row's shingle set, so once
   * the shingles are materialized per row the explode+groupBy formulation
   * above shuffles the whole exploded corpus for nothing — this UDF computes
   * the same signature in one pass with ZERO shuffle. The declarative form
   * is kept for the DuckDB-oracle queries (portable, SQL-reproducible);
   * MinHashSpec pins the two paths equal.
   */
  def signatureUdf(numPerms: Int, seed: Long): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val coeffs = Hashing.permCoeffs(numPerms, seed)
    // primitive coefficient arrays (no tuple unboxing in the hot loop); mod
    // P = 2^31-1 by Mersenne folding — two shift-adds instead of a 64-bit
    // division. This loop runs perms x shingles times per ROW (128 x ~4000
    // for audio): it IS the signature stage's CPU bill.
    val as = coeffs.map(_._1)
    val bs = coeffs.map(_._2)
    val M = Hashing.P
    udf((hashes: Array[Long]) =>
      if (hashes == null || hashes.isEmpty) null
      else {
        val sig = Array.fill(numPerms)(Long.MaxValue)
        var j = 0
        while (j < hashes.length) {
          val h = hashes(j)
          var i = 0
          while (i < numPerms) {
            val x = as(i) * h + bs(i) // h, a < 2^31 => x < 2^62, no overflow
            var v = (x >>> 31) + (x & M)
            v = (v >>> 31) + (v & M)
            if (v >= M) v -= M
            if (v < sig(i)) sig(i) = v
            i += 1
          }
          j += 1
        }
        sig
      })
  }

  /** JVM-side signature of a shingle-hash set — brute-force oracle / tests. */
  def signatureJvm(hashes: Iterable[Long], numPerms: Int, seed: Long): Array[Long] = {
    val coeffs = Hashing.permCoeffs(numPerms, seed)
    val sig = Array.fill(numPerms)(Long.MaxValue)
    hashes.foreach { h =>
      var i = 0
      while (i < numPerms) {
        val v = Hashing.permuteJvm(h, coeffs(i)._1, coeffs(i)._2)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** Fraction of agreeing signature positions — the MinHash Jaccard estimate. */
  def estimateColumn(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => (x === y).cast("int")), _ === 1))
      .cast("double") / size(sigA)
}
