package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Hash primitives shared by MinHash / SimHash / fingerprinting.
 *
 * Two families:
 *  - "portable" md5-derived hashes: the same value is computable in ANSI SQL
 *    (DuckDB) — used by every oracle-checked query so the driver's DuckDB
 *    compare can recompute signatures bit-for-bit.
 *  - "fast" xxhash64-based hashes: codegen'd Catalyst expressions for the
 *    at-scale pipeline where no SQL oracle is needed.
 *
 * MinHash permutations are affine maps h_i(x) = (a_i*x + b_i) mod P over the
 * Mersenne prime P = 2^31-1. Keeping the base hash and coefficients below
 * 2^31 means a_i*x < 2^62: no int64 overflow in either Spark (which would
 * silently wrap) or DuckDB (which would error).
 *
 * Replaces the reference's token hash (utils/distance.py:158-172
 * `string_hash`) and MD5 content identity (improved_faiss_detector.py:41-50).
 */
object Hashing {
  /** Mersenne prime 2^31 - 1. */
  val P: Long = 2147483647L

  /** 60-bit portable hash: first 15 hex chars of md5, as a long. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 31-bit portable hash (mod P): first 8 hex chars of md5. */
  def md5Hash31(c: Column): Column =
    pmod(conv(substring(md5(c), 1, 8), 16, 10).cast("long"), lit(P))

  /** 31-bit fast hash (mod P) from xxhash64 — codegen'd, no md5 string cost. */
  def fastHash31(c: Column): Column = pmod(xxhash64(c), lit(P))

  /** Same 60-bit portable hash, computed JVM-side (UDF internals, tests). */
  def md5Hash60Jvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = first 7.5 bytes
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** DuckDB SQL text computing md5Hash60(expr). */
  def md5Hash60Sql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"

  /** DuckDB SQL text computing md5Hash31(expr). */
  def md5Hash31Sql(expr: String): String =
    s"(CAST(('0x' || substr(md5($expr), 1, 8)) AS BIGINT) % $P)"

  /**
   * Deterministic affine-permutation coefficients (a_i in [1,P-1], b_i in
   * [0,P-1]) from a seeded xorshift64* stream — no java.util.Random, the
   * constants must be reproducible in generated oracle SQL text.
   */
  def permCoeffs(numPerms: Int, seed: Long): Array[(Long, Long)] = {
    var s = seed ^ 0x9e3779b97f4a7c15L
    def next(): Long = {
      s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
      s * 0x2545f4914f6cdd1dL
    }
    Array.fill(numPerms) {
      val a = java.lang.Math.floorMod(next(), P - 1) + 1
      val b = java.lang.Math.floorMod(next(), P)
      (a, b)
    }
  }

  /** Column form of h_i(x) = (a*x + b) mod P; x must already be in [0, P). */
  def permute(h: Column, a: Long, b: Long): Column =
    pmod(lit(a) * h + lit(b), lit(P))

  /** SQL text form of permute, for oracle generation. */
  def permuteSql(hExpr: String, a: Long, b: Long): String =
    s"(($a * $hExpr + $b) % $P)"

  /** JVM form of permute, for UDF internals / brute-force oracles. */
  def permuteJvm(h: Long, a: Long, b: Long): Long =
    java.lang.Math.floorMod(a * h + b, P)
}
