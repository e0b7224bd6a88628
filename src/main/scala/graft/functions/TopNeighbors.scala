package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored neighbor candidate: input row shape of [[TopNeighbors]]. */
final case class ScoredNbr(nbr: Long, c: Double)

/** Bounded buffer: at most m candidates, sorted best-first by (c desc, nbr
  * asc). Output is the same shape (ids only are consumed downstream). */
final case class NbrList(ids: Seq[Long])

/**
 * Top-m-neighbors aggregation for the kNN-graph builds: keeps each group's m
 * best (score desc, id asc) DISTINCT candidates in an O(m) buffer.
 *
 * Why it exists: ranking neighbors with a window function shuffles the FULL
 * scored candidate relation (O(N²) rows for the exact graph, N·nprobe·bucket
 * rows for the bucketed one) just to keep m per source. An Aggregator lowers
 * to a TypedImperativeAggregate with map-side partial aggregation, so the
 * shuffle carries at most m candidates per (source, mapper) — the graph
 * build's widest shuffle drops from the scored-pairs relation to N·m rows.
 * Selection is by the same total order a `row_number OVER (ORDER BY c DESC,
 * nbr)` window uses, so the emitted edge set is bit-identical; duplicate
 * candidates (a pair meeting in several IVF probe buckets carries the same
 * deterministic score) are folded by id, replacing the separate
 * dropDuplicates shuffle the bucketed build needed.
 */
object TopNeighbors {

  private def wins(a: ScoredNbr, b: ScoredNbr): Boolean =
    a.c > b.c || (a.c == b.c && a.nbr < b.nbr)

  private final class Agg(m: Int)
      extends Aggregator[ScoredNbr, NbrListBuf, NbrList] {
    def zero: NbrListBuf = NbrListBuf(Vector.empty)
    private def insert(b: NbrListBuf, a: ScoredNbr): NbrListBuf = {
      val xs = b.xs
      // common case first, allocation-free: a full buffer whose worst entry
      // beats the candidate. A previously-evicted duplicate also lands here
      // (it lost to m better entries once; it still does).
      if (xs.length >= m && wins(xs.last, a)) b
      else if (xs.exists(_.nbr == a.nbr)) b // duplicate of a retained entry
      else {
        val i = xs.indexWhere(x => wins(a, x))
        val ins = if (i < 0) xs :+ a else (xs.take(i) :+ a) ++ xs.drop(i)
        NbrListBuf(ins.take(m))
      }
    }
    def reduce(b: NbrListBuf, a: ScoredNbr): NbrListBuf = insert(b, a)
    def merge(x: NbrListBuf, y: NbrListBuf): NbrListBuf =
      y.xs.foldLeft(x)(insert)
    def finish(r: NbrListBuf): NbrList = NbrList(r.xs.map(_.nbr))
    def bufferEncoder: Encoder[NbrListBuf] = Encoders.product[NbrListBuf]
    def outputEncoder: Encoder[NbrList] = Encoders.product[NbrList]
  }

  /** `topNeighbors(m)(nbrCol, scoreCol)` -> struct(ids: array<bigint>), the
    * group's m best candidate ids by (c desc, nbr asc), duplicates folded.
    * (The product input encoder flattens to two arguments.) */
  def topNeighbors(m: Int)(nbr: Column, c: Column): Column =
    udaf(new Agg(m), Encoders.product[ScoredNbr]).apply(nbr, c)
}

/** Aggregation buffer of [[TopNeighbors]]: sorted best-first, length <= m. */
final case class NbrListBuf(xs: Seq[ScoredNbr])
