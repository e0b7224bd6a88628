package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Result of a size-capped gather: at most cap+1 member ids, exact count. */
final case class CappedList(ids: Seq[String], n: Long)

/**
 * Size-capped collect_list: gathers at most `limit`+1 elements per group
 * while counting ALL of them — the aggregation buffer is bounded by the cap
 * regardless of group size.
 *
 * Why it exists: LSH band buckets are capped at cfg.maxBucketSize, and a
 * plain collect_list materializes a hot bucket's ENTIRE member list in one
 * aggregation buffer before any filter can drop it — exactly the pathology
 * (a silence band, a boilerplate transcript band: millions of ids) the cap
 * guards against. This aggregator stops retaining members past the cap
 * (keeping limit+1 so "over the cap" is still detectable from the list
 * alone) but keeps the true count for skew metering, so an oversized bucket
 * costs O(cap) buffer memory instead of O(bucket).
 *
 * Partial aggregation applies map-side (Aggregator lowers to a
 * TypedImperativeAggregate with update/merge), so the shuffle also carries
 * at most limit+1 ids per (bucket, mapper).
 */
object CappedCollect {

  private final class Agg(limit: Int)
      extends Aggregator[String, CappedList, CappedList] {
    def zero: CappedList = CappedList(Vector.empty, 0L)
    def reduce(b: CappedList, a: String): CappedList =
      CappedList(if (b.ids.length > limit) b.ids else b.ids :+ a, b.n + 1L)
    def merge(x: CappedList, y: CappedList): CappedList = {
      val ids =
        if (x.ids.length > limit) x.ids
        else if (y.ids.length > limit && x.ids.isEmpty) y.ids
        else (x.ids ++ y.ids).take(limit + 1)
      CappedList(ids, x.n + y.n)
    }
    def finish(r: CappedList): CappedList = r
    def bufferEncoder: Encoder[CappedList] = Encoders.product[CappedList]
    def outputEncoder: Encoder[CappedList] = Encoders.product[CappedList]
  }

  /** `cappedCollect(limit)(col)` -> struct(ids: array<string>, n: long). */
  def cappedCollect(limit: Int)(c: Column): Column = udaf(new Agg(limit)).apply(c)
}
