package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftshim.ColumnBridge

import graft.expressions.MisraGriesAgg

/** Exact corpus heavy hitters via the two-pass sketch-then-recount
  * pattern: a Misra–Gries candidate pass (no vocabulary shuffle — at
  * most `sketchK` counters per map task cross the network), then an
  * exact recount restricted to the candidate superset.
  *
  * Why not `groupBy(item).count().filter(...)`: at 100 TB the token
  * vocabulary is billions of keys, so the single-pass form shuffles
  * every distinct token to find the handful above threshold. Here pass
  * 1 is a GLOBAL aggregate whose partials are ≤k counters each, pass 2
  * filters the scan to ≤k candidate items before any aggregation — the
  * second scan is the price of exactness, the shuffle stays O(k).
  *
  * Reference analog: the reference's hot-key reporting is a plain
  * grouped count over the DWS layer
  * (/root/reference/src/main/scala/com/mashibing/study/lakehouse/dws/ProcessUserlogInToDWS.scala)
  * — viable there because its key domain is small; this is the shape
  * that survives an unbounded key domain.
  */
object HeavyHitters {

  /** The Misra–Gries summary as a Column aggregate —
    * `struct<n, items: array<struct<item, lb>>>`; `items` is a
    * guaranteed superset of every item with true count > n/(k+1),
    * each `lb` a lower bound undercounting by at most n/(k+1). */
  def sketch(item: Column, k: Int): Column =
    ColumnBridge.column(MisraGriesAgg(ColumnBridge.expression(item), k)
      .toAggregateExpression())

  /** EXACT set of items whose count·shareDenom > n·shareNum (share
    * strictly above shareNum/shareDenom), as (itemCol, cnt) rows.
    *
    * Correctness: the sketch retains every item with count > n/(k+1);
    * `(sketchK+1)·shareNum > shareDenom` (checked) makes that a
    * superset of the wanted set, and the recount is exact, so the
    * output is exactly the true heavy hitters — value-oracle-able
    * against a plain GROUP BY / HAVING.
    *
    * The candidate collect is driver-side but BOUNDED at ≤sketchK
    * rows by construction (same stance as the centroid collects). */
  def exactAboveShare(items: DataFrame, itemCol: String,
                      shareNum: Long, shareDenom: Long,
                      sketchK: Int = 512): DataFrame = {
    require(shareNum > 0 && shareDenom > shareNum,
      s"need 0 < shareNum < shareDenom, got $shareNum/$shareDenom")
    require((sketchK + 1).toLong * shareNum > shareDenom,
      s"sketchK=$sketchK cannot guarantee the $shareNum/$shareDenom " +
        s"threshold — need sketchK+1 > shareDenom/shareNum")
    val row = items
      .agg(sketch(col(itemCol), sketchK).as("s"))
      .select(col("s.n").as("n"), col("s.items.item").as("cand"))
      .head()
    val n = row.getLong(0)
    val cand = row.getSeq[String](1)
    val scoped = // empty input ⇒ no candidates ⇒ typed empty result
      if (cand.isEmpty) items.limit(0) else items.filter(col(itemCol).isin(cand: _*))
    scoped
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * shareDenom > lit(n) * shareNum)
  }
}
