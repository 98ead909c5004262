package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Skyline (Pareto-frontier) operator: rows not strictly dominated on
  * the given dimensions (maximization; negate a column to minimize).
  * A classic OLAP operator Spark lacks (cf. PAPERS.md, "Integration of
  * Skyline Queries into Spark SQL", EDBT 2023); the reference has no
  * analog — this is part of the engine's §2.7-style widening.
  *
  * Scale shape — skyline is DISTRIBUTIVE:
  * `skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))`, so phase 1
  * computes a local skyline per partition (one in-memory O(n·s) pass,
  * s = local frontier size — the legitimate `mapPartitions` case: a
  * dominance loop no relational operator expresses), shrinking N rows
  * to a few frontier points per partition; phase 2 resolves the global
  * frontier with a dominance self-anti-join over that small candidate
  * union (broadcast — candidates are frontier-sized by construction;
  * for adversarial anti-correlated data where frontiers are huge, drop
  * the hint and let AQE pick the join). The full fact is scanned ONCE
  * and never shuffled.
  *
  * Rows with a null skyline dimension are excluded (dominance is
  * undefined on null); duplicates of a frontier point all survive
  * (strict dominance requires >= on all dims and > on at least one).
  */
object Skyline {

  def skyline(df: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "skyline needs at least one dimension")
    val clean = df.filter(dims.map(col(_).isNotNull).reduce(_ && _))
    val schema = clean.schema
    val idx = dims.map(schema.fieldIndex)

    val local = clean.mapPartitions { it =>
      val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
      val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      it.foreach { r =>
        val v = idx.map(i => r.getAs[Number](i).doubleValue).toArray
        var dominated = false
        var j = 0
        while (j < vecs.length && !dominated) {
          if (dominates(vecs(j), v)) dominated = true
          else if (dominates(v, vecs(j))) {
            // evict without re-shifting the whole buffer: swap-remove
            vecs(j) = vecs.last; vecs.remove(vecs.length - 1)
            rows(j) = rows.last; rows.remove(rows.length - 1)
          } else j += 1
        }
        if (!dominated) { rows += r; vecs += v }
      }
      rows.iterator
    }(Encoders.row(schema))

    // global frontier: drop candidates strictly dominated by any other
    val a = local.as("a")
    val b = local.as("b")
    val geAll = dims.map(d => col(s"b.$d") >= col(s"a.$d")).reduce(_ && _)
    val gtAny = dims.map(d => col(s"b.$d") > col(s"a.$d")).reduce(_ || _)
    a.join(broadcast(b), geAll && gtAny, "left_anti")
  }

  /** a strictly dominates b: >= everywhere, > somewhere. */
  private def dominates(a: Array[Double], b: Array[Double]): Boolean = {
    var ge = true
    var gt = false
    var i = 0
    while (i < a.length && ge) {
      if (a(i) < b(i)) ge = false
      else if (a(i) > b(i)) gt = true
      i += 1
    }
    ge && gt
  }
}
