package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic per-group sampling — SURVEY §2.11's custom-aggregate
  * slot (`Aggregator[IN,BUF,OUT]` via `functions.udaf`).
  *
  * Sampling k docs per group by the k smallest content-independent
  * hashes is a uniform random sample that is reproducible across runs,
  * partitionings, and engines (the oracle replays it with a window
  * rank). The aggregator's merge is associative+commutative, so Spark
  * runs it with map-side partial aggregation: the shuffle carries at
  * most k entries per (group × map task) — this is how "sample 1000
  * docs per domain" stays one pass over 100 TB with a tiny shuffle.
  */
object Sampling {

  /** Keep the k (hashKey, id) pairs with smallest keys; emit ids in
    * key order. Buffer is a sorted Seq capped at k. */
  class BottomK(k: Int)
      extends Aggregator[(String, Long), Seq[(String, Long)], Seq[Long]] {
    private def trim(s: Seq[(String, Long)]): Seq[(String, Long)] =
      s.sorted.take(k)
    override def zero: Seq[(String, Long)] = Nil
    override def reduce(b: Seq[(String, Long)], a: (String, Long)): Seq[(String, Long)] =
      trim(b :+ a)
    override def merge(x: Seq[(String, Long)], y: Seq[(String, Long)]): Seq[(String, Long)] =
      trim(x ++ y)
    override def finish(b: Seq[(String, Long)]): Seq[Long] = b.sorted.map(_._2)
    override def bufferEncoder: Encoder[Seq[(String, Long)]] =
      Encoders.kryo[Seq[(String, Long)]]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Column aggregate: k ids per group with smallest `hashKey`. */
  def bottomK(hashKey: Column, id: Column, k: Int): Column =
    udaf(new BottomK(k)).apply(hashKey, id)

  /** Deterministic uniform sample of `k` rows per group: hash = md5 of
    * the id (content-independent, engine-portable). Output one row per
    * sampled id: (groupCols..., rnk, idCol). */
  def sampleByGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
                    k: Int): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(bottomK(md5(col(idCol).cast("string")), col(idCol), k).as("ids"))
      .select(groupCols.map(col) :+ posexplode(col("ids")): _*)
      .withColumn("rnk", (col("pos") + 1).cast("long"))
      .withColumnRenamed("col", idCol)
      .drop("pos")
      .select(groupCols.map(col) :+ col("rnk") :+ col(idCol): _*)

  /** Domain mixing: down-sample each domain to its target RATE with a
    * deterministic per-row coin — keep when
    * `(id·2654435761) mod 2³² < rate·2³²` (Knuth's multiplicative
    * hash: uniform, engine-portable integer arithmetic, no RNG state).
    * One filter, no shuffle, reproducible across runs/partitionings/
    * engines — the reweighting step that turns a raw crawl mix into a
    * target training mix. Domains missing from `rates` keep
    * `defaultRate`. */
  def mixByRate(df: DataFrame, domainCol: String, idCol: String,
                rates: Map[String, Double],
                defaultRate: Double = 1.0): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (domain, r)) =>
      when(col(domainCol) === domain, lit(r)).otherwise(acc)
    }
    val coin = pmod(col(idCol).cast("long") * lit(2654435761L), lit(4294967296L))
    df.filter(coin < rate * lit(4294967296L))
  }
}
