package graft

import org.apache.spark.sql.functions._

import graft.operators.Enrichment

/** Dev measurement: salted vs plain join under heavy key skew, with
  * AQE's skew handling disabled so the numbers isolate the operator
  * (AQE only rewrites sort-merge joins; saltedJoin targets the plans
  * AQE can't fix). Prints one line per variant. */
object SkewDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    // force the shuffle path: a broadcastable right side would dodge
    // the skew entirely (and be the right call — salting is for when
    // neither side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import spark.implicits._

    val n = 4000000
    val hotShare = 0.5 // half the fact lands on ONE key
    val fact = spark.range(n).select(
      when(rand(7) < hotShare, lit("hot"))
        .otherwise(concat(lit("k"), (col("id") % 100000))).as("k"),
      col("id").as("v"))
    val dim = spark.range(100001).select(
      when(col("id") === 100000, lit("hot"))
        .otherwise(concat(lit("k"), col("id"))).as("k"),
      (col("id") * 10).as("attr"))

    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val cnt = df.count()
      println(f"[skew] $tag%-8s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$cnt")
    }
    // warm both paths once (janino/JIT), then measure
    fact.limit(1000).join(dim, Seq("k")).count()
    time("plain") { fact.join(dim, Seq("k")) }
    time("salted") {
      Enrichment.saltedJoin(fact, dim, Seq("k"),
        saltFactor = 32, hotThreshold = 100000)
    }
    time("sampled") {
      Enrichment.saltedJoin(fact, dim, Seq("k"),
        saltFactor = 32, hotThreshold = 100000, censusFraction = 0.01)
    }
    spark.stop()
  }
}
