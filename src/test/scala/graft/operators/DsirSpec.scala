package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Dsir.importanceWeights]] — hand-checked micro-nat arithmetic on
  * a tiny corpus, the domain-separation property on real fixture
  * data, and partition-count invariance (the integer-sum determinism
  * claim). */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  test("weights reproduce the smoothed unigram log-ratio by hand") {
    // raw: 2 docs. target = doc 1 only.
    //   doc 1: "a a b"   doc 2: "c c c"
    // raw counts:   a=2 b=1 c=3   Z_r=6  V=3
    // target:       a=2 b=1       Z_t=3
    // r(a)=ln(3/3)=0; r(b)=ln(2/2)=0; r(c)=ln(1/4)
    // norm = ln((6+3)/(3+3)) = ln(1.5)
    val df = Seq((1L, "a a b"), (2L, "c c c")).toDF("doc_id", "text")
    val out = Dsir.importanceWeights(df, df.filter(col("doc_id") === 1L))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val norm = math.round(math.log(9.0 / 6.0) * 1e6)
    val rc = math.round(math.log(1.0 / 4.0) * 1e6)
    assert(out(1L) == ((3L, 3L * norm)),
      s"doc1: got ${out(1L)}, want (3, ${3 * norm})")
    assert(out(2L) == ((3L, 3L * rc + 3L * norm)),
      s"doc2: got ${out(2L)}, want (3, ${3 * rc + 3 * norm})")
    // the target-like doc must outrank the target-unlike one
    assert(out(1L)._2 > out(2L)._2)
  }

  test("on the fixture corpus, English documents outrank non-English " +
    "under an English target (the DSIR selection property)") {
    val docs = graft.Tables(spark, sf).documents
    val w = Dsir.importanceWeights(docs,
        docs.filter(col("lang") === "en"))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg(col("weight_micro").cast("double") /
        col("n_tokens").cast("double")).as("per_tok"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(w(true) > w(false),
      s"mean per-token weight en=${w(true)} vs rest=${w(false)}")
  }

  test("importanceWeightsWhen (one model pass) is weight-identical " +
    "to the two-frame form on a subset target") {
    val docs = graft.Tables(spark, sf).documents
    val two = Dsir.importanceWeights(docs,
        docs.filter(col("lang") === "en"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val one = Dsir.importanceWeightsWhen(docs, col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(one == two)
  }

  test("resample: Gumbel-top-k selection is a pure function of " +
    "(id, weight) — reproducible, k-bounded, higher weight wins in " +
    "expectation and ties break by id") {
    val df = Seq.tabulate(50)(i => (i.toLong, 3L, (i % 5) * 1000000L))
      .toDF("doc_id", "n_tokens", "weight_micro")
    val a = Dsir.resample(df, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val b = Dsir.resample(df.repartition(7), 10).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(a.toSeq == b.toSeq,
      "the selected set and order must not depend on partitioning")
    assert(a.length == 10)
    // scores strictly ordered desc, ids ascending within equal scores
    assert(a.map(_._2).toSeq == a.map(_._2).sortBy(-_).toSeq)
    // higher-weight docs (weight 4e6, every 5th id) should dominate
    // a top-10 of 50 under weight gaps of e^1..e^4 per tier
    val heavy = a.count(_._1 % 5 == 4)
    assert(heavy >= 5, s"only $heavy of 10 selected from the top tier")
  }

  test("bucketed vocabulary (nBuckets=1): all tokens share one bucket " +
    "and the hand-computed degenerate weights come out") {
    // one bucket => c_r = Z_r = 6, c_t = Z_t = 3, V = 1 for the
    // DsirSpec corpus; r = ln(4/7), norm = ln(7/4), both rounded to
    // micro-nats separately before the per-doc sum
    val df = Seq((1L, "a a b"), (2L, "c c c")).toDF("doc_id", "text")
    val out = Dsir.importanceWeights(df, df.filter(col("doc_id") === 1L),
        nBuckets = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val r = math.round(math.log(4.0 / 7.0) * 1e6)
    val norm = math.round(math.log(7.0 / 4.0) * 1e6)
    assert(out(1L) == ((3L, 3L * (r + norm))), s"doc1 ${out(1L)}")
    assert(out(2L) == ((3L, 3L * (r + norm))), s"doc2 ${out(2L)}")
  }

  test("bucketed forms agree (two-frame vs one-pass), keep the " +
    "selection property, and the model join is a BROADCAST") {
    val docs = graft.Tables(spark, sf).documents
    val two = Dsir.importanceWeights(docs,
        docs.filter(col("lang") === "en"), nBuckets = 4096)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val oneDf = Dsir.importanceWeightsWhen(docs, col("lang") === "en",
      nBuckets = 4096)
    val one = oneDf.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(one == two)
    // the 4096-row model side must broadcast (AQE finalizes the plan
    // after the collect above ran it; rebuild + run to inspect)
    val ran = Dsir.importanceWeightsWhen(docs, col("lang") === "en",
      nBuckets = 4096)
    ran.write.format("noop").mode("overwrite").save()
    val plan = ran.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bucketed model join must broadcast; plan:\n${plan.take(2000)}")
    // selection property survives bucketing (4096 buckets on this
    // vocab: collisions exist but the en/non-en gap is macroscopic)
    val gap = oneDf
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg(col("weight_micro").cast("double") /
        col("n_tokens").cast("double")).as("per_tok"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(gap(true) > gap(false),
      s"bucketed per-token weight en=${gap(true)} vs rest=${gap(false)}")
  }

  test("weights are partition-count invariant (integer micro-nat sums)") {
    val docs = graft.Tables(spark, sf).documents.limit(200)
    val t = docs.filter(col("lang") === "en")
    val a = Dsir.importanceWeights(docs.repartition(1), t)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = Dsir.importanceWeights(docs.repartition(13), t.repartition(7))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a == b, "weights must be bit-identical at any parallelism")
  }
}
