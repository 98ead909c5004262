package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** COMPOSED sampling doors must behave like independent coins — the
  * property the per-door salts in [[Sampling.knuthCoin]] exist for.
  * Before salting, every door flipped the identical coin, so
  * `sampleByWeight(0.5)` → `assignSplit(.9/.05/.05)` left val and
  * test EMPTY (every survivor's coin sat below the train threshold),
  * stacked rate doors kept min(r, w) instead of r·w, and a
  * Gumbel-resampled corpus routed systematically into the last
  * split. These tests pin the product law at the tolerances a
  * 100k-row binomial allows. */
class SamplingCompositionSpec extends SparkTestBase {
  import spark.implicits._

  private val n = 100000L
  private lazy val ids = spark.range(n).toDF("doc_id")

  test("sample(0.5) then split(.9/.05/.05) yields ~product proportions") {
    val surv = Sampling.sampleByWeight(
      ids.withColumn("w", lit(0.5)), "w", "doc_id")
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val byLabel = Sampling.assignSplit(surv, "doc_id", splits)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val total = byLabel.values.sum
    assert(math.abs(total.toDouble / n - 0.5) < 0.01,
      s"survivor rate ${total.toDouble / n}")
    splits.foreach { case (label, frac) =>
      val got = byLabel.getOrElse(label, 0L).toDouble / total
      // pre-salt behavior: train=1.0, val=test=0.0
      assert(math.abs(got - frac) < 0.01, s"$label: $got vs $frac")
    }
  }

  test("rate door stacked on weight door keeps ~r*w, not min(r, w)") {
    val df = ids.withColumn("lang", lit("en")).withColumn("w", lit(0.7))
    val kept = Sampling.sampleByWeight(
      Sampling.mixByRate(df, "lang", "doc_id", Map("en" -> 0.3)),
      "w", "doc_id").count()
    val joint = kept.toDouble / n
    assert(math.abs(joint - 0.21) < 0.01, s"joint keep $joint vs 0.21")
  }

  test("temperature door composes independently with the split door") {
    // two domains, 4:1 skew, alpha=0.5 → rare kept whole, common at
    // rate (1/4)^0.5 = 0.5; the split of the kept set must still be
    // ~.9/.05/.05 within each domain
    val df = ids.withColumn("lang",
      when(col("doc_id") % 5 === 0, "de").otherwise("en"))
    val mixed = Sampling.mixByTemperature(df, "lang", "doc_id", alpha = 0.5)
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val byCell = Sampling.assignSplit(mixed, "doc_id", splits)
      .groupBy("lang", "split").count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    Seq("en", "de").foreach { lang =>
      val cell = byCell(lang)
      val total = cell.values.sum
      splits.foreach { case (label, frac) =>
        val got = cell.getOrElse(label, 0L).toDouble / total
        assert(math.abs(got - frac) < 0.015, s"$lang/$label: $got vs $frac")
      }
    }
  }

  test("Gumbel resample does not skew the split of the selected set") {
    // equal weights → resample = pure Gumbel-coin top-k; pre-salt,
    // the top-k by coin were exactly the highest split coins (all
    // routed to the LAST split = eval contamination by construction)
    val weighted = ids.withColumn("weight_micro", lit(0L))
    val k = 10000
    val top = Dsir.resample(weighted, k = k)
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val byLabel = Sampling.assignSplit(top, "doc_id", splits)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    splits.foreach { case (label, frac) =>
      val got = byLabel.getOrElse(label, 0L).toDouble / k
      assert(math.abs(got - frac) < 0.015, s"$label: $got vs $frac")
    }
  }

  test("each door's marginal keep rate still tracks the target") {
    val df = ids.withColumn("lang", lit("en"))
    Seq(0.05, 0.5, 0.9).foreach { r =>
      val kept = Sampling.mixByRate(df, "lang", "doc_id", Map("en" -> r))
        .count().toDouble / n
      assert(math.abs(kept - r) < 0.01, s"mixByRate($r): $kept")
      val kw = Sampling.sampleByWeight(
        df.withColumn("w", lit(r)), "w", "doc_id").count().toDouble / n
      assert(math.abs(kw - r) < 0.01, s"sampleByWeight($r): $kw")
    }
  }

  test("upsampleByRate: fractional replication hits the rate, is " +
    "partition-invariant, and rate <= 0 drops") {
    val df = ids.withColumn("r", lit(2.3))
    val out = Sampling.upsampleByRate(df, "doc_id", col("r"))
    val total = out.count()
    assert(math.abs(total.toDouble / n - 2.3) < 0.02, s"rate ${total.toDouble / n}")
    // every id has 2 or 3 copies with contiguous copy_idx
    val perId = out.groupBy("doc_id").count().as[(Long, Long)].collect()
    assert(perId.forall(c => c._2 == 2L || c._2 == 3L))
    val again = Sampling.upsampleByRate(df.repartition(13), "doc_id", col("r"))
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(perId.forall { case (id, c) => again(id) == c },
      "copy counts must be a pure function of the id")
    assert(Sampling.upsampleByRate(
      ids.withColumn("r", lit(0.0)), "doc_id", col("r")).count() == 0)
    val sub = Sampling.upsampleByRate(
      ids.withColumn("r", lit(0.4)), "doc_id", col("r")).count()
    assert(math.abs(sub.toDouble / n - 0.4) < 0.01, s"0.4 rate: ${sub.toDouble / n}")
  }

  test("mixByTemperatureUpsample: largest domain passes once, rare " +
    "domains replicate to the flattened mix, NULLs drop") {
    // en:de = 4:1, alpha 0.5 -> de rate = 2.0, en rate = 1.0
    val df = ids.withColumn("lang",
      when(col("doc_id") < 100, lit(null).cast("string"))
        .when(col("doc_id") % 5 === 0, "de").otherwise("en"))
    val out = Sampling.mixByTemperatureUpsample(df, "lang", "doc_id", 0.5)
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(!byLang.contains(null))
    val enTotal = df.filter(col("lang") === "en").count()
    val deTotal = df.filter(col("lang") === "de").count()
    assert(byLang("en") == enTotal, "largest domain: exactly one copy each")
    val deRate = byLang("de").toDouble / deTotal
    assert(math.abs(deRate - 2.0) < 0.05, s"de replication $deRate vs 2.0")
  }

  test("epochShuffleKey: reproducible per epoch, distinct across " +
    "epochs, independent of the split door") {
    val e0 = ids.select(col("doc_id"),
      Sampling.epochShuffleKey(col("doc_id"), 0).as("k"))
    val order0 = e0.orderBy("k", "doc_id").limit(50)
      .select("doc_id").as[Long].collect().toSeq
    val order0b = ids.repartition(7).select(col("doc_id"),
        Sampling.epochShuffleKey(col("doc_id"), 0).as("k"))
      .orderBy("k", "doc_id").limit(50).select("doc_id").as[Long]
      .collect().toSeq
    assert(order0 == order0b, "epoch order is partition-invariant")
    val order1 = ids.select(col("doc_id"),
        Sampling.epochShuffleKey(col("doc_id"), 1).as("k"))
      .orderBy("k", "doc_id").limit(50).select("doc_id").as[Long]
      .collect().toSeq
    assert(order0 != order1, "distinct epochs give distinct permutations")
    // first 10% of epoch 0 still splits ~.9/.05/.05 (door independence)
    val batch = e0.orderBy("k", "doc_id").limit((n / 10).toInt)
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val byLabel = Sampling.assignSplit(batch, "doc_id", splits)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    splits.foreach { case (label, frac) =>
      val got = byLabel.getOrElse(label, 0L).toDouble / (n / 10)
      assert(math.abs(got - frac) < 0.015, s"$label: $got vs $frac")
    }
  }

  test("replica-aware epochShuffleKey: copy 0 reproduces the id-only " +
    "key exactly; copies get distinct keys") {
    val mismatch = ids.select(
        Sampling.epochShuffleKey(col("doc_id"), 3).as("k2"),
        Sampling.epochShuffleKey(col("doc_id"), 3, lit(0L)).as("k3"))
      .filter(col("k2") =!= col("k3")).count()
    assert(mismatch == 0L,
      "3-arg key at copy_idx=0 must equal the 2-arg key (a " +
        "non-upsampled corpus orders identically under either)")
    // distinct copies of one doc get distinct keys (the whole point)
    val copies = ids.limit(1000)
      .withColumn("copy_idx", explode(sequence(lit(0L), lit(3L))))
    val distinctKeys = copies.select(col("doc_id"),
        Sampling.epochShuffleKey(col("doc_id"), 0, col("copy_idx")).as("k"))
      .groupBy("doc_id").agg(countDistinct(col("k")).as("dk"))
      .filter(col("dk") < 4).count()
    assert(distinctKeys == 0L, "all 4 copies must draw distinct keys")
  }

  test("upsample then epoch shuffle: replicas DISPERSE through the " +
    "epoch order (round-15 verdict finding #1)") {
    // 20k docs x 4 copies. With the id-only key every copy of a doc
    // shares its key and sorts ADJACENT: 3 same-doc adjacencies per
    // doc = 60000 of 79999 adjacent pairs (measured pre-fix: exactly
    // 60000 — a rare doc replicated 4x landed 4x in the same batch,
    // every epoch). Replica-aware expectation: P(next row is a
    // sibling) = 3/(80000-1), ~3 adjacent pairs in the whole epoch.
    val docs = ids.limit(20000)
      .withColumn("r", lit(4.0))
    val up = Sampling.upsampleByRate(docs, "doc_id", col("r"))
    val ordered = up.select(col("doc_id"),
        Sampling.epochShuffleKey(col("doc_id"), 0, col("copy_idx")).as("k"),
        col("copy_idx"))
      .orderBy(col("k"), col("doc_id"), col("copy_idx"))
      .select("doc_id").as[Long].collect()
    assert(ordered.length == 80000)
    val adjacent = ordered.sliding(2).count(p => p(0) == p(1))
    assert(adjacent < 40,
      s"adjacent same-doc pairs: $adjacent (id-only key scores 60000; " +
        "random expectation ~3)")
    // and the dispersion is epoch-stable: epoch 1 disperses too
    val adj1 = up.select(col("doc_id"),
        Sampling.epochShuffleKey(col("doc_id"), 1, col("copy_idx")).as("k"),
        col("copy_idx"))
      .orderBy(col("k"), col("doc_id"), col("copy_idx"))
      .select("doc_id").as[Long].collect()
      .sliding(2).count(p => p(0) == p(1))
    assert(adj1 < 40, s"epoch 1 adjacent same-doc pairs: $adj1")
  }

  test("copy fold uses a distinct multiplier: no cross-epoch echo " +
    "(key(id, e, c) != key(id, e+c, 0))") {
    // with a SHARED multiplier salt(e, c) = salt(e+c, 0): copy 1 of
    // every doc in epoch 2 would sit exactly where the doc itself
    // sits in epoch 3 — a deterministic echo across epochs. The
    // distinct CopyFold multiplier kills it: the two keys agree only
    // at hash-collision rate.
    val echo = ids.select(
        Sampling.epochShuffleKey(col("doc_id"), 2, lit(1L)).as("ka"),
        Sampling.epochShuffleKey(col("doc_id"), 3).as("kb"))
      .filter(col("ka") === col("kb")).count()
    assert(echo < n / 1000,
      s"cross-epoch echo on $echo of $n ids (shared-multiplier fold " +
        "would echo on ALL of them)")
  }

  test("upsampleByRate refuses an input that already has copy_idx") {
    val up = Sampling.upsampleByRate(
      ids.limit(10).withColumn("r", lit(2.0)), "doc_id", col("r"))
    val e = intercept[IllegalArgumentException] {
      Sampling.upsampleByRate(up.withColumn("r", lit(2.0)), "doc_id",
        col("r"))
    }
    assert(e.getMessage.contains("copy_idx"))
  }

  test("mixByTemperature: NULL domains drop and never deflate rates") {
    // 100 NULL-domain rows would be the rarest stratum if counted —
    // n_min would shrink 10x and every real domain's rate with it
    val df = ids.withColumn("lang",
      when(col("doc_id") < 100, lit(null).cast("string"))
        .when(col("doc_id") % 5 === 0, "de").otherwise("en"))
    val out = Sampling.mixByTemperature(df, "lang", "doc_id", alpha = 0.5)
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(!byLang.contains(null), "NULL-domain rows must drop")
    // rarest REAL domain (de, ~20k rows) kept whole
    val deTotal = df.filter(col("lang") === "de").count()
    assert(byLang("de") == deTotal, s"de kept ${byLang("de")} of $deTotal")
    // en at rate (nd_de/nd_en)^0.5 ~= 0.5, not the NULL-deflated
    // (100/80000)^0.5 ~= 0.035
    val enRate = byLang("en").toDouble /
      df.filter(col("lang") === "en").count()
    assert(math.abs(enRate - 0.5) < 0.01, s"en rate $enRate")
  }
}
