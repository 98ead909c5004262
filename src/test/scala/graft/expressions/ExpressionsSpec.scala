package graft.expressions

import graft.SparkTestBase
import graft.functions.Vectors
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  test("native array_dot is bit-identical to the HOF fold on real embeddings") {
    val emb = graft.Tables(spark, sf).embeddings.limit(100)
    val a = emb.select($"vec_id".as("ia"), $"embedding".as("ea"))
    val b = emb.select($"vec_id".as("ib"), $"embedding".as("eb"))
    val pairs = a.join(b, $"ia" < $"ib" && $"ib" < 10)
    val diffs = pairs.select(
      Vectors.dot($"ea", $"eb").as("native"),
      Vectors.hofDot($"ea", $"eb").as("hof"))
      .filter($"native" =!= $"hof")
    assert(diffs.count() == 0)
  }

  test("native rp_bands is bit-identical to the HOF bucket per band") {
    val emb = graft.Tables(spark, sf).embeddings.limit(100)
    val planes = 8
    val bands = 3
    val diffs = emb.select(
        Vectors.rpBands($"embedding", planes, bands).as("native"),
        array((0 until bands).map(b =>
          Vectors.hofRpBucket($"embedding", planes, seed = 42L + b)): _*).as("hof"))
      .filter($"native" =!= $"hof")
    assert(diffs.count() == 0)
    // single-bucket form (lshTopK's path) matches too
    val single = emb.select(
        Vectors.rpBucket($"embedding", planes).as("native"),
        Vectors.hofRpBucket($"embedding", planes).as("hof"))
      .filter($"native" =!= $"hof")
    assert(single.count() == 0)
  }

  test("adjacent_pair_stats: duplicate line numbers fan out like the join") {
    // ln=[1,2,2,3]: pairs (1,2),(1,2'),(2,3),(2',3) -> 4 pairs total;
    // left flags: ln1=A (2 pairs), ln2=B and ln2'=A (1 pair each)
    val df = Seq(Tuple1(Seq((1, 10L, "A"), (2, 20L, "B"), (2, 30L, "A"), (3, 40L, "A"))))
      .toDF("raw")
      .select(transform($"raw", r => struct(
        r.getField("_1").as("ln"), r.getField("_2").as("qc"),
        r.getField("_3").as("flag"))).as("ls"))
    val out = df.select(explode(
        graft.expressions.AdjacentPairStats.adjacentPairStats($"ls")).as("p"))
      .select("p.flag", "p.cnt", "p.qc2").as[(String, Long, Long)]
      .collect().toSet
    // A at ln1: (10+20)+(10+30)=70, 2 pairs; A at ln2': 30+40, 1 pair
    // -> A entries come from different array positions, emitted per
    // left element group: A accumulates 2+1=3 pairs, 70+70=140
    assert(out == Set(("A", 3L, 140L), ("B", 1L, 60L)))
  }

  test("native sig_match_frac equals the HOF Jaccard estimator") {
    import graft.expressions.TextSignatures
    import graft.operators.Dedup
    val docs = graft.Tables(spark, sf).documents.limit(60)
    val sigs = docs.select($"doc_id", TextSignatures.minHashSig($"text", 64).as("sig"))
    val a = sigs.select($"doc_id".as("ia"), $"sig".as("sa"))
    val b = sigs.select($"doc_id".as("ib"), $"sig".as("sb"))
    val diffs = a.join(b, $"ia" < $"ib")
      .select(Dedup.estJaccard($"sa", $"sb", 64).as("native"),
        Dedup.hofEstJaccard($"sa", $"sb", 64).as("hof"))
      .filter($"native" =!= $"hof")
    assert(diffs.count() == 0)
  }

  test("int8 quantized dot approximates the exact dot within 2%") {
    val emb = graft.Tables(spark, sf).embeddings.limit(50)
    val a = emb.select($"vec_id".as("ia"), $"embedding".as("ea"),
      Vectors.quantizeInt8($"embedding").as("qa"))
    val b = emb.select($"vec_id".as("ib"), $"embedding".as("eb"),
      Vectors.quantizeInt8($"embedding").as("qb"))
    val rows = a.join(b, $"ia" < $"ib" && $"ib" < 10)
      .select(Vectors.dot($"ea", $"eb").as("exact"),
        Vectors.dotQuantized($"qa", $"qb").as("approx"),
        Vectors.norm($"ea").as("na"), Vectors.norm($"eb").as("nb"))
      .as[(Double, Double, Double, Double)].collect()
    rows.foreach { case (exact, approx, na, nb) =>
      assert(math.abs(exact - approx) <= 0.02 * na * nb,
        s"exact=$exact approx=$approx")
    }
  }

  test("native minhash: identical docs -> identical sigs; sig length k") {
    val df = Seq("the quick brown fox jumps over it", "the quick brown fox jumps over it")
      .toDF("t").select(TextSignatures.minHashSig($"t", 32).as("s"))
    val sigs = df.as[Seq[Long]].collect()
    assert(sigs(0).length == 32 && sigs(0) == sigs(1))
  }

  test("native simhash: empty and null-safe") {
    val df = Seq(Some(""), None, Some("a b c")).toDF("t")
      .select(TextSignatures.simHashSig($"t").as("h"))
    val rows = df.collect()
    assert(rows(1).isNullAt(0)) // null in -> null out
    assert(!rows(0).isNullAt(0) && !rows(2).isNullAt(0))
  }
}
