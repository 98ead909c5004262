package graft.operators

import graft.{SparkTestBase, Tables}
import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Packing: concat-and-chunk segments (packSegments) and
  * histogram-FFD whole-document bins (packBins). Segments are checked
  * value-exactly against an independent driver-side replay of the
  * token stream; bins are checked on their invariants (exactly-once,
  * capacity, tiling, FFD optimality bound) plus adversarial
  * histograms against the solver directly. */
class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private val L = 128

  private def docsWithToks: DataFrame =
    Tables(spark, sf).documents
      .select(col("doc_id"), size(Text.tokens(col("text"))).cast("long").as("toks"))

  // ---------------------------------------------------------------- segments

  test("packSegments: value-exact vs an independent driver-side replay") {
    val base = docsWithToks
    val out = Packing.packSegments(base, "doc_id", col("toks"), L, epoch = 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    // independent replay: collect (id, toks, skey), sort, walk the
    // token stream in plain Scala
    val rows = base
      .withColumn("skey", Sampling.epochShuffleKey(col("doc_id"), 0))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, _, skey) => (skey, id) }
    var off = 0L
    val expect = scala.collection.mutable.Set
      .empty[(Long, Long, Long, Long, Long, Long)]
    for ((id, toks, _) <- rows) {
      var w = off / L
      while (w * L < off + toks) {
        val segStart = math.max(off, w * L)
        val segEnd = math.min(off + toks, (w + 1) * L)
        expect += ((id, toks, w, segStart - w * L, segStart - off,
          segEnd - segStart))
        w += 1
      }
      off += toks
    }
    assert(out == expect.toSet)
    assert(out.nonEmpty)
  }

  test("packSegments: windows tile exactly and docs reassemble exactly") {
    val out = Packing.packSegments(docsWithToks, "doc_id", col("toks"), L)
      .localCheckpoint(true)
    try {
      val lastWin = out.agg(max("window_id")).head.getLong(0)
      // every window except the last holds exactly L tokens, starting
      // at 0, with contiguous non-overlapping segments
      val wins = out.groupBy("window_id").agg(
        sum("seg_len").as("tot"), min("win_pos").as("lo"),
        max(col("win_pos") + col("seg_len")).as("hi"),
        count(lit(1)).as("nseg"))
      assert(wins.filter(col("window_id") < lastWin &&
        (col("tot") =!= L || col("lo") =!= 0 || col("hi") =!= L)).isEmpty)
      // contiguity: within a window, sorted segments start where the
      // previous ended ⇔ sum == span and segment starts are distinct
      val overlaps = out.as("a").join(out.as("b"),
        col("a.window_id") === col("b.window_id") &&
          col("a.win_pos") === col("b.win_pos") &&
          col("a.doc_id") =!= col("b.doc_id"))
      assert(overlaps.isEmpty)
      // per-doc reassembly: seg_len sums to toks, offsets tile [0, toks)
      val docs = out.groupBy("doc_id", "toks").agg(
        sum("seg_len").as("tot"), min("doc_off").as("lo"),
        max(col("doc_off") + col("seg_len")).as("hi"))
      assert(docs.filter(col("tot") =!= col("toks") ||
        col("lo") =!= 0 || col("hi") =!= col("toks")).isEmpty)
    } finally out.unpersist()
  }

  test("packSegments: replica-aware key — pack order ≡ epochBatches order, " +
    "copies disperse") {
    // an upsampled-shaped frame: 100 docs × 3 copies, deterministic lengths
    val df = spark.range(100).toDF("doc_id")
      .withColumn("copy_idx", explode(lit((0 until 3).toArray)))
      .withColumn("toks", col("doc_id") % 37 + 3)
    val packed = Packing.packSegments(df, "doc_id", col("toks"), 64,
      epoch = 1, copyIdxCol = "copy_idx")
    // stream order (doc starts by (window, position)) must equal the
    // batch permutation — same key, same tie-breaks
    val packOrder = packed.filter(col("doc_off") === 0)
      .orderBy("window_id", "win_pos")
      .select("doc_id", "copy_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    val batchOrder = Batching.epochBatches(df.select("doc_id", "copy_idx"),
        "doc_id", epoch = 1, batchSize = 16, copyIdxCol = "copy_idx")
      .orderBy("epoch_pos")
      .select("doc_id", "copy_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(packOrder == batchOrder)
    assert(packOrder.size == 300)
    // replica dispersion lands in the stream itself: adjacent
    // same-doc pairs ≪ the 200 an id-only key would force
    val adjacentSameDoc = packOrder.sliding(2)
      .count(p => p.size == 2 && p.head._1 == p.last._1)
    assert(adjacentSameDoc < 10, s"adjacent same-doc pairs: $adjacentSameDoc")
  }

  test("packSegments: refuses non-positive token counts at execution") {
    val bad = Seq((1L, 5L), (2L, 0L)).toDF("doc_id", "toks")
    val e = intercept[Exception] {
      Packing.packSegments(bad, "doc_id", col("toks"), L).collect()
    }
    // Spark 4 surfaces raise_error as SparkRuntimeException
    // (USER_RAISED_EXCEPTION) with no cause — match on the message
    assert(ExceptionUtilsish(e).contains("non-positive token count"))
  }

  private def ExceptionUtilsish(e: Throwable): String = {
    var t: Throwable = e; val sb = new StringBuilder
    while (t != null) { sb.append(t.getMessage).append('\n'); t = t.getCause }
    sb.toString
  }

  test("packSegments: derived-name collision refused") {
    val df = Seq((1L, 5L, 7L)).toDF("doc_id", "toks", "win_pos")
    val e = intercept[IllegalArgumentException] {
      Packing.packSegments(df, "doc_id", col("toks"), L,
        keepCols = Seq("win_pos"))
    }
    assert(e.getMessage.contains("packSegments derives"))
  }

  // -------------------------------------------------------------------- bins

  test("packBins: exactly-once, capacity, dense bins, in-bin tiling, FFD bound") {
    val base = docsWithToks
    val nDocs = base.count()
    val out = Packing.packBins(base, "doc_id", col("toks"), L)
      .localCheckpoint(true)
    try {
      assert(out.count() == nDocs)
      assert(out.select("doc_id").distinct().count() == nDocs)
      val bins = out.groupBy("bin_id").agg(
        sum("toks").as("tot"), min("bin_pos").as("lo"),
        max(col("bin_pos") + col("toks")).as("hi"))
        .localCheckpoint(true)
      try {
        // capacity + tiling: docs of a bin tile [0, tot] with tot ≤ L
        assert(bins.filter(col("tot") > L || col("lo") =!= 0 ||
          col("hi") =!= col("tot")).isEmpty)
        val nBins = bins.count()
        assert(out.agg(max("bin_id")).head.getLong(0) == nBins - 1)
        assert(out.agg(min("bin_id")).head.getLong(0) == 0L)
        // provable first-fit invariant: at most ONE bin is under half
        // full (two such bins contradict first-fit — the later bin's
        // first doc fit in the earlier), hence nBins < 2·Σtoks/L + 1
        assert(bins.filter(col("tot") * 2 < L).count() <= 1)
        val total = out.agg(sum("toks")).head.getLong(0)
        assert(nBins <= 2 * total / L + 1,
          s"nBins $nBins vs first-fit bound ${2 * total / L + 1}")
      } finally bins.unpersist()
    } finally out.unpersist()
  }

  test("packBins: deterministic across runs and input partitionings") {
    val base = docsWithToks
    val a = Packing.packBins(base, "doc_id", col("toks"), L).collect().toSet
    val b = Packing.packBins(base.repartition(7), "doc_id", col("toks"), L)
      .collect().toSet
    assert(a == b)
  }

  test("packBins: refuses over-length and non-positive documents") {
    val over = Seq((1L, L + 1L)).toDF("doc_id", "toks")
    val e1 = intercept[IllegalArgumentException] {
      Packing.packBins(over, "doc_id", col("toks"), L).collect()
    }
    assert(e1.getMessage.contains("exceeds contextLen"))
    val zero = Seq((1L, 0L)).toDF("doc_id", "toks")
    val e2 = intercept[IllegalArgumentException] {
      Packing.packBins(zero, "doc_id", col("toks"), L).collect()
    }
    assert(e2.getMessage.contains("non-positive document length"))
  }

  test("solveFfd: adversarial histograms") {
    // all docs the same length dividing L exactly → perfect packing
    val s1 = Packing.solveFfd(Seq((32, 40L)), 128)
    assert(s1.map(g => g.slots.size * g.n).sum == 40L)
    assert(s1.map(_.n).sum == 10L) // 4 per bin, zero waste
    // complementary pair lengths: FFD pairs 100s with 28s
    val s2 = Packing.solveFfd(Seq((100, 5L), (28, 5L)), 128)
    assert(s2.map(_.n).sum == 5L)
    assert(s2.forall(g => g.slots.sum <= 128))
    // one doc
    val s3 = Packing.solveFfd(Seq((7, 1L)), 128)
    assert(s3 == Vector(Packing.Strategy(List(7), 1L, 0L)))
    // bases are dense and in open order
    val s4 = Packing.solveFfd(Seq((64, 3L), (65, 2L), (1, 130L)), 128)
    val bases = s4.map(_.base)
    assert(bases == bases.sorted)
    assert(s4.map(g => g.slots.size * g.n).sum == 135L)
    // demand conservation: slots × bins == docs per length
    val byLen = s4.flatMap(g => g.slots.map(l => l -> g.n))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(byLen == Map(64 -> 3L, 65 -> 2L, 1 -> 130L))
  }
}
