package graft

import org.apache.spark.sql.functions._

import graft.functions.{Text, TextStats}

/** The SQL surface of the native expressions (GraftExtensions is wired
  * into the shared test session via spark.sql.extensions). Each SQL
  * call must agree with its Column-API twin. */
class GraftExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("simhash_sig/minhash_sig SQL functions match the Column API") {
    Seq("the quick brown fox jumps over the lazy dog").toDF("t")
      .createOrReplaceTempView("ext_t")
    val sqlSim = spark.sql("SELECT simhash_sig(t) AS s FROM ext_t").as[Long].head()
    val colSim = spark.table("ext_t")
      .select(graft.expressions.TextSignatures.simHashSig($"t").as("s"))
      .as[Long].head()
    assert(sqlSim == colSim)
    val sqlMin = spark.sql("SELECT minhash_sig(t, 16, 3) AS s FROM ext_t")
      .as[Seq[Long]].head()
    val colMin = spark.table("ext_t")
      .select(graft.expressions.TextSignatures.minHashSig($"t", 16).as("s"))
      .as[Seq[Long]].head()
    assert(sqlMin == colMin)
  }

  test("array_dot SQL function: sequential double fold") {
    val d = spark.sql(
      "SELECT array_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .as[Double].head()
    assert(d == 32.0)
  }

  test("co-projected marker_counts calls merge into one scan") {
    // parquet-backed (a tiny local relation would be constant-folded
    // whole by ConvertToLocalRelation before the plan can be inspected)
    spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("text AS t").createOrReplaceTempView("ext_c")
    val df = spark.sql(
      """SELECT marker_counts(t, ' the ', 'cat') AS a,
        |       marker_counts(t, '.') AS b FROM ext_c""".stripMargin)
    // optimized plan carries exactly ONE MarkerCounts, with the merged
    // marker list
    val mcs = df.queryExecution.optimizedPlan.collect {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.projectList.flatMap(_.collect {
          case m: graft.expressions.MarkerCounts => m
        })
    }.flatten
    assert(mcs.size == 1, s"expected one merged call, got: $mcs")
    assert(mcs.head.markers == Seq(" the ", "cat", "."))
    // values identical to the unmerged Column-API semantics
    val direct = spark.table("ext_c").select(
      array(Text.markerCount($"t", " the "), Text.markerCount($"t", "cat")).as("a"),
      array(Text.markerCount($"t", ".")).as("b"))
    assert(df.as[(Seq[Long], Seq[Long])].collect().toSeq ==
      direct.as[(Seq[Long], Seq[Long])].collect().toSeq)
  }

  test("merged marker_counts keeps NULL-text -> NULL counts") {
    spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("CASE WHEN doc_id % 2 = 0 THEN text END AS t")
      .createOrReplaceTempView("ext_n")
    val nulls = spark.sql(
      """SELECT marker_counts(t, ' the ') AS a, marker_counts(t, '.') AS b
        |FROM ext_n WHERE t IS NULL""".stripMargin)
      .collect()
    assert(nulls.nonEmpty && nulls.forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("marker_counts inside a lambda is left alone (no unbound hoist)") {
    spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("array(text, text) AS ts").createOrReplaceTempView("ext_l")
    val out = spark.sql(
      """SELECT transform(ts, x -> element_at(marker_counts(x, ' the '), 1)
        |                        + element_at(marker_counts(x, '.'), 1)) AS v
        |FROM ext_l""".stripMargin)
    assert(out.count() > 0) // plan must stay valid and executable
  }

  test("bloom_might_contain SQL function matches the Column-API probe") {
    import graft.expressions.BloomOps
    // build bits over a tiny set with the Column aggregate, then probe
    // from SQL with the bits inlined as an array literal
    val items = Seq("alpha", "beta", "gamma").toDF("s")
    val bits = items.agg(BloomOps.bloomAgg($"s", 1024, 4).as("b"))
      .as[Seq[Long]].head().toArray
    val bitsSql = bits.mkString("array(", "L,", "L)")
    Seq("alpha", "beta", "nope", "gamma", "zeta").toDF("s")
      .createOrReplaceTempView("ext_b")
    val sqlHits = spark.sql(
      s"SELECT s FROM ext_b WHERE bloom_might_contain(s, $bitsSql, 4)")
      .as[String].collect().toSet
    val colHits = spark.table("ext_b")
      .filter(BloomOps.mightContain($"s", bits, 4))
      .as[String].collect().toSet
    assert(sqlHits == colHits)
    // the inserted items must always hit (no false negatives)
    assert(Set("alpha", "beta", "gamma").subsetOf(sqlHits))
    // a non-string probe column fails at ANALYSIS, not per-task on
    // the executors
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT bloom_might_contain(array(1L), $bitsSql, 4)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }

  test("marker_counts SQL function matches replace arithmetic") {
    Seq("the cat and the dog").toDF("t").createOrReplaceTempView("ext_m")
    val got = spark.sql(
      "SELECT marker_counts(t, ' the ', 'cat', 'q') AS c FROM ext_m")
      .as[Seq[Long]].head()
    val want = spark.table("ext_m").select(array(
      Text.markerCount($"t", " the "),
      Text.markerCount($"t", "cat"),
      Text.markerCount($"t", "q")).as("c")).as[Seq[Long]].head()
    assert(got == want && got == Seq(1L, 1L, 0L))
  }

  test("chunk_text SQL function yields the exact Chunking.chunk rows") {
    spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").createOrReplaceTempView("ext_ch")
    val sqlRows = spark.sql(
      """SELECT doc_id, c.chunk_idx, c.chunk_start, c.chunk_text, c.chunk_len
        |FROM ext_ch LATERAL VIEW explode(chunk_text(text, 64, 48)) AS c"""
        .stripMargin)
      .as[(Long, Long, Long, String, Long)].collect().sorted.toSeq
    val colRows = graft.operators.Chunking
      .chunk(spark.table("ext_ch"), "text", 64, 48, Seq("doc_id"))
      .as[(Long, Long, Long, String, Long)].collect().sorted.toSeq
    assert(sqlRows.nonEmpty && sqlRows == colRows)
  }

  test("assign_split / sample_by_weight SQL functions flip the " +
    "operators' exact coins") {
    spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", (pmod($"n_chars", lit(97)) / 96.0).as("quality_score"))
      .createOrReplaceTempView("ext_sp")
    val sqlSplit = spark.sql(
      "SELECT doc_id, assign_split(doc_id, 'train', 0.8, 'val', 0.1, " +
        "'test', 0.1) AS split FROM ext_sp")
      .as[(Long, String)].collect().toMap
    val colSplit = graft.operators.Sampling
      .assignSplit(spark.table("ext_sp"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(sqlSplit == colSplit && sqlSplit.values.toSet.size == 3)
    val sqlKept = spark.sql(
      "SELECT doc_id FROM ext_sp WHERE sample_by_weight(doc_id, quality_score)")
      .as[Long].collect().toSet
    val colKept = graft.operators.Sampling
      .sampleByWeight(spark.table("ext_sp"), "quality_score", "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    assert(sqlKept == colKept)
    assert(sqlKept.nonEmpty && sqlKept.size < sqlSplit.size,
      "the weight coin should keep a strict, non-empty subset")
    // malformed fraction lists fail at function resolution
    val e = intercept[Exception] {
      spark.sql("SELECT assign_split(doc_id, 'train', 0.5) FROM ext_sp")
        .collect()
    }
    assert(e.getMessage.contains("sum to 1"))
  }

  test("top_k_by_score SQL aggregate matches the Scala tail and the " +
    "sort oracle") {
    spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id",
        (pmod($"doc_id" * 2654435761L, lit(997)) / 996.0).as("score"),
        pmod($"doc_id", lit(7)).as("q"))
      .createOrReplaceTempView("ext_tk")
    val sqlRows = spark.sql(
      """SELECT q, e.pos AS rnk, e.col.id, e.col.score
        |FROM (SELECT q, top_k_by_score(score, doc_id, 5) AS tk
        |      FROM ext_tk GROUP BY q)
        |LATERAL VIEW posexplode(tk) e""".stripMargin)
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    val colRows = spark.table("ext_tk")
      .groupBy($"q")
      .agg(graft.operators.Similarity
        .topKByScore($"score", $"doc_id", 5).as("tk"))
      .select($"q", posexplode($"tk"))
      .select($"q", $"pos", $"col.id", $"col.score")
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    assert(sqlRows.nonEmpty && sqlRows == colRows)
    // the (score desc, id asc) sort oracle, per group
    val oracle = spark.table("ext_tk")
      .as[(Long, Double, Long)].collect()
      .groupBy(_._3).toSeq.flatMap { case (q, rows) =>
        rows.toSeq.sortBy { case (id, s, _) => (-s, id) }.take(5).zipWithIndex
          .map { case ((id, s, _), i) => (q, i, id, s) }
      }.sorted
    assert(sqlRows == oracle)
    // a mistyped score fails at analysis with the cast hint
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT top_k_by_score(q, doc_id, 3) FROM ext_tk").collect()
    }
    assert(e2.getMessage.contains("DOUBLE"))
  }

  test("dup_shingle_stats SQL function matches the exploded-shingle aggregation") {
    val docs = Seq(
      (1L, "a b c a b c a b"),     // all 6 shingles duplicated
      (2L, "one two three four"),  // all distinct
      (3L, "tiny doc"),            // <= n words: one whole-doc shingle
      (4L, " \tx  y   x y x y ")  // whitespace-adversarial
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("ext_dup")
    val sqlRows = spark.sql(
      """SELECT doc_id, s.n_shingles, s.dup_shingles
        |FROM (SELECT doc_id, dup_shingle_stats(text, 3) AS s FROM ext_dup)
        |""".stripMargin).as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val oracle = docs
      .select($"doc_id", explode(Text.shingles($"text", 3)).as("s"))
      .groupBy($"doc_id", $"s").count()
      .groupBy($"doc_id")
      .agg(sum($"count").as("n"),
        sum(when($"count" > 1, $"count").otherwise(0L)).as("d"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(sqlRows == oracle)
    assert(sqlRows.head == ((1L, 6L, 6L)))
  }

  test("storage-door table functions: stats, time travel, changed-since") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tvf_").toString
    val pub = s"$dir/pub"
    def gen(tag: String) = spark.range(80).toDF("id")
      .withColumn("bucket", col("id") % 2)
      .withColumn("payload",
        when(col("bucket") === 1, concat(lit(tag), col("id")))
          .otherwise(concat(lit("a"), col("id"))))
    graft.sinks.Sinks.writeShards(gen("a"), pub, "id", nShards = 2,
      zoneCols = Seq("id"), shardCol = Some("bucket"))
    graft.sinks.Sinks.publishDelta(gen("b"), pub, "id", nShards = 2,
      retainPrevious = true, shardCol = Some("bucket"))
    val stamp = graft.sinks.Sinks.listShardVersions(spark, pub).last

    val stats = spark.sql(
      s"SELECT shard, n_rows FROM shard_stats('$pub') ORDER BY shard")
      .as[(Long, Long)].collect().toSeq
    assert(stats == Seq((0L, 40L), (1L, 40L)))
    // stamped form reads the retired generation's manifest
    assert(spark.sql(
      s"SELECT count(*) FROM shard_stats('$pub', '$stamp')")
      .as[Long].head() == 2L)

    val old = spark.sql(
      s"SELECT payload FROM shards_at('$pub', '$stamp') WHERE id = 1")
      .as[String].head()
    assert(old == "a1", "time travel must answer the retired generation")

    val changed = spark.sql(
      s"SELECT id FROM shards_changed_since('$pub', '$stamp')")
      .as[Long].collect().sorted.toSeq
    assert(changed == (1L until 80L by 2).toSeq,
      "only the restated bucket flows to a catching-up consumer")

    // metadata distinct door from pure SQL (sketch-declared layout)
    val spub = s"$dir/sketched"
    graft.sinks.Sinks.writeShards(
      gen("a").withColumn("user", concat(lit("u"), col("id") % 20)),
      spub, "id", nShards = 4, sketchCols = Seq("user"))
    val approx = spark.sql(
      s"SELECT approx_distinct, n_rows FROM " +
        s"approx_distinct_shards('$spub', 'user')")
      .as[(Long, Long)].head()
    assert(approx._2 == 80L)
    assert(math.abs(approx._1 - 20L) <= 1,
      s"20 distinct users, estimated ${approx._1}")

    // non-literal / wrong-arity args fail loudly at analysis
    intercept[Exception] {
      spark.sql("SELECT * FROM shards_at('/nowhere')").collect()
    }
  }

  test("drift_audit table function matches the Column-API bucketShift") {
    val dir = java.nio.file.Files.createTempDirectory("graft_drift_tvf_").toString
    Seq.fill(80)("en").zipWithIndex.map(_.swap)
      .toDF("id", "lang").write.parquet(s"$dir/a")
    (Seq.fill(40)("en") ++ Seq.fill(40)("de")).zipWithIndex.map(_.swap)
      .toDF("id", "lang").write.parquet(s"$dir/b")
    val sqlRows = spark.sql(
      s"SELECT * FROM drift_audit('$dir/a', '$dir/b', 'lang')")
      .as[(String, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val colRows = graft.operators.Drift.bucketShift(
        spark.read.parquet(s"$dir/a"), spark.read.parquet(s"$dir/b"),
        col("lang"))
      .as[(String, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(sqlRows == colRows)
    assert(sqlRows == Seq(("de", 0L, 40L, true), ("en", 80L, 40L, true)))
    // a loosened threshold un-flags the shift
    val loose = spark.sql(
      s"SELECT * FROM drift_audit('$dir/a', '$dir/b', 'lang', 60, 100)")
      .as[(String, Long, Long, Boolean)].collect()
    assert(loose.forall(!_._4))
  }

  test("text_shingles / sig_match_frac SQL functions match the Column API") {
    Seq(("a b c d e f", "a b c d e x")).toDF("ta", "tb")
      .createOrReplaceTempView("ext_sh")
    val sqlSh = spark.sql("SELECT text_shingles(ta, 3) AS s FROM ext_sh")
      .as[Seq[String]].head()
    val colSh = spark.table("ext_sh")
      .select(graft.expressions.TextSignatures.shingles($"ta", 3).as("s"))
      .as[Seq[String]].head()
    assert(sqlSh == colSh && sqlSh.nonEmpty)
    val sqlFrac = spark.sql(
      "SELECT sig_match_frac(minhash_sig(ta, 32, 3), minhash_sig(tb, 32, 3), 32) AS f " +
        "FROM ext_sh").as[Double].head()
    val colFrac = spark.table("ext_sh")
      .select(graft.expressions.SigMatchFrac.sigMatchFrac(
        graft.expressions.TextSignatures.minHashSig($"ta", 32),
        graft.expressions.TextSignatures.minHashSig($"tb", 32), 32).as("f"))
      .as[Double].head()
    assert(sqlFrac == colFrac && sqlFrac > 0.0 && sqlFrac < 1.0)
  }

  test("lang_id / quality_score SQL functions match the Column API " +
       "over the fixture corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, lang_id(text) AS l, quality_score(text) AS q " +
        "FROM ext_docs ORDER BY doc_id")
      .as[(Long, String, Double)].collect().toSeq
    val viaCol = docs
      .withColumn("_mc", graft.functions.TextStats.counts($"text"))
      .select($"doc_id",
        graft.functions.TextStats.langId($"_mc").as("l"),
        graft.functions.TextStats.qualityScore($"text", $"_mc").as("q"))
      .orderBy($"doc_id")
      .as[(Long, String, Double)].collect().toSeq
    assert(viaSql == viaCol)
    assert(viaSql.map(_._2).distinct.size > 1,
      "fixture corpus must exercise more than one language")
  }

  test("rp_bands SQL function matches the Column API") {
    Seq(Tuple1(Array(0.5, -1.0, 2.0, 0.25))).toDF("v")
      .createOrReplaceTempView("ext_rp")
    val sqlB = spark.sql("SELECT rp_bands(v, 16, 4, 7) AS b FROM ext_rp")
      .as[Seq[Long]].head()
    val colB = spark.table("ext_rp")
      .select(graft.expressions.RpBands.rpBands($"v", 16, 4, 7L).as("b"))
      .as[Seq[Long]].head()
    assert(sqlB == colB && sqlB.length == 4)
  }

  test("adjacent_pair_stats SQL function matches the Column API") {
    Seq((1, 2L, "N"), (2, 3L, "N"), (4, 5L, "R"))
      .toDF("ln", "qty", "flag").createOrReplaceTempView("ext_ap")
    val packed = "sort_array(collect_list(struct(ln, qty, flag)))"
    val sqlRows = spark.sql(
      s"SELECT inline(adjacent_pair_stats($packed)) FROM ext_ap")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val colRows = spark.sql(s"SELECT $packed AS arr FROM ext_ap")
      .select(explode(graft.expressions.AdjacentPairStats.adjacentPairStats($"arr")))
      .select("col.*").as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(sqlRows == colRows && sqlRows.nonEmpty)
  }

  test("nearest_centroids SQL function: packed-frame assignment from pure SQL") {
    // two centroids; v is nearest c1 — ordering ties broken by id
    val out = spark.sql(
      """SELECT nearest_centroids(array(1.0D, 1.0D),
        |  array(struct(0L AS cid, array(10.0D, 10.0D) AS cv),
        |        struct(1L AS cid, array(1.0D, 2.0D) AS cv))) AS ids""".stripMargin)
      .as[Seq[Long]].head()
    assert(out == Seq(1L, 0L))
    // and it matches the literal-path expression on the same data
    val lit = Seq(Tuple1(Array(1.0, 1.0))).toDF("v")
      .select(graft.expressions.CentroidOps.nearestCentroids(
        $"v", Array(0L, 1L), Array(Array(10.0, 10.0), Array(1.0, 2.0))).as("ids"))
      .as[Seq[Long]].head()
    assert(out == lit)
  }

  test("kll family SQL functions resolve and round-trip build -> merge " +
       "-> quantile/rank from pure SQL") {
    Seq("kll_sketch_agg", "kll_merge_agg", "kll_quantile", "kll_rank")
      .foreach { f =>
        assert(spark.sql(s"DESCRIBE FUNCTION $f").collect().nonEmpty,
          s"$f must be registered")
      }
    val r = spark.sql(
      """SELECT kll_quantile(kll_merge_agg(sk), 0.5) AS p50,
        |       kll_rank(kll_merge_agg(sk), 25.0) AS r25
        |FROM (SELECT kll_sketch_agg(CAST(id AS DOUBLE)) AS sk
        |      FROM range(1, 101) GROUP BY id % 4)""".stripMargin)
      .as[(Double, Double)].head()
    assert(math.abs(r._1 - 50.0) <= 2.0, s"p50 of 1..100: ${r._1}")
    assert(math.abs(r._2 - 0.25) <= 0.02, s"rank(25) of 1..100: ${r._2}")
  }

  test("qbin_cuts TVF returns the VERIFIED cut table from pure SQL " +
       "and refuses a never-rebinned layout") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sqlcuts_").toString + "/pub"
    val df = spark.range(0, 2000).toDF("id")
      .withColumn("len", (col("id") * 7919L) % 1000L)
      .localCheckpoint()
    graft.sinks.Sinks.writeShards(df, dir, "id", nShards = 4,
      zoneCols = Seq("len"), quantileCols = Seq("len"))
    val missing = intercept[Exception](
      spark.sql(s"SELECT * FROM qbin_cuts('$dir')").collect())
    assert(missing.getMessage.contains("not a quantile-rebinned"))
    graft.sinks.Sinks.rebinShardsByQuantiles(spark, dir, "id", "len",
      nShards = 4)
    val rows = spark.sql(
      s"SELECT cut_idx, cut, bin_col FROM qbin_cuts('$dir') ORDER BY cut_idx")
      .as[(Long, Double, String)].collect()
    assert(rows.length == 3 && rows.forall(_._3 == "len"))
    val (binCol, apiCuts) = graft.sinks.Sinks.qbinCuts(spark, dir)
    assert(binCol == "len" && rows.map(_._2).toSeq == apiCuts)
  }

  test("vector_takedown TVF is the SQL procedure form of the " +
       "bloom-routed erasure door") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sqltd_").toString + "/idx"
    val emb = Tables(spark, sf).embeddings
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"),
        col("embedding").cast("array<double>").as("cv"))
    graft.operators.VectorIndex.publish(emb, dir, "vec_id", "embedding",
      nCells = 8, nShards = 4, centroids = Some(cents))
    val before = spark.read.parquet(s"$dir/data").count()
    val r = spark.sql(
      s"SELECT * FROM vector_takedown('$dir', 'vec_id', '3, 21, 987654321')")
      .as[(Long, Long, Long)].head()
    assert(r._1 == 3L && r._2 == before && r._3 == before - 2,
      s"expected (3, $before, ${before - 2}), got $r")
    val left = spark.read.parquet(s"$dir/data")
      .filter(col("vec_id").isin(3L, 21L)).count()
    assert(left == 0L, "taken-down ids must be gone")
    // the displaced generation is retained for audit
    assert(graft.sinks.Sinks.listShardVersions(spark, dir).nonEmpty)
  }

  test("the streaming quantile monitor's aggregation is expressible " +
       "in pure SQL (kll_sketch_agg over event-time windows)") {
    // batch replay of Drift.streamingQuantiles' exact aggregation
    // shape: same windows, same sketch family, ranks read back with
    // the registered scalar surface
    val ev = spark.range(0, 600).toDF("i")
      .select(
        (lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).cast("long")
          + col("i") * 6).cast("timestamp").as("ts"),
        (col("i") % 100).cast("double").as("v"))
      .localCheckpoint()
    ev.createOrReplaceTempView("ext_mon")
    val sqlRows = spark.sql(
      """SELECT window.start AS win_start, kll_quantile(kll_sketch_agg(v), 0.5) AS p50,
        |       COUNT(1) AS n
        |FROM ext_mon GROUP BY window(ts, '10 minutes')
        |ORDER BY win_start""".stripMargin)
      .as[(java.sql.Timestamp, Double, Long)].collect()
    val opRows = graft.operators.Drift.streamingQuantiles(
        ev, "ts", "v", "10 minutes", "0 seconds")
      .select(col("win_start"),
        org.apache.spark.sql.graftshim.ColumnBridge.column(
          graft.expressions.KllQuantile(
            org.apache.spark.sql.graftshim.ColumnBridge
              .catalystExpression(col("sketch")),
            org.apache.spark.sql.graftshim.ColumnBridge
              .catalystExpression(lit(0.5).cast("double")))).as("p50"),
        col("n"))
      .orderBy("win_start")
      .as[(java.sql.Timestamp, Double, Long)].collect()
    assert(sqlRows.length == opRows.length && sqlRows.nonEmpty)
    sqlRows.zip(opRows).foreach { case (a, b) =>
      assert(a._1 == b._1 && a._3 == b._3,
        s"window/count drift: $a vs $b")
      assert(math.abs(a._2 - b._2) <= 10.0,
        s"both paths must answer ~the same p50: $a vs $b")
    }
  }

  test("excise_shared_spans / dsir_weights TVFs match their Column " +
       "APIs from pure SQL over a parquet corpus") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_curation_tvf_").toString
    Seq(
      (1L, "en", "u1 u2 a b c d v1 v2"),
      (2L, "en", "w1 a b c d"),
      (3L, "fr", "a b c d x1 x2 x3"),
      (4L, "fr", "y1 y2 y3 y4 y5"))
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(dir)
    val sqlEx = spark.sql(
      s"SELECT * FROM excise_shared_spans('$dir', 'text', 'doc_id', 4, 3)")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val opEx = graft.operators.Dedup.exciseSharedSpans(
        spark.read.parquet(dir), "text", "doc_id", k = 4, minDf = 3L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sqlEx == opEx && sqlEx(2L) == "w1")
    val sqlW = spark.sql(
      s"SELECT * FROM dsir_weights('$dir', 'text', 'doc_id', " +
        "'lang = ''en''')")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val opW = graft.operators.Dsir.importanceWeightsWhen(
        spark.read.parquet(dir), col("lang") === "en", "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sqlW == opW && sqlW.size == 4)
    val sqlMix = spark.sql(
      s"SELECT * FROM mix_by_temperature('$dir', 'lang', 'doc_id', 0.5)")
      .collect().map(_.getLong(1)).toSet
    val opMix = graft.operators.Sampling.mixByTemperature(
        spark.read.parquet(dir), "lang", "doc_id", 0.5)
      .collect().map(_.getLong(1)).toSet
    assert(sqlMix == opMix && sqlMix.nonEmpty)
    // upsampling sibling: exact output MULTISET (id, copy_idx)
    val sqlUp = spark.sql(
      s"SELECT * FROM mix_by_temperature_upsample('$dir', 'lang', " +
        "'doc_id', 0.5)")
      .collect().map(r => (r.getLong(1), r.getLong(r.length - 1))).toSet
    val opUp = graft.operators.Sampling.mixByTemperatureUpsample(
        spark.read.parquet(dir), "lang", "doc_id", 0.5)
      .collect().map(r => (r.getLong(1), r.getLong(r.length - 1))).toSet
    assert(sqlUp == opUp && sqlUp.nonEmpty)
    // epoch shuffle key: SQL and Scala flip the identical salted coin
    val sqlKeys = spark.sql(
      s"SELECT doc_id, epoch_shuffle_key(doc_id, 3) FROM parquet.`$dir`")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val opKeys = spark.read.parquet(dir)
      .select(col("doc_id"),
        graft.operators.Sampling.epochShuffleKey(col("doc_id"), 3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sqlKeys == opKeys && sqlKeys.nonEmpty)
  }
}
