package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adversarial-corpus probe for the span-excision coverage pass:
  * `runMain graft.ProfileExcision [nMirrors] [tokensPerDoc]` — builds
  * a fully-templated corpus (every gram hot, hot-starts ≈ tokens: the
  * worst case for the coverage test) and times the shipped
  * [[graft.operators.Dedup.exciseSharedSpans]] (native ExciseKept
  * kernel, sorted-starts interval walk) against the pre-round-15 HOF
  * tail (`exists` per token — O(tokens × hot-starts) per row), at a
  * doubling ladder of tokensPerDoc so the quadratic-vs-linear law is
  * visible, not asserted. */
object ProfileExcision {
  def main(args: Array[String]): Unit = {
    val nMirrors = if (args.length > 0) args(0).toInt else 64
    val maxToks = if (args.length > 1) args(1).toInt else 8000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt)
    import spark.implicits._

    def corpus(toksPerDoc: Int): DataFrame = {
      val template =
        (0 until toksPerDoc).map(i => s"t${i % 997}").mkString(" ")
      (0L until nMirrors.toLong).map(id => (id, template))
        .toDF("doc_id", "text")
    }

    // the pre-kernel HOF tail, reconstructed verbatim for the A/B
    def hofExcise(df: DataFrame, k: Int): DataFrame = {
      val norm = trim(regexp_replace(
        coalesce(col("text"), lit("")), "\\s+", " "))
      val toks = when(length(norm) === 0, array().cast("array<string>"))
        .otherwise(split(norm, " "))
      val base = df.select(col("doc_id").as("id"), toks.as("_toks"))
      val gramsOf = when(size(col("_toks")) >= k,
          transform(sequence(lit(0), size(col("_toks")) - k),
            i => concat_ws(" ", slice(col("_toks"), i + 1, lit(k)))))
        .otherwise(array().cast("array<string>"))
      val grams = base.select(col("id"),
          posexplode(gramsOf).as(Seq("_i", "_gram")))
        .select(col("id"), col("_i"),
          xxhash64(col("_gram")).as("_f1"),
          xxhash64(lit(1), col("_gram")).as("_f2"))
      val hot = grams.groupBy(col("_f1"), col("_f2"))
        .agg(countDistinct(col("id")).as("_df"))
        .filter(col("_df") >= 2L).select(col("_f1"), col("_f2"))
      val hotStarts = grams.join(hot, Seq("_f1", "_f2"))
        .groupBy(col("id")).agg(collect_list(col("_i")).as("_starts"))
      val kGap = lit(k)
      base.join(hotStarts, Seq("id"), "left")
        .select(col("id"), col("_toks"),
          coalesce(col("_starts"), array().cast("array<int>")).as("_st"))
        .select(col("id"), col("_toks"),
          filter(transform(col("_toks"),
              (w, i) => struct(w.as("w"), i.as("i"))),
            s => !exists(col("_st"),
              st => s("i") >= st && s("i") < st + kGap)).as("_kept"))
        .select(col("id"),
          array_join(transform(col("_kept"), s => s("w")), " ")
            .as("clean_text"),
          size(col("_toks")).cast("long").as("n_tokens"),
          (size(col("_toks")) - size(col("_kept"))).cast("long")
            .as("n_removed"))
    }

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    var toksPerDoc = maxToks / 4
    while (toksPerDoc <= maxToks) {
      val df = corpus(toksPerDoc).cache()
      df.count()
      val kernel = (1 to 2).map(_ => time(
        graft.operators.Dedup.exciseSharedSpans(
          df, "text", "doc_id", k = 8, minDf = 2L))).min
      val hof = (1 to 2).map(_ => time(hofExcise(df, 8))).min
      println(f"""{"probe":"excision_allhot","mirrors":$nMirrors,""" +
        f""""tokens_per_doc":$toksPerDoc,"kernel_sec":$kernel%.3f,""" +
        f""""hof_sec":$hof%.3f}""")
      df.unpersist()
      toksPerDoc *= 2
    }
    spark.stop()
  }
}
