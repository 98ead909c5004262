package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Data Selection with Importance Resampling — DSIR (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169): score every document of a RAW corpus by how
  * much more likely it is under a TARGET-domain unigram model than
  * under the raw model,
  *
  *   log w(x) = Σ_tokens [ ln p_t(w) − ln p_r(w) ]
  *            = Σ_tokens ln((c_t(w)+1)/(c_r(w)+1))
  *              + n_tokens · ln((Z_r+V)/(Z_t+V))
  *
  * with add-one smoothing over the RAW vocabulary (V = |raw vocab|,
  * Z = total token instances per side). High-weight documents "look
  * like" the target domain — the principled replacement for
  * source-allowlist selection when curating from a mixed crawl (the
  * paper's use case: select English-quality data from a multilingual
  * pool, which q112 reproduces with lang='en' as the target).
  *
  * DETERMINISM (the q26/q79 stance): each per-token log-ratio is
  * computed ONCE per vocabulary entry and immediately rounded to
  * integer MICRO-NATS (×10⁶, round-to-int) — one transcendental per
  * term, ulp noise absorbed by the rounding — and the per-document
  * weight is then an INTEGER sum, order-independent and bit-exact at
  * any parallelism, which is what lets the whole pipeline sit under
  * the DuckDB value oracle (a float log-prob sum would drift by
  * partition order). Resolution cost: 1e-6 nats/token, ~12 orders
  * below any selection decision.
  *
  * Scale shape: two explode→count token models (map-side combinable;
  * the shuffle carries the VOCABULARY, not the corpus), one
  * vocab-sized ratio join back to the exploded raw tokens (AQE
  * broadcasts the model when it fits — the paper hashes n-grams into
  * 10⁴ buckets for exactly this boundedness; swap `Text.tokens` for
  * a bucketed hash to reproduce that at 100 TB vocabularies), one
  * per-doc count-sum, one 1-row broadcast normalizer. Documents with
  * NULL text tokenize to nothing and drop (no weight is defined on
  * an empty token stream); reference semantics for selection over
  * these weights are q72's seeded weighted sample / q27's bounded
  * top-k. */
object Dsir {

  /** Per-document DSIR importance weights of `raw` against `target`
    * (see object doc): returns (idCol, n_tokens, weight_micro) with
    * `weight_micro` the log importance weight in integer micro-nats.
    * `target` is typically a filtered subset of `raw` (a trusted
    * domain); target-only tokens outside the raw vocabulary are
    * ignored (the models share the raw vocab, the paper's setup). */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        textCol: String = "text",
                        idCol: String = "doc_id",
                        cjkAware: Boolean = false): DataFrame = {
    val tokenize: Column => Column =
      if (cjkAware) Text.tokensCjk else Text.tokens
    val tokR = raw.select(col(idCol),
      explode(tokenize(col(textCol))).as("w"))
    val tokT = target.select(explode(tokenize(col(textCol))).as("w"))
    val cntR = tokR.groupBy("w").agg(count(lit(1)).as("c_r"))
    val cntT = tokT.groupBy("w").agg(count(lit(1)).as("c_t"))
    // one rounded transcendental per VOCAB entry, never per token
    val ratio = cntR.join(cntT, Seq("w"), "left")
      .select(col("w"),
        round(log((coalesce(col("c_t"), lit(0L)) + lit(1L)).cast("double") /
            (col("c_r") + lit(1L)).cast("double")) * 1e6, 0)
          .cast("long").as("r_micro"))
    // the smoothing normalizer ln((Z_r+V)/(Z_t+V)) is per-token
    // constant — two 1-row aggregates, one rounded log
    val totals = cntR.agg(sum(col("c_r")).as("z_r"),
        count(lit(1)).as("v"))
      .crossJoin(cntT.agg(coalesce(sum(col("c_t")), lit(0L)).as("z_t")))
      .select(round(log((col("z_r") + col("v")).cast("double") /
            (col("z_t") + col("v")).cast("double")) * 1e6, 0)
        .cast("long").as("norm_micro"))
    tokR.join(ratio, "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("r_micro")).as("_s"))
      .crossJoin(broadcast(totals))
      .select(col(idCol), col("n_tokens"),
        (col("_s") + col("n_tokens") * col("norm_micro"))
          .as("weight_micro"))
  }
}
