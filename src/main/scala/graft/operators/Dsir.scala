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
  * broadcasts the model when it fits), one per-doc count-sum, one
  * 1-row broadcast normalizer. Documents with NULL text tokenize to
  * nothing and drop (no weight is defined on an empty token stream);
  * reference semantics for selection over these weights are q72's
  * seeded weighted sample / q27's bounded top-k.
  *
  * BOUNDED-VOCABULARY mode (`nBuckets > 0` — the paper's actual
  * setup, §2.1: n-grams HASHED into 10⁴ buckets): each token maps to
  * bucket `md5(token)[0:8] as uint32 mod nBuckets` and both unigram
  * models live on the buckets. This caps the model at nBuckets rows
  * NO MATTER the corpus vocabulary — an open-web crawl's 10⁹⁺ terms
  * (URLs, typos, code) would make the raw-vocab model join go
  * sort-merge on the corpus-sized exploded side, while the bucketed
  * model is broadcast-sized at ANY scale. The md5 prefix is the
  * engine-portable hash of the house (q-sample convention):
  * DuckDB replays it verbatim (`('0x' || substr(md5(w),1,8))::BIGINT
  * % nBuckets`), so bucketed weights stay under the value oracle.
  * Smoothing semantics carry over with V = occupied buckets. */
object Dsir {

  /** The model key: the raw token, or its md5-prefix hash bucket when
    * `nBuckets > 0` (engine-portable: the 8-hex-char prefix is an
    * unsigned 32-bit value, exact in a signed 64-bit long in any
    * engine). */
  private[graft] def keyOf(w: Column, nBuckets: Int): Column =
    if (nBuckets <= 0) w
    else pmod(conv(substring(md5(w), 1, 8), 16, 10).cast("long"),
      lit(nBuckets.toLong))

  /** Per-document DSIR importance weights of `raw` against `target`
    * (see object doc): returns (idCol, n_tokens, weight_micro) with
    * `weight_micro` the log importance weight in integer micro-nats.
    * `target` is typically a filtered subset of `raw` (a trusted
    * domain); target-only tokens outside the raw vocabulary are
    * ignored (the models share the raw vocab, the paper's setup). */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        textCol: String = "text",
                        idCol: String = "doc_id",
                        cjkAware: Boolean = false,
                        nBuckets: Int = 0): DataFrame = {
    val tokenize: Column => Column =
      if (cjkAware) Text.tokensCjk else Text.tokens
    val tokR = raw.select(col(idCol),
        explode(tokenize(col(textCol))).as("_w0"))
      .select(col(idCol), keyOf(col("_w0"), nBuckets).as("w"))
    val tokT = target.select(explode(tokenize(col(textCol))).as("_w0"))
      .select(keyOf(col("_w0"), nBuckets).as("w"))
    val cntR = tokR.groupBy("w").agg(count(lit(1)).as("c_r"))
    val cntT = tokT.groupBy("w").agg(count(lit(1)).as("c_t"))
    val model = cntR.join(cntT, Seq("w"), "left")
      .select(col("w"), col("c_r"),
        coalesce(col("c_t"), lit(0L)).as("c_t"))
    weightsFromModel(tokR, model, idCol)
  }

  /** [[importanceWeights]] when the target is a SUBSET of the raw
    * corpus picked by a predicate (q112's lang='en' shape — the
    * common curation case): both unigram models come out of ONE
    * explode+count pass (a conditional count rides the raw count's
    * shuffle), so the corpus is tokenized twice instead of three
    * times. Identical weights to the two-frame form by construction
    * (DsirSpec pins them equal). */
  def importanceWeightsWhen(raw: DataFrame, isTarget: Column,
                            textCol: String = "text",
                            idCol: String = "doc_id",
                            cjkAware: Boolean = false,
                            nBuckets: Int = 0): DataFrame = {
    val tokenize: Column => Column =
      if (cjkAware) Text.tokensCjk else Text.tokens
    val tok = raw.select(col(idCol), isTarget.as("_t"),
        explode(tokenize(col(textCol))).as("_w0"))
      .select(col(idCol), col("_t"), keyOf(col("_w0"), nBuckets).as("w"))
    val model = tok.groupBy("w").agg(
      count(lit(1)).as("c_r"),
      sum(when(col("_t"), 1L).otherwise(0L)).as("c_t"))
    weightsFromModel(tok.select(col(idCol), col("w")), model, idCol)
  }

  /** Shared weight tail: per-vocab rounded log-ratios, the 1-row
    * normalizer, the per-doc integer sum. `model` = (w, c_r, c_t). */
  private[graft] def weightsFromModel(tokR: DataFrame, model: DataFrame,
                               idCol: String): DataFrame = {
    // one rounded transcendental per VOCAB entry, never per token
    val ratio = model.select(col("w"),
      round(log((col("c_t") + lit(1L)).cast("double") /
          (col("c_r") + lit(1L)).cast("double")) * 1e6, 0)
        .cast("long").as("r_micro"))
    // the smoothing normalizer ln((Z_r+V)/(Z_t+V)) is per-token
    // constant — one 1-row aggregate, one rounded log
    val totals = model.agg(sum(col("c_r")).as("z_r"),
        count(lit(1)).as("v"), sum(col("c_t")).as("z_t"))
      .select(round(log((col("z_r") + col("v")).cast("double") /
            (coalesce(col("z_t"), lit(0L)) + col("v")).cast("double"))
          * 1e6, 0)
        .cast("long").as("norm_micro"))
    tokR.join(ratio, "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("r_micro")).as("_s"))
      .crossJoin(broadcast(totals))
      .select(col(idCol), col("n_tokens"),
        (col("_s") + col("n_tokens") * col("norm_micro"))
          .as("weight_micro"))
  }

  /** The RESAMPLE half of DSIR (Xie et al. §2: Gumbel-top-k over the
    * log importance weights = sampling k documents without
    * replacement with probability ∝ w(x)): each doc's selection key
    * is `weight_micro + Gumbel noise`, and the k largest keys win.
    * The noise is seeded by the engine's deterministic door coin
    * ([[Sampling.knuthCoin]] with [[Sampling.SaltGumbel]] — salted so
    * the draw is independent of every other sampling door's coin;
    * engine-portable integer arithmetic), mapped to (0,1) and through
    * −ln(−ln u), rounded to integer micro-nats like every
    * transcendental here — so the draw is a pure function of
    * (id, weight): reproducible across runs, partitionings, and
    * engines (q113's oracle replays the exact selection). Execution
    * is a bounded-heap top-k (TakeOrderedAndProject — per-partition
    * heaps, k rows to the driver), never a global sort. Ties break
    * by id. Returns (idCol, weight_micro, score_micro), the k
    * selected docs. */
  def resample(weighted: DataFrame, k: Int,
               idCol: String = "doc_id",
               weightCol: String = "weight_micro"): DataFrame = {
    require(k > 0, s"resample needs k > 0, got $k")
    // coin ∈ [0, 2³²) → u ∈ (0,1): the +0.5 keeps both log args
    // strictly inside their domains for every coin value
    val u = (Sampling.knuthCoin(col(idCol), Sampling.SaltGumbel)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val gumbel = round(-log(-log(u)) * 1e6, 0).cast("long")
    weighted.select(col(idCol), col(weightCol),
        (col(weightCol) + gumbel).as("score_micro"))
      .orderBy(col("score_micro").desc, col(idCol).asc)
      .limit(k)
  }
}
