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

  /** Aggregation buffer for [[BottomK]]: parallel arrays sorted by
    * (key, id), `n` live entries, capacity k. A case class of arrays
    * gets a product (Tungsten) encoder — rows serialize as UnsafeRow
    * arrays on spill/shuffle, no Kryo. */
  case class BKBuf(keys: Array[String], ids: Array[Long], n: Int)

  /** Keep the k (hashKey, id) pairs with smallest keys; emit ids in
    * key order.
    *
    * Hot path: one binary search + one `System.arraycopy` shift per
    * accepted row, and a constant-time reject (compare against the
    * current k-th entry) once the buffer is full — the common case on
    * large groups. No per-row sort, no per-row allocation after the
    * first k rows of a group (`ObjectHashAggregate` keeps the buffer
    * as a live object between rows; encoding happens only on
    * spill/shuffle). */
  class BottomK(k: Int) extends Aggregator[(String, Long), BKBuf, Seq[Long]] {
    require(k > 0, s"BottomK needs k > 0, got $k")

    // (key, id) lexicographic order — same total order Seq.sorted used.
    private def lt(k1: String, i1: Long, k2: String, i2: Long): Boolean = {
      val c = k1.compareTo(k2)
      c < 0 || (c == 0 && i1 < i2)
    }

    private def insert(b: BKBuf, key: String, id: Long): BKBuf = {
      if (b.n == k && !lt(key, id, b.keys(k - 1), b.ids(k - 1))) return b
      var lo = 0
      var hi = b.n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (lt(b.keys(mid), b.ids(mid), key, id)) lo = mid + 1 else hi = mid
      }
      val lastKept = math.min(b.n, k - 1) // entry at k-1 falls off when full
      System.arraycopy(b.keys, lo, b.keys, lo + 1, lastKept - lo)
      System.arraycopy(b.ids, lo, b.ids, lo + 1, lastKept - lo)
      b.keys(lo) = key
      b.ids(lo) = id
      if (b.n < k) b.copy(n = b.n + 1) else b
    }

    override def zero: BKBuf = {
      val ks = new Array[String](k)
      java.util.Arrays.fill(ks.asInstanceOf[Array[AnyRef]], "")
      BKBuf(ks, new Array[Long](k), 0)
    }
    override def reduce(b: BKBuf, a: (String, Long)): BKBuf =
      insert(b, a._1, a._2)
    override def merge(x: BKBuf, y: BKBuf): BKBuf = {
      var b = x
      var i = 0
      while (i < y.n) { b = insert(b, y.keys(i), y.ids(i)); i += 1 }
      b
    }
    override def finish(b: BKBuf): Seq[Long] =
      b.ids.take(b.n).toSeq
    override def bufferEncoder: Encoder[BKBuf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[BKBuf]()
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
    * `((id mod 2³¹)·2654435761) mod 2³² < rate·2³²` (Knuth's
    * multiplicative hash: uniform, engine-portable integer arithmetic,
    * no RNG state). The id is reduced mod 2³¹ FIRST so the product is
    * at most 2³¹·2654435761 < 2⁶³ — it never overflows a signed 64-bit
    * integer, so engines that silently wrap (Spark) and engines that
    * promote to 128-bit (DuckDB HUGEINT) compute the identical coin for
    * ANY 64-bit id, not just ids below ~3.5e9.
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
    df.filter(knuthCoin(col(idCol), SaltRate) < rate * lit(4294967296L))
  }

  /** TEMPERATURE-scaled domain rebalancing — the multilingual /
    * multi-source sampling rule (Conneau & Lample 2019 §3.1; the T5
    * mixing-rate form): kept counts per domain are proportional to
    * n_d^α (α = 1/T ∈ (0,1]; smaller α flattens the mix toward
    * uniform, α = 1 keeps the natural mix), via per-row keep rate
    *
    *   r_d = (n_min / n_d)^(1−α)
    *
    * SELF-NORMALIZED to the rarest domain (kept in full) — the
    * formulation is deliberately Σ-free: a Σ n_e^α normalizer would
    * be a float sum whose value depends on domain iteration order,
    * while this rate is one exact integer ratio and ONE pow per
    * domain, rounded to 6 dp (the q26 transcendental stance) before
    * it meets the engine-portable Knuth coin — so membership is a
    * pure function of (id, domain counts), bit-reproducible across
    * runs, partitionings, and engines (q114's value oracle replays
    * the exact kept set). One count aggregate (domain-cardinality
    * shuffle), one broadcast-back join, one filter — no sort, no RNG
    * state, scan-speed at 100 TB.
    *
    * NULL-domain POLICY: rows with a NULL domain DROP (they cannot be
    * rebalanced — no n_d is defined for them), and they are excluded
    * from the count model, so a NULL stratum can never become n_min
    * and deflate every real domain's keep rate. Callers who want
    * NULL-domain rows kept should coalesce the domain to a sentinel
    * first. */
  def mixByTemperature(df: DataFrame, domainCol: String, idCol: String,
                       alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1,
      s"alpha = 1/T must be in (0, 1], got $alpha")
    val counts = domainCounts(df, domainCol)
    val nMin = counts.agg(min(col("_nd")).as("_nmin"))
    val rates = counts.crossJoin(broadcast(nMin))
      .select(col(domainCol),
        round(pow(col("_nmin").cast("double") / col("_nd").cast("double"),
          1.0 - alpha), 6).as("_rate"))
    df.join(rates, domainCol)
      .filter(knuthCoin(col(idCol), SaltTemperature).cast("double") <
        col("_rate") * lit(4294967296.0))
      .drop("_rate")
  }

  /** Per-domain row counts with NULL domains dropped — the count pass
    * of both temperature mixers. The null-drop sits ABOVE the
    * aggregate on purpose (identical values: `count(1)` per non-null
    * group is unchanged by when the null group is discarded): with
    * the aggregate DIRECTLY over the scan, the grouped metadata-only
    * rewrite ([[graft.plans.ManifestAggregates]]) answers this pass
    * from the MANIFEST when `df` is a published layout sharded
    * single-group on the domain (the q87/q101 doors) — the counts
    * side then opens ZERO data files, so a temperature mix over a
    * published corpus pays one scan, not two
    * (MixingManifestCountsSpec pins the plan). A pre-aggregate
    * `filter(isNotNull)` would block the rewrite: the rule fires only
    * on the exact Aggregate-over-scan shape. */
  private def domainCounts(df: DataFrame, domainCol: String): DataFrame =
    df.groupBy(col(domainCol)).agg(count(lit(1)).as("_nd"))
      .filter(col(domainCol).isNotNull)

  /** Per-DOOR salts for [[knuthCoin]]. Every sampling operator flips
    * a coin from the same family but with its OWN salt — without
    * this, composed doors are pathologically correlated: an unsalted
    * shared coin makes `sampleByWeight(w=0.5)` → `assignSplit(.9/.05
    * /.05)` leave val and test EMPTY (every survivor has coin below
    * the train threshold), makes stacked rate doors keep min(r, w)
    * instead of r·w, and routes resampled high-coin docs into the
    * LAST split systematically. The values are arbitrary distinct
    * constants < 2³⁰ (xxhash-prime fragments), fixed forever for
    * reproducibility. */
  val SaltRate        = 0L          // mixByRate
  val SaltTemperature = 494742337L  // mixByTemperature  (0x1d872b41)
  val SaltWeight      = 625206417L  // sampleByWeight    (0x2545f491)
  val SaltSplit       = 668396335L  // assignSplit       (0x27d4eb2f)
  val SaltGumbel      = 375134129L  // Dsir.resample     (0x165667b1)
  val SaltUpsample    = 177573023L  // upsampleByRate    (0x0a95d91f)
  val SaltShuffle     = 528734635L  // epochShuffleKey   (0x1f83d9ab)

  /** THE deterministic per-row coin every sampler here flips, salted
    * per door:
    *
    *   x = ((id mod 2³⁰) + salt) mod 2³⁰
    *   q = (x·(2x+1)) mod 2³²          (injective quadratic mix)
    *   coin = ((q mod 2³¹)·2654435761) mod 2³²
    *
    * Engine portability: every product is bounded — x·(2x+1) <
    * 2³⁰·2³¹ = 2⁶¹ and (q mod 2³¹)·2654435761 < 2⁶³ — so engines
    * that silently wrap 64-bit (Spark) and engines that promote or
    * error on overflow (DuckDB) compute the identical coin for ANY
    * 64-bit id; pmod folds negative ids the same way on both sides.
    *
    * Why a QUADRATIC round and not just an additive salt: with only
    * the multiplicative hash, two doors' coins differ by a CONSTANT
    * offset mod 2³² (coin_B = coin_A + (sB−sA)·2654435761), so joint
    * keep-probabilities are interval overlaps, not products — the
    * exact composed-door pathology the salt exists to kill. The
    * quadratic makes the inter-door offset linear in x (q_B − q_A =
    * 4xΔs + c), sweeping the full circle, so thresholds on two doors
    * are independent to ~5e-4 (measured over 10⁶ ids: marginals
    * uniform, sample(0.5)→split(.9/.05/.05) = .9006/.0500/.0495,
    * all pairwise door correlations < 0.005 —
    * SamplingCompositionSpec pins this).
    *
    * One definition on purpose: the DataFrame operators and the SQL
    * function surface (`assign_split`, `sample_by_weight` via
    * [[graft.GraftExtensions]]) must flip the IDENTICAL coin per door
    * or the same row would land in different splits depending on
    * which API asked. The mod-2³⁰ reduction means ids differing by a
    * multiple of 2³⁰ share a coin (the unsalted form had the same
    * property at 2³¹) — content-independent ids make such collisions
    * harmless for sampling. */
  def knuthCoin(id: Column, salt: Long): Column = {
    require(salt >= 0 && salt < 1073741824L,
      s"coin salt must be in [0, 2^30), got $salt")
    coinOf(id, lit(salt))
  }

  /** [[knuthCoin]] with a COLUMN salt (the replica-aware
    * [[epochShuffleKey]] derives its salt from `copy_idx` per row).
    * Callers must keep the salt in [0, 2³⁰) — the bound the require
    * in [[knuthCoin]] enforces for literal salts. */
  private def coinOf(id: Column, salt: Column): Column = {
    val x = pmod(pmod(id.cast("long"), lit(1073741824L)) + salt,
      lit(1073741824L))
    val q = pmod(x * (x * lit(2L) + lit(1L)), lit(4294967296L))
    pmod(pmod(q, lit(2147483648L)) * lit(2654435761L), lit(4294967296L))
  }

  /** The [[sampleByWeight]] keep-decision as a boolean column over
    * (id, weight) — shared by the operator and the SQL surface. */
  def weightKeep(id: Column, weight: Column): Column = {
    val w = least(greatest(weight.cast("double"), lit(0.0)), lit(1.0))
    knuthCoin(id, SaltWeight).cast("double") < w * lit(4294967296.0)
  }

  /** The [[assignSplit]] label as a string column over the id —
    * shared by the operator and the SQL surface. */
  def splitLabel(id: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      s"splits need positive fractions, got $splits")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"split fractions must sum to 1, got $total")
    val thresholds = splits.scanLeft(0.0)(_ + _._2).tail
      .map(f => math.floor(f * 4294967296.0).toLong)
    val coin = knuthCoin(id, SaltSplit)
    // last split catches the rounding residue so no row is unlabeled
    splits.init.zip(thresholds.init).reverse
      .foldLeft(lit(splits.last._1): Column) { case (acc, ((name, _), t)) =>
        when(coin < lit(t), lit(name)).otherwise(acc)
      }
  }

  /** Deterministic FRACTIONAL UPSAMPLING: replicate each row
    * `floor(rate)` times plus one more when the [[SaltUpsample]] coin
    * lands under the fractional part — so a domain at rate 2.3 comes
    * out at exactly 2.3× in expectation, with membership of the extra
    * copy a pure function of the id (reproducible across runs,
    * partitionings, engines; independent of every other door's coin).
    * Output carries `copy_idx` ∈ [0, copies) so downstream shuffling/
    * splitting can treat copies as distinct rows — the epoch shuffle
    * MUST consume it via the replica-aware 3-arg [[epochShuffleKey]]
    * (the id-only key would seat all copies adjacent every epoch). One codegen'd
    * sequence+explode projection — scan-speed, no shuffle; rows with
    * rate ≤ 0 drop (zero copies). This is the half of corpus
    * rebalancing the keep-coin doors can't express: mixByRate and
    * mixByTemperature only DOWN-sample, while the multilingual
    * training recipes (Conneau & Lample 2019; T5) UP-sample rare
    * domains toward the flattened mix. */
  def upsampleByRate(df: DataFrame, idCol: String,
                     rate: Column): DataFrame = {
    // withColumn would silently OVERWRITE a pre-existing copy_idx —
    // re-upsampling an already-upsampled frame would drop the first
    // replication's indices and corrupt the multiset. Refuse loudly;
    // callers who really mean to re-replicate should fold the old
    // copy_idx into the id (or rename it) first.
    val derived = Seq("copy_idx", "_upsample_n")
    require(!df.columns.exists(c => derived.exists(_.equalsIgnoreCase(c))),
      s"upsampleByRate derives ${derived.mkString("/")}; the input " +
        "already has one of these columns — rename it (re-upsampling " +
        "an upsampled frame silently drops the first copy_idx)")
    val whole = floor(rate.cast("double")).cast("long")
    val frac = rate.cast("double") - whole.cast("double")
    val extra = (knuthCoin(col(idCol), SaltUpsample).cast("double") <
      frac * lit(4294967296.0)).cast("long")
    val copies = greatest(whole + extra, lit(0L))
    df.withColumn("_upsample_n", copies)
      .filter(col("_upsample_n") > 0)
      .withColumn("copy_idx",
        explode(sequence(lit(0L), col("_upsample_n") - 1)))
      .drop("_upsample_n")
  }

  /** TEMPERATURE-scaled rebalancing by UPSAMPLING — the same
    * flattened-mix target as [[mixByTemperature]] (counts ∝ n_d^α)
    * but self-normalized to the LARGEST domain instead of the
    * rarest: rate_d = (n_max/n_d)^(1−α) ≥ 1, so the common domain
    * passes through exactly once (copy_idx 0) and rare domains
    * replicate toward the flat mix — the direction the multilingual
    * recipes actually train with (rare languages repeat; nothing is
    * thrown away). Σ-free like its sibling (one exact integer ratio
    * + one pow per domain, rounded 6 dp before the coin), so the
    * exact output multiset is engine-replayable. NULL-domain rows
    * drop (the [[mixByTemperature]] policy). One count shuffle, one
    * broadcast-back join, one explode — scan-speed at 100 TB. */
  def mixByTemperatureUpsample(df: DataFrame, domainCol: String,
                               idCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1,
      s"alpha = 1/T must be in (0, 1], got $alpha")
    val counts = domainCounts(df, domainCol)
    val nMax = counts.agg(max(col("_nd")).as("_nmax"))
    val rates = counts.crossJoin(broadcast(nMax))
      .select(col(domainCol),
        round(pow(col("_nmax").cast("double") / col("_nd").cast("double"),
          1.0 - alpha), 6).as("_rate"))
    upsampleByRate(df.join(rates, domainCol), idCol, col("_rate"))
      .drop("_rate")
  }

  /** Deterministic EPOCH-SHUFFLE key: a per-(id, epoch) uniform that
    * orders the corpus into a reproducible training permutation —
    * epoch e's order is `sort by epochShuffleKey(id, e)`, a DIFFERENT
    * permutation each epoch, bit-stable across runs/partitionings/
    * engines (the property that makes a training run resumable and
    * auditable: step N's batch is a pure function of (corpus, epoch)).
    * The per-epoch salt folds the epoch into [[SaltShuffle]] through
    * the engine's multiplier mod 2³⁰ — distinct epochs get distinct
    * salts, every product stays < 2⁶³, and the SQL oracle replays the
    * identical fold. At 100 TB nobody globally sorts by this key: the
    * dataloader range-partitions on it (sort within partitions) or
    * takes bounded batches via top-k — both order-compatible with
    * this key; the key itself is one codegen'd projection.
    *
    * UPSAMPLED corpora must use the replica-aware overload
    * ([[epochShuffleKey(id:org\.apache\.spark\.sql\.Column,epoch:Int,copyIdx:org\.apache\.spark\.sql\.Column)*
    * 3-arg form]]) — this id-only key cannot tell copies apart. */
  def epochShuffleKey(id: Column, epoch: Int): Column = {
    require(epoch >= 0, s"epoch must be >= 0, got $epoch")
    val salt = (SaltShuffle + epoch.toLong * 2654435761L) % 1073741824L
    knuthCoin(id, salt)
  }

  /** Multiplier folding `copy_idx` into the shuffle salt. DISTINCT
    * from the epoch fold's 2654435761 on purpose: with a shared
    * multiplier, salt(epoch, copy) = salt(epoch + copy, 0), pinning
    * replica c of every doc to exactly where the doc itself sits in
    * epoch e + c — a deterministic cross-epoch echo instead of an
    * independent position. 2246822519 is xxhash32's PRIME32_2 (odd,
    * so the fold sweeps all residues mod 2³⁰). */
  private[graft] val CopyFold = 2246822519L

  /** REPLICA-AWARE [[epochShuffleKey]]: a per-(id, copy_idx, epoch)
    * uniform for corpora that passed through [[upsampleByRate]] /
    * [[mixByTemperatureUpsample]]. The id-only key gives all ⌈rate⌉
    * copies of an upsampled document the IDENTICAL key, so they sit
    * adjacent in EVERY epoch's order forever — a rare-language doc
    * replicated 4× would land 4 times in the same training batch,
    * the opposite of what replication is for. This overload folds
    * `copy_idx` into the salt the same bounded-multiplier way the
    * epoch folds in: salt = (base + (copy mod 2³⁰)·[[CopyFold]]) mod
    * 2³⁰ — every product stays < 2⁶² (the < 2⁶³ engine-portability
    * envelope holds: Spark's wrapping and DuckDB's promoting
    * arithmetic agree for any id and any copy_idx), and copy 0
    * reproduces the 2-arg key EXACTLY (base + 0 ≡ base), so a
    * non-upsampled corpus (all copy_idx = 0) orders identically
    * under either overload. SamplingCompositionSpec pins both the
    * copy-0 identity and the replica dispersion (adjacent-replica
    * count ≈ the random expectation, not n_copies). */
  def epochShuffleKey(id: Column, epoch: Int, copyIdx: Column): Column = {
    require(epoch >= 0, s"epoch must be >= 0, got $epoch")
    val base = (SaltShuffle + epoch.toLong * 2654435761L) % 1073741824L
    val salt = pmod(lit(base) +
      pmod(copyIdx.cast("long"), lit(1073741824L)) * lit(CopyFold),
      lit(1073741824L))
    coinOf(id, salt)
  }

  /** Importance sampling: keep each row with probability equal to its
    * OWN weight column (clamped to [0,1]) — the per-document form of
    * [[mixByRate]] (rate looked up per row instead of per domain).
    * This is quality-weighted down-sampling: feed it a quality score
    * and the kept corpus is re-weighted toward high-quality docs
    * without a sort, a shuffle, or RNG state. Same Knuth coin, so the
    * decision is a pure function of (id, weight): reproducible across
    * runs/partitionings/engines, and stable per doc as the corpus
    * grows. Weights outside [0,1] clamp (≤0 never keeps, ≥1 always). */
  def sampleByWeight(df: DataFrame, weightCol: String,
                     idCol: String): DataFrame =
    df.filter(weightKeep(col(idCol), col(weightCol)))

  /** Deterministic stratified train/val/test split: every row gets a
    * split label from the SAME content-independent coin [[mixByRate]]
    * flips (Knuth multiplicative hash of the id — overflow-free for
    * any 64-bit id, identical in any engine), compared against
    * PRE-COMPUTED integer thresholds: coin < ⌊cum_frac·2³²⌋ picks the
    * first matching split. No RNG state, no shuffle, no sort — one
    * codegen'd projection — and a row's split NEVER changes as the
    * corpus grows, which is the property that keeps eval sets
    * uncontaminated across corpus versions (a fraction-of-row_number
    * split reshuffles membership on every insert). `splits` fractions
    * must sum to 1 (±1e-9); labels are assigned in the given order. */
  def assignSplit(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", splitLabel(col(idCol), splits))
}
