package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence PACKING — the step between "a corpus of documents" and "a
  * stream of fixed-length training examples". Two industry-standard
  * shapes, both deterministic pure functions of (corpus, parameters):
  *
  *  - [[packSegments]]: GPT-style concat-and-chunk. Documents are laid
  *    end to end in the epoch's deterministic shuffle order and the
  *    token stream is cut every `contextLen` tokens; a document that
  *    straddles a cut is SPLIT, so the output is one row per
  *    (document, window) SEGMENT with full provenance (where in the
  *    doc, where in the window). Zero padding by construction; the
  *    cost is cross-document attention contamination unless the
  *    trainer masks on the emitted boundaries.
  *  - [[packBins]]: padding-free first-fit-decreasing bin packing over
  *    the LENGTH HISTOGRAM (the approach of Krell et al. 2021,
  *    "Efficient Sequence Packing without Cross-contamination",
  *    arXiv:2107.02027 — strategies are solved on the length
  *    histogram, never the corpus). Documents are never split; each
  *    lands whole in exactly one bin of capacity `contextLen`.
  *
  * Differences from the neighbours in this package: [[Chunking]] slices
  * each document INDEPENDENTLY (no cross-doc state); [[Batching
  * .lengthBucketBatches]] groups similar lengths but pads to the bucket
  * ceiling; packing is the padding-eliminating composition a
  * pretraining dataloader actually ships.
  *
  * Scale shape (both doors): ONE range exchange — the prefix sum /
  * per-length rank runs through [[Ranks]] (range-partitioned order
  * statistics, no global sort, no single-partition window). Everything
  * else is a codegen'd projection, an explode bounded by
  * ⌈toks/contextLen⌉+1 segments per doc, or a broadcast join against a
  * histogram-sized table. No all-pairs term anywhere; at 100 TB the
  * exchange is the same one the epoch materialization already pays.
  */
object Packing {

  private def guardDerived(inputCols: Seq[String], derived: Seq[String],
                           door: String): Unit =
    require(!inputCols.exists(k => derived.exists(_.equalsIgnoreCase(k))),
      s"$door derives ${derived.mkString("/")}; rename the colliding columns")

  /** Concat-and-chunk packing with segment provenance.
    *
    * Orders rows by ([[Sampling.epochShuffleKey]](id, epoch), id) —
    * packing happens AFTER the epoch shuffle in a real dataloader, and
    * using the engine's salted key keeps the whole artifact replayable
    * in another engine (the q119–q123 contract). The exclusive running
    * token offset comes from [[Ranks.globalCumSum]]; each document
    * with span [off, off+toks) then explodes into the context windows
    * it intersects.
    *
    * Output: `idCol`, `keepCols`, and
    *  - `toks`       — the document's token count (from `toksCol`);
    *  - `window_id`  — 0-based fixed-length window index;
    *  - `win_pos`    — 0-based token position within the window where
    *                   this segment starts;
    *  - `doc_off`    — 0-based token offset within the document;
    *  - `seg_len`    — tokens of this document in this window
    *                   (1 ≤ seg_len ≤ contextLen).
    * Per window, segments tile [0, contextLen) exactly (the last
    * window of the corpus may be shorter) — the trainer's attention
    * mask is derivable from (window_id, win_pos, seg_len) alone.
    *
    * Rows with `toksCol` ≤ 0 or null are REJECTED at execution (a
    * zero-length doc has no place in a token stream and a silent drop
    * would hide upstream tokenizer bugs — filter them first).
    *
    * `copyIdxCol` (pass it for UPSAMPLED corpora out of [[Sampling
    * .upsampleByRate]] / [[Sampling.mixByTemperatureUpsample]])
    * switches to the replica-aware 3-arg shuffle key — same contract
    * as [[Batching.epochBatches]]: the ⌈rate⌉ copies of a doc
    * disperse through the token stream instead of sitting adjacent,
    * and because the key AND tie-breaks match epochBatches exactly,
    * pack order ≡ batch order for the same (corpus, epoch).
    */
  def packSegments(df: DataFrame, idCol: String, toksCol: Column,
                   contextLen: Int, epoch: Int = 0,
                   copyIdxCol: String = null,
                   keepCols: Seq[String] = Seq.empty): DataFrame = {
    require(contextLen > 0, s"need positive contextLen, got $contextLen")
    val copy = Option(copyIdxCol)
    val carried = (idCol +: copy.toSeq) ++ keepCols
    val derived = Seq("toks", "window_id", "win_pos", "doc_off", "seg_len",
      "_skey", "_cum", "_off")
    guardDerived(carried, derived, "packSegments")
    val L = contextLen.toLong
    val base = df
      .select(carried.map(col) :+ toksCol.cast("long").as("toks"): _*)
      .withColumn("toks",
        when(col("toks") > 0L, col("toks")).otherwise(raise_error(lit(
          s"packSegments: non-positive token count for a row — a token " +
            "stream cannot place an empty document; filter toks > 0 first"))))
      .withColumn("_skey", copy match {
        case Some(c) => Sampling.epochShuffleKey(col(idCol), epoch, col(c))
        case None    => Sampling.epochShuffleKey(col(idCol), epoch)
      })
    // keepCols ride as TRAILING order keys (after the (skey, id[,
    // copy]) total order they change nothing) — Ranks' reuse contract
    // requires every carried column to be a range key, see
    // Ranks.requireNoPrunablePayload
    Ranks.globalCumSum(base, Seq.empty,
        (col("_skey").asc +: col(idCol).asc +:
          copy.map(c => col(c).asc).toSeq) ++ keepCols.map(c => col(c).asc),
        "toks", cumCol = "_cum")
      .withColumn("_off", col("_cum") - col("toks"))
      .withColumn("window_id",
        explode(sequence(expr(s"_off div $L"),
          expr(s"(_off + toks - 1) div $L"))))
      .withColumn("win_pos",
        greatest(col("_off"), col("window_id") * L) - col("window_id") * L)
      .withColumn("doc_off",
        greatest(col("_off"), col("window_id") * L) - col("_off"))
      .withColumn("seg_len",
        least(col("_off") + col("toks"), (col("window_id") + 1) * L) -
          greatest(col("_off"), col("window_id") * L))
      .select(carried.map(col) ++ Seq(col("toks"),
        col("window_id"), col("win_pos"), col("doc_off"), col("seg_len")): _*)
  }

  /** One solved bin-strategy group: `slots` is the ordered multiset of
    * document lengths one bin of this group holds, `n` the number of
    * identical bins, `base` the first global bin id (bins are numbered
    * in group-open order). */
  private[operators] final case class Strategy(slots: List[Int], n: Long,
                                               base: Long)

  /** First-fit-decreasing over a length HISTOGRAM — sequential-FFD
    * equivalent, but each step places a whole COHORT of same-length
    * docs, so the solve is O(groups · slotsPerBin) independent of
    * corpus size. Returns groups in bin-open order with global bases
    * assigned. Exposed package-private for the spec's direct
    * adversarial inputs. */
  private[operators] def solveFfd(hist: Seq[(Int, Long)], contextLen: Int)
      : Vector[Strategy] = {
    require(hist.forall(_._2 > 0), "histogram counts must be positive")
    hist.foreach { case (l, _) =>
      require(l > 0, s"packBins: non-positive document length $l — filter first")
      require(l <= contextLen,
        s"packBins: document length $l exceeds contextLen $contextLen — " +
          "pre-chunk long documents (Chunking) before packing")
    }
    // (slots reversed for O(1) append, residual capacity, bin count)
    var groups = Vector.empty[(List[Int], Int, Long)]
    for ((l, c0) <- hist.sortBy { case (l, _) => -l }) {
      var c = c0
      while (c > 0) {
        val i = groups.indexWhere { case (_, resid, _) => resid >= l }
        if (i < 0) {
          // nothing open fits: sequential FFD fills fresh bins with
          // ⌊L/l⌋ docs each before the next doc opens another bin
          val perBin = contextLen / l
          val full = c / perBin
          if (full > 0)
            groups = groups :+ ((List.fill(perBin)(l),
              contextLen - perBin * l, full))
          val rem = (c % perBin).toInt
          if (rem > 0)
            groups = groups :+ ((List.fill(rem)(l),
              contextLen - rem * l, 1L))
          c = 0
        } else {
          val (slots, resid, n) = groups(i)
          if (c >= n) { // every bin of the group takes one doc
            groups = groups.updated(i, (l :: slots, resid - l, n))
            c -= n
          } else { // the FIRST c bins (open order) take one doc each
            groups = groups.patch(i,
              Seq((l :: slots, resid - l, c), (slots, resid, n - c)), 1)
            c = 0
          }
        }
      }
    }
    var base = 0L
    groups.map { case (rev, _, n) =>
      val s = Strategy(rev.reverse, n, base); base += n; s
    }
  }

  /** Padding-free packing: assign every document WHOLE to a bin of
    * capacity `contextLen` tokens via first-fit-decreasing solved on
    * the length histogram (Krell et al. 2021 — see object doc).
    *
    * Deterministic: the histogram fixes the strategies; within a
    * length, docs are ranked by (`idCol`, keepCols) ascending and
    * mapped to (strategy, slot) by pure interval arithmetic — rank r
    * of length l in demand interval [lo, hi] (slot p of a group with
    * base b) lands in bin `b + (r − lo)` at token offset
    * `sum(slots before p)`.
    *
    * Output: `idCol`, `keepCols`, `toks`, `bin_id` (0-based, dense),
    * `bin_pos` (0-based token offset inside the bin). Invariants (all
    * spec-pinned): every input row appears exactly once; per-bin
    * Σtoks ≤ contextLen; segments within a bin tile [0, Σtoks);
    * bin count ≤ (11/9)·OPT + 1 (FFD's published bound).
    *
    * Scale shape: the histogram is ≤ contextLen rows (bounded by the
    * PARAMETER, not the data — the one driver `collect` here is the
    * same class as a broadcast-dim read); the solve is driver-side
    * O(groups·slots); the assignment is ONE [[Ranks.globalRowNumbers]]
    * range exchange grouped by length plus a broadcast join against
    * the interval table (Σ strategy slots rows — at contextLen 2048
    * and ≥20-token docs that is ≤ ~40k rows, always broadcastable).
    * Documents longer than `contextLen` are REFUSED (compose with
    * [[Chunking]] upstream); lengths ≤ 0 are refused the same way.
    */
  def packBins(df: DataFrame, idCol: String, toksCol: Column,
               contextLen: Int, keepCols: Seq[String] = Seq.empty)
      : DataFrame = {
    require(contextLen > 0, s"need positive contextLen, got $contextLen")
    val derived = Seq("toks", "bin_id", "bin_pos",
      "_r", "_n", "_lo", "_hi", "_base", "_pos")
    guardDerived(idCol +: keepCols, derived, "packBins")
    val spark = df.sparkSession
    val base = df.select(
      (idCol +: keepCols).map(col) :+ toksCol.cast("int").as("toks"): _*)
    // the ONE driver-side read: ≤ contextLen rows by construction
    // (lengths outside (0, contextLen] are refused in solveFfd)
    val hist: Seq[(Int, Long)] = base.groupBy(col("toks")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val strategies = solveFfd(hist, contextLen)
    // demand intervals: per length, slots in (group-open, slot-index)
    // order claim consecutive rank ranges
    val nextLo = scala.collection.mutable.Map.empty[Int, Long]
      .withDefaultValue(1L)
    val iv = for {
      st <- strategies
      (l, p) <- st.slots.zipWithIndex
    } yield {
      val lo = nextLo(l); nextLo(l) = lo + st.n
      val pos = st.slots.take(p).map(_.toLong).sum
      (l, lo, lo + st.n - 1, st.base, pos)
    }
    // exhaustiveness: FFD places every doc, so demand == histogram
    val demand = iv.groupBy(_._1).view.mapValues(
      _.map(t => t._3 - t._2 + 1).sum).toMap
    hist.foreach { case (l, c) =>
      require(demand.getOrElse(l, 0L) == c,
        s"packBins internal: demand ${demand.getOrElse(l, 0L)} != count $c " +
          s"for length $l") // unreachable unless solveFfd is wrong
    }
    import spark.implicits._
    val ivDf = iv.toDF("toks", "_lo", "_hi", "_base", "_pos")
    // per-length global rank — range exchange, NOT a per-length window
    // sort (same rationale as Batching.lengthBucketBatches); keepCols
    // ride as trailing order keys per the Ranks reuse contract
    val ranked = Ranks.globalRowNumbers(base, Seq("toks"),
      col(idCol).asc +: keepCols.map(c => col(c).asc),
      rankCol = "_r", sizeCol = "_n")
    ranked.join(broadcast(ivDf),
        ranked("toks") === ivDf("toks") &&
          col("_r") >= col("_lo") && col("_r") <= col("_hi"))
      .select((idCol +: keepCols).map(col) ++ Seq(
        ranked("toks").cast("long").as("toks"),
        (col("_base") + (col("_r") - col("_lo"))).as("bin_id"),
        col("_pos").as("bin_pos")): _*)
  }
}
