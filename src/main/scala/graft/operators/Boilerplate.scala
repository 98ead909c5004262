package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus-frequency boilerplate removal — the CCNet/RefinedWeb
  * line-dedup step (Wenzek et al. 2020 §3.1 removes lines duplicated
  * across shards; Penedo et al. 2023 likewise — public papers): text
  * spans recurring across many documents (headers, footers, cookie
  * banners, navigation) are deleted from every document, keeping each
  * document's unique content in original order.
  *
  * The fixture corpus carries no newlines, so the unit of dedup is a
  * deterministic fixed-size word segment ([[Text.segments]]) rather
  * than a physical line — the machinery (segment → corpus document
  * frequency → scrub → reassemble) is identical, and the segmentation
  * is replayable in ANSI SQL so the whole operator value-oracles.
  *
  * Scale shape, at 100 TB:
  *  - segmentation + explode is a codegen'd per-row projection, no
  *    shuffle, linear in corpus bytes;
  *  - document frequency is distinct-(segment, doc) then a
  *    map-side-combinable count — ONE shuffle keyed by a 128-bit
  *    segment fingerprint (16 bytes/instance instead of the raw
  *    string; `exactStringKeys = true` restores the string key);
  *  - the boilerplate set (df ≥ minDocs) flags instances through a
  *    LEFT join with no static broadcast hint: it is usually tiny (the
  *    boilerplate vocabulary), but its size is corpus-dependent and
  *    adversarially up to segments/minDocs — AQE broadcasts it when
  *    the runtime size allows and shuffle-joins otherwise, the same
  *    no-forced-driver-transit stance as the q79 LM model join;
  *  - reassembly is ONE groupBy(doc) with groups bounded by document
  *    size, emitting n_seg / n_kept / clean_text together — every
  *    document has ≥1 segment, so group coverage is row parity and no
  *    third corpus scan or outer join is needed.
  */
object Boilerplate {

  /** Remove every segment occurring in ≥ `minDocs` distinct documents;
    * returns (idCol, clean_text, n_seg, n_kept) with one row per input
    * document (a fully-boilerplate document keeps its row with empty
    * `clean_text`).
    *
    * By default the document-frequency shuffle and the boilerplate
    * join are keyed by a 128-bit segment FINGERPRINT (two
    * independently-seeded xxhash64 words) instead of the raw segment
    * string — the round-11 bench showed the string key dominating
    * shuffle bytes (~50-char segments vs 16-byte keys; q82 was the
    * slowest catalog query). Output is identical unless two distinct
    * segments collide in all 128 bits (~n²/2¹²⁹ for n distinct
    * segments — 10¹⁵ segments → ~10⁻⁹; the spec audits zero
    * collisions on the fixture corpus and pins fingerprint == string
    * output). Pass `exactStringKeys = true` to shuffle the raw
    * strings when a hard exactness guarantee is worth the bytes. */
  def scrubFrequentSegments(docs: DataFrame, textCol: String = "text",
                            idCol: String = "doc_id", segWords: Int = 8,
                            minDocs: Long = 20,
                            exactStringKeys: Boolean = false,
                            cjkAware: Boolean = false): DataFrame = {
    require(minDocs > 1, s"minDocs=1 would scrub every document; got $minDocs")
    // NULL text segments as empty text — a null-text doc still yields
    // its one (empty) segment, so the one-row-per-document contract
    // holds for it too (without this, posexplode of a null array
    // would silently delete the doc from the output)
    // cjkAware: segment over char-level CJK words (Text.cjkPreSplit —
    // identity on space-delimited scripts), so ideographic boilerplate
    // forms segWords-char segments instead of whole-clause "words"
    val segText = coalesce(col(textCol), lit(""))
    val segArr =
      if (cjkAware) Text.segmentsCjk(segText, segWords)
      else Text.segments(segText, segWords)
    val segs = docs.select(col(idCol), posexplode(segArr).as(Seq("pos", "seg")))
    val keyCols: Seq[String] = if (exactStringKeys) Seq("seg") else Seq("_f1", "_f2")
    val keyed =
      if (exactStringKeys) segs
      else segs.withColumn("_f1", xxhash64(col("seg")))
        .withColumn("_f2", xxhash64(col("seg"), lit(1)))
    val boiler = keyed.select((keyCols :+ idCol).map(col): _*).distinct()
      .groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
      .select(keyCols.map(col) :+ lit(true).as("_bp"): _*)
    // LEFT join (not anti) so ONE reassembly aggregation yields
    // n_seg, n_kept, and the scrubbed text together: every document
    // has ≥1 segment, so group coverage IS row parity — no separate
    // base scan or outer join. Two corpus scans total (count pass +
    // scrub pass), the floor for a two-pass algorithm.
    keyed.join(boiler, keyCols, "left")
      .groupBy(col(idCol))
      .agg(
        concat_ws(" ", transform(
          filter(
            array_sort(collect_list(struct(col("pos"), col("seg"), col("_bp")))),
            x => x.getField("_bp").isNull),
          x => x.getField("seg"))).as("clean_text"),
        count(lit(1)).as("n_seg"),
        count(when(col("_bp").isNull, 1)).as("n_kept"))
      .select(col(idCol), col("clean_text"), col("n_seg"), col("n_kept"))
  }
}
