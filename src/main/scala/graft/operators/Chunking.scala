package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size overlapping document chunking — the retrieval/embedding
  * prep step (RAG indexing, context-window packing) that turns a
  * document corpus into a chunk corpus.
  *
  * A document of length L yields ⌈L/step⌉ chunks starting at
  * 0, step, 2·step, …; each chunk is `size` characters (the last one
  * shorter), so consecutive chunks overlap by `size - step`
  * characters. Everything is one codegen'd `sequence`+`explode`
  * projection per row: no shuffle, no join, no window — the chunk
  * count is derived per row, so the operator streams at scan speed on
  * 100 TB and parallelism is inherited from the input partitioning
  * (chunks of one doc stay in its partition; a downstream
  * repartition on chunk id rebalances if chunk work is the bottleneck).
  *
  * Character-based on purpose: byte/char offsets are the portable
  * currency of chunk provenance (the fixture is ASCII so they agree);
  * token-aware chunking composes by mapping token boundaries to char
  * offsets upstream.
  */
object Chunking {

  /** Chunk-start offsets 0, step, 2·step … ≤ len-1 as a (tiny) long
    * array — a stepped `sequence`, exact integer arithmetic; empty/
    * null text → empty array. THE shared start-derivation for both
    * API shapes below, so they chunk identically by construction. */
  private def chunkStarts(text: Column, step: Int): Column = {
    val len = length(text).cast("long")
    when(len > 0L, sequence(lit(0L), len - 1L, lit(step.toLong)))
      .otherwise(lit(Array.empty[Long]))
  }

  /** The three derived fields for the chunk at offset `s` (0-based).
    * The idx division is exact (s = idx·step < 2^31, string length is
    * an int); chunk_len is ARITHMETIC — min(size, len - s) — not a
    * `length(substring(...))` second copy of the chunk text; 1-based
    * `substr` matches ANSI SQL `substring`, so the chunk text itself
    * is engine-portable. */
  private def chunkFields(text: Column, s: Column, size: Int, step: Int)
      : Seq[(String, Column)] = Seq(
    "chunk_idx" -> (s / step).cast("long"),
    "chunk_start" -> s,
    "chunk_text" -> text.substr(s.cast("int") + 1, lit(size)),
    "chunk_len" -> least(lit(size.toLong), length(text).cast("long") - s))

  private def checkArgs(size: Int, step: Int): Unit =
    require(size > 0 && step > 0 && step <= size,
      s"need 0 < step <= size, got size=$size step=$step")

  /** The chunking projection as ONE array column: each element a
    * (chunk_idx, chunk_start, chunk_text, chunk_len) struct. The SQL
    * surface (`chunk_text(text, size, step)` via
    * [[graft.GraftExtensions]] — `inline`/`explode` it to rows); a
    * SQL caller receives the chunks as a VALUE, so this shape
    * necessarily materializes a document's chunks (~size/step × the
    * text) at once. For frame-to-frame chunking use [[chunk]], which
    * explodes the offsets first and never holds more than one chunk
    * copy per output row. */
  def chunkArray(text: Column, size: Int, step: Int): Column = {
    checkArgs(size, step)
    transform(chunkStarts(text, step), s =>
      struct(chunkFields(text, s, size, step)
        .map { case (n, c) => c.as(n) }: _*))
  }

  /** Explode `textCol` into (chunk_idx, chunk_start, chunk_text,
    * chunk_len) rows, keeping `keepCols`. Rows with empty/null text
    * yield no chunks. The OFFSETS array (⌈L/step⌉ longs) is what gets
    * exploded; each chunk's text is copied in the per-output-row
    * projection AFTER the explode, so peak memory per input row is
    * O(L), not O(L·size/step) — a 500 MB document chunks without ever
    * holding all its chunk copies at once (the array-of-structs form
    * would need ~size/step × the document in one generator row). */
  def chunk(df: DataFrame, textCol: String, size: Int, step: Int,
            keepCols: Seq[String]): DataFrame = {
    checkArgs(size, step)
    // the four outputs plus the internal aliases must not collide
    // with (or case-insensitively shadow) a kept input column — same
    // hazard class writeShards guards for `shard`
    val derived = Seq("chunk_idx", "chunk_start", "chunk_text", "chunk_len",
      "_graft_text", "_graft_s")
    require(!keepCols.exists(k => derived.exists(_.equalsIgnoreCase(k))),
      s"chunk derives ${derived.mkString("/")}; rename the colliding keepCols")
    // the operator references the caller's column through the Column
    // API only (never spliced into SQL text), so any legal column name
    // works and keepCols may contain textCol itself
    val text = col("_graft_text")
    df.select(keepCols.map(col) :+ col(textCol).as("_graft_text"): _*)
      .select(keepCols.map(col) ++ Seq(text,
        explode(chunkStarts(text, step)).as("_graft_s")): _*)
      .select(keepCols.map(col) ++
        chunkFields(text, col("_graft_s"), size, step)
          .map { case (n, c) => c.as(n) }: _*)
  }
}
