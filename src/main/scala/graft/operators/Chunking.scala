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

  /** The chunking projection as ONE array column: each element a
    * (chunk_idx, chunk_start, chunk_text, chunk_len) struct, empty/
    * null text → empty array. Shared by [[chunk]] and the SQL surface
    * (`chunk_text(text, size, step)` via [[graft.GraftExtensions]] —
    * `inline`/`explode` it to rows), so both APIs produce identical
    * chunks by construction. Chunk starts 0, step, 2·step … ≤ len-1
    * come from a stepped `sequence` — exact integer arithmetic; the
    * idx division is exact (start = idx·step < 2^31, string length is
    * an int). 1-based `substr` matches ANSI SQL `substring`, so the
    * chunk text itself is engine-portable. */
  def chunkArray(text: Column, size: Int, step: Int): Column = {
    require(size > 0 && step > 0 && step <= size,
      s"need 0 < step <= size, got size=$size step=$step")
    val len = length(text).cast("long")
    val starts = when(len > 0L,
      sequence(lit(0L), len - 1L, lit(step.toLong)))
      .otherwise(lit(Array.empty[Long]))
    transform(starts, s => struct(
      (s / step).cast("long").as("chunk_idx"),
      s.as("chunk_start"),
      text.substr(s.cast("int") + 1, lit(size)).as("chunk_text"),
      length(text.substr(s.cast("int") + 1, lit(size))).cast("long")
        .as("chunk_len")))
  }

  /** Explode `textCol` into (chunk_idx, chunk_start, chunk_text,
    * chunk_len) rows, keeping `keepCols`. Rows with empty/null text
    * yield no chunks. */
  def chunk(df: DataFrame, textCol: String, size: Int, step: Int,
            keepCols: Seq[String]): DataFrame = {
    // the four outputs plus the internal chunk alias must not collide
    // with (or case-insensitively shadow) a kept input column — same
    // hazard class writeShards guards for `shard`
    val derived =
      Seq("chunk_idx", "chunk_start", "chunk_text", "chunk_len", "_graft_c")
    require(!keepCols.exists(k => derived.exists(_.equalsIgnoreCase(k))),
      s"chunk derives ${derived.mkString("/")}; rename the colliding keepCols")
    // the operator references the caller's column through the Column
    // API only (never spliced into SQL text), so any legal column name
    // works and keepCols may contain textCol itself
    df.select(keepCols.map(col) :+
        explode(chunkArray(col(textCol), size, step)).as("_graft_c"): _*)
      .select(keepCols.map(col) ++
        Seq(col("_graft_c.chunk_idx").as("chunk_idx"),
          col("_graft_c.chunk_start").as("chunk_start"),
          col("_graft_c.chunk_text").as("chunk_text"),
          col("_graft_c.chunk_len").as("chunk_len")): _*)
  }
}
