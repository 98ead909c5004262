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

  /** Explode `textCol` into (chunk_idx, chunk_start, chunk_text,
    * chunk_len) rows, keeping `keepCols`. Rows with empty/null text
    * yield no chunks. 1-based `substr` semantics match ANSI SQL
    * `substring`, so the chunk text itself is engine-portable. */
  def chunk(df: DataFrame, textCol: String, size: Int, step: Int,
            keepCols: Seq[String]): DataFrame = {
    require(size > 0 && step > 0 && step <= size,
      s"need 0 < step <= size, got size=$size step=$step")
    // the four outputs plus the internal text alias must not collide
    // with (or case-insensitively shadow) a kept input column — same
    // hazard class writeShards guards for `shard`
    val derived =
      Seq("chunk_idx", "chunk_start", "chunk_text", "chunk_len", "_graft_text")
    require(!keepCols.exists(k => derived.exists(_.equalsIgnoreCase(k))),
      s"chunk derives ${derived.mkString("/")}; rename the colliding keepCols")
    // everything below references the INTERNAL alias, never the
    // caller's column name spliced into SQL text (a name needing
    // backticks would otherwise break parsing / resolve as a struct
    // field) — and the alias frees keepCols to contain textCol itself
    val text = col("_graft_text")
    val len = length(text).cast("long")
    // chunk starts 0, step, 2·step … ≤ len-1 directly from stepped
    // `sequence` — exact integer arithmetic, no division anywhere
    val start = explode(when(len > 0L,
      sequence(lit(0L), len - 1L, lit(step.toLong)))
      .otherwise(lit(Array.empty[Long])))
    df.select(keepCols.map(col) :+ col(textCol).as("_graft_text"): _*)
      .select(keepCols.map(col) ++
        Seq(text, start.as("chunk_start")): _*)
      // start = idx·step with start < 2^31 (string length is an int),
      // so the double division is exact and the cast lossless
      .withColumn("chunk_idx", (col("chunk_start") / step).cast("long"))
      .withColumn("chunk_text",
        text.substr(col("chunk_start").cast("int") + 1, lit(size)))
      .withColumn("chunk_len", length(col("chunk_text")).cast("long"))
      .select(keepCols.map(col) ++
        Seq(col("chunk_idx"), col("chunk_start"),
          col("chunk_text"), col("chunk_len")): _*)
  }
}
