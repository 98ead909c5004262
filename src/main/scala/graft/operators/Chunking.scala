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
    * yield no chunks. 1-based `substring` semantics match ANSI SQL, so
    * the chunk text itself is engine-portable. */
  def chunk(df: DataFrame, textCol: String, size: Int, step: Int,
            keepCols: Seq[String]): DataFrame = {
    require(size > 0 && step > 0 && step <= size,
      s"need 0 < step <= size, got size=$size step=$step")
    val len = length(col(textCol)).cast("long")
    // integer ceil(len/step): `div` keeps it exact (a double `/` would
    // round near 2^53 at extreme lengths)
    val nChunks = expr(s"((length($textCol) - 1) div $step) + 1").cast("long")
    val idx = explode(when(len > 0L,
      sequence(lit(0L), nChunks - 1L)).otherwise(lit(Array.empty[Long])))
    df.select(keepCols.map(col) :+ col(textCol) :+ idx.as("chunk_idx"): _*)
      .withColumn("chunk_start", col("chunk_idx") * step)
      .withColumn("chunk_text",
        expr(s"substring($textCol, cast(chunk_start + 1 as int), $size)"))
      .withColumn("chunk_len", length(col("chunk_text")).cast("long"))
      .select(keepCols.map(col) ++
        Seq(col("chunk_idx"), col("chunk_start"),
          col("chunk_text"), col("chunk_len")): _*)
  }
}
