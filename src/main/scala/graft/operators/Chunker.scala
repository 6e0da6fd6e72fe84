package graft.operators

import graft.io.Parallelism
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document → training-sequence preparation: chunking (this file) and
  * packing ([[Packer]]).
  *
  * [[chunk]] splits each document's token stream into overlapping windows
  * (the RAG / long-context preprocessing step). Deterministic and
  * oracle-replayable.
  *
  * Scale design: chunking is PURE PER-ROW work — the window starts are a
  * `sequence`/`transform` pair and the only plan node added is one
  * `Generate` (explode), no shuffle anywhere, so it runs at scan speed on
  * any corpus size. The token array and the chunk-struct array are
  * materialized as real columns first (separate projections) because
  * nesting the tokenizer inside the per-chunk lambdas re-evaluates it per
  * chunk (the q86 lesson, see SURVEY §7.4b perf notes).
  */
object Chunker {

  /** Sliding token windows: chunk `i` covers tokens
    * `[i·stride, i·stride + width)` (tail chunks may be shorter); a document
    * with `n` tokens emits `⌊(n−1)/stride⌋ + 1` chunks, zero-token
    * documents emit none. Output: one row per chunk —
    * (id, chunk_idx, n_tokens, chunk_text).
    *
    * `width > stride` ⇒ overlapping context windows (the usual LLM
    * pre-tokenization layout); `width == stride` ⇒ exact partition. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            width: Int, stride: Int): DataFrame = {
    require(width > 0 && stride > 0, "width and stride must be positive")
    val toks = when(length(trim(col(textCol))) === 0,
        array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    // chunk structs materialized BEFORE the explode so the tokenizer runs
    // once per document, not once per emitted chunk.
    val chunks = when(size(col("__toks")) === 0,
        array().cast("array<struct<idx:int,ctoks:array<string>>>"))
      .otherwise(transform(
        sequence(lit(0), floor((size(col("__toks")) - 1) / stride).cast("int")),
        i => struct(i.cast("int").as("idx"),
          slice(col("__toks"), i * stride + 1, lit(width)).as("ctoks"))))
    Parallelism.ensure(df)
      .withColumn("__toks", toks)
      .withColumn("__chunks", chunks)
      .select(col(idCol).as("id"), explode(col("__chunks")).as("c"))
      .select(col("id"), col("c.idx").as("chunk_idx"),
        size(col("c.ctoks")).as("n_tokens"),
        concat_ws(" ", col("c.ctoks")).as("chunk_text"))
  }
}
