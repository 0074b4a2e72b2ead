package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{TextFunctions => TF}

/** Fixed-size overlapping token chunking — RAG / embedding-index prep:
  * every document becomes windows of `size` whitespace tokens advancing
  * by `size - overlap`, so consecutive chunks share `overlap` tokens and
  * every token lands in at least one chunk (the last window is allowed to
  * run short rather than drop the tail).
  *
  * Scale: pure projection + generator — the window starts are computed
  * per row with `sequence`, materialized with one `posexplode`, and no
  * shuffle, sort, or state appears anywhere in the plan; the operator is
  * map-only and scales linearly with corpus bytes. Chunk ids are derived
  * (0-based window ordinal), so re-runs are deterministic and chunks can
  * be keyed (doc_id, chunk_id) downstream without a global id pass.
  */
object Chunk {

  /** (idCol, chunk_id, n_tokens, chunk_text) — one row per token window.
    * `overlap` must be < `chunkSize`. Documents whose token count is
    * <= `chunkSize` yield exactly one chunk (possibly short). */
  def tokenChunks(docs: DataFrame, textCol: String, idCol: String,
                  chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val toks = TF.tokens(col(textCol))
    // window starts: 1, 1+stride, ... while start <= max(len - overlap, 1)
    // — the last start is the one whose window still contributes >= 1
    // token beyond the previous chunk's coverage.
    val starts = sequence(lit(1),
      greatest(TF.tokenCount(col(textCol)).cast(IntegerType) - overlap, lit(1)),
      lit(stride))
    val chunks: Column = transform(starts, s => slice(toks, s, lit(chunkSize)))
    docs
      .select(col(idCol), posexplode(chunks).as(Seq("chunk_id", "_toks")))
      .select(col(idCol), col("chunk_id").cast(LongType),
        size(col("_toks")).cast(LongType).as("n_tokens"),
        array_join(col("_toks"), " ").as("chunk_text"))
  }
}
