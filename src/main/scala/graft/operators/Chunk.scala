package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking — split long documents into fixed-size token windows
  * with overlap (training-example construction: every LLM data pipeline
  * cuts its curated corpus into model-context-sized windows before
  * packing/batching; the overlap preserves cross-boundary context).
  *
  * Chunk boundaries are TOKEN positions over the normalized token stream
  * (the same `Text.tokens` stream every other text operator uses), so the
  * chunk body is the space-joined normalized tokens — deterministic and
  * oracle-reproducible, and exactly what a tokenizer-fed training pipeline
  * wants (raw-byte offsets would re-introduce the un-normalized text the
  * earlier curation stages already canonicalized away).
  *
  * Scale shape: ONE loop-codegen `TokenChunks` pass + explode — zero
  * shuffles, embarrassingly parallel at any corpus size. Output rows
  * carry (idCols..., chunk_id, chunk_text, n_chunk_tokens); docs with no
  * tokens produce no chunks (callers left-join if they need the census).
  */
object Chunk {

  def split(df: DataFrame, textCol: String, idCols: Seq[String],
            size: Int = 2048, overlap: Int = 0): DataFrame = {
    require(overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    df.select(idCols.map(col) :+
        explode(graft.functions.VecExprs.tokenChunks(col(textCol), size, stride))
          .as("__c"): _*)
      .select(idCols.map(col) :+ col("__c.chunk_id").as("chunk_id") :+
        col("__c.chunk_text").as("chunk_text") :+
        col("__c.n_chunk_tokens").as("n_chunk_tokens"): _*)
  }
}
