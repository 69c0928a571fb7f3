package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009) — the
  * standard score-free combiner for hybrid retrieval: fuse the lexical
  * (`TextSearch.topk`) and semantic (`SimilaritySearch` top-k) rankings of
  * the same query workload without comparing their incompatible scores.
  * Each list contributes 1/(c + rank) per (query, doc); the contributions
  * are materialized as exact round-to-integer micro-units so the fused
  * ranking is order-independent, deterministic, and hash-matches SQL.
  *
  * 100 TB shape: inputs are already top-k lists — |queries|·k rows each —
  * so the union, the (q, doc) sum, and the per-query window all run on
  * k-bounded data regardless of corpus size; the corpus-scale work happened
  * inside the per-family retrieval operators.
  */
object Retrieval {

  /** Fuse rank lists sharing the (q_id, doc_id, rank) shape. Output:
    * (q_id, doc_id, rrf_micro, rank), rank 1..k by (rrf_micro desc,
    * doc_id asc). `c` is the standard RRF damping constant (60).
    */
  def rrf(rankings: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "Retrieval.rrf: no rankings to fuse")
    require(c > 0 && k > 0, "Retrieval.rrf: c and k must be positive")
    val contrib = rankings.map(r =>
      r.select(col("q_id"), col("doc_id"),
        round(lit(1000000.0) / (lit(c) + col("rank")))
          .cast(LongType).as("contrib")))
      .reduce(_ unionByName _)
    val fused = contrib.groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("rrf_micro"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf_micro").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
