package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted IVF/LSH ANN index — the embedding-side twin of
  * `DedupIndex`: the corpus' normalized vectors are laid out ONCE under
  * their multi-table hyperplane bucket keys as a bucketed+sorted external
  * parquet table, so every subsequent query batch joins its probe buckets
  * against a bucketed scan with ZERO Exchange on the corpus side
  * (plan-asserted in AnnIndexSpec). `SimilaritySearch.ivfTopK` re-derives
  * the corpus postings — normalize + hash + explode ×nTables — on every
  * call; at 100 TB that recomputation, and the shuffle it feeds, dwarfs
  * the probe itself. Here it is paid once per layout.
  *
  * Bucket keys, normalization, scoring and rank semantics are shared with
  * `ivfTopK` (`VecExprs.hyperplaneBuckets`, `Dedup.normalized`,
  * `SimilaritySearch.topK`), so probe output is bit-identical to the
  * one-shot path on the same corpus (pinned in AnnIndexSpec) and the same
  * DuckDB oracle applies.
  */
object AnnIndex {

  def postingsTable(name: String): String = s"${name}_postings"

  /** Build (or rebuild) the postings index: (tbl, bkt, corpus_id, cv)
    * bucketed by (tbl, bkt). `numBuckets` sizes buckets for the CORPUS —
    * probes shuffle only the query batch to match it.
    *
    * `planesPerTable` <= 0 (the default) sizes the plane count from the
    * corpus via `Dedup.planesFor`: with a FIXED plane count, per-bucket
    * occupancy — and therefore every probe's candidate volume — grows
    * linearly with the corpus (the 10x rehearsal read 18.5 -> 181 MB of
    * probe shuffle at planes=4). The chosen geometry is persisted as
    * table properties, and `probe` reads it from there — the caller
    * cannot desynchronize probe hashing from the layout.
    */
  def write(corpus: DataFrame, vecCol: String, idCol: String, name: String,
            path: String, planesPerTable: Int = 0, nTables: Int = 16,
            numBuckets: Int = 32): Unit = {
    import graft.functions.VecExprs
    val raw = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("__v"))
    val planes =
      if (planesPerTable > 0) planesPerTable
      else Dedup.planesFor(raw.count())
    val postings = raw
      .repartition(graft.ops.Partitions.cpuSpread(raw), col("corpus_id"))
      .select(col("corpus_id"), Dedup.normalized(col("__v")).as("cv"))
      .select(col("corpus_id"), col("cv"),
        posexplode(VecExprs.hyperplaneBuckets(col("cv"), nTables, planes)))
      .select(col("pos").as("tbl"), col("col").as("bkt"),
        col("corpus_id"), col("cv"))
    val table = postingsTable(name)
    graft.sources.Bucketize.writeBucketed(postings, table,
      s"$path/postings", Seq("tbl", "bkt"), numBuckets)
    corpus.sparkSession.sql(s"ALTER TABLE `$table` SET TBLPROPERTIES (" +
      s"'graft.planesPerTable' = '$planes', 'graft.nTables' = '$nTables')")
  }

  /** The (planesPerTable, nTables) geometry persisted with the index. */
  def geometry(spark: org.apache.spark.sql.SparkSession,
               name: String): (Int, Int) = {
    val props = spark.sql(s"SHOW TBLPROPERTIES `${postingsTable(name)}`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    (props("graft.planesPerTable").toInt, props("graft.nTables").toInt)
  }

  /** Top-k per query against the persisted postings; the bucket geometry
    * comes from the index's own table properties. Output schema and rank
    * semantics are exactly `ivfTopK`'s (query_id, rank, corpus_id,
    * cosine). The candidate join never broadcasts and never reshuffles
    * the corpus: the query batch shuffles to the index's bucket count.
    */
  def probe(queries: DataFrame, vecCol: String, idCol: String, name: String,
            k: Int, planesPerTable: Int = 0, nTables: Int = 0): DataFrame = {
    import graft.functions.VecExprs
    val spark = queries.sparkSession
    val (planes, tables) =
      if (planesPerTable > 0 && nTables > 0) (planesPerTable, nTables)
      else geometry(spark, name)
    val q = queries
      .select(col(idCol).as("query_id"), Dedup.normalized(col(vecCol)).as("qv"))
      .select(col("query_id"), col("qv"),
        posexplode(VecExprs.hyperplaneBuckets(col("qv"), tables, planes)))
      .select(col("query_id"), col("qv"),
        col("pos").as("tbl"), col("col").as("bkt"))
    val postings = spark.table(postingsTable(name))
    // score before deduplicating multi-table hits, same rationale as
    // ivfTopK: once scored, the vectors drop out of the dedup shuffle
    val scored = postings.join(q, Seq("tbl", "bkt"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine",
        round(VecExprs.arrayDot(col("cv"), col("qv")), 6))
      .groupBy(col("query_id"), col("corpus_id"))
      .agg(first(col("cosine")).as("cosine"))
    SimilaritySearch.topK(scored, k)
  }

  /** Live query stream against the persisted postings: probe each
    * micro-batch and hand its top-k frame to `sink` — the embedding twin
    * of `DedupIndex.probeStream`. Each micro-batch is a static frame
    * inside foreachBatch, so the probe is EXACTLY the batch `probe`
    * (same plan, zero index-side Exchange); all state lives in the index
    * layout, not in stream memory.
    */
  def probeStream(stream: DataFrame, vecCol: String, idCol: String,
                  name: String, k: Int)(
      sink: (DataFrame, Long) => Unit):
      org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(probe(batch, vecCol, idCol, name, k), batchId)
      }
      .start()
}
