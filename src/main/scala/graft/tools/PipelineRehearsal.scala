package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end pipeline rehearsal (VERDICT r7 task 3): every operator has
  * been rehearsed ALONE at 10×/100×; this composes the real thing once —
  * read Nx corpus → Curation.sweepFull → semantic near-dup pruning →
  * Chunk → Bpe.tokenize → Pack.sequences — as ONE run with wall, shuffle
  * bytes, peak execution memory and row counts per stage. Stage outputs
  * are written to parquet and re-read (the checkpoint discipline a 100 TB
  * pipeline would use between phases), so each stage's cost is its own:
  * no accidental re-scans of upstream stages, which is exactly the
  * cross-operator pressure this rehearsal exists to surface.
  *
  * Usage: runMain graft.tools.PipelineRehearsal [corpusDir] [outDir]
  *   SPARK_GRAFT_REHEARSAL_COPIES controls the synthesis width (default
  *   100). Reuses corpusDir/documents10.parquet + embeddings10.parquet if
  *   present (same synthesis contract as ScaleRehearsal).
  */
object PipelineRehearsal {

  final class Tally extends SparkListener {
    val read = new java.util.concurrent.atomic.AtomicLong
    val write = new java.util.concurrent.atomic.AtomicLong
    val peakMem = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        peakMem.getAndAccumulate(m.peakExecutionMemory, math.max(_, _))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val corpusDir = args.headOption.getOrElse("/tmp/graft-sf100")
    val outDir = args.lift(1).getOrElse("/tmp/graft-pipeline")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nCopies = sys.env.get("SPARK_GRAFT_REHEARSAL_COPIES")
      .map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tally = new Tally
    spark.sparkContext.addSparkListener(tally)

    // ---- corpus (ScaleRehearsal synthesis contract) --------------------
    if (!new java.io.File(s"$corpusDir/documents10.parquet").exists()) {
      val copies = explode(sequence(lit(0), lit(nCopies - 1))).as("copy")
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"), copies)
        .select((col("doc_id") + col("copy") * lit(1000000L)).as("doc_id"),
          when(col("copy") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" copytoken"), col("copy")))
            .as("text"))
        .write.mode("overwrite").parquet(s"$corpusDir/documents10.parquet")
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"), copies)
        .select((col("vec_id") + col("copy") * lit(1000000L)).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, x + col("copy").cast("float") / 1000.0f)
              .otherwise(x)).as("embedding"))
        .write.mode("overwrite").parquet(s"$corpusDir/embeddings10.parquet")
    }

    var lastRows = 0L
    def stage(name: String)(f: => DataFrame): DataFrame = {
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      val (r0, w0) = (tally.read.get(), tally.write.get())
      tally.peakMem.set(0L)
      val t0 = System.nanoTime()
      val out = f
      out.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      val back = spark.read.parquet(s"$outDir/$name.parquet")
      lastRows = back.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val heap = (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / 1e9
      println(f"[pipeline] $name%-14s ${sec}%8.2f s  rows=$lastRows%-9d " +
        f"shufW=${(tally.write.get() - w0) / 1e6}%9.1f MB " +
        f"shufR=${(tally.read.get() - r0) / 1e6}%9.1f MB " +
        f"peakExec=${tally.peakMem.get() / 1e6}%8.1f MB heap=${heap}%5.1f GB")
      back
    }

    val t0 = System.nanoTime()
    // the eval set is FIXED (the 1× corpus' doc_id % 17 slice) — benchmarks
    // don't grow with the crawl
    val bench = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 17 === 0)
    val docsRaw = spark.read.parquet(s"$corpusDir/documents10.parquet")
      .withColumn("source", concat(lit("s"), col("doc_id") % 8))

    // 1. six-stage curation sweep (quality, repetition, exact dedup,
    //    decontamination, LM-perplexity gate, temperature mixing)
    val kept = stage("curate") {
      graft.operators.Curation.sweepFull(docsRaw, bench, "text", "doc_id",
          "source", decontaminateN = 4, lmVocabSize = 1000, lmMinCount = 2L,
          lmMaxBigrams = 100000, lmMaxNll = 7.0,
          mixTemperature = 2.0, mixTargetFrac = 0.5, seed = 42L,
          // parquet checkpoint between phases — the same discipline the
          // rehearsal itself uses for its stage outputs (r9)
          checkpointDir = outDir)
        .filter(col("kept")).select(col("doc_id"))
    }

    // 2. DSIR importance selection toward a FIXED 1× reference slice
    //    (doc_id % 17 == 1 — disjoint from the eval set): keep ~80% of the
    //    curated survivors by hashed-bigram importance, threshold from ONE
    //    percentile_approx aggregate, selection a pure filter scan (the
    //    corpus-sized form — nothing selection-sized touches the driver)
    val selected = stage("dsir") {
      val curated = docsRaw.join(kept, "doc_id")
      val target = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") % 17 === 1)
      val m = graft.operators.Dsir.fit(curated, target, "text",
        nBuckets = 10000)
      graft.operators.Dsir.selectFraction(curated, "text", "doc_id", m,
        frac = 0.8).select(col("doc_id"))
    }

    // 3. semantic near-dup pruning over the selection's embeddings
    //    (vec_id ≡ doc_id in the synthesis), auto √n cells, nProbe=2
    val unique = stage("semdedup") {
      val emb = spark.read.parquet(s"$corpusDir/embeddings10.parquet")
        .join(selected.withColumnRenamed("doc_id", "vec_id"), "vec_id")
      graft.operators.Dedup.semanticDedupMultiProbe(emb, "embedding",
          "vec_id", minCosine = 0.95, kClusters = 0, iters = 2, nProbe = 2)
        .filter(!col("is_dup"))
        .select(col("vec_id").as("doc_id"))
    }

    // 4. nearest-centroid domain tagging over the survivors' embeddings,
    //    centroids fit ONCE on the FIXED 1× labeled seed — the per-doc
    //    domain feed a mixing/analysis stage consumes downstream
    stage("tag") {
      val seed = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .filter(col("vec_id") % 5 === 0)
      val m = graft.operators.Classify.fitCentroids(seed, "embedding",
        "label")
      val emb = spark.read.parquet(s"$corpusDir/embeddings10.parquet")
        .join(unique.withColumnRenamed("doc_id", "vec_id"), "vec_id")
      graft.operators.Classify.classify(emb, "embedding", "vec_id", m)
    }

    // 5. chunk survivors into context windows. The synthesized corpus'
    // every doc has nCopies-1 cross-copy near-dups BY DESIGN, so semdedup
    // legitimately collapses survivors back to ~1× — which would starve
    // the tail stages of scale. SPARK_GRAFT_PIPELINE_FULL_TAIL=1 runs the
    // tail on the full curated set instead (as if dedup flagged rather
    // than dropped), so chunk/BPE/pack are exercised at corpus width
    // INSIDE the composition too.
    val tailIds =
      if (sys.env.get("SPARK_GRAFT_PIPELINE_FULL_TAIL").contains("1")) kept
      else unique
    val survivors = docsRaw.join(tailIds, "doc_id")
    val chunks = stage("chunk") {
      graft.operators.Chunk.split(survivors, "text", Seq("doc_id", "source"),
          size = 128, overlap = 16)
        .withColumn("cid", concat(col("doc_id"), lit(":"), col("chunk_id")))
    }

    // 6. BPE: fit on the surviving corpus (capped word table), tokenize
    //    every chunk
    val tokens = stage("bpe") {
      val model = graft.operators.Bpe.fit(survivors, "text", numMerges = 64,
        maxWords = 50000)
      graft.operators.Bpe.tokenize(chunks, "chunk_text",
          Seq("cid", "source"), model)
        .withColumn("n_toks",
          size(col("bpe_tokens")).cast(org.apache.spark.sql.types.LongType))
    }

    // 7. pack chunks into fixed-budget sequences per source shard
    stage("pack") {
      graft.operators.Pack.sequences(tokens.drop("bpe_tokens"), "n_toks",
        budget = 256L, groupCol = "source", idCol = "cid")
    }

    // 8. stand up the BM25 index over the curated corpus and run the fixed
    //    8-query retrieval workload against it — the search-side release
    //    artifact next to the packs (index build cost included in the
    //    stage; the probe never re-tokenizes the corpus)
    stage("bm25") {
      graft.operators.TextSearch.buildIndex(survivors, "text", "doc_id",
        "graft_pipeline_bm25", s"$outDir/bm25_index", numBuckets = 32)
      val qs = spark.read.parquet(s"$sfDir/documents.parquet")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id")).limit(8)
        .select(col("doc_id").as("q_id"),
          array_join(slice(graft.functions.Text.tokens(col("text")), 1, 6),
            " ").as("q_text"))
      graft.operators.TextSearch.probe(spark, "graft_pipeline_bm25",
        qs, "q_text", "q_id", k = 10)
    }

    println(f"[pipeline] TOTAL          ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    spark.stop()
  }
}
