package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the per-call cost of the ensure* staleness probes (VERDICT
  * r13 task 1: "manifest is one aggregate — measure it like the pack
  * guard's 0.06 s"). Times, at the given fixture dir:
  *   - `IndexManifest.textKey` over documents (the tokenize+fingerprint
  *     aggregate `TextSearch.ensureIndex` / `DedupIndex.ensure` pay per
  *     reuse check), and
  *   - `IndexManifest.rowsKey` over embeddings (the xxhash64 aggregate
  *     `AnnIndex.ensure` pays).
  * Three timed passes after one warmup, per-key medians printed —
  * BASELINE.md records the row next to the standing-probe medians the
  * aggregates now ride in.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.ManifestCost
  */
object ManifestCost {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def med(ts: Seq[Double]): Double = ts.sorted.apply(ts.length / 2)
    def time3(label: String)(f: => String): Unit = {
      f // warmup (codegen/JIT)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val k = f
        val s = (System.nanoTime() - t0) / 1e9
        require(k.nonEmpty); s
      }
      println(f"[manifest] $label%-28s median ${med(ts)}%6.3f s " +
        f"(passes ${ts.map(t => f"$t%.3f").mkString(" ")})")
    }
    time3("textKey(documents)") {
      graft.operators.IndexManifest.textKey(docs, "text", "bm25:b32")
    }
    time3("rowsKey(embeddings)") {
      graft.operators.IndexManifest.rowsKey(emb,
        Seq("vec_id", "embedding"), "annlsh:p4:t16:b8:qfalse")
    }
    spark.stop()
  }
}
