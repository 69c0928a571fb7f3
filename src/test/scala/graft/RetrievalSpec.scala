package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** RRF fusion laws: agreement across lists dominates any single-list
  * position, contributions are the exact 1e6/(c+rank) integers, and the
  * fused ranking is deterministic.
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a doc ranked in BOTH lists outranks single-list rank-1 docs") {
    // doc 100 is rank-2 in both lists: 2/62e6 ≈ 32258 > 1/61e6 ≈ 16393
    val lex = Seq((1L, 10L, 1), (1L, 100L, 2)).toDF("q_id", "doc_id", "rank")
    val sem = Seq((1L, 20L, 1), (1L, 100L, 2)).toDF("q_id", "doc_id", "rank")
    val got = Retrieval.rrf(Seq(lex, sem), k = 3).orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.head._1 === 100L)
    assert(got.head._2 === 2 * Math.round(1000000.0 / 62))
    assert(got.map(_._1).toSeq === Seq(100L, 10L, 20L),
      "equal singles tie-break by doc_id")
  }

  test("fusion is deterministic and k-bounded") {
    val lex = Seq.tabulate(10)(i => (1L, i.toLong, i + 1))
      .toDF("q_id", "doc_id", "rank")
    val a = Retrieval.rrf(Seq(lex), k = 4).collect().map(_.toSeq)
    val b = Retrieval.rrf(Seq(lex), k = 4).collect().map(_.toSeq)
    assert(a.length === 4)
    assert(a.sortBy(_.toString).toSeq === b.sortBy(_.toString).toSeq)
  }

  test("indexed hybrid fusion: both legs probe standing bucketed layouts " +
    "with zero corpus-side Exchange") {
    // the q_rrf_fusion_index shape: BM25 postings bucketed by term, LSH
    // postings bucketed by (tbl, bkt) — the fused plan must read BOTH
    // corpus sides as bucketed scans even with broadcast disabled on the
    // probe (query-side joins are the only exchanges left)
    val docs = TestSpark.table("documents").limit(300)
    val emb = TestSpark.table("embeddings").limit(300)
    val qd = docs.limit(4).select(col("doc_id").as("q_id"),
      substring(coalesce(col("text"), lit("")), 1, 40).as("q_text"))
    val lexDir = java.nio.file.Files
      .createTempDirectory("graft_rrf_spec_lex").toString
    graft.operators.TextSearch.buildIndex(docs, "text", "doc_id",
      "graft_rrf_spec_lex", lexDir, numBuckets = 4)
    val annDir = java.nio.file.Files
      .createTempDirectory("graft_rrf_spec_ann").toString
    graft.operators.AnnIndex.write(emb, "embedding", "vec_id",
      "graft_rrf_spec_ann", annDir, planesPerTable = 4, nTables = 8,
      numBuckets = 4)
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val lex = graft.operators.TextSearch.probe(spark,
          "graft_rrf_spec_lex", qd, "q_text", "q_id", k = 5)
        .select(col("q_id"), col("doc_id"), col("rank"))
      val sem = graft.operators.AnnIndex.probe(
          emb.join(qd.select(col("q_id")), emb("vec_id") === col("q_id"),
            "left_semi"),
          "embedding", "vec_id", "graft_rrf_spec_ann", k = 5)
        .select(col("query_id").as("q_id"), col("corpus_id").as("doc_id"),
          col("rank"))
      val fused = Retrieval.rrf(Seq(lex, sem), k = 5)
      assert(fused.collect().nonEmpty)
      // >= 2: the BM25 postings scan and the LSH postings scan both come
      // back bucketed (the lens scan makes it 3 when planned bucketed)
      assert(graft.sources.Bucketize.bucketedScans(fused) >= 2,
        fused.queryExecution.executedPlan.toString)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("evalRanking: perfect hit, graded rank, and judged miss") {
    val results = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L),   // q1: rel doc at rank 1
      (2L, 20L, 1L), (2L, 21L, 2L),   // q2: rel doc at rank 2
      (3L, 30L, 1L)                    // q3: rel doc absent
    ).toDF("q_id", "doc_id", "rank")
    val truth = Seq((1L, 10L), (2L, 21L), (3L, 99L)).toDF("q_id", "doc_id")
    val m = Retrieval.evalRanking(results, truth, k = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(m(1L) === ((1L, 1000000L, 1000000L, 1000000L)),
      "rank-1 hit: recall, mrr, dcg all 1.0")
    // rank 2: rr = 1/2; dcg term = 1e6 / log2(3)
    val dcg2 = Math.round(1000000.0 / (math.log(3.0) / math.log(2.0)))
    assert(m(2L) === ((1L, 1000000L, 500000L, dcg2)))
    assert(m(3L) === ((0L, 0L, 0L, 0L)),
      "judged query with no hit appears with zero metrics")
  }

  test("evalRanking: standard recall@k denominator and duplicate immunity") {
    // 3 relevant docs, k=2, both slots relevant: recall@2 = 2/3 (trec
    // semantics — NOT capped to 1.0 by min(n_rel, k))
    val results = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("q_id", "doc_id", "rank")
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L)).toDF("q_id", "doc_id")
    val r = Retrieval.evalRanking(results, truth, k = 2).head()
    assert(r.getLong(3) === Math.round(2000000.0 / 3.0))
    // a duplicated (q, doc) entry (concatenated result lists) counts once,
    // at its best rank
    val dup = Seq((1L, 10L, 1L), (1L, 10L, 2L)).toDF("q_id", "doc_id", "rank")
    val t1 = Seq((1L, 10L)).toDF("q_id", "doc_id")
    val d = Retrieval.evalRanking(dup, t1, k = 5).head()
    assert(d.getLong(2) === 1L, "duplicate rows must not double-count hits")
    assert(d.getLong(3) === 1000000L && d.getLong(4) === 1000000L &&
      d.getLong(5) === 1000000L)
  }

  test("refuses empty input and non-positive constants") {
    intercept[IllegalArgumentException] { Retrieval.rrf(Seq.empty, k = 5) }
    val lex = Seq((1L, 10L, 1)).toDF("q_id", "doc_id", "rank")
    intercept[IllegalArgumentException] { Retrieval.rrf(Seq(lex), k = 0) }
  }
}
