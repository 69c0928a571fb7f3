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

  test("refuses empty input and non-positive constants") {
    intercept[IllegalArgumentException] { Retrieval.rrf(Seq.empty, k = 5) }
    val lex = Seq((1L, 10L, 1)).toDF("q_id", "doc_id", "rank")
    intercept[IllegalArgumentException] { Retrieval.rrf(Seq(lex), k = 0) }
  }
}
