package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Byte-pair-encoding tokenizer training at corpus scale (Sennrich et al.
  * 2016 — the subword algorithm behind GPT/Llama-family vocabularies; the
  * reference library has no tokenizer surface, but a training-data engine
  * that packs token-budgeted sequences needs the tokenizer those budgets
  * are denominated in).
  *
  * Fit follows the classic word-count factorization: merge statistics only
  * depend on the DISTINCT-WORD count table, so the corpus is touched ONCE
  * (tokenize -> word counts, the same distributed aggregation as
  * NgramLm's vocab fit), capped to the `maxWords` most frequent words
  * (count desc, word asc — a TakeOrderedAndProject), and the merge
  * iterations run driver-side on that bounded table (the same
  * fit-on-bounded-distinct-values discipline as GapEncoder/deduplicate:
  * O(maxWords * wordLen) per iteration, microseconds against any corpus
  * size). Each iteration counts adjacent symbol pairs weighted by word
  * count (overlapping occurrences counted, per the reference algorithm),
  * picks the argmax with the (count desc, left asc, right asc) tie-break,
  * and merges greedily left-to-right.
  *
  * Encoding is a pure scan: the ordered merge list rides into the
  * loop-codegen `BpeEncode` expression as one reference object — zero
  * shuffles, linear at any corpus size. Per word it applies the k merges
  * rank-by-rank (O(k * len)); a production trainer with 30k+ merges would
  * use the pair-indexed incremental encoder, but the SHAPE — bounded
  * broadcast model, embarrassingly parallel scan — is identical.
  *
  * Determinism contract: integer pair counts, total-ordered tie-breaks,
  * and a greedy merge whose fold form is reproduced verbatim in the
  * DuckDB oracle (`q_bpe_merges` unrolls the fit iterations; the same
  * trick as the k-means unrolled-Lloyd oracle).
  */
object Bpe {

  /** Ordered merge rules: (left, right, weighted pair count at selection)
    * + the initial single-character alphabet of the capped word table
    * (sorted) — together they define the VOCABULARY: alphabet symbols
    * first, then one (possibly duplicate-collapsed) symbol per merge, in
    * rank order. That is the classic BPE id space a training run needs
    * (`vocab`/`tokenizeIds`).
    */
  final case class Model(merges: Seq[(String, String, Long)],
                         alphabet: Seq[String] = Nil) {
    /** Vocabulary in id order: alphabet, then merge outputs, first
      * occurrence wins (two merges CAN produce the same string —
      * (a,bc)→abc and (ab,c)→abc — so the id space dedupes).
      */
    def vocab: Seq[String] =
      (alphabet ++ merges.map(m => m._1 + m._2)).distinct
  }

  def fit(corpus: DataFrame, textCol: String, numMerges: Int,
          maxWords: Int = 50000): Model = {
    val words = corpus
      .select(explode(Text.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val alphabet = words.flatMap(_._1.toCharArray.map(_.toString))
      .distinct.sorted.toSeq
    var syms: Array[(Array[String], Long)] =
      words.map { case (w, c) => (w.toCharArray.map(_.toString), c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var k = 0
    while (k < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      syms.foreach { case (ss, c) =>
        var i = 0
        while (i + 1 < ss.length) {
          val key = (ss(i), ss(i + 1))
          counts(key) = counts.getOrElse(key, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) k = numMerges
      else {
        // argmax with the oracle's total order: count desc, left, right
        val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((l, r, c))
        syms = syms.map { case (ss, cn) =>
          (graft.functions.BpeMerge.applyMerge(ss, l, r), cn)
        }
        k += 1
      }
    }
    Model(merges.toSeq, alphabet)
  }

  /** (idCols..., bpe_tokens array<string>) — one codegen'd scan. */
  /** Persist a trained tokenizer (ordered merge list + selection counts)
    * as a small JSON file — the NgramLm.write discipline for model state a
    * training run must reuse across sessions: byte-stable, engine-free,
    * and `load` round-trips bit-identically (spec-pinned), so packs
    * tokenized tomorrow match packs tokenized today.
    */
  def save(model: Model, path: String): Unit = {
    import graft.plans.Json
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(p, Json.obj(Seq(
      "type" -> Json.str("graft.Bpe.Model"),
      "merges" -> Json.arr(model.merges.map { case (a, b, n) =>
        Json.arr(Seq(Json.str(a), Json.str(b), Json.num(n)))
      }),
      "alphabet" -> Json.arr(model.alphabet.map(Json.str)))))
  }

  def load(path: String): Model = {
    import graft.plans.Json
    val o = Json.parse(java.nio.file.Files.readString(
      java.nio.file.Paths.get(path))).asInstanceOf[Map[String, Any]]
    require(o.get("type").contains("graft.Bpe.Model"), "not a Bpe.Model file")
    Model(o("merges").asInstanceOf[Seq[Any]].map { m =>
      val f = m.asInstanceOf[Seq[Any]]
      (f(0).asInstanceOf[String], f(1).asInstanceOf[String],
        f(2).asInstanceOf[Any] match {
          case l: Long => l
          case d: Double => d.toLong
          case other => other.toString.toDouble.toLong
        })
    },
      // absent in pre-r9 files: those models tokenize but cannot id-encode
      o.get("alphabet").map(_.asInstanceOf[Seq[Any]]
        .map(_.asInstanceOf[String])).getOrElse(Nil))
  }

  def tokenize(df: DataFrame, textCol: String, idCols: Seq[String],
               model: Model): DataFrame =
    df.select(idCols.map(col) :+
      graft.functions.VecExprs.bpeEncode(col(textCol),
        model.merges.map(m => (m._1, m._2))).as("bpe_tokens"): _*)

  /** (idCols..., bpe_tokens, token_ids array<int>) — the model-ready id
    * form: subwords mapped into the fitted vocabulary by a reference-
    * object hash lookup (`TokenIds` — O(1) per token, codegen'd), -1 for
    * symbols outside the fitted alphabet. Same pure-scan shape as
    * `tokenize`.
    */
  def tokenizeIds(df: DataFrame, textCol: String, idCols: Seq[String],
                  model: Model): DataFrame = {
    require(model.alphabet.nonEmpty,
      "model has no alphabet (fitted before id support, or hand-built) — " +
        "refit or construct Model with an alphabet to id-encode")
    tokenize(df, textCol, idCols, model)
      .withColumn("token_ids",
        graft.functions.VecExprs.tokenIds(col("bpe_tokens"), model.vocab))
  }
}
