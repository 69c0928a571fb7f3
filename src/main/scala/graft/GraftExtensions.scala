package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{Decimal, DoubleType}

import graft.functions.VecExprs

/** SQL registration for graft's custom Catalyst expression library.
  *
  * Two entry points, one function table:
  *
  *  - cluster-wide, before session construction (the idiomatic Spark
  *    deployment path — every session the driver builds gets the
  *    functions, including `spark.sql(...)`-only users):
  *    {{{ --conf spark.sql.extensions=graft.GraftExtensions }}}
  *    or `SparkSession.builder().withExtensions(new GraftExtensions) `
  *  - an already-running session (notebooks, tests):
  *    {{{ graft.GraftFunctions.register(spark) }}}
  *
  * Registered functions mirror the Scala façade in
  * [[graft.functions.VecExprs]] one-to-one; geometry/tuning arguments
  * (shingle width, signature length, bucket counts, thresholds) must be
  * foldable literals — they parameterize codegen, there is no row-varying
  * form of them. `NearestCells` is deliberately NOT exposed: its centroid
  * matrix is trained model state produced by
  * `SimilaritySearch.kmeansCentroids`, not something a SQL caller can
  * inline (use the Scala API or the persisted `AnnIndex.probeKmeans`
  * layout, which re-reads centroids from the index).
  *
  * Reference anchor: the reference library ships its hashing/vectorizing
  * primitives only as Python callables (skrub/_minhash_encoder.py:93,
  * skrub/_string_distances.py:9-61); a Spark-native library's equivalent
  * obligation is the SQL function registry, which makes the same
  * primitives reachable from every language binding Spark has.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}

object GraftFunctions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  /** Register the function table into an existing session (idempotent —
    * re-registration replaces the previous binding).
    */
  def register(spark: SparkSession): Unit = all.foreach { case (id, info, b) =>
    spark.sessionState.functionRegistry.registerFunction(id, info, b)
  }

  private def arity(name: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$name expects $n arguments, got ${args.length}")

  /** Geometry arguments parameterize the generated code, so they must be
    * compile-time constants — same contract as Spark's own `approx_count_
    * distinct(col, rsd)`.
    */
  private def litInt(name: String, arg: String, e: Expression): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$name: <$arg> must be a literal integer")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$name: <$arg> must be a literal integer, got $other")
    }
  }

  private def litDouble(name: String, arg: String, e: Expression): Double = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$name: <$arg> must be a literal number")
    e.eval() match {
      case d: Double => d
      case f: Float => f.toDouble
      case d: Decimal => d.toDouble // SQL decimal literals like 0.5
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case other => throw new IllegalArgumentException(
        s"$name: <$arg> must be a literal number, got $other")
    }
  }

  private def litDoubleArray(name: String, arg: String,
                             e: Expression): Seq[Double] = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$name: <$arg> must be a literal array<double>")
    e.eval() match {
      // SQL numeric literals arrive as Decimal/Int elements, not Double —
      // convert per element rather than via toDoubleArray's unboxing
      case a: ArrayData => (0 until a.numElements()).map { i =>
        a.get(i, e.dataType.asInstanceOf[
          org.apache.spark.sql.types.ArrayType].elementType) match {
          case d: Double => d
          case f: Float => f.toDouble
          case d: Decimal => d.toDouble
          case i2: Int => i2.toDouble
          case l: Long => l.toDouble
          case other => throw new IllegalArgumentException(
            s"$name: <$arg> elements must be numeric literals, got $other")
        }
      }
      case other => throw new IllegalArgumentException(
        s"$name: <$arg> must be a literal array<double>, got $other")
    }
  }

  private def fn(name: String, usage: String)(
      builder: Seq[Expression] => Expression): FunctionDescription = {
    // ExpressionInfo's long constructor validates `group`/`since`/`source`
    // against Spark-internal vocabularies that shift between releases; the
    // (class, db, name, usage, arguments) form carries the usage line —
    // surfaced by DESCRIBE FUNCTION — without coupling to them.
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name,
        usage, ""),
      builder)
  }

  /** The full function table (names are `graft_`-prefixed to keep the
    * global namespace honest).
    */
  val all: Seq[FunctionDescription] = Seq(
    // ---- aggregate / window functions (the analyzer wraps raw
    // AggregateFunctions in AggregateExpression automatically) ----------
    fn("graft_ewma",
      "graft_ewma(v, alpha) - exponentially weighted moving average; use " +
        "ONLY as a window function over (partition by keys order by a " +
        "total order rows unbounded preceding) — see TimeFeatures.ewma") {
      args =>
        arity("graft_ewma", args, 2)
        graft.functions.Ewma.EwmaAgg(args(0),
          litDouble("graft_ewma", "alpha", args(1)))
    },
    fn("graft_distinct_at_most",
      "graft_distinct_at_most(v, cap) - exact distinct count saturating " +
        "at cap (cap+1 means more-than-cap); bounded state, one branch " +
        "per row once saturated") { args =>
      arity("graft_distinct_at_most", args, 2)
      graft.functions.Contingency.DistinctAtMost(args(0),
        litInt("graft_distinct_at_most", "cap", args(1)))
    },
    fn("graft_min_k_by",
      "graft_min_k_by(v, k) - the k smallest values per group, ascending " +
        "(bounded k-element partial state)") { args =>
      arity("graft_min_k_by", args, 2)
      graft.functions.AggExprs.MinKBy(args(0),
        litInt("graft_min_k_by", "k", args(1)))
    },
    fn("graft_mode",
      "graft_mode(v) - statistical mode, smallest value on ties, nulls " +
        "ignored (single-aggregate count-map)") { args =>
      arity("graft_mode", args, 1)
      graft.functions.AggExprs.ModeAgg(args(0))
    },
    fn("graft_array_dot",
      "graft_array_dot(a, b) - dot product of two array<double>") { args =>
      arity("graft_array_dot", args, 2)
      VecExprs.ArrayDotProduct(args(0), args(1))
    },
    fn("graft_array_dist2",
      "graft_array_dist2(a, b) - squared L2 distance of two array<double>") {
      args =>
        arity("graft_array_dist2", args, 2)
        VecExprs.ArrayDist2(args(0), args(1))
    },
    fn("graft_array_dot_bytes",
      "graft_array_dot_bytes(codes, q) - asymmetric dot of SQ8 int8 codes " +
        "against a full-precision array<double> query") { args =>
      arity("graft_array_dot_bytes", args, 2)
      VecExprs.ArrayDotBytes(args(0), args(1))
    },
    fn("graft_token_shingles",
      "graft_token_shingles(text, n) - distinct n-token shingles of " +
        "normalized text") { args =>
      arity("graft_token_shingles", args, 2)
      VecExprs.TokenShingles(args(0),
        litInt("graft_token_shingles", "n", args(1)))
    },
    fn("graft_token_chunks",
      "graft_token_chunks(text, size, stride) - fixed-size token windows " +
        "with overlap as (chunk_id, chunk_text, n_chunk_tokens) structs") { args =>
      arity("graft_token_chunks", args, 3)
      VecExprs.TokenChunks(args(0),
        litInt("graft_token_chunks", "size", args(1)),
        litInt("graft_token_chunks", "stride", args(2)))
    },
    fn("graft_token_window_hashes",
      "graft_token_window_hashes(text, n) - md5 of every n-token window " +
        "in position order") { args =>
      arity("graft_token_window_hashes", args, 2)
      VecExprs.TokenWindowHashes(args(0),
        litInt("graft_token_window_hashes", "n", args(1)))
    },
    fn("graft_token_pairs",
      "graft_token_pairs(text) - (w, prev) adjacent-token pairs of " +
        "normalized text; prev is null for the first token") { args =>
      arity("graft_token_pairs", args, 1)
      VecExprs.TokenPairs(args(0))
    },
    fn("graft_minhash_sig",
      "graft_minhash_sig(shingles, k) - k md5-derived minhashes of an " +
        "array<string> shingle set") { args =>
      arity("graft_minhash_sig", args, 2)
      VecExprs.MinhashSig(args(0), litInt("graft_minhash_sig", "k", args(1)))
    },
    fn("graft_simhash32",
      "graft_simhash32(text) - 32-bit simhash fingerprint of text") { args =>
      arity("graft_simhash32", args, 1)
      VecExprs.Simhash32(args(0))
    },
    fn("graft_simhash64",
      "graft_simhash64(text) - 64-bit simhash fingerprint of text") { args =>
      arity("graft_simhash64", args, 1)
      VecExprs.Simhash64(args(0))
    },
    fn("graft_posting_pairs",
      "graft_posting_pairs(docs, min_jaccard) - ordered (a, b) candidate " +
        "pairs from a sorted posting list, size-ratio prefiltered") { args =>
      arity("graft_posting_pairs", args, 2)
      VecExprs.PostingPairs(args(0),
        litDouble("graft_posting_pairs", "min_jaccard", args(1)))
    },
    fn("graft_ngram_tf",
      "graft_ngram_tf(text, n_buckets) - hashed char-3-gram term-frequency " +
        "vector") { args =>
      arity("graft_ngram_tf", args, 2)
      VecExprs.NgramTf(args(0), litInt("graft_ngram_tf", "n_buckets", args(1)))
    },
    fn("graft_ngram_tfidf",
      "graft_ngram_tfidf(text, weights) - hashed char-3-gram tf-idf vector " +
        "under a literal idf weight array") { args =>
      arity("graft_ngram_tfidf", args, 2)
      VecExprs.NgramTfIdf(args(0),
        litDoubleArray("graft_ngram_tfidf", "weights", args(1)))
    },
    fn("graft_hyperplane_buckets",
      "graft_hyperplane_buckets(vec, n_tables, planes_per_table) - " +
        "md5-derived random-hyperplane LSH bucket per table") { args =>
      arity("graft_hyperplane_buckets", args, 3)
      VecExprs.HyperplaneBuckets(args(0),
        litInt("graft_hyperplane_buckets", "n_tables", args(1)),
        litInt("graft_hyperplane_buckets", "planes_per_table", args(2)))
    },
    fn("graft_ngram_rep_stats",
      "graft_ngram_rep_stats(text, n) - struct(total, distinct, top) " +
        "occurrence counts of the normalized word n-grams") { args =>
      arity("graft_ngram_rep_stats", args, 2)
      VecExprs.NgramRepStats(args(0),
        litInt("graft_ngram_rep_stats", "n", args(1)))
    },
    fn("graft_gram_buckets",
      "graft_gram_buckets(text, n_buckets) - md5-hashed word-bigram " +
        "buckets (DSIR gram hasher; whole-text fallback under 2 tokens)") { args =>
      arity("graft_gram_buckets", args, 2)
      VecExprs.GramBuckets(args(0),
        litInt("graft_gram_buckets", "n_buckets", args(1)))
    },
  )
}
