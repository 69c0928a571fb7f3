package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, SimilaritySearch}

/** Dedup family: connected components, the canonical translation map, and —
  * critically — RECALL FLOORS for the approximate (LSH) paths. A recall
  * harness that only measures lets a silent quality regression stay green;
  * these assertions gate it (VERDICT r2 "measures but never gates").
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("connectedComponents labels components with their smallest id") {
    val vertices = Seq("1", "2", "3", "4", "5", "6").toDF("id")
    val pairs = Seq(("1", "2"), ("2", "3"), ("5", "6")).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(vertices, pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(labels === Map("1" -> "1", "2" -> "1", "3" -> "1",
      "4" -> "4", "5" -> "5", "6" -> "5"))
  }

  test("connectedComponents converges on a long chain") {
    val vertices = (1 to 10).map(_.toString).toDF("id")
    val pairs = (1 until 10).map(i => (f"$i%02d", f"${i + 1}%02d"))
      .toDF("id_a", "id_b")
    val v2 = (1 to 10).map(i => f"$i%02d").toDF("id")
    val labels = Dedup.connectedComponents(v2, pairs).collect()
      .map(r => r.getString(1)).distinct
    assert(labels === Array("01"))
  }

  test("star band pairs: verified subset of all-pairs; components refine") {
    val docs = TestSpark.table("documents")
    def pairs(mode: String) = Dedup.minhashLshPairs(docs, "text", "doc_id",
      n = 3, rowsPerBand = 2, nBands = 8, minJaccard = 0.2, bandPairs = mode)
    val all = pairs("all")
    val star = pairs("star")
    val allSet = all.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val starSet = star.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(starSet.nonEmpty, "fixture must produce star pairs")
    assert(starSet.subsetOf(allSet),
      s"star emitted a pair all-pairs missed: ${starSet -- allSet}")
    // refinement: every star component sits inside ONE all-pairs component
    def labels(p: org.apache.spark.sql.DataFrame) = {
      val verts = docs.select(col("doc_id").as("id"))
      Dedup.connectedComponents(verts, p).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val la = labels(all)
    val ls = labels(star)
    ls.groupBy(_._2).values.foreach { comp =>
      val allLabels = comp.keys.map(la).toSet
      assert(allLabels.size === 1,
        s"star component ${comp.keys.toSeq.sorted} straddles all-pairs " +
          s"components $allLabels")
    }
    // embedding twin: same subset law over the hyperplane buckets
    val emb = TestSpark.table("embeddings")
    def epairs(mode: String) = Dedup.embeddingLshPairs(emb, "embedding",
      "vec_id", minCosine = 0.4, planesPerTable = 4, nTables = 16,
      bucketPairs = mode)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val eAll = epairs("all")
    val eStar = epairs("star")
    assert(eStar.nonEmpty && eStar.subsetOf(eAll),
      s"embedding star law violated: extra=${eStar -- eAll}")
  }

  test("exactKeepBest keeps the max-score copy per content group") {
    val df = Seq(
      ("a", "Hello World", 1L), ("b", "hello, world!", 9L), // same fingerprint
      ("c", "hello world", 9L),                             // tie -> min id "b"
      ("d", "other", 2L)
    ).toDF("id", "text", "score")
    val r = Dedup.exactKeepBest(df, "text", "id", "score").collect()
      .map(x => x.getAs[String]("id") -> x.getAs[Long]("n_dups")).toMap
    assert(r === Map("b" -> 3L, "d" -> 1L))
  }

  test("keepBest keeps the max-score member per cluster, ties -> smallest id") {
    val df = Seq(("1", 5L), ("2", 9L), ("3", 9L), ("4", 1L), ("5", 2L))
      .toDF("id", "score")
    val pairs = Seq(("1", "2"), ("2", "3")).toDF("id_a", "id_b")
    val r = Dedup.keepBest(df, pairs, "id", "score").collect()
      .map(x => x.getString(0) -> ((x.getLong(2), x.getBoolean(3)))).toMap
    // cluster {1,2,3}: max score 9 tied between 2 and 3 -> 2 kept
    assert(r("1") === ((3L, false)))
    assert(r("2") === ((3L, true)))
    assert(r("3") === ((3L, false)))
    // docs outside the pair graph are singleton keeps
    assert(r("4") === ((1L, true)))
    assert(r("5") === ((1L, true)))
  }

  test("deduplicate maps variants to the most frequent member") {
    val docs = (Seq.fill(3)("the quick brown fox jumps high") ++
      Seq("the quick brown fox jumps higher") ++
      Seq.fill(2)("completely different text entirely"))
      .toDF("text")
    val out = Dedup.deduplicate(docs, "text", minJaccard = 0.3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("the quick brown fox jumps higher") ===
      "the quick brown fox jumps high")
    assert(out("the quick brown fox jumps high") ===
      "the quick brown fox jumps high")
    assert(out("completely different text entirely") ===
      "completely different text entirely")
  }

  test("deduplicate: driver union-find path and distributed CC fallback agree") {
    val docs = TestSpark.table("documents").limit(300)
    val fast = Dedup.deduplicate(docs, "text", minJaccard = 0.3)
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    // maxDriverPairs = -1 forces every pair count over the guard -> the
    // distributed min-label-propagation loop runs instead
    val dist = Dedup.deduplicate(docs, "text", minJaccard = 0.3,
        maxDriverPairs = -1)
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(fast.nonEmpty)
    assert(fast === dist)
  }

  test("auto routing gates on char volume OR distinct count") {
    // the bench corpus shape: ~5k document-length values (~1.5M chars)
    // must route to minhash even though the count is far below the
    // distinct-count backstop; short-key vocabularies stay exact
    assert(Dedup.autoRoutesToMinhash(5000L, 1500000L))
    assert(Dedup.autoRoutesToMinhash(100000L, 400000L))
    assert(!Dedup.autoRoutesToMinhash(500L, 150000L)) // sf0.01 oracle corpus
    assert(!Dedup.autoRoutesToMinhash(20000L, 400000L)) // dirty categories
  }

  test("deduplicate minhash candidate generator agrees on the fixture") {
    val docs = TestSpark.table("documents").limit(300)
    val jac = Dedup.deduplicate(docs, "text", minJaccard = 0.3)
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    val mh = Dedup.deduplicate(docs, "text", minJaccard = 0.3,
        candidates = "minhash")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    // band recall is 1.0 on this fixture (high-jaccard variants collide),
    // so the two generators yield the same translation map
    assert(jac.toSeq === mh.toSeq)
  }

  test("embeddingLshPairs leaves no persisted blocks behind") {
    val sc = spark.sparkContext
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val before = sc.getPersistentRDDs.keySet
    val emb = TestSpark.table("embeddings").limit(300)
    Dedup.embeddingLshPairs(emb, "embedding", "vec_id", minCosine = 0.4).count()
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"embeddingLshPairs leaked persisted RDDs: $leaked")
  }

  test("scale-aware knobs: corpus-relative DF cutoff and log2 plane count") {
    val docs = TestSpark.table("documents")
    val n = docs.count()
    // relative cutoff floors at minDf on small corpora, scales past it
    assert(Dedup.shingleDfCutoff(docs, fraction = 0.005, minDf = 1000L) === 1000L)
    assert(Dedup.shingleDfCutoff(docs, fraction = 0.5, minDf = 10L) === n / 2)
    // bucket occupancy target: n / 2^planes <= targetBucketSize
    for (sz <- Seq(100L, 2000L, 20000L, 1000000L)) {
      val p = Dedup.planesFor(sz, targetBucketSize = 250)
      assert(sz.toDouble / math.pow(2, p) <= 250.0, s"n=$sz planes=$p")
      assert(p >= 1)
    }
  }

  test("exact dedup partitions the corpus: n_dups sums to row count") {
    val docs = TestSpark.table("documents")
    val out = Dedup.exact(docs, "text", "doc_id")
    assert(out.agg(sum($"n_dups")).head().getLong(0) === docs.count())
  }

  test("RECALL FLOOR: ANN IVF mean recall@5 >= 0.8 on the fixture") {
    val emb = TestSpark.table("embeddings")
    val qs = emb.filter($"vec_id" < 10)
    val exact = SimilaritySearch.bruteForceTopK(emb, qs, "embedding", "vec_id", 5)
    val approx = SimilaritySearch.ivfTopK(emb, qs, "embedding", "vec_id", 5)
    val recall = exact.alias("e").join(approx.alias("a"),
        $"e.query_id" === $"a.query_id" && $"e.corpus_id" === $"a.corpus_id",
        "left")
      .agg((count($"a.corpus_id").cast("double") / count(lit(1))))
      .head().getDouble(0)
    assert(recall >= 0.8, s"ANN recall@5 degraded to $recall")
  }

  test("RECALL FLOOR: embedding LSH pair recall >= 0.85 on the fixture") {
    val emb = TestSpark.table("embeddings")
    val exact = Dedup.embeddingCosinePairs(emb, "embedding", "vec_id", 0.4)
    val lsh = Dedup.embeddingLshPairs(emb, "embedding", "vec_id", 0.4)
    val recall = exact.alias("e").join(lsh.alias("l"),
        $"e.id_a" === $"l.id_a" && $"e.id_b" === $"l.id_b", "left")
      .agg((count($"l.id_a").cast("double") / count(lit(1))))
      .head().getDouble(0)
    assert(recall >= 0.85, s"LSH pair recall degraded to $recall")
  }

  test("simhashPairs == brute-force 64-bit hamming filter (pigeonhole completeness)") {
    // 4 16-bit blocks guarantee any pair within hamming 3 agrees on >= 1
    // block, so the blocked join must find EXACTLY the brute-force pair set
    val docs = TestSpark.table("documents").limit(300)
    val fp = Dedup.simhashFingerprints(docs, "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, sa) <- fp; (ib, sb) <- fp
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    val blocked = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3)
      .select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked === brute)
    assert(brute.nonEmpty, "fixture has no near-dup fingerprints in the slice")
  }

  test("RECALL FLOOR: trained k-means IVF mean recall@5 >= 0.75 on the fixture") {
    val emb = TestSpark.table("embeddings")
    val qs = emb.filter($"vec_id" < 10)
    val exact = SimilaritySearch.bruteForceTopK(emb, qs, "embedding", "vec_id", 5)
    val approx = SimilaritySearch.kmeansIvfTopK(emb, qs, "embedding", "vec_id",
      5, kClusters = 16, nProbe = 8, iters = 2)
    val recall = exact.alias("e").join(approx.alias("a"),
        $"e.query_id" === $"a.query_id" && $"e.corpus_id" === $"a.corpus_id",
        "left")
      .agg((count($"a.corpus_id").cast("double") / count(lit(1))))
      .head().getDouble(0)
    assert(recall >= 0.75, s"k-means IVF recall@5 degraded to $recall")
  }

  test("kmeansIvfTopK: shuffle-join path and auto cell count match the pinned geometry path") {
    val emb = TestSpark.table("embeddings")
    val qs = emb.filter($"vec_id" < 10)
    val pinned = SimilaritySearch.kmeansIvfTopK(emb, qs, "embedding", "vec_id",
      5, kClusters = 16, nProbe = 8, iters = 2)
    // shuffle path (maxBroadcastQueries=0) must be bit-identical
    val viaShuffle = SimilaritySearch.kmeansIvfTopK(emb, qs, "embedding",
      "vec_id", 5, kClusters = 16, nProbe = 8, iters = 2,
      maxBroadcastQueries = 0L)
    assert(pinned.count() > 0)
    assert(pinned.except(viaShuffle).count() === 0)
    assert(viaShuffle.except(pinned).count() === 0)
    // auto sizing: kClusters <= 0 picks ~sqrt(corpus), bounded below at 16,
    // and still returns k rows per query
    val auto = SimilaritySearch.kmeansIvfTopK(emb, qs, "embedding", "vec_id",
      5, nProbe = 8, iters = 1)
    assert(auto.groupBy($"query_id").count().agg(max($"count"))
      .head().getLong(0) <= 5)
    assert(auto.count() > 0)
  }

  test("NearestCells loop expression == compositional argmin form") {
    val emb = TestSpark.table("embeddings").limit(300)
    val c = emb.select($"vec_id".as("corpus_id"),
      graft.operators.Dedup.normalized($"embedding").as("cv"))
    val cents = SimilaritySearch.kmeansCentroids(c, 12, 1)
    for (nProbe <- Seq(1, 4, 12)) {
      val loop = c.select($"corpus_id",
          SimilaritySearch.nearestCids(cents, $"cv", nProbe).as("cells"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      val composed = c.select($"corpus_id",
          SimilaritySearch.nearestCidsComposed(cents, $"cv", nProbe).as("cells"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(loop === composed, s"nProbe=$nProbe")
    }
  }

  test("kmeansCentroids drops emptied clusters and is deterministic") {
    val emb = TestSpark.table("embeddings").limit(200)
    val c = emb.select($"vec_id".as("corpus_id"),
      graft.operators.Dedup.normalized($"embedding").as("cv"))
    val a = SimilaritySearch.kmeansCentroids(c, 8, 2)
    val b = SimilaritySearch.kmeansCentroids(c, 8, 2)
    assert(a === b)
    assert(a.nonEmpty && a.size <= 8)
    // every centroid coordinate is round-6 stabilized
    assert(a.forall(_._2.forall(x =>
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble == x)))
  }

  test("ivfTopK: shuffle-join path (large query side) matches the broadcast path") {
    // above maxBroadcastQueries the candidate join must not broadcast the
    // query side (a corpus-sized query batch blows the broadcast limit);
    // forcing the threshold to 0 routes through the shuffle equi-join on
    // (tbl, bkt) — identical results, different physical plan
    val emb = TestSpark.table("embeddings")
    val qs = emb.filter($"vec_id" < 10)
    val viaBroadcast = SimilaritySearch.ivfTopK(emb, qs, "embedding", "vec_id", 5)
    val viaShuffle = SimilaritySearch.ivfTopK(emb, qs, "embedding", "vec_id", 5,
      maxBroadcastQueries = 0L)
    assert(viaBroadcast.count() > 0)
    assert(viaBroadcast.except(viaShuffle).count() === 0)
    assert(viaShuffle.except(viaBroadcast).count() === 0)
  }

  test("minhash LSH recovers high-jaccard pairs found by the exact path") {
    val docs = TestSpark.table("documents")
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        minJaccard = 0.5, maxShingleDf = 1000000L)
      .select($"id_a", $"id_b")
    val lsh = Dedup.minhashLshPairs(docs, "text", "doc_id", minJaccard = 0.5)
      .select($"id_a", $"id_b")
    val missed = exact.except(lsh).count()
    val total = exact.count()
    assert(total > 0, "fixture has no high-jaccard pairs")
    assert(missed.toDouble / total <= 0.2,
      s"minhash LSH missed $missed of $total exact pairs")
  }
}
