package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Text

/** Fuzzy / similarity join — the reference's flagship capability
  * (skrub/_joiner.py:80-406, skrub/_fuzzy_join.py:13-233, matching kernels
  * skrub/_matching.py:9-209).
  *
  * Semantics matched:
  *  - key columns are vectorized per kind: strings -> hashed char 2-4-gram
  *    TF-IDF (reference: HashingVectorizer(char_wb, 2-4) + TfidfTransformer,
  *    _joiner.py:25-30); numerics -> standard-scaled; datetimes -> epoch
  *    seconds standard-scaled (_joiner.py:43-77);
  *  - each main row matches its 1-nearest aux row by euclidean distance;
  *  - distances are rescaled by a reference distance (default: 25th
  *    percentile of sampled aux pair distances, _matching.py:88-127) and a
  *    match is accepted iff rescaled <= maxDist;
  *  - rejected rows keep null aux payloads; match-info columns
  *    skrub_Joiner_{distance, rescaled_distance, match_accepted} are added
  *    (_joiner.py:251-253,401-405).
  *
  * Deliberate deviations (documented, deterministic, oracle-verifiable):
  *  - hash buckets and orderings derive from md5, so the DuckDB oracle
  *    reproduces vectors bit-for-bit;
  *  - idf = sqrt((1+N)/(1+df)) instead of ln((1+N)/(1+df))+1 — a monotone
  *    transform of the standard smooth idf using only IEEE-correctly-rounded
  *    ops (+ * / sqrt), so Spark and the oracle produce identical doubles
  *    (ln is not guaranteed identically rounded across engines);
  *  - the reference samples 500 random aux pairs for the rescale percentile;
  *    we take all pairs of a deterministic md5-ordered sample of up to
  *    `refSampleSize` aux rows (same distribution target, reproducible);
  *  - aux rows are deduplicated by key (Spark frames have no positional row
  *    identity; reference tie-breaks by aux row order, we tie-break by the
  *    smallest key tuple — deterministic under parallelism).
  *
  * Scale shape: all fit work (idf, scaler stats, ref distance) runs on the
  * aux table, which the reference itself requires to fit in memory
  * (_joiner.py:96-104); matching runs over DISTINCT main key tuples only
  * (the fit-on-distinct optimization) against a broadcast aux-vector table,
  * with `min_by` partial aggregation so the shuffle carries one row per
  * distinct key. The final joins are AQE-decided.
  *
  * Beyond the reference: `candidates = "lsh"` transcends the in-memory aux
  * limitation — hyperplane-LSH bucketed candidate generation (equi shuffle
  * join on (table, bucket)) with exact re-ranking within candidates, so an
  * aux table of any size joins without a broadcast (see the fuzzyJoin
  * scaladoc for the approximation contract; recall measured by
  * FuzzyCleanerSpec's floor test and the hash-verified q_fuzzy_join_lsh).
  */
object FuzzyJoin {

  /** One vectorized key column pair. */
  sealed trait KeyBlock { def mainCol: String; def auxCol: String }
  final case class StringBlock(mainCol: String, auxCol: String,
                               nBuckets: Int = 32) extends KeyBlock
  final case class NumericBlock(mainCol: String, auxCol: String) extends KeyBlock
  final case class DatetimeBlock(mainCol: String, auxCol: String) extends KeyBlock

  /** Padded char n-grams (n = 2..4) of the normalized string — the char_wb
    * analog: the value is lowercased, non-alphanumerics collapsed to single
    * spaces, then padded with one leading/trailing space before windowing.
    */
  def charNgrams234(c: Column): Column = {
    val padded = concat(lit(" "), Text.normalize(c), lit(" "))
    val len = length(padded)
    flatten(array((2 to 4).map { n =>
      when(len - (n - 1) <= 0, array().cast(ArrayType(StringType)))
        .otherwise(transform(sequence(lit(1), len - (n - 1)),
          i => padded.substr(i, lit(n))))
    }: _*))
  }

  /** md5 bucket of an n-gram: first 4 hex digits mod nBuckets. */
  def bucketOf(g: Column, nBuckets: Int): Column =
    conv(substring(md5(g), 1, 4), 16, 10).cast(IntegerType) % nBuckets

  /** Term-frequency array over `nBuckets` hash buckets. Single expression
    * tree: buckets are computed ONCE per n-gram, then folded into the count
    * array — a per-bucket `filter` would duplicate the md5 n-gram subtree
    * nBuckets times and blow up plan compilation at nBuckets=256.
    */
  def tfArray(c: Column, nBuckets: Int): Column = {
    val buckets = transform(charNgrams234(c), g => bucketOf(g, nBuckets))
    aggregate(buckets, array_repeat(lit(0.0), nBuckets),
      (acc, b) => transform(acc, (x, i) => when(i === b, x + 1.0).otherwise(x)))
  }

  /** L2-normalize a double array; all-zero vectors stay zero. */
  def l2Normalize(v: Column): Column = {
    val norm = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))
    when(norm === 0.0, v).otherwise(transform(v, x => x / norm))
  }

  /** Squared euclidean distance between two equal-length double arrays
    * (sequential left-assoc fold — same association order as the oracle's
    * list_sum over list_zip).
    */
  def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Infer key blocks from the aux schema. */
  def inferBlocks(aux: DataFrame, keys: Seq[(String, String)],
                  nBuckets: Int): Seq[KeyBlock] =
    keys.map { case (m, a) =>
      aux.schema(a).dataType match {
        case StringType                                  => StringBlock(m, a, nBuckets)
        case DateType | TimestampType | TimestampNTZType => DatetimeBlock(m, a)
        case _: NumericType                              => NumericBlock(m, a)
        case dt => throw new IllegalArgumentException(s"unsupported key dtype $dt")
      }
    }

  /** Fitted per-block vectorization state (idf weights / scaler stats). */
  final case class Fitted(blocks: Seq[KeyBlock],
                          idf: Map[String, Array[Double]],
                          scale: Map[String, (Double, Double)]) {

    /** Concatenated feature vector for a row, reading block columns via
      * `colFor` (main-side or aux-side names).
      */
    def vector(colFor: KeyBlock => Column): Column = {
      val parts = blocks.map {
        case b @ StringBlock(_, _, _) =>
          // loop-codegen fused tf-idf (VecExprs.NgramTfIdf) — bit-identical
          // to l2Normalize(zip_with(tfArray, idf)) (pinned in
          // FuzzyJoinSpec); the HOF form re-ran the normalize regex once
          // per n-gram position under interpreted eval (O(len^2) per value)
          graft.functions.VecExprs.ngramTfIdf(colFor(b),
            scala.collection.immutable.ArraySeq.unsafeWrapArray(idf(b.auxCol)))
        case b @ NumericBlock(_, _) =>
          val (mean, std) = scale(b.auxCol)
          array((colFor(b).cast(DoubleType) - mean) / std)
        case b @ DatetimeBlock(_, _) =>
          val (mean, std) = scale(b.auxCol)
          val secs = unix_micros(colFor(b).cast(TimestampType)).cast(DoubleType) / 1e6
          array((secs - mean) / std)
      }
      if (parts.length == 1) parts.head else concat(parts: _*)
    }
  }

  /** Fit idf / scaler stats on the (deduplicated) aux table — small driver
    * collects, mirroring the reference's in-memory aux fit. The row count
    * rides the numeric-stats aggregate (one job, not two), and the string
    * blocks' bucket-DF jobs overlap it on a driver thread (Jobs.overlap) —
    * the whole fit is ONE job wave instead of 3+ sequential barriers, which
    * was most of fuzzyJoin's constant cost on small inputs.
    */
  def fit(auxDedup: DataFrame, blocks: Seq[KeyBlock]): Fitted = {
    val numBlocks = blocks.collect {
      case b: NumericBlock  => (b: KeyBlock, col(b.auxCol).cast(DoubleType))
      case b: DatetimeBlock =>
        (b: KeyBlock, unix_micros(col(b.auxCol).cast(TimestampType)).cast(DoubleType) / 1e6)
    }
    val statExprs = count(lit(1)).as("__n") +: numBlocks.flatMap { case (b, c) =>
      Seq(avg(c).as(s"${b.auxCol}__mean"), stddev_samp(c).as(s"${b.auxCol}__std"))
    }
    val (dfMaps, statRow) = graft.ops.Jobs.overlap(
      auxDedup.sparkSession.sparkContext) {
      blocks.collect { case b @ StringBlock(_, _, nB) =>
        // df[bucket] = number of aux values with >=1 n-gram in the bucket
        (b.auxCol, nB, auxDedup
          // spread the CPU-bound n-gram hashing (counts are exact integers,
          // partitioning-independent)
          .repartition(graft.ops.Partitions.cpuSpread(auxDedup.select(col(b.auxCol))))
          .select(posexplode(graft.functions.VecExprs.ngramTf(col(b.auxCol), nB))
            .as(Seq("bucket", "tf")))
          .filter(col("tf") > 0.0)
          .groupBy("bucket").agg(count(lit(1)).as("df"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap)
      }
    } {
      auxDedup.agg(statExprs.head, statExprs.tail: _*).collect()(0)
    }
    val n = statRow.getAs[Long]("__n")
    val idf = dfMaps.map { case (c, nB, df) =>
      c -> Array.tabulate(nB) { i =>
        math.sqrt((1.0 + n) / (1.0 + df.getOrElse(i, 0L)))
      }
    }.toMap
    val scale = numBlocks.map { case (b, _) =>
      val m = statRow.getAs[Double](s"${b.auxCol}__mean")
      val s0 = statRow.getAs[Double](s"${b.auxCol}__std")
      val s = if (s0 == 0.0 || s0.isNaN) 1.0 else s0
      b.auxCol -> (m, s)
    }.toMap
    Fitted(blocks, idf, scale)
  }

  /** Reference distance: `percentile`-th quantile of all pair distances among
    * an md5-ordered sample of up to `sampleSize` aux vectors (deterministic
    * stand-in for the reference's 500 random pairs, _matching.py:88-127).
    */
  def referenceDistance(auxVec: DataFrame, keyCols: Seq[String],
                        percentile: Double, sampleSize: Int): Double = {
    val sample = auxVec
      .orderBy(md5(concat_ws("\u0000", keyCols.map(col): _*)))
      .limit(sampleSize)
      .select(col("__vec"), concat_ws("\u0000", keyCols.map(col): _*).as("__k"))
    val pairs = sample.alias("x").join(sample.alias("y"), col("x.__k") < col("y.__k"))
      .select(sqrt(graft.functions.VecExprs.arrayDist2(col("x.__vec"), col("y.__vec"))).as("d"))
    pairs.agg(expr(s"percentile(d, $percentile)")).head().getDouble(0)
  }

  val MatchInfoDistance = "skrub_Joiner_distance"
  val MatchInfoRescaled = "skrub_Joiner_rescaled_distance"
  val MatchInfoAccepted = "skrub_Joiner_match_accepted"

  /** Reference-distance strategy (the reference's `ref_dist` parameter,
    * _matching.py:9-209 / _joiner.py:150-166). Scalar strategies rescale
    * every match by one fitted constant; the neighbor strategies rescale
    * each match by its own reference distance.
    */
  sealed trait RefDist
  object RefDist {
    /** reference distance = 1.0 (`no_rescaling`). */
    case object NoRescaling extends RefDist
    /** `percentile`-th quantile of sampled aux pair distances
      * (`random_pairs`, _matching.py:88-127). */
    final case class RandomPairs(percentile: Double = 0.25,
                                 sampleSize: Int = 500) extends RefDist
    /** distance of the main row to its (referenceNeighbor+1)-th nearest aux
      * neighbor — the first being the match itself (`second_neighbor`,
      * reference class OtherNeighbor, _matching.py:178-209). */
    final case class SecondNeighbor(referenceNeighbor: Int = 1) extends RefDist
    /** distance of the MATCHED aux row to its referenceNeighbor-th nearest
      * neighbor within the aux table, itself excluded (`self_join_neighbor`,
      * reference class SelfJoinNeighbor, _matching.py:141-176). */
    final case class SelfJoinNeighbor(referenceNeighbor: Int = 1) extends RefDist
  }

  /** The Joiner: left-join `main` to its fuzzy 1-NN match in `aux`.
    *
    * @param keys        (mainCol, auxCol) key pairs
    * @param maxDist     accept a match iff rescaled distance <= maxDist
    * @param rescale     false = no_rescaling ref_dist (reference distance 1.0)
    * @param suffix      rename suffix for colliding aux payload columns
    * @param refStrategy explicit ref_dist strategy; overrides `rescale` /
    *                    `refPercentile` / `refSampleSize` when set
    * @param candidates  "broadcast" (default, reference parity — the whole
    *                    vectorized aux broadcast, every main key scored
    *                    against every aux row, exact 1-NN; the reference
    *                    itself requires aux in memory, _joiner.py:96-104) or
    *                    "lsh": hyperplane-LSH bucketed candidate generation
    *                    (VecExprs.hyperplaneBuckets — the md5-derived planes
    *                    the dedup/ANN kernels use) with the exact distance
    *                    re-ranked WITHIN candidates. The LSH path is the
    *                    beyond-broadcast scale shape: both sides explode to
    *                    nTables (tbl, bkt) keys and the candidate join is a
    *                    plain equi shuffle join — an aux table of any size
    *                    works. Approximate by nature: a main key whose true
    *                    1-NN never shares a bucket matches its nearest
    *                    CANDIDATE instead (or nothing when no bucket
    *                    collides -> unmatched row with null match info);
    *                    sign-LSH approximates angular similarity, which
    *                    matches the string blocks' l2-normalized vectors
    *                    (euclidean is monotone in cosine there).
    *                    SelfJoinNeighbor's per-aux reference distance still
    *                    uses the broadcast aux self-scan — combine the LSH
    *                    path with scalar strategies or SecondNeighbor.
    * @param lshTables   LSH tables (recall amplification), "lsh" only
    * @param lshPlanes   hyperplanes per table (2^planes buckets), "lsh" only
    */
  def fuzzyJoin(main: DataFrame, aux: DataFrame, keys: Seq[(String, String)],
                maxDist: Double = Double.PositiveInfinity,
                rescale: Boolean = true,
                addMatchInfo: Boolean = true,
                nBuckets: Int = 32,
                refPercentile: Double = 0.25,
                refSampleSize: Int = 500,
                suffix: String = "_aux",
                refStrategy: Option[RefDist] = None,
                candidates: String = "broadcast",
                lshTables: Int = 8,
                lshPlanes: Int = 4): DataFrame = {
    require(candidates == "broadcast" || candidates == "lsh",
      s"candidates must be broadcast|lsh, got $candidates")
    val blocks = inferBlocks(aux, keys, nBuckets)
    val auxKeys = keys.map(_._2)
    val mainKeys = keys.map(_._1)

    // dedup aux by key: deterministic representative = smallest payload tuple
    val payload = aux.columns.filterNot(auxKeys.contains).toSeq
    val auxDedup =
      if (payload.isEmpty) aux.distinct()
      else aux.groupBy(auxKeys.map(col): _*)
        .agg(min(struct(payload.map(col): _*)).as("__p"))
        .select(auxKeys.map(col) ++ payload.map(p => col(s"__p.$p").as(p)): _*)

    val fitted = fit(auxDedup, blocks)
    // CPU-spread the vector projections: the dedup exchanges upstream get
    // AQE-coalesced to ~1 partition for small BYTES, but vectorization is
    // CPU-bound in value LENGTH (one md5 per char n-gram), so an explicit
    // size-gated count (Partitions.cpuSpread on the pruned scan estimate)
    // keeps document-length keys off a single core. Vector values are
    // per-row deterministic — partitioning cannot change them — and the
    // fit's stat aggregates read auxDedup directly, untouched by this.
    val auxVec = auxDedup
      .repartition(graft.ops.Partitions.cpuSpread(aux.select(auxKeys.map(col): _*)))
      .withColumn("__vec", fitted.vector(b => col(b.auxCol)))

    val strategy = refStrategy.getOrElse(
      if (rescale) RefDist.RandomPairs(refPercentile, refSampleSize)
      else RefDist.NoRescaling)

    // match DISTINCT main key tuples against the broadcast aux vectors
    val mainKeyCols = mainKeys.map(col)
    val mDistinct = main.select(mainKeyCols: _*).distinct()
      .repartition(graft.ops.Partitions.cpuSpread(main.select(mainKeyCols: _*)))
      .withColumn("__mvec", fitted.vector(b => col(b.mainCol)))
    val auxSide = broadcast(auxVec.select(
      struct(auxKeys.map(col): _*).as("__akey") +: Seq(col("__vec").as("__avec")): _*))
    // (main key, aux key, distance) candidate pairs — the only stage that
    // differs between the exact and the LSH candidate generators
    val pairs = candidates match {
      case "lsh" =>
        import graft.functions.VecExprs
        val aB = auxVec.select(
            struct(auxKeys.map(col): _*).as("__akey"), col("__vec").as("__avec"))
          .select(col("__akey"), col("__avec"),
            posexplode(VecExprs.hyperplaneBuckets(col("__avec"), lshTables, lshPlanes)))
          .select(col("__akey"), col("__avec"),
            col("pos").as("__tbl"), col("col").as("__bkt"))
        val mB = mDistinct
          .select(mainKeyCols :+ col("__mvec") :+
            posexplode(VecExprs.hyperplaneBuckets(col("__mvec"), lshTables, lshPlanes)): _*)
          .withColumnRenamed("pos", "__tbl").withColumnRenamed("col", "__bkt")
        // score in the bucket join, THEN collapse the up-to-lshTables
        // duplicate hits per (main, aux) pair: the aggregate both dedups
        // (SecondNeighbor's k-NN must see each aux once) and sheds the two
        // vectors from the row before the 1-NN shuffle
        mB.join(aB, Seq("__tbl", "__bkt"))
          .withColumn("__d", sqrt(graft.functions.VecExprs.arrayDist2(col("__mvec"), col("__avec"))))
          .groupBy(mainKeyCols :+ col("__akey"): _*)
          .agg(first(col("__d")).as("__d"))
      case _ =>
        mDistinct.crossJoin(auxSide)
          .withColumn("__d", sqrt(graft.functions.VecExprs.arrayDist2(col("__mvec"), col("__avec"))))
    }
    val tieBreak = struct(col("__d") +: auxKeys.indices.map(i =>
      col(s"__akey.${auxKeys(i)}")): _*)

    // 1-NN per distinct main key. SecondNeighbor needs the (k+1)-th smallest
    // too: ONE MinKBy aggregate yields both — partial aggregation keeps the
    // shuffle at one bounded row per key (a window would re-sort the whole
    // pair frame; collect_list would shuffle |aux| elements per key).
    // MinKBy's element ordering struct(d, akey) compares d first then akey
    // fields recursively — identical to the min_by tie-break.
    val matchedRaw: DataFrame = strategy match {
      case RefDist.SecondNeighbor(k) =>
        pairs.groupBy(mainKeyCols: _*)
          .agg(graft.functions.AggExprs.minKBy(
            struct(col("__d").as("d"), col("__akey").as("k")), k + 1).as("__top"))
          .select(mainKeyCols ++ Seq(
            get(col("__top"), lit(0))("k").as("__akey"),
            get(col("__top"), lit(0))("d").as(MatchInfoDistance),
            get(col("__top"), lit(k))("d").as("__refd")): _*)
      case _ =>
        pairs.groupBy(mainKeyCols: _*)
          .agg(min_by(struct(col("__akey"), col("__d")), tieBreak).as("__best"))
          .select(mainKeyCols :+ col("__best.__akey").as("__akey") :+
            col("__best.__d").as(MatchInfoDistance): _*)
    }
    // SelfJoinNeighbor: each aux row's k-th nearest OTHER aux row — an
    // aux-self pair scan (aux is broadcast-small by the reference's own
    // in-memory contract), one bounded row per aux key, joined onto the
    // matches by the matched key (AQE broadcasts the small side).
    val withRef: DataFrame = strategy match {
      case RefDist.SelfJoinNeighbor(k) =>
        val sSide = auxVec.select(
          struct(auxKeys.map(col): _*).as("__skey"), col("__vec").as("__svec"))
        val auxRef = sSide.crossJoin(auxSide)
          .filter(!(col("__skey") === col("__akey")))
          .withColumn("__d", sqrt(graft.functions.VecExprs.arrayDist2(col("__svec"), col("__avec"))))
          .groupBy(col("__skey"))
          .agg(graft.functions.AggExprs.minKBy(
            struct(col("__d").as("d"), col("__akey").as("k")), k).as("__top"))
          .select(col("__skey"), get(col("__top"), lit(k - 1))("d").as("__refd"))
        matchedRaw.join(auxRef, col("__akey") === col("__skey"), "left")
          .drop("__skey")
      case _ => matchedRaw
    }
    val refCol: Column = strategy match {
      case RefDist.NoRescaling           => lit(1.0)
      case RefDist.RandomPairs(p, n)     =>
        lit(referenceDistance(auxVec, auxKeys, p, n))
      case _                             => col("__refd")
    }
    // a null per-row reference distance (fewer than k+1 aux rows) yields a
    // null rescaled distance and a rejected match
    val matched = withRef
      .withColumn(MatchInfoRescaled,
        when(col(MatchInfoDistance) === 0.0, 0.0)
          .when(refCol.isNull, lit(null).cast(DoubleType))
          .when(refCol === 0.0, Double.PositiveInfinity)
          .otherwise(col(MatchInfoDistance) / refCol))
      .withColumn(MatchInfoAccepted,
        coalesce(col(MatchInfoRescaled) <= maxDist, lit(false)))
      .drop("__refd")

    // rejected matches keep null aux payloads: null out the join key
    val acceptedKey = auxKeys.indices.map { i =>
      when(col(MatchInfoAccepted), col(s"__akey.${auxKeys(i)}"))
        .otherwise(lit(null)).as(s"__match_k_$i")
    }
    val matchTable = matched.select(
      mainKeyCols ++ acceptedKey ++
        Seq(col(MatchInfoDistance), col(MatchInfoRescaled), col(MatchInfoAccepted)): _*)

    val withMatch = Joins.leftJoin(main, matchTable, mainKeys, mainKeys)
    val matchKeyNames = auxKeys.indices.map(i => s"__match_k_$i")
    // join on COPIES of the aux keys so the aux key columns themselves stay
    // in the output as payload (the reference joins on a row-number key and
    // keeps aux key columns, _joiner.py:383-399)
    val auxJoinable = auxKeys.zipWithIndex.foldLeft(auxDedup) {
      case (d, (k, i)) => d.withColumn(s"__ak_$i", col(k))
    }
    val joined = Joins.leftJoin(withMatch, auxJoinable,
      matchKeyNames, auxKeys.indices.map(i => s"__ak_$i"), suffix = suffix)
      .drop(matchKeyNames: _*)
    if (addMatchInfo) joined
    else joined.drop(MatchInfoDistance, MatchInfoRescaled, MatchInfoAccepted)
  }
}
