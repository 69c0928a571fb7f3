package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Kernel
import graft.operators.{FuzzyJoin, Joins}

/** Fuzzy-join query with a full DuckDB oracle.
  *
  * Fixture: each customer gets a deterministically mangled copy of its
  * nation's name (vowels stripped / last char dropped / intact, keyed on
  * c_custkey % 3); the fuzzy join must re-match it against `nation`. The
  * oracle reproduces the entire pipeline — char-2-4-gram hashing, sqrt-idf,
  * l2 normalization, all-pairs reference distance, 1-NN with (distance, key)
  * tie-break — in SQL, so distance, rescaled distance, accept flag, and the
  * matched payload are all hash-verified.
  */
object FuzzyJoinQueries {

  private def t(s: SparkSession, dir: String, n: String) = Kernel.table(s, dir, n)

  private val NB = 32 // hash buckets (must match the oracle generator below)
  private val MaxDist = 1.0
  private val LshT = 16 // LSH tables for q_fuzzy_join_lsh
  private val LshP = 4  // hyperplanes per table (16 buckets)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fuzzy_join" -> ((s, dir) => {
      val nation = t(s, dir, "nation").select(col("n_name"), col("n_regionkey"))
      val cust = t(s, dir, "customer")
      val withName = Joins.leftJoin(cust, t(s, dir, "nation"),
        Seq("c_nationkey"), Seq("n_nationkey"))
      val mangled = withName.withColumn("nation_guess",
          when(col("c_custkey") % 3 === 0,
            regexp_replace(lower(col("n_name")), "[aeiou]", ""))
            .when(col("c_custkey") % 3 === 1,
              lower(col("n_name")).substr(lit(1), length(col("n_name")) - 1))
            .otherwise(lower(col("n_name"))))
        .select(col("c_custkey"), col("nation_guess"))
      FuzzyJoin.fuzzyJoin(mangled, nation, Seq("nation_guess" -> "n_name"),
          maxDist = MaxDist, nBuckets = NB)
        .select(col("c_custkey"), col("nation_guess"),
          col("n_name"), col("n_regionkey"),
          round(col(FuzzyJoin.MatchInfoDistance), 6).as("distance"),
          round(col(FuzzyJoin.MatchInfoRescaled), 6).as("rescaled_distance"),
          col(FuzzyJoin.MatchInfoAccepted).as("match_accepted"))
    }),
    // ref_dist = second_neighbor: each match rescaled by the main row's
    // distance to its SECOND nearest aux neighbor (rescaled <= 1 by
    // construction, so the accept threshold is < 1)
    "q_fuzzy_join_second" -> ((s, dir) => {
      val nation = t(s, dir, "nation").select(col("n_name"), col("n_regionkey"))
      FuzzyJoin.fuzzyJoin(mangledGuesses(s, dir), nation,
          Seq("nation_guess" -> "n_name"),
          maxDist = 0.9, nBuckets = NB,
          refStrategy = Some(FuzzyJoin.RefDist.SecondNeighbor(1)))
        .select(col("c_custkey"), col("nation_guess"),
          col("n_name"), col("n_regionkey"),
          round(col(FuzzyJoin.MatchInfoDistance), 6).as("distance"),
          round(col(FuzzyJoin.MatchInfoRescaled), 6).as("rescaled_distance"),
          col(FuzzyJoin.MatchInfoAccepted).as("match_accepted"))
    }),
    // LSH-bucketed candidate generation (the beyond-broadcast-aux scale
    // path): hyperplane buckets on both vector sides, exact re-rank within
    // candidates — hash-verified end to end including the md5-derived
    // bucket membership (Planes.bucketTablesSql mirrors the plane family)
    "q_fuzzy_join_lsh" -> ((s, dir) => {
      val nation = t(s, dir, "nation").select(col("n_name"), col("n_regionkey"))
      FuzzyJoin.fuzzyJoin(mangledGuesses(s, dir), nation,
          Seq("nation_guess" -> "n_name"),
          maxDist = MaxDist, nBuckets = NB,
          candidates = "lsh", lshTables = LshT, lshPlanes = LshP)
        .select(col("c_custkey"), col("nation_guess"),
          col("n_name"), col("n_regionkey"),
          round(col(FuzzyJoin.MatchInfoDistance), 6).as("distance"),
          round(col(FuzzyJoin.MatchInfoRescaled), 6).as("rescaled_distance"),
          col(FuzzyJoin.MatchInfoAccepted).as("match_accepted"))
    }),
    // ref_dist = self_join_neighbor: each match rescaled by the matched aux
    // row's nearest-neighbor distance within aux
    "q_fuzzy_join_selfjoin" -> ((s, dir) => {
      val nation = t(s, dir, "nation").select(col("n_name"), col("n_regionkey"))
      FuzzyJoin.fuzzyJoin(mangledGuesses(s, dir), nation,
          Seq("nation_guess" -> "n_name"),
          maxDist = MaxDist, nBuckets = NB,
          refStrategy = Some(FuzzyJoin.RefDist.SelfJoinNeighbor(1)))
        .select(col("c_custkey"), col("nation_guess"),
          col("n_name"), col("n_regionkey"),
          round(col(FuzzyJoin.MatchInfoDistance), 6).as("distance"),
          round(col(FuzzyJoin.MatchInfoRescaled), 6).as("rescaled_distance"),
          col(FuzzyJoin.MatchInfoAccepted).as("match_accepted"))
    })
  )

  /** The shared fixture: each customer's deterministically mangled copy of
    * its nation's name.
    */
  private def mangledGuesses(s: SparkSession, dir: String): DataFrame =
    Joins.leftJoin(t(s, dir, "customer"), t(s, dir, "nation"),
        Seq("c_nationkey"), Seq("n_nationkey"))
      .withColumn("nation_guess",
        when(col("c_custkey") % 3 === 0,
          regexp_replace(lower(col("n_name")), "[aeiou]", ""))
          .when(col("c_custkey") % 3 === 1,
            lower(col("n_name")).substr(lit(1), length(col("n_name")) - 1))
          .otherwise(lower(col("n_name"))))
      .select(col("c_custkey"), col("nation_guess"))

  /** DuckDB tf-array expression for a value column `v`: padded char
    * 2-4-grams -> md5-bucket counts (mirrors FuzzyJoin.tfArray).
    */
  private def tfSql(v: String): String = {
    val norm = s"trim(regexp_replace(lower($v), '[^a-z0-9]+', ' ', 'g'))"
    val padded = s"(' ' || $norm || ' ')"
    val grams = (2 to 4).map { n =>
      s"""(CASE WHEN length($padded) - ${n - 1} <= 0 THEN []
         | ELSE list_transform(range(1, length($padded) - ${n - 1} + 1),
         |   i -> substr($padded, i, $n)) END)""".stripMargin
    }.mkString("flatten([", ", ", "])")
    s"""list_transform(range(0, $NB), b -> CAST(len(list_filter($grams,
       |  g -> ('0x' || substr(md5(g), 1, 4))::INTEGER % $NB = b)) AS DOUBLE))""".stripMargin
  }

  private val d2 = "list_sum(list_transform(list_zip(%s, %s), p -> (p[1]-p[2])*(p[1]-p[2])))"

  /** Shared oracle CTE chain: aux vectorization, idf, guesses, and main-key
    * vectors (no pair scoring — generators differ per query).
    */
  private def vecCtes: String =
    s"""WITH aux AS (
       |  SELECT n_name, n_regionkey, ${tfSql("n_name")} AS tf FROM nation),
       |dfc AS (
       |  SELECT b, sum(CASE WHEN tf[b + 1] > 0 THEN 1 ELSE 0 END) AS df
       |  FROM aux, (SELECT unnest(range(0, $NB)) AS b) GROUP BY b),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM aux),
       |idf AS (
       |  SELECT list(sqrt((1.0 + n) / (1.0 + df)) ORDER BY b) AS w
       |  FROM dfc, nn GROUP BY n),
       |auxw AS (
       |  SELECT n_name, n_regionkey,
       |    list_transform(list_zip(tf, (SELECT w FROM idf)), p -> p[1] * p[2]) AS wv
       |  FROM aux),
       |auxn AS (
       |  SELECT n_name, n_regionkey, wv,
       |    sqrt(list_sum(list_transform(wv, x -> x * x))) AS nrm
       |  FROM auxw),
       |auxvec AS (
       |  SELECT n_name, n_regionkey,
       |    CASE WHEN nrm = 0 THEN wv ELSE list_transform(wv, x -> x / nrm) END AS vec
       |  FROM auxn),
       |guesses AS (
       |  SELECT c_custkey,
       |    CASE WHEN c_custkey % 3 = 0
       |           THEN regexp_replace(lower(n_name), '[aeiou]', '', 'g')
       |         WHEN c_custkey % 3 = 1
       |           THEN substr(lower(n_name), 1, length(n_name) - 1)
       |         ELSE lower(n_name) END AS nation_guess
       |  FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey),
       |mkeys AS (
       |  SELECT DISTINCT nation_guess FROM guesses),
       |mtf AS (
       |  SELECT nation_guess, ${tfSql("nation_guess")} AS tf FROM mkeys),
       |mw AS (
       |  SELECT nation_guess,
       |    list_transform(list_zip(tf, (SELECT w FROM idf)), p -> p[1] * p[2]) AS wv
       |  FROM mtf),
       |mn AS (
       |  SELECT nation_guess, wv,
       |    sqrt(list_sum(list_transform(wv, x -> x * x))) AS nrm
       |  FROM mw),
       |mvec AS (
       |  SELECT nation_guess,
       |    CASE WHEN nrm = 0 THEN wv ELSE list_transform(wv, x -> x / nrm) END AS vec
       |  FROM mn)""".stripMargin

  /** All-pairs exact scoring (the broadcast path's oracle). */
  private def commonCtes: String =
    s"""$vecCtes,
       |scored AS (
       |  SELECT m.nation_guess, a.n_name, a.n_regionkey,
       |    sqrt(${d2.format("m.vec", "a.vec")}) AS d,
       |    row_number() OVER (PARTITION BY m.nation_guess
       |      ORDER BY sqrt(${d2.format("m.vec", "a.vec")}) ASC, a.n_name ASC) AS rn
       |  FROM mvec m CROSS JOIN auxvec a)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_fuzzy_join" -> {
      s"""WITH aux AS (
         |  SELECT n_name, n_regionkey, ${tfSql("n_name")} AS tf FROM nation),
         |dfc AS (
         |  SELECT b, sum(CASE WHEN tf[b + 1] > 0 THEN 1 ELSE 0 END) AS df
         |  FROM aux, (SELECT unnest(range(0, $NB)) AS b) GROUP BY b),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM aux),
         |idf AS (
         |  SELECT list(sqrt((1.0 + n) / (1.0 + df)) ORDER BY b) AS w
         |  FROM dfc, nn GROUP BY n),
         |auxw AS (
         |  SELECT n_name, n_regionkey,
         |    list_transform(list_zip(tf, (SELECT w FROM idf)), p -> p[1] * p[2]) AS wv
         |  FROM aux),
         |auxn AS (
         |  SELECT n_name, n_regionkey, wv,
         |    sqrt(list_sum(list_transform(wv, x -> x * x))) AS nrm
         |  FROM auxw),
         |auxvec AS (
         |  SELECT n_name, n_regionkey,
         |    CASE WHEN nrm = 0 THEN wv ELSE list_transform(wv, x -> x / nrm) END AS vec
         |  FROM auxn),
         |refd AS (
         |  SELECT quantile_cont(d, 0.25) AS ref FROM (
         |    SELECT sqrt(${d2.format("x.vec", "y.vec")}) AS d
         |    FROM auxvec x JOIN auxvec y ON x.n_name < y.n_name)),
         |guesses AS (
         |  SELECT c_custkey,
         |    CASE WHEN c_custkey % 3 = 0
         |           THEN regexp_replace(lower(n_name), '[aeiou]', '', 'g')
         |         WHEN c_custkey % 3 = 1
         |           THEN substr(lower(n_name), 1, length(n_name) - 1)
         |         ELSE lower(n_name) END AS nation_guess
         |  FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey),
         |mkeys AS (
         |  SELECT DISTINCT nation_guess FROM guesses),
         |mtf AS (
         |  SELECT nation_guess, ${tfSql("nation_guess")} AS tf FROM mkeys),
         |mw AS (
         |  SELECT nation_guess,
         |    list_transform(list_zip(tf, (SELECT w FROM idf)), p -> p[1] * p[2]) AS wv
         |  FROM mtf),
         |mn AS (
         |  SELECT nation_guess, wv,
         |    sqrt(list_sum(list_transform(wv, x -> x * x))) AS nrm
         |  FROM mw),
         |mvec AS (
         |  SELECT nation_guess,
         |    CASE WHEN nrm = 0 THEN wv ELSE list_transform(wv, x -> x / nrm) END AS vec
         |  FROM mn),
         |scored AS (
         |  SELECT m.nation_guess, a.n_name, a.n_regionkey,
         |    sqrt(${d2.format("m.vec", "a.vec")}) AS d,
         |    row_number() OVER (PARTITION BY m.nation_guess
         |      ORDER BY sqrt(${d2.format("m.vec", "a.vec")}) ASC, a.n_name ASC) AS rn
         |  FROM mvec m CROSS JOIN auxvec a),
         |best AS (
         |  SELECT nation_guess, n_name, n_regionkey, d,
         |    CASE WHEN d = 0 THEN 0.0
         |         WHEN (SELECT ref FROM refd) = 0 THEN 1e308 * 10
         |         ELSE d / (SELECT ref FROM refd) END AS resc
         |  FROM scored WHERE rn = 1),
         |flags AS (
         |  SELECT *, resc <= $MaxDist AS ok FROM best)
         |SELECT g.c_custkey, g.nation_guess,
         |  CASE WHEN f.ok THEN f.n_name END AS n_name,
         |  CASE WHEN f.ok THEN f.n_regionkey END AS n_regionkey,
         |  round(f.d, 6) AS distance,
         |  round(f.resc, 6) AS rescaled_distance,
         |  f.ok AS match_accepted
         |FROM guesses g LEFT JOIN flags f ON g.nation_guess = f.nation_guess""".stripMargin
    },
    "q_fuzzy_join_lsh" -> {
      import graft.functions.Planes
      s"""$vecCtes,
         |refd AS (
         |  SELECT quantile_cont(d, 0.25) AS ref FROM (
         |    SELECT sqrt(${d2.format("x.vec", "y.vec")}) AS d
         |    FROM auxvec x JOIN auxvec y ON x.n_name < y.n_name)),
         |abkt AS (SELECT n_name, unnest(${Planes.bucketTablesSql("vec", LshT, LshP)}) AS tb FROM auxvec),
         |abt AS (SELECT n_name, struct_extract(tb, 'tbl') AS tbl, struct_extract(tb, 'bkt') AS bkt FROM abkt),
         |mbkt AS (SELECT nation_guess, unnest(${Planes.bucketTablesSql("vec", LshT, LshP)}) AS tb FROM mvec),
         |mbt AS (SELECT nation_guess, struct_extract(tb, 'tbl') AS tbl, struct_extract(tb, 'bkt') AS bkt FROM mbkt),
         |cand AS (
         |  SELECT DISTINCT m.nation_guess, a.n_name
         |  FROM mbt m JOIN abt a ON m.tbl = a.tbl AND m.bkt = a.bkt),
         |lscored AS (
         |  SELECT c.nation_guess, c.n_name, a.n_regionkey,
         |    sqrt(${d2.format("m.vec", "a.vec")}) AS d,
         |    row_number() OVER (PARTITION BY c.nation_guess
         |      ORDER BY sqrt(${d2.format("m.vec", "a.vec")}) ASC, a.n_name ASC) AS rn
         |  FROM cand c JOIN mvec m ON c.nation_guess = m.nation_guess
         |    JOIN auxvec a ON c.n_name = a.n_name),
         |best AS (
         |  SELECT nation_guess, n_name, n_regionkey, d,
         |    CASE WHEN d = 0 THEN 0.0
         |         WHEN (SELECT ref FROM refd) = 0 THEN 1e308 * 10
         |         ELSE d / (SELECT ref FROM refd) END AS resc
         |  FROM lscored WHERE rn = 1),
         |flags AS (
         |  SELECT *, resc <= $MaxDist AS ok FROM best)
         |SELECT g.c_custkey, g.nation_guess,
         |  CASE WHEN f.ok THEN f.n_name END AS n_name,
         |  CASE WHEN f.ok THEN f.n_regionkey END AS n_regionkey,
         |  round(f.d, 6) AS distance,
         |  round(f.resc, 6) AS rescaled_distance,
         |  f.ok AS match_accepted
         |FROM guesses g LEFT JOIN flags f ON g.nation_guess = f.nation_guess""".stripMargin
    },
    "q_fuzzy_join_second" -> {
      s"""$commonCtes,
         |best AS (
         |  SELECT nation_guess, n_name, n_regionkey, d FROM scored WHERE rn = 1),
         |ref2 AS (
         |  SELECT nation_guess, d AS refd FROM scored WHERE rn = 2),
         |flags AS (
         |  SELECT b.nation_guess, b.n_name, b.n_regionkey, b.d,
         |    CASE WHEN b.d = 0 THEN 0.0
         |         WHEN r.refd IS NULL THEN NULL
         |         WHEN r.refd = 0 THEN 1e308 * 10
         |         ELSE b.d / r.refd END AS resc
         |  FROM best b LEFT JOIN ref2 r ON b.nation_guess = r.nation_guess),
         |fl AS (
         |  SELECT *, coalesce(resc <= 0.9, false) AS ok FROM flags)
         |SELECT g.c_custkey, g.nation_guess,
         |  CASE WHEN f.ok THEN f.n_name END AS n_name,
         |  CASE WHEN f.ok THEN f.n_regionkey END AS n_regionkey,
         |  round(f.d, 6) AS distance,
         |  round(f.resc, 6) AS rescaled_distance,
         |  f.ok AS match_accepted
         |FROM guesses g LEFT JOIN fl f ON g.nation_guess = f.nation_guess""".stripMargin
    },
    "q_fuzzy_join_selfjoin" -> {
      s"""$commonCtes,
         |selfd AS (
         |  SELECT x.n_name AS sname, min(sqrt(${d2.format("x.vec", "y.vec")})) AS refd
         |  FROM auxvec x JOIN auxvec y ON x.n_name <> y.n_name
         |  GROUP BY x.n_name),
         |best AS (
         |  SELECT nation_guess, n_name, n_regionkey, d FROM scored WHERE rn = 1),
         |flags AS (
         |  SELECT b.nation_guess, b.n_name, b.n_regionkey, b.d,
         |    CASE WHEN b.d = 0 THEN 0.0
         |         WHEN s.refd IS NULL THEN NULL
         |         WHEN s.refd = 0 THEN 1e308 * 10
         |         ELSE b.d / s.refd END AS resc
         |  FROM best b LEFT JOIN selfd s ON b.n_name = s.sname),
         |fl AS (
         |  SELECT *, coalesce(resc <= $MaxDist, false) AS ok FROM flags)
         |SELECT g.c_custkey, g.nation_guess,
         |  CASE WHEN f.ok THEN f.n_name END AS n_name,
         |  CASE WHEN f.ok THEN f.n_regionkey END AS n_regionkey,
         |  round(f.d, 6) AS distance,
         |  round(f.resc, 6) AS rescaled_distance,
         |  f.ok AS match_accepted
         |FROM guesses g LEFT JOIN fl f ON g.nation_guess = f.nation_guess""".stripMargin
    }
  )
}
