package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic pseudo-random hyperplanes for sign-LSH bucketing of
  * embedding vectors (dedup near-dup blocking, IVF-style ANN).
  *
  * Coefficient c(p, i) for plane p, dimension i is derived from
  * md5("p:i"): the first 8 hex digits as an integer, mapped to [-1, 1) by
  * x / 2^31 - 1. Every step is exact in IEEE double, so the DuckDB oracle
  * reproduces the identical coefficient from the same md5 — bucket membership
  * is bit-for-bit verifiable.
  *
  * Coefficients are evaluated ON THE DRIVER once and embedded as literals in
  * the plan: per-row md5 of a (p, i)-only string would recompute a constant
  * for every row (the round-1 shape; ~10x slower in the bucket hot loop).
  */
object Planes {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** coefficient of plane `p` at dimension `i` — exact double. */
  def coef(p: Int, i: Int): Double =
    java.lang.Long.parseLong(md5Hex(s"$p:$i").substring(0, 8), 16).toDouble /
      math.pow(2, 31) - 1.0

  /** Signed projection of a `dim`-length double array column onto plane `p`,
    * statically unrolled (codegen'd arithmetic, left-assoc sum — the same
    * association order as the oracle's sequential list_sum).
    */
  def projection(vec: Column, p: Int, dim: Int): Column =
    (1 to dim).map(i => element_at(vec, i) * lit(coef(p, i - 1))).reduce(_ + _)

  /** Bucket id: bit p of the result is set iff projection onto plane
    * `offset + p` >= 0. `offset` selects an independent plane family —
    * multi-table LSH amplification uses offset = tableIndex * nPlanes.
    */
  def bucket(vec: Column, nPlanes: Int, dim: Int, offset: Int = 0): Column =
    (0 until nPlanes).map { p =>
      when(projection(vec, offset + p, dim) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** DuckDB SQL fragment computing the same bucket for a list column `nv`
    * (used by the oracle entries; kept next to the Scala so the two
    * definitions can never drift apart silently).
    */
  def bucketSql(nv: String, nPlanes: Int, offset: Int = 0): String = {
    def proj(p: Int) =
      s"""list_sum(list_transform(list_zip($nv, list_transform(range(0, len($nv)),
         | i -> list_sum(list_transform(range(8),
         |   j -> (strpos('0123456789abcdef', substr(md5($p || ':' || i), j + 1, 1)) - 1)
         |        * pow(16.0, 7 - j))) / 2147483648.0 - 1.0)),
         | x -> x[1] * x[2]))""".stripMargin
    (0 until nPlanes).map { p =>
      s"(CASE WHEN ${proj(offset + p)} >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
  }

  /** SQL: list of `nTables` (tbl, bkt) structs mirroring `bucketTables`. */
  def bucketTablesSql(nv: String, nTables: Int, planesPerTable: Int): String =
    (0 until nTables).map { t =>
      s"{'tbl': $t, 'bkt': ${bucketSql(nv, planesPerTable, t * planesPerTable)}}"
    }.mkString("[", ", ", "]")
}
