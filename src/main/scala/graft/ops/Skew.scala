package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Salted equi-join — the manual skew breaker for the case AQE's runtime
  * skew-join split cannot reach (a single hot key whose rows exceed one
  * task's memory even after split, or a build side too large for AQE's
  * OptimizeSkewedJoin to replicate automatically): the probe (large,
  * skewed) side gets a DETERMINISTIC salt in [0, buckets) derived from a
  * unique row key (md5 — no RNG, no partition-layout sensitivity), the
  * build side replicates x buckets, and the join runs on
  * (keys..., salt) — each hot key's rows spread across `buckets` tasks.
  *
  * The result set is IDENTICAL to the plain equi-join (every probe row
  * meets every matching build row exactly once, under its own salt) — the
  * registered query `q_join_salted` proves it by passing the SAME oracle
  * as the unsalted `q_join_left`.
  *
  * Cost model: build-side bytes x buckets of extra shuffle — pick
  * `buckets` ~ (hot-key rows / target task rows), and only reach for this
  * when the build side is small relative to the skew it breaks.
  * Supported join types: inner, left (right/full would duplicate
  * unmatched BUILD rows across salts).
  *
  * WHEN to reach for this (measured, BASELINE.md "Skewed-join rehearsal"):
  *  1. a broadcastable dim ends the story — broadcast joins never shuffle
  *     the probe side, so no join skew exists;
  *  2. wide/incompressible hot rows: AQE's OptimizeSkewedJoin splits at
  *     defaults (`skew=true` in the final plan) — prefer it; the salt
  *     only ties it while paying salt-hash + build-replication overhead;
  *  3. narrow/compressible hot rows or compute-heavy joins: AQE's skew
  *     detector is BYTES-based and post-compression — a 10M-row hot
  *     partition that compresses under the threshold is invisible to it
  *     (measured: `skew=false` with a 25x task-time straggler). THIS is
  *     the salted join's case;
  *  4. size `buckets` at >= 4x the shuffle parallelism: salts land on
  *     partitions by hash, and at buckets == partitions the collision
  *     pileup re-concentrates several salts of the hot key onto one task
  *     (measured: 128 buckets over 32 partitions caps the largest join
  *     group at hot/128).
  */
object Skew {

  def saltedJoin(probe: DataFrame, build: DataFrame, on: Seq[String],
                 buckets: Int, probeSaltKeys: Seq[String],
                 joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner|left, got $joinType")
    require(!probe.columns.contains("__salt") && !build.columns.contains("__salt"),
      "saltedJoin: __salt is reserved")
    val salt = pmod(
      conv(substring(md5(concat_ws(":",
        probeSaltKeys.map(col(_).cast(StringType)): _*)), 1, 8), 16, 10)
        .cast(LongType), lit(buckets.toLong))
    val p = probe.withColumn("__salt", salt)
    val b = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1L))))
    p.join(b, on :+ "__salt", joinType).drop("__salt")
  }
}
