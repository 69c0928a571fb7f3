package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming NEAR-duplicate suppression — the incremental twin of
  * graft.operators.Dedup.simhashPairs, built on the custom-state extension
  * point (`flatMapGroupsWithState`, SURVEY §2.12): built-in streaming
  * dedup is exact-key only, so near-dup filtering needs explicit per-group
  * state.
  *
  * Shape: each document's 64-bit simhash fingerprint (graft.functions.Text
  * .simhash64 — same definition as the batch path, bit for bit) is split
  * into `maxHamming + 1` 16-bit blocks; by pigeonhole, any two fingerprints
  * within `maxHamming` agree on at least one block, so the stream is keyed
  * by (blockIndex, blockValue) and candidate comparisons happen ONLY within
  * a block group — never all-pairs, state sharded across executors exactly
  * like the batch join key. 16-bit blocks keep per-group state population
  * near corpus/65536 (8-bit blocks concentrated corpus/256 fingerprints in
  * one group — the r6 rehearsal's quadratic-bucket hazard).
  *
  * Per group the state holds the fingerprints seen so far (bounded via
  * processing-time timeout eviction); a document is emitted as `is_dup`
  * when ANY block group finds a prior fingerprint within `maxHamming`.
  * Because a doc appears in `maxHamming + 1` groups, emissions are
  * per-(doc, block); the caller aggregates `max(is_dup)` by doc id — kept
  * explicit so the group output remains an append-mode stream.
  */
object StreamingNearDup {

  final case class BlockedDoc(blockKey: String, docId: Long, fingerprint: Long)
  final case class BlockVerdict(docId: Long, blockKey: String, isDup: Boolean)

  val Blocks = 4 // maxHamming = Blocks - 1 pigeonhole guarantee

  /** (blockIndex, 16-bit block value) keys for a 64-bit fingerprint. */
  def blockKeys(fp: Long): Seq[String] =
    (0 until Blocks).map(b => s"$b:${(fp >> (16 * b)) & 0xffffL}")

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  /** Newest fingerprints kept per block group — bounds state size without
    * timeout machinery: a block bucket holding this many near-colliding
    * fingerprints is a hot bucket whose oldest entries have long stopped
    * mattering (mirrors the batch path's hot-shingle cutoff philosophy).
    */
  val MaxStatePerBlock = 10000

  /** The per-group state function: compare the batch's fingerprints against
    * the group's seen set, then fold the batch in (first occurrence in a
    * batch is not a dup of itself; later same-batch near-matches are).
    */
  def judge(maxHamming: Int)(
      key: String, rows: Iterator[BlockedDoc],
      state: GroupState[List[Long]]): Iterator[BlockVerdict] = {
    var seen = state.getOption.getOrElse(Nil)
    val out = rows.toSeq.sortBy(_.docId).map { d =>
      val dup = seen.exists(prev => hamming(prev, d.fingerprint) <= maxHamming)
      seen = d.fingerprint :: seen
      BlockVerdict(d.docId, key, dup)
    }
    state.update(seen.take(MaxStatePerBlock))
    out.iterator
  }

  /** Per-(doc, block) verdicts for a streaming (or batch-tested) dataset of
    * (docId, text). Aggregate `max(is_dup)` by docId downstream.
    */
  def verdicts(df: DataFrame, idCol: String, textCol: String,
               maxHamming: Int = Blocks - 1): Dataset[BlockVerdict] = {
    val spark = df.sparkSession
    import spark.implicits._
    val blocked = df
      .select(col(idCol).cast("long").as("docId"),
        graft.functions.Text.simhash64(col(textCol)).as("fingerprint"))
      .select(col("docId"), col("fingerprint"),
        explode(typedLit((0 until Blocks).toList)).as("b"))
      .select(
        concat_ws(":", col("b"),
          expr("shiftright(fingerprint, b * 16)").bitwiseAND(lit(0xffffL)))
          .as("blockKey"),
        col("docId"), col("fingerprint"))
      .as[BlockedDoc]
    blocked
      .groupByKey(_.blockKey)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(judge(maxHamming))
  }
}
