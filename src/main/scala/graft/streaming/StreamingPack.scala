package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType

/** Streaming sequence packing — the incremental twin of
  * graft.operators.Pack.sequences for live ingestion: docs arriving on a
  * stream are assigned to fixed-token-budget training packs per shard,
  * continuing each shard's running total across micro-batches
  * (`mapGroupsWithState` custom state, SURVEY §2.11/§2.12).
  *
  * Exactly the batch rule: a doc's pack id is
  * floor(tokens-before-it-in-shard / budget) with per-doc counts clamped
  * to [0, budget] (null counts read as 0 — the Pack.sequences contract).
  * State per shard is ONE long (the cumulative clamped token count), so
  * state size is |shards| * 8 bytes at any stream length — nothing to
  * evict, nothing corpus-proportional. Within a micro-batch rows are
  * processed in `docId` order, so a stream whose arrival order follows
  * doc ids reproduces the batch packing BIT FOR BIT (spec-pinned); any
  * other arrival order is packed deterministically in (batch, docId)
  * order, which is the only order a stream can honestly promise.
  */
object StreamingPack {

  final case class PackDoc(shard: String, docId: Long, nToks: Long)
  final case class PackedDoc(shard: String, docId: Long,
                             packTokens: Long, packId: Long)

  def assign(budget: Long)(
      key: String, rows: Iterator[PackDoc],
      state: GroupState[Long]): Iterator[PackedDoc] = {
    var cum = state.getOption.getOrElse(0L)
    val out = rows.toSeq.sortBy(_.docId).map { d =>
      val t = math.min(math.max(d.nToks, 0L), budget)
      val packId = cum / budget
      cum += t
      PackedDoc(key, d.docId, t, packId)
    }
    state.update(cum)
    out.iterator
  }

  /** Pack a (possibly streaming) frame: output (shard, docId, packTokens,
    * packId), append mode.
    */
  def packStream(df: DataFrame, tokenCol: String, groupCol: String,
                 idCol: String, budget: Long): Dataset[PackedDoc] = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string").as("shard"),
        col(idCol).cast(LongType).as("docId"),
        coalesce(col(tokenCol).cast(LongType), lit(0L)).as("nToks"))
      .as[PackDoc]
      .groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        assign(budget))
  }
}
