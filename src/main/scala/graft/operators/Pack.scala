package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing: assign documents to fixed-token-budget training
  * packs — the "sample packing" step that turns a curated corpus into
  * model-ready shards (every document in a pack concatenates into one
  * training sequence; packing density drives accelerator utilization).
  *
  * Discipline: BOUNDARY-ALIGNED STREAMING packing, the vectorizable form
  * streaming tokenizer-packers use. Within each `groupCol` shard the
  * documents stream in `idCol` order and a document joins the pack whose
  * budget window its running-total START position falls in:
  * pack_id = floor((cumsum - tokens) / budget). A pack can therefore
  * overflow by less than its last document (bounded: per-doc counts are
  * clamped to the budget, so a pack never exceeds 2*budget - 1); real
  * packers handle the straddling tail by truncation or cross-pack
  * continuation downstream. Greedy-with-reset (close the pack when the
  * next doc would not fit) wastes the tail space instead and needs a
  * sequential recurrence per shard — it cannot ride one window
  * expression, which is exactly what makes this form the scalable (and
  * SQL-oracle-reproducible) one.
  *
  * Scale shape: ONE window per shard key — the window partitions by
  * `groupCol`, so the sort and the running total parallelize across
  * shards and nothing globally orders the corpus (a no-partition window
  * would single-task it; shard-local packing is also what real pipelines
  * do — within a crawl dump or source shard, not across the corpus).
  * Skew bound = the largest single shard / `subShards` — pass
  * `subShards > 1` when one source dominates the corpus (see
  * `sequences`). The bound is ENFORCED, not just documented: a probe
  * aggregate measures the largest shard and refuses loudly (with the
  * `subShards` value that restores the bound) when any per-task stream
  * would exceed `maxShardRows` (see `guardShardSizes`).
  */
object Pack {

  /** `shuffleSeed`: when set, documents stream through each shard in
    * md5(id:seed) order instead of id order — the deterministic pre-pack
    * shuffle every training pipeline runs so a pack never reproduces
    * crawl/ingest adjacency. Same ONE window (the shuffle rides the sort
    * the pack window already pays — no extra pass), same md5 contract as
    * the library's other seeded orderings, so the packing stays
    * hash-reproducible in SQL. idCol tie-breaks for a total order.
    *
    * `subShards`: the MEGA-SHARD policy variant. The window partitions by
    * `groupCol`, so one dominant source (a web crawl at 60-90% of the
    * corpus) would sort most of the corpus on ONE task. Pack assignment
    * is POLICY, not fixed semantics — real packers shard a source's
    * stream — so `subShards > 1` deterministically splits each shard into
    * that many sub-streams (md5(id:"shard") mod subShards — stable under
    * reordering/re-ingest, independent of `shuffleSeed`) and packs each
    * independently; pack ids are namespaced collision-free as
    * `local_pack * subShards + sub_shard`. Each sub-stream keeps the exact
    * boundary-aligned semantics; only the doc→pack grouping differs from
    * subShards = 1 (up to subShards straddling tails per shard instead of
    * one). Size it so shardRows / subShards fits one task comfortably.
    *
    * LAZINESS (ADVICE r13, considered and deliberately declined): with
    * the default `maxShardRows` this call launches the bounded probe
    * aggregate AT CALL TIME — it is not pure plan construction. Eager is
    * the point, not an oversight: a deferred in-plan guard (row_number +
    * raise_error riding the pack window) would fire only AFTER the
    * offending mega-shard has been shuffled, sorted, and buffered on its
    * one task — at the scale the guard exists for, the job dies of the
    * mega-sort (straggler/OOM) before the deferred diagnostic ever
    * evaluates. The probe costs one count-per-shard pass (~0.06 s at the
    * 10x fixture, measured r13); persist the upstream when its plan is
    * expensive, or pass `maxShardRows = 0` to vouch for the shard sizes
    * and keep the call pure plan construction.
    */
  def sequences(docs: DataFrame, tokenCol: String, budget: Long,
                groupCol: String, idCol: String,
                shuffleSeed: Option[Long] = None,
                subShards: Int = 1,
                maxShardRows: Long = 1L << 22): DataFrame = {
    val order = shuffleSeed match {
      case Some(seed) => Seq(
        md5(concat_ws(":", col(idCol).cast("string"), lit(seed.toString))),
        col(idCol))
      case None => Seq(col(idCol))
    }
    packCore(docs, tokenCol, budget, groupCol, order,
      col(idCol).cast("string"), subShards, maxShardRows)
  }

  /** `sequences` with a COMPOSITE stream order — the (doc, repeat) keys a
    * recipe's repeated stream needs, or any id that only totals under a
    * column list (string doc id + repeat index). Documents stream through
    * each shard in ascending `orderCols` order (the caller guarantees the
    * tuple is unique per shard); the sub-shard hash salts on the same
    * composite key.
    */
  def sequencesBy(docs: DataFrame, tokenCol: String, budget: Long,
                  groupCol: String, orderCols: Seq[String],
                  subShards: Int = 1,
                  maxShardRows: Long = 1L << 22): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    packCore(docs, tokenCol, budget, groupCol, orderCols.map(col),
      concat_ws(":", orderCols.map(col(_).cast("string")): _*), subShards,
      maxShardRows)
  }

  /** MEGA-SHARD GUARD (r13): the pack window sorts each (shard
    * [, sub-shard]) stream on ONE task, so a dominant source — a web
    * crawl at 60-90% of a 100 TB corpus — would silently single-task
    * most of the train pool under the `subShards = 1` default: a
    * straggler at best, an executor OOM at worst, and nothing used to
    * even detect it. Pack assignment is POLICY (changing `subShards`
    * changes the doc→pack grouping), so unlike the budget stage this
    * cannot auto-route without changing output; the honest form is ONE
    * bounded probe aggregate (`Budget.selectToBudgetPerGroup`'s
    * discipline — a single driver row: the largest shard and its size)
    * that FAILS LOUDLY with the `subShards` value restoring the bound
    * when any shard's per-task stream would exceed `maxShardRows`.
    * `maxShardRows = 0` disables the probe (the caller vouches for the
    * shard sizes — e.g. a composed pipeline that already measured them);
    * the probe is an extra action over `docs`, so persist upstream when
    * the input plan is expensive (the Recipe checkpoint discipline).
    */
  private def guardShardSizes(docs: DataFrame, groupCol: String,
                              subShards: Int, maxShardRows: Long): Unit = {
    val probe = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .agg(max(col("__n")).as("__mx"),
        max_by(col(groupCol).cast("string"), col("__n")).as("__g"))
      .head()
    if (!probe.isNullAt(0)) {
      val mx = probe.getLong(0)
      val perTask = (mx + subShards - 1) / subShards
      if (perTask > maxShardRows) {
        val suggest = (mx + maxShardRows - 1) / maxShardRows
        throw new IllegalArgumentException(
          s"Pack: shard '${probe.getString(1)}' has $mx rows — " +
            (if (subShards == 1) "the pack window would sort it all on ONE task"
             else s"$subShards sub-shards still leave ~$perTask rows on one task") +
            s", above maxShardRows = $maxShardRows. Pass subShards >= $suggest " +
            "(Recipe.compose: packSubShards) to split the stream, or " +
            "maxShardRows = 0 to accept the single-task sort.")
      }
    }
  }

  private def packCore(docs: DataFrame, tokenCol: String, budget: Long,
                       groupCol: String, order: Seq[Column],
                       subKey: Column, subShards: Int,
                       maxShardRows: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(subShards >= 1, "subShards must be positive")
    require(maxShardRows >= 0, "maxShardRows must be non-negative (0 = no guard)")
    if (maxShardRows > 0) guardShardSizes(docs, groupCol, subShards, maxShardRows)
    val reserved = Seq("__cum", "__sub", "pack_tokens", "pack_id")
    val clash = docs.columns.filter(reserved.contains)
    require(clash.isEmpty, // silent withColumn overwrite = mixed-provenance output
      s"input already has ${clash.mkString(", ")} — rename before packing")
    // degenerate counts read as 0, explicitly: Spark's least() SKIPS nulls
    // (a null-token doc would silently clamp to the FULL budget, consume a
    // whole pack, and shift every later boundary in its shard — and
    // DuckDB's least(NULL, b) is NULL, an engine divergence on top), and
    // legacy non-ANSI size(null_array) is -1, which would DECREASE the
    // running total and corrupt every later pack id
    val clamped = least(
      greatest(coalesce(col(tokenCol).cast(LongType), lit(0L)), lit(0L)),
      lit(budget))
    if (subShards == 1) {
      val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
      docs
        .withColumn("__cum", sum(clamped).over(w))
        .withColumn("pack_tokens", clamped)
        .withColumn("pack_id",
          floor((col("__cum") - col("pack_tokens")) / budget).cast(LongType))
        .drop("__cum")
    } else {
      // 60-bit md5 prefix mod subShards — the library's deterministic
      // fraction contract; ":shard" salts it apart from shuffleSeed keys
      val sub = pmod(conv(substring(md5(concat_ws(":", subKey, lit("shard"))),
        1, 15), 16, 10).cast(LongType), lit(subShards.toLong))
      val w = Window.partitionBy(col(groupCol), col("__sub")).orderBy(order: _*)
      docs
        .withColumn("__sub", sub)
        .withColumn("__cum", sum(clamped).over(w))
        .withColumn("pack_tokens", clamped)
        .withColumn("pack_id",
          (floor((col("__cum") - col("pack_tokens")) / budget).cast(LongType)
            * subShards + col("__sub")).cast(LongType))
        .drop("__cum", "__sub")
    }
  }

  /** Pack-level summary: docs per pack and token fill (utilization). */
  def packStats(packed: DataFrame, groupCol: String): DataFrame =
    packed.groupBy(col(groupCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("pack_tokens")).as("tokens"))

  /** The final hop from packed docs to TENSOR-READY training rows: one
    * row per (shard, pack) with the member documents' token arrays
    * concatenated in pack order, the member ids, and each document's
    * START offset into the concatenation — what an attention mask /
    * cross-doc-masking loader consumes. `truncate` clips the straddling
    * tail at `budget` (the boundary-aligned window lets a pack overflow
    * by less than its last doc; a training sequence is ≤ budget long).
    *
    * `idsCol` is any array column (token ids from `Bpe.tokenizeIds`,
    * subword strings, …); offsets count ITS elements, so feed the same
    * tokenization the packing budget was denominated in.
    *
    * Scale shape: ONE groupBy (shard, pack) whose collect_list state is
    * bounded by the pack budget (≤ 2*budget − 1 tokens by the packing
    * invariant) — never corpus-sized; ordering is per-pack sort_array,
    * no window, no global sort.
    */
  def toTrainingRows(packed: DataFrame, idsCol: String, groupCol: String,
                     idCol: String, budget: Long,
                     truncate: Boolean = true,
                     shuffleSeed: Option[Long] = None): DataFrame = {
    require(budget > 0 && budget <= Int.MaxValue, "budget must fit in Int")
    // pack order must REPLAY the order `sequences` streamed the shard in:
    // pass the SAME shuffleSeed the packing used, or id order (the
    // default) silently un-shuffles the packs and truncates the wrong
    // tail doc — the md5 key is prepended to the sort struct so
    // sort_array reproduces the seeded stream exactly
    val sorted = shuffleSeed match {
      case Some(seed) =>
        sort_array(collect_list(struct(
          md5(concat_ws(":", col(idCol).cast("string"), lit(seed.toString)))
            .as("o"),
          col(idCol).as("k"),
          coalesce(col(idsCol), array()).as("ids"))))
      case None =>
        sort_array(collect_list(struct(col(idCol).as("k"),
          coalesce(col(idsCol), array()).as("ids"))))
    }
    val agg = packed.groupBy(col(groupCol), col("pack_id"))
      .agg(sorted.as("__docs"))
    val lens = transform(col("__docs"), d => size(d.getField("ids")).cast(LongType))
    // exclusive running total of member lengths; n+1 elements, last = total
    val starts = aggregate(lens, array(lit(0L)),
      (acc, n) => concat(acc, array(element_at(acc, -1) + n)))
    val ids0 = flatten(transform(col("__docs"), d => d.getField("ids")))
    agg
      .withColumn("doc_ids", transform(col("__docs"), d => d.getField("k")))
      .withColumn("__starts", starts)
      .withColumn("doc_starts",
        slice(col("__starts"), lit(1), size(col("__docs"))))
      .withColumn("n_docs", size(col("__docs")).cast(LongType))
      .withColumn("input_ids",
        if (truncate) slice(ids0, 1, budget.toInt) else ids0)
      .withColumn("n_tokens", size(col("input_ids")).cast(LongType))
      .drop("__docs", "__starts")
  }
}
