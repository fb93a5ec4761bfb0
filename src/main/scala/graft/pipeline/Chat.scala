package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Multi-turn chat / instruction data preparation: render a turns table
 * into role-tagged training documents with EXACT per-turn loss-mask
 * intervals, and tile those documents into fixed training windows.
 *
 * The single-prefix SFT layout ([[Sampling.packMaskedSequences]]) models
 * one (prompt, response) pair per example — the mask is "first
 * `prompt_len` tokens train nothing". Multi-turn chat needs more: a
 * conversation interleaves user/system/assistant turns and ONLY the
 * assistant turns carry loss, so a document's mask is a LIST of
 * intervals, one per assistant turn. [[renderConversations]] produces
 * that list together with the rendered text, and
 * [[packMaskedIntervals]] generalizes the fragment tiling to clip every
 * interval into sequence coordinates.
 *
 * Everything is exact integer arithmetic over whitespace tokens
 * (`<|role|>` headers are single tokens by construction), so the whole
 * path — rendering, offsets, tiling, clipping — replays bit-for-bit in
 * ANSI SQL; the `chat_sft_pack` oracle does exactly that.
 *
 * Scale shape: one shuffle by conversation id for the ordered rebuild
 * (per-group state is one conversation — bounded), then
 * [[Sampling.packMaskedSequences]]'s two-pass prefix sum + bounded
 * per-row explode. No corpus-wide window, no driver state; interval
 * lists are bounded by turns-per-conversation.
 */
object Chat {

  /**
   * Render role-tagged conversations: one output row per conversation,
   * turns concatenated in `turnIdxCol` order, each prefixed by a
   * `<|role|>` header token. Output:
   *
   *  - `conv_id` — the conversation key;
   *  - `text` — the rendered document (`<|user|> hi <|assistant|> hello`);
   *  - `n_tokens` — its exact whitespace token count
   *    (sum of per-turn tokens + one header each);
   *  - `loss_ivs` — `array<struct<off, len>>`: for each `lossRole` turn,
   *    the [off, off+len) interval of its CONTENT tokens in document
   *    coordinates (the header token itself trains nothing), ascending,
   *    non-overlapping, possibly empty (`len = 0` for an empty turn is
   *    dropped).
   *
   * A duplicate `turnIdxCol` within a conversation would silently
   * interleave two turns — the rebuild fails fast instead.
   */
  def renderConversations(
      turns: DataFrame,
      convIdCol: String,
      turnIdxCol: String,
      roleCol: String,
      textCol: String,
      lossRole: String = "assistant"): DataFrame = {
    require(lossRole.nonEmpty, "lossRole must be non-empty")
    require(!lossRole.contains("'"), s"lossRole must not contain quotes: $lossRole")
    val t = turns.select(
      col(convIdCol).as("conv_id"),
      col(turnIdxCol).cast("long").as("__graft_ti"),
      col(roleCol).as("__graft_role"),
      // the whitespace tokenizer yields [""] on empty text — filter it so
      // an empty turn renders as a bare header with no content interval
      filter(TextAnalysis.tokens(col(textCol)), t => t =!= lit(""))
        .as("__graft_toks"))
    t.groupBy(col("conv_id"))
      .agg(sort_array(collect_list(struct(
        col("__graft_ti"), col("__graft_role"), col("__graft_toks")))).as("__graft_ts"))
      .withColumn("__graft_ts", expr(
        """CASE WHEN size(__graft_ts) =
          |       size(array_distinct(transform(__graft_ts, x -> x.__graft_ti)))
          |  THEN __graft_ts
          |  ELSE raise_error(CONCAT('renderConversations: duplicate turn index in conversation ',
          |                          CAST(conv_id AS STRING)))
          |END""".stripMargin))
      .select(
        col("conv_id"),
        expr(
          """array_join(
            |  flatten(transform(__graft_ts, x ->
            |    concat(array(concat('<|', x.__graft_role, '|>')), x.__graft_toks))),
            |  ' ')""".stripMargin).as("text"),
        expr(
          """aggregate(__graft_ts, 0L,
            |  (a, x) -> a + size(x.__graft_toks) + 1L)""".stripMargin).as("n_tokens"),
        expr(
          s"""aggregate(__graft_ts,
             |  named_struct('pos', 0L,
             |               'ivs', CAST(array() AS ARRAY<STRUCT<off: BIGINT, len: BIGINT>>)),
             |  (a, x) -> named_struct(
             |    'pos', a.pos + size(x.__graft_toks) + 1L,
             |    'ivs', IF(x.__graft_role = '$lossRole' AND size(x.__graft_toks) > 0,
             |              array_append(a.ivs,
             |                named_struct('off', a.pos + 1L,
             |                             'len', CAST(size(x.__graft_toks) AS BIGINT))),
             |              a.ivs)),
             |  a -> a.ivs)""".stripMargin).as("loss_ivs"))
  }

  /**
   * [[Sampling.packMaskedSequences]] generalized to per-document interval
   * masks: tile the `totalLenCol` token stream into `seqLen` windows
   * (same global two-pass prefix sum + bounded fragment explode) and clip
   * each document's `intervalsCol` (`array<struct<off, len>>`, ascending
   * non-overlapping, in document coordinates) into each fragment. Per
   * fragment emits `loss_ivs`: the overlapping intervals re-based to
   * SEQUENCE coordinates — a training job ORs a sequence's fragment
   * interval lists into its loss mask; every masked token of every
   * document lands in exactly one interval.
   *
   * Malformed interval lists (negative length, out of [0, total_len),
   * overlapping or out of order) raise per-row rather than producing a
   * silently wrong mask.
   */
  def packMaskedIntervals(
      df: DataFrame,
      idCol: String,
      intervalsCol: String,
      totalLenCol: String,
      seqLen: Long): DataFrame =
    packMaskedIntervalsFrom(df, idCol, intervalsCol, totalLenCol, seqLen, 0L)

  /** [[packMaskedIntervals]] with the token stream starting at
    * `startOffset` — the incremental-ingest hook (the
    * [[Sampling.packMaskedSequencesFrom]] contract): a batch of NEW
    * conversations appended to a stream whose committed length is
    * `startOffset` lays out exactly as it would have in one global run,
    * because window coordinates are pure functions of the GLOBAL stream
    * position. */
  private[graft] def packMaskedIntervalsFrom(
      df: DataFrame,
      idCol: String,
      intervalsCol: String,
      totalLenCol: String,
      seqLen: Long,
      startOffset: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    // the doc-coordinate interval column is CONSUMED (replaced by the
    // clipped sequence-coordinate `loss_ivs`), so intervalsCol may itself
    // be named loss_ivs — renderConversations' output feeds in directly
    require(intervalsCol == "loss_ivs" || !df.columns.contains("loss_ivs"),
      "input already has a 'loss_ivs' column; rename it — " +
        "packMaskedIntervals emits the clipped intervals as loss_ivs")
    require(!df.columns.contains("__graft_p0"),
      "input already has a '__graft_p0' column; rename it — " +
        "packMaskedIntervals uses it internally")
    val w = s"COALESCE(CAST(`$totalLenCol` AS BIGINT), 0L)"
    val checked = df.withColumn(intervalsCol, expr(
      s"""IF(aggregate(`$intervalsCol`,
         |       named_struct('prev', 0L, 'ok', TRUE),
         |       (a, iv) -> named_struct(
         |         'prev', iv.off + iv.len,
         |         'ok', a.ok AND iv.len >= 0 AND iv.off >= a.prev),
         |       a -> a.ok AND a.prev <= $w),
         |   `$intervalsCol`,
         |   raise_error(CONCAT('packMaskedIntervals: intervals of ',
         |     CAST(`$idCol` AS STRING),
         |     ' must be ascending, non-overlapping and within [0, total_len)')))""".stripMargin))
    Sampling.packMaskedSequencesFrom(
        checked.withColumn("__graft_p0", lit(0L)),
        idCol, "__graft_p0", totalLenCol, seqLen, startOffset)
      .drop("__graft_p0", "loss_off", "loss_len")
      .withColumn("loss_ivs", expr(
        s"""transform(
           |  filter(`$intervalsCol`, iv ->
           |    iv.off < frag_start + frag_len AND iv.off + iv.len > frag_start),
           |  iv -> named_struct(
           |    'loss_off', seq_off + GREATEST(iv.off, frag_start) - frag_start,
           |    'loss_len', LEAST(iv.off + iv.len, frag_start + frag_len)
           |                - GREATEST(iv.off, frag_start)))""".stripMargin))
      .drop(Seq(intervalsCol).filter(_ != "loss_ivs"): _*)
  }

  /**
   * The materialized chat deliverable — [[Sampling.packMaskedTokenIds]]
   * with interval masks: documents as token-id arrays with
   * `intervalsCol` loss intervals (`array<struct<off, len>>` in document
   * token coordinates, e.g. [[renderConversations]]' `loss_ivs` over the
   * ids of the rendered text), packed into fixed `seqLen` windows of
   * `input_ids` + `doc_starts` + `loss_intervals` (in-window
   * coordinates, stream-ordered, non-overlapping — the loader ORs them
   * into the loss mask). The schema is IDENTICAL to
   * [[Sampling.packMaskedTokenIds]]'s, so everything downstream —
   * shard export, the streaming store, readers — consumes either
   * interchangeably. Same scale shape: one prefix sum, bounded explode,
   * one hash agg by window.
   */
  def packTokenIds(
      docs: DataFrame,
      idCol: String,
      idsCol: String,
      intervalsCol: String,
      seqLen: Long): DataFrame =
    packTokenIdsFrom(docs, idCol, idsCol, intervalsCol, seqLen, 0L)
      .drop("row_base")

  /** [[packTokenIds]] for an APPEND batch starting at global stream
    * token `startOffset` — the [[Sampling.packMaskedTokenIdsFrom]]
    * contract, interval edition: adds `row_base` for windows a previous
    * batch left partial. [[graft.streaming.ShardStreaming]] drives it
    * per micro-batch. */
  private[graft] def packTokenIdsFrom(
      docs: DataFrame,
      idCol: String,
      idsCol: String,
      intervalsCol: String,
      seqLen: Long,
      startOffset: Long): DataFrame = {
    require(seqLen > 0 && seqLen <= Int.MaxValue,
      s"seqLen must be in (0, 2^31) (array slices are Int-indexed; " +
        s"per-DOCUMENT token counts share the same 2^31 bound), got $seqLen")
    Seq("__graft_ids", "__graft_n", "__graft_sorted").foreach { c =>
      require(!docs.columns.contains(c),
        s"input already has a '$c' column; rename it — packTokenIds uses it internally")
    }
    val d = docs.select(col(idCol), col(intervalsCol),
        col(idsCol).cast("array<long>").as("__graft_ids"))
      .withColumn("__graft_n", size(col("__graft_ids")).cast("long"))
    packMaskedIntervalsFrom(d, idCol, intervalsCol, "__graft_n", seqLen,
        startOffset)
      .select(col(idCol).as("__graft_id"), col("seq_id"),
        slice(col("__graft_ids"),
          (col("frag_start") + lit(1)).cast("int"),
          col("frag_len").cast("int")).as("__graft_frag"),
        col("frag_start"), col("seq_off"), col("loss_ivs"))
      .groupBy(col("seq_id"))
      .agg(
        array_sort(collect_list(struct(
          col("__graft_id").as("__i"),
          col("__graft_frag").as("__ids"),
          col("frag_start").as("__fs"),
          col("seq_off").as("__so"),
          col("loss_ivs").as("__ivs")))).as("__graft_sorted"))
      .select(col("seq_id"),
        expr("element_at(__graft_sorted, 1).__so").as("row_base"),
        expr("CAST(aggregate(__graft_sorted, 0L, (n, s) -> n + size(s.__ids)) AS BIGINT)")
          .as("n_tokens"),
        flatten(transform(col("__graft_sorted"), s => s.getField("__ids")))
          .as("input_ids"),
        expr("""aggregate(__graft_sorted,
          |  named_struct('off', element_at(__graft_sorted, 1).__so,
          |               'starts', CAST(array() AS ARRAY<BIGINT>)),
          |  (acc, s) -> named_struct(
          |    'off', acc.off + CAST(size(s.__ids) AS BIGINT),
          |    'starts', IF(s.__fs = 0L, array_append(acc.starts, acc.off),
          |                 acc.starts)),
          |  acc -> acc.starts)""".stripMargin).as("doc_starts"),
        // fragments sort in stream order and each fragment's clipped
        // list is ascending, so the flattened list IS the window's
        // interval order (clipping never emits empty intervals)
        flatten(transform(col("__graft_sorted"), s => s.getField("__ivs")))
          .as("loss_intervals"))
  }
}
