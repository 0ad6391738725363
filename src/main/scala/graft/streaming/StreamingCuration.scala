package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.{PiiOps, TextOps}

/** Structured-Streaming form of the training-data curation pipeline — the
  * shape an INGESTION deployment of this library runs: documents arrive
  * as a stream (crawl output, firehose, backfill), pass the stateless
  * gates micro-batch by micro-batch, and exact-dedup against everything
  * already accepted. Near-dup (MinHash/SimHash) stays a batch compaction
  * job by design: banding needs corpus-wide candidate joins that keyed
  * streaming state cannot express without a shuffle per band per batch.
  *
  * Batch parity is structural, not re-implemented: the gates are the SAME
  * `Column` expressions the batch funnel uses, and Spark executes
  * `flatMapGroupsWithState` over a bounded Dataset with transient state,
  * where first-arrival-wins collapses to min-id per fingerprint — exactly
  * [[graft.ops.DedupOps.dedupedCorpus]]. One code path, two execution
  * modes (StreamingCurationSpec asserts both).
  *
  * Scale shape: gates are scan-local codegen (no state, no shuffle);
  * dedup state is one boolean per distinct fingerprint, hash-partitioned
  * by the state store across executors (RocksDB-backed in production), so
  * state size is O(distinct docs)/cluster with no driver footprint; the
  * optional `ttl` bounds it to a dedup window via processing-time
  * eviction. The approximate O(2.4 B/key) alternative — a per-partition
  * cuckoo filter in `GroupState` — is already in tree for frontier
  * admission ([[StreamingFrontier.admitStream]]); curation keeps the
  * exact form because a false positive here silently DROPS a unique
  * training document, which no throughput win justifies.
  */
object StreamingCuration {

  case class CurationDoc(doc_id: Long, text: String)
  case class FpDoc(doc_id: Long, text: String, fp: String)

  /** Stateless gates, identical expressions to the batch funnel's
    * language/quality steps plus the PII scrub applied to survivors:
    * keep docs whose [[TextOps.langIdCol]] is `wantLang` and whose
    * stopword ratio is at least `minStopMill` mills, then redact
    * emails/IPv4/phones ([[PiiOps.redactPii]]). Gates read the ORIGINAL
    * text (a scrub tag is not a stopword); the emitted text is scrubbed.
    */
  def gateStream(docs: DataFrame, idCol: String, textCol: String,
      wantLang: String = "en", minStopMill: Long = 60): DataFrame =
    docs
      // fused form of the two-filter conjunction (r6) — exactly
      // equivalent (see [[TextOps.langStopGate]]), one tokenize per row
      .where(TextOps.langStopGate(col(textCol), wantLang, minStopMill))
      .select(col(idCol), PiiOps.redactPii(col(textCol)).as(textCol))

  /** Stateful exact dedup, first-arrival-wins over the scrubbed-text
    * fingerprint ([[TextOps.normFingerprint]]): within a micro-batch the
    * min-id copy survives (deterministic tiebreak — iterator order inside
    * a group is not a contract); across micro-batches every later copy is
    * suppressed by the per-fingerprint state.
    *
    * `ttl` is a REQUIRED choice (no default), because it is the state-size
    * policy of the deployment: `Some(duration)` bounds the store to a
    * sliding dedup window (state evicts after the duration — one boolean
    * per fingerprint seen within the window); `None` is exact dedup
    * forever, state growing O(distinct fingerprints) for the life of the
    * query — correct for bounded backfills, an eventual OOM of the state
    * store on an unbounded ingest unless the dedup horizon is handed off
    * to the batch compaction job ([[compactToTable]]). Sizing rule of
    * thumb: a fingerprint entry costs ~100 B in the store, so a 10⁹-doc
    * window is ~100 GB of state cluster-wide — pick the TTL that keeps
    * (ingest rate × window) inside the state backend's budget.
    */
  def dedupStream(docs: Dataset[CurationDoc],
      ttl: Option[String]): Dataset[CurationDoc] = {
    import docs.sparkSession.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    docs
      .withColumn("fp", TextOps.normFingerprint(col("text")))
      .as[FpDoc]
      .groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (_: String, it: Iterator[FpDoc], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) Iterator.empty
          else {
            state.update(true)
            ttl.foreach(state.setTimeoutDuration)
            val first = it.minBy(_.doc_id)
            Iterator.single(CurationDoc(first.doc_id, first.text))
          }
      }
  }

  /** The composed streaming funnel: gates → scrub → exact dedup as one
    * plan. Works identically over a bounded Dataset (the q50 oracle path).
    * `ttl` is the required state-size policy — see [[dedupStream]].
    */
  def curateStream(docs: Dataset[CurationDoc], ttl: Option[String],
      wantLang: String = "en", minStopMill: Long = 60): Dataset[CurationDoc] = {
    import docs.sparkSession.implicits._
    dedupStream(
      gateStream(docs.toDF(), "doc_id", "text", wantLang, minStopMill)
        .as[CurationDoc],
      ttl)
  }

  /** The batch hand-off this object's doc promises: compact the
    * streamed-accepted table with the corpus-wide curation stages keyed
    * streaming state cannot express (benchmark holdout, decontamination,
    * near-dup representative collapse —
    * [[graft.ops.CurationOps.compactAccepted]]), MERGE-committing the
    * curated snapshot into `out`. Idempotent per run (MERGE keyed by the
    * id), so a scheduled compaction re-running over a grown accepted
    * table supersedes prior snapshots per key. Returns the committed
    * version, or None when the accepted table is still empty.
    */
  def compactToTable(accepted: graft.tables.SnapTable, rawCorpus: DataFrame,
      out: graft.tables.SnapTable, idCol: String, textCol: String,
      benchMod: Int = 97, shingleK: Int = 3): Option[Int] =
    accepted.read().map { acc =>
      out.mergeCommit(graft.ops.CurationOps.compactAccepted(
        acc, rawCorpus, idCol, textCol, benchMod, shingleK))
    }

  /** Streaming vocabulary ledger — [[graft.ops.TrainPrepOps]]'s additive
    * count monoid wired to the stream: from `foreachBatch`, fold each
    * micro-batch's token counts into a [[graft.tables.SnapTable]] ledger
    * keyed by token (schema `(token, cnt, batch_id)`).
    *
    * Replay-safe AND atomic in one table: every commit stamps all rows
    * with its `batchId`, so the ledger's `max(batch_id)` is the
    * high-water mark — a re-delivered micro-batch (Structured Streaming
    * re-executes a failed batch under the SAME id) compares ≤ hwm and is
    * skipped, returning None. Counts being additive-not-idempotent is
    * exactly why the guard exists; the hwm lives in the same MERGE
    * commit as the counts, so there is no two-table crash window.
    *
    * Scale shape: the delta count is one map-side-combinable hash agg;
    * the ledger merge is a union + hash agg on the lexicon-sized token
    * key (bucket the ledger by token at scale); the hwm read is an O(1)
    * max aggregate. Read the vocabulary with
    * [[graft.ops.TrainPrepOps.cutVocab]] over `read().select(token,cnt)`.
    */
  def vocabLedgerCommit(ledger: graft.tables.SnapTable, batch: DataFrame,
      textCol: String, batchId: Long): Option[Int] = {
    val spark = batch.sparkSession
    import spark.implicits._
    val cur = ledger.read()
    val hwm = cur.map(_.agg(max(col("batch_id"))).as[Long].head()).getOrElse(-1L)
    if (batchId <= hwm) None
    else {
      val delta = graft.ops.TrainPrepOps.vocabularyCounts(batch, textCol)
      val merged = cur match {
        case Some(c) => graft.ops.TrainPrepOps.mergeVocabCounts(
          c.select(col("token"), col("cnt")), delta)
        case None => delta
      }
      Some(ledger.mergeCommit(merged.withColumn("batch_id", lit(batchId))))
    }
  }

  /** Streaming NEAR-dup band ledger — [[graft.ops.DedupOps.bandLedger]]'s
    * set monoid wired to the stream: from `foreachBatch`, screen the
    * micro-batch against the accumulated corpus with
    * [[graft.ops.DedupOps.incrementalNearDup]] over `ledger.read()`, then
    * commit the batch's own band buckets here (SnapTable keyed by
    * `(band, bucket)`; schema `(band, bucket, batch_id)`).
    *
    * Unlike the vocab ledger's additive counts, a bucket SET is
    * idempotent — so only the DELTA is written (the SnapTable key
    * resolves re-asserted buckets at read time; the ledger never rewrites
    * itself), and the `max(batch_id)` high-water mark exists for
    * commit-count hygiene rather than correctness: a re-delivered batch
    * (same id after a failure) is skipped with None instead of stacking a
    * redundant delta per retry.
    *
    * Scale shape: the delta is one map-side-combined minima agg over the
    * day-sized batch + a distinct on the short (band, bucket) key; the
    * stored ledger is bucketed by the same key, so the read-time MERGE
    * and the screening probe co-locate; the hwm read is an O(1) max.
    */
  def bandLedgerCommit(ledger: graft.tables.SnapTable, batch: DataFrame,
      idCol: String, textCol: String, batchId: Long): Option[Int] = {
    val spark = batch.sparkSession
    import spark.implicits._
    val hwm = ledger.read()
      .map(_.agg(max(col("batch_id"))).as[Long].head()).getOrElse(-1L)
    if (batchId <= hwm) None
    else Some(ledger.mergeCommit(
      graft.ops.DedupOps.bandLedger(batch, idCol, textCol)
        .withColumn("batch_id", lit(batchId))))
  }
}
