package graft.stream

import graft.ops.ReviewGate
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** One review submission (reference event
  * `pull_request_review: submitted`, pr-review-flow.yml:3-5). `seq` is
  * the event-order key (submission sequence / event time): the
  * reference dedups by ARRIVAL order (`Map.set`,
  * pr-review-flow.yml:100-103); keying on `seq` instead makes the
  * result independent of batch boundaries and late delivery — our
  * engine's documented improvement over processing-time semantics. */
case class ReviewEvent(pr: Long, user: String, state: String, seq: Long)

/** Latest retained review per user. */
case class ReviewerLatest(state: String, seq: Long)

/** Keyed state: the per-PR map of latest reviews (the streaming twin
  * of the reference's per-event full recompute). */
case class PrState(reviews: Map[String, ReviewerLatest])

/** Emitted whenever a PR's review state changes: the current approver
  * set after latest-wins dedup + APPROVED filter (W1 + P6). */
case class ApproverUpdate(pr: Long, approvers: Seq[String], nReviews: Int)

/** Streaming review state machine (SURVEY §2.8; reference E3,
  * pr-review-flow.yml:60-227 re-expressed as Structured Streaming).
  *
  * The reference re-runs the whole gate pipeline on every review event
  * on a fresh runner; here `flatMapGroupsWithState` keeps the per-PR
  * latest-review map incremental — one state row per PR, O(events)
  * work per trigger instead of O(history).
  *
  * Semantics vs the reference, deliberately:
  *  - latest-wins per (pr, user) — NOT `dropDuplicates` (which keeps
  *    the FIRST occurrence and would freeze a user's initial verdict);
  *  - rollback works: a later CHANGES_REQUESTED *replaces* a prior
  *    APPROVED and the emitted approver set shrinks, so downstream
  *    labels are removed — fixing the reference's documented
  *    "labels are not restored on review rollback" gap
  *    (README.md:111-123);
  *  - out-of-order and duplicate deliveries are no-ops (stale `seq`
  *    is ignored), so replays are idempotent.
  *
  * Scale: state is keyed by PR and holds one small map per PR —
  * shuffles partition by `pr`, state store grows with open PRs, not
  * with event history.
  */
object ReviewStateMachine {

  /** Per-PR state transition: fold the batch's events in `seq` order,
    * keeping the per-user latest; emit an update only when the state
    * actually changed (downstream sinks see deltas, not heartbeats). */
  def updatePr(pr: Long, events: Iterator[ReviewEvent],
               state: GroupState[PrState]): Iterator[ApproverUpdate] = {
    val cur = state.getOption.getOrElse(PrState(Map.empty))
    val next = events.toSeq.sortBy(_.seq).foldLeft(cur) { (st, ev) =>
      st.reviews.get(ev.user) match {
        case Some(prev) if prev.seq >= ev.seq => st // stale or duplicate delivery
        case _ => PrState(st.reviews.updated(ev.user, ReviewerLatest(ev.state, ev.seq)))
      }
    }
    if (next == cur && state.exists) Iterator.empty
    else {
      state.update(next)
      val approvers = next.reviews.collect {
        case (user, r) if r.state.toUpperCase == "APPROVED" => user
      }.toSeq.sorted
      Iterator.single(ApproverUpdate(pr, approvers, next.reviews.size))
    }
  }

  /** The stateful core: review events → per-PR approver-set updates. */
  def approverUpdates(events: Dataset[ReviewEvent]): Dataset[ApproverUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.pr)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(updatePr)
  }

  /** Per-batch 3-stage status (E3 steps c-d): each stage's required
    * teams must all have an approving active member
    * (ReviewGate.stageGate = J4 + A4/A5). `required*`: (pr, team);
    * `membership`: (team, user). Only PRs present in `updates` are
    * evaluated.
    *
    * A touched PR with ZERO required teams for a stage passes that
    * stage vacuously — the reference's `results.every(Boolean)` over
    * an empty team list is `true` (pr-review-flow.yml:190-211), e.g. a
    * docs-only PR whose files match no CODEFACILITATORS pattern needs
    * no facilitator review. Such PRs are absent from the stage-gate
    * aggregation (no required rows to group), hence the `true` fill. */
  def fullStatus(updates: DataFrame, requiredCodeowners: DataFrame,
                 requiredFacilitators: DataFrame, requiredTech: DataFrame,
                 membership: DataFrame): DataFrame = {
    val touched = updates.select(col("pr")).distinct()
    val approvers = updates.select(col("pr"), explode_outer(col("approvers")).as("user"))
    def stage(required: DataFrame, name: String): DataFrame =
      ReviewGate.stageGate(required.join(touched, Seq("pr")), membership, approvers)
        .withColumnRenamed("stage_approved", name)
    touched
      .join(stage(requiredCodeowners, "codeowners_approved"), Seq("pr"), "left")
      .join(stage(requiredFacilitators, "facilitators_approved"), Seq("pr"), "left")
      .join(stage(requiredTech, "tech_approved"), Seq("pr"), "left")
      .na.fill(true)
  }

  /** K4/K5 side-effect target standing in for the GitHub label /
    * reviewer-request API: adds are no-ops when present, removes are
    * tolerated-if-absent (pr-review-flow.yml:254-264, 277-287), so
    * replayed batches are idempotent. */
  class LabelStore extends Serializable {
    private val labels = scala.collection.concurrent.TrieMap.empty[(Long, String), Unit]
    def apply(pr: Long, op: String, label: String): Unit = op match {
      case "add"    => labels.put((pr, label), ()); ()
      case "remove" => labels.remove((pr, label)); ()
      case other    => throw new IllegalArgumentException(s"unknown label op: $other")
    }
    def current: Set[(Long, String)] = labels.keySet.toSet
    def asDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      val rows = current.toSeq.sorted
      if (rows.isEmpty) Seq.empty[(Long, String)].toDF("pr", "label")
      else rows.toDF("pr", "label")
    }
  }

  /** End-to-end pipeline (E3): events → stateful dedup/gate →
    * foreachBatch label sink. Each micro-batch recomputes stage status
    * for the touched PRs only, diffs against the store's current
    * labels (ReviewGate.labelOps emits only deltas) and applies them.
    * The final `collect` is the side-effect boundary — label deltas
    * per batch are O(changed PRs), the reference's own API-call
    * granularity. */
  def run(events: Dataset[ReviewEvent],
          requiredCodeowners: DataFrame, requiredFacilitators: DataFrame,
          requiredTech: DataFrame, membership: DataFrame,
          store: LabelStore, checkpointDir: String,
          requests: LabelStore = new LabelStore): StreamingQuery = {
    val spark = events.sparkSession
    approverUpdates(events).writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[ApproverUpdate], _: Long) =>
        val updates = batch.toDF()
        if (!updates.isEmpty) {
          val status = fullStatus(updates, requiredCodeowners,
            requiredFacilitators, requiredTech, membership).persist()
          // diff only the touched PRs: labelOps treats absence from
          // `desired` as "remove", so the current-label side must be
          // scoped to this batch's PRs or untouched PRs would be wiped.
          val current = store.asDF(spark)
            .join(updates.select(col("pr")).distinct(), Seq("pr"), "left_semi")
          val ops = ReviewGate.labelOps(status, current)
          ops.orderBy(col("pr"), col("op"), col("label")).collect().foreach { r =>
            store(r.getLong(0), r.getString(1), r.getString(2))
          }
          // K5: reviewer-request fan-out for PRs entering a stage
          // (idempotent add-only target set)
          ReviewGate.reviewerRequests(status).collect().foreach { r =>
            requests(r.getLong(0), "add", r.getString(1))
          }
          status.unpersist()
          ()
        }
      }
      .start()
  }
}
