package graft

import graft.stream._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.TestGroupState

/** Golden transitions for the streaming review state machine
  * (SURVEY §2.8), including the rollback case the reference documents
  * as broken (README.md:111-123) and permuted/stale arrival. */
class ReviewStateMachineSpec extends SparkSpec {

  test("updatePr: latest wins per user, stale seq ignored, no-change emits nothing") {
    def step(st: Option[PrState], evs: ReviewEvent*): (Seq[ApproverUpdate], Option[PrState]) = {
      import org.apache.spark.api.java.Optional
      val gs = TestGroupState.create[PrState](
        st.map(Optional.of[PrState]).getOrElse(Optional.empty[PrState]()),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
        0L, Optional.empty[java.lang.Long]().asInstanceOf[Optional[Long]], hasTimedOut = false)
      val out = ReviewStateMachine.updatePr(1L, evs.iterator, gs).toSeq
      (out, gs.getOption)
    }
    // first event: approved
    val (o1, s1) = step(None, ReviewEvent(1, "alice", "APPROVED", 1))
    assert(o1 == Seq(ApproverUpdate(1, Seq("alice"), 1)))
    // rollback replaces the approval (latest wins, NOT first-wins)
    val (o2, s2) = step(s1, ReviewEvent(1, "alice", "CHANGES_REQUESTED", 2))
    assert(o2 == Seq(ApproverUpdate(1, Seq(), 1)))
    // stale re-delivery of the old approval is a no-op
    val (o3, s3) = step(s2, ReviewEvent(1, "alice", "APPROVED", 1))
    assert(o3.isEmpty && s3 == s2)
    // permuted batch folds in seq order: final verdict is seq=5
    val (o4, _) = step(s3,
      ReviewEvent(1, "alice", "APPROVED", 5), ReviewEvent(1, "alice", "CHANGES_REQUESTED", 3))
    assert(o4 == Seq(ApproverUpdate(1, Seq("alice"), 1)))
  }

  test("end-to-end: stage gates + idempotent label sink + rollback removes labels") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val reqCode = Seq((1L, "team_a"), (1L, "team_b")).toDF("pr", "team")
    val reqFac  = Seq((1L, "team_f")).toDF("pr", "team")
    val reqTech = Seq((1L, "team_t")).toDF("pr", "team")
    val membership = Seq(("team_a", "alice"), ("team_b", "bob"),
      ("team_f", "frank"), ("team_t", "tina")).toDF("team", "user")

    val events = MemoryStream[ReviewEvent]
    val store = new ReviewStateMachine.LabelStore
    val requests = new ReviewStateMachine.LabelStore
    val ckpt = java.nio.file.Files.createTempDirectory("rsm-ckpt").toString
    val q = ReviewStateMachine.run(events.toDS(), reqCode, reqFac, reqTech,
      membership, store, ckpt, requests)
    try {
      // alice alone: codeowners still needs team_b → no stage green yet
      events.addData(ReviewEvent(1, "alice", "APPROVED", 1),
        ReviewEvent(1, "bob", "COMMENTED", 2))
      q.processAllAvailable()
      assert(store.current.isEmpty && requests.current.isEmpty)

      // bob approves: codeowners green → facilitators stage opens (K5)
      events.addData(ReviewEvent(1, "bob", "APPROVED", 3))
      q.processAllAvailable()
      assert(store.current == Set((1L, "codeowners-approved")))
      assert(requests.current == Set((1L, "facilitators")))

      // frank (facilitator) approves → tech stage opens
      events.addData(ReviewEvent(1, "frank", "APPROVED", 4))
      q.processAllAvailable()
      assert(store.current == Set((1L, "codeowners-approved"),
        (1L, "facilitators-approved")))
      assert(requests.current == Set((1L, "facilitators"), (1L, "tech-team")))

      // tina (tech) approves: all three stages green
      events.addData(ReviewEvent(1, "tina", "APPROVED", 5))
      q.processAllAvailable()
      assert(store.current == Set((1L, "codeowners-approved"),
        (1L, "facilitators-approved"), (1L, "tech-approved")))

      // ROLLBACK: alice requests changes — codeowners label removed
      // (the reference's documented gap, fixed here)
      events.addData(ReviewEvent(1, "alice", "CHANGES_REQUESTED", 6))
      q.processAllAvailable()
      assert(store.current == Set((1L, "facilitators-approved"), (1L, "tech-approved")))

      // stale duplicate of the old approval: no state change, no ops
      events.addData(ReviewEvent(1, "alice", "APPROVED", 1))
      q.processAllAvailable()
      assert(store.current == Set((1L, "facilitators-approved"), (1L, "tech-approved")))
    } finally q.stop()
  }

  test("labelOps application is idempotent (remove tolerated if absent)") {
    val store = new ReviewStateMachine.LabelStore
    store(1, "add", "x"); store(1, "add", "x")
    assert(store.current == Set((1L, "x")))
    store(1, "remove", "x"); store(1, "remove", "x")
    assert(store.current.isEmpty)
  }
}
