package graft

/** Automated form of PLANS.md's core claims, over EVERY SparkEntry
  * query at sf0.001: no CartesianProduct anywhere, and the only
  * BroadcastNestedLoopJoin is q16's owners glob theta join (whose
  * build side is a config-file-sized pattern table by construction).
  * Catches a silently-degenerated join (e.g. a lost equi-condition
  * after a refactor) at spec time instead of at the bench. */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // the INTENTIONAL BroadcastNestedLoopJoins: q16's owners glob
  // theta join (build side = a config-file-sized pattern table),
  // q45's brute-force cosine baseline (definitionally all-pairs on
  // the query side; build side = the query set), q48's global-T
  // attach (build side = ONE row, the min over per-source supply),
  // and q74's totals attach (build side = ONE row, Σwq + n_total —
  // the same global-scalar shape as q48). q77/q78 are the PQ ADC
  // serve — the q45 shape with the probe batch (carrying its lookup
  // arrays) as the broadcast build side; ADC is definitionally a
  // scan of all codes per probe — and q80 is the same serve at the
  // kFor-derived K. Everything else must keep an equi-key.
  // q81 is the SQ8 serve — the same definitional codes-scan-per-probe
  // shape (broadcast build side = the probe batch). q83's STAGE 1 is
  // the q77 ADC scan (allowed); its refine stage must stay equi (the
  // dedicated test below pins it).
  // q91 is the q77 ADC serve over the permuted relation — the same
  // definitional codes-scan-per-probe shape.
  // q98 is q83 at the kFor/rFor production sizing — the same one
  // stage-1 ADC scan (the dedicated q98 test pins the count).
  private val BnljAllowed =
    Set("q16_owners_glob_join", "q45_brute_topk", "q48_source_mix",
      "q74_temperature_mix", "q77_pq_topk", "q78_knn_classify",
      "q80_pq_scaled", "q81_sq8_topk", "q83_pq_refine", "q91_pq_balanced",
      "q98_refine_scaled")

  test("no CartesianProduct in any query plan; BNLJ only where all-pairs IS the operator") {
    assume(new java.io.File(dir).isDirectory, "testdata not present")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      if (!BnljAllowed(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin (non-equi join leaked in?)")
      graft.ops.Caches.releaseAll(spark)
    }
  }

  test("q83 refine stage is candidate-sized: one ADC all-pairs scan, equi-joined refine") {
    // the two-stage claim made auditable: stage 1 (ADC candidate
    // generation) is the ONE BroadcastNestedLoopJoin — the refine
    // must re-score candidates through broadcast EQUI-joins, never a
    // second all-pairs pass over (corpus × probes)
    assume(new java.io.File(dir).isDirectory, "testdata not present")
    val plan = graft.ops.Pq.pqRefineTopK(spark, dir)
      .queryExecution.executedPlan.toString
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj == 1, s"q83 must have exactly the stage-1 ADC BNLJ, found $bnlj:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"q83's refine joins must be broadcast equi-joins:\n$plan")
    graft.ops.Caches.releaseAll(spark)
  }

  test("q98 production-sized refine keeps q83's plan shape: one ADC scan, equi-joined refine") {
    // the kFor/rFor sizing must change DIALS, not the plan: larger
    // codebooks ride the O(1)-plan-size fused expressions, the larger
    // candidate budget only widens the broadcast build side
    assume(new java.io.File(dir).isDirectory, "testdata not present")
    val plan = graft.ops.Pq.pqRefineScaled(spark, dir)
      .queryExecution.executedPlan.toString
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj == 1, s"q98 must have exactly the stage-1 ADC BNLJ, found $bnlj:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"q98's refine joins must be broadcast equi-joins:\n$plan")
    graft.ops.Caches.releaseAll(spark)
  }

  test("q85 is FULLY routed: no all-pairs join anywhere, probed-cell filter on BOTH tiers") {
    // the composition's 100 TB claim made auditable: unlike q83
    // (whose stage 1 is the definitional full-codes ADC scan), q85's
    // candidate generation is the ROUTED q79 serve — so the whole
    // two-stage plan must carry ZERO BroadcastNestedLoopJoins, only
    // broadcast equi-joins, and the static probed-cell IN filter must
    // appear on BOTH compressed tiers (the 4 B/vec ADC codes scan AND
    // the 64 B/vec SQ8 refine scan) so a partitioned-by-cell layout
    // prunes both at listing time (StorageSpec proves the behavior).
    assume(new java.io.File(dir).isDirectory, "testdata not present")
    val plan = graft.ops.Sq.ivfPqSq8RefineTopK(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"q85 must not plan any all-pairs join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"q85 plans a cartesian:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"q85's joins must be broadcast equi-joins:\n$plan")
    // two DISTINCT cell attribute ids, not two occurrences: one
    // tier's predicate can print twice (a Filter node + the same set
    // echoed in PushedFilters, or an AQE initial+final render), so a
    // raw count of 2 would pass with the other tier's filter regressed
    val cellIn = "cell#(\\d+)L? (IN|INSET)".r.findAllMatchIn(plan).map(_.group(1)).toSet
    assert(cellIn.size >= 2,
      s"q85 must filter BOTH tiers by the probed-cell set (probed-cell filters only on attribute ids $cellIn):\n$plan")
    graft.ops.Caches.releaseAll(spark)
  }

  test("q86 selector rides the scans: probed-cell IN filter AND the label predicate, no all-pairs join") {
    // filtered search's 100 TB claim: the selector must NOT widen the
    // serve into a corpus pass — the plan keeps q82's routed shape
    // (probed-cell static IN filter, broadcast equi-joins only) and
    // the label predicate appears as a plain Filter over the tier
    // columns (Catalyst pushes it below the cell equi-join; on a
    // persisted payload-attached tier it reaches the parquet scan as
    // a pushed filter — the StorageSpec family proves that behavior
    // for this scan shape).
    assume(new java.io.File(dir).isDirectory, "testdata not present")
    val plan = graft.ops.Sq.ivfSq8TopKFiltered(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"q86 must not plan any all-pairs join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"q86 plans a cartesian:\n$plan")
    assert("cell#\\d+L? (IN|INSET)".r.findFirstIn(plan).isDefined,
      s"q86 lost the probed-cell static filter:\n$plan")
    assert("\\(label#\\d+ % 2\\) = 0".r.findFirstIn(plan).isDefined,
      s"q86's label selector is not a scan-riding filter:\n$plan")
    graft.ops.Caches.releaseAll(spark)
  }

  test("q89 range serve keeps the routed shape and pays NO rank window — the radius is a scan-riding predicate") {
    // range search's 100 TB claim: same pruned cell equi-join as the
    // ranked serve, but the per-query row_number window (a rank
    // shuffle over every candidate) is GONE — the radius cut is a
    // plain Filter on the estimate right after the codegen vec_dot
    assume(new java.io.File(dir).isDirectory, "testdata not present")
    val plan = graft.ops.Sq.ivfSq8RangeSearch(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"q89 planned an all-pairs join:\n$plan")
    assert("cell#\\d+L? (IN|INSET)".r.findFirstIn(plan).isDefined,
      s"q89 lost the probed-cell static filter:\n$plan")
    assert(plan.contains(graft.ops.Sq.RangeTau.toString),
      s"q89's radius predicate is not in the executed plan:\n$plan")
    assert(!plan.contains("Window"),
      s"q89 must not pay a per-query rank window — the range contract has no k:\n$plan")
    graft.ops.Caches.releaseAll(spark)
  }

  test("q90 delete serve keeps q82's routed shape over the refreshed snapshot") {
    // the tombstone rewrite must not cost the serve its plan: the
    // snapshot read is a plain parquet scan carrying the probed-cell
    // IN filter, candidates meet probes through the broadcast cell
    // equi-join, and nothing degenerates to an all-pairs join
    assume(new java.io.File(dir).isDirectory, "testdata not present")
    val plan = graft.ops.Sq.ivfSq8DeleteTopK(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"q90 planned an all-pairs join:\n$plan")
    assert("cell#\\d+L? (IN|INSET)".r.findFirstIn(plan).isDefined,
      s"q90 lost the probed-cell static filter:\n$plan")
    graft.ops.Caches.releaseAll(spark)
  }
}
