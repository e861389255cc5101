package graft

import graft.io.CorpusIO
import graft.ops.Owners
import graft.stream.{ReviewEvent, ReviewStateMachine}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.{Files, Paths}

/** E1→E2→E3 composition over the REAL reference tree: dependency scan
  * → generated CODEFACILITATORS artifact → per-PR stage requirements
  * from the three owners files (pr-review-flow.yml:117-176) → the
  * streaming review gate, ending at label/request side-effects. This
  * is the full hand-off a reference user runs across the three
  * workflow stages, in one pipeline. */
class OwnersGlueSpec extends SparkSpec {

  private val ref = "/root/reference"
  private val orgName = "rzv-data-engineering-series-s01"

  test("E1→E2→E3: real owners files → stage requirements → streaming gate → labels") {
    assume(refTreeAvailable, "reference tree not present (or skipped via GRAFT_SKIP_REF_GOLDEN)")
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // E1+E2 over the real tree: dep scan → CODEFACILITATORS artifact
    val out = Files.createTempDirectory("e3glue").toString
    CorpusIO.scanAndSave(spark, ref, out)
    CorpusIO.generateFacilitators(spark, s"$out/flattened_dependencies.json",
      s"$ref/.github/MARTOWNERS", s"$out/CODEFACILITATORS")

    // E3 glue: PR file lists × (static CODEOWNERS/CODETECHTEAM +
    // generated CODEFACILITATORS). PR 7 touches a catalog function
    // file + docs; PR 8 is docs-only.
    val prFiles = Seq(
      (7L, "deployer/patch/DWH/kimball/r_3.000140_f_utm_campaign_to_product.sql"),
      (7L, "README.md"),
      (8L, "README.md")).toDF("pr", "file")
    val (reqCo, reqFa, reqTe) = Owners.stageRequirements(prFiles,
      spark.read.text(s"$ref/.github/CODEOWNERS"),
      spark.read.text(s"$out/CODEFACILITATORS"),
      spark.read.text(s"$ref/.github/CODETECHTEAM"))

    // Bare-`*` unconditional grant (pr-review-flow.yml:141): a
    // zero-file PR 9 in the PR universe still owes the CODETECHTEAM
    // `*` owners — and nothing from the glob-only files — while the
    // with-files PRs are unchanged vs the default universe.
    val universe = Seq(7L, 8L, 9L).toDF("pr")
    val (uCo, uFa, uTe) = Owners.stageRequirements(prFiles,
      spark.read.text(s"$ref/.github/CODEOWNERS"),
      spark.read.text(s"$out/CODEFACILITATORS"),
      spark.read.text(s"$ref/.github/CODETECHTEAM"), Some(universe))

    def rel(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // CODEOWNERS: *.md → tech-team for both PRs; the r_3* pattern
    // matches PR 7's function file → analysts-owners. Handles arrive
    // @-stripped (yml:149).
    assert(rel(reqCo) == Set(
      (7L, s"$orgName/tech-team"), (7L, s"$orgName/analysts-owners"), (8L, s"$orgName/tech-team")))
    // generated CODEFACILITATORS: PR 7's file IS a mapped function path
    // → market-facilitators; PR 8 matches nothing → NO rows (the
    // vacuous-truth edge: [].every is true in the reference)
    assert(rel(reqFa) == Set((7L, s"$orgName/market-facilitators")))
    // CODETECHTEAM's bare `*` matches every PR with files
    assert(rel(reqTe) == Set((7L, s"$orgName/tech-team"), (8L, s"$orgName/tech-team")))
    // With an explicit PR universe, the zero-file PR 9 gets the bare-`*`
    // grant unconditionally (yml:141) and nothing from glob patterns;
    // the with-files PRs are unchanged.
    assert(rel(uCo) == rel(reqCo) && rel(uFa) == rel(reqFa))
    assert(rel(uTe) == rel(reqTe) + ((9L, s"$orgName/tech-team")))
    // the universe RESTRICTS too: dropping PR 8 removes all its rows —
    // glob matches included — so a wider prFiles table cannot leak
    // half-gated rows for PRs outside the review set
    val narrow = Seq(7L).toDF("pr")
    val (nCo, _, nTe) = Owners.stageRequirements(prFiles,
      spark.read.text(s"$ref/.github/CODEOWNERS"),
      spark.read.text(s"$out/CODEFACILITATORS"),
      spark.read.text(s"$ref/.github/CODETECHTEAM"), Some(narrow))
    assert(rel(nCo) == rel(reqCo).filter(_._1 == 7L))
    assert(rel(nTe) == Set((7L, s"$orgName/tech-team")))

    // default path: the bare-`*` grant matches on the PR row's
    // PRESENCE, never the file value — a null file (an upstream left
    // join) still carries it, while glob patterns cannot match it
    val inlineOwners = Seq("* @org/everyone", "*.md @org/docs").toDF("value")
    val withNull = Seq((7L, Option("README.md")), (10L, Option.empty[String]))
      .toDF("pr", "file")
    assert(rel(Owners.requiredTeams(withNull, inlineOwners)) == Set(
      (7L, "org/everyone"), (7L, "org/docs"), (10L, "org/everyone")))

    // E3 streaming gate over those requirements
    val membership = Seq(
      (s"$orgName/tech-team", "tina"),
      (s"$orgName/analysts-owners", "anna"),
      (s"$orgName/market-facilitators", "mark")).toDF("team", "user")
    val events = MemoryStream[ReviewEvent]
    val store = new ReviewStateMachine.LabelStore
    val requests = new ReviewStateMachine.LabelStore
    val ckpt = Files.createTempDirectory("e3glue-ckpt").toString
    val q = ReviewStateMachine.run(events.toDS(), reqCo, reqFa, reqTe,
      membership, store, ckpt, requests)
    try {
      // tina approves both PRs: docs-only PR 8 clears ALL stages
      // (codeowners via tech-team, facilitators vacuously, tech via
      // tech-team); PR 7's independent tech stage is green too, but
      // codeowners still needs analysts
      events.addData(ReviewEvent(7, "tina", "APPROVED", 1),
        ReviewEvent(8, "tina", "APPROVED", 2))
      q.processAllAvailable()
      assert(store.current == Set((7L, "tech-approved"),
        (8L, "codeowners-approved"), (8L, "facilitators-approved"), (8L, "tech-approved")))

      // anna approves PR 7: codeowners green (facilitator stage opens),
      // tech already green via tina — facilitators outstanding
      events.addData(ReviewEvent(7, "anna", "APPROVED", 3))
      q.processAllAvailable()
      assert(store.current.filter(_._1 == 7L) == Set(
        (7L, "codeowners-approved"), (7L, "tech-approved")))
      assert(requests.current == Set((7L, "facilitators")))

      // mark (facilitator) approves: PR 7 fully green
      events.addData(ReviewEvent(7, "mark", "APPROVED", 4))
      q.processAllAvailable()
      assert(store.current == Set(
        (7L, "codeowners-approved"), (7L, "facilitators-approved"), (7L, "tech-approved"),
        (8L, "codeowners-approved"), (8L, "facilitators-approved"), (8L, "tech-approved")))
    } finally q.stop()
  }
}
