package graft

import graft.tools.RecallReport

/** Certifies the recall-report arithmetic (VERDICT r8 #6's measurement
  * tool) on the smallest real corpus: the JSON line parses, the set
  * algebra is internally consistent, and the exact side reproduces
  * q70's drop count — so the sf1 numbers in bench/SCALING_r09.md come
  * from a certified tool, not ad-hoc math. */
class RecallReportSpec extends SparkSpec {

  test("report: internally consistent overlap stats on sf0.001") {
    val line = RecallReport.report(spark, "/root/testdata/sf0.001")
    // parse the flat JSON line without a JSON lib: "key":value pairs
    val kv = """"([a-z_]+)":([0-9.]+)""".r.findAllMatchIn(line)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    assert(kv.keySet == Set("n", "drop_exact", "drop_twolevel",
      "drop_intersection", "drop_union", "drop_jaccard", "keep_agreement"), line)
    assert(kv("n") > 0)
    // set algebra: |∩| ≤ min, |∪| = |A| + |B| − |∩|, bounds on ratios
    assert(kv("drop_intersection") <= math.min(kv("drop_exact"), kv("drop_twolevel")))
    assert(kv("drop_union") == kv("drop_exact") + kv("drop_twolevel") - kv("drop_intersection"))
    assert(kv("drop_jaccard") >= 0 && kv("drop_jaccard") <= 1)
    assert(kv("keep_agreement") >= 0 && kv("keep_agreement") <= 1)
    // disagreement on keep decisions is exactly the drop-set symmetric
    // difference (same id universe on both sides, required by report)
    val symDiff = kv("drop_union") - kv("drop_intersection")
    assert(math.abs(kv("keep_agreement") - (kv("n") - symDiff) / kv("n")) <= 1e-3)

    // the exact side IS q70: same drop count as the graded query
    val q70 = graft.ops.Embeddings.semanticDedupScaled(spark, "/root/testdata/sf0.001")
    val q70Drops = q70.filter(!org.apache.spark.sql.functions.col("keep")).count()
    graft.ops.Caches.releaseAll(spark)
    assert(kv("drop_exact") == q70Drops)
  }

  test("serveReport: join-based top-k agreement, perfect at a saturating nSuperProbe") {
    def kv(line: String): Map[String, Double] =
      """"([a-z_]+)":([0-9.]+)""".r.findAllMatchIn(line)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    // routed probing at a saturating nSuperProbe IS the exact serve
    // (the degenerate identity) — recall and rank agreement both 1
    val sat = kv(RecallReport.serveReport(spark, "/root/testdata/sf0.001",
      nprobe = 2, nSuperProbe = 1000))
    assert(sat("topk_recall") == 1.0 && sat("exact_rank_agreement") == 1.0, sat.toString)
    // real routing: bounded ratios, pairs = probes × k, and recall
    // bounds rank agreement from above
    val real = kv(RecallReport.serveReport(spark, "/root/testdata/sf0.001",
      nprobe = 2, nSuperProbe = 1))
    assert(real("pairs") == sat("pairs"))
    assert(real("topk_recall") > 0 && real("topk_recall") <= 1)
    assert(real("exact_rank_agreement") <= real("topk_recall"))
    assert(real("n_super") == math.ceil(math.sqrt(real("n_cells"))).toInt)
  }
}
