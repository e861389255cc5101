package graft

import org.scalatest.funsuite.AnyFunSuite

/** The graded bench line's formatting contract — the round's one
  * performance artifact. Every case here maps to a capture failure
  * that actually happened (or was one input away from happening):
  * locale commas, trailing-zero budget, invalid sf numbers, and
  * unescaped fallback paths all yield `parsed: null` on the harness
  * side with no error on ours. */
class BenchFormatSpec extends AnyFunSuite {

  test("num: Locale.ROOT decimals, trailing zeros stripped, still valid JSON numbers") {
    assert(BenchFormat.num(42.0) == "42")
    assert(BenchFormat.num(0.30) == "0.3")
    assert(BenchFormat.num(0.25) == "0.25")
    assert(BenchFormat.num(3.001) == "3")     // 2-decimal resolution
    assert(BenchFormat.num(12.345, 3) == "12.345")
    assert(BenchFormat.num(0.0) == "0")
    // a comma would break the harness's json.loads regardless of locale
    val default = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      assert(!BenchFormat.num(42.5).contains(","))
      assert(BenchFormat.num(42.5) == "42.5")
    } finally java.util.Locale.setDefault(default)
  }

  test("jmap + sfJson compose into a parseable graded line") {
    val line =
      s"""{"metric":"total","value":${BenchFormat.num(39.71)},"unit":"sec","queries":${
        BenchFormat.jmap(Seq("q01" -> 0.5, "q02" -> 1.25))},"sf":${
        BenchFormat.sfJson("/root/testdata/sf0.1")}}"""
    // the exact shape the harness parses
    assert(line == """{"metric":"total","value":39.71,"unit":"sec","queries":{"q01":0.5,"q02":1.25},"sf":0.1}""")
  }

  test("sfJson: one decimal point max, escaped string fallback") {
    assert(BenchFormat.sfJson("/root/testdata/sf0.1") == "0.1")
    assert(BenchFormat.sfJson("/data/sf0.001") == "0.001")
    assert(BenchFormat.sfJson("/x/sf0.1.bak") == "0.1")    // never "0.1."
    assert(BenchFormat.sfJson("/x/sf10") == "10")
    assert(BenchFormat.sfJson("/x/sf01") == "\"/x/sf01\"") // 01 is not a JSON number
    assert(BenchFormat.sfJson("/plain/dir") == "\"/plain/dir\"")
    assert(BenchFormat.sfJson("""/odd"p\ath""") == "\"/odd\\\"p\\\\ath\"")
  }

  test("graded line at the CURRENT query count fits the ~2,000-char capture window") {
    // The harness keeps only the trailing ~2000 stdout chars and sbt's
    // final "[success] …" line (~75 chars) shares the window — the
    // graded line must stay ≤1,900 chars or the round's bench record
    // silently truncates (the rounds-1-5 failure). Guard it against
    // SURFACE GROWTH at the real query-name set, with every value at
    // the 4-char "9.99" width: the per-query bench gate (2× recorded
    // steady, max ≈ 5.6 s) keeps real entries under 10 s, so this is
    // the realistic worst case. A query crossing 10 s would add one
    // char — and would already be failing the per-query gate.
    // graded keys are the qNN prefixes (Bench truncates; uniqueness is
    // DriverContractSpec's invariant) — full names live in
    // BENCH_DETAIL.json where no window applies
    val names = SparkEntry.queries.keys.toSeq.sorted
    // worst-case adj flag: the cap full (at 2-digit ratios) AND the
    // "+N" overflow tail; "warm" at a 4-digit-seconds worst case
    // (quiet sessions read ~98); "post" (v5) at its cap with 2-digit
    // seconds — every pre-settle survivor re-ran, none cleared
    val line =
      s"""{"metric":"total","value":${BenchFormat.num(9999.99)},"unit":"sec","warm":${
        BenchFormat.num(9999.9, 1)},"queries":${
        BenchFormat.jmap(names.map(_.take(3) -> 9.99))},"adj":${
        BenchFormat.adjList(names.map(_ -> 99.9))},"post":${
        BenchFormat.postMap(names.map(_ -> 99.99))},"sf":${
        BenchFormat.sfJson("/root/testdata/sf0.1")}}"""
    assert(line.length <= 1900,
      s"graded line would be ${line.length} chars at ${names.length} queries — " +
        "the capture window will truncate it; re-derive the format " +
        "(shorter names or a split record) before growing the surface")
  }

  test("adjList: sorted prefixes with final-vs-guard ratio, pinned cap, overflow compressed to +N") {
    assert(BenchFormat.adjList(Nil) == "[]")
    // the ratio rides each entry at one decimal — a quiet third run
    // reads "q12:1" (ratio back under guard), a real regression reads
    // its multiple
    assert(BenchFormat.adjList(Seq("q12_union_all" -> 1.04)) == """["q12:1"]""")
    assert(BenchFormat.adjList(Seq("q13_x" -> 3.94, "q12_y" -> 0.8)) == """["q12:0.8","q13:3.9"]""")
    val many = (1 to 12).map(i => f"q$i%02d_name" -> 2.0)
    val full = BenchFormat.adjList(many)
    assert(full == """["q01:2","q02:2","q03:2","q04:2","q05:2","q06:2","q07:2","q08:2","+4"]""")
    // the worst case is bounded regardless of surface size
    assert(BenchFormat.adjList((1 to 500).map(i => f"q$i%03d" -> 99.9)).length <= 110)
  }

  test("postMap: qNN-prefixed re-run seconds, sorted, capped, empty when no survivors") {
    assert(BenchFormat.postMap(Nil) == "{}")
    assert(BenchFormat.postMap(Seq("q98_refine_prod" -> 2.63, "q87_x" -> 1.8)) ==
      """{"q87":1.8,"q98":2.63}""")
    // cap pins the line budget regardless of how many guards tripped;
    // the full map rides in BENCH_DETAIL.json
    val many = BenchFormat.postMap((1 to 20).map(i => f"q$i%02d_name" -> 9.99))
    assert(many == """{"q01":9.99,"q02":9.99,"q03":9.99,"q04":9.99,"q05":9.99,"q06":9.99,"q07":9.99,"q08":9.99}""")
    assert(BenchFormat.postMap((1 to 500).map(i => f"q$i%03d" -> 99.99)).length <= 115)
  }

  test("guardSfMismatch: settle+post runs for minority trips, skips for a mis-SF'd guard file") {
    // contention-burst shapes (a few survivors) settle and re-probe
    assert(!BenchFormat.guardSfMismatch(0, 99, atGuardSf = false))
    assert(!BenchFormat.guardSfMismatch(5, 99, atGuardSf = false))   // the r13 driver line's shape
    assert(!BenchFormat.guardSfMismatch(24, 99, atGuardSf = false))  // just under 1/4
    // guard-SF mismatch shapes (decade runs against sf0.1 guards) skip:
    // the r14 sf1 line tripped 50/99, the sf10 post pass OOM'd
    assert(BenchFormat.guardSfMismatch(25, 99, atGuardSf = false))
    assert(BenchFormat.guardSfMismatch(50, 99, atGuardSf = false))
    assert(BenchFormat.guardSfMismatch(99, 99, atGuardSf = false))
    // AT the guard SF the pass NEVER skips: guards are aggressive
    // cross-sample minima since r14d, so a hot box at sf0.1 can trip
    // a quarter of the surface — that is heat, and it must self-clear
    // on the line instead of skipping with a mismatch message
    assert(!BenchFormat.guardSfMismatch(25, 99, atGuardSf = true))
    assert(!BenchFormat.guardSfMismatch(99, 99, atGuardSf = true))
  }
}
