package graft

import graft.ops.Owners
import org.apache.spark.sql.functions._

/** Glob-dialect conformance (SURVEY risk #2): the two reference
  * implementations diverge on `?` and bare `*`; this engine pins the
  * JS superset. Checked against hand-derived oracle semantics for
  * both reference surfaces, plus the Scala/Column translator parity
  * and the owners-file parser. */
class OwnersSpec extends SparkSpec {
  import spark.implicits._

  private def matches(glob: String, path: String): Boolean =
    path.matches(Owners.globToRegex(glob))

  test("glob dialect: * stays within a path segment") {
    assert(matches("src/*.sql", "src/a.sql"))
    assert(!matches("src/*.sql", "src/sub/a.sql"))
    assert(matches("deployer/patch/DWH/kimball/r_4.*view.sql",
      "deployer/patch/DWH/kimball/r_4.001.045_v_marketing_view.sql"))
  }

  test("glob dialect: ? matches exactly one non-slash char (JS superset)") {
    assert(matches("file?.sql", "file1.sql"))
    assert(!matches("file?.sql", "file12.sql"))
    assert(!matches("file?.sql", "file/.sql"))
    // python's dialect would read `e?` as regex-optional and accept
    // "filX.sql"; the pinned JS dialect must NOT
    assert(!matches("file?.sql", "fil1.sql"))
  }

  test("glob dialect: bare * is match-all (JS special case, crosses slashes)") {
    assert(matches("*", "any/depth/of/path.sql"))
    // non-bare * still segment-bound
    assert(!matches("a/*", "a/b/c"))
  }

  test("glob dialect quirk: `.` is regex-any in BOTH references — preserved") {
    assert(matches("a.b", "aXb"))
    assert(matches("kimball.msb-web-fb_req.sql", "kimball.msb-web-fb_req.sql"))
  }

  test("globToRegexCol matches globToRegex on the conformance pattern set") {
    val pats = Seq("*", "src/*.sql", "file?.sql", "a.b", "x/*/y",
      "deployer/patch/DWH/kimball/r_4.*view.sql", "??", "*.md")
    val viaCol = pats.toDF("pattern")
      .select(col("pattern"), Owners.globToRegexCol(col("pattern")).as("rx"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    pats.foreach(p => assert(viaCol(p) == Owners.globToRegex(p), s"pattern $p"))
  }

  test("parseOwners skips comments/blanks and splits pattern + teams") {
    val lines = Seq(
      "# comment line", "", "   ",
      "src/* @org/team-a @org/team-b",
      "  docs/*.md   @org/docs  ").toDF("value")
    val got = Owners.parseOwners(lines).collect()
      .map(r => (r.getString(0), r.getSeq[String](1).toList)).toList
    assert(got == List(
      ("src/*", List("@org/team-a", "@org/team-b")),
      ("docs/*.md", List("@org/docs"))))
  }

  test("stripHandle removes exactly one leading @ (membership-probe form, F6)") {
    val got = Seq("@org/team-a", "plain", "@@double", "mid@sign").toDF("t")
      .select(Owners.stripHandle(col("t"))).as[String].collect().toSeq
    assert(got == Seq("org/team-a", "plain", "@double", "mid@sign"))
  }

  test("matchingTeams joins every matching pattern (theta join J3)") {
    val paths = Seq("src/a.sql", "docs/readme.md", "other/x").toDF("path")
    val owners = Seq(
      ("src/*", Seq("t1")), ("*", Seq("all")), ("docs/*.md", Seq("t2"))
    ).toDF("pattern", "teams")
    val got = Owners.matchingTeams(paths, owners)
      .select(col("path"), explode(col("teams")).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("src/a.sql", "t1"), ("src/a.sql", "all"),
      ("docs/readme.md", "t2"), ("docs/readme.md", "all"),
      ("other/x", "all")))
  }

  test("facilitators: per-function sorted team union; teamless functions dropped") {
    val flat = Seq(
      ("f1", "p/f1.sql", Seq("src/a.sql", "docs/readme.md")),
      ("f2", "p/f2.sql", Seq("nowhere/x"))
    ).toDF("function", "path", "used_in_files")
    val owners = Seq(
      ("src/*", Seq("tb", "ta")), ("docs/*.md", Seq("ta"))
    ).toDF("pattern", "teams")
    val got = Owners.facilitators(flat, owners).collect()
      .map(r => (r.getString(0), r.getSeq[String](2).toList)).toList
    assert(got == List(("f1", List("ta", "tb"))))
  }
}
