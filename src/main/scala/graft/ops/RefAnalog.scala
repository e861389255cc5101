package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Oracle-gated analogs of the reference's three entry points (E1-E3,
  * SURVEY §3) re-hosted on the driver testdata so the DuckDB gate
  * applies: `documents` plays the SQL-file corpus, `events` plays the
  * review-event stream. The real path/content engines live in
  * [[DepGraph]] / [[Owners]] / [[ReviewGate]] (exercised by ScalaTest
  * conformance fixtures); these queries prove the same plan shapes
  * (scan → regex explode → broadcast join → set-agg; theta glob join;
  * stateful dedup + gates) against independent oracle results.
  */
object RefAnalog {

  /** E1 analog — dependency scan over `documents`: the first word of
    * every 25th doc is a "function definition" (min doc_id wins name
    * collisions, mirroring the catalog dict); every word occurrence in
    * any doc is a "call-site"; self-definitions are dropped; per
    * function the sorted distinct consumer docs are collected.
    * Plan shape: scan → split/explode → broadcast join → two-stage
    * collect_set, exactly E1's shuffle profile. */
  def depScanDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val words = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val cat = docs.filter(col("doc_id") % 25 === 0)
      .select(element_at(split(col("text"), " "), 1).as("word"), col("doc_id"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(min(col("doc_id")).as("def_doc"))
    // No broadcast hint: `cat` grows with the data (~1/25th of docs),
    // so a forced broadcast OOMs at scale. AQE picks broadcast when the
    // build side is actually small.
    words.join(cat, Seq("word"))
      .filter(col("doc_id") =!= col("def_doc"))
      .groupBy(col("word"), col("def_doc"))
      // sorted set serialized to a '|'-joined string: the driver's
      // pandas comparator cannot sort/hash array cells.
      .agg(array_join(sort_array(collect_set(col("doc_id"))).cast("array<string>"), "|")
          .as("used_in"),
        count(lit(1)).as("n_uses"))
      .orderBy(col("word"))
  }

  /** E2 analog — owners glob theta-join over `documents.source` with a
    * broadcast pattern table translated by [[Owners.globToRegexCol]]
    * (J3/F3/A3): per lang, the sorted distinct union of owning teams. */
  def ownersDocs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select(col("lang"), col("source"))
    val owners = Seq(
      ("src1*", Seq("team_alpha", "team_beta")),
      ("src2?", Seq("team_gamma")),
      ("*",     Seq("team_all")),
      ("src*3", Seq("team_x"))
    ).toDF("pattern", "teams")
    Owners.matchingTeams(docs, owners, "source")
      .groupBy(col("lang"))
      .agg(array_join(array_sort(array_distinct(flatten(collect_list(col("teams"))))), "|")
          .as("teams"),
        count(lit(1)).as("n_matches"))
      .orderBy(col("lang"))
  }

  /** E3 analog — review gating over `events`: pr = event_id mod 97,
    * reviewer = user_id, APPROVED = 'purchase'. Latest-per-(pr,user)
    * wins (W1), then the two required teams per pr (pr%5 and 5+pr%7)
    * must each have an approving member (membership: user_id%5 and
    * 5+user_id%7) — A4 every-team over A5 any-member. */
  def reviewGateEvents(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(spark, dir).select(
      (col("event_id") % 97).as("pr"), col("user_id"),
      col("event_type"), col("ts_ns"), col("event_id"))
    val w = Window.partitionBy(col("pr"), col("user_id"))
      .orderBy(col("ts_ns").desc, col("event_id").desc)
    val latest = base.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val approved = latest.filter(col("event_type") === "purchase")
    val approvedTeams = approved
      .select(col("pr"),
        explode(array(col("user_id") % 5, lit(5) + col("user_id") % 7)).as("team"))
      .distinct()
      .groupBy(col("pr")).agg(collect_set(col("team")).as("teams"))
    val nApprovers = approved.groupBy(col("pr")).agg(count(lit(1)).as("n_approvers"))
    base.select(col("pr")).distinct()
      .join(approvedTeams, Seq("pr"), "left")
      .join(nApprovers, Seq("pr"), "left")
      .select(col("pr"),
        coalesce(array_contains(col("teams"), col("pr") % 5) &&
          array_contains(col("teams"), lit(5) + col("pr") % 7), lit(false)).as("all_approved"),
        coalesce(col("n_approvers"), lit(0L)).as("n_approvers"))
      .orderBy(col("pr"))
  }

  /** P8-P11/F9-F10 — UTM attribution surface: synthesize a campaign
    * from event_type, classify with the Kimball column functions,
    * CASE-map the product (the reference's hot-view projection,
    * r_4.001.045:1) and filter on the UDF result (CPA-WEB-COSTS.sql:1). */
  def utmAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.select(col("event_id"),
        when(col("event_type") === "purchase", "fb_micro_loans")
          .when(col("event_type") === "signup", "gg_insurance_home")
          .otherwise("organic_generic").as("campaign"))
      .withColumn("product", Udfs.utmCampaignToProduct(col("campaign")))
      .withColumn("segment",
        when(col("product") === "Страхование имущества", "ИФЛ").otherwise("Прочее"))
      .filter(col("product") =!= "Прочее")
      .orderBy(col("event_id"))
  }
}
