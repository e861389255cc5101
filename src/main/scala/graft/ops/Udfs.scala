package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's scalar-UDF registry (SURVEY §2.7/§2.9): the Kimball
  * `CREATE OR REPLACE FUNCTION` surface re-expressed as pure-`Column`
  * Scala functions (Catalyst-optimizable when-chains, no black-box
  * UDF in the hot path) plus registered SQL names for parity with the
  * `KIMBALL.func(args)` call grammar.
  *
  * The reference publishes only the signatures and call-sites
  * (r_3.000140_f_utm_campaign_to_product.sql:1,
  * r_6.001.001_f_utm_to_financial_channel.sql:1,
  * DIM_MFO_FD_WEB_CHANNEL.sql:2-9) — bodies are not in the repo — so
  * the mapping rules below are this engine's documented definition,
  * preserving the published shape: campaign→product classification,
  * 7-arg channel attribution with a decimal `content` arg, and the
  * F9→F10 function-in-function composition the scanner tracks.
  */
object Udfs {

  /** F10 — `UTM_TO_FINANCIAL_CHANNEL(source, medium, campaign,
    * content NUMBER(38,0), x, y, product) → VARCHAR`. */
  def utmToFinancialChannel(source: Column, medium: Column, campaign: Column,
      content: Column, x: Column, y: Column, product: Column): Column = {
    val m = lower(coalesce(medium, lit("")))
    val s = lower(coalesce(source, lit("")))
    when(m.isin("cpc", "cpa", "cpm", "paid"), concat(lit("Платный/"), product))
      .when(s === "organic", concat(lit("Органика/"), product))
      .otherwise(product)
  }

  /** Campaign→product classification used by F9 (order matters:
    * insurance wins over micro when both substrings appear). */
  def productOfCampaign(campaign: Column): Column = {
    val c = lower(coalesce(campaign, lit("")))
    when(c.contains("insurance") || c.contains("strah"), lit("Страхование имущества"))
      .when(c.contains("micro") || c.contains("mfo") || c.contains("loan"), lit("Микрокредиты"))
      .otherwise(lit("Прочее"))
  }

  /** F9 — `UTM_CAMPAIGN_TO_PRODUCT(campaign) → VARCHAR`; composes F10
    * exactly like the reference (the function-in-function edge the
    * dependency scanner exists to track). */
  def utmCampaignToProduct(campaign: Column): Column =
    utmToFinancialChannel(lit(null), lit(null), campaign,
      lit(null).cast(DecimalType(38, 0)), lit(null), lit(null),
      productOfCampaign(campaign))

  /** SQL-name registration (`KIMBALL.` schema flattened to a prefix —
    * Spark has no function schemas). These UDF twins exist only for
    * SQL-name parity with the `KIMBALL.func(` call grammar; DataFrame
    * code should use the codegen-friendly Column versions above. */
  def register(spark: SparkSession): Unit = {
    def productOf(campaign: String): String = {
      val c = Option(campaign).getOrElse("").toLowerCase
      if (c.contains("insurance") || c.contains("strah")) "Страхование имущества"
      else if (c.contains("micro") || c.contains("mfo") || c.contains("loan")) "Микрокредиты"
      else "Прочее"
    }
    def channel(source: String, medium: String, product: String): String = {
      val m = Option(medium).getOrElse("").toLowerCase
      val s = Option(source).getOrElse("").toLowerCase
      if (Set("cpc", "cpa", "cpm", "paid").contains(m)) s"Платный/$product"
      else if (s == "organic") s"Органика/$product"
      else product
    }
    spark.udf.register("kimball_utm_campaign_to_product",
      (c: String) => channel(null, null, productOf(c)))
    spark.udf.register("kimball_utm_to_financial_channel",
      (source: String, medium: String, campaign: String, content: java.math.BigDecimal,
       x: String, y: String, product: String) => channel(source, medium, product))
    ()
  }
}
