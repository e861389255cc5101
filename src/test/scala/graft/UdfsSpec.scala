package graft

import graft.ops.Udfs
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** §2.9 registry parity: the SQL-name UDF twins must agree with the
  * codegen Column versions on the whole input surface (nulls
  * included), and the F9→F10 composition must hold. */
class UdfsSpec extends SparkSpec {
  import spark.implicits._

  private val campaigns = Seq(
    "fb_micro_loans", "gg_insurance_home", "strah_retarget", "mfo_aug",
    "organic_generic", "", null).toDF("campaign")

  test("kimball_utm_campaign_to_product (SQL name) == utmCampaignToProduct (Column)") {
    Udfs.register(spark)
    val viaCol = campaigns.select(Udfs.utmCampaignToProduct(col("campaign")))
      .as[String].collect().toSeq
    val viaSql = campaigns.selectExpr("kimball_utm_campaign_to_product(campaign)")
      .as[String].collect().toSeq
    assert(viaCol == viaSql)
    assert(viaCol.contains("Микрокредиты") && viaCol.contains("Страхование имущества"))
  }

  test("kimball_utm_to_financial_channel (7-arg SQL name) == Column twin") {
    Udfs.register(spark)
    val rows = Seq(
      ("fb", "cpc", "camp", "Микрокредиты"),
      ("organic", null, "camp", "Продукт"),
      ("x", "email", "camp", "Продукт"),
      (null, null, null, null)
    ).toDF("source", "medium", "campaign", "product")
    val viaCol = rows.select(Udfs.utmToFinancialChannel(col("source"), col("medium"),
      col("campaign"), lit(null).cast(DecimalType(38, 0)), lit(null), lit(null),
      col("product"))).as[String].collect().toSeq
    val viaSql = rows.selectExpr(
      "kimball_utm_to_financial_channel(source, medium, campaign, CAST(null AS DECIMAL(38,0)), null, null, product)")
      .as[String].collect().toSeq
    assert(viaCol == viaSql)
    assert(viaCol(0) == "Платный/Микрокредиты")
    assert(viaCol(1) == "Органика/Продукт")
    assert(viaCol(2) == "Продукт")
  }

  test("F9 composes F10 exactly (the dependency edge the scanner tracks)") {
    val got = Seq("fb_micro_loans").toDF("c")
      .select(Udfs.utmCampaignToProduct(col("c"))).as[String].collect()(0)
    val composed = Seq("fb_micro_loans").toDF("c")
      .select(Udfs.utmToFinancialChannel(lit(null), lit(null), col("c"),
        lit(null).cast(DecimalType(38, 0)), lit(null), lit(null),
        Udfs.productOfCampaign(col("c")))).as[String].collect()(0)
    assert(got == composed)
  }
}
