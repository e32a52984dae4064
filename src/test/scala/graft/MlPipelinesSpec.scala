package graft

import graft.ml.ReferencePipelines
import java.nio.file.Files

/** End-to-end ports of the reference's four programs (SURVEY.md §5.2-4):
  * run each seeded pipeline against the reference's own CSV (read-only
  * from the snapshot) or a synthesized fixture where the blob is missing,
  * asserting shapes and metric ranges — not Spark-2.3-exact values.
  */
class MlPipelinesSpec extends SparkSpecBase {

  private val refData = "/root/reference/src/main/resources/data"

  test("medicalCharges: cleaning drops junk rows; aggs and corr behave") {
    val r = ReferencePipelines.medicalCharges(spark, s"$refData/datapreparation/medical_charges.csv")
    // 1338 raw rows; 13 junk numeric values spread over ≤13 rows (FIXTURES.md A1)
    val n = r.cleaned.count()
    assert(n >= 1325 && n < 1338, s"cleaned=$n")
    assert(r.bucketAgg.count() == 5) // age splits → 5 buckets
    val regions = r.regionAgg.collect()
    assert(regions.length == 4 && regions.forall(_.getAs[String]("smoker") == "yes"))
    // smoker_idx correlates with charges far more than region_idx does
    assert(math.abs(r.correlations("smoker_idx")) > 0.5)
    assert(r.correlations.values.forall(v => v >= -1.0 && v <= 1.0))
    assert(r.assembled.schema.fieldNames.contains("features"))
  }

  test("knowledgeRf: 4-class forest with confusion matrix and plausible f1") {
    val r = ReferencePipelines.knowledgeRf(spark, s"$refData/classification/user_know_modeling_dataset_train.csv")
    assert(r.labelHistogram.count() == 4) // High/Low/Middle/very_low
    assert(r.f1 > 0.6, s"f1=${r.f1}")
    val cm = r.confusion.collect()
    assert(cm.map(_.getAs[Long]("count")).sum > 80) // ~30% of 402 rows
  }

  test("spam: 7-stage pipeline trains RF and DT with accuracy >> majority-class") {
    val r = ReferencePipelines.spam(spark, s"$refData/classification/spam.csv")
    assert(r.accuracyRf > 0.8, s"rf=${r.accuracyRf}")
    assert(r.accuracyDt > 0.8, s"dt=${r.accuracyDt}")
    assert(r.predictionsRf.columns.contains("predictedLabel"))
  }

  test("hotelTfIdf: synthesized fixture (blob missing upstream) regresses reviewer score") {
    // schema per TfIdfCalculator.java:38-45 (FIXTURES.md A4)
    val rnd = new scala.util.Random(7)
    val nats = Seq("UK", "USA", "France", "Germany")
    val pos = Seq("great lovely room and the staff were kind",
      "good breakfast a very clean hotel", "excellent stay wonderful view of the sea")
    val neg = Seq("the wifi was slow and the room was small",
      "noisy street a bit dirty", "no complaints at all really")
    val rows = (1 to 200).map { i =>
      val score = 2.5 + rnd.nextDouble() * 7.5
      (pos(i % 3), s"Hotel ${i % 10}", neg(i % 3), nats(i % 4),
        math.rint(score * 10) / 10, 7.5)
    }
    import spark.implicits._
    val dir = Files.createTempDirectory("hotel").toString
    rows.toDF("Positive Review", "Hotel Name", "Negative Review",
        "Nationality", "Reviewer Score", "Average Score")
      .coalesce(1).write.mode("overwrite").option("header", true).csv(dir)
    val r = ReferencePipelines.hotelTfIdf(spark, dir)
    assert(r.featurized.schema.fieldNames.contains("features"))
    assert(r.rmse > 0 && r.rmse < 5, s"rmse=${r.rmse}") // scores span 2.5-10
  }
}
