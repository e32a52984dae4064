package graft.ml

import graft.sources.CsvSource
import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{DecisionTreeClassifier, RandomForestClassifier}
import org.apache.spark.ml.evaluation.{MulticlassClassificationEvaluator, RegressionEvaluator}
import org.apache.spark.ml.feature._
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ML-parity layer (SURVEY.md §2.10 a-variants + §2.11): the reference's
  * four programs re-expressed as seeded, deterministic Scala pipelines.
  * Everything nondeterministic in the reference (unseeded randomSplit —
  * TfIdfCalculator.java:126, RandomForest.java:65, SpamClassification
  * .java:42 — and unseeded tree learners) is seeded here; tests assert
  * shapes and metric ranges, not Spark-2.3-exact values (SURVEY.md §5.2).
  * These pipelines are NOT in the oracle map: their deterministic
  * DataFrame twins are (q25-q32).
  */
object ReferencePipelines {

  val Seed = 42L

  // -----------------------------------------------------------------
  /** DataCorrelator port (reference: DataCorrelator.java:25-83):
    * dirty-CSV cleaning → age bucketing → grouped aggs → label indexing →
    * correlation sweep → feature assembly.
    */
  case class CorrelatorResult(
      cleaned: DataFrame,
      bucketAgg: DataFrame,
      regionAgg: DataFrame,
      correlations: Map[String, Double],
      assembled: DataFrame)

  def medicalCharges(spark: SparkSession, csvPath: String): CorrelatorResult = {
    val raw = CsvSource.inferred(spark, csvPath)
    // cast junk → null (DataCorrelator.java:34-36), then drop (…:40)
    val cleaned = CsvSource.castDirtyToDouble(raw, Seq("age", "bmi", "charges")).na.drop()

    // Bucketizer with the reference's explicit splits (…:41-49)
    val bucketizer = new Bucketizer()
      .setInputCol("age").setOutputCol("age_bucket")
      .setSplits(Array(Double.NegativeInfinity, 25, 35, 45, 55, Double.PositiveInfinity))
    val bucketed = bucketizer.transform(cleaned)

    // groupBy aggs (…:51-53)
    val bucketAgg = bucketed.groupBy("age_bucket")
      .agg(avg("charges").as("avg_charges"), max("bmi").as("max_bmi"))
      .orderBy("age_bucket")
    val regionAgg = bucketed.groupBy("region", "smoker")
      .agg(min("charges").as("min_charges"))
      .orderBy("region")
      .filter(col("smoker") === "yes")

    // StringIndexer per string column (…:56-64)
    val indexed = Seq("sex", "smoker", "region").foldLeft(bucketed) { (df, c) =>
      new StringIndexer().setInputCol(c).setOutputCol(s"${c}_idx").fit(df).transform(df)
    }

    // correlation sweep over non-string columns (…:66-72)
    val numericCols = indexed.schema.fields
      .filter(f => f.dataType != org.apache.spark.sql.types.StringType)
      .map(_.name).filter(_ != "charges")
    val correlations = numericCols.map(c => c -> indexed.stat.corr("charges", c)).toMap

    // VectorAssembler (…:78-83)
    val assembled = new VectorAssembler()
      .setInputCols(Array("age", "bmi", "children", "sex_idx", "smoker_idx", "region_idx"))
      .setOutputCol("features")
      .transform(indexed)
    CorrelatorResult(cleaned, bucketAgg, regionAgg, correlations, assembled)
  }

  // -----------------------------------------------------------------
  /** TfIdfCalculator port (reference: TfIdfCalculator.java:29-149):
    * dual TF-IDF featurization of review text → assembled + L1-normalized
    * features → linear regression on the reviewer score → RMSE.
    */
  case class TfIdfResult(featurized: DataFrame, rmse: Double, predictions: DataFrame)

  def hotelTfIdf(spark: SparkSession, csvPath: String): TfIdfResult = {
    val df = CsvSource.inferred(spark, csvPath)
      .select("Positive Review", "Hotel Name", "Negative Review",
        "Nationality", "Reviewer Score", "Average Score")
      .na.drop()

    def tfidfStage(in: String, outPrefix: String): Array[PipelineStageLike] = Array(
      PipelineStageLike(new Tokenizer().setInputCol(in).setOutputCol(s"${outPrefix}_tok")),
      PipelineStageLike(new StopWordsRemover()
        .setInputCol(s"${outPrefix}_tok").setOutputCol(s"${outPrefix}_filt")),
      PipelineStageLike(new HashingTF()
        .setInputCol(s"${outPrefix}_filt").setOutputCol(s"${outPrefix}_tf")
        .setNumFeatures(10000)), // dims per reference TfIdfCalculator.java:77
      PipelineStageLike(new IDF().setInputCol(s"${outPrefix}_tf").setOutputCol(s"${outPrefix}_idf")))

    val stages =
      tfidfStage("Positive Review", "pos") ++ tfidfStage("Negative Review", "neg") ++ Array(
        PipelineStageLike(new StringIndexer()
          .setInputCol("Nationality").setOutputCol("nat_idx")),
        PipelineStageLike(new VectorAssembler()
          .setInputCols(Array("pos_idf", "neg_idf", "nat_idx", "Average Score"))
          .setOutputCol("features_raw")),
        PipelineStageLike(new Normalizer() // p=1 per reference …:120-124
          .setInputCol("features_raw").setOutputCol("features").setP(1.0)))

    val featurized = new Pipeline().setStages(stages.map(_.stage)).fit(df).transform(df)
      .withColumnRenamed("Reviewer Score", "label")

    val Array(train, test) = featurized.randomSplit(Array(0.7, 0.3), Seed)
    val model = new LinearRegression().setMaxIter(20).fit(train)
    val predictions = model.transform(test)
    val rmse = new RegressionEvaluator()
      .setLabelCol("label").setPredictionCol("prediction").setMetricName("rmse")
      .evaluate(predictions)
    TfIdfResult(featurized, rmse, predictions)
  }

  // -----------------------------------------------------------------
  /** RandomForest port (reference: RandomForest.java:26-93): multiclass
    * user-knowledge classification + confusion matrix + f1.
    */
  case class RfResult(confusion: DataFrame, f1: Double, labelHistogram: DataFrame)

  def knowledgeRf(spark: SparkSession, csvPath: String): RfResult = {
    val df = CsvSource.inferred(spark, csvPath)
    val indexerModel = new StringIndexer()
      .setInputCol("SKL").setOutputCol("label").fit(df)
    val indexed = indexerModel.transform(df)
    val labelHistogram = indexed.groupBy("SKL", "label").count().orderBy("label")

    val assembled = new VectorAssembler()
      .setInputCols(Array("SST", "SRT", "SAT", "SAP", "SEP"))
      .setOutputCol("features")
      .transform(indexed)
    val Array(train, test) = assembled.randomSplit(Array(0.7, 0.3), Seed)

    val model = new RandomForestClassifier().setSeed(Seed).fit(train)
    val predicted = new IndexToString()
      .setInputCol("prediction").setOutputCol("predictionStr")
      .setLabels(indexerModel.labelsArray(0))
      .transform(model.transform(test))

    // confusion matrix as groupBy-count (reference RandomForest.java:86-87)
    val confusion = predicted.groupBy(col("SKL").as("labelStr"), col("predictionStr"))
      .count().orderBy("labelStr", "predictionStr")
    val f1 = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction")
      .evaluate(predicted) // default metric = f1, as the reference relies on
    RfResult(confusion, f1, labelHistogram)
  }

  // -----------------------------------------------------------------
  /** SpamClassification port (reference: SpamClassification.java:30-130):
    * the 7-stage Pipeline {pre-fit indexer, tokenizer, stopwords,
    * hashingTF(1000), idf, classifier, labelConverter} for both RF and DT.
    */
  case class SpamResult(accuracyRf: Double, accuracyDt: Double, predictionsRf: DataFrame)

  def spam(spark: SparkSession, csvPath: String): SpamResult = {
    val raw = CsvSource.allString(spark, csvPath)
    val Array(trainRaw, testRaw) = raw.randomSplit(Array(0.7, 0.3), Seed)
    val train = trainRaw.select("v2", "v1").na.drop()
    val test = testRaw.select("v2", "v1").na.drop()

    // indexer pre-fit on train, reused inside the pipeline (reference :62)
    val indexer = new StringIndexer().setInputCol("v1").setOutputCol("label").fit(train)
    def pipelineFor(classifier: org.apache.spark.ml.PipelineStage): PipelineModel =
      new Pipeline().setStages(Array(
        indexer,
        new Tokenizer().setInputCol("v2").setOutputCol("words"),
        new StopWordsRemover().setInputCol("words").setOutputCol("filtered"),
        new HashingTF().setInputCol("filtered").setOutputCol("tf").setNumFeatures(1000),
        new IDF().setInputCol("tf").setOutputCol("features"),
        classifier,
        new IndexToString().setInputCol("prediction").setOutputCol("predictedLabel")
          .setLabels(indexer.labelsArray(0)))).fit(train)

    val evaluator = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction").setMetricName("accuracy")
    val predRf = pipelineFor(new RandomForestClassifier().setSeed(Seed)).transform(test)
    val predDt = pipelineFor(new DecisionTreeClassifier().setSeed(Seed)).transform(test)
    SpamResult(evaluator.evaluate(predRf), evaluator.evaluate(predDt), predRf)
  }

  /** Thin wrapper so heterogeneous stage arrays read cleanly above. */
  final case class PipelineStageLike(stage: org.apache.spark.ml.PipelineStage)
}
