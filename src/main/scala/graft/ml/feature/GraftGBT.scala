package graft.ml.feature

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, count, floor, lit, sum, when}
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType, StructField, StructType}

import graft.operators.Gbt

/** Estimator/Model API over the exact-integer gradient-boosted stumps
  * (SURVEY.md §2 D281) — protocol surface #12, completing the tree
  * family [[GraftTree]] (#11) opened, behind the reference's
  * fit/transform/persistence lifecycle (reference:
  * /root/reference/src/main/scala/org/apache/spark/ml/feature/RapidsPCA.scala:81-137).
  *
  * Training is [[Gbt.fitGbt]]: T rounds of least-squares stumps on
  * the residuals of the running per-mille-grid integer prediction,
  * learning rate ½, every census an exact long off the same
  * domain-bounded bin histogram (Friedman 2001; the histogram
  * formulation is XGBoost-`hist`, arXiv:1603.02754 §3.3).
  *
  * Transform evaluates the additive model as a literal expression —
  * the base floor-mean plus one `when(bin <= thr, dl, dr)` term per
  * round (pure codegen, no shuffle, no join) — emitting the per-mille
  * score as a [0-ish..1-ish] probability and a 0.5-threshold
  * prediction. Scoring uses the integer adjustments training
  * committed, so model output and fitted state can never disagree. */
trait GraftGBTParams extends Params {
  final val maxIter = new IntParam(this, "maxIter",
    "boosting rounds (1 to Gbt.gbtMaxRounds): the exact-integer " +
      "residual grid supports at most 25 rounds before the worst-case " +
      "drift envelope could overflow the Long census",
    ParamValidators.inRange(1, Gbt.gbtMaxRounds))
  final val binWidth = new DoubleParam(this, "binWidth",
    "histogram bin width in feature units (> 0)", ParamValidators.gt(0.0))
  final val featuresCol = new Param[String](this, "featuresCol",
    "numeric feature column (binned by binWidth for the split search)")
  final val featureCols = new StringArrayParam(this, "featureCols",
    "multi-feature mode (D290): numeric feature columns each round's " +
      "split search argmins across; overrides featuresCol when set")
  final val binWidths = new DoubleArrayParam(this, "binWidths",
    "per-feature histogram bin widths for featureCols (same length); " +
      "defaults to binWidth for every feature",
    (ws: Array[Double]) => ws.forall(_ > 0.0))
  final val labelCol = new Param[String](this, "labelCol",
    "label column: binary {0,1} for lossType=binary, an integer-grid " +
      "numeric for lossType=variance")
  final val predictionCol = new Param[String](this, "predictionCol",
    "output prediction column name ({0,1} for binary; the rounded " +
      "predicted label for variance)")
  final val probabilityCol = new Param[String](this, "probabilityCol",
    "output boosted-score column name (per-mille grid / 1000 for " +
      "binary; the predicted label value for variance)")
  final val lossType = new Param[String](this, "lossType",
    "loss (D295): 'binary' (binary {0,1} label on the fixed per-mille " +
      "grid) or 'variance' (continuous integer-grid label, " +
      "squared-error regression boosting)",
    ParamValidators.inArray(Array("binary", "variance")))
  final val labelGrid = new LongParam(this, "labelGrid",
    "variance loss: integer grid multiplier applied to the label " +
      "(yg = label * labelGrid; finer grids give finer leaf values)",
    ParamValidators.gtEq(1))
  final val labelBound = new LongParam(this, "labelBound",
    "variance loss: declared bound on |label * labelGrid| — sizes the " +
      "exact-arithmetic shift (fit fails loudly if data exceeds it)",
    ParamValidators.gtEq(1))

  setDefault(maxIter -> Gbt.gbtRounds, binWidth -> 100.0,
    lossType -> "binary", labelGrid -> 100L,
    predictionCol -> "prediction", probabilityCol -> "probability")

  /** The (column, binWidth) pairs training and scoring bin by. */
  protected def effectiveFeatures: Seq[(String, Double)] =
    if (isSet(featureCols)) {
      val cols = $(featureCols).toSeq
      require(cols.nonEmpty, "featureCols must be non-empty")
      val ws =
        if (isSet(binWidths)) $(binWidths).toSeq
        else Seq.fill(cols.length)($(binWidth))
      require(ws.length == cols.length,
        s"binWidths has ${ws.length} entries for ${cols.length} featureCols")
      cols.zip(ws)
    } else Seq(($(featuresCol), $(binWidth)))

  protected def validateFeatures(schema: StructType): Unit =
    effectiveFeatures.foreach { case (c, _) =>
      require(schema.fieldNames.contains(c),
        s"features column '$c' not in ${schema.fieldNames.mkString(",")}")
      schema(c).dataType match {
        case _: NumericType => ()
        case other => throw new IllegalArgumentException(
          s"features column '$c' must be numeric, got $other")
      }
    }

  protected def validateAndTransformSchema(schema: StructType): StructType = {
    validateFeatures(schema)
    Seq($(predictionCol), $(probabilityCol)).foreach { c =>
      require(!schema.fieldNames.contains(c),
        s"output column '$c' already exists")
    }
    StructType(schema.fields ++ Seq(
      StructField($(probabilityCol), DoubleType, nullable = false),
      StructField($(predictionCol), LongType, nullable = false)))
  }
}

class GraftGBT(override val uid: String)
    extends Estimator[GraftGBTModel] with GraftGBTParams with MLWritable {

  def this() = this(Identifiable.randomUID("graftGBT"))

  def setMaxIter(value: Int): this.type = set(maxIter, value)
  def setBinWidth(value: Double): this.type = set(binWidth, value)
  def setFeaturesCol(value: String): this.type = set(featuresCol, value)
  def setFeatureCols(value: Array[String]): this.type = set(featureCols, value)
  def setBinWidths(value: Array[Double]): this.type = set(binWidths, value)
  def setLabelCol(value: String): this.type = set(labelCol, value)
  def setPredictionCol(value: String): this.type = set(predictionCol, value)
  def setProbabilityCol(value: String): this.type = set(probabilityCol, value)
  def setLossType(value: String): this.type = set(lossType, value)
  def setLabelGrid(value: Long): this.type = set(labelGrid, value)
  def setLabelBound(value: Long): this.type = set(labelBound, value)

  override def fit(dataset: Dataset[_]): GraftGBTModel = {
    transformSchema(dataset.schema, logging = true)
    require(dataset.schema.fieldNames.contains($(labelCol)),
      s"label column '${$(labelCol)}' not in ${dataset.schema.fieldNames.mkString(",")}")
    import graft.CacheScope.ScopedPersist
    val feats = effectiveFeatures
    val (f0, rounds) =
      if ($(lossType) == "variance") {
        // D295: regression boosting on the declared integer grid
        require(isSet(labelBound),
          "lossType=variance needs labelBound (the declared bound on " +
            "|label * labelGrid| that sizes the exact-arithmetic shift)")
        val design = dataset.toDF().select(
          feats.zipWithIndex.map { case ((c, w), i) =>
            floor(col(c).cast("double") / w).cast("long").as(s"__f$i")
          } :+ (col($(labelCol)).cast("long") * lit($(labelGrid)))
            .as("yg"): _*)
          .scopedPersist()
        graft.operators.RegTree.fitRegGbtMulti(design,
          feats.indices.map(i => s"__f$i"), $(maxIter), $(labelBound))
      } else if (feats.length == 1) {
        // single feature: one domain-bounded histogram serves every
        // round (per-bin F is well-defined) — cheaper than re-censusing
        val hist = dataset.toDF().select(
            floor(col(feats.head._1).cast("double") / feats.head._2)
              .cast("long").as("bin"),
            col($(labelCol)).cast("long").as("y"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("cnt"), sum(col("y")).as("p"))
        Gbt.fitGbt(hist.scopedPersist(), $(maxIter))
      } else {
        // multi-feature (D290): per-round re-census, argmin across
        // the d residual histograms
        val design = dataset.toDF().select(
          feats.zipWithIndex.map { case ((c, w), i) =>
            floor(col(c).cast("double") / w).cast("long").as(s"__f$i")
          } :+ col($(labelCol)).cast("long").as("y"): _*)
          .scopedPersist()
        Gbt.fitGbtMulti(design, feats.indices.map(i => s"__f$i"),
          $(maxIter))
      }
    copyValues(new GraftGBTModel(uid, f0, rounds.toArray).setParent(this))
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): GraftGBT = defaultCopy(extra)

  override def write: MLWriter = new GraftGBT.Writer(this)
}

/** Fitted boosted-stump ensemble: the base per-mille prediction plus
  * one (threshold, leaf values) round per boosting iteration. */
class GraftGBTModel private[feature] (override val uid: String,
    val baseF: Long, val rounds: Array[Gbt.GbtRound])
    extends Model[GraftGBTModel] with GraftGBTParams with MLWritable {

  def setFeaturesCol(value: String): this.type = set(featuresCol, value)
  def setFeatureCols(value: Array[String]): this.type = set(featureCols, value)
  def setBinWidths(value: Array[Double]): this.type = set(binWidths, value)
  def setPredictionCol(value: String): this.type = set(predictionCol, value)
  def setProbabilityCol(value: String): this.type = set(probabilityCol, value)

  /** The additive per-mille score as a literal expression chain over
    * the per-feature bin columns. */
  private def scoreCol(bins: Seq[Column]): Column =
    rounds.foldLeft(lit(baseF)) { (f, r) =>
      val (dl, dr) = Gbt.adjustments(r)
      f + when(bins(r.feature) <= lit(r.thresholdBin), lit(dl))
        .otherwise(lit(dr))
    }

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema, logging = true)
    val bins = effectiveFeatures.map { case (c, w) =>
      floor(col(c).cast("double") / w).cast("long") }
    val f = scoreCol(bins)
    if ($(lossType) == "variance") {
      // the additive score lives on the labelGrid: surface the
      // predicted label value and its half-up rounding
      val score = f.cast("double") / lit($(labelGrid).toDouble)
      dataset.toDF()
        .withColumn($(probabilityCol), score)
        .withColumn($(predictionCol), floor(score + lit(0.5)).cast("long"))
    } else
      dataset.toDF()
        .withColumn($(probabilityCol), f.cast("double") / lit(1000.0))
        .withColumn($(predictionCol), (f >= lit(500L)).cast("long"))
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): GraftGBTModel =
    copyValues(new GraftGBTModel(uid, baseF, rounds), extra)
      .setParent(parent)

  override def write: MLWriter = new GraftGBTModel.Writer(this)
}

/** Explicitly-set params, one parquet row (the GraftPCA layout). */
private[feature] case class GBTParamsData(uid: String,
    maxIter: Option[Int], binWidth: Option[Double],
    featuresCol: Option[String], labelCol: Option[String],
    predictionCol: Option[String], probabilityCol: Option[String],
    featureCols: Option[Seq[String]] = None,
    binWidths: Option[Seq[Double]] = None,
    lossType: Option[String] = None,
    labelGrid: Option[Long] = None,
    labelBound: Option[Long] = None)

/** One persisted boosting round (Gbt.GbtRound, flattened). */
private[feature] case class GBTRoundData(round: Int, thresholdBin: Long,
    nLeft: Long, nRight: Long, vLeft: Long, vRight: Long, sseAfter: Long,
    feature: Int = 0)

/** Fitted-model artifact: params + base prediction + round table. */
private[feature] case class GBTModelData(params: GBTParamsData,
    baseF: Long, rounds: Seq[GBTRoundData])

object GraftGBT extends MLReadable[GraftGBT] {

  private[feature] def paramsData(
      p: GraftGBTParams with Params): GBTParamsData =
    GBTParamsData(p.uid, p.get(p.maxIter), p.get(p.binWidth),
      p.get(p.featuresCol), p.get(p.labelCol), p.get(p.predictionCol),
      p.get(p.probabilityCol),
      p.get(p.featureCols).map(_.toSeq), p.get(p.binWidths).map(_.toSeq),
      p.get(p.lossType), p.get(p.labelGrid), p.get(p.labelBound))

  private[feature] def restoreParams(t: GraftGBTParams,
      d: GBTParamsData): Unit = {
    d.maxIter.foreach(v => t.set(t.maxIter, v))
    d.binWidth.foreach(v => t.set(t.binWidth, v))
    d.featuresCol.foreach(v => t.set(t.featuresCol, v))
    d.labelCol.foreach(v => t.set(t.labelCol, v))
    d.predictionCol.foreach(v => t.set(t.predictionCol, v))
    d.probabilityCol.foreach(v => t.set(t.probabilityCol, v))
    d.featureCols.foreach(v => t.set(t.featureCols, v.toArray))
    d.binWidths.foreach(v => t.set(t.binWidths, v.toArray))
    d.lossType.foreach(v => t.set(t.lossType, v))
    d.labelGrid.foreach(v => t.set(t.labelGrid, v))
    d.labelBound.foreach(v => t.set(t.labelBound, v))
  }

  /** Pre-r15 artifacts lack the lossType/labelGrid/labelBound columns
    * — add them as nulls before `.as[T]` (which does NOT apply Scala
    * defaults). */
  private[feature] def backfillParamCols(df: org.apache.spark.sql.DataFrame,
      nested: Boolean): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{expr, lit}
    if (nested) {
      val pt = df.schema("params").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      if (pt.fieldNames.contains("lossType")) df
      else df.withColumn("params", expr(
        "struct(params.*, CAST(NULL AS STRING) AS lossType, " +
          "CAST(NULL AS BIGINT) AS labelGrid, " +
          "CAST(NULL AS BIGINT) AS labelBound)"))
    } else {
      if (df.schema.fieldNames.contains("lossType")) df
      else df.withColumn("lossType", lit(null).cast("string"))
        .withColumn("labelGrid", lit(null).cast("bigint"))
        .withColumn("labelBound", lit(null).cast("bigint"))
    }
  }

  private[feature] class Writer(instance: GraftGBT) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      val spark = sparkSession
      import spark.implicits._
      Seq(paramsData(instance)).toDS()
        .repartition(1).write.mode("overwrite").parquet(s"$path/params")
      GraftPCA.writeMetadata(path, spark, instance)
    }
  }

  private class Reader extends MLReader[GraftGBT] {
    override def load(path: String): GraftGBT = {
      val spark = sparkSession
      import spark.implicits._
      val d = backfillParamCols(spark.read.parquet(s"$path/params"),
        nested = false).as[GBTParamsData].head()
      val e = new GraftGBT(d.uid)
      restoreParams(e, d)
      e
    }
  }

  override def read: MLReader[GraftGBT] = new Reader
  override def load(path: String): GraftGBT = super.load(path)
}

object GraftGBTModel extends MLReadable[GraftGBTModel] {

  private[feature] class Writer(instance: GraftGBTModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      val spark = sparkSession
      import spark.implicits._
      Seq(GBTModelData(GraftGBT.paramsData(instance), instance.baseF,
          instance.rounds.toSeq.map(r => GBTRoundData(r.round,
            r.thresholdBin, r.nLeft, r.nRight, r.vLeft, r.vRight,
            r.sseAfter, r.feature)))).toDS()
        .repartition(1).write.mode("overwrite").parquet(s"$path/data")
      GraftPCA.writeMetadata(path, spark, instance)
    }
  }

  private class Reader extends MLReader[GraftGBTModel] {
    override def load(path: String): GraftGBTModel = {
      val spark = sparkSession
      import spark.implicits._
      // artifacts persisted before the multi-feature round lack the
      // nested `feature` field, and `.as[T]` does NOT apply Scala
      // default values (round-14 advisory) — backfill feature = 0
      // (the single-feature reading) before decoding
      var raw = spark.read.parquet(s"$path/data")
      val elem = raw.schema("rounds").dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType]
        .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
      if (!elem.fieldNames.contains("feature"))
        raw = raw.withColumn("rounds",
          org.apache.spark.sql.functions.expr(
            "transform(rounds, r -> struct(r.round AS round, " +
              "r.thresholdBin AS thresholdBin, r.nLeft AS nLeft, " +
              "r.nRight AS nRight, r.vLeft AS vLeft, " +
              "r.vRight AS vRight, r.sseAfter AS sseAfter, " +
              "0 AS feature))"))
      raw = GraftGBT.backfillParamCols(raw, nested = true)
      val d = raw.as[GBTModelData].head()
      val m = new GraftGBTModel(d.params.uid, d.baseF,
        d.rounds.map(r => Gbt.GbtRound(r.round, r.thresholdBin, r.nLeft,
          r.nRight, r.vLeft, r.vRight, r.sseAfter, r.feature)).toArray)
      GraftGBT.restoreParams(m, d.params)
      m
    }
  }

  override def read: MLReader[GraftGBTModel] = new Reader
  override def load(path: String): GraftGBTModel = super.load(path)
}
