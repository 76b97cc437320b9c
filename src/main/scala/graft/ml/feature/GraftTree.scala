package graft.ml.feature

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, count, floor, lit, sum, when}
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType, StructField, StructType}

import graft.operators.Stump

/** Estimator/Model API over the depth-k histogram decision tree
  * (SURVEY.md §2 D279) — protocol surface #11, generalizing the
  * p17/p19 split-search recursion ([[graft.operators.Stump]]) to
  * configurable depth behind the reference's fit/transform/persistence
  * lifecycle (reference:
  * /root/reference/src/main/scala/org/apache/spark/ml/feature/RapidsPCA.scala:81-137,
  * the Estimator–Model–MLWritable protocol [[GraftPCA]] established).
  *
  * Training is [[Stump.fitTreeSplits]]: per level, ONE pass over the
  * domain-bounded bin histogram routes rows through a literal
  * threshold when-tree, an exact-integer cumulative scan finds each
  * node's best weighted-Gini split, and the ≤ 2^depth winners extend
  * the tree — the XGBoost-`hist` architecture (arXiv:1603.02754
  * §3.3): distributed histograms, centralized split decisions, no
  * per-row sort, per-level cost bounded by the value domain.
  *
  * Transform routes each row to its leaf with the same literal
  * when-tree (pure codegen, no shuffle, no join) and scores it with
  * the leaf's exact positive rate — left child = pl/nl, right child =
  * pr/nr off the parent's recorded split census, so model scoring and
  * the fitted censuses can never disagree. */
trait GraftTreeParams extends Params {
  final val maxDepth = new IntParam(this, "maxDepth",
    "tree depth: number of split levels (>= 1)", ParamValidators.gtEq(1))
  final val binWidth = new DoubleParam(this, "binWidth",
    "histogram bin width in feature units (> 0)", ParamValidators.gt(0.0))
  final val featuresCol = new Param[String](this, "featuresCol",
    "numeric feature column (binned by binWidth for the split search)")
  final val featureCols = new StringArrayParam(this, "featureCols",
    "multi-feature mode (D289): numeric feature columns the split " +
      "search argmins across; overrides featuresCol when set")
  final val binWidths = new DoubleArrayParam(this, "binWidths",
    "per-feature histogram bin widths for featureCols (same length); " +
      "defaults to binWidth for every feature",
    (ws: Array[Double]) => ws.forall(_ > 0.0))
  final val labelCol = new Param[String](this, "labelCol",
    "label column: binary {0,1} for lossType=gini, an integer-grid " +
      "numeric for lossType=variance")
  final val predictionCol = new Param[String](this, "predictionCol",
    "output prediction column name ({0,1} for gini; the rounded leaf " +
      "mean for variance)")
  final val probabilityCol = new Param[String](this, "probabilityCol",
    "output leaf-value column name (positive rate for gini; exact " +
      "leaf mean for variance)")
  final val lossType = new Param[String](this, "lossType",
    "split criterion (D294): 'gini' (binary label, weighted-Gini " +
      "splits) or 'variance' (integer-grid label, squared-error splits)",
    ParamValidators.inArray(Array("gini", "variance")))
  final val numBins = new IntParam(this, "numBins",
    "automatic quantile binning (D294): derive each feature's bin " +
      "edges as its exact k/numBins quantiles at fit time (overrides " +
      "binWidth/binWidths); the learned edges persist in the model so " +
      "scoring bins identically", ParamValidators.gtEq(2))

  setDefault(maxDepth -> 3, binWidth -> 100.0, lossType -> "gini",
    predictionCol -> "prediction", probabilityCol -> "probability")

  /** The (column, binWidth) pairs training and scoring bin by:
    * featureCols×binWidths in multi-feature mode, the single
    * featuresCol×binWidth otherwise. */
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

class GraftTree(override val uid: String)
    extends Estimator[GraftTreeModel] with GraftTreeParams with MLWritable {

  def this() = this(Identifiable.randomUID("graftTree"))

  def setMaxDepth(value: Int): this.type = set(maxDepth, value)
  def setBinWidth(value: Double): this.type = set(binWidth, value)
  def setFeaturesCol(value: String): this.type = set(featuresCol, value)
  def setFeatureCols(value: Array[String]): this.type = set(featureCols, value)
  def setBinWidths(value: Array[Double]): this.type = set(binWidths, value)
  def setLabelCol(value: String): this.type = set(labelCol, value)
  def setPredictionCol(value: String): this.type = set(predictionCol, value)
  def setProbabilityCol(value: String): this.type = set(probabilityCol, value)
  def setLossType(value: String): this.type = set(lossType, value)
  def setNumBins(value: Int): this.type = set(numBins, value)

  /** Learn per-feature quantile edges from the dataset (the D294 auto
    * binning): one bounded min/max pass sizes each feature's histogram
    * width, then exactPercentiles' two-phase machinery finds the
    * k/numBins edges without buffering any value set. */
  private def learnEdges(df: DataFrame,
      feats: Seq[String]): Array[Array[Double]] = {
    import org.apache.spark.sql.functions.{max, min}
    val b = $(numBins)
    val aggs = feats.flatMap(c => Seq(min(col(c).cast("double")),
      max(col(c).cast("double"))))
    val mm = df.agg(aggs.head, aggs.tail: _*).head()
    feats.indices.map { i =>
      val (mn, mx) =
        (if (mm.isNullAt(2 * i)) 0.0 else mm.getDouble(2 * i),
          if (mm.isNullAt(2 * i + 1)) 0.0 else mm.getDouble(2 * i + 1))
      val width = math.max((mx - mn) / 1024.0, java.lang.Double.MIN_NORMAL)
      graft.operators.RegTree.quantileEdges(
        df.select(col(feats(i)).cast("double").as("v")), b, width).toArray
    }.toArray
  }

  override def fit(dataset: Dataset[_]): GraftTreeModel = {
    transformSchema(dataset.schema, logging = true)
    require(dataset.schema.fieldNames.contains($(labelCol)),
      s"label column '${$(labelCol)}' not in ${dataset.schema.fieldNames.mkString(",")}")
    import graft.CacheScope.ScopedPersist
    val feats = effectiveFeatures
    val edges: Array[Array[Double]] =
      if (isSet(numBins)) learnEdges(dataset.toDF(), feats.map(_._1))
      else Array.empty
    def binCol(i: Int): Column =
      if (edges.nonEmpty)
        graft.operators.RegTree.quantileBin(
          col(feats(i)._1).cast("double"), edges(i).toSeq)
      else floor(col(feats(i)._1).cast("double") / feats(i)._2).cast("long")
    val (splits, rootCensus) =
      if ($(lossType) == "variance") {
        // D294: squared-error splits over the (possibly quantile-)
        // binned design; TreeSplit's pos/pl/pr fields carry Σy, so
        // leaf values are exact means through the same model shape
        val design = dataset.toDF().select(
          feats.indices.map(i => binCol(i).as(s"__f$i")) :+
            col($(labelCol)).cast("long").as("y"): _*)
          .scopedPersist()
        val sp = graft.operators.RegTree.fitRegTreeSplitsMulti(design,
          feats.indices.map(i => s"__f$i"), $(maxDepth))
        val census = () => {
          val t = design.agg(count(lit(1)), sum(col("y"))).head()
          (t.getLong(0), if (t.isNullAt(1)) 0L else t.getLong(1))
        }
        (sp, census)
      } else if (feats.length == 1 && edges.isEmpty) {
        // single feature: the domain-bounded histogram is computed
        // ONCE and every level re-routes it — strictly cheaper than
        // the multi-feature per-level re-census
        val hist = dataset.toDF().select(
            floor(col(feats.head._1).cast("double") / feats.head._2)
              .cast("long").as("bin"),
            col($(labelCol)).cast("long").as("y"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("cnt"), sum(col("y")).as("p"))
          .scopedPersist()
        val sp = Stump.fitTreeSplits(hist, $(maxDepth))
        val census = () => {
          val t = hist.agg(sum(col("cnt")), sum(col("p"))).head()
          (if (t.isNullAt(0)) 0L else t.getLong(0),
            if (t.isNullAt(1)) 0L else t.getLong(1))
        }
        (sp, census)
      } else {
        // multi-feature (D289): per-level re-census, argmin across
        // the d feature histograms
        val design = dataset.toDF().select(
          feats.indices.map(i => binCol(i).as(s"__f$i")) :+
            col($(labelCol)).cast("long").as("y"): _*)
          .scopedPersist()
        val sp = Stump.fitTreeSplitsMulti(design,
          feats.indices.map(i => s"__f$i"), $(maxDepth))
        val census = () => {
          val t = design.agg(count(lit(1)), sum(col("y"))).head()
          (t.getLong(0), if (t.isNullAt(1)) 0L else t.getLong(1))
        }
        (sp, census)
      }
    // root census even when the root is pure (no split to read it off)
    val (rootN, rootPos) = splits.headOption match {
      case Some(r) if r.node.isEmpty => (r.n, r.pos)
      case _ => rootCensus()
    }
    copyValues(new GraftTreeModel(uid, splits.toArray, rootN, rootPos,
      edges).setParent(this))
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): GraftTree = defaultCopy(extra)

  override def write: MLWriter = new GraftTree.Writer(this)
}

/** Fitted histogram tree: the complete split table (path-labeled
  * nodes with exact censuses and thresholds), the root census for the
  * pure-root edge, and — when fit with `numBins` — the learned
  * per-feature quantile edges, so scoring bins exactly as training
  * did. For lossType=variance the `pos`/`pl`/`pr` fields carry Σy and
  * a leaf's value is its exact mean. */
class GraftTreeModel private[feature] (override val uid: String,
    val splits: Array[Stump.TreeSplit], val rootN: Long, val rootPos: Long,
    val binEdges: Array[Array[Double]] = Array.empty)
    extends Model[GraftTreeModel] with GraftTreeParams with MLWritable {

  def setFeaturesCol(value: String): this.type = set(featuresCol, value)
  def setFeatureCols(value: Array[String]): this.type = set(featureCols, value)
  def setBinWidths(value: Array[Double]): this.type = set(binWidths, value)
  def setPredictionCol(value: String): this.type = set(predictionCol, value)
  def setProbabilityCol(value: String): this.type = set(probabilityCol, value)

  private lazy val byNode: Map[String, Stump.TreeSplit] =
    splits.map(s => s.node -> s).toMap

  /** Exact leaf value for a region with no further split — positive
    * rate (gini) or mean (variance), read off the parent's recorded
    * child census (one formula: pl/nl carries positives or Σy). */
  private def leafRate(path: String): Double =
    if (path.isEmpty) {
      if (rootN == 0L) 0.0 else rootPos.toDouble / rootN.toDouble
    } else {
      val s = byNode(path.dropRight(1))
      if (path.last == 'L') s.pl.toDouble / s.nl.toDouble
      else s.pr.toDouble / s.nr.toDouble
    }

  /** The literal routing when-tree over the per-feature bin columns —
    * pure codegen, ≤ 2^depth leaves, no join, no shuffle. */
  private def probCol(bins: Seq[Column]): Column = {
    def walk(path: String): Column = byNode.get(path) match {
      case Some(s) => when(bins(s.feature) <= lit(s.thresholdBin),
        walk(path + "L")).otherwise(walk(path + "R"))
      case None => lit(leafRate(path))
    }
    walk("")
  }

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema, logging = true)
    val feats = effectiveFeatures
    val bins = feats.indices.map { i =>
      if (binEdges.nonEmpty)
        graft.operators.RegTree.quantileBin(
          col(feats(i)._1).cast("double"), binEdges(i).toSeq)
      else floor(col(feats(i)._1).cast("double") / feats(i)._2).cast("long")
    }
    val p = probCol(bins)
    val pred =
      if ($(lossType) == "variance") floor(p + lit(0.5)).cast("long")
      else (p >= lit(0.5)).cast("long")
    dataset.toDF()
      .withColumn($(probabilityCol), p)
      .withColumn($(predictionCol), pred)
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): GraftTreeModel =
    copyValues(new GraftTreeModel(uid, splits, rootN, rootPos, binEdges),
      extra).setParent(parent)

  override def write: MLWriter = new GraftTreeModel.Writer(this)
}

/** Explicitly-set params, one parquet row (the GraftPCA layout). */
private[feature] case class TreeParamsData(uid: String,
    maxDepth: Option[Int], binWidth: Option[Double],
    featuresCol: Option[String], labelCol: Option[String],
    predictionCol: Option[String], probabilityCol: Option[String],
    featureCols: Option[Seq[String]] = None,
    binWidths: Option[Seq[Double]] = None,
    lossType: Option[String] = None,
    numBins: Option[Int] = None)

/** One persisted split row (Stump.TreeSplit, flattened for parquet). */
private[feature] case class TreeSplitData(node: String, depth: Int,
    thresholdBin: Long, n: Long, pos: Long, nl: Long, pl: Long,
    nr: Long, pr: Long, wgRaw: Double, pgRaw: Double,
    feature: Int = 0)

/** Fitted-model artifact: params + split table + root census +
  * learned quantile edges (empty = width binning). */
private[feature] case class TreeModelData(params: TreeParamsData,
    splits: Seq[TreeSplitData], rootN: Long, rootPos: Long,
    binEdges: Option[Seq[Seq[Double]]] = None)

object GraftTree extends MLReadable[GraftTree] {

  private[feature] def paramsData(
      p: GraftTreeParams with Params): TreeParamsData =
    TreeParamsData(p.uid, p.get(p.maxDepth), p.get(p.binWidth),
      p.get(p.featuresCol), p.get(p.labelCol), p.get(p.predictionCol),
      p.get(p.probabilityCol),
      p.get(p.featureCols).map(_.toSeq), p.get(p.binWidths).map(_.toSeq),
      p.get(p.lossType), p.get(p.numBins))

  private[feature] def restoreParams(t: GraftTreeParams,
      d: TreeParamsData): Unit = {
    d.maxDepth.foreach(v => t.set(t.maxDepth, v))
    d.binWidth.foreach(v => t.set(t.binWidth, v))
    d.featuresCol.foreach(v => t.set(t.featuresCol, v))
    d.labelCol.foreach(v => t.set(t.labelCol, v))
    d.predictionCol.foreach(v => t.set(t.predictionCol, v))
    d.probabilityCol.foreach(v => t.set(t.probabilityCol, v))
    d.featureCols.foreach(v => t.set(t.featureCols, v.toArray))
    d.binWidths.foreach(v => t.set(t.binWidths, v.toArray))
    d.lossType.foreach(v => t.set(t.lossType, v))
    d.numBins.foreach(v => t.set(t.numBins, v))
  }

  /** Pre-r15 artifacts lack the lossType/numBins columns (top level
    * at $path/params, nested under `params` in $path/data) — add them
    * as nulls before `.as[T]` (which does NOT apply Scala defaults). */
  private[feature] def backfillParamCols(df: org.apache.spark.sql.DataFrame,
      nested: Boolean): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.expr
    if (nested) {
      val pt = df.schema("params").dataType.asInstanceOf[StructType]
      if (pt.fieldNames.contains("lossType")) df
      else df.withColumn("params", expr(
        "struct(params.*, CAST(NULL AS STRING) AS lossType, " +
          "CAST(NULL AS INT) AS numBins)"))
    } else {
      if (df.schema.fieldNames.contains("lossType")) df
      else df.withColumn("lossType",
          org.apache.spark.sql.functions.lit(null).cast("string"))
        .withColumn("numBins",
          org.apache.spark.sql.functions.lit(null).cast("int"))
    }
  }

  private[feature] class Writer(instance: GraftTree) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      val spark = sparkSession
      import spark.implicits._
      Seq(paramsData(instance)).toDS()
        .repartition(1).write.mode("overwrite").parquet(s"$path/params")
      GraftPCA.writeMetadata(path, spark, instance)
    }
  }

  private class Reader extends MLReader[GraftTree] {
    override def load(path: String): GraftTree = {
      val spark = sparkSession
      import spark.implicits._
      val d = backfillParamCols(spark.read.parquet(s"$path/params"),
        nested = false).as[TreeParamsData].head()
      val e = new GraftTree(d.uid)
      restoreParams(e, d)
      e
    }
  }

  override def read: MLReader[GraftTree] = new Reader
  override def load(path: String): GraftTree = super.load(path)
}

object GraftTreeModel extends MLReadable[GraftTreeModel] {

  private[feature] class Writer(instance: GraftTreeModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      val spark = sparkSession
      import spark.implicits._
      Seq(TreeModelData(GraftTree.paramsData(instance),
          instance.splits.toSeq.map(s => TreeSplitData(s.node, s.depth,
            s.thresholdBin, s.n, s.pos, s.nl, s.pl, s.nr, s.pr,
            s.wgRaw, s.pgRaw, s.feature)),
          instance.rootN, instance.rootPos,
          if (instance.binEdges.isEmpty) None
          else Some(instance.binEdges.toSeq.map(_.toSeq)))).toDS()
        .repartition(1).write.mode("overwrite").parquet(s"$path/data")
      GraftPCA.writeMetadata(path, spark, instance)
    }
  }

  private class Reader extends MLReader[GraftTreeModel] {
    override def load(path: String): GraftTreeModel = {
      val spark = sparkSession
      import spark.implicits._
      // artifacts persisted before the multi-feature round lack the
      // nested `feature` field, and `.as[T]` does NOT apply Scala
      // default values (round-14 advisory) — backfill feature = 0
      // (the single-feature reading) before decoding; pre-r15
      // artifacts also lack lossType/numBins/binEdges
      var raw = spark.read.parquet(s"$path/data")
      val elem = raw.schema("splits").dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType]
        .elementType.asInstanceOf[StructType]
      if (!elem.fieldNames.contains("feature"))
        raw = raw.withColumn("splits",
          org.apache.spark.sql.functions.expr(
            "transform(splits, s -> struct(s.node AS node, " +
              "s.depth AS depth, s.thresholdBin AS thresholdBin, " +
              "s.n AS n, s.pos AS pos, s.nl AS nl, s.pl AS pl, " +
              "s.nr AS nr, s.pr AS pr, s.wgRaw AS wgRaw, " +
              "s.pgRaw AS pgRaw, 0 AS feature))"))
      raw = GraftTree.backfillParamCols(raw, nested = true)
      if (!raw.schema.fieldNames.contains("binEdges"))
        raw = raw.withColumn("binEdges",
          org.apache.spark.sql.functions.lit(null)
            .cast("array<array<double>>"))
      val d = raw.as[TreeModelData].head()
      val m = new GraftTreeModel(d.params.uid,
        d.splits.map(s => Stump.TreeSplit(s.node, s.depth, s.thresholdBin,
          s.n, s.pos, s.nl, s.pl, s.nr, s.pr, s.wgRaw, s.pgRaw,
          s.feature)).toArray,
        d.rootN, d.rootPos,
        d.binEdges.map(_.map(_.toArray).toArray).getOrElse(Array.empty))
      GraftTree.restoreParams(m, d.params)
      m
    }
  }

  override def read: MLReader[GraftTreeModel] = new Reader
  override def load(path: String): GraftTreeModel = super.load(path)
}
