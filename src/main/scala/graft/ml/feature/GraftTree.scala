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
    "binary {0,1} label column")
  final val predictionCol = new Param[String](this, "predictionCol",
    "output {0,1} prediction column name")
  final val probabilityCol = new Param[String](this, "probabilityCol",
    "output leaf-positive-rate probability column name")

  setDefault(maxDepth -> 3, binWidth -> 100.0,
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

  override def fit(dataset: Dataset[_]): GraftTreeModel = {
    transformSchema(dataset.schema, logging = true)
    require(dataset.schema.fieldNames.contains($(labelCol)),
      s"label column '${$(labelCol)}' not in ${dataset.schema.fieldNames.mkString(",")}")
    import graft.CacheScope.ScopedPersist
    val feats = effectiveFeatures
    val (splits, rootCensus) =
      if (feats.length == 1) {
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
          feats.zipWithIndex.map { case ((c, w), i) =>
            floor(col(c).cast("double") / w).cast("long").as(s"__f$i")
          } :+ col($(labelCol)).cast("long").as("y"): _*)
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
    copyValues(new GraftTreeModel(uid, splits.toArray, rootN, rootPos)
      .setParent(this))
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): GraftTree = defaultCopy(extra)

  override def write: MLWriter = new GraftTree.Writer(this)
}

/** Fitted histogram tree: the complete split table (path-labeled
  * nodes with exact censuses and thresholds) plus the root census for
  * the pure-root edge. */
class GraftTreeModel private[feature] (override val uid: String,
    val splits: Array[Stump.TreeSplit], val rootN: Long, val rootPos: Long)
    extends Model[GraftTreeModel] with GraftTreeParams with MLWritable {

  def setFeaturesCol(value: String): this.type = set(featuresCol, value)
  def setFeatureCols(value: Array[String]): this.type = set(featureCols, value)
  def setBinWidths(value: Array[Double]): this.type = set(binWidths, value)
  def setPredictionCol(value: String): this.type = set(predictionCol, value)
  def setProbabilityCol(value: String): this.type = set(probabilityCol, value)

  private lazy val byNode: Map[String, Stump.TreeSplit] =
    splits.map(s => s.node -> s).toMap

  /** Exact leaf positive rate for a region with no further split:
    * read off the parent's recorded child census. */
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
    val bins = effectiveFeatures.map { case (c, w) =>
      floor(col(c).cast("double") / w).cast("long") }
    val p = probCol(bins)
    dataset.toDF()
      .withColumn($(probabilityCol), p)
      .withColumn($(predictionCol), (p >= lit(0.5)).cast("long"))
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): GraftTreeModel =
    copyValues(new GraftTreeModel(uid, splits, rootN, rootPos), extra)
      .setParent(parent)

  override def write: MLWriter = new GraftTreeModel.Writer(this)
}

/** Explicitly-set params, one parquet row (the GraftPCA layout). */
private[feature] case class TreeParamsData(uid: String,
    maxDepth: Option[Int], binWidth: Option[Double],
    featuresCol: Option[String], labelCol: Option[String],
    predictionCol: Option[String], probabilityCol: Option[String],
    featureCols: Option[Seq[String]] = None,
    binWidths: Option[Seq[Double]] = None)

/** One persisted split row (Stump.TreeSplit, flattened for parquet). */
private[feature] case class TreeSplitData(node: String, depth: Int,
    thresholdBin: Long, n: Long, pos: Long, nl: Long, pl: Long,
    nr: Long, pr: Long, wgRaw: Double, pgRaw: Double,
    feature: Int = 0)

/** Fitted-model artifact: params + split table + root census. */
private[feature] case class TreeModelData(params: TreeParamsData,
    splits: Seq[TreeSplitData], rootN: Long, rootPos: Long)

object GraftTree extends MLReadable[GraftTree] {

  private[feature] def paramsData(
      p: GraftTreeParams with Params): TreeParamsData =
    TreeParamsData(p.uid, p.get(p.maxDepth), p.get(p.binWidth),
      p.get(p.featuresCol), p.get(p.labelCol), p.get(p.predictionCol),
      p.get(p.probabilityCol),
      p.get(p.featureCols).map(_.toSeq), p.get(p.binWidths).map(_.toSeq))

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
      val d = spark.read.parquet(s"$path/params").as[TreeParamsData].head()
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
          instance.rootN, instance.rootPos)).toDS()
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
      // (the single-feature reading) before decoding
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
      val d = raw.as[TreeModelData].head()
      val m = new GraftTreeModel(d.params.uid,
        d.splits.map(s => Stump.TreeSplit(s.node, s.depth, s.thresholdBin,
          s.n, s.pos, s.nl, s.pl, s.nr, s.pr, s.wgRaw, s.pgRaw,
          s.feature)).toArray,
        d.rootN, d.rootPos)
      GraftTree.restoreParams(m, d.params)
      m
    }
  }

  override def read: MLReader[GraftTreeModel] = new Reader
  override def load(path: String): GraftTreeModel = super.load(path)
}
