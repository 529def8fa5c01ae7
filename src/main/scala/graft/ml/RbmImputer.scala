package graft.ml

import breeze.linalg.DenseMatrix
import graft.impute.{ColumnLayout, Encoding, ImputeSpec}
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable,
  Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.types.{ArrayType, DoubleType, StructType}

/** MLlib-style `Estimator`/`Model` pair for RBM-based missing-value
  * imputation — the Spark-native re-expression of the reference's
  * `clean()` API (upstream: boltzmannclean.py; SURVEY.md §3.1):
  * `new RbmImputer().setNumericCols(...).setCategoricalCols(...)
  * .fit(df).transform(df)` returns `df` with nulls/NaNs in the declared
  * columns replaced, all other cells and columns untouched.
  *
  * Execution shape (designed for the 1000-executor case):
  *  - `fit`: two light metadata passes (min/max agg; per-categorical
  *    top-K distinct) + one bounded `collect` of an encoded sample
  *    (`sampleLimit` rows — the RBM is a few-thousand-parameter model;
  *    a bounded uniform sample is statistically faithful at any SF),
  *    then driver-local Breeze CD-1 training. Nothing quadratic in
  *    cluster size; sample never exceeds `sampleLimit` rows regardless
  *    of input scale.
  *  - `transform`: weights broadcast once; reconstruction is a
  *    shuffle-free `mapPartitions` doing one batched Breeze GEMM per
  *    1024-row block; encode/merge/decode are Column projections inside
  *    whole-stage codegen.
  */
class RbmImputer(override val uid: String) extends Estimator[RbmImputerModel]
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("rbmImputer"))

  final val numericCols = new StringArrayParam(this, "numericCols",
    "numeric columns to impute (min-max scaled into [0,1])")
  final val categoricalCols = new StringArrayParam(this, "categoricalCols",
    "categorical columns to impute (one-hot encoded)")
  final val keyCol = new Param[String](this, "keyCol",
    "numeric key column driving deterministic noise fill")
  final val nHidden = new IntParam(this, "nHidden", "hidden units", ParamValidators.gt(0))
  final val learnRate = new DoubleParam(this, "learnRate", "learning rate", ParamValidators.gt(0))
  final val batchSize = new IntParam(this, "batchSize", "minibatch size", ParamValidators.gt(0))
  final val dropoutFraction = new DoubleParam(this, "dropoutFraction",
    "hidden-unit dropout probability", ParamValidators.inRange(0, 1))
  final val maxEpochs = new IntParam(this, "maxEpochs", "max training epochs", ParamValidators.gt(0))
  final val adagrad = new BooleanParam(this, "adagrad", "use AdaGrad updates")
  final val seed = new LongParam(this, "seed", "rng seed")
  final val sampleLimit = new IntParam(this, "sampleLimit",
    "max rows collected for driver-local training", ParamValidators.gt(0))
  final val maxCardinality = new IntParam(this, "maxCardinality",
    "one-hot width cap per categorical column", ParamValidators.gt(0))
  final val backend = new Param[String](this, "backend",
    "training backend: 'local' (bounded-sample, driver Breeze) or " +
      "'distributed' (treeAggregate data-parallel gradients)",
    ParamValidators.inArray(Array("local", "distributed")))

  setDefault(numericCols -> Array.empty[String], categoricalCols -> Array.empty[String],
    nHidden -> 16, learnRate -> 0.1, batchSize -> 64, dropoutFraction -> 0.5,
    maxEpochs -> 30, adagrad -> true, seed -> 42L, sampleLimit -> 100000,
    maxCardinality -> 10000, backend -> "local")

  def setNumericCols(v: Seq[String]): this.type = set(numericCols, v.toArray)
  def setCategoricalCols(v: Seq[String]): this.type = set(categoricalCols, v.toArray)
  def setKeyCol(v: String): this.type = set(keyCol, v)
  def setNHidden(v: Int): this.type = set(nHidden, v)
  def setLearnRate(v: Double): this.type = set(learnRate, v)
  def setBatchSize(v: Int): this.type = set(batchSize, v)
  def setDropoutFraction(v: Double): this.type = set(dropoutFraction, v)
  def setMaxEpochs(v: Int): this.type = set(maxEpochs, v)
  def setAdagrad(v: Boolean): this.type = set(adagrad, v)
  def setSeed(v: Long): this.type = set(seed, v)
  def setSampleLimit(v: Int): this.type = set(sampleLimit, v)
  def setMaxCardinality(v: Int): this.type = set(maxCardinality, v)
  def setBackend(v: String): this.type = set(backend, v)

  def spec: ImputeSpec =
    ImputeSpec($(numericCols).toSeq, $(categoricalCols).toSeq, $(maxCardinality))

  def rbmConfig: RbmCore.Config = RbmCore.Config(
    nHidden = $(nHidden), learnRate = $(learnRate), batchSize = $(batchSize),
    dropout = $(dropoutFraction), maxEpochs = $(maxEpochs), adagrad = $(adagrad),
    seed = $(seed))

  /** Layout fit + bounded-sample collect of encoded training matrices
    * (shared by plain fit and the tuner). count() is one cheap pass;
    * the sample fraction is padded 10% then truncated so the collect
    * stays <= sampleLimit rows at any SF. */
  private[ml] def collectTrainingData(df: org.apache.spark.sql.DataFrame)
      : (ColumnLayout, DenseMatrix[Double], DenseMatrix[Boolean]) = {
    val layout = Encoding.fitLayout(df, spec)
    val encoded = Encoding.encode(df, layout, $(keyCol))
      .select(Encoding.VCol, Encoding.KnownCol)
    val n = df.count()
    val lim = $(sampleLimit)
    val sampled =
      if (n <= lim) encoded
      else encoded.sample(withReplacement = false,
        math.min(1.0, lim.toDouble * 1.1 / n), $(seed)).limit(lim)
    val rows = sampled.collect()
    val m = rows.length
    val x = DenseMatrix.zeros[Double](m, layout.width)
    val known = DenseMatrix.fill[Boolean](m, layout.width)(true)
    var i = 0
    while (i < m) {
      val v = rows(i).getSeq[Double](0)
      val ku = Encoding.expandKnown(layout, rows(i).getSeq[Boolean](1).toIndexedSeq)
      var j = 0
      while (j < layout.width) { x(i, j) = v(j); known(i, j) = ku(j); j += 1 }
      i += 1
    }
    (layout, x, known)
  }

  private[ml] def buildModel(layout: ColumnLayout,
                             result: RbmCore.FitResult): RbmImputerModel = {
    val model = new RbmImputerModel(uid, layout, result.weights, result.epochErrors)
    model.setParent(this)
    copyValues(model)
  }

  override def fit(ds: Dataset[_]): RbmImputerModel = {
    val df = ds.toDF()
    if ($(backend) == "distributed") {
      val layout = Encoding.fitLayout(df, spec)
      val result = RbmCore.fitDistributed(
        Encoding.encode(df, layout, $(keyCol)), layout, rbmConfig)
      buildModel(layout, result)
    } else {
      val (layout, x, known) = collectTrainingData(df)
      buildModel(layout, RbmCore.fit(x, known, rbmConfig))
    }
  }

  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): RbmImputer = defaultCopy(extra)
}

/** Params-only stage, so stock MLlib persistence applies — makes the
  * unfitted estimator legal inside `Pipeline.save`. */
object RbmImputer extends DefaultParamsReadable[RbmImputer]

class RbmImputerModel(
    override val uid: String,
    val layout: ColumnLayout,
    val weights: RbmWeights,
    val epochErrors: Seq[Double]) extends Model[RbmImputerModel]
    with MLWritable {

  /** Key column is inherited from the estimator via copyValues. */
  final val keyCol = new Param[String](this, "keyCol",
    "numeric key column driving deterministic noise fill")
  def setKeyCol(v: String): this.type = set(keyCol, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val originalColumns = df.schema.fieldNames.toSeq
    val encoded = Encoding.encode(df, layout, $(keyCol))
    val outSchema = encoded.schema.add(Encoding.ReconCol, ArrayType(DoubleType, false))
    val bc = df.sparkSession.sparkContext.broadcast(weights)
    val vIdx = encoded.schema.fieldIndex(Encoding.VCol)
    val width = layout.width
    val reconDf = encoded.mapPartitions { it: Iterator[Row] =>
      it.grouped(1024).flatMap { batch =>
        val v = DenseMatrix.tabulate(batch.size, width)(
          (r, c) => batch(r).getSeq[Double](vIdx)(c))
        val recon = RbmCore.reconstruct(bc.value, v)
        batch.iterator.zipWithIndex.map { case (row, r) =>
          Row.fromSeq(row.toSeq :+ (0 until width).map(recon(r, _)))
        }
      }
    }(Encoders.row(outSchema))
    Encoding.decode(reconDf, layout, originalColumns)
  }

  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): RbmImputerModel = {
    val copied = new RbmImputerModel(uid, layout, weights, epochErrors)
    copyValues(copied, extra).setParent(parent)
  }

  /** MLlib-standard persistence (`model.write.save(path)`): metadata in
    * the DefaultParams JSON layout (so `PipelineModel.load` can resolve
    * this class reflectively — the model is a legal stage of a persisted
    * MLlib `Pipeline`) plus one inspectable parquet row of structural
    * state (layout, weights) under `path/data`. */
  override def write: MLWriter = new RbmImputerModel.Writer(this)
}

object RbmImputerModel extends MLReadable[RbmImputerModel] {
  private[ml] case class ModelData(
      uid: String, keyColName: String,
      numericNames: Seq[String], numericMins: Seq[Double], numericMaxs: Seq[Double],
      catNames: Seq[String], catValues: Seq[Seq[String]],
      nVisible: Int, nHidden: Int,
      w: Seq[Double], vBias: Seq[Double], hBias: Seq[Double],
      epochErrors: Seq[Double])

  private def modelData(m: RbmImputerModel): ModelData = ModelData(
    uid = m.uid,
    keyColName = m.getOrDefault(m.keyCol),
    numericNames = m.layout.numerics.map(_.name),
    numericMins = m.layout.numerics.map(_.min),
    numericMaxs = m.layout.numerics.map(_.max),
    catNames = m.layout.categoricals.map(_.name),
    catValues = m.layout.categoricals.map(_.values),
    nVisible = m.weights.nVisible,
    nHidden = m.weights.nHidden,
    w = m.weights.w.toArray.toSeq, // column-major
    vBias = m.weights.vBias.toArray.toSeq,
    hBias = m.weights.hBias.toArray.toSeq,
    epochErrors = m.epochErrors)

  private def fromData(d: ModelData): RbmImputerModel = {
    val layout = ColumnLayout(
      d.numericNames.indices.map(i =>
        graft.impute.NumericStats(d.numericNames(i), d.numericMins(i), d.numericMaxs(i))),
      d.catNames.indices.map(i =>
        graft.impute.CategoryInfo(d.catNames(i), d.catValues(i))))
    val weights = RbmWeights(
      new breeze.linalg.DenseMatrix(d.nVisible, d.nHidden, d.w.toArray),
      breeze.linalg.DenseVector(d.vBias.toArray),
      breeze.linalg.DenseVector(d.hBias.toArray))
    new RbmImputerModel(d.uid, layout, weights, d.epochErrors)
      .setKeyCol(d.keyColName)
  }

  /** Writes `path/metadata` in the exact JSON layout MLlib's (private)
    * DefaultParamsWriter produces — `{class, timestamp, sparkVersion,
    * uid, paramMap, defaultParamMap}` — which is what PipelineModel.load
    * parses to resolve the stage class before dispatching to [[read]].
    * The helpers themselves are private[ml], but the on-disk layout is
    * MLlib's cross-version persistence contract. */
  private class Writer(instance: RbmImputerModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      import org.json4s._
      import org.json4s.JsonDSL._
      import org.json4s.jackson.JsonMethods._
      def enc(pp: ParamPair[_]): (String, JValue) =
        pp.param.name -> parse(pp.param.asInstanceOf[Param[Any]].jsonEncode(pp.value))
      val metadata: JValue =
        ("class" -> instance.getClass.getName) ~
        ("timestamp" -> System.currentTimeMillis()) ~
        ("sparkVersion" -> sc.version) ~
        ("uid" -> instance.uid) ~
        ("paramMap" -> JObject(instance.extractParamMap().toSeq.map(enc).toList)) ~
        ("defaultParamMap" -> JObject(Nil))
      sc.parallelize(Seq(compact(render(metadata))), 1)
        .saveAsTextFile(new org.apache.hadoop.fs.Path(path, "metadata").toString)
      val spark = sparkSession
      import spark.implicits._
      Seq(modelData(instance)).toDS().write
        .parquet(new org.apache.hadoop.fs.Path(path, "data").toString)
    }
  }

  private class Reader extends MLReader[RbmImputerModel] {
    override def load(path: String): RbmImputerModel = {
      val spark = sparkSession
      import spark.implicits._
      fromData(spark.read
        .parquet(new org.apache.hadoop.fs.Path(path, "data").toString)
        .as[ModelData].head())
    }
  }

  override def read: MLReader[RbmImputerModel] = new Reader
  override def load(path: String): RbmImputerModel = super.load(path)

  /** Legacy two-arg loader, kept for callers that pass the session. */
  def load(spark: SparkSession, path: String): RbmImputerModel =
    read.load(path)
}
