package graft.functions

import java.nio.ByteBuffer
import java.util.Locale

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's ML function surface (presto-ml): `learn_classifier` /
  * `learn_varchar_classifier` / `learn_regressor` aggregates producing a
  * model value, `classify` / `regress` scalars applying it, `features(...)`
  * building the `map(bigint,double)` feature vector, and
  * `evaluate_classifier_predictions` summarizing a prediction column
  * (MLFunctions.java:41-72, LearnClassifierAggregation.java:30,
  * MLFeaturesFunctions.java, EvaluateClassifierPredictionsAggregation.java:97).
  *
  * Deliberate re-design, not a translation: the reference trains with
  * in-memory libsvm and its combine function THROWS — "LEARN must run on a
  * single machine" (LearnClassifierAggregation.java:56), so on a cluster
  * the whole training set funnels through one node. Here both learners
  * accumulate MERGEABLE sufficient statistics, so training distributes
  * like any Spark aggregate and the state is KB-bounded regardless of
  * row count — the 100 TB story the reference's version lacks:
  *
  *  - classifier: Fisher/Gaussian LDA from per-class counts + per-class
  *    feature sums + one global ΣxxT matrix (within-class scatter =
  *    ΣxxT − Σ_c n_c μ_c μ_cT). Closed-form, deterministic, linear
  *    decision functions like the reference's linear-kernel default.
  *  - regressor: ridge-regularized least squares from the (XᵀX, Xᵀy)
  *    normal equations over [1,x] — where the reference trains epsilon-SVR
  *    (a different loss; documented deviation, pinned by spec).
  *
  * State size is O(k·d + d²) for k classes and d features (d capped at
  * `MaxDim`), independent of input rows. Models serialize to a versioned
  * varbinary so they can be stored, joined, and broadcast like any value
  * (the reference's Classifier<bigint>/Regressor types are also just
  * serialized blobs over VARBINARY).
  */
object MlModel {
  /** Feature-dimension cap: state is O(d²) doubles; 1024 → 8 MiB, the
    * bound that keeps executor-side merge safe. The reference has no cap
    * (it buffers whole ROWS instead — strictly worse). */
  val MaxDim = 1024

  val KindClassifier = 1
  val KindVarcharClassifier = 2
  val KindRegressor = 3

  /** Read a sparse map(bigint,double) feature vector into `into`
    * (positions past into.length raise; negative keys raise). Returns the
    * max key + 1 seen. */
  def readFeatures(m: MapData, into: Array[Double]): Int = {
    val keys = m.keyArray()
    val vals = m.valueArray()
    var maxd = 0
    var i = 0
    while (i < m.numElements()) {
      val k = keys.getLong(i)
      if (k < 0 || k >= MaxDim) throw new IllegalArgumentException(
        s"ml feature key out of range [0, $MaxDim): $k")
      if (k >= into.length) throw new IllegalArgumentException(
        s"ml feature key $k exceeds model/state dimension ${into.length}")
      into(k.toInt) = if (vals.isNullAt(i)) 0.0 else vals.getDouble(i)
      if (k + 1 > maxd) maxd = (k + 1).toInt
      i += 1
    }
    maxd
  }

  private def maxKeyPlus1(m: MapData): Int = {
    val keys = m.keyArray()
    var maxd = 0
    var i = 0
    while (i < m.numElements()) {
      val k = keys.getLong(i)
      if (k < 0 || k >= MaxDim) throw new IllegalArgumentException(
        s"ml feature key out of range [0, $MaxDim): $k")
      if (k + 1 > maxd) maxd = (k + 1).toInt
      i += 1
    }
    maxd
  }

  /** Solve A·x = b in place for several right-hand sides (Gaussian
    * elimination with partial pivoting; A is d×d row-major and is
    * destroyed). Small-d driver-free math — runs inside the aggregate's
    * final eval, once per group. */
  def solveInPlace(a: Array[Double], d: Int, bs: Array[Array[Double]]): Unit = {
    var col = 0
    while (col < d) {
      var piv = col
      var best = math.abs(a(col * d + col))
      var r = col + 1
      while (r < d) {
        val v = math.abs(a(r * d + col))
        if (v > best) { best = v; piv = r }
        r += 1
      }
      if (best == 0.0) throw new IllegalStateException(
        "ml training: singular normal-equation matrix (degenerate features)")
      if (piv != col) {
        var j = 0
        while (j < d) {
          val t = a(col * d + j); a(col * d + j) = a(piv * d + j); a(piv * d + j) = t
          j += 1
        }
        bs.foreach { b => val t = b(col); b(col) = b(piv); b(piv) = t }
      }
      val diag = a(col * d + col)
      r = 0
      while (r < d) {
        if (r != col) {
          val f = a(r * d + col) / diag
          if (f != 0.0) {
            var j = col
            while (j < d) { a(r * d + j) -= f * a(col * d + j); j += 1 }
            bs.foreach { b => b(r) -= f * b(col) }
          }
        }
        r += 1
      }
      col += 1
    }
    bs.foreach { b =>
      var i = 0
      while (i < d) { b(i) /= a(i * d + i); i += 1 }
    }
  }

  // ---------- classifier state (mergeable LDA sufficient statistics) ----

  final class ClsStat(var n: Long, var sum: Array[Double])

  final class LdaState {
    var dim = 0
    var n = 0L
    var xx: Array[Double] = Array.emptyDoubleArray // dim*dim, row-major
    // TreeMap: label order (and so tie-breaks + model bytes) is
    // deterministic regardless of partition/merge order
    val classes = new java.util.TreeMap[String, ClsStat]()

    def grow(d: Int): Unit = if (d > dim) {
      if (d > MaxDim) throw new IllegalArgumentException(
        s"ml training: feature dimension $d exceeds cap $MaxDim")
      val nxx = new Array[Double](d * d)
      var r = 0
      while (r < dim) {
        System.arraycopy(xx, r * dim, nxx, r * d, dim)
        r += 1
      }
      xx = nxx
      classes.forEach((_, st) => st.sum = java.util.Arrays.copyOf(st.sum, d))
      dim = d
    }

    def update(label: String, m: MapData): Unit = {
      grow(maxKeyPlus1(m))
      val x = new Array[Double](dim)
      readFeatures(m, x)
      n += 1
      var r = 0
      while (r < dim) {
        val xr = x(r)
        if (xr != 0.0) {
          var c = 0
          while (c < dim) { xx(r * dim + c) += xr * x(c); c += 1 }
        }
        r += 1
      }
      var st = classes.get(label)
      if (st == null) { st = new ClsStat(0L, new Array[Double](dim)); classes.put(label, st) }
      st.n += 1
      var i = 0
      while (i < dim) { st.sum(i) += x(i); i += 1 }
    }

    def merge(o: LdaState): Unit = {
      if (o.dim > dim) grow(o.dim)
      n += o.n
      var r = 0
      while (r < o.dim) {
        var c = 0
        while (c < o.dim) { xx(r * dim + c) += o.xx(r * o.dim + c); c += 1 }
        r += 1
      }
      o.classes.forEach { (label, ost) =>
        var st = classes.get(label)
        if (st == null) { st = new ClsStat(0L, new Array[Double](dim)); classes.put(label, st) }
        st.n += ost.n
        var i = 0
        while (i < ost.sum.length) { st.sum(i) += ost.sum(i); i += 1 }
      }
    }

    def serialize(): Array[Byte] = {
      var sz = 4 + 8 + 8 * dim * dim + 4
      classes.forEach { (label, _) =>
        sz += 4 + label.getBytes("UTF-8").length + 8 + 8 * dim
      }
      val bb = ByteBuffer.allocate(sz)
      bb.putInt(dim); bb.putLong(n)
      xx.foreach(bb.putDouble)
      bb.putInt(classes.size())
      classes.forEach { (label, st) =>
        val lb = label.getBytes("UTF-8")
        bb.putInt(lb.length); bb.put(lb); bb.putLong(st.n)
        var i = 0
        while (i < dim) { bb.putDouble(st.sum(i)); i += 1 }
      }
      bb.array()
    }

    /** Train: per-class linear discriminants w_c, b_c from the pooled
      * within-class covariance (tiny ridge keeps the solve well-posed on
      * constant/collinear features). */
    def toModel(varcharLabels: Boolean): Array[Byte] = {
      val k = classes.size()
      if (k == 0 || n == 0) return null
      val d = math.max(dim, 1)
      val labels = new Array[String](k)
      val mus = new Array[Array[Double]](k)
      val ns = new Array[Long](k)
      var ci = 0
      classes.forEach { (label, st) =>
        labels(ci) = label; ns(ci) = st.n
        val mu = new Array[Double](d)
        var i = 0
        while (i < st.sum.length) { mu(i) = st.sum(i) / st.n; i += 1 }
        mus(ci) = mu
        ci += 1
      }
      // within-class scatter → pooled covariance
      val cov = new Array[Double](d * d)
      var r = 0
      while (r < dim) {
        var c = 0
        while (c < dim) { cov(r * d + c) = xx(r * dim + c); c += 1 }
        r += 1
      }
      ci = 0
      while (ci < k) {
        val mu = mus(ci); val nc = ns(ci).toDouble
        r = 0
        while (r < d) {
          var c = 0
          while (c < d) { cov(r * d + c) -= nc * mu(r) * mu(c); c += 1 }
          r += 1
        }
        ci += 1
      }
      val dof = math.max(n - k, 1L).toDouble
      var trace = 0.0
      r = 0
      while (r < d) { cov(r * d + r) /= dof; trace += cov(r * d + r); r += 1 }
      var off = 0
      while (off < d * d) {
        if (off % (d + 1) != 0) cov(off) /= dof
        off += 1
      }
      val ridge = 1e-8 * (trace / d + 1.0)
      r = 0
      while (r < d) { cov(r * d + r) += ridge; r += 1 }
      val ws = mus.map(_.clone())
      solveInPlace(cov, d, ws)
      val kind = if (varcharLabels) KindVarcharClassifier else KindClassifier
      var sz = 1 + 4 + 4
      labels.foreach(l => sz += 4 + l.getBytes("UTF-8").length + 8 + 8 * d)
      val bb = ByteBuffer.allocate(sz)
      bb.put(kind.toByte); bb.putInt(d); bb.putInt(k)
      ci = 0
      while (ci < k) {
        val lb = labels(ci).getBytes("UTF-8")
        bb.putInt(lb.length); bb.put(lb)
        var dot = 0.0
        var i = 0
        while (i < d) { dot += ws(ci)(i) * mus(ci)(i); i += 1 }
        bb.putDouble(-0.5 * dot + math.log(ns(ci).toDouble / n))
        i = 0
        while (i < d) { bb.putDouble(ws(ci)(i)); i += 1 }
        ci += 1
      }
      bb.array()
    }
  }

  def deserializeLda(bytes: Array[Byte]): LdaState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new LdaState
    st.dim = bb.getInt; st.n = bb.getLong
    st.xx = new Array[Double](st.dim * st.dim)
    var i = 0
    while (i < st.xx.length) { st.xx(i) = bb.getDouble; i += 1 }
    val k = bb.getInt
    var c = 0
    while (c < k) {
      val lb = new Array[Byte](bb.getInt); bb.get(lb)
      val n = bb.getLong
      val sum = new Array[Double](st.dim)
      i = 0
      while (i < st.dim) { sum(i) = bb.getDouble; i += 1 }
      st.classes.put(new String(lb, "UTF-8"), new ClsStat(n, sum))
      c += 1
    }
    st
  }

  // ---------- regressor state (normal equations over [1, x]) -----------

  final class OlsState {
    var dim = 0 // feature dim (without bias)
    var n = 0L
    var xx: Array[Double] = new Array[Double](1) // (dim+1)^2
    var xy: Array[Double] = new Array[Double](1)

    def grow(d: Int): Unit = if (d > dim) {
      if (d > MaxDim) throw new IllegalArgumentException(
        s"ml training: feature dimension $d exceeds cap $MaxDim")
      val m0 = dim + 1; val m1 = d + 1
      val nxx = new Array[Double](m1 * m1)
      var r = 0
      while (r < m0) {
        System.arraycopy(xx, r * m0, nxx, r * m1, m0)
        r += 1
      }
      xx = nxx
      xy = java.util.Arrays.copyOf(xy, m1)
      dim = d
    }

    def update(y: Double, m: MapData): Unit = {
      grow(maxKeyPlus1(m))
      val mm = dim + 1
      val x = new Array[Double](mm)
      x(0) = 1.0
      val tmp = new Array[Double](dim)
      readFeatures(m, tmp)
      System.arraycopy(tmp, 0, x, 1, dim)
      n += 1
      var r = 0
      while (r < mm) {
        val xr = x(r)
        if (xr != 0.0) {
          var c = 0
          while (c < mm) { xx(r * mm + c) += xr * x(c); c += 1 }
          xy(r) += xr * y
        }
        r += 1
      }
    }

    def merge(o: OlsState): Unit = {
      if (o.dim > dim) grow(o.dim)
      n += o.n
      val mm = dim + 1; val om = o.dim + 1
      var r = 0
      while (r < om) {
        var c = 0
        while (c < om) { xx(r * mm + c) += o.xx(r * om + c); c += 1 }
        xy(r) += o.xy(r)
        r += 1
      }
    }

    def serialize(): Array[Byte] = {
      val mm = dim + 1
      val bb = ByteBuffer.allocate(4 + 8 + 8 * mm * mm + 8 * mm)
      bb.putInt(dim); bb.putLong(n)
      var i = 0
      while (i < mm * mm) { bb.putDouble(xx(i)); i += 1 }
      i = 0
      while (i < mm) { bb.putDouble(xy(i)); i += 1 }
      bb.array()
    }

    def toModel(): Array[Byte] = {
      if (n == 0) return null
      val mm = dim + 1
      val a = xx.clone()
      var trace = 0.0
      var r = 0
      while (r < mm) { trace += a(r * mm + r); r += 1 }
      val ridge = 1e-10 * (trace / mm + 1.0)
      r = 1 // don't regularize the intercept
      while (r < mm) { a(r * mm + r) += ridge; r += 1 }
      val beta = xy.clone()
      solveInPlace(a, mm, Array(beta))
      val bb = ByteBuffer.allocate(1 + 4 + 8 * mm)
      bb.put(KindRegressor.toByte); bb.putInt(dim)
      beta.foreach(bb.putDouble)
      bb.array()
    }
  }

  def deserializeOls(bytes: Array[Byte]): OlsState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new OlsState
    st.dim = bb.getInt; st.n = bb.getLong
    val mm = st.dim + 1
    st.xx = new Array[Double](mm * mm)
    var i = 0
    while (i < st.xx.length) { st.xx(i) = bb.getDouble; i += 1 }
    st.xy = new Array[Double](mm)
    i = 0
    while (i < mm) { st.xy(i) = bb.getDouble; i += 1 }
    st
  }

  // ---------- decoded models (classify/regress side) --------------------

  final case class Decoded(kind: Int, dim: Int, labels: Array[String],
    bias: Array[Double], weights: Array[Array[Double]])

  def decode(bytes: Array[Byte]): Decoded = {
    val bb = ByteBuffer.wrap(bytes)
    val kind = bb.get().toInt
    val d = bb.getInt
    kind match {
      case KindClassifier | KindVarcharClassifier =>
        val k = bb.getInt
        val labels = new Array[String](k)
        val bias = new Array[Double](k)
        val ws = new Array[Array[Double]](k)
        var c = 0
        while (c < k) {
          val lb = new Array[Byte](bb.getInt); bb.get(lb)
          labels(c) = new String(lb, "UTF-8")
          bias(c) = bb.getDouble
          val w = new Array[Double](d)
          var i = 0
          while (i < d) { w(i) = bb.getDouble; i += 1 }
          ws(c) = w
          c += 1
        }
        Decoded(kind, d, labels, bias, ws)
      case KindRegressor =>
        val beta = new Array[Double](d + 1)
        var i = 0
        while (i <= d) { beta(i) = bb.getDouble; i += 1 }
        Decoded(kind, d, Array.empty, Array(beta(0)), Array(beta.drop(1)))
      case other => throw new IllegalArgumentException(
        s"not a graft ml model (kind byte $other)")
    }
  }

  /** Canonical label key for numeric label inputs: integral types keep
    * their integer spelling (the classifier round-trips them as bigint). */
  def labelKey(v: Any): String = v match {
    case null => null
    case l: Long => l.toString
    case i: Int => i.toString
    case s: Short => s.toString
    case b: Byte => b.toString
    case d: Double => if (d == math.rint(d) && !d.isInfinite) d.toLong.toString else d.toString
    case f: Float => labelKey(f.toDouble)
    case u: UTF8String => u.toString
    case other => other.toString
  }

  /** Label key for the BIGINT classifier: the reference truncates double
    * labels to int at training time (LearnClassifierAggregation input as
    * DoubleType → intValue), so every stored label is a valid long and
    * classify()'s bigint render can never throw at query time. */
  def bigintLabelKey(v: Any): String = v match {
    case d: Double => d.toLong.toString
    case f: Float => f.toLong.toString
    case other => labelKey(other)
  }
}

// ===================== aggregate expressions ===========================

/** learn_classifier / learn_varchar_classifier(label, features) →
  * varbinary model (reference LearnClassifierAggregation.java:30 /
  * LearnVarcharClassifierAggregation.java — but mergeable; see MlModel). */
case class LearnClassifierAgg(
  labelExpr: Expression,
  featuresExpr: Expression,
  varcharLabels: Boolean,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MlModel.LdaState] {

  override def prettyName: String =
    if (varcharLabels) "learn_varchar_classifier" else "learn_classifier"
  override def children: Seq[Expression] = Seq(labelExpr, featuresExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = {
    val labelOk = labelExpr.dataType match {
      case LongType | IntegerType | ShortType | ByteType | DoubleType | FloatType => !varcharLabels
      case StringType => varcharLabels
      case _ => false
    }
    featuresExpr.dataType match {
      case MapType(LongType, DoubleType, _) if labelOk => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (${if (varcharLabels) "varchar" else "bigint/double"} label, " +
          s"map<bigint,double> features), got (${labelExpr.dataType.simpleString}, " +
          s"${featuresExpr.dataType.simpleString})")
    }
  }
  override def createAggregationBuffer(): MlModel.LdaState = new MlModel.LdaState
  override def update(st: MlModel.LdaState, input: InternalRow): MlModel.LdaState = {
    val label = labelExpr.eval(input)
    val feats = featuresExpr.eval(input)
    if (label != null && feats != null)
      st.update(
        if (varcharLabels) MlModel.labelKey(label)
        else MlModel.bigintLabelKey(label),
        feats.asInstanceOf[MapData])
    st
  }
  override def merge(a: MlModel.LdaState, b: MlModel.LdaState): MlModel.LdaState = {
    a.merge(b); a
  }
  override def eval(st: MlModel.LdaState): Any = {
    val m = st.toModel(varcharLabels)
    if (m == null) null else m
  }
  override def serialize(st: MlModel.LdaState): Array[Byte] = st.serialize()
  override def deserialize(bytes: Array[Byte]): MlModel.LdaState =
    MlModel.deserializeLda(bytes)
  override def withNewMutableAggBufferOffset(o: Int): LearnClassifierAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LearnClassifierAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(labelExpr = newChildren(0), featuresExpr = newChildren(1))
}

/** learn_regressor(label, features) → varbinary model (reference
  * LearnRegressorAggregation; ridge least squares here — see MlModel). */
case class LearnRegressorAgg(
  labelExpr: Expression,
  featuresExpr: Expression,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MlModel.OlsState] {

  override def prettyName: String = "learn_regressor"
  override def children: Seq[Expression] = Seq(labelExpr, featuresExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = {
    val labelOk = labelExpr.dataType match {
      case LongType | IntegerType | ShortType | ByteType | DoubleType | FloatType => true
      case _ => false
    }
    featuresExpr.dataType match {
      case MapType(LongType, DoubleType, _) if labelOk => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"learn_regressor requires (numeric label, map<bigint,double> features), " +
          s"got (${labelExpr.dataType.simpleString}, ${featuresExpr.dataType.simpleString})")
    }
  }
  override def createAggregationBuffer(): MlModel.OlsState = new MlModel.OlsState
  override def update(st: MlModel.OlsState, input: InternalRow): MlModel.OlsState = {
    val label = labelExpr.eval(input)
    val feats = featuresExpr.eval(input)
    if (label != null && feats != null) {
      val y = label match {
        case d: Double => d
        case f: Float => f.toDouble
        case l: Long => l.toDouble
        case i: Int => i.toDouble
        case s: Short => s.toDouble
        case b: Byte => b.toDouble
        case other => throw new IllegalArgumentException(s"bad label $other")
      }
      st.update(y, feats.asInstanceOf[MapData])
    }
    st
  }
  override def merge(a: MlModel.OlsState, b: MlModel.OlsState): MlModel.OlsState = {
    a.merge(b); a
  }
  override def eval(st: MlModel.OlsState): Any = {
    val m = st.toModel()
    if (m == null) null else m
  }
  override def serialize(st: MlModel.OlsState): Array[Byte] = st.serialize()
  override def deserialize(bytes: Array[Byte]): MlModel.OlsState =
    MlModel.deserializeOls(bytes)
  override def withNewMutableAggBufferOffset(o: Int): LearnRegressorAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LearnRegressorAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(labelExpr = newChildren(0), featuresExpr = newChildren(1))
}

// ===================== scalar expressions ==============================

/** Shared model-apply machinery: decode once per distinct model blob (the
  * reference keeps a 5-entry model cache for the same reason,
  * MLFunctions.java:35 MODEL_CACHE). */
trait MlApplyBase extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  @transient private var lastBytes: Array[Byte] = _
  @transient private var lastModel: MlModel.Decoded = _

  protected def model(bytes: Array[Byte]): MlModel.Decoded = {
    if (lastModel == null || !java.util.Arrays.equals(lastBytes, bytes)) {
      lastModel = MlModel.decode(bytes)
      lastBytes = bytes
    }
    lastModel
  }

  protected def score(m: MlModel.Decoded, feats: MapData): Int = {
    val x = new Array[Double](m.dim)
    MlModel.readFeatures(feats, x)
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < m.labels.length) {
      var s = m.bias(c)
      val w = m.weights(c)
      var i = 0
      while (i < m.dim) { s += w(i) * x(i); i += 1 }
      if (s > bestScore) { bestScore = s; best = c }
      c += 1
    }
    best
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (MapType(LongType, DoubleType, _), BinaryType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (map<bigint,double> features, varbinary model), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }
}

/** classify(features, model) → bigint label (MLFunctions.java:54). */
case class MlClassify(left: Expression, right: Expression) extends MlApplyBase {
  override def prettyName: String = "classify"
  override def dataType: DataType = LongType
  override def nullSafeEval(f: Any, mb: Any): Any = {
    val m = model(mb.asInstanceOf[Array[Byte]])
    require(m.kind == MlModel.KindClassifier, "model is not a classifier<bigint>")
    m.labels(score(m, f.asInstanceOf[MapData])).toLong
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** classify(features, model<varchar>) → varchar label. The reference
  * overloads `classify` on the model's type parameter
  * (MLFunctions.java:43 Classifier<varchar>); Spark's function dispatch
  * has no type parameters on binary, so the varchar variant gets its own
  * name — documented deviation. */
case class MlClassifyVarchar(left: Expression, right: Expression) extends MlApplyBase {
  override def prettyName: String = "classify_varchar"
  override def dataType: DataType = StringType
  override def nullSafeEval(f: Any, mb: Any): Any = {
    val m = model(mb.asInstanceOf[Array[Byte]])
    require(m.kind == MlModel.KindVarcharClassifier, "model is not a classifier<varchar>")
    UTF8String.fromString(m.labels(score(m, f.asInstanceOf[MapData])))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** regress(features, model) → double (MLFunctions.java:65). */
case class MlRegress(left: Expression, right: Expression) extends MlApplyBase {
  override def prettyName: String = "regress"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(f: Any, mb: Any): Any = {
    val m = model(mb.asInstanceOf[Array[Byte]])
    require(m.kind == MlModel.KindRegressor, "model is not a regressor")
    val x = new Array[Double](m.dim)
    MlModel.readFeatures(f.asInstanceOf[MapData], x)
    var s = m.bias(0)
    val w = m.weights(0)
    var i = 0
    while (i < m.dim) { s += w(i) * x(i); i += 1 }
    s
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

// ===================== prediction evaluation ===========================

/** evaluate_classifier_predictions(prediction, truth) → the reference's
  * multi-line summary string, byte-for-byte
  * (EvaluateClassifierPredictionsAggregation.java:97-117) except that
  * class sections are emitted in SORTED label order — the reference
  * iterates a hash-set union whose order is unspecified; sorting makes
  * the output deterministic (and so oracle-checkable). */
case class EvaluatePredictionsAgg(
  predExpr: Expression,
  truthExpr: Expression,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[String, Array[Long]]] {

  override def prettyName: String = "evaluate_classifier_predictions"
  override def children: Seq[Expression] = Seq(predExpr, truthExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case StringType | LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (ok(predExpr) && ok(truthExpr)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "evaluate_classifier_predictions requires varchar or bigint (prediction, truth)")
  }

  // label -> [truePositives, falsePositives, falseNegatives]
  override def createAggregationBuffer() = new java.util.TreeMap[String, Array[Long]]()

  private def slot(st: java.util.TreeMap[String, Array[Long]], l: String): Array[Long] = {
    var a = st.get(l)
    if (a == null) { a = new Array[Long](3); st.put(l, a) }
    a
  }

  override def update(st: java.util.TreeMap[String, Array[Long]], input: InternalRow) = {
    val p = predExpr.eval(input)
    val t = truthExpr.eval(input)
    if (p != null && t != null) {
      val pk = MlModel.labelKey(p); val tk = MlModel.labelKey(t)
      if (pk == tk) slot(st, pk)(0) += 1
      else { slot(st, pk)(1) += 1; slot(st, tk)(2) += 1 }
    }
    st
  }

  override def merge(a: java.util.TreeMap[String, Array[Long]],
    b: java.util.TreeMap[String, Array[Long]]) = {
    b.forEach { (l, v) =>
      val s = slot(a, l)
      s(0) += v(0); s(1) += v(1); s(2) += v(2)
    }
    a
  }

  override def eval(st: java.util.TreeMap[String, Array[Long]]): Any = {
    if (st.isEmpty) return null
    var correct = 0L
    var wrong = 0L
    st.forEach { (_, v) => correct += v(0); wrong += v(1) }
    val total = correct + wrong
    val sb = new StringBuilder
    sb.append(String.format(Locale.US, "Accuracy: %d/%d (%.2f%%)%n",
      Long.box(correct), Long.box(total),
      Double.box(100.0 * correct / total.toDouble)))
    st.forEach { (label, v) =>
      val tp = v(0); val fp = v(1); val fn = v(2)
      sb.append(String.format(Locale.US, "Class '%s'%n", label))
      sb.append(String.format(Locale.US, "Precision: %d/%d (%.2f%%)%n",
        Long.box(tp), Long.box(tp + fp), Double.box(100.0 * tp / (tp + fp).toDouble)))
      sb.append(String.format(Locale.US, "Recall: %d/%d (%.2f%%)%n",
        Long.box(tp), Long.box(tp + fn), Double.box(100.0 * tp / (tp + fn).toDouble)))
    }
    UTF8String.fromString(sb.toString)
  }

  override def serialize(st: java.util.TreeMap[String, Array[Long]]): Array[Byte] = {
    var sz = 4
    st.forEach { (l, _) => sz += 4 + l.getBytes("UTF-8").length + 24 }
    val bb = ByteBuffer.allocate(sz)
    bb.putInt(st.size())
    st.forEach { (l, v) =>
      val lb = l.getBytes("UTF-8")
      bb.putInt(lb.length); bb.put(lb)
      bb.putLong(v(0)); bb.putLong(v(1)); bb.putLong(v(2))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]) = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new java.util.TreeMap[String, Array[Long]]()
    val k = bb.getInt
    var i = 0
    while (i < k) {
      val lb = new Array[Byte](bb.getInt); bb.get(lb)
      st.put(new String(lb, "UTF-8"), Array(bb.getLong, bb.getLong, bb.getLong))
      i += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): EvaluatePredictionsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): EvaluatePredictionsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(predExpr = newChildren(0), truthExpr = newChildren(1))
}
