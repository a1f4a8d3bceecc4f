package graft.learn

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic L2-regularized logistic regression — the classifier-fitting
 * half of the reference's train loop (`labeler.py:79-98` `MatchLearner`
 * wrapping `sklearn.linear_model.LogisticRegression`; `api.py:1143-1148`
 * fits it under GridSearchCV over C).
 *
 * Fit is IRLS (Newton–Raphson on the penalized log-likelihood) on the
 * driver over the labeled sample — faithful placement: the reference fits
 * on at most the few thousand pairs a human labeled, never on the corpus.
 * sklearn's objective `min 0.5·wᵀw + C·Σ log-loss` is matched with
 * λ = 1/C on the weights and an unpenalized intercept. No randomness, no
 * data-order dependence (the normal equations are permutation-invariant
 * sums), fixed iteration/tolerance policy ⇒ bit-identical weights for
 * identical data. GridSearchCV's C sweep is not reproduced (a stochastic
 * CV split); C is a caller-fixed hyperparameter, default 1.0.
 *
 * Inference stays IN the cluster: [[scoreColumn]] emits the fitted model as
 * one codegen'd Column expression — the distributed
 * `predict_proba` (`core.py:78-79`), shaped like
 * [[graft.ops.PipelineOps.scoreLrSigmoid]].
 */
object LogisticRegression {

  final case class Model(weights: Array[Double], intercept: Double) {
    def predict(x: Array[Double]): Double = {
      var z = intercept
      var i = 0
      while (i < weights.length) { z += weights(i) * x(i); i += 1 }
      1.0 / (1.0 + math.exp(-z))
    }
  }

  /**
   * @param x features, one row per labeled pair
   * @param y labels (0/1)
   * @param c inverse regularization strength (sklearn's C)
   */
  def fit(x: Array[Array[Double]], y: Array[Int], c: Double = 1.0,
          maxIter: Int = 100, tol: Double = 1e-10): Model = {
    require(x.nonEmpty, "pairs must have length of at least 1")
    require(x.length == y.length,
      s"pairs and y must be same length. Got ${x.length} and ${y.length}")
    val n = x.length
    val d = x(0).length
    val lambda = 1.0 / c
    val beta = new Array[Double](d + 1) // beta(0) = intercept

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // gradient and Hessian of the penalized negative log-likelihood
      val g = new Array[Double](d + 1)
      val h = Array.ofDim[Double](d + 1, d + 1)
      var r = 0
      while (r < n) {
        val xi = x(r)
        var z = beta(0)
        var j = 0
        while (j < d) { z += beta(j + 1) * xi(j); j += 1 }
        val p = 1.0 / (1.0 + math.exp(-z))
        val e = y(r) - p
        val w = math.max(p * (1.0 - p), 1e-12)
        g(0) += e
        var a = 0
        while (a < d) { g(a + 1) += e * xi(a); a += 1 }
        h(0)(0) += w
        a = 0
        while (a < d) {
          h(0)(a + 1) += w * xi(a)
          h(a + 1)(0) += w * xi(a)
          var b = 0
          while (b < d) { h(a + 1)(b + 1) += w * xi(a) * xi(b); b += 1 }
          a += 1
        }
        r += 1
      }
      // L2 penalty on weights only (intercept unpenalized, like sklearn)
      var j = 1
      while (j <= d) { g(j) -= lambda * beta(j); h(j)(j) += lambda; j += 1 }

      val step = solve(h, g)
      var delta = 0.0
      j = 0
      while (j <= d) { beta(j) += step(j); delta = math.max(delta, math.abs(step(j))); j += 1 }
      converged = delta < tol
      iter += 1
    }
    Model(beta.drop(1), beta(0))
  }

  /** Dense Gaussian elimination with partial pivoting — deterministic,
    * adequate for the handful of featurizer dimensions. */
  private def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val n = b0.length
    val a = a0.map(_.clone())
    val b = b0.clone()
    var col = 0
    while (col < n) {
      var piv = col
      var row = col + 1
      while (row < n) { if (math.abs(a(row)(col)) > math.abs(a(piv)(col))) piv = row; row += 1 }
      if (piv != col) { val t = a(piv); a(piv) = a(col); a(col) = t
        val tb = b(piv); b(piv) = b(col); b(col) = tb }
      val p = a(col)(col)
      require(math.abs(p) > 1e-300, "singular Hessian in logistic fit")
      row = col + 1
      while (row < n) {
        val f = a(row)(col) / p
        if (f != 0.0) {
          var k = col
          while (k < n) { a(row)(k) -= f * a(col)(k); k += 1 }
          b(row) -= f * b(col)
        }
        row += 1
      }
      col += 1
    }
    val xx = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = b(i)
      var k = i + 1
      while (k < n) { s -= a(i)(k) * xx(k); k += 1 }
      xx(i) = s / a(i)(i)
      i -= 1
    }
    xx
  }

  /** The reference's C grid (`api.py:1146`). */
  val DefaultCGrid: Seq[Double] = Seq(1e-5, 1e-4, 1e-3, 1e-2, 0.1, 1.0, 10.0)

  /**
   * Model selection over the C grid — the `GridSearchCV(LogisticRegression,
   * C ∈ 1e-5..10, scoring='f1')` classifier (`api.py:1143-1148`) made
   * deterministic: stratified k-fold splits by class-wise round-robin in
   * input order (sklearn's own unshuffled StratifiedKFold is equally
   * order-defined), mean validation f1 per C, FIRST maximal C wins (sklearn
   * keeps the first best too), refit on the full data.
   *
   * @return (refit model, selected C)
   */
  def fitCv(x: Array[Array[Double]], y: Array[Int],
            grid: Seq[Double] = DefaultCGrid, folds: Int = 5): (Model, Double) = {
    require(x.length == y.length && x.nonEmpty)
    val k = math.min(folds, x.length)
    // fold id = index-within-class mod k: every fold sees each class in
    // proportion, assignment is a pure function of input order
    val fold = new Array[Int](x.length)
    val seen = scala.collection.mutable.Map[Int, Int]().withDefaultValue(0)
    for (i <- x.indices) { fold(i) = seen(y(i)) % k; seen(y(i)) += 1 }

    def f1(c: Double): Double = {
      val scores = (0 until k).flatMap { f =>
        val trIdx = x.indices.filter(fold(_) != f)
        val vaIdx = x.indices.filter(fold(_) == f)
        if (vaIdx.isEmpty || trIdx.map(y).distinct.size < 2) None
        else {
          val m = fit(trIdx.map(x).toArray, trIdx.map(y).toArray, c)
          var tp = 0; var fp = 0; var fn = 0
          vaIdx.foreach { i =>
            val pred = if (m.predict(x(i)) > 0.5) 1 else 0
            if (pred == 1 && y(i) == 1) tp += 1
            else if (pred == 1) fp += 1
            else if (y(i) == 1) fn += 1
          }
          Some(if (2 * tp + fp + fn == 0) 0.0 else 2.0 * tp / (2 * tp + fp + fn))
        }
      }
      if (scores.isEmpty) 0.0 else scores.sum / scores.size
    }

    val best = grid.map(c => c -> f1(c)).maxBy(_._2) // first max wins
    (fit(x, y, best._1), best._1)
  }

  /** Collect a capped, deterministically-ordered labeled-pair frame to the
    * driver arrays [[fit]] consumes. Order is a seeded xxhash64 over the
    * whole row — deterministic under any parallelism but UNBIASED when the
    * label set exceeds the cap (ordering by feature values would keep a
    * systematically low-valued sample, e.g. mostly negatives if low-Jaccard
    * rows sort first); value columns only break hash ties.
    * @param labeled (features..., label) — `featureCols` then `labelCol`
    */
  def collectTraining(labeled: DataFrame, featureCols: Seq[String], labelCol: String,
                      cap: Int = 10000, seed: Long = 42L): (Array[Array[Double]], Array[Int]) = {
    val cols = (featureCols :+ labelCol).map(col)
    val rows = labeled
      .select(cols: _*)
      .orderBy(xxhash64(cols :+ lit(seed): _*) +: cols: _*)
      .limit(cap)
      .collect()
    val x = rows.map(r => featureCols.indices.map(i =>
      r.get(i).asInstanceOf[Number].doubleValue()).toArray)
    val y = rows.map(r => r.get(featureCols.length).asInstanceOf[Number].intValue())
    (x, y)
  }

  /** Distributed inference: sigmoid(w·x + b) over feature Columns. */
  def scoreColumn(model: Model, features: Seq[Column]): Column = {
    require(features.length == model.weights.length)
    val z = features.zip(model.weights)
      .map { case (f, w) => f * lit(w) }
      .foldLeft(lit(model.intercept): Column)(_ + _)
    lit(1.0) / (lit(1.0) + exp(-z))
  }
}
