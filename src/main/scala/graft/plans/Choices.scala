package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hyperparameter choices + search/CV over plans (reference
  * skrub/_data_ops/_choosing.py:332-883, _estimator.py:1032-1423).
  *
  * A `Choice` is a named hyperparameter with an ordered outcome list; plans
  * consume choices through `Choosing.planFor(params)` factories, and the
  * search drivers expand the cross-product grid (reference
  * `describe_param_grid` / ParamSearch) or sample it, fitting one learner
  * per combination. Default (no tuning) = first outcome, like the
  * reference. CV splits use deterministic row hashing (xxhash64 % k), so
  * folds are reproducible under any partitioning; fit/score per fold
  * mirrors `cross_validate`'s refit-per-fold contract.
  */
final case class Choice[A](name: String, outcomes: Seq[A]) {
  require(outcomes.nonEmpty, s"choice '$name' has no outcomes")
  def default: A = outcomes.head
}

object Choices {

  def chooseFrom[A](name: String, outcomes: Seq[A]): Choice[A] =
    Choice(name, outcomes)

  def chooseBool(name: String, default: Boolean = true): Choice[Boolean] =
    Choice(name, Seq(default, !default))

  /** `nSteps` evenly spaced values over [low, high] (log-spaced if `log` —
    * reference choose_float discretization).
    */
  def chooseFloat(name: String, low: Double, high: Double, nSteps: Int,
                  log: Boolean = false): Choice[Double] = {
    require(nSteps >= 2, "nSteps >= 2")
    val vals =
      if (log) {
        val (l, h) = (math.log(low), math.log(high))
        (0 until nSteps).map(i => math.exp(l + (h - l) * i / (nSteps - 1)))
      } else (0 until nSteps).map(i => low + (high - low) * i / (nSteps - 1))
    Choice(name, vals)
  }

  def chooseInt(name: String, low: Int, high: Int, nSteps: Int,
                log: Boolean = false): Choice[Int] =
    Choice(name, chooseFloat(name, low.toDouble, high.toDouble, nSteps, log)
      .outcomes.map(math.round(_).toInt).distinct)

  /** Full cross-product grid over the given choices, as parameter maps. */
  def grid(choices: Seq[Choice[_]]): Seq[Map[String, Any]] =
    choices.foldLeft(Seq(Map.empty[String, Any])) { (acc, c) =>
      for (m <- acc; v <- c.outcomes) yield m + (c.name -> v)
    }

  /** Deterministic subsample of the grid (md5-ordered — reproducible
    * randomized search).
    */
  def sampledGrid(choices: Seq[Choice[_]], n: Int): Seq[Map[String, Any]] = {
    val full = grid(choices)
    full.sortBy(m => graft.functions.NgramVec.md5Hex(m.toSeq.sortBy(_._1)
      .mkString("|"))).take(n)
  }

  /** Human-readable description of the search space (reference
    * `.skb.describe_param_grid`, _skrub_namespace.py:1568): one line per
    * choice, `name: [outcomes]`, plus the total combination count.
    */
  def describeParamGrid(choices: Seq[Choice[_]]): String = {
    val lines = choices.map { c =>
      val vals = c.outcomes.map {
        case d: Double => f"$d%.4g"
        case v         => v.toString
      }
      s"- ${c.name}: [${vals.mkString(", ")}]"
    }
    val total = choices.map(_.outcomes.length.toLong).product
    (lines :+ s"total combinations: $total").mkString("\n")
  }

  final case class SearchResult(params: Map[String, Any], score: Double,
                                learner: Learner)

  /** Grid search: fit one learner per parameter combination on `fitEnv`,
    * score on `valEnv`, best (highest score) first.
    */
  def gridSearch(choices: Seq[Choice[_]],
                 planFor: Map[String, Any] => Plan,
                 fitEnv: Map[String, DataFrame],
                 valEnv: Map[String, DataFrame],
                 score: DataFrame => Double,
                 maxCombinations: Int = Int.MaxValue): Seq[SearchResult] = {
    val combos = grid(choices).take(maxCombinations)
    combos.map { params =>
      val learner = Plan.makeLearner(planFor(params))
      learner.fit(fitEnv)
      SearchResult(params, score(learner.transform(valEnv)), learner)
    }.sortBy(-_.score)
  }

  /** Deterministic k-fold assignment column (xxhash64 of all columns mod k —
    * stable under repartitioning; reference folds are row-position based,
    * which Spark cannot reproduce, SURVEY §1.2 row-identity contract).
    */
  def foldOf(df: DataFrame, k: Int, seed: Long = 42L) =
    pmod(xxhash64(df.columns.map(col) :+ lit(seed): _*), lit(k))

  /** Adaptive search by successive halving (the reference delegates
    * adaptive search to optuna, _data_ops/_optuna.py — a third-party
    * sampler this environment cannot ship; halving is the deterministic,
    * cluster-friendly equivalent): round r fits every surviving candidate
    * on a deterministic md5-bucket FRACTION of the fit table (a pure
    * pushed-down filter — no shuffle, no sample job, same rows every run),
    * keeps the best 1/factor, and multiplies the fraction by factor until
    * one candidate remains or the fraction reaches 1. Cheap configs die on
    * cheap data; only finalists pay a full fit.
    */
  def halvingSearch(choices: Seq[Choice[_]],
                    planFor: Map[String, Any] => Plan,
                    fitEnv: Map[String, DataFrame],
                    valEnv: Map[String, DataFrame],
                    score: DataFrame => Double,
                    xVar: String,
                    splitKeys: Seq[String],
                    nCandidates: Int = 8,
                    factor: Int = 2,
                    minFraction: Double = 0.125,
                    seed: Long = 0L): Seq[SearchResult] = {
    require(factor >= 2, "factor >= 2")
    val x = fitEnv(xVar)
    var survivors = sampledGrid(choices, nCandidates)
    var fraction = minFraction
    var ranked = Seq.empty[SearchResult]
    while (survivors.length > 1 && fraction < 1.0) {
      val cut = (fraction * 1000).toInt
      val frame = x.filter(Splits.bucket(splitKeys, seed) < cut)
      ranked = survivors.map { params =>
        val learner = Plan.makeLearner(planFor(params))
        learner.fit(fitEnv + (xVar -> frame))
        SearchResult(params, score(learner.transform(valEnv)), learner)
      }.sortBy(-_.score)
      survivors = ranked.take(math.max(1, survivors.length / factor)).map(_.params)
      fraction = math.min(1.0, fraction * factor)
    }
    // final round: full-data fit of the survivors
    survivors.map { params =>
      val learner = Plan.makeLearner(planFor(params))
      learner.fit(fitEnv)
      SearchResult(params, score(learner.transform(valEnv)), learner)
    }.sortBy(-_.score)
  }

  final case class CvResult(params: Map[String, Any], foldScores: Seq[Double]) {
    def meanScore: Double = foldScores.sum / foldScores.length
  }

  /** k-fold cross-validation of one parameter combination: for each fold,
    * refit the whole plan on the other k-1 folds of the X table and score
    * on the held-out fold (reference cross_validate's refit-per-fold).
    * `xVar` names the environment entry to split.
    */
  def crossValidate(params: Map[String, Any],
                    planFor: Map[String, Any] => Plan,
                    env: Map[String, DataFrame], xVar: String, k: Int,
                    score: DataFrame => Double, seed: Long = 42L): CvResult = {
    val x = env(xVar).persist()
    val fold = foldOf(x, k, seed)
    val scores = (0 until k).map { i =>
      val learner = Plan.makeLearner(planFor(params))
      learner.fit(env + (xVar -> x.filter(fold =!= i)))
      score(learner.transform(env + (xVar -> x.filter(fold === i))))
    }
    x.unpersist()
    CvResult(params, scores)
  }
}
