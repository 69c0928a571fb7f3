package graft.plans

import org.apache.spark.sql.DataFrame

/** DataOps core (reference skrub/_data_ops/, SURVEY §2.10): lazy,
  * environment-bound, REFITTABLE multi-table computation plans.
  *
  * The reference's relational node types (GetItem/BinOp/CallMethod) are
  * Catalyst's job — a graft Plan node holds whole-DataFrame steps and the
  * things Catalyst cannot know about:
  *
  *  - `Var`: a named input bound from the environment at evaluation time
  *    (reference Var, _data_ops.py:955);
  *  - `Transform`: a stateless DataFrame function (reference `deferred` /
  *    `.skb.apply_func`);
  *  - `Apply`: a STATEFUL estimator stage — fit mode runs `fit` and records
  *    the fitted transformer, transform mode replays it frozen (reference
  *    Apply / FreezeAfterFit semantics, _data_ops.py:1409,1358);
  *  - `Merge`: an n-ary combinator (joins, concats) over upstream plans.
  *
  * Evaluation memoizes per node (the reference's per-node result cache,
  * _evaluation.py:319-330) and persists any node consumed by more than one
  * parent (the persist-at-fanout rule of SURVEY §4) — a node shared by two
  * branches computes once per evaluation, not once per consumer.
  */
sealed trait Plan {
  def transform(fn: DataFrame => DataFrame): Plan = Transform(this, fn)
  def apply(est: Estimator): Plan = Apply(this, est)
}

final case class Var(name: String) extends Plan
final case class Value(df: DataFrame) extends Plan
final case class Transform(input: Plan, fn: DataFrame => DataFrame) extends Plan
final case class Apply(input: Plan, estimator: Estimator) extends Plan
final case class Merge(inputs: Seq[Plan],
                       fn: Seq[DataFrame] => DataFrame) extends Plan

/** A stateful pipeline stage: `fit` learns from the fit-time frame and
  * returns the frozen transformer replayed at transform time.
  */
trait Estimator {
  def fit(df: DataFrame): Transformer
}

trait Transformer {
  def transform(df: DataFrame): DataFrame
}

object Plan {

  private def parentCounts(root: Plan): Map[Plan, Int] = {
    val counts = scala.collection.mutable.Map[Plan, Int]().withDefaultValue(0)
    def walk(p: Plan): Unit = {
      counts(p) += 1
      if (counts(p) == 1) p match {
        case Transform(in, _) => walk(in)
        case Apply(in, _)     => walk(in)
        case Merge(ins, _)    => ins.foreach(walk)
        case _                =>
      }
    }
    walk(root)
    counts.toMap
  }

  /** One evaluation pass. In fit mode every Apply runs `estimator.fit` on
    * its input and records the fitted transformer into `fitted`; in
    * transform mode it replays `fitted`.
    */
  private[plans] def evaluate0(root: Plan, env: Map[String, DataFrame],
                               fitted: scala.collection.mutable.Map[Apply, Transformer],
                               fitMode: Boolean): DataFrame = {
    val fanout = parentCounts(root)
    val memo = scala.collection.mutable.Map[Plan, DataFrame]()
    def eval(p: Plan): DataFrame = memo.getOrElseUpdate(p, {
      val out = p match {
        case Var(name) => env.getOrElse(name,
          throw new IllegalArgumentException(s"unbound plan variable '$name'"))
        case Value(df)          => df
        case Transform(in, fn)  => fn(eval(in))
        case a @ Apply(in, est) =>
          val input = eval(in)
          val t =
            if (fitMode) { val f = est.fit(input); fitted(a) = f; f }
            else fitted.getOrElse(a,
              throw new IllegalStateException("transform before fit"))
          t.transform(input)
        case Merge(ins, fn) => fn(ins.map(eval))
      }
      if (fanout(p) > 1) out.persist() else out
    })
    eval(root)
  }

  /** Compile a plan into a refittable learner (reference
    * `.skb.make_learner()`, _skrub_namespace.py:1815).
    */
  def makeLearner(root: Plan): Learner = new Learner(root)
}

/** Fitted-plan holder: `fit(env)` learns every Apply stage against one
  * environment; `transform(env)` replays the SAME fitted state against
  * another (reference SkrubLearner, _estimator.py:182).
  */
final class Learner(root: Plan) {
  private val fitted = scala.collection.mutable.Map[Apply, Transformer]()
  private var isFit = false

  def fit(env: Map[String, DataFrame]): Learner = {
    fitted.clear()
    Plan.evaluate0(root, env, fitted, fitMode = true)
    isFit = true
    this
  }

  def fitTransform(env: Map[String, DataFrame]): DataFrame = {
    fitted.clear()
    val out = Plan.evaluate0(root, env, fitted, fitMode = true)
    isFit = true
    out
  }

  def transform(env: Map[String, DataFrame]): DataFrame = {
    if (!isFit) throw new IllegalStateException("learner is not fitted")
    Plan.evaluate0(root, env, fitted, fitMode = false)
  }
}
