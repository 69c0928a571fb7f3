package graft.selectors

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-set selector algebra (reference: skrub/selectors/_base.py:354-683,
  * _selectors.py). A `Selector` is an AST resolved against a DataFrame's
  * schema; data-dependent selectors (`cardinalityBelow`, `hasNulls`) trigger
  * one aggregated stats job over exactly the candidate columns, never one job
  * per column.
  */
sealed trait Selector {
  def |(o: Selector): Selector = Selector.Or(this, o)
  def &(o: Selector): Selector = Selector.And(this, o)
  def -(o: Selector): Selector = Selector.Sub(this, o)
  def ^(o: Selector): Selector = Selector.XOr(this, o)
  def unary_~ : Selector = Selector.Inv(this)
}

object Selector {
  case object All extends Selector
  final case class Cols(names: Seq[String]) extends Selector
  final case class Glob(pattern: String) extends Selector
  final case class Regex(pattern: String) extends Selector
  final case class DTypePred(name: String, pred: DataType => Boolean) extends Selector
  final case class NameFilter(pred: String => Boolean) extends Selector
  /** n_unique(col) < k, on non-numeric/non-datetime columns only
    * (reference _selectors.py:614-677).
    */
  final case class CardinalityBelow(k: Int) extends Selector
  /** fraction of nulls (NaN counts as null) > prop (reference _selectors.py:679-737). */
  final case class HasNulls(prop: Double) extends Selector
  /** Data-dependent content predicate (reference s.filter,
    * selectors/_base.py:579-683): `mk(name)` builds one boolean AGGREGATE
    * expression per column; all candidate columns evaluate in ONE stats job
    * (the reference runs an arbitrary per-column python predicate — ours
    * keeps the one-job discipline by taking the predicate as an aggregate).
    */
  final case class ContentFilter(mk: String => Column) extends Selector
  final case class Inv(s: Selector) extends Selector
  final case class Or(a: Selector, b: Selector) extends Selector
  final case class And(a: Selector, b: Selector) extends Selector
  final case class Sub(a: Selector, b: Selector) extends Selector
  final case class XOr(a: Selector, b: Selector) extends Selector
}

object Selectors {
  import Selector._

  def all: Selector = All
  def cols(names: String*): Selector = Cols(names)
  def glob(pat: String): Selector = Glob(pat)
  def regex(pat: String): Selector = Regex(pat)

  def numeric: Selector = DTypePred("numeric", {
    case _: NumericType => true
    case _              => false
  })
  def integer: Selector = DTypePred("integer", {
    case ByteType | ShortType | IntegerType | LongType => true
    case _                                             => false
  })
  def float: Selector = DTypePred("float", {
    case FloatType | DoubleType => true
    case _                      => false
  })
  def boolean: Selector = DTypePred("boolean", _ == BooleanType)
  def string: Selector = DTypePred("string", _ == StringType)
  def anyDate: Selector = DTypePred("any_date", {
    case DateType | TimestampType | TimestampNTZType => true
    case _                                           => false
  })
  def hasDtype(dt: DataType): Selector = DTypePred(dt.simpleString, _ == dt)
  def nameFilter(pred: String => Boolean): Selector = NameFilter(pred)
  def filter(mk: String => Column): Selector = ContentFilter(mk)
  def cardinalityBelow(k: Int): Selector = CardinalityBelow(k)
  def hasNulls(prop: Double = 0.0): Selector = HasNulls(prop)

  private def globToRegex(glob: String): String =
    "^" + glob.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
      case c => c.toString
    } + "$"

  /** Resolve a selector to the matching column names, preserving schema order.
    * Data-dependent selectors run ONE stats job covering all candidate columns.
    */
  def expand(df: DataFrame, s: Selector): Seq[String] = {
    val fields = df.schema.fields.toSeq
    val names = fields.map(_.name)

    // Collect data-dependent leaves and compute all their stats in one pass.
    def statsNeeded(sel: Selector): (Boolean, Boolean) = sel match {
      case CardinalityBelow(_) => (true, false)
      case HasNulls(_)         => (false, true)
      case Inv(x)              => statsNeeded(x)
      case Or(a, b)            => combine(statsNeeded(a), statsNeeded(b))
      case And(a, b)           => combine(statsNeeded(a), statsNeeded(b))
      case Sub(a, b)           => combine(statsNeeded(a), statsNeeded(b))
      case XOr(a, b)           => combine(statsNeeded(a), statsNeeded(b))
      case _                   => (false, false)
    }
    def combine(a: (Boolean, Boolean), b: (Boolean, Boolean)) = (a._1 || b._1, a._2 || b._2)
    val (needCard, needNulls) = statsNeeded(s)

    lazy val stats: Map[String, (Long, Double)] = {
      val cardCols = fields.filter(f => f.dataType match {
        case _: NumericType | DateType | TimestampType | TimestampNTZType => false
        case _ => true
      }).map(_.name)
      val exprs =
        cardCols.flatMap(n => if (needCard) Seq(countDistinct(col(n)).as(s"__card__$n")) else Nil) ++
          (if (needNulls) names.map { n =>
            val c = col(n)
            val isNull = df.schema(n).dataType match {
              case FloatType | DoubleType => c.isNull || isnan(c)
              case _                      => c.isNull
            }
            avg(when(isNull, 1.0).otherwise(0.0)).as(s"__nulls__$n")
          } else Nil)
      if (exprs.isEmpty) Map.empty
      else {
        val row = df.agg(exprs.head, exprs.tail: _*).collect()(0)
        names.map { n =>
          val card =
            if (needCard && cardCols.contains(n)) row.getAs[Long](s"__card__$n") else Long.MaxValue
          val nulls = if (needNulls) row.getAs[Double](s"__nulls__$n") else 0.0
          n -> (card, nulls)
        }.toMap
      }
    }

    def eval(sel: Selector): Set[String] = sel match {
      case All          => names.toSet
      case Cols(ns) =>
        val missing = ns.filterNot(names.contains)
        require(missing.isEmpty, s"columns not in schema: ${missing.mkString(", ")}")
        ns.toSet
      case Glob(p)      => names.filter(_.matches(globToRegex(p))).toSet
      case Regex(p)     => names.filter(n => p.r.findFirstIn(n).isDefined).toSet
      case DTypePred(_, pred) => fields.filter(f => pred(f.dataType)).map(_.name).toSet
      case NameFilter(pred)   => names.filter(pred).toSet
      case CardinalityBelow(k) =>
        val nonNum = fields.filter(f => f.dataType match {
          case _: NumericType | DateType | TimestampType | TimestampNTZType => false
          case _ => true
        }).map(_.name)
        nonNum.filter(n => stats(n)._1 < k).toSet
      case HasNulls(prop) => names.filter(n => stats(n)._2 > prop).toSet
      case ContentFilter(mk) =>
        // one aggregate job evaluating every column's predicate together
        val exprs = names.map(n => coalesce(mk(n), lit(false)).as(s"__cf__$n"))
        val row = df.agg(exprs.head, exprs.tail: _*).collect()(0)
        names.filter(n => row.getAs[Boolean](s"__cf__$n")).toSet
      case Inv(x)    => names.toSet -- eval(x)
      case Or(a, b)  => eval(a) | eval(b)
      case And(a, b) => eval(a) & eval(b)
      case Sub(a, b) => eval(a) -- eval(b)
      case XOr(a, b) =>
        val (ea, eb) = (eval(a), eval(b))
        (ea diff eb) union (eb diff ea)
    }

    val matched = eval(s)
    names.filter(matched)
  }

  def select(df: DataFrame, s: Selector): DataFrame =
    df.select(expand(df, s).map(col): _*)

  def drop(df: DataFrame, s: Selector): DataFrame = {
    val dropped = expand(df, s).toSet
    df.select(df.schema.fieldNames.filterNot(dropped).map(col).toSeq: _*)
  }
}
