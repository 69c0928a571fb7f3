package graft.encoders

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DropUninformative (reference: skrub/_drop_uninformative.py:12): drop a
  * column when it is all-null above a threshold, constant, or all-unique
  * (id-like strings). One aggregate job computes every column's profile —
  * no per-column scans.
  */
object DropUninformative {

  final case class ColProfile(name: String, nullFrac: Double, nDistinct: Long,
                              nRows: Long) {
    def isConstant: Boolean = nDistinct <= 1
    def isAllUnique: Boolean = nDistinct.toDouble >= (1.0 - nullFrac) * nRows && nRows > 0
  }

  def profile(df: DataFrame): Seq[ColProfile] = {
    val names = df.schema.fieldNames.toSeq
    val exprs = names.flatMap { n =>
      val c = col(n)
      val isNull = df.schema(n).dataType match {
        case FloatType | DoubleType => c.isNull || isnan(c)
        case _                      => c.isNull
      }
      Seq(avg(when(isNull, 1.0).otherwise(0.0)).as(s"__nf__$n"),
        countDistinct(c).as(s"__nd__$n"))
    } :+ count(lit(1)).as("__n__")
    val row: Row = df.agg(exprs.head, exprs.tail: _*).collect()(0)
    val n = row.getAs[Long]("__n__")
    names.map(c => ColProfile(c, row.getAs[Double](s"__nf__$c"), row.getAs[Long](s"__nd__$c"), n))
  }

  /** Column names to KEEP. `dropIfUnique` only applies to string columns
    * (numeric ids are legitimately unique), like the reference.
    */
  def keptColumns(df: DataFrame, nullThreshold: Double = 1.0,
                  dropIfConstant: Boolean = true,
                  dropIfUnique: Boolean = false): Seq[String] = {
    val profs = profile(df)
    profs.filter { p =>
      val stringy = df.schema(p.name).dataType == StringType
      !(p.nullFrac >= nullThreshold ||
        (dropIfConstant && p.isConstant) ||
        (dropIfUnique && stringy && p.isAllUnique))
    }.map(_.name)
  }

  def transform(df: DataFrame, nullThreshold: Double = 1.0,
                dropIfConstant: Boolean = true,
                dropIfUnique: Boolean = false): DataFrame =
    df.select(keptColumns(df, nullThreshold, dropIfConstant, dropIfUnique).map(col): _*)
}
