package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TableReport summary job (reference skrub/_reporting/_summarize.py:21-310
  * feeding _table_report.py:98): per-column profiling statistics as one
  * long-format frame — the data side of the reference's HTML report.
  *
  * ONE aggregate job computes every column's stats together (count, nulls,
  * exact distinct, min/max as display strings, decimal-exact mean for
  * numerics); the wide single row is exploded into per-column rows
  * afterwards — executors scan the input once regardless of column count.
  */
object TableReport {

  def summarize(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    // numeric-comparable view of a column: numerics as double, datetimes as
    // epoch seconds (min/max of strings stay in the string columns — no
    // cross-engine float-to-string formatting anywhere)
    def numView(f: StructField): Option[Column] = f.dataType match {
      case _: NumericType => Some(col(f.name).cast(DoubleType))
      case DateType | TimestampType | TimestampNTZType =>
        Some(unix_micros(col(f.name).cast(TimestampType)).cast(DoubleType) / 1e6)
      case _ => None
    }
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val nv = numView(f)
      val mean = f.dataType match {
        case _: NumericType =>
          round(sum(c.cast(DecimalType(24, 6))).cast(DoubleType) /
            count(c).cast(DoubleType), 6)
        case _ => lit(null).cast(DoubleType)
      }
      Seq(
        count(c).as(s"${f.name}__count"),
        count(when(c.isNull, 1)).as(s"${f.name}__nulls"),
        countDistinct(c).as(s"${f.name}__distinct"),
        nv.map(min(_)).getOrElse(lit(null).cast(DoubleType)).as(s"${f.name}__min_num"),
        nv.map(max(_)).getOrElse(lit(null).cast(DoubleType)).as(s"${f.name}__max_num"),
        (if (f.dataType == StringType) min(c) else lit(null).cast(StringType))
          .as(s"${f.name}__min_str"),
        (if (f.dataType == StringType) max(c) else lit(null).cast(StringType))
          .as(s"${f.name}__max_str"),
        mean.as(s"${f.name}__mean"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = fields.map { f =>
      struct(
        lit(f.name).as("column_name"),
        lit(f.dataType.simpleString).as("dtype"),
        col(s"${f.name}__count").as("count"),
        col(s"${f.name}__nulls").as("null_count"),
        col(s"${f.name}__distinct").as("n_unique"),
        col(s"${f.name}__min_num").as("min_numeric"),
        col(s"${f.name}__max_num").as("max_numeric"),
        col(s"${f.name}__min_str").as("min_string"),
        col(s"${f.name}__max_str").as("max_string"),
        col(s"${f.name}__mean").as("mean"))
    }
    wide.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
  }
}
