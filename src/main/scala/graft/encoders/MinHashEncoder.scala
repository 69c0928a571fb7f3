package graft.encoders

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Text
import graft.operators.FuzzyJoin

/** MinHashEncoder (reference skrub/_minhash_encoder.py:23-323): encode a
  * high-cardinality string column as `nComponents` min-hash values of its
  * char 2-4-grams.
  *
  * Fit-on-distinct (the reference's own optimization: it hashes `unique
  * values` and maps back, _minhash_encoder.py:18,69): signatures are
  * computed for DISTINCT values only, then joined back onto the frame —
  * at 100 TB the distinct set of a categorical-ish column is orders of
  * magnitude smaller than the row count, and the join is AQE-decided
  * (broadcast when the distinct set is small).
  *
  * Hash family: md5-derived (graft.functions.Text.minhashSignature) — the
  * lexicographic min over fixed-width hex equals the numeric min, so the
  * DuckDB oracle reproduces every component bit-for-bit. The numeric
  * component is the first 8 hex digits of the winning hash as a double
  * (prefix-of-min == min-of-prefixes for fixed-width lex order).
  */
object MinHashEncoder {

  /** Signature expressions for a single string value column. */
  def signatureCols(c: Column, prefix: String, nComponents: Int): Seq[Column] = {
    val sig = Text.minhashSignature(FuzzyJoin.charNgrams234(c), nComponents)
    (0 until nComponents).map { i =>
      conv(substring(element_at(sig, i + 1), 1, 8), 16, 10)
        .cast(DoubleType).as(s"${prefix}_minhash_$i")
    }
  }

  /** Encode column `c` of `df` into nComponents numeric columns, keeping all
    * other columns.
    */
  def encode(df: DataFrame, c: String, nComponents: Int = 30): DataFrame = {
    val distinct = df.select(col(c)).filter(col(c).isNotNull).distinct()
    val encoded = distinct.select(
      col(c) +: signatureCols(col(c), c, nComponents): _*)
    df.join(encoded, Seq(c), "left")
  }
}
