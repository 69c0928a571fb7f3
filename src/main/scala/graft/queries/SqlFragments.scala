package graft.queries

/** Shared DuckDB SQL fragments mirroring graft Scala expressions — kept in
  * one place so the Scala definition and its oracle mirror cannot drift
  * independently in multiple files.
  */
object SqlFragments {

  /** Padded char 2-4-grams of value column `v` — mirrors
    * graft.operators.FuzzyJoin.charNgrams234 (lowercase, non-alphanumerics
    * collapsed to single spaces, one leading/trailing pad space).
    */
  def ngrams234Sql(v: String): String = {
    val norm = s"trim(regexp_replace(lower($v), '[^a-z0-9]+', ' ', 'g'))"
    val padded = s"(' ' || $norm || ' ')"
    (2 to 4).map { n =>
      s"""(CASE WHEN length($padded) - ${n - 1} <= 0 THEN []
         | ELSE list_transform(range(1, length($padded) - ${n - 1} + 1),
         |   i -> substr($padded, i, $n)) END)""".stripMargin
    }.mkString("flatten([", ", ", "])")
  }
}
