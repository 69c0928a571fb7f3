package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Local dataset loader façade matching the reference's fetcher Bunch shape
  * (skrub/datasets/_fetching.py:10-649: main table, X features, y target,
  * metadata, path) over LOCAL parquet fixtures — the network fetchers
  * themselves are out of scope (zero egress, README), but code written
  * against the reference's `fetch_*` call sites ports onto this directly.
  */
object Datasets {

  /** The reference Bunch: the full table, the feature frame `x` (table
    * minus target), the optional single-column target frame `y`, metadata,
    * and the backing path.
    */
  final case class Dataset(name: String, table: DataFrame, x: DataFrame,
                           y: Option[DataFrame], metadata: Map[String, String],
                           path: String)

  /** Load `dir/name.parquet` as a Bunch. `target` marks the label column
    * (reference datasets carry it in their metadata); when present it is
    * split out of `x` into `y`, like `fetch_employee_salaries().X/.y`.
    */
  def load(spark: SparkSession, name: String, dir: String,
           target: Option[String] = None,
           description: String = ""): Dataset = {
    val path = s"$dir/$name.parquet"
    val table = spark.read.parquet(path)
    target.foreach(t => require(table.columns.contains(t),
      s"dataset '$name': target column '$t' not in ${table.columns.mkString(", ")}"))
    val x = target.fold(table)(t => table.drop(t))
    val y = target.map(t => table.select(t))
    Dataset(name, table, x, y,
      Map("name" -> name, "description" -> description,
        "source" -> path) ++ target.map("target" -> _),
      path)
  }
}
