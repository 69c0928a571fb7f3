package graft.operators

import org.apache.spark.sql.DataFrame

/** Scratch bridge exposing the package-private CC loop for phase timing. */
object DedupDiag {
  def cc(vertices: DataFrame, pairs: DataFrame): (DataFrame, Set[Int]) =
    Dedup.connectedComponentsTracked(vertices, pairs)
}
