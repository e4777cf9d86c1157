package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator family from SURVEY.md §2
  * (plus the large-scale extension operators); `oracleSql` holds the
  * equivalent DuckDB SQL the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Five-table star join with broadcast dims + decimal-exact aggregation.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q05StarJoin(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.Relational2.queries ++
      graft.queries.Relational3.queries ++ graft.queries.Extensions.queries ++
      graft.queries.Curation.queries ++ graft.queries.Scaled.queries ++
      graft.queries.Signals.queries ++ graft.queries.Curation2.queries ++
      graft.queries.Quality.queries ++ graft.queries.Ops.queries ++
      graft.queries.Exports.queries ++ graft.queries.EtlGate.queries ++
      graft.queries.UnicodeText.queries ++ graft.queries.Media.queries ++
      graft.queries.Retrieval.queries ++ graft.queries.Graphs.queries ++
      graft.queries.Series.queries ++ graft.queries.TextStats.queries ++
      graft.queries.TpchMore.queries

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.Relational2.oracles ++
      graft.queries.Relational3.oracles ++ graft.queries.Extensions.oracles ++
      graft.queries.Curation.oracles ++ graft.queries.Scaled.oracles ++
      graft.queries.Signals.oracles ++ graft.queries.Curation2.oracles ++
      graft.queries.Quality.oracles ++ graft.queries.Ops.oracles ++
      graft.queries.Exports.oracles ++ graft.queries.EtlGate.oracles ++
      graft.queries.UnicodeText.oracles ++ graft.queries.Media.oracles ++
      graft.queries.Retrieval.oracles ++ graft.queries.Graphs.oracles ++
      graft.queries.Series.oracles ++ graft.queries.TextStats.oracles ++
      graft.queries.TpchMore.oracles
}
