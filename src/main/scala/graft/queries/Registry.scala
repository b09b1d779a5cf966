package graft.queries

/** Single place each new query family gets registered. Order matters only
  * for readability of driver artifacts; names must be unique. */
object Registry {
  def all: Seq[QueryDef] =
    Relational.all ++ Joins.all ++ Aggregates.all ++ Windows.all ++
      SetOps.all ++ Functions.all ++ TextAnalysis.all ++ Dedup.all ++
      Similarity.all ++ PipelineQueries.all ++ Streaming.all ++
      MediaQueries.all ++ UdfQueries.all ++ Misc.all ++ SqlQueries.all ++
      Sampling.all ++ SourceQueries.all ++ Curation.all ++ Graph.all

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")
}
