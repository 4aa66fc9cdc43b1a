package graft.queries

import graft.Q

/** Central registry: every query module contributes its Q list here.
  * SparkEntry derives the driver-facing `queries` / `oracleSql` maps
  * from this sequence.
  */
object Registry {
  def all: Seq[Q] =
    Canary.all ++
      Relational.all ++
      Advanced.all ++
      graft.pipeline.Text.all ++
      graft.pipeline.Dedup.all ++
      graft.pipeline.Similarity.all ++
      graft.pipeline.Events.all ++
      graft.pipeline.Curation.all ++
      graft.multimodal.Multimodal.all ++
      graft.sources.Layout.all ++
      graft.sources.Ingest.all ++
      graft.streaming.StreamTwins.all
}
