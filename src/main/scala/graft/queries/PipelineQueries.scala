package graft.queries

/** LLM-training-data pipeline operators (dedup, similarity, text analysis).
  * Filled in incrementally; see graft.operators.* for the implementations. */
object PipelineQueries {
  val all: Seq[QueryDef] = Seq()
}
