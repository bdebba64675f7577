package graft.operators

/**
 * §2.12 north-star LLM-data-pipeline operators over the `documents`
 * and `embeddings` tables. Populated operator-by-operator; see
 * graft.functions / graft.plans for the implementations.
 */
object LlmQueries {
  val all: Seq[(String, Q)] = Seq.empty
}
