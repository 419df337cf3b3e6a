package graft.agg

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.llm.LlmConfig
import graft.model.ProcessedChunk

/** Named facade for the reference's `SimpleAggregator`
  * (/root/reference/simple_aggregator.py:26-42): the single-pass,
  * non-hierarchical reduce with the reference's fail-fast constructor —
  * a real (non-mock) provider without an API key raises immediately
  * instead of silently falling back to mock like the main path does
  * (`/root/reference/llm_executor.py:104-106` vs
  * `simple_aggregator.py:40-42`'s `ValueError`).
  *
  * The reduce semantics are [[SummaryReduce.aggregate]] with
  * `hierarchical = false` — the reference's simple aggregator is one
  * direct combine call over all chunk summaries, no batching tree.
  */
object SimpleAggregator {

  /** Fail-fast construction check, mirroring
    * `simple_aggregator.py:40-42`. Mock is exempt (it needs no key). */
  def requireKey(llmCfg: LlmConfig): Unit =
    if (llmCfg.provider.toLowerCase != "mock" && llmCfg.apiKey.isEmpty)
      throw new IllegalArgumentException(
        s"${llmCfg.provider} API key not found. Set the provider's API " +
          "key environment variable.")

  def aggregate(
      spark: SparkSession,
      chunks: Dataset[ProcessedChunk],
      llmCfg: LlmConfig,
      cfg: SummaryReduce.AggConfig = SummaryReduce.AggConfig()
  ): SummaryReduce.AggResult = {
    requireKey(llmCfg)
    SummaryReduce.aggregate(spark, chunks, llmCfg, cfg.copy(hierarchical = false))
  }
}
