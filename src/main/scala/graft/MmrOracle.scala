package graft

/** Pinned DuckDB oracle for the MMR diversified rerank
  * (`q_mmr_rerank`) — the [[HnswOracle]] scheme: the greedy selection
  * is not SQL-expressible, but every stage is deterministic (the exact
  * blocked-scan candidate list is bit-identical cross-engine, both
  * similarity kinds quantize to integer micro-units before any
  * comparison, the greedy objective is pure Long arithmetic with
  * ascending-id ties), so the sf0.01 rows are constants of
  * (corpus, k, m, λµ), verified by back-to-back identical dumps. All
  * five columns are BIGINT — no float pinning needed. Regenerate after
  * an intentional change via `graft.tools.OracleDump q_mmr_rerank`. */
private[graft] object MmrOracle {

  val rerankSql: String =
    """SELECT CAST(query_id AS BIGINT) AS query_id, CAST(doc_id AS BIGINT) AS doc_id,
      |  CAST(rnk AS BIGINT) AS rnk, CAST(rel_micro AS BIGINT) AS rel_micro,
      |  CAST(mmr_micro AS BIGINT) AS mmr_micro
      |FROM (VALUES
      |""".stripMargin + rows + """
      |) AS t(query_id, doc_id, rnk, rel_micro, mmr_micro)
      |ORDER BY ALL NULLS FIRST""".stripMargin

  private def rows: String =
    """(0,73,2,295434,195336600000),
      |(0,334,5,362722,171287200000),
      |(0,365,1,369993,258995100000),
      |(0,387,3,331138,190378600000),
      |(0,483,4,256700,186165800000),
      |(191,87,2,243771,219134700000),
      |(191,231,3,263328,163104300000),
      |(191,328,4,273163,156400900000),
      |(191,358,5,269087,154202600000),
      |(191,431,1,442058,309440600000),
      |(382,25,5,322113,173662500000),
      |(382,149,3,373609,222375700000),
      |(382,178,2,305313,235885800000),
      |(382,334,1,429677,300773900000),
      |(382,340,4,355833,183213300000)""".stripMargin
}
