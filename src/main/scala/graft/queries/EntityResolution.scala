package graft.queries

import graft.{SessionMemo, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared core of the entity-resolution family (er1/er2/er3/er5): the
  * planted-dirty record set and the blocked-match → connected-components
  * label stage er2 and er3 both consume.
  *
  * The label table is memoized per (session, dir) — the production
  * pattern it mirrors is "run the resolution ONCE, consume the entity
  * ids many times" (clustering report, golden record, downstream joins),
  * exactly how a 100 TB master-data pipeline materializes its match
  * result rather than re-running the blocked quadratic per consumer.
  * The persisted plan is (record_id, entity_id) longs for matched
  * records only — O(#matched records), two longs per row, MEMORY_AND_DISK
  * so it spills rather than pins. */
private[queries] object EntityResolution {

  /** Base + planted-dirty customer records (the er1/er2/er3/er5
    * contract: every 10th key re-appears with id+10⁶, a trailing 'x' on
    * the name, and bal_c offset by 1000). er4 mints its own variant
    * (different balance offset, synthesized zip). */
  def records(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_custkey").as("id"),
      col("c_name").as("name"), col("c_nationkey"), col("c_mktsegment"),
      floor(col("c_acctbal") * 100).cast("long").as("bal_c"))
    val dirty = Tables.customer(s, dir)
      .where(pmod(col("c_custkey"), lit(10)) === 0)
      .select((col("c_custkey") + 1000000L).as("id"),
        concat(col("c_name"), lit("x")).as("name"),
        col("c_nationkey"), col("c_mktsegment"),
        (floor(col("c_acctbal") * 100).cast("long") + 1000).as("bal_c"))
    c.unionByName(dirty)
  }

  /** The blocked candidate pairs within Levenshtein 2 — (nationkey,
    * mktsegment) blocking, banded-DP threshold variant (−1 past the
    * bound), id1 < id2. */
  def matchPairs(s: SparkSession, dir: String): DataFrame = {
    val recs = records(s, dir)
    val l = recs.select(col("id").as("id1"), col("name").as("n1"),
      col("c_nationkey"), col("c_mktsegment"))
    val r = recs.select(col("id").as("id2"), col("name").as("n2"),
      col("c_nationkey"), col("c_mktsegment"))
    l.join(r, Seq("c_nationkey", "c_mktsegment"))
      .where(col("id1") < col("id2") &&
        levenshtein(col("n1"), col("n2"), 2) >= 0)
      .select(col("id1"), col("id2"))
  }

  private val labelMemo = new SessionMemo[String, DataFrame]

  /** Connected-components entity labels over [[matchPairs]] —
    * (record_id, entity_id = min member id), matched records only.
    * Memoized per session: er2 (cluster report) and er3 (golden record)
    * consume the identical resolution, and the CC loop is the
    * expensive stage of both. Materialized eagerly inside the memo so
    * the persist fills while the CC loop's own intermediates are still
    * alive (they are released per-query by the harness). */
  def entityLabels(s: SparkSession, dir: String): DataFrame =
    labelMemo.getOrElseUpdate(s, dir) {
      val labels = graft.operators.Dedup
        .connectedComponents(matchPairs(s, dir), "id1", "id2")
        .select(col("doc_id").as("record_id"), col("cluster_id").as("entity_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      labels.count()
      labels
    }
}
