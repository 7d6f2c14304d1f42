package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keep-latest compaction and CDC-style upsert merge — the snapshot
  * maintenance step of any incrementally-updated corpus (re-crawled
  * documents, re-embedded chunks, mutable user state). */
object Upsert {

  /** One row per key: the row with the greatest `orderCols` tuple.
    * A partial-aggregating `max(struct(order..., payload...))` — ONE
    * shuffle keyed by the key columns with map-side combine, never a
    * row_number window (which sorts whole partitions and cannot
    * pre-aggregate). `orderCols` should totally order rows within a
    * key (e.g. version + unique id); otherwise the remaining payload
    * columns act as further tiebreakers, keeping the result
    * deterministic either way. */
  def keepLatest(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty, "keys and order required")
    val payload = orderCols ++
      df.columns.filterNot(c => keyCols.contains(c) || orderCols.contains(c))
    df.groupBy(keyCols.map(col): _*)
      .agg(max(struct(payload.map(col): _*)).as("__m"))
      .select(keyCols.map(col) ++ payload.map(c => col(s"__m.$c")): _*)
  }

  /** CDC upsert: the base snapshot merged with an update batch, newest
    * version per key winning (ties resolved as in [[keepLatest]]).
    * Union + one keyed aggregation — no join, so an update batch that
    * touches every key costs the same as one that touches none. */
  def upsertMerge(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String]): DataFrame =
    keepLatest(base.unionByName(updates), keyCols, orderCols)
}
