package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — change-data-capture classification between two
  * versions of a keyed table: one full-outer join emits each key as
  * inserted / deleted / updated / unchanged. The audit step after an
  * [[Upsert]], and the source of minimal downstream refreshes (ship the
  * non-`unchanged` rows only).
  */
object Diff {

  /** @param before  earlier snapshot
    * @param after   later snapshot (same schema)
    * @param keys    identity columns
    * @param compare value columns whose change makes a row `updated`
    * @return keys + `change_type` + before/after values of `compare`
    *         columns (prefixed `old_` / `new_`)
    */
  def snapshotDiff(before: DataFrame, after: DataFrame, keys: Seq[String],
                   compare: Seq[String]): DataFrame = {
    val b = before.select((keys ++ compare).map(col): _*)
      .withColumn("__b", lit(1))
      .withColumnsRenamed(compare.map(c => c -> s"old_$c").toMap)
    val a = after.select((keys ++ compare).map(col): _*)
      .withColumn("__a", lit(1))
      .withColumnsRenamed(compare.map(c => c -> s"new_$c").toMap)
    val changed = compare
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    b.join(a, keys, "full_outer")
      .withColumn("change_type",
        when(col("__b").isNull, "inserted")
          .when(col("__a").isNull, "deleted")
          .when(changed, "updated")
          .otherwise("unchanged"))
      .drop("__a", "__b")
  }
}
