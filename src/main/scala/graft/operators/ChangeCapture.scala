package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff + upsert application — the change-data-capture pair every
  * periodically-refreshed 100 TB dataset needs: compute WHAT changed
  * between two versions (regression-test a pipeline rerun, audit a vendor
  * refresh) and APPLY a change set to a base snapshot without rewriting
  * unchanged rows' semantics.
  *
  * Both are single full-outer equi-joins on the key: Spark co-partitions
  * the two sides on one hash exchange each, AQE handles size skew, and
  * when the update/right side is small it broadcasts. No window, no
  * global sort, no driver materialization.
  */
object ChangeCapture {

  /** Row-level diff `newDf − oldDf` keyed by `keyCols`: emits the key
    * columns plus `change_type ∈ {added, removed, changed}` — unchanged
    * rows are filtered out (at 100 TB they are the overwhelming majority;
    * they never leave the join stage). Non-key columns are compared as a
    * struct (null-safe, order per `oldDf` schema, which both frames must
    * share). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    require(oldDf.columns.toSeq == newDf.columns.toSeq,
      s"schemas must match: ${oldDf.columns.toSeq} vs ${newDf.columns.toSeq}")
    Guards.requireNoReserved(oldDf.columns,
      Seq("change_type", "__old", "__new"), "snapshotDiff")
    val payload = oldDf.columns.filterNot(keyCols.contains)
    def packed(df: DataFrame, tag: String) = df.select(
      keyCols.map(col) :+ struct(payload.map(col): _*).as(tag): _*)
    val joined = packed(oldDf, "__old")
      .join(packed(newDf, "__new"), keyCols, "full_outer")
    joined.select(
        keyCols.map(col) :+
        when(col("__old").isNull, lit("added"))
          .when(col("__new").isNull, lit("removed"))
          .when(!(col("__old") <=> col("__new")), lit("changed"))
          .as("change_type"): _*)
      .filter(col("change_type").isNotNull)
  }

  /** Apply a CDC upsert set to a base snapshot: rows whose key appears in
    * `updates` take the update's values, all other base rows pass through,
    * and update keys absent from the base insert. Equivalent to
    * `MERGE ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT` with
    * whole-row updates. `updates` must be key-unique — duplicate update
    * keys would make the result nondeterministic, so they fail loudly. */
  def applyUpserts(base: DataFrame, updates: DataFrame,
                   keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "applyUpserts needs at least one key column")
    require(base.columns.toSeq == updates.columns.toSeq,
      s"schemas must match: ${base.columns.toSeq} vs ${updates.columns.toSeq}")
    Guards.requireNoReserved(base.columns,
      Seq("__base", "__upd"), "applyUpserts")
    val payload = base.columns.filterNot(keyCols.contains)
    val keyed = updates.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        first(struct(payload.map(col): _*)).as("__upd"))
      .select(
        keyCols.map(col) :+
        when(col("__n") > 1, raise_error(concat(
            lit(s"applyUpserts: duplicate update key on (${keyCols.mkString(",")}): "),
            concat_ws(",", keyCols.map(c => col(c).cast("string")): _*))))
          .otherwise(col("__upd")).as("__upd"): _*)
    base.select(keyCols.map(col) :+ struct(payload.map(col): _*).as("__base"): _*)
      .join(keyed, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        coalesce(col("__upd"), col("__base")).as("__row"): _*)
      .select(keyCols.map(col) ++
        payload.map(c => col(s"__row.$c").as(c)): _*)
  }
}
