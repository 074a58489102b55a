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

  /** Slowly-changing-dimension Type 2 maintenance: fold a new full
    * snapshot into a versioned history table. `history` carries the
    * snapshot's columns plus `valid_from` / `valid_to` (NULL = current
    * version); `asOf` is the snapshot's effective version stamp (any
    * orderable type — epoch long, date, timestamp — matching
    * `valid_from`). Per key:
    *
    *  - payload unchanged → the open row passes through untouched;
    *  - payload changed   → the open row closes at `asOf` and the new
    *    version opens at `asOf`;
    *  - key absent from the snapshot → the open row closes (deletion);
    *  - key new (or previously deleted) → a fresh version opens.
    *
    * Closed rows never enter the join — they stream through a metadata
    * union branch, so a 10-year history costs the same as a 1-day one.
    * The live work is ONE full-outer equi-join of the open slice against
    * the snapshot; the 0–2 output rows per key come from exploding a
    * 2-slot filtered array, not a second join. Duplicate open-row or
    * snapshot keys fail loudly ([[applyUpserts]] contract), as does a
    * close that would produce a degenerate `valid_to <= valid_from`
    * interval (an `asOf` older than the open row). Bootstrap with a
    * zero-row history frame of the right schema. */
  def scd2Apply(history: DataFrame, snapshot: DataFrame,
                keyCols: Seq[String],
                asOf: org.apache.spark.sql.Column): DataFrame = {
    require(keyCols.nonEmpty, "scd2Apply needs at least one key column")
    require(history.columns.toSeq ==
        snapshot.columns.toSeq ++ Seq("valid_from", "valid_to"),
      s"history schema must be snapshot schema + (valid_from, valid_to): " +
        s"${history.columns.toSeq} vs ${snapshot.columns.toSeq}")
    Guards.requireNoReserved(snapshot.columns,
      Seq("__oldp", "__oldfrom", "__newp", "__n", "__r"), "scd2Apply")
    val payload = snapshot.columns.filterNot(keyCols.contains)
    val keyCs = keyCols.map(col)
    val closed = history.filter(col("valid_to").isNotNull)
    val open = history.filter(col("valid_to").isNull)
    def dupGuard(df: DataFrame, packed: String, what: String,
                 extra: Seq[String]): DataFrame = df
      .select(keyCs :+
        when(col("__n") > 1, raise_error(concat(
            lit(s"scd2Apply: duplicate $what key on (${keyCols.mkString(",")}): "),
            concat_ws(",", keyCs.map(_.cast("string")): _*))))
          .otherwise(col(packed)).as(packed) :++ extra.map(col): _*)
    val cur = dupGuard(open.groupBy(keyCs: _*)
        .agg(count(lit(1)).as("__n"),
          first(struct(payload.map(col): _*)).as("__oldp"),
          first(col("valid_from")).as("__oldfrom")),
      "__oldp", "open-history", Seq("__oldfrom"))
    val snap = dupGuard(snapshot.groupBy(keyCs: _*)
        .agg(count(lit(1)).as("__n"),
          first(struct(payload.map(col): _*)).as("__newp")),
      "__newp", "snapshot", Seq.empty)
    val joined = cur.join(snap, keyCols, "full_outer")
    val differs = !(col("__oldp") <=> col("__newp"))
    // close stamp: NULL (row stays open) unless the payload changed or the
    // key vanished; a close at-or-before the open stamp is corrupt input
    val closeAt = when(col("__newp").isNull || differs,
      when(asOf <= col("__oldfrom"), raise_error(concat(
          lit("scd2Apply: asOf must be after the open row's valid_from, got "),
          asOf.cast("string"), lit(" <= "), col("__oldfrom").cast("string"))))
        .otherwise(asOf))
    val oldRow = when(col("__oldp").isNotNull,
      struct(col("__oldp").as("p"), col("__oldfrom").as("vf"),
        closeAt.as("vt")))
    val newRow = when(col("__newp").isNotNull && (col("__oldp").isNull || differs),
      struct(col("__newp").as("p"), asOf.as("vf"),
        when(lit(false), asOf).as("vt")))
    val updated = joined
      .select(keyCs :+
        explode(filter(array(oldRow, newRow), r => r.isNotNull)).as("__r"): _*)
      .select(keyCs ++
        payload.map(c => col(s"__r.p.$c").as(c)) :+
        col("__r.vf").as("valid_from") :+ col("__r.vt").as("valid_to"): _*)
    closed.unionByName(updated)
  }
}
