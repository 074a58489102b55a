package graft.operators

/** Shared input-contract checks for operators that add internal or output
  * columns: one wording, one semantics, every operator. */
private[graft] object Guards {

  /** Fail fast when the input already uses a column name the operator would
    * silently overwrite (`withColumn`) or mis-join on (internal keys). */
  def requireNoReserved(cols: Iterable[String], reserved: Iterable[String],
                        op: String): Unit = {
    val clash = cols.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"column names $clash are reserved by $op — rename them first")
  }

  /** Fail fast when two join inputs share column names (operators that
    * combine both sides into one output row). */
  def requireDisjoint(left: Iterable[String], right: Iterable[String],
                      what: String): Unit = {
    val overlap = left.toSet.intersect(right.toSet)
    require(overlap.isEmpty, s"$what column names must be disjoint, shared: $overlap")
  }
}
