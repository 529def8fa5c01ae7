package graft.impute

/** Caller-declared column roles for an imputation run — mirrors the
  * reference API's `numerical_columns` / `categorical_columns` split
  * (upstream: boltzmannclean.py `clean()` signature — see SURVEY.md §1.1;
  * /root/reference was empty, citations are to the public upstream repo).
  * Roles are never inferred: inference would make oracle results depend
  * on data statistics ordering.
  *
  * @param numeric      columns min-max scaled into [0,1]
  * @param categorical  columns one-hot encoded (cardinality-capped)
  * @param maxCardinality per-column distinct cap; categories beyond the
  *        top-K by frequency collapse into an OTHER bucket so the encoded
  *        width — and therefore the RBM weight matrix that must broadcast
  *        to every executor — stays bounded at 100 TB row counts.
  */
case class ImputeSpec(
    numeric: Seq[String],
    categorical: Seq[String] = Seq.empty,
    maxCardinality: Int = 10000) {
  require(numeric.nonEmpty || categorical.nonEmpty, "ImputeSpec needs at least one column")
  def all: Seq[String] = numeric ++ categorical
}
