package graft.engine

import org.apache.spark.sql.Column

/** Clause forms for [[GraftTable.merge]] — the engine-level MERGE INTO
  * surface (reference: the MoR table properties the notebook sets in
  * cell 18, Pyspark_Notebook.ipynb:557, exist for exactly this DML).
  *
  * Clause conditions and assignment values are ordinary Columns that
  * re-resolve against the merge's internal joins:
  *   - matched clauses see target AND source columns (qualify with the
  *     target alias / the source's own alias when names collide);
  *   - not-matched (insert) clauses see SOURCE columns only;
  *   - not-matched-by-source clauses see TARGET columns only.
  * Clauses are evaluated in the order given: the FIRST clause whose
  * condition is TRUE applies, later ones are ignored (SQL semantics).
  */
sealed trait MergeMatchedClause { def condition: Option[Column] }

/** WHEN [NOT] MATCHED [AND cond] THEN UPDATE SET k = v, ... */
final case class MergeUpdateClause(condition: Option[Column],
    assignments: Map[String, Column]) extends MergeMatchedClause

/** WHEN MATCHED [AND cond] THEN UPDATE SET * — every target column is
  * assigned from the same-named source column.
  */
final case class MergeUpdateAllClause(condition: Option[Column])
    extends MergeMatchedClause

/** WHEN [NOT] MATCHED [AND cond] THEN DELETE */
final case class MergeDeleteClause(condition: Option[Column])
    extends MergeMatchedClause

sealed trait MergeInsertClause { def condition: Option[Column] }

/** WHEN NOT MATCHED [AND cond] THEN INSERT (cols) VALUES (exprs) —
  * unassigned target columns null-fill (standard SQL).
  */
final case class MergeInsertValuesClause(condition: Option[Column],
    assignments: Map[String, Column]) extends MergeInsertClause

/** WHEN NOT MATCHED [AND cond] THEN INSERT * — by-name from the source. */
final case class MergeInsertAllClause(condition: Option[Column])
    extends MergeInsertClause
