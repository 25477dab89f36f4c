package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution by edit distance — the fuzzy-match counterpart of
  * the framework's exact-key joins: find record pairs whose string keys
  * differ by at most one edit (typo'd names, OCR'd ids, hand-entered
  * codes). The reference's join surface is exact-equality MapReduce
  * shuffles; a fuzzy join is the same shuffle with a cleverer key.
  *
  * The blocking scheme is the DELETION NEIGHBORHOOD (FastSS): each
  * string emits itself plus every single-character deletion, and two
  * records are candidates iff they share ANY variant. Unlike prefix or
  * soundex blocking this is an EXACT candidate superset for edit
  * distance <= 1 — if lev(s, t) <= 1 then D1(s) ∩ D1(t) is non-empty:
  * equal strings share themselves; a substitution at position i makes
  * both i-deletions equal; an insertion makes the shorter string itself
  * a member of both neighborhoods. So the final `levenshtein <= 1`
  * verify filters candidates, it never rescues misses — recall is 1.0
  * by construction, not by tuning.
  *
  * Scale shape: the variant relation is |rows|·(len+1) — linear with a
  * small constant for key-length strings — and candidates come off a
  * standard variant-keyed hash join, NEVER an all-pairs product. A
  * variant bucket holds only strings one deletion away from one
  * another, so per-bucket fan-out is bounded by the alphabet, not the
  * table; the exact verify runs on candidates only. The whole job is
  * two shuffles (variant join + pair distinct) at any table size.
  */
object FuzzyJoin {

  /** `{s} ∪ {s with character i deleted}` as a deduplicated array
    * column. `strCol` must reference a string column by name (the
    * expression substitutes it textually). */
  private def deletionNeighborhood(strCol: String): Column = expr(
    s"array_union(array($strCol), transform(sequence(1, length($strCol)), " +
      s"i -> concat(substring($strCol, 1, i - 1), " +
      s"substring($strCol, i + 1, length($strCol)))))")

  /** All unordered pairs (id1 < id2) of rows whose `strCol` values are
    * within edit distance 1, with the exact distance. Output:
    * (id1, id2, dist). */
  def editDist1SelfPairs(
      df: DataFrame,
      idCol: String,
      strCol: String): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(strCol).as("nm"))
      .withColumn("var", explode(deletionNeighborhood("nm")))
    val cand = v.as("a")
      .join(v.as("b"), col("a.var") === col("b.var") && col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.nm").as("n1"), col("b.nm").as("n2"))
      .distinct()
    cand
      .where(levenshtein(col("n1"), col("n2")) <= 1)
      .select(col("id1"), col("id2"),
        levenshtein(col("n1"), col("n2")).cast("long").as("dist"))
  }

  /** DuckDB replay of `editDist1SelfPairs` over `table(idExpr, strExpr)`
    * — identical neighborhood generation, candidate join, and verify. */
  def editDist1OracleSql(table: String, idExpr: String, strExpr: String): String =
    s"""WITH v AS (
       |  SELECT $idExpr AS id, $strExpr AS nm,
       |         unnest(list_prepend($strExpr,
       |           list_transform(range(1, length($strExpr) + 1),
       |             i -> substr($strExpr, 1, i - 1) || substr($strExpr, i + 1, length($strExpr))))) AS var
       |  FROM $table),
       |cand AS (
       |  SELECT DISTINCT a.id AS id1, b.id AS id2, a.nm AS n1, b.nm AS n2
       |  FROM v a JOIN v b ON a.var = b.var AND a.id < b.id)
       |SELECT id1, id2, CAST(levenshtein(n1, n2) AS BIGINT) AS dist
       |FROM cand
       |WHERE levenshtein(n1, n2) <= 1
       |ORDER BY id1, id2""".stripMargin
}
