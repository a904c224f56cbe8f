package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's four-step cleaning chain, column-wise and codegen'd.
  *
  * Reference order (`code/beam.py:111-121`) is semantically order-sensitive
  * and preserved exactly:
  *
  *   T1 `remove_last_colon` — strip exactly ONE trailing `:` from `items`
  *      (reference `code/beam.py:35-39`). `regexp_replace(items, ":$", "")`,
  *      not rtrim (which would strip runs).
  *   T2 lowercase — the reference lowercases the ENTIRE row string
  *      (`code/beam.py:118`); per-column `lower` is equivalent because `,`
  *      is case-invariant, and vectorizes.
  *   T3 `remove_special_characters` — delete `[?%&]` from every field
  *      (`code/beam.py:42-45`). Runs AFTER lowercase, so e.g. `Marga?ritA`
  *      → `marga?rita` → `margarita` and `delivered?` routes to the
  *      delivered branch.
  *   T4 append constant `new_col = "1"` (`code/beam.py:120`) — added after
  *      T3, so it is never itself cleaned.
  *
  * Malformed rows (fewer than the full field count) are dropped — the intent
  * of the deployed guard at `code/beam.py:50-51` (the reference actually
  * leaks `None` into the sink; we implement the intent, see SURVEY §2.1).
  *
  * Everything here is a built-in Catalyst expression: the whole chain fuses
  * into one WholeStageCodegen stage over the scan — zero shuffles, scales
  * linearly with input splits.
  */
object Clean {

  /** T1: strip exactly one trailing colon from the packed `items` list. */
  def removeLastColon(df: DataFrame): DataFrame =
    df.withColumn("items", regexp_replace(col("items"), ":$", ""))

  /** T2: lowercase every column (whole-row lowercase in the reference). */
  def lowercaseAll(df: DataFrame): DataFrame =
    df.columns.foldLeft(df)((d, c) => d.withColumn(c, lower(col(c))))

  /** T3: delete `?`, `%`, `&` from every column. */
  def removeSpecialCharacters(df: DataFrame): DataFrame =
    df.columns.foldLeft(df)((d, c) =>
      d.withColumn(c, regexp_replace(col(c), "[?%&]", "")))

  /** T4: append the constant marker column. */
  def addConstantColumn(df: DataFrame): DataFrame =
    df.withColumn("new_col", lit("1"))

  /** Drop rows that did not carry all physical fields (the reference's
    * `<12 fields after T4` guard, `code/beam.py:50-51`). [[Ingest]] retains
    * the raw comma-split field count, which distinguishes a row whose last
    * field is EMPTY (11 fields — kept, like the reference) from a row whose
    * last field is MISSING (10 fields — dropped); frames from other sources
    * without the count fall back to last-column-present. */
  def dropMalformed(df: DataFrame): DataFrame =
    if (df.columns.contains(Ingest.NFieldsCol))
      df.filter(col(Ingest.NFieldsCol) >= FoodSchema.rawColumns.length)
    else
      df.filter(col(FoodSchema.rawColumns.last).isNotNull)

  /** Full chain in reference order: T1 → T2 → T3 → T4, then malformed-row
    * drop, projected to the declared 12-column output order. */
  def apply(df: DataFrame): DataFrame = {
    val cleaned = addConstantColumn(
      removeSpecialCharacters(lowercaseAll(removeLastColon(df))))
    dropMalformed(cleaned)
      .select(FoodSchema.outputColumns.map(col): _*)
  }
}
