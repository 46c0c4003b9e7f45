package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** Array-of-struct handling for QBO `Line`-style columns
  * (SURVEY §2.2 P2-P5).
  *
  * Semantic trap (SURVEY §7.1): pandas `explode` KEEPS a row (with NaN)
  * for an empty or missing list (qb_jounalentry.py:104-110), so the Spark
  * equivalent is `explode_outer`, never `explode`. The pandas
  * `json_normalize(df['line'])` + positional `concat` dance
  * (qb_jounalentry.py:114-117) is unnecessary here: after `explode_outer`
  * the struct fields are selected directly — no positional join, no
  * `reset_index` fragility.
  */
object Lines {

  /** P2+P3: one row per `Line` element, child fields flattened next to the
    * parent columns. Child column names are `snakeCase(childPath)` mapped
    * through `renames` (the reference's R3 rename table,
    * qb_jounalentry.py:119-134) — applied at select time so child names
    * like `id` never transiently collide with parent columns (pandas
    * avoids the collision only because its children stay CamelCase until
    * the rename; Spark resolves by name, so we rename eagerly).
    */
  def explodeLines(df: DataFrame, lineCol: String,
      renames: Map[String, String] = Map.empty): DataFrame = {
    val elemType = df.schema(lineCol).dataType match {
      case ArrayType(st: StructType, _) => st
      case other =>
        throw new IllegalArgumentException(
          s"$lineCol must be array<struct>, got $other")
    }
    val parents = df.columns.filterNot(_ == lineCol).map(col).toSeq
    val exploded = df.withColumn("__line", explode_outer(col(lineCol)))
    val children = Flatten.leafPaths(elemType).map { path =>
      val snake = Names.snakeCase(path)
      col(s"__line.$path").alias(renames.getOrElse(snake, snake))
    }
    exploded.select(parents ++ children: _*)
  }

  /** P5: keep a nested column as a JSON string (`astype("string")` on a
    * column of dicts — qb_bills.py:107,112). Deviation documented in
    * SURVEY §7.5: the reference stores Python `repr` (single quotes); we
    * store valid JSON.
    */
  def stringify(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, to_json(col(c))))
}
