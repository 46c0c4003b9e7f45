package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

/** Nested-struct flattening (SURVEY §2.2 P1) — the Spark-native equivalent
  * of `pd.json_normalize` (reference: qb_bills.py:65, qb_billpayments.py:80).
  *
  * `json_normalize` turns nested objects into `.`-joined column paths
  * (`VendorRef.value`); arrays are left intact (they are exploded or
  * stringified separately, P2/P5). We do the same: recurse into StructType
  * fields, stop at ArrayType/leaf, and name the result with the joined path
  * run through a configurable renamer (usually [[Names.snakeCase]]).
  *
  * Pure DataFrame API — the projection is a single `select`, so Catalyst
  * column-pruning and parquet pushdown see straight through it.
  */
object Flatten {

  /** All leaf columns of `schema`, with their dotted source path. */
  def leafPaths(schema: StructType, prefix: String = ""): Seq[String] =
    schema.fields.toSeq.flatMap {
      case StructField(name, st: StructType, _, _) =>
        leafPaths(st, s"$prefix$name.")
      case StructField(name, _, _, _) => Seq(s"$prefix$name")
    }

  /** Flatten every nested struct to a top-level column named by `rename`
    * applied to the dotted path. Arrays and scalars pass through.
    */
  def flatten(df: DataFrame, rename: String => String = Names.snakeCase): DataFrame = {
    val cols = flatColumns(df.schema, "", rename)
    df.select(cols: _*)
  }

  private def flatColumns(schema: StructType, prefix: String,
      rename: String => String): Seq[Column] =
    schema.fields.toSeq.flatMap {
      case StructField(name, st: StructType, _, _) =>
        flatColumns(st, s"$prefix$name.", rename)
      case StructField(name, _, _, _) =>
        Seq(col(s"$prefix$name").alias(rename(s"$prefix$name")))
    }
}
