package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark DataFrame program plus (when SQL-expressible)
  * the equivalent DuckDB SQL the driver's oracle runs over the same parquet
  * tables. Column names/aliases MUST match between the two — the driver
  * sorts columns by name before hashing values.
  *
  * Portability rules used throughout (validated against DuckDB 1.0):
  *   - every double aggregate is `round(x, 2)` on BOTH sides (engines sum
  *     doubles in different orders; 2dp absorbs the ulp drift);
  *   - function-produced integers are cast to Long on the Spark side where
  *     DuckDB returns BIGINT (year, length, row_number, size, ...);
  *   - results that feed a LIMIT always carry a total tie-break order;
  *   - timestamps never appear in output columns (epochs/parts instead).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)
