package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata layout
  * (`$sfDir/<table>.parquet`, see TESTDATA.md). Thin wrappers so every query
  * reads through one place; Catalyst handles column pruning + filter
  * pushdown into these scans.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String) = apply(s, d, "region")
  def nation(s: SparkSession, d: String) = apply(s, d, "nation")
  def customer(s: SparkSession, d: String) = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String) = apply(s, d, "supplier")
  def part(s: SparkSession, d: String) = apply(s, d, "part")
  def orders(s: SparkSession, d: String) = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String) = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String) = apply(s, d, "events")
  def documents(s: SparkSession, d: String) = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = apply(s, d, "embeddings")
}
