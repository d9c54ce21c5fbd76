package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loading helpers for the driver-generated TPC-H-ish
  * test data (see TESTDATA.md). Every `SparkEntry.queries` entry reads
  * through here so filters/projections push down to the parquet scan.
  */
object Tables {
  def tbl(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = tbl(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = tbl(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = tbl(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = tbl(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = tbl(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = tbl(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = tbl(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = tbl(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = tbl(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = tbl(s, d, "embeddings")
}
