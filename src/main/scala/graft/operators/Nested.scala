package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nested-document assembly and flattening — the reference nests
  * attachments (with their flag sub-lists) inside each bug document
  * and flattens DB rows into them (reference:
  * bugzilla_etl/extract_bugzilla.py:330 flatten_bugs_record, :591
  * flatten_attachments; transform_bugzilla.py:62 attachment sorting).
  *
  * Orders play the bug role and lineitems the attachments: build the
  * nested doc (sorted struct array, one groupBy), then flatten it back
  * (explode) — the round trip is asserted in specs, the flat output is
  * oracle-checked. */
object Nested {

  /** Nested form: one row per order with a sorted items array. */
  def nestedDocs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("orderkey"))
      .agg(array_sort(collect_list(struct(
        col("l_linenumber").as("linenumber"),
        round(col("l_quantity"), 2).as("qty"),
        round(col("l_extendedprice"), 2).as("price")))).as("items"))

  /** N1: build nested docs, then flatten back with the item count each
    * row carried while nested. */
  def n1NestedFlatten(s: SparkSession, d: String): DataFrame =
    nestedDocs(s, d)
      .select(col("orderkey"), size(col("items")).cast("long").as("n_items"),
        explode(col("items")).as("item"))
      .select(col("orderkey"), col("n_items"),
        col("item.linenumber").as("linenumber"),
        col("item.qty").as("qty"), col("item.price").as("price"))
      .orderBy("orderkey", "linenumber")
}
