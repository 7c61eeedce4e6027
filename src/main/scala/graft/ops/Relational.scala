package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator battery (SURVEY.md §2b).
  *
  * The reference (`/root/reference/Sample-Json-to-SQL-Full-Pipeline-EO-10-03-2019.py`)
  * implements none of these — SURVEY.md §2b maps each required
  * analytics-engine category onto the Spark primitive exposed here. Every
  * query is a declarative DataFrame plan: Catalyst does pushdown/pruning,
  * AQE picks shuffle/broadcast strategy at runtime, whole-stage codegen
  * covers the hot path.
  *
  * Scale notes (100 TB / 1000 executors) are given per query; the harness
  * runs local[32] at sf<=0.1 but plans are written for the big case.
  */
object Relational {

  /** q01 — flagship TPC-H-Q1-shaped pricing summary.
    * scan -> filter (pushed to parquet) -> partial+final hash agg -> sort.
    * At scale: single shuffle on a 6-value grouping key; partial
    * aggregation collapses ~100 TB of scan down to <1 KB per task before
    * the exchange, so the shuffle is negligible. Sums over doubles are
    * rounded for oracle determinism (float summation order).
    */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")), 2).as("sum_charge"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_extendedprice"), 4).as("avg_price"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }
}
