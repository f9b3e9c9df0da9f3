package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Semi-supervised constraint accounting (reference G10:
  * `hdbscanstar/Constraint.java:7-56`, `HDBSCANStar.java:738-789`):
  * must-link satisfied iff both points share a non-noise label; cannot-link
  * satisfied iff the labels differ or either point is noise. Constraints are
  * a small frame — both joins broadcast.
  */
object Constraints {

  /** Per-constraint satisfaction flags. */
  def check(constraints: DataFrame, labels: DataFrame): DataFrame =
    constraints
      .join(broadcast(labels.select(col("id").as("point_a"), col("label").as("label_a"))), "point_a")
      .join(broadcast(labels.select(col("id").as("point_b"), col("label").as("label_b"))), "point_b")
      .withColumn("satisfied",
        when(col("ctype") === "ml",
          col("label_a") === col("label_b") && col("label_a") =!= 0)
          .otherwise(col("label_a") =!= col("label_b") || col("label_a") === 0))

  /** Aggregate satisfaction counts per constraint type. */
  def summary(constraints: DataFrame, labels: DataFrame): DataFrame =
    check(constraints, labels)
      .groupBy(col("ctype"))
      .agg(count(lit(1)).as("total"),
        sum(when(col("satisfied"), 1L).otherwise(0L)).as("satisfied"))
      .orderBy(col("ctype"))
}
