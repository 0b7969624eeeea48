package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

package object core {
  /** A catalog query: (session, scale-factor dir) => result DataFrame.
    * Contract (SURVEY §5.4): deterministic output — total ORDER BY over all
    * output columns, doubles rounded (2dp; 4dp for cosine), timestamps only
    * observed through formatting/truncation, no nondeterministic functions.
    */
  type Q = (SparkSession, String) => DataFrame

  /** Chain-position syntax for [[Checkpoints.checkpoint]] — every loop's
    * lineage-truncation point goes through the one reliable/local knob. */
  implicit class GraftCheckpointOps[T](private val ds: Dataset[T]) extends AnyVal {
    def graftCheckpoint(eager: Boolean = true): Dataset[T] =
      Checkpoints.checkpoint(ds, eager)
  }
}
