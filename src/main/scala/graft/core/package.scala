package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object core {
  /** A catalog query: (session, scale-factor dir) => result DataFrame.
    * Contract (SURVEY §5.4): deterministic output — total ORDER BY over all
    * output columns, doubles rounded (2dp; 4dp for cosine), timestamps only
    * observed through formatting/truncation, no nondeterministic functions.
    */
  type Q = (SparkSession, String) => DataFrame
}
