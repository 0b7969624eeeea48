package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL-native table creation paths through the snaplog catalog: CTAS
  * and INSERT OVERWRITE both compose from existing pieces (createTable +
  * the connector's append/truncate writes) — pinned here so the surface
  * cannot silently regress. */
class CtasSpec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._

  test("CTAS and INSERT OVERWRITE through the catalog") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ctas").toString
    spark.conf.set("spark.sql.catalog.ctasw", "graft.sources.SnaplogCatalog")
    spark.conf.set("spark.sql.catalog.ctasw.warehouse", wh)
    (1L to 30L).map(i => (i, s"v$i")).toDF("id", "v")
      .createOrReplaceTempView("ctas_src")
    spark.sql("CREATE TABLE ctasw.t1 USING snaplog " +
      "TBLPROPERTIES ('key'='id') AS SELECT * FROM ctas_src")
    assert(spark.sql("SELECT count(*) FROM ctasw.t1").head().getLong(0) == 30)
    spark.sql("INSERT OVERWRITE ctasw.t1 SELECT id + 100 AS id, v " +
      "FROM ctas_src WHERE id <= 5")
    assert(spark.sql("SELECT count(*) FROM ctasw.t1").head().getLong(0) == 5)
  }
}
