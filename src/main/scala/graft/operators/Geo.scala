package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Geospatial operators over point columns.
  *
  * The reference engine has no geo surface (its dataflow is genomics;
  * `workflow.py` never touches coordinates) — this family is part of the
  * training-data-pipeline extension surface: geo dedup/joins show up the
  * moment a corpus carries EXIF/geotag metadata.
  *
  * Scale design (the 100 TB question):
  *   - `radiusJoin` NEVER builds a cross product: points are bucketed into
  *     1°×1° grid cells, ONE side expands to its 3×3 cell neighborhood
  *     (9× on a 3-column projection, ids + coords only), and the candidate
  *     set comes from an equi-JOIN on the cell key. With radius ≤ ~50 km a
  *     1° cell (≥ 55.6 km of longitude at |lat| ≤ 60°) guarantees every
  *     qualifying pair shares a (neighborhood, home) cell, so the join is
  *     lossless. Candidate volume is Σ_cell |L_cell|·|R_cell| — density-
  *     bounded, not |L|·|R|. Hot cells (cities) are the skew risk; the
  *     shuffle key is the cell id, so AQE skew-split or salting applies
  *     directly, same playbook as `q_join_salted`. Measured at 32×
  *     (BASELINE.md round-8 part 2): wall grows with OUTPUT cardinality
  *     (the probe packs 32× the points into a fixed band → pairs ~density²,
  *     24.5k → 31.5M rows) while per-output-pair cost falls — the join
  *     shape itself stays cell-local.
  *   - `knnToProbes` is the broadcast brute-force shape shared with the
  *     ANN baselines (`q_llm_sim_topk`): a tiny probe table crosses the
  *     point scan once; per-probe top-k via a probe-partitioned window.
  *     O(|points|·|probes|) with |probes| driver-sized by contract.
  *
  * Determinism contract: coordinates and distances are doubles; catalog
  * outputs round through the shared floor(x·1e4+0.5)/1e4 convention and
  * order by integer ids. Haversine (R = 6371 km) matches the oracle's
  * formula text term-for-term.
  */
object Geo {

  /** Great-circle distance in km between (lat1,lon1) and (lat2,lon2),
    * haversine form, R = 6371 km. Squares are spelled x*x, not pow(x,2)
    * (the seasonalDecompose lesson: Math.pow is not bit-guaranteed to
    * equal the product); term order mirrors the oracle SQL. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val sLat = sin(radians(lat2 - lat1) / 2)
    val sLon = sin(radians(lon2 - lon1) / 2)
    lit(2.0 * 6371.0) * asin(sqrt(
      sLat * sLat + cos(radians(lat1)) * cos(radians(lat2)) * sLon * sLon))
  }

  /** All pairs (idA < idB) of `points(id, lat, lon)` within `radiusKm`
    * (must be ≤ 55 so the 1° grid bounds the search to 3×3 neighborhoods).
    *
    * Output: (id_a, id_b, dist_km rounded 1e-4). One row per qualifying
    * pair: the left copy expands to its 9 neighbor cells, the right copy
    * stays in its home cell, and the `id <` filter keeps exactly the
    * (expanded A, home B) orientation of each unordered pair.
    */
  def radiusJoin(points: DataFrame, radiusKm: Double): DataFrame = {
    require(radiusKm <= 55.0,
      s"radiusJoin's 1-degree grid only covers radii <= 55 km, got $radiusKm")
    val p = points.select(col("id"), col("lat"), col("lon"),
      floor(col("lat")).cast("int").as("cla"),
      floor(col("lon")).cast("int").as("clo"))
    // 9-cell neighborhood on the LEFT projection only (ids + coords)
    val expanded = p.select(col("id"), col("lat"), col("lon"),
        explode(expr("array(-1, 0, 1)")).as("dla"), col("cla"), col("clo"))
      .select(col("id"), col("lat"), col("lon"),
        (col("cla") + col("dla")).as("cla"),
        explode(expr("array(-1, 0, 1)")).as("dlo"), col("clo"))
      .select(col("id"), col("lat"), col("lon"), col("cla"),
        (col("clo") + col("dlo")).as("clo"))
    val home = p.select(col("id").as("id_b"), col("lat").as("lat_b"),
      col("lon").as("lon_b"), col("cla"), col("clo"))
    expanded.join(home, Seq("cla", "clo"))
      .where(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b"),
        haversineKm(col("lat"), col("lon"), col("lat_b"), col("lon_b"))
          .as("d"))
      .where(col("d") <= lit(radiusKm))
      .select(col("id_a"), col("id_b"),
        (floor(col("d") * 1e4 + lit(0.5)) / 1e4).as("dist_km"))
  }

  /** k-NN JOIN within a radius: for EVERY point, its k nearest neighbors
    * among all other points at distance ≤ `radiusKm` — the symmetric
    * closure of [[radiusJoin]] (each unordered pair emits both
    * directions) topped per point by a distance window. Points with no
    * neighbor in range emit nothing (the radius bound is what keeps the
    * candidate set grid-local at scale; an unbounded k-NN join needs ring
    * expansion, which brute-force probes or IVF cover elsewhere).
    */
  def knnJoin(points: DataFrame, radiusKm: Double, k: Int): DataFrame = {
    val pairs = radiusJoin(points, radiusKm)
    val sym = pairs.select(col("id_a").as("id"), col("id_b").as("nbr"),
        col("dist_km"))
      .unionAll(pairs.select(col("id_b").as("id"), col("id_a").as("nbr"),
        col("dist_km")))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("dist_km").asc, col("nbr").asc)
    sym.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("id"), col("rnk"), col("nbr"), col("dist_km"))
  }

  /** k nearest `points(id, lat, lon)` to each probe in
    * `probes(probe_id, plat, plon)` — probe table must be driver-sized
    * (broadcast); ties break on point id.
    * Output: (probe_id, rnk, id, dist_km rounded 1e-4).
    */
  def knnToProbes(points: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val scored = points.crossJoin(broadcast(probes))
      .select(col("probe_id"), col("id"),
        haversineKm(col("plat"), col("plon"), col("lat"), col("lon")).as("d"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("d").asc, col("id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("id"),
        (floor(col("d") * 1e4 + lit(0.5)) / 1e4).as("dist_km"))
  }
}
