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
  *     set comes from an equi-JOIN on the cell key. The losslessness
  *     condition radiusKm ≤ 110·cos(maxAbsLatDeg) is ENFORCED (builder
  *     require + per-row assert_true on |lat|), and lon cells wrap mod
  *     360, so antimeridian-straddling pairs join. Candidate volume is
  *     Σ_cell |L_cell|·|R_cell| — density-bounded, not |L|·|R|. Hot
  *     cells (cities) are the skew risk; AQE skew-split applies to the
  *     cell-id shuffle, and `saltCells > 1` shards hot home cells
  *     in-code (exact, same playbook as `q_join_salted`). Measured at 32×
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

  /** All pairs (idA < idB) of `points(id, lat, lon)` within `radiusKm`.
    *
    * Output: (id_a, id_b, dist_km rounded 1e-4). One row per qualifying
    * pair: the left copy expands to its 9 neighbor cells, the right copy
    * stays in its home cell, and the `id <` filter keeps exactly the
    * (expanded A, home B) orientation of each unordered pair.
    *
    * Domain contract (ENFORCED, not just documented): the 1° grid is
    * lossless only while one lon cell spans ≥ radiusKm of ground, i.e.
    * radiusKm ≤ 110·cos(maxAbsLatDeg). The builder `require`s that
    * inequality, and every row is passed through an `assert_true` on
    * |lat| ≤ maxAbsLatDeg — a point outside the declared band fails the
    * JOB loudly instead of silently dropping its qualifying pairs.
    * Longitude cells WRAP modulo 360 (`pmod(c+180, 360)−180`), so a
    * neighborhood expanded across the antimeridian (cell −181 → 179)
    * equi-joins the far side correctly; latitude needs no wrap because
    * the |lat| band excludes the poles.
    *
    * Skew (hot cells — cities): `saltCells > 1` splits every home cell
    * into `saltCells` hash shards and replicates the EXPANDED side per
    * shard (the `Skew.saltedJoin` playbook on the composite cell key) —
    * candidate pairs are exactly preserved (each (A,B) meets in B's one
    * shard), while the biggest shuffle task shrinks ×saltCells. AQE
    * skew-join handles moderate skew without it; salt when one metro
    * cell dominates the whole stage.
    */
  def radiusJoin(points: DataFrame, radiusKm: Double,
                 maxAbsLatDeg: Double = 60.0,
                 saltCells: Int = 1): DataFrame = {
    require(maxAbsLatDeg > 0 && maxAbsLatDeg < 89.0,
      s"maxAbsLatDeg must be in (0, 89), got $maxAbsLatDeg")
    require(saltCells >= 1, s"saltCells must be >= 1, got $saltCells")
    // 1 deg of longitude spans ~111.32*cos(lat) km; 110 is the safety
    // margin. A qualifying pair then differs by < 1 deg of lon, which the
    // 3x3 neighborhood always covers. At the 60-deg default: 55 km.
    val maxRadius = 110.0 * math.cos(math.toRadians(maxAbsLatDeg))
    require(radiusKm <= maxRadius,
      f"radiusJoin's 1-degree grid only covers radii <= $maxRadius%.1f km " +
      f"at |lat| <= $maxAbsLatDeg%.1f deg (got $radiusKm%.1f km); lower the " +
      "radius or the latitude band")
    // |lat| outside the declared band breaks the grid's lossless bound —
    // fail the row loudly (assert_true) rather than drop pairs silently.
    // The check is woven into the CELL computation, which every row on
    // both join sides must evaluate BEFORE the join — hanging it on the
    // output lat would let a bad point with no candidate pair skip the
    // assert entirely (its lat is only evaluated for matched candidates)
    val latChecked = when(
      assert_true(abs(col("lat")) <= lit(maxAbsLatDeg),
        lit(s"radiusJoin: point latitude outside the declared " +
          s"|lat| <= $maxAbsLatDeg deg band")).isNull,
      col("lat"))
    def wrapLon(c: Column): Column = (pmod(c + 180, lit(360)) - 180).cast("int")
    val p = points.select(col("id"), col("lat"), col("lon"),
      floor(latChecked).cast("int").as("cla"),
      wrapLon(floor(col("lon"))).as("clo"))
    // 9-cell neighborhood on the LEFT projection only (ids + coords);
    // per-shard replication when salted (shard count is tiny and bounded)
    val expanded = p.select(col("id"), col("lat"), col("lon"),
        explode(expr("array(-1, 0, 1)")).as("dla"), col("cla"), col("clo"))
      .select(col("id"), col("lat"), col("lon"),
        (col("cla") + col("dla")).as("cla"),
        explode(expr("array(-1, 0, 1)")).as("dlo"), col("clo"))
      .select(col("id"), col("lat"), col("lon"), col("cla"),
        wrapLon(col("clo") + col("dlo")).as("clo"))
      .withColumn("shard",
        if (saltCells == 1) lit(0)
        else explode(sequence(lit(0), lit(saltCells - 1))))
    val home = p.select(col("id").as("id_b"), col("lat").as("lat_b"),
        col("lon").as("lon_b"), col("cla"), col("clo"))
      .withColumn("shard",
        if (saltCells == 1) lit(0)
        else pmod(xxhash64(col("id_b")), lit(saltCells.toLong)).cast("int"))
    expanded.join(home, Seq("cla", "clo", "shard"))
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
  def knnJoin(points: DataFrame, radiusKm: Double, k: Int,
              maxAbsLatDeg: Double = 60.0, saltCells: Int = 1): DataFrame = {
    val pairs = radiusJoin(points, radiusKm, maxAbsLatDeg, saltCells)
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
