package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DBSCAN density clustering (Ester, Kriegel, Sander & Xu, KDD'96)
  * over geographic points, composed from the engine's own proven
  * pieces: [[GeoJoin.radiusPairs]] candidate generation (cell
  * collision — candidates scale with spatial density, never
  * |points|²) and [[ConnectedComponents.labelPropagation]] over the
  * core-core ε-graph.
  *
  * The scale move is SITE COLLAPSE before any pairing: co-located
  * points (duplicate coordinates are endemic in real feeds — store
  * locations, geocoded city centroids) group to one weighted site.
  * This is EXACTLY equivalent to point-level DBSCAN: same-site points
  * are at d = 0 ≤ ε of each other, so they share neighbor counts,
  * hence core status, hence cluster — while the pair space shrinks
  * from points² to sites² in the worst cell.
  *
  * Semantics (deterministic throughout, so a SQL oracle replays it):
  *  - core: ≥ minPts OTHER points within ε (multiplicity-weighted;
  *    DBSCAN's usual self-inclusive count is this with minPts−1)
  *  - cluster label: the MIN core site id of the connected component
  *    of the core-core ε-graph
  *  - border: non-core with a core site within ε; takes the MIN
  *    core-neighbor cluster — a deterministic refinement of DBSCAN's
  *    scan-order-dependent border assignment
  *  - noise: everything else (cluster = null)
  *
  * Cache lifetime (the [[KCore]] family contract): the returned plan
  * references four cached intermediates (site, ssym, core, lbl), each
  * read by 2+ downstream branches of the SAME plan — unpersisting
  * before return would recompute the radius join per branch. They stay
  * persisted until the caller's `GraftSession.withQueryCaches` scope
  * exits (or `spark.catalog.clearCache()`); direct library callers
  * outside such a scope should wrap the call, or the cached frames
  * live for the session.
  *
  * @return (id, role∈{core,border,noise}, cluster: long or null) —
  *         one row per in-bounds input point
  */
object Dbscan {

  def cluster(points: DataFrame, idCol: String, latCol: String,
              lonCol: String, epsKm: Double, minPts: Int,
              maxAbsLat: Double = 80.0): DataFrame = {
    val pts = points
      .select(col(idCol).as("id"), col(latCol).cast("double").as("lat"),
        col(lonCol).cast("double").as("lon"))
      .filter(col("lat").isNotNull && col("lon").isNotNull &&
        abs(col("lat")) <= maxAbsLat)
    val site = pts.groupBy("lat", "lon")
      .agg(min("id").as("sid"), count(lit(1)).as("mult")).cache()
    val sp = GeoJoin.radiusPairs(site, "sid", "lat", "lon",
      radiusKm = epsKm, maxAbsLat = maxAbsLat)
    // symmetrize with ONE reference to the radius join (explode, not a
    // union of two selects): the union form embedded the expensive
    // cell-collision + haversine subtree twice, so filling this cache
    // paid the radius join twice
    val ssym = sp.select(explode(array(
        struct(col("a_id").as("sa"), col("b_id").as("sb")),
        struct(col("b_id").as("sa"), col("a_id").as("sb")))).as("__e"))
      .select(col("__e.sa").as("sa"), col("__e.sb").as("sb"))
      .cache()
    val nbm = ssym
      .join(site.select(col("sid").as("sb"), col("mult").as("__tm")), Seq("sb"))
      .groupBy("sa").agg(sum("__tm").as("__nb"))
      .withColumnRenamed("sa", "sid")
    val core = site.select(col("sid"), col("mult"))
      .join(nbm, Seq("sid"), "left")
      .filter(col("mult") - 1 + coalesce(col("__nb"), lit(0L)) >= minPts)
      .select("sid").cache()
    val ce = ssym
      .join(core.withColumnRenamed("sid", "sa"), Seq("sa"), "left_semi")
      .join(core.withColumnRenamed("sid", "sb"), Seq("sb"), "left_semi")
      .select("sa", "sb")
      .unionByName(core.select(col("sid").as("sa"), col("sid").as("sb")))
    val lbl = ConnectedComponents.labelPropagation(ce, "sa", "sb")
      .select(col("node").as("sid"), col("component").as("cluster")).cache()
    val bord = ssym
      .join(core.withColumnRenamed("sid", "sa"), Seq("sa"), "left_anti")
      .join(lbl.select(col("sid").as("sb"), col("cluster")), Seq("sb"))
      .groupBy("sa").agg(min("cluster").as("bcluster"))
      .withColumnRenamed("sa", "sid")
    pts.join(site.select("lat", "lon", "sid"), Seq("lat", "lon"))
      .join(lbl, Seq("sid"), "left")
      .join(bord, Seq("sid"), "left")
      .select(col("id"),
        when(col("cluster").isNotNull, "core")
          .when(col("bcluster").isNotNull, "border")
          .otherwise("noise").as("role"),
        coalesce(col("cluster"), col("bcluster")).cast("long").as("cluster"))
  }
}
