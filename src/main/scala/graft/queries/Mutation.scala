package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{SparseOps, SpatialOps}

/** Oracle-checked queries for the sparse mutation kernels (M6/M7), the
  * isotropic build (J6/M11), dynamic resampling (F7) and cuboid occupancy
  * (P7). The point list for paint/shave derives deterministically from the
  * second voxel view, so both engines compute identical point sets.
  */
object Mutation {

  private def vox(s: SparkSession, dir: String): DataFrame = VoxelView.engineDf(s, dir)

  /** Point list: coordinates of every third df2 voxel. */
  private def pts(s: SparkSession, dir: String): DataFrame =
    VoxelView.engineDf2(s, dir).where(col("value") % 3 === 0).drop("value")

  private val V = s"v AS (${VoxelView.sql})"
  private val P = s"p AS (SELECT DISTINCT t, x, y, z FROM (${VoxelView.sql2}) w2 WHERE id % 3 = 0)"

  val defs: Map[String, QueryDef] = Map(

    // M6 sparse paint, overwrite mode: every point gets the annotation id.
    "q42_annotate_sparse" -> QueryDef(
      (s, dir) =>
        SparseOps.annotateSparse(vox(s, dir), pts(s, dir), 555L, 'O')
          .select(col("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value")),
      Some(s"""WITH $V, $P SELECT
              |coalesce(v.t, p.t) AS t, coalesce(v.x, p.x) AS x,
              |coalesce(v.y, p.y) AS y, coalesce(v.z, p.z) AS z,
              |CASE WHEN p.t IS NOT NULL THEN 555 ELSE coalesce(v.id, 0) END AS value
              |FROM v FULL OUTER JOIN p ON v.t = p.t AND v.x = p.x AND v.y = p.y AND v.z = p.z
              |ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // M6 preserve mode: points land only on zero/absent voxels.
    "q43_annotate_preserve" -> QueryDef(
      (s, dir) =>
        SparseOps.annotateSparse(vox(s, dir), pts(s, dir), 555L, 'P')
          .select(col("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value")),
      Some(s"""WITH $V, $P SELECT
              |coalesce(v.t, p.t) AS t, coalesce(v.x, p.x) AS x,
              |coalesce(v.y, p.y) AS y, coalesce(v.z, p.z) AS z,
              |CASE WHEN p.t IS NOT NULL AND coalesce(v.id, 0) = 0 THEN 555
              |     ELSE coalesce(v.id, 0) END AS value
              |FROM v FULL OUTER JOIN p ON v.t = p.t AND v.x = p.x AND v.y = p.y AND v.z = p.z
              |ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // M6 'E' mode side output: conflicting points.
    "q44_annotate_exceptions" -> QueryDef(
      (s, dir) =>
        SparseOps.annotateExceptions(vox(s, dir), pts(s, dir), 555L)
          .select(col("t"), col("x"), col("y"), col("z"))
          .orderBy(col("t"), col("x"), col("y"), col("z")),
      Some(s"""WITH $V, $P SELECT p.t AS t, p.x AS x, p.y AS y, p.z AS z
              |FROM p JOIN v ON v.t = p.t AND v.x = p.x AND v.y = p.y AND v.z = p.z
              |WHERE v.id <> 0 AND v.id <> 555
              |ORDER BY 1, 2, 3, 4""".stripMargin.replace("\n", " "))),

    // M7 sparse shave: erase label 5 at the point list.
    "q45_shave_sparse" -> QueryDef(
      (s, dir) => {
        val (result, _, _) = SparseOps.shaveSparse(vox(s, dir), pts(s, dir), 5L)
        result
          .select(col("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value"))
      },
      Some(s"""WITH $V, $P SELECT
              |coalesce(v.t, p.t) AS t, coalesce(v.x, p.x) AS x,
              |coalesce(v.y, p.y) AS y, coalesce(v.z, p.z) AS z,
              |CASE WHEN p.t IS NOT NULL AND coalesce(v.id, 0) = 5 THEN 0
              |     ELSE coalesce(v.id, 0) END AS value
              |FROM v FULL OUTER JOIN p ON v.t = p.t AND v.x = p.x AND v.y = p.y AND v.z = p.z
              |ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // J6/M11 isotropic build: merge z-adjacent slice pairs.
    "q46_isotropic_build" -> QueryDef(
      (s, dir) =>
        SparseOps.isotropicBuild(vox(s, dir))
          .select(col("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value")),
      Some(s"""WITH $V,
              |a AS (SELECT t, x, y, z // 2 AS z, id AS va FROM v WHERE z % 2 = 0),
              |b AS (SELECT t, x, y, (z - 1) // 2 AS z, id AS vb FROM v WHERE z % 2 = 1)
              |SELECT coalesce(a.t, b.t) AS t, coalesce(a.x, b.x) AS x,
              |       coalesce(a.y, b.y) AS y, coalesce(a.z, b.z) AS z,
              |CASE WHEN coalesce(vb, 0) = 0 THEN coalesce(va, 0)
              |     WHEN coalesce(va, 0) = 0 THEN coalesce(vb, 0)
              |     ELSE (va + vb) // 2 END AS value
              |FROM a FULL OUTER JOIN b ON a.t = b.t AND a.x = b.x AND a.y = b.y AND a.z = b.z
              |ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // F7 dynamic resample: one anisotropic annotation level down.
    "q47_resample_down" -> QueryDef(
      (s, dir) =>
        SpatialOps.resample(vox(s, dir), 1, annotation = true)
          .select(col("t"), col("x"), col("y"), col("z"), col("value"))
          .orderBy(col("t"), col("x"), col("y"), col("z"), col("value")),
      // identical rule to q17 (resample(1, annotation) == one vote level)
      Some(s"""WITH $V, g AS (
              |  SELECT t, x // 2 AS x, y // 2 AS y, z, id,
              |         count(*) AS c, min((y % 2) * 2 + (x % 2)) AS p
              |  FROM v WHERE id <> 0 GROUP BY 1, 2, 3, 4, 5)
              |SELECT t, x, y, z, id AS value FROM (
              |  SELECT *, row_number() OVER (PARTITION BY t, x, y, z ORDER BY c DESC, p ASC, id ASC) AS rn
              |  FROM g) WHERE rn = 1
              |ORDER BY t, x, y, z, value""".stripMargin.replace("\n", " "))),

    // P7 occupancy: non-zero voxels per cuboid (16x16x4 grid).
    "q48_cuboid_occupancy" -> QueryDef(
      (s, dir) =>
        SpatialOps.cuboidOccupancy(vox(s, dir), graft.core.Region.CuboidDims(16, 16, 4))
          .select(col("t"), col("morton"), col("n_nonzero"))
          .orderBy(col("t"), col("morton")),
      Some {
        val m = graft.core.Morton.encodeSql("(x // 16)", "(y // 16)", "(z // 4)")
        s"""WITH $V SELECT t, $m AS morton, count(*) AS n_nonzero
           |FROM v WHERE id <> 0 GROUP BY 1, 2
           |ORDER BY t, morton""".stripMargin.replace("\n", " ")
      })
  )
}
