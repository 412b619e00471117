package graft.core

/** Cuboid-aligned region decomposition.
  *
  * Re-expresses the planning math of the reference's `Region` class
  * (`spdb/spatialdb/region.py:48-376`): given a requested world-space box
  * `[corner, corner+extent)` and the fixed chunk shape, split it into
  *   - one *interior* box of fully-covered cuboids (answerable from the
  *     cuboid/id indexes without touching voxel data), and
  *   - up to six *boundary slabs* (partial cuboids) that need voxel reads.
  *
  * All boxes use the Python-range convention `[start, stop)`. This is pure
  * driver-side planning; the output feeds Morton-range / coordinate
  * predicates that Spark pushes into the parquet scan.
  */
object Region {

  /** Half-open box in voxel coordinates. */
  final case class Box(x0: Long, x1: Long, y0: Long, y1: Long, z0: Long, z1: Long) {
    def isEmpty: Boolean = x0 >= x1 || y0 >= y1 || z0 >= z1
    def volume: Long = if (isEmpty) 0L else (x1 - x0) * (y1 - y0) * (z1 - z0)
    def contains(x: Long, y: Long, z: Long): Boolean =
      x >= x0 && x < x1 && y >= y0 && y < y1 && z >= z0 && z < z1
  }

  /** Chunk shape in voxels; the reference fixes 512x512x16 at every level
    * (`spdb/c_lib/ndtype.py:21`).
    */
  final case class CuboidDims(x: Long = 512, y: Long = 512, z: Long = 16)

  final case class Decomposition(interior: Box, boundaries: Seq[Box]) {
    def all: Seq[Box] = (interior +: boundaries).filterNot(_.isEmpty)
  }

  private def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b

  /** Largest cuboid-aligned box inside the request
    * (reference `region.py:48-126`). May be empty if the request spans no
    * full cuboid on some axis.
    */
  def cuboidAlignedInterior(req: Box, dims: CuboidDims): Box = {
    val x0 = ceilDiv(req.x0, dims.x) * dims.x
    val y0 = ceilDiv(req.y0, dims.y) * dims.y
    val z0 = ceilDiv(req.z0, dims.z) * dims.z
    val x1 = (req.x1 / dims.x) * dims.x
    val y1 = (req.y1 / dims.y) * dims.y
    val z1 = (req.z1 / dims.z) * dims.z
    Box(x0, x1, y0, y1, z0, z1)
  }

  /** Split the request into interior + at most 6 disjoint boundary slabs
    * (reference `region.py:128-376` produces the same cover; slab carving
    * order here is x-near/x-far, then y, then z on the remainder, which
    * keeps the slabs disjoint — the union of `all` is exactly `req`).
    */
  def decompose(req: Box, dims: CuboidDims = CuboidDims()): Decomposition = {
    val in0 = cuboidAlignedInterior(req, dims)
    if (in0.isEmpty) return Decomposition(Box(0, 0, 0, 0, 0, 0), Seq(req))
    val in = in0
    val slabs = Seq(
      // x-near / x-far full-height slabs
      Box(req.x0, in.x0, req.y0, req.y1, req.z0, req.z1),
      Box(in.x1, req.x1, req.y0, req.y1, req.z0, req.z1),
      // y slabs on the x-interior band
      Box(in.x0, in.x1, req.y0, in.y0, req.z0, req.z1),
      Box(in.x0, in.x1, in.y1, req.y1, req.z0, req.z1),
      // z slabs on the xy-interior column
      Box(in.x0, in.x1, in.y0, in.y1, req.z0, in.z0),
      Box(in.x0, in.x1, in.y0, in.y1, in.z1, req.z1)
    ).filterNot(_.isEmpty)
    Decomposition(in, slabs)
  }

  /** Morton ids of all cuboids covering the request (reference
    * `spatialdb.py:451-475`), sorted for scan locality. Only for bounded
    * requests — the engine's scan path uses coordinate predicates instead
    * when the covering set would be large.
    */
  /** Inclusive cuboid-grid index ranges covering the request — the single
    * source of the bounds math shared by every covering-set computation
    * (driver-literal and distributed paths must agree exactly).
    */
  def gridBounds(req: Box, dims: CuboidDims): ((Long, Long), (Long, Long), (Long, Long)) = (
    (req.x0 / dims.x, (req.x1 - 1) / dims.x),
    (req.y0 / dims.y, (req.y1 - 1) / dims.y),
    (req.z0 / dims.z, (req.z1 - 1) / dims.z))

  /** Number of cuboids covering the request — cheap guard before deciding
    * whether [[coveringMortons]] may be materialized on the driver.
    */
  def coveringCount(req: Box, dims: CuboidDims = CuboidDims()): Long = {
    if (req.isEmpty) return 0L
    val ((x0, x1), (y0, y1), (z0, z1)) = gridBounds(req, dims)
    (x1 - x0 + 1) * (y1 - y0 + 1) * (z1 - z0 + 1)
  }

  def coveringMortons(req: Box, dims: CuboidDims = CuboidDims()): Seq[Long] = {
    if (req.isEmpty) return Seq.empty
    val ((cx0, cx1), (cy0, cy1), (cz0, cz1)) = gridBounds(req, dims)
    val out = for (z <- cz0 to cz1; y <- cy0 to cy1; x <- cx0 to cx1)
      yield Morton.encode(x, y, z)
    out.sorted
  }
}
