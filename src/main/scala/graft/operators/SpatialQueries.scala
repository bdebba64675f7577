package graft.operators

import graft.operators.Q.t

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Spatial operators: ClickHouse `geohashEncode` and the grid-cell
 * spatial join (the distributed point-proximity primitive CH spells
 * with pointInPolygon/greatCircleDistance over manual buckets).
 *
 * Both keys run in integer-exact regimes: coordinates derive from row
 * keys as centidegree / grid-unit integers, geohash cell indices are
 * integer divisions, and distances compare squared integers — no
 * floating point anywhere, so the DuckDB oracles match bit-for-bit.
 */
object SpatialQueries {

  /** Standard geohash base32 alphabet (no a, i, l, o). */
  private val GeohashAlphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  val all: Seq[(String, Q)] = Seq(

    "q_fn_geohash" -> Q(
      // CH geohashEncode(lon, lat, 5): 25 interleaved bits (13 lon,
      // 12 lat — even bit positions from the left are longitude) over
      // the [-180,180]×[-90,90] domain, 5-bit groups through the
      // base32 alphabet. Inputs are centidegree integers, cell indices
      // are exact integer divisions ilon = (lonc+18000)·8192/36000 and
      // ilat = (latc+9000)·4096/18000, and the interleave is an
      // unrolled shift-sum — all codegen'd builtins, no UDF. The spec
      // anchors the bit layout against a from-scratch reference
      // implementing the published algorithm on doubles.
      (s, dir) => {
        val latc = (pmod(col("c_custkey") * 7, lit(18000L)) - 9000).as("latc")
        val lonc = (pmod(col("c_custkey") * 13, lit(36000L)) - 18000).as("lonc")
        val base = t(s, dir, "customer").select(col("c_custkey"), latc, lonc)
        val ilat = floor((col("latc") + 9000) * 4096 / 18000).cast("long")
        val ilon = floor((col("lonc") + 18000) * 8192 / 36000).cast("long")
        // interleaved 25-bit code: bit 24 (MSB) = lon bit 12, then
        // alternating lat/lon; lon takes the even positions from MSB
        val interleaved = (0 until 25).map { pos =>
          val fromMsb = 24 - pos // weight 2^pos
          val (src, bit) =
            if (fromMsb % 2 == 0) (ilon, 12 - fromMsb / 2)
            else (ilat, 11 - fromMsb / 2)
          shiftright(src, bit).bitwiseAND(1) * (1L << pos)
        }.reduce[Column](_ + _)
        val gh = concat((4 to 0 by -1).map { g =>
          substring(lit(GeohashAlphabet),
            (shiftright(interleaved, g * 5).bitwiseAND(31) + 1).cast("int"), lit(1))
        }: _*)
        base.select(col("c_custkey"), col("latc"), col("lonc"), gh.as("geohash5"))
      },
      Some {
        val ilat = "((latc + 9000) * 4096) // 18000"
        val ilon = "((lonc + 18000) * 8192) // 36000"
        val interleaved = (0 until 25).map { pos =>
          val fromMsb = 24 - pos
          val (src, bit) =
            if (fromMsb % 2 == 0) (ilon, 12 - fromMsb / 2)
            else (ilat, 11 - fromMsb / 2)
          s"((($src) // ${1L << bit}) % 2) * ${1L << pos}"
        }.mkString(" + ")
        val gh = (4 to 0 by -1).map { g =>
          s"substr('$GeohashAlphabet', CAST((iv // ${1L << (g * 5)}) % 32 AS INT) + 1, 1)"
        }.mkString(" || ")
        s"""WITH p AS (SELECT c_custkey,
                 (c_custkey * 7) % 18000 - 9000 AS latc,
                 (c_custkey * 13) % 36000 - 18000 AS lonc
               FROM customer),
             iv AS (SELECT c_custkey, latc, lonc,
                 $interleaved AS iv FROM p)
           SELECT c_custkey, latc, lonc, $gh AS geohash5 FROM iv"""
      }),

    "q_join_spatial_grid" -> Q(
      // Grid-cell spatial self-join: all point pairs within Euclidean
      // distance 150 on a 10000×10000 integer grid. Cell size G = 150
      // ≥ D guarantees any qualifying pair's cells differ by ≤ 1 per
      // axis, so replicating the LEFT side to its 3×3 neighbor cells
      // and equi-joining on the cell key is COMPLETE — and each pair
      // matches exactly once (the single replica whose offset equals
      // the cell delta), so no dedup pass. The shuffle moves thin
      // (cell, id, x, y) rows; the oracle is the brute-force all-pairs
      // distance join, proving the grid plan loses nothing.
      // Point set: the FIRST 1500 custkeys on a 2000×2000 grid — dense
      // enough that qualifying pairs exist even at sf0.001 (150 keys),
      // bounded so the brute-force oracle stays cheap at sf0.1.
      (s, dir) => {
        val G = 150
        val pts = t(s, dir, "customer")
          .filter(col("c_custkey") <= 1500)
          .select(
            col("c_custkey").as("id"),
            pmod(col("c_custkey") * 9973, lit(2000L)).as("px"),
            pmod(col("c_custkey") * 6151, lit(2000L)).as("py"))
        val offsets = for (dx <- -1 to 1; dy <- -1 to 1) yield (dx, dy)
        val left = pts.select(col("id").as("a_id"), col("px").as("ax"),
            col("py").as("ay"),
            explode(array(offsets.map { case (dx, dy) =>
              struct(lit(dx).as("dx"), lit(dy).as("dy"))
            }: _*)).as("o"))
          .select(col("a_id"), col("ax"), col("ay"),
            (floor(col("ax") / G) + col("o.dx")).as("cx"),
            (floor(col("ay") / G) + col("o.dy")).as("cy"))
        val right = pts.select(col("id").as("b_id"), col("px").as("bx"),
          col("py").as("by"), floor(col("px") / G).as("cx"),
          floor(col("py") / G).as("cy"))
        val d2 = (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by"))
        left.join(right, Seq("cx", "cy"))
          .filter(col("a_id") < col("b_id") && d2 <= lit(150L * 150))
          .select(col("a_id"), col("b_id"), d2.cast("long").as("dist2"))
      },
      Some("""WITH p AS (SELECT c_custkey AS id,
                     (c_custkey * 9973) % 2000 AS px,
                     (c_custkey * 6151) % 2000 AS py
                   FROM customer WHERE c_custkey <= 1500)
              SELECT a.id AS a_id, b.id AS b_id,
                     CAST((a.px - b.px) * (a.px - b.px)
                        + (a.py - b.py) * (a.py - b.py) AS BIGINT) AS dist2
              FROM p a JOIN p b ON a.id < b.id
              WHERE (a.px - b.px) * (a.px - b.px)
                  + (a.py - b.py) * (a.py - b.py) <= 22500"""))
  )
}
