"""S2 cell-id grid — faithful reimplementation of the public S2 scheme.

Reference analog: ``src/S2GeomSpatialGrid.cpp`` (which wraps Google
s2geometry).  No s2 library exists in this environment, so the cell-id
scheme — 6 cube faces, quadratic u→s projection, Hilbert curve position,
64-bit id = ``face(3b) | hilbert_pos(2*level b) | 1``-marker — is
re-implemented here from the published algorithm, fully vectorized in numpy.

Why S2 is our flagship hierarchy grid (SURVEY §2.2, M6):
  * ``level/parent/is_ancestor/range_min/range_max`` are pure bit arithmetic
    on the id → native Spark column expressions inside whole-stage codegen
    (``col_*`` hooks below).  The HCQR ancestor joins (fm ancestor at level L
    vs pm descendant at level > L) become **range joins** on
    ``cell_id BETWEEN range_min AND range_max`` with zero Python.
  * descendants of a cell form one contiguous id range → Iceberg/parquet
    min-max stats prune region queries at the file level at 100 TB scale.

Signedness: Spark LongType is signed; faces 4-5 set bit 63.  All hierarchy
math (mask/or/add of low bits) is sign-agnostic because a cell's descendants
share the high face bits, so BETWEEN on signed longs is still correct.
numpy computes in uint64 and reinterprets via ``.view(int64)``.
"""

from __future__ import annotations

import numpy as np

# np.select/where evaluate all branches; div-by-zero lanes are never selected
np.seterr(divide="ignore", invalid="ignore")

from .base import Grid, dist_point_to_segments, point_in_poly, register

MAX_LEVEL = 30
_LOOKUP_BITS = 4
_SWAP, _INVERT = 1, 2
_POS_TO_ORIENT = [_SWAP, 0, 0, _INVERT | _SWAP]
_POS_TO_IJ = [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]]

_LOOKUP_POS = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)
_LOOKUP_IJ = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)


def _init_lookup(level: int, i: int, j: int, orig: int, pos: int, orient: int) -> None:
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig] = (pos << 2) + orient
        _LOOKUP_IJ[(pos << 2) + orig] = (ij << 2) + orient
        return
    r = _POS_TO_IJ[orient]
    for idx in range(4):
        _init_lookup(
            level + 1,
            (i << 1) + (r[idx] >> 1),
            (j << 1) + (r[idx] & 1),
            orig,
            (pos << 2) + idx,
            orient ^ _POS_TO_ORIENT[idx],
        )


for _o in range(4):
    _init_lookup(0, 0, 0, _o, 0, _o)

_U64 = np.uint64


def _latlon_to_xyz(lat, lon):
    phi, lam = np.radians(np.asarray(lat, np.float64)), np.radians(np.asarray(lon, np.float64))
    cp = np.cos(phi)
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    )
    u = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [y / x, -x / y, -x / z, z / x, z / y, -y / z],
    )
    v = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [z / x, z / y, -y / z, y / x, -x / y, -x / z],
    )
    return face.astype(np.int64), u, v


def _face_uv_to_xyz(face, u, v):
    one = np.ones_like(u)
    x = np.select([face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
                  [one, -u, -u, -one, v, v])
    y = np.select([face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
                  [u, one, -v, -v, -one, u])
    z = np.select([face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
                  [v, v, one, -u, -u, -one])
    return x, y, z


def _uv_to_st(u):
    return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def _st_to_uv(s):
    return np.where(s >= 0.5, (4.0 * s * s - 1.0) / 3.0, (1.0 - 4.0 * (1.0 - s) ** 2) / 3.0)


def _st_to_ij(s):
    return np.clip(np.floor(s * (1 << MAX_LEVEL)), 0, (1 << MAX_LEVEL) - 1).astype(np.int64)


def _from_face_ij(face, i, j):
    """(face, leaf i, leaf j) → leaf cell id (uint64)."""
    n = face.astype(_U64) << _U64(60)
    bits = (face & 1).astype(np.int64)  # face & kSwapMask
    i = i.astype(np.int64)
    j = j.astype(np.int64)
    mask = (1 << _LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits += ((i >> (k * _LOOKUP_BITS)) & mask) << (_LOOKUP_BITS + 2)
        bits += ((j >> (k * _LOOKUP_BITS)) & mask) << 2
        bits = _LOOKUP_POS[bits].astype(np.int64)
        n |= (bits.astype(_U64) >> _U64(2)) << _U64(k * 2 * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    return n * _U64(2) + _U64(1)


def _to_face_ij(ids_u64):
    """cell id (any level, uint64) → (face, i, j) of a leaf inside the cell."""
    ids = ids_u64.astype(_U64)
    face = (ids >> _U64(61)).astype(np.int64)
    bits = (face & 1).astype(np.int64)
    i = np.zeros(len(ids), dtype=np.int64)
    j = np.zeros(len(ids), dtype=np.int64)
    for k in range(7, -1, -1):
        nbits = (MAX_LEVEL - 7 * _LOOKUP_BITS) if k == 7 else _LOOKUP_BITS
        bits += ((ids >> _U64(k * 2 * _LOOKUP_BITS + 1)).astype(np.int64)
                 & ((1 << (2 * nbits)) - 1)) << 2
        bits = _LOOKUP_IJ[bits].astype(np.int64)
        i += (bits >> (_LOOKUP_BITS + 2)) << (k * _LOOKUP_BITS)
        j += ((bits >> 2) & ((1 << _LOOKUP_BITS) - 1)) << (k * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    return face, i, j


class S2Grid(Grid):
    name = "s2"
    max_level = MAX_LEVEL

    # ---- numpy kernels ----------------------------------------------------
    def cell(self, lat, lon, res: int):
        x, y, z = _latlon_to_xyz(lat, lon)
        face, u, v = _xyz_to_face_uv(x, y, z)
        i = _st_to_ij(_uv_to_st(u))
        j = _st_to_ij(_uv_to_st(v))
        leaf = _from_face_ij(face, i, j)
        return self._parent_u64(leaf, res).view(np.int64)

    @staticmethod
    def _lsb_for(res: int) -> _U64:
        return _U64(1) << _U64(2 * (MAX_LEVEL - res))

    def lattice_step(self, res: int) -> int:
        """Hilbert-adjacent level-``res`` ids differ by exactly 2·lsb, and
        every valid level-``res`` id is ≡ lsb (mod 2·lsb) — so a BETWEEN
        over a 2·lsb-stride run matches exactly the run members among
        res-level ids (the stride is DERIVED from the id scheme, never from
        observed data; ADVICE r03)."""
        return 1 << (2 * (MAX_LEVEL - res) + 1)

    def _parent_u64(self, ids_u64, res: int):
        # (id & -lsb) | lsb : clear position bits below `res`, set the marker
        lsb = self._lsb_for(res)
        neg_lsb = (~lsb + _U64(1)) & _U64(0xFFFFFFFFFFFFFFFF)
        return (ids_u64 & neg_lsb) | lsb

    def level(self, ids):
        u = np.asarray(ids, np.int64).view(_U64)
        lsb = u & (~u + _U64(1))
        tz = np.round(np.log2(lsb.astype(np.float64))).astype(np.int64)
        return MAX_LEVEL - (tz >> 1)

    def parent(self, ids, res: int | None = None):
        u = np.asarray(ids, np.int64).view(_U64)
        if res is None:
            lvl = self.level(ids)
            assert (lvl == lvl[0]).all(), "mixed-level parent() needs explicit res"
            res = int(lvl[0]) - 1
        return self._parent_u64(u, res).view(np.int64)

    def children(self, ids):
        u = np.asarray(ids, np.int64).view(_U64)
        lsb = u & (~u + _U64(1))
        clsb = lsb >> _U64(2)
        base = u - lsb
        out = np.empty((len(u), 4), dtype=_U64)
        for k in range(4):
            out[:, k] = base + clsb * _U64(2 * k + 1)
        return out.view(np.int64)

    def range_bounds(self, ids):
        u = np.asarray(ids, np.int64).view(_U64)
        lsb = u & (~u + _U64(1))
        return (u - (lsb - _U64(1))).view(np.int64), (u + (lsb - _U64(1))).view(np.int64)

    def is_ancestor(self, anc, desc):
        lo, hi = self.range_bounds(anc)
        d = np.asarray(desc, np.int64)
        # signed compare is fine: descendants share the high (face) bits
        return (d >= lo) & (d <= hi) & (self.level(desc) > self.level(anc))

    def _block(self, ids):
        """(face, i0, j0, size) of the cell's aligned ij block."""
        ids = np.asarray(ids, np.int64)
        face, i, j = _to_face_ij(ids.view(_U64))
        lvl = self.level(ids)
        size = np.int64(1) << (MAX_LEVEL - lvl)
        return face, i & ~(size - 1), j & ~(size - 1), size

    def _corners_latlon(self, ids):
        """(n,4,2) lat/lon of the 4 st-corners of each cell."""
        face, i0, j0, size = self._block(ids)
        scale = 1.0 / (1 << MAX_LEVEL)
        out = np.empty((len(ids), 4, 2), dtype=np.float64)
        for k, (di, dj) in enumerate([(0, 0), (0, 1), (1, 1), (1, 0)]):
            s = (i0 + di * size) * scale
            t = (j0 + dj * size) * scale
            x, y, z = _face_uv_to_xyz(face, _st_to_uv(s), _st_to_uv(t))
            r = np.sqrt(x * x + y * y + z * z)
            out[:, k, 0] = np.degrees(np.arcsin(np.clip(z / r, -1, 1)))
            out[:, k, 1] = np.degrees(np.arctan2(y, x))
        return out

    def center(self, ids):
        face, i0, j0, size = self._block(ids)
        scale = 1.0 / (1 << MAX_LEVEL)
        s = (i0 + size / 2.0) * scale
        t = (j0 + size / 2.0) * scale
        x, y, z = _face_uv_to_xyz(face, _st_to_uv(s), _st_to_uv(t))
        r = np.sqrt(x * x + y * y + z * z)
        return np.degrees(np.arcsin(np.clip(z / r, -1, 1))), np.degrees(np.arctan2(y, x))

    def bbox(self, ids):
        from .base import bbox_from_corners

        return bbox_from_corners(self._corners_latlon(ids))

    def area_km2(self, ids):
        """Average cell area at the cell's level (S2 AverageArea convention)."""
        lvl = self.level(ids)
        R = 6371.0088
        return (4.0 * np.pi / 6.0) / (4.0 ** lvl) * R * R

    def covering(self, poly: np.ndarray, res: int):
        """Recursive subdivision covering; conservative (never drops hits).

        Planar lat/lon tests with a one-diagonal pad; coarse levels (< 3)
        always subdivide, so face-cell bbox distortion cannot prune wrongly.
        """
        ex, ey = poly[:, 1], poly[:, 0]
        ex2, ey2 = np.roll(ex, -1), np.roll(ey, -1)
        full_out: list[np.ndarray] = []
        frontier = (np.arange(6, dtype=_U64) << _U64(61)) | (_U64(1) << _U64(60))
        frontier = frontier.view(np.int64)
        for lvl in range(0, res):
            if len(frontier) == 0:
                break
            c = self._corners_latlon(frontier)
            diag = np.sqrt(
                (c[:, :, 0].max(1) - c[:, :, 0].min(1)) ** 2
                + (c[:, :, 1].max(1) - c[:, :, 1].min(1)) ** 2
            )
            inside = point_in_poly(
                c[:, :, 0].ravel(), c[:, :, 1].ravel(), poly
            ).reshape(-1, 4)
            clat, clon = self.center(frontier)
            cin = point_in_poly(clat, clon, poly)
            bd_c = dist_point_to_segments(clon, clat, ex, ey, ex2, ey2)
            if lvl >= 3:
                full = inside.all(1) & cin & (bd_c > diag)
            else:
                full = np.zeros(len(frontier), dtype=bool)
            # prune: provably disjoint — center far outside and no corner in
            lo_lat, hi_lat = c[:, :, 0].min(1), c[:, :, 0].max(1)
            lo_lon, hi_lon = c[:, :, 1].min(1), c[:, :, 1].max(1)
            pad = diag
            disjoint = (
                (~inside.any(1)) & (~cin) & (bd_c > pad)
                & ~(
                    (ex[None, :] >= (lo_lon - pad)[:, None]) & (ex[None, :] <= (hi_lon + pad)[:, None])
                    & (ey[None, :] >= (lo_lat - pad)[:, None]) & (ey[None, :] <= (hi_lat + pad)[:, None])
                ).any(1)
            )
            if lvl < 3:
                disjoint[:] = False
            full_out.append(frontier[full])
            keep = frontier[~full & ~disjoint]
            frontier = self.children(keep).ravel()
        # frontier is now at `res`: classify full vs boundary
        if len(frontier):
            c = self._corners_latlon(frontier)
            diag = np.sqrt(
                (c[:, :, 0].max(1) - c[:, :, 0].min(1)) ** 2
                + (c[:, :, 1].max(1) - c[:, :, 1].min(1)) ** 2
            )
            inside = point_in_poly(c[:, :, 0].ravel(), c[:, :, 1].ravel(), poly).reshape(-1, 4)
            clat, clon = self.center(frontier)
            cin = point_in_poly(clat, clon, poly)
            bd_c = dist_point_to_segments(clon, clat, ex, ey, ex2, ey2)
            full = inside.all(1) & cin & (bd_c > diag)
            lo_lat, hi_lat = c[:, :, 0].min(1), c[:, :, 0].max(1)
            lo_lon, hi_lon = c[:, :, 1].min(1), c[:, :, 1].max(1)
            pad = diag
            near_edge = (
                (ex[None, :] >= (lo_lon - pad)[:, None]) & (ex[None, :] <= (hi_lon + pad)[:, None])
                & (ey[None, :] >= (lo_lat - pad)[:, None]) & (ey[None, :] <= (hi_lat + pad)[:, None])
            ).any(1)
            boundary = ~full & (inside.any(1) | cin | (bd_c <= pad) | near_edge)
            fulls = np.concatenate(full_out + [frontier[full]]) if full_out else frontier[full]
            return fulls, frontier[boundary]
        fulls = np.concatenate(full_out) if full_out else np.empty(0, np.int64)
        return fulls, np.empty(0, np.int64)

    # ---- native Spark column hooks (pure bit arithmetic, codegen-resident) -
    def col_level(self, id_col):
        from pyspark.sql import functions as F
        lsb = id_col.bitwiseAND(-id_col)
        tz = F.bit_count(lsb - F.lit(1).cast("long"))
        return (F.lit(MAX_LEVEL) - tz.cast("long") / F.lit(2)).cast("int")

    def col_parent(self, id_col, res: int, from_res: int | None = None):
        from pyspark.sql import functions as F
        lsb = 1 << (2 * (MAX_LEVEL - res))
        return id_col.bitwiseAND(F.lit(-lsb).cast("long")).bitwiseOR(F.lit(lsb).cast("long"))

    def col_range(self, id_col, res: int | None = None):
        from pyspark.sql import functions as F  # noqa: F401
        lsb = id_col.bitwiseAND(-id_col)
        return id_col - (lsb - 1), id_col + (lsb - 1)


S2 = register(S2Grid())
