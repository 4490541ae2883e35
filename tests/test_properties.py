"""Property-based tests (hypothesis) for the numpy kernels — the
invariants SURVEY.md §5 commits to: encode/decode containment, prefix
monotonicity, distance metric sanity, cover completeness, hex Voronoi.
Kernel-only (no Spark session) so the whole module runs in seconds.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from geotile.kernel import geohash_np as gh
from geotile.kernel import hex_np

# stay off the exact poles/antimeridian (cell assignment clamps there)
lats = st.floats(min_value=-89.99, max_value=89.99, allow_nan=False)
lons = st.floats(min_value=-179.99, max_value=179.99, allow_nan=False)
nchars_st = st.integers(min_value=1, max_value=9)


@settings(max_examples=200, deadline=None)
@given(lats, lons, nchars_st)
def test_encode_decode_containment(lat, lon, nchars):
    """A point lies inside the bounds of its own cell — up to one ULP
    of the (coord + offset) addition at a cell boundary, which is the
    precision limit of ANY float grid binning."""
    cell = gh.encode(np.array([lat]), np.array([lon]), nchars)
    mnla, mxla, mnlo, mxlo = gh.cell_bounds(cell)
    eps = 1e-12
    assert mnla[0] - eps <= lat < mxla[0] + eps or (lat == 90.0 and mxla[0] == 90.0)
    assert mnlo[0] - eps <= lon < mxlo[0] + eps or (lon == 180.0 and mxlo[0] == 180.0)


@settings(max_examples=200, deadline=None)
@given(lats, lons, st.integers(min_value=2, max_value=9))
def test_prefix_monotonicity(lat, lon, nchars):
    """The cell at p chars is prefixed by every coarser cell."""
    fine = gh.encode(np.array([lat]), np.array([lon]), nchars)[0]
    for p in range(1, nchars):
        coarse = gh.encode(np.array([lat]), np.array([lon]), p)[0]
        assert fine.startswith(coarse)


@settings(max_examples=200, deadline=None)
@given(lats, lons, lats, lons)
def test_haversine_symmetry_and_identity(a_lat, a_lon, b_lat, b_lon):
    d_ab = gh.haversine_m(a_lat, a_lon, b_lat, b_lon)[0]
    d_ba = gh.haversine_m(b_lat, b_lon, a_lat, a_lon)[0]
    assert abs(d_ab - d_ba) <= 1e-6 * max(d_ab, 1.0)
    assert gh.haversine_m(a_lat, a_lon, a_lat, a_lon)[0] <= 1e-6
    assert 0.0 <= d_ab <= np.pi * gh.EARTH_RADIUS_M * (1 + 1e-12)


@settings(max_examples=150, deadline=None)
@given(lats, lons, lats, lons, lats, lons)
def test_haversine_triangle_inequality(a1, o1, a2, o2, a3, o3):
    d12 = gh.haversine_m(a1, o1, a2, o2)[0]
    d23 = gh.haversine_m(a2, o2, a3, o3)[0]
    d13 = gh.haversine_m(a1, o1, a3, o3)[0]
    # RELATIVE slack: near-antipodal paths (~2e7 m) accumulate a few
    # ulps through asin near 1; an absolute 1e-6 m bound is tighter
    # than double precision itself there (hypothesis found a 2.6e-6 m
    # violation on a pole-to-pole path)
    assert d13 <= (d12 + d23) * (1.0 + 1e-12) + 1e-6


@settings(max_examples=100, deadline=None)
@given(lats, lons, st.floats(min_value=10.0, max_value=2_000_000.0),
       lats, lons)
def test_radius_cover_completeness(qlat, qlon, radius_m, plat, plon):
    """Every point within the radius falls in some cover cell (at the
    precision the engine's adaptive fitting would pick)."""
    from geotile.engine import _fit_cover_radius

    if gh.haversine_m(qlat, qlon, plat, plon)[0] > radius_m:
        return
    # covers are bbox-based with lon wraparound; skip the wrap seam
    # (the engine handles it via modular lon cells, asserted separately)
    _mnla, _mxla, mnlo, mxlo = gh.bbox_correct(qlat, qlon, radius_m)
    if mnlo < -180.0 or mxlo > 180.0:
        return
    n, cells = _fit_cover_radius(qlat, qlon, radius_m, 5)
    pcell = gh.encode(np.array([plat]), np.array([plon]), n)[0]
    assert pcell in set(cells)


@settings(max_examples=200, deadline=None)
@given(lats, lons)
def test_neighbors_contain_nudged_points(lat, lon):
    """A small nudge in any direction lands in the cell itself or one
    of its correct 8 neighbors."""
    nchars = 5
    cell = gh.encode(np.array([lat]), np.array([lon]), nchars)
    allowed = {c for row in gh.neighbors(cell, include_self=True)
               for c in np.atleast_1d(row).tolist() if c is not None}
    mnla, mxla, mnlo, mxlo = gh.cell_bounds(cell)
    eps_la = (mxla[0] - mnla[0]) * 0.25
    eps_lo = (mxlo[0] - mnlo[0]) * 0.25
    for dla in (-eps_la, 0.0, eps_la):
        for dlo in (-eps_lo, 0.0, eps_lo):
            la2 = lat + dla
            lo2 = lon + dlo
            if not (-90.0 <= la2 <= 90.0):
                continue
            lo2 = ((lo2 + 180.0) % 360.0) - 180.0
            nb = gh.encode(np.array([la2]), np.array([lo2]), nchars)[0]
            assert nb in allowed


@settings(max_examples=200, deadline=None)
@given(lats, lons, st.integers(min_value=1, max_value=9))
def test_hex_point_nearer_own_center_than_any_neighbor(lat, lon, res):
    """Gnomonic face-plane Voronoi: in the point's own face plane, the
    assigned hex center is nearest among itself and its 6 neighbors."""
    cell = hex_np.hex_cell(np.array([lat]), np.array([lon]), res)
    vx, vy, vz = hex_np._unit_vectors(np.array([lat]), np.array([lon]))
    _r, face, q, r = hex_np.unpack(cell)
    f = int(face[0])
    c, e1, e2 = (hex_np.FACE_CENTERS[f], hex_np.FACE_E1[f], hex_np.FACE_E2[f])
    d = vx * c[0] + vy * c[1] + vz * c[2]
    x = (vx * e1[0] + vy * e1[1] + vz * e1[2]) / d
    y = (vx * e2[0] + vy * e2[1] + vz * e2[2]) / d
    cx, cy = hex_np._from_axial(q.astype(float), r.astype(float), res)
    own = float(np.hypot(x - cx, y - cy)[0])
    _nr, _nf, nq, nr_ = hex_np.unpack(hex_np.neighbors(cell).ravel())
    nx, ny = hex_np._from_axial(nq.astype(float), nr_.astype(float), res)
    other = np.hypot(x[0] - nx, y[0] - ny)
    assert own <= other.min() + 1e-9


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
               max_size=400))
def test_extract_text_idempotent_and_deterministic(html):
    """Extraction is a pure function: same input -> same bytes, and
    re-extracting already-extracted text is stable (no tags left)."""
    import pandas as pd

    from geotile.extract import extract_text_pd

    s = pd.Series([f"<html><body><p>{html}</p></body></html>"])
    t1 = extract_text_pd(s)
    t2 = extract_text_pd(s)
    assert t1.iloc[0] == t2.iloc[0]
    assert "<p>" not in t1.iloc[0]


@settings(max_examples=300, deadline=None)
@given(lats, lons, st.integers(min_value=1, max_value=5),
       st.integers(min_value=1, max_value=32), st.data())
def test_ring_guarantee_soundness(qlat, qlon, nchars, ring, data):
    """engine._ring_guarantee_m is a true lower bound: ANY point whose
    cell lies outside the query's Chebyshev disk of ``ring`` cells is
    at least guarantee meters away.  This is the kNN termination
    condition — an overestimate here returns wrong neighbors (the
    round-1 advice found exactly that at high latitude)."""
    from geotile import engine

    g = engine._ring_guarantee_m(nchars, abs(qlat), ring)
    assert g >= 0.0
    lat_bits, lon_bits = gh._axis_bits(nchars)
    nlat, nlon = 1 << lat_bits, 1 << lon_bits
    qi, qj, _ = gh.decode_ij(gh.encode(qlat, qlon, nchars))
    qi, qj = int(qi[0]), int(qj[0])
    # sample a point in a cell OUTSIDE the disk (index diff > ring in
    # lat, or circular lon diff > ring)
    dla = data.draw(st.integers(min_value=-nlat, max_value=nlat))
    dlo = data.draw(st.integers(min_value=-(nlon // 2), max_value=nlon // 2))
    pi = qi + dla
    pj = (qj + dlo) % nlon
    circ = min(abs(dlo), nlon - abs(dlo))
    if not (0 <= pi < nlat):
        return  # no such cell
    if abs(dla) <= ring and circ <= ring:
        return  # inside the searched disk — not covered by the bound
    # worst case: the point sits at the cell corner nearest the query
    fla = data.draw(st.floats(min_value=0.0, max_value=1.0))
    flo = data.draw(st.floats(min_value=0.0, max_value=1.0))
    plat = -90.0 + (pi + fla) * (180.0 / nlat)
    plon = -180.0 + (pj + flo) * (360.0 / nlon)
    d = float(gh.haversine_m(np.array([qlat]), np.array([qlon]),
                             np.array([plat]), np.array([plon]))[0])
    assert d >= g - 1e-6 * max(g, 1.0), (
        f"guarantee {g} > true distance {d} (nchars={nchars} ring={ring} "
        f"q=({qlat},{qlon}) p=({plat},{plon}) dla={dla} dlo={dlo})")
