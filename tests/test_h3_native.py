"""Native H3 core validation (extensions/h3_native.py).

Ground truth is PUBLIC: the h3-py README quickstart cells and boundary,
the uber/h3 cellToLatLng documentation centers, the documented gridDisk
set, and the Microsoft geo_point_to_h3cell doc example. Structural laws
(hierarchy, ring sizes, pentagon counts) come from the published H3 spec.
"""

from __future__ import annotations

import math

import pytest

from kql_engine_spark.extensions import h3_native as H3


def test_known_forward_vectors():
    assert H3.latlng_to_cell(37.3615593, -122.0553238, 5) == "85283473fffffff"
    assert H3.latlng_to_cell(37.3615593, -122.0553238, 7) == "87283472bffffff"
    # Kusto geo_point_to_h3cell doc example (lat/lng order: h3 convention)
    assert (
        H3.latlng_to_cell(40.689250859314974, -74.04450446039874, 6)
        == "862a1072fffffff"
    )


def test_known_inverse_centers():
    lat, lng = H3.cell_to_latlng("8928308280fffff")
    assert abs(lat - 37.77670234943567) < 1e-9
    assert abs(lng - -122.41845932318311) < 1e-9
    lat, lng = H3.cell_to_latlng("85283473fffffff")
    assert abs(lat - 37.34579337536848) < 1e-9
    assert abs(lng - -121.97637597255124) < 1e-9


def test_known_boundary():
    want = (
        (37.271355866731895, -121.91508032705622),
        (37.353926450852256, -121.86222328902491),
        (37.42834118609435, -121.92354999630156),
        (37.42012867767779, -122.03773496427027),
        (37.33755608435299, -122.090428929044),
        (37.26319797461824, -122.02910130918998),
    )
    got = H3.cell_to_boundary("85283473fffffff")
    assert len(got) == len(want)
    for (gla, glo), (wla, wlo) in zip(got, want):
        assert abs(gla - wla) < 1e-9 and abs(glo - wlo) < 1e-9


def test_known_grid_disk():
    assert sorted(H3.grid_disk("8928308280fffff", 1)) == sorted(
        [
            "8928308280fffff", "8928308280bffff", "89283082807ffff",
            "89283082877ffff", "89283082803ffff", "89283082873ffff",
            "8928308283bffff",
        ]
    )


def test_parent_child_laws():
    c = H3.latlng_to_cell(48.8566, 2.3522, 9)
    p = H3.cell_to_parent(c)
    assert H3.get_resolution(p) == 8
    kids = H3.cell_to_children(p)
    assert c in kids and len(kids) == 7
    # parent center lies inside one of its children
    pla, plo = H3.cell_to_latlng(p)
    assert H3.latlng_to_cell(pla, plo, 9) in kids
    # grandparent chain
    assert H3.cell_to_parent(c, 5) == H3.cell_to_parent(H3.cell_to_parent(c, 7), 5)


def test_pentagon_counts():
    # res-0 pentagons: exactly the 12 documented base cells
    pents = []
    for bc in range(122):
        h = H3._set_base_cell(H3._set_res(H3._H3_INIT, 0), bc)
        tok = H3._h3_to_str(h)
        if H3.is_pentagon(tok):
            pents.append(bc)
    assert pents == sorted(H3.PENTAGON_BASE_CELLS)
    # a pentagon has 5 neighbors and 6 children
    pent = H3._h3_to_str(H3._set_base_cell(H3._set_res(H3._H3_INIT, 0), 4))
    assert len(H3.grid_disk(pent, 1)) == 6  # itself + 5
    assert len(H3.cell_to_children(pent)) == 6
    # res-1 global pentagon census: 12 again
    n_pent = sum(
        1
        for bc in range(122)
        for kid in H3.cell_to_children(
            H3._h3_to_str(H3._set_base_cell(H3._set_res(H3._H3_INIT, 0), bc))
        )
        if H3.is_pentagon(kid)
    )
    assert n_pent == 12


def test_grid_ring_sizes():
    c = H3.latlng_to_cell(35.0, 135.0, 6)
    for k in (1, 2, 3):
        assert len(H3.grid_ring(c, k)) == 6 * k
    disk = H3.grid_disk(c, 3)
    assert len(disk) == 1 + 6 + 12 + 18


def test_roundtrip_sweep():
    for res in (0, 1, 2, 6, 11, 15):
        for la in range(-80, 81, 40):
            for lo in range(-160, 161, 40):
                c = H3.latlng_to_cell(la, lo, res)
                cla, clo = H3.cell_to_latlng(c)
                assert H3.latlng_to_cell(cla, clo, res) == c


def test_boundary_contains_center():
    # spherical sanity: every boundary vertex is within 2 cell radii of
    # the center, and the polygon winds around the center
    for tok in ("85283473fffffff", "862a1072fffffff",
                H3.latlng_to_cell(-45.0, 170.0, 4)):
        cla, clo = H3.cell_to_latlng(tok)
        b = H3.cell_to_boundary(tok)
        assert 5 <= len(b) <= 10
        for la, lo in b:
            d = math.hypot(la - cla, (lo - clo) * math.cos(math.radians(cla)))
            assert d < 5.0  # degrees, generous at res 4


def test_validity_checks():
    assert H3.is_valid_cell("85283473fffffff")
    assert not H3.is_valid_cell("ffffffffffffffff")
    assert not H3.is_valid_cell("85283473ffffff")  # truncated
    assert not H3.is_valid_cell("hello")
    with pytest.raises(ValueError):
        H3.latlng_to_cell(0.0, 0.0, 16)
    with pytest.raises(ValueError):
        H3.cell_to_parent("85283473fffffff", 9)  # finer than cell


def test_cube_rotation_solver_is_stable():
    # the import-time solver must converge to the same table when re-run
    g = H3._build_geometry()
    H3._build_cube_bc(g)
    H3._solve_cube_rotations(g)
    live = H3._geometry()
    assert g.cube_bc == live.cube_bc
    assert g.cube_rot == live.cube_rot


def test_pentagon_boundary_vertex_counts():
    # published structure: Class II pentagons have 5 boundary vertices;
    # Class III pentagon edges all cross icosa edges, adding 5 distortion
    # vertices (10 total)
    for bc in (4, 83, 117):
        p0 = H3._h3_to_str(H3._set_base_cell(H3._set_res(H3._H3_INIT, 0), bc))
        assert len(H3.cell_to_boundary(p0)) == 5
        kid = [c for c in H3.cell_to_children(p0) if H3.is_pentagon(c)][0]
        assert len(H3.cell_to_boundary(kid)) == 10


def test_boundary_encloses_center_and_excludes_neighbors():
    # point-in-polygon of the boundary ring: the cell's own center is
    # inside; every ring-1 neighbor's center is outside
    import math

    for tok in ("85283473fffffff", H3.latlng_to_cell(30.0, 0.0, 1)):
        b = H3.cell_to_boundary(tok)
        cla, clo = H3.cell_to_latlng(tok)

        def inside(lat, lng):
            # planar ray cast is fine at these scales for a convex-ish ring
            n, j, c = len(b), len(b) - 1, False
            for i in range(n):
                yi, xi = b[i]
                yj, xj = b[j]
                if (yi > lat) != (yj > lat) and lng < (xj - xi) * (
                    lat - yi
                ) / (yj - yi) + xi:
                    c = not c
                j = i
            return c

        assert inside(cla, clo)
        for nb in H3.grid_ring(tok, 1):
            nla, nlo = H3.cell_to_latlng(nb)
            assert not inside(nla, nlo), (tok, nb)


def test_vectorized_forward_matches_scalar():
    # the numpy whole-batch path must be bit-identical to the scalar walk
    import numpy as np

    rng = np.random.default_rng(13)
    lats = rng.uniform(-89.9, 89.9, 4000)
    lngs = rng.uniform(-180.0, 180.0, 4000)
    for res in (0, 2, 7, 9, 15):
        vec = H3.cells_from_latlng(lats, lngs, res)
        for t in range(0, 4000, 37):
            assert format(int(vec[t]), "x") == H3.latlng_to_cell(
                lats[t], lngs[t], res
            )
    # NaN / out-of-range rows -> 0
    out = H3.cells_from_latlng(
        np.array([float("nan"), 91.0, 45.0]), np.array([0.0, 0.0, 0.0]), 5
    )
    assert out[0] == 0 and out[1] == 0 and out[2] != 0


def test_distortion_vertices_lie_on_icosa_edges():
    """Class III cells crossing icosahedron edges emit distortion
    vertices AT the crossing: each must be equidistant from its two
    nearest face centers (i.e., exactly on an icosa edge), and Class III
    pentagons alternate main/distortion 5+5."""
    g = H3._geometry()

    def on_edge(lat, lng, tol=1e-9):
        p = H3._geo_to_xyz(math.radians(lat), math.radians(lng))
        d = sorted((H3._dot(p, c) for c in g.center_xyz), reverse=True)
        return abs(d[0] - d[1]) < tol

    for bc in (4, 83, 117):
        p0 = H3._h3_to_str(H3._set_base_cell(H3._set_res(H3._H3_INIT, 0), bc))
        kid = [c for c in H3.cell_to_children(p0) if H3.is_pentagon(c)][0]
        flags = [on_edge(la, lo) for la, lo in H3.cell_to_boundary(kid)]
        assert flags == [False, True] * 5, flags
